"""JSONL corpus ingest with corrupt-record quarantine (S10).

The most common entry format for a crawl/LLM corpus is newline-
delimited JSON, and at 100 TB some fraction of lines are ALWAYS
malformed (truncated flushes, encoding damage, schema drift). A scan
that silently drops them under-counts the corpus; one that fails the
job on the first bad line cannot finish. This source reads JSONL
under an EXPLICIT schema in PERMISSIVE mode with Spark's
`columnNameOfCorruptRecord` channel, and splits the scan into the
typed clean relation and a (file, raw_line) quarantine relation —
both queryable, so the pipeline's filter-funnel (pl4) can report
"N lines quarantined at ingest" as a first-class stage instead of a
log grep.

Reference parity note: the reference engine reads no corpus formats
(its data surface is the tf/torch shard readers, sources/data.py);
this is §7.2-step-9 extension surface like tfrecord.py's TFRecord
scan. Public-knowledge basis: Spark's JSON data-source options
(mode=PERMISSIVE, columnNameOfCorruptRecord) as documented in the
pyspark.sql.DataFrameReader API.

Scale shape: one line-split text scan per file partition
(`maxPartitionBytes` splitting applies — JSONL is line-splittable,
unlike multi-line JSON); the corrupt channel adds one nullable
string column, pruned from the clean branch after the split. No
shuffle anywhere: both relations are narrow projections of the same
scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# the documents-table schema, the repo-wide corpus contract
DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_record"


def _ok():
    """THE split predicate — one definition for the batch scan, the
    report, and the stream, so what counts as 'clean' cannot drift
    between arrival paths (a doc's routing must not depend on how it
    arrived — the documents_stream fingerprint discipline)."""
    return (
        F.col(_CORRUPT).isNull() & F.col("doc_id").isNotNull() & F.col("text").isNotNull()
    )


def jsonl_scan(spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA) -> DataFrame:
    """The raw PERMISSIVE scan: `schema` plus the corrupt-record
    column. A malformed line yields NULL typed columns and the raw
    line in `_corrupt_record`; a well-formed line yields the typed
    columns and NULL there. (Spark requires the corrupt column NOT
    be the only one selected — both helpers below select real
    columns alongside it, and `jsonl_quarantine` counts through a
    cached split for the same reason.)"""
    # StructType.add MUTATES self — build a fresh type so repeated
    # scans never stack corrupt columns onto the shared DOC_SCHEMA
    with_corrupt = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .json(path)
    )


def jsonl_ingest(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Split the scan: (clean, quarantine).

    clean: rows that parsed AND carry a non-null doc_id + text (a
    JSON object of the wrong shape parses fine but is useless to the
    pipeline — shape drift goes to quarantine too, with the raw line
    reconstructed via to_json so the operator never loses bytes).
    quarantine: (input_file, raw_line) — re-ingestable as-is after
    repair, the contract a 100 TB backfill needs.
    """
    scan = jsonl_scan(spark, path, schema)
    ok = _ok()
    clean = scan.where(ok).select(*[f.name for f in schema.fields])
    quarantine = scan.where(~ok).select(
        F.input_file_name().alias("input_file"),
        F.coalesce(
            F.col(_CORRUPT),
            F.to_json(F.struct(*[f.name for f in schema.fields])),
        ).alias("raw_line"),
    )
    return clean, quarantine


def jsonl_ingest_report(spark: SparkSession, path: str) -> DataFrame:
    """One-row ingest report: clean/quarantined counts plus the clean
    token mass — the numbers pl4's funnel prints for the ingest
    stage. Counts come from one cached scan pass (conditional
    aggregation), not two scans."""
    scan = jsonl_scan(spark, path)
    ok = _ok()
    return scan.select(
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_clean"),
        F.sum(F.when(~ok, 1).otherwise(0)).cast("bigint").alias("n_quarantined"),
        F.sum(F.when(ok, F.size(F.split("text", " "))).otherwise(0))
        .cast("bigint")
        .alias("clean_tokens"),
    )


def jsonl_scan_stream(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """`readStream` form of jsonl_scan — the live crawl-drop
    directory. Stateless: the quarantine split is a row-local
    predicate, so the stream carries NO state store; exactly-once
    file tracking comes from the file-source checkpoint, and each
    micro-batch's split is bit-identical to the batch scan of the
    same files (pinned by the end-state test)."""
    with_corrupt = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    return (
        spark.readStream.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT)
        .option("maxFilesPerTrigger", 1)
        .json(path)
    )


def jsonl_ingest_stream(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(clean_stream, quarantine_stream): the same split predicate as
    the batch jsonl_ingest, applied per micro-batch. Route each to
    its own sink (training store / repair queue)."""
    scan = jsonl_scan_stream(spark, path, schema)
    ok = _ok()
    clean = scan.where(ok).select(*[f.name for f in schema.fields])
    quarantine = scan.where(~ok).select(
        F.coalesce(
            F.col(_CORRUPT),
            F.to_json(F.struct(*[f.name for f in schema.fields])),
        ).alias("raw_line")
    )
    return clean, quarantine
