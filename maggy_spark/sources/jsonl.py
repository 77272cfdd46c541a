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


# --- S10 oracle surface (VERDICT r12 item 6) ----------------------------
#
# A deterministic JSONL fixture — every row of {sf_dir}/documents.parquet
# as one JSON line, plus the crafted broken lines below — read by BOTH
# engines: Spark through the PERMISSIVE scan above, DuckDB through a
# raw-line read + its native JSON functions. The clean relation and the
# ingest report are then ordinary value-hash-compared offline cases, so
# the quarantine split is pinned cross-engine, not just round-trip.

# one line per failure class a 100 TB crawl actually produces
S10_BROKEN_LINES = [
    '{"doc_id": 900000001, "text": "truncated flush',          # unterminated string
    "binary garbage Ã±ot json",                       # not JSON at all
    '{"wrong_shape": true, "payload": [1, 2]}',                 # schema drift
    '{"doc_id": null, "text": "null id"}',                      # JSON-null key field
    "[1, 2, 3]",                                                # top-level array
    '{"doc_id": 900000002, "lang": "en"}',                      # missing text
]


def s10_fixture_path(sf_dir: str) -> str:
    """Cache path for the fixture, keyed on the FULL sf_dir path plus
    the size+mtime of documents.parquet — so a regenerated corpus, or
    two corpora sharing a basename, never reuse a stale fixture."""
    import hashlib
    import tempfile
    from pathlib import Path

    src = Path(sf_dir.rstrip("/")) / "documents.parquet"
    try:
        st = src.stat()
        stamp = f"{src.resolve()}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        stamp = str(src)
    key = hashlib.sha1(stamp.encode()).hexdigest()[:16]
    return str(
        Path(tempfile.gettempdir())
        / f"maggy_s10_{Path(sf_dir.rstrip('/')).name}_{key}"
        / "docs.jsonl"
    )


def ensure_s10_fixture(sf_dir: str) -> str:
    """Write the fixture once (atomic rename; deterministic: documents
    sorted by doc_id, then the crafted broken lines)."""
    import json
    import os
    from pathlib import Path

    import pyarrow.parquet as pq

    out = Path(s10_fixture_path(sf_dir))
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").sort_by("doc_id")
    lines = [
        json.dumps(
            {k: row[k] for k in ("doc_id", "text", "lang", "source", "n_chars")},
            ensure_ascii=False,
        )
        for row in tbl.to_pylist()
    ]
    lines += S10_BROKEN_LINES
    tmp = out.with_suffix(".tmp")
    tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
    os.replace(tmp, out)
    return str(out)


def s10_jsonl_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed CLEAN relation of the fixture scan — must contain
    exactly the documents table (every broken line quarantined)."""
    clean, _q = jsonl_ingest(spark, ensure_s10_fixture(sf_dir))
    return clean


def s10_jsonl_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row ingest report over the fixture."""
    return jsonl_ingest_report(spark, ensure_s10_fixture(sf_dir))


def _s10_raw_lines_sql(path: str) -> str:
    # raw-line read: \x01 delimiter never occurs, quoting disabled, so
    # each physical line arrives verbatim as one VARCHAR
    return (
        f"read_csv('{path}', delim=E'\\x01', header=false, quote='', escape='', "
        "columns={'line': 'VARCHAR'})"
    )


def s10_clean_sql_for_path(path: str) -> str:
    """DuckDB twin of the clean split over ANY jsonl path (file or
    glob) — shared by the sf-dir fixture case and the streaming
    end-state oracle, so batch, stream, and twin all classify the
    same bytes."""
    # json_extract_string THROWS on malformed JSON and DuckDB does not
    # short-circuit AND — parse through a CASE gated on json_valid so
    # broken lines classify instead of failing the scan
    return f"""
WITH raw AS (
    SELECT CASE WHEN json_valid(line) THEN line END AS j
    FROM {_s10_raw_lines_sql(path)}
)
SELECT CAST(json_extract_string(j, '$.doc_id') AS BIGINT) AS doc_id,
       json_extract_string(j, '$.text') AS text,
       json_extract_string(j, '$.lang') AS lang,
       json_extract_string(j, '$.source') AS source,
       CAST(json_extract_string(j, '$.n_chars') AS BIGINT) AS n_chars
FROM raw
WHERE json_extract_string(j, '$.doc_id') IS NOT NULL
  AND json_extract_string(j, '$.text') IS NOT NULL
"""


def s10_clean_sql(sf_dir: str) -> str:
    """The sf-dir fixture instance of the clean twin (the offline
    oracle case); the clean predicate mirrors _ok() — parses AND
    doc_id AND text non-null (json_extract_string maps both missing
    keys and JSON nulls to SQL NULL)."""
    return s10_clean_sql_for_path(s10_fixture_path(sf_dir))


def s10_report_sql_for_path(path: str) -> str:
    return f"""
WITH raw AS (
    SELECT CASE WHEN json_valid(line) THEN line END AS j
    FROM {_s10_raw_lines_sql(path)}
),
cls AS (
    SELECT json_extract_string(j, '$.doc_id') IS NOT NULL
             AND json_extract_string(j, '$.text') IS NOT NULL AS ok,
           json_extract_string(j, '$.text') AS text
    FROM raw
)
SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined,
       CAST(sum(CASE WHEN ok THEN len(str_split(text, ' ')) ELSE 0 END) AS BIGINT)
           AS clean_tokens
FROM cls
"""


def s10_report_sql(sf_dir: str) -> str:
    return s10_report_sql_for_path(s10_fixture_path(sf_dir))


# module-level constants for the offline oracle table (it runs at the
# driver gate's sf0.01; the builders above serve any other dir)
_S10_DEFAULT_DIR = "/root/testdata/sf0.01"
S10_CLEAN_SQL = s10_clean_sql(_S10_DEFAULT_DIR)
S10_REPORT_SQL = s10_report_sql(_S10_DEFAULT_DIR)


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
