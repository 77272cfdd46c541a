"""Delimited-text (CSV) corpus ingest with quarantine (S11).

The second big flat-file entry format after S10's JSONL: exported
warehouse dumps and labeling-vendor deliveries arrive as delimited
text, and at 100 TB some rows are ALWAYS damaged (wrong arity from
unescaped delimiters, type drift in numeric columns, truncated
flushes). Same contract as S10: an EXPLICIT schema in PERMISSIVE
mode with Spark's `columnNameOfCorruptRecord` channel, split into
the typed clean relation and a re-ingestable (file, raw_line)
quarantine relation.

DIALECT DECISION (scale-honest): quoting is DISABLED (`quote=""`).
A quoted CSV field may legally contain newlines, which makes the
format NOT line-splittable — every 100 TB scan would need
`multiLine`'s whole-file parsing. The contract here is the
delimiter-free-fields dialect (the fields of the documents table
contain no commas by construction — asserted when the fixture is
built): parsing is strictly line-local, `maxPartitionBytes`
splitting stays sound, and a stray double-quote byte is DATA, not
syntax (pinned by the crafted unterminated-quote line, which is
CLEAN here with a literal `"` in text — under quote handling it
would swallow the rest of the line and quarantine).

Classification semantics (probed empirically, pinned by tests and
the DuckDB twin):
- wrong arity (either direction, including a valid-5-prefix tail)
  -> corrupt channel -> quarantine;
- a numeric column that fails its cast -> corrupt channel ->
  quarantine (ANY malformed column corrupts the row, including
  n_chars);
- an EMPTY token is a null CONVERSION, not corruption: empty doc_id
  or text -> clean-predicate failure -> quarantine (no corrupt
  record); empty n_chars -> NULL, row stays clean if id+text hold.

PARSER ARCHITECTURE: the scan is `spark.read.text` + a whole-line
`from_csv`, NOT the native csv source — the native source's corrupt
channel is projection-dependent (its parser prunes unparsed columns
and only fires for failures in parsed ones), which made
`clean.count()` classify more rows clean than `clean.collect()`
(measured; see _parse). The from_csv struct parse makes the split
projection-invariant and keeps the verbatim line for quarantine.

Reference parity note: extension surface like S10 (the reference
engine reads no corpus formats — its data surface is the tf/torch
shard readers, sources/data.py). Public-knowledge basis: Spark's
CSV data-source options (mode=PERMISSIVE, columnNameOfCorruptRecord,
quote) as documented in the pyspark.sql.DataFrameReader API.

Scale shape: one line-split text scan per file partition, no shuffle
anywhere — both relations are narrow projections of the same scan
(the S10 shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from maggy_spark.sources.jsonl import DOC_SCHEMA, _CORRUPT, _ok


def _csv_options() -> dict:
    return {"mode": "PERMISSIVE", "quote": "", "columnNameOfCorruptRecord": _CORRUPT}


def _parse(schema: T.StructType):
    """Per-line full-struct parse: `from_csv` over the raw line. This
    is a deliberate architecture choice, not a style one: the native
    `spark.read.csv` source's corrupt channel is PROJECTION-DEPENDENT
    — the parser prunes unparsed columns, and a failure in a pruned
    column (wrong arity past the touched prefix, a type failure in an
    untouched numeric) never fires the channel, so `clean.count()`
    (which prunes everything) classified MORE rows clean than
    `clean.collect()` did (measured: 6 vs 3 on the crafted feed — the
    relation's cardinality depended on which columns the consumer
    touched). Parsing the whole line as ONE struct value makes
    classification projection-invariant: count, collect, the report,
    and the stream all see the identical split."""
    with_corrupt = T.StructType(list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())])
    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in with_corrupt.fields)
    return F.from_csv(F.col("value"), ddl, _csv_options())


def csv_scan(spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA) -> DataFrame:
    """The raw PERMISSIVE scan in the quote-disabled dialect: one
    text FileScan (line-splittable by construction), each line parsed
    whole via from_csv (see _parse for why not the native csv
    source), the verbatim raw line riding alongside the typed columns
    and the corrupt channel. Headerless: the contract is
    explicit-schema — a header line in a 10k-file delivery is just
    one more quarantined row of arity-matching strings."""
    return (
        spark.read.text(path)
        .select(F.col("value"), _parse(schema).alias("p"))
        .select("value", "p.*")
    )


def csv_ingest(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """Split the scan: (clean, quarantine) — S10's contract verbatim,
    with the SAME `_ok()` predicate (corrupt-channel null AND doc_id
    AND text non-null), so a row's classification cannot depend on
    which flat format delivered it. The quarantine carries the
    VERBATIM raw line for every class (the text scan keeps the bytes
    — strictly stronger than S10's to_json reconstruction for the
    shape-drift classes)."""
    scan = csv_scan(spark, path, schema)
    ok = _ok()
    clean = scan.where(ok).select(*[f.name for f in schema.fields])
    quarantine = scan.where(~ok).select(
        F.input_file_name().alias("input_file"),
        F.col("value").alias("raw_line"),
    )
    return clean, quarantine


def csv_ingest_report(spark: SparkSession, path: str) -> DataFrame:
    """One-row full-width ingest report: S10's counts plus the clean
    char mass and distinct lang/source cardinalities (the numbers an
    ingest dashboard wants). Classification is projection-invariant
    by construction here (the from_csv whole-line parse, see _parse),
    so these counts agree with the clean/quarantine relations at any
    width — pinned by test_csv_report_agrees_with_split."""
    scan = csv_scan(spark, path)
    ok = _ok()
    return scan.select(
        F.sum(F.when(ok, 1).otherwise(0)).cast("bigint").alias("n_clean"),
        F.sum(F.when(~ok, 1).otherwise(0)).cast("bigint").alias("n_quarantined"),
        F.sum(F.when(ok, F.size(F.split("text", " "))).otherwise(0))
        .cast("bigint")
        .alias("clean_tokens"),
        F.sum(F.when(ok, F.col("n_chars")).otherwise(0)).cast("bigint").alias("clean_chars"),
        F.count_distinct(F.when(ok, F.col("lang"))).cast("bigint").alias("n_langs"),
        F.count_distinct(F.when(ok, F.col("source"))).cast("bigint").alias("n_sources"),
    )


# --- S11 oracle surface --------------------------------------------------
#
# A deterministic CSV fixture — every row of {sf_dir}/documents.parquet
# as one headerless comma-joined line, plus the crafted broken lines
# below — read by BOTH engines: Spark through the PERMISSIVE scan,
# DuckDB through a raw-line read + str_split + try_cast validation
# spelling the identical classification rule.

# one line per failure class a real delimited delivery produces
S11_BROKEN_LINES = [
    "too few,en",                                 # arity 2
    "9,too,many,fields,here,extra,cols",          # arity 7
    "notanint,text here,en,src1,9",               # doc_id type failure
    ",missing id,en,src1,10",                     # empty doc_id (null conversion, no corrupt record)
    "900000003,,en,src1,0",                       # empty text
    "900000004,ok text,en,src1,xx",               # n_chars type failure
    "900000006,extra tail,en,src1,7,stray",       # arity 6 with a VALID 5-prefix
]

# the dialect pin: with quoting DISABLED this is a CLEAN row whose
# text carries a literal double-quote byte (under quote handling it
# would swallow the rest of the line and quarantine)
S11_QUOTE_LINE = '900000005,"unterminated quote,en,src1,5'


def s11_fixture_path(sf_dir: str) -> str:
    """Cache path, keyed on the FULL sf_dir path plus the size+mtime
    of documents.parquet (the s10_fixture_path rule — a regenerated
    corpus or a shared basename never reuses a stale fixture)."""
    import hashlib
    import tempfile
    from pathlib import Path

    src = Path(sf_dir.rstrip("/")) / "documents.parquet"
    try:
        st = src.stat()
        stamp = f"{src.resolve()}:{st.st_size}:{st.st_mtime_ns}"
    except OSError:
        stamp = str(src)
    # the crafted lines are part of the fixture's identity too: a
    # code-side change to the failure-class roster must not reuse a
    # fixture built under the old roster
    stamp += "|" + "|".join([S11_QUOTE_LINE, *S11_BROKEN_LINES])
    key = hashlib.sha1(stamp.encode()).hexdigest()[:16]
    return str(
        Path(tempfile.gettempdir())
        / f"maggy_s11_{Path(sf_dir.rstrip('/')).name}_{key}"
        / "docs.csv"
    )


def ensure_s11_fixture(sf_dir: str) -> str:
    """Write the fixture once (atomic rename; deterministic: documents
    sorted by doc_id, then the quote line, then the broken lines).
    Raises if any document field would break the delimiter-free-
    fields dialect (a comma or newline inside a value) — the fixture
    must not silently produce a different corpus than it claims."""
    import os
    from pathlib import Path

    import pyarrow.parquet as pq

    out = Path(s11_fixture_path(sf_dir))
    if out.exists():
        return str(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet").sort_by("doc_id")
    lines = []
    for row in tbl.to_pylist():
        vals = [str(row[k]) for k in ("doc_id", "text", "lang", "source", "n_chars")]
        for v in vals:
            if "," in v or "\n" in v or "\r" in v:
                raise ValueError(
                    f"documents value breaks the delimiter-free-fields dialect: {v!r}"
                )
        lines.append(",".join(vals))
    lines.append(S11_QUOTE_LINE)
    lines += S11_BROKEN_LINES
    tmp = out.with_suffix(".tmp")
    tmp.write_text("\n".join(lines) + "\n", encoding="utf-8")
    os.replace(tmp, out)
    return str(out)


def s11_csv_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The typed CLEAN relation of the fixture scan — the documents
    table plus exactly the literal-quote dialect-pin row."""
    clean, _q = csv_ingest(spark, ensure_s11_fixture(sf_dir))
    return clean


def s11_csv_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row ingest report over the fixture."""
    return csv_ingest_report(spark, ensure_s11_fixture(sf_dir))


def _s11_raw_lines_sql(path: str) -> str:
    # raw-line read (the S10 idiom): \x01 delimiter never occurs,
    # quoting disabled, so each physical line arrives verbatim
    return (
        f"read_csv('{path}', delim=E'\\x01', header=false, quote='', escape='', "
        "columns={'line': 'VARCHAR'})"
    )


_S11_PARTS = """
    SELECT str_split(line, ',') AS p FROM {raw}
"""

# the classification rule, spelled once: arity 5, doc_id token
# non-empty and castable, text token non-empty, n_chars token empty
# OR castable (empty = null conversion; non-empty uncastable = the
# corrupt channel)
_S11_OK = (
    "len(p) = 5 AND p[1] <> '' AND try_cast(p[1] AS BIGINT) IS NOT NULL "
    "AND p[2] <> '' AND (p[5] = '' OR try_cast(p[5] AS BIGINT) IS NOT NULL)"
)


def s11_clean_sql_for_path(path: str) -> str:
    """DuckDB twin of the clean split over ANY csv path (file or
    glob) — shared by the sf-dir fixture case and the streaming
    end-state oracle. NULLIF mirrors Spark CSV's empty-token -> NULL
    conversion on the string columns."""
    return f"""
WITH parts AS ({_S11_PARTS.format(raw=_s11_raw_lines_sql(path))})
SELECT try_cast(p[1] AS BIGINT) AS doc_id,
       nullif(p[2], '') AS text,
       nullif(p[3], '') AS lang,
       nullif(p[4], '') AS source,
       try_cast(p[5] AS BIGINT) AS n_chars
FROM parts
WHERE {_S11_OK}
"""


def s11_clean_sql(sf_dir: str) -> str:
    return s11_clean_sql_for_path(s11_fixture_path(sf_dir))


def s11_report_sql_for_path(path: str) -> str:
    return f"""
WITH parts AS ({_S11_PARTS.format(raw=_s11_raw_lines_sql(path))}),
cls AS (
    SELECT {_S11_OK} AS ok, p[2] AS text,
           try_cast(p[5] AS BIGINT) AS n_chars,
           nullif(p[3], '') AS lang, nullif(p[4], '') AS source
    FROM parts
)
SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_clean,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT) AS n_quarantined,
       CAST(sum(CASE WHEN ok THEN len(str_split(text, ' ')) ELSE 0 END) AS BIGINT)
           AS clean_tokens,
       CAST(sum(CASE WHEN ok THEN n_chars ELSE 0 END) AS BIGINT) AS clean_chars,
       CAST(count(DISTINCT CASE WHEN ok THEN lang END) AS BIGINT) AS n_langs,
       CAST(count(DISTINCT CASE WHEN ok THEN source END) AS BIGINT) AS n_sources
FROM cls
"""


def s11_report_sql(sf_dir: str) -> str:
    return s11_report_sql_for_path(s11_fixture_path(sf_dir))


# module-level constants for the offline oracle table (gate sf0.01;
# the builders above serve any other dir — check_offline rebuilds)
_S11_DEFAULT_DIR = "/root/testdata/sf0.01"
S11_CLEAN_SQL = s11_clean_sql(_S11_DEFAULT_DIR)
S11_REPORT_SQL = s11_report_sql(_S11_DEFAULT_DIR)


def csv_scan_stream(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> DataFrame:
    """`readStream` form of csv_scan — the live delivery directory,
    same text scan + from_csv whole-line parse (so the stream's
    classification is projection-invariant exactly like the batch
    path). Stateless: the split is a row-local predicate; exactly-
    once file tracking comes from the file-source checkpoint."""
    return (
        spark.readStream.option("maxFilesPerTrigger", 1)
        .text(path)
        .select(F.col("value"), _parse(schema).alias("p"))
        .select("value", "p.*")
    )


def csv_ingest_stream(
    spark: SparkSession, path: str, schema: T.StructType = DOC_SCHEMA
) -> tuple[DataFrame, DataFrame]:
    """(clean_stream, quarantine_stream): the batch split per
    micro-batch (jsonl_ingest_stream's contract); quarantine carries
    the verbatim raw line."""
    scan = csv_scan_stream(spark, path, schema)
    ok = _ok()
    clean = scan.where(ok).select(*[f.name for f in schema.fields])
    quarantine = scan.where(~ok).select(F.col("value").alias("raw_line"))
    return clean, quarantine
