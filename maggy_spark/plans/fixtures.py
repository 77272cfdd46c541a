"""Derived experiment fixtures over the synthetic TPC-H-ish tables.

The correctness gate (driver t2) compares every declared query
against a DuckDB oracle over the SAME parquet tables. The engine's
domain model is trials/metrics (SURVEY.md §1.1), so we derive those
tables deterministically from `orders`/`lineitem` with expressions
that evaluate bit-identically in Spark SQL and DuckDB:

- ``trials``  <- orders:   one trial per order. trial_id is the
  16-char md5 prefix of the order key string (the reference's id
  scheme, `maggy/trial.py:132-134`), final_metric = o_totalprice
  (NULL while PENDING), budget = o_orderkey % 3 (multi-fidelity
  rungs), status from o_orderstatus, params from
  (o_custkey % 50, o_orderpriority, o_orderkey % 500); params_json
  is the sorted-key JSON encoding used by the reference's trial-id
  hash (`json.dumps(params, sort_keys=True)`).
- ``metrics`` <- lineitem: per-trial step stream, step =
  l_linenumber, value = l_extendedprice (ragged 1..7 steps/trial,
  like early-stopped histories).
- ``metrics_raw`` adds deliberate duplicate-step and null-value rows
  to exercise the C2 dedup operator (`maggy/trial.py:93-108`).

Only exact-representable expressions are used (integer modulo, md5
of decimal integer strings, column copies) — no float arithmetic —
so the two engines agree bit-for-bit.

At scale: trials/metrics derivations are narrow projections over the
fact tables; they push column pruning into the parquet scan and add
no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# -- DuckDB side: CTE block prepended to every oracle query ------------

DUCKDB_FIXTURE_CTES = """
WITH trials AS (
    SELECT
        substr(md5(cast(o_orderkey AS VARCHAR)), 1, 16) AS trial_id,
        o_orderkey AS seq,
        cast(o_orderkey % 3 AS INTEGER) AS budget,
        CASE o_orderstatus
            WHEN 'F' THEN 'FINALIZED'
            WHEN 'O' THEN 'RUNNING'
            ELSE 'PENDING'
        END AS status,
        CASE WHEN o_orderstatus = 'P' THEN CAST(NULL AS DOUBLE)
             ELSE o_totalprice END AS final_metric,
        (o_orderkey % 7 = 0) AS early_stop,
        cast(o_custkey % 50 AS BIGINT) AS p1,
        o_orderpriority AS p2,
        cast(o_orderkey % 500 AS BIGINT) AS p3,
        '{"p1": ' || cast(o_custkey % 50 AS VARCHAR) || ', "p2": "'
            || o_orderpriority || '", "p3": '
            || cast(o_orderkey % 500 AS VARCHAR) || '}' AS params_json
    FROM orders
),
metrics AS (
    -- l_linenumber is NOT unique per order in the synthetic data;
    -- the reference's metric history dedups by step
    -- (maggy/trial.py:93-108), so dedup deterministically here
    -- (min value wins) to keep window frames engine-independent.
    SELECT
        substr(md5(cast(l_orderkey AS VARCHAR)), 1, 16) AS trial_id,
        cast(l_linenumber AS BIGINT) AS step,
        min(l_extendedprice) AS value
    FROM lineitem
    GROUP BY 1, 2
),
metrics_raw AS (
    SELECT trial_id, step, value FROM metrics
    UNION ALL
    SELECT trial_id, step, value FROM metrics WHERE step <= 2
    UNION ALL
    SELECT trial_id, step, CAST(NULL AS DOUBLE) AS value
    FROM metrics WHERE step = 1
)
"""


def with_fixtures(sql: str) -> str:
    """Prepend the shared fixture CTEs to an oracle query body."""
    return DUCKDB_FIXTURE_CTES + sql


# -- cross-engine deterministic uniforms -------------------------------

TWO_POW_52 = 4503599627370496.0  # 13 hex chars = 52 mantissa-exact bits


def hash_uniform(*parts):
    """Deterministic uniform in [0,1): the top 52 bits of
    md5(parts joined by ':') divided by 2^52. 52 bits fit a double
    mantissa exactly, and md5/substr/hex-to-int/divide evaluate
    bit-identically in Spark and DuckDB — the engine's reproducible
    sampling primitive (g1 draws, pl3 selection; same design as the
    md5 trial-id scheme, reference `maggy/trial.py:132-134`).
    DuckDB twin per column c and tag t:
    ``cast(cast(('0x' || substr(md5('t:' || c), 1, 13)) AS BIGINT)
    AS DOUBLE) / 4503599627370496.0``.
    Non-Column parts are stringified literals; Column parts must
    already be strings (cast explicitly so both engines hash the
    same bytes). Joined with F.concat + ':' literals, NOT concat_ws:
    concat_ws SKIPS null parts while DuckDB's || propagates them, so
    a null key column must yield a null uniform (row filtered) on
    both engines, not a constant hash of the surviving parts."""
    cols = [p if isinstance(p, Column) else F.lit(str(p)) for p in parts]
    pieces = [cols[0]]
    for c in cols[1:]:
        pieces += [F.lit(":"), c]
    h = F.md5(F.concat(*pieces))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("bigint").cast("double") / F.lit(TWO_POW_52)


# -- Spark side --------------------------------------------------------


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fan_out: bool = False
) -> DataFrame:
    """Read a source table; with ``fan_out``, guarantee the scan's
    parallelism matches the session's cores before CPU-heavy per-row
    expressions (shingling, minhash, simhash folds).

    A small table is one parquet file -> one input split, so an
    expression-bound operator would run on a single core no matter how
    wide the cluster is. The repartition is CONDITIONAL on the scan
    having fewer splits than ``defaultParallelism``: at real scale the
    scan already has >= cores splits (maxPartitionBytes splitting), the
    condition self-disables, and no shuffle of the wide text column is
    ever added where the data is large."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if fan_out:
        target = spark.sparkContext.defaultParallelism
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def session_cached(spark: SparkSession, key: tuple, build) -> DataFrame:
    """Session-scoped persisted relation: built once per key, shared
    by every operator that composes on it (the production pattern of
    a long-lived signatures/postings table), re-pinned if an external
    clearCache() dropped the blocks. Replaces per-call persist()s
    that leaked one cached copy per invocation.

    CONTRACT: keys embed the fixture dir, and fixture dirs are
    IMMUTABLE for the life of the session — regenerating data under
    the same path would silently serve the stale relation. A writer
    that must do that in-session calls `invalidate_session_cache`
    first (tests that rewrite temp fixtures do).

    Footprint (ADVICE r14): the cache itself never evicts, but the
    default DataFrame persist level is MEMORY_AND_DISK_DESER, so
    under storage-memory pressure blocks SPILL to local disk rather
    than evict-and-recompute or OOM. The corpus-scale seams pinned
    here (signatures, bands, tf, SQ/PQ stores, ingest base) are
    narrow projections — at sf0.1 the whole cache is ~100 MB; a
    long-lived deployment at larger SFs sizes executor storage for
    its seam set or calls `invalidate_session_cache(spark, sf_dir)`
    between corpus generations, exactly like dropping a persisted
    table it no longer serves."""
    from pyspark import StorageLevel

    cache = getattr(spark, "_maggy_session_cache", None)
    if cache is None:
        cache = {}
        spark._maggy_session_cache = cache
    if key in cache:
        df = cache[key]
        if df.storageLevel == StorageLevel.NONE:
            df.persist()
        return df
    df = build().persist()
    cache[key] = df
    return df


def checkpoint_with_metrics(df: DataFrame, ckpt, *aggs):
    """Checkpoint `df` through `ckpt` (an EAGER localCheckpoint /
    reliable-checkpoint lambda) while collecting aggregate metrics on
    the materializing action itself — a named CollectMetrics node, so
    the loop telemetry (convergence checksums, emptiness probes) costs
    ZERO extra jobs. Returns (checkpointed_df, tuple_of_metric_values).

    Deliberately NOT `pyspark.sql.Observation`: constructing one
    initializes the SparkSession's LAZY `observationManager` field,
    which is not java-serializable — after which any later task
    closure that captures the session fails with
    NotSerializableException(ObservationManager). pyspark.ml model
    summaries capture the session exactly that way (measured: one
    Observation-based observe anywhere in the session breaks a later
    LogisticRegression evaluate; the named form does not — pinned by
    test_star_loop_does_not_poison_ml_serialization). The named form
    only adds the plan node; the metrics are read back from the
    dataset's executed QueryExecution."""
    import decimal

    observed = df.observe("maggy_ckpt_metrics", *aggs)
    out = ckpt(observed)
    row = observed._jdf.queryExecution().observedMetrics().get("maggy_ckpt_metrics").get()
    vals = []
    for i in range(row.size()):
        v = row.get(i)
        if v is not None and not isinstance(v, (int, float, bool, str, decimal.Decimal)):
            # a java value py4j did not auto-convert (py4j maps
            # java.math.BigDecimal -> decimal.Decimal and primitives
            # to Python natives already): stringify through the JVM
            v = decimal.Decimal(v.toString())
        vals.append(v)
    return out, tuple(vals)


def invalidate_session_cache(spark: SparkSession, sf_dir: str | None = None) -> int:
    """Drop session-cached relations (and memoized corpus counts)
    whose key mentions `sf_dir` — or ALL of them when sf_dir is None.
    The escape hatch for the immutable-fixture-dir contract above;
    returns how many cached relations were dropped."""
    n = 0
    cache = getattr(spark, "_maggy_session_cache", None) or {}
    for key in [k for k in cache if sf_dir is None or sf_dir in k]:
        cache.pop(key).unpersist()
        n += 1
    counts = getattr(spark, "_maggy_corpus_counts", None) or {}
    for key in [k for k in counts if sf_dir is None or sf_dir in k]:
        counts.pop(key)
    return n


def corpus_count(spark: SparkSession, sf_dir: str, name: str) -> int:
    """Memoized `count(*)` of a source table, used to derive
    scale-aware blocking parameters (SimHash band bits, ANN plane
    count). The testdata tables are immutable, so the count is cached
    on the session — operators that each need the corpus size don't
    re-run the (metadata-only, but still one job each) parquet count."""
    cache = getattr(spark, "_maggy_corpus_counts", None)
    if cache is None:
        cache = {}
        spark._maggy_corpus_counts = cache
    key = (sf_dir, name)
    if key not in cache:
        cache[key] = load_table(spark, sf_dir, name).count()
    return cache[key]


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize `events.ts` to a proper TIMESTAMP whatever the reader
    surfaces:

    - TIMESTAMP(NANOS) parquet + ``nanosAsLong`` -> ``bigint`` nanos;
      convert with exact integer division (ns -> us).
    - isAdjustedToUTC=false parquet -> ``timestamp_ntz``; convert via
      pure wall-clock arithmetic: ``timestampdiff(MICROSECOND,
      ntz_epoch, ts)`` (NTZ operands, timezone-free by definition)
      -> ``timestamp_micros`` (defines the instant directly). Every
      session-tz-mediated alternative is machine-dependent — a plain
      cast shifts with spark.sql.session.timeZone, and so does
      to_utc_timestamp, which implicitly session-casts its NTZ input
      first — which would diverge from DuckDB's naive-timestamp
      semantics on any non-UTC box. This expression-level form
      touches no session state and yields a watermark-eligible
      TimestampType column (streaming C1/C2). Invariance is pinned by
      test_load_events_is_session_timezone_invariant."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = load_table(spark, sf_dir, "events")
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        naive_micros = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
        df = df.withColumn("ts", F.timestamp_micros(naive_micros))
    return df


_STATUS_TO_SOURCE = {"FINALIZED": "F", "RUNNING": "O", "PENDING": "P"}


def trials_df(spark: SparkSession, sf_dir: str, statuses: list[str] | None = None) -> DataFrame:
    """Spark twin of the ``trials`` CTE above.

    `statuses`: optional status filter applied to the SOURCE column
    (o_orderstatus) before the projection — a post-hoc filter on the
    CASE-derived `status` column does not constant-fold into a
    parquet-pushable predicate (Catalyst keeps the CASE as a
    DataFilter, so row-group stats pruning is lost); filtering the
    raw column reaches the scan as PushedFilters.
    """
    o = load_table(spark, sf_dir, "orders")
    if statuses:
        src = [_STATUS_TO_SOURCE[s] for s in statuses]
        o = o.where(F.col("o_orderstatus").isin(src))
    p1 = (F.col("o_custkey") % 50).cast("bigint")
    p3 = (F.col("o_orderkey") % 500).cast("bigint")
    return o.select(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 16).alias("trial_id"),
        F.col("o_orderkey").alias("seq"),
        (F.col("o_orderkey") % 3).cast("int").alias("budget"),
        F.when(F.col("o_orderstatus") == "F", F.lit("FINALIZED"))
        .when(F.col("o_orderstatus") == "O", F.lit("RUNNING"))
        .otherwise(F.lit("PENDING"))
        .alias("status"),
        F.when(F.col("o_orderstatus") == "P", F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice"))
        .alias("final_metric"),
        (F.col("o_orderkey") % 7 == 0).alias("early_stop"),
        p1.alias("p1"),
        F.col("o_orderpriority").alias("p2"),
        p3.alias("p3"),
        F.concat(
            F.lit('{"p1": '),
            p1.cast("string"),
            F.lit(', "p2": "'),
            F.col("o_orderpriority"),
            F.lit('", "p3": '),
            p3.cast("string"),
            F.lit("}"),
        ).alias("params_json"),
    )


def metrics_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of the ``metrics`` CTE above."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 16).alias("trial_id"),
            F.col("l_linenumber").cast("bigint").alias("step"),
            F.col("l_extendedprice").alias("value"),
        )
        # duplicate (order, linenumber) pairs exist in the synthetic
        # data; dedup by step like the reference's metric append
        # (maggy/trial.py:93-108), min value as the deterministic rep
        .groupBy("trial_id", "step")
        .agg(F.min("value").alias("value"))
    )


def metrics_raw_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of ``metrics_raw`` (adds dup-step and null rows).

    Built from the pre-dedup projection rather than three copies of
    the deduped `metrics` (saves two shuffles): because the dirty
    stream is consumed by min()-dedup (C2), raw rows vs deduped rows
    yield the identical result — duplicate (trial, step) rows only
    ever contribute their min, and null values are filtered first.
    """
    li = load_table(spark, sf_dir, "lineitem")
    raw = li.select(
        F.substring(F.md5(F.col("l_orderkey").cast("string")), 1, 16).alias("trial_id"),
        F.col("l_linenumber").cast("bigint").alias("step"),
        F.col("l_extendedprice").alias("value"),
    )
    dups = raw.where(F.col("step") <= 2)
    nulls = raw.where(F.col("step") == 1).select(
        "trial_id", "step", F.lit(None).cast("double").alias("value")
    )
    return raw.unionAll(dups).unionAll(nulls)
