"""Bucketed storage for the hot relations: co-located joins and
shuffle-free aggregation.

The aggregations kernel notes that at 100 TB the `metrics` table is
bucketed by trial_id so per-trial groupBys/windows reuse the storage
partitioning instead of shuffling. This module makes that concrete:
`materialize_metrics_bucketed` writes metrics with `bucketBy(trial_id)`
(sorted within buckets by step) into the session catalog, and
`prefix_avg_over_bucketed` runs the A7 window over it —
`tests/test_bucketing.py` asserts the executed plan contains NO
Exchange before the window/groupBy.

Salting lives here too: `salted_join` spreads a skewed join key over
`salt` sub-keys (replicating the small side) — the manual fallback
when AQE's skew-join split isn't applicable (e.g. non-shuffle-join
plans or pre-AQE clusters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEC = "decimal(18,4)"


def _reset_table(spark: SparkSession, table: str) -> None:
    """DROP the table and remove its orphaned warehouse location.

    A fresh in-memory catalog does not track tables from earlier
    sessions, but their warehouse directories survive and block
    saveAsTable with LOCATION_ALREADY_EXISTS. Deletion goes through
    the Hadoop FileSystem API so it works for ANY warehouse scheme
    (local, hdfs://, s3a://) — a local shutil.rmtree would silently
    no-op on remote warehouses.
    """
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    location = spark.conf.get("spark.sql.warehouse.dir").rstrip("/") + f"/{table}"
    hpath = jvm.org.apache.hadoop.fs.Path(location)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        fs.delete(hpath, True)


def materialize_metrics_bucketed(
    spark: SparkSession, sf_dir: str, table: str = "metrics_bucketed", buckets: int = 16
) -> str:
    """Write the metrics relation bucketed by trial_id, sorted by step
    within each bucket — the layout every per-trial operator reuses."""
    from maggy_spark.plans.fixtures import metrics_df

    _reset_table(spark, table)
    (
        metrics_df(spark, sf_dir)
        .write.mode("overwrite")
        .bucketBy(buckets, "trial_id")
        .sortBy("trial_id", "step")
        .saveAsTable(table)
    )
    return table


def prefix_avg_over_bucketed(spark: SparkSession, table: str = "metrics_bucketed") -> DataFrame:
    """A7 over the bucketed table: the window's hash requirement is
    satisfied by the bucketing, so the plan has no Exchange."""
    from pyspark.sql.window import Window

    m = spark.table(table)
    w = Window.partitionBy("trial_id").orderBy("step").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return m.select(
        "trial_id",
        "step",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)).alias("prefix_avg"),
    )


def per_trial_stats_over_bucketed(spark: SparkSession, table: str = "metrics_bucketed") -> DataFrame:
    """Per-trial aggregation over the bucketed table — shuffle-free
    groupBy on the bucketing key."""
    return spark.table(table).groupBy("trial_id").agg(
        F.count("*").alias("n_steps"),
        F.max("value").alias("best"),
        (F.sum(F.col("value").cast(DEC)).cast("double") / F.count("value")).alias("mean_value"),
    )


def materialize_trials_bucketed(
    spark: SparkSession, sf_dir: str, table: str = "trials_bucketed", buckets: int = 16
) -> str:
    """Trials bucketed on the same key/bucket-count as metrics: the
    layout that makes trial<->metrics joins co-located."""
    from maggy_spark.plans.fixtures import trials_df

    _reset_table(spark, table)
    (
        trials_df(spark, sf_dir)
        .write.mode("overwrite")
        .bucketBy(buckets, "trial_id")
        .sortBy("trial_id")
        .saveAsTable(table)
    )
    return table


def colocated_trial_metrics_join(
    spark: SparkSession, trials_table: str = "trials_bucketed", metrics_table: str = "metrics_bucketed"
) -> DataFrame:
    """trial<->metrics equi-join over co-bucketed tables: both sides
    read pre-hashed on trial_id, so the join plan has NO shuffle
    exchange — the C2/S9 join shape (SURVEY §2.6 equi-join) at
    100 TB."""
    t = spark.table(trials_table).select("trial_id", "status", "budget")
    m = spark.table(metrics_table)
    return t.join(m, "trial_id").groupBy("trial_id", "status", "budget").agg(
        F.count("*").alias("n_steps"),
        F.max("value").alias("best_value"),
    )


def salted_join(
    left: DataFrame, right: DataFrame, key: str, salt: int = 8, how: str = "inner"
) -> DataFrame:
    """Skew-spreading equi-join: the (large, skewed) left side gets a
    random salt in [0, salt), the (smaller) right side is replicated
    across all salt values, and the join key becomes (key, salt) — a
    hot key's rows land in `salt` tasks instead of one.

    Use when one key dominates a shuffle join and AQE's skew split
    can't kick in. Right-side replication multiplies its size by
    `salt`; keep the replicated side the smaller one.

    Only inner/left joins are valid: under right/full outer joins the
    (salt-1) non-matching replicas of each right row would surface as
    spurious null-padded output rows.
    """
    if how.replace("_", "").lower() not in ("inner", "left", "leftouter"):
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    salted_left = left.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt")
    salted_right = right.select("*", salts)
    out = salted_left.join(salted_right, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def compact_document_store(
    spark: SparkSession, sf_dir: str, table: str = "documents_store", buckets: int = 16
) -> str:
    """The batch-compaction half of the streaming ingest split
    (streaming/documents_stream.py): materialize the corpus bucketed
    by its dd1 content fingerprint, so the long-tail exact dedup the
    watermark horizon can't see runs SHUFFLE-FREE over the store.

    At 100 TB this is the periodic job that rewrites landed ingest
    into the canonical store layout; every later fingerprint-keyed
    pass (dedup sweeps, re-ingest reconciliation) reads the bucketed
    table and skips the corpus-wide exchange."""
    from maggy_spark.plans.fixtures import load_table

    _reset_table(spark, table)
    (
        load_table(spark, sf_dir, "documents")
        .withColumn("fingerprint", F.md5(F.col("text")))
        .write.mode("overwrite")
        .bucketBy(buckets, "fingerprint")
        .sortBy("fingerprint")
        .saveAsTable(table)
    )
    return table


def dedup_over_document_store(spark: SparkSession, table: str = "documents_store") -> DataFrame:
    """dd1 over the compacted store: group by the bucket key, keep the
    lowest doc_id — no Exchange in the plan (bucketing already
    co-locates equal fingerprints), verified by
    test_document_store_dedup_is_shuffle_free."""
    return (
        spark.table(table)
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )
