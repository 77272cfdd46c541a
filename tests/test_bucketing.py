"""Bucketed-table layouts: shuffle-free per-trial operators, and the
salting fallback for skewed joins."""

import pytest
from pyspark.sql import functions as F

from maggy_spark.sources.bucketing import (
    materialize_metrics_bucketed,
    per_trial_stats_over_bucketed,
    prefix_avg_over_bucketed,
    salted_join,
)


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    return materialize_metrics_bucketed(spark, sf_dir, buckets=8)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_window_has_no_exchange(spark, bucketed):
    df = prefix_avg_over_bucketed(spark, bucketed)
    plan = _plan(df)
    assert "Exchange" not in plan  # bucketing satisfies the window's distribution
    # and the result matches the shuffling form
    from maggy_spark.operators.aggregations import a7_prefix_avg

    base = {(r.trial_id, r.step): r.prefix_avg for r in a7_prefix_avg(spark, "/root/testdata/sf0.001").collect()}
    got = {(r.trial_id, r.step): r.prefix_avg for r in df.collect()}
    assert got == base


def test_bucketed_groupby_has_no_exchange(spark, bucketed):
    df = per_trial_stats_over_bucketed(spark, bucketed)
    assert "Exchange" not in _plan(df)
    rows = df.collect()
    assert rows and all(r.n_steps >= 1 for r in rows)


def test_salted_join_correct_and_spread(spark):
    # skewed left: 'hot' key holds 90% of rows
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit("hot")).otherwise(F.concat(F.lit("k"), F.col("id"))).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.createDataFrame(
        [("hot", 1.0)] + [(f"k{i}", float(i)) for i in range(900, 1000)], "k string, w double"
    )
    plain = left.join(right, "k").agg(F.count("*"), F.sum("v"), F.sum("w")).collect()[0]
    salted = salted_join(left, right, "k", salt=8).agg(F.count("*"), F.sum("v"), F.sum("w")).collect()[0]
    assert tuple(plain) == tuple(salted)  # identical join result
    # the hot key's rows really spread across salt values
    spread = (
        left.withColumn("_salt", (F.rand(seed=42) * 8).cast("int"))
        .where("k = 'hot'")
        .select("_salt")
        .distinct()
        .count()
    )
    assert spread == 8


def test_colocated_join_has_no_shuffle(spark, sf_dir, bucketed):
    from maggy_spark.sources.bucketing import (
        colocated_trial_metrics_join,
        materialize_trials_bucketed,
    )

    materialize_trials_bucketed(spark, sf_dir, buckets=8)
    # the 100 TB case is big-big: disable broadcast so the join must
    # rely on bucket co-location (at toy scale Spark would broadcast
    # the small side, which is also shuffle-free but proves nothing)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = colocated_trial_metrics_join(spark)
        plan = _plan(df)
        assert "Exchange hashpartitioning" not in plan  # no shuffle on either side
        assert "SortMergeJoin" in plan and "Bucketed: true" in plan
        rows = df.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert rows and all(r.n_steps >= 1 for r in rows)
    # correctness vs the shuffling form
    from maggy_spark.plans.fixtures import metrics_df, trials_df
    import pyspark.sql.functions as F

    base = (
        trials_df(spark, sf_dir).select("trial_id", "status", "budget")
        .join(metrics_df(spark, sf_dir), "trial_id")
        .groupBy("trial_id", "status", "budget")
        .agg(F.count("*").alias("n_steps"), F.max("value").alias("best_value"))
    )
    assert {tuple(r) for r in rows} == {tuple(r) for r in base.collect()}


def test_document_store_dedup_is_shuffle_free(spark, sf_dir):
    from maggy_spark.sources.bucketing import (
        compact_document_store,
        dedup_over_document_store,
    )

    table = compact_document_store(spark, sf_dir, table="documents_store_t")
    dd = dedup_over_document_store(spark, table)
    plan = dd._jdf.queryExecution().executedPlan().toString()
    # the bucket layout co-locates equal fingerprints: the dd1 sweep
    # over the store must not exchange
    assert "Exchange" not in plan.split("== Initial Plan ==")[0]
    # same dedup relation as batch dd1 over the raw corpus
    from maggy_spark.functions.dedup import dd1_exact_dedup

    raw = dd1_exact_dedup(spark, sf_dir).select("keep_id", "n_copies")
    store = dd.select("keep_id", "n_copies")
    assert raw.exceptAll(store).count() == 0 and store.exceptAll(raw).count() == 0


def test_ingest_exact_probe_bucketed_store_saves_the_corpus_shuffle(spark, sf_dir):
    """The ingest_stream docstring's 100-TB claim, measured: probing
    the exact-dup seam against the fingerprint-BUCKETED store must
    shuffle only the (tiny) batch side — the same ledger against a
    plain unbucketed store relation pays one extra corpus-side
    exchange. Ledger values must be identical either way."""
    from pyspark.sql import functions as F

    from maggy_spark.sources.bucketing import compact_document_store
    from maggy_spark.streaming import ingest_base, ingest_decisions

    table = compact_document_store(spark, sf_dir, table="documents_store_ing")
    bucketed_fps = spark.table(table).select("fingerprint")
    plain_fps = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.md5("text").alias("fingerprint"))
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    batch = docs.where(F.col("doc_id") < 40).select(
        "doc_id", "text", "source", F.to_timestamp(F.lit("2026-01-01")).alias("ts")
    )
    from maggy_spark.functions.dedup import simhash_bands_for

    store_bands, b, _t = simhash_bands_for(docs.select("doc_id", "text"), 500, persist=False)
    store_bands = store_bands.localCheckpoint()
    base = ingest_base(batch, b).localCheckpoint()

    def n_exchanges(fps):
        led = ingest_decisions(base, fps, store_bands, b)
        plan = led._jdf.queryExecution().executedPlan().toString()
        initial = plan.split("== Initial Plan ==")[0]
        return led, initial.count("Exchange hashpartitioning")

    led_b, ex_b = n_exchanges(bucketed_fps)
    led_p, ex_p = n_exchanges(plain_fps)
    assert ex_b == ex_p - 1, (ex_b, ex_p)  # the corpus-side shuffle is gone
    rows_b = {r.doc_id: (r.is_exact_dup, r.is_near_dup, r.admit) for r in led_b.collect()}
    rows_p = {r.doc_id: (r.is_exact_dup, r.is_near_dup, r.admit) for r in led_p.collect()}
    assert rows_b == rows_p and rows_b
