"""Incremental corpus ingest: the production near-dup path.

A long-lived corpus keeps a SimHash SIGNATURE STORE; each arriving
batch (and each streaming micro-batch) probes the store instead of
re-running a corpus x corpus sweep. This example drives all three
forms over the same store:

1. batch probe      — dd11_incremental_near_dup (delta vs store)
2. streaming alerts — near_dup_alert_stream (micro-batches vs store)
3. full sweep       — dd7 + dd10 components (the periodic compaction
                      job that also collapses clusters)
4. map refresh      — dd20_incremental_components (previous star map
                      + the delta probe's edges; equals the full
                      rebuild without the store x store re-join)

Run: python examples/incremental_ingest.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-incremental-ingest")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.dedup import (
        simhash_band_relation,
        dd10_near_dup_components,
        dd11_incremental_near_dup,
        dd20_incremental_components,
    )

    # the signature store: signed once per session, shared by every path
    bands, band_bits, total_bits = simhash_band_relation(spark, sf_dir)
    print(f"signature store: {bands.count()} band rows, {band_bits}-bit bands, {total_bits}-bit signatures")

    # 1. batch probe: pairs the 10%-delta batch introduces
    inc = dd11_incremental_near_dup(spark, sf_dir)
    print(f"batch probe: {inc.count()} delta-touching near-dup pairs")
    inc.orderBy("hamming", "doc_a", "doc_b").show(5)

    # 2. streaming alerts: feed a few docs (one an exact copy of a
    # stored doc) through the stateless stream-static probe
    import tempfile

    from maggy_spark.streaming import near_dup_alert_stream

    twin_text = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") == 1)
        .select("text")
        .first()
        .text
    )
    from datetime import datetime

    feed_dir = tempfile.mkdtemp(prefix="maggy_ingest_feed_")
    schema = "doc_id bigint, text string, ts timestamp"
    spark.createDataFrame(
        [
            (90001, twin_text, datetime(2024, 1, 1, 0, 0, 0)),
            (90002, "vocabulary disjoint from the stored corpus entirely", datetime(2024, 1, 1, 0, 0, 1)),
        ],
        schema,
    ).write.mode("overwrite").parquet(feed_dir)
    stream = spark.readStream.schema(schema).parquet(feed_dir)
    q = (
        near_dup_alert_stream(stream, bands, band_bits)
        .writeStream.format("memory")
        .queryName("ingest_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    alerts = spark.sql("SELECT doc_id, store_doc, hamming FROM ingest_alerts ORDER BY doc_id, store_doc")
    print(f"streaming alerts: {alerts.count()}")
    alerts.show(5)

    # 3. the periodic compaction sweep: full pair graph -> components
    comps = dd10_near_dup_components(spark, sf_dir)
    stats = comps.agg(
        F.count("*").alias("docs"),
        F.sum(F.col("is_duplicate").cast("int")).alias("near_dups_dropped"),
        F.max("cluster_size").alias("largest_cluster"),
    ).first()
    print(
        f"compaction sweep: {stats.docs} docs, {stats.near_dups_dropped} near-dups dropped, "
        f"largest cluster {stats.largest_cluster}"
    )

    # 4. the incremental map refresh: previous snapshot's star map +
    # the batch probe's edges — must equal the full sweep exactly
    inc_comps = dd20_incremental_components(spark, sf_dir)
    diff = inc_comps.exceptAll(comps).count() + comps.exceptAll(inc_comps).count()
    print(f"incremental refresh: {inc_comps.count()} docs mapped, diff vs full sweep = {diff}")


if __name__ == "__main__":
    main()
