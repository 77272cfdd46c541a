"""The composed ingest gate: one foreachBatch lineage, every decision.

A production document feed runs its whole admission policy per
micro-batch — Gopher quality rules, PII redaction decision, exact-dup
probe against the landed store, SimHash near-dup probe, and a
volume-anomaly monitor — over ONE pinned scan of the batch
(streaming/ingest_stream.py). This example builds a landed store from
half the fixture corpus, streams the other half (plus crafted rows
that trip each gate) through the composed lineage, and prints the
per-batch decision ledger summary.

Run: python examples/ingest_gate.py [sf_dir]
"""

import datetime
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-ingest-gate")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.dedup import simhash_bands_for
    from maggy_spark.operators.events import ANOM_MIN_HISTORY
    from maggy_spark.streaming import ingest_gate_stream_fn

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # the landed store: fingerprints + SimHash bands (the two
    # persisted artifacts every arriving batch probes)
    store = docs.where(F.col("doc_id") % 2 == 0).select("doc_id", "text")
    store_bands, band_bits, _t = simhash_bands_for(store, store.count(), persist=False)
    store_bands = store_bands.localCheckpoint()
    store_fps = store.select(F.md5("text").alias("fingerprint")).localCheckpoint()

    # the feed: the other half, plus crafted rows tripping each gate
    ts0 = datetime.datetime(2026, 1, 1)
    dup_text = store.orderBy("doc_id").first().text
    crafted = spark.createDataFrame(
        [
            (900001, dup_text, "crawler", ts0),  # exact dup of a landed doc
            (900002, "mail bob@a.io and carol@b.org from 10.0.0.1 ref 4000000001", "crawler", ts0),
            (900003, "tiny", "crawler", ts0),  # fails the word-count rule
        ],
        "doc_id long, text string, source string, ts timestamp",
    )
    feed = (
        docs.where(F.col("doc_id") % 2 == 1)
        .select("doc_id", "text", "source", F.lit(ts0).alias("ts"))
        .unionByName(crafted)
    )

    # daily-count history per source (drives the volume monitor)
    d0 = int(ts0.timestamp() // 86400)
    hist_rows = [
        (r.source, d0 - k, 1 + k % 2)
        for r in feed.select("source").distinct().collect()
        for k in range(1, ANOM_MIN_HISTORY + 3)
    ]
    history = spark.createDataFrame(hist_rows, "source string, d bigint, n_events bigint")

    feed_dir = tempfile.mkdtemp(prefix="ingest_gate_feed_")
    feed.write.mode("overwrite").parquet(feed_dir)
    stream = spark.readStream.schema(feed.schema).parquet(feed_dir)

    def sink(ledger, batch_id):
        rows = ledger.collect()
        admitted = sum(r.admit for r in rows)
        print(f"\nbatch {batch_id}: {len(rows)} docs, {admitted} admitted")
        print("  rejected by gate:")
        print(f"    quality      : {sum(not r.quality_keep for r in rows)}")
        print(f"    pii          : {sum(r.needs_redaction for r in rows)}")
        print(f"    exact dup    : {sum(r.is_exact_dup for r in rows)}")
        print(f"    near dup     : {sum(r.is_near_dup for r in rows)}")
        flagged_days = {(r.source, r.day) for r in rows if r.is_volume_anomaly}
        print(f"  volume-anomalous (source, day) pairs: {len(flagged_days)}")
        for r in rows:
            if r.doc_id >= 900000:
                print(
                    f"  crafted doc {r.doc_id}: quality={r.quality_keep} "
                    f"pii={r.needs_redaction} exact={r.is_exact_dup} "
                    f"near={r.is_near_dup} -> admit={r.admit}"
                )

    q = (
        stream.writeStream.foreachBatch(
            ingest_gate_stream_fn(store_fps, store_bands, band_bits, sink, history)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark.stop()


if __name__ == "__main__":
    main()
