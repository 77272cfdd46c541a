"""Training-data pipeline over the synthetic corpus: dedup ->
near-dup -> quality filter -> repetition filter -> benchmark
decontamination -> stratified sample -> worker-aligned shards — the
LLM-data-prep extensions composed end-to-end.

Run: python examples/corpus_pipeline.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-corpus-pipeline")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.pipeline import corpus_to_shards, pl1_corpus_prep, pl2_stratified_sample
    from maggy_spark.sources.data import count_shard_rows, shard_parquet_reader

    kept = pl1_corpus_prep(spark, sf_dir)
    print(f"survivors after dedup+quality: {kept.count()}")
    kept.orderBy(F.desc("bpe_tokens")).show(5)

    # round-6 quality stages: Gopher rule decisions, the unigram-LM
    # perplexity band (cut BOTH tails — word salad scores low,
    # template spam scores high), and the duplicated-span mass cap
    # (docs that are mostly verbatim copies of other docs)
    from maggy_spark.functions.dedup import dd13_span_dedup
    from maggy_spark.functions.text import tx9_gopher_quality, tx10_unigram_logprob

    gopher_keep = tx9_gopher_quality(spark, sf_dir).where("keep").select("doc_id")
    lm = tx10_unigram_logprob(spark, sf_dir)
    lo, hi = lm.approxQuantile("avg_logprob", [0.05, 0.95], 0.01)
    lm_keep = lm.where(F.col("avg_logprob").between(lo, hi)).select("doc_id")
    span_keep = dd13_span_dedup(spark, sf_dir).where(F.col("dup_token_frac") <= 0.8).select(
        "doc_id"
    )
    kept = kept.join(gopher_keep, "doc_id").join(lm_keep, "doc_id").join(span_keep, "doc_id")
    print(f"after Gopher rules + LM band + span-dedup cap: {kept.count()}")

    # round-5 stages: drop repetitive boilerplate and anything that
    # leaks a held-out benchmark document into the training split
    from maggy_spark.functions.dedup import dd9_decontaminate
    from maggy_spark.functions.text import tx7_repetition

    rep = tx7_repetition(spark, sf_dir)
    repetitive = rep.where((F.col("top_word_frac") > 0.2) | (F.col("type_token_ratio") < 0.3))
    contaminated = dd9_decontaminate(spark, sf_dir).select(
        F.col("train_doc").alias("doc_id")
    ).distinct()
    # NOT broadcast: the repetitive set is a constant fraction of the
    # corpus (unbounded at scale), so the anti-join must shuffle
    drop = repetitive.select("doc_id").union(contaminated).distinct()
    kept = kept.join(drop, "doc_id", "left_anti")
    # the benchmark slice itself must never train: dd9 flags TRAIN
    # docs that contain an eval doc, but the eval docs (doc_id % 100
    # == 0 here) also have to leave the training split
    kept = kept.where(F.col("doc_id") % 100 != 0)
    print(f"after repetition + decontamination filters: {kept.count()}")

    # fuzzy dedup: collapse SimHash near-dup CLUSTERS (pair evidence
    # isn't transitive — dd10 runs connected components over the pair
    # graph) and keep one representative per cluster. The winner is
    # the min SURVIVING doc per cluster, not dd10's global min: the
    # global representative may already have fallen to an earlier
    # filter, and dropping the whole cluster with it would lose
    # content no surviving copy duplicates.
    from maggy_spark.functions.dedup import dd10_near_dup_components

    comps = dd10_near_dup_components(spark, sf_dir)
    tagged = kept.join(comps.select("doc_id", "cluster_rep"), "doc_id")
    winners = tagged.groupBy("cluster_rep").agg(F.min("doc_id").alias("doc_id"))
    kept = tagged.join(winners, ["cluster_rep", "doc_id"]).drop("cluster_rep")
    n_clusters = comps.where(F.col("cluster_size") > 1).select("cluster_rep").distinct().count()
    print(f"after near-dup component dedup: {kept.count()} ({n_clusters} multi-doc clusters collapsed)")

    sample = pl2_stratified_sample(spark, sf_dir)
    sample.groupBy("lang").count().orderBy("lang").show()

    # rebalance the source mixture to uniform — rates derived from
    # the corpus itself, so a drifting crawl mix stays equalized
    from maggy_spark.functions.pipeline import pl8_source_mix

    pl8_source_mix(spark, sf_dir).groupBy("source").count().orderBy("source").show()

    # publish the filter funnel (how much each rule bites) and carve
    # leakage-free train/val/test splits before sharding
    from maggy_spark.functions.pipeline import pl4_filter_funnel, pl5_leakage_split

    pl4_filter_funnel(spark, sf_dir).orderBy("seq").show()
    splits = pl5_leakage_split(spark, sf_dir)
    splits.groupBy("split").count().orderBy("split").show()
    # invariant: a dup pair can never straddle splits — its members
    # share the cluster rep, and the split hashes the rep
    leaks = (
        splits.alias("a")
        .join(splits.alias("b"), F.col("a.cluster_rep") == F.col("b.cluster_rep"))
        .where(F.col("a.split") != F.col("b.split"))
        .count()
    )
    print(f"cross-split duplicate leaks: {leaks} (must be 0)")

    # round-7 stages: per-cluster survivor POLICY (keep the longest
    # member, not the min id), per-source distribution drift, the
    # packing plan that turns surviving docs into fixed-context
    # training sequences, and the deterministic epoch shuffle the
    # dataloader replays
    from maggy_spark.functions.dedup import dd14_cluster_representatives
    from maggy_spark.functions.pipeline import pl7_sequence_pack_plan, pl9_epoch_shuffle_plan
    from maggy_spark.functions.text import tx11_source_drift

    dd14_cluster_representatives(spark, sf_dir).where("keep AND cluster_size > 1").orderBy(
        F.desc("cluster_size")
    ).show(5)
    tx11_source_drift(spark, sf_dir).orderBy(F.desc("kl_vs_corpus")).show(5)
    pack = pl7_sequence_pack_plan(spark, sf_dir)
    n_windows = pack.agg(F.max("window_end")).collect()[0][0]
    print(f"packing plan: {pack.count()} doc spans -> {n_windows + 1} context windows")
    pl9_epoch_shuffle_plan(spark, sf_dir).groupBy("epoch", "shard").count().orderBy(
        "epoch", "shard"
    ).show(6)

    # round-8: the whole lineage as ONE audited build — per-stage
    # survivor/token ledger (what a corpus release publishes), the
    # PII redaction plan, and the cross-source duplication matrix
    from maggy_spark.functions.dedup import dd15_cross_source_dup
    from maggy_spark.functions.pipeline import pl13_full_corpus_build
    from maggy_spark.functions.text import tx12_pii_scan

    print("corpus-build ledger:")
    pl13_full_corpus_build(spark, sf_dir).orderBy("seq").show(truncate=False)
    n_flagged = tx12_pii_scan(spark, sf_dir).where("needs_redaction").count()
    print(f"documents flagged for PII redaction: {n_flagged}")
    dd15_cross_source_dup(spark, sf_dir).orderBy(F.desc("shared_fingerprints")).show(5)

    out = "/tmp/maggy_example_corpus"
    corpus_to_shards(spark, sf_dir, out, n_shards=4)
    for rank in range(4):
        n = count_shard_rows(out, rank, 4)
        print(f"worker {rank}: {n} docs", end="; ")
    print()
    # a training worker consumes its shard without a Spark session:
    first_batch = next(shard_parquet_reader(out, rank=0, world_size=4, batch_size=64))
    print(f"rank-0 first batch: {len(first_batch)} rows, columns={list(first_batch.columns)}")


if __name__ == "__main__":
    main()
