"""The data-recipe loop: derive -> gate -> apply -> order.

A pre-training run decides WHAT mix of the corpus to train on before
any shard is written. This example composes the round-12 recipe
operators end-to-end on the synthetic corpus:

1. derive  — pl18_temperature_mix: per-source sampling weights
             (p ∝ sqrt(token mass), the XLM-R/mT5 temperature rule)
2. gate    — tx19_ccnet_bucket: per-language head/middle/tail
             perplexity tertiles (CCNet); keep head+middle
3. apply   — pl19_temperature_apply: per-doc repeat plan realizing
             pl18's epochs via deterministic stochastic rounding
4. order   — pl9_epoch_shuffle_plan over the surviving copies,
             then pl21_fair_interleave so every batch window carries
             each source proportionally (round-13)
5. budget  — pl22_pps_sample: a token-budgeted systematic PPS
             subsample when the run targets fewer tokens (round-13)
6. serve   — ann16_mmr_rerank for diversity plus
             ann17_filtered_topk for metadata-scoped retrieval over
             the finished corpus's embeddings

Every stage is an oracle-checked operator; this example only wires
them and prints the decision numbers a recipe run would log.

Run: python examples/data_recipe.py [sf_dir]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-data-recipe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.pipeline import (
        pl9_epoch_shuffle_plan,
        pl18_temperature_mix,
        pl19_temperature_apply,
        pl21_fair_interleave,
        pl22_pps_sample,
    )
    from maggy_spark.functions.similarity import ann16_mmr_rerank, ann17_filtered_topk
    from maggy_spark.functions.text import tx19_ccnet_bucket

    # 1. derive the mixture
    mix = pl18_temperature_mix(spark, sf_dir)
    print("temperature mixture (p ∝ sqrt(tokens); epochs = repeat factor):")
    mix.orderBy(F.desc("n_tokens")).show(5)

    # 2. the CCNet gate: keep head+middle, drop the tail third
    buckets = tx19_ccnet_bucket(spark, sf_dir)
    ledger = buckets.groupBy("lang", "bucket").count().orderBy("lang", "bucket")
    print("CCNet perplexity tertiles per language:")
    ledger.show(20)
    kept_ids = buckets.where(F.col("bucket") != "tail").select("doc_id")

    # 3. apply the mixture as a per-doc repeat plan, gated to head+middle
    copies = pl19_temperature_apply(spark, sf_dir).join(kept_ids, "doc_id")
    stats = copies.groupBy("source").agg(
        F.countDistinct("doc_id").alias("docs_kept"),
        F.count("*").alias("copies_emitted"),
    )
    print("mixture applied (after the CCNet gate):")
    stats.orderBy("source").show(5)

    # 4. epoch ordering over the surviving copies (pl9's plan keys on
    # doc_id — the dataloader unions the copy stream through it)
    plan = pl9_epoch_shuffle_plan(spark, sf_dir).join(kept_ids, "doc_id")
    print(f"epoch-shuffle plan rows over kept docs: {plan.count()}")

    # 4b. fair interleave: the global dataloader order that keeps
    # every batch window source-proportional (closed-form rank)
    inter = pl21_fair_interleave(spark, sf_dir).join(kept_ids, "doc_id")
    print("fair-interleave head of the global order:")
    inter.orderBy("global_rank").show(8)

    # 4c. token-budget subsample: systematic PPS over the token line
    # (exactly n_target sampling points; heavy docs always kept)
    pps = pl22_pps_sample(spark, sf_dir).join(kept_ids, "doc_id")
    print(f"PPS-subsample kept docs (of the gated set): {pps.count()}")

    # 5. the serving-side readouts: diversity-reranked neighbors and
    # metadata-filtered (same-label) search
    print("MMR-reranked serving results (0.5*relevance - 0.5*redundancy):")
    ann16_mmr_rerank(spark, sf_dir).orderBy("query_id", "pick_rank").show(8)
    print("filtered (same-label) top-k:")
    ann17_filtered_topk(spark, sf_dir).orderBy("query_id", "rank").show(8)

    spark.stop()


if __name__ == "__main__":
    main()
