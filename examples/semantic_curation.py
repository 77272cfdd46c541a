"""Semantic curation recipe over the synthetic corpus: the r11-r12
k-means family composed end-to-end the way Abbas et al. (SemDeDup)
and a FineWeb-style run would actually drive it —

  train clusters (ann10) -> health-check them (ann13) -> read the
  topic labels (ann15) -> prune semantic near-dups (ann11) ->
  diversity-first token-budget selection (pl15) -> token-balanced
  shard manifest (pl17) -> write the shards (corpus_to_token_shards)
  -> spot-check serving recall for the retrieval tier (ann14).

Every stage is an oracle-checked operator; this example only wires
them and prints the decision numbers a curation run would log.

Run: python examples/semantic_curation.py [sf_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (
        SparkSession.builder.master("local[*]")
        .appName("semantic-curation")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.pipeline import (
        corpus_to_token_shards,
        pl15_semantic_sample,
        pl17_shard_plan,
    )
    from maggy_spark.functions.similarity import (
        ann11_semdedup_prune,
        ann13_cluster_quality,
        ann14_recall_eval,
        ann15_cluster_keywords,
    )

    # 1-2. train + health-check (ann10 trains lazily under ann13)
    quality = ann13_cluster_quality(spark, sf_dir)
    qrow = quality.agg(
        F.count("*").alias("k"),
        F.min("min_cos").alias("worst_fit"),
        F.max("nn_sep").alias("closest_centroid_pair"),
        F.sum("n_loose").alias("loose_members"),
    ).collect()[0]
    print(
        f"clusters={qrow.k} worst_fit={qrow.worst_fit:.3f} "
        f"closest_pair={qrow.closest_centroid_pair:.3f} loose={qrow.loose_members}"
    )

    # 3. topic labels for the run log
    print("cluster labels (first 5 clusters):")
    for r in ann15_cluster_keywords(spark, sf_dir).where(F.col("rank") == 1).orderBy(
        "cluster_id"
    ).limit(5).collect():
        print(f"  cluster {r.cluster_id}: '{r.term}' (tf={r.tf}, score={r.score:.3f})")

    # 4-5. prune near-dups, then budgeted diversity selection
    pruned = ann11_semdedup_prune(spark, sf_dir)
    n_pruned = pruned.where("pruned").count()
    sel = pl15_semantic_sample(spark, sf_dir)
    kept = sel.where("selected")
    print(
        f"semdedup pruned={n_pruned}  "
        f"selected_docs={kept.count()}  "
        f"selected_tokens={kept.agg(F.sum('n_tokens')).collect()[0][0]}"
    )

    # 6-7. shard manifest + the actual write
    manifest = pl17_shard_plan(spark, sf_dir)
    print(f"shards={manifest.count()}")
    with tempfile.TemporaryDirectory() as out:
        corpus_to_token_shards(spark, sf_dir, f"{out}/shards")
        n_files = len(list(Path(out, "shards").glob("shard_id=*/*.parquet")))
        print(f"wrote {n_files} shard files")

    # 8. serving-tier acceptance: recall of each compressed index
    print("serving recall@k vs exact truth:")
    for r in (
        ann14_recall_eval(spark, sf_dir)
        .groupBy("engine")
        .agg(F.avg("recall").alias("mean_recall"))
        .orderBy("engine")
        .collect()
    ):
        print(f"  {r.engine}: {r.mean_recall:.2f}")

    spark.stop()


if __name__ == "__main__":
    main()
