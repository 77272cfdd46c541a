"""Distributed BPE tokenizer training + encoding over the corpus.

`bpe_train` learns the merge list with the vocab-collapse trick (the
corpus's token OCCURRENCES collapse to |vocab| distinct-word rows
before any character work — one scan, then every merge round is a
JVM-side fold over the tiny symbol table). `bpe_encode` applies the
ranked merges to every document — trained lists this size compile
into JVM-side rank-order folds (round 10: no Python in the encode
path either); GPT-scale merge lists fall back to the mapInPandas
priority loop with a per-batch word memo.

Run: python examples/tokenizer_training.py [sf_dir] [n_merges]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-bpe")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.text import bpe_encode, bpe_train

    merges = bpe_train(spark, sf_dir, n_merges=n_merges)
    print(f"learned {len(merges)} merges:")
    for i, (left, right, cnt) in enumerate(merges):
        print(f"  {i:2d}: {left!r} + {right!r}  (pair count {cnt})")

    enc = bpe_encode(spark, sf_dir, merges)
    stats = enc.agg(
        F.sum("n_words").alias("words"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).first()
    print(
        f"\nencoded corpus: {stats.words} words -> {stats.bpe_tokens} BPE tokens "
        f"({stats.bpe_tokens / stats.words:.2f} tokens/word)"
    )
    print("\nsample encodings:")
    for r in enc.orderBy("doc_id").limit(3).collect():
        print(f"  doc {r.doc_id}: {r.n_words} words -> {r.n_bpe_tokens} tokens; first 8: {r.tokens[:8]}")
    spark.stop()


if __name__ == "__main__":
    main()
