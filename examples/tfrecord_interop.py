"""TFRecord feature-store interop: export a training table to
TFRecord shards, scan them back natively (no tensorflow needed), and
run the reference-shaped LOCO ablation scan that drops one feature at
parse time (`maggy/ablation/ablator/loco.py:41-80` removes the
ablated name from `feature_names` before building the dataset — here
the dropped column is never even materialized).

Run: python examples/tfrecord_interop.py [sf_dir]
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("maggy-spark-tfrecord")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.sources import tfrecord as tfr

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200).collect()
    out = Path(tempfile.mkdtemp(prefix="tfrecord_demo_"))
    # two shards: file count IS the scan parallelism (TFRecord has no
    # sync markers, so files don't split)
    half = len(docs) // 2
    for i, chunk in enumerate((docs[:half], docs[half:])):
        tfr.write_tfrecord_file(
            (
                {"doc_id": r.doc_id, "text": r.text, "n_chars": r.n_chars,
                 "lang": r.lang}
                for r in chunk
            ),
            str(out / f"part-r-{i}.tfrecord"),
        )

    schema = {"doc_id": "bigint", "text": "string", "n_chars": "bigint", "lang": "string"}
    df = tfr.read_tfexamples(spark, str(out / "*.tfrecord"), schema)
    print(f"native scan: {df.count()} rows, columns {df.columns}")

    ablated = tfr.loco_tfrecord_scan(spark, str(out / "*.tfrecord"), schema, "text")
    print(f"LOCO scan (text ablated at parse time): columns {ablated.columns}")
    ablated.show(3, truncate=40)
    spark.stop()


if __name__ == "__main__":
    main()
