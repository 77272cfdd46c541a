"""Round-10 idle-box measurements (run ONLY with no other Spark/DuckDB
work on the machine — the round-9 lesson: concurrent load skews probe
timings up to 10x):

- ``--decades``: the three new operators (ann9 PQ+ADC, tx15 DSIR,
  dd16 removal plan) across the four decades, plus the JVM-fold
  bpe_encode at every decade with FIVE reps at sf1 — the VERDICT r9
  item-3 "done" check is the sf1 spread (max-min) staying within 3x
  the median.
- ``--ann-forensic``: ann1/2/3/5 at sf0.1, each rep in a FRESH
  SparkSession (the r8 mm1 forensic methodology) — attributes the r9
  ANN drift (ann1 0.52->0.84 etc.) to ambient load vs code.

Writes JSON lines to stdout and R10_PROBE.json.
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

DECADES = [
    ("/root/testdata/sf0.001", 0.001),
    ("/root/testdata/sf0.01", 0.01),
    ("/root/testdata/sf0.1", 0.1),
    ("/tmp/maggy_sf1", 1.0),
]


def _session(cpus: int = 32):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("r10-probe")
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm codegen + python workers so rep 1 isn't charged spin-up
    spark.range(256).repartition(cpus).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    return spark


def decades(rows: list) -> None:
    from tools.synth_scale import ensure_scale_dir

    ensure_scale_dir()
    spark = _session()
    from maggy_spark.functions.dedup import dd16_span_removal_plan
    from maggy_spark.functions.similarity import ann9_pq_adc
    from maggy_spark.functions.text import bpe_encode, bpe_train, tx15_dsir_score

    for sf_dir, sf in DECADES:
        for name, fn in (
            ("ann9_pq_adc", ann9_pq_adc),
            ("tx15_dsir_score", tx15_dsir_score),
            ("dd16_span_removal_plan", dd16_span_removal_plan),
        ):
            t0 = time.time()
            out = fn(spark, sf_dir).count()
            rows.append({"op": name, "sf": sf, "output": out, "sec": round(time.time() - t0, 2)})
            spark.catalog.clearCache()
        merges = bpe_train(spark, sf_dir, n_merges=20)
        reps = 5 if sf >= 1.0 else 2
        samples = []
        for _ in range(reps):
            t0 = time.time()
            bpe_encode(spark, sf_dir, merges).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
        spark.catalog.clearCache()
        med = statistics.median(samples)
        rows.append(
            {
                "op": "bpe_encode_jvm",
                "sf": sf,
                "samples": samples,
                "median": round(med, 2),
                "spread": round(max(samples) - min(samples), 2),
                "spread_within_3x_median": (max(samples) - min(samples)) <= 3 * med,
            }
        )
    spark.stop()


def ann_forensic(rows: list, reps: int = 3) -> None:
    sf_dir = "/root/testdata/sf0.1"
    for name in ("ann1_bruteforce_topk", "ann2_lsh_topk", "ann3_ivf_topk", "ann5_knn_graph"):
        samples = []
        for _ in range(reps):
            spark = _session()
            from maggy_spark import registry

            fn = registry.queries()[name]
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t0, 2))
            spark.stop()
        rows.append(
            {
                "op": name,
                "sf": 0.1,
                "mode": "fresh-session-per-rep",
                "samples": samples,
                "median": round(statistics.median(samples), 2),
            }
        )


def main() -> None:
    rows: list = []
    if "--ann-forensic" in sys.argv or len(sys.argv) == 1:
        ann_forensic(rows)
    if "--decades" in sys.argv or len(sys.argv) == 1:
        decades(rows)
    for r in rows:
        print(json.dumps(r))
    (REPO / "R10_PROBE.json").write_text("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
