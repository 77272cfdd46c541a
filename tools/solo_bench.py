"""Solo operator timing harness for A/B evidence (r14 optimization).

Times named operators exactly like bench.py's rep loop (noop sink,
System.gc before each tick, clearCache between reps) but in a
dedicated session with nothing else on the roster, so a single row's
cost can be compared across code versions without suite-position
noise. Prints per-name median/min/all-samples.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python tools/solo_bench.py <name> [...] [--reps N]

Names resolve against the registry first, then the bench extras
roster (same imports as bench.py).
"""

from __future__ import annotations

import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def _resolve(names: list[str]):
    from maggy_spark import registry

    qs = dict(registry.queries())
    # extras roster (the non-registry bench rows)
    from maggy_spark.functions.dedup import (
        dd19_containment_screen,
        dd21_lsh_s_curve,
        dd22_minhash_calibration,
        dd23_contamination_report,
    )
    from maggy_spark.functions.pipeline import (
        pl20_pack_efficiency,
        pl21_fair_interleave,
        pl22_pps_sample,
        pl23_weighted_sample,
        pl24_doremi_reweight,
    )
    from maggy_spark.functions.similarity import (
        ann3_ivf_topk,
        ann14_recall_eval,
        ann15_cluster_keywords,
        ann17_filtered_topk,
        ann18_range_search,
        ann19_filtered_ivf,
        ann20_selective_filtered_ivf,
        ann21_routing_recall_curve,
        ann22_incremental_store,
    )
    from maggy_spark.functions.text import tx17_tfidf_keywords, tx20_tokenizer_fertility

    extras = [
        dd19_containment_screen,
        dd21_lsh_s_curve,
        dd22_minhash_calibration,
        dd23_contamination_report,
        pl20_pack_efficiency,
        pl21_fair_interleave,
        pl22_pps_sample,
        pl23_weighted_sample,
        pl24_doremi_reweight,
        ann3_ivf_topk,
        ann14_recall_eval,
        ann15_cluster_keywords,
        ann17_filtered_topk,
        ann18_range_search,
        ann19_filtered_ivf,
        ann20_selective_filtered_ivf,
        ann21_routing_recall_curve,
        ann22_incremental_store,
        tx17_tfidf_keywords,
        tx20_tokenizer_fertility,
    ]
    for f in extras:
        qs.setdefault(f.__name__, f)
    # bench aliases
    qs.setdefault("ann20_selective_filtered_ivf", ann20_selective_filtered_ivf)
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown: {missing}; known sample: {sorted(qs)[:10]}...", file=sys.stderr)
        sys.exit(2)
    return {n: qs[n] for n in names}


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 5
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sel = _resolve(args)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("solo_bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warmups as bench.py
    spark.read.parquet(f"{sf_dir}/region.parquet").count()
    spark.range(1_000).selectExpr("sum(id)").collect()
    spark.range(256).repartition(int(cpus)).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    for name, fn in sel.items():
        spark.sparkContext.setJobDescription(f"solo:{name}")
        samples = []
        for _ in range(reps):
            spark._jvm.System.gc()
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
            spark.catalog.clearCache()
        med = statistics.median(samples)
        print(
            f"{name}: median={med:.3f} min={min(samples):.3f} "
            f"samples={[round(s, 3) for s in samples]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
