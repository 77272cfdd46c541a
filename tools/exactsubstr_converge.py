#!/usr/bin/env python
"""ExactSubstr convergence probe (VERDICT r10 item 3): iterate
dd16-plan -> dd17-rewrite over a corpus and record the per-pass
removable mass, turning Lee et al. 2021's "a second pass converges in
practice" acceptance into a measured table (SCALING.md).

Usage:
    python tools/exactsubstr_converge.py [sf_dir ...]

Prints one JSON line per sf_dir:
    {"sf_dir": ..., "passes": [{"pass": 0, "docs": N, "tokens": N,
      "plan_spans": N, "plan_tokens": N, "removable_frac": f}, ...]}
Entry 0 describes the ORIGINAL corpus (its plan is what rewrite pass 1
removes); the probe stops at the first empty plan (fixed point).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.01"]
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("exactsubstr-converge")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions.dedup import exact_substr_converge
    from maggy_spark.plans.fixtures import load_table

    for sf_dir in dirs:
        t0 = time.time()
        d = load_table(spark, sf_dir, "documents", fan_out=True)
        rows = exact_substr_converge(d, max_passes=4)
        print(
            json.dumps(
                {"sf_dir": sf_dir, "wall_sec": round(time.time() - t0, 1), "passes": rows}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
