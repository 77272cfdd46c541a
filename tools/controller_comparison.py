"""Controller regret comparison (VERDICT r13 item 3, closing part):
run the SAME objective/budget/seed through three controllers —
random search, GP-BO, and the r14 PBT controller — via the real
lagom() loop, persist each run's trials relation (the S6 sink), and
compute the a13 best-so-far regret curve over the union BOTH in
Spark and in DuckDB over the same parquet bytes (the offline-oracle
discipline applied to runtime output: the controllers themselves are
nondeterministic ACROSS engines by nature — they only run in Spark —
so what is cross-engine-pinned is the EVALUATION relation over their
recorded trials).

Writes PBT_COMPARISON.json: per-controller final best_so_far, curve
lengths, the cross-engine match flag, and the winning controller.

Usage: python tools/controller_comparison.py [out.json]
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

N_TRIALS = 16
SEED = 42

REGRET_SQL = """
SELECT controller, seq, final_metric,
       max(final_metric) OVER (PARTITION BY controller ORDER BY seq) AS best_so_far,
       (max(final_metric) OVER (PARTITION BY controller ORDER BY seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        OR final_metric > max(final_metric) OVER (PARTITION BY controller ORDER BY seq
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS improved
FROM runs
"""


def objective(x):
    return -((x - 0.3) ** 2)


def regret_curves_spark(spark, union_path: str):
    """a13's window lifted to a per-controller partition — the
    multi-run comparison relation."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    t = spark.read.parquet(union_path).select("controller", "seq", "final_metric")
    w = Window.partitionBy("controller").orderBy("seq")
    prev = w.rowsBetween(Window.unboundedPreceding, -1)
    best = F.max("final_metric").over(w)
    prior = F.max("final_metric").over(prev)
    return t.select(
        "controller", "seq", "final_metric",
        best.alias("best_so_far"),
        (prior.isNull() | (F.col("final_metric") > prior)).alias("improved"),
    )


def main() -> int:
    out_path = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "PBT_COMPARISON.json"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from maggy_spark import Searchspace, lagom
    from maggy_spark.config import HyperparameterOptConfig
    from maggy_spark.optimizers import Pbt

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    work = Path(tempfile.mkdtemp(prefix="ctrl_cmp_"))
    controllers = {
        "random": "randomsearch",
        "gp": "gp",
        "pbt": Pbt(population=4),
    }
    frames = []
    results = {}
    for name, opt in controllers.items():
        cfg = HyperparameterOptConfig(
            num_trials=N_TRIALS, optimizer=opt,
            searchspace=Searchspace(x=("DOUBLE", [0.0, 1.0])),
            direction="max", es_policy="none", seed=SEED, parallelism=4,
            log_dir=str(work / name), name=f"cmp_{name}",
        )
        res = lagom(objective, cfg, spark)
        results[name] = {"best_val": res["best_val"], "num_trials": res["num_trials"]}
        t = spark.read.parquet(res["log_dir"] + "/trials")
        frames.append(
            t.where(F.col("status") == "FINALIZED")
            .select(F.lit(name).alias("controller"), "seq", "final_metric")
        )
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    union_path = str(work / "runs.parquet")
    union.write.mode("overwrite").parquet(union_path)

    spark_pd = (
        regret_curves_spark(spark, union_path)
        .toPandas()
        .sort_values(["controller", "seq"])
        .reset_index(drop=True)
    )

    import duckdb

    con = duckdb.connect()
    con.execute(f"CREATE VIEW runs AS SELECT * FROM read_parquet('{union_path}/*.parquet')")
    duck_pd = con.execute(REGRET_SQL).df().sort_values(["controller", "seq"]).reset_index(drop=True)

    match = spark_pd[duck_pd.columns].reset_index(drop=True).equals(duck_pd)
    finals = {
        c: float(g["best_so_far"].iloc[-1]) for c, g in spark_pd.groupby("controller")
    }
    payload = {
        "objective": "-(x-0.3)^2, x in [0,1], direction max",
        "n_trials": N_TRIALS,
        "seed": SEED,
        "results": results,
        "final_best_so_far": finals,
        "winner": max(finals, key=finals.get),
        "regret_rows": len(spark_pd),
        "oracle_match": bool(match),
    }
    out_path.write_text(json.dumps(payload, indent=1) + "\n")
    print(json.dumps(payload))
    return 0 if match else 1


if __name__ == "__main__":
    raise SystemExit(main())
