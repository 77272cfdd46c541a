"""Replay the OFFLINE oracle suite (tests/test_offline_oracles.CASES)
at an arbitrary scale factor — the out-of-registry twin of
check_oracle.py, so the extension operators' parity can be verified
above the suite's sf0.01 (e.g. at sf0.1, or the synthetic sf1).

Usage: python tools/check_offline.py [sf_dir] [case ...]
       python tools/check_offline.py [sf_dir] --names GLOB ...
       python tools/check_offline.py --out OFFLINE_PARITY_r13.json

With --out, a machine-readable per-case artifact is written (VERDICT
r12 item 5): {"sf_dir", "n_cases", "n_fail", "results": {name:
{"rows", "match", "secs", "err"}}} — the auditable record of the
non-gate correctness surface, one command per round. Subset runs
MERGE into an existing artifact (the sf1_parity.py convention).

Heavy oracle sides to know about: dd14/ann6/pl6 wrap the DuckDB
recursive-CTE transitive closure (dd10's oracle took ~31 min at
sf0.1), and dd11's twin re-signs the corpus — use --names to skip
them for a quick sweep.
"""

from __future__ import annotations

import sys
import time
from fnmatch import fnmatch
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_oracle import (  # noqa: E402
    TABLES,
    compare_frames,
    to_pandas_spark,
)


def main() -> int:
    argv = sys.argv[1:]
    # the sf_dir positional is optional: only consume the first arg as
    # a directory if it actually is one — otherwise a bare case name
    # ('check_offline.py ev10_rfm_segments') would be swallowed as
    # sf_dir and the whole suite would run against a missing path
    if argv and not argv[0].startswith("--") and Path(argv[0]).is_dir():
        sf_dir = argv.pop(0)
    else:
        sf_dir = "/root/testdata/sf0.01"
    # --names may appear anywhere; positional names and globs UNION
    # (same contract as check_oracle.py)
    out_path: str | None = None
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i : i + 2]
    if "--names" in argv:
        i = argv.index("--names")
        only: set[str] = set(argv[:i])
        globs = argv[i + 1 :]
    else:
        globs = []
        only = set(argv)

    import importlib

    from pyspark.sql import SparkSession

    from tests.test_offline_oracles import CASES

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("offline-oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    known = {name for name, _sql, _mod in CASES}
    unknown = sorted(only - known)
    if unknown:
        # a typo'd case name must not silently verify nothing
        print(f"unknown offline case(s): {unknown}; known: {sorted(known)}")
        return 1

    failures = []
    results: dict[str, dict] = {}
    n_ran = 0
    for name, sql_const, mod_name in CASES:
        if only or globs:
            if not (name in only or any(fnmatch(name, g) for g in globs)):
                continue
        n_ran += 1
        mod = importlib.import_module(mod_name)
        fn, sql = getattr(mod, name), getattr(mod, sql_const)
        if name.startswith("s10_") and sf_dir.rstrip("/") != "/root/testdata/sf0.01":
            # the S10 module constants are bound to the gate's sf0.01
            # fixture PATH (unlike value-parameterized twins); rebuild
            # them for the requested dir so a sf0.1/sf1 replay compares
            # the same bytes on both engines
            from maggy_spark.sources import jsonl

            sql = (
                jsonl.s10_clean_sql(sf_dir) if "clean" in name else jsonl.s10_report_sql(sf_dir)
            )
        if name.startswith("s11_") and sf_dir.rstrip("/") != "/root/testdata/sf0.01":
            # same path-bound-constant rule for the S11 CSV fixture
            from maggy_spark.sources import csvsrc

            sql = (
                csvsrc.s11_clean_sql(sf_dir)
                if "clean" in name
                else csvsrc.s11_report_sql(sf_dir)
            )
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)  # build ONCE: dtypes + collect share it
            spark_pd = to_pandas_spark(sdf)
            duck_pd = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            results[name] = {
                "rows": -1, "match": False,
                "secs": round(time.time() - t0, 3), "err": str(e)[:500],
            }
            print(f"FAIL {name}: {e}")
            continue
        status = compare_frames(sdf, spark_pd, duck_pd)
        results[name] = {
            "rows": len(spark_pd), "match": not status,
            "secs": round(time.time() - t0, 3),
            "err": "; ".join(status) if status else None,
        }
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"ok   {name}: MATCH ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")

    if n_ran == 0:
        print(f"no offline case matches {sorted(only) or globs} — nothing ran")
        return 1
    if out_path:
        import json

        path = Path(out_path) if Path(out_path).is_absolute() else REPO / out_path
        # every row carries its own provenance, so a merged artifact
        # can't misreport which sf_dir a prior run's cases came from
        for r in results.values():
            r["sf_dir"] = sf_dir
        merged = results
        if (only or globs) and path.exists():
            # subset runs refresh their rows without dropping the rest
            # of a prior full sweep (the sf1_parity.py convention)
            prior_doc = json.loads(path.read_text())
            prior = prior_doc.get("results", {})
            prior_dir = prior_doc.get("sf_dir")
            for name, r in prior.items():
                r.setdefault("sf_dir", prior_dir)
            merged = {**prior, **results}
        dirs = sorted({r.get("sf_dir") for r in merged.values() if r.get("sf_dir")})
        payload = {
            "sf_dir": sf_dir if dirs == [sf_dir] else f"mixed:{dirs}",
            "n_cases": len(merged),
            "n_fail": sum(1 for r in merged.values() if not r["match"]),
            "results": merged,
        }
        path.write_text(json.dumps(payload, indent=1) + "\n")
        print(f"wrote {path} ({len(merged)} cases)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
