"""Replay the OFFLINE oracle suite (tests/test_offline_oracles.CASES)
at an arbitrary scale factor — the out-of-registry twin of
check_oracle.py, so the extension operators' parity can be verified
above the suite's sf0.01 (e.g. at sf0.1, or the synthetic sf1).

Usage: python tools/check_offline.py [sf_dir] [case ...]
       python tools/check_offline.py [sf_dir] --names GLOB ...

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
    n_ran = 0
    for name, sql_const, mod_name in CASES:
        if only or globs:
            if not (name in only or any(fnmatch(name, g) for g in globs)):
                continue
        n_ran += 1
        mod = importlib.import_module(mod_name)
        fn, sql = getattr(mod, name), getattr(mod, sql_const)
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)  # build ONCE: dtypes + collect share it
            spark_pd = to_pandas_spark(sdf)
            duck_pd = con.execute(sql).fetchdf()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: {e}")
            continue
        status = compare_frames(sdf, spark_pd, duck_pd)
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"ok   {name}: MATCH ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")

    if n_ran == 0:
        print(f"no offline case matches {sorted(only) or globs} — nothing ran")
        return 1
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
