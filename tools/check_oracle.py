"""Local replica of the driver's t2 correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
per-row value hash (floats compared bit-exact via repr, which is why
the operators route double aggregation through exact decimals).

Usage: python tools/check_oracle.py [sf_dir] [name ...]
       python tools/check_oracle.py [sf_dir] [name ...] --names 'dd1*'

The first positional is treated as the sf_dir only if it is an
existing directory (so a typo'd query name can't silently become a
data path). Names before ``--names`` are exact registry keys —
unknown keys abort with the known roster; everything after
``--names`` is a shell-style glob (fnmatch), so one rotated gate row
— or a whole family — can be replayed without typing every key:
``--names 'dd*'`` runs every dedup query at the gate's own sf0.01 on
the gate's own local[8] compare. Positional names and globs combine
as a UNION (run everything named OR matched). A selection matching
zero cases exits 1 (it verified nothing).
"""

from __future__ import annotations

import sys
import time
from fnmatch import fnmatch
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if v is None or (isinstance(v, float) and v != v):
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def frame_signature(df: pd.DataFrame):
    cols = sorted(df.columns)
    out = df[cols]
    rowset = {}
    for tup in out.itertuples(index=False, name=None):
        key = "|".join(norm_cell(v) for v in tup)
        rowset[key] = rowset.get(key, 0) + 1
    return cols, rowset


def to_pandas_spark(sdf):
    # avoid arrow-vs-plain dtype surprises: collect via rows
    rows = sdf.collect()
    cols = sdf.columns
    return pd.DataFrame([tuple(r) for r in rows], columns=cols)


_SPARK_TO_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "double": "f64",
    "float": "f32", "string": "str", "boolean": "bool", "date": "date",
    "timestamp": "ts",
}
_NUMPY_TO_CANON = {
    "int64": "i64", "int32": "i32", "int16": "i16", "float64": "f64",
    "float32": "f32", "object": "str", "bool": "bool",
    "datetime64[ns]": "ts", "datetime64[us]": "ts",
}


def spark_dtypes(sdf) -> dict:
    return {name: _SPARK_TO_CANON.get(dt, dt) for name, dt in sdf.dtypes}


def duck_dtypes(df: pd.DataFrame) -> dict:
    return {c: _NUMPY_TO_CANON.get(str(df[c].dtype), str(df[c].dtype)) for c in df.columns}


def compare_frames(sdf, spark_pd, duck_pd) -> list[str]:
    """The gate's comparison: rowcount, sorted columns, canonical
    dtypes (with the object-column exemption), order-insensitive
    value multiset — returns human-readable mismatch descriptions
    (empty = MATCH). Shared by check_offline.py so the two tools
    cannot drift."""
    status: list[str] = []
    if len(spark_pd) != len(duck_pd):
        status.append(f"rowcount {len(spark_pd)} vs {len(duck_pd)}")
    sc, srows = frame_signature(spark_pd)
    dc, drows = frame_signature(duck_pd)
    if sc != dc:
        status.append(f"columns {sc} vs {dc}")
    st, dt = spark_dtypes(sdf), duck_dtypes(duck_pd)
    mismatched = {c: (st.get(c), dt.get(c)) for c in st if st.get(c) != dt.get(c)}
    # object columns on the duckdb side can hold anything; only
    # flag clear numeric-width/type disagreements
    mismatched = {c: v for c, v in mismatched.items()
                  if v[1] != "str" or v[0] not in ("str", "date", "ts")}
    if mismatched:
        status.append(f"dtypes {mismatched}")
    if srows != drows:
        n_mismatch = sum((srows.get(k, 0) - drows.get(k, 0)) != 0 for k in set(srows) | set(drows))
        status.append(f"values ({n_mismatch} differing row-keys)")
        sonly = [k for k in srows if k not in drows][:3]
        donly = [k for k in drows if k not in srows][:3]
        if sonly:
            status.append(f"spark-only e.g. {sonly}")
        if donly:
            status.append(f"duck-only e.g. {donly}")
    return status


def main() -> int:
    argv = sys.argv[1:]
    # The first positional is the sf_dir ONLY if it is an existing
    # directory — `check_oracle.py dd14_...` must select the query,
    # not silently read /root/repo/dd14_.../documents.parquet.
    sf_dir = "/root/testdata/sf0.01"
    if argv and not argv[0].startswith("--") and Path(argv[0]).is_dir():
        sf_dir = argv.pop(0)
    globs: list[str] = []
    only: set[str] = set()
    if "--names" in argv:
        i = argv.index("--names")
        only = set(argv[:i])
        globs = argv[i + 1 :]
    else:
        only = set(argv)

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    unknown = sorted(n for n in only if n not in qs)
    if unknown:
        print(f"unknown registry names: {unknown}")
        print(f"known: {sorted(qs)}")
        return 1

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    n_ran = 0
    for name, fn in qs.items():
        # Positional names and --names globs UNION (the documented
        # "these names plus this family" usage); intersecting them
        # would make the positionals undeliverable whenever any glob
        # is present.
        if only or globs:
            selected = name in only or any(fnmatch(name, g) for g in globs)
            if not selected:
                continue
        n_ran += 1
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")
            continue
        try:
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = compare_frames(sdf, spark_pd, duck_pd)
        if status:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status))
        else:
            print(f"ok   {name}: MATCH ({len(spark_pd)} rows, {time.time()-t0:.1f}s)")

    if n_ran == 0:
        # A selection that matches nothing verified nothing — never
        # report success for it (check_offline.py's n_ran guard).
        print("\n0 cases matched the selection — nothing verified")
        return 1
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
