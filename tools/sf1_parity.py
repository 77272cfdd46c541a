"""sf1 parity sweep: hash-verify the heavy gate rows at ~100x the
gate's scale (VERDICT r9 item 1 — convert "designed for 100x" into
"verified at 100x").

The driver ships sf0.001/0.01/0.1; `tools/synth_scale.py` generates
the next decade (50k docs / 20k vecs / 1M events, recipe v3) at
/tmp/maggy_sf1. This tool replays the gate compare (rowcount, sorted
columns, canonical dtypes, order-insensitive value-hash multiset —
the exact `check_oracle.compare_frames`) there for every registry
row whose tables exist at sf1.

Two oracle strategies:

- **Direct twin** (`DIRECT`): the registry's own DuckDB SQL, same as
  the gate. Used for every row whose DuckDB side is feasible at sf1.
- **Independent Python oracle** (`dd10`, `dd14`): the gate's
  recursive-CTE transitive closure is infeasible over the sf1 pair
  graph (~28M edges; the sf0.1 closure already costs ~20 min at 676k
  edges). Instead DuckDB computes the SAME dd7 pair relation the
  closure would consume (sig -> bands -> candidates -> hamming — an
  end-to-end independent re-derivation of the graph), and a Python
  union-find (path-halving + union-by-smaller-root, a THIRD
  algorithm distinct from both Spark's alternating-star contraction
  and the gate's recursive closure) produces the components; dd14's
  oracle selects winners (max n_tokens, tie min doc_id) over those
  components with DuckDB-computed token counts.

Deliberately EXCLUDED and why (documented so the sweep can't silently
shrink): `dd7` (its 28M-row pair output is the union-find oracle's
INPUT here, so the relation is cross-checked pairwise Spark-vs-DuckDB
inside the dd10 oracle at full scale — an explicit 28M-row frame
compare would only re-hash the same multiset for ~3 GB of driver
RAM), `dd8` (minhash candidate verification — the candidate CTE is
quadratic per band bucket in DuckDB at the sf1 dup density; dd8's
production claim is covered by dd13/dd16's window-hash family which
DO sweep; note dd22 — which consumes the SAME candidate CTE but
rolls up to a decile table — was measured feasible r14 and sweeps
directly: the sf1 candidate count is only 180 pairs and the cost is
the 50k-doc signature CTE, ~6 min in DuckDB), and every
lineitem/orders-backed row (a*/c*/g*/k*/hb1:
the synthetic decade has no TPC-H tables; those rows' scaling story
is the metrics fixture's own 4-decade SCALING.md rows).

Usage:
    python tools/sf1_parity.py                 # full sf1 roster
    python tools/sf1_parity.py dd13_span_dedup # subset (exact names)
    python tools/sf1_parity.py --dir /tmp/maggy_sf10 --out SF10_PARITY.json dd1_exact_dedup ...
                                               # another decade (r11: the
                                               # sf10 ladder for the cheap
                                               # window-hash families)

Rotated-out operators (dd6/tx4 since r11) stay sweepable: names not
in the 50-entry registry resolve through the offline-oracle case
list (tests/test_offline_oracles.CASES), the same (fn, SQL) pairs the
offline suite pins.

Writes one human line per row plus a JSON summary to
SF1_PARITY.json. Runtime is dominated by the DuckDB dd7 side of the
dd10/dd14 oracles (~tens of minutes); run it in the background and
don't time benches concurrently.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.check_oracle import TABLES, compare_frames, to_pandas_spark  # noqa: E402

SF1_DIR = "/tmp/maggy_sf1"

# Registry rows swept with their own DuckDB twin at sf1. Every name
# must exist in __spark_entry__.queries(); the twin comes from
# oracle_sql(). Ordered cheap-first so a long run fails fast.
DIRECT = [
    "dd1_exact_dedup",
    "dd5_dedup_clusters",
    "dd6_simhash",
    "tx1_token_count",
    "tx2_quality_score",
    "tx3_lang_id",
    "tx4_fingerprint",
    "tx5_ngram_stats",
    "tx12_pii_scan",
    "tx13_bpe_pair_stats",
    "tx16_length_quantiles",
    "tx17_tfidf_keywords",
    "tx18_langid_eval",
    "tx19_ccnet_bucket",
    "ann16_mmr_rerank",
    "pl18_temperature_mix",
    "pl19_temperature_apply",
    "pl17_shard_plan",
    # dd19 at sf1 is probe-pinned only: the 31-word synthetic vocab
    # makes nearly every organic shingle viral (df > 50 cap) at 50k
    # docs, so the organic pairs vanish — the same documented
    # signature-concentration fixture property as the banded families
    # at sf10. The row still verifies the full relation shape.
    "dd19_containment_screen",
    "pl9_epoch_shuffle_plan",
    "pl14_curriculum_order",
    "pl1_corpus_prep",
    # r13 additions: the pack-efficiency audit (pl7's cumsum replay),
    # the tokenizer fertility table, and the corpus-independent LSH
    # S-curve planner (static matrix — swept to pin the unrolled
    # IEEE chains stay bit-equal on this engine build)
    "pl20_pack_efficiency",
    "tx20_tokenizer_fertility",
    "dd21_lsh_s_curve",
    # r14 (VERDICT r13 item 4): dd22 gets its own sf1 rung — the
    # direct DuckDB twin IS feasible here (180 candidate pairs at the
    # sf1 dup density; the cost is the 50k-doc signature CTE, minutes
    # not hours), so the inherited dd8 exclusion no longer applies
    "dd22_minhash_calibration",
    "ann17_filtered_topk",
    "ann18_range_search",
    "ann19_filtered_ivf",
    # r14: the non-aligned filtered IVF (selectivity-aware nprobe
    # from the bounded (list x source) histogram)
    "ann20_selective_filtered_ivf",
    "ann21_routing_recall_curve",
    # r14: the incremental IVF store (frozen-model assign + quantize)
    "ann22_incremental_store",
    "mm9_multimodal_pack_plan",
    "pl23_weighted_sample",
    # r14: the DoReMi reweighting step — its twin rides the same LM
    # prefix as tx19's, so the sf1 cost profile is tx19's + epsilon
    "pl24_doremi_reweight",
    "pl21_fair_interleave",
    "pl22_pps_sample",
    "ev4_asof_attribution",
    "ev5_sessionize",
    "ev11_volume_anomaly",
    "ev12_lag_quantiles",
    "ev13_type_transitions",
    "ev14_session_funnel",
    "ann1_bruteforce_topk",
    "ann2_lsh_topk",
    "ann3_ivf_topk",
    "ann4_embedding_near_dup",
    "ann5_knn_graph",
    "ann7_quantized_rerank",
    "ann8_ivf_quantized",
    "ann9_pq_adc",
    "ann10_kmeans_assign",
    "ann11_semdedup_prune",
    "ann12_ivfpq_adc",
    "ann13_cluster_quality",
    "ann14_recall_eval",
    "ann15_cluster_keywords",
    "pl15_semantic_sample",
    "pl16_repeat_schedule",
    "tx10_unigram_logprob",
    "tx14_bigram_logprob",
    "tx15_dsir_score",
    "dd12_boilerplate_profile",
    "dd13_span_dedup",
    "dd16_span_removal_plan",
    "dd17_apply_removal_plan",
    "ing1_ingest_gate",
    # pl13_full_corpus_build is NOT in DIRECT: its twin embeds the
    # recursive-closure CTE, whose reach relation is quadratic in the
    # giant component (~0.8n nodes at every decade -> ~1.6e9 rows at
    # sf1 — infeasible by construction, same reason the dd10 oracle
    # switched algorithms). It runs below with the closure spliced
    # out for the union-find components (themselves sf1-verified
    # against Spark first); every other CTE of the twin runs as-is.
]


def dd7_fast_pairs_sql() -> str:
    """The dd7 pair relation with the signature converted to a BIGINT
    once per doc (one O(t) pass over the same independently-derived
    string signature) and hamming as bit_count(xor) — mathematically
    identical to DD7_SQL's per-char compare, ~1000x cheaper over the
    sf1 candidate stream (324M candidates; the string walk is why the
    full twin is a multi-hour side at sf1). Validated pair-for-pair
    against DD7_SQL at sf0.01 by test_sf1_tools.py and at sf0.1
    offline (676,364 pairs equal; COVERAGE.md)."""
    from maggy_spark.functions.dedup import (
        _SIMHASH_PARAMS_SQL,
        _SIMHASH_SIG_SQL,
        MAX_HAMMING,
        SIMHASH_BANDS,
    )

    return f"""
WITH p AS ({_SIMHASH_PARAMS_SQL}),
sig AS ({_SIMHASH_SIG_SQL}),
sigint AS (
    SELECT doc_id, t,
           cast(list_sum(list_transform(generate_series(1, t), k ->
               CASE WHEN substr(simhash, k, 1) = '1'
                    THEN (1::BIGINT << (t - k)) ELSE 0 END)) AS BIGINT) AS si
    FROM sig WHERE simhash IS NOT NULL
),
bands AS (
    SELECT doc_id, si, t,
           (i::BIGINT << (t // {SIMHASH_BANDS})) +
           ((si >> (t - (i + 1) * (t // {SIMHASH_BANDS}))) &
            ((1::BIGINT << (t // {SIMHASH_BANDS})) - 1)) AS band_key
    FROM sigint CROSS JOIN generate_series(0, {SIMHASH_BANDS - 1}) gs(i)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band_key = b.band_key AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.si, b.si)) <= {MAX_HAMMING}
"""


def _connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # big-decade oracle sides (dd17's position explode at sf10 is
    # ~27.5M rows joined back to 500k string_aggs) need out-of-core:
    # give DuckDB a spill dir and leave headroom for the concurrent
    # Spark driver instead of the default 80%-of-RAM cap
    con.execute("SET temp_directory='/tmp/duck_spill'")
    import os

    con.execute(f"SET memory_limit='{os.environ.get('MAGGY_DUCK_MEM', '48GB')}'")
    # big ordered aggregations (dd17's per-doc string_agg over the
    # position explode) blow the insertion-order bookkeeping before
    # the data itself at sf10; result ordering is irrelevant — the
    # compare hashes an order-insensitive multiset
    con.execute("SET preserve_insertion_order=false")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _union_find(n_ids: np.ndarray, a: np.ndarray, b: np.ndarray) -> dict[int, int]:
    """Min-reachable-id components via union-find with path halving.
    Independent of both Spark's star contraction and the gate's
    recursive closure. Returns {doc_id: component_min_id}."""
    idx = {int(v): i for i, v in enumerate(n_ids)}
    parent = np.arange(len(n_ids), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    for u, v in zip(a, b):
        ru, rv = find(idx[int(u)]), find(idx[int(v)])
        if ru != rv:
            # union by smaller ORIGINAL id so the root IS the min id
            if n_ids[ru] < n_ids[rv]:
                parent[rv] = ru
            else:
                parent[ru] = rv
    return {int(v): int(n_ids[find(i)]) for i, v in enumerate(n_ids)}


def _python_components(con: duckdb.DuckDBPyConnection, dd7_sql: str) -> pd.DataFrame:
    """(doc_id, cluster_rep, cluster_size, is_duplicate) from the
    DuckDB-derived dd7 pair graph + Python union-find."""
    pairs = con.execute(
        f"SELECT doc_a, doc_b FROM ({dd7_sql})"
    ).fetch_arrow_table()
    a = pairs.column("doc_a").to_numpy()
    b = pairs.column("doc_b").to_numpy()
    ids = con.execute("SELECT doc_id FROM documents ORDER BY doc_id").fetchnumpy()[
        "doc_id"
    ]
    rep = _union_find(ids, a, b)
    df = pd.DataFrame({"doc_id": ids.astype("int64")})
    df["cluster_rep"] = df["doc_id"].map(rep).astype("int64")
    sizes = df.groupby("cluster_rep").size().rename("cluster_size")
    df = df.join(sizes, on="cluster_rep")
    df["cluster_size"] = df["cluster_size"].astype("int64")
    df["is_duplicate"] = df["doc_id"] != df["cluster_rep"]
    return df


def _python_dd14(comp: pd.DataFrame, con: duckdb.DuckDBPyConnection) -> pd.DataFrame:
    toks = con.execute(
        "SELECT doc_id, cast(len(str_split(text, ' ')) AS BIGINT) AS n_tokens"
        " FROM documents"
    ).fetchdf()
    m = comp.merge(toks, on="doc_id")
    m["n_tokens"] = m["n_tokens"].astype("int64")
    # winner per cluster: max n_tokens, tie lowest doc_id
    w = (
        m.sort_values(["cluster_rep", "n_tokens", "doc_id"], ascending=[True, False, True])
        .groupby("cluster_rep", as_index=False)
        .first()[["cluster_rep", "doc_id"]]
        .rename(columns={"doc_id": "win_id"})
    )
    m = m.merge(w, on="cluster_rep")
    m["keep"] = m["doc_id"] == m["win_id"]
    return m[["doc_id", "cluster_rep", "cluster_size", "n_tokens", "keep"]]


def main() -> int:
    argv = list(sys.argv[1:])
    sf_dir, out_name = SF1_DIR, "SF1_PARITY.json"
    if "--dir" in argv:
        i = argv.index("--dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
        if sf_dir != SF1_DIR:  # don't let another decade clobber the sf1 artifact
            out_name = f"PARITY_{Path(str(sf_dir).rstrip('/')).name}.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_name = argv[i + 1]
        del argv[i : i + 2]
    only = set(argv)
    import importlib
    import importlib.util

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    # rotated-out operators resolve through the offline-case list —
    # the registry holds only the driver's 50; the sweep covers both
    spec = importlib.util.spec_from_file_location(
        "_offline_cases", REPO / "tests" / "test_offline_oracles.py"
    )
    off = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(off)
    for cname, sqlc, modn in off.CASES:
        if cname not in qs:
            mod = importlib.import_module(modn)
            qs[cname] = getattr(mod, cname)
            oracles[cname] = getattr(mod, sqlc)

    spark = (
        SparkSession.builder.master("local[16]")
        .appName("sf1-parity")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    con = _connect(sf_dir)
    results: dict[str, dict] = {}
    failures: list[str] = []

    def record(name: str, status: list[str], n_rows: int, secs: float, oracle: str):
        ok = not status
        results[name] = {
            "match": ok,
            "rows": n_rows,
            "secs": round(secs, 1),
            "oracle": oracle,
            "detail": "; ".join(status) if status else None,
        }
        if ok:
            print(f"ok   {name}: MATCH ({n_rows} rows, {secs:.1f}s, {oracle})", flush=True)
        else:
            failures.append(name)
            print(f"FAIL {name}: " + "; ".join(status), flush=True)

    for name in DIRECT:
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            duck_pd = con.execute(oracles[name]).fetchdf()
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            record(name, [f"error: {e}"], -1, time.time() - t0, "duckdb-twin")
            continue
        record(name, compare_frames(sdf, spark_pd, duck_pd),
               len(spark_pd), time.time() - t0, "duckdb-twin")

    comp_oracle: pd.DataFrame | None = None
    comp_family = {
        "dd10_near_dup_components",
        "dd14_cluster_representatives",
        "pl13_full_corpus_build",
        "dd20_incremental_components",
    }
    if not only or only & comp_family:
        t0 = time.time()
        try:
            comp_oracle = _python_components(con, dd7_fast_pairs_sql())
        except Exception as e:  # noqa: BLE001
            # an error row for EVERY requested component-family case,
            # not just dd10 — otherwise a `--only dd20_...` sweep whose
            # oracle build fails reports an empty result as success
            # (ADVICE r12)
            for fam_name in sorted(comp_family if not only else only & comp_family):
                record(fam_name, [f"oracle error: {e}"], -1,
                       time.time() - t0, "duckdb-pairs+union-find")
    if comp_oracle is not None and (not only or "dd10_near_dup_components" in only):
        try:
            sdf = qs["dd10_near_dup_components"](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            record("dd10_near_dup_components", compare_frames(sdf, spark_pd, comp_oracle),
                   len(spark_pd), time.time() - t0, "duckdb-pairs+union-find")
        except Exception as e:  # noqa: BLE001
            record("dd10_near_dup_components", [f"error: {e}"], -1,
                   time.time() - t0, "duckdb-pairs+union-find")
    if comp_oracle is not None and (not only or "dd20_incremental_components" in only):
        t0 = time.time()
        try:
            sdf = qs["dd20_incremental_components"](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            record("dd20_incremental_components",
                   compare_frames(sdf, spark_pd, comp_oracle),
                   len(spark_pd), time.time() - t0, "duckdb-pairs+union-find")
        except Exception as e:  # noqa: BLE001
            record("dd20_incremental_components", [f"error: {e}"], -1,
                   time.time() - t0, "duckdb-pairs+union-find")

    if comp_oracle is not None and (not only or "dd14_cluster_representatives" in only):
        t0 = time.time()
        try:
            oracle14 = _python_dd14(comp_oracle, con)
            sdf = qs["dd14_cluster_representatives"](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            record("dd14_cluster_representatives", compare_frames(sdf, spark_pd, oracle14),
                   len(spark_pd), time.time() - t0, "duckdb-toks+union-find")
        except Exception as e:  # noqa: BLE001
            record("dd14_cluster_representatives", [f"error: {e}"], -1,
                   time.time() - t0, "duckdb-toks+union-find")

    if comp_oracle is not None and (not only or "pl13_full_corpus_build" in only):
        t0 = time.time()
        try:
            from maggy_spark.functions.pipeline import PL13_SQL

            con.register("pycomp", comp_oracle[["doc_id", "cluster_rep"]])
            i = PL13_SQL.find("toksn AS")
            fast_sql = (
                "WITH comp AS (SELECT doc_id, cluster_rep FROM pycomp),\n" + PL13_SQL[i:]
            )
            sdf = qs["pl13_full_corpus_build"](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            duck_pd = con.execute(fast_sql).fetchdf()
            record("pl13_full_corpus_build", compare_frames(sdf, spark_pd, duck_pd),
                   len(spark_pd), time.time() - t0, "duckdb-twin+union-find-comp")
        except Exception as e:  # noqa: BLE001
            record("pl13_full_corpus_build", [f"error: {e}"], -1,
                   time.time() - t0, "duckdb-twin+union-find-comp")

    # MERGE into any existing artifact: subset runs (positional
    # names) must refresh their rows without dropping the rest of a
    # prior full sweep
    path = Path(REPO / out_name)
    merged = results
    if only and path.exists():
        prior = json.loads(path.read_text()).get("results", {})
        merged = {**prior, **results}
    out = {
        "sf_dir": sf_dir,
        "n": len(merged),
        "matches": sum(1 for r in merged.values() if r["match"]),
        "results": merged,
    }
    path.write_text(json.dumps(out, indent=1))
    print(f"\n{len(failures)} failures / {len(results)} swept", flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
