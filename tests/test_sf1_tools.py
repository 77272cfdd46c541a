"""Pins for the sf1-parity tooling's independent oracles: the fast
integer-popcount dd7 pair relation must equal the registry twin
pair-for-pair, and the union-find component builder must reproduce
the gate's recursive-closure oracle — both at the gate's own sf0.01
(sf0.1/sf1 replays are recorded in COVERAGE.md)."""

from __future__ import annotations


def test_fast_pair_oracle_equals_registry_twin():
    from maggy_spark.functions.dedup import DD7_SQL
    from tools.sf1_parity import _connect, dd7_fast_pairs_sql

    con = _connect("/root/testdata/sf0.01")
    slow = set(map(tuple, con.execute(f"SELECT doc_a, doc_b FROM ({DD7_SQL})").fetchall()))
    fast = set(map(tuple, con.execute(dd7_fast_pairs_sql()).fetchall()))
    assert fast == slow and len(fast) > 0


def test_union_find_oracle_equals_gate_closure():
    from maggy_spark.functions.dedup import DD10_SQL, DD14_SQL
    from tools.sf1_parity import (
        _connect,
        _python_components,
        _python_dd14,
        dd7_fast_pairs_sql,
    )

    con = _connect("/root/testdata/sf0.01")
    comp = _python_components(con, dd7_fast_pairs_sql())
    gate = con.execute(DD10_SQL).fetchdf()
    m = comp.merge(gate, on="doc_id", suffixes=("", "_g"))
    assert len(m) == len(comp) == len(gate)
    for col in ("cluster_rep", "cluster_size", "is_duplicate"):
        assert (m[col] == m[f"{col}_g"]).all(), col

    d14 = _python_dd14(comp, con)
    g14 = con.execute(DD14_SQL).fetchdf()
    m2 = d14.merge(g14, on="doc_id", suffixes=("", "_g"))
    assert len(m2) == len(d14) == len(g14)
    for col in ("cluster_rep", "cluster_size", "n_tokens", "keep"):
        assert (m2[col] == m2[f"{col}_g"]).all(), col


def test_kmeans_replay_matches_duckdb_twins():
    """The numpy+Decimal replay (tools/kmeans_replay.py — the sf10
    oracle for the k-means family, where the DuckDB twin's n x k
    cross join is oracle-side infeasible) must agree with the DuckDB
    twins bit-for-bit at the gate's sf0.01, so the two oracle layers
    cannot drift."""
    from maggy_spark.functions.pipeline import PL15_SQL
    from maggy_spark.functions.similarity import ANN10_SQL, ANN11_SQL, ANN13_SQL, ANN15_SQL
    from tools import kmeans_replay as KR
    from tools.check_oracle import frame_signature
    from tools.sf1_parity import _connect

    sf = "/root/testdata/sf0.01"
    con = _connect(sf)
    for name, sql in [
        ("ann10_kmeans_assign", ANN10_SQL),
        ("ann11_semdedup_prune", ANN11_SQL),
        ("pl15_semantic_sample", PL15_SQL),
        ("ann13_cluster_quality", ANN13_SQL),
        ("ann15_cluster_keywords", ANN15_SQL),
    ]:
        duck_pd = con.execute(sql).fetchdf()
        rep_pd = KR.REPLAYS[name](sf)
        assert frame_signature(duck_pd) == frame_signature(rep_pd), name
