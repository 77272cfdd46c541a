"""Relational kernel invariants at sf0.001 (fast; the full DuckDB
oracle sweep lives in tools/check_oracle.py and the driver's t2)."""

import pytest
from pyspark.sql import functions as F

from maggy_spark.operators import aggregations as agg
from maggy_spark.operators import earlystop, generators, transforms
from maggy_spark.plans.fixtures import metrics_df, trials_df


def test_fixture_shapes(spark, sf_dir):
    t = trials_df(spark, sf_dir)
    assert t.count() > 0
    assert t.select("trial_id").distinct().count() == t.count()
    m = metrics_df(spark, sf_dir)
    # metrics are deduped by (trial_id, step)
    assert m.groupBy("trial_id", "step").count().where("count > 1").count() == 0


def test_a1_consistency(spark, sf_dir):
    row = agg.a1_result_summary(spark, sf_dir).collect()[0]
    assert row.best_val >= row.avg_metric >= row.worst_val
    assert row.num_trials > 0 and 0 <= row.early_stopped <= row.num_trials


def test_a4_per_budget_bounds(spark, sf_dir):
    for r in agg.a4_budget_stats(spark, sf_dir).collect():
        assert r.ybest <= r.ymean <= r.yworst
        assert r.budget in (0, 1, 2)


def test_a5_topk_rank_bounds(spark, sf_dir):
    rows = agg.a5_topk_per_rung(spark, sf_dir, k=3).collect()
    by_rung = {}
    for r in rows:
        by_rung.setdefault(r.budget, []).append(r)
    for rung, rs in by_rung.items():
        assert len(rs) == 3
        ms = [r.final_metric for r in sorted(rs, key=lambda x: x.rank)]
        assert ms == sorted(ms, reverse=True)


def test_a6_split_sizes(spark, sf_dir):
    rows = agg.a6_tpe_split(spark, sf_dir).collect()
    n = len(rows)
    n_good = sum(r.split == "good" for r in rows)
    n_bad = sum(r.split == "bad" for r in rows)
    assert n_good == max(3, int(0.15 * n))
    assert n_bad == min(max(3, int(0.85 * n)), n - n_good)
    # floors can leave a remainder unlabeled (reference keeps only good+bad)
    assert n - (n_good + n_bad) <= 1


def test_a7_prefix_avg_first_step_equals_value(spark, sf_dir):
    m = metrics_df(spark, sf_dir).withColumnRenamed("value", "v")
    p = agg.a7_prefix_avg(spark, sf_dir)
    joined = p.join(m, ["trial_id", "step"]).where("step = 1")
    bad = joined.where(F.abs(F.col("prefix_avg") - F.col("v")) > 1e-9).count()
    assert bad == 0


def test_c3_median_rule_decision_shape(spark, sf_dir):
    rows = earlystop.c3_median_rule(spark, sf_dir).collect()
    assert len(rows) > 0
    bars = {r.median_bar for r in rows}
    assert len(bars) == 1  # single global bar
    # exactly one A8 sentinel row exposing the bar aggregate itself
    sentinels = [r for r in rows if r.trial_id == "__median_bar__"]
    assert len(sentinels) == 1
    assert sentinels[0].best_metric is None and sentinels[0].should_stop is False
    for r in rows:
        if r.trial_id == "__median_bar__":
            continue
        assert r.should_stop == (r.best_metric < r.median_bar)


def test_g3_grid_is_full_product(spark, sf_dir):
    from maggy_spark.plans.fixtures import load_table

    part = load_table(spark, sf_dir, "part")
    nb = part.select("p_brand").distinct().count()
    ns = part.select("p_size").distinct().count()
    g = generators.g3_grid_search(spark, sf_dir)
    assert g.count() == nb * ns
    assert g.select("trial_id").distinct().count() == nb * ns


def test_g5_promotion_fraction(spark, sf_dir):
    t = trials_df(spark, sf_dir).where("status = 'FINALIZED'")
    per_rung = {r.budget: r["count"] for r in t.groupBy("budget").count().collect()}
    promo = generators.g5_asha_promotion(spark, sf_dir).groupBy("rung").count().collect()
    for r in promo:
        assert r["count"] == per_rung[r.rung] // 2


def test_g10_golden_ladder(spark, sf_dir):
    rows = {(r.iteration, r.rung): (r.budget, r.n_configs) for r in generators.g10_hyperband_ladder(spark, sf_dir).collect()}
    # golden scenario from FIXTURES.md F6 (reference hyperband.py:115-124,200-209)
    assert rows == {
        (0, 0): (1, 9), (0, 1): (3, 3), (0, 2): (9, 1),
        (1, 1): (3, 3), (1, 2): (9, 1),
    }


def test_g12_guard_excludes_seen(spark, sf_dir):
    t = trials_df(spark, sf_dir)
    seen = {r.params_json for r in t.where("status IN ('FINALIZED','RUNNING')").collect()}
    novel = [r.params_json for r in generators.g12_dedup_guard(spark, sf_dir).collect()]
    assert novel and not (set(novel) & seen)


def test_golden_id_via_spark(spark, sf_dir):
    assert generators.trial_id_golden(spark, sf_dir).collect()[0].trial_id == "3d1cc9fdb1d4d001"


def test_c2_dedup_restores_metrics(spark, sf_dir):
    m = metrics_df(spark, sf_dir)
    d = earlystop.c2_metric_dedup(spark, sf_dir)
    assert d.count() == m.count()
    assert d.exceptAll(m).count() == 0


def test_t2_roundtrip_all_ok(spark, sf_dir):
    assert transforms.t2_inverse_transform(spark, sf_dir).where("NOT roundtrip_ok").count() == 0


def test_k1_pricing_summary_shape(spark, sf_dir):
    from maggy_spark.operators import warehouse

    rows = warehouse.k1_pricing_summary(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 6  # |returnflag| x |linestatus| groups
    for r in rows:
        assert r.sum_charge >= r.sum_disc_price > 0  # tax only adds
        assert r.avg_disc < 1.0 and r.count_order > 0


def test_k2_top_customers_ranked(spark, sf_dir):
    from maggy_spark.operators import warehouse

    rows = sorted(warehouse.k2_top_customers(spark, sf_dir).collect(), key=lambda r: r.rank)
    assert len(rows) == 10
    spends = [r.total_spend for r in rows]
    assert spends == sorted(spends, reverse=True)
    assert all(r.n_orders >= 1 for r in rows)


def test_load_events_yields_watermarkable_timestamp(spark, sf_dir):
    # events.parquet may surface ts as bigint nanos (nanosAsLong) or
    # TIMESTAMP_NTZ depending on reader path; load_events must always
    # hand consumers a plain TimestampType column — ev2's unix_micros
    # and the streaming watermark both reject NTZ (two rounds of
    # CORRECTNESS failures pinned here)
    from maggy_spark.plans.fixtures import load_events

    df = load_events(spark, sf_dir)
    assert dict(df.dtypes)["ts"] == "timestamp"
    assert df.where(F.col("ts").isNull()).count() == 0


def test_load_events_is_session_timezone_invariant(spark, sf_dir):
    # the NTZ->TIMESTAMP conversion must yield DuckDB's naive-epoch
    # instants on ANY machine timezone: to_utc_timestamp and a bare
    # cast both shift with spark.sql.session.timeZone (the round-5
    # review reproduced an 8h divergence under America/Los_Angeles),
    # which load_events neutralizes by pinning the session to UTC
    import duckdb

    from maggy_spark.plans.fixtures import load_events

    oracle = duckdb.sql(
        f"SELECT min(epoch_us(ts)) FROM read_parquet('{sf_dir}/events.parquet')"
    ).fetchone()[0]
    prior = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        got = load_events(spark, sf_dir).select(F.min(F.unix_micros("ts"))).collect()[0][0]
        # the conversion is expression-level: it must not reach for
        # the session timezone, and must not mutate it either
        assert spark.conf.get("spark.sql.session.timeZone") == "America/Los_Angeles"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prior)
    assert got == oracle


def test_k1_overflow_contract(spark, tmp_path):
    """The k1 docstring's overflow promise, driven for real (VERDICT
    r13 item 7): a crafted group whose ch_num rows sum past 2^63.

    Arm 1 (default bigint accumulator): ANSI mode (Spark 4 default)
    must fail LOUD with ARITHMETIC_OVERFLOW — never wrap silently.
    Arm 2 (accumulator="decimal38"): the documented promotion path
    produces the exact sums for the same rows."""
    import pandas as pd
    import pytest
    from pyspark.errors import ArithmeticException

    from maggy_spark.operators.warehouse import k1_pricing_summary

    # price 5e12 -> pc = 5e14 cents (exact in double: < 2^53);
    # ch_num = pc * 100 * 100 = 5e18 per row; two rows -> 1e19 > 2^63
    price = 5.0e12
    rows = [
        ("A", "F", "2024-01-01 00:00:00", 1.0, price, 0.0, 0.0),
        ("A", "F", "2024-01-02 00:00:00", 1.0, price, 0.0, 0.0),
    ]
    pdf = pd.DataFrame(
        rows,
        columns=[
            "l_returnflag", "l_linestatus", "l_shipdate",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        ],
    )
    # micros, not pandas' default nanos (Spark rejects TIMESTAMP(NANOS))
    pdf["l_shipdate"] = pd.to_datetime(pdf["l_shipdate"]).astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "lineitem.parquet", index=False)

    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    with pytest.raises(ArithmeticException, match="ARITHMETIC_OVERFLOW|overflow"):
        k1_pricing_summary(spark, str(tmp_path)).collect()

    got = k1_pricing_summary(spark, str(tmp_path), accumulator="decimal38").collect()
    assert len(got) == 1
    r = got[0]
    assert r.count_order == 2
    assert r.sum_base_price == 2 * price     # 1e13, exactly representable
    assert r.sum_charge == 2 * price         # disc=tax=0: charge == base
    assert r.sum_qty == 2.0 and r.avg_disc == 0.0

    with pytest.raises(ValueError, match="accumulator"):
        k1_pricing_summary(spark, str(tmp_path), accumulator="float")


def test_a14_param_importance_numpy_derivation(spark, sf_dir):
    """THIRD derivation of a14 (the tx16 numpy-pinned convention):
    recompute the banded eta^2 with numpy/python floats from the raw
    fixture rows and pin the operator's exact integer statistics and
    (to float tolerance) its eta2; plus the structural invariants —
    eta2 in [0, 1], shared totals across param rows."""
    import duckdb
    import numpy as np

    from maggy_spark.operators.aggregations import a14_param_importance

    rows = {r.param: r for r in a14_param_importance(spark, sf_dir).collect()}
    assert set(rows) == {"p1", "p2", "p3"}
    base = next(iter(rows.values()))
    for r in rows.values():
        assert 0.0 <= r.eta2 <= 1.0
        assert (r.n, r.sum_y, r.sum_y2) == (base.n, base.sum_y, base.sum_y2)

    con = duckdb.connect()
    raw = con.execute(
        f"""
        SELECT cast(round(o_totalprice * 100) AS BIGINT) AS mc,
               o_custkey % 50 AS p1, o_orderpriority AS p2, o_orderkey % 500 AS p3
        FROM read_parquet('{sf_dir}/orders.parquet') WHERE o_orderstatus = 'F'
        """
    ).df()
    mc = raw["mc"].to_numpy()
    y = ((mc - mc.min()) * 10) // (mc.max() - mc.min() + 1)
    sst = float((y**2).sum()) - float(y.sum()) ** 2 / len(y)
    for pname, bins in (
        ("p1", raw["p1"].to_numpy() // 5),
        ("p2", raw["p2"].to_numpy()),
        ("p3", raw["p3"].to_numpy() // 50),
    ):
        n_g, s_g = {}, {}
        for b, yy in zip(bins, y):
            n_g[b] = n_g.get(b, 0) + 1
            s_g[b] = s_g.get(b, 0) + int(yy)
        between_milli = sum((s * s * 1000) // n_g[b] for b, s in s_g.items())
        r = rows[pname]
        assert r.n == len(y) and r.sum_y == int(y.sum()) and r.sum_y2 == int((y**2).sum())
        assert r.n_bins == len(n_g)
        assert r.between_milli == between_milli, pname
        eta2 = (between_milli / 1000.0 - float(y.sum()) ** 2 / len(y)) / sst
        assert abs(r.eta2 - eta2) < 1e-9, pname


def test_a15_savings_identities(spark, sf_dir):
    """a15's accounting identities, pinned per budget row: steps_full
    = n_trials * horizon >= steps_run (the horizon is the max of the
    summands), saved = full - run, frac = saved/full, n_stopped <=
    n_trials; and a cross-operator pin — total steps_run across
    budgets equals the c2-deduped metric rows of FINALIZED trials."""
    from maggy_spark.operators.aggregations import a15_earlystop_savings
    from maggy_spark.plans.fixtures import metrics_df, trials_df

    rows = a15_earlystop_savings(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.steps_full >= r.steps_run >= 0
        assert r.saved_steps == r.steps_full - r.steps_run
        assert abs(r.saved_frac - r.saved_steps / r.steps_full) < 1e-15
        assert 0 <= r.n_stopped <= r.n_trials

    fin = trials_df(spark, sf_dir, statuses=["FINALIZED"]).select("trial_id")
    want = metrics_df(spark, sf_dir).join(fin, "trial_id").count()
    assert sum(r.steps_run for r in rows) == want
