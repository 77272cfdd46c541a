"""Result/analytics aggregations over the trials & metrics tables.

These are the relational core of the engine (SURVEY.md §2.5, A1-A10),
re-expressing the reference's driver-side dict bookkeeping
(`maggy/core/experiment_driver/optimization_driver.py:344-406`,
`maggy/optimizer/abstractoptimizer.py:158-252,402-443`,
`maggy/optimizer/bayes/base.py:536-668`) as one-pass Spark SQL.

Cross-engine determinism: double sums/averages go through an exact
DECIMAL(18,4) accumulator (the synthetic money columns are 2-decimal
clean, so the cast is lossless) — decimal addition is associative,
so Spark's partial aggregation order cannot change the result, and
the final double division uses identical operands in both engines.

Scale notes: every query here is a single scan + single shuffle
(groupBy or window on trial_id/budget); no driver-side collect. At
100 TB the metrics table would be bucketed by trial_id so the
window/groupBy reuses the bucketing without a shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from maggy_spark.plans.fixtures import metrics_df, trials_df, with_fixtures

DEC = "decimal(18,4)"


def _exact_avg(col: str):
    """Order-independent avg: exact decimal sum -> double / count."""
    return F.sum(F.col(col).cast(DEC)).cast("double") / F.count(col)


# -- A1: best/worst/avg experiment result ------------------------------


def a1_result_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment result dict as a 1-row DF (direction=max).

    Reference: running best/worst/avg bookkeeping at
    `optimization_driver.py:344-406` — here a single aggregation
    pass; best/worst via rank-1 windows with seq tie-break.
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    # argmax/argmin via ordered structs: one partial-aggregating pass,
    # no global sort — this is the plan that survives a 100x scale-up
    # (a global row_number window would funnel into one partition).
    # Tie-break matches ORDER BY final_metric [DESC], seq: -seq under
    # max == smallest seq wins.
    best_s = F.max(F.struct(F.col("final_metric"), (-F.col("seq")).alias("ns"), F.col("trial_id")))
    worst_s = F.min(F.struct(F.col("final_metric"), F.col("seq"), F.col("trial_id")))
    agg = t.agg(
        best_s.alias("b"),
        worst_s.alias("w"),
        _exact_avg("final_metric").alias("avg_metric"),
        F.count("*").alias("num_trials"),
        F.sum(F.when(F.col("early_stop"), 1).otherwise(0)).cast("bigint").alias("early_stopped"),
    )
    return agg.select(
        F.col("b.trial_id").alias("best_id"),
        F.col("b.final_metric").alias("best_val"),
        F.col("w.trial_id").alias("worst_id"),
        F.col("w.final_metric").alias("worst_val"),
        "avg_metric",
        "num_trials",
        "early_stopped",
        # zero finalized trials -> empty result, matching the oracle's
        # CROSS JOIN against empty rank-1 subqueries (a bare global agg
        # would emit one all-NULL row)
    ).where(F.col("num_trials") > 0)


A1_SQL = with_fixtures(
    """
, fin AS (SELECT * FROM trials WHERE status = 'FINALIZED')
, ranked AS (
    SELECT trial_id, final_metric,
           row_number() OVER (ORDER BY final_metric DESC, seq) AS rn_best,
           row_number() OVER (ORDER BY final_metric ASC, seq) AS rn_worst
    FROM fin
)
SELECT b.best_id, b.best_val, w.worst_id, w.worst_val,
       s.avg_metric, s.num_trials, s.early_stopped
FROM (SELECT trial_id AS best_id, final_metric AS best_val FROM ranked WHERE rn_best = 1) b
CROSS JOIN (SELECT trial_id AS worst_id, final_metric AS worst_val FROM ranked WHERE rn_worst = 1) w
CROSS JOIN (
    SELECT cast(sum(cast(final_metric AS DECIMAL(18,4))) AS DOUBLE) / count(final_metric) AS avg_metric,
           count(*) AS num_trials,
           cast(sum(CASE WHEN early_stop THEN 1 ELSE 0 END) AS BIGINT) AS early_stopped
    FROM fin
) s
"""
)


# -- A2: direction normalization ---------------------------------------


def a2_direction_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negate metrics so a max-problem becomes a min-problem.

    Reference: `abstractoptimizer.py:186-252`.
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    return t.select("trial_id", (-F.col("final_metric")).alias("neg_metric"))


A2_SQL = with_fixtures(
    """
SELECT trial_id, -final_metric AS neg_metric
FROM trials WHERE status = 'FINALIZED'
"""
)


# -- A3: budget-filtered X/y assembly (BO training data) ---------------


def a3_get_xy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surrogate training rows for budget=1: normalized params + negated
    metric (direction max -> min problem).

    Reference: `BaseAsyncBO.get_XY` `bayes/base.py:459-641` (budget
    filter + transform + negation); normalization per §1.4.
    p1 in [0,49] -> /49; p2 ordinal over the 5 priority classes -> /4.
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).where(F.col("budget") == 1)
    domain = F.array(*[F.lit(s) for s in ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]])
    return t.select(
        "trial_id",
        (F.col("p1").cast("double") / F.lit(49.0)).alias("x1"),
        ((F.array_position(domain, F.col("p2")).cast("double") - F.lit(1.0)) / F.lit(4.0)).alias("x2"),
        (-F.col("final_metric")).alias("y"),
    )


A3_SQL = with_fixtures(
    """
SELECT trial_id,
       cast(p1 AS DOUBLE) / 49.0 AS x1,
       -- coalesce(...,0): Spark's array_position yields 0 for a value
       -- outside the domain where DuckDB list_position yields NULL;
       -- align so an out-of-domain p2 degrades identically (x2=-0.25)
       (cast(coalesce(list_position(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'], p2), 0) AS DOUBLE) - 1.0) / 4.0 AS x2,
       -final_metric AS y
FROM trials
WHERE status = 'FINALIZED' AND budget = 1
"""
)


# -- A4: per-budget ybest/yworst/ymean ---------------------------------


def a4_budget_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/mean of finalized metrics per budget.

    Reference: `ybest/yworst/ymean` `abstractoptimizer.py:402-443`;
    used by constant-liar imputation (`gp.py:345-361`).
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    return t.groupBy("budget").agg(
        F.min("final_metric").alias("ybest"),
        F.max("final_metric").alias("yworst"),
        _exact_avg("final_metric").alias("ymean"),
        F.count("*").alias("n_trials"),
    )


A4_SQL = with_fixtures(
    """
SELECT budget,
       min(final_metric) AS ybest,
       max(final_metric) AS yworst,
       cast(sum(cast(final_metric AS DECIMAL(18,4))) AS DOUBLE) / count(final_metric) AS ymean,
       count(*) AS n_trials
FROM trials
WHERE status = 'FINALIZED'
GROUP BY budget
"""
)


# -- A5: top-k per rung -------------------------------------------------


def a5_topk_per_rung(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Top-k finalized trials per rung (budget) by metric desc.

    Reference: ASHA `_top_k` `asha.py:161-169`; Hyperband promote
    `hyperband.py:501-527`. Window rank with seq tie-break.
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    w = Window.partitionBy("budget").orderBy(F.col("final_metric").desc(), F.col("seq"))
    return (
        t.select("budget", "trial_id", "final_metric", F.row_number().over(w).cast("bigint").alias("rank"))
        .where(F.col("rank") <= k)
    )


A5_SQL = with_fixtures(
    """
SELECT budget, trial_id, final_metric, rank FROM (
    SELECT budget, trial_id, final_metric,
           row_number() OVER (PARTITION BY budget ORDER BY final_metric DESC, seq) AS rank
    FROM trials WHERE status = 'FINALIZED'
) WHERE rank <= 3
"""
)


# -- A6: TPE good/bad split --------------------------------------------


def a6_tpe_split(spark: SparkSession, sf_dir: str, gamma: float = 0.15, n_hparams: int = 2) -> DataFrame:
    """Split finalized trials into good/bad by metric quantile.

    Reference: `TPE._split_trials` `tpe.py:191-221` — argsort by
    metric ascending; good = first max(n_hparams+1, floor(gamma*n)),
    bad = the rest up to good+max(n_hparams+1, floor((1-gamma)*n)).
    """
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    w = Window.orderBy(F.col("final_metric").asc(), F.col("seq"))
    # fully declarative: the total count rides an unordered global
    # window (no extra sort, no driver-side count() action at build
    # time), thresholds fold into the CASE like the oracle's
    # count(*) OVER ()
    floor_n = F.lit(n_hparams + 1).cast("bigint")
    ranked = t.select(
        "trial_id",
        "final_metric",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n"),
    )
    n_good = F.greatest(floor_n, F.floor(gamma * F.col("n")))
    n_bad = F.greatest(floor_n, F.floor((1.0 - gamma) * F.col("n")))
    return ranked.select(
        "trial_id",
        "final_metric",
        F.when(F.col("rn") <= n_good, F.lit("good"))
        .when(F.col("rn") <= n_good + n_bad, F.lit("bad"))
        .otherwise(F.lit("excluded"))
        .alias("split"),
    )


A6_SQL = with_fixtures(
    """
, fin AS (SELECT * FROM trials WHERE status = 'FINALIZED')
, ranked AS (
    SELECT trial_id, final_metric,
           row_number() OVER (ORDER BY final_metric ASC, seq) AS rn,
           count(*) OVER () AS n
    FROM fin
)
SELECT trial_id, final_metric,
       CASE WHEN rn <= greatest(3, cast(floor(0.15 * n) AS BIGINT)) THEN 'good'
            WHEN rn <= greatest(3, cast(floor(0.15 * n) AS BIGINT))
                      + greatest(3, cast(floor(0.85 * n) AS BIGINT)) THEN 'bad'
            ELSE 'excluded' END AS split
FROM ranked
"""
)


# -- A7: prefix average over metric history ----------------------------


def a7_prefix_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running mean of each trial's metric stream, ordered by step.

    Reference: median-rule input `medianrule.py:38-42`. Exact decimal
    running sum so the window accumulation order (Spark cumulative vs
    DuckDB segment tree) cannot change the value.
    """
    m = metrics_df(spark, sf_dir)
    w = Window.partitionBy("trial_id").orderBy("step").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return m.select(
        "trial_id",
        "step",
        (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)).alias("prefix_avg"),
    )


A7_SQL = with_fixtures(
    """
SELECT trial_id, step,
       cast(sum(cast(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
           / count(value) OVER w AS prefix_avg
FROM metrics
WINDOW w AS (PARTITION BY trial_id ORDER BY step ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""
)


# -- A8: median of prefix-averages (the early-stop threshold) ----------


def a8_median_prefix(spark: SparkSession, sf_dir: str, step_limit: int = 3) -> DataFrame:
    """Median over finished trials' mean-of-first-s metrics.

    Reference: `MedianStoppingRule` threshold `medianrule.py:44-51`.
    Rounded to 4 decimals to absorb last-ulp interpolation diffs.
    """
    from pyspark.sql import Window

    m = metrics_df(spark, sf_dir)
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).select("trial_id")
    # positional prefix (first s observations), like c3 and the
    # trial-local check — the reference indexes metric arrays
    w = Window.partitionBy("trial_id").orderBy("step")
    pavg = (
        m.join(t, "trial_id")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= step_limit)
        .groupBy("trial_id")
        .agg(_exact_avg("value").alias("pavg"))
    )
    return pavg.agg(F.round(F.percentile("pavg", F.lit(0.5)), 4).alias("median_prefix_avg"))


A8_SQL = with_fixtures(
    """
, pos AS (
    SELECT m.trial_id, m.value,
           row_number() OVER (PARTITION BY m.trial_id ORDER BY m.step) AS rn
    FROM metrics m
    JOIN trials t ON m.trial_id = t.trial_id AND t.status = 'FINALIZED'
),
pavg AS (
    SELECT trial_id,
           cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS pavg
    FROM pos
    WHERE rn <= 3
    GROUP BY trial_id
)
SELECT round(quantile_cont(pavg, 0.5), 4) AS median_prefix_avg FROM pavg
"""
)


# -- A9: average of non-null partition results -------------------------


def a9_partition_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean over non-null per-worker final metrics.

    Reference: distributed-training result averaging
    `base_driver.py:244-253`. PENDING trials carry NULL metrics.
    """
    t = trials_df(spark, sf_dir)
    return t.agg(
        _exact_avg("final_metric").alias("avg_metric"),
        F.count("final_metric").alias("n_reporting"),
        F.count("*").alias("n_total"),
    )


A9_SQL = with_fixtures(
    """
SELECT cast(sum(cast(final_metric AS DECIMAL(18,4))) AS DOUBLE) / count(final_metric) AS avg_metric,
       count(final_metric) AS n_reporting,
       count(*) AS n_total
FROM trials
"""
)


# -- A10: interim-results selection ------------------------------------


def a10_interim_selection(spark: SparkSession, sf_dir: str, interval: int = 2) -> DataFrame:
    """Every `interval`-th step of each history plus the last step,
    with the normalized-budget feature column.

    Reference: `bayes/base.py:643-668` (index selection) and
    `:536-641` (budget-augmented rows z = [x, n/N]).
    """
    m = metrics_df(spark, sf_dir)
    mx = m.groupBy("trial_id").agg(F.max("step").alias("max_step"))
    return (
        m.join(mx, "trial_id")
        .where((F.col("step") % interval == 0) | (F.col("step") == F.col("max_step")))
        .select(
            "trial_id",
            "step",
            "value",
            (F.col("step").cast("double") / F.col("max_step").cast("double")).alias("budget_frac"),
        )
    )


A10_SQL = with_fixtures(
    """
, mx AS (SELECT trial_id, max(step) AS max_step FROM metrics GROUP BY trial_id)
SELECT m.trial_id, m.step, m.value,
       cast(m.step AS DOUBLE) / cast(mx.max_step AS DOUBLE) AS budget_frac
FROM metrics m JOIN mx ON m.trial_id = mx.trial_id
WHERE m.step % 2 = 0 OR m.step = mx.max_step
"""
)


# -- A10b: multi-fidelity surrogate training rows ----------------------


def a10b_interim_xy(spark: SparkSession, sf_dir: str, interval: int = 2) -> DataFrame:
    """Budget-augmented BO training data z = [x, n/N] from interim
    results: every `interval`-th step (plus the last) of finalized
    trials' histories joined with their normalized params, metric
    negated to a min-problem.

    Reference: `get_XY` with interim_results
    (`bayes/base.py:536-641`) — the multi-fidelity path that feeds
    per-budget surrogates; selection rule as in A10
    (`base.py:643-668`), transform per §1.4.
    """
    from pyspark.sql import Window

    m = metrics_df(spark, sf_dir)
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).select("trial_id", "p1")
    m = m.join(t.select("trial_id"), "trial_id")
    # histories are step->value SEQUENCES: the budget of an interim
    # result is its 1-based position in the trial's history (row_number
    # over step), not the raw step label — fixture steps have gaps
    w = Window.partitionBy("trial_id").orderBy("step")
    pos = m.withColumn("rn", F.row_number().over(w))
    mx = pos.groupBy("trial_id").agg(F.max("rn").alias("hist_len"))
    # global max budget N over finalized history lengths;
    # z = (rn-1)/(N-1) matches the reference's
    # _normalize_integer([0, N-1], idx) over 0-based history positions
    # (base.py:589-599); greatest(.,1) guards a single-step corpus the
    # same way get_XY does
    g = mx.agg(F.max("hist_len").alias("gmax"))
    sel = (
        pos.join(mx, "trial_id")
        .where((F.col("rn") % interval == 0) | (F.col("rn") == F.col("hist_len")))
        .join(t, "trial_id")
        .crossJoin(F.broadcast(g))
    )
    return sel.select(
        "trial_id",
        "step",
        (F.col("p1").cast("double") / F.lit(49.0)).alias("x1"),
        (
            (F.col("rn") - 1).cast("double")
            / F.greatest(F.col("gmax") - 1, F.lit(1)).cast("double")
        ).alias("z_budget"),
        (-F.col("value")).alias("y"),
    )


A10B_SQL = with_fixtures(
    """
, ft AS (SELECT trial_id, p1 FROM trials WHERE status = 'FINALIZED')
, fm AS (
    SELECT m.*, row_number() OVER (PARTITION BY m.trial_id ORDER BY m.step) AS rn
    FROM metrics m JOIN ft ON m.trial_id = ft.trial_id
)
, mx AS (SELECT trial_id, max(rn) AS hist_len FROM fm GROUP BY trial_id)
, g AS (SELECT max(hist_len) AS gmax FROM mx)
SELECT m.trial_id, m.step,
       cast(t.p1 AS DOUBLE) / 49.0 AS x1,
       cast(m.rn - 1 AS DOUBLE) / cast(greatest(g.gmax - 1, 1) AS DOUBLE) AS z_budget,
       -m.value AS y
FROM fm m
JOIN mx ON m.trial_id = mx.trial_id
JOIN ft t ON m.trial_id = t.trial_id
CROSS JOIN g
WHERE m.rn % 2 = 0 OR m.rn = mx.hist_len
"""
)


# a8_median_prefix and a10b_interim_xy stay oracle-checked via
# tests/test_offline_oracles.py but are NOT registered: the driver's
# correctness gate checks only the first 50 registry entries, and these
# two are supplementary views of c3/a7 and a10 respectively — the slots
# go to pl1/pl2 and hb1 instead.
OPERATORS = [
    ("a1_result_summary", a1_result_summary, A1_SQL),
    # a2_direction_normalize rotated OUT of the registry round 8 (its
    # single-expression negation is a literal sub-expression of the
    # gate-green a3_get_xy's y column) to make room for tx12_pii_scan
    # under the 50-entry cap; parity continues in
    # tests/test_offline_oracles.py.
    ("a3_get_xy", a3_get_xy, A3_SQL),
    ("a4_budget_stats", a4_budget_stats, A4_SQL),
    ("a5_topk_per_rung", a5_topk_per_rung, A5_SQL),
    ("a6_tpe_split", a6_tpe_split, A6_SQL),
    ("a7_prefix_avg", a7_prefix_avg, A7_SQL),
    # a9_partition_avg rotated OUT round 9 (a 1-row mean whose shape
    # the gate-green a1/a4 aggregates already hard-verify) to free a
    # slot for ev11_volume_anomaly; parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    ("a10_interim_selection", a10_interim_selection, A10_SQL),
]


# -- A13: best-so-far regret curve --------------------------------------


def a13_regret_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE HPO evaluation relation: the best-so-far curve over the
    finalized trial sequence — (seq, final_metric, best_so_far,
    improved) — what every optimizer comparison plots (simple regret
    is best_so_far minus the optimum, a constant shift). Running max
    over a window ORDERED BY the submission sequence; improvement
    flags compare against the strictly-prior prefix.

    Scale note: the global-order window is CORRECT here, not a
    compromise — trial relations are driver-scale (thousands of
    rows), the documented boundary where pl17/pl21-style two-phase
    realizations are overkill. Determinism: running MAX is
    order-insensitive within the prefix; no sums. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    from maggy_spark.plans.fixtures import trials_df

    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).select("seq", "final_metric")
    w = Window.orderBy("seq")
    prev = Window.orderBy("seq").rowsBetween(Window.unboundedPreceding, -1)
    best = F.max("final_metric").over(w)
    prior = F.max("final_metric").over(prev)
    return t.select(
        "seq",
        "final_metric",
        best.alias("best_so_far"),
        (prior.isNull() | (F.col("final_metric") > prior)).alias("improved"),
    )


A13_SQL = with_fixtures("""
SELECT seq, final_metric,
       max(final_metric) OVER (ORDER BY seq) AS best_so_far,
       (max(final_metric) OVER (ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
            IS NULL
        OR final_metric > max(final_metric)
             OVER (ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) AS improved
FROM trials WHERE status = 'FINALIZED'
""")


# -- A14: hyperparameter importance (banded eta-squared) -----------------


def a14_param_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hyperparameter importance over the finalized trials — the
    variance-decomposition readout (correlation ratio eta^2, the
    single-parameter marginal of fANOVA, Hutter et al. ICML 2014)
    every post-hoc HPO analysis starts with: how much of the metric's
    variance does each param's bin explain? Output: one row per
    param — (param, n_bins, n, sum_y, sum_y2, between_milli, eta2).

    Cross-engine exactness by BANDING (the dd22/tx16 discipline):
    the metric is quantized to exact cents, then banded into 10
    fixed integer deciles of the cent range — y in 0..9 — so every
    sufficient statistic is a small exact integer: per-bin n_g and
    s_g = sum(y), the between-groups numerator SUM_g (s_g^2 * 1000)
    DIV n_g in exact milli units (magnitudes: s_g^2 <= ~1.8e14 at
    1.5M trials, *1000 well inside int64), and the total sum/sumsq
    of y. eta2 = (between/1000 - S^2/N) / (sum_y2 - S^2/N) is IEEE
    arithmetic over those exact integers, spelled identically in the
    twin; a zero-variance metric yields eta2 = 0 by guard. Bins:
    p1 DIV 5 (10 bins), p2 as-is (5 priorities), p3 DIV 50 (10
    bins). Scale: three map-combined groupBys over the one trials
    scan; every aggregate relation is <= |bins| rows. Not in the
    driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from maggy_spark.plans.fixtures import trials_df

    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).where(
        F.col("final_metric").isNotNull()
    )
    mc = F.round(F.col("final_metric") * 100).cast("bigint")
    t = t.select(
        mc.alias("mc"),
        (F.col("p1").cast("bigint")).alias("p1"),
        F.col("p2"),
        (F.col("p3").cast("bigint")).alias("p3"),
    )
    env = t.agg(F.max("mc").alias("max_mc"), F.min("mc").alias("min_mc"))
    ty = (
        t.crossJoin(F.broadcast(env))
        .withColumn("_span", F.col("max_mc") - F.col("min_mc") + 1)
        .withColumn(
            "y",
            F.expr("((mc - min_mc) * 10) DIV _span").cast("bigint"),
        )
        .select("p1", "p2", "p3", "y")
    )

    def stats_for(bin_col, pname: str) -> DataFrame:
        g = ty.groupBy(bin_col.alias("bin")).agg(
            F.count("*").cast("bigint").alias("n_g"),
            F.sum("y").cast("bigint").alias("s_g"),
        )
        return g.agg(
            F.lit(pname).alias("param"),
            F.count("*").cast("bigint").alias("n_bins"),
            F.sum("n_g").cast("bigint").alias("n"),
            F.sum("s_g").cast("bigint").alias("sum_y"),
            F.sum(F.expr("(s_g * s_g * 1000) DIV n_g")).cast("bigint").alias("between_milli"),
        )

    tot = ty.agg(F.sum(F.col("y") * F.col("y")).cast("bigint").alias("sum_y2"))
    per = (
        stats_for(F.expr("p1 DIV 5"), "p1")
        .unionByName(stats_for(F.col("p2"), "p2"))
        .unionByName(stats_for(F.expr("p3 DIV 50"), "p3"))
        .crossJoin(F.broadcast(tot))
    )
    s2n = F.col("sum_y").cast("double") * F.col("sum_y").cast("double") / F.col("n").cast("double")
    sst = F.col("sum_y2").cast("double") - s2n
    ssb = F.col("between_milli").cast("double") / F.lit(1000.0) - s2n
    return per.select(
        "param",
        "n_bins",
        "n",
        "sum_y",
        "sum_y2",
        "between_milli",
        F.when(sst == 0, F.lit(0.0)).otherwise(ssb / sst).alias("eta2"),
    )


A14_SQL = with_fixtures("""
, fin AS (
    SELECT cast(round(final_metric * 100) AS BIGINT) AS mc,
           cast(p1 AS BIGINT) AS p1, p2, cast(p3 AS BIGINT) AS p3
    FROM trials WHERE status = 'FINALIZED' AND final_metric IS NOT NULL
),
env AS (SELECT max(mc) AS max_mc, min(mc) AS min_mc FROM fin),
ty AS (
    SELECT p1, p2, p3,
           ((mc - min_mc) * 10) // (max_mc - min_mc + 1) AS y
    FROM fin CROSS JOIN env
),
tot AS (SELECT cast(sum(y * y) AS BIGINT) AS sum_y2 FROM ty),
bins AS (
    SELECT 'p1' AS param, cast(p1 // 5 AS VARCHAR) AS bin, cast(count(*) AS BIGINT) AS n_g,
           cast(sum(y) AS BIGINT) AS s_g FROM ty GROUP BY p1 // 5
    UNION ALL
    SELECT 'p2', p2, cast(count(*) AS BIGINT), cast(sum(y) AS BIGINT) FROM ty GROUP BY p2
    UNION ALL
    SELECT 'p3', cast(p3 // 50 AS VARCHAR), cast(count(*) AS BIGINT), cast(sum(y) AS BIGINT)
    FROM ty GROUP BY p3 // 50
),
per AS (
    SELECT param,
           cast(count(*) AS BIGINT) AS n_bins,
           cast(sum(n_g) AS BIGINT) AS n,
           cast(sum(s_g) AS BIGINT) AS sum_y,
           cast(sum((s_g * s_g * 1000) // n_g) AS BIGINT) AS between_milli
    FROM bins GROUP BY param
)
SELECT param, n_bins, n, sum_y, t.sum_y2, between_milli,
       CASE WHEN cast(t.sum_y2 AS DOUBLE)
                 - cast(sum_y AS DOUBLE) * cast(sum_y AS DOUBLE) / cast(n AS DOUBLE) = 0
            THEN 0.0
            ELSE (cast(between_milli AS DOUBLE) / 1000.0
                  - cast(sum_y AS DOUBLE) * cast(sum_y AS DOUBLE) / cast(n AS DOUBLE))
                 / (cast(t.sum_y2 AS DOUBLE)
                    - cast(sum_y AS DOUBLE) * cast(sum_y AS DOUBLE) / cast(n AS DOUBLE)) END AS eta2
FROM per CROSS JOIN tot t
""")


# -- A15: early-stop savings ledger ---------------------------------------


def a15_earlystop_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cost side of early stopping — the relation an HPO platform
    reads to justify (or retune) its stopping rule: per budget rung,
    how many metric steps did finalized trials actually report vs the
    rung's observed full horizon, and how much of the rung's step
    budget did the stopped trials give back (Li et al., Hyperband
    JMLR 2018 frames exactly this resource accounting). Output per
    budget: (budget, n_trials, n_stopped, steps_run, steps_full,
    saved_steps, saved_frac).

    steps_run is the per-trial count of DEDUPED metric steps (c2's
    relation); the rung's horizon is the max steps any of its trials
    reported, so steps_full = n_trials * horizon and saved_steps =
    steps_full - steps_run — all exact integer counts (no float
    anywhere until the final saved_frac, one int/int IEEE division).
    Scale: one metrics aggregation keyed by trial (map-combined), a
    trial-keyed join, and a |budgets|-row rollup. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from maggy_spark.plans.fixtures import metrics_df, trials_df

    per_trial = metrics_df(spark, sf_dir).groupBy("trial_id").agg(
        F.count("*").cast("bigint").alias("steps_run")
    )
    t = trials_df(spark, sf_dir, statuses=["FINALIZED"]).select(
        "trial_id", "budget", "early_stop"
    )
    j = t.join(per_trial, "trial_id", "left").select(
        "budget",
        "early_stop",
        F.coalesce("steps_run", F.lit(0).cast("bigint")).alias("steps_run"),
    )
    per_budget = j.groupBy("budget").agg(
        F.count("*").cast("bigint").alias("n_trials"),
        F.sum(F.col("early_stop").cast("bigint")).cast("bigint").alias("n_stopped"),
        F.sum("steps_run").cast("bigint").alias("steps_run"),
        F.max("steps_run").cast("bigint").alias("horizon"),
    )
    steps_full = F.col("n_trials") * F.col("horizon")
    saved = steps_full - F.col("steps_run")
    return per_budget.select(
        "budget",
        "n_trials",
        "n_stopped",
        "steps_run",
        steps_full.alias("steps_full"),
        saved.alias("saved_steps"),
        F.when(steps_full == 0, F.lit(0.0))
        .otherwise(saved.cast("double") / steps_full.cast("double"))
        .alias("saved_frac"),
    )


A15_SQL = with_fixtures("""
, per_trial AS (
    SELECT trial_id, cast(count(*) AS BIGINT) AS steps_run
    FROM metrics GROUP BY trial_id
),
fin AS (
    SELECT t.budget, t.early_stop,
           cast(coalesce(p.steps_run, 0) AS BIGINT) AS steps_run
    FROM trials t LEFT JOIN per_trial p ON t.trial_id = p.trial_id
    WHERE t.status = 'FINALIZED'
),
per_budget AS (
    SELECT budget,
           cast(count(*) AS BIGINT) AS n_trials,
           cast(sum(CASE WHEN early_stop THEN 1 ELSE 0 END) AS BIGINT) AS n_stopped,
           cast(sum(steps_run) AS BIGINT) AS steps_run,
           cast(max(steps_run) AS BIGINT) AS horizon
    FROM fin GROUP BY budget
)
SELECT budget, n_trials, n_stopped, steps_run,
       cast(n_trials * horizon AS BIGINT) AS steps_full,
       cast(n_trials * horizon - steps_run AS BIGINT) AS saved_steps,
       CASE WHEN n_trials * horizon = 0 THEN 0.0
            ELSE cast(n_trials * horizon - steps_run AS DOUBLE)
                 / cast(n_trials * horizon AS DOUBLE) END AS saved_frac
FROM per_budget
""")
