"""Event-stream analytics over the `events` table (the batch twin of
the streaming metric-ingest path, SURVEY.md §2.3 C1/C2).

The events feed models the reference's heartbeat traffic: user_id as
the reporting trial, event_id as the step, `value` as the metric.
Aggregates use the exact-decimal accumulator (events.value is
4-decimal clean) for cross-engine determinism; date bucketing stays
at day granularity so the nanos->micros timestamp conversion
(fixtures.load_events) can never move a row across a bucket edge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.plans.fixtures import load_events

DEC4 = "decimal(18,4)"


def ev1_type_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type volume and value stats — one scan, one shuffle
    on a low-cardinality key."""
    e = load_events(spark, sf_dir)
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.count("value").alias("n_valued"),
        (F.sum(F.col("value").cast(DEC4)).cast("double") / F.count("value")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


EV1_SQL = """
SELECT event_type,
       count(*) AS n_events,
       count(value) AS n_valued,
       cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS avg_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY event_type
"""


def ev2_daily_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users and event volume — the partition-pruning
    shape: at 100 TB `events` is date-partitioned and this query
    prunes to the requested days at the scan."""
    e = load_events(spark, sf_dir)
    # day via epoch-day arithmetic (unix_micros is tz-independent, the
    # DateType render is pure): matches DuckDB's naive-timestamp day
    # on ANY session timezone — date_format would shift day boundaries
    # with spark.sql.session.timeZone. String form is unambiguous
    # across both engines' client layers.
    epoch_days = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("int")
    day = F.date_add(F.lit("1970-01-01").cast("date"), epoch_days).cast("string")
    return e.groupBy(day.alias("day")).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("active_users"),
        (F.sum(F.col("value").cast(DEC4)).cast("double") / F.count("value")).alias("avg_value"),
    )


EV2_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day,
       count(*) AS n_events,
       count(DISTINCT user_id) AS active_users,
       cast(sum(cast(value AS DECIMAL(18,4))) AS DOUBLE) / count(value) AS avg_value
FROM events
GROUP BY strftime(ts, '%Y-%m-%d')
"""


def ev3_user_metric_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running metric mean ordered by event time — the
    heartbeat prefix-average (A7) over the events feed; window
    partitioned by user so state is user-local."""
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir).where(F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "value",
        (F.sum(F.col("value").cast(DEC4)).over(w).cast("double") / F.count("value").over(w)).alias(
            "running_avg"
        ),
    )


EV3_SQL = """
SELECT user_id, event_id, value,
       cast(sum(cast(value AS DECIMAL(18,4))) OVER w AS DOUBLE) / count(value) OVER w AS running_avg
FROM events
WHERE value IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


def ev4_asof_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each purchase attributed to the
    same user's most recent click at or before the purchase instant —
    the feature-store correctness primitive (no future leakage) that
    Spark has no native operator for.

    Scale shape: NOT a range join (a time-bounded theta join explodes
    on active users). Both event slices union into one relation and a
    single user-partitioned running window carries the last-seen
    click forward; purchases then read it. One shuffle on user_id,
    state bounded by one row per user per window frame — the same
    plan holds with billions of rows per user-day. Same-instant ties
    order clicks before purchases (at-or-before includes them) and
    break by event_id, so the result is engine-independent.
    Inner-as-of semantics: purchases with no preceding click are
    dropped (their attribution is undefined).

    The DuckDB twin deliberately uses a DIFFERENT algorithm — the
    native ASOF JOIN — so the oracle cross-checks the window
    construction against an independent implementation.
    """
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir)
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id"), F.col("value").alias("click_value"),
        F.lit(1).alias("is_click"),
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"),
        F.lit(None).cast("bigint").alias("click_id"),
        F.lit(None).cast("double").alias("click_value"),
        F.lit(0).alias("is_click"),
    )
    tagged = clicks.select(
        "user_id", "ts", F.lit(None).cast("bigint").alias("purchase_id"),
        "click_id", "click_value", "is_click",
    ).unionByName(purchases)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("is_click").desc(), F.coalesce("click_id", "purchase_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # ONE struct per click carried atomically: separate last() columns
    # with ignorenulls would desynchronize when the nearest click has
    # a NULL value (its id would pair with an older click's value)
    click_struct = F.when(
        F.col("is_click") == 1, F.struct(F.col("ts"), F.col("click_id"), F.col("click_value"))
    )
    carried = tagged.select(
        "user_id", "ts", "purchase_id",
        F.last(click_struct, ignorenulls=True).over(w).alias("lc"),
    )
    return (
        carried.where(F.col("purchase_id").isNotNull() & F.col("lc").isNotNull())
        .select(
            "user_id",
            "purchase_id",
            F.unix_micros("ts").alias("purchase_us"),
            F.col("lc.click_id").alias("click_id"),
            F.col("lc.click_value").alias("click_value"),
            (F.unix_micros("ts") - F.unix_micros("lc.ts")).alias("gap_us"),
        )
    )


# ASOF resolves WHICH timestamp is nearest; the second step resolves
# WHICH ROW among same-microsecond clicks (max event_id — the Spark
# window's tie order) because ASOF leaves equal-ts ties
# engine-arbitrary. Without it, parity would flake the day the
# fixture data grows a same-microsecond click pair.
EV4_SQL = """
WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
c AS (SELECT * FROM events WHERE event_type = 'click'),
nearest AS (
    SELECT p.user_id, p.event_id AS purchase_id, p.ts AS pts, c.ts AS cts
    FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
),
resolved AS (
    SELECT n.user_id, n.purchase_id, n.pts, n.cts, c2.event_id AS click_id, c2.value AS click_value,
           row_number() OVER (PARTITION BY n.user_id, n.purchase_id ORDER BY c2.event_id DESC) AS rn
    FROM nearest n JOIN c c2 ON c2.user_id = n.user_id AND c2.ts = n.cts
)
SELECT user_id, purchase_id, epoch_us(pts) AS purchase_us, click_id, click_value,
       epoch_us(pts) - epoch_us(cts) AS gap_us
FROM resolved WHERE rn = 1
"""


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30-minute inactivity closes a session


def ev5_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: split each user's event stream at >30-minute
    inactivity gaps and aggregate per session — the session-window
    shape, built from the lag-gap-cumsum idiom so the batch path
    needs no stateful operator.

    Boundary semantics: a gap of EXACTLY the timeout stays in the
    session (split on strictly-greater gaps). This matches Structured
    Streaming's `session_window`, which merges touching windows — an
    event at exactly prev+gap extends the session (verified
    empirically; pinned by test_session_boundary_gap_exactly_timeout
    so the streaming twin can never silently diverge at the edge).

    Scale shape: one shuffle on user_id; the gap flags and the
    running session counter ride a single user-partitioned sort, and
    the per-session rollup reuses the same partitioning (no second
    shuffle of the full relation — Catalyst sees the groupBy keys
    prefix-match the window partitioning). Deterministic ordering via
    (ts, event_id) ties."""
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    gapped = e.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(order).isNull()
            | ((F.col("us") - F.lag("us").over(order)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = gapped.withColumn("session_id", F.sum("new_session").over(run))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_purchases"),
    )


EV5_SQL = f"""
WITH gapped AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
    SELECT *, cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM gapped
)
SELECT user_id, session_id,
       count(*) AS n_events,
       min(us) AS start_us,
       max(us) AS end_us,
       max(us) - min(us) AS duration_us,
       cast(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchases
FROM sessions
GROUP BY user_id, session_id
"""


TRAIL_WINDOW_US = 3 * 24 * 3600 * 1_000_000  # 3-day trailing feature window


def ev6_trailing_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing time-range features at label time: for each purchase,
    the same user's click count and click-value sum over the previous
    3 days up to the purchase instant — the leakage-free rolling
    aggregate every point-in-time feature pipeline computes.

    Scale shape: a RANGE-framed window over microsecond epochs, one
    shuffle on user_id; the frame is time-bounded so window state is
    capped by events-per-user-per-3-days regardless of corpus size.
    Conditional aggregation inside the frame (clicks only) avoids a
    self-join of the events relation against itself. Value sums route
    through decimal for bit-exact cross-engine doubles."""
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", "value", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us").rangeBetween(-TRAIL_WINDOW_US, Window.currentRow)
    feats = e.select(
        "user_id",
        "event_id",
        "event_type",
        "us",
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).over(w).alias("n_clicks_3d"),
        F.sum(F.when(F.col("event_type") == "click", F.col("value").cast(DEC4))).over(w)
        .cast("double")
        .alias("click_value_3d"),
    )
    return feats.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("us").alias("purchase_us"),
        "n_clicks_3d",
        "click_value_3d",
    )


EV6_SQL = f"""
WITH feats AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           cast(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w AS BIGINT) AS n_clicks_3d,
           cast(sum(CASE WHEN event_type = 'click' THEN cast(value AS DECIMAL(18,4)) END) OVER w AS DOUBLE) AS click_value_3d
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {TRAIL_WINDOW_US} PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id AS purchase_id, us AS purchase_us, n_clicks_3d, click_value_3d
FROM feats WHERE event_type = 'purchase'
"""


def _funnel_instants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered-funnel instants (user_id, v, cs, ps, c, p):
    first view, first click AT OR AFTER it, first purchase at or
    after that click — the staging chain SHARED by ev7 (stage counts)
    and ev9 (lag histogram), factored so the ordering rule cannot
    drift between them. ONE shuffle on user_id; per-user state is the
    sorted instant arrays (bounded by events-per-user)."""
    e = load_events(spark, sf_dir).select(
        "user_id", F.col("event_type").alias("et"), F.unix_micros("ts").alias("us")
    )
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("et") == "view", F.col("us"))).alias("v"),
        F.sort_array(F.collect_list(F.when(F.col("et") == "click", F.col("us")))).alias("cs"),
        F.sort_array(F.collect_list(F.when(F.col("et") == "purchase", F.col("us")))).alias("ps"),
    )
    c = F.array_min(F.filter("cs", lambda x: x >= F.col("v")))
    return per_user.withColumn("c", c).withColumn(
        "p", F.array_min(F.filter("ps", lambda x: x >= F.col("c")))
    )


# the matching SQL staging chain (CTE list fragment), shared by
# EV7_SQL and EV9_SQL for the same no-drift reason
_FUNNEL_STAGE_SQL = """per_user AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v,
           list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'click')) AS cs,
           list_sort(list(epoch_us(ts)) FILTER (WHERE event_type = 'purchase')) AS ps
    FROM events GROUP BY user_id
),
with_c AS (
    SELECT user_id, v, ps, list_min(list_filter(cs, x -> x >= v)) AS c FROM per_user
),
with_p AS (
    SELECT user_id, v, c, list_min(list_filter(ps, x -> x >= c)) AS p FROM with_c
)"""


def ev7_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: per user, the first view, the first
    click AT OR AFTER that view, and the first purchase at or after
    that click — then user counts per deepest stage reached. The
    ordering constraint is what separates a funnel from three plain
    counts: a purchase BEFORE any view does not convert.

    Scale shape: see _funnel_instants (one user_id shuffle); the
    stage rollup is pure array arithmetic — no self-joins, no window
    over the full feed, no re-scan per stage. Not in the driver
    registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    staged = _funnel_instants(spark, sf_dir)
    stage = (
        F.when(F.col("p").isNotNull(), F.lit(3))
        .when(F.col("c").isNotNull(), F.lit(2))
        .when(F.col("v").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    name = F.element_at(
        F.array(F.lit("no_view"), F.lit("viewed"), F.lit("clicked"), F.lit("purchased")),
        stage + 1,
    )
    return staged.groupBy(stage.cast("bigint").alias("stage"), name.alias("stage_name")).agg(
        F.count("*").alias("n_users")
    )


EV7_SQL = f"""
WITH {_FUNNEL_STAGE_SQL},
staged AS (
    SELECT CASE WHEN p IS NOT NULL THEN 3
                WHEN c IS NOT NULL THEN 2
                WHEN v IS NOT NULL THEN 1
                ELSE 0 END AS stage
    FROM with_p
)
SELECT cast(stage AS BIGINT) AS stage,
       (CASE stage WHEN 0 THEN 'no_view' WHEN 1 THEN 'viewed'
                   WHEN 2 THEN 'clicked' ELSE 'purchased' END) AS stage_name,
       count(*) AS n_users
FROM staged
GROUP BY stage
"""


# ev3 is NOT in the driver registry (50-entry cap): its shape — a
# per-key running prefix mean — is already hard-verified by the
# registered a7_prefix_avg, so its slot went to the dd10 fuzzy-dedup
# capstone. ev3's own parity stays enforced offline
# (tests/test_offline_oracles.py, same three-way compare).
def ev8_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by their FIRST active
    day; for each (cohort, day offset) the distinct users active that
    day and the retained fraction of the cohort — the engagement view
    a data pipeline publishes next to daily activity (ev2).

    Scale shape: the corpus-sized events relation is touched ONCE, by
    the user-day DISTINCT; everything downstream (first-day groupBy,
    cohort sizes, the retention rollup) runs on the |users x days|
    relation, orders of magnitude smaller. Day bucketing uses the
    same tz-free epoch-day arithmetic as ev2, so no session-timezone
    dependence on either engine. Not in the driver registry (50-entry
    cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    from pyspark.sql import Window

    e = load_events(spark, sf_dir)
    epoch_day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("int")
    ud = e.select("user_id", epoch_day.alias("d")).distinct()
    # cohort day as a window MIN over the user-day relation (no
    # groupBy + join-back: one pass, and the window's user partition
    # is what the distinct above already produced)
    wu = Window.partitionBy("user_id")
    wd = ud.withColumn("cohort_d", F.min("d").over(wu))
    act = (
        wd.groupBy("cohort_d", (F.col("d") - F.col("cohort_d")).alias("day_offset"))
        # ud is DISTINCT (user, day) and cohort_d is a function of the
        # user, so each user contributes exactly one row per group:
        # count(*) equals countDistinct(user) without the extra
        # distinct-aggregate expand pass
        .agg(F.count("*").alias("n_active"))
    )
    # cohort size IS the day-0 row of the same aggregate (every cohort
    # member is active on its first day): read it with a window over
    # `act` rather than a self-join — one linear subtree, the corpus
    # is scanned exactly once, and the window runs on the already-tiny
    # |cohorts x offsets| relation
    wc = Window.partitionBy("cohort_d")
    sized = act.withColumn(
        "cohort_size",
        F.max(F.when(F.col("day_offset") == 0, F.col("n_active"))).over(wc),
    )
    day = F.date_add(F.lit("1970-01-01").cast("date"), F.col("cohort_d")).cast("string")
    return sized.select(
        day.alias("cohort_day"),
        "day_offset",
        "n_active",
        "cohort_size",
        (F.col("n_active").cast("double") / F.col("cohort_size").cast("double")).alias("retention"),
    )


EV8_SQL = """
WITH ud AS (
    SELECT DISTINCT user_id,
           CAST(floor(epoch_us(ts) / 86400000000.0) AS INTEGER) AS d
    FROM events
),
first AS (SELECT user_id, min(d) AS cohort_d FROM ud GROUP BY user_id),
sizes AS (SELECT cohort_d, count(*) AS cohort_size FROM first GROUP BY cohort_d),
act AS (
    SELECT f.cohort_d, ud.d - f.cohort_d AS day_offset,
           count(*) AS n_active
    FROM ud JOIN first f USING (user_id)
    GROUP BY f.cohort_d, ud.d - f.cohort_d
)
SELECT strftime(DATE '1970-01-01' + a.cohort_d, '%Y-%m-%d') AS cohort_day,
       a.day_offset, a.n_active, s.cohort_size,
       cast(a.n_active AS DOUBLE) / cast(s.cohort_size AS DOUBLE) AS retention
FROM act a JOIN sizes s USING (cohort_d)
"""


# ev1_type_rollup ROTATED OUT of the driver registry in round 6 (its
# low-cardinality groupBy + decimal-avg shape is a strict subset of
# the registered ev2_daily_activity); parity stays enforced offline.
# The freed slot hard-gates dd12_boilerplate_profile. See COVERAGE.md.
OPERATORS = [
    # ev2_daily_activity rotated OUT round 9 (its tz-free day rollup is
    # a literal sub-relation of gate-green ev11's daily CTE) to free a
    # slot for ing1_ingest_gate; parity continues in
    # tests/test_offline_oracles.py at the gate's sf0.01.
    # rotated INTO the driver registry in round 6 (slots freed by
    # g4/g10 — see generators.py and COVERAGE.md): the as-of join and
    # sessionization are the two event operators a pipeline user hits
    # most, so they belong under the driver's sf0.01 hard gate
    ("ev4_asof_attribution", ev4_asof_attribution, EV4_SQL),
    ("ev5_sessionize", ev5_sessionize, EV5_SQL),
]


# --- ev9: conversion-lag histogram --------------------------------------


def ev9_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution over ev7's ordered funnel: for
    every user who progressed, the view→click, click→purchase and
    view→purchase lags, bucketed to whole hours — the latency
    histogram an events pipeline publishes next to the funnel counts
    (quantiles are read off the histogram downstream).

    A histogram, deliberately NOT exact quantiles: per-kind exact
    quantiles need a total order over all converting users (one task
    per kind at any scale), while the hour bucketing is a per-row
    expression and the (kind, bucket) groupBy is a uniform bounded
    key — the shape that survives 100 TB. All lags are exact integer
    microseconds, so every histogram row is engine-exact.

    Scale shape: reuses ev7's one-shuffle per-user chain
    (_funnel_instants — the SAME staging code, so the funnel
    ordering rule cannot drift between the counts and the lags); the
    explode emits at most 3 rows per converting user. Not in the
    driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    staged = _funnel_instants(spark, sf_dir)
    lag_rows = staged.select(
        F.explode(
            F.filter(
                F.array(
                    F.struct(
                        F.lit("view_to_click").alias("lag_kind"),
                        (F.col("c") - F.col("v")).alias("lag_us"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("lag_kind"),
                        (F.col("p") - F.col("c")).alias("lag_us"),
                    ),
                    F.struct(
                        F.lit("view_to_purchase").alias("lag_kind"),
                        (F.col("p") - F.col("v")).alias("lag_us"),
                    ),
                ),
                lambda s: s["lag_us"].isNotNull(),
            )
        ).alias("l")
    )
    hours = F.floor(F.col("l.lag_us") / F.lit(3_600_000_000.0)).cast("bigint")
    return (
        lag_rows.groupBy(F.col("l.lag_kind").alias("lag_kind"), hours.alias("lag_hours"))
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


EV9_SQL = f"""
WITH {_FUNNEL_STAGE_SQL},
lags AS (
    SELECT 'view_to_click' AS lag_kind, c - v AS lag_us FROM with_p WHERE c IS NOT NULL
    UNION ALL
    SELECT 'click_to_purchase', p - c FROM with_p WHERE p IS NOT NULL
    UNION ALL
    SELECT 'view_to_purchase', p - v FROM with_p WHERE p IS NOT NULL
)
SELECT lag_kind,
       cast(floor(lag_us / 3600000000.0) AS BIGINT) AS lag_hours,
       cast(count(*) AS BIGINT) AS n_users
FROM lags
GROUP BY lag_kind, lag_hours
"""


# --- ev10: RFM user segmentation ----------------------------------------

RFM_RECENT_DAYS = 2     # recency <= this and frequent -> champion
RFM_ACTIVE_DAYS = 7     # recency <= this -> active
RFM_MIN_FREQUENT = 20   # events for the champion tier


def ev10_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic RFM rollup: per user, Recency (days since last event,
    relative to the corpus's last day), Frequency (events), Monetary
    (purchase value sum) and a fixed-threshold segment label — the
    user-tiering relation an events pipeline feeds to retention
    dashboards next to ev8's cohort triangle.

    Cross-engine determinism: days are tz-free epoch-day integers
    (ev2's pattern) and the monetary sum routes through decimal(18,4)
    so it is partition-order-free. Thresholds are fixed constants,
    like pl10's — rank-derived tiers would need a global order.

    Scale shape: one user_id groupBy with map-side combine plus a
    1-row broadcast of the corpus max day (computed directly from
    the feed, not by re-aggregating the per-user relation, so the
    corpus groupBy runs once). Not in the driver registry (50-entry
    cap); DuckDB parity in tests/test_offline_oracles.py.
    """
    e = load_events(spark, sf_dir)
    epoch_day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.max(epoch_day).alias("last_day"),
        F.count("*").alias("frequency"),
        F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).cast(DEC4)).alias(
            "m_dec"
        ),
    )
    maxday = e.agg(F.max(epoch_day).alias("corpus_last_day"))
    r = F.col("corpus_last_day") - F.col("last_day")
    seg = (
        F.when((r <= RFM_RECENT_DAYS) & (F.col("frequency") >= RFM_MIN_FREQUENT), "champion")
        .when(r <= RFM_ACTIVE_DAYS, "active")
        .otherwise("at_risk")
    )
    return per_user.crossJoin(F.broadcast(maxday)).select(
        "user_id",
        r.cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.coalesce(F.col("m_dec"), F.lit(0).cast(DEC4)).cast("double").alias("monetary"),
        seg.alias("segment"),
    )


EV10_SQL = f"""
WITH per_user AS (
    SELECT user_id,
           max(cast(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS last_day,
           cast(count(*) AS BIGINT) AS frequency,
           sum(cast(CASE WHEN event_type = 'purchase' THEN value END AS DECIMAL(18,4))) AS m_dec
    FROM events GROUP BY user_id
),
md AS (SELECT max(cast(floor(epoch_us(ts) / 86400000000.0) AS BIGINT)) AS corpus_last_day FROM events)
SELECT user_id,
       cast(corpus_last_day - last_day AS BIGINT) AS recency_days,
       frequency,
       cast(coalesce(m_dec, 0) AS DOUBLE) AS monetary,
       CASE WHEN corpus_last_day - last_day <= {RFM_RECENT_DAYS}
                 AND frequency >= {RFM_MIN_FREQUENT} THEN 'champion'
            WHEN corpus_last_day - last_day <= {RFM_ACTIVE_DAYS} THEN 'active'
            ELSE 'at_risk' END AS segment
FROM per_user CROSS JOIN md
"""


# -- ev11: event-volume anomaly (trailing z-score) -------------------------

ANOM_WINDOW_DAYS = 7    # trailing history window (current day excluded)
ANOM_MIN_HISTORY = 4    # days of history required before scoring
ANOM_Z = 3.0            # |z| threshold


def ev11_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) volume anomaly score — the feed monitor
    every ingestion pipeline runs: a day whose event count sits more
    than ``ANOM_Z`` trailing standard deviations from its type's
    7-day mean is a scraper outage, a bot flood, or an upstream schema
    break. Days with fewer than ``ANOM_MIN_HISTORY`` trailing days (or
    zero trailing variance) score NULL — no history, no opinion.

    Cross-engine determinism: daily counts are exact integers; the
    trailing mean/variance come from integer sum/sumsq window
    aggregates (exact, order-free) with ONE fixed double expression at
    the end — z = (cnt - sum/n) / sqrt((sumsq - sum*(sum/n)) / n) —
    so both engines round identically (population variance; Spark's
    own stddev is Welford-ordered and NOT replayable, which is why the
    moments are assembled manually).

    Scale shape: one groupBy collapses the 100-TB feed to
    |event types| x |days| rows map-side (partial aggregation); the
    RANGE-framed trailing window runs on that tiny relation with state
    bounded by the window width; day arithmetic is tz-free epoch-day
    integers (ev2's rule). Driver-gate row since round 9.

    SCOPE: the monitor scores only (event_type, day) pairs with
    NONZERO volume — a day with zero events of a type produces no
    daily-count row, so a TOTAL outage never appears here (and
    contributes nothing to later days' trailing moments). The batch
    auditor keeps this shape because densifying the grid would change
    the oracle-replayable relation; the ingest-time monitor closes the
    gap: `streaming.ingest_stream.trailing_volume_stats` theta-joins
    the history for EVERY probed key, so a live feed's outage day
    (present in the batch, absent from history) still scores — the
    outage is caught where it happens, at ingest.
    """
    daily = ev11_daily_counts(load_events(spark, sf_dir))
    return ev11_trailing_stats(daily).select(
        "event_type", _epoch_day_str().alias("day"), "n_events", "n_hist",
        *ev11_score_columns(),
    )


def _epoch_day_str():
    """Render the epoch-day integer ``d`` as the tz-free day string.
    A FUNCTION, not a module-level Column: building a Column requires
    an active SparkContext, and the registry (driver contract) imports
    this module before any session exists."""
    return F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")).cast("string")


def ev11_daily_counts(events: DataFrame) -> DataFrame:
    """(event_type, d, n_events) — the tz-free epoch-day rollup both
    the batch scorer and the streaming twin's static history side
    build from."""
    epoch_day = F.floor(F.unix_micros(F.col("ts")) / F.lit(86_400_000_000)).cast("bigint")
    return events.groupBy(F.col("event_type"), epoch_day.alias("d")).agg(
        F.count("*").cast("bigint").alias("n_events")
    )


def ev11_trailing_stats(daily: DataFrame) -> DataFrame:
    """Attach the trailing-window integer moments (n_hist, s1, s2) to
    every (event_type, d) row via the RANGE-framed window."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("d")
        .rangeBetween(-ANOM_WINDOW_DAYS, -1)
    )
    return daily.select(
        "event_type",
        "d",
        "n_events",
        F.count("n_events").over(w).cast("bigint").alias("n_hist"),
        F.sum("n_events").over(w).cast("bigint").alias("s1"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).cast("bigint").alias("s2"),
    )


def ev11_score_columns() -> list:
    """The z-score decision columns as ONE shared expression list over
    (n_events, n_hist, s1, s2) — the batch operator and
    `streaming.volume_anomaly_stream` both select exactly these, so
    the ingest-time monitor and the batch audit cannot drift (the
    pii_decision_columns pattern)."""
    n = F.col("n_hist").cast("double")
    mean = F.col("s1").cast("double") / n
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * mean) / n
    z = (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    scored = F.when((F.col("n_hist") >= ANOM_MIN_HISTORY) & (var > 0), z)
    return [
        F.when(F.col("n_hist") >= ANOM_MIN_HISTORY, mean).alias("trailing_mean"),
        scored.alias("z_score"),
        F.coalesce(F.abs(scored) > F.lit(ANOM_Z), F.lit(False)).alias("is_anomaly"),
    ]


EV11_SQL = f"""
WITH daily AS (
    SELECT event_type,
           cast(floor(epoch_us(ts) / 86400000000.0) AS BIGINT) AS d,
           cast(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
),
hist AS (
    SELECT event_type, d, n_events,
           cast(count(n_events) OVER w AS BIGINT) AS n_hist,
           cast(sum(n_events) OVER w AS BIGINT) AS s1,
           cast(sum(n_events * n_events) OVER w AS BIGINT) AS s2
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY d
                 RANGE BETWEEN {ANOM_WINDOW_DAYS} PRECEDING AND 1 PRECEDING)
)
SELECT event_type,
       strftime(cast('1970-01-01' AS DATE) + to_days(cast(d AS INTEGER)), '%Y-%m-%d') AS day,
       n_events, n_hist,
       CASE WHEN n_hist >= {ANOM_MIN_HISTORY}
            THEN cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE) END AS trailing_mean,
       CASE WHEN n_hist >= {ANOM_MIN_HISTORY}
                 AND (cast(s2 AS DOUBLE) - cast(s1 AS DOUBLE) * (cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))) / cast(n_hist AS DOUBLE) > 0
            THEN (cast(n_events AS DOUBLE) - cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))
                 / sqrt((cast(s2 AS DOUBLE) - cast(s1 AS DOUBLE) * (cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))) / cast(n_hist AS DOUBLE))
            END AS z_score,
       coalesce(abs(
           CASE WHEN n_hist >= {ANOM_MIN_HISTORY}
                     AND (cast(s2 AS DOUBLE) - cast(s1 AS DOUBLE) * (cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))) / cast(n_hist AS DOUBLE) > 0
                THEN (cast(n_events AS DOUBLE) - cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))
                     / sqrt((cast(s2 AS DOUBLE) - cast(s1 AS DOUBLE) * (cast(s1 AS DOUBLE) / cast(n_hist AS DOUBLE))) / cast(n_hist AS DOUBLE))
                END) > {ANOM_Z}, FALSE) AS is_anomaly
FROM hist
"""

# Rotated INTO the driver registry in round 9 (slot freed by
# a9_partition_avg, a 1-row mean whose shape gate-green a1/a4 already
# hard-verify): the trailing z-score feed monitor is the operator a
# production ingest runs on every batch. See COVERAGE.md
# "Round-9 rotation".
OPERATORS.append(("ev11_volume_anomaly", ev11_volume_anomaly, EV11_SQL))


def ev12_lag_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT conversion-lag percentiles per funnel kind — the
    quantiles ev9's docstring defers ("read off the histogram
    downstream"), materialized as a first-class relation: p25/50/75/
    90/99 of the lag in whole MINUTES for view->click,
    click->purchase and view->purchase.

    Why this is scale-honest where naive quantiles are not: per-kind
    exact quantiles over raw lags need a total order (one task per
    kind), but lag MINUTES over a finite feed window is a BOUNDED
    integer domain (~525k distinct values per year of feed,
    corpus-size-independent), so the tx16 histogram trick applies —
    the identical integer inverted-CDF rule via
    `length_quantiles_over`, numpy-pinned there. Lags are exact
    integer micros; `DIV 60000000` (truncating, nonnegative by the
    funnel ordering) keeps everything engine-exact.

    Scale shape: ev7/ev9's one-shuffle `_funnel_instants` chain (the
    SAME staging code, no-drift rule), <=3 rows per converting user,
    then the bounded (kind, minute) histogram + tiny windows. Not in
    the driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py.
    """
    from maggy_spark.functions.text import length_quantiles_over

    staged = _funnel_instants(spark, sf_dir)
    lag_rows = staged.select(
        F.explode(
            F.filter(
                F.array(
                    F.struct(
                        F.lit("view_to_click").alias("lag_kind"),
                        (F.col("c") - F.col("v")).alias("lag_us"),
                    ),
                    F.struct(
                        F.lit("click_to_purchase").alias("lag_kind"),
                        (F.col("p") - F.col("c")).alias("lag_us"),
                    ),
                    F.struct(
                        F.lit("view_to_purchase").alias("lag_kind"),
                        (F.col("p") - F.col("v")).alias("lag_us"),
                    ),
                ),
                lambda s: s["lag_us"].isNotNull(),
            )
        ).alias("l")
    ).select(
        F.col("l.lag_kind").alias("lag_kind"),
        F.expr("l.lag_us DIV 60000000").alias("lag_minutes"),
    )
    return length_quantiles_over(
        lag_rows, group_cols=("lag_kind",), value_col="lag_minutes",
        count_alias="n_conversions",
    )


def _ev12_sql() -> str:
    from maggy_spark.functions.text import TX16_QS

    qcols = ", ".join(
        f"min(CASE WHEN 100 * cum >= {q} * total THEN lag_minutes END) AS p{q}"
        for q in TX16_QS
    )
    return f"""
WITH {_FUNNEL_STAGE_SQL},
lags AS (
    SELECT 'view_to_click' AS lag_kind, (c - v) // 60000000 AS lag_minutes
    FROM with_p WHERE c IS NOT NULL
    UNION ALL
    SELECT 'click_to_purchase', (p - c) // 60000000 FROM with_p WHERE p IS NOT NULL
    UNION ALL
    SELECT 'view_to_purchase', (p - v) // 60000000 FROM with_p WHERE p IS NOT NULL
),
hist AS (
    SELECT lag_kind, lag_minutes, cast(count(*) AS BIGINT) AS cnt
    FROM lags GROUP BY lag_kind, lag_minutes
),
cum AS (
    SELECT lag_kind, lag_minutes,
           cast(sum(cnt) OVER (PARTITION BY lag_kind ORDER BY lag_minutes) AS BIGINT) AS cum,
           cast(sum(cnt) OVER (PARTITION BY lag_kind) AS BIGINT) AS total
    FROM hist
)
SELECT lag_kind, max(total) AS n_conversions, {qcols}
FROM cum GROUP BY lag_kind
"""


EV12_SQL = _ev12_sql()


def ev13_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for
    each consecutive event pair inside a user's (ts, event_id)-ordered
    stream, count (prev_type -> event_type) and row-normalize — the
    behavioral-flow readout (where do users go after a click?) that
    ev7's fixed funnel cannot express because it enumerates ALL
    transitions, not one prescribed path. Raw chain, deliberately not
    session-split: ev5's gap rule is a different lens; composing them
    is a one-line filter on its session_id.

    Cross-engine determinism: counts are exact integers and p is one
    int/int IEEE division per row — no float sums anywhere.

    Scale shape: ONE shuffle of the events on user_id (the lag
    window), then a map-side-combined groupBy onto the bounded
    |types|^2 key space (25 keys here) and a window over that
    bounded relation — past the lag, nothing scales with event
    count. Not in the driver registry (50-entry cap); DuckDB parity
    in tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", F.unix_micros("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    t = e.withColumn("prev_type", F.lag("event_type").over(order)).where(
        F.col("prev_type").isNotNull()
    )
    counts = t.groupBy("prev_type", "event_type").agg(
        F.count("*").cast("bigint").alias("n_transitions")
    )
    wp = Window.partitionBy("prev_type")
    n_from = F.sum("n_transitions").over(wp).cast("bigint")
    return counts.select(
        "prev_type",
        "event_type",
        "n_transitions",
        n_from.alias("n_from"),
        (F.col("n_transitions").cast("double") / n_from.cast("double")).alias("p"),
    )


EV13_SQL = """
WITH t AS (
    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
               AS prev_type,
           event_type
    FROM events
),
counts AS (
    SELECT prev_type, event_type, cast(count(*) AS BIGINT) AS n_transitions
    FROM t WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n_transitions,
       cast(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT) AS n_from,
       cast(n_transitions AS DOUBLE)
           / cast(cast(sum(n_transitions) OVER (PARTITION BY prev_type) AS BIGINT) AS DOUBLE)
           AS p
FROM counts
"""


# -- EV14: session-scoped conversion funnel --------------------------------


def ev14_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ev7's ordered funnel evaluated INSIDE ev5's session boundaries
    — the product-analytics standard ("conversion within a session"):
    a view in yesterday's session does not license today's purchase.
    Per (user, session): first view, first click at-or-after it,
    first purchase at-or-after that click, all WITHIN the session;
    rollup = sessions per deepest stage. Output: (stage, stage_name,
    n_sessions).

    Composes the two pinned building blocks verbatim — ev5's
    lag-gap-cumsum session ids (strictly-greater split, the
    session_window-compatible boundary) and ev7's sorted-instant
    staging chain re-keyed by (user_id, session_id) — so the
    session arm cannot drift from either parent (cross-operator pin
    in tests: per-session stages are >= aggregated-user stages
    never, and the session count equals ev5's). Determinism: instant
    arrays sort on exact integer micros; counts are integers.
    Scale: ONE shuffle on user_id (the session window), then the
    per-session aggregation rides the same partitioning; state per
    group is the bounded per-session instant arrays. Not in the
    driver registry (50-entry cap); DuckDB parity in
    tests/test_offline_oracles.py."""
    from pyspark.sql.window import Window

    e = load_events(spark, sf_dir).select(
        "user_id", "event_id", F.col("event_type").alias("et"), F.unix_micros("ts").alias("us")
    )
    order = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = e.withColumn(
        "new_session",
        F.when(
            F.lag("us").over(order).isNull()
            | ((F.col("us") - F.lag("us").over(order)) > SESSION_GAP_US),
            1,
        ).otherwise(0),
    ).withColumn("session_id", F.sum("new_session").over(run))
    per = sessions.groupBy("user_id", "session_id").agg(
        F.min(F.when(F.col("et") == "view", F.col("us"))).alias("v"),
        F.sort_array(F.collect_list(F.when(F.col("et") == "click", F.col("us")))).alias("cs"),
        F.sort_array(F.collect_list(F.when(F.col("et") == "purchase", F.col("us")))).alias("ps"),
    )
    staged = per.withColumn(
        "c", F.array_min(F.filter("cs", lambda x: x >= F.col("v")))
    ).withColumn("p", F.array_min(F.filter("ps", lambda x: x >= F.col("c"))))
    stage = (
        F.when(F.col("p").isNotNull(), F.lit(3))
        .when(F.col("c").isNotNull(), F.lit(2))
        .when(F.col("v").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    name = F.element_at(
        F.array(F.lit("no_view"), F.lit("viewed"), F.lit("clicked"), F.lit("purchased")),
        stage + 1,
    )
    return staged.groupBy(stage.cast("bigint").alias("stage"), name.alias("stage_name")).agg(
        F.count("*").cast("bigint").alias("n_sessions")
    )


EV14_SQL = f"""
WITH gapped AS (
    SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
           CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                  OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                THEN 1 ELSE 0 END AS new_session
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
sessions AS (
    SELECT *, cast(sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM gapped
),
per AS (
    SELECT user_id, session_id,
           min(CASE WHEN event_type = 'view' THEN us END) AS v,
           list_sort(list(us) FILTER (WHERE event_type = 'click')) AS cs,
           list_sort(list(us) FILTER (WHERE event_type = 'purchase')) AS ps
    FROM sessions GROUP BY user_id, session_id
),
with_c AS (SELECT *, list_min(list_filter(cs, x -> x >= v)) AS c FROM per),
with_p AS (SELECT *, list_min(list_filter(ps, x -> x >= c)) AS p FROM with_c),
staged AS (
    SELECT CASE WHEN p IS NOT NULL THEN 3
                WHEN c IS NOT NULL THEN 2
                WHEN v IS NOT NULL THEN 1
                ELSE 0 END AS stage
    FROM with_p
)
SELECT cast(stage AS BIGINT) AS stage,
       CASE stage WHEN 0 THEN 'no_view' WHEN 1 THEN 'viewed'
                  WHEN 2 THEN 'clicked' ELSE 'purchased' END AS stage_name,
       cast(count(*) AS BIGINT) AS n_sessions
FROM staged
GROUP BY stage
"""
