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


OPERATORS = [
    ("ev1_type_rollup", ev1_type_rollup, EV1_SQL),
    ("ev2_daily_activity", ev2_daily_activity, EV2_SQL),
    ("ev3_user_metric_history", ev3_user_metric_history, EV3_SQL),
]
