"""Structured Streaming forms of the event-analytics operators.

Streaming mapping (batch twins in maggy_spark/operators/events.py):
- ev5 sessionization -> native `session_window` (Spark's built-in
  session-state operator: state is one open window per active user,
  evicted by the watermark — the lag-gap-cumsum idiom the batch twin
  uses needs total order and cannot stream).
- ev2 daily activity -> tumbling `window` + approx/count aggregates.

State scale: sessions hold one open window per user seen within the
watermark horizon; daily rollups hold one window per day in the
horizon. Both are bounded by active-entity count, not event volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize_event_stream(
    event_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """ev5 in streaming form: split each user's event feed at `gap`
    inactivity using the native session_window operator; emits one
    row per closed session once the watermark passes it.

    Output start instant and per-session counts match the batch
    ev5_sessionize exactly (pinned by
    test_session_stream_matches_batch_ev5); the streaming window's
    `end` is last-event + gap by session_window's definition, so
    duration is reported as last_event_us - start_us like the batch
    twin, not window.end - window.start."""
    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.col("user_id"), F.session_window("ts", gap).alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            F.max(F.unix_micros("ts")).alias("last_event_us"),
            F.sum((F.col("event_type") == "purchase").cast("bigint")).alias("n_purchases"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("start_us"),
            (F.col("last_event_us") - F.unix_micros(F.col("sw.start"))).alias("duration_us"),
            "n_events",
            "n_purchases",
        )
    )


def daily_activity_stream(event_stream: DataFrame, watermark: str = "1 day") -> DataFrame:
    """ev2 in streaming form: tumbling 1-day windows of event volume
    and distinct-user activity (approx_count_distinct — exact
    distinct is unbounded state on a stream; the batch ev2 stays the
    exact nightly rollup)."""
    return (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("n_events"),
            F.approx_count_distinct("user_id").alias("active_users_approx"),
        )
        .select(
            # epoch-day arithmetic, NOT w.start.cast("date"): the cast
            # renders through spark.sql.session.timeZone and would
            # shift every day label by -1 in negative-UTC-offset
            # sessions, diverging from batch ev2's tz-free day key
            # (see operators/events.py ev2)
            F.date_add(
                F.lit("1970-01-01").cast("date"),
                F.floor(F.unix_micros(F.col("w.start")) / F.lit(86_400_000_000)).cast("int"),
            )
            .cast("string")
            .alias("day"),
            "n_events",
            "active_users_approx",
        )
    )


def volume_anomaly_stream(event_stream: DataFrame, history: DataFrame, watermark: str = "1 day") -> DataFrame:
    """ev11 at ingest time: tumbling 1-day (event_type, day) counts
    from the live feed, scored against a STATIC trailing-stats
    relation (``ev11_trailing_stats`` over the persisted daily-count
    history — the dd11/near_dup_alert_stream pattern: the delta side
    streams, the corpus-derived model side is a bounded static join).

    ``history`` is the (event_type, d, n_events) daily-count store
    (``ev11_daily_counts`` over the warehouse); its trailing moments
    are |types| x |days| rows — broadcastable at any event volume. The
    decision columns are ``ev11_score_columns()`` — the SAME
    expression list the batch auditor selects, so the ingest monitor
    and the batch audit cannot drift (parity pinned by
    test_volume_anomaly_stream_matches_batch_ev11).

    State: one open day per event type in the watermark horizon
    (bounded by the type vocabulary, not event volume)."""
    from maggy_spark.operators.events import ev11_score_columns, ev11_trailing_stats

    stats = ev11_trailing_stats(history).select(
        "event_type", "d", "n_hist", "s1", "s2"
    )
    live = (
        event_stream.withWatermark("ts", watermark)
        .groupBy(F.col("event_type"), F.window("ts", "1 day").alias("w"))
        .agg(F.count("*").cast("bigint").alias("n_events"))
        .select(
            "event_type",
            F.floor(F.unix_micros(F.col("w.start")) / F.lit(86_400_000_000))
            .cast("bigint")
            .alias("d"),
            "n_events",
        )
    )
    day = F.date_add(F.lit("1970-01-01").cast("date"), F.col("d").cast("int")).cast("string")
    return (
        live.join(F.broadcast(stats), ["event_type", "d"], "left")
        .select(
            "event_type",
            day.alias("day"),
            "n_events",
            F.coalesce(F.col("n_hist"), F.lit(0)).cast("bigint").alias("n_hist"),
            "s1",
            "s2",
        )
        .select("event_type", "day", "n_events", "n_hist", *ev11_score_columns())
    )
