from maggy_spark.streaming.metrics_stream import (
    dedup_metric_stream,
    early_stop_decisions_stream,
    stateful_trial_tracker,
    windowed_metric_aggregates,
)

__all__ = [
    "dedup_metric_stream",
    "early_stop_decisions_stream",
    "stateful_trial_tracker",
    "windowed_metric_aggregates",
]
