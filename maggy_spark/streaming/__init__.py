from maggy_spark.streaming.documents_stream import (
    ccnet_route_stream,
    contamination_alert_stream,
    dedup_document_stream,
    dsir_score_stream,
    fingerprint_document_stream,
    near_dup_alert_stream,
    pii_gate_stream,
    quality_gate_stream,
)
from maggy_spark.streaming.embeddings_stream import (
    ann_alert_stream,
    kmeans_route_stream,
    pq_ann_alert_stream,
)
from maggy_spark.streaming.media_stream import phash_alert_stream
from maggy_spark.streaming.ingest_stream import (
    ingest_base,
    ingest_decisions,
    ingest_gate_batch,
    ingest_gate_stream_fn,
    trailing_volume_stats,
)
from maggy_spark.streaming.events_stream import (
    daily_activity_stream,
    sessionize_event_stream,
    volume_anomaly_stream,
)
from maggy_spark.streaming.metrics_stream import (
    dedup_metric_stream,
    early_stop_decisions_stream,
    stateful_trial_tracker,
    windowed_metric_aggregates,
)

__all__ = [
    "ann_alert_stream",
    "ccnet_route_stream",
    "kmeans_route_stream",
    "pq_ann_alert_stream",
    "contamination_alert_stream",
    "daily_activity_stream",
    "ingest_base",
    "ingest_decisions",
    "ingest_gate_batch",
    "ingest_gate_stream_fn",
    "trailing_volume_stats",
    "dedup_document_stream",
    "dsir_score_stream",
    "dedup_metric_stream",
    "early_stop_decisions_stream",
    "fingerprint_document_stream",
    "near_dup_alert_stream",
    "phash_alert_stream",
    "pii_gate_stream",
    "quality_gate_stream",
    "sessionize_event_stream",
    "volume_anomaly_stream",
    "stateful_trial_tracker",
    "windowed_metric_aggregates",
]
