"""Structured Streaming form of the multimodal operators: incoming
media payloads screened against the signed store BEFORE they land —
the mm-family twin of documents_stream's dedup gates.

The media ingest screen completes the per-table streaming coverage:
documents (quality/PII/dedup/DSIR gates), embeddings (ANN + PQ
alerts), events (volume anomaly), metrics (early-stop) — and now
media (perceptual-hash near-dup alerts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from maggy_spark.functions.multimodal import (
    PHASH_MAX_HAMMING,
    mm8_store_signatures,
    phash_probe_over,
)


def phash_alert_stream(
    media_stream: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    max_hamming: int = PHASH_MAX_HAMMING,
) -> DataFrame:
    """mm8 at ingest: every incoming media payload (media_id, payload,
    ts) is perceptually hashed ON THE WORKERS (the same
    real-pHash-or-stub mapInPandas core as the batch signatures — a
    payload's signature cannot depend on which path scored it) and
    probed against the STATIC signed store via the pigeonhole band
    join. Alerts are (probe_id, store_id, hamming) — re-encoded
    copies of stored media caught at the door, feeding the same
    admit/reject ledger as the document gates.

    STATELESS by construction: signing is a narrow mapInPandas, the
    band explode is per-row, and the probe is a stream-static join
    against the session-cached store signatures (a production store
    keeps sigint alongside the payload — ingest never re-hashes
    history). No watermark, no state store; per-batch cost is
    |batch| x PHASH_BANDS bucket lookups, independent of everything
    already ingested (the dd11 delta-side-only argument).

    End state equals the batch mm8 relation on the same feed — pinned
    against DuckDB (MM8_SQL) by
    test_phash_alert_stream_end_state_matches_duckdb_twin.
    """
    store = mm8_store_signatures(spark, sf_dir)
    return phash_probe_over(media_stream.select("media_id", "payload"), store, max_hamming)
