"""Structured Streaming forms of the document-pipeline operators:
an incoming corpus feed (crawl output, upload queue) deduped and
contamination-screened BEFORE it lands in the training store.

Streaming mapping (batch twins in maggy_spark/functions):
- dd1 exact dedup  -> fingerprint + `dropDuplicatesWithinWatermark`
- dd9 decontamination -> stream-static broadcast join against the
  (small, static) benchmark shingle relation + windowed count

State scale: dedup state is one fingerprint key per doc inside the
watermark horizon. Exact corpus-wide dedup needs unbounded state by
definition; the production pattern is this stream doing
WITHIN-HORIZON dedup (dropping the bursty crawl re-fetches that
dominate duplicate volume) feeding periodic batch compaction
(`sources.bucketing.compact_document_store` +
`dedup_over_document_store`: the store is bucketed by this same
fingerprint, so the long-tail sweep is shuffle-free) — the same
bounded-state-plus-compaction split the reference applies to stale
metric steps (`maggy/core/reporter.py` stale-step rejection).
Contamination state is (window, doc, eval_doc) counts — bounded by
the watermark and the (benchmark-sized) eval side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from maggy_spark.functions.dedup import _shingles_expr


def fingerprint_document_stream(doc_stream: DataFrame) -> DataFrame:
    """Stateless stage: raw-content md5 fingerprint per incoming
    document — EXACTLY dd1's dedup key (functions/dedup.py:62), so the
    streaming phase and the batch compaction phase dedup by one
    consistent relation (a doc's survival must not depend on arrival
    timing). tx4's normalized fingerprint is a different, looser key;
    a pipeline that wants normalized dedup must use it in BOTH
    phases."""
    return doc_stream.withColumn("fingerprint", F.md5(F.col("text")))


def dedup_document_stream(doc_stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """dd1 in streaming form: keep the first document per content
    fingerprint within the watermark horizon.

    `dropDuplicatesWithinWatermark`, not `dropDuplicates`: keying on
    the fingerprint alone with plain dropDuplicates never evicts
    state on a long-running ingest stream.
    """
    return (
        fingerprint_document_stream(doc_stream)
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def contamination_alert_stream(
    doc_stream: DataFrame,
    eval_shingles: DataFrame,
    min_containment: float = 0.5,
    watermark: str = "1 hour",
    window: str = "1 minute",
) -> DataFrame:
    """dd9 in streaming form: alert when an incoming document contains
    a large fraction of any benchmark document's shingles.

    `eval_shingles` is the STATIC exploded benchmark relation
    (eval_doc, s, n_eval) — benchmarks are MBs, so the stream-static
    join broadcasts it and the probe is map-side per micro-batch;
    the only stateful operator is the windowed (doc, eval_doc) count.
    """
    ex = (
        doc_stream.withWatermark("ts", watermark)
        .select("doc_id", "ts", F.explode(_shingles_expr()).alias("s"))
    )
    hits = ex.join(F.broadcast(eval_shingles), "s")
    counts = hits.groupBy(
        F.window("ts", window).alias("w"), "doc_id", "eval_doc", "n_eval"
    ).agg(F.count("*").alias("n_common"))
    containment = F.col("n_common").cast("double") / F.col("n_eval").cast("double")
    return counts.where(containment >= min_containment).select(
        "doc_id", "eval_doc", "n_common", containment.alias("containment")
    )
