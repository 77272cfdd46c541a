"""Streaming twin of the embedding near-dup probe (ann4): a feed of
query vectors probes the STATIC bucketed corpus per micro-batch.

Same architecture as `documents_stream.near_dup_alert_stream` (the
streaming dd11): the stream side is signed map-side with the SAME
corpus-derived hyperplanes the store was bucketed with, the
stream-static equi-join is bucket-local, and the whole operator is
STATELESS — no watermark, no state store growth; per-batch work is
|batch| x bucket population, independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from maggy_spark.functions.similarity import (
    TARGET_BUCKET_PAIR_VECS,
    _bucket_expr,
    _bucketed,
    _cosine_pre,
    _dot,
    _plane_literals,
)


def ann_alert_stream(
    query_stream: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.3,
    target: int = TARGET_BUCKET_PAIR_VECS,
) -> DataFrame:
    """ann4 in streaming form: every micro-batch of incoming vectors
    (query_id, embedding, ts) probes the persisted bucketed corpus and
    alerts on cosine >= `threshold` matches inside the query's sign
    bucket — the "did we already ingest something semantically
    identical?" check an embedding-indexed corpus runs at ingest.

    The store relation and the plane projection both derive from the
    same session-cached `_bucketed` geometry, so stream and batch
    bucket identically by construction. Like the batch ann4, recall
    is bucket-local (the ingest-time screen); the full-corpus sweep
    remains the batch operator's job.
    """
    store, n_planes = _bucketed(spark, sf_dir, target)
    planes = _plane_literals(spark, sf_dir, n_planes)
    q = (
        query_stream.select(
            "query_id",
            F.col("embedding").alias("qemb"),
            "ts",
        )
        .select(
            "query_id",
            "qemb",
            "ts",
            F.sqrt(_dot("qemb", "qemb")).alias("qnorm"),
            _bucket_expr(planes, "qemb").alias("bucket"),
        )
        # ingest feeds are untrusted: a zero vector has no direction, so
        # cosine is undefined — drop it here rather than let the ANSI
        # divide-by-zero kill the long-running query (batch ann* ops
        # read the corpus table, which contains no zero vectors)
        .where(F.col("qnorm") > 0)
    )
    s = store.select("vec_id", "emb", "norm", "bucket")
    # project the cosine ONCE, then filter on the named column —
    # repeating the expression in Filter and Project would run the
    # dot product twice per candidate pair (CollapseProject does not
    # dedupe across a Filter)
    return (
        q.join(s, "bucket")
        .select(
            "query_id",
            "vec_id",
            _cosine_pre("qemb", "emb", "qnorm", "norm").alias("cosine"),
            "ts",
        )
        .where(F.col("cosine") >= threshold)
    )
