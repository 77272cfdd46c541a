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


def pq_ann_alert_stream(
    query_stream: DataFrame,
    spark: SparkSession,
    sf_dir: str,
    threshold: float = 0.3,
) -> DataFrame:
    """ann9's serving tier at ingest: every micro-batch of incoming
    vectors (query_id, embedding, ts) scans the STATIC PQ code store
    with asymmetric-distance scoring and alerts on approximate cosine
    >= ``threshold`` — the memory-tier screen a 100 TB embedding
    corpus runs when even the int8 store no longer fits the ingest
    boxes (codes are 32x smaller than float32).

    STATELESS by construction: the 128-row codebook (hard-capped at
    PQ_M x PQ_K by construction — the bounded-literal contract
    dsir_score_stream documents) collects into per-subspace literal
    arrays once at stream start; each incoming vector builds its ADC
    lookup table as a per-row expression, and the stream-static join
    against the code store is the PQ scan itself. Per-batch work is
    |batch| x |store| 8-term lookups over 8-byte codes — the actual
    serving pattern, with no watermark and no state store. Unlike the
    bucket-blocked `ann_alert_stream`, recall here is FULL-SCAN (PQ
    compresses, it does not block); precision is quantization-bounded
    and candidates feed the batch rerank (ann9) downstream.

    Alert scores are IDENTICAL to the batch ann9 adc_cos on the same
    (query, neighbor) pairs — pinned by
    test_pq_ann_alert_stream_matches_batch_adc.
    """
    from maggy_spark.functions.similarity import PQ_K, PQ_M, _chain, _pq_codebook_df, _pq_corpus

    store = _pq_corpus(spark, sf_dir)
    cb_rows = _pq_codebook_df(spark, sf_dir).collect()
    by_s: dict[int, list] = {}
    for r in cb_rows:
        by_s.setdefault(int(r.s), []).append((int(r.j), list(r.cvec)))
    if sorted(by_s) != list(range(PQ_M)) or any(len(v) != PQ_K for v in by_s.values()):
        raise ValueError("codebook is not PQ_M x PQ_K — store/codebook geometry drifted")

    d = 64 // PQ_M

    def lut_for(s: int):
        sub = F.slice("qemb", s * d + 1, d)
        return F.array(
            *[
                _dot(sub, F.array(*[F.lit(v) for v in cvec]))
                for _j, cvec in sorted(by_s[s])
            ]
        )

    q = (
        query_stream.select("query_id", F.col("embedding").alias("qemb"), "ts")
        .select(
            "query_id",
            "ts",
            F.sqrt(_dot("qemb", "qemb")).alias("qn"),
            F.array(*[lut_for(s) for s in range(PQ_M)]).alias("lut"),
        )
        .where(F.col("qn") > 0)  # untrusted feed: zero vectors have no direction
    )
    adc_ip = _chain(
        [
            F.element_at(F.element_at("lut", s + 1), F.element_at("codes", s + 1))
            for s in range(PQ_M)
        ]
    )
    return (
        q.join(store.where(F.col("rec_n2") > 0))  # stream-static full scan
        .select(
            "query_id",
            "neighbor_id",
            (adc_ip / (F.col("qn") * F.sqrt("rec_n2"))).alias("adc_cos"),
            "ts",
        )
        .where(F.col("adc_cos") >= threshold)
    )


def kmeans_route_stream(
    query_stream: DataFrame, spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ann10's serving tier at ingest: route each incoming vector
    (query_id, embedding, ts) to its nearest store-trained k-means
    centroid — the cluster-tagger / IVF-list-router every clustered
    index runs on arriving data (new vectors join their cluster's
    SemDeDup scope and IVF list without retraining).

    STATELESS by construction, and — unlike the codebook-literal path
    above — with NO literal compilation at all: the frozen centroid
    relation (<= KM_MAX_K rows, the broadcast bound) is packed into a
    single-row array-of-structs relation and stream-static
    cross-joined (one row, so no fan-out), and each incoming vector
    picks its argmax-cosine centroid with an in-row transform+aggregate
    fold over that array. The fold's (cos DESC, cid ASC) merge is a
    total order, so the result is fold-order-independent; the cosine
    chain is the batch _cosine_pre spelling, so routed rows are
    bit-equal to the batch ann10 assignment for the same vector
    (pinned by test_kmeans_route_stream_matches_batch_ann10) and the
    accumulated end state hash-matches the DuckDB replay
    (kmeans_route_screen_sql). Per-batch work is |batch| x k x dim
    multiplies, independent of corpus size; no watermark, no state
    store. Measured bound at the k=1024 cap (sf10 store, local[32]):
    ~22k routed vectors/s (~700/s/core) through the JVM fold — ample
    for an ingest screen; if a feed ever outruns it, the batch
    trainer's Arrow kernel (_km_assign_pass_arrow, bit-equal by the
    same chains) is the drop-in remedy, since mapInArrow is legal on
    stateless streaming frames too."""
    from maggy_spark.functions.similarity import _dot, _km_centroids

    packed = (
        _km_centroids(spark, sf_dir)
        .groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("cid", "cvec", "cn"))).alias("cents"))
    )
    q = (
        query_stream.select("query_id", F.col("embedding").alias("qemb"), "ts")
        .withColumn("qn", F.sqrt(_dot("qemb", "qemb")))
        # untrusted feed: zero vectors have no direction
        .where(F.col("qn") > 0)
    )

    def score(c):
        return F.struct(
            (_dot("qemb", c["cvec"]) / (F.col("qn") * c["cn"])).alias("cos"),
            c["cid"].alias("cid"),
        )

    def merge(acc, s):
        better = (s["cos"] > acc["cos"]) | (
            (s["cos"] == acc["cos"]) & (s["cid"] < acc["cid"])
        )
        return F.when(better, s).otherwise(acc)

    init = F.struct(
        F.lit(-2.0).cast("double").alias("cos"), F.lit(-1).cast("long").alias("cid")
    )
    return (
        q.join(F.broadcast(packed))  # single-row static side: no fan-out
        .select(
            "query_id",
            F.aggregate(F.transform("cents", score), init, merge).alias("best"),
            "ts",
        )
        .select(
            "query_id",
            F.col("best.cid").alias("cluster_id"),
            F.col("best.cos").alias("cosine"),
            "ts",
        )
    )


# --- streaming ann17: filtered top-k serving ------------------------------


def filtered_topk_serve_fn(spark: SparkSession, sf_dir: str, emit, k: int = 5):
    """Streaming ann17 (the TENTH stream end-state oracle's subject):
    a foreachBatch servlet for filtered vector search — each arriving
    micro-batch of queries (query_id, embedding, label, ts) is served
    its exact label-filtered top-k against the static corpus, with
    ann17's exact plan shape INSIDE the batch: the label filter is a
    broadcast hash-join key BELOW the scoring (candidate volume
    divides by |labels| before any arithmetic), then the per-query
    rank window runs over the batch's scored rows only.

    Stateless across batches by construction (each query is fully
    served in its arrival batch; no state store, no watermark —
    the ing1 discipline), so a restart re-serves only in-flight
    batches. `emit(topk_df, batch_id)` owns the result sink (the
    length_profile_stream_fn callback contract).

    End-state oracle: accumulating every emitted row over all
    micro-batches must reproduce batch ann17's relation for the
    arrived queries exactly — pinned against the DuckDB twin over
    the same bytes in test_filtered_topk_serve_stream_matches_batch.
    """
    from pyspark.sql.window import Window

    from maggy_spark.plans.fixtures import load_table
    from maggy_spark.functions.similarity import N_QUERIES

    e = load_table(spark, sf_dir, "embeddings", fan_out=True)
    corpus = (
        e.where(F.col("vec_id") >= N_QUERIES)
        .select(
            F.col("vec_id").alias("neighbor_id"),
            "label",
            F.col("embedding").alias("ve"),
            F.sqrt(_dot("embedding", "embedding")).alias("vn"),
        )
        .where(F.col("vn") > 0)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        q = (
            batch_df.select(
                "query_id",
                "label",
                F.col("embedding").alias("qe"),
                F.sqrt(_dot("embedding", "embedding")).alias("qn"),
            )
            .where(F.col("qn") > 0)  # untrusted feed: drop zero vectors
            .localCheckpoint()  # pin: foreachBatch sources re-execute
        )
        scored = corpus.join(F.broadcast(q), "label").select(
            "query_id", "label", "neighbor_id",
            _cosine_pre("qe", "ve", "qn", "vn").alias("cosine"),
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("cosine").desc(), F.col("neighbor_id")
        )
        topk = (
            scored.select(
                "query_id", "label", "neighbor_id", "cosine",
                F.row_number().over(w).cast("bigint").alias("rank"),
            )
            .where(F.col("rank") <= k)
        )
        emit(topk, batch_id)

    return process


def ann22_refresh_stream_fn(spark: SparkSession, sf_dir: str, store_dir: str):
    """Streaming ann22_refresh (the ELEVENTH stream end-state
    oracle's subject): foreachBatch maintenance of the persisted IVF
    code store across micro-batches of arriving vectors — read the
    frozen model (reps + scale, persisted by ann22_store_build) and
    the latest code version, assign + quantize the ARRIVING batch
    against the frozen model, and write back version batch+1 =
    previous codes ∪ batch codes (versioned subdirectories, never
    overwrite-in-place — the dd20_stream_init discipline). A
    long-running ingest stream's vector index no longer goes stale
    until a snapshot rebuild: every micro-batch lands in a list.

    Per batch the work is |batch| x |lists| (the model is broadcast;
    assignment is per-vector independent given the frozen model) —
    store-size-independent, which is what bounds 100 TB ingest. The
    landed codes are never recomputed and the landed floats never
    rescanned. Membership applies the store's own rule map-side
    (non-query ids, zero-norm vectors dropped — an untrusted feed).

    State contract: the stream itself is STATELESS (no Spark state
    store); all cross-batch state is the versioned parquet code
    relations + the immutable model — restart-safe at the last
    completed version (the dd20 discipline). End-state oracle: the
    maintained latest version must equal batch ann22_refresh /
    ann22_incremental_store over the same bytes
    (test_ann22_refresh_stream_matches_batch).

    Returns a foreachBatch `process(batch_df, batch_id)`.
    """
    from maggy_spark.functions.similarity import (
        N_QUERIES,
        _ann22_coded,
        _ann22_latest,
        _ann22_src,
    )

    reps = spark.read.parquet(f"{store_dir}/model_reps")
    env = spark.read.parquet(f"{store_dir}/model_env")
    src = _ann22_src(spark, sf_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        vecs = (
            batch_df.select("vec_id", "embedding")
            .where(
                (F.col("vec_id") >= N_QUERIES)
                & (_dot("embedding", "embedding") > 0)
            )
            .withColumn("is_delta", F.lit(True))
            .localCheckpoint()  # pin: foreachBatch sources re-execute
        )
        if not vecs.take(1):
            return
        prev_path = _ann22_latest(store_dir)
        prev = spark.read.parquet(prev_path)
        coded = _ann22_coded(vecs, src, reps, env)
        v = int(prev_path.rsplit("_", 1)[1]) + 1
        prev.unionByName(coded).write.mode("overwrite").parquet(
            f"{store_dir}/codes_{v:06d}"
        )

    return process
