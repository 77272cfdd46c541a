"""Streaming metric-ingest semantics: dedup, windowed aggregates, and
the early-stop trigger — driven with a memory-source stream built
from the `events` table (TESTDATA.md suggests events for streaming
metric-ingest tests)."""

import time

import pytest
from pyspark.sql import functions as F

from maggy_spark.streaming import (
    dedup_metric_stream,
    early_stop_decisions_stream,
    windowed_metric_aggregates,
)

SCHEMA = "trial_id string, step bigint, value double, ts timestamp"


def _run_stream_once(sdf, out_name):
    q = sdf.writeStream.format("memory").queryName(out_name).outputMode(
        "append" if sdf.isStreaming and not sdf.schema.fieldNames().count("n_reports") else "complete"
    )
    return q


def _feed(spark, rows):
    """Create a file-based stream by writing rows to a temp dir and
    reading it back as a stream (deterministic one-batch source)."""
    import tempfile

    d = tempfile.mkdtemp(prefix="maggy_stream_")
    df = spark.createDataFrame(rows, SCHEMA)
    df.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(SCHEMA).parquet(d)


def _ts(sec):
    import datetime

    return datetime.datetime(2026, 1, 1, 0, 0, sec)


def test_stream_dedup_drops_nulls_and_dup_steps(spark):
    rows = [
        ("t1", 0, 1.0, _ts(0)),
        ("t1", 0, 999.0, _ts(1)),   # duplicate step: dropped
        ("t1", 1, None, _ts(2)),    # null: dropped
        ("t1", 1, 2.0, _ts(3)),
        ("t2", 0, 5.0, _ts(4)),
    ]
    stream = _feed(spark, rows)
    q = (
        dedup_metric_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {(r.trial_id, r.step): r.value for r in spark.sql("SELECT * FROM dedup_out").collect()}
    assert got[("t1", 1)] == 2.0
    assert got[("t2", 0)] == 5.0
    assert len(got) == 3
    assert got[("t1", 0)] in (1.0, 999.0)  # exactly one survivor per step


def test_windowed_aggregates(spark):
    rows = [
        ("t1", 0, 1.0, _ts(0)),
        ("t1", 1, 3.0, _ts(1)),
        ("t2", 0, 10.0, _ts(2)),
    ]
    stream = _feed(spark, rows)
    q = (
        windowed_metric_aggregates(stream, window="60 seconds")
        .writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.trial_id: r for r in spark.sql("SELECT * FROM win_out").collect()}
    assert got["t1"].n_reports == 2 and got["t1"].mean_value == 2.0 and got["t1"].max_value == 3.0
    assert got["t2"].n_reports == 1


def test_early_stop_stream_decision(spark):
    # finalized bar: pavgs 10, 20, 30 -> median 20
    finalized = spark.createDataFrame(
        [("f1", 10.0), ("f2", 20.0), ("f3", 30.0)], "trial_id string, pavg double"
    )
    rows = [
        ("slow", 0, 5.0, _ts(0)),   # best 5 < 20 -> stop
        ("slow", 1, 12.0, _ts(1)),
        ("fast", 0, 25.0, _ts(2)),  # best 25 >= 20 -> keep
    ]
    stream = _feed(spark, rows)
    q = (
        early_stop_decisions_stream(stream, finalized, direction="max")
        .writeStream.format("memory")
        .queryName("es_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r.trial_id: r.should_stop for r in spark.sql("SELECT * FROM es_out").collect()}
    assert got == {"slow": True, "fast": False}


def test_events_table_streams_end_to_end(spark):
    """Treat the driver's `events` parquet as the heartbeat stream:
    user_id -> trial, event_id -> step."""
    import tempfile

    from maggy_spark.plans.fixtures import load_events

    static = load_events(spark, "/root/testdata/sf0.001")
    d = tempfile.mkdtemp(prefix="maggy_events_stream_")
    static.write.mode("overwrite").parquet(d)  # streaming sources need a directory
    stream = spark.readStream.schema(static.schema).parquet(d)
    metrics = stream.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("trial_id"),
        F.col("event_id").alias("step"),
        F.col("value"),
        F.col("ts"),
    )
    q = (
        dedup_metric_stream(metrics, watermark="1 hour")
        .writeStream.format("memory")
        .queryName("events_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    n_stream = spark.sql("SELECT count(*) c FROM events_out").collect()[0].c
    n_expected = static.where(F.col("value").isNotNull()).dropDuplicates(["user_id", "event_id"]).count()
    assert n_stream == n_expected


def test_stateful_tracker_accumulates_across_batches(spark, tmp_path):
    """applyInPandasWithState: state must persist across micro-batches
    (maxFilesPerTrigger=1 forces one batch per file)."""
    import pandas as pd

    from maggy_spark.streaming import stateful_trial_tracker

    d = str(tmp_path / "feed")
    import os

    os.makedirs(d)
    # batch 1: t1 sees 5.0; batch 2: t1 improves to 25.0
    spark.createDataFrame(
        [("t1", 0, 5.0, _ts(0)), ("t2", 0, 30.0, _ts(0))], SCHEMA
    ).coalesce(1).write.parquet(d + "/b1")
    spark.createDataFrame([("t1", 1, 25.0, _ts(5))], SCHEMA).coalesce(1).write.parquet(d + "/b2")
    # flatten into one dir of files
    files = []
    for sub in ("b1", "b2"):
        for f in os.listdir(f"{d}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{d}/{sub}/{f}", f"{d}/{sub}_{f}")
                files.append(f"{d}/{sub}_{f}")
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", "1").parquet(d)
    )
    q = (
        stateful_trial_tracker(stream, median_bar=20.0, direction="max")
        .writeStream.format("memory").queryName("state_out").outputMode("update")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM state_out").collect()
    # final state per trial: take the last emitted row per trial
    last = {}
    for r in rows:
        last[r.trial_id] = r
    assert last["t1"].best_metric == 25.0 and last["t1"].n_reports == 2  # state crossed batches
    assert last["t1"].should_stop is False  # 25 >= bar 20
    assert last["t2"].best_metric == 30.0 and last["t2"].should_stop is False
    # t1's FIRST emission (batch 1) must have flagged it below the bar
    t1_rows = [r for r in rows if r.trial_id == "t1"]
    assert any(r.n_reports == 1 and r.should_stop for r in t1_rows)


DOC_SCHEMA = "doc_id bigint, text string, ts timestamp"


def _feed_docs(spark, rows):
    import tempfile

    d = tempfile.mkdtemp(prefix="maggy_docstream_")
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    df.write.mode("overwrite").parquet(d)
    return spark.readStream.schema(DOC_SCHEMA).parquet(d)


def test_document_stream_dedup_by_content(spark):
    from maggy_spark.streaming import dedup_document_stream

    rows = [
        (1, "alpha beta gamma", _ts(0)),
        (2, "Alpha  beta GAMMA", _ts(1)),  # differs raw: KEPT (dd1 key, not tx4)
        (3, "delta epsilon zeta", _ts(2)),
        (4, "delta epsilon zeta", _ts(3)),  # exact dup: dropped
    ]
    q = (
        dedup_document_stream(_feed_docs(spark, rows))
        .writeStream.format("memory")
        .queryName("doc_dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT doc_id FROM doc_dedup_out").collect()
    kept = sorted(r.doc_id for r in out)
    assert kept[:2] == [1, 2]  # raw-content key keeps case-variants, like batch dd1
    assert len(kept) == 3 and kept[2] in (3, 4)


def test_contamination_alert_stream_flags_eval_overlap(spark):
    from pyspark.sql import functions as SF

    from maggy_spark.streaming import contamination_alert_stream

    # static benchmark: one eval doc, four 3-gram shingles
    eval_doc = spark.createDataFrame(
        [(100, "the quick brown fox jumps over")], "eval_doc bigint, text string"
    )
    from maggy_spark.functions.dedup import _shingles_expr

    eval_shingles = eval_doc.select(
        "eval_doc", SF.explode(_shingles_expr()).alias("s"), SF.size(_shingles_expr()).alias("n_eval")
    )
    rows = [
        (1, "prefix the quick brown fox jumps over suffix", _ts(0)),  # contains all
        (2, "totally unrelated words here only", _ts(1)),             # no overlap
        (3, "the quick brown cat sleeps now", _ts(2)),                # 1/4 shingles
    ]
    q = (
        contamination_alert_stream(_feed_docs(spark, rows), eval_shingles)
        .writeStream.format("memory")
        .queryName("contam_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM contam_out").collect()
    assert [r.doc_id for r in out] == [1]
    assert out[0].eval_doc == 100 and out[0].containment == 1.0


def test_session_stream_matches_batch_ev5(spark):
    """Streaming session_window sessions must agree with the batch
    lag-gap-cumsum twin (ev5) on the same events: identical session
    starts, event counts, purchase counts, and durations per user."""
    import tempfile

    from maggy_spark.operators.events import ev5_sessionize
    from maggy_spark.plans.fixtures import load_events
    from maggy_spark.streaming import sessionize_event_stream

    sf_dir = "/root/testdata/sf0.001"
    static = load_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="maggy_session_stream_")
    static.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = (
        sessionize_event_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.user_id, r.start_us): (r.n_events, r.n_purchases, r.duration_us)
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }
    batch = {
        (r.user_id, r.start_us): (r.n_events, r.n_purchases, r.duration_us)
        for r in ev5_sessionize(spark, sf_dir).collect()
    }
    # append mode only emits sessions the watermark has CLOSED: the
    # feed's final horizon stays open, so streamed is a strict-value
    # subset covering everything but the tail
    assert streamed, "no sessions emitted"
    for key, vals in streamed.items():
        assert batch[key] == vals, f"session {key} diverged: {vals} vs {batch[key]}"
    assert len(streamed) >= 0.9 * len(batch)


def test_daily_activity_stream_counts(spark):
    """Streaming tumbling-day volumes match the exact batch ev2 event
    counts (distinct users are approximate by design)."""
    import tempfile

    from maggy_spark.operators.events import ev2_daily_activity
    from maggy_spark.plans.fixtures import load_events
    from maggy_spark.streaming import daily_activity_stream

    sf_dir = "/root/testdata/sf0.001"
    static = load_events(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="maggy_daily_stream_")
    static.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = (
        daily_activity_stream(stream)
        .writeStream.format("memory")
        .queryName("daily_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {r.day: r.n_events for r in spark.sql("SELECT * FROM daily_out").collect()}
    batch = {r.day: r.n_events for r in ev2_daily_activity(spark, sf_dir).collect()}
    # append mode withholds windows still inside the 1-day watermark:
    # the last day(s) stay open; every emitted day must match exactly
    assert streamed, "no windows emitted"
    for day, n in streamed.items():
        assert batch[day] == n
    assert len(streamed) >= len(batch) - 2


def test_near_dup_alert_stream_probes_static_store(spark):
    """Streaming dd11: an incoming doc identical to a landed one must
    alert with hamming 0; vocabulary-disjoint docs must not alert.
    The store side is the same simhash_bands_for relation the batch
    path joins, so stream and batch agree by construction."""
    from maggy_spark.functions.dedup import simhash_band_bits, simhash_bands_for
    from maggy_spark.streaming import near_dup_alert_stream

    store_rows = [(i, f"store doc number {i} with words w{i} x{i} y{i} z{i}") for i in range(2, 10)]
    store_rows.append((1, "the quick brown fox jumps over the lazy dog again"))
    store = spark.createDataFrame(store_rows, "doc_id bigint, text string")
    bands, b, t = simhash_bands_for(store, len(store_rows))
    assert b == simhash_band_bits(len(store_rows))

    rows = [
        (100, "the quick brown fox jumps over the lazy dog again", _ts(0)),  # exact store twin
        (101, "completely different vocabulary entirely unrelated tokens", _ts(1)),
    ]
    q = (
        near_dup_alert_stream(_feed_docs(spark, rows), bands, b)
        .writeStream.format("memory")
        .queryName("near_dup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM near_dup_out").collect()
    assert (100, 1, 0) in {(r.doc_id, r.store_doc, r.hamming) for r in out}
    assert all(r.doc_id != 101 for r in out)
    assert all(r.hamming <= 3 for r in out)


def test_session_boundary_gap_exactly_timeout(spark):
    """A gap of EXACTLY the timeout stays in the session; only a
    strictly-greater gap splits — session_window merges touching
    windows (verified here), and batch ev5's lag-gap rule uses the
    matching strict `>` so the twins agree at the boundary."""
    from datetime import datetime, timedelta

    from maggy_spark.streaming import sessionize_event_stream

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, "click", t0),
        (1, "click", t0 + timedelta(minutes=30)),        # exact gap: SAME session
        (1, "purchase", t0 + timedelta(minutes=90, seconds=1)),  # > gap: NEW session
        # far-future flush event: advances the watermark so user 1's
        # sessions CLOSE and append mode emits them
        (99, "click", t0 + timedelta(days=10)),
    ]
    d = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
    import tempfile

    p = tempfile.mkdtemp(prefix="maggy_sess_edge_")
    d.write.mode("overwrite").parquet(p)
    stream = spark.readStream.schema(d.schema).parquet(p)
    q = (
        sessionize_event_stream(stream)
        .writeStream.format("memory")
        .queryName("sess_edge")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM sess_edge WHERE user_id = 1 ORDER BY start_us").collect()
    assert [r.n_events for r in out] == [2, 1]
    # the split happened at the >gap jump, not the exact-gap step
    from maggy_spark.operators.events import SESSION_GAP_US

    assert out[1].start_us - out[0].start_us == 3 * SESSION_GAP_US + 1_000_000


def test_daily_activity_stream_day_label_is_timezone_free(spark):
    """The day key must come from epoch-day arithmetic: a cast through
    a negative-UTC-offset session timezone would shift every label."""
    from datetime import datetime

    from maggy_spark.streaming import daily_activity_stream

    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        rows = [(1, "click", datetime(2024, 3, 5, 0, 30, 0))]
        d = spark.createDataFrame(rows, "user_id bigint, event_type string, ts timestamp")
        import tempfile

        p = tempfile.mkdtemp(prefix="maggy_day_tz_")
        d.write.mode("overwrite").parquet(p)
        stream = spark.readStream.schema(d.schema).parquet(p)
        q = (
            daily_activity_stream(stream)
            .writeStream.format("memory")
            .queryName("day_tz")
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = spark.sql("SELECT day FROM day_tz").collect()
        assert [r.day for r in out] == ["2024-03-05"]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_ann_alert_stream_probes_static_corpus(spark, sf_dir, tmp_path):
    """Streaming ann4: a query vector COPIED from the corpus must
    alert against its source vec_id with cosine ~1.0; results agree
    with the batch bucket-probe semantics (same bucket, threshold)."""
    from maggy_spark.functions.similarity import TARGET_BUCKET_PAIR_VECS, _bucketed
    from maggy_spark.streaming import ann_alert_stream

    store, _ = _bucketed(spark, sf_dir, TARGET_BUCKET_PAIR_VECS)
    src = spark.read.parquet(f"{sf_dir}/embeddings.parquet").where("vec_id IN (17, 23)").collect()
    rows = [(1000 + r.vec_id, list(r.embedding), _ts(i)) for i, r in enumerate(src)]
    qdf = spark.createDataFrame(rows, "query_id bigint, embedding array<float>, ts timestamp")
    d = str(tmp_path / "queries")
    qdf.write.parquet(d)
    stream = spark.readStream.schema(qdf.schema).parquet(d)

    q = (
        ann_alert_stream(stream, spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ann_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM ann_alerts").collect()
    hits = {(r.query_id, r.vec_id): r.cosine for r in out}
    for vid in (17, 23):
        assert hits[(1000 + vid, vid)] == pytest.approx(1.0)  # self-match in own bucket
    # every alert is above the threshold and bucket-local by construction
    assert all(r.cosine >= 0.3 for r in out)


def test_alert_streams_sustain_with_zero_state(spark, sf_dir):
    """Sustained-rate contract for the two ingest-screen streams
    (round-7 verdict #7): drive near_dup_alert_stream and
    ann_alert_stream from a rate source for ~20 s at a 1 s trigger
    and assert, via lastProgress/recentProgress stateOperators, that
    NEITHER keeps any state-store rows across batches — they are
    stream-static joins by construction (no watermark, no growing
    state), so a long-running ingest screen's memory is flat.
    """
    from maggy_spark.functions.dedup import simhash_bands_for
    from maggy_spark.streaming import ann_alert_stream, near_dup_alert_stream

    # static simhash store for the near-dup screen
    store_rows = [(i, f"store doc number {i} with words w{i} x{i} y{i} z{i}") for i in range(64)]
    store = spark.createDataFrame(store_rows, "doc_id bigint, text string")
    bands, b, t = simhash_bands_for(store, len(store_rows))

    rate_docs = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("value").alias("doc_id"),
            F.concat_ws(
                " ",
                *[
                    F.concat(F.lit("w"), ((F.col("value") + i) % 97).cast("string"))
                    for i in range(12)
                ],
            ).alias("text"),
            F.col("timestamp").alias("ts"),
        )
    )
    rate_vecs = (
        spark.readStream.format("rate").option("rowsPerSecond", "50").load()
        .select(
            F.col("value").alias("query_id"),
            # (value+1) keeps every vector nonzero EXCEPT value=0's
            # sin(i)≠0 anyway; value*0 rows (all-zero vectors) are fed
            # deliberately via value % 7 == 0 below to exercise the
            # stream's zero-norm guard without killing the query
            F.expr(
                "CASE WHEN value % 7 = 0 THEN transform(sequence(1, 64), i -> cast(0.0 AS FLOAT))"
                "     ELSE transform(sequence(1, 64), i -> cast(sin((value + 1) * i) AS FLOAT)) END"
            ).alias("embedding"),
            F.col("timestamp").alias("ts"),
        )
    )

    q1 = (
        near_dup_alert_stream(rate_docs, bands, b)
        .writeStream.format("noop")
        .trigger(processingTime="1 second")
        .start()
    )
    q2 = (
        ann_alert_stream(rate_vecs, spark, sf_dir)
        .writeStream.format("noop")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            p1, p2 = q1.recentProgress, q2.recentProgress
            if (
                sum(1 for p in p1 if p["numInputRows"] > 0) >= 5
                and sum(1 for p in p2 if p["numInputRows"] > 0) >= 5
            ):
                break
            time.sleep(1)
        p1, p2 = q1.recentProgress, q2.recentProgress
    finally:
        q1.stop()
        q2.stop()

    for name, progress in (("near_dup", p1), ("ann", p2)):
        fed = [p for p in progress if p["numInputRows"] > 0]
        assert len(fed) >= 5, f"{name}: only {len(fed)} fed batches"
        for p in progress:
            ops = p.get("stateOperators") or []
            total_state = sum(op.get("numRowsTotal", 0) for op in ops)
            assert total_state == 0, f"{name}: state rows {total_state} in batch {p['batchId']}"


def test_quality_gate_stream_matches_batch_tx9(spark, sf_dir):
    """Streaming tx9 parity: gate decisions on a streamed feed of the
    documents table must equal the batch operator's rows exactly
    (shared expression list), and the query must be stateless."""
    import tempfile

    from maggy_spark.functions.text import tx9_gopher_quality
    from maggy_spark.streaming import quality_gate_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.lit(_ts(0)).alias("ts")
    )
    d = tempfile.mkdtemp(prefix="maggy_qgate_")
    docs.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    q = (
        quality_gate_stream(stream)
        .writeStream.format("memory")
        .queryName("qgate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(not (p.get("stateOperators") or []) or
               sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
               for p in q.recentProgress)
    got = {r.doc_id: (r.n_tokens, r.keep, r.passes_repetition)
           for r in spark.sql("SELECT * FROM qgate_out").collect()}
    want = {r.doc_id: (r.n_tokens, r.keep, r.passes_repetition)
            for r in tx9_gopher_quality(spark, sf_dir).collect()}
    assert got == want


def test_pq_ann_alert_stream_matches_batch_adc(spark, sf_dir):
    """Streaming PQ serving parity: per-batch ADC scores against the
    static code store must equal an INDEPENDENT python replay of the
    asymmetric-distance formula (same left-to-right IEEE folds)
    EXACTLY, the alert set must be precisely the >= threshold slice,
    and the query must be stateless."""
    import math
    import tempfile

    from maggy_spark.functions.similarity import (
        N_QUERIES,
        PQ_K,
        PQ_M,
        _pq_codebook_df,
        _pq_corpus,
    )
    from maggy_spark.streaming import pq_ann_alert_stream

    threshold = 0.2
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding", F.lit(_ts(0)).alias("ts")
    )
    d = tempfile.mkdtemp(prefix="maggy_pqstream_")
    queries.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(queries.schema).parquet(d)
    q = (
        pq_ann_alert_stream(stream, spark, sf_dir, threshold=threshold)
        .writeStream.format("memory")
        .queryName("pq_alert_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(not (p.get("stateOperators") or []) or
               sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
               for p in q.recentProgress)
    got = {(r.query_id, r.neighbor_id): r.adc_cos
           for r in spark.sql("SELECT * FROM pq_alert_out").collect()}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    cb = {(int(r.s), int(r.j)): list(r.cvec) for r in _pq_codebook_df(spark, sf_dir).collect()}
    store = {r.neighbor_id: (list(r.codes), r.rec_n2) for r in _pq_corpus(spark, sf_dir).collect()}
    dim = 64 // PQ_M
    expected = {}
    for qr in queries.collect():
        qe = [float(v) for v in qr.embedding]
        qn = math.sqrt(fold_dot(qe, qe))
        lut = {
            (s, j): fold_dot(qe[s * dim:(s + 1) * dim], cb[(s, j)])
            for s in range(PQ_M) for j in range(1, PQ_K + 1)
        }
        for nid, (codes, rec_n2) in store.items():
            if rec_n2 <= 0:
                continue
            adc = lut[(0, codes[0])]
            for s in range(1, PQ_M):
                adc = adc + lut[(s, codes[s])]
            score = adc / (qn * math.sqrt(rec_n2))
            if score >= threshold:
                expected[(qr.query_id, nid)] = score
    assert got == expected and len(expected) > 0


def test_dsir_score_stream_matches_batch(spark, sf_dir):
    """Streaming tx15 parity: DSIR scores on a streamed feed of the
    documents table must equal the batch operator's BIT-FOR-BIT (both
    sides sum the same decimal(19,6) per-feature values exactly), a
    genuinely-new document must score through the unseen-bucket
    default rather than null out, and the query must be stateless."""
    import tempfile

    from maggy_spark.functions.text import (
        DSIR_BUCKETS,
        DSIR_TARGET_MOD,
        _dsir_model,
        dsir_unseen_llr,
        tx15_dsir_score,
    )
    from maggy_spark.streaming import dsir_score_stream

    model = _dsir_model(spark, sf_dir, DSIR_BUCKETS, DSIR_TARGET_MOD)
    default = dsir_unseen_llr(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.lit(_ts(0)).alias("ts")
    )
    novel = spark.createDataFrame(
        [(-1, "zzzunseen qqqnovel zzzunseen", _ts(1))], DOC_SCHEMA
    )
    d = tempfile.mkdtemp(prefix="maggy_dsirstream_")
    docs.unionByName(novel).write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(docs.schema).parquet(d)
    q = (
        dsir_score_stream(stream, model, default)
        .writeStream.format("memory")
        .queryName("dsir_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(not (p.get("stateOperators") or []) or
               sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
               for p in q.recentProgress)
    got = {r.doc_id: (r.n_features, r.dsir_score)
           for r in spark.sql("SELECT * FROM dsir_out").collect()}
    want = {r.doc_id: (r.n_features, r.dsir_score)
            for r in tx15_dsir_score(spark, sf_dir).collect()}
    assert len(got) == len(want) + 1
    for k, v in want.items():
        assert got[k] == v, k
    # the novel doc: 3 unigrams + 2 bigrams; hashed features may
    # COLLIDE with corpus-observed buckets (inherent to hashed DSIR),
    # so replay the lookup-or-default rule by hand and require that
    # at least one feature actually took the default path
    import hashlib
    from decimal import Decimal

    mrows = {int(r.b): r.llr for r in model.collect()}

    def bucket(f: str) -> int:
        return int(hashlib.md5(f.encode()).hexdigest()[:13], 16) % DSIR_BUCKETS

    words = "zzzunseen qqqnovel zzzunseen".split(" ")
    feats = words + [f"{a} {b}" for a, b in zip(words, words[1:])]
    vals = [mrows.get(bucket(f), default) for f in feats]
    assert any(mrows.get(bucket(f)) is None for f in feats), "fixture must hit the default path"
    # the stream divides float(exact decimal sum) by the count —
    # replay the same two ops
    expected = float(sum(vals, Decimal(0))) / len(feats)
    nf, score = got[-1]
    assert nf == 5
    assert score == expected


def test_pii_gate_stream_matches_batch_tx12(spark, sf_dir):
    """Streaming tx12 parity: PII gate decisions on a streamed feed —
    the fixture docs (all PII-free) plus crafted PII payloads — must
    equal the batch expression list exactly, and the query must be
    stateless."""
    import tempfile

    from maggy_spark.functions.text import pii_decision_columns
    from maggy_spark.streaming import pii_gate_stream

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.lit(_ts(0)).alias("ts")
    )
    crafted = spark.createDataFrame(
        [
            (100001, "mail bob@a.io and carol@b.org from 10.0.0.1", _ts(1)),
            (100002, "ring +1 555-123-4567 ref 123456789012", _ts(2)),
            (100003, "clean text with no personal data at all", _ts(3)),
        ],
        "doc_id long, text string, ts timestamp",
    )
    feed = docs.unionByName(crafted)
    d = tempfile.mkdtemp(prefix="maggy_piigate_")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    q = (
        pii_gate_stream(stream)
        .writeStream.format("memory")
        .queryName("piigate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(not (p.get("stateOperators") or []) or
               sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
               for p in q.recentProgress)
    got = {r.doc_id: (r.n_pii_total, r.needs_redaction)
           for r in spark.sql("SELECT * FROM piigate_out").collect()}
    want = {r.doc_id: (r.n_pii_total, r.needs_redaction)
            for r in feed.select("doc_id", *pii_decision_columns()).collect()}
    assert got == want
    assert got[100001][0] == 3 and got[100001][1]
    # the 12-digit ref matches BOTH the phone shape and the long-digit
    # run — over-flagging on purpose (a redaction pass reviews spans)
    assert got[100002][0] == 3 and got[100002][1]
    assert got[100003] == (0, False)


def test_volume_anomaly_stream_matches_batch_ev11(spark):
    """The ingest-time volume monitor must agree with the batch ev11
    auditor on every closed day: same n_hist, trailing mean, z-score,
    and anomaly flag per (event_type, day). The stream scores its
    tumbling-day counts against the static trailing-stats relation
    built from the SAME daily history, and both select the one shared
    ev11_score_columns() list — this pins that the join+window
    plumbing around those expressions agrees too."""
    import tempfile

    from maggy_spark.operators.events import ev11_daily_counts, ev11_volume_anomaly
    from maggy_spark.plans.fixtures import load_events
    from maggy_spark.streaming import volume_anomaly_stream

    sf_dir = "/root/testdata/sf0.001"
    static = load_events(spark, sf_dir)
    history = ev11_daily_counts(static)
    d = tempfile.mkdtemp(prefix="maggy_volume_stream_")
    static.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(static.schema).parquet(d)
    q = (
        volume_anomaly_stream(stream, history)
        .writeStream.format("memory")
        .queryName("volume_anomaly_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r.event_type, r.day): (r.n_events, r.n_hist, r.trailing_mean, r.z_score, r.is_anomaly)
        for r in spark.sql("SELECT * FROM volume_anomaly_out").collect()
    }
    batch = {
        (r.event_type, r.day): (r.n_events, r.n_hist, r.trailing_mean, r.z_score, r.is_anomaly)
        for r in ev11_volume_anomaly(spark, sf_dir).collect()
    }
    assert streamed, "no scored days emitted"
    for key, vals in streamed.items():
        assert batch[key] == vals, f"day {key} diverged: {vals} vs {batch[key]}"
    # append mode withholds only the watermark's open tail
    assert len(streamed) >= 0.8 * len(batch)
    assert any(v[4] for v in streamed.values()), "no anomaly crossed the stream"


def _ingest_fixture(spark, sf_dir):
    """Shared scaffolding for the composed ingest-gate capstone: a
    landed store (fingerprints + SimHash bands), a daily-count
    history, and a feed of fixture docs plus crafted rows that fire
    each gate (an exact dup of a store doc, a near dup — one token
    appended — and a PII-dense doc)."""
    from maggy_spark.functions.dedup import simhash_bands_for

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    store_docs = docs.where(F.col("doc_id") < 30).select("doc_id", "text")
    n_store = store_docs.count()
    store_bands, band_bits, _t = simhash_bands_for(store_docs, n_store, persist=False)
    store_bands = store_bands.localCheckpoint()
    store_fps = (
        store_docs.select(F.md5("text").alias("fingerprint")).localCheckpoint()
    )
    base_texts = {r.doc_id: r.text for r in store_docs.where(F.col("doc_id") < 2).collect()}
    feed_rows = [
        (1000, base_texts[0], "crafted", _ts(1)),            # exact dup of store doc 0
        (1001, base_texts[1] + " zzzq", "crafted", _ts(2)),  # near dup of store doc 1
        (1002, "mail bob@a.io and carol@b.org from 10.0.0.1", "crafted", _ts(3)),  # PII
        (1003, "clean words " + " ".join(f"tok{i}" for i in range(60)), "crafted", _ts(4)),
    ]
    feed = docs.where((F.col("doc_id") >= 30) & (F.col("doc_id") < 80)).select(
        "doc_id", "text", "source", F.lit(_ts(0)).alias("ts")
    ).unionByName(
        spark.createDataFrame(feed_rows, "doc_id long, text string, source string, ts timestamp")
    )
    # history: every feed source with ANOM_MIN_HISTORY+ trailing days
    # of steady volume, so the batch day's count is scoreable
    from maggy_spark.operators.events import ANOM_MIN_HISTORY

    d0 = 20454  # epoch day of 2026-01-01 (the _ts feed day)
    sources = [r.source for r in feed.select("source").distinct().collect()]
    # steady 1/2-doc days (non-zero variance so z is defined): the
    # crafted source's 4-doc feed day lands |z| ~ 5 > ANOM_Z
    hist_rows = [
        (s, d0 - k, 1 + k % 2) for s in sources for k in range(1, ANOM_MIN_HISTORY + 3)
    ]
    history = spark.createDataFrame(hist_rows, "source string, d bigint, n_events bigint")
    return feed, store_fps, store_bands, band_bits, history


def test_ingest_gate_stream_matches_batch_composition(spark, sf_dir):
    """The composed foreachBatch ingest lineage (quality -> PII ->
    exact-dup -> near-dup -> volume anomaly over ONE micro-batch scan)
    must emit the same per-document ledger as the batch twin on the
    same feed, with zero streaming state across batches."""
    import tempfile

    from maggy_spark.streaming import ingest_gate_batch, ingest_gate_stream_fn

    feed, store_fps, store_bands, band_bits, history = _ingest_fixture(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="maggy_ingest_")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)

    got_rows = []

    def sink(ledger, batch_id):
        got_rows.extend(ledger.collect())

    q = (
        stream.writeStream.foreachBatch(
            ingest_gate_stream_fn(store_fps, store_bands, band_bits, sink, history)
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # the composed query is stateless: no state operators, or all-zero
    assert all(
        not (p.get("stateOperators") or [])
        or sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
        for p in q.recentProgress
    )
    want = {
        r.doc_id: r
        for r in ingest_gate_batch(feed, store_fps, store_bands, band_bits, history).collect()
    }
    got = {r.doc_id: r for r in got_rows}
    assert set(got) == set(want) and len(got) == feed.count()
    cols = [c for c in next(iter(want.values())).asDict() if c != "batch_id"]
    for i, w in want.items():
        g = got[i]
        assert tuple(getattr(g, c) for c in cols) == tuple(getattr(w, c) for c in cols), i
    # every gate fires on its crafted row
    assert got[1000].is_exact_dup and got[1000].is_near_dup and not got[1000].admit
    assert not got[1001].is_exact_dup and got[1001].is_near_dup, got[1001]
    assert got[1002].needs_redaction and not got[1002].admit
    assert not got[1003].is_exact_dup and not got[1003].is_near_dup
    # the volume monitor scored the feed day on every row
    assert all(r.n_hist > 0 and r.trailing_mean is not None for r in got.values())
    # the crafted source arrives at ~3x its steady history volume ->
    # its day must flag anomalous; nothing about the flag blocks admits
    crafted = [r for r in got.values() if r.source == "crafted"]
    assert crafted and all(r.is_volume_anomaly for r in crafted)
    assert any(r.admit for r in got.values())


def test_ingest_gate_single_scan_discipline(spark, sf_dir):
    """pl13's scan audit applied to the streaming side: with the base
    relation pinned (exactly what ingest_gate_stream_fn does per
    micro-batch), the composed ledger plan must touch the feed ONLY
    through the pinned blocks — zero parquet leaves anywhere under the
    decision plan."""
    from maggy_spark.functions.dedup import _free_local_checkpoint
    from maggy_spark.streaming import ingest_base, ingest_decisions

    feed, store_fps, store_bands, band_bits, history = _ingest_fixture(spark, sf_dir)
    base = ingest_base(feed, band_bits).localCheckpoint()
    try:
        ledger = ingest_decisions(base, store_fps, store_bands, band_bits, history)
        leaves = ledger._jdf.queryExecution().optimizedPlan().collectLeaves()
        kinds = [leaves.apply(i).nodeName() for i in range(leaves.size())]
        parquet_leaves = [
            leaves.apply(i).toString()
            for i in range(leaves.size())
            if "parquet" in leaves.apply(i).toString().lower()
        ]
        assert not parquet_leaves, (kinds, parquet_leaves)
        # the feed reaches the plan only as the pinned LogicalRDD
        assert "LogicalRDD" in kinds, kinds
        assert ledger.count() == feed.count()
    finally:
        _free_local_checkpoint(base)


def test_trailing_volume_stats_scores_days_absent_from_history(spark):
    """The theta-join trailing stats must produce a row for a probed
    day the history store never saw (total-outage densification —
    the window-over-history form silently drops it) and agree with
    ev11's moments where the history day exists."""
    from maggy_spark.operators.events import ev11_trailing_stats
    from maggy_spark.streaming import trailing_volume_stats

    history = spark.createDataFrame(
        [("web", d, 10 + (d % 3)) for d in range(100, 110)],
        "source string, d bigint, n_events bigint",
    )
    # day 115: inside the trailing window of 100..109 history but
    # absent from history itself (the outage day)
    keys = spark.createDataFrame(
        [("web", 109), ("web", 115)], "source string, d bigint"
    )
    got = {r.d: r for r in trailing_volume_stats(keys, history).collect()}
    assert set(got) == {109, 115}
    assert got[115].n_hist > 0  # scored even though history has no d=115 row
    want = {
        r.d: r
        for r in ev11_trailing_stats(
            history.withColumnRenamed("source", "event_type")
        ).collect()
    }
    assert (got[109].n_hist, got[109].s1, got[109].s2) == (
        want[109].n_hist, want[109].s1, want[109].s2,
    )


def test_kmeans_route_stream_matches_batch_ann10(spark, sf_dir):
    """Streaming cluster-router parity: routing the corpus's own
    vectors through the frozen store-trained centroids must reproduce
    the batch ann10 assignment EXACTLY (same cluster, bit-equal
    cosine — the fold spells the same chain as _cosine_pre), and the
    query must be stateless."""
    import tempfile

    from maggy_spark.functions.similarity import ann10_kmeans_assign
    from maggy_spark.streaming import kmeans_route_stream

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    feed = emb.select(
        F.col("vec_id").alias("query_id"), "embedding", F.lit(_ts(0)).alias("ts")
    )
    d = tempfile.mkdtemp(prefix="maggy_kmstream_")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    q = (
        kmeans_route_stream(stream, spark, sf_dir)
        .writeStream.format("memory")
        .queryName("km_route_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(not (p.get("stateOperators") or []) or
               sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
               for p in q.recentProgress)
    got = {r.query_id: (r.cluster_id, r.cosine)
           for r in spark.sql("SELECT * FROM km_route_out").collect()}
    want = {r.vec_id: (r.cluster_id, r.cosine)
            for r in ann10_kmeans_assign(spark, sf_dir).collect()}
    assert got == want  # bit-equal doubles, same clusters, nothing dropped


def test_ccnet_route_stream_matches_batch_tx19(spark, sf_dir):
    """Streaming CCNet router parity (the seventh stream end-state
    oracle): routing the corpus's own documents through the frozen
    LM + tertile cut points must (a) reproduce batch tx19 EXACTLY
    per doc — same exact integer milli-nat cost, same bucket — (b)
    hash-match the DuckDB TX19 twin as the accumulated end state,
    and (c) carry zero streaming state."""
    import tempfile

    import duckdb

    from maggy_spark.functions.text import TX19_SQL, tx19_ccnet_bucket
    from maggy_spark.streaming import ccnet_route_stream
    from tools.check_oracle import frame_signature

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feed = docs.select("doc_id", "text", "lang", F.lit(_ts(0)).alias("ts"))
    d = tempfile.mkdtemp(prefix="maggy_ccnetstream_")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    q = (
        ccnet_route_stream(stream, spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ccnet_route_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert all(
        not (p.get("stateOperators") or [])
        or sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
        for p in q.recentProgress
    )
    routed = spark.sql("SELECT * FROM ccnet_route_out").collect()
    got = {r.doc_id: (r.lang, r.n_tokens, r.cost_milli, r.bucket) for r in routed}
    want = {
        r.doc_id: (r.lang, r.n_tokens, r.cost_milli, r.bucket)
        for r in tx19_ccnet_bucket(spark, sf_dir).collect()
    }
    assert got == want  # bit-equal integer costs, same buckets, nothing dropped

    # end state vs the DuckDB twin — the same compare the offline
    # oracle suite runs on the batch operator, here on the stream's
    # accumulated output (ts dropped: the twin has no feed time)
    import pandas as pd

    end_pd = pd.DataFrame(
        [(r.doc_id, r.lang, r.n_tokens, r.cost_milli, r.bucket) for r in routed],
        columns=["doc_id", "lang", "n_tokens", "cost_milli", "bucket"],
    )
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'"
    )
    duck_pd = duck.execute(TX19_SQL).fetchdf()
    s_cols, s_rows = frame_signature(end_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols and s_rows == d_rows
    duck.close()


def test_ccnet_route_stream_unbinned_language(spark, sf_dir, tmp_path):
    """A language the landed corpus never produced has no tertile cut
    points: the router must emit bucket='unbinned' (scored but not
    binned), never a fake 'head' and never an ANSI missing-map-key
    crash."""
    from maggy_spark.streaming import ccnet_route_stream

    feed_rows = [(900001, "the spark table join", "qq", _ts(0))]
    feed = spark.createDataFrame(
        feed_rows, "doc_id bigint, text string, lang string, ts timestamp"
    )
    d = str(tmp_path / "ccnet_unk")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    q = (
        ccnet_route_stream(stream, spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ccnet_route_unk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM ccnet_route_unk").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.bucket == "unbinned"
    assert r.cost_milli > 0  # still scored against the frozen LM


def test_ccnet_route_stream_null_text_routes_unbinned(spark, sf_dir, tmp_path):
    """A malformed feed row (NULL text) yields NULL cost_milli; both
    tertile comparisons evaluate to unknown, so without a guard the
    row would fall through to 'tail' as if scored — diverging from
    batch tx19, which drops NULL-text docs at the explode. The stream
    is the ingest door where malformed rows appear: route them
    'unbinned' so downstream sees them flagged, not mis-bucketed
    (ADVICE r12)."""
    from maggy_spark.streaming import ccnet_route_stream

    feed_rows = [
        (900001, None, "en", _ts(0)),  # malformed: NULL text, known lang
        (900002, "the spark table join", "en", _ts(1)),  # healthy control
    ]
    feed = spark.createDataFrame(
        feed_rows, "doc_id bigint, text string, lang string, ts timestamp"
    )
    d = str(tmp_path / "ccnet_nulltext")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    q = (
        ccnet_route_stream(stream, spark, sf_dir)
        .writeStream.format("memory")
        .queryName("ccnet_route_nulltext")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = {r.doc_id: r for r in spark.sql("SELECT * FROM ccnet_route_nulltext").collect()}
    assert rows[900001].bucket == "unbinned"
    assert rows[900001].cost_milli is None  # flagged, not fake-scored
    assert rows[900002].bucket in ("head", "middle", "tail")  # control still binned


def test_ccnet_route_stream_rejects_empty_store(spark, tmp_path):
    """An empty landed corpus has no LM and no cut points: building
    the router against it must raise loudly (the kmeans_route empty-
    model rule), never route with NULL costs."""
    import pytest

    from maggy_spark.plans.fixtures import invalidate_session_cache
    from maggy_spark.streaming import ccnet_route_stream

    spark.createDataFrame(
        [], "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    invalidate_session_cache(spark, str(tmp_path))
    feed = spark.createDataFrame(
        [(1, "x", "en", _ts(0))], "doc_id bigint, text string, lang string, ts timestamp"
    )
    d = str(tmp_path / "feed")
    feed.write.mode("overwrite").parquet(d)
    stream = spark.readStream.schema(feed.schema).parquet(d)
    with pytest.raises(ValueError, match="non-empty landed corpus"):
        ccnet_route_stream(stream, spark, str(tmp_path))


def test_dd20_refresh_stream_matches_batch(spark, sf_dir, tmp_path):
    """NINTH stream end-state oracle (VERDICT r13 item 5): the
    foreachBatch-maintained star map, after the delta arrives across
    TWO micro-batches (maxFilesPerTrigger=1), must contract to
    EXACTLY the component map batch dd20_refresh produces over the
    same snapshot bytes — per-batch maintenance converges to the
    batch answer, and the mid-stream map is already a valid component
    map of the arrived-so-far universe."""
    import os

    from pyspark.sql import functions as F

    from maggy_spark.functions.dedup import dd20_refresh, dd20_store_star_map
    from maggy_spark.plans.fixtures import load_table
    from maggy_spark.streaming.documents_stream import (
        dd20_refresh_components,
        dd20_refresh_stream_fn,
        dd20_stream_init,
    )

    state = str(tmp_path / "state")
    dd20_stream_init(spark, sf_dir, state)

    delta_ids = sorted(
        r.doc_id
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % 10 == 0)
        .collect()
    )
    assert len(delta_ids) >= 2
    half = len(delta_ids) // 2
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, chunk in enumerate((delta_ids[:half], delta_ids[half:])):
        spark.createDataFrame([(d,) for d in chunk], "doc_id bigint").coalesce(
            1
        ).write.parquet(f"{feed}/b{i}")
    for sub in ("b0", "b1"):
        for f in os.listdir(f"{feed}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{feed}/{sub}/{f}", f"{feed}/{sub}_{f}")

    stream = (
        spark.readStream.schema("doc_id bigint")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(dd20_refresh_stream_fn(spark, sf_dir, state))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    # at least two maintenance versions landed beyond the seed
    import glob

    assert len(glob.glob(f"{state}/star_*")) >= 3

    got = sorted(
        (r.doc_id, r.cluster_rep, r.cluster_size, r.is_duplicate)
        for r in dd20_refresh_components(spark, sf_dir, state).collect()
    )
    snap = str(tmp_path / "snap")
    dd20_store_star_map(spark, sf_dir).write.mode("overwrite").parquet(snap)
    want = sorted(
        (r.doc_id, r.cluster_rep, r.cluster_size, r.is_duplicate)
        for r in dd20_refresh(spark, sf_dir, snap).collect()
    )
    assert got == want


def test_filtered_topk_serve_stream_matches_batch(spark, sf_dir, tmp_path):
    """TENTH stream end-state oracle: the filtered-search servlet,
    fed the five canonical query vectors across TWO micro-batches
    (maxFilesPerTrigger=1), must accumulate EXACTLY batch ann17's
    relation — value-compared against the ANN17 DuckDB twin over the
    same parquet bytes, not just against batch Spark."""
    import os

    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from maggy_spark.functions.similarity import ANN17_SQL, N_QUERIES
    from maggy_spark.streaming.embeddings_stream import filtered_topk_serve_fn

    src = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < N_QUERIES)
        .collect()
    )
    assert len(src) == N_QUERIES
    feed = str(tmp_path / "qfeed")
    os.makedirs(feed)
    schema = "query_id bigint, embedding array<float>, label int, ts timestamp"
    for i, chunk in enumerate((src[:2], src[2:])):
        rows = [(r.vec_id, list(r.embedding), r.label, None) for r in chunk]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(f"{feed}/b{i}")
    for sub in ("b0", "b1"):
        for f in os.listdir(f"{feed}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{feed}/{sub}/{f}", f"{feed}/{sub}_{f}")

    got_batches = []

    def emit(df, batch_id):
        got_batches.append(df.toPandas())

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(filtered_topk_serve_fn(spark, sf_dir, emit))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    assert len(got_batches) >= 2  # genuinely multi-batch

    got = (
        pd.concat(got_batches, ignore_index=True)
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf_dir}/embeddings.parquet')"
    )
    want = con.execute(ANN17_SQL).df().sort_values(["query_id", "rank"]).reset_index(drop=True)
    got2 = got[want.columns].reset_index(drop=True)
    assert len(got2) == len(want)
    for c in want.columns:
        assert (got2[c] == want[c]).all(), c


def test_ann22_refresh_stream_matches_batch(spark, sf_dir, tmp_path):
    """ELEVENTH stream end-state oracle: the foreachBatch-maintained
    IVF code store, after the delta vectors arrive across TWO
    micro-batches (maxFilesPerTrigger=1), must equal the in-plan
    ann22_incremental_store relation row for row — which is itself
    DuckDB-oracled offline and frame-equal to batch ann22_refresh
    (test_ann22_refresh_matches_incremental_store), so the stream,
    the batch path, and the SQL twin pin each other transitively.
    Per-vector independence under the frozen model is the property
    under test: N micro-batches must land exactly the rows one batch
    would."""
    import glob
    import os

    from pyspark.sql import functions as F

    from maggy_spark.functions.similarity import (
        _ann22_latest,
        ann22_incremental_store,
        ann22_store_build,
    )
    from maggy_spark.streaming.embeddings_stream import ann22_refresh_stream_fn

    store = str(tmp_path / "store")
    ann22_store_build(spark, sf_dir, store)

    delta = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where((F.col("vec_id") % 10 == 0) & (F.col("vec_id") >= 5))
        .select("vec_id", "embedding")
        .collect()
    )
    assert len(delta) >= 2
    half = len(delta) // 2
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    for i, chunk in enumerate((delta[:half], delta[half:])):
        spark.createDataFrame(
            [(r.vec_id, r.embedding) for r in chunk],
            "vec_id bigint, embedding array<float>",
        ).coalesce(1).write.parquet(f"{feed}/b{i}")
    for sub in ("b0", "b1"):
        for f in os.listdir(f"{feed}/{sub}"):
            if f.endswith(".parquet"):
                os.rename(f"{feed}/{sub}/{f}", f"{feed}/{sub}_{f}")

    stream = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )
    q = (
        stream.writeStream.foreachBatch(ann22_refresh_stream_fn(spark, sf_dir, store))
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)

    # at least two maintenance versions landed beyond the snapshot
    assert len(glob.glob(f"{store}/codes_*")) >= 3

    got = sorted(
        (r.vec_id, r.list_id, r.cn2, r.code_md5, r.source, r.is_delta)
        for r in spark.read.parquet(_ann22_latest(store)).drop("cv").collect()
    )
    want = sorted(
        (r.vec_id, r.list_id, r.cn2, r.code_md5, r.source, r.is_delta)
        for r in ann22_incremental_store(spark, sf_dir).collect()
    )
    assert got == want and len(got) > 0
