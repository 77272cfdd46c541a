"""S10 JSONL ingest source: corrupt-record quarantine contract.

Three line classes a 100 TB crawl actually contains: well-formed,
syntactically broken (truncated flush), and shape-drifted (valid
JSON, wrong/missing fields). The split must route each correctly,
lose no bytes, and round-trip the clean relation against the same
docs written as parquet."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from maggy_spark.sources.jsonl import (  # noqa: E402
    jsonl_ingest,
    jsonl_ingest_report,
)

GOOD = [
    {"doc_id": 1, "text": "the fast value", "lang": "en", "source": "src0", "n_chars": 14},
    {"doc_id": 2, "text": "der wert", "lang": "de", "source": "src1", "n_chars": 8},
]
BROKEN = ['{"doc_id": 3, "text": "trunc', "not json at all"]
DRIFTED = [
    {"doc_id": None, "text": "no id", "lang": "en", "source": "s", "n_chars": 5},
    {"doc_id": 4, "lang": "en", "source": "s", "n_chars": 0},  # no text
]


def _write_feed(tmp_path):
    p = tmp_path / "feed.jsonl"
    lines = [json.dumps(g) for g in GOOD] + BROKEN + [json.dumps(d) for d in DRIFTED]
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_split_routes_all_three_line_classes(spark, tmp_path):
    path = _write_feed(tmp_path)
    clean, quarantine = jsonl_ingest(spark, path)
    got = {r.doc_id: r.text for r in clean.collect()}
    assert got == {1: "the fast value", 2: "der wert"}
    q = [r.raw_line for r in quarantine.collect()]
    assert len(q) == len(BROKEN) + len(DRIFTED)
    # syntactically-broken lines keep their raw bytes verbatim
    for b in BROKEN:
        assert b in q
    # shape-drifted lines are reconstructable JSON carrying their fields
    assert any('"no id"' in x for x in q)


def test_jsonl_clean_roundtrips_against_parquet(spark, tmp_path):
    path = _write_feed(tmp_path)
    clean, _ = jsonl_ingest(spark, path)
    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(g["doc_id"], g["text"], g["lang"], g["source"], g["n_chars"]) for g in GOOD],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    ).write.mode("overwrite").parquet(pq)
    ref = spark.read.parquet(pq)
    assert clean.schema == ref.schema
    assert sorted(map(tuple, clean.collect())) == sorted(map(tuple, ref.collect()))


def test_jsonl_report_counts_one_pass(spark, tmp_path):
    path = _write_feed(tmp_path)
    r = jsonl_ingest_report(spark, path).collect()[0]
    assert (r.n_clean, r.n_quarantined) == (len(GOOD), len(BROKEN) + len(DRIFTED))
    assert r.clean_tokens == sum(len(g["text"].split(" ")) for g in GOOD)


def test_jsonl_scan_is_line_splittable_and_shuffle_free(spark, tmp_path):
    """Plan audit: both branches are narrow projections of a JSON
    FileScan — zero Exchange nodes anywhere."""
    path = _write_feed(tmp_path)
    clean, quarantine = jsonl_ingest(spark, path)
    for df in (clean, quarantine):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "FileScan json" in plan


def test_jsonl_stream_end_state_matches_batch_ingest(spark, tmp_path):
    """End-state oracle (the ing1 discipline): the feed split across
    THREE single-file micro-batches, both output streams accumulated
    via foreachBatch, and the accumulated end state compared against
    the batch jsonl_ingest of the same directory — arrival batching
    must not change what lands where. Also pins statelessness: the
    split is a row-local predicate."""
    from maggy_spark.sources.jsonl import jsonl_ingest_stream

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.jsonl").write_text(json.dumps(GOOD[0]) + "\n" + BROKEN[0] + "\n")
    (feed / "b.jsonl").write_text(json.dumps(GOOD[1]) + "\n" + BROKEN[1] + "\n")
    (feed / "c.jsonl").write_text("\n".join(json.dumps(d) for d in DRIFTED) + "\n")

    clean_s, quar_s = jsonl_ingest_stream(spark, str(feed))
    got_clean, got_quar, n_batches = [], [], [0]

    def sink(acc):
        def f(bdf, _bid):
            acc.extend(map(tuple, bdf.collect()))
            n_batches[0] += 1
        return f

    for stream, acc, name in ((clean_s, got_clean, "c"), (quar_s, got_quar, "q")):
        q = (
            stream.writeStream.foreachBatch(sink(acc))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # statelessness: a row-local split needs no state store
        assert q.lastProgress is None or all(
            op.get("numRowsTotal", 0) == 0
            for op in (q.lastProgress.get("stateOperators") or [])
        )
    assert n_batches[0] >= 6  # 3 files x 2 streams, 1 file per trigger

    batch_clean, batch_quar = jsonl_ingest(spark, str(feed))
    assert sorted(got_clean) == sorted(map(tuple, batch_clean.collect()))
    assert sorted(got_quar) == sorted(
        (r.raw_line,) for r in batch_quar.collect()
    )


def test_s10_fixture_quarantines_exactly_the_broken_lines(spark, sf_dir):
    """The crafted-corpus pin for the S10 oracle fixture (VERDICT r12
    item 6): the clean relation is exactly the documents table (count
    + spot-check), every crafted broken line lands in quarantine, and
    the parse-failure classes keep their original bytes verbatim."""
    from maggy_spark.sources.jsonl import (
        S10_BROKEN_LINES,
        ensure_s10_fixture,
        jsonl_ingest,
        s10_jsonl_clean,
    )

    path = ensure_s10_fixture(sf_dir)
    clean, quar = jsonl_ingest(spark, path)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert clean.count() == n_docs
    assert s10_jsonl_clean(spark, sf_dir).count() == n_docs
    quar_lines = [r.raw_line for r in quar.collect()]
    assert len(quar_lines) == len(S10_BROKEN_LINES)
    # parse failures (corrupt-record channel) keep their bytes verbatim
    for broken in (S10_BROKEN_LINES[0], S10_BROKEN_LINES[1], S10_BROKEN_LINES[4]):
        assert broken in quar_lines


def test_jsonl_stream_end_state_matches_duckdb_twin(spark, tmp_path):
    """The EIGHTH stream end-state oracle: the S10 clean stream,
    accumulated across three single-file micro-batches via
    foreachBatch, value-compared against an independent ENGINE —
    DuckDB's native JSON functions over a raw-line read of the same
    directory (s10_clean_sql_for_path) — not just against the batch
    Spark path. The accumulated quarantine count + clean token mass
    are additionally checked against the report twin, so micro-batch
    splitting, the PERMISSIVE corrupt channel, and the shared _ok()
    predicate are all inside the cross-engine surface."""
    import duckdb

    from maggy_spark.sources.jsonl import (
        S10_BROKEN_LINES,
        jsonl_ingest_stream,
        s10_clean_sql_for_path,
        s10_report_sql_for_path,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    docs = [
        {"doc_id": 1, "text": "alpha beta gamma", "lang": "en", "source": "s1", "n_chars": 16},
        {"doc_id": 2, "text": "delta epsilon", "lang": "de", "source": "s2", "n_chars": 13},
        {"doc_id": 3, "text": "zeta", "lang": "fr", "source": "s1", "n_chars": 4},
    ]
    (feed / "a.jsonl").write_text(json.dumps(docs[0]) + "\n" + S10_BROKEN_LINES[0] + "\n")
    (feed / "b.jsonl").write_text(json.dumps(docs[1]) + "\n" + S10_BROKEN_LINES[2] + "\n")
    (feed / "c.jsonl").write_text(
        json.dumps(docs[2]) + "\n" + S10_BROKEN_LINES[4] + "\n" + S10_BROKEN_LINES[5] + "\n"
    )

    clean_s, quar_s = jsonl_ingest_stream(spark, str(feed))
    got_clean, got_quar = [], []

    def sink(acc):
        def f(bdf, _bid):
            acc.extend(map(tuple, bdf.collect()))
        return f

    for stream, acc, name in ((clean_s, got_clean, "c8"), (quar_s, got_quar, "q8")):
        q = (
            stream.writeStream.foreachBatch(sink(acc))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    con = duckdb.connect()
    glob = str(feed / "*.jsonl")
    duck_clean = sorted(map(tuple, con.execute(s10_clean_sql_for_path(glob)).fetchall()))
    assert sorted(got_clean) == duck_clean
    n_clean, n_quar, clean_tokens = con.execute(s10_report_sql_for_path(glob)).fetchone()
    assert (len(got_clean), len(got_quar)) == (n_clean, n_quar)
    spark_tokens = sum(len(t[1].split(" ")) for t in got_clean)
    assert spark_tokens == clean_tokens
