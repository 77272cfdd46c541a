"""S11 CSV ingest source: quarantine contract in the quote-disabled
delimiter-free-fields dialect.

The failure classes a real delimited delivery produces: wrong arity
(both directions, including a valid-5-prefix tail), numeric type
drift (in the FIRST and the LAST column — the last one is the
column-pruning trap), empty-token null conversion (id / text), and
the stray-quote byte that the dialect deliberately treats as DATA.
The split must route each correctly, lose no bytes, agree with its
own report under full-row parsing, and value-match the DuckDB
raw-line twin — batch and streamed."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from maggy_spark.sources.csvsrc import (  # noqa: E402
    S11_BROKEN_LINES,
    S11_QUOTE_LINE,
    csv_ingest,
    csv_ingest_report,
)

GOOD = [
    (1, "the fast value", "en", "src0", 14),
    (2, "der wert", "de", "src1", 8),
]


def _write_feed(tmp_path):
    p = tmp_path / "feed.csv"
    lines = [",".join(str(v) for v in g) for g in GOOD] + [S11_QUOTE_LINE] + S11_BROKEN_LINES
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_csv_split_routes_every_failure_class(spark, tmp_path):
    path = _write_feed(tmp_path)
    clean, quarantine = csv_ingest(spark, path)
    got = {r.doc_id: r.text for r in clean.collect()}
    # the dialect pin: the stray quote is DATA — the line is clean
    # with the literal byte in text (quote handling would swallow the
    # rest of the line and quarantine it)
    assert got == {
        1: "the fast value",
        2: "der wert",
        900000005: '"unterminated quote',
    }
    q = [r.raw_line for r in quarantine.collect()]
    assert len(q) == len(S11_BROKEN_LINES)
    # corrupt-channel classes keep their raw bytes verbatim; the
    # null-conversion classes reconstruct byte-identically because
    # the dialect is delimiter-free (concat_ws round-trips)
    for b in S11_BROKEN_LINES:
        assert b in q


def test_csv_clean_roundtrips_against_parquet(spark, tmp_path):
    path = _write_feed(tmp_path)
    clean, _ = csv_ingest(spark, path)
    pq = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        GOOD, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).write.mode("overwrite").parquet(pq)
    ref = spark.read.parquet(pq)
    assert clean.schema == ref.schema
    assert sorted(map(tuple, clean.where(F.col("doc_id") < 900000000).collect())) == sorted(
        map(tuple, ref.collect())
    )


def test_csv_report_agrees_with_split(spark, tmp_path):
    """THE projection-invariance pin (why the scan is text+from_csv,
    not the native csv source): the native source's corrupt channel
    only fires for failures in PARSED columns, so under column
    pruning `clean.count()` classified wrong-arity and
    tail-type-failure lines as clean while `clean.collect()`
    quarantined them (measured: 6 vs 3 on this feed). With the
    whole-line parse, count == collect == report, all widths."""
    path = _write_feed(tmp_path)
    clean, quar = csv_ingest(spark, path)
    assert clean.count() == len(clean.collect())  # the projection-invariance pin
    r = csv_ingest_report(spark, path).collect()[0]
    assert r.n_clean == clean.count() == len(GOOD) + 1
    assert r.n_quarantined == quar.count() == len(S11_BROKEN_LINES)
    assert r.clean_tokens == sum(len(g[1].split(" ")) for g in GOOD) + 2
    assert r.clean_chars == sum(g[4] for g in GOOD) + 5
    assert r.n_langs == 2 and r.n_sources == 2  # en/de, src0/src1 (quote row: en/src1)


def test_csv_scan_is_line_splittable_and_shuffle_free(spark, tmp_path):
    """Plan audit: both branches are narrow projections of ONE text
    FileScan — zero Exchange nodes anywhere (a text scan is
    line-splittable by construction, so this holds under
    maxPartitionBytes splitting too; the quote-disabled dialect is
    what makes the per-line parse sound)."""
    path = _write_feed(tmp_path)
    clean, quarantine = csv_ingest(spark, path)
    for df in (clean, quarantine):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "FileScan text" in plan


def test_s11_fixture_quarantines_exactly_the_broken_lines(spark, sf_dir):
    """The crafted-corpus pin for the S11 oracle fixture: the clean
    relation is exactly the documents table PLUS the one dialect-pin
    quote row; every crafted broken line lands in quarantine with its
    bytes intact."""
    from maggy_spark.sources.csvsrc import ensure_s11_fixture, s11_csv_clean

    path = ensure_s11_fixture(sf_dir)
    clean, quar = csv_ingest(spark, path)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert clean.count() == n_docs + 1
    assert s11_csv_clean(spark, sf_dir).count() == n_docs + 1
    quar_lines = [r.raw_line for r in quar.collect()]
    assert sorted(quar_lines) == sorted(S11_BROKEN_LINES)


def test_csv_stream_end_state_matches_batch_ingest(spark, tmp_path):
    """Arrival batching must not change what lands where: the feed
    split across three single-file micro-batches, both output streams
    accumulated, end state == the batch csv_ingest of the same
    directory. Also pins statelessness (row-local split, no state
    store)."""
    from maggy_spark.sources.csvsrc import csv_ingest_stream

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.csv").write_text(
        ",".join(str(v) for v in GOOD[0]) + "\n" + S11_BROKEN_LINES[0] + "\n"
    )
    (feed / "b.csv").write_text(
        ",".join(str(v) for v in GOOD[1]) + "\n" + S11_BROKEN_LINES[2] + "\n"
    )
    (feed / "c.csv").write_text(
        S11_QUOTE_LINE + "\n" + S11_BROKEN_LINES[4] + "\n" + S11_BROKEN_LINES[5] + "\n"
    )

    clean_s, quar_s = csv_ingest_stream(spark, str(feed))
    got_clean, got_quar = [], []

    def sink(acc):
        def f(bdf, _bid):
            acc.extend(map(tuple, bdf.collect()))

        return f

    for stream, acc, name in ((clean_s, got_clean, "c11"), (quar_s, got_quar, "q11")):
        q = (
            stream.writeStream.foreachBatch(sink(acc))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert q.lastProgress is None or all(
            op.get("numRowsTotal", 0) == 0
            for op in (q.lastProgress.get("stateOperators") or [])
        )

    batch_clean, batch_quar = csv_ingest(spark, str(feed))
    assert sorted(got_clean) == sorted(map(tuple, batch_clean.collect()))
    assert sorted(got_quar) == sorted((r.raw_line,) for r in batch_quar.collect())


def test_csv_stream_end_state_matches_duckdb_twin(spark, tmp_path):
    """The TWELFTH stream end-state oracle: the S11 clean stream,
    accumulated across three single-file micro-batches, value-compared
    against DuckDB's raw-line + str_split + try_cast twin over the
    same directory — and the accumulated counts against the full-width
    report twin, so micro-batch splitting, the PERMISSIVE corrupt
    channel, the quote-disabled dialect, and the pruning-safe report
    are all inside the cross-engine surface."""
    import duckdb

    from maggy_spark.sources.csvsrc import (
        csv_ingest_stream,
        s11_clean_sql_for_path,
        s11_report_sql_for_path,
    )

    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "a.csv").write_text(
        ",".join(str(v) for v in GOOD[0]) + "\n" + S11_BROKEN_LINES[1] + "\n"
    )
    (feed / "b.csv").write_text(
        ",".join(str(v) for v in GOOD[1]) + "\n" + S11_BROKEN_LINES[3] + "\n"
    )
    (feed / "c.csv").write_text(S11_QUOTE_LINE + "\n" + S11_BROKEN_LINES[5] + "\n")

    clean_s, quar_s = csv_ingest_stream(spark, str(feed))
    got_clean, got_quar = [], []

    def sink(acc):
        def f(bdf, _bid):
            acc.extend(map(tuple, bdf.collect()))

        return f

    for stream, acc, name in ((clean_s, got_clean, "c12"), (quar_s, got_quar, "q12")):
        q = (
            stream.writeStream.foreachBatch(sink(acc))
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    con = duckdb.connect()
    glob = str(feed / "*.csv")
    duck_clean = sorted(map(tuple, con.execute(s11_clean_sql_for_path(glob)).fetchall()))
    assert sorted(got_clean) == duck_clean
    n_clean, n_quar, clean_tokens, clean_chars, n_langs, n_sources = con.execute(
        s11_report_sql_for_path(glob)
    ).fetchone()
    assert (len(got_clean), len(got_quar)) == (n_clean, n_quar)
    spark_tokens = sum(len(t[1].split(" ")) for t in got_clean)
    assert spark_tokens == clean_tokens
    assert sum(t[4] for t in got_clean) == clean_chars
    assert (n_langs, n_sources) == (2, 2)
