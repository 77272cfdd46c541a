"""Synthesize an sf~1 decade of the `documents` / `embeddings` tables.

The driver ships sf0.001/0.01/0.1 only; the scaling probe needs one
more decade to turn the flat-candidates/row claim from extrapolation
into measurement. This reproduces the OBSERVED generator recipe of
the driver's tables (measured on /root/testdata/sf0.1):

- documents: uniform word soup over the same 31-token vocabulary,
  doc length uniform 10..100 tokens, lang ~ {en:0.41, de/es/fr/zh:
  ~0.148 each}, source = src{doc_id % 20}, n_chars = len(text),
  ~0.3% injected exact duplicates (sf0.1 shows 8 dup pairs / 5000).
- embeddings: isotropic unit-norm 64-dim gaussian vectors, label
  uniform over 0..9 (sf0.1: mean 0, std 1/sqrt(64), norm 1.0).

Deterministic (fixed seed), written OUTSIDE /root/testdata (which is
read-only) to /tmp/maggy_sf1 by default. Only the two tables the
blocked operators probe are generated.
"""

from __future__ import annotations

from pathlib import Path

VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "the", "value", "vector", "window",
]
LANGS = ["en", "de", "es", "fr", "zh"]
LANG_P = [0.41, 0.1475, 0.1475, 0.1475, 0.1475]
EMB_DIM = 64
SEED = 42


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def ensure_scale_dir(
    n_docs: int = 50_000,
    n_vecs: int = 20_000,
    n_events: int = 1_000_000,
    out_dir: str = "/tmp/maggy_sf1",
) -> str:
    """Generate (once) and return the sf~1 directory. Idempotent: if
    the parquet files exist with the expected row counts, reuse.

    events reproduces the observed driver recipe (measured on
    /root/testdata/sf0.1: 100k rows = 10x per decade, 5 uniform
    event types, users = 15x rows/1000, ts uniform over 2024-01-01..
    2024-01-31, value double, props a tiny JSON string)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out_dir)
    dp, ep = out / "documents.parquet", out / "embeddings.parquet"
    vp = out / "events.parquet"
    # recipe stamp: row counts alone would silently reuse data written
    # by an older/modified generator, skewing the probe's 4th-decade
    # numbers against an undocumented corpus
    recipe = (
        f"seed={SEED};docs={n_docs};vecs={n_vecs};events={n_events};"
        f"vocab={len(VOCAB)};dim={EMB_DIM};v3"
    )
    marker = out / "RECIPE.txt"
    if dp.exists() and ep.exists() and vp.exists() and marker.exists() and marker.read_text() == recipe:
        con = duckdb.connect()
        nd = con.execute(f"SELECT count(*) FROM '{dp}'").fetchone()[0]
        ne = con.execute(f"SELECT count(*) FROM '{ep}'").fetchone()[0]
        nv = con.execute(f"SELECT count(*) FROM '{vp}'").fetchone()[0]
        con.close()
        if nd == n_docs and ne == n_vecs and nv == n_events:
            return str(out)
    out.mkdir(parents=True, exist_ok=True)

    rng = np.random.default_rng(SEED)
    vocab = np.array(VOCAB)
    lengths = rng.integers(10, 101, size=n_docs)
    texts: list[str] = []
    for ln in lengths:
        texts.append(" ".join(vocab[rng.integers(0, len(vocab), size=ln)]))
    # inject ~0.3% exact duplicates (copy an earlier doc's text)
    n_dups = max(1, n_docs * 3 // 1000)
    dup_targets = rng.integers(0, n_docs, size=n_dups)
    dup_sources = rng.integers(0, n_docs, size=n_dups)
    for t, s in zip(dup_targets, dup_sources):
        if t != s:
            texts[t] = texts[s]
    langs = rng.choice(LANGS, size=n_docs, p=LANG_P)
    doc_ids = np.arange(n_docs, dtype=np.int64)
    tbl = pa.table(
        {
            "doc_id": doc_ids,
            "text": texts,
            "lang": langs,
            "source": [f"src{i % 20}" for i in range(n_docs)],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(tbl, dp)

    vecs = rng.standard_normal((n_vecs, EMB_DIM))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    etbl = pa.table(
        {
            "vec_id": np.arange(n_vecs, dtype=np.int64),
            "embedding": pa.array(list(vecs), type=pa.list_(pa.float32())),
            "label": rng.integers(0, 10, size=n_vecs).astype(np.int32),
        }
    )
    pq.write_table(etbl, ep)

    n_users = max(1, 15 * n_events // 1000)
    span_us = 30 * 86_400_000_000  # 30 days from 2024-01-01T00:00:00
    epoch0 = 1_704_067_200_000_000  # 2024-01-01 in epoch micros
    ets = epoch0 + rng.integers(0, span_us, size=n_events)
    vtbl = pa.table(
        {
            "event_id": np.arange(n_events, dtype=np.int64),
            "ts": pa.array(ets, type=pa.timestamp("us")),
            "user_id": rng.integers(0, n_users, size=n_events).astype(np.int64),
            "event_type": rng.choice(EVENT_TYPES, size=n_events),
            "value": np.round(rng.uniform(0.0, 200.0, size=n_events), 2),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n_events)],
        }
    )
    pq.write_table(vtbl, vp)
    marker.write_text(recipe)
    return str(out)


if __name__ == "__main__":
    print(ensure_scale_dir())
