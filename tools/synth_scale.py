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


def ensure_scale_dir(
    n_docs: int = 50_000, n_vecs: int = 20_000, out_dir: str = "/tmp/maggy_sf1"
) -> str:
    """Generate (once) and return the sf~1 directory. Idempotent: if
    both parquet files exist with the expected row counts, reuse."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = Path(out_dir)
    dp, ep = out / "documents.parquet", out / "embeddings.parquet"
    # recipe stamp: row counts alone would silently reuse data written
    # by an older/modified generator, skewing the probe's 4th-decade
    # numbers against an undocumented corpus
    recipe = f"seed={SEED};docs={n_docs};vecs={n_vecs};vocab={len(VOCAB)};dim={EMB_DIM};v2"
    marker = out / "RECIPE.txt"
    if dp.exists() and ep.exists() and marker.exists() and marker.read_text() == recipe:
        con = duckdb.connect()
        nd = con.execute(f"SELECT count(*) FROM '{dp}'").fetchone()[0]
        ne = con.execute(f"SELECT count(*) FROM '{ep}'").fetchone()[0]
        con.close()
        if nd == n_docs and ne == n_vecs:
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
    marker.write_text(recipe)
    return str(out)


if __name__ == "__main__":
    print(ensure_scale_dir())
