"""Third-algorithm replay oracle for the k-means family (ann10 /
ann11 / pl15) — the dd10 union-find discipline applied to Lloyd
training.

WHY: the family's DuckDB twins replay centroid training as an
unrolled n x k cross join per assignment pass. That is fine through
sf1 (20k x 625), but at the sf10 decade (200k vectors, k at the 1024
broadcast cap) the ORACLE side is 204.8M scored rows per pass — the
48 GB DuckDB run OOMs and the EXISTS pair stage spills past the disk
(measured, see COVERAGE.md r11). The OPERATOR itself is fine at that
scale (broadcast + map-side argmax); only the twin's join shape is
not. So, like dd10's quadratic recursive-CTE closure, the sweep
switches to a THIRD algorithm: a numpy+Decimal replay that spells the
exact same arithmetic chains —

- dot products fold left-to-right over double-cast elements
  (one multiply + one add per dim, no FMA — numpy's elementwise ops
  match the JVM fold and DuckDB's list_dot_product bit-for-bit);
- cosines divide by the (en * cn) product in the same association;
- centroid sums run EXACTLY: each element is scaled to an integer at
  decimal(38,18) via the shortest-double-repr HALF_UP rounding (the
  tx11 cast-parity route: Python's repr(float) IS the shortest repr
  both engines round), summed in arbitrary-precision ints (order-free
  by construction), rounded HALF_UP to 10 fractional digits, and only
  then converted to IEEE double and divided by the member count;
- argmax ties break to the lower cid (numpy argmax returns the FIRST
  max; columns are kept in cid order).

Validated against the DuckDB twins at sf0.001 and sf0.01 by
tests/test_sf1_tools.py::test_kmeans_replay_matches_duckdb_twins, so
the replay and the gate-layer SQL cannot drift.

Usage:
    python tools/kmeans_replay.py --dir /tmp/maggy_sf10 [names...]
Writes/merges KM_REPLAY_PARITY.json keyed by (dir, name).
"""

from __future__ import annotations

import json
import math
import sys
import time
from decimal import ROUND_HALF_UP, Decimal
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

KM_TARGET_VECS = 32
KM_MAX_K = 1024
KM_ITERS = 2
KM_SEM_TAU = 0.3
PL15_SHARE = 0.5

_D18 = Decimal(1).scaleb(-18)
_D10 = Decimal(1).scaleb(-10)


def fold_dot(A: np.ndarray, B: np.ndarray, block: int = 32768) -> np.ndarray:
    """(n,d) x (k,d) -> (n,k) dot products as LEFT-TO-RIGHT folds over
    the dimension axis (acc = acc + a_d*b_d), blocked over rows so the
    per-dim temp stays bounded."""
    n, d = A.shape
    k = B.shape[0]
    out = np.empty((n, k), dtype=np.float64)
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        acc = np.zeros((hi - lo, k), dtype=np.float64)
        for dim in range(d):
            acc += A[lo:hi, dim][:, None] * B[:, dim][None, :]
        out[lo:hi] = acc
    return out


def fold_self(A: np.ndarray) -> np.ndarray:
    """Per-row self-dot as the same left-to-right fold."""
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for dim in range(A.shape[1]):
        acc += A[:, dim] * A[:, dim]
    return acc


_SCALE_MEMO: dict[float, int] = {}


def scaled_int18(v: float) -> int:
    """The element's decimal(38,18) value as an integer scaled by
    1e18: HALF_UP rounding of the double's SHORTEST repr — the exact
    value Spark's double->decimal cast and the twin's
    CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18)) both produce."""
    m = _SCALE_MEMO.get(v)
    if m is None:
        m = int(Decimal(repr(v)).quantize(_D18, rounding=ROUND_HALF_UP).scaleb(18))
        _SCALE_MEMO[v] = m
    return m


def comp_value(total18: int, count: int) -> float:
    """round(sum, 10) -> double -> / count, both engine-agreed."""
    q = (Decimal(total18).scaleb(-18)).quantize(_D10, rounding=ROUND_HALF_UP)
    return float(q) / count


def kmeans_k(n: int) -> int:
    return min(KM_MAX_K, max(4, math.ceil(n / KM_TARGET_VECS)))


def _load_embeddings(sf_dir: str):
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    emb = emb.sort_values("vec_id").reset_index(drop=True)
    ids = emb["vec_id"].to_numpy(np.int64)
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    return ids, E


def _update(E: np.ndarray, Eint: list[list[int]], assign: np.ndarray, cids: np.ndarray):
    """One exact Lloyd update: returns (new_cids, C, cn). `assign`
    holds column indices into `cids`."""
    k, d = len(cids), E.shape[1]
    sums = [[0] * d for _ in range(k)]
    counts = [0] * k
    for i, c in enumerate(assign):
        counts[c] += 1
        s = sums[c]
        row = Eint[i]
        for dim in range(d):
            s[dim] += row[dim]
    keep = [j for j in range(k) if counts[j] > 0]
    C = np.empty((len(keep), d), dtype=np.float64)
    for out_j, j in enumerate(keep):
        cnt = counts[j]
        C[out_j] = [comp_value(sums[j][dim], cnt) for dim in range(d)]
    cn = np.sqrt(fold_self(C))
    # zero-norm-centroid attrition (similarity._km_update rule): a
    # cancelling cluster's centroid has no direction — drop it, same
    # as an empty cluster, identically to Spark and the DuckDB twin.
    nz = cn > 0
    return cids[keep][nz], C[nz], cn[nz]


def replay_kmeans_arrays(ids: np.ndarray, E: np.ndarray, k: int, iters: int = KM_ITERS):
    """The replay core over in-memory (ids, E) — factored out so
    property tests can drive random corpora against kmeans_over
    (ids must be sorted ascending; E float64, one row per id).
    Zero-norm input vectors are dropped before seeding (the
    kmeans_centroids_over degenerate-vector rule); an all-degenerate
    corpus raises ValueError, matching Spark."""
    nzin = np.sqrt(fold_self(E)) > 0
    ids, E = ids[nzin], E[nzin]
    n = len(ids)
    en = np.sqrt(fold_self(E))
    # seeds: k lowest vec_ids, cid = 1..k in vec_id order
    C = E[:k].copy()
    cn = en[:k].copy()
    cids = np.arange(1, min(k, n) + 1, dtype=np.int64)
    C, cn = C[: len(cids)], cn[: len(cids)]
    Eint = [[scaled_int18(v) for v in row] for row in E]
    for _ in range(iters):
        cos = fold_dot(E, C) / (en[:, None] * cn[None, :])
        assign = np.argmax(cos, axis=1)  # first max = lowest cid on ties
        cids, C, cn = _update(E, Eint, assign, cids)
        if not len(cids):
            raise ValueError(
                "k-means: every cluster degenerated (empty or "
                "zero-norm centroid) — corpus has no clusterable "
                "direction structure"
            )
    cos = fold_dot(E, C) / (en[:, None] * cn[None, :])
    assign = np.argmax(cos, axis=1)
    cos_best = cos[np.arange(n), assign]
    return ids, E, en, cids[assign], cos_best, cids, C, cn


def replay_kmeans(sf_dir: str):
    """Full ann10 replay: returns (ids, E, en, assign_cids, cos_best,
    cids, C, cn) after KM_ITERS updates + final assignment."""
    ids, E = _load_embeddings(sf_dir)
    return replay_kmeans_arrays(ids, E, kmeans_k(len(ids)))


def replay_ann10(sf_dir: str) -> pd.DataFrame:
    ids, _E, _en, acids, cos_best, *_ = replay_kmeans(sf_dir)
    return pd.DataFrame(
        {"vec_id": ids, "cluster_id": acids, "cosine": cos_best}
    )


def _prune_flags(ids, E, en, acids, cos_best):
    pruned = np.zeros(len(ids), dtype=bool)
    for cid in np.unique(acids):
        idx = np.where(acids == cid)[0]
        if len(idx) < 2:
            continue
        M = E[idx]
        pc = fold_dot(M, M) / (en[idx][:, None] * en[idx][None, :])
        # priority order: (cos_to_centroid ASC, vec_id ASC)
        order = np.lexsort((ids[idx], cos_best[idx]))
        for p in range(1, len(order)):
            b = order[p]
            if (pc[b, order[:p]] >= KM_SEM_TAU).any():
                pruned[idx[b]] = True
    return pruned


def replay_ann11(sf_dir: str) -> pd.DataFrame:
    ids, E, en, acids, cos_best, *_ = replay_kmeans(sf_dir)
    return pd.DataFrame(
        {"vec_id": ids, "cluster_id": acids, "pruned": _prune_flags(ids, E, en, acids, cos_best)}
    )


def replay_pl15(sf_dir: str) -> pd.DataFrame:
    ids, E, en, acids, cos_best, *_ = replay_kmeans(sf_dir)
    pruned = _prune_flags(ids, E, en, acids, cos_best)
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ntok = {int(i): len(t.split(" ")) for i, t in zip(docs["doc_id"], docs["text"])}
    rows = [
        (int(ids[i]), int(acids[i]), float(cos_best[i]), ntok[int(ids[i])])
        for i in range(len(ids))
        if not pruned[i] and int(ids[i]) in ntok
    ]
    j = pd.DataFrame(rows, columns=["doc_id", "cluster_id", "cos", "n_tokens"])
    total = int(j["n_tokens"].sum())
    k = j["cluster_id"].nunique()
    budget = math.ceil(total / ((1.0 / PL15_SHARE) * k))
    out = []
    for cid, g in j.groupby("cluster_id"):
        g = g.sort_values(["cos", "doc_id"]).reset_index(drop=True)
        cum = 0
        for rank, r in enumerate(g.itertuples(index=False), start=1):
            cum += r.n_tokens
            out.append((r.doc_id, cid, rank, r.n_tokens, cum <= budget))
    df = pd.DataFrame(
        out, columns=["doc_id", "cluster_id", "div_rank", "n_tokens", "selected"]
    )
    return df.astype(
        {"doc_id": "int64", "cluster_id": "int64", "div_rank": "int64",
         "n_tokens": "int64", "selected": "bool"}
    )


def replay_ann13(sf_dir: str) -> pd.DataFrame:
    """ann13_cluster_quality oracle: order-free member aggregates over
    the replayed final assignment plus a k x k fold-dot separation
    pass over the final centroids (first-max = lowest other cid on
    ties, the Spark window's ORDER BY pc DESC, ocid rule)."""
    ids, _E, _en, acids, cos_best, cids, C, cn = replay_kmeans(sf_dir)
    pc = fold_dot(C, C) / (cn[:, None] * cn[None, :])
    np.fill_diagonal(pc, -np.inf)
    rows = []
    for pos, cid in enumerate(cids):
        idx = np.where(acids == cid)[0]
        if not len(idx):
            continue  # centroid with no assigned members: not in mem
        if len(cids) > 1:
            nn_pos = int(np.argmax(pc[pos]))
            nn_cid, nn_sep = int(cids[nn_pos]), float(pc[pos, nn_pos])
        else:
            nn_cid, nn_sep = None, None
        rows.append(
            (
                int(cid),
                int(len(idx)),
                float(cos_best[idx].min()),
                float(cos_best[idx].max()),
                int((cos_best[idx] < KM_SEM_TAU).sum()),
                nn_cid,
                nn_sep,
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "cluster_id", "n_members", "min_cos", "max_cos",
            "n_loose", "nn_cluster_id", "nn_sep",
        ],
    ).astype(
        {"cluster_id": "int64", "n_members": "int64", "min_cos": "float64",
         "max_cos": "float64", "n_loose": "int64", "nn_sep": "float64"}
    ).astype(
        # kmeans_k floors at 4 so the single-centroid (all-None) case
        # never occurs on real sweeps, but attrition can reach it on
        # crafted corpora: Int64 keeps the cast from crashing there
        {"nn_cluster_id": "int64" if len(cids) > 1 else "Int64"}
    )


def replay_ann15(sf_dir: str) -> pd.DataFrame:
    """ann15_cluster_keywords oracle: the replayed final assignment +
    a pure-python TF-IDF over clusters (tf dict fold, idf over
    clusters with the decimal(18,6) ln blunting, top-3 per cluster
    ordered by score desc then term asc)."""
    ids, _E, _en, acids, _cos, cids, _C, _cn = replay_kmeans(sf_dir)
    cid_of = {int(i): int(c) for i, c in zip(ids, acids)}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    tf: dict = {}
    for i, t in zip(docs["doc_id"], docs["text"]):
        cid = cid_of.get(int(i))
        if cid is None:
            continue
        for w in t.split(" "):
            k = (cid, w)
            tf[k] = tf.get(k, 0) + 1
    df: dict = {}
    for (_cid, w) in tf:
        df[w] = df.get(w, 0) + 1
    nc = float(len(set(cid_of.values())))
    idf = {
        w: float(
            Decimal(repr(math.log(nc / d))).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        for w, d in df.items()
    }
    by_cid: dict = {}
    for (cid, w), t in tf.items():
        by_cid.setdefault(cid, []).append((w, t, t * idf[w]))
    rows = []
    for cid, terms in by_cid.items():
        terms.sort(key=lambda x: (-x[2], x[0]))
        for rank, (w, t, sc) in enumerate(terms[:3], start=1):
            rows.append((cid, w, t, sc, rank))
    return pd.DataFrame(
        rows, columns=["cluster_id", "term", "tf", "score", "rank"]
    ).astype(
        {"cluster_id": "int64", "term": "object", "tf": "int64",
         "score": "float64", "rank": "int64"}
    )


def _route_stream_accumulated(spark, sf_dir: str):
    """Run `kmeans_route_stream` over a 3-micro-batch file feed of the
    vec_id % 7 == 3 slice (the sf1 end-state oracle's feed recipe,
    tests/test_offline_oracles.py) and return the ACCUMULATED end
    state — shaped like the batch ops so main()'s compare loop can
    hash it against replay_route. Lands the sf10 rung of the
    route-stream decade ladder (VERDICT r11 item 5): the DuckDB
    training twin is measured-infeasible at sf10 (48 GB OOM on the
    n x k cross join, SF10_PARITY exclusion note), so the decade is
    verified via the SAME numpy+decimal replay that pins ann10 there."""
    import tempfile

    from pyspark.sql import functions as F

    from maggy_spark.streaming import kmeans_route_stream

    base = tempfile.mkdtemp(prefix="maggy_route_replay_")
    feed, out, ck = f"{base}/feed", f"{base}/out", f"{base}/ck"
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") % 7 == 3)
        .select(
            F.col("vec_id").alias("query_id"),
            "embedding",
            F.timestamp_micros(F.lit(0)).alias("ts"),
        )
        .repartition(3)  # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite")
        .parquet(feed)
    )
    stream = (
        spark.readStream.schema("query_id bigint, embedding array<float>, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed)
    )

    def sink(bdf, _bid):
        bdf.drop("ts").write.mode("append").parquet(out)

    q = (
        kmeans_route_stream(stream, spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(1800)
    return spark.read.parquet(out).select("query_id", "cluster_id", "cosine")


def replay_route(sf_dir: str) -> pd.DataFrame:
    """Numpy twin of the router's end state: replay-train the
    centroids (bit-equal to Spark's, as replay_ann10 pins), then
    assign the vec_id % 7 == 3 feed slice with the same fold/argmax
    chain — routing IS the assignment pass applied to the feed."""
    ids, E = _load_embeddings(sf_dir)
    *_, cids, C, cn = replay_kmeans_arrays(ids, E, kmeans_k(len(ids)))
    sel = ids % 7 == 3
    qids, Q = ids[sel], E[sel]
    qn = np.sqrt(fold_self(Q))
    nz = qn > 0  # the stream drops zero-norm queries at the source
    qids, Q, qn = qids[nz], Q[nz], qn[nz]
    cos = fold_dot(Q, C) / (qn[:, None] * cn[None, :])
    j = np.argmax(cos, axis=1)  # first max = lowest cid on ties
    return pd.DataFrame(
        {
            "query_id": qids,
            "cluster_id": cids[j],
            "cosine": cos[np.arange(len(qids)), j],
        }
    )


REPLAYS = {
    "ann10_kmeans_assign": replay_ann10,
    "ann11_semdedup_prune": replay_ann11,
    "ann13_cluster_quality": replay_ann13,
    "ann15_cluster_keywords": replay_ann15,
    "pl15_semantic_sample": replay_pl15,
    "kmeans_route_stream": replay_route,
}


def main() -> int:
    argv = list(sys.argv[1:])
    sf_dir = "/tmp/maggy_sf10"
    if "--dir" in argv:
        i = argv.index("--dir")
        sf_dir = argv[i + 1]
        del argv[i : i + 2]
    names = argv or list(REPLAYS)

    from pyspark.sql import SparkSession

    from maggy_spark.functions import pipeline, similarity
    from tools.check_oracle import compare_frames, to_pandas_spark

    spark_fns = {
        "ann10_kmeans_assign": similarity.ann10_kmeans_assign,
        "ann11_semdedup_prune": similarity.ann11_semdedup_prune,
        "ann13_cluster_quality": similarity.ann13_cluster_quality,
        "ann15_cluster_keywords": similarity.ann15_cluster_keywords,
        "pl15_semantic_sample": pipeline.pl15_semantic_sample,
        "kmeans_route_stream": _route_stream_accumulated,
    }
    spark = (
        SparkSession.builder.master("local[16]")
        .appName("kmeans-replay")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    path = REPO / "KM_REPLAY_PARITY.json"
    results = json.loads(path.read_text()) if path.exists() else {}
    failures = []
    for name in names:
        t0 = time.time()
        try:
            sdf = spark_fns[name](spark, sf_dir)
            spark_pd = to_pandas_spark(sdf)
            oracle_pd = REPLAYS[name](sf_dir)
            status = compare_frames(sdf, spark_pd, oracle_pd)
        except Exception as e:  # noqa: BLE001 - sweep must report, not die
            status, spark_pd = [f"error: {e}"], []
        ok = not status
        results[f"{Path(sf_dir.rstrip('/')).name}:{name}"] = {
            "match": ok,
            "rows": len(spark_pd),
            "secs": round(time.time() - t0, 1),
            "oracle": "numpy+decimal-replay",
            "detail": "; ".join(status) if status else None,
        }
        print(("ok   " if ok else "FAIL ") + f"{name}: "
              + ("MATCH" if ok else "; ".join(status))
              + f" ({len(spark_pd)} rows, {time.time()-t0:.1f}s)", flush=True)
        if not ok:
            failures.append(name)
    path.write_text(json.dumps(results, indent=2))
    spark.stop()
    print(f"\n{len(failures)} failures / {len(names)} swept")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
