"""Append one extra decade of scaling rows for the CHEAP operator
families (VERDICT r10 item 5: extend the measured ladder to sf10 =
500k docs / 200k vecs / 10M events, 1000x gate scale).

Row shapes mirror tools/scaling_probe.py exactly (same op names, same
structural metrics) so growth reads off SCALING_DATA.json decade over
decade. The dd7 pair-graph family (dd7/dd10/dd14/pl13) is
deliberately ABSENT here: the synthetic word-soup corpus concentrates
SimHash signatures, so its banded candidate volume is super-linear in
n by construction (sf1 already measured 324M candidates at 50k docs)
— at 500k docs the candidate stream is ~10^10 pairs, which is a
property of the adversarial fixture, not of the operator (natural
corpora spread; SCALING.md discusses this since round 5). Everything
window-hash / LUT / broadcast-model shaped runs.

Usage:
    python tools/scaling_rows.py [--dir /tmp/maggy_sf10] [--sf-label 10(synth)]
                                 [--out SCALING_DATA.json]

Appends (not overwrites) one JSON line per op to --out and prints
each line to stdout.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> None:
    argv = list(sys.argv[1:])

    def flag(name: str, default: str) -> str:
        if name in argv:
            i = argv.index(name)
            v = argv[i + 1]
            del argv[i : i + 2]
            return v
        return default

    sf_dir = flag("--dir", "/tmp/maggy_sf10")
    sf = flag("--sf-label", "10(synth)")
    out_path = flag("--out", str(REPO / "SCALING_DATA.json"))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("maggy-spark-scaling-rows")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions import dedup, similarity
    from maggy_spark.functions.dedup import (
        SPAN_W,
        _span_windows,
        dd3_lsh_candidate_pairs,
        dd16_span_removal_plan,
        dd17_apply_removal_plan,
        dd13_span_dedup,
    )
    from maggy_spark.functions.pipeline import (
        SHUFFLE_EPOCHS,
        pl9_epoch_shuffle_plan,
        pl14_curriculum_order,
    )
    from maggy_spark.functions.text import (
        BIGRAM_VOCAB,
        DSIR_BUCKETS,
        _bigram_counts,
        _dsir_bucketed,
        bpe_encode,
        bpe_train,
        tx10_unigram_logprob,
        tx11_source_drift,
        tx13_bpe_pair_stats,
        tx14_bigram_logprob,
        tx15_dsir_score,
    )
    from maggy_spark.operators.events import ev11_volume_anomaly
    from maggy_spark.plans.fixtures import corpus_count, load_events, load_table

    n_docs = corpus_count(spark, sf_dir, "documents")
    n_vecs = corpus_count(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.col("text"), " ")
    tok_rows = int(d.select(F.sum(F.size(toks))).collect()[0][0])
    vocab_actual = int(d.select(F.explode(toks).alias("t")).select("t").distinct().count())

    rows: list[dict] = []

    def timed(fn):
        t0 = time.time()
        out = fn().count()
        return out, round(time.time() - t0, 2)

    def pairs_in_buckets(df, key_col: str) -> int:
        return int(
            df.groupBy(key_col)
            .count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
            .collect()[0]["p"]
            or 0
        )

    def emit(row: dict) -> None:
        rows.append(row)
        print(json.dumps(row), flush=True)
        spark.catalog.clearCache()

    # --- dd13 / dd16 / dd17: the window-hash span family ------------------
    win_rows = int(_span_windows(d, SPAN_W).count())
    out, sec = timed(lambda: dd13_span_dedup(spark, sf_dir))
    emit({"op": "dd13_span_dedup", "sf": sf, "n": n_docs,
          "params": {"window": SPAN_W}, "window_rows": win_rows,
          "windows_per_doc": round(win_rows / n_docs, 2), "output": out, "sec": sec})
    out, sec = timed(lambda: dd16_span_removal_plan(spark, sf_dir))
    emit({"op": "dd16_span_removal_plan", "sf": sf, "n": n_docs,
          "params": {"w": SPAN_W}, "cut_spans": out, "output": out, "sec": sec})
    out, sec = timed(lambda: dd17_apply_removal_plan(spark, sf_dir))
    emit({"op": "dd17_apply_removal_plan", "sf": sf, "n": n_docs,
          "params": {"w": SPAN_W}, "output": out, "sec": sec})

    # --- dd3: MinHash banded candidates (geometry is corpus-derived) ------
    mb, mr = dedup.minhash_geometry(n_docs)
    bands = dedup._band_keys(dedup.dd2_minhash_signature(spark, sf_dir), mb, mr)
    cand = pairs_in_buckets(bands, "band_key")
    out, sec = timed(lambda: dd3_lsh_candidate_pairs(spark, sf_dir))
    emit({"op": "dd3_lsh_candidate_pairs", "sf": sf, "n": n_docs,
          "params": {"bands": mb, "rows": mr}, "candidates": cand,
          "cand_per_doc": round(cand / n_docs, 2), "output": out,
          "recall_at_threshold": None, "n_true_pairs": None, "sec": sec})

    # --- tx10 / tx11 / tx13 / tx14 / tx15: broadcast-model text family ----
    out, sec = timed(lambda: tx10_unigram_logprob(spark, sf_dir))
    emit({"op": "tx10_unigram_logprob", "sf": sf, "n": n_docs,
          "params": {"vocab_cap": 4096, "vocab_actual": vocab_actual},
          "token_rows": tok_rows, "tokens_per_doc": round(tok_rows / n_docs, 2),
          "output": out, "sec": sec})
    out, sec = timed(lambda: tx11_source_drift(spark, sf_dir))
    st = d.select("source", F.explode(toks).alias("t")).groupBy("source", "t").count()
    st_rows = st.count()
    n_sources = int(st.select(F.count_distinct("source")).collect()[0][0])
    emit({"op": "tx11_source_drift", "sf": sf, "n": n_docs,
          "params": {"n_sources": n_sources, "vocab_actual": vocab_actual},
          "st_rows": int(st_rows), "st_rows_per_token": round(st_rows / tok_rows, 4),
          "max_token_partition_rows": n_sources, "output": out, "sec": sec})
    out, sec = timed(lambda: tx13_bpe_pair_stats(spark, sf_dir))
    pair_keys = int(
        d.select(F.explode(toks).alias("t"))
        .where(F.length("t") >= 2)
        .select(F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"), "t")
        .select(F.col("t").substr(F.col("i"), F.lit(2)).alias("p"))
        .distinct()
        .count()
    )
    emit({"op": "tx13_bpe_pair_stats", "sf": sf, "n": n_docs,
          "params": {"vocab_rows": vocab_actual},
          "vocab_per_token_occurrence": round(vocab_actual / tok_rows, 4),
          "distinct_pair_keys": pair_keys, "output": out, "sec": sec})
    out, sec = timed(lambda: tx14_bigram_logprob(spark, sf_dir))
    bigram_keys = _bigram_counts(spark, sf_dir).count()
    emit({"op": "tx14_bigram_logprob", "sf": sf, "n": n_docs,
          "params": {"vocab_cap": BIGRAM_VOCAB}, "distinct_bigram_keys": int(bigram_keys),
          "broadcast_rows": int(min(bigram_keys, BIGRAM_VOCAB)), "output": out, "sec": sec})
    out, sec = timed(lambda: tx15_dsir_score(spark, sf_dir))
    model_rows = _dsir_bucketed(spark, sf_dir, DSIR_BUCKETS).select("b").distinct().count()
    emit({"op": "tx15_dsir_score", "sf": sf, "n": n_docs,
          "params": {"buckets": DSIR_BUCKETS}, "model_rows": int(model_rows),
          "output": out, "sec": sec})

    # --- pl9 / pl14: epoch ordering -------------------------------------
    shards = max(8, n_docs // 1000)
    t0 = time.time()
    plan_df = pl9_epoch_shuffle_plan(spark, sf_dir, shards=shards)
    out = plan_df.count()
    sec = round(time.time() - t0, 2)
    max_part = plan_df.groupBy("epoch", "shard").count().agg(F.max("count")).collect()[0][0]
    emit({"op": "pl9_epoch_shuffle_plan", "sf": sf, "n": n_docs,
          "params": {"epochs": SHUFFLE_EPOCHS, "shards": int(shards)},
          "max_window_partition_rows": int(max_part), "output": out, "sec": sec})
    t0 = time.time()
    pl14_df = pl14_curriculum_order(spark, sf_dir, shards=shards)
    out = pl14_df.count()
    sec = round(time.time() - t0, 2)
    max_part14 = pl14_df.groupBy("epoch", "shard").count().agg(F.max("count")).collect()[0][0]
    emit({"op": "pl14_curriculum_order", "sf": sf, "n": n_docs,
          "params": {"epochs": SHUFFLE_EPOCHS, "shards": int(shards)},
          "max_window_partition_rows": int(max_part14), "output": out, "sec": sec})

    # --- ev11: volume anomaly over 10M events ----------------------------
    ev = load_events(spark, sf_dir)
    n_events = ev.count()
    out, sec = timed(lambda: ev11_volume_anomaly(spark, sf_dir))
    n_types = int(ev.select(F.count_distinct("event_type")).collect()[0][0])
    emit({"op": "ev11_volume_anomaly", "sf": sf, "n": n_events,
          "params": {"n_types": n_types}, "daily_rows": out,
          "rows_per_event": round(out / n_events, 6),
          "max_window_partition_rows": out // n_types, "output": out, "sec": sec})

    # --- ann4 + the compression ladder (ann7/ann8/ann9) -------------------
    npl = similarity.ann_planes(n_vecs, similarity.TARGET_BUCKET_PAIR_VECS)
    bk = similarity._with_buckets(spark, sf_dir, similarity.TARGET_BUCKET_PAIR_VECS)
    cand = pairs_in_buckets(bk.select("bucket"), "bucket")
    out, sec = timed(lambda: similarity.ann4_embedding_near_dup(spark, sf_dir))
    emit({"op": "ann4_embedding_near_dup", "sf": sf, "n": n_vecs,
          "params": {"planes": npl}, "candidates": cand,
          "cand_per_vec": round(cand / n_vecs, 2), "output": out, "sec": sec})
    out, sec = timed(lambda: similarity.ann7_quantized_rerank(spark, sf_dir))
    emit({"op": "ann7_quantized_rerank", "sf": sf, "n": n_vecs,
          "params": {"candidates": similarity.SQ_CANDIDATES, "k": similarity.TOP_K},
          "exact_rerank_rows": similarity.SQ_CANDIDATES * similarity.N_QUERIES,
          "output": out, "sec": sec})
    out, sec = timed(lambda: similarity.ann8_ivf_quantized(spark, sf_dir))
    n_lists = load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    emit({"op": "ann8_ivf_quantized", "sf": sf, "n": n_vecs,
          "params": {"nprobe": similarity.ANN8_NPROBE, "n_lists": int(n_lists),
                     "candidates": similarity.SQ_CANDIDATES, "k": similarity.TOP_K},
          "coarse_fraction": round(similarity.ANN8_NPROBE / n_lists, 3),
          "exact_rerank_rows": similarity.SQ_CANDIDATES * similarity.N_QUERIES,
          "output": out, "sec": sec})
    out, sec = timed(lambda: similarity.ann9_pq_adc(spark, sf_dir))
    emit({"op": "ann9_pq_adc", "sf": sf, "n": n_vecs,
          "params": {"m": similarity.PQ_M, "k_centroids": similarity.PQ_K,
                     "candidates": similarity.PQ_CANDIDATES, "k": similarity.TOP_K},
          "code_bytes_per_vec": similarity.PQ_M,
          "exact_rerank_rows": similarity.PQ_CANDIDATES * similarity.N_QUERIES,
          "output": out, "sec": sec})

    # --- the k-means curation family (new r11) ---------------------------
    km_k = similarity.kmeans_k(n_vecs)
    out, sec = timed(lambda: similarity.ann10_kmeans_assign(spark, sf_dir))
    emit({"op": "ann10_kmeans_assign", "sf": sf, "n": n_vecs,
          "params": {"k": km_k, "iters": similarity.KM_ITERS,
                     "target_cluster": similarity.KM_TARGET_VECS},
          "scored_rows_per_pass": n_vecs * km_k,
          "output": out, "sec": sec})
    out, sec = timed(lambda: similarity.ann11_semdedup_prune(spark, sf_dir))
    emit({"op": "ann11_semdedup_prune", "sf": sf, "n": n_vecs,
          "params": {"tau": similarity.KM_SEM_TAU, "k": km_k},
          "output": out, "sec": sec})
    from maggy_spark.functions.pipeline import pl15_semantic_sample

    out, sec = timed(lambda: pl15_semantic_sample(spark, sf_dir))
    emit({"op": "pl15_semantic_sample", "sf": sf, "n": n_vecs,
          "params": {"share": 0.5, "k": km_k},
          "output": out, "sec": sec})

    # --- the distributed BPE loop ----------------------------------------
    n_merges = 20
    t0 = time.time()
    merges = bpe_train(spark, sf_dir, n_merges=n_merges)
    train_sec = round(time.time() - t0, 2)
    t0 = time.time()
    enc_out = bpe_encode(spark, sf_dir, merges).count()
    enc_sec = round(time.time() - t0, 2)
    emit({"op": "bpe_train", "sf": sf, "n": n_docs,
          "params": {"n_merges": n_merges, "vocab_rows": vocab_actual},
          "sec_per_round": round(train_sec / n_merges, 3),
          "output": len(merges), "sec": train_sec})
    emit({"op": "bpe_encode", "sf": sf, "n": n_docs,
          "params": {"n_merges": len(merges)}, "token_rows": tok_rows,
          "output": enc_out, "sec": enc_sec})

    with open(out_path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"appended {len(rows)} rows to {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
