"""Measure how the LSH blocking actually scales across the three
available data decades (sf0.001 / sf0.01 / sf0.1).

For each blocked pair operator we record, per scale factor:
- n: corpus size,
- params: the derived blocking geometry (band bits / plane count),
- candidates: pair volume the blocking admits to verification
  (sum over blocking keys of C(bucket_size, 2) — counted with one
  aggregation, no join),
- output: rows the operator returns,
- sec: wall time of the full operator (noop sink, end-to-end).

The claim under test (round-1 verdict, "fixed LSH blocking
constants"): with corpus-derived geometry, candidates-per-document
should stay ~flat as the corpus grows 10x, instead of growing
linearly (quadratic total). Output pairs are NOT bounded by blocking:
dd7 has exact recall, so its output is the true number of near-dup
pairs in the data, whatever that is.

Usage: python tools/scaling_probe.py [out.json] [--sf1]
Writes one JSON line per (operator, sf) and a summary to stdout.

``--sf1`` appends a fourth, SELF-GENERATED decade (50k docs / 20k
vectors, tools/synth_scale.py — same observed generator recipe as the
driver's tables, written to /tmp/maggy_sf1) so the flat-work claim is
measured across 100x rather than extrapolated from 3 decades. The
dd3 recall-vs-dd4 ground truth is skipped above RECALL_MAX_N docs:
dd4 is the deliberately-quadratic exact baseline (Σf² shingle pairs)
and at 50k word-soup docs its pair volume is ~100x the sf0.1 run —
the probe's job there is the blocked operators' own work profile.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
RECALL_MAX_N = 10_000


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    sf_dirs = list(SF_DIRS)
    if "--sf1" in sys.argv:
        from tools.synth_scale import ensure_scale_dir

        sf_dirs.append(ensure_scale_dir())

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("maggy-spark-scaling-probe")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark.functions import dedup, similarity
    from maggy_spark.plans.fixtures import corpus_count, load_table

    def pairs_in_buckets(df, key_col: str) -> int:
        """sum over keys of C(sz, 2): candidate pairs the blocking admits."""
        return (
            df.groupBy(key_col)
            .count()
            .select(F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("p"))
            .collect()[0]["p"]
            or 0
        )

    rows = []
    for sf_dir in sf_dirs:
        sf = "1.0(synth)" if "maggy_sf1" in sf_dir else sf_dir.rsplit("sf", 1)[-1]
        n_docs = corpus_count(spark, sf_dir, "documents")
        n_vecs = corpus_count(spark, sf_dir, "embeddings")

        # --- dd7: SimHash banded near-dup --------------------------------
        b = dedup.simhash_band_bits(n_docs)
        sig = dedup.dd6_simhash(spark, sf_dir).select("doc_id", "simhash")
        bands = sig.select(
            F.explode(
                F.array(
                    *[
                        F.concat(F.lit(f"{i}:"), F.substring("simhash", i * b + 1, b))
                        for i in range(dedup.SIMHASH_BANDS)
                    ]
                )
            ).alias("band_key")
        )
        cand = int(pairs_in_buckets(bands, "band_key"))
        t0 = time.time()
        out_df = dedup.dd7_simhash_near_dup(spark, sf_dir)
        out = out_df.count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd7_simhash_near_dup",
                "sf": sf,
                "n": n_docs,
                "params": {"band_bits": b, "bands": dedup.SIMHASH_BANDS},
                "candidates": cand,
                "cand_per_doc": round(cand / n_docs, 2),
                "output": out,
                "sec": sec,
            }
        )

        # --- ann4: sign-LSH bucketed near-dup ----------------------------
        npl = similarity.ann_planes(n_vecs, similarity.TARGET_BUCKET_PAIR_VECS)
        bk = similarity._with_buckets(spark, sf_dir, similarity.TARGET_BUCKET_PAIR_VECS)
        cand = int(pairs_in_buckets(bk.select("bucket"), "bucket"))
        t0 = time.time()
        out = similarity.ann4_embedding_near_dup(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "ann4_embedding_near_dup",
                "sf": sf,
                "n": n_vecs,
                "params": {"planes": npl},
                "candidates": cand,
                "cand_per_vec": round(cand / n_vecs, 2),
                "output": out,
                "sec": sec,
            }
        )

        # --- dd3: MinHash banded candidates ------------------------------
        mb, mr = dedup.minhash_geometry(n_docs)
        bands = dedup._band_keys(dedup.dd2_minhash_signature(spark, sf_dir), mb, mr)
        cand = int(pairs_in_buckets(bands, "band_key"))
        # timing measures the distributed operator (count), matching
        # every other probe row — NOT a driver-side collect
        t0 = time.time()
        out_count = dedup.dd3_lsh_candidate_pairs(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        # recall against dd4's exact-jaccard ground truth at the
        # near-dup threshold (the quantity the geometry targets),
        # computed OUTSIDE the timed region as a distributed anti-join
        # count so the probe itself scales past the local SFs; skipped
        # above RECALL_MAX_N because dd4 is the deliberately-quadratic
        # exact baseline, not part of the blocked operators' scaling
        if n_docs <= RECALL_MAX_N:
            truth = dedup.dd4_ngram_jaccard(spark, sf_dir).where(
                F.col("jaccard") >= dedup.NEAR_DUP_JACCARD
            ).select("doc_a", "doc_b")
            n_truth = truth.count()
            n_missed = truth.join(
                dedup.dd3_lsh_candidate_pairs(spark, sf_dir), ["doc_a", "doc_b"], "left_anti"
            ).count()
            recall = round((n_truth - n_missed) / n_truth, 3) if n_truth else None
        else:
            n_truth, recall = None, None
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd3_lsh_candidate_pairs",
                "sf": sf,
                "n": n_docs,
                "params": {"bands": mb, "rows": mr},
                "candidates": cand,
                "cand_per_doc": round(cand / n_docs, 2),
                "output": out_count,
                "recall_at_threshold": recall,
                "n_true_pairs": n_truth,
                "sec": sec,
            }
        )

        # --- dd13: duplicated-span mass (windowed hashes) ----------------
        # per-doc work is the window count (~n_tokens rows/doc); the
        # scale hazard a suffix-array/self-join formulation would have
        # is pair blowup on viral spans — dd13's groupBy+HAVING costs
        # ROWS per occurrence, so rows/doc flat == linear total work
        from maggy_spark.functions.dedup import SPAN_W
        from maggy_spark.plans.fixtures import load_table as _lt

        d = _lt(spark, sf_dir, "documents", fan_out=True)
        toks = F.split(F.col("text"), " ")
        n_windows = (
            d.select(F.greatest(F.size(toks) - (SPAN_W - 1), F.lit(0)).alias("w"))
            .agg(F.sum("w"))
            .collect()[0][0]
        )
        t0 = time.time()
        out = dedup.dd13_span_dedup(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd13_span_dedup",
                "sf": sf,
                "n": n_docs,
                "params": {"window": SPAN_W},
                "window_rows": int(n_windows),
                "windows_per_doc": round(n_windows / n_docs, 2),
                "output": out,
                "sec": sec,
            }
        )

        # --- tx10: unigram-LM log-prob (broadcast capped vocab) ----------
        # per-doc work is the token count; the model side must stay
        # TINY (capped vocab broadcast) no matter the corpus — a
        # growing model relation would eventually force the Zipf-
        # skewed token key into a shuffle join
        from maggy_spark.functions.text import UNIGRAM_VOCAB, tx10_unigram_logprob

        tok_rows = (
            d.select(F.size(toks).alias("n")).agg(F.sum("n")).collect()[0][0]
        )
        vocab_actual = (
            d.select(F.explode(toks).alias("t")).agg(F.count_distinct("t")).collect()[0][0]
        )
        t0 = time.time()
        out = tx10_unigram_logprob(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "tx10_unigram_logprob",
                "sf": sf,
                "n": n_docs,
                "params": {"vocab_cap": UNIGRAM_VOCAB, "vocab_actual": int(vocab_actual)},
                "token_rows": int(tok_rows),
                "tokens_per_doc": round(tok_rows / n_docs, 2),
                "output": out,
                "sec": sec,
            }
        )

        # --- dd14: cluster survivor selection (r8) ------------------------
        # the scale hazard is the giant near-dup component: a window
        # over partitionBy(cluster_rep) would funnel it through one
        # task, while dd14's groupBy+max(struct) pre-reduces it
        # map-side — so wall time must track n, not max_cluster_size
        t0 = time.time()
        dd14_df = dedup.dd14_cluster_representatives(spark, sf_dir)
        out = dd14_df.count()
        sec = round(time.time() - t0, 2)
        cstats = dd14_df.agg(
            F.count_distinct("cluster_rep").alias("nc"), F.max("cluster_size").alias("mx")
        ).collect()[0]
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd14_cluster_representatives",
                "sf": sf,
                "n": n_docs,
                "params": {"n_clusters": int(cstats.nc)},
                "max_cluster_size": int(cstats.mx),
                "giant_frac": round(cstats.mx / n_docs, 3),
                "output": out,
                "sec": sec,
            }
        )

        # --- pl9: epoch-shuffle plan (r8) ---------------------------------
        # per-shard position windows, never a global sort: with shards
        # scaled ~n/1000 (the production knob — shards track output
        # files), the max rows any window partition orders stays flat
        # across decades; plan rows grow exactly epochs*n
        from maggy_spark.functions.pipeline import SHUFFLE_EPOCHS, pl9_epoch_shuffle_plan

        shards = max(8, n_docs // 1000)
        t0 = time.time()
        plan_df = pl9_epoch_shuffle_plan(spark, sf_dir, shards=shards)
        out = plan_df.count()
        sec = round(time.time() - t0, 2)
        max_part = (
            plan_df.groupBy("epoch", "shard").count().agg(F.max("count")).collect()[0][0]
        )
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "pl9_epoch_shuffle_plan",
                "sf": sf,
                "n": n_docs,
                "params": {"epochs": SHUFFLE_EPOCHS, "shards": int(shards)},
                "max_window_partition_rows": int(max_part),
                "output": out,
                "sec": sec,
            }
        )

        # --- tx11: per-source drift KL (r8) -------------------------------
        # marginals are windows over the (source, token) PRE-AGGREGATE:
        # the per-token partition holds at most |sources| rows and the
        # per-source partition at most |vocab| rows — both bounded, so
        # the windowed relation (st_rows) grows with the vocab, not
        # with corpus token volume
        from maggy_spark.functions.text import tx11_source_drift

        t0 = time.time()
        out = tx11_source_drift(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        st = (
            d.select("source", F.explode(toks).alias("t"))
            .groupBy("source", "t")
            .count()
        )
        st_rows = st.count()
        n_sources = int(st.select(F.count_distinct("source")).collect()[0][0])
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "tx11_source_drift",
                "sf": sf,
                "n": n_docs,
                "params": {"n_sources": n_sources, "vocab_actual": int(vocab_actual)},
                "st_rows": int(st_rows),
                "st_rows_per_token": round(st_rows / tok_rows, 4),
                "max_token_partition_rows": n_sources,
                "output": out,
                "sec": sec,
            }
        )

        # --- pl13: the composed corpus build (r8) -------------------------
        # end-to-end wall of the full filter -> dedup -> decontaminate ->
        # split -> pack -> shuffle lineage with COLD seams (session
        # cache invalidated): the number a platform team budgets a
        # corpus build by. The per-stage survivor ledger comes along
        # for free and shows the stage survivors stay proportionate
        # across decades (the dedup stages dominate on this
        # duplicate-heavy synthetic corpus by design).
        from maggy_spark.functions.pipeline import pl13_full_corpus_build
        from maggy_spark.plans.fixtures import invalidate_session_cache

        invalidate_session_cache(spark)
        t0 = time.time()
        ledger = {r["stage"]: (r["n_docs"], r["n_tokens"])
                  for r in pl13_full_corpus_build(spark, sf_dir).collect()
                  for r in [r.asDict()]}
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "pl13_full_corpus_build",
                "sf": sf,
                "n": n_docs,
                "params": {},
                "survivors": {k: v[0] for k, v in ledger.items()},
                "train_tokens": ledger.get("split:train", (0, 0))[1],
                "output": len(ledger),
                "sec": sec,
            }
        )

        # --- tx13: BPE merge-pair stats (r8 cont.) ------------------------
        # the BPE trick under measurement: corpus token OCCURRENCES
        # collapse to |vocab| rows before any character work, so the
        # per-decade character explode touches vocab_rows, not
        # tok_rows, and the pair groupBy key space is bounded by the
        # charset² regardless of corpus size
        from maggy_spark.functions.text import tx13_bpe_pair_stats

        t0 = time.time()
        out = tx13_bpe_pair_stats(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        pair_keys = int(
            d.select(F.explode(toks).alias("t"))
            .where(F.length("t") >= 2)
            .select(F.explode(F.sequence(F.lit(1), F.length("t") - 1)).alias("i"), "t")
            .select(F.col("t").substr(F.col("i"), F.lit(2)).alias("p"))
            .distinct()
            .count()
        )
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "tx13_bpe_pair_stats",
                "sf": sf,
                "n": n_docs,
                "params": {"vocab_rows": int(vocab_actual)},
                "vocab_per_token_occurrence": round(vocab_actual / tok_rows, 4),
                "distinct_pair_keys": pair_keys,
                "output": out,
                "sec": sec,
            }
        )

        # --- tx14: bigram LM score (r8 cont.) -----------------------------
        # the claim: the model's broadcast side is CAPPED (vocab_size
        # bigrams) while the corpus's distinct bigram key space grows —
        # scoring stays a broadcast join at every decade, and per-doc
        # work is flat
        from maggy_spark.functions.text import BIGRAM_VOCAB, _bigram_counts, tx14_bigram_logprob

        t0 = time.time()
        out = tx14_bigram_logprob(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        bigram_keys = _bigram_counts(spark, sf_dir).count()
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "tx14_bigram_logprob",
                "sf": sf,
                "n": n_docs,
                "params": {"vocab_cap": BIGRAM_VOCAB},
                "distinct_bigram_keys": int(bigram_keys),
                "broadcast_rows": int(min(bigram_keys, BIGRAM_VOCAB)),
                "output": out,
                "sec": sec,
            }
        )

        # --- ann7: int8 SQ coarse + exact rerank (r8 cont.) ---------------
        # the claim: the coarse pass streams the 4x-smaller int8
        # corpus (linear, like any scan) while the EXACT float work is
        # pinned at C x |queries| rows regardless of corpus size — the
        # rerank fetch is the constant-size tail of the pipeline
        t0 = time.time()
        out = similarity.ann7_quantized_rerank(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "ann7_quantized_rerank",
                "sf": sf,
                "n": n_vecs,
                "params": {"candidates": similarity.SQ_CANDIDATES, "k": similarity.TOP_K},
                "exact_rerank_rows": similarity.SQ_CANDIDATES * similarity.N_QUERIES,
                "output": out,
                "sec": sec,
            }
        )

        # --- ann8: IVF + SQ + exact rerank (r9) ----------------------------
        # the inverted-file claim: the coarse pass scores only the
        # probed lists (nprobe/|lists| of the int8 store) instead of
        # the whole corpus — scored_rows/n must sit near nprobe/|lists|
        # at every decade while the exact rerank stays pinned at
        # C x |queries| rows
        t0 = time.time()
        out = similarity.ann8_ivf_quantized(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        emb = load_table(spark, sf_dir, "embeddings")
        n_lists = emb.select("label").distinct().count()
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "ann8_ivf_quantized",
                "sf": sf,
                "n": n_vecs,
                "params": {
                    "nprobe": similarity.ANN8_NPROBE,
                    "n_lists": int(n_lists),
                    "candidates": similarity.SQ_CANDIDATES,
                    "k": similarity.TOP_K,
                },
                "coarse_fraction": round(similarity.ANN8_NPROBE / n_lists, 3),
                "exact_rerank_rows": similarity.SQ_CANDIDATES * similarity.N_QUERIES,
                "output": out,
                "sec": sec,
            }
        )

        # --- ann9: product quantization + ADC (r10) ------------------------
        # the claim: the coarse pass streams the 8-byte code store
        # (32x smaller than float32) against broadcast per-query LUTs
        # (PQ_M x PQ_K doubles each), the code-store build is one
        # shuffle-free map with literal codebooks, and the EXACT float
        # work stays pinned at C x |queries| rows at every decade
        t0 = time.time()
        out = similarity.ann9_pq_adc(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "ann9_pq_adc",
                "sf": sf,
                "n": n_vecs,
                "params": {
                    "m": similarity.PQ_M,
                    "k_centroids": similarity.PQ_K,
                    "candidates": similarity.PQ_CANDIDATES,
                    "k": similarity.TOP_K,
                },
                "code_bytes_per_vec": similarity.PQ_M,
                "exact_rerank_rows": similarity.PQ_CANDIDATES * similarity.N_QUERIES,
                "output": out,
                "sec": sec,
            }
        )

        # --- tx15: DSIR importance scores (r10) ----------------------------
        # the claim: hashing caps the model at <= DSIR_BUCKETS rows
        # REGARDLESS of vocabulary (the broadcast side is constant
        # across decades), the feature explode is linear, and the
        # per-doc rollup shuffles one decimal + one long per doc after
        # map-side combine
        from maggy_spark.functions.text import (
            DSIR_BUCKETS,
            _dsir_bucketed,
            tx15_dsir_score,
        )

        t0 = time.time()
        out = tx15_dsir_score(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        model_rows = _dsir_bucketed(spark, sf_dir, DSIR_BUCKETS).select("b").distinct().count()
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "tx15_dsir_score",
                "sf": sf,
                "n": n_docs,
                "params": {"buckets": DSIR_BUCKETS},
                "broadcast_model_rows": int(model_rows),
                "output": out,
                "sec": sec,
            }
        )

        # --- dd16: ExactSubstr removal plan (r10, gate row) ----------------
        # the claim: identical shape to dd13 (it rides the SAME
        # session-cached windows relation) — the canonical-occurrence
        # pick is one groupBy on the uniform window hash with
        # partial-aggregating count+min(struct), so windows/doc stays
        # flat and no self-join exists at any decade
        from maggy_spark.functions.dedup import SPAN_W, dd16_span_removal_plan

        t0 = time.time()
        out = dd16_span_removal_plan(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd16_span_removal_plan",
                "sf": sf,
                "n": n_docs,
                "params": {"w": SPAN_W},
                "cut_spans": out,
                "output": out,
                "sec": sec,
            }
        )

        # --- dd17: apply the removal plan (r10) -----------------------------
        # the claim: the rewrite is one per-row array filter with the
        # doc's tiny span array left-joined on doc_id — no positional
        # explode, so wall tracks dd16's plan cost plus a linear map
        from maggy_spark.functions.dedup import dd17_apply_removal_plan

        t0 = time.time()
        out = dd17_apply_removal_plan(spark, sf_dir).count()
        sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "dd17_apply_removal_plan",
                "sf": sf,
                "n": n_docs,
                "params": {"w": SPAN_W},
                "output": out,
                "sec": sec,
            }
        )

        # --- ev11: volume anomaly monitor (r8 cont., probed r9) -----------
        # the claim: one groupBy collapses the feed to |types| x |days|
        # rows MAP-SIDE (partial aggregation on the grouping key), and
        # every window after that orders at most |days| rows per type —
        # so the scored relation is constant-size across decades and
        # wall time tracks the scan, not the window
        from maggy_spark.operators.events import ev11_volume_anomaly
        from maggy_spark.plans.fixtures import load_events

        ev = load_events(spark, sf_dir)
        n_events = ev.count()
        t0 = time.time()
        ev11_df = ev11_volume_anomaly(spark, sf_dir)
        out = ev11_df.count()
        sec = round(time.time() - t0, 2)
        n_types = int(ev.select(F.count_distinct("event_type")).collect()[0][0])
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "ev11_volume_anomaly",
                "sf": sf,
                "n": n_events,
                "params": {"n_types": n_types},
                "daily_rows": out,
                "rows_per_event": round(out / n_events, 6),
                "max_window_partition_rows": out // n_types,
                "output": out,
                "sec": sec,
            }
        )

        # --- pl14: curriculum epoch order (r8 cont., probed r9) -----------
        # pl9's machinery with a map-side quality band prepended to the
        # in-window sort key: banding is fixed arithmetic on the
        # richness score (never a global quantile sort), so the max
        # window partition must match pl9's across decades
        from maggy_spark.functions.pipeline import SHUFFLE_EPOCHS as _EPOCHS
        from maggy_spark.functions.pipeline import pl14_curriculum_order

        t0 = time.time()
        pl14_df = pl14_curriculum_order(spark, sf_dir, shards=shards)
        out = pl14_df.count()
        sec = round(time.time() - t0, 2)
        max_part14 = (
            pl14_df.groupBy("epoch", "shard").count().agg(F.max("count")).collect()[0][0]
        )
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "pl14_curriculum_order",
                "sf": sf,
                "n": n_docs,
                "params": {"epochs": _EPOCHS, "shards": int(shards)},
                "max_window_partition_rows": int(max_part14),
                "output": out,
                "sec": sec,
            }
        )

        # --- bpe_train + bpe_encode: the full distributed BPE loop --------
        # trainer claim: the corpus is scanned once; each of the
        # n_merges rounds touches only the |vocab|-row symbol table, so
        # per-round wall must be FLAT in corpus size (round cost =
        # fixed job latency + vocab-bounded work). encoder claim: the
        # mapInPandas pass is linear in token occurrences with the
        # per-batch word memo bounding Python work by distinct words.
        from maggy_spark.functions.text import bpe_encode, bpe_train

        n_merges = 20
        t0 = time.time()
        merges = bpe_train(spark, sf_dir, n_merges=n_merges)
        train_sec = round(time.time() - t0, 2)
        t0 = time.time()
        enc_out = bpe_encode(spark, sf_dir, merges).count()
        enc_sec = round(time.time() - t0, 2)
        spark.catalog.clearCache()
        rows.append(
            {
                "op": "bpe_train",
                "sf": sf,
                "n": n_docs,
                "params": {"n_merges": n_merges, "vocab_rows": int(vocab_actual)},
                "sec_per_round": round(train_sec / n_merges, 3),
                "output": len(merges),
                "sec": train_sec,
            }
        )
        rows.append(
            {
                "op": "bpe_encode",
                "sf": sf,
                "n": n_docs,
                "params": {"n_merges": len(merges)},
                "token_rows": int(tok_rows),
                "output": enc_out,
                "sec": enc_sec,
            }
        )

    for r in rows:
        print(json.dumps(r))
    outs = [a for a in sys.argv[1:] if not a.startswith("--")]
    if outs:
        Path(outs[0]).write_text("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
