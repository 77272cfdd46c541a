"""Oracle parity for queries NOT in the driver registry.

The driver's correctness gate checks only the first 50 registry
entries; everything beyond the cap — de-registered supplementary
views (`a8_median_prefix`, `a10b_interim_xy`, `trial_id_golden`,
`ev3_user_metric_history`, and since round 6 `g4_single_run` /
`g10_hyperband_ladder`) and the extension operators (dd9/dd11, ann6,
tx7, pl3-pl6, ev6/ev7) — keeps its Spark-vs-DuckDB parity enforced
here with the same row-count + schema + value-hash compare the
driver uses, at the gate's own sf0.01.
"""

import sys
from pathlib import Path

import duckdb
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.check_oracle import (  # noqa: E402
    TABLES,
    duck_dtypes,
    frame_signature,
    spark_dtypes,
    to_pandas_spark,
)

CASES = [
    ("a8_median_prefix", "A8_SQL", "maggy_spark.operators.aggregations"),
    ("a10b_interim_xy", "A10B_SQL", "maggy_spark.operators.aggregations"),
    ("trial_id_golden", "GOLDEN_SQL", "maggy_spark.operators.generators"),
    ("dd9_decontaminate", "DD9_SQL", "maggy_spark.functions.dedup"),
    ("ev3_user_metric_history", "EV3_SQL", "maggy_spark.operators.events"),
    ("mm5_byte_histogram", "MM5_SQL", "maggy_spark.functions.multimodal"),
    ("ann6_semantic_dedup", "ANN6_SQL", "maggy_spark.functions.similarity"),
    ("dd11_incremental_near_dup", "DD11_SQL", "maggy_spark.functions.dedup"),
    ("tx7_repetition", "TX7_SQL", "maggy_spark.functions.text"),
    ("pl3_token_budget_mix", "PL3_SQL", "maggy_spark.functions.pipeline"),
    ("pl4_filter_funnel", "PL4_SQL", "maggy_spark.functions.pipeline"),
    ("pl5_leakage_split", "PL5_SQL", "maggy_spark.functions.pipeline"),
    ("pl6_fuzzy_leakage_split", "PL6_SQL", "maggy_spark.functions.pipeline"),
    # ev4/ev5 rotated INTO the driver registry round 6; g4/g10 rotated
    # out here (constant relations, logic also pinned by hb1 + tests)
    ("g4_single_run", "G4_SQL", "maggy_spark.operators.generators"),
    ("g10_hyperband_ladder", "G10_SQL", "maggy_spark.operators.generators"),
    ("ev6_trailing_features", "EV6_SQL", "maggy_spark.operators.events"),
    ("ev7_conversion_funnel", "EV7_SQL", "maggy_spark.operators.events"),
    # round-6 additions (dd12 moved INTO the registry via ev1 rotation)
    ("ev1_type_rollup", "EV1_SQL", "maggy_spark.operators.events"),
    ("pl7_sequence_pack_plan", "PL7_SQL", "maggy_spark.functions.pipeline"),
    ("ev8_cohort_retention", "EV8_SQL", "maggy_spark.operators.events"),
    ("mm6_phash_near_dup", "MM6_SQL", "maggy_spark.functions.multimodal"),
    ("tx8_token_zipf", "TX8_SQL", "maggy_spark.functions.text"),
    ("tx9_gopher_quality", "TX9_SQL", "maggy_spark.functions.text"),
    ("pl8_source_mix", "PL8_SQL", "maggy_spark.functions.pipeline"),
    # round-7 rotation: dd13/tx10 moved INTO the registry (high-traffic
    # production passes); dd3/tx6 rotated out here (dd3 is a strict
    # subset of the registered dd8, tx6's shape is subsumed by tx1/tx5)
    ("dd3_lsh_candidate_pairs", "DD3_SQL", "maggy_spark.functions.dedup"),
    ("tx6_regex_tokens", "TX6_SQL", "maggy_spark.functions.text"),
    # round-7 additions (dd14/pl9 rotated INTO the registry round 8)
    ("tx11_source_drift", "TX11_SQL", "maggy_spark.functions.text"),
    ("ev9_conversion_lag", "EV9_SQL", "maggy_spark.operators.events"),
    ("pl10_quality_upsample_plan", "PL10_SQL", "maggy_spark.functions.pipeline"),
    ("ev10_rfm_segments", "EV10_SQL", "maggy_spark.operators.events"),
    ("mm7_container_sniff", "MM7_SQL", "maggy_spark.functions.multimodal"),
    ("k3_shipping_priority", "K3_SQL", "maggy_spark.operators.warehouse"),
    ("k4_local_supplier_volume", "K4_SQL", "maggy_spark.operators.warehouse"),
    ("pl11_chunk_plan", "PL11_SQL", "maggy_spark.functions.pipeline"),
    ("pl12_split_audit", "PL12_SQL", "maggy_spark.functions.pipeline"),
    # round-8 additions: the cross-source duplication matrix and the
    # PII redaction plan (pl13, also new in r8, went straight into the
    # registry — mm2 rotated out here in exchange: it derives entirely
    # from the gate-green mm1 metadata relation)
    ("dd15_cross_source_dup", "DD15_SQL", "maggy_spark.functions.dedup"),
    ("tx12_pii_scan", "TX12_SQL", "maggy_spark.functions.text"),
    ("mm2_frame_sample", "MM2_SQL", "maggy_spark.functions.multimodal"),
    # round-8 rotation: dd14/pl9 moved INTO the registry (survivor
    # selection + epoch ordering are the highest-traffic production
    # steps); t1/t2 rotated out here (trivial expression pairs whose
    # logic test_searchspace.py's transform tests also pin)
    ("t1_minmax_normalize", "T1_SQL", "maggy_spark.operators.transforms"),
    ("t2_inverse_transform", "T2_SQL", "maggy_spark.operators.transforms"),
    # round-8 (cont.) rotation: tx12/tx13 moved INTO the registry (the
    # PII redaction plan and the BPE merge statistics are production
    # passes a corpus build audits; both have full data support at the
    # gate's sf0.01, unlike dd15 whose cross-source dups only appear
    # at sf0.1 — it stays here, where the data has support); a2
    # rotated out (its negation is a literal sub-expression of
    # gate-green a3's y column) and mm3 too (a 3-row rollup of the
    # gate-green mm1 relation — the same argument that rotated mm2
    # out).
    ("a2_direction_normalize", "A2_SQL", "maggy_spark.operators.aggregations"),
    ("mm3_metadata_stats", "MM3_SQL", "maggy_spark.functions.multimodal"),
    # round-9 rotation (pre-declared in COVERAGE.md r8): the three
    # highest-traffic late-r8 operators — tx14 (order-2 LM quality
    # filter), ann7 (serving-tier SQ search), ev11 (feed monitor) —
    # moved INTO the registry; rotated out here: g1 (hash-uniform
    # sampler, a literal sub-expression of gate-green g13), a9 (1-row
    # mean, shape hard-verified by gate-green a1/a4), k2 (join+top-k,
    # strict subset of offline k3's Q3 shape and the gate-green
    # TakeOrderedAndProject family).
    ("g1_random_sample", "G1_SQL", "maggy_spark.operators.generators"),
    ("a9_partition_avg", "A9_SQL", "maggy_spark.operators.aggregations"),
    ("k2_top_customers", "K2_SQL", "maggy_spark.operators.warehouse"),
    # round-9 addition: the composed ingest-gate ledger in its
    # deterministic sf-dir form (store = even doc_ids, feed = odd) —
    # the pl13 three-way-verification discipline applied to the
    # streaming capstone's batch twin: quality + PII + fingerprint
    # probe + SimHash banding at store geometry + theta-join volume
    # scoring + the admit conjunction, all value-hash-checked against
    # DuckDB, not just stream-vs-batch self-consistent.
    # round-9 addition: the full IVF + SQ + exact-rerank serving stack
    # (ann3's medoid routing composed with ann7's quantized scoring,
    # restricted to the probed inverted lists) — deterministic, so the
    # twin replays it bit-for-bit
    # round-9 late rotation (the pre-declared round-10 swap, executed
    # early): ing1/ann8/pl14 moved INTO the registry; rotated out here:
    # ev2 (tz-free day rollup = a literal sub-relation of gate-green
    # ev11's daily CTE), dd2 (the internal first stage of gate-green
    # dd8's pipeline, width pinned by geometry tests), pl2 (hash-quota
    # filter, a sub-expression of the gate-green pl9/pl13 hash family).
    ("ev2_daily_activity", "EV2_SQL", "maggy_spark.operators.events"),
    ("dd2_minhash_signature", "DD2_SQL", "maggy_spark.functions.dedup"),
    ("pl2_stratified_sample", "PL2_SQL", "maggy_spark.functions.pipeline"),
    # round-10 rotation (VERDICT r9 item 2): dd16 (the ExactSubstr
    # removal plan, production complement of gate-green dd13) moved
    # INTO the registry; dd4 rotated out here — its exact-Jaccard
    # verify is the verification stage of gate-green dd8's pipeline
    # and intrinsically Σf² on the dense synthetic vocab.
    ("dd4_ngram_jaccard", "DD4_SQL", "maggy_spark.functions.dedup"),
    # round-11 rotation (second leg, pre-declared in COVERAGE.md r11):
    # ann9_pq_adc moved INTO the registry (the PQ/ADC serving tier);
    # ann7 rotated out here — the gate-green ann8 row with
    # nprobe=|lists| is pinned row-for-row equal to ann7
    # (test_ann8_all_lists_probe_equals_ann7), so its int8-SQ scoring
    # path stays hard-verified through the gate while exact parity
    # continues here at sf0.01.
    ("ann7_quantized_rerank", "ANN7_SQL", "maggy_spark.functions.similarity"),
    # round-12 rotation (pre-declared r11, executed after the
    # zero-norm-centroid fix): ann10 moved INTO the registry; ann5
    # rotated out here — the gate-green ann4 pair relation
    # reconstructs the kNN graph exactly
    # (test_ann5_derivable_from_ann4_pair_relation), so its geometry
    # and scoring path stay hard-verified through the gate while
    # exact parity continues here at sf0.01.
    ("ann5_knn_graph", "ANN5_SQL", "maggy_spark.functions.similarity"),
    # round-11 addition: SemDeDup pruning over ann10's clusters
    # (Abbas et al. 2023; keep-farthest-from-centroid priority)
    ("ann11_semdedup_prune", "ANN11_SQL", "maggy_spark.functions.similarity"),
    # round-11 addition: the selection step AFTER SemDeDup — spread a
    # token budget evenly across ann10's semantic clusters,
    # farthest-from-centroid first (greedy per-cluster prefix)
    ("pl15_semantic_sample", "PL15_SQL", "maggy_spark.functions.pipeline"),
    # round-11 rotation (pre-declared in COVERAGE.md r10): tx15 (DSIR
    # data-selection scorer) and dd17 (the ExactSubstr rewrite) moved
    # INTO the registry; rotated out here: dd6 (the internal first
    # stage of gate-green dd7's banded near-dup pipeline, which
    # recomputes the identical signature relation) and tx4 (its
    # fingerprint expression is a literal sub-expression of the
    # gate-green dd1/dd5 fingerprint family).
    ("dd6_simhash", "DD6_SQL", "maggy_spark.functions.dedup"),
    ("tx4_fingerprint", "TX4_SQL", "maggy_spark.functions.text"),
    # round-11 addition: the media ingest screen — mm6's pHash banding
    # in asymmetric store-probe form (store = even image slice, feed =
    # odd, the ing1 convention) with crafted probe/store payloads
    # UNIONed on both engines for non-vacuity (the tx12/dd15 probe
    # argument). The streaming twin is streaming.phash_alert_stream.
    ("mm8_phash_probe", "MM8_SQL", "maggy_spark.functions.multimodal"),
    # round-13 rotation (pre-declared in VERDICT r12 item 1):
    # ann12_ivfpq_adc and pl16_repeat_schedule moved INTO the registry;
    # rotated out here: ann3 (its medoid routing is a literal sub-stage
    # of gate-green ann8 AND ann12), pl14 (later epochs pinned
    # identical to gate-green pl9 by test_pl14_curriculum_shape, so
    # only the epoch-0 banding is novel).
    ("ann3_ivf_topk", "ANN3_SQL", "maggy_spark.functions.similarity"),
    ("pl14_curriculum_order", "PL14_SQL", "maggy_spark.functions.pipeline"),
    # round-12 addition: dd7's SimHash text candidates re-scored in
    # embedding space (surface near-dups vs template collisions); the
    # sf1 rung inherits dd7's documented DuckDB-twin exclusion (the
    # banded candidate CTE is quadratic per bucket at the synthetic
    # fixture's dup density)
    ("dd18_crossmodal_verify", "DD18_SQL", "maggy_spark.functions.dedup"),
    # round-12 addition: EXACT per-(lang, source) token-count
    # percentiles from a bounded histogram (inverted-CDF order
    # statistic in pure integer arithmetic) — the length-filter
    # calibration relation; convention pinned against numpy
    # inverted_cdf in test_functions.py
    # tx16 rotated INTO the driver registry round 14 (pre-declared);
    # tx1_token_count takes its offline slot (rotated OUT — a literal
    # sub-expression of tx16's histogram input and of tx2/tx10)
    ("tx1_token_count", "TX1_SQL", "maggy_spark.functions.text"),
    # round-12 addition: cluster-quality diagnostics over the trained
    # k-means model (population, worst/best member fit, sub-tau count,
    # nearest-other-centroid separation) — every column an ORDER-FREE
    # aggregate so the relation is oracle-exact without decimal routing
    ("ann13_cluster_quality", "ANN13_SQL", "maggy_spark.functions.similarity"),
    # round-12 addition: the balanced output-shard write manifest —
    # a two-phase distributed prefix sum on Spark, twinned against the
    # naive global-window spelling (the twin is the semantics, the
    # two-phase plan its scale-honest realization); pure integer
    # arithmetic, multi-bucket path pinned in test_functions.py
    # pl17 rotated INTO the driver registry round 14 (pre-declared);
    # pl1_corpus_prep takes its offline slot (rotated OUT — its filter
    # chain is the first three stages of gate-green pl13's ledger)
    ("pl1_corpus_prep", "PL1_SQL", "maggy_spark.functions.pipeline"),
    # round-12 addition: the asymmetric containment screen (Broder's
    # resemblance-vs-containment distinction) — doc-in-doc duplication
    # that symmetric Jaccard misses; the verbatim-inclusion probe pair
    # keeps the containment/jaccard separation non-vacuous (organic
    # tau-passing pairs at gate scale are exact dups)
    ("dd19_containment_screen", "DD19_SQL", "maggy_spark.functions.dedup"),
    # round-12 addition: recall@k of every approximate serving engine
    # (LSH multi-probe / IVF+SQ / IVFPQ) against the exact truth, each
    # at its own serving k — the compression ladder's acceptance gate;
    # pure composition of already-oracled relations, twin composes the
    # same SQL constants verbatim
    ("ann14_recall_eval", "ANN14_SQL", "maggy_spark.functions.similarity"),
    # round-12 addition: exact conversion-lag percentiles per funnel
    # kind — the quantiles ev9's histogram defers, materialized via
    # the tx16 bounded-domain inverted-CDF core over lag MINUTES
    # (integer-exact, ev7/ev9's shared staging chain)
    ("ev12_lag_quantiles", "EV12_SQL", "maggy_spark.operators.events"),
    # round-12 addition: per-doc top-k TF-IDF keywords — integer tf x
    # decimal-blunted ln idf (the tx10/tx15 idiom), no float sums, so
    # every row is engine-exact; the tagging/search relation
    ("tx17_tfidf_keywords", "TX17_SQL", "maggy_spark.functions.text"),
    # round-12 addition: tx17's recipe over ann10's clusters — top-k
    # TF-IDF terms per k-means cluster with idf over CLUSTERS (the
    # Manning et al. cluster-labeling application); the "what is this
    # cluster about" readout next to ann13's diagnostics
    ("ann15_cluster_keywords", "ANN15_SQL", "maggy_spark.functions.similarity"),
    # round-12 addition: precision/recall/F1 of the tx3 lang-ID
    # heuristic vs the corpus labels — the classifier acceptance gate
    # (ann14's eval-relation pattern); NULL precision/f1 for languages
    # never predicted, by design
    ("tx18_langid_eval", "TX18_SQL", "maggy_spark.functions.text"),
    # round-13 rotation second pair (pre-declared in VERDICT r12 item
    # 1): tx19_ccnet_bucket and ann16_mmr_rerank moved INTO the
    # registry; rotated out here: tx5 (shingle explode + count — the
    # first stage of gate-green dd7/dd8 and of tx10's unigram model)
    # and mm1 (the metadata relation gate-history mm2/mm3 derive from;
    # decode plumbing pinned by tests/test_multimodal.py).
    ("tx5_ngram_stats", "TX5_SQL", "maggy_spark.functions.text"),
    ("mm1_decode_metadata", "MM1_SQL", "maggy_spark.functions.multimodal"),
    # round-12 addition: temperature-sampled source mixture
    # (p_i ∝ sqrt(n_i), the XLM-R/mT5 rule) — produces the weights
    # pl3's fixed-weight budgeter consumes
    ("pl18_temperature_mix", "PL18_SQL", "maggy_spark.functions.pipeline"),
    # round-12 addition: first-order Markov transition matrix of user
    # behavior — all (prev_type -> type) flows, row-normalized with
    # exact integer counts (the readout ev7's fixed funnel can't give)
    ("ev13_type_transitions", "EV13_SQL", "maggy_spark.operators.events"),
    # round-12 addition: dd10's component map maintained incrementally
    # (previous star map + dd11's delta probe). The twin is dd10's OWN
    # recursive-closure SQL — the incremental algorithm must reproduce
    # the full rebuild exactly
    ("dd20_incremental_components", "DD10_SQL", "maggy_spark.functions.dedup"),
    # round-12 addition: pl18's temperature mixture REALIZED as a
    # per-doc repeat plan — floor(epochs) copies + one more with
    # probability frac(epochs) via the deterministic md5 uniform
    ("pl19_temperature_apply", "PL19_SQL", "maggy_spark.functions.pipeline"),
    # round-12 addition: the EXISTS/semi-join plan shape (TPC-H Q4
    # adapted to the fixture columns) — late-shipment order counts
    # per priority, tz-free epoch-micros date arithmetic
    ("k5_late_shipment_priority", "K5_SQL", "maggy_spark.operators.warehouse"),
    # round-13 addition (VERDICT r12 item 6): the S10 JSONL ingest's
    # quarantine split, oracled cross-engine — a deterministic fixture
    # (documents + crafted broken lines, one per failure class) read
    # by Spark's PERMISSIVE corrupt-record scan AND DuckDB's native
    # JSON functions over a raw-line read. The clean relation must be
    # exactly the documents table; the report's clean/quarantined/
    # token-mass totals must agree to the row.
    ("s10_jsonl_clean", "S10_CLEAN_SQL", "maggy_spark.sources.jsonl"),
    ("s10_jsonl_report", "S10_REPORT_SQL", "maggy_spark.sources.jsonl"),
    # round-13 addition: the LSH banding S-curve planner — the MMDS
    # ch.3 tuning relation behind every (bands, rows) choice in the
    # dedup family; pow() is libm-divergent cross-engine, so both
    # sides spell s^r and (1-s^r)^b as identical unrolled IEEE
    # multiplication chains (bit-exact, corpus-independent)
    ("dd21_lsh_s_curve", "DD21_SQL", "maggy_spark.functions.dedup"),
    # round-13 addition: per-shard pack-efficiency audit of pl7's
    # plan (tail-window waste + boundary-doc count — the two numbers
    # that price a packing configuration); integer aggregates of the
    # integer plan, twin replays the cumsum spelling
    ("pl20_pack_efficiency", "PL20_SQL", "maggy_spark.functions.pipeline"),
    # round-13 addition: per-(lang, source) tokenizer fertility /
    # compression (Rust et al. 2021) — exact integer masses, two
    # int/int IEEE ratios; the tokenizer acceptance table
    ("tx20_tokenizer_fertility", "TX20_SQL", "maggy_spark.functions.text"),
    # round-13 addition: the two remaining named vector-store serving
    # patterns — filtered search (metadata predicate as an equi-join
    # key BELOW the scoring, broadcast hash join instead of ann1's
    # nested loop) and range search (similarity floor, faiss
    # range_search semantics; output size data-dependent by design)
    ("ann17_filtered_topk", "ANN17_SQL", "maggy_spark.functions.similarity"),
    ("ann18_range_search", "ANN18_SQL", "maggy_spark.functions.similarity"),
    # round-13 addition: deterministic fair source interleave — the
    # stride-balanced dataloader merge; the Spark side computes the
    # global rank as a CLOSED FORM against the broadcast source-count
    # relation (no global-order window), the twin spells the naive
    # global window — the pl17 semantics-vs-realization pattern, so
    # any rank-arithmetic error is a hash mismatch
    ("pl21_fair_interleave", "PL21_SQL", "maggy_spark.functions.pipeline"),
    # round-13 addition: the measured counterpart of dd21's theory —
    # per-decile |minhash-estimated - exact| Jaccard error over the
    # LSH candidate pairs, integer-quantized per row so the rollup is
    # engine-exact; how a deployment validates its (b, r) geometry
    ("dd22_minhash_calibration", "DD22_SQL", "maggy_spark.functions.dedup"),
    # round-13 addition: systematic PPS sampling by token mass
    # (Madow 1949) — n_target equally-spaced points on the pl17
    # two-phase cumulative token line, pure nonnegative integer
    # arithmetic (DuckDB // == Spark DIV there); total hits exactly
    # n_target, the token-budgeted complement of pl2's hash coin
    ("pl22_pps_sample", "PL22_SQL", "maggy_spark.functions.pipeline"),
    # round-13 addition: the HPO evaluation relation — best-so-far
    # regret curve over the finalized trial sequence (running max,
    # improvement flags against the strictly-prior prefix)
    ("a13_regret_curve", "A13_SQL", "maggy_spark.operators.aggregations"),
    # round-13 addition: the PBT exploit/explore generation step
    # (Jaderberg et al. 2017) — bottom quartile adopts top-quartile
    # params, x1.2/x0.8 perturbation on the 52-bit md5 coin; the one
    # classic population controller the reference family lacks
    ("g14_pbt_schedule", "G14_SQL", "maggy_spark.operators.generators"),
    # round-13 addition: ann17's metadata filter pushed INTO the IVF
    # index — with label-partitioned lists the filter selects the
    # list (zero routing, 1/|labels| of the code store scanned); with
    # candidates >= list size it degrades to exactly ann17 (pinned)
    ("ann19_filtered_ivf", "ANN19_SQL", "maggy_spark.functions.similarity"),
    # round-14 addition: filtered IVF where the filter is ORTHOGONAL
    # to the lists (the Filtered-DiskANN / payload-filter problem) —
    # bounded (list x source) histogram drives a selectivity-aware
    # per-query nprobe; n_probed rides the output so the cardinality
    # decision is value-hash-pinned
    ("ann20_selective_filtered_ivf", "ANN20_SQL", "maggy_spark.functions.similarity"),
    # round-14 addition: the nprobe tuning curve (routing recall vs
    # nprobe in one pass — the ANN analogue of dd21/dd22's tuning loop)
    ("ann21_routing_recall_curve", "ANN21_SQL", "maggy_spark.functions.similarity"),
    # round-14 addition: banded eta^2 hyperparameter importance (the
    # fANOVA single-param marginal; exact integer sufficient stats)
    ("a14_param_importance", "A14_SQL", "maggy_spark.operators.aggregations"),
    # round-14 addition: multimodal-aware sequence packing (pl7's
    # cumsum core over text + vision/audio token budgets)
    ("mm9_multimodal_pack_plan", "MM9_SQL", "maggy_spark.functions.multimodal"),
    # round-14 addition: Efraimidis-Spirakis weighted sampling without
    # replacement (exponential race / Gumbel top-k; blunted-ln idiom)
    ("pl23_weighted_sample", "PL23_SQL", "maggy_spark.functions.pipeline"),
    # round-14 addition: per-budget early-stop resource accounting
    ("a15_earlystop_savings", "A15_SQL", "maggy_spark.operators.aggregations"),
    # round-14 addition: per-(eval doc, training source) contamination
    # audit rollup with the dd19-style probe union (non-vacuous by
    # construction)
    ("dd23_contamination_report", "DD23_SQL", "maggy_spark.functions.dedup"),
    # round-14 addition: ev7's ordered funnel inside ev5's session
    # boundaries (conversion within a session)
    ("ev14_session_funnel", "EV14_SQL", "maggy_spark.operators.events"),
    # round-14 addition: one DoReMi exponentiated-gradient domain
    # reweighting step (Xie et al. 2023) over tx19's session-cached
    # unigram cost relation — exact-integer token-weighted losses,
    # blunted-exp update factors, smoothed alphas
    ("pl24_doremi_reweight", "PL24_SQL", "maggy_spark.functions.pipeline"),
    # round-14 addition: incremental IVF store maintenance — frozen
    # model (landed medoid reps + SQ scale), every vector assigned and
    # quantized under it, code pinned via md5 of the canonical int
    # rendering; the in-plan form of the store_build/refresh split
    ("ann22_incremental_store", "ANN22_SQL", "maggy_spark.functions.similarity"),
    # round-14 addition: S11 CSV ingest + quarantine in the
    # quote-disabled delimiter-free-fields dialect — text scan +
    # whole-line from_csv (projection-invariant corrupt channel),
    # DuckDB twin via raw-line read + str_split + try_cast
    ("s11_csv_clean", "S11_CLEAN_SQL", "maggy_spark.sources.csvsrc"),
    ("s11_csv_report", "S11_REPORT_SQL", "maggy_spark.sources.csvsrc"),
]


@pytest.fixture(scope="module")
def sf_dir():
    """De-registered operators keep parity at the SAME scale the
    driver gate checks (sf0.01), not the suite default sf0.001 —
    otherwise rotation out of the registry would silently weaken the
    scale at which an operator is verified."""
    return "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if Path(p).exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    yield con
    con.close()


@pytest.mark.parametrize("name,sql_const,mod_name", CASES)
def test_offline_oracle_parity(spark, sf_dir, duck, name, sql_const, mod_name):
    import importlib

    mod = importlib.import_module(mod_name)
    fn, sql = getattr(mod, name), getattr(mod, sql_const)

    spark_pd = to_pandas_spark(fn(spark, sf_dir))
    duck_pd = duck.execute(sql).fetchdf()

    assert len(spark_pd) == len(duck_pd)
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(fn(spark, sf_dir)) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_dsir_score_stream_end_state_matches_duckdb_twin(spark, sf_dir, duck, tmp_path):
    """Stream end-state oracle (VERDICT r10 item 4): the ing1
    discipline applied to dsir_score_stream — the feed is split
    across MULTIPLE micro-batches, a foreachBatch sink accumulates
    the stream's output into a table, and that accumulated table is
    value-hash-compared against the DuckDB twin (TX15_SQL projected
    to the stream's columns) on the same corpus. This is stronger
    than the existing stream-vs-batch Spark equality test: the
    accumulated end state is checked against an independent ENGINE,
    so foreachBatch plumbing, batch splitting, and the literal-map
    model compilation are all inside the oracled surface. The stream
    adds a ts ingest column and omits is_target (a pure doc_id
    function) — the twin is projected to the shared columns."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.text import (
        DSIR_BUCKETS,
        DSIR_TARGET_MOD,
        TX15_SQL,
        _dsir_model,
        dsir_unseen_llr,
    )
    from maggy_spark.streaming import dsir_score_stream
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    model = _dsir_model(spark, sf_dir, DSIR_BUCKETS, DSIR_TARGET_MOD)
    default = dsir_unseen_llr(spark, sf_dir)
    feed_dir, out_dir = str(tmp_path / "feed"), str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", F.timestamp_micros(F.lit(0)).alias("ts"))
        .repartition(4)  # 4 files -> 4 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    batch_ids: list = []

    def sink(bdf, bid):
        batch_ids.append(bid)
        bdf.drop("ts").write.mode("append").parquet(out_dir)

    q = (
        dsir_score_stream(stream, model, default)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) >= 2, "feed must actually split across micro-batches"

    acc = spark.read.parquet(out_dir).select("doc_id", "n_features", "dsir_score")
    spark_pd = to_pandas_spark(acc)
    duck_pd = duck.execute(
        f"SELECT doc_id, n_features, dsir_score FROM ({TX15_SQL})"
    ).fetchdf()
    assert len(spark_pd) == len(duck_pd)
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(acc) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_pq_ann_alert_stream_end_state_matches_duckdb_twin(spark, sf_dir, duck, tmp_path):
    """Stream end-state oracle #2 (VERDICT r10 item 4, same treatment
    as the dsir stream above): the PQ/ADC serving screen's output,
    accumulated across MULTIPLE micro-batches by a foreachBatch sink,
    is value-hash-compared against an independent DuckDB twin
    (`pq_adc_screen_sql` — the batch ann9 twin's shared codebook/code/
    LUT derivation with the stream's threshold filter on top). Covers
    the stream-start codebook-literal compilation, the stream-static
    full-scan join, and batch splitting against a second ENGINE."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.similarity import N_QUERIES, pq_adc_screen_sql
    from maggy_spark.streaming import pq_ann_alert_stream
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    threshold = 0.2
    feed_dir, out_dir, ck_dir = (str(tmp_path / n) for n in ("feed", "out", "ck"))
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") < N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            "embedding",
            F.timestamp_micros(F.lit(0)).alias("ts"),
        )
        .repartition(3)  # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("query_id bigint, embedding array<float>, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    batch_ids: list = []

    def sink(bdf, bid):
        batch_ids.append(bid)
        bdf.drop("ts").write.mode("append").parquet(out_dir)

    q = (
        pq_ann_alert_stream(stream, spark, sf_dir, threshold=threshold)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) >= 2, "feed must actually split across micro-batches"

    acc = spark.read.parquet(out_dir).select("query_id", "neighbor_id", "adc_cos")
    spark_pd = to_pandas_spark(acc)
    duck_pd = duck.execute(pq_adc_screen_sql(threshold)).fetchdf()
    assert len(spark_pd) == len(duck_pd) > 0
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(acc) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_phash_alert_stream_end_state_matches_duckdb_twin(spark, sf_dir, duck, tmp_path):
    """Stream end-state oracle #3 (the dsir/pq treatment applied to
    the media family): the pHash ingest screen's accumulated output
    across MULTIPLE micro-batches is value-hash-compared against
    MM8_SQL — the DuckDB twin of the batch relation on the same feed.
    Covers worker-side signing of streamed payloads, the stream-static
    band join against the session-cached store signatures, and batch
    splitting, all against a second ENGINE. Statelessness asserted."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.multimodal import MM8_PROBE_MEDIA, MM8_SQL, media_table
    from maggy_spark.streaming import phash_alert_stream
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    feed_dir, out_dir, ck_dir = (str(tmp_path / n) for n in ("feed", "out", "ck"))
    img = media_table(spark, sf_dir).where(F.col("media_type") == "image")
    probe = img.where(F.col("media_id") % 6 == 3).select("media_id", "payload")
    crafted = spark.createDataFrame(
        [(i, bytearray(tx.encode("utf-8"))) for i, tx in MM8_PROBE_MEDIA],
        "media_id bigint, payload binary",
    )
    (
        probe.unionByName(crafted)
        .withColumn("ts", F.timestamp_micros(F.lit(0)))
        .repartition(3)  # 3 files -> 3 micro-batches under maxFilesPerTrigger=1
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("media_id bigint, payload binary, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    batch_ids: list = []

    def sink(bdf, bid):
        batch_ids.append(bid)
        bdf.write.mode("append").parquet(out_dir)

    q = (
        phash_alert_stream(stream, spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) >= 2, "feed must actually split across micro-batches"
    assert all(
        not (p.get("stateOperators") or [])
        or sum(op.get("numRowsTotal", 0) for op in p["stateOperators"]) == 0
        for p in q.recentProgress
    ), "the media ingest screen must be stateless"

    acc = spark.read.parquet(out_dir).select("probe_id", "store_id", "hamming")
    spark_pd = to_pandas_spark(acc)
    duck_pd = duck.execute(MM8_SQL).fetchdf()
    assert len(spark_pd) == len(duck_pd) > 0
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(acc) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_ann_alert_stream_end_state_matches_duckdb_twin(spark, sf_dir, duck, tmp_path):
    """Stream end-state oracle #5 (r12): the bucket-blocked embedding
    near-dup alert screen's accumulated output on a deterministic
    feed slice (vec_id % 7 = 3), split across MULTIPLE micro-batches,
    value-hash-compared against `ann_alert_screen_sql` — the shared
    bucket geometry re-derived in DuckDB plus the bucket-local join
    and threshold. Upgrades this stream from batch-pinned
    (test_ann_alert_stream_matches_batch_subset) to a second-ENGINE
    end-state oracle like the other four streams."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.similarity import ann_alert_screen_sql
    from maggy_spark.streaming import ann_alert_stream
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    feed_dir, out_dir, ck_dir = (str(tmp_path / n) for n in ("feed", "out", "ck"))
    (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .where(F.col("vec_id") % 7 == 3)
        .select(
            F.col("vec_id").alias("query_id"),
            "embedding",
            F.timestamp_micros(F.lit(0)).alias("ts"),
        )
        .repartition(3)
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("query_id bigint, embedding array<float>, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    batch_ids: list = []

    def sink(bdf, bid):
        batch_ids.append(bid)
        bdf.drop("ts").write.mode("append").parquet(out_dir)

    q = (
        ann_alert_stream(stream, spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) >= 2, "feed must actually split across micro-batches"

    acc = spark.read.parquet(out_dir).select("query_id", "vec_id", "cosine")
    spark_pd = to_pandas_spark(acc)
    duck_pd = duck.execute(ann_alert_screen_sql(7, 3)).fetchdf()
    assert len(spark_pd) == len(duck_pd) > 0
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(acc) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_kmeans_route_stream_end_state_matches_duckdb_twin(spark, sf_dir, duck, tmp_path):
    """Stream end-state oracle #4 (the ing1 discipline): the k-means
    router's accumulated output on a deterministic feed slice
    (vec_id % 7 = 3), split across MULTIPLE micro-batches, is
    value-hash-compared against `kmeans_route_screen_sql` — a DuckDB
    replay of centroid TRAINING (the shared Lloyd CTE prefix) plus
    the per-vector argmax route. Covers the packed-centroid
    stream-static join, the in-row transform+aggregate argmax fold,
    and batch splitting against a second ENGINE."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.similarity import kmeans_route_screen_sql
    from maggy_spark.streaming import kmeans_route_stream
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    feed_dir, out_dir, ck_dir = (str(tmp_path / n) for n in ("feed", "out", "ck"))
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
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("query_id bigint, embedding array<float>, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    batch_ids: list = []

    def sink(bdf, bid):
        batch_ids.append(bid)
        bdf.drop("ts").write.mode("append").parquet(out_dir)

    q = (
        kmeans_route_stream(stream, spark, sf_dir)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert len(batch_ids) >= 2, "feed must actually split across micro-batches"

    acc = spark.read.parquet(out_dir).select("query_id", "cluster_id", "cosine")
    spark_pd = to_pandas_spark(acc)
    duck_pd = duck.execute(kmeans_route_screen_sql(7, 3)).fetchdf()
    assert len(spark_pd) == len(duck_pd) > 0
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(acc) == duck_dtypes(duck_pd)
    assert s_rows == d_rows


def test_length_profile_stream_end_state_matches_tx16_twin(spark, sf_dir, duck, tmp_path):
    """Sixth stream end-state oracle: the corpus fed as FOUR
    single-file micro-batches through length_profile_stream_fn, the
    per-batch histogram deltas additively merged in a dict sink, the
    merged histogram read through length_quantiles_over — and that
    end state value-hash-compared against the DuckDB TX16_SQL twin
    on the same corpus. Pins the delta kernel, the foreachBatch
    plumbing, the additive merge, and the mergeability claim itself
    (batch splitting must not change any percentile)."""
    from pyspark.sql import functions as F

    from maggy_spark.functions.text import TX16_SQL, length_quantiles_over
    from maggy_spark.streaming.documents_stream import length_profile_stream_fn
    from tools.check_oracle import duck_dtypes, frame_signature, spark_dtypes, to_pandas_spark

    feed_dir = str(tmp_path / "feed")
    (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang", "source")
        .repartition(4)
        .write.mode("overwrite")
        .parquet(feed_dir)
    )
    stream = (
        spark.readStream.schema("doc_id bigint, text string, lang string, source string")
        .option("maxFilesPerTrigger", "1")
        .parquet(feed_dir)
    )
    store: dict = {}
    n_batches = [0]

    def merge(delta, _bid):
        n_batches[0] += 1
        for r in delta.collect():
            key = (r.lang, r.source, r.n_tokens)
            store[key] = store.get(key, 0) + r.cnt

    q = (
        length_profile_stream_fn(stream, merge)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert n_batches[0] >= 4  # the feed really arrived in micro-batches
    # statelessness: the stream side carries no state store
    assert q.lastProgress is None or all(
        op.get("numRowsTotal", 0) == 0
        for op in (q.lastProgress.get("stateOperators") or [])
    )

    merged = spark.createDataFrame(
        [(lang, src, n, c) for (lang, src, n), c in store.items()],
        "lang string, source string, n_tokens bigint, cnt bigint",
    )
    # read quantiles off the merged store: explode cnt back to rows is
    # wasteful — length_quantiles_over re-histograms, and a histogram
    # of a histogram with repeated rows is wrong, so expand via the
    # cnt-weighted path: re-aggregate in the core by feeding each
    # (key, n) row cnt times is O(corpus); instead run the SAME core
    # on a relation where each histogram row is pre-expanded by
    # posexplode over cnt (bounded: max cnt at sf0.01 is small)
    expanded = merged.select(
        "lang", "source", "n_tokens", F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("i")
    ).drop("i")
    end_state = length_quantiles_over(expanded)

    spark_pd = to_pandas_spark(end_state)
    duck_pd = duck.execute(TX16_SQL).fetchdf()
    assert len(spark_pd) == len(duck_pd)
    s_cols, s_rows = frame_signature(spark_pd)
    d_cols, d_rows = frame_signature(duck_pd)
    assert s_cols == d_cols
    assert spark_dtypes(end_state) == duck_dtypes(duck_pd)
    assert s_rows == d_rows
