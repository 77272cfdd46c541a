"""Physical-plan audits: assert the scale-critical properties instead
of hoping for them — filters reach the parquet scan, projections
prune columns, small sides broadcast, aggregations are partial
(map-side combine) before the shuffle.

These are the '.explain and iterate' contract from the build brief,
pinned as tests so a regression in plan shape fails CI, not a 100 TB
run."""

import pytest

from maggy_spark.operators import aggregations as agg
from maggy_spark.operators import earlystop, generators
from maggy_spark.plans.fixtures import metrics_df, trials_df


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_trials_projection_prunes_orders_scan(spark, sf_dir):
    # trials uses 5 source columns; the scan must not read o_orderdate
    df = trials_df(spark, sf_dir).select("trial_id", "budget")
    plan = _plan(df)
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l or "Scan parquet" in l.lower())
    assert "o_orderdate" not in scan_line
    assert "o_totalprice" not in scan_line  # pruned further by the projection


def test_status_filter_pushdown(spark, sf_dir):
    # filtering via the statuses= source predicate reaches parquet
    df = trials_df(spark, sf_dir, statuses=["FINALIZED"])
    plan = _plan(df)
    pushed = plan.split("PushedFilters:")[1].split("]")[0]
    assert "EqualTo(o_orderstatus,F)" in pushed
    # counter-example pinned: a post-hoc filter on the CASE-derived
    # column does NOT push (Catalyst keeps the CASE as a DataFilter) —
    # which is exactly why the statuses= path exists
    lazy = _plan(trials_df(spark, sf_dir).where("status = 'FINALIZED'"))
    assert "o_orderstatus" not in lazy.split("PushedFilters:")[1].split("]")[0]


def test_a4_uses_partial_aggregation(spark, sf_dir):
    plan = _plan(agg.a4_budget_stats(spark, sf_dir))
    # two HashAggregates (partial + final) around one exchange:
    # map-side combine before the shuffle
    assert plan.count("HashAggregate") >= 2
    assert "partial_" in plan


def test_a1_has_no_global_sort(spark, sf_dir):
    plan = _plan(agg.a1_result_summary(spark, sf_dir))
    assert "Sort [" not in plan  # struct-max agg, not a sort-based top-1
    assert "Window" not in plan


def test_c3_materializes_shared_relation(spark, sf_dir):
    plan = _plan(earlystop.c3_median_rule(spark, sf_dir))
    # per-trial stats feed both the median bar and the decisions;
    # the relation must be cached, not recomputed per consumer
    assert "InMemoryTableScan" in plan
    assert "BroadcastExchange" in plan  # 1-row median bar broadcast


def test_g12_anti_join_broadcasts_seen_side(spark, sf_dir):
    plan = _plan(generators.g12_dedup_guard(spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_g3_grid_distinct_before_product(spark, sf_dir):
    # the cross join must consume DISTINCT-collapsed sides, not the
    # raw part table twice
    plan = _plan(generators.g3_grid_search(spark, sf_dir))
    assert "HashAggregate" in plan  # distinct collapse
    idx_join = plan.find("BroadcastNestedLoopJoin")
    assert idx_join != -1


def test_ann1_broadcasts_query_side(spark, sf_dir):
    from maggy_spark.functions import similarity

    plan = _plan(similarity.ann1_bruteforce_topk(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_whole_stage_codegen_on_kernel(spark, sf_dir):
    # expression-only operators (no Window, which never codegens)
    # must run inside WholeStageCodegen spans
    from maggy_spark.operators import transforms

    # executedPlan toString marks codegen stages with "*(n)"
    for q in (generators.g13_trial_factory, transforms.t1_minmax_normalize):
        assert "*(1)" in _plan(q(spark, sf_dir)), q.__name__


def test_mm3_never_scans_text_payload(spark, sf_dir):
    from maggy_spark.functions import multimodal

    # metadata aggregation must not decode the payload: the optimized
    # plan reads `text` only to compute length (for meta.n_bytes) and
    # the executed scan excludes every other doc column
    plan = _plan(multimodal.mm3_metadata_stats(spark, sf_dir))
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l or "Scan parquet" in l.lower())
    assert "lang" not in scan_line and "n_chars" not in scan_line


def test_global_topk_is_take_ordered_not_window(spark, sf_dir):
    # tx5 / k2 rank a full relation (bigram vocabulary, per-customer
    # spend). A row_number over an un-partitioned Window funnels the
    # whole relation through one task; the fix is orderBy().limit(k)
    # -> TakeOrderedAndProject (per-task k-row heaps) with rank
    # derived over only the k survivors. Pin both properties.
    from maggy_spark.functions import text
    from maggy_spark.operators import warehouse

    for q in (text.tx5_ngram_stats, warehouse.k2_top_customers):
        plan = _plan(q(spark, sf_dir))
        assert "TakeOrderedAndProject" in plan, q.__name__
        # nothing funnels the full relation into one task: the only
        # single-partition consumer is the bounded k-row rank window
        assert "Exchange SinglePartition" not in plan, q.__name__


def test_k2_broadcasts_topk_side(spark, sf_dir):
    # the k-row aggregate side must broadcast into the customer join
    # (customer is 15M rows at SF100k — never the build side)
    from maggy_spark.operators import warehouse

    plan = _plan(warehouse.k2_top_customers(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_dd9_broadcasts_eval_side(spark, sf_dir):
    # decontamination joins the 100-TB train corpus against a
    # benchmark-sized eval set: the exploded eval shingles must be
    # the broadcast side, never a shuffle of the train side's shingles
    from maggy_spark.functions import dedup

    plan = _plan(dedup.dd9_decontaminate(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_star_rounds_shuffle_only_narrow_keys(spark):
    # one CC star round over a 100-TB pair graph must stay
    # min-aggregations (map-side partial before the shuffle) and
    # equi-joins — a nested-loop join or a missing partial_min turns
    # the round quadratic / hub-bound
    from pyspark.sql import functions as F

    from maggy_spark.functions.dedup import _large_star, _small_star

    e = spark.createDataFrame(
        [(i + 1, i) for i in range(50)], "hi long, lo long"
    ).localCheckpoint()
    for round_fn in (_large_star, _small_star):
        plan = _plan(round_fn(e))
        assert "partial_min" in plan, round_fn.__name__
        assert "CartesianProduct" not in plan, round_fn.__name__
        assert "BroadcastNestedLoopJoin" not in plan, round_fn.__name__
        assert "Exchange SinglePartition" not in plan, round_fn.__name__


def test_pl9_window_is_shard_partitioned(spark, sf_dir):
    # pl9's position window must partition by (epoch, shard) — an
    # un-partitioned (global-order) window would funnel every epoch's
    # whole corpus through one task
    from maggy_spark.functions.pipeline import pl9_epoch_shuffle_plan

    plan = _plan(pl9_epoch_shuffle_plan(spark, sf_dir))
    assert "Exchange SinglePartition" not in plan
    assert "row_number()" in plan
    # the window's partition spec names both keys
    assert "epoch" in plan and "shard" in plan


def test_tx11_no_single_partition_funnel(spark, sf_dir):
    # tx11's corpus marginals are windows over the (source, token)
    # aggregate; the only 1-row relation is the broadcast total
    from maggy_spark.functions.text import tx11_source_drift

    plan = _plan(tx11_source_drift(spark, sf_dir))
    assert "BroadcastExchange" in plan  # the 1-row corpus total
    # the big exploded relation never collapses to one partition
    # (the total's own 1-row aggregation is a bounded SinglePartition;
    # count them: exactly the one from that scalar aggregate pair)
    assert plan.count("Exchange SinglePartition") <= 2


def test_dd14_winner_via_partial_aggregation(spark, sf_dir):
    # dd14's per-cluster winner must come from a groupBy (partial
    # aggregation collapses the giant near-dup component map-side),
    # NOT from a window over partitionBy(cluster_rep), which would
    # put the whole component in one task
    from maggy_spark.functions.dedup import dd14_cluster_representatives

    plan = _plan(dd14_cluster_representatives(spark, sf_dir))
    assert "partial_max(struct(nt" in plan  # the winner aggregate itself
    assert "windowspecdefinition(cluster_rep" not in plan
    # the membership relation is session-cached: both consumers read
    # the materialization instead of re-running the components join
    assert plan.count("InMemoryTableScan") >= 2


def test_k3_takeordered_and_broadcast_dimension(spark, sf_dir):
    # Q3 shape: the filtered customer dimension broadcasts; the global
    # top-k plans as TakeOrderedAndProject (never a one-task sort of
    # the full aggregate)
    from maggy_spark.operators.warehouse import k3_shipping_priority

    plan = _plan(k3_shipping_priority(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastExchange" in plan


def test_k4_dimensions_broadcast_no_theta_join(spark, sf_dir):
    # Q5 shape: every dimension join is a broadcast hash join and the
    # local-supplier constraint is an equality filter, not a join
    # condition that would force a theta/nested-loop join
    from maggy_spark.operators.warehouse import k4_local_supplier_volume

    plan = _plan(k4_local_supplier_volume(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 4  # region/nation/supplier/customer sides


def test_pl13_ledger_reads_only_cached_seams(spark, sf_dir):
    # the composed corpus build must not re-scan the corpus per stage:
    # every documents access in the LEDGER plan routes through the
    # session-cached seams (shingles / simhash bands / dd14 membership
    # / the pl13 per-doc stage relation) — zero direct parquet leaves,
    # and exactly one distinct cache feeds the ledger's aggregates
    from maggy_spark.functions.pipeline import pl13_full_corpus_build

    df = pl13_full_corpus_build(spark, sf_dir)
    leaves = df._jdf.queryExecution().optimizedPlan().collectLeaves()
    kinds, direct_scans, cache_ids = [], 0, set()
    for i in range(leaves.size()):
        node = leaves.apply(i)
        name = node.nodeName()
        kinds.append(name)
        if name == "InMemoryRelation":
            cache_ids.add(node.cacheBuilder().cachedPlan().id())
        elif "documents.parquet" in node.toString():
            direct_scans += 1
    assert direct_scans == 0, f"ledger re-scans the corpus: {kinds}"
    # nothing but cached seams + the pl9 epoch Range reaches the ledger
    assert set(kinds) <= {"InMemoryRelation", "Range"}, kinds
    assert len(cache_ids) == 1  # the single pl13_doc_stages seam
    # the seams pl13 composed through are the shared session caches,
    # not private per-call persists
    keys = {k[1] for k in getattr(spark, "_maggy_session_cache", {}) if k[0] == sf_dir}
    assert {"shingles", "dd14_membership", "pl13_doc_stages"} <= keys


def test_tx12_rides_the_scan_no_shuffle(spark, sf_dir):
    # the PII scan is per-row expressions over one corpus scan: no
    # join, no window, no aggregation — the only Exchange allowed is
    # load_table's conditional small-fixture fan-out repartition
    # (which self-disables once the scan has >= cores splits)
    from maggy_spark.functions.text import tx12_pii_scan

    plan = _plan(tx12_pii_scan(spark, sf_dir))
    assert "Join" not in plan and "Window" not in plan
    assert "HashAggregate" not in plan and "Sort [" not in plan
    assert plan.count("Exchange") <= 1  # fan-out only, never a keyed shuffle


def test_dd15_bounded_join_with_partial_aggregation(spark, sf_dir):
    # the source-pair matrix joins the DISTINCT (fingerprint, source)
    # relation with itself — bounded per key by |sources| — and rolls
    # up with map-side partial aggregation; no all-pairs shapes
    from maggy_spark.functions.dedup import dd15_cross_source_dup

    plan = _plan(dd15_cross_source_dup(spark, sf_dir))
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert "partial_" in plan  # map-side combine before the rollup shuffle


def test_tx14_model_and_scoring_broadcast(spark, sf_dir):
    # tx14's capped bigram vocab and the 1-row total must BROADCAST to
    # the scoring pass — the Zipf-skewed (w1, w2) key must never drive
    # a shuffle of the corpus-sized exploded relation, and the only
    # SinglePartition collapses are the bounded scalar total and the
    # vocab cap's global top-k
    from maggy_spark.functions.text import tx14_bigram_logprob

    plan = _plan(tx14_bigram_logprob(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange SinglePartition") <= 2
    # the per-doc rollup partial-aggregates before its shuffle
    assert "partial_count" in plan or "partial_sum" in plan
    # the bigram counts are session-cached: the model's three
    # consumers (vocab cap, prefix counts, total) read the
    # materialization, not three corpus re-scans
    assert plan.count("InMemoryTableScan") >= 2


def test_ann7_floats_never_cross_a_shuffle(spark, sf_dir):
    # ann7's coarse pass streams the int8 corpus against broadcast
    # quantized queries; the per-query top-C window shuffles only
    # (query_id, neighbor_id, score); the rerank fetches full-precision
    # vectors via BROADCAST joins — no hashpartitioning exchange may
    # carry an embedding array
    from maggy_spark.functions.similarity import ann7_quantized_rerank

    plan = _plan(ann7_quantized_rerank(spark, sf_dir))
    assert "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "embedding" not in line and "qe#" not in line and "ve#" not in line, line
    # the quantized corpus is session-cached (the serving artifact)
    assert "InMemoryTableScan" in plan
