"""Dump .explain("formatted") for named queries to plans/<round>/<name>_<tag>.txt
(round from $PLANS_ROUND, default r15).

Usage: python tools/dump_plans.py <tag> [name ...]
  tag: "before" | "after"
  names: registry query names, or extras known to this tool; default =
         every registry query.

The files are the judge-facing evidence for OPTIMIZATION_r<N>.md plan
claims (Exchange counts, join strategies, PushedFilters, Python seams).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

def _extras():
    from maggy_spark.functions.dedup import (
        dd18_crossmodal_verify,
        dd19_containment_screen,
        dd21_lsh_s_curve,
        dd22_minhash_calibration,
        dd23_contamination_report,
    )
    from maggy_spark.functions.multimodal import mm1_decode_metadata, mm9_multimodal_pack_plan
    from maggy_spark.functions.pipeline import (
        pl14_curriculum_order,
        pl18_temperature_mix,
        pl19_temperature_apply,
        pl1_corpus_prep,
        pl20_pack_efficiency,
        pl21_fair_interleave,
        pl22_pps_sample,
        pl23_weighted_sample,
        pl24_doremi_reweight,
    )
    from maggy_spark.functions.similarity import (
        ann11_semdedup_prune,
        ann13_cluster_quality,
        ann14_recall_eval,
        ann15_cluster_keywords,
        ann17_filtered_topk,
        ann18_range_search,
        ann19_filtered_ivf,
        ann20_selective_filtered_ivf,
        ann21_routing_recall_curve,
        ann22_incremental_store,
        ann3_ivf_topk,
    )
    from maggy_spark.functions.text import (
        tx17_tfidf_keywords,
        tx18_langid_eval,
        tx1_token_count,
        tx20_tokenizer_fertility,
        tx5_ngram_stats,
    )
    from maggy_spark.operators.aggregations import (
        a13_regret_curve,
        a14_param_importance,
        a15_earlystop_savings,
    )
    from maggy_spark.operators.events import (
        ev12_lag_quantiles,
        ev13_type_transitions,
        ev14_session_funnel,
    )
    from maggy_spark.operators.generators import g14_pbt_schedule
    from maggy_spark.operators.warehouse import k5_late_shipment_priority
    from maggy_spark.sources.csvsrc import s11_csv_clean, s11_csv_report
    from maggy_spark.sources.jsonl import s10_jsonl_clean, s10_jsonl_report

    fns = {}
    for f in (
        dd18_crossmodal_verify, dd19_containment_screen, dd21_lsh_s_curve,
        dd22_minhash_calibration, dd23_contamination_report,
        mm1_decode_metadata, mm9_multimodal_pack_plan,
        pl14_curriculum_order, pl18_temperature_mix, pl19_temperature_apply,
        pl1_corpus_prep, pl20_pack_efficiency, pl21_fair_interleave,
        pl22_pps_sample, pl23_weighted_sample, pl24_doremi_reweight,
        ann11_semdedup_prune, ann13_cluster_quality, ann14_recall_eval,
        ann15_cluster_keywords, ann17_filtered_topk, ann18_range_search,
        ann19_filtered_ivf, ann20_selective_filtered_ivf,
        ann21_routing_recall_curve, ann22_incremental_store, ann3_ivf_topk,
        tx17_tfidf_keywords, tx18_langid_eval, tx1_token_count,
        tx20_tokenizer_fertility, tx5_ngram_stats,
        a13_regret_curve, a14_param_importance, a15_earlystop_savings,
        ev12_lag_quantiles, ev13_type_transitions, ev14_session_funnel,
        g14_pbt_schedule, k5_late_shipment_priority,
        s11_csv_clean, s11_csv_report, s10_jsonl_clean, s10_jsonl_report,
    ):
        # registry-style short name: strip module path, keep fn name
        fns[f.__name__] = f
    return fns


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("dump-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.maxMetadataStringLength", "1500")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from maggy_spark import registry

    fns = dict(registry.queries())
    fns.update(_extras())
    if not names:
        names = sorted(registry.queries().keys())

    out_dir = REPO / "plans" / os.environ.get("PLANS_ROUND", "r15")
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        fn = fns.get(name)
        if fn is None:
            print(f"skip {name}: unknown", file=sys.stderr)
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}", file=sys.stderr)
            continue
        (out_dir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
