"""Plan-shape regression baseline: record, for a fixed set of
pure-DataFrame queries, the physical-plan metrics that matter at 100 TB
— shuffle Exchange count, broadcast count, Python stage count, and
whether the top-k shape survived — into PLAN_BASELINE.json.

tests/test_plan_baseline.py compares the live plans against this file,
so an accidental extra shuffle (a lost broadcast hint, a HOF rewritten
into a Python UDF, a TakeOrderedAndProject degraded to a global Sort)
fails the suite instead of silently costing a cluster.  Regenerating
the file is the EXPLICIT way to accept a plan change:

    python tools/plan_audit.py          # rewrites PLAN_BASELINE.json

Only queries whose construction is cheap and deterministic is audited
(no artifact builds, no streaming runs, no training loops while
building the DataFrame; bounded 1-row scalar collects are fine), so
the audit adds seconds, not minutes.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# side-effect-free plan builders across the operator families
AUDITED = [
    "knn_cosine",
    "knn_euclidean",
    "knn_prefilter_label",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q7_nation_volume",
    "q12_ship_latency",
    "q17_small_quantity_revenue",
    "events_hourly",
    "events_user_stats",
    "user_sessions",
    "latest_event_per_user",
    "top_customers_per_nation",
    "order_value_percentiles",
    "text_quality",
    "token_counts",
    "lang_id_counts",
    "tfidf_top_terms",
    "bm25_search",
    "dedup_exact_summary",
    "oov_rate_by_source",
    "embedding_drift_by_label",
    "stratified_sample",
    "source_mix_weights",
    "sequence_packing",
    "salted_join_revenue",
    "bloom_pruned_revenue",
    "video_scene_cuts",
    "chunk_documents",
    "ks_drift_by_type",
    "survival_time_to_purchase",
    "market_basket_lift",
    "benford_audit",
    "cusum_changepoint",
    "dp_noisy_lang_counts",
    "ridge_regression_fit",
    "ridge_segment_residuals",
    "ridge_lambda_sweep",
    "ridge_models_by_segment",
    "ridge_classifier_eval",
    "ridge_conformal_intervals",
    "stump_split_finder",
    "boosted_stumps",
    "classifier_reliability_bins",
    "target_encode_segments",
    "interval_join_error_sessions",
    "als_user_factors",
    "ridge_crossval_mse",
]


def plan_metrics(plan: str) -> dict:
    lines = plan.splitlines()
    shuffle = sum(
        1
        for ln in lines
        if re.search(r"\bExchange (hash|range|Single)", ln)
    )
    bcast = sum(1 for ln in lines if "BroadcastExchange" in ln)
    python = sum(
        1
        for ln in lines
        if re.search(r"MapInPandas|ArrowEvalPython|BatchEvalPython|FlatMapGroupsInPandas", ln)
    )
    return {
        "shuffle_exchanges": shuffle,
        "broadcast_exchanges": bcast,
        "python_stages": python,
        "take_ordered": "TakeOrderedAndProject" in plan,
    }


def collect(spark) -> dict:
    qs = entrymod.queries()
    out = {}
    for name in AUDITED:
        df = qs[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().toString()
        out[name] = plan_metrics(plan)
    return out


def main() -> None:
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = collect(spark)
    path = os.path.join(REPO_ROOT, "PLAN_BASELINE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
