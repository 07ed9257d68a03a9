"""Exhaustive hot-window inventory (round 12).

``tools/skew_probe.py`` certifies the census/stats families empirically
at skewed decades, and ``tests/test_broadcast_gate.py`` pins the plan
class for the GATED list on every pytest run — but both cover curated
entry lists.  This sweep closes the coverage question: it captures the
physical plan of EVERY plan-auditable entry (same machinery and
fresh-cache discipline as ``tools/plan_audit.py``) and greps each with
skew_probe's widened ``_HOT_WINDOW_KEY`` (corpus keys + the r12
low-cardinality stats keys label/event_type/lang/source, matched
anywhere in the partition list).

Hits are triaged against ``_DOCUMENTED`` — entries whose window IS the
deliberate exact/QA form with a recorded bound and (where the key can
dominate) a pinned production twin.  An UNDOCUMENTED hit exits 1:
either de-skew it (census / percentile_approx / fixed-size sample —
see the decision table in BASELINE.md r11/r12) or record why its key
is bounded here.

Usage:
    python tools/hot_window_sweep.py          # full sweep, ~3 min
"""

from __future__ import annotations

import importlib.util
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402


def _load(name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO_ROOT, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# Every entry allowed to carry a hot-key window, with the recorded
# reason.  The sweep fails on any hit outside this dict, so adding a
# new window on a corpus/low-cardinality key REQUIRES writing the
# bound down here (the same ratchet broadcast_audit._BENIGN applies
# to broadcasts).
_DOCUMENTED = {
    # exact order-statistic oracle/QA forms — engine-portable rank
    # arithmetic is the point; each carries a skew bound in its
    # docstring and a percentile_approx production twin with a pinned
    # agreement test (r11/r12)
    "winsorized_stats": "exact p05/p95 oracle form; twin"
                        " winsorized_stats_approx (r12)",
    "mad_outliers": "exact double-median oracle form; twin"
                    " mad_outliers_approx (r12)",
    "quality_quantile_filter": "exact median oracle form; twin"
                               " quality_quantile_filter_approx (r12)",
    "quantile_normalize_scores": "exact decile-mapping oracle form;"
                                 " twin quantile_normalize_boundaries"
                                 " (r11)",
    # windows whose INPUT is a bounded census/spine, not the corpus
    # stream — per-partition rows grow with the time/label domain,
    # never with corpus rows
    "events_anomaly_zscore": "window over the hourly census"
                             " (|types| x |hours| rows)",
    "chi_square_assoc": "windows over the ~10-row contingency table",
    "cusum_changepoint": "windows over the (type, hour) census",
    "events_gapfill": "LOCF window over the dense hour spine"
                      " (|types| x |hours| rows)",
    # constant-k rank windows: Spark plans WindowGroupLimit with a
    # PARTIAL stage below the exchange, so each map partition ships
    # <= k rows per key — shuffle and window input are k-bounded
    # however hot the key (verified in the executed plans)
    "stratified_sample": "k=5 rank; partial WindowGroupLimit below the"
                         " exchange bounds shuffle + window input"
                         " (docstring)",
    "windowed_dedup": "k=1 rank, and the partition key includes"
                      " user_id + hour — high-cardinality composite,"
                      " per-partition rows bounded",
    # deliberate fixed-fan-out distributed exact-ntile (judge r7 item
    # #6 accepted form): 64 ordered range buckets, local rank per
    # bucket + broadcast offsets; raise _Z_RANK_BUCKETS at scale
    "zorder_layout_pruning": "rank within 64 range buckets = the"
                             " distributed exact-ntile form (r7);"
                             " bucket count is the scale knob",
}


def main() -> int:
    sp = _load("skew_probe")
    pa = _load("plan_audit")
    spark = get_spark("hot_window_sweep")
    spark.sparkContext.setLogLevel("ERROR")
    spark.catalog.clearCache()
    entrymod.reset_cached_memos()
    qs = entrymod.queries()
    sf_dir = pa.SF_DIR
    failures = 0
    hits = 0
    for name in pa.audited_names():
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            ln.strip()[:110]
            for ln in plan.splitlines()
            if sp._HOT_WINDOW_KEY.search(ln)
        ]
        if not lines:
            continue
        hits += 1
        if name in _DOCUMENTED:
            print(f"  {name}: documented ({_DOCUMENTED[name]})")
        else:
            failures += 1
            print(f"  {name}: UNDOCUMENTED hot-key window")
            for ln in lines[:3]:
                print(f"      {ln}")
    stale = set(_DOCUMENTED) - set(pa.audited_names())
    if stale:
        failures += 1
        print(f"  STALE _DOCUMENTED entries (not in registry): {stale}")
    print(f"hits: {hits} / {len(pa.audited_names())} entries,"
          f" FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
