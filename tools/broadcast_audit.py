"""Mid-scale AQE broadcast audit (round 10).

Hunts one hazard class: a query that derives an aggregate FROM a big
table and joins it back lets AQE's runtime stats broadcast a
CORPUS-SIZED side whenever it clears the adaptive threshold — legal
and locally cheap at small SF, a cliff one decade later (observed on
tfidf_top_terms at the synthetic sf1 decade: the BroadcastExchange
wrapped the full (doc_id, term, tf) aggregate, not the small dfreq
side).  The fix class is a partial-aggregable groupBy census with the
join-back pinned ``shuffle_hash`` (r11, replacing r10's window-count
form, which traded the broadcast for an un-splittable hot-key window
task — see ``tools/skew_probe.py``): the pin makes the join a
shuffled-hash join, so no broadcast side exists at ANY scale, while
map-side combine and AQE skew-join splitting both survive.

This tool re-runs each entry against a synthetic-decade dir, reads the
FINAL (post-AQE) plan, and flags every HashedRelationBroadcastMode
exchange whose subtree scans a corpus table or an exploded stream.
Flags are triaged against _BENIGN — broadcasts whose build side is
bounded by a FIXED domain (group types, hour spine, salt fan-out,
query/eval sets, TPC-H dims) or that a genuine two-table join's AQE
fallback handles — each with the reason on record AND a subtree
fingerprint every individual flag must match.  A flag outside the
allowlist (or not matching its entry's fingerprint) exits 1: either
fix it (census + shuffle_hash pin) or write down why it is bounded.

Usage:
    python tools/scale_probe_decade.py --build-only   # stage synth docs (implicit on first probe)
    python tools/broadcast_audit.py                   # audit both synth dirs

Runtime ~3 min per family at synth sf1 (entries execute once).
"""

from __future__ import annotations

import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402

# Broadcasts that are correct at any scale.  Each entry carries
# ``expect``: regexes, at least one of which must match the flagged
# exchange's SUBTREE text — r11 hardening (advisor r10): a bare
# entry-name allowlist suppressed ALL flags for that entry, so a NEW
# hazardous corpus-sized broadcast appearing next to a benign one would
# print 'benign' and exit 0.  Now every individual flag must match its
# recorded benign shape or the audit fails.
_BENIGN = {
    # eval side models a FIXED external benchmark set; the broadcast
    # semi-join IS the production decontamination plan (docstring)
    "decontam_overlap": {
        "reason": "eval shingle set stands in for a fixed benchmark",
        "expect": [r"keys=\[sh#\d+\], functions=\[\]"],
    },
    # per-group stats joined back: build side bounded by |event types| /
    # |groups|, a fixed domain that does not grow with the corpus
    "mad_outliers": {
        "reason": "group-stat table bounded by |event_type|",
        # anchored to the two-middle-ranks avg that builds each median
        "expect": [
            r"HashAggregate\(keys=\[event_type#\d+\],"
            r" functions=\[avg\((?:value|adev)#\d+\)\],"
            r" output=\[event_type#\d+, med_(?:value|adev)#\d+\]\)"
        ],
    },
    "winsorized_stats": {
        "reason": "group percentile table bounded by |event_type|",
        # anchored to the rank-filtered min/max threshold aggregate
        "expect": [
            r"HashAggregate\(keys=\[event_type#\d+\],"
            r" functions=\[min\(value#\d+\), max\(value#\d+\)\],"
            r" output=\[event_type#\d+, p05#\d+, p95#\d+\]\)"
        ],
    },
    # r12 percentile_approx production twins (probed by the pytest
    # broadcast gate and skew_probe, not registry entries): the
    # broadcast side is the bounded-|key| sketch census itself
    "winsorized_stats_approx": {
        "reason": "per-type percentile sketch table, bounded by"
                  " |event_type|",
        "expect": [
            r"ObjectHashAggregate\(keys=\[event_type#\d+\],"
            r" functions=\[(?:partial_)?percentile_approx\(value#\d+,"
            r" \[0\.05,0\.95\]"
        ],
    },
    "mad_outliers_approx": {
        "reason": "per-type approx-median tables, bounded by"
                  " |event_type|",
        "expect": [
            r"ObjectHashAggregate\(keys=\[event_type#\d+\],"
            r" functions=\[(?:partial_)?percentile_approx\("
            r"(?:value|adev)#\d+, 0\.5"
        ],
    },
    "quality_quantile_filter_approx": {
        "reason": "per-lang approx-median table, bounded by |lang|",
        "expect": [
            r"ObjectHashAggregate\(keys=\[lang#\d+\],"
            r" functions=\[(?:partial_)?count\(1\),"
            r" (?:partial_)?percentile_approx\(q#\d+, 0\.5"
        ],
    },
    # r12: the broadcast side is the top-10-df census — limit(10)
    # bounds it BY CONSTRUCTION (bounded-|key| broadcast census); a new
    # corpus-sized broadcast in this entry would lack the TakeOrdered
    # census root and fail triage
    "posting_lists": {
        "reason": "top-10-df term census, bounded by limit(10)",
        "expect": [
            r"TakeOrderedAndProject\(limit=10, orderBy=\[df#\d+L? DESC"
        ],
    },
    "events_gapfill": {
        "reason": "hourly per-type aggregate joined to the dense spine:"
                  " bounded by |event_type| x |hours| (time-domain, not"
                  " corpus-row, growth)",
        "expect": [r"keys=\[event_type#\d+, _groupingexpression#\d+\]"],
    },
    # the broadcast side IS the trained model: the unigram count table
    # (w, cu) — c(w) counts every token position, which no census over
    # the bigram stream can reproduce (final tokens have no outgoing
    # bigram); vocab-bounded (Heaps-sublinear), AQE shuffle-joins on w1
    # beyond the threshold.  The bigram-count side of this entry WAS
    # the hazard class and is a pinned census join-back since r11.
    "bigram_lm_score": {
        "reason": "unigram LM table = the model, vocab-bounded",
        # anchored to the build side's defining HashAggregate shape
        # (advisor r11: a bare column-name substring would also match a
        # NEW hazardous broadcast that merely carries the column)
        "expect": [
            r"HashAggregate\(keys=\[w#\d+\], functions=\[count\(1\)\],"
            r" output=\[w1#\d+, cu#\d+L\]\)"
        ],
    },
    # genuine two-table joins: AQE broadcasts the filtered/projected
    # side while it fits and falls back to SMJ when it doesn't — the
    # adaptive behavior working as designed, no self-derived aggregate
    "q12_ship_latency": {
        "reason": "orders projection side of a genuine two-table join;"
                  " AQE falls back at scale",
        # anchored to the scanned relation (advisor r11's remaining
        # loose class): the build must BE the 3-column orders
        # projection, not merely carry o_orderpriority downstream
        "expect": [
            r"FileScan parquet"
            r" \[o_orderkey#\d+L,o_orderdate#\d+,o_orderpriority#\d+\]"
        ],
    },
    "degree_distribution": {
        "reason": "orders projection side; AQE falls back",
        # anchored to the scanned relation: the build must BE the
        # 2-column orders projection, not merely carry o_custkey
        "expect": [r"FileScan parquet \[o_orderkey#\d+L,o_custkey#\d+L\]"],
    },
    "multitouch_attribution": {
        "reason": "filtered click side of the bucketed range join, a"
                  " genuine two-table join; AQE falls back at scale",
        "expect": [r"event_type#\d+ = click"],
    },
    "salted_join_revenue": {
        "reason": "salted dim side, bounded by |dim| x salt",
        "expect": [r"__salt#\d+"],
    },
    # flagship composite (gate-tested at suite SF, not in the decade
    # lists): the ONLY legal broadcast is the fixed-benchmark eval
    # shingle set; the per-doc overlap join-back is pinned
    # shuffle_hash (r11) so a corpus-growing side must never appear
    "corpus_pipeline_full": {
        "reason": "eval shingle set = fixed benchmark; overlap pinned",
        "expect": [r"keys=\[sh#\d+\], functions=\[\]"],
    },
    # vector family: broadcast sides bounded by the query/label domain
    "contrastive_pair_mining": {
        "reason": "per-anchor top-k result, |Q| x k rows",
        # anchored to the rename-project that DEFINES the negative
        # table (query_id->anchor_id, vec_id->negative_id), not the
        # bare anchor_id column a downstream broadcast would carry
        "expect": [
            r"Project \[query_id#\d+L AS anchor_id#\d+L,"
            r" vec_id#\d+L AS negative_id#\d+L"
        ],
    },
    "label_centroids": {
        "reason": "per-label aggregate, bounded by |labels|",
        # anchored to the per-label count aggregate that builds the
        # broadcast side, not the bare label column name
        "expect": [
            r"HashAggregate\(keys=\[label#\d+\], functions=\[count\(1\)\],"
            r" output=\[label#\d+, n_vectors#\d+L\]\)"
        ],
    },
    # r12 census form: the per-label (mu, sd) stats table joined back
    # for the outlier pass — build side is the label-keyed moment
    # aggregate, bounded by |labels|, never corpus-sized
    "embedding_norm_outliers": {
        "reason": "per-label norm-stats census, bounded by |labels|",
        "expect": [
            r"HashAggregate\(keys=\[label#\d+\],"
            r" functions=\[count\(1\), avg\(nrm#\d+\),"
            r" stddev_pop\(nrm#\d+\)\]"
        ],
    },
    "retrieval_eval_metrics": {
        "reason": "exact top-k of a 4-query eval set",
        # anchored to the row_number window that COMPUTES exact_rank
        # over the eval queries, not the bare output column
        "expect": [
            r"windowspecdefinition\(query_id#\d+L, dist#\d+ ASC"
            r"[^\n]*\) AS exact_rank#\d+\]"
        ],
    },
}

DOCS_ENTRIES = [
    "token_entropy", "bm25_search", "hybrid_search", "boilerplate_ngrams",
    "bigram_lm_score", "decontam_overlap", "posting_lists", "top_ngrams",
    "tfidf_top_terms", "duplicated_spans", "crossdoc_shingle_dup",
    "text_quality", "repetition_filters", "token_counts", "lang_id_counts",
]
REL_ENTRIES = [
    "market_basket_lift", "retention_cohorts", "salted_event_stats",
    "q12_ship_latency", "ks_drift_by_type", "survival_time_to_purchase",
    "bootstrap_ci_order_value", "benford_audit", "cusum_changepoint",
    "mad_outliers", "winsorized_stats", "numeric_corr",
    "q1_pricing_summary", "events_sliding_windows", "user_sessions",
    "events_anomaly_zscore", "events_gapfill", "purchase_attribution_asof",
    "click_purchase_pairs", "multitouch_attribution", "salted_join_revenue",
    "degree_distribution",
]
# vector family, audited against a 10x id-shifted embeddings synth that
# this tool stages itself.  CAVEAT: the synth's 10 copies carry
# IDENTICAL vectors, so pair-generating entries' ROW COUNTS and
# timings there measure an artifact (every vector gains 10 twins) —
# only the PLAN SHAPE is the audit signal, which is data-independent.
VEC_ENTRIES = [
    "knn_cosine", "knn_multi_cosine", "embedding_near_dup",
    "semantic_dedup", "knn_label_vote", "mmr_diversify",
    "embedding_pca_var", "contrastive_pair_mining", "label_centroids",
    "retrieval_eval_metrics", "embedding_norm_outliers",
]
VEC_SYNTH = "/tmp/spark_graft_sf1_vec"


def _stage_vec_synth(spark) -> None:
    """10x embeddings (vec_id key-shifted per copy), other tables
    passed through at sf0.1 so load_table resolves."""
    import shutil
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    src = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    reduce(
        DataFrame.union,
        [
            src.withColumn("vec_id", F.col("vec_id") + F.lit(i * 100_000_000))
            for i in range(10)
        ],
    ).write.mode("overwrite").parquet(f"{VEC_SYNTH}/embeddings.parquet")
    for t in (
        "region", "nation", "supplier", "part", "customer",
        "orders", "lineitem", "events", "documents",
    ):
        s, d = f"/root/testdata/sf0.1/{t}.parquet", f"{VEC_SYNTH}/{t}.parquet"
        if not os.path.exists(d):
            (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)
_BIG_MARKS = (
    "documents.parquet", "documents]", "lineitem", "orders", "events",
    "Generate explode", "embeddings", "MapInArrow",
)


def corpus_broadcasts(plan: str) -> list[tuple[str, str]]:
    """(exchange line, subtree text) for every HashedRelation
    BroadcastExchange whose subtree reaches a corpus table scan or an
    exploded stream (IdentityBroadcastMode — the 1-row scalar cross
    joins — is never flagged).  The subtree text is what _BENIGN
    fingerprints match against."""
    lines = plan.splitlines()
    flags = []
    for i, line in enumerate(lines):
        if "BroadcastExchange" not in line or "HashedRelation" not in line:
            continue
        depth = len(line) - len(line.lstrip())
        sub = []
        for m in lines[i + 1:]:
            if (len(m) - len(m.lstrip())) <= depth and m.strip():
                break
            sub.append(m)
        subtxt = "\n".join(sub)
        if any(t in subtxt for t in _BIG_MARKS):
            flags.append((line.strip()[:100], subtxt))
    return flags


def triage(name: str, flags: list[tuple[str, str]]) -> list[str]:
    """Return the NON-benign flag lines: a flag survives triage unless
    the entry is allowlisted AND the flag's subtree matches one of the
    entry's recorded benign fingerprints (advisor r10: name-only
    allowlisting would also suppress a NEW hazardous broadcast that
    appears next to a benign one)."""
    import re

    spec = _BENIGN.get(name)
    if spec is None:
        return [line for line, _ in flags]
    return [
        line
        for line, subtxt in flags
        if not any(re.search(p, subtxt) for p in spec["expect"])
    ]


def main() -> int:
    spark = get_spark("broadcast_audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    failures = 0
    if not os.path.isdir(f"{VEC_SYNTH}/embeddings.parquet"):
        _stage_vec_synth(spark)
    for sf_dir, names in (
        ("/tmp/spark_graft_sf1_synth", DOCS_ENTRIES),
        ("/tmp/spark_graft_sf1_rel", REL_ENTRIES),
        (VEC_SYNTH, VEC_ENTRIES),
    ):
        if not os.path.isdir(sf_dir):
            print(f"SKIP {sf_dir}: run the matching scale_probe_decade"
                  f" tool once to stage it", file=sys.stderr)
            continue
        for name in names:
            fn = qs.get(name)
            if fn is None:
                print(f"  {name}: MISSING entry"); failures += 1
                continue
            try:
                df = fn(spark, sf_dir)
                df.collect()  # AQE finalizes the plan during execution
                plan = df._jdf.queryExecution().executedPlan().toString()
            except Exception as exc:
                print(f"  {name}: ERR {str(exc)[:90]}"); failures += 1
                continue
            flags = corpus_broadcasts(plan)
            if os.environ.get("BA_DUMP"):
                for line, subtxt in flags:
                    print(f"    DUMP {line}")
                    for s in subtxt.splitlines()[:5]:
                        print(f"      | {s.strip()[:120]}")
            bad = triage(name, flags)
            if not flags:
                print(f"  {name}: ok")
            elif not bad:
                print(f"  {name}: benign ({_BENIGN[name]['reason']})")
            else:
                failures += 1
                print(f"  {name}: FLAG — corpus-derived broadcast side"
                      f" ({len(bad)} of {len(flags)} unmatched)")
                for f in bad:
                    print(f"      {f}")
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
