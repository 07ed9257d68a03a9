"""Zipf-skew decade probe for the census/canonical-pick family (r11)
and the stats family (r12).

The uniform 10x synths (``scale_probe_decade*.py``) are id-shifted
copies — exactly the distribution that HIDES hot-key stragglers.  This
tool stages a skewed decade: 10x the sf0.1 documents table with ONE
document's text duplicated onto 30% of the corpus (the web-corpus
boilerplate shape), so every term/shingle/bigram/md5 of that document
becomes a Zipf-hot key holding ~150k rows.  r12 adds a skewed EVENTS
decade (one event_type forced onto 80% of a 10x stream) and a skewed
EMBEDDINGS decade (one label on 80%) for the stats-family keys
(label/event_type/lang/source), probing both the de-skewed registry
entries (embedding_norm_outliers, ridge_conformal_intervals) and the
percentile_approx production twins of the exact order-statistic
entries (winsorized/mad/quality-quantile).

It then executes each census/canonical entry at that corpus with AQE
skew-join thresholds scaled DOWN proportionally to the synth size
(2 MB skewed-partition threshold / 1 MB advisory target, standing in
for the 256 MB / 64 MB defaults at cluster scale) and measures, from
the Spark UI REST API, the **max single-task share of shuffle-read
records** over every stage the entry ran.  A partition-only window on
the hot key funnels ~30% of the corpus into ONE task (share ≈ 0.3+,
unsplittable — WindowExec is not covered by AQE skew splitting); the
r11 census + ``shuffle_hash``-pinned join-back form map-side-combines
the census and lets AQE split the probe-side join partition, so every
stage's max-task input stays bounded.

Two assertions per entry:
  1. max-task shuffle-read bytes <= MAX_TASK_BYTES on every stage that
     read >= MIN_RECORDS records (the empirical
     no-single-task-hot-partition check the r10 verdict asked for);
  2. the executed plan contains no WindowExec partitioned by a corpus
     key (term/sh/shingle/g/md5(text)/fingerprint) — the plan-shape
     regression pin for the hazard class itself.  Windows keyed by
     doc_id (per-doc rank) are fine: doc_id is unique, never hot.

Usage:
    python tools/skew_probe.py                # stage (first run) + probe
    python tools/skew_probe.py tfidf_top_terms ...   # subset
"""

from __future__ import annotations

import json
import os
import re
import sys
import urllib.request

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402

ZIPF_DIR = "/tmp/spark_graft_sf1_zipf"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
HOT_FRACTION_MOD = 10  # doc_id % 10 < 3  ->  30% of rows carry HOT text

# every stage that shuffle-reads >= MIN_RECORDS records must keep its
# biggest task under MAX_TASK_BYTES of shuffle-read.  Bytes, not record
# share: with a 1 MB advisory target AQE legitimately coalesces a
# small exchange into ONE task (share 1.0, ~1 MB — not a straggler),
# while a split/coalesced join task stays near the advisory size and a
# skewed partition may legally reach the 2 MB skew threshold before
# splitting triggers.  5 MB = 2.5x the scaled skew threshold: no legal
# AQE-managed task gets there (worst legit task observed across both
# probe families: 2.3 MB), while hot-key WINDOW partitions overshoot
# it — the docs controls by an order of magnitude, the narrower
# stats-family control (event_type, 80% hot, 16-byte rows) at 6.7 MB.
# Tightened from 8 MB in r12 so the bytes channel is an INDEPENDENT
# backstop for the stats keys too, not only the plan regex.
MAX_TASK_BYTES = 5 * 1024 * 1024
MIN_RECORDS = 50_000

# WindowExec partition keys that are corpus-derived (hot under Zipf)
# or low-cardinality (one task per key however large the stream —
# the r12 stats-family extension: label/event_type/lang/source).
# doc_id windows (per-doc rank) are exempt: unique key, never hot.
# r12 hardening (advisor r11): the key is matched ANYWHERE in the
# partition list (a composite partitionBy(source, sh) no longer
# escapes), behind a word-boundary lookbehind so `lang#` never
# matches as `g#`, and the md5(...) EXPRESSION match is positional
# anywhere too (a renamed alias cannot dodge it).
_CORPUS_KEYS = r"(?:term|sh|shingle|g|h|fp|label|event_type|lang|source)"
# Every bracket/paren scan below is TEMPERED: it cannot cross a
# sort-direction token, so order/tie-break columns (always rendered
# with ASC/DESC) never match — only true PARTITION columns do.  This
# also makes the empty-partition case safe: a GLOBAL window prints
# `Window [exprs], [order]` with the partition bracket omitted, so an
# untempered "bracket 2" scan would read the ORDER spec and flag
# global vocab-rank windows on their sort column (observed r12 on
# vocab_encode/oov_rate/source_token_gini).
_HOT_KEY_ALT = r"(?:(?<![A-Za-z0-9_])" + _CORPUS_KEYS + r"#|md5\()"
_HOT_WINDOW_KEY = re.compile(
    # Window [exprs], [PARTITION], [order] — key in bracket 2
    r"Window \[[^\]]*\], \[(?:(?! ASC| DESC)[^\]])*?" + _HOT_KEY_ALT + r"|"
    # WindowGroupLimit [PARTITION], [order], rank — key in bracket 1
    r"WindowGroupLimit \[(?:(?! ASC| DESC)[^\]])*?" + _HOT_KEY_ALT + r"|"
    # spec form: partition args precede the order/frame args
    r"windowspecdefinition\((?:(?! ASC| DESC|specifiedwindowframe)[^)])*?"
    + _HOT_KEY_ALT
)

ENTRIES = [
    "tfidf_top_terms",
    "duplicated_spans",
    "bigram_lm_score",
    "crossdoc_shingle_dup",
    "boilerplate_ngrams",
    "corpus_curation",
    "corpus_pipeline_full",
    # r12: the de-skewed stats-family registry entries
    "embedding_norm_outliers",
    "ridge_conformal_intervals",
]


def _twin(modname: str, fname: str, table: str):
    """Loader-wrapping thunk for a production twin: (spark, sf_dir) ->
    twin(load_table(table)).  Twins take DataFrames, not sf dirs, so
    the probe and the pytest gate share these adapters."""

    def thunk(spark, sf_dir):
        import importlib

        from inmem_vector_db_spark.sources.loader import load_table

        fn = getattr(
            importlib.import_module(f"inmem_vector_db_spark.plans.{modname}"),
            fname,
        )
        return fn(load_table(spark, sf_dir, table))

    return thunk


# r12: the skew-capped PRODUCTION twins of the exact order-statistic
# entries (the exact forms keep their per-key rank windows by design —
# they are the oracle QA forms and carry documented skew bounds; what
# must stay hot-key-free at scale is the form a pipeline would run).
# Names must match broadcast_audit._BENIGN keys — pinned by
# tests/test_broadcast_gate.py's stale-allowlist ratchet.
TWINS = [
    (n, _twin(m, n, t))
    for n, m, t in (
        ("winsorized_stats_approx", "relational", "events"),
        ("mad_outliers_approx", "relational", "events"),
        ("quality_quantile_filter_approx", "textops", "documents"),
    )
]


def stage_zipf(spark) -> None:
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    if not os.path.exists(f"{ZIPF_DIR}/documents.parquet/_SUCCESS"):
        from inmem_vector_db_spark.functions.text import (
            lang_id,
            quality_score,
        )

        docs = spark.read.parquet(f"{SRC_DIR}/documents.parquet")
        # one real doc = the boilerplate; it must SURVIVE the curation
        # gates (lang='en', q>=0.45) or the canonical-pick entries
        # (corpus_curation / corpus_pipeline_full) would filter the hot
        # key away before their groupBy(md5) and probe nothing
        hot_text = (
            docs.where(
                (lang_id("text") == "en") & (quality_score("text") >= 0.45)
            )
            .orderBy("doc_id")
            .select("text")
            .head()[0]
        )
        n = docs.agg(F.max("doc_id")).head()[0] + 1
        decade = reduce(
            DataFrame.union,
            [
                docs.withColumn("doc_id", F.col("doc_id") + F.lit(i * n))
                for i in range(COPIES)
            ],
        )
        skewed = decade.withColumn(
            "text",
            F.when(
                F.col("doc_id") % HOT_FRACTION_MOD < 3, F.lit(hot_text)
            ).otherwise(F.col("text")),
        )
        skewed.write.mode("overwrite").parquet(f"{ZIPF_DIR}/documents.parquet")
    import shutil

    def _replace(tgt):
        if os.path.exists(tgt):
            (shutil.rmtree if os.path.isdir(tgt) else os.remove)(tgt)

    # r12: skewed EVENTS decade (one event_type forced onto 80% of a
    # 10x stream) for the stats-family probes — the shape where a
    # Window.partitionBy(event_type) funnels 80% of the corpus into
    # one task while the census/percentile_approx forms stay bounded
    ev_marker = f"{ZIPF_DIR}/.events_skewed_v1"
    if not os.path.exists(ev_marker):
        ev = spark.read.parquet(f"{SRC_DIR}/events.parquet")
        hot_type = (
            ev.groupBy("event_type")
            .count()
            .orderBy(F.desc("count"), "event_type")
            .head()[0]
        )
        n_ev = ev.agg(F.max("event_id")).head()[0] + 1
        dec = reduce(
            DataFrame.union,
            [
                ev.withColumn("event_id", F.col("event_id") + F.lit(i * n_ev))
                for i in range(COPIES)
            ],
        )
        skewed_ev = dec.withColumn(
            "event_type",
            F.when(
                F.col("event_id") % 10 < 8, F.lit(hot_type)
            ).otherwise(F.col("event_type")),
        )
        _replace(f"{ZIPF_DIR}/events.parquet")
        skewed_ev.write.parquet(f"{ZIPF_DIR}/events.parquet")
        open(ev_marker, "w").close()

    # r12: skewed EMBEDDINGS decade (one label on 80% of a 10x table)
    # for embedding_norm_outliers — same hazard, label key
    emb_marker = f"{ZIPF_DIR}/.embeddings_skewed_v1"
    if not os.path.exists(emb_marker):
        emb = spark.read.parquet(f"{SRC_DIR}/embeddings.parquet")
        hot_label = (
            emb.groupBy("label")
            .count()
            .orderBy(F.desc("count"), "label")
            .head()[0]
        )
        n_emb = emb.agg(F.max("vec_id")).head()[0] + 1
        dec = reduce(
            DataFrame.union,
            [
                emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * n_emb))
                for i in range(COPIES)
            ],
        )
        skewed_emb = dec.withColumn(
            "label",
            F.when(F.col("vec_id") % 10 < 8, F.lit(hot_label)).otherwise(
                F.col("label")
            ),
        )
        _replace(f"{ZIPF_DIR}/embeddings.parquet")
        skewed_emb.write.parquet(f"{ZIPF_DIR}/embeddings.parquet")
        open(emb_marker, "w").close()

    for t in (
        "region", "nation", "supplier", "part", "customer",
        "orders", "lineitem",
    ):
        s, d = f"{SRC_DIR}/{t}.parquet", f"{ZIPF_DIR}/{t}.parquet"
        if not os.path.exists(d):
            (shutil.copytree if os.path.isdir(s) else shutil.copy)(s, d)


def _rest(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=30) as r:
        return json.loads(r.read())


def stage_shares(spark, group: str) -> list[dict]:
    """Per completed stage of the jobs tagged ``group`` (UI REST API):
    stage id, name, total shuffle-read records/bytes, and the max
    single task's records/bytes (quantile 1.0 of the task summary)."""
    base = f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{spark.sparkContext.applicationId}"
    sids = sorted(
        {
            sid
            for j in _rest(base, "/jobs")
            if j.get("jobGroup") == group
            for sid in j["stageIds"]
        }
    )
    out = []
    for sid in sids:
        for att in _rest(base, f"/stages/{sid}"):
            total = att.get("shuffleReadRecords", 0)
            if total < MIN_RECORDS:
                continue
            q = _rest(
                base,
                f"/stages/{sid}/{att['attemptId']}/taskSummary?quantiles=1.0",
            )
            srm = q.get("shuffleReadMetrics", {})
            mx_rec = srm.get("readRecords", [0])[0]
            if "readBytes" in srm:
                mx_bytes = srm["readBytes"][0]
            else:  # older field split: remote + local
                mx_bytes = (
                    srm.get("remoteBytesRead", [0])[0]
                    + srm.get("localBytesRead", [0])[0]
                )
            out.append(
                {
                    "sid": sid,
                    "name": att.get("name", "")[:60],
                    "records": total,
                    "bytes": att.get("shuffleReadBytes", 0),
                    "max_task_records": int(mx_rec),
                    "max_task_bytes": int(mx_bytes),
                    "share": round(mx_rec / total, 4) if total else 0.0,
                }
            )
    return out


def _control_window(spark, sf_dir):
    """POSITIVE CONTROL: the exact r10 window-count form of
    crossdoc_shingle_dup (count over Window.partitionBy(sh)).  The
    probe must FLAG this — both the plan check (hot-key WindowExec)
    and the bytes check (one task swallows the hot shingle partition)
    — proving it can see the hazard class the de-skewed entries left."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from inmem_vector_db_spark.operators.signatures import (
        corpus_signature_index,
    )

    sh = corpus_signature_index(spark, sf_dir).select(
        "doc_id", F.explode("shset5").alias("sh")
    )
    return (
        sh.withColumn("n_docs", F.count(F.lit(1)).over(Window.partitionBy("sh")))
        .groupBy("doc_id")
        .agg(F.sum((F.col("n_docs") > 1).cast("long")).alias("n_shared"))
    )


def _control_window_stats(spark, sf_dir):
    """POSITIVE CONTROL #2 (r12): the pre-r12 stats-family window form
    (avg over Window.partitionBy(event_type) on the full event stream
    — the shape embedding_norm_outliers had on `label`).  Against the
    skewed-events decade (one type on 80% of rows) the probe must FLAG
    this via the widened key regex and/or the hot-partition bytes
    check, proving the r12 key extension has eyes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("event_type")
    return (
        ev.withColumn("mu", F.avg("value").over(w))
        .groupBy("event_type")
        .agg(
            F.sum((F.col("value") > F.col("mu")).cast("long")).alias(
                "n_above"
            )
        )
    )


def main() -> int:
    names = sys.argv[1:] or ENTRIES
    spark = get_spark(
        "skew_probe",
        extra_conf={
            "spark.ui.enabled": "true",
            # scaled-down stand-ins for the 256 MB / 64 MB cluster
            # defaults, proportional to the synth corpus size — the
            # probe demonstrates the MECHANISM (AQE splits the hot
            # join partition; it cannot split a hot window partition)
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2m",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    stage_zipf(spark)
    qs = entrymod.queries()
    failures = 0

    def probe(name: str, fn) -> str:
        """Run one query at the Zipf dir; return 'flag', 'ok' or 'err'.
        'err' is its own status (advisor r11): a control that CRASHES
        must count as PROBE BLIND, not as a successful flag."""
        spark.sparkContext.setJobGroup(name, name)
        try:
            df = fn(spark, ZIPF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"  {name}: ERR {str(exc)[:90]}")
            return "err"
        finally:
            spark.sparkContext.setJobGroup("idle", "idle")
        hot_windows = [
            ln.strip()[:100]
            for ln in plan.splitlines()
            if _HOT_WINDOW_KEY.search(ln)
        ]
        shares = stage_shares(spark, name)
        if os.environ.get("SKEW_PROBE_VERBOSE"):
            for st in shares:
                print(f"      {st}")
        worst = max((st["max_task_bytes"] for st in shares), default=0)
        bad = [st for st in shares if st["max_task_bytes"] > MAX_TASK_BYTES]
        status = "ok"
        if hot_windows:
            status = "FLAG hot-key window"
        elif bad:
            status = "FLAG hot partition"
        print(
            f"  {name}: {status}  worst_task={worst/1e6:.2f}MB "
            f"({len(shares)} shuffle stages >= {MIN_RECORDS} rows)"
        )
        for st in bad:
            print(
                f"      stage {st['sid']}: {st['records']} rows, max task "
                f"{st['max_task_bytes']/1e6:.2f}MB "
                f"(share {st['share']}) {st['name']}"
            )
        for w in hot_windows:
            print(f"      {w}")
        return "flag" if status != "ok" else "ok"

    twin_by_name = dict(TWINS)
    unknown = [n for n in names if n not in qs and n not in twin_by_name]
    if unknown:  # loud, not silent: a typo must not yield a green run
        print(f"UNKNOWN entries: {unknown}", file=sys.stderr)
        return 2
    probees = [(n, qs[n]) for n in names if n in qs]
    probees += [t for t in TWINS if not sys.argv[1:] or t[0] in names]
    for name, fn in probees:
        if probe(name, fn) != "ok":
            failures += 1
    # positive controls: the r10 window forms MUST flag, or the probe
    # has lost its eyes (REST metric-name drift, regex rot).  An ERR
    # in a control is PROBE BLIND too — a crashed control observed no
    # flag (advisor r11).
    for cname, cfn in (
        ("control_r10_window_form", _control_window),
        ("control_stats_window_form", _control_window_stats),
    ):
        if probe(cname, cfn) != "flag":
            print(f"  {cname}: PROBE BLIND — expected a FLAG")
            failures += 1
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
