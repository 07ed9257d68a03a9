"""Zipf-skew decade probe for the census/canonical-pick family (r11).

The uniform 10x synths (``scale_probe_decade*.py``) are id-shifted
copies — exactly the distribution that HIDES hot-key stragglers.  This
tool stages a skewed decade: 10x the sf0.1 documents table with ONE
document's text duplicated onto 30% of the corpus (the web-corpus
boilerplate shape), so every term/shingle/bigram/md5 of that document
becomes a Zipf-hot key holding ~150k rows.

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
# splitting triggers.  8 MB = 4x the scaled skew threshold: no legal
# AQE-managed task gets there, while a hot-key WINDOW partition (~30%
# of an exploded corpus stream, unsplittable) overshoots it by an
# order of magnitude.
MAX_TASK_BYTES = 8 * 1024 * 1024
MIN_RECORDS = 50_000

# WindowExec partition keys that are corpus-derived (hot under Zipf).
# doc_id windows (per-doc rank) are exempt: unique key, never hot.
_HOT_WINDOW_KEY = re.compile(
    r"Window(?:GroupLimit)? \[[^\]]*\], \[(?:term|sh|shingle|g|h|fp)#|"
    r"windowspecdefinition\((?:term|sh|shingle|g|h|fp)#|"
    r"windowspecdefinition\(md5\("
)

ENTRIES = [
    "tfidf_top_terms",
    "duplicated_spans",
    "bigram_lm_score",
    "crossdoc_shingle_dup",
    "boilerplate_ngrams",
    "corpus_curation",
    "corpus_pipeline_full",
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

    for t in (
        "region", "nation", "supplier", "part", "customer",
        "orders", "lineitem", "events", "embeddings",
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

    def probe(name: str, fn) -> bool:
        """Run one query at the Zipf dir, return True when it FLAGs."""
        spark.sparkContext.setJobGroup(name, name)
        try:
            df = fn(spark, ZIPF_DIR)
            df.collect()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"  {name}: ERR {str(exc)[:90]}")
            return True
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
        return status != "ok"

    for name in names:
        if probe(name, qs[name]):
            failures += 1
    # positive control: the r10 window form MUST flag, or the probe
    # has lost its eyes (e.g. the REST metric names drifted)
    if not probe("control_r10_window_form", _control_window):
        print("  control_r10_window_form: PROBE BLIND — expected a FLAG")
        failures += 1
    print(f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
