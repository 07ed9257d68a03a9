"""Controlled fresh-session A/B probe (judge r9 item #2).

Times a SEQUENCE of entries (caller passes them in exec_order) in one
fresh SparkSession against a chosen TREE (``--tree`` points sys.path at
a git worktree of another commit, e.g. the r8 tree), so a bench-tail
delta can be attributed to code vs host drift: same host, same
sequence, same fresh process-level artifact state on both trees.  This
is the same protocol that exonerated ``ann_ivf_recall`` in round 9
(BASELINE.md "Round-9 final gates": identical 4.60 s first-call on both
trees).

Usage:
    python tools/ab_entry_probe.py --tree /root/repo [--sf DIR] name...
    python tools/ab_entry_probe.py --tree /root/repo/.ab_r8 ... name...

Prints one JSON line: {"tree": ..., "sf": ..., "timings": {name: sec}}.
Each entry is timed ONCE (first call, build-inclusive — matching how
bench times build rows); pass --warm to add a second timed call per
entry (memo-hit cost) under "warm".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", required=True)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--warm", action="store_true")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    tree = os.path.abspath(args.tree)
    sys.path.insert(0, tree)
    os.chdir(tree)  # relative paths (spark-warehouse) resolve per-tree

    import __spark_entry__ as entrymod
    from inmem_vector_db_spark.session import get_spark

    spark = get_spark("ab_probe")
    spark.sparkContext.setLogLevel("ERROR")
    # same steady-state warmup policy as bench.py: parquet footers, the
    # heavy codegen families on the tiny corpus, and every memoized
    # query-vector fetch — so first-call timings measure the entry, not
    # first-touch JIT (and both trees start from the identical state)
    spark.read.parquet(f"{args.sf}/embeddings.parquet").count()
    try:
        from inmem_vector_db_spark.operators.signatures import (
            text_signature_index,
        )

        tiny = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        text_signature_index(tiny).write.format("noop").mode(
            "overwrite"
        ).save()
        from inmem_vector_db_spark.operators.knn import knn

        tiny_emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        )
        qv = [float(x) for x in tiny_emb.limit(1).collect()[0]["embedding"]]
        knn(tiny_emb, qv, k=3, metric="cosine").collect()
        for vid in entrymod.query_vec_ids():
            entrymod._query_vec(spark, args.sf, vid)
        warmup_failed = None
    except Exception as exc:  # a cold tree breaks the A/B premise —
        # record it so cross-tree comparisons can be invalidated
        warmup_failed = f"{type(exc).__name__}: {exc}"
        print(f"WARMUP FAILED on {tree}: {warmup_failed}", file=sys.stderr)

    qmap = entrymod.queries()
    pos = {n: i for i, n in enumerate(entrymod.exec_order())}
    names = sorted(args.names, key=lambda n: pos[n])
    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        qmap[name](spark, args.sf).collect()
        timings[name] = round(time.perf_counter() - t0, 3)
        if args.warm:
            t0 = time.perf_counter()
            qmap[name](spark, args.sf).collect()
            warm[name] = round(time.perf_counter() - t0, 3)
    out = {"tree": tree, "sf": args.sf, "timings": timings}
    if warmup_failed is not None:
        out["warmup_failed"] = warmup_failed
    if args.warm:
        out["warm"] = warm
    print(json.dumps(out, separators=(",", ":")))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
