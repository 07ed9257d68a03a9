"""Empirical scaling probe: run headline operators at sf0.001 / 0.01 /
0.1 (100x data range) and print wall time per SF plus the measured
scaling exponent alpha (t ~ n^alpha; alpha <= ~1 = linear or better —
the 'would it survive 100x?' check done with data instead of argument).

Usage: python tools/scale_probe.py [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402

SFS = [("sf0.001", 0.001), ("sf0.01", 0.01), ("sf0.1", 0.1)]
DEFAULT = [
    "knn_cosine",
    "knn_multi_cosine",
    "lsh_knn_cosine",
    "q1_pricing_summary",
    "q7_nation_volume",
    "dedup_minhash_pairs",
    "events_hourly",
    "chunk_documents",
]


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for dirname, _sf in SFS:
            sf_dir = f"/root/testdata/{dirname}"
            fn(spark, sf_dir).collect()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        # fit alpha over the 100x span: slope of log(t) vs log(n)
        alpha = (math.log(times[2]) - math.log(times[0])) / (
            math.log(0.1) - math.log(0.001)
        )
        out[name] = {
            "sf0.001_s": round(times[0], 3),
            "sf0.01_s": round(times[1], 3),
            "sf0.1_s": round(times[2], 3),
            "alpha": round(alpha, 3),
        }
        print(f"{name:28s} {times[0]:7.2f}s {times[1]:7.2f}s {times[2]:7.2f}s  alpha={alpha:+.2f}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
