"""Fourth-decade scaling probe for the RELATIONAL/stats family.

Twin of ``scale_probe_decade.py`` (which synthesizes a 10x documents
corpus): builds a synthetic 10x of sf0.1's orders / lineitem / events by
unioning 10 key-shifted copies — o_orderkey/l_orderkey/user_id/event_id
are offset per copy so keys never collide and every per-key group
(baskets, user histories) keeps its original size; value/price columns
are unchanged, so per-copy distributions are identical and the
statistic-level work (ECDF merge, replica sums, basket pairs) scales
with ROW COUNT, which is the thing being measured.

Writes /tmp/spark_graft_sf1_rel/{orders,lineitem,events}.parquet on
first run, then times each query at sf0.1 vs the synthetic decade and
prints the per-decade alpha.

Usage: python tools/scale_probe_decade_rel.py [query ...]
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

SYNTH_DIR = "/tmp/spark_graft_sf1_rel"
SRC_DIR = "/root/testdata/sf0.1"
COPIES = 10
KEY_STRIDE = 100_000_000

DEFAULT = [
    "bootstrap_ci_order_value",
    "market_basket_lift",
    "ks_drift_by_type",
    "survival_time_to_purchase",
    "benford_audit",
]


def build(spark) -> None:
    from pyspark.sql import functions as F
    from functools import reduce
    from pyspark.sql import DataFrame

    specs = {
        "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],
        "events": ["event_id", "user_id"],
        # customer shifts WITH o_custkey so the orders->customer join
        # stays intact in the synthetic decade (each copy keeps its own
        # customers; per-customer group sizes preserved) — required by
        # the ridge/ML family probes
        "customer": ["c_custkey"],
    }
    for table, key_cols in specs.items():
        src = spark.read.parquet(f"{SRC_DIR}/{table}.parquet")
        copies = []
        for i in range(COPIES):
            c = src
            for k in key_cols:
                c = c.withColumn(k, F.col(k) + F.lit(i * KEY_STRIDE))
            copies.append(c)
        reduce(DataFrame.union, copies).write.mode("overwrite").parquet(
            f"{SYNTH_DIR}/{table}.parquet"
        )
    # tables the loader may need but the probe queries don't scale
    for table in (
        "region", "nation", "supplier", "part",
        "documents", "embeddings",
    ):
        spark.read.parquet(f"{SRC_DIR}/{table}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{SYNTH_DIR}/{table}.parquet")


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("decade-probe-rel")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(f"{SYNTH_DIR}/orders.parquet"):
        build(spark)
    qs = entrymod.queries()
    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for sf_dir in (SRC_DIR, SYNTH_DIR):
            fn(spark, sf_dir).collect()  # warm
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - t0)
        alpha = math.log(times[1] / times[0]) / math.log(COPIES)
        out[name] = {
            "sf0.1_s": round(times[0], 3),
            "sf1_synth_s": round(times[1], 3),
            "alpha": round(alpha, 3),
        }
        print(
            f"{name:30s} {times[0]:7.2f}s {times[1]:7.2f}s  alpha={alpha:+.2f}"
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
