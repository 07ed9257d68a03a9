"""SparkSession factory with scale-appropriate defaults.

Designed for a 1000-executor cluster reading ~100 TB; tested on
``local[N]``.  Every setting here is a default, overridable by the caller
or by ``spark-defaults.conf`` on a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults chosen for the 100 TB posture:
#  - AQE on: runtime shuffle-partition coalescing + skew-join splitting.
#  - shuffle.partitions: a starting point only; AQE coalesces down and a
#    real cluster would raise it (rule of thumb: ~2-3x total cores, with
#    partitions sized 128-512 MB post-compression).
#  - Arrow on: every pandas_udf / mapInPandas stage moves columnar batches.
#  - autoBroadcastJoinThreshold raised: dims (region/nation/part at TPC-H
#    scale, query-vector tables here) should always broadcast.
_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    # AQE coalescing targets max(totalBytes/defaultParallelism,
    # minPartitionSize).  The 1 MB default floor assumes per-row cost is
    # byte-proportional; this engine's hot post-shuffle stages are often
    # BYTE-LIGHT but CPU-HEAVY (pair GEMMs over grouped vectors, shingle
    # explodes, hash verification), and a sub-MB shuffle collapsing to
    # one task serializes them (r13 profile: semantic_dedup's blocked
    # GEMM ran as 1 task).  256k splits those stages across cores once
    # they carry a few MB while keeping trivial sub-256k shuffles at one
    # task (measured: 16k over-fragmented exchange-reuse-heavy plans —
    # market_basket_lift 2.3s -> 3.2s — while 256k kept both it and the
    # GEMM/shingle family fast).  At any real shuffle size
    # totalBytes/parallelism >> 256k, so the floor is never the binding
    # term on a cluster.
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "256k",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    # local-mode driver = the whole JVM (all executor threads + cached
    # artifacts share this heap); 16g keeps GC pressure off the bench
    # now that signature/quantized/IVF artifacts stay persisted
    # in-session.  On a real cluster this is an executor-memory knob.
    "spark.driver.memory": "16g",
    # v2 output committer: task commit moves files to their final
    # location directly, removing the O(#files) driver-side rename pass
    # of the job commit — the IVF/LSH index artifacts here are
    # partitioned directory trees (hundreds of partition dirs per
    # write), where the v1 sequential driver rename pass is a measurable
    # constant per build and an O(files) driver stall at production
    # partition counts.  Standard at-scale setting on filesystems with
    # atomic rename; revisit only for object stores without one.
    "spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version": "2",
    "spark.ui.enabled": "false",
    "spark.ui.showConsoleProgress": "false",
}


def get_spark(
    app_name: str = "inmem-vector-db-spark",
    master: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS or *]`` so the same
    code runs unchanged under a cluster manager (where ``master`` is
    supplied externally and this argument stays ``None``).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_CPUS" in os.environ:
        master = f"local[{os.environ['SPARK_GRAFT_CPUS']}]"
    if master is None:
        master = "local[*]"
    builder = builder.master(master)
    conf = dict(_DEFAULTS)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
