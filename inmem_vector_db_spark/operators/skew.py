"""Skew-handling utilities for 100 TB-scale joins and aggregations.

AQE's skew-join splitting (on by default, ``session.py``) handles most
runtime skew.  Salting is the *planned* counterpart for the cases AQE
can't fix: a single hot key inside a shuffle hash aggregation, or a
broadcast-infeasible join where one key holds >> one partition of rows.

``salted_agg`` demonstrates the canonical two-phase pattern:

    phase 1: groupBy(key, salt)  — hot keys spread over S partial groups
    phase 2: groupBy(key)        — merge S partials (S rows per key, tiny)

Any algebraic aggregate (sum/count/min/max, and avg via sum+count)
re-aggregates losslessly, so the result is identical to the direct
groupBy — verified by tests against the unsalted plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, buckets: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Deterministic row salt in [0, buckets): hash of the whole row's
    monotonically-unique id is NOT reproducible, so salt from stable
    columns when determinism matters; here spark_partition_id + a
    per-partition counter is avoided in favor of a cheap random that is
    fine for load-spreading (salt never affects results, only placement).
    """
    return df.withColumn(salt_col, (F.rand(seed=42) * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str] = (),
    count: bool = True,
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation, equivalent to
    ``df.groupBy(keys).agg(sum(...), count(*))``.

    Output columns: ``*keys, sum_<c> for each c, n_rows``.
    """
    salted = with_salt(df, buckets)
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[F.sum(c).alias(f"__s_{c}") for c in sum_cols],
        F.count(F.lit(1)).alias("__n"),
    )
    aggs = [F.sum(f"__s_{c}").alias(f"sum_{c}") for c in sum_cols]
    if count:
        aggs.append(F.sum("__n").alias("n_rows"))
    return phase1.groupBy(*keys).agg(*aggs)


def top_values_per_key(
    df: DataFrame, key: str, threshold: float = 0.01
) -> DataFrame:
    """Key-frequency profile: keys holding more than ``threshold`` of all
    rows — the skew diagnosis step that decides between broadcast,
    salting, and AQE-only."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("frac", F.round(F.col("n") / F.lit(float(total)), 6))
        .filter(F.col("frac") >= threshold)
        .orderBy(F.desc("n"))
    )
