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


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    buckets: int = 16,
    hot_keys: Sequence | None = None,
) -> DataFrame:
    """Skew-safe INNER equi-join for large-large joins where one ``key``
    value holds far more than a partition's worth of ``left`` rows and
    ``right`` is too big to broadcast.

    Pattern: salt the left side into ``buckets`` sub-keys and replicate
    the right side once per bucket (explode of a literal range), joining
    on ``(key, salt)`` — a hot key's rows land on ``buckets`` tasks
    instead of one. Row-for-row identical to the plain join (salt only
    affects placement), verified by tests.

    With ``hot_keys`` given (from ``top_values_per_key``), only those
    keys pay the replication: hot rows take the salted path, the rest
    take the plain join, results unioned. That keeps the replication
    cost at |hot slice of right| * buckets instead of |right| * buckets
    — at 100 TB you always pass ``hot_keys``; full salting is the
    fallback when the profile isn't known.
    """
    salt = (F.rand(seed=42) * buckets).cast("int")
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(buckets - 1))
    ).alias("__salt")

    def _salted(lf: DataFrame, rf: DataFrame) -> DataFrame:
        lfs = lf.withColumn("__salt", salt)
        rfs = rf.select("*", salts)
        out = lfs.join(rfs, [key, "__salt"], "inner")
        return out.drop("__salt")

    if hot_keys is None:
        return _salted(left, right)
    hot = F.col(key).isin(list(hot_keys))
    plain = left.where(~hot).join(right.where(~hot), key, "inner")
    return plain.unionByName(
        _salted(left.where(hot), right.where(hot))
    )


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
