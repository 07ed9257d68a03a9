"""Deterministic sketches: approximate algorithms that are still
oracle-checkable.

Spark's built-in ``approx_count_distinct`` (HyperLogLog++) and
``percentile_approx`` are black-box: their internal hashing is not
reproducible outside the JVM, so an external oracle can only check them
with tolerance bands. These sketches use the repo's portable md5
scheme (``functions.text.shingle_hash``) instead, so DuckDB computes
bit-identical sketch contents and the driver's value-hash gate applies
to *approximate* operators too — the same trick that made SimHash and
the LSH planes oracle-checkable.

- KMV (k-minimum-values) distinct estimator: keep the k smallest
  distinct hash values; estimate = (k-1) / max_normalized. Bottom-k of
  a distinct hash set is ``TakeOrderedAndProject`` after a partial
  distinct — fully distributed, O(k) driver footprint, mergeable
  across partitions/days by unioning bottom-k sets. (Bar-Yossef et al.,
  "Counting distinct elements in a data stream", RANDOM'02.)

- Count-min sketch: depth x width counter matrix via universal integer
  hashing of the 60-bit md5; point estimate = min over rows. The
  matrix build is one groupBy (partial-aggregated map-side), the
  lookup a broadcast join — no row-level state. (Cormode &
  Muthukrishnan, J. Algorithms 2005.)

At 100 TB both sketches are the standard answer to "distinct users per
day for a year" / "frequency of every token": fixed-size state,
map-side combinable, unionable across time partitions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from inmem_vector_db_spark.functions.text import (
    MINHASH_P as _P,
    shingle_hash,
)
_HASH_SPACE = float(1 << 60)  # shingle_hash is 60-bit


def kmv_bottom_k(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """The k smallest distinct 60-bit hashes of ``col`` — the entire
    KMV sketch state, as a DataFrame of ``hv`` ascending."""
    return (
        df.select(shingle_hash(F.col(col).cast("string")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_estimate(df: DataFrame, col: str, k: int = 64) -> DataFrame:
    """One-row DataFrame: ``n_kept`` (sketch fill), ``estimate``
    (distinct-count estimate, exact when fill < k)."""
    bk = kmv_bottom_k(df, col, k)
    return bk.agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
            .otherwise(
                F.lit(float(k - 1)) / (F.max("hv") / F.lit(_HASH_SPACE))
            ),
            6,
        ).alias("estimate"),
    )


def cms_bucket(col: Column, row: int, width: int) -> Column:
    """Row-``row`` bucket of a count-min sketch: universal hash of the
    60-bit md5, mirroring the minhash permutation constants so the
    DuckDB oracle can recompute it verbatim."""
    h = shingle_hash(col.cast("string")) % _P
    a = (507_952_114 * (row + 1)) % _P
    b = 40_503 * (row + 7)
    return ((F.lit(a) * h + F.lit(b)) % _P % width).cast("int")


def countmin_build(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """Counter matrix as rows ``(row, bucket, cnt)`` — one groupBy, so
    the heavy lifting is a map-side partial count of depth*width cells."""
    c = F.col(col)
    rows = [
        df.select(
            F.lit(r).alias("row"),
            cms_bucket(c, r, width).alias("bucket"),
        )
        for r in range(depth)
    ]
    u = rows[0]
    for r in rows[1:]:
        u = u.unionByName(r)
    return u.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def countmin_lookup(
    cms: DataFrame,
    keys: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates for ``keys``: min over the sketch rows
    of the key's bucket counters (classic CMS over-estimate). The
    sketch is depth*width rows — broadcast to the keys side."""
    c = F.col(col)
    probes = None
    for r in range(depth):
        p = keys.select(
            c.alias(col),
            F.lit(r).alias("row"),
            cms_bucket(c, r, width).alias("bucket"),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(cms), ["row", "bucket"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_n"))
    )
