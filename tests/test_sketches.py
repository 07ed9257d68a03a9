"""Sketch properties: KMV accuracy/exactness/mergeability, CMS
over-estimate guarantee and counter-matrix mergeability."""

from __future__ import annotations

from pyspark.sql import functions as F

from inmem_vector_db_spark.functions.sketches import (
    countmin_build,
    countmin_lookup,
    kmv_bottom_k,
    kmv_estimate,
)


def _ids(spark, n, offset=0):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("key")
    )


def test_kmv_exact_below_k(spark):
    row = kmv_estimate(_ids(spark, 40), "key", k=64).first()
    assert row["n_kept"] == 40
    assert row["estimate"] == 40.0


def test_kmv_estimate_accuracy(spark):
    row = kmv_estimate(_ids(spark, 1000), "key", k=64).first()
    assert row["n_kept"] == 64
    # k=64 -> typical relative error ~1/sqrt(64-2) ~ 13%; allow 3 sigma
    assert abs(row["estimate"] - 1000) / 1000 < 0.40


def test_kmv_duplicates_do_not_inflate(spark):
    once = kmv_estimate(_ids(spark, 500), "key", k=32).first()
    tripled = kmv_estimate(
        _ids(spark, 500).union(_ids(spark, 500)).union(_ids(spark, 500)),
        "key",
        k=32,
    ).first()
    assert once["estimate"] == tripled["estimate"]


def test_kmv_bottom_k_mergeable(spark):
    # union of per-shard bottom-k re-sketched == bottom-k of the whole:
    # the property that lets daily sketches roll up to monthly ones
    whole = [r["hv"] for r in kmv_bottom_k(_ids(spark, 600), "key", 32).collect()]
    a = kmv_bottom_k(_ids(spark, 300), "key", 32)
    b = kmv_bottom_k(_ids(spark, 300, offset=300), "key", 32)
    merged = [
        r["hv"]
        for r in a.union(b).orderBy("hv").limit(32).collect()
    ]
    assert merged == whole


def test_cms_never_underestimates(spark):
    # skewed frequencies: key i repeated (i % 7 + 1) times
    df = _ids(spark, 300).withColumn(
        "reps", F.col("key") % 7 + 1
    ).select(F.explode(F.expr("array_repeat(key, int(reps))")).alias("key"))
    exact = df.groupBy("key").agg(F.count(F.lit(1)).alias("exact_n"))
    cms = countmin_build(df, "key", depth=4, width=512)
    got = countmin_lookup(
        cms, df.select("key").distinct(), "key", depth=4, width=512
    )
    joined = exact.join(got, "key").collect()
    assert len(joined) == 300
    assert all(r["cms_n"] >= r["exact_n"] for r in joined)
    # load factor 300/512 -> P(some row collision-free) ~ 1-(1-.55)^4
    exact_frac = sum(r["cms_n"] == r["exact_n"] for r in joined) / 300
    assert exact_frac > 0.8


def test_cms_counters_mergeable(spark):
    df = _ids(spark, 400)
    half1, half2 = _ids(spark, 200), _ids(spark, 200, offset=200)
    whole = countmin_build(df, "key", depth=2, width=64)
    merged = (
        countmin_build(half1, "key", depth=2, width=64)
        .unionByName(countmin_build(half2, "key", depth=2, width=64))
        .groupBy("row", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    diff = whole.join(
        merged, ["row", "bucket"], "full_outer"
    ).where(
        ~whole["cnt"].eqNullSafe(merged["cnt"])
    )
    assert diff.count() == 0
