"""Plan-shape regression tests: the optimizations we rely on at 100 TB
must be visible in the physical plan, not assumed.  Plus skew utilities."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.knn import knn, knn_join
from inmem_vector_db_spark.operators.skew import salted_agg, top_values_per_key


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    # other test modules cache() this same path; a cached plan replaces
    # the parquet scan with InMemoryRelation and hides ReadSchema /
    # PushedFilters — clear so plan assertions see the real scan
    spark.catalog.clearCache()
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_knn_plan_no_shuffle_and_pruned_scan(emb):
    """Single-query exact kNN: TakeOrderedAndProject (partition-local
    top-k), no Exchange, and the scan must read only (vec_id, embedding)
    — not label."""
    q = [0.0] * 64
    plan = _plan(knn(emb, q, k=5, metric="euclidean"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
    read = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read and all("label" not in ln for ln in read)


def test_filter_pushdown_reaches_scan(emb):
    plan = _plan(emb.filter(F.col("label") == 3).select("vec_id"))
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert pushed and any("label" in ln for ln in pushed)


def test_knn_join_broadcasts_query_side(emb):
    queries = emb.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    plan = _plan(knn_join(emb, queries, k=3))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_tpch_q5_broadcasts_dims(spark, sf_dir):
    """Small dims (region/nation) must broadcast, not shuffle-join."""
    from inmem_vector_db_spark.plans.relational import q5_region_revenue

    plan = _plan(q5_region_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_wholestage_codegen_covers_distance(emb):
    """Codegen'd stages render as `*(n)` in executedPlan toString; the
    scan+project pipeline for the distance expression must be inside one."""
    q = [float(i) for i in range(64)]
    plan = _plan(knn(emb, q, k=5, metric="cosine"))
    assert "*(1)" in plan


def test_salted_agg_equals_direct(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    direct = {
        r["l_returnflag"]: (round(r["s"], 6), r["n"])
        for r in events.groupBy("l_returnflag")
        .agg(F.round(F.sum("l_quantity"), 6).alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["sum_l_quantity"], 6), r["n_rows"])
        for r in salted_agg(events, ["l_returnflag"], ["l_quantity"]).collect()
    }
    assert salted == direct


def test_top_values_per_key_profile(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prof = top_values_per_key(events, "l_returnflag", threshold=0.1).collect()
    assert prof and all(r["frac"] >= 0.1 for r in prof)
    fracs = [r["n"] for r in prof]
    assert fracs == sorted(fracs, reverse=True)
