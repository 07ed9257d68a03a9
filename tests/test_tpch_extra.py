"""Extended TPC-H pack: plan pins + semantic invariants.

Value-level correctness is covered by the DuckDB oracle gate
(tools/check_oracle.py / the driver); these tests pin the plan shapes
we rely on at scale and the operator-level invariants the oracle can't
see (gap-fill density, LOCF monotonicity, grouping-set coverage).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inmem_vector_db_spark.plans.tpch_extra import (
    events_gapfill,
    order_grouping_sets,
    q8_market_share,
    q13_order_distribution,
    q17_small_quantity_revenue,
    q21_waiting_suppliers,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q8_broadcasts_every_dim(spark, sf_dir):
    """The 8-way join must broadcast all dims — no shuffle join should
    involve part/supplier/nation/region."""
    plan = _plan(q8_market_share(spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4


def test_q17_decorrelates_to_broadcast_join(spark, sf_dir):
    """The correlated per-part avg must appear as a broadcast join of a
    grouped aggregate, never a per-row subquery re-scan."""
    plan = _plan(q17_small_quantity_revenue(spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_no_nested_loop(spark, sf_dir):
    """exists/not-exists expressed as a census join — never a
    nested-loop."""
    plan = _plan(q21_waiting_suppliers(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_gapfill_dense_and_locf(spark, sf_dir):
    out = events_gapfill(spark, sf_dir).cache()
    try:
        # spine is dense: per type, rows == hours between min and max hour
        spans = (
            out.groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (
                    (
                        F.unix_timestamp(F.max("hour"), "yyyy-MM-dd HH:00:00")
                        - F.unix_timestamp(F.min("hour"), "yyyy-MM-dd HH:00:00")
                    )
                    / 3600
                    + 1
                ).cast("long").alias("expect"),
            )
            .collect()
        )
        assert spans and all(r.n == r.expect for r in spans)
        # gap rows are zero-filled, and LOCF never yields NULL after the
        # first observed hour (the spine starts at an observed hour)
        assert out.filter((F.col("is_gap") == 1) & (F.col("sum_value") != 0.0)).count() == 0
        assert out.filter(F.col("sum_value_locf").isNull()).count() == 0
        # on non-gap rows LOCF equals the actual value
        assert (
            out.filter(
                (F.col("is_gap") == 0) & (F.col("sum_value_locf") != F.col("sum_value"))
            ).count()
            == 0
        )
    finally:
        out.unpersist()


def test_grouping_sets_covers_both_dims_and_total(spark, sf_dir):
    rows = order_grouping_sets(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid 1 = (status), gid 2 = (priority), gid 3 = grand total
    assert set(by_gid) == {1, 2, 3}
    total = sum(r.n_orders for r in by_gid[1])
    assert total == sum(r.n_orders for r in by_gid[2])
    assert len(by_gid[3]) == 1 and by_gid[3][0].n_orders == total


def test_q13_includes_zero_order_bucket_semantics(spark, sf_dir):
    """The left join must keep customers with no qualifying orders:
    bucket counts sum to |customer|."""
    rows = q13_order_distribution(spark, sf_dir).collect()
    n_cust = spark.read.parquet(f"{sf_dir}/customer.parquet").count()
    assert sum(r.custdist for r in rows) == n_cust
