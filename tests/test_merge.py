"""SCD1/SCD2 merge semantics (operators.merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.merge import (
    merge_scd2,
    merge_upsert,
    scd2_seed,
)

small = pytest.mark.parametrize("small_source", [True, False])

TARGET = [
    (1, "alpha", 5),
    (2, "beta", 4),
    (3, "gamma", 5),
    (4, None, 0),
]
SCHEMA = "id LONG, text STRING, n LONG"


def _target(spark):
    return spark.createDataFrame(TARGET, SCHEMA)


@small
def test_upsert_actions(spark, small_source):
    src = spark.createDataFrame(
        [
            (2, "beta2", 5, False),   # changed -> update
            (3, "gamma", 5, False),   # identical -> unchanged
            (9, "iota", 4, False),    # new key -> insert
            (1, "alpha", 5, True),    # delete flag -> dropped
        ],
        SCHEMA + ", _deleted BOOLEAN",
    )
    out = merge_upsert(
        _target(spark), src, ["id"], delete_col="_deleted", tag_col="action",
        small_source=small_source,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {2, 3, 4, 9}
    assert rows[2]["action"] == "update" and rows[2]["text"] == "beta2"
    assert rows[3]["action"] == "unchanged"
    assert rows[4]["action"] == "kept"
    assert rows[9]["action"] == "insert"


@small
def test_upsert_null_safe_compare(spark, small_source):
    src = spark.createDataFrame(
        [(4, None, 0), (3, None, 5)], SCHEMA
    )
    out = merge_upsert(
        _target(spark), src, ["id"], tag_col="action",
        small_source=small_source,
    )
    rows = {r["id"]: r for r in out.collect()}
    # NULL == NULL must read as unchanged, value -> NULL as update
    assert rows[4]["action"] == "unchanged"
    assert rows[3]["action"] == "update" and rows[3]["text"] is None


@small
def test_upsert_null_data_is_not_absence(spark, small_source):
    # id 4 has an all-NULL payload in the target; a batch without it
    # must still report it "kept", not resurrect or drop it
    src = spark.createDataFrame([(1, "alpha", 5)], SCHEMA)
    out = merge_upsert(
        _target(spark), src, ["id"], tag_col="action",
        small_source=small_source,
    )
    rows = {r["id"]: r for r in out.collect()}
    assert rows[4]["action"] == "kept" and rows[4]["n"] == 0


@small
def test_upsert_row_preservation_count(spark, small_source):
    src = spark.createDataFrame([(2, "b2", 9), (10, "x", 1)], SCHEMA)
    out = merge_upsert(_target(spark), src, ["id"], small_source=small_source)
    assert out.count() == len(TARGET) + 1
    assert "action" not in out.columns


def test_small_source_shape_no_corpus_shuffle(spark):
    # the default shape must never shuffle target data: three joins,
    # each broadcasting the batch side — no SortMergeJoin, no Exchange
    src = spark.createDataFrame([(2, "b2", 9), (10, "x", 1)], SCHEMA)
    out = merge_upsert(_target(spark), src, ["id"], small_source=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("BroadcastHashJoin") >= 2  # inner + anti (+ anti)


def test_scd2_two_batches(spark):
    t0 = scd2_seed(_target(spark).where(F.col("id") <= 2), batch_id=0)
    b1 = spark.createDataFrame(
        [(2, "beta2", 4), (5, "eps", 3)], SCHEMA
    )
    t1 = merge_scd2(t0, b1, ["id"], batch_id=1)
    rows = sorted(
        ((r["id"], r["version"], r["is_current"]) for r in t1.collect())
    )
    # id1 untouched v1-current; id2 v1 closed + v2 current; id5 inserted
    assert rows == [
        (1, 1, True),
        (2, 1, False),
        (2, 2, True),
        (5, 1, True),
    ]
    closed = {
        (r["id"], r["version"]): r["valid_to_batch"] for r in t1.collect()
    }
    assert closed[(2, 1)] == 1 and closed[(2, 2)] is None

    # idempotent resend: identical batch adds no versions
    t2 = merge_scd2(t1, b1, ["id"], batch_id=2)
    assert t2.count() == t1.count()
    # and history survives another real change
    b3 = spark.createDataFrame([(2, "beta3", 4)], SCHEMA)
    t3 = merge_scd2(t2, b3, ["id"], batch_id=3)
    v = {
        (r["id"], r["version"]): (r["is_current"], r["valid_to_batch"])
        for r in t3.collect()
        if r["id"] == 2
    }
    assert v == {(2, 1): (False, 1), (2, 2): (False, 3), (2, 3): (True, None)}


def test_merge_agg_states_equals_recompute(spark):
    """Merging per-batch aggregate states must equal aggregating the
    union — for sum/count/min/max, across matched, old-only, and
    delta-only keys."""
    from inmem_vector_db_spark.operators.merge import merge_agg_states

    rows_a = [("x", 1.0), ("x", 2.0), ("y", 5.0)]
    rows_b = [("x", 7.0), ("z", 3.0)]
    a = spark.createDataFrame(rows_a, "k string, v double")
    b = spark.createDataFrame(rows_b, "k string, v double")

    def roll(df):
        from pyspark.sql import functions as F
        return df.groupBy("k").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )

    merged = merge_agg_states(
        roll(a), roll(b), ["k"], {"n": "count", "s": "sum", "lo": "min", "hi": "max"}
    )
    full = roll(a.unionByName(b))
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
    want = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in full.collect()}
    assert got == want


def test_merge_agg_states_rejects_bad_spec(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F
    from inmem_vector_db_spark.operators.merge import merge_agg_states

    df = spark.createDataFrame([("x", 1)], "k string, n long")
    with _pytest.raises(ValueError):
        merge_agg_states(df, df, ["k"], {"n": "avg"})
    with _pytest.raises(ValueError):
        merge_agg_states(df, df, ["k"], {})
