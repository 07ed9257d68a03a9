"""As-of and range join semantics vs brute-force Python references."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.temporal import asof_join, range_join

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _ts(minutes: float) -> datetime:
    return T0 + timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            ("a", _ts(10), 100),
            ("a", _ts(30), 101),
            ("a", _ts(5), 102),   # before any right row
            ("b", _ts(20), 103),
            ("c", _ts(50), 104),  # key with no right rows at all
        ],
        "k string, ts timestamp, left_id int",
    )
    right = spark.createDataFrame(
        [
            ("a", _ts(8), 1.0),
            ("a", _ts(10), 2.0),   # equal-ts tie with left_id=100
            ("a", _ts(25), 3.0),
            ("b", _ts(1), 4.0),
        ],
        "k string, ts timestamp, v double",
    )
    return left, right


def test_asof_backward_matches(frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_payload=("v",))
    got = {r["left_id"]: (r["asof_ts"], r["asof_v"]) for r in out.collect()}
    assert len(got) == 5  # left join keeps every left row
    assert got[100] == (_ts(10), 2.0)  # equal ts matches (>= semantics)
    assert got[101] == (_ts(25), 3.0)  # latest prior, not first
    assert got[102] == (None, None)    # nothing at or before
    assert got[103] == (_ts(1), 4.0)
    assert got[104] == (None, None)    # key absent on right


def test_asof_tolerance_and_inner(frames):
    left, right = frames
    out = asof_join(
        left, right, on="k", right_payload=("v",),
        tolerance_seconds=600, how="inner",
    )
    got = {r["left_id"]: r["asof_v"] for r in out.collect()}
    # 103 matched at 19 min distance > 10 min tolerance -> dropped by inner
    assert got == {100: 2.0, 101: 3.0}


def test_asof_keeps_left_schema(frames):
    left, right = frames
    out = asof_join(left, right, on="k", right_payload=("v",))
    assert set(out.columns) == {"k", "ts", "left_id", "asof_ts", "asof_v"}


def test_range_join_matches_bruteforce(spark):
    lows, highs = 0.0, 600.0  # [ts, ts + 10 min]
    lrows = [("a", _ts(m), m) for m in (0, 7, 13, 29)] + [("b", _ts(3), 99)]
    rrows = [("a", _ts(m), float(m)) for m in (5, 10, 16, 31)] + [
        ("b", _ts(12), 12.0)
    ]
    left = spark.createDataFrame(lrows, "k string, ts timestamp, lid int")
    right = spark.createDataFrame(rrows, "k string, ts timestamp, rv double")

    out = range_join(
        left, right, on="k", lower_seconds=lows, upper_seconds=highs
    )
    got = {(r["lid"], r["r_rv"]) for r in out.collect()}

    expected = set()
    for k, lts, lid in lrows:
        for rk, rts, rv in rrows:
            if rk == k and 0 <= (rts - lts).total_seconds() <= 600:
                expected.add((lid, rv))
    assert got == expected and expected  # non-trivial case actually hit


def test_range_join_boundaries_inclusive(spark):
    left = spark.createDataFrame([("k", _ts(0), 1)], "k string, ts timestamp, lid int")
    right = spark.createDataFrame(
        [("k", _ts(0), 0.0), ("k", _ts(10), 600.0), ("k", _ts(10.01), 601.0)],
        "k string, ts timestamp, rv double",
    )
    out = range_join(left, right, on="k", lower_seconds=0, upper_seconds=600)
    assert {r["r_rv"] for r in out.collect()} == {0.0, 600.0}


def test_range_join_plan_is_hash_join(spark):
    """The whole point: the plan must be an equi-join (SortMerge/Hash),
    never BroadcastNestedLoop/Cartesian."""
    left = spark.range(100).select(
        (F.col("id") % 5).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = left.select("k", "ts", F.col("lid").cast("double").alias("rv"))
    out = range_join(left, right, on="k", lower_seconds=0, upper_seconds=300)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_asof_plan_single_shuffle_no_join(spark):
    """The as-of join must plan as union + ONE exchange + window — no
    join operator of any kind in the physical plan."""
    left = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 60).alias("ts"),
        F.col("id").alias("lid"),
    )
    right = left.select("k", "ts", F.col("lid").cast("double").alias("v"))
    out = asof_join(left, right, on="k", right_payload=("v",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_asof_forward_small_case(spark):
    """Forward as-of: each left row matches the EARLIEST right row
    at-or-after its timestamp; tolerance drops too-late matches."""
    import datetime as dt

    from inmem_vector_db_spark.operators.temporal import asof_join

    t0 = dt.datetime(2024, 1, 1)

    def ts(s):
        return t0 + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(1, 1, ts(10)), (2, 1, ts(50)), (3, 2, ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, ts(10), 5.0), (1, ts(30), 7.0), (2, ts(5000), 9.0)],
        "user_id long, ts timestamp, value double",
    )
    out = {
        r["event_id"]: r.asDict()
        for r in asof_join(
            left, right, on="user_id", right_payload=("value",),
            tolerance_seconds=100.0, direction="forward",
        ).collect()
    }
    assert out[1]["asof_value"] == 5.0  # equal-ts right row matches
    assert out[2]["asof_value"] is None  # no purchase within 100s after 50
    assert out[3]["asof_value"] is None  # 5000s is past tolerance


def test_interval_join_bucketing_is_complete(spark, sf_dir):
    """The hour-bucket equi-join in interval_join_error_sessions is
    pure blocking: its matches must equal a direct theta-join over the
    same sessions (the oracle replays the theta form — this pins the
    same fact inside Spark itself)."""
    from pyspark.sql import Window

    from inmem_vector_db_spark.plans.relational import (
        interval_join_error_sessions,
    )
    from inmem_vector_db_spark.sources.loader import load_table

    bucketed = interval_join_error_sessions(spark, sf_dir)

    ev = load_table(spark, sf_dir, "events")
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = wu.rowsBetween(Window.unboundedPreceding, 0)
    prev = F.lag("ts").over(wu)
    marked = ev.withColumn(
        "new_s",
        F.when(
            prev.isNull() | (F.col("ts") >= prev + F.expr("INTERVAL 30 MINUTE")),
            1,
        ).otherwise(0),
    ).withColumn("sid", F.sum("new_s").over(wcum))
    sess = (
        marked.groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("s_start"),
            F.max("ts").alias("s_end"),
            F.max((F.col("event_type") == "purchase").cast("int")).alias("hp"),
        )
        .filter(F.col("hp") == 1)
    )
    probes = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("ts").alias("e_ts")
    )
    direct = (
        probes.join(sess, "user_id")
        .filter(
            (F.col("e_ts") >= F.col("s_start")) & (F.col("e_ts") <= F.col("s_end"))
        )
        .groupBy("user_id")
        .agg(
            F.countDistinct("sid").alias("n_sessions_hit"),
            F.count(F.lit(1)).alias("n_errors"),
        )
    )
    assert bucketed.exceptAll(direct).count() == 0
    assert direct.exceptAll(bucketed).count() == 0
