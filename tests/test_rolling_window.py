"""RANGE-frame rolling event-time window: hand-checked small case."""

from __future__ import annotations

import datetime as dt
from unittest import mock

import inmem_vector_db_spark.plans.relational as R


def test_user_rolling_activity_trailing_hour(spark):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        # user 1: events at 0, 30, 59, 61 minutes; purchase at 61
        (1, ts(0), 1, "view", 1.0, "{}"),
        (2, ts(30), 1, "click", 2.0, "{}"),
        (3, ts(59), 1, "view", 4.0, "{}"),
        (4, ts(61), 1, "purchase", 8.0, "{}"),
        # user 2: lone purchase
        (5, ts(10), 2, "purchase", 5.0, "{}"),
        # user 1: second purchase exactly 60 min after event 2 (inclusive)
        (6, ts(90), 1, "purchase", 16.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with mock.patch.object(R, "load_table", lambda s, d, n: ev):
        out = {
            r["event_id"]: r.asDict()
            for r in R.user_rolling_activity(spark, "unused").collect()
        }
    assert set(out) == {4, 5, 6}
    # purchase at 61': window [1', 61'] -> events 30, 59, 61
    assert out[4]["n_1h"] == 3 and out[4]["sum_1h"] == 14.0
    # lone purchase: only itself
    assert out[5]["n_1h"] == 1 and out[5]["sum_1h"] == 5.0
    # purchase at 90': window [30', 90'] inclusive -> events 30, 59, 61, 90
    assert out[6]["n_1h"] == 4 and out[6]["sum_1h"] == 30.0
