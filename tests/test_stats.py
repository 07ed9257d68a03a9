"""Statistics family (KS drift, Kaplan-Meier survival, Poisson
bootstrap, market basket): each checked against a trivially-correct
plain-Python reference on small synthetic inputs — independent of the
DuckDB oracle, so an error shared by both SQL mirrors can't hide."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)


def _t(day, hour=0):
    return dt.datetime(2024, 1, day, hour)


def test_ks_matches_python_reference(spark, tmp_path, monkeypatch):
    """KS over two small hand-made samples == brute-force ECDF max."""
    rows = []
    eid = 0
    a_vals = [1.0, 2.0, 2.0, 5.0, 9.0]
    b_vals = [2.0, 3.0, 5.0, 5.0, 7.0, 11.0]
    for v in a_vals:
        rows.append((eid, _t(1), 1, "click", v, "{}")); eid += 1
    for v in b_vals:
        rows.append((eid, _t(1), 1, "purchase", v, "{}")); eid += 1
    d = tmp_path / "ks_events"
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(str(d / "events.parquet"))

    from inmem_vector_db_spark.plans.relational import ks_drift_by_type

    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["ks"])
        for r in ks_drift_by_type(spark, str(d)).collect()
    }

    def ecdf_ks(xs, ys):
        pts = sorted(set(xs) | set(ys))
        return max(
            abs(
                sum(1 for v in xs if v <= p) / len(xs)
                - sum(1 for v in ys if v <= p) / len(ys)
            )
            for p in pts
        )

    want = round(ecdf_ks(a_vals, b_vals), 6)
    assert got[("click", "purchase")] == (len(a_vals), len(b_vals), want)


def test_km_matches_python_reference(spark, tmp_path):
    """KM curve on a hand-made cohort == the textbook product-limit
    estimator with right-censoring at the horizon."""
    rows = []
    eid = 0
    # users 1..6: first event day 1; purchases on day 2 (u1, u2), day 4
    # (u3); u4, u5, u6 never purchase (censored at horizon day 10)
    for u in (1, 2, 3, 4, 5, 6):
        rows.append((eid, _t(1), u, "view", 1.0, "{}")); eid += 1
    rows.append((eid, _t(2), 1, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, _t(2), 2, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, _t(4), 3, "purchase", 1.0, "{}")); eid += 1
    rows.append((eid, _t(10), 9, "view", 1.0, "{}")); eid += 1  # horizon
    d = tmp_path / "km_events"
    spark.createDataFrame(rows, EVENTS_SCHEMA).write.parquet(str(d / "events.parquet"))

    from inmem_vector_db_spark.plans.relational import survival_time_to_purchase

    got = [
        (r["duration_days"], r["n_at_risk"], r["n_events"], r["km_survival"])
        for r in survival_time_to_purchase(spark, str(d)).collect()
    ]
    # durations: u1=1, u2=1, u3=3; u4..u6 censored at 9; u9 censored at 0
    # event times: 1 (n_risk=7-1(u9 at 0 only reaches 0)=6, d=2), 3 (n_risk=4, d=1)
    # KM(1) = 1 - 2/6; KM(3) = (1 - 2/6) * (1 - 1/4)
    km1 = 1 - 2 / 6
    km3 = km1 * (1 - 1 / 4)
    assert got == [
        (1, 6, 2, round(km1, 6)),
        (3, 4, 1, round(km3, 6)),
    ], got


def test_bootstrap_matches_python_reference(spark, tmp_path):
    """Replica means are deterministic given the universal-hash weights:
    recompute every weight and mean in plain Python and require exact
    equality of the CI bounds and point estimate."""
    import duckdb  # only for decimal-free exact cents check below

    P = 2147483647
    TH = [790015084, 1580030168, 1975037710, 2106706891, 2139624186, 2146207645]

    rows = [(k, k, "O", 100.0 + k, dt.datetime(2024, 1, 1), "P") for k in range(1, 41)]
    d = tmp_path / "bs_orders"
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.parquet(str(d / "orders.parquet"))

    from inmem_vector_db_spark.plans.relational import bootstrap_ci_order_value

    row = bootstrap_ci_order_value(spark, str(d)).collect()[0]

    def weight(okey, b):
        u = ((507952114 * (b + 1) % P) * (okey % P) + 40503 * (b + 7)) % P
        for w, t in enumerate(TH):
            if u < t:
                return w
        return 6

    cents = {k: int(round((100.0 + k) * 100)) for k in range(1, 41)}
    means = []
    for b in range(100):
        ws = {k: weight(k, b) for k in cents}
        num = sum(ws[k] * cents[k] for k in cents)
        den = sum(ws.values())
        means.append(num / (den * 100.0))
    means.sort()
    assert row["n_orders"] == 40
    assert row["mean_value"] == round(sum(cents.values()) / (40 * 100.0), 6)
    assert row["ci_lo"] == round(means[2], 6)
    assert row["ci_hi"] == round(means[97], 6)


def test_market_basket_matches_python_reference(spark, tmp_path):
    """Lift/confidence on hand-made baskets == brute-force counting."""
    li = []
    baskets = {
        1: [10, 20, 30],
        2: [10, 20],
        3: [10, 20, 40],
        4: [30, 40],
        5: [10, 30],
        6: [10, 20],
    }
    i = 0
    for ok, parts in baskets.items():
        for pk in parts:
            li.append((ok, pk, 1.0, 1.0, 0.0, 0.0, "N", "O", _t(1)))
            i += 1
    d = tmp_path / "mb_li"
    spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_quantity double, "
        "l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.parquet(str(d / "lineitem.parquet"))

    from inmem_vector_db_spark.plans.relational import market_basket_lift

    got = {
        (r["part_a"], r["part_b"]): (r["n_ab"], r["lift"], r["confidence"])
        for r in market_basket_lift(spark, str(d)).collect()
    }
    # pairs with support >= 3: (10,20) in baskets 1,2,3,6
    n, n10, n20, n_ab = len(baskets), 5, 4, 4
    assert got == {
        (10, 20): (4, round(n_ab * n / (n10 * n20), 6), round(n_ab / n10, 6))
    }, got


# --- approx-twin agreement gates (r12: the skew-capped production
# forms must track the exact order-statistic oracle entries) ---------


def _rank_frac_bounds(sorted_vals, threshold):
    """(#values < t, #values <= t) as fractions of n."""
    import bisect

    n = len(sorted_vals)
    return (
        bisect.bisect_left(sorted_vals, threshold) / n,
        bisect.bisect_right(sorted_vals, threshold) / n,
    )


def test_winsorized_approx_twin_agrees(spark, sf_dir):
    """winsorized_stats_approx (percentile_approx thresholds, no rank
    window) must agree with the exact entry: identical n/mean, clip
    thresholds within sketch rank tolerance of the exact p05/p95, and
    a winsorized mean whose drift is bounded by the threshold drift.
    This is what licenses swapping the approx form in when one event
    type dominates the stream."""
    from inmem_vector_db_spark.plans.relational import (
        winsorized_stats,
        winsorized_stats_approx,
    )
    from inmem_vector_db_spark.sources.loader import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r for r in winsorized_stats(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in winsorized_stats_approx(ev).collect()}
    assert set(exact) == set(approx)
    vals: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    for t in vals:
        vals[t].sort()
    for t, ex in exact.items():
        ap = approx[t]
        n = ex["n_events"]
        assert ap["n_events"] == n
        # both means are 6dp-rounded doubles from DIFFERENT physical
        # plans — summation order differs, so compare within one ulp
        # of the rounding grid instead of exactly
        assert abs(ap["mean"] - ex["mean"]) <= 1e-6, (t, ap, ex)
        tol = 1.0 / 10_000 + 3.0 / n  # sketch error + rank convention slip
        for p, col in ((0.05, "p05"), (0.95, "p95")):
            lo_f, hi_f = _rank_frac_bounds(vals[t], ap[col])
            assert lo_f - tol <= p <= hi_f + tol, (t, col, ap[col], lo_f, hi_f)
        # every row's clipped value moves by at most the larger
        # threshold drift; the output thresholds are 4dp-rounded while
        # clipping used the raw values, so allow the hidden sub-4dp
        # drift (1e-4) on top of the visible one
        drift = max(abs(ap["p05"] - ex["p05"]), abs(ap["p95"] - ex["p95"]))
        assert abs(ap["winsorized_mean"] - ex["winsorized_mean"]) <= (
            drift + 1e-4 + 2e-6
        ), (t, ap, ex)


def test_mad_approx_twin_agrees(spark, sf_dir):
    """mad_outliers_approx (both medians via percentile_approx) must
    agree with the exact entry: identical n, both medians within
    sketch rank tolerance, and an outlier count internally consistent
    with its own thresholds and within the threshold-band of the exact
    count."""
    from inmem_vector_db_spark.plans.relational import (
        mad_outliers,
        mad_outliers_approx,
    )
    from inmem_vector_db_spark.sources.loader import load_table

    ev = load_table(spark, sf_dir, "events")
    exact = {r["event_type"]: r for r in mad_outliers(spark, sf_dir).collect()}
    approx = {r["event_type"]: r for r in mad_outliers_approx(ev).collect()}
    assert set(exact) == set(approx)
    rows = ev.select("event_type", "value").collect()
    by_type: dict[str, list[float]] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for t, ex in exact.items():
        ap = approx[t]
        n = ex["n_events"]
        assert ap["n_events"] == n
        tol = 1.0 / 10_000 + 3.0 / n
        vs = sorted(by_type[t])
        lo_f, hi_f = _rank_frac_bounds(vs, ap["median"])
        assert lo_f - tol <= 0.5 <= hi_f + tol, (t, "median", ap["median"])
        advs = sorted(abs(v - ap["median"]) for v in by_type[t])
        lo_f, hi_f = _rank_frac_bounds(advs, ap["mad"])
        assert lo_f - tol <= 0.5 <= hi_f + tol, (t, "mad", ap["mad"])
        # count of rows whose deviation sits between the exact and the
        # approx outlier thresholds == the max possible count flip
        k = 3.0 * 1.4826
        t_ex, t_ap = k * ex["mad"], k * ap["mad"]
        band_lo, band_hi = min(t_ex, t_ap), max(t_ex, t_ap)
        # deviations against each form's own median
        dev_ex = [abs(v - ex["median"]) for v in by_type[t]]
        band = sum(1 for d in dev_ex if band_lo - 1e-9 < d <= band_hi + 1e-9)
        med_shift = sum(
            1
            for v in by_type[t]
            if abs(abs(v - ex["median"]) - abs(v - ap["median"])) > 0
            and min(abs(v - ex["median"]), abs(v - ap["median"])) <= band_hi
            < max(abs(v - ex["median"]), abs(v - ap["median"]))
        )
        assert abs(ap["n_outliers"] - ex["n_outliers"]) <= band + med_shift + 1, (
            t, ap["n_outliers"], ex["n_outliers"], band, med_shift,
        )


def test_twins_agree_under_adversarial_skew(spark):
    """The percentile_approx twins exist for exactly one condition —
    one key dominating the stream — so pin agreement THERE, not only
    on the balanced suite tables: 30k-row synthetic events with one
    type on 90% of rows and a long-tailed value distribution.  The
    exact forms still compute (small data), and the twins must land
    within sketch tolerance of them."""
    import math

    from unittest import mock

    import inmem_vector_db_spark.plans.relational as REL

    n = 30_000
    rows = []
    for i in range(n):
        et = "hot" if i % 10 else "cold"
        # deterministic long tail: value grows quadratically in a
        # per-type counter, so p95 >> median and MAD is nontrivial
        v = float((i * 7919 % 1000) ** 2) / 1000.0
        rows.append((i, _t(1 + (i % 27)), i % 97, et, v, "{}"))
    ev = spark.createDataFrame(rows, EVENTS_SCHEMA)
    with mock.patch.object(REL, "load_table", lambda s, d, t: ev):
        exact_w = {r["event_type"]: r for r in REL.winsorized_stats(spark, "x").collect()}
        exact_m = {r["event_type"]: r for r in REL.mad_outliers(spark, "x").collect()}
    approx_w = {r["event_type"]: r for r in REL.winsorized_stats_approx(ev).collect()}
    approx_m = {r["event_type"]: r for r in REL.mad_outliers_approx(ev).collect()}
    assert set(exact_w) == set(approx_w) == {"hot", "cold"}
    for t in ("hot", "cold"):
        ew, aw = exact_w[t], approx_w[t]
        assert aw["n_events"] == ew["n_events"]
        # 6dp-rounded doubles from different plans: one-ulp tolerance
        assert abs(aw["mean"] - ew["mean"]) <= 1e-6
        # thresholds within 1% relative rank of exact on 27k rows means
        # values within the local density band; assert value closeness
        # via the data's own scale
        scale = ew["p95"] - ew["p05"]
        assert abs(aw["p05"] - ew["p05"]) <= 0.02 * scale + 1e-6, (t, aw, ew)
        assert abs(aw["p95"] - ew["p95"]) <= 0.02 * scale + 1e-6, (t, aw, ew)
        assert abs(aw["winsorized_mean"] - ew["winsorized_mean"]) <= (
            max(abs(aw["p05"] - ew["p05"]), abs(aw["p95"] - ew["p95"]))
            + 1e-4 + 2e-6  # thresholds print 4dp-rounded; clip is raw
        )
        em, am = exact_m[t], approx_m[t]
        mscale = max(em["mad"], 1e-6)
        assert abs(am["median"] - em["median"]) <= 0.05 * mscale * 3 + 1e-6, (t, am, em)
        assert abs(am["mad"] - em["mad"]) <= 0.05 * mscale * 3 + 1e-6, (t, am, em)
        assert not math.isnan(am["mad"])
