"""Pins for the normal-equation ridge trainer (`operators/regress.py`):
the Cramer-rule solve must agree with numpy's LAPACK solve on the SAME
exact-integer system, the fit must be partition-invariant (the moment
sums are exact int64), λ must actually shrink the slopes, and the
scoring pass must reproduce the fit's residual algebra."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.regress import (
    moment_sums,
    ridge_fit,
    score,
    with_betas,
)


def _design_df(spark, rows, parts=1):
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    return df.repartition(parts) if parts > 1 else df


def _numpy_solve(rows, lam):
    a = np.array(rows, dtype=np.float64)
    x = np.column_stack([np.ones(len(a)), a[:, 0], a[:, 1]])
    y = a[:, 2]
    gram = x.T @ x + np.diag([0.0, lam, lam])
    return np.linalg.solve(gram, x.T @ y)


# non-degenerate random integer designs: x1 and x2 get distinct value
# ranges so the Gramian stays invertible with overwhelming probability
int_feature = st.tuples(
    st.integers(min_value=-500, max_value=500),
    st.integers(min_value=0, max_value=90),
    st.integers(min_value=-10_000, max_value=10_000),
)
design_strategy = st.lists(int_feature, min_size=6, max_size=24)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@example(rows=[(i, i * i % 7, 3 * i - 1) for i in range(8)])
@given(rows=design_strategy)
def test_cramer_betas_match_numpy_solve(spark, rows):
    ref = _numpy_solve(rows, lam=2.0)
    if not np.all(np.isfinite(ref)) or np.any(np.abs(ref) > 1e6):
        return  # numerically degenerate draw — no meaningful comparison
    fit = ridge_fit(_design_df(spark, rows), lam=2.0).collect()[0]
    got = np.array([fit["b0"], fit["b1"], fit["b2"]])
    assert np.allclose(got, ref, rtol=1e-4, atol=1e-5)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=design_strategy)
def test_fit_is_partition_invariant(spark, rows):
    one = ridge_fit(_design_df(spark, rows, parts=1), lam=2.0).collect()[0]
    many = ridge_fit(_design_df(spark, rows, parts=7), lam=2.0).collect()[0]
    assert one.asDict() == many.asDict()  # exact — int sums, fixed tree


def test_moment_sums_are_exact_ints(spark):
    rows = [(3, 4, 5), (-2, 7, 1), (10, 0, -6)]
    got = moment_sums(_design_df(spark, rows)).collect()[0].asDict()
    a = np.array(rows, dtype=np.int64)
    assert got == {
        "n": 3,
        "s1": int(a[:, 0].sum()),
        "s2": int(a[:, 1].sum()),
        "s11": int((a[:, 0] ** 2).sum()),
        "s12": int((a[:, 0] * a[:, 1]).sum()),
        "s22": int((a[:, 1] ** 2).sum()),
        "sy": int(a[:, 2].sum()),
        "s1y": int((a[:, 0] * a[:, 2]).sum()),
        "s2y": int((a[:, 1] * a[:, 2]).sum()),
        "syy": int((a[:, 2] ** 2).sum()),
    }


def test_lambda_shrinks_slopes_toward_zero(spark):
    rng = np.random.RandomState(7)
    x1 = rng.randint(-300, 300, size=40)
    x2 = rng.randint(0, 60, size=40)
    y = 5 * x1 - 3 * x2 + rng.randint(-4, 4, size=40)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)]
    sums = moment_sums(_design_df(spark, rows))
    ols = with_betas(sums, lam=0.0).collect()[0]
    ridge = with_betas(sums, lam=1e5).collect()[0]
    assert abs(ridge["b1"]) < abs(ols["b1"])
    assert abs(ridge["b2"]) < abs(ols["b2"])
    # and OLS recovers the generating slopes
    assert ols["b1"] == pytest.approx(5.0, abs=0.1)
    assert ols["b2"] == pytest.approx(-3.0, abs=0.2)


def test_chunked_moments_equal_single_pass_exactly(spark):
    from inmem_vector_db_spark.operators.regress import combine_moments

    rows = [(i % 17 - 8, (3 * i) % 11, 5 * i - 40) for i in range(30)]
    whole = ridge_fit(_design_df(spark, rows), lam=3.0).collect()[0]
    parts = None
    for ch in (rows[:9], rows[9:20], rows[20:]):
        p = moment_sums(_design_df(spark, ch))
        parts = p if parts is None else parts.unionByName(p)
    folded = with_betas(combine_moments(parts), lam=3.0).collect()[0]
    for k in ("n", "b0", "b1", "b2"):
        assert folded[k] == whole[k]  # bit-identical, not approx


def test_lambda_sweep_prices_grid_from_one_scan(spark):
    from inmem_vector_db_spark.operators.regress import lambda_sweep, with_r2

    rng = np.random.RandomState(11)
    x1 = rng.randint(-300, 300, size=50)
    x2 = rng.randint(0, 60, size=50)
    y = 2 * x1 + 4 * x2 + rng.randint(-9, 9, size=50)
    rows = [(int(a), int(b), int(c)) for a, b, c in zip(x1, x2, y)]
    sums = moment_sums(_design_df(spark, rows))
    grid = [0.0, 10.0, 1e4, 1e7]
    swept = {
        r["lam"]: r for r in lambda_sweep(sums, grid).collect()
    }
    assert set(swept) == set(grid)
    # the λ=0 sweep row must equal the dedicated single-λ fit exactly
    single = with_r2(with_betas(sums, 0.0)).collect()[0]
    for k in ("b0", "b1", "b2", "r2"):
        assert swept[0.0][k] == single[k]
    # training R² can only degrade as the shrinkage grows
    r2s = [swept[v]["r2"] for v in grid]
    assert all(a >= b for a, b in zip(r2s, r2s[1:]))
    assert r2s[0] > 0.99  # generated nearly-linear data
    # heavy shrink flattens slopes
    assert abs(swept[1e7]["b1"]) < abs(swept[0.0]["b1"])


def test_grouped_fit_equals_per_group_fits(spark):
    rng = np.random.RandomState(3)
    rows = [
        ("g" + str(i % 3), int(a), int(b), int(c))
        for i, (a, b, c) in enumerate(
            zip(
                rng.randint(-200, 200, size=45),
                rng.randint(0, 50, size=45),
                rng.randint(-5000, 5000, size=45),
            )
        )
    ]
    df = spark.createDataFrame(rows, "g string, x1 long, x2 long, y long")
    grouped = {
        r["g"]: r
        for r in with_betas(moment_sums(df, keys=("g",)), lam=2.0).collect()
    }
    for g in ("g0", "g1", "g2"):
        solo = with_betas(
            moment_sums(df.filter(F.col("g") == g)), lam=2.0
        ).collect()[0]
        for k in ("n", "b0", "b1", "b2"):
            assert grouped[g][k] == solo[k]  # exact


def test_ridge_classifier_separates_linear_data(spark):
    # y = sign(x1 - x2): least squares on +-1 labels is not a
    # max-margin method (boundary points can flip), but it must
    # recover the sign structure and classify nearly everything
    rng = np.random.RandomState(5)
    rows = []
    for _ in range(60):
        a, b = int(rng.randint(-100, 100)), int(rng.randint(-100, 100))
        if a == b:
            continue
        rows.append((a, b, 1 if a > b else -1))
    design = _design_df(spark, rows)
    fit = ridge_fit(design, lam=0.01)
    f = fit.collect()[0]
    assert f["b1"] > 0 > f["b2"]  # the separating direction
    scored = score(design, fit, lam=0.01).withColumn(
        "pred", F.when(F.col("yhat") >= 0, 1).otherwise(-1)
    )
    wrong = scored.filter(F.col("pred") != F.col("y")).count()
    assert wrong <= len(rows) * 0.05


def test_metric_exprs_sentinel_on_undefined_ratio(spark):
    from inmem_vector_db_spark.plans.regression import _METRIC_EXPRS

    # all-negative predictor: no positive predictions -> precision and
    # f1 undefined -> -1 sentinel; recall defined (fn > 0) -> 0.0
    row = spark.createDataFrame(
        [(0, 0, 3, 7)], "tp long, fp long, fn long, tn long"
    )
    for c in ("tp", "fp", "fn", "tn"):
        row = row.withColumn(f"{c}d", F.col(c).cast("double"))
    for name, expr in _METRIC_EXPRS.items():
        row = row.withColumn(name, F.expr(expr))
    got = row.collect()[0]
    assert got["precision"] == -1.0
    assert got["f1"] == 0.0  # 2*0/(2*0+0+3) = 0 — defined
    assert got["recall"] == 0.0
    assert got["accuracy"] == pytest.approx(0.7)


def test_conformal_interval_covers_at_nominal_rate(spark, sf_dir):
    from inmem_vector_db_spark.plans.regression import (
        ridge_conformal_intervals,
    )

    row = ridge_conformal_intervals(spark, sf_dir).collect()[0]
    # distribution-free guarantee: coverage >= 1 - alpha up to the
    # finite-sample wobble of the held-out bucket (binomial std err)
    n_test = row["n_test"]
    assert n_test > 0 and row["n_calib"] > 0
    slack = 3.0 / (n_test ** 0.5)
    assert row["coverage"] >= 0.9 - slack
    assert row["qhat"] > 0
    # the order-statistic index is the exact integer ceil((n+1)*9/10)
    import math

    from fractions import Fraction

    k = (9 * (row["n_calib"] + 1) + 9) // 10
    assert k == math.ceil(Fraction(9, 10) * (row["n_calib"] + 1))


def test_conformal_calibration_cap_binds_and_is_top_k(spark, sf_dir):
    """r12 skew fix: the calibration set is a FIXED-SIZE hash-ordered
    sample, so the single-task rank window sees at most _CONF_CALIB_CAP
    rows at any corpus scale.  With the cap forced below bucket 2's
    population it must bind exactly (n_calib == cap), the selection
    must plan as TakeOrderedAndProject (distributed top-k merge, never
    a global sort), and coverage must still hold — any exchangeable
    subsample is a valid calibration set."""
    from unittest import mock

    import inmem_vector_db_spark.plans.regression as regmod

    with mock.patch.object(regmod, "_CONF_CALIB_CAP", 64):
        df = regmod.ridge_conformal_intervals(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject(limit=64" in plan, plan[:2000]
        row = df.collect()[0]
    assert row["n_calib"] == 64
    n_test = row["n_test"]
    assert n_test > 0
    # 64-row calibration: order-statistic resolution is ~1/65, so give
    # the distribution-free bound that plus the test-side wobble
    slack = 3.0 / (n_test ** 0.5) + 1.0 / 65
    assert row["coverage"] >= 0.9 - slack


def _stump_best(spark, rows):
    """Run the histogram split search over an in-memory design the
    same way plans.regression.stump_split_finder does."""
    import inmem_vector_db_spark.plans.regression as regmod

    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")

    def fake_design(_spark, _sf):
        return df

    orig = regmod._design
    regmod._design = fake_design
    try:
        return regmod.stump_split_finder(spark, "unused").collect()[0]
    finally:
        regmod._design = orig


def test_stump_recovers_step_function(spark):
    rows = [(i, 0, 100 if i > 50 else 0) for i in range(100)]
    best = _stump_best(spark, rows)
    assert best["split_x1_max"] == 50  # the true step boundary
    assert best["mean_left"] == 0.0
    assert best["mean_right"] == 100.0
    # variance reduction equals the full variance of a balanced step
    assert best["var_reduction"] == pytest.approx(2500.0, abs=25)


def test_stump_matches_bruteforce_over_bin_edges(spark):
    rng = np.random.RandomState(9)
    xs = rng.randint(0, 1000, size=80)
    ys = rng.randint(-50, 50, size=80)
    rows = [(int(a), 0, int(b)) for a, b in zip(xs, ys)]
    best = _stump_best(spark, rows)
    # brute force over the same 256 fixed-width bin edges
    lo, hi = int(xs.min()), int(xs.max())
    spans = {}
    for a, b in zip(xs, ys):
        spans.setdefault(((int(a) - lo) * 256) // (hi - lo + 1), []).append(
            (int(a), int(b))
        )
    bins = sorted(spans)
    n, s = len(rows), int(ys.sum())
    best_gain, best_bin = None, None
    nl = sl = 0
    for b in bins:
        nl += len(spans[b])
        sl += sum(y for _, y in spans[b])
        if nl == n:
            break
        gain = sl * sl / nl + (s - sl) ** 2 / (n - nl)
        if best_gain is None or gain > best_gain:
            best_gain, best_bin = gain, b
    assert best["split_bin"] == best_bin


def test_target_encoding_is_leakage_safe(spark):
    import hashlib

    import inmem_vector_db_spark.plans.regression as regmod

    rows = [(i, "s" + str(i % 2), i % 7, 0, 10 * i % 113) for i in range(40)]
    df = spark.createDataFrame(
        rows, "okey long, segment string, x1 long, x2 long, y long"
    )
    orig = regmod._design
    regmod._design = lambda _s, _d: df
    try:
        got = {
            (r["segment"], r["fold"]): r
            for r in regmod.target_encode_segments(spark, "x").collect()
        }
    finally:
        regmod._design = orig

    def fold_of(okey):
        return int(hashlib.md5(str(okey).encode()).hexdigest()[:15], 16) % 4

    n_all = len(rows)
    s_all = sum(r[4] for r in rows)
    for (seg, fold), r in got.items():
        others = [
            x[4] for x in rows if x[1] == seg and fold_of(x[0]) != fold
        ]  # strictly out-of-fold: the row's own target never contributes
        want = (sum(others) + 20 * (s_all / n_all)) / (len(others) + 20)
        assert r["encoded"] == pytest.approx(want, abs=1e-6)


def test_reliability_bins_partition_counts(spark, sf_dir):
    from inmem_vector_db_spark.plans.regression import (
        classifier_reliability_bins,
    )

    rows = classifier_reliability_bins(spark, sf_dir).collect()
    assert all(0 <= r["score_bin"] <= 9 for r in rows)
    assert all(0.0 <= r["pos_rate"] <= 1.0 for r in rows)
    # every scored row lands in exactly one bin
    from inmem_vector_db_spark.plans.regression import _class_design

    assert sum(r["n_rows"] for r in rows) == _class_design(spark, sf_dir).count()


def test_boosted_stumps_recover_additive_steps(spark):
    import inmem_vector_db_spark.plans.regression as regmod

    # y = 1000*step(x1>50) + 60*step(x2>30): round 1 takes the big
    # step on x1, round 2 finds the small one left in the residuals
    rows = [
        (i, (7 * i) % 60, (1000 if i > 50 else 0) + (60 if (7 * i) % 60 > 30 else 0))
        for i in range(100)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    orig = regmod._design
    regmod._design = lambda _s, _d: df
    try:
        row = regmod.boosted_stumps(spark, "x").collect()[0]
    finally:
        regmod._design = orig
    assert row["r1_split_x1_max"] == 50
    assert row["r2_split_x2_max"] == 30
    # round-2 leaves straddle the 60-unit residual step
    assert row["r2_mean_right"] - row["r2_mean_left"] == pytest.approx(60, abs=5)
    assert row["r2_var_reduction"] > 0


def test_single_item_user_system_is_nonsingular_under_ridge(spark):
    # constant features (a user who only ever touched one item): the
    # unregularized normal equations are singular, but with lam > 0
    # det = n*lam^2 > 0, so the ALS user step needs no special-casing
    import math

    rows = [(0, 7, -3, v) for v in (10, 30, 20, 40)]
    df = spark.createDataFrame(rows, "user_id long, x1 long, x2 long, y long")
    fit = with_betas(moment_sums(df, keys=("user_id",)), lam=100.0).collect()[0]
    assert fit["det"] == pytest.approx(4 * 100.0**2)
    for k in ("b0", "b1", "b2"):
        assert math.isfinite(fit[k])
    # the ridge prediction for the constant feature vector shrinks
    # toward (but stays near) the user's mean rating
    pred = fit["b0"] + fit["b1"] * 7 + fit["b2"] * -3
    assert 0 < pred <= 25.0  # mean is 25, shrunk strictly below


def test_moment_subtraction_equals_direct_holdout_fit(spark):
    # the CV trick: (total - fold) moments must equal moments computed
    # directly on the other folds — and therefore the same betas
    from inmem_vector_db_spark.operators.regress import MOMENT_COLS

    rows = [(i % 3, 2 * i - 9, (5 * i) % 13, 7 * i - 30) for i in range(24)]
    df = spark.createDataFrame(rows, "fold long, x1 long, x2 long, y long")
    per = moment_sums(df, keys=("fold",))
    wall = __import__("pyspark.sql", fromlist=["Window"]).Window.partitionBy()
    loo = per.select(
        "fold",
        *[
            (F.sum(c).over(wall) - F.col(c)).cast("long").alias(c)
            for c in MOMENT_COLS
        ],
    )
    loo_fit = {
        r["fold"]: r for r in with_betas(loo, lam=5.0).collect()
    }
    for f in (0, 1, 2):
        direct = with_betas(
            moment_sums(df.filter(F.col("fold") != f)), lam=5.0
        ).collect()[0]
        for k in ("n", "b0", "b1", "b2"):
            assert loo_fit[f][k] == direct[k]  # exact, not approx


def test_score_residuals_match_python(spark):
    rows = [(10, 2, 55), (-4, 8, -11), (7, 7, 40), (0, 1, 2)]
    design = _design_df(spark, rows)
    fit = ridge_fit(design, lam=1.0)
    b = fit.select("b0", "b1", "b2").collect()[0]
    got = {
        (r["x1"], r["x2"]): (r["sq_err"], r["abs_err"])
        for r in score(design, fit, lam=1.0).collect()
    }
    for x1, x2, y in rows:
        resid = float(y) - (b["b0"] + b["b1"] * float(x1) + b["b2"] * float(x2))
        assert got[(x1, x2)] == (
            int(np.floor(resid * resid)),
            int(np.floor(abs(resid))),
        )


# --- RidgeSpec: the generated-text generalization (d <= 5) -----------


def test_ridgespec2_reproduces_handwritten_d3_text_verbatim():
    """The generator is a STRICT generalization: for m=2 slope features
    it must emit the handwritten d=3 module constants character-for-
    character, so the proven bit-identical-cross-engine property of the
    d=3 family transfers to every m the generator supports."""
    from inmem_vector_db_spark.operators import regress as R

    spec = R.RidgeSpec(2)
    assert spec.moments == R._MOMENTS
    assert spec.det_exprs == R.DET_EXPRS
    assert spec.beta_exprs == R.BETA_EXPRS
    assert spec.predict_expr == R.PREDICT_EXPR
    assert spec.sse_expr == R.SSE_EXPR


def test_ridgespec_rejects_out_of_range_m():
    from inmem_vector_db_spark.operators.regress import RidgeSpec

    for bad in (0, 5, -1):
        with pytest.raises(ValueError):
            RidgeSpec(bad)


def test_ridgespec4_cramer_matches_numpy_solve(spark):
    """4-feature Cramer text vs LAPACK on the same exact-int system."""
    from inmem_vector_db_spark.operators.regress import RidgeSpec

    rng = np.random.RandomState(7)
    n, lam = 400, 5.0
    xs = rng.randint(0, 50, (n, 4))
    y = (
        3 + 2 * xs[:, 0] - xs[:, 1] + 4 * xs[:, 3] + rng.randint(-3, 4, n)
    ).astype(np.int64)
    rows = [tuple(map(int, r)) + (int(t),) for r, t in zip(xs, y)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, x3 long, x4 long, y long")
    fit = RidgeSpec(4).ridge_fit(df, lam).collect()[0]
    x = np.column_stack([np.ones(n), xs.astype(np.float64)])
    gram = x.T @ x + np.diag([0.0, lam, lam, lam, lam])
    ref = np.linalg.solve(gram, x.T @ y.astype(np.float64))
    got = np.array([fit[f"b{i}"] for i in range(5)])
    assert np.allclose(got, ref, rtol=1e-6, atol=1e-6)


def test_ridgespec4_fit_is_partition_invariant(spark):
    from inmem_vector_db_spark.operators.regress import RidgeSpec

    spec = RidgeSpec(4)
    rows = [(i % 11, (i * i) % 7, i % 5, i % 3, 2 * i - 5) for i in range(60)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, x3 long, x4 long, y long")
    one = spec.ridge_fit(df, 2.0).collect()[0]
    many = spec.ridge_fit(df.repartition(13), 2.0).collect()[0]
    assert one == many  # exact int64 moments -> bit-identical solve
