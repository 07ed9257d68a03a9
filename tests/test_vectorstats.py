"""Gramian / covariance vs numpy ground truth, partition invariance."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.vectorstats import (
    column_means,
    covariance_from_gramian,
    gramian,
    power_iteration,
    project,
)


def _df(spark, x):
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "id LONG, embedding ARRAY<DOUBLE>",
    )


def _dense(rows, d):
    g = np.zeros((d, d))
    for r in rows:
        g[r["i"], r["j"]] = r["g"]
        g[r["j"], r["i"]] = r["g"]
    return g


def test_gramian_matches_numpy(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(size=(40, 5))
    got = _dense(gramian(_df(spark, x), "embedding").collect(), 5)
    assert np.allclose(got, x.T @ x, atol=1e-9)


def test_gramian_partition_invariant(spark):
    rng = np.random.default_rng(8)
    x = rng.normal(size=(60, 4))
    a = _dense(gramian(_df(spark, x).repartition(1)).collect(), 4)
    b = _dense(gramian(_df(spark, x).repartition(7)).collect(), 4)
    assert np.allclose(a, b, atol=1e-9)


def test_covariance_matches_numpy(spark):
    rng = np.random.default_rng(9)
    x = rng.normal(size=(50, 3)) + [1.0, -2.0, 0.5]
    df = _df(spark, x)
    cov_rows = covariance_from_gramian(
        gramian(df), column_means(df), n=50
    ).collect()
    got = np.zeros((3, 3))
    for r in cov_rows:
        got[r["i"], r["j"]] = r["cov"]
        got[r["j"], r["i"]] = r["cov"]
    assert np.allclose(got, np.cov(x.T, bias=True), atol=1e-9)


def test_pca_from_gramian_recovers_principal_axis(spark):
    # the point of the operator: eigen on the d x d driver-side matrix
    rng = np.random.default_rng(10)
    axis = np.array([3.0, 1.0, 0.0])
    x = rng.normal(size=(200, 1)) * axis + rng.normal(size=(200, 3)) * 0.05
    df = _df(spark, x)
    cov = covariance_from_gramian(gramian(df), column_means(df), n=200)
    c = np.zeros((3, 3))
    for r in cov.collect():
        c[r["i"], r["j"]] = r["cov"]
        c[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(c)
    top = v[:, np.argmax(w)]
    expect = axis / np.linalg.norm(axis)
    assert abs(abs(top @ expect) - 1.0) < 1e-2


def test_power_iteration_matches_eigh(spark):
    rng = np.random.default_rng(11)
    # dominant axis => large eigengap => fast, testable convergence
    axis = np.array([2.0, -1.0, 0.5, 0.0, 1.0])
    x = rng.normal(size=(120, 1)) * axis + rng.normal(size=(120, 5)) * 0.1
    cells = [(r["i"], r["j"], r["g"]) for r in gramian(_df(spark, x)).collect()]
    v = power_iteration(cells, 5, iters=60)
    g = x.T @ x
    w, vecs = np.linalg.eigh(g)
    top = vecs[:, np.argmax(w)]
    # eigenvector up to sign
    assert abs(abs(v @ top) - 1.0) < 1e-9
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_project_matches_numpy_dot(spark):
    rng = np.random.default_rng(12)
    x = rng.normal(size=(40, 6))
    v = rng.normal(size=6)
    v /= np.linalg.norm(v)
    df = _df(spark, x)
    rows = df.select("id", project(df, v).alias("p")).collect()
    got = {r["id"]: r["p"] for r in rows}
    for i, row in enumerate(x):
        assert abs(got[i] - float(row @ v)) < 1e-9
