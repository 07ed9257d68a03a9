"""Distance kernels vs numpy ground truth (semantic spec:
reference ``app/core/indexers/indexer.py:89-130``)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import inmem_vector_db_spark.functions.distance as D


def np_metric(metric: str, q: np.ndarray, v: np.ndarray) -> float:
    # Mirrors reference indexer.py:106-130.
    if metric == "euclidean":
        return float(np.linalg.norm(q - v))
    if metric == "cosine":
        nq, nv = np.linalg.norm(q), np.linalg.norm(v)
        if nq == 0 or nv == 0:
            return 1.0
        return float(1.0 - np.dot(q, v) / (nq * nv))
    if metric == "dot_product":
        return float(-np.dot(q, v))
    if metric == "manhattan":
        return float(np.abs(q - v).sum())
    raise ValueError(metric)


@pytest.mark.parametrize("metric", ["euclidean", "cosine", "dot_product", "manhattan"])
def test_metric_matches_numpy(spark, metric):
    rng = np.random.default_rng(42)
    q = rng.normal(size=16)
    vs = rng.normal(size=(20, 16))
    df = spark.createDataFrame(
        [(i, [float(x) for x in vs[i]]) for i in range(len(vs))], "id int, v array<double>"
    )
    qlit = F.lit([float(x) for x in q])
    got = {
        r["id"]: r["d"]
        for r in df.select("id", D.distance(metric, qlit, F.col("v")).alias("d")).collect()
    }
    for i in range(len(vs)):
        assert got[i] == pytest.approx(np_metric(metric, q, vs[i]), abs=1e-9)


def test_cosine_zero_norm_guard(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0]), (2, [1.0, 0.0])], "id int, v array<double>")
    qlit = F.lit([1.0, 1.0])
    got = {r["id"]: r["d"] for r in df.select("id", D.cosine(qlit, F.col("v")).alias("d")).collect()}
    assert got[1] == 1.0  # zero-norm vector => distance 1.0 (indexer.py:118-120)
    # and zero-norm QUERY => 1.0 for everything
    z = df.select(D.cosine(F.lit([0.0, 0.0]), F.col("v")).alias("d")).collect()
    assert all(r["d"] == 1.0 for r in z)


def test_dot_product_is_negated(spark):
    df = spark.createDataFrame([(1, [1.0, 2.0])], "id int, v array<double>")
    d = df.select(D.dot_product(F.lit([3.0, 4.0]), F.col("v")).alias("d")).head()["d"]
    assert d == -11.0


def test_l2_normalize(spark):
    df = spark.createDataFrame([(1, [3.0, 4.0]), (2, [0.0, 0.0])], "id int, v array<double>")
    rows = {r["id"]: r["n"] for r in df.select("id", D.l2_normalize("v").alias("n")).collect()}
    assert rows[1] == pytest.approx([0.6, 0.8])
    assert rows[2] == [0.0, 0.0]  # zero-vector guard


def test_float32_input_upcast(spark):
    df = spark.createDataFrame([(1, [1.5, 2.5])], "id int, v array<float>")
    d = df.select(D.euclidean(F.lit([0.0, 0.0]), F.col("v")).alias("d")).head()["d"]
    assert d == pytest.approx(float(np.hypot(1.5, 2.5)))
