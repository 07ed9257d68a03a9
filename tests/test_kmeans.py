"""Distributed Lloyd k-means: exactness, invariance, and quality."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.kmeans import (
    SCALE,
    kmeans_fit,
    kmeans_summary,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_partitioning_invariance(spark, emb):
    """The exact integer update must make trained centroids bit-identical
    under any partitioning — the whole point of quantized sums."""
    cids1, cmat1 = kmeans_fit(emb.repartition(7), iters=2)
    cids2, cmat2 = kmeans_fit(emb.repartition(2, "vec_id"), iters=2)
    assert cids1 == cids2
    assert np.array_equal(cmat1, cmat2)  # bitwise, not allclose


def test_lloyd_reduces_inertia(spark, emb):
    """Each Lloyd step must not increase total within-cluster distance
    (up to the 1e-6 centroid quantization, which perturbs inertia by at
    most ~2*dim*1e-6 per point)."""

    def inertia(cids, cmat):
        from inmem_vector_db_spark.operators.ann import ivf_assign

        assigned = ivf_assign(emb, cids, cmat)
        rows = assigned.collect()
        index = {c: i for i, c in enumerate(cids)}
        tot = 0.0
        for r in rows:
            v = np.asarray(list(r["embedding"]), dtype=np.float64)
            tot += float(((v - cmat[index[r["cluster_id"]]]) ** 2).sum())
        return tot

    i0 = inertia(*kmeans_fit(emb, iters=0))
    i1 = inertia(*kmeans_fit(emb, iters=1))
    i2 = inertia(*kmeans_fit(emb, iters=2))
    slack = 1e-3
    assert i1 <= i0 + slack and i2 <= i1 + slack
    assert i1 < i0  # stride init is strictly improvable on this corpus


def test_iters_zero_is_stride_init(spark, emb):
    from inmem_vector_db_spark.operators.ann import select_centroids

    cids0, cmat0 = select_centroids(emb, stride=50)
    cids, cmat = kmeans_fit(emb, iters=0, stride=50)
    assert cids == cids0 and np.array_equal(cmat, cmat0)


def test_summary_accounts_every_vector(spark, emb):
    cids, cmat = kmeans_fit(emb, iters=2)
    out = kmeans_summary(emb, cids, cmat)
    rows = out.collect()
    assert sum(r["n_members"] for r in rows) == emb.count()
    assert set(r["cid"] for r in rows) <= set(cids)
    for r in rows:  # mean coordinate must sit inside the data range
        assert -1.0 < r["mean_dim1"] < 1.0


def test_update_matches_numpy_reference(spark, emb):
    """One Lloyd update == the straightforward numpy computation with
    the same floor(x*1e6) quantization."""
    from inmem_vector_db_spark.operators.ann import ivf_assign, select_centroids

    cids, cmat = select_centroids(emb, stride=50)
    assigned = ivf_assign(emb, cids, cmat).collect()
    by_c: dict = {}
    for r in assigned:
        by_c.setdefault(r["cluster_id"], []).append(
            np.asarray(list(r["embedding"]), dtype=np.float64)
        )
    expect = np.array(cmat, copy=True)
    index = {c: i for i, c in enumerate(cids)}
    for cid, vs in by_c.items():
        scaled = np.floor(np.stack(vs) * SCALE).astype(np.int64)
        s = scaled.sum(axis=0)
        expect[index[cid]] = [int(x) / (SCALE * len(vs)) for x in s]
    _, got = kmeans_fit(emb, iters=1, stride=50)
    assert np.array_equal(got, expect)
