"""Johnson-Lindenstrauss projection operator (operators/projection.py).

Covers the exactness contract (Spark int64 GEMM == trivial Python
reference, partition-layout independence by construction), the pruned
top-k's equality with a full ranking, and the JL quality property
(recall rises with out_dim).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.projection import (
    jl_plane_ints,
    project_embeddings_int,
    projected_topk,
)


def test_plane_ints_deterministic_and_bounded():
    P = jl_plane_ints(4, 6)
    assert P.shape == (4, 6) and P.dtype == np.int64
    assert (P >= -1000).all() and (P <= 1000).all()
    assert np.array_equal(P, jl_plane_ints(4, 6))
    # a different salt must give a different matrix (no accidental reuse
    # of the LSH plane stream)
    assert not np.array_equal(P, jl_plane_ints(4, 6, salt="lshplane"))


def test_projection_matches_python_reference_exactly(spark):
    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.uniform(-0.5, 0.5, 10).astype(np.float32)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    got = {
        r["vec_id"]: list(r["proj"])
        for r in project_embeddings_int(df, out_dim=5, in_dim=10).collect()
    }
    P = jl_plane_ints(5, 10)
    for i, emb in rows:
        vi = [int(np.floor(np.float64(x) * 1000)) for x in emb]
        want = [sum(vi[d] * int(P[j, d]) for d in range(10)) for j in range(5)]
        assert got[i] == want, i


def test_projection_is_partition_layout_independent(spark):
    rng = np.random.default_rng(11)
    rows = [
        (i, [float(x) for x in rng.uniform(-0.5, 0.5, 8).astype(np.float32)])
        for i in range(100)
    ]
    df1 = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    df2 = df1.repartition(7)
    a = sorted(map(tuple, project_embeddings_int(df1, 4, 8).collect()))
    b = sorted(map(tuple, project_embeddings_int(df2, 4, 8).collect()))
    assert a == b


def test_projected_topk_equals_full_ranking(spark):
    """The map-side per-batch pruning must be invisible: the survivors'
    global rank equals a rank over the UNpruned projected table."""
    rng = np.random.default_rng(3)
    rows = [
        (i, [float(x) for x in rng.uniform(-0.5, 0.5, 12).astype(np.float32)])
        for i in range(200)
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).repartition(5)
    proj = project_embeddings_int(df, out_dim=6, in_dim=12)
    qp = {
        int(r["vec_id"]): np.array(r["proj"], dtype=np.int64)
        for r in proj.filter(F.col("vec_id").isin([0, 17])).collect()
    }
    got = sorted(
        (r["query_id"], r["vec_id"], r["d2"])
        for r in projected_topk(proj, qp, k=7).collect()
    )
    qdf = spark.createDataFrame(
        [(int(q), [int(x) for x in v]) for q, v in sorted(qp.items())],
        "query_id bigint, qp array<bigint>",
    )
    d2 = F.aggregate(
        F.zip_with("proj", "qp", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    ).alias("d2")
    full = proj.crossJoin(F.broadcast(qdf)).select("query_id", "vec_id", d2)
    w = Window.partitionBy("query_id").orderBy("d2", "vec_id")
    want = sorted(
        (r["query_id"], r["vec_id"], r["d2"])
        for r in full.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 7)
        .drop("rn")
        .collect()
    )
    assert got == want


def test_recall_rises_with_out_dim(spark, sf_dir):
    """The JL lemma in effect: more projected dimensions preserve more
    neighborhood structure.  Random embeddings are the WORST case for
    any projection (distances concentrate), so absolute recall is modest
    — the pin is the trend plus a better-than-chance floor.  Measured:
    mean recall@10 0.100 @ 8 dims vs 0.275 @ 32 dims (sf0.001)."""
    import __spark_entry__ as entrymod

    emb = entrymod._emb(spark, sf_dir)
    means = {}
    for od in (8, 32):
        proj = project_embeddings_int(emb, out_dim=od, in_dim=64)
        qp = {
            int(r["vec_id"]): np.array(r["proj"], dtype=np.int64)
            for r in proj.filter(F.col("vec_id").isin([2, 7, 11, 19])).collect()
        }
        approx = projected_topk(proj, qp, k=10).select("query_id", "vec_id")
        rec = entrymod._recall_vs_exact(spark, sf_dir, approx, k=10).collect()
        means[od] = sum(r["recall_at_10"] for r in rec) / len(rec)
    assert means[32] > means[8], means
    assert means[8] >= 0.05, means  # >= 2.5x chance (10/500)


# --- Hypothesis property: on ARBITRARY small corpora (any finite float32
# vectors, any out_dim), the Spark projection must equal the trivially
# correct Python reference with the same floor(x*1000) quantization, and
# must be invariant to repartitioning.  Derandomized per house style so
# certified green runs reproduce.
from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_IN_DIM = 5
_finite = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False,
    width=32,
)
_vec = st.lists(_finite, min_size=_IN_DIM, max_size=_IN_DIM)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vecs=st.lists(_vec, min_size=1, max_size=12),
    out_dim=st.integers(min_value=1, max_value=6),
)
def test_projection_property_matches_reference(spark, vecs, out_dim):
    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(
        rows, f"vec_id bigint, embedding array<float>"
    ).repartition(3)
    got = {
        r["vec_id"]: list(r["proj"])
        for r in project_embeddings_int(df, out_dim, _IN_DIM).collect()
    }
    P = jl_plane_ints(out_dim, _IN_DIM)
    for i, emb in rows:
        vi = [int(np.floor(np.float64(np.float32(x)) * 1000)) for x in emb]
        want = [
            sum(vi[d] * int(P[j, d]) for d in range(_IN_DIM))
            for j in range(out_dim)
        ]
        assert got[i] == want, (i, emb)
