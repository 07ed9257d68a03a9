"""PageRank: hand-checked small graphs, mass conservation, symmetry."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_symmetric_pair_is_uniform(spark):
    """Two nodes joined by one edge: ranks stay exactly uniform."""
    out = {
        r["node"]: r["rank"]
        for r in pagerank(_edges(spark, [(1, 2, 1.0)]), iters=3).collect()
    }
    assert out[1] == pytest.approx(0.5)
    assert out[2] == pytest.approx(0.5)


def test_star_center_outranks_leaves(spark):
    """A star graph: the hub must out-rank every leaf, leaves equal."""
    rows = [(0, i, 1.0) for i in (1, 2, 3, 4)]
    out = {
        r["node"]: r["rank"] for r in pagerank(_edges(spark, rows), iters=3).collect()
    }
    assert all(out[0] > out[i] for i in (1, 2, 3, 4))
    assert out[1] == pytest.approx(out[2]) == pytest.approx(out[3])


def test_rank_mass_conserved(spark):
    """Sum of ranks stays 1 (symmetrized graph has no dangling mass)."""
    rows = [(1, 2, 1.0), (2, 3, 2.0), (3, 4, 1.0), (4, 1, 3.0), (1, 3, 1.0)]
    total = (
        pagerank(_edges(spark, rows), iters=4)
        .agg(F.sum("rank").alias("s"))
        .head()["s"]
    )
    assert total == pytest.approx(1.0, abs=1e-9)


def test_weight_pulls_rank(spark):
    """Node 2 shares an edge with hub 1 at weight 9; node 3 at weight 1:
    node 2 must collect more rank."""
    rows = [(1, 2, 9.0), (1, 3, 1.0)]
    out = {
        r["node"]: r["rank"] for r in pagerank(_edges(spark, rows), iters=3).collect()
    }
    assert out[2] > out[3]


def test_empty_graph_raises(spark):
    empty = spark.createDataFrame([], "src long, dst long, weight double")
    with pytest.raises(ValueError, match="empty"):
        pagerank(empty, iters=1)


def test_directed_includes_sink_nodes(spark):
    """symmetrize=False: a dst-only sink must appear in the result with
    base + damping*inflow — previously the src-derived node universe
    dropped sinks and their received mass entirely."""
    from inmem_vector_db_spark.operators.graph import pagerank

    # 1 -> 2 -> 3 (3 is a sink: no out-edges)
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=1, symmetrize=False).collect()}
    assert set(got) == {1, 2, 3}
    base = 0.15 / 3
    assert abs(got[1] - base) < 1e-9                     # no in-edges
    assert abs(got[2] - (base + 0.85 / 3)) < 1e-9        # inflow from 1
    assert abs(got[3] - (base + 0.85 / 3)) < 1e-9        # sink receives inflow from 2


def test_directed_two_iters_sink_mass_leaks(spark):
    """Documented no-dangling-correction behavior: with a sink, total
    rank after >=2 directed iterations is < 1 (mass parked on the sink
    leaks), while every node still gets >= base."""
    from inmem_vector_db_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=2, symmetrize=False).collect()}
    assert set(got) == {1, 2, 3}
    assert sum(got.values()) < 1.0
    assert all(v >= 0.15 / 3 - 1e-12 for v in got.values())


def test_pagerank_tol_early_stop(spark):
    """With tol set, iteration stops once the L1 delta converges; a
    tol too tight to trigger matches the fixed-iteration run exactly,
    and a loose tol stays near the fixed point."""
    edges = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 1, 1.0), (3, 4, 2.0)],
        "src long, dst long, weight double",
    )
    from inmem_vector_db_spark.operators.graph import pagerank

    converged = {
        r["node"]: round(r["rank"], 8)
        for r in pagerank(edges, iters=8, tol=1e-12).collect()
    }
    fixed = {
        r["node"]: round(r["rank"], 8)
        for r in pagerank(edges, iters=8).collect()
    }
    assert converged == fixed
    # loose tol stops early yet stays close to the 8-iteration point
    loose = {
        r["node"]: r["rank"] for r in pagerank(edges, iters=8, tol=0.05).collect()
    }
    assert all(abs(loose[n] - fixed[n]) < 0.05 for n in fixed)
