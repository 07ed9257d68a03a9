"""Distributed PageRank over an edge list — iterative join-aggregate
(the Pregel pattern expressed as DataFrame ops).

Companion to :mod:`operators.components` (connected components): where
large-star/small-star contracts a graph to its components, PageRank
propagates a score across it.  In a training-data pipeline this is the
graph-based quality-propagation family (e.g. propagating trust/quality
through a user-item or doc-link interaction graph).

Shape for scale:

* the graph lives as a distributed (src, dst, weight) edge DataFrame;
  node strengths are one groupBy; each iteration is one join (ranks ×
  edges, both partitioned by the join key) + one groupBy(dst) — the
  classic two-shuffle PageRank step, no driver-side state beyond the
  loop counter;
* a FIXED iteration count (default 3) keeps the computation
  oracle-replayable (each iteration unrolls to one SQL CTE) and the
  lineage bounded — for unbounded convergence loops, checkpoint every
  ~5 iterations exactly as operators.components does;
* damping handles rank leakage; with an undirected (symmetrized) edge
  set there are no dangling nodes, so mass is conserved without a
  dangling-sink correction term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


# Target bytes of cached transition rows per partition (~24 B/row:
# two longs + a double, pre-compression).  Sizing the dst-repartition
# from the MEASURED edge count keeps every iteration's task count
# proportional to the graph — the r12 form used the static
# spark.sql.shuffle.partitions (64), which at bench scale ran ~64 tasks
# per iteration stage over a few MB of edges (r13 profile:
# pagerank_bipartite = 1354 tasks) and at 100 TB would UNDER-partition
# by the same static count.  32 MB/partition is the guide's 100 MB-1 GB
# post-compression band applied to this narrow uncompressed layout.
_TRANS_PARTITION_BYTES = 32 << 20

# CPU floor on the byte-derived partition count (r14): the iteration
# stage is a per-row hash-join probe + aggregate, ~1 us/row — a 32 MB
# (~1.4M-row) partition is ~1 s of single-task latency that EVERY
# iteration waits on serially (r13 shipped n_parts=1 at bench scale:
# three 0.65 s one-task stages in the profile).  When the byte target
# yields fewer partitions than the cluster has slots AND the graph has
# enough rows to split into >= _TRANS_MIN_ROWS_PER_TASK chunks (so tiny
# test graphs stay at 1 task), raise the count to use the slots.  This
# is the same small-bytes/CPU-heavy correction as the dedup pair-GEMM
# pins (operators/dedup.py), and it also covers the r13 advisor note
# that 24 B/row underestimates the cached in-memory footprint: the
# floor, not the byte estimate, governs until the graph outgrows the
# cluster (where the byte sizing takes over and what matters is its
# linearity, not its absolute accuracy).
_TRANS_MIN_ROWS_PER_TASK = 50_000


def _transition_table(edges: DataFrame, symmetrize: bool = True):
    """(e, strength, trans, n_nodes, n_edges): the cached PageRank
    transition layout.

    Transition weight per edge = w / strength(src), computed once.
    ``trans`` is partitioned by dst: with broadcast ranks the
    per-iteration join is map-side, so the contribution groupBy(dst)
    finds its input already dst-partitioned and needs NO exchange —
    one shuffle when the table is built, zero per iteration (the
    classic cached-transition-matrix layout).  Shared with the plan
    test so the no-Exchange pin guards THIS code, not a copy.

    The one bounded materialization job here (1-row agg over strength)
    doubles as the node census ``pagerank`` previously ran separately
    AND yields the edge count that sizes the dst-repartition
    (``_TRANS_PARTITION_BYTES``), so partitioning follows the data
    instead of a static shuffle-partition constant."""
    e = edges.select("src", "dst", F.col("weight").cast("double").alias("w"))
    if symmetrize:
        # explode both directions in ONE pass (r14): the r13
        # union-of-two-selects shape planned the edge subtree TWICE —
        # the physical union evaluates each branch independently, so
        # an edge list built by a join+aggregate (the entry's shape)
        # paid its full compute and map output twice (profiled: the
        # census job's heaviest stages ran 2x64 tasks).  posexplode of
        # a 2-struct array emits the same row multiset from a single
        # evaluation of the child.
        e = e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"),
                        F.col("dst").alias("dst"),
                        F.col("w").alias("w"),
                    ),
                    F.struct(
                        F.col("dst").alias("src"),
                        F.col("src").alias("dst"),
                        F.col("w").alias("w"),
                    ),
                )
            ).alias("__e")
        ).select("__e.*")
    e = e.persist()
    strength = e.groupBy("src").agg(
        F.sum("w").alias("strength"), F.count(F.lit(1)).alias("deg")
    ).persist()
    dom = strength.agg(
        F.count(F.lit(1)).alias("n"), F.sum("deg").alias("m")
    ).head()
    n_nodes = int(dom["n"] or 0)
    n_edges = int(dom["m"] or 0)
    n_parts = max(1, -(-(n_edges * 24) // _TRANS_PARTITION_BYTES))
    # CPU floor (see _TRANS_MIN_ROWS_PER_TASK): fill the cluster's
    # slots whenever the graph has the rows to justify it
    slots = edges.sparkSession.sparkContext.defaultParallelism
    n_parts = max(
        n_parts, min(slots, -(-n_edges // _TRANS_MIN_ROWS_PER_TASK))
    )
    trans = e.join(strength, "src").select(
        "src", "dst", (F.col("w") / F.col("strength")).alias("p")
    ).repartition(n_parts, F.col("dst")).persist()
    return e, strength, trans, n_nodes, n_edges


def _iteration_contrib(trans: DataFrame, ranks: DataFrame, broadcast: bool):
    """One PageRank iteration's inflow aggregate (shared with the plan
    test): broadcast-rank join into the dst-partitioned transition
    table, then partial+final groupBy(dst) with no Exchange."""
    r = F.broadcast(ranks) if broadcast else ranks
    return (
        trans.join(r, trans["src"] == r["node"])
        .select("dst", (F.col("rank") * F.col("p")).alias("c"))
        .groupBy("dst")
        .agg(F.sum("c").alias("inflow"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    symmetrize: bool = True,
    broadcast_ranks: bool | None = None,
    tol: float | None = None,
) -> DataFrame:
    """Weighted PageRank:
    ``r'(v) = (1-d)/N + d * sum over (u,v) of r(u) * w_uv / strength(u)``.

    ``edges``: (src long, dst long, weight double).  Returns
    (node, rank double) after ``iters`` synchronous iterations from the
    uniform start r0 = 1/N.

    ``tol``: when set, iteration stops early once the L1 delta between
    successive rank vectors drops below it (``iters`` becomes the
    max-iteration budget) — one extra distributed aggregation per
    iteration over the already-cached frontiers.

    Join strategy: the rank vector is 16 bytes/node, so up to tens of
    millions of nodes it BROADCASTS into the edge join — each iteration
    is then one map-side join + one groupBy(dst), and the persisted
    transition table is never reshuffled.  ``broadcast_ranks=None``
    auto-picks by node count; pass ``False`` for billion-node graphs,
    where the partitioned shuffle join is the only option.
    """
    e, strength, trans, n_nodes, _ = _transition_table(edges, symmetrize)
    if symmetrize:
        # strength doubles as the node universe: one row per node (every
        # node appears as src after symmetrization), so no separate
        # distinct() job; n_nodes came from _transition_table's single
        # bounded materialization job (which also sized trans)
        nodes = strength.select(F.col("src").alias("node"))
    else:
        # directed graph: sink nodes (dst-only, no out-edge) are real
        # nodes — they receive inflow and count toward N, they just
        # contribute nothing.  Deriving the universe from src alone
        # would silently drop them AND their received mass.  Rank mass
        # parked on sinks leaks each iteration (the standard
        # no-dangling-correction PageRank); total rank sums to < 1 when
        # sinks exist, by design.
        nodes = (
            e.select(F.col("src").alias("node"))
            .union(e.select(F.col("dst").alias("node")))
            .distinct()
            .persist()
        )
        n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank: empty edge set (no nodes)")
    if broadcast_ranks is None:
        broadcast_ranks = n_nodes <= 10_000_000
    base = (1.0 - damping) / n_nodes
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    pinned: list[DataFrame] = []  # frontiers currently persisted (tol path)
    for it in range(iters):
        contrib = _iteration_contrib(trans, ranks, broadcast_ranks)
        if symmetrize:
            # symmetrized graph: every node has degree >= 1, hence an
            # in-edge, hence inflow — no node-universe join needed
            new_ranks = contrib.select(
                F.col("dst").alias("node"),
                (F.lit(base) + F.lit(damping) * F.col("inflow")).alias("rank"),
            )
        else:
            # directed graph: nodes with no in-edges fall back to base
            new_ranks = nodes.join(
                contrib, nodes["node"] == contrib["dst"], "left"
            ).select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
        if tol is None:
            # fixed-iteration run (r14): NO per-iteration
            # materialization.  Each frontier occurs exactly once in
            # the chained plan (feeding the next iteration's
            # broadcast/shuffle join), so the ONE terminal action
            # computes every iteration exactly once, bottom-up — the
            # O(iters^2) recompute hazard only exists when frontiers
            # are EXECUTED per loop step (a broadcast collect per
            # iteration over uncached lineage).  This removes the
            # r13 persist+count pair — 2 driver jobs per iteration —
            # without losing the protection.  For unbounded iteration
            # counts the docstring's checkpoint-every-~5 guidance
            # still applies (plan depth grows with iters).
            ranks = new_ranks
            continue
        # convergence-checked run: the L1 delta references the frontier
        # TWICE (as `new` now, as `old` next iteration), so each
        # frontier must be materialized per iteration; the delta head()
        # below is that materializing action (persist + first action —
        # the r13 shape ran a separate count() first, one extra job).
        # (A driver-side literal frontier was tried and reverted:
        # createDataFrame routes the rank vector JVM->Python->executors,
        # its BroadcastExchange still runs a collect job, and near the
        # broadcast threshold the Python row objects risk driver OOM the
        # compact JVM-side collect never does.)
        new_ranks = new_ranks.persist()
        delta_row = (
            new_ranks.alias("new")
            .join(ranks.alias("old"), F.col("new.node") == F.col("old.node"))
            .agg(
                F.sum(F.abs(F.col("new.rank") - F.col("old.rank"))).alias("d")
            )
            .head()
        )
        converged = delta_row["d"] is not None and delta_row["d"] < tol
        pinned.append(new_ranks)
        if it == 0:
            # trans is now cached (the delta action computed it); the
            # raw edge cache has no further readers.  Runs BEFORE any
            # convergence break so an it==0 stop can't leak it.
            e.unpersist()
        # the superseded frontier has no readers once the new one is
        # materialized and the delta read — drop it so long runs (and
        # repeated pagerank() calls in one session) pin only O(1) caches
        if len(pinned) > 1:
            pinned.pop(0).unpersist()
        ranks = new_ranks
        if converged:
            break
    # hand back a lineage-free result so EVERY cache this call pinned
    # can be released: localCheckpoint runs the (single) terminal action
    # — in the lazy fixed-iteration path this is the one job that
    # computes all iterations (each BroadcastExchange materializes its
    # frontier subtree exactly once, bottom-up) — and the checkpoint
    # blocks are GC'd with the DataFrame, unlike CacheManager entries
    # which pin until unpersist.  Released: any pinned frontier (tol
    # path), the transition table, the strength table, the node
    # universe (directed path), and the raw edge cache (already gone
    # after iteration 0 in the tol path; unpersist is idempotent) — so
    # repeated pagerank() calls in one session pin nothing.
    out = ranks.localCheckpoint(eager=True)
    if pinned:
        pinned.pop().unpersist()
    for df in (trans, strength, nodes, e):
        df.unpersist()
    return out
