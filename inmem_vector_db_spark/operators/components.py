"""Distributed connected components over an edge DataFrame.

The dedup family (``operators.dedup``) emits near-duplicate *pairs*;
turning pairs into dedup decisions needs *clusters*: if A~B and B~C,
then {A,B,C} is one duplicate group even when A~C was never emitted.
That is connected components over the pair graph.

Algorithm: alternating **large-star / small-star** (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14). Each half-round is one ``groupBy(min)`` plus one
equi-join — both plain shuffles on the node id — and the edge set
converges to a star forest (every node pointing at its component's
minimum id) in O(log^2 n) rounds regardless of graph diameter. That
bound is why this beats naive min-label propagation at 100 TB: a
propagation loop needs diameter-many rounds, and templated-spam dup
chains make the diameter linear in the worst case, while star
contraction stays logarithmic.

Scale shape per round: shuffle keyed on node id only (two BIGINT
columns move), no collect_set (high-degree "celebrity" nodes never
materialize a neighbor list — the min is computed as a partial
aggregate map-side), and ``localCheckpoint`` truncates the iterative
lineage so the plan does not grow with the round count.

The reference engine has no graph step (its dedup story stops at the
index); this is a beyond-reference operator motivated by LLM-corpus
curation, where cluster-then-keep-one-canonical-doc is the standard
near-dup removal step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(row count, order-insensitive hash sum) — cheap convergence probe."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        # xor, not sum: order-insensitive over the distinct edge set and
        # immune to ANSI long-overflow on full-range hash values
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row["n"]), int(row["h"])


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(N(u) + {u})."""
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))
        .select("u", F.least("u", "mn").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small, then connect each small neighbor (and u)
    to the minimum of u's small neighborhood."""
    directed = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = directed.groupBy("u").agg(F.min("v").alias("m"))
    return (
        directed.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


# Below this many (distinct) edges the component structure fits the
# driver trivially (1M edges of two BIGINTs ~ 16 MB) and a union-find
# beats log^2-n rounds of 3 Spark jobs each by an order of magnitude.
# The same adaptive posture as AQE: measure, then pick the physical
# strategy; at 100 TB the star loop runs, on a verified near-dup pair
# set (rare by construction) the driver path does.
SMALL_EDGE_CUTOFF = 1_000_000


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Exact small-graph path: classic union-find over a BOUNDED collected
    edge list (caller guarantees ``count <= SMALL_EDGE_CUTOFF``), labels =
    min node id per component — identical output to the star loop."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in e.collect():
        u, v = row["u"], row["v"]
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
    label: dict = {}
    for node in parent:
        r = find(node)
        if r not in label or node < label[r]:
            label[r] = node
    rows = [(node, label[find(node)]) for node in parent]
    node_t = e.schema["u"].dataType.simpleString()
    # literal_df (r14): driver-side union-find output is bounded by the
    # contracted graph; LocalRelation beats the pickled-RDD lane
    from inmem_vector_db_spark.functions.localframe import literal_df

    return literal_df(
        e.sparkSession, rows, f"node {node_t}, component {node_t}"
    )


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    small_cutoff: int = SMALL_EDGE_CUTOFF,
) -> DataFrame:
    """Label every node of an undirected edge list with its component.

    Returns ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component; isolated endpoints never
    appear in ``edges`` so callers union singletons themselves if they
    need total coverage (the dedup path does not — singletons are
    trivially their own cluster).

    ``max_iter`` bounds the alternating rounds; with the O(log^2 n)
    guarantee, 25 rounds covers graphs far beyond any realistic corpus
    (2^25 node ids per star chain). Raises ``RuntimeError`` if the edge
    set has not stabilized by then, rather than silently returning a
    partial labeling.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_edges = e.count()  # cached by the checkpoint — a metadata-cheap job
    if n_edges == 0:
        return e.select(
            F.col("u").alias("node"), F.col("v").alias("component")
        )
    if small_cutoff and n_edges <= small_cutoff:
        return _driver_union_find(e)
    prev = _fingerprint(e)
    for _ in range(max_iter):
        e_next = _small_star(_large_star(e)).localCheckpoint(eager=True)
        cur = _fingerprint(e_next)
        e.unpersist()
        e = e_next
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # Converged small-star output is a star forest: (node -> root) for
    # every non-root node. Roots appear only on the right; add them.
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("node")).distinct().join(
        labels.select("node"), "node", "left_anti"
    )
    return labels.union(
        roots.select("node", F.col("node").alias("component"))
    )
