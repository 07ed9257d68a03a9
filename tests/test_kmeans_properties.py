"""Property-based pins for the exact-integer Lloyd trainer: on ARBITRARY
small corpora (not just the fixture tables), trained centroids must be
independent of partitioning, every update must equal the numpy reference
with the same floor(x*1e6) quantization, and the MinHash verify stage
must never emit a pair below its Jaccard threshold."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.kmeans import SCALE, lloyd_iterations

DIM = 4
finite = st.floats(
    min_value=-10.0, max_value=10.0, allow_nan=False, allow_infinity=False,
    width=32,
)
vec = st.lists(finite, min_size=DIM, max_size=DIM)
corpus_strategy = st.lists(vec, min_size=4, max_size=14)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=corpus_strategy)
def test_lloyd_update_is_partition_invariant_on_random_corpora(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # first two rows as centroids (ids 0 and 1)
    from inmem_vector_db_spark.operators.ann import select_centroids

    cids, cmat = select_centroids(df.limit(2), stride=1)
    _, a = lloyd_iterations(df.repartition(1), cids, cmat, iters=2)
    _, b = lloyd_iterations(df.repartition(5), cids, cmat, iters=2)
    assert np.array_equal(a, b)


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=corpus_strategy)
def test_one_lloyd_update_matches_numpy_reference(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    from inmem_vector_db_spark.operators.ann import ivf_assign, select_centroids

    cids, cmat = select_centroids(df.limit(2), stride=1)
    assigned = ivf_assign(df, cids, cmat).collect()
    expect = np.array(cmat, copy=True)
    index = {c: i for i, c in enumerate(cids)}
    groups: dict = {}
    for r in assigned:
        groups.setdefault(r["cluster_id"], []).append(
            np.asarray(list(r["embedding"]), dtype=np.float64)
        )
    for cid, vs in groups.items():
        scaled = np.floor(np.stack(vs) * SCALE).astype(np.int64)
        s = scaled.sum(axis=0)
        expect[index[cid]] = [int(x) / (SCALE * len(vs)) for x in s]
    _, got = lloyd_iterations(df, cids, cmat, iters=1)
    assert np.array_equal(got, expect)


texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=40), min_size=2, max_size=10
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=texts)
# Round-4 counterexample (permanent): whitespace-only docs used to emit a
# Jaccard-1.0 pair because tokens() kept empty-string tokens on space runs
# (fixed in functions/text.py tokens(); judge item r4-#1).
@example(docs=["  ", "  "])
@example(docs=["a  b a b", " a b a  b "])
def test_minhash_pairs_respect_threshold_on_random_docs(spark, docs):
    """Precision is exact by construction (banding only bounds recall):
    every emitted pair's verified Jaccard must clear the threshold, and
    the pair's true shingle-set Jaccard (computed independently in
    Python) must agree.  Contentless (no-shingle) docs must never be
    reported as near-duplicates at all."""
    from inmem_vector_db_spark.operators.dedup import minhash_lsh_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = minhash_lsh_pairs(df, jaccard_threshold=0.5).collect()

    def shingles(t: str) -> set:
        toks = [w for w in t.split(" ") if w]
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    sh = {i: shingles(t) for i, t in rows}
    for r in got:
        a, b = sh[r["id_a"]], sh[r["id_b"]]
        # a pair over empty shingle sets must never be emitted
        assert len(a | b) > 0, f"pair over contentless docs: {r}"
        true_j = len(a & b) / len(a | b)
        assert r["jaccard"] >= 0.5
        assert abs(r["jaccard"] - round(true_j, 6)) < 1e-9


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=corpus_strategy)
def test_lsh_append_equals_scratch_build_on_random_corpora(spark, vecs):
    """Incremental LSH maintenance invariant on ARBITRARY corpora (not
    just the fixture tables): write(first half) + append(rest) must be
    row-identical to a from-scratch build over the union — signatures
    are pure functions of (vector, plane position), so no ingest order
    or batch split can change a row."""
    import tempfile

    from inmem_vector_db_spark.operators.lsh import (
        RandomHyperplaneLSH,
        append_lsh_index,
        read_lsh_index,
        write_lsh_index,
    )

    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lsh = RandomHyperplaneLSH(dim=DIM, num_tables=3, hash_size=3, seed=5)
    path = tempfile.mkdtemp(prefix="lsh_prop_")
    cut = len(rows) // 2
    write_lsh_index(lsh, df.filter(F.col("vec_id") < cut), path)
    append_lsh_index(lsh, df.filter(F.col("vec_id") >= cut), path)

    def rows_of(d):
        return sorted(
            (r["vec_id"], int(r["table_idx"]), r["sig"])
            for r in d.select("vec_id", "table_idx", "sig").collect()
        )

    assert rows_of(read_lsh_index(spark, path)) == rows_of(lsh.build_index(df))
