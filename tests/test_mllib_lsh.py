"""MLlib LSH comparison paths vs the engine's own implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.dedup import minhash_lsh_pairs
from inmem_vector_db_spark.operators.knn import knn
from inmem_vector_db_spark.operators.mllib_lsh import (
    brp_nearest_neighbors,
    brp_similarity_join,
    minhash_similarity_join,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").cache()
    df.count()
    return df


def test_brp_nearest_neighbors_overlaps_exact(emb):
    q = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]
    exact = {r["vec_id"] for r in knn(emb, q, k=10, metric="euclidean").collect()}
    approx_rows = brp_nearest_neighbors(emb, q, k=10, num_hash_tables=5).collect()
    approx = {r["vec_id"] for r in approx_rows}
    assert 0 in approx  # self is found
    assert len(exact & approx) >= 5  # decent overlap with ground truth
    dists = [r["dist"] for r in approx_rows]
    assert dists == sorted(dists)


def test_brp_similarity_join_subset_of_exact(emb):
    """Every pair MLlib emits under the threshold must genuinely be
    within the euclidean threshold (approx join has false negatives,
    never false positives after its exact distance filter)."""
    pairs = brp_similarity_join(emb.limit(200), threshold=5.0).collect()
    assert pairs, "expected some close pairs at threshold 5.0"
    for r in pairs[:20]:
        assert r["dist"] <= 5.0
        assert r["id_a"] < r["id_b"]


def test_mllib_minhash_agrees_with_engine_minhash(docs):
    """The two MinHash stacks must find substantially the same near-dup
    pairs (exact-verified engine pairs vs MLlib hashed-Jaccard pairs)."""
    ours = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(docs, jaccard_threshold=0.5).collect()
    }
    theirs = {
        (r["id_a"], r["id_b"])
        for r in minhash_similarity_join(
            docs, jaccard_distance_threshold=0.5, num_hash_tables=8
        ).collect()
    }
    assert ours, "engine found no near-dups — fixture assumption broken"
    # engine verifies exact Jaccard >= 0.5; MLlib emits hashed-Jaccard
    # distance <= 0.5 pairs. Require strong overlap of the exact set.
    hit = len(ours & theirs)
    assert hit / len(ours) >= 0.8
