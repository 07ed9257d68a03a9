"""MLlib LSH comparison paths (SURVEY.md 7.2 step 5).

The engine's primary approximate-kNN path is the hand-rolled seeded
random-hyperplane LSH (``operators.lsh``) because its semantics mirror
the reference (``app/core/indexers/lsh.py``: sign-bit signatures, exact
re-rank, <k fallback) and its signatures are DuckDB-reproducible.

MLlib ships two LSH families that cover the same ground with different
tradeoffs; both are wired here as comparison/validation paths:

* ``BucketedRandomProjectionLSH`` — euclidean-distance LSH (random
  projection + bucketing).  ``approxNearestNeighbors`` is driver-side
  single-query; ``approxSimilarityJoin`` is the distributed pairwise
  path.
* ``MinHashLSH`` — Jaccard similarity over sparse binary vectors; the
  MLlib counterpart of ``operators.dedup.minhash_lsh_pairs``.

These run on Vector (UDT) columns, so ``array<float>`` embedding columns
pass through ``array_to_vector`` first — a cheap JVM-side conversion.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _vectorize(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("__features", array_to_vector(F.col(vec_col)))


def brp_similarity_join(
    a: DataFrame,
    b: DataFrame | None = None,
    threshold: float = 1.0,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """All pairs within euclidean ``threshold`` via MLlib bucketed random
    projection — the distributed similarity self-join (b=None) or A×B
    join.  Output: (id_a, id_b, dist), id_a < id_b for self-joins."""
    va = _vectorize(a.select(id_col, vec_col), vec_col)
    model = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(va)
    vb = va if b is None else _vectorize(b.select(id_col, vec_col), vec_col)
    joined = model.approxSimilarityJoin(va, vb, threshold, distCol="dist")
    out = joined.select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        F.round("dist", 6).alias("dist"),
    )
    if b is None:
        out = out.filter(F.col("id_a") < F.col("id_b"))
    return out


def brp_nearest_neighbors(
    corpus: DataFrame,
    query_vec,
    k: int = 10,
    bucket_length: float = 2.0,
    num_hash_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """MLlib approxNearestNeighbors for one query (euclidean).
    Comparison path for ``operators.knn.knn`` / ``operators.lsh``."""
    from pyspark.ml.linalg import Vectors

    v = _vectorize(corpus.select(id_col, vec_col), vec_col)
    model = BucketedRandomProjectionLSH(
        inputCol="__features",
        outputCol="__hashes",
        bucketLength=bucket_length,
        numHashTables=num_hash_tables,
        seed=seed,
    ).fit(v)
    key = Vectors.dense([float(x) for x in query_vec])
    return model.approxNearestNeighbors(v, key, k, distCol="dist").select(
        id_col, F.round("dist", 6).alias("dist")
    )


def minhash_similarity_join(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hash_tables: int = 5,
    jaccard_distance_threshold: float = 0.5,
    vocab_bits: int = 18,
    seed: int = 42,
) -> DataFrame:
    """MLlib MinHashLSH near-dup join — comparison path for
    ``operators.dedup.minhash_lsh_pairs``.

    Shingles are feature-hashed into a 2^vocab_bits-dim sparse binary
    vector JVM-side (xxhash64 -> index), then MinHashLSH buckets and
    ``approxSimilarityJoin`` emits pairs under the Jaccard *distance*
    threshold.  Note MLlib computes Jaccard on the hashed-index sets
    (collisions can merge shingles; at 2^18 dims negligible for ~1e4-doc
    blocks)."""
    from inmem_vector_db_spark.functions.text import word_shingles

    n_dim = 1 << vocab_bits
    idx = F.array_distinct(
        F.transform(
            word_shingles(text_col, shingle_n),
            lambda s: F.abs(F.xxhash64(s)) % n_dim,
        )
    )
    feat = df.select(F.col(id_col), idx.alias("__idx")).filter(F.size("__idx") > 0)

    # build SparseVector rows (MLlib needs the Vector UDT; UDTs are not
    # Arrow-expressible so this must be a row UDF — it only boxes
    # already-computed indices, the hashing above stayed JVM-side)
    from pyspark.ml.linalg import SparseVector, VectorUDT

    to_sparse = F.udf(
        lambda xs: SparseVector(n_dim, sorted(int(x) for x in xs), [1.0] * len(xs)),
        VectorUDT(),
    )

    feat = feat.select(id_col, to_sparse("__idx").alias("__features"))
    model = MinHashLSH(
        inputCol="__features", outputCol="__hashes",
        numHashTables=num_hash_tables, seed=seed,
    ).fit(feat)
    joined = model.approxSimilarityJoin(
        feat, feat, jaccard_distance_threshold, distCol="jaccard_dist"
    )
    return (
        joined.select(
            F.col(f"datasetA.{id_col}").alias("id_a"),
            F.col(f"datasetB.{id_col}").alias("id_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
        .filter(F.col("id_a") < F.col("id_b"))
    )
