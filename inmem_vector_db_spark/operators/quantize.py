"""Scalar quantization for embedding columns (beyond-reference, the
memory/IO lever for similarity search at 100 TB).

float32 embeddings dominate storage and shuffle width.  Per-vector
symmetric int8 quantization (``v_q[i] = round(v[i] / scale)``, ``scale =
max|v| / 127``) shrinks the column ~4x with ~1e-2 relative distance
error — more than enough for a candidate-generation stage that exact
re-ranks on the float column (same pattern as LSH: cheap candidates,
exact verify).

Everything is Column expressions (transform/aggregate) — quantized
vectors are `array<tinyint>` + one float scale, readable by any engine.

Pipeline shape at scale:
  1. ingest writes (embedding float32[], emb_q int8[], emb_scale float);
  2. candidate search scans ONLY (id, emb_q, emb_scale) — 4x less IO;
  3. top-(k*oversample) candidates re-rank exactly on the float column
     via a self-join on id (partition-pruned, tiny row set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.knn import knn


def with_quantized(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "emb"
) -> DataFrame:
    """Append ``{prefix}_q array<tinyint>`` and ``{prefix}_scale float``.

    Zero vectors get scale 1.0 (all-zero codes) so dequantization is
    always well-defined.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(v, F.lit(0.0), lambda s, x: F.greatest(s, F.abs(x)))
    scale = F.when(amax == 0.0, F.lit(1.0)).otherwise(amax / F.lit(127.0))
    q = F.transform(v, lambda x: F.round(x / scale).cast("tinyint"))
    return df.withColumn(f"{prefix}_q", q).withColumn(
        f"{prefix}_scale", scale.cast("float")
    )


def dequantize(q_col, scale_col) -> F.Column:
    """array<tinyint> + scale -> array<double> approximation."""
    s = F.col(scale_col) if isinstance(scale_col, str) else scale_col
    qc = F.col(q_col) if isinstance(q_col, str) else q_col
    return F.transform(qc, lambda x: x.cast("double") * s)


def knn_quantized_rerank(
    corpus_q: DataFrame,
    query_vec,
    k: int = 10,
    oversample: int = 4,
    metric: str = "euclidean",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_col: str = "emb_q",
    scale_col: str = "emb_scale",
) -> DataFrame:
    """Two-stage kNN: approximate top-(k*oversample) on the int8 column,
    exact re-rank of those candidates on the float column.

    ``corpus_q`` must carry both the quantized and the float columns
    (from ``with_quantized``).  At scale stage 1 reads 4x less data; the
    stage-2 exact scan touches only k*oversample rows.
    """
    approx = knn(
        corpus_q.select(
            id_col, dequantize(q_col, scale_col).alias("__deq")
        ),
        query_vec,
        k=k * oversample,
        metric=metric,
        id_col=id_col,
        vec_col="__deq",
    ).select(id_col)
    # the candidate set is k*oversample ids BY CONSTRUCTION — small at
    # any corpus scale — so collect it and push an IN filter into the
    # stage-2 scan (parquet row-group skipping on id) instead of paying
    # a broadcast-exchange stage for a join against a tiny list
    cand_ids = [r[0] for r in approx.collect()]
    pruned = corpus_q.filter(F.col(id_col).isin(cand_ids)).select(id_col, vec_col)
    return knn(pruned, query_vec, k=k, metric=metric, id_col=id_col, vec_col=vec_col)
