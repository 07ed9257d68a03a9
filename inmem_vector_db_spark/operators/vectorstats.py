"""Distributed second-moment statistics over an embedding column.

The Gramian G = X^T X is the workhorse precursor for PCA, whitening,
and linear probes over a 100 TB embedding corpus: d x d numbers
summarize an arbitrarily large matrix, and the eigen-decomposition that
follows is a driver-side d x d problem (d ~ 10^2..10^3), not a cluster
problem. The scalable shape — the same one MLlib's RowMatrix
``computeGramianMatrix`` uses — is a per-partition GEMM followed by a
matrix-sum reduce:

  mapInArrow: each Arrow batch contributes X_b^T X_b (one BLAS call,
  float64) accumulated per partition -> upper-triangle (i, j, partial)
  cells -> groupBy(i, j).sum — the shuffle moves n_partitions * d(d+1)/2
  small rows, never the vectors themselves.

``covariance_from_gramian`` turns (G, mean, n) into the covariance
matrix with one more tiny agg; no second pass over the data.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
from pyspark.sql import DataFrame, functions as F

from inmem_vector_db_spark.operators.arrowmat import flat_matrix

_CELL_SCHEMA = "i INT, j INT, g DOUBLE"


def gramian(
    df: DataFrame, vec_col: str = "embedding", dim: int | None = None
) -> DataFrame:
    """Upper-triangle Gramian cells ``(i, j, g)`` (0-based, i <= j),
    g = sum over rows of x_i * x_j in float64.

    ``dim``: pass the expected dimension to make the ragged-corpus
    guard airtight — without it, each partition enforces internal
    consistency (its first row sets d), but two partitions of
    DIFFERENT uniform dims would each emit valid cells and the
    groupBy would silently sum mismatched triangles."""

    import pyarrow as pa

    def part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc: np.ndarray | None = None
        d = dim
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            x = flat_matrix(rb, vec_col, expected_dim=d)
            d = x.shape[1]
            g = x.T @ x
            acc = g if acc is None else acc + g
        if acc is not None:
            iu, ju = np.triu_indices(acc.shape[0])
            yield pa.record_batch(
                {
                    "i": iu.astype("int32"),
                    "j": ju.astype("int32"),
                    "g": acc[iu, ju],
                }
            )

    return (
        df.select(vec_col)
        .mapInArrow(part, _CELL_SCHEMA)
        .groupBy("i", "j")
        .agg(F.sum("g").alias("g"))
    )


def power_iteration(cells, d: int, iters: int = 12) -> np.ndarray:
    """Dominant eigenvector of a Gramian given its upper-triangle cells
    ``(i, j, g)`` — the driver-side half of distributed PCA.

    Deterministic: fixed uniform init, fixed iteration count, L2
    renormalization each step.  The corpus-size-independent d x d
    problem stays on the driver; only the d-vector goes back out (as a
    broadcast literal) for the projection pass.
    """
    g = np.zeros((d, d), dtype=np.float64)
    for i, j, v in cells:
        g[i, j] = v
        g[j, i] = v
    x = np.ones(d, dtype=np.float64) / np.sqrt(d)
    for _ in range(iters):
        y = g @ x
        x = y / np.linalg.norm(y)
    return x


def project(df: DataFrame, v: np.ndarray, vec_col: str = "embedding"):
    """Projection of ``vec_col`` onto the literal direction ``v`` as a
    Column — a pure zip_with/aggregate expression (whole-stage codegen,
    no UDF, no shuffle)."""
    lit_v = F.array(*[F.lit(float(x)) for x in v])
    return F.aggregate(
        F.zip_with(F.col(vec_col), lit_v, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def column_means(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension mean as ``(i, mean)`` — posexplode + agg, one pass."""
    return (
        df.select(F.posexplode(vec_col).alias("i", "v"))
        .groupBy("i")
        .agg(F.avg(F.col("v").cast("double")).alias("mean"))
    )


def covariance_from_gramian(
    gram: DataFrame, means: DataFrame, n: int
) -> DataFrame:
    """cov_ij = G_ij / n - mean_i * mean_j (population covariance),
    assembled by broadcasting the d-row means table onto the d^2 cells."""
    mi = means.select(F.col("i"), F.col("mean").alias("mean_i"))
    mj = means.select(
        F.col("i").alias("j"), F.col("mean").alias("mean_j")
    )
    return (
        gram.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (F.col("g") / F.lit(float(n))
             - F.col("mean_i") * F.col("mean_j")).alias("cov"),
        )
    )
