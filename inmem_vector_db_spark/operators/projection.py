"""Johnson-Lindenstrauss random projection over embedding columns.

Beyond-reference capability (the reference engine searches
full-dimension vectors only — ``app/core/indexers/*`` brute-force and
LSH both consume the raw embedding): project d-dim embeddings to a much
smaller k-dim space with a deterministic md5-derived integer plane
matrix, then run exact kNN in the projected space.  At 100 TB this is
the classic read-volume lever: a 64->16 projection cuts the bytes every
downstream distance scan touches 4x, and because the projection is a
linear map computed row-local in one Arrow-batched ``mapInArrow``
pass, it costs one narrow stage with NO shuffle — the projected table
can be written once (same artifact pattern as the IVF/LSH indexes) and
every downstream consumer scans the narrow form.

Exactness contract (what makes the whole pipeline
value-hash-oracle-checkable in DuckDB):

- embeddings are quantized to integers ``floor(x * 1000)`` — the same
  IEEE-identical floor-before-cast trick as ``operators/kmeans.py``;
- the plane matrix IS integers in [-1000, 1000], derived from
  ``md5("rpplane|j|d")`` exactly like ``operators/lsh.py::md5_planes``
  derives its float planes (JL only needs zero-mean bounded i.i.d.
  entries — Achlioptas 2001 shows even {-1,0,1} works — so integer
  uniforms lose nothing);
- projected coordinates and squared L2 distances are exact int64 sums:
  |coord| <= 64 * 500 * 1000 = 3.2e7, |d2| <= 16 * (6.4e7)^2 ~ 6.6e16,
  both far inside int64, so numpy GEMM Spark-side equals left-to-right
  ``list_sum`` DuckDB-side bit-for-bit with no float summation order
  anywhere.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.arrowmat import flat_matrix, int_list_array


def jl_plane_ints(out_dim: int, in_dim: int, salt: str = "rpplane") -> np.ndarray:
    """(out_dim x in_dim) int64 matrix, entry (j, d) uniform on
    [-1000, 1000] from ``md5(f"{salt}|{j}|{d}")`` — reproducible by any
    engine with md5, and embeddable as literal lists in oracle SQL."""
    out = np.empty((out_dim, in_dim), dtype=np.int64)
    for j in range(out_dim):
        for d in range(in_dim):
            h = int(
                hashlib.md5(f"{salt}|{j}|{d}".encode()).hexdigest()[:15], 16
            )
            out[j, d] = h % 2001 - 1000
    return out


def project_embeddings_int(
    df: DataFrame,
    out_dim: int,
    in_dim: int,
    col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1000,
    keep_quantized: bool = False,
) -> DataFrame:
    """(id, proj array<bigint>): proj[j] = sum_d floor(x_d*scale) * P[j][d].

    Row-local integer GEMM in one Arrow batch pass — no shuffle, and the
    int64 arithmetic is order-exact, so the result is independent of
    batch/partition layout by construction (not just by luck).

    ``keep_quantized=True`` also emits the floor-quantized input vector
    as ``v array<bigint>`` — consumers that need both (e.g. the
    distortion eval comparing projected vs full-space distances) get
    them from the SAME pass instead of a corpus self-join."""
    import pyarrow as pa

    P = jl_plane_ints(out_dim, in_dim)

    def part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            if rb.num_rows == 0:
                continue
            names = rb.schema.names
            M = flat_matrix(rb, col, expected_dim=in_dim)
            Mi = np.floor(M * scale).astype(np.int64)
            proj = Mi @ P.T
            cols = [rb.column(names.index(id_col)), int_list_array(proj)]
            names_out = [id_col, "proj"]
            if keep_quantized:
                cols.append(int_list_array(Mi))
                names_out.append("v")
            yield pa.RecordBatch.from_arrays(cols, names=names_out)

    schema = f"{id_col} bigint, proj array<bigint>"
    if keep_quantized:
        schema += ", v array<bigint>"
    return df.select(id_col, col).mapInArrow(part, schema=schema)


def projected_topk(
    proj: DataFrame,
    query_proj: dict[int, np.ndarray],
    k: int,
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k per query in the projected space by integer squared
    L2, ties broken by id — (query_id, vec_id, d2).

    Scale shape: stage 1 is a map-side partial top-k (each Arrow batch
    emits at most Q*k survivors — same pruning idea as the exact kNN
    path's TakeOrderedAndProject), stage 2 ranks the bounded survivor
    set; the full corpus is never shuffled.  ``query_proj`` is a small
    bounded dict (the Q collected query rows), broadcast via closure."""
    import pyarrow as pa

    qids = np.array(sorted(query_proj), dtype=np.int64)
    Q = np.stack([query_proj[q] for q in qids]).astype(np.int64)
    qdim = Q.shape[1]

    def part(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            n = rb.num_rows
            if n == 0:
                continue
            names = rb.schema.names
            Mp = flat_matrix(
                rb, "proj", expected_dim=qdim, dtype=np.int64,
                what="projected",
            )
            ids = np.asarray(rb.column(names.index(id_col)))
            out_q, out_v, out_d = [], [], []
            for qi, qid in enumerate(qids):
                diff = Mp - Q[qi]
                d2 = np.einsum("ij,ij->i", diff, diff)
                take = min(k, len(ids))
                # lexicographic (d2, id) partial selection
                order = np.lexsort((ids, d2))[:take]
                out_q.extend([qid] * take)
                out_v.extend(ids[order])
                out_d.extend(d2[order])
            yield pa.record_batch(
                {
                    "query_id": np.asarray(out_q, dtype=np.int64),
                    id_col: np.asarray(out_v, dtype=np.int64),
                    "d2": np.asarray(out_d, dtype=np.int64),
                }
            )

    survivors = proj.mapInArrow(
        part, schema=f"query_id bigint, {id_col} bigint, d2 bigint"
    )
    w = Window.partitionBy("query_id").orderBy("d2", id_col)
    return (
        survivors.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


def projection_oracle_ctes(
    out_dim: int, in_dim: int, scale: int = 1000, table: str = "embeddings"
) -> str:
    """DuckDB CTE text replaying ``project_embeddings_int`` exactly:
    ``pr(vec_id, p)`` with p[j] (1-based j) equal to Spark's proj[j-1].
    Plane integers are embedded as literals, so the oracle needs no md5
    at query time and the replay is pure integer arithmetic."""
    P = jl_plane_ints(out_dim, in_dim)
    coords = ",\n         ".join(
        "CAST(list_sum(list_transform(range(1, {n}), d -> v[d] * "
        "(CAST([{plane}] AS BIGINT[]))[d])) AS BIGINT)".format(
            n=in_dim + 1, plane=", ".join(str(x) for x in P[j])
        )
        for j in range(out_dim)
    )
    return f"""ei AS (
  SELECT vec_id,
         list_transform(embedding,
                        x -> CAST(floor(CAST(x AS DOUBLE) * {scale}) AS BIGINT)) AS v
  FROM {table}
),
pr AS (
  SELECT vec_id, [{coords}] AS p FROM ei
)"""
