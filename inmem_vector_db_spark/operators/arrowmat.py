"""Shared flat-buffer ingestion for Arrow-batched vector stages.

Every ``mapInArrow`` vector kernel needs the same prologue: take a
RecordBatch's ListArray column, reject NULL rows/elements and ragged
dimensions LOUDLY, and reshape the flat values buffer into an (N, D)
numpy matrix without materializing per-row cells (the per-row
``np.stack`` this replaces was the suite's worst scaling cost —
BASELINE.md round 9).  One implementation so the guards can't drift
between call sites (knn, quantize, ann, pq, projection, kmeans,
vectorstats, lsh) — ``tests/test_arrow_guards.py`` pins the failure
contracts per consumer.

The NULL message deliberately contains both "NULL" and "dimension
mismatch": the kNN family's documented failure contract is the
dimension-mismatch phrasing (a NULL embedding has no dimension), while
other stages' contracts key on "NULL".
"""

from __future__ import annotations

import numpy as np


def flat_matrix(
    rb,
    col_name: str,
    expected_dim: int | None = None,
    dtype=np.float64,
    what: str = "embedding",
) -> np.ndarray:
    """(N, D) matrix from ``rb``'s ListArray column ``col_name``.

    ``expected_dim``: enforce this dimension (pass it whenever the
    caller knows it — without it a batch only proves internal
    consistency, its first row setting D).  ``dtype``: conversion uses
    ``copy=False``, so an already-``dtype`` Arrow buffer reshapes with
    zero copies.  Raises ``ValueError`` on NULL rows, NULL elements,
    or dimension mismatch; never reshapes garbage.
    """
    col = rb.column(rb.schema.names.index(col_name))
    offs = np.asarray(col.offsets)
    # element nulls are counted within the batch's logical window:
    # ``col.values`` is the UNSLICED child array, so a whole-array
    # null_count would flag nulls lying outside a sliced batch's
    # offsets range (advisor r9); ``col.null_count`` itself is
    # slice-aware
    elem_nulls = (
        col.values.slice(int(offs[0]), int(offs[-1] - offs[0])).null_count
        if len(offs)
        else 0
    )
    if col.null_count or elem_nulls:
        raise ValueError(
            f"{what} dimension mismatch: NULL {col_name} in batch"
        )
    lens = np.diff(offs)
    d = expected_dim
    if d is None:
        d = int(lens[0]) if len(lens) else 0
    if not (lens == d).all():
        raise ValueError(
            f"{what} dimension mismatch: expected {d}, batch dims="
            f"{sorted(set(lens.tolist()))} over {rb.num_rows} rows"
        )
    flat = np.asarray(col.values)[offs[0]: offs[-1]]
    return flat.astype(dtype, copy=False).reshape(rb.num_rows, d)


def int_list_array(mat: np.ndarray):
    """Arrow ``list`` column from an (N, D) matrix: one flat values
    buffer + an arithmetic offsets vector — the vectorized inverse of
    ``flat_matrix`` for list-typed stage outputs."""
    import pyarrow as pa

    n, d = mat.shape
    offsets = pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32))
    return pa.ListArray.from_arrays(offsets, pa.array(mat.reshape(-1)))
