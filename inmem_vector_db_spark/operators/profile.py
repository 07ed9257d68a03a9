"""One-pass table profiling: the data-QA step that gates a corpus
before training jobs read it (null rates, cardinalities, value ranges
per column).

The whole profile is ONE aggregation over the table — every per-column
statistic is a column of the same agg, so the table is scanned once —
followed by a driver-free ``stack`` unpivot to long form. Min/max are
serialized engine-portably (numerics via DECIMAL(18,2), temporal via
ISO strings) so a DuckDB oracle reproduces the profile verbatim.

The exact ``count_distinct`` per column costs one Expand pass per
column at scale; for 100 TB profiling swap it for the KMV sketch
(``functions.sketches.kmv_estimate``) per column — same long-form
output, fixed-size state. The exact form is what sits under the value
oracle here.
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
    for ``cols`` — one scan, one agg."""
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        s = _portable_str(c, dtypes[c])
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"__nn_{c}"),
            F.count_distinct(F.col(c)).alias(f"__nd_{c}"),
            F.min(s).alias(f"__mn_{c}"),
            F.max(s).alias(f"__mx_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nn_{c}, __nd_{c}, __mn_{c}, __mx_{c}" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_s, max_s)"
        )
    )
