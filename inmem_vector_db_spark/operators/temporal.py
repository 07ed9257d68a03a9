"""Temporal joins: as-of (point-in-time) and bounded range joins.

Absent in the reference (SURVEY.md 2.3: "range/as-of/interval joins:
absent") and in Spark's built-in join menu — but a training-data /
time-series engine needs them constantly (latest-state enrichment,
attribution windows).  Both are implemented as **single-shuffle
equi-join shapes**, never as inequality joins, because Catalyst plans a
bare ``l.ts >= r.ts`` theta join as BroadcastNestedLoop / cartesian —
O(|L|·|R|) and fatal at 100 TB.

* ``asof_join`` — the union-tag trick: append tagged left+right rows,
  one window over (key) ordered by (ts, side) carries the latest right
  payload forward with ``last(..., ignorenulls=True)``.  Exactly one
  shuffle on the key (the window), zero joins, no per-key loops; skewed
  keys are handled by AQE the same way any window is.

* ``range_join`` — time bucketing: left rows explode to the few
  fixed-width buckets their [lower, upper] window covers, right rows
  land in their own bucket, and the pair condition becomes an equi-join
  on (key, bucket) + an exact residual filter.  Fan-out is
  ceil(window/width)+1 ≈ 2 rows, turning the theta join into a shuffle
  hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: tuple[str, ...] = (),
    tolerance_seconds: float | None = None,
    how: str = "left",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row of the same
    ``on`` key with ``right_ts <= left_ts`` (``direction="backward"``,
    the default — ties at equal ts match, like DuckDB/pandas ``ASOF``),
    or the EARLIEST right row with ``right_ts >= left_ts``
    (``direction="forward"`` — next-event semantics).  The forward form
    is the same union-tag + window plan with the time ordering
    reversed: still one Exchange, no join node, no nested loop.

    ``right_payload`` columns are carried from the matched right row as
    ``asof_<name>``; the matched timestamp is ``asof_ts``.
    ``tolerance_seconds`` drops matches older than the bound.
    ``how='inner'`` keeps only matched left rows.

    Right rows must be unique per (key, ts) — pre-aggregate otherwise
    (a nondeterministic tie would poison oracle checks and reruns).
    """
    payload = list(right_payload)
    l_tag = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_tag = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias(_SIDE),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in payload],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in ("__r_ts", *[f"__r_{c}" for c in payload]):
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None).cast(dict(r_tag.dtypes)[c]))
    both = l_tag.select(r_tag.columns).unionByName(r_tag)

    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # right rows sort before left rows at equal ts (side 0 < 1), so an
    # equal-timestamp right row is visible to the left row — ASOF `>=`.
    # forward: descending time order makes "preceding" mean "later",
    # so last(...) carries the EARLIEST right row at-or-after left ts.
    ts_order = F.col("__ts").desc() if direction == "forward" else F.col("__ts").asc()
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, _SIDE)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [
        F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}") for c in payload
    ]
    out = both.select(
        "*", F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"), *carried
    ).filter(F.col(_SIDE) == 1)

    if tolerance_seconds is not None:
        # timestamp -> double keeps sub-second precision (unix_timestamp
        # truncates to whole seconds)
        gap = (
            F.col("asof_ts").cast("double") - F.col("__ts").cast("double")
            if direction == "forward"
            else F.col("__ts").cast("double") - F.col("asof_ts").cast("double")
        )
        in_tol = F.col("asof_ts").isNotNull() & (
            gap <= F.lit(float(tolerance_seconds))
        )
        stale = [F.when(in_tol, F.col(f"asof_{c}")).alias(f"asof_{c}") for c in payload]
        out = out.select(
            *[c for c in out.columns if c != "asof_ts" and not c.startswith("asof_")],
            F.when(in_tol, F.col("asof_ts")).alias("asof_ts"),
            *stale,
        )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    drop = [_SIDE, "__ts", "__r_ts", *[f"__r_{c}" for c in payload]]
    return out.drop(*drop)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_seconds: float = 0.0,
    upper_seconds: float = 900.0,
) -> DataFrame:
    """All (left, right) pairs with the same key where
    ``left_ts + lower <= right_ts <= left_ts + upper``.

    Bucketed equi-join: bucket width = the window span, left explodes to
    the covering buckets (≈2), right stays single-bucket — so the plan
    is exchange(key, bucket) + hash join + residual filter, NOT a
    nested-loop theta join.  Columns from the right side come back
    prefixed ``r_``.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("upper_seconds must be > lower_seconds")
    width = int(max(1.0, upper_seconds - lower_seconds))
    l_ep = F.col(left_ts).cast("double")
    r_ep = F.col(right_ts).cast("double")

    lo = l_ep + F.lit(float(lower_seconds))
    hi = l_ep + F.lit(float(upper_seconds))
    l_b = left.withColumn("__lo", lo).withColumn("__hi", hi).withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col("__lo") / width), F.floor(F.col("__hi") / width)
            )
        ),
    )
    r_b = right.select(
        F.col(on).alias("__r_on"),
        F.floor(r_ep.cast("double") / width).alias("__bucket"),
        r_ep.alias("__r_ep"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c != on],
    )
    joined = l_b.join(
        r_b,
        (F.col(on) == F.col("__r_on")) & (l_b["__bucket"] == r_b["__bucket"]),
    ).filter((F.col("__r_ep") >= F.col("__lo")) & (F.col("__r_ep") <= F.col("__hi")))
    return joined.drop("__lo", "__hi", "__bucket", "__r_on", "__r_ep")
