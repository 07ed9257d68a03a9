"""Batch MERGE (upsert) operators for incremental corpus maintenance.

A training-data corpus is not static: each crawl round delivers a batch
of documents that must be folded into the existing table — update docs
whose content changed, insert new ones, optionally tombstone deletions,
and leave the (vast) unchanged remainder untouched. On a real cluster
this is Delta/Iceberg ``MERGE INTO``; the logical plan underneath is a
single full-outer equi-join on the key, which is exactly what these
helpers build — one shuffle on the merge key, no driver-side state,
broadcast-eligible when the batch is small (the common case: a crawl
batch is orders of magnitude smaller than the corpus, so Catalyst
broadcasts it and the corpus-side scan never shuffles at all).

``merge_upsert``  — SCD type 1: last write wins, plus per-row action
                    tagging (insert/update/unchanged/delete).
``merge_scd2``    — SCD type 2: keep history; close the current version
                    of changed keys and append the new version.

The reference engine's closest analogue is chunk update/delete
(`app/services/chunk_service.py:143-217` — row-at-a-time dict
mutation); here the same semantics are a set-based join so one merge
handles a billion-row batch.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    delete_col: str | None = None,
    tag_col: str | None = None,
    small_source: bool = True,
) -> DataFrame:
    """SCD1 merge of ``source`` into ``target`` on ``key``.

    - key in both and any ``compare_cols`` differ -> source row (update)
    - key in both, no difference                  -> target row (unchanged)
    - key only in source                          -> source row (insert)
    - key only in target                          -> target row (kept)
    - ``delete_col`` (boolean on source) true     -> row dropped (delete)

    ``compare_cols`` defaults to every non-key column shared by both
    sides. With ``tag_col`` set, the result carries the per-row action
    string — the audit trail a MERGE job would log. Compares are
    null-safe (``eqNullSafe``).

    Two physical shapes — this matters more than the semantics at scale:

    ``small_source=True`` (default; a crawl batch is orders of magnitude
    smaller than the corpus): Spark cannot broadcast a FULL OUTER join,
    so instead the merge is three joins that each broadcast the small
    side — matched rows (inner), kept rows (left_anti), and inserts
    (source anti-join against the matched keys, which are ≤ |source| so
    also broadcastable). The corpus is scanned once per branch with ZERO
    shuffles of corpus data; this is the same plan family Delta's MERGE
    INTO uses for small-batch upserts.

    ``small_source=False`` (comparable-sized sides): one full-outer
    sort-merge join — a single shuffle of both sides on ``key``.
    """
    data_cols = [c for c in target.columns if c not in key]
    if compare_cols is None:
        compare_cols = [
            c
            for c in data_cols
            if c in source.columns and c != delete_col
        ]

    def changed_expr() -> object:
        c = F.lit(False)
        for col in compare_cols:
            c = c | ~F.col(f"t.{col}").eqNullSafe(F.col(f"s.{col}"))
        return c

    def del_expr() -> object:
        if delete_col is None:
            return F.lit(False)
        return F.coalesce(F.col(f"s.{delete_col}"), F.lit(False))

    keyl = list(key)
    if small_source:
        t = target.alias("t")
        s = F.broadcast(source).alias("s")
        matched = t.join(s, keyl, "inner")
        changed, deleting = changed_expr(), del_expr()
        take_source = ~deleting & changed
        matched_out = matched.where(~deleting).select(
            *[F.col(k) for k in keyl],
            *[
                F.when(take_source, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in data_cols
            ],
            F.when(changed, F.lit("update"))
            .otherwise(F.lit("unchanged"))
            .alias("_action"),
        )
        kept = target.join(
            F.broadcast(source.select(*keyl)), keyl, "left_anti"
        ).select(
            *[F.col(k) for k in keyl],
            *[F.col(c) for c in data_cols],
            F.lit("kept").alias("_action"),
        )
        # keys touched by the batch that exist in the target — tiny
        matched_keys = matched.select(*keyl)
        ins_src = source
        if delete_col is not None:
            ins_src = ins_src.where(
                ~F.coalesce(F.col(delete_col), F.lit(False))
            )
        inserts = ins_src.join(
            F.broadcast(matched_keys), keyl, "left_anti"
        ).select(
            *[F.col(k) for k in keyl],
            *[
                (
                    F.col(c)
                    if c in source.columns
                    else F.lit(None).cast(dict(target.dtypes)[c])
                ).alias(c)
                for c in data_cols
            ],
            F.lit("insert").alias("_action"),
        )
        out = kept.unionByName(matched_out).unionByName(inserts)
    else:
        # explicit presence markers: never-null on their own side, so
        # nullable data columns cannot be mistaken for "row absent"
        t = target.withColumn("_t_exists", F.lit(True)).alias("t")
        s = source.withColumn("_s_exists", F.lit(True)).alias("s")
        joined = t.join(s, keyl, "full_outer")
        exists_t = F.col("t._t_exists").isNotNull()
        exists_s = F.col("s._s_exists").isNotNull()
        changed = changed_expr()
        deleting = exists_s & del_expr()
        action = (
            F.when(deleting, F.lit("delete"))
            .when(exists_s & ~exists_t, F.lit("insert"))
            .when(exists_s & exists_t & changed, F.lit("update"))
            .when(exists_s & exists_t, F.lit("unchanged"))
            .otherwise(F.lit("kept"))
        )
        take_source = exists_s & ~deleting & (~exists_t | changed)
        out = joined.where(~deleting).select(
            *[F.col(k) for k in keyl],
            *[
                F.when(take_source, F.col(f"s.{c}"))
                .otherwise(F.col(f"t.{c}"))
                .alias(c)
                for c in data_cols
            ],
            action.alias("_action"),
        )
    if tag_col:
        return out.withColumnRenamed("_action", tag_col)
    return out.drop("_action")


def merge_scd2(
    target: DataFrame,
    source: DataFrame,
    key: Sequence[str],
    batch_id: int,
    compare_cols: Sequence[str] | None = None,
    version_col: str = "version",
    current_col: str = "is_current",
    from_col: str = "valid_from_batch",
    to_col: str = "valid_to_batch",
) -> DataFrame:
    """SCD2 merge: never overwrite — close the current version of
    changed/new keys and append a new version row.

    ``target`` carries the four bookkeeping columns; pass an empty or
    seeded history (see ``scd2_seed``). Same single-shuffle shape as
    ``merge_upsert``: current rows full-outer-join the batch; history
    (non-current) rows pass through untouched (no shuffle — they are
    unioned around the join).
    """
    data_cols = [
        c
        for c in target.columns
        if c not in key
        and c not in (version_col, current_col, from_col, to_col)
    ]
    if compare_cols is None:
        compare_cols = [c for c in data_cols if c in source.columns]

    history = target.where(~F.col(current_col))
    current = target.where(F.col(current_col))
    t = current.alias("t")
    s = source.withColumn("_s_exists", F.lit(True)).alias("s")
    joined = t.join(s, list(key), "full_outer")

    exists_t = F.col(f"t.{version_col}").isNotNull()
    exists_s = F.col("s._s_exists").isNotNull()
    changed = F.lit(False)
    for c in compare_cols:
        changed = changed | ~F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
    supersede = exists_s & exists_t & changed

    carried = joined.where(exists_t).select(
        *[F.col(k) for k in key],
        *[F.col(f"t.{c}").alias(c) for c in data_cols],
        F.col(f"t.{version_col}").alias(version_col),
        F.when(supersede, F.lit(False))
        .otherwise(F.lit(True))
        .alias(current_col),
        F.col(f"t.{from_col}").alias(from_col),
        F.when(supersede, F.lit(batch_id))
        .otherwise(F.col(f"t.{to_col}"))
        .alias(to_col),
    )
    fresh = joined.where(exists_s & (supersede | ~exists_t)).select(
        *[F.col(k) for k in key],
        *[F.col(f"s.{c}").alias(c) for c in data_cols],
        (F.coalesce(F.col(f"t.{version_col}"), F.lit(0)) + F.lit(1)).alias(
            version_col
        ),
        F.lit(True).alias(current_col),
        F.lit(batch_id).alias(from_col),
        F.lit(None).cast("long").alias(to_col),
    )
    return history.unionByName(carried).unionByName(fresh)


def scd2_seed(
    df: DataFrame,
    batch_id: int = 0,
    version_col: str = "version",
    current_col: str = "is_current",
    from_col: str = "valid_from_batch",
    to_col: str = "valid_to_batch",
) -> DataFrame:
    """Wrap a plain table as SCD2 version-1 history."""
    return df.select(
        "*",
        F.lit(1).cast("long").alias(version_col),
        F.lit(True).alias(current_col),
        F.lit(batch_id).cast("long").alias(from_col),
        F.lit(None).cast("long").alias(to_col),
    )


def merge_agg_states(
    old: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    spec: dict[str, str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: combine a stored
    per-key aggregate table with the aggregate of a NEW batch, without
    rescanning the base data — the pattern that turns "daily rollup
    over a year of events" from a 100 TB scan into a merge of two
    key-cardinality tables.

    ``spec`` maps each state column to its merge function:
    ``'sum'`` / ``'count'`` -> addition, ``'min'`` -> least,
    ``'max'`` -> greatest.  (avg = maintain sum+count and divide at
    read.)  These are exactly the aggregates whose states are
    commutative monoids — the same property Spark's own partial
    aggregation relies on, applied across batches instead of across
    partitions.

    Join shape mirrors ``merge_upsert``: Spark cannot broadcast a FULL
    OUTER join, so the merge is (matched inner) + (old-only anti) +
    (delta-only anti) with the DELTA side broadcast in each — zero
    shuffle of the stored aggregate table when the batch is small.
    """
    for col, how in spec.items():
        if how not in ("sum", "count", "min", "max"):
            raise ValueError(f"unsupported merge function {how!r} for {col!r}")
    keys = list(keys)
    state_cols = [c for c in old.columns if c not in keys]
    if set(state_cols) != set(spec):
        raise ValueError("spec must cover exactly the non-key state columns")

    d = F.broadcast(delta)
    combined = {
        col: (
            F.least(old[col], d[col])
            if how == "min"
            else F.greatest(old[col], d[col])
            if how == "max"
            else old[col] + d[col]
        ).alias(col)
        for col, how in spec.items()
    }
    matched = old.join(d, keys, "inner").select(
        *[old[k] for k in keys], *[combined[c] for c in state_cols]
    )
    old_only = old.join(d, keys, "left_anti")
    # delta-only needs old's key set on the build side; leave the
    # broadcast decision to Catalyst/AQE — for a huge rollup it becomes
    # a key-partitioned anti join, which is the right fallback
    delta_only = delta.join(old.select(*keys), keys, "left_anti")
    return matched.unionByName(old_only.select(matched.columns)).unionByName(
        delta_only.select(matched.columns)
    )
