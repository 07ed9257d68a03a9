"""Fuzzy string self-join: all pairs within a levenshtein threshold,
without the O(N^2) cross join.

PassJoin-style segment filter (Li, Deng & Feng, ICDE 2011 — public
algorithm): split every string into ``d+1`` contiguous segments.  If
``lev(u, v) <= d``, an optimal edit script has at most ``d`` edits, so
by pigeonhole at least one of u's ``d+1`` segments is untouched — it
appears verbatim in v, shifted by at most ``d`` positions (the net
insert/delete count before it).  Therefore an equi-join of u's
segments against ALL substrings of v (of the matching lengths, within
a ±d start-position window) is a LOSSLESS candidate generator, and an
exact ``levenshtein`` verify finishes the job.

Spark shape: two expression-only exploded projections (segments and
windows — ~``(d+1) + len·|lens|`` rows per string, a constant factor,
never N^2), one equi-join ON SEGMENT CONTENT (selective keys, plain
shuffle, AQE-skew-splittable), distinct on the pair, then a verify
join back to the strings.  The DuckDB oracle for the query entry is
the NAIVE all-pairs filter — a value-hash match against it proves the
blocking lossless, not just plausible.

Strings shorter than ``d+1`` characters can have empty segments, so
they take a separate brute-force leg against the (by the length
filter, length <= 2d) short strings — a bounded set joined on a
length-bucket key, never a full cross join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def fuzzy_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 2,
) -> DataFrame:
    """All unordered pairs ``(id_a, id_b, dist)`` with
    ``levenshtein <= max_dist`` (exact — blocking is lossless).

    ``id_a < id_b``; ties in content still produce one row per id pair.
    """
    if max_dist < 0:
        raise ValueError("max_dist must be >= 0")
    d = int(max_dist)
    nseg = d + 1

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(str_col).alias("s"),
        F.length(str_col).alias("n"),
    )
    long_s = base.where(F.col("n") >= nseg)

    # segments: i-th of d+1 even chunks (first n%nseg chunks one longer)
    seg = (
        long_s.select(
            "id",
            "s",
            "n",
            F.explode(F.sequence(F.lit(0), F.lit(d))).alias("i"),
        )
        .withColumn(
            "seg_len",
            (F.col("n") / nseg).cast("int")
            + (F.col("i") < F.col("n") % nseg).cast("int"),
        )
        .withColumn(
            "seg_start",
            (F.col("n") / nseg).cast("int") * F.col("i")
            + F.least(F.col("i"), F.col("n") % nseg),
        )
        .select(
            F.col("id").alias("id_u"),
            F.col("n").alias("n_u"),
            F.expr("substring(s, seg_start + 1, seg_len)").alias("chunk"),
            "seg_start",
            "seg_len",
        )
        .where(F.col("seg_len") >= 1)
    )

    # windows: every substring whose length any peer's segment can have
    # (peer length within ±d → segment lengths floor((n-d)/nseg) ..
    # ceil((n+d)/nseg)), at every start offset
    win = (
        long_s.select(
            "id",
            "s",
            "n",
            F.explode(
                F.sequence(
                    F.greatest(
                        F.lit(1), F.floor((F.col("n") - d) / nseg).cast("int")
                    ),
                    F.ceil((F.col("n") + d) / nseg).cast("int"),
                )
            ).alias("w_len"),
        )
        .where(F.col("w_len") <= F.col("n"))
        .select(
            "id",
            "s",
            "n",
            "w_len",
            F.explode(
                F.sequence(F.lit(0), F.col("n") - F.col("w_len"))
            ).alias("w_start"),
        )
        .select(
            F.col("id").alias("id_v"),
            F.col("n").alias("n_v"),
            F.expr("substring(s, w_start + 1, w_len)").alias("chunk"),
            "w_start",
        )
    )

    cand_long = (
        seg.join(
            win,
            (seg.chunk == win.chunk)
            & (seg.id_u != win.id_v)
            & (F.abs(seg.n_u - win.n_v) <= d)
            & (F.abs(seg.seg_start - win.w_start) <= d),
        )
        .select(
            F.least("id_u", "id_v").alias("id_a"),
            F.greatest("id_u", "id_v").alias("id_b"),
        )
        .distinct()
    )

    # short-string leg: |u| < d+1 ⇒ any match has length <= |u|+d <= 2d.
    # Equi-join on EXACT candidate length (u explodes its ±d length
    # window) — a hash join on a tiny-domain key, not a nested loop.
    short_s = base.where(F.col("n") < nseg)
    near_short = base.where(F.col("n") <= 2 * d)
    cand_short = (
        short_s.select(
            F.col("id").alias("id_u"),
            F.explode(
                F.sequence(
                    F.greatest(F.lit(0), F.col("n") - d), F.col("n") + d
                )
            ).alias("nk"),
        )
        .join(
            near_short.select(
                F.col("id").alias("id_v"), F.col("n").alias("nk")
            ),
            "nk",
        )
        .where(F.col("id_u") != F.col("id_v"))
        .select(
            F.least("id_u", "id_v").alias("id_a"),
            F.greatest("id_u", "id_v").alias("id_b"),
        )
        .distinct()
    )

    cand = cand_long.unionByName(cand_short).distinct()

    sa = base.select(F.col("id").alias("id_a"), F.col("s").alias("s_a"))
    sb = base.select(F.col("id").alias("id_b"), F.col("s").alias("s_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b"))
        .where(F.col("dist") <= d)
        .select("id_a", "id_b", "dist")
    )
