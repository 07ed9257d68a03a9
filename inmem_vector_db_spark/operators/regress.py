"""Distributed ridge regression via normal equations — the one-pass
GLM trainer shape for 100 TB corpora, exactly replayable in DuckDB.

``operators.kmeans`` established the exact-integer trainer pattern:
quantize inputs, aggregate int64 partials, derive floats once at the
end.  This module applies the same discipline to linear models:

* **Features and target are floor-quantized to int64** before any
  aggregation, so every moment sum (``n, Σx1, Σx1², Σx1x2, Σx1y,
  ...``) is an EXACT integer — bit-identical under any partitioning,
  input order, or engine.  A float64 running sum of raw doubles would
  be none of those (the order-sensitivity class
  tests/test_oracle_order_robustness.py pins suite-wide).
* **One pass, d²-bounded state.**  The whole fit is a single keyless
  aggregate: 10 moment sums for the d=3 design (intercept + 2
  features).  Map-side partial aggregation means each partition ships
  ONE 9-int row to the final combine — the shuffle is
  ``O(partitions · d²)``, never ``O(rows)``.  This is exactly how
  linear/ridge models are trained at 100 TB: the normal-equation
  Gramian is an aggregatable sufficient statistic, so a 1000-executor
  scan reduces to a constant-size driver solve.
* **The solve is a fixed expression tree, not a library call.**  The
  3×3 system ``(XᵀX + λI')β = Xᵀy`` (λ on the slope diagonal only —
  the intercept is never regularized) is solved by Cramer's rule with
  the determinant formulas written ONCE as SQL text (`DET_EXPRS`) and
  evaluated by BOTH engines — Spark via ``F.expr`` and DuckDB by
  inlining the same strings into the oracle query.  Identical parse
  trees over identical exactly-representable int64-valued doubles
  give bit-identical IEEE754 results, so the trained coefficients are
  engine-portable without any tolerance.

Reference tie-in: the reference has no model trainer (its scope ends
at vector search); this is the beyond-reference training-pipeline
path, same role as `operators/kmeans.py` (SURVEY.md §2 LLM-pipeline
family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# The moment sums of the d=3 design matrix [1, x1, x2] against
# target y.  Inputs x1, x2, y must already be int64 columns (callers
# floor-quantize); Spark ANSI mode would throw on int64 overflow, so
# products are formed in BIGINT only where bounded (x·x of
# feature-scale ints), and every sum is an exact int64.
_MOMENTS = {
    "n": "count(*)",
    "s1": "sum(x1)",
    "s2": "sum(x2)",
    "s11": "sum(x1 * x1)",
    "s12": "sum(x1 * x2)",
    "s22": "sum(x2 * x2)",
    "sy": "sum(y)",
    "s1y": "sum(x1 * y)",
    "s2y": "sum(x2 * y)",
    "syy": "sum(y * y)",
}

# Cramer's-rule determinants for
#   A = [[n,  s1,      s2 ],          b = [sy,
#        [s1, s11 + λ, s12],               s1y,
#        [s2, s12,     s22 + λ]]           s2y]
# over the DOUBLE-cast sums (suffix ``d``).  The int64 moments are
# exact and order-invariant; both engines cast the SAME int64 to
# double (identical IEEE value even past 2^53) and evaluate THIS text,
# hence the same tree over the same operands → bit-identical results.
DET_EXPRS = {
    "det": (
        "nd * ((s11d + {lam}) * (s22d + {lam}) - s12d * s12d)"
        " - s1d * (s1d * (s22d + {lam}) - s12d * s2d)"
        " + s2d * (s1d * s12d - (s11d + {lam}) * s2d)"
    ),
    "det0": (
        "syd * ((s11d + {lam}) * (s22d + {lam}) - s12d * s12d)"
        " - s1d * (s1yd * (s22d + {lam}) - s12d * s2yd)"
        " + s2d * (s1yd * s12d - (s11d + {lam}) * s2yd)"
    ),
    "det1": (
        "nd * (s1yd * (s22d + {lam}) - s12d * s2yd)"
        " - syd * (s1d * (s22d + {lam}) - s12d * s2d)"
        " + s2d * (s1d * s2yd - s1yd * s2d)"
    ),
    "det2": (
        "nd * ((s11d + {lam}) * s2yd - s1yd * s12d)"
        " - s1d * (s1d * s2yd - s1yd * s2d)"
        " + syd * (s1d * s12d - (s11d + {lam}) * s2d)"
    ),
}

# betas ROUNDED once (6 dp) before any downstream use: scoring from
# the rounded values snaps both engines to the same double even in
# the (never observed) event of a last-ULP determinant divergence.
BETA_EXPRS = {
    "b0": "round(det0 / det, 6)",
    "b1": "round(det1 / det, 6)",
    "b2": "round(det2 / det, 6)",
}

# ŷ from the rounded betas; written once, parsed by both engines.
PREDICT_EXPR = "b0 + b1 * x1d + b2 * x2d"

# Training SSE purely from the sufficient statistics:
#   SSE = Σy² − 2βᵀXᵀy + βᵀ(XᵀX)β        (plain XᵀX — λ shrinks the
# fit but the error is measured against the data).  Because this needs
# NO second pass over the rows, a whole λ grid prices its models from
# the one scan that produced the moments.
SSE_EXPR = (
    "syyd - 2 * (b0 * syd + b1 * s1yd + b2 * s2yd)"
    " + (b0 * (b0 * nd + b1 * s1d + b2 * s2d)"
    " + b1 * (b0 * s1d + b1 * s11d + b2 * s12d)"
    " + b2 * (b0 * s2d + b1 * s12d + b2 * s22d))"
)
R2_EXPR = "round(1 - sse / (syyd - syd * syd / nd), 6)"


# public column order for persisted moment partials (online trainer)
MOMENT_COLS = list(_MOMENTS)


def combine_moments(partials: DataFrame) -> DataFrame:
    """Fold per-batch moment rows into the global moments.  Integer
    addition is associative and commutative, so ANY batching of the
    data — one pass, micro-batches, per-partition partials — produces
    the bit-identical fit; this is what makes the trainer incrementally
    maintainable (stream new rows, add their moments, re-solve in
    O(d³) on 10 integers — never re-scan history)."""
    return partials.groupBy().agg(
        *[F.sum(c).cast("long").alias(c) for c in MOMENT_COLS]
    )


def moment_sums(design: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
    """The exact int64 moment sums over a design frame with int64
    columns ``x1, x2, y`` — one row per ``keys`` group (keyless → one
    global row).  Either way the aggregate is fully map-side partial,
    so the shuffle carries one 10-int row per (partition, group): the
    grouped form fits N independent models — per tenant, per domain,
    per segment — for the cost of ONE pass and one key-shuffle."""
    aggs = [
        F.expr(expr).cast("long").alias(name) for name, expr in _MOMENTS.items()
    ]
    if keys:
        return design.groupBy(*keys).agg(*aggs)
    return design.agg(*aggs)


def _lam_text(lam) -> str:
    """λ as expression text: a float renders as a literal, a string is
    taken verbatim as a column reference (the λ-sweep path, where each
    row carries its own lam)."""
    return lam if isinstance(lam, str) else repr(float(lam))


def with_betas(sums: DataFrame, lam) -> DataFrame:
    """Attach the Cramer-rule coefficients to the moment frame:
    double-cast each sum, evaluate the shared determinant text, round
    the three betas once.  ``lam`` is a float or a column name."""
    out = sums
    for name in _MOMENTS:
        out = out.withColumn(f"{name}d", F.col(name).cast("double"))
    for name, tmpl in DET_EXPRS.items():
        out = out.withColumn(name, F.expr(tmpl.format(lam=_lam_text(lam))))
    for name, expr in BETA_EXPRS.items():
        out = out.withColumn(name, F.expr(expr))
    return out


def with_r2(fit: DataFrame) -> DataFrame:
    """Attach training SSE and R² — computed from the sufficient
    statistics already on the row, no second data pass."""
    return fit.withColumn("sse", F.expr(SSE_EXPR)).withColumn(
        "r2", F.expr(R2_EXPR)
    )


def lambda_sweep(sums: DataFrame, lams: list[float]) -> DataFrame:
    """Price a whole λ grid from ONE scan's moments: cross the 1-row
    moment frame with the λ list (a broadcast of len(lams) doubles),
    then solve + score every row.  N models for the cost of one
    aggregate — sufficient statistics amortize model search."""
    lam_rows = F.explode(
        F.array(*[F.lit(float(v)).cast("double") for v in lams])
    ).alias("lam")
    grid = sums.select("*", lam_rows)
    return with_r2(with_betas(grid, "lam"))


def ridge_fit(design: DataFrame, lam: float) -> DataFrame:
    """Full fit: 1 row with moments, determinants, and betas."""
    return with_betas(moment_sums(design), lam)


def score(design: DataFrame, fit: DataFrame, lam: float) -> DataFrame:
    """Broadcast the 1-row fit onto the design rows and predict.
    Adds ``yhat`` (double) plus exact residual quantizations:
    ``sq_err`` = floor((y − ŷ)²) and ``abs_err`` = floor(|y − ŷ|),
    both int64 so downstream error aggregates stay order-invariant.
    The join is a broadcast of ONE row — the scoring pass is
    shuffle-free and scales to any corpus size."""
    betas = F.broadcast(fit.select("b0", "b1", "b2"))
    return (
        design.crossJoin(betas)
        .withColumn("x1d", F.col("x1").cast("double"))
        .withColumn("x2d", F.col("x2").cast("double"))
        .withColumn("yhat", F.expr(PREDICT_EXPR))
        .withColumn("resid", F.col("y").cast("double") - F.col("yhat"))
        .withColumn("sq_err", F.floor(F.col("resid") * F.col("resid")).cast("long"))
        .withColumn("abs_err", F.floor(F.abs(F.col("resid"))).cast("long"))
    )


def moments_sql_select(base_sql: str, keys: tuple[str, ...] = ()) -> str:
    """The DuckDB mirror of ``moment_sums``: a CTE body computing the
    same sums (BIGINT-cast — DuckDB sum() returns HUGEINT, which the
    driver's pandas bridge renders float64) over ``base_sql``, which
    must yield BIGINT x1, x2, y (plus any ``keys``)."""
    cols = ",\n       ".join(
        f"CAST({expr} AS BIGINT) AS {name}" for name, expr in _MOMENTS.items()
    )
    if keys:
        klist = ", ".join(keys)
        return f"SELECT {klist},\n       {cols}\nFROM ({base_sql})\nGROUP BY {klist}"
    return f"SELECT {cols}\nFROM ({base_sql})"


def betas_sql_select(lam) -> str:
    """DuckDB mirror of ``with_betas`` over a CTE named ``sums``:
    double-cast the moments, evaluate the SAME determinant text, and
    round the betas — identical expression trees to the Spark side.
    ``lam`` is a float literal or a column name (λ-sweep: the ``sums``
    CTE must then already carry a ``lam`` column)."""
    dcols = ", ".join(f"CAST({n} AS DOUBLE) AS {n}d" for n in _MOMENTS)
    dets = ", ".join(
        f"{tmpl.format(lam=_lam_text(lam))} AS {name}"
        for name, tmpl in DET_EXPRS.items()
    )
    betas = ", ".join(f"{expr} AS {name}" for name, expr in BETA_EXPRS.items())
    return (
        f"dsums AS (SELECT *, {dcols} FROM sums),\n"
        f"dets AS (SELECT *, {dets} FROM dsums),\n"
        f"betas AS (SELECT *, {betas} FROM dets)"
    )


def r2_sql_select() -> str:
    """DuckDB mirror of ``with_r2`` over the ``betas`` CTE."""
    return (
        f"ssed AS (SELECT *, {SSE_EXPR} AS sse FROM betas),\n"
        f"fit AS (SELECT *, {R2_EXPR} AS r2 FROM ssed)"
    )


# --- general d: generated elimination text for m slope features ------
#
# The d=3 constants above are HANDWRITTEN; everything below GENERATES
# the same expression text for any m ≤ 4 slope features (matrix size
# m+1 ≤ 5) by first-row cofactor expansion.  tests/test_regress.py
# pins RidgeSpec(2) == the handwritten constants character-for-
# character, so the generator is a strict generalization: the proven
# bit-identical-cross-engine property of the d=3 family transfers to
# higher d because the higher-d text is produced by the SAME rules.
# Cofactor text grows ~(m+1)! — fine through 5×5 (120 products), the
# documented ceiling; beyond that, generate an elimination (LDLᵀ)
# CTE chain instead.


def _det_text(mat: list[list[str]]) -> str:
    """Determinant of a matrix of expression strings, first-row
    cofactor expansion; 2×2 base case renders ``a * d - b * c``."""
    n = len(mat)
    if n == 1:
        return mat[0][0]
    if n == 2:
        return f"{mat[0][0]} * {mat[1][1]} - {mat[0][1]} * {mat[1][0]}"
    out = ""
    for j in range(n):
        minor = [row[:j] + row[j + 1 :] for row in mat[1:]]
        term = f"{mat[0][j]} * ({_det_text(minor)})"
        out += term if not out else (f" - {term}" if j % 2 else f" + {term}")
    return out


class RidgeSpec:
    """Ridge normal equations for ``m`` slope features (design
    [1, x1..xm], int64 columns ``x1..xm, y``): moment names, Cramer
    determinant/beta/predict/SSE expression text, and the Spark/DuckDB
    evaluation helpers — the d=3 module surface, parametric in m."""

    def __init__(self, m: int):
        if not 1 <= m <= 4:
            raise ValueError(
                "RidgeSpec supports 1..4 slope features (5x5 Cramer "
                "text ceiling); use an LDL^T CTE chain beyond that"
            )
        self.m = m
        r = range(1, m + 1)
        self.moments = {"n": "count(*)"}
        self.moments.update({f"s{i}": f"sum(x{i})" for i in r})
        self.moments.update(
            {
                f"s{i}{j}": f"sum(x{i} * x{j})"
                for i in r
                for j in range(i, m + 1)
            }
        )
        self.moments["sy"] = "sum(y)"
        self.moments.update({f"s{i}y": f"sum(x{i} * y)" for i in r})
        self.moments["syy"] = "sum(y * y)"

        def a(i: int, j: int) -> str:  # XᵀX + λI' entry text
            if i == 0 and j == 0:
                return "nd"
            if i == 0 or j == 0:
                return f"s{max(i, j)}d"
            if i == j:
                return f"(s{i}{i}d + {{lam}})"
            return f"s{min(i, j)}{max(i, j)}d"

        def g(i: int, j: int) -> str:  # plain XᵀX entry text (no λ)
            if i == 0 and j == 0:
                return "nd"
            if i == 0 or j == 0:
                return f"s{max(i, j)}d"
            return f"s{min(i, j)}{max(i, j)}d"

        b = ["syd"] + [f"s{i}yd" for i in r]
        full = [[a(i, j) for j in range(m + 1)] for i in range(m + 1)]
        self.det_exprs = {"det": _det_text(full)}
        for k in range(m + 1):
            rep = [
                [b[i] if j == k else full[i][j] for j in range(m + 1)]
                for i in range(m + 1)
            ]
            self.det_exprs[f"det{k}"] = _det_text(rep)
        self.beta_exprs = {
            f"b{k}": f"round(det{k} / det, 6)" for k in range(m + 1)
        }
        self.predict_expr = "b0" + "".join(f" + b{i} * x{i}d" for i in r)
        xty = " + ".join(f"b{i} * {b[i]}" for i in range(m + 1))
        quad = " + ".join(
            f"b{i} * ("
            + " + ".join(f"b{j} * {g(i, j)}" for j in range(m + 1))
            + ")"
            for i in range(m + 1)
        )
        self.sse_expr = f"syyd - 2 * ({xty}) + ({quad})"
        self.r2_expr = R2_EXPR

    # -- Spark-side evaluation (mirrors the module-level d=3 helpers) --

    def moment_sums(self, design: DataFrame, keys: tuple[str, ...] = ()) -> DataFrame:
        aggs = [
            F.expr(expr).cast("long").alias(name)
            for name, expr in self.moments.items()
        ]
        if keys:
            return design.groupBy(*keys).agg(*aggs)
        return design.agg(*aggs)

    def with_betas(self, sums: DataFrame, lam) -> DataFrame:
        out = sums
        for name in self.moments:
            out = out.withColumn(f"{name}d", F.col(name).cast("double"))
        for name, tmpl in self.det_exprs.items():
            out = out.withColumn(name, F.expr(tmpl.format(lam=_lam_text(lam))))
        for name, expr in self.beta_exprs.items():
            out = out.withColumn(name, F.expr(expr))
        return out

    def with_r2(self, fit: DataFrame) -> DataFrame:
        return fit.withColumn("sse", F.expr(self.sse_expr)).withColumn(
            "r2", F.expr(self.r2_expr)
        )

    def ridge_fit(self, design: DataFrame, lam: float) -> DataFrame:
        return self.with_betas(self.moment_sums(design), lam)

    # -- DuckDB mirrors -------------------------------------------------

    def moments_sql_select(self, base_sql: str, keys: tuple[str, ...] = ()) -> str:
        cols = ",\n       ".join(
            f"CAST({expr} AS BIGINT) AS {name}"
            for name, expr in self.moments.items()
        )
        if keys:
            klist = ", ".join(keys)
            return (
                f"SELECT {klist},\n       {cols}\nFROM ({base_sql})"
                f"\nGROUP BY {klist}"
            )
        return f"SELECT {cols}\nFROM ({base_sql})"

    def betas_sql_select(self, lam) -> str:
        dcols = ", ".join(f"CAST({n} AS DOUBLE) AS {n}d" for n in self.moments)
        dets = ", ".join(
            f"{tmpl.format(lam=_lam_text(lam))} AS {name}"
            for name, tmpl in self.det_exprs.items()
        )
        betas = ", ".join(
            f"{expr} AS {name}" for name, expr in self.beta_exprs.items()
        )
        return (
            f"dsums AS (SELECT *, {dcols} FROM sums),\n"
            f"dets AS (SELECT *, {dets} FROM dsums),\n"
            f"betas AS (SELECT *, {betas} FROM dets)"
        )

    def r2_sql_select(self) -> str:
        return (
            f"ssed AS (SELECT *, {self.sse_expr} AS sse FROM betas),\n"
            f"fit AS (SELECT *, {self.r2_expr} AS r2 FROM ssed)"
        )
