"""Windowed-oracle float robustness pin (round-4 VERDICT item 4).

The driver hashes round(value, 6) floats; a float computed by an
order-dependent summation can sit one ULP from a rounding boundary and
flip its 6th digit between engines (or between runs of the same engine
with different partition orders).  The robust pattern is ratios/means of
exactly-representable pre-aggregated operands (e.g. ``sum(int)::DOUBLE /
sum(int)``, fixed 16-byte digests) — ``bpe_per_ws`` was rewritten that
way this round.

This test pins the property EMPIRICALLY for every windowed oracle: run
each one against the tables in their natural parquet order and against a
md5-shuffled row order, and require bit-identical results.  An
order-dependent float summation over non-representable addends is
exactly what this catches (DuckDB streams aggregation in input order, so
permuting input permutes the summation order).
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entrymod
from inmem_vector_db_spark.sources.loader import TABLES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# rounding-boundary flips are data-dependent, so the pin also runs at the
# driver's correctness scale (q1's flip reproduced at sf0.001, but a sum
# that is safe at one SF can sit on a boundary at another).  The second
# scale is derived from the env root's parent (sibling sf0.01 fixture)
# and only included when it exists, so hosts without that exact path
# still run the single-scale pin instead of erroring.
_SIBLING = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
SF_DIRS = sorted(
    {d for d in (SF_DIR, _SIBLING) if os.path.isdir(d)}
) or [SF_DIR]

# deterministic shuffle key per table: md5 of the first column's value.
# Rows sharing that value (e.g. one order's lineitems) keep their
# engine-arbitrary relative order, which is exactly the aspect an
# order-robust aggregate must not depend on either.
def _connect(sf_dir: str, shuffled: bool) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if shuffled:
            cols = [
                r[0]
                for r in con.sql(
                    f"DESCRIBE SELECT * FROM read_parquet('{path}')"
                ).fetchall()
            ]
            first = cols[0]
            con.sql(
                f"CREATE TABLE {t} AS SELECT * FROM read_parquet('{path}') "
                f'ORDER BY md5(CAST("{first}" AS VARCHAR))'
            )
        else:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_all_oracles_are_input_order_invariant(sf_dir):
    natural = _connect(sf_dir, shuffled=False)
    shuffled = _connect(sf_dir, shuffled=True)
    oracles = entrymod.oracle_sql()
    diffs: dict[str, str] = {}

    def norm(rows):  # None-safe total order across mixed-type columns
        return sorted((tuple(r) for r in rows), key=repr)

    for name, sql in oracles.items():
        a = norm(natural.sql(sql).fetchall())
        b = norm(shuffled.sql(sql).fetchall())
        if a != b:
            only_a = [r for r in a if r not in b][:2]
            only_b = [r for r in b if r not in a][:2]
            diffs[name] = f"natural={only_a} shuffled={only_b}"
    assert not diffs, (
        "oracle output depends on input row order — an order-dependent "
        "float aggregation is one rounding boundary away from a driver "
        f"hash mismatch: {diffs}"
    )


# Spark-side twin of the DuckDB shuffle pin above: the chaos knob in
# sources/loader.py (SPARK_GRAFT_REPARTITION=N) round-robin repartitions
# every loaded table, changing physical row layout, partition count, and
# therefore partial-aggregation grouping — a query whose values survive
# it cannot be depending on input partitioning.  Full-gate evidence: the
# entire 202-query oracle gate passed under SPARK_GRAFT_REPARTITION=7 at
# sf0.001 (round 5).  This pins the float-heaviest families in-suite so
# a regression fails fast without the full gate.
_SPARK_PARTITION_PIN = [
    "kmeans_embeddings",   # integer-quantized Lloyd loop
    "numeric_corr",        # covariance/stddev ratios
    "winsorized_stats",    # percentile clamps + means
    "embedding_pca_var",   # Gramian eigen-ish variance shares
    "hybrid_search",       # BM25 + cosine RRF floats
    "q1_pricing_summary",  # decimal-exact money math
]


def test_spark_results_are_partition_invariant(spark, monkeypatch):
    qs = entrymod.queries()
    diffs = {}
    for name in _SPARK_PARTITION_PIN:
        monkeypatch.delenv("SPARK_GRAFT_REPARTITION", raising=False)
        natural = sorted((tuple(r) for r in qs[name](spark, SF_DIR).collect()), key=repr)
        monkeypatch.setenv("SPARK_GRAFT_REPARTITION", "7")
        chaos = sorted((tuple(r) for r in qs[name](spark, SF_DIR).collect()), key=repr)
        monkeypatch.delenv("SPARK_GRAFT_REPARTITION", raising=False)
        if natural != chaos:
            diffs[name] = (
                [r for r in natural if r not in chaos][:2],
                [r for r in chaos if r not in natural][:2],
            )
    assert not diffs, (
        "query values depend on input partitioning — would drift on any "
        f"real cluster layout change: {diffs}"
    )
