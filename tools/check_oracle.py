"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at sf0.01,
compare row count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from inmem_vector_db_spark.session import get_spark  # noqa: E402
from inmem_vector_db_spark.sources.loader import TABLES  # noqa: E402


def norm_cell(v):
    if isinstance(v, float):
        return round(v, 6)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat().replace("+00:00", "")
    return v


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check", master="local[8]",
                      extra_conf={"spark.sql.shuffle.partitions": "8"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"  {name}: rows-only ({len(srows)} rows, {t_spark:.1f}s spark) — no oracle")
            continue
        t0 = time.time()
        rel = con.sql(oracles[name])
        ocols = [c for c in rel.columns]
        orows = rel.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        a, b = norm_rows(scols, srows), norm_rows(ocols, orows)
        ok_rows = a == b
        status = "OK " if (ok_cols and ok_rows) else "FAIL"
        print(f"  {name}: {status} spark={len(srows)}r/{t_spark:.1f}s duck={len(orows)}r/{t_duck:.1f}s")
        if not ok_cols:
            failures += 1
            print(f"    cols spark={scols} duck={ocols}")
        elif not ok_rows:
            failures += 1
            diff_a = [r for r in a if r not in b][:3]
            diff_b = [r for r in b if r not in a][:3]
            print(f"    spark-only={diff_a}")
            print(f"    duck-only ={diff_b}")
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
