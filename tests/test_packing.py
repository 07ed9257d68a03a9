"""Invariant tests for training-example assembly (plans/packing.py).

Correctness of the VALUES is pinned by the DuckDB oracles
(tools/check_oracle.py); these tests pin the semantic invariants the
oracle can't express — conservation laws, budget exactness,
determinism across partition layouts.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inmem_vector_db_spark.functions.text import token_count
from inmem_vector_db_spark.plans.packing import (
    SEQ_BUDGET,
    boilerplate_profile,
    pack_sequences,
    shard_profile,
)
from inmem_vector_db_spark.sources.loader import load_table


def _docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_packing_conserves_tokens(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    total = (
        docs.select(token_count("text").cast("long").alias("n"))
        .where(F.col("n") > 0)
        .agg(F.sum("n"))
        .first()[0]
    )
    packed = pack_sequences(docs).collect()
    assert sum(r.n_tokens for r in packed) == total


def test_packing_budget_exact_except_last(spark, sf_dir):
    packed = pack_sequences(_docs(spark, sf_dir)).collect()
    seq_ids = [r.seq_id for r in packed]
    assert seq_ids == list(range(len(packed)))  # contiguous from 0
    for r in packed[:-1]:
        assert r.n_tokens == SEQ_BUDGET
    assert 0 < packed[-1].n_tokens <= SEQ_BUDGET
    assert all(r.n_docs >= 1 for r in packed)


def test_packing_partition_layout_invariant(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = pack_sequences(docs).collect()
    b = pack_sequences(docs.repartition(13)).collect()
    assert a == b


def test_packing_custom_budget(spark, sf_dir):
    packed = pack_sequences(_docs(spark, sf_dir), budget=64).collect()
    for r in packed[:-1]:
        assert r.n_tokens == 64
    # a 64-token budget over multi-hundred-token docs must split docs
    assert any(r.n_docs == 1 for r in packed) or len(packed) > 1


def test_boilerplate_ratios_bounded(spark, sf_dir):
    rows = boilerplate_profile(_docs(spark, sf_dir)).collect()
    assert rows, "expected at least one source group"
    for r in rows:
        assert 0 <= r.docs_with_boiler <= r.n_docs
        assert 0.0 <= r.avg_boiler_ratio <= 1.0
        assert r.total_boiler >= r.docs_with_boiler


def test_boilerplate_df_threshold_monotone(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    low = {r.source: r.total_boiler for r in boilerplate_profile(docs, min_df=2).collect()}
    high = {r.source: r.total_boiler for r in boilerplate_profile(docs, min_df=5).collect()}
    for src, hi_val in high.items():
        assert hi_val <= low[src]


def test_shard_profile_partition_and_determinism(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = shard_profile(docs).collect()
    assert all(0 <= r.shard < 16 for r in rows)
    assert sum(r.n_docs for r in rows) == docs.count()
    assert rows == shard_profile(docs.repartition(7)).collect()
