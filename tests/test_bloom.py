"""Bloom-filter runtime join pruning: exactness (no false negatives),
real pruning power, and bounded bitset size."""

from __future__ import annotations

from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.bloom import (
    bloom_bits,
    bloom_might_contain,
    bloom_pruned_join,
)


def test_no_false_negatives(spark):
    """Every key inserted at build time must pass the membership test —
    the Bloom contract that makes the pruned join exact."""
    keys = spark.range(0, 500).select((F.col("id") * 7 + 3).alias("k"))
    bits = bloom_bits(keys, "k", m_bits=1 << 14)
    hits = keys.filter(bloom_might_contain(F.col("k"), bits, 1 << 14)).count()
    assert hits == 500


def test_prunes_most_non_members(spark):
    """Disjoint probe keys should mostly fail the test (fpp ~ small):
    the filter actually prunes, it isn't a tautology."""
    build = spark.range(0, 1000).select((F.col("id") + 1_000_000).alias("k"))
    bits = bloom_bits(build, "k", m_bits=1 << 17)
    probe = spark.range(0, 10_000).select(F.col("id").alias("k"))
    passed = probe.filter(bloom_might_contain(F.col("k"), bits, 1 << 17)).count()
    # k=3, m=2^17, n=1000 -> fpp ~ (1-e^(-3000/131072))^3 ~ 1.2e-5
    assert passed < 50


def test_pruned_join_equals_plain_join(spark, sf_dir):
    from inmem_vector_db_spark.sources.loader import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    pruned = (
        bloom_pruned_join(li, orders, "l_orderkey", "o_orderkey")
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    plain = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .select("l_orderkey", "l_linenumber")
        .collect()
    )
    assert sorted(map(tuple, pruned)) == sorted(map(tuple, plain))


def test_bitset_is_bounded(spark):
    keys = spark.range(0, 200).select(F.col("id").alias("k"))
    bits = bloom_bits(keys, "k", m_bits=1 << 17)
    assert len(bits) == (1 << 17) // 64  # 2048 longs = 16 KiB
    assert any(b != 0 for b in bits)


def test_empty_build_side_prunes_everything(spark):
    """Empty dim -> all-zero bitset -> every probe fails -> the pruned
    join is empty, exactly like the plain join."""
    empty = spark.range(0).select(F.col("id").alias("k"))
    bits = bloom_bits(empty, "k", m_bits=1 << 14)
    assert all(b == 0 for b in bits)
    probe = spark.range(0, 100).select(F.col("id").alias("k"))
    assert probe.filter(bloom_might_contain(F.col("k"), bits, 1 << 14)).count() == 0
