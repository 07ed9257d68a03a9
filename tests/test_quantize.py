"""int8 scalar quantization: round-trip error bounds and two-stage
recall vs exact kNN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.knn import knn
from inmem_vector_db_spark.operators.quantize import (
    dequantize,
    knn_int8,
    knn_quantized_rerank,
    knn_quantized_rerank_multi,
    with_quantized,
    with_quantized_expr,
)


@pytest.fixture(scope="module")
def embq(spark, sf_dir):
    df = with_quantized(spark.read.parquet(f"{sf_dir}/embeddings.parquet")).cache()
    df.count()
    return df


def test_quantization_error_bound(embq):
    """|deq - orig| <= scale/2 per element (round-to-nearest)."""
    rows = embq.select(
        "embedding", dequantize("emb_q", "emb_scale").alias("deq"), "emb_scale"
    ).limit(50).collect()
    for r in rows:
        orig = np.array(r["embedding"], dtype=np.float64)
        deq = np.array(r["deq"], dtype=np.float64)
        assert np.abs(orig - deq).max() <= r["emb_scale"] / 2 + 1e-9


def test_codes_are_int8_range(embq):
    row = embq.select(F.array_max("emb_q").alias("mx"), F.array_min("emb_q").alias("mn")).agg(
        F.max("mx").alias("mx"), F.min("mn").alias("mn")
    ).head()
    assert -127 <= row["mn"] and row["mx"] <= 127


def test_zero_vector_scale_one(spark):
    df = with_quantized(
        spark.createDataFrame([(1, [0.0] * 4)], "vec_id int, embedding array<float>")
    )
    r = df.head()
    assert r["emb_scale"] == 1.0 and list(r["emb_q"]) == [0, 0, 0, 0]


def test_numpy_build_matches_expression_build(spark, sf_dir):
    """The Arrow/numpy fast build is pinned code-for-code and
    scale-for-scale to the pure-Column reference build over the whole
    sf corpus (same double arithmetic, same half-away rounding, same
    float32 scale narrowing)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    fast = with_quantized(emb).select("vec_id", "emb_q", "emb_scale")
    ref = with_quantized_expr(emb).select(
        "vec_id",
        F.col("emb_q").alias("q_ref"),
        F.col("emb_scale").alias("scale_ref"),
    )
    diff = (
        fast.join(ref, "vec_id")
        .filter(
            (F.col("emb_q") != F.col("q_ref"))
            | (F.col("emb_scale") != F.col("scale_ref"))
        )
        .count()
    )
    assert diff == 0


def test_knn_int8_matches_expression_stage1(spark, embq):
    """The numpy int8 scan returns the same candidate top-k as ranking
    the expression-dequantized column (ties broken by id in both)."""
    qr = embq.filter(F.col("vec_id") == 3).head()
    q = [float(x) for x in qr["embedding"]]
    via_expr = [
        r["vec_id"]
        for r in knn(
            embq.select("vec_id", dequantize("emb_q", "emb_scale").alias("dv")),
            q,
            k=20,
            metric="euclidean",
            vec_col="dv",
        ).collect()
    ]
    via_numpy = [
        r["vec_id"]
        for r in knn_int8(embq, [(3, q)], k=20, metric="euclidean")
        .orderBy("dist", "vec_id")
        .collect()
    ]
    assert via_numpy == via_expr


def test_multi_matches_single_query_rerank(spark, embq):
    """Batched two-stage search == per-query two-stage search."""
    qrows = embq.filter(F.col("vec_id").isin([1, 4])).select(
        "vec_id", "embedding"
    ).collect()
    queries = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in qrows]
    multi = knn_quantized_rerank_multi(embq, queries, k=5, oversample=4)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in multi.collect()
    }
    for qid, qv in queries:
        single = knn_quantized_rerank(embq, qv, k=5, oversample=4).collect()
        for rank, r in enumerate(single, start=1):
            assert got[(qid, rank)] == r["vec_id"]


def test_two_stage_recall(spark, embq):
    """Quantized candidates + exact re-rank recovers (nearly) the exact
    top-10 for several query vectors."""
    qrows = embq.filter(F.col("vec_id") < 5).select("vec_id", "embedding").collect()
    total_hits = 0
    for qr in qrows:
        q = [float(x) for x in qr["embedding"]]
        exact = [r["vec_id"] for r in knn(embq, q, k=10, metric="euclidean").collect()]
        two_stage = [
            r["vec_id"]
            for r in knn_quantized_rerank(embq, q, k=10, oversample=4).collect()
        ]
        assert len(two_stage) == 10
        total_hits += len(set(exact) & set(two_stage))
    assert total_hits >= 45  # >=90% average recall over 5 queries


def test_with_quantized_degenerate_rows(spark):
    """NULL and empty embeddings must survive the fast build the same
    way the column-expression build handles them: NULL passes through,
    an empty vector gets scale 1.0 and empty codes."""
    from inmem_vector_db_spark.operators.quantize import with_quantized

    df = spark.createDataFrame(
        [(1, [1.0, -2.0]), (2, None), (3, [])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in with_quantized(df).collect()}
    assert rows[2]["emb_q"] is None and rows[2]["emb_scale"] is None
    assert rows[3]["emb_q"] == [] and abs(rows[3]["emb_scale"] - 1.0) < 1e-9
    assert rows[1]["emb_q"] == [64, -127]


def test_rerank_multi_empty_corpus(spark):
    """An empty corpus returns an empty result, matching the per-query
    path, instead of raising."""
    from inmem_vector_db_spark.operators.quantize import (
        knn_quantized_rerank_multi,
        with_quantized,
    )

    empty = with_quantized(
        spark.createDataFrame([], "vec_id long, embedding array<float>")
    )
    out = knn_quantized_rerank_multi(empty, [(0, [0.0, 0.0])], k=3)
    assert out.count() == 0


def test_knn_int8_nondefault_id_type(spark):
    """Output RecordBatches carry EXPLICIT Arrow types (advisor r9): an
    id column whose Arrow type numpy inference would not round-trip
    (int32-typed 'int') must come back typed per the declared schema,
    not fail with an Arrow schema mismatch."""
    rows = [(i, [float(i), float(9 - i)]) for i in range(10)]
    df = with_quantized(
        spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    )
    got = knn_int8(df, [(0, [0.0, 9.0])], k=3, metric="euclidean")
    assert dict(got.dtypes)["vec_id"] == "int"
    assert [r["vec_id"] for r in got.orderBy("dist", "vec_id").collect()] == [
        0,
        1,
        2,
    ]
