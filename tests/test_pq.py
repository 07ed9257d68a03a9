"""Product quantization: code validity, determinism across partition
layouts, recall vs exact kNN, and the two-stage plan shape."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from inmem_vector_db_spark.operators.knn import knn
from inmem_vector_db_spark.operators.pq import pq_codebooks, pq_encode, pq_search

# sf0.001 has 50 vectors; stride 6 yields 9 codebook entries
PQ_KW = dict(m=4, k=16, stride=6)


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_codes_shape_and_range(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb, **PQ_KW)
    m, kk, dsub = cb.shape
    assert (m, dsub) == (4, 16)
    rows = pq_encode(emb, cb).collect()
    assert len(rows) == emb.count()
    for r in rows:
        assert len(r["codes"]) == m
        assert all(0 <= c < kk for c in r["codes"])


def test_encode_invariant_to_partitioning(spark, sf_dir):
    """Codes must not depend on how rows are batched into Arrow chunks
    — the determinism the oracle relies on."""
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb, **PQ_KW)
    a = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, cb).collect()}
    b = {
        r["vec_id"]: list(r["codes"])
        for r in pq_encode(emb.repartition(7), cb).collect()
    }
    assert a == b


def test_pq_recall_vs_exact(spark, sf_dir):
    """Recall sanity on a hard corpus (50 random 64-d vectors are
    near-equidistant, 9 codes): non-trivial recall at oversample 4, and
    EXACT recovery once the candidate set covers the corpus — the
    two-stage mechanism degenerates to exact kNN, self-query included."""
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb, **PQ_KW)
    codes = pq_encode(emb, cb).cache()
    try:
        q = [list(r[0]) for r in emb.filter(F.col("vec_id") == 3).select("embedding").collect()][0]
        truth = {r["vec_id"] for r in knn(emb, q, k=10).collect()}
        got = {
            r["vec_id"]
            for r in pq_search(emb, codes, q, cb, k=10, oversample=4).collect()
        }
        assert len(truth & got) / 10 >= 0.3
        # candidate set >= corpus -> degenerates to exact: recall 1.0
        n = emb.count()
        exact = pq_search(emb, codes, q, cb, k=10, oversample=(n // 10) + 1)
        assert {r["vec_id"] for r in exact.collect()} == truth
        assert exact.filter(F.col("vec_id") == 3).head()["dist"] == 0.0
    finally:
        codes.unpersist()


def test_adc_matches_numpy(spark, sf_dir):
    """Stage-1 ADC distance == numpy LUT sum for every row."""
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb, **PQ_KW)
    m, kk, dsub = cb.shape
    codes_df = pq_encode(emb, cb)
    q_rows = emb.filter(F.col("vec_id") == 0).select("embedding").collect()
    q = np.asarray(list(q_rows[0][0]), dtype=np.float64)
    luts = []
    for j in range(m):
        d = np.zeros(kk)
        for i in range(dsub):
            diff = q[j * dsub + i] - cb[j][:, i]
            d += diff * diff
        luts.append(d)
    adc = None
    for j in range(m):
        term = F.element_at(
            F.lit([float(x) for x in luts[j]]), F.col("codes").getItem(j) + 1
        )
        adc = term if adc is None else adc + term
    rows = codes_df.select("vec_id", "codes", adc.alias("adc_d")).collect()
    for r in rows:
        expect = sum(luts[j][r["codes"][j]] for j in range(m))
        assert abs(r["adc_d"] - expect) < 1e-9


def test_stage1_plan_is_codegen_takeordered(spark, sf_dir):
    """Candidate generation: no join, no Exchange — a TakeOrdered over
    the codes projection."""
    emb = _emb(spark, sf_dir)
    cb = pq_codebooks(emb, **PQ_KW)
    codes = pq_encode(emb, cb)
    adc = None
    for j in range(cb.shape[0]):
        term = F.element_at(F.lit([0.0] * cb.shape[1]), F.col("codes").getItem(j) + 1)
        adc = term if adc is None else adc + term
    stage1 = codes.select("vec_id", adc.alias("adc_d")).orderBy("adc_d", "vec_id").limit(5)
    plan = stage1._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan
