"""Behavioral checks for the IR pack (BM25 + RRF fusion) on a corpus
where the right answers are obvious by construction."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bm25_ranks_term_dense_doc_first(spark, sf_dir, tmp_path, monkeypatch):
    # build a corpus where doc 1 is saturated with the query terms,
    # doc 2 has one hit, doc 3 none — BM25 must order 1 > 2 and drop 3
    rows = [
        (1, "data model training data quality model data training"),
        (2, "the data of everything else entirely unrelated words"),
        (3, "completely different content with no relevant terms"),
        (4, "data data data data data data data data data data"),
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    d = str(tmp_path / "documents.parquet")
    df.write.parquet(d)
    import inmem_vector_db_spark.plans.textops as T

    monkeypatch.setattr(
        T, "load_table", lambda spark, sf, name: spark.read.parquet(d)
    )
    got = [r["doc_id"] for r in T.bm25_search_q(spark, "ignored").collect()]
    assert got[0] == 1          # all four terms, repeated
    assert 3 not in got         # no query terms -> no score
    assert set(got) == {1, 2, 4}
    # doc 4 spams one term; BM25's tf saturation must keep the
    # all-terms doc 1 above it (idf sums across distinct terms)
    assert got.index(1) < got.index(4)


def test_rrf_favors_agreement(spark):
    # doc 10 is rank 1 in one leg only; doc 20 is rank 2 in BOTH legs:
    # rrf(20) = 2/62 > rrf(10) = 1/61 + 0 — fusion rewards agreement
    lex = spark.createDataFrame(
        [(10, 1), (20, 2), (30, 3)], "doc_id LONG, lex_rank INT"
    )
    vec = spark.createDataFrame(
        [(40, 1), (20, 2), (30, 4)], "doc_id LONG, vec_rank INT"
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(1.0 / (60 + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(1.0 / (60 + F.col("vec_rank")), F.lit(0.0))
            ).alias("rrf"),
        )
        .orderBy(F.desc("rrf"), "doc_id")
    )
    order = [r["doc_id"] for r in fused.collect()]
    assert order[0] == 20       # agreement beats a single first place
    assert order[1] == 30       # two mid ranks still beat one top rank
    assert set(order[2:]) == {10, 40}
