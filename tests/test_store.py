"""LibraryStore CRUD, validation, search lifecycle, and persistence —
mirrors the reference's e2e + save/load test strategy (SURVEY.md 5)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.sources.embedding import hash_embed_texts, with_embeddings
from inmem_vector_db_spark.store import LibraryStore, ValidationError


@pytest.fixture()
def store(spark):
    return LibraryStore(spark)


@pytest.fixture()
def populated(spark, store):
    """A library with 2 documents x 3 chunks, deterministic embeddings."""
    lid = store.create_library("corpus", tags=["test"])
    docs = store.add_documents(
        lid,
        spark.createDataFrame(
            [("JWST", "space telescope"), ("Reef", "coral reef")],
            "title string, description string",
        ),
    ).collect()
    dids = {r["title"]: r["document_id"] for r in docs}
    rows = [
        (dids["JWST"], "infrared telescope at L2", ["space", "nasa"], 1),
        (dids["JWST"], "mirror of 18 hexagonal segments", ["space"], 2),
        (dids["JWST"], "successor to hubble", ["space", "history"], 3),
        (dids["Reef"], "largest living structure", ["ocean"], 1),
        (dids["Reef"], "coral bleaching from warming", ["ocean", "climate"], 2),
        (dids["Reef"], "home to thousands of species", ["ocean"], 3),
    ]
    store.add_chunks(
        lid,
        spark.createDataFrame(
            rows, "document_id string, text string, tags array<string>, page int"
        ),
    )
    return store, lid, dids


def test_embedding_provider_deterministic():
    import pandas as pd

    a = hash_embed_texts(pd.Series(["hello", "world"]))
    b = hash_embed_texts(pd.Series(["hello", "world"]))
    assert a == b
    assert len(a[0]) == 32 and len(set(a[0])) == 1  # constant vector
    assert 0.0 <= a[0][0] < 1.0
    assert a[0] != a[1]


def test_with_embeddings_matches_provider(spark):
    import pandas as pd

    df = spark.createDataFrame([("alpha",), ("beta",)], "text string")
    got = {r["text"]: r["embedding"] for r in with_embeddings(df).collect()}
    want = hash_embed_texts(pd.Series(["alpha", "beta"]))
    assert got["alpha"] == pytest.approx(want[0])
    assert got["beta"] == pytest.approx(want[1])


def test_create_and_stats(populated):
    store, lid, _ = populated
    stats = store.library_stats().collect()
    assert len(stats) == 1
    assert stats[0]["document_count"] == 2 and stats[0]["chunk_count"] == 6


def test_validation_errors(spark, store):
    with pytest.raises(ValidationError):
        store.create_library("   ")
    lid = store.create_library("ok")
    with pytest.raises(ValidationError):
        store.add_documents(lid, spark.createDataFrame([("",)], "title string"))
    doc = store.add_documents(
        lid, spark.createDataFrame([("d",)], "title string")
    ).head()
    with pytest.raises(ValidationError):
        store.add_chunks(
            lid,
            spark.createDataFrame(
                [(doc["document_id"], " ")], "document_id string, text string"
            ),
        )
    with pytest.raises(KeyError):  # dangling document_id rejects whole batch
        store.add_chunks(
            lid,
            spark.createDataFrame(
                [("no-such-doc", "text")], "document_id string, text string"
            ),
        )
    with pytest.raises(ValidationError):
        store.add_chunks(
            lid,
            spark.createDataFrame(
                [(doc["document_id"], "t", -1)],
                "document_id string, text string, page int",
            ),
        )


def test_tag_dedup_and_empty_drop(spark, store):
    lid = store.create_library("t")
    doc = store.add_documents(
        lid, spark.createDataFrame([("d",)], "title string")
    ).head()
    chunks = store.add_chunks(
        lid,
        spark.createDataFrame(
            [(doc["document_id"], "txt", ["a", "a", "", "b"])],
            "document_id string, text string, tags array<string>",
        ),
    ).collect()
    assert sorted(chunks[0]["tags"]) == ["a", "b"]


def test_search_self_similarity_and_enrichment(populated):
    store, lid, dids = populated
    # euclidean: the constant-vector mock embedding gives every text a
    # distinct scalar, so only the identical text has distance 0.
    # (Under cosine ALL constant vectors are parallel => everything ties
    # at 0 — an artifact of the mock scheme, not of the engine.)
    res = store.search(lid, "infrared telescope at L2", k=3, metric="euclidean").collect()
    assert len(res) == 3
    # the constant-vector embedding of the exact same text => distance 0
    assert res[0]["score"] == pytest.approx(0.0, abs=1e-6)
    assert res[0]["document_id"] == dids["JWST"]
    assert res[0]["doc_title"] == "JWST"
    assert [r["rank"] for r in res] == [1, 2, 3]


def test_search_tag_prefilter_vs_parity_postfilter(populated):
    store, lid, _ = populated
    # native mode: pre-filter => always fills k from matching chunks
    native = store.search(
        lid, "coral bleaching from warming", k=2, metric="euclidean",
        filter_tags=["ocean"],
    ).collect()
    assert len(native) == 2
    assert all("ocean" in r["tags"] for r in native)
    # parity mode: top-k first, filter after => may under-fill (reference P2)
    parity = store.search(
        lid, "coral bleaching from warming", k=2, metric="euclidean",
        filter_tags=["climate"], parity=True,
    ).collect()
    assert len(parity) <= 2
    assert all("climate" in r["tags"] for r in parity)


def test_parity_rank_euclidean_score_metric(populated):
    """Reference quirk: rank by euclidean even when metric=dot_product;
    score uses the requested metric (library.py:117 +
    library_service.py:217-223)."""
    store, lid, _ = populated
    res = store.search(lid, "mirror of 18 hexagonal segments", k=6,
                       metric="dot_product", parity=True).collect()
    scores = [r["score"] for r in res]
    assert all(s <= 0 for s in scores)  # negated dot of positive vectors
    # ranking follows euclidean order, not dot order: verify rank order is
    # NOT sorted by score when the two disagree
    assert [r["rank"] for r in res] == sorted(r["rank"] for r in res)


def test_include_flags_projection(populated):
    store, lid, _ = populated
    slim = store.search(lid, "q", k=1, include_metadata=False)
    assert "text" not in slim.columns and "embedding" not in slim.columns
    full = store.search(lid, "q", k=1, include_metadata=True, include_embeddings=True)
    assert "text" in full.columns and "embedding" in full.columns


def test_update_chunk_reembeds_and_moves(spark, populated):
    store, lid, dids = populated
    chunk = store.chunks.filter(F.col("text") == "successor to hubble").head()
    old_emb = chunk["embedding"]
    store.update_chunk(chunk["chunk_id"], text="entirely new text",
                       document_id=dids["Reef"], tags=["x"])
    new = store.chunks.filter(F.col("chunk_id") == chunk["chunk_id"]).head()
    assert new["text"] == "entirely new text"
    assert new["embedding"] != old_emb  # re-embedded
    assert new["document_id"] == dids["Reef"]
    assert new["tags"] == ["x"]
    assert new["created_at"] == chunk["created_at"]  # preserved


def test_delete_cascades(populated):
    store, lid, dids = populated
    store.delete_document(dids["JWST"])
    assert store.chunks.filter(F.col("document_id") == dids["JWST"]).isEmpty()
    assert store.chunks.count() == 3
    store.delete_library(lid)
    assert store.libraries.isEmpty() and store.documents.isEmpty() and store.chunks.isEmpty()


def test_list_chunks_preview(spark, store):
    lid = store.create_library("p")
    doc = store.add_documents(
        lid, spark.createDataFrame([("d",)], "title string")
    ).head()
    long_text = "x" * 150
    store.add_chunks(
        lid,
        spark.createDataFrame(
            [(doc["document_id"], long_text)], "document_id string, text string"
        ),
    )
    row = store.list_chunks(doc["document_id"]).head()
    assert row["text"] == "x" * 100 + "..." and len(row["text"]) == 103


def test_save_load_roundtrip(spark, populated, tmp_path):
    store, lid, _ = populated
    res_before = store.search(lid, "largest living structure", k=3, metric="cosine").collect()
    root = str(tmp_path / "snapshot")
    store.save(root)
    restored = LibraryStore.load(spark, root)
    assert restored.chunks.count() == 6
    res_after = restored.search(lid, "largest living structure", k=3, metric="cosine").collect()
    assert [(r["chunk_id"], round(r["score"], 9)) for r in res_before] == [
        (r["chunk_id"], round(r["score"], 9)) for r in res_after
    ]


def test_metadata_update_preserves_created_at(populated):
    store, lid, _ = populated
    before = store.libraries.head()
    store.update_library(lid, name="renamed", tags=["a", "a", "b"])
    after = store.libraries.head()
    assert after["name"] == "renamed"
    assert sorted(after["tags"]) == ["a", "b"]
    assert after["created_at"] == before["created_at"]
    assert after["updated_at"] >= before["updated_at"]


def test_save_partitioned_roundtrip(spark, populated, tmp_path):
    import os

    store, lid, _ = populated
    root = str(tmp_path / "snap_part")
    store.save(root, partition_by_library=True)
    # partition directories exist and restore works identically
    assert any(
        d.startswith("library_id=") for d in os.listdir(os.path.join(root, "chunks"))
    )
    restored = LibraryStore.load(spark, root)
    assert restored.chunks.count() == store.chunks.count()
    assert set(restored.chunks.columns) == set(store.chunks.columns)


def test_search_all_libraries(spark, populated):
    store, lid, _ = populated
    lid2 = store.create_library("second")
    doc = store.add_documents(
        lid2, spark.createDataFrame([("d2",)], "title string")
    ).head()
    store.add_chunks(
        lid2,
        spark.createDataFrame(
            [(doc["document_id"], "infrared telescope at L2")],
            "document_id string, text string",
        ),
    )
    res = store.search_all_libraries("infrared telescope at L2", k=2).collect()
    by_lib = {}
    for r in res:
        by_lib.setdefault(r["library_id"], []).append(r)
    assert set(by_lib) == {lid, lid2}
    assert len(by_lib[lid]) == 2 and len(by_lib[lid2]) == 1
    # both libraries' best hit is the exact text (euclidean distance 0)
    assert min(r["score"] for r in by_lib[lid]) == pytest.approx(0.0, abs=1e-9)
    assert by_lib[lid2][0]["score"] == pytest.approx(0.0, abs=1e-9)


def test_rebuild_index_signature_table(populated):
    store, lid, _ = populated
    idx = store.rebuild_index(lid, num_tables=4, hash_size=6)
    assert idx.count() == 6 * 4  # 6 chunks x 4 tables
    row = idx.head()
    assert set(idx.columns) == {"chunk_id", "table_idx", "sig"}
    assert len(row["sig"]) == 6 and set(row["sig"]) <= {"0", "1"}
    # idempotent: rebuilding yields the identical table (seeded planes)
    again = store.rebuild_index(lid, num_tables=4, hash_size=6)
    assert idx.exceptAll(again).isEmpty() and again.exceptAll(idx).isEmpty()
