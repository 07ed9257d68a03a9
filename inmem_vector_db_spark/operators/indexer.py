"""Index strategy interface (reference §2.10 extension point).

The reference's pluggable surface is the ``Indexer`` ABC —
``build/add/delete/update/search`` over an embeddings dict
(``app/core/indexers/indexer.py:41-87``) with three registered
implementations selected by enum (``IndexerType{FLAT,HNSW,LSH}``,
``app/api/schemas/library.py:10-13``).

Spark translation: an index is a **derived DataFrame artifact** (or
nothing at all, for the flat scan), and the strategy interface is over
DataFrames:

* ``build(corpus) -> index_df | None``  — the batch "index build job";
* ``search(corpus, queries, k, metric) -> results_df`` — candidate
  retrieval + exact re-rank.

``add/delete/update`` need no per-strategy code here: the corpus is a
table, mutations are appends/anti-joins on it (see ``store``), and the
index artifact is refreshed incrementally (``streaming.ingest``) or
rebuilt (the M10 job == ``build``).

HNSW is intentionally not implemented: a sequential greedy graph
traversal has no bulk-parallel expression; its *capability* (fast
approximate kNN) is covered by ``LSHIndex``, and exact ``FlatIndex``
scales linearly across executors anyway (SURVEY.md 7.3).
"""

from __future__ import annotations

from abc import ABC, abstractmethod

from pyspark.sql import DataFrame

from inmem_vector_db_spark.operators.knn import knn_join_vectorized
from inmem_vector_db_spark.operators.lsh import RandomHyperplaneLSH


class Index(ABC):
    """Strategy interface: build an index artifact, search through it."""

    name: str = "base"

    @abstractmethod
    def build(self, corpus: DataFrame) -> DataFrame | None:
        """Produce the index artifact DataFrame (None if index-free)."""

    @abstractmethod
    def search(
        self,
        corpus: DataFrame,
        queries: DataFrame,
        k: int = 5,
        metric: str = "euclidean",
    ) -> DataFrame:
        """(query_id, vec_id, dist, rank) — rank 1..k ascending dist."""


class FlatIndex(Index):
    """Exact linear scan (reference ``FlatIndexer``): no artifact, the
    corpus itself is the index.  Default strategy (``library.py:41-43``)."""

    name = "flat"

    def __init__(self, id_col: str = "vec_id", vec_col: str = "embedding") -> None:
        self.id_col = id_col
        self.vec_col = vec_col

    def build(self, corpus: DataFrame) -> None:
        return None  # O(1) 'build', like flat_index.py:33-39

    def search(self, corpus, queries, k=5, metric="euclidean") -> DataFrame:
        return knn_join_vectorized(
            corpus, queries, k=k, metric=metric,
            id_col=self.id_col, vec_col=self.vec_col,
        )


class LSHIndex(Index):
    """Seeded random-hyperplane LSH (reference ``LSHIndexer``) — the
    artifact is the long-form signature table."""

    name = "lsh"

    def __init__(
        self,
        dim: int,
        num_tables: int = 10,
        hash_size: int = 8,
        seed: int = 42,
        id_col: str = "vec_id",
        vec_col: str = "embedding",
    ) -> None:
        self.lsh = RandomHyperplaneLSH(dim, num_tables, hash_size, seed)
        self.id_col = id_col
        self.vec_col = vec_col
        self._index: DataFrame | None = None

    def build(self, corpus: DataFrame) -> DataFrame:
        self._index = self.lsh.build_index(corpus, self.id_col, self.vec_col)
        return self._index

    def search(self, corpus, queries, k=5, metric="euclidean") -> DataFrame:
        return self.lsh.search(
            corpus, queries, k=k, metric=metric,
            id_col=self.id_col, vec_col=self.vec_col,
            index=self._index,
        )


def make_index(indexer_type: str, dim: int, **kw) -> Index:
    """Enum dispatch (reference ``library_service.py:65-79``)."""
    if indexer_type == "flat":
        return FlatIndex(**{k: v for k, v in kw.items() if k in ("id_col", "vec_col")})
    if indexer_type == "lsh":
        return LSHIndex(dim, **kw)
    raise ValueError(
        f"unknown indexer_type {indexer_type!r} (hnsw: see module docstring)"
    )
