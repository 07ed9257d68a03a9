"""Text -> embedding source (reference S5, SURVEY.md 2.1).

The reference calls the Cohere ``embed`` API with an in-process dict
cache (``app/core/embedding.py:19-82``).  Spark-first equivalents:

* **Provider** = an Arrow-batched ``mapInPandas`` stage: the model call
  happens once per partition-batch (the reference batches for the same
  reason, ``embedding.py:42-82``), never per row.
* **Cache** = a persisted ``text_hash -> embedding`` parquet table and a
  left join: hits are served by the join, only misses reach the
  provider, and new pairs are appended back (``EmbeddingCache``).
* **Determinism** = the default provider reproduces the reference's
  *test* embedding scheme (``tests/test_library_save_load.py:26-36``):
  a constant 32-dim vector derived from a text hash.  The reference
  uses Python ``hash()`` (process-seeded, irreproducible); here md5
  keeps the same shape but is stable across runs/engines so fixtures
  are oracle-checkable (SURVEY.md 7.4).  A real model provider slots in
  without touching callers: ``sources.providers.RestEmbeddingProvider``
  is the live-API example (Cohere-style REST endpoint, reference
  batch+dedup+cache semantics, credential-gated; see test_providers.py).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_DIM = 32


def hash_embed_texts(texts: "pd.Series", dim: int = DEFAULT_DIM) -> list[list[float]]:
    """Deterministic stand-in for a model: constant vector
    ``[md5_int(text) % 10000 / 10000.0] * dim`` (float32-exact), the
    shape of the reference's mock (``test_library_save_load.py:31-35``)
    with a process-stable hash.

    The hash is the little-endian read of the first 8 md5 bytes —
    exactly DuckDB's ``md5_number_upper``, so oracle SQL can recompute
    these embeddings scalar-side:
    ``CAST((md5_number_upper(text) % 10000) / 10000.0 AS FLOAT)``.
    """
    out = []
    for t in texts:
        h = int.from_bytes(hashlib.md5(str(t).encode()).digest()[:8], "little")
        val = np.float32((h % 10000) / 10000.0)
        out.append([float(val)] * dim)
    return out


def hash_embedding_expr(text_col: str = "text", dim: int = DEFAULT_DIM):
    """The md5 mock embedding as a PURE JVM Column — bit-identical to
    :func:`hash_embed_texts` but with no Python stage at all.

    The little-endian 8-byte md5 read mod 10000 is computed with
    modular arithmetic over the hex pairs (``sum(byte_i * (256^i mod
    10000)) mod 10000``) so nothing overflows int64; the division and
    float32 cast then match numpy's ``float32((h % 10000) / 10000.0)``
    IEEE-exactly.  Whole-stage codegen — ingest-time embedding costs no
    Python worker spin-up per stage, which dominates small mutation
    batches."""
    from pyspark.sql import functions as F

    h = F.md5(F.col(text_col))
    acc = F.lit(0).cast("long")
    for i in range(8):
        byte_i = F.conv(F.substring(h, 2 * i + 1, 2), 16, 10).cast("long")
        acc = acc + byte_i * F.lit(pow(256, i, 10000)).cast("long")
    val = ((acc % 10000) / F.lit(10000.0)).cast("float")
    return F.array_repeat(val, dim)


def with_embeddings(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "embedding",
    dim: int = DEFAULT_DIM,
    provider: Callable[[pd.Series], list[list[float]]] | None = None,
) -> DataFrame:
    """Append an embedding column, one provider call per Arrow batch.

    This is the ingest-time "batch embed" stage (reference M1
    ``library_service.py:121-140``); on a cluster each executor embeds
    its partitions independently — no shuffle, no driver round-trip.

    With the default (deterministic md5) provider the embedding is a
    pure JVM expression (:func:`hash_embedding_expr`) — no Python stage.
    A real model provider takes the Arrow-batched ``mapInPandas`` path.
    """
    if provider is None:
        from pyspark.sql import functions as F

        return df.withColumn(out_col, hash_embedding_expr(text_col, dim))
    fn = provider
    cols = df.columns

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            pdf = pdf.copy()
            pdf[out_col] = fn(pdf[text_col])
            yield pdf

    # programmatic schema (copy + add) — simpleString surgery breaks on
    # nested struct/map columns
    from pyspark.sql.types import ArrayType, FloatType, StructType

    schema = StructType(list(df.schema.fields)).add(out_col, ArrayType(FloatType()))
    out = df.mapInPandas(part, schema=schema)
    return out.select(*cols, out_col)


class EmbeddingCache:
    """Persisted text->embedding cache (reference ``embedding.py:16,50-56``
    as a table + join instead of a process dict).

    ``get_or_compute``: left-join the cache on md5(text); compute only
    the misses through the provider; append the new pairs.  At scale the
    cache is bucketed by ``text_hash`` so the join is shuffle-free on
    the cache side.
    """

    def __init__(self, path: str, dim: int = DEFAULT_DIM) -> None:
        self.path = path
        self.dim = dim

    def _read(self, spark) -> DataFrame:
        from pyspark.errors import AnalysisException

        try:
            cache = spark.read.parquet(self.path)
        except AnalysisException:  # cache not created yet (missing path
            # only — corruption must surface, not silently empty the cache)
            from inmem_vector_db_spark.functions.localframe import (
                literal_df,
            )

            # true empty LocalRelation (r14): foldable, zero tasks
            return literal_df(
                spark, [], "text_hash string, embedding array<float>"
            )
        # read-side dedup: concurrent/interleaved writers may append the
        # same text_hash twice; without this the left join would fan out
        # one output row per duplicate cache entry
        return cache.dropDuplicates(["text_hash"])

    def get_or_compute(
        self,
        df: DataFrame,
        text_col: str = "text",
        out_col: str = "embedding",
        provider: Callable[[pd.Series], list[list[float]]] | None = None,
    ) -> DataFrame:
        spark = df.sparkSession
        cache = self._read(spark)
        keyed = df.withColumn("__th", F.md5(F.col(text_col)))
        joined = keyed.join(
            F.broadcast(cache.withColumnsRenamed(
                {"text_hash": "__th", "embedding": "__cached"})),
            "__th",
            "left",
        )
        misses = joined.filter(F.col("__cached").isNull()).drop("__cached")
        hits = joined.filter(F.col("__cached").isNotNull()).withColumn(
            out_col, F.col("__cached")
        ).drop("__cached", "__th")
        if misses.isEmpty():
            return hits
        computed = with_embeddings(
            misses, text_col=text_col, out_col=out_col, dim=self.dim,
            provider=provider,
        )
        # persist the new pairs for the next job
        (computed.select(F.col("__th").alias("text_hash"), F.col(out_col).alias("embedding"))
         .dropDuplicates(["text_hash"])
         .write.mode("append").parquet(self.path))
        return hits.unionByName(computed.drop("__th"))
