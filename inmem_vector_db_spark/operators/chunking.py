"""Document -> chunk splitting (the ingest step upstream of the
reference's data model).

The reference receives pre-chunked text over REST (documents carry
chunk-ID lists, ``app/core/models/document.py:37-45``) — the chunking
itself happens client-side.  A 100 TB pipeline does it in-engine: split
every document into overlapping word-window chunks, one row per chunk,
entirely JVM-side (slice/sequence over the token array — no UDF), then
feed ``sources.embedding.with_embeddings`` and the LSH index build.

Chunk identity is (doc_id, chunk_idx) — deterministic, unlike uuid4 —
so re-running ingest is idempotent and the DuckDB oracle can reproduce
every row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_size: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split text into word windows of ``chunk_size`` with ``overlap``
    words shared between consecutive chunks (stride = size - overlap).

    Output: (id_col, chunk_idx int, chunk_text string, n_words int).
    The final window may be shorter; a trailing window fully contained
    in the previous one is not emitted (standard sliding-window rule:
    windows start at 0, stride, 2*stride, ... while start < n_words,
    except that any start >= n_words - overlap after the first yields
    only duplicate coverage — we keep the simple rule start < n_words).
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    t = F.split(F.col(text_col), " ")
    n = F.size(t)
    # starts: 0, stride, 2*stride, ... < n   (1-based for slice)
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(t, s + 1, chunk_size))
    )
    out = df.select(
        F.col(id_col),
        F.posexplode(chunks).alias("chunk_idx", "chunk_text"),
    ).filter(F.col("chunk_text") != "")
    return out.withColumn("n_words", F.size(F.split("chunk_text", " ")))
