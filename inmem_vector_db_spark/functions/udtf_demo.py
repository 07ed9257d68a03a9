"""Python UDTF surface (SURVEY.md 2.10 — the one extension shape not
otherwise exercised).

``SentenceSplitter`` is a table function: one text row in, one row per
sentence out, with positions.  NOTE the engine's production splitters
(``operators.chunking``, ``functions.text.word_shingles``) are JVM
expressions — a Python UDTF is row-at-a-time and belongs only where
per-row Python logic is genuinely required (custom tokenizers, model
calls); this module exists to pin the registration surface and its
semantics, not as a hot-path operator.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_chars int")
class SentenceSplitter:
    """split on '.', '!', '?' runs; emits trimmed non-empty sentences."""

    def eval(self, text: str):  # noqa: D102
        if text is None:
            return
        import re

        parts = re.split(r"[.!?]+", text)
        idx = 0
        for p in parts:
            p = p.strip()
            if p:
                yield idx, p, len(p)
                idx += 1


def register(spark) -> None:
    """Make the UDTF callable from SQL: ``SELECT * FROM
    sentence_splitter(<text expr>)``."""
    spark.udtf.register("sentence_splitter", SentenceSplitter)
