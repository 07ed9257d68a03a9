"""Live embedding-API providers for the ``with_embeddings`` seam.

The reference's only real model integration is a Cohere ``embed`` call
with an in-process dict cache and batch fan-out
(``app/core/embedding.py:19-82``: check cache -> collect misses -> ONE
batched API call -> fill cache).  This module is that integration as a
Spark-shippable provider:

* :class:`RestEmbeddingProvider` is a picklable callable matching the
  ``provider`` contract of ``sources.embedding.with_embeddings`` /
  ``EmbeddingCache.get_or_compute`` (``pd.Series -> list[list[float]]``).
  It runs INSIDE the Arrow-batched ``mapInPandas`` stage, so each
  executor embeds its own partitions — ingest bandwidth scales with the
  cluster and the driver never proxies a single text.
* Reference cache semantics are preserved per executor: an in-process
  ``text -> vector`` dict (``embedding.py:16``) short-circuits repeat
  texts within and across batches on the same worker; the DURABLE
  cross-job cache is ``EmbeddingCache``'s parquet join, which this
  provider slots behind unchanged.
* Reference batch semantics are preserved exactly: within one call,
  duplicate texts are embedded once and fanned back out by position
  (``embedding.py:44-58``), and requests are chunked at the API's
  max-batch size (Cohere caps ``texts`` at 96).

Credentials come from an environment variable read AT CALL TIME on the
executor (never captured at plan-build time on the driver, so a key
rotation doesn't invalidate cached plans and the key is not baked into
serialized closures).  Without a key the provider raises — callers that
want offline determinism use the default md5 provider instead.  The
transport is injectable, so tests exercise batching/cache/retry logic
with a fake and CI never needs credentials.
"""

from __future__ import annotations

import json
import os
import time
import urllib.error
import urllib.request
from collections.abc import Callable

import pandas as pd

# Cohere's documented max texts per embed call; any REST backend with a
# different cap can pass its own.
DEFAULT_MAX_BATCH = 96

# transport contract: (texts, model, api_key) -> list of vectors, one
# per text, order-preserving
Transport = Callable[[list[str], str, str], list[list[float]]]


class EmbedContractError(ValueError):
    """The API answered successfully but violated the embed contract
    (wrong vector count for the batch).  Deterministic — retrying the
    same request cannot help, so the transport fails fast on it, unlike
    transient decode/network errors which retry with backoff."""


def _rest_transport(
    url: str, timeout: float, retries: int, backoff: float
) -> Transport:
    """Minimal stdlib POST transport for a Cohere-style ``/embed`` body:
    ``{"texts": [...], "model": ..., "input_type": "search_document",
    "embedding_types": ["float"]}`` -> ``{"embeddings": {"float": [...]}}``.
    Retries transient failures with exponential backoff; re-raises the
    last error so a dead endpoint fails the task (and Spark's task retry
    takes over) instead of silently dropping vectors."""

    def call(texts: list[str], model: str, api_key: str) -> list[list[float]]:
        body = json.dumps(
            {
                "texts": texts,
                "model": model,
                "input_type": "search_document",
                "embedding_types": ["float"],
            }
        ).encode()
        last: Exception | None = None
        for attempt in range(retries + 1):
            try:
                req = urllib.request.Request(
                    url,
                    data=body,
                    headers={
                        "Authorization": f"Bearer {api_key}",
                        "Content-Type": "application/json",
                    },
                )
                with urllib.request.urlopen(req, timeout=timeout) as resp:
                    payload = json.load(resp)
                emb = payload["embeddings"]
                vecs = emb["float"] if isinstance(emb, dict) else emb
                if len(vecs) != len(texts):
                    raise EmbedContractError(
                        f"embed API returned {len(vecs)} vectors "
                        f"for {len(texts)} texts"
                    )
                return [[float(x) for x in v] for v in vecs]
            except EmbedContractError:
                # deterministic contract violation — retry can't help.
                # (A dedicated type, NOT bare ValueError: json decode
                # errors subclass ValueError and a truncated body from a
                # network blip must reach the retry path below.)
                raise
            except urllib.error.HTTPError as e:
                if 400 <= e.code < 500 and e.code != 429:
                    raise  # auth/validation error: fail fast, no backoff
                last = e  # 429 / 5xx: transient, retry with backoff
                if attempt < retries:
                    time.sleep(backoff * (2**attempt))
            except Exception as e:  # noqa: BLE001 — network-ish: retry
                last = e
                if attempt < retries:
                    time.sleep(backoff * (2**attempt))
        raise last  # type: ignore[misc]

    return call


class RestEmbeddingProvider:
    """``provider`` callable for ``with_embeddings`` backed by a REST
    embedding API, with the reference's dedup-within-batch and
    in-process cache (``app/core/embedding.py:42-82``).

    >>> prov = RestEmbeddingProvider(model="embed-english-v3.0")
    >>> df = with_embeddings(docs, provider=prov)          # doctest: +SKIP

    Picklable: the instance ships to executors; the cache dict is
    rebuilt empty per worker (it is an optimization, not state), and the
    API key is re-read from ``api_key_env`` on the executor.
    """

    def __init__(
        self,
        model: str = "embed-english-v3.0",
        url: str = "https://api.cohere.ai/v1/embed",
        api_key_env: str = "EMBED_API_KEY",
        max_batch: int = DEFAULT_MAX_BATCH,
        use_cache: bool = True,
        timeout: float = 30.0,
        retries: int = 3,
        backoff: float = 1.0,
        transport: Transport | None = None,
    ) -> None:
        self.model = model
        self.url = url
        self.api_key_env = api_key_env
        self.max_batch = max_batch
        self.use_cache = use_cache
        self.timeout = timeout
        self.retries = retries
        self.backoff = backoff
        self._transport = transport
        self._cache: dict[str, list[float]] = {}
        self.calls = 0  # transport invocations (test/telemetry hook)

    # --- pickling: drop per-process state, keep configuration ---------
    def __getstate__(self):
        d = dict(self.__dict__)
        d["_cache"] = {}
        d["calls"] = 0
        return d

    def _resolve_transport(self) -> Transport:
        if self._transport is not None:
            return self._transport
        return _rest_transport(self.url, self.timeout, self.retries, self.backoff)

    def __call__(self, texts: "pd.Series") -> list[list[float]]:
        items = ["" if t is None else str(t) for t in texts]
        result: list[list[float] | None] = [None] * len(items)
        # cache pass + positional dedup of misses (reference
        # ``get_embeddings``: each distinct text embeds once per call)
        miss_index: dict[str, list[int]] = {}
        for i, t in enumerate(items):
            if self.use_cache and t in self._cache:
                result[i] = self._cache[t]
            else:
                miss_index.setdefault(t, []).append(i)
        if miss_index:
            api_key = os.environ.get(self.api_key_env, "")
            if not api_key and self._transport is None:
                raise OSError(
                    f"RestEmbeddingProvider: ${self.api_key_env} is not set "
                    "(use the default md5 provider for offline runs)"
                )
            transport = self._resolve_transport()
            distinct = list(miss_index)
            for lo in range(0, len(distinct), self.max_batch):
                chunk = distinct[lo : lo + self.max_batch]
                self.calls += 1
                vecs = transport(chunk, self.model, api_key)
                for t, v in zip(chunk, vecs):
                    if self.use_cache:
                        self._cache[t] = v
                    for i in miss_index[t]:
                        result[i] = v
        return result  # type: ignore[return-value]
