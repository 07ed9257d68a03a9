"""RestEmbeddingProvider: reference batch+cache semantics
(``app/core/embedding.py:42-82``) with a fake transport — CI never needs
credentials; the one live test is skipped unless $EMBED_API_KEY is set."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from inmem_vector_db_spark.sources.embedding import (
    EmbeddingCache,
    with_embeddings,
)
from inmem_vector_db_spark.sources.providers import RestEmbeddingProvider


def fake_transport(log: list):
    def call(texts, model, api_key):
        log.append(list(texts))
        return [[float(len(t)), 1.0] for t in texts]

    return call


def test_dedup_within_batch_and_positional_fanout():
    log: list = []
    prov = RestEmbeddingProvider(transport=fake_transport(log))
    out = prov(pd.Series(["aa", "b", "aa", "ccc", "b"]))
    # every position filled, duplicates share the vector
    assert out == [[2.0, 1.0], [1.0, 1.0], [2.0, 1.0], [3.0, 1.0], [1.0, 1.0]]
    # the API saw each distinct text exactly once (reference embed dedup)
    assert log == [["aa", "b", "ccc"]]


def test_in_process_cache_short_circuits_repeat_calls():
    log: list = []
    prov = RestEmbeddingProvider(transport=fake_transport(log))
    prov(pd.Series(["x", "y"]))
    prov(pd.Series(["y", "x", "z"]))  # only z is new
    assert log == [["x", "y"], ["z"]]
    prov_nc = RestEmbeddingProvider(transport=fake_transport(log), use_cache=False)
    prov_nc(pd.Series(["x"]))
    prov_nc(pd.Series(["x"]))  # use_cache=False re-embeds (reference flag)
    assert log[-2:] == [["x"], ["x"]]


def test_max_batch_chunking():
    log: list = []
    prov = RestEmbeddingProvider(transport=fake_transport(log), max_batch=2)
    prov(pd.Series(["a", "bb", "ccc", "dddd", "eeeee"]))
    assert [len(c) for c in log] == [2, 2, 1]
    assert prov.calls == 3


def test_missing_api_key_raises():
    prov = RestEmbeddingProvider(api_key_env="THIS_ENV_IS_NOT_SET_12345")
    with pytest.raises(OSError, match="THIS_ENV_IS_NOT_SET_12345"):
        prov(pd.Series(["hello"]))


def test_pickle_drops_worker_state():
    import pickle

    # std-pickle path (transport=None is what ships in production; fake
    # closures only pickle under cloudpickle, which is what Spark uses)
    prov = RestEmbeddingProvider(max_batch=7)
    prov._cache["warm"] = [1.0]
    prov.calls = 3
    clone = pickle.loads(pickle.dumps(prov))
    assert clone.max_batch == 7 and clone._cache == {} and clone.calls == 0


def test_with_embeddings_spark_integration(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "alpha")], "id long, text string"
    )
    prov = RestEmbeddingProvider(transport=fake_transport([]))
    got = {
        r["id"]: r["emb"]
        for r in with_embeddings(df, out_col="emb", provider=prov).collect()
    }
    assert got[1] == [5.0, 1.0] and got[2] == [4.0, 1.0] and got[1] == got[3]


def test_embedding_cache_hit_join_skips_provider(spark, tmp_path):
    """Reference cache-hit semantics at the durable layer: a second run
    over the same texts must be served by the parquet join with ZERO
    provider traffic."""
    path = str(tmp_path / "emb_cache")
    df = spark.createDataFrame(
        [(1, "doc one"), (2, "doc two")], "id long, text string"
    )
    cache = EmbeddingCache(path, dim=2)
    first = cache.get_or_compute(
        df, provider=RestEmbeddingProvider(transport=fake_transport([]))
    ).collect()
    assert len(first) == 2
    assert {tuple(r["embedding"]) for r in first} == {(7.0, 1.0)}

    class Exploding:
        def __call__(self, texts):  # pragma: no cover — must not run
            raise AssertionError("provider called on a full cache hit")

    second = {
        r["id"]: r["embedding"]
        for r in cache.get_or_compute(df, provider=Exploding()).collect()
    }
    assert second == {r["id"]: r["embedding"] for r in first}


@pytest.mark.skipif(
    not os.environ.get("EMBED_API_KEY"),
    reason="live embed API test needs $EMBED_API_KEY",
)
def test_live_api_smoke():  # pragma: no cover — credentialed envs only
    prov = RestEmbeddingProvider()
    vecs = prov(pd.Series(["hello world"]))
    assert len(vecs) == 1 and len(vecs[0]) > 0
