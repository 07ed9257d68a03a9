"""Result diversification: Maximal Marginal Relevance (MMR) re-ranking.

Beyond-reference search-quality operator (Carbonell & Goldstein, SIGIR
1998): after a kNN retrieval, greedily pick results that balance
relevance against redundancy —

    MMR(d) = lam * rel(d) - (1 - lam) * max_{s in S} sim(d, s)

where S is the already-selected set.  The greedy loop is inherently
sequential in k, but k is tiny (5-20) and the loop runs over ONE
query's candidate list — so the distributed shape is ``applyInPandas``
per query group: every query's re-rank is an independent task, the
cluster parallelizes across queries, and per-task work is O(N_cand^2)
on a list that retrieval already capped (e.g. top-50).  Nothing is
quadratic in corpus size and the driver never sees candidate vectors.

Determinism: argmax ties break toward the smaller id (same (score, id)
lexicographic rule as the kNN operators), so the selection is exactly
reproducible and the DuckDB oracle can replay the greedy loop as an
unrolled CTE chain.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_id_col: str = "query_id",
    id_col: str = "vec_id",
    rel_col: str = "rel",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy MMR over each query's candidate set.

    ``candidates``: one row per (query, candidate) with a relevance
    score (higher = better; for cosine retrieval pass ``1 - dist``) and
    the candidate vector.  Returns (query_id, rank, id, mmr_score) with
    rank 1..k in selection order; ``mmr_score`` is the value the item
    was selected at, rounded to 6 dp (score of rank 1 = lam * rel).
    """
    if k <= 0:
        raise ValueError("k must be > 0")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")

    qt = candidates.schema[query_id_col].dataType.simpleString()
    it = candidates.schema[id_col].dataType.simpleString()
    out_schema = f"{query_id_col} {qt}, rank int, {id_col} {it}, mmr_score double"

    def one(pdf: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
        ids = pdf[id_col].to_numpy()
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        n = len(ids)
        norms = np.linalg.norm(mat, axis=1)
        denom = norms[:, None] * norms[None, :]
        with np.errstate(divide="ignore", invalid="ignore"):
            sims = (mat @ mat.T) / denom
        sims = np.where(denom == 0.0, 0.0, sims)

        chosen: list[int] = []
        scores: list[float] = []
        for _ in range(min(k, n)):
            maxsim = sims[:, chosen].max(axis=1) if chosen else np.zeros(n)
            score = lam * rel - (1.0 - lam) * maxsim
            for idx in np.lexsort((ids, -score)):
                if idx not in chosen:
                    break
            chosen.append(int(idx))
            scores.append(float(score[idx]))
        return pd.DataFrame(
            {
                query_id_col: pdf[query_id_col].iloc[0],
                "rank": np.arange(1, len(chosen) + 1, dtype=np.int32),
                id_col: ids[chosen],
                "mmr_score": np.round(scores, 6),
            }
        )

    return candidates.groupBy(query_id_col).applyInPandas(one, schema=out_schema)
