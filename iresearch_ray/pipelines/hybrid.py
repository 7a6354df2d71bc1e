"""Hybrid retrieval: fuse lexical (BM25 top-k) and dense (ANN cosine
top-k) rankings with Reciprocal Rank Fusion.

RRF (Cormack, Clarke & Buettcher, SIGIR 2009): fused(d) = sum over
rankers r of 1 / (rrf_k + rank_r(d)), with rank 1-based and documents
absent from a list contributing nothing. rrf_k=60 is the paper's
constant. This is the standard hybrid-search merge (Elasticsearch /
OpenSearch / Vespa expose exactly this shape) and is k-bounded: each
input is a top-k list, so fusion is O(R*k) regardless of corpus size —
at cluster scale the per-shard top-k lists reduce to global top-k
first (the sharded searcher's existing merge), then fuse here.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def rrf_fuse(ranked_ids: list[np.ndarray], k: int = 20,
             rrf_k: int = 60, id_col: str = "doc_id") -> pd.DataFrame:
    """Fuse rank-ordered id arrays -> top-``k`` (id, rrf) frame.

    Each input array must already be in rank order (best first); ids
    are int64. Ties in the fused score break by id ascending, so the
    output is deterministic for any push/merge order upstream.
    """
    arrs = [np.asarray(a, dtype=np.int64) for a in ranked_ids if len(a)]
    if not arrs:
        return pd.DataFrame({id_col: np.empty(0, dtype=np.int64),
                             "rrf": np.empty(0, dtype=np.float64)})
    all_ids = np.unique(np.concatenate(arrs))
    score = np.zeros(all_ids.size, dtype=np.float64)
    for ids in arrs:
        idx = np.searchsorted(all_ids, ids)
        score[idx] += 1.0 / (rrf_k + 1.0 + np.arange(ids.size,
                                                     dtype=np.float64))
    order = np.lexsort((all_ids, -score))[:k]
    return pd.DataFrame({id_col: all_ids[order], "rrf": score[order]})
