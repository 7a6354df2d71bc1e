"""Distributed batch query serving: an actor pool of query sessions.

The reference runs query batches on a thread pool over an mmap'd index
with OS page cache (``utils/index-search.cpp:672-691``); the Ray-native
form is ``from_items(queries).map_batches(QuerySession, concurrency=N)``
— each actor opens the manifest once in ``__init__`` and amortizes
segment caches (term dictionaries, norms) across the queries it serves.
At cluster scale, actors can instead pin segment *shards* (consistent
hashing of segment -> actor) and each query fans out to all shards; on a
single node the per-actor full-index session is the faster layout
(no fan-out latency, queries are the parallelism unit).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from iresearch_ray.search.parser import parse_query
from iresearch_ray.search.searcher import IndexSearcher


class QuerySession:
    """map_batches actor: rows (qid, query) -> rows (qid, rank, doc_id,
    score). Index state is opened once per actor."""

    def __init__(self, index_dir: str, k: int = 100, scorer: str = "bm25",
                 mode: str = "strict"):
        self.searcher = IndexSearcher(index_dir)
        self.k = k
        self.scorer = scorer
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        qids, ranks, docs, scores = [], [], [], []
        for qid, qtext in zip(
            batch.column("qid").to_pylist(), batch.column("query").to_pylist()
        ):
            flt = parse_query(qtext)
            res = self.searcher.search(flt, k=self.k, scorer=self.scorer,
                                       mode=self.mode)
            n = len(res)
            qids.append(np.full(n, qid, dtype=object))
            ranks.append(np.arange(n, dtype=np.int64))
            docs.append(res["doc_id"].to_numpy())
            scores.append(res["score"].to_numpy().astype(np.float64))
        if not qids:
            return pa.table({"qid": pa.array([], type=pa.string()),
                             "rank": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64()),
                             "score": pa.array([], type=pa.float64())})
        return pa.table({
            "qid": pa.array(np.concatenate(qids), type=pa.string()),
            "rank": pa.array(np.concatenate(ranks)),
            "doc_id": pa.array(np.concatenate(docs)),
            "score": pa.array(np.concatenate(scores)),
        })


def search_batch(index_dir: str, queries: list[tuple[str, str]], k: int = 100,
                 scorer: str = "bm25", mode: str = "strict",
                 concurrency: int = 4) -> "ray.data.Dataset":
    """Run a query batch through the actor pool -> Dataset(qid, rank,
    doc_id, score)."""
    ds = ray.data.from_items([{"qid": q, "query": t} for q, t in queries])
    return ds.map_batches(
        QuerySession,
        fn_constructor_kwargs=dict(index_dir=index_dir, k=k, scorer=scorer, mode=mode),
        batch_format="pyarrow",
        batch_size=max(1, len(queries) // max(1, concurrency)),
        concurrency=concurrency,
    )
