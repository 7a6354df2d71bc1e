"""Percolation — registered queries matched against a document STREAM
(the Elasticsearch percolator / Lucene Monitor analogue;
beyond-reference: the reference only runs ad-hoc queries against a
built index, never a stored query set against incoming docs). The use
case at pipeline scale is routing/tagging: thousands of standing
queries (topic rules, alert rules, collection filters) applied to every
incoming document exactly once.

Ray-Data-first shape: the compiled query set is tiny and IMMUTABLE, so
it ships once per actor via the constructor (the broadcast pattern);
documents stream through ``map_batches`` with NO shuffle — each batch
is tokenized once into a columnar (doc_idx, term, pos) table and every
query is evaluated against that table with numpy set/positional
kernels (the same evaluation the ES percolator does against its
single-doc in-memory index, vectorized across the whole batch).

Supported query nodes (a documented subset of the filter AST —
evaluation here is index-free, so only structural predicates qualify):
``Term``, ``Prefix``, ``And``, ``Or`` (incl. ``min_match``), ``Not``
and fixed ``Phrase``. Anything else raises at compile time.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa


class PercolateBatch:
    """map_batches actor: queries compiled once per actor in
    ``__init__`` (stateful-analyzer actor-pool shape), batch
    percolation in ``__call__`` -> (id_col, query_id) pairs."""

    def __init__(self, queries: dict, text_col: str = "text",
                 id_col: str = "doc_id"):
        from iresearch_ray.analysis.analyzers import SegmentationAnalyzer

        self.text_col = text_col
        self.id_col = id_col
        self.an = SegmentationAnalyzer()
        # compile-time validation: reject nodes this index-free
        # evaluator cannot honor, so misuse fails at registration.
        # Dispatch is on the node CLASS NAME, not isinstance — query
        # ASTs cross the actor boundary through cloudpickle, which may
        # serialize driver-side dataclasses by value, breaking class
        # identity against the worker's own filters import.
        def check(n):
            kind = type(n).__name__
            if kind in ("Term", "Prefix"):
                return
            if kind == "Not":
                check(n.filter)
                return
            if kind in ("And", "Or"):
                for c in n.filters:
                    check(c)
                return
            if kind == "Phrase":
                if n.gaps is not None or not all(
                        isinstance(t, str) for t in n.terms):
                    raise ValueError(
                        "percolator phrases must be fixed term lists")
                return
            raise ValueError(f"unsupported percolator node: {kind}")

        from iresearch_ray.search.parser import parse_query

        compiled = {qid: (parse_query(q) if isinstance(q, str) else q)
                    for qid, q in queries.items()}
        for q in compiled.values():
            check(q)
        self.queries = compiled

    # -- per-batch kernels -------------------------------------------------

    def _term_docs(self, code: int) -> np.ndarray:
        m = self._codes == code
        out = np.zeros(self._n, dtype=bool)
        out[self._doc_idx[m]] = True
        return out

    def _eval(self, node) -> np.ndarray:
        kind = type(node).__name__
        if kind == "Term":
            i = np.searchsorted(self._vocab, node.term)
            if i >= self._vocab.size or self._vocab[i] != node.term:
                return np.zeros(self._n, dtype=bool)
            return self._term_docs(i)
        if kind == "Prefix":
            from iresearch_ray.search.filters import _prefix_successor

            lo = np.searchsorted(self._vocab, node.prefix)
            hi_key = _prefix_successor(node.prefix)
            hi = (np.searchsorted(self._vocab, hi_key)
                  if hi_key is not None else self._vocab.size)
            if hi <= lo:
                return np.zeros(self._n, dtype=bool)
            m = (self._codes >= lo) & (self._codes < hi)
            out = np.zeros(self._n, dtype=bool)
            out[self._doc_idx[m]] = True
            return out
        if kind == "Not":
            return ~self._eval(node.filter)
        if kind == "And":
            pos = [c for c in node.filters if type(c).__name__ != "Not"]
            neg = [c.filter for c in node.filters
                   if type(c).__name__ == "Not"]
            out = np.ones(self._n, dtype=bool)
            for c in pos:
                out &= self._eval(c)
            for c in neg:
                out &= ~self._eval(c)
            return out
        if kind == "Or":
            mm = max(1, int(node.min_match))
            if mm == 1:
                out = np.zeros(self._n, dtype=bool)
                for c in node.filters:
                    out |= self._eval(c)
                return out
            cnt = np.zeros(self._n, dtype=np.int32)
            for c in node.filters:
                cnt += self._eval(c)
            return cnt >= mm
        if kind == "Phrase":
            # positional chain over (doc << 32 | pos) keys, already
            # sorted because tokenize emits doc-major increasing pos
            keys = []
            for t in node.terms:
                i = np.searchsorted(self._vocab, t)
                if i >= self._vocab.size or self._vocab[i] != t:
                    return np.zeros(self._n, dtype=bool)
                m = self._codes == i
                keys.append(self._keys[m])
            cur = keys[0]
            for step, k in enumerate(keys[1:], start=1):
                if cur.size == 0 or k.size == 0:
                    cur = cur[:0]
                    break
                want = cur + np.int64(step)
                idx = np.searchsorted(k, want)
                ok = idx < k.size
                ok[ok] = k[idx[ok]] == want[ok]
                cur = cur[ok]
            out = np.zeros(self._n, dtype=bool)
            if cur.size:
                out[(cur >> np.int64(32)).astype(np.int64)] = True
            return out
        raise AssertionError("unreachable: validated at compile time")

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch.column(self.id_col)
        self._n = len(texts)
        doc_idx, terms, pos = self.an.tokenize(texts)
        self._doc_idx = doc_idx
        if doc_idx.size:
            if isinstance(terms, (pa.Array, pa.ChunkedArray)):
                terms = terms.to_numpy(zero_copy_only=False)
            self._vocab, self._codes = np.unique(
                np.asarray(terms), return_inverse=True)
        else:
            self._vocab = np.empty(0, dtype=object)
            self._codes = np.empty(0, dtype=np.int64)
        self._keys = (doc_idx.astype(np.int64) << np.int64(32)) \
            | pos.astype(np.int64)
        out_ids, out_qids = [], []
        for qid, node in self.queries.items():
            hit = np.flatnonzero(self._eval(node))
            if hit.size:
                out_ids.append(ids.take(pa.array(hit)))
                out_qids.append(np.repeat(str(qid), hit.size))
        if not out_ids:
            return pa.table({
                self.id_col: pa.array([], type=ids.type),
                "query_id": pa.array([], type=pa.string()),
            })
        return pa.table({
            self.id_col: pa.concat_arrays(
                [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a
                 for a in out_ids]),
            "query_id": pa.array(
                np.concatenate([np.asarray(q, dtype=object)
                                for q in out_qids]), type=pa.string()),
        })


def percolate(ds, queries: dict, text_col: str = "text",
              id_col: str = "doc_id", concurrency: int = 4):
    """Dataset[docs] x {query_id: Filter} -> Dataset[(id_col,
    query_id)] — one row per (document, matching registered query).
    Queries ship once per actor; zero shuffle; output order follows
    the input stream (sort downstream if determinism is needed)."""
    return ds.map_batches(
        PercolateBatch,
        fn_constructor_kwargs=dict(queries=queries, text_col=text_col,
                                   id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
