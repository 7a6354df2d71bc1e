"""Similarity search over embedding columns (brute-force + LSH-bucketed).

Brute-force cosine top-k: the query matrix is broadcast once via
``ray.put`` and every ``map_batches`` task does one numpy matmul per
batch against it — per-segment local top-k rows, then a tiny global
``sort.limit`` (same shape as the BM25 top-k merge). The LSH variant
buckets vectors by random-hyperplane signs so at scale only matching
buckets are scanned.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1)


class CosineTopK:
    """map_batches actor: local cosine top-k per batch vs broadcast queries."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding"):
        q = ray.get(queries_ref) if not isinstance(queries_ref, np.ndarray) else queries_ref
        self.q = q / np.linalg.norm(q, axis=1, keepdims=True)  # (Q, D)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(self.vec_col))
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ self.q.T  # (N, Q)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        out_q, out_id, out_sim = [], [], []
        for qi in range(self.q.shape[0]):
            s = sims[:, qi]
            if s.size > self.k:
                part = np.argpartition(-s, self.k)[: self.k]
            else:
                part = np.arange(s.size)
            out_q.append(np.full(part.size, qi, dtype=np.int64))
            out_id.append(ids[part])
            out_sim.append(s[part])
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            self.id_col: pa.array(np.concatenate(out_id)),
            "cosine": pa.array(np.concatenate(out_sim)),
        })


def cosine_topk(ds, queries: np.ndarray, k: int = 10, id_col: str = "vec_id",
                vec_col: str = "embedding", concurrency: int = 4):
    """Global cosine top-k per query row of ``queries`` (Q, D).

    -> pandas DataFrame (query_id, id_col, cosine) with exactly k rows
    per query, ordered cosine desc then id asc.
    """
    ref = ray.put(np.asarray(queries, dtype=np.float64))
    local = ds.map_batches(
        CosineTopK,
        fn_constructor_kwargs=dict(queries_ref=ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    # tiny result: Q * k * n_blocks rows -> driver merge
    pdf = local.to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", id_col],
                          ascending=[True, False, True], kind="mergesort")
    return pdf.groupby("query_id", as_index=False).head(k).reset_index(drop=True)


class HyperplaneLSH:
    """Random-hyperplane signature (B bits) per vector — the bucketed
    scale path: group by signature, scan only the query's bucket (and
    neighbors at hamming distance <= r for recall)."""

    def __init__(self, dim: int, bits: int = 16, seed: int = 11,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, bits))
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch.column(self.vec_col))
        signs = (m @ self.planes) > 0  # (N, bits)
        sig = np.zeros(m.shape[0], dtype=np.int64)
        for b in range(self.planes.shape[1]):
            sig |= signs[:, b].astype(np.int64) << b
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "bucket": pa.array(sig),
        })


def lsh_buckets(ds, dim: int, bits: int = 16, id_col="vec_id",
                vec_col="embedding", concurrency: int = 4):
    return ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs=dict(dim=dim, bits=bits, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def lsh_cosine_topk(ds, queries: np.ndarray, k: int = 10, bits: int = 12,
                    hamming_radius: int = 2, id_col: str = "vec_id",
                    vec_col: str = "embedding", seed: int = 11,
                    concurrency: int = 4):
    """Approximate cosine top-k: scan only vectors whose hyperplane
    signature is within ``hamming_radius`` of the query's signature —
    the bucketed scale path (brute-force ``cosine_topk`` is the exact
    baseline; recall grows with the radius and shrinks with ``bits``).

    The bucket filter runs inside ``map_batches`` (signature matmul +
    popcount per batch), so only candidate rows reach the scoring
    matmul — at 10^9+ vectors the non-candidates never leave the read
    stage.
    """
    q = np.asarray(queries, dtype=np.float64)
    dim = q.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, bits))
    q_sig_bits = (q @ planes) > 0  # (Q, bits)

    class FilteredTopK(CosineTopK):
        def __init__(self, queries_ref):
            super().__init__(queries_ref, k=k, id_col=id_col, vec_col=vec_col)
            self.planes = planes
            self.q_sig = q_sig_bits

        def __call__(self, batch: pa.Table) -> pa.Table:
            m = _to_matrix(batch.column(vec_col))
            sig = (m @ self.planes) > 0  # (N, bits)
            # hamming distance to every query signature
            ham = (sig[:, None, :] != self.q_sig[None, :, :]).sum(axis=2)
            cand = (ham <= hamming_radius).any(axis=1)
            if not cand.any():
                return pa.table({"query_id": pa.array([], type=pa.int64()),
                                 id_col: pa.array([], type=pa.int64()),
                                 "cosine": pa.array([], type=pa.float64())})
            idx = np.flatnonzero(cand)
            return super().__call__(batch.take(pa.array(idx)))

    import ray as _ray

    ref = _ray.put(q)
    local = ds.map_batches(
        FilteredTopK,
        fn_constructor_kwargs=dict(queries_ref=ref),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pdf = local.to_pandas()
    pdf = pdf.sort_values(["query_id", "cosine", id_col],
                          ascending=[True, False, True], kind="mergesort")
    return pdf.groupby("query_id", as_index=False).head(k).reset_index(drop=True)
