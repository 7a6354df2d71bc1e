"""Deduplication pipelines over Ray Data (exact, MinHash-LSH, SimHash).

The reference's only near-dup primitive is the ``minhash`` analyzer
(``core/analysis/minhash_token_stream.hpp:35-42``, num_hashes MinHash
over an inner analyzer's tokens); exact dedup corresponds to its
Replace/delete-then-insert update path. Here they are first-class
large-scale pipelines:

- exact:    hash(text) inside map_batches -> groupby(hash) -> first
            (shuffle moves only (hash, doc_id) + payload of group reps)
- minhash:  shingle -> K minhashes -> B bands -> groupby(band, value)
            -> candidate pairs (docs sharing any band bucket)
- simhash:  64-bit fingerprint, hamming-near candidates via 4x16-bit
            band buckets

All stages are vectorized per batch; stateful hash seeds live in the
actor (``__init__``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_M61 = np.uint64((1 << 61) - 1)


def _stable_hash(s: str) -> int:
    """Process-stable 64-bit string hash (builtin ``hash`` is salted per
    process, which would break determinism across Ray workers)."""
    h = 0xCBF29CE484222325
    for b in s.encode("utf-8"):
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h & 0x7FFFFFFFFFFFFFFF


def _hash_strings(arr: pa.Array) -> np.ndarray:
    """Vectorized 64-bit content hash of a string column (FNV-1a over
    utf8 bytes, done columnar via numpy on the flat buffer)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    # operate on the raw offsets/values buffers
    s = arr.cast(pa.large_binary())
    offsets = np.frombuffer(s.buffers()[1], dtype=np.int64)[s.offset : s.offset + len(s) + 1]
    data = np.frombuffer(s.buffers()[2], dtype=np.uint8)
    out = np.full(len(arr), np.uint64(0xCBF29CE484222325), dtype=np.uint64)
    # per-byte FNV is O(total bytes); loop over max string length would be
    # huge — instead hash with a polynomial rolling scheme over fixed-size
    # chunks: h = h*P + chunk for 8-byte words (vectorized per word index)
    lens = np.diff(offsets)
    nwords = (lens + 7) // 8
    P = np.uint64(1099511628211)
    maxw = int(nwords.max()) if len(nwords) else 0
    for w in range(maxw):
        act = nwords > w
        starts = offsets[:-1][act] + w * 8
        ends = np.minimum(starts + 8, offsets[1:][act])
        # gather up to 8 bytes as little-endian words
        word = np.zeros(act.sum(), dtype=np.uint64)
        for b in range(8):
            in_rng = starts + b < ends
            if not in_rng.any():
                break
            word[in_rng] |= data[starts[in_rng] + b].astype(np.uint64) << np.uint64(8 * b)
        out[act] = (out[act] * P) ^ word
    out ^= lens.astype(np.uint64)
    return out


def add_content_hash(batch: pa.Table, text_col: str = "text",
                     out_col: str = "content_hash") -> pa.Table:
    return batch.append_column(out_col, pa.array(_hash_strings(batch.column(text_col)).astype(np.int64)))


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Keep the lowest-id row per distinct text.

    Shuffle key is the 64-bit content hash (uniform — no skew); the
    groupby ships full rows, so at scale project to (hash, id) first,
    pick winners, then semi-join winners back (broadcast if small).
    """
    hashed = ds.map_batches(
        lambda t: add_content_hash(t, text_col), batch_format="pyarrow"
    )

    def first_per_group(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(id_col).head(1)

    return hashed.groupby("content_hash").map_groups(
        first_per_group, batch_format="pandas"
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


class MinHasher:
    """Stateful map_batches actor: per-doc MinHash signature + LSH bands.

    K num_hashes (reference minhash analyzer option), B bands of R rows
    (K = B*R). Output: one row per (doc, band) with the band bucket key —
    ready for ``groupby(["band", "band_key"])`` candidate generation.
    """

    def __init__(self, text_col: str = "text", id_col: str = "doc_id",
                 num_hashes: int = 64, bands: int = 16, shingle: int = 3,
                 seed: int = 7):
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.K = num_hashes
        self.B = bands
        self.R = num_hashes // bands
        self.shingle = shingle
        self.word = re.compile(r"[^\W_]+", re.UNICODE)
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _M61, size=self.K, dtype=np.uint64)
        self.b = rng.integers(0, _M61, size=self.K, dtype=np.uint64)

    def signature(self, texts: list[str]) -> np.ndarray:
        """(n_docs, K) uint64 MinHash signatures."""
        out = np.full((len(texts), self.K), np.iinfo(np.uint64).max, dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = self.word.findall((t or "").lower())
            if len(toks) < self.shingle:
                shingles = {" ".join(toks)} if toks else set()
            else:
                shingles = {
                    " ".join(toks[j : j + self.shingle])
                    for j in range(len(toks) - self.shingle + 1)
                }
            if not shingles:
                continue
            h = np.asarray([_stable_hash(s) for s in shingles], dtype=np.uint64)
            # K permutations: (a*h + b) mod M61, vectorized (S, K)
            v = (h[:, None] * self.a[None, :] + self.b[None, :]) % _M61
            out[i] = v.min(axis=0)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sig = self.signature(texts)
        # band key = hash of the R rows in the band
        band_keys = np.zeros((len(texts), self.B), dtype=np.int64)
        for b in range(self.B):
            seg = sig[:, b * self.R : (b + 1) * self.R]
            acc = np.zeros(len(texts), dtype=np.uint64)
            for r in range(self.R):
                acc = acc * np.uint64(1099511628211) ^ seg[:, r]
            band_keys[:, b] = acc.astype(np.int64)
        n = len(texts)
        return pa.table({
            self.id_col: pa.array(np.repeat(ids, self.B)),
            "band": pa.array(np.tile(np.arange(self.B), n)),
            "band_key": pa.array(band_keys.ravel()),
        })


def minhash_candidates(ds, text_col="text", id_col="doc_id",
                       num_hashes=64, bands=16, shingle=3, concurrency=None):
    """-> Dataset of (band, band_key, ids list) buckets with >= 2 docs.

    Candidate pairs are docs sharing any LSH bucket; verification
    (true Jaccard) is a follow-up map over candidate pairs.
    """
    if concurrency is None:
        concurrency = 4
    banded = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col,
                                   num_hashes=num_hashes, bands=bands,
                                   shingle=shingle),
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def bucket(g: pd.DataFrame) -> pd.DataFrame:
        # emit candidate pairs (rep = lowest id in the bucket); scalar
        # columns only — keeps the shuffled schema Arrow-friendly
        ids = sorted(set(g[id_col].tolist()))
        if len(ids) < 2:
            return pd.DataFrame({
                "band": pd.Series([], dtype="int64"),
                "band_key": pd.Series([], dtype="int64"),
                "rep_id": pd.Series([], dtype="int64"),
                "dup_id": pd.Series([], dtype="int64"),
            })
        return pd.DataFrame({
            "band": np.full(len(ids) - 1, g["band"].iloc[0], dtype=np.int64),
            "band_key": np.full(len(ids) - 1, g["band_key"].iloc[0], dtype=np.int64),
            "rep_id": np.full(len(ids) - 1, ids[0], dtype=np.int64),
            "dup_id": np.asarray(ids[1:], dtype=np.int64),
        })

    return banded.groupby(["band", "band_key"]).map_groups(bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


class SimHasher:
    """64-bit SimHash fingerprints (token-hash bit-vote), vectorized."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        import re

        self.text_col = text_col
        self.id_col = id_col
        self.word = re.compile(r"[^\W_]+", re.UNICODE)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        fps = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = self.word.findall((t or "").lower())
            if not toks:
                continue
            hs = np.asarray([_stable_hash(w) for w in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
            votes = 2 * bits.sum(axis=0).astype(np.int64) - len(toks)
            fps[i] = np.packbits((votes > 0).astype(np.uint8), bitorder="little").view(np.uint64)[0]
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "simhash": pa.array(fps.astype(np.int64)),
        })


def simhash_fingerprints(ds, text_col="text", id_col="doc_id", concurrency=4):
    return ds.map_batches(
        SimHasher,
        fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def embedding_near_dups(ds, threshold: float = 0.95, bits: int = 12,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        concurrency: int = 4):
    """Embedding-cosine near-duplicate pairs: hyperplane-LSH bucket the
    vectors (cosine-similar vectors collide with high probability), then
    verify cosine >= threshold inside each bucket with one matmul per
    group. -> Dataset(rep_id, dup_id, cosine).

    Scale: the shuffle key is the LSH bucket (uniform for random
    hyperplanes); in-bucket verification is O(bucket^2) — shrink
    buckets by raising ``bits``.
    """
    import pandas as pd

    from iresearch_ray.pipelines.ann import HyperplaneLSH, _to_matrix

    import pyarrow.parquet  # noqa: F401  (keep worker imports warm)

    # probe the vector dimension from the first block
    first = ds.take(1)[0]
    dim = len(first[vec_col])

    def with_bucket(batch: pa.Table) -> pa.Table:
        lsh = HyperplaneLSH(dim=dim, bits=bits, id_col=id_col, vec_col=vec_col)
        b = lsh(batch)
        return batch.append_column("bucket", b.column("bucket"))

    def verify(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"rep_id": pd.Series([], dtype="int64"),
                                 "dup_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        m = np.asarray(g[vec_col].tolist(), dtype=np.float64)
        norms = np.linalg.norm(m, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        sims = (m / norms) @ (m / norms).T
        ids = g[id_col].to_numpy()
        ii, jj = np.triu_indices(len(g), k=1)
        hit = sims[ii, jj] >= threshold
        return pd.DataFrame({
            "rep_id": np.minimum(ids[ii[hit]], ids[jj[hit]]),
            "dup_id": np.maximum(ids[ii[hit]], ids[jj[hit]]),
            "cosine": sims[ii, jj][hit],
        })

    bucketed = ds.map_batches(with_bucket, batch_format="pyarrow")
    return bucketed.groupby("bucket").map_groups(verify, batch_format="pandas")


def ngram_grams(s: str, n: int = 3) -> set:
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    """Character n-gram Jaccard similarity (verification kernel for
    near-dup candidates)."""
    sa, sb = ngram_grams(a, n), ngram_grams(b, n)
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


class NgramJaccardPairs:
    """map_batches actor: each batch's docs vs the broadcast full corpus
    -> (id_a < id_b, jaccard) pairs over threshold.

    This is the exhaustive O(n^2/P) block-pairwise layout (right side
    broadcast once via ray.put) used here as the oracle-checkable
    pipeline; at scale the candidate pairs come from MinHash-LSH buckets
    and this kernel only verifies them."""

    def __init__(self, corpus_ref, threshold: float = 0.8, n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        ids, texts = ray.get(corpus_ref) if not isinstance(corpus_ref, tuple) else corpus_ref
        self.n = n
        self.threshold = threshold
        self.text_col = text_col
        self.id_col = id_col
        self.all_ids = np.asarray(ids, dtype=np.int64)
        # gram vocabulary + binary incidence matrix of the broadcast side
        grams = [ngram_grams(t or "", n) for t in texts]
        self.vocab = {g: k for k, g in enumerate(
            sorted(set().union(*grams)) if grams else [])}
        self.B = np.zeros((len(texts), len(self.vocab)), dtype=np.float32)
        for r, gs in enumerate(grams):
            for g in gs:
                self.B[r, self.vocab[g]] = 1.0
        self.b_sizes = self.B.sum(axis=1)

    def _matrix(self, texts: list) -> tuple[np.ndarray, np.ndarray]:
        A = np.zeros((len(texts), len(self.vocab)), dtype=np.float32)
        extra = np.zeros(len(texts), dtype=np.float64)  # grams not in vocab
        for r, t in enumerate(texts):
            gs = ngram_grams(t or "", self.n)
            for g in gs:
                k = self.vocab.get(g)
                if k is None:
                    extra[r] += 1.0
                else:
                    A[r, k] = 1.0
        return A, extra

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(self.text_col).to_pylist()
        A, extra = self._matrix(texts)
        inter = A @ self.B.T  # (batch, corpus) shared-gram counts
        a_sizes = A.sum(axis=1) + extra
        union = a_sizes[:, None] + self.b_sizes[None, :] - inter
        union[union == 0] = 1.0
        sim = inter / union
        ii, jj = np.nonzero(sim >= self.threshold)
        keep = ids[ii] < self.all_ids[jj]  # each unordered pair once
        ii, jj = ii[keep], jj[keep]
        return pa.table({
            "id_a": pa.array(ids[ii], type=pa.int64()),
            "id_b": pa.array(self.all_ids[jj], type=pa.int64()),
            "jaccard": pa.array(sim[ii, jj].astype(np.float64)),
        })


def ngram_jaccard_pairs(ds, threshold: float = 0.8, n: int = 3,
                        text_col: str = "text", id_col: str = "doc_id",
                        concurrency: int = 2):
    """All unordered doc pairs with char-n-gram Jaccard >= threshold."""
    import ray

    pdf = ds.to_pandas()  # the broadcast side; callers keep this small
    ref = ray.put((pdf[id_col].tolist(), pdf[text_col].tolist()))
    return ds.map_batches(
        NgramJaccardPairs,
        fn_constructor_kwargs=dict(corpus_ref=ref, threshold=threshold, n=n,
                                   text_col=text_col, id_col=id_col),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
