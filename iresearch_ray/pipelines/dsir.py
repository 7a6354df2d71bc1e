"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023, arXiv:2302.03169) over Ray Data. No analogue in the
reference engine (its nearest primitive is the term-frequency collector,
``core/search/term_filter.cpp``); this is the standard pretraining-data
curation stage: score every raw document by how target-like its hashed
n-gram distribution is, then keep the top of the importance ranking.

Three streaming stages, none of which materializes the corpus:

1. **fit** — one ``map_batches`` pass emits per-block PARTIAL hashed
   bucket counts ``(bucket, tgt_c, raw_c)`` (pre-aggregated per block:
   at most ``n_buckets`` rows cross the exchange per block, regardless
   of block row count), reduced by one tiny ``groupby("bucket").sum``.
   Features are hashed unigrams + bigrams over the segmentation
   analyzer's tokens, folded into ``n_buckets`` buckets — the fixed
   feature space is what makes this scale: the model is ``n_buckets``
   floats no matter how big the corpus is.
2. **score** — the per-bucket log-likelihood ratio
   ``ln p_tgt(b) - ln p_raw(b)`` (add-one smoothed) is broadcast once
   via ``ray.put``; an actor pool fetches it in ``__init__`` and scores
   each doc as the sum of ratios over its feature occurrences (one
   ``np.bincount`` per batch — the bag-of-hashed-ngrams inner product).
3. **select** — deterministic top-k (per-batch combiner prune to k,
   then one k-bounded sort), or Gumbel-noise importance RESAMPLING
   (the paper's sampling-without-replacement form) with the noise
   derived from a seeded hash of the doc id so runs are reproducible
   across cluster sizes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.pipelines.dedup import _FNV_P, _hash_strings

_U64 = np.uint64


def _dsir_features(texts, n_buckets: int) -> tuple[np.ndarray, np.ndarray]:
    """-> (doc_idx, bucket) for every hashed unigram AND bigram
    occurrence, doc-major. Unigram hash = columnar string hash of the
    token; bigram hash = ``h1 * FNV_P ^ h2`` over two consecutive token
    hashes within one doc (same rolling polynomial as the shingle
    kernels); bucket = hash mod ``n_buckets``."""
    from iresearch_ray.analysis.analyzers import SegmentationAnalyzer

    an = _dsir_features._an
    if an is None:
        an = _dsir_features._an = SegmentationAnalyzer()
    doc_idx, terms, _pos = an.tokenize(texts)
    if doc_idx.size == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    h = _hash_strings(terms)
    same = doc_idx[:-1] == doc_idx[1:]
    bi = (h[:-1] * _FNV_P) ^ h[1:]
    doc_all = np.concatenate([doc_idx, doc_idx[:-1][same]])
    h_all = np.concatenate([h, bi[same]])
    return doc_all, h_all % _U64(n_buckets)


_dsir_features._an = None


def _partial_bucket_counts(batch: pa.Table, text_col: str,
                           target_col: str, target_value: str,
                           n_buckets: int) -> pa.Table:
    doc_idx, buckets = _dsir_features(batch.column(text_col), n_buckets)
    if doc_idx.size == 0:
        z = pa.array([], type=pa.int64())
        return pa.table({"bucket": z, "tgt_c": z, "raw_c": z})
    import pyarrow.compute as pc

    is_tgt = pc.fill_null(pc.equal(batch.column(target_col), target_value),
                          False)
    tgt_mask = is_tgt.combine_chunks().to_numpy(zero_copy_only=False)
    tgt_mask = np.asarray(tgt_mask, dtype=bool)[doc_idx]
    raw = np.bincount(buckets.astype(np.int64), minlength=n_buckets)
    tgt = np.bincount(buckets[tgt_mask].astype(np.int64),
                      minlength=n_buckets)
    nz = np.flatnonzero(raw)
    return pa.table({"bucket": pa.array(nz.astype(np.int64)),
                     "tgt_c": pa.array(tgt[nz].astype(np.int64)),
                     "raw_c": pa.array(raw[nz].astype(np.int64))})


def fit_dsir(ds, text_col: str = "text", target_col: str = "lang",
             target_value: str = "en", n_buckets: int = 4096) -> np.ndarray:
    """Fit the hashed bag-of-ngrams importance model: returns the
    per-bucket log-likelihood-ratio vector (float64, len n_buckets)
    ``ln((tgt_b+1)/(sum_tgt+B)) - ln((raw_b+1)/(sum_raw+B))``.

    The target distribution is estimated from the rows where
    ``target_col == target_value`` (at real scale: a curated seed set —
    pass a pre-filtered dataset and a constant-true column instead)."""
    counts = (
        ds.map_batches(_partial_bucket_counts, batch_format="pyarrow",
                       fn_kwargs={"text_col": text_col,
                                  "target_col": target_col,
                                  "target_value": target_value,
                                  "n_buckets": n_buckets})
        .groupby("bucket").sum(["tgt_c", "raw_c"])
        .to_pandas()
    )
    tcol = "sum(tgt_c)" if "sum(tgt_c)" in counts.columns else "tgt_c"
    rcol = "sum(raw_c)" if "sum(raw_c)" in counts.columns else "raw_c"
    tgt = np.zeros(n_buckets, dtype=np.float64)
    raw = np.zeros(n_buckets, dtype=np.float64)
    b = counts["bucket"].to_numpy()
    tgt[b] = counts[tcol].to_numpy()
    raw[b] = counts[rcol].to_numpy()
    st, sr = tgt.sum(), raw.sum()
    return (np.log((tgt + 1.0) / (st + n_buckets))
            - np.log((raw + 1.0) / (sr + n_buckets)))


class DsirScorer:
    """Actor-pool scorer: the ratio vector is fetched once per actor
    (pass a ``ray.ObjectRef`` from ``ray.put(fit_dsir(...))``)."""

    def __init__(self, ratio, n_buckets: int = 4096,
                 text_col: str = "text", id_col: str = "doc_id"):
        import ray

        if isinstance(ratio, ray.ObjectRef):
            ratio = ray.get(ratio)
        self.ratio = np.asarray(ratio, dtype=np.float64)
        self.n_buckets = n_buckets
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_idx, buckets = _dsir_features(batch.column(self.text_col),
                                          self.n_buckets)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        n = len(batch)
        logw = np.bincount(doc_idx,
                           weights=self.ratio[buckets.astype(np.int64)],
                           minlength=n)
        cnt = np.bincount(doc_idx, minlength=n)
        docs = np.flatnonzero(cnt > 0)
        return pa.table({
            self.id_col: pa.array(ids[docs].astype(np.int64)),
            "n_feats": pa.array(cnt[docs].astype(np.int64)),
            "logw": pa.array(logw[docs]),
        })


def dsir_scores(ds, ratio_ref, n_buckets: int = 4096,
                text_col: str = "text", id_col: str = "doc_id",
                concurrency=None):
    """Dataset[(id, n_feats, logw)] for docs with >= 1 feature.
    ``concurrency=None`` -> elastic pool up to CPUs - 2 (a fixed pool
    equal to the session CPUs starves the read stage)."""
    from iresearch_ray.pipelines.decontam import _auto_concurrency

    concurrency = _auto_concurrency(concurrency)
    return ds.map_batches(
        DsirScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"ratio": ratio_ref, "n_buckets": n_buckets,
                               "text_col": text_col, "id_col": id_col})


def _local_topk(batch: pa.Table, k: int, key: str,
                id_col: str) -> pa.Table:
    """Combiner: prune each block to its k best rows before the
    k-bounded global sort (ties by id ascending)."""
    if len(batch) <= k:
        return batch
    df = batch.to_pandas()
    df = df.sort_values([key, id_col], ascending=[False, True]).head(k)
    return pa.Table.from_pandas(df, preserve_index=False)


def dsir_topk(scored, k: int = 100, key: str = "logw",
              id_col: str = "doc_id") -> pd.DataFrame:
    """Deterministic importance TOP-K: per-block combiner prune, then
    one driver-side sort over <= k * n_blocks survivors (k-bounded —
    never the corpus)."""
    pdf = (scored.map_batches(_local_topk, batch_format="pyarrow",
                              fn_kwargs={"k": k, "key": key,
                                         "id_col": id_col})
           .to_pandas())
    pdf = pdf.sort_values([key, id_col], ascending=[False, True]).head(k)
    return pdf.reset_index(drop=True)


def dsir_resample(scored, k: int = 100, seed: int = 0x5EED,
                  key: str = "logw", id_col: str = "doc_id"
                  ) -> pd.DataFrame:
    """Gumbel-top-k importance RESAMPLING (the paper's form): sampling
    k docs without replacement with probability proportional to
    ``exp(logw)`` is exactly taking the top k of ``logw + Gumbel``
    (Kirsch et al.; the Gumbel-max trick). The Gumbel noise is derived
    from a seeded hash of the doc id — deterministic, reproducible, and
    identical at any cluster size / block layout."""

    def _noise(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = (ids.astype(np.uint64) * _FNV_P) ^ _U64(seed)
        h = (h ^ (h >> _U64(33))) * _U64(0xFF51AFD7ED558CCD)
        h ^= h >> _U64(33)
        u = (h.astype(np.float64) + 1.0) / 18446744073709551616.0
        g = -np.log(-np.log(u))
        logw = batch.column(key).to_numpy(zero_copy_only=False)
        return batch.append_column("gumbel_key",
                                   pa.array(logw + g))

    noisy = scored.map_batches(_noise, batch_format="pyarrow")
    return dsir_topk(noisy, k=k, key="gumbel_key", id_col=id_col)
