"""Distributed n-gram language-model scoring — the CCNet/KenLM-style
"perplexity filter" stage of a training-data pipeline, rebuilt as two
Ray Data passes (no analogue in the reference engine).

Pass 1 (fit): one ``map_batches`` emits per-block partial unigram and
bigram counts (a unigram never contains a space, a bigram always does,
so both ride one ``(gram, c)`` table through a single
``groupby("gram").sum("c")`` shuffle — pre-aggregated per block, so
only the block vocabulary crosses the exchange). The reduced count
table is collected (bounded by corpus vocabulary; at 100 TB keep the
top-K grams plus an OOV bucket — the standard KenLM pruning — by
adding a ``filter(c >= min_count)`` before the collect) and broadcast
with ``ray.put``.

Pass 2 (score): an actor pool fetches the model once per actor in
``__init__`` and scores each doc as the mean add-one-smoothed bigram
log-probability ``mean_i ln((B(w_{i-1},w_i)+1) / (U(w_{i-1})+V))`` —
vectorized via ``pd.Index.get_indexer`` (exact string lookup, no hash
collisions)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.pipelines.textstats import word_ngrams


def _partial_counts(batch: pa.Table, text_col: str) -> pa.Table:
    uni, _ = word_ngrams(batch, 1, text_col)
    bi, _ = word_ngrams(batch, 2, text_col)
    grams = pa.chunked_array([uni, bi]).combine_chunks()
    if len(grams) == 0:
        return pa.table({"gram": pa.array([], type=pa.string()),
                         "c": pa.array([], type=pa.int64())})
    vc = grams.value_counts()
    return pa.table({"gram": vc.field("values"),
                     "c": vc.field("counts").cast(pa.int64())})


def fit_bigram_lm(ds, text_col: str = "text") -> dict:
    """Count-based bigram LM over the corpus: returns
    ``{"uni": pd.Series, "bi": pd.Series, "V": int}`` (counts indexed
    by gram string; ``V`` = unigram vocabulary size)."""
    counts = (
        ds.map_batches(_partial_counts, batch_format="pyarrow",
                       fn_kwargs={"text_col": text_col})
        .groupby("gram").sum("c")
        .to_pandas()
    )
    col = "sum(c)" if "sum(c)" in counts.columns else "c"
    is_bi = counts["gram"].str.contains(" ")
    uni = counts[~is_bi].set_index("gram")[col].astype(np.int64)
    bi = counts[is_bi].set_index("gram")[col].astype(np.int64)
    return {"uni": uni, "bi": bi, "V": int(len(uni))}


class BigramLMScorer:
    """Actor-pool scorer: model fetched once per actor (pass a
    ``ray.ObjectRef`` from ``ray.put(fit_bigram_lm(...))``)."""

    def __init__(self, model, text_col: str = "text",
                 id_col: str = "doc_id", keep_cols: tuple = ()):
        import ray

        if isinstance(model, ray.ObjectRef):
            model = ray.get(model)
        self.uni_idx: pd.Index = model["uni"].index
        self.uni_c = model["uni"].to_numpy()
        self.bi_idx: pd.Index = model["bi"].index
        self.bi_c = model["bi"].to_numpy()
        self.V = model["V"]
        self.text_col, self.id_col = text_col, id_col
        self.keep_cols = tuple(keep_cols)

    def __call__(self, batch: pa.Table) -> pa.Table:
        bi, d = word_ngrams(batch, 2, self.text_col)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        if len(bi) == 0:
            cols = {self.id_col: pa.array([], type=pa.int64()),
                    "n_bigrams": pa.array([], type=pa.int64()),
                    "lm_logprob": pa.array([], type=pa.float64())}
            for c in self.keep_cols:
                cols[c] = batch.column(c).slice(0, 0)
            return pa.table(cols)
        import pyarrow.compute as pc

        bi_np = bi.to_numpy(zero_copy_only=False)
        w1_arr = pc.list_element(pc.split_pattern(bi, " "), 0)
        bpos = self.bi_idx.get_indexer(bi_np)
        upos = self.uni_idx.get_indexer(w1_arr.to_numpy(zero_copy_only=False))
        bc = np.where(bpos >= 0, self.bi_c[np.maximum(bpos, 0)], 0)
        uc = np.where(upos >= 0, self.uni_c[np.maximum(upos, 0)], 0)
        logp = np.log((bc + 1.0) / (uc + float(self.V)))
        n = len(batch)
        tot = np.bincount(d, weights=logp, minlength=n)
        cnt = np.bincount(d, minlength=n)
        has = cnt > 0
        docs = np.flatnonzero(has)
        cols = {
            self.id_col: pa.array(ids[docs].astype(np.int64)),
            "n_bigrams": pa.array(cnt[docs].astype(np.int64)),
            "lm_logprob": pa.array(tot[docs] / cnt[docs]),
        }
        for c in self.keep_cols:
            cols[c] = batch.column(c).take(pa.array(docs))
        return pa.table(cols)


def lm_score(ds, model_ref, text_col: str = "text",
             id_col: str = "doc_id", concurrency: int = 4,
             keep_cols: tuple = ()):
    """Dataset[(id, n_bigrams, lm_logprob, *keep_cols)] for docs with
    >= 1 bigram."""
    return ds.map_batches(
        BigramLMScorer, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"model": model_ref, "text_col": text_col,
                               "id_col": id_col, "keep_cols": keep_cols})


def perplexity_buckets(scored, group_col: str = "lang",
                       score_col: str = "lm_logprob_r",
                       id_col: str = "doc_id", n_buckets: int = 3,
                       labels: tuple = ("head", "middle", "tail")):
    """CCNet-style perplexity partitioning (Wenzek et al. 2020, §4.3):
    per group (language), rank docs by LM score DESC (highest mean
    log-probability = lowest perplexity first, ties by ascending id)
    and cut the ranking into ``n_buckets`` equal-count buckets — SQL
    ``ntile(n) OVER (PARTITION BY group ORDER BY score DESC, id)``
    (first ``n_rows % n`` buckets take the extra row, like ntile).

    -> Dataset(id, group, bucket). ``score_col`` must be PRE-ROUNDED
    (e.g. ``floor(x*1e4+0.5)/1e4``) so the ordering is bit-identical
    to the oracle's — rank-based cuts make the bucket assignment pure
    integer arithmetic, immune to the float-threshold ulp flips a
    quantile-threshold cut risks.

    Scale shape: ONE shuffle on the group column, one lexsort per
    group. Assumption (same as ``aggregates.group_quantiles``): a
    group fits one worker. At corpus scale use the sampled-threshold
    form instead: per-group score quantiles from a ``hash_sample``
    (CCNet itself cuts at thresholds fit on a sample) broadcast
    through ``aggregates.filter_by_group_quantile``."""
    if len(labels) != n_buckets:
        raise ValueError("labels must match n_buckets")
    lab = np.asarray(labels, dtype=object)

    def per_group(g):
        import pandas as pd
        s = g[score_col].to_numpy(dtype=np.float64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        order = np.lexsort((ids, -s))
        m = ids.size
        sizes = np.full(n_buckets, m // n_buckets, dtype=np.int64)
        sizes[: m % n_buckets] += 1
        bucket = np.repeat(np.arange(n_buckets), sizes)
        out = np.empty(m, dtype=object)
        out[order] = lab[bucket]
        return pd.DataFrame({
            id_col: ids,
            group_col: g[group_col].to_numpy(),
            "bucket": out,
        })

    return scored.groupby(group_col).map_groups(per_group,
                                                batch_format="pandas")
