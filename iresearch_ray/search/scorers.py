"""Scorers: Okapi BM25 (default) and TF-IDF, with collector semantics.

Formulas mirror the reference exactly (float32 discipline):

BM25 (``core/search/bm25.cpp:287-410``, ``bm25.hpp:29-65``):
    idf        = log1p((docs_with_field - docs_with_term + 0.5)
                       / (docs_with_term + 0.5))        # summed per collected term
    c0         = boost * (k + 1) * idf
    c1         = k*(1-b) + (k*b/avgdl) * dl             # avgdl = total_term_freq/docs_with_field
    score      = c0 - c0*c1/(c1 + tf)                   # == c0 * tf/(c1+tf)
    k = 1.2, b = 0.75; dl = Norm2 doc length (token count)

TFIDF (``core/search/tfidf.cpp:185-260``):
    idf   = 1 + log(docs_with_field / (docs_with_term + 1))   # summed
    score = boost * sqrt(tf) * idf   [optionally * 1/sqrt(dl)]

Collectors are associative across segments
(``core/search/scorer_impl.hpp:60-105``): docs_with_field /
total_term_freq / docs_with_term simply sum — which is what makes the
stats phase a tiny driver-side merge over per-segment metas.

``dtype`` defaults to float32 (reference ``score_t``); float64 is used
by the DuckDB-oracle queries so both sides agree to ~1 ulp.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class FieldStats:
    docs_with_field: int = 0
    total_term_freq: int = 0

    def add(self, other: "FieldStats") -> None:
        self.docs_with_field += other.docs_with_field
        self.total_term_freq += other.total_term_freq


class ScoreCtx:
    """Per-(stats-group) precomputed scoring constants."""

    __slots__ = ("c0", "norm_const", "norm_length", "dtype")

    def __init__(self, c0, norm_const, norm_length, dtype):
        self.c0 = c0
        self.norm_const = norm_const
        self.norm_length = norm_length
        self.dtype = dtype

    def fingerprint(self) -> tuple:
        """Hashable snapshot of the scoring constants (cache key for
        scored-result caches). Norm-free scorers (TFIDF) carry None for
        the norm constants — mapped to a sentinel no real ctx produces
        (norm_const = k(1-b) is always >= 0)."""
        return (
            float(self.c0),
            -1.0 if self.norm_const is None else float(self.norm_const),
            -1.0 if self.norm_length is None else float(self.norm_length),
        )


class BM25:
    name = "bm25"

    def __init__(self, k: float = 1.2, b: float = 0.75, dtype=np.float32):
        self.k = k
        self.b = b
        self.dtype = dtype

    def idf(self, docs_with_field: int, docs_with_term: int) -> float:
        # computed in double then narrowed, like the reference collect()
        return float(
            np.log1p(
                ((docs_with_field - docs_with_term) + 0.5) / (docs_with_term + 0.5)
            )
        )

    def make_ctx(self, field: FieldStats, idf_sum: float, boost: float = 1.0) -> ScoreCtx:
        dt = self.dtype
        c0 = dt(boost) * dt(self.k + 1) * dt(idf_sum)
        kb = dt(self.k) * dt(self.b)
        norm_const = dt(self.k) - kb
        if field.total_term_freq and field.docs_with_field:
            avgdl = dt(field.total_term_freq) / dt(field.docs_with_field)
            norm_length = kb / avgdl
        else:
            norm_length = kb
        return ScoreCtx(c0, norm_const, norm_length, dt)

    def score(self, ctx: ScoreCtx, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        tf = tfs.astype(dt)
        c1 = ctx.norm_const + ctx.norm_length * dls.astype(dt)
        return ctx.c0 - ctx.c0 * c1 / (c1 + tf)

    def upper_bound(self, ctx: ScoreCtx, max_tf: float, min_dl: float) -> float:
        """Block-max bound: maximize tf, minimize dl (WAND writer tag
        semantics, ``core/formats/wand_writer.hpp:37-98``)."""
        dt = ctx.dtype
        c1 = ctx.norm_const + ctx.norm_length * dt(min_dl)
        return float(ctx.c0 - ctx.c0 * c1 / (c1 + dt(max_tf)))

    def upper_bound_many(self, ctx: ScoreCtx, max_tf: np.ndarray,
                         min_dl: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        c1 = ctx.norm_const + ctx.norm_length * min_dl.astype(dt)
        return ctx.c0 - ctx.c0 * c1 / (c1 + max_tf.astype(dt))


class TFIDF:
    name = "tfidf"

    def __init__(self, with_norms: bool = False, dtype=np.float32):
        self.with_norms = with_norms
        self.dtype = dtype

    def idf(self, docs_with_field: int, docs_with_term: int) -> float:
        return float(1.0 + np.log(docs_with_field / (docs_with_term + 1.0)))

    def make_ctx(self, field: FieldStats, idf_sum: float, boost: float = 1.0) -> ScoreCtx:
        dt = self.dtype
        return ScoreCtx(dt(boost) * dt(idf_sum), None, None, dt)

    def score(self, ctx: ScoreCtx, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        s = ctx.c0 * np.sqrt(tfs.astype(dt))
        if self.with_norms:
            s = s / np.sqrt(dls.astype(dt))
        return s.astype(dt)

    def upper_bound(self, ctx: ScoreCtx, max_tf: float, min_dl: float) -> float:
        dt = ctx.dtype
        ub = ctx.c0 * np.sqrt(dt(max_tf))
        if self.with_norms:
            ub = ub / np.sqrt(dt(min_dl))
        return float(ub)

    def upper_bound_many(self, ctx: ScoreCtx, max_tf: np.ndarray,
                         min_dl: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        ub = ctx.c0 * np.sqrt(max_tf.astype(dt))
        if self.with_norms:
            ub = ub / np.sqrt(min_dl.astype(dt))
        return ub


class LMDirichlet:
    """Language-model similarity with Dirichlet smoothing (Zhai &
    Lafferty 2001, the Lucene LMDirichletSimilarity formula —
    beyond-reference; the reference stops at BM25/TFIDF/boost):

        p(t|C)  = total_tf(term) / total_tf(field)
        score   = boost * max(0, log1p(tf / (mu * p(t|C)))
                                 + log(mu / (dl + mu)))

    The clamp at 0 (same as Lucene) keeps scores non-negative so the
    disjunction upper-bound arithmetic (children contribute >= 0)
    stays valid. ``term_stat`` feeds 1/(mu*p) through the collected
    stats channel — it sums per stats group exactly like idf does."""

    name = "lmd"

    def __init__(self, mu: float = 2000.0, dtype=np.float32):
        self.mu = mu
        self.dtype = dtype

    def term_stat(self, field: FieldStats, docs_with_term: int,
                  total_tf: int) -> float:
        if not total_tf or not field.total_term_freq:
            return 0.0
        return float(field.total_term_freq) / (self.mu * float(total_tf))

    def make_ctx(self, field: FieldStats, ts_sum: float,
                 boost: float = 1.0) -> ScoreCtx:
        dt = self.dtype
        return ScoreCtx(dt(boost), dt(self.mu), dt(ts_sum), dt)

    def score(self, ctx: ScoreCtx, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        s = np.log1p(tfs.astype(dt) * ctx.norm_length) \
            + np.log(ctx.norm_const / (dls.astype(dt) + ctx.norm_const))
        return (ctx.c0 * np.maximum(s, dt(0))).astype(dt)

    def upper_bound(self, ctx: ScoreCtx, max_tf: float, min_dl: float) -> float:
        dt = ctx.dtype
        s = np.log1p(dt(max_tf) * ctx.norm_length) \
            + np.log(ctx.norm_const / (dt(min_dl) + ctx.norm_const))
        return float(ctx.c0 * max(float(s), 0.0))

    def upper_bound_many(self, ctx: ScoreCtx, max_tf: np.ndarray,
                         min_dl: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        s = np.log1p(max_tf.astype(dt) * ctx.norm_length) \
            + np.log(ctx.norm_const / (min_dl.astype(dt) + ctx.norm_const))
        return ctx.c0 * np.maximum(s, dt(0))


class LMJelinekMercer:
    """Language-model similarity with Jelinek-Mercer smoothing (Zhai &
    Lafferty 2001; Lucene LMJelinekMercerSimilarity):

        score = boost * log1p(((1 - lam)/lam) * (tf/dl) / p(t|C))

    Always >= 0; ``term_stat`` carries ((1-lam)/lam) / p(t|C)."""

    name = "lmjm"

    def __init__(self, lam: float = 0.7, dtype=np.float32):
        self.lam = lam
        self.dtype = dtype

    def term_stat(self, field: FieldStats, docs_with_term: int,
                  total_tf: int) -> float:
        if not total_tf or not field.total_term_freq:
            return 0.0
        return ((1.0 - self.lam) / self.lam) \
            * float(field.total_term_freq) / float(total_tf)

    def make_ctx(self, field: FieldStats, ts_sum: float,
                 boost: float = 1.0) -> ScoreCtx:
        dt = self.dtype
        return ScoreCtx(dt(boost), None, dt(ts_sum), dt)

    def score(self, ctx: ScoreCtx, tfs: np.ndarray, dls: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        dl = np.maximum(dls.astype(dt), dt(1))
        return (ctx.c0 * np.log1p(ctx.norm_length * tfs.astype(dt) / dl)) \
            .astype(dt)

    def upper_bound(self, ctx: ScoreCtx, max_tf: float, min_dl: float) -> float:
        dt = ctx.dtype
        return float(ctx.c0 * np.log1p(
            ctx.norm_length * dt(max_tf) / max(dt(min_dl), dt(1))))

    def upper_bound_many(self, ctx: ScoreCtx, max_tf: np.ndarray,
                         min_dl: np.ndarray) -> np.ndarray:
        dt = ctx.dtype
        dl = np.maximum(min_dl.astype(dt), dt(1))
        return ctx.c0 * np.log1p(ctx.norm_length * max_tf.astype(dt) / dl)


def get_scorer(name: str, **kwargs):
    """Scorer registry (``REGISTER_SCORER_JSON`` analogue)."""
    if name == "bm25":
        return BM25(**kwargs)
    if name == "tfidf":
        return TFIDF(**kwargs)
    if name == "lmd":
        return LMDirichlet(**kwargs)
    if name == "lmjm":
        return LMJelinekMercer(**kwargs)
    raise KeyError(name)
