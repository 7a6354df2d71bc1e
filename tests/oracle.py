"""Independent brute-force oracle: regex tokenizer + exhaustive float32
BM25 over a pyarrow transcript table. Shares NO code with the engine —
mirrors the reference formulas directly (``core/search/bm25.cpp``)."""

from __future__ import annotations

import re

import numpy as np

_WORD = re.compile(r"[^\W_]+", re.UNICODE)


def tokenize(text: str) -> list[str]:
    if text is None:
        return []
    return _WORD.findall(text.lower())


class OracleIndex:
    def __init__(self, table, k: float = 1.2, b: float = 0.75):
        """``table`` must already be in stable (conv_id, turn_idx) order;
        doc ids are 1-based ranks."""
        self.k, self.b = k, b
        self.docs_tokens = [tokenize(t) for t in table.column("text").to_pylist()]
        self.n = len(self.docs_tokens)
        self.doc_len = np.asarray([len(t) for t in self.docs_tokens], dtype=np.int64)
        self.postings: dict[str, dict[int, list[int]]] = {}
        for d, toks in enumerate(self.docs_tokens, start=1):
            for p, t in enumerate(toks):
                self.postings.setdefault(t, {}).setdefault(d, []).append(p)
        self.docs_with_field = int((self.doc_len > 0).sum())
        self.total_term_freq = int(self.doc_len.sum())

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))

    def idf(self, term: str) -> float:
        dwt = self.df(term)
        if dwt == 0:
            return 0.0
        return float(np.log1p(((self.docs_with_field - dwt) + 0.5) / (dwt + 0.5)))

    def score_term(self, term: str) -> dict[int, float]:
        """doc -> float32 BM25 score."""
        idf = np.float32(self.idf(term))
        c0 = np.float32(self.k + 1) * idf
        kb = np.float32(self.k) * np.float32(self.b)
        norm_const = np.float32(self.k) - kb
        avgdl = np.float32(self.total_term_freq) / np.float32(self.docs_with_field)
        norm_length = kb / avgdl
        out = {}
        for d, poss in self.postings.get(term, {}).items():
            tf = np.float32(len(poss))
            c1 = norm_const + norm_length * np.float32(self.doc_len[d - 1])
            out[d] = float(c0 - c0 * c1 / (c1 + tf))
        return out

    def score_phrase(self, terms: list[str]) -> dict[int, float]:
        idf = np.float32(sum(self.idf(t) for t in terms if self.df(t)))
        c0 = np.float32(self.k + 1) * idf
        kb = np.float32(self.k) * np.float32(self.b)
        norm_const = np.float32(self.k) - kb
        avgdl = np.float32(self.total_term_freq) / np.float32(self.docs_with_field)
        norm_length = kb / avgdl
        out = {}
        cand = set(self.postings.get(terms[0], {}))
        for t in terms[1:]:
            cand &= set(self.postings.get(t, {}))
        for d in cand:
            starts = set(self.postings[terms[0]][d])
            for i, t in enumerate(terms[1:], start=1):
                starts &= {p - i for p in self.postings[t][d]}
            if starts:
                tf = np.float32(len(starts))
                c1 = norm_const + norm_length * np.float32(self.doc_len[d - 1])
                out[d] = float(c0 - c0 * c1 / (c1 + tf))
        return out

    @staticmethod
    def topk(scores: dict[int, float], k: int) -> list[tuple[int, float]]:
        return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    @staticmethod
    def merge_sum(*score_dicts) -> dict[int, float]:
        out: dict[int, float] = {}
        for sd in score_dicts:
            for d, s in sd.items():
                out[d] = float(np.float32(out.get(d, 0.0)) + np.float32(s))
        return out

    @staticmethod
    def intersect_sum(*score_dicts) -> dict[int, float]:
        cand = set(score_dicts[0])
        for sd in score_dicts[1:]:
            cand &= set(sd)
        return {
            d: float(sum(np.float32(sd[d]) for sd in score_dicts)) for d in cand
        }
