"""Highlighting: match character offsets for top-k results.

The reference stores offsets/payloads in the index when an analyzer
exposes them (OFFS/PAY index features, parallel ``.pay`` file —
``core/analysis/token_attributes.hpp``, ``core/formats/formats_10.cpp:
326-333``) so highlights are a pure index read. Here the engine stores
FREQ|POS and recomputes offsets at read time by re-tokenizing only the
k result docs' stored text (the Lucene "unified highlighter" strategy):
k is small, the analyzer is vectorized, and the columnstore read is one
column — so highlight cost is O(k · doc_len), independent of index
size. This trades a per-query re-analysis for zero index-space
overhead; the format keeps a slot for an OFFS blob if a future round
stores offsets at write time.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def highlight(searcher, flt, k: int = 10, *, field: str | None = None,
              text_col: str | None = None, scorer=None,
              pre: str = "<em>", post: str = "</em>",
              mode: str = "strict") -> pd.DataFrame:
    """Top-k search + highlighted snippets.

    Returns DataFrame(doc_id, score, offsets, snippet): ``offsets`` is
    the list of (start, end) character ranges of query-term matches in
    the doc's stored text; ``snippet`` is the text with matches wrapped
    in ``pre``/``post``.
    """
    res = searcher.search(flt, k=k, scorer=scorer, mode=mode)
    if not len(res):
        return pd.DataFrame({"doc_id": [], "score": [],
                             "offsets": [], "snippet": []})
    seg0 = searcher.segments[0]
    text_col = text_col or seg0.default_field
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), (text_col,))
    texts = stored[text_col].tolist()

    # query terms: resolve from the prepared tree's term cache footprint
    terms = _query_terms(searcher, flt, scorer)
    analyzer = _searcher_analyzer(searcher)
    offsets_col, snippet_col = [], []
    for text in texts:
        text = text or ""
        _, toks, _ = analyzer.tokenize(pa.array([text], type=pa.string()))
        toks = toks.to_pylist()
        # locate tokens left-to-right case-insensitively; analyzers that
        # rewrite tokens (stem/fold) may shift a hit to the first
        # occurrence of the rewritten surface form
        hits = []
        lower = text.lower()
        cursor = 0
        for tok in toks:
            i = lower.find(tok, cursor)
            if i < 0:
                i = lower.find(tok)
                if i < 0:
                    continue
            if tok in terms:
                hits.append((i, i + len(tok)))
            cursor = i + len(tok)
        hits.sort()
        offsets_col.append(hits)
        out = []
        cur = 0
        for s, e in hits:
            if s < cur:
                continue
            out.append(text[cur:s])
            out.append(pre)
            out.append(text[s:e])
            out.append(post)
            cur = e
        out.append(text[cur:])
        snippet_col.append("".join(out))
    return pd.DataFrame({
        "doc_id": res["doc_id"],
        "score": res["score"],
        "offsets": offsets_col,
        "snippet": snippet_col,
    })


def _searcher_analyzer(searcher):
    from iresearch_ray.analysis.analyzers import get_analyzer

    spec = searcher.segments[0].meta.get(
        "analyzer", {"name": "segmentation", "options": {}})
    return get_analyzer(spec["name"], spec.get("options") or {})


def _query_terms(searcher, flt, scorer) -> set:
    """Every dictionary term the filter resolves (plain terms, expanded
    multiterms, phrase slots) — collected by preparing the filter
    against an empty term-state cache and reading its footprint."""
    saved = searcher._term_cache
    searcher._term_cache = {}
    try:
        flt.prepare(searcher, searcher._scorer(scorer))
        terms = {t for (_f, t) in searcher._term_cache}
    finally:
        searcher._term_cache = {**saved, **searcher._term_cache}
    return terms
