"""Highlighting: match character offsets for top-k results.

Two strategies, matching the reference's split:

- ``source="offsets"`` — the index was built with the OFFS feature
  (``build_index(index_features=("offs",))``): character spans come
  straight from the per-occurrence offset stream (the reference's
  ``offset`` attribute stored in the parallel ``.pay`` file,
  ``core/analysis/token_attributes.hpp``,
  ``core/formats/formats_10.cpp:326-333``). A highlight is then one
  binary search + one stream slice per (term, doc) — no re-analysis.
- ``source="reanalyze"`` — FREQ|POS-only index: offsets are recomputed
  by re-tokenizing only the k result docs' stored text (the Lucene
  "unified highlighter" strategy). k is small and the analyzer is
  vectorized, so cost is O(k · doc_len), independent of index size.

``source="auto"`` (default) uses stored offsets when every segment has
them, else falls back to re-analysis.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def highlight(searcher, flt, k: int = 10, *, field: str | None = None,
              text_col: str | None = None, scorer=None,
              pre: str = "<em>", post: str = "</em>",
              mode: str = "strict", source: str = "auto") -> pd.DataFrame:
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
    terms = _query_terms(searcher, flt, scorer)

    if source == "auto":
        source = "offsets" if all(
            "offs" in s.index_features for s in searcher.segments
        ) else "reanalyze"
    if source == "offsets":
        offsets_col = _offsets_from_index(searcher, res, terms, field)
    else:
        offsets_col = _offsets_reanalyze(searcher, texts, terms)

    snippet_col = []
    for text, hits in zip(texts, offsets_col):
        text = text or ""
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


def _offsets_from_index(searcher, res, terms: set,
                        field: str | None) -> list:
    """Spans straight from the stored OFFS streams — grouped per
    segment so each query term's offset stream decodes at most once per
    segment (it is cached on the reader)."""
    docs = res["doc_id"].to_numpy().astype(np.int64)
    seg_ord = searcher.seg_of_docs(docs)
    offsets_col: list = [[] for _ in range(docs.size)]
    for s in np.unique(seg_ord):
        seg = searcher.segments[int(s)]
        term_idxs = [i for i in (seg.lookup(t, field) for t in terms)
                     if i >= 0]
        for ri in np.flatnonzero(seg_ord == s):
            local = int(docs[ri] - searcher.doc_bases[int(s)])
            spans = []
            for ti in term_idxs:
                st, en = seg.doc_offsets(ti, local)
                spans.extend(zip(st.tolist(), en.tolist()))
            spans.sort()
            offsets_col[int(ri)] = spans
    return offsets_col


def _offsets_reanalyze(searcher, texts: list, terms: set) -> list:
    """Recompute spans by re-tokenizing the k result docs."""
    analyzer = _searcher_analyzer(searcher)
    offsets_col = []
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
    return offsets_col


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
