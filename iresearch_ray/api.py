"""High-level façade used by ``__ray_entry__`` and ``bench.py``:
cached index builds over the driver's test tables + result framing
helpers whose column names match the DuckDB oracle SQL."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd

from iresearch_ray.index.build import build_index
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.search.searcher import IndexSearcher

_CACHE_ROOT = "/tmp/iresearch_ray_cache"
_SEARCHERS: dict[str, IndexSearcher] = {}


def documents_index_dir(sf_dir: str, segment_docs: int = 200) -> str:
    from iresearch_ray.index.segment import FORMAT_VERSION

    slug = hashlib.sha1(
        f"{os.path.abspath(sf_dir)}:{segment_docs}:v{FORMAT_VERSION}:offs:nch"
        .encode()
    ).hexdigest()[:12]
    return os.path.join(_CACHE_ROOT, f"documents-{slug}")


def documents_searcher(sf_dir: str, segment_docs: int = 200) -> IndexSearcher:
    """Searcher over the ``documents`` table of ``sf_dir`` (index built
    once per (sf_dir, segment_docs) and cached under /tmp)."""
    idx = documents_index_dir(sf_dir, segment_docs)
    key = idx
    s = _SEARCHERS.get(key)
    if s is not None:
        return s
    if not Manifest.exists(idx):
        build_index(
            os.path.join(sf_dir, "documents.parquet"),
            idx,
            text_col="text",
            key_cols=("doc_id",),
            stored_cols=("doc_id", "lang", "source", "n_chars", "text"),
            exact_fields=("lang", "source"),
            # n_chars gets numeric-trie terms too, so GranularRange
            # (trie decomposition) is exercised next to the pushdown
            # NumericRange over the same stored column
            numeric_fields=("n_chars",),
            segment_docs=segment_docs,
            # store per-occurrence char spans: highlight becomes a pure
            # index read (OFFS feature)
            index_features=("offs",),
        )
    s = IndexSearcher(idx)
    _SEARCHERS[key] = s
    return s


def topk_frame(searcher: IndexSearcher, flt, k: int, scorer=None,
               mode: str = "strict", round_to: int | None = 4) -> pd.DataFrame:
    """Top-k as (doc_id, score_r) where doc_id is the STORED id column
    and score_r is rounded for float-stable oracle comparison."""
    res = searcher.search(flt, k=k, scorer=scorer, mode=mode)
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), ("doc_id",))
    out = pd.DataFrame({
        "doc_id": stored["doc_id"].astype("int64"),
        "score_r": res["score"].astype(np.float64),
    })
    if round_to is not None:
        # half-up, matching DuckDB ROUND for positive scores (pandas
        # .round is half-to-even)
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out


def field_term_stats(searcher: IndexSearcher, field: str) -> pd.DataFrame:
    """Merged dictionary (term -> doc_freq, total_tf) for one field —
    vectorized collector sum over the per-segment sorted term tables
    (searchsorted into the merged vocabulary + np.add.at, no per-term
    Python)."""
    import numpy as np

    parts = []
    for seg in searcher.segments:
        lo, hi = seg._field_range(field)
        if hi > lo:
            parts.append((seg.terms[lo:hi], seg.doc_freq[lo:hi],
                          seg.total_tf[lo:hi]))
    if not parts:
        return pd.DataFrame({"term": [], "doc_freq": [], "total_tf": []})
    vocab = np.unique(np.concatenate([t for t, _, _ in parts]))
    dfc = np.zeros(vocab.size, dtype=np.int64)
    ttf = np.zeros(vocab.size, dtype=np.int64)
    for terms, d, tt in parts:
        idx = np.searchsorted(vocab, terms)
        np.add.at(dfc, idx, d.astype(np.int64))
        np.add.at(ttf, idx, tt.astype(np.int64))
    return pd.DataFrame({
        "term": vocab.tolist(),
        "doc_freq": dfc,
        "total_tf": ttf,
    })


def facet_frame(searcher: IndexSearcher, flt, field: str) -> pd.DataFrame:
    """Facet counts: number of matching docs per stored value of
    ``field`` (the doc-values facet of Lucene/ArangoDB search views;
    the reference exposes the same columnstore reads via
    ``core/index/column_info.hpp`` + materialized columns).

    Scale shape: the match set is produced per segment and the facet
    column is ONE lazily-read columnstore column per segment
    (``fetch_stored`` takes only the matched rows); counting is a
    vectorized value_counts. At cluster scale this runs per shard and
    the (value, count) partials — facet-cardinality-sized, not
    match-set-sized — merge associatively on the coordinator, same as
    the term-stats collector."""
    docs = searcher.match_docs(flt)
    stored = searcher.fetch_stored(docs, (field,))
    vc = stored[field].value_counts()
    out = pd.DataFrame({field: vc.index.to_numpy(), "n_docs": vc.to_numpy()})
    return out.sort_values(field).reset_index(drop=True)


def more_like_this(searcher: IndexSearcher, text: str, *, top_terms: int = 5,
                   k: int = 50, scorer=None, min_df: int = 1) -> pd.DataFrame:
    """More-like-this: select the ``top_terms`` highest tf*idf terms of
    ``text`` (idf = ln(dwf/df), ties by term bytes ascending), then run
    the BM25-scored disjunction of those terms (Lucene MoreLikeThis
    protocol; query-side only — no new index structure).

    Term df comes from ``resolve_term`` (per-segment dictionary seeks,
    cached) — O(distinct terms in ``text``) seeks, never a vocabulary
    scan, so the selection stage costs the same at any corpus size."""
    import re

    from iresearch_ray.search import filters as F

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        return pd.DataFrame({"doc_id": [], "score_r": []})
    terms, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    dwf = float(searcher.field_stats().docs_with_field)
    df = np.array([searcher.resolve_term(str(t)).docs_with_term
                   for t in terms], dtype=np.float64)
    ok = df >= max(1, min_df)
    terms, tf, df = terms[ok], tf[ok], df[ok]
    if terms.size == 0:
        return pd.DataFrame({"doc_id": [], "score_r": []})
    w = tf.astype(np.float64) * np.log(dwf / df)
    order = np.lexsort((terms, -w))[:top_terms]
    flt = F.Or([F.Term(str(t)) for t in terms[order]])
    return topk_frame(searcher, flt, k=k, scorer=scorer)


def collapse_topk(searcher: IndexSearcher, flt, group_col: str, k: int,
                  scorer=None, round_to: int | None = 4,
                  id_col: str | None = "doc_id") -> pd.DataFrame:
    """Search-time field collapsing (the Lucene/ES "collapse" operator,
    beyond-reference): keep only the best-scoring doc per ``group_col``
    value, then global top-k over the collapsed set. Best-per-group tie
    resolves to the lower doc (search() already emits score desc, doc
    asc), matching a ROW_NUMBER() OVER (PARTITION BY g ORDER BY score
    DESC, doc_id) = 1 oracle. Output is group-bounded; the intermediate
    is the scored match set (at cluster scale the per-group max is a
    groupby aggregate over the per-shard collapsed candidates — each
    shard can pre-collapse locally because max is associative)."""
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, scorer=scorer, mode="all")
    if id_col is None:  # corpora without a stored id: global doc index
        stored = searcher.fetch_stored(
            res["doc_id"].to_numpy(), (group_col,))
        id_vals = res["doc_id"].to_numpy().astype("int64")
    else:
        stored = searcher.fetch_stored(
            res["doc_id"].to_numpy(), (id_col, group_col))
        id_vals = stored[id_col].astype("int64")
    out = pd.DataFrame({
        "doc_id": id_vals,
        group_col: stored[group_col],
        "score_r": res["score"].astype(np.float64),
    })
    out = out.drop_duplicates(subset=[group_col], keep="first").head(k)
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out.reset_index(drop=True)


def collapse_inner_hits(searcher: IndexSearcher, flt, group_col: str,
                        k: int, inner: int = 3, scorer=None,
                        round_to: int | None = 4,
                        id_col: str | None = "doc_id") -> pd.DataFrame:
    """Field collapsing WITH inner hits (the ES ``collapse.inner_hits``
    form): the top-``k`` groups are ranked by their best doc (same
    rule as :func:`collapse_topk`), and each group carries its own
    top-``inner`` docs (score desc, doc asc) with a 1-based
    ``hit_rank``. The SQL replica is two ROW_NUMBER windows: one to
    pick the k leading groups, one to cut each group's inner list.

    Output is (k * inner)-bounded; the intermediate is the scored
    match set. At cluster scale each shard pre-collapses to its local
    per-group top-``inner`` (a bounded per-group heap) because the
    merged per-group top-``inner`` only needs per-shard
    top-``inner`` — same associativity argument as scored top-k."""
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, scorer=scorer, mode="all")
    if id_col is None:
        stored = searcher.fetch_stored(
            res["doc_id"].to_numpy(), (group_col,))
        id_vals = res["doc_id"].to_numpy().astype("int64")
    else:
        stored = searcher.fetch_stored(
            res["doc_id"].to_numpy(), (id_col, group_col))
        id_vals = stored[id_col].astype("int64")
    df = pd.DataFrame({
        "doc_id": id_vals,
        group_col: stored[group_col],
        "score_r": res["score"].astype(np.float64),
    })
    # search() emits score desc, doc asc — group order and inner order
    # both inherit it
    lead = df.drop_duplicates(subset=[group_col], keep="first").head(k)
    lead_rank = {g: r + 1 for r, g in enumerate(lead[group_col])}
    sub = df[df[group_col].isin(lead_rank)].copy()
    sub["group_rank"] = sub[group_col].map(lead_rank).astype("int64")
    sub["hit_rank"] = sub.groupby(group_col).cumcount() + 1
    sub = sub[sub["hit_rank"] <= inner]
    if round_to is not None:
        p = 10.0 ** round_to
        sub["score_r"] = np.floor(sub["score_r"] * p + 0.5) / p
    sub = sub.sort_values(["group_rank", "hit_rank"])
    cols = ["group_rank", group_col, "hit_rank", "doc_id", "score_r"]
    return sub[cols].reset_index(drop=True)


def nested_topk(searcher: IndexSearcher, child, k: int,
                group_col: str = "conv_id", score_mode: str = "total",
                scorer=None, round_to: int | None = 4) -> pd.DataFrame:
    """Scored parent/child block join (Lucene ``ToParentBlockJoinQuery``
    with ``ScoreMode.Total | Max | Avg``; the unscored Match::* side
    lives in ``searcher.conv_match``): parents (groups of ``group_col``)
    ranked by the aggregate of their matching children's relevance
    scores. -> (group, n_children, score_r) top-k, score desc then
    group asc.

    The child match set is scored exhaustively, then one bounded
    groupby aggregates per-parent (sum/max/mean are associative, so at
    cluster scale each shard pre-aggregates its local children and
    ships G partial rows — the same combiner shape as term_stats)."""
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(child, k=n_docs, scorer=scorer, mode="all")
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), (group_col,))
    df = pd.DataFrame({
        group_col: stored[group_col],
        "score": res["score"].to_numpy().astype(np.float64),
    })
    agg = {"total": "sum", "max": "max", "avg": "mean"}[score_mode]
    g = (df.groupby(group_col)["score"].agg(n_children="size", s=agg)
         .reset_index())
    g["n_children"] = g["n_children"].astype("int64")
    order = np.lexsort((g[group_col].to_numpy(),
                        -g["s"].to_numpy()))[:k]
    out = g.iloc[order].rename(columns={"s": "score_r"})
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out[[group_col, "n_children", "score_r"]].reset_index(drop=True)


def sort_by_field_topk(searcher: IndexSearcher, flt, field: str, k: int,
                       ascending: bool = False,
                       id_col: str | None = "doc_id") -> pd.DataFrame:
    """Top-k matches ordered by a STORED column instead of relevance
    (Lucene ``Sort(SortField)``; the reference serves the same reads
    through its columnstore, ``core/index/column_info.hpp``). Ties
    resolve by ``id_col`` ascending.

    Scale shape: the match set is produced per segment and only the
    sort column + id column of MATCHED rows are read (one lazy
    columnstore gather); selection is an O(n) argpartition to k before
    the final k·log k sort, and per-shard top-k partials merge
    associatively on the coordinator (same protocol as scored top-k —
    each shard ships k rows, never its match set)."""
    docs = searcher.match_docs(flt)
    if id_col is None:  # corpora without a stored id: global doc index
        stored = searcher.fetch_stored(docs, (field,))
        ids, id_name = docs.astype("int64"), "doc_id"
    else:
        stored = searcher.fetch_stored(docs, (id_col, field))
        ids, id_name = stored[id_col].to_numpy().astype("int64"), id_col
    vals = stored[field].to_numpy()
    key = vals if ascending else -vals
    if docs.size > k:  # O(n) selection: keep every tie of the kth key,
        kth = np.partition(key, k - 1)[k - 1]  # ids break them below
        idx = np.flatnonzero(key <= kth)
    else:
        idx = np.arange(docs.size)
    order = np.lexsort((ids[idx], key[idx]))[:k]
    sel = idx[order]
    return pd.DataFrame({id_name: ids[sel], field: vals[sel]}) \
        .reset_index(drop=True)


def function_score_topk(searcher: IndexSearcher, flt, field: str, k: int,
                        scorer=None, round_to: int | None = 4,
                        id_col: str | None = "doc_id") -> pd.DataFrame:
    """Field-value-factor function scoring (Lucene
    ``FunctionScoreQuery`` / ES ``field_value_factor``): final score =
    relevance * ln(1 + stored ``field``). The factor is applied AFTER
    exhaustive relevance scoring — a per-doc multiplier from an
    unbounded column breaks the block-max WAND invariant (Lucene
    disables impacts under FunctionScore for the same reason), so this
    runs ``mode="all"``; a bounded factor could ride WAND by scaling
    each block max by the block's max factor (documented, not needed
    here). Matched-set sized intermediate, column read only for
    matches; per-shard combined top-k merges associatively."""
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, scorer=scorer, mode="all")
    if id_col is None:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(), (field,))
        ids = res["doc_id"].to_numpy().astype("int64")
    else:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(),
                                       (id_col, field))
        ids = stored[id_col].to_numpy().astype("int64")
    # ln(1 + v) spelled as log(1.0 + v): 1 + v is exact in float64 for
    # integer v, so DuckDB's ln(1 + field) evaluates the identical
    # double — log1p would diverge in the last ulp
    combined = res["score"].to_numpy().astype(np.float64) \
        * np.log(1.0 + stored[field].to_numpy().astype(np.float64))
    order = np.lexsort((ids, -combined))[:k]
    out = pd.DataFrame({"doc_id": ids[order], "score_r": combined[order]})
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out.reset_index(drop=True)


def decay_score_topk(searcher: IndexSearcher, flt, field: str, k: int,
                     origin: float, scale: float, offset: float = 0.0,
                     decay: float = 0.5, shape: str = "gauss",
                     scorer=None, round_to: int | None = 4,
                     id_col: str | None = "doc_id") -> pd.DataFrame:
    """ES decay function scoring (``function_score`` with
    gauss/exp/linear decay): final score = relevance * decay(d) where
    d = max(0, |stored field - origin| - offset), parameterized so the
    factor equals ``decay`` exactly at distance ``scale``:

      gauss : exp(-d^2 / (2*sigma2)),  sigma2 = -scale^2 / (2 ln decay)
      exp   : exp(ln(decay)/scale * d)
      linear: max(0, (s - d)/s),       s = scale / (1 - decay)

    Like field_value_factor this is exhaustive (``mode="all"``) — an
    unbounded per-doc multiplier breaks the block-max WAND invariant.
    Every arithmetic step is a plain IEEE double expression, so a SQL
    replica evaluates bit-identically."""
    import math

    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, scorer=scorer, mode="all")
    if id_col is None:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(), (field,))
        ids = res["doc_id"].to_numpy().astype("int64")
    else:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(),
                                       (id_col, field))
        ids = stored[id_col].to_numpy().astype("int64")
    v = stored[field].to_numpy().astype(np.float64)
    d = np.maximum(np.abs(v - float(origin)) - float(offset), 0.0)
    if shape == "gauss":
        sigma2 = -(float(scale) * float(scale)) / (2.0 * math.log(decay))
        factor = np.exp(-(d * d) / (2.0 * sigma2))
    elif shape == "exp":
        factor = np.exp(math.log(decay) / float(scale) * d)
    elif shape == "linear":
        s = float(scale) / (1.0 - float(decay))
        factor = np.maximum(0.0, (s - d) / s)
    else:
        raise ValueError(f"unknown decay shape: {shape}")
    combined = res["score"].to_numpy().astype(np.float64) * factor
    order = np.lexsort((ids, -combined))[:k]
    out = pd.DataFrame({"doc_id": ids[order], "score_r": combined[order]})
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out.reset_index(drop=True)


def rank_feature_topk(searcher: IndexSearcher, flt, field: str, k: int,
                      function: str = "saturation", pivot: float = 1.0,
                      boost: float = 1.0, scaling_factor: float = 1.0,
                      exponent: float = 2.0, scorer=None,
                      round_to: int | None = 4,
                      id_col: str | None = "doc_id") -> pd.DataFrame:
    """ES ``rank_feature`` query (Lucene ``FeatureField`` queries)
    combined additively with relevance, the usual bool-should shape:
    final score = relevance + boost * S(stored ``field``) with

      saturation: S(v) = v / (v + pivot)
      log       : S(v) = ln(scaling_factor + v)
      sigmoid   : S(v) = v^exp / (v^exp + pivot^exp)

    Unlike the multiplicative function scores, saturation/sigmoid are
    bounded by 1, so a WAND run could keep impacts by adding
    ``boost`` to every block max (Lucene's FeatureQuery encodes the
    feature as an impact for exactly this reason); this implementation
    stays exhaustive (``mode="all"``) for exact rank parity with the
    SQL replica — every step is a plain IEEE double expression."""
    import math

    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, scorer=scorer, mode="all")
    if id_col is None:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(), (field,))
        ids = res["doc_id"].to_numpy().astype("int64")
    else:
        stored = searcher.fetch_stored(res["doc_id"].to_numpy(),
                                       (id_col, field))
        ids = stored[id_col].to_numpy().astype("int64")
    v = stored[field].to_numpy().astype(np.float64)
    if function == "saturation":
        s = v / (v + float(pivot))
    elif function == "log":
        s = np.log(float(scaling_factor) + v)
    elif function == "sigmoid":
        vp = v ** float(exponent)
        s = vp / (vp + float(pivot) ** float(exponent))
    else:
        raise ValueError(f"unknown rank_feature function: {function}")
    combined = res["score"].to_numpy().astype(np.float64) \
        + float(boost) * s
    order = np.lexsort((ids, -combined))[:k]
    out = pd.DataFrame({"doc_id": ids[order], "score_r": combined[order]})
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out.reset_index(drop=True)


def search_request(searcher: IndexSearcher, req: dict, scorer=None,
                   round_to: int | None = 4,
                   id_col: str | None = "doc_id") -> dict:
    """One-call search endpoint (the ES ``_search`` request shape) —
    the single entry point a reference user switching to this engine
    drives everything through:

        {"query":  "<query-string>",        # benchmark-task syntax
         "syntax": "simple" | "lucene",     # "lucene" routes through
                                            # the full query_string
                                            # parser with per-field
                                            # analyzers resolved from
                                            # the open index
         "filter": {field: value, ...},     # filter context (zero-score
                                            # ConstantScore gates)
         "from": M, "size": N,              # paging
         "fields": ["lang", ...],           # stored fields per hit
         "facet": "lang"}                   # optional terms facet

    -> {"total": int,
        "hits": DataFrame(rank, doc_id, score_r, *fields),
        "facets": DataFrame(field, n_docs) | None}

    Relevance comes from the parsed query only; filters gate the match
    set without scoring (the ES query-vs-filter context split). Paging
    retrieves ``from+size`` under WAND and slices — the standard
    deep-paging cost model (use ``search_after`` for cursors)."""
    from .search import filters as F
    from .search.parser import parse_query
    from .search.querystring import parse_query_string

    flt = (parse_query_string(req["query"], searcher=searcher)
           if req.get("syntax") == "lucene"
           else parse_query(req["query"]))
    for f, v in (req.get("filter") or {}).items():
        flt = F.And([flt, F.ConstantScore(F.Term(v, field=f))])
    frm, size = int(req.get("from", 0)), int(req.get("size", 10))
    total = int(searcher.match_docs(flt).size)
    res = searcher.search(flt, k=frm + size, scorer=scorer,
                          mode="strict").iloc[frm:frm + size]
    fields = tuple(req.get("fields") or ())
    gids = res["doc_id"].to_numpy()
    if id_col is None:
        stored = searcher.fetch_stored(gids, fields) if fields else None
        ids = gids.astype("int64")
    else:
        stored = searcher.fetch_stored(gids, (id_col,) + fields)
        ids = stored[id_col].to_numpy().astype("int64")
    score = res["score"].to_numpy().astype(np.float64)
    if round_to is not None:
        p = 10.0 ** round_to
        score = np.floor(score * p + 0.5) / p
    hits = pd.DataFrame({
        "rank": np.arange(frm + 1, frm + 1 + len(res), dtype=np.int64),
        "doc_id": ids,
        "score_r": score,
    })
    for f in fields:
        hits[f] = stored[f].to_numpy()
    facets = (facet_frame(searcher, flt, req["facet"])
              if req.get("facet") else None)
    return {"total": total, "hits": hits.reset_index(drop=True),
            "facets": facets}


def index_sorted_topk(searcher: IndexSearcher, k: int,
                      columns: tuple = ("doc_id",)) -> pd.DataFrame:
    """Early-terminating top-k by the index PRIMARY SORT order (Lucene
    index sorting + ``TopFieldCollector`` early termination; the
    reference's primary-sort index, ``core/index/index_writer.hpp``
    sorted_column): because every segment is stored in key order, the
    global first-k is a k-way merge of each segment's FIRST k rows —
    O(k x segments) reads, no per-doc scoring, no full column scan.

    Reads each segment's docmap parquet with ``iter_batches(k)`` so
    only the first row group(s) leave storage — the whole point of the
    operator at 10^9-doc segments.

    Correctness guard: the early termination is only valid when
    ``columns`` is (a prefix of) each segment's physical sort order —
    a non-correlated column would silently return a wrong top-k, so
    every fetched head is checked for monotonicity (O(k) per segment)
    and a violation raises instead of mis-answering."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as _pq

    def _head_sorted(df) -> bool:
        keys = [df[c].to_numpy() for c in reversed(list(columns))]
        order = np.lexsort(keys)       # stable: sorted input -> arange
        return bool((order == np.arange(len(df))).all())

    frames = []
    for seg in searcher.segments:
        pf = _pq.ParquetFile(_os.path.join(seg.dir, "docmap.parquet"))
        got = []
        need = k
        for b in pf.iter_batches(batch_size=k, columns=list(columns)):
            got.append(pa.Table.from_batches([b]))
            need -= b.num_rows
            if need <= 0:
                break
        if got:
            head = pa.concat_tables(got).slice(0, k).to_pandas()
            if not _head_sorted(head):
                raise ValueError(
                    f"index_sorted_topk columns {columns} are not the "
                    "physical sort order of segment "
                    f"{seg.meta.get('name', seg.dir)!r} — "
                    "early termination would return a wrong top-k; "
                    "query the index's primary sort key instead")
            frames.append(head)
    if not frames:
        return pd.DataFrame({c: [] for c in columns})
    out = pd.concat(frames, ignore_index=True)
    out = out.sort_values(list(columns), kind="mergesort").head(k)
    return out.reset_index(drop=True)


def filters_agg(searcher: IndexSearcher, filters: dict,
                other_bucket: bool = True) -> pd.DataFrame:
    """ES ``filters`` aggregation: one named bucket of matching-doc
    counts per filter, plus the ``_other_`` bucket (docs matching NONE
    of them, the ES ``other_bucket`` option). Each filter's match set
    is produced by the index machinery per segment; only match-set
    sized doc arrays are touched, and the output is
    filter-count-bounded. -> pd.DataFrame(bucket, doc_count) sorted by
    bucket name."""
    total = int(sum(s.docs_count for s in searcher.segments))
    rows = []
    union = np.empty(0, dtype=np.int64)
    for name, flt in filters.items():
        docs = np.asarray(searcher.match_docs(flt), dtype=np.int64)
        rows.append((str(name), int(docs.size)))
        union = np.union1d(union, docs)
    if other_bucket:
        rows.append(("_other_", total - int(union.size)))
    out = pd.DataFrame(rows, columns=["bucket", "doc_count"])
    out["doc_count"] = out["doc_count"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def match_frame(searcher: IndexSearcher, flt) -> pd.DataFrame:
    """All matching docs as their stored doc_id (unscored set query)."""
    docs = searcher.match_docs(flt)
    stored = searcher.fetch_stored(docs, ("doc_id",))
    return pd.DataFrame({"doc_id": stored["doc_id"].astype("int64")}).sort_values(
        "doc_id"
    ).reset_index(drop=True)


def suggest_prefix(searcher: IndexSearcher, prefix: str, n: int = 10,
                   field: str | None = None) -> pd.DataFrame:
    """Weighted prefix autocomplete (the Lucene suggester family,
    beyond-reference — built on the same byte-sorted term dictionary
    the reference's FST range walk serves): dictionary terms starting
    with ``prefix``, ranked by total document frequency (desc, then
    term asc). Two searchsorted per segment bound the scan; only the
    in-range dictionary slice and its df column are touched."""
    from iresearch_ray.search.filters import _prefix_successor

    hi = _prefix_successor(prefix)
    parts = []
    for seg in searcher.segments:
        rows = seg.term_range(prefix, hi, True, False, field)
        if rows.size:
            parts.append(pd.DataFrame({
                "term": seg.terms_at(rows),
                "doc_freq": seg.doc_freq[rows].astype("int64"),
            }))
    if not parts:
        return pd.DataFrame({"term": pd.Series([], dtype="object"),
                             "doc_freq": pd.Series([], dtype="int64")})
    out = (pd.concat(parts).groupby("term", as_index=False)["doc_freq"]
           .sum()
           .sort_values(["doc_freq", "term"], ascending=[False, True],
                        kind="mergesort")
           .head(n))
    return out.reset_index(drop=True)


def spell_correct(searcher: IndexSearcher, term: str,
                  max_distance: int = 1, n: int = 5,
                  field: str | None = None) -> pd.DataFrame:
    """Did-you-mean suggester: dictionary terms within Levenshtein
    distance ``max_distance`` of ``term`` ranked by document frequency
    (desc, then term asc) — the same banded-DP candidate expansion the
    Fuzzy filter uses (``core/search/levenshtein_filter.hpp`` is the
    query-side analogue), surfaced as a vocabulary service."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from iresearch_ray.search.filters import _levenshtein_many

    def pred(terms: np.ndarray):
        lens = pc.utf8_length(pa.array(terms, type=pa.string()))
        keep = np.abs(lens.to_numpy(zero_copy_only=False)
                      - len(term)) <= max_distance
        cands = terms[keep].tolist()
        if not cands:
            return []
        dist = _levenshtein_many(term, cands, max_distance)
        return [t for t, d in zip(cands, dist) if d <= max_distance]

    matched = searcher.scan_terms(pred, field)
    rows = []
    for t in matched:
        st = searcher.resolve_term(t, field)
        rows.append((t, int(st.docs_with_term)))
    out = pd.DataFrame(rows, columns=["term", "doc_freq"])
    if out.empty:
        return pd.DataFrame({"term": pd.Series([], dtype="object"),
                             "doc_freq": pd.Series([], dtype="int64")})
    out["doc_freq"] = out["doc_freq"].astype("int64")
    return (out.sort_values(["doc_freq", "term"],
                            ascending=[False, True], kind="mergesort")
            .head(n).reset_index(drop=True))


def suggest_phrase(searcher: IndexSearcher, text: str,
                   max_distance: int = 2,
                   field: str | None = None) -> pd.DataFrame:
    """Multi-token did-you-mean (the ES phrase-suggester shape, one
    best candidate per position): each whitespace/punct-split token is
    corrected to the dictionary term minimizing
    (edit distance, -doc_freq, term bytes) within ``max_distance`` —
    an in-dictionary token is its own distance-0 winner, so the rule
    needs no exact-match special case. Tokens with no candidate emit a
    NULL suggestion, df 0, distance 99 (sentinel).

    -> (pos, tok, suggestion, df, dist), one row per input position.
    Cost: one banded-DP dictionary scan per DISTINCT unknown token —
    a vocabulary service, independent of corpus row count."""
    import re

    from iresearch_ray.search.filters import _levenshtein_many

    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    best_of: dict[str, tuple] = {}
    for tok in dict.fromkeys(toks):
        def pred(terms: np.ndarray, tok=tok):
            import pyarrow as pa
            import pyarrow.compute as pc

            lens = pc.utf8_length(pa.array(terms, type=pa.string()))
            keep = np.abs(lens.to_numpy(zero_copy_only=False)
                          - len(tok)) <= max_distance
            cands = terms[keep].tolist()
            if not cands:
                return []
            dist = _levenshtein_many(tok, cands, max_distance)
            return [t for t, d in zip(cands, dist) if d <= max_distance]

        cands = list(searcher.scan_terms(pred, field))
        if not cands:
            best_of[tok] = (None, 0, 99)
            continue
        dists = _levenshtein_many(tok, cands, max_distance)
        ranked = sorted(
            ((int(d), -int(searcher.resolve_term(t, field).docs_with_term),
              t) for t, d in zip(cands, dists)))
        d, negdf, t = ranked[0]
        best_of[tok] = (t, -negdf, d)
    rows = [(p, tok) + best_of[tok] for p, tok in enumerate(toks)]
    out = pd.DataFrame(rows, columns=["pos", "tok", "suggestion",
                                      "df", "dist"])
    out["pos"] = out["pos"].astype("int64")
    out["df"] = out["df"].astype("int64")
    out["dist"] = out["dist"].astype("int64")
    return out


def rescore_topk(searcher: IndexSearcher, flt, rescore_flt, k: int = 10,
                 window: int = 50, query_weight: float = 1.0,
                 rescore_weight: float = 1.0, scorer=None,
                 round_to: int | None = 4,
                 id_col: str | None = "doc_id") -> pd.DataFrame:
    """Two-pass rescoring (the Lucene ``QueryRescorer`` / ES
    ``rescore`` window, beyond-reference): pass 1 retrieves the top
    ``window`` docs by the primary filter under full WAND pruning;
    pass 2 scores ``rescore_flt`` and re-ranks ONLY that window by
    ``query_weight*primary + rescore_weight*secondary`` (secondary 0
    where the rescore query misses). This is how engines run expensive
    queries (phrases, functions) affordably: the expensive scorer
    touches ``window`` docs, not the corpus.

    The secondary pass here scores its own match set exhaustively and
    joins on the window (matched-set sized, vectorized); at cluster
    scale each shard rescores only its window slice and the combined
    top-k merges associatively like every other scored query."""
    res = searcher.search(flt, k=window, scorer=scorer, mode="strict")
    gids = res["doc_id"].to_numpy()
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res2 = searcher.search(rescore_flt, k=n_docs, scorer=scorer,
                           mode="all")
    sec = pd.Series(res2["score"].to_numpy().astype(np.float64),
                    index=res2["doc_id"].to_numpy())
    s2 = sec.reindex(gids).fillna(0.0).to_numpy()
    combined = query_weight * res["score"].to_numpy().astype(np.float64) \
        + rescore_weight * s2
    if id_col is None:
        ids = gids.astype("int64")
    else:
        ids = searcher.fetch_stored(gids, (id_col,))[id_col] \
            .to_numpy().astype("int64")
    order = np.lexsort((ids, -combined))[:k]
    out = pd.DataFrame({"doc_id": ids[order], "score_r": combined[order]})
    if round_to is not None:
        p = 10.0 ** round_to
        out["score_r"] = np.floor(out["score_r"] * p + 0.5) / p
    return out.reset_index(drop=True)


def range_facet_frame(searcher: IndexSearcher, flt, field: str,
                      edges: tuple[float, ...]) -> pd.DataFrame:
    """Range facet (the ES ``range`` aggregation next to
    ``facet_frame``'s terms facet): count of matching docs whose
    stored numeric ``field`` falls in each half-open [edges[i],
    edges[i+1]) bucket; values outside every bucket are not counted
    (ES semantics). -> (bucket, lo, hi, n_docs), buckets that match 0
    docs included — the fixed output shape makes shard partials merge
    positionally.

    Scale shape: identical to ``facet_frame`` — match set per segment,
    one lazy columnstore column read for the matches, one vectorized
    searchsorted; (bucket, count) partials are edges-sized, so the
    coordinator merge is O(buckets), never O(matches)."""
    docs = searcher.match_docs(flt)
    stored = searcher.fetch_stored(docs, (field,))
    v = stored[field].to_numpy().astype(np.float64)
    e = np.asarray(edges, dtype=np.float64)
    idx = np.searchsorted(e, v, side="right") - 1
    ok = (idx >= 0) & (idx < len(e) - 1) & (v < e[-1])
    counts = np.bincount(idx[ok], minlength=len(e) - 1)
    return pd.DataFrame({
        "bucket": np.arange(len(e) - 1, dtype=np.int64),
        "lo": e[:-1],
        "hi": e[1:],
        "n_docs": counts.astype(np.int64),
    })


def terms_set_match(searcher: IndexSearcher, terms: list[str],
                    min_field: str, min_script=None,
                    id_col: str | None = "doc_id") -> pd.DataFrame:
    """ES ``terms_set`` query: docs matching at least M distinct terms
    of ``terms``, where M is read PER DOC from the stored numeric
    ``min_field`` (``minimum_should_match_field``); ``min_script``
    optionally transforms the stored value (the
    ``minimum_should_match_script`` form), e.g. ``lambda v: v % 3 + 1``.

    One unscored match pass per distinct term, a unique-count over the
    union (each term's doc set is already distinct, so the count IS
    the number of matched terms), then one columnstore gather of the
    per-doc threshold — candidate-bounded, no shuffle.

    -> (doc_id, n_matched, required) for kept docs, sorted by doc_id."""
    from .search import filters as F

    tset = sorted(set(terms))
    sets = [searcher.match_docs(F.Term(t)) for t in tset]
    allg = (np.concatenate(sets) if sets
            else np.empty(0, dtype=np.int64))
    cols = ["doc_id", "n_matched", "required"]
    if allg.size == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    uniq, counts = np.unique(allg, return_counts=True)
    if id_col is None:
        stored = searcher.fetch_stored(uniq, (min_field,))
        ids = uniq.astype("int64")
    else:
        stored = searcher.fetch_stored(uniq, (id_col, min_field))
        ids = stored[id_col].to_numpy().astype("int64")
    req = stored[min_field].to_numpy().astype(np.int64)
    if min_script is not None:
        req = np.asarray(min_script(req), dtype=np.int64)
    keep = counts >= req
    out = pd.DataFrame({
        "doc_id": ids[keep],
        "n_matched": counts.astype(np.int64)[keep],
        "required": req[keep],
    })
    return out.sort_values("doc_id").reset_index(drop=True)


def adjacency_matrix(searcher: IndexSearcher,
                     filters: dict[str, object]) -> pd.DataFrame:
    """ES ``adjacency_matrix`` aggregation: for named filters, the doc
    count of each filter and of each pairwise intersection (bucket
    label ``a&b``, keys in sorted order), zero-count buckets dropped —
    the co-occurrence matrix powering tag-relationship graphs.

    One unscored match pass per filter, then ``np.intersect1d`` over
    the k(k+1)/2 pairs of sorted id sets — match-set bounded, no
    shuffle. -> (bucket, doc_count) sorted by bucket."""
    keys = sorted(filters)
    sets = {k: np.unique(searcher.match_docs(filters[k])) for k in keys}
    rows = []
    for i, a in enumerate(keys):
        if sets[a].size:
            rows.append((a, int(sets[a].size)))
        for b in keys[i + 1:]:
            n = np.intersect1d(sets[a], sets[b], assume_unique=True).size
            if n:
                rows.append((f"{a}&{b}", int(n)))
    out = pd.DataFrame(rows, columns=["bucket", "doc_count"])
    out["doc_count"] = out["doc_count"].astype("int64")
    return out.sort_values("bucket").reset_index(drop=True)


def term_vectors(searcher: IndexSearcher, flt, max_docs: int = 20,
                 id_col: str | None = "doc_id",
                 text_col: str = "text") -> pd.DataFrame:
    """Per-document term vectors (Lucene ``IndexReader.getTermVector``
    / ES ``_termvectors`` parity): for the first ``max_docs`` matching
    docs of ``flt`` (stored-id order), one row per distinct term with
    its in-doc frequency and first position.

    The index is term-major (postings), vectors are doc-major; like
    Lucene when vectors aren't stored, the doc's stored text is
    re-analyzed with the index's own analyzer — work is bounded by the
    requested docs, never a dictionary scan.

    -> (doc_id, term, tf, first_pos) sorted by (doc_id, term)."""
    import pyarrow as pa

    from iresearch_ray.search.highlight import _searcher_analyzer

    docs = searcher.match_docs(flt)
    if id_col is None:
        docs = np.sort(docs)[:max_docs]
        stored = searcher.fetch_stored(docs, (text_col,))
        ids = docs.astype("int64")
    else:
        stored = searcher.fetch_stored(docs, (id_col, text_col))
        stored = stored.sort_values(id_col).head(max_docs)
        ids = stored[id_col].to_numpy().astype("int64")
    d, terms, pos = _searcher_analyzer(searcher).tokenize(
        pa.array(stored[text_col].tolist(), type=pa.string()))
    tv = pd.DataFrame({
        "doc_id": ids[d],
        "term": terms.to_pandas(),
        "pos": pos.astype(np.int64),
    })
    out = (tv.groupby(["doc_id", "term"], sort=True)["pos"]
             .agg(tf="size", first_pos="min").reset_index())
    out["tf"] = out["tf"].astype("int64")
    out["first_pos"] = out["first_pos"].astype("int64")
    return out


def explain_terms(searcher: IndexSearcher, terms: list[str], k: int = 10,
                  scorer=None, round_to: int | None = 4,
                  id_col: str | None = "doc_id") -> pd.DataFrame:
    """Score explanation (Lucene ``IndexSearcher.explain`` parity for
    term disjunctions): for the top-``k`` docs of Or(terms), one row
    per (doc, matching term) carrying the term's document frequency
    and its additive score contribution — the breakdown a relevance
    engineer reads to see WHY a doc ranked.

    -> (doc_id, term, df, contrib_r) sorted by (doc_id, term). The
    sum of a doc's contrib rows is its ranked score (Sum merge).
    Costs one exhaustive single-term pass per term over its own match
    set — explanation is a debugging surface, not a serving path."""
    from .search import filters as F

    res = searcher.search(F.Or([F.Term(t) for t in terms]), k=k,
                          scorer=scorer, mode="strict")
    gids = res["doc_id"].to_numpy()
    if id_col is None:
        ids = gids.astype("int64")
    else:
        ids = searcher.fetch_stored(gids, (id_col,))[id_col] \
            .to_numpy().astype("int64")
    id_of = dict(zip(gids.tolist(), ids.tolist()))

    rows = []
    n_docs = int(sum(s.docs_count for s in searcher.segments))
    for t in sorted(set(terms)):
        rt = searcher.search(F.Term(t), k=n_docs, scorer=scorer,
                             mode="all")
        sec = pd.Series(rt["score"].to_numpy().astype(np.float64),
                        index=rt["doc_id"].to_numpy())
        hit = sec.reindex(gids).dropna()
        df_t = searcher.resolve_term(t, None).docs_with_term
        for g, sc in hit.items():
            rows.append((id_of[int(g)], t, int(df_t), float(sc)))
    out = pd.DataFrame(rows, columns=["doc_id", "term", "df",
                                      "contrib_r"])
    if round_to is not None:
        p = 10.0 ** round_to
        out["contrib_r"] = np.floor(out["contrib_r"] * p + 0.5) / p
    return out.sort_values(["doc_id", "term"]).reset_index(drop=True)
