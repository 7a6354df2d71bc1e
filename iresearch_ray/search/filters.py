"""Filter AST + per-segment execution kernels (exhaustive path).

Rebuild of the reference search layer (``core/search/*``): a filter
tree is ``prepare()``d once per query — collecting **index-wide** term
stats first, like ``filter.prepare(PrepareContext)`` walking all
segments (``core/search/term_filter.cpp:92-129``) — then executed per
segment, producing ``(docs ascending, float scores)`` numpy arrays.

All kernels are vectorized:
- conjunction  = sorted-array intersection (``conjunction.hpp:81-120``)
- disjunction  = concat + sort + reduceat with min_match counting
  (``disjunction.hpp``, ``min_match_disjunction.hpp:58``)
- exclusion    = sorted-membership difference (``exclusion.hpp:33``)
- phrase       = (doc<<32|pos-i) key-set intersection over positions
  (``phrase_iterator.hpp:75-158``); phrase frequency feeds the scorer
- multiterm (prefix/wildcard/range/fuzzy) = dictionary range scan ->
  scored disjunction over matched terms (``multiterm_query.hpp:32-60``)
  with the reference's two-tier limited-sample default: the top
  ``DEFAULT_SCORED_TERMS_LIMIT`` (16) terms by docs_with_term are
  scored, the rest union unscored (pass scored_terms_limit=0 to score
  every term)

Scores use SumMerger semantics (the reference default ScoreMergeType).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field

import numpy as np
import pyarrow.compute as pc
import pyarrow as pa

_EMPTY_I = np.empty(0, dtype=np.int64)


def _empty(dtype) -> tuple[np.ndarray, np.ndarray]:
    return _EMPTY_I, np.empty(0, dtype=dtype)


# ---------------------------------------------------------------------------
# AST nodes
# ---------------------------------------------------------------------------


@dataclass
class Filter:
    def prepare(self, searcher, scorer, boost: float = 1.0):
        raise NotImplementedError



def _term_weight(scorer, fs, st) -> float:
    """Per-term collected weight: scorers that need collection term
    frequency (LM family) expose ``term_stat``; everything else uses
    the classic idf(docs_with_field, docs_with_term)."""
    f = getattr(scorer, "term_stat", None)
    if f is not None:
        return f(fs, st.docs_with_term, st.total_tf)
    return scorer.idf(fs.docs_with_field, st.docs_with_term)


@dataclass
class Term(Filter):
    term: str
    boost: float = 1.0
    field: str | None = None  # None = the index's default text field

    def prepare(self, searcher, scorer, boost: float = 1.0):
        st = searcher.resolve_term(self.term, self.field)
        fs = searcher.field_stats(self.field)
        ctx = scorer.make_ctx(
            fs,
            _term_weight(scorer, fs, st)
            if st.docs_with_term
            else 0.0,
            boost * self.boost,
        )
        return PreparedTerm(searcher, st, ctx, scorer, self.field)


@dataclass
class PayloadTerm(Filter):
    """Term filter scored from the stored PAY occurrence stream (the
    public PayloadScoreQuery pattern over the reference's ``payload``
    attribute, ``core/analysis/token_attributes.hpp:67``):
    ``score(doc) = agg(payloads of the term's occurrences in doc) *
    boost``. Requires an index built with ``index_features=("pay",)``
    (e.g. via the ``delimited_payload`` analyzer)."""

    term: str
    agg: str = "sum"  # sum | max | min | avg
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        st = searcher.resolve_term(self.term, self.field)
        return PreparedPayloadTerm(searcher, st, boost * self.boost,
                                   self.agg, scorer)


@dataclass
class Terms(Filter):
    """Set of terms with optional per-term boost and min_match
    (``core/search/terms_filter.hpp:37-83``)."""

    terms: list
    min_match: int = 1
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        children = [
            Term(t if isinstance(t, str) else t[0],
                 1.0 if isinstance(t, str) else t[1], field=self.field).prepare(
                searcher, scorer, boost * self.boost
            )
            for t in self.terms
        ]
        return PreparedDisjunction(children, self.min_match, scorer)


def _cached_scan(searcher, key: tuple, compute) -> list[str]:
    """Memoize a full-dictionary predicate scan (fuzzy/wildcard term
    expansion) on the searcher snapshot: the matched term set is a pure
    function of (pattern, dictionary), and the scan — not the postings
    — dominates these queries warm. Cleared on reopen()."""
    cache = getattr(searcher, "_scan_cache", None)
    if cache is None:
        return compute()
    hit = cache.get(key)
    if hit is None:
        hit = compute()
        if len(cache) >= 32:
            cache.pop(next(iter(cache)))
        cache[key] = hit
    return hit


def _prefix_successor(p: str) -> str | None:
    """Smallest string greater than every string with prefix ``p`` (the
    exclusive upper bound of the prefix's dictionary range); None when
    unbounded. Skips the surrogate gap so Python/UTF-8 orders agree."""
    for i in range(len(p) - 1, -1, -1):
        c = ord(p[i])
        if c < 0x10FFFF:
            nxt = c + 1
            if 0xD800 <= nxt <= 0xDFFF:
                nxt = 0xE000
            return p[:i] + chr(nxt)
    return None


@dataclass
class Prefix(Filter):
    prefix: str
    boost: float = 1.0
    field: str | None = None
    scored_terms_limit: int | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        # the prefix's matches are exactly one dictionary range — two
        # binary searches per segment, no predicate scan (the reference
        # walks the FST range the same way, core/search/prefix_filter.cpp)
        hi = _prefix_successor(self.prefix)
        matched = searcher.scan_terms_range(
            self.prefix, hi, inc_lo=True, inc_hi=False, field=self.field)
        return _multiterm(searcher, scorer, matched, boost * self.boost,
                          self.field, self.scored_terms_limit,
                          node_key=("prefix", self.field, self.prefix))


@dataclass
class Range(Filter):
    """Term range on binary term order (``core/search/range_filter.hpp``)."""

    lo: str | None = None
    hi: str | None = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0
    field: str | None = None
    scored_terms_limit: int | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        matched = searcher.scan_terms_range(
            self.lo, self.hi, self.include_lo, self.include_hi, self.field)
        return _multiterm(searcher, scorer, matched, boost * self.boost,
                          self.field, self.scored_terms_limit,
                          node_key=("range", self.field, self.lo, self.hi,
                                    self.include_lo, self.include_hi))


def _like_literal_prefix(like: str) -> str:
    """Literal prefix of a LIKE pattern (up to the first metachar)."""
    out = []
    i = 0
    while i < len(like):
        c = like[i]
        if c in "%_":
            break
        if c == "\\" and i + 1 < len(like):
            out.append(like[i + 1])
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


def _wildcard_pred(like: str):
    def pred(terms: np.ndarray):
        arr = pa.array(terms, type=pa.string())
        m = pc.match_like(arr, like).to_numpy(zero_copy_only=False)
        return terms[m].tolist()
    return pred


@dataclass
class Wildcard(Filter):
    """`%`/`_` (or `*`/`?`) pattern over the term dictionary
    (``core/search/wildcard_filter.hpp:56``). A literal prefix before
    the first metachar narrows the dictionary scan to one range (the
    reference's automaton walks the FST the same way)."""

    pattern: str
    boost: float = 1.0
    field: str | None = None
    scored_terms_limit: int | None = None

    def _like(self) -> str:
        return self.pattern.replace("*", "%").replace("?", "_")

    def prepare(self, searcher, scorer, boost: float = 1.0):
        like = self._like()
        lit = _like_literal_prefix(like)
        if lit == like:  # no metachars: exact term
            return Term(lit, self.boost, self.field).prepare(searcher, scorer, boost)
        nk = ("wildcard", self.field, like)
        matched = _cached_scan(
            searcher, nk,
            lambda: searcher.scan_terms(
                _wildcard_pred(like), self.field,
                lo=lit or None, hi=_prefix_successor(lit) if lit else None,
                inc_hi=False))
        return _multiterm(searcher, scorer, matched, boost * self.boost,
                          self.field, self.scored_terms_limit,
                          node_key=nk)


_REGEX_META = set(".^$*+?()[]{}|\\")


def _regex_literal_prefix(pat: str) -> str:
    """Literal prefix of a regex usable to narrow the dictionary scan
    (the automaton common-prefix walk). Conservative: a following
    ``* ? {`` quantifier makes the last literal char optional (drop
    it), and any ``|`` anywhere disables narrowing (a top-level
    alternation need not share the prefix)."""
    if "|" in pat:
        return ""
    out = []
    for i, c in enumerate(pat):
        if c in _REGEX_META:
            if c in "*?{" and out:
                out.pop()
            break
        out.append(c)
    return "".join(out)


@dataclass
class Regexp(Filter):
    """Full-match regular expression over the term dictionary — the
    generalization of ``by_wildcard`` (whose `%`/`_` patterns the
    reference compiles to the same UTF-8 automaton machinery,
    ``core/utils/wildcard_utils.hpp:30-38`` via ``fst::MakeAutomaton``);
    the pattern must match the ENTIRE term (anchored), like Lucene's
    RegexpQuery. Matching terms form a multiterm union with the same
    two-tier scored/unscored split as prefix/wildcard/fuzzy."""

    pattern: str
    boost: float = 1.0
    field: str | None = None
    scored_terms_limit: int | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        anchored = f"^(?:{self.pattern})$"

        def pred(terms: np.ndarray):
            arr = pa.array(terms, type=pa.string())
            m = pc.match_substring_regex(arr, anchored) \
                .to_numpy(zero_copy_only=False)
            return terms[m].tolist()

        lit = _regex_literal_prefix(self.pattern)
        nk = ("regexp", self.field, self.pattern)
        matched = _cached_scan(
            searcher, nk,
            lambda: searcher.scan_terms(
                pred, self.field,
                lo=lit or None, hi=_prefix_successor(lit) if lit else None,
                inc_hi=False))
        return _multiterm(searcher, scorer, matched, boost * self.boost,
                          self.field, self.scored_terms_limit,
                          node_key=nk)


@dataclass
class Fuzzy(Filter):
    """Levenshtein distance <= max_distance term expansion
    (``core/search/levenshtein_filter.hpp:74-93``). The reference
    intersects a parametric DFA with the FST; here a vectorized banded
    DP over length-filtered dictionary candidates (same result set)."""

    term: str
    max_distance: int = 1
    prefix: str = ""
    boost: float = 1.0
    field: str | None = None
    scored_terms_limit: int | None = None
    transpositions: bool = False  # Damerau/OSA (with_transpositions)

    def prepare(self, searcher, scorer, boost: float = 1.0):
        target = self.term
        d = self.max_distance

        def pred(terms: np.ndarray):
            # vectorized length band (the candidate filter the
            # parametric DFA gives the reference for free)
            lens = pc.utf8_length(pa.array(terms, type=pa.string()))
            keep = np.abs(lens.to_numpy(zero_copy_only=False)
                          - len(target)) <= d
            cands = terms[keep].tolist()
            if not cands:
                return []
            dist = _levenshtein_many(target, cands, d,
                                     transpositions=self.transpositions)
            return [t for t, dd in zip(cands, dist) if dd <= d]

        nk = ("fuzzy", self.field, target, d, self.prefix,
              self.transpositions)
        matched = _cached_scan(
            searcher, nk,
            lambda: searcher.scan_terms(
                pred, self.field,
                lo=self.prefix or None,
                hi=_prefix_successor(self.prefix) if self.prefix else None,
                inc_hi=False))
        return _multiterm(searcher, scorer, matched, boost * self.boost,
                          self.field, self.scored_terms_limit,
                          node_key=nk)


@dataclass
class Phrase(Filter):
    """Phrase over positions (``core/search/phrase_filter.hpp``): fixed
    (all simple terms) or *variadic* — a slot may be a dict
    ``{"wildcard": pat} | {"prefix": p} | {"fuzzy": t, "distance": d} |
    {"any_of": [t1, t2]}``, expanded against the dictionary like the
    reference's wildcard/levenshtein phrase parts. Phrase frequency
    (count of matching start positions) is the tf fed to the scorer;
    per-term idfs sum into one stats group."""

    terms: list
    boost: float = 1.0
    field: str | None = None
    # extra position gap BEFORE each slot (reference by_phrase parts
    # carry an offset each, core/search/phrase_filter.hpp:135 —
    # push_back(part, offs) places the part offs positions beyond the
    # adjacent slot). gaps[0] is ignored; slot i sits at
    # start + i + sum(gaps[1..i]).
    gaps: list | None = None

    def _slot_terms(self, searcher, slot) -> list[str]:
        if isinstance(slot, str):
            return [slot]
        if "any_of" in slot:
            return list(slot["any_of"])
        if "prefix" in slot:
            p = slot["prefix"]
            return searcher.scan_terms_range(
                p, _prefix_successor(p), inc_hi=False, field=self.field)
        if "wildcard" in slot:
            like = slot["wildcard"].replace("*", "%").replace("?", "_")
            lit = _like_literal_prefix(like)
            return searcher.scan_terms(
                _wildcard_pred(like), self.field,
                lo=lit or None, hi=_prefix_successor(lit) if lit else None,
                inc_hi=False)
        if "fuzzy" in slot:
            target = slot["fuzzy"]
            d = int(slot.get("distance", 1))

            def pred(ts: np.ndarray):
                lens = pc.utf8_length(pa.array(ts, type=pa.string()))
                keep = np.abs(lens.to_numpy(zero_copy_only=False)
                              - len(target)) <= d
                cands = ts[keep].tolist()
                if not cands:
                    return []
                dist = _levenshtein_many(target, cands, d)
                return [t for t, dd in zip(cands, dist) if dd <= d]

            return searcher.scan_terms(pred, self.field)
        raise ValueError(f"bad phrase slot: {slot!r}")

    def prepare(self, searcher, scorer, boost: float = 1.0):
        slot_states = []
        for slot in self.terms:
            terms = self._slot_terms(searcher, slot)
            slot_states.append(
                [searcher.resolve_term(t, self.field) for t in terms]
            )
        fs = searcher.field_stats(self.field)
        idf_sum = sum(
            _term_weight(scorer, fs, st)
            for states in slot_states for st in states if st.docs_with_term
        )
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        shifts = None
        if self.gaps is not None:
            if len(self.gaps) != len(self.terms):
                raise ValueError("gaps must have one entry per slot")
            shifts = (np.arange(len(self.terms), dtype=np.int64)
                      + np.concatenate([[0], np.cumsum(
                          np.asarray(self.gaps[1:], dtype=np.int64))])
                      ).tolist() if len(self.terms) > 1 else [0]
        return PreparedPhrase(searcher, slot_states, ctx, scorer, self.field,
                              shifts=shifts)


@dataclass
class SamePosition(Filter):
    """All terms at the identical position
    (``core/search/same_position_filter.hpp:46``) — the phrase kernel
    with a zero shift for every term."""

    terms: list
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        states = [searcher.resolve_term(t, self.field) for t in self.terms]
        fs = searcher.field_stats(self.field)
        idf_sum = sum(
            _term_weight(scorer, fs, st)
            for st in states if st.docs_with_term
        )
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        return PreparedPhrase(searcher, [[st] for st in states], ctx, scorer,
                              self.field, same_position=True)


@dataclass
class SloppyPhrase(Filter):
    """Ordered proximity phrase: the terms must appear in query order
    (strictly increasing positions) with total span slack
    ``(p_last - p_first) - (m-1) <= slop``; ``slop=0`` degenerates to
    the exact adjacent phrase. This is the ordered span-near query
    the reference expresses through ``by_phrase`` with per-term
    position offsets (``core/search/phrase_filter.hpp:135`` variadic
    parts carry an offset each); here the offsets are existentially
    quantified up to the slop budget instead of fixed. tf = number of
    first-term positions opening a qualifying chain; per-term idfs sum
    into one stats group like Phrase."""

    terms: list
    slop: int = 0
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        states = [searcher.resolve_term(t, self.field) for t in self.terms]
        fs = searcher.field_stats(self.field)
        idf_sum = sum(
            _term_weight(scorer, fs, st)
            for st in states if st.docs_with_term
        )
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        return PreparedSloppyPhrase(searcher, states, int(self.slop),
                                    ctx, scorer, self.field)


@dataclass
class SpanFirst(Filter):
    """Term restricted to the first ``end`` token positions of the doc
    (the Lucene SpanFirstQuery analogue; beyond-reference — position
    streams are already indexed for phrases, this reads the same keys):
    matches docs where ``term`` occurs at position < ``end``; tf counts
    only qualifying occurrences, scored like Term."""

    term: str
    end: int = 1
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        st = searcher.resolve_term(self.term, self.field)
        fs = searcher.field_stats(self.field)
        ctx = scorer.make_ctx(
            fs,
            _term_weight(scorer, fs, st)
            if st.docs_with_term else 0.0,
            boost * self.boost,
        )
        return PreparedSpanFirst(searcher, st, int(self.end), ctx, scorer,
                                 self.field)


@dataclass
class NegativeBoost(Filter):
    """Demotion composite (the Lucene BoostingQuery analogue;
    beyond-reference): docs match exactly the ``positive`` filter; a
    doc that ALSO matches ``negative`` keeps its positive score
    multiplied by ``neg_boost`` (< 1 demotes, the negative side never
    adds or removes matches)."""

    positive: "Filter"
    negative: "Filter"
    neg_boost: float = 0.5
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedNegativeBoost(
            self.positive.prepare(searcher, scorer, boost * self.boost),
            self.negative.prepare(searcher, scorer, 1.0),
            float(self.neg_boost), scorer)


@dataclass
class ConstantScore(Filter):
    """Filter-context wrapper (the Lucene ConstantScoreQuery / ES
    filter clause): matches exactly what ``filter`` matches but always
    scores ``score * boost`` — inside an ``And`` this is the classic
    "must match, don't score" clause (score=0)."""

    filter: "Filter"
    score: float = 0.0
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedConstantScore(
            self.filter.prepare(searcher, scorer, 1.0),
            float(self.score) * float(boost) * self.boost, scorer)


@dataclass
class SpanNot(Filter):
    """Positional exclusion (the Lucene SpanNotQuery analogue,
    beyond-reference): matches occurrences of ``term`` that have NO
    occurrence of ``exclude`` within ``pre`` positions before or
    ``post`` positions after; a doc matches iff at least one such
    occurrence survives, tf = surviving occurrences, scored like
    Term."""

    term: str
    exclude: str
    pre: int = 0
    post: int = 0
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        st = searcher.resolve_term(self.term, self.field)
        ex = searcher.resolve_term(self.exclude, self.field)
        fs = searcher.field_stats(self.field)
        ctx = scorer.make_ctx(
            fs,
            _term_weight(scorer, fs, st)
            if st.docs_with_term else 0.0,
            boost * self.boost,
        )
        return PreparedSpanNot(searcher, st, ex, int(self.pre),
                               int(self.post), ctx, scorer, self.field)


@dataclass
class SpanContaining(Filter):
    """Span containment (the Lucene SpanContainingQuery analogue,
    beyond-reference): the "big" span is an ordered pair
    ``(open_term, close_term)`` with ``close`` after ``open`` by at
    most ``window`` positions; a doc matches iff some big span CONTAINS
    an occurrence of ``little`` (open_pos <= little_pos <= close_pos).
    tf = distinct qualifying open positions; the stats group sums the
    three term idfs (same convention as Phrase/UnorderedNear)."""

    open_term: str
    close_term: str
    little: str
    window: int = 8
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        states = [searcher.resolve_term(t, self.field)
                  for t in (self.open_term, self.close_term, self.little)]
        fs = searcher.field_stats(self.field)
        idf_sum = sum(_term_weight(scorer, fs, st)
                      for st in states if st.docs_with_term)
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        return PreparedSpanContaining(searcher, states, int(self.window),
                                      ctx, scorer, self.field)


@dataclass
class SpanWithin(Filter):
    """Span enclosure (the Lucene SpanWithinQuery analogue,
    beyond-reference — the dual of :class:`SpanContaining`): the "big"
    span is an ordered ``(open_term, close_term)`` pair with ``close``
    after ``open`` by at most ``window`` positions; a doc matches iff
    some occurrence of ``little`` LIES WITHIN a big span
    (open_pos <= little_pos <= close_pos). Same doc set as
    SpanContaining but tf counts the enclosed LITTLE occurrences
    (Lucene reports the little spans here, the big spans there)."""

    open_term: str
    close_term: str
    little: str
    window: int = 8
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        states = [searcher.resolve_term(t, self.field)
                  for t in (self.open_term, self.close_term, self.little)]
        fs = searcher.field_stats(self.field)
        idf_sum = sum(_term_weight(scorer, fs, st)
                      for st in states if st.docs_with_term)
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        return PreparedSpanWithin(searcher, states, int(self.window),
                                  ctx, scorer, self.field)


@dataclass
class UnorderedNear(Filter):
    """Unordered window proximity (the Lucene SpanNearQuery
    ``inOrder=false`` analogue; beyond-reference — the reference's
    ``by_phrase`` variadic offsets express only ORDERED proximity):
    every distinct query term must occur in the doc with all K chosen
    positions inside a window of span <= ``window``
    (``max(pos) - min(pos) <= window``). Exact anchor formulation: a
    qualifying position set has a minimum element p, so the doc
    matches iff SOME occurrence p of SOME term has every other term
    occurring in ``[p, p + window]`` — one searchsorted per
    (anchor-term, other-term) pair over all anchors at once, no per-doc
    loop. tf = number of distinct qualifying anchor positions; per-term
    idfs sum into one stats group like Phrase."""

    terms: list
    window: int = 0
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        if len(set(self.terms)) != len(self.terms):
            raise ValueError("UnorderedNear terms must be distinct")
        states = [searcher.resolve_term(t, self.field) for t in self.terms]
        fs = searcher.field_stats(self.field)
        idf_sum = sum(
            _term_weight(scorer, fs, st)
            for st in states if st.docs_with_term
        )
        ctx = scorer.make_ctx(fs, idf_sum, boost * self.boost)
        return PreparedUnorderedNear(searcher, states, int(self.window),
                                     ctx, scorer, self.field)


@dataclass
class BM25F(Filter):
    """BM25F multi-field weighted scoring (Robertson & Zaragoza, "The
    Probabilistic Relevance Framework: BM25 and Beyond", 2009 — public
    knowledge; the reference scores one field at a time,
    ``core/search/bm25.cpp``, so this is a beyond-reference composite).
    Per doc and term t the field-normalized weighted tf is

        wtf_t = sum_f  w_f * tf_{t,f} / B_{f,d}
        B_{f,d} = (1 - b) + b * dl_{f,d} / avgdl_f

    saturated ONCE (the defining BM25F property — weighting happens
    before saturation, not per-field BM25 summed):

        score = sum_t (k1 + 1) * idf_t * wtf_t / (k1 + wtf_t)

    idf_t = log1p((N - df_t + 0.5)/(df_t + 0.5)) with df_t = docs
    containing t in ANY scored field and N = docs_with_field of the
    first listed field. Exhaustive evaluation (no cross-field
    block-max bound); all math in float64, cast at return."""

    terms: list
    fields: dict  # field name -> weight
    k1: float = 1.2
    b: float = 0.75
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        fnames = list(self.fields)
        states = {
            (f, t): searcher.resolve_term(t, f)
            for f in fnames for t in self.terms
        }
        # global avgdl per field (collector semantics: sums over segs)
        avgdl = {}
        for f in fnames:
            fs = searcher.field_stats(f)
            avgdl[f] = (fs.total_term_freq / fs.docs_with_field
                        if fs.docs_with_field else 1.0)
        n_docs = searcher.field_stats(fnames[0]).docs_with_field
        # union df per term: per segment, union of the per-field doc
        # lists (decoded postings are FIFO-cached on the segment, so
        # the execute pass below reuses them)
        dfs = {}
        for t in self.terms:
            df = 0
            for i, seg in enumerate(searcher.segments):
                parts = []
                for f in fnames:
                    row = states[(f, t)].rows[i]
                    if row >= 0:
                        parts.append(seg.postings(int(row)).docs)
                if len(parts) == 1:
                    df += parts[0].size
                elif parts:
                    df += np.unique(np.concatenate(parts)).size
            dfs[t] = df
        idf = {
            t: float(np.log1p(((n_docs - dfs[t]) + 0.5) / (dfs[t] + 0.5)))
            for t in self.terms
        }
        return PreparedBM25F(searcher, self.terms, self.fields, states,
                             avgdl, idf, float(self.k1), float(self.b),
                             float(boost * self.boost), scorer)


@dataclass
class NumericRange(Filter):
    """Numeric range over a stored column — the pushdown analogue of the
    reference's numeric-trie ``by_granular_range``
    (``core/search/granular_range_filter.hpp:40-94``; SURVEY §2.4 maps
    it to a Parquet predicate on the numeric column). Evaluated as a
    vectorized mask over the segment's docmap column."""

    column: str
    lo: float | int | None = None
    hi: float | int | None = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedNumericRange(searcher, self, scorer)


@dataclass
class GranularRange(Filter):
    """Numeric range over numeric-trie terms
    (``core/search/granular_range_filter.hpp:40-94``): the range is
    decomposed into O(levels x step) per-level dictionary ranges, so it
    touches exponentially fewer terms than a raw term range. Requires
    the column indexed via ``build_index(numeric_fields=(col,))``.
    Matching is unscored (constant 0, filter semantics)."""

    field: str = ""
    lo: int | float | None = None
    hi: int | float | None = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0
    as_float: bool | None = None  # None = infer from bound types

    def prepare(self, searcher, scorer, boost: float = 1.0):
        from iresearch_ray.index.numeric import (
            float_sortable_scalar,
            split_range,
            term_at,
            to_sortable,
        )

        is_float = self.as_float
        if is_float is None:
            is_float = isinstance(self.lo, float) or isinstance(self.hi, float)
        if is_float:
            ulo = float_sortable_scalar(
                self.lo if self.lo is not None else -np.inf)
            uhi = float_sortable_scalar(
                self.hi if self.hi is not None else np.inf)
            # exclusive float bounds step one representable value
            if not self.include_lo:
                ulo += 1
            if not self.include_hi:
                uhi -= 1
        else:
            lo = self.lo if self.lo is not None else -(1 << 63)
            hi = self.hi if self.hi is not None else (1 << 63) - 1
            if not self.include_lo:
                lo += 1
            if not self.include_hi:
                hi -= 1
            if lo > hi:
                return PreparedEmpty(scorer)
            ulo = int(to_sortable(np.asarray([lo]))[0])
            uhi = int(to_sortable(np.asarray([hi]))[0])
        if ulo > uhi:
            return PreparedEmpty(scorer)
        ranges = [
            (term_at(s, a), term_at(s, b)) for s, a, b in split_range(ulo, uhi)
        ]
        return PreparedGranularRange(searcher, self.field, ranges, scorer)


@dataclass
class NGramSimilarity(Filter):
    """N-gram similarity (``core/search/ngram_similarity_filter.hpp``):
    docs where the longest chain of query word-n-grams appearing *in
    order* (strictly increasing positions) reaches >= ``threshold``
    fraction of the query's n-grams; the chain ratio scales the score
    (filter_boost semantics, ``ngram_similarity_query.cpp:455``)."""

    text: str
    threshold: float = 0.7
    ngram: int = 2
    boost: float = 1.0
    field: str | None = None

    def prepare(self, searcher, scorer, boost: float = 1.0):
        words = self.text.split()
        grams = [words[i : i + self.ngram] for i in range(len(words) - self.ngram + 1)]
        if not grams:
            return PreparedEmpty(scorer)
        children = [Phrase(g, field=self.field).prepare(searcher, scorer, boost * self.boost)
                    for g in grams]
        return PreparedNGramSimilarity(children, self.threshold, scorer)


@dataclass
class And(Filter):
    filters: list = dc_field(default_factory=list)
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        pos = [f.prepare(searcher, scorer, boost * self.boost)
               for f in self.filters if not isinstance(f, Not)]
        neg = [f.filter.prepare(searcher, scorer, boost * self.boost)
               for f in self.filters if isinstance(f, Not)]
        if not pos:
            pos = [All().prepare(searcher, scorer, boost * self.boost)]
        return PreparedConjunction(pos, neg, scorer)


@dataclass
class Or(Filter):
    filters: list = dc_field(default_factory=list)
    min_match: int = 1
    boost: float = 1.0
    # ScoreMergeType: "sum" (default) | "max" | "dismax" (max +
    # tie_breaker * (sum - max), the Lucene DisjunctionMaxQuery
    # semantics; tie_breaker=0 degenerates to "max", 1 to "sum")
    score_merge: str = "sum"
    tie_breaker: float = 0.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        pos = [f.prepare(searcher, scorer, boost * self.boost)
               for f in self.filters if not isinstance(f, Not)]
        neg = [f.filter.prepare(searcher, scorer, boost * self.boost)
               for f in self.filters if isinstance(f, Not)]
        dis = PreparedDisjunction(pos, self.min_match, scorer,
                                  self.score_merge, self.tie_breaker)
        if neg:
            return PreparedConjunction([dis], neg, scorer)
        return dis


@dataclass
class Not(Filter):
    """Negation — only meaningful inside And/Or (``boolean_filter.hpp:117``);
    a top-level Not is executed as All AND NOT x."""

    filter: Filter = None
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return And([All(), self]).prepare(searcher, scorer, boost)


@dataclass
class All(Filter):
    """Match all docs, constant boost score (``core/search/all_filter.hpp``)."""

    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedAll(searcher, np.dtype(scorer.dtype).type(boost * self.boost), scorer)


@dataclass
class Empty(Filter):
    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedEmpty(scorer)


@dataclass
class ColumnExistence(Filter):
    """Docs where a stored column is non-null / non-empty
    (``core/search/column_existence_filter.hpp:47``)."""

    column: str
    boost: float = 1.0

    def prepare(self, searcher, scorer, boost: float = 1.0):
        return PreparedColumnExistence(
            searcher, self.column, np.dtype(scorer.dtype).type(boost * self.boost), scorer
        )


# ---------------------------------------------------------------------------
# prepared nodes (hold index-wide stats; execute per segment)
# ---------------------------------------------------------------------------


class Prepared:
    def __init__(self, scorer):
        self.scorer = scorer
        self.dtype = scorer.dtype

    def execute(self, seg_ord: int) -> tuple[np.ndarray, np.ndarray]:
        """-> (local docs ascending, scores)."""
        raise NotImplementedError

    def cost(self, seg_ord: int) -> int:
        """Upper bound on matched docs (``core/search/cost.hpp``)."""
        return 1 << 62

    def max_score(self, seg_ord: int) -> float:
        """Upper bound on any doc's score in this segment (score.max
        analogue, ``core/search/score.hpp:82-95``); +inf when unknown.
        Lets the searcher skip whole segments below the top-k
        threshold."""
        return float("inf")


class PreparedTerm(Prepared):
    def __init__(self, searcher, state, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.state = state  # TermState
        self.ctx = ctx
        self.field = field

    def cost(self, seg_ord):
        row = self.state.rows[seg_ord]
        return 0 if row < 0 else int(self.searcher.segments[seg_ord].doc_freq[row])

    def cursor(self, seg_ord):
        row = self.state.rows[seg_ord]
        if row < 0:
            return None
        if not hasattr(self, "_cursors"):
            self._cursors = {}
        cur = self._cursors.get(seg_ord)
        if cur is None:
            cur = self.searcher.segments[seg_ord].cursor(int(row))
            self._cursors[seg_ord] = cur
        return cur

    def max_score(self, seg_ord):
        cur = self.cursor(seg_ord)
        if cur is None:
            return float("-inf")
        return float(
            self.scorer.upper_bound_many(self.ctx, cur.max_tf, cur.min_dl).max()
        )

    def execute(self, seg_ord):
        row = self.state.rows[seg_ord]
        if row < 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        pl = seg.postings(int(row))
        dls = seg.field_norms(self.field)[pl.docs - 1]
        return pl.docs, self.scorer.score(self.ctx, pl.tfs, dls)


class PreparedPayloadTerm(Prepared):
    """Docs of one term scored by an aggregate of its per-occurrence
    payloads — one reduceat over the decoded PAY stream per segment."""

    _AGG = {"sum": np.add, "max": np.maximum, "min": np.minimum}

    def __init__(self, searcher, state, boost, agg, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.state = state
        self.boost = float(boost)
        if agg not in ("sum", "max", "min", "avg"):
            raise ValueError(f"unknown payload agg {agg!r}")
        self.agg = agg

    def cost(self, seg_ord):
        row = self.state.rows[seg_ord]
        return 0 if row < 0 else int(
            self.searcher.segments[seg_ord].doc_freq[row])

    def execute(self, seg_ord):
        row = self.state.rows[seg_ord]
        if row < 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        pl = seg.postings(int(row))
        pays = seg.payloads(int(row)).astype(np.float64)
        run_starts = np.concatenate(([0], np.cumsum(pl.tfs)[:-1]))
        if self.agg == "avg":
            v = np.add.reduceat(pays, run_starts) / pl.tfs
        else:
            v = self._AGG[self.agg].reduceat(pays, run_starts)
        return pl.docs, (v * self.boost).astype(self.dtype)


class PreparedDisjunction(Prepared):
    def __init__(self, children, min_match, scorer, score_merge="sum",
                 tie_breaker=0.0):
        super().__init__(scorer)
        self.children = children
        self.min_match = max(1, int(min_match))
        self.score_merge = score_merge
        self.tie_breaker = float(tie_breaker)

    def cost(self, seg_ord):
        return sum(c.cost(seg_ord) for c in self.children)

    def max_score(self, seg_ord):
        vals = [c.max_score(seg_ord) for c in self.children]
        if not vals or all(v == float("-inf") for v in vals):
            return float("-inf")
        # a child absent from the segment contributes nothing (scores >= 0)
        return sum(v for v in vals if v != float("-inf"))

    def execute(self, seg_ord):
        parts = [c.execute(seg_ord) for c in self.children]
        return _merge_disjunction(
            [(d, s) for d, s in parts if d.size],
            self.min_match, self.score_merge, self.dtype,
            self.tie_breaker,
        )


class PreparedConjunction(Prepared):
    def __init__(self, positives, negatives, scorer):
        super().__init__(scorer)
        self.positives = positives
        self.negatives = negatives

    def cost(self, seg_ord):
        return min(p.cost(seg_ord) for p in self.positives)

    def max_score(self, seg_ord):
        vals = [p.max_score(seg_ord) for p in self.positives]
        if any(v == float("-inf") for v in vals):
            return float("-inf")  # a required child is absent
        return sum(vals)

    def execute(self, seg_ord):
        # cost-sorted leapfrog: start from the cheapest child
        # (``boolean_filter.hpp:79``, cost-based ordering)
        parts = sorted(
            (p.execute(seg_ord) for p in self.positives), key=lambda t: t[0].size
        )
        docs, scores = parts[0]
        scores = scores.copy()
        for d, s in parts[1:]:
            if docs.size == 0 or d.size == 0:
                return _empty(self.dtype)
            idx = np.searchsorted(d, docs)
            valid = idx < d.size
            match = np.zeros(docs.size, dtype=bool)
            match[valid] = d[idx[valid]] == docs[valid]
            docs = docs[match]
            scores = scores[match] + s[idx[match]]
        for n in self.negatives:
            if docs.size == 0:
                break
            nd, _ = n.execute(seg_ord)
            if nd.size:
                idx = np.searchsorted(nd, docs)
                valid = idx < nd.size
                hit = np.zeros(docs.size, dtype=bool)
                hit[valid] = nd[idx[valid]] == docs[valid]
                docs, scores = docs[~hit], scores[~hit]
        return docs, scores.astype(self.dtype)


class PreparedPhrase(Prepared):
    def __init__(self, searcher, slot_states, ctx, scorer, field=None,
                 same_position=False, shifts=None):
        super().__init__(scorer)
        self.searcher = searcher
        # list per phrase slot of TermStates (1 for simple slots, many
        # for wildcard/fuzzy/prefix/set slots — the variadic phrase)
        self.slot_states = slot_states
        self.ctx = ctx
        self.field = field
        self.same_position = same_position
        # per-slot position shift relative to the phrase start: slot
        # index by default (adjacent), all-zero for same_position,
        # explicit for gap phrases (Phrase.gaps)
        if shifts is None:
            shifts = [0] * len(slot_states) if same_position \
                else list(range(len(slot_states)))
        self.shifts = [int(s) for s in shifts]

    def cost(self, seg_ord):
        costs = []
        for states in self.slot_states:
            c = 0
            for st in states:
                row = st.rows[seg_ord]
                if row >= 0:
                    c += int(self.searcher.segments[seg_ord].doc_freq[row])
            costs.append(c)
        return min(costs) if costs else 0

    def match_keys(self, seg_ord) -> np.ndarray:
        """Sorted ``(doc << 32) + start_pos`` keys of every phrase match
        in the segment (used by the phrase path itself and by the
        ordered-chain n-gram similarity DP)."""
        return self._cached(seg_ord)[2]

    def execute(self, seg_ord):
        docs, scores, _ = self._cached(seg_ord)
        return docs, scores

    def execute_restricted(self, seg_ord, cand: np.ndarray):
        """(docs, scores, match_keys) evaluated only over candidate docs
        ``cand`` (sorted) — per-doc results identical to the full
        evaluation for docs in ``cand`` (the n-gram DP's prefilter
        path). Memoized on the SEGMENT (survives across queries) keyed
        by (phrase rows, candidate-set fingerprint): the candidate set
        comes from memoized doc-level conjunctions, so repeat n-gram
        queries pass an identical ``cand`` and skip the position
        decode. Scores are recomputed by the caller's DP; the cached
        (docs, tfs->scores, keys) triple's score part depends on ctx —
        so the SCORE array is keyed by ctx constants too."""
        seg = self.searcher.segments[seg_ord]
        pm_cache = getattr(seg, "_phrase_match_cache", None)
        if pm_cache is None:
            pm_cache = seg._phrase_match_cache = {}
        ck = self._cache_key(seg_ord)
        fp = (ck, "restricted", cand.size,
              hash(cand.tobytes()) if cand.size else 0,
              *self.ctx.fingerprint())
        hit = pm_cache.get(fp)
        if hit is None:
            hit = self._execute_impl(seg_ord, cand=cand)
            if len(pm_cache) >= 64:
                pm_cache.pop(next(iter(pm_cache)))
            pm_cache[fp] = hit
        return hit

    def doc_candidates(self, seg_ord) -> np.ndarray:
        """Doc-level conjunction prefilter (sorted local ids): docs
        containing at least one term of EVERY slot, positions ignored —
        a superset of phrase matches computed from doc lists only, so
        the expensive position intersection runs over far fewer keys
        (reference conjunction-before-position shape,
        ``core/search/phrase_iterator.hpp:75-158``)."""
        if not hasattr(self, "_cand_memo"):
            self._cand_memo = {}
        hit = self._cand_memo.get(seg_ord)
        if hit is not None:
            return hit
        seg = self.searcher.segments[seg_ord]
        # cheapest-slot-first leapfrog (reference conjunction.hpp
        # cost ordering): the rarest slot decodes fully; every later
        # slot decodes ONLY the skip-list blocks that can contain a
        # surviving candidate once the candidate set is much smaller
        # than the slot's block count
        slot_rows = []
        for states in self.slot_states:
            rows = [int(st.rows[seg_ord]) for st in states
                    if st.rows[seg_ord] >= 0]
            if not rows:
                self._cand_memo[seg_ord] = _EMPTY_I
                return _EMPTY_I
            slot_rows.append(rows)
        slot_rows.sort(key=lambda rs: sum(int(seg.doc_freq[r]) for r in rs))
        common = None
        for rows in slot_rows:
            parts = []
            for r in rows:
                if common is not None and \
                        common.size * 4 < int(seg.doc_freq[r]) // 128:
                    cur = seg.cursor(r)
                    blocks = np.unique(
                        np.searchsorted(cur.last_doc, common, side="left"))
                    blocks = blocks[blocks < cur.n_blocks]
                    d, _ = cur.decode_blocks(blocks)
                else:
                    d = seg.postings(r).docs
                parts.append(d)
            sd = parts[0] if len(parts) == 1 \
                else np.unique(np.concatenate(parts))
            common = sd if common is None else _intersect_sorted(common, sd)
            if common.size == 0:
                break
        self._cand_memo[seg_ord] = common
        return common

    def _cached(self, seg_ord):
        # execute + match_keys are both needed by the n-gram DP; memoize
        # per segment so the phrase evaluates once
        if not hasattr(self, "_memo"):
            self._memo = {}
        hit = self._memo.get(seg_ord)
        if hit is None:
            hit = self._execute_impl(seg_ord)
            self._memo[seg_ord] = hit
        return hit

    def _cache_key(self, seg_ord):
        rows = tuple(
            tuple(int(st.rows[seg_ord]) for st in states)
            for states in self.slot_states
        )
        return (rows, tuple(self.shifts))

    def _execute_impl(self, seg_ord, cand: np.ndarray | None = None):
        seg = self.searcher.segments[seg_ord]
        # segment-level phrase-match cache: the match KEY SET is a pure
        # function of (segment, slot term rows), so repeated phrase /
        # n-gram queries skip the position intersection entirely (same
        # species as the decoded-postings FIFO: the CachingDirectory
        # analogue). Scores are NOT cached — they depend on global
        # collector stats and recompute per query from (docs, tfs).
        pm_cache = getattr(seg, "_phrase_match_cache", None)
        if pm_cache is None:
            pm_cache = seg._phrase_match_cache = {}
        ck = self._cache_key(seg_ord) if cand is None else None
        if ck is not None and ck in pm_cache:
            common, docs, tfs = pm_cache[ck]
            return self._frame_common(seg, common, docs, tfs)
        # two-phase evaluation (reference phrase_iterator over the .pos
        # skip data): doc-level conjunction of the slots first, then
        # decode positions ONLY for blocks containing candidate docs
        # (keys_for_docs). A phrase match needs every slot in the doc,
        # so restricting to the conjunction loses nothing — the match
        # key set stays complete and cacheable.
        # doc-level conjunction only when it can PAY: restricted decode
        # kicks in for a slot iff cand.size*4 < slot_df // 128, and
        # cand can never exceed the smallest slot's df — for HIGH^HIGH
        # grams (the cold-n-gram profile) the conjunction restricts
        # nothing, so skip its doc-stream intersections entirely
        slot_dfs = []
        for states in self.slot_states:
            d = sum(int(self.searcher.segments[seg_ord].doc_freq[
                st.rows[seg_ord]]) for st in states
                if st.rows[seg_ord] >= 0)
            if d == 0:
                return (*_empty(self.dtype), _EMPTY_I)
            slot_dfs.append(d)
        may_restrict = min(slot_dfs) * 4 < max(slot_dfs) // 128
        if cand is None:
            if may_restrict:
                cand = self.doc_candidates(seg_ord)
                if cand.size == 0:
                    return (*_empty(self.dtype), _EMPTY_I)
        else:
            cand = _intersect_sorted(self.doc_candidates(seg_ord), cand)
            if cand.size == 0:
                return (*_empty(self.dtype), _EMPTY_I)
        keysets = []
        POSM = np.int64((1 << 32) - 1)
        for i, states in enumerate(self.slot_states):
            shift = np.int64(self.shifts[i])
            key_parts = []
            for st in states:
                row = st.rows[seg_ord]
                if row < 0:
                    continue
                # shift slot i's positions left by i: a phrase start p
                # matches iff every slot i has a position p+i —
                # subtracting the shift preserves sort order once
                # positions < shift are dropped.
                # Adaptive: decode only candidate-covering blocks when
                # the candidates touch a small fraction of the term's
                # 128-doc blocks (block coverage saturates at ~n_blocks,
                # so compare against the BLOCK count, not df); otherwise
                # the straight flat decode + cached shifted keys wins.
                if cand is not None and \
                        cand.size * 4 < int(seg.doc_freq[row]) // 128:
                    k0 = seg.keys_for_docs(int(row), cand)
                    if shift:
                        k0 = k0[(k0 & POSM) >= shift] - shift
                else:
                    k0 = seg.phrase_keys(int(row), int(shift))
                key_parts.append(k0)
            if not key_parts:
                return (*_empty(self.dtype), _EMPTY_I)
            if len(key_parts) > 1:
                keys = np.unique(np.concatenate(key_parts))
            else:
                keys = key_parts[0]  # already sorted
            keysets.append(keys)
        order = sorted(range(len(keysets)), key=lambda j: keysets[j].size)
        common = keysets[order[0]]
        for j in order[1:]:
            if common.size == 0:
                return (*_empty(self.dtype), _EMPTY_I)
            # sorted-array intersection (both sides sorted & unique) —
            # np.isin would re-sort the big side on every call
            ks = keysets[j]
            idx = np.searchsorted(ks, common)
            valid = idx < ks.size
            hit = np.zeros(common.size, dtype=bool)
            hit[valid] = ks[idx[valid]] == common[valid]
            common = common[hit]
        if ck is not None:
            docs, tfs = self._docs_tfs(common)
            if len(pm_cache) >= 64:
                pm_cache.pop(next(iter(pm_cache)))
            # (docs, tfs) are structural too — caching them skips the
            # per-query unique/sort over the key set (was ~half of the
            # warm n-gram cost)
            pm_cache[ck] = (common, docs, tfs)
            return self._frame_common(seg, common, docs, tfs)
        return self._frame_common(seg, common)

    @staticmethod
    def _docs_tfs(common: np.ndarray):
        docs_all = (common >> np.int64(32)).astype(np.int64)
        return np.unique(docs_all, return_counts=True)

    def _frame_common(self, seg, common: np.ndarray, docs=None, tfs=None):
        """(docs, scores, keys) from the match key set."""
        if common.size == 0:
            return (*_empty(self.dtype), _EMPTY_I)
        if docs is None:
            docs, tfs = self._docs_tfs(common)
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls), common


class PreparedSloppyPhrase(Prepared):
    """Greedy minimal-successor chain over per-slot sorted
    ``(doc << 32) | pos`` keys: from every first-term occurrence, each
    later slot resolves to its smallest same-doc position strictly
    after the chain's previous position (one ``searchsorted`` per
    slot, vectorized across ALL starts at once). The greedy chain
    minimizes the end position for a given start, so a start matches
    iff its greedy span slack is within the slop — no per-doc DP and
    no candidate enumeration beyond the true first-term occurrences."""

    _DOCM = ~np.int64((1 << 32) - 1)

    def __init__(self, searcher, states, slop, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.states = states
        self.slop = slop
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        dfs = []
        for st in self.states:
            row = st.rows[seg_ord]
            if row < 0:
                return 0
            dfs.append(int(self.searcher.segments[seg_ord].doc_freq[row]))
        return min(dfs) if dfs else 0

    def execute(self, seg_ord):
        hit = self._memo.get(seg_ord)
        if hit is None:
            hit = self._execute_impl(seg_ord)
            self._memo[seg_ord] = hit
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)

    def _execute_impl(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        rows = []
        for st in self.states:
            row = st.rows[seg_ord]
            if row < 0:
                return _EMPTY_I, _EMPTY_I
            rows.append(int(row))
        keys = [seg.phrase_keys(r, 0) for r in rows]
        start = keys[0]
        cur = start
        for k in keys[1:]:
            if cur.size == 0:
                return _EMPTY_I, _EMPTY_I
            idx = np.searchsorted(k, cur + 1, side="left")
            ok = idx < k.size
            nxt = k[np.minimum(idx, max(k.size - 1, 0))]
            ok &= (nxt & self._DOCM) == (cur & self._DOCM)
            start, cur = start[ok], nxt[ok]
        slack = (cur - start) - np.int64(len(keys) - 1)
        m = slack <= self.slop
        if not m.any():
            return _EMPTY_I, _EMPTY_I
        docs_all = (start[m] >> np.int64(32)).astype(np.int64)
        docs, tfs = np.unique(docs_all, return_counts=True)
        return docs, tfs


class PreparedSpanFirst(Prepared):
    """Position-restricted term: one mask over the term's sorted
    ``(doc << 32) | pos`` keys (pos < end), then per-doc counts."""

    def __init__(self, searcher, state, end, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.state = state
        self.end = end
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        row = self.state.rows[seg_ord]
        return 0 if row < 0 else int(
            self.searcher.segments[seg_ord].doc_freq[row])

    def execute(self, seg_ord):
        row = self.state.rows[seg_ord]
        if row < 0:
            return _empty(self.dtype)
        hit = self._memo.get(seg_ord)
        if hit is None:
            seg = self.searcher.segments[seg_ord]
            keys = seg.phrase_keys(int(row), 0)
            keys = keys[(keys & np.int64((1 << 32) - 1)) < self.end]
            docs, tfs = np.unique(
                (keys >> np.int64(32)).astype(np.int64),
                return_counts=True)
            hit = self._memo[seg_ord] = (docs, tfs)
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)


class PreparedNegativeBoost(Prepared):
    def __init__(self, positive, negative, neg_boost, scorer):
        super().__init__(scorer)
        self.positive = positive
        self.negative = negative
        self.neg_boost = neg_boost

    def cost(self, seg_ord):
        return self.positive.cost(seg_ord)

    def max_score(self, seg_ord):
        # neg_boost <= 1 demotes, > 1 promotes; bound accordingly
        v = self.positive.max_score(seg_ord)
        return v * max(1.0, self.neg_boost) if v != float("-inf") else v

    def execute(self, seg_ord):
        docs, scores = self.positive.execute(seg_ord)
        if docs.size == 0:
            return docs, scores
        ndocs, _ = self.negative.execute(seg_ord)
        if ndocs.size:
            idx = np.searchsorted(ndocs, docs)
            valid = idx < ndocs.size
            demote = np.zeros(docs.size, dtype=bool)
            demote[valid] = ndocs[np.minimum(idx, ndocs.size - 1)][valid] \
                == docs[valid]
            scores = scores.copy()
            scores[demote] = scores[demote] * scores.dtype.type(
                self.neg_boost)
        return docs, scores


class PreparedConstantScore(Prepared):
    def __init__(self, child, score, scorer):
        super().__init__(scorer)
        self.child = child
        self.const = score

    def cost(self, seg_ord):
        return self.child.cost(seg_ord)

    def max_score(self, seg_ord):
        return self.const

    def execute(self, seg_ord):
        docs, _ = self.child.execute(seg_ord)
        return docs, np.full(docs.size, self.const, dtype=self.dtype)


class PreparedSpanNot(Prepared):
    """One searchsorted of the exclude keys per segment: for each
    anchor key ``a``, the first exclude key >= max(a - pre, doc start)
    excludes ``a`` iff it is same-doc and <= a + post (keys are
    (doc << 32) | pos, so the doc-start clamp keeps a small ``pos``
    from borrowing into the previous doc's range)."""

    _DOCM = ~np.int64((1 << 32) - 1)

    def __init__(self, searcher, state, ex_state, pre, post, ctx, scorer,
                 field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.state = state
        self.ex_state = ex_state
        self.pre = pre
        self.post = post
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        row = self.state.rows[seg_ord]
        return 0 if row < 0 else int(
            self.searcher.segments[seg_ord].doc_freq[row])

    def execute(self, seg_ord):
        row = self.state.rows[seg_ord]
        if row < 0:
            return _empty(self.dtype)
        hit = self._memo.get(seg_ord)
        if hit is None:
            seg = self.searcher.segments[seg_ord]
            a = seg.phrase_keys(int(row), 0)
            ex_row = self.ex_state.rows[seg_ord]
            if ex_row >= 0 and a.size:
                b = seg.phrase_keys(int(ex_row), 0)
                lo = np.maximum(a - np.int64(self.pre), a & self._DOCM)
                idx = np.searchsorted(b, lo, side="left")
                valid = idx < b.size
                cand = b[np.minimum(idx, max(b.size - 1, 0))]
                excl = valid & ((cand & self._DOCM) == (a & self._DOCM)) \
                    & (cand <= a + np.int64(self.post))
                a = a[~excl]
            docs, tfs = np.unique(
                (a >> np.int64(32)).astype(np.int64), return_counts=True)
            hit = self._memo[seg_ord] = (docs, tfs)
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)


class PreparedSpanContaining(Prepared):
    """Maximal-span formulation over per-term sorted ``(doc<<32)|pos``
    keys: for each open-anchor ``a`` the largest valid close key is the
    last close <= a + window (one searchsorted); containment then needs
    only the FIRST little key >= a to fall at or before that close (one
    more searchsorted) — any little inside a smaller big span is inside
    the maximal one too, so checking the maximal span is exhaustive.
    Three sorted streams, two searchsorted passes, no per-doc loop."""

    _DOCM = ~np.int64((1 << 32) - 1)

    def __init__(self, searcher, states, window, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.states = states
        self.window = window
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        dfs = [0 if st.rows[seg_ord] < 0 else
               int(self.searcher.segments[seg_ord].doc_freq[st.rows[seg_ord]])
               for st in self.states]
        return min(dfs)

    def execute(self, seg_ord):
        hit = self._memo.get(seg_ord)
        if hit is None:
            rows = [st.rows[seg_ord] for st in self.states]
            if any(r < 0 for r in rows):
                hit = self._memo[seg_ord] = (
                    np.empty(0, np.int64), np.empty(0, np.int64))
            else:
                seg = self.searcher.segments[seg_ord]
                a, c, b = (seg.phrase_keys(int(r), 0) for r in rows)
                if a.size and c.size and b.size:
                    # maximal close per anchor: last c <= a + window,
                    # same doc, strictly after the open
                    ic = np.searchsorted(
                        c, a + np.int64(self.window), side="right") - 1
                    cv = c[np.maximum(ic, 0)]
                    ok = (ic >= 0) & (cv > a) \
                        & ((cv & self._DOCM) == (a & self._DOCM))
                    # first little >= open must sit inside [a, close]
                    ib = np.searchsorted(b, a, side="left")
                    bv = b[np.minimum(ib, max(b.size - 1, 0))]
                    ok &= (ib < b.size) & (bv <= cv)
                    a = a[ok]
                else:
                    a = np.empty(0, np.int64)
                docs, tfs = np.unique(
                    (a >> np.int64(32)).astype(np.int64),
                    return_counts=True)
                hit = self._memo[seg_ord] = (docs, tfs)
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)


class PreparedSpanWithin(Prepared):
    """Running-max-close formulation over per-term sorted
    ``(doc<<32)|pos`` keys: every open anchor ``a`` gets its maximal
    same-doc close ``cv(a)`` (last close <= a + window, strictly after
    the open; invalid anchors get int64.min). Because doc ids occupy
    the key's high bits and docs ascend, a plain
    ``np.maximum.accumulate`` over cv never lets an earlier doc's
    close reach a later doc's littles (smaller doc => smaller key), so
    a little ``b`` is enclosed iff the running max at the last open
    <= b is >= b — one searchsorted for the closes, one accumulate,
    one searchsorted for the littles; no per-doc loop."""

    _DOCM = ~np.int64((1 << 32) - 1)

    def __init__(self, searcher, states, window, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.states = states
        self.window = window
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        dfs = [0 if st.rows[seg_ord] < 0 else
               int(self.searcher.segments[seg_ord].doc_freq[st.rows[seg_ord]])
               for st in self.states]
        return min(dfs)

    def execute(self, seg_ord):
        hit = self._memo.get(seg_ord)
        if hit is None:
            rows = [st.rows[seg_ord] for st in self.states]
            if any(r < 0 for r in rows):
                hit = self._memo[seg_ord] = (
                    np.empty(0, np.int64), np.empty(0, np.int64))
            else:
                seg = self.searcher.segments[seg_ord]
                a, c, b = (seg.phrase_keys(int(r), 0) for r in rows)
                if a.size and c.size and b.size:
                    ic = np.searchsorted(
                        c, a + np.int64(self.window), side="right") - 1
                    cv = c[np.maximum(ic, 0)]
                    ok = (ic >= 0) & (cv > a) \
                        & ((cv & self._DOCM) == (a & self._DOCM))
                    cv_eff = np.where(ok, cv, np.int64(np.iinfo(np.int64).min))
                    runmax = np.maximum.accumulate(cv_eff)
                    ia = np.searchsorted(a, b, side="right") - 1
                    enc = (ia >= 0) & (runmax[np.maximum(ia, 0)] >= b)
                    b = b[enc]
                else:
                    b = np.empty(0, np.int64)
                docs, tfs = np.unique(
                    (b >> np.int64(32)).astype(np.int64),
                    return_counts=True)
                hit = self._memo[seg_ord] = (docs, tfs)
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)


class PreparedUnorderedNear(Prepared):
    """Anchor-on-the-minimum window check over per-slot sorted
    ``(doc << 32) | pos`` keys (see ``UnorderedNear``): for each slot a
    as the window minimum, every other slot s must have its smallest
    same-doc key >= anchor within ``anchor + window`` — K*(K-1)
    vectorized searchsorted passes, qualifying anchors deduped across
    slots for tf."""

    _DOCM = ~np.int64((1 << 32) - 1)

    def __init__(self, searcher, states, window, ctx, scorer, field=None):
        super().__init__(scorer)
        self.searcher = searcher
        self.states = states
        self.window = window
        self.ctx = ctx
        self.field = field
        self._memo: dict = {}

    def cost(self, seg_ord):
        dfs = []
        for st in self.states:
            row = st.rows[seg_ord]
            if row < 0:
                return 0
            dfs.append(int(self.searcher.segments[seg_ord].doc_freq[row]))
        return min(dfs) if dfs else 0

    def execute(self, seg_ord):
        hit = self._memo.get(seg_ord)
        if hit is None:
            hit = self._execute_impl(seg_ord)
            self._memo[seg_ord] = hit
        docs, tfs = hit
        if docs.size == 0:
            return _empty(self.dtype)
        seg = self.searcher.segments[seg_ord]
        dls = seg.field_norms(self.field)[docs - 1]
        return docs, self.scorer.score(self.ctx, tfs, dls)

    def _execute_impl(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        rows = []
        for st in self.states:
            row = st.rows[seg_ord]
            if row < 0:
                return _EMPTY_I, _EMPTY_I
            rows.append(int(row))
        keys = [seg.phrase_keys(r, 0) for r in rows]
        w = np.int64(self.window)
        good: list[np.ndarray] = []
        for a, anchors in enumerate(keys):
            ok = np.ones(anchors.size, dtype=bool)
            for s, k in enumerate(keys):
                if s == a or not ok.any():
                    continue
                idx = np.searchsorted(k, anchors, side="left")
                valid = idx < k.size
                cand = k[np.minimum(idx, max(k.size - 1, 0))]
                ok &= valid
                ok &= (cand & self._DOCM) == (anchors & self._DOCM)
                ok &= cand <= anchors + w
            if ok.any():
                good.append(anchors[ok])
        if not good:
            return _EMPTY_I, _EMPTY_I
        anchors = np.unique(np.concatenate(good))
        docs, tfs = np.unique(
            (anchors >> np.int64(32)).astype(np.int64), return_counts=True)
        return docs, tfs


class PreparedBM25F(Prepared):
    def __init__(self, searcher, terms, weights, states, avgdl, idf,
                 k1, b, boost, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.terms = terms
        self.weights = weights
        self.states = states
        self.avgdl = avgdl
        self.idf = idf
        self.k1 = k1
        self.b = b
        self.boost = boost

    def cost(self, seg_ord):
        c = 0
        for st in self.states.values():
            row = st.rows[seg_ord]
            if row >= 0:
                c += int(self.searcher.segments[seg_ord].doc_freq[row])
        return c

    def execute(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        k1, b = self.k1, self.b
        all_docs: list = []
        all_scores: list = []
        for t in self.terms:
            docs_parts: list = []
            wtf_parts: list = []
            for f, w in self.weights.items():
                st = self.states[(f, t)]
                row = st.rows[seg_ord]
                if row < 0:
                    continue
                pl = seg.postings(int(row))
                dl = seg.field_norms(f)[pl.docs - 1].astype(np.float64)
                B = (1.0 - b) + b * (dl / self.avgdl[f])
                docs_parts.append(pl.docs)
                wtf_parts.append(w * (pl.tfs.astype(np.float64) / B))
            if not docs_parts:
                continue
            if len(docs_parts) == 1:
                docs_u, wtf = docs_parts[0], wtf_parts[0]
            else:
                cat = np.concatenate(docs_parts)
                docs_u, inv = np.unique(cat, return_inverse=True)
                wtf = np.zeros(docs_u.size, dtype=np.float64)
                np.add.at(wtf, inv, np.concatenate(wtf_parts))
            all_docs.append(docs_u)
            all_scores.append(
                (k1 + 1.0) * self.idf[t] * wtf / (k1 + wtf))
        if not all_docs:
            return _empty(self.dtype)
        if len(all_docs) == 1:
            docs, scores = all_docs[0], all_scores[0]
        else:
            cat = np.concatenate(all_docs)
            docs, inv = np.unique(cat, return_inverse=True)
            scores = np.zeros(docs.size, dtype=np.float64)
            np.add.at(scores, inv, np.concatenate(all_scores))
        return docs, (self.boost * scores).astype(self.dtype)


class PreparedNGramSimilarity(Prepared):
    """Ordered-chain n-gram similarity: the longest chain of query
    n-grams appearing IN ORDER (strictly increasing positions) divided
    by |query n-grams| must reach ``threshold``
    (``ngram_similarity_query.cpp:455`` chain DP). The DP is vectorized
    across candidate docs: for each gram in query order and chain length
    L (descending), best[L] = min(best[L], smallest gram position >
    best[L-1]) via one searchsorted on the gram's (doc<<32|pos) keys."""

    _POS_MASK = np.int64((1 << 32) - 1)

    def __init__(self, children, threshold, scorer):
        super().__init__(scorer)
        self.children = children
        self.threshold = threshold
        self._thr_fn = None

    def bind_threshold(self, fn) -> None:
        """Strict-mode hook: the searcher binds the live top-k threshold
        so the DP can drop docs whose score upper bound (ssum, since
        ratio <= 1) cannot enter the heap."""
        self._thr_fn = fn

    def execute(self, seg_ord):
        m = len(self.children)
        # min-match prefilter (VERDICT r1 #4): a doc can only reach
        # chain/m >= threshold if >= ceil(threshold*m) grams match it,
        # and a positional gram match implies a doc-level conjunction
        # match of the gram's terms — so count doc-level gram support
        # first (no position work) and run the phrase evaluation + DP
        # over the surviving candidates only.
        need = max(1, int(np.ceil(self.threshold * m - 1e-9)))
        if need >= 2:
            support = [c.doc_candidates(seg_ord) for c in self.children]
            nonempty = [d for d in support if d.size]
            if len(nonempty) < need:
                return _empty(self.dtype)
            cand, cnt = np.unique(np.concatenate(nonempty), return_counts=True)
            cand = cand[cnt >= need]
            if cand.size == 0:
                return _empty(self.dtype)
            results = [c.execute_restricted(seg_ord, cand)
                       for c in self.children]
        else:
            # need=1: the prefilter cannot drop anything — evaluate the
            # phrases on their (memoized) unrestricted path
            results = [c._cached(seg_ord) for c in self.children]
        parts = [(d, s) for d, s, _ in results]
        sdocs, ssum = _merge_disjunction(
            [(d, s) for d, s in parts if d.size], 1, "sum", self.dtype
        )
        if sdocs.size == 0:
            return _empty(self.dtype)
        if self._thr_fn is not None:
            thr = self._thr_fn()
            if np.isfinite(thr):
                keep = ssum >= thr  # score = ssum * ratio <= ssum
                sdocs, ssum = sdocs[keep], ssum[keep]
                if sdocs.size == 0:
                    return _empty(self.dtype)
        keys_per_gram = [keys for _, _, keys in results]
        INF = np.int64(1) << np.int64(40)
        docs = sdocs
        best = np.full((m + 1, docs.size), INF, dtype=np.int64)
        best[0, :] = -1
        for K in keys_per_gram:
            if K.size == 0:
                continue
            for L in range(m, 0, -1):
                prev = best[L - 1]
                q = (docs << np.int64(32)) + np.minimum(prev + 1, self._POS_MASK)
                idx = np.searchsorted(K, q)
                ok = (prev < INF) & (idx < K.size)
                kk = K[np.minimum(idx, K.size - 1)]
                same_doc = (kk >> np.int64(32)) == docs
                pos = kk & self._POS_MASK
                cand = np.where(ok & same_doc, pos, INF)
                best[L] = np.minimum(best[L], cand)
        chain = (best[1:] < INF).sum(axis=0)
        ratio = chain / m
        keep = ratio >= self.threshold
        return docs[keep], (ssum[keep] * ratio[keep]).astype(self.dtype)


class PreparedAll(Prepared):
    def __init__(self, searcher, boost, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.boost = boost

    def cost(self, seg_ord):
        return self.searcher.segments[seg_ord].docs_count

    def max_score(self, seg_ord):
        return 0.0

    def execute(self, seg_ord):
        # BM25/TFIDF score an `all` match as 0 unless boost_as_score is
        # set (``core/search/bm25.cpp:420-430``) — we mirror the default.
        n = self.searcher.segments[seg_ord].docs_count
        docs = np.arange(1, n + 1, dtype=np.int64)
        return docs, np.zeros(n, dtype=self.dtype)


class PreparedEmpty(Prepared):
    def cost(self, seg_ord):
        return 0

    def max_score(self, seg_ord):
        return float("-inf")

    def execute(self, seg_ord):
        return _empty(self.dtype)


class PreparedGranularRange(Prepared):
    def __init__(self, searcher, field, term_ranges, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.field = field
        self.term_ranges = term_ranges  # [(term_lo, term_hi) inclusive]

    def execute(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        all_rows = []
        for t_lo, t_hi in self.term_ranges:
            all_rows.extend(int(r) for r in
                            seg.term_range(t_lo, t_hi, field=self.field))
        doc_parts = [pl.docs for pl in seg.postings_many(all_rows)]
        if not doc_parts:
            return _empty(self.dtype)
        # per-level ranges are disjoint value sets, but one doc holds a
        # term at EVERY level — however only one decomposed range can
        # contain its value, so the union needs no dedup... except a doc
        # appears once per matching (term,level); levels are disjoint by
        # construction -> simple concat + sort
        docs = np.unique(np.concatenate(doc_parts))
        return docs, np.zeros(docs.size, dtype=self.dtype)


class PreparedNumericRange(Prepared):
    def __init__(self, searcher, flt, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.flt = flt

    def execute(self, seg_ord):
        f = self.flt
        seg = self.searcher.segments[seg_ord]
        col = seg.docmap_column(f.column)
        vals = col.to_numpy(zero_copy_only=False)
        mask = np.ones(len(vals), dtype=bool)
        if f.lo is not None:
            mask &= (vals >= f.lo) if f.include_lo else (vals > f.lo)
        if f.hi is not None:
            mask &= (vals <= f.hi) if f.include_hi else (vals < f.hi)
        mask &= ~np.asarray(pc.is_null(col).to_numpy(zero_copy_only=False))
        docs = np.flatnonzero(mask).astype(np.int64) + 1
        return docs, np.zeros(docs.size, dtype=self.dtype)


class PreparedColumnExistence(Prepared):
    def __init__(self, searcher, column, boost, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.column = column
        self.boost = boost

    def execute(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        col = seg.docmap_column(self.column)
        valid = pc.is_valid(col)
        if pa.types.is_string(col.type):
            valid = pc.and_(valid, pc.not_equal(col, ""))
        mask = valid.to_numpy(zero_copy_only=False)
        docs = np.flatnonzero(mask).astype(np.int64) + 1
        return docs, np.full(docs.size, self.boost, dtype=self.dtype)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _intersect_sorted(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Intersection of two sorted unique int arrays."""
    if a.size == 0 or b.size == 0:
        return _EMPTY_I
    if b.size < a.size:
        a, b = b, a
    idx = np.searchsorted(b, a)
    valid = idx < b.size
    hit = np.zeros(a.size, dtype=bool)
    hit[valid] = b[idx[valid]] == a[valid]
    return a[hit]


def _keys_in_docs(keys: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """Restrict a sorted ``(doc<<32|pos)`` key array to a sorted doc
    set (vectorized per-doc range gather)."""
    if keys.size == 0 or docs.size == 0:
        return keys[:0]
    lo = np.searchsorted(keys, docs << np.int64(32))
    hi = np.searchsorted(keys, (docs + np.int64(1)) << np.int64(32))
    lens = hi - lo
    tot = int(lens.sum())
    if tot == keys.size:
        return keys
    out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    idx = np.repeat(lo - out_starts, lens) + np.arange(tot)
    return keys[idx]


def _merge_disjunction(parts, min_match, score_merge, dtype,
                       tie_breaker=0.0):
    """Shared disjunction merge kernel. Every scored disjunction-shaped
    path (Or, multiterm, ngram gram-union, the strict MAXSCORE
    evaluation) MUST go through this one function: the per-doc float32
    sum order is an implementation detail, so two different merge
    algorithms drift by 1 ulp and break rank-identity between paths.

    Two deterministic strategies, chosen only from the input sizes (so
    the same (segment, query) always takes the same path):

    - DENSE (the common case for segment-local doc ids): one
      accumulator slot per doc id, children scattered in child order.
      O(K·n_docs) sequential memory traffic — no concat, no argsort,
      no gather — which is what makes COLD disjunctions cheap; doc ids
      must be segment-local (bounded), which every caller passes.
      Requires each child's docs to be unique (true of every Prepared
      ``execute``: a filter matches a doc at most once).
    - SPARSE (concat + stable argsort + reduceat) when the doc-id
      bound is much larger than the posting mass, or for pathological
      child counts.

    Per-doc sums: dense accumulates sequentially in child order,
    sparse reduceat is pairwise — the 1-ulp difference between the two
    is fine ACROSS queries/segments (the choice is deterministic), it
    would only break if the same inputs could take both paths."""
    if not parts:
        return _empty(dtype)
    total = 0
    max_doc = 0
    for d, _ in parts:
        total += d.size
        if d.size:
            last = int(d[-1])
            if last > max_doc:
                max_doc = last
    if total == 0:
        return _empty(dtype)
    if max_doc + 1 <= 4 * total + 65536 and len(parts) < 60000:
        sdt = parts[0][1].dtype
        n = max_doc + 1
        cnt = np.zeros(n, np.uint16)
        if score_merge == "max":
            acc = np.full(n, -np.inf, sdt)
            for d, s in parts:
                if d.size:
                    acc[d] = np.maximum(acc[d], s)
                    cnt[d] += 1
        elif score_merge == "dismax":
            mx = np.full(n, -np.inf, sdt)
            acc = np.zeros(n, sdt)
            for d, s in parts:
                if d.size:
                    mx[d] = np.maximum(mx[d], s)
                    acc[d] += s
                    cnt[d] += 1
            hit = cnt > 0
            acc[hit] = mx[hit] + sdt.type(tie_breaker) * (acc[hit] - mx[hit])
        else:
            acc = np.zeros(n, sdt)
            for d, s in parts:
                if d.size:
                    acc[d] += s
                    cnt[d] += 1
        out_docs = np.flatnonzero(
            cnt >= min_match if min_match > 1 else cnt)
        return out_docs, acc[out_docs].astype(dtype, copy=False)
    docs = np.concatenate([d for d, _ in parts])
    scores = np.concatenate([s for _, s in parts])
    order = np.argsort(docs, kind="stable")
    docs, scores = docs[order], scores[order]
    starts = np.flatnonzero(np.diff(docs, prepend=-1))
    out_docs = docs[starts]
    if score_merge == "max":
        out_scores = np.maximum.reduceat(scores, starts).astype(dtype)
    elif score_merge == "dismax":
        mx = np.maximum.reduceat(scores, starts)
        sm = np.add.reduceat(scores, starts)
        out_scores = (mx + scores.dtype.type(tie_breaker) * (sm - mx)) \
            .astype(dtype)
    else:
        out_scores = np.add.reduceat(scores, starts).astype(dtype)
    if min_match > 1:
        counts = np.diff(np.append(starts, docs.size))
        keep = counts >= min_match
        out_docs, out_scores = out_docs[keep], out_scores[keep]
    return out_docs, out_scores


# reference default: --scored-terms-limit=16 with a per-term top
# collector (limited_sample_collector.hpp:45-105; search-benchmark.sh:14).
# Filters pass scored_terms_limit=None to use this; 0/negative = score
# every matched term (round-1 behavior).
DEFAULT_SCORED_TERMS_LIMIT = 16


def _multiterm(searcher, scorer, matched_terms: list[str], boost: float,
               field: str | None = None,
               scored_terms_limit: int | None = None,
               node_key: tuple | None = None):
    """Multiterm execution (``multiterm_query.hpp:32-60``): scored
    disjunction over matched terms. Above ``scored_terms_limit`` the
    two-tier limited-sample strategy applies: the top-T terms by
    docs_with_term are scored exactly, the rest become an unscored doc
    union (``limited_sample_collector.hpp:45-105`` / ``bit_union``).

    ``node_key`` identifies the filter node across shards: the matched
    set is recorded on the searcher so a distributed coordinator can
    merge the per-shard candidate unions and broadcast ONE globally
    ranked scored set (``scored_sets`` stats override) — otherwise each
    shard would pick its own top-T and diverge from the single-process
    ranking."""
    limit = DEFAULT_SCORED_TERMS_LIMIT if scored_terms_limit is None \
        else scored_terms_limit
    if node_key is not None:
        rec = getattr(searcher, "_multiterm_matched", None)
        if rec is not None:
            rec[node_key] = (limit, list(matched_terms))
    chosen = getattr(searcher, "_stats_override", {}) \
        .get("scored_sets", {}).get(node_key) if node_key is not None else None
    if chosen is not None:
        # coordinator-selected global scored set: applies even when this
        # shard's local matched count is under the limit
        scored = [t for t in matched_terms if t in chosen]
        rest_terms = [t for t in matched_terms if t not in chosen]
    elif limit and limit > 0 and len(matched_terms) > limit:
        ranked = sorted(
            matched_terms,
            key=lambda t: (-searcher.resolve_term(t, field).docs_with_term, t),
        )
        scored = ranked[:limit]
        rest_terms = ranked[limit:]
    else:
        scored, rest_terms = matched_terms, []
    if rest_terms:
        rest = [searcher.resolve_term(t, field) for t in rest_terms]
        children = [Term(t, field=field).prepare(searcher, scorer, boost)
                    for t in scored]
        children.append(PreparedUnscoredUnion(searcher, rest, scorer))
        return PreparedDisjunction(children, 1, scorer)
    children = [Term(t, field=field).prepare(searcher, scorer, boost)
                for t in matched_terms]
    return PreparedDisjunction(children, 1, scorer)


class PreparedUnscoredUnion(Prepared):
    """Unscored doc-id union of many terms (bit_union analogue)."""

    def __init__(self, searcher, states, scorer):
        super().__init__(scorer)
        self.searcher = searcher
        self.states = states

    def max_score(self, seg_ord):
        return 0.0

    def cost(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        return int(sum(
            seg.doc_freq[st.rows[seg_ord]]
            for st in self.states if st.rows[seg_ord] >= 0
        ))

    def execute(self, seg_ord):
        seg = self.searcher.segments[seg_ord]
        rows = [int(st.rows[seg_ord]) for st in self.states
                if st.rows[seg_ord] >= 0]
        parts = [pl.docs for pl in seg.postings_many(rows)]
        if not parts:
            return _empty(self.dtype)
        docs = np.unique(np.concatenate(parts))
        return docs, np.zeros(docs.size, dtype=self.dtype)


def _levenshtein_many(target: str, cands: list[str], dmax: int,
                      transpositions: bool = False) -> np.ndarray:
    """Levenshtein (or, with ``transpositions``, OSA/Damerau) distance
    of ``target`` vs many candidates, vectorized across candidates (DP
    over target chars; numpy over candidates). The reference's
    ``with_transpositions`` option (``by_edit_distance``): adjacent
    transposition costs 1. OSA == unrestricted Damerau for d <= 1."""
    tcp = np.frombuffer(target.encode("utf-32-le"), dtype=np.uint32)
    maxlen = max(len(c) for c in cands)
    mat = np.zeros((len(cands), maxlen), dtype=np.uint32)
    lens = np.empty(len(cands), dtype=np.int64)
    for i, c in enumerate(cands):
        cp = np.frombuffer(c.encode("utf-32-le"), dtype=np.uint32)
        mat[i, : cp.size] = cp
        lens[i] = cp.size
    n = len(cands)
    prev = np.broadcast_to(np.arange(maxlen + 1, dtype=np.int64), (n, maxlen + 1)).copy()
    prevprev = None
    for i, tc in enumerate(tcp, start=1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        sub = prev[:, :-1] + (mat != tc)
        dele = prev[:, 1:] + 1
        np.minimum(sub, dele, out=sub)
        if transpositions and i >= 2 and maxlen >= 2:
            # OSA: target[i-2:i] swapped equals cand[j-2:j]
            swap = (mat[:, 1:] == tcp[i - 2]) & (mat[:, :-1] == tc)
            tr = prevprev[:, :-2] + 1
            sub[:, 1:] = np.where(swap, np.minimum(sub[:, 1:], tr),
                                  sub[:, 1:])
        # insertion needs a left-to-right scan; do it with cummin trick
        for j in range(1, maxlen + 1):
            cur[:, j] = np.minimum(sub[:, j - 1], cur[:, j - 1] + 1)
        prevprev = prev
        prev = cur
    return prev[np.arange(n), lens]
