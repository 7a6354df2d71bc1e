"""Lucene/Elasticsearch ``query_string`` syntax -> Filter AST.

Beyond-reference user surface (the reference library exposes a
programmatic filter DSL only; its host products layer a textual query
language on top — this is the Lucene classic-parser subset every ES
user types into ``query_string``):

    hello world                  -> default-operator combine of terms
    +must -not AND OR NOT && ||  -> boolean structure
    "exact phrase"               -> Phrase
    "sloppy phrase"~2            -> SloppyPhrase(slop=2)
    fuzzy~  fuzzy~1              -> Fuzzy (default distance 2)
    pre*  w?ld*                  -> Prefix / Wildcard
    /rege.xp/                    -> Regexp (anchored full-term match)
    field:term  field:(a OR b)   -> field-scoped filters
    [aaa TO bbb]  {aaa TO bbb}   -> Range (inclusive / exclusive ends)
    term^2 "p q"^3 (a b)^0.5     -> boost

Per-field analyzers (the reference resolves the field's registered
analyzer at parse time — ``utils/index-search.cpp:680-683`` via
``analyzers::get``): pass ``analyzers={field: Analyzer|name}`` (key
``None`` = fallback for unlisted fields), or ``searcher=`` an
``IndexSearcher`` to derive the mapping from the index's own segment
metadata (text fields get the index analyzer, exact fields the
keyword analyzer). Bare terms and quoted phrases run through
``Analyzer.tokenize_query``; a term analyzing to several tokens
becomes a Phrase and to zero tokens (stopword) becomes Empty, like
the Lucene classic parser.

Simplifications (documented, deterministic):
- ``+x`` is treated as ``AND x`` and ``-x`` / ``NOT x`` as
  ``AND NOT x`` within the current group (the classic-parser
  occurrence flags collapse onto the boolean structure instead of the
  ES bool-query must/should split).
- Operator precedence is conventional — NOT binds tightest, then AND,
  then OR — not the Lucene parser's position-dependent quirks.
- Without an analyzer for the field, terms are normalized with
  ``normalize`` (default: lowercase); phrases split on whitespace and
  normalize per word.
- Multiterm patterns (prefix/wildcard/fuzzy/regexp) and range
  endpoints always use ``normalize``, never the full analyzer — the
  Lucene default (``analyze_wildcard=false``).
"""

from __future__ import annotations

import re

from iresearch_ray.search import filters as F

_TOKEN = re.compile(
    r"""
    \s+
  | (?P<quote>"(?P<qbody>[^"]*)"(?:~(?P<qslop>\d+))?)
  | (?P<regex>/(?P<rxbody>(?:[^/\\]|\\.)+)/)
  | (?P<range>[\[{](?P<rlo>\S+)\s+TO\s+(?P<rhi>\S+)[\]}])
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<field>[A-Za-z_][\w.]*):
  | (?P<boost>\^(?P<bval>\d+(?:\.\d+)?))
  | (?P<term>[^\s()^]+)
    """,
    re.VERBOSE,
)


class QueryStringError(ValueError):
    pass


def _lex(s: str) -> list[tuple[str, object]]:
    out: list[tuple[str, object]] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None:
            raise QueryStringError(f"cannot tokenize at: {s[pos:pos+20]!r}")
        pos = m.end()
        if m.group("quote"):
            slop = m.group("qslop")
            out.append(("phrase", (m.group("qbody"),
                                   int(slop) if slop else None)))
        elif m.group("regex"):
            out.append(("regex", m.group("rxbody").replace("\\/", "/")))
        elif m.group("range"):
            raw = m.group("range")
            out.append(("range", (m.group("rlo"), m.group("rhi"),
                                  raw[0] == "[", raw[-1] == "]")))
        elif m.group("lparen"):
            out.append(("(", None))
        elif m.group("rparen"):
            out.append((")", None))
        elif m.group("and"):
            out.append(("AND", None))
        elif m.group("or"):
            out.append(("OR", None))
        elif m.group("not"):
            out.append(("NOT", None))
        elif m.group("plus"):
            out.append(("+", None))
        elif m.group("minus"):
            out.append(("-", None))
        elif m.group("field"):
            out.append(("field", m.group("field")))
        elif m.group("boost"):
            out.append(("^", float(m.group("bval"))))
        elif m.group("term"):
            out.append(("term", m.group("term")))
    return out


class _Parser:
    def __init__(self, tokens, default_field, default_operator, normalize,
                 analyzers=None):
        self.toks = tokens
        self.i = 0
        self.default_field = default_field
        self.default_op = default_operator.upper()
        if self.default_op not in ("AND", "OR"):
            raise QueryStringError("default_operator must be 'and' or 'or'")
        self.norm = normalize
        self.analyzers = analyzers or {}

    def _analyzer_for(self, field):
        """Resolve the registered analyzer for ``field`` (falling back
        to the parse-time default field, then the ``None`` wildcard
        entry) — the reference's ``analyzers::get`` per-field lookup,
        ``utils/index-search.cpp:680-683``."""
        key = field if field is not None else self.default_field
        az = self.analyzers.get(key, self.analyzers.get(None))
        if isinstance(az, str):
            from iresearch_ray.analysis.analyzers import get_analyzer
            az = get_analyzer(az)
        return az

    def _analyze(self, field, text: str) -> list[str]:
        az = self._analyzer_for(field)
        if az is None:
            return [self.norm(w) for w in text.split() if w]
        return list(az.tokenize_query(text))

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else (None, None)

    def take(self):
        t = self.peek()
        self.i += 1
        return t

    # precedence: OR < AND < unary NOT/+/-
    def parse_or(self, field):
        items = [self.parse_and(field)]
        while True:
            kind, _ = self.peek()
            if kind == "OR":
                self.take()
                items.append(self.parse_and(field))
            elif (self.default_op == "OR"
                  and kind in ("term", "phrase", "range", "regex", "(",
                               "field", "NOT")):
                # implicit adjacency at the default operator (+x / -x
                # never reach here: parse_and consumes them as
                # AND / AND NOT continuations)
                items.append(self.parse_and(field))
            else:
                break
        if len(items) == 1:
            return items[0]
        return F.Or(items)

    def parse_and(self, field):
        items = [self.parse_unary(field)]
        while True:
            kind, _ = self.peek()
            if kind == "AND":
                self.take()
                items.append(self.parse_unary(field))
            elif kind in ("+", "-"):
                # +x -> AND x ; -x -> AND NOT x (classic-parser
                # occurrence flags, collapsed)
                items.append(self.parse_unary(field))
            elif (self.default_op == "AND"
                  and kind in ("term", "phrase", "range", "regex", "(",
                               "field", "NOT")):
                items.append(self.parse_unary(field))
            else:
                break
        if len(items) == 1:
            # Return a lone Not bare (no And wrap): parse_or's Or.prepare
            # extracts Not children as MUST_NOT negatives over the whole
            # disjunction, so 'a NOT b' under default OR becomes
            # Or([a, Not(b)]) == a AND NOT b (Lucene/ES semantics).  The
            # old And([Not(x)]) wrap prepended All() and made the
            # disjunct match every doc lacking x.  A top-level lone Not
            # is handled by F.Not.prepare (All AND NOT x).
            return items[0]
        return F.And(items)

    def parse_unary(self, field):
        kind, val = self.peek()
        if kind == "+":
            self.take()
            return self.parse_unary(field)
        if kind in ("-", "NOT"):
            self.take()
            return F.Not(self.parse_unary(field))
        return self.parse_primary_scoped(field)

    def _apply_boost(self, flt):
        kind, val = self.peek()
        if kind == "^":
            self.take()
            flt.boost = float(val)
        return flt

    def parse_primary_scoped(self, field):
        kind, val = self.take()
        if kind == "(":
            inner = self.parse_or(field)
            if self.take()[0] != ")":
                raise QueryStringError("unbalanced parenthesis")
            return self._apply_boost(inner)
        if kind == "field":
            nkind, _ = self.peek()
            if nkind == "(":
                self.take()
                inner = self.parse_or(val)
                if self.take()[0] != ")":
                    raise QueryStringError("unbalanced parenthesis")
                return self._apply_boost(inner)
            return self.parse_primary_scoped(val)
        if kind == "phrase":
            body, slop = val
            words = self._analyze(field, body)
            if not words:
                if not body.split():
                    raise QueryStringError("empty phrase")
                # all words analyzed away (stopwords) -> matches nothing
                return self._apply_boost(F.Empty())
            if len(words) == 1 and slop in (None, 0):
                flt = F.Term(words[0], field=field)
            elif slop:
                flt = F.SloppyPhrase(words, slop=slop, field=field)
            else:
                flt = F.Phrase(words, field=field)
            return self._apply_boost(flt)
        if kind == "regex":
            return self._apply_boost(F.Regexp(val, field=field))
        if kind == "range":
            lo, hi, inc_lo, inc_hi = val
            flt = F.Range(lo=None if lo == "*" else self.norm(lo),
                          hi=None if hi == "*" else self.norm(hi),
                          include_lo=inc_lo, include_hi=inc_hi,
                          field=field)
            return self._apply_boost(flt)
        if kind == "term":
            if field == "_exists_":
                # ES _exists_:field -> docs carrying the field at all
                return self._apply_boost(F.ColumnExistence(val))
            m = re.fullmatch(r"(?P<op>>=|<=|>|<)(?P<v>.+)", val)
            if m and field is not None:
                # ES query_string range shorthand: field:>=v etc.
                op, v = m.group("op"), self.norm(m.group("v"))
                flt = F.Range(
                    lo=v if op in (">", ">=") else None,
                    hi=v if op in ("<", "<=") else None,
                    include_lo=op == ">=", include_hi=op == "<=",
                    field=field)
                return self._apply_boost(flt)
            return self._apply_boost(self._term_filter(val, field))
        raise QueryStringError(f"unexpected token {kind!r}")

    def _term_filter(self, raw: str, field):
        m = re.fullmatch(r"(?P<body>.+?)~(?P<d>\d*)", raw)
        if m:
            d = m.group("d")
            return F.Fuzzy(self.norm(m.group("body")),
                           max_distance=int(d) if d else 2, field=field)
        body = self.norm(raw)
        if body.endswith("*") and "*" not in body[:-1] and "?" not in body:
            return F.Prefix(body[:-1], field=field)
        if "*" in body or "?" in body:
            return F.Wildcard(body, field=field)  # accepts */? natively
        # plain term: route through the field's registered analyzer —
        # a stemmed/folded field needs the QUERY term stemmed/folded the
        # same way or it silently mismatches (reference analyzers::get).
        toks = self._analyze(field, raw)
        if not toks:
            return F.Empty()  # stopword analyzed away
        if len(toks) == 1:
            return F.Term(toks[0], field=field)
        return F.Phrase(toks, field=field)  # classic-parser multi-token


def field_analyzers_from_searcher(searcher) -> dict:
    """{field: Analyzer} derived from an ``IndexSearcher``'s own
    segment metadata: the analyzed text field(s) get the index's
    registered analyzer (rebuilt from the persisted spec), exact
    fields the keyword analyzer — the reference's parse-time
    ``analyzers::get`` resolution (``utils/index-search.cpp:680-683``)
    fed from the manifest instead of a global registry. The ``None``
    key makes the index analyzer the fallback for the default field."""
    from iresearch_ray.analysis.analyzers import (KeywordAnalyzer,
                                                  get_analyzer)

    metas = searcher.manifest.segments
    if not metas:
        return {}
    meta = metas[0]
    spec = meta.get("analyzer") or {"name": "segmentation", "options": {}}
    az = get_analyzer(spec.get("name", "segmentation"),
                      spec.get("options") or {})
    out = {None: az, meta.get("text_col", "text"): az}
    for f in meta.get("text_fields", []):
        out[f] = az
    kw = KeywordAnalyzer()
    for f in meta.get("exact_fields", []):
        out[f] = kw
    return out


def parse_query_string(s: str, default_field: str | None = None,
                       default_operator: str = "or",
                       normalize=str.lower, analyzers: dict | None = None,
                       searcher=None) -> F.Filter:
    """Parse a Lucene/ES ``query_string`` expression into a Filter.

    ``analyzers``: {field_name_or_None: Analyzer | registry name} for
    per-field query-term analysis; ``searcher``: derive that mapping
    from an open index (explicit ``analyzers`` entries win)."""
    toks = _lex(s)
    if not toks:
        raise QueryStringError("empty query string")
    az_map = dict(field_analyzers_from_searcher(searcher)) \
        if searcher is not None else {}
    if analyzers:
        az_map.update(analyzers)
    p = _Parser(toks, default_field, default_operator, normalize, az_map)
    out = p.parse_or(default_field)
    if p.i != len(toks):
        raise QueryStringError(
            f"trailing tokens from {p.toks[p.i]!r}")
    return out
