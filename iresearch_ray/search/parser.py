"""Query-string parser for the reference benchmark task syntax
(``utils/index-search.cpp:241-450``, FIXTURES.md F3):

    term            single term
    "a b"           phrase
    +a +b           conjunction (required terms)
    a b             disjunction
    pre*            prefix (trailing-star only)
    wi*d or w_rd    wildcard (%/_ or */?)
    term~1          fuzzy (edit distance 1 or 2)
    2 t1 t2 t3      min-match: at least 2 of the terms
    -a              negated term (inside a boolean)
"""

from __future__ import annotations

import re

from iresearch_ray.search import filters as F

_FUZZY = re.compile(r"^(?P<t>[^~]+)~(?P<d>[12])$")
_MINMATCH = re.compile(r"^(?P<n>\d+)\s+(?P<rest>.+)$")


_FIELD = re.compile(r"^(?P<f>[A-Za-z_][A-Za-z0-9_]*):(?P<rest>.+)$")


def _leaf(tok: str) -> F.Filter:
    field = None
    m = _FIELD.match(tok)
    if m:
        field, tok = m.group("f"), m.group("rest")
    fz = _FUZZY.match(tok)
    if fz:
        return F.Fuzzy(fz.group("t"), int(fz.group("d")), field=field)
    if tok.endswith("*") and not any(c in tok[:-1] for c in "*?%_"):
        return F.Prefix(tok[:-1], field=field)
    if any(c in tok for c in "*?%_"):
        return F.Wildcard(tok, field=field)
    return F.Term(tok, field=field)


def parse_query(text: str) -> F.Filter:
    text = text.strip()
    if not text:
        return F.Empty()
    if text.startswith('"') and text.endswith('"') and len(text) > 1:
        return F.Phrase(text[1:-1].split())
    m = re.match(r'^(?P<f>[A-Za-z_][A-Za-z0-9_]*):"(?P<p>[^"]+)"$', text)
    if m:  # field-scoped phrase: field:"a b"
        return F.Phrase(m.group("p").split(), field=m.group("f"))
    m = _MINMATCH.match(text)
    if m and not any(t.startswith(("+", "-")) for t in m.group("rest").split()):
        terms = m.group("rest").split()
        return F.Or([_leaf(t) for t in terms], min_match=int(m.group("n")))
    toks = text.split()
    required = [t[1:] for t in toks if t.startswith("+")]
    negated = [t[1:] for t in toks if t.startswith("-")]
    optional = [t for t in toks if not t.startswith(("+", "-"))]
    if required or negated:
        children: list[F.Filter] = [_leaf(t) for t in required]
        children += [F.Not(_leaf(t)) for t in negated]
        if optional:
            children.append(F.Or([_leaf(t) for t in optional]))
        if not required and not optional:
            children.insert(0, F.All())
        return F.And(children)
    if len(toks) == 1:
        return _leaf(toks[0])
    return F.Or([_leaf(t) for t in toks])
