"""Lucene/ES query_string parser -> Filter AST: structure + end-to-end
rank identity with hand-built filters."""

import numpy as np

from iresearch_ray.search import filters as F
from iresearch_ray.search.querystring import (QueryStringError,
                                              parse_query_string)


def test_structures():
    q = parse_query_string("hello world")
    assert isinstance(q, F.Or) and len(q.filters) == 2
    q = parse_query_string("hello world", default_operator="and")
    assert isinstance(q, F.And) and len(q.filters) == 2
    q = parse_query_string('"deploy target"')
    assert isinstance(q, F.Phrase) and q.terms == ["deploy", "target"]
    q = parse_query_string('"deploy target"~2')
    assert isinstance(q, F.SloppyPhrase) and q.slop == 2
    q = parse_query_string("dep*")
    assert isinstance(q, F.Prefix)
    q = parse_query_string("d?ploy")
    assert isinstance(q, F.Wildcard)
    q = parse_query_string("deploy~1")
    assert isinstance(q, F.Fuzzy) and q.max_distance == 1
    q = parse_query_string("lang:de")
    assert isinstance(q, F.Term) and q.field == "lang" and q.term == "de"
    q = parse_query_string("lang:(de OR fr)")
    assert isinstance(q, F.Or) and all(c.field == "lang" for c in q.filters)
    q = parse_query_string("[aaa TO bbb}")
    assert isinstance(q, F.Range) and q.include_lo and not q.include_hi
    q = parse_query_string("foo +bar -baz")
    assert isinstance(q, F.And)
    kinds = [type(c).__name__ for c in q.filters]
    assert kinds == ["Term", "Term", "Not"]
    q = parse_query_string("a AND (b OR c)^2")
    assert q.filters[1].boost == 2.0
    q = parse_query_string("Deploy", normalize=str.lower)
    assert q.term == "deploy"
    q = parse_query_string("_exists_:lang")
    assert isinstance(q, F.ColumnExistence) and q.column == "lang"
    q = parse_query_string("n:>=100")
    assert isinstance(q, F.Range) and q.lo == "100" and q.include_lo \
        and q.hi is None and q.field == "n"
    q = parse_query_string("n:<300")
    assert isinstance(q, F.Range) and q.hi == "300" and not q.include_hi


def test_negation_under_default_or():
    # 'a NOT b' (default OR) must be a AND NOT b, not
    # Or([a, match-all-except-b]).  The lone Not flows bare into the
    # Or, whose prepare() extracts it as a MUST_NOT negative.
    for qs in ("a NOT b", "a OR -b"):
        q = parse_query_string(qs)
        assert isinstance(q, F.Or), qs
        kinds = [type(c).__name__ for c in q.filters]
        assert kinds == ["Term", "Not"], (qs, kinds)
    # 'a -b' takes the parse_and continuation path -> And([a, Not(b)]),
    # the same a AND NOT b semantics
    q = parse_query_string("a -b")
    assert isinstance(q, F.And)
    assert [type(c).__name__ for c in q.filters] == ["Term", "Not"]
    q = parse_query_string("-a b")
    assert isinstance(q, F.Or)
    assert [type(c).__name__ for c in q.filters] == ["Not", "Term"]
    # lone negation stays a top-level Not (prepared as All AND NOT x)
    q = parse_query_string("-a")
    assert isinstance(q, F.Not)
    q = parse_query_string("NOT a")
    assert isinstance(q, F.Not)


def test_regexp_clause():
    q = parse_query_string("/dep.*y/")
    assert isinstance(q, F.Regexp) and q.pattern == "dep.*y"
    q = parse_query_string("lang:/d[ae]/")
    assert isinstance(q, F.Regexp) and q.field == "lang"
    # escaped slash inside the pattern body
    q = parse_query_string("/a\\/b/")
    assert isinstance(q, F.Regexp) and q.pattern == "a/b"
    q = parse_query_string("/cu.*/ AND row")
    assert isinstance(q, F.And)
    assert [type(c).__name__ for c in q.filters] == ["Regexp", "Term"]


def test_per_field_analyzers():
    from iresearch_ray.analysis.analyzers import get_analyzer

    az = get_analyzer("text", {"stemming": True, "stopwords": ["the"]})
    # bare term runs through the field analyzer -> stemmed
    q = parse_query_string("running", analyzers={None: az})
    assert isinstance(q, F.Term) and q.term == "run"
    # phrase words analyzed individually in order
    q = parse_query_string('"running deployments"', analyzers={None: az})
    assert isinstance(q, F.Phrase) and q.terms == ["run", "deploy"]
    # stopword analyzed away -> Empty (matches nothing), like Lucene
    q = parse_query_string("the", analyzers={None: az})
    assert isinstance(q, F.Empty)
    # field-scoped resolution: body uses the stemmer, lang does not
    q = parse_query_string("body:running lang:DE",
                           analyzers={"body": az})
    stems = {c.field: c.term for c in q.filters}
    assert stems == {"body": "run", "lang": "de"}
    # analyzer may be given by registry name
    q = parse_query_string("Deploy", analyzers={None: "segmentation"})
    assert isinstance(q, F.Term) and q.term == "deploy"
    # multiterm patterns stay on normalize (analyze_wildcard=false)
    q = parse_query_string("runni*", analyzers={None: az})
    assert isinstance(q, F.Prefix) and q.prefix == "runni"


def test_searcher_analyzer_resolution(searcher):
    from iresearch_ray.search.querystring import \
        field_analyzers_from_searcher

    m = field_analyzers_from_searcher(searcher)
    assert None in m  # default-field fallback present
    a = searcher.search(parse_query_string("Deploy", searcher=searcher),
                        k=10, mode="strict")
    b = searcher.search(F.Term("deploy"), k=10, mode="strict")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_errors():
    import pytest

    with pytest.raises(QueryStringError):
        parse_query_string("")
    with pytest.raises(QueryStringError):
        parse_query_string("(a OR b")
    with pytest.raises(QueryStringError):
        parse_query_string("a )")


def test_end_to_end_rank_identity(searcher):
    pairs = [
        ("deploy AND target", F.And([F.Term("deploy"), F.Term("target")])),
        ('"deploy target"', F.Phrase(["deploy", "target"])),
        ("ref OR deploy OR ok",
         F.Or([F.Term("ref"), F.Term("deploy"), F.Term("ok")])),
        ("the -ref", F.And([F.Term("the"), F.Not(F.Term("ref"))])),
        ("the NOT ref", F.And([F.Term("the"), F.Not(F.Term("ref"))])),
        ("-ref the", F.And([F.Term("the"), F.Not(F.Term("ref"))])),
        ("the OR -ref", F.And([F.Term("the"), F.Not(F.Term("ref"))])),
        ("sec*", F.Prefix("sec")),
        ("deploy~1", F.Fuzzy("deploy", 1)),
    ]
    for qs, flt in pairs:
        a = searcher.search(parse_query_string(qs), k=25, mode="strict")
        b = searcher.search(flt, k=25, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), qs
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)
