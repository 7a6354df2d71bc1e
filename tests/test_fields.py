"""Multi-field indexing: exact StringFields next to the analyzed text
field (reference field-kind split, utils/index-put.cpp:190-258)."""

import numpy as np
import pytest

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import write_segment
from iresearch_ray.search import filters as F
from iresearch_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def field_index(tmp_path_factory, small_corpus):
    idx = str(tmp_path_factory.mktemp("fidx"))
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an,
                       exact_fields=("role", "tool"))
    m2 = write_segment(idx, small_corpus.slice(n // 2), an,
                       exact_fields=("role", "tool"))
    Manifest.commit(idx, [m1, m2])
    return idx


@pytest.fixture(scope="module")
def fsearcher(field_index):
    return IndexSearcher(field_index)


@pytest.fixture(scope="module")
def ordered(small_corpus):
    return small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])


def test_exact_field_term(fsearcher, ordered):
    roles = ordered.column("role").to_pylist()
    for role in ("user", "assistant", "tool"):
        exp = [i + 1 for i, r in enumerate(roles) if r == role]
        got = sorted(fsearcher.match_docs(F.Term(role, field="role")).tolist())
        assert got == exp, role


def test_field_isolation(fsearcher):
    """'tool' the role value vs 'tool' terms in text must not collide."""
    role_docs = set(fsearcher.match_docs(F.Term("tool", field="role")).tolist())
    text_docs = set(fsearcher.match_docs(F.Term("tool")).tolist())
    assert role_docs  # every 4th turn
    # text 'tool' shouldn't be identical to the role posting list
    assert role_docs != text_docs or not text_docs


def test_text_and_field_conjunction(fsearcher, ordered):
    import re

    roles = ordered.column("role").to_pylist()
    texts = ordered.column("text").to_pylist()
    exp = sorted(
        i + 1 for i, (r, t) in enumerate(zip(roles, texts))
        if r == "user" and "ref" in re.findall(r"[^\W_]+", t.lower())
    )
    got = sorted(
        fsearcher.match_docs(
            F.And([F.Term("ref"), F.Term("user", field="role")])
        ).tolist()
    )
    assert got == exp


def test_field_stats_separate(fsearcher, ordered):
    fs_text = fsearcher.field_stats()
    fs_role = fsearcher.field_stats("role")
    assert fs_role.docs_with_field == ordered.num_rows  # every turn has a role
    assert fs_role.total_term_freq == ordered.num_rows  # single term per doc
    assert fs_text.total_term_freq > fs_role.total_term_freq


def test_field_prefix_and_wildcard(fsearcher, ordered):
    tools = ordered.column("tool").to_pylist()
    exp = sorted(i + 1 for i, t in enumerate(tools) if t.startswith("b"))
    got = sorted(fsearcher.match_docs(F.Prefix("b", field="tool")).tolist())
    assert got == exp


def test_missing_field_matches_nothing(fsearcher):
    assert fsearcher.match_docs(F.Term("x", field="nope")).size == 0


def test_merge_preserves_fields(field_index, fsearcher, ordered):
    from iresearch_ray.index.merge import merge_segments

    man = Manifest.load(field_index)
    merged = merge_segments(field_index, man.segments)
    merged.pop("doc_base", None)
    Manifest.commit(field_index, [merged])
    s2 = IndexSearcher(field_index)
    roles = ordered.column("role").to_pylist()
    exp = [i + 1 for i, r in enumerate(roles) if r == "system"]
    assert sorted(s2.match_docs(F.Term("system", field="role")).tolist()) == exp


def test_text_analyzer_stemmed_index_recall(tmp_path):
    """End-to-end: an index built with the text analyzer (Porter2
    stemming + accent folding) matches morphological variants and
    accented forms under one stemmed/folded term."""
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    t = pa.table({
        "conv_id": ["c"] * 4,
        "turn_idx": pa.array([0, 1, 2, 3], type=pa.int32()),
        "text": ["we deployed the service",
                 "deploying services daily",
                 "a café in paris",
                 "cafe latte"],
    })
    an = get_analyzer("text", {"stemming": True, "stopwords": frozenset()})
    idx = str(tmp_path / "sidx")
    m = write_segment(idx, t, an,
                      analyzer_spec={"name": "text",
                                     "options": {"stemming": True,
                                                 "stopwords": []}})
    Manifest.commit(idx, [m])
    s = IndexSearcher(idx)
    # query-side terms must be analyzed the same way by the caller;
    # the stemmed term for deployed/deploying is "deploy"
    got = sorted(s.match_docs(F.Term("deploy")).tolist())
    assert got == [1, 2]
    got2 = sorted(s.match_docs(F.Term("cafe")).tolist())
    assert got2 == [3, 4]


def test_dictionary_buffer_lookup_unicode(tmp_path, ray_session):
    """The Arrow-buffer binary search must agree with Python str order
    for non-ASCII terms (UTF-8 byte order == code-point order), and
    terms_at must decode bounded row sets without materializing the
    whole dictionary."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.search.searcher import IndexSearcher

    words = ["zebra", "åka", "ära", "öga", "anka", "ärt", "étude",
             "книга", "öl", "z", "a"]
    rows = [{"doc_id": i, "text": " ".join(words[i % len(words):] )}
            for i in range(24)]
    src = str(tmp_path / "u.parquet")
    pq.write_table(pa.Table.from_pylist(rows), src)
    idx = str(tmp_path / "uidx")
    build_index(src, idx, text_col="text", key_cols=("doc_id",),
                stored_cols=("doc_id",), segment_docs=8)
    s = IndexSearcher(idx)
    seg = s.segments[0]
    # every term present must be found; absent probes must return -1
    for w in words:
        r = seg.lookup(w)
        assert r >= 0 and seg.terms[r] == w
    assert seg.lookup("zzz-not-there") == -1
    assert seg.lookup("") == -1
    # terms_at decodes exactly the requested rows, pre- and post-
    # materialization
    rows2 = seg.term_range("a", "b")
    sub = seg.terms_at(rows2)
    assert all(a <= t < "b" for t in sub for a in ["a"])
    _ = seg.terms  # force full materialization
    sub2 = seg.terms_at(rows2)
    assert list(sub) == list(sub2)
    # range bounds agree with numpy searchsorted over the object array
    t_all = seg.terms
    for lo, hi in [("a", "b"), ("ä", "ö"), (None, "m"), ("å", None)]:
        got = seg.term_range(lo, hi)
        a = 0 if lo is None else int(np.searchsorted(t_all, lo, "left"))
        b = t_all.size if hi is None else int(np.searchsorted(t_all, hi, "right"))
        assert got.tolist() == list(range(a, b)), (lo, hi)
