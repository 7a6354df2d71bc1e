"""BM25F multi-field scoring (Robertson & Zaragoza 2009): weighted
field-normalized tfs saturate ONCE. Brute-force numpy oracle + the
single-field degeneration identity (BM25F with one field at weight 1
is algebraically plain BM25: (k+1)·idf·(tf/B)/(k1+tf/B) =
(k+1)·idf·tf/(tf+k1·B))."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import write_segment
from iresearch_ray.search import filters as F
from iresearch_ray.search.scorers import BM25

from .oracle import tokenize


def _with_title(table: pa.Table) -> pa.Table:
    low = pc.utf8_lower(table.column("text"))
    low = pc.replace_substring_regex(low, "^[^a-z0-9]+", "")
    low = pc.replace_substring_regex(low, "[^a-z0-9]+$", "")
    toks = pc.split_pattern_regex(low, "[^a-z0-9]+")
    title = pc.binary_join(pc.list_slice(toks, 0, 3), " ")
    return table.append_column("title", title)


@pytest.fixture(scope="module")
def f2_index(tmp_path_factory, small_corpus):
    idx = str(tmp_path_factory.mktemp("bm25f_idx"))
    t = _with_title(
        small_corpus.sort_by(
            [("conv_id", "ascending"), ("turn_idx", "ascending")]
        )
    )
    an = get_analyzer("segmentation", {})
    n = t.num_rows
    m1 = write_segment(idx, t.slice(0, n // 2), an, text_fields=("title",))
    m2 = write_segment(idx, t.slice(n // 2), an, text_fields=("title",))
    Manifest.commit(idx, [m1, m2])
    from iresearch_ray.search.searcher import IndexSearcher

    return IndexSearcher(idx), t


def _brute_bm25f(table, terms, weights, k1=1.2, b=0.75):
    """Independent float64 reference: per-field dicts from raw text."""
    field_toks = {
        "text": [tokenize(x) for x in table.column("text").to_pylist()],
        "title": [tokenize(x) for x in table.column("title").to_pylist()],
    }
    n_docs = sum(1 for t in field_toks["text"] if t)
    avgdl = {
        f: sum(len(t) for t in toks) / sum(1 for t in toks if t)
        for f, toks in field_toks.items()
    }
    scores: dict[int, float] = {}
    for q in terms:
        df = sum(
            1
            for i in range(table.num_rows)
            if any(q in field_toks[f][i] for f in weights)
        )
        if df == 0:
            continue
        idf = np.log1p(((n_docs - df) + 0.5) / (df + 0.5))
        for i in range(table.num_rows):
            wtf = 0.0
            for f, w in weights.items():
                tf = field_toks[f][i].count(q)
                if tf:
                    B = (1 - b) + b * len(field_toks[f][i]) / avgdl[f]
                    wtf += w * tf / B
            if wtf:
                s = (k1 + 1) * idf * wtf / (k1 + wtf)
                scores[i + 1] = scores.get(i + 1, 0.0) + s
    return scores


def test_bm25f_matches_brute_force(f2_index):
    s, table = f2_index
    weights = {"text": 1.0, "title": 2.5}
    terms = ["ref", "deploy"]
    exp = _brute_bm25f(table, terms, weights)
    res = s.search(
        F.BM25F(terms, fields=weights), k=10_000,
        scorer=BM25(dtype=np.float64), mode="all",
    )
    assert sorted(res["doc_id"].tolist()) == sorted(exp)
    got = dict(zip(res["doc_id"].tolist(), res["score"].tolist()))
    for d, v in exp.items():
        np.testing.assert_allclose(got[d], v, rtol=1e-9)


def test_bm25f_single_field_is_plain_bm25(f2_index):
    s, _ = f2_index
    for term in ("ref", "the", "deploy"):
        a = s.search(
            F.BM25F([term], fields={"text": 1.0}), k=50,
            scorer=BM25(dtype=np.float64), mode="all",
        )
        b = s.search(
            F.Term(term), k=50, scorer=BM25(dtype=np.float64), mode="all"
        )
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), term
        np.testing.assert_allclose(
            a["score"].to_numpy(), b["score"].to_numpy(), rtol=1e-9
        )


def test_bm25f_title_weight_reranks(f2_index):
    """A term in a doc's first-3-token title must outrank the same tf
    in body-only docs once the title weight dominates."""
    s, table = f2_index
    res = s.search(
        F.BM25F(["ref"], fields={"text": 1.0, "title": 10.0}), k=5,
        scorer=BM25(dtype=np.float64), mode="all",
    )
    titles = table.column("title").to_pylist()
    top = res["doc_id"].tolist()[0]
    assert "ref" in tokenize(titles[top - 1])
