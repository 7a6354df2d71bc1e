"""Property-style tests: seeded random corpora — every term's posting
list must equal brute-force grep; merge(S1,S2) == index(concat)
(mirrors the reference's randomized index/merge tests)."""

import re

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import write_segment
from iresearch_ray.search import filters as F
from iresearch_ray.search.searcher import IndexSearcher

WORD = re.compile(r"[^\W_]+", re.UNICODE)


def random_corpus(seed: int, n_docs: int = 120) -> pa.Table:
    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(40)] + ["the", "x", "über", "ÅB"]
    texts = []
    for _ in range(n_docs):
        k = int(rng.integers(0, 25))
        toks = rng.choice(vocab, size=k).tolist() if k else []
        # random punctuation/case decoration
        toks = [t.upper() if rng.random() < 0.1 else t for t in toks]
        texts.append(" ".join(toks))
    return pa.table({
        "conv_id": pa.array([f"c{i:05d}" for i in range(n_docs)]),
        "turn_idx": pa.array([0] * n_docs, type=pa.int32()),
        "text": pa.array(texts),
    })


@pytest.mark.parametrize("seed", [1, 7, 23])
def test_postings_equal_bruteforce(tmp_path, seed):
    corpus = random_corpus(seed)
    idx = str(tmp_path / f"r{seed}")
    an = get_analyzer("segmentation", {})
    n = corpus.num_rows
    m1 = write_segment(idx, corpus.slice(0, n // 3), an)
    m2 = write_segment(idx, corpus.slice(n // 3, n // 3), an)
    m3 = write_segment(idx, corpus.slice(2 * (n // 3)), an)
    Manifest.commit(idx, [m1, m2, m3])
    s = IndexSearcher(idx)
    texts = corpus.column("text").to_pylist()
    tokenized = [WORD.findall(t.lower()) for t in texts]
    vocab = sorted({w for toks in tokenized for w in toks})
    for term in vocab:
        exp = [i + 1 for i, toks in enumerate(tokenized) if term in toks]
        got = sorted(s.match_docs(F.Term(term)).tolist())
        assert got == exp, term
    # tf + positions spot checks
    for term in vocab[:10]:
        for seg_ord, seg in enumerate(s.segments):
            row = seg.lookup(term)
            if row < 0:
                continue
            pl = seg.postings(row, positions=True)
            base = int(s.doc_bases[seg_ord])
            for i in range(pl.docs.size):
                g = base + int(pl.docs[i]) - 1
                exp_pos = [p for p, w in enumerate(tokenized[g]) if w == term]
                assert pl.positions_for(i).tolist() == exp_pos


@pytest.mark.parametrize("seed", [3, 11])
def test_merge_equals_direct(tmp_path, seed):
    from iresearch_ray.index.merge import merge_segments

    corpus = random_corpus(seed, n_docs=90)
    an = get_analyzer("segmentation", {})
    idx_a = str(tmp_path / "direct")
    m = write_segment(idx_a, corpus, an)
    Manifest.commit(idx_a, [m])
    idx_b = str(tmp_path / "merged")
    parts = [write_segment(idx_b, corpus.slice(0, 30), an),
             write_segment(idx_b, corpus.slice(30, 30), an),
             write_segment(idx_b, corpus.slice(60), an)]
    Manifest.commit(idx_b, parts)
    merged = merge_segments(idx_b, Manifest.load(idx_b).segments)
    merged.pop("doc_base", None)
    Manifest.commit(idx_b, [merged])
    sa, sb = IndexSearcher(idx_a), IndexSearcher(idx_b)
    texts = corpus.column("text").to_pylist()
    vocab = sorted({w for t in texts for w in WORD.findall(t.lower())})
    rng = np.random.default_rng(seed)
    for term in rng.choice(vocab, size=min(15, len(vocab)), replace=False):
        ra = sa.search(F.Term(term), k=50, mode="all")
        rb = sb.search(F.Term(term), k=50, mode="all")
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist()
        np.testing.assert_allclose(ra["score"].to_numpy(), rb["score"].to_numpy(),
                                   rtol=1e-6)


def test_conv_match(searcher, small_corpus):
    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    convs = ordered.column("conv_id").to_pylist()
    texts = ordered.column("text").to_pylist()
    matched_convs = {
        c for c, t in zip(convs, texts)
        if "deploy" in WORD.findall(t.lower())
    }
    exp = sorted(i + 1 for i, c in enumerate(convs) if c in matched_convs)
    got = sorted(searcher.conv_match(F.Term("deploy")).tolist())
    assert got == exp


def test_pipeline_analyzer():
    from iresearch_ray.analysis.analyzers import make_pipeline

    an = make_pipeline([
        {"name": "segmentation"},
        {"name": "ngram", "options": {"min_gram": 2, "max_gram": 2}},
    ])
    d, t, p = an.tokenize(pa.array(["ab cd"], type=pa.string()))
    assert t.to_pylist() == ["ab", "cd"]
    assert p.tolist() == [0, 1]  # ngrams inherit the source token position


def test_collation_analyzer():
    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("collation", {})
    _, t1, _ = an.tokenize(pa.array(["Straße"], type=pa.string()))
    _, t2, _ = an.tokenize(pa.array(["STRASSE"], type=pa.string()))
    assert t1.to_pylist() == t2.to_pylist()  # casefold equivalence
    _, t3, _ = an.tokenize(pa.array(["café"], type=pa.string()))
    assert t3.to_pylist() == ["cafe"]


def test_norm_analyzer():
    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("norm", {})
    _, t, _ = an.tokenize(pa.array(["Héllo World"], type=pa.string()))
    assert t.to_pylist() == ["hello world"]


def test_conv_match_all_none(searcher, small_corpus):
    """Nested match types All / None (nested_filter.hpp:58-94)."""
    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    convs = ordered.column("conv_id").to_pylist()
    texts = ordered.column("text").to_pylist()
    per_conv: dict = {}
    for c, t in zip(convs, texts):
        hit = "the" in WORD.findall(t.lower())
        tot, m = per_conv.get(c, (0, 0))
        per_conv[c] = (tot + 1, m + (1 if hit else 0))
    all_convs = {c for c, (tot, m) in per_conv.items() if m == tot}
    none_convs = {c for c, (tot, m) in per_conv.items() if m == 0}
    exp_all = sorted(i + 1 for i, c in enumerate(convs) if c in all_convs)
    exp_none = sorted(i + 1 for i, c in enumerate(convs) if c in none_convs)
    got_all = sorted(searcher.conv_match(F.Term("the"), match="all").tolist())
    got_none = sorted(searcher.conv_match(F.Term("the"), match="none").tolist())
    assert got_all == exp_all
    assert got_none == exp_none
    # sanity: the three modes partition consistently
    got_any = sorted(searcher.conv_match(F.Term("the"), match="any").tolist())
    assert set(got_all) <= set(got_any)
    assert not (set(got_none) & set(got_any))
