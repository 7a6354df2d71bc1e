"""Hand-computed BM25/TFIDF golden values + WAND pruning invariants on a
corpus large enough to force bitpacked posting blocks (df > 128)."""

import numpy as np
import pytest

from iresearch_ray.search import filters as F
from iresearch_ray.search.scorers import BM25, FieldStats, TFIDF


def test_bm25_formula_hand_computed():
    # 4 docs, term in 2 of them. docs_with_field=4, total_term_freq=20
    # avgdl = 5; dl=4, tf=2:
    #   idf = log1p((4-2+0.5)/(2+0.5)) = log1p(1.0) = ln 2
    #   c0 = (k+1)*idf = 2.2*ln2 ; c1 = k(1-b) + k*b*dl/avgdl = 0.3 + 0.9*4/5
    #   score = c0 - c0*c1/(c1+tf)
    sc = BM25()
    fs = FieldStats(docs_with_field=4, total_term_freq=20)
    idf = sc.idf(4, 2)
    np.testing.assert_allclose(idf, np.log1p(1.0), rtol=1e-7)
    ctx = sc.make_ctx(fs, idf)
    score = sc.score(ctx, np.array([2]), np.array([4.0]))[0]
    c0 = np.float32(2.2) * np.float32(np.log1p(1.0))
    c1 = np.float32(0.3) + np.float32(0.9) * np.float32(4.0 / 5.0)
    np.testing.assert_allclose(score, c0 - c0 * c1 / (c1 + np.float32(2.0)), rtol=1e-7)


def test_bm25_special_cases_bm15_bm11_bm1():
    # b=0 -> BM15 (no length norm); b=1 -> BM11; k=0 -> BM1 (constant)
    fs = FieldStats(10, 100)
    bm15 = BM25(b=0.0)
    ctx = bm15.make_ctx(fs, 1.0)
    s_short = bm15.score(ctx, np.array([3]), np.array([2.0]))[0]
    s_long = bm15.score(ctx, np.array([3]), np.array([50.0]))[0]
    assert s_short == s_long
    bm1 = BM25(k=0.0)
    ctx1 = bm1.make_ctx(fs, 1.0)
    s1 = bm1.score(ctx1, np.array([1, 5, 9]), np.array([2.0, 5.0, 9.0]))
    np.testing.assert_allclose(s1, s1[0])


def test_bm25_upper_bound_dominates(searcher):
    """Block-max upper bound >= every true score in the block."""
    sc = BM25()
    seg = searcher.segments[0]
    prepared = F.Term("the").prepare(searcher, sc)
    row = prepared.state.rows[0]
    assert row >= 0
    cur = seg.cursor(int(row))
    for j in range(cur.n_blocks):
        docs, tfs = cur.decode_block(j)
        scores = sc.score(prepared.ctx, tfs, seg.norms[docs - 1])
        ub = sc.upper_bound(prepared.ctx, float(cur.max_tf[j]), float(cur.min_dl[j]))
        assert (scores <= ub + 1e-6).all()


def test_blocks_forced_and_roundtrip(searcher):
    """'the' must have df > BLOCK_SIZE in at least one segment so the
    bitpacked path is actually exercised end-to-end."""
    from iresearch_ray.index.codec import BLOCK_SIZE

    seg = searcher.segments[0]
    row = seg.lookup("the")
    assert row >= 0 and seg.doc_freq[row] > BLOCK_SIZE
    pl = seg.postings(row)
    cur = seg.cursor(row)
    assert cur.n_blocks >= 2
    # cursor blocks concatenate to the full decoded list
    docs = np.concatenate([cur.decode_block(j)[0] for j in range(cur.n_blocks)])
    tfs = np.concatenate([cur.decode_block(j)[1] for j in range(cur.n_blocks)])
    np.testing.assert_array_equal(docs, pl.docs)
    np.testing.assert_array_equal(tfs, pl.tfs)
    assert (np.diff(pl.docs) > 0).all()


def test_positions_decode(searcher, small_corpus):
    import re

    seg = searcher.segments[0]
    row = seg.lookup("ref")
    pl = seg.postings(row, positions=True)
    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = ordered.column("text").to_pylist()
    for i in range(min(10, pl.docs.size)):
        d = int(pl.docs[i])
        toks = re.findall(r"[^\W_]+", texts[d - 1].lower())
        exp = [p for p, t in enumerate(toks) if t == "ref"]
        assert pl.positions_for(i).tolist() == exp


def test_scaling_threshold_carries_across_segments(searcher):
    """Strict mode must produce identical results regardless of segment
    visit order effects — compare against exhaustive on many terms."""
    for term in ["the", "ok", "run", "file", "med005"]:
        a = searcher.search(F.Term(term), k=7, mode="all")
        b = searcher.search(F.Term(term), k=7, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
