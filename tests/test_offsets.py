"""OFFS/PAY index features: analyzer offsets, stream roundtrip through
segments and merges, payload analyzer, highlight-from-index parity.

Reference: ``core/analysis/token_attributes.hpp`` (offset / payload
attributes), ``core/formats/formats_10.cpp:326-333`` (.pay file with
offset + payload streams per occurrence).
"""

import os

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.analysis.analyzers import (
    DelimitedPayloadAnalyzer,
    KeywordAnalyzer,
    SegmentationAnalyzer,
    TextAnalyzer,
    get_analyzer,
)
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.merge import merge_segments
from iresearch_ray.index.segment import (
    SegmentReader,
    invert_batch,
    write_segment,
)

TEXTS = [
    "Hello world, hello RAY data!",
    "  the quick brown fox --- jumps over the lazy dog the",
    None,
    "",
    "one",
    "héllo naïve café héllo " * 3,
    "a-b c_d 42 x9y",
]


def _check_spans_match_tokens(texts, d, t, s, e, case_fold=True):
    for di, tok, st, en in zip(d, t.to_pylist(), s, e):
        surf = texts[di][st:en]
        if case_fold:
            surf = surf.lower()
        assert surf == tok, (di, tok, surf, st, en)


class TestTokenizeOffsets:
    def test_segmentation_spans(self):
        an = SegmentationAnalyzer()
        arr = pa.array(TEXTS, type=pa.string())
        d, t, p, s, e = an.tokenize_offsets(arr)
        _check_spans_match_tokens(TEXTS, d, t, s, e)

    def test_parity_with_plain_tokenize(self):
        an = SegmentationAnalyzer()
        arr = pa.array(TEXTS, type=pa.string())
        d, t, p, s, e = an.tokenize_offsets(arr)
        d2, t2, p2 = an.tokenize(arr)
        assert np.array_equal(d, d2)
        assert np.array_equal(p, p2)
        assert t.to_pylist() == t2.to_pylist()

    def test_graphic_break_spans(self):
        an = SegmentationAnalyzer(word_break="graphic")
        arr = pa.array(TEXTS, type=pa.string())
        d, t, p, s, e = an.tokenize_offsets(arr)
        _check_spans_match_tokens(TEXTS, d, t, s, e)

    def test_text_analyzer_spans_survive_filters(self):
        """Stems / stopword removal / edge n-grams keep the ORIGINAL
        surface token's span (what a highlighter should mark)."""
        an = TextAnalyzer(stopwords=frozenset({"the"}), stemming=True,
                          min_gram=2, max_gram=4)
        arr = pa.array(TEXTS, type=pa.string())
        d, t, p, s, e = an.tokenize_offsets(arr)
        assert "the" not in set(t.to_pylist())
        for di, st, en in zip(d, s, e):
            surf = TEXTS[di][st:en]
            # span is a whole surface token (no separators inside)
            assert surf and not any(c.isspace() for c in surf)

    def test_keyword_spans(self):
        an = KeywordAnalyzer()
        arr = pa.array(["abc", None, "hello world"], type=pa.string())
        d, t, p, s, e = an.tokenize_offsets(arr)
        assert s.tolist() == [0, 0]
        assert e.tolist() == [3, 11]


class TestDelimitedPayload:
    def test_payload_split(self):
        an = DelimitedPayloadAnalyzer()
        arr = pa.array(["apple|3 banana pear|12", "apple|1 apple|2"],
                       type=pa.string())
        d, t, p, pay = an.tokenize_payloads(arr)
        assert t.to_pylist() == ["apple", "banana", "pear", "apple", "apple"]
        assert pay.tolist() == [3, 0, 12, 1, 2]

    def test_tokenize_strips_suffix(self):
        an = DelimitedPayloadAnalyzer()
        assert an.tokenize_query("apple|3") == ["apple"]

    def test_registry(self):
        an = get_analyzer("delimited_payload", {"delimiter": "|"})
        assert isinstance(an, DelimitedPayloadAnalyzer)


@pytest.fixture(scope="module")
def offs_index(tmp_path_factory):
    """Two-segment OFFS index over a deterministic corpus."""
    idx = str(tmp_path_factory.mktemp("offsidx"))
    rng = np.random.default_rng(7)
    words = np.array(["alpha", "beta", "gamma", "delta", "epsilon", "zeta"])
    texts = ["Doc %d: %s" % (i, " ".join(rng.choice(words, rng.integers(2, 200))))
             for i in range(400)]
    an = SegmentationAnalyzer()
    metas, rows = [], []
    for part, (lo, hi) in zip("ab", [(0, 200), (200, 400)]):
        b = pa.table({
            "conv_id": [part] * (hi - lo),
            "turn_idx": list(range(hi - lo)),
            "text": texts[lo:hi],
        })
        metas.append(write_segment(idx, b, an, index_features=("offs",)))
    Manifest.commit(idx, metas)
    return idx, metas, texts


class TestOffsRoundtrip:
    def test_segment_doc_offsets(self, offs_index):
        idx, metas, texts = offs_index
        r = SegmentReader(os.path.join(idx, metas[0]["name"]))
        assert r.index_features == {"offs"}
        checked = 0
        for term in ["alpha", "doc", "zeta"]:
            ti = r.lookup(term)
            assert ti >= 0
            pl = r.postings(ti, positions=True)
            starts, ends = r.occurrence_offsets(ti)
            assert starts.size == int(pl.tfs.sum())
            for local in pl.docs[::11]:
                s, e = r.doc_offsets(ti, int(local))
                assert s.size > 0
                for a, b in zip(s, e):
                    assert texts[local - 1][a:b].lower() == term
                    checked += 1
        assert checked > 10

    def test_large_df_block_path(self, tmp_path):
        """>128-doc terms exercise the bitpacked-block + tail layout;
        the offs stream must stay aligned through it."""
        texts = ["common word%d" % (i % 7) for i in range(300)]
        b = pa.table({"conv_id": ["x"] * 300,
                      "turn_idx": list(range(300)), "text": texts})
        m = write_segment(str(tmp_path), b, SegmentationAnalyzer(),
                          index_features=("offs",))
        r = SegmentReader(os.path.join(str(tmp_path), m["name"]))
        ti = r.lookup("common")
        s, e = r.occurrence_offsets(ti)
        assert s.tolist() == [0] * 300
        assert e.tolist() == [6] * 300

    def test_merge_carries_offsets(self, offs_index, tmp_path):
        idx, metas, texts = offs_index
        m1, m2 = dict(metas[0]), dict(metas[1])
        m1["doc_base"], m2["doc_base"] = 0, m1["docs_count"]
        mm = merge_segments(idx, [m1, m2], out_dir=str(tmp_path))
        r = SegmentReader(os.path.join(str(tmp_path), mm["name"]))
        assert "offs" in r.index_features
        for term in ["alpha", "epsilon"]:
            ti = r.lookup(term)
            pl = r.postings(ti, positions=True)
            for local in pl.docs[::17]:
                s, e = r.doc_offsets(ti, int(local))
                for a, b in zip(s, e):
                    assert texts[local - 1][a:b].lower() == term

    def test_mixed_feature_merge_drops_stream(self, offs_index, tmp_path):
        idx, metas, texts = offs_index
        plain = write_segment(
            str(tmp_path),
            pa.table({"conv_id": ["z"] * 3, "turn_idx": [0, 1, 2],
                      "text": ["alpha beta", "gamma", "alpha"]}),
            SegmentationAnalyzer())
        m1 = dict(metas[0])
        m1["doc_base"] = 0
        plain = dict(plain)
        plain["doc_base"] = m1["docs_count"]
        # readers live in different dirs: copy plain next to the index
        import shutil

        shutil.copytree(os.path.join(str(tmp_path), plain["name"]),
                        os.path.join(idx, plain["name"]))
        mm = merge_segments(idx, [m1, plain], out_dir=str(tmp_path))
        r = SegmentReader(os.path.join(str(tmp_path), mm["name"]))
        assert "offs" not in r.index_features
        ti = r.lookup("alpha")
        assert ti >= 0
        with pytest.raises(KeyError):
            r.occurrence_offsets(ti)


class TestPayRoundtrip:
    def test_segment_payloads(self, tmp_path):
        texts = ["run|5 walk|2 run|7", "walk|1", "run"]
        b = pa.table({"conv_id": ["p"] * 3, "turn_idx": [0, 1, 2],
                      "text": texts})
        m = write_segment(str(tmp_path), b, DelimitedPayloadAnalyzer(),
                          index_features=("pay",))
        r = SegmentReader(os.path.join(str(tmp_path), m["name"]))
        assert r.index_features == {"pay"}
        ti = r.lookup("run")
        pl = r.postings(ti, positions=True)
        assert pl.docs.tolist() == [1, 3]
        assert r.payloads(ti).tolist() == [5, 7, 0]
        ti = r.lookup("walk")
        assert r.payloads(ti).tolist() == [2, 1]

    def test_merge_carries_payloads(self, tmp_path):
        an = DelimitedPayloadAnalyzer()
        ms = []
        for part, txts in [("a", ["x|1 y|2", "x|3"]), ("b", ["y|9"])]:
            b = pa.table({"conv_id": [part] * len(txts),
                          "turn_idx": list(range(len(txts))),
                          "text": txts})
            ms.append(write_segment(str(tmp_path), b, an,
                                    index_features=("pay",)))
        ms[0]["doc_base"], ms[1]["doc_base"] = 0, ms[0]["docs_count"]
        mm = merge_segments(str(tmp_path), ms)
        r = SegmentReader(os.path.join(str(tmp_path), mm["name"]))
        assert r.payloads(r.lookup("x")).tolist() == [1, 3]
        assert r.payloads(r.lookup("y")).tolist() == [2, 9]


class TestPayloadScoring:
    @pytest.fixture(scope="class")
    def pay_searcher(self, tmp_path_factory):
        from iresearch_ray.search.searcher import IndexSearcher

        tmp = str(tmp_path_factory.mktemp("payidx"))
        texts = ["run|5 walk|2 run|7", "walk|1 run|4", "run jump|9", "jump"]
        b = pa.table({"conv_id": ["p"] * 4, "turn_idx": [0, 1, 2, 3],
                      "text": texts})
        m = write_segment(
            tmp, b, DelimitedPayloadAnalyzer(),
            analyzer_spec={"name": "delimited_payload", "options": {}},
            index_features=("pay",))
        Manifest.commit(tmp, [m])
        return IndexSearcher(tmp)

    @pytest.mark.parametrize("agg,expected", [
        ("sum", {1: 12.0, 2: 4.0, 3: 0.0}),
        ("max", {1: 7.0, 2: 4.0, 3: 0.0}),
        ("min", {1: 5.0, 2: 4.0, 3: 0.0}),
        ("avg", {1: 6.0, 2: 4.0, 3: 0.0}),
    ])
    def test_aggregates(self, pay_searcher, agg, expected):
        from iresearch_ray.search import filters as F

        res = pay_searcher.search(F.PayloadTerm("run", agg=agg, boost=2.0),
                                  k=10)
        got = dict(zip(res["doc_id"], res["score"]))
        assert got == {k: v * 2 for k, v in expected.items()}

    def test_missing_term(self, pay_searcher):
        from iresearch_ray.search import filters as F

        assert len(pay_searcher.search(F.PayloadTerm("absent"), k=5)) == 0

    def test_bad_agg(self, pay_searcher):
        from iresearch_ray.search import filters as F

        with pytest.raises(ValueError):
            pay_searcher.search(F.PayloadTerm("run", agg="median"), k=5)


class TestHighlightFromOffsets:
    def test_parity_with_reanalyze(self, offs_index):
        from iresearch_ray.search.filters import Or, Term
        from iresearch_ray.search.highlight import highlight
        from iresearch_ray.search.searcher import IndexSearcher

        idx, metas, texts = offs_index
        searcher = IndexSearcher(idx)
        flt = Or([Term("alpha"), Term("zeta")])
        fast = highlight(searcher, flt, k=8, source="offsets")
        slow = highlight(searcher, flt, k=8, source="reanalyze")
        assert fast["doc_id"].tolist() == slow["doc_id"].tolist()
        assert fast["offsets"].tolist() == slow["offsets"].tolist()
        assert fast["snippet"].tolist() == slow["snippet"].tolist()
        assert any("<em>" in s for s in fast["snippet"])

    def test_auto_picks_offsets(self, offs_index):
        from iresearch_ray.search.filters import Term
        from iresearch_ray.search.highlight import highlight
        from iresearch_ray.search.searcher import IndexSearcher

        idx, metas, texts = offs_index
        searcher = IndexSearcher(idx)
        res = highlight(searcher, Term("gamma"), k=3, source="auto")
        for _, row in res.iterrows():
            txt = texts[int(row["doc_id"]) - 1] \
                if int(row["doc_id"]) <= 200 else None
            for a, b in row["offsets"]:
                pass  # spans validated in parity test; here: well-formed
            assert all(a < b for a, b in row["offsets"])


class TestOffsPlusPay:
    """OFFS+PAY on one field (VERDICT r2 #6; the reference stores both
    in the same .pay stream, formats_10.cpp:326-333)."""

    @pytest.fixture(scope="class")
    def both_index(self, tmp_path_factory):
        tmp = str(tmp_path_factory.mktemp("bothidx"))
        an = DelimitedPayloadAnalyzer()
        ms = []
        for part, txts in [
                ("a", ["run|5 walk|2 run|7", "walk|1 run|4"]),
                ("b", ["run jump|9", "jump run|3"])]:
            b = pa.table({"conv_id": [part] * len(txts),
                          "turn_idx": list(range(len(txts))),
                          "text": txts})
            ms.append(write_segment(
                tmp, b, an,
                analyzer_spec={"name": "delimited_payload", "options": {}},
                index_features=("offs", "pay")))
        return tmp, ms, an

    def test_both_streams_roundtrip(self, both_index):
        tmp, ms, an = both_index
        r = SegmentReader(os.path.join(tmp, ms[0]["name"]))
        assert r.index_features == {"offs", "pay"}
        ti = r.lookup("run")
        assert r.payloads(ti).tolist() == [5, 7, 4]
        s, e = r.occurrence_offsets(ti)
        # spans cover the TERM only, not the |payload suffix
        texts = ["run|5 walk|2 run|7", "walk|1 run|4"]
        pl = r.postings(ti, positions=True)
        doc_of_occ = np.repeat(pl.docs, pl.tfs)
        for d, a, b in zip(doc_of_occ, s, e):
            assert texts[d - 1][a:b] == "run"

    def test_merge_carries_both(self, both_index, tmp_path):
        tmp, ms, an = both_index
        m1, m2 = dict(ms[0]), dict(ms[1])
        m1["doc_base"], m2["doc_base"] = 0, m1["docs_count"]
        mm = merge_segments(tmp, [m1, m2], out_dir=str(tmp_path))
        r = SegmentReader(os.path.join(str(tmp_path), mm["name"]))
        assert r.index_features == {"offs", "pay"}
        assert r.payloads(r.lookup("run")).tolist() == [5, 7, 4, 0, 3]
        assert r.payloads(r.lookup("jump")).tolist() == [9, 0]
        s, e = r.occurrence_offsets(r.lookup("jump"))
        assert (e - s).tolist() == [4, 4]

    def test_payload_scored_highlighted_query(self, both_index):
        """Payload scoring + highlight from stored offsets on the SAME
        index — the user scenario the r2 gap blocked."""
        from iresearch_ray.search import filters as F
        from iresearch_ray.search.highlight import highlight
        from iresearch_ray.search.searcher import IndexSearcher

        tmp, ms, an = both_index
        Manifest.commit(tmp, ms)
        searcher = IndexSearcher(tmp)
        res = searcher.search(F.PayloadTerm("run", agg="sum"), k=10)
        got = dict(zip(res["doc_id"], res["score"]))
        assert got == {1: 12.0, 2: 4.0, 3: 0.0, 4: 3.0}
        hl = highlight(searcher, F.Term("run"), k=4, source="offsets")
        assert all("<em>run</em>" in s for s in hl["snippet"])

    def test_plain_analyzer_gets_zero_payloads(self, tmp_path):
        """Any offsets-capable analyzer supports the combined feature
        set (zero payloads by default)."""
        b = pa.table({"conv_id": ["z"], "turn_idx": [0],
                      "text": ["alpha beta alpha"]})
        m = write_segment(str(tmp_path), b, SegmentationAnalyzer(),
                          index_features=("offs", "pay"))
        r = SegmentReader(os.path.join(str(tmp_path), m["name"]))
        ti = r.lookup("alpha")
        assert r.payloads(ti).tolist() == [0, 0]
        s, e = r.occurrence_offsets(ti)
        assert s.tolist() == [0, 11]


class TestInvertGuards:
    def test_analyzer_without_offsets_raises(self):
        from iresearch_ray.analysis.analyzers import NgramAnalyzer

        with pytest.raises(NotImplementedError):
            NgramAnalyzer(min_gram=2, max_gram=2).tokenize_offsets(
                pa.array(["abc"], type=pa.string()))
