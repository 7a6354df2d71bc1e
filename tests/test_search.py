"""Search kernels vs the independent brute-force oracle (tests/oracle.py)."""

import numpy as np
import pytest

from iresearch_ray.search import filters as F

from .oracle import OracleIndex, tokenize


@pytest.fixture(scope="module")
def oracle(small_corpus):
    ordered = small_corpus.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    return OracleIndex(ordered)


def ids(arr):
    return sorted(np.asarray(arr).tolist())


def test_term_postings_match_oracle(searcher, oracle):
    for term in ["the", "ref", "deploy", "second", "rare00001", "zzz-missing"]:
        got = ids(searcher.match_docs(F.Term(term)))
        assert got == sorted(oracle.postings.get(term, {})), term


def test_term_scores_match_oracle(searcher, oracle):
    for term in ["ref", "deploy", "the"]:
        res = searcher.search(F.Term(term), k=20, mode="all")
        exp = OracleIndex.topk(oracle.score_term(term), 20)
        assert res["doc_id"].tolist() == [d for d, _ in exp], term
        np.testing.assert_allclose(
            res["score"].to_numpy(), [s for _, s in exp], rtol=1e-6
        )


def test_wand_rank_identical_to_exhaustive(searcher):
    for term in ["the", "ref", "ok", "deploy", "med001", "rare00003"]:
        for k in (1, 5, 100):
            strict = searcher.search(F.Term(term), k=k, mode="strict")
            full = searcher.search(F.Term(term), k=k, mode="all")
            assert strict["doc_id"].tolist() == full["doc_id"].tolist(), (term, k)
            np.testing.assert_array_equal(
                strict["score"].to_numpy(), full["score"].to_numpy()
            )


def test_and_or_not(searcher, oracle):
    t = set(oracle.postings.get("the", {}))
    r = set(oracle.postings.get("ref", {}))
    assert ids(searcher.match_docs(F.And([F.Term("the"), F.Term("ref")]))) == sorted(t & r)
    assert ids(searcher.match_docs(F.Or([F.Term("the"), F.Term("ref")]))) == sorted(t | r)
    allv = set(range(1, oracle.n + 1))
    assert ids(searcher.match_docs(F.Not(F.Term("the")))) == sorted(allv - t)
    assert ids(
        searcher.match_docs(F.And([F.Term("ref"), F.Not(F.Term("the"))]))
    ) == sorted(r - t)


def test_and_scores_are_summed(searcher, oracle):
    res = searcher.search(F.And([F.Term("ref"), F.Term("ok")]), k=10, mode="all")
    exp = OracleIndex.topk(
        OracleIndex.intersect_sum(oracle.score_term("ref"), oracle.score_term("ok")), 10
    )
    assert res["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(res["score"].to_numpy(), [s for _, s in exp], rtol=1e-5)


def test_or_scores_are_summed(searcher, oracle):
    res = searcher.search(F.Or([F.Term("deploy"), F.Term("second")]), k=10, mode="all")
    exp = OracleIndex.topk(
        OracleIndex.merge_sum(oracle.score_term("deploy"), oracle.score_term("second")),
        10,
    )
    assert res["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(res["score"].to_numpy(), [s for _, s in exp], rtol=1e-5)


def test_min_match(searcher, oracle):
    terms = ["ref", "ok", "deploy"]
    sets = [set(oracle.postings.get(t, {})) for t in terms]
    exp = sorted(
        d
        for d in set().union(*sets)
        if sum(d in s for s in sets) >= 2
    )
    got = ids(searcher.match_docs(F.Or([F.Term(t) for t in terms], min_match=2)))
    assert got == exp


def test_phrase(searcher, oracle):
    res = searcher.search(F.Phrase(["ref", "name"]), k=15, mode="all")
    exp = OracleIndex.topk(oracle.score_phrase(["ref", "name"]), 15)
    assert res["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(res["score"].to_numpy(), [s for _, s in exp], rtol=1e-6)


def test_phrase_three_terms(searcher, small_corpus, oracle):
    # find any adjacent triple in the corpus to assert a non-empty result
    got = ids(searcher.match_docs(F.Phrase(["deploy", "target"])))
    assert got == sorted(oracle.score_phrase(["deploy", "target"]))


def _brute_sloppy(oracle, terms, slop):
    """Independent brute force: doc matches iff some strictly-increasing
    position chain (one position per query slot, in order) has total span
    slack (p_last - p_first) - (m-1) <= slop. Enumerates chains directly
    (itertools product), no greedy shortcut."""
    from itertools import product

    hits = set()
    for doc0, toks in enumerate(oracle.docs_tokens):
        pos_lists = [
            [i for i, t in enumerate(toks) if t == q] for q in terms
        ]
        if any(not p for p in pos_lists):
            continue
        for chain in product(*pos_lists):
            if all(b > a for a, b in zip(chain, chain[1:])) and (
                chain[-1] - chain[0] - (len(terms) - 1) <= slop
            ):
                hits.add(doc0 + 1)
                break
    return sorted(hits)


def test_sloppy_phrase_matches_brute_force(searcher, oracle):
    for terms, slop in [
        (["ref", "name"], 0),
        (["ref", "name"], 3),
        (["deploy", "target"], 2),
        (["the", "ref", "deploy"], 6),
        (["second", "the"], 4),
    ]:
        got = ids(searcher.match_docs(F.SloppyPhrase(terms, slop=slop)))
        assert got == _brute_sloppy(oracle, terms, slop), (terms, slop)


def _brute_gap(oracle, terms, gaps):
    """Independent brute force for gap phrases: slot i must sit at
    start + i + sum(gaps[1..i])."""
    shifts = [i + sum(gaps[1 : i + 1]) for i in range(len(terms))]
    hits = set()
    for doc0, toks in enumerate(oracle.docs_tokens):
        for p in range(len(toks)):
            if all(
                p + s < len(toks) and toks[p + s] == t
                for t, s in zip(terms, shifts)
            ):
                hits.add(doc0 + 1)
                break
    return sorted(hits)


def test_gap_phrase_matches_brute_force(searcher, oracle):
    for terms, gaps in [
        (["ref", "name"], [0, 1]),
        (["ref", "name"], [0, 2]),
        (["deploy", "target"], [0, 1]),
        (["the", "ref", "ok"], [0, 1, 0]),
        (["the", "deploy", "target"], [0, 2, 0]),
    ]:
        got = ids(searcher.match_docs(F.Phrase(terms, gaps=gaps)))
        assert got == _brute_gap(oracle, terms, gaps), (terms, gaps)


def test_gap_phrase_zero_gaps_equals_exact_phrase(searcher):
    for terms in (["ref", "name"], ["deploy", "target"]):
        gapped = ids(searcher.match_docs(F.Phrase(terms, gaps=[0] * len(terms))))
        exact = ids(searcher.match_docs(F.Phrase(terms)))
        assert gapped == exact, terms


def test_sloppy_phrase_slop0_equals_exact_phrase(searcher):
    for terms in (["ref", "name"], ["deploy", "target"]):
        sloppy = ids(searcher.match_docs(F.SloppyPhrase(terms, slop=0)))
        exact = ids(searcher.match_docs(F.Phrase(terms)))
        assert sloppy == exact, terms


def test_regexp_matches_brute_force(searcher, oracle):
    import re

    for pat in [r"ref|deploy", r"sec[a-z]+", r"rare0000[13]", r"th?e",
                r"dep(loy)?s?"]:
        rx = re.compile(f"^(?:{pat})$")
        exp = set()
        for t, posts in oracle.postings.items():
            if rx.match(t):
                exp |= set(posts)
        got = ids(searcher.match_docs(F.Regexp(pat)))
        assert got == sorted(exp), pat


def test_regexp_literal_prefix_helper():
    from iresearch_ray.search.filters import _regex_literal_prefix as lp

    assert lp("abc") == "abc"
    assert lp("abc.*") == "abc"
    assert lp("abc*") == "ab"      # '*' makes the 'c' optional
    assert lp("abc?d") == "ab"
    assert lp("abc{0,2}") == "ab"
    assert lp("ab|cd") == ""       # alternation disables narrowing
    assert lp("(ab)c") == ""
    assert lp("a[bc]") == "a"


def test_prefix(searcher, oracle):
    exp = set()
    for t, posts in oracle.postings.items():
        if t.startswith("sec"):
            exp |= set(posts)
    assert ids(searcher.match_docs(F.Prefix("sec"))) == sorted(exp)


def test_wildcard(searcher, oracle):
    exp = set()
    for t, posts in oracle.postings.items():
        if t.startswith("dep") and len(t) >= 3:
            exp |= set(posts)
    assert ids(searcher.match_docs(F.Wildcard("dep%"))) == sorted(exp)
    # single-char wildcard
    exp1 = set()
    for t, posts in oracle.postings.items():
        if len(t) == 3 and t[0] == "r" and t[2] == "f":
            exp1 |= set(posts)
    assert ids(searcher.match_docs(F.Wildcard("r_f"))) == sorted(exp1)


def test_fuzzy(searcher, oracle):
    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            ndp = [i]
            for j, cb in enumerate(b, 1):
                ndp.append(min(dp[j] + 1, ndp[-1] + 1, dp[j - 1] + (ca != cb)))
            dp = ndp
        return dp[-1]

    for target, d in [("deploy", 1), ("deploy", 2), ("ref", 1)]:
        exp = set()
        for t, posts in oracle.postings.items():
            if lev(target, t) <= d:
                exp |= set(posts)
        got = ids(searcher.match_docs(F.Fuzzy(target, d)))
        assert got == sorted(exp), (target, d)


def test_range(searcher, oracle):
    exp = set()
    for t, posts in oracle.postings.items():
        if "sec" <= t <= "seczzz":
            exp |= set(posts)
    assert ids(searcher.match_docs(F.Range("sec", "seczzz"))) == sorted(exp)


def test_column_existence(searcher, small_corpus):
    ordered = small_corpus.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    tools = ordered.column("tool").to_pylist()
    exp = [i + 1 for i, t in enumerate(tools) if t]
    assert ids(searcher.match_docs(F.ColumnExistence("tool"))) == exp


def test_stored_fields_roundtrip(searcher, small_corpus):
    """Per-turn text-equality invariant: docmap joined by global docid
    reproduces the input text under stable (conv_id, turn_idx) order."""
    ordered = small_corpus.sort_by(
        [("conv_id", "ascending"), ("turn_idx", "ascending")]
    )
    n = ordered.num_rows
    all_docs = np.arange(1, n + 1, dtype=np.int64)
    df = searcher.fetch_stored(all_docs, ("conv_id", "turn_idx", "text"))
    assert df["conv_id"].tolist() == ordered.column("conv_id").to_pylist()
    assert df["turn_idx"].tolist() == ordered.column("turn_idx").to_pylist()
    assert df["text"].tolist() == ordered.column("text").to_pylist()


def test_tfidf_scores(searcher, oracle):
    from iresearch_ray.search.scorers import TFIDF

    res = searcher.search(F.Term("deploy"), k=10, scorer=TFIDF(), mode="all")
    dwt = oracle.df("deploy")
    idf = np.float32(1.0 + np.log(oracle.docs_with_field / (dwt + 1.0)))
    exp = {
        d: float(np.float32(np.sqrt(np.float32(len(p)))) * idf)
        for d, p in oracle.postings["deploy"].items()
    }
    top = OracleIndex.topk(exp, 10)
    assert res["doc_id"].tolist() == [d for d, _ in top]
    np.testing.assert_allclose(res["score"].to_numpy(), [s for _, s in top], rtol=1e-6)


def test_variadic_phrase(searcher, oracle):
    """Wildcard/prefix slots inside a phrase (reference variadic phrase)."""
    import re

    # phrase: any dep*-prefixed term followed by "target"
    got = ids(searcher.match_docs(F.Phrase([{"prefix": "deploy"}, "target"])))
    exp = set()
    for d, poss in oracle.postings.get("target", {}).items():
        for t, pd in oracle.postings.items():
            if t.startswith("deploy") and d in pd:
                if any(p - 1 in pd[d] for p in poss):
                    exp.add(d)
    assert got == sorted(exp)
    # any_of slot
    got2 = ids(searcher.match_docs(F.Phrase([{"any_of": ["ref", "deploy"]},
                                             {"any_of": ["name", "target"]}])))
    exp2 = set(oracle.score_phrase(["ref", "name"])) | set(
        oracle.score_phrase(["deploy", "target"])) | set(
        oracle.score_phrase(["ref", "target"])) | set(
        oracle.score_phrase(["deploy", "name"]))
    assert got2 == sorted(exp2)


def test_scored_terms_limit_two_tier(searcher):
    """Two-tier multiterm: same matched docs, top-T terms scored."""
    full = searcher.search(F.Prefix("sec"), k=300, mode="all")
    limited = searcher.search(F.Prefix("sec", scored_terms_limit=1), k=300, mode="all")
    assert set(limited["doc_id"]) == set(full["doc_id"])  # matching identical
    # scores differ (only the top-df term contributes)
    assert (limited["score"].to_numpy() <= full["score"].to_numpy().max() + 1e-6).all()


def test_or_max_merger(searcher, oracle):
    res = searcher.search(F.Or([F.Term("deploy"), F.Term("second")],
                               score_merge="max"), k=10, mode="all")
    a, b = oracle.score_term("deploy"), oracle.score_term("second")
    exp_scores = {d: max(a.get(d, 0.0), b.get(d, 0.0)) for d in set(a) | set(b)}
    exp = OracleIndex.topk(exp_scores, 10)
    assert res["doc_id"].tolist() == [d for d, _ in exp]
    np.testing.assert_allclose(res["score"].to_numpy(), [s for _, s in exp], rtol=1e-6)


def test_wand_and_rank_identical_to_exhaustive(searcher):
    """Block-max conjunction (leapfrog + driving-block pruning) must be
    bit-identical to the exhaustive cost-sorted intersection."""
    cases = [
        ["the", "ref"],
        ["the", "deploy"],
        ["the", "ref", "deploy"],
        ["ok", "rare00003"],
        ["the", "zzz_not_a_term"],
    ]
    for terms in cases:
        for k in (1, 5, 100):
            flt = F.And([F.Term(t) for t in terms])
            strict = searcher.search(flt, k=k, mode="strict")
            full = searcher.search(flt, k=k, mode="all")
            assert strict["doc_id"].tolist() == full["doc_id"].tolist(), (terms, k)
            np.testing.assert_array_equal(
                strict["score"].to_numpy(), full["score"].to_numpy())


def test_ngram_prefilter_identity(searcher):
    """Min-match doc prefilter + restricted phrase evaluation must not
    change n-gram similarity results."""
    queries = [
        ("deploy the build target", 0.5),
        ("check the deploy target", 0.7),
        ("the of to in", 0.4),
    ]
    for text, thr in queries:
        flt = F.NGramSimilarity(text, threshold=thr)
        a = searcher.search(flt, k=50, mode="all")
        # brute-force path: evaluate each phrase unrestricted by calling
        # the DP with threshold via a fresh filter at threshold ~0 and
        # re-filtering is complex; instead assert strict == all (the
        # prefilter runs in both, so compare against match_docs count
        # monotonicity) and spot-check score ordering is descending
        assert (np.diff(a["score"].to_numpy()) <= 1e-6).all()
        b = searcher.search(flt, k=50, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_or_minmatch_strict_identical(searcher):
    flt = F.Or([F.Term("the"), F.Term("ref"), F.Term("deploy"),
                F.Term("second")], min_match=2)
    for k in (1, 10, 200):
        a = searcher.search(flt, k=k, mode="strict")
        b = searcher.search(flt, k=k, mode="all")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        np.testing.assert_array_equal(a["score"].to_numpy(),
                                      b["score"].to_numpy())


def test_parallel_query_threads_rank_identical(small_index):
    """query_threads > 1 must return bit-identical frames to the
    sequential scan for every query shape (order-independent TopK)."""
    import pandas as pd

    from iresearch_ray.search.searcher import IndexSearcher

    seq = IndexSearcher(small_index, query_threads=1)
    par = IndexSearcher(small_index, query_threads=4)
    queries = [
        F.Term("ref"),
        F.Or([F.Term("ref"), F.Term("deploy"), F.Term("ok")]),
        F.And([F.Term("the"), F.Term("ref")]),
        F.Phrase(["deploy", "target"]),
        F.Prefix("dep"),
        F.Or([F.Term("the"), F.Phrase(["deploy", "target"])]),
    ]
    for flt in queries:
        for mode in ("strict", "all"):
            a = seq.search(flt, k=15, mode=mode)
            b = par.search(flt, k=15, mode=mode)
            pd.testing.assert_frame_equal(a, b), (flt, mode)
    for flt in queries:
        assert ids(seq.match_docs(flt)) == ids(par.match_docs(flt))


def test_levenshtein_transpositions_kernel():
    """OSA/Damerau option of the fuzzy kernel vs a scalar reference."""
    import random

    from iresearch_ray.search.filters import _levenshtein_many

    assert _levenshtein_many("scan", ["sacn"], 2,
                             transpositions=True)[0] == 1
    assert _levenshtein_many("scan", ["sacn"], 2)[0] == 2  # plain = 2

    def osa(a: str, b: str) -> int:
        la, lb = len(a), len(b)
        d = [[0] * (lb + 1) for _ in range(la + 1)]
        for i in range(la + 1):
            d[i][0] = i
        for j in range(lb + 1):
            d[0][j] = j
        for i in range(1, la + 1):
            for j in range(1, lb + 1):
                cost = 0 if a[i - 1] == b[j - 1] else 1
                d[i][j] = min(d[i - 1][j] + 1, d[i][j - 1] + 1,
                              d[i - 1][j - 1] + cost)
                if (i > 1 and j > 1 and a[i - 1] == b[j - 2]
                        and a[i - 2] == b[j - 1]):
                    d[i][j] = min(d[i][j], d[i - 2][j - 2] + 1)
        return d[la][lb]

    rng = random.Random(9)
    for _ in range(300):
        a = "".join(rng.choice("abc") for _ in range(rng.randrange(1, 7)))
        bs = ["".join(rng.choice("abc")
                      for _ in range(rng.randrange(1, 7)))
              for _ in range(5)]
        got = _levenshtein_many(a, bs, 6, transpositions=True)
        for b, g in zip(bs, got):
            assert int(g) == osa(a, b), (a, b)


def test_collapse_topk_matches_brute_force(searcher):
    from iresearch_ray.api import collapse_topk

    flt = F.Or([F.Term("deploy"), F.Term("ref")])
    got = collapse_topk(searcher, flt, group_col="role", k=5,
                        round_to=None, id_col=None)

    n_docs = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n_docs, mode="all")
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), ("role",))
    # brute force: results already score desc / doc asc; first per role
    seen, want = set(), []
    for did, role, sc in zip(res["doc_id"], stored["role"],
                             res["score"]):
        if role in seen:
            continue
        seen.add(role)
        want.append((int(did), role, float(sc)))
        if len(want) == 5:
            break
    assert list(got["doc_id"]) == [w[0] for w in want]
    assert list(got["role"]) == [w[1] for w in want]
    assert np.allclose(got["score_r"], [w[2] for w in want])
    # one row per group, groups unique
    assert got["role"].is_unique


def _brute_unordered_near(oracle, terms, window):
    hits = set()
    for doc0, toks in enumerate(oracle.docs_tokens):
        pos = {t: [p for p, x in enumerate(toks) if x == t] for t in terms}
        if any(not v for v in pos.values()):
            continue
        import itertools
        for combo in itertools.product(*(pos[t] for t in terms)):
            if max(combo) - min(combo) <= window:
                hits.add(doc0 + 1)
                break
    return sorted(hits)


def test_unordered_near_matches_brute_force(searcher, oracle):
    for terms, w in [
        (["ref", "name"], 0),
        (["ref", "name"], 4),
        (["deploy", "target"], 2),
        (["the", "ref", "deploy"], 6),
        (["second", "the"], 5),
    ]:
        got = ids(searcher.match_docs(F.UnorderedNear(terms, window=w)))
        assert got == _brute_unordered_near(oracle, terms, w), (terms, w)


def test_unordered_near_superset_of_sloppy(searcher):
    # any ordered chain with span slack <= s is a window of span
    # <= s + m - 1, so sloppy matches are a subset
    terms, slop = ["the", "ref"], 3
    sl = set(np.asarray(searcher.match_docs(
        F.SloppyPhrase(terms, slop=slop))).tolist())
    un = set(np.asarray(searcher.match_docs(
        F.UnorderedNear(terms, window=slop + len(terms) - 1))).tolist())
    assert sl <= un


def test_dismax_matches_manual_combine(searcher):
    from iresearch_ray.search.scorers import BM25

    sc = BM25(dtype=np.float64)
    terms = ["deploy", "ref", "the"]
    per = {}
    for t in terms:
        r = searcher.search(F.Term(t), k=10**6, scorer=sc, mode="all")
        per[t] = dict(zip(r["doc_id"].tolist(), r["score"].tolist()))
    want = {}
    for t in terms:
        for d, s in per[t].items():
            want.setdefault(d, []).append(s)
    tb = 0.37
    want = {d: max(v) + tb * (sum(v) - max(v)) for d, v in want.items()}
    got = searcher.search(
        F.Or([F.Term(t) for t in terms], score_merge="dismax",
             tie_breaker=tb),
        k=10**6, scorer=sc, mode="all")
    assert len(got) == len(want)
    for d, s in zip(got["doc_id"], got["score"]):
        assert abs(s - want[int(d)]) < 1e-9, d


def test_dismax_degenerate_ends(searcher):
    sc_terms = [F.Term("deploy"), F.Term("ref")]
    base = searcher.search(F.Or(sc_terms), k=50, mode="all")
    tb1 = searcher.search(F.Or(sc_terms, score_merge="dismax",
                               tie_breaker=1.0), k=50, mode="all")
    assert list(base["doc_id"]) == list(tb1["doc_id"])
    assert np.allclose(base["score"], tb1["score"], rtol=1e-6)
    mx = searcher.search(F.Or(sc_terms, score_merge="max"), k=50, mode="all")
    tb0 = searcher.search(F.Or(sc_terms, score_merge="dismax",
                               tie_breaker=0.0), k=50, mode="all")
    assert list(mx["doc_id"]) == list(tb0["doc_id"])
    assert np.allclose(mx["score"], tb0["score"], rtol=1e-6)


def test_span_first_matches_brute_force(searcher, oracle):
    for term, end in [("the", 1), ("ref", 3), ("deploy", 5), ("second", 2)]:
        exp = sorted(
            doc0 + 1 for doc0, toks in enumerate(oracle.docs_tokens)
            if term in toks[:end]
        )
        got = ids(searcher.match_docs(F.SpanFirst(term, end=end)))
        assert got == exp, (term, end)


def test_span_first_tf_counts_window_occurrences(searcher, oracle):
    # a doc with the term only AFTER the window must not match; tf in a
    # matching doc counts only in-window occurrences
    term, end = "the", 4
    res = searcher.search(F.SpanFirst(term, end=end), k=10**6, mode="all")
    full = searcher.search(F.Term(term), k=10**6, mode="all")
    assert set(res["doc_id"]) <= set(full["doc_id"])
    for d in res["doc_id"][:20]:
        toks = oracle.docs_tokens[int(d) - 1]
        assert term in toks[:end]


def test_negative_boost_demotes_only(searcher):
    from iresearch_ray.search.scorers import BM25

    sc = BM25(dtype=np.float64)
    pos = F.Or([F.Term("deploy"), F.Term("ref")])
    base = searcher.search(pos, k=10**6, scorer=sc, mode="all")
    nb = searcher.search(
        F.NegativeBoost(pos, F.Term("the"), neg_boost=0.25),
        k=10**6, scorer=sc, mode="all")
    # same match set
    assert set(base["doc_id"]) == set(nb["doc_id"])
    neg = set(np.asarray(searcher.match_docs(F.Term("the"))).tolist())
    b = dict(zip(base["doc_id"].tolist(), base["score"].tolist()))
    for d, s in zip(nb["doc_id"], nb["score"]):
        want = b[int(d)] * (0.25 if int(d) in neg else 1.0)
        assert abs(s - want) < 1e-9, d


def test_suggest_prefix_and_spell_correct(searcher, oracle):
    from iresearch_ray.api import spell_correct, suggest_prefix

    # independent df table from the oracle postings
    df = {t: len(p) for t, p in oracle.postings.items()}

    got = suggest_prefix(searcher, "de", n=8)
    want = sorted(((t, d) for t, d in df.items() if t.startswith("de")),
                  key=lambda x: (-x[1], x[0]))[:8]
    assert list(zip(got["term"], got["doc_freq"])) == want

    def lev(a, b):
        la, lb = len(a), len(b)
        d = list(range(lb + 1))
        for i in range(1, la + 1):
            prev, d[0] = d[0], i
            for j in range(1, lb + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[lb]

    got = spell_correct(searcher, "deploi", max_distance=2, n=5)
    want = sorted(((t, d) for t, d in df.items()
                   if lev("deploi", t) <= 2),
                  key=lambda x: (-x[1], x[0]))[:5]
    assert list(zip(got["term"], got["doc_freq"])) == want


def test_span_not_matches_brute_force(searcher, oracle):
    for term, excl, pre, post in [
        ("ref", "the", 2, 2),
        ("deploy", "target", 0, 1),
        ("the", "ref", 3, 0),
        ("second", "zzz-missing", 5, 5),
    ]:
        exp = set()
        for doc0, toks in enumerate(oracle.docs_tokens):
            for p, t in enumerate(toks):
                if t != term:
                    continue
                window = toks[max(0, p - pre):p + post + 1]
                if excl not in window:
                    exp.add(doc0 + 1)
                    break
        got = ids(searcher.match_docs(
            F.SpanNot(term, excl, pre=pre, post=post)))
        assert got == sorted(exp), (term, excl, pre, post)


def test_span_not_missing_exclude_equals_term(searcher):
    a = ids(searcher.match_docs(F.SpanNot("ref", "zzz-missing", pre=9,
                                          post=9)))
    b = ids(searcher.match_docs(F.Term("ref")))
    assert a == b


def test_lm_scorers_match_formula(searcher, oracle):
    import math

    from iresearch_ray.search.scorers import LMDirichlet, LMJelinekMercer

    ttf_field = int(oracle.total_term_freq)
    term = "ref"
    ttf_term = sum(len(p) for p in oracle.postings[term].values())
    res = searcher.search(F.Term(term), k=10**6,
                          scorer=LMDirichlet(dtype=np.float64), mode="all")
    for d, s in zip(res["doc_id"][:25], res["score"][:25]):
        tf = len(oracle.postings[term][int(d)])
        dl = int(oracle.doc_len[int(d) - 1])
        ts = float(ttf_field) / (2000.0 * float(ttf_term))
        want = max(0.0, math.log1p(tf * ts) + math.log(2000.0 / (dl + 2000.0)))
        assert abs(float(s) - want) < 1e-12, d

    res = searcher.search(F.Term(term), k=10**6,
                          scorer=LMJelinekMercer(dtype=np.float64),
                          mode="all")
    for d, s in zip(res["doc_id"][:25], res["score"][:25]):
        tf = len(oracle.postings[term][int(d)])
        dl = max(int(oracle.doc_len[int(d) - 1]), 1)
        ts = (1.0 - 0.7) / 0.7 * float(ttf_field) / float(ttf_term)
        want = math.log1p(ts * tf / dl)
        assert abs(float(s) - want) < 1e-12, d


def test_lm_strict_rank_identical(searcher):
    from iresearch_ray.search.scorers import LMDirichlet, LMJelinekMercer

    for sc in (LMDirichlet(), LMJelinekMercer()):
        for flt in (F.Term("the"), F.Or([F.Term("ref"), F.Term("deploy")]),
                    F.And([F.Term("the"), F.Term("ref")])):
            a = searcher.search(flt, k=20, scorer=sc, mode="all")
            b = searcher.search(flt, k=20, scorer=sc, mode="strict")
            assert a["doc_id"].tolist() == b["doc_id"].tolist(), (sc, flt)
            assert (a["score"].to_numpy() == b["score"].to_numpy()).all()


def test_constant_score_filter_context(searcher):
    # gated match set == plain AND; scores == the scoring clause alone
    gated = searcher.search(
        F.And([F.Term("ref"), F.ConstantScore(F.Term("the"))]),
        k=10**6, mode="all")
    both = searcher.search(F.And([F.Term("ref"), F.Term("the")]),
                           k=10**6, mode="all")
    assert set(gated["doc_id"]) == set(both["doc_id"])
    solo = searcher.search(F.Term("ref"), k=10**6, mode="all")
    ref = dict(zip(solo["doc_id"].tolist(), solo["score"].tolist()))
    for d, s in zip(gated["doc_id"], gated["score"]):
        assert abs(float(s) - ref[int(d)]) < 1e-6, d
    # standalone constant score
    cs = searcher.search(F.ConstantScore(F.Term("ref"), score=2.5), k=5,
                         mode="all")
    assert (cs["score"].to_numpy() == np.float32(2.5)).all()


def test_sort_by_field_topk_matches_brute_force(searcher):
    from iresearch_ray.api import sort_by_field_topk

    flt = F.Or([F.Term("deploy"), F.Term("ref")])
    for asc in (False, True):
        got = sort_by_field_topk(searcher, flt, "turn_idx", k=7,
                                 ascending=asc, id_col=None)
        docs = searcher.match_docs(flt)
        vals = searcher.fetch_stored(docs, ("turn_idx",))[
            "turn_idx"].to_numpy()
        want = sorted(zip(vals.tolist(), docs.tolist()),
                      key=lambda p: (p[0] if asc else -p[0], p[1]))[:7]
        assert got["doc_id"].tolist() == [d for _, d in want], asc
        assert got["turn_idx"].tolist() == [v for v, _ in want], asc


def test_function_score_topk_matches_brute_force(searcher):
    from iresearch_ray.api import function_score_topk

    flt = F.Term("ref")
    got = function_score_topk(searcher, flt, "turn_idx", k=9,
                              round_to=None, id_col=None)
    n = int(sum(s.docs_count for s in searcher.segments))
    res = searcher.search(flt, k=n, mode="all")
    vals = searcher.fetch_stored(res["doc_id"].to_numpy(),
                                 ("turn_idx",))["turn_idx"].to_numpy()
    comb = res["score"].to_numpy().astype(np.float64) \
        * np.log(1.0 + vals.astype(np.float64))
    want = sorted(zip(comb.tolist(), res["doc_id"].tolist()),
                  key=lambda p: (-p[0], p[1]))[:9]
    assert got["doc_id"].tolist() == [d for _, d in want]
    np.testing.assert_allclose(got["score_r"].to_numpy(),
                               [c for c, _ in want], rtol=1e-12)


def test_span_containing_matches_brute_force(searcher, oracle):
    for op, cl, lit, w in [
        ("ref", "the", "deploy", 6),
        ("deploy", "target", "the", 4),
        ("the", "the", "ref", 8),
        ("second", "zzz-missing", "the", 5),
    ]:
        exp = set()
        for doc0, toks in enumerate(oracle.docs_tokens):
            hit = False
            for pa, t in enumerate(toks):
                if t != op:
                    continue
                for pc in range(pa + 1, min(pa + w, len(toks) - 1) + 1):
                    if toks[pc] == cl and lit in toks[pa:pc + 1]:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                exp.add(doc0 + 1)
        got = ids(searcher.match_docs(
            F.SpanContaining(op, cl, lit, window=w)))
        assert got == sorted(exp), (op, cl, lit, w)


def test_span_containing_strict_rank_identity(searcher):
    flt = F.SpanContaining("ref", "the", "deploy", window=6)
    a = searcher.search(flt, k=20, mode="all")
    b = searcher.search(flt, k=20, mode="strict")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    np.testing.assert_array_equal(a["score"].to_numpy(),
                                  b["score"].to_numpy())


def test_rescore_topk_matches_brute_force(searcher):
    from iresearch_ray.api import rescore_topk

    got = rescore_topk(searcher, F.Term("deploy"), F.Term("ref"),
                       k=8, window=30, query_weight=1.0,
                       rescore_weight=2.0, round_to=None, id_col=None)

    n_docs = int(sum(s.docs_count for s in searcher.segments))
    prim = searcher.search(F.Term("deploy"), k=30, mode="strict")
    sec = searcher.search(F.Term("ref"), k=n_docs, mode="all")
    smap = dict(zip(sec["doc_id"].tolist(), sec["score"].tolist()))
    comb = [(1.0 * s + 2.0 * smap.get(d, 0.0), d)
            for d, s in zip(prim["doc_id"].tolist(),
                            prim["score"].tolist())]
    comb.sort(key=lambda t: (-t[0], t[1]))
    assert list(got["doc_id"]) == [d for _, d in comb[:8]]
    assert np.allclose(got["score_r"].to_numpy(),
                       [c for c, _ in comb[:8]], rtol=0, atol=0)
    # a doc absent from the rescore query keeps its primary score;
    # docs outside the window never enter, however well they rescore
    assert set(got["doc_id"]) <= set(prim["doc_id"].tolist())


def test_range_facet_matches_brute_force(searcher):
    from iresearch_ray.api import range_facet_frame

    edges = (0.0, 5.0, 10.0, 20.0)
    got = range_facet_frame(searcher, F.Term("deploy"), "turn_idx", edges)
    docs = searcher.match_docs(F.Term("deploy"))
    v = searcher.fetch_stored(docs, ("turn_idx",))["turn_idx"] \
        .to_numpy().astype(float)
    want = [int(((v >= lo) & (v < hi)).sum())
            for lo, hi in zip(edges[:-1], edges[1:])]
    assert got["n_docs"].tolist() == want
    assert got["bucket"].tolist() == [0, 1, 2]
    # every bucket row present even when empty
    assert len(got) == len(edges) - 1


def test_term_vectors_match_brute_reanalysis(searcher, small_corpus):
    from iresearch_ray.api import term_vectors

    got = term_vectors(searcher, F.Term("deploy"), max_docs=8,
                       id_col=None)
    # brute force: tokenize each doc's raw text one at a time (the
    # batched term_vectors path must agree doc-by-doc)
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("segmentation", {})
    texts = small_corpus.column("text").to_pylist()

    def toks_of(txt):
        _, terms, _ = an.tokenize(pa.array([txt], type=pa.string()))
        return terms.to_pylist()

    # global doc ids are 1-based (doc 0 reserved), corpus row i -> i+1
    want_docs = sorted(i + 1 for i, t in enumerate(texts)
                       if "deploy" in toks_of(t))[:8]
    assert sorted(got["doc_id"].unique().tolist()) == want_docs
    for d in want_docs:
        toks = toks_of(texts[d - 1])
        sub = got[got["doc_id"] == d]
        # tf sums to doc length; per-term tf and first position exact
        assert int(sub["tf"].sum()) == len(toks)
        for _, r in sub.iterrows():
            assert r["tf"] == toks.count(r["term"])
            assert r["first_pos"] == toks.index(r["term"])


def test_explain_terms_sums_to_ranked_score(searcher):
    from iresearch_ray.api import explain_terms

    terms = ["deploy", "ref"]
    got = explain_terms(searcher, terms, k=6, round_to=None, id_col=None)
    res = searcher.search(F.Or([F.Term(t) for t in terms]), k=6,
                          mode="strict")
    want = dict(zip(res["doc_id"].tolist(), res["score"].tolist()))
    # per-doc contribs sum to the ranked score (Sum merge). The
    # ranked path accumulates in the disjunction's float32 dense
    # accumulator while explain sums float64 per-term passes, so
    # allow float32-relative slack.
    sums = got.groupby("doc_id")["contrib_r"].sum()
    for d, s in want.items():
        assert abs(sums[d] - s) <= 1e-6 * max(1.0, abs(s)), (d, sums[d], s)
    # df is the corpus-wide docs_with_term
    for t in terms:
        df_t = searcher.resolve_term(t, None).docs_with_term
        assert (got[got["term"] == t]["df"] == df_t).all()


def _tok_lists(small_corpus):
    import pyarrow as pa

    from iresearch_ray.analysis.analyzers import get_analyzer

    an = get_analyzer("segmentation", {})
    texts = small_corpus.column("text").to_pylist()
    d, terms, _ = an.tokenize(pa.array(texts, type=pa.string()))
    terms = terms.to_pylist()
    out = [[] for _ in texts]
    for i, t in zip(d.tolist(), terms):
        out[i].append(t)
    return out


def test_terms_set_match_brute_force(searcher, small_corpus):
    from iresearch_ray.api import terms_set_match

    got = terms_set_match(searcher, ["deploy", "ref", "run"], "turn_idx",
                          min_script=lambda v: v % 2 + 1, id_col=None)
    toks = _tok_lists(small_corpus)
    turn = small_corpus.column("turn_idx").to_pylist()
    want = {}
    for i, tl in enumerate(toks):
        n = len({"deploy", "ref", "run"} & set(tl))
        req = turn[i] % 2 + 1
        if n >= req:
            want[i + 1] = (n, req)  # 1-based global doc ids
    assert dict(zip(got["doc_id"],
                    zip(got["n_matched"], got["required"]))) == want


def test_adjacency_matrix_brute_force(searcher, small_corpus):
    from iresearch_ray.api import adjacency_matrix

    got = adjacency_matrix(searcher, {
        "dep": F.Term("deploy"), "ref": F.Term("ref"),
        "run": F.Term("run")})
    toks = _tok_lists(small_corpus)
    sets = {k: {i for i, tl in enumerate(toks) if w in tl}
            for k, w in (("dep", "deploy"), ("ref", "ref"), ("run", "run"))}
    want = {}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        if sets[a]:
            want[a] = len(sets[a])
        for b in keys[i + 1:]:
            n = len(sets[a] & sets[b])
            if n:
                want[f"{a}&{b}"] = n
    assert dict(zip(got["bucket"], got["doc_count"])) == want
    assert got["bucket"].tolist() == sorted(want)


def test_span_within_matches_brute_force(searcher, oracle):
    for op, cl, lit, w in [
        ("ref", "the", "deploy", 6),
        ("deploy", "target", "the", 4),
        ("the", "the", "ref", 8),
        ("second", "zzz-missing", "the", 5),
    ]:
        # same doc set as containment (a little inside some big span)
        exp = set()
        for doc0, toks in enumerate(oracle.docs_tokens):
            hit = False
            for pa, t in enumerate(toks):
                if t != op:
                    continue
                for pc in range(pa + 1, min(pa + w, len(toks) - 1) + 1):
                    if toks[pc] == cl and lit in toks[pa:pc + 1]:
                        hit = True
                        break
                if hit:
                    break
            if hit:
                exp.add(doc0 + 1)
        got = ids(searcher.match_docs(F.SpanWithin(op, cl, lit, window=w)))
        assert got == sorted(exp), (op, cl, lit, w)


def test_span_within_tf_counts_little_occurrences(searcher, oracle):
    # tf = number of DISTINCT enclosed little positions per doc
    op, cl, lit, w = "ref", "the", "deploy", 6
    res = searcher.search(F.SpanWithin(op, cl, lit, window=w),
                          k=10**6, mode="all")
    got_docs = set(res["doc_id"].tolist())
    for doc0, toks in enumerate(oracle.docs_tokens):
        n_enc = 0
        for pb, t in enumerate(toks):
            if t != lit:
                continue
            if any(toks[pa] == op and pa <= pb
                   and any(toks[pc] == cl
                           for pc in range(max(pa + 1, pb),
                                           min(pa + w, len(toks) - 1) + 1))
                   for pa in range(max(0, pb - w), pb + 1)):
                n_enc += 1
        assert ((doc0 + 1) in got_docs) == (n_enc > 0)


def test_span_within_strict_rank_identity(searcher):
    flt = F.SpanWithin("ref", "the", "deploy", window=6)
    a = searcher.search(flt, k=20, mode="all")
    b = searcher.search(flt, k=20, mode="strict")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()


def test_decay_score_shapes_match_brute_force(searcher):
    import math

    from iresearch_ray.api import decay_score_topk

    flt = F.Term("deploy")
    res = searcher.search(flt, k=10**6, mode="all")
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), ("turn_idx",))
    v = stored["turn_idx"].to_numpy().astype(np.float64)
    base = res["score"].to_numpy().astype(np.float64)
    origin, scale, offset, dec = 10.0, 8.0, 1.0, 0.5
    d = np.maximum(np.abs(v - origin) - offset, 0.0)
    factors = {
        "gauss": np.exp(-(d * d) / (2.0 * (-(scale * scale)
                                           / (2.0 * math.log(dec))))),
        "exp": np.exp(math.log(dec) / scale * d),
        "linear": np.maximum(0.0, (scale / (1 - dec) - d)
                             / (scale / (1 - dec))),
    }
    ids_all = res["doc_id"].to_numpy().astype("int64")
    for shape, f in factors.items():
        got = decay_score_topk(searcher, flt, "turn_idx", k=10,
                               origin=origin, scale=scale, offset=offset,
                               decay=dec, shape=shape, round_to=None,
                               id_col=None)
        comb = base * f
        order = np.lexsort((ids_all, -comb))[:10]
        assert got["doc_id"].tolist() == ids_all[order].tolist(), shape
        np.testing.assert_allclose(got["score_r"].to_numpy(), comb[order],
                                   rtol=0, atol=0)
    # factor equals `decay` exactly at distance == scale (ES contract)
    for shape in ("gauss", "exp", "linear"):
        dd = np.array([scale])
        if shape == "gauss":
            s2 = -(scale * scale) / (2.0 * math.log(dec))
            val = float(np.exp(-(dd * dd) / (2.0 * s2))[0])
        elif shape == "exp":
            val = float(np.exp(math.log(dec) / scale * dd)[0])
        else:
            s = scale / (1 - dec)
            val = float(((s - dd) / s)[0])
        assert abs(val - dec) < 1e-12, shape


def test_rank_feature_functions_match_brute_force(searcher):
    from iresearch_ray.api import rank_feature_topk

    flt = F.Term("deploy")
    res = searcher.search(flt, k=10**6, mode="all")
    stored = searcher.fetch_stored(res["doc_id"].to_numpy(), ("turn_idx",))
    v = stored["turn_idx"].to_numpy().astype(np.float64)
    base = res["score"].to_numpy().astype(np.float64)
    ids_all = res["doc_id"].to_numpy().astype("int64")
    pivot, boost, sf, expo = 8.0, 2.5, 1.5, 2.0
    feats = {
        "saturation": v / (v + pivot),
        "log": np.log(sf + v),
        "sigmoid": (v ** expo) / (v ** expo + pivot ** expo),
    }
    for fn, s in feats.items():
        got = rank_feature_topk(searcher, flt, "turn_idx", k=10,
                                function=fn, pivot=pivot, boost=boost,
                                scaling_factor=sf, exponent=expo,
                                round_to=None, id_col=None)
        comb = base + boost * s
        order = np.lexsort((ids_all, -comb))[:10]
        assert got["doc_id"].tolist() == ids_all[order].tolist(), fn
        np.testing.assert_allclose(got["score_r"].to_numpy(), comb[order],
                                   rtol=0, atol=0)
    # saturation/sigmoid are bounded by 1: the additive boost never
    # exceeds `boost` (the WAND-compatibility property the docstring
    # relies on)
    assert float(np.max(feats["saturation"])) < 1.0
    assert float(np.max(feats["sigmoid"])) < 1.0


def test_collapse_inner_hits_brute_force(searcher):
    from iresearch_ray.api import collapse_inner_hits

    flt = F.Term("deploy")
    got = collapse_inner_hits(searcher, flt, "conv_id", k=5, inner=2,
                              round_to=None, id_col=None)
    res = searcher.search(flt, k=10**6, mode="all")
    conv = searcher.fetch_stored(res["doc_id"].to_numpy(), ("conv_id",))
    import pandas as pd
    df = pd.DataFrame({"doc_id": res["doc_id"].to_numpy().astype("int64"),
                       "conv_id": conv["conv_id"],
                       "score": res["score"].to_numpy().astype(np.float64)})
    df = df.sort_values(["score", "doc_id"], ascending=[False, True],
                        kind="mergesort")
    lead = df.drop_duplicates("conv_id").head(5)
    assert got[got["hit_rank"] == 1]["conv_id"].tolist() \
        == lead["conv_id"].tolist()
    for r, (_, row) in enumerate(lead.iterrows(), start=1):
        g = df[df["conv_id"] == row["conv_id"]].head(2)
        sub = got[got["group_rank"] == r]
        assert sub["doc_id"].tolist() == g["doc_id"].tolist()
        assert sub["hit_rank"].tolist() == list(range(1, len(g) + 1))
        np.testing.assert_array_equal(sub["score_r"].to_numpy(),
                                      g["score"].to_numpy())


def test_nested_topk_score_modes_brute_force(searcher):
    from iresearch_ray.api import nested_topk

    flt = F.Term("deploy")
    res = searcher.search(flt, k=10**6, mode="all")
    conv = searcher.fetch_stored(res["doc_id"].to_numpy(), ("conv_id",))
    import pandas as pd
    df = pd.DataFrame({"conv_id": conv["conv_id"],
                       "score": res["score"].to_numpy().astype(np.float64)})
    for mode, agg in (("total", "sum"), ("max", "max"), ("avg", "mean")):
        got = nested_topk(searcher, flt, k=5, group_col="conv_id",
                          score_mode=mode, round_to=None)
        want = df.groupby("conv_id")["score"].agg(n="size", s=agg) \
                 .reset_index()
        order = np.lexsort((want["conv_id"].to_numpy(),
                            -want["s"].to_numpy()))[:5]
        want = want.iloc[order]
        assert got["conv_id"].tolist() == want["conv_id"].tolist(), mode
        assert got["n_children"].tolist() == want["n"].tolist(), mode
        np.testing.assert_allclose(got["score_r"].to_numpy(),
                                   want["s"].to_numpy(), rtol=1e-12)


def test_suggest_phrase_brute_force(searcher, oracle):
    from iresearch_ray.api import suggest_phrase

    got = suggest_phrase(searcher, "deploi the zz9zz9zz")
    assert got["pos"].tolist() == [0, 1, 2]
    assert got["tok"].tolist() == ["deploi", "the", "zz9zz9zz"]
    # brute force over the oracle vocabulary
    import itertools

    def lev(a, b):
        m, n = len(a), len(b)
        prev = list(range(n + 1))
        for i in range(1, m + 1):
            cur = [i] + [0] * n
            for j in range(1, n + 1):
                cur[j] = min(prev[j] + 1, cur[j - 1] + 1,
                             prev[j - 1] + (a[i - 1] != b[j - 1]))
            prev = cur
        return prev[n]

    vocab = {t: len(p) for t, p in oracle.postings.items()}
    for _, row in got.iterrows():
        cands = sorted(((lev(row["tok"], t), -df, t)
                        for t, df in vocab.items()
                        if abs(len(t) - len(row["tok"])) <= 2
                        and lev(row["tok"], t) <= 2))
        if not cands:
            assert row["suggestion"] is None and row["dist"] == 99
        else:
            d, negdf, t = cands[0]
            assert (row["suggestion"], row["df"], row["dist"]) \
                == (t, -negdf, d), row["tok"]
    # in-vocabulary token corrects to itself at distance 0
    assert got.iloc[1]["suggestion"] == "the" and got.iloc[1]["dist"] == 0


def test_search_request_full_response(searcher):
    from iresearch_ray.api import search_request

    # (exact-field filter context is oracle-covered on the documents
    # index — the fixture index has no exact fields, so no "filter")
    resp = search_request(searcher, {
        "query": "+deploy +ref",
        "from": 2, "size": 5,
        "fields": ["role", "conv_id"],
        "facet": "role",
    }, id_col=None)
    gated = F.And([F.Term("deploy"), F.Term("ref")])
    want_docs = searcher.match_docs(gated)
    assert resp["total"] == want_docs.size and resp["total"] > 7
    hits = resp["hits"]
    assert hits["rank"].tolist() == list(range(3, 3 + len(hits)))
    # page slice equals the same window of the full ranking
    full = searcher.search(gated, k=100, mode="all")
    assert hits["doc_id"].tolist() == full["doc_id"].iloc[2:7].tolist()
    # facet rows cover the whole match set (not just the page)
    assert resp["facets"]["n_docs"].sum() == resp["total"]
    assert set(resp["facets"]["role"]) <= {"user", "assistant",
                                           "tool", "system"}


def test_search_request_lucene_syntax(searcher):
    from iresearch_ray.api import search_request

    # 'deploy NOT target' through the full query_string parser with
    # per-field analyzers resolved from the open index == AND NOT
    resp = search_request(searcher, {
        "query": "deploy NOT target", "syntax": "lucene", "size": 10,
    }, id_col=None)
    want = searcher.search(
        F.And([F.Term("deploy"), F.Not(F.Term("target"))]),
        k=10, mode="strict")
    assert resp["hits"]["doc_id"].tolist() == want["doc_id"].tolist()


def test_filters_agg_counts_and_other_bucket(searcher, small_corpus):
    from iresearch_ray.api import filters_agg

    got = filters_agg(searcher, {
        "dep": F.Term("deploy"), "ref": F.Term("ref"),
    })
    toks = _tok_lists(small_corpus)
    dep = {i for i, tl in enumerate(toks) if "deploy" in tl}
    ref = {i for i, tl in enumerate(toks) if "ref" in tl}
    by = dict(zip(got["bucket"], got["doc_count"]))
    assert by["dep"] == len(dep) and by["ref"] == len(ref)
    assert by["_other_"] == len(toks) - len(dep | ref)
    assert list(got["bucket"]) == sorted(got["bucket"])
    # no other bucket when disabled
    got2 = filters_agg(searcher, {"dep": F.Term("deploy")},
                       other_bucket=False)
    assert "_other_" not in set(got2["bucket"])


def test_index_sorted_topk_equals_sorted_head(searcher, small_corpus):
    from iresearch_ray.api import index_sorted_topk

    got = index_sorted_topk(searcher, k=25,
                            columns=("conv_id", "turn_idx"))
    pdf = small_corpus.to_pandas()[["conv_id", "turn_idx"]] \
        .sort_values(["conv_id", "turn_idx"]).head(25)
    assert got["conv_id"].tolist() == pdf["conv_id"].tolist()
    assert got["turn_idx"].tolist() == pdf["turn_idx"].tolist()
    # k larger than the corpus degrades to the full sorted set
    n = small_corpus.num_rows
    all_rows = index_sorted_topk(searcher, k=n + 50,
                                 columns=("conv_id", "turn_idx"))
    assert len(all_rows) == n


def test_index_sorted_topk_rejects_unsorted_column(searcher):
    """ADVICE r3: early termination is only valid on the physical sort
    order — a non-correlated column must raise, not mis-answer."""
    import pytest

    from iresearch_ray.api import index_sorted_topk

    # 'role' cycles within each segment head -> not monotonic
    with pytest.raises(ValueError, match="sort order"):
        index_sorted_topk(searcher, k=20, columns=("role",))
