"""Query parser, batch serving actor pool, and dedup/ANN/textstats
pipelines."""

import numpy as np
import pyarrow as pa
import pytest

from iresearch_ray.search import filters as F
from iresearch_ray.search.parser import parse_query


def test_parser_shapes():
    assert isinstance(parse_query("hello"), F.Term)
    assert isinstance(parse_query('"a b"'), F.Phrase)
    q = parse_query("+a +b")
    assert isinstance(q, F.And) and len(q.filters) == 2
    q = parse_query("a b c")
    assert isinstance(q, F.Or) and len(q.filters) == 3
    assert isinstance(parse_query("pre*"), F.Prefix)
    assert isinstance(parse_query("wi*d"), F.Wildcard)
    f = parse_query("term~2")
    assert isinstance(f, F.Fuzzy) and f.max_distance == 2
    q = parse_query("2 a b c")
    assert isinstance(q, F.Or) and q.min_match == 2
    q = parse_query("+a -b")
    assert isinstance(q, F.And)


def test_parser_matches_direct_filters(searcher):
    for text, flt in [
        ("ref", F.Term("ref")),
        ('"ref name"', F.Phrase(["ref", "name"])),
        ("+the +ref", F.And([F.Term("the"), F.Term("ref")])),
        ("the ref", F.Or([F.Term("the"), F.Term("ref")])),
        ("sec*", F.Prefix("sec")),
        ("deploy~1", F.Fuzzy("deploy", 1)),
        ("2 the ref deploy", F.Or([F.Term("the"), F.Term("ref"), F.Term("deploy")], min_match=2)),
    ]:
        a = searcher.search(parse_query(text), k=15, mode="all")
        b = searcher.search(flt, k=15, mode="all")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), text


def test_search_batch_actor_pool(ray_session, small_index, searcher):
    from iresearch_ray.search.serving import search_batch

    queries = [("q1", "ref"), ("q2", '"ref name"'), ("q3", "+the +ok"),
               ("q4", "sec*")]
    out = search_batch(small_index, queries, k=10, concurrency=2).to_pandas()
    assert set(out["qid"]) == {"q1", "q2", "q3", "q4"}
    direct = searcher.search(F.Term("ref"), k=10)
    got = out[out["qid"] == "q1"].sort_values("rank")
    assert got["doc_id"].tolist() == direct["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               direct["score"].to_numpy().astype(np.float64),
                               rtol=1e-6)


def test_exact_dedup(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import exact_dedup

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": pa.array(["aa", "bb", "aa", "cc", "bb", "aa"]),
    })
    out = exact_dedup(ray.data.from_arrow(t)).to_pandas()
    assert sorted(out["doc_id"]) == [1, 2, 4]


def test_line_dedup_first_occurrence_wins(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import line_dedup

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], type=pa.int64()),
        "text": pa.array([
            "alpha beta\ncommon line here\ngamma",
            "common line here\ndelta",
            "unique one\ncommon line here",
            "common line here",   # only line is a dup -> empty doc
            "",                   # one empty line, first "" wins
            "x\n\ny",             # its "" is a dup of doc 4's
        ]),
    })
    out = (line_dedup(ray.data.from_arrow(t))
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["text"]) == [
        "alpha beta\ncommon line here\ngamma", "delta", "unique one",
        "", "", "x\ny"]
    # idempotent: a second pass changes nothing
    t2 = pa.table({"doc_id": pa.array(out["doc_id"], type=pa.int64()),
                   "text": pa.array(out["text"])})
    again = (line_dedup(ray.data.from_arrow(t2))
             .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(again["text"]) == list(out["text"])


def test_minhash_finds_near_dups(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import minhash_candidates

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base.replace("today", "tomorrow"),
             "completely different words about ray data pipelines and arrow",
             "unrelated content mentioning neither foxes nor dogs at all ok"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts)})
    out = minhash_candidates(ray.data.from_arrow(t), bands=32, num_hashes=64).to_pandas()
    pairs = set(zip(out["rep_id"], out["dup_id"]))
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)


def test_connected_components(ray_session):
    import pandas as pd
    import ray.data

    from iresearch_ray.pipelines.clustering import connected_components

    # components {1,2,3,9}, {5,6}, chain {10,11,12,13} via 10-13,11-12,12-13
    pairs = ray.data.from_pandas(pd.DataFrame({
        "rep_id": [1, 2, 9, 5, 10, 11, 12],
        "dup_id": [2, 3, 3, 6, 13, 12, 13],
    }))
    lab = connected_components(pairs).to_pandas()
    got = dict(zip(lab["node"], lab["label"]))
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5,
                   10: 10, 11: 10, 12: 10, 13: 10}


def test_minhash_dedup_clusters(ray_session):
    import ray.data

    from iresearch_ray.pipelines.clustering import minhash_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base.replace("today", "tomorrow"),
             base.replace("quick", "swift"),
             "completely different words about ray data pipelines and arrow",
             "unrelated content mentioning neither foxes nor dogs at all ok"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "text": pa.array(texts)})
    out = minhash_dedup(ray.data.from_arrow(t), bands=32,
                        num_hashes=64).to_pandas()
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    # 1/2/3 are one near-dup component; 4 and 5 are singletons
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5}
    kept = set(out.loc[out["keep"], "doc_id"])
    assert kept == {1, 4, 5}


def test_simhash_similarity(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import simhash_fingerprints

    base = "the quick brown fox jumps over the lazy dog again and again"
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array([base, base + " today",
                                    "zebra xylophone quantum entanglement theory"])})
    out = simhash_fingerprints(ray.data.from_arrow(t)).to_pandas().sort_values("doc_id")
    fp = out["simhash"].to_numpy().astype(np.uint64)
    d12 = bin(int(fp[0]) ^ int(fp[1])).count("1")
    d13 = bin(int(fp[0]) ^ int(fp[2])).count("1")
    assert d12 < d13


def test_cosine_topk(ray_session):
    import ray.data

    from iresearch_ray.pipelines.ann import cosine_topk

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((50, 8))
    vecs[17] = vecs[3] * 2.0  # same direction as 3
    t = pa.table({"vec_id": pa.array(np.arange(50), type=pa.int64()),
                  "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32()))})
    pdf = cosine_topk(ray.data.from_arrow(t), vecs[3:4], k=2)
    assert pdf["vec_id"].tolist()[:2] in ([3, 17], [17, 3])
    # brute-force oracle
    nv = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    f32 = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    nf = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
    sims = nf @ (f32[3] / np.linalg.norm(f32[3]))
    exp = np.argsort(-sims, kind="stable")[:2]
    assert sorted(pdf["vec_id"].tolist()) == sorted(exp.tolist())


def test_token_stats_vectorized():
    from iresearch_ray.pipelines.textstats import token_stats

    t = pa.table({"text": pa.array(["The quick fox", "", "a a a", None])})
    out = token_stats(t)
    assert out.column("n_tokens").to_pylist() == [3, 0, 3, 0]
    assert out.column("stopword_ratio").to_pylist()[2] == pytest.approx(1.0)


def test_lang_id():
    from iresearch_ray.pipelines.textstats import LangId

    li = LangId()
    t = pa.table({"text": pa.array([
        "the cat and the dog in the house",
        "el perro y el gato en la casa de los",
        "der hund und die katze ist mit dem haus",
    ])})
    out = li(t)
    assert out.column("lang_pred").to_pylist() == ["en", "es", "de"]


def test_ngram_similarity_filter(searcher):
    res = searcher.match_docs(F.NGramSimilarity("ref name", threshold=1.0))
    exp = searcher.match_docs(F.Phrase(["ref", "name"]))
    assert sorted(res.tolist()) == sorted(exp.tolist())


def test_ngram_similarity_ordered_chain(searcher, small_corpus):
    """Chain must respect gram ORDER: brute-force DP oracle comparison."""
    import re

    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    texts = [re.findall(r"[^\W_]+", t.lower()) for t in ordered.column("text").to_pylist()]
    query = ["the", "ref", "ok"]
    grams = [tuple(query[i:i+2]) for i in range(len(query)-1)]

    def chain_len(toks):
        # positions of each gram
        pos = [
            [i for i in range(len(toks)-1) if (toks[i], toks[i+1]) == g]
            for g in grams
        ]
        best = {0: -1}
        for gi, ps in enumerate(pos):
            for L in range(len(grams), 0, -1):
                if L-1 in best:
                    nxt = [p for p in ps if p > best[L-1]]
                    if nxt:
                        best[L] = min(best.get(L, 1 << 30), min(nxt))
        return max((L for L in best if L > 0), default=0)

    thr = 0.5
    exp = sorted(
        i + 1 for i, toks in enumerate(texts)
        if chain_len(toks) / len(grams) >= thr
    )
    got = sorted(searcher.match_docs(
        F.NGramSimilarity("the ref ok", threshold=thr)).tolist())
    assert got == exp


def test_ngram_jaccard_pairs(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import ngram_grams, ngram_jaccard_pairs

    texts = ["abcdefgh", "abcdefgx", "zzzzyyyy", "ab"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts)})
    out = ngram_jaccard_pairs(ray.data.from_arrow(t), threshold=0.3).to_pandas()
    pairs = {(a, b): j for a, b, j in
             zip(out["id_a"], out["id_b"], out["jaccard"])}
    g1, g2 = ngram_grams(texts[0]), ngram_grams(texts[1])
    exp = len(g1 & g2) / len(g1 | g2)
    assert (1, 2) in pairs and abs(pairs[(1, 2)] - exp) < 1e-12
    assert not any(3 in p for p in pairs)


def test_lsh_cosine_topk_recall(ray_session):
    import ray.data

    from iresearch_ray.pipelines.ann import cosine_topk, lsh_cosine_topk

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((400, 32))
    # plant 12 true near neighbors of vector 5 (cosine ~0.97) — LSH only
    # has recall for actually-similar vectors, not random near-orthogonal
    for j in range(12):
        vecs[50 + j] = vecs[5] + rng.standard_normal(32) * 0.15
    t = pa.table({"vec_id": pa.array(np.arange(400), type=pa.int64()),
                  "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    q = vecs[5:6]
    exact = cosine_topk(ds, q, k=10)
    approx = lsh_cosine_topk(ds, q, k=10, bits=10, hamming_radius=3)
    # recall of the approximate search vs brute force
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.8
    # the query vector itself always survives the bucket filter
    assert approx["vec_id"].iloc[0] == 5


def test_parser_field_syntax(searcher):
    a = searcher.search(parse_query('role:user'), k=8, mode="all")
    b = searcher.search(F.Term("user", field="role"), k=8, mode="all")
    assert a["doc_id"].tolist() == b["doc_id"].tolist()
    # field-scoped phrase parses to a Phrase with the field set
    q = parse_query('text:"deploy target"')
    assert isinstance(q, F.Phrase) and q.field == "text"


def test_ann_partitioned_index_recall(ray_session, tmp_path):
    """Write-time LSH partitioning: query reads only candidate
    partitions and still recovers the planted near neighbors."""
    import ray.data

    from iresearch_ray.pipelines.ann import (
        ann_index_topk, build_ann_index, cosine_topk)

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((500, 24))
    for j in range(10):
        vecs[100 + j] = vecs[7] + rng.standard_normal(24) * 0.12
    t = pa.table({
        "vec_id": pa.array(np.arange(500, dtype=np.int64)),
        "embedding": pa.array(list(vecs), type=pa.list_(pa.float64())),
    })
    idx = str(tmp_path / "annidx")
    build_ann_index(ray.data.from_arrow(t), idx, bits=8)
    q = vecs[7:8]
    exact = cosine_topk(ray.data.from_arrow(t), q, k=11)
    approx = ann_index_topk(idx, q, k=11, hamming_radius=2)
    overlap = len(set(exact["vec_id"]) & set(approx["vec_id"]))
    assert overlap >= 8  # high recall on genuinely-near vectors


def test_simhash_near_pairs(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dedup import simhash_near_pairs

    base = "the quick brown fox jumps over the lazy dog again and again today ok"
    texts = [base, base.replace("today", "tomorrow"),
             "completely different material about arrow batches and ray actors",
             "unrelated text mentioning neither canines nor foxes whatsoever"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": pa.array(texts)})
    out = simhash_near_pairs(ray.data.from_arrow(t), max_hamming=8).to_pandas()
    pairs = set(zip(out["rep_id"], out["dup_id"]))
    assert (1, 2) in pairs
    assert not any(3 in p or 4 in p for p in pairs)
    # pair dedup across bands: each pair appears once
    assert len(out) == len(out.drop_duplicates(["rep_id", "dup_id"]))


def test_winnow_and_bpe_stats(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from iresearch_ray.pipelines.textstats import (
        bpe_token_stats,
        winnow_fingerprints,
    )

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": pa.array(["the quick brown fox jumps over the lazy dog",
                          "the quick brown fox jumps over the lazy dog",
                          "completely different content here xyz"]),
    })
    out = ray.data.from_arrow(t).map_batches(
        winnow_fingerprints, batch_format="pyarrow").to_pandas()
    f1 = set(out[out.doc_id == 1].fp)
    f2 = set(out[out.doc_id == 2].fp)
    f3 = set(out[out.doc_id == 3].fp)
    assert f1 == f2                      # identical docs -> identical sketch
    assert len(f1 & f3) < len(f1) / 2    # different docs -> mostly disjoint
    # winnowing guarantee: every window of w grams contributes a min,
    # so a doc with >= k+w-1 chars has at least one fingerprint
    assert f1 and f3

    st = ray.data.from_arrow(t).map_batches(
        bpe_token_stats, batch_format="pyarrow").to_pandas()
    assert st.loc[st.doc_id == 1, "ws_tokens"].iloc[0] == 9
    # single-space text: pieces == words (each " word" is one piece)
    assert st.loc[st.doc_id == 1, "bpe_pieces"].iloc[0] == 9
    mixed = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": pa.array(["abc123 x-y!"]),
    })
    st2 = ray.data.from_arrow(mixed).map_batches(
        bpe_token_stats, batch_format="pyarrow").to_pandas()
    # abc|123| x|-|y|! -> 6 pieces, 2 ws tokens
    assert st2.ws_tokens.iloc[0] == 2 and st2.bpe_pieces.iloc[0] == 6


def test_term_stats_salted_equals_plain(ray_session, small_index):
    """The salted two-stage reduce must produce identical stats (sum is
    associative; salting only changes the shuffle layout)."""
    from iresearch_ray.index.stats import term_stats_dataset

    plain = term_stats_dataset(small_index).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    salted = term_stats_dataset(small_index, salt=4).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    assert plain.equals(salted)


def test_sessionize_gap_semantics(ray_session):
    """Gap-based sessionization: breaks strictly-greater than the gap,
    per-user numbering, cents-exact value sums."""
    import ray.data

    from iresearch_ray.pipelines.sessions import sessionize

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array(range(7), type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 2, 2, 1, 2], type=pa.int64()),
        "ts": pa.array([0, 10 * us, 10 * us + 1800 * us,   # exactly gap: same
                        5 * us, 5 * us + 1801 * us,        # > gap: break
                        10 * us + 1800 * us + 1801 * us,   # > gap: break
                        5 * us + 1801 * us + 60 * us],
                       type=pa.timestamp("us")),
        "value": pa.array([1.25, 2.50, 0.25, 10.0, 0.5, 4.0, 0.5]),
    })
    out = sessionize(ray.data.from_arrow(t), gap_s=1800.0).to_pandas() \
        .sort_values(["user_id", "session_idx"]).reset_index(drop=True)
    u1 = out[out.user_id == 1]
    assert u1["n_events"].tolist() == [3, 1]
    assert u1["sum_value_c"].tolist() == [400, 400]
    u2 = out[out.user_id == 2]
    assert u2["n_events"].tolist() == [1, 2]
    assert u2["sum_value_c"].tolist() == [1000, 100]
    assert (out["end_us"] >= out["start_us"]).all()


def test_asof_join_semantics(ray_session):
    """Inner as-of: greatest right ts <= left ts per key; equal ts
    matches; left rows before any right row drop out."""
    import ray.data

    from iresearch_ray.pipelines.windows import asof_join

    us = 1_000_000

    def tbl(ids, users, tss):
        return ray.data.from_arrow(pa.table({
            "event_id": pa.array(ids, type=pa.int64()),
            "user_id": pa.array(users, type=pa.int64()),
            "ts": pa.array([t * us for t in tss], type=pa.timestamp("us")),
        }))

    left = tbl([10, 11, 12, 13], [1, 1, 1, 2], [5, 20, 30, 7])
    right = tbl([90, 91, 92], [1, 1, 2], [6, 20, 99])
    out = asof_join(left, right).to_pandas() \
        .sort_values("left_id").reset_index(drop=True)
    # left 10 (ts=5) has no right <= 5 -> dropped; 11 matches equal-ts 91;
    # 12 matches 91 (lag 10s); user-2 left 13 precedes right 92 -> dropped
    assert out["left_id"].tolist() == [11, 12]
    assert out["right_id"].tolist() == [91, 91]
    assert out["lag_us"].tolist() == [0, 10 * us]


def test_sliding_window_range_frame(ray_session):
    """Trailing RANGE frame: inclusive lower boundary, equal-ts peers
    counted on both sides, cents-exact sums."""
    import ray.data

    from iresearch_ray.pipelines.windows import sliding_window

    us = 1_000_000
    t = pa.table({
        "event_id": pa.array(range(6), type=pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], type=pa.int64()),
        # window 10s: ts=0; 4; 10 (includes 0 at exactly -10s); two
        # equal-ts user-1 peers at 14 (RANGE: each counts the other)
        "ts": pa.array([0, 4 * us, 10 * us, 14 * us, 14 * us, 14 * us],
                       type=pa.timestamp("us")),
        "value": pa.array([1.0, 2.0, 4.0, 8.0, 16.0, 32.0]),
    })
    out = sliding_window(ray.data.from_arrow(t), window_s=10.0) \
        .to_pandas().sort_values("event_id").reset_index(drop=True)
    u1 = out[out.user_id == 1]
    assert u1["n_w"].tolist() == [1, 2, 3, 4, 4]
    assert u1["sum_value_c_w"].tolist() == [100, 300, 700, 3000, 3000]
    assert out[out.user_id == 2]["n_w"].tolist() == [1]


def test_knn_graph_exact(ray_session):
    import ray.data

    from iresearch_ray.pipelines.ann import knn_graph

    rng = np.random.default_rng(9)
    vecs = rng.standard_normal((60, 8))
    vecs[41] = vecs[5] * 3.0          # exact same direction as 5
    ids = np.arange(100, 160, dtype=np.int64)  # non-contiguous ids
    t = pa.table({"vec_id": pa.array(ids),
                  "embedding": pa.array(vecs.tolist(),
                                        type=pa.list_(pa.float32()))})
    f32 = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    pdf = knn_graph(ray.data.from_arrow(t), f32, ids, k=3).to_pandas() \
        .sort_values(["vec_id", "nbr_rank"], kind="mergesort") \
        .reset_index(drop=True)
    assert len(pdf) == 60 * 3
    assert pdf.columns.tolist() == ["vec_id", "nbr_rank", "nbr_id", "cosine"]
    # planted duplicate direction is each other's top neighbor
    assert pdf[(pdf.vec_id == 105) & (pdf.nbr_rank == 1)]["nbr_id"].item() == 141
    assert pdf[(pdf.vec_id == 141) & (pdf.nbr_rank == 1)]["nbr_id"].item() == 105
    # full brute-force oracle with (cos desc, id asc) tie order
    nf = f32 / np.linalg.norm(f32, axis=1, keepdims=True)
    sims = nf @ nf.T
    np.fill_diagonal(sims, -np.inf)
    for r in range(60):
        order = np.lexsort((ids, -sims[r]))[:3]
        got = pdf[pdf.vec_id == ids[r]].sort_values("nbr_rank")
        assert got["nbr_id"].tolist() == ids[order].tolist()
        assert np.allclose(got["cosine"].to_numpy(), sims[r][order])


def test_pii_scrubber_patterns():
    from iresearch_ray.pipelines.scrub import PiiScrubber

    t = pa.table({"text": pa.array([
        "mail a.b+c@ex.org now",
        "call 555-123-4567 or +1 555 123 4567",
        "ip 192.168.0.1 card 4111111111111111",
        "clean text",
        None,
    ])})
    out = PiiScrubber()(t)
    got = out.column("text").to_pylist()
    assert got[0] == "mail <EMAIL> now"
    assert got[1] == "call <PHONE> or +1 <PHONE>"
    assert got[2] == "ip <IP> card <NUM>"
    assert got[3] == "clean text"
    assert got[4] is None
    assert out.column("n_redactions").to_pylist() == [1, 2, 2, 0, None]


def test_scrub_pii_dataset(ray_session):
    import ray.data

    from iresearch_ray.pipelines.scrub import scrub_pii

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "text": pa.array(["x y@z.io", "nothing here"])})
    pdf = (scrub_pii(ray.data.from_arrow(t), out_col="scrubbed")
           .to_pandas().sort_values("doc_id"))
    assert pdf["scrubbed"].tolist() == ["x <EMAIL>", "nothing here"]
    assert pdf["n_redactions"].tolist() == [1, 0]
    assert "text" in pdf.columns  # original preserved when out_col differs


def test_hash_sample_and_splits(ray_session):
    import ray.data

    from iresearch_ray.pipelines.sampling import (assign_splits,
                                                  hash_sample, _hash32)

    ids = np.arange(100_000, dtype=np.int64)
    t = pa.table({"doc_id": pa.array(ids)})
    kept = hash_sample(ray.data.from_arrow(t), "doc_id", 0.2).to_pandas()
    # exact replica of the decision rule
    exp = ids[_hash32(ids) < np.uint64(int(0.2 * 2**32))]
    assert sorted(kept["doc_id"].tolist()) == exp.tolist()
    assert abs(len(kept) / 1e5 - 0.2) < 0.01   # rate accuracy
    # split assignment: deterministic, fractions close, exhaustive
    lab = assign_splits(ray.data.from_arrow(t), "doc_id").to_pandas()
    counts = lab["split"].value_counts(normalize=True)
    assert abs(counts["train"] - 0.8) < 0.01
    assert abs(counts["val"] - 0.1) < 0.005
    assert abs(counts["test"] - 0.1) < 0.005
    # stable across a second run (retry-determinism)
    lab2 = assign_splits(ray.data.from_arrow(t), "doc_id").to_pandas()
    m = lab.sort_values("doc_id").merge(lab2.sort_values("doc_id"),
                                        on="doc_id")
    assert (m["split_x"] == m["split_y"]).all()


def test_pack_sequences(ray_session):
    import ray.data

    from iresearch_ray.pipelines.packing import pack_sequences

    t = pa.table({"doc_id": pa.array([0, 1, 2, 1000, 1001],
                                     type=pa.int64()),
                  "n_tokens": pa.array([300, 300, 300, 600, 100],
                                       type=pa.int64())})
    pdf = pack_sequences(ray.data.from_arrow(t), "doc_id", "n_tokens",
                         capacity=512, part_size=1000) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    # part 0 starts 0/300/600 -> bins 0/0/1; part 1 starts 0/600 -> 0/1
    assert pdf["part"].tolist() == [0, 0, 0, 1, 1]
    assert pdf["start_offset"].tolist() == [0, 300, 600, 0, 600]
    assert pdf["bin_idx"].tolist() == [0, 0, 1, 0, 1]


def test_repetition_stats_values():
    from iresearch_ray.pipelines.textstats import repetition_stats

    t = pa.table({
        "doc_id": [0, 1, 2],
        "text": ["a b a b c",           # bigrams: ab,ba,ab,bc
                 "x",                    # no bigrams -> dropped
                 "one two one two one two"],
    })
    out = repetition_stats(t).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 2]
    assert out.loc[0, "n_bigrams"] == 4
    assert out.loc[0, "dup_bigram_frac"] == pytest.approx(0.25)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(0.5)
    assert out.loc[2, "dup_bigram_frac"] == pytest.approx(0.6)


def test_decontaminate_planted(ray_session):
    import ray.data

    from iresearch_ray.pipelines.decontam import (
        collect_benchmark_grams, contamination_report, decontaminate)

    secret = "alpha beta gamma delta epsilon zeta eta theta"
    bench = ray.data.from_items([{"doc_id": 100, "text": secret}])
    train = ray.data.from_items([
        {"doc_id": 0, "text": "clean doc with nothing shared at all"},
        {"doc_id": 1, "text": "prefix then " + secret + " then suffix"},
        {"doc_id": 2, "text": "alpha beta gamma but the chain stops here"},
    ])
    grams = collect_benchmark_grams(bench, n=8)
    assert len(grams) == 1
    rep = contamination_report(train, grams, n=8).to_pandas()
    assert rep["doc_id"].tolist() == [1]
    assert rep["n_shared"].tolist() == [1]
    kept = decontaminate(train, bench, n=8).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 2]


def test_bigram_lm_score_exact(ray_session):
    import math

    import ray
    import ray.data

    from iresearch_ray.pipelines.lm import fit_bigram_lm, lm_score

    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a b a b"},
        {"doc_id": 1, "text": "a b c"},
        {"doc_id": 2, "text": "z"},          # no bigrams -> dropped
    ])
    m = fit_bigram_lm(ds)
    # unigrams: a:3 b:3 c:1 z:1 -> V=4; bigrams: "a b":3 "b a":1 "b c":1
    assert m["V"] == 4
    assert m["uni"]["a"] == 3 and m["bi"]["a b"] == 3
    out = lm_score(ds, ray.put(m)).to_pandas().set_index("doc_id")
    assert list(out.index) == [0, 1]
    p_ab = math.log((3 + 1) / (3 + 4))   # B(a,b)=3, U(a)=3, V=4
    p_ba = math.log((1 + 1) / (3 + 4))
    p_bc = math.log((1 + 1) / (3 + 4))
    assert out.loc[0, "lm_logprob"] == pytest.approx(
        (p_ab + p_ba + p_ab) / 3)
    assert out.loc[1, "lm_logprob"] == pytest.approx((p_ab + p_bc) / 2)


def test_winnow_near_pairs_planted(ray_session):
    import random

    import ray.data

    from iresearch_ray.pipelines.dedup import winnow_near_pairs

    rng = random.Random(11)
    words = ["w%d" % k for k in range(500)]
    passage = " ".join(rng.choice(words) for _ in range(60))
    mk = lambda n: " ".join(rng.choice(words) for _ in range(n))
    docs = [{"doc_id": 0, "text": mk(30) + " " + passage},
            {"doc_id": 1, "text": passage + " " + mk(30)},
            {"doc_id": 2, "text": mk(90)},
            {"doc_id": 3, "text": mk(90)}]
    # the "wNNN" vocabulary is low-entropy at char-5-gram level, so even
    # independent docs share a few dozen fps; the planted 60-word
    # passage shares hundreds — threshold between the two regimes
    out = winnow_near_pairs(ray.data.from_items(docs), min_shared=100,
                            max_df=64).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs          # shared 60-word passage
    assert (2, 3) not in pairs      # independent random docs
    assert (out["n_shared"] >= 100).all()


def test_gopher_rules_crafted():
    import pyarrow as pa

    from iresearch_ray.pipelines.textstats import gopher_rules

    good = ("the quick brown fox jumps over that lazy dog and keeps "
            "running with great speed because it must reach the other "
            "side of town before sunset today ") * 3  # 90+ words, stops
    bullets = "\n".join("- item %d here" % i for i in range(10))
    ellipsized = "\n".join("trailing line %d..." % i for i in range(10))
    symbols = " ".join("#tag%d" % i for i in range(60)) + " the of"
    short = "too few words here"
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "text": pa.array([good, bullets, ellipsized, symbols, short]),
    })
    out = gopher_rules(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "gopher_pass"] == 1
    assert out.loc[0, "stop_hits"] >= 2
    assert out.loc[1, "bullet_frac"] == 1.0 and out.loc[1, "gopher_pass"] == 0
    assert out.loc[2, "ellipsis_frac"] == 1.0 and out.loc[2, "gopher_pass"] == 0
    assert out.loc[3, "symbol_ratio"] > 0.1 and out.loc[3, "gopher_pass"] == 0
    assert out.loc[4, "n_words"] == 4 and out.loc[4, "gopher_pass"] == 0


def test_temperature_mix_rates(ray_session):
    import ray.data

    from iresearch_ray.pipelines.sampling import _M32, _hash32, temperature_mix

    n_a, n_b = 90, 10
    t = pa.table({
        "doc_id": pa.array(range(n_a + n_b), type=pa.int64()),
        "source": pa.array(["a"] * n_a + ["b"] * n_b),
    })
    out = (temperature_mix(ray.data.from_arrow(t), "doc_id", "source",
                           alpha=0.5, target_frac=0.5)
           .to_pandas().sort_values("doc_id"))
    # rate_b = min(1, 50*sqrt(10)/(S*10)) = 1.0 -> every b row kept
    b_kept = out[out["source"] == "b"]["doc_id"].tolist()
    assert b_kept == list(range(n_a, n_a + n_b))
    # rate_a replicated exactly
    s = 90.0 ** 0.5 + 10.0 ** 0.5
    rate_a = ((0.5 * 100.0) * 90.0 ** 0.5) / (s * 90.0)
    thresh = np.uint64(int(rate_a * _M32))
    ids = np.arange(n_a, dtype=np.int64)
    expect = ids[_hash32(ids) < thresh].tolist()
    assert out[out["source"] == "a"]["doc_id"].tolist() == expect


def test_pmi_collocations_top_pair(ray_session):
    import ray.data

    from iresearch_ray.pipelines.textstats import pmi_collocations

    docs = (["new york is big"] * 6
            + ["the cat sat on the mat", "a dog and a cat",
               "the mat was new", "york here alone"])
    t = pa.table({"doc_id": pa.array(range(len(docs)), type=pa.int64()),
                  "text": pa.array(docs)})
    out = (pmi_collocations(ray.data.from_arrow(t), min_count=2, k=5)
           .to_pandas())
    assert list(out.columns) == ["w1", "w2", "c12", "pmi"]
    # survivors at min_count=2: (new,york)=(york,is)=(is,big)=6 but
    # with unigram counts 6-7; (the,mat)=2 with c(the)=3, c(mat)=2 —
    # PMI ln(2/(3*2)) beats ln(6/49), so the RARE pair tops the list
    assert out.iloc[0]["w1"] == "the" and out.iloc[0]["w2"] == "mat"
    assert out.iloc[0]["c12"] == 2
    assert {"new", "york"} <= set(out["w1"]) | set(out["w2"])
    # pmi formula replicated: c(the)=3, c(mat)=2, N1=sum tokens,
    # N2=sum max(0, n_tok-1)
    toks = [len(d.split()) for d in docs]
    n1 = float(sum(toks))
    n2 = float(sum(x - 1 for x in toks if x > 0))
    want = (np.log(2.0) - np.log(3.0) - np.log(2.0)
            + 2.0 * np.log(n1) - np.log(n2))
    # the pipeline rounds half-away to 6 dp (DuckDB ROUND parity)
    want = np.sign(want) * np.floor(np.abs(want) * 1e6 + 0.5) / 1e6
    assert out.iloc[0]["pmi"] == want
    # descending, deterministic tie order
    pmis = out["pmi"].to_numpy()
    assert (np.diff(pmis) <= 1e-15).all()


def test_significant_terms_jlh(ray_session):
    import ray.data

    from iresearch_ray.pipelines.textstats import significant_terms

    t = pa.table({
        "doc_id": pa.array(range(6), type=pa.int64()),
        "lang": pa.array(["a"] * 3 + ["b"] * 3),
        "text": pa.array(["apple pie sweet", "apple tart sweet",
                          "apple cake sweet", "banana split sweet",
                          "banana boat sweet", "banana bread sweet"]),
    })
    out = (significant_terms(ray.data.from_arrow(t), group_col="lang", n=2)
           .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True))
    assert list(out.columns) == ["lang", "rank", "term", "score"]
    a_top = out[(out["lang"] == "a") & (out["rank"] == 1)].iloc[0]
    b_top = out[(out["lang"] == "b") & (out["rank"] == 1)].iloc[0]
    assert a_top["term"] == "apple" and b_top["term"] == "banana"
    # fr=3/3=1, br=3/6=0.5 -> (1-0.5)*(1/0.5) = 1.0 exactly
    assert a_top["score"] == 1.0 and b_top["score"] == 1.0
    # 'sweet' is everywhere -> score 0, never outranks group terms
    assert not (out["term"] == "sweet").any() or (
        out[out["term"] == "sweet"]["score"] == 0.0).all()


def test_chunk_documents(ray_session):
    import pyarrow as pa
    import ray

    from iresearch_ray.pipelines.packing import chunk_documents

    texts = ["abcdefghij",        # 10 chars -> 3 chunks at stride 4
             "xy",                # shorter than size -> 1 chunk
             "",                  # empty -> no chunks
             "0123456789abcdef"]  # 16 chars -> 4 chunks
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                  "text": texts})
    out = chunk_documents(ray.data.from_arrow(t), size=6, stride=4) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    got = list(zip(out["doc_id"], out["chunk_idx"], out["chunk"]))
    want = []
    for did, s in zip([1, 2, 3, 4], texts):
        i = 0
        while i * 4 < len(s):
            want.append((did, i, s[i * 4:i * 4 + 6]))
            i += 1
    assert got == want
    # stride == size -> non-overlapping exact cover
    out2 = chunk_documents(ray.data.from_arrow(t), size=4) \
        .to_pandas().sort_values(["doc_id", "chunk_idx"])
    joined = out2.groupby("doc_id")["chunk"].apply("".join)
    assert joined[1] == texts[0] and joined[4] == texts[3]


def test_percolate_matches_brute_force(ray_session, small_corpus):
    import re

    import ray

    from iresearch_ray.pipelines.percolate import percolate
    from iresearch_ray.search import filters as F

    corpus = small_corpus.append_column(
        "row_id", __import__("pyarrow").array(
            range(small_corpus.num_rows), type=__import__("pyarrow").int64()))
    queries = {
        "q_term": F.Term("deploy"),
        "q_andnot": F.And([F.Term("ref"), F.Not(F.Term("the"))]),
        "q_2of3": F.Or([F.Term("ref"), F.Term("ok"), F.Term("deploy")],
                       min_match=2),
        "q_phrase": F.Phrase(["deploy", "target"]),
        "q_prefix": F.Prefix("dep"),
    }
    out = percolate(ray.data.from_arrow(corpus), queries,
                    id_col="row_id").to_pandas()
    got = set(zip(out["row_id"], out["query_id"]))

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]

    want = set()
    for rid, text in enumerate(corpus.column("text").to_pylist()):
        ts = toks(text)
        st = set(ts)
        if "deploy" in st:
            want.add((rid, "q_term"))
        if "ref" in st and "the" not in st:
            want.add((rid, "q_andnot"))
        if sum(t in st for t in ("ref", "ok", "deploy")) >= 2:
            want.add((rid, "q_2of3"))
        if any(a == "deploy" and b == "target"
               for a, b in zip(ts, ts[1:])):
            want.add((rid, "q_phrase"))
        if any(t.startswith("dep") for t in ts):
            want.add((rid, "q_prefix"))
    assert got == want


def test_percolate_rejects_unsupported(ray_session):
    import pytest as _pytest

    from iresearch_ray.pipelines.percolate import PercolateBatch
    from iresearch_ray.search import filters as F

    with _pytest.raises(ValueError):
        PercolateBatch({"q": F.Fuzzy("scan", 1)})
    with _pytest.raises(ValueError):
        PercolateBatch({"q": F.Phrase([{"prefix": "de"}, "x"])})


def test_funnel_existential_chain(ray_session):
    import pandas as pd
    import ray

    from iresearch_ray.pipelines.sessions import funnel

    # user 1: early view cannot fit the window, later view can — the
    # existential semantics must count the user (a single greedy pass
    # from only the first view would miss it)
    rows = [
        (1, "view", "2024-01-01 00:00:00"),
        (1, "click", "2024-01-01 10:00:00"),
        (1, "view", "2024-01-01 09:30:00"),
        (1, "purchase", "2024-01-01 10:30:00"),
        # user 2: right order but purchase outside the 2h window
        (2, "view", "2024-01-02 00:00:00"),
        (2, "click", "2024-01-02 00:30:00"),
        (2, "purchase", "2024-01-02 03:00:00"),
        # user 3: wrong order (purchase before click)
        (3, "view", "2024-01-03 00:00:00"),
        (3, "purchase", "2024-01-03 00:10:00"),
        (3, "click", "2024-01-03 00:20:00"),
        # user 4: never views
        (4, "click", "2024-01-04 00:00:00"),
        (4, "purchase", "2024-01-04 00:05:00"),
    ]
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = funnel(ray.data.from_pandas(df), ["view", "click", "purchase"],
                 window_s=2 * 3600.0)
    got = dict(zip(out["step"], out["n_users"]))
    # step0: users 1,2,3 view; step1: 1 (09:30->10:00), 2 (00:00->00:30),
    # 3 (00:00->00:20); step2: only user 1 (09:30->10:00->10:30)
    assert got == {"view": 3, "click": 3, "purchase": 1}


def test_retention_cohorts(ray_session):
    import pandas as pd
    import ray

    from iresearch_ray.pipelines.sessions import retention_cohorts

    rows = [
        (1, "2024-01-01 05:00:00"), (1, "2024-01-02 01:00:00"),
        (1, "2024-01-02 23:00:00"),  # same day twice -> one k=1
        (2, "2024-01-01 12:00:00"), (2, "2024-01-04 00:00:00"),
        (3, "2024-01-02 00:00:00"),
        (4, "2024-01-01 00:00:00"), (4, "2024-01-20 00:00:00"),  # k=19 out
    ]
    df = pd.DataFrame(rows, columns=["user_id", "ts"])
    df["ts"] = pd.to_datetime(df["ts"])
    out = retention_cohorts(ray.data.from_pandas(df), n_periods=7)
    d0 = pd.Timestamp("2024-01-01").value // 10**9 // 86400
    got = {(int(r.cohort_period) - d0, int(r.period_k)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {(0, 0): 3, (0, 1): 1, (0, 3): 1, (1, 0): 1}


def test_leakage_safe_splits_cluster_coherent(ray_session):
    import ray.data

    from iresearch_ray.pipelines.clustering import leakage_safe_splits
    from iresearch_ray.pipelines.sampling import _hash32

    base = "the quick brown fox jumps over the lazy dog again and again today"
    texts = [base, base.replace("today", "tomorrow"),
             base.replace("quick", "swift"),
             "completely different words about ray data pipelines and arrow",
             "unrelated content mentioning neither foxes nor dogs at all ok"]
    t = pa.table({"doc_id": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
                  "text": pa.array(texts)})
    out = leakage_safe_splits(ray.data.from_arrow(t), bands=32,
                              num_hashes=64).to_pandas()
    # every near-dup (cluster {1,2,3}) gets ONE split — no straddling
    assert out.groupby("cluster_id")["split"].nunique().max() == 1
    # and the label is the hash of the CLUSTER id, not the doc id
    b = _hash32(out["cluster_id"].to_numpy()) % np.uint64(10000)
    want = np.where(b < 8000, "train", np.where(b < 9000, "val", "test"))
    assert (out["split"].to_numpy() == want).all()


def test_html_extractor_cascade():
    from iresearch_ray.pipelines.webextract import HtmlExtractor

    t = pa.table({"html": pa.array([
        '<html><head><SCRIPT>if (1 < 2) { evil(); }</SCRIPT>'
        '<style>p { color: red }</style></head>'
        '<body><!-- nav --><p>Hello   <b>world</b></p></body></html>',
        'a &amp;lt; b &nbsp;&quot;q&quot; &#39;s&#39; &lt;tag&gt;',
        'plain',
        None,
    ])})
    out = HtmlExtractor()(t)
    got = out.column("clean_text").to_pylist()
    assert got[0] == "Hello world"
    # &amp;lt; single-decodes to &lt; (amp decoded last)
    assert got[1] == 'a &lt; b "q" \'s\' <tag>'
    assert got[2] == "plain"
    assert got[3] is None
    assert out.column("n_chars_clean").to_pylist() == [11, len(got[1]), 5, None]


def test_extract_html_dataset(ray_session):
    import ray.data

    from iresearch_ray.pipelines.webextract import extract_html

    t = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                  "html": pa.array(["<p>x</p>", "<div>y</div> z"])})
    pdf = (extract_html(ray.data.from_arrow(t))
           .to_pandas().sort_values("doc_id"))
    assert pdf["clean_text"].tolist() == ["x", "y z"]
    assert "html" in pdf.columns


def test_write_corpus_resumable(ray_session, tmp_path):
    import ray.data

    from iresearch_ray.pipelines.sink import write_corpus

    t = pa.table({"doc_id": pa.array(np.arange(20, dtype=np.int64)),
                  "lang": pa.array(["en", "de"] * 10),
                  "text": pa.array([f"d{i}" for i in range(20)])})
    out = str(tmp_path / "corpus")
    m1 = write_corpus(ray.data.from_arrow(t).repartition(3), out,
                      partition_cols=["lang"])
    assert m1 == {"rows": 20, "skipped": False, "partition_cols": ["lang"]}
    # hive layout: one directory per partition value
    assert sorted(d for d in __import__("os").listdir(out)
                  if d.startswith("lang=")) == ["lang=de", "lang=en"]
    # second run skips (resume) and returns the recorded stats
    m2 = write_corpus(ray.data.from_arrow(t), out, partition_cols=["lang"])
    assert m2["skipped"] and m2["rows"] == 20
    # read back round-trips every row
    back = ray.data.read_parquet(out).to_pandas()
    assert len(back) == 20 and set(back["doc_id"]) == set(range(20))


def test_rare_terms_filter_after_global_sum(ray_session, small_index):
    """rare_terms must apply the cap to the CROSS-SEGMENT df sum — a
    term under the cap per segment but over it overall is not rare."""
    from iresearch_ray.index.stats import rare_terms, term_stats_dataset

    stats = term_stats_dataset(small_index).to_pandas()
    cap = int(stats["doc_freq"].median())
    got = rare_terms(small_index, max_doc_count=cap).to_pandas() \
        .sort_values("term").reset_index(drop=True)
    want = stats[stats["doc_freq"] <= cap][["term", "doc_freq"]] \
        .sort_values("term").reset_index(drop=True)
    assert got["term"].tolist() == want["term"].tolist()
    assert got["doc_freq"].tolist() == want["doc_freq"].tolist()
    assert len(got) and len(got) < len(stats)


def test_remove_dup_passages_keep_first(ray_session):
    """Lee et al. 2022 keep-first substring removal: a passage shared
    by two docs survives only at its globally first occurrence; the
    later doc loses exactly the duplicated window; untouched docs are
    not rewritten (delta semantics)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from iresearch_ray.pipelines.textstats import remove_dup_passages

    passage = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    t = pa.table({
        "doc_id": pa.array([1, 2, 3], type=pa.int64()),
        "text": [
            "intro words here " + passage + " trailing tail",
            passage + " unique suffix for doc two",
            "totally unrelated document content without repeats at all",
        ],
    })
    out = remove_dup_passages(ray.data.from_arrow(t), n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # only doc 2 is modified (doc 1 holds the winning first occurrence)
    assert out["doc_id"].tolist() == [2]
    assert out["clean_text"].iloc[0] == "unique suffix for doc two"
    assert int(out["n_tokens"].iloc[0]) == 5

    # fully-duplicated doc is dropped from the delta
    t2 = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "text": [passage, passage],
    })
    out2 = remove_dup_passages(ray.data.from_arrow(t2), n=8).to_pandas()
    assert out2.empty
