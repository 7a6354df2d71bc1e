"""Sharded query serving == single-process searcher (rank + scores)."""

import numpy as np
import pytest

from iresearch_ray.search import filters as F


@pytest.fixture(scope="module")
def sharded(ray_session, small_index):
    from iresearch_ray.search.sharded import ShardedSearcher

    s = ShardedSearcher(small_index, n_shards=2)
    yield s
    s.shutdown()


FILTERS = [
    F.Term("the"),
    F.Term("rare00003"),
    F.Or([F.Term("ref"), F.Term("deploy"), F.Term("ok")]),
    F.And([F.Term("the"), F.Term("ref")]),
    F.Phrase(["deploy", "target"]),
    F.Prefix("sec"),
    # >16 matched terms: exercises the coordinator's global two-tier
    # scored_sets selection (shards must score the same term set)
    F.Prefix("rare0"),
    F.Fuzzy("deploy", 1),
    F.Or([F.Term("the"), F.Term("ref"), F.Term("second"), F.Term("deploy")],
         min_match=2),
]


@pytest.mark.parametrize("mode", ["all", "strict"])
def test_sharded_equals_local(sharded, searcher, mode):
    for flt in FILTERS:
        a = sharded.search(flt, k=25, mode=mode)
        b = searcher.search(flt, k=25, mode=mode)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_sharded_columns(sharded, searcher):
    a = sharded.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx"))
    b = searcher.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx"))
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()


def test_sharded_global_idf(sharded, searcher, small_index):
    """A shard-local searcher WITHOUT the stats override would use local
    IDF; assert the sharded scores equal the global ones even for terms
    skewed across shards."""
    from iresearch_ray.search.searcher import IndexSearcher
    from iresearch_ray.index.manifest import Manifest

    man = Manifest.load(small_index)
    first = {man.segments[0]["name"]}
    local = IndexSearcher(small_index, segment_subset=first)
    flt = F.Term("deploy")
    local_res = local.search(flt, k=5, mode="all")
    shard_res = sharded.search(flt, k=500, mode="all")
    glob = searcher.search(flt, k=500, mode="all")
    np.testing.assert_allclose(shard_res["score"].to_numpy(),
                               glob["score"].to_numpy(), rtol=1e-7)
    # sanity: local-only IDF differs from global (so the override matters)
    merged = dict(zip(glob["doc_id"], glob["score"]))
    if len(local_res):
        d0 = int(local_res["doc_id"].iloc[0])
        assert abs(local_res["score"].iloc[0] - merged[d0]) > 1e-9


def test_threshold_exchange_rank_identity(sharded, searcher):
    """Cross-shard WAND threshold exchange: lead-shard kth score seeds
    the followers; results must stay rank-identical."""
    for flt in FILTERS:
        a = sharded.search(flt, k=25, mode="strict", threshold_exchange=True)
        b = searcher.search(flt, k=25, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_highlight_offsets(searcher):
    from iresearch_ray.search.highlight import highlight
    from iresearch_ray.search import filters as F

    out = highlight(searcher, F.Term("deploy"), k=5,
                    text_col="text")
    assert len(out) > 0
    for _, row in out.iterrows():
        assert row["offsets"], row
        snippet = row["snippet"]
        assert "<em>" in snippet
        # every offset range is the query term (case-insensitive)
        text = snippet.replace("<em>", "").replace("</em>", "")
        for s, e in row["offsets"]:
            assert text[s:e].lower() == "deploy"


def test_sharded_lm_scorer_equals_local(ray_session, small_index, searcher):
    # LM stats (per-term collection ttf) must ride the coordinator's
    # stats exchange — a shard-local ttf would change scores
    from iresearch_ray.search.scorers import LMDirichlet
    from iresearch_ray.search.sharded import ShardedSearcher

    s = ShardedSearcher(small_index, n_shards=2, scorer="lmd")
    try:
        for flt in (F.Term("ref"),
                    F.Or([F.Term("ref"), F.Term("deploy")])):
            a = s.search(flt, k=25, mode="all")
            b = searcher.search(flt, k=25, scorer=LMDirichlet(), mode="all")
            assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
            np.testing.assert_allclose(a["score"].to_numpy(),
                                       b["score"].to_numpy(), rtol=1e-6)
    finally:
        s.shutdown()


def test_threshold_exchange_prunes_skewed_corpus(ray_session, tmp_path):
    """VERDICT r3 #5: on a score-SKEWED corpus the cross-shard
    threshold exchange measurably prunes — the uniform bench corpus
    provably cannot (every segment's upper bound exceeds the global
    kth). Deterministic form: a cold shard seeded with the hot shard's
    kth score (``initial_threshold``, the exchange's seed) skips ALL of
    its segments whole; the live-board form stays rank-identical."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.search.searcher import IndexSearcher
    from iresearch_ray.search.sharded import ShardedSearcher

    corpus = tmp_path / "skew_corpus"
    corpus.mkdir()
    # parts a0..a2: long low-tf docs (tf=1, dl=9 -> low BM25 bound);
    # part z: short high-tf docs (tf=4, dl=4 -> high BM25), keyed LAST
    # so a sequential/unseeded scan meets the low segments first
    low_text = "alpha beta gamma delta epsilon zeta eta theta hot"
    for p in range(3):
        n = 128
        pq.write_table(pa.table({
            "conv_id": [f"a{p}-{i:05d}" for i in range(n)],
            "turn_idx": pa.array([0] * n, type=pa.int32()),
            "text": [low_text] * n,
        }), str(corpus / f"part-a{p}.parquet"))
    nhot = 64
    pq.write_table(pa.table({
        "conv_id": [f"z-{i:05d}" for i in range(nhot)],
        "turn_idx": pa.array([0] * nhot, type=pa.int32()),
        "text": ["hot hot hot hot"] * nhot,
    }), str(corpus / "part-z.parquet"))

    idx = str(tmp_path / "skew_idx")
    # concurrency=1: this test can run while the module fixture holds
    # 2 of the session's 4 CPUs — a 2-actor encoder pool would take
    # both free CPUs and starve the read tasks (observed deadlock)
    build_index(str(corpus), idx, segment_docs=64, concurrency=1)
    man = Manifest.load(idx)
    low_names = {m["name"] for m in man.segments
                 if str(m["first_key"][0]).startswith("a")}
    assert len(low_names) >= 4

    full = IndexSearcher(idx)
    res = full.search(F.Term("hot"), k=10, mode="strict")
    thr = float(res["score"].min())
    # global stats for the shard view (what the coordinator broadcasts)
    fields = {}
    for seg in full.segments:
        for fname, f in seg.fields.items():
            dwf, ttf = fields.get(fname, (0, 0))
            fields[fname] = (dwf + f["docs_with_field"],
                             ttf + f["sum_doc_len"])
    overrides = {
        "terms": {key: (st.docs_with_term, st.total_tf)
                  for key, st in full._term_cache.items()},
        "fields": fields, "scored_sets": {},
    }

    s_low = IndexSearcher(idx, segment_subset=low_names)
    s_low._stats_override = overrides
    r0 = s_low.search(F.Term("hot"), k=10, mode="strict")
    sk0 = s_low.last_segments_skipped
    r1 = s_low.search(F.Term("hot"), k=10, mode="strict",
                      initial_threshold=thr)
    sk1 = s_low.last_segments_skipped
    # without the exchanged bound the low shard scores its docs; with
    # it, every low segment's upper bound is below the global kth and
    # is skipped WHOLE — and correctly contributes nothing to the
    # global top-k
    assert len(r0) == 10
    assert sk1 == len(low_names), (sk0, sk1, len(low_names))
    assert sk1 > sk0
    assert len(r1) == 0

    # live-board end-to-end on the same skewed corpus: rank identity
    sh = ShardedSearcher(idx, n_shards=2)
    try:
        a = sh.search(F.Term("hot"), k=10, mode="strict",
                      threshold_exchange=True, hook_every_s=0.0)
        assert a["doc_id"].tolist() == res["doc_id"].tolist()
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   res["score"].to_numpy(), rtol=1e-6)
    finally:
        sh.shutdown()


# ---------------------------------------------------------------------------
# sub-segment (doc-range) serving — VERDICT r4 #3
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def sharded_sub(ray_session, small_index):
    """4 shards over a 2-segment index: subshard=True splits each
    segment into doc-range units so every shard holds one."""
    from iresearch_ray.search.sharded import ShardedSearcher

    # fractional actor CPUs: the module's other fixture holds 2 of the
    # session's 4 CPUs; 4 one-CPU actors would deadlock the pool
    s = ShardedSearcher(small_index, n_shards=4, subshard=True,
                        actor_num_cpus=0.25)
    yield s
    s.shutdown()


SUB_FILTERS = FILTERS + [
    F.NGramSimilarity("the ref ok", threshold=0.5),   # positions path
    F.SloppyPhrase(["deploy", "target"], slop=2),
    F.Not(F.Term("ref")),                             # All-sourced docs
    F.Range(lo="sec", hi="then"),
]


def test_subshard_actually_splits(sharded_sub):
    # 2 segments must fan out over MORE than 2 workers
    assert len(sharded_sub.actors) == 4


@pytest.mark.parametrize("mode", ["all", "strict"])
def test_subsharded_equals_local(sharded_sub, searcher, mode):
    for flt in SUB_FILTERS:
        a = sharded_sub.search(flt, k=25, mode=mode)
        b = searcher.search(flt, k=25, mode=mode)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_subsharded_columns(sharded_sub, searcher):
    a = sharded_sub.search(F.Term("ref"), k=5,
                           columns=("conv_id", "turn_idx"))
    b = searcher.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx"))
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()


def test_serve_range_segment_reader(small_index):
    """Unit invariants of the range view: sliced postings, block-range
    position decode, phrase keys, and the filter_live clip all equal
    the full reader restricted to the range."""
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import SegmentReader

    man = Manifest.load(small_index)
    meta = man.segments[0]
    full = SegmentReader(man.segment_dir(meta), meta=dict(meta))
    n = meta["docs_count"]
    for lo, hi in ((0, 640), (640, n), (100, 777)):  # aligned + not
        sub = SegmentReader(man.segment_dir(meta), meta=dict(meta))
        sub.set_serve_range(lo, hi)
        for term in ("the", "ref", "deploy"):
            row = full.lookup(term)
            assert row >= 0
            fp = full.postings(row, positions=True)
            sp = sub.postings(row, positions=True)
            keep = (fp.docs > lo) & (fp.docs <= hi)
            np.testing.assert_array_equal(sp.docs, fp.docs[keep])
            np.testing.assert_array_equal(sp.tfs, fp.tfs[keep])
            occ = np.repeat(keep, fp.tfs)
            np.testing.assert_array_equal(sp.positions, fp.positions[occ])
            # phrase keys: exactly the in-range subset of the full keys
            fk = full.phrase_keys(row)
            sk = sub.phrase_keys(row)
            fd = fk >> np.int64(32)
            np.testing.assert_array_equal(sk, fk[(fd > lo) & (fd <= hi)])
        # filter_live range clip on an All-style doc stream
        docs = np.arange(1, n + 1, dtype=np.int64)
        got, _ = sub.filter_live(docs, np.zeros(n, dtype=np.float32))
        np.testing.assert_array_equal(got,
                                      np.arange(lo + 1, hi + 1))


def test_serve_range_guards(small_index):
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import SegmentReader

    man = Manifest.load(small_index)
    meta = man.segments[0]
    sub = SegmentReader(man.segment_dir(meta), meta=dict(meta))
    with pytest.raises(ValueError):
        sub.set_serve_range(10, 5)
    sub.set_serve_range(0, 100)
    with pytest.raises(RuntimeError):
        sub.occurrence_offsets(0)
    with pytest.raises(RuntimeError):
        sub.payloads(0)


def test_subsharded_with_deletes(ray_session, tmp_path, small_corpus):
    """Sub-range views compose with MVCC deletes: the range clip and
    the delete mask both apply in filter_live, and results stay
    rank-identical to the whole-index searcher on the same
    generation."""
    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.index.writer import IndexWriter
    from iresearch_ray.search.searcher import IndexSearcher
    from iresearch_ray.search.sharded import ShardedSearcher

    # Ray-free build (the small_index fixture pattern): the module's
    # shard fixtures hold most of the 4-CPU test session, so a Ray
    # encoder pool here would starve and deadlock
    idx = str(tmp_path / "delidx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m1, m2])
    IndexWriter(idx).delete(F.Term("deploy"))

    local = IndexSearcher(idx)
    assert local.match_docs(F.Term("deploy")).size == 0
    sh = ShardedSearcher(idx, n_shards=4, subshard=True,
                         actor_num_cpus=0.25)
    try:
        for flt in (F.Term("the"), F.Phrase(["security", "review"]),
                    F.NGramSimilarity("the ref ok", threshold=0.5)):
            a = sh.search(flt, k=25, mode="strict")
            b = local.search(flt, k=25, mode="strict")
            assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
            np.testing.assert_allclose(a["score"].to_numpy(),
                                       b["score"].to_numpy(), rtol=1e-6)
        assert sh.search(F.Term("deploy"), k=25).empty
    finally:
        sh.shutdown()


def test_serve_range_reopen_and_conv_match_guards(small_index):
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.search.searcher import IndexSearcher

    man = Manifest.load(small_index)
    name = man.segments[0]["name"]
    n = man.segments[0]["docs_count"]
    s = IndexSearcher(small_index, segment_subset={name},
                      segment_ranges={name: (0, n // 2)})
    with pytest.raises(RuntimeError):
        s.conv_match(F.Term("deploy"))
    # reopen guard only fires when a NEW generation exists; on the
    # same generation it is a no-op returning False
    assert s.reopen() is False


def test_plan_shard_units_invariants():
    """Pure planner: ranges tile each segment exactly on 128-block
    boundaries, each segment has exactly one primary (lo in {None, 0}),
    no worker holds two pieces of one segment, and loads balance."""
    from iresearch_ray.search.sharded import plan_shard_units

    segs = [{"name": f"s{i}", "docs_count": d}
            for i, d in enumerate(
                [757606, 757173, 755941, 755722, 754308, 753509,
                 725775, 596924, 443853, 442129, 441248, 440712,
                 436450])]
    for n_shards, sub in ((8, True), (8, 4), (4, True), (16, True),
                          (8, False)):
        groups = plan_shard_units(segs, n_shards, sub)
        assert 1 <= len(groups) <= n_shards
        by_seg: dict = {}
        for g in groups:
            names = [u[0] for u in g]
            assert len(names) == len(set(names))  # one piece per worker
            for name, lo, hi in g:
                by_seg.setdefault(name, []).append((lo, hi))
        docs = {s["name"]: s["docs_count"] for s in segs}
        for name, pieces in by_seg.items():
            if pieces == [(None, None)]:
                continue
            pieces.sort()
            assert pieces[0][0] == 0
            assert pieces[-1][1] == docs[name]
            for (l0, h0), (l1, h1) in zip(pieces, pieces[1:]):
                assert h0 == l1          # exact tiling, no overlap
                assert l1 % 128 == 0     # block-aligned boundary
        primaries = [lo for g in groups for (n_, lo, hi) in g
                     if lo in (None, 0)]
        assert len(primaries) == len(segs)  # exactly one per segment
        if sub and len(groups) > 1:
            loads = [sum((hi - lo) if lo is not None else docs[n_]
                         for n_, lo, hi in g) for g in groups]
            assert max(loads) <= 2.05 * min(loads)


def test_subsharded_threshold_exchange(sharded_sub, searcher):
    """The live cross-shard threshold exchange composes with doc-range
    sub-shards: posted kth bounds are range-independent lower bounds of
    the global kth, so rank identity must hold with the board forced on."""
    for flt in (F.Term("the"), F.Or([F.Term("the"), F.Term("ref"),
                                     F.Term("second"), F.Term("deploy")]),
                F.Phrase(["deploy", "target"])):
        a = sharded_sub.search(flt, k=25, mode="strict",
                               threshold_exchange=True)
        b = searcher.search(flt, k=25, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)
