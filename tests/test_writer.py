"""IndexWriter transactional surface: add / delete / replace /
consolidate-with-deletes; SamePosition + NumericRange filters."""

import numpy as np
import pytest

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import write_segment
from iresearch_ray.index.writer import IndexWriter
from iresearch_ray.search import filters as F
from iresearch_ray.search.searcher import IndexSearcher


@pytest.fixture()
def half_index(tmp_path, small_corpus):
    idx = str(tmp_path / "widx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m = write_segment(idx, small_corpus.slice(0, n // 2), an)
    Manifest.commit(idx, [m])
    return idx


def test_add_commits_new_segments(ray_session, half_index, small_corpus, searcher, tmp_path):
    import pyarrow.parquet as pq
    import ray.data

    n = small_corpus.num_rows
    second = small_corpus.slice(n // 2)
    p = str(tmp_path / "second.parquet")
    pq.write_table(second, p)
    w = IndexWriter(half_index)
    man = w.add(p, segment_docs=1 << 20, concurrency=1)
    assert man.total_docs == n
    s = IndexSearcher(half_index)
    ref_full = searcher.search(F.Term("ref"), k=20, mode="all")
    got = s.search(F.Term("ref"), k=20, mode="all")
    assert got["doc_id"].tolist() == ref_full["doc_id"].tolist()
    np.testing.assert_allclose(got["score"].to_numpy(),
                               ref_full["score"].to_numpy(), rtol=1e-6)


@pytest.fixture()
def full_index(tmp_path, small_corpus):
    idx = str(tmp_path / "didx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m1, m2])
    return idx


def test_delete_by_filter(full_index, searcher):
    w = IndexWriter(full_index)
    before_all = set(searcher.match_docs(F.Term("the")).tolist())
    deploy_docs = set(searcher.match_docs(F.Term("deploy")).tolist())
    man = w.delete(F.Term("deploy"))
    assert man.generation == 2
    s = IndexSearcher(full_index)
    assert s.match_docs(F.Term("deploy")).size == 0
    # other queries exclude only the deleted docs
    got = set(s.match_docs(F.Term("the")).tolist())
    assert got == before_all - deploy_docs
    # WAND path also masks deletions
    strict = s.search(F.Term("the"), k=10, mode="strict")
    full = s.search(F.Term("the"), k=10, mode="all")
    assert strict["doc_id"].tolist() == full["doc_id"].tolist()
    assert not (set(strict["doc_id"]) & deploy_docs)


def test_delete_then_consolidate_purges(full_index, searcher):
    w = IndexWriter(full_index)
    deploy_docs = set(searcher.match_docs(F.Term("deploy")).tolist())
    w.delete(F.Term("deploy"))
    man = w.consolidate(max_segments=4)
    assert len(man.segments) == 1
    assert man.segments[0].get("deletes_file") is None
    s = IndexSearcher(full_index)
    assert s.manifest.total_docs == searcher.manifest.total_docs - len(deploy_docs)
    assert s.match_docs(F.Term("deploy")).size == 0
    # remaining docs still query correctly (stored fields intact)
    res = s.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx", "text"))
    assert len(res) == 5
    for t in res["text"]:
        assert "ref" in t.lower()


def test_replace(full_index, searcher, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    w = IndexWriter(full_index)
    new_docs = pa.table({
        "conv_id": pa.array(["conv-99999990", "conv-99999990"]),
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": pa.array(["user", "assistant"]),
        "text": pa.array(["replacement deploy text", "deploy again here"]),
        "tool": pa.array(["", ""]),
        "ts": pa.array([0, 1], type=pa.timestamp("us")),
    })
    p = str(tmp_path / "new.parquet")
    pq.write_table(new_docs, p)
    w.replace(F.Term("deploy"), p, segment_docs=1 << 20, concurrency=1)
    s = IndexSearcher(full_index)
    got = s.search(F.Term("deploy"), k=500, mode="all",
                   columns=("conv_id",))
    # only the two replacement docs match now
    assert sorted(set(got["conv_id"])) == ["conv-99999990"]
    assert len(got) == 2


def test_same_position(searcher):
    ref_docs = sorted(searcher.match_docs(F.Term("ref")).tolist())
    assert sorted(searcher.match_docs(F.SamePosition(["ref"])).tolist()) == ref_docs
    # two distinct terms can never share a position with this analyzer
    assert searcher.match_docs(F.SamePosition(["ref", "the"])).size == 0


def test_numeric_range(searcher, small_corpus):
    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    tix = ordered.column("turn_idx").to_numpy()
    exp = sorted((np.flatnonzero((tix >= 3) & (tix <= 7)) + 1).tolist())
    got = sorted(searcher.match_docs(F.NumericRange("turn_idx", 3, 7)).tolist())
    assert got == exp


def test_cached_match_proxy(searcher):
    a = searcher.cached_match(F.Prefix("sec"))
    b = searcher.cached_match(F.Prefix("sec"))
    assert a is b  # memoized, not recomputed
    np.testing.assert_array_equal(a, searcher.match_docs(F.Prefix("sec")))


def test_granular_range(tmp_path, small_corpus):
    """Numeric-trie range == brute-force column scan (ts column)."""
    from iresearch_ray.analysis.analyzers import get_analyzer

    idx = str(tmp_path / "gidx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an,
                       numeric_fields=("ts", "turn_idx"))
    m2 = write_segment(idx, small_corpus.slice(n // 2), an,
                       numeric_fields=("ts", "turn_idx"))
    Manifest.commit(idx, [m1, m2])
    s = IndexSearcher(idx)
    ordered = small_corpus.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    ts = ordered.column("ts").cast("int64").to_numpy()
    lo, hi = int(np.percentile(ts, 20)), int(np.percentile(ts, 70))
    exp = sorted((np.flatnonzero((ts >= lo) & (ts <= hi)) + 1).tolist())
    got = sorted(s.match_docs(F.GranularRange("ts", lo, hi)).tolist())
    assert got == exp
    # exclusive bounds
    exp2 = sorted((np.flatnonzero((ts > lo) & (ts < hi)) + 1).tolist())
    got2 = sorted(s.match_docs(
        F.GranularRange("ts", lo, hi, include_lo=False, include_hi=False)
    ).tolist())
    assert got2 == exp2
    # small-int column too
    tix = ordered.column("turn_idx").to_numpy()
    exp3 = sorted((np.flatnonzero((tix >= 2) & (tix <= 5)) + 1).tolist())
    got3 = sorted(s.match_docs(F.GranularRange("turn_idx", 2, 5)).tolist())
    assert got3 == exp3


def test_add_rolling_commits_never_drop_base(ray_session, half_index,
                                             small_corpus, tmp_path):
    """ADVICE r1 (high): every manifest generation committed during an
    add() — including rolling commit_every generations — must list the
    pre-existing segments, so a crash mid-build never truncates the
    index."""
    import glob
    import json

    import pyarrow.parquet as pq

    base_names = {s["name"] for s in Manifest.load(half_index).segments}
    n = small_corpus.num_rows
    second = small_corpus.slice(n // 2)
    p = str(tmp_path / "second.parquet")
    pq.write_table(second, p)
    w = IndexWriter(half_index)
    man = w.add(p, segment_docs=16, concurrency=1, commit_every=1)
    assert man.total_docs == n
    gens = sorted(glob.glob(f"{half_index}/manifest-*.json"))
    assert len(gens) > 2  # rolling commits actually happened
    for g in gens[1:]:  # every generation after the base one
        with open(g) as f:
            names = {s["name"] for s in json.load(f)["segments"]}
        assert base_names <= names, f"{g} dropped base segments"


def test_segment_name_tracks_content(tmp_path, small_corpus):
    """ADVICE r1 (medium): same (first_key, docs_count) but different
    content must produce a different segment name, so the _SUCCESS
    checkpoint can't silently resurrect stale data."""
    import pyarrow as pa

    an = get_analyzer("segmentation", {})
    idx1, idx2 = str(tmp_path / "a"), str(tmp_path / "b")
    m1 = write_segment(idx1, small_corpus, an)
    changed = small_corpus.set_column(
        small_corpus.column_names.index("text"), "text",
        pa.array(["MUTATED " + t for t in
                  small_corpus.column("text").to_pylist()]))
    m2 = write_segment(idx2, changed, an)
    assert m1["docs_count"] == m2["docs_count"]
    assert m1["first_key"] == m2["first_key"]
    assert m1["name"] != m2["name"]


def test_numeric_nulls_not_indexed(tmp_path):
    """ADVICE r1 (medium): null numeric values must be absent from the
    numeric field — not indexed as INT64_MIN garbage that matches
    open-ended ranges."""
    import pyarrow as pa

    t = pa.table({
        "conv_id": ["c0", "c0", "c1", "c1"],
        "turn_idx": pa.array([0, 1, 0, 1], type=pa.int32()),
        "text": ["alpha", "beta", "gamma", "delta"],
        "score_num": pa.array([5, None, -3, None], type=pa.int64()),
    })
    idx = str(tmp_path / "nidx")
    an = get_analyzer("segmentation", {})
    m = write_segment(idx, t, an, numeric_fields=("score_num",))
    Manifest.commit(idx, [m])
    s = IndexSearcher(idx)
    # open-ended range: only the two non-null docs may match
    got = sorted(s.match_docs(
        F.GranularRange("score_num", lo=None, hi=None)).tolist())
    docs = s.segments[0].docmap
    valid = sorted(
        d + 1 for d, v in enumerate(docs.column("score_num").to_pylist())
        if v is not None)
    assert got == valid
    # and a bounded range still behaves
    got_lo = s.match_docs(F.GranularRange("score_num", lo=0, hi=None)).tolist()
    assert sorted(got_lo) == [
        d + 1 for d, v in enumerate(docs.column("score_num").to_pylist())
        if v is not None and v >= 0]


def test_reopen_after_add_and_delete(ray_session, half_index, small_corpus,
                                     tmp_path):
    """DirectoryReader::Reopen parity: a live searcher picks up new
    generations; unchanged segments keep their reader objects (warm
    caches)."""
    import pyarrow.parquet as pq

    s = IndexSearcher(half_index)
    assert s.reopen() is False  # same generation
    old_readers = {seg.meta["name"]: id(seg) for seg in s.segments}
    n = small_corpus.num_rows
    p = str(tmp_path / "more.parquet")
    pq.write_table(small_corpus.slice(n // 2), p)
    w = IndexWriter(half_index)
    w.add(p, segment_docs=1 << 20, concurrency=1)
    assert s.reopen() is True
    assert s.manifest.total_docs == n
    kept = [seg for seg in s.segments if seg.meta["name"] in old_readers]
    assert kept and all(id(seg) == old_readers[seg.meta["name"]]
                        for seg in kept)
    before = set(s.match_docs(F.Term("deploy")).tolist())
    # delete flows through reopen too
    w.delete(F.Term("deploy"))
    assert s.reopen() is True
    assert s.match_docs(F.Term("deploy")).size == 0
    assert before  # sanity: the term did exist


def test_numeric_nulls_survive_merge(tmp_path):
    """Null numeric docs stay absent from the numeric field after
    consolidation (the null fix must hold through merge renumbering)."""
    import pyarrow as pa

    from iresearch_ray.index.merge import merge_segments

    an = get_analyzer("segmentation", {})
    idx = str(tmp_path / "nm")
    t1 = pa.table({
        "conv_id": ["a", "a"], "turn_idx": pa.array([0, 1], type=pa.int32()),
        "text": ["one", "two"],
        "v": pa.array([7, None], type=pa.int64()),
    })
    t2 = pa.table({
        "conv_id": ["b", "b"], "turn_idx": pa.array([0, 1], type=pa.int32()),
        "text": ["three", "four"],
        "v": pa.array([None, -2], type=pa.int64()),
    })
    m1 = write_segment(idx, t1, an, numeric_fields=("v",))
    m2 = write_segment(idx, t2, an, numeric_fields=("v",))
    merged = merge_segments(idx, [m1, m2])
    Manifest.commit(idx, [merged])
    s = IndexSearcher(idx)
    got = sorted(s.match_docs(F.GranularRange("v", lo=None, hi=None)).tolist())
    vals = s.segments[0].docmap.column("v").to_pylist()
    exp = sorted(i + 1 for i, v in enumerate(vals) if v is not None)
    assert got == exp


def test_transaction_two_phase(ray_session, half_index, small_corpus, tmp_path):
    """begin() -> insert + remove -> commit publishes ONE generation
    with both effects; rollback publishes nothing and removes staged
    segment dirs."""
    import os

    import pyarrow.parquet as pq

    n = small_corpus.num_rows
    second = small_corpus.slice(n // 2)
    p = str(tmp_path / "second.parquet")
    pq.write_table(second, p)

    w = IndexWriter(half_index)
    gen0 = Manifest.load(half_index).generation
    docs0 = Manifest.load(half_index).total_docs

    # rollback: staged segments vanish, manifest untouched
    txn = w.begin()
    txn.insert(p, segment_docs=1 << 20, concurrency=1)
    staged_names = [m["name"] for m in txn._staged]
    assert staged_names
    txn.rollback()
    man = Manifest.load(half_index)
    assert man.generation == gen0 and man.total_docs == docs0
    for name in staged_names:
        if name not in {s["name"] for s in man.segments}:
            assert not os.path.exists(os.path.join(half_index, name))

    # commit: one new generation, insert + remove visible atomically
    before = IndexSearcher(half_index)
    n_ref_before = len(before.match_docs(F.Term("ref")))
    txn = w.begin()
    txn.insert(p, segment_docs=1 << 20, concurrency=1)
    txn.remove(F.Term("ref"))
    man2 = txn.commit()
    assert man2.generation == gen0 + 1  # exactly one publish
    s = IndexSearcher(half_index)
    assert s.manifest.total_docs == n
    # read-committed remove: every OLD-half 'ref' match is deleted, so
    # all survivors live in the newly inserted (conv_id, turn_idx) rows
    got = s.match_docs(F.Term("ref"))
    stored = s.fetch_stored(got, ("conv_id", "turn_idx"))
    new_rows = set(zip(second.column("conv_id").to_pylist(),
                       second.column("turn_idx").to_pylist()))
    survivors = set(zip(stored["conv_id"], stored["turn_idx"]))
    assert survivors <= new_rows
    assert n_ref_before > 0  # the remove actually removed something

    # double-commit / use-after-close guarded
    with pytest.raises(AssertionError):
        txn.commit()


def test_warm_caches_respect_deletes_after_reopen(ray_session, half_index):
    """Scored/structural segment caches are keyed on snapshot-constant
    inputs; deletes are applied OUTSIDE the caches (filter_live per
    query). Warm every cache shape, delete, reopen the SAME searcher,
    and verify every query shape drops the deleted docs."""
    s = IndexSearcher(half_index)
    queries = [
        F.Term("ref"),
        F.Or([F.Term("ref"), F.Term("deploy")]),
        F.And([F.Term("the"), F.Term("ref")]),
        F.Phrase(["deploy", "target"]),
        F.Fuzzy("ref", 1),
    ]
    for q in queries:  # warm all caches
        s.search(q, k=10)
        s.search(q, k=10)
    victims = s.match_docs(F.Term("ref"))[:3]
    assert victims.size == 3

    w = IndexWriter(half_index)
    w.delete(F.Term("ref"))
    assert s.reopen()
    for q in queries:
        res = s.search(q, k=1000)
        got = set(res["doc_id"].tolist())
        assert not (got & set(victims.tolist())), q
    # ref is gone entirely; conjunction/phrase containing ref empty too
    assert len(s.search(F.Term("ref"), k=10)) == 0
    assert len(s.search(F.And([F.Term("the"), F.Term("ref")]), k=10)) == 0
