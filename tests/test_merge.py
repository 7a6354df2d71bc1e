"""merge(S1..Sk) must be query-equivalent to index(concat) — the
analogue of the reference's merge_writer tests."""

import numpy as np
import pytest

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.merge import consolidate, merge_segments, plan_tier
from iresearch_ray.index.segment import write_segment
from iresearch_ray.search import filters as F
from iresearch_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def many_segment_index(tmp_path_factory, small_corpus):
    idx = str(tmp_path_factory.mktemp("merge_idx"))
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    metas = []
    step = n // 5
    for i in range(5):
        lo = i * step
        hi = n if i == 4 else (i + 1) * step
        metas.append(write_segment(idx, small_corpus.slice(lo, hi - lo), an))
    Manifest.commit(idx, metas)
    return idx


QUERIES = [
    F.Term("the"),
    F.Term("deploy"),
    F.Phrase(["ref", "name"]),
    F.Or([F.Term("ref"), F.Term("second")]),
    F.And([F.Term("the"), F.Term("ok")]),
    F.Prefix("sec"),
]


def test_merge_equivalent_to_direct_index(many_segment_index, searcher):
    """5 segments merged into 1 == the 2-segment index built directly
    (both == global corpus)."""
    man = Manifest.load(many_segment_index)
    merged_meta = merge_segments(many_segment_index, man.segments)
    merged_meta.pop("doc_base", None)
    Manifest.commit(many_segment_index, [merged_meta])
    s_merged = IndexSearcher(many_segment_index)
    assert len(s_merged.segments) == 1
    for flt in QUERIES:
        a = s_merged.search(flt, k=30, mode="all")
        b = searcher.search(flt, k=30, mode="all")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(
            a["score"].to_numpy(), b["score"].to_numpy(), rtol=1e-6
        )


def test_merge_preserves_positions(many_segment_index):
    s = IndexSearcher(many_segment_index)
    seg = s.segments[0]
    row = seg.lookup("ref")
    pl = seg.postings(row, positions=True)
    assert pl.positions is not None and (pl.positions >= 0).all()
    assert pl.docs.size == seg.doc_freq[row]


def test_plan_tier_groups():
    segs = [
        {"name": f"s{i}", "first_key": [f"c{i:02d}", 0], "last_key": [f"c{i:02d}", 9],
         "docs_count": 100}
        for i in range(7)
    ]
    groups = plan_tier(segs, min_segments=2, max_segments=3)
    assert [len(g) for g in groups] == [3, 3]  # trailing singleton dropped
    assert groups[0][0]["name"] == "s0"


def test_consolidate_round(ray_session, tmp_path, small_corpus):
    idx = str(tmp_path / "cidx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    metas = []
    step = n // 4
    for i in range(4):
        lo = i * step
        hi = n if i == 3 else (i + 1) * step
        metas.append(write_segment(idx, small_corpus.slice(lo, hi - lo), an))
    Manifest.commit(idx, metas)

    before = IndexSearcher(idx).search(F.Term("ref"), k=10, mode="all")
    man2 = consolidate(idx, min_segments=2, max_segments=4)
    assert man2.generation == 2
    assert len(man2.segments) == 1
    assert man2.segments[0]["lineage"]["merged_from"] == [m["name"] for m in sorted(metas, key=lambda m: tuple(m["first_key"]))]
    after = IndexSearcher(idx).search(F.Term("ref"), k=10, mode="all")
    assert before["doc_id"].tolist() == after["doc_id"].tolist()
    np.testing.assert_allclose(
        before["score"].to_numpy(), after["score"].to_numpy(), rtol=1e-6
    )
    # old segment dirs were garbage-collected
    import os

    dirs = [d for d in os.listdir(idx) if d.startswith("seg-")]
    assert dirs == [man2.segments[0]["name"]]


def test_merge_segments_with_differing_fields(tmp_path, small_corpus):
    """A group mixing segments built with different exact_fields must
    merge (missing fields behave as empty in those segments)."""
    from iresearch_ray.index.merge import merge_segments

    an = get_analyzer("segmentation", {})
    idx = str(tmp_path / "mixidx")
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an,
                       exact_fields=("role",))
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)  # no role field
    Manifest.commit(idx, [m1, m2])
    merged = merge_segments(idx, Manifest.load(idx).segments)
    merged.pop("doc_base", None)
    Manifest.commit(idx, [merged])
    s = IndexSearcher(idx)
    # role terms only exist for the first half's docs
    got = sorted(s.match_docs(F.Term("user", field="role")).tolist())
    assert got and max(got) <= n // 2
    # text queries span everything
    assert s.match_docs(F.Term("the")).size > 0


def test_empty_text_segment(tmp_path):
    """All-empty text still produces a valid, queryable segment."""
    import pyarrow as pa

    t = pa.table({
        "conv_id": pa.array(["c1", "c2"]),
        "turn_idx": pa.array([0, 0], type=pa.int32()),
        "text": pa.array(["", None]),
    })
    idx = str(tmp_path / "eidx")
    an = get_analyzer("segmentation", {})
    m = write_segment(idx, t, an)
    Manifest.commit(idx, [m])
    s = IndexSearcher(idx)
    assert s.manifest.total_docs == 2
    assert s.match_docs(F.Term("anything")).size == 0
    assert sorted(s.match_docs(F.All()).tolist()) == [1, 2]


def test_convert_index(tmp_path, small_corpus, searcher):
    from iresearch_ray.index.merge import convert_index

    an = get_analyzer("segmentation", {})
    src = str(tmp_path / "src")
    n = small_corpus.num_rows
    m1 = write_segment(src, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(src, small_corpus.slice(n // 2), an)
    Manifest.commit(src, [m1, m2])
    dst = str(tmp_path / "dst")
    man = convert_index(src, dst)
    assert len(man.segments) == 2
    s2 = IndexSearcher(dst)
    for flt in (F.Term("ref"), F.Phrase(["deploy", "target"])):
        a = s2.search(flt, k=15, mode="all")
        b = searcher.search(flt, k=15, mode="all")
        assert a["doc_id"].tolist() == b["doc_id"].tolist()
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_docs_live_policy(tmp_path, small_corpus, ray_session):
    """docs_live consolidation rewrites only segments with enough
    deletions, purging masks."""
    from iresearch_ray.index.merge import consolidate
    from iresearch_ray.index.writer import IndexWriter

    an = get_analyzer("segmentation", {})
    idx = str(tmp_path / "dl")
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m1, m2])
    w = IndexWriter(idx)
    w.delete(F.Term("the"))  # ~high df: both segments get masks
    man = consolidate(idx, policy="docs_live", min_deleted_ratio=0.05)
    assert len(man.segments) == 2  # rewritten singletons, not merged
    assert all(s.get("deletes_file") is None for s in man.segments)
    s = IndexSearcher(idx)
    assert s.match_docs(F.Term("the")).size == 0
    assert s.match_docs(F.Term("ref")).size > 0
