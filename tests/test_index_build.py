"""Ray Data index build: partition invariance, resumability, docid continuity."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from iresearch_ray.data.transcripts import make_transcripts_partition, write_transcripts
from iresearch_ray.search import filters as F
from iresearch_ray.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("corpus")
    write_transcripts(str(d), n_parts=4, convs_per_part=64)
    return str(d)


def test_generator_deterministic():
    a = make_transcripts_partition(3, 32)
    b = make_transcripts_partition(3, 32)
    assert a.equals(b)


def test_build_with_ray(ray_session, corpus_dir, tmp_path):
    from iresearch_ray.index.build import build_index

    idx = str(tmp_path / "idx")
    man = build_index(corpus_dir, idx, segment_docs=512)
    assert man.total_docs == sum(
        pq.ParquetFile(os.path.join(corpus_dir, f)).metadata.num_rows
        for f in os.listdir(corpus_dir)
    )
    # doc bases are contiguous prefix sums in first-key order
    bases = [s["doc_base"] for s in man.segments]
    counts = [s["docs_count"] for s in man.segments]
    assert bases == [sum(counts[:i]) for i in range(len(counts))]
    # key ranges are disjoint and ordered
    keys = [(tuple(s["first_key"]), tuple(s["last_key"])) for s in man.segments]
    for (f1, l1), (f2, _) in zip(keys, keys[1:]):
        assert l1 < f2

    s = IndexSearcher(idx)
    res = s.search(F.Term("ref"), k=10)
    assert len(res) == 10
    assert (np.diff(res["score"].to_numpy()) <= 0).all()


def test_partitioning_invariance(ray_session, corpus_dir, tmp_path):
    """Single-segment and many-segment builds give identical query results
    (the analogue of the reference's directory x format test matrix)."""
    from iresearch_ray.index.build import build_index

    idx_a = str(tmp_path / "one")
    idx_b = str(tmp_path / "many")
    build_index(corpus_dir, idx_a, segment_docs=1 << 20)
    build_index(corpus_dir, idx_b, segment_docs=300)
    sa, sb = IndexSearcher(idx_a), IndexSearcher(idx_b)
    assert len(sa.segments) == 1
    assert len(sb.segments) > 4
    for flt in [
        F.Term("ref"),
        F.Or([F.Term("the"), F.Term("deploy")]),
        F.And([F.Term("the"), F.Term("ok")]),
        F.Phrase(["ref", "name"]),
        F.Prefix("sec"),
    ]:
        ra = sa.search(flt, k=25, mode="all")
        rb = sb.search(flt, k=25, mode="all")
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), flt
        np.testing.assert_allclose(
            ra["score"].to_numpy(), rb["score"].to_numpy(), rtol=1e-6
        )


def test_resume_skips_finished_segments(ray_session, corpus_dir, tmp_path):
    from iresearch_ray.index.build import build_index

    idx = str(tmp_path / "idx")
    man1 = build_index(corpus_dir, idx, segment_docs=512)
    mtimes = {
        s["name"]: os.path.getmtime(os.path.join(idx, s["name"], "terms.parquet"))
        for s in man1.segments
    }
    man2 = build_index(corpus_dir, idx, segment_docs=512)  # rerun = resume
    assert [s["name"] for s in man2.segments] == [s["name"] for s in man1.segments]
    for s in man2.segments:
        # segment files untouched: encode was skipped via _SUCCESS checkpoint
        assert os.path.getmtime(os.path.join(idx, s["name"], "terms.parquet")) == mtimes[s["name"]]
    assert man2.generation == man1.generation + 1


def test_manifest_cleanup(ray_session, corpus_dir, tmp_path):
    from iresearch_ray.index.build import build_index
    from iresearch_ray.index.manifest import Manifest

    idx = str(tmp_path / "idx")
    build_index(corpus_dir, idx, segment_docs=512)
    # orphan segment dir
    os.makedirs(os.path.join(idx, "seg-deadbeef-1"), exist_ok=True)
    removed = Manifest.load(idx).cleanup()
    assert removed == ["seg-deadbeef-1"]


def test_point_in_time_and_snapshot(small_corpus, tmp_path):
    """A past generation stays readable (Lucene IndexCommit / ES PIT)
    until GC'd; a snapshot taken first survives the GC and restores as
    a normal index."""
    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    idx = str(tmp_path / "pit_idx")
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    Manifest.commit(idx, [m1])                       # generation 1
    want_g1 = sorted(IndexSearcher(idx).match_docs(
        F.Term("deploy")).tolist())

    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m2])                       # generation 2 DROPS m1
    latest = IndexSearcher(idx)
    assert latest.manifest.generation == 2
    assert latest.manifest.total_docs == n - n // 2

    # point-in-time read of generation 1 (its segments not yet GC'd)
    pit = IndexSearcher(idx, generation=1)
    assert pit.manifest.total_docs == n // 2
    assert sorted(pit.match_docs(F.Term("deploy")).tolist()) == want_g1

    # snapshot generation 1, then GC the live index
    snap_dir = str(tmp_path / "pit_snap")
    Manifest.load_generation(idx, 1).snapshot(snap_dir)
    removed = Manifest.load(idx).cleanup()
    assert removed                                   # m1's dir went away
    import pytest

    with pytest.raises(FileNotFoundError):
        IndexSearcher(idx, generation=1)
    # ...but the snapshot restores the old view byte-for-byte
    snap = IndexSearcher(snap_dir)
    assert snap.manifest.generation == 1
    assert sorted(snap.match_docs(F.Term("deploy")).tolist()) == want_g1


def test_build_deterministic_segmentation(ray_session, tmp_path):
    """Batch boundaries are deterministic and key-contiguous regardless
    of parallelism (preserve_order set on the dataset's CAPTURED
    context — the r4 ordering fix): the same corpus yields identical
    content-digest segment names at any concurrency, and the manifest
    tiles the key space without overlap."""
    from iresearch_ray.data.transcripts import write_transcripts
    from iresearch_ray.index.build import build_index

    corpus = str(tmp_path / "det_corpus")
    write_transcripts(corpus, n_parts=4, convs_per_part=32)
    m1 = build_index(corpus, str(tmp_path / "det_i1"), segment_docs=256,
                     concurrency=1)
    m2 = build_index(corpus, str(tmp_path / "det_i2"), segment_docs=256,
                     concurrency=2)
    assert [s["name"] for s in m1.segments] == \
        [s["name"] for s in m2.segments]
    segs = m1.segments
    for prev, cur in zip(segs, segs[1:]):
        assert tuple(cur["first_key"]) > tuple(prev["last_key"])


def test_snapshot_restages_partial_dest(small_corpus, tmp_path):
    """ADVICE r3: a partial/foreign dest segment dir with a matching
    name must be re-staged from the source, not silently kept."""
    import os
    import shutil

    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment
    from iresearch_ray.search import filters as F
    from iresearch_ray.search.searcher import IndexSearcher

    idx = str(tmp_path / "snapre_idx")
    an = get_analyzer("segmentation", {})
    m1 = write_segment(idx, small_corpus, an)
    man = Manifest.commit(idx, [m1])
    want = sorted(IndexSearcher(idx).match_docs(F.Term("deploy")).tolist())

    # fake an interrupted earlier snapshot: same segment name, but the
    # dir holds only one file of the set
    dest = str(tmp_path / "snapre_dest")
    partial = os.path.join(dest, m1["name"])
    os.makedirs(partial)
    shutil.copy2(os.path.join(idx, m1["name"], "meta.json"),
                 os.path.join(partial, "meta.json"))

    man.snapshot(dest)
    restored = IndexSearcher(dest)
    assert sorted(restored.match_docs(F.Term("deploy")).tolist()) == want
    # the partial dir was replaced by the full file set
    src_files = set(os.listdir(os.path.join(idx, m1["name"])))
    assert set(os.listdir(partial)) == src_files
