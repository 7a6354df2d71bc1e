import pytest


@pytest.fixture(scope="session")
def ray_session():
    """One Ray session for the whole pytest run (never init per-test)."""
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield ray
    ray.shutdown()


@pytest.fixture(scope="session")
def small_corpus():
    from iresearch_ray.data.transcripts import make_transcripts

    return make_transcripts(128)


@pytest.fixture(scope="session")
def small_index(tmp_path_factory, small_corpus):
    """Two-segment index over the small corpus, built without Ray
    (segment encode is a pure function of its partition)."""
    from iresearch_ray.analysis.analyzers import get_analyzer
    from iresearch_ray.index.manifest import Manifest
    from iresearch_ray.index.segment import write_segment

    idx = str(tmp_path_factory.mktemp("idx"))
    an = get_analyzer("segmentation", {})
    n = small_corpus.num_rows
    m1 = write_segment(idx, small_corpus.slice(0, n // 2), an)
    m2 = write_segment(idx, small_corpus.slice(n // 2), an)
    Manifest.commit(idx, [m1, m2])
    return idx


@pytest.fixture(scope="session")
def searcher(small_index):
    from iresearch_ray.search.searcher import IndexSearcher

    return IndexSearcher(small_index)
