"""iresearch_ray — a Ray-Data-native full-text index + BM25 query engine.

A from-scratch rebuild of the *capabilities* of IResearch
(GerHobbelt/iresearch: segment-based inverted index, compressed posting
lists with skip/block-max metadata, BM25/TFIDF top-k scoring) expressed
as idiomatic Ray Data pipelines over Arrow batches:

- index build  = ``ray.data.read_parquet`` -> ``map_batches(SegmentEncoder)``
  (stateful analyzer actor pool) -> per-partition Parquet segments ->
  atomic manifest commit (the analogue of ``IndexWriter::Commit``,
  reference ``core/index/index_writer.cpp:2356-2413``).
- query       = manifest -> global stats merge (collector semantics,
  reference ``core/search/term_filter.cpp:92-129``) -> per-segment numpy
  kernels -> global top-k merge.

No code is ported from the reference; citations in docstrings are
behavioural anchors only.
"""

__all__ = ["build_index", "Manifest", "IndexSearcher", "IndexWriter",
           "ShardedSearcher", "highlight", "consolidate"]
__version__ = "0.1.0"


def _register_pickle_by_value() -> None:
    """Ship this package to Ray workers by value.

    The driver may initialise Ray from a working directory where
    ``iresearch_ray`` is not importable; registering the package with
    cloudpickle makes every class/function (SegmentEncoder, analyzers,
    pipeline actors) serialize self-contained, so tasks deserialize on
    any worker without a PYTHONPATH requirement. Registering the top
    package covers all submodules.
    """
    try:
        import sys

        import ray.cloudpickle as _rcp

        _rcp.register_pickle_by_value(sys.modules[__name__])
    except Exception:
        pass


_register_pickle_by_value()


def __getattr__(name):  # lazy imports keep `import iresearch_ray` light
    if name == "build_index":
        from iresearch_ray.index.build import build_index
        return build_index
    if name == "Manifest":
        from iresearch_ray.index.manifest import Manifest
        return Manifest
    if name == "IndexSearcher":
        from iresearch_ray.search.searcher import IndexSearcher
        return IndexSearcher
    if name == "IndexWriter":
        from iresearch_ray.index.writer import IndexWriter
        return IndexWriter
    if name == "ShardedSearcher":
        from iresearch_ray.search.sharded import ShardedSearcher
        return ShardedSearcher
    if name == "highlight":
        from iresearch_ray.search.highlight import highlight
        return highlight
    if name == "consolidate":
        from iresearch_ray.index.merge import consolidate
        return consolidate
    raise AttributeError(name)
