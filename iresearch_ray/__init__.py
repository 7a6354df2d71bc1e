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

__all__ = ["build_index", "Manifest", "IndexSearcher"]
__version__ = "0.1.0"


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
    raise AttributeError(name)
