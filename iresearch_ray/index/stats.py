"""Index-wide term statistics as a Ray Data pipeline.

The merged dictionary view (term -> docs_with_term, total_term_freq
summed over segments) is the distributed form of the reference's
field/term collectors (``core/search/term_filter.cpp:92-129``). Per
segment the stats already sit in ``terms.parquet``; the global view is
``read_parquet(all segments) -> groupby(term).sum`` — a shuffle over
(term, 2 ints) rows only, never over posting blobs.
"""

from __future__ import annotations

import os

import ray.data
from ray.data.aggregate import Sum

from iresearch_ray.index.manifest import Manifest


def term_stats_dataset(index_dir: str, field: str | None = None,
                       salt: int = 0) -> "ray.data.Dataset":
    """-> Dataset(term, doc_freq, total_tf) for one field, aggregated
    across segments (row-group predicate pushdown on the field column).

    ``salt > 1`` enables the two-stage salted reduce for hot-term skew:
    after the in-batch combiner, each row gets a round-robin salt id,
    stage 1 aggregates on (term, salt) — so one hot term's rows spread
    over ``salt`` reducers instead of one straggler — and stage 2
    collapses the <= ``salt`` partials per term. The associative-sum
    semantics make the result identical. Worth it only at extreme
    segment counts (the combiner already caps a hot term at one row
    per input batch); default off."""
    import pyarrow.compute as _pc

    man = Manifest.load(index_dir)
    paths = [
        os.path.join(man.segment_dir(s), "terms.parquet") for s in man.segments
    ]
    field = field or man.segments[0].get("text_col", "text")
    ds = ray.data.read_parquet(
        paths,
        columns=["field", "term", "doc_freq", "total_tf"],
        filter=_pc.field("field") == field,
    ).drop_columns(["field"])

    def combine(batch):
        # partial aggregation before the shuffle (combiner): a hot term
        # otherwise ships one row per segment into a single group — at
        # 10^6+ segments that is the classic skewed-key straggler
        return batch.group_by("term").aggregate(
            [("doc_freq", "sum"), ("total_tf", "sum")]
        ).rename_columns(["term", "doc_freq", "total_tf"])

    ds = ds.map_batches(combine, batch_format="pyarrow", batch_size=262144)
    if salt and salt > 1:
        def add_salt(batch):
            import numpy as _np
            import pyarrow as _pa

            return batch.append_column(
                "salt", _pa.array(_np.arange(batch.num_rows) % salt))

        partial = (
            ds.map_batches(add_salt, batch_format="pyarrow")
            .groupby(["term", "salt"])
            .aggregate(Sum("doc_freq", alias_name="doc_freq"),
                       Sum("total_tf", alias_name="total_tf"))
            .drop_columns(["salt"])
        )
        return partial.groupby("term").aggregate(
            Sum("doc_freq", alias_name="doc_freq"),
            Sum("total_tf", alias_name="total_tf"),
        )
    return ds.groupby("term").aggregate(
        Sum("doc_freq", alias_name="doc_freq"),
        Sum("total_tf", alias_name="total_tf"),
    )


def top_terms(index_dir: str, n: int = 10):
    """Most-frequent terms by document frequency (the
    ``top_terms_collector`` analogue,
    ``core/search/top_terms_collector.hpp``) -> small pandas frame.

    Per-block top-n prune inside ``map_batches`` first, so the global
    sort ranks at most n rows per block instead of the whole vocabulary
    (at 10^12-turn scale the merged dictionary is billions of terms;
    only block winners cross the exchange)."""

    def _block_topn(b):
        pdf = b.sort_values(["doc_freq", "term"], ascending=[False, True],
                            kind="mergesort").head(n)
        return pdf

    ds = term_stats_dataset(index_dir).map_batches(
        _block_topn, batch_format="pandas")
    pdf = (ds.sort(["doc_freq", "term"], descending=[True, False])
             .limit(n).to_pandas())
    return pdf.reset_index(drop=True)


def rare_terms(index_dir: str, max_doc_count: int = 1,
               field: str | None = None) -> "ray.data.Dataset":
    """ES ``rare_terms`` aggregation, EXACT: the long-tail terms whose
    cross-segment document frequency is <= ``max_doc_count``
    -> Dataset(term, doc_freq).

    The rarity filter must run AFTER the global sum — a term rare in
    one segment may be frequent overall, so no per-segment prune is
    sound (ES accepts false positives from a CuckooFilter to avoid
    exactly this full aggregation; here the ``term_stats_dataset``
    combiner already caps a term at one row per input batch, so the
    exact form costs one bounded shuffle of (term, df) rows)."""
    cap = int(max_doc_count)

    def keep_rare(batch):
        import pyarrow.compute as _pc

        return batch.filter(
            _pc.less_equal(batch.column("doc_freq"), cap)
        ).select(["term", "doc_freq"])

    return term_stats_dataset(index_dir, field=field).map_batches(
        keep_rare, batch_format="pyarrow")
