"""Index build: the Ray-Data-native ``IndexWriter`` pipeline.

    read_parquet(transcripts)
      -> map_batches(SegmentEncoder, batch_format="pyarrow",
                     batch_size=segment_docs, concurrency=N)   # actor pool
      -> tiny per-segment summary rows -> driver manifest commit

This replaces the reference's N indexer threads + committer thread
(``utils/index-put.cpp:424-560``): each Ray actor invocation encodes one
partition into a self-contained segment (no cross-worker mutable state;
the only synchronisation point is the final manifest rename), exactly
the "segments are the parallelism unit" design of the reference
(``core/index/index_writer.hpp:114-121``).

Scale notes (designed for ~100 TB / 10^12 turns):
- per-segment work is O(partition) with vectorized inversion; no global
  shuffle is required when the input files are already sorted by
  ``(conv_id, turn_idx)`` (the common log-structured layout). With
  ``sort=True`` a single range-partitioning ``ds.sort`` provides the
  stable global order (the reference's primary-sort index).
- segment directories are idempotent checkpoints (``_SUCCESS`` marker);
  a rerun skips finished partitions, so builds resume after failure.
- doc ids are derived from data order (prefix sums of per-segment doc
  counts at commit), never from a shared counter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from iresearch_ray.analysis.analyzers import get_analyzer
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import write_segment

DEFAULT_SEGMENT_DOCS = 65536


class SegmentEncoder:
    """Stateful map_batches callable: one call = one segment.

    Analyzer construction (stopword sets, compiled regexes) happens once
    per actor in ``__init__``; each ``__call__`` inverts + encodes one
    Arrow batch and returns a one-row summary table.
    """

    def __init__(self, index_dir: str, analyzer: str = "segmentation",
                 analyzer_options: dict | None = None, text_col: str = "text",
                 key_cols: tuple = ("conv_id", "turn_idx"),
                 stored_cols: tuple | None = None,
                 exact_fields: tuple = (),
                 numeric_fields: tuple = (),
                 index_features: tuple = (),
                 text_fields: tuple = ()):
        # each actor reserves 1 CPU — pin Arrow's internal pools to it,
        # otherwise every actor spawns a machine-wide thread pool and the
        # node oversubscribes (regex split / sorts / parquet writes)
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
        self.index_dir = index_dir
        self.analyzer_spec = {"name": analyzer, "options": analyzer_options or {}}
        self.analyzer = get_analyzer(analyzer, analyzer_options)
        self.text_col = text_col
        self.key_cols = key_cols
        self.stored_cols = stored_cols
        self.exact_fields = exact_fields
        self.numeric_fields = numeric_fields
        self.index_features = index_features
        self.text_fields = text_fields

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"name": pa.array([], type=pa.string()),
                             "meta_json": pa.array([], type=pa.string())})
        import json

        meta = write_segment(
            self.index_dir,
            batch,
            self.analyzer,
            text_col=self.text_col,
            key_cols=self.key_cols,
            stored_cols=self.stored_cols,
            analyzer_spec=self.analyzer_spec,
            exact_fields=self.exact_fields,
            numeric_fields=self.numeric_fields,
            index_features=self.index_features,
            text_fields=self.text_fields,
        )
        return pa.table({
            "name": pa.array([meta["name"]]),
            "meta_json": pa.array([json.dumps(meta)]),
        })


def _check_disjoint(metas: list[dict]) -> None:
    """Fail loud if a fresh build produced key-overlapping segments.

    Doc ids equal the global (conv_id, turn_idx) sort rank only when
    the key-sorted segments tile the key space; an overlap means the
    input partitions were not key-range-disjoint (pass ``sort=True``)
    or batch contiguity was broken. A silently mis-ranked index would
    corrupt every rank-identity comparison downstream.
    """
    ordered = sorted(metas, key=lambda m: tuple(m["first_key"]))
    for prev, cur in zip(ordered, ordered[1:]):
        if tuple(cur["first_key"]) <= tuple(prev["last_key"]):
            raise ValueError(
                "segments overlap on the sort key: "
                f"{prev['name']} ends at {tuple(prev['last_key'])} but "
                f"{cur['name']} starts at {tuple(cur['first_key'])} — "
                "input partitions are not key-range-disjoint; rebuild "
                "with sort=True (one explicit range-partitioning sort)"
            )


def build_index(
    source,
    index_dir: str,
    *,
    text_col: str = "text",
    key_cols: tuple = ("conv_id", "turn_idx"),
    stored_cols: tuple | None = None,
    analyzer: str = "segmentation",
    analyzer_options: dict | None = None,
    segment_docs: int = DEFAULT_SEGMENT_DOCS,
    concurrency: int | None = None,
    sort: bool = False,
    columns: list | None = None,
    exact_fields: tuple = (),
    numeric_fields: tuple = (),
    index_features: tuple = (),
    text_fields: tuple = (),
    base_segments: list | None = None,
    commit_every: int | None = None,
    commit: bool = True,
    preserve_order: bool = True,
) -> "Manifest | list[dict]":
    """Build a committed index under ``index_dir``.

    ``source`` is a ``ray.data.Dataset`` or a parquet path/list. Input
    partitions must be key-range-disjoint on ``key_cols`` for global doc
    ids to equal the global sort rank (pass ``sort=True`` otherwise —
    one explicit all-to-all, the only shuffle in the build).

    ``base_segments`` — pre-existing segment metas to include in every
    manifest commit (the ``IndexWriter.add`` path): the combined commit
    is the ONLY publish step, so a crash mid-build never leaves a
    manifest that drops the pre-existing segments.

    ``commit_every`` — commit an intermediate (fully consistent)
    manifest generation every N completed segments, so a long build is
    queryable/resumable before it finishes (the reference's rolling
    ``commit-period``, ``utils/index-put.cpp:513-560``). Summaries are
    consumed streaming either way.
    """
    import json
    import os

    os.makedirs(index_dir, exist_ok=True)
    if isinstance(source, (str, list)):
        cols = columns
        if cols is None:
            cols = None if stored_cols is None else sorted(
                {text_col, *key_cols, *(stored_cols or ()), *exact_fields,
                 *numeric_fields, *text_fields}
            )
        # size read blocks to the segment size (metadata-only row count):
        # otherwise many small input files yield ~2k-row blocks and
        # map_batches caps batches well below segment_docs, producing
        # far more (smaller) segments than asked for
        n_blocks = None
        try:
            import pyarrow.dataset as pads

            total = sum(
                f.count_rows() for f in pads.dataset(source).get_fragments()
            )
            n_blocks = max(1, -(-total // segment_docs))
        except Exception:
            pass
        ds = ray.data.read_parquet(source, columns=cols,
                                   override_num_blocks=n_blocks)
    else:
        ds = source
    if sort:
        ds = ds.sort(list(key_cols))

    if concurrency is None:
        # Leave CPUs for the read stage: reserving (nearly) all CPUs
        # starves the reads — input blocks then trickle into the pool
        # one at a time and dispatch clumps onto a few actors (measured
        # 3/31 actors utilized and 4x worse wall time at 32 CPUs).
        try:
            cpus = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            cpus = 4
        # ~5/8 of the CPUs for encoders measured fastest at 32 cpus
        # (20 actors: ~17s for 8M turns vs ~21s with 28 — beyond ~0.6x
        # the string-heavy encode contends with itself and the reads)
        concurrency = max(1, (cpus * 5) // 8) if cpus >= 16 else max(1, cpus // 2)
    encoder_kwargs = dict(
        index_dir=index_dir,
        analyzer=analyzer,
        analyzer_options=analyzer_options,
        text_col=text_col,
        key_cols=key_cols,
        stored_cols=stored_cols,
        exact_fields=exact_fields,
        numeric_fields=numeric_fields,
        index_features=index_features,
        text_fields=text_fields,
    )
    summaries = ds.map_batches(
        SegmentEncoder,
        fn_constructor_kwargs=encoder_kwargs,
        batch_format="pyarrow",
        batch_size=segment_docs,
        zero_copy_batch=True,
        concurrency=concurrency,
        num_cpus=1,
    )
    # Execution options must be set on the DATASET's captured context:
    # ExecutionPlan deep-copies DataContext.get_current() at dataset
    # creation, so mutating the global context here (the old code) only
    # affected datasets created LATER in the process — the first build
    # in a session silently ran with the defaults.
    dctx = summaries.context
    # spread work across the whole pool: with the default
    # max_tasks_in_flight(4) + locality preference, early actors hoard
    # queued batches while late actors never see work
    dctx.max_tasks_in_flight_per_actor = 1
    dctx.execution_options.actor_locality_enabled = False
    # CORRECTNESS, not a tuning knob: global doc ids are prefix sums
    # over key-sorted segments, which is the global sort rank ONLY if
    # every batch is a contiguous run of the globally ordered input.
    # With preserve_order=False (the default) each operator emits
    # blocks in task-COMPLETION order, so under load the encoder pool's
    # bundler can batch non-adjacent row ranges — producing overlapping
    # segments whose doc ids are not the global rank (observed: a
    # 256-row segment spanning conv-0..conv-64 while the next began at
    # conv-11). preserve_order makes every stage release blocks in
    # input order, so batch boundaries are deterministic and contiguous.
    # (``preserve_order=False`` exists ONLY for the benchmark's cost
    # A/B — an unordered build fails the disjointness check under load)
    dctx.execution_options.preserve_order = bool(preserve_order)
    base = [dict(s) for s in (base_segments or [])]

    def _combined(metas):
        # dedup by name (content-digest names: re-ingesting identical
        # data reuses the checkpointed segment, which may already be in
        # base); new metas win
        by_name = {m["name"]: m for m in base}
        by_name.update((m["name"], m) for m in metas)
        return [dict(m) for m in by_name.values()]

    # stream summaries (1 tiny row per segment) so rolling commits can
    # publish consistent intermediate generations while encoders run
    metas: list[dict] = []
    since_commit = 0
    for r in summaries.iter_rows():
        metas.append(json.loads(r["meta_json"]))
        since_commit += 1
        if commit and commit_every and since_commit >= commit_every:
            Manifest.commit(index_dir, _combined(metas))
            since_commit = 0
    if base_segments is None:
        _check_disjoint(metas)
    if not commit:
        # staged build (IndexWriter.Transaction): segments are on disk
        # (resumable via _SUCCESS markers) but NO manifest generation is
        # published — the transaction's own commit is the only publish
        return metas
    return Manifest.commit(index_dir, _combined(metas))
