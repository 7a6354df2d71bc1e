"""Benchmark decontamination — drop / flag training documents that
share a word n-gram with an evaluation ("benchmark") set.

This is the standard LLM-training-data hygiene pass (GPT-3 appendix C
/ PaLM §7-style n-gram overlap decontamination; no analogue in the
reference engine, which stops at postings — this is the training-data
side of the same corpus).

Scale design: the benchmark side is an eval suite — a few MB even for
large benchmark collections — so its distinct n-gram set is collected
once, shipped to the object store with ``ray.put`` and read by every
marker actor in ``__init__`` (broadcast join, no shuffle). The
training side streams through a stateless ``map_batches`` with one
vectorized ``is_in`` per batch. If a benchmark set ever outgrew
broadcast size, the same gram tables feed a hash join on the gram
string (``Dataset.join``) — documented fallback, not needed at eval
scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from iresearch_ray.pipelines.textstats import word_ngrams


def collect_benchmark_grams(bench_ds, n: int = 8,
                            text_col: str = "text") -> pa.Array:
    """Distinct word n-grams of the benchmark set, as one pa.Array.

    Per-block distinct inside ``map_batches`` first so only deduped
    grams leave each block; the global dedup is bounded by the
    benchmark gram vocabulary (eval-suite-sized)."""

    def _grams(batch: pa.Table) -> pa.Table:
        g, _ = word_ngrams(batch, n, text_col)
        return pa.table({"gram": g.unique()})

    parts = bench_ds.map_batches(_grams, batch_format="pyarrow") \
        .take_all()
    if not parts:
        return pa.array([], type=pa.string())
    return pc.unique(pa.chunked_array(
        [pa.array([r["gram"] for r in parts], type=pa.string())]))


class ContaminationMarker:
    """Actor-pool stage: count per doc the DISTINCT n-grams shared
    with the broadcast benchmark gram set. ``grams`` may be a
    ``ray.ObjectRef`` (broadcast once, fetched per actor in
    ``__init__``) or a plain array for local use."""

    def __init__(self, grams, n: int = 8, text_col: str = "text",
                 id_col: str = "doc_id"):
        import ray

        if isinstance(grams, ray.ObjectRef):
            grams = ray.get(grams)
        self.value_set = pa.array(grams, type=pa.string())
        self.n, self.text_col, self.id_col = n, text_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, d = word_ngrams(batch, self.n, self.text_col)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        empty = pa.table({self.id_col: pa.array([], type=pa.int64()),
                          "n_shared": pa.array([], type=pa.int64())})
        if len(grams) == 0 or len(self.value_set) == 0:
            return empty
        hit = pc.is_in(grams, value_set=self.value_set) \
            .to_numpy(zero_copy_only=False)
        hit = np.asarray(hit, dtype=bool)
        if not hit.any():
            return empty
        # distinct shared grams per doc: dedupe (doc, gram-code) pairs
        codes = grams.filter(pa.array(hit)).dictionary_encode() \
            .indices.to_numpy(zero_copy_only=False).astype(np.int64)
        dh = d[hit]
        pairs = np.unique(np.stack([dh, codes], axis=1), axis=0)
        n_shared = np.bincount(pairs[:, 0], minlength=len(batch))
        docs = np.flatnonzero(n_shared)
        return pa.table({
            self.id_col: pa.array(ids[docs].astype(np.int64)),
            "n_shared": pa.array(n_shared[docs].astype(np.int64)),
        })


def contamination_report(ds, bench_grams, n: int = 8,
                         text_col: str = "text", id_col: str = "doc_id",
                         concurrency=None):
    """Dataset[(id, n_shared)] for every training doc sharing >= 1
    word n-gram with the benchmark gram set (an ``ObjectRef`` or
    array from :func:`collect_benchmark_grams`)."""
    concurrency = _auto_concurrency(concurrency)
    return ds.map_batches(
        ContaminationMarker, batch_format="pyarrow",
        concurrency=concurrency,
        fn_constructor_kwargs={"grams": bench_grams, "n": n,
                               "text_col": text_col, "id_col": id_col})


def _auto_concurrency(concurrency):
    """None -> elastic pool up to (session CPUs - 2): the marker stage
    does the pipeline's heavy tokenization, so a small fixed pool (the
    old default 4) starves a 32-cpu session while an all-CPU pool
    starves the upstream read — leave two CPUs for reads/reduces."""
    if concurrency is not None:
        return concurrency
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    return (1, max(2, cpus - 2))


def decontaminate(ds, bench_ds, n: int = 8, text_col: str = "text",
                  id_col: str = "doc_id", concurrency=None):
    """Return ``ds`` minus every document sharing a word n-gram with
    ``bench_ds`` (broadcast anti-join: one ``is_in`` per batch)."""
    import ray

    concurrency = _auto_concurrency(concurrency)
    grams_ref = ray.put(collect_benchmark_grams(bench_ds, n, text_col))

    class _Filter(ContaminationMarker):
        def __call__(self, batch: pa.Table) -> pa.Table:
            grams, d = word_ngrams(batch, self.n, self.text_col)
            if len(grams) == 0 or len(self.value_set) == 0:
                return batch
            hit = pc.is_in(grams, value_set=self.value_set) \
                .to_numpy(zero_copy_only=False)
            hit = np.asarray(hit, dtype=bool)
            bad = np.zeros(len(batch), dtype=bool)
            bad[d[hit]] = True
            return batch.filter(pa.array(~bad))

    return ds.map_batches(
        _Filter, batch_format="pyarrow", concurrency=concurrency,
        fn_constructor_kwargs={"grams": grams_ref, "n": n,
                               "text_col": text_col, "id_col": id_col})
