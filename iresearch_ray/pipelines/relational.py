"""Broadcast semi / anti joins — the EXISTS / NOT EXISTS relational
primitives a curation pipeline uses to gate one table by another
(documents against a blocklist, customers against an activity table)
without ever shuffling the probe side.

Scale shape: pass 1 reduces the build side to its DISTINCT key set
with a per-batch ``np.unique`` combiner feeding one key-count-sized
``groupby`` (only batch-distinct keys cross the exchange); the sorted
key array is broadcast once with ``ray.put`` and every probe batch
filters itself with one ``searchsorted`` membership test — the probe
rows never shuffle, exactly the decontamination / stratified-sample
idiom. Assumption (documented, standard for broadcast joins): the
build side's distinct-key set fits one worker's heap. When it does
not, fall back to the co-partitioned form (tag + union + one shuffle
on the key, the ``windows.asof_join`` shape).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def distinct_keys(ds, key_col: str) -> np.ndarray:
    """Sorted int64 array of the dataset's distinct ``key_col`` values
    (per-batch unique combiner -> one tiny groupby -> driver)."""

    def pre(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return pa.table({key_col: np.unique(k.astype(np.int64))})

    t = ds.map_batches(pre, batch_format="pyarrow") \
        .groupby(key_col).count().to_pandas()
    return np.sort(t[key_col].to_numpy(dtype=np.int64))


def broadcast_semi_join(probe, build, probe_key: str, build_key: str,
                        anti: bool = False, concurrency=(1, 8)):
    """Rows of ``probe`` whose ``probe_key`` IS (semi) / IS NOT (anti)
    present among ``build``'s distinct ``build_key`` values — SQL
    ``WHERE [NOT] EXISTS (SELECT 1 FROM build WHERE key = probe.key)``.
    Keeps the probe schema unchanged."""
    import ray

    keys_ref = ray.put(distinct_keys(build, build_key))

    class _Member:
        def __init__(self):
            self.keys = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            v = batch.column(probe_key).to_numpy(
                zero_copy_only=False).astype(np.int64)
            pos = np.searchsorted(self.keys, v)
            pos[pos >= self.keys.size] = max(self.keys.size - 1, 0)
            hit = (self.keys[pos] == v) if self.keys.size else \
                np.zeros(v.size, dtype=bool)
            return batch.filter(pa.array(hit != anti))

    return probe.map_batches(_Member, batch_format="pyarrow",
                             concurrency=concurrency)
