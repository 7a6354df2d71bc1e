"""Sequence packing for LLM training batches — assign each document a
(bin, offset) in a stream of fixed-capacity token bins (the
concat-then-chunk strategy: documents are laid head-to-tail in a
deterministic order and a doc belongs to the bin where it STARTS).

No reference analogue (an indexing library stops at postings); this is
the training-data side of the same corpus.

Scale design: a global greedy pack is inherently sequential, so the
stream is range-partitioned on the key (``part = key // part_size``)
and packed independently per partition — parallel across partitions,
exact within, deterministic everywhere (bin ids are (part, local_bin),
so a resume or retry reproduces byte-identical assignments). One
``groupby(part).map_groups`` shuffle, vectorized cumsum inside.
"""
from __future__ import annotations

import numpy as np
import pandas as pd


def pack_sequences(ds, key_col: str, tokens_col: str,
                   capacity: int = 512, part_size: int = 1000):
    """Dataset[(key, n_tokens)] -> Dataset[(key, part, start_offset,
    bin_idx)]: documents sorted by key within each ``part`` are laid
    head-to-tail; ``start_offset`` is the running token offset and
    ``bin_idx = start_offset // capacity`` the bin where the doc
    starts."""

    def _pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(key_col, kind="mergesort")
        n = g[tokens_col].to_numpy(dtype=np.int64)
        start = np.cumsum(n) - n
        return pd.DataFrame({
            key_col: g[key_col].to_numpy(),
            "part": g["part"].to_numpy(),
            "start_offset": start,
            "bin_idx": start // np.int64(capacity),
        })

    def _add_part(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        batch["part"] = batch[key_col].to_numpy(dtype=np.int64) \
            // np.int64(part_size)
        return batch

    return (ds.map_batches(_add_part, batch_format="pandas")
              .groupby("part")
              .map_groups(_pack, batch_format="pandas"))
