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


def chunk_documents(ds, size: int, stride: int | None = None,
                    text_col: str = "text", id_col: str = "doc_id"):
    """Fixed-size character chunking with overlap (the RAG / context-
    window chunker; no reference analogue — an indexing library stops
    at whole-doc postings): each doc emits chunks
    ``text[i*stride : i*stride + size]`` for every start ``i*stride``
    strictly inside the text, so a doc of L chars yields
    ``ceil(L / stride)`` chunks and consecutive chunks overlap by
    ``size - stride`` chars. Empty docs emit nothing.

    -> Dataset[(id_col, chunk_idx, chunk)]

    Scale: embarrassingly parallel map_batches — no shuffle, output
    stays in input-partition order; the per-batch kernel loops over the
    CHUNK ORDINAL (bounded by the longest doc in the batch / stride),
    each iteration one vectorized ``utf8_slice_codeunits`` over the
    still-long docs, never over rows. Codepoint slicing matches SQL
    ``substr`` semantics (both count characters, not bytes)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if stride is None:
        stride = size
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")

    def _chunk(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col)
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        lens = pc.utf8_length(texts).to_numpy(zero_copy_only=False)
        out_ids, out_idx, out_chunks = [], [], []
        i = 0
        alive = np.arange(len(texts), dtype=np.int64)
        cur_texts, cur_ids = texts, ids
        while True:
            start = i * stride
            keep = lens[alive] > start
            if not keep.any():
                break
            if not keep.all():
                sel = np.flatnonzero(keep)
                cur_texts = cur_texts.take(pa.array(sel))
                cur_ids = cur_ids.take(pa.array(sel))
                alive = alive[keep]
            out_ids.append(cur_ids)
            out_idx.append(np.full(len(alive), i, dtype=np.int64))
            out_chunks.append(
                pc.utf8_slice_codeunits(cur_texts, start, start + size))
            i += 1
        if not out_ids:
            return pa.table({
                id_col: pa.array([], type=ids.type),
                "chunk_idx": pa.array([], type=pa.int64()),
                "chunk": pa.array([], type=pa.string()),
            })
        return pa.table({
            id_col: pa.concat_arrays([a.cast(ids.type) for a in out_ids]),
            "chunk_idx": pa.array(np.concatenate(out_idx)),
            "chunk": pa.concat_arrays(
                [c.cast(pa.string()) for c in out_chunks]),
        })

    return ds.map_batches(_chunk, batch_format="pyarrow")
