"""Segment encode/decode: postings inversion + compressed posting lists.

A *segment* is the self-contained immutable sub-index of the reference
(``README.md:54-70``): here it is one directory of Parquet files

    terms.parquet   term dict + compressed postings + skip/block-max meta
                    (rows byte-sorted by term — replaces the burst-trie/FST
                    term dictionary, ``core/formats/formats_burst_trie.cpp``)
    norms.parquet   per-doc token count (Norm2 doc length,
                    ``core/index/norm.hpp:128-167``)
    docmap.parquet  stored columns (columnstore analogue), row i = doc i+1
    meta.json       segment meta + lineage/throughput metrics

Doc ids are segment-local, 1-based, assigned in ``(conv_id, turn_idx)``
order within the partition (``core/index/segment_writer.hpp:159-162``).

Inversion (``field_data::invert``, ``core/index/field_data.cpp:985-1080``)
is done columnar: explode -> dictionary-encode -> lexsort -> run-length,
with ONE flat vectorized varint pass for every term with df < 128 and
bitpacked 128-doc blocks (+ varint tail) for larger terms.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from iresearch_ray.analysis.analyzers import Analyzer, KeywordAnalyzer
from iresearch_ray.index.numeric import numeric_terms
from iresearch_ray.index.codec import (
    BLOCK_SIZE,
    bitpack_blocks_flat,
    bitunpack_block,
    delta_encode_lists,
    encode_lists_varint,
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)

FORMAT_VERSION = 3  # v2: multi-field term dictionary (field column)
# v3: position streams are blocked (128-value bitpacked chunks + varint
# tail, ``pos_chunk_off``/``block_pos_val`` columns) like doc/freq; v2
# segments (flat-varint ``block_pos_off``) remain readable — readers
# branch on column presence.
SUCCESS_MARKER = "_SUCCESS"


def _write_norms_npz(norms_table: pa.Table, out_dir: str) -> None:
    """Sidecar ``norms.npz`` next to norms.parquet: ``np.load`` costs
    ~0.1ms vs ~1.3ms of parquet footer parse per file, and the first
    scored query touches EVERY segment's norms — at 300 segments that
    parse alone was ~0.4s of cold-query latency. Parquet stays the
    canonical (portable) form; readers fall back to it when the
    sidecar is absent (older segments)."""
    import numpy as _np

    arrays = {
        name: norms_table.column(name).to_numpy(zero_copy_only=False)
        .astype(_np.float32)
        for name in norms_table.column_names
    }
    _np.savez(os.path.join(out_dir, "norms.npz"), **arrays)


# ---------------------------------------------------------------------------
# inversion
# ---------------------------------------------------------------------------


def invert_batch(
    texts: pa.Array, analyzer: Analyzer,
    offsets: bool = False, payloads: bool = False,
) -> dict:
    """Invert one batch of texts into grouped postings arrays.

    Returns a dict with (all numpy unless noted):
      vocab         pa.StringArray, byte-sorted unique terms
      term_starts   index into runs of each term's first run (len=V)
      run_doc       0-based doc ordinal per (term, doc) run
      run_tf        term frequency per run
      pos_sorted    flat positions, grouped by (term, doc), ascending
      run_starts    index into pos_sorted of each run's first position
      doc_len       tokens per doc (len = n_docs)

    With ``offsets`` (OFFS index feature) the dict also carries
    ``offs_start_sorted`` / ``offs_len_sorted`` (char span per
    occurrence, aligned with ``pos_sorted``); with ``payloads`` (PAY) it
    carries ``pay_sorted`` (uint64 per occurrence). Both require the
    analyzer to implement the corresponding tokenize variant.
    """
    n_docs = len(texts)
    extras: dict[str, np.ndarray] = {}
    if offsets and payloads:
        # both occurrence streams on one field — the reference keeps
        # offsets and payloads in the same .pay stream
        # (core/formats/formats_10.cpp:326-333); here they stay two
        # independent flat-varint streams sharing the position skip
        doc_idx, terms, pos, start, end, pays = \
            analyzer.tokenize_offsets_payloads(texts)
        extras["offs_start"] = start.astype(np.int32, copy=False)
        extras["offs_len"] = (end - start).astype(np.int32, copy=False)
        extras["pay"] = pays.astype(np.int64)
    elif offsets:
        doc_idx, terms, pos, start, end = analyzer.tokenize_offsets(texts)
        extras["offs_start"] = start.astype(np.int32, copy=False)
        extras["offs_len"] = (end - start).astype(np.int32, copy=False)
    elif payloads:
        doc_idx, terms, pos, pays = analyzer.tokenize_payloads(texts)
        extras["pay"] = pays.astype(np.int64)
    else:
        doc_idx, terms, pos = analyzer.tokenize(texts)
    return invert_tokens(doc_idx, terms, pos, n_docs, extras=extras or None)


def invert_tokens(
    doc_idx: np.ndarray, terms: pa.Array, pos: np.ndarray, n_docs: int,
    extras: dict | None = None,
) -> dict:
    """Invert an exploded (doc_idx, term, pos) token table (the shared
    core of text fields, keyword fields and numeric-trie fields).
    ``extras`` are per-token arrays permuted alongside positions and
    returned as ``<name>_sorted`` (offset spans, payloads)."""
    doc_len = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    if doc_idx.size == 0:
        return {
            "vocab": pa.array([], type=pa.string()),
            "term_starts": np.empty(0, np.int64),
            "run_doc": np.empty(0, np.int64),
            "run_tf": np.empty(0, np.int64),
            "pos_sorted": np.empty(0, np.int64),
            "run_starts": np.empty(0, np.int64),
            "doc_len": doc_len,
            **{f"{k}_sorted": np.empty(0, np.int64)
               for k in (extras or {})},
        }
    dict_arr = pc.dictionary_encode(terms)
    if isinstance(dict_arr, pa.ChunkedArray):
        dict_arr = dict_arr.combine_chunks()
    # keep Arrow's native int32 dictionary codes: the stable sort and
    # the (code, doc, pos) gathers below are the memory-traffic peak of
    # the build, and int32 halves it
    codes = dict_arr.indices.to_numpy(zero_copy_only=False)
    vocab = dict_arr.dictionary
    # byte-sorted term order (reference flushes terms in byte order:
    # core/index/field_data.cpp get_sorted_postings)
    sort_idx = pc.sort_indices(vocab).to_numpy(zero_copy_only=False).astype(np.int64)
    rank = np.empty(len(vocab), dtype=np.int32)
    rank[sort_idx] = np.arange(len(vocab), dtype=np.int32)
    codes = rank[codes]
    vocab_sorted = vocab.take(pa.array(sort_idx))
    # tokens arrive doc-major with ascending positions, so ONE stable
    # sort by term code yields (code, doc, pos) order — a 3-key lexsort
    # would redo work the tokenizer already guarantees
    order = np.argsort(codes, kind="stable")
    c, d, p = codes[order], doc_idx[order], pos[order]
    new_run = np.empty(c.size, dtype=bool)
    new_run[0] = True
    new_run[1:] = (c[1:] != c[:-1]) | (d[1:] != d[:-1])
    run_starts = np.flatnonzero(new_run)
    run_tf = np.diff(np.append(run_starts, c.size))
    run_code = c[run_starts]
    run_doc = d[run_starts]
    term_change = np.empty(run_code.size, dtype=bool)
    term_change[0] = True
    term_change[1:] = run_code[1:] != run_code[:-1]
    term_starts = np.flatnonzero(term_change)
    return {
        "vocab": vocab_sorted,
        "term_starts": term_starts,
        "run_doc": run_doc,
        "run_tf": run_tf,
        "pos_sorted": p,
        "run_starts": run_starts,
        "doc_len": doc_len,
        **{f"{k}_sorted": v[order] for k, v in (extras or {}).items()},
    }


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def encode_postings_table(inv: dict, with_offsets: bool | None = None,
                          with_payloads: bool | None = None) -> pa.Table:
    """Encode inverted runs into the terms.parquet table — fully
    vectorized: NO per-term Python loop. Python runs once per distinct
    bit width (block packing) and over ~3 slices per LARGE term when
    assembling the value buffers; everything else is numpy scatter /
    reduceat / cumsum passes over the whole field.

    Per-term layout (mirrors the .doc/.pos file split of the reference,
    ``core/formats/formats_10.cpp:326-333``):
      doc_blob   full 128-blocks of bitpacked doc-deltas, then varint tail
      freq_blob  same block structure over raw tf values
      pos_blob   varint position-deltas, contiguous per (doc) run
      block_*    per-block skip + WAND metadata (last doc id, byte
                 offsets, max tf, min doc length)

    Key trick: the single flat varint pass covers EVERY term's deltas;
    small (df<128) terms slice it whole, and large terms' varint TAILS
    are byte-slices of the same blob (per-value varint bytes are
    independent) — so no separate tail encode exists at all.

    OFFS/PAY (``with_offsets`` / ``with_payloads``, auto-detected from
    the inv dict; pass True to force empty columns for schema
    consistency across a segment's fields): per-occurrence streams in
    the position-blob layout — offsets as interleaved
    ``(start_delta, length)`` varint pairs (the reference ``.pay`` file
    offset encoding, ``core/index/field_data.cpp:64-74``), payloads as
    one varint per occurrence — each with a ``block_*_off`` skip list
    so block-restricted decode works like positions.
    """
    if with_offsets is None:
        with_offsets = "offs_start_sorted" in inv
    if with_payloads is None:
        with_payloads = "pay_sorted" in inv
    vocab = inv["vocab"]
    term_starts = inv["term_starts"]
    run_doc = inv["run_doc"]
    run_tf = inv["run_tf"].astype(np.int64, copy=False)
    doc_len = inv["doc_len"]
    n_terms = len(vocab)
    n_runs = run_doc.size
    df = np.diff(np.append(term_starts, n_runs)) if n_terms else np.empty(0, np.int64)

    def _bin_col(offsets: np.ndarray, data: np.ndarray) -> pa.Array:
        return pa.Array.from_buffers(
            pa.binary(), n_terms,
            [None, pa.py_buffer(offsets.astype(np.int32)),
             pa.py_buffer(np.ascontiguousarray(data))])

    def _list_col(counts: np.ndarray, values: np.ndarray) -> pa.Array:
        offs = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
        return pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()),
            pa.array(values, type=pa.int64()))

    if n_terms == 0:
        e8 = np.empty(0, np.uint8)
        ei = np.empty(0, np.int64)
        z = np.zeros(1, np.int64)
        cols = {
            "term": vocab,
            "doc_freq": pa.array(ei), "total_tf": pa.array(ei),
            "doc_blob": _bin_col(z[:1], e8), "freq_blob": _bin_col(z[:1], e8),
            "pos_blob": _bin_col(z[:1], e8),
            "block_last_doc": _list_col(ei, ei),
            "block_doc_off": _list_col(ei, ei),
            "block_freq_off": _list_col(ei, ei),
            "pos_chunk_off": _list_col(ei, ei),
            "block_pos_val": _list_col(ei, ei),
            "block_max_tf": _list_col(ei, ei),
            "block_min_dl": _list_col(ei, ei),
        }
        if with_offsets:
            cols["offs_blob"] = _bin_col(z[:1], e8)
            cols["block_offs_off"] = _list_col(ei, ei)
        if with_payloads:
            cols["pay_blob"] = _bin_col(z[:1], e8)
            cols["block_pay_off"] = _list_col(ei, ei)
        return pa.table(cols)

    # --- positions (format v3): the SAME blocked-stream structure as
    # doc/freq — full 128-VALUE bitpacked chunks + varint tail per term
    # (``pos_chunk_off`` byte offsets per chunk incl. the tail entry),
    # plus ``block_pos_val``: the position-VALUE index at each DOC
    # block's first run, for block-restricted decode. v2 stored the
    # whole stream as flat varint; its decode dominated cold phrase /
    # n-gram queries and the merge read path.
    pos_deltas = delta_encode_lists(inv["pos_sorted"], inv["run_starts"])
    pv = np.concatenate(([0], np.cumsum(run_tf)))  # value idx per run
    pv_ts = pv[term_starts]                        # term value starts
    pv_te = pv[np.append(term_starts[1:], n_runs)]
    p_nbytes = varint_byte_lengths(pos_deltas)
    pos_cum = np.concatenate(([0], np.cumsum(p_nbytes)))
    pos_varint = np.frombuffer(varint_encode(pos_deltas, p_nbytes),
                               dtype=np.uint8)

    # --- OFFS / PAY occurrence streams: same flat-varint layout as
    # positions (run-aligned byte starts -> per-term slices + per-block
    # skip entries). A field that lacks the stream but must keep the
    # column (schema uniformity across fields, see encode_field_tables)
    # gets zero-length blobs.
    extras: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    if with_offsets:
        if "offs_start_sorted" in inv and inv["offs_start_sorted"].size:
            sd = delta_encode_lists(inv["offs_start_sorted"],
                                    inv["run_starts"])
            inter = np.empty(2 * sd.size, np.int64)
            inter[0::2] = sd  # start deltas ascend within a run
            inter[1::2] = inv["offs_len_sorted"]
            blob, rbs = encode_lists_varint(
                inter, 2 * inv["run_starts"].astype(np.int64), run_tf * 2)
            extras["offs"] = (np.frombuffer(blob, dtype=np.uint8), rbs)
        else:
            extras["offs"] = (np.empty(0, np.uint8),
                              np.zeros(n_runs, np.int64))
    if with_payloads:
        if "pay_sorted" in inv and inv["pay_sorted"].size:
            blob, rbs = encode_lists_varint(
                inv["pay_sorted"].astype(np.int64), inv["run_starts"],
                run_tf)
            extras["pay"] = (np.frombuffer(blob, dtype=np.uint8), rbs)
        else:
            extras["pay"] = (np.empty(0, np.uint8),
                             np.zeros(n_runs, np.int64))

    # --- doc deltas + freqs: ONE flat varint pass each, with per-VALUE
    # byte offsets so any value range can be sliced later
    local_doc = run_doc + 1  # 1-based local doc ids
    doc_deltas = delta_encode_lists(local_doc, term_starts)
    d_nbytes = varint_byte_lengths(doc_deltas)
    d_cum = np.concatenate(([0], np.cumsum(d_nbytes)))
    doc_blob_all = np.frombuffer(varint_encode(doc_deltas, d_nbytes),
                                 dtype=np.uint8)
    f_nbytes = varint_byte_lengths(run_tf)
    f_cum = np.concatenate(([0], np.cumsum(f_nbytes)))
    freq_blob_all = np.frombuffer(varint_encode(run_tf, f_nbytes),
                                  dtype=np.uint8)

    run_dl = doc_len[run_doc]  # doc length per run (for block min-dl)
    total_tf = np.add.reduceat(run_tf, term_starts).astype(np.int64)
    term_max_tf = np.maximum.reduceat(run_tf, term_starts)
    term_min_dl = np.minimum.reduceat(run_dl, term_starts)
    term_ends = np.append(term_starts[1:], n_runs)
    term_last_doc = local_doc[term_ends - 1]

    small = df < BLOCK_SIZE
    large = np.flatnonzero(~small)
    L = large.size

    if L:
        full = (df[large] // BLOCK_SIZE).astype(np.int64)   # blocks/term
        cut = full * BLOCK_SIZE
        tail_n = df[large] - cut
        has_tail = tail_n > 0
        B = int(full.sum())
        # gather ALL full-block values term-major -> (B, 128)
        blk_out0 = np.concatenate(([0], np.cumsum(cut)[:-1]))
        gidx = np.repeat(term_starts[large] - blk_out0, cut) \
            + np.arange(int(cut.sum()))
        d_vals = doc_deltas[gidx].reshape(B, BLOCK_SIZE)
        f_vals = run_tf[gidx].reshape(B, BLOCK_SIZE)
        dl_vals = run_dl[gidx].reshape(B, BLOCK_SIZE)
        ld_vals = local_doc[gidx].reshape(B, BLOCK_SIZE)
        d_packed, d_blk_lens = bitpack_blocks_flat(d_vals)
        f_packed, f_blk_lens = bitpack_blocks_flat(f_vals)
        d_pk_starts = np.concatenate(([0], np.cumsum(d_blk_lens)))
        f_pk_starts = np.concatenate(([0], np.cumsum(f_blk_lens)))
        # per-term packed-block byte ranges (term-major contiguous)
        blk_of_term0 = np.concatenate(([0], np.cumsum(full)[:-1]))
        d_term_pk = d_pk_starts[blk_of_term0]
        f_term_pk = f_pk_starts[blk_of_term0]
        d_term_pk_len = d_pk_starts[np.concatenate((blk_of_term0[1:], [B]))] - d_term_pk
        f_term_pk_len = f_pk_starts[np.concatenate((blk_of_term0[1:], [B]))] - f_term_pk
        # varint tail byte ranges (slices of the FLAT blobs)
        tail_v0 = term_starts[large] + cut      # first tail value index
        tail_v1 = term_starts[large] + df[large]
        d_tail_s, d_tail_e = d_cum[tail_v0], d_cum[tail_v1]
        f_tail_s, f_tail_e = f_cum[tail_v0], f_cum[tail_v1]
        # tail metadata via reduceat over tail value ranges
        t_last = term_last_doc[large]
        t_mtf = np.zeros(L, np.int64)
        t_mdl = np.zeros(L, np.int64)
        ht = np.flatnonzero(has_tail)
        if ht.size:
            # tails are sparse value ranges; reduce each explicitly
            # (one tiny numpy reduce per LARGE term with a tail)
            t_mtf[ht] = np.array([run_tf[a:b].max() for a, b in
                                  zip(tail_v0[ht], tail_v1[ht])])
            t_mdl[ht] = np.array([run_dl[a:b].min() for a, b in
                                  zip(tail_v0[ht], tail_v1[ht])])
    else:
        full = cut = tail_n = np.empty(0, np.int64)
        has_tail = np.empty(0, bool)
        B = 0

    # --- position chunking (independent of the doc-block split: a
    # low-df high-tf term still gets chunks, and every df>=128 term is
    # automatically pos-large since nvals >= df)
    nvals = pv_te - pv_ts  # == total_tf
    p_small = nvals < BLOCK_SIZE
    p_large = np.flatnonzero(~p_small)
    Lp = p_large.size
    if Lp:
        p_full = (nvals[p_large] // BLOCK_SIZE).astype(np.int64)
        p_cut = p_full * BLOCK_SIZE
        p_tail_n = nvals[p_large] - p_cut
        p_has_tail = p_tail_n > 0
        Bp = int(p_full.sum())
        chunk_out0 = np.concatenate(([0], np.cumsum(p_cut)[:-1]))
        pgidx = np.repeat(pv_ts[p_large] - chunk_out0, p_cut) \
            + np.arange(int(p_cut.sum()))
        p_packed, p_chunk_lens = bitpack_blocks_flat(
            pos_deltas[pgidx].reshape(Bp, BLOCK_SIZE))
        p_pk_starts = np.concatenate(([0], np.cumsum(p_chunk_lens)))
        chunk_of_term0 = np.concatenate(([0], np.cumsum(p_full)[:-1]))
        p_term_pk = p_pk_starts[chunk_of_term0]
        p_term_pk_len = p_pk_starts[
            np.concatenate((chunk_of_term0[1:], [Bp]))] - p_term_pk
        p_tail_v0 = pv_ts[p_large] + p_cut
        p_tail_v1 = pv_ts[p_large] + nvals[p_large]
        p_tail_s, p_tail_e = pos_cum[p_tail_v0], pos_cum[p_tail_v1]
    else:
        p_full = p_cut = p_tail_n = np.empty(0, np.int64)
        p_has_tail = np.empty(0, bool)
        Bp = 0

    # --- per-term blob lengths + value-buffer assembly
    d_small_len = d_cum[term_ends] - d_cum[term_starts]
    f_small_len = f_cum[term_ends] - f_cum[term_starts]
    d_len = d_small_len.copy()
    f_len = f_small_len.copy()
    if L:
        d_len[large] = d_term_pk_len + (d_tail_e - d_tail_s)
        f_len[large] = f_term_pk_len + (f_tail_e - f_tail_s)
    d_offsets = np.concatenate(([0], np.cumsum(d_len)))
    f_offsets = np.concatenate(([0], np.cumsum(f_len)))
    p_len = pos_cum[pv_te] - pos_cum[pv_ts]
    if Lp:
        p_len[p_large] = p_term_pk_len + (p_tail_e - p_tail_s)
    pos_offsets = np.concatenate(([0], np.cumsum(p_len)))

    def assemble(flat, term_byte_bounds, large_arr, packed, term_pk,
                 term_pk_len, tail_s, tail_e):
        """Value buffer in dictionary order: contiguous runs of small
        terms are single slices of the flat varint blob; each large term
        contributes [packed blocks][varint tail] (<= 3 slices per large
        term, concatenated once in C). ``term_byte_bounds`` is the
        (n_terms+1,) per-term byte range in the flat varint blob."""
        nl = large_arr.size
        if not nl:
            return flat[: int(term_byte_bounds[-1])]
        pieces = []
        prev = 0  # term boundary of the pending small run
        for k in range(nl):
            t = large_arr[k]
            if t > prev:
                pieces.append(flat[term_byte_bounds[prev]:
                                   term_byte_bounds[t]])
            pieces.append(packed[term_pk[k]: term_pk[k] + term_pk_len[k]])
            if tail_e[k] > tail_s[k]:
                pieces.append(flat[tail_s[k]: tail_e[k]])
            prev = t + 1
        if prev < n_terms:
            pieces.append(flat[term_byte_bounds[prev]:
                               term_byte_bounds[-1]])
        return np.concatenate(pieces) if pieces else flat[:0]

    d_bounds = d_cum[np.append(term_starts, n_runs)]
    f_bounds = f_cum[np.append(term_starts, n_runs)]
    p_bounds = pos_cum[np.append(pv_ts, pos_deltas.size)]
    doc_data = assemble(doc_blob_all, d_bounds, large, d_packed,
                        d_term_pk, d_term_pk_len, d_tail_s, d_tail_e) \
        if L else doc_blob_all
    freq_data = assemble(freq_blob_all, f_bounds, large, f_packed,
                         f_term_pk, f_term_pk_len, f_tail_s, f_tail_e) \
        if L else freq_blob_all
    pos_data = assemble(pos_varint, p_bounds, p_large, p_packed,
                        p_term_pk, p_term_pk_len, p_tail_s, p_tail_e) \
        if Lp else pos_varint

    # --- block metadata (list<int64> columns), vectorized scatter
    n_blocks_per_term = np.ones(n_terms, dtype=np.int64)
    if L:
        n_blocks_per_term[large] = full + has_tail.astype(np.int64)
    meta_off = np.concatenate(([0], np.cumsum(n_blocks_per_term)))
    total_meta = int(meta_off[-1])

    last_v = np.empty(total_meta, np.int64)
    mtf_v = np.empty(total_meta, np.int64)
    mdl_v = np.empty(total_meta, np.int64)
    doff_v = np.zeros(total_meta, np.int64)
    foff_v = np.zeros(total_meta, np.int64)
    pval_v = np.zeros(total_meta, np.int64)
    xoff_v = {nm: np.zeros(total_meta, np.int64) for nm in extras}
    # small terms: one entry each
    sm = np.flatnonzero(small)
    sm_pos = meta_off[sm]
    last_v[sm_pos] = term_last_doc[sm]
    mtf_v[sm_pos] = term_max_tf[sm]
    mdl_v[sm_pos] = term_min_dl[sm]
    if L:
        # destinations of each large term's FULL blocks
        dest0 = meta_off[large]
        blk_dest = np.repeat(dest0 - blk_of_term0, full) + np.arange(B)
        last_v[blk_dest] = ld_vals[:, -1]
        mtf_v[blk_dest] = f_vals.max(axis=1)
        mdl_v[blk_dest] = dl_vals.min(axis=1)
        # per-term block byte offsets: cumsum-with-reset over block lens
        d_in = d_pk_starts[:-1] - np.repeat(d_pk_starts[blk_of_term0], full)
        f_in = f_pk_starts[:-1] - np.repeat(f_pk_starts[blk_of_term0], full)
        doff_v[blk_dest] = d_in
        foff_v[blk_dest] = f_in
        # position-VALUE index of each block's first run, relative to
        # the term: block j of term k starts at run term_starts[k]+j*128
        intra = np.arange(B) - np.repeat(blk_of_term0, full)
        blk_run_idx = np.repeat(term_starts[large], full) + intra * BLOCK_SIZE
        pval_v[blk_dest] = pv[blk_run_idx] - np.repeat(pv_ts[large], full)
        for nm, (_xblob, xrbs) in extras.items():
            xoff_v[nm][blk_dest] = xrbs[blk_run_idx] \
                - np.repeat(xrbs[term_starts][large], full)
        # tail entries
        if ht.size:
            tl = large[ht]
            tail_dest = meta_off[tl] + full[ht]
            last_v[tail_dest] = t_last[ht]
            mtf_v[tail_dest] = t_mtf[ht]
            mdl_v[tail_dest] = t_mdl[ht]
            doff_v[tail_dest] = d_term_pk_len[ht]
            foff_v[tail_dest] = f_term_pk_len[ht]
            pval_v[tail_dest] = pv[tail_v0[ht]] - pv_ts[tl]
            for nm, (_xblob, xrbs) in extras.items():
                xoff_v[nm][tail_dest] = xrbs[tail_v0[ht]] \
                    - xrbs[term_starts][tl]

    # --- pos chunk byte-offset list (per 128-value chunk, + tail entry)
    n_chunks_per_term = np.ones(n_terms, dtype=np.int64)
    if Lp:
        n_chunks_per_term[p_large] = p_full + p_has_tail.astype(np.int64)
    chunk_meta_off = np.concatenate(([0], np.cumsum(n_chunks_per_term)))
    pchunk_v = np.zeros(int(chunk_meta_off[-1]), np.int64)
    if Lp:
        p_in = p_pk_starts[:-1] - np.repeat(p_pk_starts[chunk_of_term0],
                                            p_full)
        pchunk_dest = np.repeat(chunk_meta_off[p_large] - chunk_of_term0,
                                p_full) + np.arange(Bp)
        pchunk_v[pchunk_dest] = p_in
        pht = np.flatnonzero(p_has_tail)
        if pht.size:
            pchunk_v[chunk_meta_off[p_large[pht]] + p_full[pht]] = \
                p_term_pk_len[pht]

    cols = {
        "term": vocab,
        "doc_freq": pa.array(df, type=pa.int64()),
        "total_tf": pa.array(total_tf, type=pa.int64()),
        "doc_blob": _bin_col(d_offsets, doc_data),
        "freq_blob": _bin_col(f_offsets, freq_data),
        "pos_blob": _bin_col(pos_offsets, pos_data),
        "block_last_doc": _list_col(n_blocks_per_term, last_v),
        "block_doc_off": _list_col(n_blocks_per_term, doff_v),
        "block_freq_off": _list_col(n_blocks_per_term, foff_v),
        "pos_chunk_off": _list_col(n_chunks_per_term, pchunk_v),
        "block_pos_val": _list_col(n_blocks_per_term, pval_v),
        "block_max_tf": _list_col(n_blocks_per_term, mtf_v),
        "block_min_dl": _list_col(n_blocks_per_term, mdl_v),
    }
    for nm, (xblob, xrbs) in extras.items():
        ts_x = xrbs[term_starts]
        cols[f"{nm}_blob"] = _bin_col(np.append(ts_x, xblob.size), xblob)
        cols[f"block_{nm}_off"] = _list_col(n_blocks_per_term, xoff_v[nm])
    return pa.table(cols)


def segment_name(first_key: tuple, docs_count: int,
                 content_digest: str | None = None) -> str:
    h = hashlib.sha1(repr(first_key).encode()).hexdigest()[:12]
    if content_digest:
        return f"seg-{h}-{docs_count}-{content_digest}"
    return f"seg-{h}-{docs_count}"


def content_digest(batch: pa.Table, cols: tuple) -> str:
    """Deterministic digest over the raw Arrow buffers of ``cols``.

    Folded into the segment name so the ``_SUCCESS`` checkpoint is keyed
    by *content*, not just (first_key, row_count): re-ingesting changed
    data that happens to share a partition's first key and row count gets
    a fresh segment instead of silently reusing the stale one. Buffer
    hashing is memcpy-speed (no per-row work); the batch must already be
    sorted/combined so buffer layout is deterministic.
    """
    h = hashlib.sha1()
    for col in cols:
        if col not in batch.column_names:
            continue
        arr = batch.column(col)
        chunks = arr.chunks if isinstance(arr, pa.ChunkedArray) else [arr]
        for chunk in chunks:
            if chunk.offset:  # re-materialize sliced arrays for stable buffers
                chunk = pa.concat_arrays([chunk])
            for buf in chunk.buffers():
                if buf is not None:
                    h.update(buf)
    return h.hexdigest()[:10]


def write_terms_parquet(terms_table: pa.Table, path: str) -> None:
    """Write the terms table with the posting/position blobs stored
    PLAIN and uncompressed: delta+varint/bitpack IS the codec — snappy
    measures ~1.0 ratio on doc/pos blobs (the reference likewise writes
    raw block-coded .doc/.pos) and its decompress copy dominated cold
    point reads (measured 4.8 -> 3.3 ms per 3-term lookup). freq/offs/
    pay blobs and the metadata columns keep snappy (tfs compress ~2x)."""
    raw = [c for c in ("doc_blob", "pos_blob") if c in terms_table.column_names]
    comp = {c: ("NONE" if c in raw else "SNAPPY")
            for c in terms_table.column_names}
    pq.write_table(
        terms_table, path, row_group_size=1024, compression=comp,
        use_dictionary=[c for c in terms_table.column_names
                        if not c.endswith("_blob")])


def encode_field_tables(
    field_invs: list[tuple[str, dict]]
) -> tuple[pa.Table, pa.Table, dict]:
    """Encode per-field inverted structures (sorted by field name) into
    the combined terms table (with a leading ``field`` column, rows
    sorted by (field, term)), the norms table (one ``len_<field>``
    column per field) and the per-field meta dict."""
    tables = []
    norm_cols = {}
    fields_meta = {}
    row = 0
    # fields concat into ONE terms table -> schema must be uniform: if
    # any field carries OFFS/PAY streams, every field gets the columns
    # (zero-length blobs where absent)
    want_offs = any("offs_start_sorted" in inv for _, inv in field_invs)
    want_pay = any("pay_sorted" in inv for _, inv in field_invs)
    for fname, inv in sorted(field_invs, key=lambda kv: kv[0]):
        t = encode_postings_table(inv, with_offsets=want_offs,
                                  with_payloads=want_pay)
        t = t.add_column(0, "field", pa.array([fname] * t.num_rows, type=pa.string()))
        tables.append(t)
        doc_len = inv["doc_len"]
        norm_cols[f"len_{fname}"] = pa.array(doc_len, type=pa.int32())
        fields_meta[fname] = {
            "row_start": row,
            "row_end": row + t.num_rows,
            "docs_with_field": int((doc_len > 0).sum()),
            "sum_doc_len": int(doc_len.sum()),
        }
        row += t.num_rows
    terms_table = pa.concat_tables(tables) if tables else None
    norms_table = pa.table(norm_cols) if norm_cols else pa.table({})
    return terms_table, norms_table, fields_meta


def write_segment(
    index_dir: str,
    batch: pa.Table,
    analyzer: Analyzer,
    *,
    text_col: str = "text",
    key_cols: tuple = ("conv_id", "turn_idx"),
    stored_cols: tuple | None = None,
    analyzer_spec: dict | None = None,
    exact_fields: tuple = (),
    numeric_fields: tuple = (),
    index_features: tuple = (),
    text_fields: tuple = (),
) -> dict:
    """Encode one input partition into a committed segment directory.

    ``text_col`` is the analyzed TextField (FREQ|POS|Norm2);
    ``exact_fields`` are indexed as single-term StringFields via the
    keyword analyzer (the reference field-kind split,
    ``utils/index-put.cpp:190-258``). The write is atomic (temp dir +
    rename) and idempotent: an existing ``_SUCCESS`` marker skips the
    encode — the per-partition checkpoint that makes builds resumable.

    ``index_features``: optional per-occurrence streams for the text
    field — ``"offs"`` stores character spans (the reference OFFS index
    feature / ``offset`` attribute), ``"pay"`` stores analyzer-supplied
    uint payloads (PAY / ``payload``); both mirror the parallel ``.pay``
    file of ``core/formats/formats_10.cpp:326-333``.
    """
    t0 = time.time()
    # stable in-partition doc order (primary sort, reference
    # core/index/segment_writer.cpp:241-256)
    sort_keys = [(k, "ascending") for k in key_cols if k in batch.column_names]
    if sort_keys:
        batch = batch.sort_by(sort_keys)
    n = batch.num_rows
    first_key = tuple(batch.column(k)[0].as_py() for k, _ in sort_keys) if sort_keys and n else ("", 0)
    last_key = tuple(batch.column(k)[n - 1].as_py() for k, _ in sort_keys) if sort_keys and n else ("", 0)
    digest_cols = tuple(k for k, _ in sort_keys) + (text_col,)
    digest = content_digest(batch, digest_cols)
    if index_features or text_fields:
        # features / extra analyzed fields change the encoded layout:
        # same input + different features must not reuse a
        # checkpointed segment
        digest = hashlib.sha1(
            (digest + "+" + ",".join(sorted(index_features))
             + "+" + ",".join(text_fields)).encode()
        ).hexdigest()[:10]
    name = segment_name(first_key, n, digest)
    seg_dir = os.path.join(index_dir, name)
    meta_path = os.path.join(seg_dir, "meta.json")
    if os.path.exists(os.path.join(seg_dir, SUCCESS_MARKER)):
        with open(meta_path) as f:
            return json.load(f)

    field_invs = [(text_col, invert_batch(
        batch.column(text_col), analyzer,
        offsets="offs" in index_features,
        payloads="pay" in index_features))]
    for col in text_fields:
        # additional analyzed TextFields (FREQ|POS|Norm2) — the
        # multi-field document shape of the reference (a WikiDoc
        # carries title AND body TextFields, utils/index-put.cpp:
        # 190-258); each gets its own dictionary range + len_<field>
        # norms column, enabling per-field queries and BM25F
        field_invs.append((col, invert_batch(batch.column(col), analyzer)))
    kw = KeywordAnalyzer()
    for col in exact_fields:
        vals = batch.column(col)
        if not pa.types.is_string(vals.type):
            # bool/int exact fields index as their string form (the
            # reference's boolean/string single-term streams)
            vals = vals.cast(pa.string())
        field_invs.append((col, invert_batch(vals, kw)))
    for col in numeric_fields:
        vals = batch.column(col)
        if pa.types.is_timestamp(vals.type):
            vals = vals.cast(pa.int64())
        is_float = pa.types.is_floating(vals.type)
        # null docs are simply absent from the numeric field (matching
        # the keyword path's is_valid handling): without the mask,
        # to_numpy turns int nulls into NaN and astype(int64) into
        # INT64_MIN, which would match open-ended GranularRange queries
        valid = np.flatnonzero(
            np.asarray(pc.is_valid(vals).combine_chunks()
                       if isinstance(vals, pa.ChunkedArray)
                       else pc.is_valid(vals))
        ).astype(np.int64)
        if valid.size < n:
            vals = vals.take(pa.array(valid))
        arr = vals.to_numpy(zero_copy_only=False)
        arr = arr.astype(np.float64) if is_float else arr.astype(np.int64)
        if is_float and np.isnan(arr).any():
            keep = ~np.isnan(arr)
            arr, valid = arr[keep], valid[keep]
        d_idx, terms = numeric_terms(arr, float_values=is_float)
        field_invs.append((col, invert_tokens(
            valid[d_idx], terms,
            np.zeros(d_idx.size, dtype=np.int64), n,
        )))
    terms_table, norms_table, fields_meta = encode_field_tables(field_invs)
    doc_len = dict(field_invs)[text_col]["doc_len"]

    tmp_dir = seg_dir + f".tmp.{os.getpid()}"
    os.makedirs(tmp_dir, exist_ok=True)
    # small row groups => cold point lookups read ~1k terms' blobs, not
    # the whole segment's postings (see SegmentReader._posting_row)
    write_terms_parquet(terms_table, os.path.join(tmp_dir, "terms.parquet"))
    pq.write_table(norms_table, os.path.join(tmp_dir, "norms.parquet"))
    _write_norms_npz(norms_table, tmp_dir)
    stored = list(stored_cols) if stored_cols is not None else batch.column_names
    pq.write_table(batch.select(stored), os.path.join(tmp_dir, "docmap.parquet"))
    elapsed = time.time() - t0
    meta = {
        "format_version": FORMAT_VERSION,
        "name": name,
        "docs_count": int(n),
        "docs_with_field": fields_meta[text_col]["docs_with_field"],
        "sum_doc_len": fields_meta[text_col]["sum_doc_len"],
        "n_terms": terms_table.num_rows,
        "fields": fields_meta,
        "first_key": list(first_key),
        "last_key": list(last_key),
        "text_col": text_col,
        "key_cols": list(key_cols),
        "exact_fields": list(exact_fields),
        "numeric_fields": list(numeric_fields),
        "text_fields": list(text_fields),
        "index_features": sorted(index_features),
        "analyzer": analyzer_spec or {"name": "segmentation", "options": {}},
        "lineage": {
            "encode_sec": round(elapsed, 4),
            "docs_per_sec": round(n / elapsed, 1) if elapsed > 0 else None,
        },
    }
    with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
        json.dump(meta, f)
    with open(os.path.join(tmp_dir, SUCCESS_MARKER), "w") as f:
        f.write("")
    # atomic publish; a concurrent retry that won the race is equivalent
    # (deterministic encode), so losing the rename is fine.
    try:
        os.rename(tmp_dir, seg_dir)
    except OSError:
        import shutil

        if os.path.exists(os.path.join(seg_dir, SUCCESS_MARKER)):
            shutil.rmtree(tmp_dir, ignore_errors=True)
        else:
            raise
    return meta


# ---------------------------------------------------------------------------
# reading / decoding
# ---------------------------------------------------------------------------


class SegmentReader:
    """Read-side view of one segment (``SegmentReader`` analogue).

    Term dictionary columns (term, doc_freq, total_tf) are loaded
    eagerly (small); posting blobs are column-loaded lazily on first
    postings access. At scale the sorted ``term`` column gives Parquet
    row-group pruning for point lookups.
    """

    def __init__(self, seg_dir: str, meta: dict | None = None):
        # ``meta`` (from the manifest generation) overrides the on-disk
        # meta.json: MVCC delete masks live in manifest entries, the
        # segment files stay immutable
        self.dir = seg_dir
        if meta is not None:
            self.meta = meta
        else:
            with open(os.path.join(seg_dir, "meta.json")) as f:
                self.meta = json.load(f)
        self.default_field = self.meta.get("text_col", "text")
        self._dict = pq.read_table(
            os.path.join(seg_dir, "terms.parquet"),
            columns=["term", "doc_freq", "total_tf"],
        )
        # the dictionary stays in its Arrow buffers (offsets + utf8
        # data, zero-copy); point lookups / range bounds binary-search
        # those buffers directly. The numpy object array (needed only
        # by full-dictionary scans: fuzzy/wildcard/merge) is built
        # lazily — materializing ~4k Python strings per segment at
        # every open dominated IndexSearcher construction (1.9s of a
        # 4s open at 301 segments / 1.2M terms).
        col = self._dict.column("term")
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.offset:
            arr = pa.concat_arrays([arr[:]])  # rebase to offset 0
        self._t_arr = arr
        off_dt = np.int64 if pa.types.is_large_string(arr.type) \
            or pa.types.is_large_binary(arr.type) else np.int32
        self._t_offs = np.frombuffer(arr.buffers()[1], dtype=off_dt,
                                     count=len(arr) + 1)
        buf = arr.buffers()[2]
        self._t_data = (np.frombuffer(buf, dtype=np.uint8)
                        if buf is not None and buf.size
                        else np.empty(0, np.uint8))
        self._n_terms = len(arr)
        self._terms_obj: np.ndarray | None = None
        self.doc_freq = self._dict.column("doc_freq").to_numpy()
        self.total_tf = self._dict.column("total_tf").to_numpy()
        self.fields: dict[str, dict] = self.meta.get("fields") or {
            self.default_field: {
                "row_start": 0,
                "row_end": self._n_terms,
                "docs_with_field": self.meta["docs_with_field"],
                "sum_doc_len": self.meta["sum_doc_len"],
            }
        }
        self._postings: pa.Table | None = None
        self._norms: dict[str, np.ndarray] = {}
        self._docmap: pa.Table | None = None
        self._deleted: np.ndarray | None = None
        self._deleted_loaded = False
        # bounded FIFO cache of decoded posting lists (hot terms are
        # re-read across queries; the reference relies on mmap + OS page
        # cache for the same effect, core/store/caching_directory.hpp)
        self._pl_cache: dict[tuple[int, bool], "PostingList"] = {}
        self._pl_cache_max = 256
        # decoded OFFS/PAY occurrence streams (highlight hits the same
        # few query terms repeatedly)
        self._occ_cache: dict[tuple[str, int], tuple] = {}
        # sub-segment serving view (VERDICT r4 #3): when set to a local
        # doc row range, postings/phrase_keys return only in-range docs
        # and the POSITION streams decode only the overlapping blocks
        self.serve_range: tuple[int, int] | None = None
        self._plr_cache: dict[tuple[int, bool], "PostingList"] = {}

    def set_serve_range(self, lo: int, hi: int) -> None:
        """Restrict this reader to local docs ``lo < doc <= hi`` (0-based
        half-open row range [lo, hi)) — the row-group sub-shard view a
        distributed serving layer uses to keep cold decode parallelism
        over big consolidated segments (the reference's merge policy
        trades against the same effect, ``core/utils/index_utils.hpp:
        71-84``). Scoring semantics are unchanged (BM25 depends on
        per-doc tf/norms + index-wide stats, which the sharded
        coordinator overrides globally); OFFS/PAY/bulk consumers guard
        against range views (they align to whole-segment streams)."""
        lo, hi = int(lo), int(hi)
        if not (0 <= lo < hi <= self.docs_count):
            raise ValueError(f"bad serve range [{lo}, {hi}) for "
                             f"{self.docs_count}-doc segment")
        self.serve_range = (lo, hi)
        self._plr_cache.clear()

    # --- stats -----------------------------------------------------------
    @property
    def docs_count(self) -> int:
        return self.meta["docs_count"]

    @property
    def docs_with_field(self) -> int:
        return self.meta["docs_with_field"]

    @property
    def sum_doc_len(self) -> int:
        return self.meta["sum_doc_len"]

    @property
    def norms(self) -> np.ndarray:
        """doc_len array of the default (text) field, index = docid - 1."""
        return self.field_norms(self.default_field)

    def field_norms(self, field: str | None) -> np.ndarray:
        field = field or self.default_field
        arr = self._norms.get(field)
        if arr is None:
            npz_path = os.path.join(self.dir, "norms.npz")
            if os.path.exists(npz_path):
                z = np.load(npz_path)
                col = f"len_{field}" if f"len_{field}" in z.files else "doc_len"
                arr = (np.asarray(z[col], dtype=np.float32)
                       if col in z.files
                       else np.zeros(self.docs_count, dtype=np.float32))
                self._norms[field] = arr
                return arr
            t = pq.read_table(os.path.join(self.dir, "norms.parquet"))
            col = f"len_{field}" if f"len_{field}" in t.column_names else "doc_len"
            if col in t.column_names:
                arr = t.column(col).to_numpy().astype(np.float32)
            else:
                # field absent from this segment (e.g. merging segments
                # built with different field sets): zero doc lengths
                arr = np.zeros(self.docs_count, dtype=np.float32)
            self._norms[field] = arr
        return arr

    @property
    def docmap(self) -> pa.Table:
        if self._docmap is None:
            self._docmap = pq.read_table(os.path.join(self.dir, "docmap.parquet"))
        return self._docmap

    def docmap_column(self, col: str) -> pa.ChunkedArray:
        """ONE stored column, lazily read and cached — the columnstore
        point of the design: NumericRange/ColumnExistence/conv-match
        must not load every stored column (incl. text) to test one."""
        if self._docmap is not None:
            return self._docmap.column(col)
        cache = getattr(self, "_docmap_cols", None)
        if cache is None:
            cache = self._docmap_cols = {}
        arr = cache.get(col)
        if arr is None:
            arr = pq.read_table(os.path.join(self.dir, "docmap.parquet"),
                                columns=[col]).column(col)
            cache[col] = arr
        return arr

    @property
    def deleted_mask(self) -> np.ndarray | None:
        """Bool array (index = local docid - 1), True = deleted; None if
        no deletes. The mask file is named in the manifest meta entry
        (``deletes_file``), the ``liveDocs`` analogue."""
        if not self._deleted_loaded:
            self._deleted_loaded = True
            fname = self.meta.get("deletes_file")
            if fname:
                t = pq.read_table(os.path.join(self.dir, fname))
                mask = np.zeros(self.docs_count, dtype=bool)
                mask[t.column("local_doc").to_numpy() - 1] = True
                self._deleted = mask
        return self._deleted

    def filter_live(self, docs: np.ndarray, scores: np.ndarray
                    ) -> tuple[np.ndarray, np.ndarray]:
        """Drop deleted docs — and, on a ``serve_range`` view, docs
        outside the range (the single choke point every execute path
        funnels through, so All/columnstore/numeric/WAND-cursor paths
        that decode whole-segment doc sets stay correct)."""
        if self.serve_range is not None and docs.size:
            lo, hi = self.serve_range
            keep = (docs > lo) & (docs <= hi)
            docs, scores = docs[keep], scores[keep]
        mask = self.deleted_mask
        if mask is None or docs.size == 0:
            return docs, scores
        keep = ~mask[docs - 1]
        return docs[keep], scores[keep]

    @property
    def live_docs_count(self) -> int:
        mask = self.deleted_mask
        return self.docs_count - int(mask.sum()) if mask is not None else self.docs_count

    # --- term dictionary --------------------------------------------------
    @property
    def terms(self) -> np.ndarray:
        """Full dictionary as a numpy object array (lazy; only
        full-scan consumers — fuzzy/wildcard candidate generation,
        merge, stats — pay for it)."""
        t = self._terms_obj
        if t is None:
            t = self._terms_obj = np.asarray(self._t_arr.to_pylist(),
                                             dtype=object)
        return t

    def terms_at(self, rows: np.ndarray) -> np.ndarray:
        """Decode only the given dictionary rows (bounded range scans
        stay cheap without materializing the whole dictionary)."""
        if self._terms_obj is not None:
            return self._terms_obj[rows]
        taken = self._t_arr.take(pa.array(rows, type=pa.int64()))
        return np.asarray(taken.to_pylist(), dtype=object)

    def _term_bytes(self, i: int) -> bytes:
        o0, o1 = self._t_offs[i], self._t_offs[i + 1]
        return self._t_data[o0:o1].tobytes()

    def _bisect(self, key: bytes, lo: int, hi: int, right: bool) -> int:
        """Insertion point of ``key`` in the byte-sorted dictionary
        buffers (UTF-8 byte order == code-point order)."""
        while lo < hi:
            mid = (lo + hi) >> 1
            t = self._term_bytes(mid)
            if t < key or (right and t == key):
                lo = mid + 1
            else:
                hi = mid
        return lo

    def _field_range(self, field: str | None) -> tuple[int, int]:
        f = self.fields.get(field or self.default_field)
        if f is None:
            return 0, 0
        return f["row_start"], f["row_end"]

    def lookup(self, term: str, field: str | None = None) -> int:
        """Row ordinal of (field, term), or -1 (binary search within the
        field's dictionary range)."""
        lo, hi = self._field_range(field)
        key = term.encode() if isinstance(term, str) else bytes(term)
        i = self._bisect(key, lo, hi, right=False)
        if i < hi and self._term_bytes(i) == key:
            return i
        return -1

    def field_terms(self, field: str | None = None) -> np.ndarray:
        lo, hi = self._field_range(field)
        return self.terms[lo:hi]

    def term_range(self, lo: str | None, hi: str | None,
                   inc_lo: bool = True, inc_hi: bool = True,
                   field: str | None = None) -> np.ndarray:
        """Row ordinals of terms in [lo, hi] within a field's dictionary
        (two binary searches over the Arrow buffers)."""
        f0, f1 = self._field_range(field)
        a = f0 if lo is None else self._bisect(
            lo.encode() if isinstance(lo, str) else bytes(lo),
            f0, f1, right=not inc_lo)
        b = f1 if hi is None else self._bisect(
            hi.encode() if isinstance(hi, str) else bytes(hi),
            f0, f1, right=inc_hi)
        return np.arange(a, b, dtype=np.int64)

    # column groups are SUPERSETS across format versions — the actual
    # read lists are intersected with the file's schema (v3 has
    # pos_chunk_off/block_pos_val, v2 has block_pos_off)
    _POSTING_COLS = [
        "doc_blob", "freq_blob", "pos_blob",
        "block_last_doc", "block_doc_off", "block_freq_off",
        "block_pos_off", "pos_chunk_off", "block_pos_val",
        "block_max_tf", "block_min_dl",
    ]
    # split so doc-level decodes never read the (largest) position data
    _BASE_COLS = ["doc_blob", "freq_blob", "block_last_doc",
                  "block_doc_off", "block_freq_off",
                  "block_max_tf", "block_min_dl"]
    _POS_COLS = ["pos_blob", "block_pos_off", "pos_chunk_off",
                 "block_pos_val"]
    _GROUP_COLS = {"base": _BASE_COLS, "pos": _POS_COLS,
                   "offs": ["offs_blob", "block_offs_off"],
                   "pay": ["pay_blob", "block_pay_off"]}

    @property
    def index_features(self) -> frozenset:
        """Per-occurrence streams stored in this segment's text field
        ("offs" / "pay" — the OFFS/PAY index features)."""
        return frozenset(self.meta.get("index_features") or ())

    @staticmethod
    def _row_blob(row: pa.Table, name: str) -> np.ndarray:
        """Zero-copy uint8 view of a one-row binary column (``as_py``
        would copy through Python bytes)."""
        return np.frombuffer(row.column(name)[0].as_buffer(),
                             dtype=np.uint8)

    @staticmethod
    def _row_list(row: pa.Table, name: str) -> np.ndarray:
        """int64 view of a one-row list column via flatten (``as_py``
        materializes a Python list per element)."""
        arr = row.column(name)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return arr.flatten().to_numpy(zero_copy_only=False).astype(np.int64)

    def _posting_row(self, idx: int, group: str = "base"):
        """One term's posting columns — reads ONLY the Parquet row group
        containing the row (segments are written with small row groups)
        and only the requested column group ("base" = doc/freq + block
        meta, "pos" = positions), via a memory-mapped reader. A cold
        point lookup therefore touches ~row_group_size terms' needed
        blobs, not the segment's whole postings (the .doc/.pos file
        seek analogue, ``core/formats/formats_10.cpp``). Bulk consumers
        (merge) load the full table via ``_postings_full`` instead."""
        if self._postings is not None:
            return self._postings.slice(idx, 1)
        if not hasattr(self, "_pq_terms"):
            self._pq_terms = pq.ParquetFile(
                pa.memory_map(os.path.join(self.dir, "terms.parquet")))
            self._pq_names = set(self._pq_terms.schema_arrow.names)
            rows = [self._pq_terms.metadata.row_group(i).num_rows
                    for i in range(self._pq_terms.num_row_groups)]
            self._rg_starts = np.concatenate(
                ([0], np.cumsum(rows))).astype(np.int64)
            self._rg_cache: dict[tuple[int, str], pa.Table] = {}
        rg = int(np.searchsorted(self._rg_starts, idx, side="right") - 1)
        tbl = self._rg_cache.get((rg, group))
        if tbl is None:
            cols = [c for c in self._GROUP_COLS[group]
                    if c in self._pq_names]
            tbl = self._pq_terms.read_row_group(rg, columns=cols,
                                                use_threads=False)
            if len(self._rg_cache) >= 32:
                self._rg_cache.pop(next(iter(self._rg_cache)))
            self._rg_cache[(rg, group)] = tbl
        return tbl.slice(idx - int(self._rg_starts[rg]), 1)

    def _postings_full(self) -> pa.Table:
        if self._postings is None:
            path = os.path.join(self.dir, "terms.parquet")
            names = set(pq.read_schema(path).names)
            cols = [c for c in self._POSTING_COLS if c in names] + [
                c for c in ("offs_blob", "block_offs_off",
                            "pay_blob", "block_pay_off") if c in names]
            self._postings = pq.read_table(path, columns=cols)
        return self._postings

    def postings(self, idx: int, positions: bool = False):
        """Decode term ``idx`` -> PostingList (cached, bounded FIFO).
        Under a ``serve_range`` the list is restricted to in-range docs
        and only the overlapping POSITION blocks are decoded (the
        base doc/freq streams decode fully — they are the cheap part
        and their full form is shared via the normal cache)."""
        if self.serve_range is not None:
            return self._postings_range(idx, positions)
        return self._postings_full_pl(idx, positions)

    def _postings_full_pl(self, idx: int, positions: bool = False):
        key = (idx, positions)
        hit = self._pl_cache.get(key)
        if hit is None and positions is False:
            hit = self._pl_cache.get((idx, True))  # positions superset
        if hit is not None:
            return hit
        pl = self._decode_postings(idx, positions)
        if len(self._pl_cache) >= self._pl_cache_max:
            self._pl_cache.pop(next(iter(self._pl_cache)))
        self._pl_cache[key] = pl
        return pl

    def _postings_range(self, idx: int, positions: bool):
        key = (idx, positions)
        hit = self._plr_cache.get(key)
        if hit is None and positions is False:
            hit = self._plr_cache.get((idx, True))
        if hit is not None:
            return hit
        lo, hi = self.serve_range
        occ0 = None
        full = self._pl_cache.get((idx, False)) \
            or self._pl_cache.get((idx, True))
        if full is not None:
            # a FULL decode is already cached — slicing it is free
            i0 = int(np.searchsorted(full.docs, lo, side="right"))
            i1 = int(np.searchsorted(full.docs, hi, side="right"))
            docs, tfs = full.docs[i0:i1], full.tfs[i0:i1]
            if positions:
                occ0 = int(full.tfs[:i0].sum())
        else:
            # block-restricted BASE decode (the wanderator skip list):
            # only doc/freq blocks overlapping the range are touched, so
            # a sub-shard's work is proportional to its doc share — the
            # v1 full-base slice made every sub-shard of a segment pay
            # the whole doc/freq decode and erased the split's win
            cur = self.cursor(idx)
            b0 = int(np.searchsorted(cur.last_doc, lo, side="right"))
            b1 = min(int(np.searchsorted(cur.last_doc, hi, side="left"))
                     + 1, cur.n_blocks)
            if b0 >= b1:
                docs = np.empty(0, dtype=np.int64)
                tfs = np.empty(0, dtype=np.int64)
                occ0 = 0
            else:
                bdocs, btfs = cur.decode_blocks(np.arange(b0, b1))
                i0 = int(np.searchsorted(bdocs, lo, side="right"))
                i1 = int(np.searchsorted(bdocs, hi, side="right"))
                docs, tfs = bdocs[i0:i1], btfs[i0:i1]
                if positions:
                    pos_row = self._posting_row(idx, "pos")
                    if "block_pos_val" in pos_row.column_names:
                        pval = self._row_list(pos_row, "block_pos_val")
                        occ0 = int(pval[b0]) + int(btfs[:i0].sum())
                    else:  # v2: no per-block occurrence index
                        fp = self._postings_full_pl(idx, False)
                        occ0 = int(fp.tfs[
                            :np.searchsorted(fp.docs, lo, side="right")
                        ].sum())
        pos = None
        if positions:
            occ1 = occ0 + int(tfs.sum())
            fp = self._pl_cache.get((idx, True))
            if fp is not None and fp.positions is not None:
                pos = fp.positions[occ0:occ1]
            elif docs.size:
                deltas = self._pos_deltas_range(idx, occ0, occ1)
                # the first occurrence of each doc run carries its
                # absolute position, so reconstruction from a doc
                # boundary needs nothing decoded before occ0
                cum = np.cumsum(deltas)
                rs = np.concatenate(
                    ([0], np.cumsum(tfs)[:-1])).astype(np.int64)
                base = np.repeat(cum[rs] - deltas[rs],
                                 tfs.astype(np.int64))
                pos = cum - base
            else:
                pos = np.empty(0, dtype=np.int64)
        pl = PostingList(docs=docs, tfs=tfs, positions=pos,
                         run_tfs=tfs if positions else None)
        if len(self._plr_cache) >= self._pl_cache_max:
            self._plr_cache.pop(next(iter(self._plr_cache)))
        self._plr_cache[key] = pl
        return pl

    def _pos_deltas_range(self, idx: int, a: int, b: int) -> np.ndarray:
        """Raw position deltas for occurrences ``[a, b)`` — the v3
        blocked stream decodes only the overlapping 128-blocks."""
        pos_row = self._posting_row(idx, "pos")
        pos_blob = self._row_blob(pos_row, "pos_blob")
        total = int(self.total_tf[idx])
        if "pos_chunk_off" in pos_row.column_names:
            return _decode_stream_range(
                pos_blob, self._row_list(pos_row, "pos_chunk_off"),
                total, a, b)
        return varint_decode(pos_blob).view(np.int64)[a:b]  # v2 flat

    def postings_many(self, rows) -> list["PostingList"]:
        """Decode several terms' (docs, tfs) at once; cache misses go
        through ONE batched pass (``_bulk_decode_blocked``) instead of
        per-term ``_decode_stream`` round-trips — a cold k-term
        disjunction otherwise pays ~45us of numpy fixed cost x 2
        streams x k x segments. Results land in the same FIFO cache
        ``postings`` uses."""
        out: dict[int, PostingList] = {}
        missing: list[int] = []
        seen: set[int] = set()
        for r in rows:
            r = int(r)
            if r in seen:
                continue
            seen.add(r)
            hit = self._pl_cache.get((r, False)) \
                or self._pl_cache.get((r, True))
            if hit is not None:
                out[r] = hit
            else:
                missing.append(r)
        if len(missing) == 1:
            out[missing[0]] = self.postings(missing[0])
        elif missing:
            t = pa.concat_tables(
                [self._posting_row(r) for r in missing]).combine_chunks()
            nm = len(missing)
            df = self.doc_freq[np.asarray(missing)].astype(np.int64)

            def col_view(name):
                arr = t.column(name)
                if isinstance(arr, pa.ChunkedArray):
                    arr = arr.combine_chunks()
                off0 = arr.offset
                off_dt = np.int64 if pa.types.is_large_binary(arr.type) \
                    or pa.types.is_large_string(arr.type) else np.int32
                offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
                    off0 : off0 + nm + 1].astype(np.int64)
                return offs, np.frombuffer(arr.buffers()[2], dtype=np.uint8)

            vals = {}
            for blob_col, list_col, k in (
                    ("doc_blob", "block_doc_off", "docs"),
                    ("freq_blob", "block_freq_off", "tfs")):
                offs, data = col_view(blob_col)
                ca = t.column(list_col)
                if isinstance(ca, pa.ChunkedArray):
                    ca = ca.combine_chunks()
                clen = pc.list_value_length(ca).to_numpy().astype(np.int64)
                coff = np.concatenate(([0], np.cumsum(clen)))
                cvals = ca.flatten().to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                vals[k] = _bulk_decode_blocked(
                    offs[:-1], offs[1:], data, cvals, coff[:-1], df)
            starts = np.concatenate(([0], np.cumsum(df)))
            for j, r in enumerate(missing):
                a, b = int(starts[j]), int(starts[j + 1])
                pl = PostingList(
                    docs=np.cumsum(vals["docs"][a:b]),
                    tfs=vals["tfs"][a:b])
                if len(self._pl_cache) >= self._pl_cache_max:
                    self._pl_cache.pop(next(iter(self._pl_cache)))
                self._pl_cache[(r, False)] = pl
                out[r] = pl
        if getattr(self, "serve_range", None) is not None:
            # bulk path caches FULL lists (shared machinery); the range
            # view slices at the boundary (docs/tfs only here).
            # getattr: duck-typed fakes reuse this method unbound
            lo, hi = self.serve_range

            def _clip(pl: "PostingList") -> "PostingList":
                i0 = int(np.searchsorted(pl.docs, lo, side="right"))
                i1 = int(np.searchsorted(pl.docs, hi, side="right"))
                return PostingList(docs=pl.docs[i0:i1], tfs=pl.tfs[i0:i1])

            return [_clip(out[int(r)]) for r in rows]
        return [out[int(r)] for r in rows]

    def _decode_postings(self, idx: int, positions: bool = False):
        base = self._pl_cache.get((idx, False)) if positions else None
        if base is not None:
            # base (docs/tfs) already decoded — add only the positions
            docs, tfs = base.docs, base.tfs
        else:
            row = self._posting_row(idx)
            df = int(self.doc_freq[idx])
            doc_blob = self._row_blob(row, "doc_blob")
            freq_blob = self._row_blob(row, "freq_blob")
            doc_off = self._row_list(row, "block_doc_off")
            freq_off = self._row_list(row, "block_freq_off")
            deltas, tfs = _decode_stream(doc_blob, doc_off, df), _decode_stream(
                freq_blob, freq_off, df
            )
            docs = np.cumsum(deltas.astype(np.int64))
        pos = None
        if positions:
            pos_deltas = self._pos_deltas(idx)
            run_starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
            pos = np.cumsum(pos_deltas)
            # reset cumulative sum at each run start
            base = np.repeat(pos[run_starts] - pos_deltas[run_starts], tfs.astype(np.int64))
            pos = pos - base
        return PostingList(docs=docs, tfs=tfs.astype(np.int64), positions=pos,
                           run_tfs=tfs.astype(np.int64) if positions else None)

    def _pos_deltas(self, idx: int) -> np.ndarray:
        """Raw position deltas of term ``idx`` (one stream decode; the
        caller reconstructs absolute positions or phrase keys)."""
        pos_row = self._posting_row(idx, "pos")
        pos_blob = self._row_blob(pos_row, "pos_blob")
        if "pos_chunk_off" in pos_row.column_names:
            # v3: blocked stream, same decoder as doc/freq
            return _decode_stream(
                pos_blob, self._row_list(pos_row, "pos_chunk_off"),
                int(self.total_tf[idx]))
        return varint_decode(pos_blob).view(np.int64)  # v2: flat varint

    def occurrence_offsets(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """(start, end) character spans of every occurrence of term
        ``idx``, aligned with ``postings(idx, positions=True).positions``
        (the OFFS index feature; requires a segment built with
        ``index_features=("offs",)``)."""
        if self.serve_range is not None:
            raise RuntimeError(
                "occurrence_offsets is not supported on a serve_range "
                "sub-segment view (the OFFS stream aligns to the whole "
                "segment); open the segment without a range")
        hit = self._occ_cache.get(("offs", idx))
        if hit is not None:
            return hit
        pl = self.postings(idx)
        row = self._posting_row(idx, "offs")
        blob = self._row_blob(row, "offs_blob")
        if blob.size == 0:
            raise KeyError(
                f"segment {self.meta['name']} has no OFFS stream for term {idx}")
        inter = varint_decode(blob).view(np.int64)
        sd, lens = inter[0::2], inter[1::2]
        tfs = pl.tfs
        run_starts = np.concatenate(([0], np.cumsum(tfs)[:-1])).astype(np.int64)
        cum = np.cumsum(sd)
        base = np.repeat(cum[run_starts] - sd[run_starts], tfs)
        starts = cum - base
        out = (starts, starts + lens)
        if len(self._occ_cache) >= 64:
            self._occ_cache.pop(next(iter(self._occ_cache)))
        self._occ_cache[("offs", idx)] = out
        return out

    def payloads(self, idx: int) -> np.ndarray:
        """uint64 payload per occurrence of term ``idx``, aligned with
        the flat position stream (PAY index feature)."""
        if self.serve_range is not None:
            raise RuntimeError(
                "payloads is not supported on a serve_range sub-segment "
                "view (the PAY stream aligns to the whole segment)")
        hit = self._occ_cache.get(("pay", idx))
        if hit is not None:
            return hit
        row = self._posting_row(idx, "pay")
        blob = self._row_blob(row, "pay_blob")
        if blob.size == 0:
            raise KeyError(
                f"segment {self.meta['name']} has no PAY stream for term {idx}")
        out = varint_decode(blob).astype(np.uint64)
        if len(self._occ_cache) >= 64:
            self._occ_cache.pop(next(iter(self._occ_cache)))
        self._occ_cache[("pay", idx)] = out
        return out

    def doc_offsets(self, idx: int, local_doc: int
                    ) -> tuple[np.ndarray, np.ndarray]:
        """(starts, ends) char spans of term ``idx`` inside one doc
        (1-based local id) — the highlight read path: one binary search
        over the term's doc list plus a slice of the offs stream."""
        pl = self.postings(idx)
        i = int(np.searchsorted(pl.docs, local_doc))
        if i >= pl.docs.size or pl.docs[i] != local_doc:
            e = np.empty(0, np.int64)
            return e, e
        starts, ends = self.occurrence_offsets(idx)
        cum = np.concatenate(([0], np.cumsum(pl.tfs)))
        return starts[cum[i]:cum[i + 1]], ends[cum[i]:cum[i + 1]]

    def bulk_postings(self, field: str | None = None,
                      extras: bool = False) -> dict:
        """Decode ALL of a field's postings in a few vectorized passes
        (the merge/consolidation fast path — per-term ``postings()``
        calls would cost O(V) Python round-trips). Whole-segment only
        (merge never runs on a ``serve_range`` view).

        Strategy: a binary Arrow column's value buffer already holds the
        per-term blobs contiguously, so every df<128 term (pure varint)
        decodes in ONE ``varint_decode`` over a single gathered stream,
        positions decode in ONE pass over the whole pos buffer, and only
        the rare df>=128 terms (bitpacked blocks) loop per term.

        Returns dict(df, term_starts, docs, tfs, positions): docs/tfs
        concatenated in dictionary order (local 1-based ids), positions
        flat grouped per (term, doc) run.
        """
        lo, hi = self._field_range(field)
        nt = hi - lo
        df = self.doc_freq[lo:hi].astype(np.int64)
        term_starts = np.concatenate(([0], np.cumsum(df)[:-1])).astype(np.int64) \
            if nt else np.empty(0, np.int64)
        total = int(df.sum()) if nt else 0
        out = {
            "df": df, "term_starts": term_starts,
            "docs": np.empty(total, np.int64),
            "tfs": np.empty(total, np.int64),
            "positions": np.empty(0, np.int64),
        }
        if nt == 0 or total == 0:
            return out
        t = self._postings_full().slice(lo, nt)

        def col_view(name):
            arr = t.column(name).combine_chunks()
            off0 = arr.offset
            off_dt = np.int64 if pa.types.is_large_binary(arr.type) \
                or pa.types.is_large_string(arr.type) else np.int32
            offs = np.frombuffer(arr.buffers()[1], dtype=off_dt)[
                off0 : off0 + nt + 1].astype(np.int64)
            data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
            return offs, data

        def gather(offs, data, mask):
            starts, lens = offs[:-1][mask], (offs[1:] - offs[:-1])[mask]
            tot = int(lens.sum())
            out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            idx = np.repeat(starts - out_starts, lens) + np.arange(tot)
            return data[idx]

        def reset_cumsum(deltas, starts, counts):
            cum = np.cumsum(deltas)
            base = np.repeat(cum[starts] - deltas[starts], counts)
            return cum - base

        small = df < BLOCK_SIZE
        d_offs, d_data = col_view("doc_blob")
        f_offs, f_data = col_view("freq_blob")
        if small.any():
            s_df = df[small]
            s_starts = np.concatenate(([0], np.cumsum(s_df)[:-1]))
            s_deltas = varint_decode(gather(d_offs, d_data, small)).view(np.int64)
            s_tfs = varint_decode(gather(f_offs, f_data, small)).view(np.int64)
            s_docs = reset_cumsum(s_deltas, s_starts, s_df)
            out_idx = np.repeat(term_starts[small] - s_starts, s_df) \
                + np.arange(s_docs.size)
            out["docs"][out_idx] = s_docs
            out["tfs"][out_idx] = s_tfs
        large = np.flatnonzero(~small)
        if large.size:
            # df>=128 terms decode BATCHED too (same pattern as the v3
            # position path below): one _batch_unpack_full over every
            # large term's full blocks + one varint pass over the
            # gathered tails — no per-term Python round-trips.
            l_df = df[large]
            for blob_off, blob_data, col, is_docs in (
                    (d_offs, d_data, "block_doc_off", True),
                    (f_offs, f_data, "block_freq_off", False)):
                ca = t.column(col).combine_chunks()
                clen = pc.list_value_length(ca).to_numpy().astype(np.int64)
                coff = np.concatenate(([0], np.cumsum(clen)))
                cvals = ca.flatten().to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                vals = _bulk_decode_blocked(
                    blob_off[:-1][large], blob_off[1:][large], blob_data,
                    cvals, coff[large], l_df)
                if is_docs:
                    l_starts = np.concatenate(([0], np.cumsum(l_df)[:-1]))
                    vals = reset_cumsum(vals, l_starts, l_df)
                dest = np.repeat(
                    term_starts[large]
                    - np.concatenate(([0], np.cumsum(l_df)[:-1])), l_df) \
                    + np.arange(int(l_df.sum()))
                out["docs" if is_docs else "tfs"][dest] = vals
        p_offs, p_data = col_view("pos_blob")
        if "pos_chunk_off" in t.column_names:
            # v3 blocked streams: ONE batched bit-unpack over every
            # term's full 128-value chunks + ONE varint pass over the
            # gathered tails, then a vectorized interleave
            ttf = self.total_tf[lo:hi].astype(np.int64)
            ca = t.column("pos_chunk_off").combine_chunks()
            lens_list = pc.list_value_length(ca).to_numpy().astype(np.int64)
            l_off = np.concatenate(([0], np.cumsum(lens_list)))
            cvals = ca.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
            pos_deltas = _bulk_decode_blocked(
                p_offs[:-1], p_offs[1:], p_data, cvals, l_off[:-1], ttf)
        else:
            # v2: every pos blob is plain varint -> one decode over the
            # field's whole contiguous pos buffer
            pos_deltas = varint_decode(
                p_data[p_offs[0] : p_offs[-1]]).astype(np.int64)
        run_starts = np.concatenate(([0], np.cumsum(out["tfs"])[:-1]))
        out["positions"] = reset_cumsum(pos_deltas, run_starts, out["tfs"])
        if extras:
            # OFFS/PAY flat streams, one varint pass each (present and
            # FULL only for fields that actually stored them — empty
            # placeholder columns yield nothing and are skipped)
            n_occ = out["positions"].size
            for nm in ("offs", "pay"):
                if f"{nm}_blob" not in t.column_names:
                    continue
                x_offs, x_data = col_view(f"{nm}_blob")
                vals = varint_decode(
                    x_data[x_offs[0]: x_offs[-1]]).astype(np.int64)
                if nm == "offs":
                    if vals.size != 2 * n_occ:
                        continue
                    out["offs_start"] = reset_cumsum(
                        vals[0::2], run_starts, out["tfs"])
                    out["offs_len"] = vals[1::2]
                else:
                    if vals.size != n_occ:
                        continue
                    out["pay"] = vals
        return out

    def phrase_keys(self, idx: int, shift: int = 0) -> np.ndarray:
        """Sorted ``(doc << 32) + position - shift`` keys of every
        occurrence of term ``idx`` whose position is >= ``shift``
        (cached per (term, shift); the phrase/same-position/n-gram
        kernels ask for slot i's keys at shift i, so the mask + subtract
        over the big key array runs once per index lifetime, not per
        query)."""
        if not hasattr(self, "_pk_cache"):
            self._pk_cache: dict[tuple[int, int], np.ndarray] = {}
        key = (idx, shift)
        hit = self._pk_cache.get(key)
        if hit is None:
            base = self._pk_cache.get((idx, 0))
            if base is None and self.serve_range is not None:
                # range view: keys from the ranged positional decode
                # (1/R of the stream) — the fused full-stream path below
                # would misalign its deltas against sliced docs/tfs
                pl = self._postings_range(idx, True)
                doc_rep = np.repeat(pl.docs, pl.tfs)
                base = (doc_rep << np.int64(32)) + pl.positions
                self._pk_put((idx, 0), base)
            if base is None:
                pl = self._pl_cache.get((idx, True))
                if pl is not None:
                    doc_rep = np.repeat(pl.docs, pl.tfs)
                    base = (doc_rep << np.int64(32)) + pl.positions
                else:
                    # fused build straight from deltas: keys = cumsum +
                    # repeat((doc<<32) - run_base) — one repeat + one
                    # add instead of reconstructing absolute positions
                    # first (3 fewer full passes on the cold path; the
                    # position stream of a high-df term is the largest
                    # array a phrase/n-gram query touches)
                    pl = self.postings(idx)  # docs/tfs only
                    deltas = self._pos_deltas(idx)
                    cum = np.cumsum(deltas)
                    rs = np.concatenate(
                        ([0], np.cumsum(pl.tfs)[:-1])).astype(np.int64)
                    const_run = (pl.docs << np.int64(32)) \
                        - (cum[rs] - deltas[rs])
                    base = cum
                    base += np.repeat(const_run, pl.tfs)
                # grouped (doc asc, pos asc) -> already globally sorted
                self._pk_put((idx, 0), base)
            if shift == 0:
                return base
            s = np.int64(shift)
            hit = base[(base & np.int64((1 << 32) - 1)) >= s] - s
            self._pk_put(key, hit)
        return hit

    def _pos_values_ranges(self, pos_row: pa.Table, blob: np.ndarray,
                           total: int, v0: np.ndarray, v1: np.ndarray
                           ) -> np.ndarray:
        """Concatenated position-delta values for the VALUE ranges
        [v0[i], v1[i]) of a v3 blocked position stream — decodes only
        the 128-value chunks covering a requested range (+ the varint
        tail when touched)."""
        chunk_offs = self._row_list(pos_row, "pos_chunk_off")
        n_full = total // BLOCK_SIZE
        full_end = n_full * BLOCK_SIZE
        # chunk ranges per value range (exclusive end), then the union
        c0 = v0 // BLOCK_SIZE
        c1 = (v1 + BLOCK_SIZE - 1) // BLOCK_SIZE
        lens_c = c1 - c0
        cumc = np.concatenate(([0], np.cumsum(lens_c)[:-1]))
        flat_c = np.repeat(c0 - cumc, lens_c) + np.arange(int(lens_c.sum()))
        sel = np.unique(flat_c)
        sel_full = sel[sel < n_full]
        vals_full = _batch_unpack_full(blob, chunk_offs[sel_full]) \
            if sel_full.size else np.empty((0, BLOCK_SIZE), np.int64)
        tail_vals = None
        if (v1 > full_end).any():
            tail_off = int(chunk_offs[n_full]) if n_full < chunk_offs.size \
                else blob.size
            tail_vals = varint_decode(blob[tail_off:],
                                      count=total - full_end).view(np.int64)
        lens_v = v1 - v0
        out0 = np.concatenate(([0], np.cumsum(lens_v)[:-1]))
        vidx = np.repeat(v0 - out0, lens_v) + np.arange(int(lens_v.sum()))
        out = np.empty(vidx.size, np.int64)
        in_full = vidx < full_end
        vf = vidx[in_full]
        if vf.size:
            rows = np.searchsorted(sel_full, vf // BLOCK_SIZE)
            out[in_full] = vals_full[rows, vf % BLOCK_SIZE]
        vt = vidx[~in_full]
        if vt.size:
            out[~in_full] = tail_vals[vt - full_end]
        return out

    def keys_for_docs(self, idx: int, docs: np.ndarray) -> np.ndarray:
        """Sorted ``(doc<<32)+pos`` keys of term ``idx`` restricted to
        the sorted doc set ``docs`` — decodes ONLY the 128-doc blocks
        containing a requested doc, using the skip list plus the stored
        per-block position byte offsets (the two-phase phrase
        evaluation: doc-level conjunction first, positions second —
        reference ``phrase_iterator.hpp`` over the ``.pos`` file's skip
        data). Falls back to slicing the fully cached keys when the
        term was already decoded."""
        full = getattr(self, "_pk_cache", {}).get((idx, 0))
        if full is not None:
            lo = np.searchsorted(full, docs << np.int64(32))
            hi = np.searchsorted(full, (docs + np.int64(1)) << np.int64(32))
            lens = hi - lo
            tot = int(lens.sum())
            if tot == full.size:
                return full
            out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gi = np.repeat(lo - out_starts, lens) + np.arange(tot)
            return full[gi]
        cur = self.cursor(idx)
        blocks = np.unique(np.searchsorted(cur.last_doc, docs, side="left"))
        blocks = blocks[blocks < cur.n_blocks]
        if blocks.size == 0 or docs.size == 0:
            return np.empty(0, dtype=np.int64)
        d, t = cur.decode_blocks(blocks)
        pos_row = self._posting_row(idx, "pos")
        blob = self._row_blob(pos_row, "pos_blob")
        if "pos_chunk_off" in pos_row.column_names:
            # v3 blocked stream: per doc-block VALUE ranges -> decode
            # only the covering 128-value chunks
            pval = self._row_list(pos_row, "block_pos_val")
            total = int(self.total_tf[idx])
            v0 = pval[blocks]
            v1 = np.append(pval[1:], total)[blocks]
            deltas = self._pos_values_ranges(pos_row, blob, total, v0, v1)
        else:
            # v2 flat varint: per doc-block BYTE ranges
            offs = self._row_list(pos_row, "block_pos_off")
            ends = np.append(offs[1:], blob.size)
            sb, eb = offs[blocks], ends[blocks]
            lens = eb - sb
            out_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            gidx = np.repeat(sb - out_starts, lens) \
                + np.arange(int(lens.sum()))
            deltas = varint_decode(blob[gidx]).view(np.int64)
        run_starts = np.concatenate(([0], np.cumsum(t)[:-1]))
        cum = np.cumsum(deltas)
        base = np.repeat(cum[run_starts] - deltas[run_starts], t)
        pos = cum - base
        ii = np.searchsorted(docs, d)
        valid = ii < docs.size
        keep_run = np.zeros(d.size, dtype=bool)
        keep_run[valid] = docs[ii[valid]] == d[valid]
        if keep_run.all():
            doc_rep = np.repeat(d, t)
            return (doc_rep << np.int64(32)) + pos
        keep_flat = np.repeat(keep_run, t)
        doc_rep = np.repeat(d[keep_run], t[keep_run])
        return (doc_rep << np.int64(32)) + pos[keep_flat]

    def _pk_put(self, key, arr) -> None:
        if len(self._pk_cache) >= 192:
            self._pk_cache.pop(next(iter(self._pk_cache)))
        self._pk_cache[key] = arr

    def cursor(self, idx: int) -> "BlockCursor":
        """Block-at-a-time cursor with skip + block-max metadata (WAND).
        Cached per term row (block-meta list conversion is not free)."""
        if not hasattr(self, "_cursor_cache"):
            self._cursor_cache: dict[int, BlockCursor] = {}
        hit = self._cursor_cache.get(idx)
        if hit is not None:
            return hit
        cur = self._make_cursor(idx)
        if len(self._cursor_cache) >= 256:
            self._cursor_cache.pop(next(iter(self._cursor_cache)))
        self._cursor_cache[idx] = cur
        return cur

    def _make_cursor(self, idx: int) -> "BlockCursor":
        row = self._posting_row(idx)
        return BlockCursor(
            df=int(self.doc_freq[idx]),
            doc_blob=self._row_blob(row, "doc_blob"),
            freq_blob=self._row_blob(row, "freq_blob"),
            doc_off=self._row_list(row, "block_doc_off"),
            freq_off=self._row_list(row, "block_freq_off"),
            last_doc=self._row_list(row, "block_last_doc"),
            max_tf=self._row_list(row, "block_max_tf"),
            min_dl=self._row_list(row, "block_min_dl"),
        )


def _bulk_decode_blocked(starts: np.ndarray, ends: np.ndarray,
                         data: np.ndarray, chunk_vals: np.ndarray,
                         chunk_off: np.ndarray,
                         counts: np.ndarray) -> np.ndarray:
    """Decode MANY terms' blocked streams in two batched passes.

    ``starts``/``ends``: each term's blob byte range in ``data``;
    ``chunk_vals``/``chunk_off``: flattened per-term block byte offsets
    (relative to the term's blob start) and each term's first index in
    that flat array; ``counts``: per-term value counts. One
    ``_batch_unpack_full`` over every full 128-block of every term +
    one ``varint_decode`` over the gathered tails. Returns the values
    concatenated in term order."""
    nt = counts.size
    n_full = counts // BLOCK_SIZE
    btot = int(n_full.sum())
    vals = np.empty(int(counts.sum()), np.int64)
    o = np.concatenate(([0], np.cumsum(counts)))
    fcnt = n_full * BLOCK_SIZE
    if btot:
        fcum0 = np.concatenate(([0], np.cumsum(n_full)[:-1]))
        term_rep = np.repeat(np.arange(nt), n_full)
        intra = np.arange(btot) - fcum0[term_rep]
        abs_offs = starts[term_rep] + chunk_vals[chunk_off[term_rep] + intra]
        full_vals = _batch_unpack_full(data, abs_offs).ravel()
        vcum0 = np.concatenate(([0], np.cumsum(fcnt)[:-1]))
        dest = np.repeat(o[:-1] - vcum0, fcnt) + np.arange(int(fcnt.sum()))
        vals[dest] = full_vals
    tail = counts - fcnt
    has = np.flatnonzero(tail > 0)
    if has.size:
        tail_rel = chunk_vals[chunk_off[has] + n_full[has]]
        starts_b = starts[has] + tail_rel
        ends_b = ends[has]
        lens_b = ends_b - starts_b
        ob = np.concatenate(([0], np.cumsum(lens_b)[:-1]))
        gidx = np.repeat(starts_b - ob, lens_b) \
            + np.arange(int(lens_b.sum()))
        tail_vals = varint_decode(data[gidx]).view(np.int64)
        tcum0 = np.concatenate(([0], np.cumsum(tail[has])[:-1]))
        dest_tail = np.repeat((o[:-1] + fcnt)[has] - tcum0, tail[has]) \
            + np.arange(int(tail[has].sum()))
        vals[dest_tail] = tail_vals
    return vals


def _decode_stream(blob: np.ndarray, offsets: np.ndarray, count: int) -> np.ndarray:
    """Decode a blocked stream (full bitpacked blocks + varint tail)."""
    n_blocks = offsets.size
    full = count // BLOCK_SIZE
    out = np.empty(count, dtype=np.int64)
    if full:
        _batch_unpack_full(blob, offsets[:full].astype(np.int64),
                           out=out[: full * BLOCK_SIZE]
                           .reshape(full, BLOCK_SIZE))
    pos = full * BLOCK_SIZE
    if pos < count:
        start = int(offsets[full]) if full < n_blocks else blob.size
        vals = varint_decode(blob[start:], count=count - pos)
        out[pos:] = vals.astype(np.int64)
        pos += vals.size
    assert pos == count, f"decoded {pos} of {count}"
    return out


def _decode_stream_range(blob: np.ndarray, offsets: np.ndarray,
                         count: int, a: int, b: int) -> np.ndarray:
    """Decode values ``[a, b)`` of a blocked stream touching ONLY the
    bitpacked 128-blocks (and/or the varint tail) that overlap the
    range — the sub-segment serving read path (VERDICT r4 #3): a
    doc-range shard of a big consolidated segment decodes 1/R of the
    position stream instead of all of it."""
    if a <= 0 and b >= count:
        return _decode_stream(blob, offsets, count)
    if b <= a:
        return np.empty(0, dtype=np.int64)
    full = count // BLOCK_SIZE
    b0 = min(a // BLOCK_SIZE, full)
    b1 = min((b + BLOCK_SIZE - 1) // BLOCK_SIZE, full)
    parts = []
    if b1 > b0:
        parts.append(_batch_unpack_full(
            blob, offsets[b0:b1].astype(np.int64)).ravel())
    if b > full * BLOCK_SIZE:
        start = int(offsets[full]) if full < offsets.size else blob.size
        tail = varint_decode(blob[start:], count=count - full * BLOCK_SIZE)
        parts.append(tail.astype(np.int64))
    vals = parts[0] if len(parts) == 1 else np.concatenate(parts)
    off = b0 * BLOCK_SIZE
    return vals[a - off : b - off]


def _batch_unpack_full(blob: np.ndarray, offs: np.ndarray,
                       out: np.ndarray | None = None) -> np.ndarray:
    """Decode many full bitpacked blocks at once -> (n, BLOCK_SIZE) int64
    (written into ``out`` when given — callers pass a view of their
    final buffer to skip a full-size copy).

    Groups blocks by bit width (the numpy stand-in for the reference's
    SIMD batch unpack, ``core/utils/simd_utils.hpp``). For widths <= 56
    each value is read as ONE unaligned little-endian uint64 window at
    its starting byte, then shift+mask — pure integer ops (the previous
    unpackbits + float-matmul recomposition moved ~50x more memory and
    dominated cold decode). Two loop orientations: small batches build
    one (g, 128) index matrix; large batches iterate the 128 value
    positions so every temporary stays cache-resident instead of
    streaming multi-MB arrays through this VM's thin memory bus.
    Widths > 56 (never produced by 32k-doc segments) take an exact
    float64 matmul fallback."""
    n = offs.size
    if out is None:
        out = np.empty((n, BLOCK_SIZE), dtype=np.int64)
    widths = blob[offs].astype(np.int64)
    uniq = np.unique(widths)
    win = None
    if ((uniq > 8) & (uniq <= 56)).any():
        # 8-byte zero pad so the last value's uint64 window never runs
        # off the buffer; the unaligned overlapping uint64 view costs
        # nothing to build (stride 1 byte over the padded bytes)
        pad = np.empty(blob.size + 8, np.uint8)
        pad[:blob.size] = blob
        pad[blob.size:] = 0
        win = np.ndarray(shape=(pad.size - 7,), dtype="<u8",
                         buffer=pad.data, strides=(1,))
    idx = np.arange(BLOCK_SIZE, dtype=np.int64)
    for w in uniq:
        g = np.flatnonzero(widths == w)
        w = int(w)
        if w == 0:
            out[g] = 0
        elif w <= 8:
            # dense-term fast path: at width <= 8 the packed payload is
            # 16*w bytes/block, so one contiguous gather + ONE
            # unpackbits call per width group moves up to 60x less
            # memory than the per-value 8-byte window gather below
            # (doc-delta streams of high-df terms are width 1-3, their
            # tf streams width 4-6)
            nb = (BLOCK_SIZE * w) // 8  # 128*w always divisible by 8
            gather = (offs[g][:, None] + 1 + np.arange(nb)).ravel()
            bits = np.unpackbits(blob[gather].reshape(g.size, nb),
                                 axis=1, bitorder="little")
            if w == 1:
                out[g] = bits
            else:
                # recombine in uint8 (values < 2**8): 1/8 the temp
                # traffic of int64 accumulation, one widening at the end
                b3 = bits.reshape(g.size, BLOCK_SIZE, w)
                acc = b3[:, :, 0].copy()
                for b in range(1, w):
                    acc |= b3[:, :, b] << b
                out[g] = acc
        elif w <= 56 and g.size >= 1024:
            bit = idx * w
            byte_off = bit >> 3
            shift = (bit & 7).astype(np.uint64)
            mask = np.uint64((1 << w) - 1)
            off1 = offs[g] + 1
            whole = g.size == n
            for j in range(BLOCK_SIZE):
                col = (win[off1 + byte_off[j]] >> shift[j]) & mask
                if whole:
                    out[:, j] = col.view(np.int64)
                else:
                    out[g, j] = col.view(np.int64)
        elif w <= 56:
            bit = idx * w
            byte_off = bit >> 3
            shift = (bit & 7).astype(np.uint64)
            starts = offs[g][:, None] + 1 + byte_off[None, :]
            words = win[starts.ravel()].reshape(g.size, BLOCK_SIZE)
            out[g] = ((words >> shift[None, :])
                      & np.uint64((1 << w) - 1)).astype(np.int64)
        else:
            nb = (BLOCK_SIZE * w + 7) // 8
            gather = (offs[g][:, None] + 1 + np.arange(nb)).ravel()
            bits = np.unpackbits(
                blob[gather].reshape(g.size, nb), axis=1,
                count=BLOCK_SIZE * w, bitorder="little",
            ).reshape(-1, w)
            vals_f = bits.astype(np.float64) @ (2.0 ** np.arange(w))
            out[g] = vals_f.reshape(g.size, BLOCK_SIZE).astype(np.int64)
    return out


class PostingList:
    """Fully decoded posting list for one term in one segment."""

    __slots__ = ("docs", "tfs", "positions", "run_tfs")

    def __init__(self, docs, tfs, positions=None, run_tfs=None):
        self.docs = docs          # local doc ids, ascending, 1-based
        self.tfs = tfs            # term frequency per doc
        self.positions = positions  # flat positions grouped per doc (or None)
        self.run_tfs = run_tfs

    def positions_for(self, i: int) -> np.ndarray:
        """Positions of the i-th doc in the list."""
        starts = np.concatenate(([0], np.cumsum(self.tfs)))
        return self.positions[starts[i] : starts[i + 1]]


class BlockCursor:
    """Per-block iterator over one posting list (wanderator analogue,
    ``core/formats/formats_10.cpp:2426-2546``): exposes per-block
    ``last_doc`` / ``max_tf`` / ``min_dl`` so callers can skip blocks
    whose BM25 upper bound is below the current top-k threshold."""

    def __init__(self, df, doc_blob, freq_blob, doc_off, freq_off,
                 last_doc, max_tf, min_dl):
        self.df = df
        self.doc_blob = doc_blob
        self.freq_blob = freq_blob
        self.doc_off = doc_off
        self.freq_off = freq_off
        self.last_doc = last_doc
        self.max_tf = max_tf
        self.min_dl = min_dl
        self.n_blocks = last_doc.size

    def block_count(self, j: int) -> int:
        full = self.df // BLOCK_SIZE
        if j < full:
            return BLOCK_SIZE
        return self.df - full * BLOCK_SIZE

    def decode_block(self, j: int) -> tuple[np.ndarray, np.ndarray]:
        """Decode block j -> (docs ascending 1-based, tfs)."""
        cnt = self.block_count(j)
        base = int(self.last_doc[j - 1]) if j > 0 else 0
        if j < self.df // BLOCK_SIZE:
            deltas = bitunpack_block(self.doc_blob, int(self.doc_off[j])).astype(np.int64)
            tfs = bitunpack_block(self.freq_blob, int(self.freq_off[j])).astype(np.int64)
        else:
            d_end = int(self.doc_off[j + 1]) if j + 1 < self.n_blocks else self.doc_blob.size
            f_end = int(self.freq_off[j + 1]) if j + 1 < self.n_blocks else self.freq_blob.size
            deltas = varint_decode(self.doc_blob[int(self.doc_off[j]) : d_end], cnt).astype(np.int64)
            tfs = varint_decode(self.freq_blob[int(self.freq_off[j]) : f_end], cnt).astype(np.int64)
        docs = base + np.cumsum(deltas)
        return docs, tfs

    def decode_blocks(self, idxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Batched decode of a selected set of block ordinals (ascending)
        -> concatenated (docs, tfs). Full blocks use the width-grouped
        batch unpack; bases come from the skip list's last_doc."""
        if idxs.size == 0:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        full_n = self.df // BLOCK_SIZE
        full_sel = idxs[idxs < full_n]
        parts_d, parts_t = [], []
        if full_sel.size:
            d_deltas = _batch_unpack_full(self.doc_blob, self.doc_off[full_sel])
            tfs = _batch_unpack_full(self.freq_blob, self.freq_off[full_sel])
            bases = np.where(full_sel > 0, self.last_doc[full_sel - 1], 0)
            docs = np.cumsum(d_deltas, axis=1) + bases[:, None]
            parts_d.append(docs.ravel())
            parts_t.append(tfs.ravel())
        if idxs[-1] >= full_n:  # tail block selected
            d, t = self.decode_block(self.n_blocks - 1)
            parts_d.append(d)
            parts_t.append(t)
        return np.concatenate(parts_d), np.concatenate(parts_t)
