"""Posting-list compression codec: vectorized varint + bitpacked 128-blocks.

Mirrors the *semantics* of the reference postings format
(``core/formats/formats_10.cpp:86-131,640-790``): doc ids are
delta-encoded; full blocks of 128 values are bit-packed with a per-block
bit width (SIMD-BP128-style — here a numpy kernel, same block size);
the tail (< 128 values) is varint-encoded. Per-block metadata
(last doc id, byte offsets, max term frequency, min doc length) is the
analogue of the reference skip list + WAND block-max entries
(``core/formats/formats_10.cpp:501-533``, ``core/formats/wand_writer.hpp``).

Everything here is pure numpy, fully vectorized — no per-value Python
loops (loops run over byte-position <= 10 or bit-width <= 32 only), so
the encoder stays fast inside ``map_batches`` on many-MB batches.
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128

# ---------------------------------------------------------------------------
# varint (LEB128) — vectorized over the whole value array
# ---------------------------------------------------------------------------


def varint_byte_lengths(values: np.ndarray) -> np.ndarray:
    """Number of varint bytes each value needs (vectorized; passes stop
    at the column max — typical delta streams need 2 passes, not 9)."""
    v = values.astype(np.uint64, copy=False)
    n = np.ones(v.shape, dtype=np.int64)
    vmax = int(v.max()) if v.size else 0
    for shift in range(7, 64, 7):
        if vmax < (1 << shift):
            break
        n += (v >= (np.uint64(1) << np.uint64(shift))).astype(np.int64)
    return n


def varint_encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> bytes:
    """LEB128-encode an array of non-negative ints into one byte blob.
    ``nbytes`` (from ``varint_byte_lengths``) may be passed to avoid
    recomputing the per-value byte counts."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    if nbytes is None:
        nbytes = varint_byte_lengths(v)
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    out = np.zeros(int(starts[-1] + nbytes[-1]), dtype=np.uint8)
    rem = v.copy()
    for j in range(int(nbytes.max())):
        act = nbytes > j
        b = (rem[act] & np.uint64(0x7F)).astype(np.uint8)
        more = (nbytes[act] > j + 1).astype(np.uint8)
        out[starts[act] + j] = b | (more << 7)
        rem >>= np.uint64(7)
    return out.tobytes()


def varint_decode(buf: bytes | np.ndarray, count: int | None = None) -> np.ndarray:
    """Decode a varint blob back to uint64 values (vectorized).

    Allocation-lean: per-value lengths are computed with one subtract
    into a preallocated buffer (``np.append`` + ``np.diff`` copied the
    start array twice per call, which dominated cold position decodes
    on multi-MB streams)."""
    raw = np.frombuffer(buf, dtype=np.uint8) if not isinstance(buf, np.ndarray) else buf
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    cont = (raw & 0x80) != 0
    is_start = np.empty(raw.shape, dtype=bool)
    is_start[0] = True
    np.logical_not(cont[:-1], out=is_start[1:])
    starts = np.flatnonzero(is_start)
    if count is not None:
        starts = starts[:count]
    n = starts.size
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    lengths = np.empty(n, dtype=np.int64)
    np.subtract(starts[1:], starts[:-1], out=lengths[:-1])
    lengths[-1] = raw.size - starts[-1]
    maxlen = int(lengths.max())
    if maxlen <= 8:
        # fast path (every stream this codec writes: values < 2^56):
        # ONE unaligned little-endian uint64 window per value, then
        # shift/mask arithmetic — no per-byte gathers
        pad = np.empty(raw.size + 8, np.uint8)
        pad[:raw.size] = raw
        pad[raw.size:] = 0
        win = np.ndarray(shape=(pad.size - 7,), dtype="<u8",
                         buffer=pad.data, strides=(1,))
        words = win[starts]
        vals = words & np.uint64(0x7F)
        for j in range(1, maxlen):
            contrib = ((words >> np.uint64(8 * j)) & np.uint64(0x7F)) \
                << np.uint64(7 * j)
            contrib *= lengths > j
            vals |= contrib
        return vals
    vals = np.zeros(n, dtype=np.uint64)
    for j in range(maxlen):
        act = lengths > j if j else slice(None)
        idx = starts[act] + j
        vals[act] |= (raw[idx] & np.uint8(0x7F)).astype(np.uint64) \
            << np.uint64(7 * j)
    return vals


# ---------------------------------------------------------------------------
# bitpacked full blocks (BLOCK_SIZE values, fixed per-block width)
# ---------------------------------------------------------------------------


def bitpack_block(values: np.ndarray) -> bytes:
    """Pack exactly BLOCK_SIZE uint32 values: 1 width byte + packed bits."""
    v = np.ascontiguousarray(values, dtype=np.uint32)
    assert v.size == BLOCK_SIZE
    width = int(v.max()).bit_length() if v.max() > 0 else 1
    shifts = np.arange(width, dtype=np.uint32)
    bits = ((v[:, None] >> shifts) & np.uint32(1)).astype(np.uint8)
    packed = np.packbits(bits.ravel(), bitorder="little")
    return bytes([width]) + packed.tobytes()


_POWERS = (np.uint64(1) << np.arange(1, 33, dtype=np.uint64)) - np.uint64(1)


def bitpack_many(v2d: np.ndarray) -> list[bytes]:
    """Pack many full blocks at once: (n, BLOCK_SIZE) -> list of encoded
    block bytes (1 width byte + packed bits each). Grouped by width so
    there is one packbits call per distinct width."""
    v = np.ascontiguousarray(v2d, dtype=np.uint32)
    n = v.shape[0]
    maxs = v.max(axis=1)
    widths = np.searchsorted(_POWERS, maxs, side="left") + 1  # bits needed
    out: list[bytes] = [b""] * n
    for w in np.unique(widths):
        g = np.flatnonzero(widths == w)
        shifts = np.arange(int(w), dtype=np.uint32)
        bits = ((v[g][:, :, None] >> shifts) & np.uint32(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(g.size, -1), axis=1, bitorder="little")
        hdr = bytes([int(w)])
        for r, row in zip(g, packed):
            out[r] = hdr + row.tobytes()
    return out


def bitpack_blocks_flat(v2d: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack many full blocks into ONE flat buffer (order preserved).

    (n, BLOCK_SIZE) -> (uint8 buffer, per-block byte lengths incl. the
    width header). One packbits call per distinct width; per-block
    placement is a vectorized scatter — no per-block Python. This is
    the whole-segment batch form of ``bitpack_many`` (the per-term list
    form), used so a segment/merge encode touches Python once per
    WIDTH, not once per term."""
    v = np.ascontiguousarray(v2d, dtype=np.uint32)
    n = v.shape[0]
    if n == 0:
        return np.empty(0, np.uint8), np.empty(0, np.int64)
    maxs = v.max(axis=1)
    widths = (np.searchsorted(_POWERS, maxs, side="left") + 1).astype(np.int64)
    lens = 1 + (BLOCK_SIZE * widths + 7) // 8
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    out = np.zeros(int(lens.sum()), dtype=np.uint8)
    out[starts] = widths.astype(np.uint8)
    for w in np.unique(widths):
        g = np.flatnonzero(widths == w)
        shifts = np.arange(int(w), dtype=np.uint32)
        bits = ((v[g][:, :, None] >> shifts) & np.uint32(1)).astype(np.uint8)
        packed = np.packbits(bits.reshape(g.size, -1), axis=1, bitorder="little")
        nb = packed.shape[1]
        idx = (starts[g][:, None] + 1 + np.arange(nb)).ravel()
        out[idx] = packed.ravel()
    return out, lens


def bitpack_block_size(width: int) -> int:
    """Encoded byte size (incl. width header) of a full block."""
    return 1 + (BLOCK_SIZE * width + 7) // 8


def bitunpack_block(buf: np.ndarray, offset: int) -> np.ndarray:
    """Decode one full block starting at byte ``offset``; returns uint32[128]."""
    width = int(buf[offset])
    nbytes = (BLOCK_SIZE * width + 7) // 8
    bits = np.unpackbits(
        buf[offset + 1 : offset + 1 + nbytes], count=BLOCK_SIZE * width, bitorder="little"
    ).reshape(BLOCK_SIZE, width)
    shifts = np.arange(width, dtype=np.uint64)
    return (bits.astype(np.uint64) << shifts).sum(axis=1).astype(np.uint32)


# ---------------------------------------------------------------------------
# flat multi-list delta+varint encode (the common path: one numpy pass for
# EVERY term in a segment, then per-term byte-range slicing)
# ---------------------------------------------------------------------------


def delta_encode_lists(values: np.ndarray, list_starts: np.ndarray) -> np.ndarray:
    """Delta-encode many concatenated ascending lists in one pass.

    ``values`` is the concatenation of per-list ascending ints;
    ``list_starts`` marks the first index of each list. The first element
    of each list is kept as-is (delta from 0), matching the reference's
    per-term doc-delta stream reset (``core/index/field_data.cpp:744-790``).
    """
    v = values.astype(np.int64, copy=True)
    if v.size == 0:
        return v
    deltas = np.empty_like(v)
    deltas[0] = v[0]
    deltas[1:] = v[1:] - v[:-1]
    deltas[list_starts] = v[list_starts]
    return deltas


def encode_lists_varint(
    values: np.ndarray, list_starts: np.ndarray, list_counts: np.ndarray
) -> tuple[bytes, np.ndarray]:
    """Varint-encode many concatenated lists in one vectorized pass.

    Returns ``(blob, byte_starts)`` where ``byte_starts[i]`` is the byte
    offset of list i in the blob (len == len(list_starts)). Because
    varint bytes are per-value independent, each list's bytes are simply
    the slice ``blob[byte_starts[i]:byte_starts[i+1]]``.
    """
    if values.size == 0:
        return b"", np.zeros(list_starts.size, dtype=np.int64)
    nbytes = varint_byte_lengths(values)
    cum = np.concatenate(([0], np.cumsum(nbytes)))
    blob = varint_encode(values, nbytes)
    byte_starts = cum[list_starts]
    return blob, byte_starts
