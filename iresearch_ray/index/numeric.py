"""Numeric-trie term encoding + range decomposition.

Rebuild of the reference numeric token stream / granular range
(``core/analysis/token_streams.hpp:118-140``,
``core/search/granular_range_filter.cpp``): an int64 value is indexed
as one term per precision level (precision_step=16, like the reference
64-bit default), and a numeric range decomposes into O(levels * step)
term ranges — exponentially fewer terms than a raw term range.

Term shape: ``"{shift:02d}x{value >> shift:016x}"`` over the
sign-flipped (sortable) unsigned representation — lexicographic order
within one shift level equals numeric order, so each decomposed range
is a dictionary range scan.
"""

from __future__ import annotations

import binascii

import numpy as np
import pyarrow as pa

PRECISION_STEP = 16
BITS = 64
_SIGN = 1 << 63
_MASK = (1 << 64) - 1


def to_sortable(values: np.ndarray) -> np.ndarray:
    """int64 -> uint64 preserving order (flip sign bit; reference
    numeric_utils sortable encoding)."""
    return (values.astype(np.int64).view(np.uint64) ^ np.uint64(_SIGN))


def float_to_sortable(values: np.ndarray) -> np.ndarray:
    """float64 -> uint64 preserving numeric order (IEEE-754 trick:
    negative floats flip all bits, positives flip the sign bit —
    the reference's double numeric stream encoding)."""
    bits = np.asarray(values, dtype=np.float64).view(np.uint64)
    neg = (bits >> np.uint64(63)) != 0
    out = np.where(neg, ~bits, bits ^ np.uint64(_SIGN))
    return out.astype(np.uint64)


def float_sortable_scalar(v: float) -> int:
    return int(float_to_sortable(np.asarray([v]))[0])


def term_at(shift: int, shifted_value: int) -> str:
    return f"{shift:02d}x{shifted_value:016x}"


def _hex16(u: np.ndarray) -> np.ndarray:
    """uint64 array -> |S16| lowercase-hex array, fully vectorized
    (big-endian byte view -> one hexlify -> reinterpret as 16-byte
    strings)."""
    raw = np.ascontiguousarray(u, dtype=">u8").tobytes()
    return np.frombuffer(binascii.hexlify(raw), dtype="S16")


def numeric_terms(values: np.ndarray, step: int = PRECISION_STEP,
                  float_values: bool = False) -> tuple[np.ndarray, pa.Array]:
    """All trie terms for a value column -> (doc_idx, terms) exploded.
    One term per precision level per doc (BITS/step levels).

    Vectorized: per level, shift the whole column, hexlify in one pass,
    and prepend the 3-byte ``{shift:02d}x`` prefix with np.char — no
    per-value Python formatting.
    """
    arr = np.asarray(values)
    u = float_to_sortable(arr) if float_values else to_sortable(arr)
    shifts = list(range(0, BITS, step))
    # doc-major order (all levels of doc 0, then doc 1, ...) to match
    # the tokenizer contract invert_tokens relies on
    doc_idx = np.repeat(np.arange(u.size, dtype=np.int64), len(shifts))
    per_level = np.empty((len(shifts), u.size), dtype="S19")
    for li, s in enumerate(shifts):
        prefixed = np.char.add(f"{s:02d}x".encode(),
                               _hex16(u >> np.uint64(s)))
        per_level[li] = prefixed
    terms_np = per_level.T.reshape(-1)  # doc-major
    return doc_idx, pa.array(terms_np).cast(pa.string())


def split_range(lo: int, hi: int, step: int = PRECISION_STEP
                ) -> list[tuple[int, int, int]]:
    """Decompose an inclusive sortable-unsigned range [lo, hi] into
    minimal per-level ranges [(shift, lo>>shift, hi>>shift), ...]
    (the LegacyNumericUtils.splitRange algorithm shape)."""
    out: list[tuple[int, int, int]] = []
    shift = 0
    while lo <= hi:
        next_shift = shift + step
        if next_shift >= BITS:
            out.append((shift, lo >> shift, hi >> shift))
            break
        diff = 1 << next_shift
        level_mask = diff - 1
        has_lower = (lo & level_mask) != 0
        has_upper = (hi & level_mask) != level_mask
        next_lo = ((lo + diff) if has_lower else lo) & ~level_mask & _MASK
        next_hi = ((hi - diff) if has_upper else hi) & ~level_mask & _MASK
        if next_lo > next_hi or next_lo < lo or next_hi > hi:
            # range too narrow for the next level: emit at this level
            out.append((shift, lo >> shift, hi >> shift))
            break
        if has_lower:
            out.append((shift, lo >> shift, (next_lo - 1) >> shift))
        if has_upper:
            # middle's last block covers [next_hi, next_hi + diff - 1]
            out.append((shift, (next_hi + diff) >> shift, hi >> shift))
        lo, hi = next_lo, next_hi
        shift = next_shift
    return out
