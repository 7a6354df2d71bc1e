"""Mergeable cardinality sketches (HyperLogLog) over Ray Data.

No reference analogue (the reference is a fulltext engine); HLL is the
standard mergeable distinct-count sketch a 100-TB curation pipeline
uses where ``aggregates.distinct_count`` (exact, ships every distinct
pair through a shuffle) is too heavy — e.g. distinct users per event
type over a year of logs, distinct URLs per domain.

Algorithm: Flajolet, Fusy, Gandouet, Meunier, "HyperLogLog: the
analysis of a near-optimal cardinality estimation algorithm" (AofA
2007), with the small-range linear-counting correction from the same
paper.  2^p registers; each key hashes once (the repo-wide FNV word
fold, ``dedup._hash_strings`` — the same kernel the DuckDB oracles
replicate bit-exactly); the top p bits pick a register, the rank of
the remaining 64-p bits (leading-zero count + 1) max-updates it.

Scale shape — the whole point of the sketch:

- per batch: ONE vectorized pass builds a dense (groups x m) uint8
  register block and emits only its NONZERO cells as (group, j, rank)
  rows, so at most G*m tiny rows per batch cross the exchange no
  matter how many data rows the batch held (a combiner, like
  ``group_histogram``);
- the shuffle is ``groupby(group, j).max(rank)`` — register merge IS
  elementwise max, associative and commutative, so shard/segment/node
  sketches combine without re-reading data (the property that makes
  HLL the cluster-scale answer);
- the estimator runs per group on <= m register rows via
  ``map_groups`` — never on the driver, never over data rows.

Determinism: the estimate is a pure function of the register
multiset.  The 2^-M_j harmonic sum is accumulated as an INTEGER
numerator sum(2^(53-M_j)) (exact in int128, order-independent) and
divided into a precomputed float constant once, so the DuckDB oracle
reproduces the estimate bit-for-bit (no float-accumulation-order
hazard); ln() in the linear-counting branch is the platform libm on
both sides.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

from .dedup import _hash_strings

_U64 = np.uint64


def _fmix64(h: np.ndarray) -> np.ndarray:
    """Full murmur3 fmix64 finalizer (public domain constants) over a
    uint64 array — the avalanche step both sketches need on top of the
    repo's FNV word fold, whose top bits stay constant for short keys.
    Replicated in the DuckDB oracles via 32-bit split multiplies."""
    h = (h ^ (h >> _U64(33))) * _U64(0xFF51AFD7ED558CCD)
    h = (h ^ (h >> _U64(33))) * _U64(0xC4CEB9FE1A85EC53)
    return h ^ (h >> _U64(33))


def _alpha(m: int) -> float:
    """FFGM07 bias constant (the published >=128-register form)."""
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(ds, group_col: str, key_col: str, p: int = 12):
    """-> Dataset(group, j, rank): merged HLL registers per group —
    only register j's that were hit appear (absent j == rank 0).

    ``key_col`` is hashed as a string (cast upstream if numeric) so
    the hash — and therefore the whole sketch — is reproducible in
    the SQL oracle.
    """
    m = 1 << p
    wbits = 64 - p  # rank window; ranks are 1..wbits+1

    def combiner(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = _fmix64(_hash_strings(keys.cast(pa.large_string())))
        bucket = (h >> _U64(wbits)).astype(np.int64)
        w = h & _U64((1 << wbits) - 1)
        # bit length via frexp: w < 2^52 is exactly representable in
        # float64, and frexp's exponent IS the bit length for w > 0.
        _, e = np.frexp(w.astype(np.float64))
        rank = np.where(w == 0, wbits + 1, wbits + 1 - e).astype(np.uint8)

        gcodes, guniq = pd.factorize(batch.column(group_col).to_pandas())
        dense = np.zeros((len(guniq), m), dtype=np.uint8)
        np.maximum.at(dense, (gcodes, bucket), rank)
        gi, j = np.nonzero(dense)
        return pa.table({
            group_col: pa.array(guniq[gi]),
            "j": pa.array(j.astype(np.int64)),
            "rank": pa.array(dense[gi, j].astype(np.int64)),
        })

    parts = ds.map_batches(combiner, batch_format="pyarrow")
    return parts.groupby([group_col, "j"]).max("rank")


def hll_cardinality(ds, group_col: str, key_col: str, p: int = 12,
                    out_col: str = "n_distinct_hll"):
    """-> Dataset(group, n_distinct_hll, v_zero): HLL cardinality
    estimate per group (FFGM07 raw estimator + linear-counting
    small-range correction), deterministic given the key set."""
    m = 1 << p
    wbits = 64 - p
    # alpha * m^2 * 2^(wbits+1), folded to one float so engine and SQL
    # divide the identical constant by the identical integer numerator.
    c_num = ((_alpha(m) * m) * m) * float(1 << (wbits + 1))

    regs = hll_registers(ds, group_col, key_col, p)

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        r = g["max(rank)"].to_numpy(dtype=np.int64)
        # integer harmonic numerator: unseen registers contribute
        # 2^(wbits+1) each, seen ones 2^(wbits+1-rank) — exact Python
        # ints via an exponent histogram (a plain int64 sum could
        # overflow at 4096 * 2^52 = 2^64).
        expo_counts = np.bincount(wbits + 1 - r)
        num = sum(int(c) << e for e, c in enumerate(expo_counts) if c) \
            + (m - r.size) * (1 << (wbits + 1))
        v_zero = m - r.size
        est = c_num / float(num)
        if v_zero > 0 and est <= 2.5 * m:
            est = m * math.log(m / v_zero)
        return pd.DataFrame({
            group_col: [g[group_col].iloc[0]],
            out_col: np.array([math.floor(est + 0.5)], dtype=np.int64),
            "v_zero": np.array([v_zero], dtype=np.int64),
        })

    return regs.groupby(group_col).map_groups(estimate,
                                              batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------


def cms_sketch(ds, key_col: str, w: int = 8192, d: int = 4):
    """-> Dataset(i, col, n): merged Count-Min sketch of a key stream
    — d rows of w counters; only nonzero cells appear.

    The d row hashes use the standard double-hashing scheme
    col_i = (a + i*b) mod w with (a, b) the two 32-bit halves of one
    fmix64-finalized key hash (b forced odd) — Kirsch & Mitzenmacher
    2006 shows pairwise-independence suffices for CMS bounds, and one
    hash chain keeps the SQL oracle to a single replica.

    Scale shape (the sketch's reason to exist): per batch ONE
    vectorized pass builds a dense (d, w) int64 partial and emits its
    nonzero cells, so at most d*w count rows per batch cross the
    exchange regardless of batch rows; the shuffle is
    ``groupby(i, col).sum`` — counter merge is addition, associative,
    commutative and EXACT (integer), so the merged sketch — and every
    estimate read from it — is block-layout invariant and bit-exactly
    reproducible in the DuckDB oracle.
    """

    def combiner(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        h = _fmix64(_hash_strings(keys.cast(pa.large_string())))
        a = (h & _U64(0xFFFFFFFF)).astype(np.int64)
        b = ((h >> _U64(32)) | _U64(1)).astype(np.int64)
        dense = np.zeros((d, w), dtype=np.int64)
        for i in range(d):
            np.add.at(dense[i], (a + i * b) % w, 1)
        ii, col = np.nonzero(dense)
        return pa.table({
            "i": pa.array(ii.astype(np.int64)),
            "col": pa.array(col.astype(np.int64)),
            "n": pa.array(dense[ii, col]),
        })

    parts = ds.map_batches(combiner, batch_format="pyarrow")
    return parts.groupby(["i", "col"]).sum("n")


def cms_probe_counts(ds, key_col: str, probes: list[str],
                     w: int = 8192, d: int = 4) -> pd.DataFrame:
    """-> DataFrame(key, est): CMS point estimates for a fixed probe
    list — est >= true count always, with the usual (eps, delta)
    overcount bound (eps = e/w, delta = e^-d). Collecting the merged
    sketch to the driver is bounded by d*w cells — the sketch IS the
    bounded summary; data rows never leave their batches."""
    sk = cms_sketch(ds, key_col, w=w, d=d).to_pandas()
    dense = np.zeros((d, w), dtype=np.int64)
    dense[sk["i"].to_numpy(), sk["col"].to_numpy()] = \
        sk["sum(n)"].to_numpy()

    ph = _fmix64(_hash_strings(pa.array(probes, pa.large_string())))
    a = (ph & _U64(0xFFFFFFFF)).astype(np.int64)
    b = ((ph >> _U64(32)) | _U64(1)).astype(np.int64)
    est = np.min(np.stack([dense[i, (a + i * b) % w]
                           for i in range(d)]), axis=0)
    return pd.DataFrame({"key": probes, "est": est.astype(np.int64)}) \
        .sort_values("key").reset_index(drop=True)
