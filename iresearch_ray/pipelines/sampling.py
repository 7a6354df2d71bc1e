"""Deterministic hash sampling / split assignment over a keyed table —
training-data staples with no reference analogue (the closest is the
bounded scored-term sampling of ``core/search/
limited_sample_collector.hpp``, which samples TERMS, not documents).

Both operators are pure per-batch column math (one multiply + modulo
per row), so they stream through ``map_batches`` with zero state and
zero shuffle: at 10^12 rows the sample/split decision never leaves the
block it was read in. Determinism is the point — retries, resumes and
re-runs pick the identical rows, and the hash (Knuth multiplicative,
32-bit) is cheap to replicate in SQL for an exact oracle:
``(key * 2654435761) % 4294967296``.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_KNUTH = 2654435761  # 2^32 / golden ratio, Knuth multiplicative hash
_M32 = 1 << 32


def _hash32(keys: np.ndarray, salt: int = 0) -> np.ndarray:
    """(key * KNUTH + salt) mod 2^32 as uint64 — overflow-free for any
    int64 key (computed in uint64; DuckDB replica stays inside BIGINT
    as long as key < 2^31, which holds for row ids at any sf here)."""
    k = keys.astype(np.uint64, copy=False)
    return (k * np.uint64(_KNUTH) + np.uint64(salt)) % np.uint64(_M32)


def hash_sample(ds, key_col: str, rate: float, salt: int = 0):
    """Keep each row iff hash32(key) < rate * 2^32 — a deterministic
    Bernoulli(rate) sample keyed on ``key_col`` (same key -> same
    decision across runs, files and cluster sizes)."""
    thresh = np.uint64(int(rate * _M32))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_hash32(k, salt) < thresh))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, group_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      salt: int = 0):
    """Per-group deterministic Bernoulli sampling: keep a row iff
    hash32(key) < rate(group) * 2^32. The quota-curation staple
    (up/down-weight languages, sources or quality tiers) with the same
    zero-state zero-shuffle shape as ``hash_sample`` — the per-row
    threshold comes from the row's group via one dictionary-encode +
    ``take`` per batch, so group cardinality costs one small Python
    dict probe per DISTINCT group per batch, not per row."""
    thresh = {g: np.uint64(int(r * _M32)) for g, r in rates.items()}
    default_t = np.uint64(int(default_rate * _M32))

    def keep(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode() if g.type != pa.dictionary(
            pa.int32(), pa.string()) else g
        vals = enc.dictionary.to_pylist()
        tl = np.array([thresh.get(v, default_t) for v in vals] + [default_t],
                      dtype=np.uint64)
        idx = enc.indices.fill_null(len(vals)).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return batch.filter(pa.array(_hash32(k, salt) < tl[idx]))

    return ds.map_batches(keep, batch_format="pyarrow")


def assign_splits(ds, key_col: str,
                  fractions: dict[str, float] | None = None,
                  salt: int = 0, out_col: str = "split"):
    """Append a deterministic train/val/test label: the hash bucket
    ``h % 10000`` is cut at the cumulative fraction boundaries, in the
    given dict order. Fractions must sum to <= 1; any remainder gets
    the last label."""
    fractions = fractions or {"train": 0.8, "val": 0.1, "test": 0.1}
    names = list(fractions)
    bounds = np.cumsum([fractions[n] for n in names]) * 10000.0
    bounds = np.minimum(bounds.astype(np.int64), 10000)
    bounds[-1] = 10000
    labels = np.asarray(names, dtype=object)

    def label(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        b = (_hash32(k, salt) % np.uint64(10000)).astype(np.int64)
        idx = np.searchsorted(bounds, b, side="right")
        return batch.append_column(
            out_col, pa.array(labels[idx], type=pa.string()))

    return ds.map_batches(label, batch_format="pyarrow")

def group_reservoir_sample(ds, group_col: str, key_col: str, n: int = 5,
                           salt: int = 0):
    """Exactly ``n`` rows per group (fewer if the group is smaller),
    chosen as the ``n`` smallest ``hash32(key)`` values — a
    deterministic fixed-size-per-group reservoir sample: the selection
    is a pure function of the key set, so any block layout, cluster
    size, retry or resume picks the identical rows (unlike a classic
    randomized reservoir, which is order-dependent).

    -> Dataset(group, key) (input order of columns preserved from the
    args). Scale shape = ``aggregates.group_topk``: every batch prunes
    ITSELF to its local n smallest hashes per group (one lexsort +
    run-boundary rank), so at most n x groups_per_batch candidate rows
    cross the shuffle; ties (hash collisions) break by ascending key
    on both sides of the oracle."""

    def prune(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = batch.column(key_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        h = _hash32(k, salt)
        order = np.lexsort((k, h, gcodes))
        gs = gcodes[order]
        run_start = np.empty(gs.size, dtype=bool)
        if gs.size:
            run_start[0] = True
            run_start[1:] = gs[1:] != gs[:-1]
        starts = np.cumsum(run_start) - 1
        first = np.flatnonzero(run_start)
        rank = np.arange(gs.size) - first[starts]
        keep = order[rank < n]
        return pa.table({
            group_col: g.take(pa.array(np.sort(keep))),
            key_col: pa.array(k[np.sort(keep)]),
        })

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def final(grp):
        import pandas as pd
        k = grp[key_col].to_numpy(dtype=np.int64)
        h = _hash32(k, salt)
        order = np.lexsort((k, h))[:n]
        return pd.DataFrame({
            group_col: grp[group_col].to_numpy()[order],
            key_col: k[order],
        })

    return pruned.groupby(group_col).map_groups(final,
                                                batch_format="pandas")


def temperature_mix(ds, key_col: str, group_col: str, alpha: float = 0.5,
                    target_frac: float = 0.25, salt: int = 0):
    """Temperature-scaled source mixing (the GPT-3 / Pile mixture
    reweighting): sample so the kept corpus is ~``target_frac * N``
    rows distributed across groups proportional to ``n_g ** alpha``
    (alpha < 1 upweights small sources, alpha = 1 is uniform sampling):

        rate_g = min(1, ((target_frac * N) * n_g**alpha) / (S * n_g)),
        S = sum_g n_g**alpha

    The group-count groupby output is group-cardinality-sized (sources
    / languages — O(10..1e4) rows), so collecting it on the driver is a
    broadcast-side build, not a corpus materialization; the per-row
    decision then reuses ``stratified_sample``'s zero-shuffle hash
    threshold, so re-runs and resumes keep identical rows. The rate
    expression is evaluated in exactly the parenthesized order above so
    a SQL oracle reproduces the float bit-for-bit (alpha = 0.5 makes
    ``pow`` the IEEE-exact sqrt on both sides)."""
    rows = ds.groupby(group_col).count().take_all()
    counts = {r[group_col]: float(r["count()"]) for r in rows}
    n = 0.0
    s = 0.0
    for g in sorted(counts):
        n += counts[g]
        s += counts[g] ** alpha
    rates = {g: min(1.0, ((target_frac * n) * (c ** alpha)) / (s * c))
             for g, c in counts.items()}
    return stratified_sample(ds, key_col, group_col, rates, salt=salt)
