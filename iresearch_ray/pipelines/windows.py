"""As-of joins and sliding-window aggregates over event streams — the
two remaining time-series operators a large-scale training-data
pipeline needs next to ``sessions.sessionize`` and the tumbling
``events_hourly`` aggregate (no reference analogue; part of the
pipeline surface, verified against DuckDB ASOF JOIN / RANGE windows).

Scale shape (both operators): ONE shuffle keyed on the entity column,
then fully vectorized per-group work (sort + ``np.searchsorted`` +
cumsum — no per-event Python).  The as-of join co-partitions both
inputs by tagging each side and shuffling the *union* once, so neither
side is broadcast and skew salting applies to the single combined
exchange; when the right side is known-small, broadcast it with
``ray.put`` and skip the shuffle entirely (caller's choice — this
module implements the general co-partitioned form).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def asof_join(left, right, by: str = "user_id", on: str = "ts",
              id_col: str = "event_id"):
    """Inner as-of join: for each left row, the right row of the same
    ``by`` key with the greatest ``on`` <= left ``on`` (ties on equal
    timestamps match, like SQL ``ASOF JOIN ... ON l.ts >= r.ts``).

    -> Dataset(<by>, left_id, right_id, lag_us).  Left rows with no
    prior right row are dropped (inner semantics), which keeps the
    output schema null-free and bit-comparable to a SQL oracle.

    Both inputs are Datasets with at least (by, on, id_col).  The two
    sides are tagged and unioned so the groupby shuffles each input
    exactly once; inside a group one stable argsort orders the right
    side and one ``searchsorted(side="right") - 1`` resolves every left
    row — O((nl+nr) log nr) per key, zero Python per row.
    """
    def tag(side: int):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select([by, on, id_col])
            return t.append_column(
                "_side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
        return fn

    u = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow"))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        side = g["_side"].to_numpy(dtype=np.int8)
        lm = side == 0
        l_ts, l_id = ts[lm], ids[lm]
        r_order = np.argsort(ts[~lm], kind="stable")
        r_ts, r_id = ts[~lm][r_order], ids[~lm][r_order]
        if l_ts.size == 0 or r_ts.size == 0:
            return pd.DataFrame({by: np.empty(0, np.int64),
                                 "left_id": np.empty(0, np.int64),
                                 "right_id": np.empty(0, np.int64),
                                 "lag_us": np.empty(0, np.int64)})
        idx = np.searchsorted(r_ts, l_ts, side="right") - 1
        ok = idx >= 0
        idx = idx[ok]
        return pd.DataFrame({
            by: np.full(int(ok.sum()), g[by].iloc[0], dtype=np.int64),
            "left_id": l_id[ok],
            "right_id": r_id[idx],
            "lag_us": l_ts[ok] - r_ts[idx],
        })

    return u.groupby(by).map_groups(per_key, batch_format="pandas")


def sliding_window(ds, window_s: float = 3600.0, by: str = "user_id",
                   on: str = "ts", value_col: str = "value",
                   id_col: str = "event_id"):
    """Trailing RANGE window per event: for every event, the count and
    cents-exact value sum of the same key's events in
    ``[ts - window_s, ts]`` — inclusive on both ends and including
    equal-timestamp peers, exactly SQL's ``RANGE BETWEEN INTERVAL ...
    PRECEDING AND CURRENT ROW`` frame.

    -> Dataset(<by>, <id_col>, n_w, sum_value_c_w).  Values are summed
    in integer cents (round(value*100)) via one cumsum + two
    searchsorteds per group, so results are order-independent and
    bit-exact against the DuckDB oracle.
    """
    win_us = np.int64(round(window_s * 1_000_000))

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([on, id_col], kind="stable")
        ts = g[on].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = g[id_col].to_numpy(dtype=np.int64)
        cents = np.round(
            g[value_col].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        # frame = rows with ts_j in [ts_i - win, ts_i]; 'right' upper
        # bound pulls in equal-ts peers ordered after row i (RANGE
        # frames are peer-inclusive), 'left' lower bound keeps the
        # boundary event at exactly ts_i - win.
        lo = np.searchsorted(ts, ts - win_us, side="left")
        hi = np.searchsorted(ts, ts, side="right")
        csum = np.concatenate(([0], np.cumsum(cents)))
        return pd.DataFrame({
            by: np.full(ts.size, g[by].iloc[0], dtype=np.int64),
            id_col: ids,
            "n_w": (hi - lo).astype(np.int64),
            "sum_value_c_w": csum[hi] - csum[lo],
        })

    return ds.groupby(by).map_groups(per_key, batch_format="pandas")


def interval_join(left, right, by: str = "user_id", on: str = "ts",
                  start_col: str = "start", end_col: str = "end",
                  left_id: str = "event_id", right_id: str = "interval_id"):
    """Inner range (interval) join: every (left, right) pair of the
    same ``by`` key with left ``on`` in ``[start, end]`` (both ends
    inclusive, SQL ``l.ts BETWEEN r.start AND r.end``).

    -> Dataset(<by>, <left_id>, <right_id>, dt_us) where ``dt_us`` =
    left ``on`` − interval start (microseconds).

    Scale shape: like :func:`asof_join`, both sides are tagged and
    unioned so ONE shuffle on ``by`` co-partitions them; per group the
    right side is sorted by start once, then every left row resolves
    its candidate slice with two ``searchsorted`` calls against
    ``[ts − max_width, ts]`` (``max_width`` = the group's widest
    interval) and the expansion is one ``repeat`` + offset ``arange``
    — no per-row Python and no cross-pair materialization beyond the
    true candidates. Caveat (standard for range joins): one interval
    much wider than its group's median inflates every row's candidate
    slice; at production scale split long intervals into max-width
    slabs before the join (slab id folded into ``right_id``).
    """
    def tag_left(t: pa.Table) -> pa.Table:
        ts = t.column(on)
        return pa.table({by: t.column(by), "_t1": ts, "_t2": ts,
                         "_id": t.column(left_id),
                         "_side": pa.array(
                             np.zeros(t.num_rows, dtype=np.int8))})

    def tag_right(t: pa.Table) -> pa.Table:
        return pa.table({by: t.column(by), "_t1": t.column(start_col),
                         "_t2": t.column(end_col),
                         "_id": t.column(right_id),
                         "_side": pa.array(
                             np.ones(t.num_rows, dtype=np.int8))})

    u = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow"))

    empty = {by: np.empty(0, np.int64), left_id: np.empty(0, np.int64),
             right_id: np.empty(0, np.int64), "dt_us": np.empty(0, np.int64)}

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        t1 = g["_t1"].to_numpy().astype("datetime64[us]").astype(np.int64)
        t2 = g["_t2"].to_numpy().astype("datetime64[us]").astype(np.int64)
        ids = g["_id"].to_numpy(dtype=np.int64)
        lm = g["_side"].to_numpy(dtype=np.int8) == 0
        l_ts, l_id = t1[lm], ids[lm]
        r_order = np.lexsort((ids[~lm], t1[~lm]))
        r_lo, r_hi = t1[~lm][r_order], t2[~lm][r_order]
        r_id = ids[~lm][r_order]
        if l_ts.size == 0 or r_lo.size == 0:
            return pd.DataFrame(empty)
        max_w = np.int64(max((r_hi - r_lo).max(), 0))
        lo = np.searchsorted(r_lo, l_ts - max_w, side="left")
        hi = np.searchsorted(r_lo, l_ts, side="right")
        counts = hi - lo
        li = np.repeat(np.arange(l_ts.size), counts)
        # offset-arange: position within each left row's candidate run
        ri = np.arange(li.size) - np.repeat(
            np.cumsum(counts) - counts, counts) + lo[li]
        ok = r_hi[ri] >= l_ts[li]
        li, ri = li[ok], ri[ok]
        return pd.DataFrame({
            by: np.full(li.size, g[by].iloc[0], dtype=np.int64),
            left_id: l_id[li],
            right_id: r_id[ri],
            "dt_us": l_ts[li] - r_lo[ri],
        })

    return u.groupby(by).map_groups(per_key, batch_format="pandas")


def context_windows(ds, k: int = 3, by: str = "user_id", on: str = "ts",
                    id_col: str = "event_id", text_col: str = "event_type",
                    sep: str = " "):
    """Per-event training context: for each event, the ``sep``-joined
    ``text_col`` values of its up-to-``k`` PRECEDING events of the same
    ``by`` key in (``on``, ``id_col``) order — the next-turn-prediction
    context-assembly step over a conversation/event stream (SQL
    equivalent: ``string_agg(text) OVER (PARTITION BY by ORDER BY on,
    id ROWS BETWEEN k PRECEDING AND 1 PRECEDING)``).

    -> Dataset(<by>, <id_col>, ctx) — ctx is '' for each key's first
    event. ONE shuffle on the key; inside a group the k shifted
    column slices are joined element-wise (no per-row Python).
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([on, id_col], kind="stable")
        txt = g[text_col].astype(str).to_numpy(dtype=object)
        n = txt.size
        ctx = np.full(n, "", dtype=object)
        # shift s = k..1 (oldest piece first): rows s..n-1 gain
        # txt[i-s]; appending each more-recent piece AFTER the
        # accumulated context reproduces the SQL frame's order
        for s in range(min(k, n - 1), 0, -1):
            piece = txt[:n - s]
            has = ctx[s:] != ""
            ctx[s:] = np.where(has, ctx[s:] + sep + piece, piece)
        return pd.DataFrame({
            by: g[by].to_numpy(dtype=np.int64),
            id_col: g[id_col].to_numpy(dtype=np.int64),
            "ctx": ctx,
        })

    return ds.groupby(by).map_groups(per_key, batch_format="pandas")
