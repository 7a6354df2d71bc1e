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
