"""Gap-based sessionization over event streams — the classic
clickstream / training-data operator (no reference analogue; part of
the large-scale pipeline surface next to the windowed aggregate in
``__ray_entry__.events_hourly``).

Scale shape: ONE shuffle keyed on the user column (``groupby``), then
fully vectorized gap detection + per-session reduction inside each
group (np.diff / cumsum / reduceat — no per-event Python). A user's
events always fit one group at sane retention; a pathological hot user
can be pre-salted by (user, coarse time bucket) and re-merged, which
this module deliberately leaves to the caller because the re-merge must
re-join sessions across bucket edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def sessionize(ds, gap_s: float = 1800.0, user_col: str = "user_id",
               ts_col: str = "ts", value_col: str = "value",
               order_col: str = "event_id"):
    """-> Dataset(user_id, session_idx, n_events, sum_value_c,
    start_us, end_us): consecutive events of a user belong to one
    session while the gap stays <= ``gap_s`` seconds.

    ``sum_value_c`` sums the value column in integer CENTS
    (round(value*100)) so the aggregate is order-independent and
    bit-exact against a SQL oracle regardless of float summation order.
    """
    gap_us = np.int64(round(gap_s * 1_000_000))

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, order_col], kind="stable")
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = ts.size
        brk = np.zeros(n, dtype=np.int64)
        if n > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        starts = np.flatnonzero(np.diff(sid, prepend=-1))
        counts = np.diff(np.append(starts, n))
        cents = np.round(
            g[value_col].to_numpy(dtype=np.float64) * 100.0).astype(np.int64)
        return pd.DataFrame({
            user_col: np.full(starts.size, g[user_col].iloc[0],
                              dtype=np.int64),
            "session_idx": sid[starts],
            "n_events": counts,
            "sum_value_c": np.add.reduceat(cents, starts),
            "start_us": ts[starts],
            "end_us": ts[np.append(starts[1:], n) - 1],
        })

    return ds.groupby(user_col).map_groups(fn, batch_format="pandas")
