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


def funnel(ds, steps: list, window_s: float,
           user_col: str = "user_id", type_col: str = "event_type",
           ts_col: str = "ts", buckets: int = 64):
    """Ordered funnel conversion (the clickstream funnel operator):
    for each step k, count users with events e_0 < e_1 < ... < e_k of
    types ``steps[0..k]`` at strictly increasing timestamps with
    ``ts_k - ts_0 <= window_s`` seconds. Existential semantics — ANY
    qualifying chain counts the user once.

    -> Dataset(step_idx, step, n_users), one row per step.

    Kernel: the greedy-minimal-successor chain from every step-0 event
    (the SloppyPhrase kernel over (user_rank << 45 | dt_us) keys —
    greedy minimizes ts_k for a given start, so a user converts iff
    some start's greedy chain fits the window; exact, no per-event or
    per-user Python). Scale shape: users are hash-bucketed
    (``user % buckets``) so ONE shuffle builds bucket groups and the
    chain kernel runs vectorized across every user in the bucket;
    per-bucket distinct-user counts sum exactly because a user lives in
    exactly one bucket."""
    import pyarrow as pa

    window_us = np.int64(round(window_s * 1_000_000))
    steps = list(steps)
    ns = len(steps)
    SH = np.int64(45)  # dt fits 2^45 us (~1 year) per bucket

    def add_bucket(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        u = t.column(user_col).to_numpy(zero_copy_only=False)
        keep = pc.is_in(t.column(type_col),
                        value_set=pa.array(steps))
        return t.append_column(
            "bucket", pa.array((u % buckets).astype(np.int64))
        ).filter(keep)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        dt = ts - ts.min()
        users = g[user_col].to_numpy(dtype=np.int64)
        uniq = np.unique(users)
        rank = np.searchsorted(uniq, users).astype(np.int64)
        key = (rank << SH) | dt
        types = g[type_col].to_numpy()
        per_step = []
        for s in steps:
            k = np.sort(key[types == s])
            per_step.append(k)
        counts = np.zeros(ns, dtype=np.int64)
        start = per_step[0]
        counts[0] = np.unique(start >> SH).size
        cur = start
        for si in range(1, ns):
            k = per_step[si]
            if cur.size == 0 or k.size == 0:
                break
            idx = np.searchsorted(k, cur + 1)
            ok = idx < k.size
            nxt = k[np.minimum(idx, max(k.size - 1, 0))]
            ok &= (nxt >> SH) == (cur >> SH)
            start, cur = start[ok], nxt[ok]
            within = (cur - start) <= window_us
            counts[si] = np.unique(start[within] >> SH).size
        return pd.DataFrame({
            "step_idx": np.arange(ns, dtype=np.int64),
            "step": steps,
            "n_users": counts,
        })

    from ray.data.aggregate import Sum

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))
    # per-bucket partials sum exactly (a user lives in one bucket);
    # the result is ns rows, so naming the steps driver-side is free
    agg = parts.groupby("step_idx").aggregate(Sum("n_users")).to_pandas()
    agg = agg.rename(columns={"sum(n_users)": "n_users"}) \
        .sort_values("step_idx").reset_index(drop=True)
    agg["step"] = [steps[i] for i in agg["step_idx"]]
    agg["n_users"] = agg["n_users"].astype("int64")
    return agg[["step_idx", "step", "n_users"]]


def retention_cohorts(ds, n_periods: int, period_s: float = 86400.0,
                      user_col: str = "user_id", ts_col: str = "ts",
                      buckets: int = 64):
    """Retention cohort matrix: cohort = the period of a user's FIRST
    event; for each (cohort, k < n_periods), count users with any
    activity in period cohort+k. -> Dataset(cohort_period, period_k,
    n_users) with k=0 being the cohort size.

    Scale shape: ONE user-hash shuffle (``user % buckets``); inside a
    bucket the per-user first period and distinct (user, period) pairs
    are pure numpy (sort + reduceat-style first-occurrence masks), and
    the bucket emits (cohort, k) partial counts that sum exactly across
    buckets because each user lives in exactly one. The second groupby
    runs over cohort-matrix-sized partials, not events."""
    import pyarrow as pa

    period_us = np.int64(round(period_s * 1_000_000))

    def add_bucket(t: pa.Table) -> pa.Table:
        u = t.column(user_col).to_numpy(zero_copy_only=False)
        return t.append_column(
            "bucket", pa.array((u.astype(np.int64) % buckets)))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy().astype("datetime64[us]").astype(np.int64)
        users = g[user_col].to_numpy(dtype=np.int64)
        period = ts // period_us
        # distinct (user, period)
        order = np.lexsort((period, users))
        u, p = users[order], period[order]
        keep = np.empty(u.size, dtype=bool)
        keep[0] = True
        keep[1:] = (u[1:] != u[:-1]) | (p[1:] != p[:-1])
        u, p = u[keep], p[keep]
        # first period per user = first row of each user run (sorted)
        first_mask = np.empty(u.size, dtype=bool)
        first_mask[0] = True
        first_mask[1:] = u[1:] != u[:-1]
        cohort = np.repeat(p[first_mask],
                           np.diff(np.append(np.flatnonzero(first_mask),
                                             u.size)))
        k = p - cohort
        ok = k < n_periods
        key = cohort[ok] * np.int64(n_periods) + k[ok]
        uniq, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "cohort_period": uniq // np.int64(n_periods),
            "period_k": uniq % np.int64(n_periods),
            "n_users": cnt.astype(np.int64),
        })

    from ray.data.aggregate import Sum

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket").map_groups(per_bucket,
                                           batch_format="pandas"))
    out = (parts.groupby(["cohort_period", "period_k"])
           .aggregate(Sum("n_users")).to_pandas()
           .rename(columns={"sum(n_users)": "n_users"}))
    out["n_users"] = out["n_users"].astype("int64")
    return out.sort_values(["cohort_period", "period_k"]) \
        .reset_index(drop=True)
