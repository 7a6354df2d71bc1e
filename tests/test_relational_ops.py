"""Interval join, broadcast semi/anti join, group reservoir sample,
and CCNet perplexity buckets — each checked against a pandas/numpy
brute-force reference on small random inputs."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=3_000, seed=11) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 25, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["click", "view", "purchase"])[rng.integers(0, 3, n)]),
        "ts": pa.array(
            (np.int64(1_700_000_000_000_000)
             + rng.integers(0, 3 * 10**9, n)).astype("datetime64[us]")),
    })


def test_interval_join_matches_bruteforce(ray_session):
    import ray.data

    from iresearch_ray.pipelines.windows import interval_join

    t = _events()
    pdf = t.to_pandas()
    w_us = 400_000_000  # 400s windows over a 3000s span -> real overlap
    pur = pdf[pdf["event_type"] == "purchase"]
    right = pa.table({
        "user_id": pa.array(pur["user_id"].to_numpy()),
        "start": pa.array(pur["ts"].to_numpy()),
        "end": pa.array(pur["ts"].to_numpy()
                        + np.timedelta64(w_us, "us")),
        "win_id": pa.array(pur["event_id"].to_numpy()),
    })
    out = interval_join(
        ray.data.from_arrow(t), ray.data.from_arrow(right),
        by="user_id", on="ts", start_col="start", end_col="end",
        left_id="event_id", right_id="win_id").to_pandas()

    # brute force: cross join per user, filter BETWEEN
    exp = pdf.merge(pur, on="user_id", suffixes=("", "_p"))
    lo = exp["ts_p"]
    hi = exp["ts_p"] + np.timedelta64(w_us, "us")
    exp = exp[(exp["ts"] >= lo) & (exp["ts"] <= hi)]
    exp_pairs = set(zip(exp["event_id"], exp["event_id_p"]))
    got_pairs = set(zip(out["event_id"], out["win_id"]))
    assert got_pairs == exp_pairs and len(out) == len(exp)
    # dt_us is the left ts minus window start
    m = out.merge(pur, left_on="win_id", right_on="event_id")
    src = pdf.set_index("event_id").loc[m["event_id_x"]]
    dt = (src["ts"].to_numpy() - m["ts"].to_numpy()) \
        .astype("timedelta64[us]").astype(np.int64)
    assert (m["dt_us"].to_numpy() == dt).all()


def test_broadcast_semi_anti_join(ray_session):
    import ray.data

    from iresearch_ray.pipelines.relational import broadcast_semi_join

    t = _events()
    probe = ray.data.from_arrow(
        pa.table({"user_id": pa.array(np.arange(40, dtype=np.int64)),
                  "tag": pa.array([f"u{i}" for i in range(40)])}))
    build = ray.data.from_arrow(t).filter(
        expr="event_type == 'purchase'")
    semi = broadcast_semi_join(probe, build, "user_id", "user_id") \
        .to_pandas()
    anti = broadcast_semi_join(probe, build, "user_id", "user_id",
                               anti=True).to_pandas()
    present = set(np.unique(
        t.to_pandas().query("event_type == 'purchase'")["user_id"]))
    assert set(semi["user_id"]) == present
    assert set(anti["user_id"]) == set(range(40)) - present
    assert len(semi) + len(anti) == 40
    assert list(semi.columns) == ["user_id", "tag"]  # schema preserved


def test_group_reservoir_sample_deterministic(ray_session):
    import ray.data

    from iresearch_ray.pipelines.sampling import (_hash32,
                                                  group_reservoir_sample)

    t = _events()
    a = group_reservoir_sample(ray.data.from_arrow(t), "event_type",
                               "event_id", n=7).to_pandas()
    # independent of block layout
    b = group_reservoir_sample(
        ray.data.from_arrow(t).repartition(13), "event_type",
        "event_id", n=7).to_pandas()
    key = lambda d: sorted(zip(d["event_type"], d["event_id"]))
    assert key(a) == key(b)
    # equals the n smallest hashes per group
    pdf = t.to_pandas()
    pdf["h"] = _hash32(pdf["event_id"].to_numpy())
    for et, g in pdf.groupby("event_type"):
        exp = g.sort_values(["h", "event_id"]).head(7)["event_id"]
        got = a[a["event_type"] == et]["event_id"]
        assert sorted(got) == sorted(exp)


def test_perplexity_buckets_ntile(ray_session):
    import ray.data

    from iresearch_ray.pipelines.lm import perplexity_buckets

    rng = np.random.default_rng(3)
    n = 1000
    t = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "lang": pa.array(np.array(["en", "de", "fr"])[
            rng.integers(0, 3, n)]),
        "lm_logprob_r": pa.array(
            np.round(rng.normal(-5, 1, n), 4)),
    })
    out = perplexity_buckets(ray.data.from_arrow(t)).to_pandas()
    pdf = t.to_pandas()
    for lang, g in pdf.groupby("lang"):
        g = g.sort_values(["lm_logprob_r", "doc_id"],
                          ascending=[False, True])
        m = len(g)
        sizes = np.full(3, m // 3)
        sizes[: m % 3] += 1
        exp = np.repeat(["head", "middle", "tail"], sizes)
        got = out.set_index("doc_id").loc[g["doc_id"], "bucket"]
        assert (got.to_numpy() == exp).all()
    # every doc bucketed exactly once
    assert len(out) == n and out["doc_id"].is_unique
