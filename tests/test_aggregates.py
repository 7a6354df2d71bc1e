"""Distributed aggregates (pipelines/aggregates.py), context windows
(pipelines/windows.context_windows) and duplicated-passage spans
(pipelines/textstats.dup_passage_spans) vs independent in-process
recomputation (numpy / brute-force Python)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _events(n=5_000, seed=7) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(rng.integers(0, 40, n).astype(np.int64)),
        "event_type": pa.array(
            np.array(["click", "view", "error"])[rng.integers(0, 3, n)]),
        "value": pa.array(rng.uniform(0, 120, n)),
        "ts": pa.array(
            (np.int64(1_700_000_000_000_000)
             + rng.integers(0, 10**9, n)).astype("datetime64[us]")),
    })


def test_group_quantiles_exact(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_quantiles

    t = _events()
    out = group_quantiles(ray.data.from_arrow(t), "event_type", "value",
                          (0.25, 0.5, 0.9)).to_pandas()
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        exp = np.quantile(g["value"].to_numpy(), [0.25, 0.5, 0.9])
        got = out[out["event_type"] == et].sort_values("q")["value"]
        assert np.allclose(got.to_numpy(), exp, rtol=0, atol=0)


def test_distinct_count_exact(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import distinct_count

    t = _events()
    out = distinct_count(ray.data.from_arrow(t).repartition(8),
                         "event_type", "user_id").to_pandas()
    exp = t.to_pandas().groupby("event_type")["user_id"].nunique()
    for et, n in exp.items():
        assert int(out[out["event_type"] == et]["n_distinct"].iloc[0]) == n


def test_group_histogram_counts(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_histogram

    t = _events()
    out = group_histogram(ray.data.from_arrow(t).repartition(8),
                          "event_type", "value", 0.0, 100.0, 10).to_pandas()
    pdf = t.to_pandas()
    bins = np.clip(np.floor(pdf["value"].to_numpy() / 10.0), 0, 9) \
        .astype(np.int64)
    exp = pd.DataFrame({"event_type": pdf["event_type"], "bin": bins}) \
        .value_counts().sort_index()
    assert int(out["n"].sum()) == len(pdf)
    for (et, b), n in exp.items():
        row = out[(out["event_type"] == et) & (out["bin"] == b)]
        assert int(row["n"].iloc[0]) == n


def test_context_windows_frame(ray_session):
    import ray.data

    from iresearch_ray.pipelines.windows import context_windows

    t = _events(n=800)
    out = context_windows(ray.data.from_arrow(t), k=3).to_pandas()
    pdf = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    exp = {}
    for _, g in pdf.groupby("user_id"):
        types = g["event_type"].tolist()
        for i, eid in enumerate(g["event_id"]):
            exp[eid] = " ".join(types[max(0, i - 3):i])
    got = dict(zip(out["event_id"], out["ctx"]))
    assert got == exp


def test_dup_passage_spans_planted(ray_session):
    import ray.data

    from iresearch_ray.pipelines.textstats import dup_passage_spans

    passage = " ".join(f"tok{i}" for i in range(12))    # 12 shared tokens
    docs = [
        f"alpha beta {passage} gamma",                  # dup at pos 2..14
        f"{passage} delta epsilon zeta",                # dup at pos 0..12
        "totally unrelated words only here now",        # no dup
    ]
    t = pa.table({"doc_id": pa.array([0, 1, 2], type=pa.int64()),
                  "text": pa.array(docs)})
    out = dup_passage_spans(ray.data.from_arrow(t), n=8).to_pandas() \
        .sort_values(["doc_id", "start_pos"]).reset_index(drop=True)
    # 12-token shared passage -> 5 dup windows -> one merged span of 12
    assert out.to_dict("records") == [
        {"doc_id": 0, "start_pos": 2, "end_pos": 14},
        {"doc_id": 1, "start_pos": 0, "end_pos": 12},
    ]


def test_group_topk_combiner(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_topk

    t = _events(n=3_000)
    out = group_topk(ray.data.from_arrow(t).repartition(6),
                     "user_id", "value", n=2, id_col="event_id") \
        .to_pandas().sort_values(["user_id", "rank"]).reset_index(drop=True)
    pdf = t.to_pandas()
    exp = pdf.sort_values(["value", "event_id"],
                          ascending=[False, True], kind="mergesort") \
        .groupby("user_id").head(2)
    exp = exp.sort_values(["user_id", "value"], ascending=[True, False])
    assert len(out) == len(exp)
    assert out["event_id"].tolist() == exp["event_id"].tolist()
    assert (out.groupby("user_id")["rank"].apply(
        lambda r: r.tolist() == list(range(1, len(r) + 1)))).all()


def test_pq_encode_and_adc_recall(ray_session):
    import ray.data

    from iresearch_ray.pipelines.ann import (cosine_topk, pq_encode,
                                             pq_topk, train_pq)

    rng = np.random.default_rng(21)
    # clustered corpus (PQ quantizes structure, not uniform noise)
    centers = rng.standard_normal((8, 32)) * 3.0
    vecs = np.concatenate(
        [c + rng.standard_normal((50, 32)) for c in centers])
    t = pa.table({"vec_id": pa.array(np.arange(400), type=pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    books = train_pq(vecs, m=8, ks=32, iters=12)
    assert books.shape == (8, 32, 4)
    codes = pq_encode(ds, books)
    cpdf = codes.to_pandas()
    assert len(cpdf) == 400 and all(len(c) == 8 for c in cpdf["pq_code"])
    # deterministic: re-encode gives identical codes
    cpdf2 = pq_encode(ds, books).to_pandas()
    m = cpdf.sort_values("vec_id").merge(cpdf2.sort_values("vec_id"),
                                         on="vec_id")
    assert (m["pq_code_x"] == m["pq_code_y"]).all()
    q = vecs[7:8]
    exact = cosine_topk(ds, q, k=10)
    # raw ADC: every candidate must come from the query's true cluster
    approx = pq_topk(ray.data.from_pandas(cpdf), books, q, k=10)
    assert (approx["vec_id"] < 50).all()
    # refined (exact re-rank of 4k ADC candidates): high recall
    refined = pq_topk(ray.data.from_pandas(cpdf), books, q, k=10,
                      refine_ds=ds, refine_factor=6)
    recall = len(set(exact["vec_id"]) & set(refined["vec_id"])) / 10
    assert recall >= 0.7, recall


def test_filter_by_group_quantile(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import filter_by_group_quantile

    t = _events(n=4_000)
    out = filter_by_group_quantile(ray.data.from_arrow(t), "event_type",
                                   "value", q=0.5).to_pandas()
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        thr = np.quantile(g["value"].to_numpy(), 0.5)
        exp = set(g[g["value"] >= thr]["event_id"])
        got = set(out[out["event_type"] == et]["event_id"])
        assert got == exp


def test_ivfpq_index_recall(ray_session, tmp_path):
    import ray.data

    from iresearch_ray.pipelines.ann import (build_ivfpq_index, cosine_topk,
                                             ivfpq_topk)

    rng = np.random.default_rng(33)
    centers = rng.standard_normal((6, 32)) * 3.0
    vecs = np.concatenate(
        [c + rng.standard_normal((60, 32)) for c in centers])
    t = pa.table({"vec_id": pa.array(np.arange(360), type=pa.int64()),
                  "embedding": pa.array(vecs.tolist(),
                                        type=pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(t)
    idx = str(tmp_path / "ivfpq")
    meta = build_ivfpq_index(ds, idx, n_lists=6, m=8, ks=32, sample=360)
    assert meta["n_lists"] == 6
    q = vecs[11:12]
    exact = cosine_topk(ds, q, k=10)
    approx = ivfpq_topk(idx, q, k=10, n_probe=2, refine_factor=6)
    recall = len(set(exact["vec_id"]) & set(approx["vec_id"])) / 10
    assert recall >= 0.8, recall
    # scores are exact cosine after the refine pass
    both = exact.merge(approx, on="vec_id", suffixes=("_e", "_a"))
    assert np.allclose(both["cosine_e"], both["cosine_a"])


def test_hll_cardinality_accuracy_and_merge(ray_session):
    """HLL estimate within 5% of exact at two cardinality regimes, and
    block-layout invariant (repartitioning must not change a merged
    sketch — register merge is max, associative + commutative)."""
    import ray.data

    from iresearch_ray.pipelines.sketches import hll_cardinality

    rng = np.random.default_rng(11)
    n = 30_000
    t = pa.table({
        "g": pa.array(np.where(rng.integers(0, 2, n) == 0, "lo", "hi")),
        "k": pa.array(np.char.add("u", np.where(
            rng.integers(0, 2, n) == 0,
            rng.integers(0, 200, n),        # interleaved; per-group
            rng.integers(0, 20_000, n),     # mix of hot + long tail
        ).astype("U8"))),
    })
    exact = t.to_pandas().groupby("g")["k"].nunique()

    out1 = hll_cardinality(ray.data.from_arrow(t).repartition(2),
                           "g", "k").to_pandas().set_index("g")
    out2 = hll_cardinality(ray.data.from_arrow(t).repartition(13),
                           "g", "k").to_pandas().set_index("g")
    # layout invariance: identical estimates from identical registers
    assert out1["n_distinct_hll"].to_dict() == out2["n_distinct_hll"].to_dict()
    for g, ex in exact.items():
        est = int(out1.loc[g, "n_distinct_hll"])
        assert abs(est - ex) / ex < 0.05, (g, est, ex)


def test_hll_registers_match_reference_bits(ray_session):
    """Register (j, rank) pairs equal a scalar-Python HLL over the
    same hash chain (guards the frexp bit-length kernel and the
    murmur finalizer against silent drift)."""
    import ray.data

    from iresearch_ray.pipelines.dedup import _hash_strings
    from iresearch_ray.pipelines.sketches import hll_registers

    keys = [f"key-{i*i}" for i in range(997)]
    t = pa.table({"g": pa.array(["x"] * len(keys)), "k": pa.array(keys)})
    got = hll_registers(ray.data.from_arrow(t).repartition(4), "g", "k") \
        .to_pandas().set_index("j")["max(rank)"].to_dict()

    regs: dict[int, int] = {}
    h = _hash_strings(pa.array(keys, pa.large_string()))
    for hv in h:
        hv = int(hv)
        hv = ((hv ^ (hv >> 33)) * 0xFF51AFD7ED558CCD) % (1 << 64)
        hv = ((hv ^ (hv >> 33)) * 0xC4CEB9FE1A85EC53) % (1 << 64)
        hv ^= hv >> 33
        j, w = hv >> 52, hv & ((1 << 52) - 1)
        rank = 53 - w.bit_length() if w else 53
        regs[j] = max(regs.get(j, 0), rank)
    assert got == regs


def test_cms_overcount_bound_and_layout_invariance(ray_session):
    """CMS point estimates always >= the true count, are block-layout
    invariant (counter merge is exact integer addition), and stay
    within the eps*N overcount bound (w=8192 -> eps*N ~ N*e/8192)."""
    import ray.data

    from iresearch_ray.pipelines.sketches import cms_probe_counts

    rng = np.random.default_rng(5)
    n = 40_000
    # zipf-ish: key j with prob ~ 1/(j+1)
    ks = np.char.add("k", (rng.zipf(1.3, n) % 500).astype("U8"))
    t = pa.table({"k": pa.array(ks)})
    probes = ["k1", "k7", "k99", "k499", "nope"]
    exact = {p: int((ks == p).sum()) for p in probes}

    out1 = cms_probe_counts(ray.data.from_arrow(t).repartition(3),
                            "k", probes).set_index("key")["est"]
    out2 = cms_probe_counts(ray.data.from_arrow(t).repartition(17),
                            "k", probes).set_index("key")["est"]
    assert out1.to_dict() == out2.to_dict()
    bound = int(np.ceil(np.e * n / 8192)) * 2
    for p in probes:
        assert exact[p] <= out1[p] <= exact[p] + bound, \
            (p, exact[p], int(out1[p]))


def test_approx_group_quantiles_error_bound(ray_session):
    """Sketch quantiles within one bin width of exact disc quantiles,
    and layout invariant (histogram merge is exact integer sum)."""
    import ray.data

    from iresearch_ray.pipelines.aggregates import approx_group_quantiles

    t = _events(n=8_000)
    qs = (0.25, 0.5, 0.9)
    out1 = approx_group_quantiles(
        ray.data.from_arrow(t).repartition(3), "event_type", "value",
        0.0, 120.0, bits=14, qs=qs).to_pandas()
    out2 = approx_group_quantiles(
        ray.data.from_arrow(t).repartition(11), "event_type", "value",
        0.0, 120.0, bits=14, qs=qs).to_pandas()
    k1 = out1.sort_values(["event_type", "q"])["value_q"].tolist()
    k2 = out2.sort_values(["event_type", "q"])["value_q"].tolist()
    assert k1 == k2
    step = 120.0 / (1 << 14)
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        v = np.sort(g["value"].to_numpy())
        for q in qs:
            exact = v[max(0, int(np.ceil(q * len(v))) - 1)]  # disc
            got = out1[(out1["event_type"] == et)
                       & (out1["q"] == q)]["value_q"].iloc[0]
            assert abs(got - exact) <= step, (et, q, got, exact)


def test_group_corr_exact_and_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_corr

    t = _events(n=6_000)
    # y correlated with x per group (plus deterministic noise) so the
    # corr is non-trivial in every group
    x = t.column("value").to_numpy()
    y = (np.round(x * 3).astype(np.int64)
         + (np.arange(len(x)) % 17)) // 2
    t = t.append_column("y", pa.array(y.astype(np.int64)))

    out1 = group_corr(ray.data.from_arrow(t).repartition(2),
                      "event_type", "value", "y",
                      round_to=None).to_pandas()
    out2 = group_corr(ray.data.from_arrow(t).repartition(13),
                      "event_type", "value", "y",
                      round_to=None).to_pandas()
    o1 = out1.sort_values("event_type").reset_index(drop=True)
    o2 = out2.sort_values("event_type").reset_index(drop=True)
    # bit-identical across block layouts (exact integer moments)
    assert o1["corr_r"].tolist() == o2["corr_r"].tolist()
    assert o1["n"].tolist() == o2["n"].tolist()

    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        xi = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        yi = g["y"].to_numpy().astype(np.int64)
        want = np.corrcoef(xi.astype(np.float64),
                           yi.astype(np.float64))[0, 1]
        got = o1[o1["event_type"] == et]["corr_r"].iloc[0]
        assert abs(got - want) < 1e-9, (et, got, want)


def test_composite_agg_pages_cover_all_buckets(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import composite_agg

    t = _events(n=4_000)
    ds = ray.data.from_arrow(t).repartition(5)
    pdf = t.to_pandas()
    want = (pdf.groupby(["event_type", "user_id"]).size()
            .reset_index(name="n").sort_values(["event_type", "user_id"])
            .reset_index(drop=True))

    pages, after = [], None
    while True:
        page = composite_agg(ds, ["event_type", "user_id"], size=7,
                             after=after)
        if page.empty:
            break
        pages.append(page)
        after = tuple(page.iloc[-1][["event_type", "user_id"]])
        if len(page) < 7:
            break
    got = pd.concat(pages, ignore_index=True)
    assert got["n"].astype(int).tolist() == want["n"].tolist()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["user_id"].astype(int).tolist() == want["user_id"].tolist()


def test_percentile_ranks_exact_and_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import percentile_ranks

    t = _events(n=5_000)
    probes = [10.0, 60.0, 119.0]
    out1 = percentile_ranks(ray.data.from_arrow(t).repartition(2),
                            "event_type", "value", probes,
                            round_to=None).to_pandas()
    out2 = percentile_ranks(ray.data.from_arrow(t).repartition(9),
                            "event_type", "value", probes,
                            round_to=None).to_pandas()
    o1 = out1.sort_values(["event_type", "probe"]).reset_index(drop=True)
    o2 = out2.sort_values(["event_type", "probe"]).reset_index(drop=True)
    assert o1["rank_r"].tolist() == o2["rank_r"].tolist()
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        v = g["value"].to_numpy()
        for p in probes:
            want = float((v <= p).sum()) / len(v)
            got = o1[(o1["event_type"] == et)
                     & (o1["probe"] == p)]["rank_r"].iloc[0]
            assert got == want, (et, p)


def test_group_extended_stats_exact(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_extended_stats

    t = _events(n=4_000)
    out1 = group_extended_stats(ray.data.from_arrow(t).repartition(2),
                                "event_type", "value",
                                round_to=None).to_pandas()
    out2 = group_extended_stats(ray.data.from_arrow(t).repartition(7),
                                "event_type", "value",
                                round_to=None).to_pandas()
    o1 = out1.sort_values("event_type").reset_index(drop=True)
    o2 = out2.sort_values("event_type").reset_index(drop=True)
    for c in ("n", "min_c", "max_c", "sum_c", "avg_r", "var_r"):
        assert o1[c].tolist() == o2[c].tolist(), c
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        row = o1[o1["event_type"] == et].iloc[0]
        assert row["n"] == len(c) and row["min_c"] == c.min() \
            and row["max_c"] == c.max() and row["sum_c"] == c.sum()
        assert abs(row["avg_r"] - c.mean() / 100) < 1e-9
        assert abs(row["var_r"] - c.astype(np.float64).var() / 1e4) < 1e-6


def test_group_weighted_avg_exact_and_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_weighted_avg

    t = _events(n=4_000)
    t = t.append_column(
        "w", pa.array((np.arange(4_000) % 17 + 1).astype(np.int64)))
    out1 = group_weighted_avg(ray.data.from_arrow(t).repartition(2),
                              "event_type", "value", "w",
                              round_to=None).to_pandas()
    out2 = group_weighted_avg(ray.data.from_arrow(t).repartition(11),
                              "event_type", "value", "w",
                              round_to=None).to_pandas()
    o1 = out1.sort_values("event_type").reset_index(drop=True)
    o2 = out2.sort_values("event_type").reset_index(drop=True)
    assert o1["n"].tolist() == o2["n"].tolist()
    assert o1["wavg_r"].tolist() == o2["wavg_r"].tolist()
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        w = g["w"].to_numpy()
        want = float((c * w).sum()) / float(w.sum()) / 100.0
        row = o1[o1["event_type"] == et].iloc[0]
        assert row["n"] == len(c)
        assert abs(row["wavg_r"] - want) < 1e-9, et


def test_group_top_metrics_winner_and_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_top_metrics

    t = _events(n=4_000)
    out1 = group_top_metrics(ray.data.from_arrow(t).repartition(2),
                             "event_type", "value", "event_id")
    out2 = group_top_metrics(ray.data.from_arrow(t).repartition(13),
                             "event_type", "value", "event_id")
    assert out1["sort_c"].tolist() == out2["sort_c"].tolist()
    assert out1["metric"].tolist() == out2["metric"].tolist()
    pdf = t.to_pandas()
    for et, g in pdf.groupby("event_type"):
        c = np.round(g["value"].to_numpy() * 100).astype(np.int64)
        ids = g["event_id"].to_numpy()
        best = c.max()
        want = ids[c == best].min()   # tie: smallest metric wins
        row = out1[out1["event_type"] == et].iloc[0]
        assert row["sort_c"] == best and row["metric"] == want, et


def test_group_ttest_welch_exact_and_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_ttest

    t = _events(n=4_000)
    out1 = group_ttest(ray.data.from_arrow(t).repartition(2),
                       "event_type", "value", "click", "error",
                       round_to=None)
    out2 = group_ttest(ray.data.from_arrow(t).repartition(9),
                       "event_type", "value", "click", "error",
                       round_to=None)
    assert out1["t_r"].iloc[0] == out2["t_r"].iloc[0]
    assert out1["df_r"].iloc[0] == out2["df_r"].iloc[0]
    # Welch t from the quantized values, independently recomputed
    pdf = t.to_pandas()
    a = np.round(pdf[pdf.event_type == "click"]["value"].to_numpy()
                 * 100) / 100.0
    b = np.round(pdf[pdf.event_type == "error"]["value"].to_numpy()
                 * 100) / 100.0
    va, vb = a.var(ddof=1), b.var(ddof=1)
    se2 = va / len(a) + vb / len(b)
    t_want = (a.mean() - b.mean()) / np.sqrt(se2)
    df_want = se2 * se2 / ((va / len(a)) ** 2 / (len(a) - 1)
                           + (vb / len(b)) ** 2 / (len(b) - 1))
    assert out1["n_a"].iloc[0] == len(a) and out1["n_b"].iloc[0] == len(b)
    assert abs(out1["t_r"].iloc[0] - t_want) < 1e-9
    assert abs(out1["df_r"].iloc[0] - df_want) < 1e-6


def test_group_string_stats_exact_and_layout_invariant(ray_session):
    import math
    from collections import Counter

    import ray.data

    from iresearch_ray.pipelines.aggregates import group_string_stats

    rng = np.random.default_rng(11)
    letters = np.array(list("abcdefg xyz"))
    texts = ["".join(rng.choice(letters, rng.integers(3, 40)))
             for _ in range(600)]
    groups = np.array(["p", "q", "r"])[rng.integers(0, 3, 600)]
    t = pa.table({"g": pa.array(groups), "s": pa.array(texts)})
    out1 = group_string_stats(
        ray.data.from_arrow(t).repartition(2), "g", "s", round_to=None)
    out2 = group_string_stats(
        ray.data.from_arrow(t).repartition(13), "g", "s", round_to=None)
    assert out1.equals(out2)
    for gval in ("p", "q", "r"):
        sub = [s for s, g in zip(texts, groups) if g == gval]
        c = Counter("".join(sub))
        n_chars = sum(c.values())
        acc = 0.0
        for b in sorted(ord(ch) for ch in c):
            x = float(c[chr(b)])
            acc += x * math.log2(x)
        want_h = math.log2(n_chars) - acc / n_chars
        row = out1[out1["g"] == gval].iloc[0]
        assert row["n"] == len(sub)
        assert row["min_len"] == min(len(s) for s in sub)
        assert row["max_len"] == max(len(s) for s in sub)
        assert row["avg_len_r"] == sum(len(s) for s in sub) / len(sub)
        assert row["entropy_r"] == want_h, gval


def test_auto_date_histogram_interval_choice(ray_session):
    import ray.data

    from iresearch_ray.pipelines.aggregates import (AUTO_HISTO_LADDER,
                                                    auto_date_histogram)

    t = _events(n=3_000)
    out1 = auto_date_histogram(ray.data.from_arrow(t).repartition(2),
                               "ts", target_buckets=40)
    out2 = auto_date_histogram(ray.data.from_arrow(t).repartition(9),
                               "ts", target_buckets=40)
    assert out1.equals(out2)
    assert int(out1["n"].sum()) == 3_000
    # the chosen interval is the smallest ladder entry fitting 40
    e = t.column("ts").cast(pa.int64()).to_numpy() // 1_000_000
    mn, mx = int(e.min()), int(e.max())
    want = next(i for i in AUTO_HISTO_LADDER
                if mx // i - mn // i + 1 <= 40)
    assert out1["interval_s"].iloc[0] == want
    assert len(out1) <= 40
    # a tighter target forces a coarser interval
    coarse = auto_date_histogram(ray.data.from_arrow(t), "ts",
                                 target_buckets=3)
    assert coarse["interval_s"].iloc[0] > want and len(coarse) <= 3


def test_group_top_metrics_rejects_float_metric(ray_session):
    """ADVICE r3: a float metric would be silently truncated by the
    exact int64 winner/tie-break path — it must be rejected loudly."""
    import pyarrow as pa
    import pytest
    import ray.data

    from iresearch_ray.pipelines.aggregates import group_top_metrics

    t = pa.table({"g": ["a", "a"], "s": [1.0, 2.0], "m": [1.5, 2.5]})
    with pytest.raises(Exception) as ei:
        group_top_metrics(ray.data.from_arrow(t), "g", "s", "m")
    assert "float" in str(ei.value)


def test_auto_date_histogram_any_timestamp_unit(ray_session):
    """ADVICE r3: ns/ms/s timestamp columns must bucket identically to
    the us column (unit normalized before the integer epoch math)."""
    import pyarrow as pa
    import ray.data

    from iresearch_ray.pipelines.aggregates import auto_date_histogram

    import pyarrow.compute as pc

    t = _events(n=1_000)
    # truncate to whole seconds so every unit cast is lossless
    e = t.column("ts").cast(pa.int64())
    ts_us = pc.multiply(pc.divide(e, 1_000_000), 1_000_000) \
        .cast(pa.timestamp("us"))
    t = t.set_column(t.schema.get_field_index("ts"), "ts", ts_us)
    base = auto_date_histogram(ray.data.from_arrow(t), "ts",
                               target_buckets=30)
    for unit in ("ns", "ms", "s"):
        t2 = t.set_column(
            t.schema.get_field_index("ts"), "ts",
            t.column("ts").cast(pa.timestamp(unit)))
        out = auto_date_histogram(ray.data.from_arrow(t2), "ts",
                                  target_buckets=30)
        assert out["interval_s"].tolist() == base["interval_s"].tolist(), unit
        assert out["n"].tolist() == base["n"].tolist(), unit


def test_dup_gram_table_block_straddle_exact(ray_session):
    """ADVICE r4: a gram repeated within ONE doc whose position rows
    straddle block boundaries must NOT count as 2 distinct docs. The
    exact two-stage groupby dedups (doc, gram) globally, so block
    layout cannot change the df count."""
    import pyarrow as pa
    import ray.data

    from iresearch_ray.pipelines.textstats import _dup_gram_table

    # gram 7: twice in doc 1 but split across two input blocks -> df 1
    # gram 9: docs 2 and 3 (true dup)                         -> df 2
    b1 = pa.table({"doc_id": pa.array([1, 2], type=pa.int64()),
                   "ghash": pa.array([7, 9], type=pa.int64()),
                   "pos": pa.array([0, 0], type=pa.int64()),
                   "packed": pa.array([(1 << 32) + 0, (2 << 32) + 0],
                                      type=pa.int64())})
    b2 = pa.table({"doc_id": pa.array([1, 3], type=pa.int64()),
                   "ghash": pa.array([7, 9], type=pa.int64()),
                   "pos": pa.array([5, 1], type=pa.int64()),
                   "packed": pa.array([(1 << 32) + 5, (3 << 32) + 1],
                                      type=pa.int64())})
    ds = ray.data.from_arrow([b1, b2])  # one block per table

    dup = _dup_gram_table(ds, "doc_id", with_winner=False).to_pandas()
    assert sorted(dup["__dghash"].tolist()) == [9]

    win = _dup_gram_table(ds, "doc_id", with_winner=True).to_pandas()
    assert win["__dghash"].tolist() == [9]
    # keep-first winner: globally minimal packed (doc, pos) of gram 9
    assert win["wpacked"].tolist() == [(2 << 32) + 0]
