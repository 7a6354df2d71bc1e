"""DSIR importance resampling (pipelines/dsir): model fit parity with
a local replica, target enrichment of the selection, and seeded-Gumbel
determinism across block layouts."""

import numpy as np
import pyarrow as pa
import pytest


def _corpus():
    """Two sub-languages with disjoint high-frequency vocabulary: the
    'en'-like docs repeat target words, the 'xx' docs repeat others,
    and a handful of 'xx' docs are written in target vocabulary (the
    docs DSIR should surface)."""
    rng = np.random.default_rng(7)
    tgt_words = ["alpha", "beta", "gamma", "delta", "epsilon"]
    raw_words = ["zeta", "eta", "theta", "iota", "kappa"]
    rows = []
    for i in range(60):
        w = rng.choice(tgt_words, size=30)
        rows.append((i, " ".join(w), "en"))
    for i in range(60, 120):
        w = rng.choice(raw_words, size=30)
        rows.append((i, " ".join(w), "xx"))
    # planted: target-like text, non-target label
    for i in range(120, 130):
        w = rng.choice(tgt_words, size=30)
        rows.append((i, " ".join(w), "xx"))
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
    })


def test_fit_matches_local_replica(ray_session):
    import ray.data

    from iresearch_ray.pipelines.dsir import _dsir_features, fit_dsir

    t = _corpus()
    B = 512
    ds = ray.data.from_arrow(t).repartition(5)
    ratio = fit_dsir(ds, target_value="en", n_buckets=B)

    doc_idx, buckets = _dsir_features(t.column("text"), B)
    is_tgt = np.asarray(t.column("lang").to_numpy(zero_copy_only=False)) == "en"
    raw = np.bincount(buckets.astype(np.int64), minlength=B).astype(float)
    tgt = np.bincount(buckets[is_tgt[doc_idx]].astype(np.int64),
                      minlength=B).astype(float)
    expect = (np.log((tgt + 1) / (tgt.sum() + B))
              - np.log((raw + 1) / (raw.sum() + B)))
    np.testing.assert_allclose(ratio, expect, rtol=0, atol=1e-12)


def test_topk_prefers_target_like_docs(ray_session):
    import ray
    import ray.data

    from iresearch_ray.pipelines.dsir import (dsir_scores, dsir_topk,
                                              fit_dsir)

    t = _corpus()
    B = 512
    ds = ray.data.from_arrow(t).repartition(5)
    ratio_ref = ray.put(fit_dsir(ds, target_value="en", n_buckets=B))
    scored = dsir_scores(ds, ratio_ref, n_buckets=B, concurrency=2)
    top = dsir_topk(scored, k=70)
    picked = set(top["doc_id"])
    # all 60 target docs AND all 10 planted target-like docs rank above
    # every raw-vocabulary doc
    assert set(range(60)) <= picked
    assert set(range(120, 130)) <= picked
    assert not picked & set(range(60, 120))


def test_resample_deterministic_across_layouts(ray_session):
    import ray
    import ray.data

    from iresearch_ray.pipelines.dsir import (dsir_resample, dsir_scores,
                                              fit_dsir)

    t = _corpus()
    B = 512
    picks = []
    for parts in (3, 9):
        ds = ray.data.from_arrow(t).repartition(parts)
        ratio_ref = ray.put(fit_dsir(ds, target_value="en", n_buckets=B))
        scored = dsir_scores(ds, ratio_ref, n_buckets=B, concurrency=2)
        out = dsir_resample(scored, k=40, seed=123)
        picks.append(tuple(sorted(out["doc_id"])))
    assert picks[0] == picks[1]
    # different seed -> (almost surely) different sample
    ds = ray.data.from_arrow(t).repartition(3)
    ratio_ref = ray.put(fit_dsir(ds, target_value="en", n_buckets=B))
    scored = dsir_scores(ds, ratio_ref, n_buckets=B, concurrency=2)
    other = dsir_resample(scored, k=40, seed=456)
    assert tuple(sorted(other["doc_id"])) != picks[0]
