"""SemDeDup (pipelines/semdedup): planted near-duplicates are dropped
(lowest id kept), distant vectors survive, output is layout-invariant."""

import numpy as np
import pyarrow as pa


def _emb_table(n=120, d=16, planted=((5, 70), (12, 99), (30, 31))):
    """Random unit-ish vectors plus planted near-dup pairs (the second
    member of each pair is the first plus tiny noise)."""
    rng = np.random.default_rng(11)
    E = rng.normal(size=(n, d))
    for a, b in planted:
        E[b] = E[a] + rng.normal(scale=1e-3, size=d)
    return pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(E.astype(np.float32))),
    })


def test_semdedup_planted_pairs(ray_session):
    import ray.data

    from iresearch_ray.pipelines.semdedup import semdedup

    t = _emb_table()
    out = semdedup(ray.data.from_arrow(t).repartition(4),
                   k=4, iters=1, tau=0.9).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    keep = dict(zip(out["vec_id"], out["keep"]))
    clus = dict(zip(out["vec_id"], out["cluster"]))
    assert len(out) == 120
    for a, b in ((5, 70), (12, 99), (30, 31)):
        assert clus[a] == clus[b]  # near-identical -> same cluster
        assert keep[a] and not keep[b]  # lower id kept
    # random gaussians at tau=0.9: everything else survives
    dropped = {v for v, kp in keep.items() if not kp}
    assert dropped == {70, 99, 31}


def test_semdedup_layout_invariant(ray_session):
    import ray.data

    from iresearch_ray.pipelines.semdedup import semdedup

    t = _emb_table()
    outs = []
    for parts in (2, 7):
        out = semdedup(ray.data.from_arrow(t).repartition(parts),
                       k=4, iters=1, tau=0.9).to_pandas() \
            .sort_values("vec_id").reset_index(drop=True)
        outs.append(out.to_records(index=False).tolist())
    assert outs[0] == outs[1]
