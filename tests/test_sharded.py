"""Sharded query serving == single-process searcher (rank + scores)."""

import numpy as np
import pytest

from iresearch_ray.search import filters as F


@pytest.fixture(scope="module")
def sharded(ray_session, small_index):
    from iresearch_ray.search.sharded import ShardedSearcher

    s = ShardedSearcher(small_index, n_shards=2)
    yield s
    s.shutdown()


FILTERS = [
    F.Term("the"),
    F.Term("rare00003"),
    F.Or([F.Term("ref"), F.Term("deploy"), F.Term("ok")]),
    F.And([F.Term("the"), F.Term("ref")]),
    F.Phrase(["deploy", "target"]),
    F.Prefix("sec"),
    # >16 matched terms: exercises the coordinator's global two-tier
    # scored_sets selection (shards must score the same term set)
    F.Prefix("rare0"),
    F.Fuzzy("deploy", 1),
    F.Or([F.Term("the"), F.Term("ref"), F.Term("second"), F.Term("deploy")],
         min_match=2),
]


@pytest.mark.parametrize("mode", ["all", "strict"])
def test_sharded_equals_local(sharded, searcher, mode):
    for flt in FILTERS:
        a = sharded.search(flt, k=25, mode=mode)
        b = searcher.search(flt, k=25, mode=mode)
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_sharded_columns(sharded, searcher):
    a = sharded.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx"))
    b = searcher.search(F.Term("ref"), k=5, columns=("conv_id", "turn_idx"))
    assert a["conv_id"].tolist() == b["conv_id"].tolist()
    assert a["turn_idx"].tolist() == b["turn_idx"].tolist()


def test_sharded_global_idf(sharded, searcher, small_index):
    """A shard-local searcher WITHOUT the stats override would use local
    IDF; assert the sharded scores equal the global ones even for terms
    skewed across shards."""
    from iresearch_ray.search.searcher import IndexSearcher
    from iresearch_ray.index.manifest import Manifest

    man = Manifest.load(small_index)
    first = {man.segments[0]["name"]}
    local = IndexSearcher(small_index, segment_subset=first)
    flt = F.Term("deploy")
    local_res = local.search(flt, k=5, mode="all")
    shard_res = sharded.search(flt, k=500, mode="all")
    glob = searcher.search(flt, k=500, mode="all")
    np.testing.assert_allclose(shard_res["score"].to_numpy(),
                               glob["score"].to_numpy(), rtol=1e-7)
    # sanity: local-only IDF differs from global (so the override matters)
    merged = dict(zip(glob["doc_id"], glob["score"]))
    if len(local_res):
        d0 = int(local_res["doc_id"].iloc[0])
        assert abs(local_res["score"].iloc[0] - merged[d0]) > 1e-9


def test_threshold_exchange_rank_identity(sharded, searcher):
    """Cross-shard WAND threshold exchange: lead-shard kth score seeds
    the followers; results must stay rank-identical."""
    for flt in FILTERS:
        a = sharded.search(flt, k=25, mode="strict", threshold_exchange=True)
        b = searcher.search(flt, k=25, mode="strict")
        assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
        np.testing.assert_allclose(a["score"].to_numpy(),
                                   b["score"].to_numpy(), rtol=1e-6)


def test_highlight_offsets(searcher):
    from iresearch_ray.search.highlight import highlight
    from iresearch_ray.search import filters as F

    out = highlight(searcher, F.Term("deploy"), k=5,
                    text_col="text")
    assert len(out) > 0
    for _, row in out.iterrows():
        assert row["offsets"], row
        snippet = row["snippet"]
        assert "<em>" in snippet
        # every offset range is the query term (case-insensitive)
        text = snippet.replace("<em>", "").replace("</em>", "")
        for s, e in row["offsets"]:
            assert text[s:e].lower() == "deploy"


def test_sharded_lm_scorer_equals_local(ray_session, small_index, searcher):
    # LM stats (per-term collection ttf) must ride the coordinator's
    # stats exchange — a shard-local ttf would change scores
    from iresearch_ray.search.scorers import LMDirichlet
    from iresearch_ray.search.sharded import ShardedSearcher

    s = ShardedSearcher(small_index, n_shards=2, scorer="lmd")
    try:
        for flt in (F.Term("ref"),
                    F.Or([F.Term("ref"), F.Term("deploy")])):
            a = s.search(flt, k=25, mode="all")
            b = searcher.search(flt, k=25, scorer=LMDirichlet(), mode="all")
            assert a["doc_id"].tolist() == b["doc_id"].tolist(), flt
            np.testing.assert_allclose(a["score"].to_numpy(),
                                       b["score"].to_numpy(), rtol=1e-6)
    finally:
        s.shutdown()
