"""Distributed connected components + end-to-end MinHash dedup.

Completes the dedup story: candidate PAIRS (from ``dedup.minhash_candidates``
or any similarity join) -> connected COMPONENTS -> per-doc cluster id +
canonical-survivor keep flag. The reference has no clustering operator (its
``minhash`` analyzer stops at the sketch — ``core/analysis/minhash_token_stream.cpp``);
this is the standard completion used by training-data dedup (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better": MinHash-LSH
buckets -> union-find -> keep one doc per component).

Scale shape
-----------
``connected_components`` is min-label propagation (a.k.a. hash-to-min) as a
Ray Data loop: each round hash-joins the symmetric edge list with the current
label table and folds with ``groupby(node).min(label)``. Only (node, label)
int64 pairs ever move; documents never enter the loop. The label table is
bounded by the number of nodes that appear in ANY candidate pair — at real
dedup rates a few percent of the corpus — so per-round materialization is a
small fraction of input size. Rounds needed = the longest monotone path to a
component's minimum; LSH star edges (every bucket member -> bucket min) keep
component diameters tiny, and the loop stops as soon as the global label sum
stops falling (it strictly decreases until the fixed point).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import (_PAD_LEFT_BASE, _PAD_RIGHT_BASE, _pad_side,
                    minhash_candidates)

_EDGE_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])
_LABEL_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def _as_edges(t: pa.Table, src: str, dst: str) -> pa.Table:
    """Project + symmetrize one block of the pair stream: (u,v) and (v,u)."""
    a = t.column(src).to_numpy(zero_copy_only=False).astype(np.int64)
    b = t.column(dst).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table({
        "u": pa.array(np.concatenate([a, b])),
        "v": pa.array(np.concatenate([b, a])),
    }, schema=_EDGE_SCHEMA)


def _fold_labels(t: pa.Table) -> pa.Table:
    """Normalize a groupby-min output block to the (node,label) schema.
    (The hash aggregate can emit schema-less empty blocks on sparse
    partitions — same normalization as dedup.exact_dedup.winner.)"""
    if "min(v)" in t.column_names:
        node, lab = t.column("u"), t.column("min(v)")
    elif "min(label)" in t.column_names:
        node, lab = t.column("node"), t.column("min(label)")
    elif "node" in t.column_names:
        node, lab = t.column("node"), t.column("label")
    else:
        node = lab = pa.array([], type=pa.int64())
    return pa.table({"node": pa.array(node.to_numpy(zero_copy_only=False),
                                      type=pa.int64()),
                     "label": pa.array(lab.to_numpy(zero_copy_only=False),
                                       type=pa.int64())},
                    schema=_LABEL_SCHEMA)


def connected_components(pairs, src: str = "rep_id", dst: str = "dup_id",
                         num_partitions: int = 8, max_rounds: int = 25):
    """-> materialized Dataset (node:int64, label:int64) — label = the
    minimum node id in the node's connected component.

    Every node that appears in ``pairs`` gets a row; singleton nodes of
    the wider corpus are absent by construction (their component is
    themselves — callers fold them back with a union + groupby.min, see
    ``minhash_dedup``). Each round is one hash join (edges x labels) +
    one groupby.min; the loop terminates when sum(label) is unchanged
    (strict monotone decrease until convergence) or after
    ``max_rounds`` (diameter bound; LSH star edges converge in a few)."""
    edges = pairs.map_batches(
        lambda t: _as_edges(t, src, dst), batch_format="pyarrow"
    ).materialize()

    # round 0: label(u) = min(u, min neighbor) — self-rows via (u,u)
    self_rows = edges.map_batches(
        lambda t: pa.table({"u": t.column("u"), "v": t.column("u")},
                           schema=_EDGE_SCHEMA),
        batch_format="pyarrow")
    labels = (edges.union(self_rows)
              .groupby("u").min("v")
              .map_batches(_fold_labels, batch_format="pyarrow")
              .materialize())
    prev_sum = labels.sum("label")

    for _ in range(max_rounds):
        # propagate: for edge (u,v), v may adopt u's label
        cand = (
            _pad_side(edges, {"u": _PAD_LEFT_BASE}, num_partitions,
                      schema=_EDGE_SCHEMA)
            .join(_pad_side(labels, {"node": _PAD_RIGHT_BASE},
                            num_partitions, schema=_LABEL_SCHEMA),
                  join_type="inner", num_partitions=num_partitions,
                  on=("u",), right_on=("node",))
            .map_batches(
                lambda t: pa.table({"node": t.column("v").cast(pa.int64()),
                                    "label": t.column("label").cast(pa.int64())},
                                   schema=_LABEL_SCHEMA),
                batch_format="pyarrow")
        )
        labels = (labels.union(cand)
                  .groupby("node").min("label")
                  .map_batches(_fold_labels, batch_format="pyarrow")
                  .materialize())
        cur_sum = labels.sum("label")
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def minhash_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                  num_hashes: int = 64, bands: int = 16, shingle: int = 3,
                  mode: str = "word", num_partitions: int = 8):
    """End-to-end MinHash-LSH dedup: -> Dataset (id, cluster_id, keep).

    ``cluster_id`` = min doc id of the doc's near-dup component (its own
    id when it collides with nothing); ``keep`` = the canonical-survivor
    flag (doc == component min). The LSH stage emits STAR edges (bucket
    member -> bucket min, ``minhash_candidates`` default), which have
    the same components as the full in-bucket cliques at a linear — not
    quadratic — edge count. Singleton docs never enter the component
    loop: they fold in at the end via union + one groupby.min."""
    pairs = minhash_candidates(ds, text_col=text_col, id_col=id_col,
                               num_hashes=num_hashes, bands=bands,
                               shingle=shingle, mode=mode)
    labels = connected_components(pairs, num_partitions=num_partitions)

    self_rows = ds.map_batches(
        lambda t: pa.table(
            {"node": t.column(id_col).cast(pa.int64()),
             "label": t.column(id_col).cast(pa.int64())},
            schema=_LABEL_SCHEMA),
        batch_format="pyarrow")

    def finish(t: pa.Table) -> pa.Table:
        t = _fold_labels(t)
        node = t.column("node")
        lab = t.column("label")
        return pa.table({
            id_col: node,
            "cluster_id": lab,
            "keep": pa.compute.equal(node, lab),
        })

    return (labels.union(self_rows)
            .groupby("node").min("label")
            .map_batches(finish, batch_format="pyarrow"))


def leakage_safe_splits(ds, text_col: str = "text", id_col: str = "doc_id",
                        fractions: dict[str, float] | None = None,
                        salt: int = 0, **minhash_kwargs):
    """-> Dataset(id, cluster_id, keep, split): train/val/test labels
    keyed on the near-dup CLUSTER id instead of the doc id, so MinHash
    near-duplicates can never straddle a split boundary — the standard
    eval-contamination guard (a test doc whose near-twin sits in train
    leaks the answer; hashing the component id sends the whole
    component to one side).

    Composition, not new machinery: ``minhash_dedup`` (LSH star edges
    + distributed min-label components) produces (id, cluster_id),
    then ``sampling.assign_splits`` hashes cluster_id — deterministic,
    zero additional shuffle beyond the dedup itself, identical
    assignment at any block layout or cluster size."""
    from .sampling import assign_splits

    clusters = minhash_dedup(ds, text_col=text_col, id_col=id_col,
                             **minhash_kwargs)
    return assign_splits(clusters, "cluster_id", fractions, salt=salt)
