"""Deterministic synthetic transcript corpus (FIXTURES.md F1/F2).

Schema is exactly the BASELINE.json input hint:
    conv_id: string, turn_idx: int32, role: string, text: string,
    tool: string, ts: timestamp[us]

The vocabulary embeds controlled frequency bands (High ~10%/turn,
Med ~1%, Low ~0.1%) plus phrase bigrams, a shared-prefix family and an
edit-distance family so all 18 reference query categories
(``/root/reference/scripts/iresearch-benchmark.tasks:1-18``) can be
instantiated. Generation is deterministic per (seed, partition id):
partition p regenerates identically regardless of how many partitions
run or in which order — the property that makes bench inputs and
resumed builds reproducible.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROLES = np.asarray(["user", "assistant", "system", "tool"], dtype=object)
TOOLS = np.asarray(
    ["", "", "", "", "bash", "search", "browser", "editor", "python",
     "calculator", "planner", "retrieval"], dtype=object
)

# frequency-band vocabulary (FIXTURES.md F2)
HIGH_TERMS = ["the", "ref", "ok", "run", "file", "test", "code", "data", "call", "line"]
MED_TERMS = [f"med{i:03d}" for i in range(80)] + [
    "second", "deploy", "section", "sector", "kernel", "branch", "merge",
    "commit", "tensor", "vector", "matrix", "buffer", "stream", "socket",
    "thread", "mutex", "cache", "batch", "shard", "actor",
]
LOW_TERMS = [f"rare{i:05d}" for i in range(4000)] + [
    "demographics", "paleontology", "thermodynamics", "jurisprudence",
    "depoly", "dploy", "seconds", "sectional", "kölner", "straße",
]
PHRASE_PAIRS = [("ref", "name"), ("deploy", "target"), ("rare00001", "rare00002")]


def make_transcripts_partition(
    part_id: int, convs_per_part: int = 256, seed: int = 42
) -> pa.Table:
    """Generate one deterministic partition of the transcript table."""
    rng = np.random.default_rng((seed, part_id))
    conv_base = part_id * convs_per_part
    conv_lens = rng.integers(1, 41, size=convs_per_part)
    n = int(conv_lens.sum())
    conv_ord = np.repeat(np.arange(convs_per_part), conv_lens)
    conv_ids = np.asarray(
        [f"conv-{conv_base + i:08d}" for i in range(convs_per_part)], dtype=object
    )[conv_ord]
    starts = np.concatenate(([0], np.cumsum(conv_lens)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, conv_lens)).astype(np.int32)
    roles = ROLES[np.arange(n) % len(ROLES)]
    tools = TOOLS[rng.integers(0, len(TOOLS), size=n)]
    base_ts = np.int64(1_700_000_000_000_000)
    ts = base_ts + np.repeat(
        rng.integers(0, 10**9, size=convs_per_part), conv_lens
    ) + turn_idx.astype(np.int64) * 30_000_000

    # --- text: zipfian token soup + injected band/phrase/family tokens
    n_tokens = rng.integers(3, 60, size=n)
    total = int(n_tokens.sum())
    vocab = np.asarray(HIGH_TERMS + MED_TERMS + LOW_TERMS, dtype=object)
    # zipf-like rank sampling over the band-ordered vocab
    ranks = rng.zipf(1.3, size=total)
    ranks = np.minimum(ranks - 1, len(vocab) - 1)
    toks = vocab[ranks]
    doc_of_tok = np.repeat(np.arange(n), n_tokens)
    tok_starts = np.concatenate(([0], np.cumsum(n_tokens)[:-1]))
    # inject adjacent phrase pairs into ~8% of turns
    phrase_docs = rng.random(n) < 0.08
    for d in np.flatnonzero(phrase_docs):
        a, b = PHRASE_PAIRS[int(rng.integers(0, len(PHRASE_PAIRS)))]
        s = tok_starts[d]
        if n_tokens[d] >= 2:
            off = int(rng.integers(0, n_tokens[d] - 1))
            toks[s + off] = a
            toks[s + off + 1] = b
    # occasional mixed case / punctuation / unicode
    deco = rng.random(total)
    upper_mask = deco < 0.02
    toks = toks.copy()
    toks[upper_mask] = [t.upper() for t in toks[upper_mask]]
    punct_mask = (deco >= 0.02) & (deco < 0.05)
    toks[punct_mask] = [t + "," for t in toks[punct_mask]]

    texts = np.empty(n, dtype=object)
    joined = " ".join(toks.tolist())
    # split back per doc using cumulative token counts (fast join per doc)
    tok_list = toks.tolist()
    for d in range(n):
        s, e = tok_starts[d], tok_starts[d] + n_tokens[d]
        texts[d] = " ".join(tok_list[s:e])

    return pa.table({
        "conv_id": pa.array(conv_ids, type=pa.string()),
        "turn_idx": pa.array(turn_idx, type=pa.int32()),
        "role": pa.array(roles, type=pa.string()),
        "text": pa.array(texts, type=pa.string()),
        "tool": pa.array(tools, type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
    })


def write_transcripts(
    out_dir: str, n_parts: int = 8, convs_per_part: int = 256, seed: int = 42
) -> str:
    """Materialize a partitioned transcript corpus (one parquet per
    partition, globally sorted by (conv_id, turn_idx) across files).
    Skips files that already exist (deterministic content)."""
    os.makedirs(out_dir, exist_ok=True)
    for p in range(n_parts):
        path = os.path.join(out_dir, f"part-{p:05d}.parquet")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            pq.write_table(make_transcripts_partition(p, convs_per_part, seed), tmp)
            os.replace(tmp, path)
    return out_dir


def write_transcripts_ray(
    out_dir: str, n_parts: int, convs_per_part: int = 256, seed: int = 42
) -> str:
    """Parallel corpus materialization: one Ray task per partition id
    (deterministic per id — reruns skip existing files)."""
    import ray
    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    missing = [
        p for p in range(n_parts)
        if not os.path.exists(os.path.join(out_dir, f"part-{p:05d}.parquet"))
    ]
    if not missing:
        return out_dir

    def gen(batch) -> "pa.Table":
        import pyarrow as _pa

        for p in batch["id"].tolist():
            path = os.path.join(out_dir, f"part-{int(p):05d}.parquet")
            if not os.path.exists(path):
                tmp = path + f".tmp.{os.getpid()}"
                pq.write_table(make_transcripts_partition(int(p), convs_per_part, seed), tmp)
                os.replace(tmp, path)
        return _pa.table({"id": _pa.array(batch["id"])})

    ray.data.from_items([{"id": p} for p in missing]).map_batches(
        gen, batch_size=4, batch_format="numpy"
    ).materialize()
    return out_dir


def make_transcripts(n_convs: int = 200, seed: int = 42) -> pa.Table:
    """Small single-table corpus for unit tests."""
    parts = []
    convs_per_part = 64
    n_parts = (n_convs + convs_per_part - 1) // convs_per_part
    for p in range(n_parts):
        t = make_transcripts_partition(p, convs_per_part, seed)
        parts.append(t)
    out = pa.concat_tables(parts)
    return out
