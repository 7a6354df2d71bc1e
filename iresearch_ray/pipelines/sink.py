"""Resumable partitioned parquet sink — the output contract every
long pipeline here shares with the index build (segment `_SUCCESS`
markers, `index/build.py`): one directory per partition value, one
`_SUCCESS` marker at the root written only after the full dataset has
landed, and a cheap skip path so a re-run after a crash never rewrites
finished output.

At 100 TB the failure mode this guards is the driver dying after N-1
of N output shards: without the marker the next run cannot tell a
complete directory from a truncated one and must rewrite everything;
with it, completion is one stat call. Partitioning by a low-cardinality
column (lang, source, date) keeps per-directory file counts sane and
lets downstream reads prune whole partitions at the path level.
"""
from __future__ import annotations

import json
import os


def write_corpus(ds, out_dir: str, partition_cols: list[str] | None = None,
                 overwrite: bool = False) -> dict:
    """Write ``ds`` as (optionally hive-partitioned) parquet under
    ``out_dir`` with a ``_SUCCESS`` manifest; if the marker already
    exists the write is SKIPPED and the recorded stats are returned
    (idempotent resume).

    Returns ``{"rows": int, "skipped": bool, "partition_cols": [...]}``.
    The marker stores the row count so a resume can sanity-check
    without a scan."""
    marker = os.path.join(out_dir, "_SUCCESS")
    if os.path.exists(marker) and not overwrite:
        with open(marker) as f:
            meta = json.load(f)
        meta["skipped"] = True
        return meta
    os.makedirs(out_dir, exist_ok=True)
    if partition_cols:
        ds.write_parquet(out_dir, partition_cols=list(partition_cols))
    else:
        ds.write_parquet(out_dir)
    # row count from parquet footers only — never a second pipeline run
    import pyarrow.parquet as pq

    n = 0
    for root, _, files in os.walk(out_dir):
        for fn in files:
            if fn.endswith(".parquet"):
                n += pq.read_metadata(os.path.join(root, fn)).num_rows
    meta = {"rows": int(n), "skipped": False,
            "partition_cols": list(partition_cols or [])}
    tmp = marker + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, marker)
    return meta
