"""IndexWriter: the transactional update surface (Insert / Remove /
Replace / Commit) of the reference ``IndexWriter``
(``core/index/index_writer.hpp:346-470``), rebuilt MVCC-style:

- ``add``      = build new segments from a source and commit a new
  manifest generation alongside the existing segments (incremental
  ingest is "add segment, commit", reference ``README.md:34-43``).
- ``delete``   = evaluate a filter, write per-segment delete-mask files
  (the liveDocs analogue), commit a generation whose manifest entries
  reference them. Segment files are never mutated.
- ``replace``  = delete + add under one commit (the reference's
  update-dedup path, ``core/index/index_writer.hpp:391-397``).
- ``consolidate`` = tiered merge (drops deleted docs, renumbers).

Scale note: ``delete`` runs the filter with the normal per-segment
kernels; for huge indexes route it through the query actor pool
(``serving.search_batch``) and feed the matched doc lists back — the
mask write stays per-segment either way.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from iresearch_ray.index.build import build_index
from iresearch_ray.index.manifest import Manifest
from iresearch_ray.search.searcher import IndexSearcher


class IndexWriter:
    def __init__(self, index_dir: str):
        self.index_dir = index_dir

    # -- insert -----------------------------------------------------------
    def add(self, source, **build_kwargs) -> Manifest:
        """Index new documents into additional segments and commit.

        New data's key range should not interleave existing segments'
        key ranges (append-style ingest); overlapping ranges still
        query correctly but global doc ids are ordered by segment
        first-key, not globally re-ranked.
        """
        man = Manifest.load(self.index_dir) if Manifest.exists(self.index_dir) else None
        old = [dict(s) for s in man.segments] if man else []
        # single combined publish: build_index's commit (including any
        # rolling commit_every generations) always lists old + new, so no
        # generation ever drops the pre-existing segments
        return build_index(source, self.index_dir, base_segments=old,
                           **build_kwargs)

    # -- remove -----------------------------------------------------------
    def delete(self, flt, scorer=None) -> Manifest:
        """Mark all docs matched by ``flt`` deleted; commit a new
        generation. Returns the new manifest."""
        man = Manifest.load(self.index_dir)
        searcher = IndexSearcher(self.index_dir)
        gen = man.generation + 1
        prepared = flt.prepare(searcher, searcher._scorer(scorer))
        metas = []
        for i, (seg_meta, seg) in enumerate(zip(man.segments, searcher.segments)):
            docs, _ = prepared.execute(i)
            meta = dict(seg_meta)
            old_mask = seg.deleted_mask
            new_del = np.zeros(seg.docs_count, dtype=bool)
            if old_mask is not None:
                new_del |= old_mask
            if docs.size:
                new_del[docs - 1] = True
            n_del = int(new_del.sum())
            if n_del and (old_mask is None or n_del != int(old_mask.sum())):
                fname = f"deletes-{gen}.parquet"
                pq.write_table(
                    pa.table({"local_doc": pa.array(
                        np.flatnonzero(new_del).astype(np.int64) + 1
                    )}),
                    os.path.join(searcher.index_dir, seg_meta["name"], fname),
                )
                meta["deletes_file"] = fname
                meta["deleted_count"] = n_del
            metas.append(meta)
        for m in metas:
            m.pop("doc_base", None)
        return Manifest.commit(self.index_dir, metas)

    # -- replace ----------------------------------------------------------
    def replace(self, flt, source, scorer=None, **build_kwargs) -> Manifest:
        """Delete matching docs, then add the replacement documents —
        one logical update (two manifest generations, both consistent)."""
        self.delete(flt, scorer=scorer)
        return self.add(source, **build_kwargs)

    # -- maintenance ------------------------------------------------------
    def consolidate(self, **kwargs) -> Manifest:
        from iresearch_ray.index.merge import consolidate

        return consolidate(self.index_dir, **kwargs)
