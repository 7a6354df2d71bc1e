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
    def _removal_metas(self, removes: list, gen: int) -> list[dict]:
        """Per-segment metas of the current committed snapshot with the
        union of ``removes`` = [(filter, scorer), ...] applied as new
        delete-mask files. Writes only files (additive, unreferenced
        until a manifest commit points at them) — the caller owns the
        single publish step."""
        man = Manifest.load(self.index_dir)
        searcher = IndexSearcher(self.index_dir)
        prepareds = [
            flt.prepare(searcher, searcher._scorer(scorer))
            for flt, scorer in removes
        ]
        metas = []
        for i, (seg_meta, seg) in enumerate(zip(man.segments, searcher.segments)):
            meta = dict(seg_meta)
            old_mask = seg.deleted_mask
            new_del = np.zeros(seg.docs_count, dtype=bool)
            if old_mask is not None:
                new_del |= old_mask
            for prepared in prepareds:
                docs, _ = prepared.execute(i)
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
        return metas

    def delete(self, flt, scorer=None) -> Manifest:
        """Mark all docs matched by ``flt`` deleted; commit a new
        generation. Returns the new manifest."""
        gen = Manifest.load(self.index_dir).generation + 1
        return Manifest.commit(self.index_dir,
                               self._removal_metas([(flt, scorer)], gen))

    # -- replace ----------------------------------------------------------
    def replace(self, flt, source, scorer=None, **build_kwargs) -> Manifest:
        """Delete matching docs, then add the replacement documents —
        one logical update (two manifest generations, both consistent)."""
        self.delete(flt, scorer=scorer)
        return self.add(source, **build_kwargs)

    # -- two-phase transaction -------------------------------------------
    def begin(self) -> "Transaction":
        """Open a two-phase batch (the reference ``GetBatch()`` ->
        ``Transaction`` -> ``Commit/Rollback`` surface,
        ``core/index/index_writer.hpp:346-470``)."""
        return Transaction(self)

    # -- maintenance ------------------------------------------------------
    def consolidate(self, **kwargs) -> Manifest:
        from iresearch_ray.index.merge import consolidate

        return consolidate(self.index_dir, **kwargs)


class Transaction:
    """Two-phase batch of inserts and removes.

    ``insert`` builds segments to disk immediately but publishes NO
    manifest generation; ``remove`` is staged as a filter. ``commit``
    evaluates the staged removes against the committed snapshot, then
    publishes ONE manifest generation containing (old segments with new
    delete masks) + (all staged segments) — so readers observe the
    whole batch atomically, and a crash at any earlier point leaves the
    last committed generation untouched. ``rollback`` discards staged
    segment directories (never ones referenced by a manifest — the
    content-digest checkpoint may resolve an insert to an existing
    LIVE segment, which must survive).

    Divergence from the reference: removals see the committed snapshot,
    not same-transaction earlier inserts (the reference orders
    intra-transaction ops by tick, ``index_writer.hpp:536-561``).
    """

    def __init__(self, writer: IndexWriter):
        self._writer = writer
        self._staged: list[dict] = []
        self._removes: list = []
        self._closed = False

    def insert(self, source, **build_kwargs) -> "Transaction":
        assert not self._closed, "transaction already committed/rolled back"
        metas = build_index(source, self._writer.index_dir, commit=False,
                            **build_kwargs)
        self._staged.extend(metas)
        return self

    def remove(self, flt, scorer=None) -> "Transaction":
        assert not self._closed, "transaction already committed/rolled back"
        self._removes.append((flt, scorer))
        return self

    def commit(self) -> Manifest:
        assert not self._closed, "transaction already committed/rolled back"
        self._closed = True
        idx = self._writer.index_dir
        has_base = Manifest.exists(idx)
        if self._removes and has_base:
            gen = Manifest.load(idx).generation + 1
            old = self._writer._removal_metas(self._removes, gen)
        elif has_base:
            old = [dict(s) for s in Manifest.load(idx).segments]
            for m in old:
                m.pop("doc_base", None)
        else:
            old = []
        by_name = {m["name"]: m for m in old}
        for m in self._staged:
            by_name.setdefault(m["name"], dict(m))
        return Manifest.commit(idx, list(by_name.values()))

    def rollback(self) -> None:
        assert not self._closed, "transaction already committed/rolled back"
        self._closed = True
        import shutil

        idx = self._writer.index_dir
        live = set()
        if Manifest.exists(idx):
            live = {s["name"] for s in Manifest.load(idx).segments}
        for m in self._staged:
            if m["name"] not in live:
                shutil.rmtree(os.path.join(idx, m["name"]),
                              ignore_errors=True)
        self._staged.clear()
        self._removes.clear()
