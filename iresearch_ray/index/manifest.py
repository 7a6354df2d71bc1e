"""Index manifest: MVCC commit point over a set of segments.

The analogue of the reference's ``segments_N`` generation file
(``core/index/index_meta.hpp``, ``core/index/file_names.cpp:33-44``):
commits never mutate existing segments — a commit writes a new
``manifest-N.json`` listing live segments and atomically swaps a
``manifest.json`` pointer (temp file + rename). Readers open the latest
generation; stale segments are garbage-collected by
``Manifest.cleanup()`` (the ``directory_cleaner`` analogue).
"""

from __future__ import annotations

import json
import os
import shutil


class Manifest:
    def __init__(self, index_dir: str, data: dict):
        self.index_dir = index_dir
        self.data = data

    # -- read -------------------------------------------------------------
    @classmethod
    def load(cls, index_dir: str) -> "Manifest":
        with open(os.path.join(index_dir, "manifest.json")) as f:
            return cls(index_dir, json.load(f))

    @classmethod
    def exists(cls, index_dir: str) -> bool:
        return os.path.exists(os.path.join(index_dir, "manifest.json"))

    @classmethod
    def load_generation(cls, index_dir: str, gen: int) -> "Manifest":
        """Open a PAST commit point (Lucene ``IndexCommit`` / the ES
        point-in-time reader): every ``commit`` leaves its
        ``manifest-N.json`` behind, so any generation whose segments
        have not been garbage-collected is still readable."""
        path = os.path.join(index_dir, f"manifest-{gen}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"no commit point manifest-{gen}.json in {index_dir}")
        with open(path) as f:
            m = cls(index_dir, json.load(f))
        gone = [s["name"] for s in m.segments
                if not os.path.isdir(m.segment_dir(s))]
        if gone:
            raise FileNotFoundError(
                f"generation {gen} references garbage-collected "
                f"segments {gone[:3]}{'...' if len(gone) > 3 else ''} — "
                "snapshot a generation before cleanup() to keep it "
                "readable")
        return m

    @property
    def generation(self) -> int:
        return self.data["generation"]

    @property
    def segments(self) -> list[dict]:
        """Segment metas ordered by first sort key; each carries
        ``doc_base`` (global docid = doc_base + local docid)."""
        return self.data["segments"]

    @property
    def total_docs(self) -> int:
        return sum(s["docs_count"] for s in self.segments)

    def segment_dir(self, seg: dict) -> str:
        return os.path.join(self.index_dir, seg["name"])

    # -- write ------------------------------------------------------------
    @classmethod
    def commit(cls, index_dir: str, segment_metas: list[dict],
               extra: dict | None = None) -> "Manifest":
        """Two-phase commit: segment files are already durable (each has
        its ``_SUCCESS``); this is the single atomic publish step
        (``IndexWriter::Commit``, ``core/index/index_writer.cpp:2356-2413``).
        """
        # order segments by their first (conv_id, turn_idx) key so that
        # global doc ids follow the stable global turn ordering
        metas = sorted(segment_metas, key=lambda m: tuple(m["first_key"]))
        base = 0
        for m in metas:
            m["doc_base"] = base
            base += m["docs_count"]
        gen = 1
        if cls.exists(index_dir):
            gen = cls.load(index_dir).generation + 1
        data = {
            "generation": gen,
            "segments": metas,
            "total_docs": base,
            **(extra or {}),
        }
        path = os.path.join(index_dir, f"manifest-{gen}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=1)
        tmp = os.path.join(index_dir, f"manifest.json.tmp.{os.getpid()}")
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmp, os.path.join(index_dir, "manifest.json"))
        return cls(index_dir, data)

    def snapshot(self, dest: str) -> "Manifest":
        """Write a self-contained copy of THIS commit point to ``dest``
        (Lucene ``SnapshotDeletionPolicy`` + the ES snapshot shape):
        segment files hardlink when ``dest`` is on the same filesystem
        (segments are immutable after commit, so sharing bytes is safe)
        and fall back to copies across filesystems. The snapshot is a
        normal index — ``IndexSearcher(dest)`` restores it directly."""
        os.makedirs(dest, exist_ok=True)

        def link_or_copy(src: str, dst: str) -> None:
            try:
                os.link(src, dst)
            except OSError:
                shutil.copy2(src, dst)

        for seg in self.segments:
            sdir = self.segment_dir(seg)
            ddir = os.path.join(dest, seg["name"])
            if os.path.isdir(ddir):
                # idempotent re-run — but ONLY when the existing dir
                # passes integrity (same file set as the source, which
                # itself carries _SUCCESS); a partial/foreign dir left
                # by an earlier snapshot is re-staged, never silently
                # kept (a name match alone would yield a corrupt
                # "self-contained" snapshot)
                # compare (relpath, size) — size is nearly free and
                # catches truncated/stale same-named files in a foreign
                # dest dir that a name-only check would keep
                def _fileset(root: str) -> set:
                    return {(os.path.relpath(p := os.path.join(r, f), root),
                             os.path.getsize(p))
                            for r, _, fs in os.walk(root) for f in fs}
                if _fileset(ddir) == _fileset(sdir):
                    continue
                shutil.rmtree(ddir)
            tmp = ddir + ".tmp"
            shutil.rmtree(tmp, ignore_errors=True)
            os.makedirs(tmp)
            for root, dirs, files in os.walk(sdir):
                rel = os.path.relpath(root, sdir)
                for d in dirs:
                    os.makedirs(os.path.join(tmp, rel, d), exist_ok=True)
                for fn in files:
                    link_or_copy(os.path.join(root, fn),
                                 os.path.join(tmp, rel, fn))
            os.replace(tmp, ddir)
        data = dict(self.data, generation=1)
        with open(os.path.join(dest, "manifest-1.json"), "w") as f:
            json.dump(data, f, indent=1)
        tmppath = os.path.join(dest, f"manifest.json.tmp.{os.getpid()}")
        with open(tmppath, "w") as f:
            json.dump(data, f, indent=1)
        os.replace(tmppath, os.path.join(dest, "manifest.json"))
        return Manifest(dest, data)

    def cleanup(self) -> list[str]:
        """Remove segment dirs not referenced by the current generation."""
        live = {s["name"] for s in self.segments}
        removed = []
        for entry in os.listdir(self.index_dir):
            p = os.path.join(self.index_dir, entry)
            if os.path.isdir(p) and entry.startswith("seg-") and entry not in live:
                shutil.rmtree(p, ignore_errors=True)
                removed.append(entry)
        return removed
