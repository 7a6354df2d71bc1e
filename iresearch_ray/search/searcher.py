"""IndexSearcher: manifest -> global stats -> per-segment top-k -> merge.

Query lifecycle mirrors ``index-search`` (``utils/index-search.cpp:672-781``):

1. ``prepare``: resolve terms against every segment's dictionary and sum
   the collector stats index-wide (docs_with_term, docs_with_field,
   total_term_freq) — the barrier between stats and scoring.
2. per segment (in doc_base order): execute the prepared tree, push
   (global_doc, score) into a top-k collector whose threshold carries
   across segments (the reference's persistent min-heap).
3. ``mode="strict"`` enables block-max WAND skipping for term queries
   (wanderator semantics, ``core/formats/formats_10.cpp:2426-2546``);
   ``mode="all"`` is the exhaustive oracle — both must be rank-identical.

Ties: a candidate replaces the heap minimum only on strictly greater
score (``utils/index-search.cpp:758``), so the final order is
(score desc, global doc id asc).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pandas as pd
import pyarrow as pa

from iresearch_ray.index.manifest import Manifest
from iresearch_ray.index.segment import SegmentReader
from iresearch_ray.search.filters import (
    Filter,
    Prepared,
    PreparedTerm,
)
from iresearch_ray.search.scorers import BM25, FieldStats, get_scorer


@dataclass
class TermState:
    """Per-term index-wide state: dictionary row per segment + summed
    collector stats (``core/search/term_filter.cpp:92-129``).
    ``total_tf`` (collection term frequency) feeds the LM scorers'
    p(t|C); it sums associatively like docs_with_term."""

    term: str
    rows: np.ndarray  # int64 row ordinal per segment, -1 = absent
    docs_with_term: int
    total_tf: int = 0


class TopK:
    """Global top-k collector with strict-threshold semantics.

    Pushes are buffered and compacted (exact lexsort truncate) only when
    the buffer exceeds ~max(4096, 4k) candidates, so per-block pushes in
    the WAND loop cost O(batch) amortized. Between compactions
    ``threshold`` is a valid (stale, lower) bound — pruning with it is
    always safe.

    ORDER-INDEPENDENT by construction: pushes keep score ``>=``
    threshold (ties survive) and compaction retains every tie of the
    kth score (bounded by the buffer limit, which is >= 4k, so the k
    lowest-doc ties can never be evicted). The final (docs, scores)
    are the lexsort-by-(score desc, doc asc) top k — identical no
    matter which order segments push, which makes parallel segment
    execution rank-identical to the sequential scan. Pushes are
    lock-serialized; ``threshold`` reads stay lock-free (monotone
    lower bound, safe when stale)."""

    def __init__(self, k: int, dtype=np.float32,
                 initial_threshold: float = -np.inf,
                 after: tuple[float, int] | None = None):
        import threading

        self.k = k
        self.dtype = dtype
        # search-after cursor (deep pagination): accept only docs
        # strictly after (score, global_doc) in (score desc, doc asc)
        # result order — the Lucene/Elasticsearch ``search_after``
        # protocol, which keeps page N cost at O(k) memory instead of
        # the O(N*k) of offset pagination
        self._after = (None if after is None
                       else (float(after[0]), int(after[1])))
        self._bufs: list[tuple[np.ndarray, np.ndarray]] = []
        self._buffered = 0
        self._limit = max(4096, 4 * k)
        # a seeded threshold (cross-shard WAND exchange) prunes from the
        # first segment; valid as long as the seed is <= the global kth
        # score under the >= push rule
        self._thr = float(initial_threshold)
        self._seen = 0
        self._lock = threading.Lock()

    @property
    def threshold(self) -> float:
        return self._thr

    def push(self, docs: np.ndarray, scores: np.ndarray) -> None:
        if docs.size == 0:
            return
        if self._after is not None:
            a_s, a_d = self._after
            keep = (scores < a_s) | ((scores == a_s) & (docs > a_d))
            if not keep.all():
                docs, scores = docs[keep], scores[keep]
            if docs.size == 0:
                return
        if np.isfinite(self._thr):
            keep = scores >= self._thr  # ties kept: order-independent
            if not keep.all():
                docs, scores = docs[keep], scores[keep]
            if docs.size == 0:
                return
        with self._lock:
            self._bufs.append((docs, scores))
            self._buffered += docs.size
            self._seen += docs.size
            if self._buffered > self._limit:
                self._compact()

    def _compact(self) -> None:
        docs = np.concatenate([d for d, _ in self._bufs])
        scores = np.concatenate([s for _, s in self._bufs])
        order = np.lexsort((docs, -scores.astype(np.float64)))
        if order.size > self.k:
            s_sorted = scores[order].astype(np.float64)
            kth = s_sorted[self.k - 1]
            # keep ALL ties of the kth score (capped at the buffer
            # limit >= 4k: the k lowest-doc ties always survive)
            cut = int(np.searchsorted(-s_sorted, -kth, side="right"))
            order = order[: min(cut, self._limit)]
        docs, scores = docs[order], scores[order]
        self._bufs = [(docs, scores)]
        self._buffered = docs.size
        if docs.size >= self.k:
            self._thr = float(scores[self.k - 1])

    def raise_threshold(self, t: float) -> None:
        """Adopt an EXTERNAL pruning bound (cross-shard threshold
        exchange). Safe whenever ``t`` <= the final global kth score:
        the push rule keeps ``score >= threshold`` so kth ties always
        survive, preserving rank identity."""
        if t > self._thr:
            self._thr = float(t)

    def kth_now(self) -> float:
        """Exact current kth score (forces a compaction) — the value a
        shard posts to the exchange board; -inf until k docs seen."""
        with self._lock:
            if self._bufs:
                self._compact()
        return self._thr

    @property
    def docs(self) -> np.ndarray:
        with self._lock:
            self._compact() if self._bufs else None
            return (self._bufs[0][0][: self.k] if self._bufs
                    else np.empty(0, dtype=np.int64))

    @property
    def scores(self) -> np.ndarray:
        with self._lock:
            self._compact() if self._bufs else None
            return (self._bufs[0][1][: self.k] if self._bufs
                    else np.empty(0, dtype=self.dtype))


class IndexSearcher:
    def __init__(self, index_dir: str, segment_subset: set | None = None,
                 stats_override: dict | None = None,
                 query_threads: int | None = None,
                 generation: int | None = None,
                 segment_ranges: dict | None = None):
        """``segment_subset``: open only these segment names but keep
        GLOBAL doc bases (a shard view of the index).
        ``segment_ranges``: {segment_name: (lo, hi)} local doc row
        ranges — sub-segment shard views (``SegmentReader.
        set_serve_range``) that keep cold decode parallelism over big
        consolidated segments; use together with ``stats_override``
        (a sharded coordinator's global stats) so scoring stays
        rank-identical — a range view's OWN field stats still count the
        whole segment, like deleted docs do until a merge.
        ``generation``: open a PAST commit point (Lucene IndexCommit /
        ES point-in-time) instead of the latest — readable until its
        segments are garbage-collected by ``Manifest.cleanup()``.
        ``stats_override``: {"fields": {field: (dwf, ttf)},
        "terms": {(field, term): docs_with_term}} — index-wide collector
        results injected by a sharded/distributed searcher so per-shard
        scoring uses global IDF (collector semantics are associative).
        ``query_threads``: per-query segment parallelism (default 1 =
        sequential). Results are rank-identical at any setting — the
        TopK collector is order-independent — but in-process threads
        measured SLOWER here (3-10x): per-segment work is thousands of
        small numpy/arrow ops whose GIL ping-pong dominates. Process
        parallelism across segments is ``ShardedSearcher`` (Ray
        actors); this knob exists for big-segment layouts where each
        task is one long GIL-releasing decode."""
        self.index_dir = index_dir
        self._segment_subset = segment_subset
        self.manifest = Manifest.load(index_dir) if generation is None \
            else Manifest.load_generation(index_dir, generation)
        metas = [
            s for s in self.manifest.segments
            if segment_subset is None or s["name"] in segment_subset
        ]
        if len(metas) > 8:
            # parquet footer/dictionary reads release the GIL; a small
            # thread pool cuts many-segment open ~4x (open cost shows
            # up in reopen, sharded-actor startup, and CLI latency)
            import concurrent.futures as _cf

            with _cf.ThreadPoolExecutor(max_workers=8) as ex:
                self.segments = list(ex.map(
                    lambda s: SegmentReader(
                        os.path.join(index_dir, s["name"]), meta=s),
                    metas))
        else:
            self.segments = [
                SegmentReader(os.path.join(index_dir, s["name"]), meta=s)
                for s in metas
            ]
        if segment_ranges:
            for sr, m in zip(self.segments, metas):
                rng = segment_ranges.get(m["name"])
                if rng is not None:
                    sr.set_serve_range(*rng)
        self.doc_bases = np.asarray([s["doc_base"] for s in metas], dtype=np.int64)
        self._field_stats: dict[str, FieldStats] = {}
        self._term_cache: dict[tuple, TermState] = {}
        self._match_cache: dict[str, np.ndarray] = {}
        self._stats_override = stats_override or {}
        # multiterm nodes record (limit, matched terms) here during
        # prepare so a distributed coordinator can build global
        # scored_sets overrides (see filters._multiterm)
        self._multiterm_matched: dict = {}
        self.query_threads = max(1, int(query_threads or 1))
        self._pool = None
        # fuzzy/wildcard dictionary-scan memo (filters._cached_scan)
        self._scan_cache: dict = {}

    @classmethod
    def subview(cls, parent: "IndexSearcher",
                segment_names: set) -> "IndexSearcher":
        """A searcher over a SUBSET of ``parent``'s segments SHARING its
        reader objects (dictionaries, posting caches) — the sub-shard
        worker's stats-collect view: collect is metadata-level (term
        dictionary rows + per-segment field stats, never a posting
        decode), and that metadata is whole-segment regardless of any
        ``serve_range`` on the shared readers, so a primary-only
        subview collects exact whole-segment stats without opening the
        big dictionaries a second time."""
        s = object.__new__(cls)
        keep = [i for i, seg in enumerate(parent.segments)
                if seg.meta["name"] in segment_names]
        s.index_dir = parent.index_dir
        s._segment_subset = set(segment_names)
        s.manifest = parent.manifest
        s.segments = [parent.segments[i] for i in keep]
        s.doc_bases = parent.doc_bases[keep]
        s._field_stats = {}
        s._term_cache = {}
        s._match_cache = {}
        s._stats_override = {}
        s._multiterm_matched = {}
        s.query_threads = 1
        s._pool = None
        s._scan_cache = {}
        return s

    def reopen(self) -> bool:
        """Re-open at the latest manifest generation (the reference's
        ``DirectoryReader::Reopen``): unchanged segments KEEP their
        reader objects — and so their decoded-postings / phrase-key /
        disjunction caches — while added segments open fresh and removed
        ones drop. Query-level caches reset (term rows are ordinal per
        segment list). Returns True if the generation changed."""
        man = Manifest.load(self.index_dir)
        if man.generation == self.manifest.generation:
            return False
        if any(s.serve_range is not None for s in self.segments):
            # a sub-range view's doc ownership is a coordinator-level
            # plan over ONE generation; silently reopening into a new
            # generation would leave ADDED segments rangeless and
            # overlap other shards' ownership. The coordinator rebuilds
            # its shard plan instead (ShardedSearcher opens fresh).
            raise RuntimeError(
                "reopen() is not supported on a serve_range sub-segment "
                "view — rebuild the shard plan for the new generation")
        old = {s.meta["name"]: s for s in self.segments}
        metas = [
            s for s in man.segments
            if self._segment_subset is None or s["name"] in self._segment_subset
        ]
        segs = []
        for m in metas:
            prev = old.get(m["name"])
            if prev is not None:
                prev.meta = m  # manifest meta carries delete state
                prev._deleted_loaded = False
                prev._deleted = None
                segs.append(prev)
            else:
                segs.append(SegmentReader(
                    os.path.join(self.index_dir, m["name"]), meta=m))
        self.manifest = man
        self.segments = segs
        self.doc_bases = np.asarray([m["doc_base"] for m in metas],
                                    dtype=np.int64)
        self._field_stats.clear()
        self._term_cache.clear()
        self._match_cache.clear()
        self._multiterm_matched.clear()
        self._scan_cache.clear()
        return True

    # -- stats (collector merge) ------------------------------------------
    def field_stats(self, field: str | None = None) -> FieldStats:
        key = field or (self.segments[0].default_field if self.segments else "text")
        ov = self._stats_override.get("fields", {}).get(key)
        if ov is not None:
            return FieldStats(*ov)
        fs = self._field_stats.get(key)
        if fs is None:
            fs = FieldStats()
            for seg in self.segments:
                f = seg.fields.get(key)
                if f:
                    fs.add(FieldStats(f["docs_with_field"], f["sum_doc_len"]))
            self._field_stats[key] = fs
        return fs

    def resolve_term(self, term: str, field: str | None = None) -> TermState:
        key = (field, term)
        st = self._term_cache.get(key)
        if st is None:
            rows = np.full(len(self.segments), -1, dtype=np.int64)
            dwt = 0
            ttf = 0
            for i, seg in enumerate(self.segments):
                r = seg.lookup(term, field)
                rows[i] = r
                if r >= 0:
                    dwt += int(seg.doc_freq[r])
                    ttf += int(seg.total_tf[r])
            ov = self._stats_override.get("terms", {}).get((field, term))
            if ov is not None:
                # index-wide stats from the coordinator: legacy int
                # (docs_with_term only) or (dwt, ttf) tuple
                if isinstance(ov, tuple):
                    dwt, ttf = int(ov[0]), int(ov[1])
                else:
                    dwt = ov
            st = TermState(term, rows, dwt, ttf)
            self._term_cache[key] = st
        return st

    def scan_terms(self, pred, field: str | None = None,
                   lo: str | None = None, hi: str | None = None,
                   inc_lo: bool = True, inc_hi: bool = True) -> list[str]:
        """Union of dictionary terms selected by ``pred`` across segments
        (multiterm candidate generation), within one field. ``pred``
        receives a numpy array of candidate terms. An optional [lo, hi]
        bound narrows each segment's dictionary with two binary searches
        before ``pred`` runs (the FST range-walk analogue)."""
        seen: set[str] = set()
        for seg in self.segments:
            if lo is None and hi is None:
                cands = seg.field_terms(field)
            else:
                rows = seg.term_range(lo, hi, inc_lo, inc_hi, field)
                cands = seg.terms_at(rows)
            if cands.size:
                seen.update(pred(cands))
        return sorted(seen)

    def scan_terms_range(self, lo: str | None, hi: str | None,
                         inc_lo: bool = True, inc_hi: bool = True,
                         field: str | None = None) -> list[str]:
        """All dictionary terms in [lo, hi] — two ``searchsorted`` per
        segment over the byte-sorted dictionary, no predicate scan
        (SURVEY §2.4: prefix/range are dictionary range scans)."""
        parts = []
        for seg in self.segments:
            rows = seg.term_range(lo, hi, inc_lo, inc_hi, field)
            if rows.size:
                parts.append(seg.terms_at(rows))
        if not parts:
            return []
        return np.unique(np.concatenate(parts)).tolist()

    # -- search ------------------------------------------------------------
    def search(
        self,
        flt: Filter,
        k: int = 10,
        scorer=None,
        mode: str = "strict",
        columns: tuple | None = None,
        initial_threshold: float | None = None,
        threshold_hook=None,
        hook_every_s: float = 0.025,
        search_after: tuple[float, int] | None = None,
    ) -> pd.DataFrame:
        """Top-k matched docs -> DataFrame(doc_id, score[, columns]).

        ``mode="all"`` = exhaustive; ``"strict"`` = block-max WAND where
        supported (rank-identical by construction + tests).
        ``initial_threshold`` seeds the top-k heap (the cross-shard WAND
        threshold exchange: any lower bound of the global kth score lets
        a shard prune from doc one). ``threshold_hook`` is the LIVE
        exchange: at most once per ``hook_every_s`` seconds it is called
        with the current local bound and returns an external bound to
        adopt — time-based, so the exchange cost stays a fixed small
        fraction of the query wall regardless of segment count
        (sequential path only; thread-pool runs share the in-process
        TopK already)."""
        scorer = self._scorer(scorer)
        # per-query observability: segments skipped whole by the WAND
        # threshold (evidences cross-shard exchange pruning in tests)
        self.last_segments_skipped = 0
        prepared = flt.prepare(self, scorer)
        col = TopK(k, dtype=scorer.dtype,
                   initial_threshold=-np.inf if initial_threshold is None
                   else initial_threshold,
                   after=search_after)
        if mode == "strict" and hasattr(prepared, "bind_threshold"):
            prepared.bind_threshold(lambda: col.threshold)
        is_tdis = self._is_term_disjunction(prepared)
        is_tconj = self._is_term_conjunction(prepared)
        nseg = len(self.segments)
        nthreads = min(self.query_threads, nseg)
        if nthreads > 1:
            # parallel per-segment execution (the reference's query
            # thread pool, ``utils/index-search.cpp`` async mode): the
            # order-independent TopK makes results rank-identical to
            # the sequential scan; the shared threshold still prunes
            # across segments, just with whatever order finishes first.
            # skipped counts come back as per-call return values and are
            # summed here — no shared read-modify-write across threads.
            self.last_segments_skipped = sum(self._executor(nthreads).map(
                lambda i: self._search_segment(prepared, i, col, mode,
                                               is_tdis, is_tconj),
                range(nseg)))
        else:
            import time as _time

            next_hook = (_time.monotonic() + hook_every_s
                         if threshold_hook is not None and mode == "strict"
                         else None)
            for i in range(nseg):
                self.last_segments_skipped += self._search_segment(
                    prepared, i, col, mode, is_tdis, is_tconj)
                if next_hook is not None and _time.monotonic() >= next_hook:
                    # post the lock-free stale bound (still valid);
                    # forcing a compaction here measurably costs more
                    # than the fresher bound saves
                    ext = threshold_hook(col.threshold)
                    if ext is not None:
                        col.raise_threshold(float(ext))
                    next_hook = _time.monotonic() + hook_every_s
        return self._result_frame(col.docs, col.scores, columns)

    def _search_segment(self, prepared, i: int, col: "TopK", mode: str,
                        is_tdis: bool, is_tconj: bool) -> int:
        """-> 1 if the whole segment was skipped by the WAND threshold,
        else 0 (the caller accumulates into ``last_segments_skipped`` so
        the counter stays exact under the query thread pool)."""
        base = int(self.doc_bases[i])
        if mode == "strict":
            thr = col.threshold
            # cross-segment pruning: skip a whole segment whose
            # score upper bound cannot beat the running threshold.
            # (Not for term disjunctions: their bound needs one
            # cursor per child per segment — more expensive than the
            # cached merge it would skip.)
            if not is_tdis and np.isfinite(thr) \
                    and prepared.max_score(i) < thr:
                return 1
            if isinstance(prepared, PreparedTerm):
                self._wand_term(prepared, i, base, col)
                return 0
            if is_tdis:
                self._maxscore_or(prepared, i, base, col)
                return 0
            if is_tconj:
                self._wand_and(prepared, i, base, col)
                return 0
        docs, scores = self.segments[i].filter_live(*prepared.execute(i))
        col.push(docs + base, scores)
        return 0

    def _executor(self, nthreads: int):
        """Persistent query thread pool (created lazily, sized once)."""
        import concurrent.futures as cf

        pool = self._pool
        if pool is None or pool._max_workers < nthreads:
            if pool is not None:
                pool.shutdown(wait=False)
            pool = self._pool = cf.ThreadPoolExecutor(
                max_workers=nthreads,
                thread_name_prefix="iresearch-query")
        return pool

    @staticmethod
    def _is_term_disjunction(prepared) -> bool:
        from iresearch_ray.search.filters import PreparedDisjunction

        return (
            isinstance(prepared, PreparedDisjunction)
            and prepared.score_merge == "sum"
            and len(prepared.children) > 1
            and all(isinstance(c, PreparedTerm) for c in prepared.children)
        )

    @staticmethod
    def _is_term_conjunction(prepared) -> bool:
        from iresearch_ray.search.filters import PreparedConjunction

        return (
            isinstance(prepared, PreparedConjunction)
            and not prepared.negatives
            and len(prepared.positives) > 1
            and all(isinstance(c, PreparedTerm) for c in prepared.positives)
        )

    def match_docs(self, flt: Filter, scorer=None) -> np.ndarray:
        """All matching global doc ids (unscored path)."""
        scorer = self._scorer(scorer)
        prepared = flt.prepare(self, scorer)
        nseg = len(self.segments)

        def one(i: int) -> np.ndarray:
            docs, _ = self.segments[i].filter_live(*prepared.execute(i))
            return docs + int(self.doc_bases[i])

        nthreads = min(self.query_threads, nseg)
        if nthreads > 1:
            out = list(self._executor(nthreads).map(one, range(nseg)))
        else:
            out = [one(i) for i in range(nseg)]
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)

    def count(self, flt: Filter) -> int:
        return int(self.match_docs(flt).size)

    def conv_match(self, child: Filter, group_col: str = "conv_id",
                   min_match: int = 1, scorer=None,
                   match: str = "min") -> np.ndarray:
        """Parent/child block-join analogue (``ByNestedFilter``,
        ``core/search/nested_filter.hpp:58-94``): global doc ids of
        every turn belonging to a conversation selected by the child
        filter under ``match`` semantics:

        - ``"any"``  at least one turn matches (Match::Any)
        - ``"min"``  at least ``min_match`` turns match (Match::Min)
        - ``"all"``  every live turn matches (Match::All)
        - ``"none"`` no turn matches (Match::None)

        Groups resolve through the stored ``group_col`` column (lazily
        read, one column) so a conversation spanning segment boundaries
        is counted globally."""
        import pyarrow.compute as pc

        if any(s.serve_range is not None for s in self.segments):
            # a conversation can span sub-range boundaries; per-range
            # group counts would be silently partial. Run block joins
            # on whole-segment searchers (the sharded scoring path
            # never routes them here).
            raise RuntimeError(
                "conv_match is not supported on a serve_range "
                "sub-segment view — use a whole-segment searcher")
        if match == "any":
            min_match, match = 1, "min"
        matched = self.match_docs(child, scorer)
        counts = (self.fetch_stored(matched, (group_col,))[group_col]
                  .value_counts() if matched.size else pd.Series(dtype="int64"))
        if match in ("all", "none"):
            # live group sizes: per-segment value_counts arrays summed
            # via one pandas groupby — no per-group Python (a dict
            # accumulation here is a per-row loop at 10^8 groups)
            parts = []
            for seg in self.segments:
                col = seg.docmap_column(group_col)
                dmask = seg.deleted_mask
                if dmask is not None:
                    col = col.filter(pa.array(~dmask))
                vc = pc.value_counts(
                    col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                    else col)
                parts.append(pd.Series(
                    vc.field("counts").to_numpy(zero_copy_only=False),
                    index=vc.field("values").to_pandas()))
            totals_s = (pd.concat(parts).groupby(level=0).sum()
                        if parts else pd.Series(dtype="int64"))
            if match == "all":
                aligned = counts.reindex(totals_s.index, fill_value=0)
                keys = totals_s.index[
                    aligned.to_numpy() == totals_s.to_numpy()].tolist()
            else:  # none
                keys = totals_s.index[
                    ~totals_s.index.isin(counts.index)].tolist()
        else:
            keys = counts[counts >= min_match].index.tolist()
        if not keys:
            return np.empty(0, dtype=np.int64)
        wanted = pa.array(keys)
        out = []
        for i, seg in enumerate(self.segments):
            # vectorized group membership over ONE lazily-read column
            mask = pc.is_in(seg.docmap_column(group_col),
                            value_set=wanted)
            docs = np.flatnonzero(
                mask.to_numpy(zero_copy_only=False)).astype(np.int64) + 1
            docs, _ = seg.filter_live(docs, np.zeros(docs.size, dtype=np.float32))
            out.append(docs + int(self.doc_bases[i]))
        return np.concatenate(out)

    def cached_match(self, flt: Filter, scorer=None) -> np.ndarray:
        """Memoized doc set for a filter on this snapshot — the
        ``proxy_filter`` analogue (``core/search/proxy_filter.hpp:36-55``:
        cache the result bitset of an expensive inner filter for replay
        across queries on the same reader)."""
        key = repr(flt)
        hit = self._match_cache.get(key)
        if hit is None:
            hit = self.match_docs(flt, scorer)
            self._match_cache[key] = hit
        return hit

    # -- WAND --------------------------------------------------------------
    _WAND_CHUNK = 64  # blocks (8192 docs) per prune-decode-score round

    def _wand_term(self, prepared: PreparedTerm, seg_ord: int, base: int, col: TopK):
        """Block-max pruned scan: per chunk of blocks, drop every block
        whose upper bound <= current threshold, batch-decode the
        survivors, score vectorized, push once."""
        row = prepared.state.rows[seg_ord]
        if row < 0:
            return
        seg = self.segments[seg_ord]
        norms = seg.field_norms(prepared.field)
        # a fully decoded posting list in the cache beats re-decoding
        # blocks (WAND pruning saves nothing once decode is free)
        pl = seg._pl_cache.get((int(row), False)) or seg._pl_cache.get((int(row), True))
        if pl is not None:
            scores = self._scored_cached(
                seg, ("t", int(row)) + prepared.ctx.fingerprint(),
                lambda: prepared.scorer.score(prepared.ctx, pl.tfs,
                                              norms[pl.docs - 1]))
            docs, scores = seg.filter_live(pl.docs, scores)
            col.push(docs + base, scores)
            return
        cur = seg.cursor(int(row))
        ubs = prepared.scorer.upper_bound_many(
            prepared.ctx, cur.max_tf, cur.min_dl
        )
        C = self._WAND_CHUNK
        decoded_all = True
        all_docs, all_tfs = [], []
        for start in range(0, cur.n_blocks, C):
            chunk = np.arange(start, min(start + C, cur.n_blocks))
            thr = col.threshold
            if np.isfinite(thr):
                kept = chunk[ubs[chunk] >= thr]
                if kept.size < chunk.size:
                    decoded_all = False
                chunk = kept
                if chunk.size == 0:
                    continue
            docs, tfs = cur.decode_blocks(chunk)
            if decoded_all:
                all_docs.append(docs)
                all_tfs.append(tfs)
            scores = prepared.scorer.score(prepared.ctx, tfs, norms[docs - 1])
            docs, scores = seg.filter_live(docs, scores)
            col.push(docs + base, scores)
        if decoded_all and all_docs:
            # nothing was pruned: the full decode is free to keep — later
            # queries on this term short-circuit the block loop entirely
            from iresearch_ray.index.segment import PostingList

            key = (int(row), False)
            if key not in seg._pl_cache and len(seg._pl_cache) < seg._pl_cache_max:
                seg._pl_cache[key] = PostingList(
                    np.concatenate(all_docs), np.concatenate(all_tfs)
                )

    def _wand_and(self, prepared, seg_ord: int, base: int, col: TopK):
        """Block-max conjunction (reference leapfrog,
        ``core/search/conjunction.hpp:81-120`` + wanderator block skip):

        - the cheapest (smallest-df) term drives; with a live threshold
          its blocks are pruned by per-block upper bound + the other
          terms' segment upper bounds before decode
        - every other term decodes ONLY the blocks that contain a
          surviving candidate doc (skip-list leapfrog, batched)
        - per-child scores fold in ascending-df order, the same add
          order as the exhaustive path — bit-identical results."""
        from iresearch_ray.index.segment import BLOCK_SIZE

        children = prepared.positives
        seg = self.segments[seg_ord]
        costs = [c.cost(seg_ord) for c in children]
        if min(costs) == 0:
            return  # a required term is absent from this segment
        order = np.argsort(np.asarray(costs), kind="stable")
        # structural cache (the _maxscore_or amortization): the
        # intersected doc set + per-child tfs are pure functions of the
        # (segment, term rows); only SCORES depend on collector stats.
        # A cache-miss evaluation still block-max prunes the driving
        # list against the live threshold, and the result is cached
        # ONLY when nothing was pruned (the _wand_term decoded_all
        # rule) — so the cache always holds COMPLETE intersections,
        # cold queries keep WAND pruning, and repeat queries skip the
        # decode wherever the threshold didn't bite (measured: decode
        # was ~90% of warm AndHighHigh).
        cache = getattr(seg, "_conj_cache", None)
        if cache is None:
            cache = seg._conj_cache = {}
        key = tuple(int(c.state.rows[seg_ord]) for c in children)
        hit = cache.get(key)
        complete = True
        if hit is None:
            docs = None
            tf_by_child: dict[int, np.ndarray] = {}
            for oi in order:
                c = children[int(oi)]
                row = int(c.state.rows[seg_ord])
                pl = seg._pl_cache.get((row, False)) \
                    or seg._pl_cache.get((row, True))
                if docs is None:
                    # driving list: block-max prune vs the threshold
                    thr = col.threshold
                    if pl is not None or not np.isfinite(thr):
                        pl = seg.postings(row)
                        docs, tf_by_child[int(oi)] = pl.docs, pl.tfs
                        continue
                    cur = seg.cursor(row)
                    ub_rest = sum(
                        children[int(oj)].max_score(seg_ord)
                        for oj in order[1:])
                    ubs = c.scorer.upper_bound_many(
                        c.ctx, cur.max_tf, cur.min_dl)
                    keep = np.flatnonzero(ubs + ub_rest >= thr)
                    if keep.size < cur.n_blocks:
                        complete = False
                    if keep.size == 0:
                        return
                    docs, tf_by_child[int(oi)] = cur.decode_blocks(keep)
                    continue
                if pl is not None or costs[int(oi)] <= 2 * BLOCK_SIZE:
                    pl = seg.postings(row)
                    d, t = pl.docs, pl.tfs
                else:
                    # leapfrog: decode only blocks containing candidates
                    cur = seg.cursor(row)
                    blocks = np.unique(
                        np.searchsorted(cur.last_doc, docs, side="left"))
                    blocks = blocks[blocks < cur.n_blocks]
                    d, t = cur.decode_blocks(blocks)
                idx = np.searchsorted(d, docs)
                valid = idx < d.size
                match = np.zeros(docs.size, dtype=bool)
                match[valid] = d[idx[valid]] == docs[valid]
                docs = docs[match]
                if docs.size == 0:
                    break
                for k in tf_by_child:
                    tf_by_child[k] = tf_by_child[k][match]
                tf_by_child[int(oi)] = t[idx[match]]
            hit = (docs if docs is not None and docs.size else None,
                   tf_by_child)
            if complete:
                if len(cache) >= 16:
                    cache.pop(next(iter(cache)))
                cache[key] = hit
        docs, tf_by_child = hit
        if docs is None:
            return

        def fold():
            scores = None
            for oi in order:
                c = children[int(oi)]
                dls = seg.field_norms(c.field)[docs - 1]
                s = c.scorer.score(c.ctx, tf_by_child[int(oi)], dls)
                scores = s if scores is None else scores + s
            return scores.astype(prepared.dtype)

        if complete and hit is cache.get(key):
            # scored layer over the COMPLETE cached intersection (same
            # snapshot-constant-ctx argument as _maxscore_or)
            ctx_fp = tuple(c.ctx.fingerprint() for c in children)
            scores = self._scored_cached(
                seg, ("conj", key, np.dtype(prepared.dtype).str, ctx_fp),
                fold)
        else:
            scores = fold()
        docs, scores = seg.filter_live(docs, scores)
        col.push(docs + base, scores)

    @staticmethod
    def _scored_cached(seg, key, compute):
        """Segment-level scored-result memo: valid because every
        ScoreCtx constant is embedded in ``key`` and stats are fixed on
        a snapshot (a reopen changes the constants -> natural miss).
        Cached arrays are only ever read (push/compact copy)."""
        cache = getattr(seg, "_scored_cache", None)
        if cache is None:
            cache = seg._scored_cache = {}
        hit = cache.get(key)
        if hit is None:
            hit = compute()
            if len(cache) >= 32:
                cache.pop(next(iter(cache)))
            cache[key] = hit
        return hit

    def _maxscore_or(self, prepared, seg_ord: int, base: int, col: TopK):
        """Scored pure-term disjunction with two per-segment cache
        levels (the structural analogue of Lucene's per-segment query
        cache; reference ``disjunction.hpp:1128-1168``):

        - STRUCTURAL: per-child decoded (docs, tfs, gathered norms) —
          pure functions of (segment, term rows), cached once per index
          lifetime.
        - SCORED: the merged (docs, summed scores). On a FIXED snapshot
          every child's ScoreCtx is constant (idf/avgdl are index-wide
          stats of the snapshot), so the result is a pure function of
          (rows, min_match, ctx constants) — the ctx fingerprint makes
          a reopen (which changes global stats) naturally miss.
          Deletes are NOT cached: filter_live runs per query.

        The merge itself is ``_merge_disjunction`` — THE canonical
        kernel every scored disjunction path shares, so strict results
        stay bit-identical to the exhaustive path by construction."""
        from iresearch_ray.search.filters import _merge_disjunction

        children = prepared.children
        seg = self.segments[seg_ord]
        sc_cache = getattr(seg, "_scored_disj_cache", None)
        if sc_cache is None:
            sc_cache = seg._scored_disj_cache = {}
        key = tuple(int(c.state.rows[seg_ord]) for c in children)
        ctx_fp = tuple(c.ctx.fingerprint() for c in children)
        skey = (key, prepared.min_match, np.dtype(prepared.dtype).str,
                ctx_fp)
        scored = sc_cache.get(skey)
        if scored is None:
            cache = getattr(seg, "_disj_cache", None)
            if cache is None:
                cache = seg._disj_cache = {}
            hit = cache.get(key)
            if hit is None:
                live = [(ci, int(c.state.rows[seg_ord]))
                        for ci, c in enumerate(children)
                        if c.state.rows[seg_ord] >= 0]
                pls = seg.postings_many([r for _, r in live])
                hit = [(ci, pl.docs, pl.tfs,
                        seg.field_norms(children[ci].field)[pl.docs - 1])
                       for (ci, _), pl in zip(live, pls)]
                if len(cache) >= 16:
                    cache.pop(next(iter(cache)))
                cache[key] = hit
            if not hit:
                return
            parts = [(docs, children[ci].scorer.score(children[ci].ctx,
                                                      tfs, dls))
                     for ci, docs, tfs, dls in hit]
            scored = _merge_disjunction(parts, prepared.min_match,
                                        prepared.score_merge,
                                        prepared.dtype)
            if len(sc_cache) >= 8:
                sc_cache.pop(next(iter(sc_cache)))
            sc_cache[skey] = scored
        out_docs, out_scores = scored
        docs, scores = seg.filter_live(out_docs, out_scores)
        col.push(docs + base, scores)

    # -- result assembly ---------------------------------------------------
    def _scorer(self, scorer):
        if scorer is None:
            return BM25()
        if isinstance(scorer, str):
            return get_scorer(scorer)
        return scorer

    def seg_of_docs(self, global_docs: np.ndarray) -> np.ndarray:
        # seg = largest i with doc_base[i] < doc (globals are base+local,
        # local >= 1, so doc == base+count belongs to segment i, not i+1)
        return np.searchsorted(self.doc_bases, global_docs, side="left") - 1

    def _result_frame(
        self, docs: np.ndarray, scores: np.ndarray, columns: tuple | None
    ) -> pd.DataFrame:
        out = pd.DataFrame({"doc_id": docs, "score": scores})
        if columns:
            seg_ord = self.seg_of_docs(docs)
            cols = {c: np.empty(docs.size, dtype=object) for c in columns}
            for s in np.unique(seg_ord):
                idx = np.flatnonzero(seg_ord == s)
                local = pa.array(docs[idx] - self.doc_bases[s] - 1)
                for c in columns:
                    # column-pruned: only the requested stored columns
                    # are read from the columnstore; scatter via pandas
                    # arrays, not a python list loop
                    cols[c][idx] = self.segments[s].docmap_column(c) \
                        .take(local).to_pandas().to_numpy()
            for c in columns:
                out[c] = pd.Series(cols[c], dtype=None).infer_objects()
        return out

    def fetch_stored(self, global_docs: np.ndarray, columns: tuple) -> pd.DataFrame:
        return self._result_frame(
            global_docs, np.zeros(global_docs.size, dtype=np.float32), columns
        ).drop(columns=["score"])
