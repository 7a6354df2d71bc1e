"""Distributed statistical aggregates over Ray Data (exact group
quantiles, exact distinct counts, fixed-bin histograms).

No reference analogue (the reference is a fulltext engine); these are
the analytics staples a large-scale curation pipeline runs next to it
(quality-score percentiles before picking a filter threshold, distinct
sources per language, token-count histograms for packing decisions).

Scale shapes:

- ``group_quantiles``: ONE shuffle keyed on the group column, exact
  vectorized ``np.quantile`` per group. A group must fit one worker
  (fine for categorical groups: event types, languages, sources). For
  a group too big to hold, the exact alternative is sort-by-(group,
  value) + global rank arithmetic (two wide ops); approximate needs a
  mergeable sketch (t-digest) — deliberately NOT silently substituted
  because the output would stop being bit-exact.
- ``distinct_count``: per-batch pre-dedup (np.unique) cuts the
  shuffle to the batch-local distinct pairs, then a (group, key)
  groupby dedups globally, then a tiny per-group count. Nothing but
  the pair columns ever crosses the exchange — the exact-dedup
  pattern applied to COUNT(DISTINCT).
- ``group_histogram``: per-batch (group, bin) partial counts via one
  ``np.add.at`` — only G x B count rows ride the shuffle, never data
  rows. The classic combiner-before-groupby shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc



def _int_group_sum(codes: np.ndarray, w: np.ndarray, k: int) -> np.ndarray:
    """Exact per-group int64 sums via ``np.add.at`` — unlike weighted
    ``np.bincount`` (float64 accumulator), exactness does NOT degrade
    once a per-batch partial sum exceeds 2^53 (the t_test sxx term —
    cents squared times count — gets there first at scale)."""
    out = np.zeros(k, dtype=np.int64)
    np.add.at(out, codes, w.astype(np.int64))
    return out

def group_quantiles(ds, group_col: str, value_col: str,
                    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)):
    """-> Dataset(group, q, value): exact per-group quantiles with
    linear interpolation (numpy default == SQL ``quantile_cont``)."""
    quants = np.asarray(qs, dtype=np.float64)

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        v = g[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        out = np.quantile(v, quants) if v.size else np.full(
            quants.size, np.nan)
        return pd.DataFrame({
            group_col: np.repeat(g[group_col].iloc[0], quants.size),
            "q": quants,
            "value": out,
        })

    return ds.groupby(group_col).map_groups(fn, batch_format="pandas")


def distinct_count(ds, group_col: str, key_col: str,
                   out_col: str = "n_distinct"):
    """-> Dataset(group, n_distinct): exact COUNT(DISTINCT key) per
    group. Pre-dedups inside each batch so only batch-distinct
    (group, key) pairs cross the wide shuffle."""

    def pre(batch: pa.Table) -> pa.Table:
        sub = batch.select([group_col, key_col])
        return sub.group_by([group_col, key_col]).aggregate([])

    pairs = ds.map_batches(pre, batch_format="pyarrow")
    dedup = pairs.groupby([group_col, key_col]).count()

    def project(batch: pa.Table) -> pa.Table:
        return batch.select([group_col])

    counts = dedup.map_batches(project, batch_format="pyarrow") \
        .groupby(group_col).count()

    def rename(batch: pa.Table) -> pa.Table:
        return pa.table({
            group_col: batch.column(group_col),
            out_col: batch.column("count()").cast(pa.int64()),
        })

    return counts.map_batches(rename, batch_format="pyarrow")


def group_histogram(ds, group_col: str, value_col: str,
                    lo: float, hi: float, nbins: int = 20):
    """-> Dataset(group, bin, n): fixed-bin histogram of ``value_col``
    per group over [lo, hi). Out-of-range values clamp into the edge
    bins (SQL replica: ``least(greatest(...))`` over the same floor
    arithmetic). Partial (group, bin) counts are combined per batch;
    only those count rows shuffle."""
    lo_f, hi_f = float(lo), float(hi)
    width = (hi_f - lo_f) / nbins

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        bins = np.clip(np.floor((v - lo_f) / width).astype(np.int64),
                       0, nbins - 1)
        ngroups = len(enc.dictionary)
        flat = gcodes * nbins + bins
        counts = np.bincount(flat, minlength=ngroups * nbins)
        nz = np.flatnonzero(counts)
        return pa.table({
            group_col: enc.dictionary.take(pa.array(nz // nbins)),
            "bin": pa.array((nz % nbins).astype(np.int64)),
            "n": pa.array(counts[nz].astype(np.int64)),
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    summed = partials.groupby([group_col, "bin"]).sum("n")

    def rename(batch: pa.Table) -> pa.Table:
        col = "sum(n)" if "sum(n)" in batch.column_names else "n"
        return pa.table({
            group_col: batch.column(group_col),
            "bin": batch.column("bin"),
            "n": batch.column(col).cast(pa.int64()),
        })

    return summed.map_batches(rename, batch_format="pyarrow")


def group_topk(ds, group_col: str, order_col: str, n: int = 3,
               id_col: str | None = None, descending: bool = True):
    """-> Dataset(group, rank, <id>, <order>): the top-``n`` rows per
    group by ``order_col`` (ties broken by ascending ``id_col`` for
    determinism).

    Scale shape: each batch first prunes ITSELF to its local top-n per
    group (a lexsort + run-boundary take — the combiner), so at most
    n x groups_per_batch rows cross the shuffle regardless of input
    size; the final per-group selection then runs over <= n x
    num_batches candidates per group."""
    if id_col is None:
        raise ValueError("id_col is required (deterministic tie-break)")
    sign = -1.0 if descending else 1.0

    def prune(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        gcodes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(order_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, sign * v, gcodes))
        gs = gcodes[order]
        # rank within group == distance from the group's run start
        run_start = np.empty(gs.size, dtype=bool)
        if gs.size:
            run_start[0] = True
            run_start[1:] = gs[1:] != gs[:-1]
        starts = np.cumsum(run_start) - 1
        first = np.flatnonzero(run_start)
        rank = np.arange(gs.size) - first[starts]
        keep = order[rank < n]
        return batch.take(pa.array(np.sort(keep)))

    pruned = ds.map_batches(prune, batch_format="pyarrow")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([order_col, id_col],
                          ascending=[not descending, True],
                          kind="mergesort").head(n)
        out = g[[group_col, id_col, order_col]].reset_index(drop=True)
        out.insert(1, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
        return out

    return pruned.groupby(group_col).map_groups(final, batch_format="pandas")


def filter_by_group_quantile(ds, group_col: str, value_col: str,
                             q: float = 0.25, keep: str = "above"):
    """Keep rows whose ``value_col`` is >= (``keep='above'``) or <=
    (``'below'``) their group's q-quantile — the percentile-threshold
    quality gate (e.g. drop the bottom-quartile-quality docs PER
    LANGUAGE, so a low-resource language isn't wiped out by a global
    cutoff).

    Two-pass shape: pass 1 computes the per-group thresholds
    (``group_quantiles`` — group-count-sized result), pass 2 broadcasts
    that tiny table via ``ray.put`` and filters each batch with one
    dictionary-encode + ``take`` (the ``stratified_sample`` idiom) —
    the data rows never shuffle."""
    import ray

    th = group_quantiles(ds, group_col, value_col, (q,)).to_pandas()
    lookup = dict(zip(th[group_col], th["value"]))
    ref = ray.put(lookup)
    above = keep == "above"

    class _Gate:
        def __init__(self):
            lk = ray.get(ref) if not isinstance(ref, dict) else ref
            self.lk = lk

        def __call__(self, batch: pa.Table) -> pa.Table:
            g = batch.column(group_col)
            if isinstance(g, pa.ChunkedArray):
                g = g.combine_chunks()
            enc = g.dictionary_encode()
            vals = enc.dictionary.to_pylist()
            tl = np.array([self.lk.get(v, -np.inf if above else np.inf)
                           for v in vals] + [np.nan], dtype=np.float64)
            idx = enc.indices.fill_null(len(vals)).to_numpy(
                zero_copy_only=False).astype(np.int64)
            v = batch.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
            ok = v >= tl[idx] if above else v <= tl[idx]
            return batch.filter(pa.array(ok))

    return ds.map_batches(_Gate, batch_format="pyarrow",
                          concurrency=(1, 4))


def approx_group_quantiles(ds, group_col: str, value_col: str,
                           lo: float, hi: float, bits: int = 16,
                           qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95)):
    """-> Dataset(group, q, value_q): MERGEABLE approximate per-group
    quantiles — the scale path ``group_quantiles``'s docstring defers
    to. Values are quantized to 2^bits fixed bins over [lo, hi)
    (outside clamps to the edge bins), so the sketch is an integer
    histogram: per-batch partials, ``groupby(group, bin).sum`` to
    merge (associative, exact, layout-invariant), quantile read-off
    per group over <= 2^bits count rows in ``map_groups``. Worst-case
    value error is one bin width = (hi-lo)/2^bits; rank selection is
    EXACT (first bin whose cumulative count reaches ceil(q*N), the
    ``quantile_disc`` convention), so the result is deterministic and
    bit-reproducible in the SQL oracle.

    Unlike ``group_quantiles`` no group ever has to fit a worker —
    a group's sketch is at most 2^bits rows regardless of its data
    size, and a t-digest-style accuracy/size trade is available by
    lowering ``bits``."""
    lo_f, hi_f = float(lo), float(hi)
    nbins = 1 << bits
    step = (hi_f - lo_f) / nbins
    quants = tuple(float(q) for q in qs)

    hist = group_histogram(ds, group_col, value_col, lo_f, hi_f, nbins)

    def readoff(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("bin")
        bins = g["bin"].to_numpy(dtype=np.int64)
        cum = g["n"].to_numpy(dtype=np.int64).cumsum()
        total = int(cum[-1])
        sel = np.empty(len(quants), dtype=np.int64)
        for qi, q in enumerate(quants):
            t = max(1.0, np.ceil(q * total))
            sel[qi] = bins[np.searchsorted(cum, t, side="left")]
        return pd.DataFrame({
            group_col: np.repeat(g[group_col].iloc[0], len(quants)),
            "q": np.asarray(quants, dtype=np.float64),
            "value_q": lo_f + (sel + 0.5) * step,
        })

    return hist.groupby(group_col).map_groups(readoff,
                                              batch_format="pandas")


def group_corr(ds, group_col: str, x_col: str, y_col: str,
               x_scale: float = 100.0, round_to: int | None = 6):
    """Per-group Pearson correlation of (x, y) — the correlation cell
    of the ES ``matrix_stats`` aggregation — from EXACT integer
    moments, so the result is independent of partitioning/batch order.

    ``x`` is quantized to integer units (``round(x * x_scale)``, the
    cents trick); ``y`` must already be integral. Per batch one pass
    of weighted ``np.bincount`` emits per-group int64 moments
    (n, sx, sy, sxx, syy, sxy); ONLY those moment rows ride the
    groupby-sum shuffle; a final bounded map evaluates

        corr = (n*sxy - sx*sy) / sqrt((n*sxx - sx^2)(n*syy - sy^2))

    in float64 from the exact integers — bit-replicable in SQL with
    the same CAST(... AS DOUBLE) expression. Moment magnitudes bound
    the exactness: |x_int| <= X needs n * X^2 < 2^63 (and < 2^53 for
    the float64 finalize); at trillion-row groups switch x_scale down
    or shard the group.

    -> Dataset(group, n, corr_r). corr_r is NULL(NaN) for degenerate
    (zero-variance) groups."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.round(batch.column(x_col).to_numpy(zero_copy_only=False)
                     .astype(np.float64) * x_scale).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = len(enc.dictionary)
        def wsum(w):
            return _int_group_sum(codes, w, k)
        return pa.table({
            group_col: enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "sx": pa.array(wsum(x)),
            "sy": pa.array(wsum(y)),
            "sxx": pa.array(wsum(x * x)),
            "syy": pa.array(wsum(y * y)),
            "sxy": pa.array(wsum(x * y)),
        })

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(*[Sum(c, alias_name=c)
                           for c in ("n", "sx", "sy", "sxx", "syy", "sxy")]))

    def finalize(batch: pa.Table) -> pa.Table:
        f = {c: batch.column(c).to_numpy(zero_copy_only=False)
             .astype(np.float64)
             for c in ("n", "sx", "sy", "sxx", "syy", "sxy")}
        num = f["n"] * f["sxy"] - f["sx"] * f["sy"]
        den = (np.sqrt(f["n"] * f["sxx"] - f["sx"] * f["sx"])
               * np.sqrt(f["n"] * f["syy"] - f["sy"] * f["sy"]))
        with np.errstate(invalid="ignore", divide="ignore"):
            corr = num / den
        if round_to is not None:
            p = 10.0 ** round_to
            corr = np.floor(corr * p + 0.5) / p
        return pa.table({
            group_col: batch.column(group_col),
            "n": batch.column("n").cast(pa.int64()),
            "corr_r": pa.array(corr),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


def composite_agg(ds, keys: list[str], size: int,
                  after: tuple | None = None):
    """ES ``composite`` aggregation with ``after``-key pagination:
    doc counts per distinct key tuple, key-ordered, one page of
    ``size`` buckets starting strictly after ``after``.

    Scale shape: the after-key predicate is applied INSIDE the map
    stage (vectorized lexicographic compare), so rows already paged
    past never reach the shuffle; per-batch partial counts combine
    first (only distinct surviving tuples ride the groupby); the page
    cut is a distributed ``sort(keys).limit(size)`` over the bounded
    (key, n) aggregate — the ES collection model (each page is one
    cheap pass, state lives in the after key, not the engine).

    -> pd.DataFrame(*keys, n) with exactly the page's buckets."""

    def part(batch: pa.Table) -> pa.Table:
        pdf = batch.select(keys).to_pandas()
        if after is not None:
            mask = pd.Series(False, index=pdf.index)
            eq = pd.Series(True, index=pdf.index)
            for col, av in zip(keys, after):
                mask |= eq & (pdf[col] > av)
                eq &= pdf[col] == av
            pdf = pdf[mask]
        vc = pdf.groupby(keys, sort=False).size().reset_index(name="n")
        vc["n"] = vc["n"].astype("int64")
        return pa.Table.from_pandas(vc, preserve_index=False)

    agg = (ds.map_batches(part, batch_format="pyarrow")
           .groupby(keys).sum("n"))

    def rename(batch: pa.Table) -> pa.Table:
        col = "sum(n)" if "sum(n)" in batch.column_names else "n"
        out = {k: batch.column(k) for k in keys}
        out["n"] = batch.column(col).cast(pa.int64())
        return pa.table(out)

    page = (agg.map_batches(rename, batch_format="pyarrow")
            .sort(keys).limit(size).to_pandas())
    return page.reset_index(drop=True)


def percentile_ranks(ds, group_col: str, value_col: str,
                     probes: list[float], round_to: int | None = 6):
    """ES ``percentile_ranks`` aggregation, EXACT: for each probe value
    v, the fraction of the group's values <= v (x100 in ES; emitted
    here as a [0,1] fraction so the SQL replica is one division).

    Unlike the quantile direction (which needs a sketch or a full
    sort), ranks of GIVEN probe values are just counts: per batch one
    ``np.searchsorted`` of the sorted batch values per group against
    the probe vector — (group, probe) int64 count rows are the only
    thing that shuffles; the finalize divides exact integers.

    -> Dataset(group, probe, n, rank_r)."""
    pv = np.asarray(sorted(probes), dtype=np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(value_col).to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        k = len(enc.dictionary)
        order = np.lexsort((v, codes))
        vs, cs = v[order], codes[order]
        starts = np.searchsorted(cs, np.arange(k))
        ends = np.searchsorted(cs, np.arange(k), side="right")
        rows_g, rows_p, rows_le, rows_n = [], [], [], []
        for gi in range(k):
            seg = vs[starts[gi]:ends[gi]]
            le = np.searchsorted(seg, pv, side="right")
            rows_g.append(np.full(pv.size, gi))
            rows_p.append(pv)
            rows_le.append(le.astype(np.int64))
            rows_n.append(np.full(pv.size, seg.size, dtype=np.int64))
        gi = np.concatenate(rows_g)
        return pa.table({
            group_col: enc.dictionary.take(pa.array(gi)),
            "probe": pa.array(np.concatenate(rows_p)),
            "n_le": pa.array(np.concatenate(rows_le)),
            "n": pa.array(np.concatenate(rows_n)),
        })

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "probe"])
              .aggregate(Sum("n_le", alias_name="n_le"),
                         Sum("n", alias_name="n")))

    def finalize(batch: pa.Table) -> pa.Table:
        n_le = batch.column("n_le").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        rank = n_le / n
        if round_to is not None:
            p = 10.0 ** round_to
            rank = np.floor(rank * p + 0.5) / p
        return pa.table({
            group_col: batch.column(group_col),
            "probe": batch.column("probe"),
            "n": batch.column("n").cast(pa.int64()),
            "rank_r": pa.array(rank),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


def group_extended_stats(ds, group_col: str, value_col: str,
                         x_scale: float = 100.0,
                         round_to: int | None = 6):
    """ES ``extended_stats`` metric aggregation per group: count, min,
    max, sum, avg, variance (population, the ES default) — from EXACT
    integer moments via the same cents-quantization as
    :func:`group_corr`, so the reduce is order-independent and the
    float finalize is bit-replicable in SQL.

    Per batch: int64 (n, sx, sxx) via weighted bincount plus per-group
    min/max; the groupby merges with Sum/Min/Max — only G moment rows
    shuffle. Finalize: avg = sx/n/scale, var = (sxx/n - (sx/n)^2) /
    scale^2, both plain IEEE expressions."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        x = np.round(batch.column(value_col).to_numpy(zero_copy_only=False)
                     .astype(np.float64) * x_scale).astype(np.int64)
        k = len(enc.dictionary)
        n = np.bincount(codes, minlength=k)
        sx = _int_group_sum(codes, x, k)
        sxx = _int_group_sum(codes, x * x, k)
        mn = np.full(k, np.iinfo(np.int64).max, dtype=np.int64)
        mx = np.full(k, np.iinfo(np.int64).min, dtype=np.int64)
        np.minimum.at(mn, codes, x)
        np.maximum.at(mx, codes, x)
        return pa.table({
            group_col: enc.dictionary,
            "n": pa.array(n.astype(np.int64)),
            "sx": pa.array(sx.astype(np.int64)),
            "sxx": pa.array(sxx.astype(np.int64)),
            "mn": pa.array(mn),
            "mx": pa.array(mx),
        })

    from ray.data.aggregate import Max, Min, Sum

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("sx", alias_name="sx"),
                         Sum("sxx", alias_name="sxx"),
                         Min("mn", alias_name="mn"),
                         Max("mx", alias_name="mx")))

    inv = 1.0 / x_scale

    def finalize(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sx = batch.column("sx").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sxx = batch.column("sxx").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        avg = sx / n * inv
        var = (sxx / n - (sx / n) * (sx / n)) * (inv * inv)
        if round_to is not None:
            p = 10.0 ** round_to
            avg = np.floor(avg * p + 0.5) / p
            var = np.floor(var * p + 0.5) / p
        return pa.table({
            group_col: batch.column(group_col),
            "n": batch.column("n").cast(pa.int64()),
            "min_c": batch.column("mn").cast(pa.int64()),
            "max_c": batch.column("mx").cast(pa.int64()),
            "sum_c": batch.column("sx").cast(pa.int64()),
            "avg_r": pa.array(avg),
            "var_r": pa.array(var),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


def group_weighted_avg(ds, group_col: str, value_col: str,
                       weight_col: str, v_scale: float = 100.0,
                       round_to: int | None = 6):
    """ES ``weighted_avg`` aggregation: sum(v*w)/sum(w) per group from
    exact integer moments (v quantized to ``v_scale`` units, w must be
    integral) — same combiner/finalize discipline as
    :func:`group_corr`. -> Dataset(group, n, wavg_r)."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = np.round(batch.column(value_col).to_numpy(zero_copy_only=False)
                     .astype(np.float64) * v_scale).astype(np.int64)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        k = len(enc.dictionary)
        return pa.table({
            group_col: enc.dictionary,
            "n": pa.array(np.bincount(codes, minlength=k)
                          .astype(np.int64)),
            "svw": pa.array(_int_group_sum(codes, v * w, k)),
            "sw": pa.array(_int_group_sum(codes, w, k)),
        })

    from ray.data.aggregate import Sum

    summed = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(group_col)
              .aggregate(Sum("n", alias_name="n"),
                         Sum("svw", alias_name="svw"),
                         Sum("sw", alias_name="sw")))
    inv = 1.0 / v_scale

    def finalize(batch: pa.Table) -> pa.Table:
        svw = batch.column("svw").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        sw = batch.column("sw").to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        wavg = svw / sw * inv
        if round_to is not None:
            p = 10.0 ** round_to
            wavg = np.floor(wavg * p + 0.5) / p
        return pa.table({
            group_col: batch.column(group_col),
            "n": batch.column("n").cast(pa.int64()),
            "wavg_r": pa.array(wavg),
        })

    return summed.map_batches(finalize, batch_format="pyarrow")


def group_top_metrics(ds, group_col: str, sort_col: str, metric_col: str,
                      s_scale: float = 100.0):
    """ES ``top_metrics`` aggregation: per group, the value of
    ``metric_col`` on the row with the LARGEST ``sort_col`` (tie: the
    smallest metric value — a total order, so the result is
    layout-invariant). Per batch one lexsort picks each group's local
    winner; only G winner rows ride the shuffle; the same rule merges
    partials. -> pd.DataFrame(group, sort_c, metric) sorted by group.

    ``metric_col`` must be integer-typed: the winner row's metric and
    the deterministic tie-break both ride exact int64 (a float metric
    would be silently truncated — rejected instead; pre-scale floats
    to integer units the way ``sort_col`` uses ``s_scale``)."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        if pa.types.is_floating(batch.schema.field(metric_col).type):
            raise TypeError(
                f"top_metrics metric column {metric_col!r} is "
                "float-typed; it would be truncated by the exact int64 "
                "winner/tie-break path — scale it to integer units "
                "first (cents, micros), as sort_col does via s_scale")
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        s = np.round(batch.column(sort_col).to_numpy(zero_copy_only=False)
                     .astype(np.float64) * s_scale).astype(np.int64)
        m = batch.column(metric_col).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # winner per group: max s, tie -> min m (lexsort ascending, so
        # order by (codes, s, -m) and take each group's LAST row)
        order = np.lexsort((-m, s, codes))
        cs, ss, ms = codes[order], s[order], m[order]
        last = np.flatnonzero(np.diff(cs, append=-1) != 0)
        return pa.table({
            group_col: enc.dictionary.take(pa.array(cs[last])),
            "sort_c": pa.array(ss[last]),
            "metric": pa.array(ms[last]),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        p = g.sort_values(["sort_c", "metric"], ascending=[True, False],
                          kind="mergesort")
        return p.tail(1)

    # same total order merges the partials DISTRIBUTED (one winner row
    # per group per batch reaches the shuffle; the groupby output is G
    # rows, so the driver only ever holds the final frame)
    out = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(group_col).map_groups(merge, batch_format="pandas")
           .to_pandas())
    if out.empty:
        return out
    out = out.sort_values(group_col).reset_index(drop=True)
    out["sort_c"] = out["sort_c"].astype("int64")
    out["metric"] = out["metric"].astype("int64")
    return out


def group_ttest(ds, group_col: str, value_col: str, group_a, group_b,
                v_scale: float = 100.0, round_to: int | None = 6):
    """ES ``t_test`` aggregation (unpaired heteroscedastic = Welch):
    t between the value distributions of two groups, from exact
    integer moments (n, sum, sum-of-squares in ``v_scale`` units) —
    only 2 moment rows cross the shuffle. Welch:

      t  = (m1 - m2) / sqrt(v1/n1 + v2/n2),   v = sample variance
      df = (v1/n1 + v2/n2)^2
           / ((v1/n1)^2/(n1-1) + (v2/n2)^2/(n2-1))

    -> pd.DataFrame(group_a, group_b, n_a, n_b, t_r, df_r); every
    finalize step is a plain IEEE double expression so a SQL replica
    evaluates bit-identically."""
    import pandas as pd

    ga, gb = str(group_a), str(group_b)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        keep = pc.is_in(g, value_set=pa.array([ga, gb]))
        t = batch.filter(keep)
        if t.num_rows == 0:
            return pa.table({"side": pa.array([], type=pa.string()),
                             "n": pa.array([], type=pa.int64()),
                             "sx": pa.array([], type=pa.int64()),
                             "sxx": pa.array([], type=pa.int64())})
        gg = t.column(group_col)
        if isinstance(gg, pa.ChunkedArray):
            gg = gg.combine_chunks()
        is_a = pc.equal(gg, ga).to_numpy(zero_copy_only=False)
        codes = np.where(is_a, 0, 1).astype(np.int64)
        v = np.round(t.column(value_col).to_numpy(zero_copy_only=False)
                     .astype(np.float64) * v_scale).astype(np.int64)
        return pa.table({
            "side": pa.array([ga, gb]),
            "n": pa.array(np.bincount(codes, minlength=2)
                          .astype(np.int64)),
            "sx": pa.array(_int_group_sum(codes, v, 2)),
            "sxx": pa.array(_int_group_sum(codes, v * v, 2)),
        })

    from ray.data.aggregate import Sum

    m = (ds.map_batches(partial, batch_format="pyarrow")
         .groupby("side")
         .aggregate(Sum("n", alias_name="n"),
                    Sum("sx", alias_name="sx"),
                    Sum("sxx", alias_name="sxx"))
         .to_pandas().set_index("side"))
    inv = 1.0 / v_scale

    def side(s):
        n = float(m.loc[s, "n"])
        sx = float(m.loc[s, "sx"])
        sxx = float(m.loc[s, "sxx"])
        mean = sx / n * inv
        # sample variance from exact moments, in value units
        var = (sxx - sx * sx / n) / (n - 1.0) * inv * inv
        return n, mean, var

    na, ma2, va = side(ga)
    nb, mb2, vb = side(gb)
    se2 = va / na + vb / nb
    t_stat = (ma2 - mb2) / np.sqrt(se2)
    dof = (se2 * se2) / ((va / na) * (va / na) / (na - 1.0)
                         + (vb / nb) * (vb / nb) / (nb - 1.0))
    if round_to is not None:
        p = 10.0 ** round_to
        t_stat = np.floor(t_stat * p + 0.5) / p
        dof = np.floor(dof * p + 0.5) / p
    return pd.DataFrame({
        "group_a": [ga], "group_b": [gb],
        "n_a": np.array([na], dtype=np.int64),
        "n_b": np.array([nb], dtype=np.int64),
        "t_r": [float(t_stat)], "df_r": [float(dof)],
    })


def group_string_stats(ds, group_col: str, text_col: str,
                       round_to: int | None = 6):
    """ES ``string_stats`` metric aggregation per group: doc count,
    min/max/avg string length and the Shannon entropy (base 2) of the
    byte distribution. ASCII input assumed (bytes == characters, the
    corpus-wide convention shared with the dedup hash SQL replicas).

    One shuffle of (group, byte) integer count rows (alphabet-bounded:
    <= 256 rows per group per batch) merged with the length moments via
    a byte=-1 sentinel row (neutral elements make Min/Max/Sum correct
    on the other kind's rows). The entropy finalize runs over the
    merged EXACT integer counts in ascending byte order with a
    sequential accumulator — the same operation order a SQL
    ``list_reduce`` over an ordered list evaluates, so the replica is
    bit-identical before rounding:

      H = log2(N) - (sum_i c_i * log2(c_i)) / N
    """
    import math

    NEUTRAL_MIN = np.int64(2 ** 62)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        if isinstance(g, pa.ChunkedArray):
            g = g.combine_chunks()
        enc = g.dictionary_encode()
        codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        k = len(enc.dictionary)
        t = batch.column(text_col)
        if isinstance(t, pa.ChunkedArray):
            t = t.combine_chunks()
        lens = pc.utf8_length(t).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        # byte histogram straight off the utf8 value buffer (zero-copy)
        off_dt = np.int64 if pa.types.is_large_string(t.type) else np.int32
        offs = np.frombuffer(t.buffers()[1], dtype=off_dt)[
            t.offset : t.offset + len(t) + 1].astype(np.int64)
        buf = t.buffers()[2]
        data = (np.frombuffer(buf, dtype=np.uint8)
                if buf is not None else np.empty(0, np.uint8))
        data = data[offs[0] : offs[-1]]
        blens = np.diff(offs)
        gid = np.repeat(codes, blens)
        joint = gid * 256 + data.astype(np.int64)
        bc = np.bincount(joint, minlength=k * 256)
        nz = np.flatnonzero(bc)
        # per-group length moments
        n = np.bincount(codes, minlength=k).astype(np.int64)
        sum_l = _int_group_sum(codes, lens, k)
        min_l = np.full(k, NEUTRAL_MIN, dtype=np.int64)
        np.minimum.at(min_l, codes, lens)
        max_l = np.full(k, -1, dtype=np.int64)
        np.maximum.at(max_l, codes, lens)
        dict_np = enc.dictionary
        char_g = dict_np.take(pa.array(nz // 256))
        zeros_c = np.zeros(nz.size, np.int64)
        return pa.table({
            group_col: pa.concat_arrays(
                [char_g.cast(pa.string()), dict_np.cast(pa.string())]),
            "byte": pa.array(np.concatenate(
                [nz % 256, np.full(k, -1, np.int64)])),
            "cnt": pa.array(np.concatenate([bc[nz], zeros_c[:0],
                                            np.zeros(k, np.int64)])),
            "n": pa.array(np.concatenate([zeros_c, n])),
            "min_l": pa.array(np.concatenate(
                [np.full(nz.size, NEUTRAL_MIN, np.int64), min_l])),
            "max_l": pa.array(np.concatenate(
                [np.full(nz.size, -1, np.int64), max_l])),
            "sum_l": pa.array(np.concatenate([zeros_c, sum_l])),
        })

    from ray.data.aggregate import Max, Min, Sum

    merged = (ds.map_batches(partial, batch_format="pyarrow")
              .groupby([group_col, "byte"])
              .aggregate(Sum("cnt", alias_name="cnt"),
                         Sum("n", alias_name="n"),
                         Min("min_l", alias_name="min_l"),
                         Max("max_l", alias_name="max_l"),
                         Sum("sum_l", alias_name="sum_l"))
              .to_pandas())
    rows = []
    for gval, gdf in merged.groupby(group_col, sort=True):
        sent = gdf[gdf["byte"] == -1].iloc[0]
        chars = gdf[gdf["byte"] >= 0].sort_values("byte")
        c = chars["cnt"].to_numpy().astype(np.float64)
        total = float(c.sum())
        acc = 0.0
        for x in c:                      # sequential, byte-ascending —
            acc += x * math.log2(x)      # matches the SQL list_reduce
        ent = math.log2(total) - acc / total if total > 0 else 0.0
        avg = float(sent["sum_l"]) / float(sent["n"])
        rows.append((gval, int(sent["n"]), int(sent["min_l"]),
                     int(sent["max_l"]), avg, ent))
    out = pd.DataFrame(rows, columns=[group_col, "n", "min_len",
                                      "max_len", "avg_len_r", "entropy_r"])
    if round_to is not None:
        p = 10.0 ** round_to
        for cname in ("avg_len_r", "entropy_r"):
            out[cname] = np.floor(out[cname] * p + 0.5) / p
    return out.reset_index(drop=True)


# auto_date_histogram interval ladder, in seconds (the ES rounding
# candidates: 1s/5s/10s/30s, 1m/5m/10m/30m, 1h/3h/12h, 1d/7d/30d/1y)
AUTO_HISTO_LADDER = (1, 5, 10, 30, 60, 300, 600, 1800,
                     3600, 10800, 43200, 86400, 604800, 2592000, 31536000)


def auto_date_histogram(ds, ts_col: str, target_buckets: int = 50):
    """ES ``auto_date_histogram``: pick the SMALLEST ladder interval
    whose bucket count fits ``target_buckets``, then date-histogram on
    it. Bucket count for interval i is
    ``floor(max_epoch/i) - floor(min_epoch/i) + 1`` — pure integer
    arithmetic on epoch seconds, so a SQL replica chooses the identical
    interval. Two passes: a (min, max) aggregate over the ts column
    only, then one (bucket, count) groupby with per-batch combining.
    -> pd.DataFrame(bucket, interval_s, n) sorted by bucket."""
    from ray.data.aggregate import Max, Min

    def to_epoch(batch: pa.Table) -> pa.Table:
        # normalize to timestamp[us] before the integer epoch math: a
        # ns/ms/s-unit column would otherwise bucket on the wrong scale
        # and pick a wrong ladder interval
        col = batch.column(ts_col)
        t = col.type
        if pa.types.is_timestamp(t) and t.unit != "us":
            col = pc.cast(col, pa.timestamp("us", tz=t.tz))
        e = pc.divide(pc.cast(col, pa.int64()), 1_000_000)
        return pa.table({"e": e})

    epochs = ds.map_batches(to_epoch, batch_format="pyarrow")
    mm = epochs.aggregate(Min("e", alias_name="mn"),
                          Max("e", alias_name="mx"))
    mn, mx = int(mm["mn"]), int(mm["mx"])
    interval = AUTO_HISTO_LADDER[-1]
    for i in AUTO_HISTO_LADDER:
        if mx // i - mn // i + 1 <= target_buckets:
            interval = i
            break

    def partial(batch: pa.Table) -> pa.Table:
        e = batch.column("e").to_numpy(zero_copy_only=False)
        b = (e // interval) * interval
        uniq, cnt = np.unique(b, return_counts=True)
        return pa.table({"bucket_s": pa.array(uniq),
                         "n": pa.array(cnt.astype(np.int64))})

    out = (epochs.map_batches(partial, batch_format="pyarrow")
           .groupby("bucket_s").sum("n").to_pandas())
    ncol = "sum(n)" if "sum(n)" in out.columns else "n"
    out = pd.DataFrame({
        "bucket": pd.to_datetime(out["bucket_s"].astype("int64"),
                                 unit="s").astype("datetime64[us]"),
        "interval_s": np.full(len(out), interval, dtype=np.int64),
        "n": out[ncol].astype("int64"),
    })
    return out.sort_values("bucket").reset_index(drop=True)
