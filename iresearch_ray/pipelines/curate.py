"""End-to-end corpus curation — the composed training-data pipeline
(the RefinedWeb/Gopher processing chain over one streaming Dataset):

    exact dedup  ->  quality gate (token count + repetition)  ->
    benchmark decontamination  ->  deterministic split assignment

Every stage is one of this repo's oracled operators; composing them
here shows the intended usage and keeps the whole chain lazy — one
shuffle total (the dedup groupby + id join), everything else
per-batch map transforms, so the pipeline streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from iresearch_ray.pipelines.dedup import exact_dedup
from iresearch_ray.pipelines.decontam import decontaminate
from iresearch_ray.pipelines.sampling import assign_splits
from iresearch_ray.pipelines.textstats import _flat_tokens, bigram_counts


def quality_gate(ds, text_col: str = "text", min_tokens: int = 25,
                 max_tokens: int = 95, max_dup_bigram_frac: float = 0.08):
    """Keep docs whose token count is in [min_tokens, max_tokens] and
    whose duplicate-bigram fraction is <= the cap (Gopher repetition
    rule) — one vectorized pass, rows only ever dropped."""

    def _gate(batch: pa.Table) -> pa.Table:
        n = len(batch)
        _, d = _flat_tokens(batch, text_col)
        ntok = np.bincount(d, minlength=n)
        ok = (ntok >= min_tokens) & (ntok <= max_tokens)
        total, distinct, _ = bigram_counts(batch, text_col)
        dup = np.divide(total - distinct, total,
                        out=np.zeros(n, dtype=np.float64), where=total > 0)
        ok &= dup <= max_dup_bigram_frac
        return batch.filter(pa.array(ok))

    return ds.map_batches(_gate, batch_format="pyarrow")


def curate_corpus(ds, bench_ds, *, text_col: str = "text",
                  id_col: str = "doc_id", min_tokens: int = 25,
                  max_tokens: int = 95, max_dup_bigram_frac: float = 0.08,
                  decontam_n: int = 4,
                  fractions: dict[str, float] | None = None,
                  salt: int = 0):
    """The full chain: Dataset -> (id, split) for every surviving doc.

    ``ds`` is assumed disjoint from ``bench_ds`` (callers that carve
    the benchmark out of the same table filter it first). The filters
    commute — duplicates share text, so quality/contamination verdicts
    are identical across a dup group and dedup order cannot change the
    survivor set."""
    kept = exact_dedup(ds, text_col=text_col, id_col=id_col)
    kept = quality_gate(kept, text_col, min_tokens, max_tokens,
                        max_dup_bigram_frac)
    kept = decontaminate(kept, bench_ds, n=decontam_n,
                         text_col=text_col, id_col=id_col)
    kept = assign_splits(kept, id_col, fractions=fractions, salt=salt)
    return kept.select_columns([id_col, "split"])
