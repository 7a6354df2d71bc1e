"""PII scrubbing over a text column — a first-class training-data
pipeline stage (no analogue in the reference: the closest machinery is
the analyzer normalization chain, ``core/analysis/
text_token_normalizing_stream.cpp``, which rewrites rather than
redacts).

Design for 100 TB: one stateful actor pool (`map_batches(PiiScrubber,
concurrency=N)`) whose regexes are compiled ONCE per actor in
``__init__``; per batch the whole column goes through
``pyarrow.compute.replace_substring_regex`` (RE2, zero per-row
Python). Patterns are applied in declaration order so a DuckDB
``regexp_replace(..., 'g')`` chain with the same order is an exact
oracle (DuckDB is RE2 too).
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement) — order matters (email before the
# bare digit-run rule so user123@... isn't half-eaten, phone before
# digit runs so separators keep the match anchored).
DEFAULT_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"([0-9]{1,3}\.){3}[0-9]{1,3}", "<IP>"),
    ("longnum", r"[0-9]{13,19}", "<NUM>"),
]


class PiiScrubber:
    """map_batches actor: chained RE2 redaction over one string column.

    Emits the scrubbed column plus ``n_redactions`` (how many
    placeholders were inserted per doc — count of pattern hits), so a
    downstream filter can drop PII-heavy docs without rescanning.
    """

    def __init__(self, text_col: str = "text", out_col: str | None = None,
                 patterns: list[tuple[str, str, str]] | None = None):
        self.text_col = text_col
        self.out_col = out_col or text_col
        self.patterns = patterns if patterns is not None else DEFAULT_PATTERNS

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.text_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        scrubbed = col
        n_red = None
        for _, pat, rep in self.patterns:
            hits = pc.count_substring_regex(scrubbed, pat)
            n_red = hits if n_red is None else pc.add(n_red, hits)
            scrubbed = pc.replace_substring_regex(scrubbed, pattern=pat,
                                                  replacement=rep)
        out = batch
        if self.out_col in out.column_names:
            out = out.set_column(out.column_names.index(self.out_col),
                                 self.out_col, scrubbed)
        else:
            out = out.append_column(self.out_col, scrubbed)
        return out.append_column(
            "n_redactions", pc.cast(n_red, pa.int64()))


def scrub_pii(ds, text_col: str = "text", out_col: str | None = None,
              patterns: list[tuple[str, str, str]] | None = None,
              concurrency: int = 8, batch_size: int | None = None):
    """Dataset -> Dataset with ``out_col`` scrubbed and ``n_redactions``
    appended. Streaming, actor-pool, zero per-row Python."""
    return ds.map_batches(
        PiiScrubber,
        fn_constructor_kwargs=dict(text_col=text_col, out_col=out_col,
                                   patterns=patterns),
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        **({"batch_size": batch_size} if batch_size else {}),
    )
