"""HTML text extraction (boilerplate strip) — the WET-style first
stage of a web-scale training-data pipeline: raw pages in, clean
prose out (no analogue in the reference, which ingests pre-extracted
text; its nearest machinery is the analyzer normalization chain,
``core/analysis/text_token_normalizing_stream.cpp``).

Design for 100 TB: a ``map_batches`` actor pool whose whole column
goes through ``pyarrow.compute.replace_substring_regex`` (RE2) /
``replace_substring`` kernels — zero per-row Python, streaming,
spill-friendly. Steps are applied in declaration order so a DuckDB
``regexp_replace(..., 'g')`` / ``replace`` chain with the same order
is an exact oracle (DuckDB is RE2 too; inline ``(?is)`` flags keep
the two engines' semantics identical).

No HTML parser libs exist in this environment (and at 100 TB a
DOM parse per page is the wrong cost model anyway); this is the
regex-cascade extraction used by the classic WET/CC pipelines:
drop script/style/comment blocks, strip tags, decode the six
ubiquitous entities, collapse whitespace.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (kind, pattern-or-literal, replacement) applied in order.
# "re" steps are RE2; "lit" steps are literal substring replaces.
# Script/style/comment blocks go first (their payload may contain
# '<' that the tag-strip step would otherwise mangle); '&amp;' is
# decoded LAST so '&amp;lt;' yields '&lt;' (single-decode), the
# standard entity-decode order.
DEFAULT_STEPS: list[tuple[str, str, str]] = [
    ("re", r"(?is)<script[^>]*>.*?</script>", " "),
    ("re", r"(?is)<style[^>]*>.*?</style>", " "),
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"<[^>]*>", " "),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&amp;", "&"),
    ("re", r"\s+", " "),
]


class HtmlExtractor:
    """map_batches actor: RE2/literal cascade turning an HTML column
    into clean text plus its length (``n_chars_clean``), so a
    downstream quality gate can drop empty/boilerplate-only pages
    without rescanning."""

    def __init__(self, html_col: str = "html", out_col: str = "clean_text",
                 steps: list[tuple[str, str, str]] | None = None):
        self.html_col = html_col
        self.out_col = out_col
        self.steps = steps if steps is not None else DEFAULT_STEPS

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self.html_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        for kind, pat, rep in self.steps:
            if kind == "re":
                col = pc.replace_substring_regex(col, pattern=pat,
                                                 replacement=rep)
            else:
                col = pc.replace_substring(col, pattern=pat,
                                           replacement=rep)
        col = pc.utf8_trim_whitespace(col)
        out = batch.drop_columns([c for c in (self.out_col,)
                                  if c in batch.column_names])
        out = out.append_column(self.out_col, col)
        return out.append_column(
            "n_chars_clean", pc.cast(pc.utf8_length(col), pa.int64()))


def extract_html(ds, html_col: str = "html", out_col: str = "clean_text",
                 steps: list[tuple[str, str, str]] | None = None,
                 concurrency: int = 8, batch_size: int | None = None):
    """Dataset -> Dataset with ``out_col`` (extracted text) and
    ``n_chars_clean`` appended. Streaming, actor-pool, zero per-row
    Python. The pool autoscales (1, concurrency) so it can never
    reserve every session CPU and starve the upstream read stage."""
    return ds.map_batches(
        HtmlExtractor,
        fn_constructor_kwargs={"html_col": html_col, "out_col": out_col,
                               "steps": steps},
        batch_format="pyarrow",
        concurrency=(1, concurrency),
        **({"batch_size": batch_size} if batch_size else {}),
    )
