"""Vectorized analyzers (tokenizers) over Arrow string columns.

Functional rebuild of the reference analyzer family
(``core/analysis/*_token_stream.*``). Each analyzer turns a batch of
texts (a ``pyarrow`` string array) into an *exploded token table*:

    (doc_idx: int64, term: pa.StringArray, pos: int64)

where ``pos`` is the 0-based token position within the doc (the
``increment``-accumulated position attribute of the reference token
streams). All hot paths are ``pyarrow.compute`` / numpy — no per-row
Python in the default ``segmentation`` analyzer.

Registry semantics mirror ``REGISTER_ANALYZER_JSON``
(``core/analysis/analyzers.cpp``): ``get_analyzer(name, options_dict)``.

Defaults of ``segmentation`` follow the reference
(``core/analysis/segmentation_token_stream.hpp:51-52``):
``case=lower``, ``break=alpha`` (only tokens containing
letters/digits are emitted).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# token-boundary pattern for break=alpha: a token is a maximal run of
# unicode letters/digits (approximation of UAX#29 word break with the
# ALPHA filter used by the reference benchmark default).
_ALPHA_SPLIT = r"[^\pL\pN]+"
_GRAPHIC_SPLIT = r"\s+"

# reference rejects over-long terms (core/index/field_data.cpp:1054-1061)
MAX_TERM_BYTES = 8191

# small default English stopword list for the `text` analyzer; the
# reference ships per-locale snowball stopword files — we keep the
# mechanism (set filter) with a minimal builtin list.
DEFAULT_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)


def _flatten_tokens(
    lists: pa.ListArray, n_docs: int
) -> tuple[np.ndarray, pa.Array, np.ndarray]:
    """Explode a list<string> token array into (doc_idx, term, pos).

    Empty-string tokens (artifacts of regex splitting at boundaries) are
    dropped and positions are re-counted over the kept tokens, matching
    token-stream increment semantics.
    """
    lists = lists.combine_chunks() if isinstance(lists, pa.ChunkedArray) else lists
    flat = pc.list_flatten(lists)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False)
    counts = np.nan_to_num(counts, nan=0).astype(np.int64)  # null text -> 0 tokens
    # int32 token-table dtype: a batch holds < 2^31 docs/tokens by
    # construction, and halving the (doc_idx, pos) traffic matters in
    # the inversion sort+gather hot path
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int32), counts)
    keep = pc.and_(pc.is_valid(flat), pc.not_equal(flat, "")).to_numpy(
        zero_copy_only=False
    )
    if not keep.all():
        keep_idx = np.flatnonzero(keep)
        flat = flat.take(pa.array(keep_idx))
        doc_idx = doc_idx[keep_idx]
    # positions: occurrence index within each doc (doc_idx is nondecreasing)
    n = doc_idx.size
    if n == 0:
        return doc_idx, flat, np.empty(0, dtype=np.int32)
    starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
    run_lens = np.diff(np.append(starts, n))
    pos = np.arange(n, dtype=np.int32) \
        - np.repeat(starts.astype(np.int32), run_lens)
    return doc_idx, flat, pos


@dataclass
class Analyzer:
    """Base analyzer: subclasses implement ``tokenize``.

    ``tokenize(texts)`` -> (doc_idx, terms, pos) exploded token table.
    ``tokenize_offsets(texts)`` -> (doc_idx, terms, pos, start, end) with
    character offsets into the original text (the ``offset`` token
    attribute of the reference, ``core/analysis/token_attributes.hpp:37``)
    — only analyzers that track source spans implement it.
    ``tokenize_query(text)`` -> list[str] terms for a single query string.
    """

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        raise NotImplementedError

    def tokenize_offsets(self, texts: pa.Array):
        raise NotImplementedError(
            f"{type(self).__name__} does not expose token offsets (OFFS)"
        )

    def tokenize_offsets_payloads(self, texts: pa.Array):
        """(doc_idx, terms, pos, start, end, payloads) — OFFS+PAY on one
        field (the reference stores both in the same ``.pay`` stream,
        ``core/formats/formats_10.cpp:326-333``). Default: offsets from
        ``tokenize_offsets`` with all-zero payloads; analyzers that
        carry real payloads override."""
        d, t, p, s, e = self.tokenize_offsets(texts)
        return d, t, p, s, e, np.zeros(d.size, dtype=np.uint64)

    def tokenize_query(self, text: str) -> list[str]:
        _, terms, _ = self.tokenize(pa.array([text], type=pa.string()))
        return terms.to_pylist()


def _reset_cumsum_excl(vals: np.ndarray, run_starts: np.ndarray,
                       run_lens: np.ndarray) -> np.ndarray:
    """Exclusive cumulative sum restarting at every run start."""
    if vals.size == 0:
        return vals.astype(np.int64)
    cum = np.concatenate(([0], np.cumsum(vals)[:-1]))
    base = np.repeat(cum[run_starts], run_lens)
    return cum - base


def _split_with_offsets(
    texts: pa.Array, sep_pattern: str, tok_pattern: str, pad: str
) -> tuple[np.ndarray, pa.Array, np.ndarray, np.ndarray, np.ndarray]:
    """Tokenize by splitting on ``sep_pattern`` while recovering each
    token's character span in the original string — fully vectorized.

    Trick: pad every text with one separator char on each side, then
    split TWICE — once on the separator pattern (pieces = the tokens,
    with one guaranteed-empty piece at each end) and once on the token
    pattern (pieces = the separator runs, all non-empty, exactly
    tokens+1 of them). The padded text is the exact interleave
    ``sep0 tok0 sep1 tok1 ... tokK sepK+1``, so token start offsets are
    two per-doc reset-cumsums over the two length arrays. No per-row
    Python; cost is ~2x a plain split.
    """
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    n = len(texts)
    if n == 0:
        e = np.empty(0, np.int32)
        return (e, pa.array([], type=pa.string()), e.copy(), e.copy(),
                e.copy())
    padded = pc.binary_join_element_wise(
        pa.array([pad] * n, type=pa.string()), texts,
        pa.array([pad] * n, type=pa.string()), "")
    tok_lists = pc.split_pattern_regex(padded, sep_pattern)
    sep_lists = pc.split_pattern_regex(padded, tok_pattern)
    tok_flat = pc.list_flatten(tok_lists)
    sep_flat = pc.list_flatten(sep_lists)
    tc = pc.list_value_length(tok_lists).to_numpy(zero_copy_only=False)
    tc = np.nan_to_num(tc, nan=0).astype(np.int64)  # null text -> 0 pieces
    sc = pc.list_value_length(sep_lists).to_numpy(zero_copy_only=False)
    sc = np.nan_to_num(sc, nan=0).astype(np.int64)
    # token pieces: drop the leading/trailing empty piece of each doc
    nt = int(tc.sum())
    doc_t = np.repeat(np.arange(n, dtype=np.int64), tc)
    t_starts = np.concatenate(([0], np.cumsum(tc)[:-1]))
    within_t = np.arange(nt, dtype=np.int64) - np.repeat(t_starts, tc)
    keep_t = (within_t > 0) & (within_t < np.repeat(tc, tc) - 1)
    keep_idx = np.flatnonzero(keep_t)
    tokens = tok_flat.take(pa.array(keep_idx))
    doc_idx = doc_t[keep_idx]
    t_lens = pc.utf8_length(tokens).to_numpy(zero_copy_only=False).astype(np.int64)
    # separator pieces: pair token j with the inclusive sum sep[0..j]
    ns = int(sc.sum())
    s_lens = pc.utf8_length(sep_flat).to_numpy(zero_copy_only=False)
    s_lens = np.nan_to_num(s_lens, nan=0).astype(np.int64)
    s_starts = np.concatenate(([0], np.cumsum(sc)[:-1]))
    s_incl = np.cumsum(s_lens)
    if ns:
        s_base = np.repeat(s_incl[s_starts] - s_lens[s_starts], sc)
        s_incl = s_incl - s_base  # inclusive reset-cumsum per doc
    within_s = np.arange(ns, dtype=np.int64) - np.repeat(s_starts, sc)
    pair = s_incl[within_s < np.repeat(sc, sc) - 1]  # drop last sep piece/doc
    # token-count positions + exclusive sums of kept token lengths
    nk = doc_idx.size
    if nk == 0:
        e = np.empty(0, np.int32)
        return e, tokens, e.copy(), e.copy(), e.copy()
    k_starts = np.flatnonzero(np.diff(doc_idx, prepend=-1))
    k_lens = np.diff(np.append(k_starts, nk))
    pos = np.arange(nk, dtype=np.int32) \
        - np.repeat(k_starts.astype(np.int32), k_lens)
    t_excl = _reset_cumsum_excl(t_lens, k_starts, k_lens)
    start = (pair + t_excl - len(pad)).astype(np.int32, copy=False)
    return (doc_idx.astype(np.int32, copy=False), tokens, pos, start,
            start + t_lens.astype(np.int32, copy=False))


def _ascii_token_mask(
    data: np.ndarray, word_break: str, nonascii_tokens: bool = False
) -> np.ndarray:
    """Token-byte mask via range comparisons (faster than a 256-LUT
    fancy index: ~4 SIMD passes over the buffer).

    ``nonascii_tokens`` marks every byte >= 0x80 as a token byte — valid
    when the caller guarantees all non-ASCII codepoints in the batch are
    token codepoints (always true for ``graphic``: RE2's ``\\s`` is
    ASCII-only; gated by a one-pass regex check for ``alpha``)."""
    if word_break == "alpha":
        lo = data | 0x20
        m = (((lo >= 0x61) & (lo <= 0x7A))
             | ((data >= 0x30) & (data <= 0x39)))
        return (m | (data >= 0x80)) if nonascii_tokens else m
    # graphic (\S+ split parity): separators are RE2's \s =
    # [\t\n\f\r ] — NOT \v (0x0B), which RE2 excludes from \s.
    # Bytes >= 0x80 are never \s, so graphic needs no extra handling.
    return ~((data == 0x20) | (data == 0x09) | (data == 0x0A)
             | (data == 0x0C) | (data == 0x0D))


def _ascii_tokenize(texts: pa.Array, word_break: str, case: str,
                    nonascii_tokens: bool = False):
    """(doc_idx, tokens, pos, start_rel, lens) over an all-ASCII,
    null-free string array — no RE2, no list arrays, no per-row work.
    With ``nonascii_tokens`` it also serves UTF-8 batches whose
    non-ASCII codepoints are all token codepoints (texts must then be
    pre-case-folded and ``case`` passed as ``"none"``; offsets are BYTE
    offsets, not char offsets). Steps:

    1. token-byte mask by range comparisons,
    2. run edges from ONE flatnonzero over the mask diff (+1 at run
       starts, -1 at ends — runs alternate so even/odd split them),
    3. doc boundaries that fall inside a run get an (end, start) pair
       spliced in (one O(edges) masked insert),
    4. token bytes = ``data[mask]`` (runs are maximal, so the masked
       bytes ARE the concatenated tokens), case-folded arithmetically.

    Byte offsets equal char offsets (ASCII), so the same pass serves
    ``tokenize_offsets``.
    """
    n = len(texts)
    off0 = texts.offset
    offs = np.frombuffer(texts.buffers()[1], dtype=np.int32)[
        off0: off0 + n + 1].astype(np.int64)
    data = np.frombuffer(texts.buffers()[2], dtype=np.uint8)
    lo_b, hi_b = int(offs[0]), int(offs[-1])
    if hi_b == lo_b:
        e = np.empty(0, np.int32)
        return (e, pa.array([], type=pa.string()), e.copy(), e.copy(),
                e.copy())
    if lo_b or hi_b != data.size:  # sliced array: restrict to its bytes
        data = data[lo_b:hi_b]
        offs = offs - lo_b
    m = _ascii_token_mask(data, word_break, nonascii_tokens)
    mm = np.zeros(data.size + 2, dtype=np.int8)
    mm[1:-1] = m
    edges = np.flatnonzero(mm[1:] != mm[:-1])  # +1/-1 alternating
    # doc boundaries inside a token run -> force an end+start pair
    # (edge-of-buffer offsets come from empty leading/trailing docs and
    # cannot split a run)
    inner = offs[1:-1]
    inner = inner[(inner > 0) & (inner < data.size)]
    span = inner[m[inner - 1] & m[inner]] if inner.size else inner
    if span.size > 1:  # empty docs duplicate a boundary: splice once
        span = np.unique(span)
    if span.size:
        ins = np.repeat(span, 2)
        edges = np.insert(edges, np.searchsorted(edges, ins), ins)
    tok_start, tok_end = edges[0::2], edges[1::2]
    lens = tok_end - tok_start
    total = int(lens.sum())
    tok_bytes = data[m]
    if span.size and tok_bytes.size != total:  # pragma: no cover
        raise AssertionError("token byte extraction out of sync")
    if case == "lower":
        fold = ((tok_bytes >= 0x41) & (tok_bytes <= 0x5A))
        tok_bytes = tok_bytes + (fold.view(np.uint8) << 5)
    elif case == "upper":
        fold = ((tok_bytes >= 0x61) & (tok_bytes <= 0x7A))
        tok_bytes = tok_bytes - (fold.view(np.uint8) << 5)
    offs32 = np.concatenate(([0], np.cumsum(lens))).astype(np.int32)
    tokens = pa.Array.from_buffers(
        pa.string(), lens.size,
        [None, pa.py_buffer(offs32), pa.py_buffer(tok_bytes)])
    # tokens per doc -> doc_idx + per-doc positions (int32 token-table
    # dtype: string-array byte offsets are int32 by construction)
    cum = np.searchsorted(tok_start, offs[1:])
    counts = np.diff(np.concatenate(([0], cum)))
    doc_idx = np.repeat(np.arange(n, dtype=np.int32), counts)
    d_starts = np.concatenate(([0], cum[:-1]))
    pos = np.arange(tok_start.size, dtype=np.int32) \
        - np.repeat(d_starts.astype(np.int32), counts)
    start_rel = (tok_start - offs[:-1][doc_idx]).astype(np.int32,
                                                        copy=False)
    return doc_idx, tokens, pos, start_rel, lens.astype(np.int32,
                                                        copy=False)


@dataclass
class SegmentationAnalyzer(Analyzer):
    """UAX#29-ish word segmentation: the reference benchmark default.

    Reference: ``core/analysis/segmentation_token_stream.cpp`` with
    defaults ``{case: lower, break: alpha}``
    (``utils/index-put.cpp:86-87`` uses ``segmentation {}``).

    Pure-ASCII null-free batches take a byte-LUT fast path (boundary
    diffs over the raw value buffer — no RE2, no list arrays); anything
    else falls back to the vectorized regex split. Both produce
    identical token tables.
    """

    case: str = "lower"  # lower | none | upper
    word_break: str = "alpha"  # alpha | graphic | all

    def _pattern(self) -> str:
        return _ALPHA_SPLIT if self.word_break == "alpha" else _GRAPHIC_SPLIT

    def _case(self, arr: pa.Array) -> pa.Array:
        if self.case == "lower":
            return pc.utf8_lower(arr)
        if self.case == "upper":
            return pc.utf8_upper(arr)
        return arr

    def _ascii_ok(self, texts: pa.Array) -> bool:
        """True when the byte-LUT fast path applies to this batch."""
        return (self.word_break in ("alpha", "graphic")
                and self.case in ("lower", "upper", "none")
                and texts.null_count == 0
                and bool(pc.all(pc.string_is_ascii(texts)).as_py()))

    def _utf8_ok(self, texts: pa.Array) -> bool:
        """True when the byte path may treat every byte >= 0x80 as a
        token byte: for ``graphic`` always (RE2 ``\\s`` is ASCII-only);
        for ``alpha`` iff no doc contains a non-ASCII codepoint outside
        ``\\pL\\pN`` (one RE2 match pass — ~10x cheaper than the split,
        no list-array materialization)."""
        if self.word_break == "graphic":
            return True
        hit = pc.any(pc.match_substring_regex(
            texts, r"[^\pL\pN\x00-\x7F]")).as_py()
        return not bool(hit)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        if self._ascii_ok(texts):
            d, t, p, _s, _l = _ascii_tokenize(texts, self.word_break,
                                              self.case)
            return d, t, p
        if (self.word_break in ("alpha", "graphic")
                and self.case in ("lower", "upper", "none")
                and texts.null_count == 0 and self._utf8_ok(texts)):
            # byte path over pre-folded UTF-8 (same fold the regex path
            # applies before splitting, so token bytes are identical)
            cased = self._case(texts)
            if isinstance(cased, pa.ChunkedArray):
                cased = cased.combine_chunks()
            d, t, p, _s, _l = _ascii_tokenize(
                cased, self.word_break, "none", nonascii_tokens=True)
            return d, t, p
        cased = self._case(texts)
        lists = pc.split_pattern_regex(cased, self._pattern())
        return _flatten_tokens(lists, n)

    def tokenize_offsets(self, texts: pa.Array):
        """(doc_idx, terms, pos, start, end) with char offsets into the
        ORIGINAL text. The split pattern is a character-class complement,
        so splitting before vs after case folding yields identical
        boundaries; tokens are case-folded after the split (code-point
        case mapping commutes with slicing)."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if self._ascii_ok(texts):
            d, t, p, s, lens = _ascii_tokenize(texts, self.word_break,
                                               self.case)
            return d, t, p, s, s + lens
        if self.word_break == "alpha":
            sep, tok, pad = _ALPHA_SPLIT, r"[\pL\pN]+", "\x01"
        else:
            sep, tok, pad = _GRAPHIC_SPLIT, r"\S+", " "
        d, t, p, s, e = _split_with_offsets(texts, sep, tok, pad)
        return d, self._case(t), p, s, e


@dataclass
class TextAnalyzer(SegmentationAnalyzer):
    """`text` analyzer: segmentation + accent folding + stopword filter
    + Porter2 stemming (+ edge n-grams).

    Reference: ``core/analysis/text_token_stream.cpp:356-414`` (ICU
    break -> case -> accent removal -> stopwords -> snowball stem ->
    edge n-grams). Stemming is per-locale pure-Python Snowball
    (``language`` / JSON ``locale`` option): Porter2 English
    (``analysis/porter2.py``) plus de/fr/es/da/no/sv
    (``analysis/snowball.py``); unsupported locales fall back to no
    stemming (documented divergence). Accent folding is NFKD +
    combining-mark strip (the ICU ``accent: false`` path) and runs
    BEFORE stemming, matching the reference's stream order.
    """

    stopwords: frozenset = field(default_factory=lambda: DEFAULT_STOPWORDS)
    stemming: bool = False
    language: str = "en"  # locale for the snowball stemmer
    accent_folding: bool = True
    min_gram: int = 0  # edge n-grams disabled when 0
    max_gram: int = 0
    preserve_original: bool = True

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        doc_idx, terms, pos = super().tokenize(texts)
        doc_idx, terms, pos, _ = self._transform(doc_idx, terms, pos, ())
        return doc_idx, terms, pos

    def tokenize_offsets(self, texts: pa.Array):
        """Offsets variant: every filter stage carries each token's
        source span through; derived terms (stems, folded forms, edge
        n-grams) keep the ORIGINAL token's (start, end) — the span a
        highlighter should mark."""
        d, t, p, s, e = SegmentationAnalyzer.tokenize_offsets(self, texts)
        d, t, p, extras = self._transform(d, t, p, (s, e))
        return d, t, p, extras[0], extras[1]

    def _stemmer(self):
        """Snowball stemmer for ``language``; None for unsupported
        locales (falls back to no stemming, documented divergence)."""
        from iresearch_ray.analysis.snowball import get_stemmer

        try:
            return get_stemmer(self.language)
        except KeyError:
            return None

    def _transform(self, doc_idx, terms, pos, extras: tuple):
        if self.accent_folding and len(terms):
            # fast path: pure-ASCII batches skip the NFKD pass entirely
            is_ascii = pc.string_is_ascii(terms)
            if not pc.all(is_ascii).as_py():
                import unicodedata

                py = terms.to_pylist()
                mask = is_ascii.to_numpy(zero_copy_only=False)
                folded = [
                    t if ok else "".join(
                        c for c in unicodedata.normalize("NFKD", t)
                        if not unicodedata.combining(c))
                    for t, ok in zip(py, mask)
                ]
                terms = pa.array(folded, type=pa.string())
        if self.stopwords:
            keep = ~np.isin(
                terms.to_numpy(zero_copy_only=False), list(self.stopwords)
            )
            # positions are NOT re-counted after stopword removal: the
            # reference emits increment>1 over removed tokens, i.e. the
            # surviving tokens keep their original positions.
            idx = np.flatnonzero(keep)
            doc_idx, terms, pos = doc_idx[idx], terms.take(pa.array(idx)), pos[idx]
            extras = tuple(x[idx] for x in extras)
        if self.stemming:
            stem = self._stemmer()
            if stem is not None:
                # dictionary-encode first: stem each DISTINCT token once
                # per batch instead of once per occurrence
                dict_arr = pc.dictionary_encode(terms)
                if isinstance(dict_arr, pa.ChunkedArray):
                    dict_arr = dict_arr.combine_chunks()
                stemmed_vocab = pa.array(
                    [stem(t) for t in dict_arr.dictionary.to_pylist()],
                    type=pa.string())
                terms = stemmed_vocab.take(dict_arr.indices)
        if self.min_gram > 0:
            doc_idx, terms, pos, extras = self._edge_ngrams(
                doc_idx, terms, pos, extras)
        return doc_idx, terms, pos, extras

    def _edge_ngrams(self, doc_idx, terms, pos, extras: tuple = ()):
        """Vectorized edge n-grams: one prefix slice per gram size over
        the whole token column (VERDICT r1 #9)."""
        if isinstance(terms, pa.ChunkedArray):
            terms = terms.combine_chunks()
        lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        lo = self.min_gram
        hi = self.max_gram or (int(lens.max()) if lens.size else 0)
        idx_parts, term_parts = [], []
        for g in range(lo, hi + 1):
            idx = np.flatnonzero(lens >= g)
            if idx.size == 0:
                break
            idx_parts.append(idx)
            term_parts.append(
                pc.utf8_slice_codeunits(terms, start=0, stop=g)
                .take(pa.array(idx)))
        if self.preserve_original:
            # tokens that never emitted themselves (len < lo or > hi)
            po = np.flatnonzero((lens > 0) & ((lens < lo) | (lens > hi)))
            if po.size:
                idx_parts.append(po)
                term_parts.append(terms.take(pa.array(po)))
        if not idx_parts:
            return (np.empty(0, np.int32), pa.array([], type=pa.string()),
                    np.empty(0, np.int32), tuple(x[:0] for x in extras))
        src = np.concatenate(idx_parts)  # source-token index per gram
        t = pa.concat_arrays([x.combine_chunks() if
                              isinstance(x, pa.ChunkedArray) else x
                              for x in term_parts])
        d, p = doc_idx[src], pos[src]
        order = np.lexsort((p, d))
        src_o = src[order]
        # each gram inherits its source token's span (highlight marks
        # the whole surface token)
        return (d[order], t.take(pa.array(order)), p[order],
                tuple(x[src_o] for x in extras))


def _csv_eval_term(tok: str) -> str:
    """Reference ``eval_term`` (``delimited_token_stream.cpp:37-67``):
    strip surrounding double quotes, un-escape ``""``; mismatched
    quotes return the token unchanged."""
    if not tok or tok[0] != '"':
        return tok
    buf: list[str] = []
    escaped = False
    start = 1
    n = len(tok)
    for i in range(1, n):
        if tok[i] == '"':
            if escaped and start == i:  # an escaped quote
                escaped = False
                continue
            if escaped:
                break  # mismatched quote
            buf.append(tok[start:i])
            escaped = True
            start = i + 1
    return "".join(buf) if (start != 1 and start == n) else tok


def _csv_split(s: str, delim: str) -> list[str]:
    """Reference ``find_delimiter`` (``delimited_token_stream.cpp:69-99``):
    split at delimiter occurrences outside double-quoted regions."""
    out = []
    quoted = False
    start = 0
    i = 0
    dn = len(delim)
    n = len(s)
    while i < n:
        c = s[i]
        if quoted:
            if c == '"':
                quoted = False
            i += 1
            continue
        if s.startswith(delim, i) and dn:
            out.append(s[start:i])
            i += dn
            start = i
            continue
        if c == '"':
            quoted = True
        i += 1
    out.append(s[start:])
    return out


@dataclass
class DelimiterAnalyzer(Analyzer):
    """Single delimiter with CSV double-quote handling (reference
    ``delimited_token_stream.cpp``): the delimiter does not split inside
    double-quoted regions, and quoted fields are unquoted with ``""``
    escapes. Rows without a quote char take the vectorized regex-split
    fast path; only quoted rows fall back to the faithful scanner."""

    delimiters: tuple = (",",)
    quoted: bool = True

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        pat = "|".join(re.escape(d) for d in
                       sorted(self.delimiters, key=len)) or "(?!)"
        if not self.quoted:
            lists = pc.split_pattern_regex(texts, pat)
            return _flatten_tokens(lists, n)
        has_quote = pc.match_substring(texts, '"')
        if not pc.any(has_quote).as_py():
            lists = pc.split_pattern_regex(texts, pat)
            return _flatten_tokens(lists, n)
        # mixed batch: regex path for unquoted rows, scanner for quoted
        qmask = has_quote.to_numpy(zero_copy_only=False)
        delim = self.delimiters[0] if self.delimiters else ""
        py = texts.to_pylist()
        out_doc, out_term, out_pos = [], [], []
        for d, t in enumerate(py):
            if t is None:
                continue
            toks = _csv_split(t, delim) if qmask[d] else (
                re.split(pat, t) if self.delimiters else [t])
            p = 0
            for tok in toks:
                tok = _csv_eval_term(tok) if qmask[d] else tok
                if tok:
                    out_doc.append(d)
                    out_term.append(tok)
                    out_pos.append(p)
                    p += 1
        return (np.asarray(out_doc, dtype=np.int64),
                pa.array(out_term, type=pa.string()),
                np.asarray(out_pos, dtype=np.int64))


@dataclass
class MultiDelimiterAnalyzer(Analyzer):
    """N delimiters, each possibly MULTI-character (reference
    ``multi_delimited_token_stream.cpp``: a byte-trie automaton with
    shortest-match-at-position semantics, no quote handling). Emulated
    with one RE2 alternation ordered shortest-first, fully vectorized."""

    delimiters: tuple = (",",)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        if not self.delimiters:
            # no delimiters: whole input is one token (reference
            # MultiDelimitedTokenStreamSingleChars<0>)
            from_ = KeywordAnalyzer()
            return from_.tokenize(texts)
        pat = "|".join(re.escape(d) for d in sorted(self.delimiters, key=len))
        lists = pc.split_pattern_regex(texts, pat)
        return _flatten_tokens(lists, len(texts))


@dataclass
class KeywordAnalyzer(Analyzer):
    """Whole input as a single exact term (reference ``string_token_stream``,
    ``core/analysis/token_streams.hpp:47``)."""

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        valid = pc.is_valid(texts).to_numpy(zero_copy_only=False)
        idx = np.flatnonzero(valid)
        return (
            idx.astype(np.int64),
            texts.take(pa.array(idx)),
            np.zeros(idx.size, dtype=np.int64),
        )

    def tokenize_offsets(self, texts: pa.Array):
        d, t, p = self.tokenize(texts)
        lens = pc.utf8_length(t).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        return d, t, p, np.zeros(d.size, dtype=np.int64), lens


@dataclass
class DelimitedPayloadAnalyzer(Analyzer):
    """Per-token numeric payloads from a ``term<delim>payload`` suffix
    (the public DelimitedPayloadTokenFilter pattern; the reference's
    ``payload`` attribute, ``core/analysis/token_attributes.hpp:67``, is
    analyzer-supplied bytes stored in the ``.pay`` file — here payloads
    are unsigned ints, the form payload SCORING consumes).

    ``tokenize`` drops the suffix (so query-side analysis matches the
    indexed terms); ``tokenize_payloads`` also returns the uint64
    payload per token (0 where no suffix). The inner tokenizer defaults
    to whitespace segmentation so the delimiter survives tokenization.
    """

    inner: Analyzer = field(
        default_factory=lambda: SegmentationAnalyzer(word_break="graphic"))
    delimiter: str = "|"

    def _split_pay(self, terms: pa.Array) -> tuple[pa.Array, np.ndarray]:
        pat = f"^(?P<term>.*){re.escape(self.delimiter)}(?P<pay>[0-9]+)$"
        ex = pc.extract_regex(terms, pat)
        hit = pc.is_valid(ex)
        t2 = pc.if_else(hit, pc.struct_field(ex, "term"), terms)
        pay_str = pc.if_else(hit, pc.struct_field(ex, "pay"), "0")
        pays = pc.cast(pay_str, pa.uint64()).to_numpy(zero_copy_only=False)
        return t2, pays.astype(np.uint64)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        d, t, p = self.inner.tokenize(texts)
        t2, _ = self._split_pay(t)
        return d, t2, p

    def tokenize_payloads(self, texts: pa.Array):
        """(doc_idx, terms, pos, payloads) exploded token table."""
        d, t, p = self.inner.tokenize(texts)
        t2, pays = self._split_pay(t)
        return d, t2, p, pays

    def tokenize_offsets_payloads(self, texts: pa.Array):
        """OFFS+PAY together: token char spans from the inner tokenizer,
        shrunk to the TERM (the stripped ``|payload`` suffix is not part
        of the indexed token's span), plus the numeric payloads."""
        d, t, p, s, _e = self.inner.tokenize_offsets(texts)
        t2, pays = self._split_pay(t)
        lens = pc.utf8_length(t2).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        return d, t2, p, s, s + lens, pays


@dataclass
class NgramAnalyzer(Analyzer):
    """Character n-grams [min_gram, max_gram]; reference
    ``ngram_token_stream`` (``core/analysis/ngram_token_stream.hpp:40-64``).

    Vectorized per gram-size via ``pc.utf8_slice_codeunits`` shifted by
    start offset — loop runs over (max doc length x gram sizes), fine
    for short fields; long-text n-gramming should go through the
    tokenizing analyzers first.
    """

    min_gram: int = 2
    max_gram: int = 3
    preserve_original: bool = False
    lowercase: bool = True

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        """Vectorized: one ``utf8_slice_codeunits`` per (start offset,
        gram size) over the WHOLE column — the loop runs max_len x
        gram_sizes times, never per row (VERDICT r1 #9)."""
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        n = len(texts)
        src = pc.utf8_lower(texts) if self.lowercase else texts
        lens = pc.utf8_length(src).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens, nan=0).astype(np.int64)
        max_len = int(lens.max()) if n else 0
        doc_parts, term_parts, pos_parts = [], [], []
        for g in range(self.min_gram, self.max_gram + 1):
            for i in range(0, max(0, max_len - g + 1)):
                mask = lens >= i + g
                if not mask.any():
                    break
                idx = np.flatnonzero(mask)
                sl = pc.utf8_slice_codeunits(src, start=i, stop=i + g)
                term_parts.append(sl.take(pa.array(idx)))
                doc_parts.append(idx.astype(np.int64))
                pos_parts.append(np.full(idx.size, i, dtype=np.int64))
        if self.preserve_original:
            po = np.flatnonzero((lens > 0) &
                                ((lens < self.min_gram) | (lens > self.max_gram)))
            if po.size:
                term_parts.append(src.take(pa.array(po)))
                doc_parts.append(po.astype(np.int64))
                pos_parts.append(np.zeros(po.size, dtype=np.int64))
        if not doc_parts:
            return (np.empty(0, np.int32), pa.array([], type=pa.string()),
                    np.empty(0, np.int32))
        doc_idx = np.concatenate(doc_parts)
        pos = np.concatenate(pos_parts)
        terms = pa.concat_arrays([p.combine_chunks() if
                                  isinstance(p, pa.ChunkedArray) else p
                                  for p in term_parts])
        # inversion requires doc-major ascending positions
        order = np.lexsort((pos, doc_idx))
        return (doc_idx[order], terms.take(pa.array(order)), pos[order])


@dataclass
class PipelineAnalyzer(Analyzer):
    """Chain analyzers: the first stage tokenizes the text, every later
    stage transforms/expands the token stream (reference
    ``pipeline_token_stream``, ``core/analysis/pipeline_token_stream.hpp:36-42``).
    Expansions produced by later stages inherit the source token's
    position (offset/increment composition)."""

    stages: list = field(default_factory=list)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if not self.stages:
            raise ValueError("pipeline needs at least one stage")
        d, t, p = self.stages[0].tokenize(texts)
        for st in self.stages[1:]:
            # each current token is treated as one input of the next stage
            d2, t2, _ = st.tokenize(t)
            d, t, p = d[d2], t2, p[d2]
        return d, t, p


@dataclass
class NormalizingAnalyzer(Analyzer):
    """Whole-input case/accent normalization, single output term
    (reference `norm` analyzer, ``text_token_normalizing_stream``)."""

    case: str = "lower"
    accent: bool = False  # False = strip accents (reference default keeps)

    def _norm(self, s: str) -> str:
        import unicodedata

        if self.case == "lower":
            s = s.lower()
        elif self.case == "upper":
            s = s.upper()
        if not self.accent:
            s = "".join(
                ch for ch in unicodedata.normalize("NFKD", s)
                if not unicodedata.combining(ch)
            )
        return unicodedata.normalize("NFC", s)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        py = texts.to_pylist()
        out_d, out_t = [], []
        for i, s in enumerate(py):
            if s is None:
                continue
            out_d.append(i)
            out_t.append(self._norm(s))
        return (
            np.asarray(out_d, dtype=np.int64),
            pa.array(out_t, type=pa.string()),
            np.zeros(len(out_d), dtype=np.int64),
        )


# Per-locale primary tailoring (simplified DUCET tailoring; the
# reference delegates to ICU, core/analysis/collation_token_stream.cpp).
# Tailored letters map to key substrings whose code-point order realizes
# the locale's alphabet order: U+E0xx slots sort after every Latin
# letter (å/ä/ö/æ/ø are independent letters AFTER z in the Nordic
# locales); German phonebook (DIN 5007-2) expands umlauts; Spanish ñ is
# an independent letter between n and o.
_COLLATION_TAILORING: dict[str, dict[str, str]] = {
    "sv": {"å": "", "ä": "", "ö": ""},
    "fi": {"å": "", "ä": "", "ö": ""},
    "da": {"æ": "", "ø": "", "å": "",
           "aa": ""},
    "no": {"æ": "", "ø": "", "å": ""},
    "nb": {"æ": "", "ø": "", "å": ""},
    "de": {"ä": "ae", "ö": "oe", "ü": "ue", "ß": "ss"},
    "es": {"ñ": "n"},
    # between-letter independent letters map to base + U+E000 (sorts
    # after every ASCII continuation of the base, before the next
    # letter); digraph contractions ride the same longest-first
    # substitution as danish "aa"
    "tr": {"ç": "c", "ğ": "g", "ı": "h",
           "ö": "o", "ş": "s", "ü": "u"},
    "cs": {"č": "c", "ch": "h", "ř": "r",
           "š": "s", "ž": "z"},
    # Slovak shares the h < ch < i contraction; ä/ô are independent
    # letters after a/o
    "sk": {"č": "c", "ch": "h", "š": "s",
           "ž": "z", "ä": "a", "ô": "o"},
    # Croatian/Serbian-Latin digraph letters: č < ć after c, dž after
    # d/đ, lj after l, nj after n (each one letter in the alphabet)
    "hr": {"č": "c", "ć": "c", "đ": "d",
           "dž": "d", "lj": "l", "nj": "n",
           "š": "s", "ž": "z"},
    # Spanish TRADITIONAL collation (ICU es@collation=traditional,
    # pre-1994 RAE): ch and ll are independent letters after c and l
    "es_trad": {"ch": "c", "ll": "l", "ñ": "n"},
    "pl": {"ą": "a", "ć": "c", "ę": "e",
           "ł": "l", "ń": "n", "ó": "o",
           "ś": "s", "ź": "z", "ż": "z"},
    "hu": {"ö": "o", "ő": "o", "ü": "u",
           "ű": "u", "cs": "c", "dzs": "d",
           "dz": "d", "gy": "g", "ly": "l",
           "ny": "n", "sz": "s", "ty": "t",
           "zs": "z"},
}


@dataclass
class CollationAnalyzer(NormalizingAnalyzer):
    """Locale collation key as a single term (reference
    ``collation_token_stream``). ICU is replaced by a UCA-style
    multi-level key (public Unicode Collation Algorithm structure,
    UTS #10): per-locale primary tailoring (``_COLLATION_TAILORING``)
    over casefolded base letters, then optional secondary (one weight
    slot PER base character — the common weight \x02 for unaccented
    characters, the combining marks by codepoint otherwise, so mark
    POSITION orders like UCA: resume < resumé < résume) and tertiary
    (case) levels appended after low separators, so plain byte order
    of the key realizes level-by-level comparison:

      strength="primary"    cote = coté = côte ; v = V
      strength="secondary"  cote < coté < côte < côté ; v = V
      strength="tertiary"   ... and cote < Cote (lowercase first)

    French backwards-secondary (CLDR: fr_CA, historical fr) reverses
    the secondary slot sequence, giving cote < côte < coté < côté —
    auto-enabled for fr_CA, or force with ``backwards=True``.

    Untailored locales use the root (DUCET-order) base letters. The
    full ICU rule set (contractions beyond the tailoring table) stays
    out of scope and is documented here."""

    locale: str = ""
    strength: str = "primary"
    backwards: bool | None = None  # None = auto by locale (fr_CA)

    def _norm(self, s: str) -> str:
        import unicodedata

        orig = unicodedata.normalize("NFC", s)
        # NFC first so canonically-equivalent decomposed input (NFD
        # 'a'+U+030A for å) hits the tailoring patterns below identically
        # to the precomposed form
        loc_l = self.locale.lower()
        key = loc_l.replace("-", "_").split("_")[0].split("@")[0] \
            .split(".")[0]
        # ICU variant syntax: es@collation=traditional selects the
        # pre-1994 RAE alphabet (ch/ll as independent letters)
        if key == "es" and "traditional" in loc_l:
            key = "es_trad"
        if key == "tr":
            # Turkish case pairs: I/ı and İ/i (ICU tr tailoring); the
            # generic casefold would send uppercase I to dotted i.
            # ``orig`` stays untouched for the tertiary case bits.
            s = orig.replace("I", "ı").replace("İ", "i").casefold()
        else:
            s = orig.casefold()
        tail = _COLLATION_TAILORING.get(key)
        if tail:
            # protect tailored letters from NFKD accent stripping by
            # substituting their key slots FIRST (longest pattern first
            # for digraph rules like danish "aa")
            for pat in sorted(tail, key=len, reverse=True):
                if pat in s:
                    s = s.replace(pat, tail[pat])
        decomp = unicodedata.normalize("NFKD", s)
        primary = unicodedata.normalize(
            "NFC", "".join(ch for ch in decomp
                           if not unicodedata.combining(ch)))
        if self.strength == "primary":
            return primary
        # secondary: one weight slot per base character — common
        # weight \x02 when unaccented, else that character's combining
        # marks by codepoint (tailored letters already consumed their
        # marks in the primary, so only residual accents weigh in);
        # UTF-8 byte order preserves codepoint order, and \x02 < any
        # mark, so byte compare realizes the UCA secondary level
        slots: list[str] = []
        for ch in decomp:
            if unicodedata.combining(ch):
                if slots:
                    slots[-1] += ch
                else:
                    slots.append(ch)
            else:
                slots.append("")
        sec = [m or "\x02" for m in slots]
        loc = self.locale.split(".")[0].lower().replace("-", "_")
        bw = self.backwards
        if bw is None:
            bw = loc in ("fr_ca",)  # CLDR backwards-secondary locale
        if bw:
            sec = sec[::-1]
        marks = "".join(sec)
        out = primary + "\x01" + marks
        if self.strength == "secondary":
            return out
        if self.strength != "tertiary":
            raise ValueError(f"unknown collation strength {self.strength!r}")
        # tertiary: case bits of the cased characters, lowercase (0)
        # before uppercase (1) like the UCA default
        case_bits = "".join(
            "\x03" if ch.isupper() else "\x02"
            for ch in orig if ch.isupper() or ch.islower())
        return out + "\x01" + case_bits


class ShingleAnalyzer(Analyzer):
    """Word-shingle analyzer (the Lucene/ES ``shingle`` token filter,
    beyond-reference — the reference's ``ngram`` is char-level,
    ``core/analysis/ngram_token_stream.cpp``): emits the inner
    analyzer's unigrams plus every run of ``n`` adjacent words joined
    with ``sep``, each shingle carried at the position of its FIRST
    word (the Lucene convention — a shingle and its head unigram share
    a position, which ``same_position`` queries can exploit).

    Index-time shingles turn hot phrase queries into single-term
    lookups (one posting read instead of a positional join) at the
    cost of a larger dictionary — the classic speed/space trade.

    Vectorized: one shifted same-doc/consecutive-position mask over the
    inner token stream and one ``binary_join_element_wise`` build all
    shingles; no per-token Python."""

    def __init__(self, inner: Analyzer | None = None, n: int = 2,
                 sep: str = "_", unigrams: bool = True):
        if n < 2:
            raise ValueError("shingle n must be >= 2")
        self.inner = inner or SegmentationAnalyzer()
        self.n = int(n)
        self.sep = sep
        self.unigrams = bool(unigrams)

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        d, t, p = self.inner.tokenize(texts)
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        L, n = len(d), self.n
        if L >= n:
            base = L - (n - 1)
            ok = np.ones(base, dtype=bool)
            for j in range(1, n):
                ok &= (d[j:base + j] == d[:base]) \
                    & (p[j:base + j] == p[:base] + j)
            idx = np.flatnonzero(ok)
        else:
            idx = np.empty(0, dtype=np.int64)
        parts = [t.take(pa.array(idx + j)) for j in range(n)]
        sh = pc.binary_join_element_wise(*parts, self.sep) if idx.size \
            else pa.array([], type=pa.string())
        if not self.unigrams:
            return d[idx], sh, p[idx]
        d_all = np.concatenate([d, d[idx]])
        p_all = np.concatenate([p, p[idx]])
        t_all = pa.concat_arrays([t.cast(pa.string()), sh.cast(pa.string())])
        # stable doc-major, position-minor order (unigram before its
        # co-positioned shingle)
        order = np.lexsort((np.concatenate(
            [np.zeros(L, np.int8), np.ones(idx.size, np.int8)]),
            p_all, d_all))
        return d_all[order], t_all.take(pa.array(order)), p_all[order]


class SynonymAnalyzer(Analyzer):
    """Synonym token filter (the Lucene/ES ``synonym`` /
    ``synonym_graph`` filter restricted to single-token rules —
    beyond-reference; the reference has no synonym stream). Three rule
    shapes, all reduced to one uniform "token -> output list at the
    same position" table:

      * equivalence class, ``expand=True`` (ES ``a, b, c``): every
        member emits ALL members co-positioned — any member's term
        query then matches any other member, and tf merges the class.
      * equivalence class, ``expand=False``: every member is REPLACED
        by the first member (the contraction form — one dictionary
        term for the whole class).
      * explicit mapping ``{"lhs": [rhs...]}`` (ES ``lhs => rhs``):
        lhs is replaced by the rhs tokens.

    Multi-word rules (which need the full Lucene synonym *graph* with
    position lengths) are out of scope and rejected at construction.

    Vectorized: one ``pc.index_in`` against the rule keys classifies
    every token; matched tokens gather their output lists with a
    repeat/offset index — no per-token Python. Co-positioned outputs
    carry a stable sub-rank so the emitted stream is deterministic."""

    def __init__(self, inner: Analyzer | None = None, synonyms=None,
                 expand: bool = True):
        self.inner = inner or SegmentationAnalyzer()
        table: dict[str, tuple] = {}
        if isinstance(synonyms, dict):
            for k, outs in synonyms.items():
                table[str(k)] = tuple(str(o) for o in outs)
        else:
            for cls in (synonyms or []):
                cls = [str(m) for m in cls]
                for m in cls:
                    table[m] = tuple(cls) if expand else (cls[0],)
        if not table:
            raise ValueError("synonyms must be a non-empty dict or "
                             "list of equivalence classes")
        for k, outs in table.items():
            for w in (k, *outs):
                if not w or any(ch.isspace() for ch in w):
                    raise ValueError(
                        f"multi-word synonym rule not supported: {w!r}")
        keys = list(table)
        self.table = table
        self._keys = pa.array(keys, type=pa.string())
        counts = np.array([len(table[k]) for k in keys], dtype=np.int64)
        self._counts = counts
        self._offsets = np.concatenate(
            ([0], np.cumsum(counts)[:-1])).astype(np.int64)
        self._flat = pa.array([o for k in keys for o in table[k]],
                              type=pa.string())

    def tokenize(self, texts: pa.Array) -> tuple[np.ndarray, pa.Array, np.ndarray]:
        d, t, p = self.inner.tokenize(texts)
        t = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
        codes = pc.index_in(t, value_set=self._keys)
        c = codes.fill_null(-1).to_numpy(zero_copy_only=False) \
            .astype(np.int64)
        rep = np.flatnonzero(c >= 0)
        if rep.size == 0:
            return d, t, p
        keep = np.flatnonzero(c < 0)
        cnt = self._counts[c[rep]]
        tot = int(cnt.sum())
        row0 = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        j = np.arange(tot, dtype=np.int64) - np.repeat(row0, cnt)
        t_idx = np.repeat(self._offsets[c[rep]], cnt) + j
        d_all = np.concatenate([d[keep], np.repeat(d[rep], cnt)])
        p_all = np.concatenate([p[keep], np.repeat(p[rep], cnt)])
        t_all = pa.concat_arrays([
            t.take(pa.array(keep)).cast(pa.string()),
            self._flat.take(pa.array(t_idx)),
        ])
        rank = np.concatenate([np.zeros(keep.size, np.int64), j + 1])
        order = np.lexsort((rank, p_all, d_all))
        return d_all[order], t_all.take(pa.array(order)), p_all[order]


_REGISTRY: dict[str, type] = {}


def register_analyzer(name: str, cls: type) -> None:
    """Python analogue of ``REGISTER_ANALYZER_JSON``."""
    _REGISTRY[name] = cls


def get_analyzer(name: str, options: dict | None = None) -> Analyzer:
    opts = dict(options or {})
    if name == "delimiter" and "delimiter" in opts:
        # reference JSON option name is the singular "delimiter"
        opts["delimiters"] = (opts.pop("delimiter"),)
    if name in ("delimiter", "multi_delimiter") and "delimiters" in opts:
        opts["delimiters"] = tuple(opts["delimiters"])
    if name == "text" and "stopwords" in opts:
        opts["stopwords"] = frozenset(opts["stopwords"])
    if name == "text" and "locale" in opts:
        # reference JSON uses "locale" ("de_DE.UTF-8", "en", ...)
        opts["language"] = opts.pop("locale")
    if name in ("delimited_payload", "shingle", "synonym") and "inner" in opts:
        spec = opts["inner"]
        opts["inner"] = get_analyzer(spec["name"], spec.get("options"))
    if name in ("segmentation", "text"):
        # JSON option names follow the reference ("case", "break")
        if "case" in opts:
            opts["case"] = opts.pop("case")
        if "break" in opts:
            opts["word_break"] = opts.pop("break")
    if name == "pipeline":
        # reference JSON: {"pipeline": [{"type": ..., "properties": ...}]}
        # (irs::analysis::pipeline_token_stream); we accept "name"/"options"
        specs = opts.get("pipeline", [])
        return PipelineAnalyzer([
            get_analyzer(s.get("name", s.get("type")),
                         s.get("options", s.get("properties")))
            for s in specs
        ])
    if name in ("classification", "nearest_neighbors"):
        # registered lazily (numpy model module import on first use)
        from iresearch_ray.analysis.embeddings import (
            ClassificationAnalyzer,
            NearestNeighborsAnalyzer,
        )

        cls = (ClassificationAnalyzer if name == "classification"
               else NearestNeighborsAnalyzer)
        return cls(**opts)
    cls = _REGISTRY[name]
    return cls(**opts)


register_analyzer("segmentation", SegmentationAnalyzer)
register_analyzer("text", TextAnalyzer)
register_analyzer("delimiter", DelimiterAnalyzer)
register_analyzer("multi_delimiter", MultiDelimiterAnalyzer)
register_analyzer("keyword", KeywordAnalyzer)
register_analyzer("ngram", NgramAnalyzer)
register_analyzer("norm", NormalizingAnalyzer)
register_analyzer("delimited_payload", DelimitedPayloadAnalyzer)
register_analyzer("collation", CollationAnalyzer)
register_analyzer("shingle", ShingleAnalyzer)
register_analyzer("synonym", SynonymAnalyzer)


def make_pipeline(stage_specs: list) -> PipelineAnalyzer:
    """Build a pipeline from [{"name": ..., "options": {...}}, ...]
    (JSON shape of the reference pipeline analyzer options)."""
    return PipelineAnalyzer(
        [get_analyzer(s["name"], s.get("options")) for s in stage_specs]
    )
