"""v3 blocked position streams: 128-value bitpacked chunks + varint
tail (``pos_chunk_off`` / ``block_pos_val``), per-chunk restricted
decode, and v2 (flat varint ``block_pos_off``) back-compat.

Reference analogue: the .pos file's packed blocks + skip data,
``core/formats/formats_10.cpp`` (pos stream written like doc stream).
"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from iresearch_ray.analysis.analyzers import SegmentationAnalyzer
from iresearch_ray.index.codec import varint_encode
from iresearch_ray.index.segment import (
    BLOCK_SIZE,
    SegmentReader,
    write_segment,
)


def _corpus():
    """Crafted shapes: a high-tf low-df term ('pepper' ~200x in 3 docs:
    pos-large but doc-small), a high-df term crossing many doc blocks,
    and runs that straddle 128-value chunk boundaries."""
    texts = []
    for i in range(400):
        base = f"alpha beta gamma doc{i % 7}"
        if i % 3 == 0:
            base += " spice" * (1 + i % 5)
        texts.append(base)
    texts.append(" ".join(["pepper"] * 200) + " alpha")
    texts.append("pepper " + " ".join(f"w{j} pepper" for j in range(90)))
    texts.append("pepper alpha pepper beta pepper")
    return texts


def _write(tmp_path):
    texts = _corpus()
    b = pa.table({
        "conv_id": ["c"] * len(texts),
        "turn_idx": list(range(len(texts))),
        "text": texts,
    })
    meta = write_segment(str(tmp_path), b, SegmentationAnalyzer())
    return texts, meta


def _expected_keys(texts, reader, term):
    an = SegmentationAnalyzer()
    d, t, p = an.tokenize(pa.array(texts, type=pa.string()))
    toks = t.to_pylist()
    keys = [((di + 1) << 32) + pi
            for di, tok, pi in zip(d, toks, p) if tok == term]
    return np.array(sorted(keys), dtype=np.int64)


def test_v3_schema_and_full_decode(ray_session, tmp_path):
    texts, meta = _write(tmp_path)
    assert meta["format_version"] == 3
    r = SegmentReader(os.path.join(str(tmp_path), meta["name"]))
    names = set(pq.read_schema(
        os.path.join(r.dir, "terms.parquet")).names)
    assert "pos_chunk_off" in names and "block_pos_val" in names
    assert "block_pos_off" not in names
    for term in ("alpha", "spice", "pepper", "w5"):
        rows = r.term_range(term, term)
        assert rows.size == 1, term
        row = int(rows[0])
        pl = r.postings(row, positions=True)
        doc_rep = np.repeat(pl.docs, pl.tfs)
        got = (doc_rep << np.int64(32)) + pl.positions
        exp = _expected_keys(texts, r, term)
        assert got.size == exp.size, term
        assert (np.sort(got) == exp).all(), term


def test_v3_pos_large_doc_small(ray_session, tmp_path):
    """df < 128 but total_tf > 128: doc stream is a varint tail while
    the pos stream has real bitpacked chunks."""
    texts, meta = _write(tmp_path)
    r = SegmentReader(os.path.join(str(tmp_path), meta["name"]))
    row = int(r.term_range("pepper", "pepper")[0])
    assert int(r.doc_freq[row]) < BLOCK_SIZE
    assert int(r.total_tf[row]) > BLOCK_SIZE
    pl = r.postings(row, positions=True)
    assert pl.positions.size == int(r.total_tf[row])
    # chunk boundaries cross the 200-token run: spot-check the long doc
    long_doc = int(pl.docs[0])
    tfs0 = int(pl.tfs[0])
    assert tfs0 == 200
    assert (pl.positions[:tfs0] == np.arange(200)).all()


def test_v3_restricted_decode_matches_full(ray_session, tmp_path):
    texts, meta = _write(tmp_path)
    r = SegmentReader(os.path.join(str(tmp_path), meta["name"]))
    for term in ("alpha", "spice"):
        row = int(r.term_range(term, term)[0])
        pl = r.postings(row, positions=True)
        full_keys = (np.repeat(pl.docs, pl.tfs) << np.int64(32)) \
            + pl.positions
        rng = np.random.default_rng(1)
        docs = np.sort(rng.choice(pl.docs, size=min(9, pl.docs.size),
                                  replace=False))
        # bypass the cached-keys shortcut to exercise the chunk path
        r._pk_cache = {}
        got = r.keys_for_docs(row, docs.astype(np.int64))
        exp = full_keys[np.isin(np.repeat(pl.docs, pl.tfs), docs)]
        assert (np.sort(got) == np.sort(exp)).all(), term


def test_v2_flat_varint_back_compat(ray_session, tmp_path):
    """Rewrite a v3 segment's pos columns in the v2 layout (flat varint
    + per-doc-block byte offsets) and check the reader's v2 branches
    decode identically."""
    texts, meta = _write(tmp_path)
    seg_dir = os.path.join(str(tmp_path), meta["name"])
    r = SegmentReader(seg_dir)
    t = pq.read_table(os.path.join(seg_dir, "terms.parquet"))
    nt = t.num_rows
    pos_blobs, pos_off_lists = [], []
    for i in range(nt):
        pl = r.postings(i, positions=True)
        # per-run deltas (reset at each doc)
        run_starts = np.concatenate(
            ([0], np.cumsum(pl.tfs)[:-1])).astype(np.int64)
        deltas = np.diff(pl.positions, prepend=0)
        deltas[run_starts] = pl.positions[run_starts]
        blob = varint_encode(deltas.astype(np.uint64))
        # byte offset per DOC block (block = 128 docs + tail)
        nb = len(t.column("block_last_doc")[i].as_py())
        vstart = [int(np.sum(pl.tfs[:min(j * BLOCK_SIZE, pl.docs.size)]))
                  for j in range(nb)]
        # value idx -> byte offset via per-value varint lengths
        from iresearch_ray.index.codec import varint_byte_lengths
        vb = np.concatenate(
            ([0], np.cumsum(varint_byte_lengths(
                deltas.astype(np.uint64))))).astype(np.int64)
        pos_off_lists.append([int(vb[v]) for v in vstart])
        pos_blobs.append(blob)
    t2 = t.drop_columns(["pos_blob", "pos_chunk_off", "block_pos_val"])
    t2 = t2.append_column("pos_blob", pa.array(pos_blobs, type=pa.binary()))
    t2 = t2.append_column(
        "block_pos_off", pa.array(pos_off_lists, type=pa.list_(pa.int64())))
    pq.write_table(t2, os.path.join(seg_dir, "terms.parquet"),
                   row_group_size=1024)
    r2 = SegmentReader(seg_dir)
    for term in ("alpha", "spice", "pepper"):
        row = int(r2.term_range(term, term)[0])
        pl = r2.postings(row, positions=True)
        got = (np.repeat(pl.docs, pl.tfs) << np.int64(32)) + pl.positions
        exp = _expected_keys(texts, r2, term)
        assert (np.sort(got) == exp).all(), term
        # restricted v2 branch
        r2._pk_cache = {}
        docs = pl.docs[:5].astype(np.int64)
        got_r = r2.keys_for_docs(row, docs)
        exp_r = got[np.isin(np.repeat(pl.docs, pl.tfs), docs)]
        assert (np.sort(got_r) == np.sort(exp_r)).all(), term
