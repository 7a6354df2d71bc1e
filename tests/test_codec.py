import numpy as np
import pytest

from iresearch_ray.index.codec import (
    BLOCK_SIZE,
    bitpack_block,
    bitunpack_block,
    delta_encode_lists,
    encode_lists_varint,
    varint_byte_lengths,
    varint_decode,
    varint_encode,
)


def test_varint_roundtrip_small():
    v = np.array([0, 1, 127, 128, 255, 300, 2**14 - 1, 2**14, 2**21], dtype=np.uint64)
    assert (varint_decode(varint_encode(v), len(v)) == v).all()


def test_varint_roundtrip_random():
    rng = np.random.default_rng(7)
    for _ in range(10):
        v = rng.integers(0, 2**50, size=int(rng.integers(1, 5000))).astype(np.uint64)
        out = varint_decode(varint_encode(v), len(v))
        assert (out == v).all()


def test_varint_byte_lengths():
    v = np.array([0, 127, 128, 2**14 - 1, 2**14], dtype=np.uint64)
    assert varint_byte_lengths(v).tolist() == [1, 1, 2, 2, 3]


@pytest.mark.parametrize("hi", [1, 2, 7, 255, 2**16, 2**31 - 1])
def test_bitpack_roundtrip(hi):
    rng = np.random.default_rng(hi)
    v = rng.integers(0, hi + 1, size=BLOCK_SIZE).astype(np.uint32)
    buf = np.frombuffer(bitpack_block(v), dtype=np.uint8)
    assert (bitunpack_block(buf, 0) == v).all()


def test_bitpack_zeros():
    v = np.zeros(BLOCK_SIZE, dtype=np.uint32)
    buf = np.frombuffer(bitpack_block(v), dtype=np.uint8)
    assert (bitunpack_block(buf, 0) == v).all()


def test_delta_encode_lists_resets_per_list():
    vals = np.array([1, 5, 9, 2, 3, 7], dtype=np.int64)
    starts = np.array([0, 3, 5])
    assert delta_encode_lists(vals, starts).tolist() == [1, 4, 4, 2, 1, 7]


def test_encode_lists_varint_slicing():
    vals = np.array([1, 300, 2, 70000], dtype=np.uint64)
    starts = np.array([0, 2])
    blob, byte_starts = encode_lists_varint(vals, starts, np.array([2, 2]))
    # slice out list 1 and decode independently
    part = np.frombuffer(blob, dtype=np.uint8)[byte_starts[1] :]
    assert varint_decode(part, 2).tolist() == [2, 70000]


def test_postings_many_equals_per_term_random():
    """postings_many (one _bulk_decode_blocked pass) must reproduce
    per-term postings() exactly for arbitrary df mixes (tails only,
    full blocks only, both), including terms repeated in the request."""
    import numpy as np

    from iresearch_ray.index.segment import (
        SegmentReader,
        encode_postings_table,
    )

    rng = np.random.default_rng(1234)
    for trial in range(5):
        n_terms = int(rng.integers(2, 40))
        vocab, runs_doc, runs_tf, starts = [], [], [], [0]
        doc_count = 500
        for t in range(n_terms):
            df = int(rng.integers(1, 400))
            docs = np.sort(rng.choice(
                np.arange(1, doc_count + 1), size=min(df, doc_count),
                replace=False))
            tfs = rng.integers(1, 9, size=docs.size)
            vocab.append(f"t{t:04d}")
            runs_doc.append(docs)
            runs_tf.append(tfs)
            starts.append(starts[-1] + docs.size)
        import pyarrow as pa
        run_doc = np.concatenate(runs_doc).astype(np.int64)
        run_tf = np.concatenate(runs_tf).astype(np.int64)
        n_occ = int(run_tf.sum())
        # positions: ascending within each run
        pos = rng.integers(0, 50, size=n_occ).astype(np.int64)
        rs = np.concatenate(([0], np.cumsum(run_tf)))
        for i in range(run_tf.size):
            pos[rs[i]:rs[i + 1]] = np.sort(pos[rs[i]:rs[i + 1]])
        inv = {
            "vocab": pa.array(vocab, type=pa.string()),
            "term_starts": np.asarray(starts[:-1], dtype=np.int64),
            "run_doc": run_doc,
            "run_tf": run_tf,
            "doc_len": np.full(run_doc.size, 7, dtype=np.int64),
            "pos_sorted": pos,
            "run_starts": rs[:-1].astype(np.int64),
        }
        tbl = encode_postings_table(inv)

        class _FakeSeg(SegmentReader):
            def __init__(self, t):  # bypass file IO
                self._postings = t
                self.doc_freq = np.diff(
                    np.append(np.asarray(starts[:-1]), run_doc.size))
                self._pl_cache = {}
                self._pl_cache_max = 256

        seg = _FakeSeg(tbl)
        rows = list(rng.permutation(n_terms)) + [0, 0]
        many = seg.postings_many(rows)
        seg2 = _FakeSeg(tbl)
        for r, pl in zip(rows, many):
            ref = seg2._decode_postings(int(r))
            assert (pl.docs == ref.docs).all(), (trial, r)
            assert (pl.tfs == ref.tfs).all(), (trial, r)


def test_decode_stream_range_equals_full_slice():
    """_decode_stream_range must equal the full decode's slice for any
    [a, b): ranges inside the bitpacked full blocks, spanning the
    block/tail boundary, entirely inside the varint tail, empty, and
    the degenerate full-range fast path."""
    import numpy as np

    from iresearch_ray.index.codec import BLOCK_SIZE
    from iresearch_ray.index.segment import (_decode_stream,
                                             _decode_stream_range)
    from iresearch_ray.index.segment import write_segment  # noqa: F401

    rng = np.random.default_rng(5)
    # build a blocked stream exactly like the encoder: full 128-blocks
    # bitpacked + varint tail
    from iresearch_ray.index.codec import (bitpack_block,
                                           varint_encode,
                                           varint_byte_lengths)

    for count in (1, 127, 128, 129, 300, 128 * 3, 128 * 3 + 77):
        vals = rng.integers(0, 1 << 17, size=count).astype(np.int64)
        full = count // BLOCK_SIZE
        parts, offs = [], []
        pos = 0
        for b in range(full):
            blk = bitpack_block(vals[b * BLOCK_SIZE:(b + 1) * BLOCK_SIZE])
            offs.append(pos)
            parts.append(np.frombuffer(blk, dtype=np.uint8))
            pos += len(blk)
        tail = vals[full * BLOCK_SIZE:]
        if tail.size:
            offs.append(pos)
            tb = varint_encode(tail, varint_byte_lengths(tail))
            parts.append(np.frombuffer(tb, dtype=np.uint8))
        blob = (np.concatenate(parts) if parts
                else np.empty(0, dtype=np.uint8))
        offsets = np.asarray(offs, dtype=np.int64)
        ref = _decode_stream(blob, offsets, count)
        np.testing.assert_array_equal(ref, vals)
        cases = {(0, count), (0, 0), (count, count),
                 (0, min(5, count)), (max(0, count - 5), count),
                 (count // 3, 2 * count // 3),
                 (max(0, count - 1), count)}
        if count > BLOCK_SIZE:
            cases.add((BLOCK_SIZE - 1, BLOCK_SIZE + 1))   # boundary
            cases.add((full * BLOCK_SIZE, count))          # tail only
            cases.add((full * BLOCK_SIZE - 3, count))      # span tail
        for a, b in cases:
            got = _decode_stream_range(blob, offsets, count, a, b)
            np.testing.assert_array_equal(got, ref[a:b], err_msg=f"{a}:{b}")
