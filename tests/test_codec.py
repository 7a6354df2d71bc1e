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
