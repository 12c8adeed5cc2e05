"""FOR/PFor + vint round-trips — our BasePostingsFormatTestCase analogue
(reference: test-framework/.../tests/index/BasePostingsFormatTestCase.java,
RandomPostingsTester.java; coverage matrix from FIXTURES.md §5)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_ray.functions.codec import (
    BLOCK_SIZE,
    bit_width,
    pack_bits,
    pfor_decode,
    pfor_encode,
    read_vint,
    unpack_bits,
    write_vint,
)


def roundtrip(values):
    buf = bytearray()
    pfor_encode(np.asarray(values, dtype=np.uint64), buf)
    out, pos = pfor_decode(memoryview(bytes(buf)), 0)
    assert pos == len(buf)
    return out


@given(st.lists(st.integers(0, 2**40), min_size=0, max_size=BLOCK_SIZE))
@settings(max_examples=200, deadline=None)
def test_pfor_roundtrip_random(vals):
    assert np.array_equal(roundtrip(vals), np.asarray(vals, dtype=np.uint64))


@pytest.mark.parametrize(
    "vals",
    [
        [0] * 256,                      # all-equal zero block
        [7] * 256,                      # all-equal block -> const mode
        [1, 0] * 128,                   # 1-bit width
        list(range(256)),               # 8-bit
        [2**31 - 1] * 255 + [0],        # width 31 with one small value
        [1] * 249 + [2**40] * 7,        # exactly 7 exceptions
        [1] * 248 + [2**40] * 8,        # 8 would-be exceptions -> full width
        [5],                            # singleton (df=1 optimization case)
        [],                             # empty
    ],
)
def test_pfor_edge_blocks(vals):
    assert np.array_equal(roundtrip(vals), np.asarray(vals, dtype=np.uint64))


def test_pfor_exception_block_is_smaller():
    # 249 tiny values + 7 huge: patched encoding must beat full-width FOR
    vals = np.array([3] * 249 + [2**33] * 7, dtype=np.uint64)
    buf = bytearray()
    pfor_encode(vals, buf)
    full_width_bytes = (256 * 34 + 7) // 8
    assert len(buf) < full_width_bytes / 2


@given(st.integers(0, 2**62 - 1))
@settings(max_examples=200, deadline=None)
def test_vint_roundtrip(v):
    buf = bytearray()
    write_vint(buf, v)
    out, pos = read_vint(memoryview(bytes(buf)), 0)
    assert out == v and pos == len(buf)


@given(
    st.lists(st.integers(0, 2**30), min_size=1, max_size=64),
    st.just(None),
)
@settings(max_examples=100, deadline=None)
def test_pack_bits_roundtrip(vals, _):
    arr = np.asarray(vals, dtype=np.uint64)
    w = int(bit_width(arr).max())
    out = unpack_bits(pack_bits(arr, w), len(arr), w)
    assert np.array_equal(out, arr)


def test_bit_width_exact():
    v = np.array([0, 1, 2, 3, 4, 255, 256, 2**31 - 1, 2**40], dtype=np.uint64)
    expect = np.array([0, 1, 2, 2, 3, 8, 9, 31, 41])
    assert np.array_equal(bit_width(v), expect)
