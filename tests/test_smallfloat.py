import numpy as np
from hypothesis import given, strategies as st

from lucene_ray.functions.smallfloat import (
    LENGTH_TABLE_INT,
    byte4_to_int,
    int_to_byte4,
)


def test_identity_below_16():
    for i in range(16):
        assert int_to_byte4(i) == i
        assert byte4_to_int(i) == i


def test_known_values():
    assert int_to_byte4(16) == 16
    assert int_to_byte4(17) == 16
    assert int_to_byte4(31) == 23
    assert int_to_byte4(32) == 24
    assert int_to_byte4(2**31 - 1) == 231
    assert byte4_to_int(231) == 15 << 27


def test_monotone_exhaustive_small():
    vals = np.arange(0, 1 << 16)
    enc = int_to_byte4(vals)
    assert np.all(np.diff(enc.astype(np.int64)) >= 0)


def test_decode_is_lower_bound_bucket():
    vals = np.arange(0, 1 << 16)
    enc = int_to_byte4(vals).astype(np.int64)
    dec = byte4_to_int(enc)
    assert np.all(dec <= vals)
    nxt = byte4_to_int(enc + 1)
    assert np.all(vals < nxt)


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_property(i):
    b = int_to_byte4(i)
    assert 0 <= b <= 255
    lo = byte4_to_int(b)
    assert lo <= i
    if b < 255:
        assert i < byte4_to_int(b + 1)


def test_length_table_monotone_256():
    assert LENGTH_TABLE_INT[0] == 0
    assert np.all(np.diff(LENGTH_TABLE_INT) > 0)
    assert len(LENGTH_TABLE_INT) == 256
