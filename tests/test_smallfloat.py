"""Exhaustive tests for the SmallFloat int4/byte4 port (FIXTURES.md F3).

Semantics from lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169.
"""

import numpy as np
import pytest

from lucene_solr_spark.util import smallfloat as sf


def test_constants():
    assert sf.MAX_INT4 == sf.long_to_int4(2**31 - 1)
    assert sf.NUM_FREE_VALUES == 24


def test_identity_below_free_values():
    for i in range(24):
        assert sf.int_to_byte4(i) == i
        assert sf.byte4_to_int(i) == i


def test_exact_roundtrip_to_40_first_lossy_41():
    for i in range(41):
        assert sf.byte4_to_int(sf.int_to_byte4(i)) == i
    assert sf.int_to_byte4(41) == 40
    assert sf.byte4_to_int(40) == 40


@pytest.mark.parametrize(
    "i,b,decoded",
    [(100, 57, 96), (1000, 87, 984), (65535, 135, 61464), (2**31 - 1, 255, 2013265944)],
)
def test_spot_values(i, b, decoded):
    assert sf.int_to_byte4(i) == b
    assert sf.byte4_to_int(b) == decoded


def test_all_bytes_roundtrip():
    # decode → encode → same byte, for every byte 0..255
    for b in range(256):
        assert sf.int_to_byte4(sf.byte4_to_int(b)) == b


def test_monotone_and_order_preserving():
    prev = -1
    for b in range(256):
        d = sf.byte4_to_int(b)
        assert d > prev
        prev = d


def test_negative_raises():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
    with pytest.raises(ValueError):
        sf.long_to_int4(-5)


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(42)
    xs = np.concatenate(
        [
            np.arange(0, 4096),
            rng.integers(0, 2**31 - 1, size=5000),
            np.array([2**31 - 1, 0, 23, 24, 40, 41]),
        ]
    )
    vb = sf.int_to_byte4_np(xs)
    assert vb.dtype == np.uint8
    for x, b in zip(xs.tolist(), vb.tolist()):
        assert b == sf.int_to_byte4(x)


def test_length_table_is_float32_decode():
    assert sf.LENGTH_TABLE.dtype == np.float32
    assert sf.LENGTH_TABLE[40] == 40.0
    assert sf.LENGTH_TABLE[255] == np.float32(2013265944)
