"""Lossy small-float encodings for document norms.

Reimplements the integer bit math of Lucene's
``org.apache.lucene.util.SmallFloat`` (reference:
lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:101-169):
``int_to_byte4`` encodes a non-negative int (the per-field token count
of a document) into one byte, exactly for 0..39 and with 4 significant
bits above; ``byte4_to_int`` decodes. BM25's per-doc length
normalization reads document length *through this encoding*
(BM25Similarity.java:116-126, LENGTH_TABLE at :106-112), so a
rank-identical engine must reproduce it bit-for-bit.

Pure integer arithmetic — deterministic across platforms. Vectorized
numpy variants are provided for the Arrow/pandas UDF hot path.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: int) -> int:
    """Float-like encoding of a non-negative int: 3 mantissa bits with
    an implicit leading 1, 5 exponent bits; order-preserving, keeps 4
    significant bits. (SmallFloat.java:101-121 semantics.)"""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        # subnormal: value stored directly
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07  # drop the implicit msb
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    """Inverse of :func:`long_to_int4` up to the 4-significant-bit loss
    (SmallFloat.java:126-137 semantics)."""
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


MAX_INT4 = long_to_int4(2**31 - 1)  # 231
NUM_FREE_VALUES = 255 - MAX_INT4  # 24: bytes 0..23 encode lengths exactly


def int_to_byte4(i: int) -> int:
    """Encode non-negative int → unsigned byte 0..255. Identity for
    i < NUM_FREE_VALUES; 4-significant-bit float-like encoding above
    (SmallFloat.java:147-155 semantics)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode unsigned byte 0..255 → int (SmallFloat.java:160-168)."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# Decode table: LENGTH_TABLE[b] = float(byte4_to_int(b)), the exact
# analogue of BM25Similarity.LENGTH_TABLE (BM25Similarity.java:106-112).
LENGTH_TABLE = np.array([byte4_to_int(b) for b in range(256)], dtype=np.float32)

# Encode lookup for the vectorized path: norms are token counts, which
# can be large, so encode via searchsorted on the decode table's
# breakpoints rather than a dense table.
_DECODE_INTS = np.array([byte4_to_int(b) for b in range(256)], dtype=np.int64)


def int_to_byte4_np(counts: np.ndarray) -> np.ndarray:
    """Vectorized ``int_to_byte4`` over an int array → uint8 array.

    Uses the fact that the encoding is the order-preserving inverse of
    the (monotone) decode table: encode(x) = the largest byte whose
    decoded value is <= x, because Lucene's int4 encode truncates
    (floor) the mantissa.
    """
    counts = np.asarray(counts, dtype=np.int64)
    if (counts < 0).any():
        raise ValueError("Only supports positive values")
    idx = np.searchsorted(_DECODE_INTS, counts, side="right") - 1
    return idx.astype(np.uint8)
