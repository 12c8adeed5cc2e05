"""Norm encoding: monotone int -> byte compression with a 3+1-bit mantissa.

Re-implements (from the published semantics, not the code) the reference's
``SmallFloat.intToByte4`` / ``byte4ToInt`` used for document-length norms
(reference: core/src/java/org/apache/lucene/util/SmallFloat.java:147-167,
consumed by Similarity.computeNorm, search/similarities/Similarity.java:153-163).

Encoding: values 0..7 are stored as-is; larger values keep their top 4
significant bits (an implicit leading 1 plus a 3-bit explicit mantissa) and a
shift (exponent), laid out so the byte ordering is monotone in the input:

    encode(i) = i                                if i < 8
              = (i >> shift) + (shift << 3)      where shift = bit_length(i) - 4

    decode(b) = b                                if b < 8
              = ((b & 7) | 8) << ((b >> 3) - 1)  otherwise

Properties (tested): monotone non-decreasing; decode(encode(i)) <= i <
decode(encode(i) + 1); identity for i < 16; full int32 range fits in a byte
(encode(2**31 - 1) == 231).
"""

from __future__ import annotations

import numpy as np

_POW2 = (1 << np.arange(64, dtype=np.uint64)).astype(np.int64)  # 2^0..2^62 (+overflow top)
# np.searchsorted(_POW2, i, side="right") == bit_length(i) for i >= 0 because
# _POW2[k] = 2^k and bit_length(i) = #{k : 2^k <= i}.


def int_to_byte4(i):
    """Vectorized intToByte4. Accepts scalar or array of non-negative ints."""
    arr = np.asarray(i, dtype=np.int64)
    if np.any(arr < 0):
        raise ValueError("int_to_byte4 requires non-negative input")
    numbits = np.searchsorted(_POW2[:63], arr, side="right")
    shift = np.maximum(numbits - 4, 0)
    enc = (arr >> shift) + (shift << 3)
    out = enc.astype(np.uint8)
    if out.ndim == 0:
        return int(out)
    return out


def byte4_to_int(b):
    """Vectorized byte4ToInt. Accepts scalar or array of bytes (0..255)."""
    arr = np.asarray(b, dtype=np.int64)
    small = arr < 8
    shift = np.maximum((arr >> 3) - 1, 0)
    dec = np.where(small, arr, ((arr & 7) | 8) << shift)
    if dec.ndim == 0:
        return int(dec)
    return dec


#: LENGTH_TABLE[b] = byte4_to_int(b) for each of the 256 norm bytes — the
#: decoded document length used to fill the per-norm BM25 cache (reference:
#: BM25Similarity.java:179-185 builds its 256-entry cache from this table).
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.int64)).astype(np.float32)
LENGTH_TABLE_INT = byte4_to_int(np.arange(256, dtype=np.int64))
