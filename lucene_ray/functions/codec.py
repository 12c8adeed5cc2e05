"""Block codecs: FOR bit-packing, PFor (patched FOR) and varints, numpy-only.

Semantics follow the reference's posting-block compression (reference:
core/src/java/org/apache/lucene/codecs/lucene104/ForUtil.java:26-33 — fixed
width bit-packing of BLOCK_SIZE ints; PForUtil.java:29,51-105 — up to 7
exceptions patched out so the body packs at a narrower width, and all-equal
blocks collapse to a single value). The on-disk byte layout is our own (the
north rule requires identical scores/ranks, not identical files).

Bit order: little-endian within the packed stream (np.packbits /
np.unpackbits with ``bitorder="little"``), widths 0..64.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

BLOCK_SIZE = 256  # docs per posting block (reference: ForUtil 256-int blocks)
MAX_EXCEPTIONS = 7  # reference: PForUtil.java:29


_POW2 = (np.uint64(1) << np.arange(63, dtype=np.uint64))


def bit_width(values: np.ndarray) -> np.ndarray:
    """Per-element number of bits needed (0 for value 0). Exact via integer
    comparisons: bit_length(v) = #{k < 63 : 2^k <= v} for v < 2^63."""
    v = values.astype(np.uint64)
    if np.any(v >= np.uint64(1) << np.uint64(62)):
        raise ValueError("values must be < 2^62")
    return np.searchsorted(_POW2, v, side="right").astype(np.int64)


def pack_bits(values: np.ndarray, width: int) -> bytes:
    """Pack non-negative ints at fixed ``width`` bits, little-endian."""
    if width == 0 or len(values) == 0:
        return b""
    v = values.astype(np.uint64)
    shifts = np.arange(width, dtype=np.uint64)
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, width: int) -> np.ndarray:
    """Inverse of :func:`pack_bits` → uint64 array of length ``n``.

    Word-gather implementation: element i occupies bits [i*width,
    (i+1)*width) of the little-endian stream; each value is assembled from
    at most two 64-bit words with vectorized shifts (no per-bit matrix)."""
    if width == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    if width > 57:
        # rare wide case: fall back to the exact per-bit route (a value may
        # span >2 byte-aligned words only conceptually; keep it simple)
        bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8), count=n * width,
            bitorder="little",
        )
        shifts = np.arange(width, dtype=np.uint64)
        return (bits.reshape(n, width).astype(np.uint64) << shifts).sum(
            axis=1, dtype=np.uint64
        )
    # pad so that word_idx + 1 is always readable
    data = np.frombuffer(buf, dtype=np.uint8)
    padded = np.zeros(((len(data) + 15) // 8) * 8, dtype=np.uint8)
    padded[: len(data)] = data
    words = padded.view(np.uint64)
    starts = np.arange(n, dtype=np.uint64) * np.uint64(width)
    widx = (starts >> np.uint64(6)).astype(np.int64)
    boff = starts & np.uint64(63)
    lo = words[widx] >> boff
    # high part only when the value crosses the word boundary; shift amount
    # is kept in [1, 63] to avoid undefined 64-bit shifts
    need_hi = (boff + np.uint64(width)) > np.uint64(64)
    hi_shift = np.where(need_hi, np.uint64(64) - boff, np.uint64(1))
    hi = np.where(need_hi, words[widx + 1] << hi_shift, np.uint64(0))
    mask = (np.uint64(1) << np.uint64(width)) - np.uint64(1)
    return (lo | hi) & mask


def write_vint(out: bytearray, value: int) -> None:
    v = int(value)
    if v < 0:
        raise ValueError("vint requires non-negative value")
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)


def read_vint(buf: memoryview, pos: int) -> Tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if b < 0x80:
            return result, pos
        shift += 7


# ---------------------------------------------------------------------------
# PFor block: [mode:u8]
#   mode 0 (const):   varint value, varint count
#   mode 1 (packed):  u8 width, u8 n_exceptions, varint count,
#                     packed body (count * width bits),
#                     then per exception: u8 position, varint high_bits
# ---------------------------------------------------------------------------

_MODE_CONST = 0
_MODE_PACKED = 1


def pfor_encode(values: np.ndarray, out: bytearray) -> None:
    """Encode one block (len <= BLOCK_SIZE) of non-negative ints."""
    n = len(values)
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if n == 0:
        out.append(_MODE_CONST)
        write_vint(out, 0)
        write_vint(out, 0)
        return
    if np.all(v == v[0]):
        out.append(_MODE_CONST)
        write_vint(out, int(v[0]))
        write_vint(out, n)
        return
    widths = bit_width(v)
    w_full = int(widths.max())
    w_base = w_full
    exc_idx = np.empty(0, dtype=np.int64)
    if n > MAX_EXCEPTIONS:
        # width that covers all but the top MAX_EXCEPTIONS values
        w_candidate = int(np.partition(widths, n - MAX_EXCEPTIONS - 1)[
            n - MAX_EXCEPTIONS - 1])
        if w_candidate < w_full:
            cand_idx = np.flatnonzero(widths > w_candidate)
            if len(cand_idx) <= MAX_EXCEPTIONS:
                w_base = w_candidate
                exc_idx = cand_idx
    out.append(_MODE_PACKED)
    out.append(w_base)
    out.append(len(exc_idx))
    write_vint(out, n)
    mask = (np.uint64(1) << np.uint64(w_base)) - np.uint64(1) if w_base else np.uint64(0)
    body = v & mask
    out.extend(pack_bits(body, w_base))
    for i in exc_idx:
        out.append(int(i))
        write_vint(out, int(v[i] >> np.uint64(w_base)))


def pfor_scan(buf: memoryview, pos: int):
    """Parse one block's header WITHOUT decoding the body.

    -> (mode, const_value_or_width, n, body_bit_start, exceptions, next_pos)
    where exceptions is a list of (index, high_bits) for packed blocks and
    body_bit_start is the absolute bit offset of the packed body in ``buf``.
    """
    mode = buf[pos]
    pos += 1
    if mode == _MODE_CONST:
        value, pos = read_vint(buf, pos)
        n, pos = read_vint(buf, pos)
        return _MODE_CONST, value, n, 0, (), pos
    width = buf[pos]
    n_exc = buf[pos + 1]
    pos += 2
    n, pos = read_vint(buf, pos)
    body_bit_start = pos * 8
    pos += (n * width + 7) // 8
    exceptions = []
    for _ in range(n_exc):
        idx = buf[pos]
        pos += 1
        high, pos = read_vint(buf, pos)
        exceptions.append((idx, high))
    return _MODE_PACKED, width, n, body_bit_start, exceptions, pos


def bulk_decode(buf: memoryview, positions) -> list:
    """Decode MANY pfor blocks with ONE vectorized gather.

    ``positions`` is a list of byte offsets of block starts in ``buf``.
    Returns (decoded uint64 array per block, next byte offset per block). All packed bodies across
    all blocks are unpacked in a single word-gather over per-element bit
    starts and per-element widths — the bulk analogue of the reference's
    generated ForUtil kernels (codecs/lucene104/ForUtil.java:26-33).
    """
    headers = [pfor_scan(buf, p) for p in positions]
    out: list = [None] * len(headers)
    # gather metadata for all packed elements
    el_starts: list = []
    el_widths: list = []
    packed_at: list = []  # (block_index, n)
    for bi, (mode, wv, n, body_bit, _exc, _nxt) in enumerate(headers):
        if mode == _MODE_CONST:
            out[bi] = np.full(n, wv, dtype=np.uint64)
        elif wv == 0:
            out[bi] = np.zeros(n, dtype=np.uint64)
        else:
            el_starts.append(
                np.uint64(body_bit)
                + np.arange(n, dtype=np.uint64) * np.uint64(wv)
            )
            el_widths.append(np.full(n, wv, dtype=np.uint64))
            packed_at.append((bi, n))
    if packed_at:
        starts = np.concatenate(el_starts)
        widths = np.concatenate(el_widths)
        data = np.frombuffer(buf, dtype=np.uint8)
        padded = np.zeros(((len(data) + 15) // 8) * 8, dtype=np.uint8)
        padded[: len(data)] = data
        words = padded.view(np.uint64)
        widx = (starts >> np.uint64(6)).astype(np.int64)
        boff = starts & np.uint64(63)
        lo = words[widx] >> boff
        need_hi = (boff + widths) > np.uint64(64)
        hi_shift = np.where(need_hi, np.uint64(64) - boff, np.uint64(1))
        hi = np.where(need_hi, words[widx + 1] << hi_shift, np.uint64(0))
        mask = (np.uint64(1) << widths) - np.uint64(1)
        vals = (lo | hi) & mask
        cursor = 0
        for bi, n in packed_at:
            out[bi] = vals[cursor : cursor + n]
            cursor += n
    # patch exceptions (few per block by construction)
    for bi, (mode, wv, _n, _bb, exc, _nxt) in enumerate(headers):
        if mode == _MODE_PACKED:
            for idx, high in exc:
                out[bi][idx] |= np.uint64(high) << np.uint64(wv)
    return out, [h[5] for h in headers]


def pfor_decode(buf: memoryview, pos: int) -> Tuple[np.ndarray, int]:
    mode = buf[pos]
    pos += 1
    if mode == _MODE_CONST:
        value, pos = read_vint(buf, pos)
        n, pos = read_vint(buf, pos)
        return np.full(n, value, dtype=np.uint64), pos
    width = buf[pos]
    n_exc = buf[pos + 1]
    pos += 2
    n, pos = read_vint(buf, pos)
    nbytes = (n * width + 7) // 8
    vals = unpack_bits(bytes(buf[pos : pos + nbytes]), n, width)
    pos += nbytes
    for _ in range(n_exc):
        idx = buf[pos]
        pos += 1
        high, pos = read_vint(buf, pos)
        vals[idx] |= np.uint64(high) << np.uint64(width)
    return vals, pos
