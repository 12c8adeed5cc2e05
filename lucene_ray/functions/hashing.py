"""Stable, process-independent hashes for partitioning and dedup.

Python's builtin ``hash(str)`` is salted per process (PYTHONHASHSEED), so it
must never be used for routing rows between Ray tasks: checkpoint/resume and
partition-invariance both require deterministic routing (reference analogue:
the reference gets determinism from its single-writer thread model,
index/DocumentsWriter.java:39-64; we get it from stable hashes).

``crc32_str`` (zlib, C speed) is the routing hash; ``md5_hex`` is the content
hash shared with the DuckDB oracle (DuckDB's ``md5()`` matches hashlib's).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np


def crc32_str(s: str) -> int:
    """Deterministic 32-bit hash of a unicode string."""
    return zlib.crc32(s.encode("utf-8"))


def crc32_bucket(s: str, num_buckets: int) -> int:
    return zlib.crc32(s.encode("utf-8")) % num_buckets


def md5_hex(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def md5_u64(s: str) -> int:
    """First 8 bytes of md5 as an unsigned 64-bit int (big-endian, i.e. the
    numeric value of the first 16 hex chars — matches DuckDB
    ``('0x' || substr(md5(s), 1, 16))::UBIGINT``)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def crc32_array(strs) -> np.ndarray:
    """Vector-ish crc32 over an iterable of python strings -> uint32 array."""
    crc = zlib.crc32
    return np.fromiter(
        (crc(s.encode("utf-8")) for s in strs), dtype=np.uint32, count=len(strs)
    )
