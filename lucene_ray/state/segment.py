"""Segment format: per-term posting blobs + an Arrow term dictionary.

A *segment* here is one term-partition of the global index (the output of one
reducer in the ``groupby(gpart)`` shuffle), not a doc partition as in the
reference — doc IDs are global up front, so the groupby-on-term shuffle
produces already-merged posting lists (reference analogues: postings layout
core/src/java/org/apache/lucene/codecs/lucene104/Lucene104PostingsFormat.java:38-79
and Lucene104PostingsWriter.java:237-298; term dictionary
codecs/lucene103/blocktree/Lucene103BlockTreeTermsWriter.java:81-120 — we use a
sorted Arrow table + binary search instead of a block tree/FST; skip data
Lucene104PostingsFormat.java:342-353 — we use per-block first/last doc arrays
with ``np.searchsorted``, which subsumes the 2-level skip list).

Files per segment ``seg-{gpart:05d}``:

* ``seg-NNNNN.post``          — concatenated per-(term, bucket) posting blobs
* ``seg-NNNNN.terms.parquet`` — term dict: ``term, bucket, doc_freq, total_tf,
                                 max_tf, offset, length``
* ``seg-NNNNN.done.json``     — checkpoint marker + lineage + metrics

Per-(term,bucket) blob layout (all integers little-endian):

    vint  df
    vint  n_blocks
    int64[n_blocks]  first_doc   (absolute doc ID of each block's first doc)
    int64[n_blocks]  last_doc    (absolute doc ID of each block's last doc)
    int32[n_blocks]  block_off   (byte offset of each block, relative to the
                                  start of the blocks section)
    per block: vint m, then m * (vint tf, vint key)      # impact frontier
    blocks section, per block:
        pfor(doc deltas: d[0] = 0 relative to first_doc, then gaps)
        pfor(tf per doc)
        pfor(norm key per doc)

Blocks hold up to ``BLOCK_SIZE``(=256) docs and are independently decodable
(each knows its ``first_doc``), which is what makes block skipping possible.
The per-posting norm key (SmallFloat byte or exact doc length, see
``functions/bm25.py``) is stored inline instead of in a separate norms file —
one pfor-compressed column replaces the norms join at query time.

Heavy terms (df over the build's skew threshold) are split into multiple
``bucket`` rows, where ``bucket = doc_id >> bucket_shift``; readers concatenate
a term's buckets in ascending bucket order, which restores global docID order
because buckets are disjoint ascending doc ranges (reference analogue: Lucene
never splits a term's postings inside a segment — this is the explicit skew
design the scale target requires, SURVEY.md §7.4/§7.5).
"""

from __future__ import annotations

import json
import math
import os
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.codec import (
    BLOCK_SIZE,
    pfor_decode,
    pfor_encode,
    read_vint,
    write_vint,
)
from ..functions.impacts import impact_frontier, impact_frontiers_bulk

MANIFEST_NAME = "manifest.json"
SEGMENT_DIR = "segments"

TERMS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("bucket", pa.int32()),
        ("doc_freq", pa.int64()),
        ("total_tf", pa.int64()),
        ("max_tf", pa.int32()),
        ("offset", pa.int64()),
        ("length", pa.int64()),
    ]
)


def _encode_blocks_blockwise(scratch, offsets, bounds, doc_ids, tfs, keys):
    """Reference per-block encode path (kept for equivalence testing)."""
    for b, (lo, hi) in enumerate(bounds):
        offsets[b] = len(scratch)
        d = doc_ids[lo:hi]
        gaps = np.empty(hi - lo, dtype=np.uint64)
        gaps[0] = 0
        np.subtract(d[1:], d[:-1], out=gaps[1:], casting="unsafe")
        pfor_encode(gaps, scratch)
        pfor_encode(tfs[lo:hi].astype(np.uint64), scratch)
        pfor_encode(keys[lo:hi].astype(np.uint64), scratch)


def _encode_blocks_bulk(scratch, offsets, bounds, doc_ids, tfs, keys):
    """Bulk encode path, byte-identical to :func:`_encode_blocks_blockwise`.

    All FULL 256-doc chunks (gaps/tfs/keys interleaved block-major) share
    one vectorized width/exception selection over a (3*nb_full, 256)
    matrix, and chunks of equal base width pack in ONE pack_bits call
    (a full chunk's body is exactly 32*w bytes, so concatenated packing
    splits cleanly on byte boundaries). The tail block falls back to the
    per-block encoder. Bulk analogue of the reference's generated ForUtil
    encode kernels (codecs/lucene104/ForUtil.java, gen_ForUtil.py)."""
    from ..functions.codec import MAX_EXCEPTIONS, bit_width, pack_bits

    df = len(doc_ids)
    nb_full = df // BLOCK_SIZE
    gaps_all = np.empty(df, dtype=np.uint64)
    if df:
        gaps_all[0] = 0
        np.subtract(
            doc_ids[1:], doc_ids[:-1], out=gaps_all[1:], casting="unsafe"
        )
        gaps_all[::BLOCK_SIZE] = 0  # each block restarts at first_doc

    if nb_full:
        n_full = nb_full * BLOCK_SIZE
        rows = 3 * nb_full
        M = np.empty((rows, BLOCK_SIZE), dtype=np.uint64)
        M[0::3] = gaps_all[:n_full].reshape(nb_full, BLOCK_SIZE)
        M[1::3] = tfs[:n_full].astype(np.uint64).reshape(nb_full, BLOCK_SIZE)
        M[2::3] = keys[:n_full].astype(np.uint64).reshape(nb_full, BLOCK_SIZE)
        is_const = (M == M[:, :1]).all(axis=1)
        widths = bit_width(M.ravel()).reshape(rows, BLOCK_SIZE)
        w_full = widths.max(axis=1)
        kth = BLOCK_SIZE - MAX_EXCEPTIONS - 1
        w_cand = np.partition(widths, kth, axis=1)[:, kth]
        n_over = (widths > w_cand[:, None]).sum(axis=1)
        use_exc = (w_cand < w_full) & (n_over <= MAX_EXCEPTIONS)
        w_base = np.where(use_exc, w_cand, w_full).astype(np.int64)

        # width-grouped packing of non-const rows, bodies sliced per row
        bodies: Dict[int, bytes] = {}
        row_ids = np.flatnonzero(~is_const)
        for w in np.unique(w_base[row_ids]):
            grp = row_ids[w_base[row_ids] == w]
            if w == 0:
                for r in grp:
                    bodies[int(r)] = b""
                continue
            mask = (np.uint64(1) << np.uint64(w)) - np.uint64(1)
            packed = pack_bits((M[grp] & mask).ravel(), int(w))
            body_len = BLOCK_SIZE * int(w) // 8
            for j, r in enumerate(grp):
                bodies[int(r)] = packed[j * body_len : (j + 1) * body_len]

        vint_256 = bytearray()
        write_vint(vint_256, BLOCK_SIZE)
        for b in range(nb_full):
            offsets[b] = len(scratch)
            for r in range(3 * b, 3 * b + 3):
                if is_const[r]:
                    scratch.append(0)
                    write_vint(scratch, int(M[r, 0]))
                    scratch.extend(vint_256)
                    continue
                if use_exc[r]:
                    exc_idx = np.flatnonzero(widths[r] > w_base[r])
                else:
                    exc_idx = ()
                scratch.append(1)
                scratch.append(int(w_base[r]))
                scratch.append(len(exc_idx))
                scratch.extend(vint_256)
                scratch.extend(bodies[r])
                for i in exc_idx:
                    scratch.append(int(i))
                    write_vint(
                        scratch, int(M[r, i] >> np.uint64(w_base[r]))
                    )

    if df % BLOCK_SIZE:
        lo = nb_full * BLOCK_SIZE
        offsets[len(bounds) - 1] = len(scratch)
        pfor_encode(gaps_all[lo:], scratch)
        pfor_encode(tfs[lo:].astype(np.uint64), scratch)
        pfor_encode(keys[lo:].astype(np.uint64), scratch)


def encode_term_postings(
    out: bytearray, doc_ids: np.ndarray, tfs: np.ndarray, keys: np.ndarray
) -> Tuple[int, int]:
    """Append one (term, bucket) posting list to ``out``.

    ``doc_ids`` must be strictly increasing. Returns (offset, length) of the
    written blob within ``out``.
    """
    start = len(out)
    df = len(doc_ids)
    n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
    write_vint(out, df)
    write_vint(out, n_blocks)

    doc_ids = np.ascontiguousarray(doc_ids, dtype=np.int64)
    tfs = np.ascontiguousarray(tfs, dtype=np.int64)
    keys = np.ascontiguousarray(keys, dtype=np.int64)

    bounds = [(i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df)) for i in range(n_blocks)]
    first = doc_ids[0 :: BLOCK_SIZE].copy() if df else np.empty(0, np.int64)
    last_idx = np.minimum(
        np.arange(1, n_blocks + 1, dtype=np.int64) * BLOCK_SIZE, df
    ) - 1
    last = doc_ids[last_idx] if df else np.empty(0, np.int64)
    out.extend(first.tobytes())
    out.extend(np.ascontiguousarray(last).tobytes())

    scratch = bytearray()
    offsets = np.empty(n_blocks, dtype=np.int32)
    _encode_blocks_bulk(scratch, offsets, bounds, doc_ids, tfs, keys)
    sizes = np.asarray([hi - lo for lo, hi in bounds], dtype=np.int64)
    frontiers = impact_frontiers_bulk(tfs, keys, sizes)

    out.extend(offsets.tobytes())
    for ft, fk in frontiers:
        write_vint(out, len(ft))
        for t, k in zip(ft, fk):
            write_vint(out, int(t))
            write_vint(out, int(k))
    out.extend(scratch)
    return start, len(out) - start


@dataclass
class TermPostings:
    """Lazily-decoded posting list for one (term, bucket) blob."""

    buf: memoryview
    df: int
    first_docs: np.ndarray  # int64[n_blocks]
    last_docs: np.ndarray
    block_offs: np.ndarray  # int32[n_blocks], relative to blocks_base
    frontier_tfs: List[np.ndarray]
    frontier_keys: List[np.ndarray]
    blocks_base: int
    # per-block max of the scorer's monotone ratio (freq * inv_len_factor),
    # keyed by the scorer's ratio_key() — idf/boost only scale it
    # monotonically, but k1/b/collection stats change the ratio itself
    frontier_m: Optional[Dict[tuple, np.ndarray]] = None
    # decoded-block cache (actor-resident readers serve repeated queries)
    _block_cache: Optional[Dict[int, tuple]] = None

    @property
    def n_blocks(self) -> int:
        return len(self.first_docs)

    def block_size(self, b: int) -> int:
        n_full, rem = divmod(self.df, BLOCK_SIZE)
        return BLOCK_SIZE if b < n_full else rem

    def decode_block(self, b: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (doc_ids:int64, tfs:int64, keys:int64) for block b (cached)."""
        if self._block_cache is None:
            self._block_cache = {}
        hit = self._block_cache.get(b)
        if hit is not None:
            return hit
        pos = self.blocks_base + int(self.block_offs[b])
        gaps, pos = pfor_decode(self.buf, pos)
        tfs, pos = pfor_decode(self.buf, pos)
        keys, pos = pfor_decode(self.buf, pos)
        docs = self.first_docs[b] + np.cumsum(gaps.astype(np.int64))
        if len(docs) and docs[-1] < 2**31:
            docs = docs.astype(np.int32)  # halve scatter/index bandwidth
        out = (docs, tfs.astype(np.int64), keys.astype(np.int64))
        self._block_cache[b] = out
        return out

    _all_cache: Optional[tuple] = None

    def decode_all(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Whole-list decode: all blocks' gap/tf/key arrays in three bulk
        vectorized gathers (codec.bulk_decode), then one grouped cumsum for
        the doc IDs — no per-block numpy calls on the cold path."""
        if self._all_cache is not None:
            return self._all_cache
        from ..functions.codec import bulk_decode

        nb = self.n_blocks
        if nb == 0:
            e = np.empty(0, dtype=np.int64)
            return e, e, e
        gap_pos = [self.blocks_base + int(o) for o in self.block_offs]
        gaps, tf_pos = bulk_decode(self.buf, gap_pos)
        tfs, key_pos = bulk_decode(self.buf, tf_pos)
        keys, _ = bulk_decode(self.buf, key_pos)
        sizes = np.fromiter((len(g) for g in gaps), dtype=np.int64, count=nb)
        flat_gaps = np.concatenate(gaps).astype(np.int64)
        cs = np.cumsum(flat_gaps)
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        # per-block rebase: docs = first_doc[b] + cumsum(gaps_b)
        base_correction = cs[starts] - flat_gaps[starts]
        docs = (
            cs
            - np.repeat(base_correction, sizes)
            + np.repeat(self.first_docs, sizes)
        )
        if len(docs) and docs[-1] < 2**31:
            docs = docs.astype(np.int32)  # halve scatter/index bandwidth
        out = (
            docs,
            # tf fits int32 by construction (term-dict max_tf is int32);
            # norm keys are a byte (byte4) or a doc length (exact)
            np.concatenate(tfs).astype(np.int32),
            np.concatenate(keys).astype(np.int32),
        )
        self._all_cache = out
        return out


def parse_term_postings(buf: memoryview, offset: int, length: int) -> TermPostings:
    view = buf[offset : offset + length]
    pos = 0
    df, pos = read_vint(view, pos)
    n_blocks, pos = read_vint(view, pos)
    first = np.frombuffer(view, dtype=np.int64, count=n_blocks, offset=pos)
    pos += 8 * n_blocks
    last = np.frombuffer(view, dtype=np.int64, count=n_blocks, offset=pos)
    pos += 8 * n_blocks
    offs = np.frombuffer(view, dtype=np.int32, count=n_blocks, offset=pos)
    pos += 4 * n_blocks
    ftfs: List[np.ndarray] = []
    fkeys: List[np.ndarray] = []
    for _ in range(n_blocks):
        m, pos = read_vint(view, pos)
        t = np.empty(m, dtype=np.int64)
        k = np.empty(m, dtype=np.int64)
        for j in range(m):
            t[j], pos = read_vint(view, pos)
            k[j], pos = read_vint(view, pos)
        ftfs.append(t)
        fkeys.append(k)
    return TermPostings(
        buf=view,
        df=df,
        first_docs=first,
        last_docs=last,
        block_offs=offs,
        frontier_tfs=ftfs,
        frontier_keys=fkeys,
        blocks_base=pos,
    )


class SegmentReader:
    """One segment: term dict (in memory) + posting blob (bytes/memoryview)."""

    def __init__(self, seg_dir: str, gpart: int):
        base = os.path.join(seg_dir, f"seg-{gpart:05d}")
        self.gpart = gpart
        tbl = pq.read_table(base + ".terms.parquet")
        self._terms = tbl.column("term").to_pylist()
        self._buckets = tbl.column("bucket").to_numpy()
        self._doc_freq = tbl.column("doc_freq").to_numpy()
        self._total_tf = tbl.column("total_tf").to_numpy()
        self._max_tf = tbl.column("max_tf").to_numpy()
        self._offset = tbl.column("offset").to_numpy()
        self._length = tbl.column("length").to_numpy()
        # optional positions sidecar (.pos blob + per-run pointers)
        if "pos_offset" in tbl.schema.names:
            self._pos_offset = tbl.column("pos_offset").to_numpy()
            self._pos_length = tbl.column("pos_length").to_numpy()
        else:
            self._pos_offset = None
            self._pos_length = None
        self._pos_path = base + ".pos"
        self._pos_blob: Optional[memoryview] = None
        # optional character-offsets sidecar (.off blob: (start, end)
        # int32 pairs per occurrence, same run order as .pos)
        if "off_offset" in tbl.schema.names:
            self._off_offset = tbl.column("off_offset").to_numpy()
            self._off_length = tbl.column("off_length").to_numpy()
        else:
            self._off_offset = None
            self._off_length = None
        self._off_path = base + ".off"
        self._off_blob: Optional[memoryview] = None
        # optional payloads sidecar (.pay blob: float32 per occurrence,
        # same run order as .pos)
        if "pay_offset" in tbl.schema.names:
            self._pay_offset = tbl.column("pay_offset").to_numpy()
            self._pay_length = tbl.column("pay_length").to_numpy()
        else:
            self._pay_offset = None
            self._pay_length = None
        self._pay_path = base + ".pay"
        self._pay_blob: Optional[memoryview] = None
        # rows are written sorted by (term, bucket); index term -> row range
        self._row_range: Dict[str, Tuple[int, int]] = {}
        start = 0
        for i in range(1, len(self._terms) + 1):
            if i == len(self._terms) or self._terms[i] != self._terms[start]:
                self._row_range[self._terms[start]] = (start, i)
                start = i
        with open(base + ".post", "rb") as f:
            self._blob = memoryview(f.read())
        # parsed-postings cache: a warm reader (query actor) re-serves hot
        # terms without re-walking the frontier vints (Lucene analogue: the
        # terms dict / postings stay mmap-hot in the searcher)
        self._parsed: Dict[str, List[Tuple[int, TermPostings]]] = {}

    def terms(self) -> Iterator[str]:
        return iter(self._row_range)

    def sorted_terms(self) -> List[str]:
        """The segment's term list, ascending (rows are written term-sorted,
        so insertion order IS sorted order); cached references, no copies."""
        st = getattr(self, "_sorted_terms", None)
        if st is None:
            st = list(self._row_range)
            self._sorted_terms = st
        return st

    def reversed_terms(self) -> List[str]:
        """Character-reversed terms, sorted — the ReverseStringFilter
        trick (analysis/common/.../reverse/ReverseStringFilter.java,
        Solr's ReversedWildcardFilter): a leading-wildcard pattern with a
        literal SUFFIX becomes a prefix scan over this list instead of a
        full-dictionary regex walk. Built lazily once per segment."""
        rt = getattr(self, "_reversed_terms", None)
        if rt is None:
            rt = sorted(t[::-1] for t in self._row_range)
            self._reversed_terms = rt
        return rt

    def term_stats(self, term: str) -> Optional[Tuple[int, int]]:
        rng = self._row_range.get(term)
        if rng is None:
            return None
        lo, hi = rng
        return int(self._doc_freq[lo:hi].sum()), int(self._total_tf[lo:hi].sum())

    def postings_with_buckets(self, term: str) -> List[Tuple[int, TermPostings]]:
        """(bucket, postings) pairs for ``term``, ascending bucket order."""
        hit = self._parsed.get(term)
        if hit is not None:
            return hit
        rng = self._row_range.get(term)
        if rng is None:
            return []
        lo, hi = rng
        order = np.argsort(self._buckets[lo:hi], kind="stable") + lo
        out = [
            (
                int(self._buckets[i]),
                parse_term_postings(
                    self._blob, int(self._offset[i]), int(self._length[i])
                ),
            )
            for i in order
        ]
        self._parsed[term] = out
        return out

    def postings(self, term: str) -> List[TermPostings]:
        """All bucket blobs for ``term``, in ascending bucket (= doc) order."""
        return [tp for _, tp in self.postings_with_buckets(term)]

    @property
    def has_positions(self) -> bool:
        return self._pos_offset is not None

    def positions_with_buckets(self, term: str) -> List[Tuple[int, np.ndarray]]:
        """(bucket, flat int32 positions) per (term, bucket) run, ascending
        bucket order. The flat array holds each doc's ascending positions
        concatenated in doc order — per-doc slice bounds come from the
        postings' tf column (same sorted rows wrote both streams)."""
        if self._pos_offset is None:
            raise ValueError(
                "index was built without positions "
                "(IndexConfig.positions=True required for phrase queries)"
            )
        rng = self._row_range.get(term)
        if rng is None:
            return []
        if self._pos_blob is None:
            with open(self._pos_path, "rb") as f:
                self._pos_blob = memoryview(f.read())
        lo, hi = rng
        order = np.argsort(self._buckets[lo:hi], kind="stable") + lo
        return [
            (
                int(self._buckets[i]),
                np.frombuffer(
                    self._pos_blob,
                    dtype="<i4",
                    count=int(self._pos_length[i]) // 4,
                    offset=int(self._pos_offset[i]),
                ),
            )
            for i in order
        ]

    @property
    def has_offsets(self) -> bool:
        return self._off_offset is not None

    def offsets_with_buckets(self, term: str) -> List[Tuple[int, np.ndarray]]:
        """(bucket, flat int32 (start, end) pairs) per (term, bucket) run,
        ascending bucket order — occurrence order matches the .pos stream
        (both were written from one lexsort). Per-doc slice bounds come
        from the postings' tf column, width 2*tf int32s per doc."""
        if self._off_offset is None:
            raise ValueError(
                "index was built without offsets "
                "(IndexConfig.offsets=True required for postings-offset "
                "highlighting)"
            )
        rng = self._row_range.get(term)
        if rng is None:
            return []
        if self._off_blob is None:
            with open(self._off_path, "rb") as f:
                self._off_blob = memoryview(f.read())
        lo, hi = rng
        order = np.argsort(self._buckets[lo:hi], kind="stable") + lo
        return [
            (
                int(self._buckets[i]),
                np.frombuffer(
                    self._off_blob,
                    dtype="<i4",
                    count=int(self._off_length[i]) // 4,
                    offset=int(self._off_offset[i]),
                ),
            )
            for i in order
        ]


    @property
    def has_payloads(self) -> bool:
        return self._pay_offset is not None

    def payloads_with_buckets(self, term: str) -> List[Tuple[int, np.ndarray]]:
        """(bucket, flat float32 payloads) per (term, bucket) run,
        ascending bucket order — occurrence order matches the .pos stream
        (both were written from one lexsort). Per-doc slice bounds come
        from the postings' tf column; a missing payload (token without
        delimiter) is NaN."""
        if self._pay_offset is None:
            raise ValueError(
                "index was built without payloads "
                "(IndexConfig.payloads=True required for PayloadScoreQuery)"
            )
        rng = self._row_range.get(term)
        if rng is None:
            return []
        if self._pay_blob is None:
            with open(self._pay_path, "rb") as f:
                self._pay_blob = memoryview(f.read())
        lo, hi = rng
        order = np.argsort(self._buckets[lo:hi], kind="stable") + lo
        return [
            (
                int(self._buckets[i]),
                np.frombuffer(
                    self._pay_blob,
                    dtype="<f4",
                    count=int(self._pay_length[i]) // 4,
                    offset=int(self._pay_offset[i]),
                ),
            )
            for i in order
        ]


def write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic publish (write tmp + rename), the two-phase-commit analogue of
    the reference's segments_N (index/SegmentInfos.java:51-68,
    IndexWriter.java:3632)."""
    tmp = os.path.join(index_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(index_dir, MANIFEST_NAME))


def read_manifest(index_dir: str) -> dict:
    with open(os.path.join(index_dir, MANIFEST_NAME)) as f:
        return json.load(f)
