"""Distributed inverted-index build — the flagship Ray Data pipeline.

    web_pages Dataset
      │ select_columns (drop html early — wide-row rule)
      │ [optional] exact dedup by url              (groupby hash bucket)
      │ map_batches(AnalyzerStage, pyarrow, actor pool)   → posting rows
      │       (term, doc_id, tf, key, bucket, gpart)
      │ groupby("gpart").map_groups(SegmentEncoder)       → segment metadata
      └ driver: sum stats, write manifest (atomic)

Reference lifecycle analogue (SURVEY.md §3.1): addDocument→DWPT invert is the
AnalyzerStage (one analyzer instance per actor ≈ per-thread
TokenStreamComponents, core/.../analysis/Analyzer.java); the DWPT flush +
merge collapse into the single groupby-on-term shuffle (FreqProxTermsWriter
flush sort, index/FreqProxTermsWriter.java:83-97, plus SegmentMerger's k-way
merge, index/SegmentMerger.java:114-147 — unnecessary here because doc IDs
are global before the shuffle); segment files + manifest ≈ .doc/.tim +
segments_N with two-phase commit (index/IndexWriter.java:3632).

Scale design decisions (each marked in-line):
* routing hash is crc32 (process-stable) — never Python ``hash``;
* heavy terms are split by doc-range bucket *before* the shuffle, detected
  from a deterministic sample (split is correctness-neutral, so sampling
  error only shifts work balance — SURVEY.md §7.5.5);
* per-partition checkpoints: an encoder whose ``.done.json`` matches the
  input fingerprint skips re-encoding, making re-runs resumable;
* partial per-batch aggregation happens inside AnalyzerStage (tf counting),
  so the shuffle moves one row per (term, doc) — never one row per token.
"""

from __future__ import annotations

import json
import os
import time
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions.analysis import make_analyzer
from ..functions.hashing import crc32_array
from ..functions.smallfloat import int_to_byte4
from ..state.segment import (
    MANIFEST_NAME,
    SEGMENT_DIR,
    TERMS_SCHEMA,
    encode_term_postings,
    write_manifest,
)

POSTINGS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("key", pa.int32()),
        ("bucket", pa.int32()),
        ("gpart", pa.int32()),
    ]
)

#: positions variant: + per-(term, doc) ascending positions as int32-LE bytes
POSTINGS_POS_SCHEMA = POSTINGS_SCHEMA.append(
    pa.field("positions", pa.binary())
)

#: offsets variant: + per-(term, doc) (start, end) int32-LE pairs in the
#: same per-doc ascending-position order as the positions column
#: (reference: IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS)
POSTINGS_POS_OFF_SCHEMA = POSTINGS_POS_SCHEMA.append(
    pa.field("offsets", pa.binary())
)

#: payloads variant: + per-occurrence float32-LE payloads in the same
#: per-doc ascending-position order as the positions column (reference:
#: the positions stream's per-position payload bytes,
#: codecs/lucene104/Lucene104PostingsWriter.java payload channel)
POSTINGS_POS_PAY_SCHEMA = POSTINGS_POS_SCHEMA.append(
    pa.field("payloads", pa.binary())
)


@dataclass
class IndexConfig:
    analyzer: str = "standard_en"
    norm_kind: str = "byte4"  # "byte4" (reference-faithful) | "exact" (SQL parity)
    num_partitions: int = 16  # term partitions == segments == reduce tasks
    # "groupby": Ray Data sort-based groupby shuffle (in-memory, simple).
    # "files":   external exchange — analyzer tasks append per-partition run
    #            files (Arrow IPC) under <out_dir>/runs/<gpart>/, then one
    #            encode task per partition merges its runs. Mirrors the
    #            reference's DWPT-flush-then-merge (SegmentMerger,
    #            index/SegmentMerger.java:114-147) and scales on shared
    #            storage without an object-store all-to-all.
    exchange: str = "groupby"
    # heavy-term skew split: a term with estimated df > threshold is split by
    # doc-range bucket (doc_id >> bucket_shift) into independent sub-lists
    heavy_df_threshold: Optional[int] = None  # None = no detection pass
    bucket_shift: int = 16  # 65,536 docs per heavy bucket
    sample_rate: float = 0.01  # detection sample (deterministic seed)
    dedup_by_url: bool = False
    text_col: str = "text"
    id_col: str = "doc_id"
    analyzer_concurrency: Optional[int] = None  # None = let Ray size the pool
    analyzer_batch_size: int = 2048
    # emit the (doc_id, doc_len, norm) doc_map sidecar from the build's own
    # analyzer pass (one analysis pass, not two — VERDICT r1 #5); files land
    # under <out_dir>/docmap/ with deterministic atomic names
    emit_doc_map: bool = True
    # index positions: per (term, doc) the token positions (StopFilter
    # increments preserved) ride the shuffle as a binary column and land in
    # a per-segment .pos sidecar — enables PhraseQuery
    # (reference: IndexOptions.DOCS_AND_FREQS_AND_POSITIONS,
    # Lucene104PostingsWriter.java:237-298 positions stream)
    positions: bool = False
    # index character offsets: per occurrence a (start, end) surface span
    # rides next to the positions column into a .off sidecar — highlight
    # reads matches straight off the index instead of re-analyzing text
    # (reference: IndexOptions.DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS,
    # UnifiedHighlighter's OffsetSource.POSTINGS). Requires positions.
    offsets: bool = False
    # index per-position payloads: one float32 per occurrence rides next
    # to the positions column into a .pay sidecar — PayloadScoreQuery
    # reads term weights straight off the index (reference: the postings
    # payload channel + queries/payloads/PayloadScoreQuery.java). The
    # analyzer must expose analyze_payloads (e.g. "whitespace_payload",
    # the DelimitedPayloadTokenFilter analogue). Requires positions;
    # mutually exclusive with offsets (no analyzer produces both streams).
    payloads: bool = False


class AnalyzerStage:
    """Stateful actor: analysis chain compiled once per worker; per batch it
    emits one posting row per (term, doc) with tf pre-aggregated (the
    partial-aggregation rule: the shuffle never sees individual tokens).

    The emission path is vectorized: tokens are dictionary-encoded once per
    batch, (doc, term) pairs are counted with one ``np.unique`` over packed
    int keys, and per-term hash/heavy flags are computed once per *vocab
    entry* (memoized across batches — the Zipf head costs nothing after the
    first batch), never once per posting."""

    def __init__(self, cfg: IndexConfig, heavy_terms: Optional[Set[str]] = None,
                 doc_map_dir: Optional[str] = None):
        self.cfg = cfg
        self.analyzer = make_analyzer(cfg.analyzer)
        self.heavy = heavy_terms or set()
        self.byte4 = cfg.norm_kind == "byte4"
        self.doc_map_dir = doc_map_dir
        # term -> (crc32, is_heavy), grown lazily per actor
        self._term_meta: Dict[str, tuple] = {}

    def _empty(self) -> pa.Table:
        if self.cfg.offsets:
            return POSTINGS_POS_OFF_SCHEMA.empty_table()
        if self.cfg.payloads:
            return POSTINGS_POS_PAY_SCHEMA.empty_table()
        if self.cfg.positions:
            return POSTINGS_POS_SCHEMA.empty_table()
        return POSTINGS_SCHEMA.empty_table()

    def _write_doc_map(self, doc_ids: np.ndarray, lens: np.ndarray) -> None:
        """Side output of the analysis pass: one (doc_id, doc_len, norm)
        parquet per batch. Deterministic content-derived name + tmp/replace
        makes retries overwrite rather than duplicate (same discipline as
        RunWriter)."""
        import zlib

        import pyarrow.parquet as pq

        if len(doc_ids) == 0:
            return
        ids64 = np.ascontiguousarray(doc_ids, dtype=np.int64)
        norms = int_to_byte4(lens).astype(np.int64) if self.byte4 else lens
        tbl = pa.table(
            {
                "doc_id": pa.array(ids64),
                "doc_len": pa.array(lens.astype(np.int64)),
                "norm": pa.array(norms.astype(np.int64)),
            }
        )
        crc = zlib.crc32(ids64.tobytes())
        name = f"dm-{int(ids64.min())}-{int(ids64.max())}-{len(ids64)}-{crc:08x}.parquet"
        os.makedirs(self.doc_map_dir, exist_ok=True)
        path = os.path.join(self.doc_map_dir, name)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    def __call__(self, batch: pa.Table) -> pa.Table:
        import itertools
        import zlib

        cfg = self.cfg
        texts = batch.column(cfg.text_col).to_pylist()
        doc_ids = batch.column(cfg.id_col).to_numpy()
        pos_lists: Optional[List[List[int]]] = None
        off_lists: Optional[List[tuple]] = None
        pay_lists: Optional[List[List[float]]] = None
        if cfg.offsets:
            analyze_o = self.analyzer.analyze_offsets
            quads = [analyze_o(t) if t else ([], [], [], []) for t in texts]
            term_lists = [qd[0] for qd in quads]
            pos_lists = [qd[1] for qd in quads]
            off_lists = [(qd[2], qd[3]) for qd in quads]
        elif cfg.payloads:
            analyze_pp = self.analyzer.analyze_payloads
            trips = [analyze_pp(t) if t else ([], [], []) for t in texts]
            term_lists = [tr[0] for tr in trips]
            pos_lists = [tr[1] for tr in trips]
            pay_lists = [tr[2] for tr in trips]
        elif cfg.positions:
            analyze_p = self.analyzer.analyze_positions
            pairs_tp = [analyze_p(t) if t else ([], []) for t in texts]
            term_lists = [tp[0] for tp in pairs_tp]
            pos_lists = [tp[1] for tp in pairs_tp]
        else:
            analyze = self.analyzer.analyze
            term_lists = [analyze(t) if t else [] for t in texts]
        lens = np.fromiter(
            (len(x) for x in term_lists), dtype=np.int64, count=len(term_lists)
        )
        if self.doc_map_dir is not None:
            self._write_doc_map(doc_ids, lens)
        total = int(lens.sum())
        if total == 0:
            return self._empty()
        flat = pa.array(
            list(itertools.chain.from_iterable(term_lists)), pa.string()
        )
        denc = flat.dictionary_encode()
        codes = denc.indices.to_numpy().astype(np.int64)
        vocab: List[str] = denc.dictionary.to_pylist()
        nv = len(vocab)

        # one (doc, term) row per unique pair, tf = pair multiplicity
        doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
        pair = doc_idx * nv + codes
        uniq, tfs = np.unique(pair, return_counts=True)
        u_doc = uniq // nv
        u_code = uniq % nv

        pos_col = None
        off_col = None
        pay_col = None
        if pos_lists is not None:
            # per-(doc, term) ascending positions, packed int32-LE binary;
            # np.unique's ascending pair order == lexsort's primary order,
            # so slices line up with (uniq, tfs) row-for-row
            pos_flat = np.fromiter(
                itertools.chain.from_iterable(pos_lists),
                dtype=np.int32,
                count=total,
            )
            order = np.lexsort((pos_flat, pair))
            pos_sorted = np.ascontiguousarray(pos_flat[order], dtype="<i4")
            offsets = (
                np.concatenate(([0], np.cumsum(tfs))) * 4
            ).astype(np.int32)
            pos_col = pa.BinaryArray.from_buffers(
                pa.binary(),
                len(uniq),
                [
                    None,
                    pa.py_buffer(offsets.tobytes()),
                    pa.py_buffer(pos_sorted.tobytes()),
                ],
            )
            if off_lists is not None:
                # (start, end) int32 pairs in the SAME occurrence order as
                # the positions column (one lexsort serves both streams)
                st_flat = np.fromiter(
                    itertools.chain.from_iterable(s for s, _ in off_lists),
                    dtype=np.int32, count=total,
                )
                en_flat = np.fromiter(
                    itertools.chain.from_iterable(e for _, e in off_lists),
                    dtype=np.int32, count=total,
                )
                inter = np.empty(2 * total, dtype="<i4")
                inter[0::2] = st_flat[order]
                inter[1::2] = en_flat[order]
                off_offsets = (
                    np.concatenate(([0], np.cumsum(tfs))) * 8
                ).astype(np.int32)
                off_col = pa.BinaryArray.from_buffers(
                    pa.binary(),
                    len(uniq),
                    [
                        None,
                        pa.py_buffer(off_offsets.tobytes()),
                        pa.py_buffer(np.ascontiguousarray(inter).tobytes()),
                    ],
                )
            if pay_lists is not None:
                # float32 payloads in the SAME occurrence order as the
                # positions column (one lexsort serves both streams)
                pay_flat = np.fromiter(
                    itertools.chain.from_iterable(pay_lists),
                    dtype=np.float32, count=total,
                )
                pay_sorted = np.ascontiguousarray(
                    pay_flat[order], dtype="<f4"
                )
                pay_offsets = (
                    np.concatenate(([0], np.cumsum(tfs))) * 4
                ).astype(np.int32)
                pay_col = pa.BinaryArray.from_buffers(
                    pa.binary(),
                    len(uniq),
                    [
                        None,
                        pa.py_buffer(pay_offsets.tobytes()),
                        pa.py_buffer(pay_sorted.tobytes()),
                    ],
                )

        keys_doc = (
            int_to_byte4(lens).astype(np.int64) if self.byte4 else lens
        )
        out_docs = doc_ids[u_doc].astype(np.int64)
        out_keys = keys_doc[u_doc].astype(np.int32)

        # per-vocab-entry hash + heavy flag (memoized across batches)
        meta = self._term_meta
        heavy_set = self.heavy
        crc = zlib.crc32
        vhash = np.empty(nv, dtype=np.int64)
        vheavy = np.zeros(nv, dtype=bool)
        for j, t in enumerate(vocab):
            m = meta.get(t)
            if m is None:
                m = (crc(t.encode("utf-8")), t in heavy_set)
                meta[t] = m
            vhash[j] = m[0]
            vheavy[j] = m[1]

        if heavy_set:
            bucket = np.where(
                vheavy[u_code], out_docs >> cfg.bucket_shift, 0
            ).astype(np.int32)
        else:
            bucket = np.zeros(len(uniq), dtype=np.int32)
        gpart = ((vhash[u_code] + bucket) % cfg.num_partitions).astype(np.int32)
        terms_out = pc.take(denc.dictionary, pa.array(u_code, pa.int64()))
        cols = {
            "term": terms_out,
            "doc_id": pa.array(out_docs),
            "tf": pa.array(tfs.astype(np.int32)),
            "key": pa.array(out_keys),
            "bucket": pa.array(bucket),
            "gpart": pa.array(gpart),
        }
        if off_col is not None:
            cols["positions"] = pos_col
            cols["offsets"] = off_col
            return pa.table(cols, schema=POSTINGS_POS_OFF_SCHEMA)
        if pay_col is not None:
            cols["positions"] = pos_col
            cols["payloads"] = pay_col
            return pa.table(cols, schema=POSTINGS_POS_PAY_SCHEMA)
        if pos_col is not None:
            cols["positions"] = pos_col
            return pa.table(cols, schema=POSTINGS_POS_SCHEMA)
        return pa.table(cols, schema=POSTINGS_SCHEMA)


class DocMapStage:
    """Per-doc metadata column pass: analyzed length + norm key — the
    norms/stored-fields sidecar (SURVEY.md §1.2 doc_map; reference:
    Similarity.computeNorm per doc, Similarity.java:153-163, and the
    stored-fields column files). One vectorized map_batches over the
    corpus; written as partitioned Parquet next to the segments when
    requested."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.analyzer = make_analyzer(cfg.analyzer)
        self.byte4 = cfg.norm_kind == "byte4"

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        texts = batch.column(cfg.text_col).to_pylist()
        analyze = self.analyzer.analyze
        lens = np.fromiter(
            (len(analyze(t)) if t else 0 for t in texts),
            dtype=np.int64,
            count=len(texts),
        )
        norms = int_to_byte4(lens).astype(np.int64) if self.byte4 else lens
        return pa.table(
            {
                "doc_id": batch.column(cfg.id_col),
                "doc_len": pa.array(lens),
                "norm": pa.array(norms),
            }
        )


def build_doc_map(ds, cfg: Optional[IndexConfig] = None):
    """-> Dataset(doc_id, doc_len, norm) for every input doc (docs that
    analyze to nothing get doc_len 0), streaming, no shuffle."""
    cfg = cfg or IndexConfig()
    return ds.select_columns([cfg.id_col, cfg.text_col]).map_batches(
        DocMapStage(cfg),
        batch_format="pyarrow",
        batch_size=cfg.analyzer_batch_size,
        concurrency=cfg.analyzer_concurrency,
    )


class DfSampleStage:
    """Detection pass for heavy terms: per-batch distinct-doc counts per term
    over a sample — one (term, partial df) row per term per batch, then a tiny
    groupby sums the partials (pre-aggregate before shuffle rule)."""

    def __init__(self, cfg: IndexConfig):
        self.cfg = cfg
        self.analyzer = make_analyzer(cfg.analyzer)

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.cfg.text_col).to_pylist()
        counts: Counter = Counter()
        analyze = self.analyzer.analyze
        for text in texts:
            if text:
                counts.update(set(analyze(text)))
        return pa.table(
            {
                "term": pa.array(list(counts.keys()), pa.string()),
                "df_part": pa.array(
                    np.fromiter(counts.values(), dtype=np.int64, count=len(counts))
                ),
            }
        )


def detect_heavy_terms(ds, cfg: IndexConfig) -> Set[str]:
    """Estimate per-term df from a deterministic sample; return terms whose
    extrapolated df exceeds the threshold. False negatives/positives only
    affect balance, never correctness."""
    assert cfg.heavy_df_threshold is not None
    sample = ds if cfg.sample_rate >= 1.0 else ds.random_sample(
        cfg.sample_rate, seed=42
    )
    partial = sample.map_batches(
        DfSampleStage(cfg),
        batch_format="pyarrow",
        batch_size=cfg.analyzer_batch_size,
        concurrency=cfg.analyzer_concurrency,
    )
    agg = partial.groupby("term").aggregate(ray.data.aggregate.Sum("df_part"))
    cutoff = cfg.heavy_df_threshold * min(max(cfg.sample_rate, 1e-9), 1.0)

    def over_cutoff(b: pa.Table) -> pa.Table:
        return b.filter(pc.greater_equal(b.column("sum(df_part)"), cutoff))

    # filter before the driver sees it — only heavy terms (few) come back
    heavy_tbl = agg.map_batches(over_cutoff, batch_format="pyarrow").take_all()
    return {r["term"] for r in heavy_tbl}


class SegmentEncoder:
    """Reduce task: one term-partition group -> one segment on disk.

    Vectorized within the group: one pyarrow sort by (term, bucket, doc_id),
    then numpy run-length slicing per (term, bucket); each run is FOR/PFor
    encoded with skip + impact metadata (functions/codec.py, state/segment.py).
    Writes are atomic (tmp + rename); a matching ``.done.json`` checkpoint
    short-circuits the work on resume.
    """

    def __init__(self, out_dir: str, fingerprint: str):
        self.seg_dir = os.path.join(out_dir, SEGMENT_DIR)
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        t0 = time.time()
        if len(group) == 0:
            return _meta_row(
                {"gpart": -1, "num_terms": 0, "num_term_buckets": 0,
                 "num_postings": 0, "sum_tf": 0, "blob_bytes": 0,
                 "doc_min": 0, "doc_max": -1, "wall_sec": 0.0}
            ).slice(0, 0)
        gpart = int(group.column("gpart")[0].as_py())
        base = os.path.join(self.seg_dir, f"seg-{gpart:05d}")
        done_path = base + ".done.json"
        if os.path.exists(done_path):
            with open(done_path) as f:
                meta = json.load(f)
            if meta.get("fingerprint") == self.fingerprint:
                meta["resumed"] = True
                return _meta_row(meta)
        group = group.sort_by(
            [("term", "ascending"), ("bucket", "ascending"), ("doc_id", "ascending")]
        )
        terms_dict = group.column("term").combine_chunks().dictionary_encode()
        term_codes = terms_dict.indices.to_numpy()
        term_values = terms_dict.dictionary.to_pylist()
        buckets = group.column("bucket").to_numpy()
        doc_ids = group.column("doc_id").to_numpy()
        tfs = group.column("tf").to_numpy()
        keys = group.column("key").to_numpy()
        has_pos = "positions" in group.schema.names
        has_off = "offsets" in group.schema.names
        if has_pos:
            from ..util import binary_flat_i32

            pos_flat, pos_lens = binary_flat_i32(group.column("positions"))
            pos_row_starts = np.concatenate(([0], np.cumsum(pos_lens)))
        if has_off:
            from ..util import binary_flat_i32

            off_flat, off_lens = binary_flat_i32(group.column("offsets"))
            off_row_starts = np.concatenate(([0], np.cumsum(off_lens)))
        has_pay = "payloads" in group.schema.names
        if has_pay:
            from ..util import binary_flat_i32

            # payload bytes are float32-LE; binary_flat_i32 only moves
            # bytes (same width), so the reinterpret is lossless
            pay_flat, pay_lens = binary_flat_i32(group.column("payloads"))
            pay_row_starts = np.concatenate(([0], np.cumsum(pay_lens)))

        # run boundaries where (term, bucket) changes
        change = np.empty(len(term_codes), dtype=bool)
        change[0] = True
        np.logical_or(
            term_codes[1:] != term_codes[:-1],
            buckets[1:] != buckets[:-1],
            out=change[1:],
        )
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(term_codes))

        blob = bytearray()
        pos_blob = bytearray()
        off_blob = bytearray()
        pay_blob = bytearray()
        rows_payoff: List[int] = []
        rows_paylen: List[int] = []
        rows_term: List[str] = []
        rows_bucket: List[int] = []
        rows_df: List[int] = []
        rows_ttf: List[int] = []
        rows_maxtf: List[int] = []
        rows_off: List[int] = []
        rows_len: List[int] = []
        rows_poff: List[int] = []
        rows_plen: List[int] = []
        rows_ooff: List[int] = []
        rows_olen: List[int] = []
        for lo, hi in zip(starts, ends):
            off, length = encode_term_postings(
                blob, doc_ids[lo:hi], tfs[lo:hi], keys[lo:hi]
            )
            rows_term.append(term_values[term_codes[lo]])
            rows_bucket.append(int(buckets[lo]))
            rows_df.append(hi - lo)
            rows_ttf.append(int(tfs[lo:hi].sum()))
            rows_maxtf.append(int(tfs[lo:hi].max()))
            rows_off.append(off)
            rows_len.append(length)
            if has_pos:
                s, e = int(pos_row_starts[lo]), int(pos_row_starts[hi])
                rows_poff.append(len(pos_blob))
                pos_blob.extend(
                    np.ascontiguousarray(pos_flat[s:e], dtype="<i4").tobytes()
                )
                rows_plen.append((e - s) * 4)
            if has_off:
                s, e = int(off_row_starts[lo]), int(off_row_starts[hi])
                rows_ooff.append(len(off_blob))
                off_blob.extend(
                    np.ascontiguousarray(off_flat[s:e], dtype="<i4").tobytes()
                )
                rows_olen.append((e - s) * 4)
            if has_pay:
                s, e = int(pay_row_starts[lo]), int(pay_row_starts[hi])
                rows_payoff.append(len(pay_blob))
                pay_blob.extend(
                    np.ascontiguousarray(pay_flat[s:e], dtype="<i4").tobytes()
                )
                rows_paylen.append((e - s) * 4)

        os.makedirs(self.seg_dir, exist_ok=True)
        tmp = base + ".post.tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, base + ".post")
        if has_pos:
            tmp = base + ".pos.tmp"
            with open(tmp, "wb") as f:
                f.write(pos_blob)
            os.replace(tmp, base + ".pos")
        if has_off:
            tmp = base + ".off.tmp"
            with open(tmp, "wb") as f:
                f.write(off_blob)
            os.replace(tmp, base + ".off")
        if has_pay:
            tmp = base + ".pay.tmp"
            with open(tmp, "wb") as f:
                f.write(pay_blob)
            os.replace(tmp, base + ".pay")
        cols = {
            "term": pa.array(rows_term, pa.string()),
            "bucket": pa.array(rows_bucket, pa.int32()),
            "doc_freq": pa.array(rows_df, pa.int64()),
            "total_tf": pa.array(rows_ttf, pa.int64()),
            "max_tf": pa.array(rows_maxtf, pa.int32()),
            "offset": pa.array(rows_off, pa.int64()),
            "length": pa.array(rows_len, pa.int64()),
        }
        schema = TERMS_SCHEMA
        if has_pos:
            cols["pos_offset"] = pa.array(rows_poff, pa.int64())
            cols["pos_length"] = pa.array(rows_plen, pa.int64())
            schema = TERMS_SCHEMA.append(
                pa.field("pos_offset", pa.int64())
            ).append(pa.field("pos_length", pa.int64()))
        if has_off:
            cols["off_offset"] = pa.array(rows_ooff, pa.int64())
            cols["off_length"] = pa.array(rows_olen, pa.int64())
            schema = schema.append(
                pa.field("off_offset", pa.int64())
            ).append(pa.field("off_length", pa.int64()))
        if has_pay:
            cols["pay_offset"] = pa.array(rows_payoff, pa.int64())
            cols["pay_length"] = pa.array(rows_paylen, pa.int64())
            schema = schema.append(
                pa.field("pay_offset", pa.int64())
            ).append(pa.field("pay_length", pa.int64()))
        terms_tbl = pa.table(cols, schema=schema)
        import pyarrow.parquet as pq

        tmp = base + ".terms.parquet.tmp"
        pq.write_table(terms_tbl, tmp)
        os.replace(tmp, base + ".terms.parquet")
        import zlib

        meta = {
            "gpart": gpart,
            "num_terms": len(set(rows_term)),
            "num_term_buckets": len(rows_term),
            "num_postings": int(len(doc_ids)),
            "sum_tf": int(tfs.sum()),
            "doc_min": int(doc_ids.min()),
            "doc_max": int(doc_ids.max()),
            "blob_bytes": len(blob),
            # per-file integrity (CodecUtil CRC32 footer analogue,
            # codecs/CodecUtil.java) — validated by state/checkindex.py
            "post_crc32": zlib.crc32(bytes(blob)),
            "pos_crc32": zlib.crc32(bytes(pos_blob)) if has_pos else -1,
            "off_crc32": zlib.crc32(bytes(off_blob)) if has_off else -1,
            "pay_crc32": zlib.crc32(bytes(pay_blob)) if has_pay else -1,
            "wall_sec": round(time.time() - t0, 3),
            "fingerprint": self.fingerprint,  # lineage: ties segment to input
            "resumed": False,
        }
        tmp = done_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, done_path)
        return _meta_row(meta)


def _meta_row(meta: dict) -> pa.Table:
    return pa.table(
        {
            "gpart": pa.array([meta["gpart"]], pa.int32()),
            "num_terms": pa.array([meta["num_terms"]], pa.int64()),
            "num_term_buckets": pa.array([meta["num_term_buckets"]], pa.int64()),
            "num_postings": pa.array([meta["num_postings"]], pa.int64()),
            "sum_tf": pa.array([meta["sum_tf"]], pa.int64()),
            "doc_min": pa.array([meta.get("doc_min", 0)], pa.int64()),
            "doc_max": pa.array([meta.get("doc_max", -1)], pa.int64()),
            "blob_bytes": pa.array([meta["blob_bytes"]], pa.int64()),
            "post_crc32": pa.array([int(meta.get("post_crc32", -1))], pa.int64()),
            "pos_crc32": pa.array([int(meta.get("pos_crc32", -1))], pa.int64()),
            "wall_sec": pa.array([float(meta["wall_sec"])], pa.float64()),
            "resumed": pa.array([bool(meta.get("resumed", False))], pa.bool_()),
        }
    )


RUNS_DIR = "runs"
DOC_MAP_DIR = "docmap"


def read_doc_map(index_dir: str):
    """-> Dataset(doc_id, doc_len, norm) from the build's sidecar (written by
    the analyzer pass when ``cfg.emit_doc_map``), or None if absent."""
    import glob

    files = sorted(glob.glob(os.path.join(index_dir, DOC_MAP_DIR, "*.parquet")))
    if not files:
        return None
    return ray.data.read_parquet(files)


class RunWriter:
    """Map-side of the file exchange: split each postings batch by gpart and
    append one Arrow IPC run file per partition. Run files are transient
    scratch (cleared at build start, deleted after encode); the durable
    resume unit stays the per-segment checkpoint.

    Idempotent + atomic writes: the file name is derived deterministically
    from the slice's content (doc range + row count + content crc), and the
    file lands via tmp + ``os.replace``. A Ray task that fails mid-batch and
    is retried re-derives the same names and overwrites rather than adds —
    no duplicated postings (doubled df/tf) and no partially-written feather
    file can survive into the merge."""

    def __init__(self, run_root: str):
        self.run_root = run_root

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        import pyarrow.feather as feather

        gparts = batch.column("gpart").to_numpy()
        order = np.argsort(gparts, kind="stable")
        sorted_batch = batch.take(pa.array(order))
        sg = sorted_batch.column("gpart").to_numpy()
        sdocs = sorted_batch.column("doc_id").to_numpy()
        stfs = sorted_batch.column("tf").to_numpy()
        bounds = np.flatnonzero(np.diff(sg)) + 1
        starts = np.concatenate(([0], bounds))
        ends = np.concatenate((bounds, [len(sg)]))
        out_g: List[int] = []
        out_rows: List[int] = []
        for lo, hi in zip(starts, ends):
            if hi <= lo:
                continue
            g = int(sg[lo])
            gdir = os.path.join(self.run_root, f"{g:05d}")
            os.makedirs(gdir, exist_ok=True)
            d = sdocs[lo:hi]
            crc = zlib.crc32(
                np.ascontiguousarray(stfs[lo:hi], dtype=np.int64).tobytes(),
                zlib.crc32(np.ascontiguousarray(d, dtype=np.int64).tobytes()),
            )
            name = f"run-{int(d.min())}-{int(d.max())}-{hi - lo}-{crc:08x}"
            path = os.path.join(gdir, name + ".arrow")
            tmp = path + ".tmp"
            feather.write_feather(
                sorted_batch.slice(lo, hi - lo), tmp, compression="lz4"
            )
            os.replace(tmp, path)
            out_g.append(g)
            out_rows.append(hi - lo)
        return pa.table(
            {
                "gpart": pa.array(out_g, pa.int32()),
                "rows": pa.array(out_rows, pa.int64()),
            }
        )


def _merge_runs_encode(run_root: str, encoder: "SegmentEncoder", gpart: int
                       ) -> pa.Table:
    """Reduce-side: concat all run files of one partition and encode."""
    import glob

    import pyarrow.feather as feather

    files = sorted(glob.glob(os.path.join(run_root, f"{gpart:05d}", "run-*.arrow")))
    if not files:
        return encoder(POSTINGS_SCHEMA.empty_table())
    tables = [feather.read_table(f) for f in files]
    return encoder(pa.concat_tables(tables))


def dedup_exact_by_url(ds, url_col: str = "url", ts_col: str = "warc_ts",
                       num_buckets: int = 64):
    """Keep the earliest (warc_ts, then url) row per url. Shuffles by a crc32
    bucket of the url, then dedups vectorized inside each group — per-group
    Python overhead is O(num_buckets), not O(num_urls) (reference analogue:
    updateDocument-by-unique-term, index/IndexWriter.java:1845)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = crc32_array(batch.column(url_col).to_pylist()) % num_buckets
        return batch.append_column("_ubucket", pa.array(b.astype(np.int32)))

    def dedup_group(group: pa.Table) -> pa.Table:
        group = group.sort_by([(url_col, "ascending"), (ts_col, "ascending")])
        urls = group.column(url_col)
        keep = np.empty(len(group), dtype=bool)
        keep[0] = True
        eq = pc.equal(urls.slice(1), urls.slice(0, len(group) - 1))
        keep[1:] = ~eq.combine_chunks().to_numpy(zero_copy_only=False)
        return group.filter(pa.array(keep)).drop_columns(["_ubucket"])

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_ubucket")
        .map_groups(dedup_group, batch_format="pyarrow")
    )


def build_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    cfg: Optional[IndexConfig] = None,
    doc_count: Optional[int] = None,
    heavy_terms: Optional[Set[str]] = None,
) -> dict:
    """Run the full build over ``ds`` (web_pages-shaped) and return the
    manifest. Resumable: re-running with the same input fingerprint skips
    completed segments via their checkpoints. Pass ``doc_count`` when known
    (e.g. from parquet metadata) to avoid an extra counting execution, and
    ``heavy_terms`` to reuse a prior detection pass (e.g. term stats from an
    earlier build of the same corpus) instead of sampling here."""
    cfg = cfg or IndexConfig()
    if cfg.offsets and not cfg.positions:
        raise ValueError(
            "offsets=True requires positions=True "
            "(DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS)"
        )
    if cfg.payloads and not cfg.positions:
        raise ValueError(
            "payloads=True requires positions=True "
            "(payloads ride the positions stream)"
        )
    if cfg.payloads and cfg.offsets:
        raise ValueError(
            "payloads=True is mutually exclusive with offsets=True "
            "(no analyzer produces both streams)"
        )
    os.makedirs(os.path.join(out_dir, SEGMENT_DIR), exist_ok=True)
    t0 = time.time()

    if cfg.dedup_by_url:
        ds = dedup_exact_by_url(ds)
        doc_count = None  # unknown after dedup
    ds = ds.select_columns([cfg.id_col, cfg.text_col])

    if doc_count is None:
        doc_count = ds.count()
    fingerprint = (
        f"docs={doc_count};analyzer={cfg.analyzer};norm={cfg.norm_kind};"
        f"parts={cfg.num_partitions}"
        + (";pos=1" if cfg.positions else "")
        + (";off=1" if cfg.offsets else "")
        + (";pay=1" if cfg.payloads else "")
    )

    heavy: Set[str] = set(heavy_terms) if heavy_terms is not None else set()
    if heavy_terms is None and cfg.heavy_df_threshold is not None:
        heavy = detect_heavy_terms(ds, cfg)

    doc_map_dir = None
    if cfg.emit_doc_map:
        import shutil

        doc_map_dir = os.path.join(out_dir, DOC_MAP_DIR)
        shutil.rmtree(doc_map_dir, ignore_errors=True)
        os.makedirs(doc_map_dir, exist_ok=True)

    postings = ds.map_batches(
        AnalyzerStage(cfg, heavy or None, doc_map_dir),
        batch_format="pyarrow",
        batch_size=cfg.analyzer_batch_size,
        concurrency=cfg.analyzer_concurrency,
    )
    encoder = SegmentEncoder(out_dir, fingerprint)

    if cfg.exchange == "files":
        import shutil

        run_root = os.path.join(out_dir, RUNS_DIR)
        shutil.rmtree(run_root, ignore_errors=True)
        os.makedirs(run_root, exist_ok=True)
        # barrier #1: every analyzer task appends its per-partition runs
        postings.map_batches(RunWriter(run_root), batch_format="pyarrow").count()
        # one merge+encode task per partition (no object-store all-to-all)
        parts_ds = ray.data.range(
            cfg.num_partitions, override_num_blocks=cfg.num_partitions
        )

        def encode_part(batch: pa.Table) -> pa.Table:
            outs = [
                _merge_runs_encode(run_root, encoder, int(g))
                for g in batch.column("id").to_pylist()
            ]
            return pa.concat_tables(outs)

        meta = parts_ds.map_batches(
            encode_part, batch_format="pyarrow", batch_size=1
        ).take_all()
        shutil.rmtree(run_root, ignore_errors=True)
    else:

        def encode_group(group: pa.Table) -> pa.Table:
            return encoder(group)

        encoded = postings.groupby("gpart").map_groups(
            encode_group, batch_format="pyarrow"
        )
        meta = encoded.take_all()  # P small rows
    build_sec = time.time() - t0

    segments = sorted(
        (
            {
                "gpart": int(r["gpart"]),
                "num_terms": int(r["num_terms"]),
                "num_term_buckets": int(r["num_term_buckets"]),
                "num_postings": int(r["num_postings"]),
                "sum_tf": int(r["sum_tf"]),
                "doc_min": int(r["doc_min"]),
                "doc_max": int(r["doc_max"]),
                "blob_bytes": int(r["blob_bytes"]),
                "post_crc32": int(r.get("post_crc32", -1)),
                "pos_crc32": int(r.get("pos_crc32", -1)),
                "wall_sec": float(r["wall_sec"]),
                "resumed": bool(r["resumed"]),
            }
            for r in meta
        ),
        key=lambda s: s["gpart"],
    )
    manifest = {
        "version": 1,
        "analyzer": cfg.analyzer,
        "norm_kind": cfg.norm_kind,
        "positions": bool(cfg.positions),
        "offsets": bool(cfg.offsets),
        "payloads": bool(cfg.payloads),
        "num_partitions": cfg.num_partitions,
        "bucket_shift": cfg.bucket_shift,
        "heavy_terms": sorted(heavy),
        "doc_count": int(doc_count),
        "sum_total_tf": int(sum(s["sum_tf"] for s in segments)),
        "num_postings": int(sum(s["num_postings"] for s in segments)),
        "doc_min": int(min((s["doc_min"] for s in segments if s["doc_max"] >= 0), default=0)),
        "doc_max": int(max((s["doc_max"] for s in segments), default=-1)),
        "fingerprint": fingerprint,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(doc_count / build_sec, 1) if build_sec > 0 else None,
        "segments": segments,
    }
    write_manifest(out_dir, manifest)
    return manifest
