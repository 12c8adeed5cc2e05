"""IndexReader: manifest + all segments of one index, query-side view.

Reference analogue: index/DirectoryReader + search/IndexSearcher's view of
per-leaf Terms/ImpactsEnum plus the *global* CollectionStatistics /
TermStatistics (core/src/java/org/apache/lucene/search/IndexSearcher.java —
stats gathered across all segments before scoring, see createWeight path).

Our segments are term-partitioned: a normal term lives in exactly one
segment (``crc32(term) % num_partitions``). A *heavy* term (split at build
time by doc-range bucket, SURVEY.md §7.4) has bucket b routed to partition
``(crc32(term) + b) % num_partitions`` — the reader learns the heavy set
from the manifest, gathers that term's rows from every segment, and
concatenates them in ascending bucket order, which restores global docID
order. Global stats (doc_count, sum_total_tf) come from the manifest; they
were aggregated at build time, so no query-time pass is needed.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

from ..functions.hashing import crc32_bucket
from .segment import SEGMENT_DIR, SegmentReader, TermPostings, read_manifest


class IndexReader:
    def __init__(self, index_dir: str):
        from .deletes import read_deletes

        self.index_dir = index_dir
        self.manifest = read_manifest(index_dir)
        # liveDocs tombstones: filtered out of every decoded posting slice;
        # stats keep deleted docs until compaction (reference pre-merge
        # semantics, index/SegmentReader.java liveDocs)
        self.deleted = read_deletes(index_dir)
        self.doc_count: int = self.manifest["doc_count"]
        self.sum_total_tf: int = self.manifest["sum_total_tf"]
        self.norm_kind: str = self.manifest["norm_kind"]
        self.analyzer_name: str = self.manifest["analyzer"]
        self.num_partitions: int = self.manifest["num_partitions"]
        self.heavy_terms = frozenset(self.manifest.get("heavy_terms", ()))
        self.avgdl = self.sum_total_tf / max(self.doc_count, 1)
        self._seg_dir = os.path.join(index_dir, SEGMENT_DIR)
        self._segments: Dict[int, Optional[SegmentReader]] = {}

    def _segment(self, gpart: int) -> Optional[SegmentReader]:
        if gpart in self._segments:
            return self._segments[gpart]
        seg: Optional[SegmentReader] = None
        if os.path.exists(
            os.path.join(self._seg_dir, f"seg-{gpart:05d}.terms.parquet")
        ):
            seg = SegmentReader(self._seg_dir, gpart)
        self._segments[gpart] = seg
        return seg

    def _segments_for(self, term: str) -> List[SegmentReader]:
        if term in self.heavy_terms:
            segs = [self._segment(g) for g in range(self.num_partitions)]
            return [s for s in segs if s is not None]
        seg = self._segment(crc32_bucket(term, self.num_partitions))
        return [seg] if seg is not None else []

    def term_stats(self, term: str) -> Tuple[int, int]:
        """(doc_freq, total_tf) across the whole index; (0, 0) if absent."""
        df = ttf = 0
        for seg in self._segments_for(term):
            st = seg.term_stats(term)
            if st is not None:
                df += st[0]
                ttf += st[1]
        return df, ttf

    def postings(self, term: str) -> List[TermPostings]:
        """All bucket blobs for ``term`` across segments, ascending bucket
        (= ascending global doc range) order."""
        tagged: List[Tuple[int, TermPostings]] = []
        for seg in self._segments_for(term):
            tagged.extend(seg.postings_with_buckets(term))
        tagged.sort(key=lambda bt: bt[0])
        return [tp for _, tp in tagged]

    def all_terms(self) -> List[str]:
        out: List[str] = []
        for g in range(self.num_partitions):
            seg = self._segment(g)
            if seg is not None:
                out.extend(seg.terms())
        return sorted(set(out))

    @property
    def has_positions(self) -> bool:
        return bool(self.manifest.get("positions", False))

    @property
    def has_offsets(self) -> bool:
        return bool(self.manifest.get("offsets", False))

    def all_doc_ids(self):
        """Sorted doc IDs of every indexed doc (MatchAllDocsQuery /
        liveDocs-universe enumeration): from the doc_map sidecar when the
        build emitted one; otherwise the dense [0, doc_count) assumption
        (true for all corpus-rooted builds; incremental shards always have
        the sidecar)."""
        import glob

        import numpy as np

        cached = self.__dict__.get("_all_doc_ids")
        if cached is not None:
            return cached
        files = sorted(
            glob.glob(os.path.join(self.index_dir, "docmap", "*.parquet"))
        )
        if files:
            import pyarrow.parquet as pq

            ids = np.sort(
                np.concatenate(
                    [
                        pq.read_table(f, columns=["doc_id"])
                        .column("doc_id")
                        .to_numpy()
                        for f in files
                    ]
                ).astype(np.int64)
            )
        else:
            ids = np.arange(int(self.doc_count), dtype=np.int64)
        self.__dict__["_all_doc_ids"] = ids
        return ids

    def term_positions(self, term: str):
        """-> (docs:int64, tfs:int64, flat_positions:int32) in global doc
        order; flat positions are each doc's ascending positions
        concatenated, with per-doc slice widths given by ``tfs``."""
        import numpy as np

        tagged = []
        for seg in self._segments_for(term):
            pos_by_bucket = dict(seg.positions_with_buckets(term))
            for b, tp in seg.postings_with_buckets(term):
                d, t, _ = tp.decode_all()
                tagged.append((b, d, t, pos_by_bucket[b]))
        tagged.sort(key=lambda x: x[0])
        if not tagged:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        docs = np.concatenate([x[1] for x in tagged]).astype(np.int64)
        tfs = np.concatenate([x[2] for x in tagged]).astype(np.int64)
        flat = np.concatenate([x[3] for x in tagged]).astype(np.int32)
        return docs, tfs, flat

    def term_offsets(self, term: str):
        """-> (docs:int64, tfs:int64, flat_pairs:int32) in global doc
        order; flat_pairs interleaves (start, end) per occurrence, each
        doc's 2*tf int32s concatenated in ascending-position order
        (parallel to :meth:`term_positions`)."""
        import numpy as np

        tagged = []
        for seg in self._segments_for(term):
            off_by_bucket = dict(seg.offsets_with_buckets(term))
            for b, tp in seg.postings_with_buckets(term):
                d, t, _ = tp.decode_all()
                tagged.append((b, d, t, off_by_bucket[b]))
        tagged.sort(key=lambda x: x[0])
        if not tagged:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        docs = np.concatenate([x[1] for x in tagged]).astype(np.int64)
        tfs = np.concatenate([x[2] for x in tagged]).astype(np.int64)
        flat = np.concatenate([x[3] for x in tagged]).astype(np.int32)
        return docs, tfs, flat

    @property
    def has_payloads(self) -> bool:
        return bool(self.manifest.get("payloads", False))

    def term_payloads(self, term: str):
        """-> (docs:int64, tfs:int64, flat_payloads:float32) in global doc
        order; flat payloads are each doc's per-occurrence payloads
        concatenated in ascending-position order, NaN where the token
        carried none (parallel to :meth:`term_positions`)."""
        import numpy as np

        tagged = []
        for seg in self._segments_for(term):
            pay_by_bucket = dict(seg.payloads_with_buckets(term))
            for b, tp in seg.postings_with_buckets(term):
                d, t, _ = tp.decode_all()
                tagged.append((b, d, t, pay_by_bucket[b]))
        tagged.sort(key=lambda x: x[0])
        if not tagged:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.float32)
        docs = np.concatenate([x[1] for x in tagged]).astype(np.int64)
        tfs = np.concatenate([x[2] for x in tagged]).astype(np.int64)
        flat = np.concatenate([x[3] for x in tagged]).astype(np.float32)
        return docs, tfs, flat

    def doc_values(self, field: str):
        """Lazily-loaded numeric doc-values column (state/docvalues.py)."""
        cache = self.__dict__.setdefault("_doc_values", {})
        dv = cache.get(field)
        if dv is None:
            from .docvalues import DocValues

            dv = DocValues(self.index_dir, field)
            cache[field] = dv
        return dv

    def doc_values_for(self, field: str, docs):
        return self.doc_values(field).values_for(docs)

    def field_exists_docs(self, field: str) -> "np.ndarray":
        """FieldExistsQuery (core/src/java/org/apache/lucene/search/
        FieldExistsQuery.java:41-47): sorted doc IDs carrying a value
        for ``field`` — resolved against the numeric doc-values sidecar
        first, then the SORTED string sidecar (the reference likewise
        matches on whichever of norms/doc-values the field indexed);
        constant-score FILTER semantics, tombstones excluded."""
        import numpy as np

        from .docvalues import has_doc_values, has_str_doc_values

        if has_doc_values(self.index_dir, field):
            ids = self.doc_values(field).doc_sorted_ids
        elif has_str_doc_values(self.index_dir, field):
            ids = self.str_doc_values(field).doc_sorted_ids
        else:
            return np.empty(0, dtype=np.int64)
        deleted = getattr(self, "deleted", None)
        if deleted is not None and len(deleted) and len(ids):
            pos = np.minimum(np.searchsorted(deleted, ids), len(deleted) - 1)
            ids = ids[deleted[pos] != ids]
        return np.asarray(ids, dtype=np.int64)

    def reopen_doc_values(self, field: str = None) -> None:
        """Drop the cached doc-values column(s) so the next access
        reloads update generations (state/docvalues.py
        update_numeric_doc_values) — the DV-generation reopen analogue
        of the reference's SegmentReader doc-values gen files."""
        cache = self.__dict__.get("_doc_values")
        if cache is not None:
            if field is None:
                cache.clear()
            else:
                cache.pop(field, None)

    def shape_values(self, field: str = "shape"):
        """Lazily-loaded indexed-shape sidecar (state/shapes.py) — the
        LatLonShape leaf payload for functions/geo.py shape_docs."""
        cache = self.__dict__.setdefault("_shape_values", {})
        sv = cache.get(field)
        if sv is None:
            from .shapes import ShapeValues

            sv = ShapeValues(self.index_dir, field)
            cache[field] = sv
        return sv

    def str_doc_values(self, field: str):
        """Lazily-loaded SORTED (string) doc-values column."""
        cache = self.__dict__.setdefault("_str_doc_values", {})
        dv = cache.get(field)
        if dv is None:
            from .docvalues import StrDocValues

            dv = StrDocValues(self.index_dir, field)
            cache[field] = dv
        return dv

    def filter_docs(self, filters) -> Optional["np.ndarray"]:
        """Sorted doc IDs satisfying EVERY filter triple — (field, lo, hi)
        numeric range (PointRangeQuery), (field, "in", values) string set
        (TermInSetQuery over SORTED doc values), or (field, "multirange",
        ((lo, hi), ...)) union-of-ranges (sandbox MultiRangeQuery /
        SortedNumericDocValuesMultiRangeQuery: a doc matches when its
        value falls in ANY of the clause's ranges; ranges may overlap) —
        ANDed across clauses, or None when there are no filters."""
        import numpy as np

        out = None
        for field, lo, hi in filters:
            if lo == "in":
                docs = self.str_doc_values(field).in_set_docs(hi)
            elif lo == "multirange":
                dv = self.doc_values(field)
                parts = [dv.range_docs(int(a), int(b)) for a, b in hi]
                docs = (
                    np.unique(np.concatenate(parts))
                    if parts
                    else np.empty(0, dtype=np.int64)
                )
            else:
                docs = self.doc_values(field).range_docs(int(lo), int(hi))
            out = docs if out is None else np.intersect1d(out, docs, assume_unique=True)
        return out

    def expand_multi(self, kind: str, pattern: str, arg: int) -> List[str]:
        """Multi-term expansion per segment (each segment's term list is
        already sorted, so prefix ranges bisect locally) — avoids ever
        materializing a merged global vocabulary (at 10^8+ terms the
        merged sorted set would cost GBs per searcher)."""
        from ..functions.multiterm import (
            MAX_EXPANSIONS,
            expand,
            literal_prefix,
            literal_suffix,
        )

        # leading-wildcard acceleration: only then is the (lazily built,
        # per-segment-cached) reversed dictionary worth touching
        use_rev = (
            kind == "wildcard"
            and not literal_prefix(pattern)
            and bool(literal_suffix(pattern))
        )
        out = set()
        for g in range(self.num_partitions):
            seg = self._segment(g)
            if seg is not None:
                out.update(
                    expand(
                        kind, pattern, arg, seg.sorted_terms(),
                        rvocab=seg.reversed_terms() if use_rev else None,
                    )
                )
        return sorted(out)[:MAX_EXPANSIONS]
