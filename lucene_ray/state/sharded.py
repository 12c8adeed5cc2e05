"""ShardedReader: search over several independently built indexes.

Reference analogues: ``IndexWriter.addIndexes`` (bulk-import foreign
segments from parallel sharded builds, core/.../index/IndexWriter.java:248-290),
``MultiReader``/``IndexSearcher`` gathering *global* collection statistics
across leaves before scoring (search/IndexSearcher.java createWeight path),
and ``TopDocs.merge`` (search/TopDocs.java:75-122).

This is the incremental-append story at 10^12-doc scale: each ingest batch
is built as its own index over a fresh doc-id range (new segments + its own
manifest — never rewriting old ones); a ShardedReader over [batch1, batch2,
...] scores EXACTLY like a single monolithic build of the union, because

* doc lengths / norms are per-document (shard-independent),
* idf / avgdl come from the summed global stats computed here, and
* shard doc ranges are disjoint and ascending, so concatenated posting
  blocks remain globally docID-sorted and (score desc, docID asc) stays a
  total order — no docID remapping (the reference's DocIDMerger is
  unnecessary by construction).

The object satisfies the reader protocol consumed by the query executors
(functions/query.py): doc_count, sum_total_tf, norm_kind, analyzer_name,
term_stats(), postings().
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

from .reader import IndexReader


class ShardedReader:
    def __init__(self, index_dirs: Sequence[str], deleted=None):
        import numpy as np

        if not index_dirs:
            raise ValueError("at least one index dir required")
        self.shards: List[IndexReader] = [IndexReader(d) for d in index_dirs]
        # liveDocs: root-level tombstones (doc IDs are global, so they apply
        # across shards) unioned with any per-shard tombstones
        parts = [d for d in [deleted] + [sh.deleted for sh in self.shards]
                 if d is not None and len(d)]
        self.deleted = (
            np.unique(np.concatenate(parts)).astype(np.int64) if parts else None
        )
        first = self.shards[0]
        for sh in self.shards[1:]:
            if sh.norm_kind != first.norm_kind:
                raise ValueError("shards disagree on norm_kind")
            if sh.analyzer_name != first.analyzer_name:
                raise ValueError("shards disagree on analyzer")
        # disjoint ascending doc ranges (manifest doc_min/doc_max)
        ranges = []
        for sh in self.shards:
            m = sh.manifest
            if "doc_min" in m and "doc_max" in m and m["doc_max"] >= 0:
                ranges.append((m["doc_min"], m["doc_max"]))
            else:
                ranges.append(None)
        if all(r is not None for r in ranges):
            order = sorted(range(len(ranges)), key=lambda i: ranges[i][0])
            self.shards = [self.shards[i] for i in order]
            ranges = [ranges[i] for i in order]
            for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
                if a_hi >= b_lo:
                    raise ValueError(
                        f"shard doc ranges overlap: [{a_lo},{a_hi}] vs "
                        f"[{b_lo},{b_hi}] — incremental batches must use "
                        "fresh doc-id ranges"
                    )
        self.norm_kind = first.norm_kind
        self.analyzer_name = first.analyzer_name
        # GLOBAL collection statistics (summed before any scoring)
        self.doc_count = sum(sh.doc_count for sh in self.shards)
        self.sum_total_tf = sum(sh.sum_total_tf for sh in self.shards)
        self.avgdl = self.sum_total_tf / max(self.doc_count, 1)

    def term_stats(self, term: str) -> Tuple[int, int]:
        df = ttf = 0
        for sh in self.shards:
            d, t = sh.term_stats(term)
            df += d
            ttf += t
        return df, ttf

    def postings(self, term: str):
        """Concatenated per-shard postings, ascending global doc order
        (shards are sorted by doc range; blocks stay sorted)."""
        out = []
        for sh in self.shards:
            out.extend(sh.postings(term))
        return out

    def all_terms(self) -> List[str]:
        terms = set()
        for sh in self.shards:
            terms.update(sh.all_terms())
        return sorted(terms)

    def expand_multi(self, kind: str, pattern: str, arg: int) -> List[str]:
        from ..functions.multiterm import MAX_EXPANSIONS

        out = set()
        for sh in self.shards:
            out.update(sh.expand_multi(kind, pattern, arg))
        return sorted(out)[:MAX_EXPANSIONS]

    @property
    def has_positions(self) -> bool:
        return all(sh.has_positions for sh in self.shards)

    def all_doc_ids(self):
        """Concatenated per-shard doc IDs (disjoint ascending ranges)."""
        import numpy as np

        return np.concatenate([sh.all_doc_ids() for sh in self.shards])

    def term_positions(self, term: str):
        """Concatenated per-shard (docs, tfs, flat positions), global doc
        order (shards sorted by disjoint ascending doc ranges)."""
        import numpy as np

        parts = [sh.term_positions(term) for sh in self.shards]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )

    @property
    def has_offsets(self) -> bool:
        return all(
            getattr(sh, "has_offsets", False) for sh in self.shards
        )

    def term_offsets(self, term: str):
        """Concatenated per-shard (docs, tfs, flat (start,end) pairs),
        global doc order — postings-source highlighting over incremental
        roots."""
        import numpy as np

        parts = [sh.term_offsets(term) for sh in self.shards]
        parts = [p for p in parts if len(p[0])]
        if not parts:
            e = np.empty(0, dtype=np.int64)
            return e, e, np.empty(0, dtype=np.int32)
        return (
            np.concatenate([p[0] for p in parts]),
            np.concatenate([p[1] for p in parts]),
            np.concatenate([p[2] for p in parts]),
        )

    def filter_docs(self, filters):
        """Per-shard range results concatenate in global doc order (shard
        doc ranges are disjoint ascending)."""
        import numpy as np

        parts = [sh.filter_docs(filters) for sh in self.shards]
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        return np.concatenate(parts)

    def doc_values_for(self, field: str, docs):
        """Doc-values gather across shards (each doc belongs to exactly one
        shard's range; a single concatenated gather stays correct because
        values_for searches each shard's own doc-sorted view)."""
        import numpy as np

        out = np.empty(len(docs), dtype=np.int64)
        for sh in self.shards:
            m = sh.manifest
            lo, hi = m.get("doc_min", 0), m.get("doc_max", -1)
            mask = (docs >= lo) & (docs <= hi)
            if mask.any():
                out[mask] = sh.doc_values(field).values_for(docs[mask])
        return out
