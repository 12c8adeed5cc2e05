"""Per-document term vectors sidecar — TermVectorsWriter/Reader analogue.

Reference: ``core/src/java/org/apache/lucene/codecs/lucene90/compressing/
Lucene90CompressingTermVectorsWriter.java`` (per-doc (term, freq) chunks,
doc-ordered) and ``index/TermVectors.java`` (point lookup by doc). Lucene
stores vectors per segment in doc order and serves random access per doc;
consumers are MoreLikeThis (``MoreLikeThis.java:retrieveTerms`` reads the
vector instead of re-analyzing stored text) and vector-based highlighting.

Layout: ``<index>/termvectors/*.parquet`` rows (doc_id:int64, term:string,
tf:int64), one deterministic atomic file per build batch, file names
carrying the doc range (``tv-<min>-<max>-<rows>-<crc>.parquet``) so a point
lookup opens exactly the files whose range covers the doc — at 10^12 docs
a reader touches one doc-range shard's files, never the corpus.

Written by a streaming ``map_batches`` pass over the corpus (one analyzer
actor pool — the same chain the index build used, so vectors are
byte-identical to the inverted postings' view of the doc).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TERMVECTORS_DIR = "termvectors"


class _TvWriteStage:
    """Actor stage: analyzer built once per actor (expensive init)."""

    def __init__(self, out_dir: str, analyzer_name: str, text_col: str,
                 id_col: str):
        from ..functions.analysis import make_analyzer

        self.out_dir = out_dir
        self.analyzer = make_analyzer(analyzer_name)
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import zlib

        ids = batch.column(self.id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        texts = batch.column(self.text_col).to_pylist()
        an = self.analyzer
        out_doc: List[int] = []
        out_term: List[str] = []
        out_tf: List[int] = []
        for d, text in zip(ids.tolist(), texts):
            toks = an.analyze(text or "")
            if not toks:
                continue
            terms, tfs = np.unique(np.asarray(toks, dtype=object),
                                   return_counts=True)
            out_doc.extend([d] * len(terms))
            out_term.extend(str(t) for t in terms)
            out_tf.extend(int(c) for c in tfs)
        tbl = pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "term": pa.array(out_term, pa.string()),
                "tf": pa.array(out_tf, pa.int64()),
            }
        )
        crc = zlib.crc32(np.ascontiguousarray(ids).tobytes())
        name = (
            f"tv-{int(ids.min())}-{int(ids.max())}-{len(ids)}-{crc:08x}.parquet"
        )
        path = os.path.join(self.out_dir, name)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(tbl)], pa.int64())})


def build_term_vectors(
    ds,
    index_dir: str,
    analyzer_name: str = "standard_en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Streaming sidecar build: analyze each doc once, write its (term, tf)
    vector rows. Wipe-and-rewrite + per-file atomic names (the build's
    RunWriter retry discipline)."""
    import shutil

    out_dir = os.path.join(index_dir, TERMVECTORS_DIR)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    ds.map_batches(
        _TvWriteStage,
        fn_constructor_args=(out_dir, analyzer_name, text_col, id_col),
        batch_format="pyarrow",
        concurrency=(1, 8),
    ).count()


def has_term_vectors(index_dir: str) -> bool:
    return bool(
        glob.glob(os.path.join(index_dir, TERMVECTORS_DIR, "*.parquet"))
    )


class TermVectors:
    """Point-lookup reader: file ranges indexed once; each lookup reads
    only files whose doc range covers the doc (cached per file)."""

    def __init__(self, index_dir: str):
        self.files: List[Tuple[int, int, str]] = []
        for f in sorted(
            glob.glob(os.path.join(index_dir, TERMVECTORS_DIR, "*.parquet"))
        ):
            parts = os.path.basename(f)[3:].split("-")
            self.files.append((int(parts[0]), int(parts[1]), f))
        if not self.files:
            raise FileNotFoundError(f"no term vectors under {index_dir}")
        self._cache: Dict[str, pa.Table] = {}

    def get(self, doc_id: int) -> Dict[str, int]:
        """{term: tf} for one doc (empty dict when the doc emitted no
        terms or is out of every file's range)."""
        out: Dict[str, int] = {}
        for lo, hi, f in self.files:
            if not (lo <= doc_id <= hi):
                continue
            t = self._cache.get(f)
            if t is None:
                t = self._cache[f] = pq.read_table(f)
            mask = pa.compute.equal(t.column("doc_id"), doc_id)
            sub = t.filter(mask)
            for term, tf in zip(
                sub.column("term").to_pylist(), sub.column("tf").to_pylist()
            ):
                out[term] = int(tf)
        return out
