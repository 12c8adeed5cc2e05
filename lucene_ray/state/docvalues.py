"""Numeric doc-values sidecar: per-doc column for range filters + sorting.

Reference analogues: numeric points / PointRangeQuery
(core/src/java/org/apache/lucene/document/IntPoint.java,
search/PointRangeQuery.java — the BKD tree is a 1-D sorted structure for a
single dimension) and numeric doc values / sort-by-field
(index/DocValuesType.java, search/SortField.java,
search/TopFieldCollector.java).

Layout: ``<index>/docvalues/<field>/*.parquet`` with (doc_id:int64,
value:int64) rows, written by a streaming ``map_batches`` pass. The reader
loads the column once into two sorted views:

* value-sorted (value, doc_id) — a 1-D BKD analogue: a range query is two
  ``searchsorted`` cuts, returning the matching doc IDs;
* doc-sorted (doc_id, value) — the doc-values gather used by
  sort-by-field and per-hit value output.

Scale note: both views are O(docs in THIS index) int64 arrays. At 10^12
docs the index is doc-range-sharded (state/sharded.py) and each searcher
holds only its shard's column — per-node memory stays bounded, and range
results concatenate across shards in global doc order.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DOCVALUES_DIR = "docvalues"


def write_doc_values(
    ds, index_dir: str, field: str, value_col: Optional[str] = None
) -> None:
    """Write the (doc_id, value) sidecar for ``field`` from a Dataset with
    a ``doc_id`` column and ``value_col`` (default = field). Values must be
    int64-codable (timestamps are stored as epoch microseconds). Streaming:
    one deterministic atomic parquet per batch, same retry discipline as
    the build's RunWriter."""
    import shutil

    value_col = value_col or field
    out_dir = os.path.join(index_dir, DOCVALUES_DIR, field)
    # wipe-and-rewrite: a re-run with different batching must not leave a
    # mix of old and new files (same transient-scratch discipline as the
    # build's run files); per-file writes below stay atomic for retries
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import zlib

        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        col = batch.column(value_col)
        if pa.types.is_timestamp(col.type):
            col = col.cast(pa.int64())
        vals = col.to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        tbl = pa.table({"doc_id": pa.array(ids), "value": pa.array(vals)})
        crc = zlib.crc32(ids.tobytes())
        name = f"dv-{int(ids.min())}-{int(ids.max())}-{len(ids)}-{crc:08x}.parquet"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(ids)], pa.int64())})

    ds.map_batches(write_batch, batch_format="pyarrow").count()


def has_doc_values(index_dir: str, field: str) -> bool:
    return bool(
        glob.glob(os.path.join(index_dir, DOCVALUES_DIR, field, "*.parquet"))
    )


def doc_values_generation(index_dir: str, field: str) -> int:
    """Newest update generation for the field (0 = base only)."""
    upds = glob.glob(
        os.path.join(index_dir, DOCVALUES_DIR, field, "upd-*.parquet")
    )
    gens = [int(os.path.basename(f).split("-")[1]) for f in upds]
    return max(gens, default=0)


def update_numeric_doc_values(
    index_dir: str, field: str, doc_ids, values
) -> int:
    """In-place numeric doc-values update — the
    ``IndexWriter.updateNumericDocValue`` analogue (reference:
    core/src/java/org/apache/lucene/index/IndexWriter.java
    updateNumericDocValue + DocValuesFieldUpdates / the per-generation
    ``.dvd`` gen files resolved in ReadersAndUpdates): the field's
    existing files stay immutable; a new ``upd-<gen>`` overlay file
    holds the changed (doc_id, value) rows and the loader resolves the
    newest generation per doc. ``values`` may be a scalar (applied to
    every doc — the update-by-term shape) or per-doc. Docs without a
    prior value are UPSERTED (documented relaxation: the reference
    requires the doc to have had the field).

    Returns the new generation number. Warm readers cache loaded
    columns — call ``IndexReader.reopen_doc_values`` (or re-open the
    reader) to observe the update, the DV-generation reopen analogue.
    """
    import zlib

    ids = np.asarray(doc_ids, dtype=np.int64)
    if ids.ndim != 1 or len(ids) == 0:
        raise ValueError("update needs at least one doc id")
    vals = np.broadcast_to(
        np.asarray(values, dtype=np.int64), ids.shape
    ).copy()
    out_dir = os.path.join(index_dir, DOCVALUES_DIR, field)
    if not has_doc_values(index_dir, field):
        raise FileNotFoundError(
            f"no doc values for field {field!r} under {index_dir}"
        )
    gen = doc_values_generation(index_dir, field) + 1
    tbl = pa.table({"doc_id": pa.array(ids), "value": pa.array(vals)})
    crc = zlib.crc32(ids.tobytes()) ^ zlib.crc32(vals.tobytes())
    path = os.path.join(out_dir, f"upd-{gen:06d}-{crc:08x}.parquet")
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return gen


class DocValues:
    """One field's column, loaded once per reader (warm searcher state)."""

    def __init__(self, index_dir: str, field: str):
        files = sorted(
            glob.glob(os.path.join(index_dir, DOCVALUES_DIR, field, "*.parquet"))
        )
        if not files:
            raise FileNotFoundError(
                f"no doc values for field {field!r} under {index_dir}"
            )
        ids_parts, val_parts = [], []
        for f in files:
            t = pq.read_table(f)
            ids_parts.append(t.column("doc_id").to_numpy())
            val_parts.append(t.column("value").to_numpy())
        ids = np.concatenate(ids_parts).astype(np.int64)
        vals = np.concatenate(val_parts).astype(np.int64)
        # doc-values update generations: ``upd-*`` overlay files sort
        # AFTER the ``dv-*`` base files ('d' < 'u'), so a stable argsort
        # keeps file order within a doc and the LAST occurrence per doc
        # is the newest generation's value (the reference resolves
        # DocValuesFieldUpdates by generation the same way,
        # index/ReadersAndUpdates.java) — dedupe keeping the last.
        by_doc = np.argsort(ids, kind="stable")
        sid, sval = ids[by_doc], vals[by_doc]
        if len(sid):
            keep = np.ones(len(sid), dtype=bool)
            keep[:-1] = sid[1:] != sid[:-1]
            sid, sval = sid[keep], sval[keep]
        self.doc_sorted_ids = sid
        self.doc_sorted_vals = sval
        by_val = np.lexsort((sid, sval))
        self.val_sorted_vals = sval[by_val]
        self.val_sorted_ids = sid[by_val]

    def range_docs(self, lo: int, hi: int) -> np.ndarray:
        """Sorted doc IDs with lo <= value <= hi (PointRangeQuery)."""
        i = int(np.searchsorted(self.val_sorted_vals, lo, side="left"))
        j = int(np.searchsorted(self.val_sorted_vals, hi, side="right"))
        return np.sort(self.val_sorted_ids[i:j])

    def values_for(self, docs: np.ndarray) -> np.ndarray:
        """Doc-values gather: value per doc (docs must exist in the column;
        missing docs gather as the nearest row — callers pass docs that came
        out of the index, which the sidecar covers by construction)."""
        if len(docs) == 0:
            return np.empty(0, dtype=np.int64)
        pos = np.minimum(
            np.searchsorted(self.doc_sorted_ids, docs),
            len(self.doc_sorted_ids) - 1,
        )
        return self.doc_sorted_vals[pos]


# ---------------------------------------------------------------------------
# Sorted (string) doc values — TermInSetQuery support
# ---------------------------------------------------------------------------


DOCVALUES_STR_DIR = "docvalues-str"


def write_str_doc_values(
    ds, index_dir: str, field: str, value_col: Optional[str] = None
) -> None:
    """String doc-values sidecar under ``docvalues-str/<field>/`` —
    the SORTED DocValuesType analogue (index/DocValuesType.java SORTED:
    per-doc ordinal into a sorted terms dictionary; the ordinal encoding
    happens at load in :class:`StrDocValues`, the files store raw values
    for transparency). Same streaming atomic-write discipline as the
    numeric sidecar."""
    import shutil
    import zlib

    value_col = value_col or field
    out_dir = os.path.join(index_dir, DOCVALUES_STR_DIR, field)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        vals = batch.column(value_col).cast(pa.string())
        if len(ids) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        tbl = pa.table({"doc_id": pa.array(ids), "value": vals})
        crc = zlib.crc32(ids.tobytes())
        name = f"dv-{int(ids.min())}-{int(ids.max())}-{len(ids)}-{crc:08x}.parquet"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(ids)], pa.int64())})

    ds.map_batches(write_batch, batch_format="pyarrow").count()


def has_str_doc_values(index_dir: str, field: str) -> bool:
    return bool(
        glob.glob(
            os.path.join(index_dir, DOCVALUES_STR_DIR, field, "*.parquet")
        )
    )


class StrDocValues:
    """SORTED doc values: per-doc ordinal + sorted terms dictionary.
    Memory per searcher = one int32 ord per doc + the (small) dictionary
    — the same footprint argument as Lucene's SortedDocValues; doc-range
    sharding bounds it at scale exactly like the numeric column."""

    def __init__(self, index_dir: str, field: str):
        files = sorted(
            glob.glob(
                os.path.join(index_dir, DOCVALUES_STR_DIR, field, "*.parquet")
            )
        )
        if not files:
            raise FileNotFoundError(
                f"no string doc values for field {field!r} under {index_dir}"
            )
        ids_parts, val_parts = [], []
        for f in files:
            t = pq.read_table(f)
            ids_parts.append(t.column("doc_id").to_numpy())
            val_parts.append(
                t.column("value").to_numpy(zero_copy_only=False)
            )
        ids = np.concatenate(ids_parts).astype(np.int64)
        vals = np.concatenate(val_parts)
        by_doc = np.argsort(ids, kind="stable")
        self.doc_sorted_ids = ids[by_doc]
        # ordinal-encode against the sorted unique dictionary
        self.dictionary, ords = np.unique(vals[by_doc], return_inverse=True)
        self.doc_sorted_ords = ords.astype(np.int32)

    def _ords_of(self, values) -> np.ndarray:
        """Dictionary ordinals of the requested values (absent -> dropped,
        like TermInSetQuery skipping terms missing from the dictionary)."""
        vals = np.asarray(sorted(set(values)), dtype=self.dictionary.dtype)
        pos = np.searchsorted(self.dictionary, vals)
        pos = np.minimum(pos, len(self.dictionary) - 1)
        return pos[self.dictionary[pos] == vals].astype(np.int32)

    def in_set_docs(self, values) -> np.ndarray:
        """Sorted doc IDs whose value is in ``values`` (TermInSetQuery /
        SortedDocValuesField set filter)."""
        ords = self._ords_of(values)
        if len(ords) == 0:
            return np.empty(0, dtype=np.int64)
        mask = np.isin(self.doc_sorted_ords, ords)
        return self.doc_sorted_ids[mask]

    def values_for(self, docs: np.ndarray) -> np.ndarray:
        """Per-doc string gather (docs must exist in the column)."""
        if len(docs) == 0:
            return self.dictionary[np.empty(0, dtype=np.int32)]
        pos = np.minimum(
            np.searchsorted(self.doc_sorted_ids, docs),
            len(self.doc_sorted_ids) - 1,
        )
        return self.dictionary[self.doc_sorted_ords[pos]]
