"""liveDocs tombstones: document deletes without segment rewrites.

Reference analogue: ``IndexWriter.deleteDocuments`` / ``updateDocument``
(core/src/java/org/apache/lucene/index/IndexWriter.java:1845) and the
liveDocs bitset consulted by every scorer until a merge physically drops
the dead postings (index/SegmentReader.java liveDocs path).

Our segments are immutable (like the reference's); a delete appends a small
tombstone parquet under ``<index>/deletes/`` with an atomic tmp+rename
publish. Readers load the union of tombstones at open and filter deleted
doc IDs out of every decoded posting slice. Matching the reference's
pre-merge semantics, collection/term statistics (doc_count, df, totalTf)
still INCLUDE deleted docs until compaction — the DuckDB oracle for
update pipelines mirrors exactly that.

Generation discipline: readers are cached per (index_dir, tombstone
fingerprint); publishing a new tombstone therefore yields a fresh reader
on next open (the reference's reopen-after-commit).
"""

from __future__ import annotations

import glob
import os
from typing import Iterable, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

DELETES_DIR = "deletes"


def _del_dir(index_dir: str) -> str:
    return os.path.join(index_dir, DELETES_DIR)


def _del_files(index_dir: str) -> List[str]:
    return sorted(glob.glob(os.path.join(_del_dir(index_dir), "del-*.parquet")))


def delete_docs(index_dir: str, doc_ids: Iterable[int]) -> int:
    """Append a tombstone file for ``doc_ids``; returns the new generation.

    Works on a single index dir or an incremental root (the tombstones
    apply to every shard because doc IDs are global)."""
    ids = np.unique(np.asarray(list(doc_ids), dtype=np.int64))
    if len(ids) == 0:
        return len(_del_files(index_dir))
    os.makedirs(_del_dir(index_dir), exist_ok=True)
    gen = len(_del_files(index_dir))
    path = os.path.join(_del_dir(index_dir), f"del-{gen:05d}.parquet")
    tmp = path + ".tmp"
    pq.write_table(pa.table({"doc_id": pa.array(ids)}), tmp)
    os.replace(tmp, path)
    return gen + 1


def read_deletes(index_dir: str) -> Optional[np.ndarray]:
    """Sorted unique deleted doc IDs, or None when no tombstones exist."""
    files = _del_files(index_dir)
    if not files:
        return None
    parts = [pq.read_table(f, columns=["doc_id"]).column("doc_id").to_numpy()
             for f in files]
    return np.unique(np.concatenate(parts)).astype(np.int64)


def deletes_fingerprint(index_dir: str) -> str:
    """Cheap identity of the tombstone state (file names only) — the reader
    cache key component that forces a reopen after new deletes."""
    return ";".join(os.path.basename(f) for f in _del_files(index_dir))


def clear_deletes(index_dir: str) -> None:
    """Drop all tombstones (used after compaction physically removed the
    dead postings)."""
    for f in _del_files(index_dir):
        os.remove(f)
