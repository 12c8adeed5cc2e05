"""Incremental ingestion: append document batches as new index shards.

Reference analogue: ``IndexWriter.addIndexes`` (bulk-import of foreign
segments, core/.../index/IndexWriter.java:248-290) + commit points
(segments_N generations, index/SegmentInfos.java:51-68). Each appended
batch is built as a complete index under ``<root>/shards/shard-NNNNN`` and
registered in ``<root>/shards.json`` with an atomic tmp+rename publish —
old shards are never rewritten, readers opened before an append keep
working (immutable segments, like the reference), and a crashed append
leaves the registry untouched.

Doc-id discipline: every batch must occupy a FRESH doc-id range above all
existing shards (global ids keep (score desc, docID asc) total and make
cross-shard merge remap-free). ``add_batch`` validates the built shard's
recorded doc range before publishing and refuses overlaps.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import ray.data

from ..state.sharded import ShardedReader
from .build import IndexConfig, build_index

REGISTRY_NAME = "shards.json"


def _registry_path(root: str) -> str:
    return os.path.join(root, REGISTRY_NAME)


def list_shards(root: str) -> List[dict]:
    try:
        with open(_registry_path(root)) as f:
            return json.load(f)["shards"]
    except FileNotFoundError:
        return []


def _publish(root: str, shards: List[dict]) -> None:
    tmp = _registry_path(root) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": 1, "shards": shards}, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, _registry_path(root))


def add_batch(
    root: str,
    ds: "ray.data.Dataset",
    cfg: Optional[IndexConfig] = None,
    doc_count: Optional[int] = None,
) -> dict:
    """Build ``ds`` as the next shard of ``root`` and publish it.

    Returns the new shard's manifest. Raises if the batch's doc-id range
    overlaps any registered shard (the shard directory is left unpublished
    and is overwritten by the next attempt)."""
    cfg = cfg or IndexConfig()
    shards = list_shards(root)
    if shards:
        first = shards[0]
        if first["analyzer"] != cfg.analyzer or first["norm_kind"] != cfg.norm_kind:
            raise ValueError(
                "batch config disagrees with existing shards "
                f"({first['analyzer']}/{first['norm_kind']} vs "
                f"{cfg.analyzer}/{cfg.norm_kind})"
            )
    shard_id = (max((s["shard_id"] for s in shards), default=-1)) + 1
    shard_dir = os.path.join(root, "shards", f"shard-{shard_id:05d}")
    manifest = build_index(ds, shard_dir, cfg, doc_count=doc_count)
    prev_max = max((s["doc_max"] for s in shards), default=-1)
    if manifest["doc_max"] >= 0 and manifest["doc_min"] <= prev_max:
        raise ValueError(
            f"batch doc ids [{manifest['doc_min']}, {manifest['doc_max']}] "
            f"overlap existing shards (max doc id {prev_max}); each batch "
            "must use a fresh doc-id range"
        )
    shards.append(
        {
            "shard_id": shard_id,
            "dir": shard_dir,
            "doc_count": manifest["doc_count"],
            "doc_min": manifest["doc_min"],
            "doc_max": manifest["doc_max"],
            "analyzer": cfg.analyzer,
            "norm_kind": cfg.norm_kind,
        }
    )
    _publish(root, shards)
    return manifest


def registry_fingerprint(index_dir: str) -> str:
    """Commit-point identity of an incremental root: a digest of its
    shards.json content ('' for plain single-index dirs). Part of the
    reader-cache key so publishing a new shard REOPENS on the next call —
    the ControlledRealTimeReopenThread visibility contract (without it, a
    warm process served pre-append readers forever)."""
    import hashlib

    try:
        with open(_registry_path(index_dir), "rb") as f:
            return hashlib.md5(f.read()).hexdigest()
    except FileNotFoundError:
        return ""


def open_index(root: str) -> ShardedReader:
    """Reader over every published shard (global stats summed), honoring
    root-level liveDocs tombstones."""
    from ..state.deletes import read_deletes

    shards = list_shards(root)
    if not shards:
        raise FileNotFoundError(f"no shards published under {root}")
    return ShardedReader([s["dir"] for s in shards], deleted=read_deletes(root))


def update_batch(
    root: str,
    ds: "ray.data.Dataset",
    old_doc_ids,
    cfg: Optional[IndexConfig] = None,
    doc_count: Optional[int] = None,
) -> dict:
    """updateDocument analogue (reference: IndexWriter.java:1845): tombstone
    the superseded doc IDs, then append the replacement docs as a fresh
    shard (fresh doc-id range). Readers opened after the publish see only
    the newest versions; stats include the dead docs until compaction."""
    from ..state.deletes import delete_docs

    manifest = add_batch(root, ds, cfg, doc_count=doc_count)
    delete_docs(root, old_doc_ids)
    return manifest
