"""Shard compaction: merge several index shards into one index WITHOUT
re-analysis.

Reference analogue: ``SegmentMerger.merge/mergeTerms`` — k-way merge of
per-segment sorted term iterators with postings concatenation
(core/.../index/SegmentMerger.java:114-147) driven by a merge policy
(index/TieredMergePolicy.java). Because doc IDs are global and shard doc
ranges are disjoint ascending, postings concatenate without the reference's
DocIDMerger remapping.

Unit of work = one term partition (gpart): a Ray task gathers that
partition's terms from every shard — normal terms live in the shard's same
gpart (routing is crc32 % num_partitions); a HEAVY term's doc-range buckets
were scattered to (crc32+bucket) % num_partitions at build time, so heavy
terms homed here are gathered through each shard's IndexReader (which walks
all segments and restores bucket order). The merged output is split-free:
every term becomes one contiguous posting list in its home partition.
"""

from __future__ import annotations

import os
from typing import Dict, List, Sequence

import numpy as np

import ray

from ..functions.hashing import crc32_bucket
from ..state.reader import IndexReader
from ..state.segment import (
    SEGMENT_DIR,
    encode_term_postings,
    write_manifest,
)


@ray.remote
def _merge_gpart(
    shard_dirs: List[str], out_dir: str, gpart: int, num_partitions: int,
    deleted=None,
) -> dict:
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.segment import TERMS_SCHEMA

    t0 = time.time()
    readers = [IndexReader(d) for d in shard_dirs]
    # terms HOMED in this partition: normal terms from each shard's same
    # gpart segment (foreign heavy buckets filtered out), plus heavy terms
    # whose home hash lands here (gathered across that shard's segments)
    term_set = set()
    for r in readers:
        seg = r._segment(gpart)
        if seg is not None:
            term_set.update(
                t
                for t in seg.terms()
                if crc32_bucket(t, num_partitions) == gpart
            )
        term_set.update(
            t
            for t in r.heavy_terms
            if crc32_bucket(t, num_partitions) == gpart
        )
    terms = sorted(term_set)
    blob = bytearray()
    rows: Dict[str, list] = {
        "term": [], "bucket": [], "doc_freq": [], "total_tf": [],
        "max_tf": [], "offset": [], "length": [],
    }
    num_postings = 0
    sum_tf = 0
    for term in terms:
        docs_parts, tf_parts, key_parts = [], [], []
        for r in readers:
            for tp in r.postings(term):  # IndexReader restores bucket order
                d, t, k = tp.decode_all()
                docs_parts.append(d)
                tf_parts.append(t)
                key_parts.append(k)
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        keys = np.concatenate(key_parts)
        order = np.argsort(docs, kind="stable")
        docs, tfs, keys = docs[order], tfs[order], keys[order]
        if deleted is not None and len(deleted) and len(docs):
            # physically drop tombstoned postings (the reference's merge
            # consults liveDocs the same way, index/SegmentMerger.java)
            pos = np.minimum(np.searchsorted(deleted, docs), len(deleted) - 1)
            keep = deleted[pos] != docs
            docs, tfs, keys = docs[keep], tfs[keep], keys[keep]
        if len(docs) == 0:
            continue
        off, length = encode_term_postings(blob, docs, tfs, keys)
        rows["term"].append(term)
        rows["bucket"].append(0)
        rows["doc_freq"].append(len(docs))
        rows["total_tf"].append(int(tfs.sum()))
        rows["max_tf"].append(int(tfs.max()))
        rows["offset"].append(off)
        rows["length"].append(length)
        num_postings += len(docs)
        sum_tf += int(tfs.sum())
    seg_dir = os.path.join(out_dir, SEGMENT_DIR)
    os.makedirs(seg_dir, exist_ok=True)
    base = os.path.join(seg_dir, f"seg-{gpart:05d}")
    tmp = base + ".post.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, base + ".post")
    tbl = pa.table(
        {
            "term": pa.array(rows["term"], pa.string()),
            "bucket": pa.array(rows["bucket"], pa.int32()),
            "doc_freq": pa.array(rows["doc_freq"], pa.int64()),
            "total_tf": pa.array(rows["total_tf"], pa.int64()),
            "max_tf": pa.array(rows["max_tf"], pa.int32()),
            "offset": pa.array(rows["offset"], pa.int64()),
            "length": pa.array(rows["length"], pa.int64()),
        },
        schema=TERMS_SCHEMA,
    )
    tmp = base + ".terms.parquet.tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, base + ".terms.parquet")
    return {
        "gpart": gpart,
        "num_terms": len(rows["term"]),
        "num_term_buckets": len(rows["term"]),
        "num_postings": num_postings,
        "sum_tf": sum_tf,
        "blob_bytes": len(blob),
        "wall_sec": round(time.time() - t0, 3),
        "resumed": False,
    }


def _live_doc_count(shard_dirs: Sequence[str], total: int, deleted) -> int:
    """Live doc count after dropping tombstones: counted from the shards'
    doc_map sidecars (streaming Ray pipeline, partial counts per batch)
    when available; falls back to assuming every tombstoned id existed."""
    import glob

    if deleted is None or len(deleted) == 0:
        return total
    files = [
        f
        for d in shard_dirs
        for f in sorted(glob.glob(os.path.join(d, "docmap", "*.parquet")))
    ]
    if not files:
        return total - int(len(deleted))
    import pyarrow as pa

    import ray.data

    dead_ref = ray.put(np.asarray(deleted, dtype=np.int64))

    def partial(batch: pa.Table) -> pa.Table:
        dead = ray.get(dead_ref)
        ids = batch.column("doc_id").to_numpy()
        n = int(len(ids) - np.isin(ids, dead).sum())
        return pa.table({"live": pa.array([n], pa.int64())})

    parts = (
        ray.data.read_parquet(files, columns=["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()
    )
    return int(sum(r["live"] for r in parts))


def compact_shards(
    shard_dirs: Sequence[str], out_dir: str, deleted=None
) -> dict:
    """Merge ``shard_dirs`` (disjoint ascending doc ranges, same config,
    no heavy splits) into one index at ``out_dir``; returns its manifest.

    ``deleted`` (sorted doc-id array) physically drops tombstoned postings
    and removes them from the output's collection statistics — compaction
    is the point where liveDocs semantics becomes stats-visible, exactly
    like the reference's merge."""
    manifests = [IndexReader(d).manifest for d in shard_dirs]
    first = manifests[0]
    for m in manifests[1:]:
        for key in ("analyzer", "norm_kind", "num_partitions"):
            if m[key] != first[key]:
                raise ValueError(f"shards disagree on {key}")
    num_partitions = first["num_partitions"]
    os.makedirs(os.path.join(out_dir, SEGMENT_DIR), exist_ok=True)
    dead = (
        np.unique(np.asarray(list(deleted), dtype=np.int64))
        if deleted is not None
        else None
    )
    metas = ray.get(
        [
            _merge_gpart.remote(
                list(shard_dirs), out_dir, g, num_partitions, dead
            )
            for g in range(num_partitions)
        ]
    )
    metas.sort(key=lambda s: s["gpart"])
    doc_count = _live_doc_count(
        shard_dirs, sum(m["doc_count"] for m in manifests), dead
    )
    manifest = {
        "version": 1,
        "analyzer": first["analyzer"],
        "norm_kind": first["norm_kind"],
        "num_partitions": num_partitions,
        "bucket_shift": first.get("bucket_shift", 16),
        "heavy_terms": [],
        "doc_count": doc_count,
        "sum_total_tf": int(sum(s["sum_tf"] for s in metas)),
        "num_postings": int(sum(s["num_postings"] for s in metas)),
        "doc_min": int(min(m.get("doc_min", 0) for m in manifests)),
        "doc_max": int(max(m.get("doc_max", -1) for m in manifests)),
        "fingerprint": f"compacted:{';'.join(sorted(os.path.basename(d.rstrip('/')) for d in shard_dirs))}",
        "build_sec": None,
        "docs_per_sec": None,
        "segments": metas,
    }
    write_manifest(out_dir, manifest)
    return manifest


def compact_root(root: str, out_dir: str) -> dict:
    """Compact an incremental root (shards.json + root tombstones) into one
    tombstone-free index at ``out_dir``."""
    from ..state.deletes import read_deletes
    from .incremental import list_shards

    shards = list_shards(root)
    if not shards:
        raise FileNotFoundError(f"no shards published under {root}")
    return compact_shards(
        [s["dir"] for s in shards], out_dir, deleted=read_deletes(root)
    )
