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
    shard_dirs: List[str], out_dir: str, gpart: int, num_partitions: int
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
        "num_terms": len(terms),
        "num_term_buckets": len(terms),
        "num_postings": num_postings,
        "sum_tf": sum_tf,
        "blob_bytes": len(blob),
        "wall_sec": round(time.time() - t0, 3),
        "resumed": False,
    }


def compact_shards(shard_dirs: Sequence[str], out_dir: str) -> dict:
    """Merge ``shard_dirs`` (disjoint ascending doc ranges, same config,
    no heavy splits) into one index at ``out_dir``; returns its manifest."""
    manifests = [IndexReader(d).manifest for d in shard_dirs]
    first = manifests[0]
    for m in manifests[1:]:
        for key in ("analyzer", "norm_kind", "num_partitions"):
            if m[key] != first[key]:
                raise ValueError(f"shards disagree on {key}")
    num_partitions = first["num_partitions"]
    os.makedirs(os.path.join(out_dir, SEGMENT_DIR), exist_ok=True)
    metas = ray.get(
        [
            _merge_gpart.remote(list(shard_dirs), out_dir, g, num_partitions)
            for g in range(num_partitions)
        ]
    )
    metas.sort(key=lambda s: s["gpart"])
    doc_count = sum(m["doc_count"] for m in manifests)
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
