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
from typing import Dict, List, Optional, Sequence

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
    deleted=None, with_positions: bool = False,
    with_offsets: bool = False, with_payloads: bool = False,
    remap=None,
) -> dict:
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.segment import TERMS_SCHEMA
    from ..util import concat_aranges

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
    pos_blob = bytearray()
    off_blob = bytearray()
    pay_blob = bytearray()
    rows: Dict[str, list] = {
        "term": [], "bucket": [], "doc_freq": [], "total_tf": [],
        "max_tf": [], "offset": [], "length": [],
        "pos_offset": [], "pos_length": [],
        "off_offset": [], "off_length": [],
        "pay_offset": [], "pay_length": [],
    }
    num_postings = 0
    sum_tf = 0
    for term in terms:
        docs_parts, tf_parts, key_parts, pos_parts = [], [], [], []
        offp_parts = []
        payp_parts = []
        for r in readers:
            for tp in r.postings(term):  # IndexReader restores bucket order
                d, t, k = tp.decode_all()
                docs_parts.append(d)
                tf_parts.append(t)
                key_parts.append(k)
            if with_positions:
                pos_parts.append(r.term_positions(term)[2])
            if with_offsets:
                offp_parts.append(r.term_offsets(term)[2])
            if with_payloads:
                payp_parts.append(r.term_payloads(term)[2])
        docs = np.concatenate(docs_parts)
        tfs = np.concatenate(tf_parts)
        keys = np.concatenate(key_parts)
        if remap is not None:
            # doc renumbering (IndexRearranger): map ids BEFORE the doc
            # sort — the existing order/position-run permutation then
            # rebuilds every stream in the NEW doc order
            old_ids, new_ids = remap
            rpos = np.minimum(
                np.searchsorted(old_ids, docs), len(old_ids) - 1
            )
            docs = new_ids[rpos]
        order = np.argsort(docs, kind="stable")
        flat_pos = None
        if with_positions:
            # permute doc-level position runs into the merged doc order
            widths = np.concatenate(tf_parts).astype(np.int64)
            flat_all = (
                np.concatenate(pos_parts)
                if pos_parts
                else np.empty(0, np.int32)
            )
            starts = np.concatenate(([0], np.cumsum(widths)[:-1]))
            w_o = widths[order]
            idx = np.repeat(starts[order], w_o) + concat_aranges(w_o)
            flat_pos = flat_all[idx]
            if with_offsets:
                # offsets store 2 int32 per occurrence: expand the
                # occurrence permutation to interleaved pair indices
                flat_all_off = (
                    np.concatenate(offp_parts)
                    if offp_parts
                    else np.empty(0, np.int32)
                )
                off_idx = np.empty(2 * len(idx), dtype=np.int64)
                off_idx[0::2] = 2 * idx
                off_idx[1::2] = 2 * idx + 1
                flat_off = flat_all_off[off_idx]
            if with_payloads:
                # one float32 per occurrence: the positions permutation
                # applies directly (payloads require positions)
                flat_all_pay = (
                    np.concatenate(payp_parts)
                    if payp_parts
                    else np.empty(0, np.float32)
                )
                flat_pay = flat_all_pay[idx]
        docs, tfs, keys = docs[order], tfs[order], keys[order]
        if deleted is not None and len(deleted) and len(docs):
            # physically drop tombstoned postings (the reference's merge
            # consults liveDocs the same way, index/SegmentMerger.java)
            pos = np.minimum(np.searchsorted(deleted, docs), len(deleted) - 1)
            keep = deleted[pos] != docs
            if with_positions and not keep.all():
                starts2 = np.concatenate(([0], np.cumsum(tfs)[:-1]))
                w_k = tfs[keep].astype(np.int64)
                idx2 = np.repeat(starts2[keep], w_k) + concat_aranges(w_k)
                flat_pos = flat_pos[idx2]
                if with_offsets:
                    off_idx2 = np.empty(2 * len(idx2), dtype=np.int64)
                    off_idx2[0::2] = 2 * idx2
                    off_idx2[1::2] = 2 * idx2 + 1
                    flat_off = flat_off[off_idx2]
                if with_payloads:
                    flat_pay = flat_pay[idx2]
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
        if with_positions:
            rows["pos_offset"].append(len(pos_blob))
            pos_blob.extend(
                np.ascontiguousarray(flat_pos, dtype="<i4").tobytes()
            )
            rows["pos_length"].append(len(flat_pos) * 4)
        if with_offsets:
            rows["off_offset"].append(len(off_blob))
            off_blob.extend(
                np.ascontiguousarray(flat_off, dtype="<i4").tobytes()
            )
            rows["off_length"].append(len(flat_off) * 4)
        if with_payloads:
            rows["pay_offset"].append(len(pay_blob))
            pay_blob.extend(
                np.ascontiguousarray(flat_pay, dtype="<f4").tobytes()
            )
            rows["pay_length"].append(len(flat_pay) * 4)
        num_postings += len(docs)
        sum_tf += int(tfs.sum())
    seg_dir = os.path.join(out_dir, SEGMENT_DIR)
    os.makedirs(seg_dir, exist_ok=True)
    base = os.path.join(seg_dir, f"seg-{gpart:05d}")
    tmp = base + ".post.tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, base + ".post")
    if with_positions:
        tmp = base + ".pos.tmp"
        with open(tmp, "wb") as f:
            f.write(pos_blob)
        os.replace(tmp, base + ".pos")
    if with_offsets:
        tmp = base + ".off.tmp"
        with open(tmp, "wb") as f:
            f.write(off_blob)
        os.replace(tmp, base + ".off")
    if with_payloads:
        tmp = base + ".pay.tmp"
        with open(tmp, "wb") as f:
            f.write(pay_blob)
        os.replace(tmp, base + ".pay")
    cols = {
        "term": pa.array(rows["term"], pa.string()),
        "bucket": pa.array(rows["bucket"], pa.int32()),
        "doc_freq": pa.array(rows["doc_freq"], pa.int64()),
        "total_tf": pa.array(rows["total_tf"], pa.int64()),
        "max_tf": pa.array(rows["max_tf"], pa.int32()),
        "offset": pa.array(rows["offset"], pa.int64()),
        "length": pa.array(rows["length"], pa.int64()),
    }
    schema = TERMS_SCHEMA
    if with_positions:
        cols["pos_offset"] = pa.array(rows["pos_offset"], pa.int64())
        cols["pos_length"] = pa.array(rows["pos_length"], pa.int64())
        schema = TERMS_SCHEMA.append(pa.field("pos_offset", pa.int64())).append(
            pa.field("pos_length", pa.int64())
        )
    if with_offsets:
        cols["off_offset"] = pa.array(rows["off_offset"], pa.int64())
        cols["off_length"] = pa.array(rows["off_length"], pa.int64())
        schema = schema.append(pa.field("off_offset", pa.int64())).append(
            pa.field("off_length", pa.int64())
        )
    if with_payloads:
        cols["pay_offset"] = pa.array(rows["pay_offset"], pa.int64())
        cols["pay_length"] = pa.array(rows["pay_length"], pa.int64())
        schema = schema.append(pa.field("pay_offset", pa.int64())).append(
            pa.field("pay_length", pa.int64())
        )
    tbl = pa.table(cols, schema=schema)
    tmp = base + ".terms.parquet.tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, base + ".terms.parquet")
    import zlib

    return {
        "gpart": gpart,
        "num_terms": len(rows["term"]),
        "num_term_buckets": len(rows["term"]),
        "num_postings": num_postings,
        "sum_tf": sum_tf,
        "blob_bytes": len(blob),
        "post_crc32": zlib.crc32(bytes(blob)),
        "pos_crc32": zlib.crc32(bytes(pos_blob)) if with_positions else -1,
        "off_crc32": zlib.crc32(bytes(off_blob)) if with_offsets else -1,
        "pay_crc32": zlib.crc32(bytes(pay_blob)) if with_payloads else -1,
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
    shard_dirs: Sequence[str], out_dir: str, deleted=None, remap=None
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
    with_positions = all(m.get("positions", False) for m in manifests)
    with_offsets = all(m.get("offsets", False) for m in manifests)
    with_payloads = all(m.get("payloads", False) for m in manifests)
    os.makedirs(os.path.join(out_dir, SEGMENT_DIR), exist_ok=True)
    dead = (
        np.unique(np.asarray(list(deleted), dtype=np.int64))
        if deleted is not None
        else None
    )
    metas = ray.get(
        [
            _merge_gpart.remote(
                list(shard_dirs), out_dir, g, num_partitions, dead,
                with_positions, with_offsets, with_payloads, remap,
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
        "positions": with_positions,
        "offsets": with_offsets,
        "payloads": with_payloads,
        "num_partitions": num_partitions,
        "bucket_shift": first.get("bucket_shift", 16),
        "heavy_terms": [],
        "doc_count": doc_count,
        "sum_total_tf": int(sum(s["sum_tf"] for s in metas)),
        "num_postings": int(sum(s["num_postings"] for s in metas)),
        "doc_min": (
            int(remap[1].min()) if remap is not None and len(remap[1])
            else int(min(m.get("doc_min", 0) for m in manifests))
        ),
        "doc_max": (
            int(remap[1].max()) if remap is not None and len(remap[1])
            else int(max(m.get("doc_max", -1) for m in manifests))
        ),
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


def select_merge(
    shards: Sequence[dict], segs_per_tier: int = 8, max_merge_at_once: int = 8
):
    """Tiered merge selection adapted to the ordered-shard invariant
    (reference: index/TieredMergePolicy.java:30-90 — segsPerTier budget,
    maxMergeAtOnce, cost favors merging SMALL segments). Our shards carry
    disjoint ascending doc ranges, so a merge candidate must be a
    CONTIGUOUS window in doc order (the LSM adaptation of the tiered
    policy); among the windows large enough to bring the count back under
    budget we pick the one with the fewest total docs."""
    if len(shards) <= segs_per_tier:
        return None
    ordered = sorted(shards, key=lambda s: s["doc_min"])
    w = min(max_merge_at_once, len(ordered) - segs_per_tier + 1)
    w = max(w, 2)
    best = None
    best_cost = None
    for i in range(len(ordered) - w + 1):
        window = ordered[i : i + w]
        cost = sum(s["doc_count"] for s in window)
        if best_cost is None or cost < best_cost:
            best, best_cost = window, cost
    return best


def maintain_root(
    root: str, segs_per_tier: int = 8, max_merge_at_once: int = 8
) -> Optional[dict]:
    """One TieredMergePolicy maintenance step on an incremental root: when
    the shard count exceeds ``segs_per_tier``, merge the cheapest
    contiguous window of up to ``max_merge_at_once`` shards into one shard
    and republish the registry atomically (old shard dirs stay on disk for
    readers opened before the publish — immutable segments, like the
    reference). Root tombstones falling inside the merged doc range are
    physically dropped there; the tombstone files stay (filtering an
    already-purged doc is a no-op for the other shards). Returns the new
    shard entry, or None when the root is within budget. Call in a loop to
    fully converge (ConcurrentMergeScheduler analogue: each call is one
    merge; callers may run them from separate processes against disjoint
    windows)."""
    from ..state.deletes import read_deletes
    from .incremental import _publish, list_shards

    shards = list_shards(root)
    window = select_merge(shards, segs_per_tier, max_merge_at_once)
    if window is None:
        return None
    merged_id = max(s["shard_id"] for s in shards) + 1
    out_dir = os.path.join(root, "shards", f"shard-{merged_id:05d}")
    dead = read_deletes(root)
    lo = min(s["doc_min"] for s in window)
    hi = max(s["doc_max"] for s in window)
    if dead is not None:
        dead = dead[(dead >= lo) & (dead <= hi)]
    manifest = compact_shards(
        [s["dir"] for s in window], out_dir, deleted=dead
    )
    entry = {
        "shard_id": merged_id,
        "dir": out_dir,
        "doc_count": manifest["doc_count"],
        "doc_min": lo,
        "doc_max": hi,
        "analyzer": manifest["analyzer"],
        "norm_kind": manifest["norm_kind"],
    }
    window_ids = {s["shard_id"] for s in window}
    remaining = [s for s in shards if s["shard_id"] not in window_ids]
    _publish(root, sorted(remaining + [entry], key=lambda s: s["doc_min"]))
    return entry


def split_index(
    index_dir: str,
    out_match: str,
    out_rest: str,
    query_text: str,
) -> tuple:
    """PKIndexSplitter analogue (reference: misc/src/java/org/apache/
    lucene/misc/index/PKIndexSplitter.java:40-95): split one index into
    two at the POSTINGS level — no re-analysis. Docs matching the query
    land in ``out_match``, all others in ``out_rest``. The reference
    wraps each side in a FilterCodecReader whose liveDocs are the
    query's hit bitset (resp. its complement) and addIndexes-copies it;
    here each side is a :func:`compact_shards` run whose ``deleted`` set
    is the OTHER side's doc ids — the same delete-aware postings
    rewrite, so positions/offsets/payloads carry over and each side gets
    its own live-docs-only collection statistics. Unlike the reference's
    addIndexes renumbering, ORIGINAL doc ids are preserved (they are
    external identities in this engine).

    Returns (manifest_match, manifest_rest)."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)
    all_ids = np.asarray(reader.all_doc_ids(), dtype=np.int64)
    rest = np.setdiff1d(all_ids, hits, assume_unique=True)
    m_match = compact_shards([index_dir], out_match, deleted=rest)
    m_rest = compact_shards([index_dir], out_rest, deleted=hits)
    _write_split_docmap(out_match, hits)
    _write_split_docmap(out_rest, rest)
    return m_match, m_rest


def _write_split_docmap(out_dir: str, ids) -> None:
    """Split outputs hold SPARSE doc-id sets, so the dense
    [0, doc_count) liveDocs fallback no longer applies — persist the
    side's id set as a docmap sidecar (what all_doc_ids reads first)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    dm = os.path.join(out_dir, "docmap")
    os.makedirs(dm, exist_ok=True)
    tmp = os.path.join(dm, "split-ids.parquet.tmp")
    pq.write_table(pa.table({"doc_id": pa.array(ids, pa.int64())}), tmp)
    os.replace(tmp, os.path.join(dm, "split-ids.parquet"))


def multi_split_index(
    index_dir: str, out_dirs: Sequence[str], seq: bool = False
) -> list:
    """MultiPassIndexSplitter analogue (reference: misc/src/java/org/
    apache/lucene/misc/index/MultiPassIndexSplitter.java:61-115): split
    an index into ``len(out_dirs)`` parts with artificially-applied
    deletes (the FakeDeleteIndexReader trick) — here each part is a
    delete-aware :func:`compact_shards` whose deleted set is the
    complement of its keep set.

    * ``seq=True``: contiguous ordinal ranges of maxDoc//n docs; the
      LAST part collects the integer-rounding remainder (:87-99).
    * ``seq=False`` (default): round-robin — part i keeps ordinals j
      with ``j % n == i`` (:100-106).

    Returns the per-part manifests; original doc ids preserved."""
    from .search import get_reader

    reader = get_reader(index_dir)
    all_ids = np.asarray(reader.all_doc_ids(), dtype=np.int64)
    n = len(out_dirs)
    if n < 2:
        raise ValueError("need at least 2 output parts")
    ordinals = np.arange(len(all_ids))
    manifests = []
    for i, out in enumerate(out_dirs):
        if seq:
            part_len = len(all_ids) // n
            lo = part_len * i
            hi = len(all_ids) if i == n - 1 else lo + part_len
            keep_mask = (ordinals >= lo) & (ordinals < hi)
        else:
            keep_mask = ordinals % n == i
        keep = all_ids[keep_mask]
        dead = all_ids[~keep_mask]
        manifests.append(compact_shards([index_dir], out, deleted=dead))
        _write_split_docmap(out, keep)
    return manifests


def rearrange_index(
    index_dir: str, out_dir: str, new_order
) -> dict:
    """IndexRearranger analogue (reference: misc/src/java/org/apache/
    lucene/misc/index/IndexRearranger.java — rewrite an index with
    documents assigned to a caller-chosen order, no re-analysis):
    ``new_order`` lists the ORIGINAL doc ids in their new sequence
    (every live doc exactly once); the output numbers them densely
    0..n-1 in that sequence. Rides the merge machinery: ids are remapped
    before the per-term doc sort, so postings, positions, offsets and
    payload streams all rebuild in the new order. An ``orig_id``
    doc-values sidecar carries external identities (doc-values sidecars
    themselves are not carried — same contract as compaction).

    Returns the output manifest."""
    from ..state.docvalues import write_doc_values

    new_order = np.asarray(new_order, dtype=np.int64)
    order_sort = np.argsort(new_order, kind="stable")
    old_sorted = new_order[order_sort]
    if len(old_sorted) > 1 and np.any(np.diff(old_sorted) <= 0):
        raise ValueError("new_order must list each doc id exactly once")
    new_ids = np.arange(len(new_order), dtype=np.int64)[order_sort]
    manifest = compact_shards(
        [index_dir], out_dir, remap=(old_sorted, new_ids)
    )
    import pyarrow as pa

    import ray.data

    write_doc_values(
        ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(
                        np.arange(len(new_order), dtype=np.int64)
                    ),
                    "orig_id": pa.array(new_order),
                }
            )
        ),
        out_dir,
        "orig_id",
    )
    return manifest


def bp_rearrange(
    index_dir: str,
    out_dir: str,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    max_iters: int = 20,
    min_partition_size: int = 32,
) -> tuple:
    """Merge-time BP reordering — the BPReorderingMergePolicy shape
    (misc/index/BPReorderingMergePolicy.java wraps BPIndexReorderer into
    the merge): compute the recursive-graph-bisection order from the
    INDEX ITSELF (postings inverted to the doc->term incidence, df
    window applied) and rewrite through :func:`rearrange_index` — no
    original dataset needed. Returns (manifest, stats) with the log-gap
    objective before/after."""
    from .bp_reorder import bp_permutation, log_gap_cost

    reader = IndexReader(index_dir)
    n_docs = reader.doc_count
    hi = max(int(max_df_frac * n_docs), min_df)
    pairs_d, pairs_t = [], []
    tid = 0
    for term in reader.all_terms():
        df, _ = reader.term_stats(term)
        if not (min_df <= df <= hi):
            continue
        for tp in reader.postings(term):
            d, _, _k = tp.decode_all()
            pairs_d.append(np.asarray(d, dtype=np.int64))
            pairs_t.append(np.full(len(d), tid, dtype=np.int64))
        tid += 1
    if tid == 0:
        raise ValueError("no terms inside the df window")
    doc_ids = np.concatenate(pairs_d)
    tids = np.concatenate(pairs_t)
    uniq_docs = np.unique(doc_ids)
    dpos = np.searchsorted(uniq_docs, doc_ids)
    o = np.lexsort((tids, dpos))
    dpos_s, tids_s = dpos[o], tids[o]
    counts = np.bincount(dpos_s, minlength=len(uniq_docs))
    indptr = np.concatenate(([0], np.cumsum(counts))).astype(np.int64)
    perm = bp_permutation(
        indptr, tids_s, tid, max_iters=max_iters,
        min_partition_size=min_partition_size,
    )
    stats = {
        "cost_before": log_gap_cost(
            indptr, tids_s, tid, np.arange(len(uniq_docs))
        ),
        "cost_after": log_gap_cost(indptr, tids_s, tid, perm),
        "n_docs": int(n_docs),
        "n_terms": tid,
    }
    ordered = uniq_docs[perm]
    rest = np.setdiff1d(
        np.asarray(IndexReader(index_dir).all_doc_ids(), dtype=np.int64),
        uniq_docs,
        assume_unique=True,
    )
    new_order = np.concatenate([ordered, rest])
    manifest = rearrange_index(index_dir, out_dir, new_order)
    return manifest, stats
