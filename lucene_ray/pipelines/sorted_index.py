"""Index-time sorting — IndexWriterConfig.setIndexSort analogue.

Reference: core/src/java/org/apache/lucene/index/IndexSorter.java,
index/Sorter.java (segment docs permuted by the sort at flush/merge) and
TopFieldCollector's early-termination path
(``canEarlyTerminate(searchSort, indexSort)``).

Our form: global doc IDs are REASSIGNED so ascending doc-ID order equals
(sort_field asc, original id asc), then the normal build runs over the
renumbered stream — the doc-range-contiguous shard invariant is untouched.
The original external id travels as an ``orig_id`` doc-values column (the
stored-field identity) and results are mapped back at the edge.

What the sorted layout buys at query time (:func:`sorted_topk_by_field`):
matching docs come out of the postings already in field order, so a top-k
by that field needs O(k + boundary-ties + log n) doc-value gathers and NO
sort over the candidate set — against O(candidates) gathers + a full
lexsort on an unsorted index. For single-term queries the posting decode
itself early-terminates: only the edge blocks of the doc-ordered list are
decoded, growing until the window provably contains the kth value's whole
tie run; multi-clause queries fall back to full candidate enumeration
(the reference's canEarlyTerminate also only fires when the collector can
bound remaining hits).

Scale notes: id reassignment is an explicit range-partitioned sort — a
sampled-boundary bucket pass, a B-row count reduce, and a per-bucket
enumerate; the renumbered stream is materialized once (at cluster scale it
would be persisted as sorted parquet — the same rewrite Lucene pays when
sorting segments) and feeds the build plus two doc-values passes.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np
import pyarrow as pa

import ray
import ray.data

_GOLD = np.uint64(0x9E3779B97F4A7C15)

INDEX_SORT_META = "index_sort.json"
ORIG_ID_FIELD = "orig_id"


def _int64_col(batch: pa.Table, col: str) -> np.ndarray:
    c = batch.column(col)
    if pa.types.is_timestamp(c.type):
        c = c.cast(pa.int64())
    return c.to_numpy(zero_copy_only=False).astype(np.int64)


def assign_sorted_doc_ids(
    ds: "ray.data.Dataset",
    sort_col: str,
    id_col: str = "doc_id",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Renumber docs so ascending ``doc_id`` order == (sort_col asc,
    original id asc) order. Output carries every input column, with
    ``doc_id`` replaced by the new id and the input id kept as ``orig_id``.

    Explicit range-partitioned sort: sampled quantile boundaries -> bucket
    tag -> per-bucket counts (B rows to the driver for the prefix offsets)
    -> per-bucket (value, id) sort + offset enumeration. Equal sort values
    always share a bucket, so the within-bucket sort is globally correct.
    """

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table(
                {"_h": pa.array([], pa.uint64()), "_v": pa.array([], pa.int64())}
            )
        vals = _int64_col(batch, sort_col)
        h = ids.astype(np.uint64) * _GOLD
        kk = min(64, len(ids))
        idx = (
            np.argpartition(h, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
        )
        return pa.table({"_h": pa.array(h[idx]), "_v": pa.array(vals[idx])})

    rows = (
        ds.map_batches(sample, batch_format="pyarrow")
        .sort("_h")
        .limit(num_buckets * 8)
        .take_all()
    )
    svals = np.sort(np.asarray([r["_v"] for r in rows], dtype=np.int64))
    if len(svals) == 0:
        edges = np.empty(0, dtype=np.int64)
    else:
        cuts = [
            svals[(len(svals) * i) // num_buckets]
            for i in range(1, num_buckets)
        ]
        edges = np.unique(np.asarray(cuts, dtype=np.int64))
    edges_ref = ray.put(edges)

    def tag(batch: pa.Table) -> pa.Table:
        e = ray.get(edges_ref)
        vals = _int64_col(batch, sort_col)
        b = np.searchsorted(e, vals, side="right").astype(np.int32)
        return batch.append_column("_sbucket", pa.array(b))

    tagged = ds.map_batches(tag, batch_format="pyarrow")
    counts = {
        int(r["_sbucket"]): int(r["count()"])
        for r in tagged.groupby("_sbucket").count().take_all()
    }
    n_buckets = len(edges) + 1
    offs = np.zeros(n_buckets + 1, dtype=np.int64)
    for b in range(n_buckets):
        offs[b + 1] = offs[b] + counts.get(b, 0)
    offs_ref = ray.put(offs)

    def enumerate_bucket(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return group
        b = int(group.column("_sbucket")[0].as_py())
        vals = _int64_col(group, sort_col)
        ids = group.column(id_col).to_numpy().astype(np.int64)
        order = np.lexsort((ids, vals))
        g = group.take(pa.array(order)).drop_columns(["_sbucket", id_col])
        base = int(ray.get(offs_ref)[b])
        new_ids = base + np.arange(len(g), dtype=np.int64)
        return g.append_column(
            ORIG_ID_FIELD, pa.array(ids[order])
        ).append_column(id_col, pa.array(new_ids))

    return tagged.groupby("_sbucket").map_groups(
        enumerate_bucket, batch_format="pyarrow"
    )


def build_sorted_index(
    ds: "ray.data.Dataset",
    out_dir: str,
    cfg=None,
    sort_col: str = "warc_ts",
    doc_count: Optional[int] = None,
) -> dict:
    """Build an index whose doc-ID order is the ``sort_col`` order, with
    ``sort_col`` and ``orig_id`` doc-values sidecars and an ``index_sort``
    marker the query side checks before early-terminating."""
    from ..state.docvalues import write_doc_values
    from .build import IndexConfig, build_index

    cfg = cfg or IndexConfig()
    sds = assign_sorted_doc_ids(ds, sort_col, id_col=cfg.id_col).materialize()
    manifest = build_index(sds, out_dir, cfg, doc_count=doc_count)
    write_doc_values(
        sds.select_columns([cfg.id_col, sort_col]), out_dir, sort_col
    )
    write_doc_values(
        sds.select_columns([cfg.id_col, ORIG_ID_FIELD]),
        out_dir,
        ORIG_ID_FIELD,
        value_col=ORIG_ID_FIELD,
    )
    meta = {"field": sort_col, "order": "asc"}
    tmp = os.path.join(out_dir, INDEX_SORT_META + ".tmp")
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, os.path.join(out_dir, INDEX_SORT_META))
    return manifest


def index_sort_field(index_dir: str) -> Optional[str]:
    path = os.path.join(index_dir, INDEX_SORT_META)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f).get("field")


def _single_term_of(query) -> Optional[str]:
    """The term when ``query`` is a plain one-term disjunction (TermQuery
    image) with no other clauses — the early-termination-eligible shape."""
    from ..functions.query import BooleanQuery

    if (
        isinstance(query, BooleanQuery)
        and len(query.should) == 1
        and not query.must
        and not query.must_not
        and not getattr(query, "multi", ())
        and not getattr(query, "filters", ())
        and not getattr(query, "must_groups", ())
    ):
        return query.should[0]
    return None


def _live_filter(reader, docs: np.ndarray) -> np.ndarray:
    deleted = getattr(reader, "deleted", None)
    if deleted is None or len(deleted) == 0 or len(docs) == 0:
        return docs
    pos = np.searchsorted(deleted, docs)
    pos = np.minimum(pos, len(deleted) - 1)
    return docs[deleted[pos] != docs]


def _term_docs_edge(reader, term: str, need: int, from_end: bool):
    """First (or last) ``need`` LIVE doc IDs of a term's postings,
    ascending — decodes only the blocks it touches, walking the doc-range-
    ordered parts from the chosen end. Returns (docs, exhausted)."""
    parts = reader.postings(term)
    out = []
    got = 0
    part_iter = reversed(parts) if from_end else iter(parts)
    done = False
    for tp in part_iter:
        blocks = (
            range(tp.n_blocks - 1, -1, -1) if from_end else range(tp.n_blocks)
        )
        for b in blocks:
            docs, _, _ = tp.decode_block(b)
            docs = _live_filter(reader, docs)
            out.append(docs)
            got += len(docs)
            if got >= need:
                done = True
                break
        if done:
            break
    if from_end:
        out.reverse()
    docs = (
        np.concatenate(out).astype(np.int64)
        if out
        else np.empty(0, np.int64)
    )
    return docs, not done


def sorted_topk_by_field(
    reader,
    query,
    field: str,
    k: int = 10,
    descending: bool = True,
):
    """Early-terminating sort-by-field top-k over a sorted index.

    Requires ``index_sort_field(reader.index_dir) == field`` (raises
    otherwise). Matching docs are already in (field asc, orig asc) order,
    so the top-k window is a slice of the candidate array; only the slice
    (plus all boundary-value ties, found by a log-n binary search of
    single-value gathers) pays a doc-values gather. Ties on the boundary
    value are re-ranked by orig asc — within equal values internal doc
    order IS orig order, so the internal lexsort suffices.

    Returns ``(orig_docs, values)`` in (value desc|asc, orig asc) order —
    the same contract as ``score_sort_by_field`` on an unsorted index.
    """
    from ..functions.query import matching_docs

    if index_sort_field(reader.index_dir) != field:
        raise ValueError(
            f"index at {reader.index_dir!r} is not sorted by {field!r}"
        )
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64))
    if k <= 0:
        return empty
    term = _single_term_of(query)
    if term is not None:
        # postings-level early termination (TopFieldCollector's
        # canEarlyTerminate path): decode blocks from the needed end only,
        # growing the window until it provably contains the kth value's
        # whole tie run (the edge-most fetched value differs from the
        # boundary value — values are contiguous in doc order)
        need = max(k, 16)
        while True:
            docs, exhausted = _term_docs_edge(
                reader, term, need, from_end=descending
            )
            if exhausted or len(docs) == 0:
                break
            vals_edge = reader.doc_values_for(
                field, docs[[0, len(docs) - k, k - 1, len(docs) - 1]]
            )
            if descending and vals_edge[0] != vals_edge[1]:
                break
            if not descending and vals_edge[3] != vals_edge[2]:
                break
            need *= 4
    else:
        docs = matching_docs(reader, query)
    n = len(docs)
    if n == 0:
        return empty

    def val_at(i: int) -> int:
        return int(reader.doc_values_for(field, docs[i : i + 1])[0])

    k_eff = min(k, n)
    if descending:
        # window = last k docs; extend left over all ties at the boundary
        boundary = val_at(n - k_eff)
        lo, hi = 0, n - k_eff
        while lo < hi:
            mid = (lo + hi) // 2
            if val_at(mid) == boundary:
                hi = mid
            else:
                lo = mid + 1
        window = docs[lo:]
        wvals = np.asarray(
            reader.doc_values_for(field, window), dtype=np.int64
        )
        order = np.lexsort((window, -wvals))[:k_eff]
    else:
        boundary = val_at(k_eff - 1)
        lo, hi = k_eff - 1, n - 1
        # rightmost index whose value == boundary
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if val_at(mid) == boundary:
                lo = mid
            else:
                hi = mid - 1
        window = docs[: lo + 1]
        wvals = np.asarray(
            reader.doc_values_for(field, window), dtype=np.int64
        )
        order = np.lexsort((window, wvals))[:k_eff]
    sel = window[order]
    orig = np.asarray(
        reader.doc_values_for(ORIG_ID_FIELD, sel), dtype=np.int64
    )
    return orig, wvals[order]
