"""Facet counting: category-value counts over ALL hits of a query.

Reference: the facet module (facet/src/java/org/apache/lucene/facet/ —
FacetsCollector gathers every matching doc, then taxonomy/SSDV facet
implementations count per category ordinal; 18,249 LoC inventoried in
SURVEY.md §2.6). Ray-Data-native shape:

1. the query engine enumerates ALL matching doc IDs (functions/query.py
   matching_docs — the FacetsCollector analogue);
2. the sorted ID array is broadcast once via ``ray.put`` (small side:
   ints, not rows);
3. one ``map_batches`` pass over the document-metadata Dataset computes a
   per-batch membership mask (searchsorted against the broadcast array)
   and partial per-value counts — the pre-aggregate-before-shuffle rule;
4. a tiny ``groupby(facet value).sum`` finishes.

At 10^12 docs the hit array itself can be large; then the same pipeline
runs per doc-range shard (matching_docs per shard, broadcast per shard)
and step 4 merges across shards — counts are additive.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def facet_counts(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <facet_col>)
    facet_col: str,
    id_col: str = "doc_id",
    top_n: Optional[int] = None,
):
    """-> Dataset(<facet_col>, count) for every facet value with >= 1 hit,
    descending count then ascending value; ``top_n`` keeps the head."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)  # sorted int64
    if len(hits) == 0:  # keep the output schema stable on zero hits
        base = docs_ds.schema().base_schema
        return ray.data.from_arrow(
            pa.table(
                {
                    facet_col: pa.array([], base.field(facet_col).type),
                    "count": pa.array([], pa.int64()),
                }
            )
        )
    hits_ref = ray.put(hits)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        if len(ids_sorted) == 0:
            return pa.table(
                {facet_col: pa.array([], batch.schema.field(facet_col).type),
                 "count_part": pa.array([], pa.int64())}
            )
        ids = batch.column(id_col).to_numpy()
        pos = np.searchsorted(ids_sorted, ids)
        pos_c = np.minimum(pos, len(ids_sorted) - 1)
        mask = ids_sorted[pos_c] == ids
        vals = batch.column(facet_col).filter(pa.array(mask))
        agg = pa.table({facet_col: vals}).group_by(facet_col).aggregate(
            [(facet_col, "count")]
        )
        return pa.table(
            {
                facet_col: agg.column(facet_col),
                "count_part": agg.column(f"{facet_col}_count"),
            }
        )

    out = (
        docs_ds.select_columns([id_col, facet_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(facet_col)
        .aggregate(ray.data.aggregate.Sum("count_part", alias_name="count"))
        .sort(["count", facet_col], descending=[True, False])
    )
    if top_n is not None:
        out = out.limit(top_n)
    return out


def range_facet_counts(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <numeric_col>)
    numeric_col: str,
    ranges: List[tuple],  # (label, lo, hi) — both ends inclusive
    id_col: str = "doc_id",
):
    """Range facets over a numeric column (facet/range/LongRangeFacetCounts
    — ``facet/src/java/org/apache/lucene/facet/range/LongRangeFacetCounts.java``:
    every named [min, max] range is counted independently over ALL hits;
    ranges may overlap; zero-count ranges are reported).

    Same shape as :func:`facet_counts`: hits broadcast once, one
    ``map_batches`` computes per-batch partial counts per range (a numpy
    bounds check per range — ranges are few, rows are many), a tiny
    groupby-sum finishes, and missing labels are re-added with count 0.
    -> Dataset(range_label, n_docs) in the caller's range order."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits_ref = ray.put(matching_docs(reader, q))
    labels = [r[0] for r in ranges]

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        out_labels, out_counts = [], []
        if len(ids_sorted):
            ids = batch.column(id_col).to_numpy()
            pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
            mask = ids_sorted[pos] == ids
            vals = batch.column(numeric_col).to_numpy()[mask]
            for label, lo, hi in ranges:
                out_labels.append(label)
                out_counts.append(int(np.count_nonzero((vals >= lo) & (vals <= hi))))
        return pa.table(
            {
                "range_label": pa.array(out_labels, pa.string()),
                "count_part": pa.array(out_counts, pa.int64()),
            }
        )

    agg = (
        docs_ds.select_columns([id_col, numeric_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("range_label")
        .aggregate(ray.data.aggregate.Sum("count_part", alias_name="n_docs"))
    )
    # Re-add zero-count ranges and restore caller order (result is tiny:
    # one row per named range).
    got = {r["range_label"]: r["n_docs"] for r in agg.take_all()}
    return pa.table(
        {
            "range_label": pa.array(labels, pa.string()),
            "n_docs": pa.array([got.get(l, 0) for l in labels], pa.int64()),
        }
    )


def drill_sideways_counts(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <all dim columns>)
    dims: dict,  # {column: selected value}
    id_col: str = "doc_id",
):
    """DrillSideways (``facet/src/java/org/apache/lucene/facet/DrillSideways.java``:
    for a DrillDownQuery with per-dimension filters, each dimension's facet
    counts are computed with every OTHER dimension's filter applied but not
    its own — so the UI can show sibling values; the drill-down hit count
    applies all filters).

    One broadcast of the base-query hit set + ONE ``map_batches`` pass
    computes all per-dimension partial counts (each dim's mask = base hits
    AND every other dim's equality filter) plus the all-filters drill-down
    count, then a tiny groupby-sum merges. -> Dataset(dim, facet_value,
    n_docs); the all-filters hit count rides as dim='__drilldown__'."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits_ref = ray.put(matching_docs(reader, q))
    dim_items = sorted(dims.items())

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        dcol, vcol, ccol = [], [], []
        if len(ids_sorted):
            ids = batch.column(id_col).to_numpy()
            pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
            base = ids_sorted[pos] == ids
            eq = {
                col: pc.equal(batch.column(col), pa.scalar(val)).to_numpy(
                    zero_copy_only=False
                )
                for col, val in dim_items
            }
            for col, _ in dim_items:
                m = base.copy()
                for other, _ in dim_items:
                    if other != col:
                        m &= eq[other]
                vals = batch.column(col).filter(pa.array(m)).cast(pa.string())
                g = pa.table({"v": vals}).group_by("v").aggregate([("v", "count")])
                dcol.extend([col] * len(g))
                vcol.extend(g.column("v").to_pylist())
                ccol.extend(g.column("v_count").to_pylist())
            dd = base
            for col, _ in dim_items:
                dd = dd & eq[col]
            dcol.append("__drilldown__")
            vcol.append("")
            ccol.append(int(np.count_nonzero(dd)))
        return pa.table(
            {
                "dim": pa.array(dcol, pa.string()),
                "facet_value": pa.array(vcol, pa.string()),
                "count_part": pa.array(ccol, pa.int64()),
            }
        )

    return (
        docs_ds.select_columns([id_col] + [c for c, _ in dim_items])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["dim", "facet_value"])
        .aggregate(ray.data.aggregate.Sum("count_part", alias_name="n_docs"))
        .sort(["dim", "facet_value"])
    )


def drill_down_topk(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <dim columns>)
    dims: dict,  # {column: required value}
    k: int = 10,
    id_col: str = "doc_id",
):
    """DrillDownQuery search (``facet/.../DrillDownQuery.java``: base query
    scored as usual, each dimension filter attached as a non-scoring FILTER
    clause): top-k (score desc, doc asc) among hits passing every filter.

    Scored base candidates are broadcast (ints + floats, the small side);
    one ``map_batches`` over the metadata table keeps rows matching all
    dims AND the candidate set, attaching scores; per-batch partial top-k
    (score >= kth, ties kept) bounds what the final tiny sort sees.
    -> pyarrow.Table(rank, doc_id, score[unrounded float64]), <= k rows."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    r = _exhaustive_candidates(reader, q)
    empty = pa.table(
        {
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if r is None or len(r[0]) == 0:
        return empty
    cand, acc, _ = r
    hits_ref = ray.put((np.asarray(cand, dtype=np.int64), acc.astype(np.float64)))
    dim_items = sorted(dims.items())

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted, scores = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        m = ids_sorted[pos] == ids
        for col, val in dim_items:
            m &= pc.equal(batch.column(col), pa.scalar(val)).to_numpy(
                zero_copy_only=False
            )
        d = ids[m]
        s = scores[pos[m]]
        if len(d) > k:  # partial top-k: keep every row >= the kth score
            kth = np.partition(s, len(s) - k)[len(s) - k]
            keep = s >= kth
            d, s = d[keep], s[keep]
        return pa.table({"doc_id": pa.array(d), "score": pa.array(s)})

    top = (
        docs_ds.select_columns([id_col] + [c for c, _ in dim_items])
        .map_batches(partial, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
    parts = [
        b for b in top.iter_batches(batch_format="pyarrow") if len(b)
    ]
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(t) + 1, dtype=np.int32)),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "score": t.column("score").cast(pa.float64()),
        }
    )


def grouped_search(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <group_col>)
    group_col: str,
    k_per_group: int = 2,
    id_col: str = "doc_id",
):
    """Top-k hits PER GROUP VALUE — the grouping module analogue
    (reference: grouping/src/java/org/apache/lucene/search/grouping/ —
    first-pass collector picks group heads, second pass top-k per group;
    4,566 LoC inventoried in SURVEY §2.6).

    Shape mirrors :func:`facet_counts`: ALL matching (doc, score) pairs
    are broadcast once (ints+floats, not rows); one ``map_batches`` over
    the metadata table attaches group values to hits; a groupby on the
    group value cuts each group's top-k by (score desc, doc asc).
    -> Dataset(grp, rank, doc_id, score[unrounded float64])."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    r = _exhaustive_candidates(reader, q)
    empty = pa.table(
        {
            "grp": pa.array([], pa.string()),
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if r is None or len(r[0]) == 0:
        return ray.data.from_arrow(empty)
    cand, acc, _ = r
    hits_ref = ray.put(
        (np.asarray(cand, dtype=np.int64), acc.astype(np.float64))
    )

    def attach(batch: pa.Table) -> pa.Table:
        ids_sorted, scores = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        mask = ids_sorted[pos] == ids
        sub = batch.filter(pa.array(mask))
        return pa.table(
            {
                "grp": sub.column(group_col).cast(pa.string()),
                "doc_id": sub.column(id_col),
                "score": pa.array(scores[pos[mask]]),
            }
        )

    def topk_group(group: pa.Table) -> pa.Table:
        g = group.sort_by([("score", "descending"), ("doc_id", "ascending")])
        g = g.slice(0, k_per_group)
        return pa.table(
            {
                "grp": g.column("grp"),
                "rank": pa.array(
                    np.arange(1, len(g) + 1, dtype=np.int32)
                ),
                "doc_id": g.column("doc_id"),
                "score": g.column("score"),
            }
        )

    return (
        docs_ds.select_columns([id_col, group_col])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(topk_group, batch_format="pyarrow")
    )


def collapse_search(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <collapse_col>)
    collapse_col: str,
    k: int = 10,
    id_col: str = "doc_id",
):
    """Field collapsing — ONE global top-k where each collapse-key value
    contributes at most its single best hit (reference:
    grouping/src/java/org/apache/lucene/search/grouping/CollapsingTopDocsCollector
    semantics: group head = best (score desc, doc asc) per key).

    Plan: hits broadcast once (same as :func:`grouped_search`); per-batch
    PRE-collapse keeps one row per key per batch, so the groupby shuffles
    at most (#keys x #blocks) rows, not all hits; the per-key reduce picks
    the global head; the final top-k is a distributed sort + limit over one
    row per key. -> Dataset(rank, grp, doc_id, score[unrounded float64])."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    r = _exhaustive_candidates(reader, q)
    empty = pa.table(
        {
            "rank": pa.array([], pa.int32()),
            "grp": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if r is None or len(r[0]) == 0:
        return ray.data.from_arrow(empty)
    cand, acc, _ = r
    hits_ref = ray.put(
        (np.asarray(cand, dtype=np.int64), acc.astype(np.float64))
    )

    def attach_collapse(batch: pa.Table) -> pa.Table:
        ids_sorted, scores = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        mask = ids_sorted[pos] == ids
        sub = pa.table(
            {
                "grp": batch.column(collapse_col).cast(pa.string()),
                "doc_id": batch.column(id_col),
                "score": pa.array(scores[pos]),
            }
        ).filter(pa.array(mask))
        # local collapse: best (score desc, doc asc) per key in this batch
        s = sub.sort_by(
            [("grp", "ascending"), ("score", "descending"),
             ("doc_id", "ascending")]
        )
        grp = s.column("grp").to_numpy(zero_copy_only=False)
        first = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            first[1:] = grp[1:] != grp[:-1]
        return s.filter(pa.array(first))

    def head(group: pa.Table) -> pa.Table:
        return group.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        ).slice(0, 1)

    def add_rank(batch: pa.Table) -> pa.Table:
        s = batch.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        )
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(s) + 1, dtype=np.int32)),
                "grp": s.column("grp"),
                "doc_id": s.column("doc_id"),
                "score": s.column("score"),
            }
        )

    return (
        docs_ds.select_columns([id_col, collapse_col])
        .map_batches(attach_collapse, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(head, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .repartition(1)
        .map_batches(add_rank, batch_format="pyarrow")
    )


def group_heads_by_field(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <key_col>, <field_col>)
    key_col: str,
    field_col: str,
    id_col: str = "doc_id",
):
    """AllGroupHeadsCollector — ONE head per group, ranked by a SORT
    FIELD rather than score (reference: grouping/src/java/org/apache/
    lucene/search/grouping/AllGroupHeadsCollector.java — "retrieves the
    most relevant document per group" under an arbitrary Sort; head =
    best (field desc, doc asc) among the query's hits). The row count is
    the distinct-group count, subsuming AllGroupsCollector.

    Plan (same scale shape as :func:`collapse_search`): the matching
    doc-id SET broadcasts once (ints only — no scores needed for a
    field-sorted head); per-batch local heads cap the shuffle at
    (#keys × #blocks) rows; the per-key reduce picks the global head.
    -> Dataset(grp, doc_id, head_val[int64]) sorted by grp asc."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = np.asarray(matching_docs(reader, q), dtype=np.int64)
    empty = pa.table(
        {
            "grp": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "head_val": pa.array([], pa.int64()),
        }
    )
    if len(hits) == 0:
        return ray.data.from_arrow(empty)
    hits_ref = ray.put(hits)

    def local_heads(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        sub = pa.table(
            {
                "grp": batch.column(key_col).cast(pa.string()),
                "doc_id": batch.column(id_col),
                "head_val": batch.column(field_col).cast(pa.int64()),
            }
        ).filter(pa.array(ids_sorted[pos] == ids))
        s = sub.sort_by(
            [("grp", "ascending"), ("head_val", "descending"),
             ("doc_id", "ascending")]
        )
        grp = s.column("grp").to_numpy(zero_copy_only=False)
        first = np.ones(len(s), dtype=bool)
        if len(s) > 1:
            first[1:] = grp[1:] != grp[:-1]
        return s.filter(pa.array(first))

    def head(group: pa.Table) -> pa.Table:
        return group.sort_by(
            [("head_val", "descending"), ("doc_id", "ascending")]
        ).slice(0, 1)

    return (
        docs_ds.select_columns([id_col, key_col, field_col])
        .map_batches(local_heads, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(head, batch_format="pyarrow")
        .sort("grp")
    )


def diversified_search(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <key_col>)
    key_col: str,
    k: int = 10,
    max_per_key: int = 2,
    id_col: str = "doc_id",
):
    """Diversified top-k — each key value contributes at most
    ``max_per_key`` hits to the global top-k (reference:
    misc/src/java/org/apache/lucene/misc/search/DiversifiedTopDocsCollector
    .java — 'collector that ensures only a limited number of results from
    a shared source are collected'; max_per_key=1 degenerates to field
    collapsing). Same plan shape as :func:`collapse_search` with head-1
    generalized to head-N: the per-batch pre-trim bounds the shuffle at
    max_per_key rows per (key, block).
    -> Dataset(rank, grp, doc_id, score[unrounded float64])."""
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    r = _exhaustive_candidates(reader, q)
    empty = pa.table(
        {
            "rank": pa.array([], pa.int32()),
            "grp": pa.array([], pa.string()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if r is None or len(r[0]) == 0:
        return ray.data.from_arrow(empty)
    cand, acc, _ = r
    hits_ref = ray.put(
        (np.asarray(cand, dtype=np.int64), acc.astype(np.float64))
    )

    def _head_n(t: pa.Table) -> pa.Table:
        s = t.sort_by(
            [("grp", "ascending"), ("score", "descending"),
             ("doc_id", "ascending")]
        )
        grp = s.column("grp").to_numpy(zero_copy_only=False)
        change = np.empty(len(s), dtype=bool)
        if len(s):
            change[0] = True
            change[1:] = grp[1:] != grp[:-1]
        starts = np.flatnonzero(change)
        rank = np.arange(len(s)) - np.repeat(
            starts, np.diff(np.append(starts, len(s)))
        )
        return s.filter(pa.array(rank < max_per_key))

    def attach(batch: pa.Table) -> pa.Table:
        ids_sorted, scores = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(
            np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
        )
        mask = ids_sorted[pos] == ids
        sub = pa.table(
            {
                "grp": batch.column(key_col).cast(pa.string()),
                "doc_id": batch.column(id_col),
                "score": pa.array(scores[pos]),
            }
        ).filter(pa.array(mask))
        return _head_n(sub)

    def add_rank(batch: pa.Table) -> pa.Table:
        s = batch.sort_by(
            [("score", "descending"), ("doc_id", "ascending")]
        )
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(s) + 1, dtype=np.int32)),
                "grp": s.column("grp"),
                "doc_id": s.column("doc_id"),
                "score": s.column("score"),
            }
        )

    return (
        docs_ds.select_columns([id_col, key_col])
        .map_batches(attach, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(_head_n, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
        .repartition(1)
        .map_batches(add_rank, batch_format="pyarrow")
    )


def taxonomy_facet_counts(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, *path_cols)
    path_cols: List[str],
    id_col: str = "doc_id",
    delimiter: str = "/",
):
    """Hierarchical (taxonomy) facet counts with rollup: every PREFIX of
    each hit's category path is counted, so one pass yields counts at all
    levels of the tree (reference: facet/taxonomy/FastTaxonomyFacetCounts
    .java — per-doc ordinals count up the taxonomy arrays, then
    getTopChildren(path) reads any level; facet/FacetField.java paths).

    The path of a doc is ``path_cols`` joined by ``delimiter`` (e.g.
    lang/source -> 'en/src3'). Same distributed shape as
    :func:`facet_counts`: hits broadcast once, one partial-count pass
    (each row contributes len(path_cols) prefix rows — the rollup is
    pre-aggregated inside the batch before the tiny final groupby).

    -> Dataset(level:int32, path:string, count:int64), sorted by
    (level asc, count desc, path asc).
    """
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)
    empty = pa.table(
        {
            "level": pa.array([], pa.int32()),
            "path": pa.array([], pa.string()),
            "count": pa.array([], pa.int64()),
        }
    )
    if len(hits) == 0:
        return ray.data.from_arrow(empty)
    hits_ref = ray.put(hits)
    ncols = list(path_cols)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(
            np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
        )
        mask = pa.array(ids_sorted[pos] == ids)
        sub = batch.filter(mask)
        if len(sub) == 0:
            return pa.table(
                {
                    "level": pa.array([], pa.int32()),
                    "path": pa.array([], pa.string()),
                    "count_part": pa.array([], pa.int64()),
                }
            )
        parts: List[pa.Table] = []
        path = None
        for lvl, col in enumerate(ncols, start=1):
            seg = sub.column(col).cast(pa.string())
            path = seg if path is None else pc.binary_join_element_wise(
                path, seg, delimiter
            )
            agg = (
                pa.table({"path": path})
                .group_by("path")
                .aggregate([("path", "count")])
            )
            parts.append(
                pa.table(
                    {
                        "level": pa.array([lvl] * len(agg), pa.int32()),
                        "path": agg.column("path"),
                        "count_part": agg.column("path_count").cast(
                            pa.int64()
                        ),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        docs_ds.select_columns([id_col, *ncols])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["level", "path"])
        .aggregate(ray.data.aggregate.Sum("count_part", alias_name="count"))
        .sort(["level", "count", "path"], descending=[False, True, False])
    )


def taxonomy_facet_associations(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, *path_cols, value_col)
    path_cols: List[str],
    value_col: str,
    id_col: str = "doc_id",
    delimiter: str = "/",
):
    """Taxonomy facet ASSOCIATIONS: per-path SUM of a per-doc association
    value instead of a doc count (reference: facet/src/java/org/apache/
    lucene/facet/taxonomy/TaxonomyFacetIntAssociations.java +
    TaxonomyFacetFloatAssociations.java with AssociationAggregationFunction
    .SUM — each hit contributes its association value to every prefix of
    its category path; facet/taxonomy/IntAssociationFacetField.java binds
    the value at index time, here it rides as a document column).

    Same distributed shape as :func:`taxonomy_facet_counts`: hit set
    broadcast once via the object store, per-batch prefix expansion +
    partial sums, one tiny final groupby. Integer association values sum
    exactly (order-free); float values follow float64 addition.

    -> Dataset(level:int32, path:string, value:...), sorted by
    (level asc, value desc, path asc).
    """
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)
    empty = pa.table(
        {
            "level": pa.array([], pa.int32()),
            "path": pa.array([], pa.string()),
            "value": pa.array([], pa.float64()),
        }
    )
    if len(hits) == 0:
        return ray.data.from_arrow(empty)
    hits_ref = ray.put(hits)
    ncols = list(path_cols)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(
            np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
        )
        mask = pa.array(ids_sorted[pos] == ids)
        sub = batch.filter(mask)
        if len(sub) == 0:
            return pa.table(
                {
                    "level": pa.array([], pa.int32()),
                    "path": pa.array([], pa.string()),
                    "value_part": pa.array([], pa.float64()),
                }
            )
        vals = sub.column(value_col).cast(pa.float64())
        parts: List[pa.Table] = []
        path = None
        for lvl, col in enumerate(ncols, start=1):
            seg = sub.column(col).cast(pa.string())
            path = seg if path is None else pc.binary_join_element_wise(
                path, seg, delimiter
            )
            agg = (
                pa.table({"path": path, "v": vals})
                .group_by("path")
                .aggregate([("v", "sum")])
            )
            parts.append(
                pa.table(
                    {
                        "level": pa.array([lvl] * len(agg), pa.int32()),
                        "path": agg.column("path"),
                        "value_part": agg.column("v_sum").cast(pa.float64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    return (
        docs_ds.select_columns([id_col, *ncols, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["level", "path"])
        .aggregate(ray.data.aggregate.Sum("value_part", alias_name="value"))
        .sort(["level", "value", "path"], descending=[False, True, False])
    )


# ---------------------------------------------------------------------------
# DocValuesStats — field statistics over the matching-doc set
# ---------------------------------------------------------------------------


def doc_values_stats(index_dir: str, query_text: str, field: str):
    """DocValuesStatsCollector analogue for a NUMERIC doc-values field
    (reference: misc/src/java/org/apache/lucene/misc/search/
    DocValuesStats.java:29-176, DocValuesStatsCollector.java:31-60): for
    every doc matching the query, a present value accumulates into
    (count, min, max, sum, mean, variance); a matching doc without a
    value for the field increments ``missing``.

    The reference accumulates Welford-style in doc order
    (DocValuesStats.java:163-170) and reports the POPULATION variance
    ``variance/count`` (:130-138). Distributed partials have no stable
    doc order, so the engine computes the same population variance via
    the mergeable (count, sum, sumsq) form — bit-order-independent
    because integer doc values below 2^26 keep every float64 partial sum
    exact — and rounds the float outputs (mean, variance, stdev) to 6 dp
    at the boundary.

    Plan (scale-safe): the hit set is broadcast ONCE via ``ray.put``;
    the doc-values sidecar parquet streams through one ``map_batches``
    partial pass; the final combine is a bounded ``ds.aggregate`` (one
    tiny row per block). -> one-row pyarrow Table
    (field, n_with_value, n_missing, vmin, vmax, vsum, mean, variance,
    stdev).
    """
    import math
    import os

    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from ..state.docvalues import DOCVALUES_DIR
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)  # sorted int64
    n_hits = int(len(hits))
    hits_ref = ray.put(hits)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        ids = batch.column("doc_id").to_numpy()
        vals = batch.column("value").to_numpy()
        if len(ids_sorted) and len(ids):
            pos = np.minimum(
                np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
            )
            m = vals[ids_sorted[pos] == ids]
        else:
            m = vals[:0]
        if len(m) == 0:
            return pa.table(
                {"cnt": pa.array([], pa.int64()),
                 "s": pa.array([], pa.float64()),
                 "ss": pa.array([], pa.float64()),
                 "mn": pa.array([], pa.int64()),
                 "mx": pa.array([], pa.int64())}
            )
        f = m.astype(np.float64)
        return pa.table(
            {"cnt": pa.array([len(m)], pa.int64()),
             "s": pa.array([float(f.sum())], pa.float64()),
             "ss": pa.array([float((f * f).sum())], pa.float64()),
             "mn": pa.array([int(m.min())], pa.int64()),
             "mx": pa.array([int(m.max())], pa.int64())}
        )

    dv_path = os.path.join(index_dir, DOCVALUES_DIR, field)
    agg = (
        ray.data.read_parquet(dv_path, columns=["doc_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .aggregate(
            ray.data.aggregate.Sum("cnt", alias_name="cnt"),
            ray.data.aggregate.Sum("s", alias_name="s"),
            ray.data.aggregate.Sum("ss", alias_name="ss"),
            ray.data.aggregate.Min("mn", alias_name="mn"),
            ray.data.aggregate.Max("mx", alias_name="mx"),
        )
    )
    agg = agg or {}
    cnt = int(agg.get("cnt") or 0)
    if cnt:
        s, ss = float(agg["s"]), float(agg["ss"])
        mean = s / cnt
        variance = max(ss / cnt - mean * mean, 0.0)
        row = {
            "vmin": int(agg["mn"]), "vmax": int(agg["mx"]),
            "vsum": int(s), "mean": round(mean, 6),
            "variance": round(variance, 6),
            "stdev": round(math.sqrt(variance), 6),
        }
    else:  # count()==0: reference reports mean/variance 0, min/max unset
        row = {"vmin": None, "vmax": None, "vsum": 0, "mean": 0.0,
               "variance": 0.0, "stdev": 0.0}
    return pa.table(
        {
            "field": pa.array([field], pa.string()),
            "n_with_value": pa.array([cnt], pa.int64()),
            "n_missing": pa.array([n_hits - cnt], pa.int64()),
            "vmin": pa.array([row["vmin"]], pa.int64()),
            "vmax": pa.array([row["vmax"]], pa.int64()),
            "vsum": pa.array([row["vsum"]], pa.int64()),
            "mean": pa.array([row["mean"]], pa.float64()),
            "variance": pa.array([row["variance"]], pa.float64()),
            "stdev": pa.array([row["stdev"]], pa.float64()),
        }
    )


def str_doc_values_stats(index_dir: str, query_text: str, field: str):
    """SortedDocValuesStats analogue (DocValuesStats.java:178-207): over
    the matching docs, count/missing plus the lexicographic min and max
    of the SORTED string doc-values field — same broadcast-hits +
    streaming-partials plan as :func:`doc_values_stats`; the combine
    materializes one tiny row per block (bounded).
    -> one-row pyarrow Table (field, n_with_value, n_missing, vmin, vmax).
    """
    import os

    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from ..state.docvalues import DOCVALUES_STR_DIR
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)
    n_hits = int(len(hits))
    hits_ref = ray.put(hits)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(hits_ref)
        ids = batch.column("doc_id").to_numpy()
        if len(ids_sorted) and len(ids):
            pos = np.minimum(
                np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
            )
            mask = ids_sorted[pos] == ids
        else:
            mask = np.zeros(len(ids), dtype=bool)
        vals = batch.column("value").filter(pa.array(mask))
        if len(vals) == 0:
            return pa.table(
                {"cnt": pa.array([], pa.int64()),
                 "mn": pa.array([], pa.string()),
                 "mx": pa.array([], pa.string())}
            )
        return pa.table(
            {"cnt": pa.array([len(vals)], pa.int64()),
             "mn": pa.array([pc.min(vals).as_py()], pa.string()),
             "mx": pa.array([pc.max(vals).as_py()], pa.string())}
        )

    dv_path = os.path.join(index_dir, DOCVALUES_STR_DIR, field)
    parts = (
        ray.data.read_parquet(dv_path, columns=["doc_id", "value"])
        .map_batches(partial, batch_format="pyarrow")
        .take_all()  # bounded: <= one row per block
    )
    cnt = sum(p["cnt"] for p in parts)
    mn = min((p["mn"] for p in parts), default=None)
    mx = max((p["mx"] for p in parts), default=None)
    return pa.table(
        {
            "field": pa.array([field], pa.string()),
            "n_with_value": pa.array([cnt], pa.int64()),
            "n_missing": pa.array([n_hits - cnt], pa.int64()),
            "vmin": pa.array([mn], pa.string()),
            "vmax": pa.array([mx], pa.string()),
        }
    )


def sampled_facet_counts(
    index_dir: str,
    query_text: str,
    docs_ds,  # ray.data.Dataset with (doc_id, <facet_col>)
    facet_col: str,
    sample_size: int,
    seed: int = 7,
    id_col: str = "doc_id",
):
    """RandomSamplingFacetsCollector + amortizeFacetCounts analogue
    (reference: facet/src/java/org/apache/lucene/facet/
    RandomSamplingFacetsCollector.java:117-141,158-213,236-242): when the
    query has more than ``sample_size`` hits, the hit sequence (doc-ID
    order) is cut into bins of ``int(1/samplingRate)`` docs and ONE doc
    per complete bin enters the sample; facet counts over the sample are
    then amortized as ``min(corpus docFreq(value), int(count/rate))``.

    DOCUMENTED DEVIATION: the reference picks the bin member with a
    sequential XORShift64 walk (:45-72 — inherently serial and
    order-dependent); this engine picks the bin member with the smallest
    Knuth multiplicative hash ``((doc+seed)*2654435761) mod 2^32`` (ties
    to the lower doc ID) — deterministic, order-free and parallelizable,
    with the same bin structure and the same one-sample-per-complete-bin
    cardinality, so the statistical guarantees are unchanged and the SQL
    oracle can reproduce the exact sample.

    Scale shape: the sampled ID set (<= sample_size) is broadcast once;
    one streaming partial-counts pass + a facet-cardinality-bounded
    combine; corpus per-value caps come from a tiny groupby.
    -> pyarrow Table (facet_value, sampled_count, amortized_count,
    total_hits, sampling_rate) sorted by value.
    """
    import ray
    import ray.data

    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from .search import get_reader

    from ..functions.rounding import round_half_away

    KNUTH = np.uint64(2654435761)
    MOD = np.uint64(1 << 32)

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)  # sorted int64
    n = int(len(hits))
    if n <= int(sample_size):
        sampled, rate = hits, 1.0
    else:
        rate = float(sample_size) / n
        bin_size = int(1.0 / rate)
        n_complete = n // bin_size
        idx = hits[: n_complete * bin_size]
        h = ((idx.astype(np.uint64) + np.uint64(seed)) * KNUTH) % MOD
        hm = h.reshape(n_complete, bin_size)
        sel = hm.argmin(axis=1)  # first occurrence == lower doc on ties
        sampled = idx.reshape(n_complete, bin_size)[
            np.arange(n_complete), sel
        ]
        sampled = np.sort(sampled)
    sampled_ref = ray.put(sampled)

    def partial(batch: pa.Table) -> pa.Table:
        ids_sorted = ray.get(sampled_ref)
        ids = batch.column(id_col).to_numpy()
        if len(ids_sorted) and len(ids):
            pos = np.minimum(
                np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1
            )
            mask = ids_sorted[pos] == ids
        else:
            mask = np.zeros(len(ids), dtype=bool)
        vals = batch.column(facet_col).filter(pa.array(mask))
        agg = pa.table({facet_col: vals}).group_by(facet_col).aggregate(
            [(facet_col, "count")]
        )
        return pa.table(
            {
                "v": agg.column(facet_col),
                "c": agg.column(f"{facet_col}_count").cast(pa.int64()),
            }
        )

    import ray.data as rd

    counts = {
        r["v"]: int(r["count"])
        for r in (
            docs_ds.select_columns([id_col, facet_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("v")
            .aggregate(rd.aggregate.Sum("c", alias_name="count"))
            .take_all()  # bounded: one row per facet value
        )
    }
    corpus = {
        r[facet_col]: int(r["count()"])
        for r in docs_ds.groupby(facet_col).count().take_all()
    }
    values = sorted(counts)
    amortized = [
        min(corpus.get(v, 0), int(counts[v] / rate)) for v in values
    ]
    return pa.table(
        {
            "facet_value": pa.array(values, pa.string()),
            "sampled_count": pa.array(
                [counts[v] for v in values], pa.int64()
            ),
            "amortized_count": pa.array(amortized, pa.int64()),
            "total_hits": pa.array([n] * len(values), pa.int64()),
            "sampling_rate": pa.array(
                [float(round_half_away(np.asarray([rate]), 9)[0])]
                * len(values),
                pa.float64(),
            ),
        }
    )


def compute_dynamic_numeric_ranges(
    values: np.ndarray, weights: np.ndarray, top_n: int
) -> List[dict]:
    """DynamicRangeUtil.computeDynamicNumericRanges (reference:
    facet/src/java/org/apache/lucene/facet/range/DynamicRangeUtil.java:
    204-270): sort (value, weight) pairs by (value, weight); sweep,
    closing a range whenever the weight accumulated SINCE THE LAST CLOSE
    reaches ``totalWeight / min(topN, len)``; leftovers become the final
    range. Rows report (count, weight, min, max, centroid=valueSum/count).

    The reset-on-close recurrence is sequential in the reference; here
    each boundary is one ``searchsorted`` on the weight prefix sum —
    O(topN log n) instead of O(n) — producing identical boundaries
    (first index where prefix >= base + target). Ties in (value, weight)
    are interchangeable elements, so any stable order yields identical
    range aggregates."""
    v = np.asarray(values, dtype=np.int64)
    w = np.asarray(weights, dtype=np.int64)
    n = len(v)
    if n == 0 or top_n <= 0:
        return []
    order = np.lexsort((w, v))
    v, w = v[order], w[order]
    pw = np.cumsum(w, dtype=np.int64)
    pv = np.cumsum(v, dtype=np.int64)
    total = int(pw[-1])
    target = float(total) / min(int(top_n), n)
    out: List[dict] = []
    start = 0  # index of the first element of the open range
    while start < n:
        base_w = int(pw[start - 1]) if start else 0
        j = int(np.searchsorted(pw, base_w + target, side="left"))
        if j >= n:  # tail range: remaining elements, below target
            j = n - 1
        base_v = int(pv[start - 1]) if start else 0
        cnt = j - start + 1
        vsum = int(pv[j]) - base_v
        out.append(
            {
                "count": cnt,
                "weight": int(pw[j]) - base_w,
                "min": int(v[start]),
                "max": int(v[j]),
                "centroid": float(vsum) / cnt,
            }
        )
        start = j + 1
    return out


def dynamic_range_facets(
    index_dir: str,
    query_text: str,
    field: str,
    top_n: int,
    weights_for=None,
) -> pa.Table:
    """Dynamic (equal-weight) range facets over the matching docs'
    numeric doc values (DynamicRangeUtil.computeDynamicRanges:55-122 —
    the collector gathers each hit's (value, weight) then runs
    computeDynamicNumericRanges).

    ``weights_for(hit_doc_ids) -> int64 weights`` (default: weight 1 per
    hit). The per-hit gather is reader-local vectorized doc-values
    access — bounded by the query's hit count, exactly the reference
    collector's footprint; the sweep itself is the reference's
    sequential semantics and cannot be composed from unordered partials
    (at corpus scale, use a quantile sketch instead — different, looser
    contract). -> Table(range_idx, count, weight, vmin, vmax, centroid)
    with centroid rounded 6 dp."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import matching_docs, parse_query
    from ..functions.rounding import round_half_away
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(query_text, make_analyzer(reader.analyzer_name))
    hits = matching_docs(reader, q)
    vals = reader.doc_values(field).values_for(hits)
    w = (
        np.asarray(weights_for(hits), dtype=np.int64)
        if weights_for is not None
        else np.ones(len(hits), dtype=np.int64)
    )
    ranges = compute_dynamic_numeric_ranges(vals, w, top_n)
    return pa.table(
        {
            "range_idx": pa.array(range(len(ranges)), pa.int32()),
            "count": pa.array([r["count"] for r in ranges], pa.int64()),
            "weight": pa.array([r["weight"] for r in ranges], pa.int64()),
            "vmin": pa.array([r["min"] for r in ranges], pa.int64()),
            "vmax": pa.array([r["max"] for r in ranges], pa.int64()),
            "centroid": pa.array(
                round_half_away(
                    np.asarray([r["centroid"] for r in ranges], np.float64),
                    6,
                ),
                pa.float64(),
            ),
        }
    )
