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
