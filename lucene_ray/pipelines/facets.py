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
