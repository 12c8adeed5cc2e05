"""Global term statistics as a Ray Data aggregation pipeline.

Reference analogue: per-term docFreq/totalTermFreq and per-field
docCount/sumTotalTermFreq accumulated at flush and summed across segments at
search time (core/.../search/CollectionStatistics.java, TermStatistics.java,
consumed at BM25Similarity.java:172-186).

Scale shape: AnalyzerStage already emits ONE row per (term, doc) with tf
pre-counted, and :func:`_partial_stats` combines those inside each batch to
one row per term per batch — so the ``groupby("term")`` shuffle moves
O(vocab x batches) rows, never O(tokens).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from .build import AnalyzerStage, IndexConfig


def _partial_stats(batch: pa.Table) -> pa.Table:
    """(term, doc_id, tf, ...) rows -> one (term, df_part, ttf_part) per term."""
    g = batch.group_by("term").aggregate([("doc_id", "count"), ("tf", "sum")])
    return pa.table(
        {
            "term": g.column("term"),
            "df_part": g.column("doc_id_count").cast(pa.int64()),
            "ttf_part": g.column("tf_sum").cast(pa.int64()),
        }
    )


def _rename_final(batch: pa.Table) -> pa.Table:
    return pa.table(
        {
            "term": batch.column("term"),
            "doc_freq": batch.column("sum(df_part)").cast(pa.int64()),
            "total_tf": batch.column("sum(ttf_part)").cast(pa.int64()),
        }
    )


def term_stats(
    ds: "ray.data.Dataset", cfg: Optional[IndexConfig] = None
) -> "ray.data.Dataset":
    """Dataset(text rows) -> Dataset(term, doc_freq, total_tf)."""
    cfg = cfg or IndexConfig()
    postings = ds.select_columns([cfg.id_col, cfg.text_col]).map_batches(
        AnalyzerStage(cfg),
        batch_format="pyarrow",
        batch_size=cfg.analyzer_batch_size,
        concurrency=cfg.analyzer_concurrency,
    )
    partial = postings.map_batches(_partial_stats, batch_format="pyarrow")
    final = partial.groupby("term").aggregate(Sum("df_part"), Sum("ttf_part"))
    return final.map_batches(_rename_final, batch_format="pyarrow")


def high_freq_terms(
    ds: "ray.data.Dataset",
    n: int = 100,
    order_by: str = "doc_freq",
    cfg: Optional[IndexConfig] = None,
) -> "ray.data.Dataset":
    """HighFreqTerms (misc/src/java/org/apache/lucene/misc/
    HighFreqTerms.java:94-152): the N most-frequent terms, ordered by
    docFreq (default) or totalTermFreq. The reference's bounded
    PriorityQueue keeps the comparator-greatest entries and breaks freq
    ties on the GREATER term text (DocFreqComparator :129-143), so the
    equivalent distributed form is a sort (freq desc, term desc) + limit
    — the vocab-sized sort is the same aggregation term_stats already
    shuffles once; nothing materializes on the driver."""
    if order_by not in ("doc_freq", "total_tf"):
        raise ValueError("order_by must be 'doc_freq' or 'total_tf'")
    st = term_stats(ds, cfg)
    return st.sort([order_by, "term"], descending=[True, True]).limit(n)
