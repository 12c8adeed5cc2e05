"""Query-side driver: top-k BM25 search over a built index.

Two paths (reference analogue: search/IndexSearcher.java — per-leaf-slice
parallel search with a final TopDocs.merge):

* :func:`search` — driver-side execution for one or a few queries
  (index readers cached per process).
* :func:`search_dataset` — Ray-Data-native batch search: queries as a
  Dataset routed through a stateful actor pool (``map_batches(QueryExecStage,
  concurrency=N)``); each actor opens the index once in ``__init__`` (term
  dicts + blobs resident — the reference's warm searcher) and executes a
  batch of queries per call. This is the scale path: queries stream through
  the pool with backpressure, and the per-actor index view could be narrowed
  to a doc-range shard for 10^12-doc indexes (driver would then merge
  per-shard top-k exactly like TopDocs.merge, search/TopDocs.java:75-122 —
  global docIDs make (score desc, doc_id asc) a total, partition-invariant
  order).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa

from ..functions.analysis import make_analyzer
from ..functions.query import parse_query, score_blockmax, score_exhaustive
from ..state.reader import IndexReader

_READER_CACHE: Dict[str, object] = {}


def get_reader(index_dir: str):
    """Reader for a single-index dir OR an incremental root (shards.json).

    Cached per (dir, tombstone fingerprint, commit fingerprint):
    publishing new deletes OR a new incremental shard yields a fresh
    reader on the next call (the reference's reopen-after-commit /
    ControlledRealTimeReopenThread visibility), so warm caches never
    serve stale liveDocs or miss appended shards."""
    from ..state.deletes import deletes_fingerprint
    from .incremental import registry_fingerprint

    key = (index_dir, deletes_fingerprint(index_dir),
           registry_fingerprint(index_dir))
    r = _READER_CACHE.get(key)
    if r is None:
        # newer tombstones supersede older readers of the same dir —
        # evict so the per-process cache holds one reader per index
        for stale in [k for k in _READER_CACHE if k[0] == index_dir]:
            del _READER_CACHE[stale]
        if os.path.exists(os.path.join(index_dir, "shards.json")):
            from .incremental import open_index

            r = open_index(index_dir)
        else:
            r = IndexReader(index_dir)
        _READER_CACHE[key] = r
    return r


def search(index_dir: str, query_text: str, k: int = 10,
           mode: str = "blockmax",
           k1: float = 1.2, b: float = 0.75) -> pa.Table:
    """-> Arrow table (rank, doc_id, score) for one query string. ``k1``/
    ``b`` set the searcher's BM25 parameters (IndexSearcher.setSimilarity
    analogue; caches key on them, so mixing values is safe)."""
    reader = get_reader(index_dir)
    reader.bm25_params = (k1, b)
    analyzer = make_analyzer(reader.analyzer_name)
    q = parse_query(query_text, analyzer)
    exec_fn = score_blockmax if mode == "blockmax" else score_exhaustive
    docs, scores = exec_fn(reader, q, k)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(docs) + 1, dtype=np.int32)),
            "doc_id": pa.array(docs.astype(np.int64)),
            "score": pa.array(scores.astype(np.float64)),
        }
    )


class QueryExecStage:
    """Stateful actor: warm index + analyzer, executes query batches."""

    def __init__(self, index_dir: str, k: int = 10, mode: str = "blockmax",
                 k1: float = 1.2, b: float = 0.75, similarity=None,
                 parser: str = "classic"):
        self.reader = get_reader(index_dir)
        self.reader.bm25_params = (k1, b)
        # IndexSearcher.setSimilarity analogue: None = BM25(k1, b);
        # ("lmd", mu) / ("classic",) select functions/similarities.py
        # models. Always assigned so a cached reader never leaks a
        # previous stage's similarity into this one.
        self.reader.similarity = similarity
        self.analyzer = make_analyzer(self.reader.analyzer_name)
        self.k = k
        self.exec_fn = score_blockmax if mode == "blockmax" else score_exhaustive
        if parser == "simple":
            # SimpleQueryParser syntax (functions/simple_parser.py);
            # defaultOperator MUST mirrors the reference test harness
            from ..functions.simple_parser import parse_simple_query

            self.parse = lambda text, an: parse_simple_query(
                text, an, default_operator="must"
            )
        else:
            self.parse = parse_query

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids: List[int] = []
        ranks: List[np.ndarray] = []
        docs_out: List[np.ndarray] = []
        scores_out: List[np.ndarray] = []
        ids = batch.column("query_id").to_pylist()
        texts = batch.column("query").to_pylist()
        ks = (
            batch.column("k").to_pylist()
            if "k" in batch.schema.names
            else [self.k] * len(ids)
        )
        for qid, text, k in zip(ids, texts, ks):
            q = self.parse(text, self.analyzer)
            docs, scores = self.exec_fn(self.reader, q, int(k))
            qids.extend([qid] * len(docs))
            ranks.append(np.arange(1, len(docs) + 1, dtype=np.int32))
            docs_out.append(docs.astype(np.int64))
            scores_out.append(scores.astype(np.float64))
        empty_i32 = np.empty(0, dtype=np.int32)
        empty_i64 = np.empty(0, dtype=np.int64)
        empty_f64 = np.empty(0, dtype=np.float64)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids, dtype=np.int64)),
                "rank": pa.array(
                    np.concatenate(ranks) if ranks else empty_i32
                ),
                "doc_id": pa.array(
                    np.concatenate(docs_out) if docs_out else empty_i64
                ),
                "score": pa.array(
                    np.concatenate(scores_out) if scores_out else empty_f64
                ),
            }
        )


class SearchService:
    """Persistent warm-searcher pool for online / repeated query serving.

    ``search_dataset`` fits batch pipelines, but each call builds a fresh
    actor pool, so per-actor warm state (decoded hot postings, scored-list
    caches) dies with the call. A search *service* is the reference's
    deployment model — an application holds warm ``IndexSearcher``s and
    routes queries to them (search/IndexSearcher.java usage; Solr/ES keep
    searchers resident the same way). Here: N named Ray actors created
    once, each holding the index reader; query batches round-robin across
    them and results gather on the driver.
    """

    def __init__(self, index_dir: str, num_searchers: int = 4,
                 mode: str = "blockmax", k1: float = 1.2, b: float = 0.75):
        import ray

        @ray.remote
        class _Searcher:
            def __init__(self, index_dir: str, mode: str,
                         k1: float, b: float):
                self.reader = get_reader(index_dir)
                self.reader.bm25_params = (k1, b)
                self.analyzer = make_analyzer(self.reader.analyzer_name)
                self.exec_fn = (
                    score_blockmax if mode == "blockmax" else score_exhaustive
                )

            def search_many(self, items):
                out = []
                for qid, text, k in items:
                    q = parse_query(text, self.analyzer)
                    docs, scores = self.exec_fn(self.reader, q, int(k))
                    out.append(
                        (qid, docs.astype(np.int64), scores.astype(np.float64))
                    )
                return out

        self._actors = [
            _Searcher.remote(index_dir, mode, k1, b)
            for _ in range(num_searchers)
        ]

    def warm(self, queries: Sequence[str], k: int = 10) -> None:
        """Run ``queries`` on EVERY searcher so all caches are hot."""
        import ray

        items = [(i, q, k) for i, q in enumerate(queries)]
        ray.get([a.search_many.remote(items) for a in self._actors])

    def search(self, queries: Sequence[str], k: int = 10,
               batch_size: int = 4) -> pa.Table:
        """-> Arrow table (query_id, rank, doc_id, score), all queries."""
        import ray

        items = [(i, q, k) for i, q in enumerate(queries)]
        refs = [
            self._actors[bi % len(self._actors)].search_many.remote(
                items[bi * batch_size : (bi + 1) * batch_size]
            )
            for bi in range(-(-len(items) // batch_size))
        ]
        qids, ranks, docs_out, scores_out = [], [], [], []
        for batch in ray.get(refs):
            for qid, docs, scores in batch:
                qids.extend([qid] * len(docs))
                ranks.append(np.arange(1, len(docs) + 1, dtype=np.int32))
                docs_out.append(docs)
                scores_out.append(scores)
        return pa.table(
            {
                "query_id": pa.array(np.asarray(qids, dtype=np.int64)),
                "rank": pa.array(
                    np.concatenate(ranks) if ranks else np.empty(0, np.int32)
                ),
                "doc_id": pa.array(
                    np.concatenate(docs_out)
                    if docs_out
                    else np.empty(0, np.int64)
                ),
                "score": pa.array(
                    np.concatenate(scores_out)
                    if scores_out
                    else np.empty(0, np.float64)
                ),
            }
        )

    def shutdown(self) -> None:
        import ray

        for a in self._actors:
            ray.kill(a)
        self._actors = []


def search_dataset(
    index_dir: str,
    queries,  # ray.data.Dataset with (query_id, query[, k]) or list[str]
    k: int = 10,
    mode: str = "blockmax",
    concurrency: Optional[int] = None,
    batch_size: int = 64,
):
    """Batch search as a Ray Data pipeline -> Dataset(query_id, rank,
    doc_id, score)."""
    import ray.data

    pool = concurrency or 4
    if isinstance(queries, (list, tuple)):
        # one block per batch: blocks are the unit of actor assignment, so a
        # single-block query set would serialize through one actor
        n_blocks = max(1, min(len(queries), -(-len(queries) // batch_size)))
        n_blocks = max(n_blocks, min(pool, len(queries)))
        queries = ray.data.from_items(
            [{"query_id": i, "query": q, "k": k} for i, q in enumerate(queries)],
            override_num_blocks=n_blocks,
        )
    return queries.map_batches(
        QueryExecStage,
        fn_constructor_args=(index_dir, k, mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool,
    )
