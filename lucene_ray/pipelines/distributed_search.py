"""Distributed sharded search: per-shard scoring, driver-side TopDocs.merge.

The 10^12-doc query story (reference: IndexSearcher's per-leaf-slice
parallel search, search/IndexSearcher.java:106-108,323 + TopDocs.merge,
search/TopDocs.java:75-122):

1. **Stats phase** — one task per shard returns (df, ttf) for the analyzed
   query terms; the driver sums them into GLOBAL term statistics (the
   reference gathers stats across all segments in createWeight before any
   scoring — idf/avgdl must be global or shard scores are incomparable).
2. **Score phase** — one task per shard computes its local top-k using
   scorers built from the GLOBAL stats (a :class:`GlobalStatsView` wraps
   the local reader).
3. **Merge** — the driver k-way merges per-shard top-k by
   (score desc, global docID asc); doc ranges are disjoint so the order is
   total and equals the single-index result exactly.

Shards are PERSISTENT named actors (``ShardedSearchService``), one per
shard, because warm state — term dict, decoded hot postings, champion
lists — must live with the shard across queries; stateless tasks lose it
to worker scheduling (measured slower than a monolithic index). For
thousands of shards the same phases pipe through ``map_batches`` over a
(query, shard) product Dataset.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np

import ray

from ..functions.analysis import make_analyzer
from ..functions.query import (
    BooleanQuery,
    parse_query,
    query_terms,
    score_blockmax,
)


class GlobalStatsView:
    """Reader protocol view: local postings, GLOBAL collection statistics."""

    def __init__(self, local_reader, doc_count: int, sum_total_tf: int,
                 df_map: Dict[str, Tuple[int, int]]):
        self._local = local_reader
        self.doc_count = doc_count
        self.sum_total_tf = sum_total_tf
        self.avgdl = sum_total_tf / max(doc_count, 1)
        self.norm_kind = local_reader.norm_kind
        self.analyzer_name = local_reader.analyzer_name
        self.bm25_params = getattr(local_reader, "bm25_params", (1.2, 0.75))
        self.similarity = getattr(local_reader, "similarity", None)
        self._df = df_map

    def term_stats(self, term: str) -> Tuple[int, int]:
        # global (df, ttf) drive idf / collection models (LM-family
        # similarities need global totalTermFreq too); a term globally
        # present but locally absent simply yields an empty local cursor
        return self._df.get(term, (0, 0))

    def postings(self, term: str):
        return self._local.postings(term)

    def all_terms(self):
        return self._local.all_terms()

    def expand_multi(self, kind: str, pattern: str, arg: int):
        return self._local.expand_multi(kind, pattern, arg)

    def __getattr__(self, name):
        # everything not overridden above is LOCAL reader surface —
        # liveDocs tombstones (`deleted`), positions, doc-values filters,
        # doc-ID enumeration, term positions, ... Proxying keeps scorers
        # delete-aware and position-capable under global stats.
        return getattr(self._local, name)


_READER_CACHE: Dict[tuple, object] = {}


def _get_reader(index_dir: str):
    from ..state.deletes import deletes_fingerprint
    from ..state.reader import IndexReader
    from .incremental import registry_fingerprint

    # keyed like pipelines/search.py: publishing new tombstones OR a new
    # incremental shard must reopen, or a warm shard actor keeps serving
    # a stale commit point
    key = (index_dir, deletes_fingerprint(index_dir),
           registry_fingerprint(index_dir))
    r = _READER_CACHE.get(key)
    if r is None:
        # a new fingerprint supersedes older readers of the same dir —
        # evict them so an actor's cache holds ONE reader per shard
        for stale in [k for k in _READER_CACHE if k[0] == index_dir]:
            del _READER_CACHE[stale]
        r = IndexReader(index_dir)
        _READER_CACHE[key] = r
    return r


class ShardedSearchService:
    """Persistent per-shard searcher actors + driver-side TopDocs.merge.

    The 10^12-doc serving architecture: each node (here: actor) holds ONE
    doc-range shard resident — term dict, hot postings, champion lists —
    and every query fans out to all shards, so per-shard bytes/query fall
    as 1/num_shards. Results are exactly equal to searching one monolithic
    index over the union of the shards (global stats are summed before any
    scoring, and disjoint doc ranges make (score desc, doc asc) total)."""

    def __init__(self, index_dirs: Sequence[str], mode: str = "blockmax",
                 k1: float = 1.2, b: float = 0.75, similarity=None):
        from ..state.reader import IndexReader

        @ray.remote
        class _ShardSearcher:
            def __init__(self, index_dir: str, k1: float, b: float,
                         similarity):
                self.index_dir = index_dir
                self.bm25 = (k1, b)
                self.sim = similarity
                self._reader()  # warm the initial reader

            def _reader(self):
                # re-resolved per call: the cache key includes the
                # tombstone fingerprint, so publishing deletes reopens on
                # the next query instead of the warm actor serving a
                # pre-delete reader forever (NRT reopen analogue)
                r = _get_reader(self.index_dir)
                r.bm25_params = self.bm25
                r.similarity = self.sim
                return r

            def term_stats(self, terms: List[str]):
                reader = self._reader()
                return {t: reader.term_stats(t) for t in terms}

            def expand(self, keys: List[tuple]):
                reader = self._reader()
                return {kk: reader.expand_multi(*kk) for kk in keys}

            def topk(self, queries, k, doc_count, sum_total_tf, df_map):
                view = GlobalStatsView(
                    self._reader(), doc_count, sum_total_tf, df_map
                )
                return {
                    qid: score_blockmax(view, q, k) for qid, q in queries
                }

            def topk_spans(self, queries, k, doc_count, sum_total_tf,
                           df_map):
                from ..functions.spans import score_span

                view = GlobalStatsView(
                    self._reader(), doc_count, sum_total_tf, df_map
                )
                return {
                    qid: score_span(view, q, k) for qid, q in queries
                }

            def topk_automaton(self, queries, k, doc_count,
                               sum_total_tf, df_map):
                from ..functions.term_automaton import (
                    score_term_automaton,
                )

                view = GlobalStatsView(
                    self._reader(), doc_count, sum_total_tf, df_map
                )
                return {
                    qid: score_term_automaton(view, q, k)
                    for qid, q in queries
                }

            def topk_payloads(self, queries, k):
                # pure payload folds need no cross-shard statistics: the
                # fold is per doc and docs live on exactly one shard
                from ..functions.payloads import score_payload

                reader = self._reader()
                return {
                    qid: score_payload(reader, term, k=k, function=fn)
                    for qid, (term, fn) in queries
                }

        self.index_dirs = list(index_dirs)
        manifests = [IndexReader(d).manifest for d in self.index_dirs]
        self.doc_count = sum(m["doc_count"] for m in manifests)
        self.sum_total_tf = sum(m["sum_total_tf"] for m in manifests)
        self.analyzer = make_analyzer(manifests[0]["analyzer"])
        self._actors = [
            _ShardSearcher.remote(d, k1, b, similarity)
            for d in self.index_dirs
        ]

    def search(
        self, query_texts: Sequence[str], k: int = 10
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        queries: List[Tuple[int, BooleanQuery]] = [
            (i, parse_query(t, self.analyzer))
            for i, t in enumerate(query_texts)
        ]
        # phase 0 (only when needed): resolve prefix/wildcard/fuzzy
        # clauses against the UNION of the shards' term dictionaries so
        # every shard scores the same expanded set under the same stats
        multi_keys = sorted(
            {
                (kk, p, a)
                for _, q in queries
                for (kk, p, a, _r) in getattr(q, "multi", ())
            }
        )
        if multi_keys:
            from ..functions.multiterm import MAX_EXPANSIONS, resolve_multi

            merged: Dict[tuple, set] = {kk: set() for kk in multi_keys}
            for shard_exp in ray.get(
                [a.expand.remote(multi_keys) for a in self._actors]
            ):
                for key, terms in shard_exp.items():
                    merged[key].update(terms)
            cache = {
                kk: sorted(v)[:MAX_EXPANSIONS] for kk, v in merged.items()
            }
            queries = [
                (qid, resolve_multi(q, (), cache)
                 if getattr(q, "multi", ()) else q)
                for qid, q in queries
            ]
        # every term in every query TREE (phrases and nested groups
        # included) — global df must cover them all before scoring
        all_terms = sorted(
            {t for _, q in queries for t in query_terms(q)}
        )

        # phase 1: global term stats (one round trip per shard, parallel)
        df_map: Dict[str, Tuple[int, int]] = {}
        for shard_stats in ray.get(
            [a.term_stats.remote(all_terms) for a in self._actors]
        ):
            for t, (df, ttf) in shard_stats.items():
                d0, t0 = df_map.get(t, (0, 0))
                df_map[t] = (d0 + df, t0 + ttf)

        # phase 2: per-shard top-k under global stats
        per_shard = ray.get(
            [
                a.topk.remote(
                    queries, k, self.doc_count, self.sum_total_tf, df_map
                )
                for a in self._actors
            ]
        )

        # phase 3: TopDocs.merge — (score desc, global docID asc)
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for qid, _ in queries:
            entries = []
            for shard_out in per_shard:
                docs, scores = shard_out[qid]
                entries.extend(
                    zip((-s for s in scores.tolist()), docs.tolist())
                )
            entries.sort()  # (-score asc, doc asc) == (score desc, doc asc)
            top = entries[:k]
            dtype = per_shard[0][qid][1].dtype if per_shard else np.float32
            out[qid] = (
                np.asarray([d for _, d in top], dtype=np.int64),
                np.asarray([-s for s, _ in top], dtype=dtype),
            )
        return out

    def search_spans(
        self, span_queries: Sequence, k: int = 10
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Doc-range-sharded span serving (SpanNear / SpanFirst /
        SpanPositionRange / SpanOr / SpanNot / SpanContaining /
        SpanWithin): global (df, ttf) gathered for every clause term so
        each shard scores under whole-corpus stats, then TopDocs.merge —
        result-identical to a single index because doc ranges are
        disjoint and positions are shard-local."""
        from ..functions.spans import span_query_terms

        queries = list(enumerate(span_queries))
        all_terms = sorted(
            {t for _, q in queries for t in span_query_terms(q)}
        )
        df_map: Dict[str, Tuple[int, int]] = {}
        for shard_stats in ray.get(
            [a.term_stats.remote(all_terms) for a in self._actors]
        ):
            for t, (df, ttf) in shard_stats.items():
                d0, t0 = df_map.get(t, (0, 0))
                df_map[t] = (d0 + df, t0 + ttf)
        per_shard = ray.get(
            [
                a.topk_spans.remote(
                    queries, k, self.doc_count, self.sum_total_tf, df_map
                )
                for a in self._actors
            ]
        )
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for qid, _ in queries:
            entries = []
            for shard_out in per_shard:
                docs, scores = shard_out[qid]
                entries.extend(
                    zip((-s for s in scores.tolist()), docs.tolist())
                )
            entries.sort()
            top = entries[:k]
            dtype = per_shard[0][qid][1].dtype if per_shard else np.float32
            out[qid] = (
                np.asarray([d for _, d in top], dtype=np.int64),
                np.asarray([-s for s, _ in top], dtype=dtype),
            )
        return out

    def search_automata(
        self, automata: Sequence, k: int = 10
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Sharded TermAutomatonQuery serving: global (df, ttf) gathered
        for every automaton term (the one-SimScorer idf sum must see
        whole-corpus stats), each shard runs the multiset DP over its
        local positions, TopDocs.merge finishes — result-identical to a
        single index (doc ranges disjoint, matching is doc-local)."""
        queries = list(enumerate(automata))
        all_terms = sorted({t for _, q in queries for t in q.terms})
        df_map: Dict[str, Tuple[int, int]] = {}
        for shard_stats in ray.get(
            [a.term_stats.remote(all_terms) for a in self._actors]
        ):
            for t, (df, ttf) in shard_stats.items():
                d0, t0 = df_map.get(t, (0, 0))
                df_map[t] = (d0 + df, t0 + ttf)
        per_shard = ray.get(
            [
                a.topk_automaton.remote(
                    queries, k, self.doc_count, self.sum_total_tf, df_map
                )
                for a in self._actors
            ]
        )
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for qid, _ in queries:
            entries = []
            for shard_out in per_shard:
                docs, scores = shard_out[qid][:2]
                entries.extend(
                    zip((-s for s in np.asarray(scores).tolist()),
                        docs.tolist())
                )
            entries.sort()
            top = entries[:k]
            out[qid] = (
                np.asarray([d for _, d in top], dtype=np.int64),
                np.asarray([-s for s, _ in top], dtype=np.float64),
            )
        return out

    def search_payloads(
        self, payload_queries: Sequence[Tuple[str, str]], k: int = 10
    ) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
        """Sharded PayloadScoreQuery serving (pure payload fold): each
        (term, function) query runs per shard — the fold is per-doc and
        doc ranges are disjoint, so no statistics round-trip is needed —
        then TopDocs.merge. Result-identical to a single index."""
        queries = list(enumerate(payload_queries))
        per_shard = ray.get(
            [a.topk_payloads.remote(queries, k) for a in self._actors]
        )
        out: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}
        for qid, _ in queries:
            entries = []
            for shard_out in per_shard:
                docs, scores = shard_out[qid]
                entries.extend(
                    zip((-s for s in scores.tolist()), docs.tolist())
                )
            entries.sort()
            top = entries[:k]
            dtype = per_shard[0][qid][1].dtype if per_shard else np.float32
            out[qid] = (
                np.asarray([d for _, d in top], dtype=np.int64),
                np.asarray([-s for s, _ in top], dtype=dtype),
            )
        return out

    def shutdown(self) -> None:
        for a in self._actors:
            ray.kill(a)
        self._actors = []


def search_sharded(
    index_dirs: Sequence[str],
    query_texts: Sequence[str],
    k: int = 10,
) -> Dict[int, Tuple[np.ndarray, np.ndarray]]:
    """One-shot wrapper: transient ShardedSearchService (cold actors).
    Hold a ShardedSearchService yourself for warm repeated serving."""
    svc = ShardedSearchService(index_dirs)
    try:
        return svc.search(query_texts, k=k)
    finally:
        svc.shutdown()
