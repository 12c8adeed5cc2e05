"""Monitor-module analogue: saved-query matching (reverse search /
percolation) over a document stream.

Reference: the monitor module — ``monitor/src/java/org/apache/lucene/
monitor/Monitor.java`` (register MonitorQuery, match incoming docs),
``TermFilteredPresearcher.java`` (index the queries' terms; a document's
term set selects the candidate queries worth running) and
``CandidateMatcher.java`` (run each candidate query against the doc).

Ray-Data-first shape: the saved-query set is the SMALL side — it is parsed
once on the driver, flattened to a (term, query, role) table, and carried
into a ``map_batches`` stage (for very large query sets, pass the
flattened table through ``ray.put`` and hand the ObjectRef to the stage —
one object-store copy per node, exactly the broadcast-join pattern). The
document stream is never shuffled: each batch is tokenized, its distinct
(doc, term) pairs are hash-joined (pandas merge — vectorized) against the
query-term table, and per-(doc, query) role counts decide the boolean
match:

* matched MUST terms == total MUST terms of the query,
* matched SHOULD terms >= minimum_should_match (>= 1 when the query has
  no MUST clauses — same default as the scoring engine),
* matched MUST_NOT terms == 0.

This is the presearcher and the matcher fused into one vectorized pass:
the merge only produces rows for terms a query mentions, so a doc sharing
no vocabulary with a query costs nothing — the reference's term-filtered
candidate pruning, expressed as a join.

Supported saved queries: plain analyzed term clauses (MUST / SHOULD /
MUST_NOT, minimum_should_match). Multi-term / phrase / range clauses
raise — the reference's QueryDecomposer handles those by decomposition,
out of scope here.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

# role codes in the flattened query-term table
_MUST, _SHOULD, _MUST_NOT = 0, 1, 2


def flatten_queries(
    parsed: Dict[int, "object"]
) -> Tuple[pd.DataFrame, pd.DataFrame, Dict[int, "object"]]:
    """Parsed BooleanQuerys / PhraseQuerys -> (query-term table, per-query
    requirements, phrase map).

    Returns (qt, req, phrases): qt has columns (term, query_id, role); req
    has columns (query_id, n_must, msm_req) indexed by query_id. A
    PhraseQuery decomposes to its distinct terms as MUST presearcher rows
    (the reference's QueryDecomposer + TermFilteredPresearcher) and is
    recorded in ``phrases`` for the positional verify pass
    (CandidateMatcher running the real query on each candidate doc).
    """
    terms: List[str] = []
    qids: List[int] = []
    roles: List[int] = []
    req_rows = []
    phrases: Dict[int, "object"] = {}
    from ..functions.query import BooleanQuery, PhraseQuery

    for qid, q in sorted(parsed.items()):
        if isinstance(q, PhraseQuery):
            if q.slop:
                raise ValueError(
                    f"saved query {qid}: sloppy phrases are not supported "
                    "by the monitor (exact phrases only)"
                )
            if not q.terms:
                raise ValueError(f"saved query {qid}: empty phrase")
            for t in sorted(set(q.terms)):
                terms.append(t); qids.append(qid); roles.append(_MUST)
            req_rows.append((qid, len(set(q.terms)), 0))
            phrases[qid] = q
            continue
        if not isinstance(q, BooleanQuery):
            raise ValueError(
                f"saved query {qid}: only boolean term queries are supported"
            )
        if q.multi or q.filters or q.must_groups or q.boosts:
            raise ValueError(
                f"saved query {qid}: only plain term clauses are supported"
            )
        must = sorted(set(q.must))
        should = sorted(set(q.should) - set(must))
        must_not = sorted(set(q.must_not))
        if not must and not should:
            raise ValueError(f"saved query {qid}: no positive clauses")
        for t in must:
            terms.append(t); qids.append(qid); roles.append(_MUST)
        for t in should:
            terms.append(t); qids.append(qid); roles.append(_SHOULD)
        for t in must_not:
            terms.append(t); qids.append(qid); roles.append(_MUST_NOT)
        msm = q.minimum_should_match
        msm_req = msm if must else max(1, msm)
        req_rows.append((qid, len(must), msm_req))
    qt = pd.DataFrame({"term": terms, "query_id": qids, "role": roles})
    req = pd.DataFrame(
        req_rows, columns=["query_id", "n_must", "msm_req"]
    ).set_index("query_id")
    return qt, req, phrases


class QueryMatcherStage:
    """map_batches stage: document batch -> matching (doc_id, query_id)
    pairs. Analyzer built once per actor; the query tables ride in the
    closure (or an ObjectRef for big query sets)."""

    def __init__(self, query_strings: Dict[int, str],
                 analyzer_name: str = "en_nostem_simple"):
        from ..functions.analysis import make_analyzer
        from ..functions.query import parse_query

        self._an = make_analyzer(analyzer_name)
        parsed = {
            qid: parse_query(s, self._an) for qid, s in query_strings.items()
        }
        self._qt, req, self._phrases = flatten_queries(parsed)
        self._n_must = req["n_must"]
        self._msm_req = req["msm_req"]
        self._phrase_terms = frozenset(
            t for q in self._phrases.values() for t in q.terms
        )

    @staticmethod
    def _phrase_hit(pos_map: Dict[str, List[int]], q) -> bool:
        """Exact phrase verify on one candidate doc's positions (stopword
        offsets preserved) — ExactPhraseMatcher on the decomposed query."""
        base = pos_map.get(q.terms[0])
        if base is None:
            return False
        rest = [set(pos_map.get(t, ())) for t in q.terms[1:]]
        offs = q.offsets[1:]
        for p0 in base:
            if all((p0 + off) in s for s, off in zip(rest, offs)):
                return True
        return False

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        # distinct (doc, term) pairs for the whole batch; phrase-term
        # positions kept per doc for the verify pass (one analysis total)
        pair_docs: List[np.ndarray] = []
        pair_terms: List[np.ndarray] = []
        pos_maps: Dict[int, Dict[str, List[int]]] = {}
        pterms = self._phrase_terms
        for i, text in enumerate(texts):
            toks_l, pos_l = self._an.analyze_positions(text)
            toks = np.unique(np.asarray(toks_l, dtype=object))
            if pterms:
                pm: Dict[str, List[int]] = {}
                for t, p in zip(toks_l, pos_l):
                    if t in pterms:
                        pm.setdefault(t, []).append(p)
                if pm:
                    pos_maps[int(doc_ids[i])] = pm
            if len(toks):
                pair_docs.append(np.full(len(toks), doc_ids[i], dtype=np.int64))
                pair_terms.append(toks)
        empty = pa.table({
            "doc_id": pa.array([], pa.int64()),
            "query_id": pa.array([], pa.int64()),
        })
        if not pair_docs:
            return empty
        pairs = pd.DataFrame({
            "doc_id": np.concatenate(pair_docs),
            "term": np.concatenate(pair_terms),
        })
        hit = pairs.merge(self._qt, on="term", how="inner")
        if not len(hit):
            return empty
        counts = (
            hit.groupby(["doc_id", "query_id", "role"]).size()
            .unstack("role", fill_value=0)
            .reindex(columns=[_MUST, _SHOULD, _MUST_NOT], fill_value=0)
        )
        idx = counts.index.get_level_values("query_id")
        ok = (
            (counts[_MUST].to_numpy() == self._n_must.reindex(idx).to_numpy())
            & (counts[_SHOULD].to_numpy() >= self._msm_req.reindex(idx).to_numpy())
            & (counts[_MUST_NOT].to_numpy() == 0)
        )
        matched = counts.index[ok]
        m_docs = matched.get_level_values("doc_id").to_numpy()
        m_qids = matched.get_level_values("query_id").to_numpy()
        if self._phrases:
            keep = np.ones(len(m_docs), dtype=bool)
            for j, (d, qid) in enumerate(zip(m_docs, m_qids)):
                q = self._phrases.get(int(qid))
                if q is not None and not self._phrase_hit(
                    pos_maps.get(int(d), {}), q
                ):
                    keep[j] = False
            m_docs, m_qids = m_docs[keep], m_qids[keep]
        return pa.table({
            "doc_id": pa.array(m_docs, pa.int64()),
            "query_id": pa.array(m_qids, pa.int64()),
        })


def match_saved_queries(
    docs: "ray.data.Dataset",
    query_strings: Dict[int, str],
    analyzer_name: str = "en_nostem_simple",
    concurrency: Optional[int] = None,
) -> "ray.data.Dataset":
    """Document Dataset (doc_id, text) x saved queries -> matching
    (doc_id, query_id) pairs. Stateless w.r.t. the stream — pure
    map_batches, no shuffle; safe on an unbounded/incremental feed."""
    return docs.map_batches(
        QueryMatcherStage(query_strings, analyzer_name),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


class ExactMatcherStage:
    """DocumentBatch percolation: supports ANY query the classic parser
    produces (boolean with msm/must_not, exact AND sloppy phrases,
    prefix/wildcard/fuzzy multi-term clauses, boosts).

    Reference shape: the monitor module batches incoming documents into
    an ephemeral in-RAM index and runs each registered query against
    that ONE reader (monitor/src/java/org/apache/lucene/monitor/
    DocumentBatch.java + CandidateMatcher.java) — not doc-by-doc.

    Ray-Data-first: one vectorized analysis pass per batch builds a
    ``MemoryBatchIndex`` (state/memory_index.py — the AnalyzerStage
    inversion, real postings codec, full IndexReader protocol); each
    saved query then runs through the ENGINE's own ``matching_docs``
    with all its cross-document vectorization. No shuffle; the query
    set rides in the actor closure (``ray.put`` it for huge sets).
    Multi-term patterns expand against the batch vocabulary — the
    reference's ANYTOKEN bucket cost (re-running the query on every
    doc) disappears into one per-batch expansion."""

    def __init__(self, query_strings: Dict[int, str],
                 analyzer_name: str = "en_nostem_simple",
                 norm_kind: str = "byte4"):
        from ..functions.analysis import make_analyzer
        from ..functions.query import parse_query

        self._an = make_analyzer(analyzer_name)
        self._norm_kind = norm_kind
        self._queries: Dict[int, object] = {
            qid: parse_query(s, self._an) for qid, s in query_strings.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.query import matching_docs
        from ..state.memory_index import MemoryBatchIndex

        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        texts = batch.column("text").to_pylist()
        term_lists: List[List[str]] = []
        pos_lists: List[List[int]] = []
        an = self._an
        for t in texts:
            toks, pos = an.analyze_positions(t or "")
            term_lists.append(toks)
            pos_lists.append(pos)
        bidx = MemoryBatchIndex(
            doc_ids, term_lists, pos_lists, norm_kind=self._norm_kind,
            analyzer_name=getattr(an, "name", "custom"),
        )
        out_docs: List[np.ndarray] = []
        out_qids: List[np.ndarray] = []
        for qid, q in sorted(self._queries.items()):
            d = matching_docs(bidx, q)
            if len(d):
                out_docs.append(d)
                out_qids.append(np.full(len(d), qid, dtype=np.int64))
        if not out_docs:
            return pa.table({
                "doc_id": pa.array([], pa.int64()),
                "query_id": pa.array([], pa.int64()),
            })
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_docs)),
            "query_id": pa.array(np.concatenate(out_qids)),
        })


def match_saved_queries_exact(
    docs: "ray.data.Dataset",
    query_strings: Dict[int, str],
    analyzer_name: str = "en_nostem_simple",
    concurrency: Optional[int] = None,
) -> "ray.data.Dataset":
    """Percolation with FULL query semantics via the DocumentBatch
    architecture (ExactMatcherStage): one ephemeral MemoryBatchIndex per
    batch, every saved query runs once per batch through the engine's
    ``matching_docs`` — sloppy phrases, multi-term expansions, msm,
    anything ``parse_query`` yields, with no per-doc re-execution."""
    return docs.map_batches(
        ExactMatcherStage(query_strings, analyzer_name),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
