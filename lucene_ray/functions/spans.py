"""Span queries over the positions index (queries/spans module analogue).

Reference: ``queries/src/java/org/apache/lucene/queries/spans/`` —
``SpanNearQuery`` + ``NearSpansOrdered`` / ``NearSpansUnordered``,
``SpanFirstQuery``. Span enumeration semantics implemented here (and
mirrored verbatim by the SQL oracles):

* **Ordered** (``NearSpansOrdered``): for each position ``a`` of the
  first clause, greedily chain each later clause to its SMALLEST
  position strictly after the previous link (the reference's
  stretch-to-order + shrink-to-shortest-match — one candidate span per
  first-clause start, the shortest from that start). A completed chain
  ending at ``e`` matches when ``gap = e - a - (n-1) <= slop`` and
  contributes sloppyWeight ``1/(1+gap)`` to the span frequency
  (``SpanScorer.setFreqCurrentDoc`` accumulating
  ``docScorer.computeSlopFactor(matchWidth)``).
* **Unordered, two clauses** (``NearSpansUnordered``): the two-pointer
  merge over both position lists yields one candidate interval per
  advance step; pair ``(a_i, b_j)`` is yielded iff ``a_{i-1} < b_j`` and
  ``b_{j-1} < a_i`` (previous element of BOTH lists lies outside the
  interval). Each yielded pair with ``gap = |a-b| - 1 <= slop``
  contributes ``1/(1+gap)``.
* **SpanFirst** (``SpanFirstQuery``): width-1 spans of a term with
  0-based position ``p < end``; frequency = count of such positions.

Scoring mirrors PhraseQuery scoring (functions/query.py::_phrase_scored):
idf = sum of the clause terms' idfs (``SpanWeight`` builds its
Similarity.SimScorer from ALL the clauses' TermStatistics), tf = the
float span frequency, norm from the first term's payload.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Tuple

import numpy as np

from .bm25 import make_scorer
from .query import _gather_norm_keys, _topk_from


@dataclass(frozen=True)
class SpanNearQuery:
    terms: Tuple[str, ...]
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanFirstQuery:
    term: str
    end: int  # match positions p (0-based) with p < end


def _ordered_freq(plists: List[np.ndarray], slop: int) -> float:
    """Span frequency of one doc, ordered chains (vectorized over the
    first clause's positions)."""
    a = plists[0]
    ends = a.astype(np.int64)
    valid = np.ones(len(a), dtype=bool)
    for nxt in plists[1:]:
        idx = np.searchsorted(nxt, ends, side="right")
        valid &= idx < len(nxt)
        idx = np.minimum(idx, len(nxt) - 1)
        ends = nxt[idx].astype(np.int64)
    gaps = ends - a - (len(plists) - 1)
    m = valid & (gaps <= slop)
    return float(np.sum(1.0 / (1.0 + gaps[m]))) if m.any() else 0.0


def _unordered_freq(a: np.ndarray, b: np.ndarray, slop: int) -> float:
    """Span frequency of one doc, unordered two-clause merge."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    a_prev = np.concatenate(([-1], a[:-1]))
    jlo = np.searchsorted(b, a_prev, side="right")
    jhi = np.minimum(np.searchsorted(b, a, side="left"), len(b) - 1)
    f = 0.0
    for i in range(len(a)):
        if jlo[i] > jhi[i]:
            continue
        bs = b[jlo[i] : jhi[i] + 1]
        gaps = np.abs(int(a[i]) - bs) - 1
        m = gaps <= slop
        if m.any():
            f += float(np.sum(1.0 / (1.0 + gaps[m])))
    return f


def _positions_by_doc(reader, term: str):
    """term -> (docs, row starts, flat positions) for per-doc slicing."""
    docs, tfs, flat = reader.term_positions(term)
    starts = np.concatenate(([0], np.cumsum(tfs)))
    return docs, starts, flat


def span_scored(reader, query):
    """-> (docs, scores, dtype) for a span query over a positions-enabled
    index; same scoring tail as the phrase executor."""
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "span queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype), dtype)
    if isinstance(query, SpanFirstQuery):
        terms = (query.term,)
    else:
        terms = tuple(query.terms)
        if len(terms) < 2:
            raise ValueError("SpanNearQuery needs at least two clauses")
        if not query.in_order and len(terms) != 2:
            raise ValueError(
                "unordered span_near supports exactly two clauses"
            )
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    idf64 = 0.0
    pos_cache: Dict[str, tuple] = {}
    for t in terms:
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(1.0 + (reader.doc_count - df + 0.5) / (df + 0.5))
        if t not in pos_cache:
            pos_cache[t] = _positions_by_doc(reader, t)
    if isinstance(query, SpanFirstQuery):
        docs, starts, flat = pos_cache[terms[0]]
        counts = np.array(
            [
                int(
                    np.searchsorted(
                        flat[starts[i] : starts[i + 1]], query.end, "left"
                    )
                )
                for i in range(len(docs))
            ],
            dtype=np.float64,
        )
        keep = counts > 0
        docs_u, pf = docs[keep], counts[keep]
    else:
        cand = pos_cache[terms[0]][0]
        for t in terms[1:]:
            cand = np.intersect1d(cand, pos_cache[t][0], assume_unique=True)
            if len(cand) == 0:
                return empty
        rows = [
            (np.searchsorted(pos_cache[t][0], cand), pos_cache[t])
            for t in terms
        ]
        freqs = np.zeros(len(cand), dtype=np.float64)
        for ci in range(len(cand)):
            plists = [
                pc[2][pc[1][int(r[ci])] : pc[1][int(r[ci]) + 1]]
                for r, pc in rows
            ]
            if query.in_order:
                freqs[ci] = _ordered_freq(plists, query.slop)
            else:
                freqs[ci] = _unordered_freq(
                    plists[0], plists[1], query.slop
                )
        keep = freqs > 0
        docs_u, pf = cand[keep], freqs[keep]
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs_u):
        pos = np.minimum(np.searchsorted(deleted, docs_u), len(deleted) - 1)
        alive = deleted[pos] != docs_u
        docs_u, pf = docs_u[alive], pf[alive]
    if len(docs_u) == 0:
        return empty
    keys = _gather_norm_keys(reader, terms[0], docs_u)
    scorer = make_scorer(
        reader.norm_kind, reader.doc_count, reader.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if reader.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    scores = scorer.score_array(np.asarray(pf), keys)
    return docs_u.astype(np.int64), scores.astype(dtype, copy=False), dtype


def score_span(reader, query, k: int = 10):
    """Top-k (score desc, doc asc) for a SpanNearQuery / SpanFirstQuery."""
    r = span_scored(reader, query)
    docs, scores, _ = r
    return _topk_from(docs, scores, k)
