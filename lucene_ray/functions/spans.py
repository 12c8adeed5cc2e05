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
from .query import _POS_SHIFT, _gather_norm_keys, _topk_from

_POS_MASK = (1 << _POS_SHIFT) - 1


@dataclass(frozen=True)
class SpanNearQuery:
    terms: Tuple[str, ...]
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanFirstQuery:
    term: str
    end: int  # match positions p (0-based) with p < end


@dataclass(frozen=True)
class SpanNotQuery:
    """SpanNotQuery (queries/spans/SpanNotQuery.java:40-71): spans of
    ``include`` with no ``exclude`` span within ``pre`` tokens before or
    ``post`` tokens after. Term-include subset: include spans are the
    term's width-1 positions, so a position p survives iff no exclude
    position lies in [p-pre, p+post]; frequency = surviving count
    (width-0 spans weigh 1 each). Scoring stats come from the include
    side only (the reference builds excludeWeight COMPLETE_NO_SCORES)."""

    include: str
    exclude: str
    pre: int = 0
    post: int = 0


def _doc_keys(reader, term: str) -> np.ndarray:
    """Doc-tagged position keys ``doc << POS_SHIFT | pos``, ascending —
    one flat sorted array over the whole index, so span chaining is a
    single global searchsorted per link instead of a per-doc loop (the
    same packing as the exact phrase matcher). Cached on the reader."""
    cache = reader.__dict__.setdefault("_span_keys", {})
    k = cache.get(term)
    if k is None:
        docs, tfs, flat = reader.term_positions(term)
        if len(flat) and int(flat.max()) + 1 >= (1 << _POS_SHIFT):
            raise ValueError("document too long for span key packing")
        k = (np.repeat(docs, tfs) << np.int64(_POS_SHIFT)) + flat.astype(
            np.int64
        )
        cache[term] = k
    return k


def _freqs_by_doc(match_keys: np.ndarray, weights: np.ndarray):
    """Segment-sum match weights by the doc tag of their anchor keys."""
    docs = match_keys >> np.int64(_POS_SHIFT)
    docs_u, inv = np.unique(docs, return_inverse=True)
    return docs_u, np.bincount(inv, weights=weights)


def _ordered_matches(key_lists: List[np.ndarray], slop: int):
    """Vectorized ordered chains over ALL docs at once: each link is one
    searchsorted into the next clause's global key array; a chain that
    crosses a doc boundary lands on a different doc tag and is dropped.
    -> (docs, float freqs)."""
    a = key_lists[0]
    ends = a
    valid = np.ones(len(a), dtype=bool)
    for nxt in key_lists[1:]:
        if len(nxt) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        idx = np.searchsorted(nxt, ends, side="right")
        valid &= idx < len(nxt)
        idx = np.minimum(idx, len(nxt) - 1)
        ends = nxt[idx]
    valid &= (ends >> np.int64(_POS_SHIFT)) == (a >> np.int64(_POS_SHIFT))
    gaps = (ends & _POS_MASK) - (a & _POS_MASK) - (len(key_lists) - 1)
    m = valid & (gaps <= slop)
    if not m.any():
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(a[m], 1.0 / (1.0 + gaps[m]))


def _unordered_matches(a: np.ndarray, b: np.ndarray, slop: int):
    """Vectorized two-clause merge intervals: for each a-key the valid
    b-indices form a contiguous range [jlo, jhi] (two-pointer yield
    condition) intersected with the +-(slop+1) key window; ranges are
    expanded flat with the cumsum-arange trick. -> (docs, float freqs)."""
    if len(a) == 0 or len(b) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    # previous a-key IN THE SAME DOC, else the doc floor (acts as -inf)
    a_prev = np.concatenate(([np.int64(-1)], a[:-1]))
    doc_floor = ((a >> np.int64(_POS_SHIFT)) << np.int64(_POS_SHIFT)) - 1
    a_prev = np.maximum(a_prev, doc_floor)
    w = np.int64(slop + 1)
    jlo = np.maximum(
        np.searchsorted(b, a_prev, side="right"),
        np.searchsorted(b, a - w, side="left"),
    )
    jhi = np.minimum(
        np.searchsorted(b, a, side="left"),
        np.searchsorted(b, a + w, side="right") - 1,
    )
    jhi = np.minimum(jhi, len(b) - 1)
    counts = np.maximum(jhi - jlo + 1, 0)
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    a_rep = np.repeat(a, counts)
    offs = np.concatenate(([0], np.cumsum(counts)[:-1]))
    flat_j = (
        np.arange(total, dtype=np.int64)
        - np.repeat(offs, counts)
        + np.repeat(jlo, counts)
    )
    b_keys = b[flat_j]
    same_doc = (b_keys >> np.int64(_POS_SHIFT)) == (
        a_rep >> np.int64(_POS_SHIFT)
    )
    gaps = np.abs(a_rep - b_keys) - 1
    m = same_doc & (gaps <= slop)
    if not m.any():
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(a_rep[m], 1.0 / (1.0 + gaps[m]))


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
    elif isinstance(query, SpanNotQuery):
        terms = (query.include,)
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
    key_cache: Dict[str, np.ndarray] = {}
    for t in terms:
        df, _ = reader.term_stats(t)
        if df == 0:
            return empty
        idf64 += math.log(1.0 + (reader.doc_count - df + 0.5) / (df + 0.5))
        if t not in key_cache:
            key_cache[t] = _doc_keys(reader, t)
    if isinstance(query, SpanFirstQuery):
        keys = key_cache[terms[0]]
        # positions with pos < end: one boolean over the flat key array,
        # segment-summed by doc tag
        m = (keys & _POS_MASK) < query.end
        if not m.any():
            return empty
        docs_u, pf = _freqs_by_doc(keys[m], np.ones(int(m.sum())))
    elif isinstance(query, SpanNotQuery):
        keys = key_cache[terms[0]]
        ex_df, _ = reader.term_stats(query.exclude)
        if ex_df == 0 or len(keys) == 0:
            surviving = keys  # nothing to exclude
        else:
            ex_keys = _doc_keys(reader, query.exclude)
            # include position p (doc-tagged key k) is rejected iff some
            # exclude position q lies in [p - pre, p + post]; in key space
            # that window is [k - pre, k + post], and the doc tag keeps it
            # doc-local (pre/post << 2^POS_SHIFT by construction)
            lo = keys - np.int64(query.pre)
            hi = keys + np.int64(query.post)
            left = np.searchsorted(ex_keys, lo, side="left")
            right = np.searchsorted(ex_keys, hi, side="right")
            surviving = keys[left == right]
        if len(surviving) == 0:
            return empty
        docs_u, pf = _freqs_by_doc(surviving, np.ones(len(surviving)))
    else:
        key_lists = [key_cache[t] for t in terms]
        if query.in_order:
            docs_u, pf = _ordered_matches(key_lists, query.slop)
        else:
            docs_u, pf = _unordered_matches(
                key_lists[0], key_lists[1], query.slop
            )
        if len(docs_u) == 0:
            return empty
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
