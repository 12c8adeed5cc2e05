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
class SpanPositionRangeQuery:
    """SpanPositionRangeQuery (queries/spans/SpanPositionRangeQuery.java:
    accept spans with startPosition() >= start and endPosition() <= end).
    Term subset: width-1 spans at p have start=p, end=p+1, so a position
    matches iff ``start <= p <= end - 1``. SpanFirstQuery is the start=0
    special case (SpanFirstQuery.java extends this class)."""

    term: str
    start: int
    end: int


@dataclass(frozen=True)
class SpanOrQuery:
    """SpanOrQuery (queries/spans/SpanOrQuery.java): the union of the
    clause spans. Term-clause subset: every position of every present
    term is a width-1 match weighing 1 (two terms at the same position
    are two distinct spans, both counted — the reference's
    DisiPriorityQueue emits each sub-span). Absent terms drop out
    (zero-df clauses contribute no spans); idf sums the PRESENT clauses'
    idfs in declaration order (SpanWeight builds its scorer from all
    clause TermStatistics)."""

    terms: Tuple[str, ...]


@dataclass(frozen=True)
class SpanMultiTermNearQuery:
    """SpanMultiTermQueryWrapper composed under SpanNearQuery
    (reference: queries/src/java/org/apache/lucene/queries/spans/
    SpanMultiTermQueryWrapper.java:41-76 — a multiterm query rewrites to
    the SpanOr of its dictionary expansions and then participates as an
    ordinary span clause). ``clause_sets``: one tuple of accepted terms
    per slot (an expanded wrapper, or a single literal); a slot's span
    is width-1 at any member position (the SpanOr union — members
    cannot share a position in linearly-tokenized text). Absent members
    drop out of their slot; a slot with NO present member empties the
    query. idf sums every present term slot-by-slot in declaration
    order; norms gather from whichever present term the doc carries
    (the SpanOr union gather)."""

    clause_sets: Tuple[Tuple[str, ...], ...]
    slop: int = 0
    in_order: bool = True


@dataclass(frozen=True)
class SpanContainingQuery:
    """SpanContainingQuery (queries/spans/SpanContainingQuery.java +
    ContainSpans.java): big spans that CONTAIN at least one little span.
    Implemented shape: big = ordered SpanNearQuery chain [a..e], little =
    a term (width-1 at q); containment = a <= q <= e. Matches keep the
    big chain's sloppyWeight 1/(1+gap); scoring stats sum idf over big
    AND little terms (SpanContainQuery extracts terms from both sides)."""

    big: "SpanNearQuery"
    little: str


@dataclass(frozen=True)
class SpanWithinQuery:
    """SpanWithinQuery (queries/spans/SpanWithinQuery.java): little spans
    that lie WITHIN some big span. Little = term (width-1 at q), big =
    ordered SpanNearQuery chain [a..e]; q matches iff some chain in the
    same doc has a <= q <= e; each surviving little position weighs 1
    (width-0 sloppyWeight). Stats sum idf over big AND little terms."""

    big: "SpanNearQuery"
    little: str


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
    single global searchsorted per link instead of a per-doc loop. The
    LRU-bounded base-key cache is SHARED with the phrase matchers
    (functions/query.py::_packed_pos_keys — same packing)."""
    from .query import _packed_pos_keys

    keys, max_pos = _packed_pos_keys(reader, term)
    if max_pos + 1 >= (1 << _POS_SHIFT):
        raise ValueError("document too long for span key packing")
    return keys


def _freqs_by_doc(match_keys: np.ndarray, weights: np.ndarray):
    """Segment-sum match weights by the doc tag of their anchor keys."""
    docs = match_keys >> np.int64(_POS_SHIFT)
    docs_u, inv = np.unique(docs, return_inverse=True)
    return docs_u, np.bincount(inv, weights=weights)


def _ordered_chains(key_lists: List[np.ndarray]):
    """Vectorized ordered chains over ALL docs at once: each link is one
    searchsorted into the next clause's global key array; a chain that
    crosses a doc boundary lands on a different doc tag and is dropped.
    -> (anchor keys, end keys, int gaps) of every completed same-doc
    chain, ascending anchor order (ends are then non-decreasing: the
    greedy smallest-successor link is monotone in its input)."""
    a = key_lists[0]
    ends = a
    valid = np.ones(len(a), dtype=bool)
    for nxt in key_lists[1:]:
        if len(nxt) == 0:
            e = np.empty(0, np.int64)
            return e, e, np.empty(0, np.int64)
        idx = np.searchsorted(nxt, ends, side="right")
        valid &= idx < len(nxt)
        idx = np.minimum(idx, len(nxt) - 1)
        ends = nxt[idx]
    valid &= (ends >> np.int64(_POS_SHIFT)) == (a >> np.int64(_POS_SHIFT))
    gaps = (ends & _POS_MASK) - (a & _POS_MASK) - (len(key_lists) - 1)
    return a[valid], ends[valid], gaps[valid]


def _ordered_matches(key_lists: List[np.ndarray], slop: int):
    """Ordered chains within slop, folded to (docs, float freqs)."""
    a, _ends, gaps = _ordered_chains(key_lists)
    m = gaps <= slop
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


def _gather_norm_keys_union(reader, terms, docs_u: np.ndarray) -> np.ndarray:
    """Norm keys for docs that may contain ANY of ``terms`` (SpanOr union:
    a doc need not contain the first clause). Norm keys are doc-level
    (analyzed doc length), so any containing term supplies the value."""
    parts_d, parts_k = [], []
    for t in terms:
        for tp in reader.postings(t):
            d, _, k = tp.decode_all()
            parts_d.append(d)
            parts_k.append(k)
    alld = np.concatenate(parts_d)
    allk = np.concatenate(parts_k)
    order = np.argsort(alld, kind="stable")
    alld, allk = alld[order], allk[order]
    pos = np.minimum(np.searchsorted(alld, docs_u), len(alld) - 1)
    return allk[pos]


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
    norm_union = False
    if isinstance(query, SpanFirstQuery):
        terms = (query.term,)
    elif isinstance(query, SpanPositionRangeQuery):
        terms = (query.term,)
    elif isinstance(query, SpanNotQuery):
        terms = (query.include,)
    elif isinstance(query, SpanOrQuery):
        # absent clauses drop out of the union instead of emptying it
        terms = tuple(t for t in query.terms if reader.term_stats(t)[0] > 0)
        if not terms:
            return empty
        norm_union = True
    elif isinstance(query, SpanMultiTermNearQuery):
        mt_sets = []
        for cs in query.clause_sets:
            present = tuple(
                t for t in cs if reader.term_stats(t)[0] > 0
            )
            if not present:
                return empty  # a slot with no indexed member cannot match
            mt_sets.append(present)
        if len(mt_sets) < 2:
            raise ValueError(
                "SpanMultiTermNearQuery needs at least two slots"
            )
        if not query.in_order and len(mt_sets) != 2:
            raise ValueError(
                "unordered span_near supports exactly two clauses"
            )
        terms = tuple(t for s_ in mt_sets for t in s_)
        norm_union = True
    elif isinstance(query, (SpanContainingQuery, SpanWithinQuery)):
        big = query.big
        if not big.in_order or len(big.terms) < 2:
            raise ValueError(
                "containing/within need an ordered SpanNearQuery big side"
            )
        terms = tuple(big.terms) + (query.little,)
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
    elif isinstance(query, SpanPositionRangeQuery):
        keys = key_cache[terms[0]]
        pos = keys & _POS_MASK
        # width-1 span [p, p+1]: start >= query.start and end <= query.end
        m = (pos >= query.start) & (pos <= query.end - 1)
        if not m.any():
            return empty
        docs_u, pf = _freqs_by_doc(keys[m], np.ones(int(m.sum())))
    elif isinstance(query, SpanOrQuery):
        union = np.concatenate([key_cache[t] for t in terms])
        docs_u, pf = _freqs_by_doc(union, np.ones(len(union)))
    elif isinstance(query, (SpanContainingQuery, SpanWithinQuery)):
        big_lists = [key_cache[t] for t in query.big.terms]
        anchors, ends, gaps = _ordered_chains(big_lists)
        m = gaps <= query.big.slop
        anchors, ends, gaps = anchors[m], ends[m], gaps[m]
        little = key_cache[query.little]
        if len(anchors) == 0 or len(little) == 0:
            return empty
        if isinstance(query, SpanContainingQuery):
            # big span [a..e] contains a width-1 little span iff some
            # little key lies in [a, e] (doc tags keep it doc-local)
            has = np.searchsorted(little, anchors, side="left") < (
                np.searchsorted(little, ends, side="right")
            )
            if not has.any():
                return empty
            docs_u, pf = _freqs_by_doc(
                anchors[has], 1.0 / (1.0 + gaps[has])
            )
        else:
            # little q lies within some chain iff the LAST chain with
            # anchor <= q still ends at or after q (anchors ascending,
            # ends non-decreasing — greedy links are monotone)
            j = np.searchsorted(anchors, little, side="right") - 1
            ok = j >= 0
            jc = np.maximum(j, 0)
            ok &= ends[jc] >= little
            if not ok.any():
                return empty
            docs_u, pf = _freqs_by_doc(
                little[ok], np.ones(int(ok.sum()))
            )
    elif isinstance(query, SpanMultiTermNearQuery):
        key_lists = [
            np.sort(np.concatenate([key_cache[t] for t in s_]))
            for s_ in mt_sets
        ]
        if query.in_order:
            docs_u, pf = _ordered_matches(key_lists, query.slop)
        else:
            docs_u, pf = _unordered_matches(
                key_lists[0], key_lists[1], query.slop
            )
        if len(docs_u) == 0:
            return empty
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
    if norm_union:
        keys = _gather_norm_keys_union(reader, terms, docs_u)
    else:
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


@dataclass(frozen=True)
class MaskedSpanNearQuery:
    """SpanNearQuery whose clauses may come from DIFFERENT fields — the
    FieldMaskingSpanQuery composition (reference: queries/spans/
    FieldMaskingSpanQuery.java:25-64 — a masked SpanQuery 'lies' about
    its field so SpanNear/SpanOr can combine clauses across parallel
    token streams; scoring uses the masked field's collection statistics
    and norms but each clause's REAL term statistics, per the reference's
    own note). ``clauses`` are (field, term) pairs; the first clause's
    field is the composite (masked) field supplying doc_count /
    sum_total_tf / norms."""

    clauses: Tuple[Tuple[str, str], ...]
    slop: int = 0
    in_order: bool = True


def score_span_masked(mf_reader, query: MaskedSpanNearQuery, k: int = 10):
    """Top-k for a cross-field span-near over a MultiFieldReader whose
    subindexes are positions-enabled (pipelines/multifield.py — per-field
    indexes share the global doc-ID space, so the doc-tagged position
    keys from different fields merge directly)."""
    if len(query.clauses) < 2:
        raise ValueError("masked span_near needs at least two clauses")
    if not query.in_order and len(query.clauses) != 2:
        raise ValueError("unordered masked span_near supports two clauses")
    primary = mf_reader.reader(query.clauses[0][0])
    dtype = np.float32 if primary.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype))
    k1, b = getattr(primary, "bm25_params", (1.2, 0.75))
    idf64 = 0.0
    key_lists: List[np.ndarray] = []
    for field, term in query.clauses:
        r = mf_reader.reader(field)
        df, _ = r.term_stats(term)
        if df == 0:
            return empty
        # masked-field collection stats x real-field term stats
        idf64 += math.log(
            1.0 + (primary.doc_count - df + 0.5) / (df + 0.5)
        )
        key_lists.append(_doc_keys(r, term))
    if query.in_order:
        docs_u, pf = _ordered_matches(key_lists, query.slop)
    else:
        docs_u, pf = _unordered_matches(
            key_lists[0], key_lists[1], query.slop
        )
    if len(docs_u) == 0:
        return empty
    keys = _gather_norm_keys(primary, query.clauses[0][1], docs_u)
    scorer = make_scorer(
        primary.norm_kind, primary.doc_count, primary.sum_total_tf, 1,
        k1=k1, b=b,
    )
    if primary.norm_kind == "byte4":
        scorer.idf = np.float32(idf64)
        scorer.weight = np.float32(idf64)
    else:
        scorer.idf = idf64
        scorer.weight = idf64
    scores = scorer.score_array(np.asarray(pf), keys)
    return _topk_from(docs_u.astype(np.int64), scores.astype(dtype), k)


def span_query_terms(query) -> Tuple[str, ...]:
    """Every term a span query's scoring/stats need (global-df gathering
    for sharded serving; SpanNot's exclude side matches positions but
    carries no stats, yet its df must exist in the stats map so the view
    can answer term_stats for it)."""
    if isinstance(query, (SpanFirstQuery, SpanPositionRangeQuery)):
        return (query.term,)
    if isinstance(query, SpanNotQuery):
        return (query.include, query.exclude)
    if isinstance(query, (SpanContainingQuery, SpanWithinQuery)):
        return tuple(query.big.terms) + (query.little,)
    return tuple(query.terms)


def parse_surround(text: str, analyzer) -> "SpanNearQuery":
    """Surround query language — the distance-operator subset
    (reference: queryparser/src/java/org/apache/lucene/queryparser/
    surround/query/DistanceQuery.java:29-96 and the surround grammar):
    ``<d>W(t1, t2, ...)`` = ordered within distance d, ``<d>N(...)`` =
    unordered; a bare ``W``/``N`` means distance 1. DistanceQuery
    rewrites to ``SpanNearQuery(clauses, opDistance - 1, ordered)``
    (:96) — the slop mapping kept here literally. Prefix operator form
    only (the language's canonical shape); each operand must analyze to
    exactly one term."""
    import re as _re

    m = _re.fullmatch(r"\s*(\d*)\s*([WwNn])\s*\((.*)\)\s*", text)
    if not m:
        raise ValueError(
            f"not a surround distance query: {text!r} "
            "(expected <d>W(t1, t2, ...) or <d>N(...))"
        )
    distance = int(m.group(1)) if m.group(1) else 1
    if distance < 1:
        raise ValueError("surround distance must be >= 1")
    ordered = m.group(2).lower() == "w"
    terms = []
    for part in m.group(3).split(","):
        toks = analyzer.analyze(part.strip())
        if len(toks) != 1:
            raise ValueError(
                f"surround operand {part.strip()!r} must analyze to one term"
            )
        terms.append(toks[0])
    if len(terms) < 2:
        raise ValueError("surround distance query needs >= 2 operands")
    return SpanNearQuery(
        terms=tuple(terms), slop=distance - 1, in_order=ordered
    )


def span_multiterm_near(slots, expander, slop: int = 0,
                        in_order: bool = True,
                        max_expansions: int = None) -> "SpanMultiTermNearQuery":
    """Build a :class:`SpanMultiTermNearQuery` from multiterm slots —
    ``("term", t)`` or ``(kind, pattern[, arg])`` with ``kind`` from
    functions/multiterm.py::expand (prefix/wildcard/regexp/fuzzy/trange)
    — expanding each against the dictionary like
    SpanMultiTermQueryWrapper's rewrite. Returns None when a slot
    expands to nothing (the wrapper's empty-rewrite)."""
    from .multiterm import expand

    sets = []
    for slot in slots:
        kind = slot[0]
        if kind == "term":
            members = (slot[1],)
        else:
            arg = int(slot[2]) if len(slot) > 2 else 0
            if callable(expander):
                members = tuple(expander(kind, slot[1], arg))
            else:
                members = tuple(expand(kind, slot[1], arg, expander))
            if max_expansions is not None:
                members = members[:max_expansions]
        if not members:
            return None
        sets.append(members)
    return SpanMultiTermNearQuery(
        clause_sets=tuple(sets), slop=slop, in_order=in_order
    )
