"""Interval queries — queries/intervals module analogue (minimal-interval
semantics over the positions index).

Reference: ``queries/src/java/org/apache/lucene/queries/intervals/`` —

* ``OrderedIntervalsSource.java:123-180`` — each chain links every clause
  to its FIRST position strictly after the previous clause's end, then the
  iterator minimizes: an interval is dropped when a later-starting chain
  ends at the same position (equal ends are the only possible containment
  among greedy chains, whose ends are monotone in the start).
* ``IntervalScorer.java:63-67`` — per-doc frequency accumulates
  ``1 / max(length - minExtent + 1, 1)`` per minimal interval, where
  ``length = end - start + 1`` and ``minExtent = n`` for an n-term ordered
  source — i.e. ``1 / (1 + gaps)``.
* ``IntervalScoreFunction.java:56-75`` + ``IntervalQuery.java:72`` —
  score = ``boost * (1 - pivot / (pivot + freq))`` (saturation, default
  pivot 1). Interval scores are NORM-FREE: no BM25, no doc length.
* ``FilteredIntervalsSource.java`` (``Intervals.maxgaps`` /
  ``Intervals.maxwidth``) — filters apply AFTER minimization.

Scope: ordered sources (the module's flagship) with maxgaps/maxwidth and
saturation scoring. Unordered proximity remains covered by the spans
module (``functions/spans.py``), whose two-clause merge mirrors
``NearSpansUnordered``; Lucene's unordered interval iterator is a lazy
priority-queue walk that can emit non-minimal intervals, so we do not
reproduce it under the "minimal" name.

Everything here is one vectorized pass over doc-tagged position keys
(``doc << POS_SHIFT | pos``) shared with the span/phrase matchers —
per-query cost is O(sum of posting positions) searchsorteds, no per-doc
Python loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .query import _POS_SHIFT, _topk_from
from .spans import _doc_keys, _freqs_by_doc

_POS_MASK = (1 << _POS_SHIFT) - 1


@dataclass(frozen=True)
class IntervalQuery:
    terms: Tuple[str, ...]
    max_gaps: Optional[int] = None  # Intervals.maxgaps filter
    max_width: Optional[int] = None  # Intervals.maxwidth filter
    pivot: float = 1.0  # saturation pivot (IntervalQuery default 1)
    boost: float = 1.0
    ordered: bool = True  # False = Intervals.unordered (minimal semantics)


def minimal_intervals(reader, query: IntervalQuery):
    """Minimal intervals of ``query`` surviving its maxgaps/maxwidth
    filters -> (start_keys, end_keys), doc-tagged, end-ascending. The
    combinator sources (containing / not_containing) compose over this."""
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "interval queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    n = len(query.terms)
    if n == 0:
        return empty
    if not query.ordered:
        return _unordered_minimal(reader, query)
    key_lists = [_doc_keys(reader, t) for t in query.terms]
    a = key_lists[0]
    if len(a) == 0:
        return empty
    ends = a
    valid = np.ones(len(a), dtype=bool)
    for nxt in key_lists[1:]:
        if len(nxt) == 0:
            return empty
        idx = np.searchsorted(nxt, ends, side="right")
        valid &= idx < len(nxt)
        idx = np.minimum(idx, len(nxt) - 1)
        ends = nxt[idx]
    valid &= (ends >> np.int64(_POS_SHIFT)) == (a >> np.int64(_POS_SHIFT))
    av, ev = a[valid], ends[valid]
    if len(av) == 0:
        return empty
    # minimization: greedy-chain ends are non-decreasing in the start, so
    # containment can only be equal-ends; keep the LAST (largest-start)
    # chain per distinct end (OrderedIntervalsSource's lastStart check)
    keep = np.ones(len(ev), dtype=bool)
    if len(ev) > 1:
        keep[:-1] = ev[1:] != ev[:-1]
    av, ev = av[keep], ev[keep]
    gaps = (ev & _POS_MASK) - (av & _POS_MASK) - (n - 1)
    m = np.ones(len(av), dtype=bool)
    if query.max_gaps is not None:
        m &= gaps <= query.max_gaps
    if query.max_width is not None:
        m &= (gaps + n) <= query.max_width
    return av[m], ev[m]


def _interval_weights(s: np.ndarray, e: np.ndarray, n: int) -> np.ndarray:
    """IntervalScorer.java:63-67 — 1/max(length - minExtent + 1, 1)."""
    length = (e & _POS_MASK) - (s & _POS_MASK) + 1
    return 1.0 / np.maximum(length - n + 1, 1)


def interval_freqs(reader, query: IntervalQuery):
    """Minimal intervals -> per-doc float frequency.

    Returns ``(docs, freqs)`` with ``freqs[i] = sum of
    1/max(length - n + 1, 1)`` (``1/(1+gaps)`` for non-overlapping
    matches) over the doc's minimal intervals surviving the
    maxgaps/maxwidth filters. ``ordered=False`` uses TRUE minimal-
    interval semantics for unordered sources — stricter than the
    reference's lazily non-minimal ``UnorderedIntervalsSource`` PQ walk
    (documented deviation: we never count an interval that contains
    another match)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    s, e = minimal_intervals(reader, query)
    if len(s) == 0:
        return empty
    return _freqs_by_doc(s, _interval_weights(s, e, len(query.terms)))


@dataclass(frozen=True)
class IntervalContaining:
    """Intervals.containing / not_containing (reference:
    queries/intervals/ContainingIntervalsSource.java /
    NotContainingIntervalsSource.java): the minimal intervals of ``big``
    (its own filters applied first) that contain at least one — or, with
    ``negate``, none — of the ``small`` term's positions. Weights and
    saturation scoring are the big source's."""

    big: IntervalQuery
    small: str
    negate: bool = False
    pivot: float = 1.0
    boost: float = 1.0


def interval_containing_freqs(reader, query: IntervalContaining):
    """-> (docs, freqs) over the filtered big intervals."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    s, e = minimal_intervals(reader, query.big)
    if len(s) == 0:
        return empty
    small_keys = _doc_keys(reader, query.small)
    if len(small_keys) == 0:
        has = np.zeros(len(s), dtype=bool)
    else:
        # a small position is inside [s, e] iff its key lies in the key
        # range (s and e share the doc tag, so any key between them is
        # the same doc); two searchsorteds per big interval
        lo = np.searchsorted(small_keys, s, side="left")
        hi = np.searchsorted(small_keys, e, side="right")
        has = hi > lo
    keep = ~has if query.negate else has
    if not keep.any():
        return empty
    s, e = s[keep], e[keep]
    return _freqs_by_doc(
        s, _interval_weights(s, e, len(query.big.terms))
    )


@dataclass(frozen=True)
class IntervalOverlapping:
    """Intervals.overlapping / non_overlapping (reference:
    queries/intervals/OverlappingIntervalsSource.java /
    NonOverlappingIntervalsSource.java): the minimal intervals of
    ``big`` (its own filters applied first) that overlap at least one —
    or, with ``negate``, none — of the minimal intervals of ``other``.
    Weights and saturation scoring are the big source's."""

    big: IntervalQuery
    other: IntervalQuery
    negate: bool = False
    pivot: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalContainedBy:
    """Intervals.contained_by / not_contained_by (reference:
    queries/intervals/ContainedByIntervalsSource.java /
    NotContainedByIntervalsSource.java): the SMALL term's width-1
    intervals that lie inside at least one — or, with ``negate``, none —
    of the ``big`` source's minimal intervals. Each surviving position
    weighs 1 (the single-term source's own weight)."""

    small: str
    big: IntervalQuery
    negate: bool = False
    pivot: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalBeforeAfter:
    """Intervals.before / after (reference: queries/intervals/
    Intervals.java before()/after() via NonOverlappingIntervalsSource
    compositions): minimal intervals of ``big`` that end before the
    start of some ``other`` minimal interval (``mode="before"``) or
    start after the end of one (``mode="after"``), same doc. Weights
    and saturation scoring are the big source's."""

    big: IntervalQuery
    other: IntervalQuery
    mode: str = "before"
    pivot: float = 1.0
    boost: float = 1.0


def interval_before_after_freqs(reader, query: IntervalBeforeAfter):
    """-> (docs, freqs) over the filtered big intervals."""
    if query.mode not in ("before", "after"):
        raise ValueError(f"unknown mode {query.mode!r}")
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    s, e = minimal_intervals(reader, query.big)
    if len(s) == 0:
        return empty
    so, eo = minimal_intervals(reader, query.other)
    if len(so) == 0:
        return empty
    doc = s >> np.int64(_POS_SHIFT)
    if query.mode == "before":
        # exists other with start > big.end, same doc: the doc's MAX
        # other-start must exceed e — probe the last other interval at
        # or below the doc ceiling
        so_sorted = np.sort(so)
        ceil = (doc + 1) << np.int64(_POS_SHIFT)
        idx = np.searchsorted(so_sorted, ceil, side="left") - 1
        ok = idx >= 0
        cand = so_sorted[np.maximum(idx, 0)]
        ok &= (cand >> np.int64(_POS_SHIFT)) == doc
        ok &= cand > e
    else:
        # exists other with end < big.start, same doc: the doc's MIN
        # other-end must undercut s
        eo_sorted = np.sort(eo)
        floor = doc << np.int64(_POS_SHIFT)
        idx = np.searchsorted(eo_sorted, floor, side="left")
        ok = idx < len(eo_sorted)
        cand = eo_sorted[np.minimum(idx, len(eo_sorted) - 1)]
        ok &= (cand >> np.int64(_POS_SHIFT)) == doc
        ok &= cand < s
    if not ok.any():
        return empty
    s, e = s[ok], e[ok]
    return _freqs_by_doc(
        s, _interval_weights(s, e, len(query.big.terms))
    )


def _sorted_runmax(s: np.ndarray, e: np.ndarray):
    """Intervals sorted by start with the running max of ends — the
    'does any interval starting at or before X reach Y' monotone probe
    (doc tags keep comparisons doc-local: an earlier doc's running max
    key is below the next doc's floor)."""
    order = np.argsort(s, kind="stable")
    s2 = s[order]
    e2 = np.maximum.accumulate(e[order])
    return s2, e2


def interval_overlapping_freqs(reader, query: IntervalOverlapping):
    """-> (docs, freqs) over the filtered big intervals."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    s, e = minimal_intervals(reader, query.big)
    if len(s) == 0:
        return empty
    so, eo = minimal_intervals(reader, query.other)
    if len(so) == 0:
        has = np.zeros(len(s), dtype=bool)
    else:
        so_s, eo_max = _sorted_runmax(so, eo)
        # overlap([s,e], [s2,e2]) <=> s2 <= e AND e2 >= s; among others
        # with s2 <= e the reachable max end is the running max
        idx = np.searchsorted(so_s, e, side="right")
        has = idx > 0
        safe = np.maximum(idx - 1, 0)
        has &= eo_max[safe] >= s
    keep = ~has if query.negate else has
    if not keep.any():
        return empty
    s, e = s[keep], e[keep]
    return _freqs_by_doc(
        s, _interval_weights(s, e, len(query.big.terms))
    )


def interval_contained_by_freqs(reader, query: IntervalContainedBy):
    """-> (docs, freqs): count of small positions inside (or outside)
    every big minimal interval, weight 1 each."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    small_keys = _doc_keys(reader, query.small)
    if len(small_keys) == 0:
        return empty
    s, e = minimal_intervals(reader, query.big)
    if len(s) == 0:
        inside = np.zeros(len(small_keys), dtype=bool)
    else:
        s_s, e_max = _sorted_runmax(s, e)
        idx = np.searchsorted(s_s, small_keys, side="right")
        inside = idx > 0
        safe = np.maximum(idx - 1, 0)
        inside &= e_max[safe] >= small_keys
    keep = ~inside if query.negate else inside
    if not keep.any():
        return empty
    kept = small_keys[keep]
    return _freqs_by_doc(kept, np.ones(len(kept)))


def _unordered_minimal(reader, query: IntervalQuery):
    """Exact minimal UNORDERED intervals, vectorized.

    Construction: for every candidate end position ``e`` (any query
    term's position), the tightest covering window ending at ``e`` is
    ``[min_j prev_j(e), e]`` where ``prev_j(e)`` is term j's largest
    position <= e. Its start is non-decreasing in ``e``, so the minimal
    set is exactly "first (smallest) end per distinct start" — one
    searchsorted per term over the merged end array, no per-doc loop.
    Returns the (start_keys, end_keys) pre-weighting; overlapping term
    positions are allowed, as in Intervals.unordered. Repeated terms are
    not supported (the reference's repeats handling is tied to its
    non-minimal iterator)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    n = len(query.terms)
    if len(set(query.terms)) != n:
        raise ValueError("unordered intervals need distinct terms")
    key_lists = [_doc_keys(reader, t) for t in query.terms]
    if any(len(kl) == 0 for kl in key_lists):
        return empty
    ends = np.sort(np.concatenate(key_lists))
    ok = np.ones(len(ends), dtype=bool)
    start = None
    edoc = ends >> np.int64(_POS_SHIFT)
    for kl in key_lists:
        idx = np.searchsorted(kl, ends, side="right") - 1
        ok &= idx >= 0
        prev = kl[np.maximum(idx, 0)]
        ok &= (prev >> np.int64(_POS_SHIFT)) == edoc
        start = prev if start is None else np.minimum(start, prev)
    s, e = start[ok], ends[ok]
    if len(s) == 0:
        return empty
    # ends ascending => starts non-decreasing; minimal = first per start
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = s[1:] != s[:-1]
    s, e = s[keep], e[keep]
    length = (e & _POS_MASK) - (s & _POS_MASK) + 1
    m = np.ones(len(s), dtype=bool)
    if query.max_gaps is not None:
        m &= (length - n) <= query.max_gaps
    if query.max_width is not None:
        m &= length <= query.max_width
    return s[m], e[m]


def score_intervals(reader, query, k: int = 10):
    """Top-k by the saturation score ``boost * freq / (freq + pivot)``,
    tie-broken by doc asc. Accepts IntervalQuery or IntervalContaining.
    Returns ``(docs, float64 scores)``."""
    if isinstance(query, IntervalContaining):
        docs, freqs = interval_containing_freqs(reader, query)
    elif isinstance(query, IntervalOverlapping):
        docs, freqs = interval_overlapping_freqs(reader, query)
    elif isinstance(query, IntervalContainedBy):
        docs, freqs = interval_contained_by_freqs(reader, query)
    elif isinstance(query, IntervalBeforeAfter):
        docs, freqs = interval_before_after_freqs(reader, query)
    else:
        docs, freqs = interval_freqs(reader, query)
    if len(docs) == 0 or k <= 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    scores = query.boost * (freqs / (freqs + query.pivot))
    return _topk_from(docs, scores, k)
