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
_EMPTY3 = (
    np.empty(0, np.int64),
    np.empty(0, np.int64),
    np.empty(0, np.int64),
)


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

    big: object  # any intervals source (str = bare term)
    small: object
    negate: bool = False
    pivot: float = 1.0
    boost: float = 1.0


def interval_containing_freqs(reader, query: IntervalContaining):
    """-> (docs, freqs) over the filtered big intervals."""
    s, e, _g = _containing_intervals(reader, query)
    if len(s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(
        s, _interval_weights(s, e, source_min_extent(query.big))
    )


@dataclass(frozen=True)
class IntervalOverlapping:
    """Intervals.overlapping / non_overlapping (reference:
    queries/intervals/OverlappingIntervalsSource.java /
    NonOverlappingIntervalsSource.java): the minimal intervals of
    ``big`` (its own filters applied first) that overlap at least one —
    or, with ``negate``, none — of the minimal intervals of ``other``.
    Weights and saturation scoring are the big source's."""

    big: object  # any intervals source (str = bare term)
    other: object
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

    small: object  # any intervals source (str = bare term)
    big: object
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

    big: object  # any intervals source (str = bare term)
    other: object
    mode: str = "before"
    pivot: float = 1.0
    boost: float = 1.0


def interval_before_after_freqs(reader, query: IntervalBeforeAfter):
    """-> (docs, freqs) over the filtered big intervals."""
    s, e, _g = _before_after_intervals(reader, query)
    if len(s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(
        s, _interval_weights(s, e, source_min_extent(query.big))
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
    s, e, _g = _overlapping_intervals(reader, query)
    if len(s) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(
        s, _interval_weights(s, e, source_min_extent(query.big))
    )


def interval_contained_by_freqs(reader, query: IntervalContainedBy):
    """-> (docs, freqs): the small source's intervals inside (or outside)
    some big minimal interval, weighted by the small source's extent."""
    ss, se, _sg = _contained_by_intervals(reader, query)
    if len(ss) == 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return _freqs_by_doc(
        ss, _interval_weights(ss, se, source_min_extent(query.small))
    )


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


# ---------------------------------------------------------------------------
# Recursive source algebra (round 4): Intervals.or / phrase(block) / ordered
# over sub-sources / extend / atLeast / maxgaps-maxwidth wrappers / multiterm
# expansion, plus the reference's derived compositions (within, notWithin,
# unorderedNoOverlaps).  Reference: queries/intervals/Intervals.java:97-597.
#
# Every node evaluates through ``source_intervals(reader, src)`` which
# returns doc-tagged ``(starts, ends, gaps)`` key arrays sorted ascending by
# start (minimal-interval lists are ascending in BOTH start and end within a
# doc).  ``gaps`` carries the reference's per-interval ``gaps()`` value
# (window width minus the sum of the chosen sub-interval widths —
# OrderedIntervalsSource.java:163-170, MinimumShouldMatchIntervalsSource
# .java:230-238; BlockIntervalsSource.java:111-113 pins it to 0;
# DisjunctionIntervalsSource and ExtendedIntervalsSource delegate to the
# matched sub-iterator) so a ``maxgaps`` wrapper composes over any source.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class IntervalOr:
    """Intervals.or — DisjunctionIntervalsSource.java: the minimized union
    of the sub-sources' intervals (an emitted interval never contains
    another emitted one); minExtent is the min over subs.  Exact duplicates
    (same start and end from two subs) are emitted once, keeping the
    smallest gaps value (deterministic; the reference's pick is iterator-
    order-dependent)."""

    sources: Tuple[object, ...]


@dataclass(frozen=True)
class IntervalOrdered:
    """Intervals.ordered over arbitrary sub-sources (OrderedIntervalsSource
    .java:123-180): greedy chains linking each clause to its first interval
    starting strictly after the previous clause's end, minimized by the
    equal-ends rule.  The flat term-tuple fast path stays on IntervalQuery."""

    sources: Tuple[object, ...]


@dataclass(frozen=True)
class IntervalBlock:
    """Intervals.phrase — BlockIntervalsSource.java: like ordered but each
    clause must start EXACTLY at the previous clause's end + 1 (strict
    adjacency); gaps() is always 0; minExtent = sum of sub extents."""

    sources: Tuple[object, ...]


@dataclass(frozen=True)
class IntervalExtend:
    """Intervals.extend — ExtendedIntervalsSource.java: each sub interval
    [s, e] becomes [max(s - before, 0), e + after]; gaps() delegates to the
    wrapped interval (the extension adds no gaps); minExtent = before +
    sub.minExtent + after.  Output may be non-minimal (the reference does
    not re-minimize either) but stays sorted."""

    source: object
    before: int
    after: int


@dataclass(frozen=True)
class IntervalAtLeast:
    """Intervals.atLeast — MinimumShouldMatchIntervalsSource.java: minimal
    windows covering complete intervals from at least ``min_match`` distinct
    sub-sources (overlaps between subs allowed, as in unordered).
    ``min_match == len(sources)`` reproduces Intervals.unordered;
    ``min_match > len(sources)`` matches nothing (NoMatchIntervalsSource).
    minExtent = sum of the ``min_match`` smallest sub extents."""

    min_match: int
    sources: Tuple[object, ...]


@dataclass(frozen=True)
class IntervalFiltered:
    """Intervals.maxgaps / maxwidth over ANY source —
    FilteredIntervalsSource.java: drops intervals whose gaps() exceed
    ``max_gaps`` or whose width exceeds ``max_width``; applied AFTER the
    sub-source's minimization, like the reference."""

    source: object
    max_gaps: Optional[int] = None
    max_width: Optional[int] = None


@dataclass(frozen=True)
class IntervalMultiTerm:
    """Intervals.prefix / wildcard / regexp / range / fuzzyTerm —
    MultiTermIntervalsSource.java: the expansion of a term-dictionary
    pattern, evaluated as a width-1 disjunction over every matching term's
    positions.  ``kind`` ∈ {prefix, wildcard, regexp, trange, fuzzy, dfuzzy} with
    the engine's multiterm codes (functions/multiterm.py); raises when the
    dictionary expansion exceeds ``max_expansions`` (the reference throws
    IllegalStateException past 128, Intervals.java:160-175)."""

    kind: str
    pattern: str
    arg: int = 0
    max_expansions: int = 128


def interval_within(source, positions: int, reference, negate: bool = False):
    """Intervals.within / notWithin (Intervals.java:494-521): intervals of
    ``source`` within (or, negated, NOT within) ``positions`` positions of a
    ``reference`` interval — the reference's literal composition:
    containedBy(source, extend(reference, positions, positions)) and
    nonOverlapping(source, extend(reference, positions, positions))."""
    ext = IntervalExtend(reference, positions, positions)
    if negate:
        return IntervalOverlapping(big=source, other=ext, negate=True)
    return IntervalContainedBy(small=source, big=ext)


def unordered_no_overlaps(a, b):
    """Intervals.unorderedNoOverlaps (Intervals.java:446-448): the literal
    composition or(ordered(a, b), ordered(b, a))."""
    return IntervalOr((IntervalOrdered((a, b)), IntervalOrdered((b, a))))


def source_min_extent(src) -> int:
    """The source's minExtent (the minimum possible interval width), used
    by IntervalScorer's weight 1/max(width - minExtent + 1, 1)."""
    if isinstance(src, str):
        return 1
    if isinstance(src, IntervalQuery):
        return len(src.terms)
    if isinstance(src, IntervalMultiTerm):
        return 1
    if isinstance(src, (IntervalOrdered, IntervalBlock)):
        return sum(source_min_extent(x) for x in src.sources)
    if isinstance(src, IntervalOr):
        return min(source_min_extent(x) for x in src.sources)
    if isinstance(src, IntervalExtend):
        return max(src.before + source_min_extent(src.source) + src.after, 1)
    if isinstance(src, IntervalAtLeast):
        subs = sorted(source_min_extent(x) for x in src.sources)
        return sum(subs[: src.min_match])
    if isinstance(src, IntervalFiltered):
        return source_min_extent(src.source)
    if isinstance(src, (IntervalContaining, IntervalOverlapping,
                        IntervalBeforeAfter)):
        return source_min_extent(src.big)
    if isinstance(src, IntervalContainedBy):
        return source_min_extent(src.small)
    raise TypeError(f"not an intervals source: {type(src).__name__}")


def _minimize_union(s, e, g):
    """Minimal set of an interval union: drop every interval that contains
    a different one (equal pairs collapse to one, smallest gaps kept).
    Inputs need not be sorted; output is sorted by start with strictly
    ascending starts AND ends within a doc."""
    if len(s) == 0:
        return s, e, g
    order = np.lexsort((g, e, s))
    s, e, g = s[order], e[order], g[order]
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = s[1:] != s[:-1]  # same start: smallest end survives
    s, e, g = s[keep], e[keep], g[keep]
    if len(s) > 1:
        # starts strictly ascending now; i is contained-in-free iff no
        # later-starting interval ends at or before e[i]
        sufmin = np.minimum.accumulate(e[::-1])[::-1]
        keep = np.ones(len(s), dtype=bool)
        keep[:-1] = e[:-1] < sufmin[1:]
        s, e, g = s[keep], e[keep], g[keep]
    return s, e, g


def _width(s: np.ndarray, e: np.ndarray) -> np.ndarray:
    return (e & _POS_MASK) - (s & _POS_MASK) + 1


def _chain_intervals(parts, block: bool):
    """Greedy ordered (or strictly adjacent, ``block``) chains over the
    sub-sources' interval lists, minimized by the equal-ends rule; gaps =
    chain width - sum of chosen sub widths (0 for block by construction)."""
    s0, e0, _g0 = parts[0]
    if len(s0) == 0:
        return _EMPTY3
    start, end = s0, e0
    wsum = _width(s0, e0)
    valid = np.ones(len(s0), dtype=bool)
    for sn, en, _gn in parts[1:]:
        if len(sn) == 0:
            return _EMPTY3
        if block:
            tgt = end + 1
            idx = np.searchsorted(sn, tgt, side="left")
            ok = idx < len(sn)
            idxc = np.minimum(idx, len(sn) - 1)
            ok &= sn[idxc] == tgt
            valid &= ok
        else:
            idx = np.searchsorted(sn, end, side="right")
            valid &= idx < len(sn)
            idxc = np.minimum(idx, len(sn) - 1)
        wsum = wsum + _width(sn[idxc], en[idxc])
        end = en[idxc]
    valid &= (end >> np.int64(_POS_SHIFT)) == (start >> np.int64(_POS_SHIFT))
    s, e, w = start[valid], end[valid], wsum[valid]
    if len(s) == 0:
        return _EMPTY3
    # chain ends are non-decreasing in the leading start, so containment
    # can only be equal-ends; keep the LAST (largest-start) chain per end
    keep = np.ones(len(e), dtype=bool)
    keep[:-1] = e[1:] != e[:-1]
    s, e, w = s[keep], e[keep], w[keep]
    # leading starts can repeat when a sub-source is non-minimal (extend
    # clamped at position 0): equal starts keep the FIRST (smallest end)
    keep = np.ones(len(s), dtype=bool)
    keep[1:] = s[1:] != s[:-1]
    s, e, w = s[keep], e[keep], w[keep]
    return s, e, _width(s, e) - w


def _atleast_intervals(reader, sources, m: int):
    """Minimal m-of-n covering windows.  For every candidate end e (a sub
    end), each source j contributes its latest complete interval ending at
    or before e (largest start, same doc); the tightest window ending
    exactly at e starts at min(q_m, owner) where q_m is the m-th largest
    contributed start and owner is the largest start among intervals ending
    EXACTLY at e (the window's rightmost member must end at e or the window
    has slack and a contained candidate exists).  A final union-minimize
    removes cross-candidate containment."""
    if m <= 0:
        raise ValueError("min_match must be >= 1")
    parts = [source_intervals(reader, x) for x in sources]
    n = len(parts)
    if m > n or sum(1 for p in parts if len(p[0])) < m:
        return _EMPTY3
    ends = np.unique(np.concatenate([p[1] for p in parts]))
    if len(ends) == 0:
        return _EMPTY3
    shift = np.int64(_POS_SHIFT)
    edoc = ends >> shift
    starts_mat = np.full((n, len(ends)), -1, np.int64)
    widths_mat = np.zeros((n, len(ends)), np.int64)
    owner_start = np.full(len(ends), -1, np.int64)
    owner_width = np.zeros(len(ends), np.int64)
    for row, (sj, ej, _gj) in enumerate(parts):
        if len(ej) == 0:
            continue
        idx = np.searchsorted(ej, ends, side="right") - 1
        ok = idx >= 0
        idxc = np.maximum(idx, 0)
        cs, ce = sj[idxc], ej[idxc]
        ok &= (cs >> shift) == edoc
        wid = _width(cs, ce)
        starts_mat[row] = np.where(ok, cs, -1)
        widths_mat[row] = np.where(ok, wid, 0)
        own = ok & (ce == ends) & (cs >= owner_start)
        owner_width = np.where(own, wid, owner_width)
        owner_start = np.where(own, cs, owner_start)
    order = np.argsort(starts_mat, axis=0, kind="stable")
    top_m = order[n - m:]
    qm = np.take_along_axis(starts_mat, top_m[:1], axis=0)[0]
    top_widths = np.take_along_axis(widths_mat, top_m, axis=0).sum(axis=0)
    valid = (qm >= 0) & (owner_start >= 0)
    w = np.minimum(qm, owner_start)
    valid &= (w >> shift) == edoc
    # chosen sub widths: the top-m starts, swapping the m-th for the owner
    # when the owner's start falls below the cut (gaps bookkeeping only)
    qm_width = np.take_along_axis(widths_mat, top_m[:1], axis=0)[0]
    wsum = np.where(
        owner_start >= qm, top_widths, top_widths - qm_width + owner_width
    )
    s, e, wsum = w[valid], ends[valid], wsum[valid]
    if len(s) == 0:
        return _EMPTY3
    return _minimize_union(s, e, _width(s, e) - wsum)


def _multiterm_intervals(reader, node: IntervalMultiTerm):
    terms = reader.expand_multi(node.kind, node.pattern, node.arg)
    if len(terms) > node.max_expansions:
        raise ValueError(
            f"interval {node.kind} pattern {node.pattern!r} expands to more "
            f"than {node.max_expansions} terms "
            "(MultiTermIntervalsSource's IllegalStateException analogue)"
        )
    keys = [_doc_keys(reader, t) for t in terms]
    keys = [k for k in keys if len(k)]
    if not keys:
        return _EMPTY3
    merged = np.sort(np.concatenate(keys)) if len(keys) > 1 else keys[0]
    return merged, merged, np.zeros(len(merged), np.int64)


def source_intervals(reader, src):
    """Doc-tagged minimal ``(starts, ends, gaps)`` of any intervals source,
    sorted ascending by start.  ``str`` = a bare term (width-1 positions);
    the combinator dataclasses (containing / overlapping / contained_by /
    before-after) are sources too, so they nest."""
    if isinstance(src, str):
        k = _doc_keys(reader, src)
        return k, k, np.zeros(len(k), np.int64)
    if isinstance(src, IntervalQuery):
        s, e = minimal_intervals(reader, src)
        return s, e, _width(s, e) - len(src.terms)
    if isinstance(src, IntervalMultiTerm):
        return _multiterm_intervals(reader, src)
    if isinstance(src, IntervalOr):
        if not src.sources:
            raise ValueError("IntervalOr needs at least one source")
        parts = [source_intervals(reader, x) for x in src.sources]
        s = np.concatenate([p[0] for p in parts])
        e = np.concatenate([p[1] for p in parts])
        g = np.concatenate([p[2] for p in parts])
        return _minimize_union(s, e, g)
    if isinstance(src, (IntervalOrdered, IntervalBlock)):
        if not src.sources:
            raise ValueError("ordered/block intervals need sources")
        parts = [source_intervals(reader, x) for x in src.sources]
        if len(parts) == 1:
            return parts[0]
        return _chain_intervals(parts, block=isinstance(src, IntervalBlock))
    if isinstance(src, IntervalExtend):
        if src.before < 0 or src.after < 0:
            raise ValueError("extend offsets must be >= 0")
        s, e, g = source_intervals(reader, src.source)
        if len(s) == 0:
            return _EMPTY3
        shift = np.int64(_POS_SHIFT)
        doc = s >> shift
        s2 = (doc << shift) | np.maximum(
            (s & _POS_MASK) - np.int64(src.before), 0
        )
        e2 = (doc << shift) | np.minimum(
            (e & _POS_MASK) + np.int64(src.after), _POS_MASK
        )
        return s2, e2, g
    if isinstance(src, IntervalAtLeast):
        return _atleast_intervals(reader, src.sources, src.min_match)
    if isinstance(src, IntervalFiltered):
        s, e, g = source_intervals(reader, src.source)
        m = np.ones(len(s), dtype=bool)
        if src.max_gaps is not None:
            m &= g <= src.max_gaps
        if src.max_width is not None:
            m &= _width(s, e) <= src.max_width
        return s[m], e[m], g[m]
    if isinstance(src, IntervalContaining):
        return _containing_intervals(reader, src)
    if isinstance(src, IntervalOverlapping):
        return _overlapping_intervals(reader, src)
    if isinstance(src, IntervalContainedBy):
        return _contained_by_intervals(reader, src)
    if isinstance(src, IntervalBeforeAfter):
        return _before_after_intervals(reader, src)
    raise TypeError(f"not an intervals source: {type(src).__name__}")


def _containing_intervals(reader, query: IntervalContaining):
    s, e, g = source_intervals(reader, query.big)
    if len(s) == 0:
        return _EMPTY3
    ss, se, _sg = source_intervals(reader, query.small)
    if len(ss) == 0:
        has = np.zeros(len(s), dtype=bool)
    else:
        # exists a small interval fully inside [s, e]: among smalls with
        # start >= s the minimum end must be <= e (suffix-min probe; doc
        # tags keep it doc-local — other docs' ends sort outside [s, e])
        sufmin = np.minimum.accumulate(se[::-1])[::-1]
        idx = np.searchsorted(ss, s, side="left")
        has = idx < len(ss)
        has &= sufmin[np.minimum(idx, len(ss) - 1)] <= e
    keep = ~has if query.negate else has
    return s[keep], e[keep], g[keep]


def _overlapping_intervals(reader, query: IntervalOverlapping):
    s, e, g = source_intervals(reader, query.big)
    if len(s) == 0:
        return _EMPTY3
    so, eo, _go = source_intervals(reader, query.other)
    if len(so) == 0:
        has = np.zeros(len(s), dtype=bool)
    else:
        so_s, eo_max = _sorted_runmax(so, eo)
        idx = np.searchsorted(so_s, e, side="right")
        has = idx > 0
        has &= eo_max[np.maximum(idx - 1, 0)] >= s
    keep = ~has if query.negate else has
    return s[keep], e[keep], g[keep]


def _contained_by_intervals(reader, query: IntervalContainedBy):
    ss, se, sg = source_intervals(reader, query.small)
    if len(ss) == 0:
        return _EMPTY3
    bs, be, _bg = source_intervals(reader, query.big)
    if len(bs) == 0:
        inside = np.zeros(len(ss), dtype=bool)
    else:
        b1, bemax = _sorted_runmax(bs, be)
        idx = np.searchsorted(b1, ss, side="right")
        inside = idx > 0
        inside &= bemax[np.maximum(idx - 1, 0)] >= se
    keep = ~inside if query.negate else inside
    return ss[keep], se[keep], sg[keep]


def _before_after_intervals(reader, query: IntervalBeforeAfter):
    if query.mode not in ("before", "after"):
        raise ValueError(f"unknown mode {query.mode!r}")
    s, e, g = source_intervals(reader, query.big)
    if len(s) == 0:
        return _EMPTY3
    so, eo, _go = source_intervals(reader, query.other)
    if len(so) == 0:
        return _EMPTY3
    doc = s >> np.int64(_POS_SHIFT)
    if query.mode == "before":
        so_sorted = np.sort(so)
        ceil = (doc + 1) << np.int64(_POS_SHIFT)
        idx = np.searchsorted(so_sorted, ceil, side="left") - 1
        ok = idx >= 0
        cand = so_sorted[np.maximum(idx, 0)]
        ok &= (cand >> np.int64(_POS_SHIFT)) == doc
        ok &= cand > e
    else:
        eo_sorted = np.sort(eo)
        floor = doc << np.int64(_POS_SHIFT)
        idx = np.searchsorted(eo_sorted, floor, side="left")
        ok = idx < len(eo_sorted)
        cand = eo_sorted[np.minimum(idx, len(eo_sorted) - 1)]
        ok &= (cand >> np.int64(_POS_SHIFT)) == doc
        ok &= cand < s
    return s[ok], e[ok], g[ok]


def score_intervals(reader, query, k: int = 10, pivot: float = None,
                    boost: float = None, exp: float = None):
    """Top-k by the interval score function, tie-broken by doc asc.
    Accepts ANY intervals source (IntervalQuery, the combinator
    dataclasses, or the recursive algebra nodes); per-doc freq sums
    ``1/max(width - minExtent + 1, 1)`` over the source's intervals
    (IntervalScorer.java:63-67).  ``pivot`` / ``boost`` default to the
    node's own fields when it has them (IntervalQuery and the binary
    combinators), else 1.0.  Score function (IntervalScoreFunction.java):
    saturation ``boost * (1 - pivot/(pivot + freq))`` by default; passing
    ``exp`` selects the sigmoid ``boost * (1 - pivot^a/(freq^a +
    pivot^a))`` (IntervalQuery.java:98).  Both reject pivot/exp <= 0 like
    the reference.  Returns ``(docs, float64 scores)``."""
    s, e, _g = source_intervals(reader, query)
    if len(s) == 0 or k <= 0:
        return np.empty(0, np.int64), np.empty(0, np.float64)
    docs, freqs = _freqs_by_doc(
        s, _interval_weights(s, e, source_min_extent(query))
    )
    p = pivot if pivot is not None else getattr(query, "pivot", 1.0)
    b = boost if boost is not None else getattr(query, "boost", 1.0)
    if not (p > 0 and np.isfinite(p)):
        raise ValueError(f"pivot must be > 0, got: {p}")
    if exp is None:
        scores = b * (1.0 - p / (p + freqs))
    else:
        if not (exp > 0 and np.isfinite(exp)):
            raise ValueError(f"exp must be > 0, got: {exp}")
        ppa = p ** exp
        scores = b * (1.0 - ppa / (freqs ** exp + ppa))
    return _topk_from(docs, scores, k)


def analyzed_text(text: str, analyzer, max_gaps: Optional[int] = None,
                  ordered: bool = True):
    """Intervals.analyzedText (Intervals.java:618-648 + IntervalBuilder
    .java:155-200): the ordered/unordered source over the analyzer's
    tokens for ``text``, where a position hole of g (stopwords dropped by
    the chain) turns the following token into ``extend(term, g, 0)`` so
    the hole never counts against a maxgaps filter — the reference's
    exact construction.  A single unextended token reduces to a term
    source; empty analysis to a no-match source (``IntervalQuery(())``).
    Our analyzers emit one token per position, so the reference's
    synonym-graph branch (per-position disjunctions) has no inputs to
    differ on.  ``max_gaps`` wraps the result in a filtered source."""
    toks, pos = analyzer.analyze_positions(text)
    if not ordered and len(set(toks)) != len(toks):
        # an atLeast window would satisfy two same-term slots with ONE
        # occurrence; the flat unordered kernel raises for the same reason
        raise ValueError("unordered analyzed text needs distinct terms")
    parts = []
    prev = -1
    for t, p in zip(toks, pos):
        spaces = p - prev - 1
        parts.append(IntervalExtend(t, spaces, 0) if spaces > 0 else t)
        prev = p
    if not parts:
        src = IntervalQuery(())
    elif len(parts) == 1:
        src = parts[0]
    elif ordered:
        src = IntervalOrdered(tuple(parts))
    else:
        src = IntervalAtLeast(len(parts), tuple(parts))
    if max_gaps is not None:
        return IntervalFiltered(src, max_gaps=max_gaps)
    return src
