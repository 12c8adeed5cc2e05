"""Interval-function query syntax — the StandardQueryParser ``fn:`` subset.

Reference: queryparser/flexible/standard ``StandardSyntaxParser.jj`` (the
IntervalFunction production) + ``IntervalQueryNodeProcessor`` /
``Intervals`` builder methods; the surface grammar is the one documented
on StandardQueryParser:

    fn:ordered(a b c)          fn:unordered(a b)        fn:phrase(a b)
    fn:or(x y)                 fn:atLeast(2 a b c)
    fn:maxgaps(5 x)            fn:maxwidth(4 x)
    fn:within(x 2 y)           fn:notWithin(x 2 y)
    fn:containedBy(s b)        fn:notContainedBy(s b)
    fn:containing(b s)         fn:notContaining(b s)
    fn:overlapping(x y)        fn:nonOverlapping(x y)
    fn:before(x y)             fn:after(x y)
    fn:extend(x 1 2)           fn:unorderedNoOverlaps(x y)
    fn:wildcard(te*)           fn:prefix(te)            fn:fuzzyTerm(term)

``"a b"`` quoted inside a function is ``fn:phrase`` of the analyzed terms
(the reference analyzes quoted interval arguments the same way); bare
words run through the query analyzer (stemming/stopping applies — a
stopword argument is an error, as dropping it silently would change the
function's arity). Function names are case-insensitive; arguments are
whitespace-separated (commas allowed).

Output: the engine's intervals-algebra nodes (functions/intervals.py),
directly scoreable with ``score_intervals``.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from .intervals import (
    IntervalAtLeast,
    IntervalBeforeAfter,
    IntervalBlock,
    IntervalContainedBy,
    IntervalContaining,
    IntervalExtend,
    IntervalFiltered,
    IntervalMultiTerm,
    IntervalOr,
    IntervalOrdered,
    IntervalOverlapping,
    IntervalQuery,
    interval_within,
    unordered_no_overlaps,
)

_TOKEN = re.compile(r'fn:\w+\s*\(|\)|"[^"]*"|,|[^\s(),"]+', re.IGNORECASE)
_INT = re.compile(r"^\d+$")


class _Parser:
    def __init__(self, text: str, analyzer):
        self.toks = [t for t in _TOKEN.findall(text) if t != ","]
        self.pos = 0
        self.an = analyzer

    def peek(self):
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def next(self):
        t = self.peek()
        if t is None:
            raise ValueError("unexpected end of interval expression")
        self.pos += 1
        return t

    # -- leaves -------------------------------------------------------------
    def _analyze_word(self, word: str):
        terms = self.an.analyze(word)
        if not terms:
            raise ValueError(
                f"interval argument {word!r} analyzes to nothing "
                "(stopword?) — the reference rejects empty interval sources"
            )
        if len(terms) == 1:
            return terms[0]
        return IntervalBlock(tuple(terms))

    def _expr(self):
        t = self.next()
        low = t.lower()
        if low.startswith("fn:") and low.endswith("("):
            return self._function(low[3:-1].strip())
        if t == ")":
            raise ValueError("unexpected ')'")
        if t.startswith('"') and t.endswith('"') and len(t) >= 2:
            terms = self.an.analyze(t[1:-1])
            if not terms:
                raise ValueError(f"empty phrase {t}")
            if len(terms) == 1:
                return terms[0]
            return IntervalBlock(tuple(terms))
        return self._analyze_word(t)

    def _int_arg(self, fname: str) -> int:
        t = self.next()
        if not _INT.match(t):
            raise ValueError(f"fn:{fname} expects an integer, got {t!r}")
        return int(t)

    def _sub_args(self) -> List[object]:
        subs: List[object] = []
        while True:
            t = self.peek()
            if t is None:
                raise ValueError("missing ')'")
            if t == ")":
                self.next()
                return subs
            subs.append(self._expr())

    def _raw_arg(self, fname: str) -> str:
        t = self.next()
        if t == ")" or t.lower().startswith("fn:"):
            raise ValueError(f"fn:{fname} expects a bare pattern argument")
        return t.lower()

    def _close(self, fname: str) -> None:
        if self.next() != ")":
            raise ValueError(f"fn:{fname}: expected ')'")

    # -- functions ----------------------------------------------------------
    def _function(self, name: str):
        n = name.lower()
        if n in ("ordered", "unordered", "phrase", "or"):
            subs = self._sub_args()
            if not subs:
                raise ValueError(f"fn:{name} needs at least one argument")
            flat = all(isinstance(s, str) for s in subs)
            if n == "ordered":
                return (
                    IntervalQuery(tuple(subs))
                    if flat
                    else IntervalOrdered(tuple(subs))
                )
            if n == "unordered":
                # IntervalAtLeast(n of n) IS Intervals.unordered over
                # arbitrary sources (MinimumShouldMatchIntervalsSource)
                return (
                    IntervalQuery(tuple(subs), ordered=False)
                    if flat
                    else IntervalAtLeast(len(subs), tuple(subs))
                )
            if n == "phrase":
                return IntervalBlock(tuple(subs))
            return IntervalOr(tuple(subs))
        if n == "atleast":
            m = self._int_arg(name)
            subs = self._sub_args()
            return IntervalAtLeast(m, tuple(subs))
        if n in ("maxgaps", "maxwidth"):
            v = self._int_arg(name)
            src = self._expr()
            self._close(name)
            if n == "maxgaps":
                return IntervalFiltered(src, max_gaps=v)
            return IntervalFiltered(src, max_width=v)
        if n in ("within", "notwithin"):
            src = self._expr()
            k = self._int_arg(name)
            ref = self._expr()
            self._close(name)
            return interval_within(src, k, ref, negate=(n == "notwithin"))
        if n in ("containedby", "notcontainedby"):
            small = self._expr()
            big = self._expr()
            self._close(name)
            return IntervalContainedBy(
                small, big, negate=(n == "notcontainedby")
            )
        if n in ("containing", "notcontaining"):
            big = self._expr()
            small = self._expr()
            self._close(name)
            return IntervalContaining(
                big, small, negate=(n == "notcontaining")
            )
        if n in ("overlapping", "nonoverlapping"):
            big = self._expr()
            other = self._expr()
            self._close(name)
            return IntervalOverlapping(
                big, other, negate=(n == "nonoverlapping")
            )
        if n in ("before", "after"):
            big = self._expr()
            other = self._expr()
            self._close(name)
            return IntervalBeforeAfter(big, other, mode=n)
        if n == "extend":
            src = self._expr()
            before = self._int_arg(name)
            after = self._int_arg(name)
            self._close(name)
            return IntervalExtend(src, before, after)
        if n == "unorderednooverlaps":
            a = self._expr()
            b = self._expr()
            self._close(name)
            return unordered_no_overlaps(a, b)
        if n == "wildcard":
            pat = self._raw_arg(name)
            self._close(name)
            return IntervalMultiTerm("wildcard", pat)
        if n == "prefix":
            pat = self._raw_arg(name)
            self._close(name)
            return IntervalMultiTerm("prefix", pat)
        if n == "fuzzyterm":
            pat = self._raw_arg(name)
            arg = 2
            if self.peek() is not None and _INT.match(self.peek() or ""):
                arg = self._int_arg(name)
            self._close(name)
            # Intervals.fuzzyTerm(term, maxEdits) delegates to FuzzyQuery
            # DEFAULTS (Intervals.java:310-317) — transpositions=true, so
            # the Damerau kind, not plain Levenshtein
            return IntervalMultiTerm("dfuzzy", pat, arg)
        raise ValueError(f"unknown interval function fn:{name}")


def parse_interval_query(text: str, analyzer):
    """``fn:...`` expression string -> intervals-algebra node (directly
    scoreable with ``score_intervals``). Raises ValueError on syntax
    errors, unknown functions, or arguments that analyze to nothing."""
    p = _Parser(text, analyzer)
    node = p._expr()
    if p.peek() is not None:
        raise ValueError(f"trailing tokens after interval expression: "
                         f"{p.toks[p.pos:]!r}")
    return node
