"""Test-only faithful port of the reference's SloppyPhraseMatcher sweep
(core/src/java/org/apache/lucene/search/SloppyPhraseMatcher.java) for the
single-term-postings case (no multi-term repeats): PhrasePositions
priority-queue propagation, repeat-group collision resolution
(advanceRpts / collide / lesser, non-MTP init that staggers the j-th
repeat j positions), and the PhraseScorer freq loop
(freq += 1/(1+matchLength) per nextMatch).

Used ONLY as an adversarial oracle in tests — the engine's production
sloppy semantics (per-first-term-anchor exact minimal window,
functions/query.py::_sloppy_freqs) are intentionally different where
the reference's greedy sweep skips or adds combinations (the reference
itself documents missed combinations for performance:
SloppyPhraseMatcher.java:44-49).
"""

from __future__ import annotations

import heapq
from typing import Dict, List, Sequence, Tuple


class _PP:
    __slots__ = ("ps", "offset", "ord", "i", "position", "rptGroup", "rptInd")

    def __init__(self, positions: Sequence[int], offset: int, ord_: int):
        self.ps = list(positions)
        self.offset = offset
        self.ord = ord_
        self.i = -1
        self.position = 0
        self.rptGroup = -1
        self.rptInd = 0

    def first_position(self) -> bool:
        self.i = -1
        return self.next_position()

    def next_position(self) -> bool:
        self.i += 1
        if self.i < len(self.ps):
            self.position = self.ps[self.i] - self.offset
            return True
        return False

    def key(self):
        # SloppyPhraseMatcher's pq comparator: (position, offset, ord)
        return (self.position, self.offset, self.ord)


class _Sweep:
    def __init__(self, terms: Sequence[str], offsets: Sequence[int],
                 pos_by_term: Dict[str, Sequence[int]], slop: int):
        self.slop = slop
        self.pps = [
            _PP(pos_by_term[t], off, i)
            for i, (t, off) in enumerate(zip(terms, offsets))
        ]
        self.end = -(1 << 60)
        self.match_length = 1 << 60
        self.heap: List[Tuple[tuple, _PP]] = []
        # repeat groups: pps sharing a term, sorted by (query) offset —
        # gatherRptGroups + sortRptGroups for the non-MTP case
        by_term: Dict[str, List[_PP]] = {}
        for pp, t in zip(self.pps, terms):
            by_term.setdefault(t, []).append(pp)
        self.rpt_groups: List[List[_PP]] = []
        for t, group in by_term.items():
            if len(group) > 1:
                group.sort(key=lambda p: p.offset)
                gi = len(self.rpt_groups)
                for k, pp in enumerate(group):
                    pp.rptGroup = gi
                    pp.rptInd = k
                self.rpt_groups.append(group)
        self.has_rpts = bool(self.rpt_groups)
        self.positioned = self._init_phrase_positions()

    # -- queue ops ---------------------------------------------------------
    def _push(self, pp: _PP) -> None:
        heapq.heappush(self.heap, (pp.key(), pp))

    def _pop(self) -> _PP:
        return heapq.heappop(self.heap)[1]

    def _top(self) -> _PP:
        return self.heap[0][1]

    # -- init (placeFirstPositions / advanceRepeatGroups / fillQueue) ------
    def _init_phrase_positions(self) -> bool:
        self.end = -(1 << 60)
        for pp in self.pps:
            if not pp.first_position():
                return False
        if self.has_rpts:
            # non-MTP: advance the j-th pp of each group j times
            for rg in self.rpt_groups:
                for j in range(1, len(rg)):
                    for _ in range(j):
                        if not rg[j].next_position():
                            return False
        self.heap = []
        for pp in self.pps:
            if pp.position > self.end:
                self.end = pp.position
            self._push(pp)
        return True

    # -- advance helpers ----------------------------------------------------
    def _advance_pp(self, pp: _PP) -> bool:
        if not pp.next_position():
            return False
        if pp.position > self.end:
            self.end = pp.position
        return True

    @staticmethod
    def _tp_pos(pp: _PP) -> int:
        return pp.position + pp.offset

    def _collide(self, pp: _PP) -> int:
        tp = self._tp_pos(pp)
        for pp2 in self.rpt_groups[pp.rptGroup]:
            if pp2 is not pp and self._tp_pos(pp2) == tp:
                return pp2.rptInd
        return -1

    @staticmethod
    def _lesser(pp: _PP, pp2: _PP) -> _PP:
        if pp.position < pp2.position or (
            pp.position == pp2.position and pp.offset < pp2.offset
        ):
            return pp
        return pp2

    def _advance_rpts(self, pp: _PP) -> bool:
        if pp.rptGroup < 0:
            return True
        rg = self.rpt_groups[pp.rptGroup]
        bits = set()
        k0 = pp.rptInd
        while True:
            k = self._collide(pp)
            if k < 0:
                break
            pp = self._lesser(pp, rg[k])
            if not self._advance_pp(pp):
                return False
            if k != k0:
                bits.add(k)
        # re-queue pps whose keys changed while they sat in the queue
        stack: List[_PP] = []
        while bits:
            pp2 = self._pop()
            stack.append(pp2)
            if pp2.rptGroup >= 0 and pp2.rptInd in bits:
                bits.discard(pp2.rptInd)
        for pp2 in reversed(stack):
            self._push(pp2)
        return True

    # -- nextMatch (the sweep) ----------------------------------------------
    def next_match(self) -> bool:
        if not self.positioned:
            return False
        pp = self._pop()
        self.match_length = self.end - pp.position
        nxt = self._top().position
        while self._advance_pp(pp):
            if self.has_rpts and not self._advance_rpts(pp):
                break
            if pp.position > nxt:
                self._push(pp)
                if self.match_length <= self.slop:
                    return True
                pp = self._pop()
                nxt = self._top().position
                self.match_length = self.end - pp.position
            else:
                ml2 = self.end - pp.position
                if ml2 < self.match_length:
                    self.match_length = ml2
        self.positioned = False
        return self.match_length <= self.slop


def reference_sloppy_freq(
    terms: Sequence[str],
    offsets: Sequence[int],
    pos_by_term: Dict[str, Sequence[int]],
    slop: int,
) -> float:
    """PhraseScorer's freq accumulation over the ported sweep:
    sum of 1/(1+matchLength) per nextMatch. pos_by_term maps each
    DISTINCT term to its ascending raw token positions in the doc."""
    for t in terms:
        if not pos_by_term.get(t):
            return 0.0
    sweep = _Sweep(terms, offsets, pos_by_term, slop)
    freq = 0.0
    while sweep.next_match():
        freq += 1.0 / (1.0 + sweep.match_length)
    return freq
