"""TermAutomatonQuery: a proximity query whose transitions are terms.

Reference: ``sandbox/src/java/org/apache/lucene/sandbox/search/
TermAutomatonQuery.java`` (builder: createState / setAccept /
addTransition / addAnyTransition / finish-determinize; the similarity
scorer is built from the stats of EVERY automaton term with df > 0,
:376-399) and ``TermAutomatonScorer.java`` (the position-ordered
intersection, :216-335). The query generalizes PhraseQuery /
MultiPhraseQuery / SpanNearQuery: it matches any document where some
run of consecutive token positions spells a string of the automaton's
language, with ANY transitions consuming arbitrary tokens (including
positions holding no indexed token — stopword gaps — exactly like the
reference's lastPos->pos advance walk, :261-287).

Faithfully-kept reference semantics (each is visible in the scorer):

* The runtime state set is a MULTISET (``PosState.add`` never dedups,
  :373-385): ``freq`` counts every accepting TERM-step event over every
  active run, i.e. one count per (start position, accepted symbol
  string) pair — overlapping parses through term arcs vs ANY arcs count
  separately.
* Accepts reached by an ANY step do NOT bump ``freq`` (only the
  term-match and new-start blocks increment, :302-321) — matches whose
  last transition is ANY are never counted.
* New matches start only via a term step from the start state
  (``step(0, termID)``, :315) — matches beginning with an ANY-consumed
  token are never found.
* A document matches iff ``freq > 0``; scoring is ONE similarity
  application ``scorer.score(freq, norm)`` whose idf sums every
  automaton term with df > 0 in term-id (first-seen) order.

Engine shape: the determinized automaton has at most one arc per
(state, symbol), so runs are followed with next-state ARRAYS; counts
are an int64 vector over det states; ANY-only gaps between query-term
positions apply the ANY next-state map ``gap-1`` times via function-power
doubling (O(log gap)). Candidates are the union of the terms' postings
(the reference's disjunction shape); per-doc work is O(events x states).
At cluster scale the per-doc DP runs inside the doc-range-sharded
searchers like every other positional executor.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

class _AnyLabel:
    """The addAnyTransition label sentinel — a pickle-stable singleton
    (queries cross Ray actor boundaries for sharded serving; a plain
    ``object()`` would lose identity and break ``step[ANY]`` lookups
    after unpickling)."""

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __reduce__(self):
        return (_AnyLabel, ())

    def __repr__(self):
        return "ANY"


ANY = _AnyLabel()


class TermAutomatonQuery:
    """Builder + determinized runtime form. State 0 is initial (the
    reference's convention); call :meth:`finish` before executing."""

    def __init__(self):
        self._n = 1
        self._accept = {0: False}
        self._trans: List[Tuple[int, int, object]] = []
        self.terms: List[str] = []  # first-seen order == term-id order
        self._finished = False

    def create_state(self) -> int:
        s = self._n
        self._n += 1
        self._accept[s] = False
        return s

    def set_accept(self, state: int, accept: bool = True) -> None:
        self._accept[state] = bool(accept)

    def add_transition(self, src: int, dst: int, term: str) -> None:
        if term not in self.terms:
            self.terms.append(term)
        self._trans.append((src, dst, term))

    def add_any_transition(self, src: int, dst: int) -> None:
        self._trans.append((src, dst, ANY))

    def finish(self) -> "TermAutomatonQuery":
        """Determinize (subset construction over terms + ANY — the
        reference's Operations.determinize over its term-id alphabet)."""
        nfa: Dict[Tuple[int, object], set] = {}
        for src, dst, sym in self._trans:
            nfa.setdefault((src, sym), set()).add(dst)
        symbols = list(self.terms) + [ANY]
        start = frozenset({0})
        subsets = {start: 0}
        order = [start]
        arcs: List[Dict[object, int]] = [{}]
        i = 0
        while i < len(order):
            cur = order[i]
            for sym in symbols:
                nxt = frozenset(
                    d for s in cur for d in nfa.get((s, sym), ())
                )
                if not nxt:
                    continue
                j = subsets.get(nxt)
                if j is None:
                    j = len(order)
                    subsets[nxt] = j
                    order.append(nxt)
                    arcs.append({})
                arcs[i][sym] = j
            i += 1
        n = len(order)
        self.n_det = n
        self.det_accept = np.array(
            [any(self._accept.get(s, False) for s in sub) for sub in order],
            dtype=bool,
        )
        self.step = {}
        for sym in symbols:
            a = np.full(n, -1, dtype=np.int64)
            for i in range(n):
                a[i] = arcs[i].get(sym, -1)
            self.step[sym] = a
        self._any_pows: List[np.ndarray] = [self.step[ANY]]
        # pure-python step tables: for the tiny det automata this query
        # family produces, list indexing beats numpy per-op overhead in
        # the per-doc loop by ~an order of magnitude
        self.step_py = {sym: a.tolist() for sym, a in self.step.items()}
        self.accept_py = self.det_accept.tolist()
        # required terms (the reference's own noted optimization,
        # TermAutomatonQuery.java:62-63 "find terms that are in fact
        # MUST"): a term is required when removing its arcs leaves no
        # start->accept path — candidates can then INTERSECT that term's
        # postings instead of unioning everything
        self.required = [
            t for t in self.terms if not self._accepts_without(t)
        ]
        self._finished = True
        return self

    def _accepts_without(self, banned: str) -> bool:
        """Is any accept state reachable from det state 0 using every
        symbol except ``banned``? (BFS over the det arcs.)"""
        seen = {0}
        stack = [0]
        while stack:
            s = stack.pop()
            if self.det_accept[s]:
                return True
            for sym, arr in self.step.items():
                if sym == banned:
                    continue
                nxt = int(arr[s])
                if nxt >= 0 and nxt not in seen:
                    seen.add(nxt)
                    stack.append(nxt)
        return False

    def _any_power(self, k: int) -> Optional[np.ndarray]:
        """Composition of the ANY next-state map with itself k times
        (k >= 1), built by doubling; None when it is everywhere -1."""
        # decompose k in binary over cached doubling maps
        out = None
        bit = 0
        while k:
            while bit >= len(self._any_pows):
                prev = self._any_pows[-1]
                comp = np.where(prev >= 0, prev, 0)
                nxt = np.where(prev >= 0, prev[comp], -1)
                self._any_pows.append(nxt)
            if k & 1:
                m = self._any_pows[bit]
                if out is None:
                    out = m
                else:
                    safe = np.where(out >= 0, out, 0)
                    out = np.where(out >= 0, m[safe], -1)
            k >>= 1
            bit += 1
        return out


def _doc_freq_automaton(q: TermAutomatonQuery, events: List[Tuple[int, List[int]]]) -> int:
    """The scorer's countMatches over one doc's (position, term-ids)
    events (ascending positions). Returns the automaton freq.

    Pure-Python int arithmetic over the tiny det state tables — an order
    of magnitude faster per doc than numpy's per-op overhead at these
    sizes; ANY-only gaps still use the doubled next-state maps
    (:meth:`TermAutomatonQuery._any_power`), so kleene self-loops stay
    O(log gap). ``S is None`` encodes the all-zero multiset."""
    n = q.n_det
    accept = q.accept_py
    step_py = q.step_py
    any_py = step_py[ANY]
    terms = q.terms
    S = None
    freq = 0
    prev = None
    for pos, tids in events:
        if S is not None and prev is not None and pos - prev > 1:
            m = q._any_power(pos - prev - 1)
            if m is None:
                S = None
            else:
                ml = m.tolist()
                ns = [0] * n
                alive = False
                for i, c in enumerate(S):
                    if c:
                        t_ = ml[i]
                        if t_ >= 0:
                            ns[t_] += c
                            alive = True
                S = ns if alive else None
        ns = [0] * n
        alive = False
        if S is not None:
            for i, c in enumerate(S):
                if c:
                    a = any_py[i]
                    if a >= 0:
                        ns[a] += c
                        alive = True
        for tid in tids:
            st = step_py[terms[tid]]
            if S is not None:
                for i, c in enumerate(S):
                    if c:
                        nx = st[i]
                        if nx >= 0:
                            ns[nx] += c
                            alive = True
                            if accept[nx]:
                                freq += c
            s0 = st[0]
            if s0 >= 0:
                ns[s0] += 1
                alive = True
                if accept[s0]:
                    freq += 1
        S = ns if alive else None
        prev = pos
    return freq


def _batch_freq_automaton(
    q: TermAutomatonQuery,
    d: np.ndarray,
    p: np.ndarray,
    t: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray]:
    """Vectorized countMatches across ALL candidate docs at once.

    Input: the (doc, pos, term-id) event triples lexsorted by
    (doc, pos, tid). Semantics are exactly
    :func:`_doc_freq_automaton` (the reference scorer's multiset walk,
    TermAutomatonScorer.java:261-321) but the DP advances a
    ``(docs x n_det)`` int64 count MATRIX one event-column at a time:

    * events are grouped per (doc, position) with a term-id BITMASK
      (synonym stacks become set bits, processed against the same
      source vector like the scalar code's per-position tid list);
    * docs are sorted by event count DESCENDING so the active rows of
      every column are a prefix — no boolean activity masks;
    * each symbol step is n_det scatter-adds over all active rows;
      accepting term-steps accumulate into a freq vector;
    * ANY-only gaps group rows by DISTINCT gap length and apply the
      doubled next-state map (:meth:`TermAutomatonQuery._any_power`)
      once per distinct length;
    * rows x columns is chunked (sorted order keeps padding waste low)
      so one skewed mega-doc cannot blow up the padded matrices.

    Counts are int64 (the scalar path uses unbounded Python ints; a
    multiset count overflowing int64 would need ~2^63 simultaneous
    parses — unreachable for real token streams). Returns
    ``(docs, freqs)`` for freq > 0 docs, ascending doc order.
    """
    n = q.n_det
    T = len(q.terms)
    # --- event grouping: one row per (doc, position) ----------------
    new_ev = np.r_[True, (d[1:] != d[:-1]) | (p[1:] != p[:-1])]
    ev_starts = np.flatnonzero(new_ev)
    ev_doc = d[ev_starts]
    ev_pos = p[ev_starts]
    ev_mask = np.bitwise_or.reduceat(
        np.int64(1) << t.astype(np.int64), ev_starts
    )
    doc_starts = np.flatnonzero(np.r_[True, ev_doc[1:] != ev_doc[:-1]])
    doc_ids = ev_doc[doc_starts]
    cnt = np.diff(np.r_[doc_starts, len(ev_doc)])
    order = np.argsort(-cnt, kind="stable")
    offsets = doc_starts[order]
    cnt_s = cnt[order]
    docs_sorted = doc_ids[order]
    D = len(docs_sorted)
    freqs = np.zeros(D, dtype=np.int64)
    # per-symbol live arcs: (src, dst, dst_is_accept) with dst >= 0
    accept = q.det_accept
    any_arcs = [
        (i, int(a), bool(accept[a]))
        for i, a in enumerate(q.step[ANY])
        if a >= 0
    ]
    term_arcs = []
    for tid in range(T):
        st = q.step[q.terms[tid]]
        arcs = [
            (i, int(nx), bool(accept[nx]))
            for i, nx in enumerate(st)
            if nx >= 0
        ]
        term_arcs.append((arcs, int(st[0])))
    BUDGET = 1 << 22  # padded cells per chunk
    start = 0
    while start < D:
        me = int(cnt_s[start])
        rows = max(1, BUDGET // max(me, 1))
        end = min(D, start + rows)
        k_all = end - start
        offs = offsets[start:end]
        cs = cnt_s[start:end]
        col = np.arange(me, dtype=np.int64)
        idx = offs[:, None] + col[None, :]
        valid = col[None, :] < cs[:, None]
        idxc = np.where(valid, idx, 0)
        POS = np.where(valid, ev_pos[idxc], np.int64(-1))
        MB = np.where(valid, ev_mask[idxc], np.int64(0))
        # rows active at column j = count of cs > j (cs descending):
        # side="left" counts -cs < -col strictly — side="right" would
        # keep exhausted rows (cs == j) active for one phantom column
        act = np.searchsorted(-cs, -col, side="left")
        S = np.zeros((k_all, n), dtype=np.int64)
        F = np.zeros(k_all, dtype=np.int64)
        for j in range(me):
            k = int(act[j])
            Sv = S[:k]
            if j > 0:
                gaps = POS[:k, j] - POS[:k, j - 1] - 1
                gpos = np.flatnonzero(gaps > 0)
                if len(gpos):
                    for g in np.unique(gaps[gpos]):
                        grows = gpos[gaps[gpos] == g]
                        m = q._any_power(int(g))
                        sub = Sv[grows].copy()
                        Sv[grows] = 0
                        if m is not None:
                            for i in range(n):
                                tgt = int(m[i])
                                if tgt >= 0:
                                    Sv[grows, tgt] += sub[:, i]
            NS = np.zeros((k, n), dtype=np.int64)
            for i, a, _ in any_arcs:
                NS[:, a] += Sv[:, i]
            mb = MB[:k, j]
            for tid in range(T):
                trows = np.flatnonzero((mb >> tid) & 1)
                if not len(trows):
                    continue
                arcs, s0 = term_arcs[tid]
                sub = Sv[trows]
                for i, nx, acc in arcs:
                    NS[trows, nx] += sub[:, i]
                    if acc:
                        F[trows] += sub[:, i]
                if s0 >= 0:
                    NS[trows, s0] += 1
                    if accept[s0]:
                        F[trows] += 1
            S[:k] = NS
        freqs[start:end] = F
        start = end
    hit = freqs > 0
    out_docs = docs_sorted[hit]
    out_freq = freqs[hit]
    o = np.argsort(out_docs, kind="stable")
    return out_docs[o], out_freq[o]


def term_automaton_scored(reader, q: TermAutomatonQuery):
    """-> (docs, scores, dtype) or None: every doc with freq > 0, scored
    with one similarity application (idf summed over the automaton's
    df>0 terms in term-id order — TermAutomatonQuery.java:376-399)."""
    import math

    from .bm25 import make_scorer
    from .query import _gather_norm_keys

    if not q._finished:
        raise ValueError("call finish() before executing")
    if not getattr(reader, "has_positions", False):
        raise ValueError(
            "term-automaton queries need a positions-enabled index "
            "(IndexConfig.positions=True)"
        )
    dtype = np.float32 if reader.norm_kind == "byte4" else np.float64
    empty = (np.empty(0, dtype=np.int64), np.empty(0, dtype=dtype), dtype)
    k1, b = getattr(reader, "bm25_params", (1.2, 0.75))
    idf64 = 0.0
    present: List[str] = []
    term_docs: Dict[str, np.ndarray] = {}
    ev_docs, ev_pos, ev_tid = [], [], []
    for tid, t in enumerate(q.terms):
        df, _ = reader.term_stats(t)
        if df == 0:
            if t in q.required:
                return empty  # a required term absent: nothing matches
            continue
        idf64 += math.log(1.0 + (reader.doc_count - df + 0.5) / (df + 0.5))
        present.append(t)
        docs, tfs, flat = reader.term_positions(t)
        term_docs[t] = docs
        ev_docs.append(np.repeat(docs, tfs))
        ev_pos.append(flat.astype(np.int64))
        ev_tid.append(np.full(int(tfs.sum()), tid, dtype=np.int64))
    if not present:
        return empty
    d = np.concatenate(ev_docs)
    p = np.concatenate(ev_pos)
    t = np.concatenate(ev_tid)
    if len(d) == 0:
        # globally-present terms can still be locally absent (sharded
        # serving under global stats)
        return empty
    # required-term candidate pruning (the reference's noted MUST-term
    # optimization): only docs containing EVERY required term can match,
    # so events narrow to their intersection before the per-doc DP
    allowed: Optional[np.ndarray] = None
    for rt in q.required:
        rd = term_docs[rt]
        allowed = rd if allowed is None else np.intersect1d(
            allowed, rd, assume_unique=True
        )
    if allowed is not None:
        if len(allowed) == 0:
            return empty
        pos_a = np.minimum(
            np.searchsorted(allowed, d), len(allowed) - 1
        )
        keep = allowed[pos_a] == d
        d, p, t = d[keep], p[keep], t[keep]
        if len(d) == 0:
            return empty
    order = np.lexsort((t, p, d))
    d, p, t = d[order], p[order], t[order]
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted):
        j = np.minimum(np.searchsorted(deleted, d), len(deleted) - 1)
        keep = deleted[j] != d
        d, p, t = d[keep], p[keep], t[keep]
        if len(d) == 0:
            return empty
    if len(q.terms) <= 63:
        docs_u, pf = _batch_freq_automaton(q, d, p, t)
    else:  # bitmask layout needs tid < 64: scalar per-doc fallback
        out_docs, out_freq = [], []
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        bounds = np.r_[starts, len(d)]
        p_l = p.tolist()
        t_l = t.tolist()
        for i in range(len(starts)):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            doc = int(d[lo])
            events: List[Tuple[int, List[int]]] = []
            last_pos = -1
            for j in range(lo, hi):
                pos = p_l[j]
                if pos == last_pos:
                    events[-1][1].append(t_l[j])
                else:
                    events.append((pos, [t_l[j]]))
                    last_pos = pos
            freq = _doc_freq_automaton(q, events)
            if freq > 0:
                out_docs.append(doc)
                out_freq.append(freq)
        docs_u = np.asarray(out_docs, dtype=np.int64)
        pf = np.asarray(out_freq, dtype=np.int64)
    if not len(docs_u):
        return empty
    keys_u = np.zeros(len(docs_u), dtype=np.int64)
    have = np.zeros(len(docs_u), dtype=bool)
    for term in present:
        tdocs, _, _ = reader.term_positions(term)
        if len(tdocs) == 0:
            continue
        pos = np.minimum(np.searchsorted(tdocs, docs_u), len(tdocs) - 1)
        hit = (tdocs[pos] == docs_u) & ~have
        if hit.any():
            keys_u[hit] = _gather_norm_keys(reader, term, docs_u[hit])
            have[hit] = True
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
    scores = scorer.score_array(pf, keys_u)
    return docs_u, scores.astype(dtype, copy=False), dtype


def score_term_automaton(reader, q: TermAutomatonQuery, k: int = 10):
    """Top-k (score desc, doc asc) over the automaton matches."""
    got = term_automaton_scored(reader, q)
    dtype = got[2] if got is not None else np.float64
    if got is None or len(got[0]) == 0:
        return np.empty(0, np.int64), np.empty(0, dtype)
    docs, scores, _ = got
    order = np.lexsort((docs, -scores.astype(np.float64)))[:k]
    return docs[order], scores[order]


def token_stream_to_automaton(
    text: str, analyzer, preserve_position_increments: bool = True
) -> Optional[TermAutomatonQuery]:
    """TokenStreamToTermAutomatonQuery.toQuery analogue (reference:
    sandbox/src/java/org/apache/lucene/sandbox/search/
    TokenStreamToTermAutomatonQuery.java:55-112): pull the analyzed
    token graph and build the sausage automaton — one state per token
    position, an arc per token (synonyms at posInc=0 become parallel
    arcs between the same states), the literal term ``*`` becomes an
    ANY transition, and the LAST position's state is the sole accept.
    Position holes (stopword drops, posInc > 1) raise exactly like the
    reference ("cannot handle holes; to accept any term, use '*'")
    unless ``preserve_position_increments=False``, which collapses them
    to increment 1 (:72-75). Returns None for an empty stream."""
    if hasattr(analyzer, "analyze_positions"):
        terms, positions = analyzer.analyze_positions(text)
    else:  # tokenizers without explicit increments: sequential positions
        terms = analyzer.analyze(text)
        positions = list(range(len(terms)))
    if not terms:
        return None
    if not preserve_position_increments:
        dense = {p: i for i, p in enumerate(sorted(set(positions)))}
        positions = [dense[p] for p in positions]
    else:
        prev = -1
        for p in sorted(set(positions)):
            if p - prev > 1:
                raise ValueError(
                    "cannot handle holes; to accept any term, use '*' term"
                )
            prev = p
    q = TermAutomatonQuery()
    max_pos = max(positions)
    states = [0] + [q.create_state() for _ in range(max_pos + 1)]
    for t, p in zip(terms, positions):
        if t == "*":
            q.add_any_transition(states[p], states[p + 1])
        else:
            q.add_transition(states[p], states[p + 1], t)
    q.set_accept(states[max_pos + 1])
    return q.finish()
