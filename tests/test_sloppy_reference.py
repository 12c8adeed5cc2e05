"""Adversarial sloppy-phrase golden vs the ported reference matcher
(tests/sloppy_reference.py, a faithful port of SloppyPhraseMatcher's
PhrasePositions sweep incl. repeat-group collision handling).

Findings this suite pins down (8000-case fuzz, round 3):

* MATCH EXISTENCE always agrees: a doc has engine sloppy freq > 0 iff
  the reference sweep finds a match — candidate sets are identical.
* slop=0 freqs are REFERENCE-IDENTICAL, repeats included: the exact
  sweep degenerates to adjacency counting, which is the engine's exact
  path.
* slop>0 WEIGHTS diverge in ~17% of repeat-heavy cases, in BOTH
  directions: the engine counts one exact-minimal window per
  first-term anchor (deterministic, SQL-expressible); the reference's
  greedy pq propagation can count extra wider matches per region AND
  skip combinations (its own docstring concedes missed combinations
  and order-asymmetry — "a b c"~4 vs "c b a"~4 score differently,
  SloppyPhraseMatcher.java:44-49). Neither dominates, so the engine
  keeps its semantics; the oracle entries encode them.
"""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.query import PhraseQuery, _sloppy_freqs

from sloppy_reference import reference_sloppy_freq

ALPHABET = ["ga", "gb", "gc", "gd"]


def _doc_pos(tokens):
    d = {}
    for i, t in enumerate(tokens):
        d.setdefault(t, []).append(i)
    return d


def _engine_freq(terms, offsets, pos_by_term, slop):
    pos_cache = {}
    for t in set(terms):
        ps = np.asarray(sorted(pos_by_term.get(t, [])), dtype=np.int32)
        if len(ps) == 0:
            return 0.0
        pos_cache[t] = (
            np.array([0], dtype=np.int64),
            np.array([len(ps)], dtype=np.int64),
            ps,
        )
    ph = PhraseQuery(terms=tuple(terms), offsets=tuple(offsets), slop=slop)
    docs_u, pf = _sloppy_freqs(pos_cache, ph)
    return float(pf[0]) if len(docs_u) else 0.0


def _exact_count(terms, offsets, pos_by_term):
    sets = [
        {p - off for p in pos_by_term.get(t, ())}
        for t, off in zip(terms, offsets)
    ]
    return len(set.intersection(*sets)) if sets else 0


def test_port_reproduces_reference_examples():
    """The reference's own docstring examples, verified against the port
    (SloppyPhraseMatcher.java:40-49)."""
    ex = _doc_pos("x a b a y".split())
    # "a b"~2 matches twice: exact (w=1) + reversed at distance 2 (w=1/3)
    assert reference_sloppy_freq(("a", "b"), (0, 1), ex, 2) == pytest.approx(
        1 + 1 / 3
    )
    # order-asymmetry the reference concedes: equivalent queries score
    # differently under the greedy propagation
    ex2 = _doc_pos("a b c b a".split())
    f1 = reference_sloppy_freq(("a", "b", "c"), (0, 1, 2), ex2, 4)
    f2 = reference_sloppy_freq(("c", "b", "a"), (0, 1, 2), ex2, 4)
    assert f1 == pytest.approx(1.4) and f2 == pytest.approx(1.2)
    assert f1 != f2


def _random_cases(seed, n_cases, slops):
    rng = np.random.default_rng(seed)
    for _ in range(n_cases):
        L = int(rng.integers(2, 15))
        toks = [ALPHABET[i] for i in rng.integers(0, len(ALPHABET), L)]
        nt = int(rng.integers(2, 4))
        terms = tuple(ALPHABET[i] for i in rng.integers(0, len(ALPHABET), nt))
        offsets = tuple(range(nt))
        slop = int(rng.choice(slops))
        yield toks, terms, offsets, slop


def test_slop0_reference_equals_exact_count():
    """At slop 0 the reference sweep counts exactly the adjacency
    anchors — the engine's exact-phrase semantics — repeats included."""
    for toks, terms, offsets, _ in _random_cases(11, 3000, [0]):
        pbt = _doc_pos(toks)
        ref = reference_sloppy_freq(terms, offsets, pbt, 0)
        assert ref == pytest.approx(float(_exact_count(terms, offsets, pbt))), (
            toks, terms,
        )


def test_match_existence_agrees_with_reference():
    """freq > 0 must agree doc-by-doc between the engine's per-anchor
    matcher and the reference sweep — the deviation is weighting only,
    never membership (would otherwise leak into candidate sets and
    filters)."""
    for toks, terms, offsets, slop in _random_cases(13, 3000, [1, 2, 3, 4]):
        pbt = _doc_pos(toks)
        ref = reference_sloppy_freq(terms, offsets, pbt, slop)
        eng = _engine_freq(terms, offsets, pbt, slop)
        assert (ref > 0) == (eng > 0), (toks, terms, slop, ref, eng)


def test_divergence_goldens_two_sided():
    """Pinned weight-divergence cases — one per direction, so a change
    to either matcher's semantics surfaces here. Engine HIGHER (the
    sweep skipped a tighter per-anchor combination) and engine LOWER
    (the sweep counted an extra wider match in the same region)."""
    # engine higher: 'gd ga gd ga gc gc gd', phrase (gd, gc) slop 4
    toks = "gd ga gd ga gc gc gd".split()
    pbt = _doc_pos(toks)
    ref = reference_sloppy_freq(("gd", "gc"), (0, 1), pbt, 4)
    eng = _engine_freq(("gd", "gc"), (0, 1), pbt, 4)
    assert ref == pytest.approx(0.5 + 1 / 3)   # 0.8333...
    assert eng == pytest.approx(1.0 + 1 / 12)  # anchors @0,@2,@6 minimal
    assert eng > ref
    # engine lower: repeat-free query over a repeat-heavy doc
    toks2 = "gb gb gb gd ga gb ga gb gd gc gb gd".split()
    pbt2 = _doc_pos(toks2)
    ref2 = reference_sloppy_freq(("ga", "gb", "gd"), (0, 1, 2), pbt2, 3)
    eng2 = _engine_freq(("ga", "gb", "gd"), (0, 1, 2), pbt2, 3)
    assert eng2 < ref2
