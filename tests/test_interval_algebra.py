"""Recursive intervals source algebra (Intervals.or / phrase(block) /
ordered-over-sources / extend / atLeast / maxgaps-maxwidth wrappers /
multiterm expansion + the derived within / notWithin / unorderedNoOverlaps
compositions) vs an independent set-theoretic brute model: per doc,
enumerate every candidate combination window from the definitions and
minimize by containment — no shared code with the engine's greedy
searchsorted kernels."""

from __future__ import annotations

import itertools
import random
import re

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.intervals import (
    IntervalAtLeast,
    IntervalBlock,
    IntervalContainedBy,
    IntervalContaining,
    IntervalExtend,
    IntervalFiltered,
    IntervalMultiTerm,
    IntervalOr,
    IntervalOrdered,
    IntervalOverlapping,
    IntervalBeforeAfter,
    IntervalQuery,
    interval_within,
    minimal_intervals,
    score_intervals,
    source_intervals,
    source_min_extent,
    unordered_no_overlaps,
)
from lucene_ray.functions.multiterm import expand
from lucene_ray.functions.query import _POS_SHIFT
from lucene_ray.pipelines.build import IndexConfig, build_index
from lucene_ray.state.reader import IndexReader

_MASK = (1 << _POS_SHIFT) - 1
_TOK = re.compile(r"[a-z0-9]+")

TEXTS = [
    "alpha beta gamma",
    "alpha x x beta gamma",
    "beta alpha gamma",
    "gamma filler alpha beta",
    "alpha beta x gamma alpha",
    "alphabet betac ax alpha",
    "x alpha x beta x gamma x",
    "beta beta alpha alpha gamma",
    "plain filler words",
]


@pytest.fixture(scope="module")
def alg_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("ivalg") / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    return out


# ---------------------------------------------------------------------------
# brute model: per-doc interval sets from the set-theoretic definitions
# ---------------------------------------------------------------------------


def _minimize(items):
    """Containment-minimal set; duplicate (s, e) keep the smallest gaps."""
    best = {}
    for s, e, g in items:
        k = (s, e)
        if k not in best or _gl(g) < _gl(best[k]):
            best[k] = g
    out = []
    for (s, e), g in best.items():
        if not any(
            (s2, e2) != (s, e) and s2 >= s and e2 <= e for (s2, e2) in best
        ):
            out.append((s, e, g))
    return sorted(out)


def _gl(g):
    return 10 ** 9 if g is None else g


def brute(node, toks, vocab):
    """-> sorted [(start, end, gaps-or-None)] for one doc's token list."""
    if isinstance(node, str):
        return [(i, i, 0) for i, t in enumerate(toks) if t == node]
    if isinstance(node, IntervalMultiTerm):
        terms = set(expand(node.kind, node.pattern, node.arg, vocab))
        return [(i, i, 0) for i, t in enumerate(toks) if t in terms]
    if isinstance(node, IntervalQuery):
        subs = [brute(t, toks, vocab) for t in node.terms]
        if node.ordered:
            cands = _ordered_combos(subs, block=False)
        else:
            n = len(subs)
            cands = [
                (s, e, (e - s + 1) - n)
                for s, e, _ in _atleast_windows(subs, n, len(toks))
            ]
        out = _minimize(cands)
        return _filter_gw(out, node.max_gaps, node.max_width)
    if isinstance(node, IntervalOrdered):
        subs = [brute(x, toks, vocab) for x in node.sources]
        if len(subs) == 1:
            return subs[0]
        return _minimize(_ordered_combos(subs, block=False))
    if isinstance(node, IntervalBlock):
        subs = [brute(x, toks, vocab) for x in node.sources]
        if len(subs) == 1:
            return subs[0]
        return _minimize(_ordered_combos(subs, block=True))
    if isinstance(node, IntervalOr):
        return _minimize(
            [iv for x in node.sources for iv in brute(x, toks, vocab)]
        )
    if isinstance(node, IntervalExtend):
        return sorted(
            (max(s - node.before, 0), e + node.after, g)
            for s, e, g in brute(node.source, toks, vocab)
        )
    if isinstance(node, IntervalAtLeast):
        subs = [brute(x, toks, vocab) for x in node.sources]
        if node.min_match > len(subs):
            return []
        cands = _atleast_windows(subs, node.min_match, len(toks))
        return _minimize([(s, e, None) for s, e, _ in cands])
    if isinstance(node, IntervalFiltered):
        return _filter_gw(
            brute(node.source, toks, vocab), node.max_gaps, node.max_width
        )
    if isinstance(node, IntervalContaining):
        big = brute(node.big, toks, vocab)
        small = brute(node.small, toks, vocab)
        return [
            (s, e, g)
            for s, e, g in big
            if any(s2 >= s and e2 <= e for s2, e2, _ in small) != node.negate
        ]
    if isinstance(node, IntervalContainedBy):
        big = brute(node.big, toks, vocab)
        small = brute(node.small, toks, vocab)
        return [
            (s, e, g)
            for s, e, g in small
            if any(s2 <= s and e2 >= e for s2, e2, _ in big) != node.negate
        ]
    if isinstance(node, IntervalOverlapping):
        big = brute(node.big, toks, vocab)
        other = brute(node.other, toks, vocab)
        return [
            (s, e, g)
            for s, e, g in big
            if any(s2 <= e and e2 >= s for s2, e2, _ in other) != node.negate
        ]
    if isinstance(node, IntervalBeforeAfter):
        big = brute(node.big, toks, vocab)
        other = brute(node.other, toks, vocab)
        if node.mode == "before":
            return [
                (s, e, g) for s, e, g in big
                if any(s2 > e for s2, _e2, _ in other)
            ]
        return [
            (s, e, g) for s, e, g in big
            if any(e2 < s for _s2, e2, _ in other)
        ]
    raise TypeError(type(node).__name__)


def _ordered_combos(subs, block):
    cands = []
    if any(not s for s in subs):
        return cands
    for combo in itertools.product(*subs):
        ok = True
        for (s1, e1, _), (s2, e2, _) in zip(combo, combo[1:]):
            if block and s2 != e1 + 1:
                ok = False
                break
            if not block and s2 <= e1:
                ok = False
                break
        if ok:
            w = combo[-1][1] - combo[0][0] + 1
            wsum = sum(e - s + 1 for s, e, _ in combo)
            cands.append((combo[0][0], combo[-1][1], w - wsum))
    return cands


def _atleast_windows(subs, m, ntoks):
    # extended sub-intervals can reach past the doc end (neither the
    # engine nor the reference clamps them), so bound by the max sub end
    hi = max(
        [ntoks - 1] + [e for lst in subs for _s, e, _g in lst]
    )
    cands = []
    for s in range(hi + 1):
        for e in range(s, hi + 1):
            covered = sum(
                1
                for lst in subs
                if any(s2 >= s and e2 <= e for s2, e2, _ in lst)
            )
            if covered >= m:
                wsum = None  # gaps undefined in the brute (tie-ambiguous)
                cands.append((s, e, wsum))
    return [(s, e, None) for s, e, _ in cands]


def _filter_gw(items, mg, mw):
    out = []
    for s, e, g in items:
        if mg is not None and (g is None or g > mg):
            continue
        if mw is not None and (e - s + 1) > mw:
            continue
        out.append((s, e, g))
    return out


def _has_atleast(node):
    if isinstance(node, IntervalAtLeast):
        return True
    if isinstance(node, IntervalQuery) and not node.ordered:
        return True  # brute models unordered via windows (g defined though)
    for f in ("sources",):
        for x in getattr(node, f, ()):
            if _has_atleast(x):
                return True
    for f in ("source", "big", "small", "other"):
        x = getattr(node, f, None)
        if x is not None and not isinstance(x, (str, int, float, bool)):
            if _has_atleast(x):
                return True
    return False


def _engine_by_doc(reader, node, with_gaps):
    s, e, g = source_intervals(reader, node)
    out = {}
    for a, b, c in zip(s.tolist(), e.tolist(), g.tolist()):
        d = a >> _POS_SHIFT
        iv = (a & _MASK, b & _MASK, c if with_gaps else None)
        out.setdefault(d, []).append(iv)
    return {d: sorted(v) for d, v in out.items()}


def _brute_by_doc(node, texts, vocab, with_gaps):
    out = {}
    for d, t in enumerate(texts):
        toks = _TOK.findall(t.lower())
        ivs = brute(node, toks, vocab)
        if ivs:
            out[d] = sorted(
                (s, e, g if with_gaps else None) for s, e, g in ivs
            )
    return out


def _check(reader, node, texts, vocab, with_gaps=True):
    wg = with_gaps and not _has_atleast(node)
    got = _engine_by_doc(reader, node, wg)
    want = _brute_by_doc(node, texts, vocab, wg)
    assert got == want, (node, got, want)


VOCAB = sorted(
    {t for txt in TEXTS for t in _TOK.findall(txt.lower())}
)


def test_or_block_extend_atleast_vs_model(alg_index):
    reader = IndexReader(alg_index)
    oab = IntervalOrdered(("alpha", "beta"))
    cases = [
        IntervalOr(("alpha", "beta")),
        IntervalOr((oab, IntervalOrdered(("beta", "gamma")))),
        IntervalOr((IntervalQuery(("alpha", "beta"), max_gaps=0), "gamma")),
        IntervalBlock(("alpha", "beta")),
        IntervalBlock(("alpha", "beta", "gamma")),
        IntervalBlock(("alpha", IntervalExtend("x", 0, 1), "beta")),
        IntervalExtend(oab, 1, 2),
        IntervalExtend("alpha", 3, 0),  # start clamp at 0
        IntervalAtLeast(2, ("alpha", "beta", "gamma")),
        IntervalAtLeast(3, ("alpha", "beta", "gamma")),
        IntervalAtLeast(4, ("alpha", "beta", "gamma")),  # m > n: empty
        IntervalAtLeast(2, (oab, "gamma", "filler")),
        IntervalFiltered(
            IntervalOr((oab, IntervalOrdered(("beta", "gamma")))), max_gaps=0
        ),
        IntervalFiltered(IntervalAtLeast(2, ("alpha", "beta", "x")),
                         max_width=3),
        unordered_no_overlaps("alpha", "beta"),
        unordered_no_overlaps(oab, "gamma"),
        interval_within("gamma", 2, oab),
        interval_within("gamma", 2, oab, negate=True),
        IntervalContaining(big=IntervalExtend(oab, 0, 1), small="gamma"),
        IntervalContainedBy(small=IntervalBlock(("alpha", "beta")), big=oab),
        IntervalBeforeAfter(big=IntervalOr(("alpha", "x")), other="gamma",
                            mode="before"),
    ]
    for node in cases:
        _check(reader, node, TEXTS, VOCAB)


def test_identities(alg_index):
    """Structural identities the reference guarantees."""
    reader = IndexReader(alg_index)
    # ordered over bare terms == the flat fast path
    s1, e1 = minimal_intervals(reader, IntervalQuery(("alpha", "beta")))
    s2, e2, _ = source_intervals(reader, IntervalOrdered(("alpha", "beta")))
    assert s1.tolist() == s2.tolist() and e1.tolist() == e2.tolist()
    # atLeast(n) == unordered (Intervals.java:567-571)
    s3, e3 = minimal_intervals(
        reader, IntervalQuery(("alpha", "beta", "gamma"), ordered=False)
    )
    s4, e4, _ = source_intervals(
        reader, IntervalAtLeast(3, ("alpha", "beta", "gamma"))
    )
    assert s3.tolist() == s4.tolist() and e3.tolist() == e4.tolist()
    # block over terms == ordered with maxgaps 0 over the same terms
    s5, e5 = minimal_intervals(
        reader, IntervalQuery(("alpha", "beta"), max_gaps=0)
    )
    s6, e6, g6 = source_intervals(reader, IntervalBlock(("alpha", "beta")))
    assert s5.tolist() == s6.tolist() and e5.tolist() == e6.tolist()
    assert not g6.any()  # BlockIntervalsSource.java:111-113: gaps always 0
    # minExtent arithmetic (atLeast = sum of m smallest; or = min;
    # extend adds both offsets; block sums)
    oab = IntervalOrdered(("alpha", "beta"))
    assert source_min_extent(IntervalAtLeast(2, (oab, "x", "gamma"))) == 2
    assert source_min_extent(IntervalOr((oab, "x"))) == 1
    assert source_min_extent(IntervalExtend(oab, 1, 2)) == 5
    assert source_min_extent(IntervalBlock((oab, "x"))) == 3


def test_multiterm_intervals(alg_index):
    reader = IndexReader(alg_index)
    for node in [
        IntervalMultiTerm("prefix", "alpha"),
        IntervalMultiTerm("wildcard", "*a"),
        IntervalMultiTerm("prefix", "zzz"),
        IntervalOrdered((IntervalMultiTerm("prefix", "alpha"), "beta")),
    ]:
        _check(reader, node, TEXTS, VOCAB)
    # past max_expansions the reference throws (Intervals.java:160-175)
    with pytest.raises(ValueError, match="expands to more"):
        source_intervals(
            reader, IntervalMultiTerm("wildcard", "*", max_expansions=2)
        )


def test_score_over_algebra_nodes(alg_index):
    """score_intervals over any node: freq sums 1/max(w - minExtent + 1, 1)
    and the saturation score applies the kwargs pivot/boost."""
    reader = IndexReader(alg_index)
    node = IntervalAtLeast(2, ("alpha", "beta", "gamma"))
    docs, scores = score_intervals(reader, node, k=20, pivot=1.0, boost=2.0)
    me = source_min_extent(node)
    want = {}
    for d, t in enumerate(TEXTS):
        toks = _TOK.findall(t.lower())
        f = sum(
            1.0 / max(e - s + 1 - me + 1, 1)
            for s, e, _ in brute(node, toks, VOCAB)
        )
        if f:
            want[d] = 2.0 * f / (f + 1.0)
    got = dict(zip(docs.tolist(), scores.tolist()))
    assert got == pytest.approx(want)


def test_sigmoid_score_function(alg_index):
    """IntervalScoreFunction.sigmoidFunction (IntervalQuery.java:98):
    score = boost * (1 - pivot^a / (freq^a + pivot^a)); pivot/exp <= 0
    reject like the reference."""
    reader = IndexReader(alg_index)
    node = IntervalOrdered(("alpha", "beta"))
    d_sat, s_sat = score_intervals(reader, node, k=20)
    d_sig, s_sig = score_intervals(reader, node, k=20, pivot=1.5, exp=2.0)
    assert d_sat.tolist() and d_sig.tolist()
    # recompute freq from the saturation score and check the sigmoid
    freqs = s_sat / (1.0 - s_sat)  # freq/(freq+1) inverted
    by_sat = dict(zip(d_sat.tolist(), freqs.tolist()))
    ppa = 1.5 ** 2.0
    want = {
        d: 1.0 - ppa / (f ** 2.0 + ppa) for d, f in by_sat.items()
    }
    got = dict(zip(d_sig.tolist(), s_sig.tolist()))
    for d in got:
        assert got[d] == pytest.approx(want[d], abs=1e-12)
    with pytest.raises(ValueError, match="pivot"):
        score_intervals(reader, node, k=5, pivot=0.0)
    with pytest.raises(ValueError, match="exp"):
        score_intervals(reader, node, k=5, exp=-1.0)


def test_analyzed_text(alg_index):
    """Intervals.analyzedText: stopword holes become extend(term, g, 0)
    sub-sources, so a maxgaps=0 phrase still matches across the hole
    (IntervalBuilder.java:155-169)."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.intervals import analyzed_text

    reader = IndexReader(alg_index)
    an = make_analyzer("en_nostem_simple")
    # plain adjacent phrase == the block/ordered equivalent
    src = analyzed_text("alpha beta", an, max_gaps=0)
    s1, e1, _ = source_intervals(reader, src)
    s2, e2 = minimal_intervals(
        reader, IntervalQuery(("alpha", "beta"), max_gaps=0)
    )
    assert s1.tolist() == s2.tolist() and e1.tolist() == e2.tolist()
    # "alpha the beta": 'the' is a stopword -> hole -> extend(beta, 1, 0);
    # maxgaps=0 must still match docs where alpha and beta sit 2 apart
    src_hole = analyzed_text("alpha the beta", an, max_gaps=0)
    sh, eh, gh = source_intervals(reader, src_hole)
    docs = sorted({int(x) >> _POS_SHIFT for x in sh})
    # doc 1 is "alpha x x beta gamma" (alpha..beta distance 3 -> no);
    # hole-tolerant match needs distance exactly 2: none in TEXTS has
    # alpha _ beta except doc 1's "alpha x x beta" (distance 3) — check
    # against the brute equivalent instead of a golden
    want = []
    for d, t in enumerate(TEXTS):
        toks = _TOK.findall(t.lower())
        if any(
            a == "alpha" and i + 2 < len(toks) and toks[i + 2] == "beta"
            for i, a in enumerate(toks)
        ):
            want.append(d)
    assert docs == want
    assert not gh.any()  # the hole is covered by the extension, gaps 0
    # unordered + duplicate tokens raise like the flat kernel
    with pytest.raises(ValueError, match="distinct"):
        analyzed_text("alpha alpha", an, ordered=False)
    # empty analysis -> no-match source
    s0, e0, _ = source_intervals(reader, analyzed_text("the", an))
    assert len(s0) == 0


def test_algebra_random_fuzz(ray_session, tmp_path):
    """Random nested trees (depth <= 3) over random texts vs the brute
    model — engine kernels and brute share no code."""
    import ray.data

    rng = random.Random(41)
    vocab = ["ia", "ib", "ic", "id", "ie"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 14)))
        for _ in range(35)
    ]
    out = str(tmp_path / "ivfz")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(texts))
    reader = IndexReader(out)

    def leaf():
        if rng.random() < 0.2:
            return IntervalMultiTerm("prefix", rng.choice(["i", "ia", "ib"]))
        return rng.choice(vocab)

    def tree(depth):
        if depth == 0:
            return leaf()
        kind = rng.choice(
            ["ordered", "block", "or", "atleast", "extend", "filtered",
             "containing", "contained_by", "overlapping", "before_after",
             "within", "leaf"]
        )
        if kind == "leaf":
            return leaf()
        if kind == "ordered":
            n = rng.randint(2, 3)
            return IntervalOrdered(tuple(tree(depth - 1) for _ in range(n)))
        if kind == "block":
            n = rng.randint(2, 3)
            return IntervalBlock(tuple(tree(depth - 1) for _ in range(n)))
        if kind == "or":
            n = rng.randint(2, 3)
            return IntervalOr(tuple(tree(depth - 1) for _ in range(n)))
        if kind == "atleast":
            n = rng.randint(2, 4)
            m = rng.randint(1, n)
            return IntervalAtLeast(
                m, tuple(tree(depth - 1) for _ in range(n))
            )
        if kind == "extend":
            return IntervalExtend(
                tree(depth - 1), rng.randint(0, 2), rng.randint(0, 2)
            )
        if kind == "filtered":
            sub = tree(depth - 1)
            # maxgaps over an atLeast subtree is tie-dependent in the
            # reference too (which sub-iterators the PQ picks); the brute
            # can't model it, so only width-filter those
            mg = rng.choice([None, 0, 1, 3])
            return IntervalFiltered(
                sub,
                max_gaps=None if _has_atleast(sub) else mg,
                max_width=rng.choice([None, 2, 4]),
            )
        if kind == "containing":
            return IntervalContaining(
                big=tree(depth - 1), small=tree(depth - 1),
                negate=rng.random() < 0.5,
            )
        if kind == "contained_by":
            return IntervalContainedBy(
                small=tree(depth - 1), big=tree(depth - 1),
                negate=rng.random() < 0.5,
            )
        if kind == "overlapping":
            return IntervalOverlapping(
                big=tree(depth - 1), other=tree(depth - 1),
                negate=rng.random() < 0.5,
            )
        if kind == "before_after":
            return IntervalBeforeAfter(
                big=tree(depth - 1), other=tree(depth - 1),
                mode=rng.choice(["before", "after"]),
            )
        return interval_within(
            tree(depth - 1), rng.randint(0, 3), tree(depth - 1),
            negate=rng.random() < 0.5,
        )

    checked = 0
    for trial in range(80):
        node = tree(rng.randint(1, 3))
        if isinstance(node, str):
            continue
        _check(reader, node, texts, vocab)
        checked += 1
    assert checked >= 60
