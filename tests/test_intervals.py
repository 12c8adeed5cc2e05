"""Interval queries (queries/intervals analogue): vectorized minimal
ordered intervals vs a literal python port of OrderedIntervalsSource's
greedy-chain + minimize trace, plus saturation-score golden cases."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.intervals import (
    IntervalQuery,
    interval_freqs,
    score_intervals,
)
from lucene_ray.pipelines.build import IndexConfig, build_index
from lucene_ray.state.reader import IndexReader

TEXTS = [
    "alpha beta",                              # gap 0
    "alpha filler beta",                       # gap 1
    "alpha alpha beta",                        # two chains, same end -> 1
    "alpha beta alpha filler filler beta",     # two minimal intervals
    "beta alpha",                              # wrong order
    "alpha filler filler filler filler beta",  # gap 4
    "alpha beta gamma",                        # 3-term chain
    "alpha filler beta gamma alpha beta filler gamma",
    "plain filler words",
]


def _model_minimal_ordered(pos_lists):
    """Literal model: greedy chain per first-clause position (each link =
    first position strictly after previous), minimized by dropping chains
    whose end equals a later-starting chain's end."""
    chains = []
    for p0 in pos_lists[0]:
        prev = p0
        ok = True
        for lst in pos_lists[1:]:
            nxt = [p for p in lst if p > prev]
            if not nxt:
                ok = False
                break
            prev = nxt[0]
        if ok:
            chains.append((p0, prev))
    minimal = [
        (s, e)
        for i, (s, e) in enumerate(chains)
        if not any(e2 == e for (s2, e2) in chains[i + 1 :])
    ]
    return minimal


def _model_freqs(analyzer, texts, terms, max_gaps=None, max_width=None):
    out = {}
    n = len(terms)
    for d, text in enumerate(texts):
        toks, pos = analyzer.analyze_positions(text)
        by_term = {}
        for t, p in zip(toks, pos):
            by_term.setdefault(t, []).append(p)
        lists = [sorted(by_term.get(t, [])) for t in terms]
        if any(not l for l in lists):
            continue
        freq = 0.0
        for s, e in _model_minimal_ordered(lists):
            gaps = e - s - (n - 1)
            if max_gaps is not None and gaps > max_gaps:
                continue
            if max_width is not None and (gaps + n) > max_width:
                continue
            freq += 1.0 / (1.0 + gaps)
        if freq > 0:
            out[d] = freq
    return out


@pytest.fixture(scope="module")
def pos_index(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("iv") / "idx")
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


CASES = [
    (("alpha", "beta"), None, None),
    (("alpha", "beta"), 0, None),
    (("alpha", "beta"), 2, None),
    (("alpha", "beta"), None, 3),
    (("alpha", "beta", "gamma"), None, None),
    (("alpha", "beta", "gamma"), 1, None),
    (("alpha",), None, None),
    (("alpha", "zzzmissing"), None, None),
]


def test_interval_freqs_match_model(pos_index):
    reader = IndexReader(pos_index)
    an = make_analyzer("en_nostem_simple")
    for terms, mg, mw in CASES:
        docs, freqs = interval_freqs(
            reader, IntervalQuery(terms, max_gaps=mg, max_width=mw)
        )
        got = dict(zip(docs.tolist(), freqs.tolist()))
        want = _model_freqs(an, TEXTS, list(terms), mg, mw)
        assert got.keys() == want.keys(), (terms, mg, mw)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1e-12), (terms, d)


def test_interval_goldens(pos_index):
    reader = IndexReader(pos_index)
    docs, freqs = interval_freqs(reader, IntervalQuery(("alpha", "beta")))
    by = dict(zip(docs.tolist(), freqs.tolist()))
    assert by[0] == 1.0          # adjacent
    assert by[1] == 0.5          # one gap
    assert by[2] == 1.0          # equal-end chains minimized to ONE
    assert by[3] == 1.0 + 1.0 / 3  # two minimal intervals (gaps 0 and 2)
    assert 4 not in by           # wrong order
    assert by[5] == 0.2          # gap 4
    assert by[7] == 1.5          # gaps 1 and 0
    # saturation scoring: boost * freq/(freq+pivot), doc-asc ties
    sdocs, scores = score_intervals(
        reader, IntervalQuery(("alpha", "beta"), pivot=1.0), k=4
    )
    assert scores[0] == pytest.approx(1.5 / 2.5)
    assert scores[1] == pytest.approx((4 / 3) / (4 / 3 + 1))
    assert list(sdocs[:2]) == [7, 3]
    # equal scores tie-break by doc asc
    assert list(sdocs[2:]) == [0, 2]


def test_interval_requires_positions(ray_session, tmp_path):
    import ray.data

    out = str(tmp_path / "nopos")
    docs = pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["alpha beta"])}
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=1
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=1)
    with pytest.raises(ValueError):
        interval_freqs(IndexReader(out), IntervalQuery(("alpha", "beta")))


def _model_minimal_unordered(lists):
    """Brute-force TRUE minimal unordered intervals: enumerate all
    covering windows (one position per list), keep those containing no
    other covering window."""
    import itertools as it

    wins = set()
    for combo in it.product(*lists):
        wins.add((min(combo), max(combo)))
    return [
        (s, e)
        for (s, e) in wins
        if not any(
            (s2, e2) != (s, e) and s2 >= s and e2 <= e for (s2, e2) in wins
        )
    ]


def _model_unordered_freqs(analyzer, texts, terms, max_gaps=None,
                           max_width=None):
    out = {}
    n = len(terms)
    for d, text in enumerate(texts):
        toks, pos = analyzer.analyze_positions(text)
        by_term = {}
        for t, p in zip(toks, pos):
            by_term.setdefault(t, []).append(p)
        lists = [sorted(by_term.get(t, [])) for t in terms]
        if any(not l for l in lists):
            continue
        freq = 0.0
        for s, e in _model_minimal_unordered(lists):
            length = e - s + 1
            if max_gaps is not None and (length - n) > max_gaps:
                continue
            if max_width is not None and length > max_width:
                continue
            freq += 1.0 / max(length - n + 1, 1)
        if freq > 0:
            out[d] = freq
    return out


UNORDERED_CASES = [
    (("alpha", "beta"), None, None),
    (("beta", "alpha"), None, None),     # order-free: same result
    (("alpha", "beta"), 1, None),
    (("alpha", "beta", "gamma"), None, None),
    (("alpha", "beta", "gamma"), None, 4),
    (("gamma", "alpha"), None, None),
    (("alpha", "zzzmissing"), None, None),
]


def test_unordered_interval_freqs_match_model(pos_index):
    reader = IndexReader(pos_index)
    an = make_analyzer("en_nostem_simple")
    for terms, mg, mw in UNORDERED_CASES:
        docs, freqs = interval_freqs(
            reader,
            IntervalQuery(terms, max_gaps=mg, max_width=mw, ordered=False),
        )
        got = dict(zip(docs.tolist(), freqs.tolist()))
        want = _model_unordered_freqs(an, TEXTS, list(terms), mg, mw)
        assert got.keys() == want.keys(), (terms, mg, mw)
        for d in want:
            assert got[d] == pytest.approx(want[d], abs=1e-12), (terms, d)


def test_unordered_interval_symmetry_and_goldens(pos_index):
    reader = IndexReader(pos_index)
    a, fa = interval_freqs(
        reader, IntervalQuery(("alpha", "beta"), ordered=False)
    )
    b, fb = interval_freqs(
        reader, IntervalQuery(("beta", "alpha"), ordered=False)
    )
    assert a.tolist() == b.tolist() and fa.tolist() == fb.tolist()
    by = dict(zip(a.tolist(), fa.tolist()))
    assert by[4] == 1.0  # "beta alpha": unordered matches reversed order
    assert by[0] == 1.0

    with pytest.raises(ValueError, match="distinct"):
        interval_freqs(
            reader, IntervalQuery(("alpha", "alpha"), ordered=False)
        )


def test_unordered_random_vs_model(ray_session, tmp_path):
    import random

    import ray.data

    rng = random.Random(7)
    vocab = ["ua", "ub", "uc", "ud"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 12)))
        for _ in range(30)
    ]
    out = str(tmp_path / "uidx")
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
    an = make_analyzer("en_nostem_simple")
    for trial in range(10):
        k = rng.choice([2, 3])
        terms = tuple(rng.sample(vocab, k))
        mg = rng.choice([None, 0, 1, 3])
        docs_u, freqs = interval_freqs(
            reader, IntervalQuery(terms, max_gaps=mg, ordered=False)
        )
        got = dict(zip(docs_u.tolist(), freqs.tolist()))
        want = _model_unordered_freqs(an, texts, list(terms), mg, None)
        assert got == pytest.approx(want), (terms, mg)


def test_interval_containing(pos_index):
    """Intervals.containing / not_containing: big unordered intervals
    filtered by small-term containment, vs a brute per-doc evaluation."""
    import re as _re

    from lucene_ray.functions.intervals import (
        IntervalContaining,
        interval_containing_freqs,
        minimal_intervals,
    )
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(pos_index)
    big = IntervalQuery(("alpha", "beta"), ordered=False)
    TOK = _re.compile(r"[a-z0-9]+")

    def brute(small, negate):
        # recompute big minimal unordered intervals per doc, then filter
        out = {}
        for d, t in enumerate(TEXTS):
            raw = TOK.findall(t.lower())
            pos = {w: [i for i, x in enumerate(raw) if x == w]
                   for w in ("alpha", "beta", small)}
            if not pos["alpha"] or not pos["beta"]:
                continue
            # minimal unordered: per end e (any term), tightest window
            cands = []
            for e in sorted(set(pos["alpha"]) | set(pos["beta"])):
                prevs = []
                ok = True
                for w in ("alpha", "beta"):
                    p = [x for x in pos[w] if x <= e]
                    if not p:
                        ok = False
                        break
                    prevs.append(max(p))
                if ok:
                    cands.append((min(prevs), e))
            mins = {}
            for s, e in cands:
                mins[s] = min(mins.get(s, e), e)
            freq = 0.0
            for s, e in mins.items():
                has = any(s <= q <= e for q in pos.get(small, ()))
                if has != negate:
                    freq += 1.0 / max(e - s + 1 - 2 + 1, 1)
            if freq:
                out[d] = freq
        return out

    for small, negate in [("filler", False), ("filler", True),
                          ("zzz", True), ("gamma", False)]:
        q = IntervalContaining(big=big, small=small, negate=negate)
        docs, freqs = interval_containing_freqs(reader, q)
        got = dict(zip(docs.tolist(), freqs.tolist()))
        want = brute(small, negate)
        assert got == pytest.approx(want), (small, negate)
    # containing + not_containing partition the big interval weights
    s_all, e_all = minimal_intervals(reader, big)
    docs_c, f_c = interval_containing_freqs(
        reader, IntervalContaining(big=big, small="filler", negate=False)
    )
    docs_n, f_n = interval_containing_freqs(
        reader, IntervalContaining(big=big, small="filler", negate=True)
    )
    total = {}
    for d, f in list(zip(docs_c.tolist(), f_c.tolist())) + list(
        zip(docs_n.tolist(), f_n.tolist())
    ):
        total[d] = total.get(d, 0.0) + f
    from lucene_ray.functions.intervals import interval_freqs

    docs_b, f_b = interval_freqs(reader, big)
    assert total == pytest.approx(dict(zip(docs_b.tolist(), f_b.tolist())))


def test_interval_overlapping_and_contained_by(pos_index):
    """Intervals.overlapping / non_overlapping and contained_by /
    not_contained_by vs brute per-doc evaluation over the known TEXTS."""
    import re as _re

    from lucene_ray.functions.intervals import (
        IntervalContainedBy,
        IntervalOverlapping,
        interval_contained_by_freqs,
        interval_overlapping_freqs,
    )
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(pos_index)
    TOK = _re.compile(r"[a-z0-9]+")

    def doc_minimal(d, terms):
        raw = TOK.findall(TEXTS[d].lower())
        lists = [[i for i, x in enumerate(raw) if x == w] for w in terms]
        if any(not l for l in lists):
            return []
        return _model_minimal_unordered(lists)

    big = IntervalQuery(("alpha", "beta"), ordered=False)
    other = IntervalQuery(("filler", "gamma"), ordered=False)

    # overlapping
    for negate in (False, True):
        q = IntervalOverlapping(big=big, other=other, negate=negate)
        got_d, got_f = interval_overlapping_freqs(reader, q)
        got = dict(zip(got_d.tolist(), got_f.tolist()))
        want = {}
        for d in range(len(TEXTS)):
            bigs = doc_minimal(d, ("alpha", "beta"))
            others = doc_minimal(d, ("filler", "gamma"))
            f = 0.0
            for s, e in bigs:
                has = any(s2 <= e and e2 >= s for s2, e2 in others)
                if has != negate:
                    f += 1.0 / max(e - s + 1 - 2 + 1, 1)
            if f:
                want[d] = f
        assert set(got) == set(want), negate
        for d in want:
            assert abs(got[d] - want[d]) < 1e-12, (negate, d)

    # contained_by
    for small, negate in [("filler", False), ("filler", True),
                          ("gamma", False), ("zzz", True)]:
        q = IntervalContainedBy(small=small, big=big, negate=negate)
        got_d, got_f = interval_contained_by_freqs(reader, q)
        got = dict(zip(got_d.tolist(), got_f.tolist()))
        want = {}
        for d in range(len(TEXTS)):
            raw = TOK.findall(TEXTS[d].lower())
            pos = [i for i, x in enumerate(raw) if x == small]
            if not pos:
                continue
            bigs = doc_minimal(d, ("alpha", "beta"))
            f = sum(
                1.0 for qp in pos
                if any(s <= qp <= e for s, e in bigs) != negate
            )
            if f:
                want[d] = f
        assert set(got) == set(want), (small, negate)
        for d in want:
            assert got[d] == want[d], (small, negate, d)


def test_interval_before_after(pos_index):
    """Intervals.before / after vs brute: big minimal intervals with some
    other interval entirely after (before mode) or entirely before
    (after mode) in the same doc."""
    import re as _re

    from lucene_ray.functions.intervals import (
        IntervalBeforeAfter,
        interval_before_after_freqs,
    )
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(pos_index)
    TOK = _re.compile(r"[a-z0-9]+")

    def doc_minimal(d, terms):
        raw = TOK.findall(TEXTS[d].lower())
        lists = [[i for i, x in enumerate(raw) if x == w] for w in terms]
        if any(not l for l in lists):
            return []
        return _model_minimal_unordered(lists)

    big = IntervalQuery(("alpha", "beta"), ordered=False)
    other = IntervalQuery(("gamma", "filler"), ordered=False)
    for mode in ("before", "after"):
        q = IntervalBeforeAfter(big=big, other=other, mode=mode)
        got_d, got_f = interval_before_after_freqs(reader, q)
        got = dict(zip(got_d.tolist(), got_f.tolist()))
        want = {}
        for d in range(len(TEXTS)):
            bigs = doc_minimal(d, ("alpha", "beta"))
            others = doc_minimal(d, ("gamma", "filler"))
            f = 0.0
            for s, e in bigs:
                if mode == "before":
                    hit = any(s2 > e for s2, _e2 in others)
                else:
                    hit = any(e2 < s for _s2, e2 in others)
                if hit:
                    f += 1.0 / max(e - s + 1 - 2 + 1, 1)
            if f:
                want[d] = f
        assert set(got) == set(want), mode
        for d in want:
            assert abs(got[d] - want[d]) < 1e-12, (mode, d)
    import pytest as _pt

    with _pt.raises(ValueError):
        interval_before_after_freqs(
            reader, IntervalBeforeAfter(big=big, other=other, mode="x")
        )
