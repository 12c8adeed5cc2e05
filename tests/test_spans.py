"""Span queries vs brute-force python models.

The unordered model simulates the actual two-pointer merge loop
(NearSpansUnordered), independently of the engine's closed-form
(jlo, jhi) range derivation — a real cross-check.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

K1, B = 1.2, 0.75

TEXTS = [
    "data stream data stream",        # adjacent pairs both ways
    "data the batch stream",          # stopword gap: data@0 stream@3
    "stream batch data",              # reversed order
    "data batch batch stream data",   # wide + trailing
    "batch small scan",               # 3-term chain
    "batch small small scan",         # repeated middle
    "stream stream",                  # only one of the pair
    "scan batch small",               # wrapped order
]


@pytest.fixture(scope="module")
def span_index(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index

    out = str(tmp_path_factory.mktemp("spanidx") / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    from lucene_ray.pipelines.search import get_reader

    return get_reader(out)


STOPS = {"the", "a"}


def _positions(doc: int, term: str):
    toks = TEXTS[doc].split()
    return [i for i, t in enumerate(toks) if t == term and t not in STOPS]


def _model_ordered(doc, terms, slop):
    plists = [_positions(doc, t) for t in terms]
    if any(not p for p in plists):
        return 0.0
    f = 0.0
    for a in plists[0]:
        prev = a
        ok = True
        for nxt in plists[1:]:
            cand = [p for p in nxt if p > prev]
            if not cand:
                ok = False
                break
            prev = min(cand)
        if ok:
            gap = prev - a - (len(terms) - 1)
            if gap <= slop:
                f += 1.0 / (1.0 + gap)
    return f


def _model_unordered(doc, terms, slop):
    """Literal two-pointer merge: yield (a_i, b_j), advance the smaller."""
    A, Bp = _positions(doc, terms[0]), _positions(doc, terms[1])
    if not A or not Bp:
        return 0.0
    i = j = 0
    f = 0.0
    while True:
        gap = abs(A[i] - Bp[j]) - 1
        if gap <= slop:
            f += 1.0 / (1.0 + gap)
        if A[i] < Bp[j]:
            if i + 1 == len(A):
                break
            i += 1
        else:
            if j + 1 == len(Bp):
                break
            j += 1
    return f


def _model_scores(freqs_by_doc, terms):
    toks = [[t for t in x.split() if t not in STOPS] for x in TEXTS]
    n = len(TEXTS)
    dls = [len(tk) for tk in toks]
    avgdl = sum(dls) / n
    idf = 0.0
    for t in terms:
        df = sum(1 for tk in toks if t in tk)
        idf += math.log(1 + (n - df + 0.5) / (df + 0.5))
    return {
        d: idf * (f / (f + K1 * ((1 - B) + B * dls[d] / avgdl)))
        for d, f in freqs_by_doc.items()
        if f > 0
    }


SPAN_CASES = [
    (("data", "stream"), 0, True),
    (("data", "stream"), 2, True),
    (("stream", "data"), 1, True),
    (("data", "stream"), 1, False),
    (("stream", "data"), 3, False),
    (("batch", "small", "scan"), 0, True),
    (("batch", "small", "scan"), 2, True),
    (("batch", "zzz"), 5, True),
]


def test_span_near_vs_model(span_index):
    from lucene_ray.functions.spans import SpanNearQuery, score_span

    for terms, slop, in_order in SPAN_CASES:
        q = SpanNearQuery(terms=terms, slop=slop, in_order=in_order)
        docs, scores = score_span(span_index, q, k=10)
        model = {
            d: (
                _model_ordered(d, terms, slop)
                if in_order
                else _model_unordered(d, terms, slop)
            )
            for d in range(len(TEXTS))
        }
        exp = _model_scores(model, terms)
        ranked = sorted(exp, key=lambda d: (-exp[d], d))[:10]
        assert list(docs) == ranked, (terms, slop, in_order)
        np.testing.assert_allclose(
            scores, [exp[d] for d in ranked], rtol=1e-12
        )


def test_span_first(span_index):
    from lucene_ray.functions.spans import SpanFirstQuery, score_span

    # 'data' within the first 1 position: only docs with data@0
    docs, _ = score_span(span_index, SpanFirstQuery("data", 1), k=10)
    assert set(docs) == {0, 1, 3}
    # within the first 3 positions: adds doc 2 (data@2)
    docs3, _ = score_span(span_index, SpanFirstQuery("data", 3), k=10)
    assert set(docs3) == {0, 1, 2, 3}
    model = {d: float(len([p for p in _positions(d, "data") if p < 3]))
             for d in range(len(TEXTS))}
    exp = _model_scores(model, ("data",))
    ranked = sorted(exp, key=lambda d: (-exp[d], d))
    assert list(docs3) == ranked


def test_unordered_requires_two(span_index):
    from lucene_ray.functions.spans import SpanNearQuery, span_scored

    with pytest.raises(ValueError):
        span_scored(
            span_index,
            SpanNearQuery(("a", "b", "c"), slop=1, in_order=False),
        )


def test_span_not(span_index):
    """SpanNotQuery vs brute: include positions with no exclude position
    in [p-pre, p+post], include-only idf."""
    from lucene_ray.functions.spans import SpanNotQuery, span_scored
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(span_index) if isinstance(span_index, str) else span_index
    # brute over the known TEXTS
    import re as _re

    TOK = _re.compile(r"[a-z0-9]+")

    def brute(inc, exc, pre, post):
        out = {}
        for d, t in enumerate(TEXTS):
            toks = [w for w in TOK.findall(t.lower()) if w not in STOPS]
            # positions must match the analyzer's increments (stopword
            # gaps), so recompute with raw indices like the engine
            raw = TOK.findall(t.lower())
            inc_pos = [i for i, w in enumerate(raw) if w == inc and w not in STOPS]
            exc_pos = {i for i, w in enumerate(raw) if w == exc and w not in STOPS}
            pf = sum(
                1 for p in inc_pos
                if not any(q in exc_pos for q in range(p - pre, p + post + 1))
            )
            if pf:
                out[d] = pf
        return out

    for inc, exc, pre, post in [
        ("data", "stream", 0, 1), ("data", "stream", 1, 0),
        ("data", "zzz", 1, 1), ("data", "data", 0, 0),
    ]:
        got = span_scored(
            reader, SpanNotQuery(include=inc, exclude=exc, pre=pre, post=post)
        )
        want = brute(inc, exc, pre, post)
        assert set(got[0].tolist()) == set(want), (inc, exc, pre, post)


# --- round-4 span family completion ---------------------------------------


def _model_chains(doc, terms):
    """Greedy ordered chains (anchor, end, gap) — the NearSpansOrdered
    model _model_ordered uses, with endpoints exposed."""
    plists = [_positions(doc, t) for t in terms]
    if any(not p for p in plists):
        return []
    out = []
    for a in plists[0]:
        prev = a
        ok = True
        for nxt in plists[1:]:
            cand = [p for p in nxt if p > prev]
            if not cand:
                ok = False
                break
            prev = min(cand)
        if ok:
            out.append((a, prev, prev - a - (len(terms) - 1)))
    return out


def test_span_or_vs_model(span_index):
    from lucene_ray.functions.spans import SpanOrQuery, score_span

    for terms in [("data", "stream"), ("batch", "scan", "small"),
                  ("data", "zzzmissing"), ("zzzmissing", "alsogone")]:
        present = [t for t in terms
                   if any(_positions(d, t) for d in range(len(TEXTS)))]
        docs, scores = score_span(span_index, SpanOrQuery(terms=terms), k=10)
        if not present:
            assert len(docs) == 0
            continue
        model = {
            d: float(sum(len(_positions(d, t)) for t in present))
            for d in range(len(TEXTS))
        }
        exp = _model_scores(model, tuple(present))
        ranked = sorted(exp, key=lambda d: (-exp[d], d))[:10]
        assert list(docs) == ranked, terms
        np.testing.assert_allclose(
            scores, [exp[d] for d in ranked], rtol=1e-12
        )


def test_span_position_range_vs_model(span_index):
    from lucene_ray.functions.spans import (
        SpanFirstQuery,
        SpanPositionRangeQuery,
        score_span,
    )

    for term, start, end in [("data", 0, 1), ("data", 1, 4),
                             ("batch", 1, 3), ("stream", 2, 99)]:
        docs, scores = score_span(
            span_index, SpanPositionRangeQuery(term, start, end), k=10
        )
        model = {
            d: float(len([p for p in _positions(d, term)
                          if start <= p and p + 1 <= end]))
            for d in range(len(TEXTS))
        }
        exp = _model_scores(model, (term,))
        ranked = sorted(exp, key=lambda d: (-exp[d], d))[:10]
        assert list(docs) == ranked, (term, start, end)
        np.testing.assert_allclose(
            scores, [exp[d] for d in ranked], rtol=1e-12
        )
    # SpanFirstQuery == SpanPositionRangeQuery(start=0) exactly
    for term, end in [("data", 1), ("data", 3), ("scan", 2)]:
        a = score_span(span_index, SpanFirstQuery(term, end), k=10)
        b = score_span(
            span_index, SpanPositionRangeQuery(term, 0, end), k=10
        )
        assert list(a[0]) == list(b[0])
        np.testing.assert_array_equal(a[1], b[1])


def test_span_containing_and_within_vs_model(span_index):
    from lucene_ray.functions.spans import (
        SpanContainingQuery,
        SpanNearQuery,
        SpanWithinQuery,
        score_span,
    )

    cases = [
        (("data", "stream"), 3, "batch"),   # batch inside data..stream?
        (("data", "stream"), 0, "data"),    # little == big start term
        (("batch", "scan"), 2, "small"),
        (("data", "data"), 9, "batch"),
    ]
    for big_terms, slop, little in cases:
        big = SpanNearQuery(terms=big_terms, slop=slop, in_order=True)
        stats_terms = tuple(big_terms) + (little,)
        chains = {d: [(a, e, g) for a, e, g in _model_chains(d, big_terms)
                      if g <= slop]
                  for d in range(len(TEXTS))}
        lit = {d: _positions(d, little) for d in range(len(TEXTS))}

        # containing: big chains holding some little position
        model_c = {
            d: float(sum(1.0 / (1.0 + g) for a, e, g in chains[d]
                         if any(a <= q <= e for q in lit[d])))
            for d in range(len(TEXTS))
        }
        exp = _model_scores(model_c, stats_terms)
        ranked = sorted(exp, key=lambda d: (-exp[d], d))[:10]
        d1, s1 = score_span(
            span_index, SpanContainingQuery(big=big, little=little), k=10
        )
        assert list(d1) == ranked, (big_terms, slop, little)
        np.testing.assert_allclose(s1, [exp[d] for d in ranked], rtol=1e-12)

        # within: little positions inside some chain, weight 1 each
        model_w = {
            d: float(sum(1 for q in lit[d]
                         if any(a <= q <= e for a, e, g in chains[d])))
            for d in range(len(TEXTS))
        }
        exp_w = _model_scores(model_w, stats_terms)
        ranked_w = sorted(exp_w, key=lambda d: (-exp_w[d], d))[:10]
        d2, s2 = score_span(
            span_index, SpanWithinQuery(big=big, little=little), k=10
        )
        assert list(d2) == ranked_w, (big_terms, slop, little)
        np.testing.assert_allclose(
            s2, [exp_w[d] for d in ranked_w], rtol=1e-12
        )


def test_masked_span_near_vs_model(ray_session, tmp_path):
    """FieldMaskingSpanQuery composition: ordered span-near across
    title/body parallel fields vs a brute model (masked-field collection
    stats + norms, per-clause real-field term stats)."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.spans import (
        MaskedSpanNearQuery,
        score_span_masked,
    )
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.multifield import (
        MultiFieldReader,
        build_multifield_index,
    )

    texts = TEXTS
    titles = [" ".join(t.split()[:2]) for t in texts]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "body": pa.array(texts, pa.string()),
            "title": pa.array(titles, pa.string()),
        }
    )
    root = str(tmp_path / "mf")
    build_multifield_index(
        ray.data.from_arrow(tbl), root,
        {"title": "title", "body": "body"},
        IndexConfig(analyzer="en_nostem_simple", norm_kind="exact",
                    num_partitions=2, positions=True),
        doc_count=len(texts), default_fields=["title", "body"],
    )
    mf = MultiFieldReader(root)

    def fpos(d, field, term):
        src = titles[d] if field == "title" else texts[d]
        raw = [w for w in src.split()]
        return [i for i, w in enumerate(raw) if w == term and w not in STOPS]

    def fdl(d, field):
        src = titles[d] if field == "title" else texts[d]
        return len([w for w in src.split() if w not in STOPS])

    def fdf(field, term):
        return sum(1 for d in range(len(texts)) if fpos(d, field, term))

    n = len(texts)
    for clauses, slop in [
        ((("title", "data"), ("body", "stream")), 3),
        ((("title", "batch"), ("body", "scan")), 4),
        ((("title", "data"), ("body", "data")), 5),
    ]:
        q = MaskedSpanNearQuery(clauses=clauses, slop=slop)
        got_d, got_s = score_span_masked(mf, q, k=10)
        # brute: ordered chain title pos -> min body pos > it
        idf = sum(
            math.log(1 + (n - fdf(f, t) + 0.5) / (fdf(f, t) + 0.5))
            for f, t in clauses
        )
        dls = [fdl(d, "title") for d in range(n)]
        tot = sum(dls)
        avgdl = tot / n
        exp = {}
        for d in range(n):
            f = 0.0
            for a in fpos(d, clauses[0][0], clauses[0][1]):
                cand = [p for p in fpos(d, clauses[1][0], clauses[1][1])
                        if p > a]
                if cand:
                    gap = min(cand) - a - 1
                    if gap <= slop:
                        f += 1.0 / (1.0 + gap)
            if f > 0:
                exp[d] = idf * (
                    f / (f + K1 * ((1 - B) + B * dls[d] / avgdl))
                )
        ranked = sorted(exp, key=lambda d: (-exp[d], d))[:10]
        assert list(got_d) == ranked, (clauses, slop)
        np.testing.assert_allclose(
            got_s, [exp[d] for d in ranked], rtol=1e-12
        )


def test_parse_surround():
    """Surround distance operators: <d>W ordered / <d>N unordered,
    slop = distance - 1 (DistanceQuery.java:96), bare op = distance 1,
    analyzer-normalized operands, malformed inputs raise."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.spans import SpanNearQuery, parse_surround

    an = make_analyzer("en_nostem_simple")
    q = parse_surround("3W(data, stream)", an)
    assert q == SpanNearQuery(terms=("data", "stream"), slop=2,
                              in_order=True)
    q = parse_surround("N(key, value)", an)
    assert (q.terms, q.slop, q.in_order) == (("key", "value"), 0, False)
    q = parse_surround("W(a1, b2, c3)", an)
    assert q.slop == 0 and q.in_order and len(q.terms) == 3
    # operands run through the analyzer (case folding)
    assert parse_surround("2N(Hash, JOIN)", an).terms == ("hash", "join")
    for bad in ("W(a)", "3W()", "near(a, b)", "0W(a, b)",
                "3W(ab cd, c)", "plain text"):
        with pytest.raises(ValueError):
            parse_surround(bad, an)
    # stopword operands vanish through the analyzer like any chain:
    # "a b" analyzes to just "b"
    assert parse_surround("3W(a b, c)", an).terms == ("b", "c")


def test_span_multiterm_near(ray_session, tmp_path):
    """SpanMultiTermQueryWrapper under SpanNear: singleton slots equal
    plain SpanNearQuery bit-for-bit... except idf when expansions add
    terms; union slots match any member; empty expansion empties."""
    import numpy as np

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.spans import (
        SpanMultiTermNearQuery,
        SpanNearQuery,
        score_span,
        span_multiterm_near,
    )
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.search import get_reader

    from test_engine_oracle import build_from_lists

    texts = [
        "hash join wins today",
        "hatch x join later",
        "hash merge join",
        "data stream flows",
        "nothing here",
        "hash y y join",
    ]
    out = tmp_path / "smt"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, list(range(len(texts))), texts, cfg)
    reader = get_reader(str(out))

    # singleton slots == plain SpanNearQuery exactly
    q1 = SpanMultiTermNearQuery(
        clause_sets=(("hash",), ("join",)), slop=2, in_order=True
    )
    q2 = SpanNearQuery(terms=("hash", "join"), slop=2, in_order=True)
    d1, s1 = score_span(reader, q1, 10)
    d2, s2 = score_span(reader, q2, 10)
    assert np.array_equal(d1, d2)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))

    # union slot (ha* -> hash|hatch): doc 1 (hatch..join, gap 1) joins in
    q3 = span_multiterm_near(
        [("prefix", "ha"), ("term", "join")], reader.expand_multi,
        slop=2, in_order=True,
    )
    assert q3.clause_sets[0] == ("hash", "hatch")
    d3, _ = score_span(reader, q3, 10)
    assert set(d3.tolist()) == {0, 1, 2, 6 - 1}  # 0,1,2 and doc 5 (gap 2)
    # unordered two-slot union
    q4 = span_multiterm_near(
        [("term", "join"), ("prefix", "ha")], reader.expand_multi,
        slop=2, in_order=False,
    )
    d4, _ = score_span(reader, q4, 10)
    assert set(d4.tolist()) >= set(d3.tolist())
    # empty expansion -> None from the builder; absent slot -> no rows
    assert span_multiterm_near(
        [("prefix", "zzz"), ("term", "join")], reader.expand_multi
    ) is None
    dq, _ = score_span(
        reader,
        SpanMultiTermNearQuery(clause_sets=(("zzz",), ("join",)), slop=1),
        10,
    )
    assert len(dq) == 0
    with pytest.raises(ValueError):
        score_span(
            reader,
            SpanMultiTermNearQuery(clause_sets=(("hash",),), slop=1),
            10,
        )
