"""Positions index + exact PhraseQuery (reference: search/PhraseQuery.java,
ExactPhraseMatcher.java; positions stream analogue of
codecs/lucene104/Lucene104PostingsWriter.java:237-298).

Brute-force checked: phrase frequency and matching docs recomputed in
python over the analyzed token stream with StopFilter increments.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "data stream over the data stream",   # pf("data stream") = 2
    "stream data",                        # reversed only
    "data the stream",                    # stopword gap (increment 2)
    "plain data row",
    "stream of data stream extra words here",
    "the data stream",                    # leading stopword
]


def _brute_phrase(analyzer, texts, phrase_terms, offsets):
    out = {}
    for d, text in enumerate(texts):
        terms, pos = analyzer.analyze_positions(text)
        index = {}
        for t, p in zip(terms, pos):
            index.setdefault(t, set()).add(p)
        pf = 0
        for p0 in sorted(index.get(phrase_terms[0], ())):
            if all(
                (p0 + off) in index.get(t, ())
                for t, off in zip(phrase_terms[1:], offsets[1:])
            ):
                pf += 1
        if pf:
            out[d] = pf
    return out


@pytest.fixture(params=["exact", "byte4"])
def pos_index(ray_session, tmp_path, request):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index

    analyzer = "en_nostem_simple" if request.param == "exact" else "standard_en"
    out = str(tmp_path / f"pidx-{request.param}")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer=analyzer, norm_kind=request.param, num_partitions=4,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    return out, analyzer


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def test_phrase_matching_docs_and_freqs(pos_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        count_matches,
        parse_query,
        score_blockmax,
        score_exhaustive,
    )

    index_dir, analyzer = pos_index
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    for qs in ('"data stream"', '"stream data"', '"data the stream"',
               '"the data stream"'):
        q = parse_query(qs, an)
        ref = _brute_phrase(an, TEXTS, q.terms, q.offsets)
        docs, scores = score_exhaustive(r, q, 10)
        assert sorted(docs.tolist()) == sorted(ref)
        assert count_matches(r, q) == len(ref)
        bd, bs = score_blockmax(r, q, 10)
        assert bd.tolist() == docs.tolist()
        assert bs.tolist() == scores.tolist()


def test_phrase_freq_drives_score(pos_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    index_dir, analyzer = pos_index
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    q = parse_query('"data stream"', an)
    docs, scores = score_exhaustive(r, q, 10)
    by_doc = dict(zip(docs.tolist(), scores.tolist()))
    # doc 0 has pf=2 and similar length to doc 5 (pf=1): higher score
    assert 0 in by_doc and by_doc[0] == max(by_doc.values())


def test_phrase_empty_and_oov(pos_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    index_dir, analyzer = pos_index
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    d, _ = score_exhaustive(r, parse_query('"zzz missing"', an), 10)
    assert d.tolist() == []
    d2, _ = score_exhaustive(r, parse_query('"the of"', an), 10)
    assert d2.tolist() == []  # all-stopword phrase analyzes to nothing


def test_phrase_respects_deletes(pos_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.state.deletes import delete_docs

    index_dir, analyzer = pos_index
    delete_docs(index_dir, [0])
    an = make_analyzer(analyzer)
    docs, _ = score_exhaustive(
        _reader(index_dir), parse_query('"data stream"', an), 10
    )
    assert 0 not in docs.tolist()


def test_sloppy_phrase_classic_behavior(pos_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_exhaustive,
    )

    index_dir, analyzer = pos_index
    an = make_analyzer(analyzer)
    r = _reader(index_dir)

    q0 = parse_query('"data stream"~0', an)
    assert q0.slop == 0
    exact = matching_docs(r, parse_query('"data stream"', an)).tolist()
    assert matching_docs(r, q0).tolist() == exact

    # slop 1 admits one extra (non-stopword) word between the terms — but
    # TEXTS has the stopword-gap case at distance 2 with increments, which
    # slop>=1 also admits (doc 2: data@0 stream@2 -> L=1)
    s1 = matching_docs(r, parse_query('"data stream"~1', an)).tolist()
    assert set(exact) <= set(s1) and 2 in s1

    # reversed order needs slop 2 (the classic Lucene behavior)
    rev0 = matching_docs(r, parse_query('"stream data"', an)).tolist()
    assert rev0 == [1]  # only the literally reversed doc
    rev2 = set(matching_docs(r, parse_query('"stream data"~2', an)).tolist())
    assert {0, 1, 4}.issubset(rev2)

    # closer matches score higher at equal frequency: sloppyWeight 1/(1+L)
    docs, scores = score_exhaustive(r, parse_query('"data stream"~3', an), 10)
    by_doc = dict(zip(docs.tolist(), scores.tolist()))
    assert by_doc[5] > by_doc[2]  # adjacent (L=0) beats stopword gap (L=1)


def test_sloppy_repeated_term_needs_distinct_positions(pos_index):
    """'"data data"~N' must not match a doc with a single 'data' occurrence
    by claiming the same token position twice (SloppyPhraseMatcher repeats
    handling)."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query

    index_dir, analyzer = pos_index
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    got = matching_docs(r, parse_query('"data data"~4', an)).tolist()
    # only docs with >= 2 'data' tokens can match
    multi_data = [
        d for d, t in enumerate(TEXTS)
        if sum(1 for w in t.split() if w == "data") >= 2
    ]
    assert set(got) <= set(multi_data)
    assert 0 in got  # doc 0 has two 'data' tokens within slop


def test_phrase_requires_positions(ray_session, tmp_path):
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.pipelines.build import IndexConfig, build_index

    out = str(tmp_path / "nopos")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    an = make_analyzer("en_nostem_simple")
    with pytest.raises(ValueError, match="positions"):
        score_exhaustive(_reader(out), parse_query('"data stream"', an), 10)

def _brute_sloppy(analyzer, texts, phrase_terms, offsets, slop):
    """Model: per anchor of the first term, minimal window over the full
    cross-product of the other terms' positions (distinct raw positions
    for repeated terms); freq = sum of 1/(1+L) over anchors with L<=slop."""
    import itertools as it

    out = {}
    for d, text in enumerate(texts):
        terms, pos = analyzer.analyze_positions(text)
        index = {}
        for t, p in zip(terms, pos):
            index.setdefault(t, []).append(p)
        lists = [sorted(index.get(t, [])) for t in phrase_terms]
        if any(not lst for lst in lists):
            continue
        f = 0.0
        for p0raw in lists[0]:
            p0 = p0raw - offsets[0]
            best = None
            for combo in it.product(*lists[1:]):
                raws = [p0raw] + [
                    c for c in combo
                ]
                # distinct raw positions per identical term
                ok = True
                seen = {}
                for t, rw in zip(phrase_terms, raws):
                    s = seen.setdefault(t, set())
                    if rw in s:
                        ok = False
                        break
                    s.add(rw)
                if not ok:
                    continue
                disp = [p0] + [
                    c - off for c, off in zip(combo, offsets[1:])
                ]
                L = max(disp) - min(disp)
                if best is None or L < best:
                    best = L
            if best is not None and best <= slop:
                f += 1.0 / (1.0 + best)
        if f > 0:
            out[d] = f
    return out


TEXTS3 = [
    "alpha beta gamma",                       # L=0
    "alpha xx beta yy gamma",                 # L=2 spread
    "gamma beta alpha",                       # reversed
    "alpha beta beta gamma alpha",            # repeats around
    "beta alpha gamma beta zz alpha",         # scrambled
    "alpha gamma",                            # missing beta
    "alpha alpha beta gamma gamma beta",      # heavy repeats
    "xx alpha yy beta zz gamma alpha beta",   # two anchor options
]


@pytest.mark.parametrize("qs", [
    '"alpha beta gamma"~2',
    '"alpha beta gamma"~5',
    '"gamma beta alpha"~4',
    '"alpha beta alpha"~6',   # repeated anchor term
    '"beta beta gamma"~3',    # repeated non-anchor term
])
def test_sloppy_three_term_exact_vs_bruteforce(ray_session, tmp_path, qs):
    """>2-term sloppy phrases are exact minimal-window per anchor (no
    greedy nearest-pick deviation) — checked against full cross-product
    enumeration with the distinct-positions repeats constraint."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.pipelines.build import IndexConfig, build_index

    out = str(tmp_path / "pidx3")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS3)), pa.int64()),
            "text": pa.array(TEXTS3, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=3,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS3))
    an = make_analyzer("en_nostem_simple")
    q = parse_query(qs, an)
    ref = _brute_sloppy(an, TEXTS3, q.terms, q.offsets, q.slop)
    from lucene_ray.functions.query import _sloppy_freqs
    from lucene_ray.pipelines.search import get_reader

    r = get_reader(out)
    pos_cache = {t: r.term_positions(t) for t in q.terms}
    docs_u, pf = _sloppy_freqs(pos_cache, q)
    got = dict(zip(docs_u.tolist(), pf.tolist()))
    assert got == pytest.approx(ref)
    d, _ = score_exhaustive(r, q, 20)
    assert sorted(d.tolist()) == sorted(ref)


def test_sloppy_random_texts_exact_vs_bruteforce(ray_session, tmp_path):
    """Randomized 3/4-term sloppy phrases vs the cross-product model."""
    import random

    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import PhraseQuery, _sloppy_freqs
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader

    rng = random.Random(42)
    vocab = ["ra", "rb", "rc", "rd"]
    texts = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 14)))
        for _ in range(40)
    ]
    out = str(tmp_path / "pidxr")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(texts))
    an = make_analyzer("en_nostem_simple")
    r = get_reader(out)
    for trial in range(12):
        k = rng.choice([3, 4])
        terms = tuple(rng.choice(vocab) for _ in range(k))
        offsets = tuple(range(k))
        slop = rng.randint(0, 6)
        if slop == 0:
            continue
        q = PhraseQuery(terms=terms, offsets=offsets, slop=slop)
        ref = _brute_sloppy(an, texts, terms, offsets, slop)
        pos_cache = {t: r.term_positions(t) for t in q.terms}
        docs_u, pf = _sloppy_freqs(pos_cache, q)
        got = dict(zip(docs_u.tolist(), pf.tolist()))
        assert got == pytest.approx(ref), (terms, slop)


def _term_score(corpus, d, t, k1=1.2, b=0.75):
    import math

    toks = corpus[d]
    tf = toks.count(t)
    df = sum(1 for v in corpus.values() if t in v)
    if tf == 0 or df == 0:
        return 0.0
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * (tf / (tf + k1 * ((1 - b) + b * len(toks) / avgdl)))


def _phrase_score(an, texts, corpus, d, terms, offsets, k1=1.2, b=0.75):
    import math

    pf = _brute_phrase(an, texts, terms, offsets).get(d, 0)
    if pf == 0:
        return 0.0
    n = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n
    idf = 0.0
    for t in terms:
        df = sum(1 for v in corpus.values() if t in v)
        idf += math.log(1 + (n - df + 0.5) / (df + 0.5))
    dl = len(corpus[d])
    return idf * (pf / (pf + k1 * ((1 - b) + b * dl / avgdl)))


def test_mixed_phrase_boolean_queries(ray_session, tmp_path):
    """Phrase clauses mixed with term clauses: role semantics + exact
    scores vs a first-principles model (MixedQuery executor)."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MixedQuery,
        parse_query,
        score_blockmax,
        score_exhaustive,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader

    texts = [
        "data stream key",
        "key only here",
        "data stream other words",
        "stream data key",
        "data key stream plus key",
        "other words entirely",
    ]
    out = str(tmp_path / "mixidx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact",
            num_partitions=2, positions=True,
        ),
        doc_count=len(texts),
    )
    r = get_reader(out)
    an = make_analyzer("en_nostem_simple")
    corpus = {d: an.analyze(t) for d, t in enumerate(texts)}
    P = ("data", "stream")
    phrase_docs = set(_brute_phrase(an, texts, list(P), [0, 1]))
    key_docs = {d for d, v in corpus.items() if "key" in v}

    def scores_for(docs_set, parts):
        return {
            d: sum(parts(d)) for d in docs_set
        }

    cases = {
        '+"data stream" key': (
            phrase_docs,
            lambda d: (
                _phrase_score(an, texts, corpus, d, P, (0, 1)),
                _term_score(corpus, d, "key"),
            ),
        ),
        '"data stream" key': (
            phrase_docs | key_docs,
            lambda d: (
                _phrase_score(an, texts, corpus, d, P, (0, 1)),
                _term_score(corpus, d, "key"),
            ),
        ),
        '-"data stream" +key': (
            key_docs - phrase_docs,
            lambda d: (_term_score(corpus, d, "key"),),
        ),
        '+"data stream" +key': (
            phrase_docs & key_docs,
            lambda d: (
                _phrase_score(an, texts, corpus, d, P, (0, 1)),
                _term_score(corpus, d, "key"),
            ),
        ),
    }
    for qs, (want_docs, parts) in cases.items():
        q = parse_query(qs, an)
        assert isinstance(q, MixedQuery), qs
        d_got, s_got = score_exhaustive(r, q, 10)
        want = scores_for(want_docs, parts)
        order = sorted(want, key=lambda x: (-want[x], x))
        assert d_got.tolist() == order[: len(d_got)], qs
        got = dict(zip(d_got.tolist(), s_got.tolist()))
        for d in got:
            assert got[d] == pytest.approx(want[d], rel=1e-12), (qs, d)
        bd, bs = score_blockmax(r, q, 10)
        assert bd.tolist() == d_got.tolist()
        assert bs.tolist() == s_got.tolist()

    # whole-query phrase unchanged; msm + phrase rejected
    from lucene_ray.functions.query import PhraseQuery

    assert isinstance(parse_query('"data stream"', an), PhraseQuery)
    with pytest.raises(ValueError, match="minimum_should_match"):
        parse_query('"data stream" key ~1', an)


def test_multi_phrase_matches_brute(pos_index):
    """MultiPhraseQuery: per-slot union matching + declaration-order idf
    sum, vs a from-scratch evaluator over the analyzed corpus."""
    import math

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MultiPhrase,
        PhraseQuery,
        score_exhaustive,
    )

    idx, analyzer_name = pos_index
    reader = _reader(idx)
    an = make_analyzer(analyzer_name)
    cases = [
        ((("data", "plain"), ("stream", "row")), (0, 1)),
        ((("data",), ("zzz", "stream")), (0, 1)),   # absent alternative
        ((("data",), ("stream",)), (0, 2)),          # stopword gap
        ((("stream", "row"), ("extra",), ("word",)), (0, 1, 2)),
    ]
    # brute stats over analyzed corpus
    kept = [an.analyze(t) for t in TEXTS]
    n_docs = len(TEXTS)
    dls = [len(k) for k in kept]
    avgdl = sum(dls) / n_docs
    df = {}
    for k in kept:
        for w in set(k):
            df[w] = df.get(w, 0) + 1
    for arrays, offs in cases:
        q = MultiPhrase(term_arrays=arrays, offsets=offs)
        # brute: anchors where each slot has one of its terms
        want = {}
        idf = 0.0
        for arr in arrays:
            for t in arr:
                if df.get(t, 0):
                    idf += math.log(
                        1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5)
                    )
        for d, text in enumerate(TEXTS):
            terms, pos = an.analyze_positions(text)
            by_pos = dict(zip(pos, terms))
            pf = 0
            for p0, t0 in by_pos.items():
                if t0 not in arrays[0]:
                    continue
                if all(
                    by_pos.get(p0 + off - offs[0]) in arr
                    for arr, off in zip(arrays[1:], offs[1:])
                ):
                    pf += 1
            if pf:
                want[d] = idf * (
                    pf / (pf + 1.2 * ((1 - 0.75) + 0.75 * dls[d] / avgdl))
                )
        d_, s_ = score_exhaustive(reader, q, 10)
        order = sorted(want, key=lambda x: (-want[x], x))
        assert d_.tolist() == order[:10], (arrays, offs)
        if analyzer_name == "en_nostem_simple":
            np.testing.assert_allclose(
                np.asarray(s_, np.float64), [want[x] for x in order[:10]],
                rtol=1e-12,
            )
    # single-alternative MultiPhrase == plain PhraseQuery, bit-identical
    mp = MultiPhrase(term_arrays=(("data",), ("stream",)), offsets=(0, 1))
    ph = PhraseQuery(terms=("data", "stream"), offsets=(0, 1))
    d1, s1 = score_exhaustive(reader, mp, 10)
    d2, s2 = score_exhaustive(reader, ph, 10)
    assert np.array_equal(d1, d2)
    assert np.array_equal(np.asarray(s1), np.asarray(s2))


def test_phrase_inside_group_parses_nested():
    """Round 2 rejected phrases inside groups (silent-misparse guard);
    round 3's recursive grammar parses them as a NestedQuery child."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MixedQuery,
        NestedQuery,
        parse_query,
    )

    an = make_analyzer("en_nostem_simple")
    q = parse_query('+("data stream" key)', an)
    assert isinstance(q, NestedQuery)
    (role, child), = q.children
    assert role == "must" and isinstance(child, MixedQuery)
    assert child.phrases[0][0].terms == ("data", "stream")


def test_mixed_phrase_with_filters(ray_session, tmp_path):
    """Phrase clauses compose with range AND set FILTER clauses — the
    must-phrase candidates intersect the doc-values filters."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MixedQuery,
        matching_docs,
        parse_query,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.docvalues import (
        write_doc_values,
        write_str_doc_values,
    )

    texts = ["data stream key", "key only", "data stream other",
             "stream data", "data stream key two"]
    langs = ["en", "en", "de", "en", "de"]
    tss = [10, 20, 30, 40, 50]
    out = str(tmp_path / "mfidx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(5), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "ts": pa.array(tss, pa.int64()),
        }
    )
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact",
            num_partitions=2, positions=True,
        ),
        doc_count=5,
    )
    write_str_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "lang"])), out, "lang"
    )
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    r = get_reader(out)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+"data stream" lang:(en)', an)
    assert isinstance(q, MixedQuery) and q.base.filters
    assert matching_docs(r, q).tolist() == [0]
    q2 = parse_query('+"data stream" ts:[25 TO 60]', an)
    assert matching_docs(r, q2).tolist() == [2, 4]
