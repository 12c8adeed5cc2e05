"""Payloads: DelimitedPayloadTokenFilter analogue, the .pay sidecar,
PayloadScoreQuery min/max/avg/sum, merge carry-through and CheckIndex
coverage (reference: analysis/common/.../payloads/
DelimitedPayloadTokenFilter.java, queries/.../payloads/
PayloadScoreQuery.java + {Max,Min,Average,Sum}PayloadFunction.java)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.payloads import payload_doc_scores, score_payload
from lucene_ray.pipelines.build import IndexConfig, build_index


def test_delimited_payload_filter_goldens():
    an = make_analyzer("whitespace_payload")
    terms, pos, pays = an.analyze_payloads("Foo|1.5 bar baz|2 QUX|0.25")
    assert terms == ["foo", "bar", "baz", "qux"]
    assert pos == [0, 1, 2, 3]
    assert pays[0] == 1.5 and pays[2] == 2.0 and pays[3] == 0.25
    assert math.isnan(pays[1])  # no delimiter -> no payload (null attr)
    # split at the FIRST delimiter (the reference scans forward): the
    # remainder "1|2" is the payload text, and the float encoder rejects
    # it exactly like FloatEncoder's NumberFormatException
    with pytest.raises(ValueError):
        an.analyze_payloads("a|1|2")


def test_delimited_payload_first_delimiter_and_int_encoder():
    an = make_analyzer("whitespace_payload_int")
    terms, _, pays = an.analyze_payloads("x|7 y|12")
    assert terms == ["x", "y"] and pays == [7.0, 12.0]
    # empty term (all payload) drops like any empty token
    t, p, v = make_analyzer("whitespace_payload").analyze_payloads("|5 ok|1")
    assert t == ["ok"] and v == [1.0]


CORPUS = [
    "apple|3 pear|1 apple|5",          # apple: max 5 sum 8 avg 4 min 3
    "apple|2",                          # apple: 2
    "pear|9 apple plum|4",              # apple: no payload -> docScore 1.0
    "plum|1 plum|2 plum|3",
    "apple|0.5 apple|0.25",
]


@pytest.fixture(scope="module")
def pay_idx(ray_session, tmp_path_factory):
    import ray.data

    out = str(tmp_path_factory.mktemp("pay") / "idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(CORPUS)), pa.int64()),
            "text": pa.array(CORPUS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="whitespace_payload", norm_kind="exact",
        num_partitions=3, positions=True, payloads=True, sample_rate=1.0,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(CORPUS))
    return out


def _reader(idx):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(idx)


def test_payload_functions_golden(pay_idx):
    r = _reader(pay_idx)
    docs, s = payload_doc_scores(r, "apple", "max")
    assert docs.tolist() == [0, 1, 2, 4]
    assert s.tolist() == [5.0, 2.0, 1.0, 0.5]  # doc2: none seen -> 1.0
    _, s = payload_doc_scores(r, "apple", "sum")
    assert s.tolist() == [8.0, 2.0, 1.0, 0.75]
    _, s = payload_doc_scores(r, "apple", "avg")
    assert s.tolist() == [4.0, 2.0, 1.0, 0.375]
    _, s = payload_doc_scores(r, "apple", "min")
    assert s.tolist() == [3.0, 2.0, 1.0, 0.25]
    with pytest.raises(ValueError):
        payload_doc_scores(r, "apple", "median")


def test_score_payload_topk_and_span_score(pay_idx):
    r = _reader(pay_idx)
    d, s = score_payload(r, "apple", k=2, function="max")
    assert d.tolist() == [0, 1] and s.tolist() == [5.0, 2.0]
    # include_span_score multiplies by the term's BM25 score
    from lucene_ray.functions.query import TermQuery, score_exhaustive

    bd, bs = score_exhaustive(r, TermQuery("apple"), 10)
    bm = dict(zip(bd.tolist(), np.asarray(bs, np.float64).tolist()))
    pd_, ps = payload_doc_scores(r, "apple", "max")
    want = {
        int(doc): float(p) * bm[int(doc)] for doc, p in zip(pd_, ps)
    }
    d2, s2 = score_payload(r, "apple", k=5, function="max",
                           include_span_score=True)
    for doc, sc in zip(d2.tolist(), np.asarray(s2, np.float64).tolist()):
        assert sc == pytest.approx(want[doc], rel=1e-12)


def test_payload_checkindex_and_merge(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.merge import compact_shards
    from lucene_ray.state.checkindex import check_index

    cfg = IndexConfig(
        analyzer="whitespace_payload", norm_kind="exact",
        num_partitions=2, positions=True, payloads=True, sample_rate=1.0,
    )
    half = len(CORPUS) // 2
    for name, lo, hi in (("a", 0, half), ("b", half, len(CORPUS))):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(CORPUS[lo:hi], pa.string()),
            }
        )
        build_index(ray.data.from_arrow(tbl), str(tmp_path / name), cfg,
                    doc_count=hi - lo)
    rep_a = check_index(str(tmp_path / "a"))
    assert rep_a["errors"] == []
    merged = str(tmp_path / "m")
    compact_shards([str(tmp_path / "a"), str(tmp_path / "b")], merged)
    rep = check_index(merged)
    assert rep["errors"] == []
    from lucene_ray.state.reader import IndexReader

    r = IndexReader(merged)
    assert r.has_payloads
    docs, s = payload_doc_scores(r, "apple", "max")
    assert docs.tolist() == [0, 1, 2, 4]
    assert s.tolist() == [5.0, 2.0, 1.0, 0.5]


def test_payload_config_validation(ray_session, tmp_path):
    import ray.data

    tbl = pa.table({"doc_id": pa.array([0], pa.int64()),
                    "text": pa.array(["a|1"], pa.string())})
    with pytest.raises(ValueError, match="requires positions"):
        build_index(ray.data.from_arrow(tbl), str(tmp_path / "x"),
                    IndexConfig(analyzer="whitespace_payload", payloads=True),
                    doc_count=1)
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_index(
            ray.data.from_arrow(tbl), str(tmp_path / "y"),
            IndexConfig(analyzer="whitespace_payload", positions=True,
                        payloads=True, offsets=True),
            doc_count=1,
        )


def test_span_payload_check_vs_brute(pay_idx):
    """SpanPayloadCheckQuery vs a brute model over the known corpus:
    single-term payload filters under every MatchOperation, and 2-term
    ordered chains with per-link payload constraints."""
    from lucene_ray.functions.payloads import score_span_payload_check

    r = _reader(pay_idx)
    n = len(CORPUS)

    def occs(d, term):
        out = []
        for i, raw in enumerate(CORPUS[d].split()):
            t, _, p = raw.partition("|")
            if t == term:
                out.append((i, float(p) if p else float("nan")))
        return out

    OPS = {"eq": lambda p, v: p == v, "gt": lambda p, v: p > v,
           "gte": lambda p, v: p >= v, "lt": lambda p, v: p < v,
           "lte": lambda p, v: p <= v}

    def idf(term):
        df = sum(1 for d in range(n) if occs(d, term))
        return math.log(1 + (n - df + 0.5) / (df + 0.5))

    def dl(d):
        return len(CORPUS[d].split())

    avgdl = sum(dl(d) for d in range(n)) / n
    K1, B = 1.2, 0.75

    def score(d, f, terms):
        w = sum(idf(t) for t in terms)
        return w * (f / (f + K1 * ((1 - B) + B * dl(d) / avgdl)))

    # single term, every op
    for term, want, op in [("apple", 3.0, "eq"), ("apple", 2.0, "lte"),
                           ("plum", 2.0, "gte"), ("apple", 1.0, "gt"),
                           ("pear", 9.0, "lt")]:
        got_d, got_s = score_span_payload_check(r, (term,), (want,), op=op)
        exp = {}
        for d in range(n):
            f = sum(1 for _, p in occs(d, term)
                    if not math.isnan(p) and OPS[op](p, want))
            if f:
                exp[d] = score(d, float(f), (term,))
        ranked = sorted(exp, key=lambda d: (-exp[d], d))
        assert list(got_d) == ranked, (term, want, op)
        np.testing.assert_allclose(
            np.asarray(got_s, np.float64), [exp[d] for d in ranked],
            rtol=1e-12,
        )

    # 2-term ordered chain with per-link constraints
    got_d, got_s = score_span_payload_check(
        r, ("apple", "pear"), (5.0, 9.0), op="lte", slop=5
    )
    exp = {}
    for d in range(n):
        f = 0.0
        ap = [i for i, p in occs(d, "apple")
              if not math.isnan(p) and p <= 5.0]
        pp = [i for i, p in occs(d, "pear")
              if not math.isnan(p) and p <= 9.0]
        for a in ap:
            cand = [q for q in pp if q > a]
            if cand:
                gap = min(cand) - a - 1
                if gap <= 5:
                    f += 1.0 / (1.0 + gap)
        if f:
            exp[d] = score(d, f, ("apple", "pear"))
    ranked = sorted(exp, key=lambda d: (-exp[d], d))
    assert list(got_d) == ranked
    np.testing.assert_allclose(
        np.asarray(got_s, np.float64), [exp[d] for d in ranked], rtol=1e-12
    )
    with pytest.raises(ValueError):
        score_span_payload_check(r, ("a", "b", "c"), (1, 2, 3))
    with pytest.raises(ValueError):
        score_span_payload_check(r, ("a",), (1,), op="ne")


def test_payload_score_span_vs_brute(pay_idx):
    """PayloadScoreQuery over an ordered 2-term span: every matched chain
    contributes BOTH link payloads to the fold."""
    from lucene_ray.functions.payloads import score_payload_span

    r = _reader(pay_idx)
    n = len(CORPUS)

    def occs(d, term):
        out = []
        for i, raw in enumerate(CORPUS[d].split()):
            t, _, p = raw.partition("|")
            if t == term:
                out.append((i, float(p) if p else float("nan")))
        return out

    def chains(d, t0, t1, slop):
        res = []
        o1 = occs(d, t1)
        for a, pa in occs(d, t0):
            cand = [(q, pq) for q, pq in o1 if q > a]
            if cand:
                q, pq = min(cand)
                gap = q - a - 1
                if gap <= slop:
                    res.append((pa, pq, gap))
        return res

    for t0, t1, slop, fn in [("apple", "pear", 5, "max"),
                             ("apple", "apple", 5, "sum"),
                             ("plum", "plum", 3, "avg"),
                             ("apple", "plum", 9, "min")]:
        got_d, got_s = score_payload_span(r, (t0, t1), k=10, function=fn,
                                          slop=slop)
        exp = {}
        for d in range(n):
            ch = chains(d, t0, t1, slop)
            if not ch:
                continue
            pays = [p for pa, pq, _ in ch for p in (pa, pq)
                    if not math.isnan(p)]
            if fn == "max":
                v = max(pays) if pays else 1.0
            elif fn == "min":
                v = min(pays) if pays else 1.0
            elif fn == "sum":
                v = sum(pays) if pays else 1.0
            else:
                v = sum(pays) / len(pays) if pays else 1.0
            exp[d] = v
        ranked = sorted(exp, key=lambda d: (-exp[d], d))
        assert list(got_d) == ranked, (t0, t1, slop, fn)
        np.testing.assert_allclose(
            np.asarray(got_s, np.float64), [exp[d] for d in ranked],
            rtol=1e-12,
        )
    # include_span_score path at least executes and ranks deterministically
    d2, s2 = score_payload_span(r, ("apple", "pear"), k=10, function="max",
                                slop=5, include_span_score=True)
    assert len(d2) == len(s2)


def test_payloads_survive_heavy_term_splits(ray_session, tmp_path):
    """Heavy-term bucket splitting must keep the .pay stream aligned with
    positions (same lexsort writes both; buckets are disjoint doc
    ranges) — golden aggregates unchanged under an aggressive split
    threshold."""
    import ray.data

    texts = [f"apple|{i % 7} banana|{i % 3}" for i in range(200)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="whitespace_payload", norm_kind="exact", num_partitions=3,
        positions=True, payloads=True, sample_rate=1.0,
        heavy_df_threshold=10, bucket_shift=5,  # 32-doc buckets: many splits
    )
    out = str(tmp_path / "idx")
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(texts))
    from lucene_ray.pipelines.search import get_reader

    r = get_reader(out)
    assert len(r.manifest.get("heavy_terms", [])) >= 1  # split actually on
    docs, s = payload_doc_scores(r, "apple", "max")
    assert docs.tolist() == list(range(200))
    # payload 0.0 is a SEEN value (max = 0.0), not the no-payload fallback
    assert s.tolist() == [float(i % 7) for i in range(200)]
    _, s2 = payload_doc_scores(r, "banana", "sum")
    assert s2.tolist() == [float(i % 3) for i in range(200)]
    from lucene_ray.functions.payloads import score_span_payload_check

    d3, _ = score_span_payload_check(r, ("apple",), (4.0,), op="eq", k=200)
    assert d3.tolist() == [i for i in range(200) if i % 7 == 4]


def test_payload_encoder_rejects_nonfinite():
    an = make_analyzer("whitespace_payload")
    for bad in ["x|nan", "x|inf", "x|-inf", "x|1e309"]:
        with pytest.raises(ValueError):
            an.analyze_payloads(bad)
    # large-but-finite still fine
    _, _, p = an.analyze_payloads("x|1e30")
    assert p == [1e30]
