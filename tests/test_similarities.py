"""Pluggable similarities (LMDirichlet, Classic TF-IDF) through the
scorer protocol — formula goldens, the SimilarityBase monotonicity
property matrix (reference test pattern: similarities/BaseSimilarity
TestCase), engine-vs-brute integration, and searcher-state hygiene."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import parse_query, score_blockmax, score_exhaustive
from lucene_ray.functions.similarities import (
    ClassicTFIDF,
    LMDirichlet,
    make_similarity,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists, make_corpus

_TOK = re.compile(r"[a-z0-9]+")
_STOPS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}


def test_lmd_formula_golden():
    # N=100 docs, 1000 tokens, term: df=10, ttf=25; doc: tf=3, dl=20
    s = LMDirichlet("exact", 100, 1000, 10, 25, mu=2000.0)
    p = (25 + 1.0) / (1000 + 1.0)
    want = math.log(1 + 3 / (2000.0 * p)) + math.log(2000.0 / (20 + 2000.0))
    got = s.score_array(np.array([3]), np.array([20]))
    assert got[0] == pytest.approx(max(0.0, want), rel=1e-12)
    # negative raw scores clamp to 0 (common term, tiny tf, long doc)
    s2 = LMDirichlet("exact", 100, 1000, 90, 900, mu=10.0)
    assert s2.score_array(np.array([1]), np.array([5000]))[0] == 0.0
    with pytest.raises(ValueError):
        LMDirichlet("exact", 100, 1000, 10, 25, mu=-1.0)


def test_classic_formula_golden():
    s = ClassicTFIDF("exact", 100, 1000, 10)
    idf = math.log((100 + 1.0) / (10 + 1.0)) + 1.0
    want = (math.sqrt(4.0) * idf) * (1.0 / math.sqrt(16.0))
    got = s.score_array(np.array([4]), np.array([16]))
    assert got[0] == pytest.approx(want, rel=1e-12)


ALL_SIMS = [
    ("lmd", 2000.0), ("classic",), ("lmjm", 0.1), ("dfr_inl2", 1.0),
    ("ib_ll", 1.0), ("dfi",), ("boolean",), ("axiomatic_f2exp",),
    ("dfr", "g", "b", "h1"), ("dfr", "if", "l", "h2"),
    ("dfr", "ine", "b", "h2"), ("ib", "spl", "ttf", "h2"),
    ("ib", "ll", "ttf", "h1"),
]

# SweetSpotSimilarity (misc/SweetSpotSimilarity.java) — plateau length
# norm, so it is deliberately EXCLUDED from the dl-antitone monotonicity
# matrix; it still must match brute scoring and prune bit-identically.
# IndriDirichletSimilarity — NEGATIVE scores by design (no clamp), so it
# is excluded from the score>=0 matrix assertions for the same reason.
SWEET = ("sweetspot", 3, 8, 0.5, 1.5, 2.0)
INDRI = ("indri", 2000.0)
ALL_SIMS_PLUS = ALL_SIMS + [SWEET, INDRI]

# the full composable grid (DFRSimilarity / IBSimilarity component
# matrices) — every combination must satisfy the monotonicity matrix
DFR_GRID = [
    ("dfr", b, a, n)
    for b in ("g", "if", "in", "ine")
    for a in ("l", "b")
    for n in ("h1", "h2", "h3", "z", "none")
]
IB_GRID = [
    ("ib", d, l, n)
    for d in ("ll", "spl")
    for l in ("df", "ttf")
    for n in ("h1", "h2", "h3", "z", "none")
]


@pytest.mark.parametrize("sim", ALL_SIMS)
def test_monotonicity_matrix(sim):
    """SimilarityBase invariants: score non-decreasing in tf,
    non-increasing in dl, non-increasing in df (idf side), never
    negative, finite."""
    N, SUM = 1000, 50_000
    tfs = np.arange(1, 50)
    for df, ttf in [(1, 10), (10, 300), (400, 20_000)]:
        sc = make_similarity(sim, "exact", N, SUM, df, ttf)
        for dl in [1, 10, 100, 1000]:
            s = sc.score_array(tfs, np.full(len(tfs), dl))
            assert np.all(np.diff(s) >= 0), (sim, df, dl)  # tf up
            assert np.all(s >= 0) and np.all(np.isfinite(s))
        dls = np.array([1, 5, 25, 125, 625])
        s = sc.score_array(np.full(len(dls), 5), dls)
        assert np.all(np.diff(s) <= 0), (sim, df)  # dl up -> score down
    # df monotonicity (classic idf; lmd via ttf growing with df)
    lo = make_similarity(sim, "exact", N, SUM, 5, 50)
    hi = make_similarity(sim, "exact", N, SUM, 500, 5000)
    a = lo.score_array(np.array([3]), np.array([20]))[0]
    b = hi.score_array(np.array([3]), np.array([20]))[0]
    assert a >= b


@pytest.fixture(scope="module")
def sim_idx(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=250, seed=13)
    out = tmp_path_factory.mktemp("sim") / "idx"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=3,
        sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out), texts


def _brute_stats(texts):
    kept = [
        [w for w in _TOK.findall(t.lower()) if w not in _STOPS]
        for t in texts
    ]
    df, ttf = {}, {}
    for toks in kept:
        for w in set(toks):
            df[w] = df.get(w, 0) + 1
        for w in toks:
            ttf[w] = ttf.get(w, 0) + 1
    return kept, df, ttf, sum(len(k) for k in kept)


@pytest.mark.parametrize("sim", ALL_SIMS_PLUS)
def test_engine_matches_brute(sim_idx, sim):
    from lucene_ray.pipelines.search import get_reader

    idx, texts = sim_idx
    kept, df, ttf, sum_tf = _brute_stats(texts)
    n = len(texts)
    an = make_analyzer("en_nostem_simple")
    reader = get_reader(idx)
    reader.similarity = sim
    try:
        for qt in ["alpha", "kappa mu", "+alpha beta", "alpha -beta"]:
            q = parse_query(qt, an)
            want = {}
            for doc, toks in enumerate(kept):
                have = set(toks)
                if any(t not in have for t in q.must):
                    continue
                if any(t in have for t in q.must_not):
                    continue
                scoring = sorted(set(q.must) | set(q.should))
                if not q.must and not any(t in have for t in scoring):
                    continue
                s = 0.0
                for t in scoring:
                    tf = toks.count(t)
                    if tf == 0:
                        continue
                    sc = make_similarity(
                        sim, "exact", n, sum_tf, df[t], ttf[t]
                    )
                    s += float(
                        sc.score_array(np.array([tf]),
                                       np.array([len(toks)]))[0]
                    )
                want[doc] = s
            order = sorted(want, key=lambda d: (-want[d], d))[:10]
            d, s = score_exhaustive(reader, q, 10)
            assert d.tolist() == order, (sim, qt)
            np.testing.assert_allclose(
                np.asarray(s, np.float64), [want[doc] for doc in order],
                rtol=1e-12, err_msg=f"{sim} {qt}",
            )
            d2, s2 = score_blockmax(reader, q, 10)
            assert np.array_equal(d, d2) and np.array_equal(
                np.asarray(s), np.asarray(s2)
            )
    finally:
        reader.similarity = None


def test_sweetspot_shape():
    """SweetSpotSimilarity.java:110-147 invariants: norm == 1 exactly on
    the plateau, symmetric sqrt falloff outside it, baselineTf floors
    low frequencies at tf_base, and the parameter-free defaults degrade
    to ClassicSimilarity (the reference's documented identity)."""
    N, SUM = 1000, 50_000
    sc = make_similarity(SWEET, "exact", N, SUM, 10, 300)
    w = sc.weight
    tf1 = np.array([3])
    # plateau: dl in [3, 8] -> lengthNorm exactly 1
    for dl in (3, 5, 8):
        s = sc.score_array(tf1, np.array([dl]))[0]
        assert s == pytest.approx(float(sc._tf(tf1)[0]) * w, rel=0, abs=0)
    # symmetric falloff: |dl-edge| equal on both sides -> equal norms
    lo = sc.score_array(tf1, np.array([1]))[0]   # 2 below ln_min
    hi = sc.score_array(tf1, np.array([10]))[0]  # 2 above ln_max
    assert lo == pytest.approx(hi, rel=1e-12)
    assert lo < sc.score_array(tf1, np.array([3]))[0]
    # baselineTf: tf <= tf_min floors at tf_base, then sqrt growth
    t = sc._tf(np.array([1, 2, 3, 4]))
    assert t[0] == t[1] == 1.5
    assert t[2] == pytest.approx(np.sqrt(3 + 1.5 * 1.5 - 2.0))
    assert np.all(np.diff(t) >= 0)
    # defaults degrade to Classic: identical scores on a grid
    ss0 = make_similarity(("sweetspot",), "exact", N, SUM, 10, 300)
    cl = make_similarity(("classic",), "exact", N, SUM, 10, 300)
    tfs = np.arange(1, 30)
    for dl in (1, 4, 64, 700):
        np.testing.assert_allclose(
            ss0.score_array(tfs, np.full(len(tfs), dl)),
            cl.score_array(tfs, np.full(len(tfs), dl)), rtol=1e-12,
        )
    # bound relaxation is a true upper bound over any (tf, dl) pair
    dls = np.array([1, 2, 3, 5, 8, 13, 100])
    for tf in (1, 2, 5, 17):
        bound = sc.bound_array(np.array([tf]), np.array([1]))[0]
        assert np.all(
            sc.score_array(np.full(len(dls), tf), dls) <= bound + 1e-12
        )


def test_indri_shape():
    """IndriDirichletSimilarity.java:55-60 — ln((tf+mu*p)/(dl+mu)):
    monotone in tf, antitone in dl, typically NEGATIVE (no clamp)."""
    N, SUM = 1000, 50_000
    sc = make_similarity(INDRI, "exact", N, SUM, 10, 300)
    tfs = np.arange(1, 50)
    for dl in (1, 10, 100, 1000):
        s = sc.score_array(tfs, np.full(len(tfs), dl))
        assert np.all(np.diff(s) >= 0) and np.all(np.isfinite(s))
    dls = np.array([1, 5, 25, 125, 625])
    s = sc.score_array(np.full(len(dls), 5), dls)
    assert np.all(np.diff(s) <= 0)
    # the log of a smoothed probability: negative for ordinary tf/dl
    assert sc.score_array(np.array([2]), np.array([100]))[0] < 0
    # golden: mu=2000, p=(300+1)/(50000+1), tf=3, dl=120
    import math

    p = 301.0 / 50001.0
    want = math.log((3.0 + 2000.0 * p) / (120.0 + 2000.0))
    assert sc.score_array(np.array([3]), np.array([120]))[0] == \
        pytest.approx(want, rel=1e-15)


@pytest.mark.parametrize("sim", DFR_GRID + IB_GRID)
def test_composable_grid_monotonicity(sim):
    """Every DFR/IB component combination (40 models) keeps the
    SimilarityBase invariants: non-decreasing in tf, non-increasing in
    dl (z-normalization included), non-negative, finite."""
    N, SUM = 1000, 50_000
    tfs = np.arange(1, 40)
    for df, ttf in [(3, 30), (200, 9_000)]:
        sc = make_similarity(sim, "exact", N, SUM, df, ttf)
        for dl in [2, 40, 400]:
            s = sc.score_array(tfs, np.full(len(tfs), dl))
            assert np.all(np.diff(s) >= -1e-12), (sim, df, dl)
            assert np.all(s >= 0) and np.all(np.isfinite(s)), (sim, df, dl)
        dls = np.array([2, 10, 50, 250])
        s = sc.score_array(np.full(len(dls), 5), dls)
        assert np.all(np.diff(s) <= 1e-12), (sim, df)


@pytest.mark.parametrize("sim", [("lmd", 2000.0), ("dfr_inl2", 1.0), SWEET])
def test_sharded_similarity_matches_single_index(tmp_path, ray_session, sim):
    """Doc-range-sharded serving under a non-BM25 similarity must equal
    the single-index result exactly — global (df, ttf) are summed before
    scoring so collection models see whole-corpus stats."""
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    doc_ids, texts = make_corpus(n_docs=200, seed=29)
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0,
    )
    build_from_lists(tmp_path / "full", doc_ids, texts, cfg)
    build_from_lists(tmp_path / "a", doc_ids[:100], texts[:100], cfg)
    build_from_lists(tmp_path / "b", doc_ids[100:], texts[100:], cfg)
    reader = get_reader(str(tmp_path / "full"))
    reader.similarity = sim
    an = make_analyzer("en_nostem_simple")
    svc = ShardedSearchService(
        [str(tmp_path / "a"), str(tmp_path / "b")], similarity=sim
    )
    try:
        queries = ["alpha", "kappa mu", "+alpha beta"]
        res = svc.search(queries, k=10)
        for i, qt in enumerate(queries):
            d, s = score_exhaustive(reader, parse_query(qt, an), 10)
            assert np.array_equal(d, res[i][0]), (sim, qt)
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(res[i][1], np.float64)
            )
    finally:
        reader.similarity = None
        svc.shutdown()


def test_similarity_does_not_leak(sim_idx):
    """A similarity run must not change later default-BM25 scoring on the
    same cached reader (per-searcher state, reset discipline)."""
    from lucene_ray.pipelines.search import QueryExecStage, get_reader

    idx, _texts = sim_idx
    an = make_analyzer("en_nostem_simple")
    reader = get_reader(idx)
    q = parse_query("alpha beta", an)
    before_d, before_s = score_exhaustive(reader, q, 10)
    stage = QueryExecStage(idx, k=10, similarity=("lmd", 2000.0))
    import pyarrow as pa

    stage(pa.table({"query_id": pa.array([0], pa.int64()),
                    "query": pa.array(["alpha beta"], pa.string()),
                    "k": pa.array([10], pa.int32())}))
    stage.reader.similarity = None
    after_d, after_s = score_exhaustive(get_reader(idx), q, 10)
    assert np.array_equal(before_d, after_d)
    assert np.array_equal(np.asarray(before_s), np.asarray(after_s))
