"""BM25 property matrix — mirrors the reference's randomized similarity
contract (reference: test-framework/.../search/similarities/
BaseSimilarityTestCase.java:233-260 — over random corpus stats and all 256
norms: scores finite and non-negative, monotone up in freq, down in doc
length, down in docFreq) plus TestBM25Similarity's parameter edges."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_ray.functions.bm25 import BM25Float32, BM25Float64
from lucene_ray.functions.smallfloat import LENGTH_TABLE

corpus = st.tuples(
    st.integers(1, 10**8),  # doc_count
    st.integers(1, 10**10),  # extra sum_tf beyond doc_count
    st.integers(1, 10**8),  # doc_freq (clamped below)
)


@given(corpus, st.integers(1, 1000))
@settings(max_examples=300, deadline=None)
def test_scores_finite_nonneg_all_256_norms(c, tf):
    n, extra, df = c
    df = min(df, n)
    s = BM25Float32(n, n + extra, df)
    keys = np.arange(256)
    scores = s.score_array(np.full(256, tf), keys)
    assert np.all(np.isfinite(scores))
    assert np.all(scores >= 0)


@given(corpus)
@settings(max_examples=300, deadline=None)
def test_monotone_in_freq(c):
    n, extra, df = c
    df = min(df, n)
    s = BM25Float32(n, n + extra, df)
    tfs = np.arange(1, 500)
    for key in (0, 1, 42, 255):
        scores = s.score_array(tfs, np.full(len(tfs), key))
        assert np.all(np.diff(scores) >= 0)  # non-decreasing in tf


@given(corpus, st.integers(1, 1000))
@settings(max_examples=300, deadline=None)
def test_monotone_down_in_doclen(c, tf):
    n, extra, df = c
    df = min(df, n)
    s = BM25Float32(n, n + extra, df)
    keys = np.arange(256)
    scores = s.score_array(np.full(256, tf), keys)
    # LENGTH_TABLE is monotone non-decreasing in the byte, so scores must be
    # monotone non-increasing
    assert np.all(np.diff(scores) <= 0)


@given(st.integers(1, 10**8), st.integers(0, 10**10), st.integers(1, 400))
@settings(max_examples=300, deadline=None)
def test_monotone_down_in_docfreq(n, extra, tf):
    dfs = np.unique(np.linspace(1, n, 50, dtype=np.int64))
    prev = np.inf
    for df in dfs:
        s = BM25Float32(n, n + extra, int(df))
        score = float(s.score_array(np.array([tf]), np.array([42]))[0])
        assert score <= prev + 1e-9
        prev = score


def test_float32_formula_shape():
    """Lock the load-bearing rewrite: score = w - w/(1 + f*cache[norm]) in
    float32 (reference: BM25Similarity.java:221-237)."""
    s = BM25Float32(1000, 250_000, 10)
    tf, key = np.array([3]), np.array([100])
    w = s.weight
    inv = s.cache[100]
    expect = np.float32(w - w / (np.float32(1.0) + np.float32(3.0) * inv))
    got = s.score_array(tf, key)[0]
    assert got == expect
    assert got.dtype == np.float32


def test_float64_monotonicity_and_bounds():
    s = BM25Float64(1000, 250_000, 10)
    tfs = np.arange(1, 100)
    scores = s.score_array(tfs, np.full(99, 250))
    assert np.all(np.diff(scores) >= 0)
    # asymptote: score < idf * (tf -> inf limit) = weight
    assert np.all(scores < s.weight)


def test_idf_matches_double_then_float_narrowing():
    import math

    n, df = 12345, 37
    s = BM25Float32(n, 999999, df)
    assert s.idf == np.float32(math.log(1 + (n - df + 0.5) / (df + 0.5)))
