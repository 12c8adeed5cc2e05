"""Segment blob round-trip + impact frontier properties (FIXTURES.md §5:
df at 256/8192/8193 boundaries, singleton postings, duplicate impacts)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_ray.functions.impacts import impact_frontier
from lucene_ray.state.segment import encode_term_postings, parse_term_postings


def roundtrip(doc_ids, tfs, keys):
    out = bytearray()
    off, length = encode_term_postings(
        out,
        np.asarray(doc_ids, dtype=np.int64),
        np.asarray(tfs, dtype=np.int64),
        np.asarray(keys, dtype=np.int64),
    )
    tp = parse_term_postings(memoryview(bytes(out)), off, length)
    d, t, k = tp.decode_all()
    return tp, d, t, k


@pytest.mark.parametrize("df", [1, 2, 255, 256, 257, 511, 512, 8192, 8193])
def test_roundtrip_boundaries(df):
    rng = np.random.default_rng(df)
    docs = np.sort(rng.choice(df * 7, size=df, replace=False))
    tfs = rng.integers(1, 100, size=df)
    keys = rng.integers(0, 256, size=df)
    tp, d, t, k = roundtrip(docs, tfs, keys)
    assert tp.df == df
    assert tp.n_blocks == (df + 255) // 256
    assert np.array_equal(d, docs)
    assert np.array_equal(t, tfs)
    assert np.array_equal(k, keys)
    # skip arrays consistent
    assert tp.first_docs[0] == docs[0]
    assert tp.last_docs[-1] == docs[-1]
    assert np.all(tp.first_docs <= tp.last_docs)


@given(
    st.integers(1, 600),
    st.integers(0, 2**30),
    st.integers(0, 10**6),
)
@settings(max_examples=50, deadline=None)
def test_roundtrip_random(df, base, seed):
    rng = np.random.default_rng(seed)
    gaps = rng.integers(1, 1000, size=df)
    docs = base + np.cumsum(gaps)
    tfs = rng.integers(1, 10**6, size=df)
    keys = rng.integers(0, 256, size=df)
    _, d, t, k = roundtrip(docs, tfs, keys)
    assert np.array_equal(d, docs) and np.array_equal(t, tfs) and np.array_equal(k, keys)


def test_block_decode_independent():
    """Each block decodes without touching its predecessors (what makes
    skipping possible)."""
    docs = np.arange(0, 1000, 2)
    tfs = np.ones(500, dtype=np.int64)
    keys = np.full(500, 9)
    out = bytearray()
    off, length = encode_term_postings(out, docs, tfs, keys)
    tp = parse_term_postings(memoryview(bytes(out)), off, length)
    d1, _, _ = tp.decode_block(1)
    assert np.array_equal(d1, docs[256:512])


def test_impact_frontier_pareto():
    tfs = np.array([1, 5, 5, 3, 10, 2])
    keys = np.array([1, 4, 3, 2, 9, 1])
    ft, fk = impact_frontier(tfs, keys)
    # no kept pair dominated by another kept pair
    for i in range(len(ft)):
        for j in range(len(ft)):
            if i != j:
                assert not (ft[j] >= ft[i] and fk[j] <= fk[i])
    # every input pair dominated by (or equal to) some frontier pair
    for t, k in zip(tfs, keys):
        assert any(ft[i] >= t and fk[i] <= k for i in range(len(ft)))


@given(st.lists(st.tuples(st.integers(1, 50), st.integers(0, 255)),
                min_size=1, max_size=300))
@settings(max_examples=200, deadline=None)
def test_impact_frontier_bounds_scores(pairs):
    """max over frontier == max over all pairs for any monotone scorer —
    the property WAND pruning relies on (reference:
    CompetitiveImpactAccumulator.java:64-123)."""
    from lucene_ray.functions.bm25 import BM25Float32

    tfs = np.array([p[0] for p in pairs])
    keys = np.array([p[1] for p in pairs])
    ft, fk = impact_frontier(tfs, keys)
    s = BM25Float32(10000, 2_500_000, 100)
    assert s.max_score(ft, fk) == float(s.score_array(tfs, keys).max())


def test_bulk_encode_matches_blockwise():
    """_encode_blocks_bulk must be byte-identical to the per-block path on
    randomized lists covering const blocks, exceptions, and tails."""
    import numpy as np

    from lucene_ray.functions.codec import BLOCK_SIZE
    from lucene_ray.state.segment import (
        _encode_blocks_blockwise,
        _encode_blocks_bulk,
    )

    rng = np.random.default_rng(23)
    for df in (1, 7, 255, 256, 257, 512, 1000, 8192, 8193, 5000):
        docs = np.sort(
            rng.choice(df * 20 + 10, size=df, replace=False)
        ).astype(np.int64)
        tfs = np.where(
            rng.random(df) < 0.05,
            rng.integers(100, 100000, size=df),  # exception candidates
            rng.integers(1, 8, size=df),
        ).astype(np.int64)
        keys = np.full(df, 7, dtype=np.int64)  # constant blocks
        if df > 10:
            keys[df // 2 :] = rng.integers(1, 255, size=df - df // 2)
        n_blocks = (df + BLOCK_SIZE - 1) // BLOCK_SIZE
        bounds = [
            (i * BLOCK_SIZE, min((i + 1) * BLOCK_SIZE, df))
            for i in range(n_blocks)
        ]
        a = bytearray()
        off_a = np.empty(n_blocks, dtype=np.int32)
        _encode_blocks_blockwise(a, off_a, bounds, docs, tfs, keys)
        b = bytearray()
        off_b = np.empty(n_blocks, dtype=np.int32)
        _encode_blocks_bulk(b, off_b, bounds, docs, tfs, keys)
        assert bytes(a) == bytes(b), df
        assert np.array_equal(off_a, off_b), df


def test_impact_frontiers_bulk_matches_scalar():
    import numpy as np

    from lucene_ray.functions.impacts import impact_frontier, impact_frontiers_bulk

    rng = np.random.default_rng(31)
    sizes = np.array([1, 5, 256, 256, 100, 3], dtype=np.int64)
    n = int(sizes.sum())
    tfs = rng.integers(1, 50, size=n).astype(np.int64)
    keys = rng.integers(1, 20, size=n).astype(np.int64)  # many dup pairs
    bulk = impact_frontiers_bulk(tfs, keys, sizes)
    lo = 0
    for b, sz in enumerate(sizes):
        ft, fk = impact_frontier(tfs[lo : lo + sz], keys[lo : lo + sz])
        assert np.array_equal(ft, bulk[b][0]), b
        assert np.array_equal(fk, bulk[b][1]), b
        lo += sz
