"""BP recursive-graph-bisection doc reordering (misc/index/
BPIndexReorderer.java; Dhulipala et al. KDD'16) — permutation
properties, objective improvement, and the end-to-end reordered index
(smaller postings, identical search results through orig_id)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from lucene_ray.pipelines.bp_reorder import (
    bp_permutation,
    bp_reorder_index,
    log_gap_cost,
)
from lucene_ray.pipelines.build import IndexConfig


def _clustered_incidence(n=400, per=6, pools=2, seed=5):
    rng = np.random.default_rng(seed)
    width = 40
    docs = []
    for i in range(n):
        lo = (i % pools) * width
        docs.append(
            np.sort(rng.choice(np.arange(lo, lo + width), per, False))
        )
    indptr = np.arange(0, (n + 1) * per, per)
    return indptr, np.concatenate(docs), pools * width


def test_bp_permutation_properties():
    indptr, flat, n_terms = _clustered_incidence()
    n = len(indptr) - 1
    perm = bp_permutation(indptr, flat, n_terms, min_partition_size=16)
    # a valid, deterministic permutation
    assert sorted(perm.tolist()) == list(range(n))
    assert np.array_equal(
        perm, bp_permutation(indptr, flat, n_terms, min_partition_size=16)
    )
    # objective: interleaved -> BP recovers most of the ideal gain
    c0 = log_gap_cost(indptr, flat, n_terms, np.arange(n))
    c1 = log_gap_cost(indptr, flat, n_terms, perm)
    ideal = np.concatenate([np.arange(0, n, 2), np.arange(1, n, 2)])
    ci = log_gap_cost(indptr, flat, n_terms, ideal)
    assert c1 < c0
    assert (c0 - c1) >= 0.8 * (c0 - ci)
    # tiny inputs pass through untouched
    small = bp_permutation(
        np.array([0, 1, 2]), np.array([0, 1]), 2, min_partition_size=32
    )
    assert small.tolist() == [0, 1]


def _post_bytes(index_dir):
    return sum(
        os.path.getsize(f)
        for f in glob.glob(os.path.join(index_dir, "segments", "*"))
        if f.endswith(".post")
    )


def test_bp_reorder_index(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import build_index
    from lucene_ray.pipelines.search import get_reader

    rng = np.random.default_rng(9)
    words_a = [f"alpha{i}" for i in range(30)]
    words_b = [f"beta{i}" for i in range(30)]
    texts = []
    for i in range(600):
        pool = words_a if i % 2 == 0 else words_b
        texts.append(" ".join(rng.choice(pool, size=8, replace=False)))
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0,
    )
    base = str(tmp_path / "base")
    build_index(
        ray.data.from_arrow(tbl), base, cfg, doc_count=len(texts)
    )
    out = str(tmp_path / "bp")
    manifest, stats = bp_reorder_index(
        ray.data.from_arrow(tbl), out, cfg, min_df=2,
        min_partition_size=16,
    )
    assert stats["cost_after"] < stats["cost_before"]
    # the reordered postings are SMALLER on disk (delta blocks shrink)
    assert _post_bytes(out) < _post_bytes(base)
    # identical result sets through the orig_id doc values
    an = make_analyzer("en_nostem_simple")
    rb, rr = get_reader(base), get_reader(out)
    for term in ("alpha3", "beta7", "alpha3 beta7"):
        q = parse_query(term, an)
        want = set(matching_docs(rb, q).tolist())
        got_new = matching_docs(rr, q)
        orig = rr.doc_values("orig_id").values_for(got_new)
        assert set(int(x) for x in orig) == want, term
    assert manifest["doc_count"] == len(texts)
