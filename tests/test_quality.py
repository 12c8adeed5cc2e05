"""QualityStats semantics (benchmark/quality/QualityStats.java) — hand
cases for precision@N incl. the short-result extrapolation, recall, AvP,
the top-5 MRR window, and the zero-judged edge; plus the end-to-end
quality_benchmark over a real index."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.quality import quality_benchmark, quality_stats

from test_engine_oracle import build_from_lists, make_corpus


def test_quality_stats_hand_case():
    # ranks:     1  2  3  4  5  6
    # relevant:  y  n  y  n  n  y   (relevant set has 5 docs total)
    ranked = np.array([10, 11, 12, 13, 14, 15])
    relevant = np.array([10, 12, 15, 90, 91])
    st = quality_stats(ranked, relevant, p_points=(1, 2, 3, 5, 10, 20))
    assert st["num_points"] == 6 and st["num_good"] == 3
    assert st["max_good"] == 5
    assert st["p_at_1"] == 1.0
    assert st["p_at_2"] == 0.5
    assert st["p_at_3"] == pytest.approx(2 / 3)
    assert st["p_at_5"] == pytest.approx(2 / 5)
    # extrapolation beyond numPoints: numGood / n (QualityStats.java:113)
    assert st["p_at_10"] == pytest.approx(3 / 10)
    assert st["p_at_20"] == pytest.approx(3 / 20)
    assert st["recall"] == pytest.approx(3 / 5)
    # AvP = (1/1 + 2/3 + 3/6) / 5
    assert st["avp"] == pytest.approx((1.0 + 2 / 3 + 0.5) / 5)
    assert st["mrr"] == 1.0


def test_quality_stats_mrr_window():
    relevant = np.array([55])
    # first relevant at rank 5 -> mrr = 1/5; at rank 6 -> 0 (top-5 window,
    # QualityStats.java:87-90)
    st5 = quality_stats(np.array([1, 2, 3, 4, 55]), relevant)
    assert st5["mrr"] == pytest.approx(0.2)
    st6 = quality_stats(np.array([1, 2, 3, 4, 9, 55]), relevant)
    assert st6["mrr"] == 0.0


def test_quality_stats_edges():
    # zero judged-relevant docs: recall degrades to running precision = 0
    st = quality_stats(np.array([1, 2, 3]), np.array([], dtype=np.int64))
    assert st["max_good"] == 0 and st["recall"] == 0.0 and st["avp"] == 0.0
    # zero results
    st0 = quality_stats(np.array([], dtype=np.int64), np.array([7]))
    assert st0["num_points"] == 0 and st0["p_at_5"] == 0.0
    assert st0["recall"] == 0.0 and st0["mrr"] == 0.0
    # perfect run
    stp = quality_stats(np.array([4, 5]), np.array([4, 5]))
    assert stp["recall"] == 1.0 and stp["avp"] == 1.0 and stp["mrr"] == 1.0


def test_quality_benchmark_end_to_end(ray_session, tmp_path):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_blockmax,
    )
    from lucene_ray.pipelines.search import get_reader

    doc_ids, texts = make_corpus(n_docs=200, seed=91)
    out = tmp_path / "q"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    reader = get_reader(str(out))
    an = make_analyzer("en_nostem_simple")
    judged = {
        0: ("alpha beta", matching_docs(reader, parse_query("gamma", an))),
        1: ("kappa", np.array([], dtype=np.int64)),
    }
    t = quality_benchmark(str(out), judged, k=10).to_pandas()
    assert list(t["query_id"]) == [0, 1]
    r0 = t.iloc[0]
    d, _ = score_blockmax(reader, parse_query("alpha beta", an), 10)
    rel = set(judged[0][1].tolist())
    good = [int(x) in rel for x in d]
    assert r0["num_points"] == len(d)
    assert r0["num_good"] == sum(good)
    assert r0["p_at_5"] == pytest.approx(sum(good[:5]) / 5, abs=1e-9)
    assert t.iloc[1]["max_good"] == 0 and t.iloc[1]["avp"] == 0.0
