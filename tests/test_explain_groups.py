"""explain() decomposition + MUST multi-term (required-OR group) semantics.

Reference analogues: search/Explanation.java + BM25Similarity.explain
(validated CheckHits-style: explain(doc).value must equal the executor's
score bit-for-bit) and MultiTermQuery SCORING_BOOLEAN_REWRITE nested under
a MUST occur (search/ScoringRewrite.java).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "merge sort merge",
    "mercury rising",
    "sort of data",
    "merge data stream",
    "plain data row",
    "mermaid merge data",
]


@pytest.fixture(params=["exact", "byte4"])
def idx(ray_session, tmp_path, request):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index

    analyzer = "en_nostem_simple" if request.param == "exact" else "standard_en"
    out = str(tmp_path / f"idx-{request.param}")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer=analyzer, norm_kind=request.param, num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    return out, analyzer


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def test_must_multi_group_semantics(idx):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_blockmax,
        score_exhaustive,
    )

    index_dir, analyzer = idx
    an = make_analyzer(analyzer)
    r = _reader(index_dir)

    # +mer* : docs containing any term starting with 'mer'
    got = matching_docs(r, parse_query("+mer*", an)).tolist()
    assert got == [0, 1, 3, 5]

    # +mer* +data : group AND plain... both multi groups
    got = matching_docs(r, parse_query("+mer* +da*", an)).tolist()
    assert got == [3, 5]

    # +mer* data : with a required group, bare SHOULD terms are optional
    got = matching_docs(r, parse_query("+mer* data", an)).tolist()
    assert got == [0, 1, 3, 5]

    # +zzz* data : empty group expansion -> no match at all
    assert matching_docs(r, parse_query("+zzz* data", an)).tolist() == []

    # blockmax delegates to the exact group path
    for qs in ("+mer*", "+mer* data", "+mer* -sort"):
        q = parse_query(qs, an)
        bd, bs = score_blockmax(r, q, 10)
        ed, es = score_exhaustive(r, q, 10)
        assert bd.tolist() == ed.tolist() and bs.tolist() == es.tolist()


def test_must_multi_scores_include_group_terms(idx):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    index_dir, analyzer = idx
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    docs, scores = score_exhaustive(r, parse_query("+mer* data", an), 10)
    by_doc = dict(zip(docs.tolist(), scores.tolist()))
    # doc 5 matches two group expansions + 'data'; doc 1 only one expansion
    assert by_doc[5] > by_doc[1]


def test_explain_matches_executor_scores(idx):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        explain,
        parse_query,
        score_exhaustive,
    )

    index_dir, analyzer = idx
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    for qs in ("merge data", "+merge -sort", "mer* data", "+mer* data"):
        q = parse_query(qs, an)
        docs, scores = score_exhaustive(r, q, 10)
        for d, s in zip(docs.tolist(), scores.tolist()):
            ex = explain(r, q, d)
            assert ex["match"] is True
            assert ex["value"] == s  # bit-for-bit (same order, same dtype)
            assert abs(sum(t["value"] for t in ex["details"]) - s) < 1e-5
            for det in ex["details"]:
                assert det["doc_freq"] > 0 and det["tf"] >= 1
                assert det["idf"] > 0


def test_explain_non_matching_doc(idx):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import explain, parse_query

    index_dir, analyzer = idx
    an = make_analyzer(analyzer)
    r = _reader(index_dir)
    ex = explain(r, parse_query("+merge -sort", an), 0)  # doc 0 has 'sort'
    assert ex["match"] is False and ex["value"] == 0.0
    ex2 = explain(r, parse_query("merge", an), 4)  # no 'merge' in doc 4
    assert ex2["match"] is False and ex2["details"] == []
