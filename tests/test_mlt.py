"""MoreLikeThis (reference: queries/.../mlt/MoreLikeThis.java — term
selection createQueue :630-675, query assembly createQuery :593-616)."""

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.mlt import interesting_terms, mlt_query, more_like_this
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus

ANALYZER = "en_nostem_simple"


@pytest.fixture(scope="module")
def mlt_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=300, seed=33)
    out = tmp_path_factory.mktemp("mlt") / "idx"
    cfg = IndexConfig(
        analyzer=ANALYZER, norm_kind="exact", num_partitions=4,
        sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    oracle = OracleIndex(doc_ids, texts, analyzer=ANALYZER, norm_kind="exact")
    return str(out), doc_ids, texts, oracle


def _model_terms(oracle, text, min_tf, min_df, max_df, max_terms):
    """Reference model: tf*idf over the source doc, ClassicSimilarity idf."""
    an = make_analyzer(ANALYZER)
    toks = an.analyze(text)
    from collections import Counter

    out = []
    for t, tf in Counter(toks).items():
        if tf < min_tf or t not in oracle.postings:
            continue
        df = len(oracle.postings[t][0])
        if df < min_df or (max_df is not None and df > max_df):
            continue
        idf = np.log((oracle.doc_count + 1) / (df + 1.0)) + 1.0
        out.append((float(tf * idf), t))
    out.sort(key=lambda p: (-p[0], p[1]))
    return [(t, s) for s, t in out[:max_terms]]


@pytest.mark.parametrize("min_tf,min_df,max_df,max_terms", [
    (2, 5, None, 25), (1, 1, None, 5), (2, 2, 50, 10), (1, 1, None, 1),
])
def test_interesting_terms_vs_model(mlt_index, min_tf, min_df, max_df, max_terms):
    out, doc_ids, texts, oracle = mlt_index
    reader = IndexReader(out)
    an = make_analyzer(ANALYZER)
    for src in (3, 10, 42, 2):  # 2 = the repeated-'alpha' edge doc
        got = interesting_terms(
            reader, texts[src], an,
            min_tf=min_tf, min_df=min_df, max_df=max_df, max_terms=max_terms,
        )
        want = _model_terms(oracle, texts[src], min_tf, min_df, max_df, max_terms)
        assert got == want, (src, got, want)


def test_empty_and_stopword_sources(mlt_index):
    out, doc_ids, texts, oracle = mlt_index
    reader = IndexReader(out)
    an = make_analyzer(ANALYZER)
    assert interesting_terms(reader, "", an) == []
    assert interesting_terms(reader, "the and of", an) == []


@pytest.mark.parametrize("boost", [False, True])
def test_mlt_topk_vs_oracle(mlt_index, boost):
    out, doc_ids, texts, oracle = mlt_index
    reader = IndexReader(out)
    an = make_analyzer(ANALYZER)
    from lucene_ray.functions.query import score_blockmax

    for src in (3, 10, 42):
        q = mlt_query(reader, texts[src], an, boost=boost,
                      min_tf=1, min_df=2, max_terms=8)
        assert q.should
        if boost:
            sel = interesting_terms(reader, texts[src], an,
                                    min_tf=1, min_df=2, max_terms=8)
            worst = sel[-1][1]
            assert dict(q.boosts) == {
                t: pytest.approx(s / worst) for t, s in sel
            }
            assert min(b for _, b in q.boosts) >= 1.0
        od, osc = oracle.topk(q, 10)
        bd, bsc = score_blockmax(reader, q, 10)
        assert np.array_equal(od, bd), (src, boost)
        assert np.allclose(osc, bsc, rtol=0, atol=0), (src, boost)


def test_more_like_this_table_shape(mlt_index):
    out, doc_ids, texts, oracle = mlt_index
    tbl = more_like_this(
        out, {0: texts[3], 1: "", 2: texts[10]}, k=5,
        min_tf=1, min_df=2, max_terms=8,
    )
    pdf = tbl.to_pandas()
    # empty source contributes no rows; ranks are 1..n per query
    assert set(pdf.query_id) <= {0, 2}
    for qid, g in pdf.groupby("query_id"):
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
    # the source doc itself ranks at the top of its own MLT results
    assert pdf[pdf.query_id == 0].iloc[0].doc_id == 3


def test_term_vectors_sidecar_and_mlt(mlt_index, ray_session):
    """Term vectors match the analyzer's tf counts; vector-based MLT term
    selection is identical to text-based selection; retrieval excludes the
    seed doc."""
    import pyarrow as pa
    import ray.data
    from collections import Counter

    from lucene_ray.pipelines.mlt import (
        interesting_terms_from_tfs,
        more_like_this_from_vectors,
    )
    from lucene_ray.state.termvectors import (
        TermVectors,
        build_term_vectors,
        has_term_vectors,
    )

    out, doc_ids, texts, oracle = mlt_index
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    build_term_vectors(ds, out, analyzer_name=ANALYZER)
    assert has_term_vectors(out)
    tv = TermVectors(out)
    an = make_analyzer(ANALYZER)
    reader = IndexReader(out)
    for src in (3, 10, 42, 2, 0):
        assert tv.get(doc_ids[src]) == dict(Counter(an.analyze(texts[src])))
        want = interesting_terms(
            reader, texts[src], an, min_tf=1, min_df=1, max_terms=10
        )
        got = interesting_terms_from_tfs(
            reader, tv.get(doc_ids[src]), min_tf=1, min_df=1, max_terms=10
        )
        assert got == want
    res = more_like_this_from_vectors(
        out, [3, 10], k=5, min_tf=1, min_df=1
    ).to_pandas()
    assert len(res) > 0
    for src in (3, 10):
        sub = res[res["query_id"] == src]
        assert src not in set(sub["doc_id"])  # seed excluded
        assert list(sub["rank"]) == list(range(1, len(sub) + 1))
