"""DisjunctionMaxQuery and query-time boosts vs the brute-force oracle
(reference: search/DisjunctionMaxQuery.java, search/BoostQuery.java)."""

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    DisMaxQuery,
    parse_query,
    score_blockmax,
    score_dismax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=300, seed=31)
    out = tmp_path_factory.mktemp("dm") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return IndexReader(str(out)), OracleIndex(doc_ids, texts, analyzer="standard_en")


def test_dismax_matches_oracle(corpus):
    reader, oracle = corpus
    cases = [
        (("alpha", "beta"), 0.0),
        (("alpha", "beta", "gamma"), 0.3),
        (("kappa", "mu"), 1.0),       # tie=1 == plain sum
        (("alpha",), 0.5),            # single clause
        (("zzz", "alpha"), 0.2),      # missing clause drops out
        (("zzz",), 0.0),              # all missing -> empty
    ]
    for terms, tie in cases:
        q = DisMaxQuery(terms=terms, tie_breaker=tie)
        od, osc = oracle.topk_dismax(q, 10)
        bd, bsc = score_dismax(reader, q, 10)
        assert np.array_equal(od, bd), (terms, tie)
        assert np.array_equal(np.asarray(osc), np.asarray(bsc)), (terms, tie)


def test_dismax_tie1_equals_boolean_or(corpus):
    reader, oracle = corpus
    an = make_analyzer("standard_en")
    q_or = parse_query("alpha beta", an)
    d_or, s_or = score_blockmax(reader, q_or, 10)
    d_dm, s_dm = score_dismax(
        reader, DisMaxQuery(terms=("alpha", "beta"), tie_breaker=1.0), 10
    )
    # same ranking; scores agree to float32 rounding (max + (sum-max) vs sum)
    assert np.array_equal(d_or, d_dm)
    np.testing.assert_allclose(s_or, s_dm, rtol=1e-6)


def test_boost_parsing_and_scoring(corpus):
    reader, oracle = corpus
    an = make_analyzer("standard_en")
    q = parse_query("alpha^2 beta", an)
    assert q.boosts == (("alpha", 2.0),)
    od, osc = oracle.topk(q, 10)
    for fn in (score_exhaustive, score_blockmax):
        bd, bsc = fn(reader, q, 10)
        assert np.array_equal(od, bd)
        assert np.array_equal(np.asarray(osc), np.asarray(bsc))
    # boosted single term: ranks unchanged, scores scaled by exactly 2f
    d1, s1 = score_blockmax(reader, parse_query("alpha", an), 10)
    d2, s2 = score_blockmax(reader, parse_query("alpha^2", an), 10)
    assert np.array_equal(d1, d2)
    # float32: w2 = 2f*idf, score = w - w/(1+x) scales linearly only up to
    # rounding; check within 1 ulp-ish
    np.testing.assert_allclose(s2, 2.0 * s1, rtol=2e-7)
    with pytest.raises(ValueError):
        parse_query("alp*^2", an)


def test_custom_k1_b_matches_oracle(corpus):
    reader, oracle = corpus
    an = make_analyzer("standard_en")
    for k1, b in [(0.9, 0.4), (2.0, 1.0), (1.2, 0.0)]:
        reader.bm25_params = (k1, b)
        oracle.bm25_params = (k1, b)
        for qt in ["alpha", "alpha beta", "alpha AND beta"]:
            q = parse_query(qt, an)
            od, osc = oracle.topk(q, 10)
            bd, bsc = score_blockmax(reader, q, 10)
            assert np.array_equal(od, bd), (qt, k1, b)
            assert np.array_equal(np.asarray(osc), np.asarray(bsc)), (qt, k1, b)
    reader.bm25_params = (1.2, 0.75)
    oracle.bm25_params = (1.2, 0.75)


def test_boost_fractional_and_multi(corpus):
    reader, oracle = corpus
    an = make_analyzer("standard_en")
    q = parse_query("+alpha^0.5 beta^3 -gamma", an)
    od, osc = oracle.topk(q, 10)
    bd, bsc = score_blockmax(reader, q, 10)
    assert np.array_equal(od, bd)
    assert np.array_equal(np.asarray(osc), np.asarray(bsc))


def test_match_all_query(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MatchAllQuery,
        count_matches,
        parse_query,
        score_exhaustive,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    # non-dense doc ids: all_doc_ids must come from the doc_map sidecar
    ids = [3, 7, 100, 205]
    docs = pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(["a b", "c d", "e f", "g h"], pa.string()),
        }
    )
    out = str(tmp_path / "idx")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=4)
    an = make_analyzer("en_nostem_simple")
    q = parse_query("*:*", an)
    assert isinstance(q, MatchAllQuery)
    r = get_reader(out)
    d, s = score_exhaustive(r, q, 10)
    assert d.tolist() == ids and all(v == 1.0 for v in s)
    assert count_matches(r, q) == 4
    delete_docs(out, [100])
    assert count_matches(get_reader(out), q) == 3


def test_blended_term_query(corpus):
    """BlendedTermQuery: each term scores with BLENDED stats (df = max
    across the terms, ttf = sum) and its own boost, combined per rewrite
    — verified against a numpy brute force built from the reader's own
    postings and stats."""
    from lucene_ray.functions.bm25 import make_scorer
    from lucene_ray.functions.query import BlendedTermQuery, score_blended

    reader, _oracle = corpus

    def brute(terms, boosts, rewrite, tie=0.01, k=10):
        df_blend, ttf_blend = 0, 0
        for t in set(terms):
            df, ttf = reader.term_stats(t)
            df_blend = max(df_blend, df)
            ttf_blend += ttf
        if df_blend == 0:
            return [], []
        per_doc_sum, per_doc_max = {}, {}
        for t, b in zip(terms, boosts):
            df, _ = reader.term_stats(t)
            if df == 0:
                continue
            scorer = make_scorer(
                reader.norm_kind, reader.doc_count, reader.sum_total_tf,
                df_blend, boost=float(b),
            )
            for tp in reader.postings(t):
                d, tfs, keys = tp.decode_all()
                s = scorer.score_array(np.asarray(tfs), np.asarray(keys))
                for doc, sc in zip(np.asarray(d).tolist(), s.tolist()):
                    per_doc_sum[doc] = np.float32(
                        per_doc_sum.get(doc, np.float32(0.0))
                        + np.float32(sc)
                    )
                    per_doc_max[doc] = max(
                        per_doc_max.get(doc, np.float32(0.0)),
                        np.float32(sc),
                    )
        out = []
        for doc in per_doc_sum:
            if rewrite == "boolean":
                sc = per_doc_sum[doc]
            else:
                sc = np.float32(
                    per_doc_max[doc]
                    + np.float32(tie) * np.float32(
                        per_doc_sum[doc] - per_doc_max[doc]
                    )
                )
            out.append((float(sc), doc))
        out.sort(key=lambda e: (-e[0], e[1]))
        return ([d for _s, d in out[:k]], [s for s, _d in out[:k]])

    for terms, boosts, rewrite in [
        (("alpha", "beta"), (1.0, 1.0), "dismax"),
        (("alpha", "gamma"), (2.0, 1.0), "boolean"),
        (("kappa", "zzz"), (1.0, 1.0), "dismax"),   # absent variant
        (("alpha", "beta", "mu"), (1.0, 0.5, 2.0), "dismax"),
        (("zzz",), (1.0,), "dismax"),               # all absent -> empty
    ]:
        q = BlendedTermQuery(terms=terms, boosts=boosts, rewrite=rewrite)
        d, s = score_blended(reader, q, 10)
        wd, ws = brute(terms, boosts, rewrite)
        assert d.tolist() == wd, (terms, rewrite)
        assert np.allclose(np.asarray(s, np.float64), ws, rtol=1e-6), terms

    # the blend demotes a rare term's idf: with a common partner its
    # blended-df score is <= its own-stats score on every doc
    rare = "mu"
    df_r, ttf_r = reader.term_stats(rare)
    df_c, _ = reader.term_stats("alpha")
    assert 0 < df_r < df_c
    own_d, own_s = score_blended(
        reader, BlendedTermQuery(terms=(rare,)), 10
    )
    blend_d, blend_s = score_blended(
        reader, BlendedTermQuery(terms=(rare, "alpha"), rewrite="dismax"),
        reader.doc_count,
    )
    blended_lookup = dict(zip(blend_d.tolist(), blend_s.tolist()))
    for doc, sc in zip(own_d.tolist(), own_s.tolist()):
        assert blended_lookup[doc] <= sc + 1e-6


def test_blended_duplicate_clauses(corpus):
    """A duplicated term scores once PER CLAUSE with its own boost (the
    reference's rewritten disjunction keeps both TermQueries)."""
    from lucene_ray.functions.query import BlendedTermQuery, score_blended

    reader, _ = corpus
    dup = BlendedTermQuery(
        terms=("alpha", "alpha"), boosts=(1.0, 2.0), rewrite="boolean"
    )
    single = BlendedTermQuery(terms=("alpha",), boosts=(3.0,),
                              rewrite="boolean")
    dd, ds = score_blended(reader, dup, 10)
    sd, ss = score_blended(reader, single, 10)
    # boolean sum of boosts 1+2 == one clause at boost 3 (same blended
    # stats: df max and ttf sum both double-count consistently? no —
    # ttf doubles for dup) so compare against the explicit brute sum
    from lucene_ray.functions.bm25 import make_scorer

    df, ttf = reader.term_stats("alpha")
    want = {}
    for b in (1.0, 2.0):
        scorer = make_scorer(reader.norm_kind, reader.doc_count,
                             reader.sum_total_tf, df, boost=b)
        for tp in reader.postings("alpha"):
            d, tfs, keys = tp.decode_all()
            s = scorer.score_array(np.asarray(tfs), np.asarray(keys))
            for doc, sc in zip(np.asarray(d).tolist(), s.tolist()):
                want[doc] = np.float32(
                    want.get(doc, np.float32(0.0)) + np.float32(sc)
                )
    lookup = dict(zip(dd.tolist(), np.asarray(ds, np.float64).tolist()))
    for doc in dd.tolist():
        assert lookup[doc] == pytest.approx(float(want[doc]), rel=1e-6)
    with pytest.raises(ValueError):
        score_blended(reader, BlendedTermQuery(
            terms=("alpha", "beta"), boosts=(1.0,)
        ), 10)


def test_dismax_negative_scores(corpus):
    """Negative per-clause scores (Indri log-probs) must combine as the
    true max + tie * rest — a zero-initialized max would silently clamp."""
    from lucene_ray.functions.query import score_dismax

    reader, _ = corpus
    reader.similarity = ("indri", 2000.0)
    try:
        q = DisMaxQuery(terms=("alpha", "beta"), tie_breaker=0.3)
        d, s = score_dismax(reader, q, reader.doc_count)
        assert len(d) and (np.asarray(s) < 0).all()
        # brute force: per-term scored lists under the same similarity
        from lucene_ray.functions.query import _term_scorer, TermCursor

        per = {}
        for t in ("alpha", "beta"):
            df, ttf = reader.term_stats(t)
            if df == 0:
                continue
            scorer = _term_scorer(reader, df, ttf)
            cur = TermCursor(t, reader.postings(t), scorer, {},
                             deleted=getattr(reader, "deleted", None))
            docs, scores = cur.decode_all()
            for doc, sc in zip(docs.tolist(), scores.tolist()):
                per.setdefault(doc, []).append(sc)
        dt = np.float32 if reader.norm_kind == "byte4" else np.float64
        tie = np.dtype(dt).type(0.3)
        for doc, sc in zip(d.tolist(), s.tolist()):
            vals = [np.dtype(dt).type(v) for v in per[doc]]
            m = max(vals)
            want = m + tie * (sum(vals, np.dtype(dt).type(0.0)) - m)
            assert sc == pytest.approx(float(want), rel=1e-6), doc
    finally:
        reader.similarity = None
