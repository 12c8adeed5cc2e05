"""End-to-end engine vs brute-force oracle on randomized corpora — the
reference's dumb-vs-smart scorer pattern (TestWANDScorer, TestBoolean2,
CheckHits), plus partition-invariance and resume-equivalence (SURVEY.md §5).

Every comparison demands bit-identical doc IDs AND scores.
"""

import shutil

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig, build_index
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "running",
    "ponies", "cities", "quickly", "the", "and", "of",
]


def make_corpus(n_docs=400, seed=7, zipf=1.3):
    rng = np.random.default_rng(seed)
    probs = 1.0 / np.arange(1, len(WORDS) + 1) ** zipf
    probs /= probs.sum()
    texts = []
    for i in range(n_docs):
        dl = int(rng.integers(0, 60))
        words = rng.choice(WORDS, size=dl, p=probs)
        texts.append(" ".join(words))
    # edge docs: empty, stopword-only, huge
    texts[0] = ""
    texts[1] = "the and of the"
    texts[2] = " ".join(["alpha"] * 500)
    return list(range(n_docs)), texts


def build_from_lists(tmpdir, doc_ids, texts, cfg):
    import ray.data

    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    return build_index(ds, str(tmpdir), cfg, doc_count=len(doc_ids))


def random_queries(rng, n=30):
    qs = []
    for _ in range(n):
        kind = rng.integers(0, 5)
        terms = list(rng.choice(WORDS, size=int(rng.integers(1, 5)), replace=False))
        if kind == 0:
            qs.append(BooleanQuery(should=tuple(terms[:1])))
        elif kind == 1:
            qs.append(BooleanQuery(should=tuple(terms)))
        elif kind == 2:
            qs.append(BooleanQuery(must=tuple(terms[:2]), should=tuple(terms[2:])))
        elif kind == 3:
            qs.append(
                BooleanQuery(should=tuple(terms[:-1]) or tuple(terms),
                             must_not=tuple(terms[-1:]))
            )
        else:
            qs.append(
                BooleanQuery(
                    should=tuple(terms),
                    minimum_should_match=int(rng.integers(1, len(terms) + 1)),
                )
            )
    return qs


def analyzed(qs, an):
    out = []
    for q in qs:
        out.append(
            BooleanQuery(
                must=tuple(t for w in q.must for t in an.analyze(w)),
                should=tuple(t for w in q.should for t in an.analyze(w)),
                must_not=tuple(t for w in q.must_not for t in an.analyze(w)),
                minimum_should_match=q.minimum_should_match,
            )
        )
    return out


@pytest.fixture(scope="module")
def corpus():
    return make_corpus()


@pytest.fixture(scope="module")
def oracle(corpus):
    return OracleIndex(*corpus)


@pytest.mark.parametrize("norm_kind", ["byte4", "exact"])
def test_engine_matches_oracle(ray_session, tmp_path_factory, corpus, norm_kind):
    doc_ids, texts = corpus
    oracle = OracleIndex(doc_ids, texts, norm_kind=norm_kind)
    out = tmp_path_factory.mktemp(f"idx_{norm_kind}")
    build_from_lists(
        out, doc_ids, texts,
        IndexConfig(num_partitions=5, norm_kind=norm_kind,
                    heavy_df_threshold=60, sample_rate=1.0),
    )
    reader = IndexReader(str(out))
    an = make_analyzer("standard_en")
    rng = np.random.default_rng(11)
    for q in analyzed(random_queries(rng), an):
        for k in (1, 3, 10, 100):
            od, osc = oracle.topk(q, k)
            ed, esc = score_exhaustive(reader, q, k)
            bd, bsc = score_blockmax(reader, q, k)
            assert np.array_equal(od, ed), (q, k, od, ed)
            assert np.array_equal(osc, esc), (q, k)
            assert np.array_equal(od, bd), (q, k, od, bd)
            assert np.array_equal(osc, bsc), (q, k)


def test_extended_surface_random(ray_session, tmp_path_factory, corpus):
    """Randomized equivalence over the extended query surface: query-time
    boosts, prefix/fuzzy expansion clauses, and DisjunctionMax."""
    from lucene_ray.functions.query import DisMaxQuery, score_dismax

    doc_ids, texts = corpus
    oracle = OracleIndex(doc_ids, texts)
    out = tmp_path_factory.mktemp("ext")
    build_from_lists(
        out, doc_ids, texts,
        IndexConfig(num_partitions=5, heavy_df_threshold=60, sample_rate=1.0),
    )
    reader = IndexReader(str(out))
    an = make_analyzer("standard_en")
    rng = np.random.default_rng(17)
    for trial in range(30):
        words = list(rng.choice(WORDS, size=3, replace=False))
        terms = tuple(t for w in words for t in an.analyze(w))
        if not terms:
            continue
        kind = trial % 3
        if kind == 0:  # boosted boolean
            boosts = tuple(
                (t, float(rng.choice([0.5, 2.0, 3.5])))
                for t in terms[: int(rng.integers(1, len(terms) + 1))]
            )
            q = BooleanQuery(should=terms, boosts=boosts)
        elif kind == 1:  # expansion clause + plain term
            w = words[0]
            if rng.integers(0, 2):
                clause = ("prefix", w[: int(rng.integers(1, 4))], 0, "should")
            else:
                clause = ("fuzzy", w, int(rng.integers(1, 3)), "should")
            q = BooleanQuery(should=terms[1:], multi=(clause,))
        else:  # dismax
            q = DisMaxQuery(terms=terms, tie_breaker=float(rng.uniform(0, 1)))
            od, osc = oracle.topk_dismax(q, 10)
            bd, bsc = score_dismax(reader, q, 10)
            assert np.array_equal(od, bd), q
            assert np.array_equal(np.asarray(osc), np.asarray(bsc)), q
            continue
        od, osc = oracle.topk(q, 10)
        for fn in (score_exhaustive, score_blockmax):
            bd, bsc = fn(reader, q, 10)
            assert np.array_equal(od, bd), (q, fn.__name__)
            assert np.array_equal(np.asarray(osc), np.asarray(bsc)), q


def test_partition_invariance(ray_session, tmp_path_factory, corpus, oracle):
    """Results must not depend on partition count or heavy-term splitting
    (SURVEY.md §5(d))."""
    doc_ids, texts = corpus
    an = make_analyzer("standard_en")
    rng = np.random.default_rng(13)
    qs = analyzed(random_queries(rng, 12), an)
    configs = [
        IndexConfig(num_partitions=1),
        IndexConfig(num_partitions=7),
        IndexConfig(num_partitions=7, heavy_df_threshold=10, sample_rate=1.0,
                    bucket_shift=6),
    ]
    for ci, cfg in enumerate(configs):
        out = tmp_path_factory.mktemp(f"inv_{ci}")
        build_from_lists(out, doc_ids, texts, cfg)
        reader = IndexReader(str(out))
        for q in qs:
            od, osc = oracle.topk(q, 10)
            bd, bsc = score_blockmax(reader, q, 10)
            assert np.array_equal(od, bd), (ci, q)
            assert np.array_equal(osc, bsc), (ci, q)


def test_resume_equivalence(ray_session, tmp_path, corpus, oracle):
    """A resumed build must serve byte-identical results (SURVEY.md §5(e))."""
    doc_ids, texts = corpus
    cfg = IndexConfig(num_partitions=4)
    m1 = build_from_lists(tmp_path, doc_ids, texts, cfg)
    assert not any(s["resumed"] for s in m1["segments"])
    m2 = build_from_lists(tmp_path, doc_ids, texts, cfg)
    assert all(s["resumed"] for s in m2["segments"])
    reader = IndexReader(str(tmp_path))
    q = BooleanQuery(should=("alpha", "beta"))
    od, osc = oracle.topk(q, 10)
    bd, bsc = score_blockmax(reader, q, 10)
    assert np.array_equal(od, bd) and np.array_equal(osc, bsc)


def test_term_stats_match_oracle(ray_session, tmp_path, corpus, oracle):
    doc_ids, texts = corpus
    build_from_lists(
        tmp_path, doc_ids, texts,
        IndexConfig(num_partitions=3, heavy_df_threshold=50, sample_rate=1.0),
    )
    reader = IndexReader(str(tmp_path))
    assert reader.doc_count == oracle.doc_count
    assert reader.sum_total_tf == oracle.sum_total_tf
    for t in ("alpha", "omega", "poni", "citi", "zzz_missing"):
        odocs = oracle.postings.get(t)
        odf = len(odocs[0]) if odocs else 0
        ottf = int(odocs[1].sum()) if odocs else 0
        assert reader.term_stats(t) == (odf, ottf), t


def test_query_parser(ray_session):
    an = make_analyzer("standard_en")
    q = parse_query("ponies AND cities", an)
    assert q.must == ("poni", "citi") and not q.should
    q = parse_query("+running quickly -omega", an)
    assert q.must == ("run",) and q.should == ("quickli",)
    assert q.must_not == ("omega",)
    q = parse_query("alpha OR beta", an)
    assert set(q.should) == {"alpha", "beta"}
    q = parse_query("the of", an)  # stopwords analyze away
    assert not (q.must or q.should or q.must_not)


def test_files_exchange_invariance_and_resume(
    ray_session, tmp_path_factory, corpus, oracle
):
    """The run-file exchange must be partition-invariant, resumable, and
    result-identical to the groupby exchange (incl. heavy splits)."""
    doc_ids, texts = corpus
    an = make_analyzer("standard_en")
    rng = np.random.default_rng(17)
    qs = analyzed(random_queries(rng, 10), an)
    configs = [
        IndexConfig(num_partitions=1, exchange="files"),
        IndexConfig(num_partitions=7, exchange="files"),
        IndexConfig(num_partitions=7, exchange="files",
                    heavy_df_threshold=10, sample_rate=1.0, bucket_shift=6),
    ]
    for ci, cfg in enumerate(configs):
        out = tmp_path_factory.mktemp(f"files_inv_{ci}")
        build_from_lists(out, doc_ids, texts, cfg)
        reader = IndexReader(str(out))
        for q in qs:
            od, osc = oracle.topk(q, 10)
            bd, bsc = score_blockmax(reader, q, 10)
            assert np.array_equal(od, bd), (ci, q)
            assert np.array_equal(osc, bsc), (ci, q)
    # resume: rebuilding the last config skips every segment encode
    m2 = build_from_lists(out, doc_ids, texts, configs[-1])
    assert all(s["resumed"] for s in m2["segments"])
