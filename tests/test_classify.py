"""Classification module analogues (reference:
classification/src/java/org/apache/lucene/classification/
SimpleNaiveBayesClassifier.java, KNearestNeighborClassifier.java)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists, make_corpus


def _nb_model_py(texts, classes, analyzer):
    """Pure-python reference of the NB sufficient statistics."""
    cls_vals = sorted(set(classes))
    dfc = {c: classes.count(c) for c in cls_vals}
    n_docs = len(texts)
    hits = {}
    sum_df = 0
    for text, c in zip(texts, classes):
        for t in set(analyzer.analyze(text)):
            hits.setdefault(t, {}).setdefault(c, 0)
            hits[t][c] += 1
            sum_df += 1
    avg_unique = sum_df / n_docs
    return cls_vals, dfc, n_docs, avg_unique, hits


def _nb_classify_py(text, model, analyzer):
    cls_vals, dfc, n_docs, avg_unique, hits = model
    best = None
    for c in cls_vals:
        den = avg_unique * dfc[c] + n_docs
        s = math.log(dfc[c]) - math.log(n_docs)
        for tok in analyzer.analyze(text):
            h = hits.get(tok, {}).get(c, 0)
            s += math.log((h + 1) / den)
        if best is None or s > best[0] + 1e-12:
            best = (s, c)
    return best[1], best[0]


def test_naive_bayes_vs_python_model(ray_session):
    import ray.data

    from lucene_ray.pipelines.classify import (
        naive_bayes_classify,
        train_naive_bayes,
    )

    rng = np.random.default_rng(7)
    vocab_a = ["apple", "anchor", "arrow", "amber"]
    vocab_b = ["breeze", "basalt", "bishop", "bark"]
    texts, classes = [], []
    for i in range(120):
        cls = "ca" if i % 3 else "cb"
        vocab = vocab_a if cls == "ca" else vocab_b
        # mix in shared words so likelihoods are non-trivial
        words = list(rng.choice(vocab, size=6)) + ["common", "word"]
        rng.shuffle(words)
        texts.append(" ".join(words))
        classes.append(cls)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(120), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(classes, pa.string()),
            }
        )
    )
    model = train_naive_bayes(ds)
    an = make_analyzer("en_nostem_simple")
    pymodel = _nb_model_py(texts, classes, an)
    got = (
        naive_bayes_classify(model, ds)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for i in range(120):
        want_c, want_s = _nb_classify_py(texts[i], pymodel, an)
        assert got.loc[i, "pred_cls"] == want_c, i
        assert abs(got.loc[i, "score"] - want_s) < 1e-9, i


def test_naive_bayes_model_stats(ray_session):
    """Model stats carry the reference's exact semantics: hits are doc
    counts (not tf), priors/dens use docFreq per class."""
    import ray.data

    from lucene_ray.pipelines.classify import train_naive_bayes

    texts = ["x x x y", "x z", "y y", "z z y"]
    classes = ["a", "a", "b", "b"]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(classes, pa.string()),
            }
        )
    )
    m = train_naive_bayes(ds)
    assert m["classes"] == ["a", "b"]
    # x appears in 2 docs of class a (tf 3 in one of them -> still 2 hits)
    assert m["hits"]["x"].tolist() == [2, 0]
    assert m["hits"]["y"].tolist() == [1, 2]
    assert m["hits"]["z"].tolist() == [1, 1]
    # sum_df = 7 distinct (doc, term) pairs; avg_unique = 7/4
    np.testing.assert_allclose(m["den"], 7 / 4 * np.array([2.0, 2.0]) + 4.0)
    np.testing.assert_allclose(m["prior"], np.log([2 / 4, 2 / 4]))


@pytest.fixture(scope="module")
def knn_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=200, seed=44)
    out = tmp_path_factory.mktemp("kc") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out), doc_ids, texts


def test_knn_classify_vote_math(knn_index, ray_session):
    from lucene_ray.functions.query import BooleanQuery, score_blockmax
    from lucene_ray.pipelines.classify import knn_classify
    from lucene_ray.pipelines.mlt import interesting_terms
    from lucene_ray.pipelines.search import get_reader

    out, doc_ids, texts = knn_index
    classes = [f"c{d % 3}" for d in doc_ids]
    lookup = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(classes, pa.string()),
        }
    )
    by_doc = dict(zip(doc_ids, classes))
    reader = get_reader(out)
    an = make_analyzer(reader.analyzer_name)
    k = 7
    srcs = {0: texts[5], 1: texts[50], 2: texts[100]}
    got = knn_classify(out, srcs, lookup, k=k, min_tf=1, min_df=2,
                       max_terms=10).to_pandas()
    for qid, text in srcs.items():
        sel = interesting_terms(reader, text, an, min_tf=1, min_df=2,
                                max_terms=10)
        q = BooleanQuery(must=(), should=tuple(t for t, _ in sel), must_not=())
        docs, s = score_blockmax(reader, q, k)
        per = {}
        for d, sc in zip(docs.tolist(), s.tolist()):
            c = by_doc[d]
            per[c] = per.get(c, 0.0) + sc / s[0]
        div = min(k, len(docs))
        want = sorted(((-v / div, c) for c, v in per.items()))[0]
        row = got[got.query_id == qid].iloc[0]
        assert row["pred_cls"] == want[1], qid
        assert abs(row["score"] - (-want[0])) < 1e-12, qid


def test_knn_classify_empty_selection(knn_index, ray_session):
    """A source text with no retrievable MLT terms yields no row (the
    reference's null assignment)."""
    from lucene_ray.pipelines.classify import knn_classify

    out, doc_ids, texts = knn_index
    lookup = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "lang": pa.array(["x"] * len(doc_ids), pa.string()),
        }
    )
    got = knn_classify(out, {0: "qqqq zzzz wwww"}, lookup, k=5).to_pandas()
    assert len(got) == 0


def test_naive_bayes_parquet_model_identical(ray_session, tmp_path):
    """The web-scale model path (model sunk to parquet, loaded per actor)
    and the df-floor are prediction-identical to the driver-dict path
    (floor=1) / treat pruned terms as hits=0 (floor>1)."""
    import ray.data

    from lucene_ray.pipelines.classify import (
        naive_bayes_classify,
        train_naive_bayes,
    )

    rng = np.random.default_rng(13)
    vocab = {"ca": ["apple", "arrow", "amber"], "cb": ["breeze", "bark", "bishop"]}
    texts, classes = [], []
    for i in range(90):
        cls = "ca" if i % 2 else "cb"
        words = list(rng.choice(vocab[cls], size=5)) + ["shared"]
        texts.append(" ".join(words))
        classes.append(cls)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(90), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(classes, pa.string()),
    }))
    m_small = train_naive_bayes(ds)
    m_pq = train_naive_bayes(ds, model_dir=str(tmp_path / "nbmodel"))
    assert "hits" not in m_pq and m_pq["model_dir"]
    assert m_pq["classes"] == m_small["classes"]
    assert np.allclose(m_pq["prior"], m_small["prior"])
    assert np.allclose(m_pq["den"], m_small["den"])
    a = naive_bayes_classify(m_small, ds).to_pandas().sort_values("doc_id")
    b = naive_bayes_classify(m_pq, ds).to_pandas().sort_values("doc_id")
    assert a["pred_cls"].tolist() == b["pred_cls"].tolist()
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())

    # df-floor: both paths prune identically
    m_small_f = train_naive_bayes(ds, min_hits=3)
    m_pq_f = train_naive_bayes(
        ds, model_dir=str(tmp_path / "nbmodel_f"), min_hits=3
    )
    # floor does not move the collection-level den/prior
    assert np.allclose(m_small_f["den"], m_small["den"])
    af = naive_bayes_classify(m_small_f, ds).to_pandas().sort_values("doc_id")
    bf = naive_bayes_classify(m_pq_f, ds).to_pandas().sort_values("doc_id")
    assert af["pred_cls"].tolist() == bf["pred_cls"].tolist()
    assert np.allclose(af["score"].to_numpy(), bf["score"].to_numpy())


def test_nb_model_dir_retrain_overwrites(ray_session, tmp_path):
    """Retraining into the SAME model_dir must replace the model, not
    accumulate stale parquet files alongside the new ones."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.classify import (
        naive_bayes_classify,
        train_naive_bayes,
    )

    def corpus(extra_word):
        texts, classes = [], []
        for i in range(40):
            cls = "ca" if i % 2 else "cb"
            texts.append(
                ("apple arrow " if cls == "ca" else "breeze bark ")
                + extra_word
            )
            classes.append(cls)
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(40), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(classes, pa.string()),
        }))

    model_dir = str(tmp_path / "nb_retrain")
    ds1 = corpus("alpha")
    train_naive_bayes(ds1, model_dir=model_dir)
    ds2 = corpus("omega")
    m2 = train_naive_bayes(ds2, model_dir=model_dir)
    m2_ref = train_naive_bayes(ds2)  # fresh small-path model, same corpus
    import numpy as np

    # the sunk model must equal a fresh train on ds2 — no ds1 residue
    assert np.allclose(m2["den"], m2_ref["den"])
    a = naive_bayes_classify(m2, ds2).to_pandas().sort_values("doc_id")
    b = naive_bayes_classify(m2_ref, ds2).to_pandas().sort_values("doc_id")
    assert a["pred_cls"].tolist() == b["pred_cls"].tolist()
    assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())
