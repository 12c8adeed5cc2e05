"""Extension-surface analyzers: goldens + engine/oracle equivalence.

Reference analogues: WhitespaceTokenizer, KeywordTokenizer, LetterTokenizer,
NGramTokenFilter, EdgeNGramTokenFilter, ShingleFilter
(analysis/common/src/java/org/apache/lucene/analysis/{core,ngram,shingle}).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer


def test_whitespace():
    an = make_analyzer("whitespace")
    assert an.analyze("Foo  bar\tBaz") == ["Foo", "bar", "Baz"]
    assert an.analyze("") == []


def test_keyword():
    an = make_analyzer("keyword")
    assert an.analyze("Foo bar") == ["Foo bar"]
    assert an.analyze("") == []


def test_letter():
    an = make_analyzer("letter")
    assert an.analyze("ab3cd EF-gh") == ["ab", "cd", "ef", "gh"]


def test_ngram():
    an = make_analyzer("ngram")  # 2..3 grams
    assert an.analyze("abcd") == ["ab", "abc", "bc", "bcd", "cd"]
    assert an.analyze("a") == []


def test_edge_ngram():
    an = make_analyzer("edge_ngram")
    assert an.analyze("abcd") == ["ab", "abc"]


def test_shingle():
    an = make_analyzer("shingle")
    assert an.analyze("a b c") == ["a", "b", "c", "a b", "b c"]


@pytest.mark.parametrize("analyzer", ["whitespace", "letter", "ngram", "shingle"])
def test_engine_matches_oracle_per_analyzer(ray_session, analyzer, tmp_path):
    import ray.data

    from lucene_ray.functions.query import parse_query, score_blockmax
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.oracle import OracleIndex
    from lucene_ray.state.reader import IndexReader

    rng = np.random.default_rng(11)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 12))))
        for _ in range(60)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(60, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = str(tmp_path / f"idx_{analyzer}")
    cfg = IndexConfig(analyzer=analyzer, num_partitions=4, exchange="files")
    build_index(ray.data.from_arrow(tbl), out, cfg)
    reader = IndexReader(out)
    oracle = OracleIndex(range(60), texts, analyzer=analyzer)
    an = make_analyzer(analyzer)
    for qtext in ["alpha", "alpha beta", "beta AND gamma"]:
        q = parse_query(qtext, an)
        od, osc = oracle.topk(q, 10)
        d, s = score_blockmax(reader, q, 10)
        assert np.array_equal(od, d), (analyzer, qtext)
        assert np.array_equal(osc, s), (analyzer, qtext)


def test_sessionize_reference(ray_session):
    import ray.data

    from lucene_ray.pipelines.events import sessionize

    base = np.datetime64("2024-01-01T00:00:00", "us")
    minutes = [0, 10, 50, 200, 0, 45]  # user 1: gaps 10,40,150; user 2: 45
    users = [1, 1, 1, 1, 2, 2]
    tbl = pa.table(
        {
            "event_id": pa.array(np.arange(6, dtype=np.int64)),
            "user_id": pa.array(users, pa.int64()),
            "ts": pa.array(
                [base + np.timedelta64(m, "m").astype("timedelta64[us]") for m in minutes]
            ),
        }
    )
    rows = {
        r["event_id"]: (r["user_id"], r["session_id"])
        for r in sessionize(ray.data.from_arrow(tbl)).take_all()
    }
    # 30-min gap: user 1 -> [0,10] | [50] | [200]; user 2 -> [0] | [45]
    assert rows[0] == (1, 1) and rows[1] == (1, 1)
    assert rows[2] == (1, 2) and rows[3] == (1, 3)
    assert rows[4] == (2, 1) and rows[5] == (2, 2)
