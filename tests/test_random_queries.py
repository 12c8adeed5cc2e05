"""Randomized query properties on a fixed seeded corpus: phrase matching,
range filters, field sort and boolean+filter combinations are compared
against a plain-python model (the TestWANDScorer / CheckHits randomized
pattern from the reference's test framework, reference:
tests/search/CheckHits.java, TestPhraseQuery randomized docs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

VOCAB = ["data", "stream", "batch", "scan", "merge", "key", "dup", "row",
         "the", "of", "a"]  # includes stopwords for position gaps
N_DOCS = 80
RNG = np.random.default_rng(7)
TEXTS = [
    " ".join(RNG.choice(VOCAB, size=int(RNG.integers(3, 18))))
    for _ in range(N_DOCS)
]
TS = [int(v) for v in RNG.integers(0, 1000, size=N_DOCS)]


@pytest.fixture(scope="module")
def rand_index(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.docvalues import write_doc_values

    out = str(tmp_path_factory.mktemp("randidx") / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(N_DOCS), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "ts": pa.array(TS, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        positions=True,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=N_DOCS)
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    return out


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def _model_tokens(text):
    from lucene_ray.functions.analysis import make_analyzer

    return make_analyzer("en_nostem_simple").analyze_positions(text)


def test_random_phrases_match_python_model(rand_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query

    an = make_analyzer("en_nostem_simple")
    r = _reader(rand_index)
    rng = np.random.default_rng(11)
    checked = 0
    for _ in range(40):
        words = [str(w) for w in rng.choice(VOCAB, size=int(rng.integers(2, 4)))]
        qs = '"' + " ".join(words) + '"'
        q = parse_query(qs, an)
        if not q.terms:
            continue
        expect = []
        for d, text in enumerate(TEXTS):
            terms, pos = _model_tokens(text)
            index = {}
            for t, p in zip(terms, pos):
                index.setdefault(t, set()).add(p)
            if any(
                all((p0 + off) in index.get(t, set())
                    for t, off in zip(q.terms, q.offsets))
                for p0 in sorted(index.get(q.terms[0], set()))
            ):
                expect.append(d)
        got = matching_docs(r, q).tolist()
        assert got == expect, qs
        checked += 1
    assert checked >= 30


def test_random_ranges_and_boolean_filters(rand_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query

    an = make_analyzer("en_nostem_simple")
    r = _reader(rand_index)
    rng = np.random.default_rng(13)
    for _ in range(40):
        lo, hi = sorted(int(v) for v in rng.integers(0, 1000, size=2))
        term = str(rng.choice([w for w in VOCAB if w not in ("the", "of", "a")]))
        qs = f"{term} ts:[{lo} TO {hi}]"
        got = matching_docs(r, parse_query(qs, an)).tolist()
        expect = [
            d for d, text in enumerate(TEXTS)
            if term in _model_tokens(text)[0] and lo <= TS[d] <= hi
        ]
        assert got == expect, qs


def test_random_sort_by_field(rand_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_sort_by_field

    an = make_analyzer("en_nostem_simple")
    r = _reader(rand_index)
    rng = np.random.default_rng(17)
    for _ in range(10):
        term = str(rng.choice(["data", "stream", "batch", "scan"]))
        q = parse_query(term, an)
        match = [d for d, t in enumerate(TEXTS) if term in _model_tokens(t)[0]]
        ref = sorted(match, key=lambda d: (-TS[d], d))
        docs, vals = score_sort_by_field(r, q, "ts", k=7)
        assert docs.tolist() == ref[:7]
        if len(docs) == 7 and len(ref) > 7:
            d2, _ = score_sort_by_field(
                r, q, "ts", k=7, after=(int(vals[-1]), int(docs[-1]))
            )
            assert d2.tolist() == ref[7:14]
