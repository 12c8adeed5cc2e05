"""Monitor-module analogue: saved-query matching (reference:
monitor/.../Monitor.java, TermFilteredPresearcher.java,
CandidateMatcher.java). The key invariant: reverse matching over the doc
stream agrees exactly with the forward engine's matching_docs per query."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import matching_docs, parse_query
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.monitor import (
    QueryMatcherStage,
    flatten_queries,
    match_saved_queries,
)
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus

ANALYZER = "en_nostem_simple"

QUERIES = {
    0: "alpha",
    1: "+alpha +beta",
    2: "alpha beta gamma ~2",
    3: "+alpha -beta",
    4: "delta epsilon",
    5: "+zzzznothing",
    6: '"alpha beta"',       # exact phrase, positional verify
    7: '"beta the alpha"',   # phrase with a stopword position gap
}


@pytest.fixture(scope="module")
def corpus_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=300, seed=11)
    out = tmp_path_factory.mktemp("mon") / "idx"
    cfg = IndexConfig(
        analyzer=ANALYZER, norm_kind="exact", num_partitions=4,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out), doc_ids, texts


def test_reverse_matches_forward_engine(corpus_index):
    out, doc_ids, texts = corpus_index
    import ray.data

    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    got = match_saved_queries(docs, QUERIES, ANALYZER).to_pandas()
    reader = IndexReader(out)
    an = make_analyzer(ANALYZER)
    for qid, qs in QUERIES.items():
        want = set(matching_docs(reader, parse_query(qs, an)).tolist())
        have = set(got[got.query_id == qid].doc_id.tolist())
        assert have == want, (qid, qs)
    # no duplicate pairs
    assert not got.duplicated(["doc_id", "query_id"]).any()


def test_stage_empty_and_no_vocab_batches():
    stage = QueryMatcherStage({0: "alpha"}, ANALYZER)
    empty = pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string()),
    })
    assert len(stage(empty)) == 0
    blank = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["", "the and of"], pa.string()),
    })
    assert len(stage(blank)) == 0
    nomatch = pa.table({
        "doc_id": pa.array([3], pa.int64()),
        "text": pa.array(["omega psi"], pa.string()),
    })
    assert len(stage(nomatch)) == 0


def test_flatten_rejects_unsupported():
    an = make_analyzer(ANALYZER)
    with pytest.raises(ValueError):  # multi-term clause
        flatten_queries({0: parse_query("pre*", an)})
    with pytest.raises(ValueError):  # no positive clause
        flatten_queries({0: parse_query("-alpha", an)})


def test_msm_semantics():
    stage = QueryMatcherStage({0: "alpha beta gamma ~2"}, ANALYZER)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(
            ["alpha only here", "alpha beta here", "alpha beta gamma"],
            pa.string(),
        ),
    })
    out = stage(batch)
    assert out.column("doc_id").to_pylist() == [2, 3]


def test_phrase_monitor_semantics():
    """Candidate-by-terms is not enough: adjacency (with stopword gaps) is
    verified per candidate doc."""
    stage = QueryMatcherStage({0: '"alpha beta"', 1: '"alpha the beta"'},
                              ANALYZER)
    batch = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(
            [
                "alpha beta here",        # q0 hit; q1 needs gap 2 -> miss
                "beta alpha",             # terms present, order wrong
                "alpha the beta",         # gap 2: q1 hit, q0 miss
                # the gap is a position increment, not a literal stopword:
                # any filler token at that position matches (reference
                # PhraseQuery position-gap semantics)
                "alpha filler beta",      # gap 2: q1 hit, q0 miss
            ],
            pa.string(),
        ),
    })
    got = {(r["doc_id"], r["query_id"]) for r in stage(batch).to_pylist()}
    assert got == {(1, 0), (3, 1), (4, 1)}


def test_flatten_rejects_sloppy_phrase():
    an = make_analyzer(ANALYZER)
    with pytest.raises(ValueError):
        flatten_queries({0: parse_query('"alpha beta"~2', an)})


EXACT_QUERIES = {
    0: "alpha",
    1: "+alpha +beta",
    2: '"alpha beta"',
    3: '"alpha beta"~3',     # sloppy phrase: rejected by the flat matcher
    4: "alph*",              # prefix expansion (ANYTOKEN presearch bucket)
    5: "gamm?",              # wildcard
    6: "alpa~1",             # fuzzy
    7: "+alpha -beta",
    8: "delta epsilon ~2",
}


def test_exact_matcher_full_query_semantics(corpus_index):
    """MemoryIndex-verified percolation == forward engine for query
    shapes the term-count matcher cannot express (sloppy/multi-term) —
    the reference CandidateMatcher-over-MemoryIndex contract."""
    import ray.data

    from lucene_ray.pipelines.monitor import match_saved_queries_exact

    out, doc_ids, texts = corpus_index
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(5)
    got = match_saved_queries_exact(docs, EXACT_QUERIES, ANALYZER).to_pandas()
    reader = IndexReader(out)
    an = make_analyzer(ANALYZER)
    for qid, qs in EXACT_QUERIES.items():
        want = set(matching_docs(reader, parse_query(qs, an)).tolist())
        have = set(got[got.query_id == qid].doc_id.tolist())
        assert have == want, (qid, qs)
    assert not got.duplicated(["doc_id", "query_id"]).any()
