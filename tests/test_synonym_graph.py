"""SynonymGraphFilter analogue: multi-word (graph) synonym rules
(reference: analysis/common/src/java/org/apache/lucene/analysis/synonym/
SynonymGraphFilter.java + FlattenGraphFilter.java for index-time
flattening; query-time expansion per core/.../util/QueryBuilder.java:
560-640 analyzeGraphBoolean).

Goldens mirror TestSynonymGraphFilter's canonical shapes (m->1, 1->m,
replace, greedy longest match, stacked 1->1); end-to-end checks that a
doc saying "new york" is found by the query "ny" through query-time
expansion, that index-time flattening makes the plain query find it,
and that the compiled NestedQuery scores identically on the pruned and
exhaustive paths.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import SynonymGraphAnalyzer, make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    NestedQuery,
    PhraseQuery,
    SynonymQuery,
    graph_boolean_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists


def simple_graph(rules):
    return SynonymGraphAnalyzer(make_analyzer("en_nostem_simple"), rules)


# --- flatten goldens (TestSynonymGraphFilter shapes) ---


def test_multiword_to_single_keeporig():
    an = simple_graph({("new", "york"): [("ny",)]})
    terms, pos = an.analyze_positions("new york city")
    # ny stacks at the span start; city keeps its position
    assert list(zip(terms, pos)) == [
        ("new", 0), ("york", 1), ("ny", 0), ("city", 2)
    ]


def test_single_to_multiword_shifts_following():
    an = simple_graph({("ny",): [("new", "york")]})
    terms, pos = an.analyze_positions("visit ny today")
    # the replacement opens one extra position: today shifts 2 -> 3
    assert list(zip(terms, pos)) == [
        ("visit", 0), ("ny", 1), ("new", 1), ("york", 2), ("today", 3)
    ]


def test_replace_closes_hole():
    an = simple_graph({("new", "york"): (False, [("ny",)])})
    terms, pos = an.analyze_positions("new york city")
    # keepOrig=false m->1: the flattener renumbers the dropped node
    assert list(zip(terms, pos)) == [("ny", 0), ("city", 1)]


def test_greedy_longest_match():
    an = simple_graph(
        {("big", "apple"): [("ny",)], ("big", "apple", "pie"): [("dessert",)]}
    )
    terms, _ = an.analyze_positions("big apple pie")
    assert "dessert" in terms and "ny" not in terms
    terms2, _ = an.analyze_positions("big apple core")
    assert "ny" in terms2 and "dessert" not in terms2


def test_no_rematch_inside_consumed_span():
    # after consuming "a b", matching resumes AFTER the span (FST parse)
    an = simple_graph({("alpha", "beta"): [("x",)], ("beta",): [("y",)]})
    terms, _ = an.analyze_positions("alpha beta")
    assert terms == ["alpha", "beta", "x"]  # no y


def test_stopword_gap_inside_span_matches():
    # SynonymGraphFilter consumes the post-StopFilter stream: "new the
    # york" still matches the (new, york) rule; original positions keep
    # their gap
    an = simple_graph({("new", "york"): [("ny",)]})
    terms, pos = an.analyze_positions("new the york city")
    assert list(zip(terms, pos)) == [
        ("new", 0), ("york", 2), ("ny", 0), ("city", 3)
    ]


def test_three_token_output_rule():
    an = simple_graph({("usa",): [("united", "states", "america")]})
    terms, pos = an.analyze_positions("usa wins")
    assert list(zip(terms, pos)) == [
        ("usa", 0), ("united", 0), ("states", 1), ("america", 2),
        ("wins", 3),
    ]


def test_multi_alternatives():
    an = simple_graph({("fast",): [("quick",), ("speedy",)]})
    terms, pos = an.analyze_positions("fast car")
    assert list(zip(terms, pos)) == [
        ("fast", 0), ("quick", 0), ("speedy", 0), ("car", 1)
    ]


def test_name_spec_roundtrip():
    an = make_analyzer(
        "syngraph:en_nostem_simple:new+york=ny,ny=>new+york,fast=quick|speedy"
    )
    assert an.analyze("new york") == ["new", "york", "ny"]
    assert an.analyze("ny") == ["new", "york"]  # replace
    assert an.analyze("fast") == ["fast", "quick", "speedy"]
    with pytest.raises(KeyError):
        make_analyzer("syngraph:nobase")


# --- query-time graph expansion shapes ---


def test_graph_query_all_plain():
    an = simple_graph({("new", "york"): [("ny",)]})
    q = graph_boolean_query(an.analyze_graph("city walk"), "or")
    assert q == BooleanQuery(should=("city", "walk"))
    q2 = graph_boolean_query(an.analyze_graph("city walk"), "and")
    assert q2 == BooleanQuery(must=("city", "walk"))


def test_graph_query_single_stacked_segment_is_synonymquery():
    an = simple_graph({("fast",): [("quick",)]})
    q = graph_boolean_query(an.analyze_graph("fast"), "or")
    assert q == SynonymQuery(terms=("fast", "quick"))


def test_graph_query_sidepath_segment():
    an = simple_graph({("new", "york"): [("ny",)]})
    q = graph_boolean_query(an.analyze_graph("new york city"), "and")
    assert isinstance(q, NestedQuery)
    assert q.base == BooleanQuery(must=("city",))
    ((occur, child),) = q.children
    assert occur == "must"
    assert child.base == BooleanQuery(should=("ny",))
    ((ph_occur, ph),) = child.children
    assert ph_occur == "should"
    assert ph == PhraseQuery(terms=("new", "york"), offsets=(0, 1))


def test_graph_query_single_path_multitoken_is_phrase():
    an = simple_graph({("ny",): (False, [("new", "york")])})
    q = graph_boolean_query(an.analyze_graph("ny city"), "and")
    ((occur, child),) = q.children
    assert occur == "must" and child == PhraseQuery(
        terms=("new", "york"), offsets=(0, 1)
    )


# --- end-to-end over a tiny index ---

DOCS = [
    "new york city traffic report",
    "visit ny for the game",
    "fast boats near the york harbor",
    "new ideas about york",
    "the quick fox likes new york pizza",
    "ny ny ny",
]


@pytest.fixture(scope="module")
def idx(ray_session, tmp_path_factory):
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", positions=True,
        num_partitions=2,
    )
    d = tmp_path_factory.mktemp("syngraph_idx")
    build_from_lists(d, list(range(len(DOCS))), DOCS, cfg)
    from lucene_ray.pipelines.search import get_reader

    return get_reader(str(d))


def test_query_time_expansion_finds_both_forms(idx):
    an = simple_graph({("new", "york"): [("ny",)], ("ny",): [("new", "york")]})
    q = graph_boolean_query(an.analyze_graph("ny"), "or")
    docs, scores = score_blockmax(idx, q, 10)
    # docs with literal ny (1, 5) AND docs with the phrase (0, 4)
    assert set(docs.tolist()) == {0, 1, 4, 5}
    d2, s2 = score_exhaustive(idx, q, 10)
    assert docs.tolist() == d2.tolist()
    np.testing.assert_allclose(scores, s2, rtol=0, atol=0)


def test_query_time_expansion_and_operator(idx):
    an = simple_graph({("new", "york"): [("ny",)]})
    q = graph_boolean_query(an.analyze_graph("new york pizza"), "and")
    docs, _ = score_blockmax(idx, q, 10)
    assert docs.tolist() == [4]  # needs BOTH the ny-segment and pizza


def test_pruned_matches_exhaustive_on_graph_queries(idx):
    an = simple_graph(
        {("new", "york"): [("ny",)], ("ny",): [("new", "york")],
         ("fast",): [("quick",)]}
    )
    for text, op in [
        ("ny traffic", "or"),
        ("new york", "or"),
        ("fast pizza", "and"),
        ("ny fast", "or"),
        ("new york traffic", "and"),
    ]:
        q = graph_boolean_query(an.analyze_graph(text), op)
        d1, s1 = score_blockmax(idx, q, 10)
        d2, s2 = score_exhaustive(idx, q, 10)
        assert d1.tolist() == d2.tolist(), (text, op)
        np.testing.assert_array_equal(s1, s2)


def test_index_time_flatten_end_to_end(ray_session, tmp_path):
    cfg = IndexConfig(
        analyzer="syngraph:en_nostem_simple:new+york=ny",
        norm_kind="exact", positions=True, num_partitions=1,
    )
    build_from_lists(tmp_path, list(range(len(DOCS))), DOCS, cfg)
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(str(tmp_path))
    # plain term query "ny" now finds the new-york docs too
    docs, _ = score_blockmax(reader, BooleanQuery(should=("ny",)), 10)
    assert set(docs.tolist()) == {0, 1, 4, 5}
    # flattened positions: "ny city" phrase matches doc 0 (ny stacked at
    # the span start, city right after the 2-wide span)
    ph = PhraseQuery(terms=("ny", "city"), offsets=(0, 2))
    d, _ = score_blockmax(reader, ph, 10)
    assert d.tolist() == [0]
