"""fn: interval-function syntax (StandardQueryParser subset) — parsed
nodes must be exactly the hand-built algebra nodes, and score identically
end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.interval_parser import parse_interval_query
from lucene_ray.functions.intervals import (
    IntervalAtLeast,
    IntervalBeforeAfter,
    IntervalBlock,
    IntervalContainedBy,
    IntervalContaining,
    IntervalExtend,
    IntervalFiltered,
    IntervalMultiTerm,
    IntervalOr,
    IntervalOrdered,
    IntervalOverlapping,
    IntervalQuery,
    interval_within,
    score_intervals,
    unordered_no_overlaps,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists

AN = make_analyzer("en_nostem_simple")

CASES = [
    ("fn:ordered(data stream)", IntervalQuery(("data", "stream"))),
    ("fn:unordered(data stream)",
     IntervalQuery(("data", "stream"), ordered=False)),
    ("fn:phrase(data stream)", IntervalBlock(("data", "stream"))),
    ("fn:or(data stream)", IntervalOr(("data", "stream"))),
    ("fn:atLeast(2 data stream key)",
     IntervalAtLeast(2, ("data", "stream", "key"))),
    ("fn:maxgaps(5 fn:ordered(data stream))",
     IntervalFiltered(IntervalQuery(("data", "stream")), max_gaps=5)),
    ("fn:maxwidth(4 fn:unordered(data stream))",
     IntervalFiltered(
         IntervalQuery(("data", "stream"), ordered=False), max_width=4
     )),
    ("fn:within(key 2 fn:unordered(data stream))",
     interval_within("key", 2, IntervalQuery(("data", "stream"),
                                             ordered=False))),
    ("fn:notWithin(key 2 data)",
     interval_within("key", 2, "data", negate=True)),
    ("fn:containedBy(key fn:unordered(data stream))",
     IntervalContainedBy(
         "key", IntervalQuery(("data", "stream"), ordered=False)
     )),
    ("fn:notContainedBy(key data)",
     IntervalContainedBy("key", "data", negate=True)),
    ("fn:containing(fn:unordered(data stream) key)",
     IntervalContaining(
         IntervalQuery(("data", "stream"), ordered=False), "key"
     )),
    ("fn:notContaining(fn:ordered(data stream) key)",
     IntervalContaining(IntervalQuery(("data", "stream")), "key",
                        negate=True)),
    ("fn:overlapping(fn:unordered(data stream) key)",
     IntervalOverlapping(
         IntervalQuery(("data", "stream"), ordered=False), "key"
     )),
    ("fn:nonOverlapping(fn:unordered(data stream) key)",
     IntervalOverlapping(
         IntervalQuery(("data", "stream"), ordered=False), "key",
         negate=True,
     )),
    ("fn:before(data key)", IntervalBeforeAfter("data", "key", mode="before")),
    ("fn:after(data key)", IntervalBeforeAfter("data", "key", mode="after")),
    ("fn:extend(key 1 2)", IntervalExtend("key", 1, 2)),
    ("fn:unorderedNoOverlaps(data stream)",
     unordered_no_overlaps("data", "stream")),
    ("fn:wildcard(d?ta)", IntervalMultiTerm("wildcard", "d?ta")),
    ("fn:prefix(str)", IntervalMultiTerm("prefix", "str")),
    ("fn:fuzzyTerm(strem)", IntervalMultiTerm("dfuzzy", "strem", 2)),
    ("fn:fuzzyTerm(strem 1)", IntervalMultiTerm("dfuzzy", "strem", 1)),
    # nesting + mixed leaves; quoted phrase; commas; case-insensitive name
    ("fn:or(fn:phrase(data stream), \"key value\")",
     IntervalOr((IntervalBlock(("data", "stream")),
                 IntervalBlock(("key", "value"))))),
    ("fn:MAXGAPS(3 fn:ordered(fn:or(data key) stream))",
     IntervalFiltered(
         IntervalOrdered((IntervalOr(("data", "key")), "stream")),
         max_gaps=3,
     )),
]


@pytest.mark.parametrize("expr,node", CASES, ids=[c[0] for c in CASES])
def test_parse_exact_nodes(expr, node):
    assert parse_interval_query(expr, AN) == node


def test_parse_analysis_applies():
    # standard_en stems; stopwords are rejected, not dropped
    an = make_analyzer("standard_en")
    assert parse_interval_query("fn:ordered(Queries Tables)", an) == (
        IntervalQuery(("queri", "tabl"))
    )
    with pytest.raises(ValueError, match="stopword"):
        parse_interval_query("fn:ordered(the data)", an)


@pytest.mark.parametrize("bad", [
    "fn:ordered(data stream",        # missing paren
    "fn:ordered()",                  # empty args
    "fn:bogus(a b)",                 # unknown function
    "fn:atLeast(x a b)",             # non-integer count
    "fn:extend(key 1)",              # missing int arg
    "fn:ordered(a) trailing",        # trailing tokens
    "fn:within(a b c)",              # non-integer distance
])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_interval_query(bad, AN)


def test_scores_match_hand_built(ray_session, tmp_path):
    texts = [
        "data stream key value join data key stream",
        "key value store with data inside the stream of rows",
        "stream data key",
        "value key data stream data stream key",
        "nothing relevant here at all",
    ]
    idx = str(tmp_path / "idx")
    build_from_lists(
        idx, list(range(len(texts))), texts,
        IndexConfig(analyzer="en_nostem_simple", norm_kind="exact",
                    num_partitions=2, positions=True),
    )
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(idx)
    for expr, node in CASES:
        pd_, ps = score_intervals(reader, parse_interval_query(expr, AN), 10)
        hd, hs = score_intervals(reader, node, 10)
        assert np.array_equal(pd_, hd), expr
        assert np.array_equal(ps, hs), expr
