"""CoreParser XML query syntax (queryparser/xml/CoreParser.java subset):
parsed nodes are exactly the engine dataclasses, and score identically to
hand-built queries end-to-end."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    DisMaxQuery,
    MatchAllQuery,
    parse_query,
)
from lucene_ray.functions.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
)
from lucene_ray.functions.xml_parser import (
    ConstantScoreXmlQuery,
    parse_xml_query,
    score_xml_query,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists

AN = make_analyzer("en_nostem_simple")

CASES = [
    ("<TermQuery>data</TermQuery>", BooleanQuery(should=("data",))),
    ("<TermQuery boost='2.5'>data</TermQuery>",
     BooleanQuery(should=("data",), boosts=(("data", 2.5),))),
    ("<TermsQuery>data stream key</TermsQuery>",
     BooleanQuery(should=("data", "stream", "key"))),
    ("""<BooleanQuery minimumNumberShouldMatch='1'>
          <Clause occurs='must'><TermQuery>data</TermQuery></Clause>
          <Clause occurs='should'><TermQuery>stream</TermQuery></Clause>
          <Clause occurs='should'><TermQuery boost='3'>key</TermQuery></Clause>
          <Clause occurs='mustNot'><TermQuery>error</TermQuery></Clause>
        </BooleanQuery>""",
     BooleanQuery(must=("data",), should=("stream", "key"),
                  must_not=("error",), minimum_should_match=1,
                  boosts=(("key", 3.0),))),
    ("""<BooleanQuery>
          <Clause occurs='should'><TermQuery>data</TermQuery></Clause>
          <Clause occurs='filter'>
            <PointRangeQuery fieldName='year' lowerTerm='2000' upperTerm='2024'/>
          </Clause>
        </BooleanQuery>""",
     BooleanQuery(should=("data",), filters=(("year", 2000, 2024),))),
    ("<MatchAllDocsQuery/>", MatchAllQuery()),
    ("""<DisjunctionMaxQuery tieBreaker='0.3'>
          <TermQuery>data</TermQuery><TermQuery>stream</TermQuery>
        </DisjunctionMaxQuery>""",
     DisMaxQuery(("data", "stream"), 0.3)),
    ("""<ConstantScoreQuery boost='2'>
          <TermQuery>data</TermQuery>
        </ConstantScoreQuery>""",
     ConstantScoreXmlQuery(BooleanQuery(should=("data",)), 2.0)),
    ("<PointRangeQuery fieldName='year' lowerTerm='1' upperTerm='5'/>",
     BooleanQuery(filters=(("year", 1, 5),))),
    ("""<SpanNear slopFactor='3' inOrder='true'>
          <SpanTerm>data</SpanTerm><SpanTerm>stream</SpanTerm>
        </SpanNear>""",
     SpanNearQuery(("data", "stream"), 3, True)),
    ("<SpanOr><SpanTerm>data</SpanTerm><SpanTerm>key</SpanTerm></SpanOr>",
     SpanOrQuery(("data", "key"))),
    ("<SpanFirst end='5'><SpanTerm>data</SpanTerm></SpanFirst>",
     SpanFirstQuery("data", 5)),
    ("""<SpanNot pre='1' post='2'>
          <Include><SpanTerm>data</SpanTerm></Include>
          <Exclude><SpanTerm>error</SpanTerm></Exclude>
        </SpanNot>""",
     SpanNotQuery("data", "error", pre=1, post=2)),
    ("<SpanTerm>data</SpanTerm>", BooleanQuery(should=("data",))),
    ("<UserQuery>+data -error stream</UserQuery>",
     parse_query("+data -error stream", AN)),
]


@pytest.mark.parametrize("xml,node", CASES, ids=range(len(CASES)))
def test_parse_exact_nodes(xml, node):
    assert parse_xml_query(xml, AN) == node


@pytest.mark.parametrize("bad", [
    "<TermQuery>data stream</TermQuery>",      # two terms in one TermQuery
    "<TermQuery>the</TermQuery>",              # stopword analyzes to nothing
    "<NoSuchQuery>x</NoSuchQuery>",            # unknown element
    "<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>",  # no Clause
    "<SpanFirst end='2'><TermQuery>x</TermQuery></SpanFirst>",
    "<BooleanQuery><Clause occurs='filter'><TermQuery>x</TermQuery></Clause></BooleanQuery>",
    "not xml at all <",
])
def test_parse_rejects(bad):
    with pytest.raises(ValueError):
        parse_xml_query(bad, AN)


def test_scores_match_hand_built(ray_session, tmp_path):
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.docvalues import write_doc_values

    texts = [
        "data stream key value error",
        "data key data stream",
        "stream of key rows with data near the end",
        "error data",
        "unrelated words entirely",
    ]
    idx = str(tmp_path / "idx")
    build_from_lists(
        idx, list(range(len(texts))), texts,
        IndexConfig(analyzer="en_nostem_simple", norm_kind="exact",
                    num_partitions=2, positions=True),
    )
    import pyarrow as pa
    import ray.data

    write_doc_values(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(5), pa.int64()),
            "year": pa.array([1999, 2005, 2010, 2020, 2024], pa.int64()),
        })),
        idx, "year",
    )
    reader = get_reader(idx)
    for xml, node in CASES:
        pd_, ps = score_xml_query(reader, parse_xml_query(xml, AN), 10)
        hd, hs = score_xml_query(reader, node, 10)
        assert np.array_equal(pd_, hd), xml
        assert np.array_equal(ps, hs), xml
    # the span and constant-score dispatches actually matched something
    cs = score_xml_query(
        reader, parse_xml_query(CASES[7][0], AN), 10
    )
    assert len(cs[0]) and all(s == 2.0 for s in cs[1].tolist())
