"""XML query parser — the queryparser/xml CoreParser subset.

Reference: ``queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java`` (the builder registry: TermQuery, TermsQuery,
BooleanQuery, DisjunctionMaxQuery, MatchAllDocsQuery, ConstantScoreQuery,
RangeQuery/PointRangeQuery, SpanTerm, SpanNear, SpanOr, SpanFirst,
SpanNot, UserQuery) plus the per-element builders under
``queryparser/xml/builders/``. Parsed with the stdlib ``xml.etree``.

Element -> engine-node mapping (the engine's flat dataclasses,
functions/query.py + functions/spans.py):

* ``<TermQuery [boost]>text</TermQuery>`` — analyzed single term
  (TermQueryBuilder analyzes through the field analyzer); boost becomes
  a BooleanQuery ``boosts`` pair.
* ``<TermsQuery>w1 w2 ...</TermsQuery>`` — analyzed SHOULD disjunction
  (TermsQueryBuilder).
* ``<BooleanQuery [minimumNumberShouldMatch]>`` with
  ``<Clause occurs="must|should|mustNot|filter">`` children; term
  children fold into the flat BooleanQuery; a ``filter`` clause takes a
  ``<PointRangeQuery>`` (range filter semantics).
* ``<MatchAllDocsQuery/>``.
* ``<DisjunctionMaxQuery [tieBreaker]>`` over TermQuery children.
* ``<ConstantScoreQuery [boost]>`` wrapping any parseable child — run
  with ``score_constant``.
* ``<PointRangeQuery fieldName lowerTerm upperTerm/>`` standalone — a
  pure range filter (score 0, doc asc), like the classic parser's
  bare ``field:[lo TO hi]``.
* ``<SpanNear slopFactor inOrder>`` over ``<SpanTerm>`` children;
  ``<SpanOr>``; ``<SpanFirst end>``; ``<SpanNot>`` with ``<Include>`` /
  ``<Exclude>`` SpanTerm children — the engine's span dataclasses.
* ``<UserQuery>classic syntax</UserQuery>`` — delegates to
  ``parse_query`` (UserInputQueryBuilder wraps the classic parser).

Unsupported elements raise ValueError (CoreParser throws
ParserException for unknown element names).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import List, Tuple

from .query import BooleanQuery, DisMaxQuery, MatchAllQuery, parse_query
from .spans import SpanFirstQuery, SpanNearQuery, SpanNotQuery, SpanOrQuery


@dataclass(frozen=True)
class ConstantScoreXmlQuery:
    """ConstantScoreQuery wrapper (search/ConstantScoreQuery.java via the
    xml builder): run the inner query for MATCHES, score = boost."""

    query: object
    boost: float = 1.0


def _analyzed_one(text: str, analyzer, elem: str) -> str:
    terms = analyzer.analyze(text or "")
    if len(terms) != 1:
        raise ValueError(
            f"<{elem}> text {text!r} must analyze to exactly one term, "
            f"got {terms!r}"
        )
    return terms[0]


def _span_node(el: ET.Element, analyzer):
    tag = el.tag
    if tag == "SpanTerm":
        return _analyzed_one(el.text or "", analyzer, "SpanTerm")
    if tag == "SpanOr":
        return SpanOrQuery(tuple(
            _span_term(c, analyzer) for c in el
        ))
    if tag == "SpanNear":
        slop = int(el.get("slopFactor", "0"))
        in_order = el.get("inOrder", "true").lower() == "true"
        return SpanNearQuery(
            tuple(_span_term(c, analyzer) for c in el), slop, in_order
        )
    if tag == "SpanFirst":
        end = _int_attr(el, "end")
        (child,) = list(el)
        return SpanFirstQuery(_span_term(child, analyzer), end)
    if tag == "SpanNot":
        inc = el.find("Include")
        exc = el.find("Exclude")
        if inc is None or exc is None:
            raise ValueError("<SpanNot> needs <Include> and <Exclude>")
        (ic,) = list(inc)
        (ec,) = list(exc)
        return SpanNotQuery(
            _span_term(ic, analyzer), _span_term(ec, analyzer),
            pre=int(el.get("pre", "0")), post=int(el.get("post", "0")),
        )
    raise ValueError(f"unsupported span element <{tag}>")


def _span_term(el: ET.Element, analyzer) -> str:
    if el.tag != "SpanTerm":
        raise ValueError(
            f"span clause subset takes <SpanTerm> children, got <{el.tag}>"
        )
    return _analyzed_one(el.text or "", analyzer, "SpanTerm")


def _int_attr(el: ET.Element, name: str) -> int:
    """Required integer attribute — missing/garbage raises ValueError
    (the CoreParser ParserException contract), never TypeError."""
    raw = el.get(name)
    if raw is None:
        raise ValueError(f"<{el.tag}> needs a {name} attribute")
    try:
        return int(raw)
    except ValueError:
        raise ValueError(
            f"<{el.tag}> {name}={raw!r} is not an integer"
        ) from None


def _range_triple(el: ET.Element) -> Tuple[str, int, int]:
    field = el.get("fieldName")
    if not field:
        raise ValueError(f"<{el.tag}> needs fieldName")
    return (field, _int_attr(el, "lowerTerm"), _int_attr(el, "upperTerm"))


def _boolean(el: ET.Element, analyzer) -> BooleanQuery:
    must: List[str] = []
    should: List[str] = []
    must_not: List[str] = []
    boosts: List[Tuple[str, float]] = []
    filters: List[Tuple[str, int, int]] = []
    for clause in el:
        if clause.tag != "Clause":
            raise ValueError(
                f"<BooleanQuery> takes <Clause> children, got <{clause.tag}>"
            )
        occurs = (clause.get("occurs") or "should").lower()
        (child,) = list(clause)
        if occurs == "filter":
            if child.tag not in ("PointRangeQuery", "RangeQuery"):
                raise ValueError(
                    "filter clause subset takes <PointRangeQuery>"
                )
            filters.append(_range_triple(child))
            continue
        if child.tag == "TermQuery":
            t = _analyzed_one(child.text or "", analyzer, "TermQuery")
            b = float(child.get("boost", "1"))
            if b != 1.0:
                boosts.append((t, b))
            dest = {
                "must": must, "should": should, "mustnot": must_not,
            }.get(occurs)
            if dest is None:
                raise ValueError(f"unknown Clause occurs={occurs!r}")
            dest.append(t)
        elif child.tag == "TermsQuery" and occurs == "should":
            should.extend(analyzer.analyze(child.text or ""))
        else:
            raise ValueError(
                f"unsupported <Clause occurs={occurs!r}> child "
                f"<{child.tag}>"
            )
    return BooleanQuery(
        must=tuple(must), should=tuple(should), must_not=tuple(must_not),
        minimum_should_match=int(el.get("minimumNumberShouldMatch", "0")),
        boosts=tuple(boosts), filters=tuple(filters),
    )


def parse_xml_query(xml_text: str, analyzer):
    """XML query string -> engine query node. Raises ValueError on
    malformed XML or unsupported elements (CoreParser.ParserException)."""
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as e:
        raise ValueError(f"malformed query XML: {e}") from e
    return _node(root, analyzer)


def _node(el: ET.Element, analyzer):
    tag = el.tag
    if tag == "TermQuery":
        t = _analyzed_one(el.text or "", analyzer, "TermQuery")
        boost = float(el.get("boost", "1"))
        if boost != 1.0:
            return BooleanQuery(should=(t,), boosts=((t, boost),))
        return BooleanQuery(should=(t,))
    if tag == "TermsQuery":
        terms = tuple(analyzer.analyze(el.text or ""))
        if not terms:
            raise ValueError("<TermsQuery> analyzes to nothing")
        return BooleanQuery(should=terms)
    if tag == "BooleanQuery":
        return _boolean(el, analyzer)
    if tag == "MatchAllDocsQuery":
        return MatchAllQuery()
    if tag == "DisjunctionMaxQuery":
        terms = tuple(
            _analyzed_one(c.text or "", analyzer, "TermQuery")
            for c in el
            if c.tag == "TermQuery"
        )
        if len(terms) != len(list(el)):
            raise ValueError(
                "<DisjunctionMaxQuery> subset takes <TermQuery> children"
            )
        return DisMaxQuery(terms, float(el.get("tieBreaker", "0")))
    if tag == "ConstantScoreQuery":
        (child,) = list(el)
        return ConstantScoreXmlQuery(
            _node(child, analyzer), float(el.get("boost", "1"))
        )
    if tag in ("PointRangeQuery", "RangeQuery"):
        return BooleanQuery(filters=(_range_triple(el),))
    if tag in ("SpanTerm", "SpanOr", "SpanNear", "SpanFirst", "SpanNot"):
        node = _span_node(el, analyzer)
        if isinstance(node, str):  # bare SpanTerm scores like a term query
            return BooleanQuery(should=(node,))
        return node
    if tag == "UserQuery":
        return parse_query(el.text or "", analyzer)
    raise ValueError(f"unsupported query element <{tag}>")


def score_xml_query(reader, node, k: int = 10):
    """Dispatch a parsed XML node to its scoring kernel -> (docs, scores)."""
    from .query import score_blockmax, score_dismax
    from .spans import score_span

    if isinstance(node, ConstantScoreXmlQuery):
        from .query import score_constant

        return score_constant(reader, node.query, k, boost=node.boost)
    if isinstance(node, DisMaxQuery):
        return score_dismax(reader, node, k)
    if isinstance(
        node, (SpanNearQuery, SpanOrQuery, SpanFirstQuery, SpanNotQuery)
    ):
        return score_span(reader, node, k)
    return score_blockmax(reader, node, k)
