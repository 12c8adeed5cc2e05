"""SimpleQueryParser port: parse-shape goldens mirrored from the
reference TestSimpleQueryParser.java, never-raises fuzz, flag gating,
and end-to-end score identity on a real index."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.query import (
    BooleanQuery,
    MatchAllQuery,
    NestedQuery,
    PhraseQuery,
    TermQuery,
    matching_docs,
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.functions.simple_parser import (
    AND_OPERATOR,
    ESCAPE_OPERATOR,
    FUZZY_OPERATOR,
    NEAR_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    parse_simple_query,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists


class MockAnalyzer:
    """Whitespace + lowercase — the reference test's MockAnalyzer."""

    def analyze(self, text):
        return [w.lower() for w in text.split()]

    def analyze_positions(self, text):
        toks = self.analyze(text)
        return toks, list(range(len(toks)))


class KeywordMock:
    """MockTokenizer.KEYWORD, lowercase=false — the whole input is one
    term (used by the reference's flag-disable tests)."""

    def analyze(self, text):
        return [text] if text else []

    def analyze_positions(self, text):
        toks = self.analyze(text)
        return toks, list(range(len(toks)))


AN = MockAnalyzer()
KW = KeywordMock()


def parse(text, flags=-1):
    # the reference test helper sets defaultOperator=MUST
    return parse_simple_query(text, AN, default_operator="must", flags=flags)


def parse_kw(text, flags=-1):
    return parse_simple_query(text, KW, default_operator="must", flags=flags)


def bq(**kw):
    return BooleanQuery(**kw)


def not_wrap(inner_term):
    return NestedQuery(
        base=bq(must_not=(inner_term,)),
        children=(("should", MatchAllQuery()),),
    )


# --- goldens: TestSimpleQueryParser.java:78-480 ---------------------------


def test_term():
    assert parse("foobar") == TermQuery("foobar")


def test_fuzzy():
    dfz = bq(multi=(("dfuzzy", "foobar", 2, "should"),))
    assert parse("foobar~2") == dfz
    assert parse("foobar~") == dfz
    assert parse("foobar~a") == TermQuery("foobar")
    assert parse("foobar~1a") == TermQuery("foobar")
    # Python int() would accept the underscore separator; Java's
    # Integer.parseInt does not — must stay unparsable -> plain term
    assert parse("foobar~1_1") == TermQuery("foobar")
    # fuzziness clamps to the max supported distance (2)
    assert parse("foo~3 bar") == NestedQuery(
        base=bq(must=("bar",)),
        children=(
            ("must", bq(multi=(("dfuzzy", "foo", 2, "should"),))),
        ),
    )


def test_phrase_and_slop():
    ph = PhraseQuery(terms=("foo", "bar"), offsets=(0, 1), slop=0)
    assert parse('"foo bar"') == ph
    assert parse('"foo bar"~2') == PhraseQuery(
        terms=("foo", "bar"), offsets=(0, 1), slop=2
    )
    assert parse('"foo bar"~10') == PhraseQuery(
        terms=("foo", "bar"), offsets=(0, 1), slop=10
    )
    # trailing tilde with no / bad / negative slop is ignored
    assert parse('"foo bar"~') == ph
    assert parse('"foo bar"~a') == ph
    assert parse('"foo bar"~1a') == ph
    assert parse('"foo bar"~1_1') == ph
    assert parse('"foo bar"~-1') == ph
    assert parse('"foo bar"~12 baz') == NestedQuery(
        base=bq(must=("baz",)),
        children=(
            ("must", PhraseQuery(terms=("foo", "bar"), offsets=(0, 1),
                                 slop=12)),
        ),
    )


def test_prefix():
    assert parse("foobar*") == bq(multi=(("prefix", "foobar", 0, "should"),))
    # multiple asterisks: only the trailing one is the operator
    assert parse("st*ar*") == bq(multi=(("prefix", "st*ar", 0, "should"),))
    # escaped trailing '*' is literal; the pattern keeps the backslashed
    # char the escape produced
    assert parse_kw("st*ar\\\\**") == bq(
        multi=(("prefix", "st*ar\\*", 0, "should"),)
    )
    # fully-escaped last '*': not a prefix at all
    assert parse_kw("sT*Ar\\\\\\*") == TermQuery("sT*Ar\\*")


def test_and_or_not():
    assert parse("foo+bar") == bq(must=("foo", "bar"))
    assert parse("foo bar") == bq(must=("foo", "bar"))
    assert parse("foo|bar") == bq(should=("foo", "bar"))
    assert parse("foo||bar") == bq(should=("foo", "bar"))
    assert parse("-foo") == not_wrap("foo")
    assert parse("-(foo)") == not_wrap("foo")
    assert parse("---foo") == not_wrap("foo")
    assert parse('"foo bar"+"star wars"') == NestedQuery(
        base=bq(),
        children=(
            ("must", PhraseQuery(terms=("foo", "bar"), offsets=(0, 1))),
            ("must", PhraseQuery(terms=("star", "wars"), offsets=(0, 1))),
        ),
    )


def test_garbage():
    star = TermQuery("star")
    for text in ("star", "star\n", "star\r", "star\t", "star(", "star)",
                 'star"', "\t \r\n\nstar   \n \r \t ", '- + "" - star \\'):
        assert parse(text) == star, text
    empty = bq()
    for text in ("", "  ", "\\ ", "\\ \\ ", '""', '" "', '" "|" "',
                 '(" "|" ")', '" " " "', '(" " " ")'):
        assert parse(text) == empty, text
    for text in ("(star)", "(star))", "((star)",
                 "     -()(star)        \n\n\r     ",
                 "| + - ( + - |      star    \n      ) \n"):
        assert parse(text) == star, text
    sw_and = bq(must=("star", "wars"))
    for text in ("star wars", "star+wars", "     star     wars   ",
                 "     star +    wars   ", "  |     star + + |   wars   ",
                 "  |     star + + |   wars   \\"):
        assert parse(text) == sw_and, text
    sw_or = bq(should=("star", "wars"))
    for text in ("star|wars", "     star |    wars   ",
                 "  |     star | + |   wars   ",
                 "  +     star | + +   wars   \\"):
        assert parse(text) == sw_or, text
    for text in ("-star", "---star", "- -star -"):
        assert parse(text) == not_wrap("star"), text
    ph = PhraseQuery(terms=("star", "wars"), offsets=(0, 1))
    for text in ('"star wars"', '"star wars\\ "', '"" | "star wars"',
                 '          "star wars"        ""\\'):
        assert parse(text) == ph, text


def test_compound_and_complex():
    assert parse("star wars empire") == bq(must=("star", "wars", "empire"))
    assert parse(" | --star wars empire \n\\") == bq(
        must=("star", "wars", "empire")
    )
    assert parse("star|wars|empire") == bq(should=("star", "wars", "empire"))
    # complex00: (star OR wars) AND empire — left-fold precedence
    c00 = NestedQuery(
        base=bq(must=("empire",)),
        children=(("must", bq(should=("star", "wars"))),),
    )
    for text in ("star|wars empire", "star|wars + empire",
                 "star| + wars + ----empire |"):
        assert parse(text) == c00, text
    # complex01: (star AND wars) OR empire
    c01 = NestedQuery(
        base=bq(should=("empire",)),
        children=(("should", bq(must=("star", "wars"))),),
    )
    for text in ("star wars | empire", "star + wars|empire",
                 "star + | wars | ----empire +"):
        assert parse(text) == c01, text
    # complex04: (star AND wars) | empire | (strikes AND back)
    c04 = NestedQuery(
        base=bq(should=("empire",)),
        children=(
            ("should", bq(must=("star", "wars"))),
            ("should", bq(must=("strikes", "back"))),
        ),
    )
    for text in ("(star wars) | empire | (strikes back)",
                 "(star + wars) |empire | (strikes + back)",
                 "(star + | wars |) | ----empire | + --(strikes + | "
                 "--back) \\"):
        assert parse(text) == c04, text
    # complex05: nested nots
    c05 = NestedQuery(
        base=bq(),
        children=(
            ("should", bq(must=("star", "wars"))),
            ("should", NestedQuery(
                base=bq(should=("empire",)),
                children=(("should", NestedQuery(
                    base=bq(must=("strikes", "back")),
                    children=(("must", not_wrap("jarjar")),),
                )),),
            )),
        ),
    )
    assert parse("(star wars) | (empire | (strikes back -jarjar))") == c05
    assert parse(
        "(star + wars) |(empire | (strikes + back -jarjar) () )"
    ) == c05
    # complex06: escapes inside a deep tree
    c06 = NestedQuery(
        base=bq(must=("star",)),
        children=(("must", NestedQuery(
            base=bq(should=("wars",)),
            children=(("should", NestedQuery(
                base=bq(must=("back", "jar+|jar")),
                children=(("must", bq(should=("empire", "strikes"))),),
            )),),
        )),),
    )
    assert parse("star (wars | (empire | strikes back jar\\+\\|jar))") == c06


def test_star_becomes_match_all():
    assert parse("*") == MatchAllQuery()
    assert parse(" *   ") == MatchAllQuery()


def test_default_operator_should():
    assert parse_simple_query(
        "foo bar", AN, default_operator="should"
    ) == bq(should=("foo", "bar"))
    with pytest.raises(ValueError):
        parse_simple_query("x", AN, default_operator="filter")


# --- flag gating: TestSimpleQueryParser.java:539-610 ----------------------


def test_disable_flags():
    assert parse_kw('"test"', ~PHRASE_OPERATOR) == TermQuery('"test"')
    assert parse_kw("test*", ~PREFIX_OPERATOR) == TermQuery("test*")
    assert parse_kw("foo+bar", ~AND_OPERATOR) == TermQuery("foo+bar")
    assert parse_kw("+foo+bar", ~AND_OPERATOR) == TermQuery("+foo+bar")
    assert parse_kw("foo|bar", ~OR_OPERATOR) == TermQuery("foo|bar")
    assert parse_kw("|foo|bar", ~OR_OPERATOR) == TermQuery("|foo|bar")
    assert parse_kw("-foo", ~NOT_OPERATOR) == TermQuery("-foo")
    assert parse_kw("(foo)", ~PRECEDENCE_OPERATORS) == TermQuery("(foo)")
    assert parse_kw(")foo(", ~PRECEDENCE_OPERATORS) == TermQuery(")foo(")
    assert parse_kw("foo\\bar", ~ESCAPE_OPERATOR) == TermQuery("foo\\bar")
    assert parse_kw("(foo\\bar)", ~ESCAPE_OPERATOR) == TermQuery("foo\\bar")
    assert parse_kw('"foo\\bar"', ~ESCAPE_OPERATOR) == TermQuery("foo\\bar")
    assert parse_kw("foo foo", ~WHITESPACE_OPERATOR) == TermQuery("foo foo")
    assert parse_kw(" foo foo\n ", ~WHITESPACE_OPERATOR) == TermQuery(
        " foo foo\n "
    )
    assert parse_kw("foo~1", ~FUZZY_OPERATOR) == TermQuery("foo~1")
    # NEAR disabled: the ~2 becomes a separate (AND'd) term
    assert parse('"foo bar"~2', ~NEAR_OPERATOR) == NestedQuery(
        base=bq(must=("~2",)),
        children=(
            ("must", PhraseQuery(terms=("foo", "bar"), offsets=(0, 1))),
        ),
    )


# --- never raises on any input --------------------------------------------


def test_random_queries_never_raise():
    rng = np.random.default_rng(42)
    chars = list('a1|&  ()"-~+*\\\t\n')
    for _ in range(1500):
        n = int(rng.integers(0, 20))
        text = "".join(rng.choice(chars, size=n))
        flags = int(rng.integers(0, 1025))
        parse(text)
        parse_kw(text, flags)


# --- end-to-end score identity on a real index ----------------------------


DOCS = [
    "star wars the empire strikes back",
    "the empire strikes back again and again",
    "star trek is not star wars",
    "a new hope for the galaxy far away",
    "wars of the roses were not in space",
    "the force awakens in the empire",
    "galaxy quest is a parody of star trek",
    "strikes and gutters ups and downs",
]


@pytest.fixture(scope="module")
def simple_idx(ray_session, tmp_path_factory):
    out = tmp_path_factory.mktemp("simple_parser_idx")
    build_from_lists(
        out, list(range(len(DOCS))), DOCS,
        IndexConfig(analyzer="standard_en_nostem", num_partitions=2,
                    positions=True),
    )
    from lucene_ray.pipelines.search import get_reader

    return get_reader(str(out))


def test_flat_equivalence_with_classic(simple_idx):
    """Where both grammars express the query, results are identical."""
    pairs = [
        ("star wars", "star AND wars"),
        ("star|wars", "star wars"),
        ('"empire strikes"', '"empire strikes"'),
        ("star*", "star*"),
    ]
    an = MockAnalyzer()
    for simple_text, classic_text in pairs:
        qs = parse_simple_query(simple_text, an, default_operator="must")
        qc = parse_query(classic_text, an)
        ds, ss = score_blockmax(simple_idx, qs, 10)
        dc, sc = score_blockmax(simple_idx, qc, 10)
        assert np.array_equal(ds, dc), simple_text
        assert np.array_equal(ss, sc), simple_text


def test_negation_semantics(simple_idx):
    """-term matches every doc WITHOUT the term at the MatchAll's
    constant 1.0 (the reference's MUST_NOT + MatchAll wrapper)."""
    an = MockAnalyzer()
    q = parse_simple_query("-star", an, default_operator="must")
    docs = matching_docs(simple_idx, q)
    want = [i for i, t in enumerate(DOCS) if "star" not in t.split()]
    assert sorted(docs.tolist()) == want
    d, s = score_exhaustive(simple_idx, q, k=len(DOCS))
    assert np.allclose(s, 1.0)
    # star -wars: doc must have star, not wars; score = bm25(star) + 1.0
    q2 = parse_simple_query("star -wars", an, default_operator="must")
    d2, s2 = score_exhaustive(simple_idx, q2, k=len(DOCS))
    base, bs = score_exhaustive(
        simple_idx, BooleanQuery(should=("star",)), k=len(DOCS)
    )
    lookup = dict(zip(base.tolist(), bs.tolist()))
    want2 = sorted(
        i for i, t in enumerate(DOCS)
        if "star" in t.split() and "wars" not in t.split()
    )
    assert sorted(d2.tolist()) == want2
    for doc, score in zip(d2.tolist(), s2.tolist()):
        assert score == np.float32(np.float32(lookup[doc]) + np.float32(1.0))


def test_blockmax_matches_exhaustive(simple_idx):
    an = MockAnalyzer()
    for text in ("star wars | empire", "(star wars) | empire | "
                 "(strikes back)", "star -wars", "-empire",
                 '"empire strikes"~2 star', "star* | wars~1"):
        q = parse_simple_query(text, an, default_operator="must")
        de, se = score_exhaustive(simple_idx, q, 10)
        db, sb = score_blockmax(simple_idx, q, 10)
        assert np.array_equal(de, db), text
        assert np.array_equal(se, sb), text
