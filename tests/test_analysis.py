"""Analysis-chain goldens + properties (reference chain:
analysis/common/.../en/EnglishAnalyzer.java:102-110; FIXTURES.md §4)."""

from hypothesis import given, settings, strategies as st

from lucene_ray.functions.analysis import (
    ENGLISH_STOP_WORDS,
    StandardEnglishAnalyzer,
    SimpleAnalyzer,
    lowercase,
    strip_possessive,
    make_analyzer,
)
from lucene_ray.functions.tokenize import MAX_TOKEN_LEN, tokenize


def test_tokenize_basic():
    assert tokenize("Hello, world! Foo-bar baz_qux") == [
        "Hello", "world", "Foo", "bar", "baz_qux",
    ]


def test_tokenize_joiners():
    assert tokenize("can't o’neill U.S.A 3.14 1,024 a. b") == [
        "can't", "o’neill", "U.S.A", "3.14", "1,024", "a", "b",
    ]
    # joiner not between same-class pairs breaks
    assert tokenize("3.x a,b 'quoted'") == ["3", "x", "a", "b", "quoted"]


def test_tokenize_255_chop():
    """Over-long runs are split, not dropped
    (reference: StandardTokenizer.java:84-105)."""
    tok = "x" * 300
    out = tokenize(f"start {tok} end")
    assert out == ["start", "x" * MAX_TOKEN_LEN, "x" * 45, "end"]


def test_tokenize_cjk_single_codepoint():
    assert tokenize("日本語 abc") == ["日", "本", "語", "abc"]


def test_tokenize_empty_and_punct():
    assert tokenize("") == []
    assert tokenize("!!! ... ---") == []


def test_possessive():
    assert strip_possessive("city's") == "city"
    assert strip_possessive("CITY'S") == "CITY"
    assert strip_possessive("city’s") == "city"
    assert strip_possessive("its") == "its"
    assert strip_possessive("'s") == ""


def test_lowercase_simple_mapping():
    assert lowercase("HELLO") == "hello"
    assert lowercase("Größe") == "größe"
    # dotted capital I: simple mapping -> plain i (no combining dot),
    # unlike Python str.lower() (reference: LowerCaseFilter.java:36-43)
    assert lowercase("İstanbul") == "istanbul"
    assert len(lowercase("İ")) == 1


def test_chain_golden():
    an = StandardEnglishAnalyzer()
    assert an.analyze("The cities' mayors are running quickly") == [
        "citi", "mayor", "run", "quickli",
    ]
    # stopwords dropped, possessive stripped, stemmed
    assert an.analyze("The city's PONIES and ties") == ["citi", "poni", "ti"]
    # stopword-only doc
    assert an.analyze("the and of to is") == []


def test_stopwords_are_reference_set():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert {"the", "a", "an", "and", "such", "will", "was"} <= ENGLISH_STOP_WORDS
    assert "i" not in ENGLISH_STOP_WORDS


def test_simple_analyzer_sql_parity():
    an = SimpleAnalyzer()
    assert an.analyze("Hello, WORLD-42 can't") == ["hello", "world", "42", "can", "t"]


def test_registry():
    assert make_analyzer("standard_en").analyze("ponies") == ["poni"]
    assert make_analyzer("standard_en_nostem").analyze("ponies") == ["ponies"]
    assert make_analyzer("en_nostem_simple").analyze("The Ponies RUN") == [
        "ponies", "run",
    ]


@given(st.text(max_size=400))
@settings(max_examples=300, deadline=None)
def test_tokenize_never_crashes_and_tokens_nonempty(text):
    for t in tokenize(text):
        assert t
        assert len(t) <= MAX_TOKEN_LEN


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=300))
@settings(max_examples=300, deadline=None)
def test_ascii_fast_path_matches_generic(text):
    from lucene_ray.functions.tokenize import _tokenize_ascii, _tokenize_generic

    if text.isascii():
        assert _tokenize_ascii(text) == _tokenize_generic(text)
