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


def test_synonym_analyzer_unit():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("synonym:en_nostem_simple:car=auto|vehicle,quick=fast")
    assert an.analyze("the quick car") == ["quick", "fast", "car", "auto", "vehicle"]
    terms, pos = an.analyze_positions("the quick car")
    # synonyms share their original's position (posInc = 0)
    assert list(zip(terms, pos)) == [
        ("quick", 1), ("fast", 1), ("car", 2), ("auto", 2), ("vehicle", 2)
    ]


def test_synonym_index_and_phrase(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader

    name = "synonym:en_nostem_simple:car=auto,auto=car"
    texts = ["fast car on road", "fast auto lane", "slow bike"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = str(tmp_path / "syn")
    cfg = IndexConfig(
        analyzer=name, norm_kind="exact", num_partitions=4, positions=True
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=3)
    r = get_reader(out)
    an = make_analyzer(name)
    # a query for either form matches both docs (same-position expansion)
    for q in ("car", "auto"):
        got = score_exhaustive(r, parse_query(q, an), 10)[0].tolist()
        assert sorted(got) == [0, 1]
    # phrase across the synonym position: "fast car" matches "fast auto"
    got = score_exhaustive(r, parse_query('"fast car"', an), 10)[0].tolist()
    assert sorted(got) == [0, 1]


def test_ascii_folding():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("ascii_folding")
    assert an.analyze("Café Größe naïve") == ["cafe", "grosse", "naive"]
    assert an.analyze("İstanbul Ørsted œuvre") == ["istanbul", "orsted", "oeuvre"]
    assert an.analyze("plain ascii 42") == ["plain", "ascii", "42"]
    # ligature folds stay within one token
    assert an.analyze("straße") == ["strasse"]


def test_cjk_bigram():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("cjk_bigram")
    # adjacent han chars pair into overlapping bigrams
    assert an.analyze("中文分析") == [
        "中文", "文分", "分析"
    ]
    # isolated CJK char -> unigram; latin handled by the simple chain
    assert an.analyze("use 中 here") == ["use", "中", "here"]
    # latin breaks a run into separate bigram groups
    assert an.analyze("中文 and 分析") == [
        "中文", "and", "分析"
    ]
    assert an.analyze("katakana カタ") == ["katakana", "カタ"]


def test_soundex_codes():
    from lucene_ray.functions.analysis import soundex

    # classic published examples
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"  # h transparent between s and c
    assert soundex("Tymczak") == "T522"
    assert soundex("Pfister") == "P236"
    assert soundex("Honeyman") == "H555"


def test_phonetic_analyzer():
    from lucene_ray.functions.analysis import make_analyzer

    inj = make_analyzer("phonetic")
    assert inj.analyze("robert rupert") == ["robert", "R163", "rupert", "R163"]
    rep = make_analyzer("phonetic_replace")
    assert rep.analyze("robert rupert") == ["R163", "R163"]
    # phonetic match through an index-style bag: both names share a code
    assert set(inj.analyze("smith")) & set(inj.analyze("smyth")) == {"S530"}


def test_word_delimiter_goldens():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("word_delimiter")
    # WordDelimiterGraphFilter javadoc examples
    assert an.analyze("PowerShot") == ["power", "shot"]
    assert an.analyze("Wi-Fi") == ["wi", "fi"]
    assert an.analyze("SD500") == ["sd", "500"]
    assert an.analyze("O'Neil's") == ["o", "neil", "s"]
    assert an.analyze("XLDataStream") == ["xl", "data", "stream"]
    # parts take successive positions
    terms, pos = an.analyze_positions("Wi-Fi link")
    assert terms == ["wi", "fi", "link"] and pos == [0, 1, 2]
    # catenate adds the joined form stacked at the first part's position
    cat = make_analyzer("word_delimiter_cat")
    terms, pos = cat.analyze_positions("Wi-Fi link")
    assert terms == ["wi", "fi", "wifi", "link"]
    assert pos == [0, 1, 0, 2]


def test_keyword_repeat_emits_both_forms():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("keyword_repeat")
    terms, pos = an.analyze_positions("the running dog")
    # 'running' -> running + run stacked; 'dog' stems to itself -> once
    assert terms == ["running", "run", "dog"]
    assert pos == [1, 1, 2]


def test_common_grams_stacks_bigrams():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("common_grams")
    terms, pos = an.analyze_positions("coffee of doom")
    assert terms == ["coffee", "coffee_of", "of", "of_doom", "doom"]
    assert pos == [0, 0, 1, 1, 2]
    # no common word adjacent -> unigrams only
    assert an.analyze("coffee doom") == ["coffee", "doom"]


def test_length_and_limit_wrappers():
    from lucene_ray.functions.analysis import make_analyzer

    ln = make_analyzer("length:3:5:simple")
    terms, pos = ln.analyze_positions("a bb ccc dddd eeeee ffffff")
    assert terms == ["ccc", "dddd", "eeeee"]
    assert pos == [2, 3, 4]  # dropped tokens leave position gaps
    lim = make_analyzer("limit:2:simple")
    assert lim.analyze("one two three four") == ["one", "two"]
    # spec round-trips by name (worker reconstruction path)
    assert make_analyzer(ln.name).analyze("ccc x") == ["ccc"]


def test_keep_word_filter():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("keep:data|stream:en_nostem_simple")
    terms, pos = an.analyze_positions("data the big stream data")
    assert terms == ["data", "stream", "data"]
    assert pos == [0, 3, 4]  # dropped tokens leave position gaps
    assert an.analyze("nothing kept here") == []


def test_truncate_filter():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("truncate:3:en_nostem_simple")
    assert an.analyze("datastream over key xy") == ["dat", "ove", "key", "xy"]


def test_elision_filter():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("elision:whitespace")
    terms, pos = an.analyze_positions("l'avion d'or qu'il xyz'q")
    assert terms == ["avion", "or", "il", "xyz'q"]
    assert pos == [0, 1, 2, 3]


def test_capitalization_filter():
    """CapitalizationFilter default: Capitalize words >= minWordLength
    (the factory's own example: minLength 3 -> 'and' capitalizes, 'or'
    stays)."""
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("capitalize:3:whitespace")
    assert an.analyze("and or miXED a") == ["And", "or", "Mixed", "a"]
    an0 = make_analyzer("capitalize:0:whitespace")
    assert an0.analyze("x yZ") == ["X", "Yz"]


def test_fingerprint_filter():
    """FingerprintFilter: one sorted-deduped space-joined output token;
    empty stream emits nothing; identical content in any order yields
    the same fingerprint (the dedup-key property)."""
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("fingerprint:en_nostem_simple")
    a = an.analyze("Beta apple cat apple beta")
    b = an.analyze("cat beta Apple")
    assert a == b == ["apple beta cat"]
    terms, pos = an.analyze_positions("z y")
    assert terms == ["y z"] and pos == [0]
    assert an.analyze("") == []
    # stopwords drop before fingerprinting (the chain composes)
    assert an.analyze("the cat the") == ["cat"]


def test_hyphenated_words_filter():
    """HyphenatedWordsFilter: '-'-terminated tokens join the following
    token at the first part's position; trailing unpaired hyphen is
    restored."""
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("hyphenated:whitespace")
    terms, pos = an.analyze_positions("ecologi- cal niche")
    assert terms == ["ecological", "niche"]
    assert pos == [0, 2]  # consumed part leaves a gap
    # multi-segment join: "a- b- c" -> abc
    assert an.analyze("a- b- c") == ["abc"]
    # unpaired trailing hyphen restored
    assert an.analyze("end-") == ["end-"]
    # plain hyphenless stream unchanged
    assert an.analyze("plain words") == ["plain", "words"]


def test_delimited_term_frequency(ray_session, tmp_path):
    """DelimitedTermFrequencyTokenFilter: term|N contributes N to BOTH
    the term's tf and the field length — verified through a real index
    build (tf, df, dl all annotation-driven)."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.search import get_reader

    from test_engine_oracle import build_from_lists

    an = make_analyzer("termfreq")
    assert an.analyze("apple|3 Pie cherry|1") == \
        ["apple", "apple", "apple", "pie", "cherry"]
    with pytest.raises(ValueError):
        an.analyze("bad|0")
    with pytest.raises(ValueError):
        an.analyze("|5")

    texts = ["apple|3 pie", "apple|1 cherry|4", "pie|2"]
    out = tmp_path / "tfq"
    cfg = IndexConfig(
        analyzer="termfreq", norm_kind="exact", num_partitions=2,
        sample_rate=1.0,
    )
    build_from_lists(out, [0, 1, 2], texts, cfg)
    r = get_reader(str(out))
    df, ttf = r.term_stats("apple")
    assert (df, ttf) == (2, 4)
    df_p, ttf_p = r.term_stats("pie")
    assert (df_p, ttf_p) == (2, 3)
    # field length includes the expanded frequencies: doc0 dl = 3+1
    assert r.sum_total_tf == 4 + 5 + 2
