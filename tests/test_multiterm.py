"""Multi-term queries (prefix / wildcard / fuzzy): expansion kernels,
parser syntax, and engine-vs-oracle equivalence through both executors
(reference: search/PrefixQuery.java, WildcardQuery.java, FuzzyQuery.java
under MultiTermQuery SCORING_BOOLEAN_REWRITE; parser syntax
queryparser/.../classic/QueryParserBase.java getPrefixQuery/getFuzzyQuery).
"""

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.multiterm import (
    expand,
    levenshtein_within,
    wildcard_regex,
)
from lucene_ray.functions.query import (
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus


def _lev_ref(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp = dp, [i] + [0] * n
        for j in range(1, n + 1):
            dp[j] = min(
                prev[j - 1] + (a[i - 1] != b[j - 1]), prev[j] + 1, dp[j - 1] + 1
            )
    return dp[n]


def test_levenshtein_matches_reference_dp():
    rng = np.random.default_rng(11)
    vocab = sorted(
        {
            "".join(rng.choice(list("abcd"), size=rng.integers(0, 7)))
            for _ in range(300)
        }
        - {""}
    )
    for q in ["abca", "d", "abcd", "dcba", ""]:
        for k in (0, 1, 2):
            got = set(levenshtein_within(vocab, q, k))
            want = {c for c in vocab if _lev_ref(q, c) <= k}
            assert got == want


def test_expand_golden():
    v = sorted(
        ["merge", "merged", "merger", "mix", "customer", "custom", "dup",
         "dupl", "d1p", "dap", "zzz"]
    )
    assert expand("prefix", "mer", 0, v) == ["merge", "merged", "merger"]
    assert expand("prefix", "zzzz", 0, v) == []
    assert expand("wildcard", "d?p", 0, v) == ["d1p", "dap", "dup"]
    assert expand("wildcard", "*er", 0, v) == ["customer", "merger"]
    assert expand("fuzzy", "dup", 1, v) == ["d1p", "dap", "dup", "dupl"]
    assert expand("fuzzy", "dup", 0, v) == ["dup"]
    assert wildcard_regex("a*b?.c") == "a.*b.\\.c"


def test_parser_multi_syntax():
    an = make_analyzer("standard_en")
    q = parse_query("mer* -d?p batch~1 term~", an)
    assert q.multi == (
        ("prefix", "mer", 0, "should"),
        ("wildcard", "d?p", 0, "must_not"),
        ("fuzzy", "batch", 1, "should"),
        ("fuzzy", "term", 2, "should"),
    )
    # patterns lowercase but are not stemmed/stop-filtered
    q2 = parse_query("MERG* The~1", an)
    assert q2.multi == (
        ("prefix", "merg", 0, "should"),
        ("fuzzy", "the", 1, "should"),
    )
    # '+' multi-term clause = required-OR group (nested-boolean rewrite)
    q_must = parse_query("+mer* dup", an)
    assert q_must.multi == (("prefix", "mer", 0, "must"),)
    # /regexp/ syntax (RegexpQuery)
    q_rx = parse_query("/[mb]oat/ -/sc.n/", an)
    assert q_rx.multi == (
        ("regexp", "[mb]oat", 0, "should"),
        ("regexp", "sc.n", 0, "must_not"),
    )
    # regexp expansion against a sorted vocab, incl. alternation (no
    # literal-prefix cut may drop a branch)
    from lucene_ray.functions.multiterm import expand

    vocab = ["batch", "boat", "moat", "scan", "scon", "scratch"]
    assert expand("regexp", "[mb]oat", 0, vocab) == ["boat", "moat"]
    assert expand("regexp", "sc.n|batch", 0, vocab) == ["batch", "scan", "scon"]
    assert expand("regexp", "scr?an", 0, vocab) == ["scan"]
    assert expand("regexp", "zzz+", 0, vocab) == []
    with pytest.raises(ValueError):
        parse_query("mer* AND dup", an)
    # invalid fuzzy distances are rejected, not silently analyzed
    with pytest.raises(ValueError):
        parse_query("term~5", an)
    with pytest.raises(ValueError):
        parse_query("roam~0.8", an)
    # standalone ~N stays minimum_should_match
    q3 = parse_query("alpha beta ~2", an)
    assert q3.minimum_should_match == 2 and not q3.multi


QUERIES = [
    "alp*",                 # prefix
    "omicron* kappa",       # prefix + plain term union
    "r?o",                  # wildcard: rho
    "*ies",                 # leading wildcard: cities ponies (stemmed -> poni/citi? no: nostem corpus terms)
    "zeta~1",               # fuzzy: zeta, eta, beta
    "kappa~2",
    "alpha -bet*",          # must_not expansion
    "zzznope*",             # empty expansion
    "pi~0",                 # exact-only fuzzy
]


@pytest.fixture(scope="module")
def corpus_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=300, seed=13)
    out = tmp_path_factory.mktemp("mt") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    oracle = OracleIndex(doc_ids, texts, analyzer="standard_en")
    return IndexReader(str(out)), oracle


def test_multiterm_engine_matches_oracle(corpus_index):
    reader, oracle = corpus_index
    an = make_analyzer("standard_en")
    for qt in QUERIES:
        q = parse_query(qt, an)
        od, osc = oracle.topk(q, 10)
        for exec_fn in (score_exhaustive, score_blockmax):
            bd, bsc = exec_fn(reader, q, 10)
            assert np.array_equal(od, bd), qt
            assert np.array_equal(
                np.asarray(osc), np.asarray(bsc)
            ), qt


def test_multiterm_sharded_matches_monolithic(tmp_path, ray_session):
    from lucene_ray.pipelines.distributed_search import search_sharded

    doc_ids, texts = make_corpus(n_docs=300, seed=13)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    cut = 120
    build_from_lists(tmp_path / "a", doc_ids[:cut], texts[:cut], cfg)
    build_from_lists(tmp_path / "b", doc_ids[cut:], texts[cut:], cfg)
    build_from_lists(tmp_path / "all", doc_ids, texts, cfg)
    mono = IndexReader(str(tmp_path / "all"))
    an = make_analyzer("standard_en")
    res = search_sharded(
        [str(tmp_path / "a"), str(tmp_path / "b")], QUERIES, k=10
    )
    for i, qt in enumerate(QUERIES):
        md, msc = score_blockmax(mono, parse_query(qt, an), 10)
        assert np.array_equal(md, res[i][0]), qt
        assert np.array_equal(np.asarray(msc), np.asarray(res[i][1])), qt


def test_trange_expand_and_parse():
    # reference: search/TermRangeQuery.java + the classic parser's
    # getRangeQuery ([..] inclusive, {..} exclusive, * open bound)
    from lucene_ray.functions.multiterm import TRANGE_INCL_HI, TRANGE_INCL_LO

    v = ["alpha", "batch", "beta", "data", "dup", "stream", "zzz"]
    both = TRANGE_INCL_LO | TRANGE_INCL_HI
    assert expand("trange", "batch\x00dup", both, v) == ["batch", "beta", "data", "dup"]
    assert expand("trange", "batch\x00dup", 0, v) == ["beta", "data"]
    assert expand("trange", "batch\x00dup", TRANGE_INCL_LO, v) == ["batch", "beta", "data"]
    assert expand("trange", "\x00beta", both, v) == ["alpha", "batch", "beta"]
    assert expand("trange", "stream\x00", both, v) == ["stream", "zzz"]
    assert expand("trange", "zz\x00zza", both, v) == []

    an = make_analyzer("standard_en")
    q = parse_query("[Batch TO Dup] -{x TO z} +[s TO t] key", an)
    assert q.multi == (
        ("trange", "batch\x00dup", both, "should"),
        ("trange", "x\x00z", 0, "must_not"),
        ("trange", "s\x00t", both, "must"),
    )
    assert q.should == ("kei",)  # Porter-stemmed
    # open bounds via '*'
    q2 = parse_query("[m TO *]", an)
    assert q2.multi == (("trange", "m\x00", both, "should"),)
    # numeric doc-values filter syntax is untouched by the term-range rule
    q3 = parse_query("data warc_ts:[100 TO 200]", an)
    assert q3.filters == (("warc_ts", 100, 200),)
    assert q3.multi == ()


def test_trange_engine_matches_oracle(corpus_index):
    reader, oracle = corpus_index
    an = make_analyzer("standard_en")
    for qs in ("[d TO f]", "{b TO d} -zeta", "[p TO *] alpha", "[zz TO zza]"):
        q = parse_query(qs, an)
        od, osc = oracle.topk(q, 10)
        for exec_fn in (score_exhaustive, score_blockmax):
            bd, bsc = exec_fn(reader, q, 10)
            assert np.array_equal(od, bd), qs
            assert np.array_equal(np.asarray(osc), np.asarray(bsc)), qs


def test_parenthesized_term_groups(ray_session, tmp_path):
    """`+(a b)` requires a; `-(a b)` excludes both; bare `(a b)` is flat
    SHOULD — one level of the classic parser's nested boolean."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_blockmax,
        score_exhaustive,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader

    texts = [
        "alpha beta",        # 0
        "alpha gamma",       # 1
        "beta gamma",        # 2
        "delta",             # 3
        "alpha beta delta",  # 4
    ]
    out = str(tmp_path / "gidx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(texts),
    )
    r = get_reader(out)
    an = make_analyzer("en_nostem_simple")

    q = parse_query("+(alpha beta) gamma", an)
    assert q.must_groups == (("alpha", "beta"),)
    assert matching_docs(r, q).tolist() == [0, 1, 2, 4]

    q2 = parse_query("+(alpha beta) +(gamma delta)", an)
    assert matching_docs(r, q2).tolist() == [1, 2, 4]

    q3 = parse_query("alpha -(gamma delta)", an)
    assert matching_docs(r, q3).tolist() == [0]

    # bare group == flat SHOULD
    q4 = parse_query("(alpha beta) delta", an)
    assert q4.must_groups == ()
    assert set(q4.should) == {"alpha", "beta", "delta"}

    # unsatisfiable group -> empty; blockmax == exhaustive on groups
    q5 = parse_query("+(zzz qqq) alpha", an)
    assert matching_docs(r, q5).tolist() == []
    for qq in (q, q2, q3):
        ed, es = score_exhaustive(r, qq, 10)
        bd, bs = score_blockmax(r, qq, 10)
        assert bd.tolist() == ed.tolist() and bs.tolist() == es.tolist()


def test_common_terms_query(ray_session, tmp_path):
    """CommonTermsQuery: low-df terms are the match clause, high-df terms
    only boost; all-high falls back to plain OR; absent terms drop."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.query import common_terms_query, matching_docs
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader

    # 'the0'-ish common term in every doc; 'rare' in one
    texts = ["common rare", "common beta", "common gamma", "common beta"]
    out = str(tmp_path / "ctidx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(texts),
    )
    r = get_reader(out)
    # cutoff 2: rare(df1), beta(df2) low; common(df4), gamma? df1 low too
    q = common_terms_query(r, ["common", "rare"], max_doc_freq=2)
    assert q.must_groups == (("rare",),) and q.should == ("common",)
    assert matching_docs(r, q).tolist() == [0]  # only the rare doc matches

    q2 = common_terms_query(r, ["common"], max_doc_freq=2)
    assert q2.must_groups == () and q2.should == ("common",)
    assert matching_docs(r, q2).tolist() == [0, 1, 2, 3]  # fallback OR

    q3 = common_terms_query(r, ["common", "zzz", "beta"], max_doc_freq=2)
    assert q3.must_groups == (("beta",),)  # zzz dropped
    assert matching_docs(r, q3).tolist() == [1, 3]

    q4 = common_terms_query(r, ["rare", "beta"], max_doc_freq=3)
    assert q4.must_groups == (("rare", "beta"),)  # all low: any-of
    assert matching_docs(r, q4).tolist() == [0, 1, 3]


def test_group_rejects_multiterm_syntax():
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query

    an = make_analyzer("en_nostem_simple")
    for qs in ("+(pre* x)", "(a? b)", "-(x ~2)"):
        with pytest.raises(ValueError, match="multi-term syntax"):
            parse_query(qs, an)
    # set filters with a colon are untouched by the group guard
    q = parse_query("lang:(en de) key", an)
    assert q.filters and q.should == ("key",)


def test_phrase_wildcard_query(ray_session, tmp_path):
    """PhraseWildcardQuery (sandbox/.../PhraseWildcardQuery.java): slot
    expansion against the dictionary, MultiPhraseQuery execution,
    MatchNoDocs on a zero-expansion slot, and the maxMultiTermExpansions
    cap."""
    from lucene_ray.functions.multiterm import phrase_wildcard_query
    from lucene_ray.functions.query import MultiPhrase
    from lucene_ray.pipelines.search import get_reader

    texts = [
        "hash join wins",
        "hatch join now",
        "hash joint effort",
        "data stream flows",
        "hash join hash join",
        "plain filler text",
    ]
    out = tmp_path / "pw"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, list(range(len(texts))), texts, cfg)
    reader = get_reader(str(out))

    q = phrase_wildcard_query(
        [("prefix", "ha"), ("term", "join")], reader.expand_multi
    )
    assert q.term_arrays == (("hash", "hatch"), ("join",))
    assert q.offsets == (0, 1)
    d, s = score_exhaustive(reader, q, 10)
    assert set(d.tolist()) == {0, 1, 4}
    # identical to the hand-built MultiPhrase and to the pruned executor
    qm = MultiPhrase(term_arrays=(("hash", "hatch"), ("join",)),
                     offsets=(0, 1))
    dm, sm = score_exhaustive(reader, qm, 10)
    assert np.array_equal(d, dm) and np.array_equal(
        np.asarray(s), np.asarray(sm)
    )
    db, sb = score_blockmax(reader, q, 10)
    assert np.array_equal(d, db) and np.array_equal(
        np.asarray(s), np.asarray(sb)
    )
    # doc 4 has pf=2 -> must outrank the single-occurrence docs
    assert d[0] == 4

    # zero-expansion slot -> MatchNoDocsQuery analogue
    assert phrase_wildcard_query(
        [("prefix", "zzzz"), ("term", "join")], reader.expand_multi
    ) is None

    # maxMultiTermExpansions cap slices the lexicographic expansion
    qc = phrase_wildcard_query(
        [("prefix", "ha"), ("term", "join")], reader.expand_multi,
        max_expansions=1,
    )
    assert qc.term_arrays[0] == ("hash",)

    # sorted-vocabulary expander (the brute/test path) agrees
    vocab = sorted(
        {w for t in texts for w in t.split() if w not in ("now",)}
    )
    qv = phrase_wildcard_query([("prefix", "ha"), ("term", "join")], vocab)
    assert qv.term_arrays[0] == ("hash", "hatch")

    # fuzzy slot expands through the same path
    qf = phrase_wildcard_query(
        [("fuzzy", "hask", 1), ("term", "join")], reader.expand_multi
    )
    assert "hash" in qf.term_arrays[0]


def test_leading_wildcard_reversed_dictionary(corpus_index, ray_session):
    """Leading-wildcard patterns with a literal suffix scan the reversed
    dictionary (ReverseStringFilter trick) — results must be IDENTICAL
    to the unaccelerated full-vocabulary walk, including caps and
    ordering."""
    from lucene_ray.functions.multiterm import expand, literal_suffix

    reader, oracle = corpus_index
    # per-segment parity: accelerated vs plain on real segment vocabs
    for g in range(reader.num_partitions):
        seg = reader._segment(g)
        if seg is None:
            continue
        vocab = seg.sorted_terms()
        rvocab = seg.reversed_terms()
        assert rvocab == sorted(t[::-1] for t in vocab)
        for pat in ("*a", "*ta", "?lpha", "*lph?", "*z", "*", "*?a"):
            fast = expand("wildcard", pat, 0, vocab, rvocab=rvocab)
            slow = expand("wildcard", pat, 0, vocab)
            assert fast == slow, (g, pat)
    # reader-level: full queries agree with the oracle (expansion path
    # engaged through expand_multi)
    an = make_analyzer("standard_en")
    for qt in ("*ta", "*a kappa", "-*ta alpha"):
        q = parse_query(qt, an)
        od, osc = oracle.topk(q, 10)
        bd, bsc = score_blockmax(reader, q, 10)
        assert np.array_equal(od, bd), qt
        assert np.array_equal(np.asarray(osc), np.asarray(bsc)), qt
    assert literal_suffix("*ing") == "ing"
    assert literal_suffix("ab*") == ""
    assert literal_suffix("a*b?c") == "c"


def test_reverse_analyzer():
    """reverse: wrapped analyzer = ReverseStringFilter semantics."""
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("reverse:en_nostem_simple")
    terms, pos = an.analyze_positions("Hello stream the")
    assert terms == ["olleh", "maerts"]  # stopword dropped, then reversed
    assert an.analyze("abc") == ["cba"]


def test_parse_complex_phrase(ray_session, tmp_path):
    """ComplexPhraseQueryParser subset: wildcard/prefix/fuzzy words
    inside quotes become multiterm slots; plain words analyze; stopword
    words drop with slots closing ranks; malformed inputs raise."""
    from lucene_ray.functions.multiterm import (
        parse_complex_phrase,
        phrase_wildcard_query,
    )

    an = make_analyzer("en_nostem_simple")
    assert parse_complex_phrase('"data str*"', an) == [
        ("term", "data"), ("prefix", "str")
    ]
    assert parse_complex_phrase('"d?ta STREAM"', an) == [
        ("wildcard", "d?ta"), ("term", "stream")
    ]
    assert parse_complex_phrase('"tabel~1 merge"', an) == [
        ("fuzzy", "tabel", 1), ("term", "merge")
    ]
    assert parse_complex_phrase('"word~ x*y"', an) == [
        ("fuzzy", "word", 2), ("wildcard", "x*y")
    ]
    # stopword drops, ranks close
    assert parse_complex_phrase('"data the str*"', an) == [
        ("term", "data"), ("prefix", "str")
    ]
    for bad in ('"one"', '"the a"', '"~2 x"'):
        with pytest.raises(ValueError):
            parse_complex_phrase(bad, an)

    # end-to-end: parsed phrase == hand-built slots through the executor
    texts = ["hash join wins", "hash joint", "hash join hash join",
             "data stream", "plain filler"]
    out = tmp_path / "cpx"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, list(range(len(texts))), texts, cfg)
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(str(out))
    q = phrase_wildcard_query(
        parse_complex_phrase('"hash jo*"', an), reader.expand_multi
    )
    d, s = score_exhaustive(reader, q, 10)
    assert set(d.tolist()) == {0, 1, 2}
