"""Suggest module analogues: spell correction + prefix completion
(reference: suggest/.../spell/DirectSpellChecker.java,
suggest/.../suggest/fst/WFSTCompletionLookup.java)."""

import pyarrow as pa
import pytest

from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.suggest import complete_prefix, spell_suggest

CFG = IndexConfig(analyzer="en_nostem_simple", norm_kind="exact")

DOCS = [
    "stream stream stream processing",
    "stream data data data data",
    "strewn straw streams",
    "battle bottle cattle rattle",
    "key keys kelp kept",
    "data date gate fate",
]


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _vocab_df():
    """Brute-force (term -> doc_freq) under the same analyzer semantics
    (lowercase alnum tokens, stopwords removed) as en_nostem_simple."""
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("en_nostem_simple")
    df = {}
    for text in DOCS:
        for t in set(an.analyze(text)):
            df[t] = df.get(t, 0) + 1
    return df


def _ds():
    import ray.data

    return ray.data.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(DOCS)]
    ).repartition(3)


def _spell_oracle(word: str, max_edits: int, k: int,
                  transpositions=True):
    metric = _full_dl if transpositions else _levenshtein
    df = _vocab_df()
    cands = []
    for t, d in df.items():
        dist = metric(t, word)
        if 1 <= dist <= max_edits:
            cands.append((dist, -d, t))
    cands.sort()
    return [(t, dist, -neg) for dist, neg, t in cands[:k]]


@pytest.mark.parametrize("word,max_edits", [
    ("streem", 2), ("stream", 2), ("datta", 1), ("kye", 2), ("botl", 2),
    ("zzzzzzzz", 2),
])
def test_spell_vs_bruteforce(ray_session, word, max_edits):
    out = spell_suggest(_ds(), [word], max_edits=max_edits, k=5, cfg=CFG)
    got = sorted(out.to_pandas().itertuples(index=False), key=lambda r: r.rank)
    want = _spell_oracle(word, max_edits, 5)
    assert [(r.term, r.dist, r.df) for r in got] == want
    assert [r.rank for r in got] == list(range(1, len(want) + 1))
    # the input itself is never suggested
    assert word not in [r.term for r in got]


def test_spell_multi_word_and_min_df(ray_session):
    out = spell_suggest(
        _ds(), ["streem", "datta"], max_edits=2, k=3, min_df=2, cfg=CFG
    ).to_pandas()
    df = _vocab_df()
    for _, row in out.iterrows():
        assert df[row["term"]] >= 2
    assert set(out["query_id"]) <= {0, 1}


def test_spell_rejects_bad_max_edits(ray_session):
    with pytest.raises(ValueError):
        spell_suggest(_ds(), ["x"], max_edits=3, cfg=CFG)


def test_spell_transpositions_default(ray_session):
    """An adjacent swap is ONE edit under the DirectSpellChecker default
    (FuzzyTermsEnum transpositions=true); classic Levenshtein needs 2."""
    out = spell_suggest(_ds(), ["kyes"], max_edits=1, k=5, cfg=CFG)
    got = out.to_pandas().sort_values("rank")
    assert "keys" in set(got["term"]) and (got["dist"] == 1).all()
    assert [(r.term, r.dist, r.df) for r in got.itertuples(index=False)] \
        == _spell_oracle("kyes", 1, 5)
    out_l = spell_suggest(
        _ds(), ["kyes"], max_edits=1, k=5, transpositions=False, cfg=CFG
    ).to_pandas()
    assert _spell_oracle("kyes", 1, 5, transpositions=False) == []
    assert len(out_l) == 0  # 0-row to_pandas loses schema (Ray quirk)


def test_prefix_completion_ordering(ray_session):
    out = complete_prefix(_ds(), ["st", "ke", "qqq"], k=4, cfg=CFG)
    pdf = out.to_pandas()
    df = _vocab_df()
    for qid, prefix in [(0, "st"), (1, "ke")]:
        got = pdf[pdf.query_id == qid].sort_values("rank")
        want = sorted(
            ((t, d) for t, d in df.items() if t.startswith(prefix)),
            key=lambda td: (-td[1], td[0]),
        )[:4]
        assert list(zip(got["term"], got["df"])) == want
    # no completions for an unmatched prefix
    assert (pdf.query_id == 2).sum() == 0


def test_prefix_edit_distance_vs_model():
    from lucene_ray.functions.multiterm import prefix_edit_distance

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            ndp = [i]
            for j, cb in enumerate(b, 1):
                ndp.append(min(ndp[-1] + 1, dp[j] + 1, dp[j - 1] + (ca != cb)))
            dp = ndp
        return dp[-1]

    cands = ["stream", "store", "strange", "zebra", "st", "s",
             "streaming", "xstream", "strem"]
    for p in ("strem", "stor", "zzz", "stream"):
        got = prefix_edit_distance(cands, p, 1)
        want = {}
        for c in cands:
            d = min(lev(c[:m], p) for m in range(1, len(c) + 1))
            if d <= 1:
                want[c] = d
        assert got == want, p


def _full_dl(a, b):
    """Unrestricted (Lowrance-Wagner) Damerau-Levenshtein — the metric
    DuckDB's damerau_levenshtein computes."""
    maxd = len(a) + len(b)
    da = {}
    H = [[maxd] * (len(b) + 2) for _ in range(len(a) + 2)]
    for i in range(len(a) + 1):
        H[i + 1][1] = i
    for j in range(len(b) + 1):
        H[1][j + 1] = j
    for i in range(1, len(a) + 1):
        db = 0
        for j in range(1, len(b) + 1):
            i1 = da.get(b[j - 1], 0)
            j1 = db
            cost = 1
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            H[i + 1][j + 1] = min(
                H[i][j] + cost, H[i + 1][j] + 1, H[i][j + 1] + 1,
                H[i1][j1] + (i - i1 - 1) + 1 + (j - j1 - 1),
            )
        da[a[i - 1]] = i
    return H[len(a) + 1][len(b) + 1]


def _fuzzy_oracle(prefix, k, max_edits=1, non_fuzzy_prefix=1,
                  min_fuzzy_length=3, min_df=1, transpositions=True):
    """Brute-force FuzzySuggester model over the same vocab."""
    metric = _full_dl if transpositions else _levenshtein
    df = _vocab_df()
    p = prefix.lower()
    cands = []
    for t, d in df.items():
        if d < min_df:
            continue
        if len(p) < min_fuzzy_length:
            if t.startswith(p):
                cands.append((0, -d, t))
            continue
        if not t.startswith(p[:non_fuzzy_prefix]):
            continue
        dist = min(metric(t[:m], p) for m in range(1, len(t) + 1))
        if dist <= max_edits:
            cands.append((dist, -d, t))
    cands.sort()
    return [(t, dist, -neg) for dist, neg, t in cands[:k]]


def test_complete_fuzzy_vs_bruteforce(ray_session):
    from lucene_ray.pipelines.suggest import complete_fuzzy

    prefixes = ["strem", "st", "dta", "qqqq"]
    out = complete_fuzzy(_ds(), prefixes, k=5, cfg=CFG).to_pandas()
    for qid, p in enumerate(prefixes):
        got = out[out.query_id == qid].sort_values("rank")
        want = _fuzzy_oracle(p, 5)
        assert [
            (r.term, r.dist, r.df)
            for r in got.itertuples(index=False)
        ] == want, p
    # 'strem' fuzz-matches the 'stream*' family at dist<=1
    q0 = out[out.query_id == 0]
    assert "stream" in set(q0["term"])
    assert (q0["dist"] <= 1).all()
    # short input -> exact-prefix-only (min_fuzzy_length gate)
    q1 = out[out.query_id == 1]
    assert (q1["dist"] == 0).all()
    assert all(t.startswith("st") for t in q1["term"])


def test_complete_fuzzy_knobs(ray_session):
    from lucene_ray.pipelines.suggest import complete_fuzzy

    # non_fuzzy_prefix=2 kills candidates whose 2nd char differs
    out = complete_fuzzy(
        _ds(), ["dta"], k=5, non_fuzzy_prefix=2, cfg=CFG
    ).to_pandas()
    assert _fuzzy_oracle("dta", 5, non_fuzzy_prefix=2) == []
    assert len(out) == 0
    # ... while non_fuzzy_prefix=1 (default) finds the 'da*' family
    out1 = complete_fuzzy(_ds(), ["dta"], k=5, cfg=CFG).to_pandas()
    want = _fuzzy_oracle("dta", 5)
    assert want and [
        (r.term, r.dist, r.df) for r in
        out1.sort_values("rank").itertuples(index=False)
    ] == want
    # min_df filters rare completions
    out2 = complete_fuzzy(_ds(), ["strem"], k=5, min_df=2, cfg=CFG).to_pandas()
    dfv = _vocab_df()
    assert len(out2) > 0
    assert all(dfv[t] >= 2 for t in out2["term"])
    # transpositions (the reference default): an adjacent swap is ONE
    # edit — 'srteam' completes to the stream* family at dist 1; classic
    # Levenshtein (transpositions=False) needs 2 edits and finds nothing
    out3 = complete_fuzzy(_ds(), ["srteam"], k=5, cfg=CFG).to_pandas()
    assert "stream" in set(out3["term"]) and (out3["dist"] == 1).all()
    assert [
        (r.term, r.dist, r.df) for r in
        out3.sort_values("rank").itertuples(index=False)
    ] == _fuzzy_oracle("srteam", 5)
    out4 = complete_fuzzy(
        _ds(), ["srteam"], k=5, transpositions=False, cfg=CFG
    ).to_pandas()
    assert _fuzzy_oracle("srteam", 5, transpositions=False) == []
    assert len(out4) == 0


def test_freetext_suggest(ray_session):
    """Word-bigram stupid-backoff completion vs brute counts."""
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.suggest import FREETEXT_ALPHA, freetext_suggest

    texts = [
        "data stream data store",
        "data stream data stream",
        "hash join order",
        "the data value",          # stopword collapses: data->value bigram
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(analyzer="en_nostem_simple", norm_kind="exact")
    out = freetext_suggest(
        ray.data.from_arrow(tbl),
        [("data", "st"), ("data", "v"), ("zzz", "ha")],
        k=5, cfg=cfg,
    ).to_pandas()
    q0 = out[out.query_id == 0].sort_values("rank")
    # bigrams after 'data': stream x3, store x1, value x1 (ctx_total 5)
    assert list(q0.term) == ["stream", "store"]
    assert list(q0.score) == [3 / 5, 1 / 5]
    q1 = out[out.query_id == 1]
    assert list(q1.term) == ["value"] and list(q1.score) == [1 / 5]
    # unseen context -> unigram backoff, ALPHA-scaled
    q2 = out[out.query_id == 2].sort_values("rank")
    total = 4 + 1 + 2 + 1 + 1 + 1 + 1 + 1  # data4 store1 stream... recompute below
    import re as _re
    toks = [w for t in texts for w in _re.findall(r"[a-z0-9]+", t.lower())
            if w not in ("the",)]
    import collections
    uni = collections.Counter(toks)
    want = FREETEXT_ALPHA * uni["hash"] / sum(uni.values())
    assert list(q2.term) == ["hash"]
    # the pipeline rounds scores to 6 digits
    assert q2.score.iloc[0] == pytest.approx(round(want, 6), abs=1e-9)


def test_complete_prefix_context(ray_session):
    """ContextQuery: the SAME prefix ranks by the df WITHIN the query's
    context; out-of-context docs never leak in; unknown context or
    prefix yields nothing."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.suggest import complete_prefix_context

    rows = [
        ("stream stock stream", "en"),
        ("stream stone", "en"),
        ("stock stock", "de"),
        ("stone stock stone", "de"),
        ("strange", "fr"),
    ]
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(rows)), pa.int64()),
                "text": pa.array([t for t, _ in rows], pa.string()),
                "lang": pa.array([c for _, c in rows], pa.string()),
            }
        )
    )
    cfg = IndexConfig(analyzer="en_nostem_simple", norm_kind="exact")
    got = complete_prefix_context(
        ds,
        [("st", "en"), ("st", "de"), ("st", "it"), ("zz", "en")],
        context_col="lang", k=5, cfg=cfg,
    ).take_all()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["term"], r["df"]))
    # en: stream df2, stock df1, stone df1 -> (df desc, term asc)
    assert by_q[0] == [("stream", 2), ("stock", 1), ("stone", 1)]
    # de: stock df2, stone df1 — stream absent in-context
    assert by_q[1] == [("stock", 2), ("stone", 1)]
    assert 2 not in by_q and 3 not in by_q
