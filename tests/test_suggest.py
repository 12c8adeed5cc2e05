"""Suggest module analogues: spell correction + prefix completion
(reference: suggest/.../spell/DirectSpellChecker.java,
suggest/.../suggest/fst/WFSTCompletionLookup.java)."""

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


def _spell_oracle(word: str, max_edits: int, k: int):
    df = _vocab_df()
    cands = []
    for t, d in df.items():
        dist = _levenshtein(t, word)
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
