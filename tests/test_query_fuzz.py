"""Query-log robustness fuzz (TestBoolean2 / TestWANDScorer pattern at
scale): thousands of randomly generated query strings — well-formed,
nested, signed, quoted, and deliberately mangled — must either raise a
clean ValueError at parse time or execute with score_blockmax ==
score_exhaustive exactly. No crashes, no executor divergence, ever."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists, make_corpus


@pytest.fixture(scope="module")
def fuzz_idx(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=300, seed=23)
    out = tmp_path_factory.mktemp("qfuzz") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0, positions=True,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    from lucene_ray.pipelines.search import get_reader

    return get_reader(str(out))


WORDS = ["alpha", "beta", "gamma", "delta", "kappa", "mu", "running",
         "cities", "the", "zzznope"]
FRAGMENTS = [
    "+", "-", "(", ")", '"', "~1", "~2", "~", "AND", "OR", "NOT", "*",
    "?", "^2", "alp*", "t?u", "gam~1", "/k.ppa/", "[alpha TO mu]",
    "{beta TO omega}", "*:*",
]


def _gen(rng) -> str:
    parts = []
    for _ in range(int(rng.integers(1, 8))):
        r = rng.random()
        if r < 0.5:
            w = str(rng.choice(WORDS))
            sign = str(rng.choice(["", "", "", "+", "-"]))
            parts.append(sign + w)
        elif r < 0.7:
            inner = " ".join(
                str(rng.choice(WORDS + ["+beta", "-mu", '"alpha beta"']))
                for _ in range(int(rng.integers(1, 4)))
            )
            parts.append(str(rng.choice(["", "+", "-"])) + "(" + inner + ")")
        elif r < 0.85:
            a, b = rng.choice(WORDS, size=2)
            slop = str(rng.choice(["", "~1", "~3"]))
            parts.append(
                str(rng.choice(["", "+", "-"])) + f'"{a} {b}"{slop}'
            )
        else:
            parts.append(str(rng.choice(FRAGMENTS)))
    return " ".join(parts)


def test_query_fuzz_no_crash_executors_agree(fuzz_idx):
    an = make_analyzer("standard_en")
    rng = np.random.default_rng(5)
    parsed = rejected = 0
    for _ in range(1500):
        qtext = _gen(rng)
        try:
            q = parse_query(qtext, an)
        except ValueError:
            rejected += 1
            continue  # clean rejection is a valid outcome
        parsed += 1
        d1, s1 = score_exhaustive(fuzz_idx, q, 10)
        d2, s2 = score_blockmax(fuzz_idx, q, 10)
        assert np.array_equal(d1, d2), qtext
        assert np.array_equal(np.asarray(s1), np.asarray(s2)), qtext
    # the generator must actually exercise both paths
    assert parsed >= 600 and rejected >= 50, (parsed, rejected)


def test_malformed_inputs_never_crash(fuzz_idx):
    """Hostile strings: either ValueError or a successful (possibly
    empty) execution — no other exception type escapes."""
    an = make_analyzer("standard_en")
    hostile = [
        "", "   ", "()", "(()", "())(", '"""', '"unclosed', "+", "-",
        "~", "~9", "^", "a^^2", "alpha^x", "[TO]", "[a TO]", "/unclosed",
        "//", "a~5", "a~1.5", ":", "f:", ":(a b)", "f:[1 TO", "*", "?",
        '+("a', "-)", "((((((((((a))))))))))", "a " * 200,
        "élève café", "emoji \U0001f600 query",
        "NOT", "AND OR NOT", "a AND", "(AND)",
    ]
    for qtext in hostile:
        try:
            q = parse_query(qtext, an)
        except ValueError:
            continue
        d1, s1 = score_exhaustive(fuzz_idx, q, 10)
        d2, s2 = score_blockmax(fuzz_idx, q, 10)
        assert np.array_equal(d1, d2), qtext
        assert np.array_equal(np.asarray(s1), np.asarray(s2)), qtext
