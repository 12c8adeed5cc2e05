"""SynonymQuery — query-time blended-stats synonyms (reference:
core/.../search/SynonymQuery.java:50,211-229). Dumb-vs-smart over a
random corpus plus the blend's defining properties."""

from __future__ import annotations

import math
import re

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    SynonymQuery,
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists, make_corpus

_TOK = re.compile(r"[a-z0-9]+")
_STOPS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}
K1, B = 1.2, 0.75


@pytest.fixture(scope="module")
def syn_idx(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=250, seed=19)
    out = tmp_path_factory.mktemp("syn") / "idx"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=3,
        sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out), texts


def _brute_synonym(texts, terms):
    kept = [
        [w for w in _TOK.findall(t.lower()) if w not in _STOPS]
        for t in texts
    ]
    n = len(texts)
    dls = [len(k) for k in kept]
    avgdl = sum(dls) / n
    df = {t: sum(1 for k in kept if t in k) for t in terms}
    df_blend = max(df.values())
    if df_blend == 0:
        return {}
    idf = math.log(1.0 + (n - df_blend + 0.5) / (df_blend + 0.5))
    out = {}
    for doc, toks in enumerate(kept):
        tfsum = sum(toks.count(t) for t in terms)
        if tfsum == 0:
            continue
        out[doc] = idf * (
            tfsum / (tfsum + K1 * ((1 - B) + B * dls[doc] / avgdl))
        )
    return out


@pytest.mark.parametrize(
    "terms",
    [("alpha", "beta"), ("kappa", "mu", "nu"), ("alpha", "zzznope"),
     ("running", "quickly")],
)
def test_synonym_vs_brute(syn_idx, terms):
    from lucene_ray.pipelines.search import get_reader

    idx, texts = syn_idx
    reader = get_reader(idx)
    q = SynonymQuery(terms=terms)
    want = _brute_synonym(texts, terms)
    order = sorted(want, key=lambda d: (-want[d], d))[:10]
    d, s = score_exhaustive(reader, q, 10)
    assert d.tolist() == order, terms
    np.testing.assert_allclose(
        np.asarray(s, np.float64), [want[doc] for doc in order],
        rtol=1e-12,
    )
    d2, s2 = score_blockmax(reader, q, 10)
    assert np.array_equal(d, d2) and np.array_equal(
        np.asarray(s), np.asarray(s2)
    )


def test_blend_demotes_rare_synonym(syn_idx):
    """The defining property: a rare synonym scores with the COMMON
    term's (max) df, so its idf is demoted below its standalone idf."""
    from lucene_ray.pipelines.search import get_reader

    idx, texts = syn_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    rare, common = "omega", "alpha"  # omega is tail-of-zipf rare
    d_syn, s_syn = score_exhaustive(
        reader, SynonymQuery(terms=(rare, common)), 200
    )
    d_solo, s_solo = score_exhaustive(reader, parse_query(rare, an), 200)
    solo = dict(zip(d_solo.tolist(), np.asarray(s_solo, np.float64)))
    syn = dict(zip(d_syn.tolist(), np.asarray(s_syn, np.float64)))
    checked = 0
    for doc, sc in solo.items():
        # docs with ONLY the rare term: blended score strictly below solo
        if doc in syn and syn[doc] < sc:
            checked += 1
    assert checked > 0


def test_single_term_synonym_equals_term_query(syn_idx):
    from lucene_ray.pipelines.search import get_reader

    idx, _ = syn_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    d1, s1 = score_exhaustive(reader, SynonymQuery(terms=("alpha",)), 10)
    d2, s2 = score_exhaustive(reader, parse_query("alpha", an), 10)
    assert np.array_equal(d1, d2)
    np.testing.assert_allclose(
        np.asarray(s1, np.float64), np.asarray(s2, np.float64), rtol=0
    )
