"""Multi-field indexing + field-scoped search vs a brute-force model.

Reference analogues: per-field postings/norms/stats (index/FieldInfos.java,
search/CollectionStatistics.java), TermQuery(new Term(field, text)),
MultiFieldQueryParser unscoped-clause expansion
(queryparser/.../classic/MultiFieldQueryParser.java).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest

K1, B = 1.2, 0.75

TITLES = [
    "alpha report",
    "beta summary",
    "gamma overview",
    "alpha beta notes",
    "delta digest",
    "",
    "gamma gamma focus",
    "beta delta",
]
BODIES = [
    "alpha beta gamma delta",
    "alpha beta",
    "gamma delta delta",
    "beta beta gamma",
    "alpha",
    "delta gamma beta",
    "alpha alpha delta",
    "gamma",
]
FIELDS = {"title": TITLES, "body": BODIES}


@pytest.fixture(scope="module")
def mf_root(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.multifield import build_multifield_index

    out = str(tmp_path_factory.mktemp("mf") / "root")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(BODIES)), pa.int64()),
            "title": pa.array(TITLES, pa.string()),
            "body": pa.array(BODIES, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_multifield_index(
        ray.data.from_arrow(docs),
        out,
        {"title": "title", "body": "body"},
        cfg,
        doc_count=len(BODIES),
        default_fields=["title", "body"],
    )
    return out


def _model_score(field: str, term: str):
    """Brute-force per-field BM25 (float64): {doc: score}."""
    texts = FIELDS[field]
    toks = [t.split() for t in texts]
    n = len(texts)
    dls = [len(tk) for tk in toks]
    avgdl = sum(dls) / n
    df = sum(1 for tk in toks if term in tk)
    if df == 0:
        return {}
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    out = {}
    for d, tk in enumerate(toks):
        tf = tk.count(term)
        if tf:
            out[d] = idf * (
                tf / (tf + K1 * ((1 - B) + B * dls[d] / avgdl))
            )
    return out


def _model_query(clauses, groups, k=10):
    """clauses: (field, term, role); groups: tuples of (field, term)."""
    scoring = dict.fromkeys(
        [(f, t) for f, t, role in clauses if role in ("must", "should")]
        + [p for g in groups for p in g]
    )
    acc = {}
    for f, t in scoring:
        for d, s in _model_score(f, t).items():
            acc[d] = acc.get(d, 0.0) + s
    cand = set(acc)
    for f, t, role in clauses:
        if role == "must":
            cand &= set(_model_score(f, t))
        elif role == "must_not":
            cand -= set(_model_score(f, t))
    for g in groups:
        union = set()
        for f, t in g:
            union |= set(_model_score(f, t))
        cand &= union
    ranked = sorted(cand, key=lambda d: (-acc[d], d))[:k]
    return ranked, [acc[d] for d in ranked]


CASES = [
    ("title:alpha", [("title", "alpha", "should")], []),
    (
        "beta",
        [("title", "beta", "should"), ("body", "beta", "should")],
        [],
    ),
    (
        "+delta gamma",
        [("title", "gamma", "should"), ("body", "gamma", "should")],
        [(("title", "delta"), ("body", "delta"))],
    ),
    (
        "alpha -title:beta",
        [
            ("title", "alpha", "should"),
            ("body", "alpha", "should"),
            ("title", "beta", "must_not"),
        ],
        [],
    ),
    (
        "gamma -delta",
        [
            ("title", "gamma", "should"),
            ("body", "gamma", "should"),
            ("title", "delta", "must_not"),
            ("body", "delta", "must_not"),
        ],
        [],
    ),
    ("+body:alpha title:gamma",
     [("body", "alpha", "must"), ("title", "gamma", "should")], []),
    ("zzzmissing", [("title", "zzzmissing", "should"),
                    ("body", "zzzmissing", "should")], []),
    # overlap: the same (field, term) pair as both SHOULD and group member
    # must score exactly once (dedupe convention)
    (
        "+gamma gamma",
        [("title", "gamma", "should"), ("body", "gamma", "should")],
        [(("title", "gamma"), ("body", "gamma"))],
    ),
]


def test_parse_multifield(mf_root):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.pipelines.multifield import parse_multifield

    an = make_analyzer("en_nostem_simple")
    for text, clauses, groups in CASES:
        q = parse_multifield(text, an, ["title", "body"])
        assert sorted(q.scoped) == sorted(clauses), text
        assert sorted(q.groups) == sorted(
            tuple(g) for g in groups
        ), text


def test_multifield_vs_model(mf_root):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.pipelines.multifield import (
        MultiFieldReader,
        parse_multifield,
        search_multifield,
    )

    an = make_analyzer("en_nostem_simple")
    mf = MultiFieldReader(mf_root)
    assert mf.fields == ["body", "title"]
    for text, clauses, groups in CASES:
        q = parse_multifield(text, an, ["title", "body"])
        docs, scores = search_multifield(mf, q, k=10, k1=K1, b=B)
        mdocs, mscores = _model_query(clauses, groups)
        assert list(docs) == mdocs, text
        np.testing.assert_allclose(scores, mscores, rtol=1e-12)


def test_per_field_stats_differ(mf_root):
    """df/avgdl come from the FIELD, not the whole document — the same
    term must score differently per field (per-field CollectionStatistics)."""
    from lucene_ray.pipelines.multifield import MultiFieldReader

    mf = MultiFieldReader(mf_root)
    rt, rb = mf.reader("title"), mf.reader("body")
    assert rt.sum_total_tf != rb.sum_total_tf
    assert rt.term_stats("gamma") != rb.term_stats("gamma")
    assert rt.doc_count == rb.doc_count == len(BODIES)


def _model_combined(terms, weights, k=10, k1=K1, b=B):
    """Brute-force BM25F-simple over FIELDS: tf' = sum w_f*tf_f,
    dl' = sum w_f*dl_f, df' over the union, avgdl' = weighted token
    mass / N."""
    n = len(BODIES)
    toks = {f: [t.split() for t in FIELDS[f]] for f in weights}
    dlc = [
        sum(w * len(toks[f][d]) for f, w in weights.items())
        for d in range(n)
    ]
    avgdl = sum(dlc) / n
    acc = {}
    for term in dict.fromkeys(terms):
        tfc = {
            d: sum(
                w * toks[f][d].count(term) for f, w in weights.items()
            )
            for d in range(n)
        }
        tfc = {d: v for d, v in tfc.items() if v > 0}
        if not tfc:
            continue
        df = len(tfc)
        idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
        for d, tf in tfc.items():
            s = idf * (tf / (tf + k1 * ((1 - b) + b * dlc[d] / avgdl)))
            acc[d] = acc.get(d, 0.0) + s
    ranked = sorted(acc, key=lambda d: (-acc[d], d))[:k]
    return ranked, [acc[d] for d in ranked]


def test_combined_field_vs_model(mf_root):
    from lucene_ray.pipelines.multifield import (
        MultiFieldReader,
        search_combined,
    )

    mf = MultiFieldReader(mf_root)
    weights = {"title": 2.0, "body": 1.0}
    for terms in [
        ["alpha"],
        ["gamma"],             # heavier in title (w=2) than body
        ["beta", "delta"],
        ["alpha", "zzz"],
        ["zzz"],
    ]:
        docs, scores = search_combined(mf, terms, weights, k=10)
        mdocs, mscores = _model_combined(terms, weights)
        assert list(docs) == mdocs, terms
        np.testing.assert_allclose(scores, mscores, rtol=1e-12)


def test_combined_field_weights_matter(mf_root):
    """Raising the title weight must re-rank a title-heavy doc above a
    body-heavy doc for the same term."""
    from lucene_ray.pipelines.multifield import (
        MultiFieldReader,
        search_combined,
    )

    mf = MultiFieldReader(mf_root)
    lo, _ = search_combined(mf, ["gamma"], {"title": 1.0, "body": 1.0})
    hi, _ = search_combined(mf, ["gamma"], {"title": 5.0, "body": 1.0})
    # doc 6 ("gamma gamma focus" title) must win under the high weight
    assert hi[0] == 6
    assert list(lo) != list(hi)


def test_unknown_field_raises(mf_root):
    from lucene_ray.pipelines.multifield import MultiFieldReader

    with pytest.raises(KeyError):
        MultiFieldReader(mf_root).reader("nope")
