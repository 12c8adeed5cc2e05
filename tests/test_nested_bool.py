"""Arbitrary-depth nested boolean queries with phrases inside groups
(reference: queryparser/.../classic/QueryParserBase.java full Clause ->
'(' Query ')' recursion + BooleanQuery nesting PhraseQuery).

Checked three ways: parser structure goldens, engine vs a from-scratch
python evaluator implementing the same NestedQuery semantics (dumb-vs-
smart, float64 'exact' norm chain), and nested-vs-flat equivalence on
queries both grammars express.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    MixedQuery,
    NestedQuery,
    PhraseQuery,
    parse_query,
    query_terms,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists

_TOK = re.compile(r"[a-z0-9]+")
_STOPS = {
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with",
}
K1, B = 1.2, 0.75

WORDS = [
    "alpha", "beta", "gamma", "delta", "epsilon", "kappa", "mu", "nu",
    "xi", "the", "of", "and",
]

QUERIES = [
    "+(alpha (beta gamma)) delta",
    '+("alpha beta" gamma) -delta',
    '(("kappa mu") (nu xi)) alpha',
    '-(alpha ("beta gamma")) kappa',
    "+((alpha beta) (gamma delta)) +(kappa mu)",
    '"alpha beta" +(gamma (delta epsilon))',
    "((alpha))",
    '+(kappa ("mu nu" xi)) (alpha beta)',
]


def _corpus(n_docs=300, seed=11):
    rng = np.random.default_rng(seed)
    probs = 1.0 / np.arange(1, len(WORDS) + 1) ** 1.2
    probs /= probs.sum()
    texts = []
    for _ in range(n_docs):
        dl = int(rng.integers(0, 40))
        texts.append(" ".join(rng.choice(WORDS, size=dl, p=probs)))
    texts[0] = ""
    texts[1] = "the and of"
    texts[2] = "alpha beta alpha beta gamma"
    return list(range(n_docs)), texts


@pytest.fixture(scope="module")
def nested_idx(tmp_path_factory, ray_session):
    doc_ids, texts = _corpus()
    out = tmp_path_factory.mktemp("nested") / "idx"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=3,
        positions=True, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out), texts


# ---------------------------------------------------------------------------
# From-scratch python evaluator (the dumb side)
# ---------------------------------------------------------------------------


class Brute:
    def __init__(self, texts):
        self.tokens = [_TOK.findall(t.lower()) for t in texts]
        self.kept = [
            [w for w in toks if w not in _STOPS] for toks in self.tokens
        ]
        self.n_docs = len(texts)
        self.dls = [len(k) for k in self.kept]
        self.avgdl = sum(self.dls) / self.n_docs
        self.df = {}
        for k in self.kept:
            for w in set(k):
                self.df[w] = self.df.get(w, 0) + 1

    def idf(self, term):
        df = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def term_score(self, doc, term):
        tf = self.kept[doc].count(term)
        if tf == 0:
            return None
        dl = self.dls[doc]
        return self.idf(term) * (
            tf / (tf + K1 * ((1 - B) + B * dl / self.avgdl))
        )

    def phrase_freq(self, doc, ph: PhraseQuery):
        toks = self.tokens[doc]
        pos = {
            t: [i for i, w in enumerate(toks) if w == t] for t in ph.terms
        }
        anchors = set()
        for a in pos[ph.terms[0]]:
            if all(
                (a - ph.offsets[0] + off) in pos[t]
                for t, off in zip(ph.terms, ph.offsets)
            ):
                anchors.add(a - ph.offsets[0])
        return len(anchors)

    def phrase_score(self, doc, ph: PhraseQuery):
        if any(self.df.get(t, 0) == 0 for t in ph.terms):
            return None
        pf = self.phrase_freq(doc, ph)
        if pf == 0:
            return None
        idf = sum(self.idf(t) for t in ph.terms)
        dl = self.dls[doc]
        return idf * (pf / (pf + K1 * ((1 - B) + B * dl / self.avgdl)))

    def eval_flat(self, q: BooleanQuery):
        """doc -> score for the flat boolean part (no multi/filters)."""
        out = {}
        for doc in range(self.n_docs):
            kept = set(self.kept[doc])
            if any(t not in kept for t in q.must):
                continue
            if any(t in kept for t in q.must_not):
                continue
            if any(all(t not in kept for t in g) for g in q.must_groups):
                continue
            n_should = sum(1 for t in q.should if t in kept)
            if not q.must and not q.must_groups:
                if n_should < max(1, q.minimum_should_match):
                    continue
            elif q.minimum_should_match and n_should < q.minimum_should_match:
                continue
            # Lucene clause semantics: a term appearing both as a bare
            # SHOULD clause and inside a required-OR group is TWO clauses
            # and scores twice (the engine builds separate cursors); the
            # base must/should set is deduped, each group separately.
            s = 0.0
            for t in sorted(set(q.must) | {t for t in q.should
                                           if t in kept}):
                ts = self.term_score(doc, t)
                if ts is not None:
                    s += ts
            for g in q.must_groups:
                for t in sorted(set(g)):
                    if t in kept:
                        ts = self.term_score(doc, t)
                        if ts is not None:
                            s += ts
            out[doc] = s
        return out

    def eval(self, q):
        if isinstance(q, BooleanQuery):
            if not (q.must or q.should or q.must_groups):
                return {}
            return self.eval_flat(q)
        if isinstance(q, PhraseQuery):
            out = {}
            for doc in range(self.n_docs):
                s = self.phrase_score(doc, q)
                if s is not None:
                    out[doc] = s
            return out
        if isinstance(q, MixedQuery):
            clauses = [(role, self.eval(ph)) for ph, role in q.phrases]
            return self.combine(q.base, clauses)
        if isinstance(q, NestedQuery):
            clauses = [(role, self.eval(c)) for role, c in q.children]
            return self.combine(q.base, clauses)
        raise TypeError(q)

    def combine(self, base: BooleanQuery, clauses):
        must_c = [d for role, d in clauses if role == "must"]
        should_c = [d for role, d in clauses if role == "should"]
        not_c = [d for role, d in clauses if role == "must_not"]
        pos_base = BooleanQuery(
            must=base.must, should=base.should,
            must_groups=base.must_groups,
        )
        not_docs = set().union(*[set(d) for d in not_c]) if not_c else set()
        if base.must_not:
            not_docs |= set(
                self.eval_flat(BooleanQuery(should=tuple(base.must_not)))
            )
        has_base = bool(pos_base.must or pos_base.should
                        or pos_base.must_groups)
        base_required = bool(pos_base.must or pos_base.must_groups) or (
            bool(pos_base.should) and not must_c and not should_c
        )
        base_scored = self.eval_flat(pos_base) if has_base else {}
        cand = None
        req = [set(d) for d in must_c]
        if base_required:
            req.append(set(base_scored))
        if req:
            cand = set.intersection(*req)
        else:
            cand = set().union(*[set(d) for d in should_c], set(base_scored))
        cand -= not_docs
        out = {}
        for doc in cand:
            s = base_scored.get(doc, 0.0)
            for d in must_c:
                s += d[doc]
            for d in should_c:
                s += d.get(doc, 0.0)
            out[doc] = s
        return out


# ---------------------------------------------------------------------------
# Tests
# ---------------------------------------------------------------------------


def test_parser_structures():
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+("alpha beta" gamma) delta', an)
    assert isinstance(q, NestedQuery)
    assert q.base.should == ("delta",)
    (role, child), = q.children
    assert role == "must" and isinstance(child, MixedQuery)
    assert child.phrases[0][0].terms == ("alpha", "beta")
    # depth 2 no longer misparses into a bogus MUST term
    q2 = parse_query("+(alpha (beta gamma))", an)
    assert isinstance(q2, NestedQuery)
    (role2, child2), = q2.children
    assert role2 == "must" and set(child2.should) == {"alpha", "beta",
                                                      "gamma"}
    # stopword-only group drops its clause entirely
    q3 = parse_query("alpha +((the and))", an)
    assert q3 == BooleanQuery(should=("alpha",))
    # one-level queries keep the flat fast path (class is NOT nested)
    for flat in ["alpha +(beta gamma)", "(alpha beta) -gamma",
                 "lang:(en de) alpha", "+alpha beta ~2"]:
        assert not isinstance(parse_query(flat, an), NestedQuery), flat
    # malformed input still raises
    for bad in ["((alpha)", "((alpha) beta", '+(alpha "beta']:
        with pytest.raises(ValueError):
            parse_query(bad, an)
    # terms collected across the whole tree
    assert query_terms(q) == {"alpha", "beta", "gamma", "delta"}


def test_nested_engine_vs_brute(nested_idx):
    from lucene_ray.pipelines.search import get_reader

    idx, texts = nested_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    brute = Brute(texts)
    for qt in QUERIES:
        q = parse_query(qt, an)
        assert isinstance(q, NestedQuery), qt
        want = brute.eval(q)
        order = sorted(want, key=lambda d: (-want[d], d))[:10]
        d, s = score_exhaustive(reader, q, 10)
        assert d.tolist() == order, qt
        np.testing.assert_allclose(
            np.asarray(s, dtype=np.float64),
            [want[doc] for doc in order], rtol=1e-9, err_msg=qt,
        )
        # blockmax dispatch must agree exactly
        d2, s2 = score_blockmax(reader, q, 10)
        assert np.array_equal(d, d2) and np.array_equal(
            np.asarray(s), np.asarray(s2)
        ), qt


def test_nested_matches_flat_on_equivalent_queries(nested_idx):
    """A flat one-level query and its gratuitously-nested spelling select
    the same docs with the same float64 scores (exact-norm chain; the
    nested combiner sums child-internally in the same sorted-term order
    the flat executor uses)."""
    from lucene_ray.pipelines.search import get_reader

    idx, _texts = nested_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    pairs = [
        ("alpha +(beta gamma)", "alpha +((beta gamma))"),
        ("(alpha beta) kappa", "((alpha beta)) kappa"),
        ("-(alpha beta) kappa", "-((alpha beta)) kappa"),
    ]
    for flat_t, nested_t in pairs:
        qf = parse_query(flat_t, an)
        qn = parse_query(nested_t, an)
        assert not isinstance(qf, NestedQuery)
        assert isinstance(qn, NestedQuery)
        df_, sf_ = score_exhaustive(reader, qf, 15)
        dn_, sn_ = score_exhaustive(reader, qn, 15)
        assert np.array_equal(df_, dn_), (flat_t, nested_t)
        np.testing.assert_allclose(
            np.asarray(sf_, np.float64), np.asarray(sn_, np.float64),
            rtol=1e-12, err_msg=flat_t,
        )


def test_nested_respects_deletes(nested_idx, tmp_path):
    import shutil

    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    idx, texts = nested_idx
    # work on a copy: the module-scoped index must stay tombstone-free
    cp = str(tmp_path / "idx_copy")
    shutil.copytree(idx, cp)
    reader = get_reader(cp)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+("alpha beta" gamma) delta', an)
    d, _ = score_exhaustive(reader, q, 5)
    if len(d) == 0:
        pytest.skip("query empty on this corpus draw")
    top = int(d[0])
    delete_docs(cp, [top])
    reader2 = get_reader(cp)
    d2, _ = score_exhaustive(reader2, q, 5)
    assert top not in d2.tolist()


def test_random_nested_queries_vs_brute(nested_idx):
    """Property test: randomly generated nested query strings (depth <= 3,
    signed groups, phrases at any level) — engine == from-scratch
    evaluator on docs and float64 scores."""
    from lucene_ray.pipelines.search import get_reader

    idx, texts = nested_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    brute = Brute(texts)
    rng = np.random.default_rng(31)
    CONTENT = ["alpha", "beta", "gamma", "delta", "epsilon", "kappa",
               "mu", "nu", "xi"]

    def gen_clause(depth):
        sign = rng.choice(["", "", "+", "-"])
        kind = rng.random()
        if kind < 0.45 or depth >= 3:
            return sign + rng.choice(CONTENT)
        if kind < 0.65:
            a, b = rng.choice(CONTENT, size=2, replace=False)
            return f'{sign}"{a} {b}"'
        n = int(rng.integers(2, 4))
        inner = " ".join(gen_clause(depth + 1) for _ in range(n))
        return f"{sign}({inner})"

    checked = 0
    for trial in range(60):
        n = int(rng.integers(2, 4))
        qtext = " ".join(gen_clause(1) for _ in range(n))
        try:
            q = parse_query(qtext, an)
        except ValueError:
            continue  # generator can produce unsupported shapes; skip
        want = brute.eval(q)
        order = sorted(want, key=lambda d: (-want[d], d))[:10]
        d, s = score_exhaustive(reader, q, 10)
        assert d.tolist() == order, qtext
        np.testing.assert_allclose(
            np.asarray(s, dtype=np.float64),
            [want[doc] for doc in order], rtol=1e-9, err_msg=qtext,
        )
        checked += 1
    assert checked >= 40  # the grammar accepts the vast majority


def test_nested_search_after_paging(nested_idx):
    """searchAfter paging works for nested trees (generic through the
    exhaustive candidates): concatenated pages == deep top-k."""
    from lucene_ray.functions.query import score_after
    from lucene_ray.pipelines.search import get_reader

    idx, _texts = nested_idx
    reader = get_reader(idx)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+("alpha beta" gamma) delta', an)
    full_d, full_s = score_exhaustive(reader, q, 15)
    pages_d, after = [], None
    for _ in range(3):
        d, s = score_after(reader, q, 5, after=after)
        if len(d) == 0:
            break
        pages_d.append(d)
        after = (float(np.asarray(s, np.float64)[-1]), int(d[-1]))
    got = np.concatenate(pages_d) if pages_d else np.empty(0, np.int64)
    assert np.array_equal(full_d, got)


def test_sharded_nested_and_phrase_parity(tmp_path, ray_session):
    """Doc-range-sharded serving of NESTED and PHRASE queries equals the
    single-index result exactly (tree-wide global stats + proxied
    positions)."""
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    doc_ids, texts = _corpus(n_docs=200, seed=41)
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        positions=True, sample_rate=1.0,
    )
    build_from_lists(tmp_path / "full", doc_ids, texts, cfg)
    build_from_lists(tmp_path / "a", doc_ids[:100], texts[:100], cfg)
    build_from_lists(tmp_path / "b", doc_ids[100:], texts[100:], cfg)
    reader = get_reader(str(tmp_path / "full"))
    an = make_analyzer("en_nostem_simple")
    svc = ShardedSearchService([str(tmp_path / "a"), str(tmp_path / "b")])
    try:
        queries = [
            '"alpha beta"',
            '+("alpha beta" gamma) delta',
            "+(kappa (mu nu)) alpha",
        ]
        res = svc.search(queries, k=10)
        for i, qt in enumerate(queries):
            d, s = score_exhaustive(reader, parse_query(qt, an), 10)
            assert np.array_equal(d, res[i][0]), qt
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(res[i][1], np.float64),
            )
    finally:
        svc.shutdown()
