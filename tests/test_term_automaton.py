"""TermAutomatonQuery (sandbox/search/TermAutomatonQuery.java +
TermAutomatonScorer.java) — hand-case semantics, a brute DFS fuzz over
random automata/token streams, and the end-to-end scored executor."""

from __future__ import annotations

import math

import numpy as np
import pytest

from lucene_ray.functions.term_automaton import (
    ANY,
    TermAutomatonQuery,
    _doc_freq_automaton,
    score_term_automaton,
    term_automaton_scored,
)
from lucene_ray.pipelines.build import IndexConfig

from test_engine_oracle import build_from_lists


def _events(tokens, terms):
    out = []
    for i, tok in enumerate(tokens):
        if tok in terms:
            out.append((i, [terms.index(tok)]))
    return out


def _freq(q, tokens):
    return _doc_freq_automaton(q, _events(tokens, q.terms))


def _phrase_q(*terms):
    q = TermAutomatonQuery()
    prev = 0
    for t in terms:
        nxt = q.create_state()
        if t is ANY:
            q.add_any_transition(prev, nxt)
        else:
            q.add_transition(prev, nxt, t)
        prev = nxt
    q.set_accept(prev)
    return q.finish()


def test_hand_semantics():
    # plain phrase
    assert _freq(_phrase_q("a", "b"), "a b x a b a a b".split()) == 3
    # synonym span (a b | c): overlapping parses count separately
    q = TermAutomatonQuery()
    t1, acc = q.create_state(), q.create_state()
    q.add_transition(0, t1, "a")
    q.add_transition(t1, acc, "b")
    q.add_transition(0, acc, "c")
    q.set_accept(acc)
    q.finish()
    assert _freq(q, "a b c a c b".split()) == 3
    # ANY in the middle consumes any token, term or not
    assert _freq(_phrase_q("a", ANY, "c"), "a z c a c c a a c".split()) == 3
    # kleene ANY*: every ordered (k, v) pair
    q = TermAutomatonQuery()
    k1, k2 = q.create_state(), q.create_state()
    q.add_transition(0, k1, "k")
    q.add_any_transition(k1, k1)
    q.add_transition(k1, k2, "v")
    q.set_accept(k2)
    q.finish()
    assert _freq(q, "k x v k v x v".split()) == 5
    # reference quirks: ANY-final accepts and ANY-initial starts never count
    assert _freq(_phrase_q("a", ANY), "a b a c".split()) == 0
    assert _freq(_phrase_q(ANY, "b"), "a b x b".split()) == 0
    # errors
    with pytest.raises(ValueError):
        term_automaton_scored(object(), TermAutomatonQuery())


def _brute_freq(q, tokens):
    """Independent spec: DFS over the det tables — start only via a term
    step from det state 0; each position offers the token's term arc and
    the ANY arc; freq counts TERM steps landing on an accept state."""
    accept = q.det_accept
    any_step = q.step[ANY]
    n = len(tokens)
    total = 0

    def walk(i, state, depth):
        nonlocal total
        if i >= n:
            return
        tok = tokens[i]
        if tok in q.terms:
            nxt = int(q.step[tok][state])
            if nxt >= 0:
                if accept[nxt]:
                    total += 1
                walk(i + 1, nxt, depth + 1)
        a = int(any_step[state])
        if depth > 0 and a >= 0:  # ANY never begins a match
            walk(i + 1, a, depth + 1)

    for start in range(n):
        tok = tokens[start]
        if tok in q.terms:
            nxt = int(q.step[tok][0])
            if nxt >= 0:
                if accept[nxt]:
                    total += 1
                walk(start + 1, nxt, 1)
    return total


def test_fuzz_vs_brute_dfs():
    rng = np.random.default_rng(23)
    alphabet = ["a", "b", "c", "d"]
    for trial in range(120):
        q = TermAutomatonQuery()
        n_states = int(rng.integers(2, 5))
        states = [0] + [q.create_state() for _ in range(n_states)]
        for _ in range(int(rng.integers(2, 8))):
            src = int(rng.choice(states))
            dst = int(rng.choice(states))
            if rng.random() < 0.25:
                q.add_any_transition(src, dst)
            else:
                q.add_transition(src, dst, str(rng.choice(alphabet)))
        for s in states[1:]:
            if rng.random() < 0.5:
                q.set_accept(s)
        if not q.terms:
            continue
        q.finish()
        toks = [str(w) for w in rng.choice(alphabet + ["x", "y"],
                                           size=int(rng.integers(1, 14)))]
        assert _freq(q, toks) == _brute_freq(q, toks), (trial, toks)


def test_scored_executor(ray_session, tmp_path):
    texts = [
        "alpha beta gamma",
        "alpha x gamma alpha beta",
        "gamma gamma beta",
        "alpha zeta zeta gamma",
        "nothing here",
    ]
    out = tmp_path / "ta"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, list(range(len(texts))), texts, cfg)
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(str(out))
    # (alpha ANY gamma) — matches docs 0 (a b g), 1 (a x g), 3? alpha
    # zeta zeta gamma needs TWO gaps -> no
    q = _phrase_q("alpha", ANY, "gamma")
    docs, scores = score_term_automaton(reader, q, 10)
    assert set(docs.tolist()) == {0, 1}
    # score check: one BM25 application, idf summed over present terms
    # in term-id order, freq = automaton freq
    kept = [t.split() for t in texts]
    df_a = sum("alpha" in t for t in kept)
    df_g = sum("gamma" in t for t in kept)
    n = len(texts)
    sum_tf = sum(len([w for w in t if w not in ()]) for t in kept)
    # doc lengths via the analyzer (no stopwords among these words)
    idf = math.log(1.0 + (n - df_a + 0.5) / (df_a + 0.5))
    idf += math.log(1.0 + (n - df_g + 0.5) / (df_g + 0.5))
    avgdl = sum_tf / n
    for doc, sc in zip(docs.tolist(), scores.tolist()):
        freq = 1.0
        dl = len(kept[doc])
        denom = freq + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
        assert sc == pytest.approx(idf * (freq / denom), rel=1e-12)
    # kleene over the index: alpha ANY* beta
    qk = TermAutomatonQuery()
    s1, s2 = qk.create_state(), qk.create_state()
    qk.add_transition(0, s1, "alpha")
    qk.add_any_transition(s1, s1)
    qk.add_transition(s1, s2, "beta")
    qk.set_accept(s2)
    qk.finish()
    got = term_automaton_scored(reader, qk)
    freqs = {}
    for doc, toks in enumerate(kept):
        c = sum(
            1
            for i, a in enumerate(toks)
            for j, b in enumerate(toks)
            if a == "alpha" and b == "beta" and j > i
        )
        if c:
            freqs[doc] = c
    assert set(got[0].tolist()) == set(freqs)
    # per-doc freq recoverable from the score: invert the BM25 ratio
    idf_ab = math.log(1.0 + (n - df_a + 0.5) / (df_a + 0.5))
    df_b = sum("beta" in t for t in kept)
    idf_ab += math.log(1.0 + (n - df_b + 0.5) / (df_b + 0.5))
    for doc, sc in zip(got[0].tolist(), np.asarray(got[1]).tolist()):
        dl = len(kept[doc])
        kpart = 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)
        f = freqs[doc]
        assert sc == pytest.approx(idf_ab * (f / (f + kpart)), rel=1e-12)


def test_token_stream_to_automaton(ray_session, tmp_path):
    """TokenStreamToTermAutomatonQuery: synonym graphs become parallel
    arcs, '*' becomes ANY, holes raise unless collapsed."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.term_automaton import token_stream_to_automaton

    syn = make_analyzer("synonym:en_nostem_simple:fast=quick")
    q = token_stream_to_automaton("fast car", syn)
    toks_hits = [
        ("fast car goes", 1),
        ("the quick car", 1),
        ("slow car", 0),
        ("fast quick car", 1),  # only from position 1 (quick car)
    ]
    for text, want in toks_hits:
        toks = [w for w in text.split() if w != "the"]
        # positions with the stopword hole preserved
        an = make_analyzer("en_nostem_simple")
        terms, pos = an.analyze_positions(text)
        ev = []
        for t, p in zip(terms, pos):
            if t in q.terms:
                if ev and ev[-1][0] == p:
                    ev[-1][1].append(q.terms.index(t))
                else:
                    ev.append((p, [q.terms.index(t)]))
        assert _doc_freq_automaton(q, ev) == want, text
    # '*' term -> ANY arc (whitespace tokenizer keeps the literal star;
    # the standard chain would strip it)
    an = make_analyzer("en_nostem_simple")
    q2 = token_stream_to_automaton(
        "alpha * gamma", make_analyzer("whitespace")
    )
    assert _freq(q2, "alpha x gamma".split()) == 1
    assert _freq(q2, "alpha gamma".split()) == 0
    # holes raise; collapsed mode matches across the hole
    with pytest.raises(ValueError, match="holes"):
        token_stream_to_automaton("the car", an)  # leading stopword hole
    q3 = token_stream_to_automaton("alpha the beta", an,
                                   preserve_position_increments=False)
    assert _freq(q3, "alpha beta".split()) == 1
    assert token_stream_to_automaton("", an) is None


def test_automaton_and_phrase_wildcard_respect_deletes(ray_session, tmp_path):
    """Tombstoned docs never appear in TermAutomaton or PhraseWildcard
    results (liveDocs filtering on the extension executors)."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.multiterm import phrase_wildcard_query
    from lucene_ray.functions.query import score_blockmax
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    texts = [
        "alpha beta gamma",
        "alpha beta",
        "alpha x beta",
        "alpha beta again",
    ]
    out = tmp_path / "del"
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(out, list(range(len(texts))), texts, cfg)
    reader = get_reader(str(out))
    q = _phrase_q("alpha", ANY, "beta")  # doc 2 only? also spans others
    before, _ = score_term_automaton(reader, q, 10)
    qa = _phrase_q("alpha", "beta")
    before_exact, _ = score_term_automaton(reader, qa, 10)
    assert 1 in before_exact.tolist()
    delete_docs(str(out), [1, 2])
    reader2 = get_reader(str(out))  # fresh tombstone fingerprint
    after, _ = score_term_automaton(reader2, qa, 10)
    assert 1 not in after.tolist() and 2 not in after.tolist()
    after_any, _ = score_term_automaton(reader2, q, 10)
    assert 2 not in after_any.tolist()
    # phrase-wildcard path too
    pw = phrase_wildcard_query(
        [("prefix", "alph"), ("term", "beta")], reader2.expand_multi
    )
    d, _ = score_blockmax(reader2, pw, 10)
    assert 1 not in d.tolist() and 2 not in d.tolist()
    assert set(d.tolist()) <= {0, 3}


def test_batch_dp_matches_scalar_fuzz():
    """The vectorized multi-doc DP (_batch_freq_automaton) is freq- and
    doc-identical to the scalar per-doc walk over random automata and
    random corpora with position gaps and synonym stacks (several
    term-ids at the same position)."""
    from lucene_ray.functions.term_automaton import _batch_freq_automaton

    rng = np.random.default_rng(71)
    alphabet = ["a", "b", "c", "d", "e"]
    trials = 0
    for trial in range(150):
        q = TermAutomatonQuery()
        n_states = int(rng.integers(2, 5))
        states = [0] + [q.create_state() for _ in range(n_states)]
        for _ in range(int(rng.integers(2, 9))):
            src = int(rng.choice(states))
            dst = int(rng.choice(states))
            if rng.random() < 0.3:
                q.add_any_transition(src, dst)
            else:
                q.add_transition(src, dst, str(rng.choice(alphabet)))
        for s in states[1:]:
            if rng.random() < 0.5:
                q.set_accept(s)
        if not q.terms:
            continue
        q.finish()
        trials += 1
        # corpus: docs with gappy positions and occasional synonym stacks
        d_l, p_l, t_l = [], [], []
        expected = {}
        n_docs = int(rng.integers(1, 9))
        for doc in range(n_docs):
            pos = 0
            events = []
            for _ in range(int(rng.integers(0, 12))):
                pos += int(rng.integers(1, 4))  # gaps of 0..2 ANY-holes
                k = 1 + (rng.random() < 0.25)  # sometimes a synonym stack
                tids = sorted(
                    set(int(x) for x in rng.integers(0, len(q.terms), k))
                )
                events.append((pos, tids))
                for tid in tids:
                    d_l.append(doc)
                    p_l.append(pos)
                    t_l.append(tid)
            f = _doc_freq_automaton(q, events)
            if f > 0:
                expected[doc] = f
        if not d_l:
            continue
        d = np.asarray(d_l, dtype=np.int64)
        p = np.asarray(p_l, dtype=np.int64)
        t = np.asarray(t_l, dtype=np.int64)
        docs, freqs = _batch_freq_automaton(q, d, p, t)
        got = dict(zip(docs.tolist(), freqs.tolist()))
        assert got == expected, (trial, got, expected)
    assert trials >= 100
