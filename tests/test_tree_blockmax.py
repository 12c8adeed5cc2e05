"""Pruned executor for the RECURSIVE combiners (MixedQuery /
NestedQuery): the clause-adapter tree must be bit-identical to the
exhaustive combiner and must actually engage (``pruned:tree``) on
multi-block corpora — the reference analogue is the Impacts API
propagating block max scores through nested scorer trees
(search/WANDScorer.java, PhraseWeight's ImpactsSource)."""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig, build_index

from test_engine_oracle import WORDS, make_corpus

CONTENT = [w for w in WORDS if w not in ("the", "and", "of")]


@pytest.fixture(scope="module")
def tree_index(ray_session, tmp_path_factory):
    """600-doc corpus with positions and a ts doc-values field; 12
    partitions + bucket_shift 3 so frequent terms span many blocks."""
    import ray.data

    from lucene_ray.state.docvalues import write_doc_values

    doc_ids, texts = make_corpus(n_docs=600, seed=47)
    # inject RARE length skew: every 31st doc becomes a very short doc of
    # a few content words — low norms push those docs' scores (and their
    # blocks' max bounds) far above the rest, and rarity keeps the high
    # bounds confined to FEW intervals so a top-k threshold can prune.
    # Pure tf repetition would NOT discriminate (BM25 saturates tf and
    # long docs normalize back down), and frequent short docs lift every
    # interval's bound equally — both regimes legitimately take the cost
    # fallback.
    hot = random.Random(49)
    texts = [
        " ".join(hot.choice(CONTENT) for _ in range(hot.randint(2, 5)))
        if i % 31 == 0 else t
        for i, t in enumerate(texts)
    ]
    rng = np.random.default_rng(48)
    ts = [int(v) for v in rng.integers(0, 1000, size=len(doc_ids))]
    out = str(tmp_path_factory.mktemp("trbx") / "idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(ts, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=12,
        sample_rate=1.0, heavy_df_threshold=40, bucket_shift=3,
        positions=True,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    write_doc_values(
        ray.data.from_arrow(tbl.select(["doc_id", "ts"])), out, "ts"
    )
    return out


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def _identical(reader, q, k=10):
    ed, es = score_exhaustive(reader, q, k)
    bd, bs = score_blockmax(reader, q, k)
    assert np.array_equal(ed, bd), q
    assert np.array_equal(np.asarray(es), np.asarray(bs)), q
    return score_blockmax.last_path


def test_tree_path_engages(tree_index):
    """Nested boolean trees and phrase mixes run the pruned tree executor
    on a multi-block corpus, bit-identical to the exhaustive combiner."""
    reader = _reader(tree_index)
    an = make_analyzer("en_nostem_simple")
    # one-level groups flatten into BooleanQuery (the flat executor owns
    # those); only depth-2 groups (NestedQuery) and phrase mixes
    # (MixedQuery) exercise the tree executor.  Queries use mid-zipf
    # terms (idf variance spreads the bounds; alpha/beta are the most
    # common words and give flat bounds the cost model rightly rejects)
    # and small k (the 600-doc corpus can't amortize per-interval setup
    # for k=10 sums of common clauses — same regime as the flat path).
    qs = [
        ("kappa (sigma (tau rho))", 3),          # NestedQuery depth 2
        ("iota (kappa (sigma tau))", 3),         # NestedQuery depth 2
        ("psi (omega (phi chi))", 3),            # NestedQuery, rare terms
        ('+"alpha beta" kappa', 3),              # MixedQuery, must phrase
        ('+"beta alpha" sigma', 3),              # MixedQuery, must phrase
        ('sigma -"alpha beta"', 10),             # MixedQuery, not phrase
        ('tau -"alpha beta"', 10),               # MixedQuery, not phrase
        ('kappa -"beta gamma"', 10),             # MixedQuery, not phrase
    ]
    paths = []
    for s, k in qs:
        q = parse_query(s, an)
        paths.append(_identical(reader, q, k))
    # every single one must run the pruned tree on this skewed corpus —
    # no fallback of any kind (the queries were chosen for that regime)
    assert all(p == "pruned:tree" for p in paths), paths


def test_sloppy_child_routes_exhaustive(tree_index):
    """A sloppy phrase inside a mix has no interval bound: the tree
    executor hands the whole query back to the exhaustive combiner."""
    reader = _reader(tree_index)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+"alpha beta"~2 gamma', an)
    _identical(reader, q, 10)
    assert score_blockmax.last_path == "exhaustive:query-kind"


def test_tree_fuzz_dumb_vs_smart(tree_index):
    """Random nested/mixed query strings x k values: score_blockmax ==
    score_exhaustive bit-for-bit, and the pruned tree engages often."""
    reader = _reader(tree_index)
    an = make_analyzer("en_nostem_simple")
    rng = random.Random(314)

    def term():
        return rng.choice(CONTENT)

    def phrase():
        return f'"{term()} {term()}"'

    def group(depth):
        inner = " ".join(clause(depth - 1) for _ in range(rng.randint(2, 3)))
        return f"({inner})"

    def clause(depth):
        r = rng.random()
        occ = rng.choice(["", "", "+", "-"])
        if depth > 0 and r < 0.35:
            return occ + group(depth)
        if r < 0.6:
            return occ + phrase()
        return occ + term()

    def query_string():
        parts = [clause(rng.randint(1, 2)) for _ in range(rng.randint(2, 4))]
        # ensure at least one positive clause
        if all(p.startswith("-") for p in parts):
            parts.append(term())
        if rng.random() < 0.2:
            parts.append("ts:[%d TO %d]" % tuple(sorted(
                (rng.randint(0, 999), rng.randint(0, 999))
            )))
        return " ".join(parts)

    paths = []
    checked = 0
    for trial in range(120):
        s = query_string()
        try:
            q = parse_query(s, an)
        except ValueError:
            continue
        k = rng.choice([1, 2, 3, 5, 10, 50])
        paths.append(_identical(reader, q, k))
        checked += 1
    assert checked >= 100
    assert paths.count("pruned:tree") >= 10, (
        paths.count("pruned:tree"), len(paths))


def test_tree_respects_deletes(tree_index):
    """Tombstoned docs stay out of pruned tree results exactly like the
    exhaustive path (both read reader.deleted)."""
    import numpy as np

    reader = _reader(tree_index)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('+(alpha beta) "gamma delta"', an)
    ed, _ = score_exhaustive(reader, q, 20)
    if len(ed) == 0:
        pytest.skip("no hits for the delete probe on this corpus seed")
    old = getattr(reader, "deleted", None)
    try:
        reader.deleted = np.array(sorted(ed[:2]), dtype=np.int64)
        e2d, e2s = score_exhaustive(reader, q, 20)
        b2d, b2s = score_blockmax(reader, q, 20)
        assert np.array_equal(e2d, b2d)
        assert np.array_equal(np.asarray(e2s), np.asarray(b2s))
        assert not set(ed[:2]) & set(b2d.tolist())
    finally:
        reader.deleted = old
