"""Round-4 block-max coverage: the pruned executor must now handle
non-BM25 similarities and FILTER-carrying boolean queries instead of
bailing to the exhaustive path (reference analogues: MaxScoreCache
computes impact score bounds for ANY SimScorer,
core/src/java/org/apache/lucene/search/MaxScoreCache.java:63-80;
filter clauses participate in the block-max conjunction,
core/src/java/org/apache/lucene/search/BooleanScorerSupplier.java:398-418).

Every comparison demands bit-identical doc IDs AND scores
(dumb-vs-smart, the TestWANDScorer pattern), and the tests assert via
``score_blockmax.last_path`` that the PRUNED path was actually selected
— a regression back to silent exhaustive routing fails here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    parse_query,
    score_blockmax,
    score_exhaustive,
)
from lucene_ray.pipelines.build import IndexConfig, build_index

from test_engine_oracle import WORDS, make_corpus, random_queries, analyzed
from test_similarities import ALL_SIMS, ALL_SIMS_PLUS

CONTENT = [w for w in WORDS if w not in ("the", "and", "of")]


@pytest.fixture(scope="module")
def bx_index(ray_session, tmp_path_factory):
    """600-doc corpus, 5 partitions -> every frequent term spans multiple
    posting blocks, plus a ``ts`` doc-values field for range filters."""
    import ray.data

    from lucene_ray.state.docvalues import write_doc_values

    doc_ids, texts = make_corpus(n_docs=600, seed=41)
    rng = np.random.default_rng(43)
    ts = [int(v) for v in rng.integers(0, 1000, size=len(doc_ids))]
    out = str(tmp_path_factory.mktemp("bx") / "idx")
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
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    write_doc_values(
        ray.data.from_arrow(tbl.select(["doc_id", "ts"])), out, "ts"
    )
    return out, ts


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def _identical(reader, q, k=10):
    ed, es = score_exhaustive(reader, q, k)
    bd, bs = score_blockmax(reader, q, k)
    assert np.array_equal(ed, bd), q
    assert np.array_equal(np.asarray(es), np.asarray(bs)), q
    return score_blockmax.last_path


def test_negative_score_model_routes_exhaustive(bx_index):
    """IndriDirichlet scores are negative log-probabilities: the additive
    block-max bound is invalid for them (a doc missing a SHOULD clause
    out-scores one containing it), so the executor must route to the
    exhaustive path — results still bit-identical."""
    idx, _ts = bx_index
    reader = _reader(idx)
    reader.similarity = ("indri", 2000.0)
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(59)
    try:
        for q in analyzed(random_queries(rng, n=8), an):
            path = _identical(reader, q, k=10)
            assert path == "exhaustive:negative-scores", path
    finally:
        reader.similarity = None


@pytest.mark.parametrize(
    "sim", [s for s in ALL_SIMS_PLUS if s[0] != "indri"]
)
def test_similarity_queries_take_pruned_path(bx_index, sim):
    """Every similarity family: random boolean queries are result-identical
    dumb-vs-smart AND at least one multi-term query runs the pruned
    interval loop (not an exhaustive bail)."""
    idx, _ts = bx_index
    reader = _reader(idx)
    reader.similarity = sim
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(sum(ord(c) for c in str(sim)))
    paths = []
    try:
        for q in analyzed(random_queries(rng, n=12), an):
            paths.append(_identical(reader, q, k=10))
    finally:
        reader.similarity = None
    assert any(p in ("pruned", "champion") for p in paths), paths
    assert not any(p.startswith("exhaustive:similarity") for p in paths)


def test_filter_queries_take_pruned_path(bx_index):
    """Range-FILTER boolean queries: bit-identical dumb-vs-smart, pruned
    path engaged (filters intersect inside the interval loop)."""
    idx, ts = bx_index
    reader = _reader(idx)
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(47)
    pruned_seen = 0
    for _ in range(25):
        lo, hi = sorted(int(v) for v in rng.integers(0, 1000, size=2))
        terms = [str(w) for w in rng.choice(CONTENT, size=int(rng.integers(1, 4)), replace=False)]
        shape = int(rng.integers(0, 3))
        if shape == 0:
            qs = f"{' '.join(terms)} ts:[{lo} TO {hi}]"
        elif shape == 1:
            qs = f"+{terms[0]} {' '.join(terms[1:])} ts:[{lo} TO {hi}]"
        else:
            qs = f"{' '.join(terms[:-1]) or terms[0]} -{terms[-1]} ts:[{lo} TO {hi}]"
        path = _identical(reader, parse_query(qs, an), k=10)
        if path == "pruned":
            pruned_seen += 1
    assert pruned_seen >= 5, pruned_seen


def test_filter_edge_cases(bx_index):
    """Empty-range filter, all-covering filter, filter + msm, filter +
    similarity combined — all bit-identical dumb-vs-smart."""
    idx, _ts = bx_index
    reader = _reader(idx)
    an = make_analyzer("en_nostem_simple")
    # empty range: no doc passes
    d, s = score_blockmax(reader, parse_query("alpha ts:[2000 TO 3000]", an), 10)
    assert len(d) == 0
    # all-covering range == unfiltered result
    q_f = parse_query("alpha beta ts:[0 TO 1000]", an)
    q_u = parse_query("alpha beta", an)
    fd, fs = score_blockmax(reader, q_f, 10)
    ud, us = score_blockmax(reader, q_u, 10)
    assert np.array_equal(fd, ud)
    assert np.array_equal(np.asarray(fs), np.asarray(us))
    # msm + filter
    q = BooleanQuery(
        should=("alpha", "beta", "gamma"), minimum_should_match=2,
        filters=(("ts", 100, 900),),
    )
    _identical(reader, q, k=10)
    # similarity + filter through the same pruned machinery
    for sim in [("lmd", 2000.0), ("classic",), ("dfi",)]:
        reader.similarity = sim
        try:
            path = _identical(
                reader, parse_query("alpha beta ts:[100 TO 900]", an), k=10
            )
        finally:
            reader.similarity = None
        assert not path.startswith("exhaustive:query-kind"), (sim, path)


def test_multirange_filter(bx_index):
    """MultiRangeQuery (sandbox/.../MultiRangeQuery.java +
    SortedNumericDocValuesMultiRangeQuery): one FILTER clause whose
    ranges union — membership equals the manual union of single-range
    results, overlaps dedupe, and scored queries stay bit-identical
    dumb-vs-smart through the filter conjunction."""
    import dataclasses

    from lucene_ray.functions.query import matching_docs

    idx, ts = bx_index
    reader = _reader(idx)
    an = make_analyzer("en_nostem_simple")
    ts = np.asarray(ts)

    def mr_query(text, ranges):
        base = parse_query(text, an) if text else BooleanQuery()
        return dataclasses.replace(
            base, filters=base.filters + (("ts", "multirange", ranges),)
        )

    # pure filter: doc set == the brute union over the ts array
    for ranges in [((100, 200), (700, 800)), ((0, 500), (400, 900)),
                   ((990, 999), (2000, 3000)), ()]:
        got = matching_docs(reader, mr_query("", ranges))
        want = np.zeros(len(ts), dtype=bool)
        for a, b in ranges:
            want |= (ts >= a) & (ts <= b)
        assert got.tolist() == np.flatnonzero(want).tolist(), ranges
    # overlap == its dedup: same docs as the merged single range
    q_over = mr_query("alpha beta", ((100, 500), (400, 800)))
    q_one = parse_query("alpha beta ts:[100 TO 800]", an)
    od, osc = score_blockmax(reader, q_over, 10)
    sd, ssc = score_blockmax(reader, q_one, 10)
    assert np.array_equal(od, sd)
    assert np.array_equal(np.asarray(osc), np.asarray(ssc))
    # scored + multirange: dumb-vs-smart bit-identity, several shapes
    rng = np.random.default_rng(53)
    for _ in range(12):
        cuts = np.sort(rng.integers(0, 1000, size=4))
        ranges = ((int(cuts[0]), int(cuts[1])), (int(cuts[2]), int(cuts[3])))
        terms = [str(w) for w in
                 rng.choice(CONTENT, size=int(rng.integers(1, 4)),
                            replace=False)]
        _identical(reader, mr_query(" ".join(terms), ranges), k=10)
        _identical(reader, mr_query(f"+{terms[0]}", ranges), k=10)


def test_clamped_zero_scores_fill_topk(bx_index):
    """LMDirichlet with tiny mu clamps common-term scores in long docs to
    0; those docs still MATCH and must fill an under-filled top-k in
    doc-id order — identical between executors (the activity-based
    feasibility fix: a bound-0 block is not infeasible)."""
    idx, _ts = bx_index
    reader = _reader(idx)
    an = make_analyzer("en_nostem_simple")
    reader.similarity = ("lmd", 1.0)  # aggressive clamping
    try:
        for qt in ["alpha", "alpha beta", "+alpha mu", "alpha -beta"]:
            q = parse_query(qt, an)
            ed, es = score_exhaustive(reader, q, 50)
            bd, bs = score_blockmax(reader, q, 50)
            assert np.array_equal(ed, bd), qt
            assert np.array_equal(np.asarray(es), np.asarray(bs)), qt
            # the clamp actually fires somewhere (test is vacuous otherwise)
        assert float(np.asarray(es).min()) == 0.0
    finally:
        reader.similarity = None


def test_randomized_similarity_filter_matrix(bx_index):
    """800-case randomized dumb-vs-smart sweep across the full r4 routing
    surface: random boolean shape x random similarity (incl. BM25 and
    byte4-unfriendly params) x optional range filter x random k. Every
    case demands bit-identical docs AND scores."""
    idx, _ts = bx_index
    reader = _reader(idx)
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(2024)
    sims = [None, ("lmd", 2000.0), ("lmd", 1.0), ("classic",),
            ("lmjm", 0.1), ("dfr_inl2", 1.0), ("ib_ll", 1.0), ("dfi",),
            ("boolean",), ("axiomatic_f2exp",), ("dfr", "g", "b", "h1"),
            ("ib", "spl", "ttf", "h2")]
    checked = 0
    for case in range(800):
        sim = sims[int(rng.integers(0, len(sims)))]
        qs = random_queries(rng, n=1)[0]
        q = analyzed([qs], an)[0]
        if rng.random() < 0.5:
            lo, hi = sorted(int(v) for v in rng.integers(0, 1100, size=2))
            q = BooleanQuery(
                must=q.must, should=q.should, must_not=q.must_not,
                minimum_should_match=q.minimum_should_match,
                filters=(("ts", lo, hi),),
            )
        k = int(rng.choice([1, 3, 10, 25, 100]))
        reader.similarity = sim
        try:
            ed, es = score_exhaustive(reader, q, k)
            bd, bs = score_blockmax(reader, q, k)
        finally:
            reader.similarity = None
        assert np.array_equal(ed, bd), (case, sim, q, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (
            case, sim, q, k,
        )
        checked += 1
    assert checked == 800


@pytest.fixture(scope="module")
def bx_index_b4(ray_session, tmp_path_factory):
    """byte4-norm variant (the production chain: SmallFloat norm keys,
    float32 scores) for the same routing sweep."""
    import ray.data

    doc_ids, texts = make_corpus(n_docs=400, seed=53)
    out = str(tmp_path_factory.mktemp("bxb4") / "idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="byte4", num_partitions=10,
        sample_rate=1.0, heavy_df_threshold=40, bucket_shift=3,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    return out


def test_randomized_similarity_matrix_byte4(bx_index_b4):
    """300-case byte4 sweep: float32 score chain + SmallFloat norm decode
    under every similarity family, dumb-vs-smart bit-identical."""
    reader = _reader(bx_index_b4)
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(77)
    sims = [None, ("lmd", 2000.0), ("classic",), ("lmjm", 0.1),
            ("dfr_inl2", 1.0), ("ib_ll", 1.0), ("dfi",), ("boolean",),
            ("axiomatic_f2exp",)]
    for case in range(300):
        sim = sims[int(rng.integers(0, len(sims)))]
        q = analyzed(random_queries(rng, n=1), an)[0]
        k = int(rng.choice([1, 5, 10, 50]))
        reader.similarity = sim
        try:
            ed, es = score_exhaustive(reader, q, k)
            bd, bs = score_blockmax(reader, q, k)
        finally:
            reader.similarity = None
        assert np.array_equal(ed, bd), (case, sim, q, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (case, sim, q, k)


def test_group_queries_take_pruned_path(bx_index):
    """Required-OR groups (MUST multi-term clauses) now run the pruned
    interval loop: random group shapes x similarities x filters, all
    bit-identical dumb-vs-smart, with the pruned path engaged."""
    idx, _ts = bx_index
    reader = _reader(idx)
    rng = np.random.default_rng(4242)
    sims = [None, ("lmd", 2000.0), ("classic",), ("dfr_inl2", 1.0)]
    paths = []
    for case in range(200):
        n_groups = int(rng.integers(1, 3))
        groups = tuple(
            tuple(str(w) for w in rng.choice(
                CONTENT, size=int(rng.integers(2, 4)), replace=False))
            for _ in range(n_groups)
        )
        must = tuple(
            str(w) for w in rng.choice(CONTENT, size=int(rng.integers(0, 2)),
                                       replace=False)
        )
        should = tuple(
            str(w) for w in rng.choice(CONTENT, size=int(rng.integers(0, 3)),
                                       replace=False)
        )
        must_not = tuple(
            str(w) for w in rng.choice(CONTENT, size=int(rng.integers(0, 2)),
                                       replace=False)
        )
        filters = ()
        if rng.random() < 0.3:
            lo, hi = sorted(int(v) for v in rng.integers(0, 1100, size=2))
            filters = (("ts", lo, hi),)
        q = BooleanQuery(must=must, should=should, must_not=must_not,
                         must_groups=groups, filters=filters)
        sim = sims[int(rng.integers(0, len(sims)))]
        k = int(rng.choice([1, 10, 50]))
        reader.similarity = sim
        try:
            ed, es = score_exhaustive(reader, q, k)
            bd, bs = score_blockmax(reader, q, k)
            paths.append(score_blockmax.last_path)
        finally:
            reader.similarity = None
        assert np.array_equal(ed, bd), (case, sim, q, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (
            case, sim, q, k,
        )
    assert "pruned" in paths
    assert not any(p == "exhaustive:groups" for p in paths)


def test_synonym_queries_take_pruned_path(bx_index, bx_index_b4):
    """SynonymQuery pruned executor: random synonym sets (incl. absent
    members) x similarities x k, bit-identical dumb-vs-smart on both
    norm chains; the pruned path engages."""
    from lucene_ray.functions.query import SynonymQuery

    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(31337)
    sims = [None, ("lmd", 2000.0), ("classic",), ("dfr_inl2", 1.0),
            ("dfi",)]
    for idx in (bx_index[0], bx_index_b4):
        reader = _reader(idx)
        paths = []
        for case in range(150):
            size = int(rng.integers(1, 4))
            terms = [str(w) for w in rng.choice(CONTENT, size=size,
                                                replace=False)]
            terms = [t for w in terms for t in an.analyze(w)]
            if rng.random() < 0.3:
                terms.append("zzzmissing")
            q = SynonymQuery(terms=tuple(terms))
            sim = sims[int(rng.integers(0, len(sims)))]
            k = int(rng.choice([1, 10, 40]))
            reader.similarity = sim
            try:
                ed, es = score_exhaustive(reader, q, k)
                bd, bs = score_blockmax(reader, q, k)
                paths.append(score_blockmax.last_path)
            finally:
                reader.similarity = None
            assert np.array_equal(ed, bd), (case, sim, terms, k)
            assert np.array_equal(np.asarray(es), np.asarray(bs)), (
                case, sim, terms, k,
            )
        assert any(p.startswith("pruned") for p in paths), set(paths)


def test_exact_phrase_queries_take_pruned_path(ray_session, tmp_path_factory):
    """Exact phrases (slop=0) run the pruned interval executor:
    randomized phrases (incl. stopword gaps and repeated terms) are
    bit-identical dumb-vs-smart; sloppy phrases keep exhaustive."""
    import ray.data

    from lucene_ray.functions.query import PhraseQuery

    doc_ids, texts = make_corpus(n_docs=500, seed=61)
    out = str(tmp_path_factory.mktemp("phx") / "idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=12,
        positions=True, sample_rate=1.0, heavy_df_threshold=40,
        bucket_shift=3,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    reader = _reader(out)
    an = make_analyzer("en_nostem_simple")
    rng = np.random.default_rng(611)
    paths = []
    for case in range(120):
        size = int(rng.integers(1, 4))
        words = [str(w) for w in rng.choice(WORDS, size=size)]
        qs = '"' + " ".join(words) + '"'
        q = parse_query(qs, an)
        if not getattr(q, "terms", ()):
            continue  # stopword-only phrase
        k = int(rng.choice([1, 10, 30]))
        ed, es = score_exhaustive(reader, q, k)
        bd, bs = score_blockmax(reader, q, k)
        paths.append(score_blockmax.last_path)
        assert np.array_equal(ed, bd), (case, qs, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (case, qs, k)
    assert any(p.startswith("pruned") for p in paths), set(paths)
    # sloppy phrases now prune too (anchor-tf bound): randomized slops,
    # repeated terms included — bit-identical dumb-vs-smart with the
    # pruned path engaged at least once
    spaths = []
    for case in range(80):
        size = int(rng.integers(2, 4))
        words = [str(w) for w in rng.choice(WORDS, size=size)]
        q = parse_query(
            '"' + " ".join(words) + f'"~{int(rng.integers(1, 5))}', an
        )
        if not getattr(q, "terms", ()) or len(q.terms) < 2:
            continue
        k = int(rng.choice([1, 10, 30]))
        ed, es = score_exhaustive(reader, q, k)
        bd, bs = score_blockmax(reader, q, k)
        spaths.append(score_blockmax.last_path)
        assert np.array_equal(ed, bd), (case, q, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (case, q, k)
    assert any(p == "pruned:sloppy" for p in spaths), set(spaths)


def test_matchall_shortcut(bx_index):
    """MatchAll top-k = first k live docs with constant score; identical
    to the exhaustive enumeration incl. under deletes."""
    from lucene_ray.functions.query import MatchAllQuery

    reader = _reader(bx_index[0])
    for k in (1, 10, 700):
        ed, es = score_exhaustive(reader, MatchAllQuery(), k)
        bd, bs = score_blockmax(reader, MatchAllQuery(), k)
        assert score_blockmax.last_path == "pruned:matchall"
        assert np.array_equal(ed, bd), k
        assert np.array_equal(np.asarray(es), np.asarray(bs)), k
    # with tombstones (fake a deleted set on a shallow reader copy)
    import copy

    r2 = copy.copy(reader)
    r2.__dict__ = dict(reader.__dict__)
    r2.deleted = np.array([0, 1, 2, 5, 599], dtype=np.int64)
    for k in (3, 50):
        ed, es = score_exhaustive(r2, MatchAllQuery(), k)
        bd, bs = score_blockmax(r2, MatchAllQuery(), k)
        assert np.array_equal(ed, bd), k
        assert np.array_equal(np.asarray(es), np.asarray(bs)), k
        assert not set(bd.tolist()) & {0, 1, 2, 5, 599}


def test_multi_phrase_queries_take_pruned_path(ray_session, tmp_path_factory):
    """MultiPhraseQuery runs the pruned slot-union executor: randomized
    slot alternatives (incl. absent terms and repeated alternatives),
    bit-identical dumb-vs-smart."""
    import ray.data

    from lucene_ray.functions.query import MultiPhrase

    doc_ids, texts = make_corpus(n_docs=450, seed=71)
    out = str(tmp_path_factory.mktemp("mpx") / "idx")
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=12,
        positions=True, sample_rate=1.0, heavy_df_threshold=40,
        bucket_shift=3,
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    reader = _reader(out)
    rng = np.random.default_rng(717)
    paths = []
    for case in range(100):
        n_slots = int(rng.integers(2, 4))
        arrays = []
        for _ in range(n_slots):
            alts = [str(w) for w in rng.choice(
                CONTENT, size=int(rng.integers(1, 3)), replace=False)]
            if rng.random() < 0.2:
                alts.append("zzzmissing")
            arrays.append(tuple(alts))
        offs = tuple(range(n_slots)) if rng.random() < 0.7 else tuple(
            sorted(rng.choice(range(n_slots + 2), size=n_slots,
                              replace=False))
        )
        q = MultiPhrase(term_arrays=tuple(arrays), offsets=offs)
        k = int(rng.choice([1, 10, 30]))
        ed, es = score_exhaustive(reader, q, k)
        bd, bs = score_blockmax(reader, q, k)
        paths.append(score_blockmax.last_path)
        assert np.array_equal(ed, bd), (case, arrays, offs, k)
        assert np.array_equal(np.asarray(es), np.asarray(bs)), (
            case, arrays, offs, k,
        )
    assert any(p == "pruned:multiphrase" for p in paths), set(paths)
