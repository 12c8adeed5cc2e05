"""Sharded / incremental search + CheckIndex validation.

The invariant (reference: IndexSearcher gathers global stats across leaves
before scoring; TopDocs.merge): two indexes built over disjoint doc-id
halves, searched through ShardedReader with summed global stats, must be
rank- AND score-identical to one index built over the whole corpus.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"

QUERIES = [
    "dup",
    "batch",
    "batch AND small",
    "+data -stream",
    "dup key fast line ~2",
    "the customer",
]


@pytest.fixture(scope="module")
def built_indexes(ray_session, tmp_path_factory):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index

    root = tmp_path_factory.mktemp("sharded")
    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    mid = 250
    full_dir = str(root / "full")
    a_dir = str(root / "shard_a")
    b_dir = str(root / "shard_b")
    cfg = IndexConfig(num_partitions=4, exchange="files")
    build_index(ray.data.from_arrow(tbl), full_dir, cfg)
    mask = pa.compute.less(tbl.column("doc_id"), mid)
    build_index(ray.data.from_arrow(tbl.filter(mask)), a_dir, cfg)
    build_index(
        ray.data.from_arrow(tbl.filter(pa.compute.invert(mask))), b_dir, cfg
    )
    return full_dir, a_dir, b_dir


def test_sharded_scores_identical(built_indexes):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        parse_query,
        score_blockmax,
        score_exhaustive,
    )
    from lucene_ray.state.reader import IndexReader
    from lucene_ray.state.sharded import ShardedReader

    full_dir, a_dir, b_dir = built_indexes
    single = IndexReader(full_dir)
    sharded = ShardedReader([b_dir, a_dir])  # order-insensitive (sorted)
    assert sharded.doc_count == single.doc_count
    assert sharded.sum_total_tf == single.sum_total_tf
    an = make_analyzer(single.analyzer_name)
    for qt in QUERIES:
        q = parse_query(qt, an)
        d1, s1 = score_blockmax(single, q, 10)
        d2, s2 = score_blockmax(sharded, q, 10)
        assert np.array_equal(d1, d2), qt
        assert np.array_equal(s1, s2), qt
        d3, s3 = score_exhaustive(sharded, q, 10)
        assert np.array_equal(d1, d3) and np.array_equal(s1, s3), qt


def test_sharded_rejects_overlap(built_indexes):
    from lucene_ray.state.sharded import ShardedReader

    full_dir, a_dir, b_dir = built_indexes
    with pytest.raises(ValueError, match="overlap"):
        ShardedReader([full_dir, a_dir])


def test_check_index_ok(built_indexes):
    from lucene_ray.state.checkindex import check_index

    full_dir, _, _ = built_indexes
    report = check_index(full_dir)
    assert report["ok"] and report["num_terms"] > 0
    assert report["num_postings"] > 0


def test_check_index_detects_tamper(built_indexes, tmp_path):
    from lucene_ray.state.checkindex import IndexCorruptError, check_index

    full_dir, _, _ = built_indexes
    bad_dir = str(tmp_path / "tampered")
    shutil.copytree(full_dir, bad_dir)
    seg = sorted(
        f for f in os.listdir(os.path.join(bad_dir, "segments"))
        if f.endswith(".terms.parquet")
    )[0]
    path = os.path.join(bad_dir, "segments", seg)
    t = pq.read_table(path)
    df = t.column("doc_freq").to_pylist()
    df[0] += 1  # corrupt one doc_freq
    cols = {n: t.column(n) for n in t.schema.names}
    cols["doc_freq"] = pa.array(df, pa.int64())
    pq.write_table(pa.table(cols), path)
    with pytest.raises(IndexCorruptError, match="stats mismatch"):
        check_index(bad_dir)
    report = check_index(bad_dir, raise_on_error=False)
    assert not report["ok"]


def test_check_index_detects_bitflip_via_crc(built_indexes, tmp_path):
    """Per-file CRC32 (CodecUtil footer analogue) catches a single flipped
    byte in a posting blob even when the decode still 'succeeds'."""
    from lucene_ray.state.checkindex import check_index

    full_dir, _, _ = built_indexes
    bad_dir = str(tmp_path / "bitflip")
    shutil.copytree(full_dir, bad_dir)
    post = sorted(
        f for f in os.listdir(os.path.join(bad_dir, "segments"))
        if f.endswith(".post")
    )[0]
    path = os.path.join(bad_dir, "segments", post)
    with open(path, "r+b") as f:
        f.seek(-1, os.SEEK_END)
        last = f.read(1)
        f.seek(-1, os.SEEK_END)
        f.write(bytes([last[0] ^ 0xFF]))
    report = check_index(bad_dir, raise_on_error=False)
    assert any("crc32 mismatch" in e for e in report["errors"])


def test_distributed_search_matches_single(built_indexes):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_blockmax
    from lucene_ray.pipelines.distributed_search import search_sharded
    from lucene_ray.state.reader import IndexReader

    full_dir, a_dir, b_dir = built_indexes
    single = IndexReader(full_dir)
    an = make_analyzer(single.analyzer_name)
    merged = search_sharded([a_dir, b_dir], QUERIES, k=10)
    for qid, qt in enumerate(QUERIES):
        d_ref, s_ref = score_blockmax(single, parse_query(qt, an), 10)
        d_got, s_got = merged[qid]
        assert np.array_equal(d_ref, d_got), qt
        assert np.array_equal(s_ref, s_got), qt


def test_incremental_add_batch(ray_session, tmp_path):
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_blockmax
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.incremental import add_batch, open_index
    from lucene_ray.state.reader import IndexReader

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cfg = IndexConfig(num_partitions=4, exchange="files")
    root = str(tmp_path / "incr")
    thirds = [
        tbl.filter(pa.compute.less(tbl.column("doc_id"), 150)),
        tbl.filter(
            pa.compute.and_(
                pa.compute.greater_equal(tbl.column("doc_id"), 150),
                pa.compute.less(tbl.column("doc_id"), 300),
            )
        ),
        tbl.filter(pa.compute.greater_equal(tbl.column("doc_id"), 300)),
    ]
    for part in thirds:
        add_batch(root, ray.data.from_arrow(part), cfg)

    mono_dir = str(tmp_path / "mono")
    build_index(ray.data.from_arrow(tbl), mono_dir, cfg)
    mono = IndexReader(mono_dir)
    incr = open_index(root)
    assert incr.doc_count == mono.doc_count
    an = make_analyzer(mono.analyzer_name)
    for qt in QUERIES:
        q = parse_query(qt, an)
        d1, s1 = score_blockmax(mono, q, 10)
        d2, s2 = score_blockmax(incr, q, 10)
        assert np.array_equal(d1, d2) and np.array_equal(s1, s2), qt

    # overlapping doc range is refused and not published
    with pytest.raises(ValueError, match="fresh doc-id range"):
        add_batch(root, ray.data.from_arrow(thirds[0]), cfg)
    assert incr.doc_count == open_index(root).doc_count


def test_compact_shards_equals_monolithic(ray_session, built_indexes, tmp_path):
    import glob
    import hashlib

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_blockmax
    from lucene_ray.pipelines.merge import compact_shards
    from lucene_ray.state.checkindex import check_index
    from lucene_ray.state.reader import IndexReader

    full_dir, a_dir, b_dir = built_indexes
    out = str(tmp_path / "compacted")
    manifest = compact_shards([a_dir, b_dir], out)
    mono = IndexReader(full_dir)
    assert manifest["doc_count"] == mono.doc_count
    assert manifest["num_postings"] == mono.manifest["num_postings"]
    assert check_index(out)["ok"]

    def seg_hash(d):
        h = hashlib.md5()
        for f in sorted(glob.glob(f"{d}/segments/*.post")):
            h.update(open(f, "rb").read())
        return h.hexdigest()

    # merged segments are byte-identical to the monolithic build (same
    # sorted-term encode order, same doc order, no heavy splits)
    assert seg_hash(out) == seg_hash(full_dir)

    merged = IndexReader(out)
    an = make_analyzer(mono.analyzer_name)
    for qt in QUERIES:
        q = parse_query(qt, an)
        d1, s1 = score_blockmax(mono, q, 10)
        d2, s2 = score_blockmax(merged, q, 10)
        assert np.array_equal(d1, d2) and np.array_equal(s1, s2), qt


def test_search_dataset_over_incremental_root(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.incremental import add_batch
    from lucene_ray.pipelines.search import search_dataset

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cfg = IndexConfig(num_partitions=4, exchange="files")
    root = str(tmp_path / "root")
    mask = pa.compute.less(tbl.column("doc_id"), 250)
    add_batch(root, ray.data.from_arrow(tbl.filter(mask)), cfg)
    add_batch(root, ray.data.from_arrow(tbl.filter(pa.compute.invert(mask))), cfg)
    out = search_dataset(root, ["batch", "dup"], k=5, concurrency=2).take_all()
    assert len(out) == 10  # both queries return k hits over the union


def test_compact_heavy_split_shards(ray_session, tmp_path):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_blockmax
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.merge import compact_shards
    from lucene_ray.state.checkindex import check_index
    from lucene_ray.state.reader import IndexReader

    import ray.data

    tbl = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    cfg = IndexConfig(
        num_partitions=4, exchange="files",
        heavy_df_threshold=50, sample_rate=1.0, bucket_shift=6,
    )
    mask = pa.compute.less(tbl.column("doc_id"), 250)
    a_dir, b_dir = str(tmp_path / "ha"), str(tmp_path / "hb")
    ma = build_index(ray.data.from_arrow(tbl.filter(mask)), a_dir, cfg)
    build_index(
        ray.data.from_arrow(tbl.filter(pa.compute.invert(mask))), b_dir, cfg
    )
    assert ma["heavy_terms"]  # splits actually happened
    out = str(tmp_path / "hmerged")
    compact_shards([a_dir, b_dir], out)
    assert check_index(out)["ok"]

    mono_dir = str(tmp_path / "hmono")
    build_index(
        ray.data.from_arrow(tbl), mono_dir,
        IndexConfig(num_partitions=4, exchange="files"),
    )
    mono = IndexReader(mono_dir)
    merged = IndexReader(out)
    assert merged.manifest["num_postings"] == mono.manifest["num_postings"]
    an = make_analyzer(mono.analyzer_name)
    for qt in QUERIES:
        q = parse_query(qt, an)
        d1, s1 = score_blockmax(mono, q, 10)
        d2, s2 = score_blockmax(merged, q, 10)
        assert np.array_equal(d1, d2) and np.array_equal(s1, s2), qt


def test_sharded_set_filter_and_str_values(ray_session, tmp_path):
    """TermInSet filters across doc-range shards: per-shard SORTED string
    sidecars, filter_docs concatenates in global doc order; results match
    a monolithic index with the same sidecar."""
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.incremental import add_batch, open_index
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.docvalues import write_str_doc_values

    texts = [f"alpha doc {i}" for i in range(12)]
    langs = ["en", "de", "fr"] * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(range(12), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
    )
    # sharded root: two batches
    root = str(tmp_path / "root")
    lo = tbl.filter(pa.compute.less(tbl.column("doc_id"), 6))
    hi = tbl.filter(pa.compute.greater_equal(tbl.column("doc_id"), 6))
    import os

    add_batch(root, ray.data.from_arrow(lo), cfg, doc_count=6)
    add_batch(root, ray.data.from_arrow(hi), cfg, doc_count=6)
    s0 = os.path.join(root, "shards", "shard-00000")
    s1 = os.path.join(root, "shards", "shard-00001")
    for shard_dir, part in ((s0, lo), (s1, hi)):
        write_str_doc_values(
            ray.data.from_arrow(part.select(["doc_id", "lang"])),
            shard_dir,
            "lang",
        )
    # monolithic twin
    mono = str(tmp_path / "mono")
    build_index(ray.data.from_arrow(tbl), mono, cfg, doc_count=12)
    write_str_doc_values(
        ray.data.from_arrow(tbl.select(["doc_id", "lang"])), mono, "lang"
    )
    an = make_analyzer("en_nostem_simple")
    q = parse_query("alpha lang:(en fr)", an)
    sharded = open_index(root)
    want = [d for d in range(12) if langs[d] in ("en", "fr")]
    assert matching_docs(get_reader(mono), q).tolist() == want
    assert matching_docs(sharded, q).tolist() == want


def test_sharded_spans_match_single_index(tmp_path, ray_session):
    """Doc-range-sharded span serving must equal the single-index result
    exactly for every span query type (global stats + TopDocs.merge)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.spans import (
        SpanContainingQuery,
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanPositionRangeQuery,
        SpanWithinQuery,
        score_span,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    rng = np.random.default_rng(97)
    vocab = ["data", "stream", "batch", "scan", "merge", "key", "dup"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 15))))
        for _ in range(240)
    ]
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        positions=True, sample_rate=1.0,
    )

    def build(path, lo, hi):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(texts[lo:hi], pa.string()),
            }
        )
        build_index(ray.data.from_arrow(tbl), str(path), cfg,
                    doc_count=hi - lo)

    build(tmp_path / "full", 0, 240)
    build(tmp_path / "a", 0, 80)
    build(tmp_path / "b", 80, 160)
    build(tmp_path / "c", 160, 240)
    reader = get_reader(str(tmp_path / "full"))
    svc = ShardedSearchService(
        [str(tmp_path / d) for d in ("a", "b", "c")]
    )
    big = SpanNearQuery(terms=("data", "stream"), slop=3, in_order=True)
    queries = [
        SpanNearQuery(terms=("data", "stream"), slop=2, in_order=True),
        SpanNearQuery(terms=("key", "merge"), slop=3, in_order=False),
        SpanFirstQuery("batch", 3),
        SpanPositionRangeQuery("scan", 1, 6),
        SpanOrQuery(terms=("dup", "key", "zzzmissing")),
        SpanNotQuery(include="data", exclude="batch", pre=1, post=1),
        SpanContainingQuery(big=big, little="key"),
        SpanWithinQuery(big=big, little="key"),
    ]
    try:
        res = svc.search_spans(queries, k=12)
        for i, q in enumerate(queries):
            d, s = score_span(reader, q, 12)
            assert np.array_equal(d, res[i][0]), q
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(res[i][1], np.float64)
            )
    finally:
        svc.shutdown()


def test_sharded_payloads_match_single_index(tmp_path, ray_session):
    """Sharded PayloadScoreQuery == single-index results exactly (the
    fold is per-doc; doc-range shards partition the fold's domain)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.payloads import score_payload
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    rng = np.random.default_rng(181)
    vocab = ["alpha", "beta", "gamma", "delta"]
    texts = [
        " ".join(
            f"{w}|{int(rng.integers(1, 9))}"
            for w in rng.choice(vocab, size=int(rng.integers(2, 8)))
        )
        for _ in range(150)
    ]
    cfg = IndexConfig(
        analyzer="whitespace_payload", norm_kind="exact", num_partitions=2,
        positions=True, payloads=True, sample_rate=1.0,
    )

    def build(path, lo, hi):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(texts[lo:hi], pa.string()),
            }
        )
        build_index(ray.data.from_arrow(tbl), str(path), cfg,
                    doc_count=hi - lo)

    build(tmp_path / "full", 0, 150)
    build(tmp_path / "a", 0, 75)
    build(tmp_path / "b", 75, 150)
    reader = get_reader(str(tmp_path / "full"))
    svc = ShardedSearchService([str(tmp_path / "a"), str(tmp_path / "b")])
    queries = [("alpha", "max"), ("beta", "sum"), ("gamma", "avg"),
               ("delta", "min")]
    try:
        res = svc.search_payloads(queries, k=15)
        for i, (term, fn) in enumerate(queries):
            d, s = score_payload(reader, term, k=15, function=fn)
            assert np.array_equal(d, res[i][0]), (term, fn)
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(res[i][1], np.float64)
            )
    finally:
        svc.shutdown()


def test_sharded_phrase_synonym_multiphrase_parity(tmp_path, ray_session):
    """The r4 pruned executors under GlobalStatsView: sharded phrase /
    synonym / multi-phrase results == single index exactly (global df,
    local positions)."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        MultiPhrase,
        SynonymQuery,
        parse_query,
        score_blockmax,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    rng = np.random.default_rng(271)
    vocab = ["data", "stream", "batch", "scan", "merge", "key"]
    texts = [
        " ".join(rng.choice(vocab, size=int(rng.integers(3, 14))))
        for _ in range(210)
    ]
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        positions=True, sample_rate=1.0,
    )

    def build(path, lo, hi):
        tbl = pa.table(
            {
                "doc_id": pa.array(range(lo, hi), pa.int64()),
                "text": pa.array(texts[lo:hi], pa.string()),
            }
        )
        build_index(ray.data.from_arrow(tbl), str(path), cfg,
                    doc_count=hi - lo)

    build(tmp_path / "full", 0, 210)
    build(tmp_path / "a", 0, 70)
    build(tmp_path / "b", 70, 140)
    build(tmp_path / "c", 140, 210)
    reader = get_reader(str(tmp_path / "full"))
    an = make_analyzer("en_nostem_simple")
    svc = ShardedSearchService([str(tmp_path / d) for d in ("a", "b", "c")])
    try:
        # string phrases through the normal sharded search()
        phrase_qs = ['"data stream"', '"batch scan"', '"merge key" batch']
        res = svc.search(phrase_qs, k=12)
        for i, qt in enumerate(phrase_qs):
            d, s = score_blockmax(reader, parse_query(qt, an), 12)
            assert np.array_equal(d, res[i][0]), qt
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(res[i][1], np.float64)
            )
        # synonym + multi-phrase objects per shard via topk (actor path)
        import ray as _ray

        queries = [
            (0, SynonymQuery(terms=("data", "stream", "zzzmissing"))),
            (1, MultiPhrase(term_arrays=(("data", "batch"), ("stream",)),
                            offsets=(0, 1))),
        ]
        all_terms = ["batch", "data", "stream", "zzzmissing"]
        df_map = {}
        for shard_stats in _ray.get(
            [a.term_stats.remote(all_terms) for a in svc._actors]
        ):
            for t, (df, ttf) in shard_stats.items():
                d0, t0 = df_map.get(t, (0, 0))
                df_map[t] = (d0 + df, t0 + ttf)
        per_shard = _ray.get([
            a.topk.remote(queries, 12, svc.doc_count, svc.sum_total_tf,
                          df_map)
            for a in svc._actors
        ])
        for qid, q in queries:
            entries = []
            for shard_out in per_shard:
                docs, scores = shard_out[qid]
                entries.extend(
                    zip((-x for x in scores.tolist()), docs.tolist())
                )
            entries.sort()
            top = entries[:12]
            got_d = np.asarray([d for _, d in top], dtype=np.int64)
            got_s = np.asarray([-s for s, _ in top])
            d, s = score_blockmax(reader, q, 12)
            assert np.array_equal(d, got_d), q
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), np.asarray(got_s, np.float64)
            )
    finally:
        svc.shutdown()


def test_sharded_term_automaton_matches_single(tmp_path, ray_session):
    """Doc-range-sharded TermAutomatonQuery serving under global stats
    equals the single-index result exactly (incl. a shard missing some
    automaton terms entirely)."""
    import numpy as np

    from lucene_ray.functions.term_automaton import (
        ANY,
        TermAutomatonQuery,
        score_term_automaton,
    )
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.pipelines.search import get_reader

    from test_engine_oracle import build_from_lists, make_corpus

    doc_ids, texts = make_corpus(n_docs=160, seed=47)
    # shard B gets doc texts stripped of 'alpha' so one automaton term
    # is entirely absent there
    texts = list(texts)
    for i in range(80, 160):
        texts[i] = texts[i].replace("alpha", "kappa")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(tmp_path / "full", doc_ids, texts, cfg)
    build_from_lists(tmp_path / "a", doc_ids[:80], texts[:80], cfg)
    build_from_lists(tmp_path / "b", doc_ids[80:], texts[80:], cfg)

    def qa():
        q = TermAutomatonQuery()
        s1, s2 = q.create_state(), q.create_state()
        q.add_transition(0, s1, "alpha")
        q.add_any_transition(s1, s1)
        q.add_transition(s1, s2, "beta")
        q.set_accept(s2)
        return q.finish()

    def qb():
        q = TermAutomatonQuery()
        s1, s2 = q.create_state(), q.create_state()
        q.add_transition(0, s1, "kappa")
        q.add_transition(s1, s2, "mu")
        q.add_transition(0, s2, "mu")
        q.set_accept(s2)
        return q.finish()

    reader = get_reader(str(tmp_path / "full"))
    svc = ShardedSearchService([str(tmp_path / "a"), str(tmp_path / "b")])
    try:
        got = svc.search_automata([qa(), qb()], k=10)
        for qid, q in ((0, qa()), (1, qb())):
            d, s = score_term_automaton(reader, q, 10)
            assert np.array_equal(d, got[qid][0]), qid
            np.testing.assert_array_equal(
                np.asarray(s, np.float64), got[qid][1]
            )
    finally:
        svc.shutdown()
