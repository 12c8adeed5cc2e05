"""Tiered shard maintenance + positional compaction.

Reference analogues: index/TieredMergePolicy.java (segsPerTier budget,
merge-the-small cost), ConcurrentMergeScheduler (one merge per call),
SegmentMerger's liveDocs application, and per-segment positions carried
through merges.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, ids):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


BATCHES = [
    (["alpha beta", "beta gamma"], [0, 1]),
    (["gamma delta", "alpha delta"], [10, 11]),
    (["beta beta gamma"], [20]),
    (["alpha gamma delta"], [30]),
    (["delta beta"], [40]),
]


def _build_root(root, ray_session, positions=False):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.incremental import add_batch

    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        positions=positions,
    )
    for texts, ids in BATCHES:
        add_batch(root, ray.data.from_arrow(_docs(texts, ids)), cfg,
                  doc_count=len(ids))
    return cfg


def test_select_merge_contiguous_smallest():
    from lucene_ray.pipelines.merge import select_merge

    shards = [
        {"shard_id": i, "doc_min": i * 100, "doc_max": i * 100 + 99,
         "doc_count": c}
        for i, c in enumerate([50, 5, 5, 90, 40])
    ]
    assert select_merge(shards, segs_per_tier=8) is None  # within budget
    win = select_merge(shards, segs_per_tier=4, max_merge_at_once=2)
    # cheapest contiguous 2-window is shards 1+2 (5+5 docs)
    assert [s["shard_id"] for s in win] == [1, 2]


def test_maintain_root_preserves_results(ray_session, tmp_path):
    from lucene_ray.pipelines.incremental import list_shards
    from lucene_ray.pipelines.merge import maintain_root
    from lucene_ray.pipelines.search import search

    root = str(tmp_path / "root")
    _build_root(root, ray_session)
    before = {
        q: (search(root, q, k=10).column("doc_id").to_pylist(),
            search(root, q, k=10).column("score").to_pylist())
        for q in ("alpha", "beta gamma", "+delta -alpha")
    }
    entry = maintain_root(root, segs_per_tier=3, max_merge_at_once=3)
    assert entry is not None
    assert len(list_shards(root)) == 3  # 5 - 3 + 1
    # no deletes -> stats unchanged -> rank AND score identical
    for q, (docs, scores) in before.items():
        after = search(root, q, k=10)
        assert after.column("doc_id").to_pylist() == docs
        assert after.column("score").to_pylist() == scores
    # converge fully
    while maintain_root(root, segs_per_tier=2, max_merge_at_once=8):
        pass
    assert len(list_shards(root)) <= 2
    for q, (docs, scores) in before.items():
        after = search(root, q, k=10)
        assert after.column("doc_id").to_pylist() == docs


def test_compaction_carries_positions(ray_session, tmp_path):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.pipelines.merge import compact_root
    from lucene_ray.pipelines.search import get_reader

    root = str(tmp_path / "root")
    _build_root(root, ray_session, positions=True)
    an = make_analyzer("en_nostem_simple")
    q = parse_query('"beta gamma"', an)
    before = score_exhaustive(get_reader(root), q, 10)
    out = str(tmp_path / "compacted")
    manifest = compact_root(root, out)
    assert manifest["positions"] is True
    after = score_exhaustive(get_reader(out), q, 10)
    assert after[0].tolist() == before[0].tolist() == [1, 20]
    assert after[1].tolist() == before[1].tolist()


def test_split_index(ray_session, tmp_path):
    """PKIndexSplitter: postings-level split by a query — sides
    partition the doc set exactly, per-side collection stats are
    live-only, positions carry, and per-side searches equal the
    original's results restricted to that side."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_exhaustive,
    )
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.merge import split_index
    from lucene_ray.pipelines.search import get_reader

    from test_engine_oracle import build_from_lists, make_corpus

    doc_ids, texts = make_corpus(n_docs=120, seed=33)
    base = str(tmp_path / "base")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=3,
        sample_rate=1.0, positions=True,
    )
    build_from_lists(base, doc_ids, texts, cfg)
    an = make_analyzer("en_nostem_simple")
    reader = get_reader(base)
    hits = set(matching_docs(reader, parse_query("alpha", an)).tolist())

    out_m, out_r = str(tmp_path / "m"), str(tmp_path / "r")
    mm, mr = split_index(base, out_m, out_r, "alpha")
    rm, rr = get_reader(out_m), get_reader(out_r)
    # exact partition, original ids preserved
    got_m = set(rm.all_doc_ids().tolist())
    got_r = set(rr.all_doc_ids().tolist())
    assert got_m == hits and got_r == set(doc_ids) - hits
    assert mm["positions"] and mr["positions"]
    # per-side stats are live-only
    assert mm["doc_count"] == len(hits)
    assert mr["doc_count"] == len(doc_ids) - len(hits)
    assert mm["sum_total_tf"] + mr["sum_total_tf"] == \
        get_reader(base).sum_total_tf
    # a term's docs on each side == the original's docs intersected
    for term in ("beta", "gamma"):
        all_docs = set(
            matching_docs(reader, parse_query(term, an)).tolist()
        )
        assert set(matching_docs(rm, parse_query(term, an)).tolist()) == \
            all_docs & hits
        assert set(matching_docs(rr, parse_query(term, an)).tolist()) == \
            all_docs - hits
    # phrases still work on the split side (positions carried)
    q = parse_query('"kappa mu"', an)
    orig = set(matching_docs(reader, q).tolist())
    assert set(matching_docs(rm, q).tolist()) == orig & hits


def test_multi_split_index(ray_session, tmp_path):
    """MultiPassIndexSplitter: round-robin and sequential modes
    partition the ordinal space exactly (last sequential part takes the
    rounding remainder); parts re-merge losslessly."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.merge import compact_shards, multi_split_index
    from lucene_ray.pipelines.search import get_reader

    from test_engine_oracle import build_from_lists, make_corpus

    doc_ids, texts = make_corpus(n_docs=100, seed=37)
    base = str(tmp_path / "base")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0,
    )
    build_from_lists(base, doc_ids, texts, cfg)

    # round-robin: part i keeps ordinals j % 3 == i
    outs = [str(tmp_path / f"rr{i}") for i in range(3)]
    ms = multi_split_index(base, outs, seq=False)
    for i, out in enumerate(outs):
        ids = get_reader(out).all_doc_ids().tolist()
        assert ids == [d for j, d in enumerate(doc_ids) if j % 3 == i]
        assert ms[i]["doc_count"] == len(ids)
    # sequential: 33/33/34 (remainder to the last part)
    outs_s = [str(tmp_path / f"sq{i}") for i in range(3)]
    multi_split_index(base, outs_s, seq=True)
    sizes = [len(get_reader(o).all_doc_ids()) for o in outs_s]
    assert sizes == [33, 33, 34]
    # lossless: re-merging the round-robin parts == the original
    remerged = str(tmp_path / "remerged")
    compact_shards(outs, remerged)
    an = make_analyzer("en_nostem_simple")
    r0, r1 = get_reader(base), get_reader(remerged)
    assert r1.doc_count == r0.doc_count
    assert r1.sum_total_tf == r0.sum_total_tf
    for term in ("alpha", "beta"):
        q = parse_query(term, an)
        assert matching_docs(r1, q).tolist() == matching_docs(r0, q).tolist()
    with pytest.raises(ValueError):
        multi_split_index(base, [str(tmp_path / "one")])


def test_rearrange_and_bp_merge_time(ray_session, tmp_path):
    """IndexRearranger + merge-time BP: postings-level renumbering in a
    caller-chosen order (no re-analysis), identity via orig_id, phrase
    streams carried; bp_rearrange computes the order from the index
    itself and shrinks the postings on a clustered corpus."""
    import glob
    import os

    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.merge import bp_rearrange, rearrange_index
    from lucene_ray.pipelines.search import get_reader

    rng = np.random.default_rng(13)
    words_a = [f"alpha{i}" for i in range(25)]
    words_b = [f"beta{i}" for i in range(25)]
    texts = []
    for i in range(500):
        pool = words_a if i % 2 == 0 else words_b
        texts.append(" ".join(rng.choice(pool, size=7, replace=False))
                     + (" anchor point" if i % 10 == 0 else ""))
    base = str(tmp_path / "base")
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2,
        sample_rate=1.0, positions=True,
    )
    build_index(ray.data.from_arrow(tbl), base, cfg, doc_count=len(texts))
    r0 = get_reader(base)
    an = make_analyzer("en_nostem_simple")

    # 1. explicit rearrangement: reverse order
    rev = str(tmp_path / "rev")
    new_order = np.arange(len(texts) - 1, -1, -1)
    m = rearrange_index(base, rev, new_order)
    rr = get_reader(rev)
    assert m["doc_count"] == len(texts)
    orig = rr.doc_values("orig_id")
    for term in ("alpha3", "beta7", "anchor"):
        want = set(matching_docs(r0, parse_query(term, an)).tolist())
        got_new = matching_docs(rr, parse_query(term, an))
        assert set(
            int(x) for x in orig.values_for(got_new)
        ) == want, term
    # phrase stream carried and renumbered
    qp = parse_query('"anchor point"', an)
    want = set(matching_docs(r0, qp).tolist())
    got = set(int(x) for x in orig.values_for(matching_docs(rr, qp)))
    assert got == want and len(want) == 50
    with pytest.raises(ValueError):
        rearrange_index(base, str(tmp_path / "dup"), [0, 0, 1])

    # 2. merge-time BP from the index itself
    def post_bytes(d):
        return sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(d, "segments", "*"))
            if f.endswith(".post")
        )

    bp = str(tmp_path / "bp")
    m2, stats = bp_rearrange(base, bp, min_df=2, min_partition_size=16)
    assert stats["cost_after"] < stats["cost_before"]
    assert post_bytes(bp) < post_bytes(base)
    rb = get_reader(bp)
    orig_bp = rb.doc_values("orig_id")
    for term in ("alpha3", "beta7"):
        want = set(matching_docs(r0, parse_query(term, an)).tolist())
        got = set(
            int(x)
            for x in orig_bp.values_for(
                matching_docs(rb, parse_query(term, an))
            )
        )
        assert got == want, term
