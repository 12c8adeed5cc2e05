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
