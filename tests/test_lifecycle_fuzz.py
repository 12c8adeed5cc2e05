"""Randomized index-lifecycle fuzz: an arbitrary interleaving of
appends, deletes, updates and tiered maintenance must end rank- and
score-identical to a FRESH monolithic build of the surviving corpus
(Lucene's addIndexes/deleteDocuments/updateDocument/forceMerge
equivalence, randomized — the TestIndexWriter* pattern)."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import parse_query, score_blockmax
from lucene_ray.pipelines.build import IndexConfig

WORDS = ["alpha", "beta", "gamma", "delta", "kappa", "mu", "nu", "the"]
QUERIES = ["alpha", "alpha beta", "+gamma -mu", "kappa delta nu ~2",
           '"alpha beta"']


def _mk_ds(ids, texts):
    import ray.data

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )


def _texts(rng, n):
    return [
        " ".join(rng.choice(WORDS, size=int(rng.integers(2, 14))))
        for _ in range(n)
    ]


@pytest.mark.parametrize("seed", [3, 17])
def test_random_lifecycle_equals_fresh_build(ray_session, tmp_path, seed):
    from lucene_ray.pipelines.incremental import add_batch, update_batch
    from lucene_ray.pipelines.merge import maintain_root
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    rng = np.random.default_rng(seed)
    root = str(tmp_path / f"root{seed}")
    os.makedirs(root)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=2,
        positions=True, sample_rate=1.0,
    )
    live: dict = {}  # doc_id -> text (survivors)
    next_id = 0

    def append(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        texts = _texts(rng, n)
        next_id += n
        add_batch(root, _mk_ds(ids, texts), cfg, doc_count=n)
        live.update(zip(ids, texts))

    append(int(rng.integers(5, 15)))  # seed batch
    for _ in range(10):
        op = rng.random()
        if op < 0.45:
            append(int(rng.integers(3, 12)))
        elif op < 0.7 and len(live) > 4:
            victims = [int(v) for v in rng.choice(
                sorted(live), size=min(3, len(live) // 2), replace=False
            )]
            delete_docs(root, victims)
            for v in victims:
                live.pop(v)
        elif op < 0.9 and len(live) > 2:
            nonlocal_ids = [int(v) for v in rng.choice(
                sorted(live), size=2, replace=False
            )]
            n = len(nonlocal_ids)
            new_ids = list(range(next_id, next_id + n))
            new_texts = _texts(rng, n)
            next_id += n
            update_batch(root, _mk_ds(new_ids, new_texts), nonlocal_ids,
                         cfg, doc_count=n)
            for v in nonlocal_ids:
                live.pop(v)
            live.update(zip(new_ids, new_texts))
        else:
            maintain_root(root, segs_per_tier=3, max_merge_at_once=3)

    # fresh monolithic build of the SURVIVING corpus, same global doc ids
    fresh_dir = str(tmp_path / f"fresh{seed}")
    ids = sorted(live)
    from lucene_ray.pipelines.build import build_index

    build_index(
        _mk_ds(ids, [live[i] for i in ids]), fresh_dir, cfg,
        doc_count=len(ids),
    )
    lifecycle = get_reader(root)
    fresh = get_reader(fresh_dir)
    an = make_analyzer("standard_en")
    # stats semantics differ pre-merge (dead docs counted), so compare
    # the RANKED RESULTS after full compaction, which re-bases stats
    from lucene_ray.pipelines.merge import compact_root

    compact_dir = str(tmp_path / f"compact{seed}")
    compact_root(root, compact_dir)
    compacted = get_reader(compact_dir)
    assert compacted.doc_count == fresh.doc_count
    assert compacted.sum_total_tf == fresh.sum_total_tf
    for qt in QUERIES:
        q = parse_query(qt, an)
        d1, s1 = score_blockmax(compacted, q, 10)
        d2, s2 = score_blockmax(fresh, q, 10)
        assert np.array_equal(d1, d2), (seed, qt)
        assert np.array_equal(np.asarray(s1), np.asarray(s2)), (seed, qt)
        # the live (uncompacted) root returns the same DOC SET top-k as
        # the fresh build would over its own pre-merge stats universe —
        # at minimum no tombstoned doc ever surfaces
        dl, _sl = score_blockmax(lifecycle, q, 10)
        assert all(int(x) in live for x in dl), (seed, qt)


@pytest.mark.parametrize("seed", [29])
def test_random_lifecycle_payload_index(ray_session, tmp_path, seed):
    """Same lifecycle interleaving over a payloads-enabled index: after
    full compaction, every payload fold equals a fresh build's (the .pay
    sidecar survives append/delete/update/merge)."""
    from lucene_ray.functions.payloads import payload_doc_scores
    from lucene_ray.pipelines.build import build_index
    from lucene_ray.pipelines.incremental import add_batch, update_batch
    from lucene_ray.pipelines.merge import compact_root, maintain_root
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    rng = np.random.default_rng(seed)
    root = str(tmp_path / "proot")
    os.makedirs(root)
    cfg = IndexConfig(
        analyzer="whitespace_payload", norm_kind="exact", num_partitions=2,
        positions=True, payloads=True, sample_rate=1.0,
    )
    vocab = ["alpha", "beta", "gamma"]
    live: dict = {}
    next_id = 0

    def ptexts(n):
        return [
            " ".join(
                f"{w}|{int(rng.integers(0, 9))}"
                for w in rng.choice(vocab, size=int(rng.integers(2, 9)))
            )
            for _ in range(n)
        ]

    def append(n):
        nonlocal next_id
        ids = list(range(next_id, next_id + n))
        texts = ptexts(n)
        next_id += n
        add_batch(root, _mk_ds(ids, texts), cfg, doc_count=n)
        live.update(zip(ids, texts))

    append(int(rng.integers(5, 12)))
    for _ in range(8):
        op = rng.random()
        if op < 0.45:
            append(int(rng.integers(3, 10)))
        elif op < 0.7 and len(live) > 4:
            victims = [int(v) for v in rng.choice(
                sorted(live), size=min(3, len(live) // 2), replace=False
            )]
            delete_docs(root, victims)
            for v in victims:
                live.pop(v)
        elif op < 0.9 and len(live) > 2:
            old = [int(v) for v in rng.choice(sorted(live), size=2,
                                              replace=False)]
            new_ids = list(range(next_id, next_id + 2))
            new_texts = ptexts(2)
            next_id += 2
            update_batch(root, _mk_ds(new_ids, new_texts), old, cfg,
                         doc_count=2)
            for v in old:
                live.pop(v)
            live.update(zip(new_ids, new_texts))
        else:
            maintain_root(root, segs_per_tier=3, max_merge_at_once=3)

    ids = sorted(live)
    fresh_dir = str(tmp_path / "pfresh")
    build_index(_mk_ds(ids, [live[i] for i in ids]), fresh_dir, cfg,
                doc_count=len(ids))
    compact_dir = str(tmp_path / "pcompact")
    compact_root(root, compact_dir)
    compacted = get_reader(compact_dir)
    fresh = get_reader(fresh_dir)
    assert compacted.has_payloads and fresh.has_payloads
    for term in vocab:
        for fn in ("max", "min", "avg", "sum"):
            d1, s1 = payload_doc_scores(compacted, term, fn)
            d2, s2 = payload_doc_scores(fresh, term, fn)
            assert np.array_equal(d1, d2), (term, fn)
            np.testing.assert_array_equal(
                np.asarray(s1), np.asarray(s2)
            ), (term, fn)
