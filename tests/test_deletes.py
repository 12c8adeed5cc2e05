"""liveDocs tombstones: delete/update visibility + compaction semantics.

Reference analogues: IndexWriter.deleteDocuments/updateDocument
(index/IndexWriter.java:1845) and merge-time liveDocs application
(index/SegmentMerger.java). Invariants tested:

* deletes drop docs from every query path (top-k, count, matching set)
  WITHOUT changing collection/term stats (pre-merge semantics);
* publishing deletes yields a fresh reader (warm caches can't serve stale
  liveDocs);
* update = tombstone + fresh-shard append: only the newest version matches;
* compaction physically removes dead postings and re-bases stats — the
  compacted index is result-identical to a fresh build of the live corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def _docs(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


TEXTS = [
    "alpha beta gamma delta",
    "alpha beta beta",
    "gamma delta epsilon",
    "alpha epsilon zeta",
    "beta gamma zeta zeta",
    "delta delta alpha",
]


@pytest.fixture()
def built_index(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index

    out = str(tmp_path / "idx")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(_docs(TEXTS)), out, cfg, doc_count=len(TEXTS))
    return out


def test_delete_drops_from_all_query_paths(built_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import count_matches, parse_query
    from lucene_ray.pipelines.search import search
    from lucene_ray.state.deletes import delete_docs

    an = make_analyzer("en_nostem_simple")
    before = search(built_index, "alpha", k=10)
    assert 0 in before.column("doc_id").to_pylist()
    n_before = count_matches(
        _fresh_reader(built_index), parse_query("alpha", an)
    )

    delete_docs(built_index, [0, 3])
    after = search(built_index, "alpha", k=10)
    got = after.column("doc_id").to_pylist()
    assert 0 not in got and 3 not in got
    reader = _fresh_reader(built_index)
    assert count_matches(reader, parse_query("alpha", an)) == n_before - 2
    # pre-merge semantics: stats still count the dead docs
    assert reader.doc_count == len(TEXTS)
    assert reader.term_stats("alpha")[0] == 4  # df unchanged by deletes


def _fresh_reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def test_delete_invalidates_warm_reader(built_index):
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs

    r1 = get_reader(built_index)
    delete_docs(built_index, [1])
    r2 = get_reader(built_index)
    assert r1 is not r2  # tombstone publish == reopen
    assert r2.deleted is not None and 1 in r2.deleted


def test_scores_unchanged_for_surviving_docs(built_index):
    """Deleting docs must not perturb surviving docs' BM25 scores
    (stats are untouched pre-merge)."""
    from lucene_ray.pipelines.search import search
    from lucene_ray.state.deletes import delete_docs

    before = {
        r["doc_id"]: r["score"]
        for r in search(built_index, "beta gamma", k=10).to_pylist()
    }
    delete_docs(built_index, [4])
    after = {
        r["doc_id"]: r["score"]
        for r in search(built_index, "beta gamma", k=10).to_pylist()
    }
    assert 4 not in after
    for d, s in after.items():
        assert s == before[d]


def test_update_batch_latest_wins(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.incremental import add_batch, update_batch
    from lucene_ray.pipelines.search import search

    root = str(tmp_path / "root")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    add_batch(root, ray.data.from_arrow(_docs(TEXTS)), cfg, doc_count=len(TEXTS))
    # re-ingest doc 0 under a fresh id with amended text; tombstone the old
    upd = _docs(["alpha beta gamma delta refreshed"], ids=[100])
    update_batch(root, ray.data.from_arrow(upd), [0], cfg)

    hits = search(root, "refreshed", k=10).column("doc_id").to_pylist()
    assert hits == [100]
    alpha_hits = search(root, "alpha", k=10).column("doc_id").to_pylist()
    assert 0 not in alpha_hits and 100 in alpha_hits


def test_compaction_equals_fresh_build_of_live_corpus(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.incremental import add_batch
    from lucene_ray.pipelines.merge import compact_root
    from lucene_ray.pipelines.search import search
    from lucene_ray.state.deletes import delete_docs
    from lucene_ray.state.reader import IndexReader

    root = str(tmp_path / "root")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    add_batch(root, ray.data.from_arrow(_docs(TEXTS[:4])), cfg, doc_count=4)
    add_batch(
        root,
        ray.data.from_arrow(_docs(TEXTS[4:], ids=[4, 5])),
        cfg,
        doc_count=2,
    )
    delete_docs(root, [1, 4])

    out = str(tmp_path / "compacted")
    manifest = compact_root(root, out)
    assert manifest["doc_count"] == 4  # live docs only, via docmap sidecar

    # gold standard: fresh build over exactly the live corpus
    live_ids = [0, 2, 3, 5]
    live = _docs([TEXTS[i] for i in live_ids], ids=live_ids)
    ref = str(tmp_path / "ref")
    build_index(ray.data.from_arrow(live), ref, cfg, doc_count=4)

    r_out = IndexReader(out)
    r_ref = IndexReader(ref)
    assert r_out.doc_count == r_ref.doc_count
    assert r_out.sum_total_tf == r_ref.sum_total_tf
    for q in ("alpha", "beta gamma", "+delta -beta", "zeta epsilon ~1"):
        a = search(out, q, k=10)
        b = search(ref, q, k=10)
        assert a.column("doc_id").to_pylist() == b.column("doc_id").to_pylist()
        assert a.column("score").to_pylist() == b.column("score").to_pylist()


def test_append_reopens_warm_reader(ray_session, tmp_path):
    """NRT visibility: publishing a NEW shard must reopen a warm cached
    reader on the next get_reader call (commit fingerprint in the cache
    key), exactly like publishing tombstones does — and the sharded
    service sees the append on its next query too."""
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.incremental import add_batch
    from lucene_ray.pipelines.search import get_reader, search

    root = str(tmp_path / "nrt_root")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
    )
    add_batch(root, ray.data.from_arrow(_docs(TEXTS[:4])), cfg, doc_count=4)
    r1 = get_reader(root)
    df1, ttf1 = r1.term_stats("alpha")
    hits1 = search(root, "alpha", k=10).num_rows
    add_batch(
        root,
        ray.data.from_arrow(_docs(["alpha alpha", "alpha beta"], [10, 11])),
        cfg,
        doc_count=2,
    )
    r2 = get_reader(root)
    assert r2 is not r1  # new commit point -> new reader
    df2, ttf2 = r2.term_stats("alpha")
    assert df2 == df1 + 2 and ttf2 == ttf1 + 3
    hits2 = search(root, "alpha", k=10).num_rows
    assert hits2 == hits1 + 2
