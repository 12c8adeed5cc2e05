"""Composite-feature integration: the round-2 features interact (positions
x incremental shards x liveDocs x filters x groups) — each pairwise combo
a real user would hit gets an end-to-end check."""

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


def test_phrase_over_updated_incremental_root(ray_session, tmp_path):
    """Phrase search across shards with tombstones: only the newest version
    of an updated doc matches the phrase."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.incremental import add_batch, update_batch
    from lucene_ray.pipelines.search import get_reader

    root = str(tmp_path / "root")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        positions=True,
    )
    add_batch(
        root,
        ray.data.from_arrow(
            _docs(["data stream pipeline", "stream data only"], [0, 1])
        ),
        cfg, doc_count=2,
    )
    add_batch(
        root,
        ray.data.from_arrow(_docs(["plain data stream row"], [10])),
        cfg, doc_count=1,
    )
    an = make_analyzer("en_nostem_simple")
    r = get_reader(root)
    q = parse_query('"data stream"', an)
    assert matching_docs(r, q).tolist() == [0, 10]

    # update doc 0: new version drops the phrase
    update_batch(
        root,
        ray.data.from_arrow(_docs(["stream then data"], [100])),
        [0], cfg,
    )
    r2 = get_reader(root)
    assert matching_docs(r2, q).tolist() == [10]
    # sloppy: plain reversal (doc 1) needs slop 2; the replacement doc 100
    # is reversed WITH a (stopword-gapped) token between -> slop 3
    got2 = matching_docs(r2, parse_query('"data stream"~2', an)).tolist()
    assert got2 == [1, 10]
    got3 = matching_docs(r2, parse_query('"data stream"~3', an)).tolist()
    assert 100 in got3 and 0 not in got3


def test_groups_filters_deletes_combo(ray_session, tmp_path):
    """MUST multi-term group + range FILTER + tombstones in one query."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.deletes import delete_docs
    from lucene_ray.state.docvalues import write_doc_values

    texts = ["merge sort", "mercury lane", "sorted merge row", "plain row"]
    vals = [10, 20, 30, 40]
    out = str(tmp_path / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(vals, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=4)
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    an = make_analyzer("en_nostem_simple")
    q = parse_query("+mer* ts:[10 TO 30]", an)
    r = get_reader(out)
    assert matching_docs(r, q).tolist() == [0, 1, 2]
    delete_docs(out, [1])
    r2 = get_reader(out)
    assert matching_docs(r2, q).tolist() == [0, 2]
    # filter cuts independently of the group
    q2 = parse_query("+mer* ts:[25 TO 99]", an)
    assert matching_docs(r2, q2).tolist() == [2]


def test_docvalues_rewrite_replaces_files(ray_session, tmp_path):
    """write_doc_values twice (different batching) must not accumulate
    stale files — range results reflect only the latest write."""
    import ray.data

    from lucene_ray.state.docvalues import DocValues, write_doc_values

    out = str(tmp_path / "dv")
    t1 = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "v": pa.array([5, 6, 7], pa.int64())}
    )
    write_doc_values(ray.data.from_arrow(t1), out, "v")
    t2 = pa.table(
        {"doc_id": pa.array([0, 1, 2], pa.int64()),
         "v": pa.array([50, 60, 70], pa.int64())}
    )
    write_doc_values(ray.data.from_arrow(t2), out, "v")
    dv = DocValues(out, "v")
    assert dv.range_docs(0, 10).tolist() == []
    assert dv.range_docs(50, 70).tolist() == [0, 1, 2]
    assert dv.values_for(np.asarray([1])).tolist() == [60]
