"""Serving pools: SearchService and ShardedSearchService parity with the
driver-side executors, plus ConstantScoreQuery."""

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    matching_docs,
    parse_query,
    score_blockmax,
    score_constant,
)
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus

QUERIES = ["alpha", "alpha beta", "alpha AND beta", "kappa -mu", "alp*", "zzz"]


@pytest.fixture(scope="module")
def idx(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=250, seed=41)
    out = tmp_path_factory.mktemp("svc") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    return str(out)


def test_search_service_matches_driver(idx, ray_session):
    from lucene_ray.pipelines.search import SearchService

    reader = IndexReader(idx)
    an = make_analyzer("standard_en")
    svc = SearchService(idx, num_searchers=2)
    svc.warm(QUERIES[:2])
    t = svc.search(QUERIES, k=5, batch_size=2)
    svc.shutdown()
    df = t.to_pandas()
    for i, qt in enumerate(QUERIES):
        got = df[df.query_id == i].sort_values("rank")
        d, s = score_blockmax(reader, parse_query(qt, an), 5)
        assert np.array_equal(got["doc_id"].to_numpy(), d), qt
        np.testing.assert_array_equal(
            got["score"].to_numpy(), np.asarray(s, dtype=np.float64), qt
        )


def test_sharded_service_warm_repeat(idx, tmp_path, ray_session):
    from lucene_ray.pipelines.distributed_search import ShardedSearchService

    doc_ids, texts = make_corpus(n_docs=250, seed=41)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(tmp_path / "a", doc_ids[:100], texts[:100], cfg)
    build_from_lists(tmp_path / "b", doc_ids[100:], texts[100:], cfg)
    svc = ShardedSearchService([str(tmp_path / "a"), str(tmp_path / "b")])
    reader = IndexReader(idx)
    an = make_analyzer("standard_en")
    r1 = svc.search(QUERIES, k=5)
    r2 = svc.search(QUERIES, k=5)  # warm repeat
    svc.shutdown()
    for i, qt in enumerate(QUERIES):
        d, s = score_blockmax(reader, parse_query(qt, an), 5)
        for r in (r1, r2):
            assert np.array_equal(d, r[i][0]), qt
            assert np.array_equal(
                np.asarray(s), np.asarray(r[i][1])
            ), qt


def test_sharded_service_sees_new_deletes(tmp_path, ray_session):
    """Tombstones published AFTER the shard actors warmed up must filter
    results on the next query (fingerprint-keyed reopen), matching the
    driver-side delete-aware scorer."""
    from lucene_ray.pipelines.distributed_search import ShardedSearchService
    from lucene_ray.state.deletes import delete_docs

    doc_ids, texts = make_corpus(n_docs=120, seed=47)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=2,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(tmp_path / "a", doc_ids[:60], texts[:60], cfg)
    build_from_lists(tmp_path / "b", doc_ids[60:], texts[60:], cfg)
    dirs = [str(tmp_path / "a"), str(tmp_path / "b")]
    svc = ShardedSearchService(dirs)
    try:
        warm = svc.search(["alpha"], k=10)[0]
        assert len(warm[0]) > 0
        # tombstone the current top hit on whichever shard holds it
        top = int(warm[0][0])
        delete_docs(dirs[0] if top < 60 else dirs[1], [top])
        after = svc.search(["alpha"], k=10)[0]
        assert top not in after[0].tolist()
        # remaining ranking equals the warm ranking minus the deleted doc
        # (stats stay pre-merge, so surviving scores are unchanged)
        survivors = [
            (d, s) for d, s in zip(warm[0].tolist(), warm[1].tolist())
            if d != top
        ]
        # (a new doc may enter at the tail of the k-window; the surviving
        # prefix must match exactly)
        assert after[0].tolist()[: len(survivors)] == [d for d, _ in survivors]
    finally:
        svc.shutdown()


def test_search_after_paging(idx):
    from lucene_ray.functions.query import score_after, score_exhaustive

    reader = IndexReader(idx)
    an = make_analyzer("standard_en")
    for qt in ["alpha", "alpha beta", "alpha AND beta"]:
        q = parse_query(qt, an)
        full_d, full_s = score_exhaustive(reader, q, 15)
        pages_d, pages_s = [], []
        after = None
        for _ in range(3):
            d, s = score_after(reader, q, 5, after=after)
            if len(d) == 0:
                break
            pages_d.append(d)
            pages_s.append(s)
            after = (float(s[-1]), int(d[-1]))
        got_d = np.concatenate(pages_d) if pages_d else np.empty(0, np.int64)
        got_s = np.concatenate(pages_s) if pages_s else np.empty(0)
        assert np.array_equal(full_d, got_d), qt
        assert np.array_equal(np.asarray(full_s), np.asarray(got_s)), qt
        # anchored past the end -> empty
        if len(full_d):
            d, s = score_after(reader, q, 5, after=(-1.0, 0))
            assert len(d) == 0 or (np.asarray(s, dtype=np.float64) < -1.0).all()


def test_constant_score(idx):
    reader = IndexReader(idx)
    an = make_analyzer("standard_en")
    for qt in QUERIES:
        q = parse_query(qt, an)
        d, s = score_constant(reader, q, 5, boost=2.0)
        hits = matching_docs(reader, q)
        assert np.array_equal(d, hits[:5])
        assert (s == np.float32(2.0)).all() and len(s) == len(d)
