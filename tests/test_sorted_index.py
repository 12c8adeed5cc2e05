"""Index-time sorting (IndexWriterConfig.setIndexSort analogue): renumber
invariants + early-terminating sort-by-field parity against the unsorted
path, including duplicate sort values across the top-k boundary."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import parse_query, score_sort_by_field
from lucene_ray.pipelines.build import IndexConfig, build_index
from lucene_ray.pipelines.sorted_index import (
    assign_sorted_doc_ids,
    build_sorted_index,
    index_sort_field,
    sorted_topk_by_field,
)
from lucene_ray.state.docvalues import write_doc_values
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import make_corpus


def _corpus_table(n=220):
    doc_ids, texts = make_corpus(n_docs=n, seed=11)
    # heavy duplication: ~4 docs per distinct ts value
    ts = [(d * 37) % (n // 4) for d in doc_ids]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(ts, pa.int64()),
        }
    )


def test_assign_sorted_doc_ids_is_sort_permutation(ray_session):
    import ray.data

    tbl = _corpus_table()
    out = (
        assign_sorted_doc_ids(ray.data.from_arrow(tbl), "ts")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    n = len(tbl)
    assert list(out["doc_id"]) == list(range(n))  # dense renumbering
    # new order == lexsort by (ts, orig_id)
    ts = tbl.column("ts").to_numpy()
    ids = tbl.column("doc_id").to_numpy()
    order = np.lexsort((ids, ts))
    assert list(out["orig_id"]) == list(ids[order])
    assert list(out["ts"]) == list(ts[order])
    # every original column survives
    assert set(out.columns) == {"doc_id", "orig_id", "text", "ts"}


@pytest.fixture(scope="module")
def sorted_and_plain(tmp_path_factory, ray_session):
    import ray.data

    tbl = _corpus_table()
    cfg = IndexConfig(num_partitions=4, heavy_df_threshold=None)
    root = tmp_path_factory.mktemp("sortedidx")
    sdir, pdir = str(root / "sorted"), str(root / "plain")
    build_sorted_index(
        ray.data.from_arrow(tbl), sdir, cfg, sort_col="ts",
        doc_count=len(tbl),
    )
    build_index(ray.data.from_arrow(tbl), pdir, cfg, doc_count=len(tbl))
    write_doc_values(
        ray.data.from_arrow(tbl.select(["doc_id", "ts"])), pdir, "ts"
    )
    return sdir, pdir, tbl


def test_sorted_topk_matches_unsorted_sort_by_field(sorted_and_plain):
    sdir, pdir, tbl = sorted_and_plain
    assert index_sort_field(sdir) == "ts"
    assert index_sort_field(pdir) is None
    sreader, preader = IndexReader(sdir), IndexReader(pdir)
    an = make_analyzer("standard_en")
    for qt in ["alpha", "alpha beta", "alpha AND beta", "gamma -delta"]:
        q = parse_query(qt, an)
        for desc in (True, False):
            # k=7 is deliberately inside a run of duplicate ts values
            for k in (7, 10**6):
                pd_, pv = score_sort_by_field(
                    preader, q, "ts", k=k, descending=desc
                )
                sd, sv = sorted_topk_by_field(
                    sreader, q, "ts", k=k, descending=desc
                )
                assert np.array_equal(pd_, sd), (qt, desc, k)
                assert np.array_equal(pv, sv), (qt, desc, k)


def test_sorted_topk_wrong_field_raises(sorted_and_plain):
    sdir, _, _ = sorted_and_plain
    reader = IndexReader(sdir)
    q = parse_query("alpha", make_analyzer("standard_en"))
    with pytest.raises(ValueError):
        sorted_topk_by_field(reader, q, "other_field", k=5)


def test_check_index_validates_sidecars(sorted_and_plain):
    """CheckIndex round-2 extensions: positions/doc-values/term-vectors +
    the index_sort layout invariant; a violated sort invariant is caught."""
    import json
    import os

    from lucene_ray.state.checkindex import check_index

    sdir, pdir, tbl = sorted_and_plain
    assert check_index(sdir)["ok"]
    assert check_index(pdir)["ok"]
    # point the plain (unsorted) index at a sort marker it does not satisfy:
    # its 'ts' doc values are NOT monotone in doc order
    marker = os.path.join(pdir, "index_sort.json")
    with open(marker, "w") as f:
        json.dump({"field": "ts", "order": "asc"}, f)
    try:
        report = check_index(pdir, raise_on_error=False)
        assert not report["ok"]
        assert any("violates field order" in e for e in report["errors"])
    finally:
        os.remove(marker)


def test_single_term_early_termination(tmp_path, ray_session, monkeypatch):
    """The single-term path decodes only edge blocks (plus tie growth) of
    a multi-block posting list — and is result-identical to the full
    TopFieldCollector path on an unsorted index."""
    import ray.data

    from lucene_ray.state import segment as segmod

    n = 2000  # "common" in every doc -> df 2000 -> 8 FOR-blocks
    texts = [f"common filler{i % 17} word{i % 5}" for i in range(n)]
    ts = [(i * 97) % 250 for i in range(n)]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "ts": pa.array(ts, pa.int64()),
        }
    )
    cfg = IndexConfig(num_partitions=2, heavy_df_threshold=None)
    sdir, pdir = str(tmp_path / "s"), str(tmp_path / "p")
    build_sorted_index(
        ray.data.from_arrow(tbl), sdir, cfg, sort_col="ts", doc_count=n
    )
    build_index(ray.data.from_arrow(tbl), pdir, cfg, doc_count=n)
    write_doc_values(
        ray.data.from_arrow(tbl.select(["doc_id", "ts"])), pdir, "ts"
    )
    sreader, preader = IndexReader(sdir), IndexReader(pdir)
    an = make_analyzer("standard_en")
    q = parse_query("common", an)
    total_blocks = sum(tp.n_blocks for tp in sreader.postings("common"))
    assert total_blocks >= 8

    calls = {"n": 0}
    orig = segmod.TermPostings.decode_block

    def counting(self, b):
        calls["n"] += 1
        return orig(self, b)

    monkeypatch.setattr(segmod.TermPostings, "decode_block", counting)
    for desc in (True, False):
        calls["n"] = 0
        full_d, full_v = score_sort_by_field(
            preader, q, "ts", k=5, descending=desc
        )
        sd, sv = sorted_topk_by_field(
            sreader, q, "ts", k=5, descending=desc
        )
        assert np.array_equal(sd, full_d) and np.array_equal(sv, full_v)
        # k=5 + the boundary tie run (ts repeats every 250 values -> ~8
        # docs per value) stays within a couple of edge blocks
        assert calls["n"] <= max(2, total_blocks // 2), (desc, calls["n"])


def test_sorted_path_respects_deletes(sorted_and_plain, tmp_path):
    """Tombstoned docs never surface from the early-terminating path."""
    import shutil

    from lucene_ray.state.deletes import delete_docs

    sdir, _, tbl = sorted_and_plain
    work = str(tmp_path / "delidx")
    shutil.copytree(sdir, work)
    an = make_analyzer("standard_en")
    q = parse_query("alpha", an)
    before_d, before_v = sorted_topk_by_field(
        IndexReader(work), q, "ts", k=8, descending=True
    )
    # tombstone the top hit by its INTERNAL id (deletes live in internal
    # doc-ID space, like every other per-index structure)
    orig_top = int(before_d[0])
    internal = IndexReader(work).doc_values("orig_id")
    pos = int(np.searchsorted(
        np.sort(internal.doc_sorted_vals), orig_top))
    # map orig->internal via the orig_id docvalues (doc_sorted arrays)
    internal_id = int(
        internal.doc_sorted_ids[internal.doc_sorted_vals == orig_top][0]
    )
    delete_docs(work, [internal_id])
    after_d, after_v = sorted_topk_by_field(
        IndexReader(work), q, "ts", k=8, descending=True
    )
    assert orig_top not in after_d.tolist()
    assert len(after_d) == len(before_d)  # backfilled from deeper docs
