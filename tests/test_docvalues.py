"""Numeric doc values: range FILTER clauses + sort-by-field + paging.

Reference analogues: document/IntPoint.java + search/PointRangeQuery.java
(range), search/Sort.java + search/TopFieldCollector.java (field sort),
IndexSearcher.searchAfter (paging). Checked against brute-force python
recomputation on a synthetic corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

TEXTS = [
    "alpha beta gamma",
    "alpha beta",
    "gamma delta",
    "alpha delta delta",
    "beta gamma gamma",
    "alpha",
    "delta beta",
    "gamma alpha beta",
]
# synthetic int64 "timestamp" per doc (deliberately with a duplicate value)
VALS = [50, 10, 70, 30, 70, 20, 60, 40]


@pytest.fixture()
def dv_index(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.docvalues import write_doc_values

    out = str(tmp_path / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "ts": pa.array(VALS, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(
        ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS)
    )
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    return out


def _reader(index_dir):
    from lucene_ray.pipelines.search import get_reader

    return get_reader(index_dir)


def _brute_match(term, lo=None, hi=None):
    out = []
    for d, t in enumerate(TEXTS):
        if term in t.split() and (lo is None or lo <= VALS[d] <= hi):
            out.append(d)
    return out


def test_range_filter_parse_and_match(dv_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query

    an = make_analyzer("en_nostem_simple")
    q = parse_query("alpha ts:[20 TO 50]", an)
    assert q.filters == (("ts", 20, 50),)
    got = matching_docs(_reader(dv_index), q).tolist()
    assert got == _brute_match("alpha", 20, 50)


def test_range_filter_topk_blockmax_equals_exhaustive(dv_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        parse_query,
        score_blockmax,
        score_exhaustive,
    )

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_index)
    for qs in ("alpha ts:[20 TO 50]", "beta gamma ts:[40 TO 70]",
               "+alpha -delta ts:[10 TO 60]"):
        q = parse_query(qs, an)
        bd, bs = score_blockmax(r, q, 10)
        ed, es = score_exhaustive(r, q, 10)
        assert bd.tolist() == ed.tolist()
        assert bs.tolist() == es.tolist()
        lo, hi = q.filters[0][1], q.filters[0][2]
        assert all(lo <= VALS[d] <= hi for d in bd)


def test_pure_filter_query_scores_zero(dv_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive

    an = make_analyzer("en_nostem_simple")
    docs, scores = score_exhaustive(
        _reader(dv_index), parse_query("ts:[30 TO 60]", an), 10
    )
    expect = sorted(d for d in range(len(TEXTS)) if 30 <= VALS[d] <= 60)
    assert docs.tolist() == expect
    assert all(s == 0.0 for s in scores)


def test_range_filter_respects_deletes(dv_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.state.deletes import delete_docs

    delete_docs(dv_index, [3])
    an = make_analyzer("en_nostem_simple")
    got = matching_docs(
        _reader(dv_index), parse_query("ts:[10 TO 70]", an)
    ).tolist()
    assert 3 not in got and len(got) == len(TEXTS) - 1


def test_sort_by_field_and_search_after(dv_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_sort_by_field

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_index)
    q = parse_query("alpha beta gamma delta", an)  # matches every doc
    ref = sorted(range(len(TEXTS)), key=lambda d: (-VALS[d], d))

    docs, vals = score_sort_by_field(r, q, "ts", k=3)
    assert docs.tolist() == ref[:3]
    assert vals.tolist() == [VALS[d] for d in ref[:3]]
    # duplicate-value tie (70) must break by doc asc
    assert docs.tolist()[0:2] == [2, 4]

    d2, v2 = score_sort_by_field(
        r, q, "ts", k=3, after=(int(vals[-1]), int(docs[-1]))
    )
    assert d2.tolist() == ref[3:6]

    asc, _ = score_sort_by_field(r, q, "ts", k=len(TEXTS), descending=False)
    assert asc.tolist() == sorted(range(len(TEXTS)), key=lambda d: (VALS[d], d))


# string SORTED doc values + TermInSetQuery-style set filters
LANGS = ["en", "de", "en", "fr", "en", "de", "zh", "fr"]


@pytest.fixture()
def dv_str_index(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.docvalues import write_str_doc_values

    out = str(tmp_path / "idx_str")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "lang": pa.array(LANGS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    write_str_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "lang"])), out, "lang"
    )
    return out


def test_set_filter_parse_and_match(dv_str_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_str_index)
    q = parse_query("alpha lang:(en fr)", an)
    assert q.filters == (("lang", "in", ("en", "fr")),)
    want = [
        d for d, t in enumerate(TEXTS)
        if "alpha" in t.split() and LANGS[d] in ("en", "fr")
    ]
    assert matching_docs(r, q).tolist() == want


def test_set_filter_pure_and_absent(dv_str_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        matching_docs,
        parse_query,
        score_exhaustive,
    )

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_str_index)
    # pure filter: every doc in the set, score 0, doc-asc order
    docs, scores = score_exhaustive(r, parse_query("lang:(zh fr)", an), 10)
    want = [d for d in range(len(TEXTS)) if LANGS[d] in ("zh", "fr")]
    assert docs.tolist() == want
    assert all(s == 0.0 for s in scores.tolist())
    # absent value matches nothing
    assert matching_docs(r, parse_query("alpha lang:(xx)", an)).tolist() == []
    # empty set is a parse error
    with pytest.raises(ValueError, match="empty set"):
        parse_query("alpha lang:()", an)


def test_set_filter_blockmax_equals_exhaustive(dv_str_index):
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        parse_query,
        score_blockmax,
        score_exhaustive,
    )

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_str_index)
    for qs in ("alpha beta lang:(en)", "+gamma lang:(en de fr)"):
        q = parse_query(qs, an)
        ed, es = score_exhaustive(r, q, 10)
        bd, bs = score_blockmax(r, q, 10)
        assert bd.tolist() == ed.tolist()
        assert bs.tolist() == es.tolist()


def test_str_doc_values_gather(dv_str_index):
    from lucene_ray.state.docvalues import StrDocValues

    dv = StrDocValues(dv_str_index, "lang")
    got = dv.values_for(np.array([0, 3, 6], dtype=np.int64))
    assert got.tolist() == ["en", "fr", "zh"]
    assert dv.in_set_docs({"de"}).tolist() == [1, 5]


# multi-field Sort (SortField[] analogue)
BUCKETS = [2, 1, 2, 1, 2, 1, 2, 1]  # ties everywhere -> second field decides


def test_sort_by_fields_multi_and_paging(ray_session, tmp_path):
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_sort_by_fields
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.docvalues import write_doc_values

    out = str(tmp_path / "idx_multi")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
            "ts": pa.array(VALS, pa.int64()),
            "bucket": pa.array(BUCKETS, pa.int64()),
        }
    )
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "ts"])), out, "ts"
    )
    write_doc_values(
        ray.data.from_arrow(docs.select(["doc_id", "bucket"])), out, "bucket"
    )
    r = _reader(out)
    an = make_analyzer("en_nostem_simple")
    q = parse_query("alpha beta gamma delta", an)  # matches every doc
    fields = [("bucket", True), ("ts", False)]
    ref = sorted(range(len(TEXTS)), key=lambda d: (-BUCKETS[d], VALS[d], d))

    docs_got, vals = score_sort_by_fields(r, q, fields, k=len(TEXTS))
    assert docs_got.tolist() == ref
    assert vals[0].tolist() == [BUCKETS[d] for d in ref]
    assert vals[1].tolist() == [VALS[d] for d in ref]

    # searchAfter paging: pages concatenate to the deep sort
    d1, v1 = score_sort_by_fields(r, q, fields, k=3)
    d2, _ = score_sort_by_fields(
        r, q, fields, k=3,
        after=((int(v1[0][-1]), int(v1[1][-1])), int(d1[-1])),
    )
    assert d1.tolist() + d2.tolist() == ref[:6]


def test_score_feature_functions(dv_index):
    """FeatureQuery: BM25 + weight*F(v) for each FeatureField function,
    vs brute recomputation."""
    import math

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        parse_query,
        score_exhaustive,
        score_feature,
    )

    an = make_analyzer("en_nostem_simple")
    r = _reader(dv_index)
    q = parse_query("alpha beta", an)
    base_d, base_s = score_exhaustive(r, q, len(TEXTS))
    base = dict(zip(base_d.tolist(), base_s.tolist()))
    for fn, kw, F in [
        ("saturation", {"pivot": 30.0}, lambda v: v / (v + 30.0)),
        ("log", {"scale": 2.0}, lambda v: math.log(2.0 + v)),
        (
            "sigmoid",
            {"pivot": 30.0, "exponent": 2.0},
            lambda v: v**2.0 / (v**2.0 + 30.0**2.0),
        ),
    ]:
        d, s = score_feature(
            r, q, "ts", function=fn, weight=0.5, k=len(TEXTS), **kw
        )
        got = dict(zip(d.tolist(), s.tolist()))
        want = {doc: sc + 0.5 * F(VALS[doc]) for doc, sc in base.items()}
        assert got == pytest.approx(want)
    with pytest.raises(ValueError, match="function"):
        score_feature(r, q, "ts", function="cubic")


def test_update_numeric_doc_values(dv_index):
    """updateNumericDocValue overlay generations: newest generation wins
    per doc, range cuts see new values and drop old ones, upsert for a
    doc without a base value, reopen semantics, and filter queries pick
    up the update."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import matching_docs, parse_query
    from lucene_ray.state.docvalues import (
        DocValues,
        doc_values_generation,
        update_numeric_doc_values,
    )

    out = dv_index
    assert doc_values_generation(out, "ts") == 0
    # gen 1: docs 1 and 3 -> 700
    g = update_numeric_doc_values(out, "ts", [1, 3], 700)
    assert g == 1 and doc_values_generation(out, "ts") == 1
    dv = DocValues(out, "ts")
    assert dv.values_for(np.array([1, 3])).tolist() == [700, 700]
    assert dv.values_for(np.array([0, 2])).tolist() == [50, 70]
    # old value 10 (doc 1) gone from the value-sorted view
    assert dv.range_docs(10, 10).tolist() == []
    assert dv.range_docs(700, 700).tolist() == [1, 3]
    # duplicate value survives for untouched docs
    assert dv.range_docs(70, 70).tolist() == [2, 4]
    # gen 2 overrides gen 1 per doc; per-doc values array form
    update_numeric_doc_values(out, "ts", [3, 900], [800, 55])
    dv2 = DocValues(out, "ts")
    assert dv2.values_for(np.array([1, 3])).tolist() == [700, 800]
    # upsert: doc 900 had no base value
    assert dv2.range_docs(55, 55).tolist() == [900]
    # reader cache: stale until reopen_doc_values
    r = _reader(out)
    r.reopen_doc_values()  # fresh load at current generation
    assert r.doc_values("ts").values_for(np.array([3])).tolist() == [800]
    update_numeric_doc_values(out, "ts", [3], 801)
    assert r.doc_values("ts").values_for(np.array([3])).tolist() == [800]
    r.reopen_doc_values("ts")
    assert r.doc_values("ts").values_for(np.array([3])).tolist() == [801]
    # a range FILTER query sees the updated column
    an = make_analyzer("en_nostem_simple")
    q = parse_query("beta ts:[700 TO 900]", an)
    got = matching_docs(r, q).tolist()
    assert got == [d for d in (1, 3) if "beta" in TEXTS[d].split()]
    # errors: empty update, unknown field
    with pytest.raises(ValueError):
        update_numeric_doc_values(out, "ts", [], 1)
    with pytest.raises(FileNotFoundError):
        update_numeric_doc_values(out, "nope", [1], 1)


def test_checkindex_validates_update_overlays(dv_index):
    """CheckIndex: overlay CRC tamper detection + generation
    contiguity."""
    import glob
    import os

    from lucene_ray.state.checkindex import check_index
    from lucene_ray.state.docvalues import update_numeric_doc_values

    out = dv_index
    update_numeric_doc_values(out, "ts", [1], 500)
    update_numeric_doc_values(out, "ts", [2], 600)
    rep = check_index(out)
    assert rep["errors"] == []
    # tamper: rewrite the newest overlay with a different value under
    # the same (CRC-bearing) name
    import pyarrow as pa_
    import pyarrow.parquet as pq_

    upd = sorted(glob.glob(os.path.join(out, "docvalues", "ts",
                                        "upd-*.parquet")))[-1]
    pq_.write_table(
        pa_.table({"doc_id": pa_.array([2], pa_.int64()),
                   "value": pa_.array([601], pa_.int64())}),
        upd,
    )
    rep = check_index(out, raise_on_error=False)
    assert any("CRC mismatch" in e for e in rep["errors"])
    # generation gap: remove gen 1, keep gen 2
    os.remove(sorted(glob.glob(os.path.join(out, "docvalues", "ts",
                                            "upd-*.parquet")))[0])
    rep = check_index(out, raise_on_error=False)
    assert any("generations not contiguous" in e for e in rep["errors"])


def test_field_exists_query(dv_index):
    """FieldExistsQuery: numeric + string doc-values presence, unknown
    field empties, tombstones excluded."""
    from lucene_ray.state.deletes import delete_docs
    from lucene_ray.state.docvalues import write_str_doc_values

    out = dv_index
    r = _reader(out)
    assert r.field_exists_docs("ts").tolist() == list(range(len(TEXTS)))
    assert r.field_exists_docs("nope").tolist() == []
    # sparse string field
    import pyarrow as pa
    import ray.data

    stbl = pa.table(
        {
            "doc_id": pa.array([0, 2, 5], pa.int64()),
            "v": pa.array(["a", "b", "a"], pa.string()),
        }
    )
    write_str_doc_values(ray.data.from_arrow(stbl), out, "cat", "v")
    assert r.field_exists_docs("cat").tolist() == [0, 2, 5]
    # deletes excluded
    delete_docs(out, [2])
    from lucene_ray.pipelines.search import get_reader

    r2 = get_reader(out)  # fresh tombstone fingerprint
    assert r2.field_exists_docs("cat").tolist() == [0, 5]
