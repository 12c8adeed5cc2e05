"""DocValuesStats over the matching-doc set (reference:
misc/src/java/org/apache/lucene/misc/search/DocValuesStats.java,
DocValuesStatsCollector.java) — engine vs brute numpy on a sparse
numeric field, the SortedDocValuesStats string variant, and the
zero-hit / all-missing edges."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import matching_docs, parse_query
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.facets import doc_values_stats, str_doc_values_stats
from lucene_ray.pipelines.search import get_reader
from lucene_ray.state.docvalues import write_doc_values, write_str_doc_values

from test_engine_oracle import build_from_lists, make_corpus


@pytest.fixture(scope="module")
def dv_idx(ray_session, tmp_path_factory):
    import ray.data

    doc_ids, texts = make_corpus(n_docs=300, seed=71)
    out = str(tmp_path_factory.mktemp("dvs") / "idx")
    cfg = IndexConfig(
        analyzer="en_nostem_simple", norm_kind="exact", num_partitions=4,
        sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    rng = np.random.default_rng(72)
    vals = rng.integers(10, 5000, size=len(doc_ids)).astype(np.int64)
    present = np.asarray(doc_ids) % 3 != 0  # sparse: ~1/3 missing
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids)[present], pa.int64()),
            "value": pa.array(vals[present], pa.int64()),
        }
    )
    write_doc_values(ray.data.from_arrow(tbl), out, "sparse_v", "value")
    langs = np.array(["de", "en", "fr", "pt", "zh"])[
        np.asarray(doc_ids) % 5
    ]
    stbl = pa.table(
        {
            "doc_id": pa.array(np.asarray(doc_ids)[present], pa.int64()),
            "lang": pa.array(langs[present], pa.string()),
        }
    )
    write_str_doc_values(ray.data.from_arrow(stbl), out, "lang_s", "lang")
    return out, np.asarray(doc_ids), vals, present, langs


@pytest.mark.parametrize("qt", ["alpha", "kappa mu", "+alpha -beta"])
def test_numeric_stats_match_brute(dv_idx, qt):
    idx, doc_ids, vals, present, _langs = dv_idx
    reader = get_reader(idx)
    q = parse_query(qt, make_analyzer("en_nostem_simple"))
    hits = matching_docs(reader, q)
    hit_mask = np.isin(doc_ids, hits)
    m = vals[hit_mask & present]
    t = doc_values_stats(idx, qt, "sparse_v").to_pandas().iloc[0]
    assert t["n_with_value"] == len(m)
    assert t["n_missing"] == int(hit_mask.sum()) - len(m)
    assert t["vmin"] == m.min() and t["vmax"] == m.max()
    assert t["vsum"] == int(m.sum())
    f = m.astype(np.float64)
    mean = f.sum() / len(m)
    var = max(float((f * f).sum()) / len(m) - mean * mean, 0.0)
    assert t["mean"] == pytest.approx(round(mean, 6), abs=1e-9)
    assert t["variance"] == pytest.approx(round(var, 6), abs=1e-9)
    assert t["stdev"] == pytest.approx(round(np.sqrt(var), 6), abs=1e-9)


def test_string_stats_match_brute(dv_idx):
    idx, doc_ids, _vals, present, langs = dv_idx
    reader = get_reader(idx)
    q = parse_query("alpha", make_analyzer("en_nostem_simple"))
    hits = matching_docs(reader, q)
    hit_mask = np.isin(doc_ids, hits)
    m = langs[hit_mask & present]
    t = str_doc_values_stats(idx, "alpha", "lang_s").to_pandas().iloc[0]
    assert t["n_with_value"] == len(m)
    assert t["n_missing"] == int(hit_mask.sum()) - len(m)
    assert t["vmin"] == min(m) and t["vmax"] == max(m)


def test_zero_hits_stable_schema(dv_idx):
    idx, *_ = dv_idx
    t = doc_values_stats(idx, "zzzznotaterm", "sparse_v").to_pandas()
    assert len(t) == 1
    row = t.iloc[0]
    assert row["n_with_value"] == 0 and row["n_missing"] == 0
    assert row["vsum"] == 0 and row["mean"] == 0.0
    assert row["variance"] == 0.0 and row["stdev"] == 0.0
    assert pa.Table.from_pandas(t).column("vmin").null_count == 1
