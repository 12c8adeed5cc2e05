"""Facet counting, total-hit count, and highlighting (reference: facet/,
highlighter/ modules; IndexSearcher.count)."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.highlight import best_fragment, token_offsets
from lucene_ray.functions.query import count_matches, matching_docs, parse_query
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.oracle import OracleIndex
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus


def test_token_offsets_roundtrip():
    text = "Hello, world's BIG-data x" + "y" * 300
    for tok, s, e in token_offsets(text):
        assert text[s:e] == tok


def test_best_fragment_golden():
    an = make_analyzer("en_nostem_simple")
    text = "alpha beta gamma delta " * 5 + "needle here " + "omega " * 30
    frag = best_fragment(text, ["needle"], an, frag_size=30)
    assert "<b>needle</b>" in frag
    assert frag.startswith("...")
    assert best_fragment(text, ["zzz"], an) == ""
    assert best_fragment("", ["needle"], an) == ""
    # window with MORE distinct terms wins over an earlier single match
    text2 = "alpha filler filler filler filler filler alpha beta"
    frag2 = best_fragment(text2, ["alpha", "beta"], an, frag_size=20)
    assert "<b>beta</b>" in frag2 and "<b>alpha</b>" in frag2


@pytest.fixture(scope="module")
def small_index(tmp_path_factory, ray_session):
    doc_ids, texts = make_corpus(n_docs=250, seed=21)
    out = tmp_path_factory.mktemp("fc") / "idx"
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        heavy_df_threshold=64, sample_rate=1.0,
    )
    build_from_lists(out, doc_ids, texts, cfg)
    oracle = OracleIndex(doc_ids, texts, analyzer="standard_en")
    return str(out), doc_ids, texts, oracle


def test_count_matches_vs_oracle(small_index):
    out, doc_ids, texts, oracle = small_index
    reader = IndexReader(out)
    an = make_analyzer("standard_en")
    for qt in ["alpha", "alpha beta", "alpha AND beta", "alpha -beta",
               "alp*", "zzz", "kappa mu nu ~2"]:
        q = parse_query(qt, an)
        od, _ = oracle.topk(q, 10**9)
        assert count_matches(reader, q) == len(od), qt
        assert np.array_equal(np.sort(od), matching_docs(reader, q)), qt


def test_facet_counts_vs_pandas(small_index, ray_session):
    import pandas as pd
    import ray.data

    from lucene_ray.pipelines.facets import facet_counts

    out, doc_ids, texts, oracle = small_index
    # synthetic facet column
    cat = [f"cat{d % 7}" for d in doc_ids]
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "facet": pa.array(cat, pa.string())})
    )
    reader = IndexReader(out)
    an = make_analyzer("standard_en")
    for qt in ["alpha", "alpha beta", "zzz"]:
        got = facet_counts(out, qt, docs_ds, "facet").to_pandas()
        hits = set(matching_docs(reader, parse_query(qt, an)).tolist())
        if not hits:
            assert len(got) == 0
            continue
        want = (
            pd.DataFrame({"facet": [c for d, c in zip(doc_ids, cat) if d in hits]})
            .groupby("facet").size().rename("count").reset_index()
            .sort_values(["count", "facet"], ascending=[False, True])
            .reset_index(drop=True)
        )
        got = got.reset_index(drop=True)
        assert got.equals(want.astype({"count": got["count"].dtype})), qt
