"""doc_map (norms / stored-fields sidecar): per-doc analyzed length and
norm key must agree with the norm keys the index stores inline in its
postings (reference: Similarity.computeNorm, norms column files)."""

import numpy as np
import pytest

from lucene_ray.pipelines.build import IndexConfig, build_doc_map
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import build_from_lists, make_corpus


def test_doc_map_matches_index_norms(tmp_path, ray_session):
    import pyarrow as pa
    import ray.data

    doc_ids, texts = make_corpus(n_docs=200, seed=51)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
        sample_rate=1.0,
    )
    build_from_lists(tmp_path / "idx", doc_ids, texts, cfg)
    tbl = pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    dm = build_doc_map(ray.data.from_arrow(tbl), cfg).to_pandas()
    assert len(dm) == len(doc_ids)
    assert (dm.loc[dm.doc_id == 0, "doc_len"] == 0).all()  # empty doc
    norm_of = dict(zip(dm.doc_id, dm.norm))
    reader = IndexReader(str(tmp_path / "idx"))
    checked = 0
    for term in list(reader.all_terms())[:10]:
        for tp in reader.postings(term):
            docs, _tfs, keys = tp.decode_all()
            for d, k in zip(docs.tolist(), keys.tolist()):
                assert norm_of[d] == k, (term, d)
                checked += 1
    assert checked > 100
