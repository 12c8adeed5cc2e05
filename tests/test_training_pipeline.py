"""End-to-end training-data assembly pipeline over the real testdata —
the LLM-corpus analogue of the crawl-to-search integration test: scrub ->
quality gate -> exact dedup -> fuzzy eval decontamination -> sequence
packing -> resumable partitioned sink, with row accounting at every
stage and a mid-run resume."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def test_training_data_pipeline_end_to_end(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.dedup import exact_dedup
    from lucene_ray.pipelines.textops import (
        decontaminate_fuzzy,
        doc_stats,
        pack_sequences,
        pii_scrub,
    )
    from lucene_ray.sources.sink import finished_partitions, write_partitioned

    docs = ray.data.read_parquet(
        f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
    )
    n_docs = docs.count()

    # 1. PII scrub (stateless streaming pass; text replaced in place)
    scrubbed = pii_scrub(docs).to_pandas().set_index("doc_id")
    assert len(scrubbed) == n_docs

    # 2. quality gate: keep docs with enough tokens and english prediction
    stats = doc_stats(docs).to_pandas().set_index("doc_id")
    keep_quality = set(
        stats[(stats.n_tokens >= 5) & (stats.lang_pred == "en")].index
    )
    assert 0 < len(keep_quality) <= n_docs

    # 3. exact dedup on the fingerprint (first doc per identical text wins)
    kept = exact_dedup(docs).to_pandas()
    kept_ids = set(kept.doc_id)
    assert len(kept_ids) <= n_docs

    # 4. fuzzy eval decontamination: drop near-dups of the eval slice
    def pick(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        return b.filter(pa.array(ids % 17 == 0))

    bench = docs.map_batches(pick, batch_format="pyarrow")
    flagged = decontaminate_fuzzy(docs, bench, k=3, threshold=0.5).to_pandas()
    contaminated = set(flagged.doc_id)

    final_ids = sorted((kept_ids & keep_quality) - contaminated)
    assert len(final_ids) > 0

    # 5. sequence packing over the surviving corpus (doc_id order)
    final_ref = ray.put(np.asarray(final_ids, dtype=np.int64))

    def only_final(b: pa.Table) -> pa.Table:
        import ray as _ray

        fin = _ray.get(final_ref)
        ids = b.column("doc_id").to_numpy()
        pos = np.minimum(np.searchsorted(fin, ids), len(fin) - 1)
        return b.filter(pa.array(fin[pos] == ids))

    survivors = docs.map_batches(only_final, batch_format="pyarrow")
    packed = pack_sequences(survivors, seq_len=256).to_pandas()
    packed = packed.sort_values("doc_id").reset_index(drop=True)
    assert set(packed.doc_id) <= set(final_ids)
    # spans are contiguous: each doc starts where the previous ended
    starts = packed.tok_start.to_numpy()
    ns = packed.n_tokens.to_numpy()
    assert starts[0] == 0
    np.testing.assert_array_equal(starts[1:], (starts + ns)[:-1])

    # 6. resumable partitioned output by lang
    out = str(tmp_path / "corpus")
    wrote = write_partitioned(survivors, out, "lang")
    assert sorted(wrote) == sorted(finished_partitions(out))
    total_rows = sum(
        pq.read_table(f).num_rows
        for f in glob.glob(os.path.join(out, "*", "*.parquet"))
    )
    assert total_rows == len(final_ids)
    # resume: a second run skips every finished partition
    wrote2 = write_partitioned(survivors, out, "lang")
    assert wrote2 == []
