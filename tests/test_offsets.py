"""Postings character offsets (.off sidecar) — the reference's
DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS IndexOptions +
UnifiedHighlighter OffsetSource.POSTINGS. The offsets path must be
byte-identical to the re-analysis highlighter on the same index."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.highlight import (
    best_fragment,
    best_fragment_from_index,
    index_matches,
    top_passages,
    top_passages_from_index,
)
from lucene_ray.pipelines.build import IndexConfig, build_index

TEXTS = [
    "Data streams flow through the spark window, and the data stream "
    "keeps flowing where the batch value merges into the line table.",
    "hash join order batch stream spark window window dup key fast",
    "plain DATA row; hash-join hash join hash join customer value!",
    "the a of and to",
    "stream",
    "",
    "Exotic punctuation: data... stream?! DATA, stream; 'data' (stream) "
    "and one u.s.a token plus 1,024 numbers.",
]


@pytest.fixture(scope="module")
def off_idx(tmp_path_factory, ray_session):
    import ray.data

    out = str(tmp_path_factory.mktemp("off") / "idx")
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(TEXTS)), pa.int64()),
            "text": pa.array(TEXTS, pa.string()),
        }
    )
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=3,
        positions=True, offsets=True, sample_rate=1.0,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(TEXTS))
    return out


def test_offsets_require_positions(ray_session, tmp_path):
    import ray.data

    with pytest.raises(ValueError, match="positions"):
        build_index(
            ray.data.from_arrow(
                pa.table({"doc_id": pa.array([0], pa.int64()),
                          "text": pa.array(["x"], pa.string())})
            ),
            str(tmp_path / "bad"),
            IndexConfig(offsets=True, positions=False),
            doc_count=1,
        )


def test_term_offsets_match_analyzer_spans(off_idx):
    """Every stored (start, end) span equals what re-analysis computes."""
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(off_idx)
    assert reader.has_offsets
    an = make_analyzer("standard_en")
    want = {}  # (doc, term) -> [(s, e)] in position order
    for doc, text in enumerate(TEXTS):
        terms, _pos, starts, ends = an.analyze_offsets(text)
        for t, s, e in zip(terms, starts, ends):
            want.setdefault((doc, t), []).append((s, e))
    all_terms = {t for (_d, t) in want}
    got = {}
    for t in all_terms:
        docs, tfs, flat = reader.term_offsets(t)
        cur = 0
        for d, n in zip(docs.tolist(), tfs.tolist()):
            pairs = flat[cur : cur + 2 * n]
            got[(d, t)] = [
                (int(pairs[2 * j]), int(pairs[2 * j + 1]))
                for j in range(n)
            ]
            cur += 2 * n
    assert got == want
    # spans really cover the surface tokens
    for (d, t), spans in got.items():
        for s, e in spans:
            surface = TEXTS[d][s:e]
            assert surface, (d, t, s, e)


@pytest.mark.parametrize(
    "qterms",
    [("data", "stream"), ("hash", "join"), ("batch",), ("zzz",),
     ("stream", "valu", "window")],
)
def test_offsets_highlight_byte_identical(off_idx, qterms):
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(off_idx)
    an = make_analyzer("standard_en")
    for doc, text in enumerate(TEXTS):
        a = best_fragment(text, qterms, an, frag_size=60)
        b = best_fragment_from_index(reader, doc, text, qterms,
                                     frag_size=60)
        assert a == b, (doc, qterms)
        pa_ = top_passages(text, qterms, an, max_passages=2, frag_size=40)
        pb_ = top_passages_from_index(reader, doc, text, qterms,
                                      max_passages=2, frag_size=40)
        assert pa_ == pb_, (doc, qterms)


def test_index_matches_sorted_and_cached(off_idx):
    from lucene_ray.pipelines.search import get_reader

    reader = get_reader(off_idx)
    m = index_matches(reader, 0, ("data", "stream"))
    assert m == sorted(m)
    assert "_offsets_view" in reader.__dict__
    # repeat uses the cached view, same result
    assert index_matches(reader, 0, ("data", "stream")) == m


def test_checkindex_validates_offsets(off_idx):
    from lucene_ray.state.checkindex import check_index

    report = check_index(off_idx)
    assert not report.get("errors")
    # corrupt the .off sidecar -> CRC failure surfaces
    import glob
    import os
    import shutil

    import pytest as _pytest

    cp_root = off_idx + "_corrupt"
    shutil.rmtree(cp_root, ignore_errors=True)
    shutil.copytree(off_idx, cp_root)
    off_files = sorted(glob.glob(os.path.join(cp_root, "segments", "*.off")))
    victim = next(p for p in off_files if os.path.getsize(p) > 0)
    with open(victim, "r+b") as f:
        f.seek(0)
        b = f.read(1)
        f.seek(0)
        f.write(bytes([b[0] ^ 0xFF]))
    from lucene_ray.state.checkindex import IndexCorruptError

    with _pytest.raises(IndexCorruptError, match="crc32|offsets"):
        check_index(cp_root)
    shutil.rmtree(cp_root, ignore_errors=True)


def test_compaction_carries_offsets(ray_session, tmp_path):
    """Delete-aware compaction must carry the .off sidecar: after merging
    two offsets-enabled shards with a tombstone, term_offsets still match
    re-analysis spans and the offsets highlighter stays byte-identical."""
    import ray.data

    from lucene_ray.pipelines.merge import compact_shards
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.state.checkindex import check_index

    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=3,
        positions=True, offsets=True, sample_rate=1.0,
    )
    half = len(TEXTS) // 2

    def build(ids, texts, out):
        docs = pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
        build_index(ray.data.from_arrow(docs), str(out), cfg,
                    doc_count=len(ids))

    build(range(half), TEXTS[:half], tmp_path / "s0")
    build(range(half, len(TEXTS)), TEXTS[half:], tmp_path / "s1")
    out = str(tmp_path / "merged")
    dead = np.asarray([1], dtype=np.int64)  # tombstone a doc
    manifest = compact_shards(
        [str(tmp_path / "s0"), str(tmp_path / "s1")], out, deleted=dead
    )
    assert manifest["offsets"] is True
    reader = get_reader(out)
    assert reader.has_offsets
    check_index(out)
    an = make_analyzer("standard_en")
    for doc, text in enumerate(TEXTS):
        if doc == 1:
            continue
        a = best_fragment(text, ("data", "stream", "hash"), an, frag_size=60)
        b = best_fragment_from_index(
            reader, doc, text, ("data", "stream", "hash"), frag_size=60
        )
        assert a == b, doc
    # the tombstoned doc's occurrences are physically gone
    docs, _tfs, _flat = reader.term_offsets("hash")
    assert 1 not in docs.tolist()


def test_incremental_root_offsets(ray_session, tmp_path):
    """Offsets highlighting over an incremental root (ShardedReader):
    append two offsets-enabled shards, highlight from the index."""
    import os

    import ray.data

    from lucene_ray.pipelines.incremental import add_batch
    from lucene_ray.pipelines.search import get_reader

    root = str(tmp_path / "root")
    os.makedirs(root)
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=2,
        positions=True, offsets=True, sample_rate=1.0,
    )

    def mk(ids, texts):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "text": pa.array(texts, pa.string()),
                }
            )
        )

    half = len(TEXTS) // 2
    add_batch(root, mk(range(half), TEXTS[:half]), cfg, doc_count=half)
    add_batch(root, mk(range(half, len(TEXTS)), TEXTS[half:]), cfg,
              doc_count=len(TEXTS) - half)
    reader = get_reader(root)
    assert reader.has_offsets
    an = make_analyzer("standard_en")
    for doc, text in enumerate(TEXTS):
        a = best_fragment(text, ("data", "hash"), an, frag_size=60)
        b = best_fragment_from_index(reader, doc, text, ("data", "hash"),
                                     frag_size=60)
        assert a == b, doc


def test_offsets_with_heavy_term_split(ray_session, tmp_path):
    """Heavy-term doc-range bucket splits must keep the offsets stream
    aligned with the postings (same lexsort writes both)."""
    import ray.data

    from lucene_ray.pipelines.search import get_reader

    texts = [f"data common{i % 3} data tail{i}" for i in range(40)]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    out = str(tmp_path / "heavy_off")
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=3,
        positions=True, offsets=True, heavy_df_threshold=5,
        bucket_shift=3, sample_rate=1.0,
    )
    build_index(ray.data.from_arrow(docs), out, cfg, doc_count=len(texts))
    reader = get_reader(out)
    assert reader.manifest["heavy_terms"]  # the split actually happened
    an = make_analyzer("standard_en")
    for term in ("data", "common0", "tail7"):
        dd, tfs, flat = reader.term_offsets(term)
        cur = 0
        for d, nf in zip(dd.tolist(), tfs.tolist()):
            t_terms, _p, starts, ends = an.analyze_offsets(texts[d])
            want = [
                (s, e) for t, s, e in zip(t_terms, starts, ends) if t == term
            ]
            got = [
                (int(flat[cur + 2 * j]), int(flat[cur + 2 * j + 1]))
                for j in range(nf)
            ]
            assert got == want, (term, d)
            cur += 2 * nf
