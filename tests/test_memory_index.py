"""MemoryIndex (memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java): single-doc in-RAM reader. The contract under test is
SCORE IDENTITY with a real one-doc on-disk index across query shapes and
similarities — the reference's MemoryIndex.search(Query) promise."""

from __future__ import annotations

import numpy as np
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.query import (
    BooleanQuery,
    parse_query,
    score_blockmax,
    score_sort_by_field,
)
from lucene_ray.pipelines.build import IndexConfig
from lucene_ray.pipelines.search import get_reader
from lucene_ray.state.memory_index import MemoryIndex

from test_engine_oracle import build_from_lists

DOC = (
    "The quick brown fox jumps over the lazy dog while the quick red fox "
    "sleeps; streaming data systems index documents quickly and the fox "
    "returns to the data stream"
)

QUERIES = [
    "fox",
    "quick fox",
    "+fox +data stream",
    "fox -banana",
    "fox -dog",
    '"quick fox"',          # stopword-gapped phrase positions
    '"fox data"~3',
    "qu?ck",
    "stre*",
    "fax~1",
    "dta~2",
]


def _disk_reader(tmp_path, text, cfg):
    idx = str(tmp_path / "one")
    build_from_lists(idx, [0], [text], cfg)
    return get_reader(idx)


@pytest.mark.parametrize("norm_kind", ["byte4", "exact"])
def test_score_identity_parsed_queries(ray_session, tmp_path, norm_kind):
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind=norm_kind, num_partitions=2,
        positions=True,
    )
    reader = _disk_reader(tmp_path, DOC, cfg)
    an = make_analyzer("standard_en")
    mi = MemoryIndex(DOC, analyzer="standard_en", norm_kind=norm_kind)
    for qs in QUERIES:
        q = parse_query(qs, an)
        dd, ds = score_blockmax(reader, q, 5)
        md, ms = score_blockmax(mi, q, 5)
        assert np.array_equal(dd, md), qs
        assert np.array_equal(ds, ms), (qs, ds, ms)
        if len(dd):
            assert mi.search(q) == float(ds[0])
        else:
            assert mi.search(q) == 0.0


def test_score_identity_similarities(ray_session, tmp_path):
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=1,
        positions=True,
    )
    reader = _disk_reader(tmp_path, DOC, cfg)
    an = make_analyzer("standard_en")
    mi = MemoryIndex(DOC, analyzer="standard_en", norm_kind="byte4")
    q = parse_query("quick data fox", an)
    for sim in (("lmd", 2000.0), ("lmjm", 0.1), ("classic",),
                ("dfr_inl2", 1.0), ("boolean",)):
        reader.similarity = sim
        mi.similarity = sim
        try:
            dd, ds = score_blockmax(reader, q, 3)
            md, ms = score_blockmax(mi, q, 3)
            assert np.array_equal(dd, md), sim
            assert np.array_equal(ds, ms), sim
        finally:
            reader.similarity = None
            mi.similarity = None


def test_score_identity_positional_families(ray_session, tmp_path):
    from lucene_ray.functions.intervals import IntervalQuery, score_intervals
    from lucene_ray.functions.spans import SpanNearQuery, score_span
    from lucene_ray.functions.term_automaton import (
        TermAutomatonQuery,
        score_term_automaton,
    )

    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=1,
        positions=True,
    )
    reader = _disk_reader(tmp_path, DOC, cfg)
    mi = MemoryIndex(DOC, analyzer="standard_en", norm_kind="byte4")

    iq = IntervalQuery(("fox", "data"), max_gaps=6)
    dd, ds = score_intervals(reader, iq, 3)
    md, ms = score_intervals(mi, iq, 3)
    assert np.array_equal(dd, md) and np.array_equal(ds, ms)

    sq = SpanNearQuery(("quick", "fox"), slop=2, in_order=True)
    dd, ds = score_span(reader, sq, 3)
    md, ms = score_span(mi, sq, 3)
    assert np.array_equal(dd, md) and np.array_equal(ds, ms)

    aq = TermAutomatonQuery()
    s1, s2 = aq.create_state(), aq.create_state()
    aq.add_transition(0, s1, "quick")
    aq.add_any_transition(s1, s1)
    aq.add_transition(s1, s2, "fox")
    aq.set_accept(s2)
    aq.finish()
    dd, ds = score_term_automaton(reader, aq, 3)
    md, ms = score_term_automaton(mi, aq, 3)
    assert np.array_equal(dd, md) and np.array_equal(ds, ms)


def test_offsets_and_payloads_variants():
    mi = MemoryIndex(DOC, analyzer="standard_en", offsets=True)
    assert mi.has_offsets
    docs, tfs, pairs = mi.term_offsets("fox")
    assert docs.tolist() == [0] and int(tfs[0]) == 3
    spans = pairs.reshape(-1, 2)
    assert all(DOC[a:b].lower() == "fox" for a, b in spans.tolist())

    an = make_analyzer("whitespace_payload")
    mi2 = MemoryIndex("alpha|2.0 beta alpha|0.5", analyzer=an, payloads=True)
    assert mi2.has_payloads
    docs, tfs, pays = mi2.term_payloads("alpha")
    assert int(tfs[0]) == 2
    assert pays.tolist() == [2.0, 0.5]


def test_filters_docvalues_and_empty_doc():
    import dataclasses

    an = make_analyzer("en_nostem_simple")
    mi = MemoryIndex(
        DOC, analyzer=an, norm_kind="exact", fields={"year": 2020, "lang": "en"}
    )
    q = parse_query("fox", an)
    assert mi.search(dataclasses.replace(q, filters=(("year", 2000, 2024),))) > 0.0
    assert mi.search(dataclasses.replace(q, filters=(("year", 0, 1999),))) == 0.0
    assert mi.search(dataclasses.replace(q, filters=(("lang", "in", ("en",)),))) > 0.0
    assert mi.field_exists_docs("year").tolist() == [0]
    assert mi.field_exists_docs("nope").tolist() == []

    empty = MemoryIndex("", analyzer=an)
    assert empty.search(parse_query("fox", an)) == 0.0
    assert empty.term_stats("fox") == (0, 0)


def test_from_tokens_matches_text_path():
    an = make_analyzer("standard_en")
    terms, pos = an.analyze_positions(DOC)
    mi_a = MemoryIndex(DOC, analyzer="standard_en")
    mi_b = MemoryIndex.from_tokens(terms, pos, analyzer_name="standard_en")
    q = parse_query('"fox jumps"', an)
    assert mi_a.search(q) == mi_b.search(q) > 0.0
