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


def test_crawl_to_search_pipeline(ray_session, tmp_path):
    """Flagship chain a web-corpus user runs end to end: raw pages ->
    exact dedup -> domain cap -> LM-quality filter -> index build ->
    BM25 search — results verified against a brute recomputation over
    exactly the surviving corpus."""
    import math

    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import parse_query, score_exhaustive
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.dedup import exact_dedup
    from lucene_ray.pipelines.sampling import cap_per_key
    from lucene_ray.pipelines.search import get_reader
    from lucene_ray.pipelines.textops import lm_quality_scores

    rng_texts = [
        "data stream engine builds postings from web pages",   # keep
        "data stream engine builds postings from web pages",   # exact dup
        "ray data pipelines shuffle arrow blocks with care",   # keep
        "qzxjv kwqzz zqxjj xvwqk zzzzq xjvkw",                 # garbage
        "search quality depends on clean training data",       # keep
        "search quality depends on clean training data extra", # same domain
        "postings compress well with delta encoding",          # keep
    ]
    domains = ["a", "a", "b", "b", "c", "c", "c"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(rng_texts)), pa.int64()),
            "text": pa.array(rng_texts, pa.string()),
            "source": pa.array(domains, pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)

    # 1. exact dedup (keep smallest doc_id per fingerprint)
    kept = exact_dedup(ds)
    kept_ids = sorted(r["doc_id"] for r in kept.select_columns(["doc_id"]).take_all())
    assert 1 not in kept_ids  # the exact dup dropped

    # 2. domain cap: at most 2 docs per source
    surv = pa.table(
        {
            "doc_id": pa.array(kept_ids, pa.int64()),
            "text": pa.array([rng_texts[d] for d in kept_ids], pa.string()),
            "source": pa.array([domains[d] for d in kept_ids], pa.string()),
        }
    )
    capped = cap_per_key(ray.data.from_arrow(surv), "source", 2)
    cap_rows = sorted(
        (r["doc_id"], r["text"]) for r in capped.take_all()
    )
    cap_ids = [d for d, _ in cap_rows]

    # 3. LM-quality filter: drop the bottom-scoring doc (the garbage one)
    cap_ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(cap_ids, pa.int64()),
                "text": pa.array([t for _, t in cap_rows], pa.string()),
            }
        )
    )
    scores = {
        r["doc_id"]: r["lm_logprob"]
        for r in lm_quality_scores(cap_ds).take_all()
    }
    cutoff = sorted(scores.values())[0]
    final_ids = sorted(d for d in cap_ids if scores[d] > cutoff)
    assert 3 not in final_ids  # garbage scored lowest and is gone

    # 4. index the survivors and search
    final = pa.table(
        {
            "doc_id": pa.array(final_ids, pa.int64()),
            "text": pa.array([rng_texts[d] for d in final_ids], pa.string()),
        }
    )
    out = str(tmp_path / "cleanidx")
    build_index(
        ray.data.from_arrow(final),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(final_ids),
    )
    r = get_reader(out)
    an = make_analyzer("en_nostem_simple")

    # brute BM25 over exactly the surviving corpus (same analyzer chain)
    corpus = {d: an.analyze(rng_texts[d]) for d in final_ids}
    n_docs = len(corpus)
    avgdl = sum(len(v) for v in corpus.values()) / n_docs

    def brute(terms):
        out = {}
        for d, toks in corpus.items():
            s = 0.0
            for t in set(terms):
                tf = toks.count(t)
                df = sum(1 for v in corpus.values() if t in v)
                if tf == 0 or df == 0:
                    continue
                idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
                s += idf * (tf / (tf + 1.2 * (0.25 + 0.75 * len(toks) / avgdl)))
            if s > 0:
                out[d] = s
        return out

    for qs in ("data stream", "postings", "quality data"):
        q = parse_query(qs, an)
        d_got, s_got = score_exhaustive(r, q, 10)
        want = brute(list(q.must) + list(q.should))
        order = sorted(want, key=lambda x: (-want[x], x))
        assert d_got.tolist() == order[: len(d_got)], qs
        got = dict(zip(d_got.tolist(), s_got.tolist()))
        for d in got:
            assert got[d] == pytest.approx(want[d], rel=1e-12), (qs, d)
