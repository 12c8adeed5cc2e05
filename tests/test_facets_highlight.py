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


def test_range_facet_counts_vs_pandas(small_index, ray_session):
    import ray.data

    from lucene_ray.pipelines.facets import range_facet_counts

    out, doc_ids, texts, oracle = small_index
    vals = [d * 3 for d in doc_ids]
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "v": pa.array(vals, pa.int64())})
    )
    ranges = [
        ("low", 0, 200),          # overlaps "tiny"
        ("tiny", 0, 30),
        ("mid", 201, 500),
        ("empty", 10**9, 2 * 10**9),
        ("all", -1, 10**9),
    ]
    reader = IndexReader(out)
    an = make_analyzer("standard_en")
    by_doc = dict(zip(doc_ids, vals))
    for qt in ["alpha", "alpha beta", "zzz"]:
        got = range_facet_counts(out, qt, docs_ds, "v", ranges).to_pandas()
        hits = matching_docs(reader, parse_query(qt, an)).tolist()
        # every named range present, caller order, zero-count included
        assert got["range_label"].tolist() == [r[0] for r in ranges]
        for label, lo, hi in ranges:
            want = sum(1 for d in hits if lo <= by_doc[d] <= hi)
            assert int(got.loc[got.range_label == label, "n_docs"].iloc[0]) == want, (qt, label)


def test_drill_sideways_vs_pandas(small_index, ray_session):
    import pandas as pd
    import ray.data

    from lucene_ray.pipelines.facets import drill_sideways_counts

    out, doc_ids, texts, oracle = small_index
    cat = [f"cat{d % 5}" for d in doc_ids]
    grp = [f"g{d % 3}" for d in doc_ids]
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "cat": pa.array(cat, pa.string()),
                  "grp": pa.array(grp, pa.string())})
    )
    reader = IndexReader(out)
    an = make_analyzer("standard_en")
    dims = {"cat": "cat2", "grp": "g1"}
    meta = pd.DataFrame({"doc_id": doc_ids, "cat": cat, "grp": grp})
    for qt in ["alpha", "alpha beta"]:
        got = drill_sideways_counts(out, qt, docs_ds, dims).to_pandas()
        hits = set(matching_docs(reader, parse_query(qt, an)).tolist())
        base = meta[meta.doc_id.isin(hits)]
        # sideways per dim: other dim's filter applied, own not
        want_cat = base[base.grp == "g1"].groupby("cat").size()
        want_grp = base[base.cat == "cat2"].groupby("grp").size()
        for col, want in (("cat", want_cat), ("grp", want_grp)):
            sub = got[got.dim == col].set_index("facet_value")["n_docs"]
            assert dict(sub) == dict(want.astype(int)), (qt, col)
        dd = int(got.loc[got.dim == "__drilldown__", "n_docs"].iloc[0])
        assert dd == len(base[(base.cat == "cat2") & (base.grp == "g1")])


def test_drill_down_topk_vs_oracle(small_index, ray_session):
    import ray.data

    from lucene_ray.pipelines.facets import drill_down_topk

    out, doc_ids, texts, oracle = small_index
    cat = [f"cat{d % 5}" for d in doc_ids]
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "cat": pa.array(cat, pa.string())})
    )
    an = make_analyzer("standard_en")
    by_doc = dict(zip(doc_ids, cat))
    for qt, k in [("alpha", 5), ("alpha beta", 7), ("zzz", 5)]:
        got = drill_down_topk(out, qt, docs_ds, {"cat": "cat2"}, k=k).to_pandas()
        od, os_ = oracle.topk(parse_query(qt, an), 10**9)
        pairs = [(s, d) for d, s in zip(od.tolist(), os_.tolist())
                 if by_doc[d] == "cat2"]
        pairs.sort(key=lambda p: (-p[0], p[1]))
        pairs = pairs[:k]
        assert got["doc_id"].tolist() == [d for _, d in pairs], qt
        assert got["rank"].tolist() == list(range(1, len(pairs) + 1))
        assert np.allclose(got["score"].to_numpy(),
                           np.array([s for s, _ in pairs]), rtol=1e-9, atol=1e-12)


def test_collapse_matches_group_heads(small_index, ray_session):
    """collapse_search == global top-k over the per-group BEST hits
    (CollapsingTopDocsCollector semantics)."""
    import ray.data

    from lucene_ray.pipelines.facets import collapse_search, grouped_search

    out, doc_ids, texts, oracle = small_index
    docs = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "grp": pa.array([str(d % 7) for d in doc_ids]),
        }
    )
    heads = grouped_search(
        out, "alpha beta", ray.data.from_arrow(docs), "grp", k_per_group=1
    ).to_pandas()
    heads = heads.sort_values(
        ["score", "doc_id"], ascending=[False, True]
    ).head(5)
    col = collapse_search(
        out, "alpha beta", ray.data.from_arrow(docs), "grp", k=5
    ).to_pandas()
    assert list(col["doc_id"]) == list(heads["doc_id"])
    assert list(col["rank"]) == [1, 2, 3, 4, 5]
    assert list(col["score"]) == list(heads["score"])
    # each collapse key appears at most once
    assert col["grp"].is_unique


def test_path_hierarchy_analyzer():
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("path_hierarchy")
    assert an.analyze("/a/b/c") == ["a", "a/b", "a/b/c"]
    assert an.analyze("en/src3") == ["en", "en/src3"]
    assert an.analyze("") == []
    terms, pos = an.analyze_positions("x/y")
    assert terms == ["x", "x/y"] and pos == [0, 0]
    from lucene_ray.functions.analysis import PathHierarchyAnalyzer

    skip = PathHierarchyAnalyzer(skip=1)
    assert skip.analyze("host/a/b") == ["a", "a/b"]


def test_taxonomy_facet_counts(ray_session, tmp_path):
    """Rollup counts at every taxonomy level == brute-force recount."""
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.facets import taxonomy_facet_counts

    texts = [
        "alpha beta", "alpha", "beta gamma", "alpha beta beta",
        "gamma", "alpha gamma",
    ]
    langs = ["en", "en", "de", "fr", "de", "en"]
    srcs = ["s1", "s2", "s1", "s1", "s2", "s1"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
        }
    )
    out = str(tmp_path / "taxidx")
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(texts),
    )
    got = taxonomy_facet_counts(
        out, "alpha", ray.data.from_arrow(docs), ["lang", "source"]
    ).to_pandas()
    hits = [d for d, t in enumerate(texts) if "alpha" in t.split()]
    want = {}
    for d in hits:
        want[(1, langs[d])] = want.get((1, langs[d]), 0) + 1
        p2 = f"{langs[d]}/{srcs[d]}"
        want[(2, p2)] = want.get((2, p2), 0) + 1
    got_map = {
        (int(r.level), r.path): int(r.count) for r in got.itertuples()
    }
    assert got_map == want
    # sorted (level asc, count desc, path asc)
    lv1 = got[got.level == 1]
    assert list(lv1["count"]) == sorted(lv1["count"], reverse=True)


def test_top_passages_multi():
    """UnifiedHighlighter-style multi-passage: non-overlapping, highest-
    scoring first by greedy pick, emitted in text order, wrapped tags."""
    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.highlight import top_passages

    an = make_analyzer("en_nostem_simple")
    text = (
        "alpha beta together here and then a very long stretch of filler "
        "words that contain nothing interesting at all for quite a while "
        "until alpha appears again near beta for the second window close"
    )
    ps = top_passages(text, ["alpha", "beta"], an, max_passages=2,
                      frag_size=40)
    assert len(ps) == 2
    assert all("<b>alpha</b>" in p for p in ps)
    # text order: first passage comes from the start of the text
    assert ps[0].startswith("<b>alpha</b>")
    # non-overlap: idempotent under max_passages=1 prefix
    p1 = top_passages(text, ["alpha", "beta"], an, max_passages=1,
                      frag_size=40)
    assert len(p1) == 1 and p1[0] in ps
    # no matches -> empty
    assert top_passages(text, ["zzz"], an) == []
    # idf weighting prefers windows with the rarer term
    w = {"alpha": 0.1, "beta": 5.0}
    pw = top_passages(text, ["alpha", "beta"], an, max_passages=1,
                      frag_size=25, weights=w)
    assert "<b>beta</b>" in pw[0]


def test_diversified_search(ray_session, tmp_path):
    """Top-k with at most N per key == brute-force quota scan in score
    order (DiversifiedTopDocsCollector semantics); N=1 == collapse."""
    import ray.data

    from lucene_ray.functions.analysis import make_analyzer
    from lucene_ray.functions.query import (
        _exhaustive_candidates,
        parse_query,
    )
    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.facets import collapse_search, diversified_search
    from lucene_ray.pipelines.search import get_reader

    texts = [
        "alpha alpha alpha", "alpha alpha", "alpha",
        "alpha beta", "alpha gamma", "alpha delta beta",
    ]
    keys = ["x", "x", "x", "y", "y", "z"]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "src": pa.array(keys, pa.string()),
        }
    )
    out = str(tmp_path / "dividx")
    build_index(
        ray.data.from_arrow(docs),
        out,
        IndexConfig(
            analyzer="en_nostem_simple", norm_kind="exact", num_partitions=2
        ),
        doc_count=len(texts),
    )
    ds = ray.data.from_arrow(docs)
    r = get_reader(out)
    an = make_analyzer("en_nostem_simple")
    cand, acc, _ = _exhaustive_candidates(r, parse_query("alpha", an))
    order = sorted(
        zip(cand.tolist(), acc.tolist()), key=lambda t: (-t[1], t[0])
    )

    for n in (1, 2):
        got = diversified_search(
            out, "alpha", ds, "src", k=4, max_per_key=n
        ).to_pandas()
        quota, want = {}, []
        for d, s in order:
            k_ = keys[d]
            if quota.get(k_, 0) < n:
                quota[k_] = quota.get(k_, 0) + 1
                want.append(d)
            if len(want) == 4:
                break
        assert got["doc_id"].tolist() == want, n
    # N=1 == field collapsing
    c = collapse_search(out, "alpha", ds, "src", k=4).to_pandas()
    d1 = diversified_search(out, "alpha", ds, "src", k=4, max_per_key=1).to_pandas()
    assert c["doc_id"].tolist() == d1["doc_id"].tolist()


def test_taxonomy_facet_associations_int_and_float(ray_session, tmp_path):
    """Association SUMs at every taxonomy level == brute re-sum, for an
    integer association and a float one whose values are exact binary
    fractions (order-free sums)."""
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.pipelines.facets import taxonomy_facet_associations

    texts = [
        "alpha beta", "alpha", "beta gamma", "alpha beta beta",
        "gamma", "alpha gamma",
    ]
    langs = ["en", "en", "de", "fr", "de", "en"]
    srcs = ["s1", "s2", "s1", "s1", "s2", "s1"]
    weights = [1.5, 0.25, 3.0, 0.5, 2.0, 4.75]  # exact binary fractions
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "source": pa.array(srcs, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            "weight": pa.array(weights, pa.float64()),
        }
    )
    out = str(tmp_path / "associdx")
    build_index(
        ray.data.from_arrow(docs), out,
        IndexConfig(analyzer="en_nostem_simple", norm_kind="exact",
                    num_partitions=2),
        doc_count=len(texts),
    )
    hits = [d for d, t in enumerate(texts) if "alpha" in t.split()]
    for col, vals in (("n_chars", [len(t) for t in texts]),
                      ("weight", weights)):
        got = taxonomy_facet_associations(
            out, "alpha", ray.data.from_arrow(docs), ["lang", "source"], col
        ).to_pandas()
        want = {}
        for d in hits:
            want[(1, langs[d])] = want.get((1, langs[d]), 0.0) + vals[d]
            p2 = f"{langs[d]}/{srcs[d]}"
            want[(2, p2)] = want.get((2, p2), 0.0) + vals[d]
        got_map = {
            (int(r.level), r.path): float(r.value) for r in got.itertuples()
        }
        assert got_map == want, col
        lv1 = got[got.level == 1]
        assert list(lv1["value"]) == sorted(lv1["value"], reverse=True)


def test_sampled_facet_counts(small_index, ray_session):
    """RandomSamplingFacetsCollector analogue: one sample per complete
    bin (deterministic hash pick), amortized counts capped by the corpus
    per-value count, passthrough when hits <= sample_size, and
    determinism across runs."""
    import ray.data

    from lucene_ray.pipelines.facets import sampled_facet_counts

    out, doc_ids, texts, oracle = small_index
    cat = [f"cat{d % 5}" for d in doc_ids]
    docs_ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                  "lang": pa.array(cat, pa.string())})
    )
    reader = IndexReader(out)
    an = make_analyzer("standard_en")
    hits = matching_docs(reader, parse_query("alpha", an))
    n = len(hits)
    assert n > 20
    ss = 20
    t = sampled_facet_counts(out, "alpha", docs_ds, "lang", ss, seed=3)
    t = t.to_pandas()
    rate = ss / n
    bin_size = int(1.0 / rate)
    n_complete = n // bin_size
    # cardinality: exactly one pick per complete bin
    assert t["sampled_count"].sum() == n_complete
    assert (t["total_hits"] == n).all()
    # the deterministic pick: recompute brute
    idx = hits[: n_complete * bin_size]
    h = ((idx.astype(np.uint64) + np.uint64(3)) * np.uint64(2654435761)) \
        % np.uint64(1 << 32)
    picks = idx.reshape(n_complete, bin_size)[
        np.arange(n_complete), h.reshape(n_complete, bin_size).argmin(axis=1)
    ]
    from collections import Counter

    want = Counter(f"cat{int(d) % 5}" for d in picks)
    got = dict(zip(t["facet_value"], t["sampled_count"]))
    assert got == dict(want)
    # amortization: min(corpus count, trunc(count / rate))
    corpus = Counter(cat)
    for _, r in t.iterrows():
        assert r["amortized_count"] == min(
            corpus[r["facet_value"]],
            int(r["sampled_count"] / rate),
        )
    # determinism
    t2 = sampled_facet_counts(out, "alpha", docs_ds, "lang", ss, seed=3)
    assert t2.to_pandas().equals(t)
    # passthrough: sample_size >= hits -> exact counts, rate 1.0
    tp = sampled_facet_counts(
        out, "alpha", docs_ds, "lang", 10 ** 9, seed=3
    ).to_pandas()
    assert tp["sampled_count"].sum() == n
    assert (tp["sampling_rate"] == 1.0).all()
    assert (tp["amortized_count"] == tp["sampled_count"]).all()


def test_dynamic_numeric_ranges_vs_reference_loop():
    """compute_dynamic_numeric_ranges (searchsorted boundaries) must be
    identical to a literal port of the reference's sequential sweep
    (DynamicRangeUtil.java:204-270) across fuzzed inputs."""
    from lucene_ray.pipelines.facets import compute_dynamic_numeric_ranges

    def reference_sweep(values, weights, top_n):
        pairs = sorted(zip(values, weights), key=lambda p: (p[0], p[1]))
        n = len(pairs)
        if n == 0 or top_n <= 0:
            return []
        total = sum(w for _, w in pairs)
        target = total / min(top_n, n)
        out, accu, vsum, cnt, min_idx = [], 0, 0, 0, 0
        for i, (v, w) in enumerate(pairs):
            accu += w
            vsum += v
            cnt += 1
            if accu >= target:
                out.append((cnt, accu, pairs[min_idx][0], v, vsum / cnt))
                accu = vsum = cnt = 0
                min_idx = i + 1
        if min_idx < n:
            out.append(
                (cnt, accu, pairs[min_idx][0], pairs[n - 1][0], vsum / cnt)
            )
        return out

    rng = np.random.default_rng(17)
    for trial in range(200):
        n = int(rng.integers(1, 60))
        vals = rng.integers(0, int(rng.integers(2, 30)), size=n)
        wts = rng.integers(1, 9, size=n)
        topn = int(rng.integers(1, 10))
        got = compute_dynamic_numeric_ranges(vals, wts, topn)
        want = reference_sweep(vals.tolist(), wts.tolist(), topn)
        assert len(got) == len(want), (trial, got, want)
        for g, (cnt, wsum, vmin, vmax, cen) in zip(got, want):
            assert (g["count"], g["weight"], g["min"], g["max"]) == (
                cnt, wsum, vmin, vmax,
            ), trial
            assert g["centroid"] == pytest.approx(cen, rel=1e-12)
    assert compute_dynamic_numeric_ranges(np.array([]), np.array([]), 3) == []
    assert compute_dynamic_numeric_ranges(np.array([1]), np.array([1]), 0) == []


def test_group_heads_by_field(small_index, ray_session):
    """AllGroupHeadsCollector analogue vs a pandas brute force: one head
    per group among the hits, by (field desc, doc asc)."""
    import pandas as pd
    import ray.data

    from lucene_ray.pipelines.facets import group_heads_by_field

    out, doc_ids, texts, oracle = small_index
    rng = np.random.default_rng(7)
    keys = [f"k{rng.integers(0, 5)}" for _ in doc_ids]
    vals = rng.integers(0, 100, len(doc_ids)).astype(np.int64)
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "grp_col": pa.array(keys, pa.string()),
        "val": pa.array(vals),
    }))
    an = make_analyzer("standard_en")
    for qt in ["alpha", "alpha beta", "alpha -beta", "zzz"]:
        got = group_heads_by_field(out, qt, docs, "grp_col", "val")
        got_df = got.to_pandas()
        hits = set(matching_docs(IndexReader(out), parse_query(qt, an)).tolist())
        df = pd.DataFrame({"doc_id": doc_ids, "grp": keys, "val": vals})
        df = df[df["doc_id"].isin(hits)]
        if not hits:
            # 0-row Dataset.to_pandas() loses schema (known Ray quirk)
            assert len(got_df) == 0, qt
            continue
        want = (
            df.sort_values(["grp", "val", "doc_id"],
                           ascending=[True, False, True])
            .groupby("grp", as_index=False).first()
        )
        assert got_df["grp"].tolist() == want["grp"].tolist(), qt
        assert got_df["doc_id"].tolist() == want["doc_id"].tolist(), qt
        assert got_df["head_val"].tolist() == want["val"].tolist(), qt
