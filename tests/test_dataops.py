"""Training-data pipeline operators: dedup suite, KNN, text stats, windows.

Strategy mirrors the search-engine tests: every distributed operator is
compared against a trivial in-memory reference implementation on corpora
with planted duplicates / clusters, so LSH recall, exact verification, and
formula parity are all asserted, not assumed.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa
import pytest


def _docs_table(texts, ids=None):
    ids = list(range(len(texts))) if ids is None else ids
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def _neardup_corpus():
    """40 base docs + planted exact dups + near dups (1-2 word edits)."""
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(50)]
    texts = []
    for i in range(40):
        n = int(rng.integers(20, 40))
        texts.append(" ".join(rng.choice(vocab, size=n)))
    # exact duplicates of docs 0 and 1
    texts.append(texts[0])          # doc 40
    texts.append(texts[1])          # doc 41
    # near duplicates: one word changed at the end
    texts.append(texts[2].rsplit(" ", 1)[0] + " zzz")   # doc 42 ~ doc 2
    texts.append(texts[3] + " extraword")               # doc 43 ~ doc 3
    return texts


def _ref_jaccard_pairs(texts, k=3, thresh=0.8):
    from lucene_ray.pipelines.dedup import shingle_strings

    sets = [set(shingle_strings(t, k)) for t in texts]
    out = []
    for a in range(len(texts)):
        for b in range(a + 1, len(texts)):
            u = sets[a] | sets[b]
            if u:
                j = len(sets[a] & sets[b]) / len(u)
                if j >= thresh:
                    out.append((a, b, round(j, 4)))
    return out


def test_exact_dedup(ray_session):
    import ray.data

    from lucene_ray.pipelines.dedup import exact_dedup

    texts = ["aaa", "bbb", "aaa", "ccc", "bbb", "aaa"]
    ds = ray.data.from_arrow(_docs_table(texts))
    out = exact_dedup(ds).take_all()
    kept = sorted(r["doc_id"] for r in out)
    assert kept == [0, 1, 3]  # first occurrence of each distinct text
    fp = {r["doc_id"]: r["fingerprint"] for r in out}
    assert fp[0] == hashlib.md5(b"aaa").hexdigest()


def test_fingerprint_dedup(ray_session):
    """Token-set dedup: word order, repetition, case and stopwords are
    all identity-preserving; distinct token sets survive separately."""
    import ray.data

    from lucene_ray.pipelines.dedup import fingerprint_dedup

    texts = [
        "batch scan merge",          # 0: canonical
        "merge the BATCH scan",      # 1: reorder + case + stopword == 0
        "batch batch scan merge",    # 2: repetition == 0
        "batch scan",                # 3: subset -> distinct
        "",                          # 4: empty
        "the a",                     # 5: stopwords only -> empty key
    ]
    ds = ray.data.from_arrow(_docs_table(texts))
    out = fingerprint_dedup(ds).take_all()
    kept = {r["doc_id"]: r["fingerprint"] for r in out}
    assert sorted(kept) == [0, 3, 4]
    assert kept[0] == "batch merge scan"
    assert kept[3] == "batch scan"
    assert kept[4] == ""  # empty and stopword-only collapse together


def test_jaccard_and_minhash_agree(ray_session):
    import ray.data

    from lucene_ray.pipelines.dedup import (
        jaccard_neardup_pairs,
        minhash_neardup_pairs,
    )

    texts = _neardup_corpus()
    ds = ray.data.from_arrow(_docs_table(texts))
    ref = _ref_jaccard_pairs(texts)
    assert len(ref) >= 4  # the planted pairs are above threshold

    jac = jaccard_neardup_pairs(ds, df_max=20)
    got_j = list(
        zip(
            jac.column("doc_a").to_pylist(),
            jac.column("doc_b").to_pylist(),
            jac.column("jaccard").to_pylist(),
        )
    )
    assert got_j == sorted(ref)

    mh = minhash_neardup_pairs(ds, max_band_df=20)
    got_m = list(
        zip(
            mh.column("doc_a").to_pylist(),
            mh.column("doc_b").to_pylist(),
            mh.column("jaccard").to_pylist(),
        )
    )
    # MinHash+LSH candidates are verified exactly, so any pair it returns is
    # real; at j>=0.8 with 16x4 bands recall is ~0.99 — require full recall
    # of the planted exact dups and allow no false positives
    assert set(got_m) <= set(got_j)
    exact_pairs = {(0, 40), (1, 41)}
    assert exact_pairs <= {(a, b) for a, b, _ in got_m}


def test_simhash_finds_exact_dups(ray_session):
    import ray.data

    from lucene_ray.pipelines.dedup import simhash_neardup_pairs

    texts = _neardup_corpus()
    ds = ray.data.from_arrow(_docs_table(texts))
    out = simhash_neardup_pairs(ds, hamming_max=3, max_band_df=30)
    pairs = {
        (a, b): h
        for a, b, h in zip(
            out.column("doc_a").to_pylist(),
            out.column("doc_b").to_pylist(),
            out.column("hamming").to_pylist(),
        )
    }
    assert pairs.get((0, 40)) == 0  # identical text -> identical simhash
    assert pairs.get((1, 41)) == 0
    for (a, b), h in pairs.items():
        assert h <= 3


def test_keep_list(ray_session):
    from lucene_ray.pipelines.dedup import keep_list_from_pairs

    pairs = pa.table(
        {
            "doc_a": pa.array([0, 1], pa.int64()),
            "doc_b": pa.array([40, 41], pa.int64()),
            "jaccard": pa.array([1.0, 1.0]),
        }
    )
    all_ids = np.arange(44, dtype=np.int64)
    kept = keep_list_from_pairs(all_ids, pairs)
    assert 40 not in kept and 41 not in kept and len(kept) == 42


def _clustered_embeddings(n=200, dim=16, n_clusters=5, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    labels = rng.integers(0, n_clusters, size=n)
    mat = centers[labels] + 0.15 * rng.normal(size=(n, dim))
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(
                [row.astype(np.float32).tolist() for row in mat],
                pa.list_(pa.float32()),
            ),
        }
    ), mat.astype(np.float64)


def _ref_topk(mat, qid, k):
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = n @ n[qid]
    cos[qid] = -np.inf
    order = np.lexsort((np.arange(len(cos)), -cos))[:k]
    return list(order)


def test_knn_cosine_exact(ray_session):
    import ray.data

    from lucene_ray.pipelines.knn import knn_cosine

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(tbl)
    out = knn_cosine(ds, [0, 5, 9], k=10).take_all()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    for qid in (0, 5, 9):
        assert by_q[qid] == _ref_topk(mat, qid, 10)


def test_knn_ivf_recall(ray_session):
    import ray.data

    from lucene_ray.pipelines.knn import knn_cosine, knn_cosine_ivf

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(tbl)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_cosine(ds, [0, 5], k=10).take_all()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in knn_cosine_ivf(ds, [0, 5], k=10, num_centroids=8, nprobe=4).take_all()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7  # probing half the centroids on clustered data


def test_knn_hnsw_recall(ray_session, tmp_path):
    import ray.data

    from lucene_ray.pipelines.hnsw import knn_cosine_hnsw
    from lucene_ray.pipelines.knn import knn_cosine

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(tbl)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in knn_cosine(ds, [0, 5], k=10).take_all()
    }
    approx = {
        (r["query_id"], r["vec_id"])
        for r in knn_cosine_hnsw(
            ds, [0, 5], k=10, num_partitions=4,
            layout_dir=str(tmp_path / "hnsw"),
        ).take_all()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8  # graph beam search on clustered data


def _with_labels(tbl):
    import pyarrow as pa

    n = tbl.num_rows
    return tbl.append_column(
        "label", pa.array((np.arange(n) % 3).astype(np.int32))
    )


def test_knn_cosine_prefilter_exact(ray_session):
    """Filtered brute force == numpy top-k restricted to the filter set
    (KnnFloatVectorQuery pre-filter semantics)."""
    import ray.data

    from lucene_ray.pipelines.knn import knn_cosine

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(_with_labels(tbl))
    out = knn_cosine(ds, [0, 5], k=10, prefilter="label == 1").take_all()
    by_q = {}
    for r in sorted(out, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    norm = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    allowed = np.where(np.arange(len(mat)) % 3 == 1)[0]
    for qid in (0, 5):
        cos = norm[allowed] @ norm[qid]
        cand = allowed[allowed != qid]
        cos = cos[allowed != qid]
        order = np.lexsort((cand, -cos))[:10]
        assert by_q[qid] == list(cand[order])


def test_knn_hnsw_prefilter(ray_session, tmp_path):
    """Filtered graph search matches the exact filtered top-k on clustered
    data (visit-budget fallback makes small filters exact by construction;
    this filter is ~2/3 of rows so the graph path is exercised too)."""
    import ray.data

    from lucene_ray.pipelines.hnsw import knn_cosine_hnsw
    from lucene_ray.pipelines.knn import knn_cosine

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(_with_labels(tbl))
    for flt in ("label != 2", "label == 0"):
        exact = {
            (r["query_id"], r["vec_id"])
            for r in knn_cosine(ds, [0, 5], k=10, prefilter=flt).take_all()
        }
        approx = {
            (r["query_id"], r["vec_id"])
            for r in knn_cosine_hnsw(
                ds, [0, 5], k=10, num_partitions=4,
                layout_dir=str(tmp_path / f"hnsw-{hash(flt) & 0xffff}"),
                prefilter=flt,
            ).take_all()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.8, (flt, recall)


def test_sq_quantization_error_bound():
    """Reconstructed int8 dot stays within the analytic error bound of the
    exact dot for in-range components."""
    from lucene_ray.pipelines.knn import _sq_codes

    rng = np.random.default_rng(7)
    mat = rng.normal(size=(50, 16))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    lo, hi = float(mat.min()), float(mat.max())
    delta = (hi - lo) / 127.0
    codes, sums = _sq_codes(mat, lo, hi)
    d = mat.shape[1]
    recon = (
        d * lo * lo
        + lo * delta * (sums[:, None] + sums[None, :])
        + delta * delta * (codes.astype(np.int64) @ codes.astype(np.int64).T)
    )
    exact = mat @ mat.T
    # each component off by <= delta/2 -> dot off by <= d * (delta + delta^2/4)
    bound = d * (delta + delta * delta / 4.0)
    assert np.abs(recon - exact).max() <= bound


def test_knn_sq_recall(ray_session):
    """Quantized pre-selection + exact rescore recovers the exact top-k on
    clustered data; surviving cosines are exact (not dequantized)."""
    import ray.data

    from lucene_ray.pipelines.knn import knn_cosine, knn_cosine_sq

    tbl, mat = _clustered_embeddings()
    ds = ray.data.from_arrow(tbl)
    exact = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in knn_cosine(ds, [0, 5], k=10).take_all()
    }
    approx = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in knn_cosine_sq(ds, [0, 5], k=10, oversample=4).take_all()
    }
    hit = set(exact) & set(approx)
    assert len(hit) / len(exact) >= 0.9
    for key in hit:  # rescored values are exact cosines
        assert approx[key] == exact[key]


def test_cosine_pairs_threshold(ray_session):
    import ray.data

    from lucene_ray.pipelines.knn import cosine_pairs

    tbl, mat = _clustered_embeddings(n=60)
    ds = ray.data.from_arrow(tbl)
    got = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs(ds, threshold=0.9).take_all()
    }
    n = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = n @ n.T
    ref = {
        (a, b)
        for a in range(len(mat))
        for b in range(a + 1, len(mat))
        if cos[a, b] >= 0.9
    }
    assert got == ref and len(ref) > 0


def test_doc_stats_formulas(ray_session):
    import ray.data

    from lucene_ray.pipelines.textops import doc_stats

    texts = ["The quick brown fox", "", "a a a the", "hello world hello"]
    ds = ray.data.from_arrow(_docs_table(texts))
    rows = {r["doc_id"]: r for r in doc_stats(ds).take_all()}
    r0 = rows[0]
    assert r0["n_tokens"] == 4 and r0["n_stop"] == 1
    assert r0["n_chars"] == len(texts[0])
    assert rows[1]["n_tokens"] == 0 and rows[1]["quality"] == 0.0
    r2 = rows[2]
    assert r2["n_stop"] == 4 and r2["lang_pred"] == "en" and r2["quality"] == 0.0
    assert rows[3]["lang_pred"] == "und"  # no stopwords
    assert rows[3]["fingerprint"] == hashlib.md5(texts[3].encode()).hexdigest()


def test_window_aggregate(ray_session):
    import pandas as pd
    import ray.data

    from lucene_ray.pipelines.events import window_aggregate

    ts = pa.array(
        np.array(
            ["2024-01-01T00:10:00", "2024-01-01T00:50:00", "2024-01-01T01:10:00"],
            dtype="datetime64[us]",
        )
    )
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts,
            "event_type": pa.array(["a", "a", "a"], pa.string()),
            "value": pa.array([1.5, 2.5, 4.0]),
        }
    )
    out = window_aggregate(ray.data.from_arrow(tbl)).take_all()
    out = sorted(out, key=lambda r: r["window"])
    assert [r["n_events"] for r in out] == [2, 1]
    assert out[0]["sum_value"] == 4.0 and out[1]["sum_value"] == 4.0
    assert out[1]["window"] - out[0]["window"] == 1


def test_media_decode_stub(ray_session):
    import ray.data

    from lucene_ray.pipelines.multimodal import decode_images

    tbl = pa.table(
        {
            "media_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([b"\x89PNG-fake-bytes", b""], pa.binary()),
        }
    )
    out = decode_images(ray.data.from_arrow(tbl), payload_col="payload").take_all()
    assert len(out) == 2
    r = sorted(out, key=lambda r: r["media_id"])[0]
    assert "payload" not in r  # wide column dropped
    assert len(r["features"]) == 8
    # deterministic fake: same payload -> same features
    out2 = decode_images(ray.data.from_arrow(tbl), payload_col="payload").take_all()
    assert sorted(out2, key=lambda x: x["media_id"])[0]["features"] == r["features"]


def test_term_stats_matches_counter(ray_session):
    from collections import Counter

    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.stats import term_stats

    texts = ["the batch is small", "batch batch scan", "", "scan the scan"]
    ds = ray.data.from_arrow(_docs_table(texts))
    cfg = IndexConfig(analyzer="en_nostem_simple", norm_kind="exact")
    got = {
        r["term"]: (r["doc_freq"], r["total_tf"])
        for r in term_stats(ds, cfg).take_all()
    }
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("en_nostem_simple")
    df, ttf = Counter(), Counter()
    for t in texts:
        toks = an.analyze(t)
        for term, c in Counter(toks).items():
            df[term] += 1
            ttf[term] += c
    assert got == {t: (df[t], ttf[t]) for t in df}


def test_high_freq_terms_reference_order(ray_session):
    """HighFreqTerms top-N: (freq desc, term DESC) tie order — the
    reference PQ keeps the comparator-greatest TermStats and its
    comparators break freq ties on the greater term text
    (misc/HighFreqTerms.java:129-152)."""
    from collections import Counter

    import ray.data

    from lucene_ray.pipelines.build import IndexConfig
    from lucene_ray.pipelines.stats import high_freq_terms

    texts = ["the batch is small", "batch batch scan", "", "scan the scan",
             "small zebra small", "apple zebra"]
    ds = ray.data.from_arrow(_docs_table(texts))
    cfg = IndexConfig(analyzer="en_nostem_simple", norm_kind="exact")
    from lucene_ray.functions.analysis import make_analyzer

    an = make_analyzer("en_nostem_simple")
    df, ttf = Counter(), Counter()
    for t in texts:
        toks = an.analyze(t)
        for term, c in Counter(toks).items():
            df[term] += 1
            ttf[term] += c
    for order, c in (("doc_freq", df), ("total_tf", ttf)):
        want = sorted(c, key=lambda t: (-c[t], tuple(-b for b in t.encode())))
        got = [r["term"] for r in
               high_freq_terms(ds, n=4, order_by=order, cfg=cfg).take_all()]
        assert got == want[:4], (order, got, want[:4])
    with pytest.raises(ValueError):
        high_freq_terms(ds, n=4, order_by="nope", cfg=cfg)


def test_joins_match_pandas(ray_session):
    import pandas as pd
    import ray.data

    from lucene_ray.pipelines.joins import broadcast_join, hash_join

    rng = np.random.default_rng(41)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 50, size=500), pa.int64()),
            "v": pa.array(rng.random(500)),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(0, 60, 2, dtype=np.int64)),  # partial overlap
            "name": pa.array([f"n{i}" for i in range(0, 60, 2)], pa.string()),
        }
    )
    ref = (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk")
        .drop(columns=["rk"])
        .sort_values(["k", "v", "name"])
        .reset_index(drop=True)
    )
    for joined in (
        broadcast_join(ray.data.from_arrow(left), right, "k", "rk"),
        hash_join(
            ray.data.from_arrow(left),
            ray.data.from_arrow(right.rename_columns(["rk", "name"])),
            "k",
            "rk",
            num_buckets=8,
        ),
    ):
        got = (
            joined.to_pandas()[["k", "v", "name"]]
            .sort_values(["k", "v", "name"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref[["k", "v", "name"]])


def test_frame_sample_and_audio_features(ray_session):
    import ray.data

    from lucene_ray.pipelines.multimodal import AudioFeatureStage, sample_frames

    payloads = [b"0123456789abcdef", b"xyz", b""]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(3), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    rows = sorted(
        sample_frames(ds, n_frames=4, concurrency=1).take_all(),
        key=lambda r: (r["doc_id"], r["frame_idx"]),
    )
    assert len(rows) == 12  # 3 docs x 4 frames (empty payload -> 4 empty)
    r0 = [r for r in rows if r["doc_id"] == 0]
    assert [r["frame_off"] for r in r0] == [0, 4, 8, 12]
    assert [r["frame_bytes"] for r in r0] == [4, 4, 4, 4]
    assert r0[0]["digest"] == hashlib.md5(b"0123").hexdigest()
    # empty payload: 4 zero-length frames, digest of b""
    r2 = [r for r in rows if r["doc_id"] == 2]
    assert all(r["frame_bytes"] == 0 for r in r2)

    feats = ds.map_batches(
        AudioFeatureStage,
        fn_constructor_args=("payload",),
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    by_doc = {r["doc_id"]: r["features"] for r in feats}
    assert len(by_doc[0]) == AudioFeatureStage.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in by_doc[0])
    # deterministic: same payload -> same features
    feats2 = ds.map_batches(
        AudioFeatureStage,
        fn_constructor_args=("payload",),
        batch_format="pyarrow",
        concurrency=1,
    ).take_all()
    assert {r["doc_id"]: r["features"] for r in feats2} == by_doc
    # non-WAV payloads take the fake path
    assert all(not r["decoded"] and r["sample_rate"] == 0 for r in feats)


def test_audio_real_wav_decode(ray_session):
    """REAL codec path: stdlib-wave PCM decode -> per-window RMS features
    verified against a direct numpy computation on the known signal."""
    import io
    import wave as wavmod

    import ray.data

    from lucene_ray.pipelines.multimodal import AudioFeatureStage, decode_wav

    sr = 8000
    t = np.arange(sr, dtype=np.float64) / sr  # 1 second
    # half silence, half loud sine -> RMS windows split low/high
    sig = np.where(t < 0.5, 0.0, 0.5 * np.sin(2 * np.pi * 440 * t))
    pcm = (sig * 32767).astype("<i2")
    buf = io.BytesIO()
    with wavmod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    wav_bytes = buf.getvalue()

    got = decode_wav(wav_bytes)
    assert got is not None
    sr2, samples = got
    assert sr2 == sr and len(samples) == sr
    np.testing.assert_allclose(
        samples, pcm.astype(np.float32) / 32768.0, rtol=0, atol=0
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "payload": pa.array([wav_bytes, b"not audio"], pa.binary()),
        }
    )
    rows = (
        ray.data.from_arrow(tbl)
        .map_batches(
            AudioFeatureStage,
            fn_constructor_args=("payload",),
            batch_format="pyarrow",
            concurrency=1,
        )
        .take_all()
    )
    by = {r["doc_id"]: r for r in rows}
    assert by[0]["decoded"] and by[0]["sample_rate"] == sr
    assert by[0]["n_samples"] == sr
    f = np.asarray(by[0]["features"])
    dim = AudioFeatureStage.FEATURE_DIM
    # direct RMS over the same windows
    dec = pcm.astype(np.float32) / 32768.0
    want = [
        float(np.sqrt(np.mean(
            dec[i * sr // dim : (i + 1) * sr // dim].astype(np.float64) ** 2
        )))
        for i in range(dim)
    ]
    np.testing.assert_allclose(f, want, rtol=1e-6)
    # first half (silence) ~0, second half ~0.35 RMS of a 0.5-amp sine
    assert all(v < 1e-3 for v in f[: dim // 2])
    assert all(0.2 < v < 0.5 for v in f[dim // 2 :])
    assert not by[1]["decoded"]


def test_connected_components(ray_session):
    """Min-label propagation clusters == brute-force union-find, including
    a chain whose diameter forces multiple propagation rounds."""
    import ray.data

    from lucene_ray.pipelines.dedup import connected_components_ds

    pairs = pa.table(
        {
            "doc_a": pa.array([2, 3, 9, 5, 10, 11, 12, 13, 20], pa.int64()),
            "doc_b": pa.array([1, 2, 3, 6, 11, 12, 13, 14, 21], pa.int64()),
        }
    )
    # brute union-find
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(), pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in parent}
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_ds(ray.data.from_arrow(pairs)).take_all()
    }
    assert got == want

    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    assert connected_components_ds(ray.data.from_arrow(empty)).count() == 0


def test_dedup_clusters_from_texts(ray_session):
    """dedup_clusters groups transitive near-dups: A~B and B~C put A, B, C
    in one cluster keyed by the smallest doc_id even when A and C are not
    themselves a verified pair."""
    import ray.data

    from lucene_ray.pipelines.dedup import (
        dedup_clusters,
        jaccard_neardup_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again "
    texts = [
        base + "alpha beta gamma delta epsilon zeta",         # 0
        base + "alpha beta gamma delta epsilon eta",          # 1 ~ 0
        base + "alpha beta gamma delta theta eta",            # 2 ~ 1 (less ~0)
        "completely different words about ray data engines "
        "and arrow tables columnar formats",                  # 3
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)
    pairs = jaccard_neardup_pairs(ds, df_max=20, threshold=0.6)
    clusters = dedup_clusters(ds, df_max=20, threshold=0.6)
    got = dict(
        zip(
            clusters.column("doc_id").to_pylist(),
            clusters.column("cluster_id").to_pylist(),
        )
    )
    # every doc in a verified pair got a cluster; transitivity holds
    in_pairs = set(pairs.column("doc_a").to_pylist()) | set(
        pairs.column("doc_b").to_pylist()
    )
    assert set(got) == in_pairs
    assert 3 not in got
    if {0, 1, 2} <= in_pairs:
        assert got[0] == got[1] == got[2] == 0


def test_cap_per_key_and_hash_sample(ray_session):
    import ray.data

    from lucene_ray.pipelines.sampling import (
        cap_per_key,
        hash_sample,
        stratified_sample,
    )

    n = 57
    keys = [f"k{i % 5}" for i in range(n)]
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "key": pa.array(keys, pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)

    capped = cap_per_key(ds, "key", 3).take_all()
    got = {}
    for r in capped:
        got.setdefault(r["key"], []).append(r["doc_id"])
    for k, ids in got.items():
        want = sorted(d for d in range(n) if keys[d] == k)[:3]
        assert sorted(ids) == want
    assert len(capped) == 15

    frac = 0.3
    sampled = sorted(r["doc_id"] for r in hash_sample(ds, frac).take_all())
    thresh = int(frac * (1 << 32))
    want = [
        d for d in range(n) if (d * 2654435761) % (1 << 32) < thresh
    ]
    assert sampled == want
    # deterministic across runs
    assert sampled == sorted(
        r["doc_id"] for r in hash_sample(ds, frac).take_all()
    )

    strat = stratified_sample(ds, "key", 0.1, min_per_key=2).take_all()
    ids = sorted(r["doc_id"] for r in strat)
    assert len(ids) == len(set(ids))  # no duplicates from the floor union
    per_key = {}
    for r in strat:
        per_key.setdefault(r["key"], []).append(r["doc_id"])
    for k in set(keys):
        assert len(per_key.get(k, [])) >= 2  # rare-stratum floor holds


def test_lm_quality_scores(ray_session):
    """Trigram-LM quality == brute-force recomputation; short docs get 0;
    natural text outscores garbage under the corpus model."""
    import math

    import ray.data

    from lucene_ray.pipelines.textops import lm_quality_scores

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox naps under the warm sun",
        "qzxj vkwq zzqx jjxv wqkz",   # garbage relative to corpus
        "ab",                          # < 3 normalized chars -> 0.0
        "the the the the the the",
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)
    got = {
        r["doc_id"]: r["lm_logprob"]
        for r in lm_quality_scores(ds).take_all()
    }

    # brute model
    import re

    tok = re.compile(r"[a-z0-9]+")
    def tris(t):
        s = " ".join(tok.findall(t.lower()))
        return [s[i:i + 3] for i in range(len(s) - 2)]

    from collections import Counter

    model = Counter()
    for t in texts:
        model.update(tris(t))
    total = sum(model.values())
    denom = total + 37 ** 3
    want = {}
    for d, t in enumerate(texts):
        tt = tris(t)
        if not tt:
            want[d] = 0.0
        else:
            want[d] = round(
                sum(math.log((model[x] + 1) / denom) for x in tt) / len(tt),
                6,
            )
    assert got == pytest.approx(want, abs=2e-6)
    assert got[3] == 0.0
    assert got[0] > got[2]  # natural text beats garbage
    # deterministic across runs
    again = {
        r["doc_id"]: r["lm_logprob"]
        for r in lm_quality_scores(ds).take_all()
    }
    assert again == got


def test_connected_components_long_chain_log_rounds(ray_session):
    """Pointer doubling: a 200-node chain converges well inside 30 rounds
    (O(log diameter), not O(diameter))."""
    import ray.data

    from lucene_ray.pipelines.dedup import connected_components_ds

    n = 200
    pairs = pa.table(
        {
            "doc_a": pa.array(range(n - 1), pa.int64()),
            "doc_b": pa.array(range(1, n), pa.int64()),
        }
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_ds(
            ray.data.from_arrow(pairs), max_iters=30
        ).take_all()
    }
    assert got == {i: 0 for i in range(n)}


def test_repetition_stats(ray_session):
    """Gopher repetition fractions vs hand-computed values."""
    import ray.data

    from lucene_ray.pipelines.textops import repetition_stats

    texts = [
        "a b a b a b",       # bigrams: ab,ba,ab,ba,ab -> 2 distinct / 5
        "w x y z",           # all bigrams unique
        "solo",              # <2 tokens -> zeros
        "t t t t",           # single repeated bigram/trigram
    ]
    docs = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = {
        r["doc_id"]: (
            r["dup_bigram_frac"], r["top_bigram_frac"], r["rep_trigram_frac"]
        )
        for r in repetition_stats(ray.data.from_arrow(docs)).take_all()
    }
    assert got[0] == (pytest.approx(1 - 2 / 5), pytest.approx(3 / 5),
                      pytest.approx(1.0))  # aba x2, bab x2 all repeated
    assert got[1] == (0.0, pytest.approx(1 / 3), 0.0)
    assert got[2] == (0.0, 0.0, 0.0)
    assert got[3] == (pytest.approx(1 - 1 / 3), pytest.approx(1.0),
                      pytest.approx(1.0))


def test_mixture_sample(ray_session):
    import ray.data

    from lucene_ray.pipelines.sampling import mixture_sample

    n = 400
    keys = [f"s{i % 4}" for i in range(n)]
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "src": pa.array(keys, pa.string()),
        }
    )
    fr = {"s0": 1.0, "s1": 0.5, "s3": 0.0}
    out = mixture_sample(
        ray.data.from_arrow(docs), fr, key="src", default=0.25
    ).take_all()
    got = {}
    for r in out:
        got.setdefault(r["src"], []).append(r["doc_id"])
    mod = 1 << 32
    for k, f in (("s0", 1.0), ("s1", 0.5), ("s2", 0.25), ("s3", 0.0)):
        th = int(f * mod)
        want = [
            d for d in range(n)
            if keys[d] == k and (d * 2654435761) % mod < th
        ]
        assert got.get(k, []) == want, k
    assert len(got.get("s0", [])) == 100  # fraction 1.0 keeps everything
    assert "s3" not in got                # fraction 0.0 drops everything


def test_write_partitioned_resume(ray_session, tmp_path):
    """Partitioned sink: atomic per-partition publish; resume rewrites
    ONLY unpublished partitions (finished rows never re-shuffle)."""
    import os

    import ray.data

    from lucene_ray.sources.sink import (
        finished_partitions,
        read_partitioned,
        write_partitioned,
    )

    out = str(tmp_path / "sink")
    n = 60
    docs = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "grp": pa.array([f"g{i % 3}" for i in range(n)], pa.string()),
        }
    )
    ds = ray.data.from_arrow(docs)
    first = write_partitioned(ds, out, "grp")
    assert first == ["g0", "g1", "g2"]
    assert finished_partitions(out) == ["g0", "g1", "g2"]

    # simulate a crash on g1: unpublish it
    os.remove(os.path.join(out, "g1", "_DONE"))
    os.remove(os.path.join(out, "g1", "part.parquet"))
    mtime_g0 = os.path.getmtime(os.path.join(out, "g0", "part.parquet"))

    second = write_partitioned(ds, out, "grp", resume=True)
    assert second == ["g1"]  # only the missing partition rewrote
    assert os.path.getmtime(os.path.join(out, "g0", "part.parquet")) == mtime_g0

    back = read_partitioned(out).take_all()
    assert sorted(r["doc_id"] for r in back) == list(range(n))
    # resume with everything published is a no-op
    assert write_partitioned(ds, out, "grp", resume=True) == []


def test_write_partitioned_hostile_values(ray_session, tmp_path):
    """Crawl-derived partition values (slashes, dot segments, empty,
    unicode, literal %) must stay inside out_dir, never collide, and
    round-trip through resume + read."""
    import os

    import ray.data

    from lucene_ray.sources.sink import (
        decode_partition_value,
        encode_partition_value,
        finished_partitions,
        read_partitioned,
        write_partitioned,
    )

    vals = ["a/b", "..", "", "héllo", "a%2Fb", "a b", ".", "a/b/../c"]
    # injective encode, decode round-trips, no separators/dot segments
    encs = [encode_partition_value(v) for v in vals]
    assert len(set(encs)) == len(vals)
    for v, e in zip(vals, encs):
        assert decode_partition_value(e) == v
        assert "/" not in e and e not in ("", ".", "..")
        assert os.path.basename(e) == e

    docs = pa.table(
        {
            "doc_id": pa.array(range(len(vals) * 2), pa.int64()),
            "grp": pa.array(vals * 2, pa.string()),
        }
    )
    out = str(tmp_path / "sink2")
    written = write_partitioned(ray.data.from_arrow(docs), out, "grp")
    assert written == sorted(vals)
    assert finished_partitions(out) == sorted(vals)
    # nothing escaped out_dir: exactly one dir per value, all inside
    subdirs = [d for d in os.listdir(out)]
    assert sorted(subdirs) == sorted(encs)
    back = read_partitioned(out).take_all()
    assert sorted(r["doc_id"] for r in back) == list(range(len(vals) * 2))
    # selective read by VALUE
    one = read_partitioned(out, ["a/b"]).take_all()
    assert sorted(r["grp"] for r in one) == ["a/b", "a/b"]
    # resume is a no-op with hostile names too
    assert write_partitioned(
        ray.data.from_arrow(docs), out, "grp", resume=True
    ) == []


def test_decontaminate(ray_session):
    """n-gram eval decontamination vs a brute python set computation,
    including a doc contaminated only via a cross-doc shared window."""
    import re

    import ray.data

    from lucene_ray.pipelines.textops import decontaminate

    TOK = re.compile(r"[a-z0-9]+")
    bench_texts = [
        "the quick brown fox jumps over the lazy dog",
        "to be or not to be that is the question",
    ]
    corpus = [
        "totally clean document about spark windows",        # clean
        "he saw the quick brown fox jumps away",             # 4-gram overlap
        "to be or not to match here",                        # 4-gram overlap
        "quick brown fox nearby",                            # only 3-gram: clean at n=4
        bench_texts[0],                                      # benchmark verbatim
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(corpus)), pa.int64()),
                "text": pa.array(corpus, pa.string()),
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 100 + len(bench_texts)), pa.int64()),
                "text": pa.array(bench_texts, pa.string()),
            }
        )
    )
    got = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(docs, bench, n=4).take_all()
    }

    def grams(t, n=4):
        toks = TOK.findall(t.lower())
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    bset = set().union(*[grams(t) for t in bench_texts])
    want = {}
    for d, t in enumerate(corpus):
        h = len(grams(t) & bset)
        if h:
            want[d] = h
    assert got == want
    assert 0 not in got and 3 not in got  # clean docs stay clean
    assert got[4] == len(grams(bench_texts[0]))  # verbatim copy: all grams


def test_pii_scrub(ray_session):
    import ray.data

    from lucene_ray.pipelines.textops import pii_scrub

    texts = [
        "contact me at jane.doe+spam@example.co.uk or 192.168.1.254 thanks",
        "call +1 555-123-4567 or 555 987 6543 now",
        "no pii here at all",
        "a@b.io and 10.0.0.1 and 10.0.0.2",
        "",
    ]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
            }
        )
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).take_all()}
    assert rows[0]["text"] == "contact me at <EMAIL> or <IPV4> thanks"
    assert rows[0]["n_email"] == 1 and rows[0]["n_ipv4"] == 1
    assert rows[1]["n_phone"] == 2 and "<PHONE>" in rows[1]["text"]
    assert "555" not in rows[1]["text"]
    assert rows[2]["text"] == texts[2]
    assert rows[3]["n_email"] == 1 and rows[3]["n_ipv4"] == 2
    assert rows[4]["text"] == ""


def test_cosine_pairs_ivf_recall_and_dedupe(ray_session):
    """IVF-blocked near-dup (the cosine_pairs scale path): on clustered
    embeddings the approximate pair set is a SUBSET of the exact one with
    recall >= 0.9, each pair emitted exactly once (in-plan min-shared
    dedupe), and every found cosine bit-equal to the exact operator's."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.knn import cosine_pairs, cosine_pairs_ivf

    rng = np.random.default_rng(5)
    centers = rng.normal(size=(6, 16))
    rows = []
    for i in range(360):
        c = centers[i % 6]
        rows.append((c + 0.12 * rng.normal(size=16)).astype(np.float32))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(360), pa.int64()),
            "embedding": pa.array([r.tolist() for r in rows],
                                  pa.list_(pa.float32())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    exact = cosine_pairs(ds, threshold=0.9).to_pandas()
    approx = cosine_pairs_ivf(
        ds, threshold=0.9, num_centroids=6, n_probe=2
    ).to_pandas()
    se = set(map(tuple, exact[["vec_a", "vec_b"]].values.tolist()))
    sa = set(map(tuple, approx[["vec_a", "vec_b"]].values.tolist()))
    assert len(se) > 50  # clustered data actually has near-dups
    assert len(approx) == len(sa)  # no duplicate emissions
    assert sa <= se  # approximate set is a subset (cosines exact)
    assert len(se & sa) / len(se) >= 0.9
    em = {tuple(r[:2]): r[2] for r in exact.values.tolist()}
    for r in approx.values.tolist():
        assert em[(r[0], r[1])] == r[2]  # bit-equal rounded cosine


def test_pack_sequences_prefix_and_buckets(ray_session):
    """Concat-and-chunk packing: exact prefix sums across bucket
    boundaries, empty docs dropped, chunk ranges consistent."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from lucene_ray.pipelines.textops import pack_sequences

    rng = np.random.default_rng(3)
    texts = [
        " ".join(f"w{j}" for j in range(int(rng.integers(0, 40))))
        for _ in range(300)
    ]
    texts[7] = ""          # zero-token doc drops
    texts[100] = "   "     # whitespace-only drops
    tbl = pa.table(
        {
            "doc_id": pa.array(range(300), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    got = (
        pack_sequences(ray.data.from_arrow(tbl), seq_len=64, bucket_size=32)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    import re

    tok = re.compile(r"[a-z0-9]+")
    off = 0
    exp = []
    for d, t in enumerate(texts):
        n = len(tok.findall(t.lower()))
        if n:
            exp.append((d, n, off, off // 64, (off + n - 1) // 64))
        off += n
    assert got.values.tolist() == [list(e) for e in exp]


def test_vector_similarity_threshold(ray_session):
    """FloatVectorSimilarityQuery analogue: every vector at cosine >=
    threshold, exact vs a numpy brute force; prefilter respected."""
    import ray.data

    from lucene_ray.pipelines.knn import vector_similarity_search

    tbl, mat = _clustered_embeddings()
    labels = (np.arange(len(tbl)) % 3).astype(np.int64)
    tbl = tbl.append_column("label", pa.array(labels))
    ds = ray.data.from_arrow(tbl)
    # mirror the engine exactly: stored floats are float32, promoted to
    # float64 at scoring time
    m32 = np.stack([
        np.asarray(r, dtype=np.float32) for r in
        tbl.column("embedding").to_pylist()
    ]).astype(np.float64)
    normed = m32 / np.linalg.norm(m32, axis=1, keepdims=True)
    for thresh in (0.3, 0.7):
        out = vector_similarity_search(ds, [0, 5], thresh).take_all()
        got = {(r["query_id"], r["vec_id"]) for r in out}
        want = set()
        for qid in (0, 5):
            sims = normed @ normed[qid]
            for v in np.flatnonzero(sims >= thresh):
                if v != qid:
                    want.add((qid, int(v)))
        assert got == want, thresh
        # reported cosines match the brute force at output rounding
        for r in out:
            assert r["cosine"] == pytest.approx(
                float(normed[r["vec_id"]] @ normed[r["query_id"]]), abs=1e-6
            )
    # prefilter restricts candidates, not the query lookup
    lab0 = int(labels[0])
    outf = vector_similarity_search(
        ds, [0], 0.3, prefilter=f"label == {lab0}"
    ).take_all()
    sims = normed @ normed[0]
    wantf = {
        int(v) for v in np.flatnonzero((sims >= 0.3) & (labels == lab0))
        if v != 0
    }
    assert {r["vec_id"] for r in outf} == wantf
