"""Similarity search over an embedding column (list<float>).

* :func:`knn_cosine` — brute-force cosine top-k: the query matrix is put in
  the object store ONCE (``ray.put``) and every ``map_batches`` task reads it
  zero-copy; per batch one float64 matmul scores all (query, row) pairs and
  only each batch's local top-k rows survive, so the final groupby touches
  O(num_blocks * k) rows, not O(n). This is the exact baseline.
* :func:`cosine_pairs` — all pairs with cosine >= threshold
  (embedding-space near-dup detection), same broadcast + blocked matmul.
* :func:`knn_cosine_ivf` — the scale path: a fixed-seed sample of rows
  becomes IVF centroids; rows are bucketed to their nearest centroid
  (one shuffle); a query probes only the ``nprobe`` nearest buckets.
  Approximate: recall measured against :func:`knn_cosine` in tests.

All cosines are computed in float64 and rounded to 6 decimals at the edge
(matches the DuckDB oracle, which sums float64 products over unnested
lists).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from ..functions.rounding import round_half_away


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy-ish."""
    arr = batch.column(col)
    if arr.num_chunks == 1:
        la = arr.chunk(0)
    else:
        la = arr.combine_chunks()
    # flatten() (NOT .values): a zero-copy SLICE of a list array —
    # map_groups hands those out — keeps the parent's full child buffer
    # in .values, silently mis-shaping the matrix; flatten() respects
    # the slice offsets
    flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(la)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _topk_score_batch(batch: pa.Table, queries_ref, k: int) -> pa.Table:
    """Task-pool wrapper: init is one zero-copy ``ray.get`` of the broadcast
    query matrix, so a plain function avoids actor-pool startup cost (the
    stateful-actor rule applies to EXPENSIVE init only)."""
    return _TopKScoreStage(queries_ref, k)(batch)


class _TopKScoreStage:
    """Per-batch scoring against the broadcast normalized query matrix."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["qids"]
        self.qmat = q["mat"]  # already normalized, float64
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, "embedding"))
        ids = batch.column("vec_id").to_numpy()
        if len(ids) == 0 or self.qmat.size == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        scores = self.qmat @ mat.T  # (nq, nbatch)
        k = min(self.k, scores.shape[1])
        out_q: List[int] = []
        out_v: List[np.ndarray] = []
        out_s: List[np.ndarray] = []
        for qi in range(scores.shape[0]):
            row = scores[qi]
            if len(row) > k:
                # keep every row at/above the kth score so boundary ties
                # survive to the final (cosine desc, vec_id asc) sort —
                # mirrors query.py's _topk_from tie handling
                kth = np.partition(row, len(row) - k)[len(row) - k]
                top = np.flatnonzero(row >= kth)
            else:
                top = np.arange(len(row))
            out_q.extend([int(self.qids[qi])] * len(top))
            out_v.append(ids[top])
            out_s.append(row[top])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def _final_topk(group: pa.Table, k: int) -> pa.Table:
    g = group.sort_by([("cosine", "descending"), ("vec_id", "ascending")]).slice(0, k)
    n = len(g)
    return pa.table(
        {
            "query_id": g.column("query_id"),
            "rank": pa.array(np.arange(1, n + 1, dtype=np.int32)),
            "vec_id": g.column("vec_id"),
            "cosine": pa.array(round_half_away(g.column("cosine").to_numpy(), 6)),
        }
    )


def load_queries(
    ds: "ray.data.Dataset", query_ids: Sequence[int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Fetch the (small) query rows out of the dataset by vec_id."""
    wanted = set(int(q) for q in query_ids)

    def pick(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        mask = np.isin(ids, np.asarray(sorted(wanted), dtype=np.int64))
        return batch.filter(pa.array(mask))

    rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: int(r["vec_id"]))
    qids = np.asarray([int(r["vec_id"]) for r in rows], dtype=np.int64)
    mat = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    return qids, mat


def knn_cosine(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    k: int = 10,
    prefilter: Optional[str] = None,
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query vec_id.

    ``prefilter`` is a Ray Data filter expression (e.g. ``"label == 3"``)
    restricting the CANDIDATE set before scoring — the analogue of the
    filter query on Lucene's ``KnnFloatVectorQuery`` (pre-filter semantics:
    top-k is taken among matching docs, the query vector itself is looked
    up in the unfiltered dataset). The filter runs inside the streaming
    plan (Ray pushes simple expressions toward the read), so no extra
    materialization happens.

    -> Dataset(query_id, rank, vec_id, cosine) — self-matches excluded.
    """
    qids, qmat = load_queries(ds, query_ids)
    queries_ref = ray.put({"qids": qids, "mat": _normalize(qmat)})
    if prefilter is not None:
        ds = ds.filter(expr=prefilter)
    partial = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _topk_score_batch,
        batch_format="pyarrow",
        # +1 to survive self-match
        fn_kwargs={"queries_ref": queries_ref, "k": k + 1},
    )

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    return partial.groupby("query_id").map_groups(
        topk_no_self, batch_format="pyarrow"
    )


def vector_similarity_search(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    threshold: float,
    prefilter: Optional[str] = None,
) -> "ray.data.Dataset":
    """Float vector similarity RANGE search — every vector whose cosine
    similarity to the query meets ``threshold``, rather than a top-k
    (reference: core/.../search/FloatVectorSimilarityQuery.java via
    AbstractVectorSimilarityQuery: "search for all (approximate) float
    vectors above a similarity threshold"; this is the exact baseline —
    the reference's own fallback when graph traversal visits too much).

    Scale shape: a PURE streaming map + filter — no heap, no groupby, no
    shuffle; the only driver state is the broadcast query matrix, and the
    result streams straight to the consumer. ``prefilter`` restricts
    candidates like :func:`knn_cosine`.

    -> Dataset(query_id, vec_id, cosine[float64]) — self-matches
    excluded; unordered (a threshold query has no rank)."""
    qids, qmat = load_queries(ds, query_ids)
    queries_ref = ray.put({"qids": qids, "mat": _normalize(qmat)})
    if prefilter is not None:
        ds = ds.filter(expr=prefilter)

    def score(batch: pa.Table) -> pa.Table:
        q = ray.get(queries_ref)
        mat = _normalize(_batch_matrix(batch, "embedding"))
        vec_ids = batch.column("vec_id").to_numpy().astype(np.int64)
        sims = mat @ q["mat"].T  # (rows, n_queries) float64
        out_q, out_v, out_c = [], [], []
        for j, qid in enumerate(q["qids"]):
            hit = np.flatnonzero(
                (sims[:, j] >= threshold) & (vec_ids != qid)
            )
            out_q.append(np.full(len(hit), qid, dtype=np.int64))
            out_v.append(vec_ids[hit])
            out_c.append(sims[hit, j])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_v)),
                "cosine": pa.array(
                    round_half_away(np.concatenate(out_c), 6)
                ),
            }
        )

    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        score, batch_format="pyarrow"
    )


_GOLD = np.uint64(0x9E3779B97F4A7C15)

_PAIRS_OUT_SCHEMA = pa.schema(
    [("vec_a", pa.int64()), ("vec_b", pa.int64()), ("cosine", pa.float64())]
)


def cosine_pairs(
    ds: "ray.data.Dataset",
    threshold: float = 0.45,
    rows_per_block: int = 8192,
    n_rows: Optional[int] = None,
) -> "ray.data.Dataset":
    """All embedding pairs with cosine >= threshold (near-dup by embedding).

    EXACT distributed all-pairs via block-pair grouping (block nested-loop):
    rows are hashed into B blocks of ~``rows_per_block``; each row is
    replicated to the B pair-groups its block participates in; one
    ``groupby`` co-locates every (block_i, block_j) pair exactly once and a
    single matmul scores it. Nothing is materialized on the driver and no
    full-corpus broadcast exists — per-group memory is 2*rows_per_block*dim
    floats regardless of corpus size. Exact all-pairs is inherently O(N^2)
    compute; shuffled volume is O(N * B) = O(N^2 / rows_per_block), the
    standard exact-block-join tradeoff (raise ``rows_per_block`` to trade
    group memory for replication). For approximate web-scale near-dup at
    high thresholds, LSH/IVF blocking bounds candidates instead (see
    :func:`knn_cosine_ivf`); this operator stays exact to its oracle.
    """
    if n_rows is None:
        n_rows = ds.count()
    nb = max(1, -(-int(n_rows) // rows_per_block))

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        blk = ((ids.astype(np.uint64) * _GOLD) % np.uint64(nb)).astype(np.int64)
        # row in block b joins pair-groups {(min(b,j), max(b,j)) : j}
        reps = pa.array(np.repeat(np.arange(len(ids), dtype=np.int64), nb))
        wide = batch.take(reps)
        b_rep = np.repeat(blk, nb)
        j_rep = np.tile(np.arange(nb, dtype=np.int64), len(ids))
        lo = np.minimum(b_rep, j_rep)
        hi = np.maximum(b_rep, j_rep)
        gkey = lo * nb + hi
        return wide.append_column(
            "_blk", pa.array(b_rep)
        ).append_column("_pgroup", pa.array(gkey))

    def pair_group(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return _PAIRS_OUT_SCHEMA.empty_table()
        gkey = int(group.column("_pgroup")[0].as_py())
        gi, gj = divmod(gkey, nb)
        ids = group.column("vec_id").to_numpy()
        blk = group.column("_blk").to_numpy()
        mat = _normalize(_batch_matrix(group, "embedding"))
        if gi == gj:
            # diagonal block: upper triangle in ascending-id order
            order = np.argsort(ids)
            m, idv = mat[order], ids[order]
            s = m @ m.T
            ai, bi = np.nonzero(np.triu(s >= threshold, k=1))
            a_id, b_id = idv[ai], idv[bi]
            cosv = s[ai, bi]
        else:
            selA = np.flatnonzero(blk == gi)
            selB = np.flatnonzero(blk == gj)
            mA, idA = mat[selA], ids[selA]
            mB, idB = mat[selB], ids[selB]
            s = mA @ mB.T
            ai, bi = np.nonzero(s >= threshold)
            a_id, b_id = idA[ai], idB[bi]
            cosv = s[ai, bi]
            flip = a_id > b_id
            a_id, b_id = np.where(flip, b_id, a_id), np.where(flip, a_id, b_id)
        return pa.table(
            {
                "vec_a": pa.array(a_id.astype(np.int64)),
                "vec_b": pa.array(b_id.astype(np.int64)),
                "cosine": pa.array(round_half_away(cosv, 6)),
            },
            schema=_PAIRS_OUT_SCHEMA,
        )

    return (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(explode, batch_format="pyarrow")
        .groupby("_pgroup")
        .map_groups(pair_group, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def _sample_rows(ds: "ray.data.Dataset", count: int) -> np.ndarray:
    """Deterministic pseudo-random sample of ``count`` embedding rows: each
    batch keeps its local ``count`` smallest by a fixed multiplicative hash
    of vec_id, then only those candidates (count * num_blocks rows — tiny)
    are globally sorted and cut. No full-dataset sort or materialization."""

    def local_top(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        if len(ids) == 0:
            return batch.append_column("_h", pa.array([], pa.uint64()))
        h = ids.astype(np.uint64) * _GOLD
        kk = min(count, len(ids))
        idx = np.argpartition(h, kk - 1)[:kk] if len(ids) > kk else np.arange(len(ids))
        return batch.take(pa.array(idx)).append_column(
            "_h", pa.array(h[idx], pa.uint64())
        )

    rows = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(local_top, batch_format="pyarrow")
        .sort("_h")
        .limit(count)
        .take_all()
    )
    return np.asarray([r["embedding"] for r in rows], dtype=np.float64)


def _kmeans_partial_batch(batch: pa.Table, cents_ref) -> pa.Table:
    """Task-pool wrapper (cheap init — see _topk_score_batch)."""
    return _KMeansPartialStage(cents_ref)(batch)


class _KMeansPartialStage:
    """One spherical-k-means assignment pass, emitting per-batch partial
    (centroid, count, sum-vector) rows — K rows per batch, so the reduce
    input is O(K * num_blocks), never corpus-sized."""

    def __init__(self, cents_ref):
        self.cents = ray.get(cents_ref)  # normalized (K, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        kc, dim = self.cents.shape
        mat = _normalize(_batch_matrix(batch, "embedding"))
        if len(mat) == 0:
            return pa.table(
                {
                    "centroid": pa.array([], pa.int32()),
                    "count": pa.array([], pa.int64()),
                    "vecsum": pa.array([], pa.binary()),
                }
            )
        assign = (mat @ self.cents.T).argmax(axis=1)
        counts = np.bincount(assign, minlength=kc).astype(np.int64)
        sums = np.zeros((kc, mat.shape[1]), dtype=np.float64)
        np.add.at(sums, assign, mat)
        return pa.table(
            {
                "centroid": pa.array(np.arange(kc, dtype=np.int32)),
                "count": pa.array(counts),
                "vecsum": pa.array([row.tobytes() for row in sums], pa.binary()),
            }
        )


def ivf_centroids(
    ds: "ray.data.Dataset",
    num_centroids: int = 16,
    kmeans_iters: int = 2,
) -> np.ndarray:
    """Deterministic IVF centroids: hash-sampled seeds + ``kmeans_iters``
    Lloyd refinement passes (spherical k-means). Each pass is one streaming
    ``map_batches`` whose partials are K small rows per batch; only the
    (K, dim) centroid matrix ever reaches the driver."""
    cents = _normalize(_sample_rows(ds, num_centroids))
    for _ in range(max(0, kmeans_iters)):
        cents_ref = ray.put(cents)
        partials = (
            ds.select_columns(["vec_id", "embedding"])
            .map_batches(
                _kmeans_partial_batch,
                batch_format="pyarrow",
                fn_kwargs={"cents_ref": cents_ref},
            )
            .take_all()
        )  # K rows per block — tiny
        kc, dim = cents.shape
        counts = np.zeros(kc, dtype=np.int64)
        sums = np.zeros((kc, dim), dtype=np.float64)
        for r in partials:
            c = int(r["centroid"])
            counts[c] += int(r["count"])
            sums[c] += np.frombuffer(r["vecsum"], dtype=np.float64)
        nonempty = counts > 0
        cents = cents.copy()
        cents[nonempty] = _normalize(sums[nonempty] / counts[nonempty, None])
    return cents


IVF_META = "ivf_meta.json"


def build_ivf_layout(
    ds: "ray.data.Dataset",
    out_dir: str,
    num_centroids: int = 16,
    kmeans_iters: int = 2,
    fingerprint: str = "",
) -> np.ndarray:
    """Write the centroid-partitioned IVF layout ONCE: parquet partitioned
    by assigned centroid (hive dirs ``centroid=N``) + the centroid matrix in
    a small meta file. Query batches then read ONLY their probed partitions
    — the write-once / probe-few layout the scale path requires. A matching
    fingerprint short-circuits the build (resume discipline)."""
    import json
    import os

    meta_path = os.path.join(out_dir, IVF_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("fingerprint") == fingerprint and meta.get(
            "num_centroids"
        ) == num_centroids:
            return np.asarray(meta["centroids"], dtype=np.float64)

    cents = ivf_centroids(ds, num_centroids, kmeans_iters)
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(_batch_matrix(batch, "embedding"))
        bucket = (
            (mat @ c.T).argmax(axis=1).astype(np.int32)
            if len(batch)
            else np.empty(0, np.int32)
        )
        # partition col (consumed by the writer) + an in-data copy
        return batch.append_column("centroid", pa.array(bucket)).append_column(
            "_centroid", pa.array(bucket)
        )

    os.makedirs(out_dir, exist_ok=True)
    (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .write_parquet(out_dir, partition_cols=["centroid"])
    )
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "fingerprint": fingerprint,
                "num_centroids": num_centroids,
                "centroids": cents.tolist(),
            },
            f,
        )
    os.replace(tmp, meta_path)
    return cents


def _probe_score_batch(batch: pa.Table, queries_ref, probe_ref, k: int) -> pa.Table:
    """Task-pool wrapper (cheap init — see _topk_score_batch)."""
    return _ProbeScoreStage(queries_ref, probe_ref, k)(batch)


class _ProbeScoreStage:
    """Scores ALL queries against each batch in ONE matmul; rows outside a
    query's probe set are masked out before its per-batch top-k cut."""

    def __init__(self, queries_ref, probe_ref, k: int):
        q = ray.get(queries_ref)
        self.qids = q["qids"]
        self.qmat = q["mat"]
        self.probe_mask = ray.get(probe_ref)  # (nq, K) bool
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
        if len(batch) == 0 or self.qmat.size == 0:
            return empty
        mat = _normalize(_batch_matrix(batch, "embedding"))
        ids = batch.column("vec_id").to_numpy()
        cent = batch.column("_centroid").to_numpy().astype(np.int64)
        scores = self.qmat @ mat.T  # (nq, nbatch) — one matmul, all queries
        allowed = self.probe_mask[:, cent]  # (nq, nbatch)
        out_q: List[int] = []
        out_v: List[np.ndarray] = []
        out_s: List[np.ndarray] = []
        for qi in range(scores.shape[0]):
            sel = np.flatnonzero(allowed[qi])
            if len(sel) == 0:
                continue
            row = scores[qi, sel]
            if len(row) > self.k:
                kth = np.partition(row, len(row) - self.k)[len(row) - self.k]
                top = np.flatnonzero(row >= kth)
            else:
                top = np.arange(len(row))
            out_q.extend([int(self.qids[qi])] * len(top))
            out_v.append(ids[sel[top]])
            out_s.append(row[top])
        if not out_q:
            return empty
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def knn_cosine_ivf(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
    kmeans_iters: int = 2,
    layout_dir: Optional[str] = None,
    layout_fingerprint: str = "",
) -> "ray.data.Dataset":
    """Approximate top-k via IVF: hash-sampled + Lloyd-refined centroids,
    rows bucketed to their nearest centroid, queries probing only their
    ``nprobe`` nearest buckets.

    With ``layout_dir`` the centroid-partitioned layout is written once
    (see :func:`build_ivf_layout`) and this call READS ONLY the probed
    partitions — IO proportional to nprobe/num_centroids of the corpus.
    Without it, assignment happens in-plan and non-probed rows are dropped
    before any scoring arithmetic (full scan, reduced compute) — the
    testing / ad-hoc path. Recall measured against :func:`knn_cosine`."""
    qids, qmat = load_queries(ds, query_ids)
    qn = _normalize(qmat)

    if layout_dir is not None:
        cents = build_ivf_layout(
            ds, layout_dir, num_centroids, kmeans_iters, layout_fingerprint
        )
    else:
        cents = ivf_centroids(ds, num_centroids, kmeans_iters)

    qc = qn @ cents.T  # (nq, K)
    nprobe = min(nprobe, cents.shape[0])
    probe_mask = np.zeros((len(qids), cents.shape[0]), dtype=bool)
    for i in range(len(qids)):
        probe_mask[i, np.argsort(-qc[i])[:nprobe]] = True
    probed_union = np.flatnonzero(probe_mask.any(axis=0))

    queries_ref = ray.put({"qids": qids, "mat": qn})
    probe_ref = ray.put(probe_mask)

    if layout_dir is not None:
        import glob
        import os

        files = [
            f
            for c in probed_union
            for f in sorted(
                glob.glob(os.path.join(layout_dir, f"centroid={c}", "*.parquet"))
            )
        ]
        source = ray.data.read_parquet(files) if files else None
    else:
        cents_ref = ray.put(cents)
        union_ref = ray.put(probed_union)

        def assign_filter(batch: pa.Table) -> pa.Table:
            c = ray.get(cents_ref)
            keep_set = ray.get(union_ref)
            mat = _normalize(_batch_matrix(batch, "embedding"))
            if len(batch) == 0:
                return batch.append_column("_centroid", pa.array([], pa.int32()))
            bucket = (mat @ c.T).argmax(axis=1).astype(np.int32)
            out = batch.append_column("_centroid", pa.array(bucket))
            return out.filter(pa.array(np.isin(bucket, keep_set)))

        source = ds.select_columns(["vec_id", "embedding"]).map_batches(
            assign_filter, batch_format="pyarrow"
        )

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    if source is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "rank": pa.array([], pa.int32()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        )
    return (
        source.map_batches(
            _probe_score_batch,
            batch_format="pyarrow",
            fn_kwargs={
                "queries_ref": queries_ref,
                "probe_ref": probe_ref,
                "k": k + 1,
            },
        )
        .groupby("query_id")
        .map_groups(topk_no_self, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# Scalar-quantized scoring (Lucene99ScalarQuantizedVectorsFormat analogue)
# ---------------------------------------------------------------------------


def sq_train(ds: "ray.data.Dataset", confidence: Optional[float] = None,
             sample: int = 512) -> Tuple[float, float]:
    """Train the scalar quantizer: clip bounds are the confidence-interval
    quantiles of the NORMALIZED component distribution over a deterministic
    sample — the reference's ``ScalarQuantizer.fromVectors`` with default
    confidence ``1 - 1/(dim+1)`` (Lucene99ScalarQuantizedVectorsFormat).

    Returns ``(lo, hi)``."""
    mat = _normalize(_sample_rows(ds, sample))
    if confidence is None:
        dim = mat.shape[1] if mat.ndim == 2 and mat.shape[1] else 1
        confidence = 1.0 - 1.0 / (dim + 1)
    tail = (1.0 - confidence) / 2.0
    flat = mat.ravel()
    lo = float(np.quantile(flat, tail))
    hi = float(np.quantile(flat, 1.0 - tail))
    if hi <= lo:  # degenerate (constant components)
        lo, hi = lo - 1e-6, lo + 1e-6
    return lo, hi


def _sq_codes(mat: np.ndarray, lo: float, hi: float
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize rows to 7-bit codes (0..127, stored uint8) + per-row code
    sums (the corrective term). x ≈ lo + Δ·c with Δ = (hi-lo)/127."""
    delta = (hi - lo) / 127.0
    c = np.clip(np.rint((np.clip(mat, lo, hi) - lo) / delta), 0, 127)
    codes = c.astype(np.uint8)
    return codes, codes.astype(np.int64).sum(axis=1)


def _sq_score_batch(batch: pa.Table, queries_ref, k: int) -> pa.Table:
    """Int8-space approximate scoring + exact rescore of the local
    oversampled candidates. dot(x̂, ŷ) = d·lo² + lo·Δ·(Σcx + Σcy) + Δ²·(cx·cy)
    — the integer matmul is the hot kernel, exactly like the reference's
    int8 dot with corrective offsets; only ~k' exact float dots per query
    survive to rescoring."""
    q = ray.get(queries_ref)
    qn, qcodes, qsums = q["mat"], q["codes"], q["sums"]
    lo, hi, kprime = q["lo"], q["hi"], k
    delta = (hi - lo) / 127.0
    mat = _normalize(_batch_matrix(batch, "embedding"))
    ids = batch.column("vec_id").to_numpy()
    if len(ids) == 0 or qn.size == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    codes, sums = _sq_codes(mat, lo, hi)
    d = mat.shape[1]
    idot = qcodes.astype(np.int32) @ codes.astype(np.int32).T  # (nq, n)
    approx = (
        d * lo * lo
        + lo * delta * (qsums[:, None] + sums[None, :])
        + delta * delta * idot
    )
    kprime = min(kprime, approx.shape[1])
    out_q, out_v, out_s = [], [], []
    for qi in range(approx.shape[0]):
        idx = np.argpartition(approx[qi], -kprime)[-kprime:]
        exact = mat[idx] @ qn[qi]
        out_q.extend([int(q["qids"][qi])] * len(idx))
        out_v.append(ids[idx])
        out_s.append(exact)
    return pa.table(
        {
            "query_id": pa.array(out_q, pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
            "cosine": pa.array(np.concatenate(out_s)),
        }
    )


def knn_cosine_sq(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    k: int = 10,
    oversample: int = 4,
    confidence: Optional[float] = None,
) -> "ray.data.Dataset":
    """Approximate top-k via scalar-quantized (7-bit) scoring with exact
    rescoring of each block's ``k * oversample`` candidates — the
    pre-selection is integer arithmetic (4× smaller working set at scale,
    int matmul kernel), only the shortlisted rows pay a float dot.
    Approximate: candidate membership can miss at quantization boundaries;
    recall is pytest-gated against :func:`knn_cosine`."""
    qids, qmat = load_queries(ds, query_ids)
    qn = _normalize(qmat)
    lo, hi = sq_train(ds, confidence)
    qcodes, qsums = _sq_codes(qn, lo, hi)
    queries_ref = ray.put(
        {"qids": qids, "mat": qn, "codes": qcodes, "sums": qsums,
         "lo": lo, "hi": hi}
    )
    partial = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _sq_score_batch,
        batch_format="pyarrow",
        fn_kwargs={"queries_ref": queries_ref, "k": k * oversample + 1},
    )

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    return partial.groupby("query_id").map_groups(
        topk_no_self, batch_format="pyarrow"
    )


def cosine_pairs_ivf(
    ds: "ray.data.Dataset",
    threshold: float = 0.45,
    num_centroids: int = 16,
    n_probe: int = 2,
    kmeans_iters: int = 2,
) -> "ray.data.Dataset":
    """APPROXIMATE embedding near-dup pairs via IVF blocking — the
    web-scale path :func:`cosine_pairs` documents: instead of the exact
    O(N^2 / rows_per_block) block-pair exchange, each row is assigned to
    its ``n_probe`` nearest spherical-kmeans centroids, one groupby
    co-locates each centroid bucket, and an exact matmul scores pairs
    INSIDE buckets only. A pair is found iff the two rows share a probed
    centroid (the standard IVF recall model — near-identical vectors
    land on the same centroid with overwhelming probability; multi-probe
    covers boundary cases). Compute is O(sum of bucket^2) and per-group
    memory is the bucket share — at 100 TB, pick num_centroids ∝ N so
    buckets stay ~constant. Duplicate discovery across shared probes is
    deduped IN-PLAN: a pair is emitted only by the smallest centroid the
    two rows' probe sets share (no second shuffle). Cosines match the
    exact operator bit-for-bit on the pairs it finds."""
    cents = ivf_centroids(ds, num_centroids, kmeans_iters)
    kc = cents.shape[0]
    n_probe = max(1, min(int(n_probe), kc))
    cents_ref = ray.put(np.ascontiguousarray(cents))

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "embedding": batch.column("embedding")[:0]
                    if "embedding" in batch.schema.names
                    else pa.array([], pa.list_(pa.float32())),
                    "_cent": pa.array([], pa.int32()),
                    "_probes": pa.array([], pa.binary()),
                }
            )
        mat = _normalize(_batch_matrix(batch, "embedding"))
        sims = mat @ ray.get(cents_ref).T
        # top-n_probe centroids per row, SORTED ascending (deterministic
        # min-shared dedupe key); argpartition then order by centroid id
        part = np.argpartition(-sims, n_probe - 1, axis=1)[:, :n_probe]
        probes = np.sort(part.astype(np.int32), axis=1)
        n = len(batch)
        reps = np.repeat(np.arange(n, dtype=np.int64), n_probe)
        wide = batch.select(["vec_id", "embedding"]).take(pa.array(reps))
        pblob = np.ascontiguousarray(probes, dtype="<i4").tobytes()
        row_sz = 4 * n_probe
        probe_col = pa.array(
            [
                pblob[i * row_sz:(i + 1) * row_sz]
                for i in range(n)
                for _ in range(n_probe)
            ],
            pa.binary(),
        )
        return wide.append_column(
            "_cent", pa.array(probes.reshape(-1))
        ).append_column("_probes", probe_col)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if len(group) < 2:
            return _PAIRS_OUT_SCHEMA.empty_table()
        cent = int(group.column("_cent")[0].as_py())
        ids = group.column("vec_id").to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        mat = _normalize(_batch_matrix(group, "embedding"))[order]
        probes = np.frombuffer(
            b"".join(group.column("_probes").to_pylist()), dtype="<i4"
        ).reshape(len(group), -1)[order]
        s = mat @ mat.T
        ai, bi = np.nonzero(np.triu(s >= threshold, k=1))
        if len(ai) == 0:
            return _PAIRS_OUT_SCHEMA.empty_table()
        # min shared probe per pair == this centroid -> emit exactly once
        A = probes[ai][:, :, None]
        B = probes[bi][:, None, :]
        eq = A == B
        shared = np.where(eq, A, np.iinfo(np.int32).max)
        min_shared = shared.min(axis=(1, 2))
        keep = min_shared == cent
        if not keep.any():
            return _PAIRS_OUT_SCHEMA.empty_table()
        ai, bi = ai[keep], bi[keep]
        return pa.table(
            {
                "vec_a": pa.array(ids[ai].astype(np.int64)),
                "vec_b": pa.array(ids[bi].astype(np.int64)),
                "cosine": pa.array(round_half_away(s[ai, bi], 6)),
            },
            schema=_PAIRS_OUT_SCHEMA,
        )

    return (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("_cent")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
