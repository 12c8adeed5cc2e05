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
from ..util import pool_concurrency


def _batch_matrix(batch: pa.Table, col: str) -> np.ndarray:
    """list<float> column -> (n, dim) float64 matrix, zero-copy-ish."""
    arr = batch.column(col)
    if arr.num_chunks == 1:
        la = arr.chunk(0)
    else:
        la = arr.combine_chunks()
    flat = la.values.to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(la)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


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
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query vec_id.

    -> Dataset(query_id, rank, vec_id, cosine) — self-matches excluded.
    """
    qids, qmat = load_queries(ds, query_ids)
    queries_ref = ray.put({"qids": qids, "mat": _normalize(qmat)})
    partial = ds.select_columns(["vec_id", "embedding"]).map_batches(
        _TopKScoreStage,
        fn_constructor_args=(queries_ref, k + 1),  # +1 to survive self-match
        batch_format="pyarrow",
        concurrency=pool_concurrency(),
    )

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    return partial.groupby("query_id").map_groups(
        topk_no_self, batch_format="pyarrow"
    )


class _PairStage:
    """All (ref_block, batch) cosine pairs >= threshold; the full matrix is
    broadcast once (fine up to ~10M rows x small dim; beyond that use
    :func:`knn_cosine_ivf`-style bucketing)."""

    def __init__(self, mat_ref, threshold: float):
        d = ray.get(mat_ref)
        self.ids = d["ids"]
        self.mat = d["mat"]
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, "embedding"))
        ids = batch.column("vec_id").to_numpy()
        out_a, out_b, out_c = [], [], []
        if len(ids):
            scores = mat @ self.mat.T  # (nbatch, N)
            bi, ri = np.nonzero(scores >= self.threshold)
            for b, r in zip(bi, ri):
                a_id, b_id = int(ids[b]), int(self.ids[r])
                if a_id < b_id:  # dedupe + drop self
                    out_a.append(a_id)
                    out_b.append(b_id)
                    out_c.append(float(round_half_away(scores[b, r], 6)))
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
                "cosine": pa.array(out_c, pa.float64()),
            }
        )


def cosine_pairs(
    ds: "ray.data.Dataset", threshold: float = 0.45
) -> "ray.data.Dataset":
    """All embedding pairs with cosine >= threshold (near-dup by embedding)."""
    rows = ds.select_columns(["vec_id", "embedding"]).take_all()
    ids = np.asarray([r["vec_id"] for r in rows], dtype=np.int64)
    mat = _normalize(np.asarray([r["embedding"] for r in rows], dtype=np.float64))
    order = np.argsort(ids)
    mat_ref = ray.put({"ids": ids[order], "mat": mat[order]})
    return ds.select_columns(["vec_id", "embedding"]).map_batches(
        _PairStage,
        fn_constructor_args=(mat_ref, threshold),
        batch_format="pyarrow",
        concurrency=4,
    )


# ---------------------------------------------------------------------------
# IVF (scale path)
# ---------------------------------------------------------------------------


def knn_cosine_ivf(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    k: int = 10,
    num_centroids: int = 16,
    nprobe: int = 4,
) -> "ray.data.Dataset":
    """Approximate top-k: rows bucketed by nearest of ``num_centroids``
    fixed-seed sampled centroids; queries probe the ``nprobe`` nearest
    buckets only. One groupby shuffle builds the buckets; at 10^12 rows the
    bucketed layout would be written once and reused across query batches."""
    qids, qmat = load_queries(ds, query_ids)
    qn = _normalize(qmat)

    # deterministic centroid sample: first num_centroids rows by vec_id
    cand = ds.select_columns(["vec_id", "embedding"]).sort("vec_id").limit(
        num_centroids
    ).take_all()
    cents = _normalize(np.asarray([r["embedding"] for r in cand], dtype=np.float64))
    cents_ref = ray.put(cents)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cents_ref)
        mat = _normalize(_batch_matrix(batch, "embedding"))
        bucket = (
            (mat @ c.T).argmax(axis=1).astype(np.int32)
            if len(batch)
            else np.empty(0, np.int32)
        )
        return batch.append_column("_centroid", pa.array(bucket))

    bucketed = ds.select_columns(["vec_id", "embedding"]).map_batches(
        assign, batch_format="pyarrow"
    )
    # per-query probe set
    probes = {
        int(q): set(np.argsort(-(qn[i] @ cents.T))[:nprobe].tolist())
        for i, q in enumerate(qids)
    }
    probes_ref = ray.put(probes)
    queries_ref = ray.put({"qids": qids, "mat": qn})

    class ProbeStage(_TopKScoreStage):
        def __init__(self):
            super().__init__(queries_ref, k + 1)
            self.probes = ray.get(probes_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            cent = batch.column("_centroid").to_numpy()
            outs = []
            for qi, qid in enumerate(self.qids):
                mask = np.isin(cent, np.asarray(sorted(self.probes[int(qid)])))
                sub = batch.filter(pa.array(mask))
                one = _TopKScoreStage.__call__(
                    _SingleQueryView(self, qi), sub
                )
                outs.append(one)
            return pa.concat_tables(outs) if outs else _TopKScoreStage.__call__(self, batch.slice(0, 0))

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    return (
        bucketed.map_batches(ProbeStage, batch_format="pyarrow", concurrency=4)
        .groupby("query_id")
        .map_groups(topk_no_self, batch_format="pyarrow")
    )


class _SingleQueryView:
    """View of a _TopKScoreStage restricted to one query row."""

    def __init__(self, stage: _TopKScoreStage, qi: int):
        self.qids = stage.qids[qi : qi + 1]
        self.qmat = stage.qmat[qi : qi + 1]
        self.k = stage.k
