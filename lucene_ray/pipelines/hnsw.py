"""HNSW graph ANN over an embedding column, per-partition like the
reference's per-segment graphs.

Reference analogues: ``Lucene99HnswVectorsWriter`` /
``HnswGraphBuilder`` (codecs/lucene99/, util/hnsw/HnswGraphBuilder.java) —
Lucene builds one HNSW graph PER SEGMENT and ``KnnFloatVectorQuery``
(search/KnnFloatVectorQuery.java) searches every segment's graph and
merges per-leaf top-k. Algorithm: Malkov & Yashunin 2016 (public paper),
with Lucene's parameter conventions (M neighbors per node above level 0,
2M at level 0, efConstruction beam during build).

Ray-Data mapping (the same decomposition as the rest of the engine):

* build — rows are hash-partitioned; ONE ``groupby`` co-locates each
  partition and a vectorized builder constructs that partition's graph
  (greedy multi-level insert; neighbor distance evaluations are batched
  matmuls, not per-edge Python); each graph is serialized to one ``.npz``
  under the layout dir (write-once, resumable by fingerprint).
* search — queries are broadcast once; each partition's graph is searched
  independently (beam ``ef`` at level 0) and a final tiny groupby merges
  per-partition top-k, exactly TopDocs.merge over per-segment results.

Determinism: node levels derive from a fixed multiplicative hash of
vec_id, insertion order is ascending vec_id — rebuilds are byte-stable.
Recall is measured against the brute-force oracle in tests (same contract
as :func:`knn_cosine_ivf`).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


from .knn import _batch_matrix, _final_topk, _normalize, load_queries

_GOLD = np.uint64(0x9E3779B97F4A7C15)

HNSW_META = "hnsw_meta.json"
# bumped when the construction algorithm changes shape — a cached layout
# from an older builder must rebuild, not resume (2 = bulk exact-candidate
# per-level build; 1 = sequential per-insert beam)
_BUILDER_VERSION = 2


def _levels_for(vec_ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic per-node levels: geometric-ish via a fixed hash
    (HnswGraphBuilder draws ~floor(-ln(U) / ln(M)); we derive U from the
    id hash so rebuilds are stable)."""
    h = (vec_ids.astype(np.uint64) * _GOLD) >> np.uint64(11)
    u = (h.astype(np.float64) + 1.0) / float(1 << 53)
    ml = 1.0 / np.log(max(m, 2))
    return np.floor(-np.log(u) * ml).astype(np.int32)


class _Graph:
    """One partition's in-memory HNSW graph (build + search)."""

    def __init__(self, mat: np.ndarray, vec_ids: np.ndarray, m: int,
                 ef_construction: int):
        self.mat = mat  # normalized float32 (n, dim)
        self.vec_ids = vec_ids
        self.m = m
        self.m0 = 2 * m
        self.efc = ef_construction
        n = len(mat)
        self.levels = _levels_for(vec_ids, m)
        self.max_level = int(self.levels.max()) if n else 0
        # neighbors[level][node] -> int32 array
        self.neighbors: List[List[Optional[np.ndarray]]] = [
            [None] * n for _ in range(self.max_level + 1)
        ]
        self.entry = -1

    # -- search helpers ---------------------------------------------------
    def _greedy_level(self, q: np.ndarray, start: int, level: int) -> int:
        """Greedy descent at one level: move to the best neighbor until no
        improvement (the upper-level zoom phase)."""
        cur = start
        cur_sim = float(self.mat[cur] @ q)
        improved = True
        while improved:
            improved = False
            nbrs = self.neighbors[level][cur]
            if nbrs is None or len(nbrs) == 0:
                break
            sims = self.mat[nbrs] @ q  # one matvec for all neighbors
            j = int(np.argmax(sims))
            if float(sims[j]) > cur_sim:
                cur = int(nbrs[j])
                cur_sim = float(sims[j])
                improved = True
        return cur

    def _beam(self, q: np.ndarray, start: int, ef: int, level: int
              ) -> Tuple[np.ndarray, np.ndarray]:
        """ef-beam search at one level -> (node ids, sims), best-first."""
        visited = {start}
        start_sim = float(self.mat[start] @ q)
        # candidates: max-heap by sim (negate); results: sorted list capped ef
        import heapq

        cand = [(-start_sim, start)]
        res = [(start_sim, start)]
        worst = start_sim
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < worst and len(res) >= ef:
                break
            nbrs = self.neighbors[level][c]
            if nbrs is None or len(nbrs) == 0:
                continue
            new = [int(x) for x in nbrs if int(x) not in visited]
            if not new:
                continue
            visited.update(new)
            sims = self.mat[new] @ q  # batched distance eval
            for x, s in zip(new, sims.tolist()):
                if len(res) < ef or s > worst:
                    heapq.heappush(cand, (-s, x))
                    res.append((s, x))
                    if len(res) > ef:
                        res.sort(key=lambda t: -t[0])
                        res = res[:ef]
                    worst = min(r[0] for r in res)
        res.sort(key=lambda t: -t[0])
        ids = np.asarray([r[1] for r in res], dtype=np.int64)
        sims = np.asarray([r[0] for r in res], dtype=np.float64)
        return ids, sims

    # -- build ------------------------------------------------------------
    def _select(self, base: int, cand_ids: np.ndarray,
                cand_sims: np.ndarray, mmax: int) -> np.ndarray:
        """Diversity neighbor selection (HnswGraphBuilder
        .selectAndLinkDiverse / Malkov Algorithm 4 heuristic,
        util/hnsw/HnswGraphBuilder.java diversityCheck): walk candidates
        best-first and keep one only if it is closer to ``base`` than to
        every already-selected neighbor (sim(c, base) > max sim(c, sel)) —
        redundant near-duplicates of a selected neighbor are skipped, which
        keeps long-range edges and raises recall on clustered data. May
        select fewer than ``mmax`` (keepPrunedConnections=false)."""
        order = np.argsort(-cand_sims, kind="stable")
        sel: List[int] = []
        mat = self.mat
        for oi in order.tolist():
            cid = int(cand_ids[oi])
            if cid == base:
                continue
            if sel and float(np.max(mat[sel] @ mat[cid])) > float(
                cand_sims[oi]
            ):
                continue
            sel.append(cid)
            if len(sel) == mmax:
                break
        return np.asarray(sel, dtype=np.int32)

    def _link(self, node: int, nbrs: np.ndarray, level: int) -> None:
        mmax = self.m0 if level == 0 else self.m
        self.neighbors[level][node] = nbrs.astype(np.int32)
        for nb in nbrs.tolist():
            ex = self.neighbors[level][nb]
            merged = (
                np.asarray([node], dtype=np.int32)
                if ex is None
                else np.concatenate([ex, np.asarray([node], np.int32)])
            )
            if len(merged) > mmax:
                # overflow prune re-runs the same diversity heuristic from
                # the overfull node's perspective (the reference's
                # OnHeapHnswGraph neighbor-overflow path)
                sims = self.mat[merged] @ self.mat[nb]
                merged = self._select(nb, merged, sims, mmax)
            self.neighbors[level][nb] = merged

    def build(self) -> None:
        """Bulk construction (round 3): instead of the sequential
        per-insert beam (the round-2 hot loop, ~4 ms/vector of Python
        heap/set work), every level's candidate lists come from EXACT
        chunked matmuls over that level's member set — pure BLAS — and
        the diversity heuristic then selects edges from strictly better
        candidates than a beam would surface. Two passes per level keep
        the insert semantics: out-edges from each node's own selection,
        then reverse edges merged in with the same overflow prune. The
        hierarchy provides cluster bridging exactly as in per-insert
        HNSW (upper levels are 1/M^lev sparse, so their exact top-efc
        spans clusters). Search, serialization and recall gates are
        unchanged; cost is O(k^2 . dim) flops per level member set k —
        the per-partition size cap (partition count) is the documented
        lever, same as the reference's per-segment graph sizes."""
        n = len(self.mat)
        if n == 0:
            return
        # entry = first node at the max level (ascending-id insert order)
        self.entry = int(np.nonzero(self.levels == self.max_level)[0][0])
        for lev in range(self.max_level, -1, -1):
            members = np.nonzero(self.levels >= lev)[0]
            k = len(members)
            if k == 1:
                self.neighbors[lev][int(members[0])] = np.empty(0, np.int32)
                continue
            mm = self.mat[members]
            mmax = self.m0 if lev == 0 else self.m
            msel = min(self.m, mmax)
            ncand = min(self.efc, k - 1)
            sel: Dict[int, np.ndarray] = {}
            # ~16 MB of float32 sims per chunk
            chunk = max(1, (1 << 22) // k)
            for s in range(0, k, chunk):
                e = min(k, s + chunk)
                sims = mm[s:e] @ mm.T  # (c, k) exact cosines
                rows = np.arange(e - s)
                sims[rows, np.arange(s, e)] = -np.inf  # mask self
                if ncand < k - 1:
                    idx = np.argpartition(-sims, ncand, axis=1)[:, :ncand]
                else:
                    idx = np.argsort(-sims, axis=1, kind="stable")[:, :ncand]
                for r in range(e - s):
                    node = int(members[s + r])
                    cand = idx[r]
                    sel[node] = self._select(
                        node, members[cand], sims[r, cand], msel
                    )
            # reverse edges + one overflow prune per node
            rev: Dict[int, List[int]] = {}
            for u, nbrs in sel.items():
                for v in nbrs.tolist():
                    rev.setdefault(v, []).append(u)
            for node_np in members:
                node = int(node_np)
                extra = rev.get(node)
                own = sel[node]
                if extra:
                    merged = np.unique(
                        np.concatenate(
                            [own, np.asarray(extra, dtype=np.int32)]
                        )
                    ).astype(np.int32)
                else:
                    merged = own
                if len(merged) > mmax:
                    sims_m = self.mat[merged] @ self.mat[node]
                    merged = self._select(node, merged, sims_m, mmax)
                self.neighbors[lev][node] = merged

    def search(self, q: np.ndarray, k: int, ef: int,
               allowed: "np.ndarray | None" = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        if self.entry < 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        if allowed is not None:
            return self._search_filtered(q, k, ef, allowed)
        cur = self.entry
        for lev in range(int(self.levels[self.entry]), 0, -1):
            cur = self._greedy_level(q, cur, lev)
        ids, sims = self._beam(q, cur, max(ef, k), 0)
        return self.vec_ids[ids[:k]], sims[:k]

    def _search_filtered(self, q: np.ndarray, k: int, ef: int,
                         allowed: np.ndarray
                         ) -> Tuple[np.ndarray, np.ndarray]:
        """Filtered graph search, KnnFloatVectorQuery semantics: traverse
        the full graph but only COLLECT nodes the filter admits, with a
        visit budget equal to the filter cardinality; if the budget is
        exhausted (or the filter is tiny) fall back to an exact scan over
        the filtered rows — exactly the reference's
        AbstractKnnVectorQuery.approximateSearch → exactSearch fallback."""
        n_allowed = int(allowed.sum())
        if n_allowed == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
        ef = max(ef, k)
        if n_allowed <= ef:
            return self._exact_allowed(q, k, allowed)
        cur = self.entry
        for lev in range(int(self.levels[self.entry]), 0, -1):
            cur = self._greedy_level(q, cur, lev)
        out = self._beam_filtered(q, cur, ef, allowed, visit_limit=n_allowed)
        if out is None or len(out[0]) < min(k, n_allowed):
            return self._exact_allowed(q, k, allowed)
        ids, sims = out
        return self.vec_ids[ids[:k]], sims[:k]

    def _exact_allowed(self, q: np.ndarray, k: int, allowed: np.ndarray
                       ) -> Tuple[np.ndarray, np.ndarray]:
        idx = np.nonzero(allowed)[0]
        sims = self.mat[idx] @ q
        order = np.lexsort((self.vec_ids[idx], -sims))[:k]
        return self.vec_ids[idx[order]], sims[order].astype(np.float64)

    def _beam_filtered(self, q: np.ndarray, start: int, ef: int,
                       allowed: np.ndarray, visit_limit: int
                       ) -> "Tuple[np.ndarray, np.ndarray] | None":
        """Level-0 beam that admits only filter-allowed nodes into the
        result set (all nodes remain traversable). Returns None when more
        than ``visit_limit`` nodes were visited — caller switches to the
        exact scan."""
        import heapq

        visited = {start}
        nvisited = 1
        s0 = float(self.mat[start] @ q)
        cand = [(-s0, start)]
        res = [(s0, start)] if allowed[start] else []
        worst = res[0][0] if res else -np.inf
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < worst and len(res) >= ef:
                break
            nbrs = self.neighbors[0][c]
            if nbrs is None or len(nbrs) == 0:
                continue
            new = [int(x) for x in nbrs if int(x) not in visited]
            if not new:
                continue
            visited.update(new)
            nvisited += len(new)
            if nvisited > visit_limit:
                return None
            sims = self.mat[new] @ q
            for x, s in zip(new, sims.tolist()):
                if len(res) < ef or s > worst:
                    heapq.heappush(cand, (-s, x))
                    if allowed[x]:
                        res.append((s, x))
                        if len(res) > ef:
                            res.sort(key=lambda t: -t[0])
                            res = res[:ef]
                        if len(res) >= ef:
                            worst = min(r[0] for r in res)
        res.sort(key=lambda t: -t[0])
        ids = np.asarray([r[1] for r in res], dtype=np.int64)
        sims = np.asarray([r[0] for r in res], dtype=np.float64)
        return ids, sims

    # -- serialization ----------------------------------------------------
    def save(self, path: str) -> None:
        flat, offs, levs = [], [0], []
        for lev in range(self.max_level + 1):
            for node in range(len(self.mat)):
                nb = self.neighbors[lev][node]
                if nb is not None:
                    flat.append(nb)
                    levs.append((lev, node, len(nb)))
                    continue
        data = {
            "mat": self.mat,
            "vec_ids": self.vec_ids,
            "levels": self.levels,
            "entry": np.asarray([self.entry], np.int64),
            "meta": np.asarray([self.m, self.efc, self.max_level], np.int64),
            "edge_index": np.asarray(
                [(l, n) for l, n, _ in levs], np.int64
            ).reshape(-1, 2),
            "edge_counts": np.asarray([c for _, _, c in levs], np.int64),
            "edges": (
                np.concatenate(flat) if flat else np.empty(0, np.int32)
            ),
        }
        tmp = path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez_compressed(f, **data)
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "_Graph":
        z = np.load(path)
        m, efc, max_level = (int(x) for x in z["meta"])
        g = cls.__new__(cls)
        g.mat = z["mat"]
        g.vec_ids = z["vec_ids"]
        g.levels = z["levels"]
        g.m, g.m0, g.efc = m, 2 * m, efc
        g.max_level = max_level
        g.entry = int(z["entry"][0])
        n = len(g.mat)
        g.neighbors = [[None] * n for _ in range(max_level + 1)]
        edges = z["edges"]
        counts = z["edge_counts"]
        index = z["edge_index"]
        pos = 0
        for (lev, node), c in zip(index.tolist(), counts.tolist()):
            g.neighbors[lev][node] = edges[pos : pos + int(c)]
            pos += int(c)
        return g


def build_hnsw_layout(
    ds: "ray.data.Dataset",
    out_dir: str,
    m: int = 16,
    ef_construction: int = 100,
    num_partitions: int = 8,
    fingerprint: str = "",
) -> dict:
    """Write one HNSW graph per hash partition (the per-segment graphs of
    the reference). Each partition's build runs inside the ONE groupby that
    co-locates its rows; graphs land as ``part-N.npz`` with an atomic
    rename. A matching fingerprint short-circuits (resume discipline).
    Partition count bounds per-task memory: rows/partition ~ corpus/P."""
    meta_path = os.path.join(out_dir, HNSW_META)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        if (meta.get("fingerprint") == fingerprint
                and meta.get("builder") == _BUILDER_VERSION):
            return meta

    os.makedirs(out_dir, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy()
        part = (
            (ids.astype(np.uint64) * _GOLD) % np.uint64(num_partitions)
        ).astype(np.int32)
        return batch.append_column("_hpart", pa.array(part))

    def build_part(group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return pa.table({"part": pa.array([], pa.int32()),
                             "n": pa.array([], pa.int64())})
        part = int(group.column("_hpart")[0].as_py())
        order = pc.sort_indices(group.column("vec_id"))
        group = group.take(order)  # ascending vec_id == stable insert order
        mat = _normalize(_batch_matrix(group, "embedding")).astype(np.float32)
        ids = group.column("vec_id").to_numpy().astype(np.int64)
        g = _Graph(mat, ids, m, ef_construction)
        g.build()
        g.save(os.path.join(out_dir, f"part-{part:03d}.npz"))
        return pa.table(
            {"part": pa.array([part], pa.int32()),
             "n": pa.array([len(ids)], pa.int64())}
        )

    parts = (
        ds.select_columns(["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("_hpart")
        .map_groups(build_part, batch_format="pyarrow")
        .take_all()
    )
    meta = {
        "fingerprint": fingerprint,
        "builder": _BUILDER_VERSION,
        "m": m,
        "ef_construction": ef_construction,
        "num_partitions": num_partitions,
        "parts": sorted(
            ({"part": int(r["part"]), "n": int(r["n"])} for r in parts),
            key=lambda r: r["part"],
        ),
    }
    tmp = meta_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, meta_path)
    return meta


class _HnswSearchStage:
    """Actor stage: loads ONE partition graph per __call__ batch row set —
    the graph load is the expensive init, so this runs as an actor pool
    keyed on partition paths passed through the batch."""

    def __init__(self, layout_dir: str, queries_ref, k: int, ef: int):
        self.layout_dir = layout_dir
        q = ray.get(queries_ref)
        self.qids = q["qids"]
        self.qmat = q["mat"].astype(np.float32)
        self.k = k
        self.ef = ef
        self._cache = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        # optional per-partition filter payload: sorted int64 vec_ids packed
        # as binary, computed IN-PLAN by knn_cosine_hnsw (the per-segment
        # bitset analogue — each partition row carries only ITS matches,
        # bounded by partition size; nothing corpus-sized on the driver)
        allowed_col = (
            batch.column("allowed")
            if "allowed" in batch.column_names
            else None
        )
        out_q, out_v, out_s = [], [], []
        for i, part in enumerate(batch.column("part").to_pylist()):
            graph = self._cache.get(part)
            if graph is None:
                graph = self._cache[part] = _Graph.load(
                    os.path.join(self.layout_dir, f"part-{part:03d}.npz")
                )
            mask = None
            if allowed_col is not None:
                allowed = np.frombuffer(
                    allowed_col[i].as_py(), dtype=np.int64
                )
                mask = np.isin(graph.vec_ids, allowed)
            for qi in range(len(self.qids)):
                ids, sims = graph.search(
                    self.qmat[qi], self.k, self.ef, allowed=mask
                )
                out_q.extend([int(self.qids[qi])] * len(ids))
                out_v.append(ids)
                out_s.append(sims)
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_s)),
            }
        )


def knn_cosine_hnsw(
    ds: "ray.data.Dataset",
    query_ids: Sequence[int],
    k: int = 10,
    m: int = 16,
    ef_construction: int = 100,
    ef: int = 64,
    num_partitions: int = 8,
    layout_dir: str = "/tmp/lucene_ray_hnsw/default",
    layout_fingerprint: str = "",
    prefilter: "str | None" = None,
) -> "ray.data.Dataset":
    """Approximate top-k via per-partition HNSW graphs + per-leaf merge
    (KnnFloatVectorQuery over per-segment graphs). Exact cosines are
    recomputed by the graph itself (normalized dot products), so merged
    scores are comparable across partitions. Approximate: recall measured
    against :func:`knn_cosine` in tests.

    ``prefilter`` (a Ray Data filter expression, e.g. ``"label == 3"``)
    restricts candidates exactly like the filter query on Lucene's
    KnnFloatVectorQuery, and the allowed set is computed IN-PLAN: the
    filtered vec_ids are hash-assigned to their layout partition (same
    hash the build used) and grouped so each partition's search task
    receives exactly ITS allowed ids as a packed binary payload — the
    per-segment bitset analogue, bounded by partition size, never
    materialized on the driver. Each partition graph then searches with
    collection limited to allowed nodes + exact fallback when the visit
    budget (the filter cost) is exhausted."""
    qids, qmat = load_queries(ds, query_ids)
    meta = build_hnsw_layout(
        ds, layout_dir, m, ef_construction, num_partitions,
        fingerprint=layout_fingerprint,
    )
    queries_ref = ray.put({"qids": qids, "mat": _normalize(qmat)})
    n_parts = max(1, len(meta["parts"]))
    if prefilter is None:
        parts = ray.data.from_items(
            [{"part": p["part"]} for p in meta["parts"]],
            override_num_blocks=n_parts,
        )
    else:
        P = int(meta["num_partitions"])

        def assign(batch: pa.Table) -> pa.Table:
            ids = batch.column("vec_id").to_numpy()
            part = (
                (ids.astype(np.uint64) * _GOLD) % np.uint64(P)
            ).astype(np.int32)
            return batch.append_column("_hpart", pa.array(part))

        def pack(group: pa.Table) -> pa.Table:
            if len(group) == 0:
                return pa.table(
                    {
                        "part": pa.array([], pa.int32()),
                        "allowed": pa.array([], pa.binary()),
                    }
                )
            part = int(group.column("_hpart")[0].as_py())
            ids = np.sort(
                group.column("vec_id").to_numpy().astype(np.int64)
            )
            return pa.table(
                {
                    "part": pa.array([part], pa.int32()),
                    "allowed": pa.array([ids.tobytes()], pa.binary()),
                }
            )

        # partitions with zero filter matches are skipped entirely (a
        # filtered search there can return nothing)
        parts = (
            ds.filter(expr=prefilter)
            .select_columns(["vec_id"])
            .map_batches(assign, batch_format="pyarrow")
            .groupby("_hpart")
            .map_groups(pack, batch_format="pyarrow")
            .repartition(n_parts)
        )

    def topk_no_self(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        mask = pc.not_equal(group.column("vec_id"), qid)
        return _final_topk(group.filter(mask), k)

    return (
        parts.map_batches(
            _HnswSearchStage,
            fn_constructor_args=(layout_dir, queries_ref, k + 1, ef),
            batch_format="pyarrow",
            concurrency=(1, max(2, len(meta["parts"]))),
        )
        .groupby("query_id")
        .map_groups(topk_no_self, batch_format="pyarrow")
    )
