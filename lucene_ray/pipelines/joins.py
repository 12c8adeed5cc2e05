"""Join operators, Ray-Data-first.

Two shapes, matching the scale playbook:

* :func:`broadcast_join` — the small side goes into the object store ONCE
  (``ray.put``); every map task reads it zero-copy and joins per batch with
  a vectorized Arrow join. No shuffle. Use for dimension tables, vocab
  maps, blocklists.
* :func:`hash_join` — both sides large: each map task splits its batch by
  a deterministic crc32 key bucket and ships per-bucket Arrow-IPC packed
  slices; ONE ``groupby(bucket)`` co-locates both sides' slices and each
  group unpacks + joins vectorized. Bucket count bounds per-group memory;
  salt hot keys by widening ``num_buckets`` (same playbook as the
  heavy-term split).

Determinism: crc32 of the decimal key string — never Python ``hash``.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import crc32_array


def _key_bucket(arr: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
    """Deterministic key -> bucket. Integer keys take a vectorized
    multiplicative-hash path (no per-row Python); everything else hashes
    the decimal string with crc32. The bucket map only controls GROUPING
    — join results are invariant to it — but it must stay deterministic
    across processes (never Python ``hash``)."""
    if pa.types.is_integer(arr.type):
        v = arr.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (v * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(32)
        return (h % np.uint64(num_buckets)).astype(np.int32)
    vals = arr.to_numpy(zero_copy_only=False)
    return (crc32_array([str(v) for v in vals]) % num_buckets).astype(np.int32)


def broadcast_join(
    large: "ray.data.Dataset",
    small: pa.Table,
    key_large: str,
    key_small: str,
    small_cols: Optional[Sequence[str]] = None,
) -> "ray.data.Dataset":
    """Inner join ``large ⋈ small`` with the small side broadcast."""
    cols = list(small_cols or [c for c in small.schema.names if c != key_small])
    small_ref = ray.put(small.select([key_small] + cols))

    def join_batch(batch: pa.Table) -> pa.Table:
        # zero-copy plasma read per task — no actor pool needed for a
        # broadcast whose "setup" is one ray.get
        return batch.join(
            ray.get(small_ref), keys=key_large, right_keys=key_small,
            join_type="inner",
        )

    return large.map_batches(join_batch, batch_format="pyarrow")


def _ipc_pack(tbl: pa.Table) -> bytes:
    import io

    import pyarrow.ipc as ipc

    sink = io.BytesIO()
    with ipc.new_stream(sink, tbl.schema) as w:
        w.write_table(tbl)
    return sink.getvalue()


def _ipc_unpack(blob: bytes) -> pa.Table:
    import pyarrow.ipc as ipc

    return ipc.open_stream(blob).read_all()


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Partitioned hash join of two large Datasets (inner).

    Output columns = left columns + right columns minus ``key_right``.

    Block exchange: each map task splits its batch by key bucket and ships
    ONE row per (batch, bucket) whose payload is the bucket's sub-table in
    Arrow IPC bytes — both sides keep their own schema (no null-widened
    union doubling the shuffled bytes) and the all-to-all moves a few
    packed rows per task instead of every data row. The groupby co-locates
    each bucket's packed slices from both sides; the group fn unpacks,
    concatenates and joins vectorized. Bucket count bounds per-group
    memory; salt hot keys by widening ``num_buckets``.
    """

    def pack(side: str, key: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if n == 0:
                return pa.table(
                    {
                        "_jbucket": pa.array([], pa.int32()),
                        "_jside": pa.array([], pa.string()),
                        "_payload": pa.array([], pa.binary()),
                    }
                )
            b = _key_bucket(batch.column(key), num_buckets)
            order = np.argsort(b, kind="stable")
            sb = batch.take(pa.array(order))
            bs = b[order]
            bounds = np.flatnonzero(np.diff(bs)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [n]))
            out_b, out_p = [], []
            for lo, hi in zip(starts, ends):
                out_b.append(int(bs[lo]))
                out_p.append(_ipc_pack(sb.slice(lo, hi - lo)))
            return pa.table(
                {
                    "_jbucket": pa.array(out_b, pa.int32()),
                    "_jside": pa.array([side] * len(out_b), pa.string()),
                    "_payload": pa.array(out_p, pa.binary()),
                }
            )

        return fn

    lt = left.map_batches(pack("l", key_left), batch_format="pyarrow")
    rt = right.map_batches(pack("r", key_right), batch_format="pyarrow")

    def join_bucket(group: pa.Table) -> pa.Table:
        sides = group.column("_jside").to_pylist()
        payloads = group.column("_payload").to_pylist()
        l_parts = [_ipc_unpack(p) for s, p in zip(sides, payloads) if s == "l"]
        r_parts = [_ipc_unpack(p) for s, p in zip(sides, payloads) if s == "r"]
        if not l_parts or not r_parts:
            return None  # empty group contribution (map_groups drops None? no)
        lpart = pa.concat_tables(l_parts)
        rpart = pa.concat_tables(r_parts)
        return lpart.join(
            rpart, keys=key_left, right_keys=key_right, join_type="inner"
        )

    # an inner join over a bucket missing one side is empty — emit a
    # zero-row table with the joined schema so every group yields a block
    l_schema = left.schema()
    r_schema = right.schema()
    joined_fields = [
        (n, l_schema.types[l_schema.names.index(n)]) for n in l_schema.names
    ] + [
        (n, r_schema.types[r_schema.names.index(n)])
        for n in r_schema.names
        if n != key_right
    ]
    empty_schema = pa.schema(joined_fields)

    def join_bucket_safe(group: pa.Table) -> pa.Table:
        out = join_bucket(group)
        return empty_schema.empty_table() if out is None else out

    return lt.union(rt).groupby("_jbucket").map_groups(
        join_bucket_safe, batch_format="pyarrow"
    )


def join_query_topk(
    index_dir: str,
    from_query: str,
    docs_ds: "ray.data.Dataset",  # (doc_id, <from_col>, <to_col>)
    from_col: str,
    to_col: str,
    score_mode: str = "max",  # none | max | total | avg
    k: int = 10,
    id_col: str = "doc_id",
):
    """Query-time join — JoinUtil.createJoinQuery analogue (reference:
    join/src/java/org/apache/lucene/search/join/JoinUtil.java: run
    fromQuery, gather the fromField values of its hits with per-value
    aggregated scores per ScoreMode {None, Max, Total, Avg}, then match
    every doc whose toField holds one of those values, scored by the
    value's aggregate).

    Ray-Data-native shape: scored from-side candidates are broadcast
    (ints + floats); ONE ``map_batches`` pass over the metadata table
    pre-aggregates per-value (sum, count, max) partials before a tiny
    ``groupby(value)`` — the join-value table is small (distinct key
    values), so it broadcasts back via ``ray.put`` and the to-side match
    is a second shuffle-free ``map_batches`` with per-batch partial top-k.
    -> pyarrow.Table(rank, doc_id, score[unrounded float64]), <= k rows."""
    from ..functions.analysis import make_analyzer
    from ..functions.query import _exhaustive_candidates, parse_query
    from .search import get_reader

    reader = get_reader(index_dir)
    q = parse_query(from_query, make_analyzer(reader.analyzer_name))
    r = _exhaustive_candidates(reader, q)
    empty = pa.table(
        {
            "rank": pa.array([], pa.int32()),
            "doc_id": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
        }
    )
    if r is None or len(r[0]) == 0:
        return empty
    cand, acc, _ = r
    hits_ref = ray.put((np.asarray(cand, dtype=np.int64), acc.astype(np.float64)))

    def partial_values(batch: pa.Table) -> pa.Table:
        ids_sorted, scores = ray.get(hits_ref)
        ids = batch.column(id_col).to_numpy()
        pos = np.minimum(np.searchsorted(ids_sorted, ids), len(ids_sorted) - 1)
        m = ids_sorted[pos] == ids
        vals = batch.column(from_col).filter(pa.array(m)).cast(pa.string())
        s = pa.array(scores[pos[m]])
        g = (
            pa.table({"v": vals, "s": s})
            .group_by("v")
            .aggregate([("s", "sum"), ("s", "count"), ("s", "max")])
        )
        return pa.table(
            {
                "v": g.column("v"),
                "s_sum": g.column("s_sum"),
                "s_cnt": g.column("s_count").cast(pa.int64()),
                "s_max": g.column("s_max"),
            }
        )

    import ray.data as rd

    agg = (
        docs_ds.select_columns([id_col, from_col])
        .map_batches(partial_values, batch_format="pyarrow")
        .groupby("v")
        .aggregate(
            rd.aggregate.Sum("s_sum", alias_name="ssum"),
            rd.aggregate.Sum("s_cnt", alias_name="cnt"),
            rd.aggregate.Max("s_max", alias_name="smax"),
        )
        .take_all()  # one row per distinct join value: the small side
    )
    if not agg:
        return empty
    if score_mode == "none":
        vmap = {r0["v"]: 1.0 for r0 in agg}
    elif score_mode == "max":
        vmap = {r0["v"]: float(r0["smax"]) for r0 in agg}
    elif score_mode == "total":
        vmap = {r0["v"]: float(r0["ssum"]) for r0 in agg}
    elif score_mode == "avg":
        vmap = {r0["v"]: float(r0["ssum"]) / int(r0["cnt"]) for r0 in agg}
    else:
        raise ValueError(f"unknown score_mode {score_mode!r}")
    vmap_ref = ray.put(vmap)

    def partial_topk(batch: pa.Table) -> pa.Table:
        vm = ray.get(vmap_ref)
        vals = batch.column(to_col).cast(pa.string()).to_pylist()
        s = np.array([vm.get(v, np.nan) for v in vals], dtype=np.float64)
        m = ~np.isnan(s)
        d = batch.column(id_col).to_numpy()[m]
        s = s[m]
        if len(d) > k:
            kth = np.partition(s, len(s) - k)[len(s) - k]
            keep = s >= kth
            d, s = d[keep], s[keep]
        return pa.table({"doc_id": pa.array(d), "score": pa.array(s)})

    top = (
        docs_ds.select_columns([id_col, to_col])
        .map_batches(partial_topk, batch_format="pyarrow")
        .sort(["score", "doc_id"], descending=[True, False])
        .limit(k)
    )
    parts = [b for b in top.iter_batches(batch_format="pyarrow") if len(b)]
    if not parts:
        return empty
    t = pa.concat_tables(parts)
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(t) + 1, dtype=np.int32)),
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "score": t.column("score").cast(pa.float64()),
        }
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key: str = "user_id",
    ts: str = "ts",
    right_prefix: str = "r_",
    num_buckets: int = 64,
    right_order: Optional[str] = None,
) -> "ray.data.Dataset":
    """As-of join (inner): every LEFT row pairs with the LATEST RIGHT row
    of the same ``key`` whose ``ts`` <= the left row's ``ts``; left rows
    with no earlier right row are dropped. Ties on the right timestamp
    break to the largest ``right_order`` column value (pass a unique id
    for full determinism across block orders; default = arrival order,
    deterministic only within one block).

    The classic event-stream enrichment (DuckDB/kdb ASOF JOIN; Ray Data
    has no native equivalent) expressed with the same packed-IPC bucket
    exchange as :func:`hash_join`: shuffle bytes = payload once, per-group
    memory = the bucket's share of BOTH sides. Inside a bucket the right
    side is sorted once by (key, ts); each left row's match is one
    searchsorted into its key's slice — vectorized per key run.

    Output = left columns + right columns prefixed ``right_prefix``
    (the join key deduplicated).
    """

    def pack(side: str):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            if n == 0:
                return pa.table(
                    {
                        "_jbucket": pa.array([], pa.int32()),
                        "_jside": pa.array([], pa.string()),
                        "_payload": pa.array([], pa.binary()),
                    }
                )
            b = _key_bucket(batch.column(key), num_buckets)
            order = np.argsort(b, kind="stable")
            sb = batch.take(pa.array(order))
            bs = b[order]
            bounds = np.flatnonzero(np.diff(bs)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [n]))
            out_b, out_p = [], []
            for lo, hi in zip(starts, ends):
                out_b.append(int(bs[lo]))
                out_p.append(_ipc_pack(sb.slice(lo, hi - lo)))
            return pa.table(
                {
                    "_jbucket": pa.array(out_b, pa.int32()),
                    "_jside": pa.array([side] * len(out_b), pa.string()),
                    "_payload": pa.array(out_p, pa.binary()),
                }
            )

        return fn

    lt = left.map_batches(pack("l"), batch_format="pyarrow")
    rt = right.map_batches(pack("r"), batch_format="pyarrow")

    def ts_i64(col) -> np.ndarray:
        c = col
        if pa.types.is_timestamp(c.type):
            c = c.cast(pa.int64())
        return c.to_numpy(zero_copy_only=False).astype(np.int64)

    def join_bucket(group: pa.Table) -> pa.Table:
        sides = group.column("_jside").to_pylist()
        payloads = group.column("_payload").to_pylist()
        l_parts = [_ipc_unpack(p) for s, p in zip(sides, payloads) if s == "l"]
        r_parts = [_ipc_unpack(p) for s, p in zip(sides, payloads) if s == "r"]
        if not l_parts or not r_parts:
            return None
        lt_ = pa.concat_tables(l_parts)
        rt_ = pa.concat_tables(r_parts)
        lk = lt_.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        lt_ts = ts_i64(lt_.column(ts))
        rk = rt_.column(key).to_numpy(zero_copy_only=False).astype(np.int64)
        rt_ts = ts_i64(rt_.column(ts))
        # right sorted by (key, ts, tiebreak) — ties resolve to the LAST
        if right_order is not None:
            tb = rt_.column(right_order).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
        else:
            tb = np.arange(len(rk))
        r_order = np.lexsort((tb, rt_ts, rk))
        rk_s, rts_s = rk[r_order], rt_ts[r_order]
        # vectorized per-key searchsorted via one merged lexsort: right
        # rows sort before left rows at equal (key, ts), so the running
        # right-row count at each left row - 1 is the global index of its
        # latest same-or-earlier right row; it is a real match iff it
        # falls inside the left key's slice (>= lo)
        nl, nr = len(lk), len(rk_s)
        lo = np.searchsorted(rk_s, lk, side="left")
        all_keys = np.concatenate([rk_s, lk])
        all_ts = np.concatenate([rts_s, lt_ts])
        flag = np.concatenate(
            [np.zeros(nr, dtype=np.int8), np.ones(nl, dtype=np.int8)]
        )
        order = np.lexsort((flag, all_ts, all_keys))
        is_left = flag[order] == 1
        cum_right = np.cumsum(~is_left)
        left_orig = order[is_left] - nr
        pos = np.empty(nl, dtype=np.int64)
        pos[left_orig] = cum_right[is_left] - 1
        ok = pos >= lo
        if not ok.any():
            return None
        lsel = lt_.filter(pa.array(ok))
        rsel = rt_.take(pa.array(r_order[pos[ok]]))
        cols = {name: lsel.column(name) for name in lsel.column_names}
        for name in rsel.column_names:
            if name == key:
                continue
            cols[f"{right_prefix}{name}"] = rsel.column(name)
        return pa.table(cols)

    # joined schema computed driver-side once (parquet schemas are cheap);
    # only the plain pyarrow schema is captured by the group fn
    l_schema = left.schema().base_schema
    r_schema = right.schema().base_schema
    empty_cols = {n: pa.array([], l_schema.field(n).type) for n in l_schema.names}
    for n in r_schema.names:
        if n != key:
            empty_cols[f"{right_prefix}{n}"] = pa.array(
                [], r_schema.field(n).type
            )
    empty_tbl = pa.table(empty_cols)

    def join_bucket_safe(group: pa.Table) -> pa.Table:
        out = join_bucket(group)
        return out if out is not None else empty_tbl

    return (
        lt.union(rt)
        .groupby("_jbucket")
        .map_groups(join_bucket_safe, batch_format="pyarrow")
    )
