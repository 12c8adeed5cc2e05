"""Join operators, Ray-Data-first.

Two shapes, matching the scale playbook:

* :func:`broadcast_join` — the small side goes into the object store ONCE
  (``ray.put``); every map task reads it zero-copy and joins per batch with
  a vectorized Arrow join. No shuffle. Use for dimension tables, vocab
  maps, blocklists.
* :func:`hash_join` — both sides large: a deterministic crc32 bucket column
  is added to each side, the bucketed sides are unioned with a side tag,
  and ONE ``groupby(bucket)`` co-locates matching keys; each bucket group
  joins vectorized. Bucket count bounds per-group memory; salt hot keys by
  widening ``num_buckets`` (same playbook as the heavy-term split).

Determinism: crc32 of the decimal key string — never Python ``hash``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import crc32_array


def _key_bucket(arr: pa.ChunkedArray, num_buckets: int) -> np.ndarray:
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


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    key_left: str,
    key_right: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Partitioned hash join of two large Datasets (inner).

    Output columns = left columns + right columns minus ``key_right``.
    """

    def tag(side: str, key: str):
        def add(batch: pa.Table) -> pa.Table:
            b = _key_bucket(batch.column(key), num_buckets)
            return batch.append_column(
                "_jbucket", pa.array(b)
            ).append_column("_jside", pa.array([side] * len(batch)))

        return add

    # align schemas for the union: nulls for the other side's columns
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_names = [n for n in r_schema.names if n != key_right]

    def widen_left(batch: pa.Table) -> pa.Table:
        for name in r_names:
            idx = r_schema.names.index(name)
            batch = batch.append_column(
                name, pa.nulls(len(batch), r_schema.types[idx])
            )
        return batch

    def widen_right(batch: pa.Table) -> pa.Table:
        out = {key_left: batch.column(key_right)}
        for name, typ in zip(l_schema.names, l_schema.types):
            if name != key_left:
                out[name] = pa.nulls(len(batch), typ)
        for name in r_names:
            out[name] = batch.column(name)
        return pa.table(out)

    lt = left.map_batches(widen_left, batch_format="pyarrow").map_batches(
        tag("l", key_left), batch_format="pyarrow"
    )
    rt = right.map_batches(widen_right, batch_format="pyarrow").map_batches(
        tag("l2", key_left), batch_format="pyarrow"
    )

    def join_bucket(group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = group.column("_jside")
        is_left = pc.equal(side, "l")
        lpart = group.filter(is_left).select(l_names)
        rpart = group.filter(pc.invert(is_left)).select([key_left] + r_names)
        return lpart.join(
            rpart, keys=key_left, right_keys=key_left, join_type="inner"
        )

    return lt.union(rt).groupby("_jbucket").map_groups(
        join_bucket, batch_format="pyarrow"
    )
