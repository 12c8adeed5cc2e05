"""Corpus sampling operators for training-data pipelines.

Two deterministic primitives a 100-TB crawl pipeline needs ahead of
training-set assembly (no reference analogue — benchmark module's
line-doc extraction is the closest; these are the standard web-corpus
"domain capping" and "proportional downsampling" steps):

* :func:`cap_per_key` — keep at most ``n`` rows per key (e.g. max 1000
  pages per domain), deterministic by an order column. Shape: a
  stateless per-batch pre-trim (each block keeps its first ``n`` per
  key — a correct upper bound that caps the shuffle at ``n`` rows per
  key per block) then one ``groupby(key).map_groups`` head. Per-group
  memory after the pre-trim is ``n × blocks-that-contain-the-key`` rows
  — bounded by the cap, not by the key's raw row count, so a 10^9-page
  domain never materializes.

* :func:`hash_sample` — keep a deterministic pseudo-random fraction of
  rows keyed on an int64 id column (Knuth multiplicative hash mod 2^32
  against a threshold). Pure streaming ``map_batches``: no shuffle, no
  state, reproducible across runs/retries, and exactly expressible in
  SQL for the oracle (``(id * 2654435761) % 2^32 < frac * 2^32``).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa

import ray.data

#: Knuth's multiplicative hash constant (2^32 / golden ratio, odd)
_KNUTH = 2654435761
_MOD = 1 << 32


def cap_per_key(
    ds: "ray.data.Dataset",
    key: str,
    n: int,
    order_col: str = "doc_id",
) -> "ray.data.Dataset":
    """At most ``n`` rows per ``key`` value, the first ``n`` by ascending
    ``order_col`` (ties impossible when order_col is unique). Returns the
    surviving rows with their original columns."""
    if n <= 0:
        raise ValueError("n must be positive")

    def pretrim(batch: pa.Table) -> pa.Table:
        # block-local head-n per key: sort by (key, order) then keep the
        # first n of each run — anything beyond can never be in the
        # global head-n, so the shuffle carries at most n rows per
        # (key, block)
        idx = pa.compute.sort_indices(
            batch,
            sort_keys=[(key, "ascending"), (order_col, "ascending")],
        )
        t = batch.take(idx)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        # rank within key run
        change = np.empty(len(t), dtype=bool)
        if len(t):
            change[0] = True
            change[1:] = keys[1:] != keys[:-1]
        run_starts = np.flatnonzero(change)
        rank = np.arange(len(t)) - np.repeat(
            run_starts, np.diff(np.append(run_starts, len(t)))
        )
        return t.filter(pa.array(rank < n))

    def head(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(
            group,
            sort_keys=[(key, "ascending"), (order_col, "ascending")],
        )
        t = group.take(idx)
        keys = t.column(key).to_numpy(zero_copy_only=False)
        change = np.empty(len(t), dtype=bool)
        if len(t):
            change[0] = True
            change[1:] = keys[1:] != keys[:-1]
        run_starts = np.flatnonzero(change)
        rank = np.arange(len(t)) - np.repeat(
            run_starts, np.diff(np.append(run_starts, len(t)))
        )
        return t.filter(pa.array(rank < n))

    return (
        ds.map_batches(pretrim, batch_format="pyarrow")
        .groupby(key)
        .map_groups(head, batch_format="pyarrow")
    )


def hash_sample(
    ds: "ray.data.Dataset",
    fraction: float,
    id_col: str = "doc_id",
    salt: int = 0,
) -> "ray.data.Dataset":
    """Deterministic ~``fraction`` sample: keep rows with
    ``((id + salt) * KNUTH) mod 2^32 < fraction * 2^32``. Streaming, no
    shuffle; different ``salt`` values draw independent-ish samples."""
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction must be in [0, 1]")
    threshold = int(fraction * _MOD)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        h = ((ids + np.uint64(salt)) * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return batch.filter(pa.array(h < np.uint64(threshold)))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_sample(
    ds: "ray.data.Dataset",
    key: str,
    fraction: float,
    id_col: str = "doc_id",
    min_per_key: Optional[int] = None,
) -> "ray.data.Dataset":
    """Per-stratum proportional sample: hash_sample within every key
    group; with ``min_per_key`` the first ``min_per_key`` rows of each
    key (by id) are always kept so rare strata survive. Union of two
    streaming/capped plans — still nothing driver-side."""
    sampled = hash_sample(ds, fraction, id_col=id_col)
    if min_per_key is None:
        return sampled
    floor = cap_per_key(ds, key, min_per_key, order_col=id_col)
    threshold = int(fraction * _MOD)

    def not_sampled(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        return batch.filter(pa.array(h >= np.uint64(threshold)))

    # avoid duplicates: the floor contributes only rows the hash sample
    # did not already keep
    floor_extra = floor.map_batches(not_sampled, batch_format="pyarrow")
    return sampled.union(floor_extra)


def mixture_sample(
    ds: "ray.data.Dataset",
    fractions: dict,
    key: str = "source",
    id_col: str = "doc_id",
    default: float = 0.0,
) -> "ray.data.Dataset":
    """Training-mix assembly: keep a per-key deterministic fraction of
    rows (e.g. {'wiki': 1.0, 'crawl': 0.1}) — the standard source-
    reweighting step before training-set writes. Shuffle-free: one
    streaming pass, each row keeps iff its multiplicative hash clears the
    key's threshold; keys absent from ``fractions`` use ``default``.
    Deterministic across runs/retries and exactly expressible in SQL."""
    for f in fractions.values():
        if not (0.0 <= f <= 1.0):
            raise ValueError("fractions must be in [0, 1]")
    thresholds = {k: int(f * _MOD) for k, f in fractions.items()}
    default_t = int(default * _MOD)

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy().astype(np.uint64)
        h = (ids * np.uint64(_KNUTH)) % np.uint64(_MOD)
        keys = batch.column(key).to_pylist()
        th = np.fromiter(
            (thresholds.get(k, default_t) for k in keys),
            dtype=np.uint64,
            count=len(keys),
        )
        return batch.filter(pa.array(h < th))

    return ds.map_batches(keep, batch_format="pyarrow")
