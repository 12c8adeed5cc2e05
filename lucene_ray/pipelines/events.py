"""Windowed aggregation over the ``events`` stream table.

Tumbling-window aggregate expressed Ray-Data-first: the window id is a pure
per-row function (integer floor of the epoch), computed vectorized in
``map_batches``, so the only shuffle is the final small
``groupby([window, event_type])`` over pre-aggregated partials — the
classic partial/final combiner split (one row per (window, type) per batch
crosses the wire, never one per event).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

from ..functions.rounding import round_half_away

WINDOW_US = 3_600_000_000  # 1 hour


def add_window(batch: pa.Table, window_us: int = WINDOW_US) -> pa.Table:
    import pyarrow.compute as pc

    epoch_us = batch.column("ts").cast(pa.int64())
    window = pc.divide(epoch_us, window_us)  # int64 floor division (ts >= epoch)
    return batch.append_column("window", window)


def _partial(batch: pa.Table, window_us: int) -> pa.Table:
    b = add_window(batch, window_us)
    g = b.group_by(["window", "event_type"]).aggregate(
        [("event_id", "count"), ("value", "sum")]
    )
    return pa.table(
        {
            "window": g.column("window"),
            "event_type": g.column("event_type"),
            "n_part": g.column("event_id_count").cast(pa.int64()),
            "sum_part": g.column("value_sum").cast(pa.float64()),
        }
    )


def _final(batch: pa.Table) -> pa.Table:
    import numpy as np

    return pa.table(
        {
            "window": batch.column("window"),
            "event_type": batch.column("event_type"),
            "n_events": batch.column("sum(n_part)").cast(pa.int64()),
            "sum_value": pa.array(
                round_half_away(batch.column("sum(sum_part)").to_numpy(), 4)
            ),
        }
    )


def window_aggregate(
    ds: "ray.data.Dataset", window_us: int = WINDOW_US
) -> "ray.data.Dataset":
    """-> Dataset(window, event_type, n_events, sum_value), tumbling windows."""
    partial = ds.select_columns(["ts", "event_type", "event_id", "value"]).map_batches(
        _partial, batch_format="pyarrow", fn_kwargs={"window_us": window_us}
    )
    final = partial.groupby(["window", "event_type"]).aggregate(
        Sum("n_part"), Sum("sum_part")
    )
    return final.map_batches(_final, batch_format="pyarrow")
