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


def sliding_window_aggregate(
    ds: "ray.data.Dataset",
    width_us: int = WINDOW_US,
    hop_us: int = WINDOW_US // 4,
) -> "ray.data.Dataset":
    """Sliding (hopping) windows: width ``width_us``, advancing by
    ``hop_us``. Window w covers [w*hop, w*hop + width); an event at t
    belongs to the width/hop windows w in (t-width, t] hop-steps.

    Ray-Data-first shape: a vectorized per-batch fan-out (np.repeat, one
    output row per (event, window) — the flat_map analogue), partial
    aggregation inside the same batch, then the small final groupby.

    -> Dataset(window, event_type, n_events, sum_value)
    """
    if width_us % hop_us != 0:
        raise ValueError("width_us must be a multiple of hop_us")
    fan = width_us // hop_us

    def _partial_sliding(batch: pa.Table) -> pa.Table:
        import numpy as np

        epoch_us = batch.column("ts").cast(pa.int64()).to_numpy()
        last_w = epoch_us // hop_us  # newest window containing the event
        n = len(epoch_us)
        windows = (
            np.repeat(last_w, fan)
            - np.tile(np.arange(fan, dtype=np.int64), n)
        )
        # windows starting before epoch are clipped (events are post-epoch)
        valid = windows >= 0
        etype = pa.compute.take(
            batch.column("event_type"),
            pa.array(np.repeat(np.arange(n, dtype=np.int64), fan)[valid]),
        )
        values = np.repeat(batch.column("value").to_numpy(), fan)[valid]
        fanned = pa.table(
            {
                "window": pa.array(windows[valid]),
                "event_type": etype,
                "value": pa.array(values),
            }
        )
        g = fanned.group_by(["window", "event_type"]).aggregate(
            [("value", "count"), ("value", "sum")]
        )
        return pa.table(
            {
                "window": g.column("window"),
                "event_type": g.column("event_type"),
                "n_part": g.column("value_count").cast(pa.int64()),
                "sum_part": g.column("value_sum").cast(pa.float64()),
            }
        )

    partial = ds.select_columns(["ts", "event_type", "value"]).map_batches(
        _partial_sliding, batch_format="pyarrow"
    )
    final = partial.groupby(["window", "event_type"]).aggregate(
        Sum("n_part"), Sum("sum_part")
    )
    return final.map_batches(_final, batch_format="pyarrow")


SESSION_GAP_US = 1_800_000_000  # 30 min


def sessionize(
    ds: "ray.data.Dataset", gap_us: int = SESSION_GAP_US
) -> "ray.data.Dataset":
    """Gap-based sessionization per user — the stateful-window operator.

    A new session starts when the gap to the user's previous event exceeds
    ``gap_us``. Expressed Ray-Data-first: ONE ``groupby(user_id)`` shuffle
    co-locates each user's history, then a vectorized per-group kernel
    (sort + diff + cumsum) assigns dense 1-based session ids. Event order
    inside a user is (ts, event_id) — deterministic under ties.

    -> Dataset(event_id, user_id, session_id)
    """
    import numpy as np

    num_buckets = 64  # group count is O(buckets), never O(users)

    def add_bucket(batch: pa.Table) -> pa.Table:
        b = (batch.column("user_id").to_numpy() % num_buckets).astype(np.int32)
        return batch.append_column("_bucket", pa.array(b))

    def assign(group: pa.Table) -> pa.Table:
        g = group.sort_by(
            [
                ("user_id", "ascending"),
                ("ts", "ascending"),
                ("event_id", "ascending"),
            ]
        )
        uid = g.column("user_id").to_numpy()
        ts = g.column("ts").cast(pa.int64()).to_numpy()
        n = len(ts)
        new_sess = np.ones(n, dtype=np.int64)
        if n > 1:
            same_user = uid[1:] == uid[:-1]
            new_sess[1:] = np.where(
                same_user & (np.diff(ts) <= gap_us), 0, 1
            )
        cs = np.cumsum(new_sess)
        # rebase per user: session_id = cs - cs[user_first_row] + 1
        user_start = np.ones(n, dtype=bool)
        if n > 1:
            user_start[1:] = uid[1:] != uid[:-1]
        starts = np.flatnonzero(user_start)
        sizes = np.diff(np.append(starts, n))
        session_id = cs - np.repeat(cs[starts], sizes) + 1
        return pa.table(
            {
                "event_id": g.column("event_id"),
                "user_id": g.column("user_id"),
                "session_id": pa.array(session_id),
            }
        )

    return (
        ds.select_columns(["event_id", "user_id", "ts"])
        .map_batches(add_bucket, batch_format="pyarrow")
        .groupby("_bucket")
        .map_groups(assign, batch_format="pyarrow")
    )
