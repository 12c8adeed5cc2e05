"""Resumable partitioned Parquet sink.

The output discipline the build brief requires for 100-TB runs: one
directory per partition key (never one giant file), each partition
published ATOMICALLY (data files written to temp names, a `_DONE` marker
renamed in last), so a failed run re-executes only the missing
partitions. The reference analogue is the index build's per-segment
checkpoint/commit discipline (state/segment.py manifest) applied to the
data-pipeline side (line-doc sink, WriteLineDocTask).

Plan shape: the finished-marker set is tiny (one name per partition) —
it is read once on the driver and broadcast; a streaming filter drops
rows of finished partitions BEFORE the shuffle, then one
``groupby(partition).map_groups`` writes each partition directory.
Per-group memory = the partition's rows: choose the partition column so
partitions are block-sized (a hash bucket of the key for skewed keys).
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

DONE_MARKER = "_DONE"


def finished_partitions(out_dir: str) -> List[str]:
    """Partition values with a published marker."""
    return sorted(
        os.path.basename(os.path.dirname(p))
        for p in glob.glob(os.path.join(out_dir, "*", DONE_MARKER))
    )


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> List[str]:
    """Write ``ds`` as ``<out_dir>/<partition value>/part.parquet`` with
    atomic per-partition publish; with ``resume=True`` partitions that
    already carry a marker are skipped WITHOUT re-shuffling their rows.
    Returns the partition values written in this run."""
    os.makedirs(out_dir, exist_ok=True)
    done = set(finished_partitions(out_dir)) if resume else set()
    done_ref = ray.put(np.array(sorted(done), dtype=object))

    def drop_done(batch: pa.Table) -> pa.Table:
        finished = ray.get(done_ref)
        if len(finished) == 0:
            return batch
        vals = np.asarray(
            [str(v) for v in batch.column(partition_col).to_pylist()],
            dtype=object,
        )
        keep = ~np.isin(vals, finished)
        return batch.filter(pa.array(keep))

    def write_group(group: pa.Table) -> pa.Table:
        val = str(group.column(partition_col)[0].as_py())
        pdir = os.path.join(out_dir, val)
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(pdir, "part.parquet"))
        # marker LAST: a crash between the two renames leaves a readable
        # but unpublished partition that a resume simply rewrites
        mtmp = os.path.join(pdir, DONE_MARKER + ".tmp")
        with open(mtmp, "w") as f:
            f.write(f"rows={len(group)}\n")
        os.replace(mtmp, os.path.join(pdir, DONE_MARKER))
        return pa.table({"partition": pa.array([val], pa.string())})

    written = (
        ds.map_batches(drop_done, batch_format="pyarrow")
        .groupby(partition_col)
        .map_groups(write_group, batch_format="pyarrow")
        .take_all()
    )
    return sorted(r["partition"] for r in written)


def read_partitioned(
    out_dir: str, partitions: Optional[List[str]] = None
) -> "ray.data.Dataset":
    """Read back published partitions (unpublished ones are ignored)."""
    parts = partitions if partitions is not None else finished_partitions(out_dir)
    files = [
        os.path.join(out_dir, p, "part.parquet")
        for p in parts
        if os.path.exists(os.path.join(out_dir, p, DONE_MARKER))
    ]
    if not files:
        raise FileNotFoundError(f"no published partitions under {out_dir}")
    return ray.data.read_parquet(files)
