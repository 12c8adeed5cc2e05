"""Resumable partitioned Parquet sink.

The output discipline the build brief requires for 100-TB runs: one
directory per partition key (never one giant file), each partition
published ATOMICALLY (data files written to temp names, a `_DONE` marker
renamed in last), so a failed run re-executes only the missing
partitions. The reference analogue is the index build's per-segment
checkpoint/commit discipline (state/segment.py manifest) applied to the
data-pipeline side (line-doc sink, WriteLineDocTask).

Partition values are CRAWL-DERIVED and untrusted as path components: a
host like ``a/b``, ``..`` or an empty string must not escape ``out_dir``
or collide. Directory names are therefore a percent-encoding of the
value (see :func:`encode_partition_value` — injective, restricted to
``[A-Za-z0-9_%-]``, so no separators, no dot segments, no empty names),
and the original value is stored inside the ``_DONE`` marker.

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
import string
from typing import List, Optional
from urllib.parse import unquote

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data

DONE_MARKER = "_DONE"

# no '.', no '/', no '~': dot segments and separators can never appear
_SAFE = frozenset(string.ascii_letters + string.digits + "_-")


def encode_partition_value(value) -> str:
    """Injective value -> directory-name encoding. Safe chars map to
    themselves; everything else percent-encodes its UTF-8 bytes ('%' too,
    so decoding is unambiguous). The empty string encodes as a lone '%',
    which no non-empty value can produce (their '%' is always '%25')."""
    s = str(value)
    if s == "":
        return "%"
    out: List[str] = []
    for ch in s:
        if ch in _SAFE:
            out.append(ch)
        else:
            out.extend("%{:02X}".format(b) for b in ch.encode("utf-8"))
    return "".join(out)


def decode_partition_value(name: str) -> str:
    if name == "%":
        return ""
    return unquote(name, errors="strict")


def finished_partitions(out_dir: str) -> List[str]:
    """Partition VALUES (decoded) with a published marker."""
    return sorted(
        decode_partition_value(os.path.basename(os.path.dirname(p)))
        for p in glob.glob(os.path.join(out_dir, "*", DONE_MARKER))
    )


def write_partitioned(
    ds: "ray.data.Dataset",
    out_dir: str,
    partition_col: str,
    resume: bool = True,
) -> List[str]:
    """Write ``ds`` as ``<out_dir>/<encoded value>/part.parquet`` with
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
        enc = encode_partition_value(val)
        pdir = os.path.join(out_dir, enc)
        # belt over suspenders: the encoding already forbids separators
        # and dot segments, but never trust a path joining step
        if os.path.dirname(enc) or os.path.normpath(pdir) != pdir:
            raise ValueError(f"unsafe partition name {enc!r}")
        os.makedirs(pdir, exist_ok=True)
        tmp = os.path.join(pdir, "part.parquet.tmp")
        pq.write_table(group, tmp)
        os.replace(tmp, os.path.join(pdir, "part.parquet"))
        # marker LAST: a crash between the two renames leaves a readable
        # but unpublished partition that a resume simply rewrites. The
        # marker records the ORIGINAL value (the dir name is encoded).
        mtmp = os.path.join(pdir, DONE_MARKER + ".tmp")
        with open(mtmp, "w") as f:
            f.write(f"rows={len(group)}\nvalue={val}\n")
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
    """Read back published partitions by VALUE (unpublished are ignored)."""
    parts = partitions if partitions is not None else finished_partitions(out_dir)
    files = [
        os.path.join(out_dir, encode_partition_value(p), "part.parquet")
        for p in parts
        if os.path.exists(
            os.path.join(out_dir, encode_partition_value(p), DONE_MARKER)
        )
    ]
    if not files:
        raise FileNotFoundError(f"no published partitions under {out_dir}")
    return ray.data.read_parquet(files)
