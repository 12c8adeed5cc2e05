"""Indexed-shape sidecar — the LatLonShape storage analogue.

Reference: ``core/src/java/org/apache/lucene/document/LatLonShape.java``
(createIndexableFields tessellates polygons/lines into triangles stored in
a 7-dim BKD; queries walk the tree with a Component2D relate). Adapted
form: one parquet sidecar per shape field holding the ORIGINAL vertex
list per doc (int64 centi-degrees, the engine's exact integer grid) plus
the per-doc bounding box — the bbox columns play the BKD inner-node role
(one vectorized prune pass), the vertex list is the leaf payload the
exact edge kernels (functions/geo.py relate_shape_*) run on.

Scale shape: the sidecar is written streaming (one atomic parquet per
batch, same retry discipline as the doc-values writer) and partitions by
doc range with the index shards; a query reads bbox columns only until
candidates are known.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SHAPES_DIR = "shapes"

#: shape kinds (ShapeField.DecodedTriangle provenance: POINT/LINE/TRIANGLE)
POLYGON, LINE = "polygon", "line"


def write_shape_values(
    ds, index_dir: str, field: str = "shape",
    verts_col: str = "verts", kind_col: Optional[str] = None,
) -> None:
    """Write the shape sidecar from a Dataset with ``doc_id``, a
    ``verts_col`` list column (flat [lat0, lon0, lat1, lon1, ...] int64
    centi-degrees) and optionally a ``kind_col`` ('polygon'|'line';
    default polygon). Streaming, atomic per batch."""
    import shutil

    out_dir = os.path.join(index_dir, SHAPES_DIR, field)
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        import zlib

        ids = batch.column("doc_id").to_numpy().astype(np.int64)
        if len(ids) == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        verts = batch.column(verts_col)
        if kind_col is not None:
            kinds = batch.column(kind_col)
        else:
            kinds = pa.array([POLYGON] * len(ids), pa.string())
        flat = verts.combine_chunks()
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        offs = flat.offsets.to_numpy()
        vals = flat.flatten().to_numpy().astype(np.int64)
        mins_y = np.empty(len(ids), dtype=np.int64)
        maxs_y = np.empty(len(ids), dtype=np.int64)
        mins_x = np.empty(len(ids), dtype=np.int64)
        maxs_x = np.empty(len(ids), dtype=np.int64)
        for i in range(len(ids)):
            seg = vals[offs[i]:offs[i + 1]]
            if len(seg) < 4 or len(seg) % 2:
                raise ValueError(
                    f"doc {ids[i]}: verts must be >= 2 (lat, lon) pairs"
                )
            mins_y[i] = seg[0::2].min(); maxs_y[i] = seg[0::2].max()
            mins_x[i] = seg[1::2].min(); maxs_x[i] = seg[1::2].max()
        tbl = pa.table({
            "doc_id": pa.array(ids),
            "kind": kinds,
            "verts": flat,
            "min_lat": pa.array(mins_y), "max_lat": pa.array(maxs_y),
            "min_lon": pa.array(mins_x), "max_lon": pa.array(maxs_x),
        })
        crc = zlib.crc32(ids.tobytes())
        name = (
            f"sh-{int(ids.min())}-{int(ids.max())}-{len(ids)}-{crc:08x}"
            ".parquet"
        )
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)
        return pa.table({"rows": pa.array([len(ids)], pa.int64())})

    ds.map_batches(write_batch, batch_format="pyarrow").count()


def has_shape_values(index_dir: str, field: str = "shape") -> bool:
    return bool(
        glob.glob(os.path.join(index_dir, SHAPES_DIR, field, "*.parquet"))
    )


class ShapeValues:
    """Query-side view: doc-sorted bbox arrays (the prune pass) plus
    per-doc vertex access."""

    def __init__(self, index_dir: str, field: str = "shape"):
        files = sorted(
            glob.glob(os.path.join(index_dir, SHAPES_DIR, field, "*.parquet"))
        )
        if not files:
            raise ValueError(
                f"no shape sidecar for field {field!r} in {index_dir} "
                "(state/shapes.py write_shape_values required)"
            )
        tbl = pa.concat_tables(pq.read_table(f) for f in files)
        order = np.argsort(tbl.column("doc_id").to_numpy(), kind="stable")
        tbl = tbl.take(pa.array(order))
        self.doc_ids = tbl.column("doc_id").to_numpy().astype(np.int64)
        self.min_lat = tbl.column("min_lat").to_numpy()
        self.max_lat = tbl.column("max_lat").to_numpy()
        self.min_lon = tbl.column("min_lon").to_numpy()
        self.max_lon = tbl.column("max_lon").to_numpy()
        self._kinds = tbl.column("kind").to_pylist()
        verts = tbl.column("verts").combine_chunks()
        self._offsets = verts.offsets.to_numpy()
        self._vals = verts.flatten().to_numpy().astype(np.int64)

    def __len__(self) -> int:
        return len(self.doc_ids)

    def shape_at(self, i: int) -> Tuple[np.ndarray, np.ndarray, bool]:
        """(lat array, lon array, closed?) for row i (doc-sorted order)."""
        seg = self._vals[self._offsets[i]:self._offsets[i + 1]]
        return seg[0::2], seg[1::2], self._kinds[i] == POLYGON
