"""LatLonShape subset (core/src/java/org/apache/lucene/document/
LatLonShape.java + LatLonShapeBoundingBoxQuery / Component2D relate):
indexed polygons & lines vs box/polygon queries under INTERSECTS /
WITHIN / DISJOINT, exact int64 edge kernels."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.geo import (
    DISJOINT,
    INTERSECTS,
    WITHIN,
    relate_shape_box,
    relate_shape_polygon,
    shape_docs,
)

BOX = (0, 10, 0, 10)  # min_lat, max_lat, min_lon, max_lon
QPOLY = ((0, 0), (0, 10), (10, 10), (10, 0))


def _rel_box(verts, closed=True):
    ys = np.asarray([v[0] for v in verts], dtype=np.int64)
    xs = np.asarray([v[1] for v in verts], dtype=np.int64)
    return relate_shape_box(ys, xs, closed, *BOX)


def _rel_poly(verts, qverts=QPOLY, closed=True):
    ys = np.asarray([v[0] for v in verts], dtype=np.int64)
    xs = np.asarray([v[1] for v in verts], dtype=np.int64)
    return relate_shape_polygon(ys, xs, closed, qverts)


def test_box_relations_polygons():
    # fully inside
    assert _rel_box([(2, 2), (2, 4), (4, 4), (4, 2)]) == WITHIN
    # vertex inside
    assert _rel_box([(5, 5), (5, 15), (15, 5)]) == INTERSECTS
    # bbox disjoint
    assert _rel_box([(12, 12), (12, 20), (20, 12)]) == DISJOINT
    # edge crosses the box, no vertex inside, no box corner inside
    assert _rel_box([(-5, 5), (25, 5), (25, 6)]) == INTERSECTS
    # shape CONTAINS the box (box corners inside the polygon)
    assert _rel_box([(-5, -5), (-5, 15), (15, 15), (15, -5)]) == INTERSECTS
    # bboxes overlap but geometry disjoint (hypotenuse far outside)
    assert _rel_box([(25, 8), (8, 25), (25, 25)]) == DISJOINT
    # boundary vertex on the CLOSED box edge counts as intersecting
    assert _rel_box([(0, 5), (-5, 2), (-5, 8)]) == INTERSECTS


def test_box_relations_lines():
    assert _rel_box([(2, 2), (8, 8)], closed=False) == WITHIN
    assert _rel_box([(-5, 5), (15, 5)], closed=False) == INTERSECTS
    assert _rel_box([(12, 12), (20, 20)], closed=False) == DISJOINT
    # open line: the (last -> first) closing edge must NOT exist —
    # these two points straddle the box but the segment between
    # consecutive vertices detours around it
    assert _rel_box([(25, 8), (8, 25)], closed=False) == DISJOINT


def test_polygon_relations():
    assert _rel_poly([(2, 2), (2, 4), (4, 4), (4, 2)]) == WITHIN
    assert _rel_poly([(5, 5), (5, 15), (15, 5)]) == INTERSECTS
    assert _rel_poly([(25, 8), (8, 25), (25, 25)]) == DISJOINT
    # query polygon inside the shape
    assert _rel_poly([(-5, -5), (-5, 15), (15, 15), (15, -5)]) == INTERSECTS
    # touch at a single boundary vertex -> INTERSECTS (segment touch)
    assert _rel_poly([(0, 5), (-5, 2), (-5, 8)]) == INTERSECTS
    # non-convex query polygon: a C whose notch the shape sits in
    cpoly = ((0, 0), (10, 0), (10, 10), (8, 10), (8, 2), (2, 2), (2, 10),
             (0, 10))
    assert _rel_poly([(4, 6), (4, 8), (6, 8), (6, 6)], qverts=cpoly) == DISJOINT
    assert _rel_poly([(4, 6), (4, 8), (9, 8), (9, 6)], qverts=cpoly) == INTERSECTS
    # line within / crossing the query polygon
    assert _rel_poly([(2, 2), (8, 8)], closed=False) == WITHIN
    assert _rel_poly([(-5, 5), (15, 5)], closed=False) == INTERSECTS


def test_shape_docs_end_to_end(ray_session, tmp_path):
    import ray.data

    from lucene_ray.state.shapes import has_shape_values, write_shape_values

    shapes = {
        0: [2, 2, 2, 4, 4, 4, 4, 2],          # within
        1: [5, 5, 5, 15, 15, 5],              # intersects
        2: [12, 12, 12, 20, 20, 12],          # disjoint (bbox)
        3: [25, 8, 8, 25, 25, 25],            # disjoint (bbox overlap)
        4: [-5, -5, -5, 15, 15, 15, 15, -5],  # contains the box
    }
    idx = str(tmp_path / "idx")
    write_shape_values(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array(sorted(shapes), pa.int64()),
            "verts": pa.array(
                [shapes[d] for d in sorted(shapes)], pa.list_(pa.int64())
            ),
        })),
        idx,
    )
    assert has_shape_values(idx)

    class _R:  # minimal reader shim: shape_values + deletes
        deleted = np.empty(0, dtype=np.int64)

        def shape_values(self, field="shape"):
            from lucene_ray.state.shapes import ShapeValues

            return ShapeValues(idx, field)

    r = _R()
    geom = ("box",) + BOX
    inter = shape_docs(r, geom, INTERSECTS).tolist()
    within = shape_docs(r, geom, WITHIN).tolist()
    disj = shape_docs(r, geom, DISJOINT).tolist()
    assert within == [0]
    assert inter == [0, 1, 4]
    assert disj == [2, 3]
    # the three relations partition the corpus (WITHIN ⊆ INTERSECTS)
    assert sorted(inter + disj) == sorted(shapes)

    pgeom = ("polygon", QPOLY)
    assert shape_docs(r, pgeom, WITHIN).tolist() == [0]
    assert shape_docs(r, pgeom, INTERSECTS).tolist() == [0, 1, 4]
    assert shape_docs(r, pgeom, DISJOINT).tolist() == [2, 3]

    # deletes respected
    r.deleted = np.asarray([1, 3], dtype=np.int64)
    assert shape_docs(r, geom, INTERSECTS).tolist() == [0, 4]
    assert shape_docs(r, geom, DISJOINT).tolist() == [2]


def test_point_geometry_relations():
    # point strictly inside, on an edge, at a vertex, outside
    tri = [(10, 0), (-10, -10), (-10, 10)]
    ys = np.asarray([v[0] for v in tri], dtype=np.int64)
    xs = np.asarray([v[1] for v in tri], dtype=np.int64)

    def rel(py, px):
        return relate_shape_box(ys, xs, True, py, py, px, px)

    assert rel(0, 0) == INTERSECTS        # interior
    assert rel(-10, 0) == INTERSECTS      # on the base edge
    assert rel(10, 0) == INTERSECTS       # at the apex vertex
    assert rel(0, 10) == DISJOINT         # outside (right of the edge)
    assert rel(-11, 0) == DISJOINT        # below the bbox
    # open line: point ON the segment vs off it
    ly = np.asarray([0, 10], dtype=np.int64)
    lx = np.asarray([0, 10], dtype=np.int64)
    assert relate_shape_box(ly, lx, False, 5, 5, 5, 5) == INTERSECTS
    assert relate_shape_box(ly, lx, False, 5, 5, 6, 6) == DISJOINT


def test_checkindex_validates_shapes(ray_session, tmp_path):
    """CheckIndex covers the shapes sidecar: clean index passes, a
    corrupted bbox (the prune pass trusts it) is flagged."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    from lucene_ray.pipelines.build import IndexConfig, build_index
    from lucene_ray.state.checkindex import IndexCorruptError, check_index
    from lucene_ray.state.shapes import write_shape_values

    idx = str(tmp_path / "idx")
    build_index(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta", "beta gamma"], pa.string()),
        })),
        idx,
        IndexConfig(analyzer="en_nostem_simple", norm_kind="exact",
                    num_partitions=1),
        doc_count=2,
    )
    write_shape_values(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "verts": pa.array(
                [[0, 0, 0, 5, 5, 5], [10, 10, 10, 20, 20, 10]],
                pa.list_(pa.int64()),
            ),
        })),
        idx,
    )
    assert check_index(idx)["ok"]
    (f,) = glob.glob(os.path.join(idx, "shapes", "shape", "*.parquet"))
    t = pq.read_table(f)
    bad = t.set_column(
        t.schema.get_field_index("max_lat"), "max_lat",
        pa.array([99, 99], pa.int64()),
    )
    pq.write_table(bad, f)
    with pytest.raises(IndexCorruptError, match="bbox"):
        check_index(idx)
