"""Geo queries — LatLonPoint / LatLonDocValuesField analogue.

Reference: ``core/src/java/org/apache/lucene/document/LatLonPoint.java``
(newBoxQuery, newDistanceQuery over the 2-D BKD),
``LatLonDocValuesField.java`` (per-doc encoded lat/lon, distance sort via
``newDistanceSort``), ``geo/GeoUtils.java`` (EARTH_MEAN_RADIUS_METERS) and
``util/SloppyMath.java:haversinMeters``.

Our form: latitude and longitude live as two int64 doc-values columns in
CENTI-degrees (``lat_e2``/``lon_e2`` — the testdata derivation is exact at
2 decimals; the reference encodes 1e-7-degree int32s, same idea). A box
query is two 1-D value-sorted range cuts intersected on sorted doc ids —
the 1-D×2 analogue of the BKD box visit; a distance query prefilters with
the bounding box of the radius (longitude window widened by 1/cos(lat),
the reference's GeoUtils.boxRadius approach) then refines with exact
haversine; distance sort gathers doc values only for candidate docs.

Distances are float64 haversine meters on the mean earth radius, computed
with a fixed operation order mirrored verbatim by the DuckDB oracle.

Scale shape: doc values are per doc-range shard; box cuts and top-k
refine run per shard and concatenate/merge in doc order — no all-to-all.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

# GeoUtils.EARTH_MEAN_RADIUS_METERS (core/.../geo/GeoUtils.java)
EARTH_MEAN_RADIUS_METERS = 6371008.7714

_DEG = np.pi / 180.0


def haversine_meters(
    lat1: np.ndarray, lon1: np.ndarray, lat2: float, lon2: float
) -> np.ndarray:
    """Vectorized haversine (SloppyMath.haversinMeters semantics, exact
    libm trig). Operation order is frozen — the SQL oracle mirrors it."""
    phi1 = lat1 * _DEG
    phi2 = lat2 * _DEG
    s1 = np.sin((phi2 - phi1) * 0.5)
    s2 = np.sin((lon2 * _DEG - lon1 * _DEG) * 0.5)
    a = s1 * s1 + np.cos(phi1) * np.cos(phi2) * (s2 * s2)
    return 2.0 * EARTH_MEAN_RADIUS_METERS * np.arcsin(np.sqrt(a))


def box_docs(
    reader,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    lat_field: str = "lat_e2",
    lon_field: str = "lon_e2",
) -> np.ndarray:
    """LatLonPoint.newBoxQuery: sorted doc ids inside the closed box.
    Two value-range cuts (each a pair of searchsorteds on the value-sorted
    doc-values view) intersected on sorted doc ids."""
    lat_dv = reader.doc_values(lat_field)
    lon_dv = reader.doc_values(lon_field)
    lat_docs = lat_dv.range_docs(
        int(np.ceil(min_lat * 100)), int(np.floor(max_lat * 100))
    )
    lon_docs = lon_dv.range_docs(
        int(np.ceil(min_lon * 100)), int(np.floor(max_lon * 100))
    )
    return np.intersect1d(lat_docs, lon_docs, assume_unique=True)


def distance_topk(
    reader,
    lat: float,
    lon: float,
    k: int = 10,
    query=None,
    radius_m: Optional[float] = None,
    lat_field: str = "lat_e2",
    lon_field: str = "lon_e2",
) -> Tuple[np.ndarray, np.ndarray]:
    """k nearest docs to (lat, lon) by haversine meters, tie-broken doc
    asc — LatLonDocValuesField.newDistanceSort. ``query`` restricts
    candidates to its matching docs (filter composition);``radius_m`` adds
    LatLonPoint.newDistanceQuery semantics: a bounding-box prefilter (lat
    window r/R, lon window widened by 1/cos(|lat|), clamped at high
    latitudes to the full range) then exact haversine refine.

    Returns ``(docs, distances_m)`` (float64, unrounded)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.float64))
    if k <= 0:
        return empty
    if query is not None:
        from .query import matching_docs

        cand = matching_docs(reader, query)
    elif radius_m is not None:
        # 1e-7 deg pad: the box is a PREFILTER (exact refine follows), so
        # round the window outward rather than risk excluding a boundary doc
        dlat = np.degrees(radius_m / EARTH_MEAN_RADIUS_METERS) + 1e-7
        cos_lat = np.cos(abs(lat) * _DEG)
        if cos_lat <= 1e-9 or dlat >= 90.0:
            dlon = 180.0
        else:
            dlon = min(180.0, dlat / cos_lat)
        cand = box_docs(
            reader,
            max(-90.0, lat - dlat), min(90.0, lat + dlat),
            max(-180.0, lon - dlon), min(180.0, lon + dlon),
            lat_field, lon_field,
        )
    else:
        # whole-corpus nearest: every doc with a lat value
        cand = reader.doc_values(lat_field).doc_sorted_ids
    if len(cand) == 0:
        return empty
    lats = reader.doc_values_for(lat_field, cand).astype(np.float64) / 100.0
    lons = reader.doc_values_for(lon_field, cand).astype(np.float64) / 100.0
    d = haversine_meters(lats, lons, float(lat), float(lon))
    if radius_m is not None:
        m = d <= radius_m
        cand, d = cand[m], d[m]
        if len(cand) == 0:
            return empty
    if len(cand) > k:
        kth = np.partition(d, k - 1)[k - 1]
        m = d <= kth
        cand, d = cand[m], d[m]
    order = np.lexsort((cand, d))[:k]
    return cand[order], d[order]


def _point_in_polygon(y: int, x: int, ys: np.ndarray, xs: np.ndarray) -> bool:
    """Strict even-odd containment of one integer point — the SAME
    convention as :func:`polygon_docs` (boundary points are OUT;
    documented deviation from the reference's orientation tests)."""
    y2 = np.roll(ys, -1)
    x2 = np.roll(xs, -1)
    nz = ys != y2
    sgn = np.where(y2 > ys, 1, -1)
    spans = (ys > y) != (y2 > y)
    t = (x - xs) * (y2 - ys) - (y - ys) * (x2 - xs)
    return bool(int((nz & spans & (t * sgn < 0)).sum()) % 2)


def _segments_cross(ay1, ax1, ay2, ax2, bys1, bxs1, bys2, bxs2) -> bool:
    """Does segment a intersect ANY of the b segments (touching counts)?
    Exact int64 orientation tests (GeoUtils.orient / the reference's
    EdgeTree crossesLine, core/.../geo/GeoUtils.java:orient): proper
    crossings via opposite orientations, collinear touches via bounding
    overlap. Vectorized over the b array."""
    def orient(py, px, qy, qx, ry, rx):
        return (qx - px) * (ry - py) - (qy - py) * (rx - px)

    d1 = orient(bys1, bxs1, bys2, bxs2, ay1, ax1)
    d2 = orient(bys1, bxs1, bys2, bxs2, ay2, ax2)
    d3 = orient(ay1, ax1, ay2, ax2, bys1, bxs1)
    d4 = orient(ay1, ax1, ay2, ax2, bys2, bxs2)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )
    if proper.any():
        return True

    def on_seg(py, px, qy, qx, ry, rx, d):
        # r collinear with pq and within its bounding box
        return (
            (d == 0)
            & (np.minimum(py, qy) <= ry) & (ry <= np.maximum(py, qy))
            & (np.minimum(px, qx) <= rx) & (rx <= np.maximum(px, qx))
        )

    touch = (
        on_seg(bys1, bxs1, bys2, bxs2, ay1, ax1, d1)
        | on_seg(bys1, bxs1, bys2, bxs2, ay2, ax2, d2)
        | on_seg(ay1, ax1, ay2, ax2, bys1, bxs1, d3)
        | on_seg(ay1, ax1, ay2, ax2, bys2, bxs2, d4)
    )
    return bool(touch.any())


#: LatLonShape query relations (document/ShapeField.QueryRelation)
INTERSECTS, WITHIN, DISJOINT = "intersects", "within", "disjoint"


def relate_shape_box(
    ys: np.ndarray, xs: np.ndarray, closed: bool,
    min_lat: int, max_lat: int, min_lon: int, max_lon: int,
) -> str:
    """One indexed shape (polygon when ``closed`` else line string, int
    centi-degree vertices) vs a CLOSED query box -> INTERSECTS | WITHIN |
    DISJOINT.

    Reference: LatLonShape.newBoxQuery over tessellated triangles
    (document/LatLonShape.java, LatLonShapeBoundingBoxQuery.java); our
    adapted decision runs on the original edge list: WITHIN ⟺ the
    shape's bbox fits in the (convex) box; DISJOINT ⟺ bboxes disjoint,
    or no vertex in the box, no box corner inside the polygon, and no
    edge crossing any box side. Everything else INTERSECTS."""
    smin_y, smax_y = int(ys.min()), int(ys.max())
    smin_x, smax_x = int(xs.min()), int(xs.max())
    if (
        min_lat <= smin_y and smax_y <= max_lat
        and min_lon <= smin_x and smax_x <= max_lon
    ):
        return WITHIN
    if (
        smax_y < min_lat or smin_y > max_lat
        or smax_x < min_lon or smin_x > max_lon
    ):
        return DISJOINT
    # any shape vertex inside the closed box?
    if bool((
        (min_lat <= ys) & (ys <= max_lat)
        & (min_lon <= xs) & (xs <= max_lon)
    ).any()):
        return INTERSECTS
    # any box corner strictly inside the polygon (closed shapes only)?
    if closed:
        for cy, cx in (
            (min_lat, min_lon), (min_lat, max_lon),
            (max_lat, max_lon), (max_lat, min_lon),
        ):
            if _point_in_polygon(cy, cx, ys, xs):
                return INTERSECTS
    # any shape edge crossing any box side?
    n = len(ys)
    ey1, ex1 = ys, xs
    if closed:
        ey2, ex2 = np.roll(ys, -1), np.roll(xs, -1)
    else:
        ey1, ex1 = ys[:-1], xs[:-1]
        ey2, ex2 = ys[1:], xs[1:]
    for (ay1, ax1, ay2, ax2) in (
        (min_lat, min_lon, min_lat, max_lon),
        (min_lat, max_lon, max_lat, max_lon),
        (max_lat, max_lon, max_lat, min_lon),
        (max_lat, min_lon, min_lat, min_lon),
    ):
        if _segments_cross(ay1, ax1, ay2, ax2, ey1, ex1, ey2, ex2):
            return INTERSECTS
    return DISJOINT


def relate_shape_polygon(
    ys: np.ndarray, xs: np.ndarray, closed: bool, q_verts,
) -> str:
    """One indexed shape vs a query POLYGON (simple, implicitly closed,
    int centi-degree vertices) -> INTERSECTS | WITHIN | DISJOINT.

    Reference: LatLonShape.newPolygonQuery (LatLonShapePolygonQuery /
    the Component2D relate walk). Simple-polygon decision: WITHIN ⟺
    every shape vertex strictly inside the query polygon and no
    edge-edge intersection; DISJOINT ⟺ no shape vertex inside, no query
    vertex inside the (closed) shape, and no edge-edge intersection.
    Boundary points follow the engine's strict even-odd convention."""
    q_ys = np.asarray([int(v[0]) for v in q_verts], dtype=np.int64)
    q_xs = np.asarray([int(v[1]) for v in q_verts], dtype=np.int64)
    if (
        ys.max() < q_ys.min() or ys.min() > q_ys.max()
        or xs.max() < q_xs.min() or xs.min() > q_xs.max()
    ):
        return DISJOINT
    if closed:
        ey1, ex1 = ys, xs
        ey2, ex2 = np.roll(ys, -1), np.roll(xs, -1)
    else:
        ey1, ex1 = ys[:-1], xs[:-1]
        ey2, ex2 = ys[1:], xs[1:]
    crossing = False
    qy2 = np.roll(q_ys, -1)
    qx2 = np.roll(q_xs, -1)
    for i in range(len(q_ys)):
        if _segments_cross(
            int(q_ys[i]), int(q_xs[i]), int(qy2[i]), int(qx2[i]),
            ey1, ex1, ey2, ex2,
        ):
            crossing = True
            break
    s_in_q = [
        _point_in_polygon(int(ys[i]), int(xs[i]), q_ys, q_xs)
        for i in range(len(ys))
    ]
    if not crossing and all(s_in_q):
        return WITHIN
    if crossing or any(s_in_q):
        return INTERSECTS
    if closed and any(
        _point_in_polygon(int(q_ys[i]), int(q_xs[i]), ys, xs)
        for i in range(len(q_ys))
    ):
        return INTERSECTS
    return DISJOINT


def shape_docs(
    reader,
    geometry,
    relation: str = INTERSECTS,
    field: str = "shape",
) -> np.ndarray:
    """Indexed-shape query — the LatLonShape subset: sorted doc IDs whose
    indexed shape (polygon or line, state/shapes.py sidecar) holds
    ``relation`` to ``geometry``, which is ``("box", min_lat, max_lat,
    min_lon, max_lon)`` or ``("polygon", ((lat, lon), ...))`` in integer
    centi-degrees.

    Plan: the sidecar's per-doc bounding boxes prune candidates in one
    vectorized pass (the BKD outer-node visit analogue) — only WITHIN/
    INTERSECTS survivors (or, for DISJOINT, every doc, since bbox-
    disjoint docs match immediately) run the exact edge kernels."""
    if relation not in (INTERSECTS, WITHIN, DISJOINT):
        raise ValueError(f"unknown relation {relation!r}")
    sv = reader.shape_values(field)
    if geometry[0] == "box":
        _, qmin_y, qmax_y, qmin_x, qmax_x = geometry
    elif geometry[0] == "polygon":
        qv = geometry[1]
        qmin_y = min(int(v[0]) for v in qv)
        qmax_y = max(int(v[0]) for v in qv)
        qmin_x = min(int(v[1]) for v in qv)
        qmax_x = max(int(v[1]) for v in qv)
    elif geometry[0] == "point":
        # LatLonShape.newGeometryQuery with a POINT component: a point is
        # a degenerate (closed) box, so the box kernels apply verbatim —
        # INTERSECTS ⟺ the point lies in the closed shape (interior or
        # boundary), WITHIN ⟺ the shape IS that point (degenerate)
        _, py, px = geometry
        qmin_y = qmax_y = int(py)
        qmin_x = qmax_x = int(px)
        geometry = ("box", qmin_y, qmax_y, qmin_x, qmax_x)
    else:
        raise ValueError(f"unknown geometry {geometry[0]!r}")
    bbox_disjoint = (
        (sv.max_lat < qmin_y) | (sv.min_lat > qmax_y)
        | (sv.max_lon < qmin_x) | (sv.min_lon > qmax_x)
    )
    out = []
    for i in np.flatnonzero(~bbox_disjoint):
        ys, xs, closed = sv.shape_at(int(i))
        if geometry[0] == "box":
            rel = relate_shape_box(
                ys, xs, closed, qmin_y, qmax_y, qmin_x, qmax_x
            )
        else:
            rel = relate_shape_polygon(ys, xs, closed, geometry[1])
        if rel == relation or (
            relation == INTERSECTS and rel == WITHIN
        ):
            out.append(int(sv.doc_ids[i]))
    docs = np.asarray(sorted(out), dtype=np.int64)
    if relation == DISJOINT:
        docs = np.union1d(
            docs, sv.doc_ids[bbox_disjoint].astype(np.int64)
        )
    deleted = getattr(reader, "deleted", None)
    if deleted is not None and len(deleted) and len(docs):
        pos = np.minimum(np.searchsorted(deleted, docs), len(deleted) - 1)
        docs = docs[deleted[pos] != docs]
    return docs


def polygon_docs(
    reader,
    vertices,
    lat_field: str = "lat_e2",
    lon_field: str = "lon_e2",
    query=None,
) -> np.ndarray:
    """Polygon containment query — LatLonPoint.newPolygonQuery /
    LatLonShape analogue (core/src/java/org/apache/lucene/document/
    LatLonPoint.java newPolygonQuery, geo/Polygon.java + the Polygon2D
    ray-crossings containment). ``vertices``: [(lat_e2, lon_e2), ...]
    integer centi-degree vertices, implicitly closed.

    Containment = even-odd ray crossings, computed EXACTLY in int64 (the
    cross-multiplied intersection test — coordinates and vertices are
    centi-degree ints, products stay < 2^40): an upward/downward edge
    crosses the westward ray from point (y, x) iff ``(y1 > y) !=
    (y2 > y)`` and ``((x - x1)(y2 - y1) - (y - y1)(x2 - x1)) *
    sign(y2 - y1) < 0``. Horizontal edges never cross. DOCUMENTED
    DEVIATION: points exactly ON an edge follow this strict-inequality
    even-odd convention (deterministic, oracle-mirrored); the reference's
    orientation tests treat boundary points as contained.

    Plan: bounding-box prefilter (two 1-D doc-values cuts — the BKD box
    visit analogue), exact test on candidates only; ``query`` further
    restricts candidates to its matching docs. -> sorted doc IDs."""
    verts = [(int(a), int(b)) for a, b in vertices]
    if len(verts) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    ys = [v[0] for v in verts]
    xs = [v[1] for v in verts]
    lat_dv = reader.doc_values(lat_field)
    lon_dv = reader.doc_values(lon_field)
    cand = np.intersect1d(
        lat_dv.range_docs(min(ys), max(ys)),
        lon_dv.range_docs(min(xs), max(xs)),
        assume_unique=True,
    )
    if query is not None:
        from .query import matching_docs

        cand = np.intersect1d(
            cand, matching_docs(reader, query), assume_unique=True
        )
    if len(cand) == 0:
        return cand.astype(np.int64)
    y = lat_dv.values_for(cand)
    x = lon_dv.values_for(cand)
    crossings = np.zeros(len(cand), dtype=np.int64)
    for i in range(len(verts)):
        y1, x1 = verts[i]
        y2, x2 = verts[(i + 1) % len(verts)]
        if y1 == y2:
            continue
        sgn = 1 if y2 > y1 else -1
        spans = (y1 > y) != (y2 > y)
        t = (x - x1) * (y2 - y1) - (y - y1) * (x2 - x1)
        crossings += (spans & (t * sgn < 0)).astype(np.int64)
    return cand[(crossings % 2) == 1].astype(np.int64)
