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
