"""Geo queries (LatLonPoint / LatLonDocValues analogue): box cuts,
haversine distance sort and radius filter vs a brute-force python model."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.functions.analysis import make_analyzer
from lucene_ray.functions.geo import (
    EARTH_MEAN_RADIUS_METERS,
    box_docs,
    distance_topk,
    haversine_meters,
)
from lucene_ray.functions.query import matching_docs, parse_query
from lucene_ray.pipelines.build import IndexConfig, build_index
from lucene_ray.state.docvalues import write_doc_values
from lucene_ray.state.reader import IndexReader

from test_engine_oracle import make_corpus


def _coords(doc_ids):
    lat_e2 = (np.asarray(doc_ids) * 7919) % 18000 - 9000
    lon_e2 = (np.asarray(doc_ids) * 104729) % 36000 - 18000
    return lat_e2.astype(np.int64), lon_e2.astype(np.int64)


@pytest.fixture(scope="module")
def geo_index(tmp_path_factory, ray_session):
    import ray.data

    doc_ids, texts = make_corpus(n_docs=300, seed=5)
    out = str(tmp_path_factory.mktemp("geo") / "idx")
    cfg = IndexConfig(
        analyzer="standard_en", norm_kind="byte4", num_partitions=4,
    )
    tbl = pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    build_index(ray.data.from_arrow(tbl), out, cfg, doc_count=len(doc_ids))
    lat, lon = _coords(doc_ids)
    for field, vals in (("lat_e2", lat), ("lon_e2", lon)):
        write_doc_values(
            ray.data.from_arrow(
                pa.table(
                    {"doc_id": pa.array(doc_ids, pa.int64()),
                     "v": pa.array(vals)}
                )
            ),
            out, field, value_col="v",
        )
    return out, doc_ids


def test_haversine_known_value():
    # London -> Paris ~ 343.5 km (published great-circle distance)
    d = haversine_meters(
        np.array([51.5074]), np.array([-0.1278]), 48.8566, 2.3522
    )[0]
    assert 342_000 < d < 345_000
    # zero distance, antipodal max = pi * R
    assert haversine_meters(np.array([10.0]), np.array([20.0]), 10.0, 20.0)[0] == 0.0
    anti = haversine_meters(np.array([0.0]), np.array([0.0]), 0.0, 180.0)[0]
    assert anti == pytest.approx(np.pi * EARTH_MEAN_RADIUS_METERS, rel=1e-9)


def test_box_docs_vs_model(geo_index):
    out, doc_ids = geo_index
    reader = IndexReader(out)
    lat, lon = _coords(doc_ids)
    for box in [(-30, 30, -60, 60), (0, 89.99, -180, 0), (10, 10.5, -5, 5)]:
        lo1, hi1, lo2, hi2 = box
        want = [
            d for d, la, lo in zip(doc_ids, lat / 100.0, lon / 100.0)
            if lo1 <= la <= hi1 and lo2 <= lo <= hi2
        ]
        got = box_docs(reader, lo1, hi1, lo2, hi2)
        assert list(got) == want


def test_distance_topk_vs_model(geo_index):
    out, doc_ids = geo_index
    reader = IndexReader(out)
    lat, lon = _coords(doc_ids)

    def model(center, cand, k, radius=None):
        la, lo = center
        d = haversine_meters(
            lat[cand] / 100.0, lon[cand] / 100.0, la, lo
        )
        ids = np.asarray(doc_ids)[cand]
        if radius is not None:
            m = d <= radius
            ids, d = ids[m], d[m]
        order = np.lexsort((ids, d))[:k]
        return list(ids[order]), list(d[order])

    all_cand = np.arange(len(doc_ids))
    for center in [(0.0, 0.0), (48.85, 2.35), (-89.0, 170.0)]:
        got_d, got_v = distance_topk(reader, *center, k=7)
        want_d, want_v = model(center, all_cand, 7)
        assert list(got_d) == want_d
        assert np.allclose(got_v, want_v, rtol=0, atol=0)
    # with a text-query candidate filter
    q = parse_query("alpha", make_analyzer("standard_en"))
    cand = matching_docs(reader, q)
    got_d, got_v = distance_topk(reader, 0.0, 0.0, k=5, query=q)
    want_d, want_v = model((0.0, 0.0), cand, 5)
    assert list(got_d) == want_d
    # radius query (box prefilter + refine) == model radius cut
    got_d, got_v = distance_topk(reader, 10.0, 20.0, k=10**6, radius_m=2_000_000)
    want_d, want_v = model((10.0, 20.0), all_cand, 10**6, radius=2_000_000)
    assert list(got_d) == want_d
    assert len(got_d) > 0


def test_polygon_docs(geo_index):
    """Polygon containment: square == box equivalence (interior), convex
    half-plane brute agreement, non-convex parity, and filter
    composition."""
    from lucene_ray.functions.geo import polygon_docs

    out, doc_ids = geo_index
    reader = IndexReader(out)
    lat, lon = _coords(doc_ids)

    # 1. square polygon ~ box query (strict interior; box is closed, so
    # compare on points strictly inside the box bounds)
    sq = ((-5000, -9000), (-5000, 9000), (5000, 9000), (5000, -9000))
    got = set(polygon_docs(reader, sq).tolist())
    strict = {
        int(d)
        for d, la, lo in zip(doc_ids, lat, lon)
        if -5000 < la < 5000 and -9000 < lo < 9000
    }
    edge = {
        int(d)
        for d, la, lo in zip(doc_ids, lat, lon)
        if (abs(la) == 5000 and -9000 <= lo <= 9000)
        or (abs(lo) == 9000 and -5000 <= la <= 5000)
    }
    assert strict <= got <= (strict | edge)

    # 2. convex-polygon fuzz vs exact half-plane brute (skip on-edge pts)
    rng = np.random.default_rng(11)
    for _ in range(20):
        k = int(rng.integers(3, 7))
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=k))
        r = rng.integers(2000, 8000)
        verts = [
            (int(r * np.sin(a)), int(2 * r * np.cos(a))) for a in ang
        ]
        if len({v[0] for v in verts}) < len(verts):
            continue  # duplicate y would make degenerate edges
        got = set(polygon_docs(reader, verts).tolist())
        for d, la, lo in zip(doc_ids, lat, lon):
            crosses = []
            on_edge = False
            for i in range(len(verts)):
                y1, x1 = verts[i]
                y2, x2 = verts[(i + 1) % len(verts)]
                t = (int(x2) - x1) * (int(la) - y1) - (int(y2) - y1) * (
                    int(lo) - x1
                )
                if t == 0:
                    on_edge = True
                crosses.append(t > 0)
            if on_edge:
                continue
            inside = all(crosses) or not any(crosses)
            assert (int(d) in got) == inside, (verts, d)

    # 3. non-convex (dart) quad: the notch is OUTSIDE
    dart = ((0, -12000), (8000, 0), (0, 12000), (6000, 0))
    got = set(polygon_docs(reader, dart).tolist())
    # a point in the notch: y=6500, x=0 is above the reflex vertex
    # (6000, 0) but below the apex — build synthetic checks via parity
    for d, la, lo in zip(doc_ids, lat, lon):
        if int(d) in got:
            assert la > 0  # dart sits strictly in the upper half plane

    # 4. filter composition: subset of the unfiltered result AND of the
    # term's matching docs
    an = make_analyzer("standard_en")
    q = parse_query("alpha", an)
    full = set(polygon_docs(reader, sq).tolist())
    filt = set(polygon_docs(reader, sq, query=q).tolist())
    assert filt <= full
    assert filt <= set(matching_docs(reader, q).tolist())
    with pytest.raises(ValueError):
        polygon_docs(reader, ((0, 0), (1, 1)))
