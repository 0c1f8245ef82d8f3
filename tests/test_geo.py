"""UTM → geographic conversion tests.

The declared-query differential already pins the Spark result to the DuckDB
oracle — but both sides there share the SQL stage text, so a transcription
error in the formula itself would pass. These tests compare against the
INDEPENDENT numpy twin (``utm_to_geo_np``, a third engine/libm) and against
physical ground truth of the projection (reference datum:
examples/seismic_reader/utm.hh:84-93, GDA94 / MGA Zone 51).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from mdio_cpp_spark.functions.geo import (
    CENTRAL_MERIDIAN_DEG,
    FALSE_EASTING,
    apply_utm_stages,
    utm_to_geo_np,
)


def test_numpy_twin_physical_sanity():
    # the false-easting point sits ON the central meridian; northing
    # 10_000_000 is the equator for a southern-hemisphere zone
    lat, lon = utm_to_geo_np(FALSE_EASTING, 10_000_000.0)
    assert abs(lon - CENTRAL_MERIDIAN_DEG) < 1e-9
    assert abs(lat) < 1e-9
    # one degree of meridian arc is ~110.6 km at latitude ~-21
    lat1, _ = utm_to_geo_np(FALSE_EASTING, 10_000_000.0 - 2_300_000.0)
    lat2, _ = utm_to_geo_np(FALSE_EASTING, 10_000_000.0 - 2_410_600.0)
    assert lat1 < 0 and lat2 < lat1
    assert abs((lat1 - lat2) - 1.0) < 5e-3


def test_numpy_twin_meter_scale_locally():
    # 1000 m east at lat ~-21 is ~1000/(111320*cos(lat)) degrees of longitude
    lat0, lon0 = utm_to_geo_np(448_000.0, 7_657_000.0)
    lat1, lon1 = utm_to_geo_np(449_000.0, 7_657_000.0)
    dlon_m = (lon1 - lon0) * 111_320.0 * math.cos(math.radians(lat0))
    assert abs(dlon_m - 1000.0) < 2.0  # scale factor + series truncation
    # 1000 m north is ~1000/110574 degrees of latitude
    lat2, _ = utm_to_geo_np(448_000.0, 7_658_000.0)
    assert abs((lat2 - lat0) * 110_574.0 * 1.00567 - 1000.0) < 5.0


@pytest.mark.parametrize("easting,northing", [
    (447_000.0, 7_656_000.0),
    (500_000.0, 7_700_000.0),   # on the central meridian
    (553_000.0, 7_604_321.0),   # east of it → lon > 123
    (401_234.0, 7_891_255.0),   # far west edge of the zone
])
def test_sql_stages_match_numpy_twin(spark, easting, northing):
    df = spark.createDataFrame(
        [(easting, northing)], "easting double, northing double")
    row = apply_utm_stages(df).collect()[0]
    lat, lon = utm_to_geo_np(easting, northing)
    # different libm implementations: agree far below the 6-dp display contract
    assert row["lat"] == pytest.approx(float(lat), abs=1e-9)
    assert row["lon"] == pytest.approx(float(lon), abs=1e-9)
    assert -90 < row["lat"] < 0 and 117 < row["lon"] < 129  # zone 51, south


def test_sql_stages_vectorized_grid(spark):
    # the geo03 shape: a whole grid converted map-side, checked pointwise
    e = np.linspace(420_000.0, 580_000.0, 9)
    n = np.linspace(7_600_000.0, 7_900_000.0, 7)
    pts = [(float(a), float(b)) for a in e for b in n]
    df = spark.createDataFrame(pts, "easting double, northing double")
    got = {(r["easting"], r["northing"]): (r["lat"], r["lon"])
           for r in apply_utm_stages(df).collect()}
    lat, lon = utm_to_geo_np([p[0] for p in pts], [p[1] for p in pts])
    for (p, la, lo) in zip(pts, lat, lon):
        assert got[p][0] == pytest.approx(float(la), abs=1e-9)
        assert got[p][1] == pytest.approx(float(lo), abs=1e-9)


def test_sql_stages_large_grid_distributed(spark):
    """The 100-TB shape in miniature: 50k grid cells converted as column
    math over a partitioned range — checked pointwise against the numpy
    twin (no collect-driven math on the Spark side)."""
    n = 50_000
    # CAST: bare `400000.0` in Spark SQL is a DECIMAL literal; without the
    # cast the derived columns would be decimal and the conversion would run
    # in decimal arithmetic (exact here, but not the double contract)
    df = spark.range(n, numPartitions=8).selectExpr(
        "id",
        "CAST(400000.0 + (id % 251) * 800.0 AS DOUBLE) AS easting",
        "CAST(7500000.0 + (id div 251) * 2000.0 AS DOUBLE) AS northing")
    rows = apply_utm_stages(df).orderBy("id").collect()
    ids = np.arange(n)
    lat, lon = utm_to_geo_np(400000.0 + (ids % 251) * 800.0,
                             7500000.0 + (ids // 251) * 2000.0)
    got_lat = np.array([r["lat"] for r in rows])
    got_lon = np.array([r["lon"] for r in rows])
    assert np.max(np.abs(got_lat - lat)) < 1e-9
    assert np.max(np.abs(got_lon - lon)) < 1e-9


def test_geojson_url_wellformed(spark):
    import json as _json

    from mdio_cpp_spark.plans import REGISTRY

    row = REGISTRY["geo04_geojson_url"].spark(
        spark, "/root/testdata/sf0.001").collect()[0]
    poly = _json.loads(row["geojson"])  # the string must BE valid GeoJSON
    assert poly["type"] == "Polygon"
    ring = poly["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]  # closed ring
    for lon, lat in ring:
        assert 117 < lon < 129 and -90 < lat < 0
    # every reserved char is percent-encoded (utm.hh urlEncode contract)
    tail = row["url"].split("#data=data:application/json,", 1)[1]
    assert not set(tail) & set('{}":[],')
    assert row["url"].startswith("http://geojson.io/#data=")


def test_stages_drop_scratch_columns(spark):
    df = spark.createDataFrame([(450_000.0, 7_650_000.0)],
                               "easting double, northing double")
    out = apply_utm_stages(df)
    assert set(out.columns) == {"easting", "northing", "lat", "lon"}
