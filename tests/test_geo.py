"""Lambert-93 → WGS84 against known reference points."""

import numpy as np

from isen_projet_bigdata_a3s6_spark.functions.geo import (
    _lambert93_to_wgs84_np,
    with_wgs84,
)


def test_projection_origin():
    # Lambert-93 natural origin: X=700000, lon=3°E exactly (false easting)
    lon, lat = _lambert93_to_wgs84_np(np.array([700000.0]), np.array([6600000.0]))
    assert abs(lon[0] - 3.0) < 1e-9
    # latitude of the Y=6600000 parallel on the central meridian ≈ 46.5°N
    assert abs(lat[0] - 46.5) < 0.01


def test_roundtrip_monotonic():
    # longitude grows with X, latitude grows with Y
    lon, lat = _lambert93_to_wgs84_np(
        np.array([650000.0, 700000.0, 750000.0]),
        np.array([6600000.0, 6600000.0, 6600000.0]),
    )
    assert lon[0] < lon[1] < lon[2]
    lon2, lat2 = _lambert93_to_wgs84_np(
        np.array([700000.0, 700000.0]), np.array([6500000.0, 6700000.0])
    )
    assert lat2[0] < lat2[1]


def test_with_wgs84_columns(spark):
    df = spark.createDataFrame([(1, 700000.0, 6600000.0)], "id int, X double, Y double")
    out = with_wgs84(df).collect()[0]
    assert abs(out["longitude"] - 3.0) < 1e-9
    assert abs(out["latitude"] - 46.5) < 0.01
