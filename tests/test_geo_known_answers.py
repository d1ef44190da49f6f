"""Known-answer geo distance checks against EXTERNAL reference values
(not the engine's own formula — closes the oracle-independence loop
for haversine): published geodesic distances, WGS84."""

import pytest
from pyspark.sql import functions as F

from bleve_spark.search.geo import haversine_km_col, parse_distance


# (lat1, lon1, lat2, lon2, km, tolerance_km) — reference distances
# from published geodesic calculators (Vincenty/Karney). The engine
# reproduces bleve's sloppy lat-dependent-sphere haversine
# (geo/sloppy.go): radius depends on latitude but not azimuth, so
# meridian legs run up to ~0.7% long vs the true geodesic — the
# tolerances below are that documented envelope, tight enough to
# catch any formula/unit/radian bug (which is >2% instantly).
KNOWN = [
    # 1 degree of longitude on the equator: 111.32 km (WGS84)
    (0.0, 0.0, 0.0, 1.0, 111.32, 0.3),
    # 1 degree of latitude at the equator: 110.57 km geodesic; the
    # sloppy model gives ~111.32 (azimuth-independent radius)
    (0.0, 0.0, 1.0, 0.0, 110.57, 0.8),
    # Paris (48.8566, 2.3522) – London (51.5074, -0.1278): ~343.9 km
    (48.8566, 2.3522, 51.5074, -0.1278, 343.9, 2.5),
    # New York (40.7128, -74.006) – Los Angeles (34.0522, -118.2437):
    # ~3936 km geodesic
    (40.7128, -74.006, 34.0522, -118.2437, 3936.0, 25.0),
    # Sydney (-33.8688, 151.2093) – Auckland (-36.8485, 174.7633):
    # ~2156 km
    (-33.8688, 151.2093, -36.8485, 174.7633, 2156.0, 15.0),
]


@pytest.mark.parametrize("lat1,lon1,lat2,lon2,km,tol", KNOWN)
def test_haversine_known_answers(spark, lat1, lon1, lat2, lon2, km, tol):
    got = (
        spark.range(1)
        .select(
            haversine_km_col(
                F.lit(lat1), F.lit(lon1), lat2, lon2
            ).alias("d")
        )
        .first()["d"]
    )
    assert abs(got - km) <= tol, (got, km)


def test_parse_distance_reference_units():
    # geo_dist.go ParseDistance examples
    assert parse_distance("5in") == pytest.approx(0.127)
    assert parse_distance("5inch") == pytest.approx(0.127)
    assert parse_distance("7yards") == pytest.approx(6.4008)
    assert parse_distance("3nauticalmiles") == pytest.approx(5556.0)
    assert parse_distance("11kilometers") == 11000.0
    assert parse_distance("19") == 19.0  # bare number = meters
