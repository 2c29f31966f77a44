"""WGS84<->UTM projection (functions/projection.py) — the ST_Transform
equivalent used by the .osm importer (import_step.py:436)."""

import numpy as np

from netascore_spark.functions import projection as P


def test_utm_anchors():
    # central meridian of zone 33 (15E) -> easting exactly 500000
    e, n = P.wgs84_to_utm(15.0, 47.0, 33)
    assert abs(e - 500000.0) < 1e-6
    # equator -> northing 0 (northern convention)
    assert abs(P.wgs84_to_utm(13.0, 0.0, 33)[1]) < 1e-6
    # southern false northing
    es, ns = P.wgs84_to_utm(15.0, -0.001, 33, north=False)
    assert ns < 10000000.0 and ns > 9999000.0


def test_utm_zone_function():
    assert P.utm_zone(15.0) == 33
    assert P.utm_zone(-180.0) == 1
    assert P.utm_zone(179.9) == 60
    assert P.utm_zone(0.0) == 31


def test_central_meridian_northing_matches_snyder_arc():
    # independent cross-check: on the central meridian, northing must be
    # k0 * meridian arc length; compare the Krueger series against Snyder
    # (1987) eq. 3-21 — a different published series.
    a = 6378137.0
    f = 1 / 298.257223563
    e2 = f * (2 - f)
    for lat in [10.0, 33.3, 45.0, 60.0, 78.0]:
        phi = np.radians(lat)
        M = a * (
            (1 - e2 / 4 - 3 * e2**2 / 64 - 5 * e2**3 / 256) * phi
            - (3 * e2 / 8 + 3 * e2**2 / 32 + 45 * e2**3 / 1024) * np.sin(2 * phi)
            + (15 * e2**2 / 256 + 45 * e2**3 / 1024) * np.sin(4 * phi)
            - (35 * e2**3 / 3072) * np.sin(6 * phi)
        )
        _, n = P.wgs84_to_utm(15.0, lat, 33)
        assert abs(n - 0.9996 * M) < 0.005, lat  # Snyder series is ~mm-level


def test_roundtrip_property():
    rng = np.random.default_rng(7)
    lon = rng.uniform(12.0, 18.0, 20000)
    lat = rng.uniform(-80.0, 84.0, 20000)
    e, n = P.wgs84_to_utm(lon, lat, 33)
    lon2, lat2 = P.utm_to_wgs84(e, n, 33)
    # meter-scale error bounds (lat deg -> ~110.6 km)
    assert np.abs(lat2 - lat).max() * 110574.0 < 1e-6
    assert (np.abs(lon2 - lon) * 111320.0 * np.cos(np.radians(lat))).max() < 1e-6


def test_easting_symmetry():
    # equal offsets east/west of the central meridian mirror around 500000
    e1, _ = P.wgs84_to_utm(15.0 + 1.5, 48.0, 33)
    e2, _ = P.wgs84_to_utm(15.0 - 1.5, 48.0, 33)
    assert abs((e1 - 500000.0) + (e2 - 500000.0)) < 1e-6
