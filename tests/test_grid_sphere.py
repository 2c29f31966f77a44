"""Spherical (S2-style cube-face quadtree) tiling: the three implementations
(numpy / Spark Column / ANSI SQL) must agree bit-for-bit, and radius covers
must be complete across face edges, corners, poles and the date line."""

import numpy as np
import pytest

from netascore_spark import grid_sphere as GS


@pytest.fixture(scope="module")
def coords():
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89.9, 89.9, 2000)
    lng = rng.uniform(-180.0, 180.0, 2000)
    return lat, lng


def test_roundtrip_center_stays_in_cell(coords):
    lat, lng = coords
    c = GS.cell(lat, lng)
    clat, clng = GS.cell_center_latlng(c)
    assert (GS.cell(clat, clng) == c).all()


def test_levels_nest(coords):
    lat, lng = coords
    c16 = GS.unpack(GS.cell(lat, lng, 16))
    c14 = GS.unpack(GS.cell(lat, lng, 14))
    assert (c16[0] == c14[0]).all()            # same face
    assert (c16[2] >> 2 == c14[2]).all()       # i nests 4:1
    assert (c16[3] >> 2 == c14[3]).all()


def test_spark_column_matches_numpy(spark, coords):
    lat, lng = coords
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"lat": lat, "lng": lng}))
    got = np.array(
        [r["c"] for r in df.select(GS.cell_col("lat", "lng").alias("c")).collect()]
    )
    # Spark preserves input order for a narrow local scan, but sort both for
    # safety via pairing on coordinates
    want = GS.cell(lat, lng)
    assert sorted(got.tolist()) == sorted(want.tolist())


def test_sql_matches_numpy(coords):
    import duckdb
    import pandas as pd

    lat, lng = coords
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lat": lat, "lng": lng}))
    dd = con.execute(
        "SELECT " + GS.cell_sql("lat", "lng") + " AS c FROM pts"
    ).df()["c"].to_numpy()
    assert (dd == GS.cell(lat, lng)).all()


def _haversine(lat1, lon1, lat2, lon2):
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp, dl = p2 - p1, np.radians(lon2 - lon1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * GS.EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


@pytest.mark.parametrize(
    "base",
    [
        (35.264, 45.0),    # cube corner
        (89.97, 13.0),     # north pole face
        (0.0, 44.99),      # face edge
        (0.0, 179.999),    # date line
        (-45.0, -90.0),
    ],
)
def test_cover_cap_complete_across_faces(base):
    # every point within r of p must have its cell inside p's cover
    rng = np.random.RandomState(13)
    r = 300.0
    blat = base[0] + rng.uniform(-0.01, 0.01, 300)
    blng = base[1] + rng.uniform(-0.01, 0.01, 300)
    cells = GS.cell(blat, blng)
    for i in range(0, 300, 23):
        cov = set(GS.cover_cap(float(blat[i]), float(blng[i]), r).tolist())
        d = _haversine(blat[i], blng[i], blat, blng)
        for w in np.where(d <= r)[0]:
            assert int(cells[w]) in cov


def test_hierarchy_parent_equals_coarse_cell():
    # quadtree ancestor property: parent(cell(L), d) == cell(L-d), everywhere
    rng = np.random.RandomState(7)
    lat = rng.uniform(-89.9, 89.9, 5000)
    lng = rng.uniform(-180.0, 180.0, 5000)
    for steps, fine, coarse in [(1, 16, 15), (4, 16, 12), (6, 14, 8)]:
        assert np.array_equal(
            GS.parent(GS.cell(lat, lng, fine), steps), GS.cell(lat, lng, coarse)
        )


def test_hierarchy_children_inverse():
    c = GS.cell(47.07, 15.43, 12)
    ch = GS.children(c)
    assert len(ch) == 4 and len(set(ch.tolist())) == 4
    assert np.array_equal(GS.parent(ch, 1), np.full(4, int(c)))
    # children live exactly one level down, same face
    f0, l0, *_ = GS.unpack(c)
    for cc in ch:
        f, l, *_ = GS.unpack(cc)
        assert int(l) == int(l0) + 1 and int(f) == int(f0)


def test_hierarchy_column_and_sql_match_numpy(spark):
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    rng = np.random.RandomState(11)
    pdf = pd.DataFrame({
        "lat": rng.uniform(-89.9, 89.9, 2000),
        "lng": rng.uniform(-180.0, 180.0, 2000),
    })
    pdf["cell"] = GS.cell(pdf["lat"].to_numpy(), pdf["lng"].to_numpy(), 16)
    expected = GS.parent(pdf["cell"].to_numpy(), 3)
    got_col = (
        spark.createDataFrame(pdf)
        .select(GS.parent_col("cell", steps=3).alias("p"))
        .toPandas()["p"]
        .to_numpy()
    )
    assert np.array_equal(got_col, expected)
    con = duckdb.connect()
    con.register("t", pdf)
    got_sql = con.execute(
        f"SELECT {GS.parent_sql('cell', steps=3)} FROM t"
    ).df().iloc[:, 0].to_numpy()
    assert np.array_equal(got_sql, expected)
