"""GIP path: IDF loader (S4), bit decode (P9), array functions (F7-F9),
offset-curve linework (J14), network assembly."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from netascore_spark.functions import gip as G
from netascore_spark.geometry import ops, wkb
from netascore_spark.pipeline.gip import build_gip_network, linkuse_geometries, link_geometries
from netascore_spark.sources.gip import SAMPLE_IDF, load_idf, parse_idf


@pytest.fixture(scope="module")
def gip_tables(spark):
    return load_idf(spark, SAMPLE_IDF)


def test_idf_parse_types():
    tables = parse_idf(SAMPLE_IDF)
    assert set(tables) == {"gip_link", "gip_linkcoordinate", "gip_linkuse", "gip_node"}
    schema, pdf = tables["gip_link"]
    names = [f.name for f in schema.fields]
    assert "offset_" in names  # reserved-word rename
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types["link_id"] == "int"       # decimal(10) -> integer
    assert types["speed_tow_car"] == "smallint"  # decimal(4)
    assert types["length"] == "double"     # decimal(7,3) -> numeric
    assert types["name1"] == "string"
    assert len(pdf) == 4


def test_bit_filter_and_decode(spark, gip_tables):
    link = gip_tables["gip_link"]
    # access value bits (get_bit(bit(8), 5/6/7) = value bits 2/1/0 =
    # car/bike/ped): 7=all modes, 2=bike only, 4=car only, 1/0=ped fwd only
    kept = link.filter(G.any_vehicle_access(F.col("access_tow"), F.col("access_bkw")))
    assert {r["link_id"] for r in kept.collect()} == {1001, 1002, 1003, 1004}
    dec = link.select(
        "link_id",
        *[v.alias(k) for k, v in G.gip_access_columns(
            F.col("access_tow"), F.col("access_bkw")).items()],
    ).collect()
    by = {r["link_id"]: r for r in dec}
    assert by[1003]["access_car_ft"] and not by[1003]["access_bicycle_ft"]
    assert by[1002]["access_bicycle_ft"] and not by[1002]["access_car_ft"]
    assert by[1004]["access_pedestrian_ft"] and not by[1004]["access_pedestrian_tf"]
    assert by[1001]["access_car_ft"] and by[1001]["access_bicycle_tf"]


def test_f7_bicycle_infrastructure(spark):
    df = spark.createDataFrame(
        [
            ("1;7", "RW;GRW_M"),      # RW -> code 1 -> bicycle_way
            ("1;1", "GRW_T;MZSTR"),   # codes 2,3 -> min 2 -> mixed_way
            ("7", "GRW_M"),           # basetype 7 excluded -> no
            ("1", "BS"),              # bus_lane
            ("1", None),              # bikefeature NULL -> 'no'
            (None, "RW"),             # basetype NULL -> NULL
        ],
        "basetype string, bikefeature string",
    )
    out = [r[0] for r in df.select(
        G.gip_bicycle_infrastructure(F.col("basetype"), F.col("bikefeature"))
    ).collect()]
    assert out == ["bicycle_way", "mixed_way", "no", "bus_lane", "no", None]


def test_f8_pedestrian_infrastructure(spark):
    df = spark.createDataFrame(
        [
            ("1", None, 14, True),    # fuzo -> pedestrian_area
            ("7", None, 1, False),    # pedestrian_way
            ("1", "GRW_M", 1, True),  # mixed_way
            ("6", None, 1, False),    # stairs
            ("1", None, 1, True),     # sidewalk
            ("1", None, 1, False),    # no
        ],
        "basetype string, bikefeature string, formofway int, ped boolean",
    )
    out = [r[0] for r in df.select(
        G.gip_pedestrian_infrastructure(
            F.col("basetype"), F.col("bikefeature"), F.col("formofway"), F.col("ped"))
    ).collect()]
    assert out == ["pedestrian_area", "pedestrian_way", "mixed_way", "stairs",
                   "sidewalk", "no"]


def test_f9_road_category(spark):
    rows = [
        # streetcat B -> primary
        (True, True, True, True, 1, "B", "1", "", "", "primary"),
        # L -> secondary
        (True, True, True, True, 3, "L", "1", "", "", "secondary"),
        # G + frc 3, no special features, car -> residential
        (True, True, True, True, 3, "G", "1", "X", "X", "residential"),
        # other cat + frc 6 -> service
        (True, True, True, True, 6, "X", "1", "X", "X", "service"),
        # VK_BE feature + car -> calmed
        (True, True, True, True, 6, "X", "1", "VK_BE", "X", "calmed"),
        # FUZO -> no_mit
        (False, False, True, True, 6, "X", "1", "FUZO", "X", "no_mit"),
        # no bike access -> path
        (False, False, False, False, 6, "X", "1", "X", "X", "path"),
        # basetype 7 (no car access so earlier branches can't fire) -> path
        (False, False, True, True, 6, "X", "7", "X", "X", "path"),
    ]
    df = spark.createDataFrame(
        [r[:-1] for r in rows],
        "car_ft boolean, car_tf boolean, bike_ft boolean, bike_tf boolean, "
        "frc int, streetcat string, basetype string, ftow string, fbkw string",
    )
    out = [r[0] for r in df.select(
        G.gip_road_category(
            F.col("car_ft"), F.col("car_tf"), F.col("bike_ft"), F.col("bike_tf"),
            F.col("frc"), F.col("streetcat"), F.col("basetype"),
            F.col("ftow"), F.col("fbkw"))
    ).collect()]
    assert out == [r[-1] for r in rows]


def test_link_geometry_assembly(spark, gip_tables):
    geoms = link_geometries(gip_tables["gip_linkcoordinate"]).collect()
    by = {r["link_id"]: wkb.decode(bytes(r["geom"]))[1] for r in geoms}
    np.testing.assert_allclose(by[1001], [[0, 0], [120.5, 0]])
    np.testing.assert_allclose(by[1003], [[120.5, 80.25], [620.5, 80.25]])


def test_offset_substring_linework(spark, gip_tables):
    geoms = link_geometries(gip_tables["gip_linkcoordinate"])
    uses = linkuse_geometries(gip_tables["gip_linkuse"], geoms).collect()
    by = {r["use_id"]: wkb.decode(bytes(r["use_geom"]))[1] for r in uses}
    # use 1: link 1001 ([0,0]->[120.5,0]) offset +2.5 (left = +y), full range
    np.testing.assert_allclose(by[1], [[0, 2.5], [120.5, 2.5]], atol=1e-9)
    # use 4: link 1004 vertical, first half only
    c = by[4]
    assert ops.length(c) == pytest.approx(30.0, abs=1e-9)


def test_build_gip_network(spark, gip_tables):
    edges, nodes = build_gip_network(gip_tables)
    e = {r["edge_id"]: r for r in edges.collect()}
    assert set(e) == {1001, 1002, 1003, 1004}
    # A8 string agg with '*' placeholder: link 1001 has uses (1: basetype 1,
    # bikefeature NULL) and (2: basetype 7, RW) ordered by use_id
    assert e[1001]["basetype"] == "1;7"
    assert e[1001]["bikefeature"] == "*;RW"
    assert e[1003]["basetype"] is None  # no linkuse rows
    # semi-join keeps only referenced nodes (all 5 here)
    assert nodes.count() == 5
