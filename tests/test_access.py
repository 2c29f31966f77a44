"""Access cascades (F1-F3) vs hand-evaluated reference semantics.

Reference: sql/functions/osm_calculate_access_{car,bicycle,pedestrian}.sql
applied over the normalization CASEs of osm_attributes.sql.j2:32-281.
"""

import pytest

from pyspark.sql import types as T

from netascore_spark.functions.access import with_access_columns

EDGE_FIELDS = [
    ("edge_id", T.LongType()),
    ("highway", T.StringType()),
    ("access", T.StringType()),
    ("bicycle", T.StringType()),
    ("foot", T.StringType()),
    ("oneway", T.StringType()),
    ("junction", T.StringType()),
    ("tags", T.MapType(T.StringType(), T.StringType())),
]
SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in EDGE_FIELDS])


def run(spark, **kv):
    base = {n: None for n, _ in EDGE_FIELDS}
    base["edge_id"] = 1
    base["tags"] = kv.pop("tags", {})
    base.update(kv)
    df = spark.createDataFrame([tuple(base[n] for n, _ in EDGE_FIELDS)], SCHEMA)
    return with_access_columns(df).collect()[0]


def test_residential_all_access(spark):
    r = run(spark, highway="residential")
    assert r["access_car_ft"] and r["access_car_tf"]
    assert r["access_bicycle_ft"] and r["access_bicycle_tf"]
    assert r["access_pedestrian_ft"] and r["access_pedestrian_tf"]


def test_null_highway_blocks_everything(spark):
    r = run(spark)
    assert not r["access_car_ft"] and not r["access_bicycle_ft"]
    assert not r["access_pedestrian_ft"]


def test_oneway_blocks_tf_car(spark):
    r = run(spark, highway="residential", oneway="yes")
    assert r["access_car_ft"] and not r["access_car_tf"]
    # bicycle also blocked tf without contraflow infrastructure
    assert r["access_bicycle_ft"] and not r["access_bicycle_tf"]


def test_oneway_with_contraflow_cycleway(spark):
    r = run(
        spark, highway="residential", oneway="yes",
        tags={"cycleway": "opposite_lane"},
    )
    # normalized cycleway = 'opposite' -> tf allowed for bikes, not cars
    assert not r["access_car_tf"]
    assert r["access_bicycle_tf"]


def test_oneway_minus_one_is_opposite(spark):
    # oneway='-1' -> 'opposite': blocks ft instead of tf
    r = run(spark, highway="residential", oneway="-1")
    assert not r["access_car_ft"] and r["access_car_tf"]


def test_roundabout_blocks_tf(spark):
    r = run(spark, highway="residential", junction="roundabout")
    assert r["access_car_ft"] and not r["access_car_tf"]
    assert r["access_bicycle_ft"] and not r["access_bicycle_tf"]
    assert r["access_pedestrian_tf"]  # pedestrian unaffected


def test_motor_vehicle_forward_overrides_oneway(spark):
    # motor_vehicle:forward='yes' wins over oneway (first CASE branch)
    r = run(
        spark, highway="residential", oneway="-1",
        tags={"motor_vehicle:forward": "yes"},
    )
    assert r["access_car_ft"]


def test_access_no_blocks(spark):
    r = run(spark, highway="residential", access="no")
    assert not r["access_car_ft"] and not r["access_bicycle_ft"]
    assert not r["access_pedestrian_ft"]


def test_access_private_car_blocked_by_vocab(spark):
    r = run(spark, highway="residential", access="private")
    assert not r["access_car_ft"]
    assert not r["access_bicycle_ft"]  # private in bike access-no vocab too
    assert not r["access_pedestrian_ft"]


def test_footway_blocks_car_and_bike_allows_foot(spark):
    r = run(spark, highway="footway")
    assert not r["access_car_ft"]
    assert not r["access_bicycle_ft"]
    assert r["access_pedestrian_ft"]


def test_cycleway_blocks_car_and_foot(spark):
    r = run(spark, highway="cycleway")
    assert not r["access_car_ft"]
    assert r["access_bicycle_ft"]
    assert not r["access_pedestrian_ft"]


def test_bicycle_dismount_blocks(spark):
    r = run(spark, highway="residential", bicycle="dismount")
    assert not r["access_bicycle_ft"]


def test_sidewalk_yes_allows_pedestrian_on_motorroad(spark):
    # foot/footway/sidewalk 'yes' is the FIRST branch -> wins over highway
    r = run(spark, highway="motorway", tags={"sidewalk": "left"})
    # sidewalk normalized: 'left' not in no-list -> 'yes' -> allow
    assert r["access_pedestrian_ft"]


def test_motorway_blocks_pedestrian_and_bike(spark):
    r = run(spark, highway="motorway")
    assert not r["access_pedestrian_ft"]
    assert not r["access_bicycle_ft"]
    assert r["access_car_ft"]


def test_cycleway_left_question_mark_is_null(spark):
    # '?' treated as NULL (osm_attributes.sql.j2:198): no contraflow grant
    r = run(
        spark, highway="residential", oneway="yes",
        tags={"cycleway:left": "?"},
    )
    assert not r["access_bicycle_tf"]
