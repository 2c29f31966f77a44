"""Unit tests for the YAML profile -> Column compiler.

Expected values hand-computed from the reference formula
(sql/functions/calculate_index.sql.j2:59-108 + examples/profile_bike.yml /
profile_walk.yml).
"""

import pytest

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark.plans.profile import (
    INDICATORS,
    Profile,
    attach_index,
    compile_mapping,
)

PROFILE_DIR = "profiles"


ATTR_FIELDS = [
    ("edge_id", T.LongType()),
    ("access_car_ft", T.BooleanType()),
    ("access_car_tf", T.BooleanType()),
    ("access_bicycle_ft", T.BooleanType()),
    ("access_bicycle_tf", T.BooleanType()),
    ("access_pedestrian_ft", T.BooleanType()),
    ("access_pedestrian_tf", T.BooleanType()),
    ("bicycle_infrastructure_ft", T.StringType()),
    ("bicycle_infrastructure_tf", T.StringType()),
    ("pedestrian_infrastructure_ft", T.StringType()),
    ("pedestrian_infrastructure_tf", T.StringType()),
    ("designated_route_ft", T.StringType()),
    ("designated_route_tf", T.StringType()),
    ("road_category", T.StringType()),
    ("max_speed_ft", T.DoubleType()),
    ("max_speed_tf", T.DoubleType()),
    ("max_speed_greatest", T.DoubleType()),
    ("parking_ft", T.StringType()),
    ("parking_tf", T.StringType()),
    ("pavement", T.StringType()),
    ("width", T.DoubleType()),
    ("gradient_ft", T.DoubleType()),
    ("gradient_tf", T.DoubleType()),
    ("number_lanes_ft", T.DoubleType()),
    ("number_lanes_tf", T.DoubleType()),
    ("facilities", T.DoubleType()),
    ("crossings", T.DoubleType()),
    ("buildings", T.DoubleType()),
    ("greenness", T.DoubleType()),
    ("water", T.BooleanType()),
    ("noise", T.DoubleType()),
]
SCHEMA = T.StructType([T.StructField(n, t, True) for n, t in ATTR_FIELDS])


def make_edge(spark, **kv):
    base = {n: None for n, _ in ATTR_FIELDS}
    base.update(
        edge_id=1,
        access_car_ft=True, access_car_tf=True,
        access_bicycle_ft=True, access_bicycle_tf=True,
        access_pedestrian_ft=True, access_pedestrian_tf=True,
    )
    base.update(kv)
    return spark.createDataFrame([Row(**base)], schema=SCHEMA)


@pytest.fixture(scope="module")
def bike():
    return Profile.from_yaml(f"{PROFILE_DIR}/profile_bike.yml", "bike")


@pytest.fixture(scope="module")
def walk():
    return Profile.from_yaml(f"{PROFILE_DIR}/profile_walk.yml", "walk")


def one(df):
    return df.collect()[0]


def test_bike_basic(spark, bike):
    df = make_edge(
        spark,
        bicycle_infrastructure_ft="bicycle_lane",
        bicycle_infrastructure_tf="bicycle_lane",
        designated_route_ft="no", designated_route_tf="no",
        road_category="residential",
        max_speed_ft=30.0, max_speed_tf=30.0,
        pavement="asphalt",
        gradient_ft=2.0, gradient_tf=-2.0,
    )
    r = one(attach_index(df, bike))
    # weights_sum = .2+.1+.3+.1+.1+.1 = 0.9 (parking NULL value)
    # ft contributions: .75*.2 + 0*.1 + .8*.3 + .85*.1 + 1*.1 + .4*.1 = .615
    assert r["index_bike_ft"] == pytest.approx(0.6833, abs=1e-9)
    assert r["index_bike_ft_robustness"] == pytest.approx(0.9, abs=1e-9)
    # tf gradient -2 -> 0.95: .615 + (.095-.04) = .670
    assert r["index_bike_tf"] == pytest.approx(0.7444, abs=1e-9)


def test_bike_weight_override(spark, bike):
    # steep + loose surface boosts pavement & gradient weights to 1.6
    df = make_edge(
        spark,
        bicycle_infrastructure_ft="no", bicycle_infrastructure_tf="no",
        designated_route_ft="no", designated_route_tf="no",
        road_category="residential",
        max_speed_ft=50.0, max_speed_tf=50.0,
        pavement="gravel",
        gradient_ft=4.0, gradient_tf=-4.0,
    )
    r = one(attach_index(df, bike))
    # weights_total = .2+.1+.3+.1+.1+1.6+1.6 = 4.0
    # weights_sum   = .2+.1+.3+.1+1.6+1.6 = 3.9
    # index_ft = (0*.2 + 0*.1 + .8*.3 + .6*.1 + .75*1.6 + 0*1.6)/3.9 = 1.5/3.9
    assert r["index_bike_ft"] == pytest.approx(round(1.5 / 3.9, 4), abs=1e-9)
    assert r["index_bike_ft_robustness"] == pytest.approx(0.975, abs=1e-9)


def test_bike_no_override_when_gradient_mild(spark, bike):
    # gravel but flat: override mapping "{-4,-3,3,4}" does not match -> -1
    df = make_edge(
        spark,
        bicycle_infrastructure_ft="no", bicycle_infrastructure_tf="no",
        designated_route_ft="no", designated_route_tf="no",
        road_category="residential",
        max_speed_ft=50.0, max_speed_tf=50.0,
        pavement="gravel",
        gradient_ft=0.0, gradient_tf=0.0,
    )
    r = one(attach_index(df, bike))
    # weights_sum = .2+.1+.3+.1+.1+.1 = 0.9
    # index = (0 + 0 + .24 + .06 + .75*.1 + .9*.1)/0.9 = .465/.9
    assert r["index_bike_ft"] == pytest.approx(round(0.465 / 0.9, 4), abs=1e-9)


def test_walk_index_override(spark, walk):
    # sidewalk on primary road -> forced index 0.2, robustness NULL
    df = make_edge(
        spark,
        pedestrian_infrastructure_ft="sidewalk",
        pedestrian_infrastructure_tf="sidewalk",
        road_category="primary",
        max_speed_greatest=50.0,
        gradient_ft=0.0, gradient_tf=0.0,
        number_lanes_ft=2.0, number_lanes_tf=2.0,
        facilities=0.0, crossings=0.0, buildings=0.0, greenness=0.0,
        water=False, noise=50.0,
    )
    r = one(attach_index(df, walk))
    assert r["index_walk_ft"] == pytest.approx(0.2, abs=1e-9)
    assert r["index_walk_ft_robustness"] is None


def test_walk_nested_crossings(spark, walk):
    # crossings == 0 defers to road_category ('residential' -> 0.5)
    df = make_edge(
        spark,
        pedestrian_infrastructure_ft="pedestrian_way",
        pedestrian_infrastructure_tf="pedestrian_way",
        road_category="residential",
        max_speed_greatest=30.0,
        gradient_ft=0.0, gradient_tf=0.0,
        number_lanes_ft=1.0, number_lanes_tf=1.0,
        facilities=2.0, crossings=0.0, buildings=10.0, greenness=80.0,
        water=True, noise=50.0,
    )
    r = one(attach_index(df, walk))
    # weights: pi .4, rc .3, msg .3, gradient .3, lanes .1, fac .3, cross .2,
    # build .1, green .3, water .4, noise .3 -> total = 3.0, all values set
    # scores: pi 1, rc .8, msg .85, grad 1, lanes 1 (ge0 branch: g1 is
    # strictly >1), fac 1, cross .5 (nested), build .8, green 1, water 1,
    # noise .8
    expected = (
        1 * 0.4 + 0.8 * 0.3 + 0.85 * 0.3 + 1 * 0.3 + 1 * 0.1 + 1 * 0.3
        + 0.5 * 0.2 + 0.8 * 0.1 + 1 * 0.3 + 1 * 0.4 + 0.8 * 0.3
    ) / 3.0
    assert r["index_walk_ft"] == pytest.approx(round(expected, 4), abs=1e-9)
    assert r["index_walk_ft_robustness"] == pytest.approx(1.0, abs=1e-9)


def test_access_filter_nulls(spark, bike):
    df = make_edge(
        spark,
        access_car_ft=False, access_car_tf=False,
        access_bicycle_ft=False, access_bicycle_tf=False,
        access_pedestrian_ft=False, access_pedestrian_tf=False,
        road_category="residential",
    )
    r = one(attach_index(df, bike))
    assert r["index_bike_ft"] is None
    assert r["index_bike_ft_robustness"] is None


def test_weights_sum_zero_gives_null_index(spark, bike):
    df = make_edge(spark)  # all indicator values NULL
    r = one(attach_index(df, bike))
    assert r["index_bike_ft"] is None
    assert r["index_bike_ft_robustness"] == pytest.approx(0.0, abs=1e-9)


def test_unmapped_value_poisons_index(spark, bike):
    # 'mystery' is not in the bike road_category mapping -> NULL score ->
    # NULL index (plpgsql NULL propagation, SURVEY §2.12.4)
    df = make_edge(spark, road_category="mystery", pavement="asphalt")
    r = one(attach_index(df, bike))
    assert r["index_bike_ft"] is None
    # robustness unaffected: weights_sum = .3+.1 = .4, total = 1.0
    assert r["index_bike_ft_robustness"] == pytest.approx(0.4, abs=1e-9)


def test_class_ops(spark):
    # every class operator: g/ge/l/le/e/ne
    p = Profile(
        name="t",
        weights={**{i: None for i in INDICATORS}, "noise": 1.0},
        indicator_mapping=[
            {"indicator": "noise", "classes": {"g70": 0.0, "ge55": 0.25, "l10": 1.0, "le20": 0.9, "e30": 0.8, "ne31": 0.5}}
        ],
    )
    rows = []
    for noise, expected in [
        (71.0, 0.0), (70.0, 0.25), (55.0, 0.25), (5.0, 1.0), (15.0, 0.9),
        (30.0, 0.8), (31.0, None), (40.0, 0.5),
    ]:
        rows.append((noise, expected))
    for noise, expected in rows:
        df = make_edge(spark, noise=noise)
        r = one(attach_index(df, p))
        if expected is None:
            assert r["index_t_ft"] is None, f"noise={noise}"
        else:
            assert r["index_t_ft"] == pytest.approx(expected, abs=1e-9), f"noise={noise}"


def test_explanation_json(spark, bike):
    df = make_edge(
        spark,
        bicycle_infrastructure_ft="bicycle_way",
        bicycle_infrastructure_tf="bicycle_way",
        road_category="residential",
    )
    r = one(attach_index(df, bike, compute_explanation=True))
    import json

    exp = json.loads(r["index_bike_ft_explanation"])
    # contributions: bi 1*(0.2/0.5)=0.4, rc 0.8*(0.3/0.5)=0.48 -> rc first
    assert list(exp.keys()) == ["road_category", "bicycle_infrastructure"]
    assert exp["road_category"] == pytest.approx(0.48, abs=1e-9)
    assert exp["bicycle_infrastructure"] == pytest.approx(0.4, abs=1e-9)


def test_explanation_json_null_entry_sorts_first(spark, bike):
    # calculate_index.sql.j2:113 `ORDER BY weight DESC, indicator`: Postgres
    # DESC is NULLS FIRST, so an indicator whose score CASE fell through
    # (NULL contribution, here the unmapped road_category) must LEAD the
    # JSON object with a null value, before every real contribution.
    df = make_edge(
        spark,
        bicycle_infrastructure_ft="bicycle_way",
        bicycle_infrastructure_tf="bicycle_way",
        road_category="mystery",
    )
    r = one(attach_index(df, bike, compute_explanation=True))
    import json

    assert r["index_bike_ft"] is None  # NULL score poisons the index
    exp = json.loads(r["index_bike_ft_explanation"])
    assert list(exp.keys()) == ["road_category", "bicycle_infrastructure"]
    assert exp["road_category"] is None
    assert exp["bicycle_infrastructure"] == pytest.approx(0.4, abs=1e-9)


def test_compile_mapping_null_key_and_default(spark):
    resolve = lambda name: F.col(name)
    df = spark.createDataFrame(
        [(None,), ("primary",), ("other",)], T.StructType([T.StructField("road_category", T.StringType(), True)])
    )
    col = compile_mapping(
        {"indicator": "road_category", "mapping": {None: 0.1, "primary": 0.5, "_default_": 0.9}},
        resolve,
    )
    vals = [r[0] for r in df.select(col).collect()]
    assert vals == [0.1, 0.5, 0.9]
