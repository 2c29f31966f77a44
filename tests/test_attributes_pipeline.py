"""Attributes stage end-to-end over the fixture micro-city (J4-J10, A2-A5)."""

import pytest

from pyspark.sql import functions as F

from netascore_spark.pipeline import attributes as ATTR
from netascore_spark.pipeline import network as N
from netascore_spark.plans.profile import Profile, attach_index
from netascore_spark.sources import fixtures


@pytest.fixture(scope="module")
def world(spark):
    osm = fixtures.osm_lines(spark, scale=1)
    edges, nodes = N.build_network(osm)
    layers = {
        "facility": fixtures.layer_points(spark, "facility"),
        "crossing": fixtures.layer_points(spark, "crossing"),
        "building": fixtures.layer_polygons(spark, "building"),
        "greenness": fixtures.layer_polygons(spark, "greenness"),
        "water": fixtures.water_layer(spark),
        "noise": fixtures.noise_layer(spark),
        "dem": fixtures.dem_grid(spark),
    }
    attrs, node_attrs = ATTR.build_attributes(edges, nodes, osm, layers)
    attrs.persist().count()
    return osm, edges, nodes, attrs, node_attrs


def amap(attrs, name):
    return {r["edge_id"]: r[name] for r in attrs.collect()}


def edge_by_name(edges, name):
    return edges.filter(F.col("name") == name)


def test_schema_has_all_33_columns(world):
    *_, attrs, _ = world
    assert set(attrs.columns) == {"edge_id", *ATTR.ATTRIBUTE_COLUMNS}


def test_designated_route_priority(spark, world):
    osm, edges, nodes, attrs, _ = world
    # H0 pieces within x in [0,200] are contained by the icn route line
    # (routes k=0: [0,200] icn), [100,300] ncn overlaps partially ->
    # priority pick must yield 'international' where both cover.
    h0 = edge_by_name(edges, "H0").select("edge_id", "geom").collect()
    joined = attrs.join(
        edge_by_name(edges, "H0").select("edge_id"), "edge_id"
    ).select("edge_id", "designated_route_ft").collect()
    vals = {r["designated_route_ft"] for r in joined}
    assert "international" in vals
    # far pieces of H0 (x > 600) have no route -> 'no'
    assert "no" in vals


def test_elevation_and_gradient(spark, world):
    osm, edges, nodes, attrs, node_attrs = world
    # DEM ramp: 2% west-east on the grid -> horizontal edges gradient class 1
    # (1.5 <= 2 < 3), vertical edges 0; tf = -ft
    both = attrs.join(
        edges.select("edge_id", "name", "from_node", "to_node"), "edge_id"
    )
    h2 = both.filter(F.col("name") == "H2").select("gradient_ft", "gradient_tf").collect()
    assert len(h2) > 0
    for r in h2:
        # _tf is always the negated class (osm_attributes.sql.j2:803-804)
        assert r["gradient_tf"] == -r["gradient_ft"]
    # west of the hill the 2% ramp dominates -> positive classes; east of the
    # hill the downslope beats the ramp -> zero/negative classes occur too
    vals = {r["gradient_ft"] for r in h2}
    assert any(v >= 1 for v in vals) and any(v <= 0 for v in vals)
    v1 = both.filter(F.col("name") == "V1").select("gradient_ft").collect()
    for r in v1:
        assert abs(r["gradient_ft"]) <= 1.0  # flat-ish north-south at x=100


def test_bridge_edges_have_no_gradient(spark, world):
    _, edges, _, attrs, _ = world
    b = attrs.join(edges.filter(F.col("name") == "bridge-way").select("edge_id"), "edge_id")
    r = b.collect()[0]
    assert r["bridge"] is True
    assert r["gradient_ft"] is None


def test_facility_threshold(spark, world):
    _, edges, _, attrs, _ = world
    # facility points at 5 m and 25 m of H0 count (<=30), at 35 m not.
    h0 = attrs.join(edge_by_name(edges, "H0").select("edge_id"), "edge_id")
    vals = [r["facilities"] for r in h0.collect()]
    assert any(v > 0 for v in vals)
    # crossings use 10 m: only the 5 m point counts -> strictly fewer hits
    c = [r["crossings"] for r in h0.collect()]
    assert sum(v > 0 for v in c) <= sum(v > 0 for v in vals)


def test_building_ratio_bounds(spark, world):
    *_, attrs, _ = world
    rows = attrs.select("buildings").collect()
    assert all(0.0 <= r["buildings"] <= 100.0 for r in rows)
    assert any(r["buildings"] > 0 for r in rows)


def test_water_line_branch(spark, world):
    _, edges, _, attrs, _ = world
    # river parallel 10 m south of H0: inside 30 m buffer, ratio ~1.0 -> water
    h0 = attrs.join(edge_by_name(edges, "H0").select("edge_id"), "edge_id")
    assert any(r["water"] for r in h0.collect())
    # far north edges: no water
    h7 = attrs.join(edge_by_name(edges, "H7").select("edge_id"), "edge_id")
    assert not any(r["water"] for r in h7.collect())


def test_noise_weighted_sum(spark, world):
    _, edges, _, attrs, _ = world
    # H0 spans two noise polygons (70 dB x<350, 55 dB x>350): pieces fully
    # inside one polygon get that value; the piece crossing x=350 gets a mix
    h0 = attrs.join(edge_by_name(edges, "H0").select("edge_id"), "edge_id")
    vals = sorted(r["noise"] for r in h0.collect())
    assert vals[0] >= 55.0 - 1e-9 and vals[-1] <= 70.0 + 1e-9
    assert 70.0 in vals and 55.0 in vals


def test_full_scoring_end_to_end(spark, world):
    osm, edges, nodes, attrs, _ = world
    bike = Profile.from_yaml("profiles/profile_bike.yml", "bike")
    walk = Profile.from_yaml("profiles/profile_walk.yml", "walk")
    scored = attach_index(attach_index(attrs, bike), walk)
    rows = scored.collect()
    n_scored = sum(1 for r in rows if r["index_bike_ft"] is not None)
    assert n_scored > len(rows) * 0.5
    for r in rows:
        for c in ("index_bike_ft", "index_bike_tf", "index_walk_ft", "index_walk_tf"):
            if r[c] is not None:
                assert 0.0 <= r[c] <= 1.0, (r["edge_id"], c, r[c])


def test_candidate_pairs_dedup_flag_equivalence(spark, world):
    """Round-6: dedup=False may emit a pair once per shared cell; the
    DISTINCT pair set must equal the dedup=True output exactly (the
    overlay consumers rely on this — their folds absorb duplicates)."""
    from netascore_spark.operators import spatial

    osm, edges, nodes, attrs, _ = world
    buffers = edges.select(
        "edge_id", spatial.buffer_udf(30.0, "flat")(F.col("geom")).alias("geom")
    )
    polys = fixtures.layer_polygons(spark, "greenness").select("greenness_id", "geom")
    strict = spatial.candidate_pairs(
        buffers, polys, "edge_id", "greenness_id", cell_size=200.0
    ).select("edge_id", "greenness_id")
    loose = spatial.candidate_pairs(
        buffers, polys, "edge_id", "greenness_id", cell_size=200.0, dedup=False
    ).select("edge_id", "greenness_id")
    a = {(r[0], r[1]) for r in strict.collect()}
    b = {(r[0], r[1]) for r in loose.collect()}
    assert a == b and len(a) > 0
