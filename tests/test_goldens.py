"""Golden end-to-end parity (FIXTURES.md §7): the committed goldens pin the
full pipeline — network construction, the 33 attributes, both profile
indices, page tiling / PIP / nearest-edge joins — against refactors.
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

GOLDEN_DIR = "tests/goldens"


@pytest.fixture(scope="module")
def world(spark):
    from netascore_spark.pipeline import attributes as ATTR
    from netascore_spark.pipeline import network as N
    from netascore_spark.plans.profile import Profile, attach_index
    from netascore_spark.sources import fixtures

    osm = fixtures.osm_lines(spark, scale=1)
    edges, nodes = N.build_network(osm)
    edges = edges.localCheckpoint()
    nodes = nodes.localCheckpoint()
    layers = {
        "facility": fixtures.layer_points(spark, "facility"),
        "crossing": fixtures.layer_points(spark, "crossing"),
        "building": fixtures.layer_polygons(spark, "building"),
        "greenness": fixtures.layer_polygons(spark, "greenness"),
        "water": fixtures.water_layer(spark),
        "noise": fixtures.noise_layer(spark),
        "dem": fixtures.dem_grid(spark),
    }
    attrs, _ = ATTR.build_attributes(edges, nodes, osm, layers)
    bike = Profile.from_yaml("profiles/profile_bike.yml", "bike")
    walk = Profile.from_yaml("profiles/profile_walk.yml", "walk")
    scored = attach_index(attach_index(attrs.localCheckpoint(), bike), walk)
    return osm, edges, scored


def test_edges_match_golden(spark, world):
    osm, edges, scored = world
    golden = pd.read_csv(f"{GOLDEN_DIR}/golden_edges.csv")
    meta = edges.select(
        "edge_id", "osm_id", "seg_seq", "from_node", "to_node",
        F.round("length", 4).alias("length"),
    )
    now = meta.join(scored, "edge_id").orderBy("edge_id").toPandas()
    assert len(now) == len(golden)
    # identity columns exact
    for c in ["edge_id", "osm_id", "seg_seq", "from_node", "to_node"]:
        assert (now[c].values == golden[c].values).all(), c
    # numerics to 1e-9 (values already rounded per reference semantics)
    for c in ["length", "index_bike_ft", "index_bike_tf", "index_walk_ft",
              "index_walk_tf", "max_speed_ft", "gradient_ft", "facilities",
              "buildings", "greenness", "noise"]:
        a = now[c].astype(float).values
        b = golden[c].astype(float).values
        both = ~(np.isnan(a) | np.isnan(b))
        assert (np.isnan(a) == np.isnan(b)).all(), c
        assert np.allclose(a[both], b[both], atol=1e-9), c
    # categoricals exact
    for c in ["road_category", "pavement", "bicycle_infrastructure_ft",
              "designated_route_ft", "water"]:
        a = now[c].where(now[c].notna(), None)
        b = golden[c].where(golden[c].notna(), None)
        assert (a.values == b.values).all() or (
            (a.isna() == b.isna()).all() and (a.dropna().values == b.dropna().values).all()
        ), c


def test_page_joins_match_golden(spark, world):
    from netascore_spark.pipeline import pages as PG
    from netascore_spark.sources import fixtures

    _, edges, _ = world
    pg = PG.extract_pages(fixtures.pages(spark, n=500)).persist()
    cells = pg.select("url", "cell").orderBy("url").toPandas()
    gc = pd.read_csv(f"{GOLDEN_DIR}/golden_page_cells.csv")
    assert (cells["cell"].fillna(-1).values == gc["cell"].fillna(-1).values).all()

    pip = PG.join_polygons(pg, fixtures.admin_polygons(spark)).orderBy(
        "url", "polygon_id"
    ).toPandas()
    gp = pd.read_csv(f"{GOLDEN_DIR}/golden_page_polygons.csv")
    assert len(pip) == len(gp)
    assert (pip["polygon_id"].values == gp["polygon_id"].values).all()

    nn = PG.nearest_edges(pg, edges, k=1, radius=500.0).orderBy("url").toPandas()
    gn = pd.read_csv(f"{GOLDEN_DIR}/golden_page_edges.csv")
    assert len(nn) == len(gn)
    assert (nn["edge_id"].values == gn["edge_id"].values).all()
    assert np.allclose(nn["dist"].values, gn["dist"].values, atol=1e-6)
