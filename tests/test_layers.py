"""Derived OSM layer builders (S7, core/import_step.py:432-532)."""

from netascore_spark.sources import fixtures, layers


def test_building_layer(spark):
    b = layers.building_layer(fixtures.osm_polygons(spark))
    assert b.count() == 2  # building IS NOT NULL regardless of value


def test_crossing_layer_union_all(spark):
    c = layers.crossing_layer(
        fixtures.osm_points(spark),
        fixtures.osm_lines(spark, scale=1).withColumnsRenamed({}),
        fixtures.osm_polygons(spark),
    )
    # 2 crossing points; the line fixture has no highway=crossing rows
    assert c.count() == 2


def test_facility_layer(spark):
    f = layers.facility_layer(fixtures.osm_points(spark), fixtures.osm_polygons(spark))
    # cafe, supermarket, museum points + university polygon ('parking' is not
    # in any facility vocabulary)
    assert f.count() == 4


def test_greenness_layer(spark):
    g = layers.greenness_layer(fixtures.osm_polygons(spark))
    assert g.count() == 2  # grass + park; industrial excluded


def test_water_layer(spark):
    w = layers.water_layer(
        fixtures.osm_lines(spark, scale=1), fixtures.osm_polygons(spark)
    )
    rows = w.collect()
    assert len(rows) == 1 and rows[0]["geom_type"] == "polygon"


def test_utmzone():
    # F6 (determine_utmzone.sql): Salzburg lon=13.05, lat=47.8 -> 33N
    from netascore_spark.functions.attributes import utmzone

    assert utmzone(13.05, 47.8) == 32633
    assert utmzone(-0.1, 51.5) == 32630   # London
    assert utmzone(151.2, -33.9) == 32756  # Sydney (south)
