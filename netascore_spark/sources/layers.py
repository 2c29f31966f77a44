"""Derived OSM layers (S7/S8): building, crossing, facility, greenness,
water — built from osm_point / osm_line / osm_polygon via tag filters.

Transcribed verbatim from ``core/import_step.py:432-532`` (value lists
including the reference's quirks: the polygon branch's missing comma
``'internet_cafe' 'supermarket'`` concatenates to one SQL string —
reproduced as ``internet_cafesupermarket`` — and the ``nature_reseve``
typo).  Geometry travels as WKB; ST_Transform is a no-op here because
fixtures are already planar (the projection hook is the sources' concern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FACILITY_ENTERTAINMENT = [
    "arts_centre", "artwork", "attraction", "bar", "biergarten", "cafe",
    "castle", "cinema", "community_centre", "library", "museum",
    "music_venue", "park", "pub", "public_bookcase", "restaurant",
    "swimming_pool", "theatre", "toy_library", "viewpoint", "public_bath",
]
FACILITY_RETAIL = [
    "atm", "bureau_de_change", "bakery", "beverages", "butcher", "clothes",
    "department_store", "fast_food", "marketplace", "florist", "food_court",
    "furniture_shop", "ice_cream", "kiosk", "mall", "outdoor_shop",
    "pharmacy", "shoe_shop", "sports_shop", "internet_cafe", "supermarket",
    "commercial", "retail", "shop", "bicycle_rental", "boat_rental",
    "car_rental", "bank",
]
# polygon branch: the reference's missing comma fuses two values
# (core/import_step.py:487) — reproduced for row parity
FACILITY_RETAIL_POLY = [
    v for v in FACILITY_RETAIL if v not in ("internet_cafe", "supermarket")
] + ["internet_cafesupermarket"]
FACILITY_INSTITUTIONAL = [
    "university", "school", "college", "gymnasium", "kindergarten",
    "childcare", "boarding_school", "music_school", "riding_school",
    "driving_school", "language_school", "research_institute",
    "school;dormitory", "training", "place_of_worship", "conference_centre",
    "events_venue", "exhibition_centre", "social_centre", "courthouse",
    "post_office", "ranger_station", "townhall",
]
FACILITY_INFRASTRUCTURE = [
    "post_box", "bbq", "bench", "drinking_water", "give_box", "shelter",
    "toilets", "water_point", "watering_place", "waste_basket", "clock",
    "kneipp_water_cure", "lounger", "vending_machine",
]
FACILITY_TOURISM = ["museum", "attraction", "gallery", "viewpoint", "zoo"]

GREEN_LANDUSE = [
    "forest", "grass", "meadow", "village_green", "recreation_ground",
    "vineyard", "flowerbed", "farmland", "heath", "nature_reseve",  # sic
    "park", "greenfield",
]
GREEN_LEISURE = ["garden", "golf_course", "park"]
GREEN_NATURAL = ["tree", "wood", "grassland", "heath", "scrub"]


def _facility_cond(poly: bool = False) -> Column:
    retail = FACILITY_RETAIL_POLY if poly else FACILITY_RETAIL
    return (
        F.col("amenity").isin(FACILITY_ENTERTAINMENT)
        | F.col("amenity").isin(retail)
        | F.col("amenity").isin(FACILITY_INSTITUTIONAL)
        | F.col("amenity").isin(FACILITY_INFRASTRUCTURE)
        | F.col("tourism").isin(FACILITY_TOURISM)
    )


def _sel(df: DataFrame, src: str, keep_source: bool):
    """geom (+ optional (src, osm_id) lineage for scalable id assignment:
    node/way id namespaces overlap, so the branch tag disambiguates)."""
    cols = [F.col("way").alias("geom")]
    if keep_source:
        cols = [F.lit(src).alias("src"), F.col("osm_id")] + cols
    return df.select(*cols)


def building_layer(osm_polygon: DataFrame, keep_source: bool = False) -> DataFrame:
    """core/import_step.py:434-441."""
    return _sel(
        osm_polygon.filter(F.col("building").isNotNull()), "polygon", keep_source
    )


def crossing_layer(
    osm_point: DataFrame, osm_line: DataFrame, osm_polygon: DataFrame,
    keep_source: bool = False,
) -> DataFrame:
    """core/import_step.py:449-456 — point ∪ line ∪ polygon crossings (U1)."""
    cond = F.col("highway").isin(["crossing"])
    return (
        _sel(osm_point.filter(cond), "point", keep_source)
        .unionByName(_sel(osm_line.filter(cond), "line", keep_source))
        .unionByName(_sel(osm_polygon.filter(cond), "polygon", keep_source))
    )


def facility_layer(
    osm_point: DataFrame, osm_polygon: DataFrame, keep_source: bool = False
) -> DataFrame:
    """core/import_step.py:464-497."""
    pts = _sel(osm_point.filter(_facility_cond(False)), "point", keep_source)
    polys = _sel(osm_polygon.filter(_facility_cond(True)), "polygon", keep_source)
    return pts.unionByName(polys)


def greenness_layer(osm_polygon: DataFrame, keep_source: bool = False) -> DataFrame:
    """core/import_step.py:505-514."""
    return _sel(
        osm_polygon.filter(
            F.col("landuse").isin(GREEN_LANDUSE)
            | F.col("leisure").isin(GREEN_LEISURE)
            | F.col("natural").isin(GREEN_NATURAL)
        ),
        "polygon",
        keep_source,
    )


def water_layer(
    osm_line: DataFrame, osm_polygon: DataFrame, keep_source: bool = False
) -> DataFrame:
    """core/import_step.py:522-528 — line ∪ polygon, tunnels excluded."""
    cond = (F.col("waterway").isNotNull() | (F.col("natural") == "water")) & F.col(
        "tunnel"
    ).isNull()
    lines = _sel(osm_line.filter(cond), "line", keep_source).withColumn(
        "geom_type", F.lit("line")
    )
    polys = _sel(osm_polygon.filter(cond), "polygon", keep_source).withColumn(
        "geom_type", F.lit("polygon")
    )
    return lines.unionByName(polys)
