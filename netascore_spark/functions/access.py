"""Mode access derivation as native Column expressions.

Ports the three plpgsql access functions to first-match-wins ``F.when``
cascades (whole-stage-codegen friendly, zero Python in the hot path):

- car:        ``sql/functions/osm_calculate_access_car.sql:19-50``
- bicycle:    ``sql/functions/osm_calculate_access_bicycle.sql:18-56``
- pedestrian: ``sql/functions/osm_calculate_access_pedestrian.sql:12-24``

plus the tag-normalization CASE tables that feed them
(``sql/templates/osm_attributes.sql.j2:32-118,149-220,251-281``).

Inputs are a DataFrame with the network_edge schema: top-level osm2pgsql
columns (access, oneway, junction, bicycle, foot, highway, ...) and a
``tags`` MapType(String, String) column (the hstore equivalent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netascore_spark.functions import vocab


def tag(name: str) -> Column:
    """hstore ``tags -> 'name'`` equivalent."""
    return F.col("tags").getItem(name)


def _norm_no_yes(col: Column, no_values: list[str]) -> Column:
    """``CASE WHEN x IS NULL THEN NULL WHEN x = ANY(no_values) THEN 'no' ELSE 'yes' END``."""
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col.isin(no_values), F.lit("no"))
        .otherwise(F.lit("yes"))
    )


def _norm_oneway(col: Column, opposite_values: list[str]) -> Column:
    """``NULL / 'no' / 'opposite' / 'yes'`` oneway normalization."""
    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(col == "no", F.lit("no"))
        .when(col.isin(opposite_values), F.lit("opposite"))
        .otherwise(F.lit("yes"))
    )


def _norm_roundabout() -> Column:
    # osm_attributes.sql.j2:70-74 (identical at :174-178)
    return (
        F.when(F.col("junction").isNull(), F.lit(None).cast("string"))
        .when(F.col("junction").isin(["roundabout"]), F.lit("yes"))
        .otherwise(F.lit("no"))
    )


# ---------------------------------------------------------------------------
# car (osm_attributes.sql.j2:32-118 + osm_calculate_access_car.sql)
# ---------------------------------------------------------------------------

def car_norm_columns() -> dict[str, Column]:
    return {
        "access": _norm_no_yes(F.col("access"), vocab.CAR_ACCESS_NO),
        "motor_vehicle_forward": _norm_no_yes(
            tag("motor_vehicle:forward"), vocab.MOTOR_VEHICLE_DIR_NO
        ),
        "motor_vehicle_backward": _norm_no_yes(
            tag("motor_vehicle:backward"), vocab.MOTOR_VEHICLE_DIR_NO
        ),
        "oneway": _norm_oneway(F.col("oneway"), vocab.ONEWAY_OPPOSITE),
        "oneway_motor_vehicle": _norm_oneway(
            tag("oneway:motor_vehicle"), vocab.ONEWAY_OPPOSITE
        ),
        "oneway_vehicle": _norm_oneway(tag("oneway:vehicle"), vocab.ONEWAY_OPPOSITE),
        "roundabout": _norm_roundabout(),
        "motor_vehicle": _norm_no_yes(tag("motor_vehicle"), vocab.MOTOR_VEHICLE_NO),
        "motorcar": _norm_no_yes(tag("motorcar"), vocab.MOTORCAR_NO),
        "vehicle_forward": _norm_no_yes(tag("vehicle:forward"), vocab.VEHICLE_FORWARD_NO),
        "vehicle_backward": _norm_no_yes(tag("vehicle:backward"), vocab.VEHICLE_BACKWARD_NO),
        "vehicle": _norm_no_yes(tag("vehicle"), vocab.VEHICLE_NO),
        "highway": _norm_no_yes(F.col("highway"), vocab.CAR_HIGHWAY_NO),
    }


def calculate_access_car(direction: str, c: dict[str, Column]) -> Column:
    """osm_calculate_access_car.sql:19-50 — returns 0/1 int Column."""
    mv_dir = c["motor_vehicle_forward"] if direction == "ft" else c["motor_vehicle_backward"]
    veh_dir = c["vehicle_forward"] if direction == "ft" else c["vehicle_backward"]
    if direction == "ft":
        oneway_block = (
            (c["oneway"] == "opposite")
            | (c["oneway_motor_vehicle"] == "opposite")
            | (c["oneway_vehicle"] == "opposite")
        )
        roundabout_block = F.lit(False)
    else:
        oneway_block = (
            (c["oneway"] == "yes")
            | (c["oneway_motor_vehicle"] == "yes")
            | (c["oneway_vehicle"] == "yes")
        )
        roundabout_block = c["roundabout"] == "yes"
    return (
        F.when(mv_dir == "yes", 1)
        .when(mv_dir == "no", 0)
        .when(oneway_block, 0)
        .when(roundabout_block, 0)
        .when((c["motor_vehicle"] == "yes") | (c["motorcar"] == "yes"), 1)
        .when((c["motor_vehicle"] == "no") | (c["motorcar"] == "no"), 0)
        .when(veh_dir == "no", 0)
        .when(c["vehicle"] == "no", 0)
        .when(c["access"] == "no", 0)
        .when((c["highway"] == "no") | c["highway"].isNull(), 0)
        .otherwise(1)
    )


# ---------------------------------------------------------------------------
# bicycle (osm_attributes.sql.j2:149-220 + osm_calculate_access_bicycle.sql)
# ---------------------------------------------------------------------------

def bicycle_norm_columns() -> dict[str, Column]:
    return {
        "access": _norm_no_yes(F.col("access"), vocab.BIKE_ACCESS_NO),
        "bicycle_forward": _norm_no_yes(tag("bicycle:forward"), vocab.BICYCLE_DIR_NO),
        "bicycle_backward": _norm_no_yes(tag("bicycle:backward"), vocab.BICYCLE_DIR_NO),
        "oneway_bicycle": _norm_oneway(
            tag("oneway:bicycle"), vocab.ONEWAY_BICYCLE_OPPOSITE
        ),
        "roundabout": _norm_roundabout(),
        "oneway": _norm_oneway(F.col("oneway"), vocab.BIKE_ONEWAY_OPPOSITE),
        "cycleway": (
            F.when(tag("cycleway").isNull(), F.lit(None).cast("string"))
            .when(tag("cycleway").isin(vocab.CYCLEWAY_NO), "no")
            .when(tag("cycleway").isin(vocab.CYCLEWAY_OPPOSITE), "opposite")
            .otherwise("yes")
        ),
        "cycleway_right": (
            F.when(tag("cycleway:right").isNull(), F.lit(None).cast("string"))
            .when(tag("cycleway:right").isin(vocab.CYCLEWAY_RIGHT_NO), "no")
            .when(tag("cycleway:right").isin(vocab.CYCLEWAY_RIGHT_OPPOSITE), "opposite")
            .otherwise("yes")
        ),
        # NB the reference treats cycleway:left='?' as NULL (osm_attributes.sql.j2:198)
        "cycleway_left": (
            F.when(
                tag("cycleway:left").isNull() | (tag("cycleway:left") == "?"),
                F.lit(None).cast("string"),
            )
            .when(tag("cycleway:left").isin(vocab.CYCLEWAY_LEFT_NO), "no")
            .when(tag("cycleway:left").isin(vocab.CYCLEWAY_LEFT_OPPOSITE), "opposite")
            .otherwise("yes")
        ),
        "cycleway_both": (
            F.when(tag("cycleway:both").isNull(), F.lit(None).cast("string"))
            .when(tag("cycleway:both") == "no", "no")
            .otherwise("yes")
        ),
        "bicycle": _norm_no_yes(F.col("bicycle"), vocab.BICYCLE_NO),
        "highway": _norm_no_yes(F.col("highway"), vocab.BIKE_HIGHWAY_NO),
    }


def _neq_or_null(col: Column, value: str) -> Column:
    """``(col != 'value' OR col IS NULL)`` — NULL-tolerant inequality."""
    return (col != value) | col.isNull()


def calculate_access_bicycle(direction: str, c: dict[str, Column]) -> Column:
    """osm_calculate_access_bicycle.sql:18-56 — returns 0/1 int Column."""
    bike_dir = c["bicycle_forward"] if direction == "ft" else c["bicycle_backward"]
    if direction == "ft":
        ob_block, ob_allow = c["oneway_bicycle"] == "opposite", c["oneway_bicycle"] == "yes"
        roundabout_block = F.lit(False)
        # oneway 'opposite' blocked unless contraflow cycleway infrastructure
        oneway_block = (
            (c["oneway"] == "opposite")
            & _neq_or_null(c["cycleway"], "yes")
            & _neq_or_null(c["cycleway_right"], "yes")
            & _neq_or_null(c["cycleway_left"], "opposite")
            & _neq_or_null(c["cycleway_both"], "yes")
        )
    else:
        ob_block, ob_allow = c["oneway_bicycle"] == "yes", c["oneway_bicycle"] == "opposite"
        roundabout_block = c["roundabout"] == "yes"
        oneway_block = (
            (c["oneway"] == "yes")
            & _neq_or_null(c["cycleway"], "opposite")
            & _neq_or_null(c["cycleway_right"], "opposite")
            & _neq_or_null(c["cycleway_left"], "yes")
            & _neq_or_null(c["cycleway_both"], "yes")
        )
    return (
        F.when(bike_dir == "no", 0)
        .when(bike_dir == "yes", 1)
        .when(ob_block, 0)
        .when(ob_allow, 1)
        .when(roundabout_block, 0)
        .when(oneway_block, 0)
        .when(c["bicycle"] == "no", 0)
        .when(c["bicycle"] == "yes", 1)
        .when(c["access"] == "no", 0)
        .when((c["highway"] == "no") | c["highway"].isNull(), 0)
        .otherwise(1)
    )


# ---------------------------------------------------------------------------
# pedestrian (osm_attributes.sql.j2:251-281 + osm_calculate_access_pedestrian.sql)
# ---------------------------------------------------------------------------

def pedestrian_norm_columns() -> dict[str, Column]:
    return {
        "access": _norm_no_yes(F.col("access"), vocab.PED_ACCESS_NO),
        "foot": _norm_no_yes(F.col("foot"), vocab.FOOT_NO),
        "footway": _norm_no_yes(tag("footway"), vocab.FOOTWAY_NO),
        "sidewalk": _norm_no_yes(tag("sidewalk"), vocab.SIDEWALK_NO),
        "highway": _norm_no_yes(F.col("highway"), vocab.PED_HIGHWAY_NO),
    }


def calculate_access_pedestrian(c: dict[str, Column]) -> Column:
    """osm_calculate_access_pedestrian.sql:12-24 — returns 0/1 int Column.

    Direction-independent (the reference computes ft == tf,
    osm_attributes.sql.j2:291-292).
    """
    return (
        F.when((c["foot"] == "yes") | (c["footway"] == "yes") | (c["sidewalk"] == "yes"), 1)
        .when((c["foot"] == "no") | (c["footway"] == "no"), 0)
        .when(c["access"] == "no", 0)
        .when((c["highway"] == "no") | c["highway"].isNull(), 0)
        .otherwise(1)
    )


# ---------------------------------------------------------------------------
# DataFrame-level entry: attach all six access booleans in one pass
# ---------------------------------------------------------------------------

def with_access_columns(edges: DataFrame) -> DataFrame:
    """Adds access_{car,bicycle,pedestrian}_{ft,tf} boolean columns.

    One logical plan (no copy-on-write table cycle as in the reference's
    osm_attributes.sql.j2:125-300) — Catalyst fuses all cascades into a
    single whole-stage-codegen projection.
    """
    car = car_norm_columns()
    bike = bicycle_norm_columns()
    ped = pedestrian_norm_columns()
    ped_access = calculate_access_pedestrian(ped).cast("boolean")
    # single withColumns call: one analyzer pass instead of six
    return edges.withColumns(
        {
            "access_car_ft": calculate_access_car("ft", car).cast("boolean"),
            "access_car_tf": calculate_access_car("tf", car).cast("boolean"),
            "access_bicycle_ft": calculate_access_bicycle("ft", bike).cast("boolean"),
            "access_bicycle_tf": calculate_access_bicycle("tf", bike).cast("boolean"),
            "access_pedestrian_ft": ped_access,
            "access_pedestrian_tf": ped_access,
        }
    )
