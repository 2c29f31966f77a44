"""GIP path: access bit decode (P9) + the three array-loop indicator
functions (F7-F9) as native Column expressions.

The plpgsql originals loop over ``;``-split parallel arrays, append a
priority code per element (first-matching branch), and pick the minimum
priority (sql/functions/gip_calculate_*.sql).  Here: ``arrays_zip`` +
``transform`` when-cascade + ``array_min`` — no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# access bit decode (gip_network.sql.j2:47-48, gip_attributes.sql.j2:42-47)
# ---------------------------------------------------------------------------

def any_vehicle_access(access_tow: Column, access_bkw: Column) -> Column:
    """``(access_tow::bit(8) | access_bkw::bit(8) & '00000111') > 0``.

    NB Postgres precedence: & binds tighter than |, so this is
    tow | (bkw & 7) — reproduced faithfully."""
    return (
        access_tow.cast("int").bitwiseOR(access_bkw.cast("int").bitwiseAND(F.lit(7)))
        > 0
    )


def access_bit(access: Column, bit: int) -> Column:
    """``get_bit(access::bit(8), k)`` — Postgres bit(8) numbers bits from the
    MSB, so get_bit(x, 5/6/7) reads value bits 2/1/0 (car/bike/pedestrian)."""
    return F.shiftright(access.cast("int"), 7 - bit).bitwiseAND(F.lit(1)) == 1


def gip_access_columns(access_tow: Column, access_bkw: Column) -> dict[str, Column]:
    """gip_attributes.sql.j2:42-47: 6 direction x mode booleans."""
    return {
        "access_car_ft": access_bit(access_tow, 5),
        "access_car_tf": access_bit(access_bkw, 5),
        "access_bicycle_ft": access_bit(access_tow, 6),
        "access_bicycle_tf": access_bit(access_bkw, 6),
        "access_pedestrian_ft": access_bit(access_tow, 7),
        "access_pedestrian_tf": access_bit(access_bkw, 7),
    }


# ---------------------------------------------------------------------------
# F7: calculate_bicycle_infrastructure(basetype, bikefeature)
# ---------------------------------------------------------------------------

def _min_code(codes: Column) -> Column:
    return F.array_min(F.filter(codes, lambda c: c.isNotNull()))


def gip_bicycle_infrastructure(basetype: Column, bikefeature: Column) -> Column:
    """gip_calculate_bicycle_infrastructure.sql:1-43."""
    empty = F.array().cast("array<string>")
    zipped = F.arrays_zip(
        F.split(basetype, ";").alias("bt"),
        F.coalesce(F.split(bikefeature, ";"), empty).alias("bf"),
    )
    codes = F.transform(
        zipped,
        lambda e: (
            F.when(e["bf"].isin(["RW", "RWO"]), 1)
            .when(
                e["bf"].isin(["GRW_T", "GRW_TO", "GRW_M", "GRW_MO"]) & (e["bt"] != "7"),
                2,
            )
            .when(e["bf"].isin(["MZSTR", "RF"]), 3)
            .when(e["bf"].isin(["BS"]), 4)
        ),
    )
    best = _min_code(codes)
    named = (
        F.when(best == 1, "bicycle_way")
        .when(best == 2, "mixed_way")
        .when(best == 3, "bicycle_lane")
        .when(best == 4, "bus_lane")
        .otherwise("no")
    )
    return F.when(basetype.isNotNull(), named)  # NULL basetype -> NULL


# ---------------------------------------------------------------------------
# F8: calculate_pedestrian_infrastructure(basetype, bikefeature, formofway,
#     access_pedestrian)
# ---------------------------------------------------------------------------

def gip_pedestrian_infrastructure(
    basetype: Column,
    bikefeature: Column,
    formofway: Column,
    access_pedestrian: Column,
) -> Column:
    """gip_calculate_pedestrian_infrastructure.sql:1-43."""
    empty = F.array().cast("array<string>")
    zipped = F.arrays_zip(
        F.split(basetype, ";").alias("bt"),
        F.coalesce(F.split(bikefeature, ";"), empty).alias("bf"),
    )
    ped = F.coalesce(access_pedestrian, F.lit(False))
    codes = F.transform(
        zipped,
        lambda e: (
            F.when((formofway == 14) & e["bt"].isin(["1", "7"]), 1)
            .when(e["bt"] == "7", 2)
            .when((e["bt"] != "7") & e["bf"].isin(["GRW_M", "GRW_MO"]) & ped, 3)
            .when(e["bt"].isin(["6", "13", "24", "25", "42"]), 4)
            .when(ped & (e["bt"] == "1"), 5)
        ),
    )
    best = _min_code(codes)
    named = (
        F.when(best == 1, "pedestrian_area")
        .when(best == 2, "pedestrian_way")
        .when(best == 3, "mixed_way")
        .when(best == 4, "stairs")
        .when(best == 5, "sidewalk")
        .otherwise("no")
    )
    return F.when(basetype.isNotNull(), named)


# ---------------------------------------------------------------------------
# F9: calculate_road_category(6 access/class args, basetype, bikefeatures)
# ---------------------------------------------------------------------------

def gip_road_category(
    access_car_ft: Column,
    access_car_tf: Column,
    access_bicycle_ft: Column,
    access_bicycle_tf: Column,
    funcroadclass: Column,
    streetcat: Column,
    basetype: Column,
    bikefeaturetow: Column,
    bikefeaturebkw: Column,
) -> Column:
    """gip_calculate_road_category.sql:1-64."""
    empty = F.array().cast("array<string>")
    zipped = F.arrays_zip(
        F.split(basetype, ";").alias("bt"),
        F.coalesce(F.split(bikefeaturetow, ";"), empty).alias("ft"),
        F.coalesce(F.split(bikefeaturebkw, ";"), empty).alias("fb"),
    )
    car = F.coalesce(access_car_ft, F.lit(False)) | F.coalesce(access_car_tf, F.lit(False))
    bike = F.coalesce(access_bicycle_ft, F.lit(False)) | F.coalesce(
        access_bicycle_tf, F.lit(False)
    )
    car_false = access_car_ft.eqNullSafe(F.lit(False)) & access_car_tf.eqNullSafe(
        F.lit(False)
    )
    bike_false = access_bicycle_ft.eqNullSafe(F.lit(False)) & access_bicycle_tf.eqNullSafe(
        F.lit(False)
    )

    def not_special(e):
        # (tow <> 'VK_BE' AND bkw <> 'VK_BE' AND tow <> 'FRS' AND bkw <> 'FRS')
        # — plpgsql NULL-falsy semantics preserved by plain != chains
        return (
            (e["ft"] != "VK_BE") & (e["fb"] != "VK_BE")
            & (e["ft"] != "FRS") & (e["fb"] != "FRS")
        )

    def special(e):
        return (
            (e["ft"] == "VK_BE") | (e["fb"] == "VK_BE")
            | (e["ft"] == "FRS") | (e["fb"] == "FRS")
        )

    codes = F.transform(
        zipped,
        lambda e: (
            F.when(streetcat == "B", 1)
            .when(((streetcat == "L") | (funcroadclass == 2)) & (streetcat != "B"), 2)
            .when(
                (
                    ((streetcat == "G") & (funcroadclass >= 3))
                    | ((streetcat == "R") & funcroadclass.between(3, 5))
                    | (~streetcat.isin(["B", "L"]) & funcroadclass.between(3, 5))
                )
                & not_special(e)
                & car,
                3,
            )
            .when(
                ~streetcat.isin(["B", "L", "G"]) & (funcroadclass > 5)
                & not_special(e) & car,
                4,
            )
            .when(special(e) & car, 5)
            .when(
                (e["ft"] == "FUZO") | (e["fb"] == "FUZO")
                | (car_false & bike & (e["bt"] != "7")),
                6,
            )
            .when(bike_false | (e["bt"] == "7"), 7)
        ),
    )
    best = _min_code(codes)
    named = (
        F.when(best == 1, "primary")
        .when(best == 2, "secondary")
        .when(best == 3, "residential")
        .when(best == 4, "service")
        .when(best == 5, "calmed")
        .when(best == 6, "no_mit")
        .when(best == 7, "path")
        .otherwise(F.lit(None).cast("string"))
    )
    return F.when(basetype.isNotNull(), named)
