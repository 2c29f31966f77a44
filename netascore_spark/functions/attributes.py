"""Per-edge attribute derivations as native Column expressions.

Ports the CASE tables of ``sql/templates/osm_attributes.sql.j2`` 1:1 to
``F.when`` cascades.  Each function cites its source block.  All of these are
pure projections — at 100 TB they cost one codegen'd map stage, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from netascore_spark.functions import vocab
from netascore_spark.functions.access import tag, _neq_or_null


# ---------------------------------------------------------------------------
# bridge / tunnel normalization (osm_network.sql.j2:25-37)
# ---------------------------------------------------------------------------

def bridge_normalized() -> Column:
    bridge = F.col("bridge")
    no_or_null = (bridge == "no") | bridge.isNull()
    return (
        F.when(no_or_null & tag("bridge:movable").isNotNull(), tag("bridge:movable"))
        .when(no_or_null & tag("bridge:structure").isNotNull(), tag("bridge:structure"))
        .when(no_or_null & (F.col("man_made") == "bridge"), F.col("man_made"))
        .when(no_or_null & (tag("seamark:type") == "bridge"), tag("seamark:type"))
        .when(bridge == "no", F.lit(None).cast("string"))
        .otherwise(bridge)
    )


def tunnel_normalized() -> Column:
    tunnel = F.col("tunnel")
    return (
        F.when(
            ((tunnel == "no") | tunnel.isNull())
            & F.col("covered").isin(["tunnel", "arcade", "building_passage"]),
            F.col("covered"),
        )
        .when(tunnel == "no", F.lit(None).cast("string"))
        .otherwise(tunnel)
    )


# ---------------------------------------------------------------------------
# bridge/tunnel/stairs booleans (osm_attributes.sql.j2:306-336)
# ---------------------------------------------------------------------------

def bridge_flag() -> Column:
    return F.col("bridge").isNotNull()


def tunnel_flag() -> Column:
    return F.col("tunnel").isNotNull()


def stairs_flag() -> Column:
    return F.coalesce(F.col("highway") == "steps", F.lit(False))


# ---------------------------------------------------------------------------
# bicycle_infrastructure (osm_attributes.sql.j2:342-453)
# ---------------------------------------------------------------------------

def bicycle_infrastructure() -> Column:
    highway, foot, bicycle, tracktype = (
        F.col("highway"), F.col("foot"), F.col("bicycle"), F.col("tracktype"),
    )
    foot_no_or_null = (foot == "no") | foot.isNull()

    track_any = F.lit(False)
    for k in ["cycleway", "cycleway:both", "cycleway:left", "cycleway:right"]:
        track_any = track_any | tag(k).isin(["track", "opposite_track"])

    bicycle_way = (
        ((highway == "cycleway") & foot_no_or_null)
        | (
            (((highway != "cycleway") & (highway != "footway")) | highway.isNull())
            & bicycle.isin(["yes", "designated", "official", "private"])
            & foot_no_or_null
            & (tag("motor_vehicle") == "no")
        )
        | (
            track_any
            & _neq_or_null(foot, "yes")
            & _neq_or_null(foot, "designated")
        )
    )

    sidewalk_some = tag("sidewalk").isin(["yes", "both", "left", "right"])
    mixed_way = (
        ((highway == "cycleway") & foot.isin(["yes", "designated"]))
        | ((highway == "footway") & bicycle.isin(["yes", "designated"]))
        | (
            (highway == "path")
            & bicycle.isin(["designated", "yes"])
            & _neq_or_null(foot, "no")
        )
        | (
            tag("cycleway").isin(["track", "opposite_track"])
            & (tag("cycleway:segregated") == "no")
            & sidewalk_some
        )
        | (
            (tag("cycleway:both") == "track")
            & (
                ((tag("cycleway:both:segregated") == "no") & (tag("sidewalk:both") == "yes"))
                | ((tag("cycleway:left:segregated") == "no") & (tag("sidewalk:left") == "yes"))
                | ((tag("cycleway:right:segregated") == "no") & (tag("sidewalk:right") == "yes"))
                | tag("sidewalk").isin(["both", "left", "right"])
            )
        )
        | (
            (tag("cycleway:right") == "track")
            & (tag("cycleway:right:segregated") == "no")
            & ((tag("sidewalk:right") == "yes") | (tag("sidewalk") == "right"))
        )
        | (
            (tag("cycleway:left") == "track")
            & (tag("cycleway:left:segregated") == "no")
            & (tag("sidewalk:left") == "yes")
        )
        | (
            (highway == "track")
            & bicycle.isin(["designated", "yes"])
            & _neq_or_null(foot, "no")
            & tracktype.isin(["grade1", "grade2"])
        )
        | (
            tag("cycleway").isin(["track", "opposite_track"])
            & foot.isin(["yes", "designated"])
        )
    )

    lane = F.lit(False)
    for k, vals in [
        ("cycleway", ["lane", "opposite_lane"]),
        ("cycleway:left", ["lane", "opposite_lane"]),
        ("cycleway:left:lane", ["advisory"]),
        ("cycleway:right", ["lane", "opposite_lane"]),
        ("cycleway:right:lane", ["advisory"]),
        ("cycleway:both", ["lane"]),
        ("cycleway:both:lane", ["advisory"]),
    ]:
        lane = lane | tag(k).isin(vals)

    shared_lane = F.lit(False)
    bus_lane = F.lit(False)
    for k in ["cycleway", "cycleway:both", "cycleway:left", "cycleway:right"]:
        shared_lane = shared_lane | (tag(k) == "shared_lane")
        bus_lane = bus_lane | (tag(k) == "share_busway")

    return (
        F.when(bicycle_way, "bicycle_way")
        .when(mixed_way, "mixed_way")
        .when(lane, "bicycle_lane")
        .when(shared_lane, "shared_lane")
        .when(bus_lane, "bus_lane")
        .when(tag("bicycle_road") == "yes", "bicycle_road")
        .when(tag("cyclestreet") == "yes", "cyclestreet")
        .otherwise("no")
    )


# ---------------------------------------------------------------------------
# pedestrian_infrastructure (osm_attributes.sql.j2:478-495)
# ---------------------------------------------------------------------------

def pedestrian_infrastructure(access_pedestrian_ft: Column) -> Column:
    highway, foot, bicycle, tracktype = (
        F.col("highway"), F.col("foot"), F.col("bicycle"), F.col("tracktype"),
    )
    return (
        F.when(highway == "pedestrian", "pedestrian_area")
        .when(
            (highway == "footway")
            & (bicycle.isin(["no", "dismount"]) | bicycle.isNull()),
            "pedestrian_way",
        )
        .when(
            ((highway == "cycleway") & foot.isin(["yes", "designated"]))
            | ((highway == "footway") & bicycle.isin(["yes", "designated"]))
            | (
                (highway == "path")
                & bicycle.isin(["yes", "designated"])
                & _neq_or_null(foot, "no")
            )
            | (
                (highway == "track")
                & bicycle.isin(["yes", "designated"])
                & _neq_or_null(foot, "no")
                & tracktype.isin(["grade1", "grade2"])
            )
            | (
                tag("cycleway").isin(["track", "opposite_track"])
                & foot.isin(["yes", "designated"])
            ),
            "mixed_way",
        )
        .when(highway == "steps", "stairs")
        .when(access_pedestrian_ft, "sidewalk")
        .otherwise("no")
    )


# ---------------------------------------------------------------------------
# road_category (osm_attributes.sql.j2:581-603)
# ---------------------------------------------------------------------------

def road_category() -> Column:
    highway, access, bicycle, foot = (
        F.col("highway"), F.col("access"), F.col("bicycle"), F.col("foot"),
    )
    tracktype, surface = F.col("tracktype"), F.col("surface")
    maxspeed, motor_vehicle = tag("maxspeed"), tag("motor_vehicle")
    access_not_no = (access != "no") | access.isNull()

    return (
        F.when(highway.isin(["primary", "primary_link"]), "primary")
        .when(
            highway.isin(["secondary", "secondary_link"])
            | ((highway == "unclassified") & maxspeed.isin(["100", "80"])),
            "secondary",
        )
        .when(
            (
                highway.isin(["residential", "tertiary", "tertiary_link"])
                | (
                    (highway == "unclassified")
                    & ~maxspeed.isin(["100", "80"])  # != ALL, NULL-falsy like SQL
                    & maxspeed.isNotNull()
                )
            )
            & (motor_vehicle.isin(["yes", "designated"]) | motor_vehicle.isNull()),
            "residential",
        )
        .when(
            highway.isin(["service", "living_street"])
            | (motor_vehicle.isin(["agricultural", "forestry"]) & access_not_no)
            | ((highway == "path") & access_not_no)
            | (
                (highway == "track")
                & access_not_no
                & _neq_or_null(motor_vehicle, "no")
                & (tracktype.isin(["grade1", "grade2"]) | tracktype.isNull())
            ),
            "service",
        )
        .when(
            motor_vehicle.isin(["delivery", "destination", "private"])
            | (
                (highway == "track")
                & tracktype.isin(["grade3", "grade4", "grade5"])
                & surface.isin(["paved", "gravel", "asphalt"])
            ),
            "calmed",
        )
        .when(
            highway.isin(["footway", "cycleway"])
            | ((motor_vehicle == "no") & _neq_or_null(bicycle, "no"))
            | (
                (access != "yes") & access.isNotNull() & _neq_or_null(bicycle, "no")
            ),
            "no_mit",
        )
        .when(
            ((highway == "footway") & (bicycle == "no"))
            | (
                (highway == "path")
                & (foot == "yes")
                & (~bicycle.isin(["yes", "designated"]) | bicycle.isNull())
            )
            | (highway == "steps")
            | (
                (highway == "track")
                & tracktype.isin(["grade3", "grade4", "grade5"])
                & (~surface.isin(["paved", "gravel", "asphalt"]) | surface.isNull())
            ),
            "path",
        )
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# max_speed (osm_attributes.sql.j2:626-659 + clamp :670-672)
# ---------------------------------------------------------------------------

def max_speed_raw() -> Column:
    highway, access, bicycle, foot = (
        F.col("highway"), F.col("access"), F.col("bicycle"), F.col("foot"),
    )
    motorcar, tracktype, ref = F.col("motorcar"), F.col("tracktype"), F.col("ref")
    maxspeed = tag("maxspeed")
    return (
        F.when(
            maxspeed.rlike(r"^([0-9]{1,3})$"), maxspeed.cast("int")
        )
        .when(
            highway.isin(["residential", "living_street", "tertiary"])
            & (access.isin(["designated", "destination", "yes"]) | access.isNull()),
            50,
        )
        .when(
            highway.isin(["cycleway", "footway", "tertiary"])
            | bicycle.isin(["yes", "designated"])
            | foot.isin(["yes", "designated", "official", "permissive"]),
            0,
        )
        .when(
            highway.isin(["track", "path", "unclassified"])
            & _neq_or_null(bicycle, "no")
            & _neq_or_null(foot, "no")
            & _neq_or_null(motorcar, "yes")
            & tracktype.isin(["grade3", "grade4", "grade5"]),
            0,
        )
        .when(highway == "motorway", 130)
        .when(highway == "motorway_link", 100)
        .when(highway == "primary_link", 80)
        .when((access == "no") | (motorcar == "no") | (highway == "steps"), 0)
        .when(
            (motorcar == "agricultural")
            | (highway == "path")
            | ((highway == "track") & ((access != "no") | access.isNull())),
            10,
        )
        .when(
            (highway == "living_street")
            | ((highway == "service") & (access == "private"))
            | ((highway == "residential") & (access == "private"))
            | ((highway == "construction") & tracktype.isNotNull()),
            20,
        )
        .when(highway == "service", 30)
        .when(highway == "raceway", 5)
        .when(
            (highway == "unclassified")
            | ((highway == "construction") & ref.isNull()),
            50,
        )
        .when((highway == "construction") & (ref == "B304"), 70)
        .when(highway.isin(["primary", "secondary"]), 100)
        .otherwise(F.lit(None).cast("int"))
    )


def max_speed_clamped(raw: Column) -> Column:
    """``CASE WHEN x IS NOT NULL THEN least(x, 130.0) END`` (osm_attributes.sql.j2:670)."""
    return F.when(raw.isNotNull(), F.least(raw.cast("double"), F.lit(130.0)))


# ---------------------------------------------------------------------------
# pavement (osm_attributes.sql.j2:691-696)
# ---------------------------------------------------------------------------

def pavement() -> Column:
    surface = F.col("surface")
    return (
        F.when(surface.isin(vocab.PAVEMENT_ASPHALT), "asphalt")
        .when(surface.isin(vocab.PAVEMENT_GRAVEL), "gravel")
        .when(surface.isin(vocab.PAVEMENT_SOFT), "soft")
        .when(surface.isin(vocab.PAVEMENT_COBBLE), "cobble")
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# width (osm_attributes.sql.j2:708-726)
# ---------------------------------------------------------------------------

WIDTH_PATTERN = r"^([0-9]*[.]?[0-9]*)([ ])?(m|meter)?$"


def width() -> Column:
    w = F.col("width")
    extracted = F.when(
        w.rlike(WIDTH_PATTERN) & (F.regexp_extract(w, WIDTH_PATTERN, 1) != ""),
        F.regexp_extract(w, WIDTH_PATTERN, 1).cast("double"),
    )
    return F.when(
        (extracted >= 0.4) & (extracted <= 100), F.round(extracted, 2)
    ).otherwise(F.lit(None).cast("double"))


# ---------------------------------------------------------------------------
# number_lanes (osm_attributes.sql.j2:821-836)
# ---------------------------------------------------------------------------

_LANES_PATTERN = r"^([0-9]{1,2})$"


def number_lanes_ft() -> Column:
    lanes, fwd = tag("lanes"), tag("lanes:forward")
    return (
        F.when(fwd.rlike(_LANES_PATTERN), fwd.cast("double"))
        .when(
            lanes.rlike(_LANES_PATTERN) & (F.col("oneway") == "yes"),
            lanes.cast("double"),
        )
        .when(lanes.rlike(_LANES_PATTERN), lanes.cast("double") * 0.5)
        .otherwise(F.lit(None).cast("double"))
    )


def number_lanes_tf() -> Column:
    lanes, bkw = tag("lanes"), tag("lanes:backward")
    return (
        F.when(bkw.rlike(_LANES_PATTERN), bkw.cast("double"))
        .when(
            lanes.rlike(_LANES_PATTERN) & (F.col("oneway") == "yes"), F.lit(0.0)
        )
        .when(lanes.rlike(_LANES_PATTERN), lanes.cast("double") * 0.5)
        .otherwise(F.lit(None).cast("double"))
    )


# ---------------------------------------------------------------------------
# gradient class (osm_attributes.sql.j2:779-793)
# ---------------------------------------------------------------------------

def gradient_class(gradient: Column) -> Column:
    return (
        F.when((gradient < 1.5) & (gradient > -1.5), 0)
        .when((gradient >= 1.5) & (gradient < 3), 1)
        .when((gradient <= -1.5) & (gradient > -3), -1)
        .when((gradient >= 3) & (gradient < 6), 2)
        .when((gradient <= -3) & (gradient > -6), -2)
        .when((gradient >= 6) & (gradient < 12), 3)
        .when((gradient <= -6) & (gradient > -12), -3)
        .when(gradient >= 12, 4)
        .when(gradient <= -12, -4)
        .otherwise(F.lit(None).cast("int"))
    )


# ---------------------------------------------------------------------------
# designated_route priority pick (osm_attributes.sql.j2:544-556) and route
# tier normalization (:521-533)
# ---------------------------------------------------------------------------

def route_tier() -> Column:
    network = tag("network")
    return (
        F.when(network == "icn", "international")
        .when(network == "ncn", "national")
        .when((network == "rcn") | (network == "regional"), "regional")
        .when(network == "lcn", "local")
        .otherwise("unknown")
    )


def designated_route_pick(routes_collected: Column) -> Column:
    """Priority-pick over collect_set('route') — A5 in SURVEY §2.4."""
    expr = F.lit(None).cast("string")
    out = None
    for tier in vocab.ROUTE_PRIORITY:
        cond = F.array_contains(routes_collected, tier)
        out = F.when(cond, tier) if out is None else out.when(cond, tier)
    return out.otherwise(expr)


# ---------------------------------------------------------------------------
# net_type (osm_attributes.sql.j2:1166-1171)
# ---------------------------------------------------------------------------

def net_type() -> Column:
    return (
        F.when(F.col("highway").isNotNull(), "road")
        .when(F.col("railway").isNotNull(), "rail")
        .when(F.col("aerialway").isNotNull(), "aerial")
        .otherwise(F.lit(None).cast("string"))
    )


# ---------------------------------------------------------------------------
# utmzone (F6, sql/functions/determine_utmzone.sql:3-25) — driver-side config
# ---------------------------------------------------------------------------

def utmzone(lon: float, lat: float) -> int:
    """EPSG code of the UTM zone containing (lon, lat):
    ``32600 + floor((lon+180)/6)+1`` north, ``32700 + ...`` south."""
    zone = int((lon + 180.0) // 6.0) + 1
    return (32600 if lat >= 0 else 32700) + zone


# ---------------------------------------------------------------------------
# escalator / indoor / layer extraction (osm_network.sql.j2:62-69)
# ---------------------------------------------------------------------------

def escalator() -> Column:
    return F.when(tag("conveying") == "no", F.lit(None).cast("string")).otherwise(
        tag("conveying")
    )


def indoor() -> Column:
    return F.when(tag("indoor") == "no", F.lit(None).cast("string")).otherwise(
        tag("indoor")
    )


def layer_array() -> Column:
    """``string_to_array(layer,';') || string_to_array(tags->'level',';')``.

    Postgres ``||`` with a NULL array yields the other operand; mimic with
    coalesce-to-empty then NULL-out when both inputs are NULL.
    """
    a = F.split(F.col("layer"), ";")
    b = F.split(tag("level"), ";")
    both_null = F.col("layer").isNull() & tag("level").isNull()
    return F.when(both_null, F.lit(None).cast("array<string>")).otherwise(
        F.concat(
            F.coalesce(a, F.array().cast("array<string>")),
            F.coalesce(b, F.array().cast("array<string>")),
        )
    )
