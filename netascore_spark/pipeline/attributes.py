"""Attributes stage: network_edge (+ layers) -> network_edge_attributes.

Spark re-realization of ``sql/templates/osm_attributes.sql.j2``.  The
reference widens one table ~20 times via copy-on-write (SURVEY §1.2); here
the pure-column attributes are ONE projection and each spatial layer joins
once on ``edge_id`` — Catalyst fuses the rest.

Layout of the output table: ``edge_id`` + the exact 33 attribute columns of
osm_attributes.sql.j2:1115-1148.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark.functions import access as ACC
from netascore_spark.functions import attributes as A
from netascore_spark.geometry import ops, wkb
from netascore_spark.operators import spatial
from netascore_spark.pipeline import cache

DEM_CELL = 10.0  # fixture DEM grid resolution (meters)


# ---------------------------------------------------------------------------
# pure-column attributes (one codegen'd projection)
# ---------------------------------------------------------------------------

def base_attributes(edges: DataFrame) -> DataFrame:
    e = ACC.with_access_columns(edges)
    ms = A.max_speed_clamped(A.max_speed_raw())
    bi = A.bicycle_infrastructure()
    pi = A.pedestrian_infrastructure(
        ACC.calculate_access_pedestrian(ACC.pedestrian_norm_columns()).cast("boolean")
    )
    # single withColumns: one analyzer pass (withColumn chains re-analyze the
    # whole plan per call — measurably slow with deep lineage)
    return e.withColumns(
        {
            "bridge_flag": A.bridge_flag(),
            "tunnel_flag": A.tunnel_flag(),
            "stairs": A.stairs_flag(),
            "bicycle_infrastructure_ft": bi,
            "bicycle_infrastructure_tf": bi,
            "pedestrian_infrastructure_ft": pi,
            "pedestrian_infrastructure_tf": pi,
            "road_category": A.road_category(),
            "max_speed_ft": ms,
            "max_speed_tf": ms,
            "max_speed_greatest": ms,
            # parking never computed, always NULL (attributes.md:84)
            "parking_ft": F.lit(None).cast("string"),
            "parking_tf": F.lit(None).cast("string"),
            "pavement": A.pavement(),
            "width_parsed": A.width(),
            "number_lanes_ft": A.number_lanes_ft(),
            "number_lanes_tf": A.number_lanes_tf(),
        }
    )


# ---------------------------------------------------------------------------
# designated_route (J4 containment + A5 priority pick)
# ---------------------------------------------------------------------------

def designated_route(edges: DataFrame, osm_line: DataFrame, cell_size: float) -> DataFrame:
    routes = (
        osm_line.filter(F.col("route") == "bicycle")
        .select(
            F.col("osm_id").alias("route_id"),
            F.col("way").alias("geom"),
            A.route_tier().alias("route"),
        )
    )
    # dedup=False: collect_set dedups the picked tiers, so duplicate
    # (edge, route) pairs are harmless — with the broadcast right side the
    # whole containment test is then map-side (zero shuffle before the
    # final groupBy)
    cand = spatial.candidate_pairs(
        edges.select("edge_id", "geom"),
        routes,
        "edge_id", "route_id",
        cell_size=cell_size,
        extra_right=["route"],
        broadcast_right=True,
        dedup=False,
    )
    contained = cand.filter(
        spatial.contains_line_udf()(F.col("r_geom"), F.col("geom"))
    )
    picked = contained.groupBy("edge_id").agg(
        A.designated_route_pick(F.collect_set("route")).alias("designated_route")
    )
    return picked


# ---------------------------------------------------------------------------
# elevation + gradient (J9 raster-sample join + J10)
# ---------------------------------------------------------------------------

def node_elevation(nodes: DataFrame, dem: DataFrame, dem_cell: float = DEM_CELL) -> DataFrame:
    """DEM raster -> vector grid equi-join: node joins its containing cell."""
    n = nodes.withColumn(
        "cell_x", F.floor(F.col("x") / F.lit(dem_cell)).cast("long")
    ).withColumn("cell_y", F.floor(F.col("y") / F.lit(dem_cell)).cast("long"))
    # no broadcast HINT: a regional DEM auto-broadcasts under the 64 MB
    # threshold, a continent-scale one must shuffle-join (hinting it would
    # OOM executors at 100 TB)
    return n.join(dem, ["cell_x", "cell_y"], "left").select(
        "node_id", F.round(F.col("elevation"), 2).alias("elevation")
    )


def gradient(edges: DataFrame, node_attrs: DataFrame, attrs: DataFrame) -> DataFrame:
    e = (
        edges.select("edge_id", "from_node", "to_node", "length")
        .join(
            attrs.select("edge_id", "bridge_flag", "tunnel_flag"), "edge_id"
        )
        .filter(~F.col("bridge_flag") & ~F.col("tunnel_flag"))
        .join(
            node_attrs.select(
                F.col("node_id").alias("from_node"), F.col("elevation").alias("elev_from")
            ),
            "from_node",
        )
        .join(
            node_attrs.select(
                F.col("node_id").alias("to_node"), F.col("elevation").alias("elev_to")
            ),
            "to_node",
        )
        .withColumn(
            "gradient",
            F.round((F.col("elev_to") - F.col("elev_from")) / F.col("length") * 100.0, 2),
        )
    )
    return e.select(
        "edge_id", A.gradient_class(F.col("gradient")).alias("gradient_class")
    )


# ---------------------------------------------------------------------------
# proximity counts (J5) — facilities 30 m, crossings 10 m
# ---------------------------------------------------------------------------

def proximity_ratio(
    edges: DataFrame,
    points: DataFrame,
    point_id: str,
    radius: float,
    cell_size: float,
) -> DataFrame:
    """count(points within radius of edge) / length * 100 (A2 + ratio).

    Zero-python hot path (dwithin_point_line_native): python touches each
    point and each edge exactly once for coordinate extraction; the
    candidate cell join and the exact point-segment refine run in native
    whole-stage codegen — no per-candidate-pair pandas work."""
    hits = spatial.dwithin_point_line_native(
        points.select(point_id, "geom"),
        edges.select("edge_id", "geom"),
        point_id, "edge_id",
        radius, cell_size,
    )
    counts = hits.groupBy("edge_id").agg(F.count("*").alias("cnt"))
    return counts.join(edges.select("edge_id", "length"), "edge_id").select(
        "edge_id",
        F.round(F.col("cnt") / F.col("length") * 100.0, 2).alias("ratio"),
    )


# ---------------------------------------------------------------------------
# buffer overlays (J6 + A3) — buildings 20 m, greenness 30 m
# ---------------------------------------------------------------------------

_UNION_RATIO_TYPE = T.StructType(
    [
        T.StructField("edge_id", T.LongType()),
        T.StructField("ratio", T.DoubleType()),
    ]
)


def buffer_overlay_ratio(
    edges: DataFrame,
    polys: DataFrame,
    poly_id: str,
    radius: float,
    cell_size: float,
    buffers_cov: DataFrame | None = None,
) -> DataFrame:
    """least(ST_Area(ST_Union(poly ∩ buffer)) / buffer_area * 100, 100).

    Union-before-area per edge via grouped pandas (A3) — prevents double
    counting overlapping polygons, matching osm_attributes.sql.j2:946-951.

    ``buffers_cov``: optional pre-computed cell cover of the ``radius``
    edge buffers (spatial.cover_with_cells_bbox over (edge_id, buffer
    geom)); build_attributes shares ONE persisted 30 m buffer cover
    between this overlay (greenness) and water_flag's two joins instead
    of re-running the buffer and cover UDF passes per join.
    """
    buffers = edges.select(
        "edge_id", spatial.buffer_udf(radius, "flat")(F.col("geom")).alias("geom")
    )
    # dedup=False: a (buffer, polygon) pair meeting in several cells would
    # add the same polygon to the union twice — union_ratios dedups
    # repeated geometry per edge group (byte-keyed, same key as its decode
    # cache), which is exact for a union-area fold; skipping the pair-dedup
    # exchange leaves ONE exchange (the group-by-edge spread) on the path
    cand = spatial.candidate_pairs(
        buffers, polys.select(poly_id, "geom"),
        "edge_id", poly_id,
        cell_size=cell_size,
        left_cov=buffers_cov, dedup=False,
    )

    def union_ratios(batches):
        """mapInPandas with group carry-over: rows arrive hash-partitioned
        and sorted by edge_id, so a group is contiguous; the tail group of
        each Arrow batch is carried into the next (it may be split across
        batches).  Avoids applyInPandas' per-group Arrow round-trip (50k
        groups -> 50k tiny pandas frames), and caches polygon decodes —
        the same building appears in many neighbouring edge buffers."""
        poly_cache: dict[bytes, list] = {}

        skipped = [0]

        def emit(pdf: pd.DataFrame) -> pd.DataFrame:
            ids, ratios = [], []
            for eid, grp in pdf.groupby("edge_id", sort=False):
                buf = wkb.decode(bytes(grp["geom"].iloc[0]))[1]
                buffer_area = ops.polygon_area(buf)
                rb = buf[0]
                bminx, bminy = float(rb[:, 0].min()), float(rb[:, 1].min())
                bmaxx, bmaxy = float(rb[:, 0].max()), float(rb[:, 1].max())
                pieces = []
                seen: set[bytes] = set()
                for g in grp["r_geom"]:
                    gb = bytes(g)
                    # candidate_pairs(dedup=False): the same polygon may
                    # appear once per shared cell — adding it to the union
                    # twice is a no-op by union semantics, but skipping it
                    # here costs one set lookup instead of a triangle clip
                    if gb in seen:
                        continue
                    seen.add(gb)
                    rings_list = poly_cache.get(gb)
                    if rings_list is None:
                        # flatten MultiPolygon parts — real OSM multi-outer
                        # relations reach here as one Polygon per part or as
                        # a MultiPolygon from other sources.  Cache the ear
                        # triangulation with the decode: the same building
                        # recurs in every neighbouring edge's group, and
                        # triangulation was ~20% of the python stage
                        # (ops.triangulated is a pure function; the clip/
                        # subtract sequence downstream is unchanged).
                        rings_list = [
                            (ops.triangulated(r), ops._bbox(r[0]))
                            for r in wkb.polygons(wkb.decode(gb))
                        ]
                        if len(poly_cache) > 4096:
                            poly_cache.clear()
                        poly_cache[gb] = rings_list
                    for tri, pb in rings_list:
                        # cell-level candidates include polygons that never
                        # touch THIS edge's buffer; a part whose bbox is
                        # disjoint from the buffer bbox clips to empty in
                        # union_pieces (identical result) — skip it here
                        # before any triangle clipping happens
                        if (
                            pb[0] > bmaxx or pb[2] < bminx
                            or pb[1] > bmaxy or pb[3] < bminy
                        ):
                            continue
                        pieces.append(tri)
                try:
                    ua = ops.union_area_in_region(pieces, buf)
                except ValueError:
                    # one invalid (self-intersecting/degenerate) real-world
                    # polygon must not abort a 100TB run: skip the feature
                    skipped[0] += 1
                    continue
                if ua > 0:
                    ids.append(int(eid))
                    ratios.append(min(ua / buffer_area * 100.0, 100.0))
            return pd.DataFrame({"edge_id": pd.Series(ids, dtype="int64"),
                                 "ratio": pd.Series(ratios, dtype="float64")})

        carry = None
        for pdf in batches:
            if carry is not None and len(carry):
                pdf = pd.concat([carry, pdf], ignore_index=True)
            if not len(pdf):
                continue
            last = pdf["edge_id"].iloc[-1]
            tail = pdf["edge_id"] == last
            carry = pdf[tail]
            body = pdf[~tail]
            if len(body):
                yield emit(body)
        if carry is not None and len(carry):
            yield emit(carry)
        if skipped[0]:
            import warnings

            warnings.warn(
                f"buffer overlay: skipped {skipped[0]} edge group(s) with "
                "untriangulatable (invalid) polygon geometry"
            )

    # repartition BY KEY + sort: contiguous complete groups per partition,
    # full parallelism for the per-edge union python work
    return (
        spatial.spread(cand, "edge_id")
        .sortWithinPartitions("edge_id")
        .select("edge_id", "geom", "r_geom")
        .mapInPandas(union_ratios, schema=_UNION_RATIO_TYPE)
        .withColumn("ratio", F.round(F.col("ratio"), 2))
    )


# ---------------------------------------------------------------------------
# water (J7) and noise (J8)
# ---------------------------------------------------------------------------

def edge_buffer_cover(
    edges: DataFrame, radius: float, cell_size: float
) -> DataFrame:
    """Persisted cell cover (with bboxes) of the ``radius`` edge buffers,
    carrying (edge_id, length, buffer geom).  Computed ONCE and shared by
    every overlay join at the same radius: water_flag joins it against
    water lines AND water polygons, and the greenness overlay (also 30 m)
    joins it against the greenness polygons — without sharing, each of the
    three joins pays its own buffer-UDF pass (~1.4 s) and cover-UDF pass
    (~3 s) over all 400k buffers (measured round 6, 32 cores)."""
    buffers = edges.select(
        "edge_id", "length",
        spatial.buffer_udf(radius, "flat")(F.col("geom")).alias("geom"),
    )
    return cache.track(
        spatial.cover_with_cells_bbox(
            spatial.spread(buffers), "geom", cell_size, 0.0, "l"
        ).persist()
    )


def water_flag(
    edges: DataFrame,
    water: DataFrame,
    cell_size: float,
    buffers_cov: DataFrame | None = None,
) -> DataFrame:
    # one persisted buffer cover: BOTH branches (line length-ratio, polygon
    # intersects) join against it — without it the buffer and cover UDFs
    # run twice over every edge
    if buffers_cov is None:
        buffers_cov = edge_buffer_cover(edges, 30.0, cell_size)
    buffers = edges.select("edge_id", "length", "geom")  # ignored: left_cov
    lines = water.filter(F.col("geom_type") == "line")
    polys = water.filter(F.col("geom_type") == "polygon")

    # dedup=False: the trailing distinct() makes duplicate (edge, water)
    # pairs harmless, and skipping the pair-dedup exchange lets the refine
    # UDFs run inside the cell-join stage itself — no shuffle of fat
    # (buffer WKB, water WKB) candidate rows at all (the former
    # dropDuplicates + spread pair carried every candidate twice)
    lc = spatial.candidate_pairs(
        buffers, lines.select("water_id", "geom"), "edge_id", "water_id",
        cell_size=cell_size, extra_left=["length"],
        left_cov=buffers_cov, dedup=False,
    )
    line_hits = (
        lc.withColumn(
            "ilen", spatial.intersection_length_udf()(F.col("r_geom"), F.col("geom"))
        )
        .filter((F.col("ilen") / F.col("length")).between(0.8, 1.6))
        .select("edge_id")
    )
    pc = spatial.candidate_pairs(
        buffers, polys.select("water_id", "geom"), "edge_id", "water_id",
        cell_size=cell_size,
        left_cov=buffers_cov, dedup=False,
    )
    poly_hits = (
        pc
        .withColumn("__ix", spatial.intersects_udf()(F.col("geom"), F.col("r_geom")))
        .filter(F.col("__ix"))
        .select("edge_id")
    )
    return line_hits.unionByName(poly_hits).distinct()


def noise_sum(edges: DataFrame, noise: DataFrame, cell_size: float) -> DataFrame:
    cand = spatial.candidate_pairs(
        edges.select("edge_id", "length", "geom"),
        noise.select("noise_id", "geom", "noise"),
        "edge_id", "noise_id",
        cell_size=cell_size, extra_left=["length"], extra_right=["noise"],
    )
    # no spread: candidate_pairs' dedup exchange is width-pinned, so the
    # refine runs in the dedup stage itself (one exchange, not two)
    pieces = cand.withColumn(
        "ilen", spatial.intersection_length_udf()(F.col("geom"), F.col("r_geom"))
    ).filter(F.col("ilen") > 0)
    return pieces.groupBy("edge_id").agg(
        F.round(F.sum(F.col("ilen") / F.col("length") * F.col("noise")), 0).alias("noise")
    )


# ---------------------------------------------------------------------------
# assembly
# ---------------------------------------------------------------------------

ATTRIBUTE_COLUMNS = [
    "access_car_ft", "access_car_tf", "access_bicycle_ft", "access_bicycle_tf",
    "access_pedestrian_ft", "access_pedestrian_tf", "bridge", "tunnel",
    "stairs", "bicycle_infrastructure_ft", "bicycle_infrastructure_tf",
    "pedestrian_infrastructure_ft", "pedestrian_infrastructure_tf",
    "designated_route_ft", "designated_route_tf", "road_category",
    "max_speed_ft", "max_speed_tf", "max_speed_greatest", "parking_ft",
    "parking_tf", "pavement", "width", "gradient_ft", "gradient_tf",
    "number_lanes_ft", "number_lanes_tf", "facilities", "crossings",
    "buildings", "greenness", "water", "noise",
]


def build_attributes(
    edges: DataFrame,
    nodes: DataFrame,
    osm_line: DataFrame | None = None,
    layers: dict[str, DataFrame] | None = None,
    cell_size: float = 200.0,
    dem_cell: float = DEM_CELL,
) -> tuple[DataFrame, DataFrame]:
    """Returns (network_edge_attributes, network_node_attributes)."""
    layers = layers or {}
    attrs = base_attributes(edges)

    # designated_route (coalesce 'no', osm_attributes.sql.j2:566-567)
    if osm_line is not None:
        dr = designated_route(edges, osm_line, cell_size)
        attrs = attrs.join(dr, "edge_id", "left").withColumns(
            {
                "designated_route_ft": F.coalesce(F.col("designated_route"), F.lit("no")),
                "designated_route_tf": F.coalesce(F.col("designated_route"), F.lit("no")),
            }
        ).drop("designated_route")
    else:
        attrs = attrs.withColumns(
            {"designated_route_ft": F.lit("no"), "designated_route_tf": F.lit("no")}
        )

    # elevation / gradient
    if "dem" in layers:
        node_attrs = node_elevation(nodes, layers["dem"], dem_cell)
        grad = gradient(edges, node_attrs, attrs)
        attrs = attrs.join(grad, "edge_id", "left").withColumns(
            {
                "gradient_ft": F.col("gradient_class").cast("double"),
                "gradient_tf": (-F.col("gradient_class")).cast("double"),
            }
        ).drop("gradient_class")
    else:
        node_attrs = nodes.select("node_id", F.lit(None).cast("double").alias("elevation"))
        attrs = attrs.withColumns(
            {
                "gradient_ft": F.lit(None).cast("double"),
                "gradient_tf": F.lit(None).cast("double"),
            }
        )

    # facilities / crossings (coalesce 0)
    for layer, radius, colname in [("facility", 30.0, "facilities"), ("crossing", 10.0, "crossings")]:
        if layer in layers:
            pr = proximity_ratio(edges, layers[layer], f"{layer}_id", radius, cell_size)
            attrs = attrs.join(
                pr.withColumnRenamed("ratio", colname), "edge_id", "left"
            ).withColumn(colname, F.coalesce(F.col(colname), F.lit(0.0)))
        else:
            attrs = attrs.withColumn(colname, F.lit(None).cast("double"))

    # ONE persisted 30 m buffer cover for the three joins that need it
    # (greenness overlay, water lines, water polygons) — see
    # edge_buffer_cover
    cov30 = (
        edge_buffer_cover(edges, 30.0, cell_size)
        if ("greenness" in layers or "water" in layers)
        else None
    )

    # buildings / greenness buffer overlays (coalesce 0)
    for layer, radius, colname in [("building", 20.0, "buildings"), ("greenness", 30.0, "greenness")]:
        if layer in layers:
            br = buffer_overlay_ratio(
                edges, layers[layer], f"{layer}_id", radius, cell_size,
                buffers_cov=cov30 if radius == 30.0 else None,
            )
            attrs = attrs.join(
                br.withColumnRenamed("ratio", colname), "edge_id", "left"
            ).withColumn(colname, F.coalesce(F.col(colname), F.lit(0.0)))
        else:
            attrs = attrs.withColumn(colname, F.lit(None).cast("double"))

    # water boolean
    if "water" in layers:
        wf = water_flag(
            edges, layers["water"], cell_size, buffers_cov=cov30
        ).withColumn("water", F.lit(True))
        attrs = attrs.join(wf, "edge_id", "left").withColumn(
            "water", F.coalesce(F.col("water"), F.lit(False))
        )
    else:
        attrs = attrs.withColumn("water", F.lit(None).cast("boolean"))

    # noise (stays NULL where no overlay — osm_attributes.sql.j2:1101)
    if "noise" in layers:
        ns = noise_sum(edges, layers["noise"], cell_size)
        attrs = attrs.join(ns, "edge_id", "left")
    else:
        attrs = attrs.withColumn("noise", F.lit(None).cast("double"))

    out = attrs.select(
        "edge_id",
        *[
            F.col(
                {"bridge": "bridge_flag", "tunnel": "tunnel_flag", "width": "width_parsed"}.get(c, c)
            ).alias(c)
            for c in ATTRIBUTE_COLUMNS
        ],
    )
    return out, node_attrs


def edge_export(edges: DataFrame) -> DataFrame:
    """network_edge_export (osm_attributes.sql.j2:1163-1175)."""
    return edges.select(
        "edge_id", "osm_id", "from_node", "to_node", "geom", "length",
        A.net_type().alias("net_type"),
    )
