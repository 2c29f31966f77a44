"""GIP network stage (sql/templates/gip_network.sql.j2): link geometry
assembly, access bit filter, linkuse aggregation, node semi-join.

- make-line: ``ST_MakeLine(point ORDER BY count) GROUP BY link_id``
  (gip_network.sql.j2:15-31) -> sort_array over collected structs, built in
  a pandas UDF into WKB.
- bit filter: ``(access_tow::bit(8) | access_bkw::bit(8) & 7) > 0``
  (gip_network.sql.j2:47-48).
- linkuse string-agg: ``array_to_string(array_agg(col), ';', '*')`` per link
  across uses (A8, gip_network.sql.j2:79-90) — NULL placeholder '*'.
- offset-curve linework (J14, gip_network.sql.j2:53-61):
  ``ST_LineSubstring(ST_OffsetCurve(geom, offset), from%, to%)``.
- node semi-join (J12, gip_network.sql.j2:113-119).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark.functions.gip import any_vehicle_access
from netascore_spark.geometry import ops, wkb


@F.pandas_udf(T.BinaryType())
def _make_line(points: pd.Series) -> pd.Series:
    """collect_list(struct(count,x,y)) -> ordered LineString WKB."""
    out = []
    for pts in points:
        arr = sorted(pts, key=lambda p: p["count"])
        coords = np.array([[p["x"], p["y"]] for p in arr], dtype=float)
        out.append(wkb.encode(("LineString", coords)))
    return pd.Series(out)


def link_geometries(linkcoordinate: DataFrame) -> DataFrame:
    """gip_linkcoordinate -> (link_id, geom)."""
    return (
        linkcoordinate.groupBy("link_id")
        .agg(F.collect_list(F.struct("count", "x", "y")).alias("pts"))
        .select("link_id", _make_line(F.col("pts")).alias("geom"))
    )


def accessible_links(link: DataFrame) -> DataFrame:
    """gip_link_tmp (gip_network.sql.j2:39-48): any-vehicle bit filter."""
    return link.filter(any_vehicle_access(F.col("access_tow"), F.col("access_bkw")))


@F.pandas_udf(T.BinaryType())
def _offset_substring(
    geom: pd.Series, offset: pd.Series, fromp: pd.Series, top: pd.Series
) -> pd.Series:
    out = []
    for g, off, f0, f1 in zip(geom, offset, fromp, top):
        if g is None:
            out.append(None)
            continue
        coords = wkb.decode(bytes(g))[1]
        c = ops.offset_curve(coords, float(off or 0.0))
        c = ops.line_substring(c, float(f0 or 0.0), float(f1 if f1 is not None else 1.0))
        out.append(wkb.encode(("LineString", c)))
    return pd.Series(out)


def linkuse_geometries(linkuse: DataFrame, link_geoms: DataFrame) -> DataFrame:
    """gip_linkuse_tmp (gip_network.sql.j2:53-61): per-use offset linework."""
    j = linkuse.join(link_geoms, "link_id")
    return j.withColumn(
        "use_geom",
        _offset_substring(
            F.col("geom"), F.col("offset_"), F.col("frompercent"), F.col("topercent")
        ),
    )


_AGG_COLS = ["basetype", "bikefeature"]


def linkuse_aggregate(linkuse: DataFrame) -> DataFrame:
    """A8: ``array_to_string(array_agg(col), ';', '*')`` per link, ordered by
    use_id for determinism (the reference relies on scan order)."""
    collected = linkuse.groupBy("link_id").agg(
        F.array_sort(F.collect_list(F.struct("use_id", *_AGG_COLS))).alias("uses")
    )
    def field_getter(name):
        return lambda u: u[name].cast("string")

    out = collected.select(
        "link_id",
        *[
            F.array_join(
                F.transform(F.col("uses"), field_getter(c)), ";", "*"
            ).alias(c)
            for c in _AGG_COLS
        ],
    )
    return out


def build_gip_network(tables: dict[str, DataFrame]) -> tuple[DataFrame, DataFrame]:
    """gip tables -> (network_edge, network_node) with assembled geometry,
    aggregated linkuse strings, and semi-joined nodes."""
    link = accessible_links(tables["gip_link"])
    geoms = link_geometries(tables["gip_linkcoordinate"])
    uses = linkuse_aggregate(tables["gip_linkuse"])
    edges = (
        link.join(geoms, "link_id")
        .join(uses, "link_id", "left")
        .withColumnRenamed("link_id", "edge_id")
    )
    # nodes referenced by any kept edge (J12)
    used_nodes = (
        edges.select(F.col("from_node").alias("node_id"))
        .unionByName(edges.select(F.col("to_node").alias("node_id")))
        .distinct()
    )
    nodes = tables["gip_node"].join(used_nodes, "node_id", "left_semi")
    return edges, nodes
