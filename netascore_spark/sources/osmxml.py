"""Real .osm XML ingestion -> osm_point / osm_line / osm_polygon (S3).

The reference shells out to osm2pgsql with ``resources/default.style``
(core/import_step.py:424: ``import_osm(..., 'default.style', ...)``) and gets
three PostGIS tables.  This module reproduces that import without osm2pgsql,
Spark-first:

- **Tokenize** (driver, streaming): ``xml.etree.ElementTree.iterparse`` with
  ``elem.clear()`` — bounded memory regardless of file size; nodes/ways/
  relations stream out in Arrow-friendly chunks (pandas -> createDataFrame,
  unioned).  XML is a single sequential stream by nature, so this pass is
  driver-I/O-bound (~the same boundary osm2pgsql has in its reader thread);
  the scale path for 100 TB inputs remains pre-parsed parquet, and
  everything AFTER tokenization here is distributed.
- **Assemble** (cluster): way geometry building is the osm2pgsql
  "middle-table" join re-expressed relationally — ways explode to
  (way_id, seq, node_ref), equi-join the node table on node_ref (THE heavy
  shuffle at scale), sort-collect per way, then one Arrow pass encodes WKB.
  Multipolygon relations stitch member rings per-relation in an
  applyInPandas group pass.
- **Classify** (osm2pgsql pgsql-output rules, default.style): a closed way
  becomes a polygon iff it carries a tag whose style flag is ``polygon``
  (or ``area=yes/1/true``) and not ``area=no``; ``note``/``source*`` tags
  are deleted; nodes need >=1 surviving tag to appear in osm_point.
- **Project**: WGS84 lon/lat -> the AOI's UTM zone
  (functions/projection.py, the ST_Transform(way, target_srid) equivalent;
  import_step.py:436).

Output schemas match sources/fixtures.py exactly (OSM_LINE_COLUMNS 26 cols
+ tags map; _OSM_PT_POLY_COLS for point/polygon), so the parsed tables feed
pipeline.network / sources.layers unchanged.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark.functions import projection
from netascore_spark.geometry import ops, wkb
from netascore_spark.pipeline import cache
from netascore_spark.sources.fixtures import OSM_LINE_COLUMNS, _OSM_PT_POLY_COLS

# default.style keys flagged `polygon` (closed ways with any of these become
# osm_polygon; resources/default.style)
POLYGON_KEYS = {
    "aeroway", "amenity", "building", "harbour", "historic", "landuse",
    "leisure", "man_made", "military", "natural", "office", "place", "power",
    "public_transport", "shop", "sport", "tourism", "water", "waterway",
    "wetland", "abandoned:aeroway", "abandoned:amenity",
    "abandoned:building", "abandoned:landuse", "abandoned:power",
    "area:highway",
}  # NB: `wood` is flagged linear (not polygon) in default.style:150
# default.style `delete` rules (resources/default.style:172-233, complete)
_DELETE_EXACT = {
    "note", "source", "source_ref", "attribution", "comment", "fixme",
    "created_by", "odbl", "odbl:note", "SK53_bulk:load", "accuracy:meters",
    "sub_sea:type", "waterway:type", "3dshapes:ggmodelk", "AND_nosr_r",
    "import",
}
_DELETE_PREFIX = (
    "note:", "source:", "tiger:", "NHD:", "nhd:", "gnis:", "geobase:",
    "KSJ2:", "yh:", "osak:", "kms:", "ngbe:", "naptan:", "CLC:", "it:fvg:",
)

_CHUNK = 200_000


def _clean_tags(tags: dict) -> dict:
    return {
        k: v
        for k, v in tags.items()
        if k not in _DELETE_EXACT and not k.startswith(_DELETE_PREFIX)
    }


def _iter_elements(path: str) -> Iterator[tuple]:
    """Stream ('node'|'way'|'relation', payload) with bounded memory."""
    for _, elem in ET.iterparse(path, events=("end",)):
        tag = elem.tag
        if tag == "node":
            tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
            yield ("node", (int(elem.get("id")), float(elem.get("lon")),
                            float(elem.get("lat")), _clean_tags(tags)))
            elem.clear()
        elif tag == "way":
            refs = [int(nd.get("ref")) for nd in elem.findall("nd")]
            tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
            yield ("way", (int(elem.get("id")), refs, _clean_tags(tags)))
            elem.clear()
        elif tag == "relation":
            members = [
                (m.get("type"), int(m.get("ref")), m.get("role") or "")
                for m in elem.findall("member")
            ]
            tags = {t.get("k"): t.get("v") for t in elem.findall("tag")}
            yield ("relation", (int(elem.get("id")), members, _clean_tags(tags)))
            elem.clear()


_NODE_SCHEMA = T.StructType(
    [
        T.StructField("node_id", T.LongType()),
        T.StructField("x", T.DoubleType()),
        T.StructField("y", T.DoubleType()),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)
_WAY_SCHEMA = T.StructType(
    [
        T.StructField("way_id", T.LongType()),
        T.StructField("refs", T.ArrayType(T.LongType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)
_REL_SCHEMA = T.StructType(
    [
        T.StructField("rel_id", T.LongType()),
        T.StructField("member_ways", T.ArrayType(T.LongType())),
        T.StructField("member_roles", T.ArrayType(T.StringType())),
        T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
    ]
)


def _make_projector(projection_arg) -> Callable:
    """None = planar passthrough (lon=x, lat=y; test fixtures);
    "utm" = auto zone from the first chunk's mean lon; "utmNN"/"utmNNs" =
    explicit zone; callable = custom (lon_arr, lat_arr) -> (x, y)."""
    if projection_arg is None:
        return lambda lon, lat: (lon, lat)
    if callable(projection_arg):
        return projection_arg
    if isinstance(projection_arg, str) and projection_arg.startswith("utm"):
        state = {"zone": None, "north": not projection_arg.endswith("s")}
        if len(projection_arg) > 3:
            state["zone"] = int(projection_arg[3:].rstrip("sn"))

        def proj(lon, lat):
            if state["zone"] is None:  # auto: first chunk fixes the zone
                state["zone"] = projection.utm_zone(float(np.mean(lon)))
            return projection.wgs84_to_utm(lon, lat, state["zone"], state["north"])

        return proj
    raise ValueError(f"unknown projection {projection_arg!r}")


def parse_osm_xml(
    spark: SparkSession, path: str, projection_spec="utm"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Stream the file into (nodes, ways, relations) DataFrames.

    Node coordinates are projected per chunk (vectorized numpy) during the
    stream — the only driver-side compute besides XML tokenization itself.
    """
    return parse_osm_stream(spark, _iter_elements(path), projection_spec)


def parse_osm_stream(
    spark: SparkSession, elements: Iterator[tuple], projection_spec="utm"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Element stream ('node'|'way'|'relation', payload) -> (nodes, ways,
    relations) DataFrames in bounded-memory chunks.  Shared by the .osm XML
    tokenizer and the .osm.pbf blob reader (sources/osmpbf.py)."""
    proj = _make_projector(projection_spec)
    n_chunks: list[DataFrame] = []
    w_chunks: list[DataFrame] = []
    r_chunks: list[DataFrame] = []
    nodes: list[tuple] = []
    ways: list[tuple] = []
    rels: list[tuple] = []

    def flush_nodes():
        if not nodes:
            return
        lon = np.array([n[1] for n in nodes])
        lat = np.array([n[2] for n in nodes])
        x, y = proj(lon, lat)
        rows = [
            (nid, float(px), float(py), tg)
            for (nid, _, _, tg), px, py in zip(nodes, x, y)
        ]
        n_chunks.append(spark.createDataFrame(rows, _NODE_SCHEMA))
        nodes.clear()

    def flush_ways():
        if ways:
            w_chunks.append(spark.createDataFrame(list(ways), _WAY_SCHEMA))
            ways.clear()

    def flush_rels():
        if rels:
            r_chunks.append(spark.createDataFrame(list(rels), _REL_SCHEMA))
            rels.clear()

    for kind, payload in elements:
        if kind == "node":
            nodes.append(payload)
            if len(nodes) >= _CHUNK:
                flush_nodes()
        elif kind == "way":
            ways.append(payload)
            if len(ways) >= _CHUNK:
                flush_ways()
        else:
            rel_id, members, tags = payload
            if tags.get("type") != "multipolygon":
                continue  # osm2pgsql default.style: only multipolygons matter
            mw = [ref for (t, ref, _) in members if t == "way"]
            roles = [role for (t, _, role) in members if t == "way"]
            rels.append((rel_id, mw, roles, tags))
            if len(rels) >= _CHUNK:
                flush_rels()
    flush_nodes(), flush_ways(), flush_rels()

    def union(chunks, schema):
        if not chunks:
            return spark.createDataFrame([], schema)
        out = chunks[0]
        for c in chunks[1:]:
            out = out.unionByName(c)
        return out

    return (
        union(n_chunks, _NODE_SCHEMA),
        union(w_chunks, _WAY_SCHEMA),
        union(r_chunks, _REL_SCHEMA),
    )


def _encode_way_udf():
    """array<struct(seq,x,y)> (sorted) + is_polygon -> WKB."""

    @F.pandas_udf(T.BinaryType())
    def _enc(pts: pd.Series, is_poly: pd.Series) -> pd.Series:
        out = []
        for arr, poly in zip(pts, is_poly):
            coords = np.array([[p["x"], p["y"]] for p in arr])
            if poly:
                out.append(wkb.encode(("Polygon", [coords])))
            else:
                out.append(wkb.encode(("LineString", coords)))
        return pd.Series(out)

    return _enc


def _project_tags(df: DataFrame, columns: list[str], keep_tags: bool) -> DataFrame:
    """tags map -> the fixture schema's typed columns (+ residual tags)."""
    cols = [F.col("osm_id"), F.col("way")]
    tag_cols = [c for c in columns if c not in ("osm_id", "way", "tags")]
    for c in tag_cols:
        cols.append(F.col("tags")[c].alias(c))
    if keep_tags:
        extracted = F.array(*[F.lit(c) for c in tag_cols])
        cols.append(
            F.map_filter("tags", lambda k, v: ~F.array_contains(extracted, k)).alias("tags")
        )
    return df.select(*cols)


def read_osm_xml(
    spark: SparkSession, path: str, projection_spec="utm"
) -> dict[str, DataFrame]:
    """.osm XML -> {"osm_point", "osm_line", "osm_polygon"} (fixture schemas).

    import_step.py:424 parity (osm2pgsql pgsql output): tagged nodes ->
    osm_point; ways -> osm_line or osm_polygon by the default.style
    polygon-key rule; type=multipolygon relations -> stitched osm_polygon
    rows (outer ring + holes), keyed -rel_id like osm2pgsql.
    """
    nodes, ways, rels = parse_osm_xml(spark, path, projection_spec)
    return assemble_tables(spark, nodes, ways, rels)


def assemble_tables(
    spark: SparkSession, nodes: DataFrame, ways: DataFrame, rels: DataFrame
) -> dict[str, DataFrame]:
    """Distributed way assembly + default.style classification over parsed
    (nodes, ways, relations) frames — shared by the XML and PBF readers."""
    nodes = cache.track(nodes.persist())

    # ---- osm_point: nodes with >=1 surviving tag -------------------------
    pt = nodes.filter(F.size("tags") > 0)

    @F.pandas_udf(T.BinaryType())
    def enc_pt(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series([wkb.encode(wkb.point(px, py)) for px, py in zip(x, y)])

    osm_point = _project_tags(
        pt.select(
            F.col("node_id").alias("osm_id"),
            enc_pt(F.col("x"), F.col("y")).alias("way"),
            "tags",
        ),
        _OSM_PT_POLY_COLS,
        keep_tags=False,
    )

    # ---- way assembly: the distributed middle-table join ----------------
    refs = ways.select(
        "way_id", F.posexplode("refs").alias("seq", "node_ref")
    )
    located = refs.join(
        nodes.select(F.col("node_id").alias("node_ref"), "x", "y"), "node_ref"
    )
    assembled = located.groupBy("way_id").agg(
        F.sort_array(F.collect_list(F.struct("seq", "x", "y"))).alias("pts")
    )
    # osm2pgsql discards ways referencing nodes absent from the file (the
    # normal case for bbox-clipped extracts): an incomplete way would encode
    # a truncated line, or a "closed" ring missing its first/last vertex.
    # The inner join above drops missing refs, so completeness is exactly
    # size(pts) == size(refs).
    wdf = ways.join(assembled, "way_id").filter(
        F.size("pts") == F.size("refs")
    )
    assembled = wdf.select("way_id", "pts")  # complete ways only (rel members)
    wdf = wdf.withColumn(
        "closed",
        (F.element_at("refs", 1) == F.element_at("refs", -1))
        & (F.size("refs") >= 4),
    )

    # native polygon rule (no python): area=no forces line, area=yes forces
    # polygon, else any default.style polygon-flagged key decides
    area = F.col("tags").getItem("area")
    is_area_expr = (
        F.when(area.isin("no", "0", "false"), F.lit(False))
        .when(area.isin("yes", "1", "true"), F.lit(True))
        .otherwise(F.exists(F.map_keys("tags"), lambda k: k.isin(*POLYGON_KEYS)))
    )
    wdf = wdf.withColumn("is_poly", F.col("closed") & is_area_expr)
    # osm2pgsql: ways with no surviving tag exist only as relation-member
    # geometry, never as standalone osm_line/osm_polygon rows
    wdf = (
        wdf.filter(F.size("tags") > 0)
        .withColumn("way", _encode_way_udf()(F.col("pts"), F.col("is_poly")))
        .select(F.col("way_id").alias("osm_id"), "way", "tags", "is_poly")
    )

    osm_line = _project_tags(
        wdf.filter(~F.col("is_poly")), OSM_LINE_COLUMNS, keep_tags=True
    )
    osm_polygon_ways = _project_tags(
        wdf.filter(F.col("is_poly")), _OSM_PT_POLY_COLS, keep_tags=False
    )

    # ---- multipolygon relations: per-relation ring stitching ------------
    osm_polygon = osm_polygon_ways
    if rels.limit(1).count() > 0:
        members = rels.select(
            "rel_id", "tags",
            F.posexplode(F.arrays_zip("member_ways", "member_roles")).alias("i", "m"),
        ).select(
            "rel_id", "tags",
            F.col("m.member_ways").alias("way_id"),
            F.col("m.member_roles").alias("role"),
        )
        member_pts = members.join(assembled, "way_id")

        out_schema = T.StructType(
            [
                T.StructField("osm_id", T.LongType()),
                T.StructField("way", T.BinaryType()),
                T.StructField("tags", T.MapType(T.StringType(), T.StringType())),
            ]
        )

        def stitch(key, pdf):
            segs_outer, segs_inner = [], []
            for _, r in pdf.iterrows():
                coords = np.array([[p["x"], p["y"]] for p in r["pts"]])
                (segs_inner if r["role"] == "inner" else segs_outer).append(coords)

            def close_rings(segs):
                rings, open_segs = [], []
                for s in segs:
                    (rings if np.allclose(s[0], s[-1]) else open_segs).append(s)
                # greedy endpoint stitching for open member ways
                while open_segs:
                    cur = open_segs.pop(0)
                    changed = True
                    while changed and not np.allclose(cur[0], cur[-1]):
                        changed = False
                        for i, s in enumerate(open_segs):
                            if np.allclose(cur[-1], s[0]):
                                cur = np.vstack([cur, s[1:]])
                            elif np.allclose(cur[-1], s[-1]):
                                cur = np.vstack([cur, s[::-1][1:]])
                            else:
                                continue
                            open_segs.pop(i)
                            changed = True
                            break
                    if np.allclose(cur[0], cur[-1]) and len(cur) >= 4:
                        rings.append(cur)
                return rings

            outers = close_rings(segs_outer)
            inners = close_rings(segs_inner)
            if not outers:
                return pd.DataFrame(columns=["osm_id", "way", "tags"])
            # osm2pgsql keys relation geometries as -rel_id
            rel_id = int(pdf["rel_id"].iloc[0])
            tags = pdf["tags"].iloc[0]
            if len(outers) == 1:
                geom = ("Polygon", [outers[0]] + inners)
                return pd.DataFrame(
                    [{"osm_id": -rel_id, "way": wkb.encode(geom), "tags": tags}]
                )
            # Multi-outer relation: one Polygon ROW per outer ring (downstream
            # overlay consumers decode single-Polygon ring lists), each hole
            # assigned to the outer that contains its first vertex by PIP.
            holes_of = {i: [] for i in range(len(outers))}
            for inner in inners:
                for i, outer in enumerate(outers):
                    if ops.point_in_ring(inner[0], outer):
                        holes_of[i].append(inner)
                        break
            return pd.DataFrame(
                [
                    {
                        "osm_id": -rel_id,
                        "way": wkb.encode(("Polygon", [o] + holes_of[i])),
                        "tags": tags,
                    }
                    for i, o in enumerate(outers)
                ]
            )

        rel_polys = member_pts.groupBy("rel_id").applyInPandas(stitch, out_schema)
        osm_polygon = osm_polygon_ways.unionByName(
            _project_tags(rel_polys, _OSM_PT_POLY_COLS, keep_tags=False)
        )

    return {"osm_point": osm_point, "osm_line": osm_line, "osm_polygon": osm_polygon}
