"""GeoPackage import/export via stdlib sqlite3 (S5 / S9).

The reference's user-facing format is GeoPackage (``core/export_step.py:10-54``
writes edges+nodes layers with ogr2ogr; ``core/import_step.py:84-111`` reads
GIP GPKGs).  This container has no GDAL/GeoPandas, but a GeoPackage IS a
SQLite database with three metadata tables and a 'GP' geometry blob header
(OGC 12-128r14), so stdlib ``sqlite3`` suffices:

- :func:`write_geopackage` — single-node parity/export writer: streams the
  DataFrame through ``toLocalIterator`` into a .gpkg (one layer per call).
  This is the REFERENCE-compATIBLE sink for humans and QGIS; the 100 TB sink
  remains partitioned parquet/WKB (pipeline/export.py).
- :func:`read_geopackage` — ingest a (small) GPKG layer into a Spark
  DataFrame, geometry as WKB binary — real S5 ingestion for GIP extracts.

Geometry blob layout (spec §2.1.3): magic 'GP', version 0, flags
(envelope indicator<<1 | little-endian), int32 srs_id, envelope doubles,
then standard WKB.
"""

from __future__ import annotations

import os
import sqlite3
import struct

from pyspark.sql import DataFrame, SparkSession

_GPKG_APPLICATION_ID = 0x47504B47  # 'GPKG'
_SQLITE_TYPES = {
    "bigint": "INTEGER", "int": "INTEGER", "smallint": "INTEGER",
    "tinyint": "INTEGER", "boolean": "INTEGER",
    "double": "REAL", "float": "REAL",
    "string": "TEXT", "timestamp": "TEXT", "date": "TEXT",
    "binary": "BLOB",
}


def _wkb_envelope(wkb_bytes: bytes):
    """(minx, maxx, miny, maxy) scanned from WKB point/line/polygon."""
    import numpy as np

    from netascore_spark.geometry import wkb as W

    kind, body = W.decode(wkb_bytes)
    if kind == "Point":
        return float(body[0]), float(body[0]), float(body[1]), float(body[1])
    if kind == "LineString":
        c = body
    elif kind == "Polygon":
        c = np.vstack(body)
    else:
        bb = W.bbox((kind, body))
        return float(bb[0]), float(bb[2]), float(bb[1]), float(bb[3])
    return (
        float(c[:, 0].min()), float(c[:, 0].max()),
        float(c[:, 1].min()), float(c[:, 1].max()),
    )


def _gp_blob(wkb_bytes: bytes, srid: int) -> bytes:
    minx, maxx, miny, maxy = _wkb_envelope(wkb_bytes)
    flags = (1 << 1) | 1  # envelope indicator 1 (xy), little-endian header
    header = struct.pack(
        "<2sBBi4d", b"GP", 0, flags, srid, minx, maxx, miny, maxy
    )
    return header + wkb_bytes


def _parse_gp_blob(blob: bytes) -> bytes:
    """GeoPackageBinaryHeader -> inner WKB (spec §2.1.3).

    Handles both header byte orders (flag bit 0), skips the 4-byte extension
    code of ExtendedGeoPackageBinary blobs (flag bit 5), and rejects the
    invalid envelope indicators 5-7 with a clear error instead of a
    KeyError mis-slice."""
    if blob[:2] != b"GP":
        raise ValueError("not a GeoPackage geometry blob")
    flags = blob[3]
    env_ind = (flags >> 1) & 0x07
    if env_ind > 4:
        raise ValueError(
            f"invalid GeoPackage envelope contents indicator {env_ind} (spec allows 0-4)"
        )
    env_len = {0: 0, 1: 32, 2: 48, 3: 48, 4: 64}[env_ind]
    off = 8 + env_len
    if flags & 0x20:  # ExtendedGeoPackageBinary: 4-byte extension_code
        off += 4
    return blob[off:]


def _ensure_gpkg(con: sqlite3.Connection, srid: int) -> None:
    con.execute(f"PRAGMA application_id = {_GPKG_APPLICATION_ID}")
    con.execute("PRAGMA user_version = 10300")  # GPKG 1.3
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_spatial_ref_sys (
            srs_name TEXT NOT NULL, srs_id INTEGER PRIMARY KEY,
            organization TEXT NOT NULL, organization_coordsys_id INTEGER NOT NULL,
            definition TEXT NOT NULL, description TEXT)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_contents (
            table_name TEXT PRIMARY KEY, data_type TEXT NOT NULL,
            identifier TEXT UNIQUE, description TEXT DEFAULT '',
            last_change DATETIME DEFAULT (strftime('%Y-%m-%dT%H:%M:%fZ','now')),
            min_x DOUBLE, min_y DOUBLE, max_x DOUBLE, max_y DOUBLE,
            srs_id INTEGER)"""
    )
    con.execute(
        """CREATE TABLE IF NOT EXISTS gpkg_geometry_columns (
            table_name TEXT PRIMARY KEY, column_name TEXT NOT NULL,
            geometry_type_name TEXT NOT NULL, srs_id INTEGER NOT NULL,
            z TINYINT NOT NULL, m TINYINT NOT NULL)"""
    )
    for sid, name, org, code, definition in [
        (-1, "Undefined cartesian SRS", "NONE", -1, "undefined"),
        (0, "Undefined geographic SRS", "NONE", 0, "undefined"),
        (4326, "WGS 84", "EPSG", 4326, "GEOGCS[\"WGS 84\",DATUM[\"WGS_1984\"]]"),
    ]:
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
            (name, sid, org, code, definition),
        )
    if srid not in (-1, 0, 4326):
        con.execute(
            "INSERT OR IGNORE INTO gpkg_spatial_ref_sys VALUES (?,?,?,?,?,NULL)",
            (f"EPSG:{srid}", srid, "EPSG", srid, f"PROJCS[\"EPSG:{srid}\"]"),
        )


def write_geopackage(
    df: DataFrame,
    path: str,
    layer: str,
    geom_col: str = "geom",
    geometry_type: str = "GEOMETRY",
    srid: int = 32633,
    batch_size: int = 10_000,
    fid_col: str | None = None,
) -> int:
    """Stream ``df`` into ``path`` as GPKG layer ``layer``; returns row count.

    Single-node by design (the driver writes one sqlite file — the parity
    format, mirroring ``ogr2ogr`` in core/export_step.py:29-41).  Scale
    exports use the parquet sink; this is for handing results to QGIS and
    for byte-level parity checks against the reference's .gpkg output.

    ``fid_col``: name of an integer column to use as the feature id —
    ``ogr2ogr -lco FID=edge_id`` parity (export_step.py:33): the column
    becomes the ``INTEGER PRIMARY KEY`` itself instead of an autoincrement
    ``fid`` alongside it.
    """
    attr_cols = [
        f for f in df.schema.fields if f.name not in (geom_col, fid_col)
    ]
    con = sqlite3.connect(path)
    try:
        _ensure_gpkg(con, srid)
        col_defs = ", ".join(
            f'"{f.name}" {_SQLITE_TYPES.get(f.dataType.simpleString(), "TEXT")}'
            for f in attr_cols
        )
        pk = (
            f'"{fid_col}" INTEGER PRIMARY KEY'
            if fid_col
            else "fid INTEGER PRIMARY KEY AUTOINCREMENT"
        )
        con.execute(f'DROP TABLE IF EXISTS "{layer}"')
        con.execute(
            f'CREATE TABLE "{layer}" ({pk}, '
            f'"{geom_col}" BLOB{", " + col_defs if col_defs else ""})'
        )
        id_names = [f'"{fid_col}"'] if fid_col else []
        placeholders = ", ".join(["?"] * (len(id_names) + 1 + len(attr_cols)))
        names = ", ".join(
            id_names + [f'"{geom_col}"'] + [f'"{f.name}"' for f in attr_cols]
        )
        n = 0
        bounds = [None, None, None, None]
        batch = []
        for row in df.toLocalIterator():
            g = row[geom_col]
            blob = None
            if g is not None:
                blob = _gp_blob(bytes(g), srid)
                e = _wkb_envelope(bytes(g))
                bounds[0] = e[0] if bounds[0] is None else min(bounds[0], e[0])
                bounds[1] = e[2] if bounds[1] is None else min(bounds[1], e[2])
                bounds[2] = e[1] if bounds[2] is None else max(bounds[2], e[1])
                bounds[3] = e[3] if bounds[3] is None else max(bounds[3], e[3])
            def _adapt(v):
                if v is None or isinstance(v, (int, float, str, bytes)):
                    return v
                if isinstance(v, bytearray):
                    return bytes(v)
                if isinstance(v, bool):
                    return int(v)
                return str(v)  # timestamps etc. -> ISO text

            vals = ([row[fid_col]] if fid_col else []) + [blob] + [
                _adapt(row[f.name]) for f in attr_cols
            ]
            batch.append(vals)
            n += 1
            if len(batch) >= batch_size:
                con.executemany(
                    f'INSERT INTO "{layer}" ({names}) VALUES ({placeholders})', batch
                )
                batch = []
        if batch:
            con.executemany(
                f'INSERT INTO "{layer}" ({names}) VALUES ({placeholders})', batch
            )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_contents "
            "(table_name, data_type, identifier, min_x, min_y, max_x, max_y, srs_id) "
            "VALUES (?,?,?,?,?,?,?,?)",
            (layer, "features", layer, bounds[0], bounds[1], bounds[2], bounds[3], srid),
        )
        con.execute(
            "INSERT OR REPLACE INTO gpkg_geometry_columns VALUES (?,?,?,?,0,0)",
            (layer, geom_col, geometry_type, srid),
        )
        con.commit()
        return n
    finally:
        con.close()


def read_geopackage(
    spark: SparkSession, path: str, layer: str, geom_col: str | None = None
) -> DataFrame:
    """GPKG layer -> Spark DataFrame (geometry column as raw WKB binary).

    Mirrors the reference's ogr2ogr GIP import (core/import_step.py:84-111).
    Driver-side read (GPKGs are single-file by nature); the result is a
    regular distributed DataFrame.
    """
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    con = sqlite3.connect(path)
    try:
        if geom_col is None:
            r = con.execute(
                "SELECT column_name FROM gpkg_geometry_columns WHERE table_name=?",
                (layer,),
            ).fetchone()
            geom_col = r[0] if r else None
        cur = con.execute(f'SELECT * FROM "{layer}"')
        cols = [d[0] for d in cur.description]
        rows = []
        for raw in cur:
            vals = list(raw)
            if geom_col is not None:
                gi = cols.index(geom_col)
                if vals[gi] is not None:
                    vals[gi] = _parse_gp_blob(bytes(vals[gi]))
            rows.append(tuple(vals))
    finally:
        con.close()
    from pyspark.sql import types as T

    fields = []
    for i, c in enumerate(cols):
        sample = next((r[i] for r in rows if r[i] is not None), None)
        if c == geom_col or isinstance(sample, (bytes, bytearray)):
            t = T.BinaryType()
        elif isinstance(sample, int):
            t = T.LongType()
        elif isinstance(sample, float):
            t = T.DoubleType()
        else:
            t = T.StringType()
        fields.append(T.StructField(c, t, True))
    return spark.createDataFrame(rows, T.StructType(fields))
