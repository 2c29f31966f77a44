"""GeoTIFF -> DEM grid-table converter (S6 real raster ingestion).

The reference imports DEM rasters with ``raster2pgsql`` and samples them
with ``ST_Value`` (core/optional_step.py:11-39, osm_attributes.sql.j2:738).
Our engine's raster representation is a (cell_x, cell_y, elevation) grid
table joined by cell equi-join (pipeline/attributes.py:node_elevation);
this module turns an actual GeoTIFF file into that table with a pure-python
TIFF reader (no GDAL/rasterio in the container; ``rasterio`` is used
automatically if importable).

Supported natively: uncompressed (Compression=1) single-band strip- or
tile-organized TIFFs, int16/int32/uint16/float32/float64 samples, little or
big endian, with the GeoTIFF ModelPixelScale + ModelTiepoint tags mapping
pixels to projected coordinates.  That covers e.g. EU-DEM / SRTM exports
ogr-translated to uncompressed TIFF; anything fancier needs rasterio.

Cell convention: cell_x = floor(x / cell), matching node_elevation; the
elevation written for a cell is the pixel whose CENTER falls in that cell
(nearest-neighbour, the same semantics as ST_Value on the node point).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_TILE_WIDTH = 322
_TAG_TILE_HEIGHT = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd_values(data: bytes, bo: str, ttype: int, count: int, value_field: bytes):
    size = _TYPE_SIZES[ttype] * count
    if size <= 4:
        raw = value_field[:size]
    else:
        (off,) = struct.unpack(bo + "I", value_field)
        raw = data[off:off + size]
    if ttype in _TYPE_FMT:
        return list(struct.unpack(bo + _TYPE_FMT[ttype] * count, raw))
    return raw


def read_geotiff(path: str):
    """-> (array HxW float64, pixel_size (sx, sy), origin (x0, y0)).

    origin is the projected coordinate of the TOP-LEFT corner of pixel
    (0, 0); y decreases with row index (north-up raster).
    """
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF file")
    magic, ifd_off = struct.unpack(bo + "HI", data[2:8])
    if magic != 42:
        raise ValueError("not a classic TIFF (BigTIFF unsupported)")
    (n_tags,) = struct.unpack(bo + "H", data[ifd_off:ifd_off + 2])
    tags = {}
    for i in range(n_tags):
        o = ifd_off + 2 + 12 * i
        tag, ttype, count = struct.unpack(bo + "HHI", data[o:o + 8])
        tags[tag] = _read_ifd_values(data, bo, ttype, count, data[o + 8:o + 12])

    if tags.get(_TAG_COMPRESSION, [1])[0] != 1:
        raise ValueError("compressed TIFF unsupported without rasterio")
    width = int(tags[_TAG_WIDTH][0])
    height = int(tags[_TAG_HEIGHT][0])
    bits = int(tags.get(_TAG_BITS, [32])[0])
    sfmt = int(tags.get(_TAG_SAMPLE_FORMAT, [1])[0])  # 1 uint, 2 int, 3 float
    dtype = {
        (1, 16): "u2", (1, 32): "u4", (2, 16): "i2", (2, 32): "i4",
        (3, 32): "f4", (3, 64): "f8",
    }.get((sfmt, bits))
    if dtype is None:
        raise ValueError(f"unsupported sample format/bits {sfmt}/{bits}")
    dt = np.dtype(bo + dtype)

    arr = np.empty((height, width), dtype=dt)
    if _TAG_TILE_OFFSETS in tags:
        tw = int(tags[_TAG_TILE_WIDTH][0])
        th = int(tags[_TAG_TILE_HEIGHT][0])
        offs = tags[_TAG_TILE_OFFSETS]
        i = 0
        for ty in range(0, height, th):
            for tx in range(0, width, tw):
                tile = np.frombuffer(
                    data, dtype=dt, count=tw * th, offset=int(offs[i])
                ).reshape(th, tw)
                arr[ty:ty + th, tx:tx + tw] = tile[
                    : min(th, height - ty), : min(tw, width - tx)
                ]
                i += 1
    else:
        rps = int(tags.get(_TAG_ROWS_PER_STRIP, [height])[0])
        offs = tags[_TAG_STRIP_OFFSETS]
        for i, off in enumerate(offs):
            r0 = i * rps
            nrows = min(rps, height - r0)
            strip = np.frombuffer(
                data, dtype=dt, count=nrows * width, offset=int(off)
            ).reshape(nrows, width)
            arr[r0:r0 + nrows] = strip

    if _TAG_PIXEL_SCALE not in tags or _TAG_TIEPOINT not in tags:
        raise ValueError("missing GeoTIFF georeferencing tags")
    sx, sy = float(tags[_TAG_PIXEL_SCALE][0]), float(tags[_TAG_PIXEL_SCALE][1])
    tp = tags[_TAG_TIEPOINT]  # i, j, k, x, y, z
    x0 = float(tp[3]) - float(tp[0]) * sx
    y0 = float(tp[4]) + float(tp[1]) * sy
    return arr.astype("f8"), (sx, sy), (x0, y0)


def geotiff_to_dem_grid(
    spark: SparkSession,
    path: str,
    cell: float = 10.0,
    nodata: float | None = None,
) -> DataFrame:
    """GeoTIFF -> (cell_x, cell_y, elevation) Spark DataFrame.

    One output row per grid cell whose center-pixel is valid; elevation is
    the raster value at the cell center (ST_Value semantics).  Uses
    rasterio when importable, else the built-in reader above.
    """
    try:  # pragma: no cover - rasterio absent in this container
        import rasterio

        with rasterio.open(path) as src:
            arr = src.read(1).astype("f8")
            sx, sy = src.transform.a, -src.transform.e
            x0, y0 = src.transform.c, src.transform.f
            if nodata is None:
                nodata = src.nodata
    except ImportError:
        arr, (sx, sy), (x0, y0) = read_geotiff(path)

    height, width = arr.shape
    # raster extent in projected coords (y0 is the TOP edge)
    xmin, xmax = x0, x0 + width * sx
    ymin, ymax = y0 - height * sy, y0
    cxs = np.arange(int(np.floor(xmin / cell)), int(np.ceil(xmax / cell)))
    cys = np.arange(int(np.floor(ymin / cell)), int(np.ceil(ymax / cell)))
    gcx, gcy = np.meshgrid(cxs, cys)
    # cell centers -> pixel indices (nearest pixel containing the center)
    px = np.floor(((gcx + 0.5) * cell - x0) / sx).astype("i8")
    py = np.floor((y0 - (gcy + 0.5) * cell) / sy).astype("i8")
    ok = (px >= 0) & (px < width) & (py >= 0) & (py < height)
    vals = np.full(gcx.shape, np.nan)
    vals[ok] = arr[py[ok], px[ok]]
    if nodata is not None:
        vals[vals == nodata] = np.nan
    keep = ~np.isnan(vals)
    pdf = pd.DataFrame(
        {
            "cell_x": gcx[keep].astype("int64"),
            "cell_y": gcy[keep].astype("int64"),
            "elevation": np.round(vals[keep], 2),
        }
    )
    return spark.createDataFrame(pdf)


def write_geotiff(path: str, arr: np.ndarray, pixel_size, origin) -> None:
    """Minimal uncompressed float64 GeoTIFF writer (test fixtures only)."""
    arr = np.asarray(arr, dtype="<f8")
    height, width = arr.shape
    sx, sy = pixel_size
    x0, y0 = origin
    pixel_data = arr.tobytes()
    # header(8) + IFD entry count(2) + 10 tags(120) + next-IFD(4) = offset 134
    # then external values: pixel scale (3 doubles), tiepoint (6 doubles)
    n_tags = 10
    ifd_off = 8
    values_off = ifd_off + 2 + 12 * n_tags + 4
    scale_off = values_off
    tie_off = scale_off + 24
    data_off = tie_off + 48

    def tag(tid, ttype, count, value):
        return struct.pack("<HHI4s", tid, ttype, count, value)

    def ival(v):
        return struct.pack("<I", v)

    def sval(v):
        return struct.pack("<HH", v, 0)

    tags = b"".join(
        [
            tag(_TAG_WIDTH, 3, 1, sval(width)),
            tag(_TAG_HEIGHT, 3, 1, sval(height)),
            tag(_TAG_BITS, 3, 1, sval(64)),
            tag(_TAG_COMPRESSION, 3, 1, sval(1)),
            tag(262, 3, 1, sval(1)),  # PhotometricInterpretation
            tag(_TAG_STRIP_OFFSETS, 4, 1, ival(data_off)),
            tag(_TAG_ROWS_PER_STRIP, 3, 1, sval(height)),
            tag(_TAG_STRIP_COUNTS, 4, 1, ival(len(pixel_data))),
            tag(_TAG_SAMPLE_FORMAT, 3, 1, sval(3)),
            tag(_TAG_PIXEL_SCALE, 12, 3, ival(scale_off)),
        ]
    )
    # TIEPOINT tag must be sorted after PIXEL_SCALE (33550 < 33922): append
    tags += tag(_TAG_TIEPOINT, 12, 6, ival(tie_off))
    n_tags += 1
    values_off = ifd_off + 2 + 12 * n_tags + 4
    scale_off = values_off
    tie_off = scale_off + 24
    data_off = tie_off + 48
    # rebuild with corrected offsets
    tags = b"".join(
        [
            tag(_TAG_WIDTH, 3, 1, sval(width)),
            tag(_TAG_HEIGHT, 3, 1, sval(height)),
            tag(_TAG_BITS, 3, 1, sval(64)),
            tag(_TAG_COMPRESSION, 3, 1, sval(1)),
            tag(262, 3, 1, sval(1)),
            tag(_TAG_STRIP_OFFSETS, 4, 1, ival(data_off)),
            tag(_TAG_ROWS_PER_STRIP, 3, 1, sval(height)),
            tag(_TAG_STRIP_COUNTS, 4, 1, ival(len(pixel_data))),
            tag(_TAG_SAMPLE_FORMAT, 3, 1, sval(3)),
            tag(_TAG_PIXEL_SCALE, 12, 3, ival(scale_off)),
            tag(_TAG_TIEPOINT, 12, 6, ival(tie_off)),
        ]
    )
    with open(path, "wb") as f:
        f.write(b"II" + struct.pack("<HI", 42, ifd_off))
        f.write(struct.pack("<H", n_tags))
        f.write(tags)
        f.write(struct.pack("<I", 0))  # next IFD
        f.write(struct.pack("<3d", sx, sy, 0.0))
        f.write(struct.pack("<6d", 0.0, 0.0, 0.0, x0, y0, 0.0))
        f.write(pixel_data)
