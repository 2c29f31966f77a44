"""Minimal WKB codec for 2-D Point / LineString / Polygon (+Multi*, Collection).

Little-endian ISO WKB, matching what PostGIS emits for 2-D geometries
(without SRID — EWKB SRID flags are tolerated on decode and never written).

In-memory representation (cheap, numpy-friendly):

- ``("Point", ndarray(2,))``
- ``("LineString", ndarray(N,2))``
- ``("Polygon", [ring0, ring1, ...])``  — each ring ndarray(M,2), closed
  (first == last), ring0 exterior CCW-or-CW as given (signed ops handle both)
- ``("MultiPoint"|"MultiLineString"|"MultiPolygon"|"GeometryCollection",
  [geom, ...])``
"""

from __future__ import annotations

import struct

import numpy as np

_POINT, _LINESTRING, _POLYGON = 1, 2, 3
_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION = 4, 5, 6, 7

_NAMES = {
    _POINT: "Point",
    _LINESTRING: "LineString",
    _POLYGON: "Polygon",
    _MULTIPOINT: "MultiPoint",
    _MULTILINESTRING: "MultiLineString",
    _MULTIPOLYGON: "MultiPolygon",
    _COLLECTION: "GeometryCollection",
}
_CODES = {v: k for k, v in _NAMES.items()}


def point(x: float, y: float) -> tuple:
    return ("Point", np.array([x, y], dtype=np.float64))


def linestring(coords) -> tuple:
    return ("LineString", np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def polygon(exterior, holes=()) -> tuple:
    def close(ring):
        r = np.asarray(ring, dtype=np.float64).reshape(-1, 2)
        if not np.array_equal(r[0], r[-1]):
            r = np.vstack([r, r[:1]])
        return r

    return ("Polygon", [close(exterior)] + [close(h) for h in holes])


def geometry_type(geom: tuple) -> str:
    return geom[0]


# ---------------------------------------------------------------------------
# encode
# ---------------------------------------------------------------------------

def encode(geom: tuple) -> bytes:
    kind, body = geom
    code = _CODES[kind]
    out = [b"\x01", struct.pack("<I", code)]
    if kind == "Point":
        out.append(struct.pack("<2d", float(body[0]), float(body[1])))
    elif kind == "LineString":
        arr = np.ascontiguousarray(body, dtype="<f8")
        out.append(struct.pack("<I", arr.shape[0]))
        out.append(arr.tobytes())
    elif kind == "Polygon":
        out.append(struct.pack("<I", len(body)))
        for ring in body:
            arr = np.ascontiguousarray(ring, dtype="<f8")
            out.append(struct.pack("<I", arr.shape[0]))
            out.append(arr.tobytes())
    else:  # multi / collection
        out.append(struct.pack("<I", len(body)))
        for sub in body:
            out.append(encode(sub))
    return b"".join(out)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------

def _decode_at(buf: memoryview, off: int) -> tuple[tuple, int]:
    byte_order = buf[off]
    endian = "<" if byte_order == 1 else ">"
    (raw_code,) = struct.unpack_from(endian + "I", buf, off + 1)
    off += 5
    code = raw_code & 0xFF  # mask EWKB Z/M/SRID flags
    if raw_code & 0x20000000:  # EWKB SRID present
        off += 4
    dims = 2
    if raw_code & 0x80000000 or 1000 <= (raw_code & 0xFFFF) < 2000:
        dims = 3  # Z — tolerated, Z dropped

    if code == _POINT:
        vals = struct.unpack_from(f"{endian}{dims}d", buf, off)
        off += 8 * dims
        return ("Point", np.array(vals[:2], dtype=np.float64)), off
    if code == _LINESTRING:
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        arr = np.frombuffer(buf, dtype=f"{endian}f8", count=n * dims, offset=off)
        off += 8 * n * dims
        coords = arr.reshape(n, dims)[:, :2].astype(np.float64)
        return ("LineString", coords), off
    if code == _POLYGON:
        (nr,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        rings = []
        for _ in range(nr):
            (n,) = struct.unpack_from(endian + "I", buf, off)
            off += 4
            arr = np.frombuffer(buf, dtype=f"{endian}f8", count=n * dims, offset=off)
            off += 8 * n * dims
            rings.append(arr.reshape(n, dims)[:, :2].astype(np.float64))
        return ("Polygon", rings), off
    if code in (_MULTIPOINT, _MULTILINESTRING, _MULTIPOLYGON, _COLLECTION):
        (n,) = struct.unpack_from(endian + "I", buf, off)
        off += 4
        subs = []
        for _ in range(n):
            sub, off = _decode_at(buf, off)
            subs.append(sub)
        return (_NAMES[code], subs), off
    raise ValueError(f"unsupported WKB geometry code {raw_code}")


def decode(data: bytes) -> tuple:
    geom, _ = _decode_at(memoryview(data), 0)
    return geom


# ---------------------------------------------------------------------------
# convenience
# ---------------------------------------------------------------------------

def coords(geom: tuple) -> np.ndarray:
    """Flat coordinate array of any geometry (for bbox etc.)."""
    kind, body = geom
    if kind == "Point":
        return body.reshape(1, 2)
    if kind == "LineString":
        return body
    if kind == "Polygon":
        return np.vstack(body)
    return np.vstack([coords(sub) for sub in body]) if body else np.empty((0, 2))


def polygons(geom: tuple) -> list:
    """Ring-lists of every Polygon part: Polygon -> [rings],
    MultiPolygon/GeometryCollection -> one ring-list per part, else []."""
    kind, body = geom
    if kind == "Polygon":
        return [body]
    if kind in ("MultiPolygon", "GeometryCollection"):
        out = []
        for sub in body:
            out.extend(polygons(sub))
        return out
    return []


def bbox(geom: tuple) -> tuple[float, float, float, float]:
    c = coords(geom)
    return float(c[:, 0].min()), float(c[:, 1].min()), float(c[:, 0].max()), float(c[:, 1].max())


def dumps_points(geom: tuple) -> list[tuple]:
    """ST_Dump(ST_CollectionExtract(geom, 1)) equivalent — all points within."""
    kind, body = geom
    if kind == "Point":
        return [geom]
    if kind in ("MultiPoint", "GeometryCollection"):
        out = []
        for sub in body:
            out.extend(dumps_points(sub))
        return out
    return []
