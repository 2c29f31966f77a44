""".osm.pbf ingestion (S3) — the format country-scale extracts actually ship.

The reference's osm2pgsql consumes .pbf natively (core/import_step.py:423
feeds it either .osm or .osm.pbf); this module closes the same gap for the
Spark pipeline without any protobuf dependency: the PBF wire format is
parsed with stdlib struct/zlib only, then the element stream feeds the SAME
distributed assembly + default.style classification as the XML path
(sources/osmxml.py — parse_osm_stream / assemble_tables).

Format (https://wiki.openstreetmap.org/wiki/PBF_Format):

- file = repeat( int32-be header_len, BlobHeader, Blob )
- BlobHeader { 1: type (``OSMHeader`` | ``OSMData``), 3: datasize }
- Blob { 1: raw, 2: raw_size, 3: zlib_data }
- OSMData blob = PrimitiveBlock { 1: stringtable, 2: primitivegroup*,
  17: granularity (default 100 nanodeg), 19: lat_offset, 20: lon_offset }
- PrimitiveGroup { 1: nodes*, 2: dense, 3: ways*, 4: relations* }
- DenseNodes: delta-coded sint64 ids/lats/lons + interleaved keys_vals
  (0 terminates a node's tag list)
- Way { 1: id, 2: keys, 3: vals, 8: delta-coded sint64 refs }
- Relation { 1: id, 2: keys, 3: vals, 8: roles_sid, 9: delta memids,
  10: member types (0 node, 1 way, 2 relation) }

Two decode strategies share one per-blob decoder (:func:`_decode_block`):

- **distributed (default)**: blob framing is self-delimiting, so a cheap
  header-only offset scan on the driver (:func:`_scan_blob_index` — 4-byte
  length + ~30-byte BlobHeader per blob, seeking past the payloads) yields
  (offset, size) ranges that executors decompress and decode in parallel.
  This removes the measured ~1.5 MB/s single-core python decode ceiling
  (BENCH.md "single-reader source ceiling") — decode throughput scales
  with executor count.  Requires ``path`` to be readable from every
  executor (shared FS / object store on a real cluster; trivially true in
  local mode).
- **sequential** (``distributed=False``): the original bounded-memory
  driver stream (one decompressed blob at a time, <= 32 MB by spec) —
  osm2pgsql-parity single-reader behaviour, still used to resolve the
  auto-UTM zone and by tools/bench_pbf.py.

Both strategies apply the same osm2pgsql default.style tag delete list as
the XML tokenizer (osmxml._clean_tags) and feed the same distributed
assembly, so the two containers and the two strategies stay
byte-identical (pinned by tests/test_osmpbf.py).
"""

from __future__ import annotations

import os
import struct
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from netascore_spark.functions import projection
from netascore_spark.pipeline import cache
from netascore_spark.sources.osmxml import (
    _CHUNK,
    _clean_tags,
    _make_projector,
    assemble_tables,
    parse_osm_stream,
)

_MEMBER_TYPES = ("node", "way", "relation")


# ---------------------------------------------------------------------------
# protobuf wire primitives (stdlib only)
# ---------------------------------------------------------------------------

def _varint(buf: memoryview, pos: int) -> tuple[int, int]:
    """Unsigned varint at pos -> (value, next_pos)."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _zigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def _signed64(v: int) -> int:
    """Plain (non-zigzag) int64 fields: >=2^63 is a negative two's-complement
    value (osm ids are int64; negative ids appear in synthetic fixtures)."""
    return v - (1 << 64) if v >= (1 << 63) else v


def _fields(buf: memoryview) -> Iterator[tuple[int, int, object]]:
    """Iterate (field_number, wire_type, value) over a message buffer.
    wire 0 -> int, wire 2 -> memoryview, wire 5/1 -> raw bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _varint(buf, pos)
        field, wire = key >> 3, key & 7
        if wire == 0:
            v, pos = _varint(buf, pos)
            yield field, wire, v
        elif wire == 2:
            ln, pos = _varint(buf, pos)
            yield field, wire, buf[pos : pos + ln]
            pos += ln
        elif wire == 5:
            yield field, wire, bytes(buf[pos : pos + 4])
            pos += 4
        elif wire == 1:
            yield field, wire, bytes(buf[pos : pos + 8])
            pos += 8
        else:  # pragma: no cover - groups are not used by PBF
            raise ValueError(f"unsupported wire type {wire}")


def _packed_varints(buf: memoryview) -> list[int]:
    out = []
    pos = 0
    n = len(buf)
    while pos < n:
        v, pos = _varint(buf, pos)
        out.append(v)
    return out


def _packed_sint64(buf: memoryview) -> list[int]:
    return [_zigzag(v) for v in _packed_varints(buf)]


def _nanodeg(n: int) -> float:
    """Exact decimal conversion of n x 10^-9 degrees.  ``1e-9 * n`` (a float
    multiply) can land 1 ULP off the true closest double; going through the
    decimal string matches what parsing the same coordinate from .osm XML
    produces — WKB byte-identity across the two containers."""
    return float(f"{n}e-9")


def _delta_decode(vals: list[int]) -> list[int]:
    out = []
    acc = 0
    for v in vals:
        acc += v
        out.append(acc)
    return out


# ---------------------------------------------------------------------------
# blob framing
# ---------------------------------------------------------------------------

def _scan_blob_index(path: str) -> list[tuple[str, int, int]]:
    """Header-only offset scan: [(blob_type, payload_offset, datasize)].

    Reads the 4-byte length + BlobHeader of each blob and SEEKS past the
    payload — O(#blobs) tiny reads, no decompression.  This is the cheap
    first pass that makes the decode distributable: payload byte ranges
    are self-contained PrimitiveBlocks any executor can decode alone."""
    index: list[tuple[str, int, int]] = []
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if len(head) < 4:
                return index
            (hlen,) = struct.unpack(">I", head)
            header = memoryview(fh.read(hlen))
            btype = ""
            datasize = 0
            for field, _, v in _fields(header):
                if field == 1:
                    btype = bytes(v).decode()
                elif field == 3:
                    datasize = v
            index.append((btype, fh.tell(), datasize))
            fh.seek(datasize, 1)


def _blob_payload(blob: memoryview) -> bytes:
    """Blob message bytes -> decompressed payload."""
    raw = None
    for field, _, v in _fields(blob):
        if field == 1:  # uncompressed
            raw = bytes(v)
        elif field == 3:  # zlib
            raw = zlib.decompress(bytes(v))
    if raw is None:
        raise ValueError("blob without raw/zlib data")
    return raw


def _iter_blobs(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (blob_type, decompressed_payload) — sequential driver stream."""
    with open(path, "rb") as fh:
        while True:
            head = fh.read(4)
            if len(head) < 4:
                return
            (hlen,) = struct.unpack(">I", head)
            header = memoryview(fh.read(hlen))
            btype = ""
            datasize = 0
            for field, _, v in _fields(header):
                if field == 1:
                    btype = bytes(v).decode()
                elif field == 3:
                    datasize = v
            yield btype, _blob_payload(memoryview(fh.read(datasize)))


# ---------------------------------------------------------------------------
# PrimitiveBlock decoding -> element stream
# ---------------------------------------------------------------------------

def _decode_dense(dense: memoryview, strings: list[str], gran: int,
                  lat_off: int, lon_off: int) -> Iterator[tuple]:
    ids = lats = lons = []
    keys_vals: list[int] = []
    for field, _, v in _fields(dense):
        if field == 1:
            ids = _delta_decode(_packed_sint64(v))
        elif field == 8:
            lats = _delta_decode(_packed_sint64(v))
        elif field == 9:
            lons = _delta_decode(_packed_sint64(v))
        elif field == 10:
            keys_vals = _packed_varints(v)
    kv_pos = 0
    for i, nid in enumerate(ids):
        tags = {}
        while kv_pos < len(keys_vals) and keys_vals[kv_pos] != 0:
            tags[strings[keys_vals[kv_pos]]] = strings[keys_vals[kv_pos + 1]]
            kv_pos += 2
        kv_pos += 1  # the 0 terminator
        yield ("node", (nid, _nanodeg(lon_off + gran * lons[i]),
                        _nanodeg(lat_off + gran * lats[i]), _clean_tags(tags)))


def _decode_way(way: memoryview, strings: list[str]) -> tuple:
    wid = 0
    keys: list[int] = []
    vals: list[int] = []
    refs: list[int] = []
    for field, _, v in _fields(way):
        if field == 1:
            wid = _signed64(v)
        elif field == 2:
            keys = _packed_varints(v)
        elif field == 3:
            vals = _packed_varints(v)
        elif field == 8:
            refs = _delta_decode(_packed_sint64(v))
    tags = _clean_tags({strings[k]: strings[x] for k, x in zip(keys, vals)})
    return ("way", (wid, refs, tags))


def _decode_relation(rel: memoryview, strings: list[str]) -> tuple:
    rid = 0
    keys: list[int] = []
    vals: list[int] = []
    roles: list[int] = []
    memids: list[int] = []
    types: list[int] = []
    for field, _, v in _fields(rel):
        if field == 1:
            rid = _signed64(v)
        elif field == 2:
            keys = _packed_varints(v)
        elif field == 3:
            vals = _packed_varints(v)
        elif field == 8:
            roles = _packed_varints(v)
        elif field == 9:
            memids = _delta_decode(_packed_sint64(v))
        elif field == 10:
            types = _packed_varints(v)
    tags = _clean_tags({strings[k]: strings[x] for k, x in zip(keys, vals)})
    members = [
        (_MEMBER_TYPES[t], m, strings[r])
        for t, m, r in zip(types, memids, roles)
    ]
    return ("relation", (rid, members, tags))


def _decode_block(raw: bytes) -> Iterator[tuple]:
    """One decompressed OSMData PrimitiveBlock -> element stream.  Shared
    by the sequential iterator and the distributed per-range decode."""
    block = memoryview(raw)
    strings: list[str] = []
    groups: list[memoryview] = []
    gran, lat_off, lon_off = 100, 0, 0
    for field, _, v in _fields(block):
        if field == 1:  # stringtable
            strings = [
                bytes(s).decode("utf-8")
                for f, _, s in _fields(v)
                if f == 1
            ]
        elif field == 2:
            groups.append(v)
        elif field == 17:
            gran = v
        elif field == 19:
            lat_off = v
        elif field == 20:
            lon_off = v
    for g in groups:
        for field, _, v in _fields(g):
            if field == 2:  # dense nodes
                yield from _decode_dense(v, strings, gran, lat_off, lon_off)
            elif field == 3:
                yield _decode_way(v, strings)
            elif field == 4:
                yield _decode_relation(v, strings)
            elif field == 1:  # non-dense Node (rare in real files)
                nid = lat = lon = 0
                keys: list[int] = []
                vals: list[int] = []
                for f2, _, v2 in _fields(v):
                    if f2 == 1:
                        nid = _signed64(v2)
                    elif f2 == 2:
                        keys = _packed_varints(v2)
                    elif f2 == 3:
                        vals = _packed_varints(v2)
                    elif f2 == 8:
                        lat = _zigzag(v2)
                    elif f2 == 9:
                        lon = _zigzag(v2)
                tags = _clean_tags(
                    {strings[k]: strings[x] for k, x in zip(keys, vals)}
                )
                yield (
                    "node",
                    (nid, _nanodeg(lon_off + gran * lon),
                     _nanodeg(lat_off + gran * lat), tags),
                )


def iter_pbf_elements(path: str) -> Iterator[tuple]:
    """Stream ('node'|'way'|'relation', payload) — same protocol as
    osmxml._iter_elements, bounded memory (one decoded blob at a time)."""
    for btype, raw in _iter_blobs(path):
        if btype != "OSMData":
            continue  # OSMHeader carries bbox/required_features only
        yield from _decode_block(raw)


# ---------------------------------------------------------------------------
# distributed decode
# ---------------------------------------------------------------------------

def _resolve_projection(path: str, projection_spec):
    """Pin the auto-UTM zone BEFORE shipping the projector to executors.

    osmxml's ``"utm"`` auto mode fixes the zone from the FIRST chunk's mean
    longitude — stateful and order-dependent, so a per-task auto projector
    could pick DIFFERENT zones on different partitions.  Replicate the
    sequential semantics exactly on the driver (mean over the first
    ``_CHUNK`` node longitudes in file order; one bounded partial decode),
    then hand executors an explicit-zone spec.  Explicit "utmNN", None,
    and callable specs are already deterministic and pass through."""
    if not (isinstance(projection_spec, str) and projection_spec == "utm"):
        return projection_spec
    lons: list[float] = []
    for kind, payload in iter_pbf_elements(path):
        if kind == "node":
            lons.append(payload[1])
            if len(lons) >= _CHUNK:
                break
    if not lons:
        return None  # no nodes -> projector is never applied
    import numpy as np

    return f"utm{projection.utm_zone(float(np.mean(np.array(lons))))}"


def _decode_ranges(path: str, projection_spec):
    """Partition function: (payload_offset, datasize) rows -> unified
    element tuples (kind, eid, x, y, refs, roles, tags).  Runs on
    executors; each task opens the file, seeks to its blobs, and decodes.
    Node coordinates are projected per blob (vectorized numpy — same
    batched math as the sequential path's per-chunk projection)."""

    def run(part):
        import numpy as np

        proj = _make_projector(projection_spec)
        with open(path, "rb") as fh:
            for off, size in part:
                fh.seek(off)
                raw = _blob_payload(memoryview(fh.read(size)))
                pending: list[tuple] = []
                for kind, payload in _decode_block(raw):
                    if kind == "node":
                        pending.append(payload)
                    elif kind == "way":
                        wid, refs, tags = payload
                        yield ("way", wid, None, None, refs, None, tags)
                    else:  # relation: same multipolygon filter as
                        # parse_osm_stream (osm2pgsql default.style)
                        rid, members, tags = payload
                        if tags.get("type") != "multipolygon":
                            continue
                        mw = [r for (t, r, _) in members if t == "way"]
                        roles = [ro for (t, _, ro) in members if t == "way"]
                        yield ("relation", rid, None, None, mw, roles, tags)
                if pending:
                    lon = np.array([n[1] for n in pending])
                    lat = np.array([n[2] for n in pending])
                    x, y = proj(lon, lat)
                    for (nid, _, _, tg), px, py in zip(pending, x, y):
                        yield ("node", nid, float(px), float(py),
                               None, None, tg)

    return run


# ---------------------------------------------------------------------------
# public reader
# ---------------------------------------------------------------------------

def read_osm_pbf(
    spark: SparkSession,
    path: str,
    projection_spec="utm",
    distributed: bool = True,
    slices: int | None = None,
) -> dict[str, DataFrame]:
    """.osm.pbf -> {"osm_point", "osm_line", "osm_polygon"}.

    Identical output contract to osmxml.read_osm_xml — only the tokenizer
    differs; assembly, classification, and projection are shared.

    ``distributed=True`` (default) decodes blobs on executors from a
    header-only offset index — removes the single-reader decode ceiling
    (BENCH.md); ``path`` must be visible to every executor (shared FS /
    object store; always true in local mode).  ``distributed=False`` keeps
    the sequential driver stream.  Both produce identical tables (pinned
    by tests/test_osmpbf.py::test_pbf_distributed_matches_sequential)."""
    if not distributed:
        nodes, ways, rels = parse_osm_stream(
            spark, iter_pbf_elements(path), projection_spec
        )
        return assemble_tables(spark, nodes, ways, rels)

    index = [
        (off, size)
        for btype, off, size in _scan_blob_index(path)
        if btype == "OSMData"
    ]
    if not index:
        return read_osm_pbf(spark, path, projection_spec, distributed=False)
    spec = _resolve_projection(path, projection_spec)
    apath = os.path.abspath(path)
    sc = spark.sparkContext
    n_slices = min(len(index), max(slices or 2 * sc.defaultParallelism, 1))
    uni_schema = (
        "kind string, eid long, x double, y double, refs array<long>, "
        "roles array<string>, tags map<string,string>"
    )
    rdd = sc.parallelize(index, n_slices).mapPartitions(
        _decode_ranges(apath, spec)
    )
    # persist the unified decode: the three table branches (and assembly's
    # own multi-scan joins) would otherwise re-decode every blob per scan
    uni = cache.track(spark.createDataFrame(rdd, uni_schema).persist())
    nodes = uni.where(F.col("kind") == "node").select(
        F.col("eid").alias("node_id"), "x", "y", "tags"
    )
    ways = uni.where(F.col("kind") == "way").select(
        F.col("eid").alias("way_id"), "refs", "tags"
    )
    rels = uni.where(F.col("kind") == "relation").select(
        F.col("eid").alias("rel_id"),
        F.col("refs").alias("member_ways"),
        F.col("roles").alias("member_roles"),
        "tags",
    )
    return assemble_tables(spark, nodes, ways, rels)
