""".osm.pbf ingestion (sources/osmpbf.py): wire-format decode + parity with
the XML path (same assembly, same classification, byte-identical WKB)."""

import struct
import zlib

import numpy as np
import pytest

from netascore_spark.geometry import wkb
from netascore_spark.sources import fixtures
from netascore_spark.sources.osmpbf import read_osm_pbf
from netascore_spark.sources.osmxml import read_osm_xml

from tests.test_osmxml import _write_osm


# ---------------------------------------------------------------------------
# writer (test-only): encode nodes/ways/relations as a .osm.pbf
# ---------------------------------------------------------------------------

def _uv(v: int) -> bytes:
    v &= 0xFFFFFFFFFFFFFFFF  # negative int64 -> 10-byte two's-complement
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _sv(v: int) -> bytes:  # sint64 zigzag
    return _uv((v << 1) ^ (v >> 63))


def _ld(field: int, payload: bytes) -> bytes:  # length-delimited
    return _uv((field << 3) | 2) + _uv(len(payload)) + payload


def _vi(field: int, v: int) -> bytes:  # varint field
    return _uv(field << 3) + _uv(v)


def _packed(field: int, vals: list[bytes]) -> bytes:
    return _ld(field, b"".join(vals))


def _delta_s(vals: list[int]) -> list[bytes]:
    out, prev = [], 0
    for v in vals:
        out.append(_sv(v - prev))
        prev = v
    return out


_MTYPE = {"node": 0, "way": 1, "relation": 2}


def _write_pbf(path, nodes, ways, relations=(), granularity=1):
    """nodes: (id, lon, lat, tags); ways: (id, refs, tags);
    relations: (id, [(type, ref, role)], tags).  granularity=1 nanodeg so
    decimal coordinates round-trip bit-identically with the XML path."""
    strings = [b""]
    sidx = {b"": 0}

    def s(txt: str) -> int:
        b = txt.encode("utf-8")
        if b not in sidx:
            sidx[b] = len(strings)
            strings.append(b)
        return sidx[b]

    # DenseNodes
    ids = [n[0] for n in nodes]
    lons = [round(n[1] * 1e9 / granularity) for n in nodes]
    lats = [round(n[2] * 1e9 / granularity) for n in nodes]
    kv = []
    for n in nodes:
        for k, v in n[3].items():
            kv.append(_uv(s(k)))
            kv.append(_uv(s(v)))
        kv.append(_uv(0))
    dense = (
        _packed(1, _delta_s(ids))
        + _packed(8, _delta_s(lats))
        + _packed(9, _delta_s(lons))
        + _packed(10, kv)
    )
    group = _ld(2, dense)
    for wid, refs, tags in ways:
        way = _vi(1, wid)
        way += _packed(2, [_uv(s(k)) for k in tags])
        way += _packed(3, [_uv(s(v)) for v in tags.values()])
        way += _packed(8, _delta_s(refs))
        group += _ld(3, way)
    for rid, members, tags in relations:
        rel = _vi(1, rid)
        rel += _packed(2, [_uv(s(k)) for k in tags])
        rel += _packed(3, [_uv(s(v)) for v in tags.values()])
        rel += _packed(8, [_uv(s(role)) for _, _, role in members])
        rel += _packed(9, _delta_s([ref for _, ref, _ in members]))
        rel += _packed(10, [_uv(_MTYPE[t]) for t, _, _ in members])
        group += _ld(4, rel)

    block = _ld(1, b"".join(_ld(1, x) for x in strings))
    block += _ld(2, group)
    block += _vi(17, granularity)

    def blob(btype: str, payload: bytes) -> bytes:
        z = zlib.compress(payload)
        b = _vi(2, len(payload)) + _ld(3, z)
        header = _ld(1, btype.encode()) + _vi(3, len(b))
        return struct.pack(">I", len(header)) + header + b

    header_block = _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes")
    with open(path, "wb") as fh:
        fh.write(blob("OSMHeader", header_block))
        fh.write(blob("OSMData", block))


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------

_MICRO_NODES = [
    (1, 0.0, 0.0, {}),
    (2, 100.0, 0.0, {}),
    (5, 10.5, 5.25, {"amenity": "cafe", "note": "x"}),
    (10, 200.0, 200.0, {}),
    (11, 210.0, 200.0, {}),
    (12, 210.0, 210.0, {}),
    (13, 200.0, 210.0, {}),
    (30, 400.0, 400.0, {}),
    (31, 420.0, 400.0, {}),
    (32, 420.0, 420.0, {}),
    (33, 400.0, 420.0, {}),
    (40, 405.0, 405.0, {}),
    (41, 410.0, 405.0, {}),
    (42, 410.0, 410.0, {}),
    (43, 405.0, 410.0, {}),
]
_MICRO_WAYS = [
    (101, [1, 2], {"highway": "residential", "maxspeed": "30"}),
    (103, [10, 11, 12, 13, 10], {"building": "yes"}),
    (110, [30, 31, 32], {}),
    (111, [32, 33, 30], {}),
    (112, [40, 41, 42, 43, 40], {}),
]
_MICRO_RELS = [
    (
        201,
        [("way", 110, "outer"), ("way", 111, "outer"), ("way", 112, "inner")],
        {"type": "multipolygon", "landuse": "forest"},
    )
]


def _rows(tabs):
    return {
        name: sorted(
            ((r["osm_id"], bytes(r["way"])) for r in tabs[name].collect())
        )
        for name in ("osm_point", "osm_line", "osm_polygon")
    }


def test_pbf_matches_xml_parity(spark, tmp_path):
    """The same content written as .osm XML and as .osm.pbf parses to
    byte-identical tables (ids AND WKB geometry)."""
    px = str(tmp_path / "m.osm")
    pb = str(tmp_path / "m.osm.pbf")
    _write_osm(px, _MICRO_NODES, _MICRO_WAYS, _MICRO_RELS)
    _write_pbf(pb, _MICRO_NODES, _MICRO_WAYS, _MICRO_RELS)
    a = _rows(read_osm_xml(spark, px, projection_spec=None))
    b = _rows(read_osm_pbf(spark, pb, projection_spec=None))
    assert a == b
    assert len(b["osm_line"]) == 1 and len(b["osm_polygon"]) >= 2


def test_pbf_dense_tags_and_relation_members(spark, tmp_path):
    pb = str(tmp_path / "t.osm.pbf")
    _write_pbf(pb, _MICRO_NODES, _MICRO_WAYS, _MICRO_RELS)
    tabs = read_osm_pbf(spark, pb, projection_spec=None)
    pts = tabs["osm_point"].collect()
    assert len(pts) == 1 and pts[0]["osm_id"] == 5
    k, c = wkb.decode(bytes(pts[0]["way"]))
    assert k == "Point" and tuple(c) == (10.5, 5.25)
    rel = [r for r in tabs["osm_polygon"].collect() if r["osm_id"] == -201]
    assert rel and rel[0]["landuse"] == "forest"


def test_pbf_network_goldens_match_xml(spark, tmp_path):
    """Fixture osm_lines serialized to .pbf builds the SAME network as the
    .osm XML round-trip (WKB byte-identity through the whole parse)."""
    from netascore_spark.pipeline import network as N

    osm_fix = fixtures.osm_lines(spark, scale=1)
    rows = osm_fix.collect()

    # identical node list for BOTH containers, quantized to 9 decimals: a
    # 9-decimal double round-trips bit-identically through repr (XML) AND
    # through nanodegree ints (PBF granularity=1), so any surviving diff is
    # the reader's, not the container's
    nodes, ways = [], []
    nid = 1
    for r in rows:
        _, coords = wkb.decode(bytes(r["way"]))
        refs = []
        for x, y in coords:
            # +0.0 normalizes -0.0: integer nanodegrees carry no sign bit
            nodes.append(
                (nid, round(float(x), 9) + 0.0, round(float(y), 9) + 0.0, {})
            )
            refs.append(nid)
            nid += 1
        tags = dict(r["tags"] or {})
        for c in fixtures.OSM_LINE_COLUMNS:
            if c in ("osm_id", "way", "tags"):
                continue
            if r[c] is not None:
                tags[c] = r[c]
        ways.append((r["osm_id"], refs, tags))
    px = str(tmp_path / "fx.osm")
    pb = str(tmp_path / "fx.osm.pbf")
    _write_osm(px, nodes, ways)
    _write_pbf(pb, nodes, ways)

    xml_line = read_osm_xml(spark, px, projection_spec=None)["osm_line"]
    pbf_line = read_osm_pbf(spark, pb, projection_spec=None)["osm_line"]
    a = sorted((r["osm_id"], bytes(r["way"])) for r in xml_line.collect())
    b = sorted((r["osm_id"], bytes(r["way"])) for r in pbf_line.collect())
    assert a == b

    ex, _ = N.build_network(xml_line)
    ep, _ = N.build_network(pbf_line)
    ga = sorted((r["osm_id"], bytes(r["geom"])) for r in ex.select("osm_id", "geom").collect())
    gb = sorted((r["osm_id"], bytes(r["geom"])) for r in ep.select("osm_id", "geom").collect())
    assert ga == gb


def test_pbf_distributed_matches_sequential(spark, tmp_path):
    """The executor-side range decode (header-only offset scan + per-blob
    decode) produces byte-identical tables to the sequential driver
    stream — same ids, same WKB, same tags."""
    pb = str(tmp_path / "d.osm.pbf")
    _write_pbf(pb, _MICRO_NODES, _MICRO_WAYS, _MICRO_RELS)
    seq = read_osm_pbf(spark, pb, projection_spec=None, distributed=False)
    dist = read_osm_pbf(spark, pb, projection_spec=None, distributed=True)
    assert _rows(seq) == _rows(dist)
    # full-row comparison (every projected column + the tags map where the
    # table carries one: only osm_line does)
    for name in ("osm_point", "osm_line", "osm_polygon"):
        cols = seq[name].columns
        assert cols == dist[name].columns
        key = lambda r: (r["osm_id"], bytes(r["way"]))

        def norm(rows):
            out = []
            for r in rows:
                d = r.asDict()
                if "tags" in d:
                    d["tags"] = sorted((d["tags"] or {}).items())
                d["way"] = bytes(d["way"])
                out.append(sorted(d.items(), key=lambda kv: kv[0]))
            return sorted(out, key=str)

        assert norm(seq[name].collect()) == norm(dist[name].collect())


def test_pbf_distributed_auto_utm_zone_parity(spark, tmp_path):
    """'utm' auto-zone resolution: the distributed path pins the zone on
    the driver (first-chunk mean lon, replicating parse_osm_stream) so
    every executor projects with the SAME zone as the sequential path."""
    nodes = [
        (1, 13.0, 47.5, {}),
        (2, 13.01, 47.5, {}),
        (3, 13.01, 47.51, {}),
    ]
    ways = [(101, [1, 2, 3], {"highway": "residential"})]
    pb = str(tmp_path / "u.osm.pbf")
    _write_pbf(pb, nodes, ways)
    seq = read_osm_pbf(spark, pb, projection_spec="utm", distributed=False)
    dist = read_osm_pbf(spark, pb, projection_spec="utm", distributed=True)
    a = sorted((r["osm_id"], bytes(r["way"])) for r in seq["osm_line"].collect())
    b = sorted((r["osm_id"], bytes(r["way"])) for r in dist["osm_line"].collect())
    assert a == b and len(a) == 1


def test_pbf_delete_list_tags_stripped(spark, tmp_path):
    """osm2pgsql default.style delete rules apply to the PBF container
    exactly as to XML (osmxml._clean_tags shared by both decoders)."""
    ways = [
        (101, [1, 2], {"highway": "residential", "created_by": "josm",
                       "tiger:cfcc": "A41", "source": "survey"}),
    ]
    pb = str(tmp_path / "c.osm.pbf")
    _write_pbf(pb, _MICRO_NODES, ways)
    for distributed in (False, True):
        tabs = read_osm_pbf(
            spark, pb, projection_spec=None, distributed=distributed
        )
        (row,) = tabs["osm_line"].collect()
        tags = dict(row["tags"] or {})
        assert "created_by" not in tags
        assert "tiger:cfcc" not in tags
        assert "source" not in tags
        # highway is a projected column (OSM_LINE_COLUMNS), not a tag
        assert row["highway"] == "residential"


def test_pbf_multiblob_distributed(spark, tmp_path):
    """Multi-blob file (the shape real extracts have): elements split
    across several OSMData blobs decode to the same tables as one blob,
    sequentially AND distributed (blob boundaries are invisible — way
    refs resolve across blobs through the global assembly join)."""
    one = str(tmp_path / "one.osm.pbf")
    _write_pbf(one, _MICRO_NODES, _MICRO_WAYS, _MICRO_RELS)

    # split nodes/ways/rels across three files, then concatenate the blob
    # streams: PBF framing is self-delimiting and OSMHeader blobs are
    # skipped, so the concatenation is a valid multi-blob file
    parts = [
        str(tmp_path / "p0.osm.pbf"),
        str(tmp_path / "p1.osm.pbf"),
        str(tmp_path / "p2.osm.pbf"),
    ]
    _write_pbf(parts[0], _MICRO_NODES[:8], [], [])
    _write_pbf(parts[1], _MICRO_NODES[8:], _MICRO_WAYS[:2], [])
    _write_pbf(parts[2], [], _MICRO_WAYS[2:], _MICRO_RELS)
    multi = str(tmp_path / "multi.osm.pbf")
    with open(multi, "wb") as out:
        for p in parts:
            with open(p, "rb") as fh:
                out.write(fh.read())

    from netascore_spark.sources.osmpbf import _scan_blob_index

    index = _scan_blob_index(multi)
    assert sum(1 for t, _, _ in index if t == "OSMData") == 3

    base = _rows(read_osm_pbf(spark, one, projection_spec=None))
    seq = _rows(read_osm_pbf(spark, multi, projection_spec=None,
                             distributed=False))
    dist = _rows(read_osm_pbf(spark, multi, projection_spec=None,
                              distributed=True))
    assert base == seq == dist
