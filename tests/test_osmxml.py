"""Real .osm XML ingestion (sources/osmxml.py) vs the osm2pgsql import the
reference runs (core/import_step.py:424 + resources/default.style)."""

import os
from xml.sax.saxutils import escape, quoteattr

import numpy as np
import pytest

from netascore_spark.geometry import wkb
from netascore_spark.sources import fixtures
from netascore_spark.sources.osmxml import read_osm_xml
from netascore_spark.pipeline import network as N


# ---------------------------------------------------------------------------
# writers (test-only): serialize rows to .osm XML
# ---------------------------------------------------------------------------

def _write_osm(path, nodes, ways, relations=()):
    """nodes: (id, lon, lat, tags); ways: (id, refs, tags);
    relations: (id, [(type, ref, role)], tags)."""
    with open(path, "w") as fh:
        fh.write('<?xml version="1.0" encoding="UTF-8"?>\n')
        fh.write('<osm version="0.6" generator="pytest">\n')
        for nid, lon, lat, tags in nodes:
            if tags:
                fh.write(f'  <node id="{nid}" lon={quoteattr(repr(lon))} lat={quoteattr(repr(lat))}>\n')
                for k, v in tags.items():
                    fh.write(f'    <tag k={quoteattr(k)} v={quoteattr(v)}/>\n')
                fh.write("  </node>\n")
            else:
                fh.write(f'  <node id="{nid}" lon={quoteattr(repr(lon))} lat={quoteattr(repr(lat))}/>\n')
        for wid, refs, tags in ways:
            fh.write(f'  <way id="{wid}">\n')
            for r in refs:
                fh.write(f'    <nd ref="{r}"/>\n')
            for k, v in tags.items():
                fh.write(f'    <tag k={quoteattr(k)} v={quoteattr(v)}/>\n')
            fh.write("  </way>\n")
        for rid, members, tags in relations:
            fh.write(f'  <relation id="{rid}">\n')
            for t, ref, role in members:
                fh.write(f'    <member type="{t}" ref="{ref}" role="{role}"/>\n')
            for k, v in tags.items():
                fh.write(f'    <tag k={quoteattr(k)} v={quoteattr(v)}/>\n')
            fh.write("  </relation>\n")
        fh.write("</osm>\n")


def _fixture_to_osm(rows, path):
    """Serialize fixture osm_line rows to .osm, planar coords as lon/lat.
    Every way gets its own nodes (crossing ways in OSM need not share)."""
    nodes, ways = [], []
    nid = 1
    for r in rows:
        _, coords = wkb.decode(bytes(r["way"]))
        refs = []
        for x, y in coords:
            nodes.append((nid, float(x), float(y), {}))
            refs.append(nid)
            nid += 1
        tags = dict(r["tags"] or {})
        for c in fixtures.OSM_LINE_COLUMNS:
            if c in ("osm_id", "way", "tags"):
                continue
            if r[c] is not None:
                tags[c] = r[c]
        ways.append((r["osm_id"], refs, tags))
    _write_osm(path, nodes, ways)


# ---------------------------------------------------------------------------
# hand-written micro-file
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def micro_tables(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("osm") / "micro.osm")
    nodes = [
        (1, 0.0, 0.0, {}),
        (2, 100.0, 0.0, {}),
        (3, 50.0, -50.0, {}),
        (4, 50.0, 50.0, {}),
        # tagged node -> osm_point; note:* must be deleted
        (5, 10.0, 5.0, {"amenity": "cafe", "note": "x", "source": "y"}),
        # untagged after delete rules -> NOT in osm_point
        (6, 20.0, 5.0, {"source:date": "2020"}),
        # closed building way ring
        (10, 200.0, 200.0, {}),
        (11, 210.0, 200.0, {}),
        (12, 210.0, 210.0, {}),
        (13, 200.0, 210.0, {}),
        # closed highway ring (linear key -> stays a line)
        (20, 300.0, 300.0, {}),
        (21, 310.0, 300.0, {}),
        (22, 310.0, 310.0, {}),
        # multipolygon members: outer split in two open ways + inner ring
        (30, 400.0, 400.0, {}),
        (31, 420.0, 400.0, {}),
        (32, 420.0, 420.0, {}),
        (33, 400.0, 420.0, {}),
        (40, 405.0, 405.0, {}),
        (41, 410.0, 405.0, {}),
        (42, 410.0, 410.0, {}),
        (43, 405.0, 410.0, {}),
    ]
    ways = [
        (101, [1, 2], {"highway": "residential", "maxspeed": "30"}),
        (102, [3, 4], {"highway": "cycleway"}),
        (103, [10, 11, 12, 13, 10], {"building": "yes"}),
        (104, [20, 21, 22, 20], {"highway": "service"}),
        # area=yes forces polygon despite only-linear keys
        (105, [10, 11, 12, 13, 10], {"highway": "pedestrian", "area": "yes"}),
        # multipolygon member ways (untagged)
        (110, [30, 31, 32], {}),
        (111, [32, 33, 30], {}),
        (112, [40, 41, 42, 43, 40], {}),
    ]
    rels = [
        (
            201,
            [("way", 110, "outer"), ("way", 111, "outer"), ("way", 112, "inner")],
            {"type": "multipolygon", "landuse": "forest"},
        )
    ]
    _write_osm(p, nodes, ways, rels)
    return read_osm_xml(spark, p, projection_spec=None)


def test_micro_points(micro_tables):
    pts = micro_tables["osm_point"].collect()
    assert len(pts) == 1
    assert pts[0]["osm_id"] == 5 and pts[0]["amenity"] == "cafe"
    kind, c = wkb.decode(bytes(pts[0]["way"]))
    assert kind == "Point" and tuple(c) == (10.0, 5.0)


def test_micro_line_vs_polygon_rule(micro_tables):
    lines = {r["osm_id"]: r for r in micro_tables["osm_line"].collect()}
    polys = {r["osm_id"]: r for r in micro_tables["osm_polygon"].collect()}
    # closed highway 104 stays a line; untagged member ways 110-112 are
    # geometry-only (osm2pgsql drops tagless ways from the output tables)
    assert set(lines) == {101, 102, 104}
    assert set(polys) == {103, 105, -201}
    # residual tags for osm_line keep non-schema keys only
    assert lines[101]["tags"] == {"maxspeed": "30"}
    assert lines[101]["highway"] == "residential"
    k, rings = wkb.decode(bytes(polys[103]["way"]))
    assert k == "Polygon" and len(rings) == 1 and len(rings[0]) == 5


def test_micro_multipolygon_stitching(micro_tables):
    polys = {r["osm_id"]: r for r in micro_tables["osm_polygon"].collect()}
    rel = polys[-201]
    assert rel["landuse"] == "forest"
    k, rings = wkb.decode(bytes(rel["way"]))
    assert k == "Polygon"
    assert len(rings) == 2  # stitched outer + inner hole
    outer, inner = rings
    assert np.allclose(outer[0], outer[-1])
    # outer covers the 20x20 square, inner the 5x5 hole
    assert outer[:, 0].min() == 400.0 and outer[:, 0].max() == 420.0
    assert inner[:, 0].min() == 405.0 and inner[:, 0].max() == 410.0


def test_multi_outer_relation_one_row_per_outer(spark, tmp_path):
    """A multipolygon relation with two outer rings emits one Polygon row
    per outer (downstream overlay consumers decode single-Polygon ring
    lists), with each inner assigned to its containing outer by PIP."""
    nodes = [
        # outer A: 0..20 square, with a hole 5..10
        (1, 0.0, 0.0, {}), (2, 20.0, 0.0, {}), (3, 20.0, 20.0, {}), (4, 0.0, 20.0, {}),
        (5, 5.0, 5.0, {}), (6, 10.0, 5.0, {}), (7, 10.0, 10.0, {}), (8, 5.0, 10.0, {}),
        # outer B: 100..110 square, no hole
        (11, 100.0, 100.0, {}), (12, 110.0, 100.0, {}), (13, 110.0, 110.0, {}), (14, 100.0, 110.0, {}),
    ]
    ways = [
        (501, [1, 2, 3, 4, 1], {}),
        (502, [5, 6, 7, 8, 5], {}),
        (503, [11, 12, 13, 14, 11], {}),
    ]
    rels = [
        (
            601,
            [("way", 501, "outer"), ("way", 502, "inner"), ("way", 503, "outer")],
            {"type": "multipolygon", "natural": "water"},
        )
    ]
    p = str(tmp_path / "multi.osm")
    _write_osm(p, nodes, ways, rels)
    tabs = read_osm_xml(spark, p, projection_spec=None)
    rel_rows = [r for r in tabs["osm_polygon"].collect() if r["osm_id"] == -601]
    assert len(rel_rows) == 2
    geoms = [wkb.decode(bytes(r["way"])) for r in rel_rows]
    assert all(k == "Polygon" for k, _ in geoms)
    by_minx = sorted(geoms, key=lambda g: g[1][0][:, 0].min())
    # outer A carries its hole; outer B has none; tags on both rows
    assert len(by_minx[0][1]) == 2 and len(by_minx[1][1]) == 1
    assert all(r["natural"] == "water" for r in rel_rows)


def test_missing_node_ways_dropped(spark, tmp_path):
    """Ways referencing nodes absent from a bbox-clipped file are discarded
    (osm2pgsql parity) — including 'closed' rings missing a vertex, which
    would otherwise encode an invalid <4-point Polygon."""
    nodes = [(1, 0.0, 0.0, {}), (2, 10.0, 0.0, {}), (3, 10.0, 10.0, {})]
    ways = [
        (701, [1, 2], {"highway": "residential"}),          # complete line
        (702, [1, 2, 99], {"highway": "residential"}),      # missing node 99
        (703, [1, 2, 3, 98, 1], {"building": "yes"}),       # clipped ring
    ]
    p = str(tmp_path / "clip.osm")
    _write_osm(p, nodes, ways)
    tabs = read_osm_xml(spark, p, projection_spec=None)
    assert [r["osm_id"] for r in tabs["osm_line"].collect()] == [701]
    assert tabs["osm_polygon"].count() == 0


def test_default_style_parity_wood_and_delete_list(spark, tmp_path):
    """`wood` is linear in default.style:150 (closed way stays a line); the
    full delete list strips editor-noise tags so a node carrying only them
    gets no osm_point row."""
    nodes = [
        (1, 0.0, 0.0, {}), (2, 10.0, 0.0, {}), (3, 10.0, 10.0, {}),
        (9, 50.0, 50.0, {"fixme": "check", "tiger:cfcc": "A41",
                         "created_by": "editor", "attribution": "x"}),
    ]
    ways = [(801, [1, 2, 3, 1], {"wood": "deciduous"})]
    p = str(tmp_path / "style.osm")
    _write_osm(p, nodes, ways)
    tabs = read_osm_xml(spark, p, projection_spec=None)
    assert tabs["osm_point"].count() == 0
    assert [r["osm_id"] for r in tabs["osm_line"].collect()] == [801]
    assert tabs["osm_polygon"].count() == 0


def test_micro_utm_projection(spark, tmp_path):
    """Same two ways in real lon/lat near Vienna; parsed with utm33 the edge
    length must match the true UTM distance computed via the projection
    module directly."""
    from netascore_spark.functions import projection as P

    lon0, lat0 = 16.37, 48.20
    dlon = 0.001
    p = str(tmp_path / "utm.osm")
    _write_osm(
        p,
        [(1, lon0, lat0, {}), (2, lon0 + dlon, lat0, {})],
        [(301, [1, 2], {"highway": "residential"})],
    )
    tabs = read_osm_xml(spark, p, projection_spec="utm33")
    row = tabs["osm_line"].collect()[0]
    _, coords = wkb.decode(bytes(row["way"]))
    e1, n1 = P.wgs84_to_utm(lon0, lat0, 33)
    e2, n2 = P.wgs84_to_utm(lon0 + dlon, lat0, 33)
    assert np.allclose(coords, [[e1, n1], [e2, n2]])


# ---------------------------------------------------------------------------
# fixture round-trip: parsed .osm == fixture table, network goldens match
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def roundtrip(spark, tmp_path_factory):
    osm_fix = fixtures.osm_lines(spark, scale=1)
    rows = osm_fix.collect()
    p = str(tmp_path_factory.mktemp("osm") / "fixture.osm")
    _fixture_to_osm(rows, p)
    parsed = read_osm_xml(spark, p, projection_spec=None)["osm_line"]
    return osm_fix, parsed


def test_roundtrip_osm_line_identical(roundtrip):
    osm_fix, parsed = roundtrip
    a = {r["osm_id"]: r for r in osm_fix.collect()}
    b = {r["osm_id"]: r for r in parsed.collect()}
    assert set(a) == set(b)
    for oid, ra in a.items():
        rb = b[oid]
        assert bytes(ra["way"]) == bytes(rb["way"]), oid  # WKB byte-identical
        for c in fixtures.OSM_LINE_COLUMNS:
            if c == "way":
                continue
            va, vb = ra[c], rb[c]
            if c == "tags":
                va, vb = dict(va or {}), dict(vb or {})
            assert va == vb, (oid, c)


def test_cli_osm_import_derives_layers(spark, tmp_path):
    """cli type=osm: parse + derived layers with scalable ids."""
    from netascore_spark.cli import _load_import

    p = str(tmp_path / "t.osm")
    nodes = [
        (1, 0.0, 0.0, {}),
        (2, 100.0, 0.0, {}),
        (5, 10.0, 5.0, {"amenity": "cafe"}),
        (6, 50.0, 3.0, {"highway": "crossing"}),
        (10, 200.0, 200.0, {}),
        (11, 210.0, 200.0, {}),
        (12, 210.0, 210.0, {}),
        (13, 200.0, 210.0, {}),
    ]
    ways = [
        (101, [1, 2], {"highway": "residential"}),
        (103, [10, 11, 12, 13, 10], {"building": "yes"}),
    ]
    _write_osm(p, nodes, ways)
    osm, layers = _load_import(
        spark, {"type": "osm", "filename": p, "projection": None}, str(tmp_path)
    )
    assert osm.count() == 1
    assert layers["facility"].columns == ["facility_id", "geom"]
    assert layers["facility"].count() == 1
    assert layers["crossing"].count() == 1
    assert layers["building"].count() == 1
    assert layers["building"].collect()[0]["building_id"] == 1


def test_roundtrip_network_goldens(spark, roundtrip):
    osm_fix, parsed = roundtrip
    e1, n1 = N.build_network(osm_fix)
    e2, n2 = N.build_network(parsed)
    g1 = {(r["edge_id"], bytes(r["geom"])) for r in e1.collect()}
    g2 = {(r["edge_id"], bytes(r["geom"])) for r in e2.collect()}
    assert g1 == g2
    assert n1.count() == n2.count()


def test_utm_auto_zone(spark, tmp_path):
    """projection_spec="utm" (no zone): the first chunk's mean lon fixes
    the zone — Vienna-ish lon ~16.4 must land in zone 33."""
    from netascore_spark.functions import projection as P

    p = str(tmp_path / "auto.osm")
    _write_osm(
        p,
        [(1, 16.37, 48.20, {}), (2, 16.38, 48.20, {})],
        [(401, [1, 2], {"highway": "residential"})],
    )
    tabs = read_osm_xml(spark, p, projection_spec="utm")
    _, coords = wkb.decode(bytes(tabs["osm_line"].collect()[0]["way"]))
    e1, n1 = P.wgs84_to_utm(16.37, 48.20, 33)
    assert np.allclose(coords[0], [e1, n1])


def test_cli_osm_example_end_to_end(spark, tmp_path):
    """examples/settings_osm.yml: real .osm -> UTM -> network -> score ->
    gpkg, through the CLI (the 'a user could switch' path)."""
    import sqlite3

    import yaml

    from netascore_spark.cli import run_settings

    with open("examples/settings_osm.yml") as fh:
        settings = yaml.safe_load(fh)
    settings["import"]["filename"] = os.path.join(os.getcwd(), "examples/sample.osm")
    for p in settings["profiles"]:
        p["filename"] = os.path.join(os.getcwd(), "profiles", os.path.basename(p["filename"]))
    settings["export"]["filename"] = str(tmp_path / "netascore_<case_id>_<srid>.gpkg")
    out = run_settings(settings, base_path=str(tmp_path), spark=spark)
    gpkg = tmp_path / "netascore_osm_sample_32633.gpkg"
    assert gpkg.exists()  # <case_id> and <srid> both substituted
    con = sqlite3.connect(str(gpkg))
    n_edges = con.execute('SELECT count(*) FROM "edge"').fetchone()[0]
    assert n_edges > 0
    # -lco FID=edge_id parity: edge_id IS the primary key column
    cols = [r[1] for r in con.execute('PRAGMA table_info("edge")')]
    assert cols[0] == "edge_id"
    # UTM easting range sanity for the Vienna sample (zone 33)
    idx_cols = [c for c in out["network_edge_index"].columns]
    assert "index_bike_ft" in idx_cols
