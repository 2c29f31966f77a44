"""Overpass front-end (SURVEY S1/S2) — hermetic: every test injects a
fake transport; no network anywhere.  Reference behaviors pinned:
query-string shapes (import_step.py:238-252, :337-341), endpoint
failover order (:257-277), zero/multi-feature choice (:286-305), SRID
from AOI centroid (:184-192), the 500 m UTM bbox expansion (:324-332),
and the on_existing file contract (:343-353)."""

from __future__ import annotations

import numpy as np
import pytest

from netascore_spark.functions.projection import wgs84_to_utm
from netascore_spark.geometry import wkb
from netascore_spark.sources import overpass as ov


# A square admin boundary around (13.0, 47.0), outer split across two
# ways — one of them reversed — so the ring stitcher has real work.
AOI_XML = """<?xml version="1.0"?>
<osm version="0.6">
  <node id="1" lat="46.99" lon="12.99"/>
  <node id="2" lat="46.99" lon="13.01"/>
  <node id="3" lat="47.01" lon="13.01"/>
  <node id="4" lat="47.01" lon="12.99"/>
  <way id="10"><nd ref="1"/><nd ref="2"/><nd ref="3"/></way>
  <way id="11"><nd ref="1"/><nd ref="4"/><nd ref="3"/></way>
  <relation id="100">
    <member type="way" ref="10" role="outer"/>
    <member type="way" ref="11" role="outer"/>
    <tag k="type" v="boundary"/>
    <tag k="boundary" v="administrative"/>
    <tag k="admin_level" v="6"/>
    <tag k="name" v="Testland"/>
  </relation>
</osm>
"""

NET_XML = """<?xml version="1.0"?>
<osm version="0.6">
  <node id="20" lat="47.0" lon="13.0"/>
  <node id="21" lat="47.001" lon="13.001"/>
  <way id="30">
    <nd ref="20"/><nd ref="21"/>
    <tag k="highway" v="residential"/>
  </way>
</osm>
"""


def test_aoi_query_string():
    q = ov.aoi_query("Salzburg")
    assert "[name='Salzburg'][boundary='administrative'];" in q
    assert "rel(pivot);" in q and "out skel qt;" in q
    q2 = ov.aoi_query("Salzburg", admin_level=6, zip_code=5020)
    assert "[admin_level='6']" in q2
    assert "[\"admin_centre:postal_code\"='5020']" in q2


def test_bbox_query_string():
    q = ov.bbox_query((46.9, 12.9, 47.1, 13.1))
    assert "nwr(46.9, 12.9, 47.1, 13.1);" in q
    assert "[timeout:900][maxsize:1073741824];" in q


def test_failover_tries_endpoints_in_order():
    calls = []

    def transport(url, query):
        calls.append(url)
        if len(calls) < 3:
            raise ConnectionError("boom")
        return "ok"

    text, used = ov.query_with_failover("q", transport, ["a", "b", "c", "d"])
    assert text == "ok" and used == "c"
    assert calls == ["a", "b", "c"]


def test_failover_all_fail_raises():
    def transport(url, query):
        raise ConnectionError("down")

    with pytest.raises(RuntimeError, match="not successful"):
        ov.query_with_failover("q", transport, ["a", "b"])


def test_failover_keyboard_interrupt_propagates():
    def transport(url, query):
        raise KeyboardInterrupt

    with pytest.raises(KeyboardInterrupt):
        ov.query_with_failover("q", transport, ["a", "b"])


def test_parse_aoi_stitches_split_reversed_ways():
    feats = ov.parse_aoi_features(AOI_XML)
    assert len(feats) == 1
    ft = feats[0]
    assert ft["tags"]["admin_level"] == "6"
    geom = wkb.decode(ft["geom"])
    ring = geom[1][0]
    assert ring.shape == (5, 2)  # closed square
    assert np.array_equal(ring[0], ring[-1])
    assert set(map(tuple, ring[:-1])) == {
        (12.99, 46.99), (13.01, 46.99), (13.01, 47.01), (12.99, 47.01),
    }


def test_choose_feature_contract():
    with pytest.raises(RuntimeError, match="AOI not found"):
        ov.choose_feature([])
    feats = [{"rel_id": 1}, {"rel_id": 2}]
    assert ov.choose_feature(feats)["rel_id"] == 1  # first by default
    assert ov.choose_feature(feats, chooser=lambda f: 1)["rel_id"] == 2


def test_aoi_srid_from_centroid():
    ft = ov.parse_aoi_features(AOI_XML)[0]
    # centroid (13.0, 47.0) -> zone 33 north -> EPSG:32633
    assert ov.aoi_srid(ft["geom"]) == 32633
    south = wkb.encode(wkb.polygon([(13.0, -47.0), (13.1, -47.0),
                                    (13.1, -46.9), (13.0, -47.0)]))
    assert ov.aoi_srid(south) == 32733


def test_expand_bbox_500m():
    ft = ov.parse_aoi_features(AOI_XML)[0]
    s, w, n, e = ov.expand_bbox(ft["geom"], 32633, buffer=500.0)
    assert s < 46.99 and w < 12.99 and n > 47.01 and e > 13.01
    # Isolate the buffer's contribution by differencing against buffer=0
    # (corner-selection/meridian-convergence bias is identical in both and
    # cancels): each side must move by ~500 m of ground distance.
    s0, w0, n0, e0 = ov.expand_bbox(ft["geom"], 32633, buffer=0.0)
    m_lat = 111_132.0 + 559.8 * np.cos(2 * np.radians(47.0))  # m per deg lat
    m_lon = 111_320.0 * np.cos(np.radians(47.0))  # m per deg lon
    assert (s0 - s) * m_lat == pytest.approx(500.0, rel=0.03)
    assert (n - n0) * m_lat == pytest.approx(500.0, rel=0.03)
    assert (w0 - w) * m_lon == pytest.approx(500.0, rel=0.03)
    assert (e - e0) * m_lon == pytest.approx(500.0, rel=0.03)


def test_download_network_on_existing(tmp_path):
    dest = str(tmp_path / "net.xml")
    calls = []

    def transport(url, query):
        calls.append(query)
        return NET_XML

    assert ov.download_network((0, 0, 1, 1), dest, transport) == dest
    assert "nwr(0, 0, 1, 1);" in calls[0]
    assert open(dest).read() == NET_XML

    # skip: no new transport call, file untouched
    open(dest, "w").write("sentinel")
    ov.download_network((0, 0, 1, 1), dest, transport, on_existing="skip")
    assert open(dest).read() == "sentinel" and len(calls) == 1

    # abort (default): raises
    with pytest.raises(FileExistsError):
        ov.download_network((0, 0, 1, 1), dest, transport)

    # delete: re-downloads
    ov.download_network((0, 0, 1, 1), dest, transport, on_existing="delete")
    assert open(dest).read() == NET_XML and len(calls) == 2


def test_import_from_place_end_to_end(spark, tmp_path):
    def transport(url, query):
        return AOI_XML if "rel(pivot)" in query else NET_XML

    aoi, srid, bbox, tables = ov.import_from_place(
        spark, "Testland", str(tmp_path), transport
    )
    assert srid == 32633
    assert aoi["srid"] == 32633
    s, w, n, e = bbox
    assert s < 46.99 and n > 47.01
    lines = tables["osm_line"].collect()
    assert len(lines) == 1
    assert lines[0]["highway"] == "residential"
    # network projected into the AOI's UTM zone (meters, not degrees)
    xy = wkb.coords(wkb.decode(bytes(lines[0]["way"])))
    assert xy[:, 0].min() > 10000  # UTM easting scale


def test_cli_osm_place_name_dispatch(spark, tmp_path):
    """cli type=osm without filename: place_name -> Overpass download
    (injected transport) -> parsed network + derived layers
    (import_step.py:396-407 dispatch parity)."""
    from netascore_spark.cli import _load_import

    def transport(url, query):
        return AOI_XML if "rel(pivot)" in query else NET_XML

    osm, layers = _load_import(
        spark,
        {"type": "osm", "place_name": "Testland", "_transport": transport},
        str(tmp_path),
    )
    assert osm.count() == 1
    assert set(layers) == {"facility", "crossing", "building",
                           "greenness", "water"}

    # bbox variant, string form like the reference's settings file
    (tmp_path / "b").mkdir()
    osm2, _ = _load_import(
        spark,
        {"type": "osm", "bbox": "46.9, 12.9, 47.1, 13.1",
         "_transport": transport},
        str(tmp_path / "b"),
    )
    assert osm2.count() == 1


from hypothesis import given, settings, strategies as st


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(min_value=4, max_value=24),
    cuts=st.lists(st.integers(min_value=1, max_value=23), max_size=6),
    flips=st.lists(st.booleans(), min_size=7, max_size=7),
    rot=st.integers(min_value=0, max_value=23),
    order=st.randoms(use_true_random=False),
)
def test_stitch_rings_recovers_any_segmentation(n, cuts, flips, rot, order):
    """Any closed ring, cut at arbitrary positions into way-chains, each
    chain optionally reversed, chains shuffled — the stitcher must return
    exactly one closed ring visiting the same cyclic node sequence."""
    ring = [1000 + ((rot + i) % n) for i in range(n)] + [1000 + rot % n]
    pos = sorted({c % (n - 1) + 1 for c in cuts})
    bounds = [0] + pos + [n]
    segs = [ring[b: e + 1] for b, e in zip(bounds[:-1], bounds[1:])]
    segs = [s[::-1] if flips[i % len(flips)] else s for i, s in enumerate(segs)]
    order.shuffle(segs)

    out = ov._stitch_rings(segs)
    assert len(out) == 1
    got = out[0]
    assert got[0] == got[-1] and len(got) == n + 1
    # same cyclic sequence up to rotation/direction
    base = got[:-1]
    want = ring[:-1]
    k = base.index(want[0])
    fwd = base[k:] + base[:k]
    rev = [base[k]] + list(reversed(base[k + 1:] + base[:k]))
    assert fwd == want or rev == want
