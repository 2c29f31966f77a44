"""Overpass API front-end: AOI by place name + bbox network download.

SURVEY S1/S2 (reference ``core/import_step.py:200-312`` — AOI query,
endpoint failover, feature choice, SRID determination, bbox expansion —
and ``core/import_step.py:324-380`` — bbox ``nwr`` download with
``on_existing`` handling; endpoint list ``settings.py:14-20``).

Network-free by construction: every function takes the HTTP layer as an
injectable ``transport(url: str, query: str) -> str`` callable returning
the response body.  ``urllib_transport`` is the real one (stdlib only);
nothing in the repo's tested path calls it — the sandbox has no network,
and at web scale ingestion comes from snapshots, not live Overpass
(SURVEY §7).  Everything else is deterministic and tested hermetically:
query-string construction, the failover loop, OSM-XML boundary-ring
assembly, centroid/UTM SRID choice, the 500 m bbox expansion round-trip,
and the skip/delete/abort file contract.  The downloaded network XML
feeds the existing ``sources/osmxml.read_osm_xml`` path unchanged.

At scale the AOI geometry is a handful of rings (driver-side assembly is
exact and bounded); only the *network* payload is large, and that goes
through the streaming XML reader's bounded-memory chunks.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET
from typing import Callable, Sequence

import numpy as np

from ..functions.attributes import utmzone
from ..functions.projection import utm_to_wgs84, wgs84_to_utm
from ..geometry import wkb

# settings.py:14-20 — public community endpoints, tried in order.
OVERPASS_ENDPOINTS = [
    "https://overpass-api.de/api/interpreter",
    "https://z.overpass-api.de/api/interpreter",
    "https://lz4.overpass-api.de/api/interpreter",
    "https://maps.mail.ru/osm/tools/overpass/api/interpreter",
    "https://overpass.kumi.systems/api/interpreter",
]

Transport = Callable[[str, str], str]


def urllib_transport(url: str, query: str) -> str:
    """Real HTTP GET (stdlib).  Exists for completeness; never exercised
    in tests — inject a fake transport instead."""
    import urllib.parse
    import urllib.request

    full = url + "?data=" + urllib.parse.quote_plus(query)
    with urllib.request.urlopen(full, timeout=30) as resp:  # pragma: no cover
        return resp.read().decode("utf-8")


# ---------------------------------------------------------------------------
# Query strings (import_step.py:238-252 and :337-341)
# ---------------------------------------------------------------------------

def aoi_query(place_name: str, admin_level=None, zip_code=None) -> str:
    """AOI query: administrative boundary area by name, optional
    admin_level / admin_centre:postal_code filters (import_step.py:240-252)."""
    add = ""
    if admin_level is not None:
        add += f"[admin_level='{admin_level}']"
    if zip_code is not None:
        add += f"[\"admin_centre:postal_code\"='{zip_code}']"
    return (
        "\n            area\n"
        f"            [name='{place_name}'][boundary='administrative']{add};\n"
        "            rel(pivot);\n"
        "            out body;\n"
        "            >;\n"
        "            out skel qt;\n        "
    )


def bbox_query(bbox: Sequence[float]) -> str:
    """Network query for a (south, west, north, east) bbox
    (import_step.py:337-341, bbox order from the ST_YMIN/XMIN/YMAX/XMAX
    SELECT at :328-332 — Overpass's native s,w,n,e)."""
    bbox_str = ", ".join(str(v) for v in bbox)
    return (
        "\n            [timeout:900][maxsize:1073741824];\n"
        f"            nwr({bbox_str});\n"
        "            out;"
    )


# ---------------------------------------------------------------------------
# Endpoint failover (import_step.py:257-277 / :357-377)
# ---------------------------------------------------------------------------

def query_with_failover(
    query: str,
    transport: Transport,
    endpoints: Sequence[str] = OVERPASS_ENDPOINTS,
) -> tuple[str, str]:
    """Try endpoints in order; return (response_text, endpoint_used).

    Any exception from the transport moves to the next endpoint
    (the reference catches HTTPError and BaseException identically,
    advancing the index); KeyboardInterrupt propagates (the reference
    terminates on it).  All endpoints failing raises RuntimeError
    (import_step.py:276)."""
    last: Exception | None = None
    for url in endpoints:
        try:
            return transport(url, query), url
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 — parity with reference
            last = e
    raise RuntimeError(
        f"OSM data download was not successful ({len(endpoints)} endpoints "
        f"tried; last error: {last!r})"
    )


# ---------------------------------------------------------------------------
# AOI response parsing (import_step.py:281-312; osm2geojson.xml2geojson)
# ---------------------------------------------------------------------------

def _stitch_rings(segments: list[list[int]]) -> list[list[int]]:
    """Join way node-ref chains end-to-end into closed rings (what
    osm2geojson does for boundary relations whose outer is split across
    many ways).  Ways may need reversing; unclosed leftovers are dropped."""
    segs = [list(s) for s in segments if len(s) >= 2]
    rings: list[list[int]] = []
    while segs:
        ring = segs.pop(0)
        progress = True
        while ring[0] != ring[-1] and progress:
            progress = False
            for i, s in enumerate(segs):
                if s[0] == ring[-1]:
                    ring += s[1:]
                elif s[-1] == ring[-1]:
                    ring += s[-2::-1]
                elif s[-1] == ring[0]:
                    ring = s[:-1] + ring
                elif s[0] == ring[0]:
                    ring = s[::-1][:-1] + ring
                else:
                    continue
                segs.pop(i)
                progress = True
                break
        if len(ring) >= 4 and ring[0] == ring[-1]:
            rings.append(ring)
    return rings


def parse_aoi_features(xml_text: str) -> list[dict]:
    """Overpass AOI response (relations + member ways + skeleton nodes)
    -> list of features, one per boundary relation, in document order:
    ``{"rel_id", "tags", "geom"}`` with geom a lon/lat (EPSG:4326) WKB
    polygon built from the stitched outer rings (largest-area ring
    exterior, remaining outer rings ignored for the AOI use case — the
    reference keeps one feature geometry per relation too)."""
    root = ET.fromstring(xml_text)
    nodes: dict[int, tuple[float, float]] = {}
    ways: dict[int, list[int]] = {}
    feats: list[dict] = []
    for el in root:
        if el.tag == "node":
            nodes[int(el.get("id"))] = (
                float(el.get("lon")), float(el.get("lat")),
            )
        elif el.tag == "way":
            ways[int(el.get("id"))] = [
                int(nd.get("ref")) for nd in el.findall("nd")
            ]
        elif el.tag == "relation":
            tags = {t.get("k"): t.get("v") for t in el.findall("tag")}
            members = [
                (m.get("type"), int(m.get("ref")), m.get("role") or "")
                for m in el.findall("member")
            ]
            feats.append({"rel_id": int(el.get("id")), "tags": tags,
                          "members": members})

    out: list[dict] = []
    for ft in feats:
        outer = [
            ways[ref]
            for typ, ref, role in ft["members"]
            if typ == "way" and role in ("outer", "") and ref in ways
        ]
        rings = _stitch_rings(outer)
        ring_coords = [
            [nodes[r] for r in ring if r in nodes] for ring in rings
        ]
        ring_coords = [rc for rc in ring_coords if len(rc) >= 4]
        if not ring_coords:
            continue
        # largest |shoelace area| ring is the exterior
        def _area(rc):
            a = np.asarray(rc)
            x, y = a[:, 0], a[:, 1]
            return abs(np.sum(x[:-1] * y[1:] - x[1:] * y[:-1])) / 2.0
        ring_coords.sort(key=_area, reverse=True)
        out.append({
            "rel_id": ft["rel_id"],
            "tags": ft["tags"],
            "geom": wkb.encode(wkb.polygon(ring_coords[0])),
        })
    return out


def choose_feature(features: list[dict], chooser=None) -> dict:
    """Reference semantics (import_step.py:286-305): error on zero
    features, first by default, optional interactive chooser (a callable
    features -> 0-based index here; stdin there)."""
    if not features:
        raise RuntimeError(
            "AOI not found. Please check your query settings or use a "
            "bounding box instead."
        )
    if len(features) > 1 and chooser is not None:
        return features[int(chooser(features))]
    return features[0]


# ---------------------------------------------------------------------------
# SRID + bbox expansion (import_step.py:184-198 and :324-332)
# ---------------------------------------------------------------------------

def aoi_srid(geom_wkb: bytes) -> int:
    """EPSG code from the AOI centroid's UTM zone (determine_utmzone.sql
    via _get_srid_for_AOI, import_step.py:184-192).  Area centroid of the
    exterior ring (PostGIS ST_Centroid on a polygon)."""
    coords = wkb.coords(wkb.decode(geom_wkb))
    x, y = coords[:, 0], coords[:, 1]
    cross = x[:-1] * y[1:] - x[1:] * y[:-1]
    a = np.sum(cross) / 2.0
    if abs(a) < 1e-30:
        cx, cy = float(np.mean(x)), float(np.mean(y))
    else:
        cx = float(np.sum((x[:-1] + x[1:]) * cross) / (6.0 * a))
        cy = float(np.sum((y[:-1] + y[1:]) * cross) / (6.0 * a))
    return utmzone(cx, cy)


def expand_bbox(
    geom_wkb: bytes, srid: int, buffer: float = 500.0
) -> tuple[float, float, float, float]:
    """(south, west, north, east) of the AOI expanded by ``buffer`` meters
    in its UTM zone, back in EPSG:4326 — exactly the reference's
    ``ST_Transform(ST_SetSRID(ST_Expand(box2d(ST_Transform(geom, srid)),
    buffer), srid), 4326)`` (import_step.py:324-332): project vertices,
    take the box, expand, inverse-project the box's CORNERS only (PostGIS
    transforms the box-as-polygon's vertices, no densification), min/max."""
    zone = srid % 100
    north = srid < 32700
    coords = wkb.coords(wkb.decode(geom_wkb))
    e, n = wgs84_to_utm(coords[:, 0], coords[:, 1], zone, north)
    x0, x1 = float(np.min(e)) - buffer, float(np.max(e)) + buffer
    y0, y1 = float(np.min(n)) - buffer, float(np.max(n)) + buffer
    cx = np.array([x0, x0, x1, x1])
    cy = np.array([y0, y1, y0, y1])
    lon, lat = utm_to_wgs84(cx, cy, zone, north)
    return (
        float(np.min(lat)), float(np.min(lon)),
        float(np.max(lat)), float(np.max(lon)),
    )


# ---------------------------------------------------------------------------
# Network download (import_step.py:335-380)
# ---------------------------------------------------------------------------

def download_network(
    bbox: Sequence[float],
    dest_path: str,
    transport: Transport,
    endpoints: Sequence[str] = OVERPASS_ENDPOINTS,
    on_existing: str = "abort",
) -> str | None:
    """Fetch ``nwr(bbox)`` XML to ``dest_path`` with the reference's
    existing-file contract (import_step.py:343-353): skip returns the
    existing file untouched, delete overwrites, anything else aborts.
    Returns the path (None never — skip returns the path too)."""
    if os.path.isfile(dest_path):
        if on_existing == "skip":
            return dest_path
        if on_existing != "delete":
            raise FileExistsError(
                "Target file for OSM download already exists. Aborting. "
                "[skip/abort/delete]"
            )
        os.remove(dest_path)
    text, _ = query_with_failover(bbox_query(bbox), transport, endpoints)
    with open(dest_path, "w", encoding="utf-8") as f:
        f.write(text)
    return dest_path


def import_from_place(
    spark,
    place_name: str,
    dest_dir: str,
    transport: Transport,
    admin_level=None,
    zip_code=None,
    buffer: float = 500.0,
    custom_srid: int | None = None,
    endpoints: Sequence[str] = OVERPASS_ENDPOINTS,
    on_existing: str = "abort",
    chooser=None,
    case_id: str = "default_net",
):
    """S1 -> S2 -> S3 composition (run_step, import_step.py:387-430):
    place name -> AOI polygon + SRID -> expanded bbox -> network XML ->
    parsed osm_point/line/polygon tables via the existing reader.

    Returns (aoi, srid, bbox, tables): aoi is {"name", "geom", "srid"},
    tables the read_osm_xml dict projected into the AOI's UTM zone."""
    from .osmxml import read_osm_xml

    text, _ = query_with_failover(
        aoi_query(place_name, admin_level, zip_code), transport, endpoints
    )
    feature = choose_feature(parse_aoi_features(text), chooser)
    srid = custom_srid if custom_srid is not None else aoi_srid(feature["geom"])
    bbox = expand_bbox(feature["geom"], srid, buffer)
    net_file = os.path.join(dest_dir, f"osm_download_{case_id}.xml")
    download_network(bbox, net_file, transport, endpoints, on_existing)
    zone = srid % 100
    proj = f"utm{zone}" + ("" if srid < 32700 else "s")
    tables = read_osm_xml(spark, net_file, projection_spec=proj)
    aoi = {"name": case_id, "geom": feature["geom"], "srid": srid}
    return aoi, srid, bbox, tables
