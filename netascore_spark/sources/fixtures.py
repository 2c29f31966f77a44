"""Deterministic synthetic fixtures (FIXTURES.md): two-city micro-world.

No external data; seed fixed.  Coordinates are meters in a local projected
plane (reference default SRID 32633, settings.py:21).  The "vienna" grid city
creates dense/hot cells (skew), the "salzburg" ring city is sparse.

Schemas mirror osm2pgsql output (resources/default.style subset that the
attribute CASEs at osm_attributes.sql.j2 actually touch) and the
BASELINE.json input_hint pages table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from netascore_spark.geometry import wkb

SEED = 42

OSM_LINE_COLUMNS = [
    "osm_id", "way", "highway", "railway", "aerialway", "access", "bicycle",
    "foot", "oneway", "junction", "surface", "tracktype", "width", "layer",
    "motorcar", "ref", "route", "covered", "man_made", "bridge", "tunnel",
    "name", "amenity", "landuse", "leisure", "natural", "waterway", "tags",
]

_OSM_LINE_SCHEMA = T.StructType(
    [T.StructField("osm_id", T.LongType()), T.StructField("way", T.BinaryType())]
    + [T.StructField(c, T.StringType(), True) for c in OSM_LINE_COLUMNS[2:-1]]
    + [T.StructField("tags", T.MapType(T.StringType(), T.StringType()), True)]
)


def _row(osm_id, coords, **kv):
    base = {c: None for c in OSM_LINE_COLUMNS}
    base["osm_id"] = osm_id
    base["way"] = wkb.encode(("LineString", np.asarray(coords, dtype=float)))
    base["tags"] = kv.pop("tags", {})
    base.update(kv)
    return tuple(base[c] for c in OSM_LINE_COLUMNS)


_HIGHWAY_CYCLE = [
    "residential", "secondary", "tertiary", "primary", "unclassified",
    "service", "living_street", "cycleway", "footway", "path",
]
_SURFACE_CYCLE = [
    "asphalt", "gravel", "ground", "cobblestone", "paved", "compacted",
    "dirt", "concrete", None, "sand",
]


def osm_lines(spark: SparkSession, scale: int = 1) -> DataFrame:
    """The street micro-network: grid city + ring city + special cases."""
    rows = []
    oid = 100
    n = 8 * scale  # grid dimension
    step = 100.0

    # --- grid city ("vienna"): n horizontal + n vertical crossing ways ----
    for i in range(n):
        y = i * step
        rows.append(
            _row(
                oid, [[0, y], [(n - 1) * step, y]],
                highway=_HIGHWAY_CYCLE[i % len(_HIGHWAY_CYCLE)],
                surface=_SURFACE_CYCLE[i % len(_SURFACE_CYCLE)],
                name=f"H{i}",
                oneway="yes" if i % 4 == 3 else None,
                tags={"maxspeed": str(30 + 10 * (i % 5))} if i % 2 == 0 else {},
            )
        )
        oid += 1
    for j in range(n):
        x = j * step
        rows.append(
            _row(
                oid, [[x, 0], [x, (n - 1) * step]],
                highway=_HIGHWAY_CYCLE[(j + 3) % len(_HIGHWAY_CYCLE)],
                surface=_SURFACE_CYCLE[(j + 5) % len(_SURFACE_CYCLE)],
                name=f"V{j}",
                tags={"lanes": str(1 + j % 4)} if j % 2 == 0 else {},
            )
        )
        oid += 1

    # --- bridge crossing the grid (must NOT split at crossings) ----------
    rows.append(
        _row(
            oid, [[-50, 150], [(n - 1) * step + 50, 150]],
            highway="primary", bridge="yes", name="bridge-way",
        )
    )
    oid += 1
    # layered overpass (layer mismatch -> no split)
    rows.append(
        _row(
            oid, [[250, -50], [250, (n - 1) * step + 50]],
            highway="secondary", layer="1", name="overpass",
        )
    )
    oid += 1
    # tunnel under the grid
    rows.append(
        _row(
            oid, [[450, -50], [450, (n - 1) * step + 50]],
            highway="tertiary", tunnel="yes", name="tunnel-way",
        )
    )
    oid += 1

    # --- bicycle infrastructure / road_category / max_speed showcases -----
    y0 = -300.0
    showcases = [
        dict(highway="cycleway", foot="no"),                       # bicycle_way
        dict(highway="cycleway", foot="designated"),               # mixed_way
        dict(highway="residential", tags={"cycleway": "lane"}),    # bicycle_lane
        dict(highway="residential", tags={"cycleway": "shared_lane"}),
        dict(highway="residential", tags={"cycleway": "share_busway"}),
        dict(highway="residential", tags={"bicycle_road": "yes"}),
        dict(highway="residential", tags={"cyclestreet": "yes"}),
        dict(highway="motorway"),
        dict(highway="primary_link"),
        dict(highway="track", tracktype="grade2", access=None),
        dict(highway="track", tracktype="grade4", surface="gravel"),
        dict(highway="steps"),
        dict(highway="pedestrian"),
        dict(highway="footway", bicycle="yes"),
        dict(highway="path", foot="yes"),
        dict(highway="residential", width="3.5 m"),
        dict(highway="residential", width="4"),
        dict(highway="service", access="private"),
        dict(highway="unclassified", tags={"maxspeed": "80"}),
        dict(highway="raceway"),
    ]
    for k, kv in enumerate(showcases):
        rows.append(
            _row(oid, [[k * 120.0, y0], [k * 120.0 + 100.0, y0]],
                 name=f"showcase{k}", **kv)
        )
        oid += 1

    # --- designated bicycle routes (relations-as-lines) -------------------
    # each overlaps the first horizontal way exactly (containment, J4)
    for k, net in enumerate(["icn", "ncn", "rcn", "lcn", None]):
        tags = {"network": net} if net else {}
        rows.append(
            _row(
                oid, [[k * 100.0, 0.0], [(k + 2) * 100.0, 0.0]],
                route="bicycle", name=f"route-{net}", tags=tags,
            )
        )
        oid += 1

    # --- indoor cluster with dangling edge (F5) ---------------------------
    ix, iy = 2000.0, 2000.0
    rows.append(_row(oid, [[ix, iy], [ix + 50, iy]], highway="footway",
                     tags={"indoor": "yes"}, name="indoor-a")); oid += 1
    rows.append(_row(oid, [[ix + 50, iy], [ix + 100, iy]], highway="footway",
                     tags={"indoor": "yes"}, name="indoor-b")); oid += 1
    rows.append(_row(oid, [[ix, iy], [ix + 50, iy - 50]], highway="footway",
                     tags={"indoor": "yes"}, name="indoor-dangling")); oid += 1

    # --- ring city ("salzburg"): octagon + spokes --------------------------
    cx, cy, r = 6000.0, 0.0, 400.0
    ang = np.linspace(0, 2 * np.pi, 9)
    ring_pts = np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)
    rows.append(_row(oid, ring_pts, highway="residential", surface="asphalt",
                     name="ring")); oid += 1
    for k in range(4):
        a = k * np.pi / 2
        rows.append(
            _row(
                oid,
                [[cx, cy], [cx + r * np.cos(a), cy + r * np.sin(a)]],
                highway="tertiary", name=f"spoke{k}",
            )
        )
        oid += 1

    # --- filter-test rows --------------------------------------------------
    rows.append(_row(-5, [[0, -900], [100, -900]], highway="residential",
                     name="negative-id"))  # dropped by P1
    rows.append(_row(oid, [[0, -950], [100, -950]], highway=None,
                     name="no-highway"))  # dropped
    oid += 1

    return spark.createDataFrame(rows, _OSM_LINE_SCHEMA)


GRID_HIGHWAYS = ["residential", "primary", "cycleway"]
GRID_SURFACES = ["asphalt", "gravel", None]


def grid_osm_lines(spark: SparkSession, n_h: int = 40, n_v: int = 30) -> DataFrame:
    """ORACLE-CONSTRAINED street grid: axis-aligned two-point ways whose
    every intersection is a proper interior crossing at an exact integer
    grid point, so the full network composition (J2 self-join ->
    ST_Split -> node dedup -> W3/W4 id assignment,
    ref sql/templates/osm_network.sql.j2:78-364) is reproducible in plain
    ANSI SQL from the SAME integer formulas (see __spark_entry__'s
    _grid_network_sql).

    The construction guarantees:
    - horizontal endpoints have x = 5 (mod 10), vertical lines sit at
      x = 0 (mod 10) -> crossings are never at endpoints (no T-junctions,
      no shared endpoints, so the NOT-ST_Equals pair filter and the
      endpoint-proximity correction deletes are all no-ops by design);
    - vertical x positions are unique (11 coprime to 37) and horizontal
      y positions are unique -> no collinear overlaps;
    - all coordinates are integers -> split points, node keys and lengths
      are exact after the pipeline's round(6)/round(4).
    """
    if n_v > 37:
        raise ValueError("n_v <= 37 keeps vertical x positions unique")
    rows = []
    for i in range(n_h):
        a = (i * 7) % 13
        x0 = 5 + 10 * a
        x1 = x0 + 10 * (3 + (i * 5) % 17)
        rows.append(
            _row(
                i, [[x0, 10 * i], [x1, 10 * i]],
                highway=GRID_HIGHWAYS[i % 3],
                surface=GRID_SURFACES[i % 3],
                name=f"GH{i}",
            )
        )
    for j in range(n_v):
        x = 10 * (1 + (j * 11) % 37)
        c = (j * 5) % 13
        y0 = 5 + 10 * c
        y1 = y0 + 10 * (3 + (j * 7) % 17)
        rows.append(
            _row(
                1000 + j, [[x, y0], [x, y1]],
                highway=GRID_HIGHWAYS[(j + 1) % 3],
                surface=GRID_SURFACES[(j + 1) % 3],
                name=f"GV{j}",
            )
        )
    return spark.createDataFrame(rows, _OSM_LINE_SCHEMA)


def grid_layer_points(spark: SparkSession, kind: str) -> DataFrame:
    """ORACLE-CONSTRAINED facility/crossing points for the grid network:
    coordinates are 3 (mod 10) in both axes, so the distance from any point
    to any grid segment is never exactly on the 10 m / 30 m ST_DWithin
    thresholds (interior projection: d = 3 or 7 mod 10; corner: d^2 = 4+9
    mod 10 — never a multiple of 100), making the J5 counts reproducible in
    plain SQL regardless of float noise."""
    if kind == "facility":
        n, mx, my = 150, 13, 17
    elif kind == "crossing":
        n, mx, my = 100, 19, 23
    else:
        raise ValueError(kind)
    rows = [
        (
            m + 1,
            wkb.encode(wkb.point(3.0 + 10 * ((m * mx) % 33), 3.0 + 10 * ((m * my) % 41))),
        )
        for m in range(n)
    ]
    schema = T.StructType(
        [T.StructField(f"{kind}_id", T.LongType()), T.StructField("geom", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def grid_dem(spark: SparkSession) -> DataFrame:
    """ORACLE-CONSTRAINED DEM for the grid network: exact-decimal elevations
    from a pure integer formula (sawtooth, so every gradient class occurs),
    covering all grid nodes at the 10 m fixture cell."""
    cells = np.arange(0, 46)
    gx, gy = np.meshgrid(cells, cells)
    pdf = pd.DataFrame(
        {
            "cell_x": gx.ravel().astype("int64"),
            "cell_y": gy.ravel().astype("int64"),
            "elevation": (((gx * 3 + gy * 7) % 25) * 2.0).ravel(),
        }
    )
    return spark.createDataFrame(pdf)


# ---------------------------------------------------------------------------
# osm_point / osm_polygon sources (for the S7 derived-layer builders)
# ---------------------------------------------------------------------------

_OSM_PT_POLY_COLS = [
    "osm_id", "way", "highway", "amenity", "tourism", "building", "landuse",
    "leisure", "natural", "waterway", "tunnel",
]
_OSM_PT_POLY_SCHEMA = T.StructType(
    [T.StructField("osm_id", T.LongType()), T.StructField("way", T.BinaryType())]
    + [T.StructField(c, T.StringType(), True) for c in _OSM_PT_POLY_COLS[2:]]
)


def _pp_row(osm_id, geom, **kv):
    base = {c: None for c in _OSM_PT_POLY_COLS}
    base["osm_id"] = osm_id
    base["way"] = wkb.encode(geom)
    base.update(kv)
    return tuple(base[c] for c in _OSM_PT_POLY_COLS)


def osm_points(spark: SparkSession) -> DataFrame:
    rows = [
        _pp_row(1, wkb.point(50, 5), amenity="cafe"),
        _pp_row(2, wkb.point(250, 25), amenity="supermarket"),
        _pp_row(3, wkb.point(450, 35), tourism="museum"),
        _pp_row(4, wkb.point(120, 3), highway="crossing"),
        _pp_row(5, wkb.point(320, 7), highway="crossing"),
        _pp_row(6, wkb.point(600, 600), amenity="parking"),  # not a facility
    ]
    return spark.createDataFrame(rows, _OSM_PT_POLY_SCHEMA)


def osm_polygons(spark: SparkSession) -> DataFrame:
    def rect(x0, y0, x1, y1):
        return wkb.polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])

    rows = [
        _pp_row(11, rect(10, 5, 60, 15), building="yes"),
        _pp_row(12, rect(100, 30, 160, 45), building="apartments"),
        _pp_row(13, rect(0, -25, 200, -5), landuse="grass"),
        _pp_row(14, rect(500, 480, 700, 620), leisure="park"),
        _pp_row(15, rect(5500, -200, 5800, 100), natural="water"),
        _pp_row(16, rect(300, 300, 360, 380), amenity="university"),
        _pp_row(17, rect(800, 800, 860, 860), landuse="industrial"),  # none
    ]
    return spark.createDataFrame(rows, _OSM_PT_POLY_SCHEMA)


# ---------------------------------------------------------------------------
# point / polygon layers (import_step.py:432-532 derived layers)
# ---------------------------------------------------------------------------

def layer_points(spark: SparkSession, kind: str) -> DataFrame:
    """facility / crossing point layers at pinned distances (5/25/35 m) from
    grid edges to exercise the 10 m / 30 m ST_DWithin thresholds (J5)."""
    rows = []
    pid = 1
    dists = [5.0, 25.0, 35.0]
    for k, d in enumerate(dists):
        # near horizontal way H0 (y=0), x staggered
        rows.append((pid, wkb.encode(wkb.point(50.0 + 200 * k, d))))
        pid += 1
    # a cluster near the ring city
    rows.append((pid, wkb.encode(wkb.point(6000.0 + 400.0, 8.0)))); pid += 1
    schema = T.StructType(
        [T.StructField(f"{kind}_id", T.LongType()), T.StructField("geom", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def layer_polygons(spark: SparkSession, kind: str) -> DataFrame:
    """building / greenness polygon layers near grid edges (J6 overlays)."""
    rows = []
    pid = 1

    def rect(x0, y0, x1, y1):
        return wkb.encode(wkb.polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))

    if kind == "building":
        rows.append((pid, rect(10, 5, 60, 15))); pid += 1     # inside 20m buffer of H0
        rows.append((pid, rect(100, 30, 160, 45))); pid += 1  # partially
        rows.append((pid, rect(300, 500, 340, 540))); pid += 1
    else:  # greenness
        rows.append((pid, rect(0, -25, 200, -5))); pid += 1   # along H0 south side
        rows.append((pid, rect(500, 480, 700, 620))); pid += 1
    schema = T.StructType(
        [T.StructField(f"{kind}_id", T.LongType()), T.StructField("geom", T.BinaryType())]
    )
    return spark.createDataFrame(rows, schema)


def water_layer(spark: SparkSession) -> DataFrame:
    """water layer with line + polygon branches (J7)."""
    rows = [
        # river linestring running parallel 10 m south of H0 (length-ratio in
        # [0.8, 1.6] against its 30 m buffer)
        (1, wkb.encode(("LineString", np.array([[-20.0, -10.0], [760.0, -10.0]]))), "line"),
        # lake polygon near the ring city
        (2, wkb.encode(wkb.polygon([[5500, -200], [5800, -200], [5800, 100], [5500, 100]])), "polygon"),
    ]
    schema = T.StructType(
        [
            T.StructField("water_id", T.LongType()),
            T.StructField("geom", T.BinaryType()),
            T.StructField("geom_type", T.StringType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def noise_layer(spark: SparkSession) -> DataFrame:
    rows = [
        (1, wkb.encode(wkb.polygon([[-50, -50], [350, -50], [350, 350], [-50, 350]])), 70.0),
        (2, wkb.encode(wkb.polygon([[350, -50], [800, -50], [800, 350], [350, 350]])), 55.0),
    ]
    schema = T.StructType(
        [
            T.StructField("noise_id", T.LongType()),
            T.StructField("geom", T.BinaryType()),
            T.StructField("noise", T.DoubleType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def dem_grid(spark: SparkSession, cell: float = 10.0) -> DataFrame:
    """DEM as (cell_x, cell_y, elevation) grid (S6): smooth west-east ramp +
    one steep hill so every gradient class -4..4 occurs."""
    xs = np.arange(-40, 120)
    ys = np.arange(-40, 120)
    gx, gy = np.meshgrid(xs, ys)
    x_m, y_m = gx * cell, gy * cell
    elev = 400.0 + 0.02 * x_m  # 2% ramp
    hill = 180.0 * np.exp(-(((x_m - 500) ** 2 + (y_m - 500) ** 2) / (2 * 120.0**2)))
    elev = elev + hill
    pdf = pd.DataFrame(
        {
            "cell_x": gx.ravel().astype("int64"),
            "cell_y": gy.ravel().astype("int64"),
            "elevation": np.round(elev.ravel(), 2),
        }
    )
    return spark.createDataFrame(pdf)


def admin_polygons(spark: SparkSession) -> DataFrame:
    """land-use/admin polygons tiling the two cities (north-star PIP)."""
    rows = []
    pid = 1

    def rect(x0, y0, x1, y1):
        return wkb.encode(wkb.polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))

    # quadrants over the grid city
    for qx in range(2):
        for qy in range(2):
            rows.append(
                (pid, "admin", rect(qx * 400 - 50, qy * 400 - 50, qx * 400 + 350, qy * 400 + 350))
            )
            pid += 1
    # ring city
    rows.append((pid, "admin", rect(5500, -500, 6500, 500))); pid += 1
    # overlapping landuse polygon (priority test)
    rows.append((pid, "landuse", rect(100, 100, 300, 300))); pid += 1
    schema = T.StructType(
        [
            T.StructField("polygon_id", T.LongType()),
            T.StructField("kind", T.StringType()),
            T.StructField("geom", T.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


# ---------------------------------------------------------------------------
# pages (BASELINE.json input_hint): url, warc_ts, html, text, lang
# ---------------------------------------------------------------------------

_PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("html", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType(), True),
    ]
)

_WORDS = (
    "strasse weg platz brücke park fluss berg stadt haus markt "
    "street road bridge river hill town square market lane gate "
    "rue pont place marché ville colline fleuve porte jardin quai"
).split()


def pages_pandas(n: int, seed: int = SEED, start: int = 0) -> pd.DataFrame:
    """Deterministic pages table as pandas (reused by tests and bench).

    ~30% of pages land in 3 hot cells (skew), ~10% have no parseable
    coordinates, 5% NULL lang.  The html embeds the text and a geo meta tag;
    extraction must recover `text` byte-identically.

    ``start`` offsets the row ids (urls, timestamps, lang stripes) so a
    LARGE table can be generated in bounded-memory chunks —
    ``pages_pandas(c, seed + j, start=j * c)`` for chunk j — with urls
    globally unique.  Determinism is per (n, seed, start) triple.
    """
    rng = np.random.RandomState(seed)
    langs = ["en", "de", "fr"]
    hot_centers = [(150.0, 150.0), (450.0, 250.0), (6000.0, 0.0)]
    rows = []
    base_ts = pd.Timestamp("2025-01-01")
    for i in range(start, start + n):
        url = f"https://site{i % 997}.example/p/{i}"
        ts = base_ts + pd.Timedelta(seconds=int(i) * 137)
        nw = 5 + int(rng.randint(0, 40))
        text = " ".join(_WORDS[rng.randint(0, len(_WORDS))] for _ in range(nw))
        lang = None if i % 20 == 19 else langs[i % 3]
        has_geo = i % 10 != 7  # ~10% without coordinates
        if has_geo:
            if rng.rand() < 0.30:
                cx, cy = hot_centers[int(rng.randint(0, 3))]
                x = cx + rng.uniform(-80, 80)
                y = cy + rng.uniform(-80, 80)
            else:
                x = rng.uniform(-200, 900)
                y = rng.uniform(-200, 900)
                if rng.rand() < 0.2:
                    x += 5800.0  # ring city
            geo_meta = (
                f'<meta name="geo.position" content="{y:.6f};{x:.6f}">'
            )
        else:
            geo_meta = ""
        html = (
            "<!DOCTYPE html><html><head>"
            f"<title>page {i}</title>{geo_meta}"
            '</head><body><nav>skip me</nav><main id="content">'
            f"{text}"
            "</main><footer>© example</footer></body></html>"
        ).encode("utf-8")
        rows.append((url, ts, html, text, lang))
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages(spark: SparkSession, n: int = 2000, seed: int = SEED) -> DataFrame:
    return spark.createDataFrame(pages_pandas(n, seed), _PAGES_SCHEMA)


# ---------------------------------------------------------------------------
# matched-scale layers (BASELINE.md parity bench): density per edge tracks
# the reference's Austria run (~0.5 buildings/edge, ~0.25 green polys/edge,
# facility/crossing points per block, coarse noise tiling, DEM per block)
# ---------------------------------------------------------------------------

def scaled_layers(
    spark: SparkSession, scale: int, dem_cell: float = 100.0,
    point_density: float = 1.0, water_density: float = 1.0,
    layer_filter: set[str] | None = None,
) -> dict[str, DataFrame]:
    """Layer dict sized to ``osm_lines(spark, scale)``'s grid-city extent.

    Unlike the pinned-distance micro layers above (which exercise exact
    thresholds), these tile the WHOLE grid so every attribute join does
    real work per edge — the honest input for edges/sec comparisons
    against the reference's Austria-scale per-op timings (BASELINE.md).

    ``point_density`` thins the facility/crossing points (1.0 = one per
    block, ~0.5/edge; the Austria-parity setting is ~1/12: OSM Austria has
    ~300k amenities and ~120k crossings against 3.88M network edges, i.e.
    0.03-0.08 per edge).  ``water_density`` spaces the rivers (1.0 = every
    16th row; Austria-parity ~1/4).  Thinning is a deterministic stride so
    runs are reproducible.

    ``layer_filter``: build only the named layers (None = all) — the
    >=2M-edge amortization bench restricts to its timed ops' inputs so the
    driver doesn't materialize millions of unused fixture tuples.
    """
    n = 8 * scale
    step = 100.0
    extent = (n - 1) * step

    def want(name: str) -> bool:
        return layer_filter is None or name in layer_filter

    def rect(x0, y0, x1, y1):
        return wkb.encode(wkb.polygon([[x0, y0], [x1, y0], [x1, y1], [x0, y1]]))

    # buildings: one 50x10 m block at the south side of every second
    # horizontal street segment -> ~n^2/2 buildings (~0.5 per edge)
    b_rows, g_rows = [], []
    pid = 1
    if want("building"):
        for i in range(n):
            for j in range(0, n - 1, 2):
                x0 = j * step + 15.0
                y0 = i * step + 4.0
                b_rows.append((pid, rect(x0, y0, x0 + 50.0, y0 + 10.0)))
                pid += 1
    # greenness: one 80x60 m park per 2x2 block (~0.25 per edge), offset so
    # parks straddle the 30 m buffers of two streets
    pid = 1
    if want("greenness"):
        for i in range(0, n - 1, 2):
            for j in range(1, n - 1, 2):
                x0 = j * step + 10.0
                y0 = i * step + 25.0
                g_rows.append((pid, rect(x0, y0, x0 + 80.0, y0 + 60.0)))
                pid += 1
    poly_schema = lambda kind: T.StructType(
        [T.StructField(f"{kind}_id", T.LongType()), T.StructField("geom", T.BinaryType())]
    )
    buildings = spark.createDataFrame(b_rows, poly_schema("building"))
    greenness = spark.createDataFrame(
        [(i, g) for i, g in g_rows], poly_schema("greenness")
    )

    # facility / crossing points: one per block, staggered 5..35 m from the
    # nearest horizontal street (exercises both DWithin radii)
    f_rows, c_rows = [], []
    pid = 1
    stride = max(1, int(round(1.0 / point_density)))
    if want("facility") or want("crossing"):
        for i in range(n):
            for j in range(n - 1):
                d = [5.0, 25.0, 35.0][(i + j) % 3]
                if pid % stride == 0 or stride == 1:
                    f_rows.append((pid, wkb.encode(wkb.point(j * step + 70.0, i * step + d))))
                    c_rows.append((pid, wkb.encode(wkb.point(j * step + 50.0, i * step + (pid % 12)))))
                pid += 1
    facility = spark.createDataFrame(f_rows, poly_schema("facility"))
    crossing = spark.createDataFrame(c_rows, poly_schema("crossing"))

    # noise: 400x400 m tiles with alternating dB over the whole city
    n_rows = []
    pid = 1
    for i in range(0, n, 4):
        for j in range(0, n, 4):
            n_rows.append(
                (
                    pid,
                    rect(j * step - 50, i * step - 50, j * step + 350, i * step + 350),
                    55.0 + 15.0 * ((i + j) % 2),
                )
            )
            pid += 1
    noise = spark.createDataFrame(
        n_rows,
        T.StructType(
            [
                T.StructField("noise_id", T.LongType()),
                T.StructField("geom", T.BinaryType()),
                T.StructField("noise", T.DoubleType()),
            ]
        ),
    )

    # water: a river along every 16th row + one lake per quadrant
    w_rows = []
    wid = 1
    river_step = max(16, int(round(16.0 / water_density)))
    for i in range(0, n, river_step):
        w_rows.append(
            (
                wid,
                wkb.encode(
                    ("LineString", np.array([[-20.0, i * step - 10.0], [extent + 20.0, i * step - 10.0]]))
                ),
                "line",
            )
        )
        wid += 1
    for qx in (0.25, 0.75):
        for qy in (0.25, 0.75):
            cx, cy = qx * extent, qy * extent
            w_rows.append((wid, rect(cx, cy + 38.0, cx + 220.0, cy + 260.0), "polygon"))
            wid += 1
    water = spark.createDataFrame(
        w_rows,
        T.StructType(
            [
                T.StructField("water_id", T.LongType()),
                T.StructField("geom", T.BinaryType()),
                T.StructField("geom_type", T.StringType()),
            ]
        ),
    )

    # DEM: one elevation sample per dem_cell over the full extent (+margin)
    m = int(extent / dem_cell) + 9
    xs = np.arange(-4, m)
    ys = np.arange(-4, m)
    gx, gy = np.meshgrid(xs, ys)
    x_m, y_m = gx * dem_cell, gy * dem_cell
    elev = 400.0 + 0.02 * x_m + 180.0 * np.exp(
        -(((x_m - 0.3 * extent) ** 2 + (y_m - 0.6 * extent) ** 2) / (2 * (0.1 * extent + 1) ** 2))
    )
    dem = spark.createDataFrame(
        pd.DataFrame(
            {
                "cell_x": gx.ravel().astype("int64"),
                "cell_y": gy.ravel().astype("int64"),
                "elevation": np.round(elev.ravel(), 2),
            }
        )
    )
    return {
        "facility": facility,
        "crossing": crossing,
        "building": buildings,
        "greenness": greenness,
        "water": water,
        "noise": noise,
        "dem": dem,
    }
