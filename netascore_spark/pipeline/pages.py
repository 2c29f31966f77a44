"""Web-scale pages graft (north rule / BASELINE.json input_hint).

Input: an Iceberg/Parquet table ``pages(url, warc_ts, html, text, lang)`` at
Common-Crawl scale.  Stages:

1. ``extract_text``   — byte-identical HTML -> text extraction, Arrow-
   vectorized (no per-row Python): the per-row invariant of the north rule.
2. ``parse_geo``      — geocoordinate parsing from the page (vectorized
   regex over the decoded HTML).
3. ``encode_cells``   — batched cell encoding (H3-res-9-analog planar grid,
   netascore_spark.grid).
4. ``join_polygons``  — point-in-polygon against land-use/admin polygons
   (cell equi-join + exact PIP refine; polygons broadcast).
5. ``nearest_edges``  — cell-ring kNN to the nearest road segment(s):
   expand the page's cell by rings covering the search radius, equi-join to
   edge cells, exact distance refine, rank per page.
6. ``page_edge_attributes`` — aggregate page-derived mass onto edges.

Skew: ~30% of pages land in a handful of hot urban cells.  The kNN join
pre-salts hot cells (operators.spatial.salt_cells) and AQE skew-join splits
the rest at runtime.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from netascore_spark import grid
from netascore_spark.geometry import ops, wkb
from netascore_spark.operators import spatial

# The fixture/Common-Crawl-style extraction target: the <main id="content">
# element.  Vectorized regex via pandas .str — one Arrow batch at a time.
_TEXT_PATTERN = r'<main id="content">(.*?)</main>'
_GEO_PATTERN = r'<meta name="geo\.position" content="(-?[0-9.]+);(-?[0-9.]+)">'


@F.pandas_udf(
    T.StructType(
        [
            T.StructField("extracted_text", T.StringType()),
            T.StructField("x", T.DoubleType()),
            T.StructField("y", T.DoubleType()),
        ]
    )
)
def extract_page_udf(html: pd.Series) -> pd.DataFrame:
    """Fused extract_text + parse_geo: ONE utf-8 decode of the html bytes
    (the dominant python-side cost — html is the fat column) feeds both
    regexes.  Semantics identical to running the two single-purpose UDFs."""
    decoded = pd.Series(
        [None if h is None else bytes(h).decode("utf-8", errors="strict") for h in html]
    )
    text = decoded.str.extract(_TEXT_PATTERN, expand=False)
    m = decoded.str.extract(_GEO_PATTERN)
    return pd.DataFrame(
        {
            "extracted_text": text,
            "x": pd.to_numeric(m[1], errors="coerce"),
            "y": pd.to_numeric(m[0], errors="coerce"),
        }
    )


def extract_pages(pages: DataFrame, cell_size: float = grid.DEFAULT_CELL_SIZE) -> DataFrame:
    """pages -> url, warc_ts, lang, extracted_text, x, y, cell.

    One fused Arrow pass over ``html`` (extract_page_udf) — the html bytes
    cross the Arrow boundary once and are utf-8-decoded once; the cell
    encode is a native Column expression (no python stage at all)."""
    out = (
        pages.withColumn("__e", extract_page_udf(F.col("html")))
        .select(
            "url", "warc_ts", "lang", "text",
            F.col("__e.extracted_text").alias("extracted_text"),
            F.col("__e.x").alias("x"), F.col("__e.y").alias("y"),
        )
        .withColumn(
            "cell",
            F.when(
                F.col("x").isNotNull(),
                spatial.point_cell_expr(F.col("x"), F.col("y"), cell_size),
            ),
        )
    )
    return out


def verify_extraction(pages_extracted: DataFrame) -> int:
    """Count of pages whose extracted text is NOT byte-identical to `text`
    (north-rule invariant; must be 0)."""
    return pages_extracted.filter(
        ~F.col("extracted_text").eqNullSafe(F.col("text"))
    ).count()


# ---------------------------------------------------------------------------
# point-in-polygon join (pages x admin/landuse polygons)
# ---------------------------------------------------------------------------

def join_polygons(
    pages_geo: DataFrame,
    polygons: DataFrame,
    cell_size: float = grid.DEFAULT_CELL_SIZE,
) -> DataFrame:
    """All (url, polygon_id, kind) containments.  Polygons broadcast (the
    admin/landuse layer is tiny next to 10^12 pages)."""
    pg = pages_geo.filter(F.col("cell").isNotNull()).select("url", "x", "y", "cell")
    poly_cells = spatial.with_cells(
        polygons.select("polygon_id", "kind", "geom"), "geom", cell_size
    )
    cand = pg.join(F.broadcast(poly_cells), "cell").dropDuplicates(["url", "polygon_id"])

    @F.pandas_udf(T.BooleanType())
    def pip(x: pd.Series, y: pd.Series, geom: pd.Series) -> pd.Series:
        out = np.zeros(len(x), dtype=bool)
        cache: dict[bytes, list] = {}
        for i, (px, py, g) in enumerate(zip(x, y, geom)):
            gb = bytes(g)
            rings = cache.get(gb)
            if rings is None:
                rings = wkb.decode(gb)[1]
                cache[gb] = rings
            out[i] = ops.point_in_polygon(np.array([px, py]), rings)
        return pd.Series(out)

    # spread + nondeterministic refine: keeps the (python) PIP refine at full
    # parallelism — byte-based AQE coalescing under-provisions UDF stages,
    # and a deterministic UDF predicate would be pushed (and DUPLICATED)
    # below the repartition
    return (
        spatial.spread(cand)
        .filter(pip.asNondeterministic()(F.col("x"), F.col("y"), F.col("geom")))
        .select("url", "polygon_id", "kind")
    )


# ---------------------------------------------------------------------------
# cell-ring kNN to nearest road segment
# ---------------------------------------------------------------------------

# Edge tables at or below this count may use the python-side broadcast
# fast path (dict of edge_id -> WKB on every executor).  1e6 edges x ~150 B
# is ~150 MB per python worker — the upper end of sane; anything bigger MUST
# resolve geometry with the distributed edge_id join.
BROADCAST_MAX_EDGES = 1_000_000

# "auto" salting: cells holding more pages than this are pre-split across
# salt buckets.  Absolute (not total-relative) on purpose — a 50k-page cell
# is a straggler on any cluster size, and an absolute bound costs exactly
# one histogram aggregation, no total count.
AUTO_SALT_THRESHOLD = 50_000


def nearest_edges(
    pages_geo: DataFrame,
    edges: DataFrame,
    k: int = 1,
    radius: float = 500.0,
    cell_size: float = grid.DEFAULT_CELL_SIZE,
    salt_threshold: int | str | None = "auto",
    progressive: bool = True,
    geom_strategy: str = "join",
) -> DataFrame:
    """(url, edge_id, dist, rank<=k) for edges within ``radius``.

    ``geom_strategy`` controls how candidate pairs get their edge geometry:

    - ``"join"`` (default, the 100 TB path): candidates — (url, x, y,
      edge_id) only, no WKB in the cell shuffle — join back to the edge
      table on ``edge_id``.  One extra shuffle of *candidate rows only*;
      no driver collect, no per-executor geometry dict.
    - ``"broadcast"``: collect edge geometries to a python-side broadcast
      dict (fast when the edge table is provably small; refuses to run
      above ``BROADCAST_MAX_EDGES``).
    - ``"auto"``: bounded count, broadcast iff <= ``BROADCAST_MAX_EDGES``.

    ``salt_threshold``: ``"auto"`` (default) pre-splits cells holding more
    than ``AUTO_SALT_THRESHOLD`` pages via one histogram pass; an int is an
    explicit threshold; ``None`` disables salting (AQE skew-join only).

    ``progressive=True`` (the DEFAULT) is two-phase cell-ring expansion:
    phase 1 searches a small padded cover (``cell_size/2``); a page is
    FINAL when its k-th best distance <= that pad (its cell is inside every
    nearer edge's padded cover, so no closer edge can exist outside).  Only
    unresolved pages rejoin against the full ``radius`` cover.  Pinned
    result-identical to the flat search (tests/test_pages.py); at realistic
    urban edge density the flat plan explodes to ~400 candidates per page
    (radius 500 m) while phase 1 needs ~50 — measured 7x faster at 100k
    edges / 600k pages.
    """
    if progressive and radius > cell_size:
        p1 = cell_size / 2.0
        phase1 = nearest_edges(
            pages_geo, edges, k, p1, cell_size, salt_threshold,
            progressive=False, geom_strategy=geom_strategy,
        )
        kth = phase1.groupBy("url").agg(
            F.max("dist").alias("kth"), F.count("*").alias("n")
        )
        final_urls = kth.filter((F.col("n") >= k) & (F.col("kth") <= p1)).select("url")
        resolved = phase1.join(final_urls, "url", "left_semi")
        unresolved_pages = pages_geo.join(final_urls, "url", "left_anti")
        rest = nearest_edges(
            unresolved_pages, edges, k, radius, cell_size, salt_threshold,
            progressive=False, geom_strategy=geom_strategy,
        )
        return resolved.unionByName(rest)
    # pad the EDGE side (the far smaller cover): each page keeps its single
    # cell; edges explode to cells within `radius` of their linework — the
    # same cell-ring guarantee at a fraction of the shuffled rows (pages are
    # the 10^12 side at scale).
    pg = pages_geo.filter(F.col("x").isNotNull()).select("url", "x", "y", "cell")
    # spread BEFORE the cover explode: the edge table often arrives as a
    # 1-3 partition cache (byte-coalesced), which would run the padded-cover
    # UDF serially — a fixed serial cost that caps scaling of the whole kNN
    ec = spatial.with_cells(
        spatial.spread(edges.select("edge_id", "geom")), "geom", cell_size, pad=radius
    ).select("cell", "edge_id")  # geometry re-attached after the cell join

    if geom_strategy == "auto":
        n_bounded = edges.select("edge_id").limit(BROADCAST_MAX_EDGES + 1).count()
        geom_strategy = "broadcast" if n_bounded <= BROADCAST_MAX_EDGES else "join"

    # "auto" (the default): one map-side-combined histogram pass finds cells
    # whose page count exceeds the absolute straggler bound — a cell holding
    # more rows than that dominates its task on any cluster size, so the
    # threshold needs no total count.  When no cell is hot, the salting
    # machinery (string keys, edge-side replication) is skipped entirely.
    join_key = "cell"
    if salt_threshold:
        thr = AUTO_SALT_THRESHOLD if salt_threshold == "auto" else salt_threshold
        hot = spatial.hot_cells(pg, "cell", thr)
        if hot:
            pg, ec = spatial.salt_cells(pg, ec, hot)
            join_key = "cell_salt"

    # each page carries exactly ONE cell, so a (url, edge) pair meets in at
    # most one cell — no pair-dedup shuffle needed
    cand = pg.join(ec, join_key)

    if geom_strategy == "broadcast":
        # small-edge fast path: candidate rows carry only (url, x, y,
        # edge_id) — ~10x less Arrow traffic than a WKB column per candidate.
        geom_rows = edges.select("edge_id", "geom").limit(
            BROADCAST_MAX_EDGES + 1
        ).collect()
        if len(geom_rows) > BROADCAST_MAX_EDGES:
            raise ValueError(
                f"geom_strategy='broadcast' with > {BROADCAST_MAX_EDGES} edges; "
                "use geom_strategy='join'"
            )
        geom_map = {r["edge_id"]: bytes(r["geom"]) for r in geom_rows}
        bc_geoms = pages_geo.sparkSession.sparkContext.broadcast(geom_map)

        @F.pandas_udf(T.DoubleType())
        def dist_bc(x: pd.Series, y: pd.Series, edge_id: pd.Series) -> pd.Series:
            # group the Arrow batch by edge and compute all its page distances
            # in one vectorized pass (numpy N x segments broadcast)
            geoms = bc_geoms.value
            xs, ys = x.to_numpy(), y.to_numpy()
            out = np.empty(len(x))
            order: dict[int, list[int]] = {}
            for i, e in enumerate(edge_id):
                order.setdefault(int(e), []).append(i)
            for eid, idx in order.items():
                coords = wkb.decode(geoms[eid])[1]
                pts = np.stack([xs[idx], ys[idx]], axis=1)
                out[idx] = ops.points_line_dist(pts, coords)
            return pd.Series(out)

        scored = cand.withColumn(
            "dist", dist_bc(F.col("x"), F.col("y"), F.col("edge_id"))
        )
    elif geom_strategy == "join":
        # distributed path: shuffle ONLY the candidate rows on edge_id and
        # attach geometry from the edge table — the driver never sees a
        # geometry, and no executor holds more than its join partitions.
        cand = cand.join(edges.select("edge_id", "geom"), "edge_id")

        @F.pandas_udf(T.DoubleType())
        def dist_join(x: pd.Series, y: pd.Series, geom: pd.Series) -> pd.Series:
            # candidates arrive clustered by edge_id (post-join) — group the
            # Arrow batch by WKB bytes, decode each edge once, vectorize
            xs, ys = x.to_numpy(), y.to_numpy()
            out = np.empty(len(x))
            order: dict[bytes, list[int]] = {}
            for i, g in enumerate(geom):
                order.setdefault(bytes(g), []).append(i)
            for gb, idx in order.items():
                coords = wkb.decode(gb)[1]
                pts = np.stack([xs[idx], ys[idx]], axis=1)
                out[idx] = ops.points_line_dist(pts, coords)
            return pd.Series(out)

        scored = cand.withColumn(
            "dist", dist_join(F.col("x"), F.col("y"), F.col("geom"))
        ).drop("geom")
    else:
        raise ValueError(f"unknown geom_strategy {geom_strategy!r}")

    scored = scored.filter(F.col("dist") <= radius)
    if k == 1:
        # nearest-only: min(struct(dist, edge_id)) aggregates map-side
        # (partial combine) — no full window shuffle+sort.  struct ordering
        # matches the window tie-break (dist asc, edge_id asc).
        best = scored.groupBy("url").agg(F.min(F.struct("dist", "edge_id")).alias("m"))
        return best.select(
            "url",
            F.col("m.edge_id").alias("edge_id"),
            F.round(F.col("m.dist"), 6).alias("dist"),
            F.lit(1).alias("rank"),
        )
    w = Window.partitionBy("url").orderBy(F.col("dist").asc(), F.col("edge_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("url", "edge_id", F.round(F.col("dist"), 6).alias("dist"), "rank")
    )


# ---------------------------------------------------------------------------
# page-derived edge attributes
# ---------------------------------------------------------------------------

def page_edge_attributes(page_edges: DataFrame, pages_geo: DataFrame) -> DataFrame:
    """Aggregate page mass per edge: count + language histogram (the grafted
    'attribute mass' the north star attaches to segments)."""
    joined = page_edges.filter(F.col("rank") == 1).join(
        pages_geo.select("url", "lang"), "url"
    )
    return joined.groupBy("edge_id").agg(
        F.count("*").alias("page_count"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("pages_en"),
        F.sum(F.when(F.col("lang") == "de", 1).otherwise(0)).alias("pages_de"),
        F.sum(F.when(F.col("lang") == "fr", 1).otherwise(0)).alias("pages_fr"),
        F.round(F.avg("dist"), 2).alias("avg_page_dist"),
    )
