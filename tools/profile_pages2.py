"""Fine-grained pages-stage profile on the CURRENT bench path (fixture
cache, fused slim extract) — hunts the ~19 s serial residue the round-4
gated legs exposed (pages 2->8 efficiency 0.67; C + W/n fit gives C~19 s).

Usage: SPARK_GRAFT_CPUS=8 python tools/profile_pages2.py [n_pages]
Adds counts per sub-op, so total != bench pages_tile_join; use for
RELATIVE attribution across core counts only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 2_400_000
    scale = int(os.environ.get("SPARK_GRAFT_OSM_SCALE", "56"))
    from bench import fixture_cache_dir

    fixcache = fixture_cache_dir()
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")

    from pyspark.sql import functions as F
    from netascore_spark.session import build_session
    from netascore_spark.sources import fixtures
    from netascore_spark.pipeline import network as N
    from netascore_spark.pipeline import pages as PG
    from netascore_spark.operators import spatial
    from netascore_spark import grid

    spark = build_session(
        app_name="profile-pages2", master=f"local[{cpus}]",
        shuffle_partitions=64,
        extra_conf={
            "spark.sql.files.maxPartitionBytes": str(16 << 20),
            "spark.sql.files.openCostInBytes": str(1 << 20),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr, flush=True)
        return out

    osm = spark.read.parquet(os.path.join(fixcache, f"osm_scale{scale}"))
    edges = nodes = None

    def setup_net():
        nonlocal edges
        e, _ = N.build_network(osm, scalable_ids=True)
        edges = e.localCheckpoint()
        return edges.count()

    timed("SETUP_network", setup_net)

    pg_raw = spark.read.parquet(os.path.join(fixcache, f"pages_{n_pages}"))
    timed("SETUP_pagecache_warm", pg_raw.count)

    pg = (
        PG.extract_pages(pg_raw)
        .withColumn("__ok", F.col("extracted_text").eqNullSafe(F.col("text")))
        .select("url", "warc_ts", "lang", "x", "y", "cell", "__ok")
        .persist()
    )
    timed("extract_verify", lambda: pg.filter(~F.col("__ok")).count())
    timed("pip", lambda: PG.join_polygons(pg, fixtures.admin_polygons(spark)).count())

    # --- decomposed progressive kNN (mirrors nearest_edges internals) -----
    cell_size = grid.DEFAULT_CELL_SIZE
    segs_base = timed(
        "knn_segs_explode",
        lambda: spatial.explode_segments(edges, "edge_id").persist(),
    )
    timed("knn_segs_count", segs_base.count)
    hot = timed(
        "knn_hot_histogram",
        lambda: spatial.hot_cells(pg.filter(F.col("x").isNotNull()), "cell", 50_000),
    )
    phase1 = timed(
        "knn_phase1_build",
        lambda: PG.nearest_edges(
            pg, edges, 1, cell_size / 2.0, cell_size, "auto",
            progressive=False, _segs=segs_base, _hot=hot,
        ).persist(),
    )
    timed("knn_phase1_count", phase1.count)
    kth = phase1.groupBy("url").agg(
        F.max("dist").alias("kth"), F.count("*").alias("n")
    )
    final_urls = kth.filter(
        (F.col("n") >= 1) & (F.col("kth") <= cell_size / 2.0)
    ).select("url").persist()
    timed("knn_final_urls_count", final_urls.count)
    resolved = phase1.join(final_urls, "url", "left_semi")
    unresolved = pg.join(final_urls, "url", "left_anti")
    rest = PG.nearest_edges(
        unresolved, edges, 1, 500.0, cell_size, "auto",
        progressive=False, _segs=segs_base, _hot=hot,
    )
    nn = resolved.unionByName(rest)
    timed("knn_rest_and_agg", lambda: PG.page_edge_attributes(nn, pg).count())

    print(json.dumps({"cpus": int(cpus), "n_pages": n_pages, "subops": t}))
    spark.stop()


if __name__ == "__main__":
    main()
