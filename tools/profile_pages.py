"""Per-sub-op scaling profile of the pages stage (tools/scaling.py laggard).

Usage: SPARK_GRAFT_CPUS=2 python tools/profile_pages.py [n_pages]
Prints one JSON line with per-sub-op seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "2")
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    scale = int(os.environ.get("SPARK_GRAFT_OSM_SCALE", "28"))

    from netascore_spark.session import build_session
    from netascore_spark.sources import fixtures
    from netascore_spark.pipeline import network as N
    from netascore_spark.pipeline import pages as PG

    spark = build_session(
        app_name="profile-pages", master=f"local[{cpus}]", shuffle_partitions=64
    )
    spark.sparkContext.setLogLevel("ERROR")

    osm = fixtures.osm_lines(spark, scale=scale)
    edges, _ = N.build_network(osm)
    edges = edges.localCheckpoint()
    edges.count()

    pages_pdf = fixtures.pages_pandas(n_pages)
    pg_raw = spark.createDataFrame(pages_pdf, fixtures._PAGES_SCHEMA).persist()
    pg_raw.count()

    t: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        print(f"  {name}: {t[name]}s", file=sys.stderr)
        return out

    pg = PG.extract_pages(pg_raw).persist()
    timed("extract", pg.count)
    timed("verify", lambda: PG.verify_extraction(pg))
    timed("pip", lambda: PG.join_polygons(pg, fixtures.admin_polygons(spark)).count())
    nn = timed("knn", lambda: PG.nearest_edges(pg, edges, k=1, radius=500.0).persist())
    timed("knn_count", nn.count)
    timed("agg", lambda: PG.page_edge_attributes(nn, pg).count())

    print(json.dumps({"cpus": int(cpus), "n_pages": n_pages, "subops": t,
                      "total": round(sum(t.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
