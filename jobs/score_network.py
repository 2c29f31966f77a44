"""spark-submit entry point: build + score a network end-to-end.

The north-rule deployment shape::

    python tools/make_pyfiles.py
    spark-submit --master <cluster> --py-files dist/netascore_spark.zip \
        jobs/score_network.py --scale 4 [--out /path/parquet]

The job imports netascore_spark from the shipped zip (no install on the
executors), runs the full pipeline (network -> attributes -> two-profile
index) on the fixture city at ``--scale``, and writes (or counts) the
scored edges.  On a real cluster swap the fixture source for an
``osm``/``parquet`` import — the compute path is identical.  Profiles
are read from the zip's ``profiles/`` directory, so no shared filesystem
is needed beyond the archive itself.
"""

from __future__ import annotations

import argparse
import os
import sys


def _profile_path(name: str) -> str:
    """Resolve a default profile from the repo or the --py-files zip."""
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for base in (here, os.getcwd()):
        p = os.path.join(base, "profiles", name)
        if os.path.exists(p):
            return p
    # inside the zip: importlib can't give a path, so extract to tmp
    import importlib.resources
    import tempfile
    import zipfile

    for entry in sys.path:
        if entry.endswith(".zip") and zipfile.is_zipfile(entry):
            with zipfile.ZipFile(entry) as z:
                arc = f"profiles/{name}"
                if arc in z.namelist():
                    d = tempfile.mkdtemp()
                    z.extract(arc, d)
                    return os.path.join(d, arc)
    raise FileNotFoundError(name)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, default=4)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    # spark-submit provides the session config; getOrCreate attaches to it
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("netascore-score").getOrCreate()

    from netascore_spark.pipeline.export import run_pipeline
    from netascore_spark.plans.profile import Profile
    from netascore_spark.sources import fixtures

    osm = fixtures.osm_lines(spark, scale=args.scale)
    layers = {
        "facility": fixtures.layer_points(spark, "facility"),
        "crossing": fixtures.layer_points(spark, "crossing"),
        "building": fixtures.layer_polygons(spark, "building"),
        "greenness": fixtures.layer_polygons(spark, "greenness"),
        "water": fixtures.water_layer(spark),
        "noise": fixtures.noise_layer(spark),
        "dem": fixtures.dem_grid(spark),
    }
    profiles = [
        Profile.from_yaml(_profile_path("profile_bike.yml"), "bike"),
        Profile.from_yaml(_profile_path("profile_walk.yml"), "walk"),
    ]
    out = run_pipeline(spark, osm, layers, profiles)
    scored = out["network_edge_index"]
    if args.out:
        scored.write.mode("overwrite").parquet(args.out)
        n = spark.read.parquet(args.out).count()
    else:
        n = scored.count()
    print(f"scored_edges={n}")
    return 0 if n > 0 else 1


if __name__ == "__main__":
    sys.exit(main())
