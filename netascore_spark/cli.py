"""settings.yml-driven pipeline entry (generate_index.py parity).

Reproduces the reference's one-command UX (``generate_index.py:17-62``):

    python -m netascore_spark run settings.yml [--skip import network ...]
                                               [--loglevel 1..4]

Settings schema mirrors the reference's (examples/settings_*.yml there;
``examples/settings_fixture.yml`` here), with the import/export types this
engine supports instead of Postgres connections:

- import.type: ``fixture`` (synthetic micro-world, key ``scale``),
  ``parquet`` (key ``path`` — a dir holding osm_line.parquet and optional
  layer parquets), or ``geopackage`` (keys ``filename``, ``layer``).
- optional.dem: ``geotiff`` (pure-python reader, sources/geotiff.py) or
  ``parquet`` grid table; other optional layers: parquet.
- export.type: ``parquet`` (the scale sink) or ``geopackage`` (single-node
  parity writer, sources/geopackage.py) with ``filename`` supporting the
  reference's ``<case_id>`` placeholder.

Validation follows toolbox/helper.py:120-137: missing required sections
abort with exit code 1; ``on_existing`` defaults to ``skip`` and must be one
of skip/delete/abort.
"""

from __future__ import annotations

import os
import re
import sys

import pandas as pd

from pyspark.sql import SparkSession

STEPS = ["import", "optional", "network", "attributes", "index", "export"]
_ALLOWED_ON_EXISTING = ["skip", "delete", "abort"]

verbose_level = 2


def _log(msg: str, level: int = 2) -> None:
    if level <= verbose_level:
        print(msg, file=sys.stderr)


def _require_keys(d: dict, keys: list[str], msg: str) -> None:
    for k in keys:
        if k not in d:
            _log(f"{msg} {k}", 1)
            sys.exit(1)


def _require_allowed(value: str, name: str, allowed: list[str]) -> None:
    if value not in allowed:
        _log(f"{name}: {value} is not one of the allowed values: {' '.join(allowed)}", 1)
        sys.exit(1)


def _on_existing(section: dict) -> str:
    if "on_existing" not in section:
        _log("defaulting 'on_existing' to 'skip'")
        section["on_existing"] = "skip"
    _require_allowed(section["on_existing"], "on_existing", _ALLOWED_ON_EXISTING)
    return section["on_existing"]


def _load_import(spark: SparkSession, imp: dict, base_path: str):
    kind = imp["type"]
    if kind == "fixture":
        from netascore_spark.sources import fixtures

        scale = int(imp.get("scale", 1))
        osm = fixtures.osm_lines(spark, scale=scale)
        layers = {
            "facility": fixtures.layer_points(spark, "facility"),
            "crossing": fixtures.layer_points(spark, "crossing"),
            "building": fixtures.layer_polygons(spark, "building"),
            "greenness": fixtures.layer_polygons(spark, "greenness"),
            "water": fixtures.water_layer(spark),
            "noise": fixtures.noise_layer(spark),
            "dem": fixtures.dem_grid(spark),
        }
        return osm, layers
    if kind == "parquet":
        path = imp.get("path") or imp.get("directory")
        if not path:
            _log("error: import section is missing: path", 1)
            sys.exit(1)
        path = path if os.path.isabs(path) else os.path.join(base_path, path)
        osm = spark.read.parquet(os.path.join(path, "osm_line.parquet"))
        layers = {}
        for name in ["facility", "crossing", "building", "greenness", "water", "noise", "dem"]:
            p = os.path.join(path, f"{name}.parquet")
            if os.path.exists(p):
                layers[name] = spark.read.parquet(p)
        return osm, layers
    if kind == "geopackage":
        from netascore_spark.sources.geopackage import read_geopackage

        _require_keys(imp, ["filename", "layer"], "error: import section is missing:")
        p = imp["filename"]
        p = p if os.path.isabs(p) else os.path.join(base_path, p)
        osm = read_geopackage(spark, p, imp["layer"])
        return osm, {}
    if kind == "osm":
        # real .osm XML extract (import_step.py:424 osm2pgsql equivalent):
        # parse to osm_point/line/polygon, then derive the standard layers
        # (building/crossing/facility/greenness/water, import_step.py:432+)
        # with scalable ids over the (src, osm_id) total order.
        from netascore_spark.sources.osmxml import read_osm_xml
        from netascore_spark.sources.osmpbf import read_osm_pbf
        from netascore_spark.sources import layers as L
        from netascore_spark.operators.ids import assign_ids

        if "filename" not in imp:
            # reference dispatch (import_step.py:396-407): no file ->
            # Overpass download by place_name or bbox.  The transport is
            # the module's urllib one unless a test injected another.
            from netascore_spark.sources import overpass as ov

            if "place_name" in imp:
                transport = imp.get("_transport") or ov.urllib_transport
                _, _, _, tables = ov.import_from_place(
                    spark, imp["place_name"], base_path, transport,
                    admin_level=imp.get("admin_level"),
                    zip_code=imp.get("zip_code"),
                    buffer=float(imp.get("buffer", 500.0)),
                    custom_srid=imp.get("srid"),
                    on_existing=imp.get("on_existing", "abort"),
                )
            elif "bbox" in imp:
                transport = imp.get("_transport") or ov.urllib_transport
                dest = os.path.join(base_path, "osm_download_default_net.xml")
                bbox = imp["bbox"]
                if isinstance(bbox, str):
                    bbox = [float(v) for v in bbox.split(",")]
                ov.download_network(
                    bbox, dest, transport,
                    on_existing=imp.get("on_existing", "abort"),
                )
                tables = read_osm_xml(spark, dest, imp.get("projection", "utm"))
            else:
                _log("error: neither 'filename' nor 'place_name'/'bbox' in "
                     "the osm import section (import_step.py:396-399)", 1)
                sys.exit(1)
        else:
            p = imp["filename"]
            p = p if os.path.isabs(p) else os.path.join(base_path, p)
            reader = read_osm_pbf if p.endswith(".pbf") else read_osm_xml
            tables = reader(spark, p, imp.get("projection", "utm"))
        pt, ln, pg = tables["osm_point"], tables["osm_line"], tables["osm_polygon"]

        def with_id(df, name):
            out = assign_ids(df, ["src", "osm_id"], f"{name}_id").drop(
                "src", "osm_id"
            )
            rest = [c for c in out.columns if c != f"{name}_id"]
            return out.select(f"{name}_id", *rest)

        layers = {
            "facility": with_id(L.facility_layer(pt, pg, True), "facility"),
            "crossing": with_id(L.crossing_layer(pt, ln, pg, True), "crossing"),
            "building": with_id(L.building_layer(pg, True), "building"),
            "greenness": with_id(L.greenness_layer(pg, True), "greenness"),
            "water": with_id(L.water_layer(ln, pg, True), "water"),
        }
        return ln, layers
    _log(f"import type '{kind}' not supported (GIP HTTP download is out of "
         "scope per SURVEY §7 — use type: osm with place_name/bbox/filename, "
         "or convert with ogr2ogr to parquet or gpkg)", 1)
    sys.exit(1)


def _load_optional(spark: SparkSession, optional: dict, layers: dict, base_path: str) -> None:
    for name, spec in (optional or {}).items():
        kind = spec.get("type", "parquet")
        fn = spec.get("filename") or spec.get("path")
        if fn and not os.path.isabs(fn):
            fn = os.path.join(base_path, fn)
        if kind == "geotiff":
            from netascore_spark.sources.geotiff import geotiff_to_dem_grid

            layers[name] = geotiff_to_dem_grid(
                spark, fn, cell=float(spec.get("cell", 10.0)),
                nodata=spec.get("nodata"),
            )
        elif kind == "parquet":
            layers[name] = spark.read.parquet(fn)
        else:
            _log(f"optional importer type '{kind}' not supported", 1)
            sys.exit(1)


def run_settings(
    settings: dict,
    base_path: str = ".",
    skip: list[str] | None = None,
    spark: SparkSession | None = None,
) -> dict:
    """Execute the six-stage flow from a parsed settings dict; returns the
    result DataFrames (run_pipeline output) plus export paths."""
    from netascore_spark.pipeline.export import run_pipeline
    from netascore_spark.plans.profile import Profile

    skip = list(skip or [])
    case_id = "default"
    target_srid = 32633
    if "global" in settings:
        g = settings["global"]
        if "case_id" in g:
            case_id = re.sub("[^a-zA-Z0-9_]", "", str(g["case_id"]))
        if "target_srid" in g:
            target_srid = int(re.sub("[^0-9]", "", str(g["target_srid"])))

    # presence checks BEFORE doing any work (generate_index.py:66-71)
    if "import" not in skip:
        _require_keys(settings, ["import"], "error: section missing:")
    if "export" not in skip:
        _require_keys(settings, ["export"], "error: section missing:")
    if "index" not in skip:
        _require_keys(settings, ["profiles"], "error: section missing:")

    own_session = spark is None
    if own_session:
        from netascore_spark.session import build_session

        spark = build_session(app_name=f"netascore-{case_id}")

    try:
        if "import" not in skip:
            _log(" === importing ===", 1)
            imp = settings["import"]
            _require_keys(imp, ["type"], "error: import section is missing:")
            _on_existing(imp)
            osm, layers = _load_import(spark, imp, base_path)
        else:
            # generate_index.py:83: the reference resumes from tables already
            # in the database; our durable store is the checkpoint dir, so a
            # skipped import forces the network/attributes snapshots to be
            # the data source (run_pipeline enforces their existence).
            _log(" === skipping import ===", 1)
            osm, layers = None, {}
            if not settings.get("global", {}).get("checkpoint_dir"):
                _log("error: --skip import requires global.checkpoint_dir", 1)
                sys.exit(1)

        if "optional" not in skip and "optional" in settings:
            _log(" === running optional importers ===", 1)
            _load_optional(spark, settings["optional"], layers, base_path)

        profiles = []
        if "index" not in skip:
            for spec in settings["profiles"]:
                fn = spec["filename"]
                fn = fn if os.path.isabs(fn) else os.path.join(base_path, fn)
                flags = {k: v for k, v in spec.items() if k.startswith("filter_access")}
                profiles.append(Profile.from_yaml(fn, spec["profile_name"], **flags))

        compute_explanation = bool(
            (settings.get("index") or {}).get("compute_explanation", False)
        )

        _log(" === network / attributes / index ===", 1)
        out = run_pipeline(
            spark, osm, layers, profiles,
            checkpoint_dir=settings.get("global", {}).get("checkpoint_dir"),
            compute_explanation=compute_explanation,
            skip=[s for s in skip if s in ("network", "attributes")],
        )

        if "export" not in skip:
            _log(" === exporting ===", 1)
            exp = settings["export"]
            _require_keys(exp, ["type"], "error: export section is missing:")
            on_existing = _on_existing(exp)
            # reference filename placeholders (export_step.py): <case_id>, <srid>
            fn = (
                exp.get("filename", f"netascore_{case_id}.gpkg")
                .replace("<case_id>", case_id)
                .replace("<srid>", str(target_srid))
            )
            fn = fn if os.path.isabs(fn) else os.path.join(base_path, fn)
            if exp["type"] == "geopackage":
                from netascore_spark.sources.geopackage import write_geopackage

                if os.path.exists(fn):
                    if on_existing == "abort":
                        _log(f"export target {fn} exists; aborting", 1)
                        sys.exit(1)
                    if on_existing == "skip":
                        _log(f"export target {fn} exists; skipping export", 1)
                        out["export_path"] = fn
                        return out
                    os.remove(fn)
                # -lco FID=edge_id|node_id parity: the id IS the feature id
                write_geopackage(
                    out["export_edge"], fn, "edge", geometry_type="LINESTRING",
                    srid=target_srid, fid_col="edge_id",
                )
                n_nodes = write_geopackage(
                    out["export_node"].withColumn(
                        "geom",
                        # nodes carry x/y; encode point WKB for the gpkg
                        _point_wkb_udf()("x", "y"),
                    ),
                    fn, "node", geometry_type="POINT", srid=target_srid,
                    fid_col="node_id",
                )
                _log(f"wrote {fn} ({n_nodes} nodes)", 2)
            elif exp["type"] == "parquet":
                mode = {"skip": "ignore", "delete": "overwrite", "abort": "error"}[
                    on_existing
                ]
                out["export_edge"].write.mode(mode).parquet(
                    os.path.join(fn, "edge.parquet")
                )
                out["export_node"].write.mode(mode).parquet(
                    os.path.join(fn, "node.parquet")
                )
            else:
                _log(f"export type '{exp['type']}' not supported", 1)
                sys.exit(1)
            out["export_path"] = fn
        return out
    finally:
        if own_session:
            spark.stop()


def _point_wkb_udf():
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from netascore_spark.geometry import wkb as W

    @F.pandas_udf(T.BinaryType())
    def _pt(x: pd.Series, y: pd.Series) -> pd.Series:
        return pd.Series(
            [
                None if a is None else W.encode(W.point(float(a), float(b)))
                for a, b in zip(x, y)
            ]
        )

    return _pt


def main(argv: list[str] | None = None) -> int:
    import argparse

    import yaml

    global verbose_level

    parser = argparse.ArgumentParser(
        prog="netascore_spark",
        description="NetAScore-on-Spark: settings-driven pipeline runner",
    )
    sub = parser.add_subparsers(dest="command", required=True)
    runp = sub.add_parser("run", help="run the pipeline from a settings.yml")
    runp.add_argument("settings_file", type=argparse.FileType("r", encoding="utf-8"))
    runp.add_argument("--skip", nargs="+", choices=STEPS, default=[])
    runp.add_argument("--loglevel", nargs=1, choices=["1", "2", "3", "4"])
    args = parser.parse_args(argv)

    if args.loglevel:
        verbose_level = int(args.loglevel[0])
    with args.settings_file as fh:
        base_path = os.path.dirname(os.path.abspath(fh.name))
        settings = yaml.safe_load(fh)
    run_settings(settings, base_path=base_path, skip=args.skip)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
