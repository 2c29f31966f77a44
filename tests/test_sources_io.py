"""GeoTIFF ingestion (S6), GeoPackage import/export (S5/S9), settings CLI."""

import os
import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from netascore_spark.sources import fixtures
from netascore_spark.sources.geopackage import read_geopackage, write_geopackage
from netascore_spark.sources.geotiff import geotiff_to_dem_grid, write_geotiff


def test_geotiff_roundtrip_matches_dem_grid(spark, tmp_path):
    """A synthetic GeoTIFF carrying the fixture DEM's values must convert to
    the exact same (cell_x, cell_y, elevation) grid table, and produce the
    same node elevations (the node_elevation golden path)."""
    cell = 10.0
    cxs = np.arange(-40, 120)
    cys = np.arange(-40, 120)
    gx, gy = np.meshgrid(cxs, cys)
    x_m, y_m = gx * cell, gy * cell
    elev = 400.0 + 0.02 * x_m
    elev = elev + 180.0 * np.exp(
        -(((x_m - 500) ** 2 + (y_m - 500) ** 2) / (2 * 120.0**2))
    )
    # raster rows run north->south: row 0 = top = max cell_y
    arr = elev[::-1, :]
    tif = str(tmp_path / "dem.tif")
    # top-left corner of pixel (0,0): x = cxs[0]*cell, y = (cys[-1]+1)*cell
    write_geotiff(tif, arr, (cell, cell), (cxs[0] * cell, (cys[-1] + 1) * cell))

    from_tif = geotiff_to_dem_grid(spark, tif, cell=cell)
    reference = fixtures.dem_grid(spark, cell=cell)
    assert from_tif.count() == reference.count()
    diff = (
        from_tif.withColumnRenamed("elevation", "e1")
        .join(reference.withColumnRenamed("elevation", "e2"), ["cell_x", "cell_y"])
        .filter(F.abs(F.col("e1") - F.col("e2")) > 1e-9)
        .count()
    )
    assert diff == 0

    # node_elevation parity on the real network
    from netascore_spark.pipeline import attributes as ATTR
    from netascore_spark.pipeline import network as N

    edges, nodes = N.build_network(fixtures.osm_lines(spark, scale=1))
    a = ATTR.node_elevation(nodes, from_tif).withColumnRenamed("elevation", "e1")
    b = ATTR.node_elevation(nodes, reference).withColumnRenamed("elevation", "e2")
    mism = a.join(b, "node_id").filter(
        ~F.col("e1").eqNullSafe(F.col("e2"))
    ).count()
    assert mism == 0


def test_geotiff_nodata_and_bounds(spark, tmp_path):
    arr = np.full((8, 8), -9999.0)
    arr[0, 0] = 123.0  # top-left pixel = cell (0, 7)
    tif = str(tmp_path / "small.tif")
    write_geotiff(tif, arr, (10.0, 10.0), (0.0, 80.0))
    out = geotiff_to_dem_grid(spark, tif, cell=10.0, nodata=-9999.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["cell_x"], r["cell_y"], r["elevation"]) == (0, 7, 123.0)


def test_geopackage_write_read_roundtrip(spark, tmp_path):
    osm = fixtures.osm_lines(spark, scale=1)
    from netascore_spark.pipeline import network as N

    edges, _ = N.build_network(osm)
    sel = edges.select("edge_id", "osm_id", "length", "geom")
    path = str(tmp_path / "net.gpkg")
    n = write_geopackage(sel, path, "edge", geometry_type="LINESTRING", srid=32633)
    assert n == sel.count()

    # file IS a valid GeoPackage: application_id + metadata rows present
    con = sqlite3.connect(path)
    (app_id,) = con.execute("PRAGMA application_id").fetchone()
    assert app_id == 0x47504B47
    assert con.execute(
        "SELECT data_type, srs_id FROM gpkg_contents WHERE table_name='edge'"
    ).fetchone() == ("features", 32633)
    assert con.execute(
        "SELECT geometry_type_name FROM gpkg_geometry_columns WHERE table_name='edge'"
    ).fetchone() == ("LINESTRING",)
    con.close()

    back = read_geopackage(spark, path, "edge")
    assert back.count() == n
    # geometry WKB survives byte-identically through the GP blob header
    orig = {r["edge_id"]: bytes(r["geom"]) for r in sel.collect()}
    got = {r["edge_id"]: bytes(r["geom"]) for r in back.collect()}
    assert orig == got


def test_cli_settings_run(spark, tmp_path):
    """python -m netascore_spark run settings.yml equivalent, end-to-end."""
    import yaml

    from netascore_spark.cli import run_settings

    settings = {
        "version": 1.2,
        "global": {"target_srid": 32633, "case_id": "t_cli"},
        "import": {"type": "fixture", "on_existing": "delete", "scale": 1},
        "index": {"compute_explanation": False},
        "profiles": [
            {
                "profile_name": "bike",
                "filename": os.path.join(os.getcwd(), "profiles/profile_bike.yml"),
                "filter_access_bike": True,
            }
        ],
        "export": {
            "type": "geopackage",
            "on_existing": "delete",
            "filename": str(tmp_path / "netascore_<case_id>.gpkg"),
        },
    }
    # also exercise the YAML file path of the arg parser
    yml = tmp_path / "settings.yml"
    yml.write_text(yaml.safe_dump(settings))

    out = run_settings(settings, base_path=str(tmp_path), spark=spark)
    path = str(tmp_path / "netascore_t_cli.gpkg")
    assert out["export_path"] == path
    assert os.path.exists(path)

    edge = read_geopackage(spark, path, "edge")
    node = read_geopackage(spark, path, "node")
    assert edge.count() == out["network_edge"].count()
    assert node.count() == out["network_node"].count()
    assert "index_bike_ft" in edge.columns

    # on_existing=skip leaves the file alone
    settings["export"]["on_existing"] = "skip"
    out2 = run_settings(settings, base_path=str(tmp_path), spark=spark)
    assert out2["export_path"] == path

    # missing required section aborts with SystemExit (helper.py:120-124)
    bad = dict(settings)
    bad.pop("export")
    with pytest.raises(SystemExit):
        run_settings(bad, base_path=str(tmp_path), spark=spark)
