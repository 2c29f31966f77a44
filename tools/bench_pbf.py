"""Measure the .osm.pbf blob-decode throughput (MB/s) on a generated
>=100 MB file, so the single-reader ceiling of the sequential driver
stream (sources/osmpbf.py:_iter_blobs) is a documented number.

The generator reuses the wire-format writer from tests/test_osmpbf.py
(valid blob framing, DenseNodes delta+zigzag, stringtable, ways), scaled
to a synthetic street grid.  Two numbers are reported:

- decode_mb_s: raw element iteration (iter_pbf_elements) — the pure
  sequential decode ceiling;
- e2e_sec: read_osm_pbf end-to-end (decode -> distributed assembly ->
  osm_line/point/polygon counts), which overlaps the Spark assembly but
  still pays the serial decode on the driver.

Usage: python tools/bench_pbf.py [target_mb]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def _build(path: str, n: int) -> dict:
    from test_osmpbf import _write_pbf

    # hash-scattered coordinates: consecutive deltas are large random
    # varints zlib can't crush, so bytes/node resembles a dense mixed
    # extract rather than a perfectly smooth (over-compressible) grid
    nodes = []
    ways = []
    side = int(n ** 0.5) or 1
    for nid in range(1, n + 1):
        lat = ((nid * 2654435761) % (170 * 10**7)) * 1e-7 - 85.0
        lon = ((nid * 2246822519) % (350 * 10**7)) * 1e-7 - 175.0
        nodes.append((nid, lat, lon, {}))
    for w in range(n // side):
        refs = list(range(1 + w * side, 1 + min((w + 1) * side, n)))
        if len(refs) >= 2:
            ways.append((100000000 + w, refs,
                         {"highway": "residential", "name": f"w{w}"}))
    _write_pbf(path, nodes, ways, granularity=100)
    return {"nodes": len(nodes), "ways": len(ways)}


def generate(path: str, target_mb: int) -> dict:
    # probe 50k nodes to calibrate compressed bytes/node, then scale
    probe = path + ".probe"
    _build(probe, 50_000)
    bpn = os.path.getsize(probe) / 50_000
    os.remove(probe)
    n = int(target_mb * 1024 * 1024 / bpn)
    return _build(path, n)


def main() -> None:
    target_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    path = os.path.join(tempfile.gettempdir(), f"bench_{target_mb}mb.osm.pbf")
    if not os.path.exists(path):
        t0 = time.time()
        meta = generate(path, target_mb)
        gen_s = round(time.time() - t0, 1)
    else:
        meta, gen_s = {}, 0.0
    size_mb = os.path.getsize(path) / 1024 / 1024

    from netascore_spark.sources.osmpbf import iter_pbf_elements

    t0 = time.time()
    n_elems = sum(1 for _ in iter_pbf_elements(path))
    decode_s = time.time() - t0

    from netascore_spark.session import build_session
    from netascore_spark.sources.osmpbf import read_osm_pbf

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "8")
    spark = build_session(app_name="bench-pbf", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    tabs = read_osm_pbf(spark, path, projection_spec=None)
    counts = {k: df.count() for k, df in tabs.items()}
    e2e_s = time.time() - t0
    spark.stop()

    print(json.dumps({
        "file_mb": round(size_mb, 1),
        "gen_sec": gen_s,
        **meta,
        "n_elements": n_elems,
        "decode_sec": round(decode_s, 1),
        "decode_mb_s": round(size_mb / decode_s, 1),
        "e2e_sec": round(e2e_s, 1),
        "e2e_mb_s": round(size_mb / e2e_s, 1),
        "counts": counts,
    }))


if __name__ == "__main__":
    main()
