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

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def _mix64(x: "np.ndarray") -> "np.ndarray":
    """splitmix64 finalizer, vectorized (public-domain constant set)."""
    x = np.asarray(x, dtype=np.uint64)
    with np.errstate(over="ignore"):
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def _build(path: str, n: int) -> dict:
    """Stream a multi-blob PBF: node blobs then way blobs, ~400k
    primitives per OSMData blob (real extracts cap blobs at 16-32 MB raw;
    the tests' single-blob _write_pbf is O(ways^2) on bytes-concat and
    O(file) in memory — unusable at >=100 MB)."""
    import struct
    import zlib

    from test_osmpbf import _delta_s, _ld, _packed, _uv, _vi

    def blob(fh, btype: str, payload: bytes) -> None:
        z = zlib.compress(payload)
        b = _vi(2, len(payload)) + _ld(3, z)
        header = _ld(1, btype.encode()) + _vi(3, len(b))
        fh.write(struct.pack(">I", len(header)) + header + b)

    def block(strings: list[bytes], group: bytes) -> bytes:
        table = _ld(1, b"".join(_ld(1, x) for x in strings))
        return table + _ld(2, group) + _vi(17, 100)  # granularity=100

    side = int(n ** 0.5) or 1
    n_ways = 0
    chunk = 400_000
    with open(path, "wb") as fh:
        blob(fh, "OSMHeader",
             _ld(4, b"OsmSchema-V0.6") + _ld(4, b"DenseNodes"))
        # splitmix64-scattered coordinates: a pure multiplicative hash of
        # CONSECUTIVE ids has a near-constant delta which zlib crushes to
        # ~0.13 bytes/node; full avalanche makes the delta stream
        # incompressible, so bytes/node resembles a dense mixed extract
        for lo in range(1, n + 1, chunk):
            ids = np.arange(lo, min(lo + chunk, n + 1), dtype=np.uint64)
            hlat = _mix64(ids)
            hlon = _mix64(ids ^ np.uint64(0x9E3779B97F4A7C15))
            # granularity=100: stored unit is 100 nanodeg = degrees * 1e7
            lats = [int(v) for v in
                    (hlat % np.uint64(1_700_000_000)).astype(np.int64)
                    - 850_000_000]
            lons = [int(v) for v in
                    (hlon % np.uint64(3_500_000_000)).astype(np.int64)
                    - 1_750_000_000]
            ids = [int(v) for v in ids]
            dense = (_packed(1, _delta_s(ids))
                     + _packed(8, _delta_s(lats))
                     + _packed(9, _delta_s(lons))
                     + _packed(10, [_uv(0)] * len(ids)))
            blob(fh, "OSMData", block([b""], _ld(2, dense)))
        for wlo in range(0, n // side, 4000):
            strings = [b"", b"highway", b"residential", b"name"]
            sidx = {b: i for i, b in enumerate(strings)}
            parts = []
            for w in range(wlo, min(wlo + 4000, n // side)):
                refs = range(1 + w * side, 1 + min((w + 1) * side, n))
                if len(refs) < 2:
                    continue
                name = f"w{w}".encode()
                if name not in sidx:
                    sidx[name] = len(strings)
                    strings.append(name)
                way = (_vi(1, 100000000 + w)
                       + _packed(2, [_uv(1), _uv(3)])
                       + _packed(3, [_uv(2), _uv(sidx[name])])
                       + _packed(8, _delta_s(list(refs))))
                parts.append(_ld(3, way))
                n_ways += 1
            if parts:
                blob(fh, "OSMData", block(strings, b"".join(parts)))
    return {"nodes": n, "ways": n_ways}


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
    tabs = read_osm_pbf(spark, path, projection_spec=None, distributed=False)
    counts = {k: df.count() for k, df in tabs.items()}
    e2e_s = time.time() - t0

    from netascore_spark.pipeline import cache

    t0 = time.time()
    tabs_d = read_osm_pbf(spark, path, projection_spec=None, distributed=True)
    counts_d = {k: df.count() for k, df in tabs_d.items()}
    dist_s = time.time() - t0
    cache.release_all()
    spark.stop()
    assert counts == counts_d, (counts, counts_d)

    print(json.dumps({
        "file_mb": round(size_mb, 1),
        "gen_sec": gen_s,
        **meta,
        "n_elements": n_elems,
        "decode_sec": round(decode_s, 1),
        "decode_mb_s": round(size_mb / decode_s, 1),
        "e2e_sec": round(e2e_s, 1),
        "e2e_mb_s": round(size_mb / e2e_s, 1),
        "e2e_dist_sec": round(dist_s, 1),
        "e2e_dist_mb_s": round(size_mb / dist_s, 1),
        "cores": int(cpus),
        "counts": counts,
    }))


if __name__ == "__main__":
    main()
