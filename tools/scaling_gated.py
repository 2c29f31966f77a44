"""Canary-gated scaling legs (north rule: N -> 4N >= 0.8).

The sandbox host oscillates between nominal and ~14x-degraded CPU on a
~tens-of-minutes timescale (measured 1.4 s vs 19.8 s for the same
single-core python loop within one hour).  Any leg that overlaps a
degraded window is useless for the N->4N ratio, so each leg is bracketed
by a canary: a fixed single-core python loop.  A leg only counts when the
canary is nominal BOTH before and after it; otherwise it is retried
(waiting out the degraded window).

Usage: python tools/scaling_gated.py [legs...]   e.g. "2 8 32"
Writes BENCH_local{N}.json per accepted leg (same shape as tools/scaling.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOMINAL_S = 2.6          # accept canary below this (nominal ~1.4-1.6 s)
MAX_TRIES = 6
WAIT_DEGRADED = 300      # seconds to sit out a degraded window


def canary() -> float:
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-c", "[pow(3,7,11) for _ in range(10**7)]"],
        check=True,
    )
    return time.time() - t0


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_PAGES=os.environ.get("SPARK_GRAFT_PAGES", "2400000"),
        SPARK_GRAFT_OSM_SCALE=os.environ.get("SPARK_GRAFT_OSM_SCALE", "56"),
        SPARK_GRAFT_DRIVER_MEM=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=7200, cwd=REPO,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def leg(cpus: int, sf_dir: str) -> dict | None:
    for attempt in range(1, MAX_TRIES + 1):
        c0 = canary()
        if c0 > NOMINAL_S:
            print(f"[leg {cpus}] canary {c0:.2f}s degraded; waiting "
                  f"{WAIT_DEGRADED}s (attempt {attempt})", file=sys.stderr, flush=True)
            time.sleep(WAIT_DEGRADED)
            continue
        t0 = time.time()
        r = run_bench(cpus, sf_dir)
        wall = time.time() - t0
        c1 = canary()
        print(f"[leg {cpus}] run {r['value']}s (wall {wall:.0f}s) "
              f"canary {c0:.2f}/{c1:.2f}s", file=sys.stderr, flush=True)
        if c1 <= NOMINAL_S:
            r["canary_before_s"] = round(c0, 2)
            r["canary_after_s"] = round(c1, 2)
            with open(os.path.join(REPO, f"BENCH_local{cpus}.json"), "w") as fh:
                json.dump(r, fh, indent=1)
            return r
        print(f"[leg {cpus}] post-canary degraded ({c1:.2f}s) — leg discarded",
              file=sys.stderr, flush=True)
    print(f"[leg {cpus}] gave up after {MAX_TRIES} attempts", file=sys.stderr)
    return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    legs = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    results = {}
    for c in legs:
        r = leg(c, sf_dir)
        if r:
            results[c] = r
    if 2 in results and 8 in results:
        for metric in ("pages_per_sec", "edges_per_sec"):
            lo, hi = results[2][metric], results[8][metric]
            eff = (hi / lo) / 4.0
            print(f"2->8 {metric}: {lo} -> {hi}  speedup {hi/lo:.2f} "
                  f"efficiency {eff:.3f}")
        t_eff = (results[2]["value"] / results[8]["value"]) / 4.0
        print(f"2->8 composed wall: {results[2]['value']} -> "
              f"{results[8]['value']}  efficiency {t_eff:.3f}")


if __name__ == "__main__":
    main()
