"""Canary-gated scaling legs (north rule: N -> 4N >= 0.8).

The sandbox host oscillates between nominal and ~14x-degraded CPU on a
~tens-of-minutes timescale (measured 1.4 s vs 19.8-21.7 s for the same
single-core python loop within one hour), and degraded windows can START
and END *inside* a bench leg — end-bracket canaries accepted a leg whose
python-heavy middle stages ran 2-6x slow while its JVM-only tail stages
matched nominal runs exactly.  So the canary runs CONTINUOUSLY in a
sampler thread during the leg (one core out of 32 for ~1.5 s every 20 s —
noise, not load) and the leg is accepted only when the WORST sample seen
while it ran is nominal.

Usage: python tools/scaling_gated.py [legs...]   e.g. "2 8 32"
Writes BENCH_local{N}.json per accepted leg (same shape as tools/scaling.py).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NOMINAL_S = 2.6          # accept canary below this (nominal ~1.4-1.6 s)
SAMPLE_EVERY = 20.0      # seconds between in-flight canary samples
MAX_TRIES = 8
WAIT_DEGRADED = 240      # seconds to sit out a degraded window


def canary() -> float:
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-c", "[pow(3,7,11) for _ in range(10**7)]"],
        check=True,
    )
    return time.time() - t0


class Sampler:
    def __init__(self) -> None:
        self.samples: list[float] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            self.samples.append(canary())
            self._stop.wait(SAMPLE_EVERY)

    def __enter__(self) -> "Sampler":
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._t.join()


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
        with Sampler() as s:
            r = run_bench(cpus, sf_dir)
        wall = time.time() - t0
        worst = max(s.samples) if s.samples else float("nan")
        print(f"[leg {cpus}] run {r['value']}s (wall {wall:.0f}s) "
              f"canary worst {worst:.2f}s over {len(s.samples)} samples",
              file=sys.stderr, flush=True)
        if worst <= NOMINAL_S:
            r["canary_worst_s"] = round(worst, 2)
            r["canary_samples"] = len(s.samples)
            with open(os.path.join(REPO, f"BENCH_local{cpus}.json"), "w") as fh:
                json.dump(r, fh, indent=1)
            return r
        print(f"[leg {cpus}] in-flight degradation — leg discarded",
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
