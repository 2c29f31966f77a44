"""Per-QUERY canary-gated scaling legs (north rule: N -> 4N >= 0.8).

tools/scaling_gated.py gates a whole bench leg on its worst in-flight
canary sample — honest, but the sandbox host's degraded windows recur on
roughly the same tens-of-minutes cadence as a 2-core leg's wall time, so
whole-leg gating can retry forever without ever landing a fully-clean leg.

This variant keeps the same continuous canary sampler but blames each
degraded sample only on the QUERIES whose measured window it overlapped
(bench.py reports per-query absolute [start, end] as "windows").  Clean
per-query times accumulate across attempts; a leg is done when every
query has at least one clean measurement.  The merged leg takes the best
clean time per query — the same best-of-N-identical-runs convention the
round-3/4 legs already used, applied per query instead of per leg.

A degraded sample taints the whole interval back to the previous sample's
end (degradation between two samples cannot be ruled out), so a query is
accepted only if every instant of its window is covered by nominal-canary
evidence.

Usage: python tools/scaling_gated2.py [legs...]   e.g. "2 8 32"
Writes BENCH_local{N}.json per completed leg (same shape as bench.py
output, plus gating provenance).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# TRUE-nominal gate: the host has a mild degradation state (canary ~1.9-2.2
# s) that the old 2.6 s gate accepted but which runs the whole box ~1.4x
# slow (measured: every untouched small query 1.4-1.5x its clean-window
# time in a leg whose worst canary was 1.90 s).  Legs 2/8 leave >=24 cores
# idle, so the canary runs uncontended and 1.75 s separates true nominal
# (1.4-1.6 s) from the mild state.  At 32 cores the canary CONTENDS with
# the bench itself, so the strict gate would reject everything — keep the
# old threshold there (leg 32 is supplementary; the north-rule ratio is
# 2->8).
NOMINAL_S = 1.75         # legs below 32 cores
NOMINAL_S_CONTENDED = 2.6
SAMPLE_EVERY = 15.0      # seconds between in-flight canary samples
MAX_TRIES = 10
WAIT_DEGRADED = 180      # seconds to sit out a degraded window before a try


def canary() -> float:
    t0 = time.time()
    subprocess.run(
        [sys.executable, "-c", "[pow(3,7,11) for _ in range(10**7)]"],
        check=True,
    )
    return time.time() - t0


class Sampler:
    """Continuous canary; records (t_start, t_end, duration) per sample."""

    def __init__(self, nominal_s: float = NOMINAL_S) -> None:
        self.nominal_s = nominal_s
        self.samples: list[tuple[float, float, float]] = []
        self._stop = threading.Event()
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            t0 = time.time()
            d = canary()
            self.samples.append((t0, t0 + d, d))
            self._stop.wait(SAMPLE_EVERY)

    def __enter__(self) -> "Sampler":
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._t.join()

    def degraded_intervals(self) -> list[tuple[float, float]]:
        """[t0, t1] spans where degradation cannot be ruled out: every
        degraded sample taints back to the previous sample's end."""
        out = []
        prev_end = None
        for t0, t1, d in self.samples:
            if d > self.nominal_s:
                lo = prev_end if prev_end is not None else t0 - SAMPLE_EVERY
                out.append((lo, t1))
            prev_end = t1
        return out


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_PAGES=os.environ.get("SPARK_GRAFT_PAGES", "9600000"),
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
    nominal_s = NOMINAL_S if cpus < 32 else NOMINAL_S_CONTENDED
    best: dict[str, float] = {}          # query -> best CLEAN seconds
    best_any: dict[str, float] = {}      # query -> best seconds, any state
    meta: dict = {}
    attempts_used = 0
    worst_clean_canary = 0.0
    for attempt in range(1, MAX_TRIES + 1):
        c0 = canary()
        if c0 > nominal_s:
            print(f"[leg {cpus}] canary {c0:.2f}s degraded; waiting "
                  f"{WAIT_DEGRADED}s (attempt {attempt})",
                  file=sys.stderr, flush=True)
            time.sleep(WAIT_DEGRADED)
            continue
        attempts_used += 1
        with Sampler(nominal_s) as s:
            r = run_bench(cpus, sf_dir)
        bad = s.degraded_intervals()
        clean_samples = [d for *_, d in s.samples if d <= nominal_s]
        if clean_samples:
            worst_clean_canary = max(worst_clean_canary, max(clean_samples))
        meta = {k: v for k, v in r.items() if k not in ("queries", "windows")}
        n_clean = 0
        for q, (t0, t1) in r.get("windows", {}).items():
            if q not in best_any or r["queries"][q] < best_any[q]:
                best_any[q] = r["queries"][q]
            tainted = any(lo < t1 and t0 < hi for lo, hi in bad)
            if not tainted:
                n_clean += 1
                if q not in best or r["queries"][q] < best[q]:
                    best[q] = r["queries"][q]
        missing = set(r["queries"]) - set(best)
        print(f"[leg {cpus}] attempt {attempt}: {n_clean}/{len(r['queries'])} "
              f"queries clean this run ({len(bad)} degraded spans); "
              f"still missing: {sorted(missing) or 'none'}",
              file=sys.stderr, flush=True)
        if not missing:
            queries = {q: best[q] for q in r["queries"]}
            total = round(sum(queries.values()), 3)
            out = dict(meta)
            out["value"] = total
            out["queries"] = queries
            out["pages_per_sec"] = round(
                out["n_pages"] / queries["pages_tile_join"], 2
            )
            out["edges_per_sec"] = round(
                out["n_edges"]
                / (queries["network_build"] + queries["attributes_score"]),
                2,
            )
            out["gate"] = "per-query continuous canary"
            out["gate_nominal_s"] = nominal_s
            out["gate_attempts"] = attempts_used
            out["canary_worst_clean_s"] = round(worst_clean_canary, 2)
            with open(os.path.join(REPO, f"BENCH_local{cpus}.json"), "w") as fh:
                json.dump(out, fh, indent=1)
            return out
    # exhausted: emit the leg anyway, filling still-missing queries with
    # the MIN across all attempts — degradation only inflates, so that min
    # is an honest UPPER BOUND on the clean time; the output names exactly
    # which queries are bounds, not clean measurements.
    if meta and best_any:
        queries = {q: best.get(q, best_any[q]) for q in best_any}
        ub = sorted(set(best_any) - set(best))
        total = round(sum(queries.values()), 3)
        out = dict(meta)
        out["value"] = total
        out["queries"] = queries
        out["pages_per_sec"] = round(out["n_pages"] / queries["pages_tile_join"], 2)
        out["edges_per_sec"] = round(
            out["n_edges"]
            / (queries["network_build"] + queries["attributes_score"]), 2
        )
        out["gate"] = "per-query continuous canary"
        out["gate_nominal_s"] = nominal_s
        out["gate_attempts"] = attempts_used
        out["canary_worst_clean_s"] = round(worst_clean_canary, 2)
        out["upper_bound_queries"] = ub
        print(f"[leg {cpus}] EXHAUSTED; emitting with upper-bound queries: {ub}",
              file=sys.stderr, flush=True)
        with open(os.path.join(REPO, f"BENCH_local{cpus}.json"), "w") as fh:
            json.dump(out, fh, indent=1)
        return out
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
