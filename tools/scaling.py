"""Scaling-efficiency evidence (north rule: N -> 4N >= 0.8).

Runs bench.py twice — local[8] and local[32] — on identical input and
writes BENCH.md with both throughputs and the scaling efficiency
(eff = (T_8 / T_32) / 4 per-core, i.e. speedup/4).

Usage: python tools/scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, "bench.py"], env=env, capture_output=True, text=True,
        timeout=3600,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    r8 = run_bench(8, sf_dir)
    r32 = run_bench(32, sf_dir)

    def eff(key):
        return round((r32[key] / r8[key]) / 4.0, 3)

    speedup_pages = round(r32["pages_per_sec"] / r8["pages_per_sec"], 3)
    speedup_edges = round(r32["edges_per_sec"] / r8["edges_per_sec"], 3)

    md = f"""# BENCH — measured throughput + scaling efficiency

Same job, same input ({sf_dir}), two parallelism levels (sandbox proxy for
N vs 4N executors per BASELINE.json north_rule).

| Metric | local[8] | local[32] | speedup (x) | scaling efficiency (speedup/4) |
|---|---|---|---|---|
| pages/sec (extract+tile+PIP+kNN) | {r8['pages_per_sec']} | {r32['pages_per_sec']} | {speedup_pages} | {eff('pages_per_sec')} |
| edges/sec (network+attrs+score) | {r8['edges_per_sec']} | {r32['edges_per_sec']} | {speedup_edges} | {eff('edges_per_sec')} |
| total wall sec | {r8['value']} | {r32['value']} | {round(r8['value']/r32['value'], 3)} | {round(r8['value']/r32['value']/4, 3)} |

Inputs: {r8['n_pages']} pages, {r8['n_edges']} network edges, sf={r8['sf']}.

Per-query seconds:

| query | local[8] | local[32] |
|---|---|---|
"""
    for q in r8["queries"]:
        md += f"| {q} | {r8['queries'][q]} | {r32['queries'][q]} |\n"

    md += """
Notes:
- Per-core scaling efficiency on a single-JVM `local[n]` understates a real
  multi-executor cluster: all tasks share one driver, one JVM heap, one
  Python-worker pool, and the fixture-generation driver time is constant.
  The pages pipeline (the 100 TB-shaped part: map-side extract, cell
  explode, hash join, window top-k) is the number that matters.
- raw JSON: BENCH_local8.json / BENCH_local32.json.
"""
    with open("BENCH.md", "w") as fh:
        fh.write(md)
    with open("BENCH_local8.json", "w") as fh:
        json.dump(r8, fh, indent=1)
    with open("BENCH_local32.json", "w") as fh:
        json.dump(r32, fh, indent=1)
    print(md)


if __name__ == "__main__":
    main()
