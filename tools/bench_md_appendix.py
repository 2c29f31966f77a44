"""Append the matched-scale per-op ratio tables to BENCH.md after
tools/scaling.py rewrites it: the ~100k-edge full-op table
(BENCH_matched.json) and the >=2M-edge amortization run
(BENCH_matched2m.json), including the Austria-parity density reruns."""

from __future__ import annotations

import json


def table(m: dict) -> str:
    rows = []
    for op, v in m["ops"].items():
        ratio = v.get("ratio_vs_ref")
        ref = v.get("ref_edges_per_sec")
        rows.append(
            f"| {op} | {v['sec']} | {v['edges_per_sec']:,} | "
            f"{('{:,}'.format(ref) if ref else '—')} | {ratio if ratio is not None else '—'} |"
        )
    return "\n".join(rows)


with open("BENCH_matched.json") as fh:
    m = json.load(fh)
with open("BENCH_matched2m.json") as fh:
    m2 = json.load(fh)

appendix = f"""

## Matched-scale per-op throughput vs the reference (BASELINE.md)

`tools/bench_matched.py` at **{m['n_edges']:,} edges** (scale {m['scale']},
local[{m['cpus']}]), layer densities proportional to the network
(fixtures.scaled_layers; ~0.5 buildings/edge).  Reference edges/sec =
3,875,334 Austria edges / the per-op seconds recorded in its SQL templates
(single-node PostGIS).  ratio > 1 = we process more edges per second than
the reference did.  The `*_austria_density` rows rerun the three
density-sensitive ops with the fixture thinned to OSM-Austria amenity/river
density (point_density=1/12, water_density=1/4) — the apples-to-apples
comparison.

| op | ours sec | ours edges/sec | ref edges/sec | ratio |
|---|---|---|---|---|
{table(m)}

Total: {m['value']} s for network + all attributes + two-profile scoring
({round(m['n_edges']/m['value'],1)} edges/sec end-to-end).

## Amortization: the same ops at {m2['n_edges']:,} edges

The 100k-edge ratios under-report: at that size fixed stage scheduling +
the O(|edges|) Arrow passes dominate.  The run below (scale {m2['scale']},
{m2['n_edges']:,} edges — within 2x of the reference's full 3.88M-edge
Austria network, two-phase scalable ids active) shows the per-op ratios the
engine actually sustains at the reference's own scale:

| op | ours sec | ours edges/sec | ref edges/sec | ratio |
|---|---|---|---|---|
{table(m2)}

### Reading the ratios honestly

- **network_build {m2['ops']['network_build']['ratio_vs_ref']}x at 2M edges**
  (0.36x at 100k): the round-2 hypothesis — fixed overhead amortizes with
  edge count — is now measured, not claimed.  The ~2x win over the
  reference's most C-optimized path (bulk COPY + GiST) comes from the
  shuffle-minimal plan: one cell self-join, one split join, two-phase ids.
- **facilities/crossings/water at Austria density: 1.4-1.8x** (dense
  synthetic city: 0.8-1.2x).  The round-2 density caveat is settled both
  ways: at the reference's own amenity/river density we beat it; at 8-20x
  that density we run ~0.8x while doing ~10x the candidate work per edge.
  The DWithin hot path is zero-python (native cell join + native
  point-segment refine).
- **CASE-cascade attributes (access/infrastructure/road_category) 6-8x,
  designated_route ~10x, noise ~4x**: whole-stage-codegen Column trees and
  broadcast cell joins vs per-row SQL + GiST probes.
"""

with open("BENCH.md", "a") as fh:
    fh.write(appendix)
print("appended")
