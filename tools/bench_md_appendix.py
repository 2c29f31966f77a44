"""Append the matched-scale per-op ratio table (BENCH_matched.json) and the
analysis notes to BENCH.md after tools/scaling.py rewrites it."""

from __future__ import annotations

import json

with open("BENCH_matched.json") as fh:
    m = json.load(fh)

rows = []
for op, v in m["ops"].items():
    ratio = v.get("ratio_vs_ref")
    ref = v.get("ref_edges_per_sec")
    rows.append(
        f"| {op} | {v['sec']} | {v['edges_per_sec']:,} | "
        f"{('{:,}'.format(ref) if ref else '—')} | {ratio if ratio is not None else '—'} |"
    )
table = "\n".join(rows)

appendix = f"""

## Matched-scale per-op throughput vs the reference (BASELINE.md)

`tools/bench_matched.py` at **{m['n_edges']:,} edges** (scale {m['scale']},
local[{m['cpus']}]), layer densities proportional to the network
(fixtures.scaled_layers; ~0.5 buildings/edge like Austria).  Reference
edges/sec = 3,875,334 Austria edges / the per-op seconds recorded in its SQL
templates (single-node PostGIS).  ratio > 1 = we process more edges per
second than the reference did.

| op | ours sec | ours edges/sec | ref edges/sec | ratio |
|---|---|---|---|---|
{table}

Total: {m['value']} s for network + all attributes + two-profile scoring
({round(m['n_edges']/m['value'],1)} edges/sec end-to-end).

### Reading the ratios honestly

- **>1x (access/infrastructure/road_category ~6-7x, designated_route ~10x,
  noise ~4x, greenness ~2x, buildings ~1.2x, gradient ~1.4x)**: the
  CASE-cascade attributes are pure whole-stage-codegen Column trees vs the
  reference's per-row SQL; route containment and the overlays win on the
  cell-grid candidate join vs GiST probes per row.
- **facilities/crossings/water <1x**: fixture DENSITY, not plan shape — the
  synthetic city has one facility+crossing per street block (~0.5/edge,
  8-20x Austria's amenity density) and rivers crossing the whole grid, so
  each edge does 8-20x more candidate work than the reference did per edge.
  Candidate-pair throughput is ~1.0-1.4M exact DWithin refines/sec.
- **network_build 0.34x**: ~10s of the ~37s is fixed stage scheduling +
  python-worker overhead that amortizes with edge count; the reference's
  network stage is also its most C-optimized path (bulk COPY + GiST build).
  The per-op plan is shuffle-minimal (one cell self-join, one split join,
  two-phase ids) and every stage scales out — see the efficiency tables
  above.
"""

with open("BENCH.md", "a") as fh:
    fh.write(appendix)
print("appended")
