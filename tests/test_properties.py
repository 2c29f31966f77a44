"""Property-based tests (SURVEY §5.2): score bounds, robustness formula,
geometry invariants — hypothesis over the pure-Python kernel, sampled rows
over the Spark compiler."""

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from netascore_spark.geometry import ops, wkb


# --- geometry kernel properties (pure Python, fast) -------------------------

coord = st.floats(min_value=-1e4, max_value=1e4, allow_nan=False)


@given(st.lists(st.tuples(coord, coord), min_size=2, max_size=6))
@settings(max_examples=100, deadline=None)
# switchback apex within split-eps of a cut: the apex vertex is real
# geometry and must survive the cut-point dedup (arc-param, not XY)
@example(pts=[(0.0, 0.0), (0.0, 1.0), (0.0, 1.192092896e-07)])
def test_split_length_invariant(pts):
    line = np.array(pts, dtype=float)
    total = ops.length(line)
    seg_lens = np.sqrt((np.diff(line, axis=0) ** 2).sum(axis=1))
    if total < 1e-3 or (seg_lens < 1e-3).any():
        return  # split eps is 1e-7 in meters; micro-segments are out of domain
    # split at deterministic on-line points
    cuts = []
    for frac in (0.25, 0.5, 0.75):
        target = frac * total
        acc = 0.0
        for i in range(len(line) - 1):
            seg = float(np.hypot(*(line[i + 1] - line[i])))
            if acc + seg >= target and seg > 0:
                t = (target - acc) / seg
                cuts.append(line[i] + t * (line[i + 1] - line[i]))
                break
            acc += seg
    pieces = ops.split_line(line, cuts)
    assert sum(ops.length(p) for p in pieces) == pytest.approx(total, rel=1e-9)


@given(
    st.lists(st.tuples(coord, coord), min_size=2, max_size=5),
    st.lists(st.tuples(coord, coord), min_size=2, max_size=5),
)
@settings(max_examples=100, deadline=None)
def test_intersection_symmetric(a_pts, b_pts):
    a = np.array(a_pts, dtype=float)
    b = np.array(b_pts, dtype=float)
    pa, oa = ops.line_line_intersection(a, b)
    pb, ob = ops.line_line_intersection(b, a)
    assert (len(pa) > 0 or len(oa) > 0) == (len(pb) > 0 or len(ob) > 0)


def test_intersection_symmetric_degenerate_regression():
    # Hypothesis counterexample from round 2: a zero-length segment vs a
    # segment passing 1.19e-7 away.  Before the explicit degenerate-segment
    # cases in _seg_intersection, one argument order returned a point and
    # the other nothing (asymmetric tolerance scale from the "or 1.0"
    # length substitution).
    a = np.array([(0.0, 0.0), (0.0, 0.0)])
    b = np.array([(0.0, 120.0), (1.19e-7, 0.0)])
    pa, oa = ops.line_line_intersection(a, b)
    pb, ob = ops.line_line_intersection(b, a)
    assert (len(pa) > 0 or len(oa) > 0) == (len(pb) > 0 or len(ob) > 0)
    # 1.19e-7 > EPS(1e-9): not an intersection in either order
    assert len(pa) == 0 and len(oa) == 0
    # a truly touching degenerate point IS found in both orders
    c = np.array([(0.0, 120.0), (0.0, -5.0)])
    pc, _ = ops.line_line_intersection(a, c)
    pd, _ = ops.line_line_intersection(c, a)
    assert len(pc) == 1 and len(pd) == 1


@given(
    st.floats(min_value=-100, max_value=100),
    st.floats(min_value=-100, max_value=100),
    st.floats(min_value=0.5, max_value=30),
)
@settings(max_examples=50, deadline=None)
def test_buffer_contains_its_line(cx, cy, r):
    line = np.array([[cx, cy], [cx + 50, cy + 10], [cx + 80, cy - 20]])
    ring = ops.buffer_line(line, r, cap="round", quad_segs=8)
    for p in line:
        assert ops.point_in_ring(p, ring)
    # area bounded below by the single-widest rectangle and above by the
    # bounding box of the buffer
    assert abs(ops.ring_signed_area(ring)) >= 2 * r * max(
        float(np.hypot(*(line[1] - line[0]))),
        float(np.hypot(*(line[2] - line[1]))),
    ) * 0.99


@given(st.integers(min_value=0, max_value=10**6))
@settings(max_examples=50, deadline=None)
def test_grid_cell_roundtrip(i):
    from netascore_spark import grid

    x = (i % 997) * 13.7 - 5000
    y = (i % 499) * 29.3 - 5000
    c = int(grid.cell(x, y))
    ix, iy = grid.cell_xy(c)
    assert ix * grid.DEFAULT_CELL_SIZE <= x < (ix + 1) * grid.DEFAULT_CELL_SIZE
    assert iy * grid.DEFAULT_CELL_SIZE <= y < (iy + 1) * grid.DEFAULT_CELL_SIZE
    disk = grid.grid_disk(c, 2)
    assert len(disk) == 25 and c in disk


# --- scoring properties over random attribute rows (one Spark job) ---------

def test_scores_bounded_and_robustness_formula(spark):
    import random

    from pyspark.sql import Row
    from netascore_spark.plans.profile import Profile, attach_index
    from tests.test_profile_compiler import ATTR_FIELDS, SCHEMA

    rng = random.Random(42)
    cats = {
        "bicycle_infrastructure_ft": ["bicycle_way", "mixed_way", "bicycle_lane", "no", None],
        "pedestrian_infrastructure_ft": ["pedestrian_way", "sidewalk", "no", None],
        "designated_route_ft": ["international", "local", "no", None],
        "road_category": ["primary", "residential", "service", "path", None],
        "pavement": ["asphalt", "gravel", "soft", "cobble", None],
    }
    rows = []
    for i in range(200):
        base = {n: None for n, _ in ATTR_FIELDS}
        base.update(
            edge_id=i,
            access_car_ft=True, access_car_tf=True,
            access_bicycle_ft=True, access_bicycle_tf=True,
            access_pedestrian_ft=True, access_pedestrian_tf=True,
        )
        for col, vals in cats.items():
            base[col] = rng.choice(vals)
        base["bicycle_infrastructure_tf"] = base["bicycle_infrastructure_ft"]
        base["pedestrian_infrastructure_tf"] = base["pedestrian_infrastructure_ft"]
        base["designated_route_tf"] = base["designated_route_ft"]
        base["max_speed_ft"] = rng.choice([0.0, 30.0, 50.0, 100.0, 130.0, None])
        base["max_speed_tf"] = base["max_speed_ft"]
        base["max_speed_greatest"] = base["max_speed_ft"]
        base["gradient_ft"] = rng.choice([float(g) for g in range(-4, 5)] + [None])
        base["gradient_tf"] = None if base["gradient_ft"] is None else -base["gradient_ft"]
        base["number_lanes_ft"] = rng.choice([1.0, 2.0, 4.0, None])
        base["number_lanes_tf"] = base["number_lanes_ft"]
        base["facilities"] = rng.choice([0.0, 1.5, 10.0, None])
        base["crossings"] = rng.choice([0.0, 2.0, None])
        base["buildings"] = rng.choice([0.0, 30.0, 90.0, None])
        base["greenness"] = rng.choice([0.0, 40.0, 80.0, None])
        base["water"] = rng.choice([True, False, None])
        base["noise"] = rng.choice([40.0, 60.0, 75.0, None])
        rows.append(Row(**base))
    df = spark.createDataFrame(rows, schema=SCHEMA)
    bike = Profile.from_yaml("profiles/profile_bike.yml", "bike")
    walk = Profile.from_yaml("profiles/profile_walk.yml", "walk")
    out = attach_index(attach_index(df, bike), walk).collect()
    for r in out:
        for p in ("bike", "walk"):
            for d in ("ft", "tf"):
                v = r[f"index_{p}_{d}"]
                rb = r[f"index_{p}_{d}_robustness"]
                if v is not None:
                    assert 0.0 <= v <= 1.0, (r["edge_id"], p, d, v)
                if rb is not None:
                    assert 0.0 <= rb <= 1.0 + 1e-9


# --- native Column exprs vs the python kernel (term-for-term claims) --------

@given(
    st.lists(
        st.tuples(coord, coord, coord, coord, coord, coord),
        min_size=1, max_size=25,
    )
)
@settings(max_examples=100, deadline=None)
def test_point_segment_dist_expr_matches_kernel(spark, rows):
    """spatial.point_segment_dist_expr is claimed term-for-term identical to
    ops.points_line_dist on a single segment — verify bit-for-bit over
    random points/segments (incl. degenerate zero-length segments)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from netascore_spark.operators import spatial

    pdf = pd.DataFrame(
        rows, columns=["px", "py", "sx1", "sy1", "sx2", "sy2"]
    ).astype("float64")
    got = (
        spark.createDataFrame(pdf)
        .withColumn("d", spatial.point_segment_dist_expr())
        .toPandas()["d"]
        .to_numpy()
    )
    exp = np.array(
        [
            ops.points_line_dist(
                np.array([[r[0], r[1]]]), np.array([[r[2], r[3]], [r[4], r[5]]])
            )[0]
            for r in rows
        ]
    )
    assert (got == exp).all() or np.array_equal(got, exp, equal_nan=True)


@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=8),
    st.lists(st.tuples(coord, coord), min_size=1, max_size=25),
)
@settings(max_examples=60, deadline=None)
def test_pip_expr_matches_kernel(spark, ring_pts, probes):
    """spatial.pip_expr (native ray-cast over ring-edge arrays) must agree
    bit-for-bit with ops.point_in_polygon for simple rings."""
    import pandas as pd
    from pyspark.sql import functions as F
    from netascore_spark.geometry import wkb as _wkb
    from netascore_spark.operators import spatial

    ring = np.array(ring_pts + ring_pts[:1], dtype=float)
    if abs(ops.ring_signed_area(ring)) < 1e-6:
        return  # degenerate sliver: PIP of a zero-area ring is out of domain
    geom = _wkb.encode(("Polygon", [ring]))
    pdf = pd.DataFrame(probes, columns=["px", "py"]).astype("float64")
    pdf["geom"] = [bytearray(geom)] * len(pdf)
    df = spark.createDataFrame(pdf).withColumn(
        "rings", spatial.polygon_rings_udf()(F.col("geom"))
    )
    got = (
        df.withColumn("hit", spatial.pip_expr(F.col("px"), F.col("py"), F.col("rings")))
        .toPandas()["hit"]
        .to_numpy()
    )
    exp = np.array(
        [ops.point_in_polygon(np.array(p, dtype=float), [ring]) for p in probes]
    )
    assert (got == exp).all()


@given(st.lists(st.integers(min_value=0, max_value=(1 << 42) - 1), min_size=1, max_size=300))
@settings(max_examples=60, deadline=None)
def test_hilbert_roundtrip_and_adjacency(keys):
    """hilbert_key/hilbert_cell are inverse bijections, and consecutive keys
    land on edge-adjacent cells (THE Hilbert locality property that makes
    range partitions compact spatial blobs)."""
    from netascore_spark import grid

    d = np.array(keys, dtype=np.int64)
    assert (grid.hilbert_key(grid.hilbert_cell(d)) == d).all()
    start = min(int(d[0]), (1 << 42) - 64)  # stay on-curve: no wraparound
    run = np.arange(start, start + 64, dtype=np.int64)
    ix, iy = grid.cell_xy(grid.hilbert_cell(run))
    man = np.abs(np.diff(ix)) + np.abs(np.diff(iy))
    assert (man == 1).all()


def test_hilbert_expr_matches_numpy(spark):
    """The native Column hilbert_key_expr agrees with the numpy transform."""
    import pandas as pd
    from pyspark.sql import functions as F
    from netascore_spark import grid
    from netascore_spark.operators import spatial

    rng = np.random.RandomState(11)
    cells = grid.cell(
        rng.uniform(-5e5, 5e5, size=500), rng.uniform(-5e5, 5e5, size=500)
    )
    df = spark.createDataFrame(pd.DataFrame({"cell": cells}))
    got = (
        df.withColumn("k", spatial.hilbert_key_expr(F.col("cell")))
        .toPandas()["k"].to_numpy()
    )
    assert (got == grid.hilbert_key(cells)).all()


def test_locate_points_subnormal_segment():
    """Hypothesis 2026-08-17 counterexample: a segment of SUBNORMAL length
    squares to exactly 0.0 (underflow), so the param division was 0/0=nan in
    both scalar and vectorized paths.  Both must guard on the squared
    divisor and agree on a finite param."""
    coords = np.array([(0.0, 0.0), (0.0, 2.225073858507203e-309), (0.0, 1.0)])
    p = np.array([0.0, 0.0])
    s = ops.locate_point(coords, p)
    vec = ops.locate_points(coords, np.array([p]))
    assert s is not None and np.isfinite(s)
    assert float(vec[0]) == float(s)


@given(
    st.lists(st.tuples(coord, coord), min_size=2, max_size=8),
    st.lists(st.tuples(coord, coord), min_size=1, max_size=24),
    st.randoms(use_true_random=False),
)
@settings(max_examples=100, deadline=None)
def test_locate_points_matches_scalar(pts, probes, rnd):
    """locate_points (vectorized, used by split_line above 4 cuts) must be
    BIT-identical to the scalar locate_point for every probe — on-line
    probes included (mix in exact interpolations along the line)."""
    coords = np.array(pts, dtype=float)
    if ops.length(coords) == 0.0:
        return
    probe_arr = [np.array(p, dtype=float) for p in probes]
    # exact on-segment probes exercise the accept path
    for i in range(len(coords) - 1):
        t = rnd.random()
        probe_arr.append(coords[i] + t * (coords[i + 1] - coords[i]))
    P = np.asarray(probe_arr)
    vec = ops.locate_points(coords, P)
    for k, p in enumerate(probe_arr):
        s = ops.locate_point(coords, p)
        if s is None:
            assert np.isnan(vec[k])
        else:
            assert float(vec[k]) == float(s)


@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=8),
    st.lists(st.tuples(coord, coord), min_size=3, max_size=6),
    st.lists(st.tuples(coord, coord), min_size=1, max_size=20),
)
@settings(max_examples=40, deadline=None)
def test_pip_native_masks_match_kernel(spark, ring_pts, hole_pts, probes):
    """The codegen-native PIP decomposition (polygon_edges_udf -> explode ->
    pip_edge_flags -> bit_xor/bit_or masks -> pip_mask_verdict) must agree
    bit-for-bit with ops.point_in_polygon, INCLUDING the hole-exclusion rule
    (odd parity AND not on the hole's boundary).  The 'hole' ring here is an
    arbitrary second ring — the formula equivalence doesn't require
    geometric containment, so arbitrary rings cover more of the domain."""
    import pandas as pd
    from pyspark.sql import functions as F
    from netascore_spark.geometry import wkb as _wkb
    from netascore_spark.operators import spatial

    ring = np.array(ring_pts + ring_pts[:1], dtype=float)
    hole = np.array(hole_pts + hole_pts[:1], dtype=float)
    if abs(ops.ring_signed_area(ring)) < 1e-6 or abs(ops.ring_signed_area(hole)) < 1e-6:
        return  # degenerate sliver: PIP of a zero-area ring is out of domain
    rings = [ring, hole]
    geom = _wkb.encode(("Polygon", rings))
    pdf = pd.DataFrame(probes, columns=["px", "py"]).astype("float64")
    pdf["pid"] = range(len(pdf))
    pdf["geom"] = [bytearray(geom)] * len(pdf)
    df = spark.createDataFrame(pdf).withColumn(
        "edges", spatial.polygon_edges_udf()(F.col("geom"))
    )
    per_edge = df.select("pid", "px", "py", F.explode("edges").alias("e"))
    crossing, boundary = spatial.pip_edge_flags(F.col("px"), F.col("py"), F.col("e"))
    bit = spatial.ring_bit(F.col("e.ring"))
    zero = F.lit(0).cast("long")
    masks = per_edge.groupBy("pid").agg(
        F.bit_xor(F.when(crossing, bit).otherwise(zero)).alias("xm"),
        F.bit_or(F.when(boundary, bit).otherwise(zero)).alias("bm"),
    )
    got = (
        masks.withColumn("hit", spatial.pip_mask_verdict(F.col("xm"), F.col("bm")))
        .orderBy("pid")
        .toPandas()["hit"]
        .to_numpy()
    )
    exp = np.array(
        [ops.point_in_polygon(np.array(p, dtype=float), rings) for p in probes]
    )
    assert (got == exp).all()


@given(
    st.lists(st.tuples(coord, coord), min_size=3, max_size=8),
    st.lists(st.tuples(coord, coord), min_size=3, max_size=6),
    st.lists(st.tuples(coord, coord), min_size=1, max_size=20),
)
@settings(max_examples=40, deadline=None)
def test_pip_cell_clipped_matches_kernel(spark, ring_pts, hole_pts, probes):
    """The grid-CLIPPED native PIP (polygon_cell_edges_udf: per-cell base
    parity mask + local edge list, the join_polygons 'native' path) must
    reproduce ops.point_in_polygon for every probe whose cell lies in the
    polygon's bbox cover — the fold (always-cross edges into the base mask)
    and the drop (never-cross edges) carry proofs; this pins them, holes
    included.  Probes outside the cover produce no candidate row on either
    side (cover semantics are pad-0 bbox, unchanged from the unclipped
    path)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from netascore_spark import grid
    from netascore_spark.geometry import wkb as _wkb
    from netascore_spark.operators import spatial

    ring = np.array(ring_pts + ring_pts[:1], dtype=float)
    hole = np.array(hole_pts + hole_pts[:1], dtype=float)
    if abs(ops.ring_signed_area(ring)) < 1e-6 or abs(ops.ring_signed_area(hole)) < 1e-6:
        return  # degenerate sliver: PIP of a zero-area ring is out of domain
    rings = [ring, hole]
    geom = _wkb.encode(("Polygon", rings))
    cs = 200.0
    cover = set(int(c) for c in grid.cover_polygon(rings, cs))
    pdf = pd.DataFrame(probes, columns=["px", "py"]).astype("float64")
    pdf["pid"] = range(len(pdf))
    pdf["cell"] = [int(grid.cell(x, y, cs)) for x, y in probes]
    pts = spark.createDataFrame(pdf)
    poly = spark.createDataFrame(
        pd.DataFrame({"geom": [bytearray(geom)]})
    ).select(F.explode(spatial.polygon_cell_edges_udf(cs)(F.col("geom"))).alias("ce"))
    poly = poly.select(
        F.col("ce.cell").alias("cell"), F.col("ce.base").alias("base"),
        F.col("ce.edges").alias("edges"),
    )
    cand = pts.join(F.broadcast(poly), "cell")
    per_edge = cand.select("pid", "px", "py", "base", F.explode_outer("edges").alias("e"))
    crossing, boundary = spatial.pip_edge_flags(F.col("px"), F.col("py"), F.col("e"))
    bit = spatial.ring_bit(F.col("e.ring"))
    zero = F.lit(0).cast("long")
    masks = per_edge.groupBy("pid").agg(
        F.bit_xor(F.when(crossing, bit).otherwise(zero)).alias("xm"),
        F.bit_or(F.when(boundary, bit).otherwise(zero)).alias("bm"),
        F.min("base").alias("base"),
    )
    hits = {
        int(r["pid"])
        for r in masks.filter(
            spatial.pip_mask_verdict(F.col("xm").bitwiseXOR(F.col("base")), F.col("bm"))
        ).collect()
    }
    expected = {
        pid
        for pid, p in enumerate(probes)
        if int(grid.cell(p[0], p[1], cs)) in cover
        and ops.point_in_polygon(np.array(p, dtype=float), rings)
    }
    assert hits == expected


# ---------------------------------------------------------------------------
# corpus line dedup / decontamination vs pure-python references
# ---------------------------------------------------------------------------

_LINE = st.sampled_from(["", "a", "b", "ab", "line x", "boiler plate"])


@given(
    st.lists(st.lists(_LINE, min_size=1, max_size=4), min_size=1, max_size=8),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=25, deadline=None)
def test_line_dedup_matches_reference(spark, docs_lines, max_count):
    """line_dedup over arbitrary corpora (tiny line alphabet forces heavy
    cross-document collisions) must equal the obvious single-machine
    reference: corpus-wide line counts, per-doc order-preserving filter."""
    from collections import Counter

    from netascore_spark.operators import dedup

    rows = [(i, "\n".join(ls)) for i, ls in enumerate(docs_lines)]
    cnt = Counter(l for ls in docs_lines for l in ls)
    got = {
        r["doc_id"]: (r["text_kept"], r["n_kept"], r["n_lines"])
        for r in dedup.line_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            max_count=max_count,
        ).collect()
    }
    exp = {}
    for i, ls in enumerate(docs_lines):
        kept = [l for l in ls if cnt[l] <= max_count]
        exp[i] = ("\n".join(kept), len(kept), len(ls))
    assert got == exp


_TOK = st.sampled_from(["aa", "bb", "cc", "dd"])


@given(
    st.lists(st.lists(_TOK, min_size=1, max_size=6), min_size=2, max_size=8),
    st.integers(min_value=1, max_value=3),
)
@settings(max_examples=25, deadline=None)
def test_decontaminate_matches_reference(spark, docs_toks, n):
    """decontaminate over random corpora (tiny vocab forces overlap) must
    equal brute-force distinct n-gram intersection counts; even-index docs
    form the benchmark, odd-index docs the training side."""
    import re

    from netascore_spark.operators import dedup

    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs_toks)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    bench = df.filter("doc_id % 2 = 0")
    train = df.filter("doc_id % 2 = 1")

    def grams(text):
        toks = re.split(r"[ \t\n\f\r]+", text.strip().lower())
        if len(toks) < n:
            return set()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    bg = set().union(*(grams(t) for i, t in rows if i % 2 == 0))
    exp = {}
    for i, t in rows:
        if i % 2 == 1:
            h = len(grams(t) & bg)
            if h:
                exp[i] = h
    got = {r["doc_id"]: r["n_hits"]
           for r in dedup.decontaminate(train, bench, n=n).collect()}
    assert got == exp


_WORD = st.sampled_from(["aa", "bb", "cc"])


@given(st.lists(st.lists(_WORD, min_size=1, max_size=8), min_size=1, max_size=8))
@settings(max_examples=20, deadline=None)
def test_bigram_lm_matches_reference(spark, docs_toks):
    """bigram_lm_scores over random tiny-vocab corpora must match the
    numpy reference of the same add-alpha model (counts, V, avg log-prob,
    perplexity) for every document with at least one bigram."""
    from netascore_spark.operators import textstats

    alpha = 0.5
    rows = [(i, " ".join(ts)) for i, ts in enumerate(docs_toks)]
    got = {
        r["doc_id"]: r
        for r in textstats.bigram_lm_scores(
            spark.createDataFrame(rows, "doc_id long, text string"), alpha=alpha
        ).collect()
    }
    c1, c2 = {}, {}
    for ts in docs_toks:
        for t in ts:
            c1[t] = c1.get(t, 0) + 1
        for a, b in zip(ts, ts[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
    V = len(c1)
    expected_ids = set()
    for i, ts in enumerate(docs_toks):
        bgs = list(zip(ts, ts[1:]))
        if not bgs:
            continue
        expected_ids.add(i)
        lps = [np.log((c2[b] + alpha) / (c1[b[0]] + alpha * V)) for b in bgs]
        assert got[i]["n_bigrams"] == len(bgs)
        assert got[i]["avg_logp"] == pytest.approx(np.mean(lps), abs=1e-4)
        assert got[i]["ppl"] == pytest.approx(np.exp(-np.mean(lps)), abs=1e-3)
    assert set(got) == expected_ids
