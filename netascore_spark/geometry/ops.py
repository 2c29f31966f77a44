"""Exact planar geometry algorithms on numpy coordinate arrays.

Covers the PostGIS function surface the reference uses (SURVEY.md §2.8):
length/area, intersects, intersection (points + collinear overlaps), split,
dwithin, contains(line,line), point-in-polygon, buffer (flat/round caps),
polygon∩polygon area, line∩polygon length.

Conventions: coordinates are meters in a projected plane (the reference
works in a UTM zone, settings.py:21-24).  ``EPS`` absorbs float noise from
intersection construction.
"""

from __future__ import annotations

import numpy as np

EPS = 1e-9


# ---------------------------------------------------------------------------
# basics
# ---------------------------------------------------------------------------

def length(coords: np.ndarray) -> float:
    """ST_Length of a linestring."""
    if len(coords) < 2:
        return 0.0
    d = np.diff(coords, axis=0)
    return float(np.sqrt((d * d).sum(axis=1)).sum())


def ring_signed_area(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return 0.5 * float(np.dot(x[:-1], y[1:]) - np.dot(x[1:], y[:-1]))


def polygon_area(rings: list[np.ndarray]) -> float:
    """ST_Area: |exterior| minus |holes|."""
    if not rings:
        return 0.0
    a = abs(ring_signed_area(rings[0]))
    for h in rings[1:]:
        a -= abs(ring_signed_area(h))
    return a


# ---------------------------------------------------------------------------
# point/segment predicates
# ---------------------------------------------------------------------------

def point_seg_dist(p: np.ndarray, a: np.ndarray, b: np.ndarray) -> float:
    # explicit mul/add dots (NOT `@`): np.dot routes 2-vectors through a
    # BLAS kernel whose FMA rounds differently by 1 ULP — mul/add is what
    # the vectorized twins (point_line_dist, locate_points) and the native
    # Column expressions compute, so the scalar kernel must match them
    ab = b - a
    denom = float(ab[0] * ab[0] + ab[1] * ab[1])
    if denom <= EPS * EPS:
        return float(np.hypot(*(p - a)))
    ap = p - a
    t = max(0.0, min(1.0, float(ap[0] * ab[0] + ap[1] * ab[1]) / denom))
    proj = a + t * ab
    return float(np.hypot(*(p - proj)))


def point_line_dist(p: np.ndarray, coords: np.ndarray) -> float:
    """Distance point -> linestring (vectorized over segments)."""
    a = coords[:-1]
    b = coords[1:]
    ab = b - a
    ap = p[None, :] - a
    denom = (ab * ab).sum(axis=1)
    denom = np.where(denom <= EPS * EPS, 1.0, denom)
    t = np.clip((ap * ab).sum(axis=1) / denom, 0.0, 1.0)
    proj = a + t[:, None] * ab
    d = p[None, :] - proj
    return float(np.sqrt((d * d).sum(axis=1)).min())


def point_on_line(p: np.ndarray, coords: np.ndarray, eps: float = EPS) -> bool:
    return point_line_dist(p, coords) <= eps


def points_line_dist(points: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """Distances of N points to one linestring, fully vectorized
    (N x segments broadcast) — the kNN hot path."""
    a = coords[:-1]                       # (S, 2)
    ab = coords[1:] - a                   # (S, 2)
    denom = (ab * ab).sum(axis=1)         # (S,)
    denom = np.where(denom <= EPS * EPS, 1.0, denom)
    ap = points[:, None, :] - a[None, :, :]            # (N, S, 2)
    t = np.clip((ap * ab[None, :, :]).sum(axis=2) / denom[None, :], 0.0, 1.0)
    proj = a[None, :, :] + t[:, :, None] * ab[None, :, :]
    d = points[:, None, :] - proj
    return np.sqrt((d * d).sum(axis=2)).min(axis=1)


# ---------------------------------------------------------------------------
# segment-segment intersection
# ---------------------------------------------------------------------------

def _seg_intersection(p1, p2, p3, p4):
    """Intersect segment (p1,p2) with (p3,p4).

    Returns (points, overlap) where points is a list of intersection points
    and overlap is an (a, b) coordinate pair for collinear overlap, or None.
    """
    r = p2 - p1
    s = p4 - p3
    # Zero-length segments first, as point-vs-segment distance tests.
    # Handling them inside the general parallel/collinear branch is
    # asymmetric under argument swap (the rlen/slen "or 1.0" substitution
    # changes the tolerance scale); these explicit cases are symmetric by
    # construction because both orders reduce to the same distance test.
    rr0 = float(r @ r)
    ss0 = float(s @ s)
    if rr0 <= EPS * EPS and ss0 <= EPS * EPS:
        if float(np.hypot(*(p3 - p1))) <= EPS:
            return [p1.copy()], None
        return [], None
    if rr0 <= EPS * EPS:
        if point_seg_dist(p1, p3, p4) <= EPS:
            return [p1.copy()], None
        return [], None
    if ss0 <= EPS * EPS:
        if point_seg_dist(p3, p1, p2) <= EPS:
            return [p3.copy()], None
        return [], None
    # Canonical argument order: swap so the identical arithmetic (and hence
    # the identical tolerance decisions) runs for (a, b) and (b, a).
    if (float(p3[0]), float(p3[1]), float(p4[0]), float(p4[1])) < (
        float(p1[0]), float(p1[1]), float(p2[0]), float(p2[1])
    ):
        p1, p2, p3, p4 = p3, p4, p1, p2
        r, s = s, r
        rr0, ss0 = ss0, rr0
    denom = r[0] * s[1] - r[1] * s[0]
    qp = p3 - p1
    qpxr = qp[0] * r[1] - qp[1] * r[0]
    rlen = float(np.hypot(*r))
    slen = float(np.hypot(*s))
    scale = max(rlen, slen)

    # Parallel iff the angle between directions is < EPS radians (relative
    # test — an absolute EPS*scale**2 cross-product threshold misclassifies
    # a tiny segment against a long one as parallel/collinear).
    if abs(denom) <= EPS * rlen * slen:
        # parallel; collinear iff p3 lies within EPS (absolute distance,
        # coordinate units) of the infinite line through (p1, p2)
        if abs(qpxr) > EPS * rlen:
            return [], None  # parallel, non-collinear
        # collinear: project onto r
        rr = float(r @ r)
        t0 = float((p3 - p1) @ r) / rr
        t1 = float((p4 - p1) @ r) / rr
        lo, hi = min(t0, t1), max(t0, t1)
        lo, hi = max(lo, 0.0), min(hi, 1.0)
        if hi < lo - EPS:
            return [], None
        if hi - lo <= EPS:  # touch at one point
            t = (lo + hi) / 2
            return [p1 + t * r], None
        return [], (p1 + lo * r, p1 + hi * r)

    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    u = qpxr / denom
    tol = EPS / scale
    if -tol <= t <= 1 + tol and -tol <= u <= 1 + tol:
        t = min(max(t, 0.0), 1.0)
        return [p1 + t * r], None
    return [], None


def line_line_intersection(a: np.ndarray, b: np.ndarray):
    """ST_Intersection of two linestrings.

    Returns (points, overlaps): unique crossing/touching points and
    collinear-overlap segments.  The reference's type-based post-processing
    (osm_network.sql.j2:108-127) maps to: keep ``points``; rows whose result
    was purely lines are discarded.
    """
    pts: list[np.ndarray] = []
    overlaps: list[tuple[np.ndarray, np.ndarray]] = []
    for i in range(len(a) - 1):
        # bbox prefilter per segment
        amin = np.minimum(a[i], a[i + 1]) - EPS
        amax = np.maximum(a[i], a[i + 1]) + EPS
        for j in range(len(b) - 1):
            bmin = np.minimum(b[j], b[j + 1])
            bmax = np.maximum(b[j], b[j + 1])
            if (bmin[0] > amax[0] or bmax[0] < amin[0]
                    or bmin[1] > amax[1] or bmax[1] < amin[1]):
                continue
            p, ov = _seg_intersection(a[i], a[i + 1], b[j], b[j + 1])
            pts.extend(p)
            if ov is not None:
                overlaps.append(ov)
    # dedup points (and drop points lying on an overlap segment — PostGIS
    # returns them as part of the line component)
    uniq: list[np.ndarray] = []
    for p in pts:
        on_overlap = any(
            point_seg_dist(p, o[0], o[1]) <= EPS for o in overlaps
        )
        if on_overlap:
            continue
        if not any(np.hypot(*(p - q)) <= EPS for q in uniq):
            uniq.append(p)
    return uniq, overlaps


def lines_intersect(a: np.ndarray, b: np.ndarray) -> bool:
    pts, ov = line_line_intersection(a, b)
    return bool(pts or ov)


# ---------------------------------------------------------------------------
# contains / within
# ---------------------------------------------------------------------------

def line_contains_line(a: np.ndarray, b: np.ndarray, eps: float = 1e-6) -> bool:
    """ST_Contains(a, b) for linestrings: b lies within a.

    Checked by sampling: all vertices and segment midpoints of b must lie on
    a (sufficient when b's segments don't leave and re-enter a collinearly —
    true for split-derived edges vs route lines, J4).
    """
    for i in range(len(b)):
        if point_line_dist(b[i], a) > eps:
            return False
    mids = (b[:-1] + b[1:]) / 2.0
    for m in mids:
        if point_line_dist(m, a) > eps:
            return False
    return True


def point_in_ring(p: np.ndarray, ring: np.ndarray) -> bool:
    """Ray-cast parity (boundary counts as inside within EPS)."""
    x, y = p
    inside = False
    xs, ys = ring[:, 0], ring[:, 1]
    n = len(ring) - 1
    j = n - 1
    for i in range(n):
        xi, yi, xj, yj = xs[i], ys[i], xs[j], ys[j]
        if point_seg_dist(p, np.array([xi, yi]), np.array([xj, yj])) <= EPS:
            return True
        if (yi > y) != (yj > y):
            xint = (xj - xi) * (y - yi) / (yj - yi) + xi
            if x < xint:
                inside = not inside
        j = i
    return inside


def point_in_polygon(p: np.ndarray, rings: list[np.ndarray]) -> bool:
    if not rings or not point_in_ring(p, rings[0]):
        return False
    for hole in rings[1:]:
        # strictly inside a hole -> outside (on hole boundary counts inside)
        on_boundary = any(
            point_seg_dist(p, hole[i], hole[i + 1]) <= EPS
            for i in range(len(hole) - 1)
        )
        if not on_boundary and point_in_ring(p, hole):
            return False
    return True


# ---------------------------------------------------------------------------
# split (ST_Split equivalent)
# ---------------------------------------------------------------------------

def locate_point(coords: np.ndarray, p: np.ndarray, eps: float = 1e-7):
    """Arc-length parameter of p along the line, or None if not on it."""
    acc = 0.0
    best = None
    best_d = eps
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg = b - a
        seg_len = float(np.hypot(*seg))
        d = point_seg_dist(p, a, b)
        if d <= best_d:
            t = 0.0
            # guard on the DIVISOR (seg_len**2), not seg_len: a subnormal
            # segment length squares to exactly 0.0 (underflow) and the
            # division would yield nan/inf
            d2 = seg_len * seg_len
            if d2 > 0:
                ap = p - a
                t = float(np.clip(
                    (ap[0] * seg[0] + ap[1] * seg[1]) / d2,
                    0.0, 1.0,
                ))
            best = acc + t * seg_len
            best_d = d
        acc += seg_len
    return best


def locate_points(coords: np.ndarray, pts: np.ndarray, eps: float = 1e-7) -> np.ndarray:
    """Vectorized :func:`locate_point` over many points at once.

    Bit-identical to the scalar loop: same ufuncs in the same order
    (``np.hypot`` for distances, the ``seg_len**2`` divisor for the
    returned param, ``np.cumsum`` matching the sequential ``acc``
    accumulation), and the scalar's accept rule — minimal distance wins,
    ties go to the LAST segment — reproduced with a reversed argmin.
    Returns an array of arc params with NaN for points not on the line.
    """
    S = len(coords) - 1
    P = len(pts)
    if S < 1 or P == 0:
        return np.full(P, np.nan)
    a = coords[:-1]
    seg = coords[1:] - a
    seg_len = np.hypot(seg[:, 0], seg[:, 1])
    acc = np.concatenate(([0.0], np.cumsum(seg_len)[:-1]))
    denom = (seg * seg).sum(axis=1)
    small = denom <= EPS * EPS

    out = np.full(P, np.nan)
    # chunk points so the (P, S) temporaries stay bounded
    step = max(1, 2_000_000 // max(S, 1))
    for lo in range(0, P, step):
        p = pts[lo: lo + step]                     # (p, 2)
        ap = p[:, None, :] - a[None, :, :]          # (p, S, 2)
        t = np.clip((ap * seg).sum(-1) / np.where(small, 1.0, denom), 0.0, 1.0)
        # float-op order matches point_seg_dist exactly: proj = a + t*ab
        # first, then p - proj (NOT algebraically-equal (p-a) - t*ab)
        proj_x = a[:, 0] + t * seg[:, 0]
        proj_y = a[:, 1] + t * seg[:, 1]
        d = np.hypot(p[:, None, 0] - proj_x, p[:, None, 1] - proj_y)
        if small.any():
            d = np.where(small, np.hypot(ap[..., 0], ap[..., 1]), d)
        # param uses the scalar's own divisor (seg_len**2, NOT denom);
        # guard on the squared value — subnormal lengths underflow to 0
        d2 = seg_len * seg_len
        tp = np.clip(
            (ap * seg).sum(-1) / np.where(d2 > 0, d2, 1.0),
            0.0, 1.0,
        )
        tp = np.where(d2 > 0, tp, 0.0)
        params = acc + tp * seg_len                 # (p, S)
        dmin = d.min(axis=1)
        last_idx = (S - 1) - np.argmin(d[:, ::-1], axis=1)
        hit = dmin <= eps
        res = params[np.arange(len(p)), last_idx]
        out[lo: lo + step] = np.where(hit, res, np.nan)
    return out


def split_line(coords: np.ndarray, points: list[np.ndarray], eps: float = 1e-7):
    """ST_Dump(ST_Split(line, multipoint)): pieces in order along the line.

    Points not on the line (or at its endpoints) do not split.  Cut
    coordinates reuse the *given* point values (not re-interpolated), so two
    lines split at the same junction point get bit-identical piece endpoints
    — the property the node-identity equality join (J3) relies on.
    """
    total = length(coords)
    cuts = []  # (arc_param, original_point)
    if len(points) > 4:
        # vectorized twin of the scalar loop (bit-identical params)
        params = locate_points(coords, np.asarray(points, dtype=float), eps)
        for s, p in zip(params, points):
            if not np.isnan(s) and eps < s < total - eps:
                cuts.append((float(s), p))
    else:
        for p in points:
            s = locate_point(coords, p, eps)
            if s is not None and eps < s < total - eps:
                cuts.append((s, p))
    if not cuts:
        return [coords.copy()]
    # dedup by param
    cuts.sort(key=lambda c: c[0])
    dedup = []
    for s, p in cuts:
        if not dedup or s - dedup[-1][0] > eps:
            dedup.append((s, p))
    cuts = dedup

    # Vertex/cut dedup is by ARC PARAMETER, not XY proximity: a switchback
    # apex sits within eps (XY) of a cut on the other leg yet is real
    # geometry — dropping it shrinks total length (Hypothesis counterexample
    # pts=[(0,0),(0,1),(0,1.192e-07)]).  Params for a cut exactly at a vertex
    # come out bit-identical (locate_point accumulates the same seg_len
    # floats), so strict > comparisons need no slack.
    pieces = []
    current = [coords[0]]
    last_s = 0.0  # arc param of current[-1]
    acc = 0.0
    pi = 0
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg_len = float(np.hypot(*(b - a)))
        b_s = acc + seg_len
        while pi < len(cuts) and b_s >= cuts[pi][0]:
            s_cut, cut = cuts[pi]
            if s_cut > last_s:
                current.append(cut)
            pieces.append(np.array(current))
            current = [cut]
            last_s = s_cut
            pi += 1
        if b_s > last_s:
            current.append(b)
            last_s = b_s
        acc = b_s
    if len(current) >= 2:
        pieces.append(np.array(current))
    return pieces


# ---------------------------------------------------------------------------
# buffer (ST_Buffer with endcap=flat|round), offset construction
# ---------------------------------------------------------------------------

def _arc(center, start_angle, end_angle, r, quad_segs=8, ccw=True):
    """Arc points from start to end angle, CCW or CW."""
    if ccw:
        while end_angle < start_angle:
            end_angle += 2 * np.pi
    else:
        while end_angle > start_angle:
            end_angle -= 2 * np.pi
    span = abs(end_angle - start_angle)
    n = max(1, int(np.ceil(span / (np.pi / 2) * quad_segs)))
    angles = np.linspace(start_angle, end_angle, n + 1)
    return center[None, :] + r * np.stack([np.cos(angles), np.sin(angles)], axis=1)


def _inf_line_intersection(p1, p2, p3, p4):
    """Intersection of infinite lines (p1,p2) and (p3,p4), or None."""
    r = p2 - p1
    s = p4 - p3
    denom = r[0] * s[1] - r[1] * s[0]
    if abs(denom) <= EPS:
        return None
    qp = p3 - p1
    t = (qp[0] * s[1] - qp[1] * s[0]) / denom
    return p1 + t * r


def _offset_side(coords: np.ndarray, r: float, quad_segs: int):
    """Left-of-travel offset path: CW round arcs on outside (right-turn)
    corners, miter trim on inside (left-turn) corners."""
    segs = []
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        d = b - a
        seg_len = float(np.hypot(*d))
        if seg_len <= EPS:
            continue
        dirv = d / seg_len
        nvec = np.array([-dirv[1], dirv[0]])  # left normal
        segs.append((a, a + r * nvec, b + r * nvec, dirv))
    if not segs:
        raise ValueError("degenerate linestring")
    path = [segs[0][1], segs[0][2]]
    for k in range(1, len(segs)):
        v, oa, ob, dirv = segs[k]
        _, poa, pob, pdir = segs[k - 1]
        turn = pdir[0] * dirv[1] - pdir[1] * dirv[0]
        if turn < -EPS:
            # right turn -> left side is outside: round join (CW arc)
            a0 = float(np.arctan2(pob[1] - v[1], pob[0] - v[0]))
            a1 = float(np.arctan2(oa[1] - v[1], oa[0] - v[0]))
            path.extend(_arc(v, a0, a1, r, quad_segs, ccw=False)[1:])
            path.append(ob)
        elif turn > EPS:
            # left turn -> left side is inside: miter to offsets' crossing
            inter = _inf_line_intersection(poa, pob, oa, ob)
            if inter is not None:
                path[-1] = inter
                path.append(ob)
            else:
                path.extend([oa, ob])
        else:
            path.append(ob)
    return np.array(path)


def buffer_line(coords: np.ndarray, r: float, cap: str = "flat", quad_segs: int = 8):
    """Polygon ring approximating ST_Buffer(line, r, 'endcap=<cap>').

    Exact (rectangle) for single-segment lines with flat caps; arc-
    approximated round joins elsewhere (PostGIS likewise approximates arcs,
    quad_segs=8 default).  The ring is traversed clockwise.
    """
    left = _offset_side(coords, r, quad_segs)
    right = _offset_side(coords[::-1], r, quad_segs)
    parts = [left]
    if cap == "round":
        end = coords[-1]
        a0 = float(np.arctan2(left[-1][1] - end[1], left[-1][0] - end[0]))
        a1 = float(np.arctan2(right[0][1] - end[1], right[0][0] - end[0]))
        parts.append(_arc(end, a0, a1, r, quad_segs, ccw=False)[1:-1])
    parts.append(right)
    if cap == "round":
        start = coords[0]
        a0 = float(np.arctan2(right[-1][1] - start[1], right[-1][0] - start[0]))
        a1 = float(np.arctan2(left[0][1] - start[1], left[0][0] - start[0]))
        parts.append(_arc(start, a0, a1, r, quad_segs, ccw=False)[1:-1])
    ring = np.vstack(parts)
    ring = np.vstack([ring, ring[:1]])
    return ring


def buffer_point(p: np.ndarray, r: float, quad_segs: int = 8):
    ring = _arc(p, 0.0, 2 * np.pi, r, quad_segs, ccw=True)
    ring[-1] = ring[0]
    return ring


# ---------------------------------------------------------------------------
# polygon ∩ polygon area (winding decomposition + convex clipping)
# ---------------------------------------------------------------------------

def _clip_convex(subject: np.ndarray, clip_tri: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman: clip polygon by a CCW convex polygon.

    Hot path (runs per (piece, triangle) in the union decomposition):
    plain float arithmetic — np.cross/np.clip on 2-vectors cost more in
    moveaxis/dispatch than the whole clip."""
    out = subject
    n = len(clip_tri)
    for i in range(n):
        if len(out) == 0:
            return out
        ax, ay = clip_tri[i]
        bx, by = clip_tri[(i + 1) % n]
        ex, ey = bx - ax, by - ay
        inp = out
        m = len(inp)
        d = ex * (inp[:, 1] - ay) - ey * (inp[:, 0] - ax)
        inside = d >= -EPS
        res = []
        for k in range(m):
            k2 = k + 1 if k + 1 < m else 0
            if inside[k]:
                res.append(inp[k])
            if inside[k] != inside[k2]:
                p1, p2 = inp[k], inp[k2]
                sx, sy = p2[0] - p1[0], p2[1] - p1[1]
                denom = ex * sy - ey * sx
                if abs(denom) > EPS:
                    t = (ex * (p1[1] - ay) - ey * (p1[0] - ax)) / -denom
                    t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
                    res.append((p1[0] + t * sx, p1[1] + t * sy))
        out = np.array(res) if res else np.empty((0, 2))
    return out


def _fan_triangles(rings: list[np.ndarray]):
    """Signed fan decomposition: (triangle CCW, sign) pairs whose signed sum
    reproduces the polygon's winding function (exterior +, holes -)."""
    tris = []
    for ridx, ring in enumerate(rings):
        orient = 1.0 if ring_signed_area(ring) >= 0 else -1.0
        want = 1.0 if ridx == 0 else -1.0
        o = ring[0]
        for i in range(1, len(ring) - 1):
            t = np.array([o, ring[i], ring[i + 1]])
            s = ring_signed_area(np.vstack([t, t[:1]]))
            if abs(s) <= EPS:
                continue
            sign = (1.0 if s > 0 else -1.0) * orient * want
            if s < 0:
                t = t[::-1]  # make CCW
            tris.append((t, sign))
    return tris


def intersection_area(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> float:
    """Exact area(A ∩ B) for simple polygons (with holes).

    Uses ∫ w_A·w_B over signed fan triangulations — robust to ring
    orientation, no geometric union construction needed.
    """
    ta = _fan_triangles(rings_a)
    tb = _fan_triangles(rings_b)
    total = 0.0
    for t1, s1 in ta:
        mn1, mx1 = t1.min(axis=0), t1.max(axis=0)
        for t2, s2 in tb:
            mn2, mx2 = t2.min(axis=0), t2.max(axis=0)
            if (mn2[0] > mx1[0] or mx2[0] < mn1[0]
                    or mn2[1] > mx1[1] or mx2[1] < mn1[1]):
                continue
            clipped = _clip_convex(t1, t2)
            if len(clipped) >= 3:
                ring = np.vstack([clipped, clipped[:1]])
                total += s1 * s2 * abs(ring_signed_area(ring))
    return max(total, 0.0)


def intersection_area3(
    rings_a: list[np.ndarray], rings_b: list[np.ndarray], rings_c: list[np.ndarray]
) -> float:
    """area(A ∩ B ∩ C) — triple winding product, double convex clip."""
    ta, tb, tc = _fan_triangles(rings_a), _fan_triangles(rings_b), _fan_triangles(rings_c)
    total = 0.0
    for t1, s1 in ta:
        for t2, s2 in tb:
            clipped = _clip_convex(t1, t2)
            if len(clipped) < 3:
                continue
            for t3, s3 in tc:
                c2 = _clip_convex(clipped, t3)
                if len(c2) >= 3:
                    ring = np.vstack([c2, c2[:1]])
                    total += s1 * s2 * s3 * abs(ring_signed_area(ring))
    return max(total, 0.0)


def _ring_closed(ring: np.ndarray) -> bool:
    return (
        abs(float(ring[0, 0]) - float(ring[-1, 0]))
        + abs(float(ring[0, 1]) - float(ring[-1, 1]))
    ) <= 1e-9


def _ear_triangulate(ring: np.ndarray) -> list[np.ndarray]:
    """Simple closed ring -> disjoint CCW triangles covering it exactly.

    Standard ear clipping with collinear-vertex removal.  On a numeric dead
    end (no ear passes the containment test): a CONVEX remainder fans
    exactly; a concave remainder retries the ear search with the relaxed
    boundary tolerance (vertices exactly on an ear edge no longer block it)
    and, if still stuck, raises — an unsigned fan of a concave ring would
    yield OVERLAPPING triangles and silently overcount downstream
    union_area/union_area_in_region.
    """
    pts = ring[:-1] if _ring_closed(ring) else ring
    pts = np.asarray(pts, dtype=float)
    if len(pts) < 3:
        return []
    if ring_signed_area(np.vstack([pts, pts[:1]])) < 0:
        pts = pts[::-1]

    def _cross(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    def _in_tri(p, a, b, c, eps):
        return (
            _cross(a, b, p) > eps and _cross(b, c, p) > eps and _cross(c, a, p) > eps
        )

    def _fan(idx):
        out = []
        o = pts[idx[0]]
        for k in range(1, len(idx) - 1):
            t = np.array([o, pts[idx[k]], pts[idx[k + 1]]])
            s = ring_signed_area(np.vstack([t, t[:1]]))
            if abs(s) > EPS:
                out.append(t if s > 0 else t[::-1])
        return out

    def _clip(idx, tol):
        """Ear-clip until done or stuck; returns (triangles, remaining idx)."""
        tris: list[np.ndarray] = []
        guard = 0
        while len(idx) > 3 and guard < 4 * len(pts) ** 2:
            guard += 1
            n = len(idx)
            found = False
            for k in range(n):
                i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
                a, b, c = pts[i0], pts[i1], pts[i2]
                cr = _cross(a, b, c)
                if abs(cr) <= EPS:  # collinear vertex: drop it, no triangle
                    idx.pop(k)
                    found = True
                    break
                if cr < 0:  # reflex
                    continue
                if any(
                    _in_tri(pts[j], a, b, c, tol)
                    for j in idx
                    if j not in (i0, i1, i2)
                ):
                    continue
                tris.append(np.array([a, b, c]))
                idx.pop(k)
                found = True
                break
            if not found:
                return tris, idx
        if len(idx) == 3:
            t = np.array([pts[idx[0]], pts[idx[1]], pts[idx[2]]])
            if abs(ring_signed_area(np.vstack([t, t[:1]]))) > EPS:
                if ring_signed_area(np.vstack([t, t[:1]])) < 0:
                    t = t[::-1]
                tris.append(t)
            idx = []
        return tris, idx

    tris, rest = _clip(list(range(len(pts))), -EPS)
    if not rest:
        return tris
    rem = np.vstack([pts[rest], pts[rest[0]][None, :]])
    if _is_convex_ring(rem):
        return tris + _fan(rest)
    more, rest2 = _clip(rest, EPS)  # boundary-touching vertices allowed
    tris += more
    if not rest2:
        return tris
    rem2 = np.vstack([pts[rest2], pts[rest2[0]][None, :]])
    if _is_convex_ring(rem2):
        return tris + _fan(rest2)
    raise ValueError(
        f"ear triangulation stuck on a concave {len(rest2)}-vertex remainder "
        "(self-intersecting or numerically degenerate ring)"
    )


def _clip_halfplane(poly: np.ndarray, a: np.ndarray, edge: np.ndarray, keep_left: bool) -> np.ndarray:
    """Clip convex ``poly`` (open CCW array) by the line through ``a`` with
    direction ``edge``; keep the left (or right) side."""
    if len(poly) == 0:
        return poly
    ax, ay = float(a[0]), float(a[1])
    ex, ey = float(edge[0]), float(edge[1])
    d = ex * (poly[:, 1] - ay) - ey * (poly[:, 0] - ax)
    inside = d >= -EPS if keep_left else d <= EPS
    res = []
    n = len(poly)
    for k in range(n):
        k2 = k + 1 if k + 1 < n else 0
        if inside[k]:
            res.append(poly[k])
        if inside[k] != inside[k2]:
            p1, p2 = poly[k], poly[k2]
            sx, sy = p2[0] - p1[0], p2[1] - p1[1]
            denom = ex * sy - ey * sx
            if abs(denom) > EPS:
                t = (ex * (p1[1] - ay) - ey * (p1[0] - ax)) / -denom
                t = 0.0 if t < 0.0 else (1.0 if t > 1.0 else t)
                res.append((p1[0] + t * sx, p1[1] + t * sy))
    if not res:
        return np.empty((0, 2))
    out = np.array(res)
    # drop duplicate consecutive vertices (incl. wrap-around): a zero-length
    # edge downstream would make both half-plane clips keep everything
    keep = np.ones(len(out), dtype=bool)
    dup = np.abs(out[:-1] - out[1:]).sum(axis=1) <= EPS  # out[k] ~= out[k+1]
    keep[1:][dup] = False
    if abs(out[-1, 0] - out[0, 0]) + abs(out[-1, 1] - out[0, 1]) <= EPS:
        keep[0] = False
    return out[keep]


def _convex_difference(p: np.ndarray, c: np.ndarray) -> list[np.ndarray]:
    """p \\ c for convex CCW polygons, as DISJOINT convex pieces.

    Piece i = p ∩ (outside half-plane of c's edge i) ∩ (inside half-planes of
    edges 0..i-1) — the standard disjoint decomposition of a convex
    complement.
    """
    # bbox fast path: disjoint boxes -> nothing removed
    if (
        c[:, 0].min() > p[:, 0].max() or c[:, 0].max() < p[:, 0].min()
        or c[:, 1].min() > p[:, 1].max() or c[:, 1].max() < p[:, 1].min()
    ):
        return [p]
    pieces = []
    remaining = p
    n = len(c)
    for i in range(n):
        if len(remaining) < 3:
            break
        a, b = c[i], c[(i + 1) % n]
        edge = b - a
        if abs(edge[0]) + abs(edge[1]) <= EPS:  # degenerate edge: no cut
            continue
        outside = _clip_halfplane(remaining, a, edge, keep_left=False)
        if len(outside) >= 3 and abs(
            ring_signed_area(np.vstack([outside, outside[:1]]))
        ) > EPS:
            pieces.append(outside)
        remaining = _clip_halfplane(remaining, a, edge, keep_left=True)
    return pieces


def triangulated(rings: list[np.ndarray]):
    """Pre-triangulated polygon for union_pieces/union_area_in_region: the
    ear triangulation is a pure function of the rings, so callers that see
    the same polygon in many groups (buffer overlays: one building appears
    in every neighbouring edge's candidate set) cache this once per WKB
    instead of re-triangulating per group.  The returned triangles are
    treated read-only downstream (every clip builds new arrays)."""
    return (rings, (_ear_triangulate(rings[0]),
                    [_ear_triangulate(h) for h in rings[1:]]))


def _poly_pieces(poly, bbox=None) -> list[np.ndarray]:
    """Disjoint convex pieces covering a polygon-with-holes, optionally
    pre-clipped to a bbox (minx, miny, maxx, maxy).  ``poly`` is either a
    rings list or the output of :func:`triangulated` (identical result —
    the same triangles go through the same clip/subtract sequence)."""
    if isinstance(poly, tuple):
        rings, (tris, hole_tris) = poly
    else:
        rings = poly
        tris = _ear_triangulate(rings[0])
        hole_tris = None
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        box = np.array([[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy]])
        clipped = []
        for t in tris:
            ct = _clip_convex(t, box)
            if len(ct) >= 3 and abs(ring_signed_area(np.vstack([ct, ct[:1]]))) > EPS:
                clipped.append(ct)
        tris = clipped
    if hole_tris is None:
        hole_tris = [_ear_triangulate(h) for h in rings[1:]]
    for hs in hole_tris:
        for h in hs:
            tris = [frag for t in tris for frag in _convex_difference(t, h)]
    return tris


def _bbox(p: np.ndarray):
    return (
        float(p[:, 0].min()), float(p[:, 1].min()),
        float(p[:, 0].max()), float(p[:, 1].max()),
    )


def union_pieces(
    polys, bbox=None
) -> list[np.ndarray]:
    """Disjoint convex pieces exactly covering Union(polys) (∩ bbox).

    Incremental construction: each polygon's triangles are reduced by the
    union-so-far (convex difference), so only NEW coverage is appended —
    exact for any overlap depth (not pairwise-truncated).

    Bit-identical fast path: piece bboxes are cached once and compared in
    the caller, so the O(new-triangles x pieces) inner loop skips the
    _convex_difference call (whose own bbox test would return the identity)
    for the overwhelmingly common disjoint case — the numpy min/max
    dispatch per tiny array was the dominant cost of the buffer-overlay
    python stage (measured: 3.2M ufunc reduces for 403k calls on a 1%%
    bench sample).  ``polys`` elements may be rings lists or
    :func:`triangulated` outputs."""
    pieces: list[np.ndarray] = []
    boxes: list[tuple] = []
    for rings in polys:
        for t in _poly_pieces(rings, bbox):
            frags = [t]
            fboxes = [_bbox(t)]
            for c, cb in zip(pieces, boxes):
                nf: list[np.ndarray] = []
                nb: list[tuple] = []
                for fr, fb in zip(frags, fboxes):
                    if (
                        cb[0] > fb[2] or cb[2] < fb[0]
                        or cb[1] > fb[3] or cb[3] < fb[1]
                    ):
                        # disjoint boxes: _convex_difference would return
                        # [fr] unchanged — skip the call
                        nf.append(fr)
                        nb.append(fb)
                        continue
                    for f in _convex_difference(fr, c):
                        nf.append(f)
                        nb.append(_bbox(f))
                frags, fboxes = nf, nb
                if not frags:
                    break
            pieces.extend(frags)
            boxes.extend(fboxes)
    return pieces


def _is_convex_ring(ring: np.ndarray) -> bool:
    pts = ring[:-1] if _ring_closed(ring) else ring
    if len(pts) < 3:
        return False
    v = np.diff(np.vstack([pts, pts[:1]]), axis=0)
    cr = v[:-1, 0] * v[1:, 1] - v[:-1, 1] * v[1:, 0]
    return bool((cr >= -EPS).all() or (cr <= EPS).all())


def union_area_in_region(
    polys: list[list[np.ndarray]], region: list[np.ndarray]
) -> float:
    """ST_Area(ST_Union(poly_i ∩ region)) — the union-before-area of A3
    (osm_attributes.sql.j2:946-951).  EXACT for any overlap depth: the union
    is decomposed into disjoint convex pieces (incremental convex
    difference), each intersected with the region.

    Fast path: a CONVEX hole-free region (e.g. the flat-cap buffer of a
    single-segment edge is a rectangle) clips each union piece in one
    Sutherland–Hodgman pass; the general path triangulates the region once
    and sums signed clipped areas."""
    rb = region[0]
    bbox = (rb[:, 0].min(), rb[:, 1].min(), rb[:, 0].max(), rb[:, 1].max())
    pieces = union_pieces(polys, bbox)
    if not pieces:
        return 0.0
    total = 0.0
    if len(region) == 1 and _is_convex_ring(rb):
        clip = rb[:-1] if _ring_closed(rb) else rb
        if ring_signed_area(np.vstack([clip, clip[:1]])) < 0:
            clip = clip[::-1]
        for piece in pieces:
            c = _clip_convex(piece, clip)
            if len(c) >= 3:
                total += abs(ring_signed_area(np.vstack([c, c[:1]])))
        return max(total, 0.0)
    # general region: triangulate ONCE (not per piece, as intersection_area
    # would), then sum signed clipped areas per (piece, region-triangle)
    rtris = _fan_triangles(region)
    for piece in pieces:
        mn, mx = piece.min(axis=0), piece.max(axis=0)
        for t, s in rtris:
            tn, tx = t.min(axis=0), t.max(axis=0)
            if tn[0] > mx[0] or tx[0] < mn[0] or tn[1] > mx[1] or tx[1] < mn[1]:
                continue
            c = _clip_convex(piece, t)
            if len(c) >= 3:
                total += s * abs(ring_signed_area(np.vstack([c, c[:1]])))
    return max(total, 0.0)


def union_area(polys: list[list[np.ndarray]]) -> float:
    """Area of the union of polygons (ST_Area(ST_Union(...)), A3) — exact
    for any overlap depth via disjoint convex decomposition."""
    return max(
        sum(
            abs(ring_signed_area(np.vstack([p, p[:1]])))
            for p in union_pieces(polys)
        ),
        0.0,
    )


def polygons_intersect(rings_a: list[np.ndarray], rings_b: list[np.ndarray]) -> bool:
    if intersection_area(rings_a, rings_b) > EPS:
        return True
    # touching boundaries / degenerate: fall back to edge tests
    for ra in rings_a:
        for rb in rings_b:
            if lines_intersect(ra, rb):
                return True
    return point_in_polygon(rings_a[0][0], rings_b) or point_in_polygon(
        rings_b[0][0], rings_a
    )


# ---------------------------------------------------------------------------
# line ∩ polygon (length + boolean)
# ---------------------------------------------------------------------------

def line_polygon_intersection_length(coords: np.ndarray, rings: list[np.ndarray]) -> float:
    """ST_Length(ST_Intersection(line, polygon))."""
    total = 0.0
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg = b - a
        seg_len = float(np.hypot(*seg))
        if seg_len <= EPS:
            continue
        params = [0.0, 1.0]
        for ring in rings:
            for j in range(len(ring) - 1):
                pts, ov = _seg_intersection(a, b, ring[j], ring[j + 1])
                for p in pts:
                    t = float((p - a) @ seg) / (seg_len * seg_len)
                    params.append(min(max(t, 0.0), 1.0))
                if ov is not None:
                    for p in ov:
                        t = float((p - a) @ seg) / (seg_len * seg_len)
                        params.append(min(max(t, 0.0), 1.0))
        params = sorted(set(params))
        for k in range(len(params) - 1):
            mid = a + (params[k] + params[k + 1]) / 2 * seg
            if point_in_polygon(mid, rings):
                total += (params[k + 1] - params[k]) * seg_len
    return total


def line_intersects_polygon(coords: np.ndarray, rings: list[np.ndarray]) -> bool:
    for p in coords:
        if point_in_polygon(p, rings):
            return True
    for ring in rings:
        if lines_intersect(coords, ring):
            return True
    return False


# ---------------------------------------------------------------------------
# offset curve / line substring (GIP linkuse assembly, J14)
# ---------------------------------------------------------------------------

def offset_curve(coords: np.ndarray, r: float, quad_segs: int = 8) -> np.ndarray:
    """ST_OffsetCurve: positive r offsets left of travel, negative right."""
    if r == 0:
        return coords.copy()
    if r > 0:
        return _offset_side(coords, r, quad_segs)
    # right side: offset the reversed line left, then reverse back
    return _offset_side(coords[::-1], -r, quad_segs)[::-1]


def line_substring(coords: np.ndarray, start_frac: float, end_frac: float) -> np.ndarray:
    """ST_LineSubstring: the part between fractional arc-length positions."""
    total = length(coords)
    s0, s1 = start_frac * total, end_frac * total
    out = []
    acc = 0.0
    for i in range(len(coords) - 1):
        a, b = coords[i], coords[i + 1]
        seg_len = float(np.hypot(*(b - a)))
        if seg_len <= EPS:
            continue
        lo, hi = acc, acc + seg_len
        if hi < s0 or lo > s1:
            acc = hi
            continue
        t0 = max(0.0, (s0 - lo) / seg_len)
        t1 = min(1.0, (s1 - lo) / seg_len)
        p0 = a + t0 * (b - a)
        p1 = a + t1 * (b - a)
        if not out:
            out.append(p0)
        if np.hypot(*(p1 - out[-1])) > EPS:
            out.append(p1)
        acc = hi
    if len(out) < 2:
        # degenerate: return a zero-length stub at the located point
        p = out[0] if out else coords[0]
        out = [p, p]
    return np.array(out)


# ---------------------------------------------------------------------------
# dwithin
# ---------------------------------------------------------------------------

def dwithin_point_line(p: np.ndarray, coords: np.ndarray, r: float) -> bool:
    """ST_DWithin(point, line, r)."""
    return point_line_dist(p, coords) <= r + EPS


def dwithin_point_point(p: np.ndarray, q: np.ndarray, r: float) -> bool:
    return float(np.hypot(*(p - q))) <= r + EPS
