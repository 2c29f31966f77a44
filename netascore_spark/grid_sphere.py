"""Spherical tiling: S2-style cube-face quadtree (the geographic twin of
the planar grid in :mod:`netascore_spark.grid`).

The north rule names H3/S2 tiling.  The projected (UTM) pipeline uses the
planar grid (the reference transforms everything to meters first,
settings.py:21-24); THIS module supplies the spherical index for raw
lat/lng data — no pole singularities, no date-line seams, bounded area
distortion — without any external library:

- unit sphere -> cube face (argmax axis, x>y>z priority) -> central
  projection (u, v) in [-1, 1] -> S2's quadratic st transform ->
  (i, j) = floor(st * 2^level);
- cell id packs (face:3 | level:5 | i:26 | j:26) into one int64
  (level <= 26; level 16 cells are ~100-160 m across, comparable to the
  planar 200 m / H3 res 9 default).

Ids follow the S2 construction but are NOT Google S2 cell ids (no Hilbert
ordering — equi-join bucketing needs stable unique ids, not space-filling
locality).

Three interchangeable implementations of the same arithmetic:
- numpy (:func:`cell`) for Arrow UDF covers,
- Spark Column tree (:func:`cell_col`) — whole-stage-codegen, no Python,
- ANSI SQL (:func:`cell_sql`) for DuckDB oracles.

Face crossings (the classic correctness trap of cube tilings) are handled
by extending the quadratic st beyond [0, 1] into its monotonic overshoot,
re-projecting through xyz, and re-locating the cell — see
:func:`neighbors`.
"""

from __future__ import annotations

import numpy as np

EARTH_RADIUS_M = 6_371_000.0
DEFAULT_LEVEL = 16
_MAX_LEVEL = 26
# conservative lower bound on angular cell extent per st unit (radians):
# d(theta)/ds = (8s/3) * |d p_hat / du| >= ~0.63 over a face; 0.5 is safe
_MIN_RAD_PER_ST = 0.5


# ---------------------------------------------------------------------------
# scalar/numpy implementation
# ---------------------------------------------------------------------------

def _uv_to_st(u):
    u = np.asarray(u, dtype=np.float64)
    with np.errstate(invalid="ignore"):  # unused np.where branch may NaN
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s):
    s = np.asarray(s, dtype=np.float64)
    return np.where(
        s >= 0.5, (4.0 * s * s - 1.0) / 3.0, (1.0 - 4.0 * (1.0 - s) * (1.0 - s)) / 3.0
    )


def _xyz(lat, lng):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    lam = np.radians(np.asarray(lng, dtype=np.float64))
    return np.cos(phi) * np.cos(lam), np.cos(phi) * np.sin(lam), np.sin(phi)


def _face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    # priority x > y > z on ties — MUST match cell_col / cell_sql
    fx = (ax >= ay) & (ax >= az)
    fy = ~fx & (ay >= az)
    fz = ~fx & ~fy
    axis = np.where(fx, 0, np.where(fy, 1, 2))
    comp = np.where(fx, x, np.where(fy, y, z))
    face = axis + np.where(comp < 0, 3, 0)
    u = np.where(fx, y / x, np.where(fy, x / y, x / z))
    v = np.where(fx, z / x, np.where(fy, z / y, y / z))
    return face.astype(np.int64), u, v


def _pack(face, level, i, j):
    return (
        (np.asarray(face, dtype=np.int64) << 58)
        | (np.int64(level) << 52)
        | (np.asarray(i, dtype=np.int64) << 26)
        | np.asarray(j, dtype=np.int64)
    )


def unpack(cell_id):
    c = np.asarray(cell_id, dtype=np.int64)
    face = c >> 58
    level = (c >> 52) & 0x3F
    i = (c >> 26) & ((1 << 26) - 1)
    j = c & ((1 << 26) - 1)
    return face, level, i, j


def cell(lat, lng, level: int = DEFAULT_LEVEL):
    """lat/lng (degrees) -> spherical cell id(s).  Vectorized."""
    n = 1 << level
    x, y, z = _xyz(lat, lng)
    face, u, v = _face_uv(x, y, z)
    i = np.clip(np.floor(_uv_to_st(u) * n), 0, n - 1).astype(np.int64)
    j = np.clip(np.floor(_uv_to_st(v) * n), 0, n - 1).astype(np.int64)
    return _pack(face, level, i, j)


def _face_point(face, u, v):
    """(face, u, v) -> UN-normalized xyz; u/v may exceed [-1,1] (overshoot
    into the adjacent face under central projection)."""
    face = np.asarray(face)
    u = np.asarray(u, dtype=np.float64)
    v = np.asarray(v, dtype=np.float64)
    one = np.where(face >= 3, -1.0, 1.0)
    axis = face % 3
    x = np.where(axis == 0, one, np.where(axis == 1, u * one, u * one))
    y = np.where(axis == 0, u * one, np.where(axis == 1, one, v * one))
    z = np.where(axis == 0, v * one, np.where(axis == 1, v * one, one))
    return x, y, z


def cell_center_latlng(cell_id):
    face, level, i, j = unpack(cell_id)
    n = (np.int64(1) << level).astype(np.float64)
    u = _st_to_uv((i.astype(np.float64) + 0.5) / n)
    v = _st_to_uv((j.astype(np.float64) + 0.5) / n)
    x, y, z = _face_point(face, u, v)
    r = np.sqrt(x * x + y * y + z * z)
    lat = np.degrees(np.arcsin(z / r))
    lng = np.degrees(np.arctan2(y, x))
    return lat, lng


def neighbors(cell_id, k: int = 1) -> np.ndarray:
    """All cells within k steps (Chebyshev in st space), crossing cube-face
    edges correctly: out-of-range (i, j) re-project through xyz."""
    face, level, i, j = unpack(np.asarray([cell_id]).ravel()[0:1])
    face, level, i, j = int(face[0]), int(level[0]), int(i[0]), int(j[0])
    n = 1 << level
    di, dj = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    ii, jj = (i + di).ravel(), (j + dj).ravel()
    inside = (ii >= 0) & (ii < n) & (jj >= 0) & (jj < n)
    out = [_pack(np.full(inside.sum(), face), level, ii[inside], jj[inside])]
    if (~inside).any():
        # overshoot: evaluate the (monotonic) quadratic beyond [0,1] and
        # re-locate via the unit sphere
        s = (ii[~inside] + 0.5) / n
        t = (jj[~inside] + 0.5) / n
        u, v = _st_to_uv(s), _st_to_uv(t)
        x, y, z = _face_point(np.full(u.shape, face), u, v)
        r = np.sqrt(x * x + y * y + z * z)
        lat = np.degrees(np.arcsin(z / r))
        lng = np.degrees(np.arctan2(y, x))
        out.append(cell(lat, lng, level))
    return np.unique(np.concatenate(out))


def k_for_radius(radius_m: float, level: int = DEFAULT_LEVEL) -> int:
    """Ring count guaranteeing every cell within ``radius_m`` is covered."""
    min_edge_m = _MIN_RAD_PER_ST * (2.0 ** -level) * EARTH_RADIUS_M
    return int(np.ceil(radius_m / min_edge_m)) + 1


def cover_cap(lat: float, lng: float, radius_m: float, level: int = DEFAULT_LEVEL) -> np.ndarray:
    """Cells covering the spherical cap around (lat, lng) — the spherical
    analog of grid.cover_point(pad=r) for DWithin/kNN candidate generation."""
    return neighbors(int(cell(lat, lng, level)), k_for_radius(radius_m, level))


# ---------------------------------------------------------------------------
# Spark Column implementation (JVM-side, whole-stage codegen — no UDF)
# ---------------------------------------------------------------------------

def cell_col(lat, lng, level: int = DEFAULT_LEVEL):
    """Same mapping as :func:`cell`, as a pyspark Column tree."""
    from pyspark.sql import functions as F

    lat = F.col(lat) if isinstance(lat, str) else lat
    lng = F.col(lng) if isinstance(lng, str) else lng
    n = float(1 << level)
    phi = F.radians(lat)
    lam = F.radians(lng)
    x = F.cos(phi) * F.cos(lam)
    y = F.cos(phi) * F.sin(lam)
    z = F.sin(phi)
    ax, ay, az = F.abs(x), F.abs(y), F.abs(z)
    fx = (ax >= ay) & (ax >= az)
    fy = (~fx) & (ay >= az)
    axis = F.when(fx, F.lit(0)).when(fy, F.lit(1)).otherwise(F.lit(2))
    comp = F.when(fx, x).when(fy, y).otherwise(z)
    face = (axis + F.when(comp < 0, F.lit(3)).otherwise(F.lit(0))).cast("long")
    u = F.when(fx, y / x).when(fy, x / y).otherwise(x / z)
    v = F.when(fx, z / x).when(fy, z / y).otherwise(y / z)

    def st(w):
        return F.when(w >= 0, 0.5 * F.sqrt(1.0 + 3.0 * w)).otherwise(
            1.0 - 0.5 * F.sqrt(1.0 - 3.0 * w)
        )

    def idx(w):
        return F.least(
            F.greatest(F.floor(st(w) * F.lit(n)), F.lit(0)), F.lit(int(n) - 1)
        ).cast("long")

    return (
        F.shiftleft(face, 58)
        .bitwiseOR(F.shiftleft(F.lit(level).cast("long"), 52))
        .bitwiseOR(F.shiftleft(idx(u), 26))
        .bitwiseOR(idx(v))
    )


def cell_sql(lat_expr: str, lng_expr: str, level: int = DEFAULT_LEVEL) -> str:
    """Same mapping as ANSI SQL (DuckDB oracle twin of :func:`cell_col`)."""
    n = 1 << level
    pre = (
        f"radians({lat_expr}) AS phi, radians({lng_expr}) AS lam"
    )
    # rendered as a single expression via nested CASE; build with a CTE-less
    # inline form using common subexpressions repeated (oracle-only, clarity
    # over speed)
    x = f"(cos(radians({lat_expr})) * cos(radians({lng_expr})))"
    y = f"(cos(radians({lat_expr})) * sin(radians({lng_expr})))"
    z = f"(sin(radians({lat_expr})))"
    fx = f"(abs({x}) >= abs({y}) AND abs({x}) >= abs({z}))"
    fy = f"(NOT {fx} AND abs({y}) >= abs({z}))"
    face = (
        f"(CASE WHEN {fx} THEN 0 WHEN {fy} THEN 1 ELSE 2 END"
        f" + CASE WHEN (CASE WHEN {fx} THEN {x} WHEN {fy} THEN {y} ELSE {z} END) < 0"
        f" THEN 3 ELSE 0 END)"
    )
    u = f"(CASE WHEN {fx} THEN {y}/{x} WHEN {fy} THEN {x}/{y} ELSE {x}/{z} END)"
    v = f"(CASE WHEN {fx} THEN {z}/{x} WHEN {fy} THEN {z}/{y} ELSE {y}/{z} END)"

    def st(w):
        return (
            f"(CASE WHEN {w} >= 0 THEN 0.5*sqrt(1.0+3.0*{w})"
            f" ELSE 1.0-0.5*sqrt(1.0-3.0*{w}) END)"
        )

    def idx(w):
        return (
            f"CAST(least(greatest(floor({st(w)} * {float(n)}), 0), {n - 1}) AS BIGINT)"
        )

    return (
        f"(CAST({face} AS BIGINT) * {1 << 58} + {level} * {1 << 52}"
        f" + {idx(u)} * {1 << 26} + {idx(v)})"
    )


# ---------------------------------------------------------------------------
# hierarchy: parent / children rollup across levels (H3/S2 cell hierarchy)
# ---------------------------------------------------------------------------
#
# The quadtree packing makes the hierarchy pure bit arithmetic: the level-
# (L-d) ancestor of (face, L, i, j) is (face, L-d, i >> d, j >> d); the
# children of a cell are the four (2i+di, 2j+dj).  Same tri-implementation
# contract as cell(): numpy, Column, SQL — all byte-identical.

def parent(cell_id, steps: int = 1):
    """Ancestor ``steps`` levels up (h3.cell_to_parent analog). Vectorized."""
    face, level, i, j = unpack(cell_id)
    new_level = level - np.int64(steps)
    if np.any(new_level < 0):
        raise ValueError("parent: steps exceeds cell level")
    return _pack(face, 0, i >> np.int64(steps), j >> np.int64(steps)) | (
        new_level << 52
    )


def children(cell_id):
    """The four direct children (h3.cell_to_children analog); one level
    finer.  Scalar cell_id -> ndarray(4,)."""
    face, level, i, j = unpack(cell_id)
    level = int(level)
    if level >= _MAX_LEVEL:
        raise ValueError("children: already at max level")
    di, dj = np.meshgrid([0, 1], [0, 1])
    return _pack(
        int(face), level + 1, (int(i) << 1) + di.ravel(), (int(j) << 1) + dj.ravel()
    )


def parent_col(cell, steps: int = 1):
    """:func:`parent` as a pyspark Column (whole-stage codegen, no python):
    multi-resolution rollups are a groupBy on this expression."""
    from pyspark.sql import functions as F

    c = F.col(cell) if isinstance(cell, str) else cell
    mask26 = (1 << 26) - 1
    face = F.shiftright(c, 58)
    level = F.shiftright(c, 52).bitwiseAND(F.lit(0x3F))
    i = F.shiftright(c, 26).bitwiseAND(F.lit(mask26))
    j = c.bitwiseAND(F.lit(mask26))
    return (
        F.shiftleft(face, 58)
        .bitwiseOR(F.shiftleft(level - F.lit(steps), 52))
        .bitwiseOR(F.shiftleft(F.shiftright(i, steps), 26))
        .bitwiseOR(F.shiftright(j, steps))
    )


def parent_sql(cell_expr: str, steps: int = 1) -> str:
    """:func:`parent` as ANSI SQL (DuckDB oracle twin of parent_col)."""
    mask26 = (1 << 26) - 1
    face = f"(({cell_expr}) // {1 << 58})"
    level = f"((({cell_expr}) // {1 << 52}) % 64)"
    i = f"((({cell_expr}) // {1 << 26}) % {mask26 + 1})"
    j = f"(({cell_expr}) % {mask26 + 1})"
    return (
        f"({face} * {1 << 58} + ({level} - {steps}) * {1 << 52}"
        f" + ({i} // {1 << steps}) * {1 << 26} + ({j} // {1 << steps}))"
    )
