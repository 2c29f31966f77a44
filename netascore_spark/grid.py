"""Planar cell-grid spatial index (H3/S2-analog API).

The north rule calls for H3 res-9 / S2 tiling; neither library ships in this
container, and the engine works in projected planar meters (the reference
transforms everything to a UTM zone, settings.py:21-24, so tiles are planar
anyway).  We therefore use a square grid with H3-res-9-comparable cell size
(~200 m; H3 res 9 average edge ≈ 174 m).  The API mirrors h3-py so a
spherical index can be swapped in behind it:

- ``cell(x, y)``            ~ ``h3.latlng_to_cell``
- ``grid_disk(cell, k)``    ~ ``h3.grid_disk``  (ring expansion for radius
                               queries — the cell-ring kNN of the north star)
- ``cover_*``               ~ ``h3.polygon_to_cells`` (covering cells)

Cell ids pack (ix, iy) into one int64: 21 bits each around an offset of
2^20 cells -> valid for |coordinate| < 2.1e8 m, far beyond any UTM extent.

All functions are numpy-vectorized; Spark exposure is via Arrow pandas UDFs
in :mod:`netascore_spark.operators.spatial`.
"""

from __future__ import annotations

import numpy as np

DEFAULT_CELL_SIZE = 200.0
_B = 1 << 20  # offset
_SHIFT = 21


def cell(x, y, cell_size: float = DEFAULT_CELL_SIZE):
    """Cell id(s) for coordinate(s). Accepts scalars or numpy arrays."""
    ix = np.floor(np.asarray(x, dtype=np.float64) / cell_size).astype(np.int64)
    iy = np.floor(np.asarray(y, dtype=np.float64) / cell_size).astype(np.int64)
    return ((ix + _B) << _SHIFT) | (iy + _B)


def cell_xy(cell_id):
    """Inverse of :func:`cell` -> (ix, iy) grid indices."""
    c = np.asarray(cell_id, dtype=np.int64)
    ix = (c >> _SHIFT) - _B
    iy = (c & ((1 << _SHIFT) - 1)) - _B
    return ix, iy


def cell_center(cell_id, cell_size: float = DEFAULT_CELL_SIZE):
    ix, iy = cell_xy(cell_id)
    return (ix + 0.5) * cell_size, (iy + 0.5) * cell_size


def grid_disk(cell_id: int, k: int):
    """All cells within Chebyshev distance k (h3.grid_disk analog)."""
    ix, iy = cell_xy(cell_id)
    dx, dy = np.meshgrid(np.arange(-k, k + 1), np.arange(-k, k + 1))
    return (((ix + dx.ravel()) + _B) << _SHIFT) | ((iy + dy.ravel()) + _B)


def k_for_radius(radius: float, cell_size: float = DEFAULT_CELL_SIZE) -> int:
    """Ring count whose disk is guaranteed to contain every cell within
    ``radius`` of any point of the center cell."""
    return int(np.ceil(radius / cell_size))


def cover_bbox(minx, miny, maxx, maxy, cell_size: float = DEFAULT_CELL_SIZE,
               pad: float = 0.0) -> np.ndarray:
    """Cells covering a (padded) bbox."""
    x0 = int(np.floor((minx - pad) / cell_size))
    x1 = int(np.floor((maxx + pad) / cell_size))
    y0 = int(np.floor((miny - pad) / cell_size))
    y1 = int(np.floor((maxy + pad) / cell_size))
    xs = np.arange(x0, x1 + 1, dtype=np.int64)
    ys = np.arange(y0, y1 + 1, dtype=np.int64)
    gx, gy = np.meshgrid(xs, ys)
    return ((gx.ravel() + _B) << _SHIFT) | (gy.ravel() + _B)


def cover_point(x: float, y: float, cell_size: float = DEFAULT_CELL_SIZE,
                pad: float = 0.0) -> np.ndarray:
    if pad > 0.0:
        return cover_bbox(x, y, x, y, cell_size, pad)
    return np.array([cell(x, y, cell_size)], dtype=np.int64)


def cover_line(coords: np.ndarray, cell_size: float = DEFAULT_CELL_SIZE,
               pad: float = 0.0) -> np.ndarray:
    """Cells covering a linestring: union of per-segment padded bboxes.

    Tighter than the whole-line bbox for long diagonal ways (keeps candidate
    sets small — the analog of a polyline's H3 cell trace).
    """
    out = []
    for i in range(len(coords) - 1):
        x0, y0 = coords[i]
        x1, y1 = coords[i + 1]
        out.append(
            cover_bbox(min(x0, x1), min(y0, y1), max(x0, x1), max(y0, y1),
                       cell_size, pad)
        )
    if not out:
        return cover_point(coords[0][0], coords[0][1], cell_size, pad)
    return np.unique(np.concatenate(out))


def cover_polygon(rings: list[np.ndarray], cell_size: float = DEFAULT_CELL_SIZE,
                  pad: float = 0.0) -> np.ndarray:
    """Cells covering a polygon (bbox cover — prefilter only, refined later)."""
    ext = rings[0]
    return cover_bbox(
        float(ext[:, 0].min()), float(ext[:, 1].min()),
        float(ext[:, 0].max()), float(ext[:, 1].max()),
        cell_size, pad,
    )


# ---------------------------------------------------------------------------
# Hilbert-curve cell ordering (H3-style locality for range partitioning)
# ---------------------------------------------------------------------------

_HILBERT_ORDER = _SHIFT  # 21-bit grid indices -> 42-bit keys


def hilbert_key(cell_id):
    """Hilbert-curve distance of cell(s): a locality-preserving total order
    over the grid (consecutive keys are always edge-adjacent cells).  Used
    for RANGE partitioning of hot tiles — contiguous key ranges are compact
    spatial blobs, unlike the raw (ix<<21|iy) id whose ranges are stripes.
    Vectorized numpy; 21 rounds of the classic xy->d bit transform."""
    c = np.asarray(cell_id, dtype=np.int64)
    x = (c >> _SHIFT).astype(np.int64)           # ix + 2^20 (non-negative)
    y = (c & ((1 << _SHIFT) - 1)).astype(np.int64)
    d = np.zeros_like(x)
    s = np.int64(1 << (_HILBERT_ORDER - 1))
    while s > 0:
        rx = ((x & s) > 0).astype(np.int64)
        ry = ((y & s) > 0).astype(np.int64)
        d += s * s * ((3 * rx) ^ ry)
        # rotate quadrant: reflect when rx==1, swap when ry==0
        refl = ry == 0
        xr = np.where(rx == 1, s - 1 - x, x)
        yr = np.where(rx == 1, s - 1 - y, y)
        x, y = np.where(refl, yr, x), np.where(refl, xr, y)
        s >>= 1
    return d


def hilbert_cell(key):
    """Inverse of :func:`hilbert_key` -> cell id(s) (d -> xy transform)."""
    d = np.asarray(key, dtype=np.int64)
    x = np.zeros_like(d)
    y = np.zeros_like(d)
    t = d.copy()
    s = np.int64(1)
    while s < (1 << _HILBERT_ORDER):
        rx = (t // 2) & 1
        ry = (t ^ rx) & 1
        # rotate back
        xr = np.where(rx == 1, s - 1 - x, x)
        yr = np.where(rx == 1, s - 1 - y, y)
        swap = ry == 0
        x, y = np.where(swap, yr, x), np.where(swap, xr, y)
        x = x + s * rx
        y = y + s * ry
        t //= 4
        s <<= 1
    return (x << _SHIFT) | y
