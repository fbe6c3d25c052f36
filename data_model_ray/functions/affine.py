"""Affine / grid planning pure functions (SURVEY.md 2.8 F-group).

Re-derivations (not ports) of the reference's grid math:

- ``affine_from_bounds`` — rasterio ``transform.from_bounds`` semantics
  (/root/reference/src/eopf_geozarr/conversion/geozarr.py:649-653): the
  6-tuple (a, b, c, d, e, f) mapping pixel (col, row) -> (x, y) with
  row-down orientation.
- ``gdal_geotransform`` — GDAL ordering (c, a, b, f, d, e) string, the
  grid-mapping ``GeoTransform`` attr
  (/root/reference/src/eopf_geozarr/conversion/geozarr.py:1340-1370).
- ``linspace_coords`` — endpoint=False cell-center coordinate generation
  (/root/reference/src/eopf_geozarr/conversion/geozarr.py:889-892).
- ``calculate_overview_levels`` — COG /2 ladder until min dimension
  (/root/reference/src/eopf_geozarr/conversion/geozarr.py:797-838).
- ``aligned_chunk_size`` — largest divisor <= target, falling back to the
  best near-divisor >= 51% of target
  (/root/reference/src/eopf_geozarr/conversion/utils.py:161-189).
- ``shard_dimension`` — largest multiple of chunk <= dim
  (/root/reference/src/eopf_geozarr/conversion/geozarr.py:1651-1688).
- ``zoom_level_for_width`` — ceil(log2(w / tile)) zoom
  (/root/reference/src/eopf_geozarr/s2_optimization/s2_multiscale.py:681-684).
"""

from __future__ import annotations

import math

import numpy as np

Affine = tuple[float, float, float, float, float, float]


def affine_from_bounds(
    west: float, south: float, east: float, north: float, width: int, height: int
) -> Affine:
    """(a, b, c, d, e, f): x = a*col + b*row + c; y = d*col + e*row + f."""
    if width <= 0 or height <= 0:
        raise ValueError("width/height must be positive")
    xres = (east - west) / width
    yres = (south - north) / height  # negative: row 0 is the north edge
    return (xres, 0.0, west, 0.0, yres, north)


def apply_affine(t: Affine, col, row):
    """Pixel (col, row) [corner convention] -> (x, y). Vectorized."""
    a, b, c, d, e, f = t
    col = np.asarray(col, dtype=np.float64)
    row = np.asarray(row, dtype=np.float64)
    return a * col + b * row + c, d * col + e * row + f


def invert_affine(t: Affine) -> Affine:
    a, b, c, d, e, f = t
    det = a * e - b * d
    if det == 0:
        raise ValueError("singular affine transform")
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    return (ia, ib, ic, id_, ie, if_)


def xy_to_pixel(t: Affine, x, y) -> tuple[np.ndarray, np.ndarray]:
    """(x, y) -> (col, row) float pixel coords (floor for the index)."""
    inv = invert_affine(t)
    fx, fy = apply_affine(inv, x, y)
    return fx, fy


def gdal_geotransform(t: Affine) -> str:
    """rasterio-order affine -> GDAL GeoTransform string (c a b f d e)."""
    a, b, c, d, e, f = t
    return " ".join(repr(float(v)) for v in (c, a, b, f, d, e))


def linspace_coords(start: float, stop: float, num: int) -> np.ndarray:
    """Cell-center coords: endpoint-exclusive linspace + half-step offset."""
    edges = np.linspace(start, stop, num, endpoint=False)
    step = (stop - start) / num
    return edges + step / 2.0


def calculate_overview_levels(
    width: int, height: int, *, min_dimension: int = 256
) -> list[dict]:
    """COG /2 ladder: [{level, factor, width, height}] while min dim holds."""
    out = []
    factor = 2
    level = 1
    while min(width // factor, height // factor) >= min_dimension:
        out.append(
            {
                "level": level,
                "factor": factor,
                "width": width // factor,
                "height": height // factor,
            }
        )
        factor *= 2
        level += 1
    return out


def aligned_chunk_size(dimension: int, target: int) -> int:
    """Largest divisor of `dimension` <= target; else best size >= 51% of
    target minimizing the remainder; else target."""
    if dimension <= 0:
        raise ValueError("dimension must be positive")
    if dimension <= target:
        return dimension
    for size in range(target, 0, -1):
        if dimension % size == 0:
            if size >= max(1, int(target * 0.51)):
                return size
            break
    best, best_rem = target, dimension % target
    for size in range(target, max(1, int(target * 0.51)) - 1, -1):
        rem = dimension % size
        if rem == 0:
            return size
        if rem > best_rem:  # larger final chunk = less waste
            best, best_rem = size, rem
    return best


def shard_dimension(dimension: int, chunk: int) -> int:
    """Largest multiple of `chunk` <= dimension (>= chunk)."""
    if chunk <= 0:
        raise ValueError("chunk must be positive")
    return max(chunk, (dimension // chunk) * chunk)


def zoom_level_for_width(width: int, tile_size: int = 256) -> int:
    """ceil(log2(width / tile_size)), floored at 0."""
    if width <= tile_size:
        return 0
    return int(math.ceil(math.log2(width / tile_size)))
