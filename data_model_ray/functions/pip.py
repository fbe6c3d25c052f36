"""Point-in-polygon joins: rect index for MGRS granules, polygon index for admin.

The engine's analogue of the reference's per-granule spatial grouping (every
Sentinel product belongs to an MGRS granule;
/root/reference/docs/geozarr-minispec.md:493-535) and GCP-based
georeferencing joins
(/root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:20-138).

Both indexes are built ONCE (driver or actor ``__init__``), broadcast via
``ray.put``, and probed per batch with vectorized numpy — the
broadcast-small-side join pattern (no shuffle). Assignment rules are
deterministic:

- granule: lexicographically smallest matching ``mgrs`` code (granules
  overlap ~4.9 km as real MGRS does);
- admin polygon: smallest ``admin_id`` among matches, per level.
"""

from __future__ import annotations

import numpy as np


class RectIndex:
    """Axis-aligned rectangle index with deterministic lexicographic tie-break.

    With ~hundreds of rects a dense candidate matrix per batch is cheap;
    the sort-once + argmax-first-match trick keeps probing fully vectorized.
    """

    def __init__(
        self,
        codes: np.ndarray,
        xmin: np.ndarray,
        ymin: np.ndarray,
        xmax: np.ndarray,
        ymax: np.ndarray,
    ):
        order = np.argsort(codes, kind="stable")
        self.codes = np.asarray(codes)[order]
        self.xmin = np.asarray(xmin, dtype=np.float64)[order]
        self.ymin = np.asarray(ymin, dtype=np.float64)[order]
        self.xmax = np.asarray(xmax, dtype=np.float64)[order]
        self.ymax = np.asarray(ymax, dtype=np.float64)[order]

    def assign(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        """First (lexicographic) containing rect per point; '' if none.

        Containment is half-open: xmin <= lon < xmax, ymin <= lat < ymax.
        """
        lon = np.asarray(lon, dtype=np.float64)[:, None]
        lat = np.asarray(lat, dtype=np.float64)[:, None]
        inside = (
            (lon >= self.xmin)
            & (lon < self.xmax)
            & (lat >= self.ymin)
            & (lat < self.ymax)
        )
        first = inside.argmax(axis=1)
        out = self.codes[first].copy()
        out[~inside.any(axis=1)] = ""
        return out

    def match_counts(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        lon = np.asarray(lon, dtype=np.float64)[:, None]
        lat = np.asarray(lat, dtype=np.float64)[:, None]
        return (
            (lon >= self.xmin)
            & (lon < self.xmax)
            & (lat >= self.ymin)
            & (lat < self.ymax)
        ).sum(axis=1)


def points_in_polygon(
    px: np.ndarray, py: np.ndarray, vx: np.ndarray, vy: np.ndarray
) -> np.ndarray:
    """Vectorized even-odd ray casting: points (px, py) vs one simple polygon.

    Loops over edges (6-12 for fixture polygons), vectorized over points.
    Points exactly on an edge may land either side (standard ray-cast
    behavior) — fixture points are random doubles so this never matters
    deterministically: the same point always gets the same answer.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    n = len(vx)
    inside = np.zeros(px.shape, dtype=bool)
    j = n - 1
    for i in range(n):
        yi, yj = vy[i], vy[j]
        xi, xj = vx[i], vx[j]
        crosses = (yi > py) != (yj > py)
        with np.errstate(divide="ignore", invalid="ignore"):
            x_at = xi + (py - yi) * (xj - xi) / (yj - yi)
        inside ^= crosses & (px < x_at)
        j = i
    return inside


class PolygonIndex:
    """Bbox-prefiltered polygon PIP index (the reference's R-tree analogue).

    Build once from the ragged vertex layout of ``fixtures.admin_polygons``;
    probe per batch. Assignment = smallest id among containing polygons of
    the requested level ('-1' if none -> anti-join rows).
    """

    def __init__(self, poly: dict[str, np.ndarray]):
        self.ids = poly["admin_id"]
        self.levels = poly["level"]
        starts = np.zeros(len(self.ids) + 1, dtype=np.int64)
        np.cumsum(poly["n_vertices"], out=starts[1:])
        self.starts = starts
        self.vx = poly["vx"]
        self.vy = poly["vy"]
        # per-polygon bboxes for the prefilter
        self.bx0 = np.array(
            [self.vx[starts[i] : starts[i + 1]].min() for i in range(len(self.ids))]
        )
        self.bx1 = np.array(
            [self.vx[starts[i] : starts[i + 1]].max() for i in range(len(self.ids))]
        )
        self.by0 = np.array(
            [self.vy[starts[i] : starts[i + 1]].min() for i in range(len(self.ids))]
        )
        self.by1 = np.array(
            [self.vy[starts[i] : starts[i + 1]].max() for i in range(len(self.ids))]
        )
        # probe polygons in ascending id within level so the FIRST hit wins
        self.order_by_level = {
            lvl: np.flatnonzero(self.levels == lvl)[
                np.argsort(self.ids[self.levels == lvl], kind="stable")
            ]
            for lvl in np.unique(self.levels)
        }

    def assign(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        """Smallest containing admin_id at `level` per point; -1 if none."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.full(lon.shape, -1, dtype=np.int64)
        unresolved = np.ones(lon.shape, dtype=bool)
        for p in self.order_by_level[level]:
            if not unresolved.any():
                break
            cand = (
                unresolved
                & (lon >= self.bx0[p])
                & (lon <= self.bx1[p])
                & (lat >= self.by0[p])
                & (lat <= self.by1[p])
            )
            if not cand.any():
                continue
            s, e = self.starts[p], self.starts[p + 1]
            hit = points_in_polygon(lon[cand], lat[cand], self.vx[s:e], self.vy[s:e])
            idx = np.flatnonzero(cand)[hit]
            out[idx] = self.ids[p]
            unresolved[idx] = False
        return out

    def contains_any(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        return self.assign(lon, lat, level) >= 0
