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
        # padded per-polygon edge tables for the vectorized pair probe:
        # edge k of polygon p = (cur vertex k, prev vertex k-1), exactly the
        # (i, j) pairing of points_in_polygon; padding rows are degenerate
        # (yi == yj == 0) and can never register a crossing
        n_poly = len(self.ids)
        max_e = int(poly["n_vertices"].max()) if n_poly else 0
        self.exi = np.zeros((n_poly, max_e))
        self.eyi = np.zeros((n_poly, max_e))
        self.exj = np.zeros((n_poly, max_e))
        self.eyj = np.zeros((n_poly, max_e))
        for p in range(n_poly):
            s, e = starts[p], starts[p + 1]
            m = e - s
            self.exi[p, :m] = self.vx[s:e]
            self.eyi[p, :m] = self.vy[s:e]
            self.exj[p, :m] = np.roll(self.vx[s:e], 1)
            self.eyj[p, :m] = np.roll(self.vy[s:e], 1)

    def assign(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        """Smallest containing admin_id at `level` per point; -1 if none.

        One vectorized pass: the bbox prefilter is a (points x level-polys)
        matrix whose hits become candidate PAIRS; every pair's even-odd
        crossing parity is evaluated against the padded edge table in one
        broadcast expression (same operand order as points_in_polygon, so
        the doubles agree bitwise with the SQL oracle). Replaces the
        per-polygon loop (one flatnonzero per polygon dominated it:
        ~120 ms -> ~15 ms per 16k batch at 500 polygons)."""
        lon = np.asarray(lon, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        out = np.full(lon.shape, -1, dtype=np.int64)
        sel = self.order_by_level.get(level)
        if sel is None or len(lon) == 0:
            return out
        cand = (
            (lon[:, None] >= self.bx0[sel])
            & (lon[:, None] <= self.bx1[sel])
            & (lat[:, None] >= self.by0[sel])
            & (lat[:, None] <= self.by1[sel])
        )
        pt, pj = np.nonzero(cand)
        if len(pt) == 0:
            return out
        polys = sel[pj]
        px = lon[pt][:, None]
        py = lat[pt][:, None]
        exi, eyi = self.exi[polys], self.eyi[polys]
        exj, eyj = self.exj[polys], self.eyj[polys]
        with np.errstate(divide="ignore", invalid="ignore"):
            crosses = (eyi > py) != (eyj > py)
            x_at = exi + (py - eyi) * (exj - exi) / (eyj - eyi)
            inside = (crosses & (px < x_at)).sum(axis=1) % 2 == 1
        hit_pt = pt[inside]
        hit_id = self.ids[polys[inside]]
        order = np.lexsort((hit_id, hit_pt))
        hp, hi = hit_pt[order], hit_id[order]
        first = np.ones(len(hp), dtype=bool)
        first[1:] = hp[1:] != hp[:-1]
        out[hp[first]] = hi[first]
        return out

    def contains_any(self, lon: np.ndarray, lat: np.ndarray, level: int) -> np.ndarray:
        return self.assign(lon, lat, level) >= 0
