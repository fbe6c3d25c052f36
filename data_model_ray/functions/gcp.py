"""Scattered ground-control-point (GCP) transforms — from scratch.

The reference reprojects Sentinel-1 GRD imagery whose georeferencing is not
an affine grid but a sparse grid of ground control points mapping image
(row, col) to geographic (lon, lat, height); it builds rasterio GCPs and
lets GDAL fit an interpolating transform
(/root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:111-138,
360-373). This module re-derives the two standard public fits GDAL offers:

- polynomial order 1..3 least-squares (GDAL's default GCP path): a
  Vandermonde fit on coordinates normalized to [-1, 1] for conditioning;
- thin-plate spline (Duchon 1976; Bookstein 1989, IEEE TPAMI 11(6)):
  exact at the control points, r^2 log r radial basis + affine part,
  solved as the standard (K+3)x(K+3) dense system.

Both are vectorized over numpy arrays and picklable, so a fitted
transformer broadcasts once (``ray.put``) and evaluates per batch inside
``map_batches`` — see ``stages/reproject.py:GcpReproject``.
"""

from __future__ import annotations

import numpy as np


def _poly_terms(order: int) -> list[tuple[int, int]]:
    """(i, j) exponent pairs of x^i * y^j with i + j <= order."""
    return [(i, j) for s in range(order + 1) for i in range(s + 1) for j in (s - i,)]


def _design(u: np.ndarray, v: np.ndarray, order: int) -> np.ndarray:
    terms = _poly_terms(order)
    return np.stack([u**i * v**j for i, j in terms], axis=1)


class PolyGCPTransformer:
    """GDAL-style polynomial GCP transform (order 1, 2 or 3).

    Fit: least squares of (x, y) on normalized (row, col) Vandermonde
    terms. Requires >= #terms control points (3 / 6 / 10). ``residual_rms``
    reports the fit quality, the analogue of GDAL's GCP fit error.
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        xs: np.ndarray,
        ys: np.ndarray,
        *,
        order: int = 2,
    ):
        if order not in (1, 2, 3):
            raise ValueError("order must be 1, 2 or 3")
        rows = np.asarray(rows, dtype=np.float64)
        cols = np.asarray(cols, dtype=np.float64)
        n_terms = len(_poly_terms(order))
        if len(rows) < n_terms:
            raise ValueError(f"order {order} needs >= {n_terms} GCPs, got {len(rows)}")
        self.order = order
        # normalize source coords to [-1, 1] for conditioning
        self._r0, self._rs = _norm_params(rows)
        self._c0, self._cs = _norm_params(cols)
        A = _design((rows - self._r0) / self._rs, (cols - self._c0) / self._cs, order)
        tgt = np.stack([np.asarray(xs, np.float64), np.asarray(ys, np.float64)], axis=1)
        coef, *_ = np.linalg.lstsq(A, tgt, rcond=None)
        self._coef = coef
        resid = A @ coef - tgt
        self.residual_rms = float(np.sqrt(np.mean(np.sum(resid**2, axis=1))))

    def transform(self, rows: np.ndarray, cols: np.ndarray):
        u = (np.asarray(rows, np.float64) - self._r0) / self._rs
        v = (np.asarray(cols, np.float64) - self._c0) / self._cs
        out = _design(u, v, self.order) @ self._coef
        return out[:, 0], out[:, 1]


class TPSGCPTransformer:
    """Thin-plate-spline GCP transform — exact at every control point.

    Standard formulation: f(p) = a0 + a1*u + a2*v + sum_k w_k * U(|p - p_k|)
    with U(r) = r^2 log r^2, solved for both target coordinates at once via
    the dense bordered system; a tiny ridge (``smooth``) regularizes
    duplicate/near-duplicate GCPs.
    """

    def __init__(
        self,
        rows: np.ndarray,
        cols: np.ndarray,
        xs: np.ndarray,
        ys: np.ndarray,
        *,
        smooth: float = 0.0,
    ):
        rows = np.asarray(rows, dtype=np.float64)
        cols = np.asarray(cols, dtype=np.float64)
        if len(rows) < 3:
            raise ValueError("TPS needs >= 3 GCPs")
        self._r0, self._rs = _norm_params(rows)
        self._c0, self._cs = _norm_params(cols)
        u = (rows - self._r0) / self._rs
        v = (cols - self._c0) / self._cs
        self._src = np.stack([u, v], axis=1)
        k = len(u)
        K = _tps_kernel(self._src, self._src) + smooth * np.eye(k)
        P = np.column_stack([np.ones(k), u, v])
        A = np.zeros((k + 3, k + 3))
        A[:k, :k] = K
        A[:k, k:] = P
        A[k:, :k] = P.T
        b = np.zeros((k + 3, 2))
        b[:k, 0] = np.asarray(xs, np.float64)
        b[:k, 1] = np.asarray(ys, np.float64)
        sol = np.linalg.solve(A, b)
        self._w = sol[:k]
        self._a = sol[k:]
        self.residual_rms = 0.0 if smooth == 0.0 else float(
            np.sqrt(np.mean(np.sum((K @ self._w + P @ self._a - b[:k]) ** 2, axis=1)))
        )

    def transform(self, rows: np.ndarray, cols: np.ndarray):
        u = (np.asarray(rows, np.float64) - self._r0) / self._rs
        v = (np.asarray(cols, np.float64) - self._c0) / self._cs
        pts = np.stack([u, v], axis=1)
        # chunk the N x K kernel so memory stays bounded for big batches
        out = np.empty((len(u), 2))
        step = max(1, 4_000_000 // max(len(self._src), 1))
        for s in range(0, len(u), step):
            sl = slice(s, min(s + step, len(u)))
            U = _tps_kernel(pts[sl], self._src)
            P = np.column_stack([np.ones(sl.stop - sl.start), u[sl], v[sl]])
            out[sl] = U @ self._w + P @ self._a
        return out[:, 0], out[:, 1]


def fit_gcp_transformer(
    rows: np.ndarray,
    cols: np.ndarray,
    xs: np.ndarray,
    ys: np.ndarray,
    *,
    method: str = "poly",
    order: int = 2,
    smooth: float = 0.0,
):
    """Factory mirroring the reference's 'build GCPs then pick a transform'
    step (sentinel1_reprojection.py:111-138)."""
    if method == "poly":
        return PolyGCPTransformer(rows, cols, xs, ys, order=order)
    if method == "tps":
        return TPSGCPTransformer(rows, cols, xs, ys, smooth=smooth)
    raise ValueError(f"unknown GCP method {method!r}")


def _norm_params(a: np.ndarray) -> tuple[float, float]:
    lo, hi = float(np.min(a)), float(np.max(a))
    scale = (hi - lo) / 2.0 or 1.0
    return (lo + hi) / 2.0, scale


def _tps_kernel(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """U(r) = r^2 log r^2 pairwise kernel (0 at r=0 by continuity)."""
    d2 = (
        np.sum(a**2, axis=1)[:, None]
        + np.sum(b**2, axis=1)[None, :]
        - 2.0 * (a @ b.T)
    )
    np.maximum(d2, 0.0, out=d2)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = d2 * np.log(d2)
    out[d2 == 0.0] = 0.0
    return out
