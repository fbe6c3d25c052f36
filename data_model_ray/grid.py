"""Deterministic hierarchical spatial grids (from scratch, vectorized numpy).

Two grid systems, both pure functions of (lat, lon) so that cell assignment
per url is exactly reproducible across runs/retries/resume — the engine's
analogue of the reference's affine-georeferencing invariants
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:1340-1370 grid-mapping
/ GeoTransform derivation) and its /2 overview ladder
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:797-838
``calculate_overview_levels``).

1. **GeoCell** — an aperture-4 equirectangular quadtree. Resolution ``r``
   divides the world into ``4*2^r`` lat rows x ``8*2^r`` lon cols; each cell
   has exactly 4 children, so a rollup from resolution ``r`` to ``r-1`` is a
   2x2 block aggregate — bit-exact parity with the reference's
   ``downsample_2d_array`` /2 block semantics
   (/root/reference/src/eopf_geozarr/conversion/utils.py:70-132). The engine's
   ``h3_7`` column is GeoCell resolution 7 (~0.35 deg cells). H3 proper is an
   icosahedral aperture-7 grid; we deliberately use an aperture-4 grid built
   from scratch because (a) its parent/child/neighbor relations are exact and
   hand-checkable, and (b) factor-4 rollups mirror the reference's COG /2
   pyramid exactly. Cell id layout (uint64):
   ``res(8 bits) << 56 | i_lat(28 bits) << 28 | i_lon(28 bits)``.

2. **S2 cells** — genuine S2 geometry cell ids (public algorithm: cube-face
   projection, quadratic s-t transform, Hilbert curve position; see
   s2geometry.io docs). Level-12 ids populate the ``s2_12`` column. Supports
   encode, parent, level extraction, and center decode for round-trip tests.

All functions are vectorized over numpy arrays and safe to call inside
``map_batches`` on zero-copy Arrow column buffers.
"""

from __future__ import annotations

import numpy as np

U64 = np.uint64
_MASK28 = U64((1 << 28) - 1)

# ---------------------------------------------------------------------------
# GeoCell: aperture-4 equirectangular quadtree
# ---------------------------------------------------------------------------

GEOCELL_MAX_RES = 15
#: default "h3_7"-column resolution (SURVEY.md section 2.8)
H3_RES = 7
#: default "s2_12"-column level
S2_LEVEL = 12


def _geocell_dims(res: int) -> tuple[int, int]:
    return 4 << res, 8 << res  # (n_lat_rows, n_lon_cols)


def geocell_encode(lat: np.ndarray, lon: np.ndarray, res: int = H3_RES) -> np.ndarray:
    """(lat, lon) degrees -> GeoCell id at resolution `res` (uint64)."""
    if not 0 <= res <= GEOCELL_MAX_RES:
        raise ValueError(f"resolution {res} out of range [0, {GEOCELL_MAX_RES}]")
    n_lat, n_lon = _geocell_dims(res)
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    i_lat = np.clip(
        np.floor((lat + 90.0) / 180.0 * n_lat).astype(np.int64), 0, n_lat - 1
    )
    # wrap lon into [-180, 180)
    lon_w = np.mod(lon + 180.0, 360.0)
    i_lon = np.clip(np.floor(lon_w / 360.0 * n_lon).astype(np.int64), 0, n_lon - 1)
    return (
        (U64(res) << U64(56))
        | (i_lat.astype(U64) << U64(28))
        | i_lon.astype(U64)
    )


def geocell_res(cell: np.ndarray) -> np.ndarray:
    return (np.asarray(cell, dtype=U64) >> U64(56)).astype(np.int64)


def geocell_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = np.asarray(cell, dtype=U64)
    return (
        ((cell >> U64(28)) & _MASK28).astype(np.int64),
        (cell & _MASK28).astype(np.int64),
    )


def geocell_parent(cell: np.ndarray, parent_res: int) -> np.ndarray:
    """Parent cell at coarser resolution (each step merges a 2x2 block)."""
    cell = np.asarray(cell, dtype=U64)
    res = geocell_res(cell)
    if np.any(res < parent_res):
        raise ValueError("parent_res must be <= cell resolution")
    shift = (res - parent_res).astype(U64)
    i_lat, i_lon = geocell_ij(cell)
    return (
        (U64(parent_res) << U64(56))
        | ((i_lat.astype(U64) >> shift) << U64(28))
        | (i_lon.astype(U64) >> shift)
    )


def geocell_children(cell: int) -> np.ndarray:
    """The 4 children of one cell (scalar helper for tests/planning)."""
    cell = U64(cell)
    res = int(cell >> U64(56))
    if res >= GEOCELL_MAX_RES:
        raise ValueError("cell already at max resolution")
    i_lat = int((cell >> U64(28)) & _MASK28) << 1
    i_lon = int(cell & _MASK28) << 1
    out = []
    for di in (0, 1):
        for dj in (0, 1):
            out.append(
                (U64(res + 1) << U64(56))
                | (U64(i_lat + di) << U64(28))
                | U64(i_lon + dj)
            )
    return np.array(out, dtype=U64)


def geocell_neighbors(cell: int, k: int = 1) -> np.ndarray:
    """k-ring neighbors (including the cell itself) with lon wraparound.

    Latitude is clamped at the poles (no polar wrap) — documented grid
    assumption for the kNN ring expansion (SURVEY.md section 7.4).
    """
    cell = U64(cell)
    res = int(cell >> U64(56))
    n_lat, n_lon = _geocell_dims(res)
    i_lat = int((cell >> U64(28)) & _MASK28)
    i_lon = int(cell & _MASK28)
    out = []
    for di in range(-k, k + 1):
        ni = i_lat + di
        if ni < 0 or ni >= n_lat:
            continue
        for dj in range(-k, k + 1):
            nj = (i_lon + dj) % n_lon
            out.append((U64(res) << U64(56)) | (U64(ni) << U64(28)) | U64(nj))
    return np.unique(np.array(out, dtype=U64))


def geocell_center(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Cell center (lat, lon) degrees — the rasterize-stage centroid."""
    cell = np.asarray(cell, dtype=U64)
    res = geocell_res(cell)
    i_lat, i_lon = geocell_ij(cell)
    n_lat = (4 << res).astype(np.float64)
    n_lon = (8 << res).astype(np.float64)
    lat = (i_lat + 0.5) / n_lat * 180.0 - 90.0
    lon = (i_lon + 0.5) / n_lon * 360.0 - 180.0
    return lat, lon


def geocell_bounds(cell: int) -> tuple[float, float, float, float]:
    """(lat_min, lon_min, lat_max, lon_max) of one cell."""
    res = int(U64(cell) >> U64(56))
    n_lat, n_lon = _geocell_dims(res)
    i_lat = int((U64(cell) >> U64(28)) & _MASK28)
    i_lon = int(U64(cell) & _MASK28)
    dlat, dlon = 180.0 / n_lat, 360.0 / n_lon
    return (
        -90.0 + i_lat * dlat,
        -180.0 + i_lon * dlon,
        -90.0 + (i_lat + 1) * dlat,
        -180.0 + (i_lon + 1) * dlon,
    )


# ---------------------------------------------------------------------------
# S2 cell ids (public algorithm; see s2geometry.io/devguide/s2cell_hierarchy)
# ---------------------------------------------------------------------------

_S2_MAX_LEVEL = 30
# Hilbert curve traversal tables (public s2geometry constants).
_SWAP = 0x1
_INVERT = 0x2
# kIJtoPos[orientation][ij] where ij = (i_bit << 1) | j_bit
_IJ_TO_POS = np.array(
    [
        [0, 1, 3, 2],  # canonical
        [0, 3, 1, 2],  # axes swapped
        [2, 3, 1, 0],  # bits inverted
        [2, 1, 3, 0],  # swapped & inverted
    ],
    dtype=np.int64,
).reshape(-1)
# kPosToIJ[orientation][pos] -> ij
_POS_TO_IJ = np.array(
    [
        [0, 1, 3, 2],
        [0, 2, 3, 1],
        [3, 2, 0, 1],
        [3, 1, 0, 2],
    ],
    dtype=np.int64,
).reshape(-1)
_POS_TO_ORIENT = np.array([_SWAP, 0, 0, _INVERT + _SWAP], dtype=np.int64)


def _latlon_to_xyz(lat: np.ndarray, lon: np.ndarray):
    phi = np.radians(np.asarray(lat, dtype=np.float64))
    theta = np.radians(np.asarray(lon, dtype=np.float64))
    cos_phi = np.cos(phi)
    return cos_phi * np.cos(theta), cos_phi * np.sin(theta), np.sin(phi)


def _xyz_to_face_uv(x, y, z):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    major = np.choose(face, [x, y, z])
    face = np.where(major < 0, face + 3, face)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ufn, vfn) in enumerate(
        [
            (lambda: y / x, lambda: z / x),       # face 0 (+x)
            (lambda: -x / y, lambda: z / y),      # face 1 (+y)
            (lambda: -x / z, lambda: -y / z),     # face 2 (+z)
            (lambda: z / x, lambda: y / x),       # face 3 (-x)
            (lambda: z / y, lambda: -x / y),      # face 4 (-y)
            (lambda: -y / z, lambda: -x / z),     # face 5 (-z)
        ]
    ):
        m = face == f
        if np.any(m):
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ufn(), u)
                v = np.where(m, vfn(), v)
    return face.astype(np.int64), u, v


def _uv_to_st(u: np.ndarray) -> np.ndarray:
    # quadratic projection (the s2geometry default); np.where evaluates both
    # branches so silence the out-of-domain sqrt of the untaken one
    with np.errstate(invalid="ignore"):
        return np.where(
            u >= 0, 0.5 * np.sqrt(1.0 + 3.0 * u), 1.0 - 0.5 * np.sqrt(1.0 - 3.0 * u)
        )


def _st_to_uv(s: np.ndarray) -> np.ndarray:
    return np.where(
        s >= 0.5,
        (1.0 / 3.0) * (4.0 * s * s - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s)),
    )


def _st_to_ij(s: np.ndarray) -> np.ndarray:
    return np.clip(
        np.floor(s * float(1 << _S2_MAX_LEVEL)).astype(np.int64),
        0,
        (1 << _S2_MAX_LEVEL) - 1,
    )


def s2_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Leaf (level-30) S2 cell id from face + 30-bit (i, j). Vectorized."""
    face = np.asarray(face, dtype=np.int64)
    i = np.asarray(i, dtype=np.int64)
    j = np.asarray(j, dtype=np.int64)
    orient = face & _SWAP
    pos = np.zeros(face.shape, dtype=U64)
    for k in range(_S2_MAX_LEVEL - 1, -1, -1):
        ij = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orient * 4 + ij]
        pos = (pos << U64(2)) | p.astype(U64)
        orient = orient ^ _POS_TO_ORIENT[p]
    with np.errstate(over="ignore"):
        return (face.astype(U64) << U64(61)) | (pos << U64(1)) | U64(1)


def s2_encode(lat: np.ndarray, lon: np.ndarray, level: int = S2_LEVEL) -> np.ndarray:
    """(lat, lon) degrees -> S2 cell id at `level` (uint64)."""
    x, y, z = _latlon_to_xyz(lat, lon)
    face, u, v = _xyz_to_face_uv(x, y, z)
    i = _st_to_ij(_uv_to_st(u))
    j = _st_to_ij(_uv_to_st(v))
    leaf = s2_from_face_ij(face, i, j)
    return s2_parent(leaf, level)


def s2_parent(cell: np.ndarray, level: int) -> np.ndarray:
    """Ancestor cell at `level` (must be <= the cell's level)."""
    cell = np.asarray(cell, dtype=U64)
    new_lsb = U64(1) << U64(2 * (_S2_MAX_LEVEL - level))
    with np.errstate(over="ignore"):
        return (cell & (~(new_lsb - U64(1)) & U64(0xFFFFFFFFFFFFFFFF))) | new_lsb


def s2_level(cell: np.ndarray) -> np.ndarray:
    """Level of each cell id (position of lowest set bit / 2)."""
    cell = np.asarray(cell, dtype=U64)
    lsb_pos = np.zeros(cell.shape, dtype=np.int64)
    c = cell.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = (U64(1) << U64(shift)) - U64(1)
        zero_low = (c & mask) == 0
        lsb_pos = np.where(zero_low, lsb_pos + shift, lsb_pos)
        c = np.where(zero_low, c >> U64(shift), c)
    return _S2_MAX_LEVEL - lsb_pos // 2


def s2_to_face_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Face + leaf (i, j) of the cell's center-ish leaf (for decode tests)."""
    cell = np.asarray(cell, dtype=U64)
    face = (cell >> U64(61)).astype(np.int64)
    pos = (cell >> U64(1)) & U64((1 << 60) - 1)
    orient = face & _SWAP
    i = np.zeros(cell.shape, dtype=np.int64)
    j = np.zeros(cell.shape, dtype=np.int64)
    for k in range(_S2_MAX_LEVEL - 1, -1, -1):
        p = ((pos >> U64(2 * k)) & U64(3)).astype(np.int64)
        ij = _POS_TO_IJ[orient * 4 + p]
        i |= (ij >> 1) << k
        j |= (ij & 1) << k
        orient = orient ^ _POS_TO_ORIENT[p]
    return face, i, j


def s2_center_latlon(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Approximate cell center (lat, lon) for round-trip tests."""
    face, i, j = s2_to_face_ij(cell)
    s = (i.astype(np.float64) + 0.5) / float(1 << _S2_MAX_LEVEL)
    t = (j.astype(np.float64) + 0.5) / float(1 << _S2_MAX_LEVEL)
    u = _st_to_uv(s)
    v = _st_to_uv(t)
    ones = np.ones_like(u)
    # face -> xyz from (u, v): inverse of _xyz_to_face_uv (public s2 tables)
    xyz_by_face = [
        (ones, u, v),
        (-u, ones, v),
        (-u, -v, ones),
        (-ones, -v, -u),
        (v, -ones, -u),
        (v, u, -ones),
    ]
    x = np.empty_like(u)
    y = np.empty_like(u)
    z = np.empty_like(u)
    for f, (xf, yf, zf) in enumerate(xyz_by_face):
        m = face == f
        x = np.where(m, xf, x)
        y = np.where(m, yf, y)
        z = np.where(m, zf, z)
    lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
    lon = np.degrees(np.arctan2(y, x))
    return lat, lon
