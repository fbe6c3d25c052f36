"""Spatial-analytics family over the geotagged pages corpus.

Six vector/raster analytics operators the reference's raster-pyramid
surface (``/root/reference/src/eopf_geozarr/conversion/geozarr.py:797-838``
overview ladder, ``:1340-1370`` grid-mapping derivation) does not cover but
any production geospatial corpus needs:

- ``distance_pairs``     — bounded-radius spatial self-join (pairs within R km)
- ``cell_counts``        — per-cell page density (the shared base aggregate)
- ``focal_stats``        — 3x3 focal (k-ring) smoothing of cell density
- ``hotspot_cells``      — Getis-Ord-Gi*-style hot-spot z-scores per cell
- ``idw_cells``          — inverse-distance-weighted interpolation at cell
                           centers from ring-1 pages (fixed-point weights)
- ``host_dispersion``    — per-host centroid + max-radius geographic spread

Ray-Data shapes (all stream; nothing materializes the corpus):

- Raw pages cross at most ONE exchange per operator, always pre-reduced:
  ``cell_counts``/``focal_stats``/``hotspot_cells``/``idw_cells`` exchange
  only grid-bounded per-block partials (<= 512*1024 res-7 cells, with a 9x
  ring fan-out on the *cell table*, never on pages); ``host_dispersion``
  exchanges slim (host, lat, lon) triples bucketed by host hash;
  ``distance_pairs`` replicates each point into its ring-1 cells (9x on a
  3-column table) exactly like ``stages.knn.knn_per_cell``.
- Global scalars (hot-spot moments) fold per-block partials into three
  numbers on the driver — the kmeans-centroid state bound, not a collect.

Cross-engine exactness discipline: every expression is mirrored
operand-for-operand by a DuckDB oracle (``data_model_ray/oracles.py``).
Transcendentals are avoided where a boundary comparison or rounding could
flip on a last-ulp difference: IDW weights use a *planar-degree* metric
(add/mul/div only -> IEEE-deterministic) quantized to integer units by an
explicit ``FLOOR(1e6 / (1 + d2))`` so weighted sums are int64-exact in any
accumulation order (the PageRank fixed-point discipline); hot-spot moments
are int64-exact sums; dispersion centroids quantize coordinates to integer
microdegrees with ``FLOOR(x*1e6 + 0.5)`` (fixture coordinates carry exactly
6 decimals, so no value sits on a rounding boundary). ``distance_pairs``
keeps the latitude-corrected equirectangular metric (cos enters the radius
comparison; a pair flips only within ~1 ulp of the radius boundary —
probability ~1e-13 per pair, documented like pages_knn's tie caveat).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..grid import H3_RES, geocell_encode
from ..sources.fs import sized_read_parquet
from ..stages.dedup import dedup_exact
from ..stages.extract import extract_batch
from ..stages.knn import EARTH_DEG, _equirect_dist2

U64 = np.uint64
_MASK28 = U64((1 << 28) - 1)
H3_BASE = U64(H3_RES) << U64(56)
N_LAT = 4 << H3_RES  # 512 rows at res 7
N_LON = 8 << H3_RES  # 1024 cols at res 7
#: IDW weight quantum: w = floor(1e6 / (1 + d2_deg)) — int64-exact sums
IDW_SCALE = 1_000_000.0
#: default distance-join radius; ring-1 candidacy is exhaustive for radii
#: up to one cell dimension (39.1 km lat; 39.1*cos(lat) km lon at res 7) —
#: beyond that the semantics are explicitly ring-1-bounded (oracle mirrors
#: the same candidacy, so parity holds at any radius)
RADIUS_KM = 25.0


def _nbuckets() -> int:
    """Session-adaptive exchange bucket count (the repo-wide
    empty-partition rule — see linkgraph._num_buckets)."""
    from .linkgraph import _num_buckets

    return _num_buckets()


def _points(pages_path: str, *, columns=("url", "lat", "lon"), host_prefix=None):
    """Deduped (one row per url) slim point table from the pages corpus.

    Duplicate urls carry byte-identical html (fixture invariant the WARC
    round-trip relies on), so any representative yields the same (lat, lon);
    dedup order_col is therefore immaterial — 'lat' keeps the exchange slim.
    """
    ds = sized_read_parquet(pages_path)
    cols = list(columns)

    def prep(b: pa.Table) -> pa.Table:
        if host_prefix is not None:
            b = b.filter(pc.starts_with(b["url"], pattern=host_prefix))
        b = extract_batch(b, verify_text=False)
        return b.select(cols)

    pts = ds.map_batches(prep, batch_format="pyarrow")
    return dedup_exact(pts, key="url", order_col="lat", num_buckets=_nbuckets())


def _cell_bucket(cells: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic int32 exchange bucket per cell id (splitmix mix so
    spatially consecutive ids spread over all buckets — the sort-partition
    coverage the empty-partition rule needs)."""
    from ..hashing import hash_stream

    return (
        hash_stream(np.asarray(cells, dtype=np.uint64), 37)
        % np.uint64(num_buckets)
    ).astype(np.int32)


def _bucket_cell_sum(ds, sum_cols: tuple):
    """Grid-bounded (cell, partial...) rows -> one bucketed exchange with a
    vectorized in-bucket Arrow combine: groups route on mixed int32 buckets
    (never raw cell keys), so every sort partition covers >= 1 key and the
    per-group UDF count stays at the bucket count."""
    num_buckets = _nbuckets()

    def tag(t: pa.Table) -> pa.Table:
        cells = t["cell"].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(_cell_bucket(cells, num_buckets)))

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("cell").aggregate([(c, "sum") for c in sum_cols])
        return g.rename_columns(["cell", *sum_cols])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
    )


def _rename(ds, mapping: dict):
    def fn(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(c, c) for c in t.column_names])

    return ds.map_batches(fn, batch_format="pyarrow")


def _cell_ij(cell: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    cell = cell.astype(U64)
    return (
        ((cell >> U64(28)) & _MASK28).astype(np.int64),
        (cell & _MASK28).astype(np.int64),
    )


def _wrap_deg(dlon: np.ndarray) -> np.ndarray:
    """Antimeridian-wrapped lon delta in degrees — branch-based.

    Deliberately NOT the ``% 360`` idiom: DuckDB's double-mod
    ``(x % 360 + 360) % 360`` round-trips through ``+360`` and can lose the
    last bit vs numpy's single floor-mod (measured: 165.99289735531914 vs
    ...917), which flips MAX/FLOOR decisions downstream. Coordinate deltas
    are already in (-360, 360), so one conditional +-360 — a single add/sub,
    IEEE-exact and branch-identical in SQL (CASE) — wraps losslessly.
    """
    return np.where(
        dlon > 180.0, dlon - 360.0, np.where(dlon < -180.0, dlon + 360.0, dlon)
    )


# ---------------------------------------------------------------------------
# per-cell density + focal statistics + hot spots
# ---------------------------------------------------------------------------


def cell_counts(pages_path: str):
    """Per-res-7-cell page counts: per-block ``np.unique`` partials, then
    one grid-bounded bucketed cell sum — raw pages never shuffle."""
    pts = _points(pages_path)

    def partial(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        uniq, cnt = np.unique(geocell_encode(lat, lon, H3_RES), return_counts=True)
        return pa.table(
            {"cell": pa.array(uniq), "n": pa.array(cnt.astype(np.int64))}
        )

    parts = pts.map_batches(partial, batch_format="pyarrow")
    return _rename(_bucket_cell_sum(parts, ("n",)), {"n": "pages"})


def focal_stats(pages_path: str):
    """3x3 focal (ring-1, self included) smoothing of per-cell page counts.

    Scatter-gather over the CELL table (grid-bounded, <= 512*1024 rows at
    res 7): each cell contributes its count to its 9-neighborhood targets
    (latitude clipped at the poles, longitude wrapped — exactly
    ``grid.geocell_neighbors`` semantics), one bucketed cell exchange folds
    contributions, and only cells that hold pages surface in the output.

    Output: (cell, pages, focal_pages, focal_cells, focal_mean) where
    focal_mean = focal_pages / focal_cells over *occupied* neighbors —
    int/int double division, exact on both engines.
    """
    return _focal_from_counts(cell_counts(pages_path), H3_RES)


def _focal_from_counts(counts, res: int):
    """Focal scatter-gather over a (cell, pages) table at resolution `res`
    (dims derive from the cell-id layout: 4*2^res lat rows x 8*2^res cols)."""
    n_lat = 4 << res
    n_lon = 8 << res
    base = U64(res) << U64(56)

    def scatter(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(U64)
        n = t["pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        i, j = _cell_ij(cell)
        cells_out = [cell]
        own_out = [n]
        fs_out = [np.zeros(len(n), dtype=np.int64)]
        fc_out = [np.zeros(len(n), dtype=np.int64)]
        for di in (-1, 0, 1):
            ti = i + di
            ok = (ti >= 0) & (ti < n_lat)
            for dj in (-1, 0, 1):
                tj = (j[ok] + dj) % n_lon
                tc = base | (ti[ok].astype(U64) << U64(28)) | tj.astype(U64)
                cells_out.append(tc)
                own_out.append(np.zeros(int(ok.sum()), dtype=np.int64))
                fs_out.append(n[ok])
                fc_out.append(np.ones(int(ok.sum()), dtype=np.int64))
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells_out)),
                "own": pa.array(np.concatenate(own_out)),
                "fsum": pa.array(np.concatenate(fs_out)),
                "fcnt": pa.array(np.concatenate(fc_out)),
            }
        )

    agg = _bucket_cell_sum(
        counts.map_batches(scatter, batch_format="pyarrow"),
        ("own", "fsum", "fcnt"),
    )
    agg = _rename(
        agg,
        {"own": "pages", "fsum": "focal_pages", "fcnt": "focal_cells"},
    )

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["pages"], 0))
        fp = t["focal_pages"].to_numpy(zero_copy_only=False).astype(np.float64)
        fc = t["focal_cells"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column("focal_mean", pa.array(fp / fc))

    return agg.map_batches(finish, batch_format="pyarrow")


def parent_counts(counts, res: int):
    """(cell, pages) at `res` -> parent (cell, pages) at `res-1`: the /2
    parent-cell rollup (i>>1, j>>1 — exactly 4 children per parent, the
    reference's overview-ladder block aggregate as a groupby shuffle)."""
    base = U64(res - 1) << U64(56)

    def roll(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(U64)
        n = t["pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        i, j = _cell_ij(cell)
        parent = base | ((i >> 1).astype(U64) << U64(28)) | (j >> 1).astype(U64)
        uniq, inv = np.unique(parent, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, n)
        return pa.table({"cell": pa.array(uniq), "n": pa.array(acc)})

    return _rename(
        _bucket_cell_sum(counts.map_batches(roll, batch_format="pyarrow"), ("n",)),
        {"n": "pages"},
    )


def focal_pyramid(pages_path: str, *, levels: tuple = (7, 6, 5)):
    """Multi-resolution focal statistics: per-cell counts at res 7 roll up
    the /2 parent ladder (``parent_counts``), and the 3x3 focal smoothing
    runs at EVERY requested level — the north-star "parent-cell rollups as
    groupby-aggregate shuffles" composed with raster analytics.

    Each level's cell table is grid-bounded, so the base counts materialize
    once (tiny) and every rollup/focal exchange is cell-bounded — the
    corpus is scanned exactly once regardless of level count. Output adds
    a ``res`` column; rows per level cover only occupied cells.
    """
    levels = tuple(sorted(levels, reverse=True))
    if levels[0] != H3_RES:
        raise ValueError(f"levels must start at the base res {H3_RES}")
    counts_at = {H3_RES: cell_counts(pages_path).materialize()}
    for r in range(H3_RES - 1, min(levels) - 1, -1):
        counts_at[r] = parent_counts(counts_at[r + 1], r + 1).materialize()

    out = None
    for r in levels:
        f = _focal_from_counts(counts_at[r], r)

        def add_res(t: pa.Table, _r=r) -> pa.Table:
            return t.append_column(
                "res", pa.array(np.full(t.num_rows, _r, dtype=np.int64))
            )

        f = f.map_batches(add_res, batch_format="pyarrow")
        out = f if out is None else out.union(f)
    return out


#: KDE kernel: integer weights w(d2) = round(1e6 * exp(-d2/2)) over the
#: 5x5 (k=2) neighborhood, precomputed ONCE and shared as literals with the
#: SQL oracle — the density sum is then int64-exact in any order (the
#: fixed-point discipline; exp never runs at query time on either engine)
KDE_K = 2
KDE_WEIGHTS = {
    d2: int(round(1_000_000 * float(np.exp(-d2 / 2.0))))
    for d2 in sorted({di * di + dj * dj for di in range(-2, 3) for dj in range(-2, 3)})
}


def kde_heatmap(pages_path: str):
    """Gaussian-kernel density estimate of page counts per occupied cell
    (a raster heatmap): kde = sum over the 5x5 neighborhood of
    count(neighbor) * KDE_WEIGHTS[di^2+dj^2], in 1e-6 page units.

    Same scatter-gather discipline as ``focal_stats`` (k=2 -> 25x fan-out
    on the grid-bounded cell table; raw pages never shuffle), integer
    weights make the exchange partials exact.
    """
    counts = cell_counts(pages_path)

    def scatter(t: pa.Table) -> pa.Table:
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(U64)
        n = t["pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        i, j = _cell_ij(cell)
        cells_out = [cell]
        own_out = [n]
        kde_out = [np.zeros(len(n), dtype=np.int64)]
        for di in range(-KDE_K, KDE_K + 1):
            ti = i + di
            ok = (ti >= 0) & (ti < N_LAT)
            for dj in range(-KDE_K, KDE_K + 1):
                w = KDE_WEIGHTS[di * di + dj * dj]
                tj = (j[ok] + dj) % N_LON
                cells_out.append(
                    H3_BASE | (ti[ok].astype(U64) << U64(28)) | tj.astype(U64)
                )
                own_out.append(np.zeros(int(ok.sum()), dtype=np.int64))
                kde_out.append(n[ok] * w)
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells_out)),
                "own": pa.array(np.concatenate(own_out)),
                "kde": pa.array(np.concatenate(kde_out)),
            }
        )

    agg = _bucket_cell_sum(
        counts.map_batches(scatter, batch_format="pyarrow"), ("own", "kde")
    )
    agg = _rename(agg, {"own": "pages"})

    def finish(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t["pages"], 0))

    return agg.map_batches(finish, batch_format="pyarrow")


def hotspot_cells(pages_path: str):
    """Getis-Ord-Gi*-style hot-spot z-score per occupied cell.

    z = (W_c - k_c*mu) / (S * sqrt((N*k_c - k_c^2) / (N - 1))) with
    W_c = focal_pages, k_c = focal_cells (occupied neighbors = the realized
    weight count), and mu / S the mean / population std of per-cell counts.
    All moment inputs (N, sum, sum of squares) are int64-exact, so mu/S and
    every z derive from the same doubles on both engines (sqrt is
    correctly-rounded IEEE); z rounds to 6dp. Degenerate denominators
    (N < 2, k_c = N, S = 0) yield z = 0.0 on both sides.

    The focal table is grid-bounded, so the three global moments fold from
    per-block partials into scalars on the driver (state-bound, no collect).
    """
    focal = focal_stats(pages_path).materialize()

    def moment_partial(t: pa.Table) -> pa.Table:
        p = t["pages"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "n": pa.array([len(p)], type=pa.int64()),
                "sp": pa.array([int(p.sum())], type=pa.int64()),
                "spp": pa.array([int((p * p).sum())], type=pa.int64()),
            }
        )

    mom = focal.map_batches(moment_partial, batch_format="pyarrow").to_pandas()
    # an empty corpus yields a schema-less frame (no blocks ever ran)
    if "n" not in mom.columns:
        mom = pd.DataFrame({"n": [0], "sp": [0], "spp": [0]})
    n = int(mom["n"].sum())
    sp = int(mom["sp"].sum())
    spp = int(mom["spp"].sum())
    nf = float(n)
    mu = float(sp) / nf if n else 0.0
    var = (float(spp) / nf - mu * mu) if n else 0.0
    s = float(np.sqrt(var)) if var > 0.0 else 0.0

    def zscore(t: pa.Table) -> pa.Table:
        w = t["focal_pages"].to_numpy(zero_copy_only=False).astype(np.float64)
        k = t["focal_cells"].to_numpy(zero_copy_only=False).astype(np.float64)
        num = w - k * mu
        with np.errstate(divide="ignore", invalid="ignore"):
            den = (
                s * np.sqrt((nf * k - k * k) / (nf - 1.0))
                if n > 1
                else np.zeros_like(k)
            )
            z = np.where(den > 0.0, num / den, 0.0)
        out = t.drop_columns(["focal_mean"])
        # half-away-from-zero = DuckDB ROUND semantics: the unquantized
        # ratio CAN land on an exact 6dp tie (num/den = (2k+1)/2e6), where
        # default half-to-even would flip parity (ADVICE r4)
        return out.append_column(
            "gi_z",
            pc.round(pa.array(z), ndigits=6, round_mode="half_towards_infinity"),
        )

    return focal.map_batches(zscore, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# IDW interpolation at cell centers
# ---------------------------------------------------------------------------


def idw_cells(pages_path: str, *, value_col: str = "text_len"):
    """Inverse-distance-weighted ``value_col`` estimate at each occupied
    cell's center, from all pages in the cell's ring-1 neighborhood.

    Fixed-point weights: w = floor(1e6 / (1 + d2)) with d2 the squared
    *planar-degree* delta (dlat^2 + wrapped_dlon^2 — add/mul only, no
    transcendental, so w is bit-identical across engines; at ring-1 spans
    the latitude-correction factor is locally constant, leaving weight
    *ratios* materially unchanged). Numerator sum(w * value) and
    denominator sum(w) are int64 (exact in any accumulation order; bound:
    w <= 1e6, so 1e6 * max_value * ring_pages must stay < 2^63 — ~9e12
    value-bytes per neighborhood, documented like substring_spans' packing
    bound). Pages scatter as pre-aggregated per-block partials keyed by
    target cell — the only exchange is grid-bounded.
    """
    pts = _points(pages_path, columns=("url", "lat", "lon", value_col))

    def scatter(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        val = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i, j = _cell_ij(geocell_encode(lat, lon, H3_RES))
        tc_all, w_all, wv_all, own_all = [], [], [], []
        for di in (-1, 0, 1):
            ti = i + di
            ok = (ti >= 0) & (ti < N_LAT)
            for dj in (-1, 0, 1):
                tj = (j[ok] + dj) % N_LON
                clat = (ti[ok] + 0.5) / 512.0 * 180.0 - 90.0
                clon = (tj + 0.5) / 1024.0 * 360.0 - 180.0
                dlat = lat[ok] - clat
                dlon = _wrap_deg(lon[ok] - clon)
                d2 = dlat * dlat + dlon * dlon
                w = np.floor(IDW_SCALE / (1.0 + d2)).astype(np.int64)
                tc_all.append(
                    H3_BASE | (ti[ok].astype(U64) << U64(28)) | tj.astype(U64)
                )
                w_all.append(w)
                wv_all.append(w * val[ok])
                own_all.append(
                    np.full(int(ok.sum()), 1 if di == 0 and dj == 0 else 0, np.int64)
                )
        tc = np.concatenate(tc_all)
        w = np.concatenate(w_all)
        wv = np.concatenate(wv_all)
        own = np.concatenate(own_all)
        # per-block pre-aggregation: the exchange carries cells, not pages
        uniq, inv = np.unique(tc, return_inverse=True)
        w_s = np.zeros(len(uniq), dtype=np.int64)
        wv_s = np.zeros(len(uniq), dtype=np.int64)
        own_s = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(w_s, inv, w)
        np.add.at(wv_s, inv, wv)
        np.add.at(own_s, inv, own)
        return pa.table(
            {
                "cell": pa.array(uniq),
                "own": pa.array(own_s),
                "w": pa.array(w_s),
                "wv": pa.array(wv_s),
            }
        )

    agg = _bucket_cell_sum(
        pts.map_batches(scatter, batch_format="pyarrow"), ("own", "w", "wv")
    )
    agg = _rename(agg, {"own": "pages"})

    def finish(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater(t["pages"], 0))
        wv = t["wv"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = t["w"].to_numpy(zero_copy_only=False).astype(np.float64)
        out = t.select(["cell", "pages"])
        return out.append_column("idw_value", pa.array(wv / w))

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# bounded-radius distance self-join
# ---------------------------------------------------------------------------


def distance_pairs(pages_path: str, *, radius_km: float = RADIUS_KM, host_prefix=None):
    """All page pairs within ``radius_km`` (url_a < url_b, each pair once).

    Ring-1 grid join (the knn_per_cell discipline): every point replicates
    into its 9-neighborhood cells as a candidate and stays a query only in
    its home cell; a pair (a, b) with a.url < b.url is emitted exactly once,
    from a's home-cell group (the ring relation is symmetric). Distance is
    the latitude-corrected equirectangular metric of ``stages.knn``
    (oracle-mirrored operand-for-operand; the radius comparison can flip
    only within ~1 ulp of the boundary — documented, like pages_knn's
    dist_km exclusion).
    """
    pts = _points(pages_path, host_prefix=host_prefix)
    r2 = radius_km * radius_km
    num_buckets = _nbuckets()

    def expand(t: pa.Table) -> pd.DataFrame:
        df = t.select(["url", "lat", "lon"]).to_pandas()
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        i, j = _cell_ij(geocell_encode(lat, lon, H3_RES))
        parts = []
        for di in (-1, 0, 1):
            ti = i + di
            ok = (ti >= 0) & (ti < N_LAT)
            for dj in (-1, 0, 1):
                tj = (j[ok] + dj) % N_LON
                part = df.loc[ok].copy()
                cells = H3_BASE | (ti[ok].astype(U64) << U64(28)) | tj.astype(U64)
                part["__cell"] = cells
                part["__is_query"] = di == 0 and dj == 0
                part["__b"] = _cell_bucket(cells, num_buckets)
                parts.append(part)
        return pd.concat(parts, ignore_index=True)

    def per_cell(group: pd.DataFrame) -> pd.DataFrame:
        q = group[group["__is_query"]]
        empty = pd.DataFrame({"url_a": pd.Series([], dtype=object),
                              "url_b": pd.Series([], dtype=object)})
        if q.empty:
            return empty
        c_lat = group["lat"].to_numpy()
        c_lon = group["lon"].to_numpy()
        c_url = group["url"].to_numpy()
        # factorize urls once: every query row is also a candidate row, so
        # integer codes order-isomorphic to the url strings compare the
        # whole pair matrix without Python string comparisons
        _, c_code = np.unique(c_url, return_inverse=True)
        is_q = group["__is_query"].to_numpy()
        q_lat = c_lat[is_q]
        q_lon = c_lon[is_q]
        q_url = c_url[is_q]
        q_code = c_code[is_q]
        out_a, out_b = [], []
        CHUNK = 512  # mega-cell memory guard (chunked pair matrix)
        for s in range(0, len(q), CHUNK):
            d2 = _equirect_dist2(
                q_lat[s : s + CHUNK, None],
                q_lon[s : s + CHUNK, None],
                c_lat[None, :],
                c_lon[None, :],
            )
            mask = (d2 <= r2) & (q_code[s : s + CHUNK, None] < c_code[None, :])
            qi, ci = np.nonzero(mask)
            out_a.append(q_url[s + qi])
            out_b.append(c_url[ci])
        if not out_a:
            return empty
        return pd.DataFrame(
            {"url_a": np.concatenate(out_a), "url_b": np.concatenate(out_b)}
        )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        # bucket routing (mixed int32, never raw cell keys — the repo-wide
        # empty-partition rule); every cell is whole within its bucket, so
        # the per-cell kernel runs unchanged
        outs = [
            per_cell(sub) for _, sub in group.groupby("__cell", sort=False)
        ]
        if not outs:
            return pd.DataFrame(
                {
                    "url_a": pd.Series([], dtype=object),
                    "url_b": pd.Series([], dtype=object),
                }
            )
        return pd.concat(outs, ignore_index=True)

    return (
        pts.map_batches(expand, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# per-granule coverage rollup
# ---------------------------------------------------------------------------


def granule_coverage(assigned):
    """Per-MGRS-granule coverage from the geoindexed pages Dataset
    (``flagship.pages_to_cells`` output): page count + distinct res-7
    cells per granule — the reference's per-granule manifest rollup
    re-expressed as a coverage aggregate.

    Shape: per-block Arrow ``group_by(mgrs, cell)`` distinct partials, one
    granule-x-cell-bounded exchange folds them globally, then a per-block
    mgrs fold and one granule-bounded sum — pages never shuffle.
    """

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t["mgrs"], ""))
        g = (
            t.select(["mgrs", "h3_7"])
            .group_by(["mgrs", "h3_7"])
            .aggregate([("h3_7", "count")])
        )
        return g.rename_columns(["mgrs", "cell", "n"])

    num_buckets = _nbuckets()

    def tag(t: pa.Table) -> pa.Table:
        cells = t["cell"].to_numpy(zero_copy_only=False)
        return t.append_column("__b", pa.array(_cell_bucket(cells, num_buckets)))

    def combine(t: pa.Table) -> pa.Table:
        # all copies of a (mgrs, cell) pair share the cell -> same bucket,
        # so the in-bucket distinct fold is globally exact
        g = t.group_by(["mgrs", "cell"]).aggregate([("n", "sum")])
        return g.rename_columns(["mgrs", "cell", "n"])

    pairs = (
        assigned.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
    )

    def fold(t: pa.Table) -> pa.Table:
        g = t.group_by("mgrs").aggregate([("n", "sum"), ("cell", "count")])
        return g.rename_columns(["mgrs", "n_pages", "n_cells"])

    # final combine: granule-bounded (<= |granules| rows per block partial)
    # -> one concat block, no sort exchange (and so no empty partitions)
    return (
        pairs.map_batches(fold, batch_format="pyarrow")
        .repartition(1)
        .map_batches(
            lambda t: t.group_by("mgrs")
            .aggregate([("n_pages", "sum"), ("n_cells", "sum")])
            .rename_columns(["mgrs", "n_pages", "n_cells"]),
            batch_format="pyarrow",
        )
    )


# ---------------------------------------------------------------------------
# spatio-temporal: per-cell crawl churn between snapshot halves
# ---------------------------------------------------------------------------


def cell_churn(
    pages_path: str,
    *,
    cutoff: str = "2024-07-01 00:00:00",
    num_buckets: int | None = None,
):
    """Per-cell crawl churn between the old (< cutoff) and new (>= cutoff)
    snapshot halves: how many urls appeared / disappeared / persisted in
    each res-7 cell — the spatial composition of ``urlops.snapshot_diff``.

    Shape: per-block Arrow ``group_by(url)`` pre-folds presence bits (and
    the url's lat/lon — identical across duplicates by the byte-identical
    fixture invariant), ONE url-hash-bucketed exchange ORs the bits
    globally, then per-bucket cell-count partials feed a final grid-bounded
    ``groupby(cell).sum``. Page payloads never shuffle; the first exchange
    carries one slim row per distinct url per block.
    """
    from ..stages.text import fingerprint64

    if num_buckets is None:
        num_buckets = _nbuckets()
    ds = sized_read_parquet(pages_path)
    cut = np.datetime64(cutoff.replace(" ", "T"), "us")

    def prep(b: pa.Table) -> pa.Table:
        b = extract_batch(b, verify_text=False)
        ts = b["warc_ts"].to_numpy(zero_copy_only=False)
        bits = pa.table(
            {
                "url": b["url"],
                "old": pa.array((ts < cut).astype(np.int8)),
                "new": pa.array((ts >= cut).astype(np.int8)),
                "lat": b["lat"],
                "lon": b["lon"],
            }
        )
        part = bits.group_by("url").aggregate(
            [("old", "max"), ("new", "max"), ("lat", "min"), ("lon", "min")]
        )
        bkt = (fingerprint64(part["url"]) % np.uint64(num_buckets)).astype(np.int32)
        return part.append_column("__b", pa.array(bkt))

    def per_bucket(t: pa.Table) -> pa.Table:
        # global per-url OR of the block partials (urls co-located by hash)
        merged = t.group_by("url").aggregate(
            [("old_max", "max"), ("new_max", "max"), ("lat_min", "min"), ("lon_min", "min")]
        )
        old = merged["old_max_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        new = merged["new_max_max"].to_numpy(zero_copy_only=False).astype(np.int64)
        lat = merged["lat_min_min"].to_numpy(zero_copy_only=False)
        lon = merged["lon_min_min"].to_numpy(zero_copy_only=False)
        cell = geocell_encode(lat, lon, H3_RES)
        uniq, inv = np.unique(cell, return_inverse=True)
        added = np.zeros(len(uniq), dtype=np.int64)
        removed = np.zeros(len(uniq), dtype=np.int64)
        stable = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(added, inv, new * (1 - old))
        np.add.at(removed, inv, old * (1 - new))
        np.add.at(stable, inv, old * new)
        return pa.table(
            {
                "cell": pa.array(uniq),
                "added": pa.array(added),
                "removed": pa.array(removed),
                "stable": pa.array(stable),
            }
        )

    folded = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
    return _bucket_cell_sum(folded, ("added", "removed", "stable"))


# ---------------------------------------------------------------------------
# vector -> raster: admin-polygon burn over the full grid
# ---------------------------------------------------------------------------


def admin_raster_burn(*, level: int = 1, num_blocks: int = 32):
    """Burn the admin polygons into the res-7 grid (vector -> raster).

    One output row per grid cell whose CENTER lies inside some level-`level`
    polygon: (cell, admin_id), min-id tie-break — the rasterization leg the
    reference's raster-only pyramid lacks (zonal_stats is the vector leg;
    this is its raster twin, usable for raster-path zonal joins).

    Ray shape: the 512-row grid generates distributed (``ray.data.range``
    over the lat rows, each block expanding to its 1024 columns), polygons
    broadcast once via ``ray.put`` and build the bbox-prefiltered
    ``PolygonIndex`` once per actor — no exchange at all; output is
    polygon-area-bounded.
    """
    import ray
    import ray.data as rd

    from .. import fixtures
    from ..functions.pip import PolygonIndex

    ref = ray.put(fixtures.admin_polygons())

    class Burn:
        def __init__(self):
            self.idx = PolygonIndex(ray.get(ref))

        def __call__(self, t: pa.Table) -> pa.Table:
            rows = t["id"].to_numpy(zero_copy_only=False).astype(np.int64)
            i = np.repeat(rows, N_LON)
            j = np.tile(np.arange(N_LON, dtype=np.int64), len(rows))
            lat = (i + 0.5) / 512.0 * 180.0 - 90.0
            lon = (j + 0.5) / 1024.0 * 360.0 - 180.0
            aid = self.idx.assign(lon, lat, level)
            keep = aid >= 0
            cell = H3_BASE | (i[keep].astype(U64) << U64(28)) | j[keep].astype(U64)
            return pa.table(
                {"cell": pa.array(cell), "admin_id": pa.array(aid[keep])}
            )

    ds = rd.range(N_LAT, override_num_blocks=num_blocks)
    return ds.map_batches(Burn, batch_format="pyarrow", concurrency=(1, 4))


# ---------------------------------------------------------------------------
# spatially range-partitioned store + bbox query (prune at the read)
# ---------------------------------------------------------------------------

#: lat-band partition width: i_lat >> 4 -> 32 bands of 16 grid rows each
BAND_SHIFT = 4
#: default bbox (lat0, lat1, lon0, lon1) — covers part of fixture region 0
DEFAULT_BBOX = (40.0, 43.0, -120.0, -117.0)


def _bands_for_lat_range(lat0: float, lat1: float, band_shift: int = BAND_SHIFT):
    """Partition bands whose grid rows can contain lats in [lat0, lat1].

    Uses the same floor encode as ``grid.geocell_encode`` so the prune is
    conservative-correct: floor is monotone, so every point with
    lat in [lat0, lat1] lands in a band within [band(lat0), band(lat1)].
    """
    i = np.clip(
        np.floor((np.array([lat0, lat1]) + 90.0) / 180.0 * N_LAT).astype(np.int64),
        0,
        N_LAT - 1,
    )
    return list(range(int(i[0]) >> band_shift, (int(i[1]) >> band_shift) + 1))


def build_cell_store(
    pages_path: str, out_dir: str, *, band_shift: int = BAND_SHIFT
) -> dict:
    """Build (or resume) a spatially RANGE-partitioned point store.

    The deduped (url, lat, lon, text_len) points write as one parquet
    partition per latitude band (``i_lat >> band_shift`` — a prefix of the
    grid index, i.e. GeoCell-id range partitioning) through the lineage
    layer (``state.lineage.resumable_write``): completed bands skip on
    re-run, a deleted/corrupted band rebuilds alone, and every partition
    carries a fingerprinted record. This is the spatial analogue of the
    inverted index's term-hash buckets — the partition key is a range
    prefix instead of a hash so RANGE predicates prune at the directory
    level (``bbox_query``).
    """
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    from ..state.lineage import resumable_write

    files = (
        sorted(_glob.glob(os.path.join(pages_path, "*.parquet")))
        if os.path.isdir(pages_path)
        else [pages_path]
    )
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    # bytes bound too (like the hostgraph store): equal-row-count content
    # changes must invalidate, or bbox_query reuses stale bands (ADVICE r4)
    n_bytes = sum(os.path.getsize(f) for f in files)
    fp = f"cellstore:v1:rows={n_rows}:bytes={n_bytes}:shift={band_shift}"

    pts = _points(pages_path, columns=("url", "lat", "lon", "text_len"))

    def tag(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        i, _ = _cell_ij(geocell_encode(lat, lon, H3_RES))
        return t.append_column(
            "band", pa.array((i >> band_shift).astype(np.int32))
        )

    return resumable_write(
        pts.map_batches(tag, batch_format="pyarrow"),
        out_dir,
        partition_col="band",
        fingerprint=fp,
    )


def bbox_query(
    pages_path: str,
    *,
    bbox: tuple[float, float, float, float] = DEFAULT_BBOX,
    out_dir: str | None = None,
    band_shift: int = BAND_SHIFT,
    rebuild: bool = True,
):
    """Points inside a lat/lon bbox — opening ONLY the store partitions
    whose lat band intersects the range (partition pruning at the read;
    the lon predicate then filters inside the pruned stream).

    With 32 bands, a city-scale bbox opens 1-2 of them regardless of
    corpus size. ``rebuild=False`` skips the resumable build (the store
    must exist) — used by tests to prove reads never touch pruned bands.
    """
    import glob as _glob
    import hashlib
    import os

    import ray.data as rd

    lat0, lat1, lon0, lon1 = bbox
    if out_dir is None:
        tag = hashlib.sha256(pages_path.encode()).hexdigest()[:12]
        out_dir = f"/tmp/data_model_ray_cellstore/{tag}"
    os.makedirs(out_dir, exist_ok=True)
    if rebuild:
        build_cell_store(pages_path, out_dir, band_shift=band_shift)
    paths = [
        p
        for b in _bands_for_lat_range(lat0, lat1, band_shift)
        for p in _glob.glob(os.path.join(out_dir, f"part={b}", "data.parquet"))
    ]
    if not paths:
        return pa.table(
            {
                "url": pa.array([], pa.string()),
                "lat": pa.array([], pa.float64()),
                "lon": pa.array([], pa.float64()),
            }
        )
    ds = rd.read_parquet(sorted(paths), columns=["url", "lat", "lon"])

    def clip(t: pa.Table) -> pa.Table:
        lat = t["lat"]
        lon = t["lon"]
        keep = pc.and_(
            pc.and_(pc.greater_equal(lat, lat0), pc.less_equal(lat, lat1)),
            pc.and_(pc.greater_equal(lon, lon0), pc.less_equal(lon, lon1)),
        )
        return t.filter(keep)

    return ds.map_batches(clip, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-host geographic dispersion
# ---------------------------------------------------------------------------


def host_dispersion(pages_path: str, *, num_buckets: int | None = None):
    """Per-host page count, centroid, and max-radius geographic spread.

    Centroids average integer-microdegree coordinates (``floor(x*1e6+0.5)``
    — fixture coordinates carry exactly 6 decimals, so the +0.5-floor is an
    exact decimal round on both engines and the sums are int64-exact in any
    order). One host-hash-bucketed exchange of slim (host, lat, lon)
    triples; each bucket computes centroid and max squared planar-degree
    deviation vectorized (radius_km = sqrt(max_d2) * EARTH_DEG — sqrt/mul
    are IEEE-deterministic).
    """
    if num_buckets is None:
        # hosts are dense small ints, so plain modulo covers every bucket
        # value; cap at half the host universe so no bucket is key-less
        num_buckets = min(_nbuckets(), 512)
    pts = _points(pages_path)

    def prep(t: pa.Table) -> pa.Table:
        host = pc.cast(
            pc.struct_field(
                pc.extract_regex(t["url"], r"^https://host(?P<h>[0-9]+)\."), "h"
            ),
            pa.int64(),
        )
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        h = host.to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "host": host,
                "lat": t["lat"],
                "lon": t["lon"],
                "latq": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
                "lonq": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
                "__b": pa.array((h % num_buckets).astype(np.int32)),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        order = np.argsort(df["host"].to_numpy(), kind="stable")
        host = df["host"].to_numpy()[order]
        lat = df["lat"].to_numpy()[order]
        lon = df["lon"].to_numpy()[order]
        latq = df["latq"].to_numpy()[order]
        lonq = df["lonq"].to_numpy()[order]
        uniq, start = np.unique(host, return_index=True)
        seg = np.zeros(len(host), dtype=np.int64)
        seg[start[1:]] = 1
        seg = np.cumsum(seg)
        n = np.bincount(seg).astype(np.int64)
        slat = np.zeros(len(uniq), dtype=np.int64)
        slon = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(slat, seg, latq)
        np.add.at(slon, seg, lonq)
        lat_c = slat.astype(np.float64) / n.astype(np.float64) / 1e6
        lon_c = slon.astype(np.float64) / n.astype(np.float64) / 1e6
        dlat = lat - lat_c[seg]
        dlon = _wrap_deg(lon - lon_c[seg])
        d2 = dlat * dlat + dlon * dlon
        maxd2 = np.zeros(len(uniq), dtype=np.float64)
        np.maximum.at(maxd2, seg, d2)
        return pd.DataFrame(
            {
                "host": uniq,
                "n_pages": n,
                "lat_c": lat_c,
                "lon_c": lon_c,
                "radius_km": np.sqrt(maxd2) * EARTH_DEG,
            }
        )

    return (
        pts.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Multi-CRS reprojection query (F13 in-pipeline)
# ---------------------------------------------------------------------------


def utm_zone_stats(pages_path: str, *, num_buckets: int | None = None):
    """Per-UTM-zone page stats over the multi-CRS subset — the query that
    exercises F13 reprojection IN the pipeline (r4 verdict directive 7).

    The engine positions ``geo.utm`` pages by running the from-scratch
    Krüger inverse inside the extract kernel (stages/extract.py
    ``_apply_utm_override``); the DuckDB oracle reads the geo.position twin
    directly — hash parity therefore proves the reprojection round-trips to
    the exact source doubles. Distinct-url counting rides the standard
    local-dedup -> url-hash bucket exchange; per-zone partials (min/max are
    dup-invariant) fold in one bounded task (<= 60 zones).
    """
    from ..stages.extract import UTM_PATTERN, extract_batch
    from ..stages.text import fingerprint64

    nb = num_buckets or _nbuckets()
    ds = sized_read_parquet(pages_path, columns=["url", "html"])

    def prep(t: pa.Table) -> pa.Table:
        html = pc.cast(t["html"], pa.string())
        utm = pc.extract_regex(html, UTM_PATTERN)
        zone_arr = pc.struct_field(utm, "zone")
        valid = pc.is_valid(zone_arr)
        ext = extract_batch(t, verify_text=False)
        keep = pa.table(
            {
                "url": t["url"],
                "zone": pc.cast(pc.fill_null(zone_arr, "0"), pa.int64()),
                "lat": ext["lat"],
                "lon": ext["lon"],
            }
        ).filter(valid)
        # local dedup: duplicate urls carry byte-identical html, so any
        # representative has identical (zone, lat, lon)
        df = keep.to_pandas().drop_duplicates("url")
        b = (fingerprint64(pa.array(df["url"])) % np.uint64(nb)).astype(np.int32)
        return pa.Table.from_pandas(df.assign(__b=b), preserve_index=False)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("url")
        agg = g.groupby("zone", sort=False).agg(
            n_urls=("url", "size"),
            lat_min=("lat", "min"),
            lat_max=("lat", "max"),
            lon_min=("lon", "min"),
            lon_max=("lon", "max"),
        )
        return agg.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        agg = df.groupby("zone", sort=True).agg(
            n_urls=("n_urls", "sum"),
            lat_min=("lat_min", "min"),
            lat_max=("lat_max", "max"),
            lon_min=("lon_min", "min"),
            lon_max=("lon_max", "max"),
        )
        out = agg.reset_index()
        out["zone"] = out["zone"].astype(np.int64)
        out["n_urls"] = out["n_urls"].astype(np.int64)
        return out

    return (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------
# per-cell language histogram (crawl-product quality member, oracled)
# ---------------------------------------------------------------------------

#: closed language-member vocabulary (fixtures.LANGS + the catch-all)
LANG_MEMBERS = ("en", "de", "fr", "es", "zh", "ru", "ja")


def cell_lang_histogram(pages_path: str):
    """Per-res-7-cell language histogram over deduped pages — the
    measurement behind the crawl-product store's ``quality/langdist``
    member (functions/product.py), exposed as an oracled query.

    Per-block crosstab partials (|cells-in-block| x 8 ints), then one
    grid-bounded bucketed cell sum — raw pages never shuffle."""
    pts = _points(pages_path, columns=("url", "lat", "lon", "lang"))
    cols = tuple(f"lang_{c}" for c in (*LANG_MEMBERS, "other"))

    def partial(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(
            {
                "cell": geocell_encode(lat, lon, H3_RES),
                "lang": t["lang"].to_pandas(),
            }
        )
        known = df["lang"].isin(LANG_MEMBERS)
        df.loc[~known, "lang"] = "other"
        ct = (
            df.groupby(["cell", "lang"], sort=False, observed=True)
            .size()
            .unstack(fill_value=0)
        )
        ct = ct.reindex(columns=[*LANG_MEMBERS, "other"], fill_value=0)
        ct.columns = list(cols)
        return pa.Table.from_pandas(ct.reset_index(), preserve_index=False)

    return _bucket_cell_sum(pts.map_batches(partial, batch_format="pyarrow"), cols)


# ---------------------------------------------------------------------------
# per-admin-polygon rollup (zonal aggregate over the PIP assignment)
# ---------------------------------------------------------------------------


def admin_rollup(pages_path: str):
    """Per-admin-l0-polygon rollup over deduped pages: page count + exact
    mean text length (the zonal aggregate a tile consumer reads next to
    the PIP assignment; -1 = ocean/no polygon). Per-block partials are
    polygon-bounded (<= |polygons|+1 rows each); sums stay int64 so the
    single mean division is bit-identical across engines."""
    import ray

    from .. import fixtures
    from ..stages.enrich import make_enrich_fn

    granules_ref = ray.put(fixtures.mgrs_granules())
    admin_ref = ray.put(fixtures.admin_polygons())
    enrich = make_enrich_fn(granules_ref, admin_ref, verify_text=False)

    ds = sized_read_parquet(pages_path)
    enriched = ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
    deduped = dedup_exact(
        enriched, key="url", order_col="warc_ts", num_buckets=_nbuckets()
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "admin_l0": t["admin_l0"].to_numpy(zero_copy_only=False).astype(np.int64),
                "tl": t["text_len"].to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        g = df.groupby("admin_l0", sort=False)["tl"]
        return g.agg(n="size", s="sum").reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("admin_l0", sort=True)[["n", "s"]].sum()
        n = g["n"].to_numpy(np.int64)
        s = g["s"].to_numpy(np.int64)
        mean = pc.round(
            pa.array(s.astype(np.float64) / n.astype(np.float64)),
            ndigits=6,
            round_mode="half_towards_infinity",
        ).to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "admin_l0": g.index.to_numpy(np.int64),
                "pages": n,
                "mean_text_len": mean,
            }
        )

    return (
        deduped.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


# ---------------------------------------------------------------------------
# nearest MGRS granule per occupied cell
# ---------------------------------------------------------------------------


def cell_nearest_granule(pages_path: str):
    """Nearest MGRS granule (by bbox centroid) for every occupied res-7
    cell — the assignment a tile consumer needs when a cell falls OUTSIDE
    all granule footprints. Metric is the planar-degree d2 with the
    branch-based lon wrap (add/sub/mul only -> IEEE-exact, oracle mirrors
    operand-for-operand); ties break to the min mgrs code (granules are
    pre-sorted, argmin keeps the first). The granule table broadcasts via
    ``ray.put``; the cell side is grid-bounded."""
    import ray

    from .. import fixtures
    from ..grid import geocell_center

    g = fixtures.mgrs_granules().to_pandas().sort_values("mgrs", kind="mergesort")
    glat = ((g["ymin"].to_numpy() + g["ymax"].to_numpy()) / 2.0).astype(np.float64)
    glon = ((g["xmin"].to_numpy() + g["xmax"].to_numpy()) / 2.0).astype(np.float64)
    gref = ray.put((g["mgrs"].to_numpy(), glat, glon))

    cells = cell_counts(pages_path)

    def nearest(t: pa.Table) -> pa.Table:
        mgrs, gla, glo = ray.get(gref)
        cell = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        lat, lon = geocell_center(cell)
        dlat = lat[:, None] - gla[None, :]
        dlon = _wrap_deg(lon[:, None] - glo[None, :])
        d2 = dlat * dlat + dlon * dlon
        best = np.argmin(d2, axis=1)  # first occurrence = min-mgrs tie-break
        return pa.table(
            {
                "cell": pa.array(cell),
                "nearest_mgrs": pa.array(mgrs[best]),
                "d2_deg": pa.array(d2[np.arange(len(cell)), best]),
            }
        )

    return cells.map_batches(nearest, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-cell crawl freshness (fetch-recency bounds)
# ---------------------------------------------------------------------------


def cell_freshness(pages_path: str):
    """Per-cell crawl freshness: deduped (latest-wins) page count plus the
    oldest and newest fetch timestamps — the recency surface a recrawl
    scheduler reads per tile. Per-block partials (one row per cell per
    block), one grid-bounded bucketed exchange with vectorized min/max/sum
    combine."""
    ds = sized_read_parquet(pages_path)
    nb = _nbuckets()

    def prep(b: pa.Table) -> pa.Table:
        b = extract_batch(b, verify_text=False)
        return b.select(["url", "warc_ts", "lat", "lon"])

    pts = dedup_exact(
        ds.map_batches(prep, batch_format="pyarrow"),
        key="url",
        order_col="warc_ts",
        num_buckets=nb,
    )

    def partial(t: pa.Table) -> pa.Table:
        lat = t["lat"].to_numpy(zero_copy_only=False)
        lon = t["lon"].to_numpy(zero_copy_only=False)
        cells = geocell_encode(lat, lon, H3_RES)
        g = (
            pa.table({"cell": pa.array(cells), "warc_ts": t["warc_ts"]})
            .group_by("cell", use_threads=False)
            .aggregate([("warc_ts", "count"), ("warc_ts", "min"), ("warc_ts", "max")])
        )
        g = g.rename_columns(["cell", "n_pages", "ts_min", "ts_max"])
        return g.append_column(
            "__b", pa.array(_cell_bucket(g["cell"].to_numpy(zero_copy_only=False), nb))
        )

    def combine(t: pa.Table) -> pa.Table:
        g = t.group_by("cell", use_threads=False).aggregate(
            [("n_pages", "sum"), ("ts_min", "min"), ("ts_max", "max")]
        )
        return g.rename_columns(["cell", "n_pages", "ts_min", "ts_max"])

    return (
        pts.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
    )
