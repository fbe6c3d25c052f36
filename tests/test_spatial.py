"""Independent (brute-force / closed-form) references for the
spatial-analytics family (pipelines/spatial.py).

The oracle parity lives in test_pages_oracles.py; these tests verify the
SEMANTICS against implementations that share no code with the engine
kernels: dense-grid convolution for focal stats, O(n^2) pair scans for the
distance join and IDW, and a pandas groupby for host dispersion.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from data_model_ray import fixtures
from data_model_ray.grid import H3_RES, geocell_encode
from data_model_ray.pipelines import spatial
from data_model_ray.stages.knn import EARTH_DEG, _equirect_dist2

N = 2_000


@pytest.fixture(scope="module")
def pages_path(ray_session):
    return fixtures.ensure_pages_parquet(N)


@pytest.fixture(scope="module")
def points(pages_path):
    """Deduped (url, lat, lon, text_len) reference frame via duckdb."""
    import duckdb

    return duckdb.sql(
        f"""
        SELECT url,
               CAST(regexp_extract(decode(html),
                 'geo\\.position" content="(-?[0-9.]+);(-?[0-9.]+)"', 1) AS DOUBLE) AS lat,
               CAST(regexp_extract(decode(html),
                 'geo\\.position" content="(-?[0-9.]+);(-?[0-9.]+)"', 2) AS DOUBLE) AS lon,
               CAST(length(MIN(text) ) AS BIGINT) AS text_len
        FROM read_parquet('{pages_path}/*.parquet')
        GROUP BY 1, 2, 3
        """
    ).df()


def _ring_targets(i, j):
    """(ti, tj) 9-neighborhood with lat clip + lon wrap (grid semantics)."""
    out = []
    for di in (-1, 0, 1):
        ti = i + di
        if ti < 0 or ti >= spatial.N_LAT:
            continue
        for dj in (-1, 0, 1):
            out.append((ti, (j + dj) % spatial.N_LON))
    return out


def test_wrap_deg_matches_mod_wrap():
    d = np.array([-359.9, -180.0001, -180.0, -0.5, 0.0, 0.5, 180.0, 180.0001, 359.9])
    got = spatial._wrap_deg(d)
    want = np.mod(d + 180.0, 360.0) - 180.0
    # same wrapped value up to the +-180 boundary convention; always in range
    assert np.all(np.abs(got) <= 180.0)
    assert np.allclose(np.cos(np.radians(got)), np.cos(np.radians(want)))
    assert np.allclose(np.abs(np.sin(np.radians(got))), np.abs(np.sin(np.radians(want))))


def test_focal_stats_matches_dense_convolution(pages_path, points):
    got = spatial.focal_stats(pages_path).to_pandas().sort_values("cell")
    cells = geocell_encode(points["lat"].to_numpy(), points["lon"].to_numpy(), H3_RES)
    uniq, cnt = np.unique(cells, return_counts=True)
    # dense grid + 3x3 sum with explicit clip/wrap
    dense = {}
    for c, n in zip(uniq, cnt):
        i = int((c >> np.uint64(28)) & np.uint64((1 << 28) - 1))
        j = int(c & np.uint64((1 << 28) - 1))
        dense[(i, j)] = int(n)
    rows = []
    for (i, j), n in dense.items():
        neigh = [dense.get(t) for t in _ring_targets(i, j)]
        present = [v for v in neigh if v is not None]
        rows.append(
            {
                "cell": int(spatial.H3_BASE | np.uint64(i) << np.uint64(28) | np.uint64(j)),
                "pages": n,
                "focal_pages": sum(present),
                "focal_cells": len(present),
            }
        )
    want = pd.DataFrame(rows).sort_values("cell")
    for col in ("pages", "focal_pages", "focal_cells"):
        np.testing.assert_array_equal(
            got[col].to_numpy(), want[col].to_numpy(), err_msg=col
        )
    np.testing.assert_allclose(
        got["focal_mean"].to_numpy(),
        want["focal_pages"].to_numpy() / want["focal_cells"].to_numpy(),
    )


def test_hotspot_zscores_standardize(pages_path):
    got = spatial.hotspot_cells(pages_path).to_pandas()
    p = got["pages"].to_numpy(np.float64)
    mu, s = p.mean(), p.std()
    n = len(p)
    k = got["focal_cells"].to_numpy(np.float64)
    expect = (got["focal_pages"].to_numpy(np.float64) - k * mu) / (
        s * np.sqrt((n * k - k * k) / (n - 1.0))
    )
    np.testing.assert_allclose(got["gi_z"].to_numpy(), expect, atol=1e-5)
    # a z-score field standardizes to ~0 mean and has both hot and cold cells
    assert abs(float(got["gi_z"].mean())) < 0.5
    assert (got["gi_z"] > 1.0).any() and (got["gi_z"] < -1.0).any()


def test_idw_matches_bruteforce(pages_path, points):
    got = (
        spatial.idw_cells(pages_path)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    lat = points["lat"].to_numpy()
    lon = points["lon"].to_numpy()
    val = points["text_len"].to_numpy(np.int64)
    cells = geocell_encode(lat, lon, H3_RES)
    i = ((cells >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(int)
    j = (cells & np.uint64((1 << 28) - 1)).astype(int)
    by_cell = {}
    for idx in range(len(lat)):
        by_cell.setdefault((i[idx], j[idx]), []).append(idx)
    rows = []
    for (ci, cj), members in by_cell.items():
        wsum = 0
        wv = 0
        # sources = pages in every cell whose ring contains (ci, cj) —
        # equivalently pages whose cell is in ring1 of (ci, cj)
        for (ti, tj) in _ring_targets(ci, cj):
            for idx in by_cell.get((ti, tj), ()):  # noqa: B020
                clat = (ci + 0.5) / 512.0 * 180.0 - 90.0
                clon = (cj + 0.5) / 1024.0 * 360.0 - 180.0
                dlat = lat[idx] - clat
                dlon = float(spatial._wrap_deg(np.array([lon[idx] - clon]))[0])
                d2 = dlat * dlat + dlon * dlon
                w = int(np.floor(spatial.IDW_SCALE / (1.0 + d2)))
                wsum += w
                wv += w * int(val[idx])
        rows.append(
            {
                "cell": int(
                    spatial.H3_BASE | np.uint64(ci) << np.uint64(28) | np.uint64(cj)
                ),
                "pages": len(members),
                "idw_value": wv / wsum,
            }
        )
    want = pd.DataFrame(rows).sort_values("cell").reset_index(drop=True)
    np.testing.assert_array_equal(got["pages"].to_numpy(), want["pages"].to_numpy())
    np.testing.assert_allclose(
        got["idw_value"].to_numpy(), want["idw_value"].to_numpy(), rtol=1e-12
    )


def test_distance_pairs_matches_bruteforce(pages_path, points):
    radius = 25.0
    got = spatial.distance_pairs(pages_path, radius_km=radius).to_pandas()
    got_set = set(zip(got["url_a"], got["url_b"]))
    assert len(got_set) == len(got), "pair emitted twice"
    lat = points["lat"].to_numpy()
    lon = points["lon"].to_numpy()
    url = points["url"].to_numpy()
    cells = geocell_encode(lat, lon, H3_RES)
    i = ((cells >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64)
    j = (cells & np.uint64((1 << 28) - 1)).astype(np.int64)
    d2 = _equirect_dist2(lat[:, None], lon[:, None], lat[None, :], lon[None, :])
    ring = (np.abs(i[:, None] - i[None, :]) <= 1) & (
        np.isin((j[:, None] - j[None, :]) % spatial.N_LON, (0, 1, spatial.N_LON - 1))
    )
    within = (d2 <= radius * radius) & ring & (url[:, None] < url[None, :])
    ai, bi = np.nonzero(within)
    want_set = set(zip(url[ai], url[bi]))
    assert got_set == want_set
    assert len(want_set) > 0, "fixture produced no pairs — radius too small"


def test_host_dispersion_matches_pandas(pages_path, points):
    got = (
        spatial.host_dispersion(pages_path)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    df = points.copy()
    df["host"] = df["url"].str.extract(r"^https://host([0-9]+)\.")[0].astype(np.int64)
    df["latq"] = np.floor(df["lat"] * 1e6 + 0.5).astype(np.int64)
    df["lonq"] = np.floor(df["lon"] * 1e6 + 0.5).astype(np.int64)
    cent = df.groupby("host").agg(
        n_pages=("url", "size"), slat=("latq", "sum"), slon=("lonq", "sum")
    )
    cent["lat_c"] = cent["slat"] / cent["n_pages"] / 1e6
    cent["lon_c"] = cent["slon"] / cent["n_pages"] / 1e6
    m = df.merge(cent, on="host")
    dlat = m["lat"] - m["lat_c"]
    dlon = spatial._wrap_deg((m["lon"] - m["lon_c"]).to_numpy())
    m["d2"] = dlat * dlat + dlon * dlon
    rad = np.sqrt(m.groupby("host")["d2"].max()) * EARTH_DEG
    want = cent.reset_index().sort_values("host")
    np.testing.assert_array_equal(
        got["n_pages"].to_numpy(), want["n_pages"].to_numpy()
    )
    np.testing.assert_allclose(got["lat_c"].to_numpy(), want["lat_c"].to_numpy())
    np.testing.assert_allclose(got["lon_c"].to_numpy(), want["lon_c"].to_numpy())
    np.testing.assert_allclose(
        got["radius_km"].to_numpy(), rad.sort_index().to_numpy()
    )


def test_cell_counts_total(pages_path, points):
    got = spatial.cell_counts(pages_path).to_pandas()
    assert int(got["pages"].sum()) == len(points)
    assert (got["pages"] > 0).all()


def test_admin_raster_burn_matches_bruteforce(ray_session):
    from data_model_ray.functions.pip import points_in_polygon

    got = (
        spatial.admin_raster_burn()
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    assert len(got) > 0
    poly = fixtures.admin_polygons()
    starts = np.zeros(len(poly["admin_id"]) + 1, dtype=np.int64)
    np.cumsum(poly["n_vertices"], out=starts[1:])
    cell = got["cell"].to_numpy().astype(np.uint64)
    i = ((cell >> np.uint64(28)) & np.uint64((1 << 28) - 1)).astype(np.int64)
    j = (cell & np.uint64((1 << 28) - 1)).astype(np.int64)
    lat = (i + 0.5) / 512.0 * 180.0 - 90.0
    lon = (j + 0.5) / 1024.0 * 360.0 - 180.0
    # brute force: min containing level-1 polygon id per burned center,
    # via the edge-loop reference kernel (no PolygonIndex involvement)
    best = np.full(len(cell), -1, dtype=np.int64)
    for p in range(len(poly["admin_id"])):
        if poly["level"][p] != 1:
            continue
        vx = poly["vx"][starts[p] : starts[p + 1]]
        vy = poly["vy"][starts[p] : starts[p + 1]]
        inside = points_in_polygon(lon, lat, vx, vy)
        aid = int(poly["admin_id"][p])
        hit = inside & ((best == -1) | (aid < best))
        best[hit] = aid
    np.testing.assert_array_equal(got["admin_id"].to_numpy(), best)
    # and completeness: no OTHER grid cell center is inside any polygon
    # (sample check on the polygons' bbox neighborhoods)
    full_i = np.repeat(np.arange(512), 1024)
    full_j = np.tile(np.arange(1024), 512)
    flat = full_i * 1024 + full_j
    burned = set((i * 1024 + j).tolist())
    flat_lat = (full_i + 0.5) / 512.0 * 180.0 - 90.0
    flat_lon = (full_j + 0.5) / 1024.0 * 360.0 - 180.0
    any_inside = np.zeros(len(flat), dtype=bool)
    for p in range(len(poly["admin_id"])):
        if poly["level"][p] != 1:
            continue
        vx = poly["vx"][starts[p] : starts[p + 1]]
        vy = poly["vy"][starts[p] : starts[p + 1]]
        bbox = (
            (flat_lon >= vx.min()) & (flat_lon <= vx.max())
            & (flat_lat >= vy.min()) & (flat_lat <= vy.max())
        )
        idx = np.nonzero(bbox)[0]
        any_inside[idx] |= points_in_polygon(flat_lon[idx], flat_lat[idx], vx, vy)
    assert burned == set(flat[any_inside].tolist())


def test_bbox_query_store(pages_path, points, tmp_path):
    import glob
    import os

    out_dir = str(tmp_path / "cellstore")
    bbox = (40.0, 43.0, -120.0, -117.0)
    lat0, lat1, lon0, lon1 = bbox
    got = (
        spatial.bbox_query(pages_path, bbox=bbox, out_dir=out_dir)
        .to_pandas()
        .sort_values(["url"])
        .reset_index(drop=True)
    )
    want = (
        points[
            (points["lat"] >= lat0) & (points["lat"] <= lat1)
            & (points["lon"] >= lon0) & (points["lon"] <= lon1)
        ][["url", "lat", "lon"]]
        .sort_values(["url"])
        .reset_index(drop=True)
    )
    assert len(want) > 0
    pd.testing.assert_frame_equal(got, want, check_exact=True)

    # partition pruning proof: corrupt a band OUTSIDE the bbox's lat range
    # and re-query without rebuild — the read never touches it
    parts = sorted(glob.glob(os.path.join(out_dir, "part=*")))
    hit = {f"part={b}" for b in spatial._bands_for_lat_range(lat0, lat1)}
    pruned = [p for p in parts if os.path.basename(p) not in hit]
    assert pruned, "expected at least one pruned band"
    with open(os.path.join(pruned[0], "data.parquet"), "wb") as f:
        f.write(b"not parquet")
    again = (
        spatial.bbox_query(pages_path, bbox=bbox, out_dir=out_dir, rebuild=False)
        .to_pandas()
        .sort_values(["url"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(again, want, check_exact=True)

    # lineage resume: the corrupted band (and ONLY it) rebuilds
    summary = spatial.build_cell_store(pages_path, out_dir)
    assert summary["partitions_written"] == 1
    assert summary["partitions_skipped"] == len(parts) - 1


def test_bands_for_lat_range_conservative():
    # every lat in the range encodes into one of the returned bands
    for lat0, lat1 in [(-90.0, 90.0), (40.0, 43.0), (-0.1, 0.1), (89.0, 90.0)]:
        bands = set(spatial._bands_for_lat_range(lat0, lat1))
        lats = np.linspace(lat0, lat1, 1000)
        i = np.clip(
            np.floor((lats + 90.0) / 180.0 * spatial.N_LAT).astype(np.int64),
            0, spatial.N_LAT - 1,
        )
        assert set((i >> spatial.BAND_SHIFT).tolist()) <= bands


def test_cell_churn_matches_reference(pages_path):
    import duckdb

    got = (
        spatial.cell_churn(pages_path)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    # independent reference: per-url presence bits via duckdb over the RAW
    # (pre-dedup) rows, then python-side cell fold
    pres = duckdb.sql(
        f"""
        SELECT CAST(regexp_extract(decode(html),
                 'geo\\.position" content="(-?[0-9.]+);(-?[0-9.]+)"', 1) AS DOUBLE) AS lat,
               CAST(regexp_extract(decode(html),
                 'geo\\.position" content="(-?[0-9.]+);(-?[0-9.]+)"', 2) AS DOUBLE) AS lon,
               MAX(CASE WHEN warc_ts < TIMESTAMP '2024-07-01 00:00:00' THEN 1 ELSE 0 END) AS o,
               MAX(CASE WHEN warc_ts >= TIMESTAMP '2024-07-01 00:00:00' THEN 1 ELSE 0 END) AS n
        FROM read_parquet('{pages_path}/*.parquet') GROUP BY url, lat, lon
        """
    ).df()
    cells = geocell_encode(pres["lat"].to_numpy(), pres["lon"].to_numpy(), H3_RES)
    o = pres["o"].to_numpy(np.int64)
    n = pres["n"].to_numpy(np.int64)
    uniq, inv = np.unique(cells, return_inverse=True)
    want = pd.DataFrame({"cell": uniq.astype(np.int64)})
    for name, v in [("added", n * (1 - o)), ("removed", o * (1 - n)), ("stable", o * n)]:
        acc = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(acc, inv, v)
        want[name] = acc
    pd.testing.assert_frame_equal(
        got[["cell", "added", "removed", "stable"]].astype("int64"),
        want.sort_values("cell").reset_index(drop=True),
        check_exact=True,
    )
    assert int(got["added"].sum()) > 0 and int(got["removed"].sum()) > 0


def test_kde_heatmap_matches_dense_reference(pages_path, points):
    got = (
        spatial.kde_heatmap(pages_path)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    cells = geocell_encode(points["lat"].to_numpy(), points["lon"].to_numpy(), H3_RES)
    uniq, cnt = np.unique(cells, return_counts=True)
    dense = {}
    for c, n in zip(uniq, cnt):
        i = int((c >> np.uint64(28)) & np.uint64((1 << 28) - 1))
        j = int(c & np.uint64((1 << 28) - 1))
        dense[(i, j)] = int(n)
    rows = []
    for (i, j), n in dense.items():
        kde = 0
        for di in range(-spatial.KDE_K, spatial.KDE_K + 1):
            si = i - di  # source cell contributing INTO (i, j) at offset di
            if si < 0 or si >= spatial.N_LAT:
                continue
            for dj in range(-spatial.KDE_K, spatial.KDE_K + 1):
                sj = (j - dj) % spatial.N_LON
                kde += dense.get((si, sj), 0) * spatial.KDE_WEIGHTS[di * di + dj * dj]
        rows.append(
            {
                "cell": int(spatial.H3_BASE | np.uint64(i) << np.uint64(28) | np.uint64(j)),
                "pages": n,
                "kde": kde,
            }
        )
    want = pd.DataFrame(rows).sort_values("cell").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["cell", "pages", "kde"]].astype("int64"), want, check_exact=True
    )
    # self-weight is the kernel max: kde >= pages * w(0)
    assert (got["kde"] >= got["pages"] * spatial.KDE_WEIGHTS[0]).all()


def test_spatial_ops_survive_empty_pages(ray_session, tmp_path):
    """Zero-row pages input degrades to well-formed empty results (the
    empty-input discipline of tests/test_empty_inputs.py, which cannot
    reach the pages family through queries())."""
    import pyarrow.parquet as pq

    src = fixtures.ensure_pages_parquet(1_000)
    import glob

    tab = pq.read_table(sorted(glob.glob(f"{src}/*.parquet"))[0])
    d = tmp_path / "empty_pages"
    d.mkdir()
    pq.write_table(tab.slice(0, 0), str(d / "part-0.parquet"))
    p = str(d)
    for name, fn in [
        ("cell_counts", lambda: spatial.cell_counts(p)),
        ("focal_stats", lambda: spatial.focal_stats(p)),
        ("hotspot_cells", lambda: spatial.hotspot_cells(p)),
        ("kde_heatmap", lambda: spatial.kde_heatmap(p)),
        ("focal_pyramid", lambda: spatial.focal_pyramid(p)),
        ("idw_cells", lambda: spatial.idw_cells(p)),
        ("distance_pairs", lambda: spatial.distance_pairs(p)),
        ("host_dispersion", lambda: spatial.host_dispersion(p)),
        ("cell_churn", lambda: spatial.cell_churn(p)),
        ("bbox_query", lambda: spatial.bbox_query(
            p, out_dir=str(tmp_path / "store"))),
    ]:
        out = fn()
        n = out.count() if hasattr(out, "count") and not hasattr(out, "shape") else len(out)
        assert n == 0, f"{name} returned {n} rows on empty input"


def test_focal_pyramid_levels_consistent(pages_path, points):
    got = spatial.focal_pyramid(pages_path).to_pandas()
    assert sorted(got["res"].unique()) == [5, 6, 7]
    # each level's total page mass equals the corpus (rollup conserves)
    for r, sub in got.groupby("res"):
        assert int(sub["pages"].sum()) == len(points), f"res {r} lost mass"
    # level-7 slice must equal focal_stats exactly
    want = (
        spatial.focal_stats(pages_path)
        .to_pandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    lvl7 = (
        got[got["res"] == 7]
        .drop(columns=["res"])
        .sort_values("cell")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        lvl7[want.columns.tolist()], want, check_exact=True, check_dtype=False
    )
    # coarser levels have no more cells than finer ones
    n_cells = got.groupby("res")["cell"].count()
    assert n_cells[5] <= n_cells[6] <= n_cells[7]
