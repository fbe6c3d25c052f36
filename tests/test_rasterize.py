"""Raster <-> vector round-trip + TMS limits tests."""

import json

import numpy as np
import pyarrow as pa

from data_model_ray import grid
from data_model_ray.pipelines.rasterize import (
    level_affine,
    rasterize_level,
    rasterize_pyramid,
    tile_matrix_limits,
    vectorize_tiles,
)
from data_model_ray.functions.affine import apply_affine


def make_cells(res=7, n=300, seed=5):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(30, 50, n)
    lon = rng.uniform(-10, 25, n)
    cells = np.unique(grid.geocell_encode(lat, lon, res))
    return pa.table(
        {
            "cell": pa.array(cells),
            "pages": pa.array(np.arange(1, len(cells) + 1, dtype=np.int64)),
            "score_mean": pa.array(np.linspace(0, 1, len(cells))),
        }
    )


class TestRasterize:
    def test_roundtrip_bit_exact(self):
        t = make_cells()
        raster = rasterize_level(t)
        back = vectorize_tiles(raster)
        got = back.to_pandas().sort_values("cell").reset_index(drop=True)
        want = t.to_pandas().sort_values("cell").reset_index(drop=True)
        assert (got["cell"].to_numpy() == want["cell"].to_numpy()).all()
        assert (got["pages"].to_numpy() == want["pages"].to_numpy()).all()

    def test_pixel_bounds(self):
        raster = rasterize_level(make_cells(), tile_size=256)
        df = raster.to_pandas()
        assert df["px"].between(0, 255).all()
        assert df["py"].between(0, 255).all()

    def test_affine_georeference(self):
        # pixel center through the level affine == geocell center
        t = make_cells(res=5)
        raster = rasterize_level(t, tile_size=256)
        res = 5
        aff = level_affine(res)
        df = raster.to_pandas()
        col = df["tile_x"].to_numpy() * 256 + df["px"].to_numpy()
        row = df["tile_y"].to_numpy() * 256 + df["py"].to_numpy()
        x, y = apply_affine(aff, col + 0.5, row + 0.5)
        back = vectorize_tiles(raster)
        clat, clon = grid.geocell_center(
            back["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        np.testing.assert_allclose(x, clon, atol=1e-9)
        np.testing.assert_allclose(y, clat, atol=1e-9)

    def test_tile_limits(self):
        raster = rasterize_level(make_cells())
        lim = tile_matrix_limits(raster)
        assert lim["min_tile_col"] <= lim["max_tile_col"]
        assert lim["n_tiles"] >= 1

    def test_rasterize_pyramid_end_to_end(self, tmp_path):
        from data_model_ray.pipelines.pyramid import build_pyramid
        from data_model_ray.state.lineage import LineageLog

        base = make_cells(res=6, n=500)
        # build_pyramid needs the standard stat columns; reuse helper
        import tests.test_pyramid as tp

        cells = base["cell"].to_numpy(zero_copy_only=False)
        t = tp.make_level_table(cells, pages=np.ones(len(cells), dtype=np.int64))
        pyr_dir = str(tmp_path / "pyr")
        build_pyramid(t, pyr_dir, base_res=6, min_cells=4)
        out_dir = str(tmp_path / "tiles")
        manifest = rasterize_pyramid(out_dir, pyr_dir)
        assert manifest["crs"] == "EPSG:4326"
        levels = manifest["levels"]
        assert levels[0]["level"] == 6
        for lv in levels:
            assert "geotransform" in lv and lv["limits"]["n_tiles"] >= 1
        with open(f"{out_dir}/tms_manifest.json") as f:
            assert json.load(f) == manifest
        recs = LineageLog(out_dir).records()
        assert sum(r["rows_out"] for r in recs) == sum(l["cells"] for l in levels)

    def test_rasterize_pyramid_streaming_parity(self, ray_session, tmp_path):
        """streaming=True (Ray Data + resumable partitioned sink) writes the
        same tiles/rows as the driver-side path, and a rerun skips all."""
        import os

        import pyarrow.parquet as pq

        from data_model_ray.pipelines.pyramid import build_pyramid
        from data_model_ray.state.lineage import LineageLog

        import tests.test_pyramid as tp

        base = make_cells(res=6, n=500)
        cells = base["cell"].to_numpy(zero_copy_only=False)
        t = tp.make_level_table(cells, pages=np.ones(len(cells), dtype=np.int64))
        pyr_dir = str(tmp_path / "pyr")
        build_pyramid(t, pyr_dir, base_res=6, min_cells=4)

        drv_dir = str(tmp_path / "tiles_driver")
        stream_dir = str(tmp_path / "tiles_stream")
        m_drv = rasterize_pyramid(drv_dir, pyr_dir)
        m_stream = rasterize_pyramid(stream_dir, pyr_dir, streaming=True)
        assert m_drv["levels"] == m_stream["levels"]

        def tile_rows(d):
            out = {}
            for name in os.listdir(d):
                p = os.path.join(d, name, "data.parquet")
                if name.startswith("part=L") and os.path.exists(p):
                    out[name] = pq.read_table(p).num_rows
            return out

        drv = tile_rows(drv_dir)
        stream = tile_rows(stream_dir)
        assert drv == stream and len(drv) > 1

        # rerun resumes: every partition already valid -> no new writes
        before = LineageLog(stream_dir).records()
        rasterize_pyramid(stream_dir, pyr_dir, streaming=True)
        after = LineageLog(stream_dir).records()
        assert len(after) == len(before)
