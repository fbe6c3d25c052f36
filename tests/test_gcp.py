"""GCP scattered-control-point transform tests.

Scenario mirrors the reference's Sentinel-1 case
(conversion/sentinel1_reprojection.py:111-138): a sparse GCP grid sampled
from the true sensor geometry, with every pixel interpolated. Here the
"true geometry" is the engine's own UTM transform, so interpolation error
is measurable exactly at off-grid points.
"""

import numpy as np
import pytest

from data_model_ray.functions.gcp import (
    PolyGCPTransformer,
    TPSGCPTransformer,
    fit_gcp_transformer,
)
from data_model_ray.functions.proj import utm_to_geodetic


def make_gcp_grid(n=11, zone=33):
    """GCPs on an n x n grid over a 100 km x 100 km UTM tile: image (row,
    col) maps linearly to (easting, northing), geo via the exact inverse."""
    rows, cols = np.meshgrid(np.linspace(0, 10980, n), np.linspace(0, 10980, n))
    rows, cols = rows.ravel(), cols.ravel()
    e = 300000.0 + cols * 10.0
    nn = 4600000.0 - rows * 10.0
    lat, lon = utm_to_geodetic(e, nn, zone)
    return {"row": rows, "col": cols, "x": lon, "y": lat}


def truth(rows, cols, zone=33):
    e = 300000.0 + np.asarray(cols) * 10.0
    n = 4600000.0 - np.asarray(rows) * 10.0
    lat, lon = utm_to_geodetic(e, n, zone)
    return lon, lat


class TestPoly:
    def test_exact_on_affine_geometry(self):
        # order-1 fit of an exactly-affine mapping reproduces it
        rng = np.random.default_rng(0)
        rows, cols = rng.uniform(0, 100, 20), rng.uniform(0, 100, 20)
        x, y = 3.0 + 0.5 * cols - 0.1 * rows, 7.0 - 0.25 * rows
        t = PolyGCPTransformer(rows, cols, x, y, order=1)
        qx, qy = t.transform(np.array([37.0]), np.array([81.0]))
        assert qx[0] == pytest.approx(3.0 + 0.5 * 81 - 0.1 * 37, abs=1e-9)
        assert qy[0] == pytest.approx(7.0 - 0.25 * 37, abs=1e-9)
        assert t.residual_rms < 1e-9

    def test_order2_interpolates_utm_grid_subpixel(self):
        g = make_gcp_grid()
        t = PolyGCPTransformer(g["row"], g["col"], g["x"], g["y"], order=2)
        rng = np.random.default_rng(1)
        qr, qc = rng.uniform(0, 10980, 500), rng.uniform(0, 10980, 500)
        lx, ly = t.transform(qr, qc)
        tx, ty = truth(qr, qc)
        # UTM inverse over 100 km is mildly nonlinear: order-2 lands ~3e-5
        # deg (~3 m) — subpixel for 10 m GRD pixels; order-3 ~2 cm
        assert np.abs(lx - tx).max() < 5e-5
        assert np.abs(ly - ty).max() < 5e-5
        t3 = PolyGCPTransformer(g["row"], g["col"], g["x"], g["y"], order=3)
        lx, ly = t3.transform(qr, qc)
        assert np.abs(lx - tx).max() < 1e-6
        assert np.abs(ly - ty).max() < 1e-6

    def test_min_gcp_count_enforced(self):
        with pytest.raises(ValueError, match="needs >= 6"):
            PolyGCPTransformer(
                np.arange(4), np.arange(4), np.arange(4), np.arange(4), order=2
            )


class TestTPS:
    def test_exact_at_control_points(self):
        g = make_gcp_grid(n=7)
        t = TPSGCPTransformer(g["row"], g["col"], g["x"], g["y"])
        lx, ly = t.transform(g["row"], g["col"])
        assert np.abs(lx - g["x"]).max() < 1e-8
        assert np.abs(ly - g["y"]).max() < 1e-8

    def test_interpolates_off_grid_and_converges_with_density(self):
        rng = np.random.default_rng(2)
        qr, qc = rng.uniform(500, 10480, 300), rng.uniform(500, 10480, 300)
        tx, ty = truth(qr, qc)
        errs = []
        for n in (11, 21):
            g = make_gcp_grid(n=n)
            t = TPSGCPTransformer(g["row"], g["col"], g["x"], g["y"])
            lx, ly = t.transform(qr, qc)
            errs.append(max(np.abs(lx - tx).max(), np.abs(ly - ty).max()))
        assert errs[0] < 1e-4          # ~5 m from an 11x11 grid
        assert errs[1] < 5e-6          # ~0.5 m from 21x21
        assert errs[1] < errs[0] / 4   # denser GCPs converge

    def test_factory(self):
        g = make_gcp_grid(n=5)
        assert isinstance(
            fit_gcp_transformer(g["row"], g["col"], g["x"], g["y"], method="tps"),
            TPSGCPTransformer,
        )
        with pytest.raises(ValueError, match="unknown GCP method"):
            fit_gcp_transformer(g["row"], g["col"], g["x"], g["y"], method="rpc")


class TestGcpStage:
    def test_map_batches_stage(self, ray_session):
        import pyarrow as pa
        import ray

        from data_model_ray.stages.reproject import GcpReproject

        g = make_gcp_grid()
        rng = np.random.default_rng(3)
        n = 2000
        qr, qc = rng.uniform(0, 10980, n), rng.uniform(0, 10980, n)
        ds = ray.data.from_arrow(
            pa.table({"row": pa.array(qr), "col": pa.array(qc)})
        ).repartition(4)
        out = ds.map_batches(
            GcpReproject,
            fn_constructor_kwargs={"gcps": g, "method": "tps"},
            batch_format="pyarrow",
            zero_copy_batch=True,
            concurrency=2,
        ).to_pandas()
        tx, ty = truth(out["row"].to_numpy(), out["col"].to_numpy())
        assert len(out) == n
        assert np.abs(out["lon"].to_numpy() - tx).max() < 1e-4
        assert np.abs(out["lat"].to_numpy() - ty).max() < 1e-4
