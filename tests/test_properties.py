"""Hypothesis property tests for the grid and codec kernels (beyond the
reference's seeded-only testing, SURVEY.md section 5)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from data_model_ray import grid
from data_model_ray.functions.scale_offset import (
    decode_scale_offset,
    encode_scale_offset,
)

lat_st = st.floats(min_value=-89.999, max_value=89.999, allow_nan=False)
lon_st = st.floats(min_value=-179.999, max_value=179.999, allow_nan=False)


class TestGeoCellProperties:
    @given(lat=lat_st, lon=lon_st, res=st.integers(0, 12))
    @settings(max_examples=200, deadline=None)
    def test_center_reencodes_to_same_cell(self, lat, lon, res):
        c = grid.geocell_encode(np.array([lat]), np.array([lon]), res)
        clat, clon = grid.geocell_center(c)
        assert grid.geocell_encode(clat, clon, res)[0] == c[0]

    @given(lat=lat_st, lon=lon_st, res=st.integers(1, 12), dres=st.integers(1, 4))
    @settings(max_examples=200, deadline=None)
    def test_parent_transitivity(self, lat, lon, res, dres):
        pres = max(0, res - dres)
        fine = grid.geocell_encode(np.array([lat]), np.array([lon]), res)
        assert (
            grid.geocell_parent(fine, pres)[0]
            == grid.geocell_encode(np.array([lat]), np.array([lon]), pres)[0]
        )

    @given(lat=lat_st, lon=lon_st, res=st.integers(0, 12))
    @settings(max_examples=100, deadline=None)
    def test_cell_contains_point(self, lat, lon, res):
        c = int(grid.geocell_encode(np.array([lat]), np.array([lon]), res)[0])
        lat_min, lon_min, lat_max, lon_max = grid.geocell_bounds(c)
        # containment up to float rounding at cell edges (encode computes
        # (lat+90)/180*n in doubles; values within 1 ulp of an edge may
        # round across it — deterministic, but off the exact half-open bound)
        eps = 1e-9
        assert lat_min - eps <= lat < lat_max + eps
        lon_w = ((lon + 180.0) % 360.0) - 180.0
        assert lon_min - eps <= lon_w < lon_max + eps


class TestS2Properties:
    @given(lat=lat_st, lon=lon_st, level=st.integers(0, 20))
    @settings(max_examples=200, deadline=None)
    def test_level_and_roundtrip(self, lat, lon, level):
        c = grid.s2_encode(np.array([lat]), np.array([lon]), level)
        assert grid.s2_level(c)[0] == level
        clat, clon = grid.s2_center_latlon(c)
        assert grid.s2_encode(clat, clon, level)[0] == c[0]

    @given(lat=lat_st, lon=lon_st, level=st.integers(1, 20))
    @settings(max_examples=100, deadline=None)
    def test_parent_consistency(self, lat, lon, level):
        c = grid.s2_encode(np.array([lat]), np.array([lon]), level)
        p = grid.s2_parent(c, level - 1)
        assert p[0] == grid.s2_encode(np.array([lat]), np.array([lon]), level - 1)[0]


class TestScaleOffsetProperties:
    @given(
        vals=st.lists(
            st.floats(min_value=-1000, max_value=1000, allow_nan=False), min_size=1, max_size=50
        ),
        scale_exp=st.integers(-4, -1),
    )
    @settings(max_examples=100, deadline=None)
    def test_roundtrip_within_half_scale(self, vals, scale_exp):
        import pyarrow as pa

        scale = 10.0 ** scale_exp
        arr = pa.array(vals)
        enc = encode_scale_offset(arr, scale_factor=scale, dtype=pa.int64())
        dec = decode_scale_offset(enc, scale_factor=scale)
        got = dec.to_numpy(zero_copy_only=False)
        np.testing.assert_allclose(got, vals, atol=scale / 2 + 1e-12)
