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


class TestSkylineProperties:
    """skyline_indices (pipelines/analytic.py) vs O(n^2) brute-force
    dominance, plus losslessness of the per-block local-prune + fold."""

    pts = st.lists(
        st.tuples(st.integers(0, 8), st.integers(0, 8)),
        min_size=1,
        max_size=60,
    )

    @staticmethod
    def _brute(price, date_i):
        n = len(price)
        keep = np.ones(n, dtype=bool)
        for i in range(n):
            dominated = (
                (price >= price[i])
                & (date_i <= date_i[i])
                & ((price > price[i]) | (date_i < date_i[i]))
            )
            keep[i] = not dominated.any()
        return keep

    @given(pts=pts)
    @settings(max_examples=200, deadline=None)
    def test_matches_bruteforce(self, pts):
        from data_model_ray.pipelines.analytic import skyline_indices

        price = np.array([p for p, _ in pts], dtype=np.float64)
        date_i = np.array([d for _, d in pts], dtype=np.int64)
        key = np.arange(len(pts), dtype=np.int64)
        got = np.zeros(len(pts), dtype=bool)
        got[skyline_indices(price, date_i, key)] = True
        np.testing.assert_array_equal(got, self._brute(price, date_i))

    @given(pts=pts, cut=st.integers(0, 60))
    @settings(max_examples=200, deadline=None)
    def test_local_prune_is_lossless(self, pts, cut):
        """skyline(skyline(A) U skyline(B)) == skyline(A U B) for any split
        — the distributed fold's correctness invariant."""
        from data_model_ray.pipelines.analytic import skyline_indices

        price = np.array([p for p, _ in pts], dtype=np.float64)
        date_i = np.array([d for _, d in pts], dtype=np.int64)
        key = np.arange(len(pts), dtype=np.int64)
        cut = min(cut, len(pts))
        keep_parts = []
        for sl in (slice(0, cut), slice(cut, len(pts))):
            if sl.stop - (sl.start or 0) > 0:
                keep_parts.append(
                    np.asarray(sl.start or 0)
                    + skyline_indices(price[sl], date_i[sl], key[sl])
                )
        cand = np.sort(np.concatenate(keep_parts)) if keep_parts else key[:0]
        fold = cand[skyline_indices(price[cand], date_i[cand], key[cand])]
        whole = skyline_indices(price, date_i, key)
        np.testing.assert_array_equal(np.sort(fold), np.sort(whole))
