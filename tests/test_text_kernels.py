"""Pure-kernel regression tests from the round-1 advice findings."""

import numpy as np
import pyarrow as pa

from data_model_ray.stages.knn import _equirect_dist2, EARTH_DEG
from data_model_ray.stages.text import _byte_counts


class TestByteCountsOffsets:
    def test_large_string_matches_string(self):
        texts = ["hello world", "", "a_b c9 d", "Ünïcode bytes ok", "one"]
        small = pa.array(texts, type=pa.string())
        large = pa.array(texts, type=pa.large_string())
        for got, want in zip(_byte_counts(large), _byte_counts(small)):
            np.testing.assert_array_equal(got, want)

    def test_sliced_large_string(self):
        arr = pa.array(["aa bb", "cc", "dd ee ff"], type=pa.large_string())
        nb, nl, nt = _byte_counts(arr.slice(1))
        np.testing.assert_array_equal(nb, [2, 8])
        np.testing.assert_array_equal(nt, [1, 3])

    def test_non_string_raises(self):
        import pytest

        with pytest.raises(TypeError):
            _byte_counts(pa.array([1, 2, 3]))


class TestAntimeridianDistance:
    def test_wraps_longitude(self):
        d2 = _equirect_dist2(
            np.array([0.0]), np.array([179.9]), np.array([0.0]), np.array([-179.9])
        )
        want = (0.2 * EARTH_DEG) ** 2
        assert abs(d2[0] - want) < 1e-6

    def test_normal_path_unchanged(self):
        d2 = _equirect_dist2(
            np.array([10.0]), np.array([20.0]), np.array([10.0]), np.array([21.0])
        )
        want = (EARTH_DEG * np.cos(np.radians(10.0))) ** 2
        assert abs(d2[0] - want) < 1e-9


class TestAboveUserMedianModes:
    def test_join_mode_equals_broadcast_mode(self, ray_session):
        """The co-partitioned join escape hatch (10^9-user path) must
        produce exactly the broadcast path's rows."""
        import pandas as pd

        from data_model_ray.pipelines.analytic import above_user_median

        sf = "/root/testdata/sf0.001"
        a = (
            above_user_median(sf, method="broadcast")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        b = (
            above_user_median(sf, method="join")
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert len(a) > 0
        pd.testing.assert_frame_equal(a, b)

    def test_unknown_method(self, ray_session):
        import pytest as _pytest

        from data_model_ray.pipelines.analytic import above_user_median

        with _pytest.raises(ValueError):
            above_user_median("/root/testdata/sf0.001", method="x")
