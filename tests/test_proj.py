"""Projection tests vs published UTM/WebMercator values + round trips."""

import numpy as np
import pytest

from data_model_ray.functions import proj


class TestUTM:
    def test_central_meridian_equator(self):
        e, n = proj.geodetic_to_utm(np.array([0.0]), np.array([3.0]), 31)
        assert abs(e[0] - 500000.0) < 1e-6
        assert abs(n[0]) < 1e-6

    def test_published_point(self):
        # 50N 6E, zone 32: published E 285015.8, N 5542944.0 (< 1 m)
        e, n = proj.geodetic_to_utm(np.array([50.0]), np.array([6.0]), 32)
        assert abs(e[0] - 285015.8) < 1.0
        assert abs(n[0] - 5542944.0) < 1.0

    def test_roundtrip_accuracy(self):
        rng = np.random.default_rng(1)
        lat = rng.uniform(-84, 84, 2000)
        zone = 33
        lon = rng.uniform(zone * 6 - 183 - 2.9, zone * 6 - 183 + 2.9, 2000)
        e, n = proj.geodetic_to_utm(lat, lon, zone)
        lat2, lon2 = proj.utm_to_geodetic(e, n, zone)
        assert np.abs(lat2 - lat).max() < 1e-6  # ~0.1 m
        assert np.abs(lon2 - lon).max() < 1e-6

    def test_zone_for(self):
        assert proj.utm_zone_for(np.array([3.0]))[0] == 31
        assert proj.utm_zone_for(np.array([-177.0]))[0] == 1
        assert proj.utm_zone_for(np.array([179.9]))[0] == 60

    def test_bbox_reprojection_ordered(self):
        lo_x, lo_y, hi_x, hi_y = proj.reproject_bbox_utm_to_wgs84(
            400000, 5500000, 500000, 5600000, 32
        )
        assert lo_x < hi_x and lo_y < hi_y
        assert 7 < lo_x < 9.01 and 49 < lo_y < 51


class TestWebMercator:
    def test_known_values(self):
        x, y = proj.geodetic_to_webmercator(
            np.array([0.0, 0.0]), np.array([180.0, 0.0])
        )
        assert abs(x[0] - 20037508.342789244) < 1e-3
        assert x[1] == 0.0 and y[0] == 0.0

    def test_roundtrip(self):
        rng = np.random.default_rng(2)
        lat = rng.uniform(-85, 85, 1000)
        lon = rng.uniform(-179.9, 179.9, 1000)
        x, y = proj.geodetic_to_webmercator(lat, lon)
        lat2, lon2 = proj.webmercator_to_geodetic(x, y)
        np.testing.assert_allclose(lat2, lat, atol=1e-9)
        np.testing.assert_allclose(lon2, lon, atol=1e-9)


class TestCachedTransformer:
    def test_routes_and_caches(self):
        t = proj.CachedTransformer()
        lat, lon = np.array([50.0]), np.array([6.0])
        e, n = t.transform("EPSG:4326", "EPSG:32632", lat, lon)
        assert abs(e[0] - 285015.8) < 1.0
        lat2, lon2 = t.transform("EPSG:32632", "EPSG:4326", e, n)
        assert abs(lat2[0] - 50.0) < 1e-6
        assert len(t._cache) == 2
        with pytest.raises(ValueError, match="unsupported"):
            t.transform("EPSG:4326", "EPSG:9999", lat, lon)
