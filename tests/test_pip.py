"""Point-in-polygon / rect-index tests vs brute force + hand goldens."""

import numpy as np

from data_model_ray import fixtures
from data_model_ray.functions.pip import PolygonIndex, RectIndex, points_in_polygon
from data_model_ray.stages.geoindex import build_granule_index


class TestRayCast:
    def test_unit_square(self):
        vx = np.array([0.0, 1.0, 1.0, 0.0])
        vy = np.array([0.0, 0.0, 1.0, 1.0])
        px = np.array([0.5, 1.5, -0.1, 0.99, 0.5])
        py = np.array([0.5, 0.5, 0.5, 0.01, 1.5])
        got = points_in_polygon(px, py, vx, vy)
        np.testing.assert_array_equal(got, [True, False, False, True, False])

    def test_concave_polygon(self):
        # U-shape: the notch center must be outside
        vx = np.array([0.0, 3.0, 3.0, 2.0, 2.0, 1.0, 1.0, 0.0])
        vy = np.array([0.0, 0.0, 3.0, 3.0, 1.0, 1.0, 3.0, 3.0])
        px = np.array([1.5, 0.5, 2.5, 1.5])
        py = np.array([2.0, 2.0, 2.0, 0.5])
        got = points_in_polygon(px, py, vx, vy)
        np.testing.assert_array_equal(got, [False, True, True, True])


class TestRectIndex:
    def test_tie_break_lexicographic(self):
        idx = RectIndex(
            codes=np.array(["B", "A", "C"]),
            xmin=np.array([0.0, 0.0, 10.0]),
            ymin=np.array([0.0, 0.0, 10.0]),
            xmax=np.array([5.0, 5.0, 15.0]),
            ymax=np.array([5.0, 5.0, 15.0]),
        )
        got = idx.assign(np.array([1.0, 12.0, 99.0]), np.array([1.0, 12.0, 99.0]))
        assert got.tolist() == ["A", "C", ""]  # overlapping -> lexicographic min

    def test_half_open_edges(self):
        idx = RectIndex(
            codes=np.array(["A"]),
            xmin=np.array([0.0]),
            ymin=np.array([0.0]),
            xmax=np.array([1.0]),
            ymax=np.array([1.0]),
        )
        got = idx.assign(np.array([0.0, 1.0]), np.array([0.0, 0.5]))
        assert got.tolist() == ["A", ""]

    def test_granule_assign_matches_bruteforce(self, pages_ids):
        geo = fixtures.pages_expected_geo(pages_ids[:3000])
        g = fixtures.mgrs_granules()
        idx = build_granule_index(g)
        got = idx.assign(geo["lon"], geo["lat"])
        codes = np.array(g["mgrs"].to_pylist())
        xmin, xmax = np.array(g["xmin"]), np.array(g["xmax"])
        ymin, ymax = np.array(g["ymin"]), np.array(g["ymax"])
        for i in range(0, 3000, 97):
            hits = codes[
                (geo["lon"][i] >= xmin)
                & (geo["lon"][i] < xmax)
                & (geo["lat"][i] >= ymin)
                & (geo["lat"][i] < ymax)
            ]
            want = min(hits) if len(hits) else ""
            assert got[i] == want, i
        assert (got != "").all()  # fixture guarantee: every point in a granule


class TestPolygonIndex:
    def test_assign_matches_bruteforce(self, pages_ids):
        geo = fixtures.pages_expected_geo(pages_ids[:1500])
        poly = fixtures.admin_polygons()
        idx = PolygonIndex(poly)
        for level in (0, 1):
            got = idx.assign(geo["lon"], geo["lat"], level)
            starts = np.zeros(len(poly["admin_id"]) + 1, dtype=np.int64)
            np.cumsum(poly["n_vertices"], out=starts[1:])
            for i in range(0, 1500, 119):
                matches = []
                for p in range(len(poly["admin_id"])):
                    if poly["level"][p] != level:
                        continue
                    s, e = starts[p], starts[p + 1]
                    if points_in_polygon(
                        np.array([geo["lon"][i]]),
                        np.array([geo["lat"][i]]),
                        poly["vx"][s:e],
                        poly["vy"][s:e],
                    )[0]:
                        matches.append(int(poly["admin_id"][p]))
                want = min(matches) if matches else -1
                assert got[i] == want, (i, level)

    def test_anti_join_rows_exist(self, pages_ids):
        geo = fixtures.pages_expected_geo(pages_ids)
        idx = PolygonIndex(fixtures.admin_polygons())
        assigned = idx.assign(geo["lon"], geo["lat"], 0)
        frac_outside = float((assigned < 0).mean())
        assert 0.01 < frac_outside < 0.6  # anti-join fixture exists
