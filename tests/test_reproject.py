"""UTM reprojection stage tests (in-pipeline T1 analogue)."""

import numpy as np

from data_model_ray import fixtures
from data_model_ray.functions import proj
from data_model_ray.stages.enrich import Enrich
from data_model_ray.stages.reproject import UtmReproject, parse_zone


class TestUtmReproject:
    def test_zone_parse(self):
        got = parse_zone(np.array(["T31UCA", "T07HAB", "", "X"], dtype=object))
        np.testing.assert_array_equal(got, [31, 7, -1, -1])

    def test_matches_direct_projection(self):
        batch = fixtures.pages_batch(np.arange(2000))
        enriched = Enrich(fixtures.mgrs_granules(), fixtures.admin_polygons())(batch)
        out = UtmReproject()(enriched)
        zones = out["utm_zone"].to_numpy(zero_copy_only=False)
        lat = out["lat"].to_numpy(zero_copy_only=False)
        lon = out["lon"].to_numpy(zero_copy_only=False)
        e = out["utm_e"].to_numpy(zero_copy_only=False)
        n = out["utm_n"].to_numpy(zero_copy_only=False)
        assert (zones > 0).all()  # fixture: every point has a granule
        for zone in np.unique(zones):
            m = zones == zone
            ew, nw = proj.geodetic_to_utm(lat[m], lon[m], int(zone))
            np.testing.assert_allclose(e[m], ew)
            np.testing.assert_allclose(n[m], nw)
        # eastings within a zone stay near the central meridian band
        assert np.nanmin(e) > -1_000_000 and np.nanmax(e) < 2_000_000

    def test_pipeline_deployment(self, ray_session):
        import ray.data as rd

        ds = fixtures.pages_dataset(1000, parallelism=2)
        import ray

        g = ray.put(fixtures.mgrs_granules())
        a = ray.put(fixtures.admin_polygons())
        out = (
            ds.map_batches(
                Enrich,
                fn_constructor_kwargs={"granules_ref": g, "admin_ref": a},
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=(1, 2),
            )
            .map_batches(
                UtmReproject,
                batch_format="pyarrow",
                zero_copy_batch=True,
                concurrency=(1, 2),
            )
            .to_pandas()
        )
        assert len(out) == 1000
        assert {"utm_zone", "utm_e", "utm_n"} <= set(out.columns)
        assert out["utm_e"].notna().all()
