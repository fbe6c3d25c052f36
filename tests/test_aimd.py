"""AIMD batch-controller tests + adaptive GeoIndex equivalence."""

import numpy as np
import pyarrow as pa
import pytest

from data_model_ray import fixtures
from data_model_ray.stages.aimd import AIMDController, AdaptiveBatchMixin
from data_model_ray.stages.extract import extract_batch
from data_model_ray.stages.geoindex import GeoIndex


class TestController:
    def test_additive_increase(self):
        c = AIMDController(initial=1000, increase=100, target_latency_s=1.0)
        for _ in range(5):
            c.record(0.1)  # fast -> grow
        assert c.size == 1500

    def test_multiplicative_decrease(self):
        c = AIMDController(initial=1000, decrease=0.5, target_latency_s=0.1)
        c.record(1.0)  # slow -> halve
        assert c.size == 500
        c.record(1.0)
        assert c.size == 250

    def test_bounds_respected(self):
        c = AIMDController(initial=100, minimum=64, maximum=200, increase=500)
        c.record(0.0)
        assert c.size == 200  # capped at maximum
        c2 = AIMDController(initial=100, minimum=64, decrease=0.01, target_latency_s=0.0)
        c2.record(1.0)
        assert c2.size == 64  # floored at minimum

    def test_invalid_bounds(self):
        with pytest.raises(ValueError):
            AIMDController(minimum=0)


class TestAdaptiveMixin:
    def test_chunking_preserves_output(self):
        class Doubler(AdaptiveBatchMixin):
            def __init__(self):
                super().__init__(initial=100, target_latency_s=10.0)

            def process_chunk(self, chunk: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return chunk.set_column(
                    0, "x", pc.multiply(chunk["x"], pa.scalar(2))
                )

        t = pa.table({"x": pa.array(np.arange(1234, dtype=np.int64))})
        out = Doubler().adaptive_call(t)
        np.testing.assert_array_equal(out["x"].to_numpy(), np.arange(1234) * 2)

    def test_adaptive_geoindex_equivalent(self):
        batch = extract_batch(fixtures.pages_batch(np.arange(3000)))
        plain = GeoIndex(fixtures.mgrs_granules(), fixtures.admin_polygons())
        adaptive = GeoIndex(
            fixtures.mgrs_granules(),
            fixtures.admin_polygons(),
            adaptive=True,
            target_latency_s=0.001,  # force many small chunks
        )
        a = plain(batch)
        b = adaptive(batch)
        assert a.to_pydict() == b.to_pydict()
        assert adaptive.controller.observations > 1  # actually chunked


class TestEnrichAdaptive:
    def test_enrich_adaptive_matches_plain(self):
        import numpy as np

        from data_model_ray.fixtures import admin_polygons, mgrs_granules, pages_batch
        from data_model_ray.stages.enrich import Enrich

        batch = pages_batch(np.arange(3000, dtype=np.uint64))
        plain = Enrich(mgrs_granules(), admin_polygons())(batch)
        adaptive = Enrich(mgrs_granules(), admin_polygons(), adaptive=True)(batch)
        assert plain.equals(adaptive)
