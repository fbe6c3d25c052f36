"""Encoding planner tests (M12 — create_measurements_encoding analogue:
aligned chunks, chunk-multiple shards, per-column codecs, scale-offset
packing; reference s2_multiscale.py:424-611)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_model_ray.functions.encoding import (
    pack_table,
    parquet_write_options,
    plan_table_encoding,
    unpack_plan,
    unpack_table,
)


def sample_schema():
    return pa.schema(
        [("cell", pa.uint64()), ("pages", pa.int64()), ("score_mean", pa.float64())]
    )


class TestPlan:
    def test_row_groups_align(self):
        plan = plan_table_encoding(sample_schema(), 1000, target_chunk=300)
        # largest near-divisor of 1000 <= 300 -> 250 (uniform groups)
        assert plan["row_group_size"] == 250
        assert plan["rows_per_file"] % plan["row_group_size"] == 0

    def test_small_table_single_chunk(self):
        plan = plan_table_encoding(sample_schema(), 100, target_chunk=131_072)
        assert plan["row_group_size"] == 100
        assert plan["rows_per_file"] == 100

    def test_key_columns_light_codec(self):
        plan = plan_table_encoding(sample_schema(), 1000)
        assert plan["columns"]["cell"]["compression"] == "snappy"
        assert plan["columns"]["score_mean"]["compression"] == "zstd"

    def test_scale_offset_requires_float(self):
        with pytest.raises(ValueError, match="float column"):
            plan_table_encoding(
                sample_schema(), 10, scale_offset={"pages": {"scale_factor": 1.0}}
            )
        with pytest.raises(ValueError, match="key column"):
            plan_table_encoding(
                sample_schema(), 10, scale_offset={"cell": {"scale_factor": 1.0}}
            )


class TestPackedWrite:
    def make_table(self, n=1000):
        rng = np.random.default_rng(0)
        score = rng.uniform(0, 1, n)
        score[5] = np.nan
        t = pa.table(
            {
                "cell": pa.array(np.arange(n, dtype=np.uint64)),
                "pages": pa.array(np.arange(n, dtype=np.int64)),
                "score_mean": pa.array(score),
            }
        )
        # NaN -> null so the codec sentinel handles it
        import pyarrow.compute as pc

        col = t["score_mean"]
        return t.set_column(
            2, "score_mean", pc.if_else(pc.is_nan(col), pa.scalar(None, pa.float64()), col)
        )

    def test_pack_unpack_roundtrip_within_scale(self, tmp_path):
        so = {"score_mean": {"scale_factor": 1e-4, "add_offset": 0.0}}
        t = self.make_table()
        plan = plan_table_encoding(t.schema, t.num_rows, target_chunk=250, scale_offset=so)
        packed = pack_table(t, plan)
        assert pa.types.is_int32(packed["score_mean"].type)
        path = str(tmp_path / "packed.parquet")
        pq.write_table(packed, path, **parquet_write_options(plan, packed.schema))
        stored = pq.read_table(path)
        back = unpack_table(stored, unpack_plan(so))
        orig = t["score_mean"].to_numpy(zero_copy_only=False)
        got = back["score_mean"].to_numpy(zero_copy_only=False)
        # null survives; values round-trip to within half a scale step
        assert np.isnan(got[5]) and np.isnan(orig[5])
        mask = ~np.isnan(orig)
        assert np.abs(got[mask] - orig[mask]).max() <= 5e-5 + 1e-12
        # physical layout honors the plan
        f = pq.ParquetFile(path)
        assert f.metadata.row_group(0).num_rows == plan["row_group_size"]

    def test_pyramid_with_packing_resume(self, tmp_path):
        from data_model_ray import grid
        from data_model_ray.pipelines.pyramid import build_pyramid

        rng = np.random.default_rng(1)
        lat, lon = rng.uniform(30, 50, 500), rng.uniform(-10, 25, 500)
        cells = np.unique(grid.geocell_encode(lat, lon, 6))
        n = len(cells)
        t = pa.table(
            {
                "cell": pa.array(cells),
                "pages": pa.array(np.arange(1, n + 1, dtype=np.int64)),
                "score_mean": pa.array(rng.uniform(0, 1, n)),
                "lat_min": pa.array(np.full(n, 30.0)),
                "lat_max": pa.array(np.full(n, 50.0)),
                "lon_min": pa.array(np.full(n, -10.0)),
                "lon_max": pa.array(np.full(n, 25.0)),
            }
        )
        so = {"score_mean": {"scale_factor": 1e-6}}
        out = str(tmp_path / "pyr")
        m1 = build_pyramid(t, out, base_res=6, scale_offset=so)
        # manifest records the per-level plan
        assert all("encoding" in lv for lv in m1["levels"])
        assert (
            m1["levels"][0]["encoding"]["columns"]["score_mean"]["scale_offset"][
                "scale_factor"
            ]
            == 1e-6
        )
        # on-disk base level is packed int32
        stored = pq.read_table(f"{out}/part=level6")
        assert pa.types.is_int32(stored["score_mean"].type)
        # resume run skips + unpacks; manifests agree
        m2 = build_pyramid(t, out, base_res=6, scale_offset=so)
        assert [lv["cells"] for lv in m1["levels"]] == [
            lv["cells"] for lv in m2["levels"]
        ]
