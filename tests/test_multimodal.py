"""Multimodal stub plumbing tests: schema, actor signature, output layout."""

import numpy as np
import pyarrow as pa
import pytest

from data_model_ray.stages.multimodal import (
    BINARY_STAGE_KWARGS,
    FEATURE_DIM,
    IMAGE_SCHEMA,
    AudioFrameSample,
    ImageDecode,
    ImageResize,
    synth_media_table,
)


class TestStubContracts:
    def test_strict_mode_raises_at_construction(self):
        with pytest.raises(NotImplementedError, match="STUB"):
            ImageDecode(fake=False)
        with pytest.raises(NotImplementedError, match="STUB"):
            AudioFrameSample(fake=False)

    def test_fake_decode_schema_and_determinism(self):
        t = synth_media_table(100)
        dec = ImageDecode(fake=True)
        out = dec(t)
        assert out.schema.equals(IMAGE_SCHEMA)
        out2 = ImageDecode(fake=True)(t)
        assert out.to_pydict() == out2.to_pydict()
        feats = out["features"].to_pylist()
        assert all(len(f) == FEATURE_DIM for f in feats)

    def test_resize_plan(self):
        t = pa.table(
            {
                "id": pa.array([1, 2, 3], type=pa.int64()),
                "width": pa.array([1024, 100, 256], type=pa.int32()),
                "height": pa.array([512, 400, 256], type=pa.int32()),
            }
        )
        out = ImageResize(max_side=256)(t)
        assert out["target_width"].to_pylist() == [256, 64, 256]
        assert out["target_height"].to_pylist() == [128, 256, 256]

    def test_audio_frame_offsets(self):
        t = synth_media_table(50)
        out = AudioFrameSample(fake=True)(t)
        for sr, ns, offs in zip(
            out["sample_rate"].to_pylist(),
            out["n_samples"].to_pylist(),
            out["frame_offsets"].to_pylist(),
        ):
            assert sr == 16000
            assert len(offs) <= 8
            assert all(o < ns for o in offs)


class TestRayPlumbing:
    def test_actor_pool_pipeline(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(synth_media_table(1000))
        out = (
            ds.map_batches(
                ImageDecode,
                fn_constructor_kwargs={"fake": True},
                concurrency=(1, 2),
                **BINARY_STAGE_KWARGS,
            )
            .map_batches(ImageResize, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
        )
        df = out.to_pandas()
        assert len(df) == 1000
        assert set(df.columns) == {
            "id", "width", "height", "channels", "features",
            "target_width", "target_height",
        }
        assert (df["target_width"] <= 256).all()
        # deterministic across distributed execution
        df2 = (
            rd.from_arrow(synth_media_table(1000))
            .map_batches(
                ImageDecode,
                fn_constructor_kwargs={"fake": True},
                concurrency=(1, 2),
                **BINARY_STAGE_KWARGS,
            )
            .to_pandas()
        )
        a = df.sort_values("id")["width"].to_numpy()
        b = df2.sort_values("id")["width"].to_numpy()
        np.testing.assert_array_equal(a, b)
