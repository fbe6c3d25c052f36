"""Multimodal stages: REAL codec round-trips (PPM/WAV/PPMV), bilinear
resize goldens, feature extraction, and the Ray actor-pool plumbing."""

import numpy as np
import pyarrow as pa
import pytest

from data_model_ray.functions.codecs import (
    FEATURE_DIM,
    image_features,
    ppm_decode,
    ppm_encode,
    ppmv_decode_frame,
    ppmv_encode,
    ppmv_frame_offsets,
    resize_bilinear,
    wav_decode,
    wav_encode,
)
from data_model_ray.stages.multimodal import (
    BINARY_STAGE_KWARGS,
    IMAGE_SCHEMA,
    AudioFrameSample,
    ImageDecode,
    ImageResize,
    ImageResizePixels,
    VideoFrameSample,
    synth_media_table,
)


class TestCodecs:
    def test_ppm_roundtrip_bit_exact(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (13, 17, 3), dtype=np.uint8)
        np.testing.assert_array_equal(ppm_decode(ppm_encode(img)), img)

    def test_ppm_header_with_comment(self):
        img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)
        buf = b"P6\n# a comment\n2 2\n255\n" + img.tobytes()
        np.testing.assert_array_equal(ppm_decode(buf), img)

    def test_ppm_rejects_truncated_and_foreign(self):
        with pytest.raises(ValueError):
            ppm_decode(b"P6\n4 4\n255\n\x00\x00")
        with pytest.raises(ValueError):
            ppm_decode(b"\x89PNG\r\n")

    def test_wav_roundtrip_bit_exact(self):
        pcm = (np.sin(np.linspace(0, 20, 1000)) * 20000).astype(np.int16)
        sr, out = wav_decode(wav_encode(pcm, 8000))
        assert sr == 8000
        np.testing.assert_array_equal(out[:, 0], pcm)

    def test_wav_stereo_and_chunk_walk(self):
        pcm = np.stack(
            [np.arange(100, dtype=np.int16), -np.arange(100, dtype=np.int16)], axis=1
        )
        buf = wav_encode(pcm, 44100)
        # insert an extra chunk between fmt and data — the walker must skip it
        import struct

        fmt_end = 12 + 8 + 16
        extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
        buf2 = buf[:fmt_end] + extra + buf[fmt_end:]
        buf2 = buf2[:4] + struct.pack("<I", len(buf2) - 8) + buf2[8:]
        sr, out = wav_decode(buf2)
        assert sr == 44100
        np.testing.assert_array_equal(out, pcm)

    def test_ppmv_container(self):
        frames = [
            np.full((4, 5, 3), i * 10, dtype=np.uint8) for i in range(5)
        ]
        buf = ppmv_encode(frames)
        offs = ppmv_frame_offsets(buf)
        assert len(offs) == 5
        for i, o in enumerate(offs):
            np.testing.assert_array_equal(ppmv_decode_frame(buf, o), frames[i])


class TestResize:
    def test_identity(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        np.testing.assert_array_equal(resize_bilinear(img, 4, 4), img)

    def test_2x_upsample_golden(self):
        # 1-D golden: row [0, 100] -> centers at sx = [-0.25, .25, .75, 1.25]
        img = np.zeros((1, 2, 3), dtype=np.uint8)
        img[0, 1] = 100
        out = resize_bilinear(img, 4, 1)
        np.testing.assert_array_equal(out[0, :, 0], [0, 25, 75, 100])

    def test_downsample_mean_preserving(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        out = resize_bilinear(img, 32, 32)
        assert abs(float(out.mean()) - float(img.mean())) < 3.0

    def test_resize_pixels_stage(self):
        t = synth_media_table(20)
        out = ImageResizePixels(max_side=16)(t)
        for i in range(20):
            img = ppm_decode(out["payload"][i].as_py())
            assert max(img.shape[:2]) <= 16


class TestDecodeStage:
    def test_real_decode_matches_fixture_dims(self):
        t = synth_media_table(50)
        out = ImageDecode()(t)
        assert out.schema.equals(IMAGE_SCHEMA)
        from data_model_ray.stages.multimodal import _synth_image

        for i in range(50):
            img = _synth_image(i)
            assert out["height"][i].as_py() == img.shape[0]
            assert out["width"][i].as_py() == img.shape[1]
            np.testing.assert_allclose(
                np.array(out["features"][i].as_py()), image_features(img), rtol=1e-6
            )

    def test_strict_mode_raises_on_foreign_payload(self):
        t = pa.table(
            {
                "id": pa.array([1], type=pa.int64()),
                "payload": pa.array([b"\xff\xd8\xff\xe0JFIF-ish"], type=pa.binary()),
                "media_type": pa.array(["image/jpeg"]),
            }
        )
        dec = ImageDecode()
        if dec.pil is None:
            with pytest.raises(NotImplementedError, match="STUB"):
                dec(t)

    def test_fake_fallback_for_foreign_payload(self):
        t = pa.table(
            {
                "id": pa.array([1, 2], type=pa.int64()),
                "payload": pa.array([b"\x89PNG", b"\x89PNG"], type=pa.binary()),
                "media_type": pa.array(["image/png"] * 2),
            }
        )
        out = ImageDecode(fake=True)(t)
        out2 = ImageDecode(fake=True)(t)
        assert out.schema.equals(IMAGE_SCHEMA)
        assert out.to_pydict() == out2.to_pydict()

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


class TestAudioVideo:
    def test_audio_frames_real_rms(self):
        t = synth_media_table(12, kinds=("audio",))
        out = AudioFrameSample(stride=8000, max_frames=8)(t)
        for sr, ns, frames in zip(
            out["sample_rate"].to_pylist(),
            out["n_samples"].to_pylist(),
            out["frames"].to_pylist(),
        ):
            assert sr == 8000
            assert 8000 <= ns <= 3 * 8000
            assert len(frames) == min(8, ns // 8000)
            # RMS of a 12000-amplitude sine ~ 12000/sqrt(2)/32768 ~ 0.259
            for f in frames:
                assert 0.2 < f < 0.3

    def test_video_frame_sample(self):
        t = synth_media_table(9, kinds=("video",))
        out = VideoFrameSample(step=2, max_frames=4)(t)
        for rid, nf, sampled, feats in zip(
            out["id"].to_pylist(),
            out["n_frames"].to_pylist(),
            out["sampled"].to_pylist(),
            out["features"].to_pylist(),
        ):
            assert nf == 3 + rid % 4
            assert sampled == list(range(0, nf, 2))[:4]
            assert all(np.isfinite(feats))


class TestRayPlumbing:
    def test_actor_pool_pipeline(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(synth_media_table(1000))
        out = ds.map_batches(
            ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS
        ).map_batches(ImageResize, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
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
            .map_batches(ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
            .to_pandas()
        )
        a = df.sort_values("id")["width"].to_numpy()
        b = df2.sort_values("id")["width"].to_numpy()
        np.testing.assert_array_equal(a, b)

    def test_media_near_dups_composition(self, ray_session):
        """decode -> features -> standardize -> cosine near-dup finds every
        planted one-pixel near-duplicate; any extra pair must be an exact
        pixel-identical duplicate (seed collisions in the fixture space)."""
        import ray.data as rd

        from data_model_ray.functions.codecs import ppm_decode
        from data_model_ray.stages.knn import standardize_embeddings
        from data_model_ray.stages.neardup import embedding_near_dups

        t = synth_media_table(400, dup_every=20)
        feats = (
            rd.from_arrow(t)
            .map_batches(ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
            .select_columns(["id", "features"])
        )
        z = standardize_embeddings(feats, vec_col="features")
        df = embedding_near_dups(
            z, threshold=0.99, vec_col="features", id_col="id"
        ).to_pandas()
        found = set(zip(df["vec_a"].astype(int), df["vec_b"].astype(int)))
        planted = {(r - 1, r) for r in range(20, 400, 20)}
        assert planted <= found  # 100% recall on planted near-dups
        payloads = t["payload"].to_pylist()
        for a, b in found - planted:
            ia = ppm_decode(payloads[a])
            ib = ppm_decode(payloads[b])
            # exact seed-collision duplicate, or a planted bump of one
            # (transitively near-identical): at most one byte differs
            assert ia.shape == ib.shape and (ia != ib).sum() <= 1, (a, b)

    def test_mixed_media_end_to_end(self, ray_session):
        import ray.data as rd

        t = synth_media_table(300, kinds=("image", "audio", "video"))
        images = t.filter(
            pa.compute.equal(t["media_type"], "image/x-portable-pixmap")
        )
        audio = t.filter(pa.compute.equal(t["media_type"], "audio/wav"))
        video = t.filter(pa.compute.equal(t["media_type"], "video/x-ppmv"))
        di = rd.from_arrow(images).map_batches(
            ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS
        ).to_pandas()
        da = rd.from_arrow(audio).map_batches(
            AudioFrameSample, concurrency=(1, 2), **BINARY_STAGE_KWARGS
        ).to_pandas()
        dv = rd.from_arrow(video).map_batches(
            VideoFrameSample, concurrency=(1, 2), **BINARY_STAGE_KWARGS
        ).to_pandas()
        assert len(di) + len(da) + len(dv) == 300
        assert len(di) == 100 and len(da) == 100 and len(dv) == 100
