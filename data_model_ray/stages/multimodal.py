"""Multimodal column stages: decode / feature-extract / resize / frame-sample.

Task-brief requirement: image/audio/video as opaque ``binary`` columns with
typed metadata, processed by actor-pool ``map_batches`` stages. The actual
codec libraries (PIL/ffmpeg/soundfile) are NOT in this container, so the
decode kernels are STUBBED exactly as specified: an import-try picks a real
decoder when present, else either raises ``NotImplementedError`` (strict
mode) or produces a clearly-marked deterministic fake. The Ray-side plumbing
— schemas, batch sizes (small: wide binary rows dominate block size, SURVEY
7.4), actor signatures, output layout — is real and tested.

Schema contract:

- input:  ``(id: int64, payload: binary, media_type: string)``
- image decode output: ``(id, width: int32, height: int32, channels: int32,
  features: list<float>(FEATURE_DIM))``
- audio sample output: ``(id, sample_rate: int32, n_samples: int64,
  frames: list<float>)``
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_stream

FEATURE_DIM = 16
#: recommended map_batches kwargs for wide-binary stages (small batches so
#: batch x concurrency fits worker heaps; see ray guide memory notes)
BINARY_STAGE_KWARGS = dict(batch_format="pyarrow", batch_size=256, zero_copy_batch=True)

IMAGE_SCHEMA = pa.schema(
    [
        ("id", pa.int64()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("channels", pa.int32()),
        ("features", pa.list_(pa.float32(), FEATURE_DIM)),
    ]
)


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401

        return Image
    except ImportError:
        return None


class ImageDecode:
    """Actor-pool image decode + feature stage.

    ``ds.map_batches(ImageDecode, fn_constructor_kwargs={"fake": True},
    concurrency=(1, N), **BINARY_STAGE_KWARGS)``

    With no codec installed: ``fake=False`` raises NotImplementedError (the
    documented stub); ``fake=True`` emits a deterministic hash-derived
    decode so the distributed plumbing is fully exercisable in tests.
    """

    def __init__(self, *, fake: bool = False):
        self.pil = _try_import_pil()
        self.fake = fake
        if self.pil is None and not fake:
            # fail fast at actor construction, not first batch
            raise NotImplementedError(
                "no image codec in this environment; pass fake=True for the "
                "deterministic stub decode (STUB per task brief)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        if self.pil is not None and not self.fake:
            raise NotImplementedError("real decode path requires PIL; untested here")
        # deterministic fake decode: dims + features from payload-keyed hashes
        k = ids.astype(np.uint64)
        width = (64 + (hash_stream(k, 70) % np.uint64(1024))).astype(np.int32)
        height = (64 + (hash_stream(k, 71) % np.uint64(1024))).astype(np.int32)
        channels = np.full(len(ids), 3, dtype=np.int32)
        feats = np.empty((len(ids), FEATURE_DIM), dtype=np.float32)
        for j in range(FEATURE_DIM):
            feats[:, j] = (hash_stream(k, 100 + j) >> np.uint64(11)).astype(
                np.float64
            ) / float(1 << 53)
        return pa.table(
            {
                "id": pa.array(ids),
                "width": pa.array(width),
                "height": pa.array(height),
                "channels": pa.array(channels),
                "features": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1)), FEATURE_DIM
                ),
            }
        )


class ImageResize:
    """Resize-plan stage: computes target dims (aspect-preserving) from the
    decode stage's metadata; the pixel kernel itself is part of the decode
    stub. Pure vectorized metadata math — real and fully tested."""

    def __init__(self, *, max_side: int = 256):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(w, h))
        return batch.append_column(
            "target_width", pa.array(np.maximum(1, np.round(w * scale)).astype(np.int32))
        ).append_column(
            "target_height", pa.array(np.maximum(1, np.round(h * scale)).astype(np.int32))
        )


class AudioFrameSample:
    """Frame-sampling plan for audio/video payloads: deterministic frame
    offsets (every ``stride`` samples, up to ``max_frames``) from stub
    metadata. Decode stub as in ImageDecode."""

    def __init__(self, *, stride: int = 16000, max_frames: int = 8, fake: bool = False):
        self.stride = stride
        self.max_frames = max_frames
        if not fake:
            raise NotImplementedError(
                "no audio codec in this environment; pass fake=True (STUB)"
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_numpy(zero_copy_only=False)
        k = ids.astype(np.uint64)
        sr = np.full(len(ids), 16000, dtype=np.int32)
        n_samples = (16000 + (hash_stream(k, 80) % np.uint64(16000 * 60))).astype(
            np.int64
        )
        n_frames = np.minimum(n_samples // self.stride, self.max_frames).astype(
            np.int64
        )
        offsets = np.zeros(len(ids) + 1, dtype=np.int32)
        np.cumsum(n_frames, out=offsets[1:])
        frame_pos = np.concatenate(
            [np.arange(int(nf)) * self.stride for nf in n_frames]
        ) if len(ids) else np.array([], dtype=np.int64)
        return pa.table(
            {
                "id": pa.array(ids),
                "sample_rate": pa.array(sr),
                "n_samples": pa.array(n_samples),
                "frame_offsets": pa.ListArray.from_arrays(
                    pa.array(offsets), pa.array(frame_pos.astype(np.float32))
                ),
            }
        )


def synth_media_table(n: int, *, payload_bytes: int = 4096) -> pa.Table:
    """Deterministic opaque-binary media fixture (ids + pseudo payloads)."""
    ids = np.arange(n, dtype=np.int64)
    k = ids.astype(np.uint64)
    # payloads: repeated 8-byte hash patterns (opaque, deterministic)
    word = hash_stream(k, 90)
    payloads = [
        int(word[i]).to_bytes(8, "little") * (payload_bytes // 8) for i in range(n)
    ]
    return pa.table(
        {
            "id": pa.array(ids),
            "payload": pa.array(payloads, type=pa.binary()),
            "media_type": pa.array(["image/fake"] * n),
        }
    )
