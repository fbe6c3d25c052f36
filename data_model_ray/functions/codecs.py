"""From-scratch media codecs — pure bytes + numpy, no external libraries.

The task brief allows stubbing decode because PIL/ffmpeg/soundfile are not
in this container; instead we implement real, openly-specified formats that
need nothing beyond numpy:

- **PPM (P6)** binary RGB images — the netpbm format (public spec: magic
  ``P6``, ASCII ``width height maxval`` header with ``#`` comments, then
  ``H*W*3`` raw bytes).
- **WAV (RIFF) PCM16** audio — RIFF header, ``fmt `` chunk (PCM format 1,
  channels, sample rate, 16-bit), ``data`` chunk of little-endian int16.
- **PPMV** video — our minimal container: concatenated P6 frames (the same
  shape as MJPEG = concatenated JPEGs), parsed sequentially.

These are the real decode kernels behind ``stages/multimodal.py``; the
analogue of the reference's codec layer (scale-offset packing,
/root/reference/src/eopf_geozarr/codecs/scale_offset.py:15-27) but for
opaque-binary media columns. Encoders exist so fixtures generate *real*
payloads and every decode is round-trip-tested bit-exactly.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# PPM (netpbm P6) — binary 8-bit RGB
# ---------------------------------------------------------------------------


def ppm_encode(pixels: np.ndarray) -> bytes:
    """(H, W, 3) uint8 -> P6 bytes."""
    if pixels.ndim != 3 or pixels.shape[2] != 3 or pixels.dtype != np.uint8:
        raise ValueError("ppm_encode expects (H, W, 3) uint8")
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def _ppm_header(buf: bytes, offset: int = 0) -> tuple[int, int, int, int]:
    """Parse a P6 header starting at ``offset``.

    Returns (width, height, maxval, data_start). Handles whitespace runs and
    ``#`` comment lines per the netpbm spec.
    """
    if buf[offset : offset + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos = offset + 2
    fields: list[int] = []
    n = len(buf)
    while len(fields) < 3:
        # skip whitespace and comments
        while pos < n and buf[pos : pos + 1].isspace():
            pos += 1
        if pos < n and buf[pos] == 0x23:  # '#'
            while pos < n and buf[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < n and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(buf[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval} (8-bit only)")
    return w, h, maxval, pos


def ppm_decode(buf: bytes) -> np.ndarray:
    """P6 bytes -> (H, W, 3) uint8 (zero-copy view onto the payload)."""
    w, h, _, pos = _ppm_header(buf)
    need = w * h * 3
    if len(buf) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return np.frombuffer(buf, dtype=np.uint8, count=need, offset=pos).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# WAV (RIFF) PCM 16-bit
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) mono or (n, C) -> RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("wav_encode expects int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(buf: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes -> (sample_rate, (n, C) int16 array).

    Walks RIFF chunks (so extra chunks like LIST are skipped correctly);
    PCM format 1 / 16-bit only.
    """
    if buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, n = 12, len(buf)
    sample_rate = channels = None
    data = None
    while pos + 8 <= n:
        cid = buf[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", buf, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", buf, body
            )
            if audio_fmt != 1 or bits != 16:
                raise ValueError("PCM16 WAV only")
        elif cid == b"data":
            data = np.frombuffer(buf, dtype="<i2", count=clen // 2, offset=body)
        pos = body + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sample_rate, data.reshape(-1, channels)


# ---------------------------------------------------------------------------
# PPMV — concatenated-P6 video container
# ---------------------------------------------------------------------------


def ppmv_encode(frames: list[np.ndarray]) -> bytes:
    return b"".join(ppm_encode(f) for f in frames)


def ppmv_frame_offsets(buf: bytes) -> list[int]:
    """Byte offset of every frame in a concatenated-P6 container."""
    offsets = []
    pos, n = 0, len(buf)
    while pos < n:
        w, h, _, data_start = _ppm_header(buf, pos)
        offsets.append(pos)
        pos = data_start + w * h * 3
    return offsets


def ppmv_decode_frame(buf: bytes, offset: int) -> np.ndarray:
    w, h, _, pos = _ppm_header(buf, offset)
    return np.frombuffer(buf, dtype=np.uint8, count=w * h * 3, offset=pos).reshape(
        h, w, 3
    )


# ---------------------------------------------------------------------------
# Image kernels: bilinear resize + feature extraction
# ---------------------------------------------------------------------------


def resize_bilinear(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """(H, W, C) uint8 -> (th, tw, C) uint8 bilinear resample (edge-aligned
    half-pixel centers, the standard convention). Pure numpy gather."""
    h, w = img.shape[:2]
    # source coordinates of each target pixel center
    sx = (np.arange(tw, dtype=np.float64) + 0.5) * (w / tw) - 0.5
    sy = (np.arange(th, dtype=np.float64) + 0.5) * (h / th) - 0.5
    x0 = np.clip(np.floor(sx).astype(np.int64), 0, w - 1)
    y0 = np.clip(np.floor(sy).astype(np.int64), 0, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    fx = np.clip(sx - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(sy - y0, 0.0, 1.0)[:, None, None]
    p = img.astype(np.float64)
    top = p[y0[:, None], x0[None, :]] * (1 - fx) + p[y0[:, None], x1[None, :]] * fx
    bot = p[y1[:, None], x0[None, :]] * (1 - fx) + p[y1[:, None], x1[None, :]] * fx
    out = top * (1 - fy) + bot * fy
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def image_features(img: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 -> 16-dim float32 descriptor.

    Layout: [mean R,G,B | std R,G,B | quadrant luma means (4) | luma mean,
    min, max | mean |dx| gradient energy | aspect w/h | log2 pixel count].
    Deterministic, scale-bounded — usable directly by the embedding-cosine
    near-dup and kNN stages (stages/neardup.py, stages/knn.py).
    """
    h, w = img.shape[:2]
    p = img.astype(np.float32) / 255.0
    luma = p @ np.array([0.299, 0.587, 0.114], dtype=np.float32)
    hh, wh = max(1, h // 2), max(1, w // 2)
    quads = [
        luma[:hh, :wh].mean(),
        luma[:hh, wh:].mean() if w > wh else luma[:hh, :wh].mean(),
        luma[hh:, :wh].mean() if h > hh else luma[:hh, :wh].mean(),
        luma[hh:, wh:].mean() if h > hh and w > wh else luma[:hh, :wh].mean(),
    ]
    grad = np.abs(np.diff(luma, axis=1)).mean() if w > 1 else 0.0
    return np.array(
        [
            *p.reshape(-1, 3).mean(axis=0),
            *p.reshape(-1, 3).std(axis=0),
            *quads,
            luma.mean(),
            luma.min(),
            luma.max(),
            grad,
            w / h,
            np.log2(float(h) * w),
        ],
        dtype=np.float32,
    )


FEATURE_DIM = 16
assert image_features(np.zeros((2, 2, 3), dtype=np.uint8)).shape == (FEATURE_DIM,)
