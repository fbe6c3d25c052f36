"""Deterministic vectorized hashing primitives.

Every piece of synthetic randomness in this engine is a pure function of a
row key through these hashes, so results are independent of partitioning,
batch boundaries, retries and resume — the analogue of the reference's
seeded-numpy determinism (/root/reference/tests/test_integration_sentinel2.py:73)
and its byte-identical resumable writes
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:974-1183).
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64
MASK64 = _U64(0xFFFFFFFFFFFFFFFF)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mix function)."""
    x = x.astype(_U64, copy=True)
    with np.errstate(over="ignore"):
        x += _U64(0x9E3779B97F4A7C15)
        x ^= x >> _U64(30)
        x *= _U64(0xBF58476D1CE4E5B9)
        x ^= x >> _U64(27)
        x *= _U64(0x94D049BB133111EB)
        x ^= x >> _U64(31)
    return x


def hash_stream(key: np.ndarray, stream: int) -> np.ndarray:
    """Independent hash stream `stream` keyed by uint64 `key` (vectorized)."""
    with np.errstate(over="ignore"):
        mixed = key.astype(_U64) * _U64(0x9E3779B97F4A7C15) + _U64(stream) * _U64(
            0xD1B54A32D192ED03
        )
    return splitmix64(mixed)


def uniform01(key: np.ndarray, stream: int) -> np.ndarray:
    """Deterministic uniform [0, 1) doubles from a key (53-bit mantissa)."""
    return (hash_stream(key, stream) >> _U64(11)).astype(np.float64) / float(1 << 53)


def fnv1a_bytes(data: bytes) -> int:
    """Scalar FNV-1a 64-bit for small driver-side keys (partition names)."""
    h = 0xCBF29CE484222325
    for b in data:
        h ^= b
        h = (h * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h
