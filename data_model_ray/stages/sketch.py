"""Mergeable sketches for approximate distributed analytics.

HyperLogLog (Flajolet et al. 2007, public algorithm) as a Ray Data
aggregate: each block contributes one ``2**p``-byte register vector (a
partial), the driver max-merges the tiny vectors and applies the bias-
corrected estimator. The sketch is the scale path for COUNT(DISTINCT)
over 10^12 keys where the exact distinct set cannot fit anywhere: the
exchange per block is 4 KiB regardless of block size, merging is
commutative/associative/idempotent (safe under retries), and sketches
from different partitions/runs can be unioned after the fact.

Reference analogue: the engine's bounded-aggregate ladder (SURVEY 2.6) —
this is the sub-linear rung below the exact per-cell counters in
pipelines/pyramid.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..hashing import hash_stream


def _alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def _hash_column(arr: pa.ChunkedArray | pa.Array, seed: int = 11) -> np.ndarray:
    """Vectorized uint64 hash of an int or string column (no row loop)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_integer(arr.type):
        return hash_stream(arr.to_numpy(zero_copy_only=False).astype(np.uint64), seed)
    import polars as pl

    from ..hashing import splitmix64

    h = pl.from_arrow(arr.cast(pa.large_string())).hash(seed=seed).to_numpy()
    return splitmix64(h.astype(np.uint64))


def _clz64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized count-leading-zeros for nonzero uint64 (6 steps)."""
    x = x.copy()
    n = np.zeros(len(x), dtype=np.uint8)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        n[m] += np.uint8(s)
        with np.errstate(over="ignore"):
            x[m] = x[m] << np.uint64(s)
    return n


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """Register vector (uint8, len 2**p) for one batch of uint64 hashes."""
    m = 1 << p
    idx = (values >> np.uint64(64 - p)).astype(np.int64)
    with np.errstate(over="ignore"):
        rest = values << np.uint64(p)
    # rank = position of the leftmost 1-bit in the remaining 64-p bits,
    # 1-based; an all-zero remainder gets the maximum rank (64-p+1)
    nz = rest != 0
    lead = np.full(len(values), 64 - p + 1, dtype=np.uint8)
    lead[nz] = _clz64(rest[nz]) + np.uint8(1)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, lead)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate from a register vector.

    No large-range correction: the original paper's ``-2^32 *
    log(1 - E/2^32)`` term compensates 32-BIT hash collisions only. These
    sketches hash with 64 bits, where collisions are negligible below
    ~2^57 distinct keys — applying the 32-bit term would distort
    estimates above ~143M and return NaN above 2^32 (log of a negative).
    """
    m = len(regs)
    est = _alpha(m) * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    if est <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            est = m * np.log(m / zeros)  # linear counting for small n
    return float(est)


def approx_distinct(ds, col: str, *, p: int = 12, seed: int = 11) -> float:
    """Distributed approximate COUNT(DISTINCT col) over a Dataset.

    One streaming pass; each block ships a 2**p-byte partial; the driver
    max-merges (a bounded aggregate, never the data). Standard error is
    ~1.04/sqrt(2**p) (~1.6% at p=12).
    """
    m = 1 << p

    def partial(t: pa.Table) -> pa.Table:
        h = _hash_column(t[col], seed=seed)
        regs = hll_partial(h, p=p)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8(), m))})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    merged = np.zeros(m, dtype=np.uint8)
    for r in parts["regs"]:
        np.maximum(merged, np.asarray(r, dtype=np.uint8), out=merged)
    return hll_estimate(merged)
