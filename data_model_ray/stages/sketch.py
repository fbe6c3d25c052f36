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
    if "regs" not in parts.columns:  # empty input -> all-zero registers
        parts = parts.assign(regs=[])
    for r in parts["regs"]:
        np.maximum(merged, np.asarray(r, dtype=np.uint8), out=merged)
    return hll_estimate(merged)


# --- KLL-style mergeable quantile sketch ------------------------------------


class KLLSketch:
    """Mergeable quantile sketch (Karnin-Lang-Liberty 2016 family, public
    algorithm) with DETERMINISTIC compaction — the scale path for
    percentiles over 10^12 rows, next to the exact distributed order
    statistics in ``relational.quantile_prices``.

    Structure: geometric level buffers; an item at level h carries weight
    2**h. When a level overflows its capacity (k at the top, shrinking by
    2/3 per level down), the sorted buffer promotes every other item to
    the level above. The classic algorithm flips a random coin for the
    promotion offset; here the offset alternates through a counter, so a
    given insertion order always yields the same sketch (retry/resume
    reproducibility — the engine's determinism contract), while merges
    stay associative in the error bound.

    Size is O(k) floats regardless of n; merging concatenates level
    buffers and recompacts. Rank error is O(n / k) in the worst case and
    ~1/k-scale in practice (empirically bounded in tests/test_sketch.py).
    """

    __slots__ = ("k", "levels", "n", "_coin")

    def __init__(self, k: int = 256):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, np.float64)]
        self.n = 0
        self._coin = 0

    def _cap(self, h: int) -> int:
        top = len(self.levels) - 1
        return max(2, int(np.ceil(self.k * (2.0 / 3.0) ** (top - h))))

    def add(self, values: np.ndarray) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.n += len(v)
        self.levels[0] = np.concatenate([self.levels[0], v])
        self._compress()

    def _compress(self) -> None:
        h = 0
        while h < len(self.levels):
            if len(self.levels[h]) > self._cap(h):
                buf = np.sort(self.levels[h], kind="stable")
                if len(buf) % 2:
                    # odd size: the largest item stays behind (deterministic)
                    self.levels[h] = buf[-1:]
                    buf = buf[:-1]
                else:
                    self.levels[h] = buf[:0]
                off = self._coin & 1
                self._coin += 1
                promoted = buf[off::2]
                if h + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[h + 1] = np.concatenate(
                    [self.levels[h + 1], promoted]
                )
            h += 1

    def merge(self, other: "KLLSketch") -> "KLLSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
        for h, buf in enumerate(other.levels):
            if len(buf):
                self.levels[h] = np.concatenate([self.levels[h], buf])
        self.n += other.n
        self._coin += other._coin
        self._compress()
        return self

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate([b for b in self.levels]) if self.n else np.empty(0)
        wts = (
            np.concatenate(
                [np.full(len(b), 1 << h, dtype=np.int64)
                 for h, b in enumerate(self.levels)]
            )
            if self.n
            else np.empty(0, np.int64)
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        if self.n == 0:
            return float("nan")
        vals, wts = self._weighted()
        cw = np.cumsum(wts)
        target = min(max(q, 0.0), 1.0) * (cw[-1] - 1)
        idx = int(np.searchsorted(cw, target, side="right"))
        return float(vals[min(idx, len(vals) - 1)])

    def to_bytes(self) -> bytes:
        import struct

        head = struct.pack("<qqq", self.n, self._coin, len(self.levels))
        sizes = struct.pack(f"<{len(self.levels)}q", *[len(b) for b in self.levels])
        return head + sizes + b"".join(b.tobytes() for b in self.levels)

    @classmethod
    def from_bytes(cls, data: bytes, k: int = 256) -> "KLLSketch":
        import struct

        s = cls(k)
        s.n, s._coin, nlev = struct.unpack_from("<qqq", data, 0)
        sizes = struct.unpack_from(f"<{nlev}q", data, 24)
        off = 24 + 8 * nlev
        s.levels = []
        for sz in sizes:
            s.levels.append(
                np.frombuffer(data, dtype=np.float64, count=sz, offset=off).copy()
            )
            off += 8 * sz
        return s


def approx_quantiles(ds, col: str, qs: list[float], *, k: int = 256) -> dict[float, float]:
    """Distributed approximate quantiles in ONE streaming pass.

    Each block ships one O(k)-float KLL partial; the driver merges the
    tiny sketches (at cluster scale the same merge tree-reduces). Nothing
    data-sized moves — compare the exact path (relational.quantile_prices)
    which needs a histogram exchange per refinement round."""

    def partial(t: pa.Table) -> pa.Table:
        s = KLLSketch(k)
        arr = t[col]
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        s.add(arr.to_numpy(zero_copy_only=False).astype(np.float64))
        return pa.table({"sk": pa.array([s.to_bytes()], pa.binary())})

    merged = KLLSketch(k)
    for row in ds.map_batches(partial, batch_format="pyarrow").iter_rows():
        merged.merge(KLLSketch.from_bytes(row["sk"], k))
    return {q: merged.quantile(q) for q in qs}
