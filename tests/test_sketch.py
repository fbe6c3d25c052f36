"""HyperLogLog sketch + distributed quantile refinement tests."""

import numpy as np
import pandas as pd
import pytest

from data_model_ray.hashing import hash_stream
from data_model_ray.stages.sketch import (
    _clz64,
    approx_distinct,
    hll_estimate,
    hll_partial,
)

SF_DIR = "/root/testdata/sf0.001"


class TestHllKernel:
    def test_clz_exact_vs_bit_length(self):
        rng = np.random.default_rng(0)
        x = np.concatenate(
            [
                rng.integers(1, 2**63, 5000, dtype=np.uint64) | np.uint64(1),
                np.array([1, 2, 3, 2**62, 2**63, 2**64 - 1], dtype=np.uint64),
            ]
        )
        want = np.array([64 - int(v).bit_length() for v in x], dtype=np.uint8)
        np.testing.assert_array_equal(_clz64(x), want)

    def test_merge_invariance(self):
        """Register max-merge over any block split == single-pass result."""
        h = hash_stream(np.arange(50_000, dtype=np.uint64), 11)
        whole = hll_partial(h)
        for n_chunks in (2, 7, 33):
            regs = np.zeros(4096, dtype=np.uint8)
            for c in np.array_split(h, n_chunks):
                np.maximum(regs, hll_partial(c), out=regs)
            np.testing.assert_array_equal(regs, whole)

    def test_accuracy_bands(self):
        for n in (100, 5_000, 300_000):
            h = hash_stream(np.arange(n, dtype=np.uint64), 11)
            est = hll_estimate(hll_partial(h))
            assert abs(est - n) / n < 0.05, (n, est)

    def test_duplicates_do_not_inflate(self):
        base = hash_stream(np.arange(1000, dtype=np.uint64), 11)
        dup = np.tile(base, 50)
        np.testing.assert_array_equal(hll_partial(dup), hll_partial(base))

    def test_no_32bit_large_range_correction(self):
        """With 64-bit hashes the old 2^32 large-range correction is wrong:
        it distorted estimates above ~143M and produced NaN above 2^32.
        A register state implying a multi-billion cardinality must yield a
        finite, monotone estimate."""
        m = 4096
        # raw estimate with all registers at r: alpha*m*2^r — register
        # value 21 implies ~8.6e9 (> 2^32), 22 implies ~1.7e10
        lo = hll_estimate(np.full(m, 21, dtype=np.uint8))
        hi = hll_estimate(np.full(m, 22, dtype=np.uint8))
        assert np.isfinite(lo) and np.isfinite(hi)
        assert 2.0**32 < lo < hi
        # and the 100M-1B band (formerly distorted) stays plausible:
        # uniform registers at 17 -> alpha*m*2^17 ~ 5.4e8
        mid = hll_estimate(np.full(m, 17, dtype=np.uint8))
        assert 1e8 < mid < 1e9


class TestApproxDistinctRay:
    def test_int_and_string_columns(self, ray_session):
        from data_model_ray.pipelines.relational import _read

        exact_users = (
            pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])[
                "user_id"
            ].nunique()
        )
        est = approx_distinct(_read(SF_DIR, "events", ["user_id"]), "user_id")
        assert abs(est - exact_users) / exact_users < 0.05

        exact_texts = (
            pd.read_parquet(f"{SF_DIR}/documents.parquet", columns=["text"])[
                "text"
            ].nunique()
        )
        est = approx_distinct(_read(SF_DIR, "documents", ["text"]), "text")
        assert abs(est - exact_texts) / exact_texts < 0.06


class TestQuantileRefinement:
    def test_forced_refinement_matches_direct(self, ray_session):
        """A 1-row collect_cap forces the histogram-narrowing loop; the
        result must equal the wide-cap (single-pass) answer exactly."""
        from data_model_ray.pipelines.relational import quantile_prices

        wide = quantile_prices(SF_DIR, qs=(0.5,), collect_cap=10**9)
        narrow = quantile_prices(SF_DIR, qs=(0.5,), num_bins=8, collect_cap=50)
        assert wide["val"].iloc[0] == narrow["val"].iloc[0]

    def test_matches_numpy_order_statistic(self, ray_session):
        from data_model_ray.pipelines.relational import quantile_prices

        vals = np.sort(
            pd.read_parquet(
                f"{SF_DIR}/lineitem.parquet", columns=["l_extendedprice"]
            )["l_extendedprice"].to_numpy()
        )
        n = len(vals)
        out = quantile_prices(SF_DIR, qs=(0.1, 0.5, 0.99))
        for _, row in out.iterrows():
            assert row["val"] == vals[int(np.floor((n - 1) * row["q"]))]


class TestSpaceSaving:
    def test_exact_regime_matches_groupby(self, ray_session):
        """capacity >= per-block distinct keys -> no eviction -> exact."""
        from data_model_ray.pipelines.analytic import spacesaving_topk

        got = spacesaving_topk(SF_DIR, k=10, capacity=4096).to_pandas()
        ev = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id"])
        want = (
            ev.groupby("user_id").size().rename("n").reset_index()
            .sort_values(["n", "user_id"], ascending=[False, True])
            .head(10).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True), want, check_dtype=False
        )

    def test_bounded_error_regime_finds_planted_heavy_hitters(self, ray_session):
        """capacity << distinct keys: estimates overshoot by at most the
        evicted minimum per block, and planted heavy keys must surface."""
        import ray.data as rd

        from data_model_ray.pipelines import analytic

        rng = np.random.default_rng(7)
        # 20k tail keys (1x each) + 5 heavy keys (2000x each)
        tail = rng.integers(1_000, 1_000_000, 20_000, dtype=np.int64)
        heavy = np.repeat(np.arange(5, dtype=np.int64), 2000)
        keys = rng.permutation(np.concatenate([tail, heavy]))
        ds = rd.from_pandas(pd.DataFrame({"user_id": keys})).repartition(8)

        orig_read = analytic._read
        try:
            analytic._read = lambda sf, t, cols=None: ds
            got = analytic.spacesaving_topk("x", k=5, capacity=64).to_pandas()
        finally:
            analytic._read = orig_read

        assert set(got["user_id"]) == set(range(5))
        true_n = 2000
        for n_est in got["n"]:
            assert n_est >= true_n  # upper-bound estimates never undercount
            # overshoot <= E = sum of per-block error floors (each block's
            # largest DROPPED count — a small tail count here), NOT the
            # old max-inherited value; 8 blocks x tiny tail counts
            assert n_est <= true_n + 8 * 8


class TestKLLQuantiles:
    def _rank_err(self, x, est, q):
        return abs(np.searchsorted(np.sort(x), est) / len(x) - q)

    @pytest.mark.parametrize("dist", ["normal", "zipfish", "sorted"])
    def test_error_bands(self, dist):
        from data_model_ray.stages.sketch import KLLSketch

        rng = np.random.default_rng(5)
        if dist == "normal":
            x = rng.normal(size=80_000)
        elif dist == "zipfish":
            x = 1.0 / rng.uniform(1e-4, 1.0, size=80_000)
        else:
            x = np.arange(80_000, dtype=np.float64)
        s = KLLSketch(256)
        for chunk in np.array_split(x, 23):
            s.add(chunk)
        for q in (0.01, 0.1, 0.5, 0.9, 0.99):
            assert self._rank_err(x, s.quantile(q), q) < 0.02

    def test_deterministic_same_split(self):
        from data_model_ray.stages.sketch import KLLSketch

        x = np.random.default_rng(9).normal(size=50_000)
        outs = []
        for _ in range(2):
            s = KLLSketch(128)
            for chunk in np.array_split(x, 17):
                s.add(chunk)
            outs.append([s.quantile(q) for q in (0.1, 0.5, 0.9)])
        assert outs[0] == outs[1]

    def test_merge_error_bounded(self):
        from data_model_ray.stages.sketch import KLLSketch

        x = np.random.default_rng(13).normal(size=60_000)
        parts = []
        for chunk in np.array_split(x, 8):
            s = KLLSketch(256)
            s.add(chunk)
            parts.append(s)
        merged = parts[0]
        for p in parts[1:]:
            merged.merge(p)
        assert merged.n == len(x)
        for q in (0.1, 0.5, 0.9):
            assert self._rank_err(x, merged.quantile(q), q) < 0.02

    def test_serialization_roundtrip(self):
        from data_model_ray.stages.sketch import KLLSketch

        s = KLLSketch(64)
        s.add(np.arange(10_000, dtype=np.float64))
        s2 = KLLSketch.from_bytes(s.to_bytes(), 64)
        assert s2.n == s.n
        assert all((a == b).all() for a, b in zip(s.levels, s2.levels))
        assert s.quantile(0.5) == s2.quantile(0.5)

    def test_nan_ignored_and_empty(self):
        from data_model_ray.stages.sketch import KLLSketch

        s = KLLSketch(64)
        assert np.isnan(s.quantile(0.5))
        s.add(np.array([np.nan, 1.0, np.nan, 2.0]))
        assert s.n == 2

    def test_ray_e2e_vs_exact(self, ray_session):
        from data_model_ray.pipelines.relational import _read
        from data_model_ray.stages.sketch import approx_quantiles

        sf = "/root/testdata/sf0.01"
        est = approx_quantiles(_read(sf, "events", ["value"]), "value",
                               [0.1, 0.5, 0.9], k=256)
        vals = np.sort(
            pd.read_parquet(f"{sf}/events.parquet", columns=["value"])["value"]
            .dropna()
            .to_numpy()
        )
        for q, e in est.items():
            assert abs(np.searchsorted(vals, e) / len(vals) - q) < 0.02
