"""HyperLogLog sketch + distributed quantile refinement tests."""

import numpy as np
import pandas as pd

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
