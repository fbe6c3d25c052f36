"""Keyed incremental-state actor pool tests."""

import numpy as np
import pandas as pd

from data_model_ray.state.keyed import RunningAggregatorPool


class TestRunningAggregator:
    def test_matches_pandas_groundtruth(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(6)
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 50, 5000),
                "value": rng.uniform(0, 100, 5000),
            }
        )
        pool = RunningAggregatorPool(num_buckets=4)
        ds = rd.from_pandas(df).repartition(6)
        for batch in ds.iter_batches(batch_size=512, batch_format="pandas"):
            pool.ingest(batch, key_col="user_id", value_col="value")
        snap = pool.snapshot()
        want = df.groupby("user_id")["value"].agg(["count", "sum", "max"])
        assert len(snap) == len(want)
        for k, (cnt, s, mx) in snap.items():
            assert cnt == want.loc[k, "count"]
            assert abs(s - want.loc[k, "sum"]) < 1e-6
            assert mx == want.loc[k, "max"]

    def test_ingest_from_tasks_matches_groundtruth(self, ray_session):
        """ingest_dataset routes every block from INSIDE a Ray task — the
        driver never iterates batches — and the snapshot still matches
        the pandas ground truth (commutative aggregates: task arrival
        order is immaterial)."""
        import ray.data as rd

        rng = np.random.default_rng(11)
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 80, 6000),
                "value": rng.uniform(0, 100, 6000),
            }
        )
        pool = RunningAggregatorPool(num_buckets=4)
        n = pool.ingest_dataset(
            rd.from_pandas(df).repartition(8), key_col="user_id", value_col="value"
        )
        assert n == len(df)
        snap = pool.snapshot()
        want = df.groupby("user_id")["value"].agg(["count", "sum", "max"])
        assert len(snap) == len(want)
        for k, (cnt, s, mx) in snap.items():
            assert cnt == want.loc[k, "count"]
            assert abs(s - want.loc[k, "sum"]) < 1e-6
            assert mx == want.loc[k, "max"]

    def test_ingest_dataset_empty(self, ray_session):
        import ray.data as rd

        pool = RunningAggregatorPool(num_buckets=2)
        n = pool.ingest_dataset(
            rd.from_pandas(pd.DataFrame({"k": pd.Series(dtype="int64"), "v": pd.Series(dtype="float64")})),
            key_col="k",
            value_col="v",
        )
        assert n == 0
        assert pool.snapshot() == {}

    def test_incremental_snapshots(self, ray_session):
        pool = RunningAggregatorPool(num_buckets=2)
        b1 = pd.DataFrame({"k": ["a", "b"], "v": [1.0, 2.0]})
        b2 = pd.DataFrame({"k": ["a"], "v": [5.0]})
        pool.ingest(b1, key_col="k", value_col="v")
        assert pool.snapshot()["a"] == (1, 1.0, 1.0)
        pool.ingest(b2, key_col="k", value_col="v")
        assert pool.snapshot()["a"] == (2, 6.0, 5.0)
        assert pool.snapshot()["b"] == (1, 2.0, 2.0)
