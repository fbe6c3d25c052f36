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

    def test_checkpoint_restore_roundtrip(self, ray_session, tmp_path):
        """save -> restore -> continue ingesting: the restored pool merges
        new rows into the checkpointed state exactly as an unbroken pool
        would (keys re-route by the same hash)."""
        import ray.data as rd

        rng = np.random.default_rng(23)
        df = pd.DataFrame(
            {
                "user_id": rng.integers(0, 40, 3000),
                "value": rng.uniform(0, 100, 3000),
            }
        )
        half = len(df) // 2
        ckpt = str(tmp_path / "keyed.parquet")

        # broken run: first half, checkpoint, restore, second half
        p1 = RunningAggregatorPool(num_buckets=4)
        p1.ingest_dataset(rd.from_pandas(df.iloc[:half]), key_col="user_id", value_col="value")
        n = p1.save(ckpt)
        assert n == df.iloc[:half]["user_id"].nunique()
        p2 = RunningAggregatorPool.restore(ckpt, num_buckets=4)
        p2.ingest_dataset(rd.from_pandas(df.iloc[half:]), key_col="user_id", value_col="value")

        # unbroken run over everything
        ref = RunningAggregatorPool(num_buckets=4)
        ref.ingest_dataset(rd.from_pandas(df), key_col="user_id", value_col="value")

        got, want = p2.snapshot(), ref.snapshot()
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert abs(got[k][1] - want[k][1]) < 1e-9
            assert got[k][2] == want[k][2]

    def test_checkpoint_restore_str_keys(self, ray_session, tmp_path):
        p = RunningAggregatorPool(num_buckets=3)
        p.ingest(
            pd.DataFrame({"k": ["a", "b", "a"], "v": [1.0, 2.0, 3.0]}),
            key_col="k",
            value_col="v",
        )
        ckpt = str(tmp_path / "s.parquet")
        p.save(ckpt)
        r = RunningAggregatorPool.restore(ckpt, num_buckets=3)
        r.ingest(pd.DataFrame({"k": ["a"], "v": [10.0]}), key_col="k", value_col="v")
        assert r.snapshot()["a"] == (3, 14.0, 10.0)
        assert r.snapshot()["b"] == (1, 2.0, 2.0)
