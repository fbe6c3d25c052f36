"""Unit tests for the round-5 bucketed-window machinery: bucket-count
invariance of keyed_window_exchange, cross-range carry correctness of the
watermark prefix-max, and the sliding-window composite-key fast path vs
its per-segment fallback."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _events_df(n=2000, users=37, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": rng.integers(0, users, n).astype(np.int64),
            "ts": (1_700_000_000_000_000 + rng.integers(0, 3_000_000_000_000, n)).astype(
                "datetime64[us]"
            ),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )


class TestKeyedWindowExchange:
    def test_bucket_count_invariance(self, ray_session, tmp_path):
        import pyarrow.parquet as pq
        import ray.data as rd

        from data_model_ray.pipelines.relational import keyed_window_exchange

        df = _events_df()
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False), str(d / "e.parquet"))

        def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
            rs = g.groupby("user_id", sort=False)["value"].cumsum()
            return pd.DataFrame(
                {"event_id": g["event_id"].to_numpy(), "run": rs.to_numpy()}
            )

        outs = []
        for nb in (5, 64):
            ds = rd.from_pandas(df).repartition(6)
            out = (
                keyed_window_exchange(ds, "user_id", per_bucket, num_buckets=nb)
                .to_pandas()
                .sort_values("event_id")
                .reset_index(drop=True)
            )
            outs.append(out)
        pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
        # ground truth: pandas per-user cumsum in (ts, event_id) order
        df2 = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        want = (
            pd.DataFrame(
                {
                    "event_id": df2["event_id"].to_numpy(),
                    "run": df2.groupby("user_id", sort=False)["value"].cumsum().to_numpy(),
                }
            )
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(outs[0], want, check_exact=True)


class TestWatermarkCarry:
    def test_cross_range_carry(self, ray_session, tmp_path):
        """An event whose watermark-setting predecessor lives in a DIFFERENT
        id-range must still be flagged late (the driver-side exclusive
        scan carries range maxima across the exchange)."""
        import pyarrow.parquet as pq

        from data_model_ray.pipelines.olap import late_event_flags

        # arrival order = knuth-hash of event_id; choose a tiny corpus and
        # verify against a brute-force replay of the same definition
        df = _events_df(n=500, users=7, seed=11)
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), str(d / "events.parquet")
        )
        delay_s = 20_000  # ~ a third of the ts span above
        got = (
            late_event_flags(str(d), delay_s=delay_s, num_ranges=8)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # brute force
        KNUTH = np.uint64(2654435761)
        akey = ((df["event_id"].to_numpy(np.uint64) * KNUTH) & np.uint64(0xFFFFFFFF)).astype(
            np.int64
        )
        order = np.lexsort((df["event_id"].to_numpy(), akey))
        ts = df["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)[order]
        prior = np.empty(len(ts), dtype=np.int64)
        prior[0] = np.iinfo(np.int64).min
        np.maximum.accumulate(ts[:-1], out=prior[1:])
        late = (prior != np.iinfo(np.int64).min) & (ts < prior - delay_s * 1_000_000)
        want = (
            pd.DataFrame(
                {
                    "event_id": df["event_id"].to_numpy()[order],
                    "is_late": late.astype(np.int64),
                }
            )
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert int(want["is_late"].sum()) > 0  # non-vacuous fixture
        pd.testing.assert_frame_equal(got, want, check_exact=True)


class TestSlidingWindowPaths:
    def test_fast_path_matches_fallback(self, ray_session, tmp_path):
        """The composite-key searchsorted fast path and the per-segment
        fallback produce identical windows."""
        import pyarrow.parquet as pq

        from data_model_ray.pipelines import relational

        df = _events_df(n=1500, users=11, seed=5)
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(
            pa.Table.from_pandas(df, preserve_index=False), str(d / "events.parquet")
        )
        fast = (
            relational.sliding_window_sum(str(d))
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        # replicate the per-segment fallback inline and require equality
        ts = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = ts["user_id"].to_numpy(np.int64)
        tsv = ts["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        v = ts["value"].to_numpy(np.float64)
        w_us = 3600 * 1_000_000
        new = np.r_[True, uid[1:] != uid[:-1]]
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], len(uid)]
        win = np.empty(len(uid))
        for s, e in zip(starts, ends):
            seg_ts = tsv[s:e]
            cs = np.concatenate([[0.0], np.cumsum(v[s:e])])
            lo = np.searchsorted(seg_ts, seg_ts - w_us, side="left")
            hi = np.searchsorted(seg_ts, seg_ts, side="right")
            win[s:e] = np.round(cs[hi] - cs[lo], 6)
        want = (
            pd.DataFrame({"event_id": ts["event_id"].to_numpy(), "win_sum": win})
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(fast, want, check_exact=False, atol=1e-9)


class TestWithinDocParaDedup:
    def test_removes_planted_repeat(self, ray_session, tmp_path):
        """A doc repeating a full 16-token window keeps only the first
        copy; untouched docs round-trip byte-identically."""
        import pyarrow.parquet as pq

        from data_model_ray.pipelines.webtext import within_doc_para_dedup

        w = " ".join(f"t{i}" for i in range(16))
        tail = " ".join(f"x{i}" for i in range(16))
        docs = pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array([f"{w} {w} {tail}", tail], pa.string()),
            }
        )
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(docs, str(d / "documents.parquet"))
        out = (
            within_doc_para_dedup(str(d))
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert out.loc[0, "n_paras"] == 3
        assert out.loc[0, "n_removed"] == 1
        assert out.loc[0, "kept_text"] == f"{w} {tail}"
        assert out.loc[1, "n_removed"] == 0
        assert out.loc[1, "kept_text"] == tail
