"""Both dedup strategies must produce identical deterministic output."""

import numpy as np
import pandas as pd
import pytest

from data_model_ray import fixtures
from data_model_ray.stages.dedup import dedup_exact, dedup_exact_index


@pytest.fixture(scope="module")
def pages_df(ray_session):
    import ray.data as rd

    t = fixtures.pages_batch(np.arange(8000)).drop_columns(["html"])
    return rd.from_arrow(t).repartition(6).materialize()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(["url"], kind="mergesort").reset_index(drop=True)


class TestDedupModes:
    def test_modes_agree(self, pages_df):
        a = _norm(
            dedup_exact(
                pages_df, key="url", order_col="warc_ts", num_buckets=8
            ).to_pandas()
        )
        b = _norm(
            dedup_exact_index(
                pages_df, key="url", order_col="warc_ts", num_actors=4
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(a, b)
        # latest-wins: every kept duplicate row carries the max warc_ts
        src = fixtures.pages_batch(np.arange(8000)).to_pandas()
        want = (
            src.sort_values(["url", "warc_ts"], kind="mergesort")
            .drop_duplicates(subset="url", keep="last")
        )
        assert len(a) == len(want)
        got_ts = a.set_index("url")["warc_ts"].sort_index()
        want_ts = want.set_index("url")["warc_ts"].sort_index()
        assert (got_ts == want_ts).all()

    def test_order_ties_keep_exactly_one_row(self, ray_session):
        """Rows sharing (key, order) must resolve to ONE winner in both modes,
        picked by the row-content tiebreak hash (ADVICE round 1: the old h2
        was a key hash, so ties kept multiple rows)."""
        import ray.data as rd

        ts = pd.Timestamp("2024-06-01")
        df = pd.DataFrame(
            {
                "url": ["u1", "u1", "u1", "u2", "u2", "u3"],
                "warc_ts": [ts, ts, ts, ts, ts, ts],
                "payload": ["a", "b", "c", "x", "y", "z"],
            }
        )
        # spread the tied rows across blocks so the tie is cross-batch
        ds = rd.from_pandas(df).repartition(3).materialize()
        a = _norm(
            dedup_exact(ds, key="url", order_col="warc_ts", num_buckets=2).to_pandas()
        )
        b = _norm(
            dedup_exact_index(
                ds, key="url", order_col="warc_ts", num_actors=2
            ).to_pandas()
        )
        assert list(a["url"]) == ["u1", "u2", "u3"]
        pd.testing.assert_frame_equal(a, b)

    def test_index_mode_deterministic_across_runs(self, pages_df):
        a = _norm(
            dedup_exact_index(
                pages_df, key="url", order_col="warc_ts", num_actors=4
            ).to_pandas()
        )
        b = _norm(
            dedup_exact_index(
                pages_df, key="url", order_col="warc_ts", num_actors=2
            ).to_pandas()
        )
        pd.testing.assert_frame_equal(a, b)
