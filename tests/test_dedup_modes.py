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
