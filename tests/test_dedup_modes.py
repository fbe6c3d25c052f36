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


class TestCurateMethodParity:
    """curate_docs routes near-dup pair generation through MinHash-LSH by
    default (the 100-TB path); exact all-pairs Jaccard is the oracle mode.
    Both must produce identical curated output (LSH recall is 100% on the
    fixtures — the invariant the shared DuckDB CTE oracle relies on)."""

    def test_lsh_default_equals_exact_mode(self, ray_session):
        from data_model_ray.pipelines.curate import curate_docs

        sf = "/root/testdata/sf0.001"
        lsh = _norm_ids(curate_docs(sf, method="lsh").to_pandas())
        exact = _norm_ids(curate_docs(sf, method="exact").to_pandas())
        pd.testing.assert_frame_equal(lsh, exact)
        assert len(lsh) > 0

    def test_unknown_method_raises(self, ray_session):
        from data_model_ray.pipelines.curate import curate_docs

        with pytest.raises(ValueError, match="unknown near-dup method"):
            curate_docs("/root/testdata/sf0.001", method="bogus")

    def test_lsh_pairs_equal_exact_pairs_on_dataset_input(self, ray_session):
        """minhash_lsh_candidates(docs=ds) (the in-pipeline composition
        path) must produce the exact verified pair set jaccard_all_pairs
        computes over the same Dataset."""
        from data_model_ray.sources.fs import sized_read_parquet
        from data_model_ray.stages.neardup import (
            jaccard_all_pairs,
            minhash_lsh_candidates,
        )

        ds = sized_read_parquet(
            "/root/testdata/sf0.001/documents.parquet",
            columns=["doc_id", "text"],
        ).materialize()
        lsh = (
            minhash_lsh_candidates(docs=ds, threshold=0.5)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"], kind="mergesort")
            .reset_index(drop=True)
        )
        exact = (
            jaccard_all_pairs(docs=ds, threshold=0.5)
            .to_pandas()
            .sort_values(["doc_a", "doc_b"], kind="mergesort")
            .reset_index(drop=True)
        )
        assert len(exact) > 0
        pd.testing.assert_frame_equal(lsh, exact)


def _norm_ids(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
