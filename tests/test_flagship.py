"""End-to-end flagship integration tests (FIXTURES.md section 3.3 join goldens).

The BASELINE correctness invariants: identical join output row counts,
identical tile/cell assignment per url, byte-identical extracted text per
url (enforced in-stream by the extract stage; any violation raises).
"""

import numpy as np
import pandas as pd
import pytest

from data_model_ray import fixtures, grid
from data_model_ray.functions.pip import PolygonIndex
from data_model_ray.pipelines.flagship import FlagshipConfig, pages_to_cells
from data_model_ray.stages.geoindex import build_granule_index

N = 3000


@pytest.fixture(scope="module")
def flagship_result(ray_session):
    ds = fixtures.pages_dataset(N, parallelism=4)
    cfg = FlagshipConfig(geoindex_concurrency=(1, 2), dedup_buckets=8, cell_buckets=8)
    deduped, cells = pages_to_cells(ds, cfg)
    return deduped.to_pandas(), cells.to_pandas()


@pytest.fixture(scope="module")
def golden():
    """Independent driver-side golden: expected per-url assignments."""
    ids = np.arange(N)
    geo = fixtures.pages_expected_geo(ids)
    pages = fixtures.pages_batch(ids)
    granule_idx = build_granule_index(fixtures.mgrs_granules())
    admin_idx = PolygonIndex(fixtures.admin_polygons())
    df = pd.DataFrame(
        {
            "url": pages["url"].to_pylist(),
            "warc_ts": pages["warc_ts"].to_pandas(),
            "lat": geo["lat"],
            "lon": geo["lon"],
            "h3_7": grid.geocell_encode(geo["lat"], geo["lon"], 7),
            "s2_12": grid.s2_encode(geo["lat"], geo["lon"], 12),
            "mgrs": granule_idx.assign(geo["lon"], geo["lat"]),
            "admin_l0": admin_idx.assign(geo["lon"], geo["lat"], 0),
            "admin_l1": admin_idx.assign(geo["lon"], geo["lat"], 1),
        }
    )
    # latest-wins dedup
    df = df.sort_values(["url", "warc_ts"], kind="mergesort")
    return df[~df.duplicated(subset=["url"], keep="last")]


class TestFlagshipGoldens:
    def test_join_output_row_counts(self, flagship_result, golden):
        deduped, _ = flagship_result
        assert len(deduped) == len(golden)
        assert deduped["url"].is_unique

    def test_cell_assignment_per_url(self, flagship_result, golden):
        deduped, _ = flagship_result
        got = deduped.set_index("url").sort_index()
        want = golden.set_index("url").sort_index()
        for col in ("h3_7", "s2_12", "mgrs", "admin_l0", "admin_l1"):
            np.testing.assert_array_equal(
                got[col].to_numpy(), want[col].to_numpy(), err_msg=col
            )

    def test_latest_warc_ts_won(self, flagship_result, golden):
        deduped, _ = flagship_result
        got = deduped.set_index("url")["warc_ts"].sort_index()
        want = golden.set_index("url")["warc_ts"].sort_index()
        assert (got == want).all()

    def test_granule_join_counts(self, flagship_result, golden):
        deduped, _ = flagship_result
        got = deduped.groupby("mgrs").size().sort_index()
        want = golden.groupby("mgrs").size().sort_index()
        pd.testing.assert_series_equal(got, want)

    def test_cell_aggregate_matches_pandas(self, flagship_result, golden):
        _, cells = flagship_result
        got = cells.set_index("cell").sort_index()
        g = golden.copy()
        g["cell"] = g["h3_7"]
        want_pages = g.groupby("cell").size().sort_index()
        np.testing.assert_array_equal(got["pages"].to_numpy(), want_pages.to_numpy())
        # bbox of points per cell
        want_lat_min = g.groupby("cell")["lat"].min().sort_index()
        np.testing.assert_allclose(
            got["lat_min"].to_numpy(), want_lat_min.to_numpy()
        )

    def test_resumable_assignments(self, ray_session, tmp_path):
        import ray.data as rd

        from data_model_ray.pipelines.flagship import write_assignments
        from data_model_ray.state.lineage import LineageLog, read_output

        ds = fixtures.pages_dataset(1500, parallelism=4)
        cfg = FlagshipConfig(geoindex_concurrency=(1, 2), dedup_buckets=8)
        deduped, _ = pages_to_cells(ds, cfg)
        deduped = deduped.materialize()
        out = str(tmp_path / "assignments")
        s1 = write_assignments(deduped, out, fingerprint="n1500")
        assert s1["partitions_skipped"] == 0 and s1["rows_written"] > 0
        # rerun: everything skipped, zero rows reprocessed
        s2 = write_assignments(deduped, out, fingerprint="n1500")
        assert s2["partitions_written"] == 0
        assert s2["partitions_skipped"] == s1["partitions_written"]
        assert s2["rows_written"] == 0
        back = read_output(out)
        assert back.count() == s1["rows_written"]
        recs = LineageLog(out).records()
        assert sum(r["rows_out"] for r in recs) == s1["rows_written"]

    def test_flagship_rerun_resumes(self, ray_session, tmp_path):
        """FIXTURES 3.7: a full rerun against an existing output skips every
        pyramid level (lineage proves zero recompute) and yields an
        identical manifest."""
        from data_model_ray.pipelines.flagship import run_flagship
        from data_model_ray.state.lineage import LineageLog

        out = str(tmp_path / "pyr")
        cfg = FlagshipConfig(geoindex_concurrency=(1, 2), dedup_buckets=8)
        r1 = run_flagship(n_rows=2000, out_dir=out, cfg=cfg)
        r2 = run_flagship(n_rows=2000, out_dir=out, cfg=cfg)
        assert r2["manifest"] == r1["manifest"]
        all_recs = LineageLog(out).records()
        # pyramid write/skip records only (the metrics stage interleaves
        # per-operator counters into the same stream)
        recs = [r for r in all_recs if r.get("stage") == "pyramid"]
        n_levels = len(r1["manifest"]["levels"])
        assert [r["status"] for r in recs] == ["done"] * n_levels + [
            "skipped_valid"
        ] * n_levels
        assert any(r.get("stage") == "metrics" for r in all_recs)

    def test_lang_first_deterministic(self, flagship_result, golden):
        _, cells = flagship_result
        ids = np.arange(N)
        pages = fixtures.pages_batch(ids).to_pandas()
        geo = fixtures.pages_expected_geo(ids)
        pages["cell"] = grid.geocell_encode(geo["lat"], geo["lon"], 7)
        first = (
            pages.sort_values("url", kind="mergesort")
            .drop_duplicates(subset=["cell"], keep="first")
            .set_index("cell")["lang"]
            .sort_index()
        )
        got = cells.set_index("cell")["lang_first"].sort_index()
        assert (got == first).all()
