"""Resume/lineage tests (FIXTURES.md section 3.7): rerun must skip finished
partitions (counters prove zero reprocessed rows) and produce identical
output to an uninterrupted run."""

import glob
import os

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from data_model_ray.state.lineage import (
    LineageLog,
    read_output,
    resumable_write,
    validate_partition,
    write_partition_atomic,
)


def make_ds(n=2000):
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(3)
    t = pa.table(
        {
            "pkey": pa.array([f"g{i % 7}" for i in range(n)]),
            "x": pa.array(rng.integers(0, 1000, n)),
        }
    )
    return rd.from_arrow(t), t


class TestResumableWrite:
    def test_full_write_and_readback(self, ray_session, tmp_path):
        out = str(tmp_path / "o1")
        ds, t = make_ds()
        summary = resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        assert summary["partitions_written"] == 7
        assert summary["partitions_skipped"] == 0
        assert summary["rows_written"] == 2000
        back = read_output(out).to_pandas().sort_values(["pkey", "x"], kind="mergesort")
        want = t.to_pandas().sort_values(["pkey", "x"], kind="mergesort")
        np.testing.assert_array_equal(back["x"].to_numpy(), want["x"].to_numpy())

    def test_resume_skips_done_partitions(self, ray_session, tmp_path):
        out = str(tmp_path / "o2")
        ds, t = make_ds()
        # simulate a truncated run: write only partitions g0..g2 manually
        df = t.to_pandas()
        import pyarrow as pa

        log = LineageLog(out)
        for pk in ["g0", "g1", "g2"]:
            sub = pa.Table.from_pandas(df[df["pkey"] == pk], preserve_index=False)
            rec = write_partition_atomic(sub, out, pk, "fp1")
            log.append(rec)
        # rerun the full job: must only write the remaining 4 partitions
        summary = resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        assert summary["partitions_skipped"] == 3
        assert summary["partitions_written"] == 4
        # and the final output equals an uninterrupted run
        out2 = str(tmp_path / "o2_full")
        resumable_write(ds, out2, partition_col="pkey", fingerprint="fp1")
        a = read_output(out).to_pandas().sort_values(["pkey", "x"], kind="mergesort").reset_index(drop=True)
        b = read_output(out2).to_pandas().sort_values(["pkey", "x"], kind="mergesort").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_fingerprint_change_rewrites(self, ray_session, tmp_path):
        out = str(tmp_path / "o3")
        ds, _ = make_ds()
        resumable_write(ds, out, partition_col="pkey", fingerprint="fpA")
        summary = resumable_write(ds, out, partition_col="pkey", fingerprint="fpB")
        assert summary["partitions_skipped"] == 0  # input changed -> rewrite all
        assert summary["partitions_written"] == 7

    def test_corrupt_partition_detected(self, ray_session, tmp_path):
        out = str(tmp_path / "o4")
        ds, _ = make_ds()
        resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        # corrupt one file
        victim = glob.glob(os.path.join(out, "part=g3", "*.parquet"))[0]
        with open(victim, "wb") as f:
            f.write(b"garbage")
        assert validate_partition(out, "g3", "fp1") is None
        summary = resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        assert summary["partitions_written"] == 1  # only the corrupt one
        assert summary["partitions_skipped"] == 6
        assert pq.ParquetFile(victim).metadata.num_rows > 0

    def test_idempotent_rerun_noop(self, ray_session, tmp_path):
        out = str(tmp_path / "o5")
        ds, _ = make_ds()
        resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        summary = resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        assert summary["partitions_written"] == 0
        assert summary["partitions_skipped"] == 7
        assert summary["rows_written"] == 0

    def test_lineage_counters(self, ray_session, tmp_path):
        out = str(tmp_path / "o6")
        ds, t = make_ds()
        resumable_write(ds, out, partition_col="pkey", fingerprint="fp1")
        recs = LineageLog(out).records()
        assert len(recs) == 7
        assert sum(r["rows_out"] for r in recs) == 2000
        for r in recs:
            assert r["status"] == "done"
            assert r["input_fingerprint"] == "fp1"
            assert r["bytes_out"] > 0


class TestOperatorMetrics:
    def test_emit_metrics_records(self, ray_session, tmp_path):
        """Executed-DAG counters land in the lineage stream: one record
        per operator with tasks/blocks/wall and total rows out."""
        import ray.data as rd

        from data_model_ray.state.lineage import LineageLog
        from data_model_ray.state.metrics import emit_metrics

        ds = (
            rd.range(5000)
            .repartition(4)
            .map_batches(lambda d: d, batch_format="pandas")
            .materialize()
        )
        recs = emit_metrics(ds, str(tmp_path), run="unit")
        assert len(recs) >= 2
        names = [r["operator"] for r in recs]
        assert any("MapBatches" in n for n in names)
        final = [r for r in recs if "MapBatches" in r["operator"]][-1]
        assert final["rows_out"] == 5000
        assert final["tasks"] >= 1 and final["wall_s"] >= 0.0
        on_disk = [r for r in LineageLog(str(tmp_path)).records() if r["stage"] == "metrics"]
        assert len(on_disk) == len(recs)
        assert all(r["run"] == "unit" for r in on_disk)

    def test_flagship_emits_metrics(self, ray_session, tmp_path):
        from data_model_ray.pipelines.flagship import FlagshipConfig, run_flagship
        from data_model_ray.state.lineage import LineageLog

        run_flagship(
            n_rows=3000,
            out_dir=str(tmp_path / "pyr"),
            cfg=FlagshipConfig(geoindex_concurrency=(1, 2), rasterize=False),
        )
        recs = [
            r
            for r in LineageLog(str(tmp_path / "pyr")).records()
            if r["stage"] == "metrics"
        ]
        assert recs, "flagship must emit operator counters"
        assert any("enrich" in r["operator"].lower() for r in recs)
