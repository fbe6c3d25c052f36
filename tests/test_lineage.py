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
