"""Per-partition lineage records + resumable partitioned parquet sink.

Re-derives the reference's resumability core — band-by-band writes with
validate-existing / skip-if-valid / cleanup-and-retry
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:974-1183,
``validate_existing_band_data`` /root/reference/src/eopf_geozarr/conversion/
utils.py:192-258) — for a Ray Data world:

- output is **one directory per partition key** (resumable layout), each
  written atomically: temp file + ``os.replace`` (idempotent under Ray task
  retries — a retried task re-renames the same content);
- every partition emits a **lineage record**
  ``{stage, partition_key, input_fingerprint, rows_out, bytes_out, status,
  wall_s}`` appended to ``_lineage.jsonl`` (the metrics/counters stream the
  north rule requires);
- a rerun **skips** partitions whose output passes validation
  (file exists + readable + matching fingerprint in the parquet footer
  metadata) — rows of completed partitions are dropped right after the
  read via a broadcast done-set, so no downstream work is repeated.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

FINGERPRINT_KEY = b"graft_input_fingerprint"


class LineageLog:
    """Append-only JSONL lineage/counters log for one output directory."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_lineage.jsonl")
        os.makedirs(out_dir, exist_ok=True)

    def append(self, record: dict[str, Any]) -> None:
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")

    def append_many(self, records: list[dict[str, Any]]) -> None:
        with open(self.path, "a") as f:
            for r in records:
                f.write(json.dumps(r, default=str) + "\n")

    def records(self) -> list[dict[str, Any]]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]

    def completed(self, stage: str, fingerprint: str) -> set[str]:
        done = set()
        for r in self.records():
            if (
                r.get("stage") == stage
                and r.get("input_fingerprint") == fingerprint
                and r.get("status") == "done"
            ):
                done.add(str(r["partition_key"]))
        return done


def partition_path(out_dir: str, pkey: str) -> str:
    return os.path.join(out_dir, f"part={pkey}", "data.parquet")


def validate_partition(out_dir: str, pkey: str, fingerprint: str) -> int | None:
    """Skip-if-valid probe: rows if the partition's output is complete and
    was produced from the same input fingerprint, else None.

    The analogue of the reference's ``validate_existing_band_data`` (shape +
    attrs + sample-read): existence + footer fingerprint + readable row count.
    """
    path = partition_path(out_dir, pkey)
    if not os.path.exists(path):
        return None
    try:
        f = pq.ParquetFile(path)
        meta = f.schema_arrow.metadata or {}
        if meta.get(FINGERPRINT_KEY, b"").decode() != fingerprint:
            return None
        return f.metadata.num_rows
    except Exception:
        return None  # unreadable partial output -> rewrite


def write_partition_atomic(
    table: pa.Table,
    out_dir: str,
    pkey: str,
    fingerprint: str,
    *,
    encoding: dict[str, Any] | None = None,
) -> dict[str, Any]:
    """Write one partition: temp file + atomic rename (idempotent commit).

    ``encoding`` is a plan from ``functions.encoding.plan_table_encoding``:
    scale-offset columns are packed and the plan's row-group size and
    per-column codecs are applied (the reference's encoded-write path,
    s2_multiscale.py:424-556)."""
    t0 = time.perf_counter()
    path = partition_path(out_dir, pkey)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    write_kwargs: dict[str, Any] = {}
    if encoding is not None:
        from ..functions.encoding import pack_table, parquet_write_options

        table = pack_table(table, encoding)
        write_kwargs = parquet_write_options(encoding, table.schema)
    schema = table.schema.with_metadata(
        {**(table.schema.metadata or {}), FINGERPRINT_KEY: fingerprint.encode()}
    )
    table = table.cast(schema)
    tmp = path + f".tmp.{os.getpid()}"
    pq.write_table(table, tmp, **write_kwargs)
    os.replace(tmp, path)  # atomic on POSIX; retries re-commit same content
    return {
        "stage": "write",
        "partition_key": pkey,
        "input_fingerprint": fingerprint,
        "rows_out": table.num_rows,
        "bytes_out": os.path.getsize(path),
        "status": "done",
        "wall_s": round(time.perf_counter() - t0, 4),
    }


def resumable_write(
    ds,
    out_dir: str,
    *,
    partition_col: str,
    fingerprint: str,
    validate: bool = True,
) -> dict[str, Any]:
    """Write `ds` as one parquet dir per distinct `partition_col` value,
    skipping partitions already valid for `fingerprint`.

    Returns a summary with per-partition counters. Completed partitions are
    filtered out right after the read (broadcast done-set — no shuffle, no
    recompute), then ``groupby(partition_col).map_groups`` writes each
    remaining partition atomically and emits its lineage record.
    """
    import ray

    log = LineageLog(out_dir)
    done: set[str] = set()
    if validate:
        for pkey in log.completed("write", fingerprint):
            if validate_partition(out_dir, pkey, fingerprint) is not None:
                done.add(pkey)
    done_ref = ray.put(done)

    skipped = len(done)

    def drop_done(batch: pa.Table) -> pa.Table:
        d = ray.get(done_ref)
        if not d:
            return batch
        import pyarrow.compute as pc

        keys = pc.cast(batch[partition_col], pa.string())
        done_set = pa.array(sorted(d), type=pa.string())
        return batch.filter(pc.invert(pc.is_in(keys, value_set=done_set)))

    def write_group(group: pd.DataFrame) -> pd.DataFrame:
        pkey = str(group[partition_col].iloc[0])
        table = pa.Table.from_pandas(group, preserve_index=False)
        rec = write_partition_atomic(table, out_dir, pkey, fingerprint)
        return pd.DataFrame([rec])

    records_df = (
        ds.map_batches(drop_done, batch_format="pyarrow")
        .groupby(partition_col)
        .map_groups(write_group, batch_format="pandas")
        .to_pandas()
    )
    records = records_df.to_dict("records")
    log.append_many(records)
    return {
        "out_dir": out_dir,
        "fingerprint": fingerprint,
        "partitions_written": len(records),
        "partitions_skipped": skipped,
        "rows_written": int(records_df["rows_out"].sum()) if len(records) else 0,
    }


def read_partition_table(out_dir: str, pkey: str) -> pa.Table:
    """Load one completed partition back (driver-side, bounded data)."""
    return pq.read_table(partition_path(out_dir, pkey))


def read_output(out_dir: str):
    """Read back a resumable-write output as one Dataset."""
    import glob

    import ray.data as rd

    return rd.read_parquet(sorted(glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))))
