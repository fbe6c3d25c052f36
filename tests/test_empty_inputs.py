"""Empty-input robustness: every queries() entry must degrade to a
well-formed (possibly empty) result on zero-row tables — the realistic
100-TB failure mode where a filter or an upstream stage empties a side
table mid-pipeline. Found-and-fixed crashes this sweep guards against:
schema-less ``to_pandas()`` frames (KeyError on column access), Ray's
hash-join ArrowInvalid on fully-empty sides, and k-means/ANN wrappers
indexing an empty query head."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    d = tmp_path_factory.mktemp("empty_sf")
    for t in TABLES:
        tab = pq.read_table(f"/root/testdata/sf0.001/{t}.parquet")
        pq.write_table(tab.slice(0, 0), str(d / f"{t}.parquet"))
    return str(d)


def test_all_queries_survive_empty_tables(ray_session, empty_sf):
    failures = []
    for name, fn in entry.queries().items():
        try:
            out = fn(empty_sf)
            if isinstance(out, (pd.DataFrame, pa.Table)):
                len(out)
            else:
                out.count()
        except Exception as ex:  # noqa: BLE001 — collecting a report
            failures.append(f"{name}: {type(ex).__name__}: {str(ex)[:120]}")
    assert not failures, "queries crashing on empty input:\n" + "\n".join(failures)
