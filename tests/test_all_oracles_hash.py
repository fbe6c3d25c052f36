"""Driver-protocol replica: rows + schema + value-HASH for EVERY oracled
queries() entry at sf0.01 — the exact scale the driver's correctness gate
runs (tests/test_oracles.py covers the same entries value-wise at sf0.001
for speed; this module catches dtype/ordering drift that only shows at the
driver's scale, per the round-2 coverage-sweep directive).

Hash protocol mirror: sort columns by name, canonicalize dtypes
(object->str, timestamps->us, unsigned/narrow ints->int64, floats rounded
to 6 decimals), sort rows by all columns, then one sha256 over the
serialized frame. Both engines' results must produce the SAME digest —
strictly stronger than approximate value compare.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    raise TypeError(type(obj))


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = str(df[c].dtype)
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif dt.startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif dt == "uint64" or (dt.startswith(("int", "uint")) and dt != "int64"):
            df[c] = df[c].astype("int64")
        elif dt.startswith("float"):
            # round-then-zero: -0.0 and 0.0 must hash identically
            df[c] = df[c].round(6) + 0.0
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _digest(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    h.update(("|".join(f"{c}:{df[c].dtype}" for c in df.columns)).encode())
    for c in df.columns:
        col = df[c]
        if str(col.dtype).startswith("float"):
            # canonical decimal text — avoids binary-representation noise
            h.update("\x00".join(f"{v:.6f}" for v in col).encode())
        else:
            h.update("\x00".join(str(v) for v in col).encode())
    return h.hexdigest()


@pytest.fixture(scope="module")
def duck():
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as e

    return e


def oracle_names():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __ray_entry__ as e

    # pages_* oracles are pinned to the driver's own pages table; they are
    # parity-tested at matched scale in tests/test_pages_oracles.py
    return sorted(n for n in e.oracle_sql() if not n.startswith("pages_"))


@pytest.mark.parametrize("name", oracle_names())
def test_hash_matches_driver_protocol(name, contract, duck):
    ray_result = _to_pandas(contract.queries()[name](SF_DIR))
    sql_result = duck.sql(contract.oracle_sql()[name]).df()
    assert len(ray_result) == len(sql_result), (
        f"row count {len(ray_result)} vs {len(sql_result)}"
    )
    if len(sql_result) == 0:
        return  # all-empty results can lose schema through block concat
    got = _canonical(ray_result)
    want = _canonical(sql_result)
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    hg, hw = _digest(got), _digest(want)
    if hg != hw:
        # surface WHERE it diverged, not just that it did
        pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=0)
        pytest.fail(f"value hash mismatch despite frame equality: {hg} vs {hw}")
