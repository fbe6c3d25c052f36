"""Every queries() entry with an oracle must match DuckDB exactly —
this test replicates the driver's correctness gate (row count + sorted
columns + values) at sf0.001 for speed; the driver runs sf0.01."""

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.001"
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


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("uint64",):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("int") and not str(df[c].dtype) == "int64":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


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

    # pages_* oracles are pinned to the driver's sf0.01 pages table; they
    # are parity-tested at matched scale in tests/test_pages_oracles.py.
    # bpe_token_counts embeds the sf0.01-trained merge table (data-
    # dependent oracle) — matched-scale parity lives in tests/test_bpe.py
    # and tests/test_all_oracles_hash.py.
    return sorted(
        n
        for n in e.oracle_sql()
        if not n.startswith("pages_")
        and n != "bpe_token_counts"
        and n not in e.PAGES_SCALE_PINNED
    )


@pytest.mark.parametrize("name", oracle_names())
def test_query_matches_oracle(name, contract, duck):
    ray_result = _to_pandas(contract.queries()[name](SF_DIR))
    sql_result = duck.sql(contract.oracle_sql()[name]).df()
    if len(ray_result) == 0 and len(sql_result) == 0:
        return  # all-empty Ray results can lose schema through block concat
    got = _normalize(ray_result)
    want = _normalize(sql_result)
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, atol=1e-6)


def test_entry_smoke(contract):
    df = contract.entry()
    assert len(df) > 0
    assert "cell" in df.columns and "pages" in df.columns


class TestAsofJoin:
    def test_asof_vs_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        SF = "/root/testdata/sf0.001"
        con = duckdb.connect()
        for t in ("events", "orders"):
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
            )
        r = (
            e.queries()["asof_join"](SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        o = (
            con.sql(e.oracle_sql()["asof_join"])
            .df()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert r.equals(o[r.columns.tolist()])

    def test_range_join_vs_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        SF = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW orders AS SELECT * FROM read_parquet('{SF}/orders.parquet')"
        )
        r = (
            e.queries()["range_join"](SF)
            .to_pandas()
            .sort_values("band_id")
            .reset_index(drop=True)
        )
        o = (
            con.sql(e.oracle_sql()["range_join"])
            .df()
            .sort_values("band_id")
            .reset_index(drop=True)
        )
        assert r.astype({"n_orders": "int64"}).equals(
            o[r.columns.tolist()].astype({"n_orders": "int64"})
        )
        # overlap property: a row near a band edge joins two bands
        assert r["n_orders"].sum() > con.sql("SELECT COUNT(*) FROM orders").fetchone()[0]

    def test_sliding_window_vs_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        SF = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
        )
        r = (
            e.queries()["sliding_window"](SF)
            .to_pandas()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        o = (
            con.sql(e.oracle_sql()["sliding_window"])
            .df()
            .sort_values("event_id")
            .reset_index(drop=True)
        )
        assert r.equals(o[r.columns.tolist()])

    def test_doc_quality_vs_duckdb(self, ray_session):
        import duckdb

        import __ray_entry__ as e

        SF = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
        )
        r = (
            e.queries()["doc_quality"](SF)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        o = (
            con.sql(e.oracle_sql()["doc_quality"])
            .df()
            .sort_values("doc_id")
            .reset_index(drop=True)
        )
        assert r.equals(o[r.columns.tolist()])
