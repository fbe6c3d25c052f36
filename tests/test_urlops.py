"""URL canonicalization kernel + dedup-query tests (DuckDB parity pinned)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_model_ray.pipelines.urlops import (
    CANON_SQL,
    canonicalize_urls,
    messy_urls_table,
    url_hosts,
)

CASES = [
    # (input, canonical)
    ("https://host5.example.com/path/42", "https://host5.example.com/path/42"),
    ("https://HOST5.EXAMPLE.COM/path/42", "https://host5.example.com/path/42"),
    ("https://host5.example.com:443/path/42", "https://host5.example.com/path/42"),
    ("http://host5.example.com:80/path/42", "http://host5.example.com/path/42"),
    (
        "http://host5.example.com:8080/path/42",
        "http://host5.example.com:8080/path/42",
    ),
    ("https://host5.example.com/path/42/", "https://host5.example.com/path/42"),
    (
        "https://host5.example.com/path/42?utm_source=feed&utm_medium=rss",
        "https://host5.example.com/path/42",
    ),
    (
        "https://host5.example.com/path/42?b=2&a=1",
        "https://host5.example.com/path/42?a=1&b=2",
    ),
    (
        "https://host5.example.com/path/42?a=1&b=2#frag",
        "https://host5.example.com/path/42?a=1&b=2",
    ),
    ("https://host5.example.com", "https://host5.example.com/"),
    ("not-a-url", "not-a-url"),
    (
        "https://host.example.com/a?gclid=xyz&keep=1&fbclid=abc",
        "https://host.example.com/a?keep=1",
    ),
    ("HTTPS://Host.Example.Com/A/B//", "https://host.example.com/A/B"),
]


class TestKernel:
    def test_canonical_cases(self):
        got = canonicalize_urls(pa.array([c[0] for c in CASES])).to_pylist()
        assert got == [c[1] for c in CASES]

    def test_duckdb_parity(self):
        """The SQL CTE chain the oracles embed must produce byte-identical
        canonical urls for every messy-class input."""
        import duckdb

        con = duckdb.connect()
        values = ", ".join(f"('{u}', 0)" for u, _ in CASES)
        sql = (
            f"WITH messy(url, r) AS (VALUES {values}), {CANON_SQL.strip()} "
            "SELECT canon_url FROM canon"
        )
        got_sql = [r[0] for r in con.sql(sql).fetchall()]
        got_kernel = canonicalize_urls(pa.array([c[0] for c in CASES])).to_pylist()
        assert got_sql == got_kernel

    def test_url_hosts(self):
        got = url_hosts(
            pa.array(
                [
                    "https://HOST5.EXAMPLE.COM:443/p",
                    "http://a.b/x",
                    "nope",
                ]
            )
        ).to_pylist()
        assert got == ["host5.example.com", "a.b", ""]

    def test_messy_table_shape(self):
        t = pa.table({"doc_id": pa.array(np.arange(12), pa.int64())})
        m = messy_urls_table(t)
        # base + variant per doc, plus one extra row per v==5 doc (ids 5, 11)
        assert m.num_rows == 12 * 2 + 2
        r = m["r"].to_numpy()
        assert (np.sort(np.unique(r)) == [0, 1, 2]).all()
        # v=0 doc: variant identical to base
        urls = m["url"].to_pylist()
        assert urls[0] == urls[12]


SF = "/root/testdata/sf0.001"


class TestQueries:
    @pytest.mark.parametrize("name", ["canon_url_dedup", "host_dedup"])
    def test_query_vs_oracle(self, ray_session, name):
        import duckdb

        import __ray_entry__ as e

        con = duckdb.connect()
        con.sql(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{SF}/documents.parquet')"
        )
        got = e.queries()[name](SF)
        df = got.to_pandas() if hasattr(got, "to_pandas") else got
        odf = con.sql(e.oracle_sql()[name]).df()
        cols = sorted(df.columns)
        a = df[cols].sort_values(cols).reset_index(drop=True)
        b = odf[cols].sort_values(cols).reset_index(drop=True)
        for c in cols:
            assert (a[c].astype(str).values == b[c].astype(str).values).all(), c

    def test_dedup_bites(self, ray_session):
        """The messy variants must actually collapse: kept groups smaller
        than raw rows, and every non-query group has >= 2 rows."""
        import __ray_entry__ as e

        df = e.queries()["canon_url_dedup"](SF).to_pandas()
        assert (df["n_rows"] >= 1).all()
        assert (df["n_rows"] >= 2).sum() > len(df) * 0.5
        assert (df["kept_r"] == 0).sum() > 0


class TestProperties:
    def test_canonicalize_idempotent(self):
        """canon(canon(x)) == canon(x) — canonical forms are fixed points."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        hosts = st.sampled_from(["Host1.Example.COM", "a.b", "x-y.z"])
        paths = st.sampled_from(["", "/", "/p", "/p/q/", "/p//"])
        queries = st.sampled_from(
            ["", "?b=2&a=1", "?utm_source=x", "?a=1&utm_medium=y&b=2", "#f", "?q=1#f"]
        )
        ports = st.sampled_from(["", ":80", ":443", ":8080"])
        schemes = st.sampled_from(["http", "https", "HTTPS"])

        @settings(max_examples=60, deadline=None)
        @given(s=schemes, h=hosts, pt=ports, p=paths, q=queries)
        def check(s, h, pt, p, q):
            url = f"{s}://{h}{pt}{p}{q}"
            once = canonicalize_urls(pa.array([url])).to_pylist()[0]
            twice = canonicalize_urls(pa.array([once])).to_pylist()[0]
            assert twice == once

        check()

    def test_canon_batch_layout_invariant(self):
        urls = [c[0] for c in CASES] * 7
        a = canonicalize_urls(pa.array(urls)).to_pylist()
        chunked = pa.chunked_array([urls[:5], urls[5:40], urls[40:]])
        b = canonicalize_urls(chunked).to_pylist()
        assert a == b


class TestPerHostCap:
    def test_matches_pandas_reference(self, ray_session):
        from data_model_ray import fixtures
        from data_model_ray.pipelines.urlops import per_host_cap

        path = fixtures.ensure_pages_parquet(4000)
        got = (
            per_host_cap(path, k=3)
            .to_pandas()
            .sort_values(["host", "warc_ts", "url"])
            .reset_index(drop=True)
        )
        import pandas as pd
        import pyarrow.parquet as pq

        df = pq.read_table(path, columns=["url", "warc_ts"]).to_pandas()
        df["host"] = df["url"].str.split("/").str[2]
        want = (
            df.sort_values(["host", "warc_ts", "url"], kind="mergesort")
            .groupby("host", sort=True)
            .head(3)[["host", "url", "warc_ts"]]
            .sort_values(["host", "warc_ts", "url"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)
        # the cap must actually bite: some host has > 3 crawl rows
        assert len(want) < len(df)
