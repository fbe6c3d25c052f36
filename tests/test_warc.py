"""WARC source tests: byte-exact round-trip, the byte-identical-text
invariant from an archive-format source, and flagship-path parity."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from data_model_ray import fixtures
from data_model_ray.sources.warc import (
    parse_warc,
    read_warc,
    write_warc,
    write_warc_shards,
)

N = 700


@pytest.fixture(scope="module")
def pages():
    return fixtures.pages_batch(np.arange(N))


class TestRoundTrip:
    def test_byte_exact(self, pages, tmp_path):
        p = str(tmp_path / "one.warc")
        assert write_warc(pages, p) == N
        back = parse_warc(open(p, "rb").read())
        assert back["url"].to_pylist() == pages["url"].to_pylist()
        assert back["warc_ts"].to_pylist() == pages["warc_ts"].to_pylist()
        assert back["html"].to_pylist() == [
            h if isinstance(h, bytes) else h.encode()
            for h in pages["html"].to_pylist()
        ]

    def test_deterministic_bytes(self, pages, tmp_path):
        a, b = str(tmp_path / "a.warc"), str(tmp_path / "b.warc")
        write_warc(pages, a)
        write_warc(pages, b)
        assert open(a, "rb").read() == open(b, "rb").read()

    def test_payload_with_crlf_and_headers_inside(self, tmp_path):
        """Content-Length slicing, not delimiter scanning: html payloads
        legally containing CRLFs and WARC-looking lines must survive."""
        evil = b"<html>\r\n\r\nWARC/1.0\r\nContent-Length: 9\r\n</html>"
        t = pa.table(
            {
                "url": pa.array(["https://e/x"]),
                "warc_ts": pa.array([0], pa.timestamp("us")),
                "html": pa.array([evil], pa.binary()),
            }
        )
        p = str(tmp_path / "evil.warc")
        write_warc(t, p)
        back = parse_warc(open(p, "rb").read())
        assert back["html"].to_pylist() == [evil]

    def test_skips_non_response_records(self, pages, tmp_path):
        p = str(tmp_path / "mix.warc")
        write_warc(pages.slice(0, 3), p)
        blob = open(p, "rb").read()
        extra = (
            b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n\r\nabcd\r\n\r\n"
        )
        back = parse_warc(extra + blob)
        assert back.num_rows == 3


class TestDataset:
    def test_sharded_read(self, ray_session, pages, tmp_path):
        out = str(tmp_path / "shards")
        paths = write_warc_shards(pages, out, shard_rows=200)
        assert len(paths) == 4
        ds = read_warc(out)
        # ~2% of fixture urls are duplicates (recrawl rows) — sort on both
        # keys or tied-url row order is engine-dependent
        df = ds.to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
        want = (
            pages.to_pandas().sort_values(["url", "warc_ts"]).reset_index(drop=True)
        )
        assert (df["url"].values == want["url"].values).all()
        assert (
            df["warc_ts"].values.astype("datetime64[us]")
            == want["warc_ts"].values.astype("datetime64[us]")
        ).all()

    def test_byte_identical_text_invariant_from_warc(
        self, ray_session, pages, tmp_path
    ):
        """The BASELINE per-row invariant, sourced from the archive format:
        text extracted from WARC-carried html is byte-identical to the
        fixture's text column, and geo extraction matches the closed-form
        expected values."""
        from data_model_ray.stages.extract import extract_batch

        out = str(tmp_path / "shards")
        write_warc_shards(pages, out, shard_rows=300)
        parsed = (
            read_warc(out).to_pandas().sort_values("url").reset_index(drop=True)
        )
        t = pa.table(
            {
                "url": pa.array(parsed["url"]),
                "html": pa.array(
                    [bytes(h) for h in parsed["html"]], pa.binary()
                ),
            }
        )
        got = extract_batch(t, verify_text=False)
        want = pages.to_pandas().sort_values("url").reset_index(drop=True)
        assert got["text"].to_pylist() == want["text"].tolist()
        geo = fixtures.pages_expected_geo(np.arange(N))
        by_url = dict(zip(pages["url"].to_pylist(), zip(geo["lat"], geo["lon"])))
        lats = got["lat"].to_numpy()
        lons = got["lon"].to_numpy()
        for u, la, lo in zip(got["url"].to_pylist(), lats, lons):
            wla, wlo = by_url[u]
            assert abs(la - wla) < 1e-9 and abs(lo - wlo) < 1e-9


class TestFlagshipParity:
    def test_warc_source_produces_identical_cells(self, ray_session, tmp_path):
        """The north-star end-to-end claim: the flagship produces
        IDENTICAL cell stats whether pages arrive as parquet or WARC
        (lang recovered from the html meta on the archive path)."""
        import pyarrow.parquet as pq
        import ray.data as rd

        from data_model_ray.pipelines.flagship import (
            FlagshipConfig,
            pages_to_cells,
        )

        n = 3000
        pages_t = fixtures.pages_batch(np.arange(n))
        pq.write_table(pages_t, str(tmp_path / "pages.parquet"))
        warc_dir = str(tmp_path / "warc")
        write_warc_shards(pages_t, warc_dir, shard_rows=800)

        cfg = FlagshipConfig(dedup_mode="shuffle")
        def cells_of(ds):
            _, cells = pages_to_cells(ds, cfg)
            return (
                cells.to_pandas()
                .sort_values("cell")
                .reset_index(drop=True)
            )

        a = cells_of(rd.read_parquet(str(tmp_path / "pages.parquet")))
        b = cells_of(read_warc(warc_dir))
        import pandas as pd

        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
