"""Fixture-generator determinism tests (FIXTURES.md sections 1-2)."""

import numpy as np
import pyarrow as pa

from data_model_ray import fixtures


class TestPagesBatch:
    def test_schema(self, pages_ids):
        t = fixtures.pages_batch(pages_ids[:100])
        assert t.schema.equals(fixtures.PAGES_SCHEMA)

    def test_deterministic_and_partition_invariant(self, pages_ids):
        whole = fixtures.pages_batch(pages_ids[:1000])
        parts = pa.concat_tables(
            [
                fixtures.pages_batch(pages_ids[i : min(1000, i + 137)])
                for i in range(0, 1000, 137)
            ]
        )
        assert whole.to_pydict() == parts.combine_chunks().to_pydict()

    def test_duplicate_urls(self, pages_ids):
        t = fixtures.pages_batch(pages_ids[:1000])
        urls = t["url"].to_pylist()
        ts = t["warc_ts"].to_pylist()
        text = t["text"].to_pylist()
        dup_rows = [i for i in range(1, 1000) if i % 50 == 7]
        assert len(dup_rows) == 20  # 2%
        for i in dup_rows:
            assert urls[i] == urls[i - 1]
            assert text[i] == text[i - 1]  # byte-identical text per url
            assert ts[i] > ts[i - 1]  # latest-wins dedup keeps the dup row
        # all other urls unique
        non_dup = [u for i, u in enumerate(urls) if i % 50 != 7]
        assert len(set(non_dup)) == len(non_dup)

    def test_html_embeds_geo_golden(self, pages_ids):
        import re

        t = fixtures.pages_batch(pages_ids[:200])
        geo = fixtures.pages_expected_geo(pages_ids[:200])
        pat = re.compile(rb'geo\.position" content="(-?[\d.]+);(-?[\d.]+)"')
        for i, html in enumerate(t["html"].to_pylist()):
            m = pat.search(html)
            assert m, html[:120]
            assert float(m.group(1)) == geo["lat"][i]
            assert float(m.group(2)) == geo["lon"][i]

    def test_text_embedded_in_html(self, pages_ids):
        t = fixtures.pages_batch(pages_ids[:50])
        for html, text in zip(t["html"].to_pylist(), t["text"].to_pylist()):
            assert b"<p>" + text.encode() + b"</p>" in html


class TestSideTables:
    def test_granules(self):
        g = fixtures.mgrs_granules()
        assert g.num_rows == 200
        codes = g["mgrs"].to_pylist()
        assert len(set(codes)) == 200
        assert all(c.startswith("T") for c in codes)

    def test_every_point_in_a_granule(self, pages_ids):
        geo = fixtures.pages_expected_geo(pages_ids)
        g = fixtures.mgrs_granules().to_pydict()
        xmin, xmax = np.array(g["xmin"]), np.array(g["xmax"])
        ymin, ymax = np.array(g["ymin"]), np.array(g["ymax"])
        lat, lon = geo["lat"], geo["lon"]
        inside = (
            (lon[:, None] >= xmin)
            & (lon[:, None] < xmax)
            & (lat[:, None] >= ymin)
            & (lat[:, None] < ymax)
        )
        counts = inside.sum(axis=1)
        assert np.all(counts >= 1)
        assert np.any(counts > 1)  # overlap regions exist

    def test_admin_polygons_layout(self):
        ap = fixtures.admin_polygons()
        assert len(ap["admin_id"]) == 500
        assert int((ap["level"] == 0).sum()) == 100
        assert int((ap["level"] == 1).sum()) == 400
        assert ap["n_vertices"].sum() == len(ap["vx"]) == len(ap["vy"])
        assert np.all((ap["n_vertices"] >= 6) & (ap["n_vertices"] <= 12))


class TestPagesDataset:
    def test_ray_parallel_generation_matches_local(self, ray_session):
        ds = fixtures.pages_dataset(2000, parallelism=7)
        got = (
            ds.to_pandas()
            .sort_values("url", kind="mergesort")
            .reset_index(drop=True)
        )
        want = (
            fixtures.pages_batch(np.arange(2000))
            .to_pandas()
            .sort_values("url", kind="mergesort")
            .reset_index(drop=True)
        )
        # sort both by url+warc_ts for a stable comparison
        got = got.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
        want = want.sort_values(["url", "warc_ts"], kind="mergesort").reset_index(drop=True)
        assert got.equals(want)
