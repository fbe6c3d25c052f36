"""Deep closed crawl-product store model: build, classify, tamper-reject.

The member-by-member hierarchy analogue of the reference's Sentinel-2
closed product model (data_api/s2.py:461-696) — every tamper class a
consumer could hit must be rejected by the closed validation (r4 verdict
directive 4: validate CLI rejects 5+ distinct tamper shapes).
"""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_model_ray import fixtures
from data_model_ray.functions.product import (
    build_crawl_product,
    validate_crawl_product,
)
from data_model_ray.functions.store import classify_store, validate_store


@pytest.fixture(scope="module")
def product_dir(ray_session, tmp_path_factory):
    pages = fixtures.ensure_pages_parquet(5000)
    out = str(tmp_path_factory.mktemp("cpd") / "store")
    manifest = build_crawl_product(pages, out)
    assert manifest["kind"] == "crawl-product"
    return out


def _copy(product_dir, tmp_path):
    dst = str(tmp_path / "tampered")
    shutil.copytree(product_dir, dst)
    return dst


def _rewrite_member(store, rel, fn):
    path = os.path.join(store, rel, "data.parquet")
    t = pq.read_table(path)
    pq.write_table(fn(t), path)


class TestCleanStore:
    def test_classify_and_validate_green(self, product_dir):
        assert classify_store(product_dir) == "crawl-product"
        kind, problems = validate_store(product_dir)
        assert kind == "crawl-product"
        assert problems == []

    def test_member_inventory(self, product_dir):
        with open(os.path.join(product_dir, "product_manifest.json")) as f:
            m = json.load(f)
        assert set(m["members"]) == {
            "measurements/content/res7",
            "measurements/content/res6",
            "measurements/content/res5",
            "quality/langdist/res7",
            "quality/dupmask/res7",
            "quality/quicklook",
            "conditions/geometry/res7",
            "conditions/crawlmeta",
        }

    def test_validate_cli_green(self, product_dir):
        r = subprocess.run(
            [sys.executable, "-m", "data_model_ray", "validate", "--out", product_dir],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stdout + r.stderr


class TestTamperRejection:
    """One rejection per member class — the closed-model contract."""

    def test_unknown_group_member(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        os.makedirs(os.path.join(s, "quality", "rogue"))
        probs = validate_crawl_product(s)
        assert any("unknown member 'rogue'" in p for p in probs)

    def test_missing_required_group(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        shutil.rmtree(os.path.join(s, "conditions", "geometry"))
        probs = validate_crawl_product(s)
        assert any("required member 'geometry' missing" in p for p in probs)

    def test_dropped_required_column(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        _rewrite_member(
            s, "measurements/content/res7", lambda t: t.drop_columns(["score_mean"])
        )
        probs = validate_crawl_product(s)
        assert any("required column 'score_mean' missing" in p for p in probs)

    def test_extra_unknown_column(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        _rewrite_member(
            s,
            "quality/dupmask/res7",
            lambda t: t.append_column("sneaky", pa.array(np.zeros(t.num_rows))),
        )
        probs = validate_crawl_product(s)
        assert any("unknown column 'sneaky'" in p for p in probs)

    def test_dtype_tamper(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)

        def cast_pages(t):
            i = t.column_names.index("pages")
            return t.set_column(
                i, "pages", t["pages"].cast(pa.float64())
            )

        _rewrite_member(s, "measurements/content/res7", cast_pages)
        probs = validate_crawl_product(s)
        assert any("column 'pages' dtype" in p for p in probs)

    def test_value_range_tamper(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)

        def poison_score(t):
            i = t.column_names.index("score_mean")
            v = t["score_mean"].to_numpy(zero_copy_only=False).copy()
            v[0] = 1.5
            return t.set_column(i, "score_mean", pa.array(v))

        _rewrite_member(s, "measurements/content/res7", poison_score)
        probs = validate_crawl_product(s)
        assert any("score_mean" in p and "outside" in p for p in probs)

    def test_wrong_resolution_cells(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)

        def shift_res(t):
            from data_model_ray.grid import geocell_parent

            i = t.column_names.index("cell")
            cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return t.set_column(i, "cell", pa.array(geocell_parent(cells, 6)))

        _rewrite_member(s, "conditions/geometry/res7", shift_res)
        probs = validate_crawl_product(s)
        assert any("not at declared res 7" in p for p in probs)

    def test_fingerprint_tamper(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)

        def strip_fp(t):
            return t.cast(t.schema.with_metadata({}))

        _rewrite_member(s, "quality/quicklook", strip_fp)
        probs = validate_crawl_product(s)
        assert any("footer fingerprint != manifest" in p for p in probs)

    def test_cross_member_cell_set_tamper(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        _rewrite_member(s, "conditions/geometry/res7", lambda t: t.slice(1))
        probs = validate_crawl_product(s)
        assert any("cell set != content res7 cells" in p for p in probs)

    def test_langdist_count_tamper(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)

        def bump(t):
            i = t.column_names.index("lang_en")
            v = t["lang_en"].to_numpy(zero_copy_only=False).copy()
            v[0] += 1
            return t.set_column(i, "lang_en", pa.array(v))

        _rewrite_member(s, "quality/langdist/res7", bump)
        probs = validate_crawl_product(s)
        assert any("do not sum to content pages" in p for p in probs)

    def test_unknown_manifest_attr(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        p = os.path.join(s, "product_manifest.json")
        with open(p) as f:
            m = json.load(f)
        m["debug_note"] = "oops"
        with open(p, "w") as f:
            json.dump(m, f)
        probs = validate_crawl_product(s)
        assert any("unknown manifest attr 'debug_note'" in p for p in probs)

    def test_validate_cli_rejects(self, product_dir, tmp_path):
        s = _copy(product_dir, tmp_path)
        shutil.rmtree(os.path.join(s, "quality", "dupmask"))
        r = subprocess.run(
            [sys.executable, "-m", "data_model_ray", "validate", "--out", s],
            capture_output=True,
            text=True,
            cwd="/root/repo",
        )
        assert r.returncode != 0
        assert "dupmask" in r.stdout + r.stderr
