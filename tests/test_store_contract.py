"""Closed store-level contract (functions/store.py): union classification
of an unknown output directory plus whole-store validation — level schema
equality, derived_from chain, bbox/proj/spatial attrs. Mirrors the
reference's closed product models + TypeAdapter union dispatch
(data_api/geozarr/store.py:30-129, s2_converter.py:408-418)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_model_ray import grid
from data_model_ray.functions.store import (
    classify_store,
    grid_bounds,
    validate_pyramid_store,
    validate_spatial_attrs,
    validate_store,
)
from data_model_ray.pipelines.pyramid import build_pyramid
from test_pyramid import make_level_table


@pytest.fixture()
def pyramid_dir(tmp_path):
    """A real 3-level pyramid written by build_pyramid."""
    rng = np.random.default_rng(5)
    lat = rng.uniform(-60, 60, 300)
    lon = rng.uniform(-150, 150, 300)
    cells = np.unique(grid.geocell_encode(lat, lon, 5))
    clat, clon = grid.geocell_center(cells)
    t = make_level_table(
        cells,
        lat_min=clat,
        lat_max=clat,
        lon_min=clon,
        lon_max=clon,
    )
    out = str(tmp_path / "store")
    build_pyramid(t, out, base_res=5, min_cells=4)
    return out


def _manifest(d):
    with open(os.path.join(d, "manifest.json")) as f:
        return json.load(f)


def _write_manifest(d, m):
    with open(os.path.join(d, "manifest.json"), "w") as f:
        json.dump(m, f)


class TestClassification:
    def test_pyramid_classified(self, pyramid_dir):
        assert classify_store(pyramid_dir) == "geocell-pyramid"

    def test_unknown_dir_classified_none(self, tmp_path):
        (tmp_path / "junk").mkdir()
        kind, problems = validate_store(str(tmp_path / "junk"))
        assert kind is None and problems

    def test_foreign_manifest_not_claimed(self, tmp_path):
        d = tmp_path / "other"
        d.mkdir()
        (d / "manifest.json").write_text(json.dumps({"kind": "something-else"}))
        assert classify_store(str(d)) is None


class TestClosedValidation:
    def test_fresh_store_valid(self, pyramid_dir):
        kind, problems = validate_store(pyramid_dir)
        assert kind == "geocell-pyramid"
        assert problems == []

    def test_levels_carry_spatial_layout(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        for lv in m["levels"]:
            assert len(lv["spatial:shape"]) == 2
            assert len(lv["spatial:transform"]) == 6
            gb = grid_bounds(lv["spatial:transform"], lv["spatial:shape"])
            assert gb == [-180.0, -90.0, 180.0, 90.0]
        assert m["spatial:dimensions"] == ["lon", "lat"]

    def test_tampered_level_schema_fails(self, pyramid_dir):
        # rename a column in one non-base level's parquet
        m = _manifest(pyramid_dir)
        asset = m["levels"][1]["asset"]
        pdir = os.path.join(pyramid_dir, asset)
        fn = os.path.join(pdir, os.listdir(pdir)[0])
        t = pq.read_table(fn)
        t = t.rename_columns(
            ["pages_RENAMED" if c == "pages" else c for c in t.column_names]
        )
        pq.write_table(t, fn)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("missing columns" in p and "pages" in p for p in problems)
        assert any("unexpected columns" in p for p in problems)

    def test_tampered_level_dtype_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        asset = m["levels"][1]["asset"]
        pdir = os.path.join(pyramid_dir, asset)
        fn = os.path.join(pdir, os.listdir(pdir)[0])
        t = pq.read_table(fn)
        i = t.column_names.index("pages")
        t = t.set_column(i, "pages", t["pages"].cast(pa.float32()))
        pq.write_table(t, fn)
        problems = validate_pyramid_store(pyramid_dir)
        assert any(".pages: type" in p for p in problems)

    def test_broken_derivation_chain_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["levels"][1]["derived_from"] = "part=level99"
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("breaks the chain" in p for p in problems)

    def test_base_level_must_be_root(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["levels"][0]["derived_from"] = m["levels"][1]["asset"]
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("base level must have derived_from=null" in p for p in problems)

    def test_unordered_bbox_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        b = m["spatial:bbox"]
        m["spatial:bbox"] = [b[2], b[1], b[0], b[3]]  # swap xmin/xmax
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("xmin" in p for p in problems)

    def test_missing_crs_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["proj"] = {}
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("proj:" in p for p in problems)

    def test_empty_spatial_dimensions_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["spatial:dimensions"] = []
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("at least one dimension" in p for p in problems)

    def test_row_count_drift_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["levels"][0]["cells"] += 1
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("rows" in p and "manifest" in p for p in problems)

    def test_bbox_outside_level_grid_fails(self, pyramid_dir):
        m = _manifest(pyramid_dir)
        m["spatial:bbox"] = [-200.0, -30.0, 144.0, 59.0]  # west of the grid
        _write_manifest(pyramid_dir, m)
        problems = validate_pyramid_store(pyramid_dir)
        assert any("outside" in p for p in problems)


class TestSpatialAttrs:
    def test_minimal_valid(self):
        assert validate_spatial_attrs({"spatial:dimensions": ["x", "y"]}) == []

    def test_missing_dimensions(self):
        assert any(
            "spatial:dimensions missing" in p for p in validate_spatial_attrs({})
        )

    def test_bad_transform_shape(self):
        attrs = {
            "spatial:dimensions": ["x", "y"],
            "spatial:transform": [1.0, 0.0, 0.0],
        }
        assert any("6 floats" in p for p in validate_spatial_attrs(attrs))
        attrs = {
            "spatial:dimensions": ["x", "y"],
            "spatial:transform": [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
        }
        assert any("zero pixel size" in p for p in validate_spatial_attrs(attrs))
        attrs = {"spatial:dimensions": ["x", "y"], "spatial:shape": [0, 5]}
        assert any("positive ints" in p for p in validate_spatial_attrs(attrs))

    def test_unknown_registration(self):
        attrs = {"spatial:dimensions": ["x"], "spatial:registration": "corner"}
        assert any("registration" in p for p in validate_spatial_attrs(attrs))

    def test_grid_bounds(self):
        tr = [0.5, 0.0, -180.0, 0.0, -0.5, 90.0]
        assert grid_bounds(tr, [360, 720]) == [-180.0, -90.0, 180.0, 90.0]
        assert grid_bounds([0.0, 0, 0, 0, 1.0, 0], [2, 2]) is None


class TestInvindexStore:
    """Third union member: closed inverted-index store contract
    (classify + validate + tamper rejection + CLI e2e)."""

    @pytest.fixture(scope="class")
    def built(self, ray_session, tmp_path_factory):
        from data_model_ray.pipelines.invindex import build_inverted_index

        out = str(tmp_path_factory.mktemp("invindex_store"))
        build_inverted_index("/root/testdata/sf0.001", out, num_buckets=8)
        return out

    def test_classify_and_validate_clean(self, built):
        from data_model_ray.functions.store import classify_store, validate_store

        assert classify_store(built) == "inverted-index"
        kind, problems = validate_store(built)
        assert kind == "inverted-index" and problems == []

    def test_other_sniffs_reject(self, built):
        from data_model_ray.functions.store import sniff_pyramid, sniff_raster

        assert not sniff_pyramid(built) and not sniff_raster(built)

    def _copy(self, built, tmp_path):
        import shutil

        dst = str(tmp_path / "copy")
        shutil.copytree(built, dst)
        return dst

    def test_tamper_fingerprint(self, built, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from data_model_ray.functions.store import validate_store

        dst = self._copy(built, tmp_path)
        p = sorted(glob.glob(f"{dst}/part=*/data.parquet"))[0]
        t = pq.read_table(p)
        t = t.cast(t.schema.with_metadata({}))  # strip the fingerprint
        pq.write_table(t, p)
        kind, problems = validate_store(dst)
        assert kind == "inverted-index"
        assert any("fingerprint" in p for p in problems)

    def test_tamper_foreign_bucket_rows(self, built, tmp_path):
        import glob

        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_model_ray.functions.store import validate_store

        dst = self._copy(built, tmp_path)
        paths = sorted(glob.glob(f"{dst}/part=*/data.parquet"))
        a, b = pq.read_table(paths[0]), pq.read_table(paths[1])
        # splice one bucket's rows into another (token hash now wrong)
        moved = b.set_column(
            b.schema.get_field_index("bucket"),
            "bucket",
            a["bucket"][:1].take(pa.array([0] * b.num_rows)),
        )
        merged = pa.concat_tables([a, moved]).cast(
            a.schema.with_metadata(a.schema.metadata)
        )
        pq.write_table(merged, paths[0])
        _, problems = validate_store(dst)
        assert any("token hash" in p or "rows" in p for p in problems)

    def test_tamper_manifest_bucket_range(self, built, tmp_path):
        import json

        from data_model_ray.functions.store import validate_store

        dst = self._copy(built, tmp_path)
        mp = f"{dst}/invindex_manifest.json"
        m = json.load(open(mp))
        m["partitions"]["99"] = 1
        json.dump(m, open(mp, "w"))
        _, problems = validate_store(dst)
        assert any("outside [0, 8)" in p for p in problems)

    def test_unknown_partition_on_disk(self, built, tmp_path):
        import shutil

        from data_model_ray.functions.store import validate_store

        dst = self._copy(built, tmp_path)
        shutil.copytree(f"{dst}/part=0", f"{dst}/part=7777")
        _, problems = validate_store(dst)
        assert any("not in manifest" in p for p in problems)

    def test_cli_validate(self, built, tmp_path, capsys):
        from data_model_ray.__main__ import main

        assert main(["validate", "--out", built]) == 0
        out = capsys.readouterr().out
        assert "inverted-index" in out
        # tampered copy must be rejected through the CLI too
        dst = self._copy(built, tmp_path)
        import json

        mp = f"{dst}/invindex_manifest.json"
        m = json.load(open(mp))
        m["input_fingerprint"] = "invindex:v1:rows=1:buckets=8"
        json.dump(m, open(mp, "w"))
        assert main(["validate", "--out", dst]) != 0

    def test_rebuild_with_fewer_buckets_self_validates(
        self, ray_session, tmp_path
    ):
        """Rebuilding the same out_dir with a different bucket count must
        leave a store that passes its own closed validation (stale
        partitions from the previous build are fingerprint-evicted)."""
        from data_model_ray.functions.store import validate_store
        from data_model_ray.pipelines.invindex import build_inverted_index

        out = str(tmp_path / "rebuild")
        build_inverted_index("/root/testdata/sf0.001", out, num_buckets=16)
        build_inverted_index("/root/testdata/sf0.001", out, num_buckets=8)
        kind, problems = validate_store(out)
        assert kind == "inverted-index" and problems == []
