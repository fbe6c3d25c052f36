"""Filesystem abstraction tests (S9/S10 analogue — fs_utils semantics)."""

import math

import pytest

from data_model_ray.sources.fs import (
    is_s3_path,
    normalize_path,
    parse_s3_path,
    path_exists,
    read_json_metadata,
    resolve_filesystem,
    retry_io,
    write_json_metadata,
)


class TestPaths:
    def test_normalize_collapses_double_slashes(self):
        assert normalize_path("s3://bucket//a///b/c") == "s3://bucket/a/b/c"
        assert normalize_path("file:///tmp/x") == "/tmp/x"
        assert normalize_path("/tmp/x") == "/tmp/x"

    def test_parse_s3(self):
        assert parse_s3_path("s3://bucket/key/part") == ("bucket", "key/part")
        assert parse_s3_path("s3://bucket") == ("bucket", "")
        with pytest.raises(ValueError):
            parse_s3_path("/local/path")
        with pytest.raises(ValueError):
            parse_s3_path("s3://")

    def test_is_s3(self):
        assert is_s3_path("s3://b/k") and not is_s3_path("/b/k")


class TestResolve:
    def test_local_roundtrip_with_ray_reader(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.table({"a": [1, 2, 3]}), p)
        fs, rel = resolve_filesystem(p)
        ds = rd.read_parquet(rel, filesystem=fs)
        assert ds.count() == 3

    def test_s3_resolves_bucket_key(self):
        # construction only — no network call is made until IO happens
        try:
            fs, rel = resolve_filesystem(
                "s3://bucket//k1/k2", endpoint_override="http://127.0.0.1:1"
            )
        except OSError:
            pytest.skip("S3FileSystem unavailable in this environment")
        assert rel == "bucket/k1/k2"


class TestRetry:
    def test_retries_then_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise OSError("transient")
            return "ok"

        assert retry_io(flaky, backoff_s=0.0) == "ok"
        assert calls["n"] == 3

    def test_exhausts_and_raises(self):
        def dead():
            raise OSError("permanent")

        with pytest.raises(OSError, match="permanent"):
            retry_io(dead, max_retries=2, backoff_s=0.0)


class TestJsonMetadata:
    def test_nan_safe_roundtrip(self, tmp_path):
        p = str(tmp_path / "meta.json")
        meta = {"bbox": [1.0, float("nan"), float("inf"), float("-inf")], "n": 3}
        write_json_metadata(p, meta)
        back = read_json_metadata(p)
        assert back["n"] == 3
        assert back["bbox"][0] == 1.0
        assert math.isnan(back["bbox"][1])
        assert back["bbox"][2] == float("inf")
        assert back["bbox"][3] == float("-inf")
        assert path_exists(p) and not path_exists(p + ".missing")


class TestSchemaMetadataStripping:
    """pyarrow schemas with key/value metadata are UNHASHABLE, which defeats
    Ray's block-schema dedup cache on every shuffle merge ('Failed to hash
    the schemas' warning). The read boundary must emit clean schemas."""

    def test_strip_schema_metadata(self):
        import pyarrow as pa

        from data_model_ray.sources.fs import strip_schema_metadata

        dirty = pa.schema(
            [pa.field("a", pa.int64(), metadata={b"f": b"1"})],
            metadata={b"pandas": b"{}"},
        )
        with pytest.raises(TypeError):
            hash(dirty)
        clean = strip_schema_metadata(dirty)
        assert clean.metadata is None and clean.field("a").metadata is None
        hash(clean)  # must not raise
        # already-clean schema -> None (caller skips the schema kwarg)
        assert strip_schema_metadata(clean) is None

    def test_sized_read_emits_hashable_schema(self, ray_session, tmp_path):
        import pandas as pd
        import pyarrow.parquet as pq

        from data_model_ray.sources.fs import sized_read_parquet

        p = str(tmp_path / "dirty.parquet")
        # pandas-written parquet carries the unhashable b'pandas' metadata
        pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]}).to_parquet(p)
        assert pq.read_schema(p).metadata is not None
        for cols in (None, ["b"]):
            ds = sized_read_parquet(p, columns=cols)
            sch = ds.schema().base_schema
            assert sch.metadata is None
            hash(sch)  # must not raise
        assert sized_read_parquet(p, columns=["b"]).take_all() == [
            {"b": "x"},
            {"b": "y"},
            {"b": "z"},
        ]

    def test_pipeline_blocks_emit_hashable_schemas(self, ray_session):
        """Every materialized block of the exchange-heavy pipelines must
        carry a hashable (metadata-free) Arrow schema, or Ray's shuffle
        schema-dedup cache is defeated on every merge task."""
        import ray

        from data_model_ray.sources.fs import sized_read_parquet
        from data_model_ray.stages.dedup import dedup_exact
        from data_model_ray.stages.neardup import minhash_lsh_candidates

        sf = "/root/testdata/sf0.001"
        for ds in (
            minhash_lsh_candidates(f"{sf}/documents.parquet", threshold=0.5),
            dedup_exact(
                sized_read_parquet(f"{sf}/events.parquet"),
                key="user_id",
                order_col="ts",
                num_buckets=4,
            ),
        ):
            mat = ds.materialize()
            for ref in mat.to_arrow_refs():
                sch = ray.get(ref).schema
                hash(sch)  # raises TypeError if any metadata survived
                assert sch.metadata is None
