"""Pages source tests: pruned reads + schema enforcement in the pipeline."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_model_ray import fixtures
from data_model_ray.functions.schema import PAGES_CONTRACT, make_validator_stage
from data_model_ray.sources.pages import read_pages


class TestReadPages:
    def test_pruned_read(self, ray_session, tmp_path):
        p = str(tmp_path / "pages")
        fixtures.write_pages_parquet(p, 500, parallelism=2)
        ds = read_pages(p, columns=["url", "lang"])
        df = ds.to_pandas()
        assert list(df.columns) == ["url", "lang"]
        assert len(df) == 500

    def test_schema_violation_detected(self, ray_session, tmp_path):
        bad = pa.table(
            {
                "url": pa.array([1, 2], type=pa.int64()),  # wrong type
                "lang": pa.array(["en", "de"]),
            }
        )
        p = str(tmp_path / "bad.parquet")
        pq.write_table(bad, p)
        ds = read_pages(p, columns=["url", "lang"])
        with pytest.raises(Exception, match="schema violation"):
            ds.to_pandas()

    def test_validator_stage_in_pipeline(self, ray_session):
        ds = fixtures.pages_dataset(300, parallelism=2)
        out = ds.map_batches(
            make_validator_stage(PAGES_CONTRACT),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        assert out.count() == 300
