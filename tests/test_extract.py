"""Extraction-stage tests: byte-identical text invariant (BASELINE.json)."""

import numpy as np
import pyarrow as pa
import pytest

from data_model_ray import fixtures
from data_model_ray.stages.extract import HtmlExtract, extract_batch


class TestExtract:
    def test_byte_identical_text_and_geo(self, pages_ids):
        batch = fixtures.pages_batch(pages_ids[:2000])
        out = extract_batch(batch, verify_text=True)  # raises on any mismatch
        # text survives byte-identically
        assert out["text"].to_pylist() == batch["text"].to_pylist()
        # geo columns match the independent golden
        geo = fixtures.pages_expected_geo(pages_ids[:2000])
        np.testing.assert_array_equal(out["lat"].to_numpy(), geo["lat"])
        np.testing.assert_array_equal(out["lon"].to_numpy(), geo["lon"])
        assert "html" not in out.column_names  # projected early

    def test_mismatch_raises(self):
        batch = fixtures.pages_batch(np.arange(10))
        tampered = batch.set_column(
            batch.column_names.index("text"),
            "text",
            pa.array(["WRONG"] * 10),
        )
        with pytest.raises(ValueError, match="byte-identical"):
            extract_batch(tampered, verify_text=True)

    def test_text_len(self):
        batch = fixtures.pages_batch(np.arange(100))
        out = extract_batch(batch)
        want = [len(t) for t in batch["text"].to_pylist()]
        assert out["text_len"].to_pylist() == want

    def test_actor_class_equivalent(self, pages_ids):
        batch = fixtures.pages_batch(pages_ids[:100])
        a = HtmlExtract(verify_text=True)(batch)
        b = extract_batch(batch, verify_text=True)
        assert a.to_pydict() == b.to_pydict()

    def test_title_extraction(self):
        batch = fixtures.pages_batch(np.arange(5))
        out = extract_batch(batch, keep_title=True)
        assert all(t.startswith("Doc ") for t in out["title"].to_pylist())
