"""Near-dup suite tests: minhash/LSH properties, simhash, jaccard, cosine."""

import numpy as np
import pandas as pd
import pytest

from data_model_ray.stages.neardup import (
    band_hashes,
    embedding_near_dups,
    jaccard,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
)

SF = "/root/testdata/sf0.001"

T1 = "the quick brown fox jumps over the lazy dog again and again today"
T2 = "the quick brown fox jumps over the lazy dog again and again tonight"
T3 = "completely different words about spark ray data engines and shuffles"


class TestKernels:
    def test_jaccard_bounds_and_identity(self):
        j = jaccard([T1, T1, T1], [T1, T2, T3])
        assert j[0] == 1.0
        assert 0.5 < j[1] < 1.0  # one word differs -> high but < 1
        assert j[2] < 0.1

    def test_minhash_similarity_tracks_jaccard(self):
        sig = minhash_signatures([T1, T2, T3])
        sim12 = (sig[0] == sig[1]).mean()
        sim13 = (sig[0] == sig[2]).mean()
        assert sim12 > 0.5
        assert sim13 < 0.2
        assert sim12 > sim13

    def test_minhash_deterministic(self):
        a = minhash_signatures([T1, T2])
        b = minhash_signatures([T2, T1])  # order-independent per row
        np.testing.assert_array_equal(a[0], b[1])
        np.testing.assert_array_equal(a[1], b[0])

    def test_band_collision_for_near_dups(self):
        bands = band_hashes(minhash_signatures([T1, T2, T3]))
        assert (bands[0] == bands[1]).any()  # near-dups share >= 1 band
        assert not (bands[0] == bands[2]).any()

    def test_simhash_hamming(self):
        h = simhash64([T1, T2, T3])

        def ham(a, b):
            return bin(int(a) ^ int(b)).count("1")

        assert ham(h[0], h[1]) < 12
        assert ham(h[0], h[2]) > ham(h[0], h[1])
        # deterministic
        np.testing.assert_array_equal(h, simhash64([T1, T2, T3]))


class TestDatasetOps:
    def test_minhash_lsh_finds_planted_dup(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array([T1, T2, T3, T1]),
            }
        )
        p = str(tmp_path / "docs.parquet")
        pq.write_table(docs, p)
        out = minhash_lsh_candidates(p, threshold=0.5)
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (1, 4) in pairs  # exact dup
        assert (1, 2) in pairs  # near dup
        assert (1, 3) not in pairs
        exact = out[(out["doc_a"] == 1) & (out["doc_b"] == 4)]
        assert exact["jaccard"].iloc[0] == 1.0

    def test_minhash_on_documents_runs(self, ray_session):
        out = minhash_lsh_candidates(f"{SF}/documents.parquet", threshold=0.3)
        # synthetic docs are mostly distinct; just require a valid frame
        assert set(out.columns) == {"doc_a", "doc_b", "jaccard"}
        assert (out["doc_a"] < out["doc_b"]).all() if len(out) else True

    def test_embedding_near_dups(self, ray_session):
        out = embedding_near_dups(f"{SF}/embeddings.parquet", threshold=0.9)
        assert set(out.columns) == {"vec_a", "vec_b", "cos"}
        if len(out):
            assert (out["vec_a"] < out["vec_b"]).all()
            assert (out["cos"] >= 0.9).all()
