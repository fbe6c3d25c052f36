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
        out = minhash_lsh_candidates(p, threshold=0.5).to_pandas()
        pairs = set(zip(out["doc_a"], out["doc_b"]))
        assert (1, 4) in pairs  # exact dup
        assert (1, 2) in pairs  # near dup
        assert (1, 3) not in pairs
        exact = out[(out["doc_a"] == 1) & (out["doc_b"] == 4)]
        assert exact["jaccard"].iloc[0] == 1.0

    def test_minhash_on_documents_runs(self, ray_session):
        out = minhash_lsh_candidates(
            f"{SF}/documents.parquet", threshold=0.3
        ).to_pandas()
        # synthetic docs are mostly distinct; just require a valid frame
        assert set(out.columns) == {"doc_a", "doc_b", "jaccard"}
        assert (out["doc_a"] < out["doc_b"]).all() if len(out) else True

    def test_embedding_near_dups(self, ray_session):
        out = embedding_near_dups(
            f"{SF}/embeddings.parquet", threshold=0.2
        ).to_pandas()
        # all-empty Ray results can lose their schema through block concat;
        # the operator contract is only checked when pairs exist
        if len(out):
            assert set(out.columns) == {"vec_a", "vec_b", "cos"}
            assert (out["vec_a"] < out["vec_b"]).all()
            assert (out["cos"] >= 0.2).all()

    def test_embedding_near_dups_matches_all_pairs(self, ray_session, tmp_path):
        """Block-pair triangle join == brute-force all pairs (exactness)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        rng = np.random.default_rng(7)
        n, d = 120, 8
        m = rng.standard_normal((n, d))
        m[50] = m[10] + 0.01 * rng.standard_normal(d)  # planted near-dup
        m[77] = m[33]  # planted exact dup
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n), type=pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.reshape(-1)), d
                ),
            }
        )
        p = str(tmp_path / "emb.parquet")
        pq.write_table(t, p)
        got = (
            embedding_near_dups(p, threshold=0.8, num_blocks=3)
            .to_pandas()
            .sort_values(["vec_a", "vec_b"])
            .reset_index(drop=True)
        )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        sims = mn @ mn.T
        ia, ib = np.nonzero(np.triu(sims >= 0.8, k=1))
        want = set(zip(ia.tolist(), ib.tolist()))
        assert set(zip(got["vec_a"], got["vec_b"])) == want
        assert (10, 50) in want and (33, 77) in want

    def test_simhash_pairs_banded(self, ray_session, tmp_path):
        """Hamming d<=3 pairs found via pigeonhole banding (not just d=0)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_model_ray.stages.neardup import simhash_pairs

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], type=pa.int64()),
                "text": pa.array([T1, T2, T3, T1]),
            }
        )
        p = str(tmp_path / "docs.parquet")
        pq.write_table(docs, p)
        h = simhash64([T1, T2])
        d12 = bin(int(h[0]) ^ int(h[1])).count("1")
        out = simhash_pairs(p, max_distance=max(3, d12)).to_pandas()
        pairs = {(a, b): h for a, b, h in zip(out.doc_a, out.doc_b, out.hamming)}
        assert pairs.get((1, 4)) == 0  # exact dup -> distance 0
        assert pairs.get((1, 2)) == d12  # near dup found at its true distance
        assert (2, 4) in pairs  # symmetric near dup
        assert (1, 3) not in pairs and (3, 4) not in pairs


class TestFloodBucketStarEdges:
    """MAX_BUCKET_PAIRS_FANOUT flood regime: star edges are connectivity-only
    and EXEMPT from the jaccard-threshold verify (ADVICE r3 medium)."""

    def test_bucket_pairs_frame_star_flag(self):
        from data_model_ray.stages.neardup import (
            MAX_BUCKET_PAIRS_FANOUT,
            _bucket_pairs_frame,
        )

        small = _bucket_pairs_frame(np.arange(5, dtype=np.int64))
        assert (small["star"] == 0).all() and len(small) == 10  # C(5,2)
        n = MAX_BUCKET_PAIRS_FANOUT + 10
        flood = _bucket_pairs_frame(np.arange(n, dtype=np.int64))
        assert len(flood) == n - 1  # star to the min-id representative
        assert (flood["star"] == 1).all()
        assert (flood["doc_a"] == 0).all()

    def test_flood_star_edges_survive_threshold(self, ray_session):
        """An impossible threshold (no pair can verify) isolates star
        edges: in a flooded bucket they must still come out (connectivity
        preserved); below the cap the same threshold removes everything."""
        import ray.data as rd

        from data_model_ray.stages.neardup import (
            MAX_BUCKET_PAIRS_FANOUT,
            minhash_lsh_candidates,
        )

        n = MAX_BUCKET_PAIRS_FANOUT + 4
        docs = pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64), "text": [T1] * n}
        )
        out = minhash_lsh_candidates(
            docs=rd.from_pandas(docs), threshold=1.5
        ).to_pandas()
        assert len(out) == n - 1
        assert set(out["doc_a"]) == {0}
        assert set(out["doc_b"]) == set(range(1, n))
        small = minhash_lsh_candidates(
            docs=rd.from_pandas(docs.head(10)), threshold=1.5
        ).to_pandas()
        assert len(small) == 0


class TestPairMethodParity:
    """broadcast / join / forced-auto pair verification produce the same
    verified pair set (values included)."""

    def test_modes_agree_on_fixture(self, ray_session):
        from data_model_ray.stages.neardup import minhash_lsh_candidates

        path = f"{SF}/documents.parquet"

        def norm(method, **kw):
            df = minhash_lsh_candidates(
                path, pair_method=method, **kw
            ).to_pandas()
            return (
                df.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
            )

        b = norm("broadcast")
        j = norm("join")
        a = norm("auto", pair_row_budget=0)  # forces the join path
        assert len(b) > 0
        pd.testing.assert_frame_equal(j, b, obj="join vs broadcast")
        pd.testing.assert_frame_equal(a, b, obj="auto(join) vs broadcast")
