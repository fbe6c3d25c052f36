"""kNN operator tests: per-cell spatial kNN vs brute force; ANN recall."""

import numpy as np
import pandas as pd
import pytest

from data_model_ray import fixtures
from data_model_ray.stages.knn import (
    _equirect_dist2,
    knn_embeddings,
    knn_embeddings_lsh,
    knn_per_cell,
)

SF = "/root/testdata/sf0.001"


class TestSpatialKnn:
    @pytest.fixture(scope="class")
    def points(self):
        ids = np.arange(1500)
        geo = fixtures.pages_expected_geo(ids)
        pages = fixtures.pages_batch(ids)
        df = pd.DataFrame(
            {"url": pages["url"].to_pylist(), "lat": geo["lat"], "lon": geo["lon"]}
        ).drop_duplicates(subset="url")
        return df

    def test_matches_bruteforce_in_dense_cells(self, ray_session, points):
        import ray.data as rd

        got = knn_per_cell(rd.from_pandas(points), k=5).to_pandas()
        lat = points["lat"].to_numpy()
        lon = points["lon"].to_numpy()
        urls = points["url"].to_numpy()
        checked = 0
        for qi in range(0, len(points), 61):
            d2 = _equirect_dist2(lat[qi], lon[qi], lat, lon)
            mask = urls != urls[qi]
            order = np.lexsort((urls[mask], d2[mask]))[:5]
            want = urls[mask][order]
            # only assert when true kNN is within one cell width of the
            # query — the documented bounded-radius guarantee (ring-1
            # reaches at least one full cell width in every direction;
            # lon cell width shrinks by cos(lat))
            guaranteed_km = (360.0 / 1024) * 111.19 * np.cos(np.radians(lat[qi])) * 0.99
            if np.sqrt(d2[mask][order[-1]]) > guaranteed_km:
                continue
            sub = got[got["url"] == urls[qi]].sort_values("rank")
            np.testing.assert_array_equal(sub["neighbor"].to_numpy(), want)
            checked += 1
        assert checked >= 5  # dense region provides plenty of checkable probes

    def test_rank_and_determinism(self, ray_session, points):
        import ray.data as rd

        a = knn_per_cell(rd.from_pandas(points.head(300)), k=3).to_pandas()
        b = knn_per_cell(
            rd.from_pandas(points.head(300)), k=3
        ).to_pandas()
        a = a.sort_values(["url", "rank"]).reset_index(drop=True)
        b = b.sort_values(["url", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        assert set(a["rank"].unique()) <= {1, 2, 3}
        # dist is nondecreasing within each query
        for _, g in a.groupby("url"):
            d = g.sort_values("rank")["dist_km"].to_numpy()
            assert (np.diff(d) >= -1e-12).all()


class TestEmbeddingKnn:
    @pytest.fixture(scope="class")
    def emb(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        df = ds.to_pandas()
        return ds, df

    def test_bruteforce_matches_numpy(self, emb):
        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        qm = m[:4]
        got = (
            knn_embeddings(ds, qm, ids[:4], k=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        for qi in range(4):
            sims = mn @ mn[qi]
            mask = ids != ids[qi]
            order = np.lexsort((ids[mask], -sims[mask]))[:3]
            want = ids[mask][order]
            sub = got[got["query_id"] == ids[qi]].sort_values("rank")
            np.testing.assert_array_equal(sub["neighbor_id"].to_numpy(), want)

    def test_lsh_recall(self, emb):
        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 20
        brute = knn_embeddings(ds, m[:nq], ids[:nq], k=3).to_pandas()
        approx = knn_embeddings_lsh(
            ds, m[:nq], ids[:nq], k=3, n_planes=4
        ).to_pandas()
        hits = 0
        total = 0
        for qid in ids[:nq]:
            want = set(brute[brute["query_id"] == qid]["neighbor_id"])
            have = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(want & have)
            total += len(want)
        assert hits / total > 0.2  # approximate by design; sanity bound

    def test_ivf_recall_beats_floor(self, ray_session, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_ivf

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 20
        brute = knn_embeddings(ds, m[:nq], ids[:nq], k=3).to_pandas()
        approx = knn_embeddings_ivf(
            ds, m[:nq], ids[:nq], k=3, n_lists=8, n_probe=4, train_size=256
        ).to_pandas()
        hits = total = 0
        for qid in ids[:nq]:
            want = set(brute[brute["query_id"] == qid]["neighbor_id"])
            have = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(want & have)
            total += len(want)
        # probing half the lists must recover at least half the true kNN
        assert hits / total >= 0.5

    def test_ivf_full_probe_equals_bruteforce(self, ray_session, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_ivf

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 10
        brute = (
            knn_embeddings(ds, m[:nq], ids[:nq], k=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        # probing EVERY list = exact search; outputs must be identical
        full = (
            knn_embeddings_ivf(
                ds, m[:nq], ids[:nq], k=3, n_lists=8, n_probe=8, train_size=256
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert brute[["query_id", "neighbor_id", "rank"]].equals(
            full[["query_id", "neighbor_id", "rank"]]
        )

    def test_kmeans_deterministic(self):
        from data_model_ray.stages.knn import kmeans_centroids

        rng = np.random.default_rng(0)
        x = rng.standard_normal((300, 16))
        a = kmeans_centroids(x, 8)
        b = kmeans_centroids(x, 8)
        assert np.array_equal(a, b)
        assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


class TestSaltedKnn:
    def test_salted_equals_unsalted_on_skewed_input(self, ray_session):
        import ray.data as rd

        from data_model_ray.stages.knn import knn_per_cell

        # skewed fixture: 600 points crammed into one cell, 100 spread out
        rng = np.random.default_rng(9)
        lat = np.concatenate(
            [40.0 + rng.uniform(0, 0.05, 600), rng.uniform(10, 50, 100)]
        )
        lon = np.concatenate(
            [7.0 + rng.uniform(0, 0.05, 600), rng.uniform(-10, 30, 100)]
        )
        urls = np.array([f"u{i:04d}" for i in range(len(lat))])
        df = pd.DataFrame({"url": urls, "lat": lat, "lon": lon})

        base = (
            knn_per_cell(rd.from_pandas(df), k=5)
            .to_pandas()
            .sort_values(["url", "rank"])
            .reset_index(drop=True)
        )
        salted = (
            knn_per_cell(rd.from_pandas(df), k=5, salt_threshold=100, n_salt=4)
            .to_pandas()
            .sort_values(["url", "rank"])
            .reset_index(drop=True)
        )
        assert len(base) == len(salted)
        pd.testing.assert_frame_equal(
            base[["url", "neighbor", "rank"]], salted[["url", "neighbor", "rank"]]
        )


class TestPQ:
    """Product-quantization ANN: codebook quality, encode invariance,
    recall floor, and the full-refine == brute-force exactness pin."""

    @pytest.fixture(scope="class")
    def emb(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        df = ds.to_pandas()
        return ds, df

    def test_reconstruction_beats_global_mean(self, emb):
        from data_model_ray.stages.knn import (
            pq_codebooks,
            pq_decode_matrix,
            pq_encode_matrix,
        )

        _, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn = m / np.linalg.norm(m, axis=1, keepdims=True)
        books = pq_codebooks(mn, m=8, ksub=16)
        rec = pq_decode_matrix(pq_encode_matrix(mn, books), books)
        mse_pq = ((mn - rec) ** 2).mean()
        mse_mean = ((mn - mn.mean(axis=0)) ** 2).mean()
        # synthetic near-isotropic embeddings are a worst case for PQ;
        # still must clearly beat the rank-0 (global mean) quantizer
        assert mse_pq < 0.75 * mse_mean
        # doubling subspaces must tighten reconstruction
        books16 = pq_codebooks(mn, m=16, ksub=16)
        rec16 = pq_decode_matrix(pq_encode_matrix(mn, books16), books16)
        assert ((mn - rec16) ** 2).mean() < mse_pq

    def test_encode_layout_invariant(self, emb):
        import ray.data as rd

        from data_model_ray.stages.knn import pq_codebooks, pq_encode

        ds, df = emb
        mn = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        mn /= np.linalg.norm(mn, axis=1, keepdims=True)
        books = pq_codebooks(mn, m=8, ksub=16)
        a = pq_encode(ds, books).to_pandas().sort_values("vec_id")
        b = (
            pq_encode(ds.repartition(7), books)
            .to_pandas()
            .sort_values("vec_id")
        )
        assert [list(x) for x in a["codes"]] == [list(x) for x in b["codes"]]

    def test_pq_recall_beats_floor(self, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_pq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 20
        brute = knn_embeddings(ds, m[:nq], ids[:nq], k=3).to_pandas()
        approx = knn_embeddings_pq(
            ds, m[:nq], ids[:nq], k=3, refine=4, train_size=256
        ).to_pandas()
        hits = total = 0
        for qid in ids[:nq]:
            want = set(brute[brute["query_id"] == qid]["neighbor_id"])
            have = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(want & have)
            total += len(want)
        # ADC prune at 4x over-fetch + exact refine: strong recall expected
        assert hits / total >= 0.6

    def test_full_refine_matches_bruteforce(self, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_pq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 8
        brute = (
            knn_embeddings(ds, m[:nq], ids[:nq], k=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        # refine covering every row -> ADC prune is a no-op -> exact cosine
        exact = (
            knn_embeddings_pq(
                ds, m[:nq], ids[:nq], k=3, refine=10_000, train_size=256
            )
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(brute, exact)


class TestIvfPq:
    """IVF-PQ composition: recall floor at production settings; exactness
    pin at full probe + full refine."""

    @pytest.fixture(scope="class")
    def emb(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet(f"{SF}/embeddings.parquet")
        df = ds.to_pandas()
        return ds, df

    def test_recall_beats_floor(self, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_ivfpq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 20
        brute = knn_embeddings(ds, m[:nq], ids[:nq], k=3).to_pandas()
        approx = knn_embeddings_ivfpq(
            ds, m[:nq], ids[:nq], k=3, n_lists=8, n_probe=3, refine=4,
            train_size=256,
        )
        hits = total = 0
        for qid in ids[:nq]:
            want = set(brute[brute["query_id"] == qid]["neighbor_id"])
            have = set(approx[approx["query_id"] == qid]["neighbor_id"])
            hits += len(want & have)
            total += len(want)
        assert hits / total >= 0.5  # double prune (lists + ADC): lower floor

    def test_full_probe_full_refine_matches_bruteforce(self, emb):
        from data_model_ray.stages.knn import knn_embeddings, knn_embeddings_ivfpq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        nq = 8
        brute = (
            knn_embeddings(ds, m[:nq], ids[:nq], k=3)
            .to_pandas()
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        exact = (
            knn_embeddings_ivfpq(
                ds, m[:nq], ids[:nq], k=3, n_lists=8, n_probe=8,
                refine=10_000, train_size=256,
            )
            .sort_values(["query_id", "rank"])
            .reset_index(drop=True)
        )
        assert (brute["query_id"].values == exact["query_id"].values).all()
        assert (brute["neighbor_id"].values == exact["neighbor_id"].values).all()
        assert (brute["rank"].values == exact["rank"].values).all()

    def test_layout_invariant(self, emb):
        from data_model_ray.stages.knn import knn_embeddings_ivfpq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        a = knn_embeddings_ivfpq(
            ds, m[:5], ids[:5], k=3, n_lists=8, n_probe=8, refine=10_000,
            train_size=256,
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        b = knn_embeddings_ivfpq(
            ds.repartition(7), m[:5], ids[:5], k=3, n_lists=8, n_probe=8,
            refine=10_000, train_size=256,
        ).sort_values(["query_id", "rank"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_partial_probe_with_unprobed_blocks(self, emb):
        """Production settings (n_probe << n_lists) with many small blocks:
        some blocks have every row in an unprobed list and must emit
        empty blocks whose codes type still matches the non-empty ones
        (fixed_size_list) — regression for the schema-mismatch crash."""
        from data_model_ray.stages.knn import knn_embeddings_ivfpq

        ds, df = emb
        m = np.stack(df["embedding"].to_numpy()).astype(np.float64)
        ids = df["vec_id"].to_numpy()
        out = knn_embeddings_ivfpq(
            ds.repartition(40), m[:3], ids[:3], k=3, n_lists=8, n_probe=1,
            refine=4, train_size=256,
        )
        assert set(out.columns) == {"query_id", "neighbor_id", "rank"}
        assert len(out) > 0
