"""Distributed spherical k-means (stages/kmeans.py): planted-cluster
recovery, monotone inertia, driver-reference agreement, assignment API."""

import numpy as np
import pandas as pd
import pytest

from data_model_ray.stages.kmeans import kmeans_assign, kmeans_fit
from data_model_ray.stages.knn import _normalize


def _blobs(n_per: int = 120, k: int = 4, dim: int = 16, seed: int = 3):
    """Well-separated unit-norm blobs: k orthogonal axes + small noise."""
    rng = np.random.default_rng(seed)
    rows, labels = [], []
    for c in range(k):
        center = np.zeros(dim)
        center[c] = 1.0
        pts = center + rng.normal(scale=0.05, size=(n_per, dim))
        rows.append(pts)
        labels.extend([c] * n_per)
    m = _normalize(np.concatenate(rows))
    return m, np.array(labels)


def _ds_from(m: np.ndarray):
    import ray.data as rd

    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(m), dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in m],
        }
    )
    return rd.from_pandas(df).repartition(6)


def test_planted_blobs_recovered(ray_session):
    m, truth = _blobs()
    ds = _ds_from(m)
    cents, inertia = kmeans_fit(ds, 4, n_iters=8)
    assert cents.shape == (4, 16)
    # inertia monotone non-increasing (allow ULP slack)
    assert all(b <= a + 1e-9 for a, b in zip(inertia, inertia[1:]))
    out = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    got = out["cluster"].to_numpy()
    # cluster ids are arbitrary: check the PARTITION matches the planted one
    for c in np.unique(truth):
        ids = got[truth == c]
        assert len(np.unique(ids)) == 1, f"planted blob {c} split"
    assert len(np.unique(got)) == 4
    # assignments are near-perfect cosine fits on separated blobs
    assert out["sim"].min() > 0.8


def _hash_sample_ref(m: np.ndarray, n: int) -> np.ndarray:
    """Driver-side replica of kmeans._hash_sample over vec_id=arange."""
    from data_model_ray.hashing import splitmix64

    ids = np.arange(len(m), dtype=np.int64)
    h = splitmix64(ids.astype(np.uint64)).astype(np.uint64)
    return m[np.lexsort((ids, h))[:n]]


def test_matches_driver_reference(ray_session):
    """Distributed E/M steps == single-process numpy Lloyd's (same init)."""
    m, _ = _blobs(n_per=60, k=3, dim=8, seed=11)
    ds = _ds_from(m)
    cents, _ = kmeans_fit(ds, 3, n_iters=5, sample_size=64)

    from data_model_ray.stages.kmeans import _farthest_point_init
    from data_model_ray.stages.knn import kmeans_centroids

    s = _hash_sample_ref(m, 64)
    ref = kmeans_centroids(
        s, 3, n_iters=3, seed=7, init=_farthest_point_init(s, 3)
    )
    for _ in range(5):
        sims = m @ ref.T
        assign = np.argmax(sims, axis=1)
        new = ref.copy()
        for c in range(3):
            sel = assign == c
            if sel.any():
                v = m[sel].sum(axis=0) / sel.sum()
                n = np.linalg.norm(v)
                if n > 0:
                    new[c] = v / n
        if np.allclose(new, ref, atol=1e-12):
            ref = new
            break
        ref = new
    assert np.allclose(cents, ref, atol=1e-6)


def test_assign_schema_and_determinism(ray_session):
    m, _ = _blobs(n_per=30, k=2, dim=8, seed=5)
    ds = _ds_from(m)
    cents, _ = kmeans_fit(ds, 2, n_iters=3, sample_size=32)
    a = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    b = kmeans_assign(ds, cents).to_pandas().sort_values("vec_id")
    assert list(a.columns) == ["vec_id", "cluster", "sim"]
    pd.testing.assert_frame_equal(
        a.reset_index(drop=True), b.reset_index(drop=True)
    )


def test_checkpoint_resume(ray_session, tmp_path):
    """Interrupted fit resumes from the last committed iteration and
    reproduces the uninterrupted trajectory exactly."""
    import json

    m, _ = _blobs(n_per=40, k=3, dim=8, seed=13)
    ds = _ds_from(m)
    ck = str(tmp_path / "ck")
    full, inertia = kmeans_fit(ds, 3, n_iters=4, sample_size=32, checkpoint_dir=ck)

    # completed run short-circuits: no corpus rescan, identical result
    again, inertia2 = kmeans_fit(ds, 3, n_iters=4, sample_size=32, checkpoint_dir=ck)
    assert np.array_equal(full, again) and inertia == inertia2

    # simulate a crash after iteration 0: rewind the committed state
    sp = str(tmp_path / "ck" / "state.json")
    st = json.load(open(sp))
    st["next_iter"], st["converged"] = 1, False
    st["inertia"] = st["inertia"][:1]
    json.dump(st, open(sp, "w"))
    # ...but centroids.npy holds the final ones; rewrite to iteration-0 state
    # by re-running a 1-iter fit into a fresh dir and copying its centroids
    ck0 = str(tmp_path / "ck0")
    c0, _ = kmeans_fit(ds, 3, n_iters=1, sample_size=32, checkpoint_dir=ck0)
    np.save(str(tmp_path / "ck" / "centroids.tmp.npy"), c0)
    import os

    os.replace(
        str(tmp_path / "ck" / "centroids.tmp.npy"),
        str(tmp_path / "ck" / "centroids.npy"),
    )
    resumed, _ = kmeans_fit(ds, 3, n_iters=4, sample_size=32, checkpoint_dir=ck)
    assert np.allclose(resumed, full, atol=1e-12)


def test_diversity_sample_exact_quota(ray_session):
    """Exact n-per-cluster quota, deterministic, matches a driver-side
    reference (hash-order head per assigned cluster) on a skewed corpus."""
    from data_model_ray.stages.kmeans import diversity_sample

    rng = np.random.default_rng(21)
    big = np.zeros((300, 8)); big[:, 0] = 1.0
    small = np.zeros((40, 8)); small[:, 1] = 1.0
    m = _normalize(
        np.concatenate([big, small]) + rng.normal(scale=0.03, size=(340, 8))
    )
    ds = _ds_from(m)
    cents, _ = kmeans_fit(ds, 2, n_iters=4, sample_size=64)
    got = (
        diversity_sample(ds, cents, per_cluster=15)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    sizes = got.groupby("cluster").size()
    assert (sizes == 15).all() and len(sizes) == 2

    # driver reference
    from data_model_ray.stages.kmeans import kmeans_assign

    ass = kmeans_assign(ds, cents).to_pandas()
    KNUTH, U32 = np.uint64(2654435761), np.uint64(0xFFFFFFFF)
    ass["__h"] = ((ass["vec_id"].to_numpy(np.uint64) * KNUTH) & U32).astype(
        np.int64
    )
    ref = (
        ass.sort_values(["cluster", "__h", "vec_id"], kind="mergesort")
        .groupby("cluster", sort=False)
        .head(15)
        .drop(columns="__h")
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, ref)


def test_empty_cluster_kept(ray_session):
    """A centroid that captures no points keeps its previous position
    instead of NaN-ing out."""
    m, _ = _blobs(n_per=40, k=2, dim=8, seed=9)
    ds = _ds_from(m)
    # k=4 over 2 real blobs: at most 4, at least 2 distinct assignments,
    # and centroids must stay finite unit vectors
    cents, _ = kmeans_fit(ds, 4, n_iters=4, sample_size=16)
    assert np.isfinite(cents).all()
    norms = np.linalg.norm(cents, axis=1)
    assert np.allclose(norms, 1.0, atol=1e-9)


def test_hash_sample_order_invariant(ray_session):
    """The init sample is a pure function of the ids — identical whatever
    the storage order or partitioning (a head-limit sample is neither)."""
    import ray.data as rd

    from data_model_ray.stages.kmeans import _hash_sample

    m, _ = _blobs(n_per=40, k=3, dim=8, seed=21)
    ids = np.arange(len(m), dtype=np.int64)
    perm = np.random.default_rng(0).permutation(len(m))
    df_a = pd.DataFrame(
        {"vec_id": ids, "embedding": [r.astype(np.float32) for r in m]}
    )
    df_b = df_a.iloc[perm].reset_index(drop=True)
    ds_a = rd.from_pandas(df_a).repartition(6)
    ds_b = rd.from_pandas(df_b).repartition(3)
    ids_a, mat_a = _hash_sample(ds_a, 32, vec_col="embedding", id_col="vec_id")
    ids_b, mat_b = _hash_sample(ds_b, 32, vec_col="embedding", id_col="vec_id")
    np.testing.assert_array_equal(ids_a, ids_b)
    np.testing.assert_allclose(mat_a, mat_b, atol=0)
    assert len(ids_a) == 32
    # and matches the driver-side replica
    np.testing.assert_allclose(
        mat_a, _normalize(_hash_sample_ref(m, 32)), atol=1e-7
    )


def test_checkpoint_invalidated_on_dataset_change(ray_session, tmp_path):
    """A checkpoint carries a dataset fingerprint; pointing the same
    checkpoint dir at DIFFERENT data must refit, not resume stale
    centroids (round-2 advice: no silent cross-dataset resume)."""
    ck = str(tmp_path / "ck")
    m1, _ = _blobs(n_per=40, k=3, dim=8, seed=31)
    c1, _ = kmeans_fit(_ds_from(m1), 3, n_iters=3, sample_size=32, checkpoint_dir=ck)

    m2, _ = _blobs(n_per=40, k=3, dim=8, seed=77)  # different corpus
    c2, _ = kmeans_fit(_ds_from(m2), 3, n_iters=3, sample_size=32, checkpoint_dir=ck)
    fresh, _ = kmeans_fit(_ds_from(m2), 3, n_iters=3, sample_size=32)
    assert np.allclose(c2, fresh, atol=1e-12)
    assert not np.allclose(c1, c2, atol=1e-6)


class TestPowerIteration:
    def test_matches_numpy_eig_planted(self, ray_session, tmp_path):
        """Planted dominant direction (clear eigengap): power iteration
        must converge to numpy's eigh direction and eigenvalue."""
        import numpy.linalg as la
        import pyarrow as pa
        import pyarrow.parquet as pq

        from data_model_ray.stages.kmeans import power_iteration_top_component

        rng = np.random.default_rng(4)
        n, d = 800, 24
        u = rng.standard_normal(d)
        u /= la.norm(u)
        x = np.outer(rng.standard_normal(n) * 5.0, u) + 0.2 * rng.standard_normal((n, d))
        t = pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(x.astype(np.float32))),
            }
        )
        pq.write_table(t, str(tmp_path / "embeddings.parquet"))
        v, eig, cnt = power_iteration_top_component(str(tmp_path), iters=25)
        xf = x.astype(np.float32).astype(np.float64)
        xc = xf - xf.mean(axis=0)
        w, vecs = la.eigh(xc.T @ xc)
        ref = vecs[:, -1]
        j = int(np.argmax(np.abs(ref)))
        if ref[j] < 0:
            ref = -ref
        assert cnt == n
        assert abs(eig - w[-1] / (n - 1)) / (w[-1] / (n - 1)) < 1e-9
        assert np.abs(v - ref).max() < 1e-8

    def test_fixture_direction_reasonable(self, ray_session):
        """On the structureless fixture the eigengap is small; require the
        Rayleigh quotient to be within 2% of the true top eigenvalue."""
        import numpy.linalg as la
        import pyarrow.parquet as pq

        from data_model_ray.stages.kmeans import power_iteration_top_component

        sf = "/root/testdata/sf0.001"
        v, eig, n = power_iteration_top_component(sf, iters=30)
        t = pq.read_table(f"{sf}/embeddings.parquet", columns=["embedding"])
        x = (
            t["embedding"].combine_chunks().flatten().to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(t.num_rows, -1)
        )
        xc = x - x.mean(axis=0)
        w = la.eigvalsh(xc.T @ xc)
        rq = float(v @ (xc.T @ (xc @ v))) / (n - 1)
        assert n == len(x)
        assert rq <= w[-1] / (n - 1) + 1e-9
        assert rq > 0.98 * w[-1] / (n - 1)

    def test_deterministic(self, ray_session):
        from data_model_ray.stages.kmeans import power_iteration_top_component

        a = power_iteration_top_component("/root/testdata/sf0.001", iters=8)
        b = power_iteration_top_component("/root/testdata/sf0.001", iters=8)
        assert np.array_equal(a[0], b[0]) and a[1] == b[1]
