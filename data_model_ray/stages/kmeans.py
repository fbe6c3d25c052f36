"""Distributed spherical k-means (Lloyd's) over an embedding column.

The clustering-based-curation operator a training-data pipeline runs over
its embedding table (topic bucketing, diversity sampling, quota-based
filtering). Complements ``knn.kmeans_centroids`` (which fits the IVF
coarse quantizer on a driver-side SAMPLE): here the E-step scans the
FULL corpus as a ``map_batches`` stage — each block reduces to a
``(k x dim)`` partial-sum matrix plus per-cluster counts, and only those
tiny partials reach the driver for the M-step. Per iteration the corpus
moves zero times; the only cross-node traffic is ``num_blocks`` partial
rows down and one ``ray.put`` centroid broadcast up.

Determinism: seeded sample init, stable argmax assignment, float64
accumulation. Cross-block partial-sum order can drift centroids at ULP
scale, so tests assert assignments on well-separated fixtures (exact)
and centroids to tolerance — the same contract the IVF tests use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .knn import _as_matrix, _normalize, kmeans_centroids


def _vec_ds(ds, vec_col: str, id_col: str):
    return ds.select_columns([id_col, vec_col])


def _hash_sample(vecs, n: int, *, vec_col: str, id_col: str):
    """Deterministic uniform sample: the ``n`` rows with the smallest
    ``splitmix64(id)`` (a distributed bottom-k, the engine's hash-sampling
    primitive). Unlike a ``limit()`` head — which on storage ordered or
    clustered by content can miss whole modes — the selected set is a pure
    function of the ids: stable under partitioning, block order, and
    storage layout. Per-block bottom-k partials bound the exchange to
    ``n`` rows per block. Returns ``(ids sorted by (hash, id), unit-norm
    (n, dim) float64 matrix in that order)``.
    """
    from ..hashing import splitmix64

    def bottomk(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = splitmix64(ids.astype(np.uint64)).astype(np.uint64)
        take = np.lexsort((ids, h))[: min(n, len(ids))]
        return t.take(pa.array(take))

    pooled = (
        vecs.map_batches(bottomk, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(bottomk, batch_format="pyarrow", batch_size=None)
        .to_pandas()
    )
    if id_col not in pooled.columns or len(pooled) == 0:
        raise ValueError("k-means: empty input dataset (no vectors to sample)")
    ids = pooled[id_col].to_numpy(np.int64)
    h = splitmix64(ids.astype(np.uint64)).astype(np.uint64)
    order = np.lexsort((ids, h))[: min(n, len(ids))]
    ids = ids[order]
    mat = _normalize(
        np.stack(
            [np.asarray(v, dtype=np.float64) for v in pooled[vec_col].to_numpy()[order]]
        )
    )
    return ids, mat


def _farthest_point_init(sample: np.ndarray, k: int) -> np.ndarray:
    """Deterministic k-means++-style seeding: start from row 0, then
    repeatedly take the sample point with the smallest max-cosine to the
    seeds chosen so far — spreads one seed per well-separated mode, which
    seeded random choice routinely misses (it can drop a whole blob)."""
    chosen = [0]
    maxsim = sample @ sample[0]
    for _ in range(1, k):
        nxt = int(np.argmin(maxsim))
        chosen.append(nxt)
        maxsim = np.maximum(maxsim, sample @ sample[nxt])
    return sample[chosen].copy()


def kmeans_fit(
    ds,
    k: int,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_iters: int = 10,
    seed: int = 7,
    sample_size: int = 2048,
    checkpoint_dir: str | None = None,
):
    """Fit k spherical centroids over the full dataset.

    Returns ``(centroids, inertia_per_iter)`` — centroids are unit-norm
    ``(k, dim)`` float64; inertia is the corpus sum of ``1 - cos`` to the
    assigned centroid, one value per iteration (monotone non-increasing,
    which the tests assert — the live convergence signal a 100 TB run
    would checkpoint alongside lineage).

    The input embedding dataset is materialized once (object-store
    backed, spills under pressure) because Lloyd's re-scans it every
    iteration; re-reading parquet per iteration would work too but pays
    the decode k times.

    ``checkpoint_dir``: if set, every completed iteration commits
    ``centroids.npy`` + ``state.json`` atomically (temp + ``os.replace``,
    same discipline as ``state/lineage.py``); a rerun resumes from the
    last committed iteration instead of re-scanning the corpus for the
    iterations already done — the north rule's resume-from-checkpoint
    contract applied to the iterative family. The state embeds a DATASET
    fingerprint (row count + content hash of the deterministic init
    sample), so a checkpoint from a different or changed dataset is
    invalidated instead of silently resumed (matching the lineage
    layer's fingerprint-in-every-commit discipline).
    """
    import hashlib
    import json
    import os

    import ray

    vecs = _vec_ds(ds, vec_col, id_col)
    sample_ids, sample = _hash_sample(
        vecs, max(sample_size, k), vec_col=vec_col, id_col=id_col
    )
    n_rows = vecs.count()
    fp = hashlib.sha256()
    fp.update(np.int64(n_rows).tobytes())
    fp.update(sample_ids.tobytes())
    fp.update(np.round(sample, 6).astype(np.float64).tobytes())
    fingerprint = fp.hexdigest()

    start_iter = 0
    ckpt_state = None
    if checkpoint_dir is not None:
        os.makedirs(checkpoint_dir, exist_ok=True)
        sp = os.path.join(checkpoint_dir, "state.json")
        cp = os.path.join(checkpoint_dir, "centroids.npy")
        if os.path.exists(sp) and os.path.exists(cp):
            with open(sp) as f:
                ckpt_state = json.load(f)
            if (
                ckpt_state.get("k") == k
                and ckpt_state.get("seed") == seed
                and ckpt_state.get("n_iters") == n_iters
                and ckpt_state.get("fingerprint") == fingerprint
            ):
                start_iter = int(ckpt_state["next_iter"])
            else:
                ckpt_state = None
        if start_iter >= n_iters or (
            ckpt_state is not None and ckpt_state.get("converged")
        ):
            return np.load(cp), list(ckpt_state["inertia"])

    vecs = vecs.materialize()

    if ckpt_state is not None and start_iter > 0:
        cents = np.load(os.path.join(checkpoint_dir, "centroids.npy"))
        inertia = list(ckpt_state["inertia"])
    else:
        cents = _farthest_point_init(sample, k)
        cents = kmeans_centroids(sample, k, n_iters=3, seed=seed, init=cents)
        inertia = []

    def _commit(it: int, converged: bool) -> None:
        if checkpoint_dir is None:
            return
        cp = os.path.join(checkpoint_dir, "centroids.npy")
        sp = os.path.join(checkpoint_dir, "state.json")
        np.save(cp + ".tmp.npy", cents)
        os.replace(cp + ".tmp.npy", cp)
        with open(sp + ".tmp", "w") as f:
            json.dump(
                {
                    "k": k,
                    "seed": seed,
                    "n_iters": n_iters,
                    "fingerprint": fingerprint,
                    "next_iter": it + 1,
                    "converged": converged,
                    "inertia": inertia,
                },
                f,
            )
        os.replace(sp + ".tmp", sp)

    for it in range(start_iter, n_iters):
        ref = ray.put(cents)

        def estep(batch: pa.Table) -> pd.DataFrame:
            c = ray.get(ref)  # zero-copy object-store read per task
            m = _normalize(_as_matrix(batch[vec_col]))
            sims = m @ c.T
            assign = np.argmax(sims, axis=1)
            kk, d = c.shape
            sums = np.zeros((kk, d), dtype=np.float64)
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=kk).astype(np.int64)
            loss = float(np.sum(1.0 - sims[np.arange(len(m)), assign]))
            return pd.DataFrame(
                {
                    "sums": [sums.reshape(-1)],
                    "counts": [counts],
                    "loss": [loss],
                }
            )

        parts = vecs.map_batches(estep, batch_format="pyarrow").to_pandas()
        dim = cents.shape[1]
        sums = np.sum(
            np.stack(
                [
                    np.asarray(s, dtype=np.float64).reshape(k, dim)
                    for s in parts["sums"]
                ]
            ),
            axis=0,
        )
        counts = np.sum(
            np.stack([np.asarray(c, dtype=np.int64) for c in parts["counts"]]),
            axis=0,
        )
        inertia.append(float(parts["loss"].sum()))
        nz = counts > 0
        new = cents.copy()
        new[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(new, axis=1)
        pos = norms > 0
        new[pos] = new[pos] / norms[pos, None]
        converged = bool(np.allclose(new, cents, atol=1e-12))
        cents = new
        _commit(it, converged)
        if converged:
            break
    return cents, inertia


def kmeans_assign(
    ds,
    centroids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Assign every row to its nearest centroid (broadcast once via
    ``ray.put``; the corpus streams through one map_batches). Returns
    ``(id_col, cluster, sim)`` with cosine similarity rounded to 6dp."""
    import ray

    cents = _normalize(np.asarray(centroids, dtype=np.float64))
    ref = ray.put(cents)

    def fn(batch: pa.Table) -> pd.DataFrame:
        c = ray.get(ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        sims = m @ c.T
        assign = np.argmax(sims, axis=1)
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False),
                "cluster": assign.astype(np.int64),
                "sim": np.round(sims[np.arange(len(m)), assign], 6),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        fn, batch_format="pyarrow"
    )


def diversity_sample(
    ds,
    centroids: np.ndarray,
    *,
    per_cluster: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """Cluster-quota diversity sampling — the curation move that keeps a
    corpus from being dominated by its biggest mode: assign every row to
    its nearest centroid, then take an exact ``per_cluster`` quota from
    EACH cluster, ordered by a Knuth multiplicative hash of the id
    (deterministic, partition- and engine-independent, unbiased within a
    cluster).

    Scale shape: per-block top-n-per-cluster partials bound the exchange
    to ``per_cluster`` rows per (block, cluster); one small groupby
    finishes — the same two-level pattern as grouped top-k.
    """
    KNUTH = np.uint64(2654435761)
    U32 = np.uint64(0xFFFFFFFF)
    assigned = kmeans_assign(
        ds, centroids, vec_col=vec_col, id_col=id_col
    )

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        h = (df[id_col].to_numpy(np.uint64) * KNUTH) & U32
        out = df.assign(__h=h.astype(np.int64))
        out = out.sort_values(["cluster", "__h", id_col], kind="mergesort")
        out = out.groupby("cluster", sort=False).head(per_cluster)
        return out.drop(columns="__h")

    partial = assigned.map_batches(topn, batch_format="pandas")
    return (
        partial.groupby("cluster")
        .map_groups(topn, batch_format="pandas")
    )


def _fold_blobs(blobs, d: int) -> np.ndarray:
    """Order-canonical float fold: block partials arrive in nondeterministic
    order and float addition is order-sensitive — sort the raw byte blobs
    first so the sum is bit-reproducible run to run."""
    arrs = sorted(
        (b if isinstance(b, bytes) else bytes(b)) for b in blobs
    )
    acc = np.zeros(d)
    for blob in arrs:
        acc += np.frombuffer(blob, dtype=np.float64)
    return acc


def power_iteration_top_component(
    sf_dir_or_path: str,
    *,
    vec_col: str = "embedding",
    table: str = "embeddings",
    iters: int = 12,
):
    """Top principal component of the (uncentered-then-centered) embedding
    matrix by distributed power iteration — the third iterative-algorithm
    family member beside k-means and fixed-point PageRank.

    Per iteration ONE streaming pass: each block contributes the d-vector
    partial X_blk^T (X_blk v) plus the count/mean partials on the first
    pass; the driver folds <= blocks x d floats and renormalizes (the
    kmeans-centroid state bound — never a collect of the matrix). Init is
    deterministic (ones/sqrt(d)); the sign is fixed so the first
    max-|coeff| coordinate is positive — fully reproducible, pinned
    against numpy eigh in tests.

    Returns (component: np.ndarray[d], eigenvalue: float, n_rows: int).
    """
    import os

    import pyarrow.compute as pc_

    from ..sources.fs import sized_read_parquet

    path = (
        os.path.join(sf_dir_or_path, f"{table}.parquet")
        if os.path.isdir(sf_dir_or_path)
        else sf_dir_or_path
    )
    ds = sized_read_parquet(path, columns=[vec_col])

    def mat_of(t) -> np.ndarray:
        la = t[vec_col]
        if isinstance(la, pa.ChunkedArray):
            la = la.combine_chunks()
        flat = la.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        return flat.reshape(t.num_rows, -1)

    # pass 0: n + column sums (for exact centering)
    def sum_partial(t) -> pd.DataFrame:
        x = mat_of(t)
        return pd.DataFrame({"n": [len(x)], "s": [x.sum(axis=0).tobytes()], "d": [x.shape[1]]})

    from ..sources.fs import to_pandas_cols

    parts = to_pandas_cols(
        ds.map_batches(sum_partial, batch_format="pyarrow"),
        {"n": "int64", "s": "object", "d": "int64"},
    )
    n_total = int(parts["n"].sum())
    if n_total == 0:
        return np.zeros(0), 0.0, 0
    d = int(parts["d"].iloc[0])
    mean = _fold_blobs(parts["s"], d) / n_total

    import ray

    v = np.ones(d) / np.sqrt(d)
    eig = 0.0
    for _ in range(iters):
        v_ref = ray.put(v)
        mean_ref = ray.put(mean)

        def matvec(t) -> pd.DataFrame:
            vv = ray.get(v_ref)
            mu = ray.get(mean_ref)
            x = mat_of(t) - mu
            return pd.DataFrame({"p": [(x.T @ (x @ vv)).tobytes()]})

        folded = to_pandas_cols(
            ds.map_batches(matvec, batch_format="pyarrow"), {"p": "object"}
        )
        acc = _fold_blobs(folded["p"], d)
        eig = float(np.linalg.norm(acc))
        if eig == 0.0:
            break
        v = acc / eig
    # deterministic sign: the max-|coeff| coordinate is positive
    j = int(np.argmax(np.abs(v)))
    if v[j] < 0:
        v = -v
    return v, eig / max(n_total - 1, 1), n_total
