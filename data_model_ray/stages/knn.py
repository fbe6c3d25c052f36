"""kNN operators: per-cell spatial kNN and embedding similarity search.

- ``knn_per_cell``: the north-star per-cell kNN (SURVEY.md 7.3): candidates
  are duplicated into their ring-1 neighbor cells with ``flat_map``-style
  batch expansion, then one ``groupby(cell).map_groups`` computes each
  cell's queries against cell+ring candidates. **Partitioning assumption**
  (documented per task brief): results are exact bounded-radius kNN — a
  neighbor farther than one cell width away is not considered; tests verify
  exactness for dense cells where true kNN lies within the ring.
- ``knn_embeddings``: brute-force cosine top-k of every row against a small
  broadcast query matrix (numpy matmul per batch — the ANN baseline); and
  ``knn_embeddings_lsh``: a random-hyperplane LSH-bucketed variant (the
  scale path: candidates only within matching buckets).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..grid import geocell_encode, geocell_neighbors

EARTH_DEG = 111.19492664455873  # km per degree latitude (spherical mean)


def _equirect_dist2(
    lat0: np.ndarray, lon0: np.ndarray, lat1: np.ndarray, lon1: np.ndarray
) -> np.ndarray:
    """Squared equirectangular-approx distance (km^2): deterministic, fast,
    monotone with true distance at cell scale (documented metric choice).

    The longitude delta wraps across the antimeridian so candidates pulled
    in by the ring expansion's lon wraparound (grid.geocell_neighbors) get
    consistent distances near +-180.
    """
    mean_lat = np.radians((lat0 + lat1) / 2.0)
    dy = (lat1 - lat0) * EARTH_DEG
    dlon = np.mod(lon1 - lon0 + 180.0, 360.0) - 180.0
    dx = dlon * EARTH_DEG * np.cos(mean_lat)
    return dx * dx + dy * dy


def knn_per_cell(
    ds,
    *,
    k: int = 5,
    cell_res: int = 7,
    id_col: str = "url",
    salt_threshold: int | None = None,
    n_salt: int = 4,
):
    """For every row: its k nearest rows (by lat/lon) within cell + ring-1.

    Input needs columns (id_col, lat, lon). Output: one row per (query, rank)
    -> columns (id_col, neighbor, rank, dist_km). Deterministic ties: sort by
    (dist, neighbor id).

    Mega-cell skew (north rule: "salted repartitioning"): with
    ``salt_threshold`` set, a counting pre-pass finds cells holding more
    than that many rows, and their groups are SALTED — each hot cell's
    query rows split across ``n_salt`` shards (deterministic id hash) while
    its candidate rows replicate into every shard, so results are identical
    but no single task owns a whole mega-cell. Cold cells pay nothing; the
    extra exchange volume is ``(n_salt - 1) x`` the hot cells' candidate
    rows only. Default (None) keeps the unsalted single-group-per-cell
    plan.
    """
    import ray

    hot_ref = None
    if salt_threshold is not None:
        # counting pre-pass: per-block partial counts -> tiny global combine
        # (bounded by the grid, <= 512*1024 cells at res 7)
        def count_partial(batch: pa.Table) -> pd.DataFrame:
            lat = batch["lat"].to_numpy(zero_copy_only=False)
            lon = batch["lon"].to_numpy(zero_copy_only=False)
            cells = geocell_encode(lat, lon, cell_res)
            uniq, cnt = np.unique(cells, return_counts=True)
            return pd.DataFrame({"cell": uniq, "n": cnt})

        counts = (
            ds.map_batches(count_partial, batch_format="pyarrow")
            .groupby("cell")
            .sum("n")
            .to_pandas()
        )
        col = "sum(n)" if "sum(n)" in counts.columns else "n"
        hot = counts.loc[counts[col] > salt_threshold, "cell"].to_numpy()
        hot_ref = ray.put(np.asarray(hot, dtype=np.uint64))

    def expand(batch: pa.Table) -> pd.DataFrame:
        df = batch.select([id_col, "lat", "lon"]).to_pandas()
        lat = df["lat"].to_numpy()
        lon = df["lon"].to_numpy()
        own = geocell_encode(lat, lon, cell_res)
        # candidate copies: one per ring-1 cell (incl. own); query flag only
        # on the own-cell copy. Ring fan-out is 9x on candidate rows — the
        # standard grid-join duplication (bounded, no shuffle skew beyond
        # the cell skew itself).
        # ring expansion vectorized via the repeat/cumsum trick over the
        # UNIQUE cells of the batch (rings computed once per cell, not row)
        uniq, inv = np.unique(own, return_inverse=True)
        rings = [geocell_neighbors(int(c), 1) for c in uniq]
        ring_sizes = np.array([len(r) for r in rings], dtype=np.int64)
        flat_ring = (
            np.concatenate(rings) if rings else np.array([], dtype=np.uint64)
        )
        ring_starts = np.zeros(len(uniq) + 1, dtype=np.int64)
        np.cumsum(ring_sizes, out=ring_starts[1:])
        reps = ring_sizes[inv]
        total = int(reps.sum())
        row_starts = np.zeros(len(df) + 1, dtype=np.int64)
        np.cumsum(reps, out=row_starts[1:])
        pos = np.arange(total, dtype=np.int64) - np.repeat(row_starts[:-1], reps)
        owner = flat_ring[np.repeat(ring_starts[inv], reps) + pos]
        idx = np.repeat(np.arange(len(df)), reps)
        out = df.iloc[idx].reset_index(drop=True)
        out["__cell"] = owner
        out["__is_query"] = owner == np.repeat(own, reps)
        out["__salt"] = np.zeros(len(out), dtype=np.int32)
        if hot_ref is not None:
            import ray as _ray

            hot_cells = _ray.get(hot_ref)
            hot_mask = np.isin(out["__cell"].to_numpy(), hot_cells)
            if hot_mask.any():
                cold = out[~hot_mask]
                hrows = out[hot_mask]
                # replicate hot rows into every salt shard; the query flag
                # survives only in the row's home shard (id-hash routed)
                rep = pd.concat([hrows] * n_salt, ignore_index=True)
                salts = np.repeat(np.arange(n_salt, dtype=np.int32), len(hrows))
                qsalt = (
                    pd.util.hash_array(
                        np.tile(hrows[id_col].to_numpy(), n_salt)
                    ).astype(np.int64)
                    % n_salt
                ).astype(np.int32)
                rep["__salt"] = salts
                rep["__is_query"] = rep["__is_query"].to_numpy() & (salts == qsalt)
                out = pd.concat([cold, rep], ignore_index=True)
        return out

    def per_cell(group: pd.DataFrame) -> pd.DataFrame:
        q = group[group["__is_query"]]
        if q.empty:
            return pd.DataFrame(
                {id_col: [], "neighbor": [], "rank": [], "dist_km": []}
            )
        c_lat = group["lat"].to_numpy()
        c_lon = group["lon"].to_numpy()
        c_ids = group[id_col].to_numpy()
        # stable candidate order by id so argsort tie-breaks are deterministic
        c_order = np.argsort(c_ids, kind="stable")
        c_lat, c_lon, c_ids = c_lat[c_order], c_lon[c_order], c_ids[c_order]
        q_lat = q["lat"].to_numpy()
        q_lon = q["lon"].to_numpy()
        q_ids = q[id_col].to_numpy()
        out_q, out_n, out_r, out_d = [], [], [], []
        # chunked (Q x C) distance matrices: vectorized, memory-bounded —
        # the mega-cell guard (SURVEY 7.4): a dense cell never allocates
        # more than CHUNK x C doubles at once
        CHUNK = 512
        for s in range(0, len(q), CHUNK):
            ql = q_lat[s : s + CHUNK, None]
            qo = q_lon[s : s + CHUNK, None]
            d2 = _equirect_dist2(ql, qo, c_lat[None, :], c_lon[None, :])
            d2[q_ids[s : s + CHUNK, None] == c_ids[None, :]] = np.inf  # self
            kk = min(k, d2.shape[1] - 1)
            if kk <= 0:
                continue
            # argsort is stable -> ties by candidate id (pre-sorted order)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :kk]
            rows_idx = np.arange(idx.shape[0])[:, None]
            dsel = d2[rows_idx, idx]
            finite = np.isfinite(dsel)
            out_q.append(np.repeat(q_ids[s : s + CHUNK], kk)[finite.ravel()])
            out_n.append(c_ids[idx].ravel()[finite.ravel()])
            out_r.append(
                np.tile(np.arange(1, kk + 1), idx.shape[0])[finite.ravel()]
            )
            out_d.append(np.sqrt(dsel.ravel()[finite.ravel()]))
        if not out_q:
            return pd.DataFrame(
                {id_col: [], "neighbor": [], "rank": [], "dist_km": []}
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(out_q),
                "neighbor": np.concatenate(out_n),
                "rank": np.concatenate(out_r),
                "dist_km": np.concatenate(out_d),
            }
        )

    return (
        ds.map_batches(expand, batch_format="pyarrow")
        .groupby(["__cell", "__salt"])
        .map_groups(per_cell, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Embedding similarity search
# ---------------------------------------------------------------------------


def _as_matrix(col) -> np.ndarray:
    """(fixed_size_)list<float> column -> (n, d) float64 matrix (zero-copy-ish)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, (pa.ListArray, pa.LargeListArray, pa.FixedSizeListArray)):
        flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(arr)
        return flat.reshape(n, -1)
    if isinstance(arr, pa.ExtensionArray) or isinstance(arr, np.ndarray):
        # Ray tensor extension array (from_pandas with ndarray cells) or an
        # object ndarray of per-row vectors
        rows = arr.to_numpy(zero_copy_only=False) if isinstance(arr, pa.ExtensionArray) else arr
        return np.stack([np.asarray(r, dtype=np.float64) for r in rows])
    raise TypeError(f"expected list column, got {type(arr)}")


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def knn_embeddings(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    exclude_self: bool = True,
):
    """Brute-force cosine top-k of a broadcast query matrix vs every row.

    The queries (small side) are broadcast via ``ray.put`` and multiplied
    against each Arrow batch with one numpy matmul (vectorized baseline per
    task brief). Per-batch partial top-k rows are emitted and reduced to
    global top-k in a final (tiny) driver-side step expressed as
    sort + per-query head — candidates per batch are <= n_queries * k.

    Output columns: (query_id, neighbor_id, rank), rank 1..k; deterministic
    ties by (cos desc, neighbor_id asc).
    """
    import ray

    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put(qn)
    qids = np.asarray(query_ids)

    def partial_topk(batch: pa.Table) -> pd.DataFrame:
        q = ray.get(q_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = q @ m.T  # (nq, nb)
        rows = []
        for qi in range(len(qids)):
            s = sims[qi]
            mask = ids != qids[qi] if exclude_self else np.ones(len(ids), bool)
            cand_ids = ids[mask]
            cand_s = s[mask]
            order = np.lexsort((cand_ids, -cand_s))[:k]
            for j in order:
                rows.append((qids[qi], cand_ids[j], float(cand_s[j])))
        return pd.DataFrame(rows, columns=["query_id", "neighbor_id", "cos"])

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.sort_values(
                ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
            )
            .groupby("query_id", sort=True)
            .head(k)
            .sort_values("query_id", kind="mergesort")
        )
        g = g.assign(
            rank=g.groupby("query_id", sort=False).cumcount().to_numpy() + 1
        )
        return g[["query_id", "neighbor_id", "rank"]]

    # ONE coalesced combine (partials are <= n_queries * k rows per block),
    # not a sort-based groupby: with only n_queries distinct keys most sort
    # partitions would be empty (schema-less bundles Ray warns about)
    return partials.repartition(1).map_batches(
        final_topk, batch_format="pandas", batch_size=None
    )


def kmeans_centroids(
    sample: np.ndarray,
    n_lists: int,
    *,
    n_iters: int = 10,
    seed: int = 7,
    init: np.ndarray | None = None,
) -> np.ndarray:
    """Plain Lloyd k-means on a (small, driver-side) training sample —
    the IVF coarse quantizer (standard public construction: Jegou et al.,
    "Product Quantization for Nearest Neighbor Search", IEEE TPAMI 2011,
    coarse-quantizer stage). Deterministic: seeded init (or caller-provided
    ``init`` seeds, e.g. farthest-point from stages/kmeans.py), stable
    argmin."""
    rng = np.random.default_rng(seed)
    sample = _normalize(np.asarray(sample, dtype=np.float64))
    n = len(sample)
    if n < n_lists:
        raise ValueError(f"need >= {n_lists} training vectors, got {n}")
    if init is not None:
        cents = _normalize(np.asarray(init, dtype=np.float64)).copy()
    else:
        cents = sample[rng.choice(n, n_lists, replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(sample @ cents.T, axis=1)  # cosine on unit vectors
        for c in range(n_lists):
            m = assign == c
            if m.any():
                v = sample[m].mean(axis=0)
                nv = np.linalg.norm(v)
                if nv > 0:
                    cents[c] = v / nv
    return cents


def knn_embeddings_ivf(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    train_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """IVF (inverted-file) ANN — the k-means-bucketed scale path.

    Train: a bounded sample (first ``train_size`` rows by id — deterministic)
    fits ``n_lists`` coarse centroids driver-side; centroids broadcast once.
    Index: each row is assigned to its nearest centroid inside
    ``map_batches``; rows whose list is probed by NO query are dropped
    before the exchange (same candidates-only shuffle as the LSH index).
    Query: each query probes its ``n_probe`` nearest lists; each list group
    is scored with one matmul against only the queries probing it.

    Output (query_id, neighbor_id, rank) — same contract as
    ``knn_embeddings`` / ``knn_embeddings_lsh``.
    """
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids)

    # bounded training sample: filter is pushed to the read where possible
    train = (
        ds.filter(expr=f"{id_col} < {int(train_size)}")
        .select_columns([vec_col])
        .to_pandas()
    )
    cents = kmeans_centroids(
        np.stack(train[vec_col].to_numpy()), n_lists, seed=seed
    )
    # query-side probe lists: list id -> query indices probing it
    probe = np.argsort(-(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]
    q_by_list: dict[int, list[int]] = {}
    for qi in range(len(qids)):
        for c in probe[qi]:
            q_by_list.setdefault(int(c), []).append(qi)
    q_by_list = {c: np.array(v) for c, v in q_by_list.items()}
    probed = np.zeros(n_lists, dtype=bool)
    probed[list(q_by_list)] = True
    cents_ref = ray.put((cents, probed))
    idx_ref = ray.put((qm, qids, q_by_list))

    def emit_lists(batch: pa.Table) -> pa.Table:
        cents_, probed_ = ray.get(cents_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(m @ cents_.T, axis=1)
        keep = probed_[assign]
        if not keep.any():
            return pa.table(
                {
                    "list_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        kept = m[keep]
        return pa.table(
            {
                "list_id": pa.array(assign[keep].astype(np.int64)),
                "neighbor_id": pa.array(ids[keep].astype(np.int64)),
                "vec": pa.FixedSizeListArray.from_arrays(
                    pa.array(kept.ravel()), m.shape[1]
                ),
            }
        )

    candidates = ds.map_batches(emit_lists, batch_format="pyarrow")

    def score_list(group: pd.DataFrame) -> pd.DataFrame:
        qm_, qids_, q_by_list_ = ray.get(idx_ref)
        c = int(group["list_id"].iloc[0])
        qidx = q_by_list_[c]
        m = np.stack(group["vec"].to_numpy())
        ids = group["neighbor_id"].to_numpy()
        sims = qm_[qidx] @ m.T
        out = []
        for row, qi in enumerate(qidx):
            s = sims[row]
            mask = ids != qids_[qi]
            cid, cs = ids[mask], s[mask]
            order = np.lexsort((cid, -cs))[:k]
            out.append(
                pd.DataFrame(
                    {"query_id": qids_[qi], "neighbor_id": cid[order], "cos": cs[order]}
                )
            )
        if not out:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
        return pd.concat(out, ignore_index=True)

    partials = candidates.groupby("list_id").map_groups(
        score_list, batch_format="pandas"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates(["query_id", "neighbor_id"]).sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_embeddings_lsh(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_planes: int = 8,
    n_tables: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
    dim: int | None = None,
):
    """Random-hyperplane LSH ANN as a true bucketed index (the scale path).

    Standard multi-table construction: ``n_tables`` independent sets of
    ``n_planes`` hyperplanes; a row is a candidate for a query if their sign
    buckets match in ANY table (OR-amplification of recall). Approximate by
    design — recall tested against the brute-force baseline.

    Index shape, not a masked scan: the map stage hashes each row into its
    per-table buckets and DROPS every row that shares no bucket with any
    query — only candidate rows (with their normalized vectors) enter the
    ``groupby(bucket)`` exchange, and each bucket group is scored with ONE
    matmul against just the queries hashed to that bucket. Work after the
    map is proportional to bucket occupancy x queries-per-bucket, never to
    table size; the shuffle moves only surviving candidates.
    """
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    d = dim or qm.shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_tables, d, n_planes))
    pow2 = 1 << np.arange(n_planes)
    qids = np.asarray(query_ids)
    # bucket key packs (table, signature): key = t << n_planes | sig
    q_sigs = np.stack(
        [((qm @ planes[t]) > 0) @ pow2 for t in range(n_tables)], axis=1
    )
    q_keys = (np.arange(n_tables)[None, :] << n_planes) | q_sigs  # (nq, nt)
    # query-side index: bucket key -> query row indices (small, broadcast)
    q_by_key: dict[int, np.ndarray] = {}
    for t in range(n_tables):
        order = np.argsort(q_keys[:, t], kind="stable")
        keys_sorted = q_keys[order, t]
        starts = np.flatnonzero(np.r_[True, keys_sorted[1:] != keys_sorted[:-1]])
        for s, e in zip(starts, np.r_[starts[1:], len(keys_sorted)]):
            q_by_key.setdefault(int(keys_sorted[s]), []).append(order[s:e])
    q_by_key = {kk: np.concatenate(v) for kk, v in q_by_key.items()}
    wanted = np.array(sorted(q_by_key), dtype=np.int64)
    idx_ref = ray.put((qm, qids, q_by_key))
    planes_ref = ray.put(planes)

    def emit_candidates(batch: pa.Table) -> pa.Table:
        """Hash rows; keep only (row, table) pairs landing in a query bucket."""
        planes_ = ray.get(planes_ref)
        m = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        keys = np.stack(
            [
                (np.int64(t) << n_planes) | (((m @ planes_[t]) > 0) @ pow2)
                for t in range(n_tables)
            ],
            axis=1,
        )  # (nb, nt)
        hit = np.isin(keys, wanted)
        rows, tables = np.nonzero(hit)
        if len(rows) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "vec": pa.array([], pa.list_(pa.float64())),
                }
            )
        flat = m[rows].ravel()
        vecs = pa.FixedSizeListArray.from_arrays(pa.array(flat), m.shape[1])
        return pa.table(
            {
                "bucket": pa.array(keys[rows, tables]),
                "neighbor_id": pa.array(ids[rows].astype(np.int64)),
                "vec": vecs,
            }
        )

    candidates = ds.map_batches(emit_candidates, batch_format="pyarrow")

    def score_bucket(group: pd.DataFrame) -> pd.DataFrame:
        """One matmul: bucket vectors x queries hashed to this bucket."""
        qm_, qids_, q_by_key_ = ray.get(idx_ref)
        key = int(group["bucket"].iloc[0])
        qidx = q_by_key_[key]
        m = np.stack(group["vec"].to_numpy())
        ids = group["neighbor_id"].to_numpy()
        sims = qm_[qidx] @ m.T  # (nq_in_bucket, n_cand)
        out = []
        for row, qi in enumerate(qidx):
            s = sims[row]
            mask = ids != qids_[qi]
            cid, cs = ids[mask], s[mask]
            order = np.lexsort((cid, -cs))[:k]
            out.append(
                pd.DataFrame(
                    {"query_id": qids_[qi], "neighbor_id": cid[order], "cos": cs[order]}
                )
            )
        if not out:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
        return pd.concat(out, ignore_index=True)

    partials = candidates.groupby("bucket").map_groups(
        score_bucket, batch_format="pandas"
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        # a pair can surface via several tables -> dedup before ranking
        g = group.drop_duplicates(["query_id", "neighbor_id"]).sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def standardize_embeddings(ds, *, vec_col: str = "embedding"):
    """Per-dimension z-score standardization of an embedding column.

    Two passes, both distributed: (1) per-block partial (n, sum, sumsq)
    vectors — one tiny row per block — combined on the driver into the
    global per-dim mean/std (a bounded aggregate, never the data); (2) a
    broadcast map rewrites the column as ``(x - mu) / sd``. Whitening like
    this is what makes cosine near-dup discriminative for raw descriptor
    features (e.g. multimodal image features, whose all-positive dims are
    otherwise near-collinear across the corpus).
    """
    import pyarrow as pa

    def partial(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[vec_col])
        d = m.shape[1]
        return pa.table(
            {
                "n": pa.array([float(len(m))]),
                "s": pa.FixedSizeListArray.from_arrays(
                    pa.array(m.sum(axis=0).reshape(-1)), d
                ),
                "ss": pa.FixedSizeListArray.from_arrays(
                    pa.array((m * m).sum(axis=0).reshape(-1)), d
                ),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    n = parts["n"].sum()
    s = np.stack(parts["s"].to_numpy()).sum(axis=0)
    ss = np.stack(parts["ss"].to_numpy()).sum(axis=0)
    mu = s / n
    sd = np.sqrt(np.maximum(ss / n - mu * mu, 0.0)) + 1e-9

    def apply(batch: pa.Table) -> pa.Table:
        m = _as_matrix(batch[vec_col])
        z = ((m - mu) / sd).astype(np.float64)
        col = pa.FixedSizeListArray.from_arrays(pa.array(z.reshape(-1)), z.shape[1])
        return batch.set_column(batch.column_names.index(vec_col), vec_col, col)

    return ds.map_batches(apply, batch_format="pyarrow")


# --- product-quantization (PQ) ANN -------------------------------------------


def pq_codebooks(
    sample: np.ndarray, m: int = 8, ksub: int = 16, *, n_iters: int = 20, seed: int = 7
) -> np.ndarray:
    """Per-subspace Euclidean Lloyd codebooks, shape ``(m, ksub, dsub)``.

    Standard public construction (Jegou et al., "Product Quantization for
    Nearest Neighbor Search", IEEE TPAMI 2011): unit-normalize (cosine =
    inner product downstream), split dims into m subspaces, quantize each
    independently. Deterministic seeded init, stable argmin."""
    X = _normalize(np.asarray(sample, dtype=np.float64))
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    if n < ksub:
        raise ValueError(f"need >= {ksub} training vectors, got {n}")
    dsub = d // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ksub, dsub))
    for s in range(m):
        sub = X[:, s * dsub : (s + 1) * dsub]
        cents = sub[rng.choice(n, ksub, replace=False)].copy()
        for _ in range(n_iters):
            d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(ksub):
                msk = assign == c
                if msk.any():
                    cents[c] = sub[msk].mean(axis=0)
        books[s] = cents
    return books


def pq_encode_matrix(m_norm: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode a normalized (n, d) matrix to (n, m) uint8 codes."""
    mm, ksub, dsub = books.shape
    codes = np.empty((len(m_norm), mm), dtype=np.uint8)
    for s in range(mm):
        sub = m_norm[:, s * dsub : (s + 1) * dsub]
        d2 = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_decode_matrix(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Reconstruct (n, d) float vectors from (n, m) codes (centroid concat)."""
    return np.concatenate(
        [books[s][codes[:, s]] for s in range(books.shape[0])], axis=1
    )


def pq_encode(ds, books: np.ndarray, *, vec_col: str = "embedding", id_col: str = "vec_id"):
    """Index build: compress each embedding to m uint8 codes inside
    ``map_batches`` (here 8 bytes vs 256 bytes of float32-64d = 32x);
    codebooks broadcast once via ``ray.put``. Output
    ``(id, codes: fixed_size_list<uint8>[m])`` — the stored PQ index a
    100-TB deployment scores instead of the raw vectors."""
    import ray

    b_ref = ray.put(np.asarray(books))

    def enc(batch: pa.Table) -> pa.Table:
        b = ray.get(b_ref)
        mn = _normalize(_as_matrix(batch[vec_col]))
        codes = pq_encode_matrix(mn, b)
        return pa.table(
            {
                id_col: batch[id_col],
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1)), codes.shape[1]
                ),
            }
        )

    return ds.map_batches(enc, batch_format="pyarrow")


def knn_embeddings_pq(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    train_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
    exclude_self: bool = True,
):
    """PQ ANN: ADC candidate scoring + exact refine — the memory-scale path
    beside the LSH (bucket-pruned) and IVF (list-pruned) variants.

    Train: bounded deterministic sample (``id < train_size``) fits the
    per-subspace codebooks driver-side (same discipline as
    ``knn_embeddings_ivf``); queries + codebooks + ADC lookup tables
    broadcast once. Per batch: rows encode to uint8 codes, every query
    ADC-scores the codes via its (m x ksub) inner-product LUT (m gathers +
    sums — never a float row matrix), the top ``k*refine`` ADC candidates
    per query are exact-rescored with one small matmul and emitted; the
    final per-query combine is identical to ``knn_embeddings``, so output
    ranks are exact cosine over the ADC-surviving candidate set.

    At scale the ``pq_encode`` codes dataset IS the index (32x smaller than
    the vectors); this operator fuses encode+score in one pass so the
    fixture-scale query needs no stored index. Approximate by design
    (rows-only queries() entry) — recall floor pinned in tests/test_knn.py.
    """
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids)
    train = (
        ds.filter(expr=f"{id_col} < {int(train_size)}")
        .select_columns([vec_col])
        .to_pandas()
    )
    books = pq_codebooks(np.stack(train[vec_col].to_numpy()), m, ksub, seed=seed)
    dsub = qm.shape[1] // m
    # LUT[q, s, c] = q_s . C[s, c]
    lut = np.einsum("qsd,scd->qsc", qm.reshape(len(qm), m, dsub), books)
    ref = ray.put((qm, qids, books, lut))
    n_cand = int(k * refine)

    def partial(batch: pa.Table) -> pd.DataFrame:
        qm_, qids_, books_, lut_ = ray.get(ref)
        mn = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        codes = pq_encode_matrix(mn, books_)
        adc = np.zeros((len(qids_), len(ids)))
        for s in range(codes.shape[1]):
            adc += lut_[:, s, codes[:, s]]
        rows = []
        for qi in range(len(qids_)):
            mask = ids != qids_[qi] if exclude_self else np.ones(len(ids), bool)
            cid, cs = ids[mask], adc[qi][mask]
            order = np.lexsort((cid, -cs))[:n_cand]
            cand = np.flatnonzero(mask)[order]
            exact = mn[cand] @ qm_[qi]
            keep = np.lexsort((ids[cand], -exact))[:k]
            rows.append(
                pd.DataFrame(
                    {
                        "query_id": qids_[qi],
                        "neighbor_id": ids[cand][keep],
                        "cos": exact[keep],
                    }
                )
            )
        if not rows:
            return pd.DataFrame(columns=["query_id", "neighbor_id", "cos"])
        return pd.concat(rows, ignore_index=True)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        g = g.assign(rank=np.arange(1, len(g) + 1))
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def knn_embeddings_ivfpq(
    ds,
    query_matrix: np.ndarray,
    query_ids: np.ndarray,
    *,
    k: int = 3,
    n_lists: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ksub: int = 16,
    refine: int = 4,
    train_size: int = 2048,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 7,
):
    """IVF-PQ ANN — the memory-AND-compute scale rung, composing the IVF
    list pruning of ``knn_embeddings_ivf`` with the PQ/ADC scoring of
    ``knn_embeddings_pq``.

    Train: ONE bounded deterministic sample fits both quantizers (coarse
    centroids + per-subspace codebooks; PQ encodes the raw normalized
    vectors, not residuals — documented simplification, exactness is
    recovered by the refine pass). Index: each row assigns to its nearest
    list inside ``map_batches``; rows in unprobed lists drop BEFORE the
    exchange, and only ``(list_id, id, m uint8 codes)`` ever crosses it —
    the float vectors never shuffle (the memory story: 8 code bytes vs
    512 vector bytes at d=64). Scan: each probed list group ADC-scores its
    probing queries via the broadcast LUT and keeps the per-(query, list)
    top ``k*refine`` candidate ids. Refine: the bounded candidate id set
    (<= nq * n_probe * k * refine) is pulled once and broadcast; the
    dataset streams through one membership map computing EXACT cosine for
    candidate rows only (the ``_verify_pairs_broadcast`` discipline — no
    second shuffle), and a bounded driver combine emits the exact top-k
    per query.

    Exactness pin: with ``n_probe = n_lists`` and ``refine`` covering every
    row, the candidate set is the whole corpus and the output equals
    ``knn_embeddings`` exactly (tests/test_knn.py); at production settings
    it is approximate by design (rows-only queries() entry, recall floor
    pinned).
    """
    import ray

    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qids = np.asarray(query_ids)
    nq = len(qids)

    train = (
        ds.filter(expr=f"{id_col} < {int(train_size)}")
        .select_columns([vec_col])
        .to_pandas()
    )
    X = np.stack(train[vec_col].to_numpy())
    cents = kmeans_centroids(X, n_lists, seed=seed)
    books = pq_codebooks(X, m, ksub, seed=seed)
    dsub = qm.shape[1] // m
    lut = np.einsum("qsd,scd->qsc", qm.reshape(nq, m, dsub), books)

    probe = np.argsort(-(qm @ cents.T), axis=1, kind="stable")[:, :n_probe]
    q_by_list: dict[int, np.ndarray] = {}
    for qi in range(nq):
        for c in probe[qi]:
            q_by_list.setdefault(int(c), []).append(qi)
    q_by_list = {c: np.array(v) for c, v in q_by_list.items()}
    probed = np.zeros(n_lists, dtype=bool)
    probed[list(q_by_list)] = True
    idx_ref = ray.put((cents, probed, books, lut, qids, q_by_list))
    n_cand = int(k * refine)

    def emit_codes(batch: pa.Table) -> pa.Table:
        cents_, probed_, books_, _, _, _ = ray.get(idx_ref)
        mn = _normalize(_as_matrix(batch[vec_col]))
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        assign = np.argmax(mn @ cents_.T, axis=1)
        keep = probed_[assign]
        if not keep.any():
            # empty block must carry the SAME fixed_size_list type as the
            # non-empty blocks — pa.list_ here makes the groupby exchange
            # unable to concatenate blocks (irreconcilable schemas)
            return pa.table(
                {
                    "list_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "codes": pa.array([], pa.list_(pa.uint8(), m)),
                }
            )
        codes = pq_encode_matrix(mn[keep], books_)
        return pa.table(
            {
                "list_id": pa.array(assign[keep].astype(np.int64)),
                "neighbor_id": pa.array(ids[keep].astype(np.int64)),
                "codes": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1)), codes.shape[1]
                ),
            }
        )

    def adc_list(group: pd.DataFrame) -> pd.DataFrame:
        _, _, _, lut_, qids_, q_by_list_ = ray.get(idx_ref)
        c = int(group["list_id"].iloc[0])
        qidx = q_by_list_[c]
        ids = group["neighbor_id"].to_numpy(np.int64)
        codes = np.stack(group["codes"].to_numpy()).astype(np.int64)
        out = []
        for qi in qidx:
            adc = lut_[qi, np.arange(codes.shape[1]), codes].sum(axis=1)
            mask = ids != qids_[qi]
            cid, cs = ids[mask], adc[mask]
            order = np.lexsort((cid, -cs))[:n_cand]
            out.append(pd.DataFrame({"query_idx": qi, "neighbor_id": cid[order]}))
        if not out:
            return pd.DataFrame(columns=["query_idx", "neighbor_id"])
        return pd.concat(out, ignore_index=True)

    cand = (
        ds.map_batches(emit_codes, batch_format="pyarrow")
        .groupby("list_id")
        .map_groups(adc_list, batch_format="pandas")
    )
    from ..sources.fs import to_pandas_cols

    cand_df = to_pandas_cols(cand, {"query_idx": "int64", "neighbor_id": "int64"})
    # bounded: <= nq * n_probe * k * refine candidate pairs
    cand_df = cand_df.drop_duplicates(["query_idx", "neighbor_id"])
    cids = np.sort(cand_df["neighbor_id"].unique()).astype(np.int64)
    by_id: dict[int, np.ndarray] = {
        int(i): g["query_idx"].to_numpy(np.int64)
        for i, g in cand_df.groupby("neighbor_id", sort=False)
    }
    ref2 = ray.put((qm, cids, by_id))

    def exact_scores(batch: pa.Table) -> pd.DataFrame:
        qm_, cids_, by_id_ = ray.get(ref2)
        ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(cids_, ids)
        pos_c = np.minimum(pos, max(len(cids_) - 1, 0))
        hit = (
            np.flatnonzero(cids_[pos_c] == ids)
            if len(cids_)
            else np.array([], np.int64)
        )
        if not len(hit):
            return pd.DataFrame(
                {
                    "query_idx": pd.Series(dtype=np.int64),
                    "neighbor_id": pd.Series(dtype=np.int64),
                    "cos": pd.Series(dtype=np.float64),
                }
            )
        mn = _normalize(_as_matrix(batch[vec_col]))[hit]
        hids = ids[hit]
        frames = []
        for row, nid in enumerate(hids):
            qidx = by_id_[int(nid)]
            cs = qm_[qidx] @ mn[row]
            frames.append(
                pd.DataFrame(
                    {"query_idx": qidx, "neighbor_id": nid, "cos": cs}
                )
            )
        return pd.concat(frames, ignore_index=True)

    scored = ds.map_batches(exact_scores, batch_format="pyarrow")
    sdf = to_pandas_cols(
        scored, {"query_idx": "int64", "neighbor_id": "int64", "cos": "float64"}
    )
    out = []
    for qi, g in sdf.groupby("query_idx", sort=True):
        g = g.sort_values(
            ["cos", "neighbor_id"], ascending=[False, True], kind="mergesort"
        ).head(k)
        out.append(
            pd.DataFrame(
                {
                    "query_id": np.full(len(g), qids[qi], dtype=np.int64),
                    "neighbor_id": g["neighbor_id"].to_numpy(np.int64),
                    "rank": np.arange(1, len(g) + 1, dtype=np.int64),
                }
            )
        )
    if not out:
        return pd.DataFrame(
            {
                "query_id": pd.Series(dtype=np.int64),
                "neighbor_id": pd.Series(dtype=np.int64),
                "rank": pd.Series(dtype=np.int64),
            }
        )
    return pd.concat(out, ignore_index=True).reset_index(drop=True)
