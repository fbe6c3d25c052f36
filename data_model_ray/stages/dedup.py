"""Exact deduplication — the D-group of SURVEY.md 2.7.

The reference's one true dedup is GCP exact-dedup-with-merge on (line, pixel)
(/root/reference/src/eopf_geozarr/conversion/utils.py:261-298); ours is
Common-Crawl-style exact URL dedup with latest-``warc_ts``-wins.

Two interchangeable strategies (same deterministic output; chosen by
``mode``):

- ``"shuffle"`` — the cluster-canonical path and the DEFAULT. Local
  pre-dedup inside ``map_batches`` (combiner; drops intra-batch dups), then
  ``groupby(hash(key) % B).map_groups`` — exactly B vectorized pandas
  calls. B sizes to cluster cores; key-hash bucketing is uniform
  regardless of url skew (skew lives in hosts, not full urls). The
  all-to-all exchange is unavoidable for exact key co-location at
  10^12-row scale (the index must be disk-backed/partitioned).

- ``"index"`` — the shared-mutable-index path (task-brief custom-operator
  ladder (c): raw actors where the Dataset API can't express the
  semantics). After local pre-dedup, each batch pushes a NARROW sidecar
  (128-bit key hash + order + row-content tiebreak hash) into a pool of
  hash-routed index actors; only keys observed more than once become a
  small broadcast winners table, and a second pass filters losers. No
  large-row shuffle at all — measured ~10x faster than the single-node Ray
  sort shuffle at 5M rows, but the winners table is bounded by the number
  of DUPLICATED keys, so it is the single-node / low-dup-rate fast path,
  not the cluster default. Ingestion is fully vectorized (lexsort +
  reduceat compaction, no per-row Python) and idempotent under Ray task
  retries (the winner is a max — re-ingestion never changes it; it can
  only mark a lone key as "duplicated", which is harmless since its one
  row is its own winner). The index is keyed on the full 128-bit
  ``(h1, h2)`` pair, so the ~1e-26 collision bound at 10^12 keys holds.

Deterministic winner per key: max ``(order_col..., row_content_hash)`` —
the content hash (polars ``hash_rows`` over the full row) breaks ties
between rows sharing ``(key, order)``, so both modes keep exactly one row
per key and agree under any partitioning/retry (byte-identical-resume
requirement, BASELINE.json). Known limit: two bytewise-identical rows tie
on the content hash too; shuffle mode still keeps exactly one (positional
drop), index mode keeps both only if they also land in different batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_BUCKETS = 64

_PAIR_DT = np.dtype([("h1", "<u8"), ("h2", "<u8")])
_TB_COL = "__tb"


def _canon_frame(obj):
    """Canonical polars frame for row hashing: the same logical rows hash
    identically whether the block arrived as pandas (datetime64[ns]) or
    Arrow (timestamp[us]) — temporal columns are normalized to int64
    nanoseconds before hashing."""
    import polars as pl

    d = pl.from_arrow(obj) if isinstance(obj, pa.Table) else pl.from_pandas(obj)
    casts = [
        pl.col(c).dt.timestamp("ns").alias(c)
        for c, dt in d.schema.items()
        if isinstance(dt, pl.Datetime)
    ]
    return d.with_columns(casts) if casts else d


def _row_tiebreak(frame) -> np.ndarray:
    """uint64 content hash of every full row (vectorized, batch-invariant).

    polars ``hash_rows`` hashes row content only, so the same row hashes
    identically in any batch/partition — the distribution-safe tiebreak.
    Accepts a pandas DataFrame or an Arrow Table (hashes agree across the
    two block formats; pinned by tests/test_dedup_modes.py).
    """
    return _canon_frame(frame).hash_rows(seed=23).to_numpy().astype(np.uint64)


def _local_latest(
    df: pd.DataFrame, key: str, order_cols: list[str]
) -> pd.DataFrame:
    """Keep the max-(order, tiebreak) row per key within one frame.

    Requires the ``__tb`` tiebreak column to be present; mergesort is
    stable, so after sorting by (key, order..., tb) keep="last" is the
    deterministic winner under any input order.
    """
    df = df.sort_values([key, *order_cols, _TB_COL], kind="mergesort")
    return df[~df.duplicated(subset=[key], keep="last")]


def _last_per_key_arrow(t: pa.Table, key: str, sort_keys) -> pa.Table:
    """Arrow-native max-(order, tiebreak) per key: one sort + one adjacent
    compare — no pandas round-trip of the (string-heavy) block. The __tb
    column is part of ``sort_keys``, so every row has a unique total order
    and sort stability is irrelevant to the output."""
    import pyarrow.compute as pc

    if t.num_rows <= 1:
        return t
    st = t.sort_by(sort_keys)
    k = st[key].combine_chunks()
    n = len(k)
    # last-of-each-key mask; dictionary codes make null keys compare equal
    # to each other (pandas duplicated() semantics)
    codes = pc.fill_null(k.dictionary_encode().indices, -1)
    c = codes.to_numpy(zero_copy_only=False)
    mask = np.empty(n, dtype=bool)
    mask[-1] = True
    np.not_equal(c[1:], c[:-1], out=mask[:-1])
    return st.filter(pa.array(mask))


def _key_bucket(k: pa.ChunkedArray | pa.Array, num_buckets: int) -> np.ndarray:
    """Deterministic int32 bucket per key (polars hash — no pandas)."""
    import polars as pl

    h = pl.from_arrow(k).hash(seed=41).to_numpy().astype(np.uint64)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def dedup_exact(
    ds,
    *,
    key: str = "url",
    order_col: str | list[str] = "warc_ts",
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Latest-wins exact dedup of a Ray Dataset on `key` (shuffle mode).

    The kept row is the max of `order_col` (a column name or list of names,
    compared lexicographically; ties broken by the row content hash) —
    multi-column ordering avoids packing compound keys into one integer
    (overflow-prone). Both exchange kernels are Arrow-native (sort_by +
    adjacent-compare): string-heavy web blocks never round-trip through
    pandas, and every block keeps a hashable (metadata-free) schema for
    Ray's shuffle-side schema dedup.
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    sort_keys = [(c, "ascending") for c in (key, *order_cols, _TB_COL)]

    def local(batch: pa.Table) -> pa.Table:
        # local pre-dedup + bucket assignment in one kernel (fewer operator
        # boundaries = less block churn)
        t = batch.append_column(
            _TB_COL, pa.array(_row_tiebreak(batch), pa.uint64())
        )
        out = _last_per_key_arrow(t, key, sort_keys)
        return out.append_column(
            "__bucket", pa.array(_key_bucket(out[key], num_buckets))
        )

    def dedup_bucket(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return group  # map_groups can emit schema-less empty blocks
        return _last_per_key_arrow(group, key, sort_keys).drop_columns(
            ["__bucket", _TB_COL]
        )

    return (
        ds.map_batches(local, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pyarrow")
    )


def _compact(
    h1: np.ndarray,
    h2: np.ndarray,
    order: np.ndarray,
    tb: np.ndarray,
    count: np.ndarray,
) -> tuple[np.ndarray, ...]:
    """Reduce sidecar rows to one row per (h1, h2): max (order, tb) + count.

    Pure vectorized lexsort + reduceat — no per-row Python (the index-actor
    hot path).
    """
    # ascending sort by (h1, h2, order, tb): the LAST row of each (h1, h2)
    # group is the max-(order, tb) winner
    idx = np.lexsort((tb, order, h2, h1))
    h1, h2, order, tb, count = (
        h1[idx], h2[idx], order[idx], tb[idx], count[idx]
    )
    new_grp = np.ones(len(h1), dtype=bool)
    if len(h1) > 1:
        new_grp[1:] = (h1[1:] != h1[:-1]) | (h2[1:] != h2[:-1])
    starts = np.flatnonzero(new_grp)
    last = np.concatenate([starts[1:], [len(h1)]]) - 1
    counts = np.add.reduceat(count, starts)
    return h1[last], h2[last], order[last], tb[last], counts


def _make_index_actor():
    import ray

    # num_cpus=0: the index actors are lightweight state holders and must
    # always be schedulable — map tasks block on ingest acks while holding
    # their CPUs, so CPU-reserving actors would deadlock a full cluster
    @ray.remote(num_cpus=0)
    class _DedupIndexActor:
        """Max-(order, tb) + occurrence count per 128-bit key, one route.

        State is columnar numpy (compacted); ingested batches buffer and
        compact vectorized once the pending pile exceeds a threshold.
        """

        _COMPACT_AT = 1 << 20  # pending sidecar rows before a compaction

        def __init__(self):
            z8 = np.array([], dtype=np.uint64)
            zi = np.array([], dtype=np.int64)
            self.state = (z8, z8, zi, z8, zi)  # h1, h2, order, tb, count
            self.pending: list[tuple[np.ndarray, ...]] = []
            self.pending_rows = 0

        def _flush(self) -> None:
            if not self.pending:
                return
            sh1, sh2, sor, stb, scn = self.state
            h1 = np.concatenate([sh1] + [p[0] for p in self.pending])
            h2 = np.concatenate([sh2] + [p[1] for p in self.pending])
            order = np.concatenate([sor] + [p[2] for p in self.pending])
            tb = np.concatenate([stb] + [p[3] for p in self.pending])
            count = np.concatenate(
                [scn] + [np.ones(len(p[0]), dtype=np.int64) for p in self.pending]
            )
            self.state = _compact(h1, h2, order, tb, count)
            self.pending = []
            self.pending_rows = 0

        def ingest(
            self,
            h1: np.ndarray,
            h2: np.ndarray,
            order: np.ndarray,
            tb: np.ndarray,
        ) -> int:
            self.pending.append((h1, h2, order, tb))
            self.pending_rows += len(h1)
            if self.pending_rows >= self._COMPACT_AT:
                self._flush()
            return len(h1)

        def dup_winners(self) -> tuple[np.ndarray, ...]:
            """(h1, h2, order, tb) arrays for keys seen more than once."""
            self._flush()
            h1, h2, order, tb, count = self.state
            m = count > 1
            return h1[m], h2[m], order[m], tb[m]

    return _DedupIndexActor


def _key_hashes(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes (128-bit combined) per key."""
    import polars as pl

    s = pl.from_pandas(values.astype(str))
    return (
        s.hash(seed=11).to_numpy().astype(np.uint64),
        s.hash(seed=97).to_numpy().astype(np.uint64),
    )


def dedup_exact_index(
    ds,
    *,
    key: str = "url",
    order_col: str = "warc_ts",
    num_actors: int = 16,
):
    """Index-mode exact dedup (see module docstring). `order_col` must be a
    single orderable column (timestamps are compared as int64 micros)."""
    import ray

    actor_cls = _make_index_actor()
    actors = [actor_cls.remote() for _ in range(num_actors)]

    def order_as_int(col: pd.Series) -> np.ndarray:
        if str(col.dtype).startswith("datetime"):
            return col.astype("int64").to_numpy()
        return col.to_numpy().astype(np.int64)

    def local_and_ingest(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.assign(**{_TB_COL: _row_tiebreak(batch)})
        out = _local_latest(batch, key, [order_col])
        h1, h2 = _key_hashes(out[key])
        order = order_as_int(out[order_col])
        tb = out[_TB_COL].to_numpy().astype(np.uint64)
        route = h1 % num_actors
        futures = []
        for r in np.unique(route):
            m = route == r
            futures.append(
                actors[int(r)].ingest.remote(h1[m], h2[m], order[m], tb[m])
            )
        ray.get(futures)
        return out.drop(columns=[_TB_COL])

    # pass 0 must COMPLETE before winners are read -> materialize
    local = ds.map_batches(local_and_ingest, batch_format="pandas").materialize()

    parts = [np.array([], dtype=np.uint64)] * 2 + [
        np.array([], dtype=np.int64),
        np.array([], dtype=np.uint64),
    ]
    got = ray.get([a.dup_winners.remote() for a in actors])
    w_h1 = np.concatenate([parts[0]] + [g[0] for g in got])
    w_h2 = np.concatenate([parts[1]] + [g[1] for g in got])
    w_order = np.concatenate([parts[2]] + [g[2] for g in got])
    w_tb = np.concatenate([parts[3]] + [g[3] for g in got])
    # sorted structured (h1, h2) keys for vectorized 128-bit membership
    w_keys = np.empty(len(w_h1), dtype=_PAIR_DT)
    w_keys["h1"] = w_h1
    w_keys["h2"] = w_h2
    sort_idx = np.argsort(w_keys, kind="stable")
    winners_ref = ray.put(
        (w_keys[sort_idx], w_order[sort_idx], w_tb[sort_idx])
    )

    def drop_losers(batch: pd.DataFrame) -> pd.DataFrame:
        keys, worder, wtb = ray.get(winners_ref)
        if len(keys) == 0 or len(batch) == 0:
            return batch
        h1, h2 = _key_hashes(batch[key])
        order = order_as_int(batch[order_col])
        tb = _row_tiebreak(batch).astype(np.uint64)
        probe = np.empty(len(batch), dtype=_PAIR_DT)
        probe["h1"] = h1
        probe["h2"] = h2
        idx = np.searchsorted(keys, probe)
        idx_c = np.minimum(idx, len(keys) - 1)
        is_dup = keys[idx_c] == probe
        is_winner = (worder[idx_c] == order) & (wtb[idx_c] == tb)
        return batch[~is_dup | is_winner]

    return local.map_batches(drop_losers, batch_format="pandas")


def duplicate_stats(ds, *, key: str = "url"):
    """(n_rows, n_distinct_keys) — driver-side audit of dedup effect."""
    import pyarrow.compute as pc

    def partial(batch: pa.Table) -> pa.Table:
        keys = batch[key]
        return pa.table(
            {
                "rows": pa.array([len(batch)], type=pa.int64()),
                "keys": pa.array(
                    [pc.count_distinct(keys).as_py()], type=pa.int64()
                ),
            }
        )

    # distinct-per-batch over-counts cross-batch dups; exact distinct needs
    # the dedup shuffle itself — this is the cheap partial-audit variant.
    agg = ds.map_batches(partial, batch_format="pyarrow").sum(["rows", "keys"])
    return agg["sum(rows)"], agg["sum(keys)"]
