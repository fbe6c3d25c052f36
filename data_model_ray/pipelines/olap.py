"""Third batch of oracle-checked operators: window functions, grouping
sets, distinct aggregates, sampling, and nested-array analytics.

Every entry is a ``queries()`` entry with DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` (column names match the SQL aliases exactly):

- ``distinct_users_per_type`` — exact distributed COUNT(DISTINCT): local
  pair-dedup per batch, one hash exchange of distinct pairs, bounded count.
- ``pivot_status_priority``  — pivot/crosstab via per-batch partial
  crosstabs + one-task combine (rows x cols bounded by the dimensions).
- ``dense_rank_orders``      — DENSE_RANK per partition (groupby +
  vectorized in-group rank).
- ``ntile_orders``           — global NTILE via range-partitioned global
  ranking: a cheap counting pre-pass fixes per-range offsets, one
  range-shuffle assigns exact global positions (the scale-correct global
  sort-rank machinery — no driver-side sort of the fact table).
- ``lead_event_ts``          — LEAD window (forward peek), mirror of the
  lag/prev operator.
- ``first_last_user_value``  — FIRST_VALUE / LAST_VALUE per key over the
  (ts, event_id) order, one exchange.
- ``cube_status_flag``       — GROUP BY CUBE derived algebraically from
  the finest grouping set (one fact-table exchange for all 4 sets).
- ``stratified_sample_docs`` — deterministic stratified sampling: exact
  n-per-stratum by Knuth-hash order (reproducible, engine-independent).
- ``string_agg_nations``     — ordered STRING_AGG per group.
- ``embedding_dim_stats``    — per-dimension moments over a list<float>
  column (nested-array analytics; vectorized column-stack partials).

Scale notes: every operator's exchange is either dimension-bounded
(pivot, cube, string_agg, dim_stats partials) or moves pre-deduped /
pre-ranked rows (distinct pairs, per-range rows). ``ntile_orders`` is the
one inherently global-order operator; its shuffle is a single range
exchange with skew bounded by the range histogram of the pre-pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .relational import _read, _round_col, keyed_window_exchange

KNUTH = np.uint64(2654435761)
U32 = np.uint64(0xFFFFFFFF)


# --- exact distributed COUNT(DISTINCT) --------------------------------------


def distinct_users_per_type(sf_dir: str, num_buckets: int = 64):
    """COUNT(DISTINCT user_id) per event_type. Per-batch local pair dedup
    (only unique (type, user) pairs cross the wire), hash exchange on the
    user bucket (all copies of a pair collide), per-bucket global dedup +
    per-type partial counts, one-task final sum (|types| rows)."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])

    def local(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop_duplicates()
        b = (out["user_id"].to_numpy(np.uint64) * KNUTH) & U32
        return out.assign(bucket=(b % np.uint64(num_buckets)).astype(np.int32))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        uniq = g.drop_duplicates(["event_type", "user_id"])
        return (
            uniq.groupby("event_type", sort=False)
            .size()
            .reset_index(name="n_users")
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", sort=False)["n_users"].sum().reset_index()
        return out.astype({"n_users": np.int64})

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


# --- pivot / crosstab --------------------------------------------------------

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIORITY_ALIAS = {
    "1-URGENT": "p_urgent",
    "2-HIGH": "p_high",
    "3-MEDIUM": "p_medium",
    "4-NOT SPECIFIED": "p_notspec",
    "5-LOW": "p_low",
}


def pivot_status_priority(sf_dir: str):
    """Pivot: order counts by status (rows) x priority (columns). Each
    batch contributes a partial crosstab (|status| x |priority| ints);
    the combine is one task over the bounded partials."""
    ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        ct = (
            df.groupby(["o_orderstatus", "o_orderpriority"], sort=False)
            .size()
            .unstack(fill_value=0)
        )
        ct = ct.reindex(columns=_PRIORITIES, fill_value=0)
        ct.columns = [_PRIORITY_ALIAS[c] for c in ct.columns]
        return ct.reset_index()

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("o_orderstatus", sort=False).sum().reset_index()
        for c in _PRIORITY_ALIAS.values():
            out[c] = out[c].astype(np.int64)
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


# --- DENSE_RANK per partition ------------------------------------------------


def dense_rank_orders(sf_dir: str):
    """DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice
    DESC) — one BUCKETED hash exchange on the partition key (the repo's
    bucketed-exchange rule: raw-key map_groups costs one UDF call per
    customer), then one vectorized grouped rank per bucket."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("o_custkey", sort=False)["o_totalprice"].rank(
            method="dense", ascending=False
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "drank": r.to_numpy(np.int64),
            }
        )

    return keyed_window_exchange(ds, "o_custkey", per_bucket)


# --- UNPIVOT / melt -------------------------------------------------------------


def unpivot_lineitem(sf_dir: str):
    """UNPIVOT (melt) the lineitem measures into (key, measure, value)
    rows — the inverse of ``pivot_status_priority``. Pure per-batch
    flat-map (rows out = 3x rows in, no shuffle, no state): one Arrow
    concat of the three measure slices per block."""
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    ds = _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", *cols])

    def melt(t: pa.Table) -> pa.Table:
        n = t.num_rows
        keys = t["l_orderkey"].cast(pa.int64())
        lines = t["l_linenumber"].cast(pa.int64())
        return pa.table(
            {
                "l_orderkey": pa.concat_arrays(
                    [keys.combine_chunks()] * len(cols)
                ),
                "l_linenumber": pa.concat_arrays(
                    [lines.combine_chunks()] * len(cols)
                ),
                "measure": pa.array(np.repeat(cols, n), pa.string()),
                "value": pa.concat_arrays(
                    [t[c].cast(pa.float64()).combine_chunks() for c in cols]
                ),
            }
        )

    return ds.map_batches(melt, batch_format="pyarrow")


# --- RANK (with gaps) per partition -------------------------------------------


def rank_orders(sf_dir: str):
    """RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) —
    rank WITH gaps (ties share a rank, the next rank skips), the
    complement of dense_rank_orders. One hash exchange on the partition
    key (bucketed — the bucketed-exchange rule); the in-bucket rank is one
    vectorized grouped min-rank (rank WITH gaps = min rank of the tie
    class, i.e. 1 + #rows strictly greater in descending order)."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        r = g.groupby("o_custkey", sort=False)["o_totalprice"].rank(
            method="min", ascending=False
        )
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "rnk": r.to_numpy(np.int64),
            }
        )

    return keyed_window_exchange(ds, "o_custkey", per_bucket)


# --- ROWS-frame moving average -------------------------------------------------


def moving_avg_events(sf_dir: str, k: int = 3):
    """AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS
    BETWEEN k PRECEDING AND CURRENT ROW) — the row-count window frame
    (complements the RANGE frame of ``relational.sliding_window_sum``).
    One BUCKETED exchange on the partition key; per bucket: one stable
    sort by (user, ts, event_id), then the frame sum is computed for ALL
    users at once — ``lo`` is clamped to each user's segment start, so
    the constant-offset slice trick stays fully vectorized across group
    boundaries (k adds total, regardless of user count)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        v = g["value"].to_numpy(np.float64)
        n = len(v)
        idx = np.arange(n)
        new = np.r_[True, uid[1:] != uid[:-1]] if n else np.zeros(0, bool)
        starts = np.flatnonzero(new)
        seg_start = starts[np.cumsum(new) - 1] if n else idx
        lo = np.maximum(idx - k, seg_start)
        cnt = idx - lo + 1
        # sum the <=(k+1)-row frame DIRECTLY, left-to-right (v[lo], then
        # v[lo+1], ...) — the association DuckDB's frame aggregate uses.
        # Prefix-sum differencing carries ~1 ulp of the running-total
        # magnitude and can flip a 6dp midpoint against the oracle.
        acc = v[lo].copy()
        for j in range(1, k + 1):
            sel = lo + j <= idx
            acc[sel] = acc[sel] + v[lo[sel] + j]
        avg = acc / cnt
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "mov_avg": pc.round(pa.array(avg), **rnd).to_numpy(),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- PERCENT_RANK / CUME_DIST per partition ----------------------------------


def percent_rank_orders(sf_dir: str):
    """PERCENT_RANK() and CUME_DIST() OVER (PARTITION BY o_orderpriority
    ORDER BY o_totalprice) — one hash exchange on the partition key, then
    both rank normalizations fall out of two vectorized searchsorted
    passes per group (rank-with-ties=min for percent_rank, rows<=v for
    cume_dist); no per-row Python."""
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def per_pri(g: pd.DataFrame) -> pd.DataFrame:
        v = g["o_totalprice"].to_numpy(np.float64)
        n = len(v)
        sv = np.sort(v, kind="mergesort")
        rank_min = np.searchsorted(sv, v, side="left") + 1
        le = np.searchsorted(sv, v, side="right")
        pr = (rank_min - 1) / (n - 1) if n > 1 else np.zeros(n)
        cd = le / n
        # round half-away-from-zero (DuckDB ROUND semantics) — np.round is
        # half-even and can flip exact midpoints like (rank-1)/(n-1).
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "pr": pc.round(pa.array(pr), **rnd).to_numpy(),
                "cd": pc.round(pa.array(cd), **rnd).to_numpy(),
            }
        )

    return ds.groupby("o_orderpriority").map_groups(per_pri, batch_format="pandas")


# --- deterministic per-group arg-max ------------------------------------------


def argmax_order_per_priority(sf_dir: str):
    """Per-priority arg-max: the order carrying the max o_totalprice
    (ties broken by max o_orderkey — deterministic, unlike SQL MAX_BY).
    Per-batch argmax partials (<=5 rows each) + one bounded combine — the
    fact table never shuffles."""
    ds = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority", "o_totalprice"]
    )

    def top1(df: pd.DataFrame) -> pd.DataFrame:
        s = df.sort_values(
            ["o_orderpriority", "o_totalprice", "o_orderkey"], kind="mergesort"
        )
        return s.groupby("o_orderpriority", sort=False).tail(1)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_orderpriority": df["o_orderpriority"],
                "best_key": df["o_orderkey"].to_numpy(np.int64),
                "max_price": df["o_totalprice"].to_numpy(np.float64),
            }
        )

    return (
        ds.map_batches(top1, batch_format="pandas")
        .repartition(1)
        .map_batches(top1, batch_format="pandas", batch_size=None)
        .map_batches(rename, batch_format="pandas")
    )


# --- global NTILE via range-partitioned ranking ------------------------------


def ntile_orders(sf_dir: str, k: int = 4, num_ranges: int = 32):
    """NTILE(k) OVER (ORDER BY o_totalprice, o_orderkey) without a
    driver-side sort: (1) cheap counting pre-pass bins prices into
    equi-width ranges and fixes each range's global offset; (2) one range
    exchange sorts within each range and assigns exact global positions
    (offset + local index); the position -> tile map is the standard
    NTILE split (first n%k tiles one row bigger)."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    # pass 0: global min/max + per-range counts (ints only cross the wire)
    def count_partial(t: pa.Table) -> pd.DataFrame:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pd.DataFrame({"mn": [p.min()], "mx": [p.max()], "n": [len(p)]})

    from ..sources.fs import to_pandas_cols

    mm = to_pandas_cols(
        ds.map_batches(count_partial, batch_format="pyarrow"),
        {"mn": "float64", "mx": "float64", "n": "int64"},
    )
    n_total = int(mm["n"].sum())
    if n_total == 0:
        return pd.DataFrame(
            {"o_orderkey": pd.Series(dtype="int64"), "tile": pd.Series(dtype="int64")}
        )
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    width = (mx - mn) or 1.0

    def range_of(p: np.ndarray) -> np.ndarray:
        r = np.floor((p - mn) / width * num_ranges).astype(np.int64)
        return np.clip(r, 0, num_ranges - 1)

    def hist_partial(t: pa.Table) -> pd.DataFrame:
        r = range_of(t["o_totalprice"].to_numpy(zero_copy_only=False))
        cnt = np.bincount(r, minlength=num_ranges)
        return pd.DataFrame({"r": np.arange(num_ranges, dtype=np.int64), "c": cnt})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow")
        .to_pandas()
        .groupby("r")["c"]
        .sum()
        .reindex(range(num_ranges), fill_value=0)
        .to_numpy(np.int64)
    )
    offsets = np.zeros(num_ranges, dtype=np.int64)
    offsets[1:] = np.cumsum(hist)[:-1]
    off_ref = ray.put(offsets)

    # NTILE position -> 1-based tile: first (n % k) tiles have ceil(n/k) rows
    small, rem = divmod(n_total, k)
    big = small + 1
    cut = rem * big

    def assign_range(t: pa.Table) -> pd.DataFrame:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "o_orderkey": t["o_orderkey"].to_numpy(zero_copy_only=False),
                "o_totalprice": p,
                "rng": range_of(p),
            }
        )

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        pos = offs[int(g["rng"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        tile = np.where(
            pos < cut, pos // big, rem + (pos - cut) // max(small, 1)
        ).astype(np.int64) + 1
        return pd.DataFrame(
            {"o_orderkey": g["o_orderkey"].to_numpy(np.int64), "tile": tile}
        )

    return (
        ds.map_batches(assign_range, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(rank_range, batch_format="pandas")
    )


# --- LEAD window -------------------------------------------------------------


def lead_event_ts(sf_dir: str):
    """LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) — the
    forward-looking mirror of the lag operator; one BUCKETED hash exchange
    (bucketed-exchange rule), per bucket a single stable sort + one
    vectorized grouped shift(-1) for all users at once."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        nxt = g.groupby("user_id", sort=False)["ts"].shift(-1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "next_ts": nxt.to_numpy(),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- FIRST_VALUE / LAST_VALUE ------------------------------------------------


def first_last_user_value(sf_dir: str):
    """Per-user FIRST_VALUE and LAST_VALUE of ``value`` over the
    (ts, event_id) order — one BUCKETED exchange (bucketed-exchange
    rule), one output row per key; per bucket a single stable sort + one
    vectorized grouped first/last aggregate."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        a = (
            g.groupby("user_id", sort=False)["value"]
            .agg(first_val="first", last_val="last")
            .reset_index()
        )
        return pd.DataFrame(
            {
                "user_id": a["user_id"].to_numpy(np.int64),
                "first_val": a["first_val"].to_numpy(np.float64),
                "last_val": a["last_val"].to_numpy(np.float64),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- GROUP BY CUBE -----------------------------------------------------------


def cube_status_flag(sf_dir: str):
    """GROUP BY CUBE(l_returnflag, l_linestatus): the finest grouping set
    is one distributed partial+final exchange; the other three sets are
    derived algebraically from the bounded finest table (same machinery
    as ROLLUP, plus the transposed single-key set)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_linestatus", "l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False)["l_quantity"]
        return g.agg(s="sum", n="size").reset_index()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["l_returnflag", "l_linestatus"], sort=False)
        return g.agg(s=("s", "sum"), n=("n", "sum")).reset_index()

    finest = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pandas")
    ).to_pandas()  # bounded: one row per (flag, status)
    if "l_returnflag" not in finest.columns:  # empty fact table
        finest = pd.DataFrame(
            {
                "l_returnflag": pd.Series(dtype=object),
                "l_linestatus": pd.Series(dtype=object),
                "s": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64"),
            }
        )

    by_flag = (
        finest.groupby("l_returnflag", sort=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    by_flag["l_linestatus"] = None
    by_status = (
        finest.groupby("l_linestatus", sort=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    by_status["l_returnflag"] = None
    total = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "s": [finest["s"].sum()],
            "n": [finest["n"].sum()],
        }
    )
    out = pd.concat([finest, by_flag, by_status, total], ignore_index=True)
    out = out.rename(columns={"s": "sum_qty", "n": "n_items"})
    return _round_col(out, ["sum_qty"], nd=6)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n_items"]
    ]


# --- deterministic stratified sampling ---------------------------------------


def stratified_sample_docs(sf_dir: str, per_stratum: int = 20):
    """Exact n-per-stratum sample of documents, strata = lang, sampled in
    Knuth-multiplicative-hash order of doc_id (deterministic and
    engine-independent — the distributed analogue of ORDER BY
    hash(id) LIMIT n per group). Per-block top-n partial bounds the
    exchange to n rows per stratum per block."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang"])

    def local_topn(df: pd.DataFrame) -> pd.DataFrame:
        h = ((df["doc_id"].to_numpy(np.uint64) * KNUTH) & U32).astype(np.int64)
        df = df.assign(h=h)
        df = df.sort_values(["h", "doc_id"], kind="mergesort")
        return df.groupby("lang", sort=False).head(per_stratum)

    def final_topn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort").head(per_stratum)
        return g[["doc_id", "lang"]]

    return (
        ds.map_batches(local_topn, batch_format="pandas")
        .groupby("lang")
        .map_groups(final_topn, batch_format="pandas")
    )


# --- ordered STRING_AGG ------------------------------------------------------


def string_agg_nations(sf_dir: str):
    """Per-region comma-joined nation names in name order (ordered
    string aggregation over the broadcast-small dimension tables)."""
    nation = _read(sf_dir, "nation", ["n_name", "n_regionkey"])
    from ..sources.fs import to_pandas_cols

    region = to_pandas_cols(
        _read(sf_dir, "region", ["r_regionkey", "r_name"]),
        {"r_regionkey": "int64", "r_name": "object"},
    )
    rmap = dict(zip(region["r_regionkey"], region["r_name"]))

    def agg(g: pd.DataFrame) -> pd.DataFrame:
        names = ",".join(sorted(g["n_name"]))
        return pd.DataFrame(
            {
                "r_name": [rmap[int(g["n_regionkey"].iloc[0])]],
                "nations": [names],
            }
        )

    return nation.groupby("n_regionkey").map_groups(agg, batch_format="pandas")


# --- nested-array (list<float>) per-dimension stats --------------------------


def embedding_dim_stats(sf_dir: str):
    """Per-dimension count/min/max/mean over the embedding list column —
    nested-array analytics. Each batch stacks the list column into a
    (rows, dims) float matrix and emits one bounded partial (dims rows of
    n/s/mn/mx); the combine is one task."""
    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(t: pa.Table) -> pd.DataFrame:
        col = t["embedding"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        la = col
        dims = np.diff(np.asarray(la.offsets))[0] if len(la) else 0
        m = np.asarray(la.values, dtype=np.float64).reshape(len(la), dims)
        return pd.DataFrame(
            {
                "dim": np.arange(1, dims + 1, dtype=np.int64),
                "n": np.full(dims, len(la), dtype=np.int64),
                "s": m.sum(axis=0),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("dim", sort=False)
        out = g.agg(
            n=("n", "sum"), s=("s", "sum"), mn=("mn", "min"), mx=("mx", "max")
        ).reset_index()
        return pd.DataFrame(
            {
                "dim": out["dim"].to_numpy(np.int64),
                "n": out["n"].to_numpy(np.int64),
                "mean_v": np.round(out["s"].to_numpy() / out["n"].to_numpy(), 6),
                "min_v": np.round(out["mn"].to_numpy(), 6),
                "max_v": np.round(out["mx"].to_numpy(), 6),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pandas", batch_size=None)
    )


def p95_value_by_type(sf_dir: str, q: float = 0.95):
    """Exact interpolated per-group percentile (PERCENTILE_CONT / DuckDB
    ``quantile_cont``): p95 of ``value`` per ``event_type``.

    The group key is low-cardinality (event types), so one key exchange
    co-locates each type and an in-group vectorized sort computes the
    order statistic exactly; interpolation is DuckDB's own
    ``lo*(1-frac) + hi*frac`` form (measured — ``lo + (hi-lo)*frac``
    differs in the last ulp), rounded 6dp half-away. Scale note: a
    HIGH-cardinality exact percentile goes through the distributed
    order-statistics machinery (`analytic.quantile_cont_prices`) or the
    KLL sketch (`approx_quantiles`) — this operator is the co-located
    exact rung, its per-group memory bounded by the largest group.
    """
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def per_type(df: pd.DataFrame) -> pd.DataFrame:
        out_rows = []
        for et, g in df.groupby("event_type", sort=False):
            v = np.sort(g["value"].to_numpy(np.float64), kind="mergesort")
            n = len(v)
            idx = (n - 1) * q
            lo = int(np.floor(idx))
            frac = idx - lo
            hi = min(lo + 1, n - 1)
            out_rows.append((et, v[lo] * (1 - frac) + v[hi] * frac))
        out = pd.DataFrame(out_rows, columns=["event_type", "p95"])
        out["p95"] = pc.round(
            pa.array(out["p95"].to_numpy(np.float64)),
            ndigits=6,
            round_mode="half_towards_infinity",
        ).to_numpy(zero_copy_only=False)
        return out

    return ds.groupby("event_type").map_groups(per_type, batch_format="pandas")


# --- cumulative COUNT(DISTINCT) per partition ---------------------------------


def running_distinct_types(sf_dir: str):
    """Per-user cumulative count of DISTINCT event types over the
    (ts, event_id) order — the windowed COUNT(DISTINCT) (expressed in SQL
    as a first-occurrence flag summed over an UNBOUNDED PRECEDING frame).
    One BUCKETED exchange (bucketed-exchange rule); per bucket one stable
    sort + one vectorized duplicated()-flag + grouped cumsum over every
    user at once."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = (~g.duplicated(["user_id", "event_type"])).astype(np.int64)
        run = first.groupby(g["user_id"].to_numpy(), sort=False).cumsum()
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "distinct_types": run.to_numpy(np.int64),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- event-time watermark: late-arrival flags ---------------------------------


def late_event_flags(sf_dir: str, *, delay_s: int = 1_296_000, num_ranges: int = 32):
    """Streaming watermark semantics, replayed deterministically: arrival
    order = a Knuth-hash permutation of event_id (the "network shuffle" —
    the fixture's event times are monotone in event_id, so id order would
    make lateness vacuous), event time = ts, watermark = (max event time
    seen strictly before arrival) - delay. An event is LATE iff its event
    time is below the watermark at its own arrival. The permutation is
    exact 64-bit wrap arithmetic mod 2^32 on both engines (HUGEINT in the
    oracle), so arrival order is bit-identical.

    Distributed global prefix-max (no physical-order assumption): a cheap
    pre-pass computes per-id-range maxima, the driver folds them into an
    exclusive carry-in per range (<= num_ranges scalars), and one range
    exchange finishes with an in-range sort + vectorized cummax. The same
    shape as ``ntile_orders``' range-partitioned global ranking — the
    scale-correct pattern for any global running aggregate."""
    import ray

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    from ..sources.fs import to_pandas_cols

    def arrival_key(ids: np.ndarray) -> np.ndarray:
        with np.errstate(over="ignore"):
            return ((ids.astype(np.uint64) * KNUTH) & U32).astype(np.int64)

    def range_of(ids: np.ndarray) -> np.ndarray:
        # arrival keys are uniform on [0, 2^32): equi-width ranges
        r = (arrival_key(ids) * num_ranges) >> 32
        return np.clip(r, 0, num_ranges - 1)

    def max_partial(t: pa.Table) -> pd.DataFrame:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        tsv = t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        df = pd.DataFrame({"r": range_of(ids), "mx": tsv})
        return df.groupby("r", sort=False)["mx"].max().reset_index()

    per_range = (
        to_pandas_cols(
            ds.map_batches(max_partial, batch_format="pyarrow"),
            {"r": "int64", "mx": "int64"},
        )
        .groupby("r")["mx"]
        .max()
        .reindex(range(num_ranges), fill_value=np.iinfo(np.int64).min)
        .to_numpy(np.int64)
    )
    carry = np.empty(num_ranges, dtype=np.int64)
    carry[0] = np.iinfo(np.int64).min
    np.maximum.accumulate(per_range[:-1], out=carry[1:] if num_ranges > 1 else carry[:0])
    carry_ref = ray.put(carry)
    delay_us = delay_s * 1_000_000

    def assign(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": pa.array(ids.astype(np.int64)),
                "akey": pa.array(arrival_key(ids)),
                "ts_us": pa.array(
                    t["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
                ),
                "rng": pa.array(range_of(ids).astype(np.int32)),
            }
        )

    def finish_range(g: pd.DataFrame) -> pd.DataFrame:
        cin = ray.get(carry_ref)
        g = g.sort_values(["akey", "event_id"], kind="mergesort")
        tsv = g["ts_us"].to_numpy(np.int64)
        prior = np.empty(len(tsv), dtype=np.int64)
        prior[0] = cin[int(g["rng"].iloc[0])]
        np.maximum.accumulate(tsv[:-1], out=prior[1:] if len(tsv) > 1 else prior[:0])
        if len(tsv) > 1:
            np.maximum(prior[1:], prior[0], out=prior[1:])
        mn = np.iinfo(np.int64).min
        late = (prior != mn) & (tsv < prior - delay_us)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "is_late": late.astype(np.int64),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(finish_range, batch_format="pandas")
    )


# --- percent of per-user total -------------------------------------------------


def pct_of_user_total(sf_dir: str):
    """RATIO_TO_REPORT: each event's share of its user's total value,
    decided entirely in exact integer cents (int64 numerator and
    denominator, so the float division is correctly rounded to identical
    bits on both engines; no float sum ever forms). One BUCKETED exchange
    (bucketed-exchange rule) + vectorized grouped transform per bucket;
    half-away-from-zero rounding = DuckDB ROUND."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        cents = np.rint(g["value"].to_numpy(np.float64) * 100).astype(np.int64)
        tot = (
            pd.Series(cents)
            .groupby(g["user_id"].to_numpy(), sort=False)
            .transform("sum")
            .to_numpy(np.int64)
        )
        pct = cents.astype(np.float64) / tot.astype(np.float64)
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "pct": pc.round(pa.array(pct), **rnd).to_numpy(),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- per-user time-weighted average --------------------------------------------


def time_weighted_avg(sf_dir: str):
    """Per-user time-weighted average of ``value`` over the (ts, event_id)
    sample order: sum(v_i * dt_i) / total_duration with the last sample
    carrying zero weight — the telemetry/IoT aggregate. Numerator and
    denominator accumulate as EXACT int64 (cents x µs), so the single
    float division is bit-identical across engines. One BUCKETED exchange;
    per bucket one stable sort + grouped shift/sum — no per-user Python.
    Users with zero duration (single or all-simultaneous samples) are
    excluded, mirroring the SQL's den > 0 filter."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        cents = np.rint(g["value"].to_numpy(np.float64) * 100).astype(np.int64)
        nxt = pd.Series(ts).groupby(uid, sort=False).shift(-1)
        dt = (nxt - ts).fillna(0).to_numpy(np.int64)
        contrib = cents * dt
        d = pd.DataFrame({"uid": uid, "num": contrib, "ts": ts})
        agg = d.groupby("uid", sort=False).agg(
            num=("num", "sum"), t0=("ts", "min"), t1=("ts", "max")
        )
        den = agg["t1"].to_numpy(np.int64) - agg["t0"].to_numpy(np.int64)
        keep = den > 0
        num = agg["num"].to_numpy(np.int64)[keep]
        den = den[keep]
        twa = num.astype(np.float64) / (100.0 * den.astype(np.float64))
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        return pd.DataFrame(
            {
                "user_id": agg.index.to_numpy(np.int64)[keep],
                "twa": pc.round(pa.array(twa), **rnd).to_numpy(),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- day-of-week x hour-of-day heat counts --------------------------------------


def events_dow_hour(sf_dir: str):
    """Event counts by (day-of-week, hour-of-day) — the load-heatmap
    aggregate; covers the dow/hour scalar date functions. Dimension-
    bounded partials (<= 168 rows per block), one-task combine. Arrow's
    day_of_week counts from Monday=0; DuckDB's dayofweek from Sunday=0 —
    normalized to the DuckDB convention here."""
    ds = _read(sf_dir, "events", ["ts"])

    def partial(t: pa.Table) -> pd.DataFrame:
        dow = pc.day_of_week(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        dow = (dow + 1) % 7  # Monday=0 -> Sunday=0
        hour = pc.hour(t["ts"]).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"dow": dow, "hour": hour})
        return df.groupby(["dow", "hour"], sort=False).size().reset_index(name="n")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["dow", "hour"], sort=True)["n"].sum().reset_index()
        return out.astype({"dow": np.int64, "hour": np.int64, "n": np.int64})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


# --- GLOBAL percent rank (no global sort) ---------------------------------------


def global_percent_rank(sf_dir: str, *, num_ranges: int = 32):
    """Row-number-based GLOBAL percent rank of every order by
    (o_totalprice, o_orderkey) — the second member of the
    range-partitioned global-ranking family (``ntile_orders``,
    ``late_event_flags``): a counting pre-pass fixes per-range offsets,
    ONE range exchange assigns exact global positions, and
    pr = pos / (n-1) divides exact ints (bit-identical across engines;
    half-away rounding = DuckDB ROUND)."""
    import ray

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])

    from ..sources.fs import to_pandas_cols

    mm = to_pandas_cols(
        ds.map_batches(
            lambda t: pd.DataFrame(
                {
                    "mn": [t["o_totalprice"].to_numpy(zero_copy_only=False).min()],
                    "mx": [t["o_totalprice"].to_numpy(zero_copy_only=False).max()],
                    "n": [t.num_rows],
                }
            ),
            batch_format="pyarrow",
        ),
        {"mn": "float64", "mx": "float64", "n": "int64"},
    )
    n_total = int(mm["n"].sum())
    if n_total == 0:
        return pd.DataFrame(
            {"o_orderkey": pd.Series(dtype="int64"), "pr": pd.Series(dtype="float64")}
        )
    mn, mx = float(mm["mn"].min()), float(mm["mx"].max())
    width = (mx - mn) or 1.0

    def range_of(p: np.ndarray) -> np.ndarray:
        r = np.floor((p - mn) / width * num_ranges).astype(np.int64)
        return np.clip(r, 0, num_ranges - 1)

    hist = (
        to_pandas_cols(
            ds.map_batches(
                lambda t: pd.DataFrame(
                    {
                        "r": np.arange(num_ranges, dtype=np.int64),
                        "c": np.bincount(
                            range_of(t["o_totalprice"].to_numpy(zero_copy_only=False)),
                            minlength=num_ranges,
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            {"r": "int64", "c": "int64"},
        )
        .groupby("r")["c"]
        .sum()
        .reindex(range(num_ranges), fill_value=0)
        .to_numpy(np.int64)
    )
    offsets = np.zeros(num_ranges, dtype=np.int64)
    offsets[1:] = np.cumsum(hist)[:-1]
    off_ref = ray.put(offsets)
    denom = float(max(n_total - 1, 1))

    def assign(t: pa.Table) -> pa.Table:
        p = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].cast(pa.int64()),
                "o_totalprice": pa.array(p),
                "rng": pa.array(range_of(p).astype(np.int32)),
            }
        )

    def rank_range(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(off_ref)
        g = g.sort_values(["o_totalprice", "o_orderkey"], kind="mergesort")
        pos = offs[int(g["rng"].iloc[0])] + np.arange(len(g), dtype=np.int64)
        pr = pos.astype(np.float64) / denom
        rnd = dict(ndigits=6, round_mode="half_towards_infinity")
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].to_numpy(np.int64),
                "pr": pc.round(pa.array(pr), **rnd).to_numpy(),
            }
        )

    return (
        ds.map_batches(assign, batch_format="pyarrow")
        .groupby("rng")
        .map_groups(rank_range, batch_format="pandas")
    )


# --- month-over-month revenue growth ---------------------------------------------


def orders_monthly_growth(sf_dir: str):
    """Month-over-month order-revenue growth: monthly revenue folds from
    per-block partials in exact integer cents (<= |months| rows each), and
    growth = cents/prev - 1 divides two exact int64s (bit-identical across
    engines; half-away rounding = DuckDB ROUND). The first month has no
    predecessor and is excluded. Calendar-window analytics over a
    dimension-bounded fold — no shuffle."""
    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        y = pc.year(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        m = pc.month(t["o_orderdate"]).to_numpy(zero_copy_only=False).astype(np.int64)
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100
        ).astype(np.int64)
        df = pd.DataFrame({"y": y, "m": m, "cents": cents})
        return df.groupby(["y", "m"], sort=False)["cents"].sum().reset_index()

    from ..sources.fs import to_pandas_cols

    folds = to_pandas_cols(
        ds.map_batches(partial, batch_format="pyarrow"),
        {"y": "int64", "m": "int64", "cents": "int64"},
    )
    agg = folds.groupby(["y", "m"], sort=True)["cents"].sum().reset_index()
    cents = agg["cents"].to_numpy(np.int64)
    if len(cents) < 2:
        return pd.DataFrame(
            {
                "y": pd.Series(dtype="int64"),
                "m": pd.Series(dtype="int64"),
                "growth": pd.Series(dtype="float64"),
            }
        )
    growth = cents[1:].astype(np.float64) / cents[:-1].astype(np.float64) - 1.0
    rnd = dict(ndigits=6, round_mode="half_towards_infinity")
    return pd.DataFrame(
        {
            "y": agg["y"].to_numpy(np.int64)[1:],
            "m": agg["m"].to_numpy(np.int64)[1:],
            "growth": pc.round(pa.array(growth), **rnd).to_numpy(),
        }
    )
