"""Oracle-checked relational operators over the driver's TPC-H-ish tables.

Each function implements one operator family from SURVEY.md section 2 as an
idiomatic Ray Data pipeline; ``__ray_entry__.queries()`` exposes them and
``oracle_sql()`` carries the DuckDB-equivalent SQL. Column names match the
SQL aliases exactly (driver hash-compares after sorting columns by name).

Float aggregates are rounded to 6 decimals on BOTH sides so sum-order
nondeterminism between engines cannot flip the value hash.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    from ..sources.fs import sized_read_parquet

    return sized_read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _round_col(df: pd.DataFrame, cols: list[str], nd: int = 6) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].round(nd)
    return df


def keyed_window_exchange(ds, key: str, per_bucket, *, num_buckets: int | None = None):
    """Bucketed keyed exchange for per-key window/aggregate operators — the
    repo-wide bucketed-exchange rule (BASELINE.md round-4 part 2: Ray's
    ``map_groups`` invokes the UDF once per GROUP, so grouping on a raw
    unbounded key like user_id/custkey costs one ~1 ms Python call per key;
    measured 120 s vs 4.2 s at 98k keys). Rows route on a session-adaptive
    int32 splitmix bucket of the key instead; ``per_bucket`` then runs ONE
    vectorized pandas kernel over every key in the bucket (all rows of a
    key land in exactly one bucket). Bucket values only ROUTE rows —
    results are bucket-count-invariant.
    """
    from ..hashing import hash_stream
    from .linkgraph import _num_buckets

    nb = num_buckets or _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = (hash_stream(k, 29) % np.uint64(nb)).astype(np.int32)
        return t.append_column("__b", pa.array(b))

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return per_bucket(g.drop(columns="__b"))

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
    )


# --- M-group: filter + projection + computed column (SURVEY 2.2) -----------


def filter_project(sf_dir: str):
    """lineitem filtered and projected with a computed revenue column."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def fn(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))))
        # price and discount are 2-decimal fixtures: compute in exact integer
        # cents x percent domain so the result double is bit-identical to any
        # engine doing the same (float rounding implementations differ at ULP).
        cents = pc.cast(pc.round(pc.multiply(t["l_extendedprice"], pa.scalar(100.0))), pa.int64())
        pct = pc.cast(
            pc.round(pc.multiply(pc.subtract(pa.scalar(1.0), t["l_discount"]), pa.scalar(100.0))),
            pa.int64(),
        )
        rev = pc.divide(pc.cast(pc.multiply(cents, pct), pa.float64()), pa.scalar(10000.0))
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": t["l_linenumber"],
                "revenue": rev,
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


# --- A-group: grouped aggregates (SURVEY 2.5) ------------------------------


def groupby_agg(sf_dir: str):
    """TPC-H Q1-flavored grouped aggregate with partial pre-aggregation.

    The partial+final combiner pattern (pre-aggregate inside map_batches,
    then a small groupby) — the scale shape for all mean/sum rollups (A1/A2).
    """
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False)
        out = g.agg(
            sum_qty=("l_quantity", "sum"),
            sum_price=("l_extendedprice", "sum"),
            n=("l_quantity", "size"),
        ).reset_index()
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["l_returnflag", "l_linestatus"], sort=False)
        out = g.agg(
            sum_qty=("sum_qty", "sum"),
            sum_price=("sum_price", "sum"),
            n=("n", "sum"),
        ).reset_index()
        out["avg_qty"] = out["sum_qty"] / out["n"]
        # money sums accumulate ~1e-6 summation-order drift between engines,
        # larger than a 6dp guard — round money to 2dp on both sides
        out = _round_col(out, ["sum_price"], nd=2)
        return _round_col(out, ["sum_qty", "avg_qty"])

    # repartition tree, not a sort groupby: partials are <= 6 rows/block,
    # and a sort exchange over 3 distinct l_returnflag keys necessarily
    # leaves partitions empty (schema-less bundles Ray warns on). The
    # single-block final is bounded by keys x blocks.
    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def two_key_mean(sf_dir: str):
    """groupby (user_id, event_type) mean — the reference's one true
    groupby-aggregate (GCP dedup-mean, conversion/utils.py:261-298).
    Partial pre-aggregation per block, then one BUCKETED exchange on the
    user key (bucketed-exchange rule — a raw-key map_groups costs one UDF
    call per user) with a vectorized in-bucket final combine."""
    ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False)["value"]
        return g.agg(s="sum", c="size").reset_index()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["user_id", "event_type"], sort=False)
        out = g.agg(s=("s", "sum"), c=("c", "sum")).reset_index()
        out["mean_value"] = (out["s"] / out["c"]).round(6)
        return out[["user_id", "event_type", "mean_value"]]

    parts = ds.map_batches(partial, batch_format="pandas")
    return keyed_window_exchange(parts, "user_id", final)


def global_minmax(sf_dir: str):
    """Global min/max aggregate — the bbox-union shape (A7/A8)."""
    ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "min_price": pa.array([pc.min(t["l_extendedprice"]).as_py()]),
                "max_price": pa.array([pc.max(t["l_extendedprice"]).as_py()]),
                "min_qty": pa.array([pc.min(t["l_quantity"]).as_py()]),
                "max_qty": pa.array([pc.max(t["l_quantity"]).as_py()]),
            }
        )

    from ..sources.fs import to_pandas_cols

    partials = to_pandas_cols(
        ds.map_batches(partial, batch_format="pyarrow"),
        {c: "float64" for c in ("min_price", "max_price", "min_qty", "max_qty")},
    )
    out = pd.DataFrame(
        {
            "min_price": [round(partials["min_price"].min(), 6)],
            "max_price": [round(partials["max_price"].max(), 6)],
            "min_qty": [round(partials["min_qty"].min(), 6)],
            "max_qty": [round(partials["max_qty"].max(), 6)],
        }
    )
    return out


# --- Sort / top-k (SURVEY 2.6) ---------------------------------------------


def topk_orders(sf_dir: str, k: int = 10):
    """Global top-k via per-block partial top-k + one bounded combine.

    Every block keeps only its own top-k (Arrow ``select_k_unstable``), so
    the final combine sees at most k x num_blocks rows instead of the full
    table — no global ``Sort`` operator in the plan. Ties are deterministic
    because ``o_orderkey`` (unique) is the secondary sort key.
    """
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
    keys = [("o_totalprice", "descending"), ("o_orderkey", "ascending")]

    def block_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k=k, sort_keys=keys))

    partials = ds.map_batches(block_topk, batch_format="pyarrow")
    from ..sources.fs import to_pandas_cols

    df = to_pandas_cols(partials, {"o_orderkey": "int64", "o_totalprice": "float64"})
    return (
        df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


# --- D-group: dedup (SURVEY 2.7) -------------------------------------------


def dedup_docs_exact(sf_dir: str):
    """Exact text dedup keeping the smallest doc_id (hash-bucket shuffle)."""
    from ..stages.dedup import dedup_exact

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

    def neg(t: pa.Table) -> pa.Table:
        return t.append_column("__neg_id", pc.negate_checked(t["doc_id"]))

    deduped = dedup_exact(
        ds.map_batches(neg, batch_format="pyarrow"),
        key="text",
        order_col="__neg_id",  # max(-id) == min(id)
        num_buckets=16,
    )

    def clean(t: pa.Table) -> pa.Table:
        return t.select(["doc_id", "lang", "n_chars"])

    return deduped.map_batches(clean, batch_format="pyarrow")


def dedup_latest_events(sf_dir: str):
    """Latest-wins dedup per user_id — the url/warc_ts semantics on an
    oracle-checkable table (ties broken by event_id desc)."""
    from ..stages.dedup import dedup_exact

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

    deduped = dedup_exact(
        ds,
        key="user_id",
        order_col=["ts", "event_id"],
        num_buckets=16,
    )

    def clean(t: pa.Table) -> pa.Table:
        return t.select(["user_id", "ts", "event_type"])

    return deduped.map_batches(clean, batch_format="pyarrow")


# --- Text ops (task brief "Text analysis") ---------------------------------


def token_count_docs(sf_dir: str):
    from ..stages.text import TOKEN_PATTERN

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "token_count": pc.cast(
                    pc.count_substring_regex(t["text"], TOKEN_PATTERN), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def lang_hist(sf_dir: str):
    """Per-language counters — the per-cell counter shape (SURVEY 2.5 ours)."""
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False)["n_chars"]
        return g.agg(docs="size", chars="sum").reset_index()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("lang", sort=False)
        return g.agg(docs=("docs", "sum"), chars=("chars", "sum")).reset_index()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


# --- J-group: joins (SURVEY 2.4) -------------------------------------------


def broadcast_join_counts(sf_dir: str):
    """customer -> nation -> region via broadcast dict lookup (no shuffle)."""
    import ray

    from ..sources.fs import to_pandas_cols

    nation = to_pandas_cols(
        _read(sf_dir, "nation"), {"n_nationkey": "int64", "n_regionkey": "int64"}
    )
    region = to_pandas_cols(
        _read(sf_dir, "region"), {"r_regionkey": "int64", "r_name": "object"}
    )
    n2r = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    lookup_ref = ray.put(dict(zip(n2r["n_nationkey"], n2r["r_name"])))

    ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        import ray as _ray

        lookup = _ray.get(lookup_ref)
        df["r_name"] = df["c_nationkey"].map(lookup)
        return (
            df.groupby("r_name", sort=False)
            .agg(customers=("c_custkey", "size"))
            .reset_index()
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.groupby("r_name", sort=False)
            .agg(customers=("customers", "sum"))
            .reset_index()
        )

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("r_name")
        .map_groups(final, batch_format="pandas")
    )


def hash_join_revenue(sf_dir: str, num_buckets: int = 256):
    """orders JOIN lineitem on orderkey -> revenue per orderstatus.

    Explicit partitioned hash join (bucket both sides on the key hash, join
    matching buckets inside map_groups) — the portable both-sides-large
    pattern; B and skew notes per SURVEY 7.3. 256 buckets (power of 2):
    more distinct keys than sort partitions keeps every partition
    non-empty (no schema-less bundles), and per-bucket pandas merges are
    batched inside one task per partition either way.
    """
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

    def tag_orders(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["o_orderkey"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "key": t["o_orderkey"],
                "status": t["o_orderstatus"],
                "rev": pa.nulls(len(t), pa.float64()),
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                "bucket": b,
            }
        )

    def tag_items(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["l_orderkey"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        rev = pc.multiply(
            t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
        )
        return pa.table(
            {
                "key": t["l_orderkey"],
                "status": pa.nulls(len(t), pa.string()),
                "rev": rev,
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
                "bucket": b,
            }
        )

    both = orders.map_batches(tag_orders, batch_format="pyarrow").union(
        items.map_batches(tag_items, batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0][["key", "status"]]
        right = group[group["side"] == 1][["key", "rev"]]
        m = right.merge(left, on="key", how="inner")
        return (
            m.groupby("status", sort=False)
            .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
            .rename(columns={"status": "o_orderstatus"})
        )

    joined = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby("o_orderstatus", sort=False)
            .agg(revenue=("revenue", "sum"), n_items=("n_items", "sum"))
            .reset_index()
        )
        return _round_col(out, ["revenue"], nd=2)

    # per-bucket partials are <= num_buckets x |status| rows — combine them
    # in ONE task via a coalesce instead of a second sort-based groupby
    # exchange (the all-to-all machinery costs more than the 48-row combine)
    return joined.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def distinct_pairs(sf_dir: str):
    """Multi-column DISTINCT (set-op family, SURVEY 2.7): local
    drop_duplicates partials then a keyed combine — the same
    partial+final shape as the aggregates, so the shuffle moves only
    already-distinct pairs."""
    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return group.drop_duplicates()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def backfill_join(sf_dir: str, num_partitions: int = 8):
    """Left join orders with pre-aggregated lineitem quantities — the
    reference's inject-missing-bands backfill join shape (J1,
    /root/reference/src/eopf_geozarr/s2_optimization/s2_multiscale.py:160-231:
    locate data in the finer-resolution source, coarsen it to the target
    grid, merge aligning on target keys). Uses Ray Data's native
    hash-partitioned ``Dataset.join``; missing rows backfill with 0.
    """
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
    items = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    # Ray's hash-join aggregator raises ArrowInvalid when a side is fully
    # empty (schema-less partition blocks); both degenerate cases reduce to
    # a zero-filled passthrough of orders. count() here is the metadata
    # fast path (untransformed parquet reads), so the hot path pays nothing.
    if orders.count() == 0 or items.count() == 0:

        def zero_fill(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "o_orderstatus": t["o_orderstatus"],
                    "total_qty": pa.array(np.zeros(len(t)), pa.float64()),
                }
            )

        return orders.map_batches(zero_fill, batch_format="pyarrow")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("l_orderkey", sort=False)["l_quantity"]
            .sum()
            .reset_index(name="qty_partial")
        )

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return (
            group.groupby("l_orderkey", sort=False)["qty_partial"]
            .sum()
            .reset_index(name="total_qty")
        )

    agg = (
        items.map_batches(partial, batch_format="pandas")
        .groupby("l_orderkey")
        .map_groups(final, batch_format="pandas")
    )
    joined = orders.join(
        agg,
        "left_outer",
        num_partitions,
        on=("o_orderkey",),
        right_on=("l_orderkey",),
    )

    def clean(t: pa.Table) -> pa.Table:
        qty = pc.coalesce(t["total_qty"], pa.scalar(0.0))
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"],
                "o_orderstatus": t["o_orderstatus"],
                "total_qty": pc.round(qty, ndigits=6),
            }
        )

    return joined.map_batches(clean, batch_format="pyarrow")


def sessionize(sf_dir: str, gap_minutes: int = 30):
    """Gap-based sessionization per user (streaming-shaped op): events more
    than `gap_minutes` apart start a new session. Ordering assumption:
    per-user total order by (ts, event_id). Output: one row per session
    with event count and bounds. One BUCKETED exchange on the user key
    (bucketed-exchange rule); per bucket one stable sort by (user, ts,
    event_id), session boundaries = new-user OR over-gap diff, then one
    vectorized grouped aggregate over the bucket-global session index."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]] if len(uid) else np.zeros(0, bool)
        gap = (g["ts"].diff() > pd.Timedelta(minutes=gap_minutes)).to_numpy()
        session_idx = np.cumsum(new_user | gap).astype(np.int64)
        out = (
            g.assign(session_idx=session_idx)
            .groupby("session_idx", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "size"),
            )
            .reset_index(drop=True)
        )
        return out

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- Streaming-shaped: windows / as-of (SURVEY 2.9) ------------------------


def window_hourly(sf_dir: str, num_buckets: int = 64):
    """Tumbling 1h window count+sum per user.

    Per-block Arrow ``group_by`` partials bound the exchange to distinct
    (user, hour) pairs per block (the at-scale requirement for coarse
    windows over dense streams); the exchange is keyed by a SMALL int
    bucket of user_id, not user_id itself — sorting the shuffle on a
    64-value key instead of the full user domain measured 4x faster at
    sf0.1 (2.3 s -> 0.55 s, 32 CPUs) with identical output."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(t["ts"], unit="hour")
        t2 = pa.table({"user_id": t["user_id"], "hour": hour, "value": t["value"]})
        g = t2.group_by(["user_id", "hour"]).aggregate(
            [([], "count_all"), ("value", "sum")]
        )
        b = pc.cast(
            pc.bit_wise_and(g["user_id"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return g.append_column("bucket", b)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["user_id", "hour"], sort=False)
        out = g.agg(n=("count_all", "sum"), s=("value_sum", "sum")).reset_index()
        out["sum_value"] = out["s"].round(6)
        out["n"] = out["n"].astype("int64")
        return out[["user_id", "hour", "n", "sum_value"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(final, batch_format="pandas")
    )


PRICE_BANDS: list[tuple[int, float, float]] = [
    # overlapping price bands (band_id, lo, hi) covering the fixture's
    # o_totalprice range (~1e3..5e5) — each band overlaps the next by 50%,
    # so rows in the overlap join two bands
    (i, 50_000.0 * i, 50_000.0 * i + 75_000.0) for i in range(10)
]


def range_join_bands(sf_dir: str):
    """Range join: every (order, band) pair where o_totalprice falls inside
    the band's [lo, hi) — bands OVERLAP so a row can join several. The
    broadcast-small-side pattern: the band table rides in the kernel
    closure (never shuffled); each batch evaluates all bands with
    vectorized masks and emits partial (band, count, sum) rows; a tiny
    final combine groups |bands| rows. No all-to-all over the fact table.
    """
    ds = _read(sf_dir, "orders", ["o_totalprice"])
    bands = PRICE_BANDS

    def partial(t: pa.Table) -> pd.DataFrame:
        price = t["o_totalprice"].to_numpy(zero_copy_only=False)
        rows = []
        for band_id, lo, hi in bands:
            m = (price >= lo) & (price < hi)
            n = int(m.sum())
            if n:
                rows.append((band_id, n, float(price[m].sum())))
        return pd.DataFrame(rows, columns=["band_id", "n", "s"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def final(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby("band_id", sort=True)
            .agg(n_orders=("n", "sum"), total=("s", "sum"))
            .reset_index()
        )
        g["total"] = g["total"].round(2)
        return g[["band_id", "n_orders", "total"]]

    return partials.repartition(1).map_batches(
        final, batch_format="pandas", batch_size=None
    )


def asof_join_orders(sf_dir: str, num_buckets: int = 16):
    """Cross-table as-of join: each event gets the latest order the same
    customer placed at-or-before the event time (left join; no-match ->
    null). The custom-operator ladder case (a): a composition of
    map_batches (tag + bucket) + one hash-bucket exchange +
    ``pd.merge_asof`` per bucket — both sides sorted-merged inside the
    group, only key-matched buckets co-locate. Right side is pre-reduced to
    one row per (key, ts) (max orderkey wins) so tie behavior is
    deterministic and SQL-expressible.
    """
    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def tag_events(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["user_id"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "key": t["user_id"],
                "ts": t["ts"],
                "event_id": t["event_id"],
                "o_orderkey": pa.nulls(t.num_rows, pa.int64()),
                "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
                "bucket": b,
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["o_custkey"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "key": t["o_custkey"],
                "ts": t["o_orderdate"],
                "event_id": pa.nulls(t.num_rows, pa.int64()),
                "o_orderkey": t["o_orderkey"],
                "side": pa.array(np.ones(t.num_rows, dtype=np.int8)),
                "bucket": b,
            }
        )

    both = events.map_batches(tag_events, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def join_bucket(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["side"] == 0][["key", "ts", "event_id"]]
        right = group[group["side"] == 1][["key", "ts", "o_orderkey"]]
        if left.empty:
            return pd.DataFrame(
                columns=["event_id", "user_id", "ts", "o_orderkey"]
            ).astype({"event_id": "int64", "user_id": "int64",
                      "ts": "datetime64[us]", "o_orderkey": "float64"})
        # deterministic ties: one row per (key, ts), max orderkey wins
        right = (
            right.groupby(["key", "ts"], sort=False)["o_orderkey"]
            .max()
            .reset_index()
        )
        left = left.sort_values("ts", kind="mergesort")
        right = right.sort_values("ts", kind="mergesort")
        m = pd.merge_asof(
            left, right, on="ts", by="key", direction="backward"
        )
        m = m.rename(columns={"key": "user_id"})
        # event_id picked up float64 from the union's null padding; restore.
        # o_orderkey stays float64 (nullable on no-match) — oracle casts too.
        m["event_id"] = m["event_id"].astype("int64")
        m["o_orderkey"] = m["o_orderkey"].astype("float64")
        return m[["event_id", "user_id", "ts", "o_orderkey"]]

    return both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")


def doc_quality(sf_dir: str):
    """Per-document quality stats (task brief "quality scoring"): byte
    length, alphabetic ratio, and the engine's [0,1] score (mean-word-length
    closeness + alpha ratio) — all from the single-pass byte kernel in
    stages/text.py, oracle-replicated expression-for-expression in SQL."""
    from ..stages.text import text_stats

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def fn(t: pa.Table) -> pa.Table:
        s = text_stats(t)
        return pa.table(
            {
                "doc_id": s["doc_id"],
                "n_bytes": pc.cast(pc.binary_length(s["text"]), pa.int64()),
                # DuckDB ROUND is half-away-from-zero; match it exactly
                "alpha_ratio": pc.round(
                    s["alpha_ratio"], ndigits=6, round_mode="half_towards_infinity"
                ),
                "score": pc.round(
                    s["score"], ndigits=6, round_mode="half_towards_infinity"
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def sliding_window_sum(sf_dir: str, window_s: int = 3600):
    """Per-user sliding-window sum: for each event, the sum of that user's
    values in the closed interval [ts - window, ts] — SQL RANGE BETWEEN
    semantics (all ts-peers included). One BUCKETED exchange on the
    partition key (bucketed-exchange rule); per bucket ONE stable sort by
    (user, ts, event_id) and the two searchsorted cuts run over ALL users
    at once on a per-segment-offset composite key (stride > ts_range +
    window guarantees each probe lands inside its own user's segment).
    """
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    w_us = window_s * 1_000_000

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
        n = len(ts)
        if n == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"), "win_sum": pd.Series(dtype="float64")}
            )
        new = np.r_[True, uid[1:] != uid[:-1]]
        seg_idx = np.cumsum(new) - 1  # 0-based segment per row
        starts = np.flatnonzero(new)
        seg_start = starts[seg_idx]
        t0 = ts - ts.min()
        stride = int(t0.max()) + w_us + 2
        if int(seg_idx[-1] + 1) * stride < 2**62:  # composite-key fast path
            key = seg_idx * stride + t0
            lo = np.searchsorted(key, seg_idx * stride + (t0 - w_us), side="left")
            hi = np.searchsorted(key, key, side="right")  # ALL ts peers
        else:  # pathological ts range x segment count: per-segment probes
            lo = np.empty(n, np.int64)
            hi = np.empty(n, np.int64)
            ends = np.r_[starts[1:], n]
            for s, e in zip(starts, ends):
                lo[s:e] = s + np.searchsorted(ts[s:e], ts[s:e] - w_us, side="left")
                hi[s:e] = s + np.searchsorted(ts[s:e], ts[s:e], side="right")
        # per-user serial prefix sums (grouped cumsum), differenced exactly
        # as the per-user [0, cumsum] form: sum[lo,hi) = G[hi-1] - G[lo-1]
        gcs = g.groupby("user_id", sort=False)["value"].cumsum().to_numpy()
        left = np.where(lo > seg_start, gcs[np.maximum(lo - 1, 0)], 0.0)
        out = g[["event_id"]].copy()
        out["win_sum"] = np.round(gcs[hi - 1] - left, 6)
        return out

    return keyed_window_exchange(ds, "user_id", per_bucket)


def prev_event_ts(sf_dir: str):
    """Per-user as-of/lag: previous event ts for every event (ordered by
    ts, event_id within user) — merge_asof/window-lag shape over a
    partitioned, sorted log (ordering assumption: per-user total order by
    (ts, event_id)). One BUCKETED exchange (bucketed-exchange rule); per
    bucket a single stable sort + one vectorized grouped shift(1)."""
    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].shift(1)
        return pd.DataFrame(
            {
                "event_id": g["event_id"].to_numpy(np.int64),
                "prev_ts": prev.to_numpy(),
            }
        )

    return keyed_window_exchange(ds, "user_id", per_bucket)


# --- Pyramid semantics on an oracle-checkable table ------------------------


def cell_rollup_events(sf_dir: str):
    """Two-level mean-of-means rollup: cell = user_id % 256, parent = cell/4.

    Exactly the pyramid's UNWEIGHTED mean semantics (A1/A2: level ℓ+1 is the
    plain mean of level ℓ values, not a weighted mean) so DuckDB can oracle
    the rollup math the tile pyramid uses.
    """
    ds = _read(sf_dir, "events", ["user_id", "value"])

    def cellify(t: pa.Table) -> pa.Table:
        cell = pc.cast(
            pc.bit_wise_and(t["user_id"], pa.scalar(255, pa.int64())), pa.int64()
        )
        return pa.table({"cell": cell, "value": t["value"]})

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cell", sort=False)["value"]
        return g.agg(s="sum", c="size").reset_index()

    def level1(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("cell", sort=False)
        out = g.agg(s=("s", "sum"), c=("c", "sum")).reset_index()
        out["mean_value"] = out["s"] / out["c"]
        out["parent"] = out["cell"] // 4
        return out[["parent", "cell", "mean_value"]]

    l1 = (
        ds.map_batches(cellify, batch_format="pyarrow")
        .map_batches(partial, batch_format="pandas")
        .groupby("cell")
        .map_groups(level1, batch_format="pandas")
    )

    def level2(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("parent", sort=False)["mean_value"]
        out = g.agg(parent_mean="mean", n_cells="size").reset_index()
        out["parent_mean"] = out["parent_mean"].round(6)
        return out

    return l1.groupby("parent").map_groups(level2, batch_format="pandas")


# --- Similarity search -----------------------------------------------------


def knn_embeddings_query(sf_dir: str, *, k: int = 3, n_queries: int = 5):
    """Brute-force cosine top-k for the first `n_queries` vectors."""
    from ..stages.knn import knn_embeddings

    from ..sources.fs import to_pandas_cols

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    head = to_pandas_cols(
        ds.filter(expr=f"vec_id < {int(n_queries)}"),
        {"vec_id": "int64", "embedding": "object"},
    ).sort_values("vec_id")
    if head.empty:  # no query vectors -> well-formed empty result
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "rank": pa.array([], pa.int64()),
            }
        )
    qm = np.stack(head["embedding"].to_numpy())
    qids = head["vec_id"].to_numpy()
    return knn_embeddings(ds, qm, qids, k=k)


# --- Join variants: semi / anti (EXISTS / NOT EXISTS) ----------------------


def _exists_join(sf_dir: str, *, anti: bool, num_buckets: int = 16):
    """Customers with (semi) / without (anti) at least one event.

    Both-sides-large formulation: the probe side is pre-distincted PER
    BLOCK before the exchange (only unique keys cross the wire — bounded
    by the key cardinality regardless of fan-in), then both sides meet in
    one bucketed groupby and membership is decided per bucket with a
    vectorized isin. No driver-side key set, no second exchange.
    """
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    orders = _read(sf_dir, "events", ["user_id"])

    def tag_cust(t: pa.Table) -> pa.Table:
        b = pc.cast(
            pc.bit_wise_and(t["c_custkey"], pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "key": t["c_custkey"],
                "c_mktsegment": t["c_mktsegment"],
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
                "bucket": b,
            }
        )

    def tag_orders(t: pa.Table) -> pa.Table:
        keys = pc.unique(t["user_id"])  # local pre-distinct: tiny exchange
        b = pc.cast(
            pc.bit_wise_and(keys, pa.scalar(num_buckets - 1, pa.int64())),
            pa.int32(),
        )
        return pa.table(
            {
                "key": keys,
                "c_mktsegment": pa.nulls(len(keys), pa.string()),
                "side": pa.array(np.ones(len(keys), dtype=np.int8)),
                "bucket": b,
            }
        )

    both = cust.map_batches(tag_cust, batch_format="pyarrow").union(
        orders.map_batches(tag_orders, batch_format="pyarrow")
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        have = group.loc[group["side"] == 1, "key"].to_numpy()
        left = group[group["side"] == 0]
        mask = left["key"].isin(have).to_numpy()
        keep = left[~mask] if anti else left[mask]
        return keep[["key", "c_mktsegment"]].rename(columns={"key": "c_custkey"})

    return both.groupby("bucket").map_groups(per_bucket, batch_format="pandas")


def semi_join_customers(sf_dir: str):
    """Customers with at least one event (EXISTS semi-join)."""
    return _exists_join(sf_dir, anti=False)


def anti_join_customers(sf_dir: str):
    """Customers with no events (NOT EXISTS anti-join)."""
    return _exists_join(sf_dir, anti=True)


# --- FULL OUTER join (both-sided null fill) ---------------------------------


def full_outer_join_counts(sf_dir: str):
    """Per-user event counts FULL OUTER JOIN per-customer order counts,
    unmatched sides 0-filled — completes the join-type family next to
    ``backfill_join`` (left) / ``semi_join`` / ``anti_join``.

    Shape: each side emits per-block partial counts into a SHARED flat
    schema (key, n_events, n_orders) with the other side's column zeroed;
    one ``groupby(key)`` sum is simultaneously the final aggregation AND
    the full-outer merge (a key present on either side survives; a key on
    both coalesces). One exchange total, moving one row per (block, key).
    Ray's native ``Dataset.join(full_outer)`` was measured to raise
    ArrowInvalid when a hash partition receives zero left rows (empty
    schemaless block), so the union-combine form is both the robust and
    the cheaper plan. The inputs are deliberately asymmetric subsets
    (even user_ids vs custkeys divisible by 3) so BOTH unmatched sides
    are exercised.
    """
    events = _read(sf_dir, "events", ["user_id"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def side_partial(key: str, mod: int, mine: str, other: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            keys = df[key].to_numpy(np.int64)
            keys = keys[keys % mod == 0]
            u, n = np.unique(keys, return_counts=True)
            cols = {
                "user_key": u,
                mine: n.astype(np.int64),
                other: np.zeros(len(u), dtype=np.int64),
            }
            # fixed column order so both sides union under one schema
            return pd.DataFrame(
                {c: cols[c] for c in ("user_key", "n_events", "n_orders")}
            )

        return fn

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("user_key", sort=False)[["n_events", "n_orders"]]
            .sum()
            .reset_index()
        )
        return out.astype({"n_events": np.int64, "n_orders": np.int64})

    ev = events.map_batches(
        side_partial("user_id", 2, "n_events", "n_orders"),
        batch_format="pandas",
    )
    od = orders.map_batches(
        side_partial("o_custkey", 3, "n_orders", "n_events"),
        batch_format="pandas",
    )
    return (
        ev.union(od)
        .groupby("user_key")
        .map_groups(merge, batch_format="pandas")
    )


# --- Grouped top-k per key (window ROW_NUMBER <= k) ------------------------


def grouped_topk_orders(sf_dir: str, k: int = 3):
    """Top-k orders per priority by (price DESC, orderkey ASC), ranked.

    Partial per-block top-k per key bounds the exchange to k rows per key
    per block; the final per-key group re-ranks deterministically. The
    same partial/final shape as the spatial per-cell kNN — this is its
    relational twin.
    """
    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        )
        return df.groupby("o_orderpriority", sort=False).head(k)

    def final(group: pd.DataFrame) -> pd.DataFrame:
        group = group.sort_values(
            ["o_totalprice", "o_orderkey"], ascending=[False, True], kind="mergesort"
        ).head(k)
        group = group.reset_index(drop=True)
        group["rank"] = np.arange(1, len(group) + 1, dtype=np.int64)
        return group[["o_orderpriority", "o_orderkey", "o_totalprice", "rank"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .map_groups(final, batch_format="pandas")
    )


# --- ROLLUP grouping sets --------------------------------------------------


def rollup_lineitem(sf_dir: str):
    """GROUP BY ROLLUP(l_returnflag, l_linestatus) on sum(qty) + count.

    The finest level is a normal distributed partial+final aggregate; the
    coarser grouping sets are derived algebraically from the finest table
    (bounded: |flags| x |statuses| rows), so the rollup costs ONE exchange
    no matter how many levels — never a second pass over the fact table.
    """
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
    ).to_pandas()  # bounded: one row per (flag, status) pair
    if "l_returnflag" not in finest.columns:  # empty fact table
        finest = pd.DataFrame(
            {
                "l_returnflag": pd.Series(dtype=object),
                "l_linestatus": pd.Series(dtype=object),
                "s": pd.Series(dtype="float64"),
                "n": pd.Series(dtype="int64"),
            }
        )

    lvl1 = (
        finest.groupby("l_returnflag", sort=False)
        .agg(s=("s", "sum"), n=("n", "sum"))
        .reset_index()
    )
    lvl1["l_linestatus"] = None
    lvl0 = pd.DataFrame(
        {
            "l_returnflag": [None],
            "l_linestatus": [None],
            "s": [finest["s"].sum()],
            "n": [finest["n"].sum()],
        }
    )
    out = pd.concat([finest, lvl1, lvl0], ignore_index=True)
    out = out.rename(columns={"s": "sum_qty", "n": "n_items"})
    return _round_col(out, ["sum_qty"], nd=6)[
        ["l_returnflag", "l_linestatus", "sum_qty", "n_items"]
    ]


# --- Algebraic variance/stddev aggregate -----------------------------------


def stddev_prices(sf_dir: str):
    """Population stddev of extendedprice per returnflag via (n, s, ss)
    partials — the canonical algebraic (decomposable) aggregate beyond
    sum/min/max; one tiny exchange of three floats per key per block."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["l_extendedprice"]
        df = df.assign(ss=x * x)
        g = df.groupby("l_returnflag", sort=False)
        return g.agg(n=("l_extendedprice", "size"), s=("l_extendedprice", "sum"),
                     ss=("ss", "sum")).reset_index()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("l_returnflag", sort=False)
        out = g.agg(n=("n", "sum"), s=("s", "sum"), ss=("ss", "sum")).reset_index()
        mu = out["s"] / out["n"]
        var = np.maximum(out["ss"] / out["n"] - mu * mu, 0.0)
        out["std_price"] = np.sqrt(var)
        out["mean_price"] = mu
        out = out[["l_returnflag", "mean_price", "std_price", "n"]]
        return _round_col(out, ["mean_price", "std_price"], nd=2)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .map_groups(final, batch_format="pandas")
    )


# --- Distributed exact quantiles (order statistics) ------------------------


def quantile_prices(
    sf_dir: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    num_bins: int = 2048,
    collect_cap: int = 1_000_000,
):
    """Exact QUANTILE_DISC (ascending element at floor((n-1)*q)) of
    l_extendedprice, computed distributedly in O(passes) scans:

    1. one map_batches pass -> per-block (count, min, max) partials;
    2. histogram pass(es): per-block bin counts over [lo, hi] (a
       ``num_bins``-long int vector per block — tiny); the driver sums
       them and locates the bin holding each target rank. If a candidate
       bin still holds more than ``collect_cap`` values the range narrows
       to that bin and the histogram repeats (geometric convergence);
    3. one filtered collect of ONLY the candidate-bin values (expected
       n/num_bins rows) -> exact order statistic via np.partition.

    The driver never sees more than num_bins ints per block plus the
    final bounded candidate set; no sort, no full materialization.
    """
    col = "l_extendedprice"
    ds = _read(sf_dir, "lineitem", [col])

    def minmax_partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False)
        x = x[~np.isnan(x)]
        if len(x) == 0:
            return pa.table(
                {"n": pa.array([0], pa.int64()),
                 "lo": pa.array([np.inf]), "hi": pa.array([-np.inf])}
            )
        return pa.table(
            {"n": pa.array([len(x)], pa.int64()),
             "lo": pa.array([float(x.min())]), "hi": pa.array([float(x.max())])}
        )

    from ..sources.fs import to_pandas_cols

    mm = to_pandas_cols(
        ds.map_batches(minmax_partial, batch_format="pyarrow"),
        {"n": "int64", "lo": "float64", "hi": "float64"},
    )
    n_total = int(mm["n"].sum())
    if n_total == 0:
        return pd.DataFrame({"q": list(qs), "val": [np.nan] * len(qs)})
    lo, hi = float(mm["lo"].min()), float(mm["hi"].max())
    targets = {q: int(np.floor((n_total - 1) * q)) for q in qs}

    def hist_counts(lo_: float, hi_: float):
        edges = np.linspace(lo_, hi_, num_bins + 1)

        def hist_partial(t: pa.Table) -> pa.Table:
            x = t[col].to_numpy(zero_copy_only=False)
            x = x[(x >= lo_) & (x <= hi_)]
            c, _ = np.histogram(x, bins=edges)
            return pa.table({"c": pa.array(c.astype(np.int64))})

        parts = ds.map_batches(hist_partial, batch_format="pyarrow").to_pandas()
        c = parts["c"].to_numpy().reshape(-1, num_bins).sum(axis=0)
        return edges, c

    out_rows = []
    for q, t_idx in targets.items():
        lo_, hi_ = lo, hi
        rank = t_idx  # rank within [lo_, hi_] (global at first: all values)
        for _ in range(8):  # geometric narrowing; 2 passes in practice
            edges, c = hist_counts(lo_, hi_)
            cum = np.cumsum(c)
            b = int(np.searchsorted(cum, rank + 1))
            in_bin = int(c[b])
            rank_in_bin = rank - (int(cum[b - 1]) if b > 0 else 0)
            blo, bhi = float(edges[b]), float(edges[b + 1])
            if in_bin <= collect_cap:
                break
            lo_, hi_, rank = blo, bhi, rank_in_bin
        else:  # pragma: no cover - pathological all-equal overflow
            pass
        # inclusive upper edge only for the last bin of this refinement
        ub = "<=" if b == num_bins - 1 else "<"
        vals = (
            ds.filter(expr=f"{col} >= {blo!r} and {col} {ub} {bhi!r}")
            .to_pandas()[col]
            .to_numpy()
        )
        vals = np.partition(vals, rank_in_bin)
        out_rows.append({"q": float(q), "val": float(vals[rank_in_bin])})
    return pd.DataFrame(out_rows)
