"""URL canonicalization + canonical-URL / host dedup (CC-crawl family).

Any real Common-Crawl-style dedup runs URL canonicalization BEFORE exact
dedup — the same page is crawled as ``http://Host:80/a/``,
``https://host/a?utm_source=feed`` and ``https://host/a`` — so the
canonicalizer is a first-class kernel here (the round-3 review called it
the most likely real-user gap in the LLM-pipeline family). The fixture
URLs are uniform, so the two oracled queries derive a deterministic messy
variant per document (mixed case, default port, trailing slash, tracking
params, query order) with an IDENTICAL CTE on the DuckDB side; both
engines then canonicalize and dedup, and the driver hash-compares.

Canonical form (all byte-deterministic, matched in SQL):

1. scheme and host lowercased
2. default port stripped (``:80`` http / ``:443`` https), others kept
3. fragment dropped
4. trailing slashes stripped from the path (empty path -> ``/``)
5. query params split on ``&``; tracking params (``utm_*``, ``fbclid``,
   ``gclid``) dropped; the rest byte-sorted and rejoined; empty -> none
6. non-URL strings (no ``scheme://``) pass through unchanged

Scale shape: the canonicalizer is a pure vectorized polars kernel inside
``map_batches`` (no state, no exchange); each dedup query then does ONE
bucketed exchange carrying per-block pre-aggregated (canon_url / host)
partials, never raw rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

TRACKING_PREFIXES = ("utm_", "fbclid", "gclid")

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)"
_PORT_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]*:([0-9]+)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"


def canonicalize_urls(urls) -> pa.Array:
    """Vectorized URL canonicalization (polars kernel) -> pa.string array.

    Accepts a pyarrow Array/ChunkedArray of strings. See the module
    docstring for the canonical form; DuckDB parity is pinned by
    ``tests/test_urlops.py`` over every messy-variant class.
    """
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    df = pl.DataFrame({"url": pl.from_arrow(urls.cast(pa.large_string()))})
    parsed = df.with_columns(
        scheme=pl.col("url").str.extract(_SCHEME_RE, 1).str.to_lowercase(),
        host=pl.col("url").str.extract(_HOST_RE, 1).str.to_lowercase(),
        port=pl.col("url").str.extract(_PORT_RE, 1),
        path=pl.col("url").str.extract(_PATH_RE, 1),
        query=pl.col("url").str.extract(_QUERY_RE, 1),
    )
    drop = pl.element().str.starts_with(TRACKING_PREFIXES[0])
    for p in TRACKING_PREFIXES[1:]:
        drop = drop | pl.element().str.starts_with(p)
    q = (
        pl.col("query")
        .str.split("&")
        .list.eval(pl.element().filter(~drop))
        .list.sort()
        .list.join("&")
    )
    keep_port = (
        pl.col("port").is_not_null()
        & (pl.col("port") != "")
        & ~((pl.col("scheme") == "https") & (pl.col("port") == "443"))
        & ~((pl.col("scheme") == "http") & (pl.col("port") == "80"))
    )
    path_c = pl.col("path").str.replace(r"/+$", "")
    out = parsed.with_columns(q=q).with_columns(
        canon=pl.when(pl.col("scheme").is_null())
        .then(pl.col("url"))
        .otherwise(
            pl.concat_str(
                [
                    pl.col("scheme"),
                    pl.lit("://"),
                    pl.col("host"),
                    pl.when(keep_port)
                    .then(pl.lit(":") + pl.col("port"))
                    .otherwise(pl.lit("")),
                    pl.when(path_c == "").then(pl.lit("/")).otherwise(path_c),
                    pl.when(pl.col("q").is_null() | (pl.col("q") == ""))
                    .then(pl.lit(""))
                    .otherwise(pl.lit("?") + pl.col("q")),
                ]
            )
        ),
    )
    return out["canon"].to_arrow().cast(pa.string())


def url_hosts(urls) -> pa.Array:
    """Lowercased host component (port excluded); '' for non-URLs."""
    import polars as pl

    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    df = pl.DataFrame({"url": pl.from_arrow(urls.cast(pa.large_string()))})
    host = (
        df.with_columns(
            host=pl.col("url").str.extract(_HOST_RE, 1).str.to_lowercase()
        )["host"]
        .fill_null("")
        .to_arrow()
        .cast(pa.string())
    )
    return host


# --- messy-variant fixture derivation (mirrored in the DuckDB oracle) -----


def messy_urls_table(t: pa.Table) -> pa.Table:
    """(doc_id) -> messy (url, r) rows: one clean base row (r=0) plus one
    deterministic messy variant per doc (r=1; class = doc_id % 6), and a
    second query-ordering row (r=2) for the v=5 class. Pure, vectorized —
    the 'fixture' both engines synthesize identically."""
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    h = (ids % 97).astype("U3")
    sid = ids.astype("U20")
    base = np.char.add(
        np.char.add(np.char.add("https://host", h), ".example.com/path/"), sid
    )
    v = ids % 6
    upper = np.char.add(
        np.char.add(np.char.add("https://HOST", h), ".EXAMPLE.COM/path/"), sid
    )
    with_port = np.char.add(
        np.char.add(np.char.add("https://host", h), ".example.com:443/path/"), sid
    )
    variant = np.select(
        [v == 0, v == 1, v == 2, v == 3, v == 4, v == 5],
        [
            base,
            upper,
            with_port,
            np.char.add(base, "/"),
            np.char.add(base, "?utm_source=feed&utm_medium=rss"),
            np.char.add(base, "?b=2&a=1"),
        ],
    )
    extra_mask = v == 5
    extra = np.char.add(base[extra_mask], "?a=1&b=2")
    url = np.concatenate([base, variant, extra])
    r = np.concatenate(
        [
            np.zeros(len(ids), dtype=np.int64),
            np.ones(len(ids), dtype=np.int64),
            np.full(extra_mask.sum(), 2, dtype=np.int64),
        ]
    )
    return pa.table({"url": pa.array(url.tolist(), pa.string()), "r": pa.array(r)})


#: the same derivation as a DuckDB CTE body (over the ``documents`` view)
MESSY_URLS_SQL = """
    base AS (
        SELECT doc_id,
               'https://host' || (doc_id % 97) || '.example.com/path/' || doc_id
                   AS base_url,
               doc_id % 6 AS v
        FROM documents
    ),
    messy AS (
        SELECT base_url AS url, 0::BIGINT AS r FROM base
        UNION ALL
        SELECT CASE v
                 WHEN 0 THEN base_url
                 WHEN 1 THEN 'https://HOST' || (doc_id % 97)
                             || '.EXAMPLE.COM/path/' || doc_id
                 WHEN 2 THEN 'https://host' || (doc_id % 97)
                             || '.example.com:443/path/' || doc_id
                 WHEN 3 THEN base_url || '/'
                 WHEN 4 THEN base_url || '?utm_source=feed&utm_medium=rss'
                 WHEN 5 THEN base_url || '?b=2&a=1'
               END AS url, 1::BIGINT AS r
        FROM base
        UNION ALL
        SELECT base_url || '?a=1&b=2' AS url, 2::BIGINT AS r
        FROM base WHERE v = 5
    )
"""

#: canonicalization of column ``url`` as a DuckDB CTE chain (input CTE must
#: be named ``messy``); emits ``canon(url, r, canon_url)``
CANON_SQL = r"""
    parts AS (
        SELECT url, r,
            lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1))
                AS scheme,
            lower(regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)', 1)) AS host,
            regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#:]*:([0-9]+)', 1) AS port,
            regexp_extract(url,
                '^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*([^?#]*)', 1) AS path,
            CASE WHEN url LIKE '%?%'
                 THEN regexp_extract(url, '\?([^#]*)', 1) END AS query
        FROM messy
    ),
    canon AS (
        SELECT url, r,
            CASE WHEN scheme = '' OR scheme IS NULL THEN url ELSE
                scheme || '://' || host ||
                CASE WHEN port IS NULL OR port = ''
                          OR (scheme = 'https' AND port = '443')
                          OR (scheme = 'http' AND port = '80')
                     THEN '' ELSE ':' || port END ||
                CASE WHEN regexp_replace(path, '/+$', '') = ''
                     THEN '/' ELSE regexp_replace(path, '/+$', '') END ||
                CASE WHEN q IS NULL OR q = '' THEN '' ELSE '?' || q END
            END AS canon_url
        FROM (
            SELECT *, array_to_string(list_sort(list_filter(
                       string_split(query, '&'),
                       x -> NOT (starts_with(x, 'utm_')
                                 OR starts_with(x, 'fbclid')
                                 OR starts_with(x, 'gclid')))), '&') AS q
            FROM parts
        )
    )
"""


def _messy_canon_ds(sf_dir: str):
    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def derive(t: pa.Table) -> pa.Table:
        m = messy_urls_table(t)
        return m.append_column("canon_url", canonicalize_urls(m["url"]))

    return ds.map_batches(derive, batch_format="pyarrow")


def canon_url_dedup(sf_dir: str, *, num_buckets: int = 64):
    """Canonical-URL dedup stats: per canonical url the total crawl-row
    count and the rank of the kept (first) row. One bucketed exchange of
    per-block (canon_url, cnt, min_r) partials — raw rows never shuffle."""
    ds = _messy_canon_ds(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("canon_url", sort=False).agg(
            n_rows=("r", "size"), kept_r=("r", "min")
        )
        out = g.reset_index()
        out["bucket"] = (
            pd.util.hash_pandas_object(out["canon_url"], index=False).to_numpy(
                np.uint64
            )
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("canon_url", sort=False).agg(
            n_rows=("n_rows", "sum"), kept_r=("kept_r", "min")
        )
        return g.reset_index()[["canon_url", "n_rows", "kept_r"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


def host_dedup(sf_dir: str, *, num_buckets: int = 64):
    """Per-host crawl pressure: total rows vs distinct canonical urls —
    the host-level dup ratio a crawl scheduler consumes. Per-block
    pre-distinct on (host, canon_url) bounds the exchange."""
    ds = _messy_canon_ds(sf_dir)

    def partial(t: pa.Table) -> pd.DataFrame:
        host = url_hosts(t["canon_url"]).to_pandas()
        df = pd.DataFrame(
            {"host": host, "canon_url": t["canon_url"].to_pandas()}
        )
        g = (
            df.groupby(["host", "canon_url"], sort=False)
            .size()
            .rename("cnt")
            .reset_index()
        )
        g["bucket"] = (
            pd.util.hash_pandas_object(g["host"], index=False).to_numpy(np.uint64)
            % np.uint64(num_buckets)
        ).astype(np.int32)
        return g

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        by_url = df.groupby(["host", "canon_url"], sort=False)["cnt"].sum()
        g = by_url.reset_index().groupby("host", sort=False)
        out = g.agg(n_rows=("cnt", "sum"), n_canon=("canon_url", "nunique"))
        return out.reset_index()[["host", "n_rows", "n_canon"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(combine, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Snapshot diff (crawl CDC)
# ---------------------------------------------------------------------------

#: snapshot boundary for `snapshot_diff` — fixture timestamps span 2024
SNAPSHOT_CUTOFF_US = 1719792000_000_000  # 2024-07-01T00:00:00Z epoch micros


def snapshot_diff(pages_path: str):
    """Crawl-over-crawl change detection: classify every url as ``added``
    (second half-year only), ``removed`` (first only) or ``both``.

    The CDC primitive of an incremental crawl pipeline: two snapshots of
    the same corpus diffed BY KEY, not by row. One pass computes per-block
    (url, in_a, in_b) presence partials (vectorized timestamp compare +
    pandas max — near-distinct already), then a single url-keyed exchange
    ORs the presence bits; page payloads never shuffle. Scale: the
    exchange carries <= |distinct urls| 3-column rows, and at 100 TB the
    same shape runs per url-hash bucket with the lineage writer so a
    resumed diff skips finished buckets.
    """
    import pyarrow.compute as pc

    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(pages_path, columns=["url", "warc_ts"])
    cutoff = pa.scalar(SNAPSHOT_CUTOFF_US, type=pa.timestamp("us"))

    from ..stages.dedup import _key_bucket

    num_buckets = 256

    def partial(t: pa.Table) -> pd.DataFrame:
        in_a = pc.less(t["warc_ts"], cutoff)
        df = pd.DataFrame(
            {
                "url": t["url"].to_pandas(),
                "in_a": in_a.to_numpy(zero_copy_only=False).astype(np.int64),
            }
        )
        df["in_b"] = 1 - df["in_a"]
        g = df.groupby("url", sort=False)
        out = g.agg(in_a=("in_a", "max"), in_b=("in_b", "max")).reset_index()
        out["__bucket"] = _key_bucket(pa.array(out["url"]), num_buckets)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pandas groupby per BUCKET (never per url group —
        # a raw url-keyed map_groups costs one UDF call per distinct url)
        g = group.groupby("url", sort=False)
        s = g.agg(in_a=("in_a", "max"), in_b=("in_b", "max")).reset_index()
        status = np.where(
            (s["in_a"] == 1) & (s["in_b"] == 1),
            "both",
            np.where(s["in_a"] == 1, "removed", "added"),
        )
        return pd.DataFrame({"url": s["url"], "status": status})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(final, batch_format="pandas")
    )


def per_host_cap(pages_path: str, *, k: int = 3, num_buckets: int = 64):
    """Crawl politeness / boilerplate cap: keep at most ``k`` crawl rows
    per host, earliest-first by ``(warc_ts, url)`` — the per-domain quota
    every RefinedWeb-style pipeline applies so mega-hosts don't dominate
    the training mix. Output: ``(host, url, warc_ts)``.

    Per-block per-host top-k partials (<= k rows per (block, host) — the
    ``topk_orders`` partial-top-k discipline) -> ONE host-hash bucket
    exchange -> the same vectorized run-scan picks the global first k.
    Exact ties beyond (warc_ts, url) are impossible in the output because
    those two columns ARE the sort key — tied rows are byte-identical, so
    either k-subset is the same multiset (matching the SQL ROW_NUMBER
    twin). html payloads never enter the exchange (column-pruned read).
    """
    import pyarrow.compute as pc

    from ..sources.fs import sized_read_parquet

    ds = sized_read_parquet(pages_path, columns=["url", "warc_ts"])

    def _first_k(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["host", "warc_ts", "url"], kind="mergesort")
        h = df["host"].to_numpy()
        n = len(h)
        new = np.empty(n, dtype=bool)
        if n:
            new[0] = True
            new[1:] = h[1:] != h[:-1]
        segid = np.cumsum(new) - 1 if n else np.array([], dtype=np.int64)
        starts = np.flatnonzero(new)
        pos = np.arange(n) - (starts[segid] if n else 0)
        return df.iloc[pos < k]

    def partial(t: pa.Table) -> pd.DataFrame:
        parts = pc.split_pattern(t["url"], pattern="/")
        host = pc.list_element(parts, 2).to_pandas().astype(str)
        df = pd.DataFrame(
            {
                "host": host,
                "url": t["url"].to_pandas().astype(str),
                "warc_ts": t["warc_ts"].to_pandas(),
            }
        )
        out = _first_k(df)
        out = out.assign(
            __b=(
                pd.util.hash_array(out["host"].to_numpy(dtype=object))
                & (num_buckets - 1)
            ).astype(np.int32)
        )
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        return _first_k(group)[["host", "url", "warc_ts"]]

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def host_quality_filter(pages_path: str):
    """C4/RefinedWeb-style DOMAIN-level quality gate: keep hosts whose mean
    page token count is at or above the corpus mean — whole low-quality
    domains (stub/boilerplate farms) drop in one decision instead of
    page-by-page. Output: ``(host, n_pages, mean_tokens)`` for kept hosts.

    Shape: per-block (host, n_pages, sum_tokens) integer partials fold on
    the driver (host-bounded — the HITS-vector discipline; beyond ~10^8
    hosts this becomes one host-bucket exchange). No corpus exchange at
    all; the threshold compare runs on exact-integer ratios so both
    engines make the identical keep/drop decision, and the reported mean
    rounds 6dp half-away (oracle convention).
    """
    import pyarrow.compute as pc

    from ..sources.fs import sized_read_parquet, to_pandas_cols

    ds = sized_read_parquet(pages_path, columns=["url", "text"])

    def partial(t: pa.Table) -> pd.DataFrame:
        parts = pc.split_pattern(t["url"], pattern="/")
        host = parts.combine_chunks() if isinstance(parts, pa.ChunkedArray) else parts
        host = pc.list_element(host, 2).to_pandas().astype(str)
        toks = pc.split_pattern(t["text"], pattern=" ")
        ntok = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame({"host": host, "ntok": ntok})
        g = df.groupby("host", sort=False)["ntok"]
        return g.agg(n_pages="size", sum_tokens="sum").reset_index()

    parts = to_pandas_cols(
        ds.map_batches(partial, batch_format="pyarrow"),
        {"host": "object", "n_pages": "int64", "sum_tokens": "int64"},
    )
    if len(parts) == 0:
        return pd.DataFrame(
            {
                "host": np.array([], dtype=object),
                "n_pages": np.array([], dtype=np.int64),
                "mean_tokens": np.array([], dtype=np.float64),
            }
        )
    h = parts.groupby("host", sort=True).agg(
        n_pages=("n_pages", "sum"), sum_tokens=("sum_tokens", "sum")
    )
    gm = float(h["sum_tokens"].sum()) / float(h["n_pages"].sum())
    m = h["sum_tokens"].to_numpy(np.float64) / h["n_pages"].to_numpy(np.float64)
    keep = m >= gm
    return pd.DataFrame(
        {
            "host": h.index.to_numpy(dtype=object)[keep],
            "n_pages": h["n_pages"].to_numpy(np.int64)[keep],
            "mean_tokens": pa.compute.round(
                pa.array(m[keep]), ndigits=6, round_mode="half_towards_infinity"
            ).to_numpy(zero_copy_only=False),
        }
    )


def host_fetch_gaps(sf_dir: str, *, num_buckets: int | None = None):
    """Per-host crawl-politeness stats: count of fetch records plus the
    min and median inter-fetch gap (seconds) over ALL fetches of the host
    (duplicates included — politeness is about requests, not content).

    One BUCKETED host-hash exchange of slim (host, ts) pairs
    (bucketed-exchange rule); per bucket ONE stable sort + vectorized
    segment diffs + segment-indexed order statistics for every host at
    once (no per-host Python). Gap multisets depend only on the sorted
    timestamp sequence, so timestamp ties need no cross-engine tiebreak;
    µs-integer gaps divide by 1e6 identically on both engines. Hosts with
    a single fetch are excluded (no gap exists)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..sources.fs import sized_read_parquet
    from ..stages.text import fingerprint64
    from .linkgraph import _num_buckets

    nb = num_buckets or _num_buckets()
    ds = sized_read_parquet(sf_dir, columns=["url", "warc_ts"])

    def tag(t: pa.Table) -> pa.Table:
        host = pc.list_element(pc.split_pattern(t["url"], "/"), 2)
        b = (fingerprint64(host) % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {
                "host": host,
                "ts_us": t["warc_ts"].cast(pa.timestamp("us")).cast(pa.int64()),
                "__b": pa.array(b),
            }
        )

    _EMPTY = {
        "host": pd.Series(dtype=object),
        "n_fetches": pd.Series(dtype="int64"),
        "min_gap_s": pd.Series(dtype="float64"),
        "med_gap_s": pd.Series(dtype="float64"),
    }

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["host", "ts_us"], kind="mergesort")
        host = g["host"].to_numpy()
        ts = g["ts_us"].to_numpy(np.int64)
        n = len(ts)
        if n == 0:
            return pd.DataFrame(_EMPTY)
        new = np.r_[True, host[1:] != host[:-1]]
        starts = np.flatnonzero(new)
        counts = np.diff(np.r_[starts, n])
        same = ~new[1:]  # gap i belongs to host iff rows i, i+1 share it
        ghost = host[:-1][same]
        gval = np.diff(ts)[same]
        if len(gval) == 0:
            return pd.DataFrame(_EMPTY)
        # segment order statistics over (host, gap)-sorted gaps
        order = np.lexsort((gval, ghost))
        ghost, gval = ghost[order], gval[order]
        gnew = np.r_[True, ghost[1:] != ghost[:-1]]
        gstarts = np.flatnonzero(gnew)
        gcounts = np.diff(np.r_[gstarts, len(gval)])
        mid = gstarts + gcounts // 2
        med = np.where(
            gcounts % 2 == 1,
            gval[mid].astype(np.float64),
            (gval[np.maximum(mid - 1, 0)].astype(np.float64) + gval[mid]) / 2.0,
        )
        n_fetches = counts[counts >= 2]  # same host order as gap segments
        return pd.DataFrame(
            {
                "host": ghost[gstarts],
                "n_fetches": n_fetches.astype(np.int64),
                "min_gap_s": gval[gstarts].astype(np.float64) / 1_000_000.0,
                "med_gap_s": med / 1_000_000.0,
            }
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(per_bucket, batch_format="pandas")
    )
