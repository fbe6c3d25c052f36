"""Web link-graph family: host edge list, degree stats, PageRank.

A Common-Crawl-style corpus is also a GRAPH — every page's ``<a href>``
anchors induce host→host edges — and the classic corpus-curation signals
(in-degree, PageRank) are graph aggregates over it. This module derives the
host graph from the pages table and computes those signals Ray-Data-first:

- **Edges leave the scan as two int64 columns.** The link extraction kernel
  (`stages/extract.py:extract_links_batch`) is a stateless vectorized map
  over the html buffer; page payloads never enter any exchange in this
  family — everything downstream shuffles integers bounded by the HOST
  graph (≤ |hosts|² pairs, in practice ~E distinct edges), not the corpus.
- **Per-block partials before every groupby** (the repo-wide discipline:
  SURVEY.md §7.4): block-local Arrow/pandas group-counts shrink the
  exchange to near-distinct rows before the shuffle.
- **PageRank is FIXED-POINT integer arithmetic** (``SCALE = 10^12``,
  ``alpha = 17/20``): every share/teleport/damping step is int64 floor
  division, so ranks are bit-identical across engines, block orders,
  retries and cluster sizes — the property that lets a DuckDB unrolled-CTE
  oracle hash-match the distributed run exactly (float summation order
  would not). Total mass stays ≤ SCALE, so ``17 * contrib`` fits int64
  with 5 decimal orders to spare.
- **Iteration state is model-sized, not data-sized** (the `stages/kmeans.py`
  discipline): the rank vector is bounded by the host universe — the
  analogue of k×dim centroids — broadcast via ``ray.put`` once per
  iteration; contributions come back as block-local sparse partials whose
  combined size is host-bounded. The edge dataset (with out-degrees
  attached once) stays distributed and materialized in the object store
  across iterations, exactly like the kmeans E-step corpus. Beyond a
  rank-vector broadcast budget (~10^8 hosts) the iteration would swap to
  a ranks⋈edges bucketed exchange per step; the fixed-point semantics are
  partition-invariant either way, so both paths hash-identically.

Reference analogue: the reference's multi-level derivation chain — each
pyramid level is an aggregate of the previous level's state
(/root/reference/src/eopf_geozarr/conversion/geozarr.py:262-382,
`iterative_copy` level loop); PageRank iterates the same
derive-from-previous-level shape over graph neighborhoods instead of
pixel neighborhoods.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources.fs import sized_read_parquet, to_pandas_cols
from ..stages.extract import extract_links_batch

# Fixed-point PageRank constants — mirrored VERBATIM in the DuckDB oracle
# (__ray_entry__.pagerank_hosts_sql). Changing any of these changes results.
PR_SCALE = 10**12
PR_ALPHA_NUM = 17
PR_ALPHA_DEN = 20


def _num_buckets() -> int:
    """Exchange bucket count, sized to the session: 16x the CPU count,
    floored at 64. Must exceed the Sort operator's partition count (which
    scales with block count ~ 4x CPUs) so every sort partition covers
    >= 1 key — key-less partitions emit schema-less empty bundles that
    bypass user map fns (the repo-wide empty-partition rule). Kept LOW at
    small sessions because Ray's map_groups invokes the UDF once per
    group (~1 ms each). Bucket values only ROUTE rows; results are
    bucket-count-invariant, so sizing this per session is safe."""
    try:
        import ray

        if ray.is_initialized():
            return max(64, int(ray.cluster_resources().get("CPU", 4)) * 16)
    except Exception:  # pragma: no cover
        pass
    return 64


def _hbucket(hosts: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic int32 exchange bucket per host id (splitmix mix so
    consecutive hub ids spread). Grouping on buckets instead of raw host
    keys keeps the final combines VECTORIZED — a raw url-keyed groupby
    over 10^5 distinct keys costs one pandas call each (measured
    120 s -> 4 s on snapshot_diff when bucketed)."""
    from ..hashing import hash_stream

    return (
        hash_stream(np.asarray(hosts, dtype=np.int64).astype(np.uint64), 21)
        % np.uint64(num_buckets)
    ).astype(np.int32)


def _edge_stream(pages_path: str):
    """Exploded (src_host, dst_host) rows — the corpus-side map stage."""
    ds = sized_read_parquet(pages_path, columns=["url", "html"])
    return ds.map_batches(extract_links_batch, batch_format="pyarrow")


def host_links(pages_path: str):
    """Edge multiplicities: ``(src_host, dst_host, n)``.

    Per-block Arrow group-count partials (bounded by distinct pairs per
    block) → one groupby exchange keyed on ``src_host`` → in-group final
    combine. Duplicate urls contribute their anchors per crawl row, same
    as the SQL twin's per-page UNNEST.
    """

    nb = _num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src_host": t["src_host"].to_numpy(),
                "dst_host": t["dst_host"].to_numpy(),
            }
        )
        g = df.groupby(["src_host", "dst_host"], sort=False)
        out = g.size().rename("n").reset_index()
        out["__b"] = _hbucket(out["src_host"].to_numpy(), nb)
        return out

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby(["src_host", "dst_host"], sort=False)
        return g.agg(n=("n", "sum")).reset_index()

    return (
        _edge_stream(pages_path)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def host_degree(pages_path: str):
    """Distinct-edge degrees per host: ``(host, out_deg, in_deg)``.

    Exchange 1 groups raw edges by ``src_host`` — every copy of an edge
    shares its src, so the in-group dedup is globally exact. Each distinct
    edge then emits two tagged degree rows (src: out, dst: in) and
    exchange 2 sums them per host. Both exchanges carry host-graph-bounded
    rows; block-level dedup partials shrink exchange 1 first.
    """

    nb = _num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src_host": t["src_host"].to_numpy(),
                "dst_host": t["dst_host"].to_numpy(),
            }
        )
        df = df.drop_duplicates()
        df["__b"] = _hbucket(df["src_host"].to_numpy(), nb)
        return df

    def distinct_to_degrees(group: pd.DataFrame) -> pd.DataFrame:
        # all copies of (src, *) share src's bucket -> in-bucket dedup exact
        e = group[["src_host", "dst_host"]].drop_duplicates()
        out = e.groupby("src_host", sort=False).size().rename("out_deg")
        out_rows = pd.DataFrame(
            {
                "host": out.index.to_numpy(np.int64),
                "out_deg": out.to_numpy(np.int64),
                "in_deg": np.zeros(len(out), dtype=np.int64),
            }
        )
        inc = e.groupby("dst_host", sort=False).size().rename("in_deg")
        in_rows = pd.DataFrame(
            {
                "host": inc.index.to_numpy(np.int64),
                "out_deg": np.zeros(len(inc), dtype=np.int64),
                "in_deg": inc.to_numpy(np.int64),
            }
        )
        rows = pd.concat([out_rows, in_rows], ignore_index=True)
        rows["__b"] = _hbucket(rows["host"].to_numpy(), nb)
        return rows

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("host", sort=False)
        return g.agg(out_deg=("out_deg", "sum"), in_deg=("in_deg", "sum")).reset_index()

    return (
        _edge_stream(pages_path)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(distinct_to_degrees, batch_format="pandas")
        .groupby("__b")
        .map_groups(final, batch_format="pandas")
    )


def distinct_edges_with_deg(pages_path: str):
    """Distinct edges carrying the src out-degree: ``(src_host, dst_host, d)``.

    One exchange keyed on ``src_host``: dedup and degree are both exact
    within the src group. This is the materialization PageRank re-scans
    every iteration (kmeans-corpus discipline).
    """

    nb = _num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src_host": t["src_host"].to_numpy(),
                "dst_host": t["dst_host"].to_numpy(),
            }
        )
        df = df.drop_duplicates()
        df["__b"] = _hbucket(df["src_host"].to_numpy(), nb)
        return df

    def attach_deg(group: pd.DataFrame) -> pd.DataFrame:
        e = (
            group[["src_host", "dst_host"]]
            .drop_duplicates()
            .reset_index(drop=True)
        )
        d = e.groupby("src_host", sort=False)["dst_host"].transform("size")
        e["d"] = d.to_numpy(np.int64)
        return e

    return (
        _edge_stream(pages_path)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(attach_deg, batch_format="pandas")
    )


def pagerank_hosts(
    pages_path: str,
    *,
    n_iters: int = 5,
    method: str = "broadcast",
    broadcast_node_budget: int = 50_000_000,
    checkpoint_dir: str | None = None,
):
    """Fixed-point PageRank over the distinct host graph.

    Semantics (mirrored exactly by the SQL oracle; all int64 floor
    division)::

        N        = |hosts appearing as src or dst|
        r0(v)    = SCALE // N
        share(s) = r(s) // d(s)                      (d = out-degree)
        contrib(v) = sum of share(s) over in-edges (s, v)
        dang     = sum of r(s) over hosts with no out-edges
        r'(v)    = ((20-17) * (SCALE // N)) // 20
                   + (17 * (contrib(v) + dang // N)) // 20

    Returns a pandas DataFrame ``(host, rank_e12)`` — rank in SCALE units
    as int64 (exactly reproducible; divide by 1e12 for the float view).

    ``method="broadcast"`` (default): the edge dataset (host-graph-bounded)
    is materialized once and re-scanned per iteration with the current rank
    vector broadcast via ``ray.put``; per-block contributions come back as
    sparse int64 partials (``np.add.at`` — exact, no float accumulation)
    and the driver folds them into the next rank vector, holding exactly
    two host-length arrays (the kmeans-centroid bound).

    ``method="exchange"``: the rank vector NEVER lands on the driver — the
    scale path for host universes past the broadcast budget (a real web
    graph has ~10^8 hosts; two f64 vectors of that is fine, but the same
    engine must also rank page-level graphs where it is not). Ranks live
    as a bucketed Dataset co-partitioned with the edges on ``_hbucket``;
    each iteration is two tagged-union bucket exchanges (ranks⋈edges on
    the src bucket → contribution partials routed to the dst bucket →
    next ranks) plus one streaming scalar aggregate for the dangling
    mass. The fixed-point arithmetic makes the two modes BIT-IDENTICAL
    (pinned by tests/test_linkgraph.py), so ``method="auto"`` can pick by
    counting nodes against ``broadcast_node_budget`` without changing
    results.

    ``checkpoint_dir`` (broadcast mode): every completed iteration commits
    ``ranks.npy`` + ``state.json`` atomically (temp + ``os.replace`` — the
    `state/lineage.py` discipline, same as `stages/kmeans.kmeans_fit`); a
    rerun resumes the chain from the last committed iteration instead of
    re-running the corpus-scale extraction work already done. The state
    embeds a GRAPH fingerprint (node count, host-array hash, dangling
    mask, edge count), so a checkpoint from a different or changed corpus
    is invalidated rather than silently resumed. Because the fixed-point
    iteration is a pure chain, a checkpoint written at n_iters=2 validly
    resumes a later n_iters=5 call.
    """
    import ray

    # repartition coalesces the empty blocks key-less sort partitions emit
    # (empty bundles bypass map fns — they can only be removed here)
    edges = distinct_edges_with_deg(pages_path).repartition(32).materialize()
    if method in ("exchange", "auto"):
        node_deg, n_nodes = _node_deg_ds(edges)
        if method == "exchange" or n_nodes > broadcast_node_budget:
            return _pagerank_exchange(edges, node_deg, n_nodes, n_iters)

    # node universe + out-degree lookup (host-graph-bounded collects)
    def node_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": np.union1d(
                    t["src_host"].to_numpy(), t["dst_host"].to_numpy()
                )
            }
        )

    node_parts = to_pandas_cols(
        edges.map_batches(node_partial, batch_format="pyarrow"),
        {"host": "int64"},
    )
    hosts = np.unique(node_parts["host"].to_numpy(np.int64))
    n = len(hosts)
    if n == 0:
        return pd.DataFrame({"host": np.array([], dtype=np.int64),
                             "rank_e12": np.array([], dtype=np.int64)})

    # dangling mask: hosts never seen as src (degree lookup, host-bounded)
    def src_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {"host": np.unique(t["src_host"].to_numpy(zero_copy_only=False))}
        )

    src_hosts = np.unique(
        to_pandas_cols(
            edges.map_batches(src_partial, batch_format="pyarrow"),
            {"host": "int64"},
        )["host"].to_numpy(np.int64)
    )
    dangling = ~np.isin(hosts, src_hosts)

    base = np.int64(PR_SCALE // n)
    tele = np.int64(((PR_ALPHA_DEN - PR_ALPHA_NUM) * int(base)) // PR_ALPHA_DEN)
    ranks = np.full(n, base, dtype=np.int64)
    hosts_ref = ray.put(hosts)

    start_iter = 0
    fingerprint = None
    if checkpoint_dir is not None:
        import hashlib
        import json
        import os

        os.makedirs(checkpoint_dir, exist_ok=True)
        fp = hashlib.sha256()
        fp.update(np.int64(n).tobytes())
        fp.update(hosts.tobytes())
        fp.update(dangling.tobytes())
        fp.update(np.int64(edges.count()).tobytes())
        fingerprint = fp.hexdigest()
        sp = os.path.join(checkpoint_dir, "state.json")
        rp = os.path.join(checkpoint_dir, "ranks.npy")
        if os.path.exists(sp) and os.path.exists(rp):
            with open(sp) as f:
                state = json.load(f)
            if state.get("fingerprint") == fingerprint:
                done = min(int(state["next_iter"]), n_iters)
                if done > 0:
                    ranks = np.load(rp).astype(np.int64)
                    start_iter = done

    def _commit(next_iter: int) -> None:
        if checkpoint_dir is None:
            return
        import json
        import os

        rp = os.path.join(checkpoint_dir, "ranks.npy")
        sp = os.path.join(checkpoint_dir, "state.json")
        np.save(rp + ".tmp.npy", ranks)
        os.replace(rp + ".tmp.npy", rp)
        with open(sp + ".tmp", "w") as f:
            json.dump({"fingerprint": fingerprint, "next_iter": next_iter}, f)
        os.replace(sp + ".tmp", sp)

    for _it in range(start_iter, n_iters):
        ranks_ref = ray.put(ranks)

        def contrib_partial(t: pa.Table) -> pd.DataFrame:
            h = ray.get(hosts_ref)
            r = ray.get(ranks_ref)
            src = t["src_host"].to_numpy(zero_copy_only=False)
            dst = t["dst_host"].to_numpy(zero_copy_only=False)
            d = t["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            share = r[np.searchsorted(h, src)] // d
            dst_u, inv = np.unique(dst, return_inverse=True)
            acc = np.zeros(len(dst_u), dtype=np.int64)
            np.add.at(acc, inv, share)  # exact int64 — no float accumulation
            return pd.DataFrame({"host": dst_u.astype(np.int64), "contrib": acc})

        parts = to_pandas_cols(
            edges.map_batches(contrib_partial, batch_format="pyarrow"),
            {"host": "int64", "contrib": "int64"},
        )
        contrib = np.zeros(n, dtype=np.int64)
        if len(parts):
            idx = np.searchsorted(hosts, parts["host"].to_numpy(np.int64))
            np.add.at(contrib, idx, parts["contrib"].to_numpy(np.int64))
        dang = np.int64(ranks[dangling].sum())
        ranks = tele + (
            np.int64(PR_ALPHA_NUM) * (contrib + dang // np.int64(n))
        ) // np.int64(PR_ALPHA_DEN)
        _commit(_it + 1)

    return pd.DataFrame({"host": hosts.astype(np.int64), "rank_e12": ranks})


def _node_deg_ds(edges):
    """Distributed node universe with out-degrees: Dataset of
    ``(host, d0, __b)`` (d0 = 0 for dangling hosts), plus the node count.
    Built from the distinct-edge dataset with one host-bucket exchange —
    hosts never collect on the driver."""

    nb = _num_buckets()

    def emit(t: pa.Table) -> pd.DataFrame:
        src = t["src_host"].to_numpy(zero_copy_only=False)
        dst = t["dst_host"].to_numpy(zero_copy_only=False)
        rows = pd.DataFrame(
            {
                "host": np.concatenate([src, dst]),
                "one": np.concatenate(
                    [np.ones(len(src), dtype=np.int64),
                     np.zeros(len(dst), dtype=np.int64)]
                ),
            }
        )
        g = rows.groupby("host", sort=False)
        out = g.agg(d0=("one", "sum")).reset_index()
        out["__b"] = _hbucket(out["host"].to_numpy(), nb)
        return out

    def combine(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("host", sort=False)
        out = g.agg(d0=("d0", "sum")).reset_index()
        out["__b"] = _hbucket(out["host"].to_numpy(), nb)
        return out

    # repartition(8) coalesces the empty per-partition blocks Ray's sort
    # emits for key-less partitions — empty bundles bypass map fns entirely,
    # so they can only be removed here, before the dataset is re-scanned
    node_deg = (
        edges.map_batches(emit, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pandas")
        .repartition(8)
        .materialize()
    )
    return node_deg, node_deg.count()


def _pagerank_exchange(edges, node_deg, n: int, n_iters: int):
    """Ranks-as-Dataset PageRank iteration (see `pagerank_hosts` docstring).

    Per iteration: union(ranks, edges) bucketed on the SRC bucket emits
    per-bucket contribution partials routed to the DST bucket; union with
    `node_deg` there produces the next rank rows. All rows are int64
    triples bounded by the host graph; the driver holds only the scalars
    (n, dangling mass, teleport constant). The output collect at the end
    is N-bounded — a 10^8-host production run would `write_parquet` the
    final ranks dataset instead (same pipeline, different sink).
    """

    nb = _num_buckets()
    if n == 0:
        return pd.DataFrame(
            {"host": np.array([], dtype=np.int64),
             "rank_e12": np.array([], dtype=np.int64)}
        )

    base = PR_SCALE // n
    tele = ((PR_ALPHA_DEN - PR_ALPHA_NUM) * base) // PR_ALPHA_DEN

    def init_ranks(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": t["host"].to_numpy(zero_copy_only=False),
                "r": np.full(t.num_rows, base, dtype=np.int64),
                "d0": t["d0"].to_numpy(zero_copy_only=False).astype(np.int64),
                "__b": t["__b"].to_numpy(zero_copy_only=False).astype(np.int32),
            }
        )

    ranks = node_deg.map_batches(init_ranks, batch_format="pyarrow").materialize()

    _EMPTY_CONTRIB = {"host": "int64", "contrib": "int64", "__b": "int32"}

    def rank_side(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "key": t["host"].to_numpy(zero_copy_only=False),
                "dst": np.full(t.num_rows, -1, dtype=np.int64),
                "d": np.zeros(t.num_rows, dtype=np.int64),
                "r": t["r"].to_numpy(zero_copy_only=False),
                "side": np.zeros(t.num_rows, dtype=np.int8),
                "__b": t["__b"].to_numpy(zero_copy_only=False).astype(np.int32),
            }
        )

    def edge_side(t: pa.Table) -> pd.DataFrame:
        src = t["src_host"].to_numpy(zero_copy_only=False)
        return pd.DataFrame(
            {
                "key": src,
                "dst": t["dst_host"].to_numpy(zero_copy_only=False),
                "d": t["d"].to_numpy(zero_copy_only=False).astype(np.int64),
                "r": np.zeros(len(src), dtype=np.int64),
                "side": np.ones(len(src), dtype=np.int8),
                "__b": _hbucket(src, nb),
            }
        )

    def bucket_contrib(group: pd.DataFrame) -> pd.DataFrame:
        rk = group[group["side"] == 0]
        ed = group[group["side"] == 1]
        if len(ed) == 0:
            return pd.DataFrame(
                {k: np.array([], dtype=v) for k, v in _EMPTY_CONTRIB.items()}
            )
        hs = rk["key"].to_numpy(np.int64)
        order = np.argsort(hs, kind="mergesort")
        hs_sorted = hs[order]
        rs_sorted = rk["r"].to_numpy(np.int64)[order]
        src = ed["key"].to_numpy(np.int64)
        share = rs_sorted[np.searchsorted(hs_sorted, src)] // ed["d"].to_numpy(
            np.int64
        )
        dst = ed["dst"].to_numpy(np.int64)
        dst_u, inv = np.unique(dst, return_inverse=True)
        acc = np.zeros(len(dst_u), dtype=np.int64)
        np.add.at(acc, inv, share)
        return pd.DataFrame(
            {"host": dst_u, "contrib": acc, "__b": _hbucket(dst_u, nb)}
        )

    def node_side(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": t["host"].to_numpy(zero_copy_only=False),
                "contrib": np.zeros(t.num_rows, dtype=np.int64),
                "d0": t["d0"].to_numpy(zero_copy_only=False).astype(np.int64),
                "side": np.zeros(t.num_rows, dtype=np.int8),
                "__b": t["__b"].to_numpy(zero_copy_only=False).astype(np.int32),
            }
        )

    def contrib_side(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": t["host"].to_numpy(zero_copy_only=False),
                "contrib": t["contrib"].to_numpy(zero_copy_only=False),
                "d0": np.zeros(t.num_rows, dtype=np.int64),
                "side": np.ones(t.num_rows, dtype=np.int8),
                "__b": t["__b"].to_numpy(zero_copy_only=False).astype(np.int32),
            }
        )

    for _ in range(n_iters):
        # dangling mass: streaming scalar over the ranks dataset, no exchange
        def dang_partial(t: pa.Table) -> pd.DataFrame:
            d0 = t["d0"].to_numpy(zero_copy_only=False)
            r = t["r"].to_numpy(zero_copy_only=False)
            return pd.DataFrame({"s": np.array([r[d0 == 0].sum()], dtype=np.int64)})

        dang = int(
            to_pandas_cols(
                ranks.map_batches(dang_partial, batch_format="pyarrow"),
                {"s": "int64"},
            )["s"].sum()
        )
        contribs = (
            ranks.map_batches(rank_side, batch_format="pyarrow")
            .union(edges.map_batches(edge_side, batch_format="pyarrow"))
            .groupby("__b")
            .map_groups(bucket_contrib, batch_format="pandas")
        )

        dang_n = dang // n

        def next_rank(group: pd.DataFrame) -> pd.DataFrame:
            nodes = group[group["side"] == 0]
            cs = group[group["side"] == 1]
            hs = nodes["host"].to_numpy(np.int64)
            order = np.argsort(hs, kind="mergesort")
            hs_sorted = hs[order]
            contrib = np.zeros(len(hs_sorted), dtype=np.int64)
            if len(cs):
                idx = np.searchsorted(hs_sorted, cs["host"].to_numpy(np.int64))
                np.add.at(contrib, idx, cs["contrib"].to_numpy(np.int64))
            r = tele + (PR_ALPHA_NUM * (contrib + dang_n)) // PR_ALPHA_DEN
            return pd.DataFrame(
                {
                    "host": hs_sorted,
                    "r": r,
                    "d0": nodes["d0"].to_numpy(np.int64)[order],
                    "__b": nodes["__b"].to_numpy(np.int32)[order],
                }
            )

        ranks = (
            node_deg.map_batches(node_side, batch_format="pyarrow")
            .union(contribs.map_batches(contrib_side, batch_format="pyarrow"))
            .groupby("__b")
            .map_groups(next_rank, batch_format="pandas")
            .repartition(8)
            .materialize()
        )

    out = to_pandas_cols(ranks, {"host": "int64", "r": "int64"})
    return pd.DataFrame(
        {
            "host": out["host"].to_numpy(np.int64),
            "rank_e12": out["r"].to_numpy(np.int64),
        }
    )


def two_hop_hosts(pages_path: str):
    """Distinct 2-hop reach per host: ``(host, n_2hop)`` — the number of
    distinct hosts reachable in exactly two edge traversals (a→mid→b,
    self-loops and revisits counted once; b may equal a).

    The self-join co-partitions BOTH sides of the join key (a.dst = b.src)
    in one exchange via the tagged-union trick (`relational.py` hash-join
    discipline): edge (s, d) lands in group d as an IN row and in group s
    as an OUT row; each mid-group emits its in×out cross product
    deduplicated locally, and a second exchange dedups (a, b) pairs
    globally before the per-src count. Every stage is bounded by the host
    graph (≤|hosts|² pairs), never the corpus.
    """

    nb = _num_buckets()

    def tag(t: pa.Table) -> pd.DataFrame:
        src = t["src_host"].to_numpy(zero_copy_only=False)
        dst = t["dst_host"].to_numpy(zero_copy_only=False)
        e = pd.DataFrame({"src_host": src, "dst_host": dst}).drop_duplicates()
        ins = pd.DataFrame(
            {"key": e["dst_host"], "other": e["src_host"],
             "side": np.zeros(len(e), dtype=np.int8)}
        )
        outs = pd.DataFrame(
            {"key": e["src_host"], "other": e["dst_host"],
             "side": np.ones(len(e), dtype=np.int8)}
        )
        rows = pd.concat([ins, outs], ignore_index=True)
        rows["__b"] = _hbucket(rows["key"].to_numpy(), nb)
        return rows

    def cross_mid(group: pd.DataFrame) -> pd.DataFrame:
        # all copies of (x, mid) share mid's bucket -> in-bucket dedup exact
        g = group[["key", "other", "side"]].drop_duplicates()
        a_parts: list[np.ndarray] = []
        b_parts: list[np.ndarray] = []
        for _, mid in g.groupby("key", sort=False):
            a = np.unique(mid.loc[mid["side"] == 0, "other"].to_numpy(np.int64))
            b = np.unique(mid.loc[mid["side"] == 1, "other"].to_numpy(np.int64))
            if len(a) and len(b):
                a_parts.append(np.repeat(a, len(b)))
                b_parts.append(np.tile(b, len(a)))
        if not a_parts:
            return pd.DataFrame(
                {
                    "a": np.array([], dtype=np.int64),
                    "b": np.array([], dtype=np.int64),
                    "__b2": np.array([], dtype=np.int32),
                }
            )
        out = pd.DataFrame(
            {"a": np.concatenate(a_parts), "b": np.concatenate(b_parts)}
        ).drop_duplicates()
        out["__b2"] = _hbucket(out["a"].to_numpy(), nb)
        return out

    def count_per_src(group: pd.DataFrame) -> pd.DataFrame:
        g = group[["a", "b"]].drop_duplicates()
        out = g.groupby("a", sort=False).size().rename("n_2hop").reset_index()
        return out.rename(columns={"a": "host"})

    return (
        _edge_stream(pages_path)
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(cross_mid, batch_format="pandas")
        .groupby("__b2")
        .map_groups(count_per_src, batch_format="pandas")
    )


def build_host_graph(pages_path: str, out_dir: str, *, num_buckets: int = 16) -> dict:
    """Materialize the distinct host graph (src_host, dst_host, d) as a
    RESUMABLE bucketed parquet store — the link-graph family's durable
    output, written through the lineage layer (`state/lineage.py`): one
    atomically-committed partition per src-hash bucket, each carrying a
    fingerprinted lineage record and row counters. A re-run skips valid
    partitions; a deleted or corrupted partition rebuilds ALONE — the
    north rule's resume-from-checkpoint contract applied to graph
    extraction, so a 100 TB crawl's edge scan never repeats finished
    work. Returns the resumable-write summary.

    The fingerprint binds the output to the INPUT (pages row count +
    total bytes) and the bucket layout, so a changed corpus invalidates
    stale partitions instead of silently mixing builds (the invindex
    store discipline, `pipelines/invindex.py`).
    """
    import glob
    import os

    import pyarrow.parquet as pq

    from ..state.lineage import resumable_write

    files = (
        sorted(glob.glob(os.path.join(pages_path, "*.parquet")))
        if os.path.isdir(pages_path)
        else [pages_path]
    )
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    n_bytes = sum(os.path.getsize(f) for f in files)
    fp = f"hostgraph:v1:rows={n_rows}:bytes={n_bytes}:buckets={num_buckets}"

    def rebucket(t: pa.Table) -> pa.Table:
        src = t["src_host"].to_numpy(zero_copy_only=False)
        b = _hbucket(src, num_buckets)
        return t.drop_columns(["__b"]).append_column(
            "bucket", pa.array(b, type=pa.int32())
        ) if "__b" in t.column_names else t.append_column(
            "bucket", pa.array(b, type=pa.int32())
        )

    edges = distinct_edges_with_deg(pages_path).map_batches(
        rebucket, batch_format="pyarrow"
    )
    return resumable_write(edges, out_dir, partition_col="bucket", fingerprint=fp)


def read_host_graph(out_dir: str):
    """Read back a `build_host_graph` store as one Dataset."""
    from ..state.lineage import read_output

    return read_output(out_dir)


def _graph_hosts(edges):
    """Sorted node universe of a distinct-edge dataset (host-bounded collect)."""

    def node_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "host": np.union1d(
                    t["src_host"].to_numpy(), t["dst_host"].to_numpy()
                )
            }
        )

    parts = to_pandas_cols(
        edges.map_batches(node_partial, batch_format="pyarrow"), {"host": "int64"}
    )
    return np.unique(parts["host"].to_numpy(np.int64))


def _edge_accumulate(edges, hosts, vec, *, from_col, to_col, reduce, empty):
    """One distributed edge pass: for every edge, take ``vec[from]`` and
    fold it into the ``to`` endpoint (``reduce`` = "sum" | "min", int64
    exact). Per-block pre-aggregated partials (np.add.at / np.minimum.at)
    come back host-bounded and fold into a fresh host-length vector
    initialized to ``empty`` — the pagerank-broadcast iteration shape,
    shared by HITS and BFS."""
    import ray

    hosts_ref = ray.put(hosts)
    vec_ref = ray.put(vec)

    def partial(t: pa.Table) -> pd.DataFrame:
        h = ray.get(hosts_ref)
        v = ray.get(vec_ref)
        src = t[from_col].to_numpy(zero_copy_only=False)
        dst = t[to_col].to_numpy(zero_copy_only=False)
        vals = v[np.searchsorted(h, src)]
        dst_u, inv = np.unique(dst, return_inverse=True)
        if reduce == "sum":
            acc = np.zeros(len(dst_u), dtype=np.int64)
            np.add.at(acc, inv, vals)
        else:
            acc = np.full(len(dst_u), empty, dtype=np.int64)
            np.minimum.at(acc, inv, vals)
        return pd.DataFrame({"host": dst_u.astype(np.int64), "acc": acc})

    parts = to_pandas_cols(
        edges.map_batches(partial, batch_format="pyarrow"),
        {"host": "int64", "acc": "int64"},
    )
    out = np.full(len(hosts), empty, dtype=np.int64)
    if len(parts):
        idx = np.searchsorted(hosts, parts["host"].to_numpy(np.int64))
        if reduce == "sum":
            np.add.at(out, idx, parts["acc"].to_numpy(np.int64))
        else:
            np.minimum.at(out, idx, parts["acc"].to_numpy(np.int64))
    return out


def hits_hosts(pages_path: str, *, n_rounds: int = 2):
    """Raw-sum HITS after ``n_rounds`` alternating rounds: ``(host, auth,
    hub)`` with ``h0 = 1``, ``a_k(v) = Σ h_{k-1}(s) over in-edges``,
    ``h_k(u) = Σ a_k(w) over out-edges`` — NO normalization, so every
    value is an exact int64 and the DuckDB join-chain oracle matches
    hash-for-hash (normalized HITS needs sqrt — float summation order
    would break cross-engine equality).

    Magnitude bound (documented like the substring gram-hash bound):
    values grow ≤ max_degree^(2k); at the default 2 rounds int64 is exact
    for max degree ≤ ~10^4. Production at web scale would rescale (shift
    right) between rounds — same partition shape, different constants.
    """
    edges = distinct_edges_with_deg(pages_path).repartition(32).materialize()
    hosts = _graph_hosts(edges)
    if len(hosts) == 0:
        return pd.DataFrame(
            {
                "host": np.array([], dtype=np.int64),
                "auth": np.array([], dtype=np.int64),
                "hub": np.array([], dtype=np.int64),
            }
        )
    hub = np.ones(len(hosts), dtype=np.int64)
    auth = np.zeros(len(hosts), dtype=np.int64)
    for _ in range(n_rounds):
        auth = _edge_accumulate(
            edges, hosts, hub, from_col="src_host", to_col="dst_host",
            reduce="sum", empty=0,
        )
        hub = _edge_accumulate(
            edges, hosts, auth, from_col="dst_host", to_col="src_host",
            reduce="sum", empty=0,
        )
    return pd.DataFrame({"host": hosts, "auth": auth, "hub": hub})


BFS_UNREACHED = np.int64(1 << 40)  # sentinel far above any real distance


def bfs_levels(pages_path: str, *, source_host: int = 0, max_hops: int = 4):
    """Directed BFS levels from ``source_host``: ``(host, dist)`` for every
    host reachable in ≤ ``max_hops`` edge traversals. Each hop is one
    distributed edge pass folding ``dist[src] + 1`` into dst with an
    int64 MIN — exact, partition-invariant, and replayable as an unrolled
    LEAST/MIN CTE chain in SQL.
    """
    edges = distinct_edges_with_deg(pages_path).repartition(32).materialize()
    hosts = _graph_hosts(edges)
    if len(hosts) == 0:
        return pd.DataFrame(
            {
                "host": np.array([], dtype=np.int64),
                "dist": np.array([], dtype=np.int64),
            }
        )
    dist = np.full(len(hosts), BFS_UNREACHED, dtype=np.int64)
    src_idx = np.searchsorted(hosts, source_host)
    if src_idx < len(hosts) and hosts[src_idx] == source_host:
        dist[src_idx] = 0
    for _ in range(max_hops):
        step = _edge_accumulate(
            edges, hosts, dist + 1, from_col="src_host", to_col="dst_host",
            reduce="min", empty=BFS_UNREACHED,
        )
        dist = np.minimum(dist, step)
    keep = dist < BFS_UNREACHED
    return pd.DataFrame({"host": hosts[keep], "dist": dist[keep]})


def rank_filtered_lang_counts(pages_path: str):
    """Apply the graph signal back to the corpus: per-lang page counts
    over ABOVE-UNIFORM hosts (final PageRank ≥ SCALE // N — hosts that
    gained rank). The canonical curation shape: a model computed once
    from the corpus (host ranks, N-bounded) broadcasts via ``ray.put``
    and the corpus streams through a single lookup/filter/partial-count
    map — pages never shuffle; the only exchange carries (lang, n)
    partials. Returns ``(lang, n_pages)``.
    """
    import pyarrow.compute as pc
    import ray

    from ..stages.extract import _URL_HOST_PATTERN

    ranks = pagerank_hosts(pages_path)
    hosts = ranks["host"].to_numpy(np.int64)
    n = len(hosts)
    if n == 0:
        return pd.DataFrame(
            {"lang": np.array([], dtype=object), "n_pages": np.array([], np.int64)}
        )
    keep_hosts = hosts[ranks["rank_e12"].to_numpy(np.int64) >= PR_SCALE // n]
    keep_ref = ray.put(np.sort(keep_hosts))

    ds = sized_read_parquet(pages_path, columns=["url", "lang"])

    def partial(t: pa.Table) -> pd.DataFrame:
        kh = ray.get(keep_ref)
        h = pc.cast(
            pc.struct_field(pc.extract_regex(t["url"], _URL_HOST_PATTERN), "h"),
            pa.int64(),
        ).to_numpy(zero_copy_only=False)
        if len(kh) == 0:
            keep = np.zeros(len(h), dtype=bool)
        else:
            pos = np.clip(np.searchsorted(kh, h), 0, len(kh) - 1)
            keep = kh[pos] == h
        df = pd.DataFrame({"lang": t["lang"].to_pandas()[keep]})
        g = df.groupby("lang", sort=False)
        return g.size().rename("n_pages").reset_index()

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("lang", sort=False)
        return g.agg(n_pages=("n_pages", "sum")).reset_index()

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


def undirected_edges(pages_path: str):
    """Distinct UNDIRECTED host edges ``(a, b)`` with ``a < b`` (self-loops
    dropped). One exchange bucketed on ``a`` — every directed copy of an
    undirected edge canonicalizes to the same (a, b), so the in-bucket
    dedup is globally exact. Per-block dedup partials shrink the exchange
    first (the repo-wide discipline)."""
    nb = _num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        s = t["src_host"].to_numpy(zero_copy_only=False).astype(np.int64)
        d = t["dst_host"].to_numpy(zero_copy_only=False).astype(np.int64)
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        keep = a != b
        df = pd.DataFrame({"a": a[keep], "b": b[keep]}).drop_duplicates()
        df["__b"] = _hbucket(df["a"].to_numpy(), nb)
        return df

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group[["a", "b"]].drop_duplicates()

    return (
        _edge_stream(pages_path)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(dedup, batch_format="pandas")
    )


def triangle_hosts(pages_path: str):
    """Per-host triangle participation counts over the undirected host
    graph: ``(host, n_tri)`` — each triangle {u, v, w} increments all three
    corners; triangle-free hosts are absent (matching the SQL twin).

    Distributed shape (Schank–Wagner / Latapy degree orientation):

    1. distinct undirected edges (one bucketed exchange, above);
    2. undirected degrees fold into a host-length vector on the driver
       (host-bounded, the PageRank rank-vector budget) and broadcast via
       ``ray.put``;
    3. each edge orients from its (deg, id)-smaller endpoint — wedge
       fan-out is then bounded by sum-of-C(out_deg⁺, 2) = O(E^1.5)
       TOTAL regardless of hub skew, the property that makes triangle
       counting survive a power-law web graph (id-orientation would be
       quadratic in the hub in-degree);
    4. wedges (v, w | u) generate per src-bucket with a vectorized
       offset-scan (a loop over the max ORIENTED degree, each step fully
       vectorized — never a per-node Python loop);
    5. wedges and oriented edges co-partition on the (v, w) pair hash in
       ONE tagged-union exchange; an in-bucket merge closes triangles;
    6. per-corner count partials ride one final host-bucket exchange.

    Every exchange carries host-graph-bounded int64 rows; page payloads
    never shuffle (they end at the anchor-extraction scan).
    """
    return _triangles(pages_path)[2]


def _triangles(pages_path: str):
    """Shared triangle machinery: returns ``(hosts, deg, tri)`` — the sorted
    host universe, its undirected-degree vector, and the per-host triangle
    count result (a lazy Dataset, or an empty DataFrame on an empty graph).
    See ``triangle_hosts`` for the distributed shape."""
    import ray

    nb = _num_buckets()
    edges = undirected_edges(pages_path).repartition(8).materialize()

    # undirected degree vector (host-bounded driver fold, = the PageRank
    # rank-vector discipline; beyond ~10^8 hosts this becomes a bucketed
    # join, same as pagerank's method="exchange"). Every node of the
    # undirected graph carries deg >= 1, so ONE pass yields both the host
    # universe and the degrees.
    def deg_partial(t: pa.Table) -> pd.DataFrame:
        both = np.concatenate([t["a"].to_numpy(), t["b"].to_numpy()]).astype(np.int64)
        u, c = np.unique(both, return_counts=True)
        return pd.DataFrame({"host": u, "acc": c.astype(np.int64)})

    dparts = to_pandas_cols(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        {"host": "int64", "acc": "int64"},
    )
    hosts = np.unique(dparts["host"].to_numpy(np.int64))
    empty = pd.DataFrame(
        {"host": np.array([], dtype=np.int64), "n_tri": np.array([], dtype=np.int64)}
    )
    if len(hosts) == 0:
        return hosts, np.array([], dtype=np.int64), empty
    deg = np.zeros(len(hosts), dtype=np.int64)
    np.add.at(
        deg,
        np.searchsorted(hosts, dparts["host"].to_numpy(np.int64)),
        dparts["acc"].to_numpy(np.int64),
    )
    hosts_ref = ray.put(hosts)
    deg_ref = ray.put(deg)

    def orient(t: pa.Table) -> pd.DataFrame:
        """(deg, id)-orientation + src-bucket tag for the wedge exchange."""
        h = ray.get(hosts_ref)
        dg = ray.get(deg_ref)
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        da = dg[np.searchsorted(h, a)]
        db = dg[np.searchsorted(h, b)]
        a_first = (da < db) | ((da == db) & (a < b))
        src = np.where(a_first, a, b)
        dst = np.where(a_first, b, a)
        out = pd.DataFrame({"src": src, "dst": dst})
        out["__b"] = _hbucket(src, nb)
        return out

    oriented = (
        edges.map_batches(orient, batch_format="pyarrow")
        .repartition(8)
        .materialize()
    )

    def _pair_bucket(v: np.ndarray, w: np.ndarray) -> np.ndarray:
        from ..hashing import hash_stream

        mixed = hash_stream(v.astype(np.uint64), 33) ^ hash_stream(
            w.astype(np.uint64), 47
        )
        return (mixed % np.uint64(nb)).astype(np.int32)

    def wedges(group: pd.DataFrame) -> pd.DataFrame:
        h = ray.get(hosts_ref)
        dg = ray.get(deg_ref)
        src = group["src"].to_numpy(np.int64)
        dst = group["dst"].to_numpy(np.int64)
        # sort by (src, rank(dst)) so within-segment pairs come out
        # rank-ordered (v before w), matching the oriented closing edge
        dr = dg[np.searchsorted(h, dst)]
        order = np.lexsort((dst, dr, src))
        src, dst = src[order], dst[order]
        n = len(src)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = src[1:] != src[:-1]
        segid = np.cumsum(new) - 1
        starts = np.flatnonzero(new)
        k = np.diff(np.append(starts, n))[segid]
        pos = np.arange(n) - starts[segid]
        vs, ws, us = [], [], []
        dmax = int(k.max()) if n else 0
        for d in range(1, dmax):
            idx = np.flatnonzero(pos + d < k)
            if len(idx) == 0:
                break
            vs.append(dst[idx])
            ws.append(dst[idx + d])
            us.append(src[idx])
        if not vs:
            return pd.DataFrame(
                {
                    "v": np.array([], dtype=np.int64),
                    "w": np.array([], dtype=np.int64),
                    "u": np.array([], dtype=np.int64),
                    "side": np.array([], dtype=np.int8),
                    "__pb": np.array([], dtype=np.int32),
                }
            )
        v = np.concatenate(vs)
        w = np.concatenate(ws)
        u = np.concatenate(us)
        return pd.DataFrame(
            {
                "v": v,
                "w": w,
                "u": u,
                "side": np.ones(len(v), dtype=np.int8),
                "__pb": _pair_bucket(v, w),
            }
        )

    wedge_ds = oriented.groupby("__b").map_groups(wedges, batch_format="pandas")

    def edge_side(t: pa.Table) -> pd.DataFrame:
        v = t["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pd.DataFrame(
            {
                "v": v,
                "w": w,
                "u": np.full(len(v), -1, dtype=np.int64),
                "side": np.zeros(len(v), dtype=np.int8),
                "__pb": _pair_bucket(v, w),
            }
        )

    both = wedge_ds.union(oriented.map_batches(edge_side, batch_format="pyarrow"))

    def close(group: pd.DataFrame) -> pd.DataFrame:
        e = group.loc[group["side"] == 0, ["v", "w"]]
        wd = group.loc[group["side"] == 1, ["v", "w", "u"]]
        if len(e) == 0 or len(wd) == 0:
            return pd.DataFrame(
                {"host": np.array([], np.int64), "n": np.array([], np.int64)}
            )
        m = wd.merge(e, on=["v", "w"])  # matched wedges ARE the triangles
        corners = np.concatenate(
            [m["u"].to_numpy(np.int64), m["v"].to_numpy(np.int64), m["w"].to_numpy(np.int64)]
        )
        hu, cnt = np.unique(corners, return_counts=True)
        return pd.DataFrame({"host": hu, "n": cnt.astype(np.int64)})

    def final(group: pd.DataFrame) -> pd.DataFrame:
        g = group.groupby("host", sort=False)
        return g.agg(n_tri=("n", "sum")).reset_index()

    # the per-corner partials are HOST-bounded (<= |hosts| rows per bucket
    # task) — one single-task combine beats a third all-to-all exchange
    # (the value_histogram discipline); at a >10^8-host scale this becomes
    # a host-bucket groupby again
    tri = (
        both.groupby("__pb")
        .map_groups(close, batch_format="pandas")
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )
    return hosts, deg, tri


def clustering_coef_hosts(pages_path: str):
    """Local clustering coefficient per host with undirected degree >= 2:
    ``coef = 2 * triangles / (deg * (deg - 1))``, 6dp half-away rounding
    (the oracle convention) — the classic graph-quality signal (spam/link
    farms cluster; organic hubs don't).

    Rides the ``triangle_hosts`` machinery unchanged; the final fold joins
    the host-bounded triangle counts against the degree vector on the
    driver (the HITS-vector discipline — host-bounded, never corpus-sized).
    Degree-1 / isolated hosts are excluded (coefficient undefined), hosts
    in no triangle emit 0.
    """
    hosts, deg, tri = _triangles(pages_path)
    empty = pd.DataFrame(
        {"host": np.array([], dtype=np.int64), "coef": np.array([], np.float64)}
    )
    if len(hosts) == 0:
        return empty
    tdf = (
        tri
        if isinstance(tri, pd.DataFrame)
        else to_pandas_cols(tri, {"host": "int64", "n_tri": "int64"})
    )
    ntri = np.zeros(len(hosts), dtype=np.int64)
    if len(tdf):
        ntri[np.searchsorted(hosts, tdf["host"].to_numpy(np.int64))] = tdf[
            "n_tri"
        ].to_numpy(np.int64)
    keep = deg >= 2
    if not keep.any():
        return empty
    import pyarrow.compute as pc

    coef = 2.0 * ntri[keep] / (deg[keep] * (deg[keep] - 1))
    return pd.DataFrame(
        {
            "host": hosts[keep],
            "coef": pc.round(
                pa.array(coef), ndigits=6, round_mode="half_towards_infinity"
            ).to_numpy(zero_copy_only=False),
        }
    )


def host_reciprocity(pages_path: str):
    """Per-host link reciprocity: distinct out-degree (self-loops
    excluded) and how many of those out-edges are reciprocated — the
    mutual-link structure metric beside degree/triangles/PageRank.

    Distinct edges derive exactly like ``host_degree`` (src-bucketed
    exchange, in-bucket dedup is globally exact); the bounded distinct
    edge table then gathers once (the pagerank broadcast-mode bound — a
    10^8-host graph would swap this final for a dst-bucketed semi-join,
    same as pagerank method="exchange") and reciprocity is one vectorized
    searchsorted membership test of (v,u) keys in the sorted (u,v) keys.
    All-integer output.
    """
    from ..sources.fs import to_pandas_cols

    nb = _num_buckets()

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "src_host": t["src_host"].to_numpy(),
                "dst_host": t["dst_host"].to_numpy(),
            }
        )
        df = df[df["src_host"] != df["dst_host"]].drop_duplicates()
        df["__b"] = _hbucket(df["src_host"].to_numpy(), nb)
        return df

    def dedup_bucket(group: pd.DataFrame) -> pd.DataFrame:
        return group[["src_host", "dst_host"]].drop_duplicates()

    edges = to_pandas_cols(
        _edge_stream(pages_path)
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(dedup_bucket, batch_format="pandas"),
        {"src_host": "int64", "dst_host": "int64"},
    )
    if edges.empty:
        return pd.DataFrame(
            {
                "host": pd.Series(dtype="int64"),
                "out_deg": pd.Series(dtype="int64"),
                "reciprocated": pd.Series(dtype="int64"),
            }
        )
    u = edges["src_host"].to_numpy(np.int64)
    v = edges["dst_host"].to_numpy(np.int64)
    key = (u.astype(np.uint64) << np.uint64(32)) | v.astype(np.uint64)
    skey = np.sort(key)
    rkey = (v.astype(np.uint64) << np.uint64(32)) | u.astype(np.uint64)
    pos = np.clip(np.searchsorted(skey, rkey), 0, len(skey) - 1)
    recip = (skey[pos] == rkey).astype(np.int64)
    df = pd.DataFrame({"host": u, "r": recip})
    agg = df.groupby("host", sort=True)["r"].agg(out_deg="size", reciprocated="sum")
    out = agg.reset_index()
    return out.astype(
        {"host": np.int64, "out_deg": np.int64, "reciprocated": np.int64}
    )
