"""Iterative distributed graph algorithms over Ray Data.

``connected_components`` is the near-dup *cluster formation* step a
training-data pipeline runs after pair generation (MinHash / exact
Jaccard): duplicate PAIRS become duplicate GROUPS (keep one doc per
component). The algorithm is min-label propagation — each round every
node adopts the smallest label among itself and its neighbours, which
converges in O(graph diameter) rounds (duplicate clusters are
shallow — near-clique — so convergence is fast).

Scale shape: the edge table (bounded by the candidate-pair count, not
the corpus) is materialized once; every round costs two bounded
hash-bucket exchanges (edges join labels on src; min-combine on dst) and
the convergence check is an algebraic label-sum — one small partial per
block, never a driver-side collect of the label table. The reference has
no iterative operator; this extends the engine's operator families per
the task brief (dedup at 100 TB needs grouping, not just pairing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _bucket(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    h = (keys.astype(np.uint64) * np.uint64(2654435761)) & np.uint64(0xFFFFFFFF)
    return (h % np.uint64(num_buckets)).astype(np.int32)


def _local_cc_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Exact connected components of one edge block, fully vectorized:
    iterated min-label over the block's edges with pointer jumping
    (O(log n) numpy passes). Returns the contraction mapping
    (src=node, dst=component-min-node) — the same schema as an edge
    list, so mappings from several blocks can be re-merged by running
    this kernel again on their union."""
    src = df["src"].to_numpy(np.int64)
    dst = df["dst"].to_numpy(np.int64)
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    si, di = inv[: len(src)], inv[len(src):]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        nxt = lab.copy()
        np.minimum.at(nxt, si, lab[di])
        np.minimum.at(nxt, di, lab[si])
        nxt = nxt[nxt]
        nxt = nxt[nxt]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    return pd.DataFrame({"src": nodes, "dst": nodes[lab]})


def connected_components(
    pairs,
    *,
    col_a: str = "doc_a",
    col_b: str = "doc_b",
    method: str = "contract",
    num_buckets: int = 32,
    max_iters: int = 64,
    fan_in: int = 4,
    contract_row_budget: int = 5_000_000,
):
    """Pairs Dataset (a, b) -> Dataset (doc_id, cluster_id) where
    ``cluster_id`` is the minimum node id in the node's component.
    Only nodes appearing in at least one pair are emitted (singletons
    are trivially their own cluster and would dominate output size).

    ``method="contract"`` (default): hierarchical contraction — each
    block reduces its edges to a (node -> min-node) mapping via the
    vectorized local kernel, mappings merge ``fan_in``-at-a-time through
    cheap ``repartition`` rounds (no sort exchange) until one block holds
    the global mapping. Exact, O(log_fan_in(blocks)) rounds; the final
    merge sees one row per dup-involved node, so it assumes that mapping
    fits one worker (true whenever dup pairs are sparse relative to the
    corpus — the normal web-dedup regime). If the contracted mapping
    exceeds ``contract_row_budget`` rows, the final one-worker merge is
    SKIPPED and the mapping finishes through bucketed propagation
    automatically — callers never have to know the dup density up front.

    ``method="propagate"``: bucketed min-label propagation, two bounded
    hash exchanges per round, O(diameter) rounds — nothing ever needs to
    fit in one place; the unbounded-scale fallback (also the auto-chosen
    finish when contract mode overflows its budget).
    """
    if method == "contract":
        m = pairs.map_batches(
            lambda t: pd.DataFrame(
                {
                    "src": t[col_a].to_numpy(zero_copy_only=False).astype(np.int64),
                    "dst": t[col_b].to_numpy(zero_copy_only=False).astype(np.int64),
                }
            ),
            batch_format="pyarrow",
        ).map_batches(_local_cc_frame, batch_format="pandas", batch_size=None)
        m = (
            m.repartition(fan_in)
            .map_batches(_local_cc_frame, batch_format="pandas", batch_size=None)
            .materialize()
        )
        if m.count() > contract_row_budget:
            # the contracted (node -> block-min) mapping is itself an edge
            # list whose components equal the original graph's, so the
            # bucketed propagation finishes it without any one-worker step
            return connected_components(
                m,
                col_a="src",
                col_b="dst",
                method="propagate",
                num_buckets=num_buckets,
                max_iters=max_iters,
            )
        m = m.repartition(1).map_batches(
            _local_cc_frame, batch_format="pandas", batch_size=None
        )
        return m.map_batches(
            lambda df: pd.DataFrame(
                {
                    "doc_id": df["src"].to_numpy(np.int64),
                    "cluster_id": df["dst"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )

    def expand(t: pa.Table) -> pd.DataFrame:
        a = t[col_a].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t[col_b].to_numpy(zero_copy_only=False).astype(np.int64)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        return pd.DataFrame(
            {"src": src, "dst": dst, "bucket": _bucket(src, num_buckets)}
        )

    # undirected edge list, bucketed by src; materialized once (bounded
    # by the candidate-pair count) and reused every round
    edges = pairs.map_batches(expand, batch_format="pyarrow").materialize()

    def init_labels(df: pd.DataFrame) -> pd.DataFrame:
        nodes = df["src"].drop_duplicates()
        return pd.DataFrame(
            {
                "node": nodes.to_numpy(np.int64),
                "lab": nodes.to_numpy(np.int64),
                "bucket": _bucket(nodes.to_numpy(np.int64), num_buckets),
            }
        )

    def dedupe_nodes(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates("node")

    labels = (
        edges.map_batches(init_labels, batch_format="pandas")
        .groupby("bucket")
        .map_groups(dedupe_nodes, batch_format="pandas")
        .materialize()
    )

    def label_sum(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"s": [np.int64(df["lab"].sum())]})

    def total(ds) -> int:
        return int(ds.map_batches(label_sum, batch_format="pandas").to_pandas()["s"].sum())

    prev_sum = total(labels)
    for _ in range(max_iters):
        # round part 1: neighbours' labels — join labels to edges on src
        # (both sides already carry the same src bucket; label rows use
        # lab >= 0, edge rows the -1 sentinel, keeping one flat schema)
        def join_src(g: pd.DataFrame) -> pd.DataFrame:
            is_lab = g["lab"] >= 0
            lab = g[is_lab][["src", "lab"]]
            e = g[~is_lab][["src", "dst"]]
            m = e.merge(lab, on="src", how="inner")
            out = pd.DataFrame(
                {
                    "node": m["dst"].to_numpy(np.int64),
                    "lab": m["lab"].to_numpy(np.int64),
                }
            )
            out["bucket"] = _bucket(out["node"].to_numpy(np.int64), num_buckets)
            return out

        lab_as_edges = labels.map_batches(
            lambda df: pd.DataFrame(
                {
                    "src": df["node"].to_numpy(np.int64),
                    "dst": np.full(len(df), -1, dtype=np.int64),
                    "bucket": df["bucket"].to_numpy(np.int32),
                    "lab": df["lab"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        )

        # shortcut edges (node <-> current label, where different): lets a
        # node adopt lab[lab[node]] next round — pointer jumping, so the
        # round count is O(log diameter) instead of O(diameter)
        def mk_shortcut(df: pd.DataFrame) -> pd.DataFrame:
            n = df["node"].to_numpy(np.int64)
            l = df["lab"].to_numpy(np.int64)
            keep = n != l
            n, l = n[keep], l[keep]
            src = np.concatenate([n, l])
            dst = np.concatenate([l, n])
            return pd.DataFrame(
                {
                    "src": src,
                    "dst": dst,
                    "bucket": _bucket(src, num_buckets),
                    "lab": np.full(len(src), -1, dtype=np.int64),
                }
            )

        shortcut = labels.map_batches(mk_shortcut, batch_format="pandas")
        edges_tagged = edges.map_batches(
            lambda df: df.assign(lab=np.full(len(df), -1, dtype=np.int64)),
            batch_format="pandas",
        )
        prop = (
            edges_tagged.union(lab_as_edges, shortcut)
            .groupby("bucket")
            .map_groups(join_src, batch_format="pandas")
        )

        # round part 2: min(own label, neighbour labels) per node
        def min_combine(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("node", sort=False)["lab"].min().reset_index()
            out["bucket"] = _bucket(out["node"].to_numpy(np.int64), num_buckets)
            return out

        # repartition pins the label table's block count: sort-shuffle
        # output partitioning equals its input block count, so without it
        # each round's union (labels + prop) compounds ~3x blocks/round —
        # task-count explosion, observed 1.9s -> 121s by round 4
        labels = (
            labels.select_columns(["node", "lab", "bucket"])
            .union(prop)
            .groupby("bucket")
            .map_groups(min_combine, batch_format="pandas")
            .repartition(min(num_buckets, 8))
            .materialize()
        )
        cur = total(labels)
        if cur == prev_sum:
            break
        prev_sum = cur

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": df["node"].to_numpy(np.int64),
                "cluster_id": df["lab"].to_numpy(np.int64),
            }
        )

    return labels.map_batches(finish, batch_format="pandas")


def keep_one_per_cluster(
    docs,
    comps,
    *,
    id_col: str = "doc_id",
    method: str = "broadcast",
    broadcast_row_budget: int = 5_000_000,
    num_buckets: int = 32,
):
    """Near-dup DEDUP: drop every component member except its min-id
    representative; docs in no component pass through untouched.

    ``method="broadcast"`` (default): the loser set — bounded by the
    number of dup-involved docs, sparse relative to the corpus in the web
    regime — is pulled once, broadcast via ``ray.put``, and the corpus
    streams through a single ``map_batches`` ``is_in`` filter: no shuffle
    of the corpus, no per-batch re-ship of the set.

    ``method="join"``: on a heavy-dup crawl (30-50% dups) the loser set
    approaches corpus scale and must not land on the driver — a bucketed
    anti-join on ``id_col`` shuffles the corpus ONCE against the loser
    ids instead (same discipline as ``webtext.substring_spans``'s join
    path). ``method="auto"`` counts the loser table (cheap: ids only,
    bounded by comps) and picks join when it exceeds
    ``broadcast_row_budget``.
    """
    import pyarrow.compute as pc
    import ray

    losers = comps.map_batches(
        lambda t: t.filter(
            pc.not_equal(t["doc_id"], t["cluster_id"])
        ).select(["doc_id"]),
        batch_format="pyarrow",
    )
    if method == "auto":
        losers = losers.materialize()
        method = "join" if losers.count() > broadcast_row_budget else "broadcast"
    if method == "join":
        return _keep_join_path(docs, losers, id_col, num_buckets)
    if method != "broadcast":
        raise ValueError(f"unknown method: {method!r}")
    loser_df = losers.to_pandas()
    # a dup-free corpus yields an empty, schema-less frame — no losers
    loser_ids = (
        np.unique(loser_df["doc_id"].to_numpy(np.int64))
        if "doc_id" in loser_df.columns
        else np.array([], dtype=np.int64)
    )  # bounded: dup-involved non-representatives only
    ref = ray.put(pa.array(loser_ids, type=pa.int64()))

    def keep(t: pa.Table) -> pa.Table:
        value_set = ray.get(ref)  # zero-copy read from the object store
        return t.filter(
            pc.invert(
                pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=value_set)
            )
        )

    return docs.map_batches(keep, batch_format="pyarrow")


def _keep_join_path(docs, losers, id_col: str, num_buckets: int):
    """Bucketed anti-join: docs and loser ids co-partition on the id hash;
    each bucket drops its loser rows locally. The corpus crosses ONE
    exchange (the cost of not broadcasting); loser rows are ids only.

    Rows are unioned under the docs schema (loser rows null-padded) so one
    groupby serves both sides; the output is cast back to the exact input
    schema because the pandas group stage would otherwise float-ify int
    columns that saw the loser rows' nulls.
    """
    import pyarrow.compute as pc

    base = docs.schema().base_schema
    if isinstance(base, pa.Schema):
        schema = base
    else:
        # pandas-block dataset: map numpy dtypes (object -> string)
        schema = pa.schema(
            [
                (n, pa.string() if dt == np.dtype(object) else pa.from_numpy_dtype(dt))
                for n, dt in zip(base.names, base.types)
            ]
        )
    names = list(schema.names)
    types = {n: schema.field(n).type for n in names}

    def tag_docs(t: pa.Table) -> pa.Table:
        ids = pc.cast(t[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {c: t[c] for c in names}
        cols["__side"] = pa.array(np.ones(t.num_rows, dtype=np.int8))
        cols["__bucket"] = pa.array(_bucket(ids, num_buckets))
        return pa.table(cols)

    def tag_losers(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"], pa.int64()).to_numpy(zero_copy_only=False)
        cols = {}
        for c in names:
            if c == id_col:
                cols[c] = pc.cast(t["doc_id"], types[c])
            else:
                cols[c] = pa.nulls(len(ids), types[c])
        cols["__side"] = pa.array(np.zeros(len(ids), dtype=np.int8))
        cols["__bucket"] = pa.array(_bucket(ids, num_buckets))
        return pa.table(cols)

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow").union(
        losers.map_batches(tag_losers, batch_format="pyarrow")
    )

    def anti(t: pa.Table) -> pa.Table:
        # pure-Arrow in-bucket anti-join: exotic column types (binary html,
        # timestamps, lists) pass through untouched — a pandas group stage
        # would round-trip them through object dtype and could float-ify
        # int columns that saw the loser rows' nulls.
        side = pc.equal(t["__side"], pa.scalar(1, pa.int8()))
        ids = pc.cast(t[id_col], pa.int64())
        lose = pc.unique(ids.filter(pc.invert(side)))
        keep = pc.and_(side, pc.invert(pc.is_in(ids, value_set=lose)))
        return t.filter(keep).select(names)

    out = tagged.groupby("__bucket").map_groups(anti, batch_format="pyarrow")

    def norm(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or set(names) - set(t.column_names):
            return pa.table({c: pa.array([], types[c]) for c in names})
        return pa.table({c: pc.cast(t[c], types[c]) for c in names})

    return out.map_batches(norm, batch_format="pyarrow")
