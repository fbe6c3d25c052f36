"""Link-graph family: anchor extraction, degrees, fixed-point PageRank.

Covers the properties the sf0.01 hash oracle can't see: golden-link parity
independent of the extractor, partition invariance (same results at any
block size — the fixed-point discipline's whole point), conservation of
rank mass, and dangling-host handling.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from data_model_ray import fixtures
from data_model_ray.pipelines import linkgraph
from data_model_ray.stages.extract import extract_links_batch

N = 4000


@pytest.fixture(scope="module")
def pages_path(ray_session):
    return fixtures.ensure_pages_parquet(N)


class TestExtraction:
    def test_golden_links(self):
        ids = np.arange(0, 2500)
        t = fixtures.pages_batch(ids)
        edges = extract_links_batch(t)
        exp = fixtures.pages_expected_links(ids)
        assert np.array_equal(edges["src_host"].to_numpy(), exp["src_host"])
        assert np.array_equal(edges["dst_host"].to_numpy(), exp["dst_host"])

    def test_zero_link_pages_emit_nothing(self):
        ids = np.arange(0, 500)
        t = fixtures.pages_batch(ids)
        exp = fixtures.pages_expected_links(ids)
        # the fixture guarantees some pages draw 0 links; they must not leak
        assert len(exp["src_host"]) < len(ids) * (fixtures.MAX_OUTLINKS - 1)
        assert extract_links_batch(t).num_rows == len(exp["src_host"])

    def test_empty_batch(self):
        t = fixtures.pages_batch(np.arange(0))
        out = extract_links_batch(t)
        assert out.num_rows == 0
        assert out.column_names == ["src_host", "dst_host"]

    def test_dup_urls_carry_identical_anchors(self):
        t = fixtures.pages_batch(np.array([6, 7]))
        assert t["html"][0].as_py() == t["html"][1].as_py()


def _reference_graph(n_rows: int):
    """Single-process numpy reference: distinct edges + degrees."""
    exp = fixtures.pages_expected_links(np.arange(n_rows))
    e = np.unique(
        np.stack([exp["src_host"], exp["dst_host"]], axis=1), axis=0
    )
    return exp, e


class TestDegrees:
    def test_host_degree_matches_reference(self, pages_path):
        _, e = _reference_graph(N)
        got = (
            linkgraph.host_degree(pages_path)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        hosts = np.unique(e)
        out = pd.Series(0, index=hosts, dtype=np.int64)
        out = out.add(pd.Series(e[:, 0]).value_counts(), fill_value=0)
        inc = pd.Series(0, index=hosts, dtype=np.int64)
        inc = inc.add(pd.Series(e[:, 1]).value_counts(), fill_value=0)
        assert np.array_equal(got["host"].to_numpy(), hosts)
        assert np.array_equal(got["out_deg"].to_numpy(np.int64), out.to_numpy(np.int64))
        assert np.array_equal(got["in_deg"].to_numpy(np.int64), inc.to_numpy(np.int64))

    def test_host_links_multiplicity(self, pages_path):
        exp, _ = _reference_graph(N)
        got = linkgraph.host_links(pages_path).to_pandas()
        assert int(got["n"].sum()) == len(exp["src_host"])
        pairs, counts = np.unique(
            np.stack([exp["src_host"], exp["dst_host"]], axis=1),
            axis=0,
            return_counts=True,
        )
        g = got.sort_values(["src_host", "dst_host"]).reset_index(drop=True)
        assert np.array_equal(
            g[["src_host", "dst_host"]].to_numpy(np.int64), pairs
        )
        assert np.array_equal(g["n"].to_numpy(np.int64), counts)


def _reference_pagerank(e: np.ndarray, n_iters: int = 5) -> pd.DataFrame:
    """Single-process int64 replay of the documented fixed-point semantics."""
    hosts = np.unique(e)
    n = len(hosts)
    src = np.searchsorted(hosts, e[:, 0])
    dst = np.searchsorted(hosts, e[:, 1])
    d = np.zeros(n, dtype=np.int64)
    np.add.at(d, src, 1)
    dangling = d == 0
    base = linkgraph.PR_SCALE // n
    tele = ((linkgraph.PR_ALPHA_DEN - linkgraph.PR_ALPHA_NUM) * base) // (
        linkgraph.PR_ALPHA_DEN
    )
    r = np.full(n, base, dtype=np.int64)
    for _ in range(n_iters):
        share = r[src] // d[src]
        contrib = np.zeros(n, dtype=np.int64)
        np.add.at(contrib, dst, share)
        dang = int(r[dangling].sum())
        r = tele + (
            linkgraph.PR_ALPHA_NUM * (contrib + dang // n)
        ) // linkgraph.PR_ALPHA_DEN
    return pd.DataFrame({"host": hosts.astype(np.int64), "rank_e12": r})


class TestPageRank:
    def test_matches_single_process_reference(self, pages_path):
        _, e = _reference_graph(N)
        ref = _reference_pagerank(e)
        got = (
            linkgraph.pagerank_hosts(pages_path)
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, ref)

    def test_mass_approximately_conserved(self, pages_path):
        got = linkgraph.pagerank_hosts(pages_path)
        total = int(got["rank_e12"].sum())
        # floor divisions only ever DROP mass; with ~|hosts| + |edges| floor
        # ops per iteration the loss is bounded well under 0.1% of SCALE
        assert total <= linkgraph.PR_SCALE
        assert total > linkgraph.PR_SCALE * 0.999

    def test_hubs_outrank_uniform(self, pages_path):
        # host 0 is the Zipf head — far more in-links than the median host
        got = linkgraph.pagerank_hosts(pages_path).set_index("host")["rank_e12"]
        assert got.loc[0] > 10 * got.median()

    def test_partition_invariance(self, ray_session, tmp_path):
        # same rows written as 1 file vs 7 shards -> bit-identical ranks
        import pyarrow.parquet as pq

        t = fixtures.pages_batch(np.arange(1500))
        one = tmp_path / "one"
        many = tmp_path / "many"
        one.mkdir()
        many.mkdir()
        pq.write_table(t, str(one / "p.parquet"))
        step = 1500 // 7 + 1
        for i in range(7):
            pq.write_table(
                t.slice(i * step, step), str(many / f"p{i}.parquet")
            )
        a = linkgraph.pagerank_hosts(str(one)).sort_values("host").reset_index(drop=True)
        b = (
            linkgraph.pagerank_hosts(str(many))
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_empty_graph(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = fixtures.pages_batch(np.arange(0))
        d = tmp_path / "empty"
        d.mkdir()
        pq.write_table(t, str(d / "p.parquet"))
        out = linkgraph.pagerank_hosts(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["host", "rank_e12"]


class TestTwoHop:
    def test_matches_reference(self, pages_path):
        _, e = _reference_graph(N)
        # numpy reference: pairs (a, b) with a->mid->b
        import collections

        outs = collections.defaultdict(set)
        ins = collections.defaultdict(set)
        for s, d in e:
            outs[s].add(d)
            ins[d].add(s)
        reach = collections.defaultdict(set)
        for mid in set(ins) & set(outs):
            for a in ins[mid]:
                reach[a].update(outs[mid])
        got = (
            linkgraph.two_hop_hosts(pages_path)
            .to_pandas()
            .sort_values("host")
            .reset_index(drop=True)
        )
        hosts = np.array(sorted(reach), dtype=np.int64)
        counts = np.array([len(reach[h]) for h in hosts], dtype=np.int64)
        assert np.array_equal(got["host"].to_numpy(np.int64), hosts)
        assert np.array_equal(got["n_2hop"].to_numpy(np.int64), counts)


class TestPageRankExchangeMode:
    def test_modes_bit_identical(self, pages_path):
        a = (
            linkgraph.pagerank_hosts(pages_path, method="broadcast")
            .sort_values("host")
            .reset_index(drop=True)
        )
        b = (
            linkgraph.pagerank_hosts(pages_path, method="exchange")
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_auto_small_graph_uses_broadcast_result(self, pages_path):
        a = linkgraph.pagerank_hosts(pages_path, method="auto")
        b = linkgraph.pagerank_hosts(pages_path)
        pd.testing.assert_frame_equal(
            a.sort_values("host").reset_index(drop=True),
            b.sort_values("host").reset_index(drop=True),
        )

    def test_auto_forced_exchange(self, pages_path):
        # a 1-node budget forces the exchange path through auto
        a = linkgraph.pagerank_hosts(
            pages_path, method="auto", broadcast_node_budget=1
        )
        b = linkgraph.pagerank_hosts(pages_path)
        pd.testing.assert_frame_equal(
            a.sort_values("host").reset_index(drop=True),
            b.sort_values("host").reset_index(drop=True),
        )


class TestPageRankCheckpoint:
    def test_resume_continues_chain(self, pages_path, tmp_path):
        ck = str(tmp_path / "pr_ck")
        direct = linkgraph.pagerank_hosts(pages_path, n_iters=5)
        # run 2 iterations, commit, then resume to 5 from the checkpoint
        part = linkgraph.pagerank_hosts(pages_path, n_iters=2, checkpoint_dir=ck)
        assert len(part) > 0
        resumed = linkgraph.pagerank_hosts(pages_path, n_iters=5, checkpoint_dir=ck)
        pd.testing.assert_frame_equal(
            resumed.sort_values("host").reset_index(drop=True),
            direct.sort_values("host").reset_index(drop=True),
        )

    def test_completed_checkpoint_short_circuits(self, pages_path, tmp_path):
        import json

        ck = str(tmp_path / "pr_ck2")
        a = linkgraph.pagerank_hosts(pages_path, n_iters=5, checkpoint_dir=ck)
        state = json.load(open(f"{ck}/state.json"))
        assert state["next_iter"] == 5
        b = linkgraph.pagerank_hosts(pages_path, n_iters=5, checkpoint_dir=ck)
        pd.testing.assert_frame_equal(a, b)

    def test_fingerprint_mismatch_invalidates(self, pages_path, tmp_path):
        import json

        ck = str(tmp_path / "pr_ck3")
        linkgraph.pagerank_hosts(pages_path, n_iters=3, checkpoint_dir=ck)
        # tamper: pretend the checkpoint came from a different graph
        state = json.load(open(f"{ck}/state.json"))
        state["fingerprint"] = "0" * 64
        json.dump(state, open(f"{ck}/state.json", "w"))
        fresh = linkgraph.pagerank_hosts(pages_path, n_iters=5, checkpoint_dir=ck)
        direct = linkgraph.pagerank_hosts(pages_path, n_iters=5)
        pd.testing.assert_frame_equal(
            fresh.sort_values("host").reset_index(drop=True),
            direct.sort_values("host").reset_index(drop=True),
        )


class TestHostGraphStore:
    def test_build_resume_rebuild(self, pages_path, tmp_path):
        import glob
        import shutil

        out = str(tmp_path / "hostgraph")
        s1 = linkgraph.build_host_graph(pages_path, out, num_buckets=8)
        assert s1["partitions_written"] > 0 and s1["partitions_skipped"] == 0
        # full resume: nothing rewritten
        s2 = linkgraph.build_host_graph(pages_path, out, num_buckets=8)
        assert s2["partitions_written"] == 0
        assert s2["partitions_skipped"] == s1["partitions_written"]
        # surgical rebuild: delete one partition, only it is rewritten
        victim = sorted(glob.glob(f"{out}/part=*"))[0]
        shutil.rmtree(victim)
        s3 = linkgraph.build_host_graph(pages_path, out, num_buckets=8)
        assert s3["partitions_written"] == 1
        assert s3["partitions_skipped"] == s1["partitions_written"] - 1
        # readback equals the direct distinct-edge dataset
        back = (
            linkgraph.read_host_graph(out)
            .to_pandas()[["src_host", "dst_host", "d"]]
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True)
        )
        direct = (
            linkgraph.distinct_edges_with_deg(pages_path)
            .to_pandas()[["src_host", "dst_host", "d"]]
            .sort_values(["src_host", "dst_host"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(back, direct)


class TestHits:
    def test_matches_reference(self, pages_path):
        _, e = _reference_graph(N)
        hosts = np.unique(e)
        idx = {h: i for i, h in enumerate(hosts)}
        src = np.array([idx[s] for s in e[:, 0]])
        dst = np.array([idx[d] for d in e[:, 1]])
        hub = np.ones(len(hosts), dtype=np.int64)
        for _ in range(2):
            auth = np.zeros(len(hosts), dtype=np.int64)
            np.add.at(auth, dst, hub[src])
            hub = np.zeros(len(hosts), dtype=np.int64)
            np.add.at(hub, src, auth[dst])
        got = (
            linkgraph.hits_hosts(pages_path)
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert np.array_equal(got["host"].to_numpy(np.int64), hosts)
        assert np.array_equal(got["auth"].to_numpy(np.int64), auth)
        assert np.array_equal(got["hub"].to_numpy(np.int64), hub)

    def test_hub_host_dominates(self, pages_path):
        got = linkgraph.hits_hosts(pages_path).set_index("host")
        assert got.loc[0, "auth"] > 10 * got["auth"].median()


class TestBfs:
    def test_matches_reference(self, pages_path):
        import collections

        _, e = _reference_graph(N)
        adj = collections.defaultdict(list)
        for s, d in e:
            adj[s].append(d)
        dist = {0: 0}
        frontier = [0]
        for lvl in range(1, 5):
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = lvl
                        nxt.append(v)
            frontier = nxt
        got = (
            linkgraph.bfs_levels(pages_path)
            .sort_values("host")
            .reset_index(drop=True)
        )
        hosts = np.array(sorted(dist), dtype=np.int64)
        dists = np.array([dist[h] for h in hosts], dtype=np.int64)
        assert np.array_equal(got["host"].to_numpy(np.int64), hosts)
        assert np.array_equal(got["dist"].to_numpy(np.int64), dists)

    def test_absent_source_returns_empty(self, pages_path):
        out = linkgraph.bfs_levels(pages_path, source_host=10**9)
        assert len(out) == 0


class TestRankFilter:
    def test_matches_reference(self, pages_path):
        import collections
        import re

        _, e = _reference_graph(N)
        ref = _reference_pagerank(e)
        keep = set(
            ref.loc[
                ref["rank_e12"] >= linkgraph.PR_SCALE // len(ref), "host"
            ].tolist()
        )
        t = fixtures.pages_batch(np.arange(N))
        hosts = [
            int(re.search(r"host(\d+)\.", u).group(1))
            for u in t["url"].to_pylist()
        ]
        cnt = collections.Counter(
            l for h, l in zip(hosts, t["lang"].to_pylist()) if h in keep
        )
        got = linkgraph.rank_filtered_lang_counts(pages_path).to_pandas()
        assert dict(zip(got["lang"], got["n_pages"])) == dict(cnt)


class TestTriangles:
    def test_matches_reference(self, pages_path):
        _, e = _reference_graph(N)
        # undirected brute force: id-canonical edges -> set, count closures
        a = np.minimum(e[:, 0], e[:, 1])
        b = np.maximum(e[:, 0], e[:, 1])
        keep = a != b
        und = set(zip(a[keep].tolist(), b[keep].tolist()))
        adj: dict[int, set[int]] = {}
        for x, y in und:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        counts: dict[int, int] = {}
        for x, y in und:
            for z in adj[x] & adj[y]:
                if z > y:  # each triangle once: x < y < z by construction
                    for h in (x, y, z):
                        counts[h] = counts.get(h, 0) + 1
        want = (
            pd.DataFrame(
                {"host": list(counts.keys()), "n_tri": list(counts.values())}
            )
            .astype(np.int64)
            .sort_values("host")
            .reset_index(drop=True)
        )
        got = (
            linkgraph.triangle_hosts(pages_path)
            .to_pandas()
            .astype(np.int64)
            .sort_values("host")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, want)

    def test_empty_graph(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = fixtures.pages_batch(np.arange(0))
        d = tmp_path / "empty_tri"
        d.mkdir()
        pq.write_table(t, str(d / "p.parquet"))
        out = linkgraph.triangle_hosts(str(d))
        assert len(out) == 0
        assert list(out.columns) == ["host", "n_tri"]


class TestClusteringCoef:
    def test_matches_reference(self, pages_path):
        _, e = _reference_graph(N)
        a = np.minimum(e[:, 0], e[:, 1])
        b = np.maximum(e[:, 0], e[:, 1])
        keep = a != b
        und = set(zip(a[keep].tolist(), b[keep].tolist()))
        adj: dict[int, set[int]] = {}
        for x, y in und:
            adj.setdefault(x, set()).add(y)
            adj.setdefault(y, set()).add(x)
        tric: dict[int, int] = {}
        for x, y in und:
            for z in adj[x] & adj[y]:
                if z > y:
                    for h in (x, y, z):
                        tric[h] = tric.get(h, 0) + 1
        rows = []
        for h, nb in sorted(adj.items()):
            d = len(nb)
            if d >= 2:
                rows.append((h, 2.0 * tric.get(h, 0) / (d * (d - 1))))
        want = pd.DataFrame(rows, columns=["host", "coef"])
        got = (
            linkgraph.clustering_coef_hosts(pages_path)
            .sort_values("host")
            .reset_index(drop=True)
        )
        assert got["host"].tolist() == want["host"].tolist()
        assert np.allclose(got["coef"].to_numpy(), want["coef"].to_numpy(), atol=1e-6)
        # triangle-free hosts with deg>=2 must appear with coef 0
        assert ((got["coef"] == 0.0) == (want["coef"] == 0.0)).all()

    def test_empty_graph(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = fixtures.pages_batch(np.arange(0))
        d = tmp_path / "empty_cc"
        d.mkdir()
        pq.write_table(t, str(d / "p.parquet"))
        out = linkgraph.clustering_coef_hosts(str(d))
        assert len(out) == 0 and list(out.columns) == ["host", "coef"]
