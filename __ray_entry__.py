"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship spatial-join + tile-pyramid pipeline on a
deterministic synthetic pages table at sf0.001 scale (10k rows — the pages
table per BASELINE.json ``input_hint`` does not exist in /root/testdata, so
it is synthesized exactly to spec by ``data_model_ray.fixtures``; see
FIXTURES.md). ``queries()`` exposes one entry per implemented operator
family from SURVEY.md section 2; SQL-expressible ones have DuckDB oracles
in ``oracle_sql()`` (same column names both sides); spatial/pages-based ones
are rows-only here and exact-value-checked in ``tests/``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in the library) calls ``ray.init`` / ``ray.shutdown``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PAGES_CACHE: dict[int, str] = {}

#: pages-backed queries whose oracle SQL is pinned to the driver's sf0.01
#: pages table (like the `pages_*` family): matched-scale parity lives in
#: tests/test_all_oracles_hash.py; the sf0.001 value sweep skips them.
PAGES_SCALE_PINNED = {
    "host_links",
    "host_reciprocity",
    "host_degree",
    "pagerank_hosts",
    "two_hop_hosts",
    "snapshot_diff",
    "hits_hosts",
    "bfs_hosts",
    "rank_filtered_pages",
    "triangle_hosts",
    "clustering_coef_hosts",
    "per_host_cap",
    "host_quality_filter",
}


def _pages_path(sf_dir: str) -> str:
    """Synthesize (once per scale) the pages table matching `sf_dir`'s scale."""
    from data_model_ray import fixtures

    name = os.path.basename(os.path.normpath(sf_dir))
    sf = float(name.replace("sf", "")) if name.startswith("sf") else 0.01
    n = fixtures.rows_for_sf(sf)
    if n not in _PAGES_CACHE:
        _PAGES_CACHE[n] = fixtures.ensure_pages_parquet(n)
    return _PAGES_CACHE[n]


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale; returns the base cell-stats table."""
    from data_model_ray.pipelines.flagship import FlagshipConfig, run_flagship

    res = run_flagship(
        n_rows=10_000,
        out_dir="/tmp/graft_entry_pyramid",
        cfg=FlagshipConfig(geoindex_concurrency=(1, 4)),
    )
    return res["base_table"].to_pandas()


# ---------------------------------------------------------------------------
# queries / oracles
# ---------------------------------------------------------------------------


def _norm_table_fn(int64_cols=(), round6_cols=()):
    """map_batches kernel: cast/round columns so engine and DuckDB oracle
    dtypes agree (the driver hash compares values per dtype)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t):
        for c in int64_cols:
            if c in t.column_names:
                t = t.set_column(
                    t.column_names.index(c), c, pc.cast(t[c], pa.int64())
                )
        for c in round6_cols:
            if c in t.column_names:
                t = t.set_column(
                    t.column_names.index(c), c, pc.round(t[c], ndigits=6)
                )
        return t

    return fn


def _host_links(sf_dir: str):
    """Host→host edge multiplicities from <a href> anchors (link graph)."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.host_links(_pages_path(sf_dir))


def _host_degree(sf_dir: str):
    """Distinct-edge out/in degree per host."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.host_degree(_pages_path(sf_dir))


def _pagerank_hosts(sf_dir: str):
    """Fixed-point PageRank (5 iterations) over the distinct host graph."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.pagerank_hosts(_pages_path(sf_dir))


def _host_quality_filter(sf_dir: str):
    """Domain-level quality gate: hosts at/above the corpus mean token count."""
    from data_model_ray.pipelines import urlops

    return urlops.host_quality_filter(_pages_path(sf_dir))


def _per_host_cap(sf_dir: str):
    """Politeness cap: first k=3 crawl rows per host by (warc_ts, url)."""
    from data_model_ray.pipelines import urlops

    return urlops.per_host_cap(_pages_path(sf_dir))


def _snapshot_diff(sf_dir: str):
    """Crawl-over-crawl url diff (added / removed / both)."""
    from data_model_ray.pipelines import urlops

    return urlops.snapshot_diff(_pages_path(sf_dir))


def _two_hop_hosts(sf_dir: str):
    """Distinct 2-hop reach per host (edge-table self-join)."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.two_hop_hosts(_pages_path(sf_dir))


def _triangle_hosts(sf_dir: str):
    """Per-host triangle counts (degree-oriented wedge closure)."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.triangle_hosts(_pages_path(sf_dir))


def _clustering_coef_hosts(sf_dir: str):
    """Local clustering coefficient per deg>=2 host."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.clustering_coef_hosts(_pages_path(sf_dir))


def _hits_hosts(sf_dir: str):
    """Raw-sum HITS (2 rounds) over the distinct host graph."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.hits_hosts(_pages_path(sf_dir))


def _bfs_hosts(sf_dir: str):
    """Directed BFS levels (<=4 hops) from the hub host."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.bfs_levels(_pages_path(sf_dir))


def _rank_filtered_lang_counts(sf_dir: str):
    """Per-lang page counts over above-uniform-PageRank hosts."""
    from data_model_ray.pipelines import linkgraph

    return linkgraph.rank_filtered_lang_counts(_pages_path(sf_dir))


def _pages_assignments(sf_dir: str):
    """Deduped per-url cell/granule/admin assignment table (north-star join).

    SQL-oracled columns only (h3_7 floor arithmetic, MGRS rect containment,
    admin even-odd PIP); the s2_12 Hilbert-curve ids are exposed in
    `pages_s2_cells` (rows-only — not SQL-expressible) and exact-tested in
    tests/test_flagship.py + tests/test_grid.py.
    """
    import ray.data as rd

    from data_model_ray.pipelines.flagship import FlagshipConfig, pages_to_cells

    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(_pages_path(sf_dir))
    deduped, _ = pages_to_cells(ds, FlagshipConfig(geoindex_concurrency=(1, 4)))
    return deduped.select_columns(
        ["url", "h3_7", "mgrs", "admin_l0", "admin_l1"]
    ).map_batches(
        _norm_table_fn(int64_cols=("h3_7", "admin_l0", "admin_l1")),
        batch_format="pyarrow",
    )


def _pages_s2_cells(sf_dir: str):
    """Per-url S2 level-12 cell ids (Hilbert-curve encode — no SQL oracle)."""
    import ray.data as rd

    from data_model_ray.pipelines.flagship import FlagshipConfig, pages_to_cells

    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(_pages_path(sf_dir))
    deduped, _ = pages_to_cells(ds, FlagshipConfig(geoindex_concurrency=(1, 4)))
    return deduped.select_columns(["url", "s2_12"])


def _pages_cell_stats(sf_dir: str):
    """Base pyramid level (per-cell aggregates) over the pages table."""
    import ray.data as rd

    from data_model_ray.pipelines.flagship import FlagshipConfig, pages_to_cells

    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(_pages_path(sf_dir))
    _, cells = pages_to_cells(ds, FlagshipConfig(geoindex_concurrency=(1, 4)))
    return cells.map_batches(
        _norm_table_fn(
            int64_cols=("cell", "flag_max"), round6_cols=("score_mean",)
        ),
        batch_format="pyarrow",
    )


def _pages_knn(sf_dir: str):
    """Per-cell spatial kNN over the deterministic host-prefix subset.

    Query/candidate set = DISTINCT (url, lat, lon) of pages whose url
    starts with oracles.KNN_HOST_PREFIX; output (url, neighbor, rank).
    dist_km is intentionally not compared (libm cos last-ulp differences
    between engines); ordering ties resolve by neighbor id on both sides.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from data_model_ray.oracles import KNN_HOST_PREFIX
    from data_model_ray.stages.dedup import dedup_exact
    from data_model_ray.stages.extract import extract_batch
    from data_model_ray.stages.knn import knn_per_cell

    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(_pages_path(sf_dir))

    def prep(b):
        b = b.filter(pc.starts_with(b["url"], pattern=KNN_HOST_PREFIX))
        b = extract_batch(b, verify_text=False)
        return b.select(["url", "lat", "lon"])

    pts = ds.map_batches(prep, batch_format="pyarrow")
    # duplicate urls carry identical (lat, lon) -> distinct triples
    pts = dedup_exact(pts, key="url", order_col="lat", num_buckets=8)
    out = knn_per_cell(pts, k=5)
    return out.select_columns(["url", "neighbor", "rank"]).map_batches(
        _norm_table_fn(int64_cols=("rank",)), batch_format="pyarrow"
    )


def _minhash_near_dups(sf_dir: str):
    from data_model_ray.stages.neardup import minhash_lsh_candidates

    return minhash_lsh_candidates(f"{sf_dir}/documents.parquet")


def _simhash_docs(sf_dir: str):
    from data_model_ray.stages.neardup import simhash_table

    return simhash_table(f"{sf_dir}/documents.parquet")


def _simhash_pairs(sf_dir: str):
    """Banded SimHash near-dup pairs (hamming <= 3) over documents."""
    from data_model_ray.stages.neardup import simhash_pairs

    return simhash_pairs(f"{sf_dir}/documents.parquet", max_distance=3)


def _gather_cell_table(sf_dir: str):
    """Materialize the grid-bounded cell-stats table as ONE pyarrow table.

    Zero-row-corpus-safe (ADVICE r4): with no non-empty blocks the concat
    list would be empty and ``pa.concat_tables`` raises — fall back to an
    empty table of the dataset's schema instead.
    """
    import pyarrow as pa
    import ray

    cells = _pages_cell_stats(sf_dir).materialize()
    tabs = ray.get(cells.to_arrow_refs())
    nonempty = [t for t in tabs if t.num_rows]
    if nonempty:
        return pa.concat_tables(nonempty, promote_options="default")
    if tabs:
        return tabs[0]
    return cells.schema().base_schema.empty_table()


def _pages_raster(sf_dir: str):
    """Rasterized base level (tile_x/tile_y/px/py layout) — raster<->vector."""
    import pyarrow as pa
    import ray

    from data_model_ray.pipelines.rasterize import rasterize_level

    table = _gather_cell_table(sf_dir)
    raster = rasterize_level(table)
    return _norm_table_fn(
        int64_cols=("level", "tile_x", "tile_y", "px", "py")
    )(raster)


def _pages_focal_stats(sf_dir: str):
    """3x3 focal (k-ring) smoothing of per-cell page density."""
    from data_model_ray.pipelines.spatial import focal_stats

    return focal_stats(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_hotspot(sf_dir: str):
    """Getis-Ord-Gi*-style hot-spot z-scores per occupied cell."""
    from data_model_ray.pipelines.spatial import hotspot_cells

    return hotspot_cells(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_idw(sf_dir: str):
    """Fixed-point IDW text_len interpolation at occupied cell centers."""
    from data_model_ray.pipelines.spatial import idw_cells

    return idw_cells(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_distance_pairs(sf_dir: str):
    """Bounded-radius spatial self-join over the deterministic host subset
    (each pair once, url_a < url_b; ring-1 candidacy mirrored by the oracle)."""
    from data_model_ray.oracles import KNN_HOST_PREFIX
    from data_model_ray.pipelines.spatial import distance_pairs

    return distance_pairs(_pages_path(sf_dir), host_prefix=KNN_HOST_PREFIX)


def _pages_host_dispersion(sf_dir: str):
    """Per-host centroid + max-radius geographic spread."""
    from data_model_ray.pipelines.spatial import host_dispersion

    return host_dispersion(_pages_path(sf_dir))


def _pages_vectorize(sf_dir: str):
    """Raster->vector round trip: rasterize the base cell level, vectorize
    the tiles back to cells, decode centers (grid.geocell_center)."""
    import pyarrow as pa
    import ray

    from data_model_ray.grid import geocell_center
    from data_model_ray.pipelines.rasterize import rasterize_level, vectorize_tiles

    table = _gather_cell_table(sf_dir)
    back = vectorize_tiles(rasterize_level(table))
    cell = back["cell"].to_numpy(zero_copy_only=False)
    lat_ctr, lon_ctr = geocell_center(cell)
    out = pa.table(
        {
            "cell": pa.array(cell.astype("int64")),
            "lat_ctr": pa.array(lat_ctr),
            "lon_ctr": pa.array(lon_ctr),
            "pages": back["pages"],
            "text_bytes": back["text_bytes"],
        }
    )
    return out


def _dormant_customers(sf_dir: str):
    """TPC-H Q22-shape dormant high-balance customers per nation."""
    from data_model_ray.pipelines.analytic import dormant_customers

    return dormant_customers(sf_dir)


def _custdist_hist(sf_dir: str):
    """TPC-H Q13-shape customer order-count distribution (zero included)."""
    from data_model_ray.pipelines.analytic import custdist_hist

    return custdist_hist(sf_dir)


def _q8_market_share(sf_dir: str):
    """TPC-H Q8-shape national market share per order year."""
    from data_model_ray.pipelines.analytic import q8_market_share

    return q8_market_share(sf_dir)


def _pages_focal_pyramid(sf_dir: str):
    """Multi-res focal pyramid: /2 parent-cell rollups + focal per level."""
    from data_model_ray.pipelines.spatial import focal_pyramid

    return focal_pyramid(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_kde_heatmap(sf_dir: str):
    """5x5 integer-kernel density heatmap over cell page counts."""
    from data_model_ray.pipelines.spatial import kde_heatmap

    return kde_heatmap(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_granule_coverage(sf_dir: str):
    """Per-MGRS-granule coverage rollup over the geoindexed pages."""
    from data_model_ray.pipelines.flagship import FlagshipConfig, pages_to_cells
    from data_model_ray.pipelines.spatial import granule_coverage
    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(_pages_path(sf_dir))
    deduped, _ = pages_to_cells(ds, FlagshipConfig(geoindex_concurrency=(1, 4)))
    return granule_coverage(deduped).map_batches(
        _norm_table_fn(int64_cols=("n_pages", "n_cells")), batch_format="pyarrow"
    )


def _pages_cell_churn(sf_dir: str):
    """Per-cell crawl churn between snapshot halves (spatial CDC)."""
    from data_model_ray.pipelines.spatial import cell_churn

    return cell_churn(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_bbox_query(sf_dir: str):
    """Bbox query against the lat-band range-partitioned store (prune at
    the read: only intersecting band partitions are opened)."""
    from data_model_ray.pipelines.spatial import bbox_query

    return bbox_query(_pages_path(sf_dir))


def _embedding_top_component(sf_dir: str):
    """Top principal component by distributed power iteration (rows-only:
    iterative algorithm, numpy-pinned in tests/test_kmeans.py)."""
    import pyarrow as pa

    from data_model_ray.stages.kmeans import power_iteration_top_component

    import numpy as np

    v, eig, n = power_iteration_top_component(sf_dir, iters=20)
    return pa.table(
        {
            "dim": pa.array(np.arange(len(v), dtype=np.int64)),
            "coeff": pa.array(np.round(v, 9)),
            "eigenvalue": pa.array(np.full(len(v), round(eig, 9))),
        }
    )


def _crawl_product_members(sf_dir: str):
    """Build (or revalidate) the deep closed crawl-product store from the
    pages corpus and return its member inventory — the driver-visible
    surface of the member-by-member product model (functions/product.py).
    Rows-only by nature (filesystem side effects); the closed validation
    must come back clean for every member to count as valid."""
    import os

    import pyarrow as pa

    from data_model_ray.functions.product import (
        build_crawl_product,
        sniff_crawl_product,
        validate_crawl_product,
    )

    pages = _pages_path(sf_dir)
    out = os.path.join("/tmp/graft_product", os.path.basename(pages.rstrip("/")))
    manifest = None
    if sniff_crawl_product(out) and not validate_crawl_product(out):
        import json as _json

        with open(os.path.join(out, "product_manifest.json")) as f:
            manifest = _json.load(f)
    if manifest is None:
        manifest = build_crawl_product(pages, out)
        problems = validate_crawl_product(out)
        if problems:
            raise AssertionError(f"crawl-product store invalid: {problems[:3]}")
    members = manifest["members"]
    names = sorted(members)
    return pa.table(
        {
            "member": pa.array(names, pa.string()),
            "rows": pa.array([members[m] for m in names], pa.int64()),
        }
    )


def _pages_cell_freshness(sf_dir: str):
    """Per-cell crawl-freshness bounds (recrawl-scheduler surface)."""
    from data_model_ray.pipelines.spatial import cell_freshness

    return cell_freshness(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell", "n_pages")), batch_format="pyarrow"
    )


def _pages_nearest_granule(sf_dir: str):
    """Nearest MGRS granule centroid per occupied cell (planar-degree d2)."""
    from data_model_ray.pipelines.spatial import cell_nearest_granule

    return cell_nearest_granule(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_admin_rollup(sf_dir: str):
    """Zonal rollup per admin-l0 polygon (PIP assignment consumer)."""
    from data_model_ray.pipelines.spatial import admin_rollup

    return admin_rollup(_pages_path(sf_dir))


def _pages_host_gaps(sf_dir: str):
    """Per-host crawl-politeness stats over all fetch records."""
    from data_model_ray.pipelines.urlops import host_fetch_gaps

    return host_fetch_gaps(_pages_path(sf_dir))


def _pages_lang_histogram(sf_dir: str):
    """Per-cell language histogram — the crawl-product langdist member."""
    from data_model_ray.pipelines.spatial import cell_lang_histogram

    return cell_lang_histogram(_pages_path(sf_dir)).map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _pages_utm_zones(sf_dir: str):
    """Per-UTM-zone stats over the multi-CRS subset — F13 reprojection
    runs IN the pipeline (Krüger inverse in the extract kernel)."""
    from data_model_ray.pipelines.spatial import utm_zone_stats

    return utm_zone_stats(_pages_path(sf_dir))


def _admin_raster_burn(sf_dir: str):
    """Vector->raster polygon burn over the full res-7 grid (scale-free:
    the grid is generated, polygons come from the deterministic fixture)."""
    from data_model_ray.pipelines.spatial import admin_raster_burn

    return admin_raster_burn().map_batches(
        _norm_table_fn(int64_cols=("cell",)), batch_format="pyarrow"
    )


def _langid_docs(sf_dir: str):
    import ray.data as rd

    from data_model_ray.stages.text import LangId

    from data_model_ray.sources.fs import sized_read_parquet

    ds = sized_read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        LangId, batch_format="pyarrow", concurrency=(1, 2)
    ).select_columns(["doc_id", "lang_pred"])


def _embedding_near_dups(sf_dir: str):
    from data_model_ray.stages.neardup import embedding_near_dups

    # synthetic embeddings are near-orthogonal (cos p99 ~ 0.29); 0.4 yields
    # a meaningful near-dup pair set on this corpus
    return embedding_near_dups(f"{sf_dir}/embeddings.parquet", threshold=0.4)


def _knn_queries(sf_dir: str):
    """Embeddings dataset + the first-5 query matrix; (ds, None, None) when
    the table is empty so ANN wrappers degrade to a well-formed empty
    result instead of a KeyError."""
    import numpy as np

    from data_model_ray.sources.fs import sized_read_parquet, to_pandas_cols

    ds = sized_read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    head = to_pandas_cols(
        ds.filter(expr="vec_id < 5"), {"vec_id": "int64", "embedding": "object"}
    ).sort_values("vec_id")
    if head.empty:
        return ds, None, None
    return ds, np.stack(head["embedding"].to_numpy()), head["vec_id"].to_numpy()


def _empty_knn_table():
    import pyarrow as pa

    return pa.table(
        {
            "query_id": pa.array([], pa.int64()),
            "neighbor_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
        }
    )


def _knn_lsh(sf_dir: str):
    from data_model_ray.stages.knn import knn_embeddings_lsh

    ds, qm, qids = _knn_queries(sf_dir)
    if qm is None:
        return _empty_knn_table()
    return knn_embeddings_lsh(ds, qm, qids, k=3)


def _knn_pq(sf_dir: str):
    """PQ ANN (ADC prune + exact refine) — rows-only entry (approximate by
    design; recall floor + full-refine==brute-force pinned in test_knn)."""
    from data_model_ray.stages.knn import knn_embeddings_pq

    ds, qm, qids = _knn_queries(sf_dir)
    if qm is None:
        return _empty_knn_table()
    return knn_embeddings_pq(ds, qm, qids, k=3, refine=4, train_size=256)


def _knn_ivf(sf_dir: str):
    """IVF ANN with every list probed -> exact search, so the brute-force
    DuckDB kNN oracle applies (rank-identical output contract)."""
    from data_model_ray.stages.knn import knn_embeddings_ivf

    ds, qm, qids = _knn_queries(sf_dir)
    if qm is None:
        return _empty_knn_table()
    return knn_embeddings_ivf(ds, qm, qids, k=3, n_lists=16, n_probe=16)


def _knn_ivfpq(sf_dir: str):
    """IVF-PQ ANN (list-pruned ADC scan + broadcast exact refine) —
    rows-only entry (approximate by design; recall floor + full-probe/
    full-refine == brute-force pinned in test_knn)."""
    from data_model_ray.stages.knn import knn_embeddings_ivfpq

    ds, qm, qids = _knn_queries(sf_dir)
    if qm is None:
        return _empty_knn_table()
    return knn_embeddings_ivfpq(
        ds, qm, qids, k=3, n_lists=16, n_probe=4, refine=4, train_size=256
    )


def _gcp_reproject(sf_dir: str):
    """Scattered-control-point (GCP) reprojection over a deterministic
    image-coordinate table (T1 hard case — TPS solve, no SQL oracle;
    accuracy exact-tested against the closed-form UTM transform in
    tests/test_gcp.py)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from data_model_ray.functions.proj import utm_to_geodetic
    from data_model_ray.stages.reproject import GcpReproject

    # 11x11 GCP grid over a 100 km UTM-33 tile, sampled from the true
    # transform (what a Sentinel-1 annotation carries)
    g_rows, g_cols = np.meshgrid(np.linspace(0, 10980, 11), np.linspace(0, 10980, 11))
    g_rows, g_cols = g_rows.ravel(), g_cols.ravel()
    g_lat, g_lon = utm_to_geodetic(300000.0 + g_cols * 10.0, 4600000.0 - g_rows * 10.0, 33)
    gcps = {"row": g_rows, "col": g_cols, "x": g_lon, "y": g_lat}

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def to_image_coords(b: pa.Table) -> pa.Table:
        did = b["doc_id"]
        row = pc.cast(pc.multiply(did, pa.scalar(37, pa.int64())), pa.float64())
        col = pc.cast(pc.multiply(did, pa.scalar(101, pa.int64())), pa.float64())
        return pa.table(
            {
                "doc_id": did,
                "row": pc.subtract(row, pc.multiply(pc.floor(pc.divide(row, 10980.0)), 10980.0)),
                "col": pc.subtract(col, pc.multiply(pc.floor(pc.divide(col, 10980.0)), 10980.0)),
            }
        )

    out = ds.map_batches(to_image_coords, batch_format="pyarrow").map_batches(
        GcpReproject,
        fn_constructor_kwargs={"gcps": gcps, "method": "tps"},
        batch_format="pyarrow",
        zero_copy_batch=True,
        concurrency=(1, 2),
    )
    return out.select_columns(["doc_id", "lon", "lat"]).map_batches(
        _norm_table_fn(round6_cols=("lon", "lat")), batch_format="pyarrow"
    )


def _media_decode(sf_dir: str):
    """Multimodal decode pipeline over REAL payloads (PPM images, RIFF/WAV
    audio, concatenated-P6 video) — from-scratch codecs in
    functions/codecs.py, actor-pool map_batches stages (no SQL oracle:
    binary parsing; round-trip exact-tested in tests/test_multimodal.py)."""
    import pyarrow.compute as pc
    import ray.data as rd

    from data_model_ray.stages.multimodal import (
        BINARY_STAGE_KWARGS,
        ImageDecode,
        ImageResize,
        synth_media_table,
    )

    t = synth_media_table(600, kinds=("image", "audio", "video"))
    images = t.filter(pc.equal(t["media_type"], "image/x-portable-pixmap"))
    return (
        rd.from_arrow(images)
        .map_batches(ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
        .map_batches(ImageResize, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
        .drop_columns(["features"])
    )


def _media_near_dups(sf_dir: str):
    """Composed multimodal pipeline: real image decode -> pixel features ->
    per-dim standardization -> distributed cosine near-dup. Planted
    near-duplicates (one-pixel perturbations every 20th image) must be
    found; the synthetic corpus also contains a few exact seed collisions
    which are genuine duplicates. Rows-only (binary decode, no SQL)."""
    import ray.data as rd

    from data_model_ray.stages.knn import standardize_embeddings
    from data_model_ray.stages.multimodal import (
        BINARY_STAGE_KWARGS,
        ImageDecode,
        synth_media_table,
    )
    from data_model_ray.stages.neardup import embedding_near_dups

    feats = (
        rd.from_arrow(synth_media_table(400, dup_every=20))
        .map_batches(ImageDecode, concurrency=(1, 2), **BINARY_STAGE_KWARGS)
        .select_columns(["id", "features"])
    )
    z = standardize_embeddings(feats, vec_col="features")
    return embedding_near_dups(
        z, threshold=0.99, vec_col="features", id_col="id"
    )


def _jaccard_pairs(sf_dir: str):
    """Exact all-pairs shingle Jaccard — the near-dup family's hard
    oracle: unlike the MinHash sketch, the shingle set is a deterministic
    function of the text, so DuckDB can rebuild it and the engine's
    distributed triangle join must match value-for-value."""
    from data_model_ray.stages.neardup import jaccard_all_pairs

    return jaccard_all_pairs(f"{sf_dir}/documents.parquet", threshold=0.5)


def _dup_clusters(sf_dir: str):
    """Near-dup cluster formation: MinHash-LSH verified pairs (the 100-TB
    scale path — exact-Jaccard all-pairs stays available as the O(N^2)
    verifier rung) -> connected components via distributed min-label
    propagation (stages/graph.py). The iterative-algorithm family; oracled
    by a DuckDB recursive CTE over the exact pair set, which the LSH
    pipeline's verified output deterministically equals on these fixtures
    (100% recall, pinned by tests/test_dedup_modes.py)."""
    from data_model_ray.stages.graph import connected_components
    from data_model_ray.stages.neardup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(
        f"{sf_dir}/documents.parquet", threshold=0.5
    )
    return connected_components(pairs)


def _dedup_near_docs(sf_dir: str):
    """End-to-end near-dup dedup: MinHash-LSH verified pairs (scale path;
    see _dup_clusters) -> connected components -> keep the min-doc_id
    representative per cluster (broadcast anti-join of the bounded loser
    set; the corpus streams)."""
    import ray.data as rd

    from data_model_ray.stages.graph import (
        connected_components,
        keep_one_per_cluster,
    )
    from data_model_ray.stages.neardup import minhash_lsh_candidates

    pairs = minhash_lsh_candidates(
        f"{sf_dir}/documents.parquet", threshold=0.5
    )
    comps = connected_components(pairs)
    docs = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"]
    )
    return keep_one_per_cluster(docs, comps)


def _inverted_index(sf_dir: str):
    """Sink-shaped text op: distinct (token, doc_id) postings hash-bucketed
    by token and written through the lineage layer's resumable writer
    (atomic per-bucket parquet + fingerprinted records; re-runs skip valid
    buckets), then read back — pipelines/invindex.py."""
    from data_model_ray.pipelines.invindex import inverted_index

    return inverted_index(sf_dir)


def _index_lookup(sf_dir: str):
    """Conjunctive term query against the bucketed postings index — only
    the term-hash buckets' partitions are read (partition pruning); docs
    containing ALL of ('data', 'query', 'fast')."""
    from data_model_ray.pipelines.invindex import index_lookup

    return index_lookup(sf_dir)


def _curate_docs_substr(sf_dir: str):
    """Full curation chain + a 5th exact-substring span-removal stage
    (ExactSubstr) over the survivors — the complete RefinedWeb-style
    composition, hash-checked end to end by one composed CTE oracle."""
    from data_model_ray.pipelines.curate import curate_docs

    return curate_docs(sf_dir, substring_k=8)


def _curate_docs(sf_dir: str):
    """End-to-end curation composition: quality filter -> exact dedup ->
    near-dup clustering (MinHash-LSH scale path by default; exact
    all-pairs Jaccard as the oracle mode, both producing the same verified
    pair set on these fixtures) -> keep-one-per-cluster. One DuckDB CTE
    chain hash-checks the whole pipeline (pipelines/curate.py)."""
    from data_model_ray.pipelines.curate import curate_docs

    return curate_docs(sf_dir)


def _kmeans_clusters(sf_dir: str):
    """Distributed spherical k-means over the embeddings table: E-step
    scans the corpus as map_batches partials (k x dim sums + counts),
    M-step reduces the tiny partials. Iterative algorithm — no SQL
    oracle (rows-only); exactness vs a single-process numpy reference is
    pytest-proven (tests/test_kmeans.py)."""
    import ray.data as rd

    from data_model_ray.stages.kmeans import kmeans_assign, kmeans_fit

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    if ds.count() == 0:  # iterative fit undefined on an empty corpus
        import pandas as pd

        return pd.DataFrame(
            {
                "vec_id": pd.Series(dtype="int64"),
                "cluster": pd.Series(dtype="int64"),
                "sim": pd.Series(dtype="float64"),
            }
        )
    cents, _ = kmeans_fit(ds, 8, n_iters=6)
    return kmeans_assign(ds, cents)


def _diverse_sample(sf_dir: str):
    """Cluster-quota diversity sampling: k-means assignment -> exact
    n-per-cluster quota by Knuth-hash order (deterministic). Rows-only:
    cluster ids come from the iterative fit (no SQL analogue); the quota,
    determinism, and driver-reference equality are pytest-proven."""
    import ray.data as rd

    from data_model_ray.stages.kmeans import diversity_sample, kmeans_fit

    ds = rd.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    if ds.count() == 0:  # iterative fit undefined on an empty corpus
        import pandas as pd

        return pd.DataFrame(
            {"vec_id": pd.Series(dtype="int64"), "cluster": pd.Series(dtype="int64")}
        )
    cents, _ = kmeans_fit(ds, 8, n_iters=6)
    return diversity_sample(ds, cents, per_cluster=10)


def _approx_distinct_users(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT) over two columns (events
    user_id, documents text). Rows-only: the estimate is within ~1.6%
    (p=12) of truth but not bit-equal to an exact SQL count; exactness vs
    a tolerance band is pytest-verified instead (tests/test_sketch.py)."""
    import pandas as pd

    from data_model_ray.pipelines.relational import _read
    from data_model_ray.stages.sketch import approx_distinct

    users = approx_distinct(_read(sf_dir, "events", ["user_id"]), "user_id")
    texts = approx_distinct(_read(sf_dir, "documents", ["text"]), "text")
    return pd.DataFrame(
        {"column": ["events.user_id", "documents.text"],
         "approx_distinct": [round(users), round(texts)]}
    )


def _approx_quantile_value(sf_dir: str):
    """KLL-sketch quantiles of events.value (rows-only: approximate by
    design; error-band- and determinism-tested in tests/test_sketch.py,
    exact path = quantile_disc/quantile_cont)."""
    import pandas as pd

    from data_model_ray.pipelines.relational import _read
    from data_model_ray.stages.sketch import approx_quantiles

    qs = [0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    est = approx_quantiles(_read(sf_dir, "events", ["value"]), "value", qs)
    return pd.DataFrame({"q": qs, "value_est": [est[q] for q in qs]})


def _pages_host_counts(sf_dir: str):
    from data_model_ray.pipelines.analytic import pages_host_counts

    return pages_host_counts(_pages_path(sf_dir))


def _pii_scan(sf_dir: str):
    from data_model_ray.pipelines.webtext import pii_scan

    return pii_scan(_pages_path(sf_dir))


def _incremental_dedup(sf_dir: str):
    from data_model_ray.pipelines.webtext import incremental_dedup

    return incremental_dedup(_pages_path(sf_dir))


def _pages_zonal_stats(sf_dir: str):
    from data_model_ray.pipelines.webtext import zonal_stats

    return zonal_stats(_pages_path(sf_dir))


def _pack_sequences(sf_dir: str):
    from data_model_ray.pipelines.webtext import pack_sequences

    return pack_sequences(sf_dir)


def _bpe_token_counts(sf_dir: str):
    from data_model_ray.stages.bpe import bpe_token_counts

    return bpe_token_counts(sf_dir, n_merges=_BPE_MERGES)


_BPE_MERGES = 30


import functools


@functools.lru_cache(maxsize=1)
def _bpe_oracle_sql() -> str:
    """Replayed-merge-CTE oracle: train the merge table on the sf0.01
    corpus with the SAME pure function the engine uses (no Ray — direct
    parquet read), then emit nested-replace SQL applying it. Merge-table
    reproducibility itself is pinned by tests/test_bpe.py against a
    from-scratch reference. sf0.01-pinned like the pages_* oracles.
    Cached: oracle_sql() is called once per parametrized oracle test."""
    import pyarrow.compute as _pc
    import pyarrow.parquet as pq

    from data_model_ray.stages.bpe import merge_pass_counts, replay_sql, train_bpe

    t = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet", columns=["text"]
    )
    toks = _pc.list_flatten(
        _pc.split_pattern(t["text"].combine_chunks().cast("large_string"), " ")
    )
    toks = toks.filter(_pc.not_equal(toks, ""))
    vc = toks.value_counts()
    words = vc.field("values").to_pylist()
    cnts = vc.field("counts").to_numpy(zero_copy_only=False)
    order = sorted(range(len(words)), key=lambda i: words[i])
    words = [words[i] for i in order]
    cnts = cnts[order]
    merges = train_bpe(words, cnts, _BPE_MERGES)
    passes = merge_pass_counts(words, merges)
    return (
        f"WITH {replay_sql(merges, passes).strip()} "
        "SELECT doc_id, n_subtok FROM bpe"
    )


def _canon_url_dedup(sf_dir: str):
    from data_model_ray.pipelines.urlops import canon_url_dedup

    return canon_url_dedup(sf_dir)


def _host_reciprocity(sf_dir: str):
    from data_model_ray.pipelines.linkgraph import host_reciprocity

    return host_reciprocity(_pages_path(sf_dir))


def _host_dedup(sf_dir: str):
    from data_model_ray.pipelines.urlops import host_dedup

    return host_dedup(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from data_model_ray.pipelines import analytic as ana
    from data_model_ray.pipelines import olap
    from data_model_ray.pipelines import relational as rel
    from data_model_ray.pipelines import webtext as wtx

    return {
        # round-2 third batch: windows, grouping sets, distinct aggs,
        # sampling, nested-array analytics (pipelines/olap.py)
        "distinct_users_per_type": olap.distinct_users_per_type,
        "pivot_status_priority": olap.pivot_status_priority,
        "dense_rank_orders": olap.dense_rank_orders,
        "rank_orders": olap.rank_orders,
        "running_distinct_types": olap.running_distinct_types,
        "late_event_flags": olap.late_event_flags,
        "pct_of_user_total": olap.pct_of_user_total,
        "time_weighted_avg": olap.time_weighted_avg,
        "events_dow_hour": olap.events_dow_hour,
        "global_percent_rank": olap.global_percent_rank,
        "orders_monthly_growth": olap.orders_monthly_growth,
        "unpivot_lineitem": olap.unpivot_lineitem,
        "moving_avg_events": olap.moving_avg_events,
        "p95_value_by_type": olap.p95_value_by_type,
        "percent_rank_orders": olap.percent_rank_orders,
        "argmax_order_per_priority": olap.argmax_order_per_priority,
        "ntile_orders": olap.ntile_orders,
        "lead_event_ts": olap.lead_event_ts,
        "first_last_user_value": olap.first_last_user_value,
        "cube_status_flag": olap.cube_status_flag,
        "stratified_sample_docs": olap.stratified_sample_docs,
        "string_agg_nations": olap.string_agg_nations,
        "embedding_dim_stats": olap.embedding_dim_stats,
        # round-2 widening: multi-way join, conditional agg, interpolated
        # percentiles, set ops, cumulative window, date/JSON/string scalar
        # fns, n-gram mining, correlated filter (pipelines/analytic.py)
        "q3_top_orders": ana.q3_top_orders,
        "promo_share_monthly": ana.promo_share_monthly,
        "quantile_cont": ana.quantile_cont_prices,
        "intersect_users": ana.intersect_users,
        "except_users": ana.except_users,
        "running_total": ana.running_total,
        "sessionize_events": ana.sessionize_events,
        "hourly_gapfill": ana.hourly_gapfill,
        "events_monthly": ana.events_monthly,
        "bigram_topk": ana.bigram_topk,
        "above_user_median": ana.above_user_median,
        "json_field_agg": ana.json_field_agg,
        "pages_host_counts": _pages_host_counts,
        "hash_sample": ana.hash_sample_events,
        "token_df": ana.token_df_topk,
        "spacesaving_topk": ana.spacesaving_topk,
        "tfidf_top_term": ana.tfidf_top_term,
        # web-corpus curation family (pipelines/webtext.py): repetition
        # quality metrics, contamination screening, PII scan, mixture
        # sampling, sequence packing, cross-snapshot dedup, zonal stats
        "doc_repetition": wtx.doc_repetition,
        "gopher_rules": wtx.gopher_rules,
        "norm_text_dedup": wtx.norm_text_dedup,
        "doc_chunks": wtx.doc_chunks,
        "substring_dedup": wtx.substring_dedup,
        "weighted_sample": wtx.weighted_sample,
        "doc_logprob": wtx.doc_logprob,
        "bm25_docs": wtx.bm25_docs,
        "paragraph_dedup": wtx.paragraph_dedup,
        "within_doc_para_dedup": wtx.within_doc_para_dedup,
        "doc_lexical_stats": wtx.doc_lexical_stats,
        "inverted_index": _inverted_index,
        "index_lookup": _index_lookup,
        "contamination_check": wtx.contamination_check,
        "mixture_sample": wtx.mixture_sample,
        # URL canonicalization family (pipelines/urlops.py): normalize
        # case/port/slash/query-order/tracking-params, then dedup by
        # canonical url and by host (messy variants derived identically
        # on both engines — fixture urls are uniform)
        "canon_url_dedup": _canon_url_dedup,
        "host_dedup": _host_dedup,
        # deterministic subword tokenizer (stages/bpe.py): corpus-trained
        # merge table (bounded word-count exchange + driver train),
        # broadcast + memoized apply; oracle replays the merges as nested
        # SQL replace() (sf0.01-pinned like the pages_* oracles)
        "bpe_token_counts": _bpe_token_counts,
        "pack_sequences": _pack_sequences,
        "pages_pii_scan": _pii_scan,
        "pages_incremental_dedup": _incremental_dedup,
        "pages_zonal_stats": _pages_zonal_stats,
        "grouped_median": ana.grouped_median_prices,
        "mode_per_type": ana.mode_user_per_type,
        "corr_group": ana.corr_qty_price,
        "value_histogram": ana.value_histogram,
        # web-analytics family (pipelines/analytic.py): ordered funnel,
        # day-grain cohort retention, exponential-decay freshness score,
        # per-source language entropy, Pareto skyline, six-table star join
        "funnel_stages": ana.funnel_stages,
        "cohort_retention": ana.cohort_retention,
        "decayed_count": ana.decayed_count_by_type,
        "source_lang_entropy": ana.source_lang_entropy,
        "skyline_orders": ana.skyline_orders,
        "q5_nation_revenue": ana.q5_nation_revenue,
        # round-5 join-shape widening: HAVING-join, correlated arg-max,
        # distinct-count with anti-join, correlated nation-average filter
        "q18_large_orders": ana.q18_large_orders,
        "q7_volume_shipping": ana.q7_volume_shipping,
        "part_best_supplier": ana.part_best_supplier,
        "supplier_cnt_by_part": ana.supplier_cnt_by_part,
        "orders_above_nation_avg": ana.orders_above_nation_avg,
        # SQL-oracled operator families (SURVEY.md section 2)
        "filter_project": rel.filter_project,            # M-group map/filter
        "groupby_agg": rel.groupby_agg,                  # A1/A2 partial+final
        "two_key_mean": rel.two_key_mean,                # A6 dedup-mean
        "global_minmax": rel.global_minmax,              # A7/A8 bbox union
        "topk_orders": rel.topk_orders,                  # sort/limit
        "dedup_docs_exact": rel.dedup_docs_exact,        # D exact dedup
        "dedup_latest_events": rel.dedup_latest_events,  # D latest-wins
        "token_count_docs": rel.token_count_docs,        # text analysis
        "lang_hist": rel.lang_hist,                      # per-key counters
        "broadcast_join_counts": rel.broadcast_join_counts,  # J broadcast
        "hash_join_revenue": rel.hash_join_revenue,      # J partitioned hash
        "window_hourly": rel.window_hourly,              # streaming window
        "prev_event_ts": rel.prev_event_ts,              # as-of/lag
        "asof_join": rel.asof_join_orders,               # cross-table as-of join
        "sliding_window": rel.sliding_window_sum,        # RANGE sliding aggregate
        "doc_quality": rel.doc_quality,                  # quality scoring
        "range_join": rel.range_join_bands,              # overlapping-interval join
        "cell_rollup_events": rel.cell_rollup_events,    # pyramid mean-of-means
        "knn_embeddings": rel.knn_embeddings_query,      # similarity search
        "backfill_join": rel.backfill_join,              # J1 inject-missing
        "sessionize": rel.sessionize,                    # gap sessions
        "distinct_pairs": rel.distinct_pairs,            # set-op distinct
        "semi_join": rel.semi_join_customers,            # EXISTS semi-join
        "anti_join": rel.anti_join_customers,            # NOT EXISTS anti-join
        "full_outer_join": rel.full_outer_join_counts,   # FULL OUTER, 0-fill
        "grouped_topk": rel.grouped_topk_orders,         # per-key top-k window
        "rollup_agg": rel.rollup_lineitem,               # ROLLUP grouping sets
        "stddev_group": rel.stddev_prices,               # algebraic variance
        "quantile_disc": rel.quantile_prices,            # exact order statistics
        "approx_distinct": _approx_distinct_users,       # HLL sketch (rows-only)
        "approx_quantile": _approx_quantile_value,       # KLL sketch (rows-only)
        # pages-based spatial pipelines — the north-star operators. All but
        # the hash-based ones (minhash/simhash LSH, s2 Hilbert ids, LSH ANN)
        # are DuckDB-oracled via data_model_ray.oracles at sf0.01 scale.
        "pages_assignments": _pages_assignments,
        "host_links": _host_links,               # link-graph edge counts
        "host_reciprocity": _host_reciprocity,   # mutual-link structure
        "host_degree": _host_degree,             # distinct-edge degrees
        "pagerank_hosts": _pagerank_hosts,       # fixed-point PageRank
        "two_hop_hosts": _two_hop_hosts,         # edge self-join 2-hop reach
        "snapshot_diff": _snapshot_diff,         # crawl CDC: url added/removed
        "per_host_cap": _per_host_cap,           # politeness quota per host
        "host_quality_filter": _host_quality_filter,  # domain quality gate
        "triangle_hosts": _triangle_hosts,       # degree-oriented triangle counts
        "clustering_coef_hosts": _clustering_coef_hosts,  # 2T/(d(d-1))
        "hits_hosts": _hits_hosts,               # raw-sum HITS hub/authority
        "bfs_hosts": _bfs_hosts,                 # BFS levels from hub host
        "rank_filtered_pages": _rank_filtered_lang_counts,  # signal -> corpus
        "pages_s2_cells": _pages_s2_cells,
        "pages_cell_stats": _pages_cell_stats,
        "pages_knn": _pages_knn,
        "minhash_near_dups": _minhash_near_dups,
        "jaccard_pairs": _jaccard_pairs,
        "dup_clusters": _dup_clusters,
        "dedup_near_docs": _dedup_near_docs,
        "kmeans_clusters": _kmeans_clusters,
        "diverse_sample": _diverse_sample,
        "curate_docs": _curate_docs,
        "curate_docs_substr": _curate_docs_substr,
        "simhash_docs": _simhash_docs,
        "simhash_pairs_docs": _simhash_pairs,
        "pages_raster": _pages_raster,
        "pages_focal_stats": _pages_focal_stats,
        "pages_hotspot": _pages_hotspot,
        "pages_idw": _pages_idw,
        "pages_distance_pairs": _pages_distance_pairs,
        "pages_host_dispersion": _pages_host_dispersion,
        "pages_vectorize": _pages_vectorize,
        "admin_raster_burn": _admin_raster_burn,
        "pages_bbox_query": _pages_bbox_query,
        "pages_utm_zones": _pages_utm_zones,
        "pages_lang_histogram": _pages_lang_histogram,
        "pages_host_gaps": _pages_host_gaps,
        "pages_admin_rollup": _pages_admin_rollup,
        "pages_nearest_granule": _pages_nearest_granule,
        "pages_cell_freshness": _pages_cell_freshness,
        "crawl_product_members": _crawl_product_members,
        "embedding_top_component": _embedding_top_component,
        "pages_cell_churn": _pages_cell_churn,
        "pages_granule_coverage": _pages_granule_coverage,
        "pages_kde_heatmap": _pages_kde_heatmap,
        "pages_focal_pyramid": _pages_focal_pyramid,
        "q8_market_share": _q8_market_share,
        "custdist_hist": _custdist_hist,
        "dormant_customers": _dormant_customers,
        "langid_docs": _langid_docs,
        "embedding_near_dups": _embedding_near_dups,
        "knn_embeddings_lsh": _knn_lsh,
        "knn_embeddings_ivf": _knn_ivf,
        "knn_embeddings_pq": _knn_pq,
        "knn_embeddings_ivfpq": _knn_ivfpq,
        "gcp_reproject": _gcp_reproject,
        "media_decode": _media_decode,
        "media_near_dups": _media_near_dups,
    }


#: the driver's correctness gate runs at sf=0.01 -> this pages row count
_ORACLE_N = 100_000

def _substr_ctes(src: str) -> str:
    """Exact-substring (k=8) span-removal CTE chain over relation ``src``
    (must expose doc_id, text) — mirrors pipelines/webtext.substring_spans
    expression-for-expression. Emits CTEs ss_d (doc_id, toks, n), ss_spans
    (doc_id, n_spans) and ss_kept (doc_id, kept_text, removed_tokens);
    the caller writes the final SELECT."""
    return f"""
            ss_d AS (
                SELECT doc_id, string_split(text, ' ') AS toks,
                       len(string_split(text, ' ')) AS n
                FROM {src}
            ),
            ss_g2 AS (
                SELECT doc_id, UNNEST(range(0, GREATEST(n - 8 + 1, 0))) AS pos,
                       toks
                FROM ss_d
            ),
            ss_g3 AS (
                SELECT doc_id, pos,
                       array_to_string(list_slice(toks, pos + 1, pos + 8), ' ')
                           AS gram
                FROM ss_g2
            ),
            ss_marked AS (
                SELECT doc_id, pos,
                       COUNT(*) OVER (PARTITION BY gram) AS c,
                       ROW_NUMBER() OVER (
                           PARTITION BY gram ORDER BY doc_id, pos) AS rn
                FROM ss_g3
            ),
            ss_rm AS (
                SELECT doc_id, pos FROM ss_marked WHERE c >= 2 AND rn > 1
            ),
            ss_cov AS (
                SELECT DISTINCT doc_id, pos + t.u AS ti
                FROM ss_rm, (SELECT UNNEST(range(0, 8)) AS u) t
            ),
            ss_spans AS (
                SELECT doc_id, COUNT(DISTINCT grp) AS n_spans FROM (
                    SELECT doc_id, ti - ROW_NUMBER() OVER (
                        PARTITION BY doc_id ORDER BY ti) AS grp
                    FROM ss_cov
                ) GROUP BY doc_id
            ),
            ss_toks AS (
                SELECT doc_id, UNNEST(toks) AS tok,
                       generate_subscripts(toks, 1) - 1 AS p
                FROM ss_d
            ),
            ss_kept AS (
                SELECT t.doc_id,
                       COALESCE(STRING_AGG(t.tok, ' ' ORDER BY t.p)
                                FILTER (WHERE c.ti IS NULL), '') AS kept_text,
                       COUNT(c.ti) AS removed_tokens
                FROM ss_toks t
                LEFT JOIN ss_cov c ON c.doc_id = t.doc_id AND c.ti = t.p
                GROUP BY t.doc_id
            )"""


_CURATE_CTES_TEMPLATE = """
            scored AS (
                SELECT doc_id, text, lang,
                       ROUND(LEAST(GREATEST((
                           (1 - LEAST(ABS(STRLEN(text) * 1.0 / GREATEST(tok, 1) - 5) / 5, 1))
                           + alpha * 1.0 / GREATEST(STRLEN(text), 1)
                       ) / 2, 0), 1), 6) AS score
                FROM (
                    SELECT doc_id, text, lang,
                           LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9_]+')) AS tok
                    FROM documents
                )
            ),
            curated AS (
                SELECT doc_id, text, lang FROM scored WHERE score >= 0.86
                QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
            ),
            pr AS ({pairs}),
            und AS (
                SELECT doc_a AS a, doc_b AS b FROM pr
                UNION
                SELECT doc_b, doc_a FROM pr
            ),
            walk(node, comp) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node
            ),
            lose AS (
                SELECT node FROM walk GROUP BY node HAVING node <> MIN(comp)
            )"""


#: exact all-pairs word-3-gram-shingle Jaccard (matches
#: stages/neardup.py shingle_hashes: w=3, per-token fallback for short
#: docs). Shared by jaccard_pairs (exact triangle join) and
#: minhash_near_dups (LSH sketch whose verified output deterministically
#: equals the exact pair set on these fixtures).
_JACCARD_PAIRS_SQL = """
    WITH toks AS (
        SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
               generate_subscripts(string_split(text, ' '), 1) AS pos,
               len(string_split(text, ' ')) AS ntok
        FROM documents
    ),
    sh AS (
        SELECT DISTINCT t1.doc_id,
               t1.tok || ' ' || t2.tok || ' ' || t3.tok AS s
        FROM toks t1
        JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
        JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
        WHERE t1.ntok >= 3
        UNION
        SELECT DISTINCT doc_id, tok AS s FROM toks WHERE ntok < 3
    ),
    cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(i / (ca.n + cb.n - i), 6) AS jaccard
    FROM inter
    JOIN cnt ca ON ca.doc_id = doc_a
    JOIN cnt cb ON cb.doc_id = doc_b
    WHERE i / (ca.n + cb.n - i) >= 0.5
"""


def _links_cte(n: int) -> str:
    """Exploded (src_host, dst_host) link rows from the pages html —
    byte-for-byte the rows `stages.extract.extract_links_batch` emits."""
    return f"""links AS (
        SELECT CAST(regexp_extract(url, 'host([0-9]+)\\.', 1) AS BIGINT) AS src_host,
               CAST(UNNEST(regexp_extract_all(decode(html),
                    '<a href="https://host([0-9]+)\\.example\\.com/">', 1)) AS BIGINT) AS dst_host
        FROM read_parquet('/tmp/graft_pages/n{n}/*.parquet')
    )"""


def _pagerank_sql(n: int, iters: int = 5) -> str:
    """Unrolled fixed-point PageRank CTE chain mirroring
    `pipelines/linkgraph.pagerank_hosts` VERBATIM: SCALE=10^12, alpha=17/20,
    every step int64 floor division (`//`) — bit-identical by construction,
    no float-summation-order slack to round away."""
    cte, last = _pagerank_ctes(n, iters)
    return (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT host, CAST(r AS BIGINT) AS rank_e12 FROM {last}"
    )


def _pagerank_ctes(n: int, iters: int = 5) -> tuple[list[str], str]:
    """The shared PageRank CTE chain; returns (ctes, final rank CTE name)."""
    scale = 10**12
    cte = [
        _links_cte(n),
        "e AS (SELECT DISTINCT src_host, dst_host FROM links)",
        """ew AS (SELECT src_host, dst_host,
               CAST(COUNT(*) OVER (PARTITION BY src_host) AS BIGINT) AS d FROM e)""",
        "nodes AS (SELECT src_host AS host FROM e UNION SELECT dst_host FROM e)",
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes)",
        f"r0 AS (SELECT host, {scale} // nn.n AS r FROM nodes, nn)",
    ]
    for k in range(1, iters + 1):
        p = k - 1
        cte.append(
            f"""c{k} AS (
            SELECT ew.dst_host AS host, CAST(SUM(r{p}.r // ew.d) AS BIGINT) AS contrib
            FROM ew JOIN r{p} ON r{p}.host = ew.src_host GROUP BY 1)"""
        )
        cte.append(
            f"""g{k} AS (
            SELECT CAST(COALESCE(SUM(r), 0) AS BIGINT) AS dang FROM r{p}
            WHERE host NOT IN (SELECT src_host FROM e))"""
        )
        cte.append(
            f"""r{k} AS (
            SELECT n2.host,
                   (3 * ({scale} // nn.n)) // 20
                   + (17 * (COALESCE(c{k}.contrib, 0) + g{k}.dang // nn.n)) // 20 AS r
            FROM nodes n2 CROSS JOIN nn CROSS JOIN g{k}
            LEFT JOIN c{k} ON c{k}.host = n2.host)"""
        )
    return cte, f"r{iters}"


def _rank_filter_sql(n: int, iters: int = 5) -> str:
    """PageRank chain + signal application: per-lang page counts over
    above-uniform hosts (`linkgraph.rank_filtered_lang_counts` twin)."""
    cte, last = _pagerank_ctes(n, iters)
    return (
        "WITH "
        + ",\n".join(cte)
        + f"""
        SELECT p.lang, COUNT(*) AS n_pages
        FROM read_parquet('/tmp/graft_pages/n{n}/*.parquet') p
        JOIN {last} ON {last}.host =
            CAST(regexp_extract(p.url, 'host([0-9]+)\\.', 1) AS BIGINT)
        CROSS JOIN nn
        WHERE {last}.r >= 1000000000000 // nn.n
        GROUP BY 1
    """
    )


def _bfs_sql(n: int, hops: int = 4, source: int = 0) -> str:
    """Unrolled BFS LEAST/MIN CTE chain mirroring
    `pipelines/linkgraph.bfs_levels` (sentinel 2^40, int64 exact)."""
    inf = 1 << 40
    cte = [
        _links_cte(n),
        "e AS (SELECT DISTINCT src_host, dst_host FROM links)",
        "nodes AS (SELECT src_host AS host FROM e UNION SELECT dst_host FROM e)",
        f"""d0 AS (SELECT host,
               CASE WHEN host = {source} THEN 0 ELSE {inf} END AS dist
               FROM nodes)""",
    ]
    for k in range(1, hops + 1):
        p = k - 1
        cte.append(
            f"""d{k} AS (
            SELECT n.host, LEAST(dp.dist, COALESCE(m.md, {inf})) AS dist
            FROM nodes n
            JOIN d{p} dp ON dp.host = n.host
            LEFT JOIN (
                SELECT e.dst_host AS host, MIN(d{p}.dist + 1) AS md
                FROM e JOIN d{p} ON d{p}.host = e.src_host GROUP BY 1
            ) m ON m.host = n.host)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f"\nSELECT host, CAST(dist AS BIGINT) AS dist FROM d{hops}"
        + f"\nWHERE dist < {inf}"
    )


def _urlops_sql(final_select: str) -> str:
    """Compose the shared messy-variant + canonicalization CTE chain
    (pipelines/urlops.py MESSY_URLS_SQL / CANON_SQL) with a final SELECT."""
    from data_model_ray.pipelines.urlops import CANON_SQL, MESSY_URLS_SQL

    return f"WITH {MESSY_URLS_SQL.strip()},\n{CANON_SQL.strip()}\n{final_select}"


def oracle_sql() -> dict[str, str]:
    from data_model_ray import fixtures, oracles

    # the pages oracles read /tmp parquet the engine synthesizes; make sure
    # it exists even if the oracle runs before the queries (Ray-free path
    # generates identical rows — pure function of row id)
    fixtures.ensure_pages_parquet(_ORACLE_N)
    fixtures.ensure_side_tables()

    return {
        "distinct_users_per_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "pivot_status_priority": """
            SELECT o_orderstatus,
                   COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p_urgent,
                   COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS p_high,
                   COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS p_medium,
                   COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p_notspec,
                   COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS p_low
            FROM orders GROUP BY o_orderstatus
        """,
        "dense_rank_orders": """
            SELECT o_orderkey,
                   DENSE_RANK() OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice DESC
                   ) AS drank
            FROM orders
        """,
        "unpivot_lineitem": """
            SELECT l_orderkey, l_linenumber, measure,
                   CAST(value AS DOUBLE) AS value
            FROM (
                UNPIVOT (SELECT l_orderkey, l_linenumber, l_quantity,
                                l_extendedprice, l_discount FROM lineitem)
                ON l_quantity, l_extendedprice, l_discount
                INTO NAME measure VALUE value
            )
        """,
        "rank_orders": """
            SELECT o_orderkey,
                   RANK() OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice DESC
                   ) AS rnk
            FROM orders
        """,
        "orders_monthly_growth": """
            WITH mo AS (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS y,
                     CAST(EXTRACT(month FROM o_orderdate) AS BIGINT) AS m,
                     CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                          AS BIGINT) AS cents
              FROM orders GROUP BY 1, 2
            ), g AS (
              SELECT y, m, cents,
                     LAG(cents) OVER (ORDER BY y, m) AS prev
              FROM mo
            )
            SELECT y, m,
                   ROUND(cents / CAST(prev AS DOUBLE) - 1.0, 6) AS growth
            FROM g WHERE prev IS NOT NULL
        """,
        "global_percent_rank": """
            SELECT o_orderkey,
                   ROUND((ROW_NUMBER() OVER (
                       ORDER BY o_totalprice, o_orderkey
                   ) - 1) / (COUNT(*) OVER () - 1.0), 6) AS pr
            FROM orders
        """,
        "events_dow_hour": """
            SELECT CAST(dayofweek(ts) AS BIGINT) AS dow,
                   CAST(hour(ts) AS BIGINT) AS hour,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM events GROUP BY 1, 2
        """,
        "doc_lexical_stats": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                   CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
                       AS n_distinct
            FROM documents
        """,
        "pct_of_user_total": """
            WITH c AS (
              SELECT event_id, user_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents
              FROM events
            )
            SELECT event_id,
                   ROUND(cents / CAST(SUM(cents) OVER (
                       PARTITION BY user_id
                   ) AS DOUBLE), 6) AS pct
            FROM c
        """,
        "time_weighted_avg": """
            WITH s AS (
              SELECT user_id, ts, event_id,
                     CAST(ROUND(value * 100) AS BIGINT) AS cents,
                     LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                     ) AS nxt
              FROM events
            ), agg AS (
              SELECT user_id,
                     CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                              ELSE cents * date_diff('microsecond', ts, nxt)
                              END) AS BIGINT) AS num,
                     CAST(date_diff('microsecond', MIN(ts), MAX(ts))
                          AS BIGINT) AS den
              FROM s GROUP BY 1
            )
            SELECT user_id, ROUND(num / (100.0 * den), 6) AS twa
            FROM agg WHERE den > 0
        """,
        "late_event_flags": """
            WITH a AS (
              SELECT event_id, ts,
                     CAST(CAST(event_id AS HUGEINT) * 2654435761
                          % 4294967296 AS BIGINT) AS akey
              FROM events
            )
            SELECT event_id,
                   CAST(CASE WHEN ts < MAX(ts) OVER (
                       ORDER BY akey, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ) - INTERVAL 1296000 SECOND THEN 1 ELSE 0 END AS BIGINT)
                     AS is_late
            FROM a
        """,
        "running_distinct_types": """
            WITH f AS (
              SELECT event_id, user_id, ts,
                     CASE WHEN ROW_NUMBER() OVER (
                       PARTITION BY user_id, event_type ORDER BY ts, event_id
                     ) = 1 THEN 1 ELSE 0 END AS first_flag
              FROM events
            )
            SELECT event_id,
                   CAST(SUM(first_flag) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING
                   ) AS BIGINT) AS distinct_types
            FROM f
        """,
        "moving_avg_events": """
            SELECT event_id,
                   ROUND(AVG(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN 3 PRECEDING AND CURRENT ROW
                   ), 6) AS mov_avg
            FROM events
        """,
        "percent_rank_orders": """
            SELECT o_orderkey,
                   ROUND(PERCENT_RANK() OVER (
                       PARTITION BY o_orderpriority ORDER BY o_totalprice
                   ), 6) AS pr,
                   ROUND(CUME_DIST() OVER (
                       PARTITION BY o_orderpriority ORDER BY o_totalprice
                   ), 6) AS cd
            FROM orders
        """,
        "argmax_order_per_priority": """
            SELECT o_orderpriority, o_orderkey AS best_key,
                   o_totalprice AS max_price
            FROM orders
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY o_orderpriority
                ORDER BY o_totalprice DESC, o_orderkey DESC
            ) = 1
        """,
        "ntile_orders": """
            SELECT o_orderkey,
                   NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS tile
            FROM orders
        """,
        "lead_event_ts": """
            SELECT event_id,
                   LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_ts
            FROM events
        """,
        "first_last_user_value": """
            SELECT DISTINCT user_id,
                   FIRST_VALUE(value) OVER w AS first_val,
                   LAST_VALUE(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
                   ) AS last_val
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        """,
        "cube_status_flag": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   COUNT(*) AS n_items
            FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        """,
        "stratified_sample_docs": """
            SELECT doc_id, lang FROM documents
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY lang
                ORDER BY (doc_id * 2654435761) & 4294967295, doc_id
            ) <= 20
        """,
        "string_agg_nations": """
            SELECT r.r_name AS r_name,
                   STRING_AGG(n.n_name, ',' ORDER BY n.n_name) AS nations
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "embedding_dim_stats": """
            WITH u AS (
                SELECT UNNEST(embedding) AS e,
                       generate_subscripts(embedding, 1) AS dim
                FROM embeddings
            )
            SELECT dim, COUNT(*) AS n,
                   ROUND(SUM(CAST(e AS DOUBLE)) / COUNT(*), 6) AS mean_v,
                   ROUND(MIN(CAST(e AS DOUBLE)), 6) AS min_v,
                   ROUND(MAX(CAST(e AS DOUBLE)), 6) AS max_v
            FROM u GROUP BY dim
        """,
        "q3_top_orders": """
            SELECT l_orderkey, revenue, o_orderdate, o_orderpriority FROM (
                SELECT l.l_orderkey AS l_orderkey,
                       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                           AS revenue,
                       o.o_orderdate, o.o_orderpriority
                FROM customer c
                JOIN orders o ON c.c_custkey = o.o_custkey
                JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                WHERE c.c_mktsegment = 'BUILDING'
                  AND o.o_orderdate < TIMESTAMP '1996-07-01'
                  AND l.l_shipdate > TIMESTAMP '1996-07-01'
                GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
            )
            ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
            LIMIT 10
        """,
        "promo_share_monthly": """
            SELECT date_trunc('month', l_shipdate) AS month,
                   ROUND(SUM(CASE WHEN p_type = 'PROMO'
                                  THEN l_extendedprice * (1 - l_discount)
                                  ELSE 0 END), 2) AS promo_rev,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS total_rev,
                   COUNT(*) AS n_items
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY 1
        """,
        "quantile_cont": """
            SELECT CAST(0.25 AS DOUBLE) AS q,
                   ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.25) AS DOUBLE), 6) AS val
            FROM lineitem
            UNION ALL
            SELECT 0.5, ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.5) AS DOUBLE), 6)
            FROM lineitem
            UNION ALL
            SELECT 0.75, ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.75) AS DOUBLE), 6)
            FROM lineitem
            UNION ALL
            SELECT 0.9, ROUND(CAST(QUANTILE_CONT(l_extendedprice, 0.9) AS DOUBLE), 6)
            FROM lineitem
        """,
        "intersect_users": """
            SELECT DISTINCT user_id FROM events
            INTERSECT
            SELECT DISTINCT o_custkey FROM orders
        """,
        "except_users": """
            SELECT DISTINCT o_custkey AS user_id FROM orders
            EXCEPT
            SELECT DISTINCT user_id FROM events
        """,
        "running_total": """
            SELECT event_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS UNBOUNDED PRECEDING
                   ), 6) AS run_sum
            FROM events
        """,
        "hourly_gapfill": """
            WITH b AS (
                SELECT date_trunc('hour', ts) AS hr, event_type, COUNT(*) AS n
                FROM events GROUP BY 1, 2
            ),
            lim AS (
                SELECT MIN(date_trunc('hour', ts)) AS lo,
                       MAX(date_trunc('hour', ts)) AS hi
                FROM events
            ),
            hours AS (
                SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                FROM lim
            ),
            types AS (SELECT DISTINCT event_type FROM events)
            SELECT h.hr, t.event_type, CAST(COALESCE(b.n, 0) AS BIGINT) AS n
            FROM hours h
            CROSS JOIN types t
            LEFT JOIN b ON b.hr = h.hr AND b.event_type = t.event_type
        """,
        "p95_value_by_type": """
            SELECT event_type, ROUND(quantile_cont(value, 0.95), 6) AS p95
            FROM events GROUP BY 1
        """,
        "sessionize_events": """
            WITH x AS (
                SELECT user_id, ts, event_id, value,
                       CASE WHEN LAG(ts) OVER w IS NULL
                                 OR ts - LAG(ts) OVER w > INTERVAL 30 MINUTES
                            THEN 1 ELSE 0 END AS brk
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ),
            y AS (
                SELECT *, SUM(brk) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING
                ) AS session_idx
                FROM x
            )
            SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
                   CAST(COUNT(*) AS BIGINT) AS n_events,
                   MIN(ts) AS first_ts, MAX(ts) AS last_ts,
                   ROUND(SUM(value), 6) AS total_value
            FROM y GROUP BY 1, 2
        """,
        "events_monthly": """
            SELECT EXTRACT(YEAR FROM ts) AS year,
                   EXTRACT(MONTH FROM ts) AS month,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 6) AS sum_value
            FROM events
            GROUP BY 1, 2
        """,
        "bigram_topk": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos
                FROM documents
            ),
            bg AS (
                SELECT t1.tok || ' ' || t2.tok AS bigram
                FROM toks t1
                JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
            )
            SELECT bigram, COUNT(*) AS n FROM bg GROUP BY bigram
            ORDER BY n DESC, bigram ASC LIMIT 20
        """,
        "above_user_median": """
            SELECT e.event_id FROM events e
            JOIN (
                SELECT user_id, MEDIAN(value) AS med
                FROM events GROUP BY user_id
            ) m USING (user_id)
            WHERE e.value > m.med
        """,
        "json_field_agg": """
            SELECT event_type,
                   CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
                   COUNT(*) AS n
            FROM events GROUP BY event_type
        """,
        "pages_host_counts": f"""
            SELECT SPLIT_PART(url, '/', 3) AS host,
                   COUNT(*) AS n_pages,
                   COUNT(DISTINCT url) AS n_urls
            FROM read_parquet('/tmp/graft_pages/n{_ORACLE_N}/*.parquet')
            GROUP BY 1
        """,
        "hash_sample": """
            SELECT event_id, user_id, value FROM events
            WHERE (event_id * 2654435761) % 4294967296 % 100 < 10
        """,
        "token_df": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents
            )
            SELECT tok AS token, COUNT(DISTINCT doc_id) AS df
            FROM toks GROUP BY tok
            ORDER BY df DESC, token ASC LIMIT 50
        """,
        # the sketch is exact in this regime (every block holds fewer
        # distinct keys than its capacity), so the exact SQL applies
        "spacesaving_topk": """
            SELECT user_id, COUNT(*) AS n FROM events
            GROUP BY user_id
            ORDER BY n DESC, user_id ASC LIMIT 10
        """,
        "tfidf_top_term": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents
            ),
            tf AS (
                SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
            ),
            df AS (
                SELECT tok, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY 1
            ),
            n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
            ranked AS (
                SELECT tf.doc_id, tf.tok,
                       tf.tf * (n.n / df.df) AS score,
                       ROW_NUMBER() OVER (
                           PARTITION BY tf.doc_id
                           ORDER BY tf.tf * (n.n / df.df) DESC, tf.tok ASC
                       ) AS rn
                FROM tf JOIN df USING (tok) CROSS JOIN n
            )
            SELECT doc_id, tok AS top_token, ROUND(score, 6) AS score
            FROM ranked WHERE rn = 1
        """,
        "grouped_median": """
            SELECT l_returnflag, MEDIAN(l_extendedprice) AS med_price
            FROM lineitem GROUP BY l_returnflag
        """,
        "mode_per_type": """
            SELECT event_type, user_id AS mode_user, n FROM (
                SELECT event_type, user_id, COUNT(*) AS n,
                       ROW_NUMBER() OVER (
                           PARTITION BY event_type
                           ORDER BY COUNT(*) DESC, user_id ASC
                       ) AS rn
                FROM events GROUP BY event_type, user_id
            ) WHERE rn = 1
        """,
        "corr_group": """
            SELECT l_returnflag,
                   ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
                   COUNT(*) AS n
            FROM lineitem GROUP BY l_returnflag
        """,
        "value_histogram": """
            SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin, COUNT(*) AS n
            FROM events GROUP BY 1
        """,
        # web-corpus curation family (webtext.py). Shingle/token identity
        # matches stages/neardup tokenization (single-space split); the
        # recursive CTE replays pack_sequences' greedy walk exactly.
        "doc_repetition": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos,
                       len(string_split(text, ' ')) AS ntok
                FROM documents
            ),
            d AS (
                SELECT doc_id, ANY_VALUE(ntok) AS ntok,
                       COUNT(DISTINCT tok) AS nd
                FROM toks GROUP BY doc_id
            ),
            bg AS (
                SELECT t1.doc_id, t1.tok || ' ' || t2.tok AS b, COUNT(*) AS c
                FROM toks t1
                JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
                GROUP BY 1, 2
            ),
            bmax AS (SELECT doc_id, MAX(c) AS mc FROM bg GROUP BY doc_id)
            SELECT d.doc_id, CAST(d.ntok AS BIGINT) AS n_tokens,
                   ROUND(1.0 - nd / CAST(GREATEST(ntok, 1) AS DOUBLE), 6)
                       AS dup_token_frac,
                   ROUND(COALESCE(mc, 0)
                         / CAST(GREATEST(ntok - 1, 1) AS DOUBLE), 6)
                       AS top_bigram_frac
            FROM d LEFT JOIN bmax USING (doc_id)
        """,
        "doc_chunks": """
            WITH d AS (
                SELECT doc_id, string_split(text, ' ') AS toks,
                       len(string_split(text, ' ')) AS n
                FROM documents
            ),
            idx AS (
                SELECT doc_id, toks, n, UNNEST(range(0, n, 24)) AS start FROM d
            )
            SELECT doc_id, start // 24 AS chunk_id,
                   LEAST(start + 32, n) - start AS n_tokens,
                   array_to_string(
                       list_slice(toks, start + 1, LEAST(start + 32, n)), ' '
                   ) AS chunk_text
            FROM idx
        """,
        "substring_dedup": f"""
            WITH {_substr_ctes("documents")}
            SELECT d.doc_id, CAST(d.n AS BIGINT) AS n_tokens,
                   CAST(COALESCE(k.removed_tokens, 0) AS BIGINT)
                       AS removed_tokens,
                   CAST(COALESCE(s.n_spans, 0) AS BIGINT) AS n_spans,
                   COALESCE(k.kept_text, '') AS kept_text
            FROM ss_d d
            LEFT JOIN ss_kept k USING (doc_id)
            LEFT JOIN ss_spans s USING (doc_id)
        """,
        "inverted_index": """
            SELECT DISTINCT UNNEST(string_split(text, ' ')) AS token, doc_id
            FROM documents
        """,
        "index_lookup": """
            SELECT doc_id FROM (
                SELECT DISTINCT doc_id,
                       UNNEST(string_split(text, ' ')) AS token
                FROM documents
            )
            WHERE token IN ('data', 'query', 'fast')
            GROUP BY doc_id
            HAVING COUNT(*) = 3
        """,
        "within_doc_para_dedup": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            p AS (
                SELECT doc_id, i AS pidx,
                       array_to_string(ws[(16*i+1):(16*i+16)], ' ') AS para
                FROM w, UNNEST(range(CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS t(i)
            ),
            k AS (
                SELECT doc_id, pidx, para,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id, para ORDER BY pidx
                       ) AS rn
                FROM p
            ),
            agg AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                       STRING_AGG(para, ' ' ORDER BY pidx) AS kept_text
                FROM k WHERE rn = 1 GROUP BY 1
            ),
            np AS (
                SELECT doc_id,
                       CAST(ceil(len(ws) / 16.0) AS BIGINT) AS n_paras
                FROM w
            )
            SELECT np.doc_id, np.n_paras,
                   CAST(np.n_paras - COALESCE(agg.n_kept, 0) AS BIGINT)
                       AS n_removed,
                   COALESCE(agg.kept_text, '') AS kept_text
            FROM np LEFT JOIN agg ON agg.doc_id = np.doc_id
        """,
        "paragraph_dedup": """
            WITH w AS (
                SELECT doc_id, string_split(text, ' ') AS ws FROM documents
            ),
            p AS (
                SELECT doc_id, i AS pidx,
                       array_to_string(ws[(16*i+1):(16*i+16)], ' ') AS para
                FROM w, UNNEST(range(CAST(ceil(len(ws) / 16.0) AS BIGINT))) AS t(i)
            ),
            g AS (
                SELECT para, COUNT(*) AS c,
                       MIN(doc_id * 1048576 + pidx) AS wk
                FROM p GROUP BY 1
            ),
            k AS (
                SELECT p.doc_id, p.pidx, p.para
                FROM p JOIN g ON g.para = p.para
                WHERE g.c = 1 OR p.doc_id * 1048576 + p.pidx = g.wk
            ),
            agg AS (
                SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
                       STRING_AGG(para, ' ' ORDER BY pidx) AS kept_text
                FROM k GROUP BY 1
            ),
            np AS (
                SELECT doc_id,
                       CAST(ceil(len(ws) / 16.0) AS BIGINT) AS n_paras
                FROM w
            )
            SELECT np.doc_id, np.n_paras,
                   CAST(np.n_paras - COALESCE(agg.n_kept, 0) AS BIGINT)
                       AS n_removed,
                   COALESCE(agg.kept_text, '') AS kept_text
            FROM np LEFT JOIN agg ON agg.doc_id = np.doc_id
        """,
        # BM25: constants spelled as the SAME source literals as the engine
        # ((1.2 + 1), (1 - 0.75)) — composite constants like 2.2 differ from
        # 1.2 + 1 in the last ulp and would break the hash past rounding
        "bm25_docs": """
            WITH s AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl,
                       CAST(len(list_filter(string_split(text, ' '),
                                            x -> x = 'data')) AS DOUBLE) AS tf0,
                       CAST(len(list_filter(string_split(text, ' '),
                                            x -> x = 'merge')) AS DOUBLE) AS tf1,
                       CAST(len(list_filter(string_split(text, ' '),
                                            x -> x = 'window')) AS DOUBLE) AS tf2,
                       CAST(len(list_filter(string_split(text, ' '),
                                            x -> x = 'spark')) AS DOUBLE) AS tf3
                FROM documents
            ),
            g AS (
                SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                       CAST(SUM(CAST(dl AS BIGINT)) AS DOUBLE)
                           / CAST(COUNT(*) AS DOUBLE) AS avgdl,
                       CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df0,
                       CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df1,
                       CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df2,
                       CAST(SUM(CASE WHEN tf3 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df3
                FROM s
            )
            SELECT doc_id,
                   ROUND(
                       LN(1.0 + (n - df0 + 0.5) / (df0 + 0.5))
                           * (tf0 * (1.2 + 1))
                           / (tf0 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
                     + LN(1.0 + (n - df1 + 0.5) / (df1 + 0.5))
                           * (tf1 * (1.2 + 1))
                           / (tf1 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
                     + LN(1.0 + (n - df2 + 0.5) / (df2 + 0.5))
                           * (tf2 * (1.2 + 1))
                           / (tf2 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
                     + LN(1.0 + (n - df3 + 0.5) / (df3 + 0.5))
                           * (tf3 * (1.2 + 1))
                           / (tf3 + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)),
                   6) AS bm25
            FROM s, g
            WHERE tf0 + tf1 + tf2 + tf3 > 0
        """,
        "doc_logprob": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok
                FROM documents
            ),
            freq AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
            tot AS (SELECT SUM(c) AS n FROM freq)
            SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
                   ROUND(AVG(LN(f.c / (SELECT n FROM tot))), 6)
                       AS mean_logprob
            FROM toks t JOIN freq f ON f.tok = t.tok
            GROUP BY t.doc_id
        """,
        "weighted_sample": """
            WITH w AS (
                SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                       ((doc_id * 2654435761) % 4294967296 + 1)
                           / 4294967297.0 AS u
                FROM documents
            )
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens
            FROM w
            ORDER BY ROUND(POW(u, 1.0 / GREATEST(n_tokens, 1)), 12) DESC,
                     doc_id
            LIMIT 64
        """,
        "contamination_check": """
            WITH toks AS (
                SELECT doc_id, UNNEST(string_split(text, ' ')) AS tok,
                       generate_subscripts(string_split(text, ' '), 1) AS pos,
                       len(string_split(text, ' ')) AS ntok
                FROM documents
            ),
            sh AS (
                SELECT DISTINCT t1.doc_id,
                       t1.tok || ' ' || t2.tok || ' ' || t3.tok AS s
                FROM toks t1
                JOIN toks t2 ON t2.doc_id = t1.doc_id AND t2.pos = t1.pos + 1
                JOIN toks t3 ON t3.doc_id = t1.doc_id AND t3.pos = t1.pos + 2
                WHERE t1.ntok >= 3
                UNION
                SELECT DISTINCT doc_id, tok AS s FROM toks WHERE ntok < 3
            ),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 0),
            cnt AS (
                SELECT doc_id, COUNT(*) AS n,
                       COUNT(*) FILTER (WHERE s IN (SELECT s FROM bench)) AS ns
                FROM sh WHERE doc_id % 97 <> 0 GROUP BY doc_id
            )
            SELECT doc_id, CAST(n AS BIGINT) AS n_shingles,
                   CAST(ns AS BIGINT) AS n_shared,
                   ROUND(ns / CAST(GREATEST(n, 1) AS DOUBLE), 6) AS contam_frac
            FROM cnt
        """,
        "mixture_sample": """
            WITH q AS (
                SELECT source, CAST(CEIL(SQRT(COUNT(*))) AS BIGINT) AS k
                FROM documents GROUP BY source
            )
            SELECT doc_id, source FROM (
                SELECT d.doc_id, d.source, q.k,
                       ROW_NUMBER() OVER (
                           PARTITION BY d.source
                           ORDER BY (d.doc_id * 2654435761) % 4294967296,
                                    d.doc_id
                       ) AS rn
                FROM documents d JOIN q USING (source)
            ) WHERE rn <= k
        """,
        "norm_text_dedup": """
            WITH messy AS (
                SELECT text AS t, 0::BIGINT AS r FROM documents
                UNION ALL
                SELECT CASE doc_id % 4
                         WHEN 0 THEN text
                         WHEN 1 THEN upper(text)
                         WHEN 2 THEN replace(text, ' ', '  ')
                         WHEN 3 THEN text || ' .'
                       END AS t, 1::BIGINT AS r
                FROM documents
            )
            SELECT trim(regexp_replace(regexp_replace(lower(t),
                       '[.,!?]', ' ', 'g'), ' +', ' ', 'g'), ' ')
                       AS norm_text,
                   COUNT(*) AS n_rows, MIN(r) AS kept_r
            FROM messy GROUP BY norm_text
        """,
        "gopher_rules": """
            WITH words AS (
                SELECT doc_id, unnest(string_split(text, ' ')) AS w
                FROM documents
            ),
            stats AS (
                SELECT doc_id,
                       COUNT(*) AS n_words,
                       COUNT(DISTINCT CASE WHEN w IN ('a','and','of','the','to')
                                           THEN w END) AS stop_distinct
                FROM words GROUP BY doc_id
            )
            SELECT d.doc_id, s.n_words,
                   ROUND((length(d.text) - (s.n_words - 1)) * 1.0 / s.n_words,
                         6) AS mean_wl,
                   s.stop_distinct
            FROM documents d JOIN stats s USING (doc_id)
            WHERE s.n_words BETWEEN 20 AND 90
              AND ROUND((length(d.text) - (s.n_words - 1)) * 1.0 / s.n_words, 6)
                  BETWEEN 3.8 AND 5.2
              AND s.stop_distinct >= 1
        """,
        **(
            {"bpe_token_counts": _bpe_oracle_sql()}
            if os.path.exists("/root/testdata/sf0.01/documents.parquet")
            else {}
        ),
        "canon_url_dedup": _urlops_sql(
            """
            SELECT canon_url, COUNT(*) AS n_rows, MIN(r) AS kept_r
            FROM canon GROUP BY canon_url
            """
        ),
        "host_dedup": _urlops_sql(
            r"""
            SELECT lower(regexp_extract(canon_url,
                       '^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#:]*)', 1)) AS host,
                   COUNT(*) AS n_rows,
                   COUNT(DISTINCT canon_url) AS n_canon
            FROM canon GROUP BY host
            """
        ),
        "pack_sequences": """
            WITH RECURSIVE d AS (
                SELECT doc_id, doc_id // 64 AS rng,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
                       ROW_NUMBER() OVER (
                           PARTITION BY doc_id // 64 ORDER BY doc_id
                       ) AS pos
                FROM documents
            ),
            rec AS (
                SELECT rng, pos, doc_id, t, CAST(0 AS BIGINT) AS bin, t AS fill
                FROM d WHERE pos = 1
                UNION ALL
                SELECT d.rng, d.pos, d.doc_id, d.t,
                       CASE WHEN r.fill + d.t > 256 THEN r.bin + 1
                            ELSE r.bin END,
                       CASE WHEN r.fill + d.t > 256 THEN d.t
                            ELSE r.fill + d.t END
                FROM rec r JOIN d ON d.rng = r.rng AND d.pos = r.pos + 1
            )
            SELECT doc_id, t AS n_tokens,
                   rng * 100000 + bin AS bin_id,
                   fill - t AS bin_pos
            FROM rec
        """,
        "pages_pii_scan": oracles.pii_scan_sql(_ORACLE_N),
        "pages_incremental_dedup": oracles.incremental_dedup_sql(_ORACLE_N),
        "pages_zonal_stats": oracles.pages_zonal_stats_sql(_ORACLE_N),
        "pages_assignments": oracles.pages_assignments_sql(_ORACLE_N),
        "host_links": f"""
            WITH {_links_cte(_ORACLE_N)}
            SELECT src_host, dst_host, COUNT(*) AS n
            FROM links GROUP BY 1, 2
        """,
        "host_reciprocity": f"""
            WITH {_links_cte(_ORACLE_N)},
            e AS (
              SELECT DISTINCT src_host, dst_host FROM links
              WHERE src_host <> dst_host
            )
            SELECT a.src_host AS host,
                   CAST(COUNT(*) AS BIGINT) AS out_deg,
                   CAST(SUM(CASE WHEN b.src_host IS NULL THEN 0 ELSE 1 END)
                        AS BIGINT) AS reciprocated
            FROM e a LEFT JOIN e b
              ON b.src_host = a.dst_host AND b.dst_host = a.src_host
            GROUP BY 1
        """,
        "host_degree": f"""
            WITH {_links_cte(_ORACLE_N)},
            e AS (SELECT DISTINCT src_host, dst_host FROM links),
            o AS (SELECT src_host AS host, CAST(COUNT(*) AS BIGINT) AS out_deg
                  FROM e GROUP BY 1),
            i AS (SELECT dst_host AS host, CAST(COUNT(*) AS BIGINT) AS in_deg
                  FROM e GROUP BY 1)
            SELECT COALESCE(o.host, i.host) AS host,
                   COALESCE(o.out_deg, 0) AS out_deg,
                   COALESCE(i.in_deg, 0) AS in_deg
            FROM o FULL OUTER JOIN i ON o.host = i.host
        """,
        "pagerank_hosts": _pagerank_sql(_ORACLE_N),
        "two_hop_hosts": f"""
            WITH {_links_cte(_ORACLE_N)},
            e AS (SELECT DISTINCT src_host, dst_host FROM links)
            SELECT a.src_host AS host, COUNT(DISTINCT b.dst_host) AS n_2hop
            FROM e a JOIN e b ON a.dst_host = b.src_host
            GROUP BY 1
        """,
        "triangle_hosts": f"""
            WITH {_links_cte(_ORACLE_N)},
            ue AS (
                SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                                GREATEST(src_host, dst_host) AS b
                FROM links WHERE src_host <> dst_host
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ue e1
                JOIN ue e2 ON e2.a = e1.b
                JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            corners AS (
                SELECT x AS host FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri
            )
            SELECT host, CAST(COUNT(*) AS BIGINT) AS n_tri
            FROM corners GROUP BY 1
        """,
        "clustering_coef_hosts": f"""
            WITH {_links_cte(_ORACLE_N)},
            ue AS (
                SELECT DISTINCT LEAST(src_host, dst_host) AS a,
                                GREATEST(src_host, dst_host) AS b
                FROM links WHERE src_host <> dst_host
            ),
            deg AS (
                SELECT host, CAST(COUNT(*) AS BIGINT) AS d
                FROM (SELECT a AS host FROM ue UNION ALL SELECT b FROM ue)
                GROUP BY 1
            ),
            tri AS (
                SELECT e1.a AS x, e1.b AS y, e2.b AS z
                FROM ue e1
                JOIN ue e2 ON e2.a = e1.b
                JOIN ue e3 ON e3.a = e1.a AND e3.b = e2.b
            ),
            tc AS (
                SELECT host, CAST(COUNT(*) AS BIGINT) AS n_tri
                FROM (
                    SELECT x AS host FROM tri
                    UNION ALL SELECT y FROM tri
                    UNION ALL SELECT z FROM tri
                ) GROUP BY 1
            )
            SELECT deg.host,
                   ROUND(2.0 * COALESCE(tc.n_tri, 0) / (deg.d * (deg.d - 1)),
                         6) AS coef
            FROM deg LEFT JOIN tc ON tc.host = deg.host
            WHERE deg.d >= 2
        """,
        "hits_hosts": f"""
            WITH {_links_cte(_ORACLE_N)},
            e AS (SELECT DISTINCT src_host, dst_host FROM links),
            nodes AS (SELECT src_host AS host FROM e
                      UNION SELECT dst_host FROM e),
            a1 AS (SELECT dst_host AS host, CAST(COUNT(*) AS BIGINT) AS a
                   FROM e GROUP BY 1),
            h1 AS (SELECT e.src_host AS host, CAST(SUM(a1.a) AS BIGINT) AS h
                   FROM e JOIN a1 ON a1.host = e.dst_host GROUP BY 1),
            a2 AS (SELECT e.dst_host AS host,
                          CAST(SUM(COALESCE(h1.h, 0)) AS BIGINT) AS a
                   FROM e LEFT JOIN h1 ON h1.host = e.src_host GROUP BY 1),
            h2 AS (SELECT e.src_host AS host,
                          CAST(SUM(COALESCE(a2.a, 0)) AS BIGINT) AS h
                   FROM e LEFT JOIN a2 ON a2.host = e.dst_host GROUP BY 1)
            SELECT n.host, COALESCE(a2.a, 0) AS auth, COALESCE(h2.h, 0) AS hub
            FROM nodes n
            LEFT JOIN a2 ON a2.host = n.host
            LEFT JOIN h2 ON h2.host = n.host
        """,
        "bfs_hosts": _bfs_sql(_ORACLE_N),
        "rank_filtered_pages": _rank_filter_sql(_ORACLE_N),
        "host_quality_filter": f"""
            WITH s AS (
                SELECT SPLIT_PART(url, '/', 3) AS host,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
                FROM read_parquet('/tmp/graft_pages/n{_ORACLE_N}/*.parquet')
            ),
            h AS (
                SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
                       CAST(SUM(ntok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS m
                FROM s GROUP BY 1
            ),
            g AS (
                SELECT CAST(SUM(ntok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS gm
                FROM s
            )
            SELECT host, n_pages, ROUND(m, 6) AS mean_tokens
            FROM h, g WHERE h.m >= g.gm
        """,
        "per_host_cap": f"""
            SELECT SPLIT_PART(url, '/', 3) AS host, url, warc_ts
            FROM read_parquet('/tmp/graft_pages/n{_ORACLE_N}/*.parquet')
            QUALIFY ROW_NUMBER() OVER (
                PARTITION BY SPLIT_PART(url, '/', 3)
                ORDER BY warc_ts, url
            ) <= 3
        """,
        "snapshot_diff": f"""
            WITH s AS (
                SELECT url,
                       MAX(CASE WHEN warc_ts < TIMESTAMP '2024-07-01'
                                THEN 1 ELSE 0 END) AS in_a,
                       MAX(CASE WHEN warc_ts >= TIMESTAMP '2024-07-01'
                                THEN 1 ELSE 0 END) AS in_b
                FROM read_parquet('/tmp/graft_pages/n{_ORACLE_N}/*.parquet')
                GROUP BY url
            )
            SELECT url,
                   CASE WHEN in_a = 1 AND in_b = 1 THEN 'both'
                        WHEN in_a = 1 THEN 'removed'
                        ELSE 'added' END AS status
            FROM s
        """,
        "pages_cell_stats": oracles.pages_cell_stats_sql(_ORACLE_N),
        "pages_raster": oracles.pages_raster_sql(_ORACLE_N),
        "pages_knn": oracles.pages_knn_sql(_ORACLE_N),
        "pages_focal_stats": oracles.pages_focal_stats_sql(_ORACLE_N),
        "pages_hotspot": oracles.pages_hotspot_sql(_ORACLE_N),
        "pages_idw": oracles.pages_idw_sql(_ORACLE_N),
        "pages_distance_pairs": oracles.pages_distance_pairs_sql(_ORACLE_N),
        "pages_host_dispersion": oracles.pages_host_dispersion_sql(_ORACLE_N),
        "pages_vectorize": oracles.pages_vectorize_sql(_ORACLE_N),
        "admin_raster_burn": oracles.admin_raster_burn_sql(),
        "pages_bbox_query": oracles.pages_bbox_query_sql(_ORACLE_N),
        "pages_utm_zones": oracles.pages_utm_zones_sql(_ORACLE_N),
        "pages_lang_histogram": oracles.pages_lang_histogram_sql(_ORACLE_N),
        "pages_host_gaps": oracles.pages_host_gaps_sql(_ORACLE_N),
        "pages_admin_rollup": oracles.pages_admin_rollup_sql(_ORACLE_N),
        "pages_nearest_granule": oracles.pages_nearest_granule_sql(_ORACLE_N),
        "pages_cell_freshness": oracles.pages_cell_freshness_sql(_ORACLE_N),
        "pages_cell_churn": oracles.pages_cell_churn_sql(_ORACLE_N),
        "pages_granule_coverage": oracles.pages_granule_coverage_sql(_ORACLE_N),
        "pages_kde_heatmap": oracles.pages_kde_heatmap_sql(_ORACLE_N),
        "pages_focal_pyramid": oracles.pages_focal_pyramid_sql(_ORACLE_N),
        "langid_docs": oracles.langid_docs_sql(),
        "embedding_near_dups": oracles.embedding_near_dups_sql(0.4),
        # minhash_near_dups shares the exact-Jaccard oracle: its LSH
        # candidate stage is exact-Jaccard-verified, and with the fixed
        # seeded hashing its recall on these inputs is deterministically
        # 100% (verified value-for-value at sf0.001 and sf0.01), so the
        # sketch pipeline must reproduce the exact pair set.
        "minhash_near_dups": _JACCARD_PAIRS_SQL,
        "jaccard_pairs": _JACCARD_PAIRS_SQL,
        "dup_clusters": f"""
            WITH RECURSIVE pr AS ({_JACCARD_PAIRS_SQL}),
            und AS (
                SELECT doc_a AS a, doc_b AS b FROM pr
                UNION
                SELECT doc_b, doc_a FROM pr
            ),
            walk(node, comp) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node
            )
            SELECT node AS doc_id, MIN(comp) AS cluster_id
            FROM walk GROUP BY node
        """,
        "curate_docs": f"""
            WITH RECURSIVE {_CURATE_CTES_TEMPLATE.format(
                pairs=_JACCARD_PAIRS_SQL.replace("FROM documents", "FROM curated"))}
            SELECT doc_id, lang FROM curated
            WHERE doc_id NOT IN (SELECT node FROM lose)
        """,
        "curate_docs_substr": f"""
            WITH RECURSIVE {_CURATE_CTES_TEMPLATE.format(
                pairs=_JACCARD_PAIRS_SQL.replace("FROM documents", "FROM curated"))},
            ss_src AS (
                SELECT doc_id, text, lang FROM curated
                WHERE doc_id NOT IN (SELECT node FROM lose)
            ),
            {_substr_ctes("ss_src")}
            SELECT f.doc_id, f.lang, CAST(d.n AS BIGINT) AS n_tokens,
                   CAST(COALESCE(k.removed_tokens, 0) AS BIGINT)
                       AS removed_tokens,
                   COALESCE(k.kept_text, '') AS kept_text
            FROM ss_src f
            JOIN ss_d d USING (doc_id)
            LEFT JOIN ss_kept k USING (doc_id)
        """,
        "dedup_near_docs": f"""
            WITH RECURSIVE pr AS ({_JACCARD_PAIRS_SQL}),
            und AS (
                SELECT doc_a AS a, doc_b AS b FROM pr
                UNION
                SELECT doc_b, doc_a FROM pr
            ),
            walk(node, comp) AS (
                SELECT a, a FROM und
                UNION
                SELECT u.b, w.comp FROM walk w JOIN und u ON u.a = w.node
            ),
            lose AS (
                SELECT node FROM walk GROUP BY node HAVING node <> MIN(comp)
            )
            SELECT d.doc_id, d.lang FROM documents d
            WHERE d.doc_id NOT IN (SELECT node FROM lose)
        """,
        "semi_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey IN (SELECT user_id FROM events)
        """,
        "anti_join": """
            SELECT c_custkey, c_mktsegment FROM customer
            WHERE c_custkey NOT IN (SELECT user_id FROM events)
        """,
        "full_outer_join": """
            SELECT COALESCE(e.user_id, o.o_custkey) AS user_key,
                   COALESCE(e.n_events, 0) AS n_events,
                   COALESCE(o.n_orders, 0) AS n_orders
            FROM (
                SELECT user_id, COUNT(*) AS n_events FROM events
                WHERE user_id % 2 = 0 GROUP BY user_id
            ) e
            FULL OUTER JOIN (
                SELECT o_custkey, COUNT(*) AS n_orders FROM orders
                WHERE o_custkey % 3 = 0 GROUP BY o_custkey
            ) o ON e.user_id = o.o_custkey
        """,
        "grouped_topk": """
            SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
                SELECT o_orderpriority, o_orderkey, o_totalprice,
                       ROW_NUMBER() OVER (
                           PARTITION BY o_orderpriority
                           ORDER BY o_totalprice DESC, o_orderkey ASC
                       ) AS rank
                FROM orders
            ) WHERE rank <= 3
        """,
        "rollup_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   COUNT(*) AS n_items
            FROM lineitem
            GROUP BY ROLLUP(l_returnflag, l_linestatus)
        """,
        "stddev_group": """
            SELECT l_returnflag,
                   ROUND(AVG(l_extendedprice), 2) AS mean_price,
                   ROUND(STDDEV_POP(l_extendedprice), 2) AS std_price,
                   COUNT(*) AS n
            FROM lineitem
            GROUP BY l_returnflag
        """,
        "quantile_disc": """
            SELECT 0.25 AS q, QUANTILE_DISC(l_extendedprice, 0.25) AS val
            FROM lineitem
            UNION ALL
            SELECT 0.5, QUANTILE_DISC(l_extendedprice, 0.5) FROM lineitem
            UNION ALL
            SELECT 0.75, QUANTILE_DISC(l_extendedprice, 0.75) FROM lineitem
            UNION ALL
            SELECT 0.9, QUANTILE_DISC(l_extendedprice, 0.9) FROM lineitem
        """,
        "filter_project": """
            SELECT l_orderkey, l_linenumber,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                     * CAST(ROUND((1 - l_discount) * 100) AS BIGINT) / 10000.0 AS revenue
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '1996-01-01'
        """,
        "groupby_agg": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 6) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_price,
                   COUNT(*) AS n,
                   ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        """,
        "two_key_mean": """
            SELECT user_id, event_type,
                   ROUND(SUM(value) / COUNT(*), 6) AS mean_value
            FROM events
            GROUP BY user_id, event_type
        """,
        "global_minmax": """
            SELECT ROUND(MIN(l_extendedprice), 6) AS min_price,
                   ROUND(MAX(l_extendedprice), 6) AS max_price,
                   ROUND(MIN(l_quantity), 6) AS min_qty,
                   ROUND(MAX(l_quantity), 6) AS max_qty
            FROM lineitem
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice
            FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC
            LIMIT 10
        """,
        "dedup_docs_exact": """
            SELECT doc_id, lang, n_chars FROM (
                SELECT doc_id, lang, n_chars,
                       ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
                FROM documents
            ) WHERE rn = 1
        """,
        "dedup_latest_events": """
            SELECT user_id, ts, event_type FROM (
                SELECT user_id, ts, event_type,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                       ) AS rn
                FROM events
            ) WHERE rn = 1
        """,
        "token_count_docs": """
            SELECT doc_id,
                   CAST(len(string_split(text, ' ')) AS BIGINT) AS token_count
            FROM documents
        """,
        "lang_hist": """
            SELECT lang, COUNT(*) AS docs, CAST(SUM(n_chars) AS BIGINT) AS chars
            FROM documents
            GROUP BY lang
        """,
        "broadcast_join_counts": """
            SELECT r.r_name, COUNT(*) AS customers
            FROM customer c
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        """,
        "hash_join_revenue": """
            SELECT o.o_orderstatus,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_items
            FROM orders o
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderstatus
        """,
        "window_hourly": """
            SELECT user_id, date_trunc('hour', ts) AS hour,
                   COUNT(*) AS n, ROUND(SUM(value), 6) AS sum_value
            FROM events
            GROUP BY user_id, date_trunc('hour', ts)
        """,
        "prev_event_ts": """
            SELECT event_id,
                   LAG(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS prev_ts
            FROM events
        """,
        "cell_rollup_events": """
            SELECT parent, ROUND(AVG(mean_value), 6) AS parent_mean,
                   COUNT(*) AS n_cells
            FROM (
                SELECT (user_id & 255) // 4 AS parent,
                       user_id & 255 AS cell,
                       SUM(value) / COUNT(*) AS mean_value
                FROM events
                GROUP BY user_id & 255
            )
            GROUP BY parent
        """,
        "distinct_pairs": """
            SELECT DISTINCT lang, source FROM documents
        """,
        "backfill_join": """
            SELECT o.o_orderkey, o.o_orderstatus,
                   ROUND(COALESCE(l.total_qty, 0), 6) AS total_qty
            FROM orders o
            LEFT JOIN (
                SELECT l_orderkey, SUM(l_quantity) AS total_qty
                FROM lineitem GROUP BY l_orderkey
            ) l ON o.o_orderkey = l.l_orderkey
        """,
        "sessionize": """
            SELECT user_id,
                   MIN(ts) AS session_start,
                   MAX(ts) AS session_end,
                   COUNT(*) AS n_events
            FROM (
                SELECT user_id, ts,
                       SUM(new_session) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING
                       ) AS session_idx
                FROM (
                    SELECT user_id, ts, event_id,
                           CASE WHEN ts - LAG(ts) OVER (
                               PARTITION BY user_id ORDER BY ts, event_id
                           ) > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
                    FROM events
                )
            )
            GROUP BY user_id, session_idx
        """,
        "knn_embeddings": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id ASC
                       ) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
            ) WHERE rank <= 3
        """,
        "doc_quality": """
            SELECT doc_id,
                   CAST(STRLEN(text) AS BIGINT) AS n_bytes,
                   ROUND(alpha * 1.0 / GREATEST(STRLEN(text), 1), 6)
                       AS alpha_ratio,
                   ROUND(LEAST(GREATEST((
                       (1 - LEAST(ABS(STRLEN(text) * 1.0 / GREATEST(tok, 1) - 5) / 5, 1))
                       + alpha * 1.0 / GREATEST(STRLEN(text), 1)
                   ) / 2, 0), 1), 6) AS score
            FROM (
                SELECT doc_id, text,
                       LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                       LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z0-9_]+')) AS tok
                FROM documents
            )
        """,
        "sliding_window": """
            SELECT event_id,
                   ROUND(SUM(value) OVER (
                       PARTITION BY user_id ORDER BY ts
                       RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
                   ), 6) AS win_sum
            FROM events
        """,
        "range_join": """
            WITH bands AS (
                SELECT i AS band_id, 50000.0 * i AS lo,
                       50000.0 * i + 75000.0 AS hi
                FROM range(10) t(i)
            )
            SELECT b.band_id AS band_id,
                   COUNT(*) AS n_orders,
                   ROUND(SUM(o.o_totalprice), 2) AS total
            FROM orders o JOIN bands b
              ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
            GROUP BY b.band_id
        """,
        "asof_join": """
            SELECT e.event_id, e.user_id, e.ts,
                   CAST(o.o_orderkey AS DOUBLE) AS o_orderkey
            FROM events e ASOF LEFT JOIN (
                SELECT o_custkey, o_orderdate, MAX(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            ) o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        """,
        # full-probe IVF is exact search -> same brute-force oracle
        "knn_embeddings_ivf": """
            SELECT query_id, neighbor_id, rank FROM (
                SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                       ROW_NUMBER() OVER (
                           PARTITION BY q.vec_id
                           ORDER BY list_cosine_similarity(
                               CAST(q.embedding AS DOUBLE[]),
                               CAST(c.embedding AS DOUBLE[])) DESC,
                               c.vec_id ASC
                       ) AS rank
                FROM embeddings q, embeddings c
                WHERE q.vec_id < 5 AND c.vec_id <> q.vec_id
            ) WHERE rank <= 3
        """,
        # --- web-analytics family (pipelines/analytic.py) ---
        "funnel_stages": """
            WITH s1 AS (
                SELECT user_id, MIN(ts) AS t FROM events
                WHERE event_type = 'signup' GROUP BY 1
            ),
            s2 AS (
                SELECT e.user_id, MIN(e.ts) AS t
                FROM events e JOIN s1 ON e.user_id = s1.user_id
                WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1
            ),
            s3 AS (
                SELECT e.user_id, MIN(e.ts) AS t
                FROM events e JOIN s2 ON e.user_id = s2.user_id
                WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
            )
            SELECT 'signup' AS stage,
                   CAST((SELECT COUNT(*) FROM s1) AS BIGINT) AS n_users
            UNION ALL
            SELECT 'view', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
            UNION ALL
            SELECT 'purchase', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
        """,
        "cohort_retention": """
            WITH f AS (
                SELECT user_id, MIN(date_trunc('day', ts)) AS cohort_day
                FROM events GROUP BY 1
            ),
            a AS (
                SELECT DISTINCT user_id, date_trunc('day', ts) AS day
                FROM events
            )
            SELECT f.cohort_day,
                   CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT)
                       AS day_offset,
                   CAST(COUNT(*) AS BIGINT) AS n_users
            FROM a JOIN f ON a.user_id = f.user_id
            GROUP BY 1, 2
        """,
        "decayed_count": """
            WITH d AS (
                SELECT event_type,
                       date_diff('day', date_trunc('day', ts),
                           (SELECT MAX(date_trunc('day', ts)) FROM events))
                           AS age,
                       COUNT(*) AS n
                FROM events GROUP BY 1, 2
            )
            SELECT event_type,
                   ROUND(SUM(n * POWER(2.0, -age / 7.0)), 6) AS decayed_n
            FROM d GROUP BY 1
        """,
        "source_lang_entropy": """
            WITH c AS (
                SELECT source, lang, COUNT(*) AS n
                FROM documents GROUP BY 1, 2
            ),
            t AS (SELECT source, SUM(n) AS tot FROM c GROUP BY 1)
            SELECT c.source,
                   ROUND(SUM(-(c.n / t.tot) * LN(c.n / t.tot)), 6) AS entropy
            FROM c JOIN t ON c.source = t.source
            GROUP BY 1
        """,
        "skyline_orders": """
            SELECT o_orderkey, o_totalprice, o_orderdate
            FROM orders o
            WHERE o_orderpriority = '1-URGENT'
              AND NOT EXISTS (
                SELECT 1 FROM orders b
                WHERE b.o_orderpriority = '1-URGENT'
                  AND b.o_totalprice >= o.o_totalprice
                  AND b.o_orderdate <= o.o_orderdate
                  AND (b.o_totalprice > o.o_totalprice
                       OR b.o_orderdate < o.o_orderdate)
              )
        """,
        # exact-integer revenue units (cents x (100 - discount pct)) summed
        # as BIGINT on both engines -> the final 2dp round is order-free
        "q5_nation_revenue": """
            SELECT n_name,
                   ROUND(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
                         / 10000.0, 2) AS revenue
            FROM customer, orders, lineitem, supplier, nation, region
            WHERE c_custkey = o_custkey
              AND l_orderkey = o_orderkey
              AND l_suppkey = s_suppkey
              AND c_nationkey = s_nationkey
              AND s_nationkey = n_nationkey
              AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY 1
        """,
        "q8_market_share": """
            SELECT year,
                   ROUND(CAST(SUM(CASE WHEN nation = 'NATION_9' THEN units ELSE 0 END) AS DOUBLE)
                         / CAST(SUM(units) AS DOUBLE), 6) AS mkt_share
            FROM (
              SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS year,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS units,
                     n2.n_name AS nation
              FROM part, lineitem, orders, customer, supplier,
                   nation n1, nation n2, region
              WHERE p_partkey = l_partkey AND l_orderkey = o_orderkey
                AND o_custkey = c_custkey
                AND c_nationkey = n1.n_nationkey
                AND n1.n_regionkey = r_regionkey AND r_name = 'AMERICA'
                AND s_suppkey = l_suppkey AND s_nationkey = n2.n_nationkey
                AND o_orderdate >= TIMESTAMP '1995-01-01'
                AND o_orderdate < TIMESTAMP '1997-01-01'
                AND p_type = 'PROMO'
            )
            GROUP BY year
        """,
        "q7_volume_shipping": """
            SELECT supp_nation, cust_nation, l_year,
                   ROUND(SUM(units) / 10000.0, 2) AS revenue
            FROM (
              SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
                     CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
                     CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                       * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS units
              FROM customer, orders, lineitem, supplier,
                   nation n1, nation n2
              WHERE c_custkey = o_custkey AND o_orderkey = l_orderkey
                AND s_suppkey = l_suppkey
                AND c_nationkey = n1.n_nationkey
                AND s_nationkey = n2.n_nationkey
                AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_9')
                     OR (n1.n_name = 'NATION_9' AND n2.n_name = 'NATION_3'))
                AND l_shipdate >= TIMESTAMP '1995-01-01'
                AND l_shipdate < TIMESTAMP '1997-01-01'
            )
            GROUP BY 1, 2, 3
        """,
        "q18_large_orders": """
            SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate,
                   o.o_totalprice,
                   CAST(SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
            FROM orders o
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON c.c_custkey = o.o_custkey
            GROUP BY 1, 2, 3, 4, 5
            HAVING SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) > 180
        """,
        "part_best_supplier": """
            WITH ps AS (
              SELECT l_partkey AS p_partkey, l_suppkey AS s_suppkey,
                     CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS BIGINT) AS units
              FROM lineitem GROUP BY 1, 2
            ), best AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY p_partkey ORDER BY units DESC, s_suppkey
              ) AS rn FROM ps
            )
            SELECT b.p_partkey, b.s_suppkey, s.s_name, b.units
            FROM best b JOIN supplier s ON s.s_suppkey = b.s_suppkey
            WHERE rn = 1
        """,
        "supplier_cnt_by_part": """
            SELECT p_brand, p_size,
                   CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
            FROM lineitem JOIN part ON p_partkey = l_partkey
            WHERE l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
            )
            GROUP BY 1, 2
        """,
        "orders_above_nation_avg": """
            WITH oc AS (
              SELECT o.o_orderkey,
                     CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS cents,
                     c.c_nationkey
              FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
            ), na AS (
              SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(cents) AS BIGINT) AS s
              FROM oc GROUP BY 1
            )
            SELECT oc.o_orderkey
            FROM oc JOIN na USING (c_nationkey)
            WHERE oc.cents * na.n > na.s
        """,
        "custdist_hist": """
            SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
            FROM (
              SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
              FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
              GROUP BY c.c_custkey
            )
            GROUP BY c_count
        """,
        "dormant_customers": """
            WITH pos AS (
              SELECT c_custkey, c_nationkey,
                     CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
              FROM customer WHERE c_acctbal > 0.0
            ),
            par AS (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     CAST(SUM(cents) AS BIGINT) AS s
              FROM pos
            ),
            dormant AS (
              SELECT p.c_custkey, p.c_nationkey, p.cents
              FROM pos p, par
              WHERE p.cents * par.n > par.s
                AND NOT EXISTS (SELECT 1 FROM orders o
                                WHERE o.o_custkey = p.c_custkey
                                  AND o.o_orderdate >= TIMESTAMP '1999-01-01')
            )
            SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
                   CAST(COUNT(*) AS BIGINT) AS numcust,
                   ROUND(CAST(SUM(cents) AS BIGINT) / 100.0, 2) AS totacctbal
            FROM dormant GROUP BY 1
        """,
    }
