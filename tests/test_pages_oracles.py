"""Engine vs DuckDB-oracle parity for the pages-based spatial queries.

Runs the exact oracle SQL the driver's correctness gate uses
(data_model_ray.oracles), at the sf0.001 scale (n=10k pages), and requires
EXACT frame equality — the oracles replicate the engine's arithmetic
expression-for-expression, so even the doubles must agree bitwise (modulo
the documented 6-decimal rounding of order-dependent float sums).
"""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry
from data_model_ray import fixtures, oracles

N = 10_000
SF = "/root/testdata/sf0.001"  # fixtures.rows_for_sf(0.001) == N


@pytest.fixture(scope="module")
def con(ray_session):
    assert fixtures.rows_for_sf(0.001) == N
    fixtures.ensure_pages_parquet(N)
    fixtures.ensure_side_tables()
    c = duckdb.connect()
    c.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    c.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _assert_parity(got, want: pd.DataFrame):
    got = got.to_pandas() if hasattr(got, "to_pandas") else got
    if len(got) == 0 and len(want) == 0:
        return
    pd.testing.assert_frame_equal(_norm(got), _norm(want), check_exact=True)


def _host_counts_sql() -> str:
    return f"""
        SELECT SPLIT_PART(url, '/', 3) AS host,
               COUNT(*) AS n_pages,
               COUNT(DISTINCT url) AS n_urls
        FROM read_parquet('/tmp/graft_pages/n{N}/*.parquet')
        GROUP BY 1
    """


QUERY_CASES = [
    ("pages_assignments", lambda: oracles.pages_assignments_sql(N)),
    ("pages_cell_stats", lambda: oracles.pages_cell_stats_sql(N)),
    ("pages_raster", lambda: oracles.pages_raster_sql(N)),
    ("pages_knn", lambda: oracles.pages_knn_sql(N)),
    ("pages_host_counts", _host_counts_sql),
    ("pages_focal_stats", lambda: oracles.pages_focal_stats_sql(N)),
    ("pages_hotspot", lambda: oracles.pages_hotspot_sql(N)),
    ("pages_idw", lambda: oracles.pages_idw_sql(N)),
    ("pages_distance_pairs", lambda: oracles.pages_distance_pairs_sql(N)),
    ("pages_host_dispersion", lambda: oracles.pages_host_dispersion_sql(N)),
    ("pages_vectorize", lambda: oracles.pages_vectorize_sql(N)),
    ("pages_bbox_query", lambda: oracles.pages_bbox_query_sql(N)),
    ("pages_utm_zones", lambda: oracles.pages_utm_zones_sql(N)),
    ("pages_lang_histogram", lambda: oracles.pages_lang_histogram_sql(N)),
    ("pages_host_gaps", lambda: oracles.pages_host_gaps_sql(N)),
    ("pages_admin_rollup", lambda: oracles.pages_admin_rollup_sql(N)),
    ("pages_nearest_granule", lambda: oracles.pages_nearest_granule_sql(N)),
    ("pages_cell_freshness", lambda: oracles.pages_cell_freshness_sql(N)),
    ("pages_cell_churn", lambda: oracles.pages_cell_churn_sql(N)),
    ("pages_granule_coverage", lambda: oracles.pages_granule_coverage_sql(N)),
    ("pages_kde_heatmap", lambda: oracles.pages_kde_heatmap_sql(N)),
    ("pages_focal_pyramid", lambda: oracles.pages_focal_pyramid_sql(N)),
    ("langid_docs", oracles.langid_docs_sql),
    ("embedding_near_dups", lambda: oracles.embedding_near_dups_sql(0.4)),
]


@pytest.mark.parametrize("name,sql_builder", QUERY_CASES, ids=[c[0] for c in QUERY_CASES])
def test_pages_query_matches_oracle(con, name, sql_builder):
    got = entry.queries()[name](SF)
    want = con.sql(sql_builder()).df()
    _assert_parity(got, want)


def test_oracle_sql_includes_pages_queries():
    sqls = entry.oracle_sql()
    for name, _ in QUERY_CASES:
        assert name in sqls, f"driver oracle missing for {name}"
