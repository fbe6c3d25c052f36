"""DuckDB oracle SQL for the pages-based spatial queries.

Every oracle replicates the engine's arithmetic EXPRESSION-FOR-EXPRESSION
(same operand order, so IEEE doubles agree bitwise): GeoCell encode is the
floor arithmetic of ``grid.geocell_encode``, MGRS assignment is the
half-open rect containment + lexicographic-min tie-break of
``functions.pip.RectIndex.assign``, admin assignment is the even-odd
ray-cast parity of ``functions.pip.points_in_polygon`` (same edge
orientation, same ``x_at`` formula) with min-id tie-break, and the text
stats mirror ``stages.text._byte_counts`` (ASCII corpus: RE2 char counts ==
byte counts). Quantities whose accumulation order is engine-dependent
(float sums, cosines) are rounded to 6 decimals on BOTH sides.

The SQL reads the synthesized pages parquet + side tables from
``/tmp/graft_pages`` (written by ``fixtures.ensure_pages_parquet`` /
``ensure_side_tables``); the builders are parameterized by row count so
tests can exercise the same SQL at smaller scales than the driver's sf0.01.
"""

from __future__ import annotations

GRAFT_ROOT = "/tmp/graft_pages"
EARTH_DEG = "111.19492664455873"  # stages.knn.EARTH_DEG, exact literal
# exponent form parses as DOUBLE in DuckDB (the plain literal becomes
# DECIMAL(17,14), and a DOUBLE*DECIMAL multiply diverges in the last ulp
# — measured on SQRT(maxd2)*EARTH_DEG); bit-equal to the python float
EARTH_DEG_DOUBLE = "1.1119492664455873e2"
H3_BASE = 7 << 56  # GeoCell res-7 id prefix (grid.py id layout)
KNN_HOST_PREFIX = "https://host3."  # deterministic kNN query subset

_GEO_RE = r'geo\.position" content="(-?[0-9.]+);(-?[0-9.]+)"'

# LangId marker chain — must match stages.text.LANG_MARKERS order exactly
# (numpy argmax keeps the FIRST max; the CASE chain does the same).
_LANG_MARKERS = [
    ("en", "the|and|of|to|in"),
    ("de", "der|die|und|das|ist"),
    ("fr", "le|la|les|et|est"),
    ("es", "el|la|los|que|es"),
    ("ru", "i|v|ne|na|chto"),
    ("zh", "de|shi|le|zai|he"),
    ("ja", "no|ni|wa|wo|ga"),
]


def _base_ctes(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Shared CTE chain: pages -> extracted -> deduped -> h3 (+ text stats)."""
    pages_glob = f"{root}/n{n_rows}/*.parquet"
    return f"""
  pages AS (
    SELECT url, warc_ts, decode(html) AS h, text, lang
    FROM read_parquet('{pages_glob}')
  ),
  extracted AS (
    SELECT url, warc_ts, lang, text,
           CAST(length(text) AS BIGINT) AS text_len,
           CAST(regexp_extract(h, '{_GEO_RE}', 1) AS DOUBLE) AS lat,
           CAST(regexp_extract(h, '{_GEO_RE}', 2) AS DOUBLE) AS lon
    FROM pages
  ),
  deduped AS (
    SELECT * FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY url ORDER BY warc_ts DESC) AS rn
      FROM extracted
    ) WHERE rn = 1
  ),
  h3 AS (
    SELECT url, warc_ts, lang, text, text_len, lat, lon,
           {H3_BASE} + GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 512.0) AS BIGINT), 511), 0) * 268435456
                     + GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * 1024.0) AS BIGINT), 1023), 0) AS h3_7
    FROM deduped
  )"""


def _admin_ctes(root: str = GRAFT_ROOT) -> str:
    """Even-odd ray-cast PIP per level with bbox prefilter + min-id tie-break.

    Mirrors functions.pip.points_in_polygon: crossing iff
    (yi > py) != (yj > py) AND px < xi + (py - yi) * (xj - xi) / (yj - yi)
    — same operand order, so the doubles agree bitwise. NULLIF guards the
    division; whenever the crossing test is true the denominator is nonzero.
    """
    edges = f"{root}/admin_edges.parquet"
    parts = []
    for lvl in (0, 1):
        parts.append(f"""
  admin_cand_{lvl} AS (
    SELECT d.url, e.admin_id,
           SUM(CASE WHEN (e.yi > d.lat) <> (e.yj > d.lat)
                     AND d.lon < e.xi + (d.lat - e.yi) * (e.xj - e.xi) / NULLIF(e.yj - e.yi, 0.0)
               THEN 1 ELSE 0 END) AS crossings
    FROM h3 d JOIN read_parquet('{edges}') e
      ON e.level = {lvl}
     AND d.lon >= e.bx0 AND d.lon <= e.bx1
     AND d.lat >= e.by0 AND d.lat <= e.by1
    GROUP BY d.url, e.admin_id
  ),
  admin{lvl} AS (
    SELECT url, MIN(admin_id) AS admin_l{lvl}
    FROM admin_cand_{lvl} WHERE crossings % 2 = 1 GROUP BY url
  )""")
    return ",".join(parts)


_TEXT_STATS_CTES = """
  stats AS (
    SELECT *,
           CAST(strlen(text) AS BIGINT) AS nb,
           CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS nl,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS nt
    FROM h3
  ),
  scored AS (
    SELECT *,
           CASE WHEN nb < 80 THEN 1 ELSE 0 END
             + CASE WHEN nb > 4000 THEN 2 ELSE 0 END
             + CASE WHEN CAST(nl AS DOUBLE) / CAST(GREATEST(nb, 1) AS DOUBLE) < 0.6 THEN 4 ELSE 0 END AS flag,
           LEAST(GREATEST((
               (1.0 - LEAST(ABS(CAST(nb AS DOUBLE) / CAST(GREATEST(nt, 1) AS DOUBLE) - 5.0) / 5.0, 1.0))
               + CAST(nl AS DOUBLE) / CAST(GREATEST(nb, 1) AS DOUBLE)
             ) / 2.0, 0.0), 1.0) AS score
    FROM stats
  ),
  cell_stats AS (
    SELECT h3_7 AS cell,
           CAST(COUNT(*) AS BIGINT) AS pages,
           CAST(SUM(text_len) AS BIGINT) AS text_bytes,
           CAST(SUM(nt) AS BIGINT) AS token_sum,
           CAST(MAX(flag) AS BIGINT) AS flag_max,
           MIN(lat) AS lat_min, MAX(lat) AS lat_max,
           MIN(lon) AS lon_min, MAX(lon) AS lon_max,
           arg_min(lang, url) AS lang_first,
           CAST(SUM(text_len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_text_len,
           ROUND(LEAST(GREATEST(SUM(score) / CAST(COUNT(*) AS DOUBLE), 0.0), 1.0), 6) AS score_mean
    FROM scored GROUP BY h3_7
  )"""


def pages_assignments_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    granules = f"{root}/granules.parquet"
    return f"""
WITH {_base_ctes(n_rows, root)},
  granule AS (
    SELECT d.url, COALESCE(MIN(g.mgrs), '') AS mgrs
    FROM h3 d LEFT JOIN read_parquet('{granules}') g
      ON d.lon >= g.xmin AND d.lon < g.xmax
     AND d.lat >= g.ymin AND d.lat < g.ymax
    GROUP BY d.url
  ),
  {_admin_ctes(root)}
SELECT d.url, d.h3_7, g.mgrs,
       CAST(COALESCE(a0.admin_l0, -1) AS BIGINT) AS admin_l0,
       CAST(COALESCE(a1.admin_l1, -1) AS BIGINT) AS admin_l1
FROM h3 d
JOIN granule g USING (url)
LEFT JOIN admin0 a0 USING (url)
LEFT JOIN admin1 a1 USING (url)
"""


def pages_cell_stats_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    return f"""
WITH {_base_ctes(n_rows, root)},
{_TEXT_STATS_CTES}
SELECT * FROM cell_stats
"""


def pages_raster_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """rasterize_level arithmetic over cell_stats (north-up rows, 256 tiles)."""
    return f"""
WITH {_base_ctes(n_rows, root)},
{_TEXT_STATS_CTES},
  rc AS (
    SELECT *,
           (cell - {H3_BASE}) // 268435456 AS i_lat,
           (cell - {H3_BASE}) % 268435456 AS i_lon
    FROM cell_stats
  )
SELECT CAST(7 AS BIGINT) AS level,
       CAST(i_lon // 256 AS BIGINT) AS tile_x,
       CAST((511 - i_lat) // 256 AS BIGINT) AS tile_y,
       CAST(i_lon % 256 AS BIGINT) AS px,
       CAST((511 - i_lat) % 256 AS BIGINT) AS py,
       pages, text_bytes, token_sum, flag_max,
       lat_min, lat_max, lon_min, lon_max,
       lang_first, mean_text_len, score_mean
FROM rc
"""


def pages_knn_sql(n_rows: int, root: str = GRAFT_ROOT, *, k: int = 5) -> str:
    """Exact bounded-radius kNN over the deterministic host subset.

    Ring-1 candidacy via the 9-cell equi-join; distance is the engine's
    wrapped equirectangular metric with identical operand order. dist_km is
    excluded from the compared output (libm cos may differ in the last ulp
    between engines); ordering is unaffected except for exact coordinate
    ties, which break by neighbor id identically on both sides.
    """
    e = EARTH_DEG_DOUBLE  # exponent-form DOUBLE: bit-identical multiply (ADVICE r4)
    return f"""
WITH {_base_ctes(n_rows, root)},
  q AS (
    SELECT DISTINCT url, lat, lon FROM extracted
    WHERE starts_with(url, '{KNN_HOST_PREFIX}')
  ),
  qc AS (
    SELECT url, lat, lon,
           GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 512.0) AS BIGINT), 511), 0) AS i_lat,
           GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * 1024.0) AS BIGINT), 1023), 0) AS i_lon
    FROM q
  ),
  pairs AS (
    SELECT a.url AS url, b.url AS neighbor,
           ((b.lat - a.lat) * {e}) AS dy,
           ((((b.lon - a.lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0) * {e}
             * COS(RADIANS((a.lat + b.lat) / 2.0))) AS dx
    FROM qc a JOIN qc b
      ON b.i_lat BETWEEN a.i_lat - 1 AND a.i_lat + 1
     AND ((b.i_lon - a.i_lon + 1024) % 1024) IN (0, 1, 1023)
     AND b.url <> a.url
  ),
  ranked AS (
    SELECT url, neighbor,
           ROW_NUMBER() OVER (
             PARTITION BY url ORDER BY dx * dx + dy * dy ASC, neighbor ASC
           ) AS rank
    FROM pairs
  )
SELECT url, neighbor, CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}
"""


def langid_docs_sql() -> str:
    """stages.text.LangId as SQL: marker-count argmax, first max wins."""
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '\\b({pat})\\b')) AS BIGINT) AS c_{lang}"
        for lang, pat in _LANG_MARKERS
    )
    cols = ", ".join(f"c_{lang}" for lang, _ in _LANG_MARKERS)
    chain = "\n           ".join(
        f"WHEN c_{lang} = GREATEST({cols}) THEN '{lang}'"
        for lang, _ in _LANG_MARKERS
    )
    return f"""
WITH c AS (
  SELECT doc_id,
           {counts}
  FROM documents
)
SELECT doc_id,
       CASE WHEN GREATEST({cols}) = 0 THEN 'und'
           {chain}
       END AS lang_pred
FROM c
"""


def embedding_near_dups_sql(threshold: float = 0.4) -> str:
    return f"""
SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
       ROUND(list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                    CAST(c.embedding AS DOUBLE[])), 6) AS cos
FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
WHERE list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                             CAST(c.embedding AS DOUBLE[])) >= {threshold}
"""


def pages_zonal_stats_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-admin-l1-polygon zonal aggregate over the deduped pages
    (mirrors pipelines.webtext.zonal_stats: COALESCE(admin_l1, -1) zones,
    exact integer sums, one int/int double division for the mean)."""
    return f"""
WITH {_base_ctes(n_rows, root)},
{_admin_ctes(root)},
{_TEXT_STATS_CTES}
SELECT CAST(COALESCE(a1.admin_l1, -1) AS BIGINT) AS zone,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(SUM(d.text_len) AS BIGINT) AS text_bytes,
       CAST(SUM(d.nt) AS BIGINT) AS token_sum,
       CAST(SUM(d.text_len) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_text_len
FROM stats d
LEFT JOIN admin1 a1 USING (url)
GROUP BY 1
"""


def incremental_dedup_sql(
    n_rows: int, root: str = GRAFT_ROOT, cutoff: str = "2024-07-01 00:00:00"
) -> str:
    """Recrawl dedup: new-snapshot rows whose url never appeared in the
    old snapshot (webtext.incremental_dedup's NOT EXISTS semantics; the
    engine's bloom filter is a prefilter only, so the output is exact)."""
    pages_glob = f"{root}/n{n_rows}/*.parquet"
    return f"""
WITH p AS (SELECT url, warc_ts FROM read_parquet('{pages_glob}'))
SELECT url, warc_ts FROM p n
WHERE n.warc_ts >= TIMESTAMP '{cutoff}'
  AND NOT EXISTS (
      SELECT 1 FROM p o
      WHERE o.warc_ts < TIMESTAMP '{cutoff}' AND o.url = n.url
  )
"""


def pii_scan_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Regex PII scan over distinct urls (RE2 on both sides: DuckDB
    regexp_* and Arrow count/replace_substring_regex agree match-for-match)."""
    pages_glob = f"{root}/n{n_rows}/*.parquet"
    email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    return f"""
SELECT DISTINCT url,
       CAST(len(regexp_extract_all(url, '{email}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(url, '[0-9]+')) AS BIGINT) AS n_digit_runs,
       regexp_replace(url, '[0-9]+', '#', 'g') AS redacted_url
FROM read_parquet('{pages_glob}')
"""


# ---------------------------------------------------------------------------
# spatial-analytics family (pipelines/spatial.py) — every expression below
# mirrors the engine kernel operand-for-operand; see that module's docstring
# for the cross-engine exactness discipline (fixed-point IDW weights,
# int64-exact moments, microdegree centroids)
# ---------------------------------------------------------------------------

_OFFSETS_CTE = """
  off AS (
    SELECT a.di, b.dj
    FROM (VALUES (-1), (0), (1)) a(di), (VALUES (-1), (0), (1)) b(dj)
  )"""

_FOCAL_CTES = f"""
  cells AS (
    SELECT h3_7 AS cell, CAST(COUNT(*) AS BIGINT) AS pages FROM h3 GROUP BY h3_7
  ),
  ij AS (
    SELECT cell, pages,
           (cell - {H3_BASE}) // 268435456 AS i,
           (cell - {H3_BASE}) % 268435456 AS j
    FROM cells
  ),
{_OFFSETS_CTE},
  scat AS (
    SELECT i + di AS ti, (j + dj + 1024) % 1024 AS tj, pages
    FROM ij, off WHERE i + di BETWEEN 0 AND 511
  ),
  fs AS (
    SELECT ti, tj,
           CAST(SUM(pages) AS BIGINT) AS focal_pages,
           CAST(COUNT(*) AS BIGINT) AS focal_cells
    FROM scat GROUP BY ti, tj
  )"""


def pages_focal_stats_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """3x3 focal smoothing of per-cell counts (spatial.focal_stats):
    scatter each occupied cell's count to its lat-clipped / lon-wrapped
    9-neighborhood, fold, keep occupied cells only."""
    return f"""
WITH {_base_ctes(n_rows, root)},
{_FOCAL_CTES}
SELECT c.cell, c.pages, fs.focal_pages, fs.focal_cells,
       CAST(fs.focal_pages AS DOUBLE) / CAST(fs.focal_cells AS DOUBLE) AS focal_mean
FROM ij c JOIN fs ON fs.ti = c.i AND fs.tj = c.j
"""


def pages_hotspot_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Getis-Ord-Gi*-style z-score (spatial.hotspot_cells): moments are
    int64-exact sums; mu/S/z replicate the engine's expression order so the
    doubles agree bitwise before the 6dp round."""
    den = (
        "p.s * SQRT((CAST(p.n AS DOUBLE) * CAST(fs.focal_cells AS DOUBLE)"
        " - CAST(fs.focal_cells AS DOUBLE) * CAST(fs.focal_cells AS DOUBLE))"
        " / (CAST(p.n AS DOUBLE) - 1.0))"
    )
    num = (
        "CAST(fs.focal_pages AS DOUBLE)"
        " - CAST(fs.focal_cells AS DOUBLE) * p.mu"
    )
    return f"""
WITH {_base_ctes(n_rows, root)},
{_FOCAL_CTES},
  mom AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(pages) AS BIGINT) AS sp,
           CAST(SUM(pages * pages) AS BIGINT) AS spp
    FROM cells
  ),
  par AS (
    SELECT n,
           CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
           CAST(spp AS DOUBLE) / CAST(n AS DOUBLE) AS m2
    FROM mom
  ),
  par2 AS (
    SELECT n, mu,
           CASE WHEN m2 - mu * mu > 0.0 THEN SQRT(m2 - mu * mu) ELSE 0.0 END AS s
    FROM par
  )
SELECT c.cell, c.pages, fs.focal_pages, fs.focal_cells,
       ROUND(CASE WHEN p.n > 1 AND {den} > 0.0
                  THEN ({num}) / ({den})
                  ELSE 0.0 END, 6) AS gi_z
FROM ij c JOIN fs ON fs.ti = c.i AND fs.tj = c.j CROSS JOIN par2 p
"""


def pages_idw_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """IDW text_len at occupied cell centers (spatial.idw_cells):
    fixed-point planar-degree weights FLOOR(1e6/(1+d2)) -> int64-exact
    weighted sums; one exact double division at the end."""
    return f"""
WITH {_base_ctes(n_rows, root)},
  p AS (
    SELECT url, lat, lon, text_len,
           (h3_7 - {H3_BASE}) // 268435456 AS i,
           (h3_7 - {H3_BASE}) % 268435456 AS j
    FROM h3
  ),
{_OFFSETS_CTE},
  scat AS (
    SELECT i + di AS ti, (j + dj + 1024) % 1024 AS tj,
           CASE WHEN di = 0 AND dj = 0 THEN 1 ELSE 0 END AS own,
           text_len, lat, lon
    FROM p, off WHERE i + di BETWEEN 0 AND 511
  ),
  wgt0 AS (
    SELECT ti, tj, own, text_len,
           (lat - ((ti + 0.5) / 512.0 * 180.0 - 90.0)) AS dlat,
           (lon - ((tj + 0.5) / 1024.0 * 360.0 - 180.0)) AS dlon0
    FROM scat
  ),
  wgt AS (
    -- branch wrap (single add/sub): bit-exact vs the engine's _wrap_deg,
    -- unlike the %360 double-mod whose +360 round trip can lose a bit
    SELECT ti, tj, own, text_len, dlat,
           CASE WHEN dlon0 > 180.0 THEN dlon0 - 360.0
                WHEN dlon0 < -180.0 THEN dlon0 + 360.0
                ELSE dlon0 END AS dlon
    FROM wgt0
  ),
  w2 AS (
    SELECT ti, tj, own, text_len,
           CAST(FLOOR(1000000.0 / (1.0 + (dlat * dlat + dlon * dlon))) AS BIGINT) AS w
    FROM wgt
  ),
  agg AS (
    SELECT ti, tj,
           CAST(SUM(own) AS BIGINT) AS pages,
           CAST(SUM(w) AS BIGINT) AS wsum,
           CAST(SUM(w * text_len) AS BIGINT) AS wv
    FROM w2 GROUP BY ti, tj
  )
SELECT {H3_BASE} + ti * 268435456 + tj AS cell, pages,
       CAST(wv AS DOUBLE) / CAST(wsum AS DOUBLE) AS idw_value
FROM agg WHERE pages > 0
"""


def pages_distance_pairs_sql(
    n_rows: int,
    root: str = GRAFT_ROOT,
    *,
    radius_km: float = 25.0,
    host_prefix: str = KNN_HOST_PREFIX,
) -> str:
    """Bounded-radius distance self-join (spatial.distance_pairs): ring-1
    candidacy via the 9-cell equi-join (same as pages_knn), url_a < url_b
    emits each pair once, the equirectangular metric matches
    stages.knn._equirect_dist2 operand-for-operand (EARTH_DEG_DOUBLE: a plain
    decimal literal parses to DECIMAL(17,14) and diverges in the last ulp —
    an ulp flip at the radius boundary would break pair-set parity)."""
    e = EARTH_DEG_DOUBLE
    r = repr(radius_km)
    return f"""
WITH {_base_ctes(n_rows, root)},
  q AS (
    SELECT DISTINCT url, lat, lon FROM extracted
    WHERE starts_with(url, '{host_prefix}')
  ),
  qc AS (
    SELECT url, lat, lon,
           GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 512.0) AS BIGINT), 511), 0) AS i_lat,
           GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * 1024.0) AS BIGINT), 1023), 0) AS i_lon
    FROM q
  ),
  pairs AS (
    SELECT a.url AS url_a, b.url AS url_b,
           ((b.lat - a.lat) * {e}) AS dy,
           ((((b.lon - a.lon + 180.0) % 360.0 + 360.0) % 360.0 - 180.0) * {e}
             * COS(RADIANS((a.lat + b.lat) / 2.0))) AS dx
    FROM qc a JOIN qc b
      ON b.i_lat BETWEEN a.i_lat - 1 AND a.i_lat + 1
     AND ((b.i_lon - a.i_lon + 1024) % 1024) IN (0, 1, 1023)
     AND a.url < b.url
  )
SELECT url_a, url_b FROM pairs WHERE dx * dx + dy * dy <= {r} * {r}
"""


def pages_host_dispersion_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-host centroid + max-radius spread (spatial.host_dispersion):
    integer-microdegree centroid sums, planar-degree max deviation,
    radius_km = SQRT(maxd2) * EARTH_DEG (all IEEE-deterministic)."""
    e = EARTH_DEG_DOUBLE
    return f"""
WITH {_base_ctes(n_rows, root)},
  hq AS (
    SELECT CAST(regexp_extract(url, '^https://host([0-9]+)\\.', 1) AS BIGINT) AS host,
           lat, lon,
           CAST(FLOOR(lat * 1000000.0 + 0.5) AS BIGINT) AS latq,
           CAST(FLOOR(lon * 1000000.0 + 0.5) AS BIGINT) AS lonq
    FROM h3
  ),
  cent AS (
    SELECT host, CAST(COUNT(*) AS BIGINT) AS n_pages,
           CAST(SUM(latq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS lat_c,
           CAST(SUM(lonq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1000000.0 AS lon_c
    FROM hq GROUP BY host
  ),
  dev0 AS (
    -- branch wrap (see pages_idw_sql): bit-exact vs the engine's _wrap_deg
    SELECT q.host, (q.lat - c.lat_c) AS dlat,
           CASE WHEN (q.lon - c.lon_c) > 180.0 THEN (q.lon - c.lon_c) - 360.0
                WHEN (q.lon - c.lon_c) < -180.0 THEN (q.lon - c.lon_c) + 360.0
                ELSE (q.lon - c.lon_c) END AS dlon
    FROM hq q JOIN cent c USING (host)
  ),
  dev AS (
    SELECT host, MAX(dlat * dlat + dlon * dlon) AS maxd2
    FROM dev0 GROUP BY host
  )
SELECT c.host, c.n_pages, c.lat_c, c.lon_c, SQRT(d.maxd2) * {e} AS radius_km
FROM cent c JOIN dev d USING (host)
"""


def pages_vectorize_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Raster->vector round trip (rasterize_level -> vectorize_tiles ->
    geocell_center): cell ids survive the tile/pixel decomposition and the
    centers replay grid.geocell_center's (i + 0.5) / n * span - origin."""
    return f"""
WITH {_base_ctes(n_rows, root)},
{_TEXT_STATS_CTES},
  rc AS (
    SELECT cell, pages, text_bytes,
           (cell - {H3_BASE}) // 268435456 AS i,
           (cell - {H3_BASE}) % 268435456 AS j
    FROM cell_stats
  )
SELECT cell, (i + 0.5) / 512.0 * 180.0 - 90.0 AS lat_ctr,
       (j + 0.5) / 1024.0 * 360.0 - 180.0 AS lon_ctr,
       pages, text_bytes
FROM rc
"""


def admin_raster_burn_sql(root: str = GRAFT_ROOT, *, level: int = 1) -> str:
    """Vector->raster burn (spatial.admin_raster_burn): every res-7 grid
    cell whose center lies inside a level-`level` polygon, min-id tie-break
    — even-odd crossing with the exact operand order of
    functions.pip.points_in_polygon / PolygonIndex.assign. Scale-free (no
    pages input): the grid is generated, polygons come from the side table.
    """
    edges = f"{root}/admin_edges.parquet"
    return f"""
WITH grid AS (
    SELECT i.range AS i, j.range AS j
    FROM range(0, 512) i, range(0, 1024) j
  ),
  ctr AS (
    SELECT i, j,
           (i + 0.5) / 512.0 * 180.0 - 90.0 AS lat,
           (j + 0.5) / 1024.0 * 360.0 - 180.0 AS lon
    FROM grid
  ),
  cand AS (
    SELECT c.i, c.j, e.admin_id,
           SUM(CASE WHEN (e.yi > c.lat) <> (e.yj > c.lat)
                     AND c.lon < e.xi + (c.lat - e.yi) * (e.xj - e.xi) / NULLIF(e.yj - e.yi, 0.0)
               THEN 1 ELSE 0 END) AS crossings
    FROM ctr c JOIN read_parquet('{edges}') e
      ON e.level = {level}
     AND c.lon >= e.bx0 AND c.lon <= e.bx1
     AND c.lat >= e.by0 AND c.lat <= e.by1
    GROUP BY c.i, c.j, e.admin_id
  )
SELECT {H3_BASE} + i * 268435456 + j AS cell,
       CAST(MIN(admin_id) AS BIGINT) AS admin_id
FROM cand WHERE crossings % 2 = 1 GROUP BY i, j
"""


def pages_bbox_query_sql(
    n_rows: int,
    root: str = GRAFT_ROOT,
    *,
    bbox: tuple[float, float, float, float] = (40.0, 43.0, -120.0, -117.0),
) -> str:
    """Bbox point query (spatial.bbox_query): inclusive lat/lon range over
    the deduped points — the engine answers it by opening only the store's
    intersecting lat-band partitions; the result set is identical."""
    lat0, lat1, lon0, lon1 = bbox
    return f"""
WITH {_base_ctes(n_rows, root)}
SELECT url, lat, lon FROM h3
WHERE lat >= {lat0!r} AND lat <= {lat1!r}
  AND lon >= {lon0!r} AND lon <= {lon1!r}
"""


def pages_cell_churn_sql(
    n_rows: int, root: str = GRAFT_ROOT, cutoff: str = "2024-07-01 00:00:00"
) -> str:
    """Per-cell crawl churn (spatial.cell_churn): presence bits per url
    across the snapshot halves OR-folded, then added/removed/stable counts
    per res-7 cell (lat/lon identical across a url's duplicates, so MIN
    selects the value itself)."""
    return f"""
WITH {_base_ctes(n_rows, root)},
  pres AS (
    SELECT url,
           MAX(CASE WHEN warc_ts < TIMESTAMP '{cutoff}' THEN 1 ELSE 0 END) AS b_old,
           MAX(CASE WHEN warc_ts >= TIMESTAMP '{cutoff}' THEN 1 ELSE 0 END) AS b_new,
           MIN(lat) AS lat, MIN(lon) AS lon
    FROM extracted GROUP BY url
  ),
  pcell AS (
    SELECT {H3_BASE} + GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * 512.0) AS BIGINT), 511), 0) * 268435456
                     + GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * 1024.0) AS BIGINT), 1023), 0) AS cell,
           b_old, b_new
    FROM pres
  )
SELECT cell,
       CAST(SUM(b_new * (1 - b_old)) AS BIGINT) AS added,
       CAST(SUM(b_old * (1 - b_new)) AS BIGINT) AS removed,
       CAST(SUM(b_old * b_new) AS BIGINT) AS stable
FROM pcell GROUP BY cell
"""


def pages_granule_coverage_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-granule coverage (spatial.granule_coverage): page count and
    distinct res-7 cells per assigned MGRS granule (assignment = half-open
    rect containment + lexicographic-min tie-break, same as
    pages_assignments; unassigned pages excluded)."""
    granules = f"{root}/granules.parquet"
    return f"""
WITH {_base_ctes(n_rows, root)},
  assigned AS (
    SELECT d.url, d.h3_7, COALESCE(MIN(g.mgrs), '') AS mgrs
    FROM h3 d LEFT JOIN read_parquet('{granules}') g
      ON d.lon >= g.xmin AND d.lon < g.xmax
     AND d.lat >= g.ymin AND d.lat < g.ymax
    GROUP BY d.url, d.h3_7
  )
SELECT mgrs,
       CAST(COUNT(*) AS BIGINT) AS n_pages,
       CAST(COUNT(DISTINCT h3_7) AS BIGINT) AS n_cells
FROM assigned WHERE mgrs <> '' GROUP BY mgrs
"""


def pages_kde_heatmap_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """KDE heatmap (spatial.kde_heatmap): 5x5 integer-kernel density —
    weights are the SAME literals the engine uses (spatial.KDE_WEIGHTS),
    so the sum is int64-exact on both engines."""
    from .pipelines.spatial import KDE_K, KDE_WEIGHTS

    offs = ",\n           ".join(
        f"({di}, {dj}, {KDE_WEIGHTS[di * di + dj * dj]})"
        for di in range(-KDE_K, KDE_K + 1)
        for dj in range(-KDE_K, KDE_K + 1)
    )
    return f"""
WITH {_base_ctes(n_rows, root)},
  cells AS (
    SELECT h3_7 AS cell, CAST(COUNT(*) AS BIGINT) AS pages FROM h3 GROUP BY h3_7
  ),
  ij AS (
    SELECT cell, pages,
           (cell - {H3_BASE}) // 268435456 AS i,
           (cell - {H3_BASE}) % 268435456 AS j
    FROM cells
  ),
  off (di, dj, w) AS (
    VALUES {offs}
  ),
  scat AS (
    SELECT i + di AS ti, (j + dj + 1024) % 1024 AS tj, pages * w AS contrib
    FROM ij, off WHERE i + di BETWEEN 0 AND 511
  ),
  kde AS (
    SELECT ti, tj, CAST(SUM(contrib) AS BIGINT) AS kde
    FROM scat GROUP BY ti, tj
  )
SELECT c.cell, c.pages, k.kde
FROM ij c JOIN kde k ON k.ti = c.i AND k.tj = c.j
"""


def pages_focal_pyramid_sql(
    n_rows: int, root: str = GRAFT_ROOT, levels: tuple = (7, 6, 5)
) -> str:
    """Multi-res focal pyramid (spatial.focal_pyramid): the engine rolls
    res-7 counts up the /2 parent ladder (i>>1, j>>1); the oracle re-encodes
    each level directly from lat/lon — equivalent because scaling by 2^k is
    IEEE-exact, so floor(x*2^(r-1)) == floor(x*2^r) >> 1 and the clip bounds
    halve consistently."""
    parts = []
    for r in levels:
        n_lat = 4 << r
        n_lon = 8 << r
        base = r << 56
        parts.append(f"""
SELECT {base} + i * 268435456 + j AS cell, pages,
       fs.focal_pages, fs.focal_cells,
       CAST(fs.focal_pages AS DOUBLE) / CAST(fs.focal_cells AS DOUBLE) AS focal_mean,
       CAST({r} AS BIGINT) AS res
FROM (
  SELECT GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * {n_lat}.0) AS BIGINT), {n_lat - 1}), 0) AS i,
         GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * {n_lon}.0) AS BIGINT), {n_lon - 1}), 0) AS j,
         CAST(COUNT(*) AS BIGINT) AS pages
  FROM h3 GROUP BY 1, 2
) c
JOIN (
  SELECT i + di AS ti, (j + dj + {n_lon}) % {n_lon} AS tj,
         CAST(SUM(pages) AS BIGINT) AS focal_pages,
         CAST(COUNT(*) AS BIGINT) AS focal_cells
  FROM (
    SELECT GREATEST(LEAST(CAST(FLOOR((lat + 90.0) / 180.0 * {n_lat}.0) AS BIGINT), {n_lat - 1}), 0) AS i,
           GREATEST(LEAST(CAST(FLOOR((((lon + 180.0) % 360.0 + 360.0) % 360.0) / 360.0 * {n_lon}.0) AS BIGINT), {n_lon - 1}), 0) AS j,
           CAST(COUNT(*) AS BIGINT) AS pages
    FROM h3 GROUP BY 1, 2
  ) s, (SELECT a.di, b.dj
        FROM (VALUES (-1), (0), (1)) a(di), (VALUES (-1), (0), (1)) b(dj)) o
  WHERE i + di BETWEEN 0 AND {n_lat - 1}
  GROUP BY ti, tj
) fs ON fs.ti = c.i AND fs.tj = c.j""")
    union = "\nUNION ALL\n".join(parts)
    return f"""
WITH {_base_ctes(n_rows, root)}
{union}
"""


def pages_utm_zones_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-UTM-zone stats over the multi-CRS subset (spatial.utm_zone_stats).

    The engine positions geo.utm pages by reprojecting UTM->WGS84 through
    the from-scratch Krüger inverse (stages/extract._apply_utm_override);
    this oracle reads the geo.position twin directly, so hash parity
    proves the in-pipeline reprojection round-trips to the exact source
    doubles (fixtures embed both encodings of the same point; the 6dp
    round-trip is exact — series error <= 2.2e-7 deg < the 5e-7 rounding
    radius). Zone comes from the SAME meta both sides parse.
    """
    pages_glob = f"{root}/n{n_rows}/*.parquet"
    return f"""
WITH pages AS (
    SELECT url, decode(html) AS h FROM read_parquet('{pages_glob}')
  ),
  utm AS (
    SELECT DISTINCT url,
      CAST(regexp_extract(h, 'geo\\.utm" content="([0-9]+);', 1) AS BIGINT) AS zone,
      CAST(regexp_extract(h, '{_GEO_RE}', 1) AS DOUBLE) AS lat,
      CAST(regexp_extract(h, '{_GEO_RE}', 2) AS DOUBLE) AS lon
    FROM pages WHERE contains(h, '"geo.utm"')
  )
SELECT zone, COUNT(*) AS n_urls,
       MIN(lat) AS lat_min, MAX(lat) AS lat_max,
       MIN(lon) AS lon_min, MAX(lon) AS lon_max
FROM utm GROUP BY zone
"""


def pages_lang_histogram_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-cell language histogram (spatial.cell_lang_histogram — the
    crawl-product store's quality/langdist member). Counts are exact ints;
    the closed vocabulary + catch-all mirrors functions/product.py."""
    langs = ("en", "de", "fr", "es", "zh", "ru", "ja")
    cases = ",\n       ".join(
        f"CAST(SUM(CASE WHEN lang = '{l}' THEN 1 ELSE 0 END) AS BIGINT) AS lang_{l}"
        for l in langs
    )
    quoted = ", ".join(f"'{l}'" for l in langs)
    return f"""
WITH {_base_ctes(n_rows, root)}
SELECT h3_7 AS cell,
       {cases},
       CAST(SUM(CASE WHEN lang NOT IN ({quoted}) THEN 1 ELSE 0 END) AS BIGINT) AS lang_other
FROM h3 GROUP BY 1
"""


def pages_host_gaps_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-host fetch-gap stats (urlops.host_fetch_gaps): all fetch
    records (duplicates included), min/median inter-fetch gap in seconds.
    Gap multisets depend only on the sorted timestamp sequence (ties need
    no tiebreak); µs-int gaps divide by 1e6 identically on both engines;
    MEDIAN of an even count is (a+b)/2 in double on both."""
    pages_glob = f"{root}/n{n_rows}/*.parquet"
    return f"""
WITH f AS (
    SELECT SPLIT_PART(url, '/', 3) AS host, warc_ts
    FROM read_parquet('{pages_glob}')
  ),
  g AS (
    SELECT host,
           date_diff('microsecond',
                     LAG(warc_ts) OVER (PARTITION BY host ORDER BY warc_ts),
                     warc_ts) AS gap_us
    FROM f
  )
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
       MIN(gap_us) / 1000000.0 AS min_gap_s,
       MEDIAN(gap_us) / 1000000.0 AS med_gap_s
FROM g GROUP BY host
HAVING COUNT(gap_us) >= 1
"""


def pages_admin_rollup_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Zonal rollup per admin-l0 polygon (spatial.admin_rollup): page
    count + mean text length over deduped pages; -1 = no polygon. The
    mean divides two exact int64s, so doubles agree bitwise; ROUND is
    half-away on both sides."""
    return f"""
WITH {_base_ctes(n_rows, root)},
  {_admin_ctes(root)}
SELECT CAST(COALESCE(a0.admin_l0, -1) AS BIGINT) AS admin_l0,
       CAST(COUNT(*) AS BIGINT) AS pages,
       ROUND(CAST(SUM(d.text_len) AS BIGINT)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_text_len
FROM h3 d LEFT JOIN admin0 a0 USING (url)
GROUP BY 1
"""


def pages_nearest_granule_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Nearest granule centroid per occupied cell
    (spatial.cell_nearest_granule): planar-degree d2 with the branch-based
    lon wrap, min-mgrs tie-break — every arithmetic operand mirrored."""
    granules = f"{root}/granules.parquet"
    return f"""
WITH {_base_ctes(n_rows, root)},
  cells AS (SELECT DISTINCT h3_7 AS cell FROM h3),
  rc AS (
    SELECT cell, (cell - {H3_BASE}) // 268435456 AS i,
           (cell - {H3_BASE}) % 268435456 AS j
    FROM cells
  ),
  ctr AS (
    SELECT cell, (i + 0.5) / 512.0 * 180.0 - 90.0 AS lat,
           (j + 0.5) / 1024.0 * 360.0 - 180.0 AS lon
    FROM rc
  ),
  gr AS (
    SELECT mgrs, (ymin + ymax) / 2.0 AS glat, (xmin + xmax) / 2.0 AS glon
    FROM read_parquet('{granules}')
  ),
  d AS (
    SELECT c.cell, gr.mgrs,
           (c.lat - gr.glat) * (c.lat - gr.glat)
           + (CASE WHEN (c.lon - gr.glon) > 180.0 THEN (c.lon - gr.glon) - 360.0
                   WHEN (c.lon - gr.glon) < -180.0 THEN (c.lon - gr.glon) + 360.0
                   ELSE c.lon - gr.glon END)
             * (CASE WHEN (c.lon - gr.glon) > 180.0 THEN (c.lon - gr.glon) - 360.0
                     WHEN (c.lon - gr.glon) < -180.0 THEN (c.lon - gr.glon) + 360.0
                     ELSE c.lon - gr.glon END) AS d2
    FROM ctr c CROSS JOIN gr
  ),
  r AS (
    SELECT cell, mgrs, d2,
           ROW_NUMBER() OVER (PARTITION BY cell ORDER BY d2, mgrs) AS rn
    FROM d
  )
SELECT cell, mgrs AS nearest_mgrs, d2 AS d2_deg FROM r WHERE rn = 1
"""


def pages_cell_freshness_sql(n_rows: int, root: str = GRAFT_ROOT) -> str:
    """Per-cell crawl freshness (spatial.cell_freshness): latest-wins
    deduped pages, oldest/newest fetch ts per cell — exact ints/timestamps."""
    return f"""
WITH {_base_ctes(n_rows, root)}
SELECT h3_7 AS cell, CAST(COUNT(*) AS BIGINT) AS n_pages,
       MIN(warc_ts) AS ts_min, MAX(warc_ts) AS ts_max
FROM h3 GROUP BY 1
"""
