"""Deterministic synthetic fixtures (FIXTURES.md): pages, MGRS granules, admin polygons.

Everything is a pure function of the row index through splitmix64 hash
streams (`hashing.py`), so generation is identical regardless of batch
boundaries, parallelism, or resume — mirroring the reference's seeded
synthetic products (/root/reference/tests/test_integration_sentinel2.py:30-120)
and enabling the byte-identical-text-per-url invariant (BASELINE.json).

The `pages` table has EXACTLY the input_hint schema:
``(url: string, warc_ts: timestamp[us], html: binary, text: string, lang: string)``.

Generation rules (seed-free — keyed by row id):
- ~2% of rows (id % 50 == 7) are duplicate urls of row id-1 with a strictly
  later `warc_ts` (dedup oracle: latest-wins keeps the duplicate row).
- host drawn Zipf(s=1.2) over 1000 hosts -> mega-host skew.
- each url's location is drawn inside one of 8 synthetic granule regions,
  Zipf-weighted -> mega-cell skew; lat/lon embedded in html as
  ``<meta name="geo.position" content="{lat};{lon}">`` so the extract stage
  derives georeferencing from the source document, mirroring
  /root/reference/src/eopf_geozarr/conversion/geozarr.py:158-259.
- text = seeded pseudo-sentences; length ~ LogNormal; byte-identical for
  duplicate urls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .hashing import hash_stream, uniform01

U64 = np.uint64

# ---------------------------------------------------------------------------
# Region / granule geometry constants (scaled-down MGRS analogue)
# ---------------------------------------------------------------------------

N_REGIONS = 8
#: lower-left corners (lat0, lon0) of the 8 synthetic granule regions
REGION_ORIGINS = [
    (40.0, -120.0),
    (-10.0, -75.0),
    (48.0, 2.0),
    (30.0, 110.0),
    (-30.0, 140.0),
    (10.0, 75.0),
    (55.0, 35.0),
    (-5.0, 20.0),
]
#: Zipf-ish region weights -> mega-cell skew (region 0 is the "city")
REGION_WEIGHTS = np.array([0.35, 0.20, 0.15, 0.10, 0.08, 0.05, 0.04, 0.03])
GRANULE_SIZE_DEG = 0.98     # 109.8 km analogue
GRANULE_STRIDE_DEG = 0.931  # adjacent granules overlap by 0.049 deg (~4.9 km)
GRANULES_PER_SIDE = 5       # 5x5 granules per region -> 200 total
#: span of the region's point box = union of its granules
REGION_SPAN_DEG = (GRANULES_PER_SIDE - 1) * GRANULE_STRIDE_DEG + GRANULE_SIZE_DEG

N_HOSTS = 1000
ZIPF_S = 1.2

LANGS = np.array(["en", "de", "fr", "es", "zh", "ru", "ja"])
LANG_WEIGHTS = np.array([0.60, 0.10, 0.10, 0.08, 0.06, 0.03, 0.03])

WORDS = np.array(
    (
        "the a data spark table row column batch stream vector hash join sort "
        "merge filter group agg window query scan key value order part line "
        "customer big small fast slow dup tile cell grid map zoom level pixel "
        "raster vector2 point polygon index tree node leaf root shard block "
        "chunk page crawl fetch parse token text href meta title body head "
        "web link site"
    ).split()
)
assert len(WORDS) == 64

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_TS_BASE_US = 1704067200_000_000  # 2024-01-01T00:00:00Z in epoch micros
_TS_RANGE_US = 366 * 86400 * 1_000_000  # one year

#: bump whenever `pages_batch` output changes — `ensure_pages_parquet`
#: stamps this into the `_DONE` marker so stale /tmp caches regenerate.
FIXTURE_VERSION = 3
MAX_OUTLINKS = 5  # 0..4 host-level anchors per page
#: multi-CRS subset: canonical ids with ck % UTM_MOD == UTM_REM additionally
#: carry a ``geo.utm`` meta (zone;easting;northing, %.3f meters, northern
#:  convention) computed from the page's own lat/lon — the enrich kernel
#: reprojects these through the from-scratch Krüger inverse (functions/
#: proj.py) instead of reading geo.position, and the 6dp round-trip is
#: exact (series error <= 2.2e-7 deg < the 5e-7 rounding radius), so all
#: assignment oracles are unchanged by construction.
UTM_MOD, UTM_REM = 5, 3


def _zipf_cdf(n: int, s: float) -> np.ndarray:
    w = 1.0 / np.arange(1, n + 1, dtype=np.float64) ** s
    return np.cumsum(w / w.sum())


_HOST_CDF = _zipf_cdf(N_HOSTS, ZIPF_S)
_REGION_CDF = np.cumsum(REGION_WEIGHTS / REGION_WEIGHTS.sum())
_LANG_CDF = np.cumsum(LANG_WEIGHTS / LANG_WEIGHTS.sum())


def _flat_array(values: np.ndarray) -> pa.Array:
    """``pa.array`` that is ALWAYS a single contiguous Array — pyarrow
    silently returns a ChunkedArray for large numpy string inputs (seen at
    ~7M elements), which ``LargeListArray.from_arrays`` rejects."""
    arr = pa.array(values)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def canonical_id(ids: np.ndarray) -> np.ndarray:
    """Canonical row id: duplicate rows (id % 50 == 7, id > 0) alias id-1."""
    ids = np.asarray(ids, dtype=np.int64)
    return np.where((ids % 50 == 7) & (ids > 0), ids - 1, ids)


def pages_batch(ids: np.ndarray) -> pa.Table:
    """Generate pages rows for the given row ids (pure, vectorized)."""
    ids = np.asarray(ids, dtype=np.int64)
    if len(ids) == 0:
        # np.char.mod returns float64 for empty inputs — short-circuit
        return PAGES_SCHEMA.empty_table()
    canon = canonical_id(ids)
    ck = canon.astype(U64)
    ok = ids.astype(U64)
    is_dup = canon != ids

    # --- host / url (keyed by canonical id -> dup rows share url) ---
    host_id = np.searchsorted(_HOST_CDF, uniform01(ck, 1), side="right")
    path_hash = hash_stream(ck, 2)
    host_str = np.char.add(
        np.char.add("https://host", host_id.astype("U4")), ".example.com/p/"
    )
    url = np.char.add(host_str, np.char.mod("%016x", path_hash))

    # --- warc_ts (keyed by own id; dup strictly later than canonical) ---
    ts_canon = _TS_BASE_US + (hash_stream(ck, 3) % U64(_TS_RANGE_US)).astype(np.int64)
    dup_delta = 1 + (hash_stream(ok, 4) % U64(86400 * 1_000_000)).astype(np.int64)
    warc_ts = np.where(is_dup, ts_canon + dup_delta, ts_canon)

    # --- region + lat/lon (canonical; rounded to the 6 decimals embedded in html) ---
    region = np.searchsorted(_REGION_CDF, uniform01(ck, 5), side="right")
    origins = np.array(REGION_ORIGINS)
    lat0 = origins[region, 0]
    lon0 = origins[region, 1]
    lat = np.round(lat0 + uniform01(ck, 6) * REGION_SPAN_DEG, 6)
    lon = np.round(lon0 + uniform01(ck, 7) * REGION_SPAN_DEG, 6)

    # --- lang from host hash ---
    lang_u = uniform01(host_id.astype(U64), 8)
    lang = LANGS[np.searchsorted(_LANG_CDF, lang_u, side="right")]

    # --- text: n_words ~ LogNormal (Box-Muller over hash streams), canonical ---
    u1 = np.clip(uniform01(ck, 9), 1e-12, 1.0)
    u2 = uniform01(ck, 10)
    gauss = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    n_words = np.clip(np.exp(4.3 + 0.9 * gauss), 5, 600).astype(np.int64)

    total = int(n_words.sum())
    row_starts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_words, out=row_starts[1:])
    pos = np.arange(total, dtype=np.int64) - np.repeat(row_starts[:-1], n_words)
    canon_rep = np.repeat(ck, n_words)
    with np.errstate(over="ignore"):
        widx = (
            hash_stream(canon_rep + U64(0x51_7CC1B7) * pos.astype(U64), 11) % U64(64)
        ).astype(np.int64)
    flat_words = _flat_array(WORDS[widx])
    offsets = pa.array(row_starts, type=pa.int64())
    word_lists = pa.LargeListArray.from_arrays(offsets, flat_words)
    text = pc.binary_join(word_lists, " ")

    # --- outlinks: 0-4 host-level anchors (keyed by canonical id) ---
    # Targets draw from the SAME Zipf host universe as page hosts, so the
    # derived host graph has realistic in-degree skew (hub hosts). Keyed by
    # canonical id: duplicate urls carry identical anchors, preserving the
    # byte-identical-html-per-url property the WARC round-trip relies on.
    n_links = (hash_stream(ck, 12) % U64(MAX_OUTLINKS)).astype(np.int64)
    ltotal = int(n_links.sum())
    lstarts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_links, out=lstarts[1:])
    lpos = np.arange(ltotal, dtype=np.int64) - np.repeat(lstarts[:-1], n_links)
    lck = np.repeat(ck, n_links)
    with np.errstate(over="ignore"):
        lkey = lck + U64(0x51_7CC1B7) * lpos.astype(U64)
    tgt = np.searchsorted(_HOST_CDF, uniform01(lkey, 13), side="right")
    anchor = np.char.add(
        np.char.add('<a href="https://host', tgt.astype("U4")),
        '.example.com/">l</a>',
    )
    anchors = pc.binary_join(
        pa.LargeListArray.from_arrays(
            pa.array(lstarts, type=pa.int64()), _flat_array(anchor)
        ),
        "",
    )

    # --- multi-CRS subset: embed the UTM twin of (lat, lon) ---
    is_utm = (ck % U64(UTM_MOD)) == U64(UTM_REM)
    utm_meta = np.full(len(ids), "", dtype=object)
    if is_utm.any():
        from .functions.proj import geodetic_to_utm, utm_zone_for

        zi = np.flatnonzero(is_utm)
        zones = utm_zone_for(lon[zi])
        east = np.empty(len(zi))
        north = np.empty(len(zi))
        for z in np.unique(zones):
            m = zones == z
            east[m], north[m] = geodetic_to_utm(lat[zi][m], lon[zi][m], int(z))
        parts = np.char.mod("%d", zones)
        parts = np.char.add(parts, ";")
        parts = np.char.add(parts, np.char.mod("%.3f", east))
        parts = np.char.add(parts, ";")
        parts = np.char.add(parts, np.char.mod("%.3f", north))
        head = np.full(len(zi), '<meta name="geo.utm" content="', dtype="U30")
        utm_meta[zi] = np.char.add(np.char.add(head, parts), '">')

    # --- html wrapping text + geo/lang meta hints ---
    lat_s = pa.array(np.char.mod("%.6f", lat))
    lon_s = pa.array(np.char.mod("%.6f", lon))
    title = pa.array(np.char.mod("Doc %016x", path_hash))
    html = pc.binary_join_element_wise(
        pa.array(np.full(len(ids), "<html><head><title>")),
        title,
        pa.array(np.full(len(ids), '</title><meta name="geo.position" content="')),
        lat_s,
        pa.array(np.full(len(ids), ";")),
        lon_s,
        pa.array(np.full(len(ids), '">')),
        pa.array(utm_meta.astype("U")),
        pa.array(np.full(len(ids), '<meta name="language" content="')),
        pa.array(lang),
        pa.array(np.full(len(ids), '"></head><body><p>')),
        text,
        pa.array(np.full(len(ids), "</p><nav>")),
        anchors,
        pa.array(np.full(len(ids), "</nav></body></html>")),
        "",
    )

    return pa.table(
        {
            "url": pa.array(url),
            "warc_ts": pa.array(warc_ts, type=pa.timestamp("us")),
            "html": html.cast(pa.binary()),
            "text": text.cast(pa.string()),
            "lang": pa.array(lang),
        }
    )


def pages_expected_links(ids: np.ndarray) -> dict[str, np.ndarray]:
    """Golden exploded outlinks per row id — independent of the extractor.

    Returns ``src_host`` (the page's own host id, repeated per link) and
    ``dst_host`` (anchor target host id), exactly the rows
    ``stages.extract.extract_links_batch`` must produce for these ids.
    """
    ids = np.asarray(ids, dtype=np.int64)
    ck = canonical_id(ids).astype(U64)
    host_id = np.searchsorted(_HOST_CDF, uniform01(ck, 1), side="right")
    n_links = (hash_stream(ck, 12) % U64(MAX_OUTLINKS)).astype(np.int64)
    lstarts = np.zeros(len(ids) + 1, dtype=np.int64)
    np.cumsum(n_links, out=lstarts[1:])
    lpos = np.arange(int(n_links.sum()), dtype=np.int64) - np.repeat(
        lstarts[:-1], n_links
    )
    lck = np.repeat(ck, n_links)
    with np.errstate(over="ignore"):
        lkey = lck + U64(0x51_7CC1B7) * lpos.astype(U64)
    tgt = np.searchsorted(_HOST_CDF, uniform01(lkey, 13), side="right")
    return {
        "src_host": np.repeat(host_id, n_links).astype(np.int64),
        "dst_host": tgt.astype(np.int64),
    }


def pages_expected_geo(ids: np.ndarray) -> dict[str, np.ndarray]:
    """Golden (lat, lon, region) per row id — independent of the extractor."""
    ids = np.asarray(ids, dtype=np.int64)
    ck = canonical_id(ids).astype(U64)
    region = np.searchsorted(_REGION_CDF, uniform01(ck, 5), side="right")
    origins = np.array(REGION_ORIGINS)
    lat = np.round(origins[region, 0] + uniform01(ck, 6) * REGION_SPAN_DEG, 6)
    lon = np.round(origins[region, 1] + uniform01(ck, 7) * REGION_SPAN_DEG, 6)
    return {"lat": lat, "lon": lon, "region": region}


# ---------------------------------------------------------------------------
# MGRS-style granule footprints (broadcast join side table)
# ---------------------------------------------------------------------------

_MGRS_BANDS = "CDEFGHJKLMNPQRSTUVWX"  # UTM latitude bands (no I/O), public scheme


def mgrs_granules() -> pa.Table:
    """200 synthetic MGRS-style granule footprints (5x5 per region).

    Adjacent granules overlap by ~0.049 deg, as real MGRS granules overlap
    ~4.9 km (/root/reference/docs/geozarr-minispec.md:493-535 granule
    geometry); a point may fall in 1-4 granules — assignment tie-break is
    the lexicographically smallest `mgrs` code.
    """
    rows = []
    for r, (lat0, lon0) in enumerate(REGION_ORIGINS):
        zone = int((lon0 + 180.0) // 6.0) + 1
        for gi in range(GRANULES_PER_SIDE):
            for gj in range(GRANULES_PER_SIDE):
                ymin = lat0 + gi * GRANULE_STRIDE_DEG
                xmin = lon0 + gj * GRANULE_STRIDE_DEG
                band = _MGRS_BANDS[
                    min(len(_MGRS_BANDS) - 1, max(0, int((ymin + 80.0) // 8.0)))
                ]
                code = f"T{zone:02d}{band}{chr(ord('A') + r)}{chr(ord('A') + gi * GRANULES_PER_SIDE + gj)}"
                rows.append(
                    {
                        "mgrs": code,
                        "epsg": 32600 + zone,
                        "xmin": xmin,
                        "ymin": ymin,
                        "xmax": xmin + GRANULE_SIZE_DEG,
                        "ymax": ymin + GRANULE_SIZE_DEG,
                    }
                )
    t = pa.Table.from_pylist(rows)
    return t.set_column(1, "epsg", t["epsg"].cast(pa.int32()))


# ---------------------------------------------------------------------------
# Admin polygons (R-tree join side table)
# ---------------------------------------------------------------------------


def admin_polygons() -> dict[str, np.ndarray]:
    """Seeded simple polygons: 100 level-0 "countries" + 400 nested level-1.

    Returned as a dict of flat arrays (ragged vertex layout):
    ``admin_id, level, parent_id, n_vertices, vx (flat lon), vy (flat lat)``.
    Roughly 10% of page points fall in no polygon (anti-join fixture).
    """
    rng_key = np.arange(100, dtype=np.int64).astype(U64)
    region = np.searchsorted(_REGION_CDF, uniform01(rng_key, 20), side="right")
    origins = np.array(REGION_ORIGINS)
    c_lat = origins[region, 0] + uniform01(rng_key, 21) * REGION_SPAN_DEG
    c_lon = origins[region, 1] + uniform01(rng_key, 22) * REGION_SPAN_DEG
    radius = 0.4 + uniform01(rng_key, 23) * 1.2

    admin_id, level, parent, nv, vx, vy = [], [], [], [], [], []

    def add_poly(aid: int, lvl: int, par: int, clat: float, clon: float, rad: float):
        k = U64(aid)
        n = 6 + int(hash_stream(np.array([k]), 30)[0] % U64(7))  # 6..12 vertices
        angles = np.sort(uniform01(np.arange(n).astype(U64) + k * U64(97), 31)) * 2 * np.pi
        radii = rad * (0.55 + 0.45 * uniform01(np.arange(n).astype(U64) + k * U64(131), 32))
        admin_id.append(aid)
        level.append(lvl)
        parent.append(par)
        nv.append(n)
        vx.extend((clon + radii * np.cos(angles)).tolist())
        vy.extend((clat + radii * np.sin(angles)).tolist())

    for i in range(100):
        add_poly(i + 1, 0, 0, float(c_lat[i]), float(c_lon[i]), float(radius[i]))
    aid = 101
    for i in range(100):
        for j in range(4):
            k = np.array([i * 4 + j], dtype=np.int64).astype(U64)
            dr = float(radius[i]) * 0.45
            dlat = (uniform01(k, 24)[0] - 0.5) * float(radius[i]) * 0.8
            dlon = (uniform01(k, 25)[0] - 0.5) * float(radius[i]) * 0.8
            add_poly(aid, 1, i + 1, float(c_lat[i]) + dlat, float(c_lon[i]) + dlon, dr)
            aid += 1

    return {
        "admin_id": np.array(admin_id, dtype=np.int64),
        "level": np.array(level, dtype=np.int8),
        "parent_id": np.array(parent, dtype=np.int64),
        "n_vertices": np.array(nv, dtype=np.int64),
        "vx": np.array(vx, dtype=np.float64),
        "vy": np.array(vy, dtype=np.float64),
    }


# ---------------------------------------------------------------------------
# Dataset-level synthesis (Ray-parallel, deterministic)
# ---------------------------------------------------------------------------


def pages_dataset(n_rows: int, *, parallelism: int = -1):
    """A lazy ``ray.data.Dataset`` of `n_rows` synthetic pages.

    Uses ``range -> map_batches`` so generation is distributed and each
    block is a pure function of its row ids (deterministic under any
    partitioning). No ray.init here — session owned by the caller.
    """
    import ray.data as rd

    ds = rd.range(n_rows, override_num_blocks=parallelism if parallelism > 0 else None)

    def gen(batch: pa.Table) -> pa.Table:
        return pages_batch(batch["id"].to_numpy())

    return ds.map_batches(gen, batch_format="pyarrow", batch_size=16384)


def rows_for_sf(sf: float) -> int:
    """Scale-factor -> pages row count (sf0.001 -> 10k ... sf0.1 -> 1M)."""
    return max(1000, int(sf * 10_000_000))


def write_pages_parquet(path: str, n_rows: int, *, parallelism: int = -1) -> str:
    """Materialize a pages table to parquet (cache for tests / bench)."""
    import os

    os.makedirs(path, exist_ok=True)
    pages_dataset(n_rows, parallelism=parallelism).write_parquet(path)
    return path


def write_pages_parquet_direct(path: str, n_rows: int, *, chunk: int = 65536) -> str:
    """Ray-free pages writer (same rows — generation is a pure function of
    row id). Used when no Ray session exists (e.g. oracle-side synthesis)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    writer = None
    try:
        for s in range(0, n_rows, chunk):
            t = pages_batch(np.arange(s, min(s + chunk, n_rows)))
            if writer is None:
                writer = pq.ParquetWriter(
                    os.path.join(path, "part-0.parquet"), t.schema
                )
            writer.write_table(t)
    finally:
        if writer is not None:
            writer.close()
    return path


def ensure_pages_parquet(n_rows: int, *, root: str = "/tmp/graft_pages") -> str:
    """Crash-safe cached synthesis: ``{root}/n{n_rows}`` with a ``_DONE`` marker.

    Writes into a temp directory and atomically renames over the target
    (the lineage commit pattern, state/lineage.py), so an interrupted
    synthesis can never leave a half-written directory that later reads
    mix with fresh files. Uses the Ray-parallel writer when a Ray session
    exists, else the direct writer (identical rows either way).
    """
    import os
    import shutil

    path = os.path.join(root, f"n{n_rows}")
    marker = os.path.join(path, "_DONE")
    stamp = f"{n_rows} v{FIXTURE_VERSION}"
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == stamp:
                return path
        # stale cache from an older fixture version — regenerate below
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    try:
        import ray

        use_ray = ray.is_initialized()
    except ImportError:  # pragma: no cover
        use_ray = False
    if use_ray:
        write_pages_parquet(tmp, n_rows)
    else:
        write_pages_parquet_direct(tmp, n_rows)
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(stamp)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.rename(tmp, path)
    return path


def admin_edges_table() -> pa.Table:
    """Admin polygons as an edge list (one row per directed boundary edge,
    exactly the (i, j=i-1) orientation ``functions.pip.points_in_polygon``
    iterates) plus per-polygon bbox columns — the SQL-joinable form the
    DuckDB point-in-polygon oracle consumes."""
    poly = admin_polygons()
    starts = np.zeros(len(poly["admin_id"]) + 1, dtype=np.int64)
    np.cumsum(poly["n_vertices"], out=starts[1:])
    rows: dict[str, list] = {
        k: []
        for k in (
            "admin_id", "level", "xi", "yi", "xj", "yj", "bx0", "bx1", "by0", "by1"
        )
    }
    for p in range(len(poly["admin_id"])):
        s, e = starts[p], starts[p + 1]
        vx, vy = poly["vx"][s:e], poly["vy"][s:e]
        n = e - s
        for i in range(n):
            j = (i - 1) % n
            rows["admin_id"].append(int(poly["admin_id"][p]))
            rows["level"].append(int(poly["level"][p]))
            rows["xi"].append(float(vx[i]))
            rows["yi"].append(float(vy[i]))
            rows["xj"].append(float(vx[j]))
            rows["yj"].append(float(vy[j]))
            rows["bx0"].append(float(vx.min()))
            rows["bx1"].append(float(vx.max()))
            rows["by0"].append(float(vy.min()))
            rows["by1"].append(float(vy.max()))
    return pa.table(
        {
            "admin_id": pa.array(rows["admin_id"], type=pa.int64()),
            "level": pa.array(rows["level"], type=pa.int64()),
            **{
                k: pa.array(rows[k], type=pa.float64())
                for k in ("xi", "yi", "xj", "yj", "bx0", "bx1", "by0", "by1")
            },
        }
    )


def ensure_side_tables(root: str = "/tmp/graft_pages") -> tuple[str, str]:
    """Materialize the broadcast side tables (MGRS granules, admin polygon
    edges) as parquet for the DuckDB oracles. Atomic writes, tiny tables."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(root, exist_ok=True)
    gr = os.path.join(root, "granules.parquet")
    ae = os.path.join(root, "admin_edges.parquet")
    if not os.path.exists(gr):
        pq.write_table(mgrs_granules(), gr + ".tmp")
        os.replace(gr + ".tmp", gr)
    if not os.path.exists(ae):
        pq.write_table(admin_edges_table(), ae + ".tmp")
        os.replace(ae + ".tmp", ae)
    return gr, ae
