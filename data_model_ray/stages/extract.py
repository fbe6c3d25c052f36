"""HTML geotag + text extraction stage (zero-copy Arrow, actor pool).

The engine's analogue of the reference's derive-georeferencing-from-source
metadata pass (`setup_datatree_metadata_geozarr_spec_compliant`,
/root/reference/src/eopf_geozarr/conversion/geozarr.py:158-259): a
deterministic parser over ``html: binary`` that produces

- ``text`` — extracted body text; the BASELINE invariant requires it to be
  byte-identical to the source's text per url, verified in-pipeline
  (``verify_text`` flag) and in tests;
- ``lat`` / ``lon`` — from ``<meta name="geo.position" content="lat;lon">``;
- ``text_len`` — decoded payload size.

``html`` is dropped on output (project early — SURVEY.md section 7.4: wide
binary rows dominate block size; the pyramid never needs them again).

All parsing is vectorized ``pyarrow.compute.extract_regex`` (RE2) over the
Arrow string buffer — no Python row loop. The stage is a callable class so
``map_batches(HtmlExtract, concurrency=N)`` runs it as an actor pool with
patterns resolved once per actor
(/opt/skills ray guide actor-pool pattern; reference stateful analogue:
GCP reprojector built once per dataset,
/root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:20-138).
Assumes UTF-8 html (fixture guarantee); real-crawl lenient decoding would
slot in here as a pre-cast kernel.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

GEO_PATTERN = r'<meta name="geo\.position" content="(?P<lat>-?[0-9.]+);(?P<lon>-?[0-9.]+)">'
UTM_PATTERN = r'<meta name="geo\.utm" content="(?P<zone>[0-9]+);(?P<e>-?[0-9.]+);(?P<n>-?[0-9.]+)">'
TEXT_PATTERN = r"(?s)<body><p>(?P<text>.*)</p>(?:<nav>|</body>)"
TITLE_PATTERN = r"<title>(?P<title>[^<]*)</title>"
LANG_PATTERN = r'<meta name="language" content="(?P<lang>[^"]*)">'


def extract_batch(
    batch: pa.Table, *, verify_text: bool = True, keep_title: bool = False
) -> pa.Table:
    """Pure vectorized extraction kernel (stateless — usable as a task stage)."""
    html = pc.cast(batch["html"], pa.string())
    geo = pc.extract_regex(html, GEO_PATTERN)
    text = pc.struct_field(pc.extract_regex(html, TEXT_PATTERN), "text")
    lat = pc.cast(pc.struct_field(geo, "lat"), pa.float64())
    lon = pc.cast(pc.struct_field(geo, "lon"), pa.float64())
    lat, lon = _apply_utm_override(html, lat, lon)

    if verify_text and "text" in batch.column_names:
        # the byte-identical-extracted-text-per-url invariant, enforced
        # in-stream (cheap vectorized equality; nulls = parse failures)
        ok = pc.equal(text, batch["text"])
        bad = len(batch) - pc.sum(pc.cast(ok, pa.int64())).as_py()
        if bad:
            raise ValueError(
                f"text extraction mismatch on {bad}/{len(batch)} rows "
                "(byte-identical invariant violated)"
            )

    out = batch.drop_columns([c for c in ("html", "text") if c in batch.column_names])
    if "lang" not in batch.column_names:
        # archive-format sources (WARC) carry no lang column — recover it
        # from the html language meta so both sources feed the same schema
        lang = pc.struct_field(pc.extract_regex(html, LANG_PATTERN), "lang")
        out = out.append_column("lang", pc.cast(lang, pa.string()))
    out = out.append_column("text", pc.cast(text, pa.string()))
    out = out.append_column("lat", lat)
    out = out.append_column("lon", lon)
    out = out.append_column("text_len", pc.cast(pc.utf8_length(text), pa.int64()))
    if keep_title:
        title = pc.struct_field(pc.extract_regex(html, TITLE_PATTERN), "title")
        out = out.append_column("title", pc.cast(title, pa.string()))
    return out


def _apply_utm_override(html, lat, lon):
    """Multi-CRS path (F13 in-pipeline): pages carrying a ``geo.utm`` meta
    are positioned by reprojecting UTM -> WGS84 through the from-scratch
    Krüger inverse (functions/proj.py) instead of trusting geo.position —
    the reference's reproject-at-ingest semantics
    (conversion/sentinel1_reprojection.py:20-138). Rounded to the 6dp
    precision of the source meta, the round-trip is exact (series error
    <= 2.2e-7 deg < the 5e-7 rounding radius), so every downstream cell /
    granule / admin assignment is identical to the geo.position path —
    pinned by the pages_assignments oracle staying hash-green."""
    import numpy as np

    utm = pc.extract_regex(html, UTM_PATTERN)
    zone_arr = pc.struct_field(utm, "zone")
    if not pc.count(zone_arr).as_py():  # no UTM pages in this batch
        return lat, lon
    from ..functions.proj import utm_to_geodetic

    valid = pc.is_valid(zone_arr).to_numpy(zero_copy_only=False)
    zones = pc.cast(pc.fill_null(zone_arr, "0"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    east = pc.cast(
        pc.fill_null(pc.struct_field(utm, "e"), "0"), pa.float64()
    ).to_numpy(zero_copy_only=False)
    north = pc.cast(
        pc.fill_null(pc.struct_field(utm, "n"), "0"), pa.float64()
    ).to_numpy(zero_copy_only=False)
    la = lat.to_numpy(zero_copy_only=False).copy()
    lo = lon.to_numpy(zero_copy_only=False).copy()
    idx = np.flatnonzero(valid)
    for z in np.unique(zones[idx]):
        m = idx[zones[idx] == z]
        rlat, rlon = utm_to_geodetic(east[m], north[m], int(z))
        la[m] = np.round(rlat, 6)
        lo[m] = np.round(rlon, 6)
    return pa.array(la), pa.array(lo)


class HtmlExtract:
    """Callable-class variant for actor-pool deployment
    (``map_batches(HtmlExtract, concurrency=(1, N))``) when the extractor
    carries real per-actor state (models, codecs). The fixture extractor is
    stateless, so the flagship uses the plain-function form — stateless
    tasks fuse with neighboring stages and never reserve idle CPUs
    (ray guide: "plain function -> stateless tasks")."""

    def __init__(self, *, verify_text: bool = True, keep_title: bool = False):
        self.verify_text = verify_text
        self.keep_title = keep_title

    def __call__(self, batch: pa.Table) -> pa.Table:
        return extract_batch(
            batch, verify_text=self.verify_text, keep_title=self.keep_title
        )


# --------------------------------------------------------------------------
# Outlink extraction (web link graph)
# --------------------------------------------------------------------------

_LINK_SPLIT = '<a href="https://host'
_LINK_HOST_PATTERN = r"^(?P<h>[0-9]+)\.example\.com/"
_URL_HOST_PATTERN = r"host(?P<h>[0-9]+)\."


def extract_links_batch(batch: pa.Table) -> pa.Table:
    """Explode each page's ``<a href>`` anchors into ``(src_host, dst_host)``
    edge rows — the corpus-side map of the link-graph family
    (`pipelines/linkgraph.py`).

    Fully vectorized over the Arrow string buffer: one ``split_pattern`` on
    the anchor prefix yields k+1 fragments per page (fragment 0 = everything
    before the first anchor, dropped with an offset mask), then one
    ``extract_regex`` parses the target host id off each remaining fragment.
    No Python row loop; html bytes never copied (zero-copy cast to string
    view). The stage's output is the EDGE table only — html is dropped, so
    downstream graph aggregations shuffle integers, never page payloads.
    """
    import numpy as np

    html = pc.cast(batch["html"], pa.string())
    pieces = pc.split_pattern(html, _LINK_SPLIT)
    lengths = pc.list_value_length(pieces).to_numpy(zero_copy_only=False)
    total = int(lengths.sum())
    starts = np.zeros(len(lengths) + 1, dtype=np.int64)
    np.cumsum(lengths, out=starts[1:])
    keep = np.ones(total, dtype=bool)
    keep[starts[:-1][lengths > 0]] = False  # fragment 0 of every page
    keep_arr = pa.array(keep)
    flat = pc.list_flatten(pieces).filter(keep_arr)
    parent = pc.list_parent_indices(pieces).filter(keep_arr)
    dst = pc.cast(
        pc.struct_field(pc.extract_regex(flat, _LINK_HOST_PATTERN), "h"),
        pa.int64(),
    )
    src = pc.cast(
        pc.struct_field(
            pc.extract_regex(batch["url"].take(parent), _URL_HOST_PATTERN), "h"
        ),
        pa.int64(),
    )
    return pa.table({"src_host": src, "dst_host": dst})
