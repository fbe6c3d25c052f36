"""Closed store-level contracts: validate a WHOLE output directory.

Re-derives the reference's closed hierarchical product models — the
GeoZarr store profile (root bbox + CRS + per-layout-entry transform/shape,
/root/reference/src/eopf_geozarr/data_api/geozarr/store.py:30-129), the
Spatial convention validators (data_api/geozarr/spatial.py:18-60) and the
union-dispatch classification of an unknown store
(s2_optimization/s2_converter.py:408-418 ``is_sentinel2_dataset``:
TypeAdapter over a model union) — for this engine's Parquet store layouts:

- **geocell-pyramid** (``pipelines/pyramid.build_pyramid``): root
  ``manifest.json`` + one ``part=level{r}/`` parquet directory per level.
- **tile-raster** (``pipelines/rasterize``): ``tms_manifest.json`` + tile
  parquet partitions.

``classify_store`` plays the TypeAdapter-union role: try each registered
store model's structural sniff and return the first that matches (or
None). ``validate_store`` then runs the matched model's CLOSED validation:
every level present and readable, all level schemas equal to the base
level's (a tampered column name/type fails), an unbroken
``derived_from`` chain, ordered root bbox, >=1 valid proj encoding, and
the Spatial-convention attrs (non-empty ``spatial:dimensions``,
affine transform shape/consistency) — the checks a consumer of someone
else's output directory needs before trusting it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

#: transform/bbox agreement tolerance in degrees (float round-trip slack)
_TOL = 1e-6


# --- Spatial convention attrs (spatial.py:18-60 analogue) -------------------


def validate_spatial_attrs(attrs: dict[str, Any], path: str = "spatial") -> list[str]:
    """Spatial-convention object checks: ``spatial:dimensions`` required
    and non-empty; ``transform_type`` known; ``spatial:transform`` a
    6-float affine with nonzero pixel sizes; ``spatial:shape`` two
    positive ints; transform x shape grid bounds ordered; registration in
    {pixel, node}."""
    problems: list[str] = []
    dims = attrs.get("spatial:dimensions")
    if dims is None:
        problems.append(f"{path}: spatial:dimensions missing")
    elif not isinstance(dims, list) or not dims:
        problems.append(f"{path}: spatial:dimensions must contain at least one dimension")
    tt = attrs.get("spatial:transform_type", "affine")
    if tt != "affine":
        problems.append(f"{path}: unknown spatial:transform_type {tt!r}")
    reg = attrs.get("spatial:registration", "pixel")
    if reg not in ("pixel", "node"):
        problems.append(f"{path}: unknown spatial:registration {reg!r}")
    tr = attrs.get("spatial:transform")
    if tr is not None:
        if not (isinstance(tr, list) and len(tr) == 6):
            problems.append(f"{path}: spatial:transform must be 6 floats")
            tr = None
        elif tr[0] == 0 or tr[4] == 0:
            problems.append(f"{path}: spatial:transform has zero pixel size")
            tr = None
    shape = attrs.get("spatial:shape")
    if shape is not None and not (
        isinstance(shape, list)
        and len(shape) == 2
        and all(isinstance(s, int) and s > 0 for s in shape)
    ):
        problems.append(f"{path}: spatial:shape must be two positive ints")
        shape = None
    if tr is not None and shape is not None and grid_bounds(tr, shape) is None:
        problems.append(f"{path}: transform x shape yields a degenerate bbox")
    return problems


def grid_bounds(
    transform: list[float], shape: list[int]
) -> list[float] | None:
    """[west, south, east, north] covered by an affine x (rows, cols)
    grid, or None if degenerate. x = a*col + c, y = e*row + f."""
    h, w = shape
    a, _, c, _, e, f = transform
    west, east = sorted((c, c + a * w))
    south, north = sorted((f, f + e * h))
    if not (west < east and south < north):
        return None
    return [west, south, east, north]


def _bbox_ordered(bbox: Any, path: str) -> list[str]:
    if not (isinstance(bbox, list) and len(bbox) == 4):
        return [f"{path}: spatial:bbox must be [xmin, ymin, xmax, ymax]"]
    try:
        xmin, ymin, xmax, ymax = (float(v) for v in bbox)
    except (TypeError, ValueError):
        return [f"{path}: spatial:bbox has non-numeric entries"]
    problems = []
    if xmin > xmax:
        problems.append(f"{path}: bbox xmin ({xmin}) > xmax ({xmax})")
    if ymin > ymax:
        problems.append(f"{path}: bbox ymin ({ymin}) > ymax ({ymax})")
    return problems


# --- store models -----------------------------------------------------------


def _read_manifest(out_dir: str, name: str) -> dict[str, Any] | None:
    p = os.path.join(out_dir, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def sniff_pyramid(out_dir: str) -> bool:
    m = _read_manifest(out_dir, "manifest.json")
    return bool(m) and m.get("kind") == "geocell-pyramid" and "levels" in m


def sniff_raster(out_dir: str) -> bool:
    m = _read_manifest(out_dir, "tms_manifest.json")
    return bool(m) and "tile_matrix_set" in m


def validate_pyramid_store(out_dir: str) -> list[str]:
    """CLOSED geocell-pyramid store validation (see module docstring)."""
    import pyarrow.parquet as pq

    from .crs import validate_proj_attrs

    m = _read_manifest(out_dir, "manifest.json")
    if m is None:
        return ["manifest.json missing"]
    problems: list[str] = []
    levels = m.get("levels") or []
    if not levels:
        problems.append("manifest: no levels")
        return problems

    # --- per-level parquet: readable, row counts, SCHEMA EQUALITY -------
    schemas: dict[str, Any] = {}
    for lv in levels:
        asset = lv.get("asset")
        asset_dir = os.path.join(out_dir, str(asset))
        try:
            t = pq.read_table(asset_dir)
        except Exception as e:
            problems.append(f"{asset}: unreadable ({e})")
            continue
        schemas[asset] = t.schema
        if t.num_rows != lv.get("cells"):
            problems.append(
                f"{asset}: rows {t.num_rows} != manifest {lv.get('cells')}"
            )
    base = levels[0]
    base_schema = schemas.get(base.get("asset"))
    if base_schema is not None:
        base_fields = {f.name: f.type for f in base_schema}
        for lv in levels[1:]:
            sch = schemas.get(lv.get("asset"))
            if sch is None:
                continue
            fields = {f.name: f.type for f in sch}
            missing = sorted(set(base_fields) - set(fields))
            extra = sorted(set(fields) - set(base_fields))
            if missing:
                problems.append(f"{lv['asset']}: missing columns {missing}")
            if extra:
                problems.append(f"{lv['asset']}: unexpected columns {extra}")
            for name in sorted(set(base_fields) & set(fields)):
                if fields[name] != base_fields[name]:
                    problems.append(
                        f"{lv['asset']}.{name}: type {fields[name]} != "
                        f"base {base_fields[name]}"
                    )

    # --- derivation chain: base first, each level derived from the
    # previous one, no dangling references ------------------------------
    if base.get("derived_from") is not None:
        problems.append(
            f"{base.get('asset')}: base level must have derived_from=null"
        )
    for prev, lv in zip(levels, levels[1:]):
        if lv.get("derived_from") != prev.get("asset"):
            problems.append(
                f"{lv.get('asset')}: derived_from {lv.get('derived_from')!r} "
                f"breaks the chain (expected {prev.get('asset')!r})"
            )
    assets = {lv.get("asset") for lv in levels}
    for lv in levels:
        src = lv.get("derived_from")
        if src is not None and src not in assets:
            problems.append(f"{lv.get('asset')}: derived_from {src!r} names no level")
        lvl = lv.get("level")
        if not isinstance(lvl, int):
            problems.append(f"{lv.get('asset')}: level must be an int")

    # --- root attrs: bbox + CRS + spatial convention --------------------
    problems += _bbox_ordered(m.get("spatial:bbox"), "manifest")
    problems += [f"proj: {p}" for p in validate_proj_attrs(m.get("proj", {}))]
    if "spatial:dimensions" in m or "spatial:transform" in m:
        problems += validate_spatial_attrs(m, "manifest")
    # per-level spatial layout entries, when present (GeoZarrScaleLevel
    # analogue: store.py:81-92 requires transform+shape on every entry);
    # each level's transform x shape grid must CONTAIN the root bbox
    bbox = m.get("spatial:bbox")
    for lv in levels:
        tr, shape = lv.get("spatial:transform"), lv.get("spatial:shape")
        if tr is None and shape is None:
            continue
        attrs = dict(lv)
        attrs.setdefault("spatial:dimensions", m.get("spatial:dimensions"))
        problems += validate_spatial_attrs(attrs, str(lv.get("asset")))
        if (
            isinstance(tr, list)
            and len(tr) == 6
            and isinstance(shape, list)
            and len(shape) == 2
            and isinstance(bbox, list)
            and len(bbox) == 4
        ):
            gb = grid_bounds(tr, shape)
            try:
                contained = gb is not None and (
                    gb[0] - _TOL <= float(bbox[0])
                    and gb[1] - _TOL <= float(bbox[1])
                    and float(bbox[2]) <= gb[2] + _TOL
                    and float(bbox[3]) <= gb[3] + _TOL
                )
            except (TypeError, ValueError):
                contained = True  # NaN-sanitized bbox: containment n/a
            if gb is not None and not contained:
                problems.append(
                    f"{lv.get('asset')}: root spatial:bbox extends outside "
                    "this level's transform x shape grid"
                )
    return problems


def validate_raster_store(out_dir: str) -> list[str]:
    """CLOSED tile-raster (TMS) store validation: proj encodings valid,
    every tile-matrix limit inside its matrix dims."""
    from .crs import validate_proj_attrs

    tms = _read_manifest(out_dir, "tms_manifest.json")
    if tms is None:
        return ["tms_manifest.json missing"]
    problems = [f"proj: {p}" for p in validate_proj_attrs(tms.get("proj", {}))]
    matrices = {
        mt["id"]: mt for mt in tms.get("tile_matrix_set", {}).get("tileMatrices", [])
    }
    if not matrices:
        problems.append("tms: no tileMatrices")
    for mid, lim in (tms.get("tile_matrix_limits") or {}).items():
        if mid not in matrices:
            problems.append(f"tms: limits for unknown tileMatrix {mid!r}")
            continue
        mt = matrices[mid]
        if not (
            0 <= lim["minTileCol"] <= lim["maxTileCol"] < mt["matrixWidth"]
            and 0 <= lim["minTileRow"] <= lim["maxTileRow"] < mt["matrixHeight"]
        ):
            problems.append(f"tms: limits for {mid!r} outside matrix dims")
    return problems


def sniff_invindex(out_dir: str) -> bool:
    m = _read_manifest(out_dir, "invindex_manifest.json")
    return bool(m) and m.get("kind") == "inverted-index" and "partitions" in m


def validate_invindex_store(out_dir: str) -> list[str]:
    """CLOSED inverted-index store validation (third union member).

    Structural: manifest fields typed and in range, every listed bucket
    partition present and readable, no unknown partitions on disk.
    Semantic (the contract that makes bucket-pruned lookups sound):
    every partition's footer carries the manifest fingerprint, its row
    count matches, its ``bucket`` column is constant == the partition
    key, and every token re-hashes into that bucket
    (``fingerprint64(token) % num_buckets``)."""
    import glob

    import numpy as np
    import pyarrow.parquet as pq

    from ..stages.text import fingerprint64
    from ..state.lineage import FINGERPRINT_KEY

    m = _read_manifest(out_dir, "invindex_manifest.json")
    if m is None:
        return ["invindex_manifest.json missing"]
    problems: list[str] = []
    nb = m.get("num_buckets")
    if not isinstance(nb, int) or nb < 1:
        return [f"invindex: num_buckets invalid: {nb!r}"]
    fp = m.get("input_fingerprint")
    if not isinstance(fp, str) or not fp:
        problems.append("invindex: input_fingerprint missing")
        fp = ""
    parts = m.get("partitions") or {}
    on_disk = {
        os.path.basename(os.path.dirname(p)).split("=", 1)[1]
        for p in glob.glob(os.path.join(out_dir, "part=*", "data.parquet"))
    }
    for extra in sorted(on_disk - set(parts)):
        problems.append(f"invindex: partition {extra!r} on disk but not in manifest")
    for key, want_rows in sorted(parts.items()):
        try:
            b = int(key)
        except ValueError:
            problems.append(f"invindex: non-integer bucket key {key!r}")
            continue
        if not 0 <= b < nb:
            problems.append(f"invindex: bucket {b} outside [0, {nb})")
            continue
        path = os.path.join(out_dir, f"part={key}", "data.parquet")
        if not os.path.exists(path):
            problems.append(f"invindex: partition {key!r} missing on disk")
            continue
        try:
            t = pq.read_table(path)
        except Exception as exc:
            problems.append(f"invindex: partition {key!r} unreadable: {exc}")
            continue
        meta = t.schema.metadata or {}
        got_fp = meta.get(FINGERPRINT_KEY, b"").decode()
        if got_fp != fp:
            problems.append(
                f"invindex: partition {key!r} fingerprint {got_fp!r} != manifest"
            )
        if t.num_rows != want_rows:
            problems.append(
                f"invindex: partition {key!r} rows {t.num_rows} != manifest {want_rows}"
            )
        missing = {"bucket", "token", "doc_id"} - set(t.column_names)
        if missing:
            problems.append(f"invindex: partition {key!r} missing {sorted(missing)}")
            continue
        bvals = t["bucket"].to_numpy(zero_copy_only=False)
        if len(bvals) and not (bvals == b).all():
            problems.append(f"invindex: partition {key!r} has foreign bucket rows")
        if t.num_rows:
            h = (fingerprint64(t["token"]) % np.uint64(nb)).astype(np.int64)
            if not (h == b).all():
                problems.append(
                    f"invindex: partition {key!r} token hash does not map to bucket"
                )
    return problems


def _sniff_crawl_product(out_dir: str) -> bool:
    from .product import sniff_crawl_product

    return sniff_crawl_product(out_dir)


def _validate_crawl_product(out_dir: str) -> list[str]:
    from .product import validate_crawl_product

    return validate_crawl_product(out_dir)


#: the store-model union, in dispatch order (first sniff wins) — the
#: TypeAdapter(Sentinel1Root | Sentinel2Root) analogue. crawl-product is
#: the deep member-by-member hierarchy (functions/product.py — the
#: s2.py:461-696 analogue with real dtype/dim/value constraints).
STORE_MODELS: list[tuple[str, Callable[[str], bool], Callable[[str], list[str]]]] = [
    ("geocell-pyramid", sniff_pyramid, validate_pyramid_store),
    ("tile-raster", sniff_raster, validate_raster_store),
    ("inverted-index", sniff_invindex, validate_invindex_store),
    ("crawl-product", _sniff_crawl_product, _validate_crawl_product),
]


def classify_store(out_dir: str) -> str | None:
    """Which registered store model does this directory match? (None if
    no model's structural sniff accepts it.)"""
    for kind, sniff, _ in STORE_MODELS:
        try:
            if sniff(out_dir):
                return kind
        except Exception:
            continue
    return None


def validate_store(out_dir: str) -> tuple[str | None, list[str]]:
    """Union-dispatch + closed validation. Returns (kind, problems);
    kind None means no store model recognized the directory."""
    kind = classify_store(out_dir)
    if kind is None:
        return None, [f"{out_dir}: no registered store model matches"]
    problems: list[str] = []
    for k, sniff, validate in STORE_MODELS:
        try:
            matches = sniff(out_dir)
        except Exception:
            matches = False
        if matches:
            problems += validate(out_dir)
    return kind, problems
