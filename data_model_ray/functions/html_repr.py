"""HTML tree repr for pyramid / raster manifests (M13).

The reference renders its zarr hierarchy as a collapsible HTML tree for
notebooks and the CLI `info --html` path
(/root/reference/src/eopf_geozarr/pyz/common.py:61-260,
cli.py:300-360). The engine analogue renders a manifest dict: one
<details> node per level with cells / asset / scale / encoding summary,
the CRS encodings present, and the root bbox. Pure string templating — no
external deps; values are HTML-escaped.
"""

from __future__ import annotations

import html
from typing import Any

_STYLE = (
    "font-family:monospace;font-size:12px;line-height:1.5;"
    "border-left:2px solid #888;padding-left:8px;margin:2px 0"
)


def _esc(x: Any) -> str:
    return html.escape(str(x))


def _kv(label: str, value: Any) -> str:
    return (
        f"<div><span style='color:#555'>{_esc(label)}:</span> "
        f"<b>{_esc(value)}</b></div>"
    )


def _level_node(lv: dict[str, Any]) -> str:
    rows = [_kv("cells", lv.get("cells"))]
    if lv.get("derived_from"):
        rows.append(_kv("derived_from", lv["derived_from"]))
    if "scale" in lv:
        rows.append(_kv("scale", f"/{lv['scale']} per axis" if lv["scale"] != 1 else "base"))
    enc = lv.get("encoding") or {}
    if enc:
        rows.append(
            _kv(
                "encoding",
                f"row_group={enc.get('row_group_size')} "
                f"rows_per_file={enc.get('rows_per_file')}",
            )
        )
        packed = [
            name
            for name, spec in (enc.get("columns") or {}).items()
            if spec.get("scale_offset")
        ]
        if packed:
            rows.append(_kv("packed columns", ", ".join(packed)))
    for key in ("scaleDenominator", "cellSize", "tile_size"):
        if key in lv:
            rows.append(_kv(key, lv[key]))
    title = f"level {lv.get('level')} &mdash; {_esc(lv.get('asset', ''))}"
    return (
        f"<details open><summary><b>{title}</b></summary>"
        f"<div style='{_STYLE}'>" + "".join(rows) + "</div></details>"
    )


def manifest_to_html(manifest: dict[str, Any]) -> str:
    """Render a pyramid or tile-raster manifest as a collapsible HTML tree."""
    parts = [f"<div style='{_STYLE}'>"]
    parts.append(_kv("kind", manifest.get("kind", "?")))
    if "base_res" in manifest:
        parts.append(_kv("base_res", manifest["base_res"]))
    bbox = manifest.get("spatial:bbox")
    if bbox:
        parts.append(_kv("spatial:bbox", bbox))
    proj = manifest.get("proj") or {}
    encodings = [k for k in ("proj:code", "proj:wkt2", "proj:projjson") if k in proj]
    if encodings:
        parts.append(
            _kv("crs", f"{proj.get('proj:code', '?')} ({', '.join(encodings)})")
        )
    elif manifest.get("crs"):
        parts.append(_kv("crs", manifest["crs"]))
    tms = manifest.get("tile_matrix_set")
    if tms:
        parts.append(
            _kv(
                "tile_matrix_set",
                f"{tms.get('id')} ({len(tms.get('tileMatrices', []))} matrices)",
            )
        )
    for lv in manifest.get("levels", []):
        parts.append(_level_node(lv))
    parts.append("</div>")
    return "".join(parts)


class ManifestView:
    """Notebook-friendly wrapper: ``ManifestView(manifest)`` displays the
    HTML tree via the ``_repr_html_`` protocol (the reference's notebook
    repr surface)."""

    def __init__(self, manifest: dict[str, Any]):
        self.manifest = manifest

    def _repr_html_(self) -> str:
        return manifest_to_html(self.manifest)

    def __repr__(self) -> str:
        levels = self.manifest.get("levels", [])
        return (
            f"<ManifestView kind={self.manifest.get('kind')!r} "
            f"levels={len(levels)}>"
        )
