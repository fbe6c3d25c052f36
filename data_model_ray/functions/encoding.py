"""Per-variable encoding planner — chunks, shards, compression, scale-offset.

Re-derives the reference's ``create_measurements_encoding``
(/root/reference/src/eopf_geozarr/s2_optimization/s2_multiscale.py:424-556):
for every variable of a pyramid level it plans aligned chunk sizes, shard
dimensions that are exact multiples of chunks, a zstd compressor, and an
optional scale-offset codec that keeps floats packed as integers on disk.

Translated to the engine's storage model (Parquet tables instead of Zarr
arrays): a *chunk* becomes the row-group size, a *shard* becomes the
rows-per-file split, the compressor becomes per-column Parquet codecs, and
the scale-offset codec is the Arrow expression pair in
``functions/scale_offset.py``. Key/coordinate columns are stored without
heavy compression (the reference gives coords ``compressors: []``) so
footer-level predicate pushdown stays cheap.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .affine import aligned_chunk_size, shard_dimension

#: columns treated as coordinates (cheap codec, never packed)
DEFAULT_KEY_COLUMNS = (
    "cell", "level", "tile_x", "tile_y", "px", "py", "url", "part_key",
)


def plan_table_encoding(
    schema: pa.Schema,
    n_rows: int,
    *,
    target_chunk: int = 131_072,
    enable_sharding: bool = True,
    key_columns: tuple[str, ...] = DEFAULT_KEY_COLUMNS,
    scale_offset: dict[str, dict[str, Any]] | None = None,
) -> dict[str, Any]:
    """Plan the physical layout of one level table.

    Returns ``{"row_group_size", "rows_per_file", "columns": {name:
    {"compression", "scale_offset"}}}``. Chunk (row-group) size is the
    largest near-divisor of ``n_rows`` <= ``target_chunk`` so groups are
    uniform (no ragged tail group); rows-per-file is the largest multiple
    of the row-group size (shards align with chunks, Zarr-v3 rule).
    """
    if n_rows < 0:
        raise ValueError("n_rows must be >= 0")
    scale_offset = scale_offset or {}
    chunk = aligned_chunk_size(n_rows, target_chunk) if n_rows else target_chunk
    rows_per_file = (
        shard_dimension(n_rows, chunk) if (enable_sharding and n_rows) else n_rows
    )
    columns: dict[str, dict[str, Any]] = {}
    for field in schema:
        is_key = field.name in key_columns
        spec: dict[str, Any] = {
            # zstd-3 for measurements (the reference's Blosc-zstd clevel 3);
            # snappy for key columns — light codec, fast scans
            "compression": "snappy" if is_key else "zstd",
        }
        so = scale_offset.get(field.name)
        if so is not None:
            if is_key:
                raise ValueError(f"key column {field.name!r} cannot be packed")
            if not pa.types.is_floating(field.type):
                raise ValueError(
                    f"scale-offset packing needs a float column, "
                    f"{field.name!r} is {field.type}"
                )
            spec["scale_offset"] = normalize_scale_offset(so)
        columns[field.name] = spec
    return {
        "row_group_size": int(chunk),
        "rows_per_file": int(rows_per_file),
        "columns": columns,
    }


def normalize_scale_offset(so: dict[str, Any]) -> dict[str, Any]:
    """Fill codec-spec defaults (add_offset 0, fill -9999, int32)."""
    return {
        "scale_factor": float(so["scale_factor"]),
        "add_offset": float(so.get("add_offset", 0.0)),
        "fill_value": int(so.get("fill_value", -9999)),
        "dtype": str(so.get("dtype", "int32")),
    }


def unpack_plan(scale_offset: dict[str, dict[str, Any]] | None) -> dict[str, Any]:
    """Columns-only plan for decoding already-packed tables (resume reads),
    where the stored dtypes are integers and the full planner's float
    check does not apply."""
    return {
        "columns": {
            name: {"compression": "zstd", "scale_offset": normalize_scale_offset(so)}
            for name, so in (scale_offset or {}).items()
        }
    }


def pack_table(table: pa.Table, plan: dict[str, Any]) -> pa.Table:
    """Apply the plan's scale-offset codecs: float columns -> packed ints."""
    from .scale_offset import encode_scale_offset

    for name, spec in plan["columns"].items():
        so = spec.get("scale_offset")
        if so is None or name not in table.column_names:
            continue
        packed = encode_scale_offset(
            table[name],
            scale_factor=so["scale_factor"],
            add_offset=so["add_offset"],
            fill_value=so["fill_value"],
            dtype=pa.type_for_alias(so["dtype"]),
        )
        table = table.set_column(table.column_names.index(name), name, packed)
    return table


def unpack_table(table: pa.Table, plan: dict[str, Any]) -> pa.Table:
    """Inverse of ``pack_table`` (packed ints -> floats, sentinel -> null)."""
    from .scale_offset import decode_scale_offset

    for name, spec in plan["columns"].items():
        so = spec.get("scale_offset")
        if so is None or name not in table.column_names:
            continue
        decoded = decode_scale_offset(
            table[name],
            scale_factor=so["scale_factor"],
            add_offset=so["add_offset"],
            fill_value=so["fill_value"],
        )
        table = table.set_column(table.column_names.index(name), name, decoded)
    return table


def parquet_write_options(plan: dict[str, Any], schema: pa.Schema) -> dict[str, Any]:
    """kwargs for ``pyarrow.parquet.write_table`` realizing the plan."""
    return {
        "row_group_size": plan["row_group_size"],
        "compression": {
            name: spec["compression"]
            for name, spec in plan["columns"].items()
            if name in schema.names
        },
    }
