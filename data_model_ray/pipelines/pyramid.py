"""Per-cell aggregation + multi-resolution tile-pyramid rollups.

Re-derives the reference's GeoZarr multiscale semantics as Ray Data
shuffles:

- **base cell aggregate** = the finest pyramid level: per-batch Arrow
  partials (``pa.Table.group_by`` combiner — zero pandas round-trip) then
  a coalescing combine — the partial+final aggregation pattern, so the
  exchange moves per-cell partials (one row per cell per batch), never
  raw pages;
- **rollup chain**: level r -> r-1 is ``groupby(parent_cell).aggregate``
  over the PREVIOUS level's output, exactly the reference's
  previous-level chaining (/root/reference/src/eopf_geozarr/conversion/
  geozarr.py:701-783; pairwise chain s2_multiscale.py:362-407);
- **type-aware aggregation registry** keyed per column, mirroring
  ``resampling_methods`` (/root/reference/src/eopf_geozarr/s2_optimization/
  s2_resampling.py:206-212):

  ========  ==========================================================
  sum       child sum (counts/bytes)
  mean      UNWEIGHTED mean of child values — the reference's
            mean-of-previous-level block average (conversion/utils.py:70-132)
  max       any-set quality-mask semantics (s2_resampling.py:119-153)
  min       bbox union partner of max
  clipped_mean  mean then clip[0,1] — probability semantics
            (s2_resampling.py:156-169)
  first     deterministic first child by cell-local (i_lat, i_lon) order —
            classification center/index-0 semantics
            (s2_resampling.py:74-116, s2_multiscale.py:924-928), made
            distribution-safe by packing (child_rank, value_idx) and
            taking Min (SURVEY.md section 7.4 "deterministic first")
  ========  ==========================================================

- **level planner**: COG-style ladder down from the base resolution until
  the cell count drops under ``min_cells``
  (``calculate_overview_levels``, /root/reference/src/eopf_geozarr/
  conversion/geozarr.py:797-838);
- **per-level manifest** with asset / derived_from / scale entries plus a
  root bbox union, the ``multiscales`` layout + store-root bbox analogue
  (/root/reference/docs/geozarr-minispec.md:320-398,
  s2_optimization/s2_converter.py:321-363).

The pyramid is bounded: GeoCell res 7 has <= 512*1024 cells, so every
level's table is small no matter how many input rows — all heavy lifting
happens in the single base aggregation shuffle.
"""

from __future__ import annotations

import json
import math
import os
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..grid import geocell_ij, geocell_parent, geocell_res
from ..fixtures import LANGS

#: vocabulary for the packed-first trick ('und' = unknown)
LANG_VOCAB = np.array(sorted(set(LANGS.tolist() + ["und"])))

#: column -> rollup semantics for the standard cell stats table
DEFAULT_AGG_REGISTRY: dict[str, str] = {
    "pages": "sum",
    "text_bytes": "sum",
    "token_sum": "sum",
    "mean_text_len": "mean",
    "score_mean": "clipped_mean",
    "flag_max": "max",
    "lang_first": "first",
    "lat_min": "min",
    "lat_max": "max",
    "lon_min": "min",
    "lon_max": "max",
}

NUM_COMBINE_BUCKETS = 32


#: \x00 sorts before every url byte, so min("url\x00lang") = (min url, its
#: lang) — the deterministic-first seed packed into ONE Arrow aggregate
_FIRST_SEP = "\x00"


def _rename(t: pa.Table, mapping: dict[str, str]) -> pa.Table:
    return t.rename_columns([mapping.get(c, c) for c in t.column_names])


def _partial_cell_stats(batch: pa.Table | pd.DataFrame, cell_col: str) -> pa.Table:
    """Per-batch per-cell partials (the combiner half of the aggregate).

    Pure Arrow (``pa.Table.group_by``) — string columns stay Arrow buffers
    instead of decaying to Python objects in a pandas round-trip.
    """
    import pyarrow.compute as pc_

    if isinstance(batch, pd.DataFrame):
        batch = pa.Table.from_pandas(batch, preserve_index=False)
    fk = pc_.binary_join_element_wise(batch["url"], batch["lang"], _FIRST_SEP)
    t = batch.append_column("__fk", fk)
    g = t.group_by(cell_col, use_threads=False).aggregate(
        [
            ("url", "count"),
            ("text_len", "sum"),
            ("token_count", "sum"),
            ("score", "sum"),
            ("flag", "max"),
            ("lat", "min"),
            ("lat", "max"),
            ("lon", "min"),
            ("lon", "max"),
            ("__fk", "min"),
        ]
    )
    return _rename(
        g,
        {
            cell_col: "cell",
            "url_count": "pages",
            "text_len_sum": "text_bytes",
            "token_count_sum": "token_sum",
            "score_sum": "score_sum",
            "flag_max": "flag_max",
            "__fk_min": "first_key",
        },
    )


def _merge_partials(t: pa.Table) -> pa.Table:
    """Algebraic (commutative + associative) merge of partial rows — safe
    at any tree level with any row grouping."""
    g = t.group_by("cell", use_threads=False).aggregate(
        [
            ("pages", "sum"),
            ("text_bytes", "sum"),
            ("token_sum", "sum"),
            ("score_sum", "sum"),
            ("flag_max", "max"),
            ("lat_min", "min"),
            ("lat_max", "max"),
            ("lon_min", "min"),
            ("lon_max", "max"),
            ("first_key", "min"),
        ]
    )
    return _rename(
        g,
        {
            "pages_sum": "pages",
            "text_bytes_sum": "text_bytes",
            "token_sum_sum": "token_sum",
            "score_sum_sum": "score_sum",
            "flag_max_max": "flag_max",
            "lat_min_min": "lat_min",
            "lat_max_max": "lat_max",
            "lon_min_min": "lon_min",
            "lon_max_max": "lon_max",
            "first_key_min": "first_key",
        },
    )


def _finalize_partials(t: pa.Table) -> pa.Table:
    import pyarrow.compute as pc_

    out = _merge_partials(t)
    pages_f = pc_.cast(out["pages"], pa.float64())
    mean_text_len = pc_.divide(pc_.cast(out["text_bytes"], pa.float64()), pages_f)
    score_mean = pc_.min_element_wise(
        pc_.max_element_wise(pc_.divide(out["score_sum"], pages_f), 0.0), 1.0
    )
    split = pc_.split_pattern(out["first_key"], _FIRST_SEP)
    lang_first = pc_.list_element(split, 1)
    out = out.drop_columns(["score_sum", "first_key"])
    out = out.append_column("lang_first", lang_first)
    out = out.append_column("mean_text_len", mean_text_len)
    return out.append_column("score_mean", score_mean)


def _combine_partials(t: pa.Table | pd.DataFrame) -> pa.Table:
    """Single-shot combine (merge + finalize) — used by tests/goldens."""
    if isinstance(t, pd.DataFrame):
        t = pa.Table.from_pandas(t, preserve_index=False)
    return _finalize_partials(t)


def cell_aggregate(ds, *, cell_col: str = "h3_7", num_buckets: int = NUM_COMBINE_BUCKETS):
    """Pages dataset -> base cell-stats Dataset (one row per active cell).

    Sort-free tree reduction: per-block partials (one row per cell per
    block) -> coalescing ``repartition`` + algebraic merge -> single-block
    finalize. No groupby/sort shuffle at all — the cell table is bounded by
    the grid (<= 512*1024 cells at res 7), so every tree level is bounded:
    level sizes are (blocks x cells) -> (fanout x cells) -> cells. On a
    multi-node cluster the coalescing repartition moves partial rows (tiny)
    between nodes, never raw pages. `num_buckets` is the tree fanout.
    """

    def partial(batch: pa.Table) -> pa.Table:
        return _partial_cell_stats(batch, cell_col)

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=None)
        .repartition(num_buckets)
        .map_batches(_merge_partials, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(_finalize_partials, batch_format="pyarrow", batch_size=None)
    )


# ---------------------------------------------------------------------------
# Rollup chain
# ---------------------------------------------------------------------------


def _pack_first(cells: np.ndarray, values: np.ndarray) -> np.ndarray:
    """Pack (child-local rank, vocab idx) for distribution-safe Min-first."""
    i_lat, i_lon = geocell_ij(cells)
    rank = ((i_lat & 1) << 1 | (i_lon & 1)).astype(np.uint64)
    idx = np.searchsorted(LANG_VOCAB, values)
    idx = np.clip(idx, 0, len(LANG_VOCAB) - 1).astype(np.uint64)
    # guard unknown values -> map to 'und'
    miss = LANG_VOCAB[idx] != values
    if miss.any():
        idx[miss] = np.searchsorted(LANG_VOCAB, "und")
    return (rank << np.uint64(8)) | idx


def rollup_level(level_table: pa.Table, *, registry: dict[str, str] | None = None) -> pa.Table:
    """One rollup step: cell table at res r -> parent table at res r-1.

    Pure Arrow/pandas on one (bounded-size) level table; used inside the
    driver loop. Distribution note: at 100 TB the base aggregate has already
    reduced data to <= 512*1024 rows, so per-level rollups are single-block
    operations — the same shape the reference uses (whole overview level in
    one dask graph).
    """
    registry = registry or DEFAULT_AGG_REGISTRY
    df = level_table.to_pandas()
    # canonical child order: stable-sort by cell so per-parent float
    # aggregation order (hence bits) is independent of input row order —
    # the invariance the Dataset-mode rollup parity relies on
    df = df.sort_values("cell", kind="mergesort").reset_index(drop=True)
    cells = df["cell"].to_numpy().astype(np.uint64)
    res = int(geocell_res(cells[:1])[0])
    parent = geocell_parent(cells, res - 1)
    df = df.assign(__parent=parent)

    agg_spec: dict[str, tuple[str, str]] = {}
    for col, kind in registry.items():
        if col not in df.columns:
            continue
        if kind == "sum":
            agg_spec[col] = (col, "sum")
        elif kind == "mean" or kind == "clipped_mean":
            agg_spec[col] = (col, "mean")
        elif kind == "max":
            agg_spec[col] = (col, "max")
        elif kind == "min":
            agg_spec[col] = (col, "min")
        elif kind == "first":
            df[f"__packed_{col}"] = _pack_first(cells, df[col].to_numpy())
            agg_spec[f"__packed_{col}"] = (f"__packed_{col}", "min")
        elif callable(kind):
            # user-extension surface (SURVEY 2.10, resampling_methods
            # analogue): a callable Series -> scalar reducer
            agg_spec[col] = (col, kind)
        else:
            raise ValueError(f"unknown agg kind {kind!r} for column {col!r}")

    out = df.groupby("__parent", sort=False).agg(**agg_spec).reset_index()
    out = out.rename(columns={"__parent": "cell"})
    for col, kind in registry.items():
        if kind == "clipped_mean" and col in out.columns:
            out[col] = out[col].clip(0.0, 1.0)
        if kind == "first" and f"__packed_{col}" in out.columns:
            idx = (out[f"__packed_{col}"].to_numpy().astype(np.uint64) & np.uint64(0xFF)).astype(
                np.int64
            )
            out[col] = LANG_VOCAB[idx]
            out = out.drop(columns=[f"__packed_{col}"])
    return pa.Table.from_pandas(out, preserve_index=False)


def rollup_level_ds(level_ds, *, registry: dict[str, str] | None = None, num_buckets: int | None = None):
    """Dataset-mode rollup step (res r -> r-1) — the 100x path for bases
    past the driver row budget (a res-9/10 base grid breaks the
    grid-bounded driver-side assumption of ``rollup_level``).

    One cell-bounded bucketed exchange per level (the repo-wide
    bucketed-exchange rule): rows route on an int32 splitmix bucket of
    the PARENT cell, so every parent's <=4 children land in exactly one
    bucket, and each bucket runs the exact driver kernel
    (``rollup_level``) over its sub-table. Results are bit-identical to
    the driver path by construction: the kernel stable-sorts by cell, so
    its float aggregation order is input-order-invariant. Mirrors the
    reference's level-from-previous-level chain
    (/root/reference/src/eopf_geozarr/conversion/geozarr.py:701-783) as
    one bounded shuffle per level.
    """
    from ..hashing import hash_stream
    from .linkgraph import _num_buckets

    nb = num_buckets or _num_buckets()

    def tag(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column("__b", pa.array([], pa.int32()))
        cells = t["cell"].to_numpy(zero_copy_only=False).astype(np.uint64)
        res = int(geocell_res(cells[:1])[0])
        parent = geocell_parent(cells, res - 1)
        b = (hash_stream(parent.astype(np.uint64), 41) % np.uint64(nb)).astype(
            np.int32
        )
        return t.append_column("__b", pa.array(b))

    def combine(t: pa.Table) -> pa.Table:
        return rollup_level(t.drop_columns(["__b"]), registry=registry)

    return (
        level_ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(combine, batch_format="pyarrow")
    )


def _gather_level(ds) -> pa.Table:
    """Collect a (grid-bounded) level Dataset to one driver table, sorted
    by cell (deterministic across bucket counts / block orders)."""
    import ray

    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return ds.schema().base_schema.empty_table()
    t = pa.concat_tables(tabs, promote_options="default").combine_chunks()
    order = pc.sort_indices(t, sort_keys=[("cell", "ascending")])
    return t.take(order)


def backfill_from_finer(
    coarse: pa.Table,
    fine: pa.Table,
    columns: list[str],
    *,
    agg: str = "mean",
) -> pa.Table:
    """Inject columns that exist only at a finer level into a coarser one —
    the reference's ``inject_missing_bands`` backfill join (J1,
    /root/reference/src/eopf_geozarr/s2_optimization/s2_multiscale.py:160-231):
    coarsen the finer-resolution source to the target grid (type-aware agg),
    then left-merge aligning on the target cells. Cells with no finer data
    keep null.
    """
    if agg not in ("mean", "max", "sum", "min"):
        raise ValueError(agg)
    fdf = fine.to_pandas()
    fcells = fdf["cell"].to_numpy().astype(np.uint64)
    cdf = coarse.to_pandas()
    target_res = int(geocell_res(cdf["cell"].to_numpy().astype(np.uint64)[:1])[0])
    fdf = fdf.assign(__parent=geocell_parent(fcells, target_res))
    rolled = (
        fdf.groupby("__parent", sort=False)[columns].agg(agg).reset_index()
    ).rename(columns={"__parent": "cell"})
    merged = cdf.merge(rolled, on="cell", how="left", suffixes=("", "_fine"))
    return pa.Table.from_pandas(merged, preserve_index=False)


def plan_levels(base_res: int, base_cells: int, *, min_cells: int = 16) -> list[int]:
    """COG-ladder planner: levels to build below the base resolution.

    Mirrors ``calculate_overview_levels`` (reference geozarr.py:797-838):
    halve each axis (quarter the worst-case cell count) until the estimated
    count drops under ``min_cells`` or res 0 is reached.
    """
    levels = []
    est = base_cells
    res = base_res - 1
    while res >= 0 and est // 4 >= min_cells:
        est //= 4
        levels.append(res)
        res -= 1
    return levels


def pyramid_fingerprint(base_table: pa.Table, base_res: int) -> str:
    """Cheap content fingerprint of the base level (rows + page sum + res).

    Drives skip-if-valid level resume; a changed base invalidates all levels
    (the reference's validate-existing semantics, conversion/utils.py:192-258).
    """
    pages_sum = int(pa.compute.sum(base_table["pages"]).as_py() or 0)
    cell_sum = int(
        pa.compute.sum(pa.compute.cast(base_table["cell"], pa.uint64())).as_py() or 0
    )
    return f"r{base_res}-n{base_table.num_rows}-p{pages_sum}-c{cell_sum & 0xFFFFFFFF:x}"


def build_pyramid(
    base_table: pa.Table,
    out_dir: str,
    *,
    base_res: int,
    registry: dict[str, str] | None = None,
    min_cells: int = 16,
    write: bool = True,
    resume: bool = True,
    scale_offset: dict[str, dict[str, Any]] | None = None,
    target_chunk: int = 131_072,
    rollup_row_budget: int = 2_000_000,
) -> dict[str, Any]:
    """Driver loop: write the base level, then roll up level by level.

    Levels whose INPUT exceeds ``rollup_row_budget`` rows roll up through
    the Dataset-mode exchange (``rollup_level_ds`` — the res-9/10 path
    where the grid bound outgrows a single driver pandas call); smaller
    levels use the driver kernel directly. Both paths are bit-identical
    (parity-pinned in tests/test_pyramid.py), so the switch only moves
    compute, never results.

    Returns (and writes) the root manifest: per-level layout entries with
    ``asset`` / ``derived_from`` / relative ``scale`` plus the root bbox
    union — the ``multiscales`` + store-root-bbox analogue
    (/root/reference/docs/geozarr-minispec.md:361-398,
    s2_converter.py:321-363). Levels are written as separate parquet
    directories (resumable layout: one directory per level); with
    ``resume=True`` a level whose output validates against the base
    fingerprint is skipped and reloaded instead of recomputed — the
    skip-if-valid semantics of the reference's band writer
    (conversion/geozarr.py:1044-1057).
    """
    from ..state.lineage import (
        LineageLog,
        read_partition_table,
        validate_partition,
        write_partition_atomic,
    )

    from ..functions.encoding import plan_table_encoding, unpack_plan, unpack_table

    levels_meta: list[dict[str, Any]] = []
    level_plans: dict[int, dict[str, Any]] = {}
    current = base_table
    res = base_res
    fingerprint = pyramid_fingerprint(base_table, base_res) if write else ""
    log = LineageLog(out_dir) if write else None

    def emit_level(table: pa.Table, r: int, compute) -> pa.Table:
        """Write level r (skip-if-valid); returns the level's table."""
        pkey = f"level{r}"
        if write and resume:
            rows = validate_partition(out_dir, pkey, fingerprint)
            if rows is not None:
                log.append(
                    {
                        "stage": "pyramid",
                        "partition_key": pkey,
                        "input_fingerprint": fingerprint,
                        "rows_out": rows,
                        "status": "skipped_valid",
                        "wall_s": 0.0,
                    }
                )
                stored = read_partition_table(out_dir, pkey)
                stored = unpack_table(stored, unpack_plan(scale_offset))
                level_plans[r] = plan_table_encoding(
                    stored.schema,
                    stored.num_rows,
                    target_chunk=target_chunk,
                    scale_offset=scale_offset,
                )
                return stored
        table = compute() if table is None else table
        plan = plan_table_encoding(
            table.schema,
            table.num_rows,
            target_chunk=target_chunk,
            scale_offset=scale_offset,
        )
        level_plans[r] = plan
        if write:
            rec = write_partition_atomic(
                table, out_dir, pkey, fingerprint, encoding=plan
            )
            rec["stage"] = "pyramid"
            log.append(rec)
        return table

    def _level_spatial(r: int) -> dict[str, Any]:
        """Spatial layout attrs for the global GeoCell grid at res ``r``
        (GeoZarrScaleLevel analogue — mandatory transform+shape per
        layout entry, reference store.py:81-92): pixel-registered affine
        over the full [-180,180]x[-90,90] grid."""
        from ..functions.affine import affine_from_bounds
        from ..grid import _geocell_dims

        n_lat, n_lon = _geocell_dims(r)
        return {
            "spatial:shape": [n_lat, n_lon],  # (rows, cols)
            "spatial:transform": list(
                affine_from_bounds(-180.0, -90.0, 180.0, 90.0, n_lon, n_lat)
            ),
        }

    current = emit_level(current, res, None)
    levels_meta.append(
        {
            "level": res,
            "cells": current.num_rows,
            "asset": f"part=level{res}",
            "derived_from": None,
            "scale": 1,
            "encoding": level_plans[res],
            **_level_spatial(res),
        }
    )
    def _rollup(p: pa.Table) -> pa.Table:
        if p.num_rows <= rollup_row_budget:
            return rollup_level(p, registry=registry)
        import ray.data as rd

        blocks = max(1, min(p.num_rows // 65_536, 512))
        return _gather_level(
            rollup_level_ds(rd.from_arrow(p).repartition(blocks), registry=registry)
        )

    for r in plan_levels(base_res, current.num_rows, min_cells=min_cells):
        prev = current
        current = emit_level(None, r, lambda p=prev: _rollup(p))
        levels_meta.append(
            {
                "level": r,
                "cells": current.num_rows,
                "asset": f"part=level{r}",
                "derived_from": f"part=level{r + 1}",
                "scale": 2,  # per-axis /2, as the reference's COG ladder
                "encoding": level_plans[r],
                **_level_spatial(r),
            }
        )

    from ..functions.crs import proj_encodings

    base_df = base_table.to_pandas()
    manifest = {
        "kind": "geocell-pyramid",
        "base_res": base_res,
        "levels": levels_meta,
        "spatial:bbox": [
            _json_safe(base_df["lon_min"].min()),
            _json_safe(base_df["lat_min"].min()),
            _json_safe(base_df["lon_max"].max()),
            _json_safe(base_df["lat_max"].max()),
        ],
        # Spatial-convention root attrs (reference spatial.py:19-33:
        # dimensions required non-empty; registration/transform_type
        # pinned so readers need no guessing)
        "spatial:dimensions": ["lon", "lat"],
        "spatial:transform_type": "affine",
        "spatial:registration": "pixel",
        "crs": "EPSG:4326",
        # multi-encoding CRS attrs — the Proj convention object
        # (reference geoproj.py:20-34: >=1 of code/wkt2/projjson required)
        "proj": proj_encodings("EPSG:4326"),
    }
    if write:
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "manifest.json"), "w") as f:
            json.dump(manifest, f, indent=2)
    return manifest


def _json_safe(x: Any) -> Any:
    """NaN/Inf -> JSON-safe strings, the reference's sanitizer semantics
    (/root/reference/src/eopf_geozarr/conversion/fs_utils.py:22-107)."""
    if isinstance(x, (float, np.floating)):
        if math.isnan(x):
            return "NaN"
        if math.isinf(x):
            return "Infinity" if x > 0 else "-Infinity"
        return float(x)
    if isinstance(x, (np.integer,)):
        return int(x)
    return x
