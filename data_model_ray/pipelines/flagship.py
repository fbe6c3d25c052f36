"""Flagship pipeline: pages -> fused enrich -> dedup -> cell aggregate ->
tile pyramid (-> optional tile raster).

The engine's `convert`-equivalent end-to-end lifecycle (SURVEY.md section
3.4), all streaming Ray Data until the bounded cell table:

1. read pages parquet or synthesize deterministically;
2. fused enrich stage (``stages/enrich.py``): html extract with in-stream
   byte-identical-text verification -> text stats -> GeoCell/S2 encode +
   broadcast MGRS/admin PIP joins -> slim projection (html/text dropped
   before any shuffle); state loads once per worker (actor pool or
   worker-cached tasks);
3. exact URL dedup (latest ``warc_ts`` wins) — hash-bucket shuffle;
4. base per-cell aggregate — partial-per-batch combiner + bucket combine;
5. driver-loop pyramid rollups + manifest, optional per-tile raster
   (bounded data from here on; every write resumable with lineage).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa

from .. import fixtures
from ..grid import H3_RES
from ..stages.dedup import dedup_exact, dedup_exact_index
from ..stages.enrich import Enrich, make_enrich_fn
from .pyramid import build_pyramid, cell_aggregate


@dataclass
class FlagshipConfig:
    geoindex_concurrency: int | tuple[int, int] = (1, 8)
    geoindex_actors: bool = False
    batch_size: int = 16384  # ~33 MB of html+text per task batch; 25% faster than 8192 at 1M rows (interleaved A/B mins 7.9 vs 10.2 s)
    #: "shuffle" = hash-bucket groupby (cluster-canonical all-to-all,
    #: the DEFAULT — winners never concentrate on the driver);
    #: "index" = shared-index actor dedup (single-node / low-dup-rate
    #: fast path; winners table is bounded by the duplicated-key count)
    dedup_mode: str = "shuffle"
    dedup_actors: int = 16
    # 512 (not cpu-scaled 64): the dedup sort partitions equal the enrich
    # output block count (~rows/batch_size), and fewer distinct bucket
    # values than partitions creates empty sort partitions whose
    # schema-less bundles Ray forwards + warns on; 512 >> any realistic
    # partition count here, measured cost-free (5.6s vs 5.6s at 1M/32cpu)
    dedup_buckets: int = 512
    cell_buckets: int = 32
    min_cells: int = 16
    h3_res: int = H3_RES
    verify_text: bool = True
    rasterize: bool = False
    extra: dict[str, Any] = field(default_factory=dict)


def pages_to_cells(ds, cfg: FlagshipConfig | None = None):
    """pages Dataset -> deduped, geoindexed pages Dataset + lazy cell stats."""
    import ray

    cfg = cfg or FlagshipConfig()
    granules_ref = ray.put(fixtures.mgrs_granules())
    admin_ref = ray.put(fixtures.admin_polygons())

    # ONE fused map stage: extract -> text stats -> geoindex -> slim
    # projection (wide html/text dropped before any shuffle, SURVEY 7.4).
    # Fusing in one kernel measured 5x faster than chained map_batches
    # (three fewer operator boundaries). State (spatial indexes) loads once
    # per worker either way; `geoindex_actors` switches between the strict
    # actor-pool deployment and per-worker-cached task deployment (default:
    # tasks — in this sandbox actor processes are per-execution and re-pay
    # the process warm-up cost, while task workers persist).
    if cfg.geoindex_actors:
        enriched = ds.map_batches(
            Enrich,
            fn_constructor_kwargs={
                "granules_ref": granules_ref,
                "admin_ref": admin_ref,
                "verify_text": cfg.verify_text,
                "h3_res": cfg.h3_res,
            },
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
            concurrency=cfg.geoindex_concurrency,
        )
    else:
        enriched = ds.map_batches(
            make_enrich_fn(
                granules_ref,
                admin_ref,
                verify_text=cfg.verify_text,
                h3_res=cfg.h3_res,
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=cfg.batch_size,
        )
    if cfg.dedup_mode == "index":
        deduped = dedup_exact_index(
            enriched, key="url", order_col="warc_ts", num_actors=cfg.dedup_actors
        )
    else:
        deduped = dedup_exact(
            enriched, key="url", order_col="warc_ts", num_buckets=cfg.dedup_buckets
        )
    cells = cell_aggregate(deduped, cell_col="h3_7", num_buckets=cfg.cell_buckets)
    return deduped, cells


def write_assignments(
    deduped,
    out_dir: str,
    *,
    fingerprint: str,
    partition_res: int = 2,
):
    """Resumable partitioned write of the per-url assignment table.

    Partition key = GeoCell parent at `partition_res` (<= 4*8*4^2 = 512
    possible keys — one directory per coarse spatial shard, the resumable
    layout the task brief requires). A rerun skips valid partitions via
    lineage + footer fingerprints (state/lineage.py).
    """
    import pyarrow.compute as pc_

    from ..grid import geocell_parent
    from ..state.lineage import resumable_write

    def add_pkey(batch: pa.Table) -> pa.Table:
        cells_np = batch["h3_7"].to_numpy(zero_copy_only=False)
        pk = geocell_parent(cells_np, partition_res)
        return batch.append_column(
            "part_key", pc_.cast(pa.array(pk), pa.string())
        )

    keyed = deduped.map_batches(add_pkey, batch_format="pyarrow")
    return resumable_write(
        keyed, out_dir, partition_col="part_key", fingerprint=fingerprint
    )


def run_flagship(
    *,
    pages_path: str | None = None,
    n_rows: int | None = None,
    out_dir: str | None = None,
    cfg: FlagshipConfig | None = None,
    source: str = "parquet",
) -> dict[str, Any]:
    """End-to-end run. Returns summary dict incl. the base cell table.

    ``source="warc"`` reads Common-Crawl-style WARC shards instead of
    parquet (sources/warc.py) — same downstream pipeline, one parsed
    block per shard. Pass ``n_rows`` alongside ``pages_path`` to skip
    the input-count pre-pass (a full parse for WARC)."""
    import ray.data as rd

    cfg = cfg or FlagshipConfig()
    t0 = time.perf_counter()
    if pages_path is not None:
        if source == "warc":
            from ..sources.warc import read_warc

            ds = read_warc(pages_path)
        elif source == "parquet":
            ds = rd.read_parquet(pages_path)
        else:
            raise ValueError(f"unknown source {source!r}")
        n_input = n_rows if n_rows is not None else ds.count()
    else:
        assert n_rows is not None
        ds = fixtures.pages_dataset(n_rows)
        n_input = n_rows

    _, cells = pages_to_cells(ds, cfg)
    # the cell table is bounded (<= 512*1024 rows at res 7) — safe to gather.
    # materialize() first: it runs the DAG under the streaming executor;
    # calling to_arrow_refs() on the lazy Dataset instead executes a slower
    # non-streaming path (measured 2x wall at 1M rows).
    import ray

    cells = cells.materialize()
    base_table = pa.concat_tables(
        [t for t in ray.get(cells.to_arrow_refs()) if t.num_rows],
        promote_options="default",
    )
    manifest = None
    raster_manifest = None
    if out_dir is not None:
        # per-operator counters from the executed DAG, into the same
        # lineage stream the writers use (north rule: lineage + metrics)
        from ..state.metrics import emit_metrics

        emit_metrics(cells, out_dir, run="flagship")
        manifest = build_pyramid(
            base_table, out_dir, base_res=cfg.h3_res, min_cells=cfg.min_cells
        )
        if cfg.rasterize:
            from .rasterize import rasterize_pyramid

            raster_manifest = rasterize_pyramid(
                f"{out_dir}_tiles",
                out_dir,
                fingerprint=manifest["levels"][0]["asset"]
                + f"-{base_table.num_rows}",
            )
    dt = time.perf_counter() - t0
    return {
        "input_rows": n_input,
        "cells": base_table.num_rows,
        "base_table": base_table,
        "manifest": manifest,
        "raster_manifest": raster_manifest,
        "seconds": dt,
        "rows_per_sec": n_input / dt if dt > 0 else float("inf"),
    }
