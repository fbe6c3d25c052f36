"""GeoIndex stage: cell encoding + broadcast point-in-polygon joins.

The north-star stateful actor-pool ``map_batches`` stage (SURVEY.md section
2.3 "Ours"): each actor builds its spatial indexes ONCE in ``__init__`` from
``ray.put`` broadcast objects, then probes every batch with vectorized
numpy — zero-copy Arrow in/out, no shuffle. Mirrors the reference's
once-per-dataset GCP reprojector state
(/root/reference/src/eopf_geozarr/conversion/sentinel1_reprojection.py:20-138)
and its per-granule spatial grouping semantics
(/root/reference/docs/geozarr-minispec.md:493-535).

Adds columns: ``h3_7`` (GeoCell res 7), ``s2_12`` (S2 level 12), ``mgrs``
(granule assignment, '' = outside all granules), ``admin_l0`` / ``admin_l1``
(admin polygon assignment, -1 = anti-join rows).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa

from ..functions.pip import PolygonIndex, RectIndex
from ..grid import H3_RES, S2_LEVEL, geocell_encode, s2_encode
from .aimd import AdaptiveBatchMixin


def build_granule_index(granules: pa.Table) -> RectIndex:
    """RectIndex from the ``mgrs_granules`` side table (driver-side, once)."""
    return RectIndex(
        np.array(granules["mgrs"].to_pylist()),
        granules["xmin"].to_numpy(),
        granules["ymin"].to_numpy(),
        granules["xmax"].to_numpy(),
        granules["ymax"].to_numpy(),
    )


class GeoIndex(AdaptiveBatchMixin):
    """``ds.map_batches(GeoIndex, fn_constructor_kwargs=dict(granules_ref=...,
    admin_ref=...), batch_format="pyarrow", zero_copy_batch=True,
    concurrency=N)``.

    ``granules_ref`` / ``admin_ref`` are ``ray.put`` handles (broadcast once,
    fetched once per actor — NOT re-shipped per batch). Passing the raw
    objects also works for driver-side unit tests. With ``adaptive=True``
    each actor processes AIMD-sized sub-chunks (stages/aimd.py) so slow
    workers shrink their unit of work instead of stalling the pool.
    """

    def __init__(
        self,
        granules_ref: Any = None,
        admin_ref: Any = None,
        *,
        h3_res: int = H3_RES,
        s2_level: int = S2_LEVEL,
        adaptive: bool = False,
        target_latency_s: float = 0.5,
    ):
        import ray

        super().__init__(target_latency_s=target_latency_s)
        self.adaptive = adaptive

        def fetch(ref):
            return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        self.h3_res = h3_res
        self.s2_level = s2_level
        granules = fetch(granules_ref)
        admin = fetch(admin_ref)
        self.granule_index = (
            build_granule_index(granules)
            if isinstance(granules, pa.Table)
            else granules
        )
        self.admin_index = (
            PolygonIndex(admin) if isinstance(admin, dict) else admin
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.adaptive:
            return self.adaptive_call(batch)
        return self.process_chunk(batch)

    def process_chunk(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        out = batch.append_column(
            "h3_7", pa.array(geocell_encode(lat, lon, self.h3_res))
        )
        out = out.append_column("s2_12", pa.array(s2_encode(lat, lon, self.s2_level)))
        if self.granule_index is not None:
            out = out.append_column(
                "mgrs", pa.array(self.granule_index.assign(lon, lat))
            )
        if self.admin_index is not None:
            out = out.append_column(
                "admin_l0", pa.array(self.admin_index.assign(lon, lat, 0))
            )
            out = out.append_column(
                "admin_l1", pa.array(self.admin_index.assign(lon, lat, 1))
            )
        return out
