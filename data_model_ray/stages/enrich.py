"""Fused enrichment kernel: extract -> text stats -> geoindex -> project.

One ``map_batches`` stage instead of four: composing the stage kernels
inside a single callable removes three operator boundaries (intermediate
block materialization + rebatching), measured 5x faster at 1M rows in this
environment. The individual stage modules stay the unit of testing; this is
the deployment composition.

Two deployment modes (both keep state loaded once per worker, per the
actor-pool north star):

- ``Enrich`` as a callable class -> ``map_batches(Enrich, concurrency=N)``
  actor pool (indexes built in ``__init__`` from broadcast refs);
- ``make_enrich_fn`` -> stateless task closure with a per-worker-process
  cache (same amortization; in this sandbox task workers persist across
  executions while actor processes do not, so this mode avoids re-paying
  per-process warm-up on every run).
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .extract import extract_batch
from .geoindex import GeoIndex
from .text import text_stats

#: the post-enrichment projection (html/text dropped before any shuffle)
SLIM_COLUMNS = [
    "url", "warc_ts", "lang", "lat", "lon", "text_len", "token_count",
    "alpha_ratio", "score", "flag", "h3_7", "s2_12", "mgrs",
    "admin_l0", "admin_l1",
]


class Enrich:
    """Actor-pool deployment of the fused kernel.

    With ``validate=True`` (default when a granule index is present) every
    output batch passes the enriched-pages contract — lat/lon range, granule
    foreign-key, mgrs<->utm_zone dependency (functions/schema.py) — inside
    the same kernel, the reference's validate-on-write semantics without an
    extra operator boundary.
    """

    def __init__(
        self,
        granules_ref: Any = None,
        admin_ref: Any = None,
        *,
        verify_text: bool = True,
        h3_res: int | None = None,
        validate: bool | None = None,
        adaptive: bool = False,
        target_latency_s: float = 0.5,
    ):
        kwargs = {} if h3_res is None else {"h3_res": h3_res}
        self.geoindex = GeoIndex(granules_ref, admin_ref, **kwargs)
        self.verify_text = verify_text
        # AIMD sub-chunking (north star): per-actor latency-targeted chunk
        # sizes absorb per-row payload variance (wide html pages)
        self.controller = None
        if adaptive:
            from .aimd import AIMDController

            self.controller = AIMDController(target_latency_s=target_latency_s)
        if validate is None:
            validate = granules_ref is not None
        self.contract = None
        if validate and self.geoindex.granule_index is not None:
            from ..functions.schema import (
                ENRICHED_CONTRACT,
                SchemaContract,
                _lat_lon_in_range,
                foreign_key_invariant,
                mgrs_zone_dependency,
            )

            # FK referent = the granule index THIS actor actually joins
            # against (not a global fixture), so the check is self-consistent
            codes = list(self.geoindex.granule_index.codes) + [""]
            self.contract = SchemaContract(
                "enriched_pages",
                ENRICHED_CONTRACT.schema,
                mode="subset",
                invariants=[
                    _lat_lon_in_range,
                    foreign_key_invariant("mgrs", codes, referent_name="granule"),
                    mgrs_zone_dependency(),
                ],
            )

    def _process(self, batch: pa.Table) -> pa.Table:
        out = self.geoindex.process_chunk(
            text_stats(extract_batch(batch, verify_text=self.verify_text))
        )
        out = out.select(SLIM_COLUMNS)
        if self.contract is not None:
            self.contract.validate(out)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.controller is None:
            return self._process(batch)
        import time as _time

        outputs = []
        pos = 0
        while pos < len(batch):
            chunk = batch.slice(pos, self.controller.size)
            t0 = _time.perf_counter()
            outputs.append(self._process(chunk))
            self.controller.record(_time.perf_counter() - t0)
            pos += len(chunk)
        if not outputs:
            return self._process(batch)
        return pa.concat_tables(outputs, promote_options="default")


def make_enrich_fn(
    granules_ref: Any,
    admin_ref: Any,
    *,
    verify_text: bool = True,
    h3_res: int | None = None,
):
    """Task deployment: per-worker-process cached Enrich instance."""
    cache: dict[str, Enrich] = {}

    def enrich_fn(batch: pa.Table) -> pa.Table:
        if "e" not in cache:
            cache["e"] = Enrich(
                granules_ref, admin_ref, verify_text=verify_text, h3_res=h3_res
            )
        return cache["e"](batch)

    return enrich_fn
