"""AIMD adaptive batch sizing for actor-pool stages (SURVEY.md section 4).

Ray Data fixes ``batch_size`` per stage; payload cost per row can still vary
by orders of magnitude (wide html, mega-cells). The AIMD controller gives
each actor a *local* adaptive sub-chunk size: additively grow while batches
complete under the latency target, multiplicatively shrink on overshoot —
the classic congestion-control loop, per north_star. State lives in the
actor (one controller per worker), so no coordination is needed and the
loop converges per-worker to that worker's capacity.

Usage::

    class MyStage(AdaptiveBatchMixin):
        def __init__(self):
            super().__init__(target_latency_s=0.5)
        def process_chunk(self, chunk: pa.Table) -> pa.Table: ...
        def __call__(self, batch):
            return self.adaptive_call(batch)
"""

from __future__ import annotations

import time

import pyarrow as pa


class AIMDController:
    """Additive-increase / multiplicative-decrease chunk-size controller."""

    def __init__(
        self,
        *,
        initial: int = 2048,
        minimum: int = 64,
        maximum: int = 65536,
        increase: int = 512,
        decrease: float = 0.5,
        target_latency_s: float = 0.5,
    ):
        if minimum <= 0 or maximum < minimum:
            raise ValueError("invalid chunk bounds")
        self.size = max(minimum, min(initial, maximum))
        self.minimum = minimum
        self.maximum = maximum
        self.increase = increase
        self.decrease = decrease
        self.target = target_latency_s
        self.observations = 0

    def record(self, latency_s: float) -> int:
        """Feed one chunk latency; returns the next chunk size."""
        self.observations += 1
        if latency_s > self.target:
            self.size = max(self.minimum, int(self.size * self.decrease))
        else:
            self.size = min(self.maximum, self.size + self.increase)
        return self.size


class AdaptiveBatchMixin:
    """Mixin running ``process_chunk`` over AIMD-sized slices of each batch."""

    def __init__(self, **aimd_kwargs):
        self.controller = AIMDController(**aimd_kwargs)

    def process_chunk(self, chunk: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError

    def adaptive_call(self, batch: pa.Table) -> pa.Table:
        outputs = []
        pos = 0
        n = len(batch)
        while pos < n:
            size = self.controller.size
            chunk = batch.slice(pos, size)
            t0 = time.perf_counter()
            outputs.append(self.process_chunk(chunk))
            self.controller.record(time.perf_counter() - t0)
            pos += len(chunk)
        if not outputs:
            return self.process_chunk(batch)
        return pa.concat_tables(outputs, promote_options="default")
