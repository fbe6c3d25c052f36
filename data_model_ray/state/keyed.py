"""Keyed incremental state in actors — the shared-mutable-state escape hatch.

SURVEY.md 2.9 / ray guide "streaming-shaped workloads": when semantics need
state that outlives a batch (running counters, dedup-seen sets, session
carry-over), Ray Data's stateless maps don't fit; the pattern is one
``@ray.remote`` actor per key-hash bucket, fed batches in order. This is
the documented "raw Ray actors as a last resort" case (task brief custom-
operator ladder (c)) — everything else in this engine stays on the Dataset
API.

``RunningAggregatorPool`` demonstrates it: per-key running (count, sum,
max) accumulated across an ordered stream of batches, queryable at any
point — the engine analogue of the reference's driver-held mutable
progress/timing state (/root/reference/src/eopf_geozarr/conversion/
geozarr.py:699-793).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd


def _make_actor_class():
    import ray

    @ray.remote
    class _KeyedAggActor:
        """Holds running aggregates for the keys of one hash bucket."""

        def __init__(self):
            self.state: dict[Any, list] = {}  # key -> [count, sum, max]

        def ingest(self, keys: list, values: list) -> int:
            for k, v in zip(keys, values):
                s = self.state.get(k)
                if s is None:
                    self.state[k] = [1, v, v]
                else:
                    s[0] += 1
                    s[1] += v
                    s[2] = max(s[2], v)
            return len(keys)

        def snapshot(self) -> dict:
            return {k: tuple(v) for k, v in self.state.items()}

    return _KeyedAggActor


class RunningAggregatorPool:
    """A pool of keyed-state actors; routes rows by key hash.

    Usage::

        pool = RunningAggregatorPool(num_buckets=8)
        for batch in ds.iter_batches(batch_format="pandas"):
            pool.ingest(batch, key_col="user_id", value_col="value")
        totals = pool.snapshot()   # {key: (count, sum, max)}
    """

    def __init__(self, num_buckets: int = 8):
        cls = _make_actor_class()
        self.num_buckets = num_buckets
        self.actors = [cls.remote() for _ in range(num_buckets)]

    def ingest(self, batch: pd.DataFrame, *, key_col: str, value_col: str):
        import ray

        keys = batch[key_col].to_numpy()
        vals = batch[value_col].to_numpy()
        buckets = pd.util.hash_array(keys) % self.num_buckets
        futures = []
        for b in np.unique(buckets):
            m = buckets == b
            futures.append(
                self.actors[int(b)].ingest.remote(
                    keys[m].tolist(), vals[m].tolist()
                )
            )
        ray.get(futures)  # per-batch barrier keeps per-key ordering

    def snapshot(self) -> dict:
        import ray

        out: dict = {}
        for snap in ray.get([a.snapshot.remote() for a in self.actors]):
            out.update(snap)
        return out
