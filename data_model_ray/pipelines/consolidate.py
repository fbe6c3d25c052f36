"""Structure reorganization pass: regroup scattered inputs by declared
native resolution before conversion.

Re-derives the reference's ``S2DataConsolidator`` semantics
(/root/reference/src/eopf_geozarr/s2_optimization/s2_data_consolidator.py:10-217):
the reference walks a scattered DataTree, classifies every variable into a
category, takes the NATIVE level (``/0``) when a group is itself a
multiscale pyramid, and regroups everything into per-native-resolution
buckets that the converter then processes uniformly. The Parquet/Ray
analogue here:

- every input path is classified through the engine's existing union
  dispatchers — ``functions.store.classify_store`` for whole store
  directories (a pyramid contributes only its BASE level, the native
  resolution) and ``functions.schema.classify`` for loose tables (the
  ``is_sentinel2_dataset`` analogue);
- each classified fragment gets a declared native resolution: the store
  manifest's ``base_res``, a ``attrs.json`` sidecar (``native_res``), or
  inference from its cell column (``grid.geocell_res`` on a head sample);
  ungridded tables (e.g. raw pages) group under resolution ``None``;
- the result is a :class:`ConsolidationPlan` mapping
  ``(category, resolution) -> fragments`` plus an explicit unclassified
  list (never silently dropped), and ``load_group`` unions a group's
  fragments into ONE pruned, lazily-read Dataset — the uniform input the
  downstream pipeline expects.

Scale shape: classification reads only footers + a head sample per
fragment (no data scan); loading stays lazy (``sized_read_parquet`` per
fragment + ``Dataset.union``), so consolidation adds no exchange of its
own.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

import pyarrow as pa
import pyarrow.parquet as pq

#: resolution key for tables with no cell column (raw lat/lon inputs)
UNGRIDDED = None


@dataclass
class Fragment:
    path: str
    category: str
    resolution: int | None
    rows: int


@dataclass
class ConsolidationPlan:
    groups: dict[tuple[str, int | None], list[Fragment]] = field(
        default_factory=dict
    )
    unclassified: list[tuple[str, str]] = field(default_factory=list)

    def add(self, frag: Fragment) -> None:
        self.groups.setdefault((frag.category, frag.resolution), []).append(frag)

    def load_group(self, category: str, resolution: int | None, *, columns=None):
        """Union of one group's fragments as a single lazy Dataset.

        Directory fragments are expanded to their parquet members so
        sidecars (attrs.json, _lineage.jsonl) never reach the reader.
        """
        from ..sources.fs import sized_read_parquet

        frags = self.groups.get((category, resolution))
        if not frags:
            raise KeyError(f"no fragments for ({category!r}, {resolution!r})")
        parts = [
            sized_read_parquet(p, columns=columns)
            for f in frags
            for p in _parquet_paths(f.path)
        ]
        ds = parts[0]
        return ds.union(*parts[1:]) if len(parts) > 1 else ds

    def summary(self) -> dict[str, Any]:
        return {
            "groups": {
                f"{cat}@{('native' if res is None else res)}": {
                    "fragments": len(frags),
                    "rows": sum(f.rows for f in frags),
                }
                for (cat, res), frags in sorted(
                    self.groups.items(), key=lambda kv: (kv[0][0], str(kv[0][1]))
                )
            },
            "unclassified": list(self.unclassified),
        }


def _parquet_paths(path: str) -> list[str]:
    if not os.path.isdir(path):
        return [path]
    return sorted(
        os.path.join(root, f)
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def _head_sample(path: str, n: int) -> pa.Table:
    """First <= n rows of a parquet file/dir without a full read."""
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                if f.endswith(".parquet"):
                    path = os.path.join(root, f)
                    break
            else:
                continue
            break
    pf = pq.ParquetFile(path)
    batches = pf.iter_batches(batch_size=n)
    try:
        return pa.Table.from_batches([next(batches)], schema=pf.schema_arrow)
    except StopIteration:
        return pf.schema_arrow.empty_table()


def _num_rows(path: str) -> int:
    total = 0
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(os.path.join(root, f)).metadata.num_rows
    else:
        total = pq.ParquetFile(path).metadata.num_rows
    return total


def _declared_resolution(path: str, sample: pa.Table) -> int | None:
    """Sidecar attrs.json ``native_res`` wins; else infer from the cell
    column (geocell ids carry their resolution in the top byte); else
    ungridded."""
    import numpy as np

    from ..grid import geocell_res

    sidecar = os.path.join(
        path if os.path.isdir(path) else os.path.dirname(path), "attrs.json"
    )
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            attrs = json.load(f)
        if "native_res" in attrs:
            return int(attrs["native_res"])
    for col in ("cell", "h3_7"):
        if col in sample.column_names and sample.num_rows:
            cells = sample[col].to_numpy(zero_copy_only=False).astype(np.uint64)
            return int(geocell_res(cells).max())
    return UNGRIDDED


def consolidate_inputs(
    paths: list[str],
    *,
    contracts=None,
    sample_rows: int = 1024,
) -> ConsolidationPlan:
    """Classify + regroup scattered inputs (see module docstring).

    ``contracts``: SchemaContract list for loose-table classification
    (default: the engine's standard pages / enriched / cell-stats union).
    """
    from ..functions.schema import (
        CELL_STATS_CONTRACT,
        ENRICHED_CONTRACT,
        PAGES_CONTRACT,
        classify,
    )
    from ..functions.store import classify_store

    if contracts is None:
        contracts = [PAGES_CONTRACT, ENRICHED_CONTRACT, CELL_STATS_CONTRACT]

    plan = ConsolidationPlan()
    for path in paths:
        if not os.path.exists(path):
            plan.unclassified.append((path, "does not exist"))
            continue
        # whole-store directories: the native level is the store's base
        # (the reference takes the '/0' level of multiscale groups)
        if os.path.isdir(path):
            kind = classify_store(path)
            if kind == "geocell-pyramid":
                with open(os.path.join(path, "manifest.json")) as f:
                    m = json.load(f)
                base = m["levels"][0]
                frag_path = os.path.join(path, base["asset"])
                plan.add(
                    Fragment(
                        path=frag_path,
                        category="cell_stats",
                        resolution=int(m["base_res"]),
                        rows=int(base["cells"]),
                    )
                )
                continue
            if kind is not None:
                plan.unclassified.append(
                    (path, f"store kind {kind!r} has no native table form")
                )
                continue
        try:
            sample = _head_sample(path, sample_rows)
        except Exception as e:
            plan.unclassified.append((path, f"unreadable ({e})"))
            continue
        category = classify(sample, contracts)
        if category is None:
            plan.unclassified.append(
                (path, f"no contract matches columns {sample.column_names}")
            )
            continue
        plan.add(
            Fragment(
                path=path,
                category=category,
                resolution=_declared_resolution(path, sample),
                rows=_num_rows(path),
            )
        )
    return plan
