"""Per-stage pipeline metrics: parse a Dataset's executed stats into
structured counter records and append them to the run's lineage log.

The north rule requires every job to emit lineage records AND counters;
``state.lineage`` covers the per-partition write side — this module covers
the per-OPERATOR compute side, from the same source of truth Ray already
keeps (``Dataset.stats()``), so no extra instrumentation runs in the hot
path. Records land in the same ``_lineage.jsonl`` stream with
``stage="metrics"``, one per operator::

    {stage: "metrics", run: <name>, operator: "MapBatches(enrich_fn)",
     tasks: 49, blocks: 49, wall_s: 6.41, rows_out: 1000000}

Cheap by construction: ``stats()`` on an executed dataset is a string
format of already-collected summaries (no new execution).
"""

from __future__ import annotations

import re
from typing import Any

#: "Operator N <name>: X tasks executed, Y blocks produced in Zs"
_OP_RE = re.compile(
    r"Operator \d+ (?P<name>.+?): (?P<tasks>\d+) tasks executed, "
    r"(?P<blocks>\d+) blocks produced in (?P<wall>[\d.]+)s"
)
#: all-to-all shape: "Operator N <name>: executed in Zs" (suboperators follow)
_OP_A2A_RE = re.compile(r"Operator \d+ (?P<name>.+?): executed in (?P<wall>[\d.]+)s")
_ROWS_RE = re.compile(r"Output num rows per block: .*?, (?P<total>[\d,]+) total")


def parse_operator_metrics(stats_text: str) -> list[dict[str, Any]]:
    """Dataset.stats() text -> one counter record per operator."""
    records: list[dict[str, Any]] = []
    chunks = stats_text.split("Operator ")
    for chunk in chunks[1:]:
        text = "Operator " + chunk
        m = _OP_RE.match(text)
        if m:
            rec: dict[str, Any] = {
                "operator": m.group("name"),
                "tasks": int(m.group("tasks")),
                "blocks": int(m.group("blocks")),
                "wall_s": float(m.group("wall")),
            }
        else:
            m = _OP_A2A_RE.match(text)
            if not m:
                continue
            rec = {"operator": m.group("name"), "wall_s": float(m.group("wall"))}
        rows = _ROWS_RE.search(chunk)
        if rows:
            rec["rows_out"] = int(rows.group("total").replace(",", ""))
        records.append(rec)
    return records


def emit_metrics(ds, out_dir: str, *, run: str) -> list[dict[str, Any]]:
    """Append per-operator counters for an EXECUTED dataset to the
    ``_lineage.jsonl`` of ``out_dir``. Returns the records."""
    from .lineage import LineageLog

    records = parse_operator_metrics(ds.stats())
    for r in records:
        r["stage"] = "metrics"
        r["run"] = run
    if records:
        LineageLog(out_dir).append_many(records)
    return records
