"""CLI entry points — the engine's analogue of the reference's subcommands
(`convert`, `info`, `validate`, `convert-s2-optimized`;
/root/reference/src/eopf_geozarr/cli.py:1057-1206).

Usage (the only module that owns a Ray session besides bench/tests):

    python -m data_model_ray run      --pages DIR --out DIR [--cpus N]
    python -m data_model_ray synth    --rows N --out DIR
    python -m data_model_ray info     --out DIR
    python -m data_model_ray validate --out DIR
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _init_ray(cpus: int) -> None:
    """Own the Ray session for CLI runs.

    Under ``ray job submit`` the job runner exports RAY_ADDRESS pointing
    at the cluster — attach to it (num_cpus is a local-mode knob and must
    not be passed to an existing cluster). With no cluster address (or
    the sandbox's preset ``local``), start a local session sized by
    ``--cpus``.
    """
    import ray

    if not ray.is_initialized():
        addr = os.environ.get("RAY_ADDRESS") or "local"
        if addr == "local":
            ray.init(
                address="local",
                num_cpus=cpus,
                include_dashboard=False,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
        else:
            ray.init(
                address=addr,
                ignore_reinit_error=True,
                logging_level="ERROR",
            )
    from ray.data import DataContext

    from ray.data.context import ShuffleStrategy

    DataContext.get_current().enable_progress_bars = False
    DataContext.get_current().shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED


def cmd_run(args) -> int:
    from data_model_ray.pipelines.flagship import FlagshipConfig, run_flagship

    _init_ray(args.cpus)
    res = run_flagship(
        pages_path=args.pages,
        n_rows=args.rows if args.pages is None else None,
        out_dir=args.out,
        cfg=FlagshipConfig(),
    )
    print(
        json.dumps(
            {
                "input_rows": res["input_rows"],
                "cells": res["cells"],
                "seconds": round(res["seconds"], 2),
                "rows_per_sec": round(res["rows_per_sec"], 1),
                "levels": [
                    {"level": l["level"], "cells": l["cells"]}
                    for l in (res["manifest"] or {}).get("levels", [])
                ],
            }
        )
    )
    return 0


def cmd_synth(args) -> int:
    from data_model_ray import fixtures

    _init_ray(args.cpus)
    fixtures.write_pages_parquet(args.out, args.rows)
    print(json.dumps({"out": args.out, "rows": args.rows}))
    return 0


def cmd_info(args) -> int:
    path = os.path.join(args.out, "manifest.json")
    if not os.path.exists(path):
        path = os.path.join(args.out, "tms_manifest.json")
    if not os.path.exists(path):
        # no registered manifest: fall back to the generic hierarchy model
        # (the pyz GroupSpec analogue) so foreign stores are still readable
        if os.path.isdir(args.out):
            from data_model_ray.functions.hierarchy import GroupSpec

            spec = GroupSpec.from_dir(args.out)
            if spec.arrays or spec.groups or spec.attrs or spec.sidecars:
                print(repr(spec))
                for p, item in sorted(spec.flat_items().items()):
                    print(f"  {p}: {item!r}")
                return 0
        print(f"no manifest in {args.out}", file=sys.stderr)
        return 1
    with open(path) as f:
        manifest = json.load(f)
    if getattr(args, "html", False):
        from data_model_ray.functions.html_repr import manifest_to_html

        print(manifest_to_html(manifest))
    else:
        print(json.dumps(manifest, indent=2))
    return 0


def cmd_validate(args) -> int:
    """Read-side compliance checks (validate_command analogue,
    /root/reference/src/eopf_geozarr/cli.py:962-1054) through the closed
    store contract (functions/store.py): union-classify the directory,
    then run the matched model's full validation — level schemas equal to
    base, unbroken derived_from chain, bbox ordering, proj encodings,
    Spatial-convention attrs."""
    from data_model_ray.functions.store import validate_store

    kind, problems = validate_store(args.out)
    if kind is None:
        print(json.dumps({"is_valid": False, "kind": None, "problems": problems}))
        return 1
    print(json.dumps({"is_valid": not problems, "kind": kind, "problems": problems}))
    return 0 if not problems else 1


def cmd_consolidate(args) -> int:
    """Structure reorganization planner (S2DataConsolidator analogue,
    reference s2_optimization/s2_data_consolidator.py:10-217): classify
    scattered inputs and print the per-(category, native-resolution)
    grouping. Exits nonzero if anything stayed unclassified."""
    from data_model_ray.pipelines.consolidate import consolidate_inputs

    plan = consolidate_inputs(list(args.paths))
    print(json.dumps(plan.summary(), indent=2))
    return 0 if not plan.unclassified else 1


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="data_model_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    r = sub.add_parser("run", help="run the flagship pipeline")
    r.add_argument("--pages", default=None, help="pages parquet dir (else synth)")
    r.add_argument("--rows", type=int, default=10_000, help="rows to synth")
    r.add_argument("--out", required=True)
    r.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    r.set_defaults(fn=cmd_run)

    s = sub.add_parser("synth", help="synthesize the pages table")
    s.add_argument("--rows", type=int, required=True)
    s.add_argument("--out", required=True)
    s.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", 32)))
    s.set_defaults(fn=cmd_synth)

    i = sub.add_parser("info", help="print a pyramid manifest")
    i.add_argument("--out", required=True)
    i.add_argument("--html", action="store_true", help="HTML tree repr (M13)")
    i.set_defaults(fn=cmd_info)

    v = sub.add_parser("validate", help="validate a pyramid output dir")
    v.add_argument("--out", required=True)
    v.set_defaults(fn=cmd_validate)

    c = sub.add_parser(
        "consolidate",
        help="regroup scattered inputs by declared native resolution",
    )
    c.add_argument("paths", nargs="+", help="parquet tables / store dirs")
    c.set_defaults(fn=cmd_consolidate)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
