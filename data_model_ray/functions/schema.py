"""Schema contracts — the engine's pydantic-model analogue (SURVEY.md 1.1).

The reference enforces fixed, validated layouts with closed TypedDict
pydantic models (/root/reference/src/eopf_geozarr/data_api/s2.py:461-698)
and classifies inputs by union validation
(/root/reference/src/eopf_geozarr/s2_optimization/s2_converter.py:408-418).
Here the contract is a ``pyarrow.Schema`` plus invariant validators, and
classification is first-match over a registry — applied per batch inside
``map_batches`` so violations fail fast and name the offending columns.
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

from ..fixtures import PAGES_SCHEMA


class SchemaViolation(ValueError):
    pass


class SchemaContract:
    """Expected schema + row-level invariants.

    mode="exact": same fields, same order, same types.
    mode="subset": every contract field present with the right type
    (extra columns allowed) — the ``extra="allow"`` analogue.
    """

    def __init__(
        self,
        name: str,
        schema: pa.Schema,
        *,
        mode: str = "subset",
        invariants: list[Callable[[pa.Table], str | None]] | None = None,
    ):
        if mode not in ("exact", "subset"):
            raise ValueError(mode)
        self.name = name
        self.schema = schema
        self.mode = mode
        self.invariants = invariants or []

    def check(self, table: pa.Table) -> list[str]:
        problems: list[str] = []
        if self.mode == "exact":
            if not table.schema.equals(self.schema, check_metadata=False):
                problems.append(
                    f"schema mismatch: got {table.schema.names}, "
                    f"want {self.schema.names}"
                )
        else:
            for field in self.schema:
                idx = table.schema.get_field_index(field.name)
                if idx < 0:
                    problems.append(f"missing column {field.name!r}")
                elif not table.schema.field(idx).type.equals(field.type):
                    problems.append(
                        f"column {field.name!r}: type "
                        f"{table.schema.field(idx).type} != {field.type}"
                    )
        if not problems:
            for inv in self.invariants:
                msg = inv(table)
                if msg:
                    problems.append(msg)
        return problems

    def validate(self, table: pa.Table) -> pa.Table:
        problems = self.check(table)
        if problems:
            raise SchemaViolation(f"[{self.name}] " + "; ".join(problems))
        return table

    def matches(self, table: pa.Table) -> bool:
        return not self.check(table)


def classify(table: pa.Table, contracts: list[SchemaContract]) -> str | None:
    """First matching contract name — the input-product classifier
    (``is_sentinel2_dataset`` analogue)."""
    for c in contracts:
        if c.matches(table):
            return c.name
    return None


def make_validator_stage(contract: SchemaContract):
    """map_batches kernel that validates every batch and passes it through."""

    def kernel(batch: pa.Table) -> pa.Table:
        return contract.validate(batch)

    return kernel


# --- standard contracts -----------------------------------------------------


def _bbox_ordered(table: pa.Table) -> str | None:
    """spatial:bbox ordering invariant (store.py:49-62 analogue)."""
    import pyarrow.compute as pc

    for lo, hi in (("lat_min", "lat_max"), ("lon_min", "lon_max")):
        if lo in table.column_names and hi in table.column_names:
            bad = pc.sum(
                pc.cast(pc.greater(table[lo], table[hi]), pa.int64())
            ).as_py()
            if bad:
                return f"{bad} rows with {lo} > {hi}"
    return None


def _lat_lon_in_range(table: pa.Table) -> str | None:
    import pyarrow.compute as pc

    if "lat" in table.column_names:
        bad = pc.sum(
            pc.cast(
                pc.or_(
                    pc.less(table["lat"], pa.scalar(-90.0)),
                    pc.greater(table["lat"], pa.scalar(90.0)),
                ),
                pa.int64(),
            )
        ).as_py()
        if bad:
            return f"{bad} rows with lat outside [-90, 90]"
    return None


def vocabulary_invariant(
    column: str, vocab, *, allow_null: bool = False
) -> Callable[[pa.Table], str | None]:
    """Controlled-vocabulary membership check (T2) — the CF standard-name
    validator analogue (/root/reference/src/eopf_geozarr/data_api/geozarr/
    common.py:107-167): every value of `column` must be a member of `vocab`.
    Vectorized ``pc.is_in`` against a prebuilt value set; reports up to three
    offending values by name so violations are actionable."""
    import pyarrow.compute as pc

    value_set = pa.array(sorted(set(map(str, vocab))), pa.string())

    def inv(table: pa.Table) -> str | None:
        if column not in table.column_names:
            return None
        col = table[column]
        ok = pc.is_in(col, value_set=value_set)
        if allow_null:
            ok = pc.or_kleene(ok, pc.is_null(col))
        else:
            ok = pc.fill_null(ok, False)
        bad = pc.sum(pc.cast(pc.invert(ok), pa.int64())).as_py() or 0
        if not bad:
            return None
        offenders = pc.unique(pc.filter(col, pc.invert(ok))).to_pylist()[:3]
        return (
            f"{bad} rows with {column!r} outside vocabulary "
            f"(e.g. {offenders})"
        )

    return inv


def foreign_key_invariant(
    column: str, referent_values, *, referent_name: str = "referent", allow_null: bool = True
) -> Callable[[pa.Table], str | None]:
    """Cross-table referential integrity — the `check_grid_mapping` analogue
    (/root/reference/src/eopf_geozarr/data_api/geozarr/common.py:251-264):
    every non-null value of `column` must name a row of the (small,
    broadcast) referent key set; a dangling reference fails the batch.
    Nulls mean 'unassigned' and pass by default."""
    import pyarrow.compute as pc

    value_set = pa.array(sorted(set(referent_values)))

    def inv(table: pa.Table) -> str | None:
        if column not in table.column_names:
            return None
        col = table[column]
        ok = pc.is_in(col, value_set=value_set)
        if allow_null:
            ok = pc.or_kleene(ok, pc.is_null(col))
        else:
            ok = pc.fill_null(ok, False)
        bad = pc.sum(pc.cast(pc.invert(ok), pa.int64())).as_py() or 0
        if not bad:
            return None
        offenders = pc.unique(pc.filter(col, pc.invert(ok))).to_pylist()[:3]
        return (
            f"{bad} rows whose {column!r} references no {referent_name} "
            f"(e.g. {offenders})"
        )

    return inv


def dependency_invariant(
    derive: Callable[[pa.Table], "pa.Array | pa.ChunkedArray"],
    column: str,
    *,
    description: str,
) -> Callable[[pa.Table], str | None]:
    """Cross-column functional-dependency check — the dims<->coords
    consistency analogue (common.py:179-219: a referenced dimension must
    exist AND agree in shape). Here: `column` must equal the value derived
    from its sibling columns; rows where the derived value is null are
    exempt (no assignment to be consistent with)."""
    import pyarrow.compute as pc

    def inv(table: pa.Table) -> str | None:
        if column not in table.column_names:
            return None
        want = derive(table)
        ok = pc.or_kleene(pc.equal(table[column], want), pc.is_null(want))
        ok = pc.fill_null(ok, False)
        bad = pc.sum(pc.cast(pc.invert(ok), pa.int64())).as_py() or 0
        if bad:
            return f"{bad} rows violate {description}"
        return None

    return inv


def mgrs_zone_dependency() -> Callable[[pa.Table], str | None]:
    """utm_zone must equal the zone encoded in the mgrs granule code."""
    def derive(table: pa.Table):
        import pyarrow.compute as pc

        from ..stages.reproject import parse_zone

        zones = parse_zone(table["mgrs"])
        arr = pa.array(zones)
        # unassigned granule (zone -1) -> null -> exempt
        return pc.if_else(pc.equal(arr, -1), pa.scalar(None, pa.int64()), arr)

    return dependency_invariant(
        derive, "utm_zone", description="utm_zone == zone(mgrs)"
    )


def cell_level_dependency(cell_col: str = "cell", level_col: str = "level"):
    """level must equal the resolution packed in the cell id's high bits."""
    def derive(table: pa.Table):
        import numpy as np

        from ..grid import geocell_res

        cells = table[cell_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return pa.array(geocell_res(cells).astype(np.int32))

    return dependency_invariant(
        derive, level_col, description=f"{level_col} == res({cell_col})"
    )


# the fixture corpus' language vocabulary (fixtures.py LANGS) + the
# classifier's unknown marker
LANG_VOCAB = ("en", "de", "fr", "es", "zh", "ru", "ja", "und")

PAGES_CONTRACT = SchemaContract(
    "pages",
    PAGES_SCHEMA,
    mode="exact",
    invariants=[vocabulary_invariant("lang", LANG_VOCAB)],
)

def _granule_codes() -> list[str]:
    from ..fixtures import mgrs_granules

    # "" is the engine's unassigned sentinel (functions/pip.py:61)
    return mgrs_granules()["mgrs"].to_pylist() + [""]


ENRICHED_CONTRACT = SchemaContract(
    "enriched_pages",
    pa.schema(
        [
            ("url", pa.string()),
            ("lat", pa.float64()),
            ("lon", pa.float64()),
            ("h3_7", pa.uint64()),
            ("s2_12", pa.uint64()),
            ("mgrs", pa.string()),
        ]
    ),
    mode="subset",
    invariants=[
        _lat_lon_in_range,
        # referential: an assigned granule code must exist in the granule
        # registry; a reprojected row's utm_zone must agree with its mgrs
        foreign_key_invariant("mgrs", _granule_codes(), referent_name="granule"),
        mgrs_zone_dependency(),
    ],
)

CELL_STATS_CONTRACT = SchemaContract(
    "cell_stats",
    pa.schema(
        [
            ("cell", pa.uint64()),
            ("pages", pa.int64()),
            ("lat_min", pa.float64()),
            ("lat_max", pa.float64()),
            ("lon_min", pa.float64()),
            ("lon_max", pa.float64()),
        ]
    ),
    mode="subset",
    invariants=[_bbox_ordered],
)
