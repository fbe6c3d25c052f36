"""Pages table source: schema-validated reads + deterministic synthesis.

S1/S2-group entry points (SURVEY.md 2.1): column-pruned parquet reads with
the input_hint schema contract enforced on the first batch, plus the
deterministic synthetic generator for test/bench scales.
"""

from __future__ import annotations

import pyarrow as pa

from ..fixtures import PAGES_SCHEMA, pages_dataset, rows_for_sf, write_pages_parquet

__all__ = ["read_pages", "pages_dataset", "rows_for_sf", "write_pages_parquet"]


def read_pages(
    path: str,
    *,
    columns: list[str] | None = None,
    validate: bool = True,
):
    """``ray.data.read_parquet`` with pages-schema validation.

    ``columns`` prunes at the read (only needed columns leave storage —
    a read that loads all columns for a 2-column transform is wrong);
    validation checks the requested subset against the input_hint schema.
    """
    import ray.data as rd

    ds = rd.read_parquet(path, columns=columns)
    if validate:
        want_fields = [
            PAGES_SCHEMA.field(name)
            for name in (columns or PAGES_SCHEMA.names)
            if PAGES_SCHEMA.get_field_index(name) >= 0
        ]
        want = pa.schema(want_fields)

        def check(batch: pa.Table) -> pa.Table:
            for field in want:
                idx = batch.schema.get_field_index(field.name)
                if idx < 0 or not batch.schema.field(idx).type.equals(field.type):
                    raise ValueError(
                        f"pages schema violation: column {field.name!r} "
                        f"missing or mistyped (want {field.type})"
                    )
            return batch

        ds = ds.map_batches(check, batch_format="pyarrow", zero_copy_batch=True)
    return ds
