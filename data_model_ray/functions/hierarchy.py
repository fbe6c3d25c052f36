"""Generic hierarchy model: arbitrary parquet-store group/array trees.

The reference models arbitrary zarr hierarchies as typed GroupSpec /
ArraySpec trees with ``from_zarr`` / ``to_zarr`` round-trip and readable
reprs (/root/reference/src/eopf_geozarr/pyz/common.py:61-467, v2.py /
v3.py) — the surface a user reaches for when handed a FOREIGN store that
none of the closed per-product models recognize. This is the parquet
analogue: a directory tree where

- every directory is a GROUP (optional ``attrs.json`` sidecar),
- every ``*.parquet`` file is an ARRAY (schema + row count from the
  footer; footer key/value metadata surfaces as array attrs),

modeled as plain dataclasses with ``from_dir`` / ``to_dir`` round-trip:
``from_dir(to_dir(from_dir(p)))`` equals ``from_dir(p)`` for ANY such
tree (property-tested in tests/test_hierarchy.py, including the repo's
own store outputs as the "foreign" inputs). The closed per-store
validators (functions/store.py) stay the contract surface; this model is
the open fallback for stores nobody registered.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any

ATTRS_NAME = "attrs.json"


@dataclass
class ArraySpec:
    """One parquet array: schema, row count, footer attrs, source path."""

    columns: dict[str, str]  # name -> arrow type string
    num_rows: int
    attrs: dict[str, str] = field(default_factory=dict)
    source: str | None = None  # where the data lives (not part of equality)

    def equal(self, other: "ArraySpec") -> bool:
        return (
            self.columns == other.columns
            and self.num_rows == other.num_rows
            and self.attrs == other.attrs
        )


@dataclass
class SidecarSpec:
    """Any other file in a group (manifests, lineage logs, ...): carried
    opaquely so foreign stores round-trip byte-exact."""

    size: int
    sha256: str
    source: str | None = None

    def equal(self, other: "SidecarSpec") -> bool:
        return self.size == other.size and self.sha256 == other.sha256


@dataclass
class GroupSpec:
    """One directory group: attrs + named arrays + child groups + opaque
    sidecar files."""

    attrs: dict[str, Any] = field(default_factory=dict)
    arrays: dict[str, ArraySpec] = field(default_factory=dict)
    groups: dict[str, "GroupSpec"] = field(default_factory=dict)
    sidecars: dict[str, SidecarSpec] = field(default_factory=dict)

    # --- reading --------------------------------------------------------

    @classmethod
    def from_dir(cls, path: str) -> "GroupSpec":
        """Model an arbitrary parquet-store directory tree."""
        import pyarrow.parquet as pq

        node = cls()
        ap = os.path.join(path, ATTRS_NAME)
        if os.path.exists(ap):
            with open(ap) as f:
                node.attrs = json.load(f)
        for entry in sorted(os.listdir(path)):
            p = os.path.join(path, entry)
            if os.path.isdir(p):
                node.groups[entry] = cls.from_dir(p)
            elif entry.endswith(".parquet"):
                schema = pq.read_schema(p)
                meta = {
                    k.decode(): v.decode()
                    for k, v in (schema.metadata or {}).items()
                    if not k.startswith(b"pandas")
                }
                node.arrays[entry[: -len(".parquet")]] = ArraySpec(
                    columns={f.name: str(f.type) for f in schema},
                    num_rows=pq.read_metadata(p).num_rows,
                    attrs=meta,
                    source=p,
                )
            elif entry != ATTRS_NAME:
                import hashlib

                # chunked hash — a foreign store can carry multi-GB
                # sidecars (logs, archives); never load them whole
                h = hashlib.sha256()
                with open(p, "rb") as f:
                    while chunk := f.read(1 << 20):
                        h.update(chunk)
                node.sidecars[entry] = SidecarSpec(
                    size=os.path.getsize(p),
                    sha256=h.hexdigest(),
                    source=p,
                )
        return node

    # --- writing --------------------------------------------------------

    def to_dir(self, path: str) -> None:
        """Materialize the tree (groups -> dirs, attrs -> sidecars, arrays
        copied from their source files) — the ``to_zarr`` analogue. Arrays
        without a source write a zero-row table of the modeled schema."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(path, exist_ok=True)
        if self.attrs:
            with open(os.path.join(path, ATTRS_NAME), "w") as f:
                json.dump(self.attrs, f, indent=1, sort_keys=True)
        for name, arr in self.arrays.items():
            dst = os.path.join(path, f"{name}.parquet")
            if arr.source and os.path.exists(arr.source):
                t = pq.read_table(arr.source)
            else:
                t = pa.table(
                    {c: pa.array([], _parse_type(ty)) for c, ty in arr.columns.items()}
                )
            if arr.attrs:
                t = t.cast(
                    t.schema.with_metadata(
                        {
                            **{
                                k: v
                                for k, v in (t.schema.metadata or {}).items()
                                if not k.startswith(b"pandas")
                            },
                            **{k.encode(): v.encode() for k, v in arr.attrs.items()},
                        }
                    )
                )
            pq.write_table(t, dst)
        for name, sc in self.sidecars.items():
            if sc.source and os.path.exists(sc.source):
                import shutil

                shutil.copyfile(sc.source, os.path.join(path, name))
        for name, child in self.groups.items():
            child.to_dir(os.path.join(path, name))

    # --- structure ------------------------------------------------------

    def equal(self, other: "GroupSpec") -> bool:
        """Structural equality (attrs, schemas, row counts; not paths)."""
        if self.attrs != other.attrs:
            return False
        if (
            set(self.arrays) != set(other.arrays)
            or set(self.groups) != set(other.groups)
            or set(self.sidecars) != set(other.sidecars)
        ):
            return False
        return (
            all(self.arrays[k].equal(other.arrays[k]) for k in self.arrays)
            and all(self.sidecars[k].equal(other.sidecars[k]) for k in self.sidecars)
            and all(self.groups[k].equal(other.groups[k]) for k in self.groups)
        )

    def flat_items(self, prefix: str = "") -> dict[str, ArraySpec | "GroupSpec"]:
        """path -> spec mapping over the whole tree (groups and arrays)."""
        out: dict[str, Any] = {}
        for name, arr in self.arrays.items():
            out[f"{prefix}/{name}"] = arr
        for name, child in self.groups.items():
            out[f"{prefix}/{name}"] = child
            out.update(child.flat_items(f"{prefix}/{name}"))
        return out

    def __repr__(self) -> str:  # format_text_repr analogue
        def trunc(names: list[str], cap: int = 5) -> str:
            names = sorted(names)
            extra = f", +{len(names) - cap}" if len(names) > cap else ""
            return ", ".join(names[:cap]) + extra

        return (
            f"GroupSpec(arrays=[{trunc(list(self.arrays))}], "
            f"groups=[{trunc(list(self.groups))}], "
            f"attrs={len(self.attrs)})"
        )


def _parse_type(ty: str):
    """Arrow type from its str() form — covers the scalar types parquet
    stores round-trip here; unknown types degrade to string."""
    import pyarrow as pa

    simple = {
        "int8": pa.int8(), "int16": pa.int16(), "int32": pa.int32(),
        "int64": pa.int64(), "uint8": pa.uint8(), "uint16": pa.uint16(),
        "uint32": pa.uint32(), "uint64": pa.uint64(), "float": pa.float32(),
        "double": pa.float64(), "string": pa.string(), "binary": pa.binary(),
        "bool": pa.bool_(), "large_string": pa.large_string(),
        "date32[day]": pa.date32(),
    }
    if ty in simple:
        return simple[ty]
    if ty.startswith("timestamp[") and ty.endswith("]"):
        return pa.timestamp(ty[len("timestamp[") : -1])
    return pa.string()
