"""Generic hierarchy model tests: from_dir/to_dir round-trip of arbitrary
(foreign) parquet-store trees, incl. the repo's own store outputs."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from data_model_ray.functions.hierarchy import ArraySpec, GroupSpec


def _write_foreign(root):
    """A messy 'foreign' store nobody registered: nested groups, attrs
    sidecars, arrays with footer metadata, mixed dtypes."""
    (root / "measurements" / "r10m").mkdir(parents=True)
    (root / "quality").mkdir()
    json.dump({"title": "foreign", "version": 2}, open(root / "attrs.json", "w"))
    json.dump({"gsd": 10.0}, open(root / "measurements" / "attrs.json", "w"))
    t1 = pa.table(
        {
            "x": pa.array(np.arange(7), pa.int64()),
            "v": pa.array(np.linspace(0, 1, 7), pa.float64()),
        }
    )
    t1 = t1.cast(t1.schema.with_metadata({b"units": b"m"}))
    pq.write_table(t1, root / "measurements" / "r10m" / "band1.parquet")
    t2 = pa.table({"flag": pa.array(["a", "b"], pa.string())})
    pq.write_table(t2, root / "quality" / "mask.parquet")
    pq.write_table(
        pa.table({"ts": pa.array([1, 2, 3], pa.timestamp("us"))}),
        root / "index.parquet",
    )


class TestRoundTrip:
    def test_foreign_store_round_trip(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write_foreign(src)
        m1 = GroupSpec.from_dir(str(src))
        m1.to_dir(str(tmp_path / "dst"))
        m2 = GroupSpec.from_dir(str(tmp_path / "dst"))
        assert m1.equal(m2)
        # data (not just structure) survives the copy
        a = pq.read_table(src / "measurements" / "r10m" / "band1.parquet")
        b = pq.read_table(tmp_path / "dst" / "measurements" / "r10m" / "band1.parquet")
        assert a.equals(b)

    def test_model_shape(self, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        _write_foreign(src)
        m = GroupSpec.from_dir(str(src))
        assert m.attrs == {"title": "foreign", "version": 2}
        assert set(m.groups) == {"measurements", "quality"}
        assert set(m.arrays) == {"index"}
        band = m.groups["measurements"].groups["r10m"].arrays["band1"]
        assert band.columns == {"x": "int64", "v": "double"}
        assert band.num_rows == 7 and band.attrs == {"units": "m"}
        flat = m.flat_items()
        assert "/measurements/r10m/band1" in flat and "/quality" in flat
        assert "band1" in repr(m.groups["measurements"].groups["r10m"])

    def test_own_store_outputs_are_modelable(self, tmp_path, ray_session):
        """The repo's own invindex store is just another foreign tree to
        the generic model — and it round-trips including the footer
        fingerprints the closed validator depends on."""
        from data_model_ray.functions.store import validate_store
        from data_model_ray.pipelines.invindex import build_inverted_index

        out = tmp_path / "inv"
        build_inverted_index("/root/testdata/sf0.001", str(out), num_buckets=4)
        m = GroupSpec.from_dir(str(out))
        assert any(g.startswith("part=") for g in m.groups)
        dst = tmp_path / "copy"
        m.to_dir(str(dst))
        assert GroupSpec.from_dir(str(dst)).equal(m)
        # the round-tripped copy still passes the CLOSED store contract
        kind, problems = validate_store(str(dst))
        assert kind == "inverted-index" and problems == []

    def test_sourceless_array_writes_empty_schema(self, tmp_path):
        spec = GroupSpec(
            arrays={
                "a": ArraySpec(
                    columns={"k": "int64", "s": "string"}, num_rows=0, attrs={}
                )
            }
        )
        spec.to_dir(str(tmp_path / "out"))
        t = pq.read_table(tmp_path / "out" / "a.parquet")
        assert t.num_rows == 0 and set(t.column_names) == {"k", "s"}


names = st.text(
    alphabet="abcdefgh123", min_size=1, max_size=6
).filter(lambda s: s not in (".", ".."))


@st.composite
def trees(draw, depth=0):
    node = {"attrs": draw(st.dictionaries(names, st.integers(0, 9), max_size=2))}
    node["arrays"] = draw(st.lists(names, max_size=2, unique=True))
    node["groups"] = (
        {}
        if depth >= 2
        else {
            n: draw(trees(depth=depth + 1))
            for n in draw(st.lists(names, max_size=2, unique=True))
        }
    )
    return node


def _materialize(node, path):
    path.mkdir(exist_ok=True)
    if node["attrs"]:
        json.dump(node["attrs"], open(path / "attrs.json", "w"))
    for i, a in enumerate(node["arrays"]):
        pq.write_table(
            pa.table({"v": pa.array(np.arange(i + 1), pa.int64())}),
            path / f"{a}.parquet",
        )
    for gname, child in node["groups"].items():
        _materialize(child, path / gname)


class TestProperty:
    @settings(max_examples=20, deadline=None)
    @given(tree=trees())
    def test_random_trees_round_trip(self, tree, tmp_path_factory):
        root = tmp_path_factory.mktemp("ht")
        src, dst = root / "s", root / "d"
        src.mkdir()
        _materialize(tree, src)
        m1 = GroupSpec.from_dir(str(src))
        m1.to_dir(str(dst))
        assert GroupSpec.from_dir(str(dst)).equal(m1)
