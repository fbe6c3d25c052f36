"""Structure reorganization pass (pipelines/consolidate.py): scattered
inputs regrouped by (category, declared native resolution), pyramids
contributing only their base level — the S2DataConsolidator analogue
(reference s2_optimization/s2_data_consolidator.py:10-217)."""

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from data_model_ray import fixtures, grid
from data_model_ray.pipelines.consolidate import consolidate_inputs
from data_model_ray.pipelines.pyramid import build_pyramid
from test_pyramid import make_level_table


def _cells_table(n, res, seed):
    rng = np.random.default_rng(seed)
    lat = rng.uniform(-60, 60, n)
    lon = rng.uniform(-150, 150, n)
    cells = np.unique(grid.geocell_encode(lat, lon, res))
    clat, clon = grid.geocell_center(cells)
    return make_level_table(
        cells, lat_min=clat, lat_max=clat, lon_min=clon, lon_max=clon
    )


@pytest.fixture()
def scattered(tmp_path):
    """A messy input directory: pages x2, cell tables at res 5 and 6,
    one full pyramid store, one junk table, one sidecar-declared table."""
    paths = {}
    # two raw pages shards (ungridded)
    for i in (0, 1):
        p = str(tmp_path / f"pages_{i}.parquet")
        pq.write_table(fixtures.pages_batch(np.arange(i * 500, i * 500 + 500)), p)
        paths[f"pages_{i}"] = p
    # loose cell tables at two declared resolutions
    for res in (5, 6):
        p = str(tmp_path / f"cells_r{res}.parquet")
        pq.write_table(_cells_table(400, res, seed=res), p)
        paths[f"cells_r{res}"] = p
    # a second res-5 shard in a subdir with an attrs.json sidecar that
    # declares the resolution explicitly
    sub = tmp_path / "declared"
    sub.mkdir()
    pq.write_table(_cells_table(150, 5, seed=9), str(sub / "data.parquet"))
    (sub / "attrs.json").write_text(json.dumps({"native_res": 5}))
    paths["declared_r5"] = str(sub)
    # a full pyramid store: only its BASE level must be consolidated
    pyr = str(tmp_path / "pyr")
    build_pyramid(_cells_table(600, 6, seed=3), pyr, base_res=6, min_cells=4)
    paths["pyramid"] = pyr
    # junk that matches no contract
    junk = str(tmp_path / "junk.parquet")
    pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}), junk)
    paths["junk"] = junk
    return paths


class TestConsolidation:
    def test_regroups_by_category_and_resolution(self, ray_session, scattered):
        plan = consolidate_inputs(list(scattered.values()))
        keys = set(plan.groups)
        assert ("pages", None) in keys
        assert ("cell_stats", 5) in keys and ("cell_stats", 6) in keys
        assert len(plan.groups[("pages", None)]) == 2
        # res 5: the loose table + the sidecar-declared subdir shard
        assert len(plan.groups[("cell_stats", 5)]) == 2
        # res 6: the loose table + the pyramid's base level
        assert len(plan.groups[("cell_stats", 6)]) == 2

    def test_pyramid_contributes_only_base_level(self, ray_session, scattered):
        plan = consolidate_inputs([scattered["pyramid"]])
        ((key, frags),) = plan.groups.items()
        assert key == ("cell_stats", 6)
        assert len(frags) == 1
        assert frags[0].path.endswith("part=level6")
        with open(os.path.join(scattered["pyramid"], "manifest.json")) as f:
            m = json.load(f)
        assert frags[0].rows == m["levels"][0]["cells"]

    def test_junk_reported_not_dropped(self, ray_session, scattered):
        plan = consolidate_inputs([scattered["junk"], "/nonexistent/nope"])
        assert not plan.groups
        reasons = dict(plan.unclassified)
        assert "no contract matches" in reasons[scattered["junk"]]
        assert reasons["/nonexistent/nope"] == "does not exist"

    def test_load_group_unions_fragments(self, ray_session, scattered):
        plan = consolidate_inputs(list(scattered.values()))
        frags = plan.groups[("cell_stats", 5)]
        ds = plan.load_group("cell_stats", 5, columns=["cell", "pages"])
        assert ds.count() == sum(f.rows for f in frags)
        assert set(ds.schema().names) == {"cell", "pages"}
        # every loaded cell really is at the declared native resolution
        cells = ds.to_pandas()["cell"].to_numpy(np.uint64)
        assert (grid.geocell_res(cells) == 5).all()
        with pytest.raises(KeyError):
            plan.load_group("cell_stats", 99)

    def test_summary_shape(self, ray_session, scattered):
        s = consolidate_inputs(list(scattered.values())).summary()
        assert s["groups"]["pages@native"]["fragments"] == 2
        assert s["groups"]["cell_stats@5"]["rows"] > 0
