"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@pytest.fixture(scope="session")
def ray_session():
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def pages_small(ray_session, tmp_path_factory):
    """10k-row deterministic pages table on disk (t1 smoke scale)."""
    from data_model_ray import fixtures

    out = str(tmp_path_factory.mktemp("pages") / "sf_small")
    fixtures.write_pages_parquet(out, 10_000, parallelism=8)
    return out


@pytest.fixture(scope="session")
def pages_ids():
    return np.arange(10_000, dtype=np.int64)
