"""Gap-based sessionization: planted-session structure + oracle parity
live in test_oracles/test_all_oracles_hash; here the session semantics are
pinned on a hand-built fixture with known gaps."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

from data_model_ray.pipelines.analytic import sessionize_events


@pytest.fixture(scope="module")
def tiny_events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sess")
    base = np.datetime64("2024-01-01T00:00:00", "us")
    m = np.timedelta64(60_000_000, "us")  # one minute
    rows = [
        # user 1: three events 10 min apart (one session), then a 45-min
        # gap opens session 2 with two events
        (1, 1, base + 0 * m, 1.0),
        (2, 1, base + 10 * m, 2.0),
        (3, 1, base + 20 * m, 3.0),
        (4, 1, base + 65 * m, 4.0),
        (5, 1, base + 70 * m, 5.0),
        # user 2: a single event; then exactly-30-min gap (NOT a break:
        # strict >), then >30 min opens session 2
        (6, 2, base + 0 * m, 10.0),
        (7, 2, base + 30 * m, 20.0),
        (8, 2, base + 61 * m, 30.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts", "value"])
    df.to_parquet(os.path.join(d, "events.parquet"), index=False)
    return str(d)


def test_planted_sessions(ray_session, tiny_events_dir):
    out = (
        sessionize_events(tiny_events_dir)
        .to_pandas()
        .sort_values(["user_id", "session_idx"])
        .reset_index(drop=True)
    )
    got = out[["user_id", "session_idx", "n_events", "total_value"]].to_records(
        index=False
    ).tolist()
    assert got == [
        (1, 1, 3, 6.0),
        (1, 2, 2, 9.0),
        (2, 1, 2, 30.0),  # the exactly-30-min gap does not break
        (2, 2, 1, 30.0),
    ]
    u1s1 = out[(out.user_id == 1) & (out.session_idx == 1)].iloc[0]
    assert u1s1["first_ts"] == pd.Timestamp("2024-01-01 00:00:00")
    assert u1s1["last_ts"] == pd.Timestamp("2024-01-01 00:20:00")
