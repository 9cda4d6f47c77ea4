"""Windowed aggregates + sessionization."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from siem_on_amazon_opensearch_service_ray.stages import windows


def _events():
    base = np.datetime64("2024-01-01T00:00:00", "us")
    ts = base + np.array([0, 30, 90, 3600, 3660, 7300], dtype="timedelta64[s]")
    return pa.table({
        "ts": pa.array(ts, pa.timestamp("us")),
        "user": pa.array(["a", "a", "b", "a", "b", "a"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })


def test_tumbling(ray_session):
    ds = rd.from_arrow(_events())
    out = windows.tumbling_aggregate(ds, "ts", 3600, ["user"], "v").to_pandas()
    a0 = out[(out["user"] == "a") & (out["window_start"] == 1704067200)]
    assert a0["n"].iloc[0] == 2 and a0["sum_value"].iloc[0] == 3.0
    a1 = out[(out["user"] == "a") & (out["window_start"] == 1704067200 + 3600)]
    assert a1["n"].iloc[0] == 1


def test_sliding_covers_k_windows(ray_session):
    b = windows.explode_sliding_windows(_events(), "ts", 3600, 1800)
    # every row appears in exactly size/step windows
    assert b.num_rows == _events().num_rows * 2
    w = pd.Series(b.column("window_start").to_pylist())
    assert ((1704067200 - w[:2]) % 1800 == 0).all()


def test_sessionize_and_stats(ray_session):
    ds = rd.from_arrow(_events())
    sess = windows.sessionize(ds, "user", "ts", gap_sec=600).to_pandas()
    a = sess[sess["user"] == "a"].sort_values("ts")
    # a: events at 0s,30s (session 0), 3600s (session 1), 7300s (session 2)
    assert a["session_id"].tolist() == [0, 0, 1, 2]
    stats = windows.session_stats(ds, "user", "ts", 600).to_pandas()
    s0 = stats[(stats["user"] == "a") & (stats["session_id"] == 0)]
    assert s0["n_events"].iloc[0] == 2
    assert s0["duration_sec"].iloc[0] == pytest.approx(30.0)
