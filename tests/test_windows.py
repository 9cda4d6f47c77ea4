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


def test_sessionize_bounded_equals_plain(ray_session):
    """Two-phase skew-bounded sessionize produces the exact session
    assignment of the plain per-key version, including sessions that
    span bucket boundaries and keys with empty buckets between."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    from siem_on_amazon_opensearch_service_ray.stages.windows import (
        sessionize, sessionize_bounded)
    rng = np.random.RandomState(11)
    rows = []
    base = 1_700_000_000_000_000
    for user in ["a", "b", "skewed"]:
        n = 2000 if user == "skewed" else 60
        t = base
        for _ in range(n):
            # mix of small gaps (same session), gaps straddling the
            # 1h bucket cut, and multi-bucket silences
            t += int(rng.choice([30e6, 200e6, 2000e6, 9000e6]))
            rows.append((user, t))
    tbl = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.string()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
    })
    ds = rd.from_arrow(tbl)
    plain = sessionize(ds, "user_id", "ts", gap_sec=1800).to_pandas()
    bounded = sessionize_bounded(ds, "user_id", "ts", gap_sec=1800,
                                 bucket_hours=1).to_pandas()
    key = ["user_id", "ts"]
    p = plain.sort_values(key).reset_index(drop=True)
    b = bounded.sort_values(key).reset_index(drop=True)
    assert p["session_id"].tolist() == b["session_id"].tolist()


def test_calendar_window_tz_boundaries():
    import pyarrow as pa
    from siem_on_amazon_opensearch_service_ray.stages.windows import \
        add_calendar_window

    # 2024-01-01 00:00 UTC at -09:00 is still 2023-12; at +05:30 it is
    # 2024-01.  2024-02-29 proves leap-month lengths (calendar, not
    # fixed-width).
    ts = pa.array([1704067200_000000,        # 2024-01-01 00:00:00 UTC
                   1709164800_000000],       # 2024-02-29 00:00:00 UTC
                  pa.timestamp("us"))
    b = pa.table({"ts": ts})
    out = add_calendar_window(b, "ts", "month", -9.0)
    # local bucket starts: 2023-12-01, 2024-02-01 (wall-clock epoch)
    assert out.column("bucket_epoch").to_pylist() == [1701388800,
                                                      1706745600]
    out = add_calendar_window(b, "ts", "month", 5.5)
    assert out.column("bucket_epoch").to_pylist() == [1704067200,
                                                      1706745600]
    out = add_calendar_window(b, "ts", "week", 0.0)
    # 2024-01-01 is a Monday -> its own week start
    assert out.column("bucket_epoch").to_pylist()[0] == 1704067200
    import pytest
    with pytest.raises(ValueError, match="calendar interval"):
        add_calendar_window(b, "ts", "fortnight")
