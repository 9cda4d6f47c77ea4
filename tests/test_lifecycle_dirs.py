"""Partition-directory lifecycle (pipelines/lifecycle.py): retention
deletion and size-based rollover over the routed parquet layout."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from siem_on_amazon_opensearch_service_ray.pipelines.lifecycle import (
    apply_retention, list_partitions, rollover_partitions)


def _mk(out_dir: str, name: str, files: dict[str, int]) -> None:
    d = os.path.join(out_dir, f"index={name}")
    os.makedirs(d)
    for fn, rows in files.items():
        pq.write_table(pa.table({"x": list(range(rows))}),
                       os.path.join(d, fn))


@pytest.fixture
def layout(tmp_path):
    out = str(tmp_path / "routed")
    os.makedirs(out)
    for period in ("2024-01", "2024-02", "2024-03"):
        _mk(out, f"log-aws-cloudtrail-{period}", {"a.parquet": 10})
    _mk(out, "log-linux-syslog-2024-03", {"a.parquet": 5})
    _mk(out, "log-linux-syslog-2023-12", {"a.parquet": 5})
    _mk(out, "log-linux-syslog-2023-11", {"a.parquet": 5})
    return out


def test_list_partitions_groups_by_family(layout):
    parts = list_partitions(layout)
    assert sorted(parts) == ["log-aws-cloudtrail", "log-linux-syslog"]
    assert [p["period"] for p in parts["log-aws-cloudtrail"]] == \
        ["2024-01", "2024-02", "2024-03"]
    assert [p["period"] for p in parts["log-linux-syslog"]] == \
        ["2023-11", "2023-12", "2024-03"]
    assert all(p["bytes"] > 0 for p in parts["log-aws-cloudtrail"])


def test_retention_keeps_newest_periods(layout):
    rep = apply_retention(layout, keep_periods=2)
    assert rep["log-aws-cloudtrail"]["deleted"] == ["2024-01"]
    assert rep["log-aws-cloudtrail"]["kept"] == ["2024-02", "2024-03"]
    assert rep["log-linux-syslog"]["deleted"] == ["2023-11"]
    left = sorted(os.listdir(layout))
    assert "index=log-aws-cloudtrail-2024-01" not in left
    assert "index=log-aws-cloudtrail-2024-02" in left
    # per-family: syslog kept ITS newest 2 periods, not the global ones
    assert "index=log-linux-syslog-2024-03" in left
    assert "index=log-linux-syslog-2023-12" in left
    assert "index=log-linux-syslog-2023-11" not in left


def test_retention_dry_run_and_family_scope(layout):
    rep = apply_retention(layout, keep_periods=1, dry_run=True)
    assert rep["log-aws-cloudtrail"]["deleted"] == ["2024-01", "2024-02"]
    assert len(os.listdir(layout)) == 6          # nothing removed
    rep = apply_retention(layout, keep_periods=1,
                          family="log-linux-syslog")
    assert list(rep) == ["log-linux-syslog"]
    assert "index=log-aws-cloudtrail-2024-01" in os.listdir(layout)


def test_rollover_splits_oversized_partition(tmp_path):
    out = str(tmp_path / "routed")
    os.makedirs(out)
    _mk(out, "log-big-2024-03",
        {f"f{i}.parquet": 2000 for i in range(6)})
    parts = list_partitions(out)
    per_file = parts["log-big"][0]["bytes"] // 6
    rep = rollover_partitions(out, max_bytes=per_file * 2)
    assert rep["log-big"]                        # new roll dirs made
    parts = list_partitions(out)["log-big"]
    assert len(parts) == 3                       # 2 files per bin
    assert [p["roll"] for p in parts] == ["", "-r0002", "-r0003"]
    assert all(p["bytes"] <= per_file * 2 + 64 for p in parts)
    # all rows survive the renames
    import ray.data as rd
    assert rd.read_parquet(out).count() == 6 * 2000
    # idempotent: -rNNNN dirs are never re-split
    assert rollover_partitions(out, max_bytes=per_file * 2) == {}


def test_rollover_leaves_small_partitions(layout):
    assert rollover_partitions(layout, max_bytes=1 << 30) == {}
    assert len(os.listdir(layout)) == 6


def test_retention_validates(layout):
    with pytest.raises(ValueError):
        apply_retention(layout, keep_periods=0)
