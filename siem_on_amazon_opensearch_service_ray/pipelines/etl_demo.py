"""Config-driven end-to-end raw-log ETL: bytes -> routed summary.

The reference's flagship path (es_loader index.py:252-280,320-397) is:
S3 object bytes -> decompress -> per-logtype fileformat parse (ndjson /
csv / text-regex, aws.ini-driven) -> LogParser field pipeline
(rename -> timestamp -> static fields -> exclusions) -> index routing.
This module reproduces that flow Ray-Data-first over a DETERMINISTIC
raw-log fixture derived from the ``events`` parquet table, so a DuckDB
oracle can recompute the exact same answer from the source table — the
whole byte-level parse chain sits inside the correctness gate.

Fixture layout (event rows split by ``event_id % 3``):

* ``ct/trail-N.ndjson.gz``  — CloudTrail-shaped: gzip'd lines of
  ``{"Records": [...]}`` envelopes (5 events per envelope), exercising
  magic-byte decompress + json_delimiter fan-out (S2/S5/S12).
* ``alb/access-N.csv.gz``   — header CSV, read with the native
  ``ray.data.read_csv`` source (S6).
* ``sys/messages-N.log``    — one text line per event, parsed by a
  named-group regex (S4/M1), plus an undersized decoy file that the
  <20 B guard must skip (F6).

Every per-logtype spec (timestamp key/format, renames, statics,
regex-exclusions, index name/rotation) comes from an ini written next
to the fixture and loaded via config.load_etl_configs — nothing is
hard-coded in the pipeline body.
"""

from __future__ import annotations

import dataclasses
import gzip
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data as rd

from ..config import load_etl_configs
from ..sources.envelopes import DecompressLines
from ..sources.readers import explode_json_records
from ..stages.extract import RegexExtract
from .etl import run_etl

_EVENTS_PER_ENVELOPE = 5
_FILES_PER_FORMAT = 4

_INI = """\
[DEFAULT]
doc_id = event_id

[cloudtrail_like]
index_name = log-aws-cloudtrail
index_rotation = monthly
timestamp_key = eventTime
timestamp_format = iso8601
renames = eventName:event_type userId:user_id eventID:event_id errorCode:error_code
static.cloud_provider = aws
json_delimiter = Records
exclude.event_type = ^view$$

[alb_like]
index_name = log-aws-alb
index_rotation = weekly
timestamp_key = time
timestamp_format = iso8601

[syslog_like]
index_name = log-linux-syslog
index_rotation = daily
timestamp_key = ts_text
timestamp_format = %Y-%m-%dT%H:%M:%S.%f
static.event_module = linux
"""

_SYSLOG_RX = (r"(?P<ts_text>\S+) host\d+ app\[\d+\]: "
              r"type=(?P<event_type>\S+) user=(?P<user_id>\d+) "
              r"value=(?P<value>\S+)")


def _iso(ts) -> str:
    return pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%S.%f")


def write_raw_log_fixture(sf_dir: str) -> str:
    """Materialize the raw-log fixture for ``sf_dir`` under /tmp
    (cached via a marker file — same convention as the index caches).
    Returns the fixture directory; the ini lands at <dir>/etl.ini."""
    key = hashlib.sha256(sf_dir.encode()).hexdigest()[:12]
    out = f"/tmp/sosr_rawlogs_{key}"
    marker = os.path.join(out, ".done")
    if os.path.exists(marker):
        return out
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "ts", "user_id", "event_type",
                               "value"])
    df = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    for sub in ("ct", "alb", "sys"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    grp = df["event_id"] % 3
    fno = (df["event_id"] // 3) % _FILES_PER_FORMAT

    ct = df[grp == 0]
    for n in range(_FILES_PER_FORMAT):
        part = ct[fno[ct.index] == n]
        lines = []
        recs = []
        for r in part.itertuples(index=False):
            rec = {"eventID": int(r.event_id), "eventTime": _iso(r.ts),
                   "userId": int(r.user_id), "eventName": r.event_type,
                   "value": float(r.value)}
            if r.event_type == "error":
                rec["errorCode"] = "AccessDenied"
            recs.append(rec)
            if len(recs) == _EVENTS_PER_ENVELOPE:
                lines.append(json.dumps({"Records": recs}))
                recs = []
        if recs:
            lines.append(json.dumps({"Records": recs}))
        with gzip.open(os.path.join(out, "ct", f"trail-{n}.ndjson.gz"),
                       "wt") as f:
            f.write("\n".join(lines) + "\n")

    alb = df[grp == 1]
    for n in range(_FILES_PER_FORMAT):
        part = alb[fno[alb.index] == n]
        rows = ["time,user_id,event_type,value,event_id"]
        rows += [f"{_iso(r.ts)},{int(r.user_id)},{r.event_type},"
                 f"{float(r.value)!r},{int(r.event_id)}"
                 for r in part.itertuples(index=False)]
        with gzip.open(os.path.join(out, "alb", f"access-{n}.csv.gz"),
                       "wt") as f:
            f.write("\n".join(rows) + "\n")

    sysl = df[grp == 2]
    for n in range(_FILES_PER_FORMAT):
        part = sysl[fno[sysl.index] == n]
        rows = [f"{_iso(r.ts)} host{int(r.user_id) % 7:02d} "
                f"app[{int(r.event_id) % 97}]: type={r.event_type} "
                f"user={int(r.user_id)} value={float(r.value)!r} "
                f"id={int(r.event_id)}"
                for r in part.itertuples(index=False)]
        with open(os.path.join(out, "sys", f"messages-{n}.log"), "w") as f:
            f.write("\n".join(rows) + "\n")
    # undersized decoy: the <20 B size guard must drop it (F6)
    with open(os.path.join(out, "sys", "messages-tiny.log"), "w") as f:
        f.write("short\n")

    with open(os.path.join(out, "etl.ini"), "w") as f:
        f.write(_INI)
    with open(marker, "w") as f:
        f.write("ok")
    return out


def _project(batch: pa.Table, logtype: str) -> pa.Table:
    """Canonical post-ETL projection: every logtype lands on the same
    (logtype, index_name, user_id, value_e2) schema so one union + one
    groupby summarize the whole run.  value_e2 = round(value*100) per
    ROW (int64) so sums are order-independent at any parallelism."""
    uid = pc.cast(batch.column("user_id"), pa.int64())
    val = pc.cast(batch.column("value"), pa.float64())
    v_e2 = pc.cast(pc.round(pc.multiply(val, 100.0),
                            round_mode="half_towards_infinity"), pa.int64())
    return pa.table({
        "logtype": pa.array([logtype] * batch.num_rows, pa.string()),
        "index_name": batch.column("__index"),
        "user_id": uid,
        "value_e2": v_e2,
    })


def etl_raw_logs_summary(fixture_dir: str) -> pd.DataFrame:
    """The demo pipeline: raw bytes -> per-logtype parse -> config
    -driven field ETL -> routed union -> per-index summary.
    -> DataFrame(logtype, index_name, n, n_users, sum_value_e2)."""
    cfgs = load_etl_configs(os.path.join(fixture_dir, "etl.ini"))

    ct_cfg = cfgs["cloudtrail_like"]
    ct = rd.read_binary_files(os.path.join(fixture_dir, "ct"),
                              include_paths=True)
    ct = ct.map_batches(DecompressLines(), batch_format="pyarrow")
    delim = ct_cfg.json_delimiter        # envelope fan-out at the reader
    ct = ct.map_batches(
        lambda b, d=delim: explode_json_records(b, "line", delimiter_key=d),
        batch_format="pyarrow")
    ct = run_etl(ct, dataclasses.replace(ct_cfg, json_delimiter=None))
    ct = ct.map_batches(lambda b: _project(b, "cloudtrail_like"),
                        batch_format="pyarrow")

    alb_cfg = cfgs["alb_like"]
    import pyarrow.csv as pacsv
    alb = rd.read_csv(
        os.path.join(fixture_dir, "alb"),
        convert_options=pacsv.ConvertOptions(column_types={
            "time": pa.string(), "user_id": pa.int64(),
            "event_type": pa.string(), "value": pa.float64(),
            "event_id": pa.int64()}))
    alb = run_etl(alb, alb_cfg)
    alb = alb.map_batches(lambda b: _project(b, "alb_like"),
                          batch_format="pyarrow")

    sys_cfg = cfgs["syslog_like"]
    sys_ds = rd.read_binary_files(os.path.join(fixture_dir, "sys"),
                                  include_paths=True)
    sys_ds = sys_ds.map_batches(DecompressLines(), batch_format="pyarrow")
    sys_ds = sys_ds.map_batches(
        RegexExtract(_SYSLOG_RX, column="line", drop_errors=True),
        batch_format="pyarrow", concurrency=2)
    sys_ds = run_etl(sys_ds, sys_cfg)
    sys_ds = sys_ds.map_batches(lambda b: _project(b, "syslog_like"),
                                batch_format="pyarrow")

    unioned = ct.union(alb).union(sys_ds)

    def summarize(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "logtype": [g["logtype"].iloc[0]],
            "index_name": [g["index_name"].iloc[0]],
            "n": np.array([len(g)], dtype=np.int64),
            "n_users": np.array([g["user_id"].nunique()], dtype=np.int64),
            "sum_value_e2": np.array([int(g["value_e2"].sum())],
                                     dtype=np.int64),
        })

    out = (unioned.groupby(["logtype", "index_name"])
           .map_groups(summarize, batch_format="pandas")
           .to_pandas())
    return out.sort_values(["logtype", "index_name"]).reset_index(drop=True)
