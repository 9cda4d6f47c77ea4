"""Timestamp parsing (SURVEY.md M4).

Reproduces the reference's timestamp semantics
(reference: siem/utils.py:308-443 + siem/__init__.py:1044-1103):

- ``epoch``: numeric values disambiguated by magnitude into seconds /
  milliseconds / microseconds (reference: utils.py:349-366 picks the
  unit from the digit count);
- ``syslog``: ``Mon dd HH:MM:SS`` with no year — the year is inferred
  against a reference date so the result is never in the future (with
  the Feb-29 fallback to the latest leap year, utils.py:381-413);
- ``iso8601``: ISO parse incl. offset, nanoseconds truncated to
  microseconds (utils.py:416-428);
- ``strptime``: explicit format or list of formats, first match wins
  (utils.py:431-443);
- naive results get the configured timezone offset applied, then
  everything is normalized to UTC (reference ``timestamp_tz``,
  siem/__init__.py:1066-1083).

Determinism: the syslog reference date is an explicit argument — never
wall-clock — so pipeline runs are reproducible.
"""

from __future__ import annotations

import datetime as dt
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_SYSLOG_RE = re.compile(
    r"^(?P<mon>Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)\s+"
    r"(?P<day>\d{1,2})\s+(?P<h>\d{2}):(?P<m>\d{2}):(?P<s>\d{2})")
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}


def parse_epoch(values: np.ndarray) -> np.ndarray:
    """Numeric epoch -> datetime64[us] UTC; unit by magnitude.

    <= 1e10  seconds (through year 2286)
    <= 1e13  milliseconds
    <= 1e16  microseconds
    else     nanoseconds
    """
    v = np.asarray(values, dtype=np.float64)
    out = np.empty(v.size, dtype="datetime64[us]")
    nat = np.isnan(v)
    av = np.abs(v)
    us = np.where(av <= 1e10, v * 1e6,
                  np.where(av <= 1e13, v * 1e3,
                           np.where(av <= 1e16, v, v / 1e3)))
    out = us.astype("int64").astype("datetime64[us]")
    out[nat] = np.datetime64("NaT")
    return out


def _syslog_year(mon: int, day: int, ref: dt.datetime) -> int:
    year = ref.year
    if mon == 2 and day == 29:
        # latest leap year not after ref (reference leap-day fallback)
        y = year
        while not (y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)):
            y -= 1
        return y
    # never in the future relative to ref (+ small slack like the
    # reference's "tomorrow" guard)
    cand = dt.datetime(year, mon, day)
    if cand > ref + dt.timedelta(days=2):
        return year - 1
    return year


def parse_syslog(values: list[str], ref: dt.datetime) -> np.ndarray:
    out = np.empty(len(values), dtype="datetime64[us]")
    for i, s in enumerate(values):
        m = _SYSLOG_RE.match(s or "")
        if not m:
            out[i] = np.datetime64("NaT")
            continue
        mon = _MONTHS[m.group("mon")]
        day = int(m.group("day"))
        year = _syslog_year(mon, day, ref)
        out[i] = np.datetime64(dt.datetime(
            year, mon, day, int(m.group("h")), int(m.group("m")),
            int(m.group("s"))), "us")
    return out


def parse_iso8601(values: list[str]) -> np.ndarray:
    # pandas handles offsets + nanosecond truncation; utc=True
    # normalizes mixed offsets, then we drop tz (UTC-naive convention)
    s = pd.to_datetime(pd.Series(values), errors="coerce", utc=True,
                       format="ISO8601")
    return s.dt.tz_localize(None).to_numpy(dtype="datetime64[us]")


def parse_strptime(values: list[str], formats: list[str]) -> np.ndarray:
    """First matching format wins (reference format-list semantics)."""
    out = np.full(len(values), np.datetime64("NaT"), dtype="datetime64[us]")
    remaining = np.arange(len(values))
    vals = pd.Series(values)
    for fmt in formats:
        if remaining.size == 0:
            break
        parsed = pd.to_datetime(vals.iloc[remaining], format=fmt,
                                errors="coerce")
        good = parsed.notna().to_numpy()
        idx = remaining[good]
        out[idx] = parsed[good].to_numpy(dtype="datetime64[us]")
        remaining = remaining[~good]
    return out


def to_utc(ts: np.ndarray, tz_offset_hours: float = 0.0) -> np.ndarray:
    """Apply the configured source timezone to naive timestamps
    (reference ``timestamp_tz``) and return UTC-naive datetime64[us]."""
    if tz_offset_hours == 0.0:
        return ts
    delta = np.timedelta64(int(tz_offset_hours * 3600 * 1_000_000), "us")
    return ts - delta


def parse_timestamp_column(batch: pa.Table, column: str, kind: str,
                           out_column: str = "@timestamp",
                           formats: list[str] | None = None,
                           ref: dt.datetime | None = None,
                           tz_offset_hours: float = 0.0) -> pa.Table:
    """map_batches stage: parse ``column`` per the configured ``kind``
    (epoch | syslog | iso8601 | strptime) into ``out_column``."""
    col = batch.column(column)
    if kind == "epoch":
        vals = col.to_numpy(zero_copy_only=False).astype(np.float64)
        ts = parse_epoch(vals)
    elif kind == "syslog":
        ts = parse_syslog(col.to_pylist(), ref or dt.datetime(2026, 1, 1))
    elif kind == "iso8601":
        ts = parse_iso8601(col.to_pylist())
    elif kind == "strptime":
        ts = parse_strptime(col.to_pylist(), formats or [])
    else:
        raise ValueError(f"unknown timestamp kind: {kind}")
    ts = to_utc(ts, tz_offset_hours)
    return batch.append_column(out_column, pa.array(ts, pa.timestamp("us")))
