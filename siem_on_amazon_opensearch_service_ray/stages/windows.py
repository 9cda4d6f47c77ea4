"""Windowed aggregates over event streams.

The reference has no windows (its streaming semantics are
at-least-once, unordered, doc-per-event — SURVEY.md §2.10); dashboards
get date-histogram panels from OpenSearch (SURVEY.md A5).  These
operators provide those date-histogram / session semantics natively:

- ``tumbling``: fixed buckets = floor(ts / size) — a groupby, no
  ordering requirement;
- ``sliding``: each event lands in every window covering it (explode
  then groupby);
- ``sessionize``: per-key sessions split on gaps > timeout — needs
  per-key time order, expressed as groupby(key).map_groups with an
  in-group sort (the guide's streaming-shaped pattern: partition by
  key, sort within partition).

All window bounds are computed from the event's own timestamp, so like
the reference's index routing, late data simply lands in the (older)
bucket it names — no watermarks needed for batch semantics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray:
    """Epoch MICROseconds as int64, regardless of the column's native
    unit.  ``pc.cast(ts, int64)`` alone yields the column's own unit
    (s/ms/us/ns) — a timestamp[s] input would be treated as if it were
    microseconds, producing silently wrong buckets.  Normalize to
    timestamp[us] first (date32/date64 inputs also go through this
    cast)."""
    t = col.type
    if pa.types.is_timestamp(t) and t.unit == "us" and t.tz is None:
        return pc.cast(col, pa.int64())
    return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())


def add_tumbling_window(batch: pa.Table, ts_col: str, size_sec: int,
                        out_col: str = "window_start") -> pa.Table:
    """Window start epoch-seconds = ts floored to the window size."""
    us = _ts_us(batch.column(ts_col))
    size_us = size_sec * 1_000_000
    start = pc.multiply(pc.divide(us, size_us), size_us)
    return batch.append_column(out_col, pc.divide(start, 1_000_000))


def tumbling_aggregate(ds: rd.Dataset, ts_col: str, size_sec: int,
                       key_cols: list[str], value_col: str) -> rd.Dataset:
    """count + sum/min/max of ``value_col`` per (keys, window)."""
    win = ds.map_batches(
        lambda b: add_tumbling_window(b, ts_col, size_sec),
        batch_format="pyarrow")
    return win.groupby(key_cols + ["window_start"]).aggregate(
        Count(alias_name="n"),
        Sum(value_col, alias_name="sum_value"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
        Mean(value_col, alias_name="mean_value"))


#: calendar units accepted by :func:`add_calendar_window` (the
#: OpenSearch date_histogram calendar_interval values our dashboards
#: need; all map to pyarrow floor_temporal units)
CALENDAR_UNITS = ("hour", "day", "week", "month", "quarter", "year")


def add_calendar_window(batch: pa.Table, ts_col: str,
                        interval: str = "month",
                        tz_offset_hours: float = 0.0,
                        out_col: str = "bucket_epoch") -> pa.Table:
    """Calendar-aware date_histogram bucketing (OpenSearch
    ``date_histogram`` with ``calendar_interval`` + ``time_zone``) —
    the reference's dashboards and its monthly index rotation bucket
    by calendar month in a configured timezone (reference
    aws.ini:104-118, ``index_rotation``/``index_tz``), which a fixed
    epoch-width bucket cannot express (months vary in length, tz
    offsets move the month boundary).

    Bucket = calendar truncation of the tz-shifted wall-clock time;
    the emitted ``out_col`` is the LOCAL bucket start as epoch seconds
    (the convention DuckDB's ``epoch(date_trunc(unit, ts + offset))``
    produces, so oracles compare directly).  Fractional offsets
    (+05:30) are supported.  One vectorized floor_temporal per batch.
    """
    if interval not in CALENDAR_UNITS:
        raise ValueError(f"calendar interval must be one of "
                         f"{CALENDAR_UNITS}, got {interval!r}")
    off_us = int(round(tz_offset_hours * 3600)) * 1_000_000
    shifted = pc.cast(pc.add(_ts_us(batch.column(ts_col)), off_us),
                      pa.timestamp("us"))
    bucket = pc.floor_temporal(shifted, unit=interval)
    epoch = pc.divide(pc.cast(bucket, pa.int64()), 1_000_000)
    return batch.append_column(out_col, epoch)


def calendar_aggregate(ds: rd.Dataset, ts_col: str, interval: str,
                       key_cols: list[str], value_col: str,
                       tz_offset_hours: float = 0.0) -> rd.Dataset:
    """count + sum/min/max/mean of ``value_col`` per (keys, calendar
    bucket) — the calendar twin of :func:`tumbling_aggregate`."""
    win = ds.map_batches(
        lambda b: add_calendar_window(b, ts_col, interval,
                                      tz_offset_hours),
        batch_format="pyarrow")
    return win.groupby(key_cols + ["bucket_epoch"]).aggregate(
        Count(alias_name="n"),
        Sum(value_col, alias_name="sum_value"),
        Min(value_col, alias_name="min_value"),
        Max(value_col, alias_name="max_value"),
        Mean(value_col, alias_name="mean_value"))


def explode_sliding_windows(batch: pa.Table, ts_col: str, size_sec: int,
                            step_sec: int) -> pa.Table:
    """Each row replicated into every sliding window covering it."""
    assert size_sec % step_sec == 0
    k = size_sec // step_sec
    us = _ts_us(batch.column(ts_col)).to_numpy(zero_copy_only=False)
    step_us = step_sec * 1_000_000
    last_start = (us // step_us) * step_us
    idx = np.repeat(np.arange(batch.num_rows), k)
    offs = np.tile(np.arange(k, dtype=np.int64) * step_us, batch.num_rows)
    starts = last_start[idx] - offs
    out = batch.take(pa.array(idx))
    return out.append_column("window_start",
                             pa.array(starts // 1_000_000, pa.int64()))


def sliding_aggregate(ds: rd.Dataset, ts_col: str, size_sec: int,
                      step_sec: int, key_cols: list[str],
                      value_col: str) -> rd.Dataset:
    ex = ds.map_batches(
        lambda b: explode_sliding_windows(b, ts_col, size_sec, step_sec),
        batch_format="pyarrow")
    return ex.groupby(key_cols + ["window_start"]).aggregate(
        Count(alias_name="n"), Sum(value_col, alias_name="sum_value"))


def sessionize(ds: rd.Dataset, key_col: str, ts_col: str,
               gap_sec: float) -> rd.Dataset:
    """Per-key session assignment: a new session starts when the gap
    from the previous event exceeds ``gap_sec``.  Partitioning
    assumption: one group = one key's full history (groupby delivers
    that); order restored by an in-group sort.

    Skew note (100 TB): a pathological key (one bot user with 10^8
    events) lands in ONE group on one worker — use
    :func:`sessionize_bounded` (two-phase split + boundary merge,
    output-identical) when that matters; the extra summary pass only
    pays for itself under heavy skew."""
    gap_us = int(gap_sec * 1_000_000)

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col).reset_index(drop=True)
        us = g[ts_col].astype("datetime64[us]").astype("int64")
        new_sess = (us.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        g["session_id"] = new_sess.cumsum() - 1
        return g

    return ds.groupby(key_col).map_groups(per_key, batch_format="pandas")


def session_stats(ds: rd.Dataset, key_col: str, ts_col: str,
                  gap_sec: float) -> rd.Dataset:
    """Session table: (key, session_id) -> n_events, duration."""
    sess = sessionize(ds, key_col, ts_col, gap_sec)

    def agg(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        us = df[ts_col].astype("int64")
        df = df.assign(_us=us)
        g = df.groupby([key_col, "session_id"], as_index=False).agg(
            n_events=(ts_col, "size"), start_us=("_us", "min"),
            end_us=("_us", "max"))
        g["duration_sec"] = (g["end_us"] - g["start_us"]) / 1e6
        # metadata-free: from_pandas schema metadata is unhashable in
        # pyarrow 16 and defeats Ray's block-schema dedup
        return pa.Table.from_pandas(
            g[[key_col, "session_id", "n_events", "duration_sec"]],
            preserve_index=False).replace_schema_metadata(None)

    # sessionize already co-located each key in one group/block
    return sess.map_batches(agg, batch_format="pyarrow")


def sessionize_bounded(ds: rd.Dataset, key_col: str, ts_col: str,
                       gap_sec: float, bucket_hours: float = 24.0
                       ) -> rd.Dataset:
    """Skew-bounded sessionization: identical output to
    :func:`sessionize`, but no group ever holds more than one
    (key, time-bucket) slice — the pathological-key mitigation the
    plain version's docstring describes.

    Phase 1 sessionizes per (key, bucket) locally; phase 2 reduces the
    tiny per-(key, bucket) summary table (first/last ts, session
    count) per key into global id offsets — consecutive buckets whose
    boundary gap is <= ``gap_sec`` share a session across the cut —
    and a broadcast map rewrites local ids to global ones.  The
    summary table is |keys x active buckets| rows (bounded, metadata
    -sized); event rows never centralize."""
    import ray

    gap_us = int(gap_sec * 1_000_000)
    bucket_us = int(bucket_hours * 3600 * 1_000_000)

    def add_bucket(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch.column(ts_col))
        return batch.append_column(
            "_bucket", pc.divide(us, bucket_us))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(ts_col).reset_index(drop=True)
        us = g[ts_col].astype("datetime64[us]").astype("int64")
        new_sess = (us.diff().fillna(gap_us + 1) > gap_us).astype("int64")
        g["_local_sid"] = new_sess.cumsum() - 1
        return g

    s1 = (ds.map_batches(add_bucket, batch_format="pyarrow")
            .groupby([key_col, "_bucket"])
            .map_groups(per_bucket, batch_format="pandas"))

    # summary reduce: tiny — one row per (key, active bucket)
    summary = (s1.groupby([key_col, "_bucket"])
                 .aggregate(Min(ts_col, alias_name="_first"),
                            Max(ts_col, alias_name="_last"),
                            Max("_local_sid", alias_name="_max_sid"))
               ).to_pandas()
    # normalize to MICROseconds explicitly: depending on the pandas
    # conversion path the timestamps land as datetime64[ns] (astype
    # int64 would yield ns and silently shrink the effective gap 1000x)
    summary["_first_us"] = summary["_first"].astype(
        "datetime64[us]").astype("int64")
    summary["_last_us"] = summary["_last"].astype(
        "datetime64[us]").astype("int64")
    offsets: dict[tuple, int] = {}
    for key, grp in summary.groupby(key_col, sort=False):
        grp = grp.sort_values("_bucket")
        off = 0
        prev_last = None
        for _, row in grp.iterrows():
            if prev_last is not None and \
                    row["_first_us"] - prev_last <= gap_us:
                off -= 1          # boundary sessions merge across the cut
            offsets[(key, int(row["_bucket"]))] = off
            off += int(row["_max_sid"]) + 1
            prev_last = row["_last_us"]
    off_ref = ray.put(offsets) if ray.is_initialized() else offsets

    class Remap:
        def __init__(self, ref):
            self.offsets = ray.get(ref) if isinstance(
                ref, ray.ObjectRef) else ref

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch.column(key_col).to_pylist()
            buckets = batch.column("_bucket").to_pylist()
            local = batch.column("_local_sid").to_numpy(
                zero_copy_only=False)
            glob = np.fromiter(
                (self.offsets[(k, int(b))] + int(l)
                 for k, b, l in zip(keys, buckets, local)),
                dtype=np.int64, count=len(keys))
            batch = batch.append_column("session_id",
                                        pa.array(glob, pa.int64()))
            return batch.drop_columns(["_bucket", "_local_sid"])

    return s1.map_batches(Remap, fn_constructor_kwargs={"ref": off_ref},
                          batch_format="pyarrow", concurrency=2)
