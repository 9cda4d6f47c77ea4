"""Palo-Alto firewall raw-log transformer (the reference's SECOND
raw-log Lambda): positional CSV carved by per-logtype header lists.

The reference ships pa_firewall_rawlog_transformer/index.py (1,380
LoC): CloudWatch-Logs JSON envelopes whose ``logEvents[].message``
strings are HEADERLESS positional CSV in PAN-OS syslog order.  Each
message routes on its type token — reference index.py:115-155:
``SYSTEM``/``TRAFFIC``/``DECRYPTION``/``CONFIG``/``AUTHENTICATION``
substrings, with ``THREAT`` sub-routed by subtype (``,url,`` ->
threat_url; ``,data,``/``,dlp,``/``,file,`` -> threat_data; else
threat_others) — and is carved into named fields purely by POSITION
against that route's header list (index.py:177-254 builds the row
dict field-by-field from ``fields[i]``), with ``FUTURE_USE`` slots
renamed ``future_use_N``.  One output table per route.

Ray-Data-first shape (vs the reference's per-message pandas concat):

* routing is a vectorized substring test per batch
  (``pc.match_substring``), not a Python if-chain per message;
* carving is ONE ``pyarrow.csv.read_csv`` call per (batch, route)
  over the joined lines with ``column_names=`` the header list — the
  csv kernel does the splitting/quoting, no per-field Python;
* everything stays inside ``map_batches`` so routes stream
  independently; the demo summary is a groupby over the union.

Scope (same argument as the sf_* registry, SURVEY §7.6): the full
PAN-OS lists run to ~110 columns of field lore; these header lists
keep the documented PAN-OS shared prefix (receive_time,
serial_number, type, threat_content_type/subtype, future_use slots,
generated_time, virtual_system — the reference's own first columns)
plus a payload trailer the fixture carries for the oracle.  The
mechanism — substring routing, subtype sub-routing, positional
carving, future_use renames — is complete.
"""

from __future__ import annotations

import hashlib
import io
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.csv as pacsv
import pyarrow.parquet as pq

import ray.data as rd

#: route -> positional header list (PAN-OS column order prefix; the
#: trailer carries the fixture payload).  FUTURE_USE slots keep the
#: reference's future_use_N rename convention (index.py:178-202).
PAN_HEADERS: dict[str, list[str]] = {
    "traffic": ["receive_time", "serial_number", "type",
                "threat_content_type", "future_use_1", "generated_time",
                "source_address", "destination_address",
                "user_id", "value", "event_id"],
    "system": ["receive_time", "serial_number", "type",
               "content_threat_type", "future_use_1", "generated_time",
               "virtual_system", "event_id_name", "severity",
               "user_id", "value", "event_id"],
    "threat_url": ["receive_time", "serial_number", "type", "subtype",
                   "future_use_1", "generated_time", "url_category",
                   "user_id", "value", "event_id"],
    "threat_data": ["receive_time", "serial_number", "type", "subtype",
                    "future_use_1", "generated_time", "direction",
                    "user_id", "value", "event_id"],
    "threat_others": ["receive_time", "serial_number", "type", "subtype",
                      "future_use_1", "generated_time", "threat_id",
                      "user_id", "value", "event_id"],
    "decryption": ["receive_time", "serial_number", "type",
                   "future_use_1", "generated_time", "tls_version",
                   "user_id", "value", "event_id"],
    "config": ["receive_time", "serial_number", "type", "future_use_1",
               "generated_time", "command",
               "user_id", "value", "event_id"],
    "authentication": ["receive_time", "serial_number", "type",
                       "future_use_1", "generated_time", "auth_method",
                       "user_id", "value", "event_id"],
}

#: fixture route order — event_id % 8 picks the route; the THREAT
#: subtype token is what sub-routes url/data/others (reference
#: index.py:128-142: ',url,' / ',data,'|',dlp,'|',file,' / else)
ROUTES = ["traffic", "system", "threat_url", "threat_data",
          "threat_others", "decryption", "config", "authentication"]

_TYPE_TOKEN = {"traffic": "TRAFFIC", "system": "SYSTEM",
               "threat_url": "THREAT", "threat_data": "THREAT",
               "threat_others": "THREAT", "decryption": "DECRYPTION",
               "config": "CONFIG", "authentication": "AUTHENTICATION"}
_SUBTYPE = {"threat_url": "url", "threat_data": "data",
            "threat_others": "vulnerability"}


def route_pan_messages(batch: pa.Table, line_col: str = "message"
                       ) -> pa.Table:
    """Vectorized route assignment (reference index.py:115-155's
    if-chain as substring kernels): adds ``__route``.  Unknown
    messages keep route '' (the reference logs-and-drops them; the
    caller filters)."""
    col = pc.cast(batch.column(line_col), pa.string())
    route = np.full(batch.num_rows, "", dtype=object)

    def _has(sub: str) -> np.ndarray:
        return pc.match_substring(col, sub).to_numpy(
            zero_copy_only=False).astype(bool)

    lower = pc.utf8_lower(col)

    def _has_lower(sub: str) -> np.ndarray:
        return pc.match_substring(lower, sub).to_numpy(
            zero_copy_only=False).astype(bool)

    # later assignments overwrite earlier ones, so apply in REVERSE
    # elif priority (reference order: SYSTEM > TRAFFIC > THREAT >
    # DECRYPTION > CONFIG > AUTHENTICATION; within THREAT url wins
    # over data/dlp/file wins over others)
    route[_has("AUTHENTICATION")] = "authentication"
    route[_has("CONFIG")] = "config"
    route[_has("DECRYPTION")] = "decryption"
    is_threat = _has("THREAT")
    route[is_threat] = "threat_others"
    route[is_threat & _has_lower(",data,")] = "threat_data"
    route[is_threat & _has_lower(",dlp,")] = "threat_data"
    route[is_threat & _has_lower(",file,")] = "threat_data"
    route[is_threat & _has_lower(",url,")] = "threat_url"
    route[_has("TRAFFIC")] = "traffic"
    route[_has("SYSTEM")] = "system"
    return batch.append_column("__route", pa.array(route, pa.string()))


def carve_positional_csv(lines: list[str], columns: list[str]
                         ) -> pa.Table:
    """Headerless positional CSV -> typed-by-name table: ONE
    pyarrow.csv parse over the joined lines (quoting honored), every
    column read as string (the reference .strip()s every field into a
    string; downstream ETL owns typing)."""
    if not lines:
        return pa.table({c: pa.array([], pa.string()) for c in columns})
    data = ("\n".join(lines)).encode()
    t = pacsv.read_csv(
        io.BytesIO(data),
        read_options=pacsv.ReadOptions(column_names=columns),
        convert_options=pacsv.ConvertOptions(
            column_types={c: pa.string() for c in columns}))
    # whitespace-strip parity with the reference's fields[i].strip()
    return pa.table({c: pc.utf8_trim_whitespace(t.column(c))
                     for c in columns})


def _empty_carve() -> pa.Table:
    """The carve output schema, empty — single source of truth for the
    zero-row branches so schema edits can't diverge."""
    return pa.table({"route": pa.array([], pa.string()),
                     "serial_number": pa.array([], pa.string()),
                     "user_id": pa.array([], pa.int64()),
                     "value": pa.array([], pa.float64()),
                     "event_id": pa.array([], pa.int64())})


def carve_batch(batch: pa.Table, line_col: str = "message") -> pa.Table:
    """map_batches stage: route + carve one batch of raw messages.
    Output schema is the summary-relevant union (route, serial_number,
    user_id, value, event_id) — per-route full tables are what
    :func:`carve_route_tables` returns for users who want them."""
    if line_col not in batch.column_names:
        # explode_json_records falls back to a lone 'record' column
        # when a block held no parseable envelopes — yield zero rows
        # instead of aborting the pipeline on one bad file
        return _empty_carve()
    routed = route_pan_messages(batch, line_col)
    mask = pc.not_equal(routed.column("__route"), "")
    routed = routed.filter(mask)
    routes = routed.column("__route").to_pylist()
    msgs = routed.column(line_col).to_pylist()
    parts = []
    for r in sorted(set(routes)):
        lines = [m for m, rr in zip(msgs, routes) if rr == r]
        t = carve_positional_csv(lines, PAN_HEADERS[r])
        parts.append(pa.table({
            "route": pa.array([r] * t.num_rows, pa.string()),
            "serial_number": t.column("serial_number"),
            "user_id": pc.cast(t.column("user_id"), pa.int64()),
            "value": pc.cast(t.column("value"), pa.float64()),
            "event_id": pc.cast(t.column("event_id"), pa.int64()),
        }))
    if not parts:
        return _empty_carve()
    return pa.concat_tables(parts)


def carve_route_tables(messages: list[str]) -> dict[str, pa.Table]:
    """Reference-output parity helper: full per-route tables (every
    positional column named), keyed by route — the shape the
    reference uploads one CSV per route bucket (index.py:66-90)."""
    routed = route_pan_messages(
        pa.table({"message": pa.array(messages, pa.string())}))
    routes = routed.column("__route").to_pylist()
    out = {}
    for r in sorted(set(routes) - {""}):
        lines = [m for m, rr in zip(messages, routes) if rr == r]
        out[r] = carve_positional_csv(lines, PAN_HEADERS[r])
    return out


def _pan_line(route: str, iso_ts: str, user_id: int, value: float,
              event_id: int) -> str:
    """One PAN-OS-shaped positional CSV line for the fixture."""
    mid = {"traffic": ["10.0.0.1", "10.0.0.2"],
           "system": ["vsys1", "general", "informational"],
           "threat_url": ["search-engines"],
           "threat_data": ["client-to-server"],
           "threat_others": ["40033"],
           "decryption": ["TLS1.3"],
           "config": ["set deviceconfig"],
           "authentication": ["LDAP"]}[route]
    head = [iso_ts, f"00{user_id % 50:03d}", _TYPE_TOKEN[route]]
    if route in _SUBTYPE:
        head.append(_SUBTYPE[route])     # threat subtype slot
    elif route in ("traffic", "system"):
        head.append({"traffic": "end", "system": "general"}[route])
    # decryption/config/authentication header lists have no 4th
    # type-detail column — their future_use_1 follows type directly
    head.append("")                      # FUTURE_USE slot
    head.append(iso_ts)                  # generated_time
    return ",".join(head + mid
                    + [str(user_id), repr(float(value)), str(event_id)])


def write_pa_fixture(sf_dir: str, files: int = 4,
                     events_per_envelope: int = 5) -> str:
    """CloudWatch-envelope fixture derived deterministically from the
    events table (event_id % 8 -> route), cached under /tmp."""
    key = hashlib.sha256(("pa:" + sf_dir).encode()).hexdigest()[:12]
    out = f"/tmp/sosr_pafw_{key}"
    marker = os.path.join(out, ".done")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    t = pq.read_table(os.path.join(sf_dir, "events.parquet"),
                      columns=["event_id", "ts", "user_id", "value"])
    df = t.to_pandas().sort_values("event_id").reset_index(drop=True)
    fno = (df["event_id"] // 8) % files
    for n in range(files):
        part = df[fno == n]
        lines, msgs = [], []
        for r in part.itertuples(index=False):
            route = ROUTES[int(r.event_id) % 8]
            iso = pd.Timestamp(r.ts).strftime("%Y/%m/%d %H:%M:%S")
            msgs.append(_pan_line(route, iso, int(r.user_id),
                                  float(r.value), int(r.event_id)))
            if len(msgs) == events_per_envelope:
                lines.append(json.dumps(
                    {"logEvents": [{"message": m} for m in msgs]}))
                msgs = []
        if msgs:
            lines.append(json.dumps(
                {"logEvents": [{"message": m} for m in msgs]}))
        with open(os.path.join(out, f"cw-{n}.ndjson"), "w") as f:
            f.write("\n".join(lines) + "\n")
    with open(marker, "w") as f:
        f.write("ok")
    return out


def pa_firewall_summary(fixture_dir: str) -> pd.DataFrame:
    """bytes -> CloudWatch envelope explode -> route -> positional
    carve -> per-route summary (n, distinct serials, sum_value_e2).
    ROW-keyed integer sums, order-independent at any parallelism."""
    from ..sources.envelopes import DecompressLines
    from ..sources.readers import explode_json_records
    from ray.data.aggregate import Count, Sum

    ds = rd.read_binary_files(fixture_dir, include_paths=True,
                              file_extensions=["ndjson"])
    ds = ds.map_batches(DecompressLines(), batch_format="pyarrow")
    ds = ds.map_batches(
        lambda b: explode_json_records(b, "line",
                                       delimiter_key="logEvents"),
        batch_format="pyarrow")
    ds = ds.map_batches(carve_batch, batch_format="pyarrow")

    def partial(b: pa.Table) -> pa.Table:
        v_e2 = pc.cast(pc.round(pc.multiply(b.column("value"), 100.0),
                                round_mode="half_towards_infinity"),
                       pa.int64())
        return pa.table({"route": b.column("route"),
                         "serial_number": b.column("serial_number"),
                         "value_e2": v_e2})

    grouped = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["route", "serial_number"])
               .aggregate(Count(alias_name="n"),
                          Sum("value_e2", alias_name="sum_value_e2"))
               .to_pandas())
    out = grouped.groupby("route", as_index=False).agg(
        n=("n", "sum"), n_serials=("serial_number", "nunique"),
        sum_value_e2=("sum_value_e2", "sum"))
    out["n"] = out["n"].astype(np.int64)
    out["n_serials"] = out["n_serials"].astype(np.int64)
    out["sum_value_e2"] = out["sum_value_e2"].astype(np.int64)
    return out.sort_values("route").reset_index(drop=True)
