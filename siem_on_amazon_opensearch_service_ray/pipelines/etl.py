"""Document-preparation ETL pipeline: the reference es-loader's
per-record flow, Ray-Data-first.

Reference order (siem/__init__.py:519-574, LogParser.__call__):
  skip-check -> rename_fields -> get_timestamp -> add_basic_field
  (@id/@message/...) -> clean_multi_type -> transform_to_ecs ->
  transform_by_script (sf_* module) -> enrich (xff -> geoip -> ioc ->
  ua) -> exclude_logs_by_conditions

Here each step is a vectorized batch stage over Arrow tables; the
per-logtype script mechanism (reference: 58 sf_*.py modules loaded via
importlib, siem/utils.py:722-749) becomes a registry of batch
transforms keyed by logtype, with 14 exemplar transforms mirrored for
parity tests (6 here — e.g. outcome derivation ~ sf_cloudtrail.py:73-84,
protocol name mapping ~ sf_vpcflowlogs.py:24-42 — plus 8 more shapes
in pipelines/logtypes.py).  Index routing (reference
siem/__init__.py:617-656: index name + rotation suffix) becomes a
partition-key column used by partitioned parquet output.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..stages.cleanup import clean_empty_strings, rename_columns
from ..stages.exclude import Excluder
from ..stages.timestamps import parse_timestamp_column

# ---------------------------------------------------------------------------
# per-logtype script-transform registry (M8 mechanism)

_TRANSFORMS: dict[str, callable] = {}


def register_transform(logtype: str):
    """Decorator: register a batch transform for a logtype (the Ray
    analogue of dropping an sf_<logtype>.py module into /opt/siem —
    reference siem/utils.py:736-749)."""
    def deco(fn):
        _TRANSFORMS[logtype] = fn
        return fn
    return deco


def get_transform(logtype: str):
    return _TRANSFORMS.get(logtype)


@register_transform("cloudtrail_like")
def _tf_outcome(batch: pa.Table) -> pa.Table:
    """Outcome derivation (reference sf_cloudtrail.py:73-84: an
    errorCode present => failure, else success)."""
    if "error_code" not in batch.column_names:
        return batch
    err = batch.column("error_code")
    outcome = pc.if_else(pc.is_null(err), pa.scalar("success"),
                         pa.scalar("failure"))
    return batch.append_column("event_outcome", outcome)


_PROTO_NAMES = {1: "icmp", 6: "tcp", 17: "udp", 41: "ipv6", 47: "gre",
                50: "esp", 58: "ipv6-icmp", 132: "sctp"}


@register_transform("vpcflow_like")
def _tf_protocol(batch: pa.Table) -> pa.Table:
    """IANA protocol number -> transport name (reference
    sf_vpcflowlogs.py:24-42)."""
    if "protocol" not in batch.column_names:
        return batch
    nums = batch.column("protocol").to_pylist()
    names = [_PROTO_NAMES.get(n) for n in nums]
    return batch.append_column("network_transport",
                               pa.array(names, pa.string()))


@register_transform("alb_like")
def _tf_url_full(batch: pa.Table) -> pa.Table:
    """url.full assembly from scheme/host/path parts (reference
    sf_alb.py:11-13 builds url.full out of request components)."""
    needed = {"scheme", "host", "url_path"}
    if not needed <= set(batch.column_names):
        return batch
    full = [f"{s}://{h}{p or ''}" if s and h else None
            for s, h, p in zip(batch.column("scheme").to_pylist(),
                               batch.column("host").to_pylist(),
                               batch.column("url_path").to_pylist())]
    return batch.append_column("url_full", pa.array(full, pa.string()))


_OCSF_CATEGORY_INDEX = {
    1: "log-ocsf-system", 2: "log-ocsf-findings", 3: "log-ocsf-iam",
    4: "log-ocsf-network", 5: "log-ocsf-discovery", 6: "log-ocsf-application",
}


@register_transform("securitylake_like")
def _tf_ocsf_route(batch: pa.Table) -> pa.Table:
    """Index re-routing by OCSF category (reference
    sf_securitylake.py:13-40 routes category_uid into log-ocsf-*
    index families) — an sf transform that OVERRIDES the routing key."""
    if "category_uid" not in batch.column_names:
        return batch
    idx = [_OCSF_CATEGORY_INDEX.get(c, "log-ocsf-other")
           for c in batch.column("category_uid").to_pylist()]
    return batch.append_column("__index_override", pa.array(idx, pa.string()))


# ---------------------------------------------------------------------------
# sub-parser dispatch exemplar: linux syslog secure-channel transform

import re as _re2

# first-match-wins chains per process (behavior mirror of reference
# sf_linux_os_syslog.py:15-32 RE_LIST_SSHD/RE_LIST_SUDO; subset of
# patterns covering the accept/fail/invalid/disconnect/session shapes)
_SSHD_RES = [
    _re2.compile(
        r"(?P<action>Accepted|Failed|Invalid user)\s.*?"
        r"((publickey|password|none) for )?(invalid user )?(?P<user>\S+)"
        r"(\s+from\s+(?P<source_ip>\d{1,3}(?:\.\d{1,3}){3}))?"
        r"(\s+port\s+(?P<source_port>\d+))?"),
    _re2.compile(r"^(?P<action>Disconnected|Received disconnect) from "
                 r"(?P<source_ip>\S+) port (?P<source_port>\d+)"),
    _re2.compile(r"^pam_unix\S*: (?P<action>session (closed|opened)) "
                 r"for user (?P<user>\S+)"),
    _re2.compile(r"^(?P<action>Connection (reset|closed))\s+by\s+"
                 r"(?P<source_ip>\d{1,3}(?:\.\d{1,3}){3})\s+port\s+"
                 r"(?P<source_port>\d+)"),
]
_SUDO_RES = [
    _re2.compile(r"^(?P<user>\S+) : .*COMMAND=(?P<action>.*)"),
    _re2.compile(r"^pam_unix\S*: (?P<action>session (closed|opened)) "
                 r"for user (?P<user>\S+)"),
]


def _sshd_outcome(action: str) -> str | None:
    a = action.lower()
    if "accept" in a or "opened" in a:
        return "success"
    if "fail" in a or "invalid" in a or "err" in a:
        return "failure"
    if "disconnect" in a or "reset" in a or "close" in a:
        return None
    return "unknown"


@register_transform("linux_syslog_like")
def _tf_linux_syslog(batch: pa.Table) -> pa.Table:
    """Sub-parser dispatch (the M8 'hard shape': one logtype, many
    per-process parsers — reference sf_linux_os_syslog.py:100-121
    routes on ``proc`` to sshd/sudo extractors and re-routes the index
    to log-linux-secure)."""
    needed = {"proc", "syslog_message"}
    if not needed <= set(batch.column_names):
        return batch
    procs = batch.column("proc").to_pylist()
    msgs = batch.column("syslog_message").to_pylist()
    users, ips, ports, actions, outcomes, cats, idx_ov = \
        [], [], [], [], [], [], []
    for proc, msg in zip(procs, msgs):
        proc, msg = proc or "", msg or ""
        data: dict = {}
        chain = _SSHD_RES if "sshd" in proc else \
            _SUDO_RES if "sudo" in proc else []
        for rx in chain:
            m = rx.search(msg)
            if m:
                data = {k: v for k, v in m.groupdict().items()
                        if v is not None}
                break
        secure = bool(chain) or proc == "su"
        idx_ov.append("log-linux-secure" if secure else None)
        users.append(data.get("user"))
        ips.append(data.get("source_ip"))
        ports.append(data.get("source_port"))
        action = data.get("action")
        actions.append(action)
        if "sshd" in proc:
            cats.append("authentication" if action else None)
            outcomes.append(_sshd_outcome(action) if action else None)
        elif "sudo" in proc:
            cats.append(None)
            outcomes.append("success" if action else None)
        else:
            cats.append(None)
            outcomes.append(None)
    for name, vals in (("user_name", users), ("source_ip", ips),
                       ("source_port", ports), ("event_action", actions),
                       ("event_outcome", outcomes),
                       ("event_category", cats),
                       ("__index_override", idx_ov)):
        batch = batch.append_column(name, pa.array(vals, pa.string()))
    return batch


# ---------------------------------------------------------------------------
# fan-out: envelope list explode + ASFF finding split (one -> many)

import json as _json
import re as _re

# GuardDuty/Macie finding-type grammar (the public ASFF
# "Namespace/Category/Purpose:Resource-Family.Mechanism!Artifact"
# format; reference sf_securityhub.py:17-26 parses the same grammar)
_RE_ASFF_TYPE = _re.compile(
    r"(?P<namespace>[^/]*)(/(?P<category>[^/]*))?/"
    r"((?P<ThreatPurpose>\w*):)?(?P<ResourceTypeAffected>\w*)"
    r"(/|-|\.)(?P<ThreatFamilyName>[\w&]*)"
    r"(\.(?P<DetectionMechanism>\w*))?(!(?P<Artifact>\w*))?")
_RE_ORG_TYPE = _re.compile(
    r"(?P<ThreatPurpose>\w*):(?P<ResourceTypeAffected>\w*)/"
    r"(?P<ThreatFamilyName>[\w&]*)(\.(?P<DetectionMechanism>\w*))?"
    r"(!(?P<Artifact>\w*))?")


def explode_json_list(batch: pa.Table, list_col: str,
                      out_col: str = "record") -> pa.Table:
    """One envelope row -> one row per element of the JSON array in
    ``list_col`` (the reference's ``json_delimiter`` fan-out: an ASFF
    export's ``findings`` list, CloudTrail's ``Records``, Config's
    ``configurationItems`` — aws.ini json_delimiter keys +
    fileformat_json.py:23-64).  Other columns are repeated; each
    element lands re-serialized in ``out_col``."""
    if list_col not in batch.column_names:
        return batch
    raw = batch.column(list_col).to_pylist()
    keep_cols = [c for c in batch.column_names if c != list_col]
    idx: list[int] = []
    recs: list[str | None] = []
    for i, v in enumerate(raw):
        items = None
        if isinstance(v, str) and v:
            try:
                items = _json.loads(v)
            except ValueError:
                items = None
        elif isinstance(v, list):
            items = v
        if not isinstance(items, list):
            idx.append(i)
            recs.append(None)   # malformed/absent envelope -> error sentinel
            continue
        for item in items:
            idx.append(i)
            recs.append(_json.dumps(item, sort_keys=True))
    take = pa.array(idx, pa.int64())
    out = batch.select(keep_cols).take(take) if keep_cols else \
        pa.table({}).take(take)
    return out.append_column(out_col, pa.array(recs, pa.string()))


@register_transform("securityhub_like")
def _tf_asff_split(batch: pa.Table) -> pa.Table:
    """ASFF finding-type decomposition (reference
    sf_securityhub.py:35-63 ``split_findings_type``): the slash/colon
    structured ``finding_type`` string becomes namespace/category/
    threat columns, falling back to the legacy org form."""
    if "finding_type" not in batch.column_names:
        return batch
    cols: dict[str, list] = {k: [] for k in (
        "asff_type_namespace", "asff_type_category", "threat_purpose",
        "resource_type_affected", "threat_family_name")}
    memo: dict[str, tuple] = {}
    for ft in batch.column("finding_type").to_pylist():
        if ft in memo:
            vals = memo[ft]
        elif not ft:
            vals = (None, None, None, None, None)
        else:
            # ASFF slash grammar first, legacy org colon form as the
            # fallback (reference sf_securityhub.py:36-47 order)
            m = _RE_ASFF_TYPE.match(ft) if "/" in ft else None
            if m is not None:
                ns = m.group("namespace")
                cat = m.group("category") or m.group("ThreatPurpose")
                tp = m.group("ThreatPurpose") or (cat or "").replace(" ", "")
                vals = (ns, cat, tp, m.group("ResourceTypeAffected") or None,
                        m.group("ThreatFamilyName") or None)
            elif ":" in ft and (m := _RE_ORG_TYPE.match(ft)) is not None:
                vals = (None, m.group("ThreatPurpose"),
                        m.group("ThreatPurpose"),
                        m.group("ResourceTypeAffected"),
                        m.group("ThreatFamilyName") or None)
            else:
                vals = (None, None, None, None, None)
        if ft is not None:
            memo[ft] = vals
        for k, v in zip(cols, vals):
            cols[k].append(v)
    for k, v in cols.items():
        batch = batch.append_column(k, pa.array(v, pa.string()))
    return batch


# ---------------------------------------------------------------------------
# index routing (M11)

_ROTATIONS = {"daily": "%Y-%m-%d", "weekly": "%Y-w%W", "monthly": "%Y-%m",
              "yearly": "%Y"}


def route_index(batch: pa.Table, index_name: str, rotation: str = "monthly",
                ts_col: str = "@timestamp", index_suffix: str = "",
                index_tz_hours: float = 0.0,
                dt_col: str = "__index_dt") -> pa.Table:
    """Append the target partition key ``__index`` = index_name +
    rotation suffix from the event timestamp (reference
    siem/__init__.py:617-656; aws.ini index_rotation).  Late data lands
    in the (older) partition its own timestamp names — the reference's
    exact late-data semantics (SURVEY.md §2.10).

    Full reference rotation surface: ``aoss`` = fixed
    ``-{index_suffix or '001'}`` (no date); ``auto`` = the bare name
    (suffix NOT applied, reference :635); dated rotations insert
    ``index_suffix`` before the date; ``index_tz_hours`` shifts the
    wall clock before formatting (aws.ini ``index_tz``); a ``dt_col``
    column (sf scripts' ``__index_dt``) overrides the routing
    timestamp per row and is consumed here."""
    n = batch.num_rows
    if rotation == "aoss":
        names = [f"{index_name}-{index_suffix or '001'}"] * n
    elif rotation == "auto":
        names = [index_name] * n
    else:
        fmt = _ROTATIONS.get(rotation)
        base = (f"{index_name}-{index_suffix}" if index_suffix
                else index_name)
        if fmt is None:
            names = [base] * n
        else:
            ts = batch.column(ts_col).to_pylist()
            if dt_col in batch.column_names:
                ov = batch.column(dt_col).to_pylist()
                ts = [o if o is not None else t for o, t in zip(ov, ts)]
            off = dt.timedelta(hours=index_tz_hours) if index_tz_hours \
                else None
            names = [f"{base}-{(t + off if off else t).strftime(fmt)}"
                     if t is not None else f"{base}-unknown" for t in ts]
    if dt_col in batch.column_names:
        batch = batch.drop_columns([dt_col])
    return batch.append_column("__index", pa.array(names, pa.string()))


# ---------------------------------------------------------------------------
# pipeline


@dataclass
class EtlConfig:
    """Declarative per-logtype spec — the engine's aws.ini section
    (reference es_loader/aws.ini: one ini section per logtype with
    regex/timestamp/ECS/exclusion keys)."""
    logtype: str
    timestamp_col: str | None = None
    timestamp_kind: str = "iso8601"       # epoch | syslog | iso8601 | strptime
    timestamp_formats: list = field(default_factory=list)
    timestamp_tz_hours: float = 0.0
    syslog_ref: dt.datetime | None = None
    renames: dict = field(default_factory=dict)
    static_fields: dict = field(default_factory=dict)
    exclusion_rules: list = field(default_factory=list)
    index_name: str = "log"
    index_rotation: str = "monthly"
    index_suffix: str = ""                # aws.ini index_suffix
    index_tz_hours: float = 0.0           # aws.ini index_tz
    # aws.ini index_time: '@timestamp' (event time, the default) or
    # 'event_ingested' — route by the pipeline's ingestion timestamp
    # column instead of the event's own time (reference
    # siem/__init__.py:639-640; the batch engine reads it from an
    # 'event_ingested' column the ingest layer stamps, since a Lambda
    # wall clock has no batch analogue)
    index_time: str = "@timestamp"
    # envelope fan-out: explode the JSON array in this column into one
    # row per element BEFORE the per-record stages (reference
    # json_delimiter, aws.ini; fileformat_json.py:23-64)
    json_delimiter: str | None = None


def prepare_batch(batch: pa.Table, cfg: EtlConfig) -> pa.Table:
    """One-batch version of the LogParser flow (stage order mirrors
    reference siem/__init__.py:519-574)."""
    if cfg.json_delimiter:
        batch = explode_json_list(batch, cfg.json_delimiter)
    if cfg.renames:
        batch = rename_columns(batch, cfg.renames)
    if cfg.timestamp_col is not None:
        batch = parse_timestamp_column(
            batch, cfg.timestamp_col, cfg.timestamp_kind,
            formats=cfg.timestamp_formats, ref=cfg.syslog_ref,
            tz_offset_hours=cfg.timestamp_tz_hours)
    batch = clean_empty_strings(batch)
    for k, v in cfg.static_fields.items():
        batch = batch.append_column(k, pa.array([v] * batch.num_rows))
    tf = get_transform(cfg.logtype)
    if tf is not None:
        batch = tf(batch)
    ingest_routed = (cfg.index_time == "event_ingested"
                     and "event_ingested" in batch.column_names)
    if "@timestamp" in batch.column_names or ingest_routed \
            or cfg.index_rotation in ("aoss", "auto"):
        if ingest_routed and "__index_dt" not in batch.column_names:
            batch = batch.append_column("__index_dt",
                                        batch.column("event_ingested"))
        if "@timestamp" not in batch.column_names and ingest_routed:
            # routing purely by ingestion time (no parseable event
            # time): route_index reads ts_col only for rows whose
            # __index_dt is null, so give it the ingest column too
            batch = route_index(batch, cfg.index_name,
                                cfg.index_rotation,
                                ts_col="event_ingested",
                                index_suffix=cfg.index_suffix,
                                index_tz_hours=cfg.index_tz_hours)
        else:
            batch = route_index(batch, cfg.index_name, cfg.index_rotation,
                                index_suffix=cfg.index_suffix,
                                index_tz_hours=cfg.index_tz_hours)
    if "__index_override" in batch.column_names:
        # sf transforms may re-route (reference __index_name override,
        # siem/__init__.py:627-633)
        ov = batch.column("__index_override")
        if "__index" in batch.column_names:
            merged = pc.if_else(pc.is_null(ov), batch.column("__index"), ov)
            batch = batch.set_column(
                batch.column_names.index("__index"), "__index", merged)
        else:
            batch = batch.append_column("__index", ov)
        batch = batch.drop_columns(["__index_override"])
    return batch


def run_etl(ds: rd.Dataset, cfg: EtlConfig,
            out_dir: str | None = None) -> rd.Dataset:
    """Full ETL: prepare (map_batches) -> exclusions (actor stage) ->
    optionally write parquet partitioned by the ``__index`` routing key
    (one directory per index family+period = the reference's index
    rotation as partition layout)."""
    out = ds.map_batches(lambda b: prepare_batch(b, cfg),
                         batch_format="pyarrow")
    if cfg.exclusion_rules:
        out = out.map_batches(Excluder,
                              fn_constructor_kwargs={"rules": cfg.exclusion_rules},
                              batch_format="pyarrow", concurrency=2)
    if out_dir is not None:
        # partition dirs must not start with '_': parquet dataset
        # discovery (pyarrow, Ray read_parquet) treats underscore-
        # prefixed paths as hidden metadata and silently skips them,
        # so '__index=...' output would read back EMPTY.  The routing
        # column keeps its in-pipeline name; only the sink renames.
        out.map_batches(
            lambda b: b.rename_columns(
                ["index" if c == "__index" else c for c in b.column_names]),
            batch_format="pyarrow",
        ).write_parquet(out_dir, partition_cols=["index"])
        return out
    return out


# second batch of sf_* exemplars registers itself on import (plugin
# pattern — logtypes.py imports register_transform from this module)
from . import logtypes  # noqa: E402,F401  isort:skip
