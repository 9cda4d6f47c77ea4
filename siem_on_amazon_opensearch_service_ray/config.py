"""INI config loading with overlay semantics — the engine's
``aws.ini`` / ``user.ini`` surface.

The reference builds its per-logtype ETL spec from a base ini overlaid
by up to two user inis, later files overriding earlier keys per
section, with ExtendedInterpolation, case-preserving keys, a required
``doc_id`` in DEFAULT, and ``HH:MM`` timezone strings converted to
fractional hours (reference: siem/utils.py:618-636 ``get_etl_config``
+ ``timestr_to_hours``).  This module mirrors those semantics and maps
each section into an :class:`~..pipelines.etl.EtlConfig`.

Recognized per-section keys (all optional unless noted):

================  =====================================================
key               meaning
================  =====================================================
index_name        target index family (default ``log``)
index_rotation    daily|weekly|monthly|yearly|aoss|auto|none
index_suffix      inserted before the date suffix (aoss: '-{suffix|001}')
index_tz          rotation timezone offset ('+09:00' style or hours)
timestamp_key     source column holding the event time
timestamp_format  epoch | syslog | iso8601 | any %-strptime pattern
timestamp_tz      ``+HH:MM`` / ``-HH:MM`` / plain hours float
json_delimiter    envelope list column to explode one->many (fan-out)
renames           ``old1:new1 old2:new2`` column renames
static.<field>    constant column ``<field>`` = value
exclude.<col>     regex exclusion rule on ``<col>``
================  =====================================================
"""

from __future__ import annotations

import configparser
import os

from .pipelines.etl import EtlConfig
from .stages.exclude import ExclusionRule


def timestr_to_hours(timestr: str) -> float:
    """``+09:00`` / ``-03:30`` / ``9`` -> signed fractional hours.

    Deliberate divergence from reference siem/utils.py:606-616: for a
    negative offset the reference computes ``int('-03') + 30/60 =
    -2.5`` for ``-03:30``; this returns the correct timezone
    interpretation ``-3.5`` (sign applies to the minutes too).

    >>> timestr_to_hours("+09:00")
    9.0
    >>> timestr_to_hours("-03:30")
    -3.5
    >>> timestr_to_hours("9")
    9.0
    """
    s = timestr.strip()
    if ":" in s:
        hours, minutes = s.split(":")
        sign = -1.0 if hours.lstrip().startswith("-") else 1.0
        return float(int(hours)) + sign * int(minutes) / 60
    return float(s)


def read_ini_overlay(base_path: str, *overlay_paths: str
                     ) -> configparser.ConfigParser:
    """Base ini + overlays; later files override per key, sections
    merge.  Missing overlay files are skipped silently (the reference
    reads /opt/user.ini unconditionally and ignores absence)."""
    cp = configparser.ConfigParser(
        interpolation=configparser.ExtendedInterpolation())
    cp.optionxform = str          # case-preserving keys (reference parity)
    with open(base_path) as f:
        cp.read_file(f)
    for p in overlay_paths:
        if p and os.path.exists(p):
            cp.read(p)
    if "doc_id" not in cp["DEFAULT"]:
        raise ValueError(f"invalid config file: {base_path}: "
                         "DEFAULT must define doc_id")
    return cp


def section_to_etl_config(logtype: str,
                          sec: configparser.SectionProxy) -> EtlConfig:
    """One ini section -> EtlConfig."""
    fmt = sec.get("timestamp_format", "iso8601")
    if fmt in ("epoch", "syslog", "iso8601"):
        kind, formats = fmt, []
    else:
        kind, formats = "strptime", [fmt]
    renames = {}
    for pair in sec.get("renames", "").split():
        old, _, new = pair.partition(":")
        if old and new:
            renames[old] = new
    static_fields = {k.split(".", 1)[1]: v for k, v in sec.items()
                     if k.startswith("static.")}
    rules = [ExclusionRule(k.split(".", 1)[1], v, pattern_type="regex")
             for k, v in sec.items() if k.startswith("exclude.")]
    return EtlConfig(
        logtype=logtype,
        timestamp_col=sec.get("timestamp_key") or None,
        timestamp_kind=kind,
        timestamp_formats=formats,
        timestamp_tz_hours=timestr_to_hours(sec.get("timestamp_tz", "0")),
        renames=renames,
        static_fields=static_fields,
        exclusion_rules=rules,
        index_name=sec.get("index_name", "log"),
        index_rotation=sec.get("index_rotation", "monthly"),
        index_suffix=sec.get("index_suffix", ""),
        index_tz_hours=timestr_to_hours(sec.get("index_tz", "0")),
        index_time=sec.get("index_time", "@timestamp"),
        json_delimiter=sec.get("json_delimiter") or None,
    )


def load_etl_configs(base_path: str, *overlay_paths: str
                     ) -> dict[str, EtlConfig]:
    """-> {logtype: EtlConfig} for every non-DEFAULT section."""
    cp = read_ini_overlay(base_path, *overlay_paths)
    return {name: section_to_etl_config(name, cp[name])
            for name in cp.sections()}
