"""Field extraction operators (SURVEY.md M1, M9, S10; §2.9 net helpers).

- ``RegexExtract``: named-group log-pattern extraction with the
  reference's error-sentinel semantics (reference:
  siem/fileformat_text.py:60-80 — a non-matching line yields a
  ``regex_error`` marker and is counted, not fatal).
- ``parse_cef``: CEF header split + key=value extension parsing with
  ``*Label`` custom-field renaming (reference: siem/fileformat_cef.py:24-75).
- ``parse_request_line``: HTTP request line -> url.* parts with double
  url-decode (reference: siem/utils.py:207-289).
- ``parse_xff``: X-Forwarded-For list split (reference:
  siem/utils.py:292-302).

All operators are vectorized per batch with compiled patterns held in
actor state (``__init__``), per SURVEY.md §7.3.
"""

from __future__ import annotations

import re
from urllib.parse import unquote

import pyarrow as pa

REGEX_ERROR_SENTINEL = "__regex_error__"


class RegexExtract:
    """map_batches actor: extract named groups from a text column.

    Non-matching rows get null fields plus a ``_parse_error`` flag; the
    per-batch error count mirrors the reference's suppressed-after-10
    counter semantics (we keep all rows + a flag, so downstream can
    filter or count — A6 COUNT parity).
    """

    def __init__(self, pattern: str, column: str = "line",
                 drop_errors: bool = False):
        self.re = re.compile(pattern)
        self.column = column
        self.drop_errors = drop_errors
        self.group_names = list(self.re.groupindex.keys())

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.column).to_pylist()
        cols: dict[str, list] = {g: [] for g in self.group_names}
        errors: list[bool] = []
        for t in texts:
            m = self.re.match(t) if t is not None else None
            if m:
                d = m.groupdict()
                for g in self.group_names:
                    cols[g].append(d.get(g))
                errors.append(False)
            else:
                for g in self.group_names:
                    cols[g].append(None)
                errors.append(True)
        out = batch
        for g in self.group_names:
            out = out.append_column(g, pa.array(cols[g], pa.string()))
        out = out.append_column("_parse_error", pa.array(errors, pa.bool_()))
        if self.drop_errors:
            out = out.filter(pa.compute.invert(out.column("_parse_error")))
        return out


_CEF_HEADER_FIELDS = ["cef_version", "device_vendor", "device_product",
                      "device_version", "signature_id", "name", "severity"]
_CEF_EXT_RE = re.compile(r"(?P<key>[\w.]+)=(?P<val>.*?)(?=\s+[\w.]+=|\s*$)")


def parse_cef(line: str) -> dict:
    """One CEF line -> flat dict (header fields + extensions, with
    ``xxxLabel`` pairs renamed to their label, reference parity)."""
    if not line.startswith("CEF:"):
        return {}
    parts = line[4:].split("|", 7)
    out = dict(zip(_CEF_HEADER_FIELDS, parts[:7]))
    ext = parts[7] if len(parts) > 7 else ""
    kv = {m.group("key"): m.group("val") for m in _CEF_EXT_RE.finditer(ext)}
    # custom-field renaming: cs1 + cs1Label=Foo -> Foo: <cs1>
    for key in [k for k in kv if k.endswith("Label")]:
        base = key[:-5]
        if base in kv:
            kv[kv.pop(key)] = kv.pop(base)
    out.update(kv)
    return out


class CefExtract:
    """map_batches actor wrapping parse_cef over a text column."""

    def __init__(self, column: str = "line"):
        self.column = column

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [parse_cef(t or "") for t in batch.column(self.column).to_pylist()]
        keys = sorted({k for r in rows for k in r})
        out = batch
        for k in keys:
            out = out.append_column(
                f"cef_{k}", pa.array([r.get(k) for r in rows], pa.string()))
        return out


def parse_request_line(request: str) -> dict:
    """``GET /a/b?x=1#f HTTP/1.1`` -> url parts (reference
    siem/utils.py:207-289: method/path/version split, double urldecode,
    extension from last path segment)."""
    out: dict[str, str | None] = {
        "method": None, "url_original": None, "url_path": None,
        "url_query": None, "url_fragment": None, "url_extension": None,
        "http_version": None,
    }
    if not request:
        return out
    parts = request.split(" ")
    if len(parts) >= 2:
        out["method"] = parts[0]
        raw = parts[1]
        if len(parts) >= 3 and parts[2].startswith("HTTP/"):
            out["http_version"] = parts[2][5:]
    else:
        raw = parts[0]
    raw = unquote(unquote(raw))  # double-decode, reference parity
    out["url_original"] = raw
    path = raw
    if "#" in path:
        path, out["url_fragment"] = path.split("#", 1)
    if "?" in path:
        path, out["url_query"] = path.split("?", 1)
    out["url_path"] = path
    last = path.rsplit("/", 1)[-1]
    if "." in last:
        out["url_extension"] = last.rsplit(".", 1)[-1].lower()
    return out


def parse_xff(value: str) -> list[str]:
    """X-Forwarded-For -> hop list (reference siem/utils.py:292-302)."""
    if not value:
        return []
    return [p.strip() for p in value.split(",") if p.strip()]
