"""File-envelope handling: MIME sniff + decompress, CSV header
normalization, Windows-event XML, EventBridge strip (SURVEY.md S2, S6,
S9, S14).

The reference sniffs magic bytes and decompresses gzip/zip/bzip2 before
parsing (reference: siem/utils.py:913-927, siem/__init__.py:385-446);
here that is a ``map_batches`` stage over ``read_binary_files`` rows.
"""

from __future__ import annotations

import bz2
import gzip
import io
import re
import zipfile

import pyarrow as pa

_MAGIC = [
    (b"\x1f\x8b", "gzip"),
    (b"BZh", "bzip2"),
    (b"PK\x03\x04", "zip"),
    (b"PAR1", "parquet"),
]


def sniff_mime(head: bytes) -> str:
    """Magic-byte detection (reference siem/utils.py:913-927)."""
    for magic, name in _MAGIC:
        if head.startswith(magic):
            return name
    return "text"


def decompress(raw: bytes) -> bytes:
    """Decompress by sniffed type; double-archive detection like the
    reference (a gzip inside a zip is unwrapped twice,
    siem/__init__.py:403-446)."""
    for _ in range(3):  # bounded double-archive unwrap
        kind = sniff_mime(raw[:8])
        if kind == "gzip":
            raw = gzip.decompress(raw)
        elif kind == "bzip2":
            raw = bz2.decompress(raw)
        elif kind == "zip":
            with zipfile.ZipFile(io.BytesIO(raw)) as z:
                names = z.namelist()
                raw = z.read(names[0]) if names else b""
        else:
            return raw
    return raw


class DecompressLines:
    """map_batches over read_binary_files(include_paths=True) output:
    sniff + decompress + utf-8 (errors ignored, reference parity) +
    line split with optional header skip (S4 text_header_line_number,
    reference siem/fileformat_text.py:19-58)."""

    def __init__(self, header_lines: int = 0, encoding: str = "utf-8"):
        self.header_lines = header_lines
        self.encoding = encoding

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_path, out_line = [], []
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names else [None] * batch.num_rows)
        for raw, path in zip(batch.column("bytes").to_pylist(), paths):
            if raw is None or len(raw) < 20:   # reference size guard (<20 B)
                continue
            text = decompress(raw).decode(self.encoding, errors="ignore")
            for line in text.splitlines()[self.header_lines:]:
                if line.strip():
                    out_path.append(path)
                    out_line.append(line)
        return pa.table({"path": pa.array(out_path, pa.string()),
                         "line": pa.array(out_line, pa.string())})


def sanitize_csv_headers(names: list[str]) -> list[str]:
    """CSV header normalization: '-' -> '_' (reference
    fileformat_csv.py:22-115 header handling + M14 key sanitize)."""
    return [n.strip().replace("-", "_") for n in names]


# --- Windows event XML (S9) ------------------------------------------------

_EVENT_RE = re.compile(rb"<Event [^>]*>.*?</Event>", re.DOTALL)
_CTRL_RE = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")


def split_win_events(raw: bytes) -> list[str]:
    """Scan ``<Event ...>...</Event>`` blocks out of an export
    (reference siem/fileformat_winevtxml.py:57-166)."""
    return [_CTRL_RE.sub("", m.group(0).decode("utf-8", errors="ignore"))
            for m in _EVENT_RE.finditer(raw)]


def parse_win_event(xml_text: str) -> dict:
    """One event XML -> flat dict: System fields + EventData name/value
    pairs folded to a dict (reference EventData list->dict handling,
    fileformat_winevtxml.py:100-140); EventID qualifier attribute is
    dropped in favor of the text value (qualifier unwrap parity)."""
    import xml.etree.ElementTree as ET
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError:
        return {}
    ns = ""
    if root.tag.startswith("{"):
        ns = root.tag[: root.tag.index("}") + 1]
    out: dict = {}
    sysel = root.find(f"{ns}System")
    if sysel is not None:
        for child in sysel:
            tag = child.tag.replace(ns, "")
            if tag == "EventID":
                out["event_id"] = (child.text or "").strip()
            elif tag == "TimeCreated":
                out["time_created"] = child.get("SystemTime")
            elif child.text and child.text.strip():
                out[tag.lower()] = child.text.strip()
    data = root.find(f"{ns}EventData")
    if data is not None:
        for d in data:
            name = d.get("Name")
            if name:
                out[f"data_{name}"] = d.text
    return out


# --- EventBridge envelope (S14) -------------------------------------------


def strip_eventbridge(obj: dict) -> dict:
    """CloudWatch-Event envelope: promote ``detail`` and keep the
    envelope metadata under dedicated keys (reference
    fileformat_json.py:112-125)."""
    detail = obj.get("detail")
    if not isinstance(detail, dict):
        return obj
    meta = {f"cwe_{k}": v for k, v in obj.items()
            if k in ("id", "account", "region", "source", "time",
                     "detail-type")}
    return {**meta, **detail}
