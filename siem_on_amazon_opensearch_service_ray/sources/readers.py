"""File-envelope readers (SURVEY.md S5, S7, S12-S14).

Parquet/CSV/JSON/text files are read natively by ``ray.data``; what the
reference adds on top are *envelope* semantics, reproduced here as
batch transforms:

- ``parse_concatenated_json``: a single line holding several
  concatenated JSON objects -> list of dicts (reference raw_decode
  loop, siem/fileformat_json.py:20-56);
- ``explode_json_records``: a ``json_delimiter`` key whose value is a
  record array explodes into one row per element (reference CloudTrail
  ``Records`` handling, siem/fileformat_json.py:57-89), with envelope
  metadata carried onto every exploded row (reference CloudWatch-Logs
  owner/loggroup/logstream propagation, siem/__init__.py:290-338);
- ``group_multiline``: a first-line regex groups physical lines into
  logical records (reference siem/fileformat_multiline.py:20-121) —
  needs per-file ordering, so run it per input file (one block per
  file), as SURVEY.md S7 notes.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa


def parse_concatenated_json(line: str) -> list[dict]:
    """Split concatenated JSON objects on one line.

    >>> parse_concatenated_json('{"a": 1}{"b": 2}')
    [{'a': 1}, {'b': 2}]
    """
    dec = json.JSONDecoder()
    out: list[dict] = []
    idx = 0
    line = line.strip()
    while idx < len(line):
        obj, end = dec.raw_decode(line, idx)
        out.append(obj)
        idx = end
        while idx < len(line) and line[idx] in " \n\r\t,":
            idx += 1
    return out


def explode_json_records(batch: pa.Table, json_col: str,
                         delimiter_key: str | None = None,
                         meta_keys: tuple[str, ...] = ()) -> pa.Table:
    """map_batches stage: JSON strings -> one row per record.

    Each input row may hold several concatenated JSON objects; each
    object may hold a ``delimiter_key`` record array that explodes
    (CloudTrail ``Records``). ``meta_keys`` are envelope fields copied
    onto every exploded row (CWL owner/loggroup/logstream parity)."""
    rows: list[dict] = []
    for s in batch.column(json_col).to_pylist():
        if not s:
            continue
        for obj in parse_concatenated_json(s):
            meta = {k: obj.get(k) for k in meta_keys}
            if delimiter_key and isinstance(obj.get(delimiter_key), list):
                for rec in obj[delimiter_key]:
                    if isinstance(rec, dict):
                        rows.append({**meta, **rec})
            else:
                rows.append({**meta, **{k: v for k, v in obj.items()
                                        if k not in meta}})
    if not rows:
        return pa.table({"record": pa.array([], pa.string())})
    keys = sorted({k for r in rows for k in r})
    return pa.table({
        k: pa.array([_to_cell(r.get(k)) for r in rows]) for k in keys})


def _to_cell(v):
    if isinstance(v, (dict, list)):
        return json.dumps(v, sort_keys=True)
    return v


def group_multiline(lines: list[str], firstline_pattern: str) -> list[str]:
    """Physical lines -> logical records via a first-line regex.

    >>> group_multiline(["2024-01-01 a", "  cont", "2024-01-01 b"],
    ...                 r"\\d{4}-\\d{2}-\\d{2}")
    ['2024-01-01 a\\n  cont', '2024-01-01 b']
    """
    rx = re.compile(firstline_pattern)
    records: list[str] = []
    cur: list[str] = []
    for line in lines:
        if rx.match(line) and cur:
            records.append("\n".join(cur))
            cur = [line]
        elif rx.match(line):
            cur = [line]
        elif cur:
            cur.append(line)
        # leading continuation lines with no first-line yet are dropped
        # (reference skips until the first match)
    if cur:
        records.append("\n".join(cur))
    return records


def xml_to_dict(text: str) -> dict:
    """XML -> nested dict, xmltodict-shaped: attributes as ``@name``,
    text content as ``#text`` (or the value itself for leaf elements),
    repeated siblings as lists (reference fileformat_xml.py:85-86
    delegates to xmltodict; same output contract, stdlib-only).

    >>> xml_to_dict('<a x="1"><b>v</b><b>w</b></a>')
    {'a': {'@x': '1', 'b': ['v', 'w']}}
    """
    import xml.etree.ElementTree as ET

    def conv(el):
        d: dict = {f"@{k}": v for k, v in el.attrib.items()}
        children = list(el)
        text_val = (el.text or "").strip()
        if not children and not d:
            return text_val if text_val else None
        for c in children:
            tag = c.tag.split("}", 1)[-1]          # strip xmlns
            v = conv(c)
            if tag in d:
                if not isinstance(d[tag], list):
                    d[tag] = [d[tag]]
                d[tag].append(v)
            else:
                d[tag] = v
        if text_val:
            d["#text"] = text_val
        return d

    root = ET.fromstring(text)
    return {root.tag.split("}", 1)[-1]: conv(root)}


class XmlMultilineReader:
    """S8: generic XML log reader — a first-line regex groups physical
    lines into one XML document per record (reference
    fileformat_xml.py:22-83: ``<Event xmlns=`` default, configurable
    ``multiline_firstline``), each parsed to a dict carried as JSON.
    Unparseable records keep the raw text with a ``parse_error``
    sentinel instead of dying (error-sentinel contract, M1)."""

    def __init__(self, firstline_pattern: str = r"<Event xmlns=",
                 encoding: str = "utf-8"):
        self.pattern = firstline_pattern
        self.encoding = encoding

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_path, out_raw, out_json, out_err = [], [], [], []
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names else [None] * batch.num_rows)
        for raw, path in zip(batch.column("bytes").to_pylist(), paths):
            text = raw.decode(self.encoding, errors="ignore")
            for rec in group_multiline(text.splitlines(), self.pattern):
                out_path.append(path)
                out_raw.append(rec)
                try:
                    out_json.append(json.dumps(xml_to_dict(rec),
                                               sort_keys=True))
                    out_err.append(None)
                except Exception as e:           # noqa: BLE001
                    out_json.append(None)
                    out_err.append(f"parse_error: {e}")
        return pa.table({"path": pa.array(out_path, pa.string()),
                         "record": pa.array(out_raw, pa.string()),
                         "record_json": pa.array(out_json, pa.string()),
                         "parse_error": pa.array(out_err, pa.string())})


# --- S13 Firelens envelope + M7 ECS cloud-context fill ---------------------

_FIRELENS_META = ("container_id", "container_name", "ecs_cluster",
                  "ecs_task_arn", "ecs_task_definition", "ec2_instance_id")


def ecs_cloud_context(meta: dict) -> dict:
    """M7: derive cloud.* / container.* from Firelens ECS metadata —
    the task ARN's 4th/5th ``:`` segments are region and account id
    (reference siem/__init__.py:817-827).

    >>> ecs_cloud_context({"ecs_task_arn":
    ...     "arn:aws:ecs:ap-northeast-1:123456789012:task/c1/abc",
    ...     "container_id": "c0ffee", "container_name": "app"})["cloud.region"]
    'ap-northeast-1'
    """
    out: dict = {}
    arn = meta.get("ecs_task_arn")
    if arn:
        parts = str(arn).split(":")
        if len(parts) > 4:
            out["cloud.region"] = parts[3]
            out["cloud.account.id"] = parts[4]
        if meta.get("ec2_instance_id"):
            out["cloud.instance.id"] = meta["ec2_instance_id"]
        out["container.id"] = meta.get("container_id")
        out["container.name"] = meta.get("container_name")
    return out


class FirelensReader:
    """S13: dedicated Firelens envelope extraction — each line is a
    Firelens JSON wrapper; container/ECS metadata moves to columns, the
    inner ``log`` payload becomes the record, stderr lines are marked
    ignored when ``ignore_stderr`` (reference
    siem/__init__.py:340-383 ``extract_firelens_log``), and the M7
    cloud-context columns are filled from the task ARN."""

    def __init__(self, line_col: str = "text", ignore_stderr: bool = False):
        self.line_col = line_col
        self.ignore_stderr = ignore_stderr

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: list[dict] = []
        for line in batch.column(self.line_col).to_pylist():
            if not line or not line.strip():
                continue
            try:
                obj = json.loads(line.strip())
            except ValueError:
                rows.append({"log": line, "__skip_normalization": True,
                             "__error_message": "invalid firelens json"})
                continue
            r = {k: obj.get(k) for k in _FIRELENS_META}
            r["container_source"] = obj.get("source")
            r["log"] = obj.get("log")
            if r["container_source"] == "stderr" and self.ignore_stderr:
                r["is_ignored"] = True
                r["ignored_reason"] = "log is container's stderr"
            r.update(ecs_cloud_context(r))
            rows.append(r)
        if not rows:
            return pa.table({"log": pa.array([], pa.string())})
        keys = sorted({k for r in rows for k in r})
        return pa.table({k: pa.array([_to_cell(r.get(k)) for r in rows])
                         for k in keys})


class MultilineReader:
    """map_batches stage over ``read_binary_files`` output: one file per
    row (``bytes`` column), grouped into logical records. Keeping the
    whole file in one row preserves ordering — S7's requirement."""

    def __init__(self, firstline_pattern: str, encoding: str = "utf-8"):
        self.pattern = firstline_pattern
        self.encoding = encoding

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_path, out_rec = [], []
        paths = (batch.column("path").to_pylist()
                 if "path" in batch.column_names else [None] * batch.num_rows)
        for raw, path in zip(batch.column("bytes").to_pylist(), paths):
            text = raw.decode(self.encoding, errors="ignore")
            for rec in group_multiline(text.splitlines(), self.pattern):
                out_path.append(path)
                out_rec.append(rec)
        return pa.table({"path": pa.array(out_path, pa.string()),
                         "record": pa.array(out_rec, pa.string())})
