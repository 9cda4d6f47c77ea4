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
