"""Record-shaping operators (SURVEY.md M2, M3, M5, M6, M12, M13, M14,
M15): the reference LogParser's dict-surgery steps, kept as pure
dict-level functions (doctest-parity with reference siem/utils.py /
siem/__init__.py) plus columnar wrappers where they matter.
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa

from .. import MAX_TERM_BYTES

_EMPTY = ("", "-", "null")


def del_none(d: dict) -> dict:
    """Recursive removal of empty values before load (reference
    siem/__init__.py:1105-1123: '', '-', 'null', [], {}, None are all
    dropped).

    >>> del_none({'a': 1, 'b': '', 'c': '-', 'd': 'null', 'e': [],
    ...           'f': None, 'g': {'h': None}, 'i': {'j': 2}})
    {'a': 1, 'i': {'j': 2}}
    """
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            v = del_none(v)
            if v:
                out[k] = v
        elif isinstance(v, (list, tuple)):
            if len(v):
                out[k] = list(v)
        elif v is None or (isinstance(v, str) and v in _EMPTY):
            continue
        else:
            out[k] = v
    return out


def sanitize_keys(d: dict) -> dict:
    """'-' -> '_' in keys, recursive (reference siem/utils.py:1021-1038).

    >>> sanitize_keys({'a-b': {'c-d': 1}})
    {'a_b': {'c_d': 1}}
    """
    out = {}
    for k, v in d.items():
        nk = k.replace("-", "_")
        out[nk] = sanitize_keys(v) if isinstance(v, dict) else v
    return out


def rename_fields(d: dict, renames: dict[str, str]) -> dict:
    """Config-driven rename (reference siem/__init__.py:710-721:
    ``renamed_newfields``); dotted targets create nested dicts.

    >>> rename_fields({'src': '10.0.0.1'}, {'src': 'source.ip'})
    {'source': {'ip': '10.0.0.1'}}
    """
    out = dict(d)
    for old, new in renames.items():
        if old in out:
            put_dotted(out, new, out.pop(old))
    return out


def put_dotted(d: dict, path: str, value: Any) -> None:
    """Dotted-key put (reference siem/utils.py:987-1018).

    >>> x = {}; put_dotted(x, 'a.b.c', 1); x
    {'a': {'b': {'c': 1}}}
    """
    keys = path.split(".")
    cur = d
    for k in keys[:-1]:
        cur = cur.setdefault(k, {})
    cur[keys[-1]] = value


def get_dotted(d: dict, path: str, default: Any = None) -> Any:
    """Dotted-key get (reference siem/utils.py:930-960).

    >>> get_dotted({'a': {'b': {'c': 1}}}, 'a.b.c')
    1
    >>> get_dotted({'a': 1}, 'a.b', 'x')
    'x'
    """
    cur = d
    for k in path.split("."):
        if isinstance(cur, dict) and k in cur:
            cur = cur[k]
        else:
            return default
    return cur


def get_first_dotted(d: dict, paths: list[str], default: Any = None) -> Any:
    """First-non-empty of N dotted source paths (reference ECS-mapping
    lookup, siem/utils.py:962-985).

    >>> get_first_dotted({'b': {'c': 5}}, ['a.x', 'b.c'])
    5
    """
    for p in paths:
        v = get_dotted(d, p)
        if v not in (None, "", "-", "null", []):
            return v
    return default


def deep_merge(a: dict, b: dict) -> dict:
    """Rightmost-wins recursive merge (reference siem/utils.py:1102-1135).

    >>> deep_merge({'a': {'x': 1, 'y': 2}}, {'a': {'y': 3}, 'b': 4})
    {'a': {'x': 1, 'y': 3}, 'b': 4}
    """
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def project_ecs(d: dict, mapping: dict[str, list[str]],
                list_fields: frozenset[str] = frozenset()) -> dict:
    """ECS projection (reference siem/__init__.py:745-776): for each
    target key, first-non-empty of the configured source paths; list
    targets merge sorted-unique (reference ``related.ip`` assembly,
    siem/__init__.py:757-773).

    >>> project_ecs({'srcaddr': '10.0.0.2', 'dst': '10.0.0.9'},
    ...             {'source.ip': ['srcaddr'], 'destination.ip': ['dst'],
    ...              'related.ip': ['srcaddr', 'dst']},
    ...             list_fields=frozenset({'related.ip'}))
    {'source': {'ip': '10.0.0.2'}, 'destination': {'ip': '10.0.0.9'}, 'related': {'ip': ['10.0.0.2', '10.0.0.9']}}
    """
    out: dict = {}
    for target, sources in mapping.items():
        if target in list_fields:
            vals: list = []
            for p in sources:
                v = get_dotted(d, p)
                if isinstance(v, list):
                    vals.extend(v)
                elif v not in (None, "", "-", "null"):
                    vals.append(v)
            if vals:
                put_dotted(out, target, sorted(set(vals)))
        else:
            v = get_first_dotted(d, sources)
            if v is not None:
                put_dotted(out, target, v)
    return out


def stringify_mixed(d: dict, fields: list[str]) -> dict:
    """Mapping-conflict guard (reference ``json_to_text``,
    siem/__init__.py:723-743): configured fields coerced to str.

    >>> stringify_mixed({'a': {'x': 1}, 'b': 2}, ['a', 'b'])
    {'a': "{'x': 1}", 'b': '2'}
    """
    out = dict(d)
    for f in fields:
        if f in out and not isinstance(out[f], str):
            out[f] = str(out[f])
    return out


def truncate_big_fields(d: dict, limit: int = MAX_TERM_BYTES,
                        marker: str = "<<TRUNCATED>>") -> dict:
    """utf-8-safe truncation of oversized strings (reference
    siem/__init__.py:1125-1147: >32,766-byte values are cut and marked).
    """
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out[k] = truncate_big_fields(v, limit, marker)
        elif isinstance(v, str) and len(v.encode("utf-8")) > limit:
            cut = v.encode("utf-8")[: limit - len(marker.encode())]
            out[k] = cut.decode("utf-8", errors="ignore") + marker
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------------------
# columnar wrappers


def add_static_columns(batch: pa.Table, statics: dict[str, Any]) -> pa.Table:
    """M6: constants per logtype (reference siem/__init__.py:833-837)."""
    out = batch
    for k, v in statics.items():
        out = out.append_column(k, pa.array([v] * batch.num_rows))
    return out


def rename_columns(batch: pa.Table, renames: dict[str, str]) -> pa.Table:
    """M2 columnar rename."""
    return batch.rename_columns(
        [renames.get(c, c) for c in batch.column_names])


def clean_empty_strings(batch: pa.Table, columns: list[str] | None = None
                        ) -> pa.Table:
    """M12 columnar: '', '-', 'null' -> Arrow null."""
    import pyarrow.compute as pc
    out = batch
    for i, name in enumerate(out.column_names):
        if columns is not None and name not in columns:
            continue
        col = out.column(name)
        if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
            continue
        mask = pc.is_in(col, value_set=pa.array(list(_EMPTY), col.type))
        out = out.set_column(i, name, pc.if_else(mask, pa.scalar(None, col.type), col))
    return out
