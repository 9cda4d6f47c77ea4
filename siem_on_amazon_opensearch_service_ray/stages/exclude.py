"""Record-exclusion operators (SURVEY.md F1-F6).

Reference semantics:
- s3-key / own-log / CSV-driven exclusion are (field, regex,
  pattern-type) rules over nested fields (reference:
  siem/utils.py:752-810, 872-889, 1041-1099; applied
  siem/__init__.py:579-593);
- SSM condition exclusion carries an action EXCLUDE | COUNT — COUNT
  only counts matches without dropping (reference:
  siem/utils.py:670-719, siem/__init__.py:997-1033).

Our engine expresses rules over Arrow columns (dotted names are plain
column names post-flatten); a rule set compiles once per actor.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np
import pyarrow as pa


@dataclass(frozen=True)
class ExclusionRule:
    field: str
    pattern: str
    pattern_type: str = "regex"       # "regex" | "text" (exact), reference CSV column
    action: str = "EXCLUDE"           # "EXCLUDE" | "COUNT"


class Excluder:
    """map_batches actor: apply exclusion rules; EXCLUDE rules drop
    matching rows, COUNT rules annotate a ``_counted`` column (the
    reference increments a counter and keeps the record — A6)."""

    def __init__(self, rules: list[ExclusionRule]):
        self.rules = []
        for r in rules:
            if r.pattern_type == "text":
                rx = re.compile(re.escape(r.pattern) + r"\Z")
            else:
                rx = re.compile(r.pattern)
            self.rules.append((r, rx))

    def _matches(self, batch: pa.Table, rule: ExclusionRule,
                 rx: re.Pattern) -> np.ndarray:
        if rule.field not in batch.column_names:
            return np.zeros(batch.num_rows, dtype=bool)
        vals = batch.column(rule.field).to_pylist()
        return np.array([v is not None and rx.match(str(v)) is not None
                         for v in vals], dtype=bool)

    def __call__(self, batch: pa.Table) -> pa.Table:
        drop = np.zeros(batch.num_rows, dtype=bool)
        counted = np.zeros(batch.num_rows, dtype=bool)
        for rule, rx in self.rules:
            m = self._matches(batch, rule, rx)
            if rule.action == "COUNT":
                counted |= m
            else:
                drop |= m
        out = batch.filter(pa.array(~drop))
        return out.append_column("_counted", pa.array(counted[~drop]))


@dataclass(frozen=True)
class ExclusionCondition:
    """JMESPath EXCLUDE|COUNT condition (reference F4: SSM
    ``/siem/exclude-logs/<logtype>/<name>`` parameters holding
    ``{"expression": <jmespath>, "action": "EXCLUDE"|"COUNT"}``,
    siem/utils.py:670-719)."""
    name: str
    expression: str
    action: str = "EXCLUDE"


def parse_exclusion_conditions(params: dict[str, str]
                               ) -> dict[str, list[ExclusionCondition]]:
    """{(logtype/name): json-string} -> {logtype: [conditions]},
    mirroring the reference's validation: names need a logtype prefix,
    values must be JSON with ``action`` + ``expression``, ``disable``
    skips, uncompilable expressions and unknown actions are dropped
    (reference siem/utils.py:670-719)."""
    import json as _json

    import jmespath
    out: dict[str, list[ExclusionCondition]] = {}
    for name, raw in params.items():
        if "/" not in name:
            continue
        try:
            p = _json.loads(raw)
        except ValueError:
            continue
        if "action" not in p or "expression" not in p:
            continue
        action = str(p["action"]).lower()
        if action == "disable":
            continue
        if action not in ("exclude", "count"):
            continue
        try:
            jmespath.compile(p["expression"])
        except Exception:
            continue
        logtype = name.split("/")[0]
        out.setdefault(logtype, []).append(ExclusionCondition(
            name=name, expression=p["expression"], action=action.upper()))
    return out


class ConditionExcluder:
    """map_batches actor: evaluate compiled JMESPath conditions per
    record (rows -> nested dicts, so dotted/nested expressions see the
    reference's document shape).  EXCLUDE conditions drop matches,
    COUNT conditions keep them and mark ``_counted`` (reference
    siem/__init__.py:997-1033 counts without dropping)."""

    def __init__(self, conditions: list[ExclusionCondition]):
        import jmespath
        self.compiled = [(c, jmespath.compile(c.expression))
                         for c in conditions]

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        drop = np.zeros(len(rows), dtype=bool)
        counted = np.zeros(len(rows), dtype=bool)
        for i, doc in enumerate(rows):
            for cond, expr in self.compiled:
                if expr.search(doc):
                    if cond.action == "COUNT":
                        counted[i] = True
                    else:
                        drop[i] = True
                        break
        out = batch.filter(pa.array(~drop))
        return out.append_column("_counted", pa.array(counted[~drop]))


def match_exclusion(doc: dict, rules: list[ExclusionRule]) -> bool:
    """Dict-level twin for reference-doctest parity
    (siem/utils.py:1041-1099 nested-field matching).

    >>> from siem_on_amazon_opensearch_service_ray.stages.cleanup import get_dotted
    >>> r = ExclusionRule('user.name', 'svc-.*')
    >>> match_exclusion({'user': {'name': 'svc-backup'}}, [r])
    True
    >>> match_exclusion({'user': {'name': 'alice'}}, [r])
    False
    """
    from .cleanup import get_dotted
    for r in rules:
        v = get_dotted(doc, r.field)
        if v is None:
            continue
        if r.pattern_type == "text":
            if str(v) == r.pattern:
                return True
        elif re.match(r.pattern, str(v)):
            return True
    return False
