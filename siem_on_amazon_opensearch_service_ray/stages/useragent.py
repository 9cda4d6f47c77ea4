"""User-agent parsing (SURVEY.md T4).

The reference wraps the ua_parser regex database with an lru_cache
(reference: siem/user_agent.py:22-54).  That library isn't in this
container, so this is a compact from-scratch matcher covering the major
families — the *mechanism* parity (compiled patterns held in actor
state, per-value memo cache) is what the engine exercises; the pattern
table is intentionally small and easily extended.
"""

from __future__ import annotations

import re

import pyarrow as pa

# ordered: first match wins
_BROWSERS = [
    ("Edge", re.compile(r"Edg(?:e|A|iOS)?/(\d+)")),
    ("Opera", re.compile(r"OPR/(\d+)|Opera/(\d+)")),
    ("Chrome", re.compile(r"Chrome/(\d+)")),
    ("Firefox", re.compile(r"Firefox/(\d+)")),
    ("Safari", re.compile(r"Version/(\d+).*Safari/")),
    ("IE", re.compile(r"MSIE (\d+)|Trident/.*rv:(\d+)")),
    ("curl", re.compile(r"curl/(\d+)")),
    ("python-requests", re.compile(r"python-requests/(\d+)")),
    ("aws-sdk", re.compile(r"aws-sdk-\w+/(\d+)")),
    ("Googlebot", re.compile(r"Googlebot/(\d+)")),
]
_OSES = [
    ("Windows", re.compile(r"Windows NT (\d+\.\d+)")),
    ("iOS", re.compile(r"iPhone OS (\d+)|CPU OS (\d+)")),
    ("macOS", re.compile(r"Mac OS X (\d+[._]\d+)")),
    ("Android", re.compile(r"Android (\d+)")),
    ("Linux", re.compile(r"Linux")),
]


def parse_user_agent(ua: str) -> dict:
    """-> {ua_name, ua_version, ua_os, ua_os_version, ua_device}.

    >>> parse_user_agent("Mozilla/5.0 (Windows NT 10.0; Win64; x64) "
    ...                  "AppleWebKit/537.36 (KHTML, like Gecko) "
    ...                  "Chrome/120.0.0.0 Safari/537.36")["ua_name"]
    'Chrome'
    """
    out = {"ua_name": "Other", "ua_version": None, "ua_os": "Other",
           "ua_os_version": None, "ua_device": "Other"}
    if not ua:
        return out
    for name, rx in _BROWSERS:
        m = rx.search(ua)
        if m:
            out["ua_name"] = name
            out["ua_version"] = next((g for g in m.groups() if g), None)
            break
    for name, rx in _OSES:
        m = rx.search(ua)
        if m:
            out["ua_os"] = name
            groups = [g for g in m.groups() if g] if m.groups() else []
            out["ua_os_version"] = groups[0].replace("_", ".") if groups else None
            break
    if "Mobile" in ua or "iPhone" in ua or "Android" in ua:
        out["ua_device"] = "Mobile"
    elif "bot" in ua.lower() or "spider" in ua.lower():
        out["ua_device"] = "Bot"
    elif out["ua_name"] != "Other":
        out["ua_device"] = "Desktop"
    return out


class UserAgentEnrich:
    """Actor-pool stage: patterns compiled at import, per-value memo
    cache in actor state (reference lru_cache(1e5) parity)."""

    def __init__(self, ua_column: str = "user_agent"):
        self.ua_column = ua_column
        self._cache: dict[str, dict] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = []
        for ua in batch.column(self.ua_column).to_pylist():
            key = ua or ""
            r = self._cache.get(key)
            if r is None:
                r = parse_user_agent(key)
                if len(self._cache) < 100_000:
                    self._cache[key] = r
            rows.append(r)
        out = batch
        for k in ("ua_name", "ua_version", "ua_os", "ua_os_version",
                  "ua_device"):
            out = out.append_column(k, pa.array([r[k] for r in rows],
                                                pa.string()))
        return out
