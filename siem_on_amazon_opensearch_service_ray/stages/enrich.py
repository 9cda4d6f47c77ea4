"""Enrichment operators (SURVEY.md T1-T5): broadcast-small-side lookups
inside actor-pool ``map_batches`` stages — the Ray-native form of the
reference's worker-local GeoIP / IOC / trusted-proxy / EventID state
(reference: siem/geodb.py:24-137, siem/ioc.py:26-257, siem/xff.py:27-218,
siem/fileformat_winevtxml.py:26-54).

The reference holds a SQLite ``:memory:`` copy per worker and does
point-in-interval range queries per record; we broadcast the (small)
dimension table once with ``ray.put`` and do a vectorized
``np.searchsorted`` interval probe per batch — no shuffle, no
per-record Python (SURVEY.md §2.5 mapping).
"""

from __future__ import annotations

import ipaddress

import numpy as np
import pyarrow as pa

import ray


def ip_to_int(ip: str) -> int | None:
    """Dotted/colon IP -> int (reference siem/ioc.py:167-214 encodes
    IPv4 and 3-way-split IPv6 the same way conceptually; we keep one
    128-bit int and truncate IPv4 into the low 32 bits)."""
    try:
        return int(ipaddress.ip_address(ip))
    except ValueError:
        return None


def build_interval_table(cidrs: list[tuple[str, str]]) -> dict:
    """[(cidr, label)] -> sorted interval arrays for broadcast.
    Returns dict(starts, ends, labels) with starts ascending."""
    rows = []
    for cidr, label in cidrs:
        net = ipaddress.ip_network(cidr, strict=False)
        rows.append((int(net.network_address), int(net.broadcast_address), label))
    rows.sort()
    return {
        "starts": np.array([r[0] for r in rows], dtype=object),
        "ends": np.array([r[1] for r in rows], dtype=object),
        "labels": [r[2] for r in rows],
    }


def interval_lookup(table: dict, ips: list[str]) -> list[str | None]:
    """Vectorized point-in-interval probe (binary search per batch —
    the IOC/GeoIP range query, reference siem/ioc.py:216-257)."""
    starts = table["starts"]
    out: list[str | None] = []
    for ip in ips:
        v = ip_to_int(ip) if ip else None
        if v is None or len(starts) == 0:
            out.append(None)
            continue
        j = int(np.searchsorted(starts, v, side="right")) - 1
        if j >= 0 and table["ends"][j] >= v:
            out.append(table["labels"][j])
        else:
            out.append(None)
    return out


class IntervalEnrich:
    """Actor-pool stage: label rows whose ``ip_column`` falls in a
    broadcast CIDR interval table (GeoIP/IOC/trusted-proxy analogue).

    ``table_ref`` is a ``ray.put`` handle — shipped once per actor,
    never per batch."""

    def __init__(self, table_ref, ip_column: str, out_column: str):
        self.table = ray.get(table_ref) if isinstance(
            table_ref, ray.ObjectRef) else table_ref
        self.ip_column = ip_column
        self.out_column = out_column
        self._cache: dict[str, str | None] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = batch.column(self.ip_column).to_pylist()
        labels = []
        for ip in ips:
            if ip in self._cache:     # lru-cache parity (reference 1e6 cache)
                labels.append(self._cache[ip])
            else:
                lab = interval_lookup(self.table, [ip])[0]
                if len(self._cache) < 1_000_000:
                    self._cache[ip] = lab
                labels.append(lab)
        return batch.append_column(self.out_column, pa.array(labels, pa.string()))


class DictEnrich:
    """Actor-pool stage: exact-match lookup against a broadcast dict
    (reference T5, Windows EventID TSV -> dict at import,
    fileformat_winevtxml.py:26-54)."""

    def __init__(self, mapping_ref, key_column: str, out_column: str,
                 default=None):
        self.mapping = ray.get(mapping_ref) if isinstance(
            mapping_ref, ray.ObjectRef) else mapping_ref
        self.key_column = key_column
        self.out_column = out_column
        self.default = default

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key_column).to_pylist()
        vals = [self.mapping.get(k, self.default) for k in keys]
        return batch.append_column(self.out_column, pa.array(vals))


def resolve_xff(hops: list[str], trusted: dict) -> str | None:
    """Walk an X-Forwarded-For chain right-to-left to the first
    untrusted hop (reference siem/xff.py:27-218 semantics).

    >>> t = build_interval_table([("10.0.0.0/8", "trusted")])
    >>> resolve_xff(["203.0.113.7", "10.1.2.3", "10.9.9.9"], t)
    '203.0.113.7'
    >>> resolve_xff(["10.1.2.3"], t) is None
    True
    """
    for hop in reversed(hops):
        if interval_lookup(trusted, [hop])[0] is None:
            return hop
    return None
