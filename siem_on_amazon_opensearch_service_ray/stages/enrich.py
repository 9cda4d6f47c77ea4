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


def _ip_key(ip: str) -> bytes | None:
    """IP string -> 16-byte big-endian key (IPv4 mapped into the low 32
    bits).  Big-endian fixed width makes byte-lexicographic order equal
    numeric order, so numpy 'S16' arrays binary-search correctly —
    the hi/lo-split the reference does for IPv6 (siem/ioc.py:167-214),
    collapsed into one sortable key."""
    try:
        return int(ipaddress.ip_address(ip)).to_bytes(16, "big")
    except ValueError:
        return None


def build_interval_table(cidrs: list[tuple[str, str]],
                         meta: list[dict] | None = None) -> dict:
    """[(cidr, label)] -> sorted interval arrays for broadcast.
    ``meta`` optionally carries one dict of extra attributes per cidr
    (GeoIP city/asn shape); they become parallel object arrays taken by
    matched interval index.  Returns dict(starts_b, ends_b, labels,
    meta_cols) with starts ascending."""
    rows = []
    for i, (cidr, label) in enumerate(cidrs):
        net = ipaddress.ip_network(cidr, strict=False)
        rows.append((int(net.network_address).to_bytes(16, "big"),
                     int(net.broadcast_address).to_bytes(16, "big"),
                     label, (meta[i] if meta else None)))
    rows.sort(key=lambda r: r[0])
    meta_cols: dict[str, np.ndarray] = {}
    if meta:
        keys = sorted({k for r in rows for k in (r[3] or {})})
        for k in keys:
            meta_cols[k] = np.array([(r[3] or {}).get(k) for r in rows],
                                    dtype=object)
    return {
        "starts_b": np.array([r[0] for r in rows], dtype="S16"),
        "ends_b": np.array([r[1] for r in rows], dtype="S16"),
        "labels": np.array([r[2] for r in rows], dtype=object),
        "meta_cols": meta_cols,
    }


_NO_MATCH = -1


def interval_match_indices(table: dict, ips: list[str | None]) -> np.ndarray:
    """Vectorized point-in-interval probe: -> int64 array of matched
    interval indices (-1 = no match).  Unique-value memoization + one
    np.searchsorted per batch — per-row Python only for parsing the
    batch's *distinct* IPs (the IOC/GeoIP range query,
    reference siem/ioc.py:216-257)."""
    starts = table["starts_b"]
    n = len(ips)
    if n == 0 or starts.size == 0:
        return np.full(n, _NO_MATCH, dtype=np.int64)
    arr = np.array(["" if ip is None else ip for ip in ips], dtype=object)
    uniq, inv = np.unique(arr.astype(str), return_inverse=True)
    keys = np.zeros(uniq.size, dtype="S16")
    valid = np.zeros(uniq.size, dtype=bool)
    for i, ip in enumerate(uniq):
        kb = _ip_key(ip) if ip else None
        if kb is not None:
            keys[i] = kb
            valid[i] = True
    j = np.searchsorted(starts, keys, side="right").astype(np.int64) - 1
    jj = np.maximum(j, 0)
    inside = (j >= 0) & valid & (table["ends_b"][jj] >= keys)
    res = np.where(inside, j, _NO_MATCH)
    return res[inv]


def interval_lookup(table: dict, ips: list[str | None]) -> list[str | None]:
    """Label per IP (None = no interval match) — thin wrapper over
    interval_match_indices."""
    idx = interval_match_indices(table, ips)
    labels = table["labels"]
    return [None if i < 0 else labels[i] for i in idx]


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

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = batch.column(self.ip_column).to_pylist()
        idx = interval_match_indices(self.table, ips)
        labels = self.table["labels"]
        vals = [None if i < 0 else labels[i] for i in idx]
        return batch.append_column(self.out_column, pa.array(vals, pa.string()))


class GeoIpEnrich:
    """Actor-pool stage with GeoIP-shaped output: one ECS-dotted column
    per metadata attribute of the matched network (reference
    siem/geodb.py:24-137 emits city/country/asn/as_org/location from
    the MaxMind City+ASN mmdbs; here the broadcast interval table
    carries the same attributes per CIDR).  Emits e.g.
    ``source.geo.city_name``, ``source.geo.country_iso_code``,
    ``source.as.number``, ``source.as.organization.name``,
    ``source.geo.location.lat``/``.lon`` — null where unmatched."""

    def __init__(self, table_ref, ip_column: str, prefix: str = "source"):
        self.table = ray.get(table_ref) if isinstance(
            table_ref, ray.ObjectRef) else table_ref
        self.ip_column = ip_column
        self.prefix = prefix

    COLUMN_MAP = {
        "city": ("geo.city_name", pa.string()),
        "country": ("geo.country_iso_code", pa.string()),
        "lat": ("geo.location.lat", pa.float64()),
        "lon": ("geo.location.lon", pa.float64()),
        "asn": ("as.number", pa.int64()),
        "as_org": ("as.organization.name", pa.string()),
    }

    def __call__(self, batch: pa.Table) -> pa.Table:
        ips = batch.column(self.ip_column).to_pylist()
        idx = interval_match_indices(self.table, ips)
        hit = idx >= 0
        jj = np.maximum(idx, 0)
        for key, (suffix, typ) in self.COLUMN_MAP.items():
            col = self.table["meta_cols"].get(key)
            if col is None:
                continue
            vals = np.where(hit, col[jj], None)
            batch = batch.append_column(f"{self.prefix}.{suffix}",
                                        pa.array(vals.tolist(), typ))
        return batch


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
