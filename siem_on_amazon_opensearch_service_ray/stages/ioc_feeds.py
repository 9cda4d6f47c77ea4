"""IOC feed normalization (SURVEY.md W4): custom TXT / STIX 2.x threat
feeds -> the broadcast dimension tables the enrichment stages consume.

Mirrors the reference ioc-database builder's behavior
(reference: source/lambda/ioc_database/lambda_function.py):

- TXT feeds (one IP/CIDR per line): invalid lines are skipped with the
  line preserved for diagnostics; networks sort IPv4-before-IPv6 and
  ADJACENT ranges merge into one interval (lambda_function.py:1097-1180
  ``network_temp + 1 == int(ip[0])`` chain merge);
- STIX 2.x bundles: must carry ``objects`` + ``id``; only
  ipv4-addr / ipv6-addr / domain-name patterns are ingested; the
  pattern's last token is the value; object names are prefixed with
  the feed file name; first_seen/last_seen/modified normalize to UTC
  ISO (lambda_function.py:479-517, 1031-1095);
- built-in rows: the IMDS address and the documentation TEST range are
  always present (lambda_function.py:252-266);
- dedup on (provider, start, end) — the reference table's UNIQUE
  constraint.

Outputs are plain columnar dicts convertible to the enrich stage's
interval table (``to_interval_table``) or a domain exact-match dict
(``DictEnrich``) — the Ray-side join is a broadcast, never a shuffle.
"""

from __future__ import annotations

import datetime as dt
import ipaddress
import json

import numpy as np

IMDS_ADDR = int(ipaddress.ip_address("169.254.169.254"))
TEST_START, TEST_END = 2892559020, 2892559023


def _iso_utc(s: str | None) -> str | None:
    if not s:
        return None
    try:
        d = dt.datetime.fromisoformat(str(s).replace("Z", "+00:00"))
    except ValueError:
        return None
    if d.tzinfo is None:
        d = d.replace(tzinfo=dt.timezone.utc)
    return d.astimezone(dt.timezone.utc).isoformat(
        timespec="seconds").replace("+00:00", "Z")


def builtin_rows() -> list[dict]:
    return [
        {"provider": "built-in", "type": "ipv4-addr", "start": IMDS_ADDR,
         "end": IMDS_ADDR, "name": "IMDS", "modified": None},
        {"provider": "built-in", "type": "ipv4-addr", "start": TEST_START,
         "end": TEST_END, "name": "TEST", "modified": None},
    ]


def parse_txt_feed(lines: list[str], provider: str, name: str,
                   modified: str | None = None) -> list[dict]:
    """One IP/CIDR per line -> merged interval rows.  Adjacent networks
    chain-merge exactly like the reference (a sorted run whose next
    network starts at previous_end+1 extends the open interval)."""
    nets = []
    for line in lines:
        s = line.strip()
        if not s:
            continue
        try:
            nets.append(ipaddress.ip_network(s, strict=False))
        except ValueError:
            continue      # invalid line skipped (reference logs + skips)
    nets.sort(key=lambda x: (isinstance(x, ipaddress.IPv6Network),
                             int(x.network_address), int(x.broadcast_address)))
    rows: list[dict] = []
    start = end = None
    cur_v6 = False
    for net in nets:
        ns, ne = int(net.network_address), int(net.broadcast_address)
        v6 = isinstance(net, ipaddress.IPv6Network)
        if end is not None and v6 == cur_v6 and ns <= end + 1:
            end = max(end, ne)
            continue
        if end is not None:
            rows.append({"provider": provider,
                         "type": "ipv6-addr" if cur_v6 else "ipv4-addr",
                         "start": start, "end": end, "name": name,
                         "modified": modified})
        start, end, cur_v6 = ns, ne, v6
    if end is not None:
        rows.append({"provider": provider,
                     "type": "ipv6-addr" if cur_v6 else "ipv4-addr",
                     "start": start, "end": end, "name": name,
                     "modified": modified})
    return rows


def parse_stix2_feed(text: str, provider: str, feed_name: str
                     ) -> tuple[list[dict], list[dict]]:
    """STIX 2.x bundle JSON -> (ip interval rows, domain rows).
    Raises ValueError for non-STIX input (the reference probes the
    first object and skips the file)."""
    bundle = json.loads(text)
    if "objects" not in bundle or "id" not in bundle:
        raise ValueError("Invalid STIX 2.x format")
    ip_rows: list[dict] = []
    dom_rows: list[dict] = []
    for item in bundle["objects"]:
        pattern = item.get("pattern")
        if not pattern:
            continue
        value = pattern.split()[-1].rstrip("]").strip("'")
        name = (f"{feed_name}: {item['name']}" if item.get("name")
                else feed_name)
        modified = _iso_utc(item.get("modified")) or \
            _iso_utc(item.get("published"))
        common = {
            "provider": provider, "name": name, "modified": modified,
            "first_seen": _iso_utc(item.get("first_seen")),
            "last_seen": _iso_utc(item.get("last_seen")),
            "description": item.get("description"),
        }
        if "ipv4-addr:" in pattern or "ipv6-addr:" in pattern:
            try:
                net = ipaddress.ip_network(value, strict=False)
            except ValueError:
                continue
            ip_rows.append(dict(common,
                                type=("ipv6-addr"
                                      if net.version == 6 else "ipv4-addr"),
                                start=int(net.network_address),
                                end=int(net.broadcast_address)))
        elif "domain-name:value" in pattern:
            dom_rows.append(dict(common, type="domain-name", domain=value))
    return ip_rows, dom_rows


def dedup_rows(rows: list[dict]) -> list[dict]:
    """UNIQUE(provider, start, end) — first insert wins (reference's
    INSERT OR IGNORE semantics)."""
    seen: set[tuple] = set()
    out = []
    for r in rows:
        key = (r["provider"], r.get("start"), r.get("end"), r.get("domain"))
        if key in seen:
            continue
        seen.add(key)
        out.append(r)
    return out


def to_interval_table(ip_rows: list[dict]) -> dict:
    """Interval rows -> the enrich stage's broadcast table (sorted
    16-byte keys + parallel metadata arrays; see
    enrich.build_interval_table)."""
    rows = sorted(ip_rows, key=lambda r: r["start"])
    return {
        "starts_b": np.array([int(r["start"]).to_bytes(16, "big")
                              for r in rows], dtype="S16"),
        "ends_b": np.array([int(r["end"]).to_bytes(16, "big")
                            for r in rows], dtype="S16"),
        "labels": np.array([r["name"] for r in rows], dtype=object),
        "meta_cols": {
            "provider": np.array([r["provider"] for r in rows], dtype=object),
            "type": np.array([r["type"] for r in rows], dtype=object),
        },
    }


def to_domain_dict(dom_rows: list[dict]) -> dict[str, str]:
    """Domain rows -> exact-match dict for DictEnrich (first wins)."""
    out: dict[str, str] = {}
    for r in dom_rows:
        out.setdefault(r["domain"], r["name"])
    return out


def build_ioc_database(txt_feeds: list[tuple[str, list[str]]] = (),
                       stix2_feeds: list[tuple[str, str]] = ()
                       ) -> tuple[dict, dict[str, str]]:
    """Full feed-set normalization: [(name, lines)] TXT feeds +
    [(name, json_text)] STIX2 feeds -> (interval broadcast table,
    domain dict), built-ins included, (provider, range) deduped."""
    ip_rows: list[dict] = list(builtin_rows())
    dom_rows: list[dict] = []
    for name, lines in txt_feeds:
        ip_rows.extend(parse_txt_feed(lines, provider="custom", name=name))
    for name, text in stix2_feeds:
        try:
            ips, doms = parse_stix2_feed(text, provider="custom",
                                         feed_name=name)
        except (ValueError, json.JSONDecodeError):
            continue           # invalid bundle skipped (reference parity)
        ip_rows.extend(ips)
        dom_rows.extend(doms)
    return to_interval_table(dedup_rows(ip_rows)), to_domain_dict(dom_rows)
