"""IOC feed normalization (W4): TXT adjacency merge, STIX2 pattern
extraction, built-ins, dedup, and end-to-end enrichment."""

import json

import pyarrow as pa

from siem_on_amazon_opensearch_service_ray.stages import enrich, ioc_feeds


def test_txt_feed_adjacent_merge():
    rows = ioc_feeds.parse_txt_feed(
        ["10.0.0.0/25", "10.0.0.128/25",      # adjacent -> merge
         "10.0.2.0/24",                        # gap -> new interval
         "192.0.2.1",                          # single host
         "garbage-line", "",                   # skipped
         "2001:db8::/64"],                     # v6 separate
        provider="custom", name="feed.txt", modified="2026-01-01T00:00:00Z")
    v4 = [r for r in rows if r["type"] == "ipv4-addr"]
    v6 = [r for r in rows if r["type"] == "ipv6-addr"]
    assert len(v4) == 3 and len(v6) == 1
    merged = v4[0]
    assert merged["start"] == int.from_bytes(bytes([10, 0, 0, 0]), "big")
    assert merged["end"] == int.from_bytes(bytes([10, 0, 0, 255]), "big")


def test_stix2_feed_parse_and_invalid():
    bundle = {
        "type": "bundle", "id": "bundle--1",
        "objects": [
            {"type": "indicator", "name": "bad-ip",
             "pattern": "[ipv4-addr:value = '203.0.113.5']",
             "modified": "2026-02-03T04:05:06Z"},
            {"type": "indicator",
             "pattern": "[ipv6-addr:value = '2001:db8::/64']"},
            {"type": "indicator", "name": "evil-domain",
             "pattern": "[domain-name:value = 'evil.example.com']"},
            {"type": "indicator",
             "pattern": "[url:value = 'http://x.example']"},     # ignored
            {"type": "malware"},                                 # no pattern
        ],
    }
    ips, doms = ioc_feeds.parse_stix2_feed(json.dumps(bundle),
                                           provider="custom",
                                           feed_name="feed.json")
    assert len(ips) == 2 and len(doms) == 1
    assert ips[0]["name"] == "feed.json: bad-ip"
    assert ips[0]["modified"] == "2026-02-03T04:05:06Z"
    assert doms[0]["domain"] == "evil.example.com"
    # invalid bundles raise (builder skips them)
    import pytest
    with pytest.raises(ValueError):
        ioc_feeds.parse_stix2_feed('{"no": "objects"}', "c", "f")


def test_build_ioc_database_end_to_end():
    table, domains = ioc_feeds.build_ioc_database(
        txt_feeds=[("feed.txt", ["198.51.100.0/24"])],
        stix2_feeds=[("feed.json", json.dumps({
            "id": "b--1", "objects": [
                {"type": "indicator", "name": "c2",
                 "pattern": "[ipv4-addr:value = '203.0.113.7']"},
                {"type": "indicator",
                 "pattern": "[domain-name:value = 'c2.example.net']"}],
        })), ("broken.json", "not json")])
    # built-ins present: IMDS lookup hits
    labels = enrich.interval_lookup(table, ["169.254.169.254",
                                            "198.51.100.9", "203.0.113.7",
                                            "8.8.8.8"])
    assert labels == ["IMDS", "feed.txt", "feed.json: c2", None]
    assert domains == {"c2.example.net": "feed.json"}
    # metadata columns ride along for GeoIP-shaped output
    idx = enrich.interval_match_indices(table, ["198.51.100.9"])
    assert table["meta_cols"]["provider"][idx[0]] == "custom"


def test_ioc_enrich_stage_with_feed_table(ray_session):
    table, _ = ioc_feeds.build_ioc_database(
        txt_feeds=[("bots.txt", ["203.0.113.0/24"])])
    batch = pa.table({"src_ip": ["203.0.113.10", "192.0.2.1", None]})
    out = enrich.IntervalEnrich(table, "src_ip", "threat_name")(batch)
    assert out.column("threat_name").to_pylist() == ["bots.txt", None, None]
