"""ETL operator parity tests (FIXTURES.md F3; SURVEY.md §2.2/2.3/2.4)."""

import datetime as dt

import numpy as np
import pyarrow as pa

from siem_on_amazon_opensearch_service_ray.stages import cleanup, enrich, exclude, extract, timestamps
from siem_on_amazon_opensearch_service_ray.sources import readers


# --- M4 timestamps ---------------------------------------------------------

def test_epoch_magnitude_disambiguation():
    ts = timestamps.parse_epoch(np.array([1700000000, 1700000000000,
                                          1700000000000000]))
    # all three represent the same instant in s/ms/us
    assert ts[0] == ts[1] == ts[2]
    assert str(ts[0]).startswith("2023-11-14")


def test_syslog_year_inference():
    ref = dt.datetime(2026, 1, 15)
    ts = timestamps.parse_syslog(["Jan 10 10:00:00", "Dec 30 23:59:59"], ref)
    assert str(ts[0]).startswith("2026-01-10")
    assert str(ts[1]).startswith("2025-12-30")  # future -> previous year


def test_syslog_leap_day_fallback():
    ref = dt.datetime(2026, 3, 1)
    ts = timestamps.parse_syslog(["Feb 29 01:02:03"], ref)
    assert str(ts[0]).startswith("2024-02-29")  # latest leap year <= ref


def test_iso8601_and_strptime():
    ts = timestamps.parse_iso8601(["2024-05-01T12:00:00Z",
                                   "2024-05-01T14:00:00+02:00"])
    assert ts[0] == ts[1]
    ts2 = timestamps.parse_strptime(
        ["01/May/2024:12:00:00", "2024-05-01 12:00:00"],
        ["%d/%b/%Y:%H:%M:%S", "%Y-%m-%d %H:%M:%S"])
    assert ts2[0] == ts2[1] == ts[0]


def test_tz_shift():
    ts = timestamps.parse_iso8601(["2024-05-01T09:00:00"])
    utc = timestamps.to_utc(ts, tz_offset_hours=9.0)  # JST source
    assert str(utc[0]).startswith("2024-05-01T00:00:00")


# --- M1 regex extract ------------------------------------------------------

def test_regex_extract_with_error_sentinel():
    ex = extract.RegexExtract(
        r"(?P<ip>\S+) - (?P<user>\S+) \[(?P<ts>[^\]]+)\]", column="line")
    batch = pa.table({"line": [
        '10.0.0.1 - alice [01/May/2024]', "garbage line", None]})
    out = ex(batch)
    assert out.column("ip").to_pylist() == ["10.0.0.1", None, None]
    assert out.column("_parse_error").to_pylist() == [False, True, True]


# --- S10 CEF ---------------------------------------------------------------

def test_cef_parse_with_label_rename():
    line = ("CEF:0|Vendor|Product|1.0|42|Threat|5|src=10.0.0.1 dst=10.0.0.2 "
            "cs1=payload cs1Label=RequestPath")
    d = extract.parse_cef(line)
    assert d["device_vendor"] == "Vendor"
    assert d["src"] == "10.0.0.1"
    assert d["RequestPath"] == "payload"
    assert "cs1" not in d and "cs1Label" not in d


# --- M9 url parts ----------------------------------------------------------

def test_request_line_parse():
    d = extract.parse_request_line("GET /a/b%2Fc.html?x=1#frag HTTP/1.1")
    assert d["method"] == "GET"
    assert d["http_version"] == "1.1"
    assert d["url_path"] == "/a/b/c.html"     # double-decoded
    assert d["url_query"] == "x=1"
    assert d["url_fragment"] == "frag"
    assert d["url_extension"] == "html"


def test_xff_parse():
    assert extract.parse_xff("1.1.1.1, 2.2.2.2 ,3.3.3.3") == \
        ["1.1.1.1", "2.2.2.2", "3.3.3.3"]


# --- M12/M14/M2/M15/M5 dict surgery ---------------------------------------

def test_del_none():
    assert cleanup.del_none(
        {"a": 1, "b": "", "c": "-", "d": "null", "e": [], "f": None,
         "g": {"h": None}, "i": 0, "j": False}) == {"a": 1, "i": 0, "j": False}


def test_sanitize_rename_merge_project():
    assert cleanup.sanitize_keys({"a-b": {"c-d": 1}}) == {"a_b": {"c_d": 1}}
    assert cleanup.rename_fields({"src": "x"}, {"src": "source.ip"}) == \
        {"source": {"ip": "x"}}
    assert cleanup.deep_merge({"a": {"x": 1}}, {"a": {"y": 2}}) == \
        {"a": {"x": 1, "y": 2}}
    out = cleanup.project_ecs(
        {"srcaddr": "10.0.0.2", "dst": "10.0.0.9"},
        {"source.ip": ["missing", "srcaddr"],
         "related.ip": ["srcaddr", "dst"]},
        list_fields=frozenset({"related.ip"}))
    assert out["source"]["ip"] == "10.0.0.2"
    assert out["related"]["ip"] == ["10.0.0.2", "10.0.0.9"]


def test_truncate_big_fields():
    d = cleanup.truncate_big_fields({"big": "é" * 20000, "ok": "x"})
    raw = d["big"].encode("utf-8")
    assert len(raw) <= 32766
    assert d["big"].endswith("<<TRUNCATED>>")
    raw.decode("utf-8")
    assert d["ok"] == "x"


def test_clean_empty_strings_columnar():
    batch = pa.table({"a": ["x", "", "-", "null", "y"]})
    out = cleanup.clean_empty_strings(batch)
    assert out.column("a").to_pylist() == ["x", None, None, None, "y"]


# --- F2/F3/F4 exclusion ----------------------------------------------------

def test_excluder_exclude_and_count():
    rules = [exclude.ExclusionRule("user", "svc-.*", action="EXCLUDE"),
             exclude.ExclusionRule("event", "login", "text", action="COUNT")]
    ex = exclude.Excluder(rules)
    batch = pa.table({"user": ["alice", "svc-backup", "bob"],
                      "event": ["login", "login", "logout"]})
    out = ex(batch)
    assert out.column("user").to_pylist() == ["alice", "bob"]
    assert out.column("_counted").to_pylist() == [True, False]


def test_exclusion_text_exact_vs_regex():
    r_text = exclude.ExclusionRule("f", "a.c", "text")
    assert exclude.match_exclusion({"f": "a.c"}, [r_text])
    assert not exclude.match_exclusion({"f": "abc"}, [r_text])
    r_re = exclude.ExclusionRule("f", "a.c", "regex")
    assert exclude.match_exclusion({"f": "abc"}, [r_re])


# --- T1-T5 enrichment ------------------------------------------------------

def test_interval_lookup_and_xff():
    t = enrich.build_interval_table([
        ("10.0.0.0/8", "private"), ("192.168.0.0/16", "private"),
        ("203.0.113.0/24", "testnet")])
    assert enrich.interval_lookup(t, ["10.1.2.3", "8.8.8.8", "203.0.113.9",
                                      None, "not-an-ip"]) == \
        ["private", None, "testnet", None, None]
    trusted = enrich.build_interval_table([("10.0.0.0/8", "t")])
    assert enrich.resolve_xff(["203.0.113.7", "10.1.1.1"], trusted) == \
        "203.0.113.7"


def test_interval_enrich_batch():
    t = enrich.build_interval_table([("10.0.0.0/8", "internal")])
    st = enrich.IntervalEnrich(t, "ip", "net_label")
    out = st(pa.table({"ip": ["10.2.3.4", "1.2.3.4"]}))
    assert out.column("net_label").to_pylist() == ["internal", None]


def test_dict_enrich():
    st = enrich.DictEnrich({"4624": "Logon", "4625": "Logon failed"},
                           "event_id", "event_name", default="unknown")
    out = st(pa.table({"event_id": ["4624", "9999"]}))
    assert out.column("event_name").to_pylist() == ["Logon", "unknown"]


# --- S5/S7 envelopes -------------------------------------------------------

def test_concatenated_json_and_delimiter_explode():
    line = ('{"owner": "123", "Records": [{"a": 1}, {"a": 2}]}'
            '{"owner": "456", "Records": [{"a": 3}]}')
    batch = pa.table({"j": [line]})
    out = readers.explode_json_records(batch, "j", delimiter_key="Records",
                                       meta_keys=("owner",))
    assert out.num_rows == 3
    assert out.column("owner").to_pylist() == ["123", "123", "456"]
    assert out.column("a").to_pylist() == [1, 2, 3]


def test_group_multiline():
    recs = readers.group_multiline(
        ["2024-01-01 start", "  traceback", "  more", "2024-01-02 next"],
        r"\d{4}-\d{2}-\d{2}")
    assert recs == ["2024-01-01 start\n  traceback\n  more",
                    "2024-01-02 next"]


def test_doctests():
    import doctest
    from siem_on_amazon_opensearch_service_ray.stages import cleanup as c
    from siem_on_amazon_opensearch_service_ray.sources import readers as r
    assert doctest.testmod(c).failed == 0
    assert doctest.testmod(r).failed == 0


def test_geoip_shaped_enrich():
    t = enrich.build_interval_table(
        [("203.0.113.0/24", "net-a"), ("2001:db8::/32", "net-b")],
        meta=[{"city": "Tokyo", "country": "JP", "lat": 35.68, "lon": 139.69,
               "asn": 64500, "as_org": "ExampleNet"},
              {"city": "Osaka", "country": "JP", "lat": 34.69, "lon": 135.5,
               "asn": 64501, "as_org": "V6Net"}])
    batch = pa.table({"ip": ["203.0.113.9", "2001:db8::1", "8.8.8.8", None]})
    out = enrich.GeoIpEnrich(t, "ip")(batch)
    assert out.column("source.geo.city_name").to_pylist() == \
        ["Tokyo", "Osaka", None, None]
    assert out.column("source.as.number").to_pylist() == \
        [64500, 64501, None, None]
    assert out.column("source.geo.location.lat").to_pylist() == \
        [35.68, 34.69, None, None]


def test_interval_lookup_vectorized_batch():
    """100k probes (1k distinct) complete in well under a second —
    the per-row-probe regression guard (verdict round 1, item 5)."""
    import time
    cidrs = [(f"10.{i}.0.0/16", f"net{i}") for i in range(256)]
    t = enrich.build_interval_table(cidrs)
    ips = [f"10.{i % 200}.{i % 256}.{(i * 7) % 256}" for i in range(1000)] * 100
    t0 = time.monotonic()
    idx = enrich.interval_match_indices(t, ips)
    wall = time.monotonic() - t0
    assert idx.size == 100_000 and (idx >= 0).all()
    labels = enrich.interval_lookup(t, ips[:1000])
    assert labels[0] == "net0" and labels[1] == "net1"
    assert wall < 1.0, wall


def test_interval_lookup_ipv6_and_edges():
    t = enrich.build_interval_table([("10.0.0.0/8", "v4"),
                                     ("2001:db8::/32", "v6")])
    got = enrich.interval_lookup(
        t, ["10.255.255.255", "11.0.0.0", "2001:db8:ffff::1",
            "2001:db9::", "not-an-ip", None, ""])
    assert got == ["v4", None, "v6", None, None, None, None]


# --- F4 expression-based exclusions ---------------------------------------

def test_parse_exclusion_conditions_validation():
    conds = exclude.parse_exclusion_conditions({
        "cloudtrail/skip-describe":
            '{"expression": "eventName == `DescribeInstances`",'
            ' "action": "EXCLUDE"}',
        "cloudtrail/count-console":
            '{"expression": "user.type == `Root`", "action": "COUNT"}',
        "cloudtrail/disabled":
            '{"expression": "a", "action": "disable"}',
        "cloudtrail/bad-json": 'not json',
        "cloudtrail/bad-action": '{"expression": "a", "action": "DROP"}',
        "cloudtrail/bad-expr": '{"expression": "][", "action": "EXCLUDE"}',
        "no-logtype-prefix": '{"expression": "a", "action": "EXCLUDE"}',
        "vpcflow/rej": '{"expression": "action == `REJECT`",'
                       ' "action": "EXCLUDE"}',
    })
    assert sorted(conds) == ["cloudtrail", "vpcflow"]
    assert len(conds["cloudtrail"]) == 2
    assert {c.action for c in conds["cloudtrail"]} == {"EXCLUDE", "COUNT"}


def test_condition_excluder_nested_and_count():
    conds = [
        exclude.ExclusionCondition(
            "t/a", "user.name == `svc-backup` && event.outcome == `failure`"),
        exclude.ExclusionCondition(
            "t/b", "value > `100`", action="COUNT"),
    ]
    batch = pa.table({
        "user": [{"name": "svc-backup"}, {"name": "alice"},
                 {"name": "svc-backup"}],
        "event": [{"outcome": "failure"}, {"outcome": "failure"},
                  {"outcome": "success"}],
        "value": [5, 500, 50],
    })
    out = exclude.ConditionExcluder(conds)(batch)
    # row 0 dropped (nested AND matched); rows 1-2 kept
    assert out.num_rows == 2
    names = [u["name"] for u in out.column("user").to_pylist()]
    assert names == ["alice", "svc-backup"]
    assert out.column("_counted").to_pylist() == [True, False]
