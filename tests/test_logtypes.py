"""Per-logtype transform exemplars, batch 2 (pipelines/logtypes.py).

Each test feeds a tiny Arrow table shaped like the reference logtype's
flattened record and asserts the sf_*-mirrored semantics.
"""

import pyarrow as pa

from siem_on_amazon_opensearch_service_ray.pipelines.etl import get_transform


def test_s3accesslog_user_and_region():
    tf = get_transform("s3accesslog_like")
    t = pa.table({
        "user_name": ["arn:aws:iam::123456789012:user/alice", "bob", None],
        "cloud_region": ["unknown", "unknown", "us-east-1"],
        "endpoint": ["bucket.s3.ap-northeast-1.amazonaws.com",
                     "bucket.s3.amazonaws.com", "x"],
    })
    out = tf(t)
    assert out.column("user_name").to_pylist() == ["alice", "bob", None]
    # region recovered from the endpoint only when 'unknown' AND found
    assert out.column("cloud_region").to_pylist() == \
        ["ap-northeast-1", "unknown", "us-east-1"]


def test_cloudfront_url_assembly():
    tf = get_transform("cloudfront_like")
    t = pa.table({
        "cs_protocol": ["https", "http"],
        "x_host_header": ["d1.cf.net", "d2.cf.net"],
        "cs_uri_stem": ["/index.html", "/x"],
        "cs_uri_query": ["a=1", "-"],              # '-' sentinel: no query
        "cs_protocol_version": ["HTTP/2.0", "HTTP/1.1"],
        "user_agent_original": ["Mozilla%2F5.0", None],
        "log_s3key": ["pfx/E2ABCDEFGH1234.2024-01-01.gz", "no-dist"],
        "date_time": ["2024-01-01\t00:00:00", "2024-01-02 01:00:00"],
    })
    out = tf(t)
    assert out.column("url_full").to_pylist() == \
        ["https://d1.cf.net/index.html?a=1", "http://d2.cf.net/x"]
    assert out.column("http_version").to_pylist() == ["2.0", "1.1"]
    assert out.column("user_agent_original").to_pylist()[0] == "Mozilla/5.0"
    assert out.column("distribution_id").to_pylist() == \
        ["E2ABCDEFGH1234", "unknown"]
    assert "\t" not in out.column("date_time").to_pylist()[0]


def test_waf_headers_and_webacl():
    tf = get_transform("waf_like")
    headers = [
        '[{"name": "Host", "value": "api.example.com"},'
        ' {"name": "User-Agent", "value": "curl/8"},'
        ' {"name": "Referer", "value": "https://ref"},'
        ' {"name": "Authorization", "value": "secret"}]',
        None,
    ]
    t = pa.table({
        "headers": pa.array(headers, pa.string()),
        "webacl_id": [
            "arn:aws:wafv2:us-west-2:123456789012:regional/webacl/acl1/id9",
            "legacy-waf-id",
        ],
        "http_version_raw": ["HTTP/1.1", "HTTP/2.0"],
    })
    out = tf(t)
    assert out.column("url_domain").to_pylist() == ["api.example.com", None]
    assert out.column("user_agent_original").to_pylist() == ["curl/8", None]
    assert out.column("http_request_referrer").to_pylist() == \
        ["https://ref", None]
    # WAFv2 ARN decomposed; WAFv1 keeps the raw id as the ruleset
    assert out.column("rule_ruleset").to_pylist() == ["acl1", "legacy-waf-id"]
    assert out.column("cloud_region").to_pylist() == ["us-west-2", None]
    assert out.column("cloud_account_id").to_pylist() == \
        ["123456789012", None]
    assert out.column("http_version").to_pylist() == ["1.1", "2.0"]
    # authorization never surfaces in any DERIVED column (the raw
    # headers envelope stays, as in the reference, which deletes the
    # key only from the flattened header map)
    derived = out.drop_columns(["headers"])
    assert "secret" not in str(derived.to_pylist())


def test_waf_global_region():
    tf = get_transform("waf_like")
    t = pa.table({"webacl_id": [
        "arn:aws:wafv2:us-east-1:123456789012:global/webacl/g/1"]})
    out = tf(t)
    assert out.column("cloud_region").to_pylist() == ["global"]


def test_guardduty_severity_type_direction_swap():
    tf = get_transform("guardduty_like")
    t = pa.table({
        "severity": [2.0, 5.0, 8.0, 9.5],
        "finding_type": [
            "Recon:EC2/PortProbeUnprotectedPort",
            "UnauthorizedAccess:EC2/SSHBruteForce",
            "Backdoor:EC2/C&CActivity.B!DNS",
            "Execution:EC2/SuspiciousFile",
        ],
        "action_type": ["NETWORK_CONNECTION", "NETWORK_CONNECTION",
                        "DNS_REQUEST", "AWS_API_CALL"],
        "connection_direction": ["INBOUND", "OUTBOUND", None, None],
        "source_ip": ["10.0.0.1", "10.0.0.2", "10.0.0.3", "10.0.0.4"],
        "destination_ip": ["1.1.1.1", "2.2.2.2", "3.3.3.3", "4.4.4.4"],
    })
    out = tf(t)
    assert out.column("severitylabel").to_pylist() == \
        ["low", "medium", "high", "critical"]
    assert out.column("threat_purpose").to_pylist() == \
        ["Recon", "UnauthorizedAccess", "Backdoor", "Execution"]
    assert out.column("threat_family_name").to_pylist() == \
        ["PortProbeUnprotectedPort", "SSHBruteForce", "C&CActivity",
         "SuspiciousFile"]
    # DNS_REQUEST forces outbound; NETWORK_CONNECTION uses the given
    # direction; SuspiciousFile family has none
    assert out.column("network_direction").to_pylist() == \
        ["inbound", "outbound", "outbound", None]
    # OUTBOUND rows swap source/destination (reference swap semantics)
    assert out.column("source_ip").to_pylist() == \
        ["10.0.0.1", "2.2.2.2", "3.3.3.3", "10.0.0.4"]
    assert out.column("destination_ip").to_pylist() == \
        ["1.1.1.1", "10.0.0.2", "10.0.0.3", "4.4.4.4"]
    # malware category: Backdoor purpose + SuspiciousFile family
    assert out.column("event_category").to_pylist() == \
        [None, None, "malware", "malware"]


def test_web_access_request_line_outcome_xff():
    tf = get_transform("web_access_like")
    t = pa.table({
        "request_raw": ["GET /a/b.php?x=1 HTTP/1.1", "BADLINE"],
        "response_status": ["200", "503"],
        "xff": ["203.0.113.9, 198.51.100.2", None],
        "source_ip": ["192.0.2.1", "192.0.2.2"],
        "log_group": ["/ec2/nginx/ssl", "/ec2/nginx/access"],
        "log_s3key": ["AWSLogs/web-site-name=shop/f.gz", "f2.gz"],
        "log_stream": ["i-0123456789abcdef0_log", "nohost"],
    })
    out = tf(t)
    assert out.column("http_request_method").to_pylist() == ["GET", None]
    assert out.column("url_path").to_pylist() == ["/a/b.php", "BADLINE"]
    assert out.column("url_query").to_pylist() == ["x=1", None]
    assert out.column("url_extension").to_pylist() == ["php", None]
    assert out.column("http_version").to_pylist() == ["1.1", None]
    assert out.column("event_outcome").to_pylist() == ["success", "failure"]
    assert out.column("xff_ips").to_pylist()[0] == \
        ["203.0.113.9", "198.51.100.2"]
    assert out.column("related_ip").to_pylist()[0] == \
        ["192.0.2.1", "198.51.100.2", "203.0.113.9"]
    assert out.column("url_scheme").to_pylist() == ["https", "http"]
    assert out.column("service_name").to_pylist() == ["shop", None]
    assert out.column("cloud_instance_id").to_pylist() == \
        ["i-0123456789abcdef0", None]


def test_route53resolver_rstrip_dot():
    tf = get_transform("route53resolver_like")
    t = pa.table({
        "dns_question_name": ["example.com.", "already", None],
        "dns_answer_data": ["1.2.3.4", "cname.example.org.", None],
    })
    out = tf(t)
    assert out.column("dns_question_name").to_pylist() == \
        ["example.com", "already", None]
    assert out.column("dns_answer_data").to_pylist() == \
        ["1.2.3.4", "cname.example.org", None]


def test_rds_slowquery_identifiers_and_query():
    tf = get_transform("rds_slowquery_like")
    t = pa.table({
        "log_group": ["/aws/rds/cluster/db-1/slowquery",
                      "/aws/rds/instance/db-2/slowquery",
                      "garbage"],
        "log_stream": ["db-1-instance-1.something", "db-2", "s"],
        "mysql_query": [
            "use mydb;\nset timestamp=1;\nSELECT * FROM t;",
            "SELECT 1;",
            None,
        ],
        "mysql_query_time": [1.5, 0.1, None],
    })
    out = tf(t)
    assert out.column("rds_cluster_identifier").to_pylist() == \
        ["db-1", None, None]
    assert out.column("rds_instance_identifier").to_pylist() == \
        ["db-1-instance-1", "db-2", None]
    assert out.column("rds_database_name").to_pylist() == \
        ["mydb", None, None]
    assert out.column("rds_query").to_pylist() == \
        ["SELECT * FROM t", "SELECT 1", None]
    assert out.column("rds_query_time").to_pylist() == [1.5, 0.1, None]


def test_windows_event_id_lookup():
    tf = get_transform("windows_event_like")
    t = pa.table({
        "event_id": [4624, 4625, 1102, 99999, None],
        "log_stream": ["i-0aaaabbbbccccdddd_sec"] * 5,
    })
    out = tf(t)
    assert out.column("event_action").to_pylist() == \
        ["logon", "logon", "audit-log-cleared", None, None]
    assert out.column("event_outcome").to_pylist() == \
        ["success", "failure", None, None, None]
    assert out.column("cloud_instance_id").to_pylist()[0] == \
        "i-0aaaabbbbccccdddd"


def test_transforms_tolerate_missing_columns():
    """Reference transforms are try/except-KeyError tolerant; ours must
    pass unknown-shaped batches through unchanged."""
    t = pa.table({"other": [1, 2]})
    for lt in ("s3accesslog_like", "cloudfront_like", "waf_like",
               "guardduty_like", "web_access_like",
               "route53resolver_like", "rds_slowquery_like",
               "windows_event_like"):
        out = get_transform(lt)(t)
        assert out.column("other").to_pylist() == [1, 2]


def test_deepsecurity_cef_overlay():
    import base64
    tf = get_transform("deepsecurity_like")
    pkt = base64.b64encode(
        b"GET / HTTP/1.1\nCookie: secret=1\nX-Forwarded-For: 10.9.8.7\n"
    ).decode()
    t = pa.table({
        "cef_device_vendor": ["Trend Micro", "Trend Micro"],
        "cef_device_product": ["Deep Security Agent", "Deep Security Agent"],
        "cef_device_version": ["20.0", "20.0"],
        "cef_signature_id": ["123", "20"],
        "cef_name": ["Out Of Allowed Policy", "Log Inspection"],
        "cef_severity": ["6", "3"],
        "cef_act": ["IDS:Reset", "Deny"],
        "cef_src": ["192.0.2.1", "not-an-ip"],
        "cef_dst": ["198.51.100.9", None],
        "cef_dpt": ["443", None],
        "cef_proto": ["TCP", "UDP"],
        "cef_cs1": ["DPI", None],
        "cef_msg": ["alert", None],
        "cef_dvc": ["203.0.113.5", "203.0.113.6"],
        "cef_TrendMicroDsPacketData": [pkt, None],
        "cef_TrendMicroDsTenant": ["acme", "acme"],
        "cef_TrendMicroDsTenantId": ["1", "1"],
    })
    out = tf(t)
    # header joins (sf_deepsecurity.py:12-18)
    assert out.column("agent_name").to_pylist() == \
        ["Trend Micro Deep Security Agent 20.0"] * 2
    assert out.column("rule_name").to_pylist() == \
        ["123 Out Of Allowed Policy", "20 Log Inspection"]
    assert out.column("event_severity").to_pylist() == ["6", "3"]
    # IDS:Reset rewrite happens BEFORE the act -> event.action map
    assert out.column("event_action").to_pylist() == \
        ["DetectOnly:NotReset", "Deny"]
    # mapped extension keys are dropped; ip-gated ones keep failures
    assert "cef_act" not in out.column_names
    assert "cef_proto" not in out.column_names
    assert out.column("network_transport").to_pylist() == ["TCP", "UDP"]
    assert out.column("destination_ip").to_pylist() == \
        ["198.51.100.9", None]
    # row 2's src is invalid: not mapped, raw column keeps the value
    assert out.column("cef_src").to_pylist() == [None, "not-an-ip"]
    # row 1: XFF from the decoded packet overrides src;
    # row 2: invalid src -> dvc fallback
    assert out.column("source_ip").to_pylist() == \
        ["10.9.8.7", "203.0.113.6"]
    # packet decode drops cookie lines
    decoded = out.column("cef_TrendMicroDsPacketData").to_pylist()[0]
    assert "Cookie" not in decoded and "X-Forwarded-For" in decoded
    # tenant columns dropped (sf_deepsecurity.py:101)
    assert "cef_TrendMicroDsTenant" not in out.column_names
    assert "cef_TrendMicroDsTenantId" not in out.column_names


def test_deepsecurity_invalid_b64_kept_and_rule_category():
    tf = get_transform("deepsecurity_like")
    t = pa.table({
        "cef_cs1": ["Firewall Events"],
        "cef_cn1": ["42"],
        "cef_fname": ["/etc/passwd"],
        "cef_cnt": ["3"],
        "cef_TrendMicroDsPacketData": ["%%%not-base64"],
    })
    out = tf(t)
    assert out.column("rule_category").to_pylist() == ["Firewall Events"]
    assert out.column("host_id").to_pylist() == ["42"]
    assert out.column("file_path").to_pylist() == ["/etc/passwd"]
    assert out.column("event_count").to_pylist() == ["3"]
    # decode failure keeps the raw value (reference try/except)
    kept = out.column("cef_TrendMicroDsPacketData").to_pylist()[0]
    assert kept == "%%%not-base64"
