"""Config overlay loading (reference aws.ini/user.ini semantics) and
the one->many fan-out transforms (json_delimiter explode + ASFF
finding-type split)."""

import json
import textwrap

import pyarrow as pa
import pytest

from siem_on_amazon_opensearch_service_ray import config as cfgmod
from siem_on_amazon_opensearch_service_ray.pipelines import etl


BASE_INI = textwrap.dedent("""\
    [DEFAULT]
    doc_id = @id
    index_rotation = monthly
    timestamp_tz = +00:00

    [cloudtrail_like]
    index_name = log-aws-cloudtrail
    timestamp_key = event_time
    timestamp_format = iso8601
    json_delimiter = Records
    renames = eventName:event_name srcIP:source_ip
    static.cloud_provider = aws

    [securityhub_like]
    index_name = log-aws-securityhub
    timestamp_key = updated_at
    timestamp_format = epoch
    timestamp_tz = +09:00
    json_delimiter = findings
    exclude.record = .*sample.*
    """)

USER_INI = textwrap.dedent("""\
    [cloudtrail_like]
    index_name = log-custom-trail
    index_rotation = daily

    [myapp_like]
    doc_id = @id
    index_name = log-myapp
    timestamp_key = ts
    timestamp_format = %d/%b/%Y:%H:%M:%S
    """)


@pytest.fixture()
def ini_files(tmp_path):
    base = tmp_path / "aws.ini"
    user = tmp_path / "user.ini"
    base.write_text(BASE_INI)
    user.write_text(USER_INI)
    return str(base), str(user)


def test_overlay_two_layers(ini_files):
    base, user = ini_files
    cfgs = cfgmod.load_etl_configs(base, user)
    # user layer overrides per-key, keeps base keys it didn't touch
    ct = cfgs["cloudtrail_like"]
    assert ct.index_name == "log-custom-trail"      # overridden
    assert ct.index_rotation == "daily"             # overridden
    assert ct.timestamp_col == "event_time"         # kept from base
    assert ct.json_delimiter == "Records"           # kept from base
    assert ct.renames == {"eventName": "event_name", "srcIP": "source_ip"}
    assert ct.static_fields == {"cloud_provider": "aws"}
    # user-only section appears, with DEFAULT inherited
    my = cfgs["myapp_like"]
    assert my.index_name == "log-myapp"
    assert my.timestamp_kind == "strptime"
    assert my.timestamp_formats == ["%d/%b/%Y:%H:%M:%S"]
    assert my.index_rotation == "monthly"           # from base DEFAULT? no:
    # DEFAULT of the *user* file doesn't exist; configparser DEFAULT is
    # per-parser, merged from both reads — base DEFAULT applies.
    # tz conversion
    sh = cfgs["securityhub_like"]
    assert sh.timestamp_tz_hours == 9.0
    assert len(sh.exclusion_rules) == 1
    assert sh.exclusion_rules[0].field == "record"


def test_overlay_missing_user_file_ok(ini_files):
    base, _ = ini_files
    cfgs = cfgmod.load_etl_configs(base, "/nonexistent/user.ini")
    assert "cloudtrail_like" in cfgs


def test_missing_doc_id_rejected(tmp_path):
    bad = tmp_path / "bad.ini"
    bad.write_text("[DEFAULT]\nindex_rotation = daily\n")
    with pytest.raises(ValueError):
        cfgmod.load_etl_configs(str(bad))


def test_timestr_to_hours():
    assert cfgmod.timestr_to_hours("+09:00") == 9.0
    assert cfgmod.timestr_to_hours("-03:30") == -3.5
    assert cfgmod.timestr_to_hours("0") == 0.0
    assert cfgmod.timestr_to_hours("5:45") == 5.75


def test_explode_json_list_fanout():
    findings = [{"Id": "f1", "sev": 3}, {"Id": "f2", "sev": 7}]
    batch = pa.table({
        "source_file": ["a.json", "b.json", "c.json"],
        "findings": [json.dumps(findings), json.dumps([{"Id": "solo"}]),
                     "not json"],
    })
    out = etl.explode_json_list(batch, "findings")
    assert out.num_rows == 4                      # 2 + 1 + 1 sentinel
    assert out.column("source_file").to_pylist() == \
        ["a.json", "a.json", "b.json", "c.json"]
    recs = out.column("record").to_pylist()
    assert json.loads(recs[0])["Id"] == "f1"
    assert json.loads(recs[1])["Id"] == "f2"
    assert recs[3] is None                        # malformed -> sentinel


def test_asff_split_transform():
    tf = etl.get_transform("securityhub_like")
    batch = pa.table({"finding_type": [
        "TTPs/Initial Access/UnauthorizedAccess:EC2-SSHBruteForce",
        "Effects/Data Exposure",
        "UnauthorizedAccess:EC2/SSHBruteForce",    # legacy org form
        None,
    ]})
    out = tf(batch)
    assert out.column("asff_type_namespace").to_pylist()[0] == "TTPs"
    assert out.column("asff_type_category").to_pylist()[0] == "Initial Access"
    assert out.column("threat_purpose").to_pylist()[0] == "UnauthorizedAccess"
    assert out.column("resource_type_affected").to_pylist()[0] == "EC2"
    assert out.column("threat_family_name").to_pylist()[0] == "SSHBruteForce"
    # legacy colon form
    assert out.column("threat_purpose").to_pylist()[2] == "UnauthorizedAccess"
    assert out.column("threat_family_name").to_pylist()[2] == "SSHBruteForce"
    assert out.column("asff_type_namespace").to_pylist()[3] is None


def test_etl_pipeline_with_fanout(ray_session):
    """End-to-end: envelope rows explode, then the ASFF split applies
    to exploded records' finding_type."""
    import ray.data as rd
    findings = [
        {"Types": ["TTPs/Defense Evasion/Stealth:IAMUser-CloudTrailLoggingDisabled"]},
        {"Types": ["Effects/Data Exposure"]},
    ]
    ds = rd.from_arrow(pa.table({
        "findings": [json.dumps(findings)],
        "account": ["123456789012"],
    }))
    cfg = etl.EtlConfig(logtype="securityhub_like", json_delimiter="findings",
                        index_name="log-aws-securityhub",
                        index_rotation="none")
    out = etl.run_etl(ds, cfg).to_pandas()
    assert len(out) == 2
    assert set(out["account"]) == {"123456789012"}


def test_linux_syslog_subparser_dispatch():
    tf = etl.get_transform("linux_syslog_like")
    batch = pa.table({
        "proc": ["sshd", "sshd", "sudo", "cron", "su", "sshd"],
        "syslog_message": [
            "Accepted publickey for deploy from 203.0.113.9 port 52311",
            "Failed password for invalid user admin from 198.51.100.7 port 40022",
            "alice : TTY=pts/0 ; PWD=/home/alice ; COMMAND=/bin/ls /root",
            "(root) CMD (run-parts /etc/cron.hourly)",
            "pam_unix(su:session): session opened for user root",
            "Disconnected from 203.0.113.9 port 52311",
        ],
    })
    out = tf(batch)
    users = out.column("user_name").to_pylist()
    outcomes = out.column("event_outcome").to_pylist()
    ips = out.column("source_ip").to_pylist()
    ov = out.column("__index_override").to_pylist()
    assert users[0] == "deploy" and outcomes[0] == "success"
    assert users[1] == "admin" and outcomes[1] == "failure"
    assert ips[1] == "198.51.100.7"
    assert users[2] == "alice" and outcomes[2] == "success"
    assert out.column("event_action").to_pylist()[2] == "/bin/ls /root"
    assert ov[0] == ov[1] == ov[2] == "log-linux-secure"
    assert ov[3] is None            # cron not secure-routed
    assert ov[4] == "log-linux-secure"   # bare su
    assert outcomes[5] is None      # disconnect -> no outcome
    # sshd category only on matched auth events
    assert out.column("event_category").to_pylist()[0] == "authentication"
