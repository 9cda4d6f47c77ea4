"""pa_firewall positional-CSV transformer (pipelines/pa_firewall.py):
routing priority, positional carving, and the end-to-end summary vs
its DuckDB oracle (reference pa_firewall_rawlog_transformer/index.py
semantics)."""

import duckdb
import numpy as np
import pyarrow as pa

from siem_on_amazon_opensearch_service_ray.pipelines.pa_firewall import (
    PAN_HEADERS, carve_positional_csv, carve_route_tables,
    route_pan_messages)

SF_DIR = "/root/testdata/sf0.001"


def _routes(msgs):
    t = route_pan_messages(pa.table({"message": pa.array(msgs)}))
    return t.column("__route").to_pylist()


def test_routing_tokens_and_threat_subtypes():
    assert _routes([
        "2024/01/01 00:00:00,001,TRAFFIC,end,x",
        "2024/01/01 00:00:00,001,SYSTEM,general,x",
        "2024/01/01 00:00:00,001,THREAT,url,x",
        "2024/01/01 00:00:00,001,THREAT,data,x",
        "2024/01/01 00:00:00,001,THREAT,dlp,x",
        "2024/01/01 00:00:00,001,THREAT,file,x",
        "2024/01/01 00:00:00,001,THREAT,vulnerability,x",
        "2024/01/01 00:00:00,001,DECRYPTION,x",
        "2024/01/01 00:00:00,001,CONFIG,x",
        "2024/01/01 00:00:00,001,AUTHENTICATION,x",
        "not a pan line",
    ]) == ["traffic", "system", "threat_url", "threat_data",
           "threat_data", "threat_data", "threat_others", "decryption",
           "config", "authentication", ""]


def test_routing_priority_matches_reference_elif_chain():
    # reference index.py:115-155 checks SYSTEM before AUTHENTICATION
    # and url before data within THREAT
    assert _routes(["a,SYSTEM,b,AUTHENTICATION",
                    "x,THREAT,url,data,y"]) == ["system", "threat_url"]


def test_carve_positional_csv_names_and_quoting():
    t = carve_positional_csv(
        ['2024/01/01 00:00:00,00123,SYSTEM,general,,'
         '2024/01/01 00:00:00,vsys1,"auth, failed",informational,7,1.5,42'],
        PAN_HEADERS["system"])
    assert t.num_rows == 1
    assert t.column("serial_number")[0].as_py() == "00123"
    # quoted comma survives as one field; future_use stays empty str
    assert t.column("event_id_name")[0].as_py() == "auth, failed"
    assert t.column("future_use_1")[0].as_py() == ""
    assert t.column("event_id")[0].as_py() == "42"
    empty = carve_positional_csv([], PAN_HEADERS["traffic"])
    assert empty.num_rows == 0 and empty.column_names == \
        PAN_HEADERS["traffic"]


def test_carve_route_tables_full_columns():
    tabs = carve_route_tables([
        "2024/01/01 00:00:00,00001,TRAFFIC,end,,"
        "2024/01/01 00:00:00,10.0.0.1,10.0.0.2,3,2.0,8",
        "2024/01/01 00:00:00,00002,THREAT,url,,"
        "2024/01/01 00:00:00,search-engines,4,0.5,10",
    ])
    assert set(tabs) == {"traffic", "threat_url"}
    assert tabs["traffic"].column_names == PAN_HEADERS["traffic"]
    assert tabs["threat_url"].column("url_category")[0].as_py() == \
        "search-engines"


def test_summary_matches_duckdb_oracle(ray_session):
    from siem_on_amazon_opensearch_service_ray.pipelines.queries import (
        PA_FIREWALL_SQL, pa_firewall_logs)
    got = pa_firewall_logs(SF_DIR)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/events.parquet')")
    want = con.sql(PA_FIREWALL_SQL).df().sort_values("route") \
        .reset_index(drop=True)
    assert list(got["route"]) == list(want["route"])
    for c in ("n", "n_serials", "sum_value_e2"):
        assert got[c].dtype.kind == want[c].dtype.kind == "i"
        assert np.array_equal(got[c].to_numpy(), want[c].to_numpy()), c
