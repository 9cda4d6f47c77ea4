"""MaxMind DB binary format reader/writer (sources/mmdb.py).

Round-trips a deterministic City+ASN-shaped fixture through every
record size, checks spec corner cases (size escapes, pointer decoding,
IPv4-mapped lookups in a v6 tree), and drives the interval-table
bridge into GeoIpEnrich.
"""

import ipaddress

import pytest

from siem_on_amazon_opensearch_service_ray.sources.mmdb import (
    MmdbReader, encode_value, mmdb_to_interval_table, write_mmdb)

CITY_NETS = [
    ("81.2.69.0/24", {
        "city": {"names": {"en": "London"}},
        "country": {"iso_code": "GB"},
        "location": {"latitude": 51.5142, "longitude": -0.0931},
    }),
    ("175.16.199.0/24", {
        "city": {"names": {"en": "Changchun"}},
        "country": {"iso_code": "CN"},
        "location": {"latitude": 43.88, "longitude": 125.3228},
    }),
    ("10.0.0.0/8", {
        "country": {"iso_code": "ZZ"},
    }),
]

ASN_NETS = [
    ("1.128.0.0/11", {"autonomous_system_number": 1221,
                      "autonomous_system_organization": "Telstra"}),
    ("12.81.92.0/22", {"autonomous_system_number": 7018,
                       "autonomous_system_organization": "ATT"}),
]


@pytest.mark.parametrize("record_size", [24, 28, 32])
def test_roundtrip_all_record_sizes(tmp_path, record_size):
    path = str(tmp_path / f"city{record_size}.mmdb")
    write_mmdb(path, CITY_NETS, record_size=record_size)
    r = MmdbReader(path)
    assert r.record_size == record_size
    assert r.metadata["binary_format_major_version"] == 2
    assert r.lookup("81.2.69.142")["country"]["iso_code"] == "GB"
    assert r.lookup("81.2.69.142")["city"]["names"]["en"] == "London"
    assert r.lookup("175.16.199.1")["location"]["latitude"] == 43.88
    assert r.lookup("10.255.255.255")["country"]["iso_code"] == "ZZ"
    assert r.lookup("11.0.0.0") is None
    assert r.lookup("8.8.8.8") is None


def test_networks_walk_recovers_input(tmp_path):
    path = str(tmp_path / "city.mmdb")
    write_mmdb(path, CITY_NETS)
    r = MmdbReader(path)
    got = {str(net): rec["country"]["iso_code"] for net, rec in r.networks()}
    want = {c: rec["country"]["iso_code"] for c, rec in CITY_NETS}
    assert got == want


def test_ipv6_tree_with_mapped_v4(tmp_path):
    path = str(tmp_path / "v6.mmdb")
    nets = [("2001:db8::/32", {"country": {"iso_code": "V6"}})] + \
        [(c, r) for c, r in CITY_NETS[:1]]
    write_mmdb(path, nets, ip_version=6, record_size=28)
    r = MmdbReader(path)
    assert r.lookup("2001:db8::1")["country"]["iso_code"] == "V6"
    # IPv4 lookups hit the ::ffff:0:0/96 mapped subtree (spec §IPv4)
    assert r.lookup("81.2.69.142")["country"]["iso_code"] == "GB"
    assert r.lookup("9.9.9.9") is None


def test_overlapping_networks_rejected(tmp_path):
    with pytest.raises(ValueError):
        write_mmdb(str(tmp_path / "x.mmdb"),
                   [("10.0.0.0/8", {"a": 1}), ("10.1.0.0/16", {"a": 2})])


def test_encode_size_escapes():
    # 29/30 size escapes: 1-/2-byte extensions (spec §"Data field
    # format"); decoder must invert them exactly
    for n in (28, 29, 200, 285, 1000, 70000):
        blob = encode_value("x" * n)
        # decode via a reader-shaped buffer: tree of 0 nodes + sep
        import siem_on_amazon_opensearch_service_ray.sources.mmdb as M

        class _R(MmdbReader):
            def __init__(self, data):
                self.buf = data
                self._data_cache = {}
                self.data_start = 0
        v, _ = _R(blob)._decode(0, base=0)
        assert v == "x" * n


def test_scalar_types_roundtrip(tmp_path):
    rec = {"b_true": True, "b_false": False, "u16": 65535,
           "u32": 1 << 30, "u64": 1 << 60, "neg": -5,
           "d": 1.25, "s": "héllo", "raw": b"\x00\x01",
           "arr": [1, "two", 3.0], "nested": {"k": {"kk": 7}}}
    path = str(tmp_path / "types.mmdb")
    write_mmdb(path, [("192.0.2.0/24", rec)])
    got = MmdbReader(path).lookup("192.0.2.1")
    assert got == rec


def test_pointer_decoding():
    """Hand-build a data section where a map value is a pointer to an
    earlier record — the layout GeoLite2 uses pervasively for shared
    country/continent maps."""
    target = encode_value("shared-string")
    # pointer size 0: value = ((ctrl & 0x7) << 8) | next, offset 0
    ptr = bytes([0b00100000, 0])          # type=1, sz=0, value=0
    m = bytes([0b11100001]) + encode_value("k") + ptr  # map {k: ptr->0}

    class _R(MmdbReader):
        def __init__(self, data):
            self.buf = data
            self._data_cache = {}
            self.data_start = 0
    buf = target + m
    v, _ = _R(buf)._decode(len(target), base=0)
    assert v == {"k": "shared-string"}


def test_interval_table_bridge_and_enrich(tmp_path, ray_session):
    import pyarrow as pa

    from siem_on_amazon_opensearch_service_ray.stages.enrich import (
        GeoIpEnrich, interval_lookup)
    city = str(tmp_path / "city.mmdb")
    write_mmdb(city, CITY_NETS)
    table = mmdb_to_interval_table(city)
    assert interval_lookup(table, ["81.2.69.7", "175.16.199.200",
                                   "8.8.8.8"]) == ["GB", "CN", None]
    batch = pa.table({"src_ip": ["81.2.69.7", "8.8.8.8", None]})
    out = GeoIpEnrich(table, "src_ip")(batch)
    assert out.column("source.geo.country_iso_code").to_pylist() == \
        ["GB", None, None]
    assert out.column("source.geo.city_name").to_pylist() == \
        ["London", None, None]
    assert out.column("source.geo.location.lat").to_pylist() == \
        [51.5142, None, None]


def test_asn_bridge(tmp_path):
    from siem_on_amazon_opensearch_service_ray.stages.enrich import (
        interval_match_indices)
    asn = str(tmp_path / "asn.mmdb")
    write_mmdb(asn, ASN_NETS, database_type="Test-ASN")
    table = mmdb_to_interval_table(
        asn, label_from=lambda r: str(r["autonomous_system_number"]))
    idx = interval_match_indices(table, ["1.128.0.1", "12.81.94.9", "4.4.4.4"])
    assert list(table["labels"][idx[:2]]) == ["1221", "7018"]
    assert idx[2] == -1
    assert table["meta_cols"]["asn"][idx[0]] == 1221
    assert table["meta_cols"]["as_org"][idx[1]] == "ATT"


def test_deterministic_bytes(tmp_path):
    p1, p2 = str(tmp_path / "a.mmdb"), str(tmp_path / "b.mmdb")
    write_mmdb(p1, CITY_NETS)
    write_mmdb(p2, CITY_NETS)
    assert open(p1, "rb").read() == open(p2, "rb").read()


# ---------------------------------------------------------------------------
# property: random non-nested network sets with arbitrary records
# round-trip bit-exactly through the writer + reader at every record
# size (hypothesis drives the spec edge cases: size escapes, minimal
# int widths, deep maps)

from hypothesis import given, settings
from hypothesis import strategies as st

_scalar = st.one_of(
    st.booleans(),
    st.integers(min_value=0, max_value=(1 << 62)),
    st.integers(min_value=-(1 << 31), max_value=-1),
    st.floats(allow_nan=False, allow_infinity=False, width=64),
    st.text(max_size=40),
    st.binary(max_size=40),
)
_record = st.recursive(
    _scalar,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=8), inner,
                        max_size=4)),
    max_leaves=12)


@st.composite
def _networks(draw):
    """2-8 disjoint /16s under distinct second octets of 10.0.0.0/8."""
    octets = draw(st.lists(st.integers(0, 255), min_size=2, max_size=8,
                           unique=True))
    return [(f"10.{o}.0.0/16",
             {"k": draw(_record), "o": o}) for o in octets]


@settings(max_examples=25, deadline=None)
@given(nets=_networks(), record_size=st.sampled_from([24, 28, 32]))
def test_mmdb_property_roundtrip(tmp_path_factory, nets, record_size):
    path = str(tmp_path_factory.mktemp("mmdbprop") / "p.mmdb")
    write_mmdb(path, nets, record_size=record_size)
    r = MmdbReader(path)
    want = {ipaddress.ip_network(c): rec for c, rec in nets}
    got = dict(r.networks())
    assert got == want
    for c, rec in nets:
        o = int(c.split(".")[1])
        assert r.lookup(f"10.{o}.{o % 256}.7") == rec
    # an octet with no network resolves to nothing
    missing = next(i for i in range(256)
                   if f"10.{i}.0.0/16" not in dict(nets))
    assert r.lookup(f"10.{missing}.0.1") is None
