"""MaxMind DB (.mmdb) binary format: pure-Python reader + writer.

Implements the public MaxMind DB file format spec v2.0
(https://maxmind.github.io/MaxMind-DB/): a binary search tree over IP
bits, a data section with a 7+extended type system, and a
marker-delimited metadata map.  The reference loads GeoLite2 City/ASN
mmdbs through the ``maxminddb`` C library (reference
siem/geodb.py:24-137); this module is the vendored-free equivalent so
the engine can ingest the same files, and the writer exists to build
deterministic fixtures (no downloadable GeoLite2 in this environment).

Scale shape: an mmdb is per-worker lookup state.  The intended use is
``mmdb_to_interval_table`` ONCE on the driver -> ``ray.put`` -> the
vectorized ``GeoIpEnrich``/``IntervalEnrich`` batch stages
(stages/enrich.py), NOT per-row ``lookup`` calls inside a hot path.

Supported: IPv4 and IPv6 trees, record sizes 24/28/32, all data types
except the deprecated 'container'.  ``lookup`` of an IPv4 address in
an ip_version=6 database follows the spec's IPv4-mapped convention.
"""

from __future__ import annotations

import ipaddress
import struct

_METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = b"\x00" * 16

# type codes (spec §"Data types")
_T_POINTER = 1
_T_STRING = 2
_T_DOUBLE = 3
_T_BYTES = 4
_T_UINT16 = 5
_T_UINT32 = 6
_T_MAP = 7
_T_INT32 = 8
_T_UINT64 = 9
_T_UINT128 = 10
_T_ARRAY = 11
_T_BOOL = 14
_T_FLOAT = 15


# ---------------------------------------------------------------------------
# data-section encoder (writer side)


def _enc_ctrl(type_code: int, size: int) -> bytes:
    """Control byte(s): top 3 bits = type (0 -> extended, next byte =
    type - 7), low 5 bits = size (29/30/31 escape to 1/2/3 extra
    bytes)."""
    out = bytearray()
    t = type_code if type_code <= 7 else 0
    if size < 29:
        out.append((t << 5) | size)
    elif size < 29 + 256:
        out.append((t << 5) | 29)
        ext = size - 29
    elif size < 285 + 65536:
        out.append((t << 5) | 30)
        ext = size - 285
    else:
        out.append((t << 5) | 31)
        ext = size - 65821
    if type_code > 7:
        out.append(type_code - 7)
    if size >= 29:
        n = 1 if size < 285 else 2 if size < 65821 else 3
        out += ext.to_bytes(n, "big")
    return bytes(out)


def _min_be(value: int) -> bytes:
    """Minimal-length big-endian unsigned encoding (0 -> b'')."""
    if value == 0:
        return b""
    return value.to_bytes((value.bit_length() + 7) // 8, "big")


def encode_value(value) -> bytes:
    """Serialize one Python value into the mmdb data-section format."""
    if isinstance(value, bool):
        return _enc_ctrl(_T_BOOL, int(value))          # size IS the value
    if isinstance(value, int):
        if value < 0:
            return _enc_ctrl(_T_INT32, 4) + struct.pack(">i", value)
        b = _min_be(value)
        if len(b) <= 2:
            return _enc_ctrl(_T_UINT16, len(b)) + b
        if len(b) <= 4:
            return _enc_ctrl(_T_UINT32, len(b)) + b
        if len(b) <= 8:
            return _enc_ctrl(_T_UINT64, len(b)) + b
        return _enc_ctrl(_T_UINT128, len(b)) + b
    if isinstance(value, float):
        return _enc_ctrl(_T_DOUBLE, 8) + struct.pack(">d", value)
    if isinstance(value, str):
        b = value.encode("utf-8")
        return _enc_ctrl(_T_STRING, len(b)) + b
    if isinstance(value, bytes):
        return _enc_ctrl(_T_BYTES, len(value)) + value
    if isinstance(value, dict):
        out = _enc_ctrl(_T_MAP, len(value))
        for k, v in value.items():
            out += encode_value(str(k)) + encode_value(v)
        return out
    if isinstance(value, (list, tuple)):
        out = _enc_ctrl(_T_ARRAY, len(value))
        for v in value:
            out += encode_value(v)
        return out
    raise TypeError(f"unsupported mmdb value type: {type(value)!r}")


# ---------------------------------------------------------------------------
# writer

class _TrieNode:
    __slots__ = ("children", "data_key")

    def __init__(self):
        self.children: list[_TrieNode | None] = [None, None]
        self.data_key = None        # set on leaf


def write_mmdb(path: str, networks: list[tuple[str, dict]],
               database_type: str = "Test-City",
               ip_version: int = 4, record_size: int = 32,
               build_epoch: int = 0) -> None:
    """Write a spec-conformant .mmdb from [(cidr, record_dict)].

    Networks must not nest (a prefix of another raises) — fixtures
    don't need merge semantics.  ``build_epoch`` is pinned (default 0)
    so output bytes are deterministic."""
    assert record_size in (24, 28, 32), record_size
    depth = 32 if ip_version == 4 else 128
    root = _TrieNode()
    records: dict[bytes, dict] = {}
    for cidr, rec in networks:
        net = ipaddress.ip_network(cidr, strict=False)
        if ip_version == 4 and net.version != 4:
            raise ValueError("IPv6 network in an ip_version=4 db")
        bits = int(net.network_address)
        if net.version == 4 and ip_version == 6:
            bits |= 0xFFFF << 32        # IPv4-mapped position
            plen = net.prefixlen + 96
        else:
            plen = net.prefixlen
        node = root
        for i in range(plen):
            if node.data_key is not None:
                raise ValueError(f"{cidr} nests inside another network")
            b = (bits >> (depth - 1 - i)) & 1
            if node.children[b] is None:
                node.children[b] = _TrieNode()
            node = node.children[b]
        if node.data_key is not None or any(node.children):
            raise ValueError(f"{cidr} overlaps another network")
        key = encode_value(rec)
        node.data_key = key
        records[key] = rec

    # number the internal nodes breadth-first (root = node 0)
    internal: list[_TrieNode] = []
    queue = [root]
    while queue:
        n = queue.pop(0)
        if n.data_key is not None:
            continue
        internal.append(n)
        for c in n.children:
            if c is not None:
                queue.append(c)
    numbers = {id(n): i for i, n in enumerate(internal)}
    node_count = len(internal)

    # data section: each distinct record once, in first-use order
    data = bytearray()
    offsets: dict[bytes, int] = {}
    for key in records:
        offsets[key] = len(data)
        data += key

    def record_value(child: _TrieNode | None) -> int:
        if child is None:
            return node_count                     # "no data" sentinel
        if child.data_key is not None:
            return node_count + 16 + offsets[child.data_key]
        return numbers[id(child)]

    tree = bytearray()
    for n in internal:
        left = record_value(n.children[0])
        right = record_value(n.children[1])
        if record_size == 24:
            tree += left.to_bytes(3, "big") + right.to_bytes(3, "big")
        elif record_size == 28:
            tree += (left & 0xFFFFFF).to_bytes(3, "big")
            tree.append(((left >> 24) << 4) | (right >> 24))
            tree += (right & 0xFFFFFF).to_bytes(3, "big")
        else:
            tree += left.to_bytes(4, "big") + right.to_bytes(4, "big")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": build_epoch,
        "database_type": database_type,
        "description": {"en": f"deterministic fixture ({database_type})"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }
    with open(path, "wb") as f:
        f.write(bytes(tree))
        f.write(_DATA_SEPARATOR)
        f.write(bytes(data))
        f.write(_METADATA_MARKER)
        f.write(encode_value(meta))


# ---------------------------------------------------------------------------
# reader


class MmdbReader:
    """Decode-on-demand reader over one mmap'able buffer."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            self.buf = f.read()
        i = self.buf.rfind(_METADATA_MARKER)
        if i < 0:
            raise ValueError("not an mmdb file (metadata marker missing)")
        self._data_cache: dict[int, object] = {}
        # metadata section has its own pointer base (start of metadata)
        meta_start = i + len(_METADATA_MARKER)
        self.metadata, _ = self._decode(meta_start, base=meta_start)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        self.ip_version = int(self.metadata["ip_version"])
        self.node_bytes = self.record_size * 2 // 8
        self.tree_size = self.node_count * self.node_bytes
        self.data_start = self.tree_size + 16

    # -- data-section decoding ------------------------------------------

    def _decode(self, off: int, base: int = None):
        """Decode the value at absolute offset ``off``; returns
        (value, next_offset).  ``base`` is the pointer base (data
        section start normally; metadata start inside metadata)."""
        if base is None:
            base = self.data_start
        buf = self.buf
        ctrl = buf[off]
        off += 1
        t = ctrl >> 5
        if t == _T_POINTER:
            sz = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if sz == 0:
                ptr = (v << 8) | buf[off]
                off += 1
            elif sz == 1:
                ptr = (v << 16) | int.from_bytes(buf[off:off + 2], "big")
                ptr += 2048
                off += 2
            elif sz == 2:
                ptr = (v << 24) | int.from_bytes(buf[off:off + 3], "big")
                ptr += 526336
                off += 3
            else:
                ptr = int.from_bytes(buf[off:off + 4], "big")
                off += 4
            tgt = base + ptr
            if tgt in self._data_cache:
                return self._data_cache[tgt], off
            val, _ = self._decode(tgt, base)
            self._data_cache[tgt] = val
            return val, off
        if t == 0:
            t = buf[off] + 7
            off += 1
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + buf[off]
            off += 1
        elif size == 30:
            size = 285 + int.from_bytes(buf[off:off + 2], "big")
            off += 2
        elif size == 31:
            size = 65821 + int.from_bytes(buf[off:off + 3], "big")
            off += 3
        if t == _T_STRING:
            return buf[off:off + size].decode("utf-8"), off + size
        if t == _T_DOUBLE:
            return struct.unpack(">d", buf[off:off + 8])[0], off + 8
        if t == _T_FLOAT:
            return struct.unpack(">f", buf[off:off + 4])[0], off + 4
        if t == _T_BYTES:
            return bytes(buf[off:off + size]), off + size
        if t in (_T_UINT16, _T_UINT32, _T_UINT64, _T_UINT128):
            return int.from_bytes(buf[off:off + size], "big"), off + size
        if t == _T_INT32:
            return int.from_bytes(buf[off:off + size], "big",
                                  signed=True), off + size
        if t == _T_MAP:
            out = {}
            for _ in range(size):
                k, off = self._decode(off, base)
                v, off = self._decode(off, base)
                out[k] = v
            return out, off
        if t == _T_ARRAY:
            out = []
            for _ in range(size):
                v, off = self._decode(off, base)
                out.append(v)
            return out, off
        if t == _T_BOOL:
            return bool(size), off
        raise ValueError(f"unsupported mmdb type code {t}")

    # -- tree traversal ---------------------------------------------------

    def _read_record(self, node: int, bit: int) -> int:
        b = self.buf
        base = node * self.node_bytes
        if self.record_size == 24:
            o = base + 3 * bit
            return int.from_bytes(b[o:o + 3], "big")
        if self.record_size == 28:
            mid = b[base + 3]
            if bit == 0:
                return ((mid >> 4) << 24) | \
                    int.from_bytes(b[base:base + 3], "big")
            return ((mid & 0x0F) << 24) | \
                int.from_bytes(b[base + 4:base + 7], "big")
        o = base + 4 * bit
        return int.from_bytes(b[o:o + 4], "big")

    def lookup(self, ip: str):
        """Record dict for ``ip`` (None when the tree has no entry)."""
        addr = ipaddress.ip_address(ip)
        bits = int(addr)
        depth = 32 if self.ip_version == 4 else 128
        if addr.version == 4 and self.ip_version == 6:
            bits |= 0xFFFF << 32
        elif addr.version == 6 and self.ip_version == 4:
            return None
        node = 0
        for i in range(depth):
            rec = self._read_record(node, (bits >> (depth - 1 - i)) & 1)
            if rec == self.node_count:
                return None
            if rec > self.node_count:
                val, _ = self._decode(rec - self.node_count
                                      + self.tree_size)
                return val
            node = rec
        return None

    def networks(self):
        """Yield every (ip_network, record) in the tree — the
        full-scan used to flatten an mmdb into interval arrays."""
        depth = 32 if self.ip_version == 4 else 128
        stack = [(0, 0, 0)]           # node, prefix_bits, prefix_len
        while stack:
            node, prefix, plen = stack.pop()
            for bit in (1, 0):
                rec = self._read_record(node, bit)
                if rec == self.node_count:
                    continue
                child_prefix = (prefix << 1) | bit
                if rec < self.node_count:
                    stack.append((rec, child_prefix, plen + 1))
                else:
                    val, _ = self._decode(rec - self.node_count
                                          + self.tree_size)
                    addr_int = child_prefix << (depth - plen - 1)
                    cls = (ipaddress.IPv4Network if self.ip_version == 4
                           else ipaddress.IPv6Network)
                    yield cls((addr_int, plen + 1)), val


# ---------------------------------------------------------------------------
# bridge into the engine's broadcast interval tables


def _geo_meta(rec: dict) -> dict:
    """GeoIP2 City/ASN record -> the flat attribute dict GeoIpEnrich
    maps to ECS columns (reference siem/geodb.py:66-137 pulls the same
    paths out of maxminddb's record)."""
    out: dict = {}
    city = rec.get("city", {})
    if isinstance(city, dict):
        names = city.get("names", {})
        if isinstance(names, dict) and "en" in names:
            out["city"] = names["en"]
    country = rec.get("country", {})
    if isinstance(country, dict) and "iso_code" in country:
        out["country"] = country["iso_code"]
    loc = rec.get("location", {})
    if isinstance(loc, dict):
        if "latitude" in loc:
            out["lat"] = float(loc["latitude"])
        if "longitude" in loc:
            out["lon"] = float(loc["longitude"])
    if "autonomous_system_number" in rec:
        out["asn"] = int(rec["autonomous_system_number"])
    if "autonomous_system_organization" in rec:
        out["as_org"] = rec["autonomous_system_organization"]
    return out


def mmdb_to_interval_table(path: str, label_from=None) -> dict:
    """Flatten an mmdb into the sorted interval arrays the broadcast
    enrich stages consume (stages/enrich.py build_interval_table).

    This is the distribution story for .mmdb at scale: ONE driver-side
    flatten, ``ray.put`` the arrays, vectorized searchsorted probes in
    every task — instead of a C-library handle per worker process.
    ``label_from`` maps a record dict -> label string (default:
    country iso code, else city, else str(record))."""
    from ..stages.enrich import build_interval_table
    reader = MmdbReader(path)
    cidrs: list[tuple[str, str]] = []
    metas: list[dict] = []
    for net, rec in reader.networks():
        meta = _geo_meta(rec) if isinstance(rec, dict) else {}
        if label_from is not None:
            label = label_from(rec)
        else:
            label = meta.get("country") or meta.get("city") or str(rec)
        cidrs.append((str(net), label))
        metas.append(meta)
    return build_interval_table(cidrs, metas)
