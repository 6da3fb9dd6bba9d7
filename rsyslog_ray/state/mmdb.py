"""Minimal MaxMind DB (.mmdb) binary-format reader + fixture writer.

The format is public (the MaxMind DB File Format Specification,
maxmind.github.io/MaxMind-DB): a binary search tree over IP bits, a
16-zero-byte separator, a typed data section, and a metadata map after
the ``\\xAB\\xCD\\xEFMaxMind.com`` marker.  mmdblookup
(plugins/mmdblookup/mmdblookup.c:470-497) opens the database once per
worker thread and probes per record; here ``MMDBReader`` is exactly
that open-once state — construct it in a map_batches class
``__init__`` (one parse of the tree per actor) and call ``get`` /
``lookup_series`` per batch.  ``build_mmdb`` writes a tiny, spec-
conformant database for tests and demos (no external library in this
container, so the reader is implemented from the spec).
"""

from __future__ import annotations

import ipaddress
import struct

METADATA_MARKER = b"\xab\xcd\xefMaxMind.com"
_DATA_SEPARATOR = 16

# data-section type codes (spec §"Data Section")
_T_POINTER, _T_UTF8, _T_DOUBLE, _T_BYTES = 1, 2, 3, 4
_T_UINT16, _T_UINT32, _T_MAP = 5, 6, 7
_TX_INT32, _TX_UINT64, _TX_UINT128, _TX_ARRAY = 8, 9, 10, 11
_TX_BOOL, _TX_FLOAT = 14, 15


class MMDBReader:
    """Open-once reader for the MaxMind DB binary format."""

    def __init__(self, path_or_bytes):
        if isinstance(path_or_bytes, (bytes, bytearray)):
            self.buf = bytes(path_or_bytes)
        else:
            with open(path_or_bytes, "rb") as fh:
                self.buf = fh.read()
        midx = self.buf.rfind(METADATA_MARKER)
        if midx < 0:
            raise ValueError("not a MaxMind DB file (marker missing)")
        self._meta_base = midx + len(METADATA_MARKER)
        self.metadata, _ = self._decode(self._meta_base, self._meta_base)
        self.node_count = int(self.metadata["node_count"])
        self.record_size = int(self.metadata["record_size"])
        if self.record_size not in (24, 28, 32):
            raise ValueError(f"unsupported record size {self.record_size}")
        self.ip_version = int(self.metadata["ip_version"])
        self.tree_size = self.node_count * self.record_size // 4
        self.data_base = self.tree_size + _DATA_SEPARATOR

    # -- search tree -----------------------------------------------------
    def _record(self, node: int, side: int) -> int:
        b = self.buf
        if self.record_size == 24:
            o = node * 6 + side * 3
            return (b[o] << 16) | (b[o + 1] << 8) | b[o + 2]
        if self.record_size == 32:
            o = node * 8 + side * 4
            return struct.unpack_from(">I", b, o)[0]
        # 28: 7-byte node; the middle byte's high nibble belongs to the
        # left record, the low nibble to the right (spec §"Node Layout")
        o = node * 7
        if side == 0:
            return ((b[o + 3] >> 4) << 24) | (b[o] << 16) | \
                (b[o + 1] << 8) | b[o + 2]
        return ((b[o + 3] & 0x0F) << 24) | (b[o + 4] << 16) | \
            (b[o + 5] << 8) | b[o + 6]

    def get(self, ip: str):
        """Record dict for the longest-prefix network containing ``ip``,
        or None (MMDB_lookup_string analog; bad input -> None)."""
        try:
            addr = ipaddress.ip_address(ip)
        except ValueError:
            return None
        if addr.version == 4 and self.ip_version == 6:
            # v6 trees store IPv4 under the first 96 zero bits
            bits, nbits = int(addr), 128
        elif addr.version == 6 and self.ip_version == 4:
            return None
        else:
            bits, nbits = int(addr), 32 if addr.version == 4 else 128
        node = 0
        for i in range(nbits - 1, -1, -1):
            rec = self._record(node, (bits >> i) & 1)
            if rec == self.node_count:
                return None                         # empty record
            if rec < self.node_count:
                node = rec
                continue
            off = self.data_base + (rec - self.node_count - _DATA_SEPARATOR)
            val, _ = self._decode(off, self.data_base)
            return val
        return None

    def lookup_series(self, ips, field: str | None = None):
        """Vectorized-per-batch probe: list of record dicts (or one
        dotted ``field`` like ``country.iso_code``, misses -> "")."""
        out = []
        for ip in ips:
            rec = self.get(str(ip))
            if field is None:
                out.append(rec)
                continue
            v: object = rec
            for part in field.split("."):
                v = v.get(part) if isinstance(v, dict) else None
            out.append("" if v is None else v)
        return out

    # -- data section decoder ---------------------------------------------
    def _decode(self, off: int, base: int):
        b = self.buf
        ctrl = b[off]
        off += 1
        typ = ctrl >> 5
        if typ == _T_POINTER:
            psz = (ctrl >> 3) & 0x3
            v = ctrl & 0x7
            if psz == 0:
                ptr = (v << 8) | b[off]
            elif psz == 1:
                ptr = ((v << 16) | (b[off] << 8) | b[off + 1]) + 2048
            elif psz == 2:
                ptr = ((v << 24) | (b[off] << 16) | (b[off + 1] << 8)
                       | b[off + 2]) + 526336
            else:
                ptr = struct.unpack_from(">I", b, off)[0]
            val, _ = self._decode(base + ptr, base)
            return val, off + psz + 1
        if typ == 0:                                 # extended type
            typ = b[off] + 7
            off += 1
        size = ctrl & 0x1F
        if size == 29:
            size = 29 + b[off]
            off += 1
        elif size == 30:
            size = 285 + struct.unpack_from(">H", b, off)[0]
            off += 2
        elif size == 31:
            size = 65821 + ((b[off] << 16) | (b[off + 1] << 8) | b[off + 2])
            off += 3
        if typ == _T_UTF8:
            return b[off:off + size].decode("utf-8"), off + size
        if typ == _T_BYTES:
            return b[off:off + size], off + size
        if typ == _T_DOUBLE:
            return struct.unpack_from(">d", b, off)[0], off + 8
        if typ == _TX_FLOAT:
            return struct.unpack_from(">f", b, off)[0], off + 4
        if typ in (_T_UINT16, _T_UINT32, _TX_UINT64, _TX_UINT128):
            return int.from_bytes(b[off:off + size], "big"), off + size
        if typ == _TX_INT32:
            return int.from_bytes(b[off:off + size], "big",
                                  signed=True), off + size
        if typ == _TX_BOOL:
            return bool(size), off                   # size IS the value
        if typ == _T_MAP:
            out = {}
            for _ in range(size):
                k, off = self._decode(off, base)
                v, off = self._decode(off, base)
                out[k] = v
            return out, off
        if typ == _TX_ARRAY:
            arr = []
            for _ in range(size):
                v, off = self._decode(off, base)
                arr.append(v)
            return arr, off
        raise ValueError(f"unsupported mmdb type {typ} at offset {off}")


# -------------------------------------------------------------------------
# fixture writer — enough of the spec to build small, valid databases

def _enc(value) -> bytes:
    """Encode one value (map/array/str/int/float/bool/bytes)."""
    def hdr(typ: int, size: int) -> bytes:
        ext = b""
        if typ >= 8:                                 # extended
            ext = bytes([typ - 7])
            typ = 0
        if size < 29:
            return bytes([(typ << 5) | size]) + ext
        if size < 285 + 29:
            return bytes([(typ << 5) | 29]) + ext + bytes([size - 29])
        return bytes([(typ << 5) | 30]) + ext + struct.pack(">H", size - 285)

    if isinstance(value, bool):
        return hdr(_TX_BOOL, int(value))
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return hdr(_T_UTF8, len(raw)) + raw
    if isinstance(value, bytes):
        return hdr(_T_BYTES, len(value)) + value
    if isinstance(value, float):
        return hdr(_T_DOUBLE, 8) + struct.pack(">d", value)
    if isinstance(value, int):
        raw = value.to_bytes((value.bit_length() + 7) // 8 or 0, "big")
        if value < 0:
            raise ValueError("negative ints not needed for fixtures")
        if value < 1 << 16:
            return hdr(_T_UINT16, len(raw)) + raw
        if value < 1 << 32:
            return hdr(_T_UINT32, len(raw)) + raw
        return hdr(_TX_UINT64, len(raw)) + raw
    if isinstance(value, dict):
        out = hdr(_T_MAP, len(value))
        for k, v in value.items():
            out += _enc(str(k)) + _enc(v)
        return out
    if isinstance(value, (list, tuple)):
        out = hdr(_TX_ARRAY, len(value))
        for v in value:
            out += _enc(v)
        return out
    raise TypeError(f"cannot encode {type(value)}")


def build_mmdb(networks: dict, *, database_type: str = "Raylog-Test",
               ip_version: int = 4, record_size: int = 24,
               build_epoch: int = 1735689600) -> bytes:
    """Build a spec-conformant .mmdb byte string mapping CIDR ->
    record dict (IPv4, depth-32 tree).  ``build_epoch`` is pinned by
    default so fixtures are byte-deterministic."""
    assert ip_version == 4, "fixture writer builds IPv4 trees"
    # ---- data section: one encoded record per distinct dict
    data = b""
    offsets = {}
    keys = []
    for cidr, rec in networks.items():
        blob = _enc(rec)
        if blob not in offsets:
            offsets[blob] = len(data)
            data += blob
        keys.append((ipaddress.ip_network(cidr), offsets[blob]))

    # ---- trie over prefix bits
    nodes = [[None, None]]                           # each: child|('d',off)

    def insert(net, off):
        bits = int(net.network_address)
        node = 0
        for i in range(31, 31 - net.prefixlen, -1):
            side = (bits >> i) & 1
            nxt = nodes[node][side]
            if i == 32 - net.prefixlen:              # leaf position
                nodes[node][side] = ("d", off)
                return
            if not isinstance(nxt, int):
                nodes.append([None, None])
                nodes[node][side] = len(nodes) - 1
            node = nodes[node][side]

    for net, off in sorted(keys, key=lambda x: (x[0].prefixlen,
                                                int(x[0].network_address))):
        insert(net, off)

    node_count = len(nodes)

    def rec_value(slot) -> int:
        if slot is None:
            return node_count                         # empty
        if isinstance(slot, int):
            return slot
        return node_count + _DATA_SEPARATOR + slot[1]

    tree = b""
    for left, right in nodes:
        lv, rv = rec_value(left), rec_value(right)
        if record_size == 24:
            tree += lv.to_bytes(3, "big") + rv.to_bytes(3, "big")
        elif record_size == 32:
            tree += struct.pack(">II", lv, rv)
        else:                                        # 28
            tree += (lv & 0xFFFFFF).to_bytes(3, "big")
            tree += bytes([((lv >> 24) << 4) | (rv >> 24)])
            tree += (rv & 0xFFFFFF).to_bytes(3, "big")

    meta = {
        "binary_format_major_version": 2,
        "binary_format_minor_version": 0,
        "build_epoch": build_epoch,
        "database_type": database_type,
        "description": {"en": "raylog test fixture"},
        "ip_version": ip_version,
        "languages": ["en"],
        "node_count": node_count,
        "record_size": record_size,
    }
    return (tree + b"\x00" * _DATA_SEPARATOR + data
            + METADATA_MARKER + _enc(meta))
