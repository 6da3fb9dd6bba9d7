"""impcap analog — packet-capture decoding into a Dataset.

Reference: contrib/impcap (impcap.c + per-layer parsers).  The
reference captures live via libpcap and emits one message per packet
with a metadata JSON container and the unparsed payload as hex
(impcap.c:544-581); the batch analog reads classic ``.pcap`` FILES
(the published libpcap file format: 24-byte global header, 16-byte
per-packet records) and decodes the same layer chain with the same
field names:

- eth_parser.c:130-176  ETH_src/ETH_dst (ether_ntoa ``%x:`` form),
  802.1Q → ETH_tag, ETH_type + ETH_typestr, 802.3 length → ETH_len
- ipv4_parser.c:97-101  net_src_ip/net_dst_ip/IP_ihl/net_ttl/IP_proto
- ipv6_parser.c:284-301 same names from the v6 header (hopLimit → ttl)
- arp_parser.c:99-126   ARP_hwType/pType/op/hwSrc/hwDst/pSrc/pDst
- tcp_parser.c:55,90-109 net_src_port/net_dst_port/TCP_seq_number/
  TCP_ack_number/net_flags ("FSRPAUECN" + NS bit)
- udp_parser.c:80-86    net_src_port/net_dst_port/UDP_Length/
  UDP_Checksum, DNS dispatch on port 53
- icmp_parser.c:74-76   net_icmp_type/net_icmp_code/icmp_checksum
- dns_parser.c:318-350  DNS_transaction_id/_response_flag/_opcode/
  _rcode/_QDCOUNT/_ANCOUNT/_NSCOUNT/_ARCOUNT + DNS_Names[{qname,qtype}]

App-layer SMB/HTTP/FTP sub-parsers are out of scope.  ``read_pcap``
is the scale path: ``ray.data.read_binary_files`` → one map_batches
that explodes each capture file into packet rows, so decode
parallelism is per-file and nothing is driver-side."""

from __future__ import annotations

import json
import struct

_ETH_TYPESTR = {  # eth_parser.c:61-128 eth_type_to_string
    0x00BB: "EDP", 0x0200: "PUP", 0x0800: "IP", 0x0806: "ARP",
    0x88A2: "AOE", 0x2000: "CDP", 0x2004: "DTP", 0x8035: "REVARP",
    0x8100: "802.1Q", 0x88A8: "802.1AD", 0x9100: "QINQ1",
    0x9200: "QINQ2", 0x8137: "IPX", 0x86DD: "IPv6", 0x880B: "PPP",
    0x8847: "MPLS", 0x8848: "MPLS_MCAST"}

_TCP_FLAGS = "FSRPAUEC"          # tcp_parser.c:55 bits 0..7, +N for NS
_DNS_TYPES = {1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR",
              15: "MX", 16: "TXT", 28: "AAAA", 33: "SRV", 255: "ANY"}
_DNS_CLASSES = {1: "IN", 3: "CH", 4: "HS", 255: "ANY"}
_DNS_RCODES = {0: "NoError", 1: "FormErr", 2: "ServFail", 3: "NXDomain",
               4: "NotImp", 5: "Refused"}


def _mac(b: bytes) -> str:
    return ":".join(f"{x:x}" for x in b)


def _v4(b: bytes) -> str:
    return ".".join(str(x) for x in b)


def _v6(b: bytes) -> str:
    import ipaddress

    return str(ipaddress.IPv6Address(b))


def _dns_name(pkt: bytes, pos: int, depth: int = 0) -> tuple[str, int]:
    """DNS label walk with compression pointers (bounded recursion)."""
    labels = []
    while pos < len(pkt) and depth < 10:
        n = pkt[pos]
        if n == 0:
            return ".".join(labels), pos + 1
        if n & 0xC0 == 0xC0:                 # compression pointer
            ptr = ((n & 0x3F) << 8) | pkt[pos + 1]
            tail, _ = _dns_name(pkt, ptr, depth + 1)
            labels.append(tail)
            return ".".join(labels), pos + 2
        labels.append(pkt[pos + 1:pos + 1 + n].decode(
            "ascii", errors="replace"))
        pos += 1 + n
    return ".".join(labels), pos


def _dns_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 12:
        return pkt
    tid, flags, qd, an, ns, ar = struct.unpack(">6H", pkt[:12])
    meta["DNS_transaction_id"] = tid
    meta["DNS_response_flag"] = bool(flags & 0x8000)
    meta["DNS_opcode"] = (flags >> 11) & 0xF
    rcode = flags & 0xF
    meta["DNS_rcode"] = rcode
    meta["DNS_error"] = _DNS_RCODES.get(rcode, str(rcode))
    meta["DNS_QDCOUNT"], meta["DNS_ANCOUNT"] = qd, an
    meta["DNS_NSCOUNT"], meta["DNS_ARCOUNT"] = ns, ar
    pos, names = 12, []
    try:
        for _ in range(min(qd, 32)):
            qname, pos = _dns_name(pkt, pos)
            qtype, qclass = struct.unpack(">2H", pkt[pos:pos + 4])
            pos += 4
            names.append({"qname": qname, "qtype": qtype,
                          "type": _DNS_TYPES.get(qtype, str(qtype)),
                          "qclass": qclass,
                          "class": _DNS_CLASSES.get(qclass,
                                                    str(qclass))})
    except struct.error:
        pass
    meta["DNS_Names"] = names
    return b""


def _tcp_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 20:
        return pkt
    sp, dp, seq, ack = struct.unpack(">HHII", pkt[:12])
    dor, fl = pkt[12], pkt[13]
    flags = "".join(c for i, c in enumerate(_TCP_FLAGS)
                    if fl & (1 << i))
    if dor & 0x01:
        flags += "N"
    hlen = (dor & 0xF0) >> 2
    if hlen < 20 or hlen > len(pkt):
        return pkt
    meta["net_src_port"], meta["net_dst_port"] = sp, dp
    meta["TCP_seq_number"], meta["TCP_ack_number"] = seq, ack
    meta["net_flags"] = flags
    return pkt[hlen:]


def _udp_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 8:
        return pkt
    sp, dp, tot, cks = struct.unpack(">4H", pkt[:8])
    meta["net_src_port"], meta["net_dst_port"] = sp, dp
    meta["UDP_Length"], meta["UDP_Checksum"] = tot, cks
    if sp == 53 or dp == 53:
        return _dns_parse(pkt[8:], meta)
    return pkt[8:]


def _icmp_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 4:
        return pkt
    meta["net_icmp_type"], meta["net_icmp_code"] = pkt[0], pkt[1]
    meta["icmp_checksum"] = struct.unpack(">H", pkt[2:4])[0]
    return pkt[4:]


def _ipv4_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 20:
        return pkt
    ihl = (pkt[0] & 0x0F) * 4
    proto = pkt[9]
    meta["net_dst_ip"] = _v4(pkt[16:20])
    meta["net_src_ip"] = _v4(pkt[12:16])
    meta["IP_ihl"] = ihl // 4
    meta["net_ttl"] = pkt[8]
    meta["IP_proto"] = proto
    rest = pkt[ihl:]
    if proto == 6:
        return _tcp_parse(rest, meta)
    if proto == 17:
        return _udp_parse(rest, meta)
    if proto == 1:
        return _icmp_parse(rest, meta)
    return rest


def _ipv6_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 40:
        return pkt
    nxt = pkt[6]
    meta["net_dst_ip"] = _v6(pkt[24:40])
    meta["net_src_ip"] = _v6(pkt[8:24])
    meta["net_ttl"] = pkt[7]
    meta["IP_proto"] = nxt
    rest = pkt[40:]
    if nxt == 6:
        return _tcp_parse(rest, meta)
    if nxt == 17:
        return _udp_parse(rest, meta)
    if nxt == 58:
        return _icmp_parse(rest, meta)
    return rest


def _arp_parse(pkt: bytes, meta: dict) -> bytes:
    if len(pkt) < 8:
        return pkt
    hw, pt = struct.unpack(">2H", pkt[:4])
    hlen, plen = pkt[4], pkt[5]
    meta["ARP_hwType"], meta["ARP_pType"] = hw, pt
    meta["ARP_op"] = struct.unpack(">H", pkt[6:8])[0]
    pos = 8
    if hw == 1 and len(pkt) >= 8 + 2 * (hlen + plen):
        meta["ARP_hwSrc"] = _mac(pkt[pos:pos + 6])
        if pt == 0x0800:
            meta["ARP_pSrc"] = _v4(pkt[pos + 6:pos + 10])
            meta["ARP_hwDst"] = _mac(pkt[pos + 10:pos + 16])
            meta["ARP_pDst"] = _v4(pkt[pos + 16:pos + 20])
    return b""


def eth_parse(pkt: bytes, meta: dict) -> bytes:
    """Ethernet II / 802.1Q / 802.3: fills impcap's ETH_* fields and
    dispatches the payload; returns the unparsed remainder."""
    if len(pkt) < 14:
        return pkt
    meta["ETH_src"] = _mac(pkt[6:12])
    meta["ETH_dst"] = _mac(pkt[0:6])
    et = struct.unpack(">H", pkt[12:14])[0]
    off = 14
    if et == 0x8100 and len(pkt) >= 18:      # 802.1Q VLAN
        meta["ETH_tag"] = struct.unpack(">H", pkt[14:16])[0]
        et = struct.unpack(">H", pkt[16:18])[0]
        off = 18
    if et < 1500:                            # 802.3 length, LLC after
        meta["ETH_len"] = et
        return pkt[off:]
    meta["ETH_type"] = et
    meta["ETH_typestr"] = _ETH_TYPESTR.get(et, "UNKNOWN")
    body = pkt[off:]
    if et == 0x0800:
        return _ipv4_parse(body, meta)
    if et == 0x86DD:
        return _ipv6_parse(body, meta)
    if et == 0x0806:
        return _arp_parse(body, meta)
    return body


def parse_pcap_bytes(blob: bytes, max_packets: int = 0) -> list[dict]:
    """Decode one classic-pcap file (either byte order, micro- or
    nanosecond magic, LINKTYPE_ETHERNET) into packet rows: ID (1-based
    per file, impcap.c:545), timestamp (RFC3339 UTC with fraction),
    net_bytes_total (wire length), parsed metadata JSON and the
    leftover payload hex (impcap.c:556-577 data container)."""
    from datetime import datetime, timezone

    if len(blob) < 24:
        raise ValueError("not a pcap file: truncated global header")
    magic = struct.unpack("<I", blob[:4])[0]
    if magic == 0xA1B2C3D4:
        bo, frac_div = "<", 1_000_000
    elif magic == 0xA1B23C4D:
        bo, frac_div = "<", 1_000_000_000
    elif magic == 0xD4C3B2A1:
        bo, frac_div = ">", 1_000_000
    elif magic == 0x4D3CB2A1:
        bo, frac_div = ">", 1_000_000_000
    else:
        raise ValueError(f"not a pcap file: magic {magic:#x}")
    linktype = struct.unpack(bo + "I", blob[20:24])[0]
    rows = []
    pos, pkt_id = 24, 0
    while pos + 16 <= len(blob):
        ts_sec, ts_frac, incl, orig = struct.unpack(
            bo + "4I", blob[pos:pos + 16])
        pos += 16
        data = blob[pos:pos + incl]
        pos += incl
        if len(data) < incl:
            break                            # torn tail: stop cleanly
        pkt_id += 1
        meta: dict = {}
        left = eth_parse(data, meta) if linktype == 1 else data
        ts = datetime.fromtimestamp(ts_sec, tz=timezone.utc)
        frac = ts_frac / frac_div
        rows.append({
            "id": pkt_id,
            "timestamp": ts.strftime("%Y-%m-%dT%H:%M:%S")
            + f".{int(frac * 1e6):06d}+00:00",
            "net_bytes_total": orig,
            "net_bytes_data": len(left),
            "metadata": json.dumps(meta, separators=(",", ":"),
                                   sort_keys=True),
            "data_hex": left.hex().upper(),
        })
        if max_packets and pkt_id >= max_packets:
            break
    return rows


def read_pcap(paths, *, parallelism: int = -1):
    """Scale path: one block per capture file, decode inside
    map_batches (no driver-side parsing)."""
    import pandas as pd
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    override_num_blocks=(
                                        None if parallelism == -1
                                        else parallelism))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for path, blob in zip(batch["path"], batch["bytes"]):
            for row in parse_pcap_bytes(bytes(blob)):
                row["path"] = path
                out.append(row)
        cols = ["path", "id", "timestamp", "net_bytes_total",
                "net_bytes_data", "metadata", "data_hex"]
        return pd.DataFrame(out, columns=cols)

    return ds.map_batches(explode, batch_format="pandas")
