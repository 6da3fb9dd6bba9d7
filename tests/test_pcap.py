"""impcap analog: classic-pcap file decode (contrib/impcap layer
parsers re-expressed over the published libpcap file format) — packets
are hand-crafted bytes, so every field assertion is against the spec,
not the implementation."""

import json
import struct

import pytest

from rsyslog_ray.sources.pcap import parse_pcap_bytes, read_pcap


def _pcap(packets, *, magic=0xA1B2C3D4, bo="<", linktype=1):
    out = struct.pack(bo + "IHHiIII", magic, 2, 4, 0, 0, 65535,
                      linktype)
    for ts_sec, ts_frac, data in packets:
        out += struct.pack(bo + "4I", ts_sec, ts_frac, len(data),
                           len(data)) + data
    return out


def _eth(src, dst, ethertype, payload):
    return dst + src + struct.pack(">H", ethertype) + payload


def _ipv4(src, dst, proto, payload, ttl=64):
    hdr = struct.pack(">BBHHHBBH4s4s", 0x45, 0, 20 + len(payload),
                      1, 0, ttl, proto, 0,
                      bytes(map(int, src.split("."))),
                      bytes(map(int, dst.split("."))))
    return hdr + payload


def _udp(sp, dp, payload):
    return struct.pack(">4H", sp, dp, 8 + len(payload), 0xBEEF) + payload


def _tcp(sp, dp, seq, ack, flags, payload=b""):
    return struct.pack(">HHIIBBHHH", sp, dp, seq, ack, 5 << 4, flags,
                       8192, 0, 0) + payload


def _dns_query(tid, qname, qtype=1):
    q = b"".join(bytes([len(p)]) + p.encode()
                 for p in qname.split(".")) + b"\x00"
    return struct.pack(">6H", tid, 0x0100, 1, 0, 0, 0) + q \
        + struct.pack(">2H", qtype, 1)


MAC_A = bytes.fromhex("0a0b0c0d0e0f")
MAC_B = bytes.fromhex("102030405060")


def test_pcap_udp_dns_decode():
    dns = _dns_query(0x1234, "www.example.com", qtype=28)
    pkt = _eth(MAC_A, MAC_B, 0x0800,
               _ipv4("10.0.0.1", "8.8.8.8", 17, _udp(40000, 53, dns)))
    rows = parse_pcap_bytes(_pcap([(1700000000, 250000, pkt)]))
    assert len(rows) == 1
    r = rows[0]
    assert r["id"] == 1
    assert r["timestamp"] == "2023-11-14T22:13:20.250000+00:00"
    assert r["net_bytes_total"] == len(pkt)
    m = json.loads(r["metadata"])
    assert (m["ETH_src"], m["ETH_dst"]) == ("a:b:c:d:e:f",
                                            "10:20:30:40:50:60")
    assert (m["ETH_type"], m["ETH_typestr"]) == (0x0800, "IP")
    assert (m["net_src_ip"], m["net_dst_ip"]) == ("10.0.0.1", "8.8.8.8")
    assert (m["IP_ihl"], m["net_ttl"], m["IP_proto"]) == (5, 64, 17)
    assert (m["net_src_port"], m["net_dst_port"]) == (40000, 53)
    assert m["UDP_Length"] == 8 + len(dns)
    assert m["DNS_transaction_id"] == 0x1234
    assert m["DNS_response_flag"] is False
    assert m["DNS_QDCOUNT"] == 1
    assert m["DNS_Names"] == [{"qname": "www.example.com",
                               "qtype": 28, "type": "AAAA",
                               "qclass": 1, "class": "IN"}]
    assert r["net_bytes_data"] == 0      # DNS consumed the payload


def test_pcap_tcp_flags_and_payload():
    body = b"GET / HTTP/1.1\r\n"
    pkt = _eth(MAC_A, MAC_B, 0x0800,
               _ipv4("10.0.0.2", "10.0.0.3", 6,
                     _tcp(5555, 80, 1000, 2000, 0x12, body)))
    r = parse_pcap_bytes(_pcap([(1, 0, pkt)]))[0]
    m = json.loads(r["metadata"])
    assert m["net_flags"] == "SA"        # SYN+ACK per "FSRPAUECN"
    assert (m["TCP_seq_number"], m["TCP_ack_number"]) == (1000, 2000)
    assert r["data_hex"] == body.hex().upper()
    assert r["net_bytes_data"] == len(body)


def test_pcap_vlan_arp_icmp_ipv6():
    # 802.1Q-tagged ARP request
    arp = struct.pack(">HHBBH", 1, 0x0800, 6, 4, 1) \
        + MAC_A + bytes([10, 0, 0, 1]) + b"\x00" * 6 + bytes([10, 0, 0, 9])
    vlan = MAC_B + MAC_A + struct.pack(">HH", 0x8100, 42) \
        + struct.pack(">H", 0x0806) + arp
    # ICMPv4 echo request
    icmp = _eth(MAC_A, MAC_B, 0x0800,
                _ipv4("1.1.1.1", "2.2.2.2", 1,
                      struct.pack(">BBH", 8, 0, 0xABCD) + b"ping"))
    # IPv6 UDP
    v6 = MAC_A + MAC_B + struct.pack(">H", 0x86DD) \
        + struct.pack(">IHBB", 0x60000000, 12, 17, 55) \
        + bytes.fromhex("20010db8" + "00" * 12) \
        + bytes.fromhex("20010db8" + "00" * 11 + "01") \
        + _udp(1234, 5678, b"v6")
    rows = parse_pcap_bytes(_pcap([(1, 0, vlan), (2, 0, icmp),
                                   (3, 0, v6)]))
    m0, m1, m2 = (json.loads(r["metadata"]) for r in rows)
    assert m0["ETH_tag"] == 42
    assert (m0["ETH_typestr"], m0["ARP_op"]) == ("ARP", 1)
    assert (m0["ARP_hwSrc"], m0["ARP_pSrc"]) == ("a:b:c:d:e:f",
                                                 "10.0.0.1")
    assert m0["ARP_pDst"] == "10.0.0.9"
    assert (m1["net_icmp_type"], m1["net_icmp_code"]) == (8, 0)
    assert m1["icmp_checksum"] == 0xABCD
    assert m2["ETH_typestr"] == "IPv6"
    assert m2["net_src_ip"] == "2001:db8::"
    assert m2["net_dst_ip"] == "2001:db8::1"
    assert (m2["net_ttl"], m2["IP_proto"]) == (55, 17)
    assert (m2["net_src_port"], m2["net_dst_port"]) == (1234, 5678)


def test_pcap_endianness_nanosecond_and_torn_tail():
    pkt = _eth(MAC_A, MAC_B, 0x0800,
               _ipv4("1.2.3.4", "5.6.7.8", 17, _udp(1, 2, b"x")))
    # big-endian nanosecond file: the writer stores magic 0xA1B23C4D
    # in its native (big-endian) order; a little-endian read of those
    # bytes yields the swapped 0x4D3CB2A1 sentinel
    blob = _pcap([(1700000000, 123456789, pkt)],
                 magic=0xA1B23C4D, bo=">")
    r = parse_pcap_bytes(blob)[0]
    assert r["timestamp"].startswith("2023-11-14T22:13:20.123456")
    # torn tail: a half-written record decodes the complete packets
    torn = _pcap([(1, 0, pkt)]) + struct.pack("<4I", 2, 0, 400, 400) \
        + b"\x00" * 10
    assert len(parse_pcap_bytes(torn)) == 1
    with pytest.raises(ValueError):
        parse_pcap_bytes(b"\x00" * 30)


def test_pcap_as_ray_source(ray_session, tmp_path):
    paths = []
    for f in range(3):
        pkts = []
        for i in range(50):
            pkts.append((1000 + i, 0, _eth(
                MAC_A, MAC_B, 0x0800,
                _ipv4("10.0.0.1", f"10.0.1.{i}", 17,
                      _udp(9999, 514, f"msg {f}/{i}".encode())))))
        p = tmp_path / f"cap{f}.pcap"
        p.write_bytes(_pcap(pkts))
        paths.append(str(p))
    ds = read_pcap(paths)
    df = ds.to_pandas()
    assert len(df) == 150
    assert set(df["path"].str.extract(r"cap(\d)", expand=False)) == \
        {"0", "1", "2"}
    assert df["id"].max() == 50 and df["id"].min() == 1
    one = df[df["data_hex"] == "msg 1/7".encode().hex().upper()]
    assert len(one) == 1
    m = json.loads(one["metadata"].iloc[0])
    assert m["net_dst_ip"] == "10.0.1.7"
    assert m["net_dst_port"] == 514
