"""omsnmp analog: SNMPv1/v2c traps over real BER (RFC 1157 Trap-PDU,
RFC 3416 SNMPv2-Trap; the reference plugins/omsnmp/omsnmp.c builds the
same PDUs via net-snmp) — codec edge cases plus a UDP receiver double
that re-parses every datagram with the independent BER decoder."""

import socket

import pandas as pd

from rsyslog_ray.stages.connectors import ConnectorSink, SnmpTrapTransport
from rsyslog_ray.state import snmpwire as w


def test_ber_codec_edges():
    # OID: multi-byte arcs (19406 needs two base-128 bytes)
    tag, oid, _ = w.ber_decode(w.ber_oid("1.3.6.1.4.1.19406.1.1.2.1"))
    assert (tag, oid) == (w.OID, "1.3.6.1.4.1.19406.1.1.2.1")
    # long-form length (>127 byte string)
    s = "x" * 300
    tag, val, end = w.ber_decode(w.ber_str(s))
    assert (tag, val) == (w.OCTSTR, s.encode())
    assert end == len(w.ber_str(s))
    # integers: zero, negative, and the sign-bit boundary
    for v in (0, -1, 127, 128, -129, 2 ** 31 - 1):
        assert w.ber_decode(w.ber_int(v))[1] == v
    # unsigned TimeTicks with the high bit set needs the 0x00 pad
    assert w.ber_decode(w.ber_uint(200, w.TIMETICKS))[1] == 200
    assert w.ber_decode(w.ber_uint(2 ** 32 - 1, w.TIMETICKS))[1] == \
        2 ** 32 - 1
    # IpAddress
    assert w.ber_decode(w.ber_ipaddr("10.1.2.254"))[1] == "10.1.2.254"


class TrapReceiver:
    """Bound UDP socket; collect() re-parses each datagram with the
    decoder into (version, community, pdu_tag, pdu_fields)."""

    def __init__(self):
        self._s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._s.bind(("127.0.0.1", 0))
        self._s.settimeout(5)
        self.port = self._s.getsockname()[1]

    def collect(self, n):
        out = []
        for _ in range(n):
            data, _ = self._s.recvfrom(65535)
            tag, msg, end = w.ber_decode(data)
            assert tag == w.SEQ and end == len(data)
            (vt, version), (ct, community), (ptag, fields) = msg
            assert vt == w.INT and ct == w.OCTSTR
            out.append((version, community.decode(), ptag, fields))
        return out

    def close(self):
        self._s.close()


def test_snmp_v2c_trap_wire():
    rx = TrapReceiver()
    try:
        t = SnmpTrapTransport(
            "127.0.0.1", rx.port, version=2, community="ops",
            trap_oid="1.3.6.1.4.1.19406.1.2.1",
            render=lambda r: f"<13>msg{r['event_id']}",
            uptime_fn=lambda: 4321)
        out = ConnectorSink(transport=t)(pd.DataFrame(
            {"event_id": [0, 1, 2]}))
        t.close()
        assert int(out["rows_delivered"].iloc[0]) == 3
        traps = rx.collect(3)
        for i, (version, community, ptag, fields) in enumerate(traps):
            assert (version, community, ptag) == (1, "ops",
                                                  w.TRAP_V2_PDU)
            (_, req_id), (_, err), (_, idx), (_, vbs) = fields
            assert (req_id, err, idx) == (i + 1, 0, 0)
            # RFC 3416 mandatory prefix varbinds, then the message
            (_, vb0), (_, vb1), (_, vb2) = vbs
            assert vb0[0] == (w.OID, w.SYSUPTIME_OID)
            assert vb0[1] == (w.TIMETICKS, 4321)
            assert vb1[0] == (w.OID, w.SNMPTRAP_OID)
            assert vb1[1] == (w.OID, "1.3.6.1.4.1.19406.1.2.1")
            assert vb2[0] == (w.OID, "1.3.6.1.4.1.19406.1.1.2.1")
            assert vb2[1] == (w.OCTSTR, f"<13>msg{i}".encode())
    finally:
        rx.close()


def test_snmp_v1_trap_dynsource():
    rx = TrapReceiver()
    try:
        t = SnmpTrapTransport(
            "127.0.0.1", rx.port, version=1, community="public",
            enterprise_oid="1.3.6.1.4.1.3.1.1", specific_type=5,
            source_field="fromhost_ip", render=lambda r: r["msg"],
            uptime_fn=lambda: 777)
        ConnectorSink(transport=t)(pd.DataFrame({
            "fromhost_ip": ["192.168.7.9", "not-an-ip"],
            "msg": ["alpha", "beta"]}))
        t.close()
        traps = rx.collect(2)
        for (version, community, ptag, fields), agent, msg in zip(
                traps, ["192.168.7.9", "0.0.0.0"], ["alpha", "beta"]):
            assert (version, community, ptag) == (0, "public",
                                                  w.TRAP_V1_PDU)
            (ent, addr, gen, spec, up, (_, vbs)) = fields
            assert ent == (w.OID, "1.3.6.1.4.1.3.1.1")
            # snmpv1dynsource: a valid row IP lands in agent-addr,
            # an invalid one falls back (omsnmp.c:322-331)
            assert addr == (w.IPADDR, agent)
            assert gen == (w.INT, w.TRAP_ENTERPRISE_SPECIFIC)
            assert spec == (w.INT, 5)
            assert up == (w.TIMETICKS, 777)
            (_, vb0), = vbs
            assert vb0[1] == (w.OCTSTR, msg.encode())
    finally:
        rx.close()


def test_snmp_conf_registry():
    from rsyslog_ray.config import _connector_spec

    t = _connector_spec("s", {
        "type": "omsnmp", "server": "h", "port": "10162",
        "version": "1", "community": "net", "traptype": "3",
        "specifictype": "9", "snmpv1dynsource": "src"})["factory"]()
    assert isinstance(t, SnmpTrapTransport)
    assert t.addr == ("h", 10162)
    assert (t.version, t.community, t.trap_type, t.specific_type,
            t.source_field) == (1, "net", 3, 9, "src")
