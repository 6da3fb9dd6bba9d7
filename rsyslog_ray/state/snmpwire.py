"""SNMP trap wire codec — BER/ASN.1, v1 Trap-PDU and v2c SNMPv2-Trap.

The reference's omsnmp (plugins/omsnmp/omsnmp.c) builds its PDUs with
net-snmp (snmp_pdu_create(SNMP_MSG_TRAP/SNMP_MSG_TRAP2) +
snmp_add_var, omsnmp.c:289,341); the wire itself is the published
SNMPv1/v2c message format (RFC 1157 §4.1.6 Trap-PDU, RFC 3416 §4.2.6
SNMPv2-Trap-PDU, BER per X.690):

    Message ::= SEQUENCE { version INTEGER, community OCTET STRING,
                           data <PDU> }
    v1 Trap-PDU  [4]: enterprise OID, agent-addr IpAddress,
                      generic-trap INT, specific-trap INT,
                      time-stamp TimeTicks, varbinds
    v2 Trap-PDU  [7]: request-id INT, error-status INT,
                      error-index INT, varbinds
    varbinds ::= SEQUENCE OF SEQUENCE { name OID, value ANY }

Both the encoder (transport side) and a full BER decoder (used by the
test double to independently re-parse what went over the wire) live
here."""

from __future__ import annotations

# universal tags
INT, OCTSTR, NULL, OID, SEQ = 0x02, 0x04, 0x05, 0x06, 0x30
# SNMP application tags
IPADDR, COUNTER, GAUGE, TIMETICKS = 0x40, 0x41, 0x42, 0x43
# context-constructed PDU tags
TRAP_V1_PDU, TRAP_V2_PDU = 0xA4, 0xA7
# RFC 1157 generic-trap 6 = enterpriseSpecific (omsnmp's default
# iTrapType, omsnmp.c:145 SNMP_TRAP_ENTERPRISESPECIFIC)
TRAP_ENTERPRISE_SPECIFIC = 6

SYSUPTIME_OID = "1.3.6.1.2.1.1.3.0"      # omsnmp.c:56 objid_sysuptime
SNMPTRAP_OID = "1.3.6.1.6.3.1.1.4.1.0"   # omsnmp.c:55 objid_snmptrap


def _tlv(tag: int, value: bytes) -> bytes:
    n = len(value)
    if n < 0x80:
        return bytes([tag, n]) + value
    ln = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([tag, 0x80 | len(ln)]) + ln + value


def ber_int(v: int, tag: int = INT) -> bytes:
    if v == 0:
        return _tlv(tag, b"\x00")
    out = v.to_bytes((v.bit_length() + 8) // 8, "big", signed=True)
    return _tlv(tag, out)


def ber_uint(v: int, tag: int) -> bytes:
    """Unsigned application types (TimeTicks/Counter/Gauge): minimal
    big-endian with a leading 0x00 only when the high bit is set."""
    out = v.to_bytes(max(1, (v.bit_length() + 7) // 8), "big")
    if out[0] & 0x80:
        out = b"\x00" + out
    return _tlv(tag, out)


def ber_oid(dotted: str) -> bytes:
    arcs = [int(x) for x in dotted.strip(".").split(".")]
    body = bytearray([40 * arcs[0] + arcs[1]])
    for a in arcs[2:]:
        enc = bytearray([a & 0x7F])
        a >>= 7
        while a:
            enc.insert(0, 0x80 | (a & 0x7F))
            a >>= 7
        body += enc
    return _tlv(OID, bytes(body))


def ber_str(s) -> bytes:
    return _tlv(OCTSTR, s if isinstance(s, bytes) else str(s).encode())


def ber_ipaddr(dotted: str) -> bytes:
    return _tlv(IPADDR, bytes(int(x) for x in dotted.split(".")))


def varbind(oid: str, value: bytes) -> bytes:
    return _tlv(SEQ, ber_oid(oid) + value)


def trap_v1(community: str, enterprise: str, agent_addr: str,
            generic: int, specific: int, uptime: int,
            varbinds: list[bytes]) -> bytes:
    pdu = _tlv(TRAP_V1_PDU,
               ber_oid(enterprise) + ber_ipaddr(agent_addr)
               + ber_int(generic) + ber_int(specific)
               + ber_uint(uptime, TIMETICKS)
               + _tlv(SEQ, b"".join(varbinds)))
    return _tlv(SEQ, ber_int(0) + ber_str(community) + pdu)


def trap_v2c(community: str, request_id: int, uptime: int,
             trap_oid: str, varbinds: list[bytes]) -> bytes:
    vbs = [varbind(SYSUPTIME_OID, ber_uint(uptime, TIMETICKS)),
           varbind(SNMPTRAP_OID, ber_oid(trap_oid))] + varbinds
    pdu = _tlv(TRAP_V2_PDU,
               ber_int(request_id) + ber_int(0) + ber_int(0)
               + _tlv(SEQ, b"".join(vbs)))
    return _tlv(SEQ, ber_int(1) + ber_str(community) + pdu)


# ---------------------------------------------------------------------
# decoder (test-double side): full BER re-parse, independent of the
# encoder above except for the shared tag constants
# ---------------------------------------------------------------------

def ber_decode(data: bytes, pos: int = 0):
    """Decode one TLV; returns (tag, value, next_pos) where value is an
    int / str / bytes / list-of-decoded for constructed types."""
    tag = data[pos]
    n = data[pos + 1]
    pos += 2
    if n & 0x80:
        k = n & 0x7F
        n = int.from_bytes(data[pos:pos + k], "big")
        pos += k
    raw = data[pos:pos + n]
    end = pos + n
    if tag in (SEQ, TRAP_V1_PDU, TRAP_V2_PDU) or tag & 0x20:
        items, p = [], pos
        while p < end:
            t, v, p = ber_decode(data, p)
            items.append((t, v))
        return tag, items, end
    if tag == INT:
        return tag, int.from_bytes(raw, "big", signed=True), end
    if tag in (TIMETICKS, COUNTER, GAUGE):
        return tag, int.from_bytes(raw, "big"), end
    if tag == OCTSTR:
        return tag, raw, end
    if tag == IPADDR:
        return tag, ".".join(str(b) for b in raw), end
    if tag == NULL:
        return tag, None, end
    if tag == OID:
        arcs = [raw[0] // 40, raw[0] % 40]
        acc = 0
        for b in raw[1:]:
            acc = (acc << 7) | (b & 0x7F)
            if not b & 0x80:
                arcs.append(acc)
                acc = 0
        return tag, ".".join(str(a) for a in arcs), end
    return tag, raw, end
