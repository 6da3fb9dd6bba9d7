"""MySQL and MongoDB wire-protocol primitives — stdlib only.

The reference's ommysql (plugins/ommysql/ommysql.c) and ommongodb
(plugins/ommongodb/ommongodb.c) link libmysqlclient / libmongoc; no
client libraries exist in this container, so these codecs implement
the public protocols directly:

- MySQL client/server protocol: 3-byte-LE-length + sequence-id packet
  framing, the HandshakeV10 greeting, HandshakeResponse41 with
  ``mysql_native_password`` scramble (SHA1(pw) XOR SHA1(nonce +
  SHA1(SHA1(pw))) — the algorithm published in the MySQL internals
  manual), OK/ERR packet classification, COM_QUERY / COM_QUIT.
- MongoDB: the BSON subset a log sink needs (double, string, doc,
  array, bool, null, int32, int64, utc datetime) and OP_MSG (opcode
  2013, kind-0 body section) request/response framing.

Both are exercised in tests against spec-parsing localhost doubles
that verify the auth scramble / decode the BSON (tests/test_dbwire.py).
"""

from __future__ import annotations

import hashlib
import struct

# ---------------------------------------------------------------------------
# MySQL
# ---------------------------------------------------------------------------

CLIENT_CONNECT_WITH_DB = 0x00000008
CLIENT_PROTOCOL_41 = 0x00000200
CLIENT_SECURE_CONNECTION = 0x00008000
CLIENT_PLUGIN_AUTH = 0x00080000

COM_QUIT, COM_QUERY = 0x01, 0x03


def mysql_native_scramble(password: str, nonce: bytes) -> bytes:
    """token = SHA1(pw) XOR SHA1(nonce + SHA1(SHA1(pw))); empty
    password sends an empty token."""
    if not password:
        return b""
    h1 = hashlib.sha1(password.encode()).digest()
    h2 = hashlib.sha1(h1).digest()
    h3 = hashlib.sha1(nonce + h2).digest()
    return bytes(a ^ b for a, b in zip(h1, h3))


def mysql_send_packet(sock, seq: int, payload: bytes) -> None:
    sock.sendall(struct.pack("<I", len(payload))[:3] + bytes([seq & 0xFF])
                 + payload)


def mysql_read_packet(sock) -> tuple[int, bytes]:
    hdr = _recv_exact(sock, 4)
    length = hdr[0] | (hdr[1] << 8) | (hdr[2] << 16)
    return hdr[3], _recv_exact(sock, length)


def _recv_exact(sock, n: int) -> bytes:
    out = b""
    while len(out) < n:
        c = sock.recv(n - len(out))
        if not c:
            raise ConnectionError("mysql peer closed")
        out += c
    return out


def parse_handshake_v10(payload: bytes) -> dict:
    """Server greeting -> {server_version, nonce(20B), plugin}."""
    if payload[0] != 10:
        raise ConnectionError(f"unsupported handshake v{payload[0]}")
    pos = 1
    end = payload.index(b"\x00", pos)
    version = payload[pos:end].decode()
    pos = end + 1
    pos += 4                              # thread id
    part1 = payload[pos:pos + 8]
    pos += 8 + 1                          # + filler
    pos += 2                              # capabilities (lower)
    plugin = "mysql_native_password"
    part2 = b""
    if len(payload) > pos:
        pos += 1 + 2 + 2                  # charset, status, cap upper
        auth_len = payload[pos]
        pos += 1 + 10                     # + reserved
        n2 = max(13, auth_len - 8)
        part2 = payload[pos:pos + n2].rstrip(b"\x00")
        pos += n2
        if pos < len(payload):
            plugin = payload[pos:].split(b"\x00")[0].decode()
    return {"server_version": version, "nonce": (part1 + part2)[:20],
            "plugin": plugin}


def build_handshake_response(user: str, password: str, database: str,
                             nonce: bytes) -> bytes:
    caps = (CLIENT_PROTOCOL_41 | CLIENT_SECURE_CONNECTION
            | CLIENT_PLUGIN_AUTH | (CLIENT_CONNECT_WITH_DB
                                    if database else 0))
    token = mysql_native_scramble(password, nonce)
    out = struct.pack("<IIB23x", caps, 1 << 24, 0x21)  # utf8_general_ci
    out += user.encode() + b"\x00"
    out += bytes([len(token)]) + token
    if database:
        out += database.encode() + b"\x00"
    out += b"mysql_native_password\x00"
    return out


def classify_mysql_reply(payload: bytes) -> tuple[str, str]:
    """-> ("ok"|"err"|"other", message)."""
    if payload[:1] == b"\x00":
        return "ok", ""
    if payload[:1] == b"\xff":
        code = struct.unpack_from("<H", payload, 1)[0]
        return "err", f"({code}) {payload[3:].decode(errors='replace')}"
    return "other", ""


# ---------------------------------------------------------------------------
# BSON (encode + decode of the sink subset)
# ---------------------------------------------------------------------------

def bson_encode(doc: dict) -> bytes:
    out = bytearray()
    for k, v in doc.items():
        key = k.encode() + b"\x00"
        if isinstance(v, bool):           # before int: bool is int's sub
            out += b"\x08" + key + (b"\x01" if v else b"\x00")
        elif isinstance(v, float):
            out += b"\x01" + key + struct.pack("<d", v)
        elif isinstance(v, int):
            if -(2 ** 31) <= v < 2 ** 31:
                out += b"\x10" + key + struct.pack("<i", v)
            else:
                out += b"\x12" + key + struct.pack("<q", v)
        elif isinstance(v, str):
            b = v.encode()
            out += b"\x02" + key + struct.pack("<i", len(b) + 1) + b \
                + b"\x00"
        elif v is None:
            out += b"\x0a" + key
        elif isinstance(v, dict):
            out += b"\x03" + key + bson_encode(v)
        elif isinstance(v, (list, tuple)):
            out += b"\x04" + key + bson_encode(
                {str(i): x for i, x in enumerate(v)})
        else:                              # datetime-ish -> UTC millis
            ms = int(v.timestamp() * 1000)
            out += b"\x09" + key + struct.pack("<q", ms)
    return struct.pack("<i", len(out) + 5) + bytes(out) + b"\x00"


def bson_decode(buf: bytes, pos: int = 0) -> tuple[dict, int]:
    (total,) = struct.unpack_from("<i", buf, pos)
    end = pos + total - 1                  # trailing 0x00
    pos += 4
    doc: dict = {}
    while pos < end:
        typ = buf[pos]
        pos += 1
        zero = buf.index(b"\x00", pos)
        key = buf[pos:zero].decode()
        pos = zero + 1
        if typ == 0x01:
            (doc[key],) = struct.unpack_from("<d", buf, pos)
            pos += 8
        elif typ == 0x02:
            (n,) = struct.unpack_from("<i", buf, pos)
            doc[key] = buf[pos + 4:pos + 4 + n - 1].decode()
            pos += 4 + n
        elif typ in (0x03, 0x04):
            sub, pos = bson_decode(buf, pos)
            doc[key] = list(sub.values()) if typ == 0x04 else sub
        elif typ == 0x08:
            doc[key] = bool(buf[pos])
            pos += 1
        elif typ == 0x09:
            (doc[key],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        elif typ == 0x0A:
            doc[key] = None
        elif typ == 0x10:
            (doc[key],) = struct.unpack_from("<i", buf, pos)
            pos += 4
        elif typ == 0x12:
            (doc[key],) = struct.unpack_from("<q", buf, pos)
            pos += 8
        else:
            raise ValueError(f"bson type 0x{typ:02x} unsupported")
    return doc, end + 1


# ---------------------------------------------------------------------------
# MongoDB OP_MSG
# ---------------------------------------------------------------------------

OP_MSG = 2013


def mongo_send_msg(sock, request_id: int, body: dict) -> None:
    section = b"\x00" + bson_encode(body)   # kind 0: body
    payload = struct.pack("<I", 0) + section
    hdr = struct.pack("<iiii", 16 + len(payload), request_id, 0, OP_MSG)
    sock.sendall(hdr + payload)


def mongo_read_msg(sock) -> tuple[int, dict]:
    hdr = _recv_exact(sock, 16)
    length, _req, response_to, opcode = struct.unpack("<iiii", hdr)
    payload = _recv_exact(sock, length - 16)
    if opcode != OP_MSG:
        raise ConnectionError(f"unexpected opcode {opcode}")
    if payload[4] != 0:
        raise ConnectionError("only kind-0 body sections supported")
    doc, _ = bson_decode(payload, 5)
    return response_to, doc


# ---------------------------------------------------------------------------
# Redis RESP (REdis Serialization Protocol) — omhiredis/imhiredis
# (contrib/omhiredis/omhiredis.c, contrib/imhiredis) link hiredis; the
# protocol itself is two trivial rules: commands go as RESP arrays of
# bulk strings, replies are +simple/-error/:int/$bulk/*array.
# ---------------------------------------------------------------------------

def resp_encode(args: list) -> bytes:
    out = bytearray(f"*{len(args)}\r\n".encode())
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode()
        out += f"${len(b)}\r\n".encode() + b + b"\r\n"
    return bytes(out)


def resp_read(sock) -> object:
    """Read one reply: str (+), int (:), bytes ($), list (*), or raise
    on (-) errors; None for null bulk/array."""
    line = _resp_line(sock)
    t, rest = line[:1], line[1:]
    if t == b"+":
        return rest.decode()
    if t == b"-":
        raise ConnectionError(f"redis error: {rest.decode()}")
    if t == b":":
        return int(rest)
    if t == b"$":
        n = int(rest)
        if n < 0:
            return None
        data = _recv_exact(sock, n + 2)[:-2]
        return data
    if t == b"*":
        n = int(rest)
        if n < 0:
            return None
        return [resp_read(sock) for _ in range(n)]
    raise ConnectionError(f"bad RESP type byte {t!r}")


def _resp_line(sock) -> bytes:
    out = bytearray()
    while True:
        c = sock.recv(1)
        if not c:
            raise ConnectionError("redis peer closed")
        out += c
        if out[-2:] == b"\r\n":
            return bytes(out[:-2])
