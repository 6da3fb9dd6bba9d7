"""AMQP 0-9-1 wire codec — omrabbitmq without librabbitmq.

The reference (contrib/omrabbitmq/omrabbitmq.c) links rabbitmq-c; the
protocol is the published AMQP 0-9-1 spec:

    protocol header  "AMQP" %d0 %d0 %d9 %d1
    frame            type(1) channel(2BE) size(4BE) payload %xCE
    method payload   class-id(2BE) method-id(2BE) args
    content header   class-id(2BE) weight(2BE) body-size(8BE)
                     property-flags(2BE) properties
    shortstr         len(1) bytes ; longstr len(4BE) bytes
    field table      longstr-framed (name shortstr, type octet, value)

Only what the publisher path needs is encoded here: the PLAIN-auth
connection handshake (start/start-ok, tune/tune-ok, open/open-ok),
channel.open, exchange.declare, basic.publish with the content-type
and delivery-mode properties, plus the generic decoder the test
double uses to re-parse every frame independently."""

from __future__ import annotations

import struct

FRAME_METHOD, FRAME_HEADER, FRAME_BODY, FRAME_HEARTBEAT = 1, 2, 3, 8
FRAME_END = 0xCE
PROTO_HEADER = b"AMQP\x00\x00\x09\x01"

# (class, method) ids used by the publish path
CONN_START, CONN_START_OK = (10, 10), (10, 11)
CONN_TUNE, CONN_TUNE_OK = (10, 30), (10, 31)
CONN_OPEN, CONN_OPEN_OK = (10, 40), (10, 41)
CONN_CLOSE = (10, 50)
CH_OPEN, CH_OPEN_OK = (20, 10), (20, 11)
EXCH_DECLARE, EXCH_DECLARE_OK = (40, 10), (40, 11)
BASIC_PUBLISH = (60, 40)

FLAG_CONTENT_TYPE = 0x8000
FLAG_DELIVERY_MODE = 0x1000


def shortstr(s: str) -> bytes:
    b = s.encode()
    return bytes([len(b)]) + b


def longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def table(d: dict[str, str] | None = None) -> bytes:
    body = b"".join(shortstr(k) + b"S" + longstr(v.encode())
                    for k, v in (d or {}).items())
    return longstr(body)


def frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return (struct.pack(">BHI", ftype, channel, len(payload))
            + payload + bytes([FRAME_END]))


def method(channel: int, cm: tuple[int, int], args: bytes = b"") -> bytes:
    return frame(FRAME_METHOD, channel,
                 struct.pack(">HH", *cm) + args)


def content_header(channel: int, body_size: int,
                   content_type: str | None = None,
                   delivery_mode: int | None = None) -> bytes:
    flags = 0
    props = b""
    if content_type:
        flags |= FLAG_CONTENT_TYPE
        props += shortstr(content_type)
    if delivery_mode:
        flags |= FLAG_DELIVERY_MODE
        props += bytes([delivery_mode])
    return frame(FRAME_HEADER, channel,
                 struct.pack(">HHQH", 60, 0, body_size, flags) + props)


def read_frame(sock) -> tuple[int, int, bytes]:
    hdr = _exact(sock, 7)
    ftype, channel, size = struct.unpack(">BHI", hdr)
    payload = _exact(sock, size)
    if _exact(sock, 1)[0] != FRAME_END:
        raise ConnectionError("amqp: missing frame end octet")
    return ftype, channel, payload


def parse_method(payload: bytes) -> tuple[tuple[int, int], bytes]:
    cls, mth = struct.unpack(">HH", payload[:4])
    return (cls, mth), payload[4:]


class Reader:
    """Sequential arg decoder for the test double."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def shortstr(self) -> str:
        n = self.data[self.pos]
        out = self.data[self.pos + 1:self.pos + 1 + n].decode()
        self.pos += 1 + n
        return out

    def longstr(self) -> bytes:
        n = struct.unpack(">I", self.data[self.pos:self.pos + 4])[0]
        out = self.data[self.pos + 4:self.pos + 4 + n]
        self.pos += 4 + n
        return out

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        v = struct.unpack(">H", self.data[self.pos:self.pos + 2])[0]
        self.pos += 2
        return v

    def u32(self) -> int:
        v = struct.unpack(">I", self.data[self.pos:self.pos + 4])[0]
        self.pos += 4
        return v

    def u64(self) -> int:
        v = struct.unpack(">Q", self.data[self.pos:self.pos + 8])[0]
        self.pos += 8
        return v


def _exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        got = sock.recv(n - len(buf))
        if not got:
            raise ConnectionError("amqp peer closed")
        buf += got
    return bytes(buf)
