"""AMQP 1.0 wire codec — omamqp1/omazureeventhubs without Qpid Proton.

The reference modules (contrib/omamqp1/omamqp1.c,
plugins/omazureeventhubs/omazureeventhubs.c) link qpid-proton; the
protocol is the published OASIS AMQP 1.0 spec (ISO/IEC 19464):

    protocol header   "AMQP" proto(1) major minor revision
                      proto 3 = SASL layer, 0 = AMQP layer
    frame             size(4BE, incl. header) doff(1, in 4-byte words)
                      type(1: 0=AMQP 1=SASL) channel(2BE) body
    frame body        performative (described list) [+ payload]
    described type    0x00 <descriptor> <value>
    performatives     open 0x10 begin 0x11 attach 0x12 flow 0x13
                      transfer 0x14 disposition 0x15 detach 0x16
                      end 0x17 close 0x18
    sasl frames       mechanisms 0x40 init 0x41 outcome 0x44
    terminus          source 0x28 target 0x29
    delivery state    accepted 0x24 rejected 0x25 released 0x26
    message sections  header 0x70 properties 0x73
                      application-properties 0x74 data 0x75
                      amqp-value 0x77

Encoding is the AMQP 1.0 primitive type system (spec part 1.6); only
the width-minimal encodings the sender path emits plus a GENERAL
decoder (every fixed/variable/compound width, arrays included) that
the test double uses to independently re-parse each frame.
"""

from __future__ import annotations

import struct
import uuid as _uuid

AMQP_HEADER = b"AMQP\x00\x01\x00\x00"
SASL_HEADER = b"AMQP\x03\x01\x00\x00"
FRAME_AMQP, FRAME_SASL = 0, 1

# performative / section descriptor codes (spec part 2.7, 3.2, 5.3)
OPEN, BEGIN, ATTACH, FLOW, TRANSFER = 0x10, 0x11, 0x12, 0x13, 0x14
DISPOSITION, DETACH, END, CLOSE = 0x15, 0x16, 0x17, 0x18
SOURCE, TARGET = 0x28, 0x29
ACCEPTED, REJECTED, RELEASED, MODIFIED = 0x24, 0x25, 0x26, 0x27
SASL_MECHANISMS, SASL_INIT, SASL_OUTCOME = 0x40, 0x41, 0x44
S_HEADER, S_PROPERTIES, S_APP_PROPERTIES = 0x70, 0x73, 0x74
S_DATA, S_AMQP_VALUE = 0x75, 0x77


class Symbol(str):
    """An AMQP symbol (ASCII token type, distinct from string)."""


class Described:
    """A described value: descriptor (usually a ulong code) + value."""

    def __init__(self, descriptor, value):
        self.descriptor = descriptor
        self.value = value

    def __repr__(self):
        return f"Described(0x{self.descriptor:02x}, {self.value!r})"

    def __eq__(self, other):
        return (isinstance(other, Described)
                and other.descriptor == self.descriptor
                and other.value == self.value)


class ulong(int):
    """Force the unsigned-long encoding (descriptors are ulongs)."""


class Array(list):
    """Force the array encoding (one shared constructor) — how a real
    peer ships sasl-server-mechanisms (array of symbol)."""


class timestamp(int):
    """AMQP timestamp: ms since the Unix epoch (spec 1.6.18)."""


class binary(bytes):
    pass


# ---------------------------------------------------------------- encode

def encode(v) -> bytes:
    if isinstance(v, Described):
        return b"\x00" + encode(ulong(v.descriptor)
                                if isinstance(v.descriptor, int)
                                else v.descriptor) + encode(v.value)
    if v is None:
        return b"\x40"
    if isinstance(v, bool):
        return b"\x41" if v else b"\x42"
    if isinstance(v, ulong):
        if v == 0:
            return b"\x44"
        if v < 256:
            return b"\x53" + bytes([v])
        return b"\x80" + struct.pack(">Q", v)
    if isinstance(v, timestamp):
        return b"\x83" + struct.pack(">q", v)
    if isinstance(v, int):
        # width-minimal signed/unsigned ints: emit uint for >=0 (the
        # performative fields we send are uints), long for negatives
        if v >= 0:
            if v == 0:
                return b"\x43"
            if v < 256:
                return b"\x52" + bytes([v])
            return b"\x70" + struct.pack(">I", v)
        return b"\x81" + struct.pack(">q", v)
    if isinstance(v, float):
        return b"\x82" + struct.pack(">d", v)
    if isinstance(v, _uuid.UUID):
        return b"\x98" + v.bytes
    if isinstance(v, Symbol):
        b = v.encode("ascii")
        if len(b) < 256:
            return b"\xa3" + bytes([len(b)]) + b
        return b"\xb3" + struct.pack(">I", len(b)) + b
    if isinstance(v, str):
        b = v.encode("utf-8")
        if len(b) < 256:
            return b"\xa1" + bytes([len(b)]) + b
        return b"\xb1" + struct.pack(">I", len(b)) + b
    if isinstance(v, (bytes, bytearray)):
        b = bytes(v)
        if len(b) < 256:
            return b"\xa0" + bytes([len(b)]) + b
        return b"\xb0" + struct.pack(">I", len(b)) + b
    if isinstance(v, Array):
        # array32 with one shared constructor; symbol arrays only
        # (all the sender/double paths need)
        if not all(isinstance(x, Symbol) for x in v):
            raise TypeError("amqp1: only symbol arrays supported")
        body = b"\xb3" + b"".join(          # sym32 ctor once, raw bodies
            struct.pack(">I", len(x.encode())) + x.encode() for x in v)
        return b"\xf0" + struct.pack(">II", len(body) + 4, len(v)) + body
    if isinstance(v, (list, tuple)):
        if not v:
            return b"\x45"
        body = b"".join(encode(x) for x in v)
        if len(body) + 1 < 256 and len(v) < 256:
            return b"\xc0" + bytes([len(body) + 1, len(v)]) + body
        return b"\xd0" + struct.pack(">II", len(body) + 4, len(v)) + body
    if isinstance(v, dict):
        body = b"".join(encode(k) + encode(x) for k, x in v.items())
        n = 2 * len(v)
        if len(body) + 1 < 256 and n < 256:
            return b"\xc1" + bytes([len(body) + 1, n]) + body
        return b"\xd1" + struct.pack(">II", len(body) + 4, n) + body
    raise TypeError(f"amqp1: cannot encode {type(v)}")


# ---------------------------------------------------------------- decode

_FIXED = {0x40: (0, lambda b: None), 0x41: (0, lambda b: True),
          0x42: (0, lambda b: False), 0x43: (0, lambda b: 0),
          0x44: (0, lambda b: ulong(0)),
          0x45: (0, lambda b: []),
          0x50: (1, lambda b: b[0]), 0x51: (1, lambda b: _i8(b)),
          0x52: (1, lambda b: b[0]), 0x53: (1, lambda b: ulong(b[0])),
          0x54: (1, lambda b: _i8(b)), 0x55: (1, lambda b: _i8(b)),
          0x56: (1, lambda b: bool(b[0])),
          0x60: (2, lambda b: struct.unpack(">H", b)[0]),
          0x61: (2, lambda b: struct.unpack(">h", b)[0]),
          0x70: (4, lambda b: struct.unpack(">I", b)[0]),
          0x71: (4, lambda b: struct.unpack(">i", b)[0]),
          0x72: (4, lambda b: struct.unpack(">f", b)[0]),
          0x80: (8, lambda b: ulong(struct.unpack(">Q", b)[0])),
          0x81: (8, lambda b: struct.unpack(">q", b)[0]),
          0x82: (8, lambda b: struct.unpack(">d", b)[0]),
          0x83: (8, lambda b: timestamp(struct.unpack(">q", b)[0])),
          0x98: (16, lambda b: _uuid.UUID(bytes=bytes(b)))}


def _i8(b):
    return struct.unpack(">b", b)[0]


def decode(buf: bytes, pos: int = 0):
    """Decode ONE value; returns (value, next_pos)."""
    code = buf[pos]
    if code == 0x00:                       # described
        desc, pos = decode(buf, pos + 1)
        val, pos = decode(buf, pos)
        return Described(int(desc) if isinstance(desc, int) else desc,
                         val), pos
    return _decode_body(code, buf, pos + 1)


def _decode_body(code: int, buf: bytes, pos: int):
    """Decode a value whose constructor byte was already consumed."""
    if code in _FIXED:
        width, fn = _FIXED[code]
        return fn(buf[pos:pos + width]), pos + width
    if code in (0xa0, 0xa1, 0xa3):         # vbin8 / str8 / sym8
        n = buf[pos]
        raw = bytes(buf[pos + 1:pos + 1 + n])
        pos += 1 + n
    elif code in (0xb0, 0xb1, 0xb3):       # vbin32 / str32 / sym32
        n = struct.unpack(">I", buf[pos:pos + 4])[0]
        raw = bytes(buf[pos + 4:pos + 4 + n])
        pos += 4 + n
    elif code in (0xc0, 0xc1, 0xe0):       # list8 / map8 / array8
        size, count = buf[pos], buf[pos + 1]
        return _compound(code, buf, pos + 2, count), pos + 1 + size
    elif code in (0xd0, 0xd1, 0xf0):       # list32 / map32 / array32
        size, count = struct.unpack(">II", buf[pos:pos + 8])
        return _compound(code, buf, pos + 8, count), pos + 4 + size
    else:
        raise ValueError(f"amqp1: unknown format code 0x{code:02x}")
    if code in (0xa0, 0xb0):
        return binary(raw), pos
    if code in (0xa3, 0xb3):
        return Symbol(raw.decode("ascii")), pos
    return raw.decode("utf-8"), pos


def _compound(code, buf, pos, count):
    if code in (0xe0, 0xf0):               # array: one shared constructor
        ctor = buf[pos]
        if ctor == 0x00:                   # described array element ctor
            raise ValueError("amqp1: described arrays unsupported")
        items = []
        p = pos + 1
        for _ in range(count):
            v, p = _decode_body(ctor, buf, p)
            items.append(v)
        return items
    vals = []
    p = pos
    for _ in range(count):
        v, p = decode(buf, p)
        vals.append(v)
    if code in (0xc1, 0xd1):
        return dict(zip(vals[0::2], vals[1::2]))
    return vals


# ---------------------------------------------------------------- frames

def frame(ftype: int, channel: int, performative: Described | None,
          payload: bytes = b"") -> bytes:
    body = (encode(performative) if performative is not None else b"") \
        + payload
    return struct.pack(">IBBH", 8 + len(body), 2, ftype, channel) + body


def read_exact(sock, n: int) -> bytes:
    out = b""
    while len(out) < n:
        chunk = sock.recv(n - len(out))
        if not chunk:
            raise ConnectionError("amqp1: peer closed")
        out += chunk
    return out


def read_frame(sock):
    """Returns (ftype, channel, performative|None, payload bytes)."""
    hdr = read_exact(sock, 8)
    size, doff, ftype, channel = struct.unpack(">IBBH", hdr)
    body = read_exact(sock, size - 8)
    body = body[(doff * 4) - 8:]           # skip extended header
    if not body:                           # empty frame = heartbeat
        return ftype, channel, None, b""
    perf, pos = decode(body)
    return ftype, channel, perf, body[pos:]


def performative(code: int, fields: list) -> Described:
    """Build a performative, trimming trailing nulls like proton does."""
    while fields and fields[-1] is None:
        fields.pop()
    return Described(code, fields)


def field(perf: Described, i: int, default=None):
    """Read list-field i of a performative (absent trailing fields
    decode as the default, spec 1.4 composite-type semantics)."""
    if not isinstance(perf.value, list) or i >= len(perf.value):
        return default
    v = perf.value[i]
    return default if v is None else v


# ------------------------------------------------------------- messages

def message(body_value=None, *, data: bytes | None = None,
            message_id: str | None = None, content_type: str | None = None,
            creation_time_ms: int | None = None,
            app_properties: dict | None = None,
            durable: bool | None = None) -> bytes:
    """Encode a bare message as its section stream.  ``body_value``
    emits an amqp-value section (omamqp1's list-of-strings body,
    omamqp1.c:254-303); ``data`` emits a data section (omazureeventhubs'
    binary body, omazureeventhubs.c:329-332)."""
    out = b""
    if durable is not None:
        out += encode(Described(S_HEADER, [durable]))
    if message_id is not None or content_type is not None \
            or creation_time_ms is not None:
        props = [message_id, None, None, None, None, None,
                 Symbol(content_type) if content_type else None, None,
                 timestamp(creation_time_ms) if creation_time_ms else None]
        out += encode(Described(S_PROPERTIES, props))
    if app_properties:
        out += encode(Described(S_APP_PROPERTIES, app_properties))
    if data is not None:
        out += encode(Described(S_DATA, binary(data)))
    if body_value is not None:
        out += encode(Described(S_AMQP_VALUE, body_value))
    return out


def parse_message(payload: bytes) -> dict:
    """Decode a section stream into {header, properties,
    app_properties, data, value} — the double's independent parse."""
    out = {}
    pos = 0
    while pos < len(payload):
        sec, pos = decode(payload, pos)
        if not isinstance(sec, Described):
            raise ValueError("amqp1: bare value outside a section")
        if sec.descriptor == S_HEADER:
            out["header"] = sec.value
        elif sec.descriptor == S_PROPERTIES:
            out["properties"] = sec.value
        elif sec.descriptor == S_APP_PROPERTIES:
            out["app_properties"] = sec.value
        elif sec.descriptor == S_DATA:
            out.setdefault("data", b"")
            out["data"] += sec.value
        elif sec.descriptor == S_AMQP_VALUE:
            out["value"] = sec.value
        else:
            out.setdefault("other", []).append(sec)
    return out
