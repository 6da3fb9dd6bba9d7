"""ZMTP 3.0 wire codec — omczmq/imczmq without libzmq.

The reference's czmq modules (contrib/omczmq/omczmq.c,
contrib/imczmq/imczmq.c) link czmq/libzmq; the transport protocol
itself is the published ZMTP 3.0 spec (zeromq RFC 23):

    greeting  = signature(%xFF 8%x00 %x7F) version(3,0)
                mechanism("NULL" padded to 20) as-server(1 octet)
                filler(31 %x00)                         ; 64 octets
    frame     = flags length body
    flags     = bit2 COMMAND, bit1 LONG, bit0 MORE
    length    = 1 octet, or 8 octets big-endian when LONG
    command   = name-length(1) name  body                (COMMAND set)
    READY     = metadata as (name-len(1) name value-len(4BE) value)*

The NULL security handshake is a READY exchange carrying the
``Socket-Type`` property; peers verify the advertised types pair
(PUSH↔PULL, PUB↔SUB).  SUB sockets subscribe with a ``\\x01topic``
message (the 3.0 subscription form libzmq emits on the wire)."""

from __future__ import annotations

VALID_PAIRS = {("PUSH", "PULL"), ("PULL", "PUSH"),
               ("PUB", "SUB"), ("SUB", "PUB"),
               ("PAIR", "PAIR"), ("REQ", "REP"), ("REP", "REQ")}


def greeting(as_server: bool = False) -> bytes:
    sig = b"\xFF" + b"\x00" * 8 + b"\x7F"
    mech = b"NULL" + b"\x00" * 16
    return (sig + bytes([3, 0]) + mech
            + (b"\x01" if as_server else b"\x00") + b"\x00" * 31)


def read_greeting(sock) -> None:
    g = _exact(sock, 64)
    if g[0] != 0xFF or g[9] != 0x7F:
        raise ConnectionError("zmtp: bad greeting signature")
    if g[10] != 3:
        raise ConnectionError(f"zmtp: unsupported version {g[10]}")
    if g[12:32].rstrip(b"\x00") != b"NULL":
        raise ConnectionError("zmtp: only the NULL mechanism is spoken")


def frame(body: bytes, *, more: bool = False,
          command: bool = False) -> bytes:
    flags = (4 if command else 0) | (1 if more else 0)
    if len(body) > 255:
        return bytes([flags | 2]) + len(body).to_bytes(8, "big") + body
    return bytes([flags, len(body)]) + body


def read_frame(sock) -> tuple[bytes, bool, bool]:
    """Returns (body, more, is_command)."""
    flags = _exact(sock, 1)[0]
    if flags & 2:
        n = int.from_bytes(_exact(sock, 8), "big")
    else:
        n = _exact(sock, 1)[0]
    return _exact(sock, n), bool(flags & 1), bool(flags & 4)


def ready(socket_type: str, **props: str) -> bytes:
    body = b"\x05READY"
    for k, v in {"Socket-Type": socket_type, **props}.items():
        kv = k.encode()
        vv = v.encode()
        body += bytes([len(kv)]) + kv + len(vv).to_bytes(4, "big") + vv
    return frame(body, command=True)


def parse_ready(body: bytes) -> dict[str, str]:
    if body[:6] != b"\x05READY":
        name_len = body[0]
        raise ConnectionError(
            f"zmtp: expected READY, got {body[1:1 + name_len]!r}")
    props, pos = {}, 6
    while pos < len(body):
        nl = body[pos]
        name = body[pos + 1:pos + 1 + nl].decode()
        pos += 1 + nl
        vl = int.from_bytes(body[pos:pos + 4], "big")
        props[name] = body[pos + 4:pos + 4 + vl].decode()
        pos += 4 + vl
    return props


def handshake(sock, socket_type: str) -> str:
    """Full connect-side/accept-side NULL handshake (symmetric):
    exchange greetings + READYs, verify the type pairing; returns the
    peer's socket type."""
    sock.sendall(greeting())
    read_greeting(sock)
    sock.sendall(ready(socket_type))
    body, _more, is_cmd = read_frame(sock)
    if not is_cmd:
        raise ConnectionError("zmtp: message before handshake")
    peer = parse_ready(body).get("Socket-Type", "")
    if (socket_type, peer) not in VALID_PAIRS:
        raise ConnectionError(
            f"zmtp: socket types do not pair: {socket_type}/{peer}")
    return peer


def _exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        got = sock.recv(n - len(buf))
        if not got:
            raise ConnectionError("zmtp peer closed")
        buf += got
    return bytes(buf)
