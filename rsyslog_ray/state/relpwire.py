"""RELP (Reliable Event Logging Protocol) wire codec.

The reference's omrelp/imrelp (plugins/omrelp/omrelp.c,
plugins/imrelp/imrelp.c) delegate the wire to librelp; the protocol
itself is published (RELP spec, R. Gerhards 2008) and tiny:

    FRAME   = HEADER [SP DATA] TRAILER
    HEADER  = TXNR SP COMMAND SP DATALEN
    TXNR    = decimal 1..999999999 (client), 0 = server-initiated
    TRAILER = LF

Commands: ``open`` (offer negotiation: LF-separated ``name=value``
lines — relp_version, relp_software, commands), ``syslog`` (one
message per frame), ``close``, ``rsp`` (response; DATA begins with
``<code> <text>``, 200 = OK), ``serverclose``.  Every client command
is confirmed by an ``rsp`` carrying the same TXNR — that confirmed
delivery is the entire point of RELP vs plain TCP syslog.
"""

from __future__ import annotations

MAX_TXNR = 999_999_999


def relp_frame(txnr: int, command: str, data: bytes = b"") -> bytes:
    hdr = f"{txnr} {command} {len(data)}".encode()
    return hdr + (b" " + data if data else b"") + b"\n"


def relp_read_frame(sock) -> tuple[int, str, bytes]:
    """Read one frame; returns (txnr, command, data).  Raises
    ConnectionError on EOF or grammar violations."""
    txnr = int(_token(sock, b" "))
    command = _token(sock, b" ").decode()
    # DATALEN is terminated by SP when data follows, LF when 0
    buf = bytearray()
    while True:
        c = _one(sock)
        if c in (b" ", b"\n"):
            break
        buf += c
    datalen = int(buf)
    if c == b"\n":
        if datalen != 0:
            raise ConnectionError("relp: missing data after datalen")
        return txnr, command, b""
    data = _exact(sock, datalen)
    if _one(sock) != b"\n":
        raise ConnectionError("relp: missing frame trailer")
    return txnr, command, data


def rsp_code(data: bytes) -> tuple[int, str]:
    """Split an rsp DATA into (status code, human text)."""
    head = data.split(b"\n", 1)[0]
    code, _, text = head.partition(b" ")
    return int(code), text.decode(errors="replace")


def offers_decode(data: bytes) -> dict[str, str]:
    out = {}
    for line in data.decode().splitlines():
        if line:
            k, _, v = line.partition("=")
            out[k] = v
    return out


def offers_encode(offers: dict[str, str]) -> bytes:
    return "\n".join(f"{k}={v}" for k, v in offers.items()).encode()


def _one(sock) -> bytes:
    c = sock.recv(1)
    if not c:
        raise ConnectionError("relp peer closed")
    return c


def _token(sock, sep: bytes) -> bytes:
    buf = bytearray()
    while True:
        c = _one(sock)
        if c == sep:
            return bytes(buf)
        buf += c
        if len(buf) > 32:
            raise ConnectionError("relp: runaway header token")


def _exact(sock, n: int) -> bytes:
    buf = bytearray()
    while len(buf) < n:
        got = sock.recv(n - len(buf))
        if not got:
            raise ConnectionError("relp peer closed mid-frame")
        buf += got
    return bytes(buf)
