"""BEEP wire codec for RFC 3195 syslog (the protocol behind im3195).

The reference's plugins/im3195/im3195.c is a thin shim over liblogging
(srAPISetupListener at im3195.c:228, OnReceive at im3195.c:131); the
actual wire is public: BEEP framing per RFC 3080 §2.2.1, the TCP
mapping's SEQ flow-control frames per RFC 3081 §3.1.3, and the syslog
RAW profile per RFC 3195 §3 (profile URI
``http://iana.org/beep/SYSLOG/RAW``).  This module implements only
what that stack needs — data frames (MSG/RPY/ERR/ANS/NUL), SEQ
frames, the MIME payload envelope, and the channel-0 management XML
(greeting / start / profile / close / ok).

Framing (RFC 3080 §2.2.1)::

    header  = keyword SP channel SP msgno SP more SP seqno SP size
              [SP ansno] CRLF          ; ansno only for ANS
    frame   = header payload "END" CRLF
    SEQ     = "SEQ" SP channel SP ackno SP window CRLF   ; RFC 3081

``more`` is ``*`` (continuation follows) or ``.`` (complete).
``seqno`` counts payload octets per channel.  Payloads carry a MIME
header block; an empty block (a bare CRLF) means the default
Content-Type application/octet-stream (RFC 3080 §2.2).
"""

from __future__ import annotations

import re

RAW_PROFILE_URI = "http://iana.org/beep/SYSLOG/RAW"
BEEP_XML_MIME = b"Content-Type: application/beep+xml\r\n\r\n"
DEFAULT_WINDOW = 4096  # RFC 3081 §3.1.4: initial window is 4096 octets

_DATA_KEYWORDS = ("MSG", "RPY", "ERR", "ANS", "NUL")
# an RFC2822 field name followed by ':' — used to tell a MIME header
# block from a raw syslog body (which starts with '<PRI>').
_MIME_FIELD = re.compile(rb"^[A-Za-z][A-Za-z0-9-]*:")


class BeepProtocolError(ConnectionError):
    pass


# ---------------------------------------------------------------------
# frame encode
# ---------------------------------------------------------------------

def data_frame(keyword: str, channel: int, msgno: int, seqno: int,
               payload: bytes, *, more: bool = False,
               ansno: int | None = None) -> bytes:
    """One BEEP data frame, byte-exact per RFC 3080 §2.2.1."""
    if keyword not in _DATA_KEYWORDS:
        raise ValueError(f"not a BEEP data keyword: {keyword}")
    if (keyword == "ANS") != (ansno is not None):
        raise ValueError("ansno is required for ANS and forbidden else")
    head = (f"{keyword} {channel} {msgno} {'*' if more else '.'} "
            f"{seqno} {len(payload)}")
    if ansno is not None:
        head += f" {ansno}"
    return head.encode() + b"\r\n" + payload + b"END\r\n"


def seq_frame(channel: int, ackno: int, window: int) -> bytes:
    """RFC 3081 §3.1.3 flow-control frame (no payload, no trailer)."""
    return f"SEQ {channel} {ackno} {window}\r\n".encode()


def mime_wrap(body: bytes, content_type: str | None = None) -> bytes:
    """Prefix the RFC 3080 §2.2 MIME entity-header block; ``None`` is
    the empty block (= default application/octet-stream)."""
    if content_type is None:
        return b"\r\n" + body
    return f"Content-Type: {content_type}\r\n\r\n".encode() + body


def mime_strip(payload: bytes) -> bytes:
    """Drop a leading MIME header block if one is present.  A payload
    beginning with CRLF is the empty block; otherwise only strip when
    the first line parses as a MIME field (raw syslog bodies start
    with '<PRI>' and never do)."""
    if payload.startswith(b"\r\n"):
        return payload[2:]
    if _MIME_FIELD.match(payload):
        end = payload.find(b"\r\n\r\n")
        if end >= 0:
            return payload[end + 4:]
    return payload


# ---------------------------------------------------------------------
# frame decode (buffered reader over a socket)
# ---------------------------------------------------------------------

class FrameReader:
    """Incremental BEEP frame parser over a blocking socket."""

    def __init__(self, sock, max_payload: int = 1 << 22):
        self._sock = sock
        self._buf = b""
        self.max_payload = max_payload

    def _fill(self) -> None:
        chunk = self._sock.recv(65536)
        if not chunk:
            raise BeepProtocolError("peer closed mid-frame")
        self._buf += chunk

    def _line(self) -> bytes:
        while b"\r\n" not in self._buf:
            if len(self._buf) > 1024:
                raise BeepProtocolError("unterminated BEEP header")
            self._fill()
        line, self._buf = self._buf.split(b"\r\n", 1)
        return line

    def _exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            self._fill()
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    def read_frame(self):
        """Returns ``("SEQ", channel, ackno, window)`` or
        ``(keyword, channel, msgno, more, seqno, payload, ansno)``."""
        parts = self._line().split(b" ")
        kw = parts[0].decode("ascii", "replace")
        if kw == "SEQ":
            if len(parts) != 4:
                raise BeepProtocolError("malformed SEQ frame")
            return ("SEQ", int(parts[1]), int(parts[2]), int(parts[3]))
        if kw not in _DATA_KEYWORDS:
            raise BeepProtocolError(f"unknown BEEP keyword {kw!r}")
        want = 7 if kw == "ANS" else 6
        if len(parts) != want or parts[3] not in (b"*", b"."):
            raise BeepProtocolError(f"malformed {kw} header")
        size = int(parts[5])
        if size > self.max_payload:
            raise BeepProtocolError(f"frame size {size} over limit")
        payload = self._exact(size)
        if self._exact(5) != b"END\r\n":
            raise BeepProtocolError("missing END trailer")
        ansno = int(parts[6]) if kw == "ANS" else None
        return (kw, int(parts[1]), int(parts[2]), parts[3] == b"*",
                int(parts[4]), payload, ansno)


# ---------------------------------------------------------------------
# channel-0 management payloads (RFC 3080 §2.3.1)
# ---------------------------------------------------------------------

def greeting_xml(profile_uris: tuple[str, ...] = ()) -> bytes:
    inner = "".join(f"<profile uri='{u}' />" for u in profile_uris)
    xml = f"<greeting>{inner}</greeting>" if inner else "<greeting />"
    return mime_wrap(xml.encode(), "application/beep+xml")


def start_xml(number: int, profile_uri: str) -> bytes:
    xml = (f"<start number='{number}'>"
           f"<profile uri='{profile_uri}' /></start>")
    return mime_wrap(xml.encode(), "application/beep+xml")


def profile_xml(profile_uri: str) -> bytes:
    return mime_wrap(f"<profile uri='{profile_uri}' />".encode(),
                     "application/beep+xml")


def close_xml(number: int = 0, code: int = 200) -> bytes:
    return mime_wrap(f"<close number='{number}' code='{code}' />".encode(),
                     "application/beep+xml")


def ok_xml() -> bytes:
    return mime_wrap(b"<ok />", "application/beep+xml")


def error_xml(code: int, text: str) -> bytes:
    return mime_wrap(f"<error code='{code}'>{text}</error>".encode(),
                     "application/beep+xml")


_START_RE = re.compile(
    rb"<start\s+number=['\"](\d+)['\"]\s*>.*?"
    rb"<profile\s+uri=['\"]([^'\"]+)['\"]", re.S)
_PROFILE_RE = re.compile(rb"<profile\s+uri=['\"]([^'\"]+)['\"]")
_CLOSE_RE = re.compile(rb"<close\b")


def parse_start(payload: bytes) -> tuple[int, list[str]] | None:
    """channel number + offered profile URIs from a <start> element."""
    body = mime_strip(payload)
    m = _START_RE.search(body)
    if not m:
        return None
    uris = [u.decode() for u in _PROFILE_RE.findall(body)]
    return int(m.group(1)), uris


def is_close(payload: bytes) -> bool:
    return _CLOSE_RE.search(mime_strip(payload)) is not None


def parse_profiles(payload: bytes) -> list[str]:
    return [u.decode() for u in _PROFILE_RE.findall(mime_strip(payload))]
