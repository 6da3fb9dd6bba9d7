"""RFC 3195 / BEEP: im3195 analog (plugins/im3195/im3195.c — the wire
is liblogging's, i.e. the public BEEP stack: RFC 3080 framing, RFC
3081 SEQ flow control, RFC 3195 RAW profile).  Codec byte-pins, a
hand-rolled raw-byte relay against the listener (so the server is
validated against literal wire bytes, not this repo's own encoder),
live engine-halves round-trips, and window/fragmentation/truncation
drills."""

import socket
import threading

import pandas as pd
import pytest

from rsyslog_ray.sources.syslog3195 import Beep3195Capture
from rsyslog_ray.stages.connectors import Beep3195Transport, ConnectorSink
from rsyslog_ray.state import beepwire as bw


# ---------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------

def test_beep_frame_byte_exact():
    # RFC 3080 §2.2.1 header layout, byte for byte
    assert bw.data_frame("MSG", 0, 1, 52, b"abc") == \
        b"MSG 0 1 . 52 3\r\nabcEND\r\n"
    assert bw.data_frame("ANS", 1, 0, 0, b"hi", ansno=7) == \
        b"ANS 1 0 . 0 2 7\r\nhiEND\r\n"
    assert bw.data_frame("RPY", 0, 0, 0, b"", more=True) == \
        b"RPY 0 0 * 0 0\r\nEND\r\n"
    assert bw.data_frame("NUL", 1, 0, 9, b"") == \
        b"NUL 1 0 . 9 0\r\nEND\r\n"
    assert bw.seq_frame(1, 4096, 4096) == b"SEQ 1 4096 4096\r\n"
    with pytest.raises(ValueError):
        bw.data_frame("ANS", 1, 0, 0, b"x")        # ansno required
    with pytest.raises(ValueError):
        bw.data_frame("MSG", 0, 0, 0, b"x", ansno=1)


def test_beep_reader_roundtrip_and_errors():
    a, b = socket.socketpair()
    try:
        a.sendall(bw.data_frame("MSG", 0, 1, 0, b"hello"))
        a.sendall(bw.seq_frame(0, 5, 4096))
        a.sendall(bw.data_frame("ANS", 1, 0, 0, b"part", more=True,
                                ansno=3))
        r = bw.FrameReader(b)
        assert r.read_frame() == ("MSG", 0, 1, False, 0, b"hello", None)
        assert r.read_frame() == ("SEQ", 0, 5, 4096)
        assert r.read_frame() == ("ANS", 1, 0, True, 0, b"part", 3)
        # missing END trailer is a protocol error
        a.sendall(b"MSG 0 2 . 5 3\r\nabcXXX\r\n")
        with pytest.raises(ConnectionError):
            r.read_frame()
    finally:
        a.close()
        b.close()


def test_mime_wrap_strip():
    assert bw.mime_wrap(b"body") == b"\r\nbody"
    wrapped = bw.mime_wrap(b"<x />", "application/beep+xml")
    assert wrapped == b"Content-Type: application/beep+xml\r\n\r\n<x />"
    assert bw.mime_strip(wrapped) == b"<x />"
    assert bw.mime_strip(b"\r\nraw") == b"raw"
    # a raw syslog body (no MIME block) passes through untouched —
    # '<13>...' is not a MIME field name
    raw = b"<13>Feb  5 17:32:18 host tag: colon: in body"
    assert bw.mime_strip(raw) == raw


def test_management_xml_parsers():
    st = bw.parse_start(bw.start_xml(1, bw.RAW_PROFILE_URI))
    assert st == (1, [bw.RAW_PROFILE_URI])
    assert bw.parse_profiles(bw.greeting_xml((bw.RAW_PROFILE_URI,))) == \
        [bw.RAW_PROFILE_URI]
    assert bw.parse_profiles(bw.greeting_xml()) == []
    assert bw.is_close(bw.close_xml())
    assert not bw.is_close(bw.start_xml(1, bw.RAW_PROFILE_URI))


# ---------------------------------------------------------------------
# raw-byte relay against the listener (strict: hand-built frames)
# ---------------------------------------------------------------------

def _drain_seq(reader):
    """Consume SEQ frames, return the first data frame."""
    while True:
        fr = reader.read_frame()
        if fr[0] != "SEQ":
            return fr


def test_listener_against_hand_built_frames(ray_session):
    cap = Beep3195Capture()
    got = {}

    def listen():
        got["ds"] = cap.capture(1)

    th = threading.Thread(target=listen)
    th.start()
    s = socket.create_connection(("127.0.0.1", cap.port), timeout=10)
    r = bw.FrameReader(s)
    try:
        # listener greeting: literal wire bytes, pinned
        fr = r.read_frame()
        assert fr[0] == "RPY" and fr[1] == 0 and fr[2] == 0
        assert fr[5].startswith(
            b"Content-Type: application/beep+xml\r\n\r\n<greeting>")
        assert b"http://iana.org/beep/SYSLOG/RAW" in fr[5]
        # hand-built client greeting + channel start
        greet = b"\r\n<greeting />"
        s.sendall(b"RPY 0 0 . 0 %d\r\n" % len(greet) + greet + b"END\r\n")
        start = (b"\r\n<start number='1'><profile "
                 b"uri='http://iana.org/beep/SYSLOG/RAW' /></start>")
        s.sendall(b"MSG 0 1 . %d %d\r\n" % (len(greet), len(start)) +
                  start + b"END\r\n")
        fr = _drain_seq(r)                     # <profile> RPY
        assert fr[0] == "RPY" and b"SYSLOG/RAW" in fr[5]
        fr = _drain_seq(r)                     # banner MSG on channel 1
        assert fr[0] == "MSG" and fr[1] == 1
        # two ANS replies: empty MIME block and explicit Content-Type
        m1 = b"\r\n<13>Feb  5 17:32:18 host tag: one"
        s.sendall(b"ANS 1 0 . 0 %d 0\r\n" % len(m1) + m1 + b"END\r\n")
        m2 = (b"Content-Type: application/octet-stream\r\n\r\n"
              b"<14>Feb  5 17:32:19 host tag: two")
        s.sendall(b"ANS 1 0 . %d %d 1\r\n" % (len(m1), len(m2)) + m2 +
                  b"END\r\n")
        s.sendall(b"NUL 1 0 . %d 0\r\nEND\r\n" % (len(m1) + len(m2)))
        close = b"\r\n<close number='0' code='200' />"
        s.sendall(b"MSG 0 2 . %d %d\r\n" %
                  (len(greet) + len(start), len(close)) +
                  close + b"END\r\n")
        fr = _drain_seq(r)                     # <ok /> RPY
        assert fr[0] == "RPY"
    finally:
        s.close()
    th.join(timeout=30)
    df = got["ds"].to_pandas()
    assert list(df["record"]) == [
        "<13>Feb  5 17:32:18 host tag: one",
        "<14>Feb  5 17:32:19 host tag: two"]
    assert set(df["peer"]) == {"127.0.0.1"}


# ---------------------------------------------------------------------
# engine halves: transport -> listener round-trips
# ---------------------------------------------------------------------

def test_3195_roundtrip(ray_session):
    cap = Beep3195Capture()
    got = {}

    def listen():
        got["ds"] = cap.capture(1)

    th = threading.Thread(target=listen)
    th.start()
    tr = Beep3195Transport("127.0.0.1", cap.port,
                           render=lambda rec: rec["line"])
    msgs = [f"<13>Feb  5 17:32:{i:02d} h app: msg {i}" for i in range(20)]
    sink = ConnectorSink(transport=tr, batch_rows=7)
    out = sink(pd.DataFrame({"line": msgs}))
    assert int(out["rows_delivered"].iloc[0]) == 20
    tr.close()
    th.join(timeout=30)
    df = got["ds"].to_pandas()
    assert list(df["record"]) == msgs
    assert cap.sessions_seen == 1


def test_3195_window_fragmentation_and_truncation(ray_session):
    # tiny listener window forces the relay to stall on SEQ extensions
    # and fragment with more='*'; maxline truncates per im3195.c:109-113
    cap = Beep3195Capture(window=256, maxline=1500)
    got = {}

    def listen():
        got["ds"] = cap.capture(1)

    th = threading.Thread(target=listen)
    th.start()
    tr = Beep3195Transport("127.0.0.1", cap.port,
                           render=lambda rec: rec["line"], max_frame=128)
    big = "<13>Feb  5 17:32:18 h app: " + "x" * 2000
    small = "<13>Feb  5 17:32:19 h app: ok"
    tr([{"line": big}, {"line": small}])
    tr.close()
    th.join(timeout=30)
    df = got["ds"].to_pandas()
    assert tr.window_stalls > 0
    assert cap.truncated == 1
    assert list(df["record"]) == [big[:1500], small]


# ---------------------------------------------------------------------
# property fuzz: arbitrary binary payloads, arbitrary fragment sizes
# ---------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(st.lists(st.binary(min_size=0, max_size=300), min_size=1,
                max_size=6),
       st.integers(min_value=1, max_value=97))
@settings(max_examples=40, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
def test_beep_fragmentation_fuzz(payloads, frag):
    """Any byte payload, any fragment size: frames written in `frag`-
    byte fragments with correct per-channel seqnos reassemble byte-
    identically through FrameReader (the listener's reassembly rule:
    accumulate per (channel, msgno, ansno) until more='.')."""
    a, b = socket.socketpair()
    try:
        seq = 0
        for ansno, p in enumerate(payloads):
            chunks = [p[i:i + frag] for i in range(0, len(p), frag)] or [b""]
            for ci, c in enumerate(chunks):
                a.sendall(bw.data_frame("ANS", 1, 0, seq, c,
                                        more=ci < len(chunks) - 1,
                                        ansno=ansno))
                seq += len(c)
        a.sendall(bw.data_frame("NUL", 1, 0, seq, b""))
        r = bw.FrameReader(b)
        partial: dict[int, bytes] = {}
        got = []
        while True:
            fr = r.read_frame()
            kw, _, _, more, _, payload, ansno = fr
            if kw == "NUL":
                break
            partial[ansno] = partial.get(ansno, b"") + payload
            if not more:
                got.append(partial.pop(ansno))
        assert got == list(payloads)
        assert not partial
    finally:
        a.close()
        b.close()
