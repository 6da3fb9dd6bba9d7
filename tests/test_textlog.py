"""Multiline assembly (imfile readMode/startmsg.regex analog)."""

import os

from rsyslog_ray.sources.textlog import (assemble_multiline,
                                         assemble_multiline_oracle,
                                         read_log_lines)

START = r"^\d{4}-\d{2}-\d{2} "

FILE_A = """2026-01-01 10:00:00 INFO start
2026-01-01 10:00:01 ERROR boom
  at com.example.Foo(Foo.java:1)
  at com.example.Bar(Bar.java:2)
2026-01-01 10:00:02 INFO recovered
"""

FILE_B = """leading junk without a date
2026-01-02 00:00:00 WARN first real
continuation
"""


def test_multiline_assembly(ray_session, tmp_path):
    pa_ = tmp_path / "a.log"
    pb = tmp_path / "b.log"
    pa_.write_text(FILE_A)
    pb.write_text(FILE_B)

    ds = read_log_lines([str(pa_), str(pb)])
    out = assemble_multiline(ds, START).to_pandas()

    for path, raw in ((str(pa_), FILE_A), (str(pb), FILE_B)):
        lines = raw.split("\n")[:-1]
        want = assemble_multiline_oracle(lines, START)
        got = (out[out["path"].str.endswith(os.path.basename(path))]
               .sort_values("record_no")["record"].tolist())
        assert got == want, path

    a = out[out["path"].str.endswith("a.log")].sort_values("record_no")
    assert a["n_lines"].tolist() == [1, 3, 1]  # stacktrace folded into one
    b = out[out["path"].str.endswith("b.log")].sort_values("record_no")
    assert b["record"].iloc[0] == "leading junk without a date"
    assert b["n_lines"].tolist() == [1, 2]


def test_octet_counted_framing_parser():
    """RFC6587 parser: exact frames, partial-frame remainder, invalid
    header stops cleanly (tcps_sess.c processDataRcvd semantics)."""
    from rsyslog_ray.sources.textlog import (split_lf_framed,
                                             split_octet_counted)

    frames, rem = split_octet_counted(b"5 hello3 abc")
    assert frames == ["hello", "abc"] and rem == b""
    # partial trailing frame stays as remainder
    frames, rem = split_octet_counted(b"5 hello10 incomp")
    assert frames == ["hello"] and rem == b"10 incomp"
    # partial length header
    frames, rem = split_octet_counted(b"12")
    assert frames == [] and rem == b"12"
    # invalid header -> nothing consumed past the valid prefix
    frames, rem = split_octet_counted(b"3 abcxyz junk")
    assert frames == ["abc"] and rem == b"xyz junk"
    # LF framing keeps the trailing partial
    frames, rem = split_lf_framed(b"a\nb\npartial")
    assert frames == ["a", "b"] and rem == b"partial"


def test_tcp_capture_to_parse(ray_session):
    """imtcp end-to-end: octet-framed syslog over a REAL socket ->
    capture -> Dataset -> the RFC5424 rulebase chain."""
    import socket
    import threading

    import pyarrow as pa

    from rsyslog_ray.rulebase import SYSLOG_RULEBASE
    from rsyslog_ray.sources.textlog import TcpCapture

    cap = TcpCapture()

    def send(n0, n):
        c = socket.create_connection(("127.0.0.1", cap.port))
        for i in range(n0, n0 + n):
            msg = (f"<34>1 2026-03-01T10:00:{i % 60:02d}.000Z host{i} "
                   f"app - ID{i} - value={i}").encode()
            c.sendall(b"%d %s" % (len(msg), msg))
        c.close()

    t1 = threading.Thread(target=send, args=(0, 40))
    t2 = threading.Thread(target=send, args=(100, 40))
    t1.start(); t2.start()
    ds = cap.capture(max_conns=2)
    t1.join(); t2.join()
    df = ds.to_pandas()
    assert len(df) == 80 and df["session"].nunique() == 2
    parsed = SYSLOG_RULEBASE.parse_table(
        pa.array(df["record"].tolist(), pa.string()))
    ok = parsed["parse_ok"].to_pandas()
    assert ok.all()
    hosts = parsed["hostname"].to_pandas()
    assert set(hosts) == {f"host{i}" for i in
                          list(range(40)) + list(range(100, 140))}


def test_unix_sock_capture(ray_session, tmp_path):
    """imuxsock analog: datagrams over a REAL AF_UNIX socket, one
    message per datagram, into the syslog rulebase."""
    import socket
    import threading

    import pyarrow as pa

    from rsyslog_ray.rulebase import SYSLOG_RULEBASE
    from rsyslog_ray.sources.textlog import UnixSockCapture

    path = str(tmp_path / "devlog")
    cap = UnixSockCapture(path)

    def send():
        c = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        for i in range(25):
            c.sendto((f"<13>1 2026-04-01T00:00:{i:02d}.000Z h{i} app - "
                      f"ID{i} - msg {i}").encode(), path)
        c.close()

    t = threading.Thread(target=send)
    t.start()
    ds = cap.capture(25)
    t.join()
    df = ds.to_pandas()
    assert len(df) == 25
    parsed = SYSLOG_RULEBASE.parse_table(
        pa.array(df["record"].tolist(), pa.string()))
    assert parsed["parse_ok"].to_pandas().all()
    assert set(parsed["hostname"].to_pandas()) == {f"h{i}" for i in range(25)}


def test_udp_capture(ray_session):
    """imudp analog: one datagram per message, sender recorded as peer
    (plugins/imudp/imudp.c:137-179 recvmmsg batch drain)."""
    import socket
    import threading

    import pyarrow as pa

    from rsyslog_ray.rulebase import SYSLOG_RULEBASE
    from rsyslog_ray.sources.textlog import UdpCapture

    cap = UdpCapture()

    def send():
        c = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        for i in range(25):
            c.sendto((f"<13>1 2026-04-01T00:00:{i:02d}.000Z u{i} app - "
                      f"ID{i} - msg {i}").encode(),
                     ("127.0.0.1", cap.port))
        c.close()

    t = threading.Thread(target=send)
    t.start()
    ds = cap.capture(25)
    t.join()
    df = ds.to_pandas()
    assert len(df) == 25
    assert set(df["peer"]) == {"127.0.0.1"}
    parsed = SYSLOG_RULEBASE.parse_table(
        pa.array(df["record"].tolist(), pa.string()))
    assert parsed["parse_ok"].to_pandas().all()
    assert set(parsed["hostname"].to_pandas()) == {f"u{i}" for i in range(25)}
