"""RELP wire protocol: omrelp/imrelp analogs (plugins/omrelp/omrelp.c,
plugins/imrelp/imrelp.c — the wire itself is the published RELP spec,
re-expressed without librelp) — codec grammar, live confirmed-delivery
round-trips between the engine's own halves, and a spec-parsing server
double for the failure drills."""

import socket
import threading

import pandas as pd
import pytest

from rsyslog_ray.sources.relp import RelpCapture
from rsyslog_ray.stages.connectors import (ConnectorSink, RelpTransport,
                                           TransportSuspended)
from rsyslog_ray.state import relpwire as w


def _events(n):
    return pd.DataFrame({"event_id": range(n), "event_type": ["e"] * n})


# ---------------------------------------------------------------------
# codec
# ---------------------------------------------------------------------

def test_relp_frame_grammar_roundtrip():
    a, b = socket.socketpair()
    try:
        # data frame, zero-data frame, and data with embedded LF
        a.sendall(w.relp_frame(1, "open", b"relp_version=0"))
        a.sendall(w.relp_frame(2, "close"))
        a.sendall(w.relp_frame(3, "syslog", b"line1\nline2"))
        assert w.relp_read_frame(b) == (1, "open", b"relp_version=0")
        assert w.relp_read_frame(b) == (2, "close", b"")
        assert w.relp_read_frame(b) == (3, "syslog", b"line1\nline2")
        # byte-exact frame layout per the spec grammar
        assert w.relp_frame(7, "syslog", b"abc") == b"7 syslog 3 abc\n"
        assert w.relp_frame(8, "close") == b"8 close 0\n"
    finally:
        a.close()
        b.close()


def test_relp_codec_rejects_garbage():
    a, b = socket.socketpair()
    try:
        a.sendall(b"1 syslog 5 abc")  # truncated: datalen says 5
        a.close()
        with pytest.raises(ConnectionError):
            w.relp_read_frame(b)
    finally:
        b.close()
    assert w.rsp_code(b"200 OK\ncommands=syslog") == (200, "OK")
    assert w.rsp_code(b"500 ERR no")[0] == 500
    assert w.offers_decode(b"relp_version=0\ncommands=syslog") == {
        "relp_version": "0", "commands": "syslog"}


# ---------------------------------------------------------------------
# live round-trips (engine halves)
# ---------------------------------------------------------------------

def test_relp_confirmed_delivery_roundtrip(ray_session):
    cap = RelpCapture()
    got = {}

    def listen():
        got["ds"] = cap.capture(1)

    th = threading.Thread(target=listen)
    th.start()
    t = RelpTransport("127.0.0.1", cap.port, window_size=16,
                      render=lambda r: f"<13>m{r['event_id']}")
    sink = ConnectorSink(transport=t, batch_rows=100)
    out = sink(_events(250))
    t.close()
    th.join(timeout=15)
    assert not th.is_alive()
    assert int(out["rows_delivered"].iloc[0]) == 250
    df = got["ds"].to_pandas()
    # confirmed in-order delivery, one record per syslog frame
    assert list(df["record"]) == [f"<13>m{i}" for i in range(250)]
    assert cap.opens_seen == 1


def test_relp_rebind_interval_reopens_session(ray_session):
    cap = RelpCapture()
    got = {}

    def listen():
        got["ds"] = cap.capture(3)

    th = threading.Thread(target=listen)
    th.start()
    t = RelpTransport("127.0.0.1", cap.port, window_size=4,
                      rebind_interval=10,
                      render=lambda r: f"r{r['event_id']}")
    out = ConnectorSink(transport=t)(_events(25))
    t.close()
    th.join(timeout=15)
    assert not th.is_alive()
    assert int(out["rows_delivered"].iloc[0]) == 25
    df = got["ds"].to_pandas()
    assert sorted(df["record"]) == sorted(f"r{i}" for i in range(25))
    # 25 msgs / rebind every 10 = 3 sessions (omrelp rebindInterval)
    assert cap.opens_seen == 3
    assert set(df["session"]) == {0, 1, 2}


def test_relp_max_data_size_rejects_then_suspends(ray_session):
    cap = RelpCapture(max_data_size=32)
    th = threading.Thread(target=cap.capture, args=(1,), daemon=True)
    th.start()
    sink = ConnectorSink(
        transport=RelpTransport("127.0.0.1", cap.port,
                                render=lambda r: "x" * 100),
        max_retries=1, backoff_base_s=0.01)
    with pytest.raises(TransportSuspended):
        sink(_events(1))


def test_relp_over_tls(ray_session, tmp_path):
    """omrelp.c:269 relpCltEnableTLS — the session handshake and
    confirmed delivery run unchanged above a TLS wrap, client
    verifying the server cert."""
    import ssl

    pytest.importorskip("cryptography")
    from test_connectors import _self_signed

    cert, key = _self_signed(tmp_path)
    srv_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
    srv_ctx.load_cert_chain(cert, key)
    cli_ctx = ssl.create_default_context(cafile=cert)

    cap = RelpCapture(ssl_context=srv_ctx)
    got = {}

    def listen():
        got["ds"] = cap.capture(1)

    th = threading.Thread(target=listen)
    th.start()
    t = RelpTransport("127.0.0.1", cap.port, ssl_context=cli_ctx,
                      server_hostname="localhost",
                      render=lambda r: f"s{r['event_id']}")
    out = ConnectorSink(transport=t)(_events(8))
    t.close()
    th.join(timeout=15)
    assert not th.is_alive()
    assert int(out["rows_delivered"].iloc[0]) == 8
    assert list(got["ds"].to_pandas()["record"]) == \
        [f"s{i}" for i in range(8)]


# ---------------------------------------------------------------------
# spec-parsing double: grammar asserted on every received byte
# ---------------------------------------------------------------------

class MiniRelpServer:
    """Counterparty that parses frames strictly, records them, and can
    nack the first syslog once (rsp 500) to drive the retry path."""

    def __init__(self, fail_first: bool = False):
        self.frames: list[tuple[int, str, bytes]] = []
        self.fail_first = fail_first
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn):
        try:
            while True:
                txnr, cmd, data = w.relp_read_frame(conn)
                self.frames.append((txnr, cmd, data))
                if cmd == "open":
                    offers = w.offers_decode(data)
                    assert offers["relp_version"] == "0"
                    assert "syslog" in offers["commands"]
                    conn.sendall(w.relp_frame(
                        txnr, "rsp",
                        b"200 OK\nrelp_version=0\ncommands=syslog"))
                elif cmd == "syslog" and self.fail_first:
                    self.fail_first = False
                    conn.sendall(w.relp_frame(txnr, "rsp",
                                              b"500 ERR try later"))
                elif cmd == "syslog":
                    conn.sendall(w.relp_frame(txnr, "rsp", b"200 OK"))
                elif cmd == "close":
                    conn.sendall(w.relp_frame(txnr, "rsp", b"200 OK"))
                    conn.sendall(w.relp_frame(0, "serverclose"))
                    return
        except (OSError, ConnectionError, AssertionError, ValueError):
            pass
        finally:
            conn.close()

    def stop(self):
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()


def test_relp_nack_retries_and_txnr_monotonic():
    srv = MiniRelpServer(fail_first=True)
    try:
        t = RelpTransport("127.0.0.1", srv.port, window_size=2,
                          render=lambda r: f"n{r['event_id']}")
        out = ConnectorSink(transport=t, backoff_base_s=0.01)(_events(5))
        t.close()
        assert int(out["rows_delivered"].iloc[0]) == 5
        # first attempt nacked mid-bulk; retry reopened and resent the
        # WHOLE bulk (at-least-once), so the double saw 2 opens and the
        # final session carries all 5 records
        opens = [f for f in srv.frames if f[1] == "open"]
        assert len(opens) == 2
        last_open = max(i for i, f in enumerate(srv.frames)
                        if f[1] == "open")
        replay = [f[2] for f in srv.frames[last_open + 1:]
                  if f[1] == "syslog"]
        assert replay == [f"n{i}".encode() for i in range(5)]
        # txnr strictly monotonic per the spec across the connection
        for sess_frames in (srv.frames[:last_open],
                            srv.frames[last_open:]):
            txnrs = [f[0] for f in sess_frames]
            assert txnrs == sorted(txnrs)
    finally:
        srv.stop()
