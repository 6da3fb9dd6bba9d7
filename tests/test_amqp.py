"""omrabbitmq analog over AMQP 0-9-1 (contrib/omrabbitmq/omrabbitmq.c;
the wire is the published spec, re-expressed without rabbitmq-c) — a
broker double that re-parses every frame with the independent Reader
and drives PLAIN auth, exchange declare, publish and close drills."""

import socket
import struct
import threading

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import (AmqpTransport, ConnectorSink,
                                           TransportSuspended)
from rsyslog_ray.state import amqpwire as w


class MiniRabbitServer:
    def __init__(self, password: str = "guest"):
        self.password = password
        self.published: list[dict] = []
        self.declares: list[tuple[str, str, int]] = []
        self.logins: list[tuple[str, str, str]] = []
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
            hdr = w._exact(conn, 8)
            assert hdr == w.PROTO_HEADER
            conn.sendall(w.method(
                0, w.CONN_START,
                bytes([0, 9]) + w.table({}) + w.longstr(b"PLAIN")
                + w.longstr(b"en_US")))
            pending = None       # (exchange, routing_key, props...)
            body_left = 0
            msg = {}
            while True:
                ftype, ch, payload = w.read_frame(conn)
                if ftype == w.FRAME_METHOD:
                    cm, args = w.parse_method(payload)
                    r = w.Reader(args)
                    if cm == w.CONN_START_OK:
                        r.longstr()            # client properties skip
                        mech = r.shortstr()
                        resp = r.longstr()
                        _, user, pw = resp.split(b"\x00")
                        self.logins.append((mech, user.decode(),
                                            pw.decode()))
                        if pw.decode() != self.password:
                            conn.sendall(w.method(
                                0, w.CONN_CLOSE,
                                struct.pack(">H", 403)
                                + w.shortstr("ACCESS_REFUSED")
                                + struct.pack(">HH", 0, 0)))
                            return
                        conn.sendall(w.method(
                            0, w.CONN_TUNE,
                            struct.pack(">HIH", 2047, 131072, 60)))
                    elif cm == w.CONN_TUNE_OK:
                        pass
                    elif cm == w.CONN_OPEN:
                        vhost = r.shortstr()
                        msg["vhost"] = vhost
                        conn.sendall(w.method(0, w.CONN_OPEN_OK,
                                              w.shortstr("")))
                    elif cm == w.CH_OPEN:
                        conn.sendall(w.method(ch, w.CH_OPEN_OK,
                                              w.longstr(b"")))
                    elif cm == w.EXCH_DECLARE:
                        r.u16()
                        name = r.shortstr()
                        typ = r.shortstr()
                        bits = r.u8()
                        self.declares.append((name, typ, bits))
                        conn.sendall(w.method(ch, w.EXCH_DECLARE_OK))
                    elif cm == w.BASIC_PUBLISH:
                        r.u16()
                        pending = {"exchange": r.shortstr(),
                                   "routing_key": r.shortstr(),
                                   "vhost": msg.get("vhost")}
                    else:
                        raise AssertionError(f"unexpected {cm}")
                elif ftype == w.FRAME_HEADER:
                    r = w.Reader(payload)
                    assert r.u16() == 60 and r.u16() == 0
                    body_left = r.u64()
                    flags = r.u16()
                    if flags & w.FLAG_CONTENT_TYPE:
                        pending["content_type"] = r.shortstr()
                    if flags & w.FLAG_DELIVERY_MODE:
                        pending["delivery_mode"] = r.u8()
                    pending["body"] = b""
                elif ftype == w.FRAME_BODY:
                    pending["body"] += payload
                    body_left -= len(payload)
                    if body_left <= 0:
                        self.published.append(pending)
                        pending = None
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


def test_amqp_publish_with_declare():
    srv = MiniRabbitServer()
    try:
        t = AmqpTransport("127.0.0.1", srv.port, user="ray",
                          password="guest", vhost="/logs",
                          exchange="syslog", exchange_type="topic",
                          durable=True, delivery_mode=2,
                          routing_key_field="sev",
                          render=lambda r: r["msg"])
        out = ConnectorSink(transport=t, batch_rows=100)(pd.DataFrame({
            "msg": [f"m{i}" for i in range(5)],
            "sev": [f"syslog.{i % 2}" for i in range(5)]}))
        t.close()
        assert int(out["rows_delivered"].iloc[0]) == 5
        import time
        for _ in range(100):          # server thread drains async
            if len(srv.published) == 5:
                break
            time.sleep(0.02)
        assert srv.logins == [("PLAIN", "ray", "guest")]
        assert srv.declares == [("syslog", "topic", 0x02)]  # durable
        p0 = srv.published[0]
        assert (p0["exchange"], p0["routing_key"], p0["vhost"]) == \
            ("syslog", "syslog.0", "/logs")
        assert (p0["content_type"], p0["delivery_mode"]) == \
            ("application/json", 2)   # persistent
        assert [p["body"] for p in srv.published] == \
            [f"m{i}".encode() for i in range(5)]
        assert [p["routing_key"] for p in srv.published] == \
            ["syslog.0", "syslog.1", "syslog.0", "syslog.1",
             "syslog.0"]
    finally:
        srv.stop()


def test_amqp_large_body_fragments():
    srv = MiniRabbitServer()
    try:
        big = "z" * 300_000          # past the tuned 131072 frame max
        t = AmqpTransport("127.0.0.1", srv.port,
                          render=lambda r: r["msg"])
        ConnectorSink(transport=t)(pd.DataFrame({"msg": [big]}))
        t.close()
        import time
        for _ in range(100):
            if srv.published:
                break
            time.sleep(0.02)
        assert srv.published[0]["body"] == big.encode()
    finally:
        srv.stop()


def test_amqp_bad_credentials_suspend():
    srv = MiniRabbitServer(password="right")
    try:
        sink = ConnectorSink(
            transport=AmqpTransport("127.0.0.1", srv.port,
                                    password="wrong"),
            max_retries=2, backoff_base_s=0.01)
        with pytest.raises(TransportSuspended, match="ACCESS_REFUSED"):
            sink(pd.DataFrame({"m": ["x"]}))
    finally:
        srv.stop()
