"""omamqp1 / omazureeventhubs over the real AMQP 1.0 wire protocol,
against a broker double that drives the SERVER side of the spec with
the independent decoder: SASL PLAIN / ANONYMOUS layers, open/begin/
attach echo, flow credit grants, transfer reassembly (``more`` flag),
and per-delivery dispositions."""
import socket
import threading

import pandas as pd
import pytest

from rsyslog_ray.state import amqp1wire as w
from rsyslog_ray.stages.connectors import (Amqp1Transport, ConnectorSink,
                                           EventHubsTransport,
                                           TransportSuspended)


class _Amqp1Broker:
    """Server half: validates the layering and credentials, grants
    credit, reassembles multi-frame transfers, answers dispositions."""

    def __init__(self, *, user=None, password=None, credit=5,
                 max_frame=65536, sasl_outcome=0, reject_ids=()):
        self.user, self.password = user, password
        self.credit = credit
        self.max_frame = max_frame
        self.sasl_outcome = sasl_outcome
        self.reject_ids = set(reject_ids)
        self.opens = []          # container ids
        self.attaches = []       # (link-name, role, target-address)
        self.messages = []       # parsed message dicts
        self.transfer_frames = 0
        self.sasl_seen = []      # (mechanism, user, password)
        self.errors = []
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(4)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._th = threading.Thread(target=self._serve, daemon=True)
        self._th.start()

    def stop(self):
        self._stop = True
        self._srv.close()

    # -- server side ---------------------------------------------------
    def _serve(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            try:
                self._session(conn)
            except (ConnectionError, OSError) as ex:
                self.errors.append(str(ex))
            finally:
                conn.close()

    def _session(self, conn):
        hdr = w.read_exact(conn, 8)
        if hdr == w.SASL_HEADER:
            conn.sendall(w.SASL_HEADER)
            conn.sendall(w.frame(w.FRAME_SASL, 0, w.performative(
                w.SASL_MECHANISMS,
                [w.Array([w.Symbol("PLAIN"), w.Symbol("ANONYMOUS")])])))
            _ft, _ch, init, _ = w.read_frame(conn)
            assert init.descriptor == w.SASL_INIT
            mech = str(w.field(init, 0))
            if mech == "PLAIN":
                resp = bytes(w.field(init, 1, b""))
                _z, u, p = resp.split(b"\x00")
                self.sasl_seen.append((mech, u.decode(), p.decode()))
                ok = (self.user is None or
                      (u.decode() == self.user and
                       p.decode() == self.password))
            else:
                self.sasl_seen.append((mech, None, None))
                ok = self.user is None
            code = self.sasl_outcome if ok else 1
            conn.sendall(w.frame(w.FRAME_SASL, 0,
                                 w.performative(w.SASL_OUTCOME, [code])))
            if code != 0:
                return
            hdr = w.read_exact(conn, 8)
        assert hdr == w.AMQP_HEADER, hdr
        conn.sendall(w.AMQP_HEADER)
        delivered = 0
        frag = b""
        while True:
            ftype, ch, perf, payload = w.read_frame(conn)
            if perf is None:
                continue
            d = perf.descriptor
            if d == w.OPEN:
                self.opens.append(str(w.field(perf, 0)))
                conn.sendall(w.frame(w.FRAME_AMQP, 0, w.performative(
                    w.OPEN, ["broker", None, self.max_frame])))
            elif d == w.BEGIN:
                conn.sendall(w.frame(w.FRAME_AMQP, ch, w.performative(
                    w.BEGIN, [0, 0, 2048, 2048])))
            elif d == w.ATTACH:
                tgt = w.field(perf, 6)
                addr = (w.field(tgt, 0) if isinstance(tgt, w.Described)
                        else None)
                self.attaches.append((str(w.field(perf, 0)),
                                      bool(w.field(perf, 2)), addr))
                conn.sendall(w.frame(w.FRAME_AMQP, ch, w.performative(
                    w.ATTACH, [w.field(perf, 0), 0, True, 0, 0,
                               w.field(perf, 5), tgt])))
                conn.sendall(self._flow(ch, delivered))
            elif d == w.TRANSFER:
                self.transfer_frames += 1
                did = int(w.field(perf, 1, 0))
                frag += payload
                if w.field(perf, 5, False):      # more
                    continue
                self.messages.append(w.parse_message(frag))
                frag = b""
                delivered += 1
                state = (w.Described(w.REJECTED, [])
                         if did in self.reject_ids
                         else w.Described(w.ACCEPTED, []))
                conn.sendall(w.frame(w.FRAME_AMQP, ch, w.performative(
                    w.DISPOSITION, [True, did, did, True, state])))
                conn.sendall(self._flow(ch, delivered))
            elif d == w.CLOSE:
                conn.sendall(w.frame(w.FRAME_AMQP, 0,
                                     w.performative(w.CLOSE, [])))
                return
            elif d in (w.DETACH, w.END):
                pass

    def _flow(self, ch, delivered):
        # [next-in-id, in-window, next-out-id, out-window, handle,
        #  delivery-count, link-credit]
        return w.frame(w.FRAME_AMQP, ch, w.performative(
            w.FLOW, [delivered, 2048, 0, 2048, 0, delivered,
                     self.credit]))


def _rows(n):
    return pd.DataFrame({"k": list(range(n)),
                         "msg": [f"log line {i}" for i in range(n)]})


def test_omamqp1_sasl_plain_list_body():
    """The committed bulk arrives as ONE message whose amqp-value body
    is the LIST of rendered strings (omamqp1.c:251-303); the double
    validated the PLAIN initial response and the attach target."""
    broker = _Amqp1Broker(user="joe", password="s3cret")
    try:
        out = ConnectorSink(transport=Amqp1Transport(
            "127.0.0.1", broker.port, target="amq.topic/logs",
            user="joe", password="s3cret", container="ray-c1",
            render=lambda r: r["msg"]), batch_rows=100)(_rows(4))
        assert out["rows_delivered"].iloc[0] == 4
        assert broker.sasl_seen == [("PLAIN", "joe", "s3cret")]
        assert broker.opens == ["ray-c1"]
        name, role, addr = broker.attaches[0]
        assert role is False and addr == "amq.topic/logs"
        assert len(broker.messages) == 1
        assert broker.messages[0]["value"] == [f"log line {i}"
                                               for i in range(4)]
    finally:
        broker.stop()


def test_omamqp1_disable_sasl_and_anonymous():
    # disableSASL (omamqp1.c:165): straight to the AMQP layer
    broker = _Amqp1Broker()
    try:
        ConnectorSink(transport=Amqp1Transport(
            "127.0.0.1", broker.port, target="t", disable_sasl=True,
            render=lambda r: r["msg"]), batch_rows=100)(_rows(1))
        assert broker.sasl_seen == []
        assert len(broker.messages) == 1
    finally:
        broker.stop()

    # no user configured -> ANONYMOUS over the SASL layer
    broker = _Amqp1Broker()
    try:
        ConnectorSink(transport=Amqp1Transport(
            "127.0.0.1", broker.port, target="t",
            render=lambda r: r["msg"]), batch_rows=100)(_rows(1))
        assert broker.sasl_seen == [("ANONYMOUS", None, None)]
    finally:
        broker.stop()


def test_omamqp1_honors_peer_max_frame_multi_transfer():
    """A body larger than the peer's open.max-frame-size goes out as
    several transfer frames with more=true; the double reassembles."""
    broker = _Amqp1Broker(max_frame=512)
    try:
        big = "z" * 3000
        df = pd.DataFrame({"msg": [big]})
        ConnectorSink(transport=Amqp1Transport(
            "127.0.0.1", broker.port, target="t", disable_sasl=True,
            render=lambda r: r["msg"]), batch_rows=100)(df)
        assert broker.transfer_frames > 1
        assert broker.messages[0]["value"] == [big]
    finally:
        broker.stop()


def test_omamqp1_reject_and_auth_failure():
    broker = _Amqp1Broker(reject_ids={0})
    try:
        with pytest.raises(TransportSuspended):
            ConnectorSink(transport=Amqp1Transport(
                "127.0.0.1", broker.port, target="t", disable_sasl=True,
                render=lambda r: r["msg"]), batch_rows=100, max_retries=2,
                backoff_base_s=0.01)(_rows(1))
    finally:
        broker.stop()

    broker = _Amqp1Broker(user="joe", password="right")
    try:
        with pytest.raises(TransportSuspended):
            ConnectorSink(transport=Amqp1Transport(
                "127.0.0.1", broker.port, target="t", user="joe",
                password="wrong", render=lambda r: r["msg"]),
                batch_rows=100, max_retries=2, backoff_base_s=0.01)(
                _rows(1))
    finally:
        broker.stop()


def test_eventhubs_per_row_messages():
    """omazureeventhubs: one message PER ROW with a string message-id,
    content-type application/octet-stream, the configured
    eventProperties map, creation-time from the clock, and the payload
    as a binary data section (proton_encode_message c:297-339)."""
    broker = _Amqp1Broker(user="RootManageSharedAccessKey", password="kk1")
    try:
        out = ConnectorSink(transport=EventHubsTransport(
            "127.0.0.1", broker.port, amqp_address="myhub",
            key_name="RootManageSharedAccessKey", key="kk1",
            event_properties={"Table": "syslog"},
            clock=lambda: 1700000000123,
            render=lambda r: r["msg"]), batch_rows=100)(_rows(3))
        assert out["rows_delivered"].iloc[0] == 3
        assert broker.attaches[0][2] == "myhub"
        assert len(broker.messages) == 3
        ids = set()
        for i, m in enumerate(broker.messages):
            assert m["data"] == f"log line {i}".encode()
            props = m["properties"]
            ids.add(props[0])
            assert props[6] == "application/octet-stream"
            assert props[8] == 1700000000123
            assert m["app_properties"] == {"Table": "syslog"}
        assert len(ids) == 3                 # distinct message ids
    finally:
        broker.stop()
