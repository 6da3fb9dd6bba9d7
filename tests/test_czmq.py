"""omczmq/imczmq analogs over ZMTP 3.0 (contrib/omczmq/omczmq.c,
contrib/imczmq/imczmq.c; the wire is the published ZMTP spec,
re-expressed without libzmq) — codec grammar, live PUSH→PULL and
PUB→SUB round-trips between the engine's halves, subscription
filtering, and the socket-type pairing check."""

import socket
import threading

import pandas as pd
import pytest

from rsyslog_ray.sources.czmq import CzmqCapture
from rsyslog_ray.stages.connectors import (ConnectorSink, CzmqTransport,
                                           TransportSuspended)
from rsyslog_ray.state import zmtpwire as w


def _events(n):
    return pd.DataFrame({"event_id": range(n), "event_type": ["e"] * n})


def test_zmtp_codec_grammar():
    g = w.greeting()
    assert len(g) == 64
    assert g[0] == 0xFF and g[9] == 0x7F and g[10:12] == b"\x03\x00"
    assert g[12:32] == b"NULL" + b"\x00" * 16
    # short frame, LONG frame, command frame — byte-exact layout
    assert w.frame(b"abc") == b"\x00\x03abc"
    assert w.frame(b"abc", more=True) == b"\x01\x03abc"
    big = b"y" * 300
    enc = w.frame(big)
    assert enc[0] == 0x02 and enc[1:9] == (300).to_bytes(8, "big")
    cmd = w.ready("PUSH")
    assert cmd[0] == 0x04 and b"\x05READY" in cmd
    assert w.parse_ready(cmd[2:]) == {"Socket-Type": "PUSH"}


def test_zmtp_push_pull_roundtrip(ray_session):
    cap = CzmqCapture("PULL")
    got = {}

    def listen():
        got["ds"] = cap.capture(250)

    th = threading.Thread(target=listen)
    th.start()
    t = CzmqTransport("127.0.0.1", cap.port, socktype="PUSH",
                      render=lambda r: f"m{r['event_id']}" + "x" * 300)
    out = ConnectorSink(transport=t, batch_rows=100)(_events(250))
    t.close()
    th.join(timeout=15)
    assert not th.is_alive()
    assert int(out["rows_delivered"].iloc[0]) == 250
    df = got["ds"].to_pandas()
    # LONG frames (>255 bytes) round-trip in order
    assert df["record"].tolist() == \
        [f"m{i}" + "x" * 300 for i in range(250)]


def test_zmtp_pub_sub_filters_by_subscription(ray_session):
    cap = CzmqCapture("SUB", topics=["alerts."])
    got = {}

    def listen():
        got["ds"] = cap.capture(3)

    th = threading.Thread(target=listen)
    th.start()
    t = CzmqTransport(
        "127.0.0.1", cap.port, socktype="PUB",
        dynatopic_field="topic", topic_frame=True,
        render=lambda r: f"e{r['event_id']}")
    df_in = pd.DataFrame({
        "event_id": range(6),
        "topic": ["alerts.cpu", "metrics.mem", "alerts.disk",
                  "metrics.io", "alerts.net", "logs.app"]})
    ConnectorSink(transport=t)(df_in)
    t.close()
    th.join(timeout=15)
    assert not th.is_alive()
    df = got["ds"].to_pandas()
    # only the subscribed prefix got through (PUB-side filter drains
    # the \x01 subscription message, like libzmq's trie)
    assert df["topic"].tolist() == ["alerts.cpu", "alerts.disk",
                                    "alerts.net"]
    assert df["record"].tolist() == ["e0", "e2", "e4"]


def test_zmtp_pub_concatenated_topic_mode(ray_session):
    cap = CzmqCapture("SUB", topics=["t1"])
    got = {}

    def listen():
        got["ds"] = cap.capture(2)

    th = threading.Thread(target=listen)
    th.start()
    t = CzmqTransport("127.0.0.1", cap.port, socktype="PUB",
                      topics=["t1"], topic_frame=False,
                      render=lambda r: f"|payload{r['event_id']}")
    ConnectorSink(transport=t)(_events(2))
    t.close()
    th.join(timeout=15)
    df = got["ds"].to_pandas()
    # zstr_sendf "%s%s" concatenation (omczmq.c:260-263): the capture
    # strips the subscribed prefix back off
    assert df["topic"].tolist() == ["t1", "t1"]
    assert df["record"].tolist() == ["|payload0", "|payload1"]


def test_zmtp_socket_type_mismatch_suspends(ray_session):
    cap = CzmqCapture("SUB")     # PUSH cannot pair with SUB
    th = threading.Thread(target=cap.capture, args=(1,), daemon=True)
    th.start()
    sink = ConnectorSink(
        transport=CzmqTransport("127.0.0.1", cap.port,
                                socktype="PUSH"),
        max_retries=1, backoff_base_s=0.01)
    with pytest.raises(TransportSuspended):
        sink(_events(1))
