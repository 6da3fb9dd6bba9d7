"""omudpspoof analog (plugins/omudpspoof/omudpspoof.c re-expressed on
a raw socket): live loopback drills — the kernel itself validates the
forged headers by delivering the datagram, reporting the spoofed
source, and reassembling our hand-built IP fragments."""

import json
import socket

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import ConnectorSink, SpoofUdpTransport


def _rx():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    s.settimeout(5)
    return s, s.getsockname()[1]


def _raw_ok():
    try:
        socket.socket(socket.AF_INET, socket.SOCK_RAW,
                      socket.IPPROTO_RAW).close()
        return True
    except PermissionError:
        return False


pytestmark = pytest.mark.skipif(not _raw_ok(),
                                reason="needs CAP_NET_RAW")


def test_udpspoof_source_address_and_port_cycle():
    rx, port = _rx()
    try:
        t = SpoofUdpTransport(
            "127.0.0.1", port, render=lambda r: r["msg"],
            source_field="fromhost_ip",
            source_port_start=33100, source_port_end=33102)
        out = ConnectorSink(transport=t)(pd.DataFrame({
            "msg": [f"m{i}" for i in range(4)],
            # per-row spoofed source (sourcetemplate = fromhost-ip);
            # loopback-range addresses so the kernel routes them
            "fromhost_ip": ["127.0.0.2", "127.0.0.3", None,
                            "127.0.0.4"]}))
        t.close()
        assert int(out["rows_delivered"].iloc[0]) == 4
        got = {}
        for _ in range(4):
            data, (addr, sport) = rx.recvfrom(2048)
            got[data.decode()] = (addr, sport)
        # the kernel reports the FORGED sources
        assert got["m0"] == ("127.0.0.2", 33100)
        assert got["m1"] == ("127.0.0.3", 33101)
        assert got["m2"][0] == "127.0.0.2"   # None → default source
        # port cycled past sourceport.end back to start (c:365-366)
        assert got["m2"][1] == 33102 and got["m3"][1] == 33100
    finally:
        rx.close()


def test_udpspoof_fragmentation_reassembles():
    """A payload past the MTU leaves as 8-byte-aligned IP fragments
    with a shared id and MF chain (c:381-492); the receiving kernel
    reassembles them into one datagram — byte-identical payload."""
    rx, port = _rx()
    try:
        msg = "".join(f"{i:04d}" for i in range(1500))   # 6000 bytes
        t = SpoofUdpTransport("127.0.0.1", port, mtu=600,
                              source_field=None,
                              render=lambda r: r["msg"])
        ConnectorSink(transport=t)(pd.DataFrame({"msg": [msg]}))
        t.close()
        data, (addr, _) = rx.recvfrom(65535)
        assert data.decode() == msg
        assert addr == "127.0.0.2"
    finally:
        rx.close()


def test_udpspoof_truncates_at_64k():
    rx, port = _rx()
    try:
        t = SpoofUdpTransport("127.0.0.1", port, mtu=65535,
                              source_field=None,
                              render=lambda r: r["msg"])
        ConnectorSink(transport=t)(pd.DataFrame(
            {"msg": ["x" * 70000]}))
        t.close()
        data, _ = rx.recvfrom(65535 * 2)
        # c:361 truncates at 65528, but an IPv4 datagram (header
        # included) tops out at 65535 — the transport clamps to the
        # largest payload the receiving kernel can reassemble
        assert len(data) == 65507
    finally:
        rx.close()
