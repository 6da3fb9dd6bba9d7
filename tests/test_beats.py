"""imbeats analog: Lumberjack v2 (plugins/imbeats/lj_parser.h) — a
hand-rolled Beats agent double drives window/J/C frames and asserts
the cumulative ACK contract."""

import json
import socket
import struct
import threading
import zlib

import pytest

from rsyslog_ray.sources.beats import BeatsCapture, decode_beats_events


def _jframe(seq, obj):
    payload = json.dumps(obj).encode()
    return b"2J" + struct.pack(">II", seq, len(payload)) + payload


def _window(n):
    return b"2W" + struct.pack(">I", n)


def _read_ack(sock):
    hdr = b""
    while len(hdr) < 6:
        hdr += sock.recv(6 - len(hdr))
    assert hdr[:2] == b"2A"
    return struct.unpack(">I", hdr[2:])[0]


def test_beats_window_json_ack(ray_session):
    cap = BeatsCapture()
    got = {}

    def listen():
        got["ds"] = cap.capture(5)

    th = threading.Thread(target=listen)
    th.start()
    s = socket.create_connection(("127.0.0.1", cap.port))
    # batch 1: window of 3
    s.sendall(_window(3))
    for i in range(1, 4):
        s.sendall(_jframe(i, {"message": f"ev{i}", "beat": "filebeat"}))
    assert _read_ack(s) == 3          # cumulative ack = last seq
    # batch 2: window of 2
    s.sendall(_window(2))
    s.sendall(_jframe(4, {"message": "ev4"}))
    s.sendall(_jframe(5, {"message": "ev5"}))
    assert _read_ack(s) == 5
    s.close()
    th.join(timeout=10)
    assert not th.is_alive()
    df = decode_beats_events(got["ds"]).to_pandas()
    assert df["seq"].tolist() == [1, 2, 3, 4, 5]
    assert json.loads(df["msg"][0])["message"] == "ev1"
    assert json.loads(df["json"][4]) == {"message": "ev5"}
    assert cap.acks_sent == [3, 5]


def test_beats_compressed_batch(ray_session):
    """A 'C' frame inflating to inner J frames — the wire shape Beats
    actually sends under compression_level > 0."""
    cap = BeatsCapture()
    got = {}

    def listen():
        got["ds"] = cap.capture(4)

    th = threading.Thread(target=listen)
    th.start()
    s = socket.create_connection(("127.0.0.1", cap.port))
    inner = b"".join(_jframe(i, {"n": i}) for i in range(1, 5))
    comp = zlib.compress(inner)
    s.sendall(_window(4) + b"2C" + struct.pack(">I", len(comp)) + comp)
    assert _read_ack(s) == 4
    s.close()
    th.join(timeout=10)
    df = got["ds"].to_pandas()
    assert df["seq"].tolist() == [1, 2, 3, 4]
    assert [json.loads(m)["n"] for m in df["msg"]] == [1, 2, 3, 4]


def test_beats_limits_and_bad_version(ray_session):
    # oversized declared window ends the session with no rows
    cap = BeatsCapture(max_window_size=10)
    th = threading.Thread(target=lambda: cap.capture(1), daemon=True)
    th.start()
    s = socket.create_connection(("127.0.0.1", cap.port))
    s.sendall(_window(10_000))
    s.close()

    # v1 frames are refused (the reference is v2-only)
    cap2 = BeatsCapture()
    box = {}

    def listen2():
        try:
            cap2.capture(1)
        except ConnectionError as e:
            box["err"] = str(e)

    th2 = threading.Thread(target=listen2)
    th2.start()
    s2 = socket.create_connection(("127.0.0.1", cap2.port))
    s2.sendall(b"1W" + struct.pack(">I", 1))
    th2.join(timeout=10)
    s2.close()
    assert "lumberjack v2" in box.get("err", "")
