"""mmaitag (Gemini generateContent wire shape) + mmdarwin (Darwin
unix-socket packet protocol) against live localhost doubles."""

import http.server
import json
import os
import socket
import struct
import threading

import pandas as pd

from rsyslog_ray.stages.aitag import (DARWIN_PACKET, AiTagStage,
                                      DarwinStage, GeminiHttpProvider,
                                      StaticProvider)


class FakeGemini:
    """Parses the generateContent body, classifies by substring, counts
    calls, checks the api-key header."""

    def __init__(self):
        self.calls = []
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(h):
                n = int(h.headers.get("Content-Length", 0))
                req = json.loads(h.rfile.read(n))
                text = req["contents"][0]["parts"][0]["text"]
                outer.calls.append((h.path, h.headers.get("x-goog-api-key"),
                                    text))
                msg = text.rsplit("\n", 1)[-1]
                label = "CRITICAL" if "panic" in msg else \
                    "NOISE" if "debug" in msg else "REGULAR"
                body = json.dumps({"candidates": [{"content": {
                    "parts": [{"text": label + "\n"}]}}]}).encode()
                h.send_response(200)
                h.send_header("Content-Length", str(len(body)))
                h.end_headers()
                h.wfile.write(body)

            def log_message(h, *a):
                pass

        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_gemini_provider_live_protocol():
    srv = FakeGemini()
    try:
        stage = AiTagStage(
            provider=GeminiHttpProvider("127.0.0.1", srv.port,
                                        apikey="sk-test"),
            input_col="msg")
        df = pd.DataFrame({"msg": [
            "kernel panic on cpu3", "debug: cache warm",
            "user login ok", "kernel panic on cpu3"]})
        out = stage(df)
        assert list(out["aitag"]) == \
            ["CRITICAL", "NOISE", "REGULAR", "CRITICAL"]
        # distinct-message memo: 4 rows, 3 distinct -> 3 HTTP calls
        assert len(srv.calls) == 3
        path, key, text = srv.calls[0]
        assert path == "/v1beta/models/gemini-2.0-flash:generateContent"
        assert key == "sk-test"
        # the default prompt prefixes every message
        assert text.startswith("Task: Classify the log message")
        assert text.endswith("kernel panic on cpu3")
        # trailing whitespace is stripped from the model reply
        assert out["aitag"].iloc[0] == "CRITICAL"
    finally:
        srv.stop()


def test_gemini_provider_falls_back_on_dead_server():
    srv = FakeGemini()
    srv.stop()
    stage = AiTagStage(
        provider=GeminiHttpProvider("127.0.0.1", srv.port, apikey="k"))
    out = stage(pd.DataFrame({"msg": ["anything"]}))
    assert list(out["aitag"]) == ["REGULAR"]   # reference fallback


def test_static_provider_mock():
    out = AiTagStage(provider=StaticProvider("NOISE"))(
        pd.DataFrame({"msg": ["a", "b"]}))
    assert list(out["aitag"]) == ["NOISE", "NOISE"]


class FakeDarwin:
    """Unix-socket Darwin filter: parses darwin_filter_packet_t +
    JSON body, replies certitude = len(first field) % 101."""

    def __init__(self, path: str):
        self.path = path
        self.bodies = []
        self._srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        self._srv.bind(path)
        self._srv.listen(4)
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
                hdr = b""
                while len(hdr) < DARWIN_PACKET.size:
                    c = conn.recv(DARWIN_PACKET.size - len(hdr))
                    if not c:
                        return
                    hdr += c
                (ptype, resp_type, fcode, body_size, _evt, csize,
                 _cert) = DARWIN_PACKET.unpack(hdr)
                assert body_size > 0
                body = b""
                while len(body) < body_size:
                    body += conn.recv(body_size - len(body))
                fields = json.loads(body)
                self.bodies.append((fcode, fields))
                certitude = len(fields[0]) % 101
                conn.sendall(DARWIN_PACKET.pack(
                    ptype, resp_type, fcode, 0, b"\x00" * 16, 1,
                    certitude))
        except (OSError, AssertionError):
            pass
        finally:
            conn.close()

    def stop(self):
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()
        try:
            os.unlink(self.path)
        except OSError:
            pass


def test_darwin_packet_layout():
    # LP64 struct layout: 56 bytes (protocol.h:50-60 with tail padding)
    assert DARWIN_PACKET.size == 56
    pkt = DARWIN_PACKET.pack(0, 1, 0x636F6D70, 17, b"\x01" * 16, 1, 99)
    assert len(pkt) == 56
    assert struct.unpack_from("<q", pkt, 8)[0] == 0x636F6D70
    assert struct.unpack_from("<I", pkt, 48)[0] == 99


def test_darwin_live_roundtrip(tmp_path):
    sock = str(tmp_path / "darwin.sock")
    srv = FakeDarwin(sock)
    try:
        stage = DarwinStage(sock, fields=["!srcip", "static-literal"],
                            key="certitude", socket_max_use=3)
        df = pd.DataFrame({"srcip": ["10.0.0.1", "192.168.12.34", ""]})
        out = stage(df)
        assert list(out["certitude"]) == [len("10.0.0.1") % 101,
                                          len("192.168.12.34") % 101, 0]
        # field resolution: '!'-prefixed from the row, literal verbatim
        fcode, fields = srv.bodies[0]
        assert fcode == 0x636F6D70
        assert fields == ["10.0.0.1", "static-literal"]
        stage.close()
    finally:
        srv.stop()


def test_darwin_as_ray_stage(ray_session, tmp_path):
    import ray.data

    sock = str(tmp_path / "darwin2.sock")
    srv = FakeDarwin(sock)
    try:
        ds = ray.data.from_pandas(pd.DataFrame(
            {"srcip": [f"10.0.0.{i}" for i in range(100)]}))
        out = ds.map_batches(
            DarwinStage,
            fn_constructor_kwargs=dict(sockpath=sock, fields=["!srcip"]),
            batch_format="pandas", batch_size=32,
            concurrency=(1, 2)).to_pandas()
        assert len(out) == 100
        assert (out["certitude"] ==
                out["srcip"].str.len() % 101).all()
    finally:
        srv.stop()
