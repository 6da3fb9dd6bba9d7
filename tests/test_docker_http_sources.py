"""imdocker (Docker Engine API over unix socket, multiplexed log
stream demux) and imhttp (HTTP input endpoint) against live doubles."""

import http.server
import json
import socket
import socketserver
import threading
import urllib.request

import pytest

from rsyslog_ray.sources.docker import (DockerCapture, demux_docker_stream)
from rsyslog_ray.sources.httpin import HttpCapture


def mux(stream_type: int, payload: bytes) -> bytes:
    return bytes([stream_type, 0, 0, 0]) + len(payload).to_bytes(4, "big") \
        + payload


def test_demux_frames_and_truncation():
    data = mux(1, b"out line\n") + mux(2, b"err line\n") \
        + mux(1, b"tail")[:6]            # truncated final frame
    frames = demux_docker_stream(data)
    assert frames == [("stdout", b"out line\n"), ("stderr", b"err line\n")]
    # unknown stream types are skipped, valid ones after still decode
    data = mux(7, b"junk") + mux(0, b"stdin!")
    assert demux_docker_stream(data) == [("stdin", b"stdin!")]


CONTAINERS = [
    {"Id": "abc123", "Names": ["/web-1"], "Image": "nginx:1.25",
     "ImageID": "sha256:deadbeef", "Created": 1755475200,
     "Labels": {"com.example.tier": "frontend"}},
    {"Id": "def456", "Names": ["/worker"], "Image": "app:2",
     "ImageID": "sha256:cafef00d", "Created": 1755475300, "Labels": {}},
]

LOGS = {
    "abc123": mux(1, b"GET / 200\nGET /x 404\n") + mux(2, b"oops\n"),
    "def456": mux(1, b"job started\n"),
}


class FakeDockerDaemon(socketserver.ThreadingMixIn, http.server.HTTPServer):
    address_family = socket.AF_UNIX

    def server_bind(self):
        self.socket.bind(self.server_address)

    def get_request(self):
        conn, _ = self.socket.accept()
        return conn, ("unix", 0)


def _docker_handler(requests_log):
    class H(http.server.BaseHTTPRequestHandler):
        def do_GET(h):
            requests_log.append(h.path)
            if h.path.startswith("/v1.27/containers/json"):
                body = json.dumps(CONTAINERS).encode()
            else:
                cid = h.path.split("/")[3]
                body = LOGS.get(cid, b"")
            h.send_response(200)
            h.send_header("Content-Length", str(len(body)))
            h.end_headers()
            h.wfile.write(body)

        def log_message(h, *a):
            pass

    return H


def test_docker_capture_live(ray_session, tmp_path):
    sock = str(tmp_path / "docker.sock")
    reqs = []
    srv = FakeDockerDaemon(sock, _docker_handler(reqs))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        ds = DockerCapture(sock).capture()
        df = ds.to_pandas()
        assert len(df) == 4
        assert list(df["record"]) == ["GET / 200", "GET /x 404", "oops",
                                      "job started"]
        assert list(df["stream"]) == ["stdout", "stdout", "stderr",
                                      "stdout"]
        assert set(df["container_name"]) == {"web-1", "worker"}
        row = df[df["container_id"] == "abc123"].iloc[0]
        assert row["image"] == "nginx:1.25"
        assert row["image_id"] == "sha256:deadbeef"
        assert json.loads(row["labels"]) == {"com.example.tier":
                                             "frontend"}
        # one list + one log pull per container
        assert reqs[0].startswith("/v1.27/containers/json")
        assert len(reqs) == 3
    finally:
        srv.shutdown()
        srv.server_close()


def test_docker_since_filter(tmp_path):
    sock = str(tmp_path / "docker2.sock")
    reqs = []
    srv = FakeDockerDaemon(sock, _docker_handler(reqs))
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        cap = DockerCapture(sock)
        from rsyslog_ray.sources.docker import UnixHTTPConnection
        conn = UnixHTTPConnection(sock)
        cap.list_containers(conn, since="abc123")
        conn.close()
        assert 'filters={"since":["abc123"]}' in reqs[-1]
    finally:
        srv.shutdown()
        srv.server_close()


def _post(url, data, headers=None):
    req = urllib.request.Request(url, data=data, headers=headers or {},
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=5) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def test_imhttp_capture_live(ray_session):
    cap = HttpCapture(endpoint="/postrequest",
                      basic_auth={"ray": "pw1"})
    base = f"http://127.0.0.1:{cap.port}"
    results = {}

    def drive():
        import base64
        auth = {"Authorization": "Basic "
                + base64.b64encode(b"ray:pw1").decode()}
        bad = {"Authorization": "Basic "
               + base64.b64encode(b"ray:WRONG").decode()}
        with urllib.request.urlopen(f"{base}/healthz", timeout=5) as r:
            results["health"] = (r.status, r.read())
        results["unauth"] = _post(f"{base}/postrequest", b"nope", {})
        results["badpw"] = _post(f"{base}/postrequest", b"nope", bad)
        results["wrongpath"] = _post(f"{base}/other", b"nope", auth)
        results["ok1"] = _post(f"{base}/postrequest",
                               b"line one\nline two", auth)
        results["ok2"] = _post(f"{base}/postrequest", b"line three", auth)

    t = threading.Thread(target=drive, daemon=True)
    t.start()
    ds = cap.capture(max_requests=2, timeout=15)
    t.join(timeout=5)
    assert results["health"] == (200, b"OK")
    assert results["unauth"] == 401
    assert results["badpw"] == 401
    assert results["wrongpath"] == 404
    assert results["ok1"] == results["ok2"] == 200
    df = ds.to_pandas()
    assert list(df["record"]) == ["line one", "line two", "line three"]
    assert (df["path"] == "/postrequest").all()


def test_imhttp_capture_timeout():
    cap = HttpCapture()
    with pytest.raises(TimeoutError):
        cap.capture(max_requests=1, timeout=0.3)
