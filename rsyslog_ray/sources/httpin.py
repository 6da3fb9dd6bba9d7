"""imhttp analog — an HTTP input endpoint (contrib/imhttp/imhttp.c).

The reference embeds civetweb and accepts log messages as POST bodies
on a configured ``endpoint``, with optional basic-auth checked
against an htpasswd-style file, plus a ``healthcheckpath`` that
answers 200.  This batch analog binds the same surface with stdlib
http.server and collects a bounded number of requests into a Dataset
(the daemon's run-forever loop re-homed to batch capture, like every
sources/ class here)."""

from __future__ import annotations

import base64
import http.server
import threading

import pandas as pd


class HttpCapture:
    """``capture(max_requests)`` serves until N message POSTs arrived,
    then returns a Dataset of (record, path, peer) — one row per line
    of each accepted body (imhttp delivers body content as messages).

    ``basic_auth``: dict of user -> password (the htpasswd-file
    contract, processBasicAuthFile) — non-matching requests get 401
    and are not recorded.  ``endpoint``: only POSTs to this path are
    accepted (404 otherwise).  ``healthcheck_path`` answers GET 200
    "OK" without counting."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 endpoint: str = "/postrequest",
                 healthcheck_path: str = "/healthz",
                 basic_auth: dict | None = None):
        outer = self
        self.endpoint = endpoint
        self.healthcheck_path = healthcheck_path
        self.basic_auth = basic_auth
        self._rows = {"record": [], "path": [], "peer": []}
        self._done = threading.Event()
        self._remaining = 0
        self._lock = threading.Lock()

        class H(http.server.BaseHTTPRequestHandler):
            protocol_version = "HTTP/1.1"

            def _authorized(h) -> bool:
                if outer.basic_auth is None:
                    return True
                hdr = h.headers.get("Authorization", "")
                if not hdr.startswith("Basic "):
                    return False
                try:
                    user, _, pw = base64.b64decode(
                        hdr[6:]).decode().partition(":")
                except ValueError:
                    return False
                return outer.basic_auth.get(user) == pw

            def do_GET(h):
                if h.path == outer.healthcheck_path:
                    h.send_response(200)
                    h.send_header("Content-Length", "2")
                    h.end_headers()
                    h.wfile.write(b"OK")
                else:
                    h.send_response(404)
                    h.send_header("Content-Length", "0")
                    h.end_headers()

            def do_POST(h):
                n = int(h.headers.get("Content-Length", 0))
                body = h.rfile.read(n)
                if h.path != outer.endpoint:
                    h.send_response(404)
                    h.send_header("Content-Length", "0")
                    h.end_headers()
                    return
                if not h._authorized():
                    h.send_response(401)
                    h.send_header("WWW-Authenticate",
                                  'Basic realm="imhttp"')
                    h.send_header("Content-Length", "0")
                    h.end_headers()
                    return
                with outer._lock:
                    for line in body.decode(
                            "utf-8", errors="replace").splitlines():
                        outer._rows["record"].append(line)
                        outer._rows["path"].append(h.path)
                        outer._rows["peer"].append(h.client_address[0])
                    outer._remaining -= 1
                    if outer._remaining <= 0:
                        outer._done.set()
                h.send_response(200)
                h.send_header("Content-Length", "0")
                h.end_headers()

            def log_message(h, *a):
                pass

        self._srv = http.server.ThreadingHTTPServer((bind_host, port), H)
        self.port = self._srv.server_address[1]
        self._thread = threading.Thread(target=self._srv.serve_forever,
                                        daemon=True)
        self._thread.start()

    def capture(self, max_requests: int, timeout: float = 30.0):
        import ray.data

        with self._lock:
            self._remaining = max_requests
            self._done.clear()
        complete = self._done.wait(timeout)
        self._srv.shutdown()
        self._srv.server_close()
        if not complete:
            raise TimeoutError(
                f"imhttp capture: fewer than {max_requests} requests "
                f"within {timeout}s")
        return ray.data.from_pandas(pd.DataFrame(self._rows))
