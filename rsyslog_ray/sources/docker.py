"""imdocker analog — container logs over the REAL Docker Engine API.

Reference: contrib/imdocker/imdocker.c — lists containers via
``GET {api}/containers/json`` (parsing Id/Names/Image/ImageID/Created/
Labels, c:72-77), then streams each container's
``GET {api}/containers/{id}/logs?...`` and demultiplexes the non-tty
log stream: 8-byte frame headers ``[stream_type, 0,0,0, size_be32]``
(get_stream_info) with stdin/stdout/stderr types.  This batch analog
speaks the same HTTP-over-unix-socket API (stdlib only) and performs
one bounded sweep per ``capture()`` — the daemon's follow=1 +
polling-interval loop re-homed to batch pulls, with ``since`` as the
resume cursor exactly like retrieveNewLogsFromStart."""

from __future__ import annotations

import http.client
import json
import socket

import pandas as pd

STREAM_NAMES = {0: "stdin", 1: "stdout", 2: "stderr"}


class UnixHTTPConnection(http.client.HTTPConnection):
    """HTTP over an AF_UNIX socket — the Docker daemon's default
    listener (dockerapiunixsockaddr, imdocker.c:262)."""

    def __init__(self, sockpath: str, timeout: float = 10.0):
        super().__init__("localhost", timeout=timeout)
        self.sockpath = sockpath

    def connect(self):
        s = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        s.settimeout(self.timeout)
        s.connect(self.sockpath)
        self.sock = s


def demux_docker_stream(data: bytes) -> list[tuple[str, bytes]]:
    """Split a multiplexed (non-tty) log stream into
    [(stream_name, payload)] frames; tolerates a truncated tail."""
    out = []
    pos = 0
    while pos + 8 <= len(data):
        st = data[pos]
        size = int.from_bytes(data[pos + 4:pos + 8], "big")
        if pos + 8 + size > len(data):
            break
        if st in STREAM_NAMES:            # is_valid_stream_type
            out.append((STREAM_NAMES[st], data[pos + 8:pos + 8 + size]))
        pos += 8 + size
    return out


class DockerCapture:
    """Bounded sweep: list containers, pull each one's log stream,
    demultiplex, split lines, return a Dataset of (record, stream,
    container_id, container_name, image, image_id, labels)."""

    def __init__(self, sockpath: str, api_version: str = "v1.27",
                 log_options: str = "timestamps=0&follow=0&stdout=1"
                                    "&stderr=1",
                 containers_limit: int = 25):
        self.sockpath = sockpath
        self.api_version = api_version
        self.log_options = log_options
        self.containers_limit = containers_limit

    def _get(self, conn, path: str):
        conn.request("GET", path)
        resp = conn.getresponse()
        data = resp.read()
        if resp.status != 200:
            raise ConnectionError(f"docker API {resp.status} for {path}")
        return data

    def list_containers(self, conn, since: str | None = None) -> list:
        path = f"/{self.api_version}/containers/json?"
        if since:                         # allocContainersUrl since filter
            path += f'&filters={{"since":["{since}"]}}'
        return json.loads(self._get(conn, path))[:self.containers_limit]

    def capture(self, since: str | None = None):
        import ray.data

        conn = UnixHTTPConnection(self.sockpath)
        rows = {"record": [], "stream": [], "container_id": [],
                "container_name": [], "image": [], "image_id": [],
                "labels": []}
        try:
            for c in self.list_containers(conn, since):
                cid = c.get("Id", "")
                names = c.get("Names") or [""]
                name = names[0].lstrip("/")
                image = c.get("Image", "")
                image_id = c.get("ImageID", "")
                labels = json.dumps(c.get("Labels") or {}, sort_keys=True)
                raw = self._get(
                    conn, f"/{self.api_version}/containers/{cid}/logs"
                          f"?{self.log_options}")
                for stream, payload in demux_docker_stream(raw):
                    for line in payload.decode(
                            "utf-8", errors="replace").splitlines():
                        rows["record"].append(line)
                        rows["stream"].append(stream)
                        rows["container_id"].append(cid)
                        rows["container_name"].append(name)
                        rows["image"].append(image)
                        rows["image_id"].append(image_id)
                        rows["labels"].append(labels)
        finally:
            conn.close()
        return ray.data.from_pandas(pd.DataFrame(rows))
