"""imczmq analog — ZMTP 3.0 listener (contrib/imczmq/imczmq.c,
re-expressed over the published wire spec in state/zmtpwire.py).

Bounded batch capture like every source in this package.  PULL
sockets just read message frames; SUB sockets send their
``\\x01topic`` subscription messages right after the handshake (the
3.0 wire form) and the records carry the topic — from the separate
MORE-flagged topic frame when the publisher uses topic frames, else
by longest-prefix match against the subscription list."""

from __future__ import annotations

import pandas as pd

from ..state.zmtpwire import frame, handshake, read_frame


class CzmqCapture:
    def __init__(self, socktype: str = "PULL", bind_host: str = "127.0.0.1",
                 port: int = 0, topics: list[str] | None = None):
        import socket

        assert socktype in ("PULL", "SUB")
        self.socktype = socktype
        self.topics = list(topics or [""])
        self._srv = socket.socket()
        self._srv.bind((bind_host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]

    def capture(self, n_msgs: int, max_conns: int = 1):
        import ray.data

        rows = {"record": [], "topic": [], "session": []}
        try:
            for session in range(max_conns):
                conn, _ = self._srv.accept()
                try:
                    handshake(conn, self.socktype)
                    if self.socktype == "SUB":
                        for t in self.topics:
                            conn.sendall(frame(b"\x01" + t.encode()))
                    self._read_msgs(conn, session, rows, n_msgs)
                finally:
                    conn.close()
                if len(rows["record"]) >= n_msgs:
                    break
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))

    def _read_msgs(self, conn, session: int, rows: dict, n_msgs: int):
        pending_topic = None
        while len(rows["record"]) < n_msgs:
            try:
                body, more, is_cmd = read_frame(conn)
            except ConnectionError:
                return
            if is_cmd:
                continue
            if more:                       # topic frame precedes msg
                pending_topic = body.decode("utf-8", "replace")
                continue
            text = body.decode("utf-8", "replace")
            if pending_topic is not None:
                topic = pending_topic
                pending_topic = None
            elif self.socktype == "SUB":
                # concatenated form: longest subscribed prefix
                topic = max((t for t in self.topics
                             if text.startswith(t)), key=len,
                            default="")
                text = text[len(topic):]
            else:
                topic = ""
            rows["record"].append(text)
            rows["topic"].append(topic)
            rows["session"].append(session)
