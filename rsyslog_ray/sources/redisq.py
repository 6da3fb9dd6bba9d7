"""imhiredis analog — Redis consumer over the REAL RESP protocol.

Reference: contrib/imhiredis/imhiredis.c — three modes (c:408-423):
'queue' (LPOP/RPOP drain), 'subscribe' (pub/sub channel), 'stream'
(XREAD/XREADGROUP).  Bounded batch captures here, like every source
in this package; the queue drain and stream read are the natural
batch shapes, subscribe collects a fixed message count."""

from __future__ import annotations

import pandas as pd

from ..state.dbwire import resp_encode, resp_read


class RedisCapture:
    def __init__(self, host: str, port: int = 6379):
        self.addr = (host, port)

    def _connect(self):
        import socket

        return socket.create_connection(self.addr, timeout=10)

    def capture_queue(self, key: str, *, use_lpop: bool = True,
                      max_records: int = 1_000_000):
        """queue mode: drain with LPOP (default, FIFO against the
        sink's LPUSH) or RPOP until empty."""
        import ray.data

        s = self._connect()
        rows = []
        try:
            while len(rows) < max_records:
                s.sendall(resp_encode(["LPOP" if use_lpop else "RPOP",
                                       key]))
                v = resp_read(s)
                if v is None:
                    break
                rows.append(v.decode("utf-8", errors="replace"))
        finally:
            s.close()
        return ray.data.from_pandas(pd.DataFrame({"record": rows,
                                                  "key": key}))

    def capture_subscribe(self, channel: str, n_messages: int):
        """subscribe mode: SUBSCRIBE then collect n push messages
        (["message", channel, payload] arrays)."""
        import ray.data

        s = self._connect()
        rows = []
        try:
            s.sendall(resp_encode(["SUBSCRIBE", channel]))
            resp_read(s)                   # subscribe confirmation array
            while len(rows) < n_messages:
                m = resp_read(s)
                if isinstance(m, list) and len(m) == 3 \
                        and m[0] == b"message":
                    rows.append(m[2].decode("utf-8", errors="replace"))
        finally:
            s.close()
        return ray.data.from_pandas(pd.DataFrame(
            {"record": rows, "channel": channel}))

    def capture_stream(self, key: str, *, start_id: str = "0",
                       max_records: int = 1_000_000):
        """stream mode: XREAD from an explicit id; returns records +
        the last id as the resume cursor (imhiredis tracks the same
        index through XAUTOCLAIM/ACK machinery; a batch engine
        checkpoints the cursor in its own lineage)."""
        import ray.data

        s = self._connect()
        recs, fields, ids = [], [], []
        last_id = start_id
        try:
            s.sendall(resp_encode(["XREAD", "COUNT", max_records,
                                   "STREAMS", key, start_id]))
            reply = resp_read(s)
            if reply:
                for _stream, entries in reply:
                    for eid, kv in entries:
                        last_id = eid.decode()
                        for i in range(0, len(kv), 2):
                            ids.append(last_id)
                            fields.append(kv[i].decode())
                            recs.append(kv[i + 1].decode(
                                "utf-8", errors="replace"))
        finally:
            s.close()
        ds = ray.data.from_pandas(pd.DataFrame(
            {"record": recs, "field": fields, "entry_id": ids}))
        return ds, last_id
