"""imrelp analog — RELP listener over the real wire protocol.

Reference: plugins/imrelp/imrelp.c (librelp server side).  Bounded
capture like every source in this package: ``.port`` binds at
construction, ``capture(max_conns)`` serves that many sessions —
negotiating the ``open`` offer handshake, confirming every ``syslog``
frame with ``rsp 200`` (the confirmed delivery that distinguishes RELP
from plain TCP syslog), answering ``close`` with an rsp plus a
server-initiated ``serverclose`` — then returns the records as a
Dataset.  ``max_data_size`` rejects oversized frames with ``rsp 500``
(imrelp.c:393 relpSrvSetMaxDataSize).  ``ssl_context``: server-side
TLS below the framing (imrelp TLS support)."""

from __future__ import annotations

import pandas as pd

from ..state.relpwire import (offers_decode, offers_encode, relp_frame,
                              relp_read_frame, rsp_code)


class RelpCapture:
    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 max_data_size: int = 0, ssl_context=None):
        import socket

        self._srv = socket.socket()
        self._srv.bind((bind_host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self.max_data_size = max_data_size
        self.ssl_context = ssl_context
        self.opens_seen = 0            # session handshake count

    def capture(self, max_conns: int = 1, max_records: int = 1_000_000):
        import ray.data

        rows = {"record": [], "peer": [], "session": []}
        try:
            for session in range(max_conns):
                conn, peer = self._srv.accept()
                if self.ssl_context is not None:
                    conn = self.ssl_context.wrap_socket(conn,
                                                        server_side=True)
                try:
                    self._serve(conn, peer[0], session, rows,
                                max_records)
                finally:
                    conn.close()
                if len(rows["record"]) >= max_records:
                    break
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))

    def _serve(self, conn, peer: str, session: int, rows: dict,
               max_records: int):
        while True:
            try:
                txnr, cmd, data = relp_read_frame(conn)
            except ConnectionError:
                return                         # peer went away
            if cmd == "open":
                offers = offers_decode(data)
                if offers.get("relp_version") is None:
                    conn.sendall(relp_frame(
                        txnr, "rsp", b"500 ERR no relp_version offer"))
                    return
                self.opens_seen += 1
                conn.sendall(relp_frame(txnr, "rsp", b"200 OK\n"
                                        + offers_encode({
                                            "relp_version": "0",
                                            "commands": "syslog"})))
            elif cmd == "syslog":
                if (self.max_data_size
                        and len(data) > self.max_data_size):
                    conn.sendall(relp_frame(
                        txnr, "rsp", b"500 ERR frame too large"))
                    continue
                rows["record"].append(
                    data.decode("utf-8", errors="replace"))
                rows["peer"].append(peer)
                rows["session"].append(session)
                conn.sendall(relp_frame(txnr, "rsp", b"200 OK"))
                if len(rows["record"]) >= max_records:
                    conn.sendall(relp_frame(0, "serverclose"))
                    return
            elif cmd == "close":
                conn.sendall(relp_frame(txnr, "rsp", b"200 OK"))
                conn.sendall(relp_frame(0, "serverclose"))
                return
            else:
                conn.sendall(relp_frame(
                    txnr, "rsp", b"500 ERR unknown command"))
