"""DB sinks over real wire protocols: ClickHouse HTTP interface and
PostgreSQL v3 (startup / simple query / COPY-IN), each against a live
localhost counterparty that parses the bytes per the public spec —
the omelasticsearch test relationship, extended to the DB family
(plugins/omclickhouse/omclickhouse.c, plugins/ompgsql/ompgsql.c)."""

import http.server
import json
import socket
import struct
import threading

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import (ClickHouseTransport,
                                           ConnectorSink, PgWireTransport,
                                           TransportSuspended)


# ---------------------------------------------------------------------------
# ClickHouse HTTP double
# ---------------------------------------------------------------------------

class FakeClickHouse:
    def __init__(self, fail_first: bool = False):
        self.rows: list[dict] = []
        self.statements: list[str] = []
        self.fails_left = 1 if fail_first else 0
        outer = self

        class H(http.server.BaseHTTPRequestHandler):
            def do_POST(h):
                n = int(h.headers.get("Content-Length", 0))
                body = h.rfile.read(n).decode()
                if outer.fails_left > 0:
                    outer.fails_left -= 1
                    h.send_response(500)
                    h.end_headers()
                    h.wfile.write(b"Code: 999. DB::Exception: simulated")
                    return
                if body == "SELECT 1":
                    h.send_response(200)
                    h.end_headers()
                    h.wfile.write(b"1\n")
                    return
                if not body.startswith("INSERT INTO "):
                    h.send_response(400)
                    h.end_headers()
                    return
                outer.statements.append(body)
                if " FORMAT JSONEachRow\n" in body:
                    _, _, tail = body.partition(" FORMAT JSONEachRow\n")
                    for line in tail.splitlines():
                        if line.strip():
                            outer.rows.append(json.loads(line))
                h.send_response(200)
                h.end_headers()

            def log_message(h, *a):
                pass

        self.srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
        self.port = self.srv.server_address[1]
        threading.Thread(target=self.srv.serve_forever, daemon=True).start()

    def stop(self):
        self.srv.shutdown()
        self.srv.server_close()


def test_clickhouse_jsoneachrow_live():
    srv = FakeClickHouse()
    try:
        t = ClickHouseTransport("127.0.0.1", srv.port, table="logs",
                                columns=["host", "sev", "msg"])
        assert t.check_conn()
        sink = ConnectorSink(transport=t, batch_rows=100)
        out = sink(pd.DataFrame({
            "host": [f"h{i % 3}" for i in range(250)],
            "sev": [i % 8 for i in range(250)],
            "msg": [f"line {i}" for i in range(250)]}))
        assert int(out["rows_delivered"].iloc[0]) == 250
        assert len(srv.rows) == 250
        assert srv.rows[0] == {"host": "h0", "sev": 0, "msg": "line 0"}
        # bulked: 250 rows at batch_rows=100 -> 3 INSERT statements
        assert len(srv.statements) == 3
        assert all(s.startswith("INSERT INTO logs (host, sev, msg)")
                   for s in srv.statements)
        t.close()
    finally:
        srv.stop()


def test_clickhouse_values_mode_and_quoting():
    srv = FakeClickHouse()
    try:
        t = ClickHouseTransport("127.0.0.1", srv.port, table="logs",
                                columns=["msg", "n"], fmt="values")
        t([{"msg": "it's a 'quote'\\path", "n": 7},
           {"msg": None, "n": None}])
        stmt = srv.statements[0]
        assert stmt.startswith("INSERT INTO logs (msg, n) VALUES ")
        assert "('it\\'s a \\'quote\\'\\\\path',7)" in stmt
        assert "(NULL,NULL)" in stmt
        t.close()
    finally:
        srv.stop()


def test_clickhouse_500_retries_then_succeeds():
    srv = FakeClickHouse(fail_first=True)
    try:
        sink = ConnectorSink(
            transport=ClickHouseTransport("127.0.0.1", srv.port,
                                          columns=["msg"]),
            backoff_base_s=0.01)
        out = sink(pd.DataFrame({"msg": ["a", "b"]}))
        assert int(out["rows_delivered"].iloc[0]) == 2
        assert len(srv.rows) == 2
    finally:
        srv.stop()


# ---------------------------------------------------------------------------
# Postgres v3 wire double
# ---------------------------------------------------------------------------

class MiniPgServer:
    """Speaks the v3 startup + simple-query + COPY-IN subprotocols;
    records COPY rows and INSERT statements; can inject an
    ErrorResponse on the first statement."""

    def __init__(self, fail_first: bool = False):
        self.copy_rows: list[list[str]] = []
        self.statements: list[str] = []
        self.startups: list[dict] = []
        self.fails_left = 1 if fail_first else 0
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept, daemon=True).start()

    @staticmethod
    def _msg(typ: bytes, body: bytes) -> bytes:
        return typ + struct.pack(">i", len(body) + 4) + body

    @staticmethod
    def _recv_exact(conn, n):
        out = b""
        while len(out) < n:
            c = conn.recv(n - len(out))
            if not c:
                return None
            out += c
        return out

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
            # startup: int32 len, int32 protocol, k\0v\0...\0
            hdr = self._recv_exact(conn, 8)
            if hdr is None:
                return
            ln, proto = struct.unpack(">ii", hdr)
            assert proto == 196608, "protocol 3.0 expected"
            body = self._recv_exact(conn, ln - 8)
            kv = body.decode().rstrip("\x00").split("\x00")
            self.startups.append(dict(zip(kv[::2], kv[1::2])))
            # trust auth: AuthenticationOk, ParameterStatus, ReadyForQuery
            conn.sendall(self._msg(b"R", struct.pack(">i", 0)))
            conn.sendall(self._msg(b"S", b"server_version\x0016.1\x00"))
            conn.sendall(self._msg(b"Z", b"I"))
            while True:
                h = self._recv_exact(conn, 5)
                if h is None:
                    return
                typ = h[:1]
                (mlen,) = struct.unpack(">i", h[1:5])
                body = self._recv_exact(conn, mlen - 4)
                if typ == b"Q":
                    sql = body.rstrip(b"\x00").decode()
                    if self.fails_left > 0:
                        self.fails_left -= 1
                        conn.sendall(self._msg(
                            b"E", b"SMERROR\x00Msimulated failure\x00\x00"))
                        conn.sendall(self._msg(b"Z", b"I"))
                        continue
                    self.statements.append(sql)
                    if sql.upper().startswith("COPY "):
                        # CopyInResponse: format 0, ncols 0
                        conn.sendall(self._msg(
                            b"G", struct.pack(">bh", 0, 0)))
                        buf = b""
                        while True:
                            h2 = self._recv_exact(conn, 5)
                            t2 = h2[:1]
                            (l2,) = struct.unpack(">i", h2[1:5])
                            b2 = self._recv_exact(conn, l2 - 4)
                            if t2 == b"d":
                                buf += b2
                            elif t2 == b"c":
                                break
                            elif t2 == b"f":   # CopyFail
                                break
                        for line in buf.decode().splitlines():
                            self.copy_rows.append(line.split("\t"))
                        conn.sendall(self._msg(
                            b"C", f"COPY {len(self.copy_rows)}"
                            .encode() + b"\x00"))
                    else:
                        conn.sendall(self._msg(b"C", b"INSERT 0 1\x00"))
                    conn.sendall(self._msg(b"Z", b"I"))
                elif typ == b"X":       # Terminate
                    return
        except (OSError, AssertionError):
            pass
        finally:
            conn.close()

    def stop(self):
        # shutdown() aborts the thread blocked in accept(); close()
        # alone leaves the kernel listener alive via that syscall
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._srv.close()
        except OSError:
            pass


def test_pg_copy_in_live():
    srv = MiniPgServer()
    try:
        t = PgWireTransport("127.0.0.1", srv.port, dbname="logs",
                            user="ray", table="syslog",
                            columns=["host", "msg"])
        sink = ConnectorSink(transport=t, batch_rows=500)
        out = sink(pd.DataFrame({
            "host": ["h1", "h2", None],
            "msg": ["plain", "tab\there\nand newline", "x"]}))
        assert int(out["rows_delivered"].iloc[0]) == 3
        assert srv.startups[0] == {"user": "ray", "database": "logs"}
        assert srv.statements == ["COPY syslog (host, msg) FROM STDIN"]
        assert srv.copy_rows[0] == ["h1", "plain"]
        # COPY text escaping: tab/newline escaped, None -> \N
        assert srv.copy_rows[1] == ["h2", "tab\\there\\nand newline"]
        assert srv.copy_rows[2] == ["\\N", "x"]
        t.close()
    finally:
        srv.stop()


def test_pg_insert_mode():
    srv = MiniPgServer()
    try:
        t = PgWireTransport("127.0.0.1", srv.port, columns=["msg", "n"],
                            copy=False)
        t([{"msg": "o'brien", "n": 3}])
        assert srv.statements == \
            ["INSERT INTO raylog (msg, n) VALUES ('o''brien',3)"]
        t.close()
    finally:
        srv.stop()


def test_pg_error_response_retries_then_succeeds():
    srv = MiniPgServer(fail_first=True)
    try:
        sink = ConnectorSink(
            transport=PgWireTransport("127.0.0.1", srv.port,
                                      columns=["msg"]),
            backoff_base_s=0.01)
        out = sink(pd.DataFrame({"msg": ["a", "b"]}))
        assert int(out["rows_delivered"].iloc[0]) == 2
        assert len(srv.copy_rows) == 2
    finally:
        srv.stop()


def test_pg_suspends_on_dead_server():
    srv = MiniPgServer()
    srv.stop()
    sink = ConnectorSink(
        transport=PgWireTransport("127.0.0.1", srv.port, columns=["m"]),
        max_retries=2, backoff_base_s=0.01)
    with pytest.raises(TransportSuspended):
        sink(pd.DataFrame({"m": ["x"]}))


def test_db_sinks_as_ray_stage(ray_session):
    import ray.data

    ch = FakeClickHouse()
    pg = MiniPgServer()
    try:
        ds = ray.data.from_pandas(pd.DataFrame({
            "host": [f"h{i % 5}" for i in range(400)],
            "msg": [f"m{i}" for i in range(400)]}))
        out = ds.map_batches(
            ConnectorSink,
            fn_constructor_kwargs=dict(
                transport=ClickHouseTransport("127.0.0.1", ch.port,
                                              columns=["host", "msg"]),
                batch_rows=128),
            batch_format="pandas", batch_size=100,
            concurrency=(1, 2)).to_pandas()
        assert out["rows_delivered"].sum() == 400
        assert len(ch.rows) == 400
        out = ds.map_batches(
            ConnectorSink,
            fn_constructor_kwargs=dict(
                transport=PgWireTransport("127.0.0.1", pg.port,
                                          columns=["host", "msg"]),
                batch_rows=128),
            batch_format="pandas", batch_size=100,
            concurrency=(1, 2)).to_pandas()
        assert out["rows_delivered"].sum() == 400
        assert len(pg.copy_rows) == 400
    finally:
        ch.stop()
        pg.stop()
