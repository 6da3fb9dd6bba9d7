"""MySQL client/server protocol + MongoDB OP_MSG/BSON against live
spec-parsing doubles (plugins/ommysql/ommysql.c,
plugins/ommongodb/ommongodb.c — re-expressed without client libs)."""

import hashlib
import socket
import struct
import threading

import pandas as pd
import pytest

from rsyslog_ray.stages.connectors import (ConnectorSink, MongoTransport,
                                           MySqlTransport,
                                           TransportSuspended)
from rsyslog_ray.state import dbwire as w


def test_bson_roundtrip_all_types():
    doc = {"s": "text", "i": 42, "big": 2 ** 40, "f": 1.25, "t": True,
           "n": None, "sub": {"k": "v"}, "arr": [1, "two", None]}
    out, end = w.bson_decode(w.bson_encode(doc))
    assert out == doc
    assert end == len(w.bson_encode(doc))


def test_mysql_scramble_algorithm():
    # independent recomputation of the published algorithm
    nonce = bytes(range(20))
    pw = "s3cret"
    h1 = hashlib.sha1(pw.encode()).digest()
    expect = bytes(a ^ b for a, b in zip(
        h1, hashlib.sha1(nonce + hashlib.sha1(h1).digest()).digest()))
    assert w.mysql_native_scramble(pw, nonce) == expect
    assert w.mysql_native_scramble("", nonce) == b""


class MiniMySqlServer:
    """HandshakeV10 greeting with a random 20-byte nonce; VERIFIES the
    client's mysql_native_password token against the known password;
    answers COM_QUERY INSERTs with OK (or ERR once when fail_first)."""

    def __init__(self, password: str = "s3cret", fail_first: bool = False):
        self.password = password
        self.fails_left = 1 if fail_first else 0
        self.statements: list[str] = []
        self.logins: list[tuple[str, str]] = []
        self.auth_ok: list[bool] = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
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
        import os

        try:
            nonce = os.urandom(20)
            # greeting: v10, version, thread id, nonce part1(8),
            # filler, caps lower, charset, status, caps upper,
            # auth data len (21 = 20 nonce + null), reserved(10),
            # part2 (12 + null), plugin name
            caps = (w.CLIENT_PROTOCOL_41 | w.CLIENT_SECURE_CONNECTION
                    | w.CLIENT_PLUGIN_AUTH | w.CLIENT_CONNECT_WITH_DB)
            greet = (b"\x0a" + b"8.0.0-double\x00"
                     + struct.pack("<I", 99) + nonce[:8] + b"\x00"
                     + struct.pack("<H", caps & 0xFFFF)
                     + b"\x21" + struct.pack("<H", 2)
                     + struct.pack("<H", caps >> 16)
                     + bytes([21]) + b"\x00" * 10
                     + nonce[8:] + b"\x00"
                     + b"mysql_native_password\x00")
            w.mysql_send_packet(conn, 0, greet)
            seq, resp = w.mysql_read_packet(conn)
            # parse HandshakeResponse41
            pos = 4 + 4 + 1 + 23
            zero = resp.index(b"\x00", pos)
            user = resp[pos:zero].decode()
            pos = zero + 1
            tlen = resp[pos]
            token = resp[pos + 1:pos + 1 + tlen]
            pos += 1 + tlen
            zero = resp.index(b"\x00", pos)
            db = resp[pos:zero].decode()
            self.logins.append((user, db))
            ok = token == w.mysql_native_scramble(self.password, nonce)
            self.auth_ok.append(ok)
            if not ok:
                w.mysql_send_packet(
                    conn, seq + 1,
                    b"\xff" + struct.pack("<H", 1045) + b"denied")
                return
            w.mysql_send_packet(conn, seq + 1, b"\x00\x00\x00\x02\x00\x00\x00")
            while True:
                _seq, payload = w.mysql_read_packet(conn)
                if payload[:1] == bytes([w.COM_QUIT]):
                    return
                if payload[:1] == bytes([w.COM_QUERY]):
                    sql = payload[1:].decode()
                    if self.fails_left > 0:
                        self.fails_left -= 1
                        w.mysql_send_packet(
                            conn, 1,
                            b"\xff" + struct.pack("<H", 1213)
                            + b"deadlock (simulated)")
                        continue
                    self.statements.append(sql)
                    w.mysql_send_packet(conn, 1,
                                        b"\x00\x02\x00\x02\x00\x00\x00")
        except (OSError, ConnectionError, ValueError):
            pass
        finally:
            conn.close()

    def stop(self):
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()


def test_mysql_auth_and_insert_live():
    srv = MiniMySqlServer(password="s3cret")
    try:
        t = MySqlTransport("127.0.0.1", srv.port, user="ray",
                           password="s3cret", database="logs",
                           table="syslog", columns=["host", "msg"])
        sink = ConnectorSink(transport=t, batch_rows=500)
        out = sink(pd.DataFrame({"host": ["h1", None],
                                 "msg": ["it's\nfine", "x"]}))
        assert int(out["rows_delivered"].iloc[0]) == 2
        assert srv.logins == [("ray", "logs")]
        assert srv.auth_ok == [True]
        stmt = srv.statements[0]
        assert stmt.startswith("INSERT INTO syslog (host, msg) VALUES ")
        assert "('h1','it\\'s\nfine')" in stmt
        assert "(NULL,'x')" in stmt
        t.close()
    finally:
        srv.stop()


def test_mysql_bad_password_rejected_then_suspends():
    srv = MiniMySqlServer(password="right")
    try:
        sink = ConnectorSink(
            transport=MySqlTransport("127.0.0.1", srv.port,
                                     password="wrong", columns=["m"]),
            max_retries=2, backoff_base_s=0.01)
        with pytest.raises(TransportSuspended):
            sink(pd.DataFrame({"m": ["x"]}))
        assert srv.auth_ok and not any(srv.auth_ok)
    finally:
        srv.stop()


def test_mysql_err_packet_retries():
    srv = MiniMySqlServer(fail_first=True)
    try:
        sink = ConnectorSink(
            transport=MySqlTransport("127.0.0.1", srv.port,
                                     password="s3cret", columns=["m"]),
            backoff_base_s=0.01)
        out = sink(pd.DataFrame({"m": ["a"]}))
        assert int(out["rows_delivered"].iloc[0]) == 1
        assert len(srv.statements) == 1
    finally:
        srv.stop()


class MiniMongoServer:
    """OP_MSG counterparty: decodes the insert command BSON, stores
    documents, replies {ok:1, n}; can reject one document once."""

    def __init__(self, reject_index: int | None = None):
        self.docs: list[dict] = []
        self.commands: list[dict] = []
        self.reject_index = reject_index
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
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
                while len(hdr) < 16:
                    c = conn.recv(16 - len(hdr))
                    if not c:
                        return
                    hdr += c
                length, req_id, _resp, opcode = struct.unpack("<iiii", hdr)
                body = b""
                while len(body) < length - 16:
                    body += conn.recv(length - 16 - len(body))
                assert opcode == w.OP_MSG
                assert body[4] == 0
                cmd, _ = w.bson_decode(body, 5)
                self.commands.append(cmd)
                docs = cmd.get("documents", [])
                reply = {"n": len(docs), "ok": 1.0}
                if self.reject_index is not None \
                        and self.reject_index < len(docs):
                    reply["n"] = len(docs) - 1
                    reply["writeErrors"] = [{
                        "index": self.reject_index, "code": 11000,
                        "errmsg": "E11000 duplicate key"}]
                    docs = [d for i, d in enumerate(docs)
                            if i != self.reject_index]
                    self.reject_index = None
                self.docs.extend(docs)
                section = b"\x00" + w.bson_encode(reply)
                payload = struct.pack("<I", 0) + section
                conn.sendall(struct.pack("<iiii", 16 + len(payload),
                                         1, req_id, w.OP_MSG) + payload)
        except (OSError, AssertionError, ValueError):
            pass
        finally:
            conn.close()

    def stop(self):
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()


def test_mongo_insert_live():
    srv = MiniMongoServer()
    try:
        t = MongoTransport("127.0.0.1", srv.port, db="logdb",
                           collection="syslog")
        sink = ConnectorSink(transport=t, batch_rows=100)
        out = sink(pd.DataFrame({
            "host": [f"h{i}" for i in range(150)],
            "sev": list(range(150)),
            "ok": [True] * 150}))
        assert int(out["rows_delivered"].iloc[0]) == 150
        assert len(srv.docs) == 150
        assert srv.docs[0] == {"host": "h0", "sev": 0, "ok": True}
        # bulked: two insert commands (100 + 50)
        assert [c["insert"] for c in srv.commands] == ["syslog"] * 2
        assert srv.commands[0]["$db"] == "logdb"
        assert srv.commands[0]["ordered"] is False
        t.close()
    finally:
        srv.stop()


def test_mongo_write_errors_quarantined(tmp_path):
    srv = MiniMongoServer(reject_index=1)
    try:
        err = tmp_path / "rejects.jsonl"
        sink = ConnectorSink(
            transport=MongoTransport("127.0.0.1", srv.port),
            error_file=str(err), backoff_base_s=0.01)
        out = sink(pd.DataFrame({"k": ["a", "b", "c"]}))
        assert int(out["rows_delivered"].iloc[0]) == 2
        assert int(out["rows_rejected"].iloc[0]) == 1
        assert "duplicate key" in err.read_text()
        assert [d["k"] for d in srv.docs] == ["a", "c"]
    finally:
        srv.stop()


def test_db_wire_as_ray_stage(ray_session):
    import ray.data

    my = MiniMySqlServer(password="pw")
    mo = MiniMongoServer()
    try:
        ds = ray.data.from_pandas(pd.DataFrame({
            "host": [f"h{i % 4}" for i in range(200)],
            "msg": [f"m{i}" for i in range(200)]}))
        out = ds.map_batches(
            ConnectorSink,
            fn_constructor_kwargs=dict(
                transport=MySqlTransport("127.0.0.1", my.port,
                                         password="pw",
                                         columns=["host", "msg"]),
                batch_rows=64),
            batch_format="pandas", batch_size=50,
            concurrency=(1, 2)).to_pandas()
        assert out["rows_delivered"].sum() == 200
        out = ds.map_batches(
            ConnectorSink,
            fn_constructor_kwargs=dict(
                transport=MongoTransport("127.0.0.1", mo.port),
                batch_rows=64),
            batch_format="pandas", batch_size=50,
            concurrency=(1, 2)).to_pandas()
        assert out["rows_delivered"].sum() == 200
        assert len(mo.docs) == 200
    finally:
        my.stop()
        mo.stop()


# ---------------------------------------------------------------------
# Redis RESP (omhiredis / imhiredis analogs)
# ---------------------------------------------------------------------

class MiniRedisServer:
    """RESP counterparty: lists, kv (+TTL), streams, pub/sub.  Decodes
    commands as arrays of bulk strings and replies per the published
    protocol; can -ERR the first data command once."""

    def __init__(self, fail_first: bool = False):
        self.lists: dict[str, list[bytes]] = {}
        self.kv: dict[str, tuple[bytes, int | None]] = {}
        self.streams: dict[str, list[tuple[str, list[bytes]]]] = {}
        self.maxlen_seen: dict[str, int] = {}
        self.subscribers: dict[str, list] = {}
        self.published: list[tuple[str, bytes]] = []
        self.fail_first = fail_first
        self._seq = 0
        self._lock = threading.Lock()
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        threading.Thread(target=self._accept, daemon=True).start()

    def _accept(self):
        while True:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    @staticmethod
    def _read_cmd(f):
        hdr = f.readline()
        if not hdr:
            return None
        assert hdr[:1] == b"*"
        n = int(hdr[1:].strip())
        args = []
        for _ in range(n):
            ln = f.readline()
            assert ln[:1] == b"$"
            size = int(ln[1:].strip())
            args.append(f.read(size + 2)[:-2])
        return args

    def _serve(self, conn):
        f = conn.makefile("rb")
        try:
            while True:
                cmd = self._read_cmd(f)
                if cmd is None:
                    return
                with self._lock:
                    self._dispatch(conn, cmd)
        except (OSError, AssertionError, ValueError):
            pass
        finally:
            conn.close()

    @staticmethod
    def _bulk(b: bytes) -> bytes:
        return b"$%d\r\n%s\r\n" % (len(b), b)

    def _dispatch(self, conn, cmd):
        op = cmd[0].upper().decode()
        if self.fail_first and op != "SUBSCRIBE":
            self.fail_first = False
            conn.sendall(b"-ERR transient failure injected\r\n")
            return
        if op in ("LPUSH", "RPUSH"):
            lst = self.lists.setdefault(cmd[1].decode(), [])
            for v in cmd[2:]:
                lst.insert(0, v) if op == "LPUSH" else lst.append(v)
            conn.sendall(b":%d\r\n" % len(lst))
        elif op in ("LPOP", "RPOP"):
            lst = self.lists.get(cmd[1].decode(), [])
            if not lst:
                conn.sendall(b"$-1\r\n")
            else:
                v = lst.pop(0) if op == "LPOP" else lst.pop()
                conn.sendall(self._bulk(v))
        elif op == "SET":
            self.kv[cmd[1].decode()] = (cmd[2], None)
            conn.sendall(b"+OK\r\n")
        elif op == "SETEX":
            self.kv[cmd[1].decode()] = (cmd[3], int(cmd[2]))
            conn.sendall(b"+OK\r\n")
        elif op == "PUBLISH":
            ch, msg = cmd[1].decode(), cmd[2]
            self.published.append((ch, msg))
            push = (b"*3\r\n" + self._bulk(b"message")
                    + self._bulk(ch.encode()) + self._bulk(msg))
            subs = self.subscribers.get(ch, [])
            for sc in subs:
                try:
                    sc.sendall(push)
                except OSError:
                    pass
            conn.sendall(b":%d\r\n" % len(subs))
        elif op == "SUBSCRIBE":
            ch = cmd[1].decode()
            self.subscribers.setdefault(ch, []).append(conn)
            conn.sendall(b"*3\r\n" + self._bulk(b"subscribe")
                         + self._bulk(ch.encode()) + b":1\r\n")
        elif op == "XADD":
            key = cmd[1].decode()
            i = 2
            if cmd[i].upper() == b"MAXLEN":
                i += 1
                if cmd[i] == b"~":
                    i += 1
                self.maxlen_seen[key] = int(cmd[i])
                i += 1
            assert cmd[i] == b"*"
            self._seq += 1
            eid = f"1-{self._seq}"
            entries = self.streams.setdefault(key, [])
            entries.append((eid, list(cmd[i + 1:])))
            cap = self.maxlen_seen.get(key)
            if cap:
                del entries[:-cap]
            conn.sendall(self._bulk(eid.encode()))
        elif op == "XREAD":
            # XREAD COUNT n STREAMS key id
            count = int(cmd[2])
            key, after = cmd[4].decode(), cmd[5].decode()

            def newer(eid):
                if after == "0":
                    return True
                a, b = eid.split("-"), after.split("-")
                return (int(a[0]), int(a[1])) > (int(b[0]), int(b[1]))

            hits = [(e, kv) for e, kv in self.streams.get(key, [])
                    if newer(e)][:count]
            if not hits:
                conn.sendall(b"*-1\r\n")
                return
            body = b"*%d\r\n" % len(hits)
            for eid, kv in hits:
                fields = b"".join(self._bulk(x) for x in kv)
                body += (b"*2\r\n" + self._bulk(eid.encode())
                         + b"*%d\r\n" % len(kv) + fields)
            conn.sendall(b"*1\r\n*2\r\n" + self._bulk(key.encode())
                         + body)
        else:
            conn.sendall(b"-ERR unknown command\r\n")

    def stop(self):
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        self._srv.close()


def test_redis_queue_roundtrip(ray_session):
    from rsyslog_ray.sources.redisq import RedisCapture
    from rsyslog_ray.stages.connectors import RedisTransport

    srv = MiniRedisServer()
    try:
        t = RedisTransport("127.0.0.1", srv.port, mode="queue",
                           key="logs", render=lambda r: r["msg"])
        sink = ConnectorSink(transport=t, batch_rows=100)
        out = sink(pd.DataFrame({"msg": [f"m{i}" for i in range(5)]}))
        assert int(out["rows_delivered"].iloc[0]) == 5
        # LPUSH prepends: list head is the newest
        assert srv.lists["logs"][0] == b"m4"
        t.close()

        got = RedisCapture("127.0.0.1", srv.port).capture_queue("logs")
        recs = sorted(r["record"] for r in got.take_all())
        assert recs == [f"m{i}" for i in range(5)]
        assert srv.lists["logs"] == []          # drained
    finally:
        srv.stop()


def test_redis_rpush_fifo_and_set_modes():
    from rsyslog_ray.stages.connectors import RedisTransport

    srv = MiniRedisServer()
    try:
        t = RedisTransport("127.0.0.1", srv.port, mode="queue",
                           key="q", use_rpush=True,
                           render=lambda r: r["m"])
        ConnectorSink(transport=t)(pd.DataFrame({"m": ["a", "b"]}))
        assert srv.lists["q"] == [b"a", b"b"]   # RPUSH keeps arrival order
        t.close()

        # dynakey SET and SETEX-with-expiration
        t = RedisTransport("127.0.0.1", srv.port, mode="set",
                           key="host:", key_field="host",
                           render=lambda r: r["m"])
        ConnectorSink(transport=t)(pd.DataFrame(
            {"host": ["h1", "h2"], "m": ["x", "y"]}))
        assert srv.kv["host:h1"] == (b"x", None)
        assert srv.kv["host:h2"] == (b"y", None)
        t.close()

        t = RedisTransport("127.0.0.1", srv.port, mode="set",
                           key="ttl:", key_field="host", expiration=60,
                           render=lambda r: r["m"])
        ConnectorSink(transport=t)(pd.DataFrame(
            {"host": ["h3"], "m": ["z"]}))
        assert srv.kv["ttl:h3"] == (b"z", 60)
        t.close()
    finally:
        srv.stop()


def test_redis_publish_subscribe(ray_session):
    import time

    from rsyslog_ray.sources.redisq import RedisCapture
    from rsyslog_ray.stages.connectors import RedisTransport

    srv = MiniRedisServer()
    try:
        box = {}

        def subscriber():
            cap = RedisCapture("127.0.0.1", srv.port)
            box["ds"] = cap.capture_subscribe("events", 3)

        th = threading.Thread(target=subscriber, daemon=True)
        th.start()
        for _ in range(200):                 # wait for SUBSCRIBE landing
            with srv._lock:
                if srv.subscribers.get("events"):
                    break
            time.sleep(0.01)
        t = RedisTransport("127.0.0.1", srv.port, mode="publish",
                           key="events", render=lambda r: r["m"])
        ConnectorSink(transport=t)(pd.DataFrame(
            {"m": ["e1", "e2", "e3"]}))
        t.close()
        th.join(timeout=10)
        assert not th.is_alive()
        recs = [r["record"] for r in box["ds"].take_all()]
        assert recs == ["e1", "e2", "e3"]
        assert [m for _, m in srv.published] == [b"e1", b"e2", b"e3"]
    finally:
        srv.stop()


def test_redis_stream_xadd_xread_cursor(ray_session):
    from rsyslog_ray.sources.redisq import RedisCapture
    from rsyslog_ray.stages.connectors import RedisTransport

    srv = MiniRedisServer()
    try:
        t = RedisTransport("127.0.0.1", srv.port, mode="stream",
                           key="st", stream_out_field="msg",
                           capacity_limit=100,
                           render=lambda r: r["m"])
        ConnectorSink(transport=t)(pd.DataFrame(
            {"m": ["s1", "s2", "s3"]}))
        t.close()
        assert srv.maxlen_seen["st"] == 100

        cap = RedisCapture("127.0.0.1", srv.port)
        ds, cursor = cap.capture_stream("st")
        rows = ds.take_all()
        assert [r["record"] for r in rows] == ["s1", "s2", "s3"]
        assert all(r["field"] == "msg" for r in rows)
        assert cursor == rows[-1]["entry_id"]

        # resume from the cursor: nothing new
        ds2, cursor2 = cap.capture_stream("st", start_id=cursor)
        assert ds2.count() == 0 and cursor2 == cursor
    finally:
        srv.stop()


def test_redis_err_reply_retries():
    from rsyslog_ray.stages.connectors import RedisTransport

    srv = MiniRedisServer(fail_first=True)
    try:
        sink = ConnectorSink(
            transport=RedisTransport("127.0.0.1", srv.port, key="r",
                                     render=lambda r: r["m"]),
            backoff_base_s=0.01)
        out = sink(pd.DataFrame({"m": ["only"]}))
        assert int(out["rows_delivered"].iloc[0]) == 1
        assert srv.lists["r"] == [b"only"]
    finally:
        srv.stop()


def test_libdbi_driver_dispatch():
    """omlibdbi's dbiDrvrName param selects the wire driver
    (omlibdbi.c); here the drivers are the shipped real-wire
    transports."""
    import pytest

    from rsyslog_ray.stages.connectors import (ClickHouseTransport,
                                               MongoTransport,
                                               MySqlTransport,
                                               PgWireTransport,
                                               libdbi_transport)

    assert isinstance(libdbi_transport("mysql", host="h", port=1),
                      MySqlTransport)
    assert isinstance(libdbi_transport("pgsql", host="h", port=1),
                      PgWireTransport)
    assert isinstance(libdbi_transport("clickhouse", host="h", port=1),
                      ClickHouseTransport)
    assert isinstance(libdbi_transport("mongodb", host="h", port=1),
                      MongoTransport)
    with pytest.raises(ValueError):
        libdbi_transport("oracle")
