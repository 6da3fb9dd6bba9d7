"""Kafka wire protocol: codec vectors + live broker-double roundtrips.

The broker double (`MiniKafkaBroker`) is a real TCP counterparty that
parses the same public protocol from the byte level (request header
v1, Metadata v1, Produce v3, Fetch v4), independently re-verifies each
record batch's CRC-32C, assigns offsets by rewriting baseOffset like a
real broker, and serves whole batches on fetch — the same
live-localhost relationship tests/test_connectors.py has for
omelasticsearch/omfwd.
"""

import json
import socket
import struct
import threading

import pytest

from rsyslog_ray.state.kafkawire import (
    API_FETCH, API_METADATA, API_PRODUCE, ERR_NOT_LEADER, ERR_NONE,
    KafkaFetchClient, KafkaProduceClient, Reader, crc32c, enc_bytes,
    enc_str, encode_record_batch, decode_record_batches, murmur2,
    partition_for_key, zigzag_encode)


# ---------------------------------------------------------------------------
# codec vectors
# ---------------------------------------------------------------------------

def test_crc32c_vectors():
    # the standard check value + RFC 3720 B.4 iSCSI vectors
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA
    assert crc32c(b"\xff" * 32) == 0x62A8AB43
    assert crc32c(b"") == 0
    # incremental == one-shot
    part = crc32c(b"12345")
    assert crc32c(b"6789", part) == 0xE3069283


def test_murmur2_java_vectors():
    # Apache Kafka Utils.murmur2 test values (signed int32)
    def s32(x):
        return x - (1 << 32) if x >= (1 << 31) else x
    assert s32(murmur2(b"21")) == -973932308
    assert s32(murmur2(b"foobar")) == -790332482
    assert s32(murmur2(b"a-little-bit-long-string")) == -985981536
    assert s32(murmur2(b"a-little-bit-longer-string")) == -1486304829
    assert s32(murmur2(
        b"lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8")) == -58897971
    assert 0 <= partition_for_key(b"21", 7) < 7


def test_zigzag_varint_roundtrip():
    for n in [0, 1, -1, 63, 64, -64, -65, 300, -300, 2 ** 31, -2 ** 31,
              2 ** 40, -(2 ** 40)]:
        buf = zigzag_encode(n)
        r = Reader(buf)
        assert r.varint() == n, n
        assert r.pos == len(buf)


def test_record_batch_roundtrip_and_crc():
    msgs = [(b"k1", b"value one"), (None, b"value two"),
            (b"k3", "юникод".encode())]
    batch = encode_record_batch(msgs, base_timestamp=1723939200000,
                                base_offset=40)
    out = decode_record_batches(batch)
    assert [(r["key"], r["value"]) for r in out] == msgs
    assert [r["offset"] for r in out] == [40, 41, 42]
    assert all(r["timestamp"] == 1723939200000 for r in out)
    # two back-to-back batches decode as one stream
    two = batch + encode_record_batch([(None, b"x")], base_offset=43)
    assert [r["offset"] for r in decode_record_batches(two)] == \
        [40, 41, 42, 43]
    # a flipped payload byte must fail the CRC
    corrupt = bytearray(batch)
    corrupt[-3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_record_batches(bytes(corrupt))


# ---------------------------------------------------------------------------
# broker double
# ---------------------------------------------------------------------------

class MiniKafkaBroker:
    """Spec-level counterparty: header v1 + Metadata v1 / Produce v3 /
    Fetch v4, independent CRC re-verification, broker-side offset
    assignment (baseOffset rewrite), whole-batch fetch service."""

    def __init__(self, num_partitions: int = 3,
                 fail_first_produce: bool = False):
        self.num_partitions = num_partitions
        self.fail_first_produce = fail_first_produce
        self._produce_calls = 0
        self.logs: dict[tuple, list] = {}      # (topic,pid) -> [batch bytes]
        self.log_end: dict[tuple, int] = {}    # (topic,pid) -> next offset
        self.seen_client_ids: list[str] = []
        self._srv = socket.socket()
        self._srv.bind(("127.0.0.1", 0))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._stop = False
        self._thread = threading.Thread(target=self._accept_loop,
                                        daemon=True)
        self._thread.start()

    # -- wire helpers ---------------------------------------------------
    @staticmethod
    def _recv_exact(conn, n):
        chunks = []
        while n:
            c = conn.recv(n)
            if not c:
                return None
            chunks.append(c)
            n -= len(c)
        return b"".join(chunks)

    def _accept_loop(self):
        while not self._stop:
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._serve, args=(conn,),
                             daemon=True).start()

    def _serve(self, conn):
        try:
            while True:
                hdr = self._recv_exact(conn, 4)
                if hdr is None:
                    return
                (size,) = struct.unpack(">i", hdr)
                req = self._recv_exact(conn, size)
                r = Reader(req)
                api_key = r.i16()
                api_version = r.i16()
                corr = r.i32()
                self.seen_client_ids.append(r.string())
                if api_key == API_METADATA:
                    assert api_version == 1
                    body = self._metadata(r)
                elif api_key == API_PRODUCE:
                    assert api_version == 3
                    body = self._produce(r)
                elif api_key == API_FETCH:
                    assert api_version == 4
                    body = self._fetch(r)
                else:
                    return
                resp = struct.pack(">i", corr) + body
                conn.sendall(struct.pack(">i", len(resp)) + resp)
        except (OSError, AssertionError):
            pass
        finally:
            conn.close()

    # -- API handlers -----------------------------------------------------
    def _metadata(self, r: Reader) -> bytes:
        topics = [r.string() for _ in range(r.i32())]
        out = bytearray()
        out += struct.pack(">i", 1)             # one broker: us
        out += struct.pack(">i", 0) + enc_str("127.0.0.1") \
            + struct.pack(">i", self.port) + enc_str(None)
        out += struct.pack(">i", 0)             # controller_id
        out += struct.pack(">i", len(topics))
        for t in topics:
            out += struct.pack(">h", 0) + enc_str(t) + struct.pack(">b", 0)
            out += struct.pack(">i", self.num_partitions)
            for pid in range(self.num_partitions):
                out += struct.pack(">hii", 0, pid, 0)
                out += struct.pack(">ii", 1, 0)   # replicas [0]
                out += struct.pack(">ii", 1, 0)   # isr [0]
        return bytes(out)

    def _produce(self, r: Reader) -> bytes:
        self._produce_calls += 1
        fail = self.fail_first_produce and self._produce_calls == 1
        r.string()                                # transactional_id
        r.i16()                                   # acks
        r.i32()                                   # timeout
        results = []                              # (topic, pid, err, base)
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                pid = r.i32()
                batch = r.nbytes()
                if fail:
                    results.append((topic, pid, ERR_NOT_LEADER, -1))
                    continue
                base = self._append(topic, pid, batch)
                results.append((topic, pid, ERR_NONE, base))
        out = bytearray()
        by_topic: dict[str, list] = {}
        for topic, pid, err, base in results:
            by_topic.setdefault(topic, []).append((pid, err, base))
        out += struct.pack(">i", len(by_topic))
        for topic, parts in by_topic.items():
            out += enc_str(topic) + struct.pack(">i", len(parts))
            for pid, err, base in parts:
                out += struct.pack(">ihqq", pid, err, base, -1)
        out += struct.pack(">i", 0)               # throttle_time (trails)
        return bytes(out)

    def _append(self, topic: str, pid: int, batch: bytes) -> int:
        # independent spec-level validation of the producer's bytes
        base_offset, batch_len = struct.unpack_from(">qi", batch, 0)
        assert batch_len == len(batch) - 12, "batchLength mismatch"
        magic = batch[16]
        assert magic == 2, "only magic v2 accepted"
        (crc,) = struct.unpack_from(">I", batch, 17)
        assert crc32c(batch[21:]) == crc, "CRC-32C mismatch"
        (nrecs,) = struct.unpack_from(">i", batch, 57)
        assert nrecs >= 1
        key = (topic, pid)
        base = self.log_end.get(key, 0)
        # broker-side offset assignment: rewrite baseOffset
        stored = struct.pack(">q", base) + batch[8:]
        self.logs.setdefault(key, []).append(stored)
        self.log_end[key] = base + nrecs
        return base

    def _fetch(self, r: Reader) -> bytes:
        r.i32()                                   # replica_id
        r.i32()                                   # max_wait
        r.i32()                                   # min_bytes
        r.i32()                                   # max_bytes
        r.i8()                                    # isolation_level
        wants = []                                # (topic, pid, offset)
        for _ in range(r.i32()):
            topic = r.string()
            for _p in range(r.i32()):
                pid = r.i32()
                off = r.i64()
                r.i32()                           # partition_max_bytes
                wants.append((topic, pid, off))
        out = bytearray()
        out += struct.pack(">i", 0)               # throttle_time (leads)
        by_topic: dict[str, list] = {}
        for topic, pid, off in wants:
            by_topic.setdefault(topic, []).append((pid, off))
        out += struct.pack(">i", len(by_topic))
        for topic, parts in by_topic.items():
            out += enc_str(topic) + struct.pack(">i", len(parts))
            for pid, off in parts:
                key = (topic, pid)
                hwm = self.log_end.get(key, 0)
                # serve whole batches whose range reaches the offset
                record_set = b""
                for stored in self.logs.get(key, []):
                    (sbase,) = struct.unpack_from(">q", stored, 0)
                    (snrecs,) = struct.unpack_from(">i", stored, 57)
                    if sbase + snrecs > off:
                        record_set += stored
                out += struct.pack(">ihqqi", pid, 0, hwm, hwm, 0)
                out += enc_bytes(record_set)
        return bytes(out)

    def stop(self):
        self._stop = True
        # shutdown() aborts the accept() the thread is blocked in;
        # close() alone leaves the kernel listener alive via the syscall
        try:
            self._srv.shutdown(socket.SHUT_RDWR)
        except OSError:
            pass
        try:
            self._srv.close()
        except OSError:
            pass


# ---------------------------------------------------------------------------
# live roundtrips
# ---------------------------------------------------------------------------

def test_produce_fetch_roundtrip():
    broker = MiniKafkaBroker(num_partitions=3)
    try:
        prod = KafkaProduceClient("127.0.0.1", broker.port)
        msgs = [(f"k{i}".encode(), json.dumps({"i": i}).encode())
                for i in range(100)]
        prod.produce("logs", msgs[:60])
        prod.produce("logs", msgs[60:])
        prod.close()

        fetch = KafkaFetchClient("127.0.0.1", broker.port)
        got = []
        for pid in range(3):
            off = 0
            while True:
                recs, nxt = fetch.fetch("logs", pid, off)
                if nxt == off:
                    break
                got.extend(recs)
                # per-partition offsets are contiguous from 0
                assert [r["offset"] for r in recs] == \
                    list(range(off, nxt))
                off = nxt
        fetch.close()
        assert sorted(r["key"] for r in got) == \
            sorted(k for k, _ in msgs)
        assert {r["value"] for r in got} == {v for _, v in msgs}
    finally:
        broker.stop()


def test_murmur2_partition_placement():
    broker = MiniKafkaBroker(num_partitions=4)
    try:
        prod = KafkaProduceClient("127.0.0.1", broker.port)
        msgs = [(f"key-{i}".encode(), b"v") for i in range(50)]
        prod.produce("t", msgs)
        prod.close()
        fetch = KafkaFetchClient("127.0.0.1", broker.port)
        for pid in range(4):
            recs, _ = fetch.fetch("t", pid, 0)
            for r in recs:
                assert partition_for_key(r["key"], 4) == pid
        fetch.close()
    finally:
        broker.stop()


def test_fetch_mid_batch_skips_earlier_records():
    broker = MiniKafkaBroker(num_partitions=1)
    try:
        prod = KafkaProduceClient("127.0.0.1", broker.port)
        prod.produce("t", [(None, f"m{i}".encode()) for i in range(10)])
        prod.close()
        fetch = KafkaFetchClient("127.0.0.1", broker.port)
        recs, nxt = fetch.fetch("t", 0, 4)   # mid-batch offset
        fetch.close()
        assert [r["offset"] for r in recs] == list(range(4, 10))
        assert recs[0]["value"] == b"m4"
        assert nxt == 10
    finally:
        broker.stop()


def test_connector_sink_retries_not_leader(tmp_path):
    from rsyslog_ray.stages.connectors import ConnectorSink, KafkaTransport

    broker = MiniKafkaBroker(num_partitions=2, fail_first_produce=True)
    try:
        import pandas as pd

        sink = ConnectorSink(
            transport=KafkaTransport("127.0.0.1", broker.port,
                                     topic="logs", key_field="host"),
            batch_rows=500, backoff_base_s=0.01,
            error_file=str(tmp_path / "err.jsonl"))
        out = sink(pd.DataFrame({"host": [f"h{i}" for i in range(40)],
                                 "msg": ["x"] * 40}))
        assert int(out["rows_delivered"].iloc[0]) == 40
        assert int(out["rows_rejected"].iloc[0]) == 0
        assert broker._produce_calls >= 2      # first attempt NOT_LEADER
        assert sum(broker.log_end.values()) == 40
    finally:
        broker.stop()


def test_dynatopic_cache_bounded():
    from rsyslog_ray.stages.connectors import KafkaTransport

    broker = MiniKafkaBroker(num_partitions=1)
    try:
        t = KafkaTransport("127.0.0.1", broker.port,
                           dynatopic_field="app", dynatopic_cachesize=3)
        t([{"app": f"app{i}", "msg": i} for i in range(10)])
        assert len(t._client._nparts) <= 3      # dynaCache bound
        assert sum(broker.log_end.values()) == 10
        assert len(broker.log_end) == 10        # one partition per topic
        t.close()
    finally:
        broker.stop()


def test_kafka_capture_dataset(ray_session):
    from rsyslog_ray.sources.kafka import KafkaCapture

    broker = MiniKafkaBroker(num_partitions=2)
    try:
        prod = KafkaProduceClient("127.0.0.1", broker.port)
        prod.produce("syslog", [
            (f"host{i % 4}".encode(),
             f"<34>1 2026-08-18T00:00:{i:02d}Z host{i % 4} app - - - "
             f"msg {i}".encode())
            for i in range(30)])
        prod.close()

        ds = KafkaCapture("127.0.0.1", broker.port).capture(
            "syslog", partitions=[0, 1])
        df = ds.to_pandas()
        assert len(df) == 30
        assert set(df.columns) == {"record", "key", "topic", "partition",
                                   "offset", "timestamp"}
        assert set(df["partition"].unique()) <= {0, 1}
        assert df["record"].str.startswith("<34>1 ").all()
        # capture feeds the standard parse chain like every source
        import pyarrow as pa

        from rsyslog_ray.rulebase import SYSLOG_RULEBASE
        parsed = SYSLOG_RULEBASE.parse_table(
            pa.array(df["record"], pa.string()))
        assert parsed["rule"].to_pylist() == ["rfc5424"] * 30
    finally:
        broker.stop()
