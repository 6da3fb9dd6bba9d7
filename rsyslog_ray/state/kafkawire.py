"""Kafka wire protocol — REAL bytes, stdlib only.

The reference's imkafka/omkafka (plugins/imkafka/imkafka.c,
plugins/omkafka/omkafka.c) delegate the wire format to librdkafka; no
kafka client library exists in this container, so this module
implements the public Apache Kafka protocol itself (the protocol guide
published at kafka.apache.org/protocol): big-endian primitives,
request/response framing with the v1 request header, Metadata v1,
Produce v3 and Fetch v4 (pre-flexible versions — fixed-width
encodings, no tagged fields), and the magic-v2 record batch format
with its CRC-32C integrity check and zigzag-varint record fields.

What this gives the engine:
- `KafkaProduceClient` — a real TCP producer speaking Produce v3 with
  murmur2 key partitioning (the Java DefaultPartitioner algorithm).
- `KafkaFetchClient` — a real TCP consumer speaking Fetch v4 from an
  explicit offset.  Consumer-GROUP coordination (JoinGroup/SyncGroup/
  Heartbeat, imkafka.c's rd_kafka_subscribe) is deliberately out of
  scope: a batch engine reads bounded offset ranges and checkpoints
  them in its own lineage, it does not need broker-side group state.

Both are exercised in tests against a broker double that parses these
same bytes per the spec and VERIFIES the record-batch CRC-32C — the
test relationship omelasticsearch already has with its ES-shaped
server.
"""

from __future__ import annotations

import socket
import struct

# ---------------------------------------------------------------------------
# CRC-32C (Castagnoli, reflected poly 0x82F63B78) — record batch v2
# integrity field.  Slicing-by-4 tables: ~4x byte-at-a-time in pure
# Python; a production build would swap in a C implementation here
# (librdkafka uses hardware SSE4.2 crc32c), the wire bytes are
# identical.  Vectors pinned in tests: b"123456789" -> 0xE3069283,
# 32 zero bytes -> 0x8A9136AA (RFC 3720 B.4).
# ---------------------------------------------------------------------------

def _make_tables():
    poly = 0x82F63B78
    t0 = []
    for n in range(256):
        c = n
        for _ in range(8):
            c = (c >> 1) ^ poly if c & 1 else c >> 1
        t0.append(c)
    tables = [t0]
    for k in range(1, 4):
        prev = tables[k - 1]
        tables.append([(prev[n] >> 8) ^ t0[prev[n] & 0xFF]
                       for n in range(256)])
    return tables

_T = _make_tables()


def crc32c(data: bytes, crc: int = 0) -> int:
    crc ^= 0xFFFFFFFF
    t0, t1, t2, t3 = _T
    n = len(data)
    i = 0
    end4 = n - (n % 4)
    while i < end4:
        crc ^= data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) \
            | (data[i + 3] << 24)
        crc = (t3[crc & 0xFF] ^ t2[(crc >> 8) & 0xFF]
               ^ t1[(crc >> 16) & 0xFF] ^ t0[(crc >> 24) & 0xFF])
        i += 4
    while i < n:
        crc = (crc >> 8) ^ t0[(crc ^ data[i]) & 0xFF]
        i += 1
    return crc ^ 0xFFFFFFFF


# ---------------------------------------------------------------------------
# murmur2 — the Java client's Utils.murmur2, used by the
# DefaultPartitioner: partition = (murmur2(keyBytes) & 0x7fffffff) %
# numPartitions.  omkafka's librdkafka exposes the same as the
# "murmur2" partitioner.  Null keys round-robin (sticky in modern
# clients; plain cycling here, the reference's random+consistent modes
# are omkafka.c:375-377 config).
# ---------------------------------------------------------------------------

def murmur2(data: bytes) -> int:
    length = len(data)
    seed = 0x9747B28C
    m = 0x5BD1E995
    r = 24
    h = (seed ^ length) & 0xFFFFFFFF
    i = 0
    end4 = length - (length % 4)
    while i < end4:
        k = data[i] | (data[i + 1] << 8) | (data[i + 2] << 16) \
            | (data[i + 3] << 24)
        k = (k * m) & 0xFFFFFFFF
        k ^= k >> r
        k = (k * m) & 0xFFFFFFFF
        h = (h * m) & 0xFFFFFFFF
        h ^= k
        i += 4
    left = length % 4
    if left >= 3:
        h ^= (data[end4 + 2] & 0xFF) << 16
    if left >= 2:
        h ^= (data[end4 + 1] & 0xFF) << 8
    if left >= 1:
        h ^= data[end4] & 0xFF
        h = (h * m) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * m) & 0xFFFFFFFF
    h ^= h >> 15
    return h


def partition_for_key(key: bytes, num_partitions: int) -> int:
    return (murmur2(key) & 0x7FFFFFFF) % num_partitions


# ---------------------------------------------------------------------------
# primitive encoders (big-endian, pre-flexible versions)
# ---------------------------------------------------------------------------

def enc_str(s: str | None) -> bytes:
    if s is None:
        return struct.pack(">h", -1)
    b = s.encode()
    return struct.pack(">h", len(b)) + b


def enc_bytes(b: bytes | None) -> bytes:
    if b is None:
        return struct.pack(">i", -1)
    return struct.pack(">i", len(b)) + b


def zigzag_encode(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


class Reader:
    """Cursor over a response buffer."""

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def _unpack(self, fmt: str, size: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def i8(self):
        return self._unpack(">b", 1)

    def i16(self):
        return self._unpack(">h", 2)

    def i32(self):
        return self._unpack(">i", 4)

    def i64(self):
        return self._unpack(">q", 8)

    def u32(self):
        return self._unpack(">I", 4)

    def string(self):
        n = self.i16()
        if n < 0:
            return None
        s = self.buf[self.pos:self.pos + n].decode()
        self.pos += n
        return s

    def nbytes(self):
        n = self.i32()
        if n < 0:
            return None
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def varint(self) -> int:
        shift = 0
        z = 0
        while True:
            b = self.buf[self.pos]
            self.pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (z >> 1) ^ -(z & 1)


# ---------------------------------------------------------------------------
# record batch v2 (magic 2) — the only message format modern brokers
# write.  Layout per the public spec: baseOffset/batchLength header,
# CRC-32C over attributes..end, then zigzag-varint records.
# ---------------------------------------------------------------------------

def encode_record_batch(records: list[tuple[bytes | None, bytes]],
                        base_timestamp: int = 0,
                        base_offset: int = 0) -> bytes:
    """records = [(key or None, value)]; timestamps constant (a batch
    engine stamps event time in the payload, not the broker field)."""
    body = bytearray()
    for i, (key, value) in enumerate(records):
        rec = bytearray()
        rec += b"\x00"                      # attributes
        rec += zigzag_encode(0)             # timestampDelta
        rec += zigzag_encode(i)             # offsetDelta
        if key is None:
            rec += zigzag_encode(-1)
        else:
            rec += zigzag_encode(len(key)) + key
        rec += zigzag_encode(len(value)) + value
        rec += zigzag_encode(0)             # header count
        body += zigzag_encode(len(rec)) + rec

    n = len(records)
    # attributes..records — the CRC-covered region
    crc_region = (struct.pack(">hiqqqhii",
                              0,                # attributes (no codec)
                              n - 1,            # lastOffsetDelta
                              base_timestamp,   # firstTimestamp
                              base_timestamp,   # maxTimestamp
                              -1,               # producerId
                              -1,               # producerEpoch
                              -1,               # baseSequence
                              n) + bytes(body))
    crc = crc32c(crc_region)
    after_length = (struct.pack(">ibI", 0, 2, crc)  # leaderEpoch, magic, crc
                    + crc_region)
    return struct.pack(">qi", base_offset, len(after_length)) + after_length


def decode_record_batches(buf: bytes) -> list[dict]:
    """Decode one or more back-to-back record batches (a fetch response
    record_set concatenates batches).  Returns
    [{offset, timestamp, key, value}] and VERIFIES each batch CRC."""
    out: list[dict] = []
    pos = 0
    total = len(buf)
    while pos + 12 <= total:
        base_offset, batch_len = struct.unpack_from(">qi", buf, pos)
        if pos + 12 + batch_len > total:
            break  # partial trailing batch (broker may truncate) — drop
        r = Reader(buf, pos + 12)
        r.i32()                       # partitionLeaderEpoch
        magic = r.i8()
        if magic != 2:
            raise ValueError(f"unsupported magic {magic}")
        crc = r.u32()
        crc_start = r.pos
        batch_end = pos + 12 + batch_len
        if crc32c(buf[crc_start:batch_end]) != crc:
            raise ValueError("record batch CRC-32C mismatch")
        attributes = r.i16()
        if attributes & 0x07:
            raise ValueError("compressed batches not supported")
        r.i32()                       # lastOffsetDelta
        first_ts = r.i64()
        r.i64()                       # maxTimestamp
        r.i64()                       # producerId
        r.i16()                       # producerEpoch
        r.i32()                       # baseSequence
        n = r.i32()
        for _ in range(n):
            r.varint()                # record length
            r.i8()                    # attributes
            ts_delta = r.varint()
            off_delta = r.varint()
            klen = r.varint()
            key = None
            if klen >= 0:
                key = bytes(r.buf[r.pos:r.pos + klen])
                r.pos += klen
            vlen = r.varint()
            value = bytes(r.buf[r.pos:r.pos + vlen])
            r.pos += vlen
            hdrs = r.varint()
            for _h in range(hdrs):
                hk = r.varint()
                r.pos += hk
                hv = r.varint()
                if hv > 0:
                    r.pos += hv
            out.append({"offset": base_offset + off_delta,
                        "timestamp": first_ts + ts_delta,
                        "key": key, "value": value})
        pos = batch_end
    return out


# ---------------------------------------------------------------------------
# request framing + per-API codecs
# ---------------------------------------------------------------------------

API_PRODUCE, API_FETCH, API_METADATA, API_VERSIONS = 0, 1, 3, 18

ERR_NONE = 0
ERR_OFFSET_OUT_OF_RANGE = 1
ERR_UNKNOWN_TOPIC_OR_PARTITION = 3
ERR_NOT_LEADER = 6
ERR_REQUEST_TIMED_OUT = 7

_RETRIABLE = {ERR_NOT_LEADER, ERR_REQUEST_TIMED_OUT,
              ERR_UNKNOWN_TOPIC_OR_PARTITION}  # auto-create lag


def frame_request(api_key: int, api_version: int, correlation_id: int,
                  client_id: str, body: bytes) -> bytes:
    hdr = (struct.pack(">hhi", api_key, api_version, correlation_id)
           + enc_str(client_id))
    return struct.pack(">i", len(hdr) + len(body)) + hdr + body


def read_frame(sock: socket.socket) -> bytes:
    hdr = _recv_exact(sock, 4)
    (size,) = struct.unpack(">i", hdr)
    return _recv_exact(sock, size)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    chunks = []
    while n:
        c = sock.recv(n)
        if not c:
            raise ConnectionError("kafka peer closed connection")
        chunks.append(c)
        n -= len(c)
    return b"".join(chunks)


def encode_metadata_request(topics: list[str]) -> bytes:
    return (struct.pack(">i", len(topics))
            + b"".join(enc_str(t) for t in topics))


def decode_metadata_response(r: Reader) -> dict:
    brokers = []
    for _ in range(r.i32()):
        node = r.i32()
        host = r.string()
        port = r.i32()
        r.string()  # rack (v1)
        brokers.append({"node_id": node, "host": host, "port": port})
    controller = r.i32()
    topics = {}
    for _ in range(r.i32()):
        err = r.i16()
        name = r.string()
        r.i8()  # is_internal
        parts = {}
        for _p in range(r.i32()):
            perr = r.i16()
            pid = r.i32()
            leader = r.i32()
            for _x in range(r.i32()):
                r.i32()  # replicas
            for _x in range(r.i32()):
                r.i32()  # isr
            parts[pid] = {"error": perr, "leader": leader}
        topics[name] = {"error": err, "partitions": parts}
    return {"brokers": brokers, "controller": controller, "topics": topics}


def encode_produce_request(topic_sets: dict[str, dict[int, bytes]],
                           acks: int = -1, timeout_ms: int = 10000) -> bytes:
    """topic_sets: {topic: {partition: record_batch_bytes}} — Produce v3."""
    out = bytearray()
    out += enc_str(None)                       # transactional_id
    out += struct.pack(">hi", acks, timeout_ms)
    out += struct.pack(">i", len(topic_sets))
    for topic, parts in topic_sets.items():
        out += enc_str(topic)
        out += struct.pack(">i", len(parts))
        for pid, batch in parts.items():
            out += struct.pack(">i", pid) + enc_bytes(batch)
    return bytes(out)


def decode_produce_response(r: Reader) -> dict[tuple[str, int], dict]:
    out = {}
    for _ in range(r.i32()):
        topic = r.string()
        for _p in range(r.i32()):
            pid = r.i32()
            err = r.i16()
            base = r.i64()
            r.i64()  # log_append_time (v2+)
            out[(topic, pid)] = {"error": err, "base_offset": base}
    r.i32()  # throttle_time_ms — trails the body in Produce v1+
    return out


def encode_fetch_request(topic: str, partition: int, offset: int,
                         max_bytes: int = 1 << 20,
                         max_wait_ms: int = 100) -> bytes:
    out = bytearray()
    out += struct.pack(">iiiib", -1, max_wait_ms, 1, max_bytes, 0)
    out += struct.pack(">i", 1) + enc_str(topic)
    out += struct.pack(">i", 1)
    out += struct.pack(">iqi", partition, offset, max_bytes)
    return bytes(out)


def decode_fetch_response(r: Reader) -> dict[tuple[str, int], dict]:
    r.i32()  # throttle_time_ms — leads the body in Fetch v1+
    out = {}
    for _ in range(r.i32()):
        topic = r.string()
        for _p in range(r.i32()):
            pid = r.i32()
            err = r.i16()
            hwm = r.i64()
            r.i64()  # last_stable_offset (v4)
            naborted = r.i32()
            for _a in range(max(naborted, 0)):
                r.i64()
                r.i64()
            record_set = r.nbytes() or b""
            out[(topic, pid)] = {"error": err, "high_watermark": hwm,
                                 "records": record_set}
    return out


# ---------------------------------------------------------------------------
# clients
# ---------------------------------------------------------------------------

class _KafkaConn:
    """One broker connection: lazy connect, correlation-id matching,
    closed+reraised on socket error so the caller's bounded retry
    reconnects (ConnectorSink suspend/resume, omkafka.c's
    rd_kafka_poll error callbacks)."""

    def __init__(self, host: str, port: int, client_id: str = "raylog"):
        self.addr = (host, port)
        self.client_id = client_id
        self._sock: socket.socket | None = None
        self._corr = 0

    def _connected(self) -> socket.socket:
        if self._sock is None:
            self._sock = socket.create_connection(self.addr, timeout=10)
        return self._sock

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def roundtrip(self, api_key: int, api_version: int,
                  body: bytes) -> Reader:
        self._corr += 1
        corr = self._corr
        try:
            s = self._connected()
            s.sendall(frame_request(api_key, api_version, corr,
                                    self.client_id, body))
            resp = read_frame(s)
        except OSError:
            self.close()
            raise
        r = Reader(resp)
        got = r.i32()
        if got != corr:
            self.close()
            raise ConnectionError(f"correlation id {got} != {corr}")
        return r


class KafkaProduceClient(_KafkaConn):
    """Producer: partitions messages (murmur2 on key, round-robin on
    null key), encodes magic-v2 batches, sends Produce v3, raises on
    any per-partition error so the bulk is retried/suspended —
    omkafka's deliver-callback failure path (omkafka.c failedMsgFile
    quarantines at that layer; here ConnectorSink does)."""

    def __init__(self, host: str, port: int, client_id: str = "raylog",
                 acks: int = -1):
        super().__init__(host, port, client_id)
        self.acks = acks
        self._rr = 0
        self._nparts: dict[str, int] = {}

    def num_partitions(self, topic: str) -> int:
        if topic not in self._nparts:
            r = self.roundtrip(API_METADATA, 1,
                               encode_metadata_request([topic]))
            md = decode_metadata_response(r)
            t = md["topics"].get(topic)
            if t is None or t["error"] not in (0,):
                raise ConnectionError(
                    f"metadata error for topic {topic}: "
                    f"{t['error'] if t else 'missing'}")
            self._nparts[topic] = max(len(t["partitions"]), 1)
        return self._nparts[topic]

    def produce(self, topic: str,
                messages: list[tuple[bytes | None, bytes]],
                base_timestamp: int = 0) -> dict[int, int]:
        """Send one bulk; returns {partition: base_offset}."""
        nparts = self.num_partitions(topic)
        by_part: dict[int, list] = {}
        for key, value in messages:
            if key is None:
                pid = self._rr % nparts
                self._rr += 1
            else:
                pid = partition_for_key(key, nparts)
            by_part.setdefault(pid, []).append((key, value))
        sets = {pid: encode_record_batch(msgs, base_timestamp)
                for pid, msgs in by_part.items()}
        r = self.roundtrip(API_PRODUCE, 3,
                           encode_produce_request({topic: sets},
                                                  acks=self.acks))
        resp = decode_produce_response(r)
        offsets = {}
        for (t, pid), st in resp.items():
            if st["error"] != ERR_NONE:
                if st["error"] in _RETRIABLE:
                    self._nparts.pop(t, None)  # refresh metadata on retry
                raise ConnectionError(
                    f"produce error {st['error']} on {t}/{pid}")
            offsets[pid] = st["base_offset"]
        return offsets


class KafkaFetchClient(_KafkaConn):
    """Consumer: Fetch v4 from an explicit offset.  Returns decoded
    records + the next offset; offset checkpointing belongs to the
    caller (the engine's lineage), not broker group state."""

    def fetch(self, topic: str, partition: int, offset: int,
              max_bytes: int = 1 << 20) -> tuple[list[dict], int]:
        r = self.roundtrip(API_FETCH, 4,
                           encode_fetch_request(topic, partition, offset,
                                                max_bytes))
        resp = decode_fetch_response(r)
        st = resp[(topic, partition)]
        if st["error"] != ERR_NONE:
            raise ConnectionError(
                f"fetch error {st['error']} on {topic}/{partition}")
        records = decode_record_batches(st["records"])
        next_off = records[-1]["offset"] + 1 if records else offset
        # brokers serve whole batches; the batch containing the fetch
        # offset may straddle it — the CLIENT drops earlier records
        # (librdkafka does the same skip-to-offset)
        records = [r for r in records if r["offset"] >= offset]
        return records, next_off
