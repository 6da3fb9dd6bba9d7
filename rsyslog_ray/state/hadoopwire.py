"""Hadoop native wire protocols — hand-rolled protobuf + RPC v9 +
DataTransferProtocol, from the PUBLIC Hadoop sources' .proto files
(RpcHeader.proto, IpcConnectionContext.proto, ProtobufRpcEngine.proto,
ClientNamenodeProtocol.proto, hdfs.proto, datatransfer.proto).

The reference's omhdfs delegates to libhdfs (plugins/omhdfs/omhdfs.c:
40-43 hdfsConnect/hdfsOpenFile/hdfsWrite); this container has no JVM
or libhdfs, so the wire itself is implemented — the same posture as
state/kafkawire.py (librdkafka → raw Fetch/Produce) and
state/dbwire.py (drivers → raw wire).  Scope: the single-writer HDFS
create path a log sink needs — NameNode ``create`` → ``addBlock`` →
DataNode ``WRITE_BLOCK`` packet stream (CRC32C chunk checksums) →
``complete``.  SASL/Kerberos is out of scope (SIMPLE auth), as is
multi-block files and pipeline recovery — documented limits, enforced
loudly.

Protobuf wire format (public encoding spec): varints, zigzag for
sint*, tag = (field << 3) | wire_type, length-delimited submessages.
The generic :func:`pb_decode` returns {field: [raw values]} so the
response parsers stay explicit about field numbers.
"""

from __future__ import annotations

import os
import socket
import struct
import uuid

from .kafkawire import crc32c

# ---- protobuf primitives -------------------------------------------


def pb_varint(n: int) -> bytes:
    if n < 0:
        n &= (1 << 64) - 1          # int64 two's-complement
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def pb_zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63)


def _tag(field: int, wt: int) -> bytes:
    return pb_varint((field << 3) | wt)


def pb_uint(field: int, n: int) -> bytes:
    return _tag(field, 0) + pb_varint(n)


def pb_sint(field: int, n: int) -> bytes:
    return _tag(field, 0) + pb_varint(pb_zigzag(n))


def pb_bool(field: int, v: bool) -> bytes:
    return pb_uint(field, 1 if v else 0)


def pb_bytes(field: int, b: bytes) -> bytes:
    return _tag(field, 2) + pb_varint(len(b)) + b


def pb_str(field: int, s: str) -> bytes:
    return pb_bytes(field, s.encode("utf-8"))


def pb_msg(field: int, m: bytes) -> bytes:
    return pb_bytes(field, m)


def read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    n = shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 70:
            raise ValueError("varint too long")


def pb_decode(buf: bytes) -> dict[int, list]:
    """Generic message decode: {field: [value, ...]} — varints as int,
    length-delimited as bytes, fixed32/64 as int."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 7
        if wt == 0:
            v, pos = read_varint(buf, pos)
        elif wt == 2:
            ln, pos = read_varint(buf, pos)
            if pos + ln > len(buf):
                raise ValueError("truncated length-delimited field")
            v = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:
            v = struct.unpack_from("<I", buf, pos)[0]
            pos += 4
        elif wt == 1:
            v = struct.unpack_from("<Q", buf, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(field, []).append(v)
    return out


def pb_first(d: dict[int, list], field: int, default=None):
    v = d.get(field)
    return v[0] if v else default


def delimited(msg: bytes) -> bytes:
    """Hadoop's writeDelimitedTo: varint length prefix + body."""
    return pb_varint(len(msg)) + msg


def read_delimited(buf: bytes, pos: int) -> tuple[bytes, int]:
    ln, pos = read_varint(buf, pos)
    if pos + ln > len(buf):
        raise ValueError("truncated delimited message")
    return buf[pos:pos + ln], pos + ln


# ---- RPC v9 messages -----------------------------------------------

RPC_KIND_PROTOBUF = 2
RPC_FINAL_PACKET = 0
CONNECTION_CONTEXT_CALL_ID = -3

CLIENT_PROTOCOL = "org.apache.hadoop.hdfs.protocol.ClientProtocol"


def rpc_request_header(call_id: int, client_id: bytes,
                       retry_count: int = -1) -> bytes:
    """RpcRequestHeaderProto (RpcHeader.proto): rpcKind=1, rpcOp=2,
    callId=3 (sint32), clientId=4, retryCount=5 (sint32)."""
    return (pb_uint(1, RPC_KIND_PROTOBUF) + pb_uint(2, RPC_FINAL_PACKET)
            + pb_sint(3, call_id) + pb_bytes(4, client_id)
            + pb_sint(5, retry_count))


def connection_context(user: str,
                       protocol: str = CLIENT_PROTOCOL) -> bytes:
    """IpcConnectionContextProto: userInfo=2{effectiveUser=1},
    protocol=3."""
    return pb_msg(2, pb_str(1, user)) + pb_str(3, protocol)


def request_header(method: str, protocol: str = CLIENT_PROTOCOL,
                   version: int = 1) -> bytes:
    """RequestHeaderProto (ProtobufRpcEngine.proto)."""
    return (pb_str(1, method) + pb_str(2, protocol)
            + pb_uint(3, version))


# status enum of RpcResponseHeaderProto
RPC_SUCCESS, RPC_ERROR, RPC_FATAL = 0, 1, 2


class HdfsRpcError(ConnectionError):
    pass


class HdfsRpcClient:
    """Hadoop IPC v9 client (SIMPLE auth): connection preamble
    ``hrpc`` + version 9 + serviceClass 0 + authProtocol 0, a
    connection-context packet, then length-prefixed protobuf calls."""

    def __init__(self, host: str, port: int, user: str = "rsyslog",
                 timeout: float = 10.0):
        self.host, self.port, self.user = host, port, user
        self.timeout = timeout
        self.client_id = uuid.uuid4().bytes
        self._sock: socket.socket | None = None
        self._call_id = 0

    # -- transport

    def _connect(self) -> socket.socket:
        if self._sock is None:
            s = socket.create_connection((self.host, self.port),
                                         timeout=self.timeout)
            s.sendall(b"hrpc" + bytes([9, 0, 0]))
            hdr = rpc_request_header(CONNECTION_CONTEXT_CALL_ID,
                                     self.client_id)
            body = delimited(hdr) + delimited(
                connection_context(self.user))
            s.sendall(struct.pack(">I", len(body)) + body)
            self._sock = s
        return self._sock

    def _recv_exact(self, n: int) -> bytes:
        s = self._sock
        out = b""
        while len(out) < n:
            chunk = s.recv(n - len(out))
            if not chunk:
                raise HdfsRpcError("connection closed mid-response")
            out += chunk
        return out

    def call(self, method: str, request: bytes) -> bytes:
        """One protobuf RPC; returns the raw response message bytes."""
        s = self._connect()
        self._call_id += 1
        body = (delimited(rpc_request_header(self._call_id,
                                             self.client_id, 0))
                + delimited(request_header(method))
                + delimited(request))
        s.sendall(struct.pack(">I", len(body)) + body)
        (total,) = struct.unpack(">I", self._recv_exact(4))
        payload = self._recv_exact(total)
        hdr, pos = read_delimited(payload, 0)
        h = pb_decode(hdr)
        status = pb_first(h, 2, RPC_FATAL)
        if status != RPC_SUCCESS:
            exc = pb_first(h, 4, b"?").decode("utf-8", "replace")
            msg = pb_first(h, 5, b"").decode("utf-8", "replace")
            raise HdfsRpcError(f"rpc {method} failed: {exc}: {msg}")
        if pos < len(payload):
            resp, _pos = read_delimited(payload, pos)
            return resp
        return b""

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    # -- ClientNamenodeProtocol subset

    CREATE_FLAG_CREATE = 0x01
    CREATE_FLAG_OVERWRITE = 0x02

    def create(self, src: str, *, perm: int = 0o644,
               overwrite: bool = True, replication: int = 1,
               block_size: int = 128 * 1024 * 1024) -> dict:
        """CreateRequestProto -> file status fields (fileId at 16 of
        HdfsFileStatusProto when the server reports one)."""
        flag = self.CREATE_FLAG_CREATE | (
            self.CREATE_FLAG_OVERWRITE if overwrite else 0)
        req = (pb_str(1, src) + pb_msg(2, pb_uint(1, perm))
               + pb_str(3, self._client_name()) + pb_uint(4, flag)
               + pb_bool(5, True) + pb_uint(6, replication)
               + pb_uint(7, block_size))
        resp = pb_decode(self.call("create", req))
        fs = pb_first(resp, 1)
        file_id = 0
        if fs:
            file_id = pb_first(pb_decode(fs), 16, 0)
        return {"fileId": int(file_id)}

    def add_block(self, src: str, file_id: int = 0) -> dict:
        """AddBlockRequestProto -> located block: (pool, block_id,
        gen_stamp, token, [(ip, port)...])."""
        req = pb_str(1, src) + pb_str(2, self._client_name())
        if file_id:
            req += pb_uint(5, file_id)
        resp = pb_decode(self.call("addBlock", req))
        lb = pb_decode(pb_first(resp, 1, b""))
        eb = pb_decode(pb_first(lb, 1, b""))
        locs = []
        for dn in lb.get(3, []):
            did = pb_decode(pb_first(pb_decode(dn), 1, b""))
            locs.append((pb_first(did, 1, b"").decode(),
                         int(pb_first(did, 4, 0))))
        return {
            "pool": pb_first(eb, 1, b"").decode(),
            "block_id": int(pb_first(eb, 2, 0)),
            "gen_stamp": int(pb_first(eb, 3, 0)),
            "token": pb_first(lb, 5, b""),
            "locs": locs,
        }

    def complete(self, src: str, block: dict | None,
                 file_id: int = 0, num_bytes: int = 0) -> bool:
        req = pb_str(1, src) + pb_str(2, self._client_name())
        if block:
            last = (pb_str(1, block["pool"])
                    + pb_uint(2, block["block_id"])
                    + pb_uint(3, block["gen_stamp"])
                    + pb_uint(4, num_bytes))
            req += pb_msg(3, last)
        if file_id:
            req += pb_uint(4, file_id)
        resp = pb_decode(self.call("complete", req))
        return bool(pb_first(resp, 1, 0))

    def _client_name(self) -> str:
        return f"rsyslog_ray-{os.getpid()}-{self.client_id.hex()[:8]}"


# ---- DataTransferProtocol (datatransfer.proto) ----------------------

DT_VERSION = 28
OP_WRITE_BLOCK = 80
STAGE_PIPELINE_SETUP_CREATE = 6
CHECKSUM_CRC32C = 2
DT_STATUS_SUCCESS = 0


def op_write_block(block: dict, client_name: str, *,
                   bytes_per_checksum: int = 512,
                   latest_gen_stamp: int | None = None) -> bytes:
    """OpWriteBlockProto for a pipeline of one datanode."""
    eb = (pb_str(1, block["pool"]) + pb_uint(2, block["block_id"])
          + pb_uint(3, block["gen_stamp"]))
    base = pb_msg(1, eb)
    if block.get("token"):
        base += pb_msg(2, block["token"])
    header = pb_msg(1, base) + pb_str(2, client_name)
    checksum = (pb_uint(1, CHECKSUM_CRC32C)
                + pb_uint(2, bytes_per_checksum))
    return (pb_msg(1, header)
            + pb_uint(4, STAGE_PIPELINE_SETUP_CREATE)
            + pb_uint(5, 1)                     # pipelineSize
            + pb_uint(6, 0) + pb_uint(7, 0)     # min/maxBytesRcvd
            + pb_uint(8, latest_gen_stamp
                      if latest_gen_stamp is not None
                      else block["gen_stamp"])
            + pb_msg(9, checksum))


def packet_bytes(offset: int, seqno: int, data: bytes, *,
                 last: bool = False,
                 bytes_per_checksum: int = 512) -> bytes:
    """One write-pipeline packet: PLEN (4B: 4 + checksums + data),
    HLEN (2B), PacketHeaderProto, CRC32C per chunk, data."""
    sums = b"".join(
        struct.pack(">I", crc32c(data[i:i + bytes_per_checksum]))
        for i in range(0, len(data), bytes_per_checksum))
    # PacketHeaderProto: offsetInBlock/seqno are sfixed64 (wire type
    # 1, little-endian), dataLen sfixed32 (wire type 5) — fixed-width
    # so the header size is constant, per the Java writer
    hdr = (_tag(1, 1) + struct.pack("<q", offset)
           + _tag(2, 1) + struct.pack("<q", seqno)
           + pb_bool(3, last)
           + _tag(4, 5) + struct.pack("<i", len(data)))
    plen = 4 + len(sums) + len(data)
    return (struct.pack(">I", plen) + struct.pack(">H", len(hdr))
            + hdr + sums + data)


class BlockWriter:
    """Single-block write stream to one datanode: WRITE_BLOCK op,
    packets with CRC32C chunk checksums, final empty last-packet,
    pipeline ack check."""

    def __init__(self, host: str, port: int, block: dict,
                 client_name: str, *, bytes_per_checksum: int = 512,
                 timeout: float = 10.0):
        self.block = block
        self.bpc = bytes_per_checksum
        self._sock = socket.create_connection((host, port),
                                              timeout=timeout)
        self._sock.sendall(
            struct.pack(">H", DT_VERSION) + bytes([OP_WRITE_BLOCK])
            + delimited(op_write_block(block, client_name,
                                       bytes_per_checksum=bytes_per_checksum)))
        resp = pb_decode(self._read_delimited())
        if pb_first(resp, 1, -1) != DT_STATUS_SUCCESS:
            raise HdfsRpcError(
                f"datanode refused WRITE_BLOCK: status="
                f"{pb_first(resp, 1)}")
        self.offset = 0
        self.seqno = 0

    def _read_delimited(self) -> bytes:
        buf = b""
        while True:
            b = self._sock.recv(1)
            if not b:
                raise HdfsRpcError("datanode closed mid-handshake")
            buf += b
            if not b[0] & 0x80:
                break
        ln, _ = read_varint(buf, 0)
        out = b""
        while len(out) < ln:
            chunk = self._sock.recv(ln - len(out))
            if not chunk:
                raise HdfsRpcError("datanode closed mid-message")
            out += chunk
        return out

    def write(self, data: bytes) -> None:
        if not data:
            return
        self._sock.sendall(packet_bytes(
            self.offset, self.seqno, data,
            bytes_per_checksum=self.bpc))
        self.offset += len(data)
        self.seqno += 1

    def finish(self) -> int:
        """Send the empty last packet, verify the pipeline ack;
        returns total bytes written."""
        self._sock.sendall(packet_bytes(
            self.offset, self.seqno, b"", last=True,
            bytes_per_checksum=self.bpc))
        ack = pb_decode(self._read_delimited())
        replies = ack.get(2, [])
        if replies and any(r != DT_STATUS_SUCCESS for r in replies):
            raise HdfsRpcError(f"pipeline ack failure: {replies}")
        try:
            self._sock.close()
        except OSError:
            pass
        return self.offset
