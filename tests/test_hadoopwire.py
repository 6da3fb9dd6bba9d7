"""Hadoop native wire (state/hadoopwire.py + HdfsNativeTransport):
protobuf encoders pinned against hand-computed golden bytes, then the
full single-writer create path driven against live NameNode/DataNode
doubles that parse every request and verify packet checksums."""

import json
import socket
import struct
import threading

import pandas as pd
import pytest

from rsyslog_ray.state.hadoopwire import (BlockWriter, HdfsRpcClient,
                                          HdfsRpcError, delimited,
                                          op_write_block, packet_bytes,
                                          pb_bool, pb_bytes, pb_decode,
                                          pb_first, pb_msg, pb_sint,
                                          pb_str, pb_uint, pb_varint,
                                          read_delimited, read_varint,
                                          rpc_request_header)
from rsyslog_ray.state.kafkawire import crc32c


def test_protobuf_golden_bytes():
    """Encoders pinned to the protobuf wire spec by hand-computed
    vectors — NOT round-tripped through our own decoder only."""
    assert pb_varint(0) == b"\x00"
    assert pb_varint(1) == b"\x01"
    assert pb_varint(300) == b"\xac\x02"          # spec example
    assert pb_uint(1, 150) == b"\x08\x96\x01"     # spec example
    assert pb_str(2, "testing") == b"\x12\x07testing"
    # sint32 zigzag: -1 -> 1, -2 -> 3 (spec table)
    assert pb_sint(3, -1) == b"\x18\x01"
    assert pb_sint(3, -2) == b"\x18\x03"
    assert pb_bool(5, True) == b"\x28\x01"
    # nested message
    assert pb_msg(2, pb_str(1, "u")) == b"\x12\x03\x0a\x01u"
    # generic decode inverts all of it
    d = pb_decode(pb_uint(1, 150) + pb_str(2, "testing")
                  + pb_sint(3, -2))
    assert pb_first(d, 1) == 150
    assert pb_first(d, 2) == b"testing"
    assert pb_first(d, 3) == 3                    # raw zigzag value


def test_rpc_request_header_golden():
    """RpcRequestHeaderProto for the connection context call (callId
    -3): field-by-field hand assembly."""
    cid = bytes(range(16))
    hdr = rpc_request_header(-3, cid)
    # 1: rpcKind=2, 2: rpcOp=0, 3: sint32 -3 -> zigzag 5,
    # 4: clientId bytes, 5: retryCount sint32 -1 -> 1
    assert hdr == (b"\x08\x02" + b"\x10\x00" + b"\x18\x05"
                   + b"\x22\x10" + cid + b"\x28\x01")


def test_packet_bytes_layout():
    """Write-pipeline packet framing: PLEN covers itself + checksums +
    data (not the header); fixed-width header fields; one CRC32C per
    bytes_per_checksum chunk."""
    data = bytes(range(100)) * 13          # 1300 B -> 3 chunks @512
    pkt = packet_bytes(4096, 7, data, bytes_per_checksum=512)
    plen, hlen = struct.unpack(">IH", pkt[:6])
    assert plen == 4 + 3 * 4 + len(data)
    hdr = pb_decode(pkt[6:6 + hlen])
    assert pb_first(hdr, 1) == 4096        # offsetInBlock sfixed64
    assert pb_first(hdr, 2) == 7           # seqno
    assert pb_first(hdr, 4) == len(data)   # dataLen sfixed32
    sums = pkt[6 + hlen:6 + hlen + 12]
    assert struct.unpack(">I", sums[:4])[0] == crc32c(data[:512])
    assert pkt[6 + hlen + 12:] == data


# ---- live doubles ---------------------------------------------------


class _DataNodeDouble:
    """Parses WRITE_BLOCK + the packet stream, verifying every chunk
    CRC; serves the op response and the final pipeline ack."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.blocks = {}            # block_id -> bytes
        self.ops = []
        threading.Thread(target=self._serve, daemon=True).start()

    def _recv(self, c, n):
        out = b""
        while len(out) < n:
            chunk = c.recv(n - len(out))
            if not chunk:
                raise ConnectionError("client closed")
            out += chunk
        return out

    def _read_delim(self, c):
        buf = b""
        while True:
            b = self._recv(c, 1)
            buf += b
            if not b[0] & 0x80:
                break
        ln, _ = read_varint(buf, 0)
        return self._recv(c, ln)

    def _serve(self):
        while True:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            try:
                self._one(c)
            except ConnectionError:
                pass
            finally:
                c.close()

    def _one(self, c):
        ver, op = struct.unpack(">HB", self._recv(c, 3))
        assert ver == 28 and op == 80, (ver, op)
        req = pb_decode(self._read_delim(c))
        hdr = pb_decode(pb_first(req, 1))
        base = pb_decode(pb_first(hdr, 1))
        eb = pb_decode(pb_first(base, 1))
        block_id = pb_first(eb, 2)
        cs = pb_decode(pb_first(req, 9))
        assert pb_first(cs, 1) == 2            # CRC32C
        bpc = pb_first(cs, 2)
        assert pb_first(req, 4) == 6           # PIPELINE_SETUP_CREATE
        assert pb_first(req, 5) == 1           # pipelineSize
        self.ops.append(("write_block", block_id))
        # BlockOpResponseProto: status SUCCESS
        c.sendall(delimited(pb_uint(1, 0)))
        data = b""
        while True:
            plen, hlen = struct.unpack(">IH", self._recv(c, 6))
            ph = pb_decode(self._recv(c, hlen))
            payload = self._recv(c, plen - 4)
            dlen = pb_first(ph, 4)
            nsum = (dlen + bpc - 1) // bpc
            sums, body = payload[:4 * nsum], payload[4 * nsum:]
            assert len(body) == dlen
            for i in range(nsum):
                want = struct.unpack(">I", sums[4 * i:4 * i + 4])[0]
                assert crc32c(body[i * bpc:(i + 1) * bpc]) == want
            assert pb_first(ph, 1) == len(data)     # offsetInBlock
            data += body
            if pb_first(ph, 3):                     # lastPacketInBlock
                self.blocks[block_id] = data
                # PipelineAckProto: seqno + one SUCCESS reply
                c.sendall(delimited(
                    pb_sint(1, pb_first(ph, 2)) + pb_uint(2, 0)))
                return

    def close(self):
        self.sock.close()


class _NameNodeDouble:
    """RPC v9 server double: validates the hrpc preamble and the
    connection context, then answers create/addBlock/complete with
    spec-shaped responses pointing at a datanode double."""

    def __init__(self, datanode_port: int):
        self.dn_port = datanode_port
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(4)
        self.port = self.sock.getsockname()[1]
        self.calls = []
        self.context_user = None
        self.completed = []
        threading.Thread(target=self._serve, daemon=True).start()

    def _recv(self, c, n):
        out = b""
        while len(out) < n:
            chunk = c.recv(n - len(out))
            if not chunk:
                raise ConnectionError("client closed")
            out += chunk
        return out

    def _serve(self):
        while True:
            try:
                c, _ = self.sock.accept()
            except OSError:
                return
            try:
                self._conn(c)
            except ConnectionError:
                pass
            finally:
                c.close()

    def _conn(self, c):
        pre = self._recv(c, 7)
        assert pre == b"hrpc" + bytes([9, 0, 0]), pre
        while True:
            (total,) = struct.unpack(">I", self._recv(c, 4))
            payload = self._recv(c, total)
            hdr, pos = read_delimited(payload, 0)
            h = pb_decode(hdr)
            raw_call = pb_first(h, 3)
            call_id = (raw_call >> 1) ^ -(raw_call & 1)  # un-zigzag
            if call_id == -3:
                ctx = pb_decode(read_delimited(payload, pos)[0])
                user = pb_decode(pb_first(ctx, 2, b""))
                self.context_user = pb_first(user, 1, b"").decode()
                assert pb_first(ctx, 3, b"").decode().endswith(
                    "ClientProtocol")
                continue
            req_hdr, pos = read_delimited(payload, pos)
            method = pb_first(pb_decode(req_hdr), 1).decode()
            req, _ = read_delimited(payload, pos)
            self.calls.append(method)
            resp = self._dispatch(method, pb_decode(req))
            out = (delimited(pb_uint(1, call_id) + pb_uint(2, 0))
                   + delimited(resp))
            c.sendall(struct.pack(">I", len(out)) + out)

    def _dispatch(self, method: str, req: dict) -> bytes:
        if method == "create":
            assert pb_first(req, 1).decode().startswith("/")
            # CreateResponseProto{fs=HdfsFileStatusProto{fileId=16}}
            return pb_msg(1, pb_uint(16, 7777))
        if method == "addBlock":
            assert pb_first(req, 5) == 7777          # fileId carried
            eb = (pb_str(1, "BP-test-pool") + pb_uint(2, 424242)
                  + pb_uint(3, 1001))
            did = (pb_str(1, "127.0.0.1") + pb_str(2, "localhost")
                   + pb_str(3, "dn-uuid-1")
                   + pb_uint(4, self.dn_port)
                   + pb_uint(5, 0) + pb_uint(6, 0))
            dn = pb_msg(1, did)
            token = (pb_bytes(1, b"") + pb_bytes(2, b"")
                     + pb_str(3, "") + pb_str(4, ""))
            lb = (pb_msg(1, eb) + pb_uint(2, 0) + pb_msg(3, dn)
                  + pb_bool(4, False) + pb_msg(5, token))
            return pb_msg(1, lb)
        if method == "complete":
            eb = pb_decode(pb_first(req, 3, b""))
            self.completed.append(
                (pb_first(req, 1).decode(), pb_first(eb, 2),
                 pb_first(eb, 4)))
            return pb_bool(1, True)
        raise AssertionError(f"unexpected method {method}")

    def close(self):
        self.sock.close()


def test_hdfs_native_end_to_end():
    """create → addBlock → WRITE_BLOCK packet stream → complete
    against live doubles: the doubles re-parse every request, verify
    chunk CRCs, and the reassembled block equals the rendered lines."""
    from rsyslog_ray.stages.connectors import (ConnectorSink,
                                               HdfsNativeTransport)

    dn = _DataNodeDouble()
    nn = _NameNodeDouble(dn.port)
    try:
        t = HdfsNativeTransport("127.0.0.1", nn.port,
                                file="/logs/app.jsonl", user="svc",
                                bytes_per_checksum=64)
        sink = ConnectorSink(transport=t, batch_rows=3)
        df = pd.DataFrame({"url": [f"http://x/{i}" for i in range(8)],
                           "sev": list(range(8))})
        acct = sink(df)
        assert int(acct["rows_delivered"].sum()) == 8
        t.close()

        assert nn.context_user == "svc"
        assert nn.calls == ["create", "addBlock", "complete"]
        got = dn.blocks[424242].decode()
        lines = [json.loads(l) for l in got.strip().split("\n")]
        assert [r["url"] for r in lines] == \
            [f"http://x/{i}" for i in range(8)]
        # complete carried the final byte count of the block
        src, block_id, nbytes = nn.completed[0]
        assert src == "/logs/app.jsonl"
        assert block_id == 424242
        assert nbytes == len(dn.blocks[424242])
    finally:
        nn.close()
        dn.close()


def test_hdfs_rpc_error_surfaces():
    """A FATAL RpcResponseHeader (e.g. standby namenode) raises
    HdfsRpcError with the server's exception text."""

    class _ErrNN(_NameNodeDouble):
        def _dispatch(self, method, req):
            raise AssertionError    # never reached

        def _conn(self, c):
            pre = self._recv(c, 7)
            assert pre == b"hrpc" + bytes([9, 0, 0])
            while True:
                (total,) = struct.unpack(">I", self._recv(c, 4))
                payload = self._recv(c, total)
                hdr, pos = read_delimited(payload, 0)
                raw = pb_first(pb_decode(hdr), 3)
                if ((raw >> 1) ^ -(raw & 1)) == -3:
                    continue
                out = delimited(
                    pb_uint(1, 1) + pb_uint(2, 2)
                    + pb_str(4, "o.a.h.ipc.StandbyException")
                    + pb_str(5, "Operation category WRITE not "
                                "supported in state standby"))
                c.sendall(struct.pack(">I", len(out)) + out)

    nn = _ErrNN(0)
    try:
        cli = HdfsRpcClient("127.0.0.1", nn.port, "svc")
        with pytest.raises(HdfsRpcError, match="StandbyException"):
            cli.create("/x")
        cli.close()
    finally:
        nn.close()


def test_block_size_guard():
    """The single-block writer refuses to silently overrun its block:
    a bulk that would exceed block_size raises into the retry path
    instead of corrupting the stream."""
    dn = _DataNodeDouble()
    nn = _NameNodeDouble(dn.port)
    try:
        from rsyslog_ray.stages.connectors import HdfsNativeTransport

        t = HdfsNativeTransport("127.0.0.1", nn.port, file="/small",
                                user="svc", block_size=64)
        with pytest.raises(ConnectionError, match="block_size"):
            t([{"x": "a" * 200}])
    finally:
        nn.close()
        dn.close()


def test_omhdfs_action_from_conf(ray_session, tmp_path):
    """action(type="omhdfs" hdfshost=... hdfsfile=...) in a .conf
    routes delivered rows over the native wire: the full pipeline
    writes the sink's rows into the datanode block."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rainerconf import parse_rainer

    dn = _DataNodeDouble()
    nn = _NameNodeDouble(dn.port)
    try:
        # tiny parquet input with a shard column
        src = tmp_path / "pages-00000.parquet"
        pq.write_table(pa.table({
            "text": [f"w{i} alpha" for i in range(6)],
            "lang": ["en"] * 6,
            "shard": pa.array([0] * 6, pa.int32())}), src)
        conf = f'''
        global(workDirectory="{tmp_path}/o")
        input(type="imfile" file="{src}")
        parser(name="w" pattern="^(?P<word>\\\\w+) .*$")
        action(type="omhdfs" hdfshost="127.0.0.1"
               hdfsport="{nn.port}" hdfsfile="/conf/sink.jsonl"
               hdfsuser="svc" name="hdfs_out")
        '''
        cfg = parse_rainer(conf)
        cfg["aggregates"] = [["lang", "lang"]]
        run_config(cfg, resume=False, lineage=False)
        # the writer tasks hold per-worker transports; the block
        # completes when the transport closes with the worker — force
        # it deterministically by closing through a fresh transport is
        # not possible, so assert on what streamed: the datanode saw
        # the WRITE_BLOCK and the namenode the create/addBlock calls
        assert "create" in nn.calls and "addBlock" in nn.calls
        assert nn.context_user == "svc"
        assert dn.ops and dn.ops[0][0] == "write_block"
    finally:
        nn.close()
        dn.close()
