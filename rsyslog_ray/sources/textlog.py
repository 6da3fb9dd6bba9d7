"""Text-log sources: line splitting + multiline record assembly.

imfile analogs (reference plugins/imfile/imfile.c): a log file is a
byte stream that must be framed into records — single lines, or
multiline records delimited by ``startmsg.regex`` / ``endmsg.regex`` /
indentation (readMode, imfile.c:399-400).  Batch re-expression:

- ``read_log_lines``: one Dataset row per line with (path, line_no,
  line) — the provenance columns rsyslog attaches as inputname /
  fromhost (runtime/msg.h:96-102).
- ``assemble_multiline``: group lines back into records: a new record
  starts where ``start_re`` matches (readMode=startmsg.regex
  semantics); continuation lines join with ``\\n``.  Implemented as
  groupby(path).map_groups — the partitioning assumption is the same
  one imfile makes: a FILE is the unit of sequential state, so one
  file's lines must land in one group, sorted by line_no.  Files are
  independent → files parallelize, lines within a file do not.
"""

from __future__ import annotations

import os
import re

import pandas as pd


def read_log_lines(paths):
    """Dataset of (path, line_no, line) from text files."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        out = {"path": [], "line_no": [], "line": []}
        for path, data in zip(df["path"], df["bytes"]):
            text = data.decode("utf-8", errors="replace")
            lines = text.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            out["path"].extend([path] * len(lines))
            out["line_no"].extend(range(len(lines)))
            out["line"].extend(lines)
        return pd.DataFrame(out)

    return ds.map_batches(split, batch_format="pandas")


def assemble_multiline(ds, start_pattern: str):
    """Collapse continuation lines into records (startmsg.regex mode).

    Lines before the first start-match form a leading record (the
    reference emits them too, after timeout). Output: (path, record_no,
    record, n_lines).
    """
    start_re = re.compile(start_pattern)

    def per_file(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("line_no")
        starts = g["line"].map(lambda s: bool(start_re.search(s)))
        rec_id = starts.cumsum()
        recs = (g.assign(__rec=rec_id)
                .groupby("__rec")
                .agg(record=("line", "\n".join), n_lines=("line", "size"))
                .reset_index(drop=True))
        recs.insert(0, "record_no", range(len(recs)))
        recs.insert(0, "path", g["path"].iloc[0])
        recs["n_lines"] = recs["n_lines"].astype("int64")
        return recs

    return ds.groupby("path").map_groups(per_file, batch_format="pandas")


def assemble_multiline_oracle(lines: list[str], start_pattern: str) -> list[str]:
    """Per-file reference implementation for tests."""
    start_re = re.compile(start_pattern)
    records: list[list[str]] = []
    for line in lines:
        if start_re.search(line) or not records:
            records.append([line])
        else:
            records[-1].append(line)
    return ["\n".join(r) for r in records]


# ---------------------------------------------------------------------
# Network-stream framing (imtcp/imptcp analogs)

def split_octet_counted_bytes(data: bytes):
    """RFC6587 octet-counted framing parser (imtcp/imptcp
    TCP_FRAMING_OCTET_COUNTING, reference runtime/tcps_sess.c:374-460
    processDataRcvd: digits, one space, exactly <len> message octets).
    Returns (byte frames, remainder) — the remainder is an incomplete
    trailing frame to prepend to the next read (the per-session
    inputState the reference keeps)."""
    frames = []
    pos = 0
    n = len(data)
    while pos < n:
        sp = data.find(b" ", pos)
        if sp < 0 or not data[pos:sp].isdigit() or sp == pos:
            break  # incomplete/invalid length header -> keep as remainder
        ln = int(data[pos:sp])
        end = sp + 1 + ln
        if end > n:
            break  # frame not fully received yet
        frames.append(data[sp + 1:end])
        pos = end
    return frames, data[pos:]


def split_octet_counted(data: bytes):
    """String-decoding wrapper over :func:`split_octet_counted_bytes`."""
    frames, rem = split_octet_counted_bytes(data)
    return [f.decode("utf-8", errors="replace") for f in frames], rem


def split_lf_framed_bytes(data: bytes):
    """LF framing (TCP_FRAMING_OCTET_STUFFING, the traditional mode):
    newline-delimited; the trailing partial line is the remainder."""
    parts = data.split(b"\n")
    rem = parts.pop()
    return parts, rem


def split_lf_framed(data: bytes):
    frames, rem = split_lf_framed_bytes(data)
    return [f.decode("utf-8", errors="replace") for f in frames], rem


class TcpCapture:
    """Bounded imtcp analog for a batch engine: ``.port`` is bound at
    construction (so senders can connect), ``capture(max_conns)``
    accepts sessions, frames each byte stream (keeping the
    per-connection remainder exactly like the reference's per-session
    input state, tcps_sess.c), and returns a Dataset of
    (record, peer, session) when the peers close.  A daemon would loop
    forever; a batch capture stops after ``max_conns`` sessions."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 framing: str = "octet-counted", ack: bool = False,
                 ssl_context=None, decompress: str = "none"):
        import socket

        self._srv = socket.socket()
        self._srv.bind((bind_host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self._split = (split_octet_counted_bytes
                       if framing == "octet-counted"
                       else split_lf_framed_bytes)
        # ack=True: RELP-style confirmed delivery (the receiver half of
        # TcpSyslogTransport(ack=True) / plugins/imrelp): a zero-length
        # end-of-batch frame is answered with "ACK\n" and not recorded
        self.ack = ack
        # ssl_context: server-side TLS (imtcp StreamDriver.Mode=1,
        # imtcp.c:404-419) — the accepted socket is wrapped before any
        # framing, mirroring the netstream-driver layering.
        self.ssl_context = ssl_context
        # decompress mirrors TcpSyslogTransport's compression modes:
        #   "single": a frame starting with b"z" is zlib-inflated
        #     (omfwd COMPRESS_SINGLE_MSG's z-marker wire format)
        #   "stream": the whole connection byte stream inflates
        #     through one zlib stream before framing
        assert decompress in ("none", "single", "stream")
        self.decompress = decompress

    def capture(self, max_conns: int):
        import zlib

        import ray.data

        rows = {"record": [], "peer": [], "session": []}
        try:
            for session in range(max_conns):
                conn, peer = self._srv.accept()
                if self.ssl_context is not None:
                    conn = self.ssl_context.wrap_socket(conn,
                                                        server_side=True)
                inflate = (zlib.decompressobj()
                           if self.decompress == "stream" else None)
                buf = b""
                while True:
                    chunk = conn.recv(65536)
                    if not chunk:
                        break
                    if inflate is not None:
                        chunk = inflate.decompress(chunk)
                    buf += chunk
                    frames, buf = self._split(buf)
                    for f in frames:
                        if self.ack and len(f) == 0:
                            conn.sendall(b"ACK\n")
                            continue
                        if self.decompress == "single" and f[:1] == b"z":
                            f = zlib.decompress(f[1:])
                        rows["record"].append(
                            f.decode("utf-8", errors="replace"))
                        rows["peer"].append(f"{peer[0]}:{peer[1]}")
                        rows["session"].append(session)
                conn.close()
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))


class UdpCapture:
    """Bounded imudp analog (plugins/imudp/imudp.c:137-179: UDP
    datagram receiver — one datagram per syslog message, no framing;
    the reference drains up to ``batchsize`` datagrams per wakeup via
    recvmmsg and records the sender address as fromhost-ip).  Python
    exposes no recvmmsg, so the batch drain is a recvfrom loop with
    the same semantics: ``capture(n)`` reads n datagrams, each row is
    (record, peer).  A daemon loops forever; the batch capture is
    bounded."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0):
        import socket

        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.bind((bind_host, port))
        self.port = self._sock.getsockname()[1]

    def capture(self, n_msgs: int):
        import ray.data

        rows = {"record": [], "peer": []}
        try:
            for _ in range(n_msgs):
                data, peer = self._sock.recvfrom(65536)
                rows["record"].append(data.decode("utf-8", errors="replace"))
                rows["peer"].append(peer[0])
        finally:
            self._sock.close()
        return ray.data.from_pandas(pd.DataFrame(rows))


class UnixSockCapture:
    """Bounded imuxsock analog (plugins/imuxsock/imuxsock.c: the
    /dev/log SOCK_DGRAM listener — one datagram per syslog message, no
    framing needed): bind an AF_UNIX datagram socket at construction,
    ``capture(n)`` reads n datagrams and returns them as Dataset rows.
    A daemon loops forever; the batch capture is bounded."""

    def __init__(self, path: str):
        import socket

        self.path = path
        if os.path.exists(path):
            os.unlink(path)
        self._sock = socket.socket(socket.AF_UNIX, socket.SOCK_DGRAM)
        self._sock.bind(path)

    def capture(self, n_msgs: int):
        import ray.data

        rows = []
        try:
            for _ in range(n_msgs):
                data = self._sock.recv(65536)
                rows.append(data.decode("utf-8", errors="replace"))
        finally:
            self._sock.close()
            if os.path.exists(self.path):
                os.unlink(self.path)
        return ray.data.from_pandas(pd.DataFrame({"record": rows}))


class FifoCapture:
    """imfifo analog: read LF-framed records from a named pipe until
    EOF or ``max_records`` (the reference's fifo input is the same
    line framing as imfile over a FIFO fd).  The FIFO is created if
    missing; open blocks until a writer connects, like the reference's
    open loop."""

    def __init__(self, path: str, create: bool = True):
        self.path = path
        if create and not os.path.exists(path):
            os.mkfifo(path)

    def capture(self, max_records: int = 1_000_000):
        import ray.data

        rows = []
        with open(self.path, "r", errors="replace") as fh:
            for line in fh:
                rows.append(line.rstrip("\n"))
                if len(rows) >= max_records:
                    break
        return ray.data.from_pandas(pd.DataFrame({"record": rows}))


class DtlsCapture:
    """Bounded imdtls analog (plugins/imdtls/imdtls.c: a DTLS UDP
    listener, one syslog message per decrypted datagram — the
    reference runs OpenSSL sessions per client; the DTLS 1.2 stack
    here is in-repo, state/dtlswire.py).  Construction binds the UDP
    socket; ``capture(n)`` accepts ONE session (cookie exchange +
    handshake) and reads n sealed datagrams into Dataset rows
    (record, peer).  A daemon loops sessions forever; the batch
    capture is bounded."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 timeout: float = 10.0):
        from ..state.dtlswire import DtlsServer

        self._srv = DtlsServer(bind_host, port, timeout=timeout)
        self.port = self._srv.port

    def capture(self, n_msgs: int):
        import ray.data

        rows = {"record": [], "peer": []}
        try:
            self._srv.accept()
            peer = self._srv._state[2]
            for _ in range(n_msgs):
                data = self._srv.recv()
                rows["record"].append(
                    data.decode("utf-8", errors="replace"))
                rows["peer"].append(peer[0])
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))
