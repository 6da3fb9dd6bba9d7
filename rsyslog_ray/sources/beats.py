"""imbeats analog — Elastic Beats / Lumberjack v2 listener.

Reference: plugins/imbeats (imbeats.c + lj_parser.h:9-13).  The wire
is the published Lumberjack v2 protocol Beats' ``output.logstash``
speaks:

    window frame      '2' 'W' u32BE window_size
    json frame        '2' 'J' u32BE seq  u32BE len  <len JSON bytes>
    compressed frame  '2' 'C' u32BE len  <len zlib bytes of frames>
    ack frame         '2' 'A' u32BE seq          (listener → agent)

A window announces how many events follow; once they all arrived the
listener answers ONE cumulative ACK carrying the batch's last
sequence number (imbeats.c:818-825), which is what lets the agent
retire its in-flight queue.  Compressed frames inflate to a run of
inner J frames (lj_parser.c lj_parse_compressed_frames), bounded by
``max_frame_size`` / ``max_expansion_ratio`` before any allocation —
the reference's anti-zip-bomb guards.  ``msg`` keeps the original
JSON payload verbatim, like the reference's event shape."""

from __future__ import annotations

import json
import struct
import zlib

import pandas as pd


class BeatsCapture:
    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 max_frame_size: int = 10 * 1024 * 1024,
                 max_window_size: int = 100_000,
                 max_expansion_ratio: int = 100):
        import socket

        self._srv = socket.socket()
        self._srv.bind((bind_host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self.max_frame_size = max_frame_size
        self.max_window_size = max_window_size
        self.max_expansion_ratio = max_expansion_ratio
        self.acks_sent: list[int] = []

    @staticmethod
    def _exact(sock, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            got = sock.recv(n - len(buf))
            if not got:
                raise ConnectionError("beats peer closed")
            buf += got
        return bytes(buf)

    def _parse_inner(self, blob: bytes) -> list[tuple[int, bytes]]:
        """Inner J frames of an inflated C payload."""
        out, pos = [], 0
        while pos < len(blob):
            if blob[pos:pos + 1] != b"2" or blob[pos + 1:pos + 2] != b"J":
                raise ConnectionError("beats: bad inner frame")
            seq, ln = struct.unpack(">II", blob[pos + 2:pos + 10])
            if ln > self.max_frame_size:
                raise ConnectionError("beats: inner frame too large")
            out.append((seq, blob[pos + 10:pos + 10 + ln]))
            pos += 10 + ln
        return out

    def capture(self, n_msgs: int, max_conns: int = 1):
        import ray.data

        rows = {"msg": [], "seq": [], "session": []}
        try:
            for session in range(max_conns):
                conn, _ = self._srv.accept()
                try:
                    self._serve(conn, session, rows, n_msgs)
                finally:
                    conn.close()
                if len(rows["msg"]) >= n_msgs:
                    break
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))

    def _serve(self, conn, session: int, rows: dict, n_msgs: int):
        window = 0
        got_in_window = 0
        last_seq = 0

        def take(seq: int, payload: bytes):
            nonlocal got_in_window, last_seq
            rows["msg"].append(payload.decode("utf-8", "replace"))
            rows["seq"].append(seq)
            rows["session"].append(session)
            got_in_window += 1
            last_seq = seq

        while len(rows["msg"]) < n_msgs:
            try:
                hdr = self._exact(conn, 2)
            except ConnectionError:
                return
            if hdr[0:1] != b"2":
                raise ConnectionError(
                    f"beats: only lumberjack v2 spoken, got {hdr!r}")
            kind = hdr[1:2]
            if kind == b"W":
                window = struct.unpack(">I", self._exact(conn, 4))[0]
                if window > self.max_window_size:
                    raise ConnectionError("beats: window too large")
                got_in_window = 0
            elif kind == b"J":
                seq, ln = struct.unpack(">II", self._exact(conn, 8))
                if ln > self.max_frame_size:
                    raise ConnectionError("beats: frame too large")
                take(seq, self._exact(conn, ln))
            elif kind == b"C":
                ln = struct.unpack(">I", self._exact(conn, 4))[0]
                if ln > self.max_frame_size:
                    raise ConnectionError("beats: frame too large")
                blob = zlib.decompress(
                    self._exact(conn, ln),
                    bufsize=min(ln * self.max_expansion_ratio,
                                self.max_frame_size))
                if len(blob) > ln * self.max_expansion_ratio:
                    raise ConnectionError("beats: expansion bomb")
                for seq, payload in self._parse_inner(blob):
                    take(seq, payload)
            else:
                raise ConnectionError(f"beats: unknown frame {kind!r}")
            if window and got_in_window >= window:
                # cumulative ACK with the batch's last seq (c:818-825)
                conn.sendall(b"2A" + struct.pack(">I", last_seq))
                self.acks_sent.append(last_seq)
                window = got_in_window = 0


def decode_beats_events(ds):
    """Post-capture decode: the JSON payload parsed into a sorted
    compact ``json`` column alongside the verbatim ``msg`` (the
    reference keeps msg raw and maps fields into $!)."""
    def dec(df: pd.DataFrame) -> pd.DataFrame:
        parsed = []
        for m in df["msg"]:
            try:
                parsed.append(json.dumps(json.loads(m), sort_keys=True,
                                         separators=(",", ":")))
            except (ValueError, TypeError):
                parsed.append(None)
        out = df.copy()
        out["json"] = parsed
        return out

    return ds.map_batches(dec, batch_format="pandas")
