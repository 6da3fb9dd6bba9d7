"""im3195 analog — RFC 3195 syslog listener over real BEEP wire.

Reference: plugins/im3195/im3195.c — a shim over liblogging
(srAPISetupListener im3195.c:228, OnReceive im3195.c:131-163, default
listen port 601 im3195.c:70).  The wire itself is public and
re-implemented in ``state/beepwire.py``: BEEP framing (RFC 3080), TCP
SEQ flow control (RFC 3081) and the syslog RAW profile (RFC 3195 §3).

Session shape (RFC 3195 §3.3): both peers exchange greetings on
channel 0; the relay starts a channel with the RAW profile; the
LISTENER then sends a MSG (a free-form banner) on that channel and the
relay delivers every syslog message as an ANS reply to that one MSG in
a one-to-many exchange, ending with NUL.  Fragmented frames
(``more='*'``) are reassembled per (channel, msgno, ansno).

Like every capture source in this package the listener is bounded:
``capture(max_conns)`` serves that many BEEP sessions and returns the
records as a Dataset.  ``maxline`` applies im3195.c:101-116's
truncate-over-maxMessageSize rule (rsyslog's default 8096).
"""

from __future__ import annotations

import pandas as pd

from ..state import beepwire as bw


class Beep3195Capture:
    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 maxline: int = 8096, window: int = bw.DEFAULT_WINDOW):
        import socket

        self._srv = socket.socket()
        self._srv.bind((bind_host, port))
        self._srv.listen(16)
        self.port = self._srv.getsockname()[1]
        self.maxline = maxline
        self.window = window
        self.sessions_seen = 0
        self.truncated = 0

    def capture(self, max_conns: int = 1, max_records: int = 1_000_000):
        import ray.data

        rows = {"record": [], "peer": [], "session": []}
        try:
            for session in range(max_conns):
                conn, peer = self._srv.accept()
                try:
                    self._serve(conn, peer[0], session, rows, max_records)
                finally:
                    conn.close()
                self.sessions_seen += 1
                if len(rows["record"]) >= max_records:
                    break
        finally:
            self._srv.close()
        return ray.data.from_pandas(pd.DataFrame(rows))

    # -- one BEEP session ---------------------------------------------
    def _serve(self, conn, peer: str, session: int, rows: dict,
               max_records: int) -> None:
        reader = bw.FrameReader(conn)
        out_seq = {0: 0}          # our next outbound seqno per channel
        exp_seq = {0: 0}          # next inbound seqno we expect
        partial: dict[tuple, bytes] = {}
        raw_channel = None

        # listener greeting: a positive RPY on channel 0 advertising the
        # RAW profile (RFC 3080 §2.3.1.1)
        self._rpy(conn, out_seq, 0, 0,
                  bw.greeting_xml((bw.RAW_PROFILE_URI,)))

        while True:
            try:
                fr = reader.read_frame()
            except ConnectionError:
                return
            if fr[0] == "SEQ":
                continue            # we send little; ignore peer window
            kw, channel, msgno, more, seqno, payload, ansno = fr
            if seqno != exp_seq.get(channel, 0):
                raise bw.BeepProtocolError(
                    f"seqno {seqno} != expected {exp_seq.get(channel, 0)} "
                    f"on channel {channel}")
            exp_seq[channel] = seqno + len(payload)
            # extend the window as we consume (RFC 3081 §3.1.4)
            conn.sendall(bw.seq_frame(channel, exp_seq[channel],
                                      self.window))
            key = (channel, msgno, ansno)
            if more:
                partial[key] = partial.get(key, b"") + payload
                continue
            payload = partial.pop(key, b"") + payload

            if channel == 0:
                if kw == "RPY":
                    continue        # the relay's greeting
                if kw != "MSG":
                    continue
                started = bw.parse_start(payload)
                if started and bw.RAW_PROFILE_URI in started[1]:
                    raw_channel, _ = started
                    self._rpy(conn, out_seq, 0, msgno,
                              bw.profile_xml(bw.RAW_PROFILE_URI))
                    # advertise this listener's receive window for the
                    # new channel up front (RFC 3081 §3.1.4 — SEQ may
                    # be sent at any time; without this the relay
                    # rightly assumes the 4096 default)
                    conn.sendall(bw.seq_frame(raw_channel, 0,
                                              self.window))
                    # open the one-to-many exchange (RFC 3195 §3.3):
                    # the listener's MSG the relay will ANS against
                    self._send(conn, out_seq, "MSG", raw_channel, 0,
                               bw.mime_wrap(b"clear to send syslog"))
                elif bw.is_close(payload):
                    self._rpy(conn, out_seq, 0, msgno, bw.ok_xml())
                    return
                else:
                    self._send(conn, out_seq, "ERR", 0, msgno,
                               bw.error_xml(550, "no supported profile"))
            elif channel == raw_channel:
                if kw == "ANS":
                    rec = bw.mime_strip(payload)
                    if len(rec) > self.maxline:    # im3195.c:109-113
                        rec = rec[:self.maxline]
                        self.truncated += 1
                    rows["record"].append(rec.decode("utf-8", "replace"))
                    rows["peer"].append(peer)
                    rows["session"].append(session)
                    if len(rows["record"]) >= max_records:
                        return
                # NUL ends the exchange; wait for channel-0 close/EOF

    # -- outbound helpers (seqno bookkeeping) -------------------------
    def _send(self, conn, out_seq: dict, kw: str, channel: int,
              msgno: int, payload: bytes) -> None:
        conn.sendall(bw.data_frame(kw, channel, msgno,
                                   out_seq.setdefault(channel, 0), payload))
        out_seq[channel] += len(payload)

    def _rpy(self, conn, out_seq: dict, channel: int, msgno: int,
             payload: bytes) -> None:
        self._send(conn, out_seq, "RPY", channel, msgno, payload)
