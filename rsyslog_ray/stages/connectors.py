"""Connector sinks — the network-delivery shapes, transport-injected.

The reference's network sinks share one protocol: batch rows
(bulkmode/maxbytes), deliver with begin/commit transactions, retry with
escalating suspend on transport failure, and quarantine per-item
rejects to an error file instead of losing or re-looping them
(reference plugins/omelasticsearch/omelasticsearch.c:227-253 bulkmode +
retryfailures + errorfile; plugins/omkafka/omkafka.c:228-278
failedMsgFile; runtime/action.c:863-1015 suspend/resume).

No network exists in this environment, so the TRANSPORT is an injected
callable and the default strict transport raises NotImplementedError at
the exact call site a real client (requests/kafka producer) would
occupy.  Everything around it — batching, flush thresholds, bounded
retry with backoff, per-item dead-lettering, delivery accounting — is
real and tested.

Use as an actor-pool stage:
    ds.map_batches(ConnectorSink, fn_constructor_kwargs=dict(
        transport=my_send_fn, batch_rows=500, error_file=...),
        batch_format="pandas", concurrency=(1, N), batch_size=2048)
"""

from __future__ import annotations

import json
import os
import time

import pandas as pd


def strict_transport(payloads: list[dict]) -> list[tuple[int, str]]:
    """Placeholder for the real client; a deployment replaces this with
    e.g. an HTTP bulk POST or a Kafka produce loop."""
    raise NotImplementedError(
        "no network transport in this environment; inject one "
        "(transport=callable(list[dict]) -> list[(index, error)])")


class TcpSyslogTransport:
    """omfwd TCP transport (tools/omfwd.c) — a REAL socket client:
    renders each payload row to a syslog line and sends it
    octet-counted (RFC6587 ``<len> <msg>``, omfwd's
    TCP_FRAMING_OCTET_COUNTING) or LF-framed.  Connects lazily ONCE
    per actor; any socket error closes the connection and re-raises so
    ConnectorSink's bounded retry reconnects and resends the bulk —
    omfwd's resume-after-suspend behavior (at-least-once on the bulk,
    like the reference's unacked-resend on reconnect)."""

    def __init__(self, host: str, port: int, render=None,
                 framing: str = "octet-counted", ack: bool = False,
                 ssl_context=None, server_hostname: str | None = None,
                 compression: str = "none", compression_level: int = 6,
                 compress_min_size: int = 60, flush_on_tx_end: bool = True):
        self.addr = (host, port)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        assert framing in ("octet-counted", "lf")
        self.framing = framing
        # ack=True: RELP-style confirmed delivery (plugins/omrelp) —
        # plain TCP silently loses data buffered into a dead socket
        # (the documented omfwd limitation); with ack the bulk ends
        # with a zero-length frame and the peer must answer "ACK\n",
        # so an unconfirmed bulk raises and the retry resends it
        # (at-least-once; exactly-once needs downstream dedup).
        self.ack = ack
        # TLS = imtcp/omfwd stream-driver mode 1 (imtcp.c:404-419,
        # nsd_gtls/nsd_ossl): pass an ssl.SSLContext; the socket is
        # wrapped at connect, everything above the wrap (framing,
        # compression, ack) is unchanged — exactly the reference's
        # layering, where the netstream driver sits below framing.
        self.ssl_context = ssl_context
        self.server_hostname = server_hostname or host
        # compression modes (omfwd.c:152-156 + 1781-1800):
        #   "single" = COMPRESS_SINGLE_MSG — each rendered message
        #     bigger than compress_min_size becomes b"z"+zlib(msg),
        #     kept only when it actually shrinks; framing wraps the
        #     compressed bytes.
        #   "stream" = COMPRESS_STREAM_ALWAYS — one deflate stream per
        #     connection; each bulk (transaction) ends with a
        #     Z_SYNC_FLUSH when flush_on_tx_end (strmCompFlushOnTxEnd),
        #     Z_FINISH at close.
        assert compression in ("none", "single", "stream")
        # single-msg compressed bytes may contain 0x0A — only length-
        # prefixed framing can carry them (stream mode compresses the
        # frames themselves, so any framing works there)
        assert not (compression == "single" and framing == "lf"), \
            "single-message compression requires octet-counted framing"
        self.compression = compression
        self.compression_level = compression_level
        self.compress_min_size = compress_min_size
        self.flush_on_tx_end = flush_on_tx_end
        self._sock = None
        self._zstrm = None

    def _connected(self):
        import socket

        if self._sock is None:
            s = socket.create_connection(self.addr, timeout=10)
            if self.ssl_context is not None:
                s = self.ssl_context.wrap_socket(
                    s, server_hostname=self.server_hostname)
            self._sock = s
            if self.compression == "stream":
                # new connection = new deflate stream (the reference
                # inits the zstrm per target connection)
                import zlib
                self._zstrm = zlib.compressobj(self.compression_level)
        return self._sock

    def _frame(self, data: bytes) -> bytes:
        if self.framing == "octet-counted":
            return b"%d %s" % (len(data), data)
        return data.replace(b"\n", b"\\n") + b"\n"

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        import zlib

        chunks = []
        for rec in payloads:
            data = self.render(rec).encode()
            if (self.compression == "single"
                    and len(data) > self.compress_min_size):
                comp = zlib.compress(data, self.compression_level)
                if len(comp) + 1 < len(data):   # only when it gains
                    data = b"z" + comp
            chunks.append(self._frame(data))
        if self.ack:
            chunks.append(b"0 ")               # end-of-batch frame
        try:
            s = self._connected()
            wire = b"".join(chunks)
            if self.compression == "stream":
                wire = self._zstrm.compress(wire)
                if self.flush_on_tx_end or self.ack:
                    # tx-end sync flush; ack REQUIRES it (the peer
                    # can't answer a frame still in the deflate buffer)
                    wire += self._zstrm.flush(zlib.Z_SYNC_FLUSH)
            s.sendall(wire)
            if self.ack:
                buf = b""
                while not buf.endswith(b"\n"):
                    got = s.recv(16)
                    if not got:
                        raise ConnectionError("peer closed before ack")
                    buf += got
                if buf != b"ACK\n":
                    raise ConnectionError(f"bad ack {buf!r}")
        except OSError:
            try:
                self._sock.close()
            finally:
                self._sock = None
                self._zstrm = None
            raise
        return []  # stream transport: no per-item rejects

    def close(self):
        if self._sock is not None:
            if self._zstrm is not None:
                import zlib
                try:  # finish the deflate stream (omfwd doZipFinish)
                    self._sock.sendall(self._zstrm.flush(zlib.Z_FINISH))
                except OSError:
                    pass
                self._zstrm = None
            self._sock.close()
            self._sock = None


class ProgTransport:
    """omprog (plugins/omprog/omprog.c) — pipe rendered lines into a
    REAL child program spawned once per actor.

    ``confirm=True`` = the confirmMessages protocol (omprog.c:250-288,
    :417): the child prints one status line at startup and exactly
    ``OK`` after each message; any other per-message answer is a
    per-item REJECT (errorfile quarantine, not retried), matching the
    reference's treatment of negative confirmations.  A dead pipe
    kills the child and re-raises so ConnectorSink's bounded retry
    respawns and resends the bulk."""

    def __init__(self, argv: list, render=None, confirm: bool = False):
        self.argv = list(argv)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.confirm = confirm
        self._proc = None

    def _spawned(self):
        import subprocess

        if self._proc is None or self._proc.poll() is not None:
            self._proc = subprocess.Popen(
                self.argv, stdin=subprocess.PIPE,
                stdout=subprocess.PIPE if self.confirm else None,
                text=True)
            if self.confirm:
                # startup confirmation line (omprog.c startup status)
                status = self._proc.stdout.readline().strip()
                if status != "OK":
                    raise ConnectionError(
                        f"program startup failed: {status!r}")
        return self._proc

    def _kill(self):
        if self._proc is not None:
            try:
                self._proc.kill()
            except OSError:
                pass
            self._proc = None

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        rejects: list[tuple[int, str]] = []
        try:
            p = self._spawned()
            for i, rec in enumerate(payloads):
                p.stdin.write(self.render(rec).replace("\n", "\\n") + "\n")
                p.stdin.flush()
                if self.confirm:
                    resp = p.stdout.readline().strip()
                    if not resp:
                        raise ConnectionError("child closed mid-bulk")
                    if resp != "OK":
                        rejects.append((i, resp))
        except (BrokenPipeError, OSError, ConnectionError):
            self._kill()
            raise
        return rejects

    def close(self):
        if self._proc is not None:
            try:
                self._proc.stdin.close()
                self._proc.wait(timeout=5)
            except Exception:
                self._kill()
            self._proc = None


class UnixSockTransport:
    """omuxsock (plugins/omuxsock/omuxsock.c): sends each rendered
    line to an AF_UNIX socket — the producer mirror of the imuxsock
    listener (``sources/textlog.UnixSockCapture``), i.e. the /dev/log
    writer side.

    The reference's full surface (omuxsock.c:123-161 socketType map,
    :498-520 openSocket): ``socktype`` DGRAM (default) / STREAM /
    SEQPACKET — the latter two are connection oriented and connect()
    at open; ``abstract`` prepends the leading NUL of the Linux
    abstract namespace (omuxsock.c:512-524's bAbstract offset).
    Failure semantics mirror sendMsg (omuxsock.c:427-476): connected
    sockets close and re-raise so ConnectorSink's bounded retry /
    suspend takes over; unconnected datagrams with ``lossy_dgram``
    close the socket and report the row as a per-item reject ("simply
    try again on the next message" — the reference drops it), else
    the default re-raise keeps at-least-once on the bulk."""

    _TYPES = {"dgram": "SOCK_DGRAM", "stream": "SOCK_STREAM",
              "seqpacket": "SOCK_SEQPACKET"}

    def __init__(self, path: str, render=None, socktype: str = "dgram",
                 abstract: bool = False, lossy_dgram: bool = False):
        if socktype not in self._TYPES:
            raise ValueError(f"unknown socket type {socktype!r}")
        self.path = path
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.socktype = socktype
        self.connected = socktype != "dgram"   # omuxsock.c:128-133
        self.abstract = abstract
        self.lossy_dgram = lossy_dgram and not self.connected
        self._sock = None

    @property
    def _addr(self):
        return ("\0" + self.path) if self.abstract else self.path

    def _opened(self):
        import socket

        if self._sock is None:
            s = socket.socket(socket.AF_UNIX,
                              getattr(socket, self._TYPES[self.socktype]))
            if self.connected:
                try:
                    s.connect(self._addr)
                except OSError:
                    s.close()
                    raise
            self._sock = s
        return self._sock

    def _drop_sock(self):
        try:
            if self._sock is not None:
                self._sock.close()
        finally:
            self._sock = None

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        rejects: list[tuple[int, str]] = []
        for i, rec in enumerate(payloads):
            data = self.render(rec).encode()
            try:
                s = self._opened()
                if self.connected:
                    s.sendall(data)
                else:
                    s.sendto(data, self._addr)
            except OSError as ex:
                self._drop_sock()
                if self.lossy_dgram:
                    rejects.append((i, f"uxsock dgram: {ex}"))
                    continue
                raise
        return rejects

    def close(self):
        self._drop_sock()


class EsBulkTransport:
    """omelasticsearch bulk transport — the REAL wire protocol over
    HTTP (plugins/omelasticsearch/omelasticsearch.c bulkmode:227-253):
    POST /_bulk with ndjson action+source pairs, parse the per-item
    statuses from the response and return rejects (status >= 300) for
    errorfile quarantine — the retryfailures/errorfile semantics on the
    actual payload format.  Uses stdlib http.client; the connection is
    opened lazily once per actor and re-opened on error (suspend/
    resume through ConnectorSink's bounded retry)."""

    def __init__(self, host: str, port: int, index: str = "raylog",
                 id_field: str | None = None):
        self.host = host
        self.port = port
        self.index = index
        self.id_field = id_field
        self._conn = None

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def payload_lines(self, payloads: list[dict]) -> bytes:
        lines = []
        for rec in payloads:
            action: dict = {"index": {"_index": self.index}}
            if self.id_field is not None and self.id_field in rec:
                action["index"]["_id"] = str(rec[self.id_field])
            lines.append(json.dumps(action))
            lines.append(json.dumps(rec, default=str))
        return ("\n".join(lines) + "\n").encode()

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body = self.payload_lines(payloads)
        try:
            c = self._connected()
            c.request("POST", "/_bulk", body=body,
                      headers={"Content-Type": "application/x-ndjson"})
            resp = c.getresponse()
            data = resp.read()
            if resp.status >= 300:
                raise ConnectionError(f"bulk HTTP {resp.status}")
        except OSError:
            try:
                if self._conn is not None:
                    self._conn.close()
            finally:
                self._conn = None
            raise
        doc = json.loads(data)
        rejects = []
        if doc.get("errors"):
            for i, item in enumerate(doc.get("items", [])):
                st = item.get("index", {})
                if int(st.get("status", 200)) >= 300:
                    rejects.append((i, json.dumps(st.get("error", {}))))
        return rejects


class HttpBatchTransport:
    """omhttp (contrib/omhttp/omhttp.c) — generic HTTP batch sink over
    a REAL connection, with all four reference batch serializations
    (omhttp.c:126 VALID_BATCH_FORMATS, serializeBatch*:1775-):

    - ``newline``   rendered messages joined by \\n
    - ``jsonarray`` JSON array of the rendered messages
    - ``kafkarest`` {"records":[{"value": msg}, ...]} (Kafka REST)
    - ``lokirest``  {"streams":[{"stream": labels, "values":
                    [[ns_ts, msg], ...]}]} (Loki push)

    ``render`` turns a row dict into the message (string for newline,
    any JSON value otherwise).  Delivery is all-or-nothing per batch
    like the reference (non-2xx raises -> ConnectorSink bounded retry
    -> suspend; omhttp's retryfailures requeues whole batches too)."""

    def __init__(self, host: str, port: int, restpath: str = "/",
                 batch_format: str = "newline", render=None,
                 loki_labels: dict | None = None, ts_field: str | None = None):
        assert batch_format in ("newline", "jsonarray", "kafkarest",
                                "lokirest")
        self.host = host
        self.port = port
        self.restpath = restpath
        self.batch_format = batch_format
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.loki_labels = loki_labels or {"job": "raylog"}
        self.ts_field = ts_field
        self._conn = None

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def serialize(self, payloads: list[dict]) -> tuple[bytes, str]:
        msgs = [self.render(rec) for rec in payloads]
        if self.batch_format == "newline":
            return ("\n".join(str(m) for m in msgs).encode(),
                    "text/plain")
        if self.batch_format == "jsonarray":
            return json.dumps(msgs).encode(), "application/json"
        if self.batch_format == "kafkarest":
            return (json.dumps({"records": [{"value": m} for m in msgs]})
                    .encode(), "application/vnd.kafka.json.v2+json")
        values = []
        for rec, m in zip(payloads, msgs):
            ts = rec.get(self.ts_field) if self.ts_field else None
            ns = (str(int(ts.value)) if hasattr(ts, "value")
                  else str(int(ts) * 10**9) if ts is not None else "0")
            values.append([ns, str(m)])
        return (json.dumps({"streams": [{"stream": self.loki_labels,
                                         "values": values}]}).encode(),
                "application/json")

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body, ctype = self.serialize(payloads)
        try:
            c = self._connected()
            c.request("POST", self.restpath, body=body,
                      headers={"Content-Type": ctype})
            resp = c.getresponse()
            resp.read()
            if resp.status >= 300:
                raise ConnectionError(f"omhttp HTTP {resp.status}")
        except OSError:
            try:
                if self._conn is not None:
                    self._conn.close()
            finally:
                self._conn = None
            raise
        return []

    def close(self):
        if self._conn is not None:
            self._conn.close()
            self._conn = None


class TransportSuspended(RuntimeError):
    """Raised when delivery keeps failing past the retry budget — the
    action-DISABLED state (runtime/action.c:663-741)."""


class ConnectorSink:
    """Batching, transactional, retrying delivery stage.

    ``transport(payloads)`` delivers a bulk of row-dicts and returns a
    list of (index, error_message) for per-item REJECTS (empty list =
    all delivered). Raising from transport = transient transport
    failure -> bounded retry with escalating backoff, then
    TransportSuspended.

    Per-item rejects append to ``error_file`` as JSONL (errorfile
    analog) and are not retried. The stage's output batch is the
    delivery accounting (rows_delivered / rows_rejected per call).

    NOTE: the errorfile is a shared append target — with a
    ``concurrency`` pool, O_APPEND keeps lines intact on Linux but
    inter-actor ordering is arbitrary; use per-actor paths if order
    matters.
    """

    def __init__(self, transport=None, batch_rows: int = 500,
                 error_file: str | None = None, max_retries: int = 3,
                 backoff_base_s: float = 0.1):
        self.transport = transport or strict_transport
        self.batch_rows = batch_rows
        self.error_file = error_file
        self.max_retries = max_retries
        self.backoff_base_s = backoff_base_s

    # -- the begin/do/commit cycle for one bulk -----------------------
    def _deliver_bulk(self, payloads: list[dict]) -> tuple[int, int]:
        last = None
        for attempt in range(self.max_retries):
            try:
                rejects = self.transport(payloads)
                break
            except NotImplementedError:
                raise
            except Exception as ex:  # transient transport failure
                last = ex
                time.sleep(self.backoff_base_s * (4 ** attempt))
        else:
            raise TransportSuspended(
                f"transport failed {self.max_retries} times: {last}")
        if rejects and self.error_file:
            with open(self.error_file, "a") as fh:
                for idx, err in rejects:
                    fh.write(json.dumps({"error": err,
                                         "payload": payloads[idx]}) + "\n")
        return len(payloads) - len(rejects), len(rejects)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        payloads = batch.to_dict("records")
        delivered = rejected = 0
        for lo in range(0, len(payloads), self.batch_rows):
            d, r = self._deliver_bulk(payloads[lo:lo + self.batch_rows])
            delivered += d
            rejected += r
        return pd.DataFrame({"rows_delivered": [delivered],
                             "rows_rejected": [rejected]})


def reinject_errorfile(error_file: str, transport, *, batch_rows: int = 500,
                       max_retries: int = 3, backoff_base_s: float = 0.1,
                       concurrency=(1, 4), batch_size: int = 2048) -> dict:
    """omelasticsearch ``retryfailures`` (omelasticsearch.c:227-253):
    parse the errorfile's quarantined per-item rejects back into a
    Dataset and re-run them through a fresh delivery pass — the
    reference re-injects parsed bulk failures into the pipeline as new
    messages instead of leaving them dead in the errorfile.

    The errorfile is ROTATED first (rename to ``.retrying``) so this
    round's own rejects quarantine into a fresh errorfile — items that
    fail again are re-quarantined, never re-looped within one call
    (each invocation is one retry round; the caller decides how many
    rounds).  Rows-only driver work is O(errorfile), which is bounded
    by quarantined-reject volume, not corpus size.

    Returns {"reinjected": n, "rows_delivered": d, "rows_rejected": r}.
    """
    import ray.data

    if not os.path.exists(error_file):
        return {"reinjected": 0, "rows_delivered": 0, "rows_rejected": 0}
    rot = error_file + ".retrying"
    os.replace(error_file, rot)
    payloads = []
    with open(rot) as fh:
        for line in fh:
            line = line.strip()
            if line:
                payloads.append(json.loads(line)["payload"])
    if not payloads:
        return {"reinjected": 0, "rows_delivered": 0, "rows_rejected": 0}
    acct = (ray.data.from_pandas(pd.DataFrame(payloads))
            .map_batches(ConnectorSink,
                         fn_constructor_kwargs=dict(
                             transport=transport, batch_rows=batch_rows,
                             error_file=error_file,
                             max_retries=max_retries,
                             backoff_base_s=backoff_base_s),
                         batch_format="pandas", concurrency=concurrency,
                         batch_size=batch_size)
            .to_pandas())
    return {"reinjected": len(payloads),
            "rows_delivered": int(acct["rows_delivered"].sum()),
            "rows_rejected": int(acct["rows_rejected"].sum())}


RAND_MAX = 0x7FFFFFFF  # glibc RAND_MAX, the randfail probability base


class OmtestingTransport:
    """omtesting (plugins/omtesting/omtesting.c) — the reference's
    action-engine test aid: an injectable failure state machine that
    drills suspend/resume exactly the way the testbench does.

    The action line (``:omtesting:<mode> [params]``,
    parseSelectorAct c:253-330) selects the mode:

    - ``sleep <sec> <usec>`` — every message sleeps then succeeds
      (doSleep c:158-168); unknown modes fall back to the
      createInstance defaults = ``sleep 1 0`` (c:98-100,318-320).
    - ``fail <fail-frequency> <resume-after>`` — every
      fail-frequency'th doAction call SUSPENDS (doFail c:139-155,
      counter starts at 1: c:314), and tryResume succeeds only on the
      resume-after'th retry (doFailOnResume c:124-136); the action
      engine then REDOES the message, which increments the call
      counter again.
    - ``randfail`` — ~50/50 suspend per call
      (doRandFail c:171-182: ``(rand() >> 4) < (RAND_MAX >> 5)``).
    - ``always_suspend`` — doAction and tryResume both suspend
      forever (c:188-199,225-227).

    ``deliver(msgs)`` runs the reference's doAction → suspend →
    tryResume → redo cycle per message (runtime/action.c's retry
    loop), appending each message that completed OK to ``echoed``
    (bEchoStdout c:232-235 — echo happens only on the successful
    call).  ``history`` records every state-machine step for
    assertions.  As a ConnectorSink transport, a message whose resume
    budget is exhausted raises, handing escalation to the sink's
    bounded retry → TransportSuspended — the reference's
    action-suspension ladder.
    """

    def __init__(self, action_line: str = ":omtesting:sleep 0 0",
                 echo_stdout: bool = False, render=None, rng=None,
                 sleep_fn=None, max_resume_attempts: int = 100):
        p = action_line
        if p.startswith(":omtesting:"):
            p = p[len(":omtesting:"):]
        words = p.split()
        mode, args = (words[0] if words else ""), words[1:]

        def _n(i, default=0):
            try:
                return int(args[i])
            except (IndexError, ValueError):
                return default
        self.wait_s, self.wait_us = 1, 0     # createInstance defaults
        self.fail_frequency = self.resume_after = 0
        if mode == "sleep":
            self.wait_s, self.wait_us = _n(0), _n(1)
        elif mode == "fail":
            self.fail_frequency = max(_n(0, 1), 1)
            self.resume_after = _n(1)
        elif mode not in ("randfail", "always_suspend"):
            mode = "sleep"                   # invalid mode -> sleep 1 0
        self.mode = mode
        self.curr_call_nbr = 1               # c:314 iCurrCallNbr = 1
        self.curr_retries = 0
        self.failed = False
        self.echo_stdout = echo_stdout
        self.render = render or (lambda rec: rec.get("msg", str(rec))
                                 if isinstance(rec, dict) else str(rec))
        import random as _random
        self.rng = rng or (lambda: _random.getrandbits(31))
        self.sleep_fn = sleep_fn or time.sleep
        self.max_resume_attempts = max_resume_attempts
        self.echoed: list[str] = []
        self.history: list[tuple[str, str]] = []

    # -- the reference's per-call verbs --------------------------------
    def _do_action(self) -> bool:
        """One doAction call; True = OK, False = SUSPENDED."""
        if self.mode == "sleep":
            self.sleep_fn(self.wait_s + self.wait_us / 1e6)
            return True
        if self.mode == "fail":
            if self.failed:
                return False
            ok = self.curr_call_nbr % self.fail_frequency != 0
            self.curr_call_nbr += 1
            if not ok:
                self.curr_retries = 0
                self.failed = True
            return ok
        if self.mode == "randfail":
            return (self.rng() >> 4) < (RAND_MAX >> 5)
        return False                          # always_suspend

    def _try_resume(self) -> bool:
        """One tryResume call; True = resumed."""
        if self.mode == "fail":
            self.curr_retries += 1            # doFailOnResume c:128
            if self.curr_retries == self.resume_after:
                self.failed = False
                return True
            return False
        if self.mode == "randfail":
            return (self.rng() >> 4) < (RAND_MAX >> 5)
        return self.mode == "sleep"           # sleep: OK, a_s: never

    # -- the action engine's retry loop ---------------------------------
    def deliver(self, msgs: list[str]) -> None:
        for msg in msgs:
            attempts = 0
            while not self._do_action():
                self.history.append(("suspend", msg))
                while not self._try_resume():
                    self.history.append(("resume-fail", msg))
                    attempts += 1
                    if attempts >= self.max_resume_attempts:
                        raise TransportSuspended(
                            f"omtesting: resume budget exhausted on {msg!r}")
                self.history.append(("resumed", msg))
                attempts += 1
                if attempts >= self.max_resume_attempts:
                    raise TransportSuspended(
                        f"omtesting: redo budget exhausted on {msg!r}")
            self.history.append(("ok", msg))
            self.echoed.append(msg)
            if self.echo_stdout:               # bEchoStdout c:232-235
                print(msg, end="", flush=True)

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        self.deliver([self.render(p) for p in payloads])
        return []


class MailTransport:
    """ommail (plugins/ommail/ommail.c) — a REAL SMTP client speaking
    the reference's exact wire exchange (sendSMTP c:670-705): one SMTP
    session per mail — connect, expect 220, ``HELO`` 250,
    ``MAIL FROM:<>`` 250, ``RCPT TO:<>`` 250 per recipient, ``DATA``
    354, RFC822 headers (Date/From/To/Subject/X-Mailer,
    writeMailMessage c:637-663) + dot-escaped body (bodyWrite
    c:595-634), ``\\r\\n.\\r\\n`` 250, ``QUIT`` 221.

    One mail per payload row, like the reference's one-send-per-action
    doAction; an SMTP/socket error closes the session and raises so
    ConnectorSink's bounded retry resends the bulk (suspend/resume)."""

    def __init__(self, host: str, port: int,
                 mail_from: str = "rsyslog@localhost",
                 rcpt_to=("root@localhost",),
                 subject: str = "syslog message",
                 subject_column: str | None = None,
                 body_enable: bool = True, render=None,
                 helo: str = "raylog"):
        self.addr = (host, port)
        self.mail_from = mail_from
        self.rcpt_to = tuple(rcpt_to) if not isinstance(rcpt_to, str) \
            else (rcpt_to,)
        self.subject = subject
        self.subject_column = subject_column
        self.body_enable = body_enable  # off for SMS gateways (c:131)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.helo = helo

    # -- SMTP protocol helpers -----------------------------------------
    @staticmethod
    def _read_response(rf, expected: int):
        """readResponse (c:456-486): consume continuation lines
        ('NNN-'), require the final line's code == expected."""
        while True:
            ln = rf.readline()
            if not ln:
                raise ConnectionError("smtp server closed connection")
            ln = ln.rstrip(b"\r\n")
            if len(ln) < 4:
                # the reference treats too-short responses as errors —
                # but a bare final line "NNN" (3 chars) is legal SMTP;
                # match the C exactly: < 4 chars = error
                raise ConnectionError(f"short smtp response {ln!r}")
            if ln[3:4] != b"-":
                code = int(ln[:3])
                if code != expected:
                    raise ConnectionError(
                        f"smtp expected {expected}, got {ln!r}")
                return

    @staticmethod
    def escape_body(body: str) -> str:
        """bodyWrite bEscapeDot (c:595-634): double a '.' at the start
        of the body or after any CRLF."""
        if body.startswith("."):
            body = "." + body
        return body.replace("\r\n.", "\r\n..")

    def _send_one(self, body: str, subject: str):
        import socket
        from email.utils import formatdate

        with socket.create_connection(self.addr, timeout=10) as s:
            rf = s.makefile("rb")
            try:
                w = lambda t: s.sendall(t.encode())
                self._read_response(rf, 220)
                w(f"HELO {self.helo}\r\n")
                self._read_response(rf, 250)
                w(f"MAIL FROM:<{self.mail_from}>\r\n")
                self._read_response(rf, 250)
                for rcpt in self.rcpt_to:          # WriteRcpts c:216-231
                    w(f"RCPT TO:<{rcpt}>\r\n")
                    self._read_response(rf, 250)
                w("DATA\r\n")
                self._read_response(rf, 354)
                # writeMailMessage (c:637-663) header order:
                # Date, From, To*, Subject, X-Mailer, blank, body
                w(f"Date: {formatdate(usegmt=True)}\r\n")
                w(f"From: <{self.mail_from}>\r\n")
                for rcpt in self.rcpt_to:
                    w(f"To: <{rcpt}>\r\n")
                clean_subj = subject.replace("\r", " ").replace("\n", " ")
                w(f"Subject: {clean_subj}\r\n")
                w("X-Mailer: rsyslog-ommail\r\n\r\n")
                if self.body_enable:
                    w(self.escape_body(body))
                w("\r\n.\r\n")
                self._read_response(rf, 250)
                w("QUIT\r\n")
                self._read_response(rf, 221)
            finally:
                rf.close()

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        for rec in payloads:
            subject = str(rec.get(self.subject_column, self.subject)) \
                if self.subject_column else self.subject
            self._send_one(self.render(rec), subject)
        return []

    def close(self):
        pass  # sessions are per-mail, nothing persistent


class PipeTransport:
    """ompipe (tools/ompipe.c) — named-pipe (FIFO) writer.  Opens
    ``O_RDWR|O_NONBLOCK`` exactly like the reference (c:141 — O_RDWR
    keeps the FIFO open-able with no reader attached and prevents
    EOF between readers); rendered lines are written with a partial-
    write loop (writePipe).  EPIPE / pipe-full close the fd and raise
    so ConnectorSink suspends and retries (tryResume c:284-314,
    tryResumeReopen semantics)."""

    def __init__(self, path: str, render=None):
        self.path = path
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._fd = None

    def _opened(self) -> int:
        if self._fd is None:
            self._fd = os.open(
                self.path,
                os.O_RDWR | os.O_NONBLOCK | getattr(os, "O_CLOEXEC", 0))
        return self._fd

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        data = "".join(self.render(rec) + "\n" for rec in payloads) \
            .encode()
        try:
            fd = self._opened()
            off = 0
            while off < len(data):          # writePipe partial-write loop
                off += os.write(fd, data[off:])
        except OSError:
            # EPIPE / EAGAIN(full): drop the fd, let the sink's
            # suspend/retry reopen — ompipe's bTryResumeReopen path
            self.close()
            raise
        return []

    def close(self):
        if self._fd is not None:
            try:
                os.close(self._fd)
            finally:
                self._fd = None


class KafkaTransport:
    """omkafka (plugins/omkafka/omkafka.c) over the REAL wire protocol
    (state/kafkawire.py — Produce v3, magic-v2 record batches with
    CRC-32C, murmur2 DefaultPartitioner), stdlib sockets only; the
    reference delegates these bytes to librdkafka.

    - ``key_field``: row field whose str value becomes the message key
      (omkafka's "key" template param) — keyed rows partition by
      murmur2, keyless rows round-robin.
    - ``topic`` / ``dynatopic_field``: fixed topic, or per-row topic
      from a field with an LRU cache of per-topic partition counts
      bounded by ``dynatopic_cachesize`` (omkafka.c:227-258 dynaCache:
      topics are created/validated on first use and evicted LRU).
    - transport errors and per-partition produce error codes raise, so
      ConnectorSink's bounded retry resends the bulk and then suspends
      — the deliver-callback failure path that feeds omkafka's
      failedMsgFile (here: ConnectorSink's error_file layer).
    """

    def __init__(self, host: str, port: int, topic: str = "raylog",
                 key_field: str | None = None, render=None,
                 dynatopic_field: str | None = None,
                 dynatopic_cachesize: int = 50, acks: int = -1):
        from ..state.kafkawire import KafkaProduceClient

        self._mk = lambda: KafkaProduceClient(host, port, acks=acks)
        self._client = None
        self.topic = topic
        self.key_field = key_field
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.dynatopic_field = dynatopic_field
        self.dynatopic_cachesize = dynatopic_cachesize

    def _connected(self):
        if self._client is None:
            self._client = self._mk()
        return self._client

    def _evict_topic_cache(self, client):
        # dynaCache eviction (omkafka.c:476-517): bound the per-topic
        # metadata map; pop arbitrary-oldest (dict = insertion order)
        while len(client._nparts) > self.dynatopic_cachesize:
            client._nparts.pop(next(iter(client._nparts)))

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        by_topic: dict[str, list] = {}
        for rec in payloads:
            topic = (str(rec.get(self.dynatopic_field, self.topic))
                     if self.dynatopic_field else self.topic)
            key = None
            if self.key_field is not None and rec.get(self.key_field) \
                    is not None:
                key = str(rec[self.key_field]).encode()
            by_topic.setdefault(topic, []).append(
                (key, self.render(rec).encode()))
        try:
            client = self._connected()
            for topic, msgs in by_topic.items():
                client.produce(topic, msgs)
                self._evict_topic_cache(client)
        except OSError:
            self.close()
            raise
        return []  # no per-item rejects in a produce: partition-level
        # errors raise and the whole bulk retries (at-least-once)

    def close(self):
        if self._client is not None:
            try:
                self._client.close()
            finally:
                self._client = None


class ClickHouseTransport:
    """omclickhouse (plugins/omclickhouse/omclickhouse.c) — the REAL
    HTTP interface (default port 8123): bulks POST as one INSERT
    statement, non-2xx or transport failure raises into ConnectorSink
    suspend/retry (curlPost c:461-506; checkConn health probe
    c:233-259).  Two serializations:

    - ``fmt="values"``: ``INSERT INTO t (cols) VALUES (...),(...)`` —
      the reference's template-rendered default (SQL-quoted strings)
    - ``fmt="jsoneachrow"``: ``INSERT INTO t (cols) FORMAT
      JSONEachRow`` + one JSON object per line — ClickHouse's
      documented bulk-ingest format, the right path for wide rows
    """

    def __init__(self, host: str, port: int = 8123, table: str = "raylog",
                 columns: list[str] | None = None,
                 fmt: str = "jsoneachrow"):
        assert fmt in ("jsoneachrow", "values")
        self.host, self.port = host, port
        self.table = table
        self.columns = columns
        self.fmt = fmt
        self._conn = None

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def check_conn(self) -> bool:
        """checkConn (omclickhouse.c:233): POST a trivial query."""
        try:
            c = self._connected()
            c.request("POST", "/", body=b"SELECT 1")
            return c.getresponse().status == 200
        except OSError:
            self.close()
            return False

    @staticmethod
    def _sql_quote(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, (int, float)):
            return str(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    def payload(self, payloads: list[dict]) -> bytes:
        cols = self.columns or sorted(payloads[0].keys())
        collist = ", ".join(cols)
        if self.fmt == "values":
            rows = ",".join(
                "(" + ",".join(self._sql_quote(rec.get(c)) for c in cols)
                + ")" for rec in payloads)
            return (f"INSERT INTO {self.table} ({collist}) "
                    f"VALUES {rows}").encode()
        lines = "\n".join(
            json.dumps({c: rec.get(c) for c in cols}, default=str)
            for rec in payloads)
        return (f"INSERT INTO {self.table} ({collist}) "
                f"FORMAT JSONEachRow\n{lines}\n").encode()

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body = self.payload(payloads)
        try:
            c = self._connected()
            c.request("POST", "/", body=body,
                      headers={"Content-Type": "text/plain"})
            resp = c.getresponse()
            data = resp.read()
            if resp.status >= 300:
                raise ConnectionError(
                    f"clickhouse HTTP {resp.status}: {data[:200]!r}")
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


class PgWireTransport:
    """ompgsql (plugins/ompgsql/ompgsql.c) — but over the REAL
    PostgreSQL v3 wire protocol in stdlib sockets (the reference links
    libpq; none exists here): StartupMessage (protocol 3.0,
    user/database params, trust auth), then per bulk either

    - ``copy=True`` (default): one ``COPY table (cols) FROM STDIN``
      simple Query, rows streamed as CopyData messages with text-format
      escaping, CopyDone, CommandComplete — the bulk-ingest path
    - ``copy=False``: one multi-row ``INSERT`` simple Query — the
      reference's rendered-template shape (tryExec/writePgSQL
      ompgsql.c:228-292)

    ErrorResponse ('E') or socket failure closes the connection and
    raises -> ConnectorSink bounded retry -> suspend, matching
    initPgSQL/checkDBErrorState reconnect semantics."""

    def __init__(self, host: str, port: int, dbname: str = "syslog",
                 user: str = "rsyslog", table: str = "raylog",
                 columns: list[str] | None = None, copy: bool = True):
        self.addr = (host, port)
        self.dbname, self.user = dbname, user
        self.table = table
        self.columns = columns
        self.copy = copy
        self._sock = None

    # -- protocol plumbing -------------------------------------------------
    def _msg(self, typ: bytes, body: bytes) -> bytes:
        import struct

        return typ + struct.pack(">i", len(body) + 4) + body

    def _read_msg(self):
        import struct

        hdr = b""
        while len(hdr) < 5:
            c = self._sock.recv(5 - len(hdr))
            if not c:
                raise ConnectionError("pg peer closed")
            hdr += c
        typ = hdr[:1]
        (ln,) = struct.unpack(">i", hdr[1:5])
        body = b""
        while len(body) < ln - 4:
            c = self._sock.recv(ln - 4 - len(body))
            if not c:
                raise ConnectionError("pg peer closed")
            body += c
        return typ, body

    def _connected(self):
        import socket
        import struct

        if self._sock is not None:
            return self._sock
        self._sock = socket.create_connection(self.addr, timeout=10)
        params = (f"user\x00{self.user}\x00database\x00{self.dbname}\x00"
                  "\x00").encode()
        startup = struct.pack(">ii", len(params) + 8, 196608) + params
        self._sock.sendall(startup)
        while True:                      # auth cycle to ReadyForQuery
            typ, body = self._read_msg()
            if typ == b"R":
                (code,) = struct.unpack(">i", body[:4])
                if code != 0:            # only trust auth supported
                    raise ConnectionError(f"pg auth method {code} "
                                          "unsupported (trust only)")
            elif typ == b"E":
                raise ConnectionError(f"pg startup error: {body[:200]!r}")
            elif typ == b"Z":
                return self._sock
            # 'S' ParameterStatus / 'K' BackendKeyData: ignore

    def _simple_query_drain(self):
        """Read until ReadyForQuery; raise on ErrorResponse."""
        err = None
        while True:
            typ, body = self._read_msg()
            if typ == b"E" and err is None:
                err = body.decode(errors="replace")
            elif typ == b"Z":
                if err is not None:
                    raise ConnectionError(f"pg error: {err[:300]}")
                return

    @staticmethod
    def _copy_escape(v) -> str:
        if v is None:
            return "\\N"
        return (str(v).replace("\\", "\\\\").replace("\t", "\\t")
                .replace("\n", "\\n").replace("\r", "\\r"))

    @staticmethod
    def _sql_quote(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, (int, float)):
            return str(v)
        return "'" + str(v).replace("'", "''") + "'"

    # -- delivery ------------------------------------------------------------
    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        cols = self.columns or sorted(payloads[0].keys())
        try:
            s = self._connected()
            if self.copy:
                sql = (f"COPY {self.table} ({', '.join(cols)}) "
                       "FROM STDIN")
                s.sendall(self._msg(b"Q", sql.encode() + b"\x00"))
                typ, body = self._read_msg()
                if typ == b"E":
                    self._simple_query_drain_after_error(body)
                if typ != b"G":
                    raise ConnectionError(
                        f"expected CopyInResponse, got {typ!r}")
                data = "".join(
                    "\t".join(self._copy_escape(rec.get(c)) for c in cols)
                    + "\n" for rec in payloads).encode()
                s.sendall(self._msg(b"d", data) + self._msg(b"c", b""))
                self._simple_query_drain()
            else:
                rows = ",".join(
                    "(" + ",".join(self._sql_quote(rec.get(c))
                                   for c in cols) + ")"
                    for rec in payloads)
                sql = (f"INSERT INTO {self.table} ({', '.join(cols)}) "
                       f"VALUES {rows}")
                s.sendall(self._msg(b"Q", sql.encode() + b"\x00"))
                self._simple_query_drain()
        except OSError:
            self.close()
            raise
        except ConnectionError:
            self.close()
            raise
        return []

    def _simple_query_drain_after_error(self, first_err: bytes):
        err = first_err.decode(errors="replace")
        while True:
            typ, _body = self._read_msg()
            if typ == b"Z":
                raise ConnectionError(f"pg error: {err[:300]}")

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class MySqlTransport:
    """ommysql (plugins/ommysql/ommysql.c) over the REAL MySQL
    client/server protocol in stdlib sockets (the reference links
    libmysqlclient): HandshakeV10 -> HandshakeResponse41 with the
    mysql_native_password scramble, then one multi-row ``INSERT``
    COM_QUERY per bulk (the reference executes its rendered template
    per message via mysql_real_query, ommysql.c:235-292; bulking is
    the batch-engine win).  ERR packets and socket failures close the
    connection and raise -> ConnectorSink bounded retry -> suspend
    (initMySQL reconnect semantics)."""

    def __init__(self, host: str, port: int = 3306, user: str = "rsyslog",
                 password: str = "", database: str = "syslog",
                 table: str = "raylog", columns: list[str] | None = None):
        self.addr = (host, port)
        self.user, self.password, self.database = user, password, database
        self.table = table
        self.columns = columns
        self._sock = None

    def _connected(self):
        import socket

        from ..state import dbwire as w

        if self._sock is not None:
            return self._sock
        self._sock = socket.create_connection(self.addr, timeout=10)
        try:
            seq, greeting = w.mysql_read_packet(self._sock)
            hs = w.parse_handshake_v10(greeting)
            if hs["plugin"] != "mysql_native_password":
                raise ConnectionError(
                    f"auth plugin {hs['plugin']} unsupported")
            w.mysql_send_packet(self._sock, seq + 1,
                                w.build_handshake_response(
                                    self.user, self.password,
                                    self.database, hs["nonce"]))
            _seq, reply = w.mysql_read_packet(self._sock)
            kind, msg = w.classify_mysql_reply(reply)
            if kind != "ok":
                raise ConnectionError(f"mysql auth failed: {msg}")
        except (OSError, ConnectionError):
            self.close()
            raise
        return self._sock

    @staticmethod
    def _sql_quote(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, (int, float)):
            return str(v)
        s = (str(v).replace("\\", "\\\\").replace("'", "\\'")
             .replace("\x00", "\\0"))
        return f"'{s}'"

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import dbwire as w

        cols = self.columns or sorted(payloads[0].keys())
        rows = ",".join(
            "(" + ",".join(self._sql_quote(rec.get(c)) for c in cols) + ")"
            for rec in payloads)
        sql = (f"INSERT INTO {self.table} ({', '.join(cols)}) "
               f"VALUES {rows}")
        try:
            s = self._connected()
            w.mysql_send_packet(s, 0, bytes([w.COM_QUERY]) + sql.encode())
            _seq, reply = w.mysql_read_packet(s)
            kind, msg = w.classify_mysql_reply(reply)
            if kind == "err":
                raise ConnectionError(f"mysql error: {msg}")
        except (OSError, ConnectionError):
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                from ..state import dbwire as w

                w.mysql_send_packet(self._sock, 0, bytes([w.COM_QUIT]))
            except OSError:
                pass
            try:
                self._sock.close()
            finally:
                self._sock = None


class MongoTransport:
    """ommongodb (plugins/ommongodb/ommongodb.c) over the REAL wire
    protocol (OP_MSG + BSON, state/dbwire.py; the reference links
    libmongoc): each bulk becomes one ``insert`` command with the rows
    as BSON documents.  A reply without ok:1 (or with writeErrors)
    surfaces per-item rejects -> errorfile quarantine, matching the
    reference's error-into-dead-letter behavior."""

    def __init__(self, host: str, port: int = 27017, db: str = "logdb",
                 collection: str = "log", columns: list[str] | None = None):
        self.addr = (host, port)
        self.db = db
        self.collection = collection
        self.columns = columns
        self._sock = None
        self._req_id = 0

    def _connected(self):
        import socket

        if self._sock is None:
            self._sock = socket.create_connection(self.addr, timeout=10)
        return self._sock

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import dbwire as w

        cols = self.columns
        docs = [({c: rec.get(c) for c in cols} if cols else dict(rec))
                for rec in payloads]
        self._req_id += 1
        cmd = {"insert": self.collection, "$db": self.db,
               "ordered": False, "documents": docs}
        try:
            s = self._connected()
            w.mongo_send_msg(s, self._req_id, cmd)
            _resp_to, reply = w.mongo_read_msg(s)
        except (OSError, ConnectionError):
            self.close()
            raise
        if reply.get("ok") != 1.0 and reply.get("ok") != 1:
            raise ConnectionError(f"mongo insert not ok: {reply}")
        rejects = []
        for e in reply.get("writeErrors", []) or []:
            rejects.append((int(e.get("index", 0)),
                            str(e.get("errmsg", "writeError"))))
        return rejects

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class RedisTransport:
    """omhiredis (contrib/omhiredis/omhiredis.c) over the REAL RESP
    protocol (state/dbwire.py; the reference links hiredis).  All four
    reference modes (omhiredis.c:61-65 + stream params :78-101):

    - ``mode="queue"``: LPUSH (default) or RPUSH with ``use_rpush``
    - ``mode="publish"``: PUBLISH to ``key``
    - ``mode="set"``: SET (or SETEX with ``expiration`` seconds)
      keyed by ``key`` + the row's ``key_field`` value
    - ``mode="stream"``: XADD with the rendered message in
      ``stream_out_field`` and optional MAXLEN ~ ``capacity_limit``

    ``dynakey``: take the key per row from ``key_field`` (dynaKey
    template analog).  Replies are checked per command; -ERR raises
    into ConnectorSink's bounded retry/suspend."""

    def __init__(self, host: str, port: int = 6379, mode: str = "queue",
                 key: str = "raylog", key_field: str | None = None,
                 use_rpush: bool = False, expiration: int = 0,
                 stream_out_field: str = "msg",
                 capacity_limit: int = 0, render=None):
        assert mode in ("queue", "publish", "set", "stream")
        self.addr = (host, port)
        self.mode = mode
        self.key = key
        self.key_field = key_field
        self.use_rpush = use_rpush
        self.expiration = expiration
        self.stream_out_field = stream_out_field
        self.capacity_limit = capacity_limit
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._sock = None

    def _connected(self):
        import socket

        if self._sock is None:
            self._sock = socket.create_connection(self.addr, timeout=10)
        return self._sock

    def _key_for(self, rec: dict) -> str:
        if self.key_field is not None:
            return f"{self.key}{rec.get(self.key_field, '')}"
        return self.key

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state.dbwire import resp_encode, resp_read

        try:
            s = self._connected()
            # pipeline the whole bulk, then read all replies (hiredis
            # appendCommand/getReply batching, omhiredis doAction)
            buf = bytearray()
            for rec in payloads:
                msg = self.render(rec)
                k = self._key_for(rec)
                if self.mode == "queue":
                    cmd = ["RPUSH" if self.use_rpush else "LPUSH", k, msg]
                elif self.mode == "publish":
                    cmd = ["PUBLISH", k, msg]
                elif self.mode == "set":
                    cmd = (["SETEX", k, self.expiration, msg]
                           if self.expiration else ["SET", k, msg])
                else:
                    cmd = ["XADD", k]
                    if self.capacity_limit:
                        cmd += ["MAXLEN", "~", self.capacity_limit]
                    cmd += ["*", self.stream_out_field, msg]
                buf += resp_encode(cmd)
            s.sendall(bytes(buf))
            for _ in payloads:
                resp_read(s)             # raises on -ERR
        except (OSError, ConnectionError):
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class RelpTransport:
    """omrelp (plugins/omrelp/omrelp.c) over the REAL RELP wire
    protocol (state/relpwire.py; the reference links librelp, the
    protocol is the published RELP spec).  Confirmed delivery is the
    point: the session opens with an offer handshake (relp_version /
    commands=syslog), every ``syslog`` frame must be answered by an
    ``rsp 200`` carrying the same TXNR, and at most ``window_size``
    frames ride unconfirmed (omrelp.c:262 relpCltSetWindowSize; rsps
    are consumed oldest-first, in-order).  A non-200 rsp or socket
    error closes the session and re-raises so ConnectorSink's bounded
    retry reopens and resends the bulk — omrelp's suspend/resume with
    librelp's unacked-resend, at-least-once on the bulk.

    ``rebind_interval``: close and reopen the session every N messages
    (omrelp.c:84,327 rebindInterval).  ``ssl_context``: TLS below the
    framing (omrelp.c:269 relpCltEnableTLS), same layering as every
    transport here."""

    def __init__(self, host: str, port: int, render=None,
                 window_size: int = 128, rebind_interval: int = 0,
                 ssl_context=None, server_hostname: str | None = None):
        self.addr = (host, port)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        assert window_size >= 1
        self.window_size = window_size
        self.rebind_interval = rebind_interval
        self.ssl_context = ssl_context
        self.server_hostname = server_hostname or host
        self._sock = None
        self._txnr = 0
        self._sent_since_bind = 0

    def _next_txnr(self) -> int:
        from ..state.relpwire import MAX_TXNR
        self._txnr = self._txnr % MAX_TXNR + 1
        return self._txnr

    def _connected(self):
        import socket

        from ..state.relpwire import (offers_decode, offers_encode,
                                      relp_frame)

        if self._sock is None:
            s = socket.create_connection(self.addr, timeout=10)
            if self.ssl_context is not None:
                s = self.ssl_context.wrap_socket(
                    s, server_hostname=self.server_hostname)
            self._sock = s
            t = self._next_txnr()
            s.sendall(relp_frame(t, "open", offers_encode({
                "relp_version": "0",
                "relp_software": "rsyslog_ray,0.4,local",
                "commands": "syslog"})))
            data = self._confirm(t)
            # the 200 rsp echoes the offers the server accepts
            rest = data.split(b"\n", 1)
            peer = offers_decode(rest[1]) if len(rest) == 2 else {}
            if "syslog" not in peer.get("commands", "syslog"):
                raise ConnectionError("relp peer refuses syslog command")
            self._sent_since_bind = 0
        return self._sock

    def _confirm(self, txnr: int) -> bytes:
        from ..state.relpwire import relp_read_frame, rsp_code

        rt, cmd, data = relp_read_frame(self._sock)
        if cmd != "rsp" or rt != txnr:
            raise ConnectionError(
                f"relp: expected rsp {txnr}, got {cmd} {rt}")
        code, text = rsp_code(data)
        if code != 200:
            raise ConnectionError(f"relp: rsp {code} {text}")
        return data

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state.relpwire import relp_frame

        try:
            s = self._connected()
            pending: list[int] = []
            for rec in payloads:
                if (self.rebind_interval and
                        self._sent_since_bind >= self.rebind_interval):
                    while pending:
                        self._confirm(pending.pop(0))
                    self._close_session()
                    s = self._connected()
                t = self._next_txnr()
                s.sendall(relp_frame(t, "syslog",
                                     self.render(rec).encode()))
                pending.append(t)
                self._sent_since_bind += 1
                if len(pending) >= self.window_size:
                    self._confirm(pending.pop(0))
            while pending:
                self._confirm(pending.pop(0))
        except (OSError, ConnectionError):
            self._abort()
            raise
        return []

    def _close_session(self):
        from ..state.relpwire import relp_frame, relp_read_frame

        if self._sock is None:
            return
        try:
            t = self._next_txnr()
            self._sock.sendall(relp_frame(t, "close"))
            self._confirm(t)
            # polite peers follow with a serverclose 0; best-effort
            self._sock.settimeout(0.25)
            try:
                relp_read_frame(self._sock)
            except (OSError, ConnectionError):
                pass
        except (OSError, ConnectionError):
            pass
        finally:
            self._abort()

    def _abort(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None

    def close(self):
        self._close_session()


class SnmpTrapTransport:
    """omsnmp (plugins/omsnmp/omsnmp.c) over the real SNMPv1/v2c trap
    wire format (state/snmpwire.py BER; the reference builds the same
    PDUs with net-snmp).  ``version=1``: RFC 1157 Trap-PDU with the
    enterprise OID, agent-addr taken per row from ``source_field``
    when set (omsnmp snmpv1dynsource, omsnmp.c:128 + :315-331
    inet_pton into pdu->agent_addr), generic/specific trap types
    (defaults enterpriseSpecific/0, omsnmp.c:144-145).  ``version=2``:
    SNMPv2-Trap opening with the sysUpTime.0 and snmpTrapOID.0
    varbinds (omsnmp.c:341-358).  The rendered message rides as an
    OCTET STRING bound to ``syslog_message_oid`` (omsnmp.c:364-377,
    default 1.3.6.1.4.1.19406.1.1.2.1).  One UDP datagram per trap —
    fire-and-forget, so delivery accounting is per-send and only
    socket errors raise into the retry path."""

    def __init__(self, host: str, port: int = 162, version: int = 2,
                 community: str = "public",
                 enterprise_oid: str = "1.3.6.1.4.1.3.1.1",
                 trap_oid: str = "1.3.6.1.4.1.19406.1.2.1",
                 syslog_message_oid: str = "1.3.6.1.4.1.19406.1.1.2.1",
                 trap_type: int | None = None, specific_type: int = 0,
                 source_field: str | None = None, render=None,
                 uptime_fn=None):
        from ..state.snmpwire import TRAP_ENTERPRISE_SPECIFIC

        assert version in (1, 2)
        self.addr = (host, port)
        self.version = version
        self.community = community
        self.enterprise_oid = enterprise_oid
        self.trap_oid = trap_oid
        self.syslog_message_oid = syslog_message_oid
        self.trap_type = (TRAP_ENTERPRISE_SPECIFIC
                          if trap_type is None else trap_type)
        self.specific_type = specific_type
        self.source_field = source_field
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._t0 = time.monotonic()
        # uptime in centiseconds, like net-snmp's get_uptime()
        self.uptime_fn = uptime_fn or (
            lambda: int((time.monotonic() - self._t0) * 100))
        self._request_id = 0
        self._sock = None

    def _connected(self):
        import socket

        if self._sock is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        return self._sock

    @staticmethod
    def _valid_v4(s) -> bool:
        parts = str(s).split(".")
        return (len(parts) == 4 and all(p.isdigit() and int(p) < 256
                                        for p in parts))

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state.snmpwire import ber_str, trap_v1, trap_v2c, varbind

        try:
            s = self._connected()
            for rec in payloads:
                vb = [varbind(self.syslog_message_oid,
                              ber_str(self.render(rec)))]
                if self.version == 1:
                    src = (rec.get(self.source_field)
                           if self.source_field else None)
                    agent = src if src and self._valid_v4(src) \
                        else "0.0.0.0"
                    dgram = trap_v1(self.community, self.enterprise_oid,
                                    agent, self.trap_type,
                                    self.specific_type,
                                    self.uptime_fn(), vb)
                else:
                    self._request_id += 1
                    dgram = trap_v2c(self.community, self._request_id,
                                     self.uptime_fn(), self.trap_oid,
                                     vb)
                s.sendto(dgram, self.addr)
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class JournalTransport:
    """omjournal (plugins/omjournal/omjournal.c) — batch analog.  The
    container has no journald, so entries are emitted in the journal
    Export Format that imjournal consumes (the documented interchange
    stream; sources/journal.py is the reader half), appended to a
    file — a namespace-style stream target, like omjournal.c:253's
    sd_journal_stream_fd_with_namespace file fallback.  Two modes,
    mirroring the reference exactly:

    - non-template (omjournal.c:290-302 send_non_template_message):
      MESSAGE from ``msg_field``, PRIORITY = facility*8|severity
      (the reference sends the full PRI value here, not the 0-7
      journald level — mirrored faithfully), SYSLOG_FACILITY,
      SYSLOG_IDENTIFIER from ``tag_field``.
    - template (omjournal.c:304-315 send_template_message + :186
      build_iovec): every row key becomes a journal field verbatim;
      ``fields=[...]`` selects and uppercases row columns.

    Values with embedded newlines use the export format's binary form
    (NAME LF + 64-bit LE size + raw + LF)."""

    def __init__(self, path: str, fields: list[str] | None = None,
                 msg_field: str = "msg", tag_field: str = "tag",
                 severity_field: str = "severity",
                 facility_field: str = "facility"):
        self.path = path
        self.fields = fields
        self.msg_field = msg_field
        self.tag_field = tag_field
        self.severity_field = severity_field
        self.facility_field = facility_field
        self._fh = None

    def _opened(self):
        if self._fh is None:
            self._fh = open(self.path, "ab")
        return self._fh

    @staticmethod
    def _field(name: str, value) -> bytes:
        v = str(value).encode()
        if b"\n" in v:
            return (name.encode() + b"\n"
                    + len(v).to_bytes(8, "little") + v + b"\n")
        return name.encode() + b"=" + v + b"\n"

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        try:
            fh = self._opened()
            out = bytearray()
            for rec in payloads:
                if self.fields is not None:          # template mode
                    for k in self.fields:
                        if k in rec and rec[k] is not None:
                            out += self._field(k.upper(), rec[k])
                else:                                # omjournal.c:300
                    sev = int(rec.get(self.severity_field, 5))
                    fac = int(rec.get(self.facility_field, 1))
                    out += self._field("MESSAGE",
                                       rec.get(self.msg_field, ""))
                    out += self._field("PRIORITY", fac * 8 | sev)
                    out += self._field("SYSLOG_FACILITY", fac)
                    out += self._field("SYSLOG_IDENTIFIER",
                                       rec.get(self.tag_field, ""))
                out += b"\n"
            fh.write(bytes(out))
            fh.flush()
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._fh is not None:
            try:
                self._fh.close()
            finally:
                self._fh = None


class SpoofUdpTransport:
    """omudpspoof (plugins/omudpspoof/omudpspoof.c) — UDP with a forged
    source address, rebuilt on a raw socket instead of libnet.  Per
    the reference: the spoofed source IP comes per row from
    ``source_field`` (the sourcetemplate default is the message's
    fromhost-ip), the source PORT cycles sourceport.start..end per
    message (omudpspoof.c:110-111,365-366, defaults 32000..42000),
    oversized messages truncate at 65528 (c:361), and payloads past
    ``mtu`` are IP-fragmented — 8-byte-aligned fragments sharing one
    IP id with MF set on all but the last (c:381-492).  IP header
    checksum computed; UDP checksum 0 (optional for IPv4).  Requires
    CAP_NET_RAW, like the reference."""

    def __init__(self, host: str, port: int = 514, render=None,
                 source: str = "127.0.0.2",
                 source_field: str | None = "fromhost_ip",
                 source_port_start: int = 32000,
                 source_port_end: int = 42000, mtu: int = 1500):
        self.addr = (host, port)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.source = source
        self.source_field = source_field
        self.source_port_start = source_port_start
        self.source_port_end = source_port_end
        self._sport = source_port_start
        self.mtu = mtu
        self._ip_id = 0
        self._sock = None

    def _connected(self):
        import socket

        if self._sock is None:
            self._sock = socket.socket(socket.AF_INET, socket.SOCK_RAW,
                                       socket.IPPROTO_RAW)
        return self._sock

    @staticmethod
    def _cksum(b: bytes) -> int:
        import struct as _s

        if len(b) % 2:
            b += b"\x00"
        s = sum(_s.unpack(">%dH" % (len(b) // 2), b))
        while s >> 16:
            s = (s & 0xFFFF) + (s >> 16)
        return (~s) & 0xFFFF

    def _ip_hdr(self, src: str, dst: str, total: int, ip_id: int,
                frag: int) -> bytes:
        import socket
        import struct as _s

        hdr = _s.pack(">BBHHHBBH4s4s", 0x45, 0, total, ip_id, frag,
                      64, 17, 0, socket.inet_aton(src),
                      socket.inet_aton(dst))
        return hdr[:10] + _s.pack(">H", self._cksum(hdr)) + hdr[12:]

    def _datagrams(self, src: str, sport: int, data: bytes):
        """Yield raw IP packets: one, or MTU-bound fragments."""
        import struct as _s

        dst = self.addr[0]
        self._ip_id = self._ip_id % 0xFFFF + 1
        udp = _s.pack(">4H", sport, self.addr[1], 8 + len(data),
                      0) + data
        max_payload = (self.mtu - 20) & ~0x07      # c:381
        if len(udp) <= max_payload:
            yield self._ip_hdr(src, dst, 20 + len(udp), self._ip_id,
                               0) + udp
            return
        off = 0
        while off < len(udp):
            chunk = udp[off:off + max_payload]
            more = off + len(chunk) < len(udp)
            frag = (0x2000 if more else 0) | (off >> 3)
            yield self._ip_hdr(src, dst, 20 + len(chunk), self._ip_id,
                               frag) + chunk
            off += len(chunk)

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        try:
            s = self._connected()
            for rec in payloads:
                # c:361 truncates at 65528, but an IPv4 datagram tops
                # out at 65535 INCLUDING the 20-byte header — anything
                # past 65507 payload bytes is unreassemblable, so
                # clamp at the protocol maximum instead
                data = self.render(rec).encode()[:65507]
                src = (rec.get(self.source_field)
                       if self.source_field else None) or self.source
                sport = self._sport
                self._sport = (self.source_port_start
                               if self._sport >= self.source_port_end
                               else self._sport + 1)
                for pkt in self._datagrams(str(src), sport, data):
                    s.sendto(pkt, (self.addr[0], 0))
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class CzmqTransport:
    """omczmq (contrib/omczmq/omczmq.c) over the REAL ZMTP 3.0 wire
    (state/zmtpwire.py; the reference links czmq/libzmq).  Socket
    types mirroring the reference's useful batch subset:

    - ``socktype="PUSH"``: one frame per rendered message.
    - ``socktype="PUB"`` + ``topics``: per topic, either a separate
      topic frame with MORE set (``topic_frame=True``,
      omczmq.c:255-256 zstr_sendx) or topic+message concatenated in
      one frame (c:260-263 zstr_sendf); ``dynatopic_field`` takes the
      topic per row (c:250-251).  Real PUB filtering: ``\\x01topic``
      subscription messages received from the peer are drained before
      every bulk and only subscribed topics are sent (prefix match,
      like libzmq's trie).

    Handshake failures and socket errors raise into ConnectorSink's
    bounded retry/suspend (c:266-268 sendError → SUSPENDED)."""

    def __init__(self, host: str, port: int, socktype: str = "PUSH",
                 render=None, topics: list[str] | None = None,
                 topic_frame: bool = True,
                 dynatopic_field: str | None = None):
        assert socktype in ("PUSH", "PUB")
        self.addr = (host, port)
        self.socktype = socktype
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.topics = list(topics or [])
        self.topic_frame = topic_frame
        self.dynatopic_field = dynatopic_field
        self._sock = None
        self._subs: set[str] = set()

    def _connected(self):
        import socket

        from ..state.zmtpwire import handshake

        if self._sock is None:
            s = socket.create_connection(self.addr, timeout=10)
            handshake(s, self.socktype)
            self._sock = s
        return self._sock

    def _drain_subscriptions(self, s):
        import select

        from ..state.zmtpwire import read_frame

        # first drain waits briefly for the initial subscription —
        # the batch answer to zmq's classic slow-joiner race (a real
        # PUB silently drops until the SUB's \x01 lands)
        if not self._subs and select.select([s], [], [], 2.0)[0]:
            body, _more, is_cmd = read_frame(s)
            if not is_cmd and body[:1] == b"\x01":
                self._subs.add(body[1:].decode())
        while select.select([s], [], [], 0)[0]:
            body, _more, is_cmd = read_frame(s)
            if is_cmd:
                continue
            if body[:1] == b"\x01":
                self._subs.add(body[1:].decode())
            elif body[:1] == b"\x00":
                self._subs.discard(body[1:].decode())

    def _subscribed(self, topic: str) -> bool:
        return any(topic.startswith(sub) for sub in self._subs)

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state.zmtpwire import frame

        try:
            s = self._connected()
            out = bytearray()
            if self.socktype == "PUB":
                self._drain_subscriptions(s)
            for rec in payloads:
                msg = self.render(rec).encode()
                if self.socktype == "PUSH":
                    out += frame(msg)
                    continue
                topics = ([str(rec.get(self.dynatopic_field, ""))]
                          if self.dynatopic_field else self.topics)
                for topic in topics:
                    if not self._subscribed(topic):
                        continue
                    if self.topic_frame:
                        out += frame(topic.encode(), more=True)
                        out += frame(msg)
                    else:
                        out += frame(topic.encode() + msg)
            if out:
                s.sendall(bytes(out))
        except (OSError, ConnectionError):
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


class DtlsTransport:
    """omdtls (plugins/omdtls/omdtls.c): one rendered message per
    DTLS-sealed datagram.  The reference wraps OpenSSL; here the
    whole DTLS 1.2 stack is in-repo (state/dtlswire.py — RFC 6347
    records + cookie exchange, RFC 5246 handshake/PRF, FIPS-197 AES,
    PKCS#1 key exchange), CERTANON-parity server auth (the cert's RSA
    key is used, the chain is not validated — net_ossl.c:654-657
    SSL_VERIFY_NONE)."""

    def __init__(self, host: str, port: int, render=None,
                 timeout: float = 10.0):
        self.host, self.port, self.timeout = host, port, timeout
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._cli = None

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state.dtlswire import DtlsClient

        if self._cli is None:
            self._cli = DtlsClient(self.host, self.port,
                                   timeout=self.timeout)
        try:
            for rec in payloads:
                self._cli.send(self.render(rec).encode("utf-8"))
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._cli is not None:
            try:
                self._cli.close()
            finally:
                self._cli = None


class HdfsNativeTransport:
    """omhdfs over the NATIVE Hadoop wire (plugins/omhdfs/omhdfs.c
    delegates to libhdfs hdfsConnect/hdfsOpenFile/hdfsWrite — no JVM
    here, so state/hadoopwire.py speaks the protocols directly):
    NameNode RPC v9 ``create`` on first bulk, one ``addBlock``, a
    DataNode WRITE_BLOCK packet stream (CRC32C chunk checksums) fed
    per bulk, then last-packet + ``complete`` at :meth:`close` — the
    single-writer create path.  Rows render to LF-terminated lines
    (the reference renders the template then hdfsWrites the line,
    omhdfs.c:340-420).

    Limits (loud, documented): SIMPLE auth only, one block per file
    (a bulk stream past ``block_size`` raises rather than silently
    truncating), pipeline of the first reported datanode."""

    def __init__(self, namenode: str, port: int = 8020,
                 file: str = "/raylog", user: str = "hdfs",
                 render=None, block_size: int = 128 * 1024 * 1024,
                 bytes_per_checksum: int = 512):
        self.namenode, self.port = namenode, port
        self.file = file if file.startswith("/") else "/" + file
        self.user = user
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.block_size = block_size
        self.bpc = bytes_per_checksum
        self._rpc = None
        self._writer = None
        self._block = None
        self._file_id = 0

    def _open(self):
        from ..state.hadoopwire import BlockWriter, HdfsRpcClient

        rpc = HdfsRpcClient(self.namenode, self.port, self.user)
        st = rpc.create(self.file, overwrite=True,
                        block_size=self.block_size)
        self._file_id = st["fileId"]
        blk = rpc.add_block(self.file, self._file_id)
        if not blk["locs"]:
            raise ConnectionError("addBlock returned no datanodes")
        host, dport = blk["locs"][0]
        self._writer = BlockWriter(host, dport, blk,
                                   rpc._client_name(),
                                   bytes_per_checksum=self.bpc)
        self._rpc, self._block = rpc, blk

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body = ("\n".join(self.render(r) for r in payloads)
                + "\n").encode()
        if self._writer is None:
            self._open()
        if self._writer.offset + len(body) > self.block_size:
            raise ConnectionError(
                "single-block writer exceeded block_size; raise "
                "block_size or rotate the sink file")
        self._writer.write(body)
        return []

    def close(self):
        try:
            if self._writer is not None:
                n = self._writer.finish()
                self._rpc.complete(self.file, self._block,
                                   self._file_id, n)
        finally:
            self._writer = None
            if self._rpc is not None:
                self._rpc.close()
                self._rpc = None


class HttpFsTransport:
    """omhttpfs (contrib/omhttpfs/omhttpfs.c) — HDFS over the
    WebHDFS/HttpFS REST interface, stdlib http.client instead of
    libcurl.  The reference's doAction flow (c:540-595): try
    ``POST /webhdfs/v1<file>?user.name=<u>&op=append&data=true``
    first; a 404 means the file does not exist yet → ``PUT ...
    op=create&data=true`` (c:444-500), then resume appending.  Rows
    render to LF-terminated lines, bulked per ConnectorSink batch.
    Any other non-2xx raises into the bounded retry/suspend."""

    def __init__(self, host: str, port: int = 14000, file: str = "/raylog",
                 user: str = "hdfs", render=None):
        self.host = host
        self.port = port
        self.file = file if file.startswith("/") else "/" + file
        self.user = user
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._conn = None

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def _url(self, op: str) -> str:
        return (f"/webhdfs/v1{self.file}?user.name={self.user}"
                f"&op={op}&data=true")

    def _req(self, method: str, op: str, body: bytes) -> int:
        c = self._connected()
        c.request(method, self._url(op), body=body,
                  headers={"Content-Type": "application/octet-stream"})
        resp = c.getresponse()
        resp.read()
        return resp.status

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body = ("\n".join(self.render(r) for r in payloads)
                + "\n").encode()
        try:
            status = self._req("POST", "append", body)
            if status == 404:                    # c:557-570
                status = self._req("PUT", "create", body)
            if status >= 300:
                raise ConnectionError(f"httpfs HTTP {status}")
        except OSError:
            self.close()
            raise
        return []

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


class AmqpTransport:
    """omrabbitmq (contrib/omrabbitmq/omrabbitmq.c) over the REAL
    AMQP 0-9-1 wire (state/amqpwire.py; the reference links
    rabbitmq-c).  Connection: protocol header, PLAIN login
    (start/start-ok with the \\0user\\0pass response), tune/tune-ok
    echoing the server's limits, connection.open to the vhost,
    channel.open.  With ``exchange_type`` set the exchange is
    declared (c:302-309 amqp_exchange_declare with the durable bit).
    Each row is one basic.publish (exchange + routing key — fixed or
    per-row via ``routing_key_field``, the routing_key_template
    analog) followed by the content header carrying content-type and
    delivery-mode (c:127,134) and one body frame.  Server-initiated
    connection.close / socket errors raise into the bounded
    retry/suspend."""

    def __init__(self, host: str, port: int = 5672, user: str = "guest",
                 password: str = "guest", vhost: str = "/",
                 exchange: str = "", routing_key: str = "raylog",
                 routing_key_field: str | None = None,
                 exchange_type: str | None = None, durable: bool = False,
                 delivery_mode: int = 1,
                 content_type: str = "application/json", render=None):
        self.addr = (host, port)
        self.user = user
        self.password = password
        self.vhost = vhost
        self.exchange = exchange
        self.routing_key = routing_key
        self.routing_key_field = routing_key_field
        self.exchange_type = exchange_type
        self.durable = durable
        self.delivery_mode = delivery_mode
        self.content_type = content_type
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self._sock = None
        self._max_frame = 131072

    def _expect(self, cm: tuple[int, int]) -> bytes:
        from ..state import amqpwire as w

        while True:
            ftype, _ch, payload = w.read_frame(self._sock)
            if ftype == w.FRAME_HEARTBEAT:
                continue
            if ftype != w.FRAME_METHOD:
                raise ConnectionError(f"amqp: unexpected frame {ftype}")
            got, args = w.parse_method(payload)
            if got == w.CONN_CLOSE:
                r = w.Reader(args)
                code = r.u16()
                text = r.shortstr()
                raise ConnectionError(f"amqp: closed {code} {text}")
            if got != cm:
                raise ConnectionError(f"amqp: expected {cm}, got {got}")
            return args

    def _connected(self):
        import socket

        from ..state import amqpwire as w

        if self._sock is not None:
            return self._sock
        s = socket.create_connection(self.addr, timeout=10)
        self._sock = s
        s.sendall(w.PROTO_HEADER)
        self._expect(w.CONN_START)
        resp = b"\x00" + self.user.encode() + b"\x00" \
            + self.password.encode()
        s.sendall(w.method(0, w.CONN_START_OK,
                           w.table({"product": "rsyslog_ray"})
                           + w.shortstr("PLAIN") + w.longstr(resp)
                           + w.shortstr("en_US")))
        tune = w.Reader(self._expect(w.CONN_TUNE))
        chan_max, frame_max, heartbeat = (tune.u16(), tune.u32(),
                                          tune.u16())
        self._max_frame = frame_max or self._max_frame
        import struct as _s
        s.sendall(w.method(0, w.CONN_TUNE_OK,
                           _s.pack(">HIH", chan_max or 1,
                                   self._max_frame, 0)))
        s.sendall(w.method(0, w.CONN_OPEN,
                           w.shortstr(self.vhost) + w.shortstr("")
                           + b"\x00"))
        self._expect(w.CONN_OPEN_OK)
        s.sendall(w.method(1, w.CH_OPEN, w.shortstr("")))
        self._expect(w.CH_OPEN_OK)
        if self.exchange_type:
            bits = 0x02 if self.durable else 0    # passive|durable|...
            s.sendall(w.method(1, w.EXCH_DECLARE,
                               b"\x00\x00" + w.shortstr(self.exchange)
                               + w.shortstr(self.exchange_type)
                               + bytes([bits]) + w.table()))
            self._expect(w.EXCH_DECLARE_OK)
        return s

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import amqpwire as w

        try:
            s = self._connected()
            out = bytearray()
            max_body = self._max_frame - 8
            for rec in payloads:
                body = self.render(rec).encode()
                rk = (str(rec.get(self.routing_key_field, ""))
                      if self.routing_key_field else self.routing_key)
                out += w.method(1, w.BASIC_PUBLISH,
                                b"\x00\x00" + w.shortstr(self.exchange)
                                + w.shortstr(rk) + b"\x00")
                out += w.content_header(1, len(body),
                                        self.content_type,
                                        self.delivery_mode)
                for off in range(0, len(body) or 1, max_body):
                    out += w.frame(w.FRAME_BODY, 1,
                                   body[off:off + max_body])
            s.sendall(bytes(out))
            # drain any server-pushed frame (connection.close on a
            # bad publish) without blocking
            import select
            if select.select([s], [], [], 0)[0]:
                self._expect((0, 0))   # any method here is an error
        except (OSError, ConnectionError):
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                self._sock.close()
            finally:
                self._sock = None


# OTLP severity mapping: syslog severity 0..7 -> (severityNumber,
# severityText) — plugins/omotel/omotel.c:498-500 severity_lookup.
OTLP_SEVERITY = ((24, "EMERGENCY"), (23, "ALERT"), (22, "CRITICAL"),
                 (17, "ERROR"), (13, "WARNING"), (11, "NOTICE"),
                 (9, "INFO"), (5, "DEBUG"))


class OtlpTransport:
    """omotel (plugins/omotel) — OpenTelemetry OTLP/HTTP logs export
    over a REAL connection, speaking the public OTLP JSON encoding
    (proto3 JSON mapping of ExportLogsServiceRequest).

    Envelope per otlp_json.c:247-374: ``resourceLogs`` → one resource
    entry (service.name/telemetry.sdk.* attributes, otlp_json.c:270-273,
    plus ``host.name`` promoted to the resource ONLY when every record
    in the batch shares one hostname, otlp_json.c:343-366) →
    ``scopeLogs`` with scope name ``rsyslog.omotel`` → ``logRecords``.
    Per record (otlp_json.c:399-492): ``timeUnixNano`` /
    ``observedTimeUnixNano`` as STRINGS (proto3 fixed64 JSON quirk,
    otlp_json.c:414), ``severityNumber`` + ``severityText`` from the
    syslog-severity lookup (omotel.c:498-500, overridable like
    parse_severity_map omotel.c:969-1045), body ``{"stringValue": msg}``
    and ``log.syslog.{appname,procid,msgid,facility,hostname}``
    attributes (attribute_map renames supported, otlp_json.c:455-485).

    Delivery policy mirrors omotel.c:1740-1760 / omotel_http.c:378-392:
    2xx clears the batch; 408/429/5xx raise into ConnectorSink's
    bounded retry → suspend; any other 4xx means the collector REJECTED
    the payload (RS_RET_DISCARDMSG, omotel_http.c:498) — the whole bulk
    is returned as per-item rejects so it quarantines to the errorfile
    instead of retrying.  ``compression="gzip"`` gzips the body and
    sends Content-Encoding: gzip (omotel.c:1685-1720, 2741)."""

    def __init__(self, host: str, port: int = 4318, path: str = "/v1/logs",
                 compression: str = "none",
                 resource_attributes: dict | None = None,
                 severity_map: dict | None = None,
                 attribute_map: dict | None = None,
                 msg_field: str = "msg", ts_field: str | None = None,
                 hostname_field: str = "hostname",
                 appname_field: str = "appname",
                 procid_field: str = "procid", msgid_field: str = "msgid",
                 facility_field: str = "facility",
                 severity_field: str = "severity",
                 extra_headers: dict | None = None):
        assert compression in ("none", "gzip")
        self.host, self.port, self.path = host, port, path
        self.compression = compression
        self.resource_attributes = resource_attributes or {}
        # severity_map: {syslog_severity: (number, text)} overrides
        self.severity_map = {i: OTLP_SEVERITY[i] for i in range(8)}
        self.severity_map.update(severity_map or {})
        self.attribute_map = attribute_map or {}
        self.fields = dict(msg=msg_field, ts=ts_field, hostname=hostname_field,
                           appname=appname_field, procid=procid_field,
                           msgid=msgid_field, facility=facility_field,
                           severity=severity_field)
        self.extra_headers = extra_headers or {}
        self._conn = None

    def _attr_name(self, logical: str, default: str) -> str:
        return self.attribute_map.get(logical, default)

    @staticmethod
    def _attr(key: str, value) -> dict:
        # add_attribute_entry otlp_json.c:77-118: {"key":k,"value":{T:v}}
        if isinstance(value, bool):
            return {"key": key, "value": {"boolValue": value}}
        if isinstance(value, int):
            return {"key": key, "value": {"intValue": value}}
        if isinstance(value, float):
            return {"key": key, "value": {"doubleValue": value}}
        return {"key": key, "value": {"stringValue": str(value)}}

    @staticmethod
    def _nanos(ts) -> int:
        if ts is None:
            return 0
        if hasattr(ts, "value"):          # pandas Timestamp
            return int(ts.value)
        return int(float(ts) * 1e9)

    def serialize(self, payloads: list[dict]) -> bytes:
        f = self.fields
        res_attrs = [self._attr("service.name", "rsyslog"),
                     self._attr("telemetry.sdk.name", "rsyslog-omotel"),
                     self._attr("telemetry.sdk.language", "python")]
        for k, v in self.resource_attributes.items():
            res_attrs.append(self._attr(k, v))
        hosts = {str(r.get(f["hostname"]) or "") for r in payloads}
        if len(hosts) == 1 and "" not in hosts:     # otlp_json.c:343-366
            res_attrs.append(self._attr("host.name", next(iter(hosts))))
        records = []
        for rec in payloads:
            sev = rec.get(f["severity"])
            num, text = self.severity_map.get(
                int(sev) if sev is not None else 6, (9, "INFO"))
            lr = {"timeUnixNano": str(self._nanos(
                      rec.get(f["ts"]) if f["ts"] else None)),
                  "severityNumber": num, "severityText": text,
                  "body": {"stringValue": str(rec.get(f["msg"], ""))}}
            attrs = []
            for logical, default in (("appname", "log.syslog.appname"),
                                     ("procid", "log.syslog.procid"),
                                     ("msgid", "log.syslog.msgid")):
                v = rec.get(f[logical])
                if v is not None:
                    attrs.append(self._attr(self._attr_name(logical, default),
                                            str(v)))
            fac = rec.get(f["facility"])
            if fac is not None:
                attrs.append(self._attr(
                    self._attr_name("facility", "log.syslog.facility"),
                    int(fac)))
            host = rec.get(f["hostname"])
            if host:                                 # otlp_json.c:488-489
                attrs.append(self._attr(
                    self._attr_name("hostname", "log.syslog.hostname"),
                    str(host)))
            lr["attributes"] = attrs
            records.append(lr)
        return json.dumps({"resourceLogs": [{
            "resource": {"attributes": res_attrs},
            "scopeLogs": [{"scope": {"name": "rsyslog.omotel",
                                     "version": "ray"},
                           "logRecords": records}]}]}).encode()

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=10)
        return self._conn

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        body = self.serialize(payloads)
        headers = {"Content-Type": "application/json"}
        headers.update(self.extra_headers)
        if self.compression == "gzip":
            import gzip
            body = gzip.compress(body)
            headers["Content-Encoding"] = "gzip"
        try:
            c = self._connected()
            c.request("POST", self.path, body=body, headers=headers)
            resp = c.getresponse()
            resp.read()
            status = resp.status
        except OSError:
            self.close()
            raise
        if 200 <= status < 300:
            return []
        if status in (408, 429) or status >= 500:   # omotel_http.c:378-392
            raise ConnectionError(f"omotel HTTP {status} (retryable)")
        # other 4xx: collector rejected the payload — DISCARDMSG
        # (omotel_http.c:498): quarantine the bulk, never retry it.
        return [(i, f"otlp rejected HTTP {status}")
                for i in range(len(payloads))]

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


class CwlHlcTransport:
    """omawslogshlc (plugins/omawslogshlc) — Amazon CloudWatch Logs via
    the HTTP Log Collector endpoint, bearer-token auth, stdlib
    http.client instead of libcurl.

    Wire shape (omawslogshlc.c:198-210, 296-305): POST to
    ``/services/collector/event?logGroup=<enc>&logStream=<enc>`` with
    ``Authorization: Bearer <token>`` and a body of CONCATENATED event
    JSON objects — ``{"event":"...","time":<epoch.6f>,"host":"...",
    "source":"rsyslog"}`` back to back, no array wrapper or separators.
    HLC limits enforced like the reference: 256 KiB max per event
    (c:52-54, over-limit events are dropped as per-item rejects),
    1 MiB max request (flush-and-continue, c:233-248), and a
    ``max_batch_size`` events-per-request cap (default 100, c:407,523).

    Status policy (c:362-388): 2xx ok; 429/5xx AND 401/403 raise into
    bounded retry → suspend (the reference suspends on auth errors too,
    c:380-383, so a rotated token resumes delivery); other 4xx drops
    the batch (resetBatch, c:385-388) — surfaced as per-item rejects."""

    MAX_REQUEST_BYTES = 1024 * 1024        # c:52
    MAX_EVENT_BYTES = 256 * 1024           # c:53

    def __init__(self, host: str, port: int, *, region: str = "local",
                 bearer_token: str, log_group: str, log_stream: str,
                 max_batch_size: int = 100,
                 msg_field: str = "msg", ts_field: str | None = None,
                 hostname_field: str = "hostname"):
        from urllib.parse import quote

        assert 0 < max_batch_size <= 10000   # c:604-606
        self.host, self.port = host, port
        self.region = region
        self.token = bearer_token
        self.path = (f"/services/collector/event"
                     f"?logGroup={quote(log_group, safe='')}"
                     f"&logStream={quote(log_stream, safe='')}")
        self.max_batch = max_batch_size
        self.fields = (msg_field, ts_field, hostname_field)
        self._conn = None

    def _event_json(self, rec: dict) -> bytes:
        msg_f, ts_f, host_f = self.fields
        ts = rec.get(ts_f) if ts_f else None
        secs = (ts.timestamp() if hasattr(ts, "timestamp")
                else float(ts) if ts is not None else 0.0)
        return json.dumps(
            {"event": str(rec.get(msg_f, "")), "time": round(secs, 6),
             "host": str(rec.get(host_f, "")), "source": "rsyslog"}
        ).encode()

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(self.host, self.port,
                                                    timeout=30)
        return self._conn

    def _post(self, body: bytes) -> None:
        try:
            c = self._connected()
            c.request("POST", self.path, body=body, headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.token}",
                "User-Agent": "rsyslog-ray/1.0"})
            resp = c.getresponse()
            resp.read()
            status = resp.status
        except OSError:
            self.close()
            raise
        if 200 <= status < 300:
            return
        if status in (429, 401, 403) or status >= 500:   # c:362-383
            raise ConnectionError(f"awslogshlc HTTP {status} (retryable)")
        raise _CwlDropped(status)                        # c:385-388

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        rejects: list[tuple[int, str]] = []
        buf = bytearray()
        pending: list[int] = []   # payload indices in buf, for drop acct
        for i, rec in enumerate(payloads):
            ev = self._event_json(rec)
            if len(ev) > self.MAX_EVENT_BYTES:           # c:219-230
                rejects.append((i, "event exceeds 256 KiB HLC limit"))
                continue
            if (len(buf) + len(ev) > self.MAX_REQUEST_BYTES
                    or len(pending) >= self.max_batch):  # c:233-248,523
                self._flush(buf, pending, rejects)
            buf += ev
            pending.append(i)
        self._flush(buf, pending, rejects)
        return rejects

    def _flush(self, buf: bytearray, pending: list[int],
               rejects: list[tuple[int, str]]) -> None:
        if not pending:
            return
        try:
            self._post(bytes(buf))
        except _CwlDropped as ex:
            rejects.extend((i, f"awslogshlc dropped HTTP {ex.status}")
                           for i in pending)
        buf.clear()
        pending.clear()

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


class _CwlDropped(Exception):
    def __init__(self, status: int):
        super().__init__(status)
        self.status = status


class AzureDceTransport:
    """omazuredce (plugins/omazuredce) — Azure Monitor Logs-ingestion
    API through a Data Collection Endpoint, with the real OAuth2
    client-credentials flow, stdlib http.client instead of libcurl.

    Auth (omazuredce.c:247-356): POST form-encoded
    ``client_id=…&scope=https%3A%2F%2Fmonitor.azure.com%2F.default&
    client_secret=…&grant_type=client_credentials`` to
    ``/<tenant>/oauth2/v2.0/token`` on the login host
    (login.microsoftonline.com in production, c:275); the JSON
    response's ``access_token`` is cached for the worker.

    Ingest (c:414, 594-601): POST a JSON ARRAY of records to
    ``/dataCollectionRules/<dcr>/streams/<stream>?api-version=2023-01-01``
    on the DCE host with ``Authorization: Bearer`` and optional gzip
    (c:559-560,596).  Status policy (c:618-643): 2xx ok; 401 refreshes
    the token THEN raises so the bounded retry re-sends with the fresh
    token (c:626-634); 408/429/5xx raise (retryable); any other 4xx is
    an IO error — the batch is surfaced as per-item rejects."""

    def __init__(self, dce_host: str, dce_port: int, *,
                 login_host: str | None = None, login_port: int | None = None,
                 tenant_id: str, client_id: str, client_secret: str,
                 dcr_immutable_id: str, stream_name: str,
                 compression: str = "none", render=None):
        assert compression in ("none", "gzip")
        self.dce = (dce_host, dce_port)
        self.login = (login_host or dce_host, login_port or dce_port)
        self.tenant_id = tenant_id
        self.client_id = client_id
        self.client_secret = client_secret
        self.path = (f"/dataCollectionRules/{dcr_immutable_id}"
                     f"/streams/{stream_name}?api-version=2023-01-01")
        self.compression = compression
        self.render = render or (lambda rec: {
            k: (str(v) if not isinstance(v, (int, float, bool, str,
                                             type(None))) else v)
            for k, v in rec.items()})
        self._token: str | None = None
        self._conn = None

    # -- OAuth2 client-credentials (c:247-356) -------------------------
    def _fetch_token(self) -> str:
        import http.client
        from urllib.parse import quote_plus

        body = ("client_id=" + quote_plus(self.client_id)
                + "&scope=" + quote_plus("https://monitor.azure.com/.default")
                + "&client_secret=" + quote_plus(self.client_secret)
                + "&grant_type=client_credentials").encode()
        c = http.client.HTTPConnection(*self.login, timeout=30)
        try:
            c.request("POST", f"/{self.tenant_id}/oauth2/v2.0/token",
                      body=body, headers={
                          "Content-Type":
                              "application/x-www-form-urlencoded"})
            resp = c.getresponse()
            data = resp.read()
            if resp.status != 200:
                raise ConnectionError(
                    f"azuredce token HTTP {resp.status}")
        finally:
            c.close()
        tok = json.loads(data).get("access_token")
        if not tok:                                      # c:356-360
            raise ConnectionError("azuredce: token response missing "
                                  "access_token")
        return tok

    def _connected(self):
        import http.client

        if self._conn is None:
            self._conn = http.client.HTTPConnection(*self.dce, timeout=30)
        return self._conn

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        if self._token is None:
            self._token = self._fetch_token()
        body = json.dumps([self.render(r) for r in payloads],
                          default=str).encode()
        headers = {"Content-Type": "application/json",
                   "Authorization": f"Bearer {self._token}"}
        if self.compression == "gzip":
            import gzip
            body = gzip.compress(body)
            headers["Content-Encoding"] = "gzip"
        try:
            c = self._connected()
            c.request("POST", self.path, body=body, headers=headers)
            resp = c.getresponse()
            resp.read()
            status = resp.status
        except OSError:
            self.close()
            raise
        if 200 <= status < 300:
            return []
        if status == 401:                                # c:626-634
            self._token = self._fetch_token()
            raise ConnectionError("azuredce HTTP 401 (token refreshed, "
                                  "retrying)")
        if status in (408, 429) or status >= 500:        # c:635-639
            raise ConnectionError(f"azuredce HTTP {status} (retryable)")
        return [(i, f"azuredce rejected HTTP {status}")   # c:640-643
                for i in range(len(payloads))]

    def close(self):
        if self._conn is not None:
            try:
                self._conn.close()
            finally:
                self._conn = None


class Amqp1Transport:
    """omamqp1 (contrib/omamqp1/omamqp1.c) over the REAL AMQP 1.0 wire
    (state/amqp1wire.py; the reference links qpid-proton).

    Connection bring-up mirrors the proton reactor's sender path:
    optional SASL layer (header exchange, read sasl-mechanisms, send
    sasl-init with the PLAIN ``\\0user\\0pass`` initial response or
    ANONYMOUS, require sasl-outcome code 0; ``disable_sasl`` skips the
    layer entirely — omamqp1.c:165,429-433 disableSASL), then the AMQP
    layer: header exchange, open (container-id), begin, attach as
    SENDER (role=false) to the configured ``target`` node
    (omamqp1.c:91,158 target param), wait for flow link-credit.

    omamqp1's transaction shape (omamqp1.c:251-303): each committed
    batch is ONE message whose body is an amqp-value LIST of the
    rendered log strings.  Transfers go unsettled (at-least-once) and
    the call blocks until the peer's disposition; a ``rejected``
    outcome or connection error raises into ConnectorSink's bounded
    retry → suspend (the reference requeues the tx on
    PN_DELIVERY remote-state != ACCEPTED)."""

    def __init__(self, host: str, port: int = 5672, *,
                 target: str = "rsyslog_ray",
                 user: str | None = None, password: str | None = None,
                 disable_sasl: bool = False,
                 container: str = "rsyslog_ray", render=None,
                 idle_timeout_s: float = 10.0):
        self.addr = (host, port)
        self.target = target
        self.user = user
        self.password = password
        self.disable_sasl = disable_sasl
        self.container = container
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.timeout = idle_timeout_s
        self._sock = None
        self._max_frame = 65536
        self._credit = 0
        self._next_delivery = 0
        self._settled: set[int] = set()

    # ---- connection state machine -----------------------------------
    def _sasl(self, s):
        from ..state import amqp1wire as w

        s.sendall(w.SASL_HEADER)
        hdr = w.read_exact(s, 8)
        if hdr != w.SASL_HEADER:
            raise ConnectionError(f"amqp1: bad SASL header {hdr!r}")
        ftype, _ch, perf, _ = w.read_frame(s)
        if ftype != w.FRAME_SASL or perf.descriptor != w.SASL_MECHANISMS:
            raise ConnectionError("amqp1: expected sasl-mechanisms")
        mechs = w.field(perf, 0, [])
        mechs = [str(m) for m in (mechs if isinstance(mechs, list)
                                  else [mechs])]
        if self.user is not None and "PLAIN" in mechs:
            init = w.performative(w.SASL_INIT, [
                w.Symbol("PLAIN"),
                w.binary(b"\x00" + self.user.encode()
                         + b"\x00" + (self.password or "").encode()),
                None])
        elif "ANONYMOUS" in mechs:
            init = w.performative(w.SASL_INIT,
                                  [w.Symbol("ANONYMOUS"), None, None])
        else:
            raise ConnectionError(f"amqp1: no usable mechanism in {mechs}")
        s.sendall(w.frame(w.FRAME_SASL, 0, init))
        ftype, _ch, perf, _ = w.read_frame(s)
        if perf.descriptor != w.SASL_OUTCOME or w.field(perf, 0, 1) != 0:
            raise ConnectionError(
                f"amqp1: sasl outcome {w.field(perf, 0, 'missing')}")

    def _handle(self, perf) -> None:
        """Track flow credit and disposition settlement."""
        from ..state import amqp1wire as w

        if perf.descriptor == w.FLOW:
            delivery_count = w.field(perf, 5, 0)
            credit = w.field(perf, 6, 0)
            self._credit = int(delivery_count) + int(credit) \
                - self._next_delivery
        elif perf.descriptor == w.DISPOSITION:
            first = int(w.field(perf, 1, 0))
            last = int(w.field(perf, 2, first))
            state = w.field(perf, 4)
            if (isinstance(state, type(perf))
                    and state.descriptor == w.REJECTED):
                raise ConnectionError("amqp1: delivery rejected by peer")
            self._settled.update(range(first, last + 1))
        elif perf.descriptor == w.CLOSE:
            err = w.field(perf, 0)
            raise ConnectionError(f"amqp1: peer closed: {err}")

    def _pump(self):
        from ..state import amqp1wire as w

        _ft, _ch, perf, _pl = w.read_frame(self._sock)
        if perf is not None:
            self._handle(perf)

    def _connected(self):
        import socket

        from ..state import amqp1wire as w

        if self._sock is not None:
            return self._sock
        s = socket.create_connection(self.addr, timeout=self.timeout)
        try:
            if not self.disable_sasl:
                self._sasl(s)
            s.sendall(w.AMQP_HEADER)
            hdr = w.read_exact(s, 8)
            if hdr != w.AMQP_HEADER:
                raise ConnectionError(f"amqp1: bad AMQP header {hdr!r}")
            s.sendall(w.frame(w.FRAME_AMQP, 0, w.performative(
                w.OPEN, [self.container, self.addr[0],
                         self._max_frame, None])))
            s.sendall(w.frame(w.FRAME_AMQP, 0, w.performative(
                w.BEGIN, [None, 0, 2048, 2048])))
            s.sendall(w.frame(w.FRAME_AMQP, 0, w.performative(
                w.ATTACH, [f"{self.container}-sender", 0, False, 0, 0,
                           w.Described(w.SOURCE, []),
                           w.Described(w.TARGET, [self.target])])))
            self._sock = s
            self._credit = 0
            self._next_delivery = 0
            self._settled = set()
            # drain open/begin/attach echoes until the first flow grant
            seen_attach = False
            while self._credit <= 0:
                _ft, _ch, perf, _pl = w.read_frame(s)
                if perf is None:
                    continue
                if perf.descriptor == w.ATTACH:
                    seen_attach = True
                elif perf.descriptor == w.OPEN:
                    # frames we SEND must fit the peer's max-frame-size
                    peer_max = w.field(perf, 2)
                    if peer_max:
                        self._max_frame = min(self._max_frame,
                                              int(peer_max))
                elif perf.descriptor == w.BEGIN:
                    pass
                else:
                    self._handle(perf)
            if not seen_attach:
                raise ConnectionError("amqp1: peer never attached")
        except BaseException:
            self._sock = None
            s.close()
            raise
        return s

    # ---- sending -----------------------------------------------------
    def _send_message(self, sections: bytes) -> int:
        from ..state import amqp1wire as w

        s = self._sock
        while self._credit <= 0:
            self._pump()
        did = self._next_delivery
        self._next_delivery += 1
        self._credit -= 1
        max_body = self._max_frame - 64
        chunks = [sections[i:i + max_body]
                  for i in range(0, len(sections) or 1, max_body)]
        for i, chunk in enumerate(chunks):
            more = i < len(chunks) - 1
            tr = w.performative(w.TRANSFER, [
                0, did, w.binary(struct_pack_tag(did)), 0, False, more])
            s.sendall(w.frame(w.FRAME_AMQP, 0, tr, chunk))
        return did

    def _await_settled(self, deliveries: list[int]) -> None:
        while not all(d in self._settled for d in deliveries):
            self._pump()

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import amqp1wire as w

        try:
            self._connected()
            body = [str(self.render(rec)) for rec in payloads]
            did = self._send_message(w.message(body))
            self._await_settled([did])
        except (OSError, ConnectionError):
            self.close()
            raise
        return []

    def close(self):
        if self._sock is not None:
            try:
                from ..state import amqp1wire as w

                self._sock.sendall(
                    w.frame(w.FRAME_AMQP, 0, w.performative(w.CLOSE, [])))
            except OSError:
                pass
            try:
                self._sock.close()
            finally:
                self._sock = None


def struct_pack_tag(did: int) -> bytes:
    import struct as _s

    return _s.pack(">I", did)


class EventHubsTransport(Amqp1Transport):
    """omazureeventhubs (plugins/omazureeventhubs/omazureeventhubs.c)
    — Azure Event Hubs over the same AMQP 1.0 wire, SASL PLAIN with the
    shared-access key name/key as user/password
    (omazureeventhubs.c:423-429 pn_sasl_allowed_mechs "PLAIN").

    Unlike omamqp1's one-message-per-batch list body, each row becomes
    its own message (proton_encode_message c:297-339): properties
    section with a per-message string message-id and content-type
    ``application/octet-stream`` (c:305-315), optional string→string
    application-properties (eventProperties c:313-327), and the
    rendered payload as a binary DATA section (c:329-332,
    pn_message_set_inferred).  All transfers in the bulk are sent
    pipelined, then the call blocks until every disposition arrives."""

    def __init__(self, host: str, port: int = 5672, *,
                 amqp_address: str, key_name: str, key: str,
                 event_properties: dict | None = None,
                 msgid_field: str | None = None,
                 container: str = "rsyslog_ray", render=None,
                 clock=None, idle_timeout_s: float = 10.0):
        super().__init__(host, port, target=amqp_address, user=key_name,
                         password=key, container=container, render=render,
                         idle_timeout_s=idle_timeout_s)
        self.event_properties = event_properties or {}
        self.msgid_field = msgid_field
        self._clock = clock or (lambda: int(time.time() * 1000))
        self._msg_seq = 0

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import amqp1wire as w

        try:
            self._connected()
            dids = []
            for rec in payloads:
                if self.msgid_field:
                    msg_id = str(rec.get(self.msgid_field))
                else:
                    msg_id = f"{self.container}-{self._msg_seq}"
                    self._msg_seq += 1
                sections = w.message(
                    data=str(self.render(rec)).encode(),
                    message_id=msg_id,
                    content_type="application/octet-stream",
                    creation_time_ms=self._clock(),
                    app_properties=self.event_properties or None)
                dids.append(self._send_message(sections))
            self._await_settled(dids)
        except (OSError, ConnectionError):
            self.close()
            raise
        return []


class TclTransport:
    """omtcl (contrib/omtcl/omtcl.c) — invoke a Tcl procedure for every
    message, in a REAL Tcl interpreter.  The reference embeds libtcl
    (Tcl_CreateInterp, Tcl_EvalFile on the script, then per message
    Tcl_EvalObjv ``<proc> <rendered>``, omtcl.c:100-108,131); here ONE
    persistent ``tclsh`` child per actor sources the same script and a
    driver loop applies the proc per message.  Messages cross the pipe
    base64-encoded so Tcl quoting/newlines can't corrupt the call; a
    TCL_OK call answers ``OK``, a TCL_ERROR answers ``ERR <result>`` —
    surfaced as a per-item reject (the reference maps it to
    RS_RET_ERR, omtcl.c:104-106)."""

    DRIVER = (
        'fconfigure stdout -buffering line\n'
        'if {[catch {source $::env(OMTCL_SCRIPT)} serr]} {\n'
        '    puts "FAILSOURCE $serr"\n'
        '    exit 1\n'
        '}\n'
        'set omtcl_proc $::env(OMTCL_PROC)\n'
        'puts READY\n'
        'while {[gets stdin line] >= 0} {\n'
        '    set msg [encoding convertfrom utf-8 '
        '[binary decode base64 $line]]\n'
        '    if {[catch {$omtcl_proc $msg} err]} {\n'
        '        puts "ERR $err"\n'
        '    } else {\n'
        '        puts OK\n'
        '    }\n'
        '}\n')

    def __init__(self, script_file: str, proc_name: str, render=None,
                 tclsh: str = "tclsh"):
        self.script_file = script_file
        self.proc_name = proc_name
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.tclsh = tclsh
        self._proc = None

    def _spawned(self):
        import subprocess

        if self._proc is None or self._proc.poll() is not None:
            env = dict(os.environ, OMTCL_SCRIPT=self.script_file,
                       OMTCL_PROC=self.proc_name)
            self._proc = subprocess.Popen(
                [self.tclsh], stdin=subprocess.PIPE,
                stdout=subprocess.PIPE, env=env, text=True)
            self._proc.stdin.write(self.DRIVER)
            self._proc.stdin.flush()
            if self._proc.stdout.readline().strip() != "READY":
                raise ConnectionError(
                    "omtcl: script failed to source "
                    f"({self.script_file})")
        return self._proc

    def _kill(self):
        if self._proc is not None:
            try:
                self._proc.kill()
            except OSError:
                pass
            self._proc = None

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        import base64

        rejects: list[tuple[int, str]] = []
        try:
            p = self._spawned()
            for i, rec in enumerate(payloads):
                line = base64.b64encode(
                    str(self.render(rec)).encode()).decode()
                p.stdin.write(line + "\n")
                p.stdin.flush()
                resp = p.stdout.readline().strip()
                if not resp:
                    raise ConnectionError("omtcl: interpreter died")
                if resp != "OK":
                    rejects.append((i, resp))
        except (BrokenPipeError, OSError, ConnectionError):
            self._kill()
            raise
        return rejects

    def close(self):
        if self._proc is not None:
            try:
                self._proc.stdin.close()
                self._proc.wait(timeout=5)
            except Exception:
                self._kill()
            self._proc = None


class StdoutTransport:
    """omstdout (plugins/omstdout/omstdout.c) — write each rendered
    message to stdout (a test/debug driver in the reference too).
    ``ensure_lf`` mirrors ensureLFEnding: append \\n when missing."""

    def __init__(self, render=None, ensure_lf: bool = True, stream=None):
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.ensure_lf = ensure_lf
        self.stream = stream

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        import sys

        out = self.stream or sys.stdout
        for rec in payloads:
            s = str(self.render(rec))
            if self.ensure_lf and not s.endswith("\n"):
                s += "\n"
            out.write(s)
        out.flush()
        return []


class Beep3195Transport:
    """RFC 3195 relay (sender) side of im3195.  The reference has no
    om3195 — its relay half lives inside liblogging (the library
    plugins/im3195/im3195.c links); the wire is public and shared with
    the listener via ``state/beepwire.py``: BEEP framing (RFC 3080),
    TCP SEQ flow control (RFC 3081), syslog RAW profile (RFC 3195 §3).

    Handshake once per actor (lazy, like every transport here):
    exchange greetings on channel 0, ``<start>`` a channel with the
    RAW profile URI, await the listener's banner MSG that opens the
    one-to-many exchange.  Each payload is delivered as one ANS reply
    to that MSG.  Outbound frames honor the peer's advertised SEQ
    window — a full window blocks until the listener extends it
    (counted in ``window_stalls``) — and fragment with ``more='*'``
    when the message exceeds the window or ``max_frame``.  Socket
    errors tear the session down and re-raise so ConnectorSink's
    bounded retry reopens and resends the bulk.  ``close()`` ends the
    exchange with NUL and a channel-0 ``<close>``."""

    RAW_CHANNEL = 1

    def __init__(self, host: str, port: int, render=None,
                 max_frame: int = 4096):
        self.addr = (host, port)
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.max_frame = max_frame
        self.window_stalls = 0
        self._sock = None
        self._reader = None
        self._ansno = 0
        self._ch0_msgno = 0
        self._banner_msgno = 0
        self._out_seq = {}
        self._win = {}

    # -- frame plumbing ------------------------------------------------
    def _next_data(self):
        """Next data frame; SEQ frames update window state in passing."""
        while True:
            fr = self._reader.read_frame()
            if fr[0] == "SEQ":
                _, ch, ackno, window = fr
                self._win[ch] = (ackno, window)
                continue
            return fr

    def _await_seq(self, channel: int) -> None:
        from ..state import beepwire as bw

        while True:
            fr = self._reader.read_frame()
            if fr[0] != "SEQ":
                raise bw.BeepProtocolError(
                    f"expected SEQ while window-blocked, got {fr[0]}")
            self._win[fr[1]] = (fr[2], fr[3])
            if fr[1] == channel:
                return

    def _send(self, kw: str, channel: int, msgno: int, payload: bytes,
              ansno: int | None = None) -> None:
        from ..state import beepwire as bw

        if not payload:
            self._sock.sendall(bw.data_frame(
                kw, channel, msgno, self._out_seq[channel], b"",
                ansno=ansno))
            return
        off, total = 0, len(payload)
        while off < total:
            ackno, window = self._win[channel]
            avail = min(ackno + window - self._out_seq[channel],
                        self.max_frame)
            if avail <= 0:
                self.window_stalls += 1
                self._await_seq(channel)
                continue
            chunk = payload[off:off + avail]
            more = off + len(chunk) < total
            self._sock.sendall(bw.data_frame(
                kw, channel, msgno, self._out_seq[channel], chunk,
                more=more, ansno=ansno))
            self._out_seq[channel] += len(chunk)
            off += len(chunk)

    # -- session -------------------------------------------------------
    def _connected(self):
        import socket

        from ..state import beepwire as bw

        if self._sock is not None:
            return self._sock
        s = socket.create_connection(self.addr, timeout=10)
        self._sock = s
        self._reader = bw.FrameReader(s)
        self._out_seq = {0: 0, self.RAW_CHANNEL: 0}
        # RFC 3081 §3.1.4: every channel starts with a 4096-octet window
        self._win = {0: (0, bw.DEFAULT_WINDOW),
                     self.RAW_CHANNEL: (0, bw.DEFAULT_WINDOW)}
        self._ansno = 0
        self._send("RPY", 0, 0, bw.greeting_xml())
        fr = self._next_data()          # listener greeting
        if fr[0] != "RPY" or fr[1] != 0 or \
                bw.RAW_PROFILE_URI not in bw.parse_profiles(fr[5]):
            raise ConnectionError("3195: peer does not offer RAW profile")
        self._ch0_msgno = 1
        self._send("MSG", 0, self._ch0_msgno,
                   bw.start_xml(self.RAW_CHANNEL, bw.RAW_PROFILE_URI))
        fr = self._next_data()          # <profile> confirmation
        if fr[0] != "RPY" or \
                bw.RAW_PROFILE_URI not in bw.parse_profiles(fr[5]):
            raise ConnectionError("3195: channel start refused")
        fr = self._next_data()          # the listener's banner MSG
        if fr[0] != "MSG" or fr[1] != self.RAW_CHANNEL:
            raise ConnectionError("3195: no listener banner MSG")
        self._banner_msgno = fr[2]
        return s

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        from ..state import beepwire as bw

        try:
            self._connected()
            for rec in payloads:
                self._send("ANS", self.RAW_CHANNEL, self._banner_msgno,
                           bw.mime_wrap(self.render(rec).encode()),
                           ansno=self._ansno)
                self._ansno += 1
        except (OSError, ConnectionError):
            self._abort()
            raise
        return []

    def close(self):
        from ..state import beepwire as bw

        if self._sock is None:
            return
        try:
            self._send("NUL", self.RAW_CHANNEL, self._banner_msgno, b"")
            self._ch0_msgno += 1
            self._send("MSG", 0, self._ch0_msgno, bw.close_xml())
            self._sock.settimeout(2)
            self._next_data()           # RPY <ok />
        except (OSError, ConnectionError):
            pass
        finally:
            self._abort()

    def _abort(self):
        if self._sock is not None:
            try:
                self._sock.close()
            except OSError:
                pass
        self._sock = None
        self._reader = None


class ShellTransport:
    """omshell (tools/omshell.c:105-110): fork/exec the configured
    program once PER MESSAGE with the rendered message as its single
    argument — ``execProg(progName, 1, msg)``.  Unlike omprog /
    mmexternal (one long-lived child with a pipe protocol), there is
    no session: every message is an independent process.  A nonzero
    exit or spawn failure is a per-item reject (the reference logs
    'Executing program failed' and moves on)."""

    def __init__(self, prog: str, render=None, timeout: float = 10.0):
        self.prog = prog
        self.render = render or (lambda rec: json.dumps(rec, default=str))
        self.timeout = timeout

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        import subprocess

        rejects: list[tuple[int, str]] = []
        for i, rec in enumerate(payloads):
            msg = str(self.render(rec))
            try:
                r = subprocess.run([self.prog, msg], timeout=self.timeout,
                                   capture_output=True)
                if r.returncode != 0:
                    rejects.append((i, f"exit {r.returncode}"))
            except (OSError, subprocess.TimeoutExpired) as ex:
                rejects.append((i, f"spawn: {ex}"))
        return rejects


class UsrMsgTransport:
    """omusrmsg (tools/omusrmsg.c) — wall-style terminal delivery:
    walk the utmp login records (the public glibc struct layout,
    ``state/utmpwire.py``), pick sessions per the reference's rules
    (skip empty users, non-USER_PROCESS types and the 'LOGIN'
    paranoia entry — omusrmsg.c:414-421; ``users=None`` is wall mode,
    else only the named users, first-32-bytes compare :427-433), and
    write the rendered message to ``<dev_root>/<ut_line>`` opened
    O_WRONLY|O_NOCTTY|O_NONBLOCK — an unwritable or blocked terminal
    is skipped, never stalls delivery (sendwallmsg :280-316).

    The wall banner is the TEMPLATE's job in the reference (WallFmt),
    so ``render`` owns it here too."""

    def __init__(self, users: list[str] | None = None,
                 utmp_path: str = "/var/run/utmp",
                 dev_root: str = "/dev", render=None):
        self.users = None if users is None else [u[:32] for u in users]
        self.utmp_path = utmp_path
        self.dev_root = dev_root
        self.render = render or (lambda rec: json.dumps(rec, default=str))

    def _ttys(self) -> list[str]:
        from ..state.utmpwire import USER_PROCESS, parse_utmp

        try:
            with open(self.utmp_path, "rb") as fh:
                entries = parse_utmp(fh.read())
        except OSError:
            return []
        ttys = []
        for e in entries:
            if not e.ut_user or e.ut_type != USER_PROCESS:
                continue
            if e.ut_user == "LOGIN":          # omusrmsg.c:420 paranoia
                continue
            if self.users is not None and \
                    e.ut_user[:32] not in self.users:
                continue
            ttys.append(e.ut_line)
        return ttys

    def _write_tty(self, line: str, data: bytes) -> None:
        import os
        import stat

        path = os.path.join(self.dev_root, line)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_NOCTTY | os.O_NONBLOCK)
        except OSError:
            return
        try:
            st = os.fstat(fd)
            if st.st_mode & stat.S_IWRITE:
                try:
                    os.write(fd, data)
                except (BlockingIOError, OSError):
                    pass              # blocked terminal: drop, don't stall
        finally:
            os.close(fd)

    def __call__(self, payloads: list[dict]) -> list[tuple[int, str]]:
        for rec in payloads:
            data = str(self.render(rec)).encode()
            for line in self._ttys():
                self._write_tty(line, data)
        return []


def libdbi_transport(driver: str, **kw):
    """omlibdbi (plugins/omlibdbi/omlibdbi.c): generic DB output whose
    ``driver`` param selects the wire implementation (dbiDrvrName —
    the reference delegates to libdbi's driver plugins).  Here the
    drivers ARE the real-wire transports this module already ships;
    the templated-statement rendering they share is the omlibdbi
    doAction shape."""
    drivers = {"mysql": MySqlTransport, "pgsql": PgWireTransport,
               "clickhouse": ClickHouseTransport, "mongodb": MongoTransport}
    if driver not in drivers:
        raise ValueError(f"omlibdbi: unknown driver {driver!r} "
                         f"(have {sorted(drivers)})")
    return drivers[driver](**kw)
