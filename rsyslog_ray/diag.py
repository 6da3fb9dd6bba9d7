"""imdiag analog — the reference testbench's live TCP control channel
(plugins/imdiag/imdiag.c).

The reference runs a TCP listener inside the daemon that the testbench
drives with newline commands: inject synthetic messages, read the main
queue depth, and block until the queues drain or a lookup table
reload lands.  Here the same wire surface fronts a batch engine: the
"main queue" is the server's pending-injection buffer, and the engine
consumes it with ``drain()`` (typically feeding a Rulebase /
Dataset pass) — ``waitmainqueueempty`` unblocks once consumers have
taken everything, with the reference's check-empty-multiple-times
guard against races (imdiag.c:394-420, the issue-688 fix).

Commands (OnMsgReceived dispatch, imdiag.c:672-695):

- ``getmainmsgqueuesize``            -> ``<n>\\n``
- ``injectmsg <from> <count> [delay-ms]`` -> ``<count> messages injected\\n``
  (messages are the reference's exact numeric-suffix shape,
  doInjectNumericSuffixMsg c:293-304:
  ``<167>Mar  1 01:00:00 192.0.2.8 tag msgnum:%8.8d:``)
- ``injectmsg literal <raw>``        -> one verbatim message
- ``waitmainqueueempty``             -> ``OK\\n`` when drained
- ``awaitlookuptablereload``         -> ``OK\\n`` when a registered
  ReloadableLookup's version advances past its value at command time
  (c:177-205 awaitLookupTableReload)
- anything else                      -> ``error: unknown command\\n``
"""

from __future__ import annotations

import socket
import threading
import time

# RFC 5737 TEST-NET-1 hostname the reference stamps on generated
# messages (imdiag.c:289 diagDefaultHostname)
DIAG_HOSTNAME = "192.0.2.8"


def numeric_suffix_msg(num: int) -> str:
    """doInjectNumericSuffixMsg (imdiag.c:296-301): the testbench's
    canonical message — local4.debug PRI, fixed legacy timestamp,
    zero-padded 8-digit msgnum."""
    return f"<167>Mar  1 01:00:00 {DIAG_HOSTNAME} tag msgnum:{num:08d}:"


class DiagServer:
    """Bounded imdiag control server.  ``start()`` spawns the accept
    loop (a control channel, not a data path — the daemon-shaped
    exception the reference itself is); ``drain()`` is the engine-side
    consumer that empties the inject queue."""

    def __init__(self, bind_host: str = "127.0.0.1", port: int = 0,
                 lookup=None, empty_checks: int = 3):
        self._srv = socket.socket()
        self._srv.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._srv.bind((bind_host, port))
        self._srv.listen(8)
        self.port = self._srv.getsockname()[1]
        self._queue: list[str] = []
        self._cond = threading.Condition()
        self._lookup = lookup          # ReloadableLookup, optional
        self._empty_checks = empty_checks
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    # -- engine side ----------------------------------------------------
    def drain(self) -> list[str]:
        """Take every pending injected message (the engine's read step;
        analog of the core pulling from the main queue)."""
        with self._cond:
            msgs, self._queue = self._queue, []
            self._cond.notify_all()
        return msgs

    def queue_size(self) -> int:
        with self._cond:
            return len(self._queue)

    # -- control side ---------------------------------------------------
    def start(self) -> "DiagServer":
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()
        return self

    def close(self) -> None:
        self._stop.set()
        try:
            self._srv.close()
        except OSError:
            pass

    def _serve(self) -> None:
        while not self._stop.is_set():
            try:
                conn, _ = self._srv.accept()
            except OSError:
                return
            threading.Thread(target=self._session, args=(conn,),
                             daemon=True).start()

    def _session(self, conn: socket.socket) -> None:
        buf = b""
        with conn:
            while not self._stop.is_set():
                try:
                    data = conn.recv(4096)
                except OSError:
                    return
                if not data:
                    return
                buf += data
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    resp = self._dispatch(line.decode(errors="replace")
                                          .strip())
                    try:
                        conn.sendall(resp.encode())
                    except OSError:
                        return

    def _dispatch(self, line: str) -> str:
        words = line.split()
        cmd = words[0].lower() if words else ""
        if cmd == "getmainmsgqueuesize":
            return f"{self.queue_size()}\n"
        if cmd == "injectmsg":
            return self._injectmsg(line, words[1:])
        if cmd == "waitmainqueueempty":
            return self._wait_empty()
        if cmd == "awaitlookuptablereload":
            return self._await_reload()
        return "error: unknown command\n"

    def _injectmsg(self, line: str, args: list[str]) -> str:
        if args and args[0].lower() == "literal":
            # everything after "injectmsg literal " verbatim (c:352-356)
            raw = line.split(None, 2)[2] if len(line.split(None, 2)) > 2 \
                else ""
            with self._cond:
                self._queue.append(raw)
            return "1 messages injected\n"
        try:
            frm, count = int(args[0]), int(args[1])
            delay_ms = int(args[2]) if len(args) > 2 else 0
            if delay_ms < 0:
                raise ValueError
        except (IndexError, ValueError):
            return "error: invalid injectmsg arguments\n"
        for i in range(count):
            with self._cond:
                self._queue.append(numeric_suffix_msg(frm + i))
            if delay_ms and i + 1 < count:
                time.sleep(delay_ms / 1000)
        return f"{count} messages injected\n"

    def _wait_empty(self) -> str:
        # require the queue to read empty several times in succession
        # (imdiag.c:394-420: a single zero read can be a race)
        nempty = 0
        while nempty < self._empty_checks:
            with self._cond:
                if not self._queue:
                    nempty += 1
                else:
                    nempty = 0
                    self._cond.wait(timeout=0.5)
            if nempty:
                time.sleep(0.001)
        return "OK\n"

    def _await_reload(self) -> str:
        if self._lookup is None:
            return "error: no lookup table registered\n"
        base = self._lookup.version()
        while self._lookup.version() <= base:
            time.sleep(0.02)
        return "OK\n"
