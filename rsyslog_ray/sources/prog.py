"""improg analog — run a program, its stdout lines become records.

Reference: contrib/improg/improg.c — the child's stdout is read
line-by-line into messages (c:380-400); with ``confirm_messages`` the
engine writes ``ACK\\n`` to the child's stdin after every consumed
line (c:394-396), which lets the program pace itself against the
pipeline (the reference's flow-control mode).  Bounded batch capture
like every source here: stop at EOF or ``max_records``; on close the
child gets ``close_signal`` then SIGKILL after ``close_timeout_s``
(c:137-141 signalOnClose/closeTimeout/killUnresponsive)."""

from __future__ import annotations

import pandas as pd


class ProgCapture:
    def __init__(self, argv: list[str], confirm_messages: bool = False,
                 close_signal: int | None = None,
                 close_timeout_s: float = 5.0):
        self.argv = list(argv)
        self.confirm_messages = confirm_messages
        self.close_signal = close_signal
        self.close_timeout_s = close_timeout_s
        self._proc = None

    def capture(self, max_records: int = 1_000_000):
        import subprocess

        import ray.data

        self._proc = subprocess.Popen(
            self.argv, stdout=subprocess.PIPE,
            stdin=subprocess.PIPE if self.confirm_messages else None,
            text=True, bufsize=1)
        rows = []
        try:
            for line in self._proc.stdout:
                rows.append(line.rstrip("\n"))
                if self.confirm_messages:
                    self._proc.stdin.write("ACK\n")
                    self._proc.stdin.flush()
                if len(rows) >= max_records:
                    break
        finally:
            self.close()
        return ray.data.from_pandas(pd.DataFrame(
            {"record": rows, "seq": range(len(rows))}))

    def close(self):
        import signal
        import subprocess

        if self._proc is None:
            return
        p, self._proc = self._proc, None
        if p.poll() is None:
            p.send_signal(self.close_signal or signal.SIGTERM)
            try:
                p.wait(timeout=self.close_timeout_s)
            except subprocess.TimeoutExpired:
                p.kill()                 # killUnresponsive
                p.wait()
        for fh in (p.stdout, p.stdin):
            if fh:
                fh.close()
