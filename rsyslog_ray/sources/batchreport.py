"""imbatchreport analog — whole-file-as-one-message batch reports.

Reference: contrib/imbatchreport/imbatchreport.c.  Each globbed file
becomes ONE record: the body is the file content with LF rendered as
literal ``\\n`` (c:335-342, trailing spaces before it dropped) and —
with ``dedup_space`` — runs of space/tab reduced to one (c:330-334);
a trailing ``[structured data]`` block is lifted out (c:245-305, LFs
inside removed), with ``timestamp_key`` digits overriding the file
ctime and ``program_key`` naming the emitting program.  Completion is
managed through the FILENAME: on success the part of the path matched
by the action regex is replaced with the ``sent`` suffix (or the file
is deleted); too-large / unreadable files get the ``reject`` suffix
and the body ``File too large : <path>`` (c:85,355-360,432-436) — so
a crashed run simply re-globs whatever never got renamed, the same
at-least-once contract as the reference's poll loop."""

from __future__ import annotations

import glob as _glob
import os
import re

import pandas as pd

FILE_TOO_LARGE = "File too large : "


class BatchReportCapture:
    def __init__(self, reports_glob: str, *, action: str = "rename",
                 regex: str = r"\.ok$", sent: str = ".sent",
                 reject: str = ".rejected", dedup_space: bool = True,
                 max_msg_size: int = 128 * 1024,
                 program_key: str | None = None,
                 timestamp_key: str | None = None):
        assert action in ("rename", "delete")
        self.reports_glob = reports_glob
        self.action = action
        self.regex = re.compile(regex)
        self.sent = sent
        self.reject = reject
        self.dedup_space = dedup_space
        self.max_msg_size = max_msg_size
        self.program_key = program_key
        self.timestamp_key = timestamp_key

    def _body(self, raw: bytes) -> tuple[str, bool]:
        """The c:326-350 char walk; returns (body, too_large)."""
        out = []
        n = 0
        last_space = False
        for b in raw:
            if n >= self.max_msg_size:
                return "".join(out), True
            c = chr(b)
            if c in (" ", "\t"):
                if not last_space:
                    out.append(" ")
                    n += 1
                last_space = self.dedup_space
            elif c == "\n":
                if last_space:
                    out.pop()
                    n -= 1
                out.append("\\n")
                n += 2
                last_space = False
            else:
                out.append(c)
                n += 1
                last_space = False
        return "".join(out), False

    def _split_sd(self, raw: bytes) -> tuple[bytes, str, str | None,
                                             int | None]:
        """Lift the trailing [structured data] block (c:245-305);
        returns (body bytes, sd, program, epoch)."""
        # trailing whitespace always trims (c:262 shrinks file_len
        # during the scan whether or not an SD block follows)
        trimmed = raw.rstrip(b" \t\n")
        if not trimmed.endswith(b"]"):
            return trimmed, "-", None, None
        at = trimmed.rfind(b"[")
        if at < 0:
            return trimmed, "-", None, None
        sd = trimmed[at:].replace(b"\n", b"").decode("utf-8", "replace")
        body = trimmed[:at].rstrip(b" \t\n")
        prog = epoch = None
        if self.program_key:
            m = re.search(re.escape(self.program_key) + r'([^"]*)"?',
                          sd)
            if m:
                prog = m.group(1)
        if self.timestamp_key:
            m = re.search(re.escape(self.timestamp_key) + r"(\d+)", sd)
            if m:
                epoch = int(m.group(1))
        return body, sd, prog, epoch

    def _finish(self, path: str, ok: bool):
        m = self.regex.search(path)
        if m is None:
            raise RuntimeError(           # c:405-408 must_stop
                f"imbatchreport: action regex does not match {path!r}; "
                "stopping — the file could never leave the glob scope")
        if ok and self.action == "delete":
            os.unlink(path)
            return None
        new = path[:m.start()] + (self.sent if ok else self.reject)
        os.rename(path, new)
        return new

    def capture(self):
        import ray.data

        rows = {"msg": [], "structured_data": [], "program": [],
                "ts": [], "path": [], "ok": []}
        for path in sorted(_glob.glob(self.reports_glob)):
            if not os.path.isfile(path):
                continue
            st = os.stat(path)
            with open(path, "rb") as fh:
                raw = fh.read()
            body_bytes, sd, prog, epoch = self._split_sd(raw)
            body, too_large = self._body(body_bytes)
            if too_large:
                body = FILE_TOO_LARGE + path
            rows["msg"].append(body)
            rows["structured_data"].append(sd)
            rows["program"].append(prog)
            rows["ts"].append(pd.Timestamp(
                epoch if epoch is not None else int(st.st_ctime),
                unit="s"))
            rows["path"].append(path)
            rows["ok"].append(not too_large)
            self._finish(path, ok=not too_large)
        return ray.data.from_pandas(pd.DataFrame(rows))
