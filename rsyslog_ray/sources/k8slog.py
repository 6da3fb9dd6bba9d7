"""imkubernetes analog — Kubernetes pod/container log files.

Reference: contrib/imkubernetes/imkubernetes.c.  The reference tails
``/var/log/pods/<namespace>_<pod>_<uid>/<container>/<restart>.log``,
parses each line as a CRI record (``<rfc3339-ts> stdout|stderr P|F
<log>``, parseCriLine c:1152-1182), falling back to the legacy Docker
json-file shape (``{"log": ..., "stream": ..., "time": ...}``,
parseDockerJsonLine c:1184-1239) and finally to a raw line flagged
``parse_error`` (processLine c:1240-1274).  CRI ``P`` fragments
accumulate until their closing ``F`` record (emitPartialIfComplete
c:1104-1151): a stream flip discards the open partial, the closing
fragment is appended to the buffer and the logical record carries the
PARTIAL's timestamp/stream, and the accumulator is bounded — in
truncate mode at ``max_msg_size``, otherwise at 10× that hard limit
(getPartialMessageLimit c:328-343, CRI_PARTIAL_HARD_LIMIT_FACTOR) with
later fragments consumed-but-dropped until the closing ``F`` flushes.

Ray mapping: each log FILE decodes independently (the per-file state
machine is inherently sequential; parallelism is per file), so
``read_pod_logs`` is ``read_binary_files → map_batches`` with zero
driver-side parsing.  Pod-metadata enrichment composes with
``stages.enrich.KubernetesEnrichStage`` (the mmkubernetes actor pool)
on the emitted ``namespace_name``/``pod_name`` columns — the
reference's queryPodMetadata (c:812-900) is the same apiserver GET
that stage already speaks.  ``K8sLogFileState`` keeps the offset /
inode / freshStartTail tailing contract (processFileState c:1276-1330)
for long-lived incremental use.
"""

from __future__ import annotations

import json
import os
import re

import pandas as pd

# enqMsg defaults (c:75-76, 1081-1082): facility user, severity info;
# stderr records escalate to err
DFLT_FACILITY = 1
DFLT_SEVERITY = 6
STDERR_SEVERITY = 3
HARD_LIMIT_FACTOR = 10
TAG = "kubernetes:"

_POD_PATH_RE = re.compile(
    r"/pods/(?P<ns>[^/_]+)_(?P<pod>[^/_]+)_(?P<uid>[^/]+)/"
    r"(?P<container>[^/]+)/(?P<restart>\d+)\.log$")


def parse_pod_log_path(path: str) -> dict | None:
    """parsePodsPath (c:420-497): the ``pods`` directory component is
    mandatory, the pod dir splits on the first two underscores into
    namespace/pod/uid, and the file stem must be a numeric restart
    count."""
    m = _POD_PATH_RE.search(path)
    if m is None:
        return None
    return {"namespace_name": m.group("ns"), "pod_name": m.group("pod"),
            "pod_uid": m.group("uid"),
            "container_name": m.group("container"),
            "restart_count": int(m.group("restart"))}


def _parse_ts(ts: str):
    try:
        t = pd.Timestamp(ts)
    except (ValueError, TypeError):
        return None
    if t is pd.NaT or t.tzinfo is None:   # RFC3339 requires an offset
        return None
    return t.tz_convert("UTC")


def parse_cri_line(line: str) -> dict | None:
    """parseCriLine (c:1152-1182): ``<ts> <stream(6 chars)> <P|F>
    <log>``; the stream token must be exactly stdout/stderr and the
    tag field non-empty."""
    sp1 = line.find(" ")
    if sp1 < 0:
        return None
    sp2 = line.find(" ", sp1 + 1)
    if sp2 < 0:
        return None
    sp3 = line.find(" ", sp2 + 1)
    if sp3 < 0 or sp3 <= sp2 + 1:
        return None
    stream = line[sp1 + 1:sp2]
    if stream not in ("stdout", "stderr"):
        return None
    return {"msg": line[sp3 + 1:], "stream": stream,
            "is_partial": line[sp2 + 1] == "P",
            "timestamp": _parse_ts(line[:sp1]), "format": "cri",
            "parse_error": False}


def parse_docker_json_line(line: str) -> dict | None:
    """parseDockerJsonLine (c:1184-1239): a JSON object with a string
    ``log`` (one trailing LF stripped); ``stream``/``time`` optional."""
    try:
        obj = json.loads(line)
    except ValueError:
        return None
    if not isinstance(obj, dict) or not isinstance(obj.get("log"), str):
        return None
    msg = obj["log"]
    if msg.endswith("\n"):
        msg = msg[:-1]
    stream = "stderr" if obj.get("stream") == "stderr" else "stdout"
    ts = _parse_ts(obj["time"]) if isinstance(obj.get("time"), str) \
        else None
    return {"msg": msg, "stream": stream, "is_partial": False,
            "timestamp": ts, "format": "docker_json",
            "parse_error": False}


class _PartialState:
    """The per-file CRI partial accumulator (partial_msg_t)."""

    __slots__ = ("buf", "n", "stream", "timestamp", "truncated")

    def __init__(self):
        self.buf: list[str] = []
        self.n = 0
        self.stream = ""
        self.timestamp = None
        self.truncated = False

    def active(self) -> bool:
        return self.n > 0 or self.truncated

    def init_from(self, rec: dict) -> None:
        self.stream = rec["stream"]
        self.timestamp = rec["timestamp"]

    def reset(self) -> None:
        self.buf, self.n, self.truncated = [], 0, False

    def append_bounded(self, msg: str, limit: int) -> None:
        take = msg
        if limit > 0:
            room = max(limit - self.n, 0)
            take = msg[:room]
            if len(take) < len(msg):
                self.truncated = True
        if take:
            self.buf.append(take)
            self.n += len(take)


def decode_pod_log(path: str, text: str, *, max_msg_size: int = 8096,
                   oversize_mode: str = "truncate",
                   escape_lf: bool = True,
                   severity: int = DFLT_SEVERITY,
                   facility: int = DFLT_FACILITY) -> list[dict]:
    """Run one file's content through the reference's line machine;
    returns emitted records in order.  ``oversize_mode="truncate"``
    bounds partials at ``max_msg_size``; any other mode uses the 10×
    hard accumulator cap (c:328-343)."""
    meta = parse_pod_log_path(path) or {
        "namespace_name": None, "pod_name": None, "pod_uid": None,
        "container_name": None, "restart_count": -1}
    limit = max_msg_size if oversize_mode == "truncate" \
        else max_msg_size * HARD_LIMIT_FACTOR
    partial = _PartialState()
    out: list[dict] = []

    def emit(msg: str, stream: str, ts, fmt: str, perr: bool,
             trunc: bool) -> None:
        if escape_lf:             # enqMsg c:1067: parser.SanitizeMsg
            msg = msg.replace("\n", "#012")
        out.append({"msg": msg, "timestamp": ts, "stream": stream,
                    "log_format": fmt, "parse_error": perr,
                    "truncated": trunc, "tag": TAG,
                    "facility": facility,
                    "severity": STDERR_SEVERITY if stream == "stderr"
                    else severity, **meta, "log_file": path})

    # getline splits on LF only (c:1311); trimTrailingNewline then
    # drops trailing CR/LF (c:380-384) — Python splitlines() would
    # additionally split on \\r/\\v/\\f, which the reference does not
    for line in text.split("\n"):
        line = line.rstrip("\r")
        if not line:
            continue
        rec = parse_cri_line(line) or parse_docker_json_line(line) or {
            "msg": line, "stream": "stdout", "is_partial": False,
            "timestamp": None, "format": "raw", "parse_error": True}
        # --- emitPartialIfComplete (c:1104-1151) ---------------------
        if not rec["is_partial"] and not partial.active():
            emit(rec["msg"], rec["stream"], rec["timestamp"],
                 rec["format"], rec["parse_error"], False)
            continue
        if rec["is_partial"] and not partial.active():
            partial.init_from(rec)
        if partial.active() and partial.stream != rec["stream"]:
            partial.reset()
            if rec["is_partial"]:
                partial.init_from(rec)
        if rec["is_partial"]:
            partial.append_bounded(rec["msg"], limit)
            continue
        if partial.active():
            partial.append_bounded(rec["msg"], limit)
            emit("".join(partial.buf), partial.stream,
                 partial.timestamp, rec["format"], rec["parse_error"],
                 partial.truncated)
            partial.reset()
            continue
        emit(rec["msg"], rec["stream"], rec["timestamp"],
             rec["format"], rec["parse_error"], False)
    return out


class K8sLogFileState:
    """processFileState (c:1276-1330) for incremental tailing: offset
    and inode per file; rotation (inode change or shrink) resets both
    offset and any open partial; ``fresh_start_tail`` skips a file's
    pre-existing content on first sight."""

    def __init__(self, path: str, *, fresh_start_tail: bool = False,
                 **decode_opts):
        self.path = path
        self.offset = 0
        self.inode = 0
        self.fresh_start_tail = fresh_start_tail
        self.decode_opts = decode_opts

    def poll(self) -> list[dict]:
        try:
            st = os.stat(self.path)
        except OSError:
            return []
        if self.inode and (st.st_ino != self.inode
                           or st.st_size < self.offset):
            self.offset = 0
        self.inode = st.st_ino
        if self.offset == 0 and self.fresh_start_tail and st.st_size:
            self.offset = st.st_size
            return []
        if st.st_size <= self.offset:
            return []
        with open(self.path, "rb") as fh:
            fh.seek(self.offset)
            data = fh.read()
            self.offset = fh.tell()
        return decode_pod_log(self.path,
                              data.decode("utf-8", "replace"),
                              **self.decode_opts)


def read_pod_logs(paths, **decode_opts):
    """Distributed read: one record batch per log file, decoded inside
    map_batches (driver never parses).  ``paths`` is a list of files
    or a glob; columns are the enqMsg/addRuntimeMetadata surface
    (c:976-1102): msg, timestamp, stream, log_format, parse_error,
    truncated, tag, facility, severity, namespace/pod/uid/container,
    restart_count, log_file."""
    import glob as _glob

    import ray.data

    if isinstance(paths, str):
        paths = sorted(_glob.glob(paths, recursive=True))
    ds = ray.data.read_binary_files(paths, include_paths=True)

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        rows: list[dict] = []
        for path, data in zip(batch["path"], batch["bytes"]):
            rows.extend(decode_pod_log(
                path, bytes(data).decode("utf-8", "replace"),
                **decode_opts))
        return pd.DataFrame(rows)

    return ds.map_batches(explode, batch_format="pandas")
