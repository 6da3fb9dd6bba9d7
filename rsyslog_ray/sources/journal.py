"""imjournal analog — systemd Journal Export Format reader.

The container has no libsystemd, but the journal EXPORT format (what
``journalctl -o export`` emits and systemd's docs specify publicly) is
a plain stream: entries separated by an empty line; each field either
``NAME=value\\n`` or, for binary values, ``NAME\\n`` + 64-bit
little-endian length + raw bytes + ``\\n``.  This module parses that
stream and applies imjournal's property mapping
(plugins/imjournal/imjournal.c:595-760 readjournal): MESSAGE -> msg,
PRIORITY -> severity (single digit 0-7, else the NOTICE default),
SYSLOG_FACILITY -> facility (0-23, else the USER default),
SYSLOG_IDENTIFIER/SYSLOG_PID (_PID fallback) -> tag,
_HOSTNAME -> host, __REALTIME_TIMESTAMP (µs) -> ts; every field is
also retained in the ``json`` column (imjournal's $! tree analog).
"""

from __future__ import annotations

import json

import pandas as pd

DFLT_SEVERITY = 5   # LOG_NOTICE (imjournal.c:156)
DFLT_FACILITY = 1   # LOG_USER   (imjournal.c:157)
DFLT_TAG = "journal"


def split_journal_export(data: bytes) -> list[dict]:
    """Parse one export-format stream into a list of field dicts.
    Binary field values decode utf-8 with replacement (the engine's
    column model is text; raw bytes survive length-exactly)."""
    entries: list[dict] = []
    cur: dict = {}
    i, n = 0, len(data)
    while i < n:
        nl = data.find(b"\n", i)
        if nl < 0:
            nl = n
        line = data[i:nl]
        if not line:                         # blank line = entry end
            if cur:
                entries.append(cur)
                cur = {}
            i = nl + 1
            continue
        eq = line.find(b"=")
        if eq >= 0:                          # text field
            cur[line[:eq].decode("utf-8", "replace")] = \
                line[eq + 1:].decode("utf-8", "replace")
            i = nl + 1
        else:                                # binary field
            name = line.decode("utf-8", "replace")
            off = nl + 1
            size = int.from_bytes(data[off:off + 8], "little")
            cur[name] = data[off + 8:off + 8 + size].decode(
                "utf-8", "replace")
            i = off + 8 + size + 1           # skip trailing \n
    if cur:
        entries.append(cur)
    return entries


def entry_to_row(e: dict) -> dict:
    """imjournal readjournal field mapping for ONE entry."""
    sev = DFLT_SEVERITY
    p = e.get("PRIORITY", "")
    if len(p) == 1 and "0" <= p <= "7":
        sev = int(p)
    fac = DFLT_FACILITY
    f = e.get("SYSLOG_FACILITY", "")
    if (1 <= len(f) <= 2 and all("0" <= c <= "9" for c in f)
            and int(f) <= 23):
        fac = int(f)
    ident = e.get("SYSLOG_IDENTIFIER", "")
    pid = e.get("SYSLOG_PID") or e.get("_PID") or ""
    if ident and pid:
        tag = f"{ident}[{pid}]:"
    elif ident:
        tag = ident + ":"
    else:
        tag = DFLT_TAG
    ts_us = e.get("__REALTIME_TIMESTAMP", "")
    ts = (pd.Timestamp(int(ts_us), unit="us")
          if ts_us and all("0" <= c <= "9" for c in ts_us)
          else pd.NaT)
    return {
        "msg": e.get("MESSAGE", ""),
        "pri": fac * 8 + sev,
        "severity": sev,
        "facility": fac,
        "tag": tag,
        "host": e.get("_HOSTNAME", ""),
        "ts": ts,
        "json": json.dumps(e, sort_keys=True, separators=(",", ":")),
    }


def read_journal_export(paths):
    """Dataset of mapped journal rows from export-format files — the
    batch imjournal: each file splits into entries inside one
    vectorized map_batches; schema (msg, pri, severity, facility, tag,
    host, ts, json)."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for data in df["bytes"]:
            rows.extend(entry_to_row(e) for e in split_journal_export(data))
        out = pd.DataFrame(rows, columns=["msg", "pri", "severity",
                                          "facility", "tag", "host",
                                          "ts", "json"])
        return out

    return ds.map_batches(split, batch_format="pandas")
