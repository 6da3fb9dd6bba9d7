"""imklog / imkmsg analog — /dev/kmsg structured-record parser.

The /dev/kmsg record format is public kernel ABI
(Documentation/ABI/testing/dev-kmsg):

    <pri>,<seq>,<monotonic_usec>[,<flags>...];<message>\\n
    [ SUBSYSTEM=...\\n  DEVICE=...\\n ...]        (continuation props)

This mirrors the reference's parser (contrib/imkmsg/kmsg.c
submitSyslog:68-160): digits to the first ',' = priority
(facility*8+severity), digits to the next ',' = sequence number,
digits then skip-to-';' = monotonic microseconds, message to newline,
then space-prefixed KEY=value property lines.  The reference converts
the monotonic stamp with boot time (kmsg.c:165-173); the batch analog
takes ``boot_epoch_us`` (epoch µs of boot) and yields NaT without it.
"""

from __future__ import annotations

import json

import pandas as pd


def parse_kmsg_record(rec: str) -> dict | None:
    """One record (message line + optional continuation lines already
    joined with \\n) -> field dict, or None for a malformed record
    (the reference silently drops those)."""
    i, n = 0, len(rec)
    pri = 0
    j = i
    while j < n and "0" <= rec[j] <= "9":
        pri = pri * 10 + int(rec[j])
        j += 1
    if j >= n or rec[j] != "," or j == i:
        return None
    i = j + 1
    seq = 0
    j = i
    while j < n and "0" <= rec[j] <= "9":
        seq = seq * 10 + int(rec[j])
        j += 1
    if j >= n or rec[j] != ",":
        return None
    i = j + 1
    ts = 0
    j = i
    while j < n and "0" <= rec[j] <= "9":
        ts = ts * 10 + int(rec[j])
        j += 1
    while j < n and rec[j] != ";":
        j += 1                             # skip flags etc.
    if j >= n:
        return None
    i = j + 1
    nl = rec.find("\n", i)
    msg = rec[i:] if nl < 0 else rec[i:nl]
    props: dict = {}
    rest = "" if nl < 0 else rec[nl + 1:]
    for line in rest.split("\n"):
        if not line.startswith(" "):
            continue
        body = line[1:]
        eq = body.find("=")
        if eq <= 0:
            continue
        props[body[:eq]] = body[eq + 1:]
    return {"pri": pri, "severity": pri & 7, "facility": pri >> 3,
            "seq": seq, "monotonic_us": ts, "msg": msg,
            "props": json.dumps(props, sort_keys=True,
                                separators=(",", ":"))}


def split_kmsg(text: str) -> list[dict]:
    """Split a /dev/kmsg capture into records: a record starts at a
    non-space line; space-prefixed lines are its continuation
    properties."""
    out = []
    cur: list[str] = []
    for line in text.split("\n"):
        if line.startswith(" "):
            if cur:
                cur.append(line)
            continue
        if cur:
            r = parse_kmsg_record("\n".join(cur))
            if r is not None:
                out.append(r)
        cur = [line] if line else []
    if cur:
        r = parse_kmsg_record("\n".join(cur))
        if r is not None:
            out.append(r)
    return out


def read_kmsg(paths, boot_epoch_us: int | None = None):
    """Dataset of parsed kmsg rows (pri, severity, facility, seq,
    monotonic_us, ts, msg, props) from capture files."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for data in df["bytes"]:
            rows.extend(split_kmsg(data.decode("utf-8", "replace")))
        out = pd.DataFrame(rows, columns=["pri", "severity", "facility",
                                          "seq", "monotonic_us", "msg",
                                          "props"])
        if boot_epoch_us is not None and len(out):
            out["ts"] = pd.to_datetime(
                boot_epoch_us + out["monotonic_us"], unit="us")
        else:
            out["ts"] = pd.NaT
        return out

    return ds.map_batches(split, batch_format="pandas")
