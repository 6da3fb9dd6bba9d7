"""imtuxedoulog analog — Tuxedo ULOG file reader.

Reference: contrib/imtuxedoulog/imtuxedoulog.c (+ README.md samples).
ULOG peculiarity: the DATE lives in the filename (``<base>.MMDDYY``,
c:141) while each line carries only the time:

    hhmmss.ff[f].host!prog.pid.tid[.ctx]: [gtrid ...: ] [ECID <...>: ] text

Parse per c:195-290 parseMsg: time at [0:6] (range-checked), second
fraction at [7:9]/[7:10] with precision keyed on whether [9] is the
separator dot; host up to ``!``; procid truncated at the LAST dot
before the first ``:`` (drops the context id); a leading ``gtrid``
clause is skipped to its ``:``; a leading ``ECID <...>`` becomes the
structured-data attribute ``[ECID="..."]`` and the text begins after
``>: `` (the reference rewrites the SD in place, mangling the value's
first byte — here the clean form is emitted).  Unparseable lines are
skipped, like the reference's COULD_NOT_PARSE path."""

from __future__ import annotations

import pandas as pd


def parse_ulog_line(line: str, date: pd.Timestamp) -> dict | None:
    if len(line) < 11 or not line[0:6].isdigit():
        return None
    hour, minute, sec = (int(line[0:2]), int(line[2:4]),
                         int(line[4:6]))
    if hour > 23 or minute > 59 or sec > 59:
        return None
    frac = ""
    for i in range(7, min(10, len(line))):
        if line[i].isdigit():
            frac += line[i]
        else:
            break
    precision = 2 if len(line) > 9 and line[9] == "." else 3
    host_at = 11 if len(line) > 10 and line[10] == "." else 10
    bang = line.find("!", host_at)
    if bang < 0:
        return None
    host = line[host_at:bang]
    colon = line.find(":", bang + 1)
    if colon < 0:
        return None
    prog_full = line[bang + 1:colon]
    dot = prog_full.rfind(".")
    procid = prog_full[:dot] if dot > 0 else prog_full
    text = line[colon + 2:]
    if text.startswith("gtrid"):
        c2 = text.find(":")
        if c2 < 0:
            return None
        text = text[c2 + 2:]
    ecid = None
    if text.startswith("ECID"):
        end = text.find(">", 6)
        if end >= 0:
            ecid = text[6:end]
            text = text[end + 3:]
    us = int(frac.ljust(6, "0")[:6]) if frac else 0
    ts = (date.normalize()
          + pd.Timedelta(hours=hour, minutes=minute, seconds=sec,
                         microseconds=us))
    return {"msg": text, "host": host, "procid": procid,
            "ecid": ecid,
            "structured_data": (f'[ECID="{ecid}"]' if ecid else "-"),
            "ts": ts, "secfrac_precision": precision}


def ulog_date_from_name(path: str) -> pd.Timestamp:
    """``<base>.MMDDYY`` → date (c:141 snprintf %02d%02d%02d)."""
    sfx = str(path).rsplit(".", 1)[-1]
    if len(sfx) != 6 or not sfx.isdigit():
        raise ValueError(f"not a ULOG date suffix: {path!r}")
    return pd.Timestamp(year=2000 + int(sfx[4:6]), month=int(sfx[0:2]),
                        day=int(sfx[2:4]))


def read_ulog(paths):
    """Dataset of parsed ULOG rows; one block per file, the file's
    name supplying the date half of every timestamp."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for path, data in zip(df["path"], df["bytes"]):
            date = ulog_date_from_name(path)
            for line in bytes(data).decode("utf-8",
                                           "replace").splitlines():
                if not line:
                    continue
                r = parse_ulog_line(line, date)
                if r is not None:
                    rows.append(r)
        return pd.DataFrame(rows, columns=[
            "msg", "host", "procid", "ecid", "structured_data", "ts",
            "secfrac_precision"])

    return ds.map_batches(split, batch_format="pandas")
