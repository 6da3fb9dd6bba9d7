"""Text-log sources: line splitting + multiline record assembly.

imfile analogs (reference plugins/imfile/imfile.c): a log file is a
byte stream that must be framed into records — single lines, or
multiline records delimited by ``startmsg.regex`` / ``endmsg.regex`` /
indentation (readMode, imfile.c:399-400).  Batch re-expression:

- ``read_log_lines``: one Dataset row per line with (path, line_no,
  line) — the provenance columns rsyslog attaches as inputname /
  fromhost (runtime/msg.h:96-102).
- ``assemble_multiline``: group lines back into records: a new record
  starts where ``start_re`` matches (readMode=startmsg.regex
  semantics); continuation lines join with ``\\n``.  Implemented as
  groupby(path).map_groups — the partitioning assumption is the same
  one imfile makes: a FILE is the unit of sequential state, so one
  file's lines must land in one group, sorted by line_no.  Files are
  independent → files parallelize, lines within a file do not.
"""

from __future__ import annotations

import re

import pandas as pd


def read_log_lines(paths):
    """Dataset of (path, line_no, line) from text files."""
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True)

    def split(df: pd.DataFrame) -> pd.DataFrame:
        out = {"path": [], "line_no": [], "line": []}
        for path, data in zip(df["path"], df["bytes"]):
            text = data.decode("utf-8", errors="replace")
            lines = text.split("\n")
            if lines and lines[-1] == "":
                lines.pop()
            out["path"].extend([path] * len(lines))
            out["line_no"].extend(range(len(lines)))
            out["line"].extend(lines)
        return pd.DataFrame(out)

    return ds.map_batches(split, batch_format="pandas")


def assemble_multiline(ds, start_pattern: str):
    """Collapse continuation lines into records (startmsg.regex mode).

    Lines before the first start-match form a leading record (the
    reference emits them too, after timeout). Output: (path, record_no,
    record, n_lines).
    """
    start_re = re.compile(start_pattern)

    def per_file(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("line_no")
        starts = g["line"].map(lambda s: bool(start_re.search(s)))
        rec_id = starts.cumsum()
        recs = (g.assign(__rec=rec_id)
                .groupby("__rec")
                .agg(record=("line", "\n".join), n_lines=("line", "size"))
                .reset_index(drop=True))
        recs.insert(0, "record_no", range(len(recs)))
        recs.insert(0, "path", g["path"].iloc[0])
        recs["n_lines"] = recs["n_lines"].astype("int64")
        return recs

    return ds.groupby("path").map_groups(per_file, batch_format="pandas")


def assemble_multiline_oracle(lines: list[str], start_pattern: str) -> list[str]:
    """Per-file reference implementation for tests."""
    start_re = re.compile(start_pattern)
    records: list[list[str]] = []
    for line in lines:
        if start_re.search(line) or not records:
            records.append([line])
        else:
            records[-1].append(line)
    return ["\n".join(r) for r in records]
