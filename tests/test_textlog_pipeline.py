"""End-to-end syslog-file pipeline through the declarative config
(imfile → parser chain → router → sinks — the rsyslogd use case)."""

import glob
import os

import pandas as pd
import pyarrow.parquet as pq

from rsyslog_ray.config import run_config
from rsyslog_ray.rulebase import SYSLOG_RULEBASE


def _cfg(log_dir, out_dir, multiline=None):
    c = {
        "input": {"paths": [os.path.join(log_dir, "*.log")],
                  "format": "textlog"},
        "rules": [{"name": r.name, "pattern": r.pattern, "types": r.types}
                  for r in SYSLOG_RULEBASE.rules],
        "source_column": "line",
        "routes": [
            {"sink": "unparsed", "pred": ["==", "parse_ok", False],
             "stop": True},
            {"sink": "all", "pred": ["true"]},
        ],
        "aggregates": [["rule", "rule"]],
        "output": {"dir": out_dir, "full_sinks": ["all", "unparsed"]},
    }
    if multiline:
        c["input"]["multiline_start"] = multiline
    return c


def _rows(out_dir, sink):
    fs = glob.glob(os.path.join(out_dir, sink, "shard=*", "*.parquet"))
    return (pd.concat([pq.read_table(f).to_pandas() for f in fs])
            if fs else pd.DataFrame())


def test_syslog_files_end_to_end(ray_session, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "a.log").write_text(
        "<165>1 2026-02-01T10:00:00.000001Z web nginx 42 ID1 - hello\n"
        "<34>Oct 11 22:14:15 mymachine su[230]: legacy line\n"
        "garbage here\n")
    out = str(tmp_path / "out")
    agg = run_config(_cfg(str(d), out))
    assert int(agg[agg["sink"] == "all"]["cnt"].sum()) == 2
    assert int(agg[agg["sink"] == "unparsed"]["cnt"].sum()) == 1
    allr = _rows(out, "all").sort_values("line_no")
    assert allr["rule"].tolist() == ["rfc5424", "rfc3164"]
    assert allr["hostname"].tolist() == ["web", "mymachine"]
    assert str(allr["ts5424"].iloc[0]) == "2026-02-01 10:00:00.000001"
    assert _rows(out, "unparsed")["line"].iloc[0] == "garbage here"


def test_multiline_textlog_pipeline(ray_session, tmp_path):
    d = tmp_path / "logs"
    d.mkdir()
    (d / "m.log").write_text(
        "<13>1 2026-02-01T10:00:00.000001Z h app 1 - - start\n"
        "  continuation A\n"
        "  continuation B\n"
        "<13>1 2026-02-01T10:00:01.000001Z h app 1 - - next\n")
    out = str(tmp_path / "out")
    cfg = _cfg(str(d), out, multiline=r"^<\d")
    cfg["source_column"] = "record"
    cfg["rules"][0]["pattern"] = cfg["rules"][0]["pattern"].replace(
        "(?P<msg>.*)$", "(?P<msg>(?s:.*))$")  # dotall: msg spans lines
    agg = run_config(cfg)
    allr = _rows(out, "all").sort_values("record_no")
    assert len(allr) == 2
    assert "continuation A\n  continuation B" in allr["msg"].iloc[0]
