"""Multiline assembly (imfile readMode/startmsg.regex analog)."""

import os

from rsyslog_ray.sources.textlog import (assemble_multiline,
                                         assemble_multiline_oracle,
                                         read_log_lines)

START = r"^\d{4}-\d{2}-\d{2} "

FILE_A = """2026-01-01 10:00:00 INFO start
2026-01-01 10:00:01 ERROR boom
  at com.example.Foo(Foo.java:1)
  at com.example.Bar(Bar.java:2)
2026-01-01 10:00:02 INFO recovered
"""

FILE_B = """leading junk without a date
2026-01-02 00:00:00 WARN first real
continuation
"""


def test_multiline_assembly(ray_session, tmp_path):
    pa_ = tmp_path / "a.log"
    pb = tmp_path / "b.log"
    pa_.write_text(FILE_A)
    pb.write_text(FILE_B)

    ds = read_log_lines([str(pa_), str(pb)])
    out = assemble_multiline(ds, START).to_pandas()

    for path, raw in ((str(pa_), FILE_A), (str(pb), FILE_B)):
        lines = raw.split("\n")[:-1]
        want = assemble_multiline_oracle(lines, START)
        got = (out[out["path"].str.endswith(os.path.basename(path))]
               .sort_values("record_no")["record"].tolist())
        assert got == want, path

    a = out[out["path"].str.endswith("a.log")].sort_values("record_no")
    assert a["n_lines"].tolist() == [1, 3, 1]  # stacktrace folded into one
    b = out[out["path"].str.endswith("b.log")].sort_values("record_no")
    assert b["record"].iloc[0] == "leading junk without a date"
    assert b["n_lines"].tolist() == [1, 2]
