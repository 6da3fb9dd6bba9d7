"""imbatchreport analog (contrib/imbatchreport/imbatchreport.c):
whole-file messages, trailing structured-data lift, rename/delete
completion driven by the filename regex."""

import pandas as pd
import pytest

from rsyslog_ray.sources.batchreport import (FILE_TOO_LARGE,
                                             BatchReportCapture)


def test_batchreport_rename_flow(ray_session, tmp_path):
    (tmp_path / "job1.ok").write_text(
        "task A done\nexit   code 0\n"
        '[batch@123 program="nightly-etl" start="1700000000"]\n')
    (tmp_path / "job2.ok").write_text("plain report\nno sd block\n")
    cap = BatchReportCapture(
        str(tmp_path / "*.ok"), regex=r"\.ok$", sent=".sent",
        reject=".rejected", program_key='program="',
        timestamp_key='start="')
    df = cap.capture().to_pandas().sort_values("path")
    assert len(df) == 2
    r1, r2 = df.iloc[0], df.iloc[1]
    # LF → literal \n, space runs deduplicated (c:330-342)
    assert r1["msg"] == "task A done\\nexit code 0"
    assert r1["structured_data"] == \
        '[batch@123 program="nightly-etl" start="1700000000"]'
    assert r1["program"] == "nightly-etl"
    assert r1["ts"] == pd.Timestamp(1700000000, unit="s")
    assert r2["msg"] == "plain report\\nno sd block"
    assert r2["structured_data"] == "-"
    # success: matched filename part swapped for the sent suffix
    names = sorted(p.name for p in tmp_path.iterdir())
    assert names == ["job1.sent", "job2.sent"]


def test_batchreport_too_large_rejected(ray_session, tmp_path):
    (tmp_path / "huge.ok").write_text("y" * 5000)
    (tmp_path / "fine.ok").write_text("small")
    cap = BatchReportCapture(str(tmp_path / "*.ok"), regex=r"\.ok$",
                             max_msg_size=1000)
    df = cap.capture().to_pandas().sort_values("path")
    big = df[~df["ok"]].iloc[0]
    assert big["msg"] == FILE_TOO_LARGE + str(tmp_path / "huge.ok")
    names = sorted(p.name for p in tmp_path.iterdir())
    # too-large → reject suffix, good file → sent (c:424-436)
    assert names == ["fine.sent", "huge.rejected"]


def test_batchreport_delete_action_and_regex_guard(ray_session,
                                                   tmp_path):
    (tmp_path / "a.ok").write_text("gone after send")
    cap = BatchReportCapture(str(tmp_path / "*.ok"), action="delete",
                             regex=r"\.ok$")
    assert cap.capture().count() == 1
    assert list(tmp_path.iterdir()) == []    # deleted on success

    # a file the action regex cannot touch must STOP the poll
    # (c:405-408) — otherwise it would re-send forever
    (tmp_path / "b.ok").write_text("x")
    bad = BatchReportCapture(str(tmp_path / "*.ok"),
                             regex=r"\.nomatch$")
    with pytest.raises(RuntimeError, match="glob scope"):
        bad.capture()
