"""Syslog rulebase chain: RFC5424 first, RFC3164 fallback, PRI decompose."""

import pyarrow as pa
import pyarrow.compute as pc

from rsyslog_ray.rulebase import SYSLOG_RULEBASE, pri_decompose


def test_rfc5424_parse():
    line = ('<165>1 2026-01-02T03:04:05.123456Z web01 nginx 4242 ID47 '
            '[exampleSDID@32473 iut="3" eventSource="app"] An app event')
    out = SYSLOG_RULEBASE.parse_table(pa.array([line]))
    assert out["rule"][0].as_py() == "rfc5424"
    assert out["pri"][0].as_py() == 165
    assert out["hostname"][0].as_py() == "web01"
    assert out["app_name"][0].as_py() == "nginx"
    assert out["procid"][0].as_py() == "4242"
    assert out["msgid"][0].as_py() == "ID47"
    assert out["sd"][0].as_py().startswith("[exampleSDID@32473")
    assert out["msg"][0].as_py() == "An app event"
    ts = out["ts5424"][0].as_py()
    assert (ts.year, ts.microsecond) == (2026, 123456)
    sev, fac = pri_decompose(out["pri"])
    assert sev[0].as_py() == 5 and fac[0].as_py() == 20  # local4.notice


def test_rfc3164_fallback_and_unparsed():
    lines = pa.array([
        "<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed",
        "<13>Feb  5 17:32:18 10.0.0.99 myproc: %% It's time to make the do-nuts.",
        "totally not syslog",
    ])
    out = SYSLOG_RULEBASE.parse_table(lines)
    assert out["rule"].to_pylist() == ["rfc3164", "rfc3164", None]
    assert out["parse_ok"].to_pylist() == [True, True, False]
    assert out["hostname"].to_pylist()[:2] == ["mymachine", "10.0.0.99"]
    assert out["tag"].to_pylist()[:2] == ["su", "myproc"]
    assert out["procid3"][0].as_py() == "230"
    assert out["msg"][1].as_py().startswith("%% It's time")


def test_nilvalue_sd():
    line = "<0>1 2026-01-02T03:04:05.000001Z h a p m - msg after nil sd"
    out = SYSLOG_RULEBASE.parse_table(pa.array([line]))
    assert out["parse_ok"][0].as_py()
    assert out["sd"][0].as_py() == "-"
    assert out["msg"][0].as_py() == "msg after nil sd"
    sev, fac = pri_decompose(out["pri"])
    assert sev[0].as_py() == 0 and fac[0].as_py() == 0


def test_rfc3164_year_inference():
    import pandas as pd

    from rsyslog_ray.rulebase import parse_ts3164

    col = pd.Series(["Dec 31 23:59:58", "Jan  1 00:00:05", "Jun 15 12:00:00"])
    # reading logs on Jan 2: a Dec 31 stamp is LAST year
    now = pd.Timestamp("2026-01-02 00:00:00")
    out = parse_ts3164(col, now)
    assert out[0] == pd.Timestamp("2025-12-31 23:59:58")
    assert out[1] == pd.Timestamp("2026-01-01 00:00:05")
    # reading logs on Dec 30: a Jan 1 stamp is NEXT year
    now2 = pd.Timestamp("2026-12-30 00:00:00")
    out2 = parse_ts3164(col, now2)
    assert out2[0] == pd.Timestamp("2026-12-31 23:59:58")
    assert out2[1] == pd.Timestamp("2027-01-01 00:00:05")
    assert out2[2] == pd.Timestamp("2026-06-15 12:00:00")
