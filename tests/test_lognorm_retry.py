"""liblognorm sample front-end + sink write retry (fault injection)."""

import os

import pandas as pd
import pyarrow as pa
import pytest

from rsyslog_ray.rulebase import lognorm_rule, lognorm_rulebase


def test_lognorm_sample_compiles_and_parses():
    rb = lognorm_rulebase([
        ("conn", "connect from %ip:ipv4% port %port:number% user %user:word%"),
        ("kv", "id=%id:number% name=%name:char-to:,%, rest=%tail:rest%"),
    ])
    out = rb.parse_table(pa.array([
        "connect from 10.1.2.3 port 8080 user alice",
        "id=42 name=foo bar, rest=anything at all",
        "no match here",
    ]))
    assert out["rule"].to_pylist() == ["conn", "kv", None]
    assert out["ip"][0].as_py() == "10.1.2.3"
    assert out["port"][0].as_py() == 8080          # number -> int64
    assert out["name"][1].as_py() == "foo bar"     # char-to:, stops at comma
    assert out["tail"][1].as_py() == "anything at all"
    assert out["parse_ok"].to_pylist() == [True, True, False]


def test_lognorm_literal_escaping_and_errors():
    r = lognorm_rule("x", "a+b %v:word% (end)")
    out = lognorm_rulebase([("x", "a+b %v:word% (end)")]).parse_table(
        pa.array(["a+b hello (end)", "aXb hello (end)"]))
    assert out["parse_ok"].to_pylist() == [True, False]  # '+' literal
    with pytest.raises(ValueError, match="unsupported lognorm type"):
        lognorm_rule("y", "%v:nosuchtype%")
    with pytest.raises(ValueError, match="char-to needs"):
        lognorm_rule("z", "%v:char-to%")


def test_write_retry_fault_injection(tmp_path, monkeypatch):
    from rsyslog_ray.router import Route
    from rsyslog_ray.sinks import FanoutWriter

    w = FanoutWriter([Route("s", ("true",))], str(tmp_path))
    t = pa.table({
        "url": pa.array(["u1", "u2"]),
        "warc_ts": pa.array([pd.Timestamp("2026-01-01")] * 2,
                            pa.timestamp("us")),
        "lang": pa.array(["en", "de"]),
        "url_host": pa.array(["h", "h"]),
        "shard": pa.array([0, 0], pa.int32()),
    })
    calls = {"n": 0}
    real_replace = os.replace

    def flaky(src, dst):
        calls["n"] += 1
        if calls["n"] <= 2:                      # first two attempts fail
            raise OSError("injected transient failure")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", flaky)
    monkeypatch.setattr("time.sleep", lambda s: None)  # fast backoff
    out = w(t)                                   # must succeed on retry 3
    assert calls["n"] == 3
    files = list((tmp_path / "s" / "shard=0").glob("*.parquet"))
    assert len(files) == 1

    # persistent failure -> raises after bounded retries
    calls["n"] = 0

    def dead(src, dst):
        calls["n"] += 1
        raise OSError("disk is gone")

    monkeypatch.setattr(os, "replace", dead)
    with pytest.raises(OSError, match="disk is gone"):
        w(t)
    assert calls["n"] == FanoutWriter.WRITE_RETRIES


def test_lognorm_v2_types(ray_session):
    """liblognorm v2 parser types added round 4: hexnumber, mac48,
    ipv6, whitespace, string-to:<lit>, and the dash skip-field — both
    the per-row oracle path and the Arrow/RE2 parse_table path."""
    import pyarrow as pa

    from rsyslog_ray.rulebase import lognorm_rulebase

    rb = lognorm_rulebase([
        ("net", "if %mac:mac48% addr %ip6:ipv6% flags %h:hexnumber%"),
        ("st", "user %u:string-to: said% said %-:whitespace%%m:rest%"),
    ])
    lines = [
        "if 00:1B:44:11:3a:b7 addr fe80::1ff:fe23:4567:890a flags 0x1A3",
        "user jo anne said   hi there",
        "no match at all",
    ]
    # per-row oracle
    n, out = rb.parse_row(lines[0])
    assert n == "net" and out["mac"] == "00:1B:44:11:3a:b7"
    assert out["ip6"] == "fe80::1ff:fe23:4567:890a" and out["h"] == "0x1A3"
    n, out = rb.parse_row(lines[1])
    assert n == "st" and out["u"] == "jo anne" and out["m"] == "hi there"
    # vectorized Arrow path agrees
    t = rb.parse_table(pa.array(lines, pa.string()))
    assert t["rule"].to_pylist() == ["net", "st", None]
    assert t["mac"].to_pylist()[0] == "00:1B:44:11:3a:b7"
    assert t["u"].to_pylist()[1] == "jo anne"
    assert t["m"].to_pylist()[1] == "hi there"
    # dash fields never become columns
    assert "-" not in dict(rb.fields)
