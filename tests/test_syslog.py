"""Syslog rulebase chain: RFC5424 first, RFC3164 fallback, PRI decompose."""

import pandas as pd
import pyarrow as pa
import pytest
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


# ---------------------------------------------------------------------
# Shipped vendor parser modules (rsyslog_ray/vendor.py) — sample lines
# in the reference's own formats, field splits per the C walks.
# ---------------------------------------------------------------------

def test_cisco_ios_rulebase():
    """pmciscoios (plugins/pmciscoios/pmciscoios.c:134-263): seqno,
    optional ORIGIN, 3164 timestamp with ms+TZ, %TAG, msg — the real
    line shape from the reference's own test traffic."""
    from rsyslog_ray.vendor import CISCO_IOS_RULEBASE, cisco_ios_rulebase

    # origin form (present.origin="on"), reference test sample
    line = ("123456789: HOSTNAME: May 21 12:00:01.123 gmt: "
            "%IOSXE-6-PLATFORM: F0: cpp_cp: QFP:0.0 Thread:105")
    name, f = CISCO_IOS_RULEBASE.parse_row(line)
    assert name == "ciscoios_origin"
    assert f["seq"] == 123456789
    assert f["origin"] == "HOSTNAME"
    assert f["ts"] == "May 21 12:00:01.123 gmt"
    assert f["tag"] == "IOSXE-6-PLATFORM"
    assert f["msg"] == "F0: cpp_cp: QFP:0.0 Thread:105"

    # plain form: no origin; '*'/'.' clock-flag prefixes allowed
    for pfx in ("", "*", "."):
        nm, f = CISCO_IOS_RULEBASE.parse_row(
            f"999: {pfx}May 21 12:00:01 UTC: %SYS-5-CONFIG_I: done")
        assert nm == "ciscoios" and f["seq"] == 999 \
            and f["tag"] == "SYS-5-CONFIG_I" and f["msg"] == "done"

    # empty seqno is legal (the C counter loop may read zero digits)
    nm, f = CISCO_IOS_RULEBASE.parse_row(
        ": May 21 12:00:01: %LINK-3-UPDOWN: Interface up")
    assert nm == "ciscoios" and f["seq"] is None and f["tag"] == "LINK-3-UPDOWN"

    # IPv6 origin doesn't terminate at a bare ':' (c:169-172)
    nm, f = CISCO_IOS_RULEBASE.parse_row(
        "7: ::1: May 21 12:00:01: %SYS-5-RESTART: cold start")
    assert nm == "ciscoios_origin" and f["origin"] == "::1"

    # XR form (present.xr="on"): RSP node header + "%TAG : msg"
    nm, f = cisco_ios_rulebase(xr=True).parse_row(
        "42: RP/0/RSP0/CPU0:Jun 25 11:45:04.123 UTC: proc[123]: "
        "%ROUTING-BGP-5-ADJCHANGE : neighbor up")
    assert nm == "ciscoios_xr" and f["tag"] == "ROUTING-BGP-5-ADJCHANGE" \
        and f["msg"] == "neighbor up"

    # vectorized chain == per-row oracle over a mixed batch
    lines = [line, "999: May 21 12:00:01 UTC: %SYS-5-CONFIG_I: done",
             "not cisco at all", "12: broken"]
    tbl = CISCO_IOS_RULEBASE.parse_table(pa.array(lines))
    assert tbl["rule"].to_pylist() == ["ciscoios_origin", "ciscoios",
                                       None, None]
    assert tbl["parse_ok"].to_pylist() == [True, True, False, False]


def test_aix_forwarded_normalize():
    """pmaixforwardedfrom (contrib/.../pmaixforwardedfrom.c:65-146):
    the 'Message forwarded from host:'/'From host:' preamble collapses
    to a plain 3164 hostname; unrecognized lines pass through."""
    import pandas as pd

    from rsyslog_ray.vendor import (aix_forwarded_normalize,
                                    aix_forwarded_row)

    s = pd.Series([
        "Jun 25 11:45:04 Message forwarded from hostxyz: sshd[9]: ok",
        "Jun 25 11:45:04 From hostabc: su: session opened",
        "Jun 25 11:45:04 FROM hostabc: case insensitive",
        "Jun 25 11:45:04 From spaced host: not aix (space before colon)",
        "Oct 11 22:14:15 mymachine su[230]: untouched 3164",
    ])
    out = aix_forwarded_normalize(s)
    assert out[0] == "Jun 25 11:45:04 hostxyz sshd[9]: ok"
    assert out[1] == "Jun 25 11:45:04 hostabc su: session opened"
    assert out[2] == "Jun 25 11:45:04 hostabc case insensitive"
    assert out[3] == s[3]   # abort path: no rewrite
    assert out[4] == s[4]
    # rewritten lines then parse as standard 3164
    parsed = SYSLOG_RULEBASE.parse_table(pa.array("<13>" + out[0:2]))
    assert parsed["hostname"].to_pylist() == ["hostxyz", "hostabc"]
    assert parsed["tag"].to_pylist() == ["sshd", "su"]
    # vectorized == oracle on every row
    assert out.tolist() == [aix_forwarded_row(l) or l for l in s]


def test_snare_normalize():
    """pmsnare (contrib/pmsnare/pmsnare.c:282-424): the tab between
    hostname and the Snare tag, and the tab after the tag, become
    single spaces — both the tab-separated and the syslog-header
    forms, with literal tab and the '#011' escaped representation."""
    import pandas as pd

    from rsyslog_ray.vendor import snare_normalize, snare_row

    syslog_form = ("May 21 12:00:01 hostname MSWinEventLog\t1\tN/A\t"
                   "113977\tSun May 21 12:00:01.123\tN/A\tnxlog")
    tabsep_form = ("other.lab.home\tMSWinEventLog\t1\tSecurity\t606129"
                   "\tWed May 17 02:25:10 2017")
    linux_form = ("audit.host\tLinuxKAudit\t1\ttype=SYSCALL msg=audit"
                  "(1234):  arch=c000003e")
    s = pd.Series([syslog_form, tabsep_form, linux_form,
                   "Oct 11 22:14:15 mymachine su[230]: not snare"])
    out = snare_normalize(s)
    assert out[0] == ("May 21 12:00:01 hostname MSWinEventLog 1\tN/A\t"
                      "113977\tSun May 21 12:00:01.123\tN/A\tnxlog")
    # tab-separated: BOTH the host-tag tab and the tag's tab collapse
    assert out[1] == ("other.lab.home MSWinEventLog 1\tSecurity\t606129"
                      "\tWed May 17 02:25:10 2017")
    assert out[2].startswith("audit.host LinuxKAudit 1\ttype=SYSCALL")
    assert out[3] == s[3]
    assert out.tolist() == [snare_row(l) or l for l in s]

    # '#011' escaped-control-character representation (c:236-260)
    esc = pd.Series(["hostname#011MSWinEventLog#0111#011Security#011"
                     "606129#011Wed May 17 02:25:10 2017"])
    out2 = snare_normalize(esc, "#011")
    assert out2[0] == ("hostname MSWinEventLog 1#011Security#011606129"
                       "#011Wed May 17 02:25:10 2017")
    assert out2[0] == snare_row(esc[0], "#011")


def test_cisconames_normalize():
    """pmcisconames (contrib/pmcisconames/pmcisconames.c:66-146): drop
    the stray ' : ' between hostname and '%name' tag, both timestamp
    widths; the rewritten line parses as 3164 host+tag."""
    import pandas as pd

    from rsyslog_ray.vendor import cisconames_normalize, cisconames_row

    s = pd.Series([
        "Jun 25 11:45:04 firewall01 : %ASA-4-102030: Deny udp src vlan",
        "May 21 2017 00:00:00 fw02 : %ASA-6-102030: SFR requested pkt",
        "Jun 25 11:45:04 host %ASA-1-000000: already clean",
    ])
    out = cisconames_normalize(s)
    assert out[0] == "Jun 25 11:45:04 firewall01 %ASA-4-102030: Deny udp src vlan"
    assert out[1] == "May 21 2017 00:00:00 fw02 %ASA-6-102030: SFR requested pkt"
    assert out[2] == s[2]
    assert out.tolist() == [cisconames_row(l) or l for l in s]


def test_vendor_fuzz_oracle_parity():
    """Property: every vectorized normalizer is byte-identical to its
    per-row C-walk oracle on an adversarial fragment corpus (CLAUDE.md
    invariant 5 — engine and oracle share SPECS, tests enforce)."""
    import random

    import pandas as pd

    from rsyslog_ray import vendor as V

    rng = random.Random(2026)
    frags = ["Jun 25 11:45:04 ", "From ", "from ", "Message forwarded from ",
             "MESSAGE FORWARDED FROM ", "host: ", "h x: ", ": %", " : %",
             "%TAG: ", "MSWinEventLog\t", "mswineventlog\t", "LinuxKAudit\t",
             "#011", "MSWinEventLog#011", "\t", " ", "  ", ":", "a",
             "May 21 2017 00:00:00 ", "abc.def\t", "123: ", "::1: ", "*",
             ".", "from :", "from :x", "hostname#011", "linuxkaudit#011",
             "#01", ""]
    corpus = ["".join(rng.choice(frags) for _ in range(rng.randint(0, 9)))
              for _ in range(3000)]
    s = pd.Series(corpus)
    cases = {
        "aix": (V.aix_forwarded_normalize, V.aix_forwarded_row),
        "snare": (lambda x: V.snare_normalize(x, "\t"),
                  lambda l: V.snare_row(l, "\t")),
        "snare011": (lambda x: V.snare_normalize(x, "#011"),
                     lambda l: V.snare_row(l, "#011")),
        "cisconames": (V.cisconames_normalize, V.cisconames_row),
    }
    for nm, (vec, orc) in cases.items():
        got = vec(s).tolist()
        want = [orc(l) if orc(l) is not None else l for l in corpus]
        assert got == want, nm


def test_vendor_conf_end_to_end(ray_session, tmp_path):
    """module(load="pmsnare"/"pmciscoios") in a .conf binds the vendor
    normalizer chain + rulebase and runs through run_config."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rainerconf import parse_rainer

    src = pd.DataFrame({"text": [
        "123456789: HOSTNAME: May 21 12:00:01.123 gmt: %IOSXE-6-PLATFORM: F0: cpp",
        "999: May 21 12:00:01 UTC: %SYS-5-CONFIG_I: done",
        "not cisco",
    ]})
    data = tmp_path / "in"
    data.mkdir()
    src.to_parquet(data / "pages-0.parquet", index=False)

    conf = '''
    module(load="pmciscoios")
    global(workDirectory="OUT")
    input(type="imfile" file="DATA/pages-*.parquet")
    if $parse_ok == "off" then { action(type="omfile" file="dead") stop }
    *.* action(type="omfile" file="parsed")
    '''.replace("OUT", str(tmp_path / "o")).replace("DATA", str(data))
    cfg = parse_rainer(conf)
    assert [r["name"] for r in cfg["rules"]] == ["ciscoios_origin",
                                                 "ciscoios"]
    cfg["output"]["full_sinks"] = ["parsed", "dead"]
    cfg["aggregates"] = [["tag", "tag"]]
    run_config(cfg, resume=False, lineage=False)
    files = glob.glob(str(tmp_path / "o" / "parsed" / "**" / "*.parquet"),
                      recursive=True)
    t = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert sorted(t["tag"]) == ["IOSXE-6-PLATFORM", "SYS-5-CONFIG_I"]
    dead = glob.glob(str(tmp_path / "o" / "dead" / "**" / "*.parquet"),
                     recursive=True)
    td = pd.concat([pq.read_table(f).to_pandas() for f in dead])
    assert td["text"].tolist() == ["not cisco"]

    # normalizer module: snare lines revert to 3164 before the chain
    src2 = pd.DataFrame({"text": [
        "May 21 12:00:01 hostname MSWinEventLog\t1\tN/A\t113977\tSun May 21 12:00:01.123\tN/A\tnxlog\tok",
        "Oct 11 22:14:15 mymachine su[230]: plain 3164",
    ]})
    data2 = tmp_path / "in2"
    data2.mkdir()
    src2.to_parquet(data2 / "pages-0.parquet", index=False)
    conf2 = '''
    module(load="pmsnare")
    global(workDirectory="OUT")
    input(type="imfile" file="DATA/pages-*.parquet")
    parser(name="r3164" pattern="^(?P<ts3164>[A-Z][a-z]{2} [ 0-9]\\\\d \\\\d\\\\d:\\\\d\\\\d:\\\\d\\\\d) (?P<hostname>\\\\S+) (?P<tag>[^:\\\\[ ]+).*$" source="text")
    *.* action(type="omfile" file="all")
    '''.replace("OUT", str(tmp_path / "o2")).replace("DATA", str(data2))
    cfg2 = parse_rainer(conf2)
    assert cfg2["normalizers"] == ["pmsnare"]
    cfg2["output"]["full_sinks"] = ["all"]
    cfg2["aggregates"] = [["host", "hostname"]]
    run_config(cfg2, resume=False, lineage=False)
    files2 = glob.glob(str(tmp_path / "o2" / "all" / "**" / "*.parquet"),
                       recursive=True)
    t2 = pd.concat([pq.read_table(f).to_pandas() for f in files2])
    assert sorted(t2["tag"]) == ["MSWinEventLog", "su"]
    assert sorted(t2["hostname"]) == ["hostname", "mymachine"]


def test_leef_parse():
    """mmleefparse (plugins/mmleefparse/mmleefparse.c:110-520): cookie
    search window, 5-field '|' header, escape-aware delimiter-separated
    key=value extensions — against the reference's own PAN-OS test
    traffic shape."""
    import pandas as pd

    from rsyslog_ray.vendor import leef_parse, leef_parse_row

    pan = ("Sep 17 13:45:35 firewall.domain.local LEEF:1.0|"
           "Palo Alto Networks|PAN-OS Syslog Integration|11.1.6-h14|"
           "allow|cat=TRAFFIC|src=172.19.50.39|dst=172.19.5.50|"
           "proto=tcp|action=allow|totalBytes=460")
    r = leef_parse_row(pan, delimiter="|")
    assert r["header"] == {"protocolVersion": "1.0",
                           "vendor": "Palo Alto Networks",
                           "product": "PAN-OS Syslog Integration",
                           "productVersion": "11.1.6-h14",
                           "eventID": "allow"}
    assert r["fields"]["src"] == "172.19.50.39"
    assert r["fields"]["totalBytes"] == "460"

    # default tab delimiter; '\=' '\\' '\|' '\<delim>' unescape
    # (c:213-235), bare key -> empty value (c:327-333)
    tabbed = ("LEEF:2.0|IBM|QRadar|1.0|evt42|src=1.2.3.4\t"
              "msg=hello \\= pipe \\| end\tflag")
    r2 = leef_parse_row(tabbed)
    assert r2["header"]["protocolVersion"] == "2.0"
    assert r2["fields"] == {"src": "1.2.3.4",
                            "msg": "hello = pipe | end", "flag": ""}

    # cookie must sit inside the 64-char search window (c:459-481)
    assert leef_parse_row("x" * 80 + "LEEF:1.0|V|P|1|e|k=v") is None
    assert leef_parse_row("x" * 20 + "LEEF:1.0|V|P|1|e|k=v") is not None
    # short header aborts (RS_RET_NO_CEE_MSG)
    assert leef_parse_row("LEEF:1.0|V|P") is None

    df = leef_parse(pd.Series([pan, "not leef", None]), delimiter="|")
    assert df["parse_ok"].tolist() == [True, False, False]
    assert df["vendor"].tolist()[0] == "Palo Alto Networks"
    import json
    assert json.loads(df["fields"][0])["action"] == "allow"


def test_audit_parse():
    """mmaudit (plugins/mmaudit/mmaudit.c:113-260): 'type=N audit(ID):'
    header + space-separated k=v pairs with quoted values.  Deliberate
    divergence: the C's sizeof(" audit(") skip (c:232) drops the first
    char of every audit id; we keep the full id."""
    import pandas as pd

    from rsyslog_ray.vendor import audit_parse, audit_parse_row

    line = ("type=1305 audit(1364481363.243:24287): auid=500 ses=1 "
            "subj=unconfined_u:unconfined_r msg='op=remove rule "
            "key=\"test\"' exe=\"/usr/sbin/auditctl\" res=success")
    r = audit_parse_row(line)
    assert r["hdr"] == {"auditid": "1364481363.243:24287", "type": 1305}
    assert r["data"]["auid"] == "500"
    # single-quoted value keeps inner double quotes (parseValue
    # termc handling, c:132-159)
    assert r["data"]["msg"] == 'op=remove rule key="test"'
    assert r["data"]["exe"] == "/usr/sbin/auditctl"
    assert r["data"]["res"] == "success"

    assert audit_parse_row("not an audit line") is None
    assert audit_parse_row("type=13x5 audit(1:2): a=b") is None
    assert audit_parse_row("type=1305 noaudit(1:2): a=b") is None

    df = audit_parse(pd.Series([line, "nope", None]))
    assert df["parse_ok"].tolist() == [True, False, False]
    assert df["audit_type"].tolist()[0] == 1305
    import json
    assert json.loads(df["data"][0])["ses"] == "1"


def test_vendor_formats_roundtrip(ray_session):
    """q:vendor_formats — render→decode roundtrip recovers the source
    fields exactly for all three shipped decoders."""
    import numpy as np

    from rsyslog_ray.pipelines.queries import q_vendor_formats

    df = q_vendor_formats("/root/testdata/sf0.001").to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    assert bool(df["cisco_ok"].all())
    assert (df["cisco_seq"].astype("int64") == df["event_id"]).all()
    # tag carries the uppercased event_type back out
    assert df["cisco_tag"].str.startswith("EV-").all()
    assert (df["cisco_tag"].str.split("-").str[2]
            == df["leef_event"].str.upper()).all()
    assert (df["leef_user"].astype(int) >= 0).all()
    assert df["audit_type"].between(1300, 1309).all()
    assert (df["auditid"].str.split(":").str[1].astype("int64")
            == df["event_id"]).all()
    assert (df["audit_comm"] == df["leef_event"]).all()


def test_mmsnmptrapd_rewrite():
    """mmsnmptrapd (plugins/mmsnmptrapd/mmsnmptrapd.c:217-252): TAG
    'snmptrapd/<sever>/<host>:' → TAG 'snmptrapd:', HOSTNAME from the
    tag (trailing ':' stripped), severity via the user mapping —
    vectorized path byte-identical to the per-row C-walk oracle."""
    from rsyslog_ray.vendor import (severity_mapping, snmptrapd_rewrite,
                                    snmptrapd_rewrite_row)

    smap = severity_mapping("warning/4, error/3,info/6")
    assert smap == {"warning": 4, "error": 3, "info": 6}
    with pytest.raises(ValueError):
        severity_mapping("bad/9")

    tags = pd.Series([
        "snmptrapd/warning/web01.example.net:",   # the canonical shape
        "snmptrapd/error/db5:",                   # mapped, short host
        "snmptrapd/unknown/h:",                   # unmapped severity
        "snmptrapd/warning stray",                # SP ends sever, no host
        "snmptrapd/crit",                         # no host component
        "othertag: hello",                        # no match: untouched
        "snmptrapdX/warning/h:",                  # prefix mismatch
        "snmptrapd/",                             # empty components
    ])
    hosts = pd.Series([f"relay{i}" for i in range(len(tags))])
    sevs = pd.Series([5] * len(tags))

    vt, vh, vs = snmptrapd_rewrite(tags, hosts, sevs, sever_map=smap)
    for i in range(len(tags)):
        et, eh, es = snmptrapd_rewrite_row(
            tags[i], hosts[i], sevs[i], sever_map=smap)
        assert (vt[i], vh[i], vs[i]) == (et, eh, es), tags[i]
    # and the canonical row's exact values
    assert (vt[0], vh[0], vs[0]) == ("snmptrapd:",
                                     "web01.example.net", 4)
    assert vs[2] == 5                       # unmapped keeps severity
    assert (vt[5], vh[5]) == ("othertag: hello", "relay5")
    assert (vt[6], vh[6]) == ("snmptrapdX/warning/h:", "relay6")


def test_mmsnareparse_core():
    """mmsnareparse core subset: literal-tab normalization, PRI skip,
    MSWinEventLog TSV header, typed EventID, Description key/values."""
    import json

    from rsyslog_ray.vendor import snare_event_parse, snare_kv_parse

    line = ("<13>Jan  5 10:00:00 host MSWinEventLog\t1\tSecurity\t1234\t"
            "Fri Jan 05 10:00:00 2024\t4624\tMicrosoft-Windows-"
            "Security-Auditing\tSYSTEM\tN/A\tSuccess Audit\tWKS01\t"
            "Logon\tAn account was successfully logged on.    "
            "Logon Type:  3    Security ID:  S-1-5-18    "
            "Elevated Token:  true    Source Port:  49152")
    # the same event with agent-escaped tabs must decode identically
    esc = line.replace("\t", "#011")
    df = snare_event_parse(pd.Series([line, esc, "no payload", None]))
    for i in (0, 1):
        assert bool(df["parse_ok"][i])
        assert df["criticality"][i] == "1"
        assert df["channel"][i] == "Security"
        assert df["snare_counter"][i] == "1234"
        assert df["event_id"][i] == 4624
        assert df["provider"][i] == \
            "Microsoft-Windows-Security-Auditing"
        assert df["event_log_type"][i] == "Success Audit"
        assert df["computer"][i] == "WKS01"
        assert df["category"][i] == "Logon"
        ev = json.loads(df["event_data"][i])
        assert ev["Logon Type"] == 3           # typed int
        assert ev["Security ID"] == "S-1-5-18"
        assert ev["Elevated Token"] is True    # typed bool
        assert ev["Source Port"] == 49152
    assert not df["parse_ok"][2] and not df["parse_ok"][3]
    assert df["event_id"].isna()[2]

    # kv edge: "Key:" split from its value by a segment boundary
    assert snare_kv_parse("Account Name:\tALICE   Count:  2") == {
        "Account Name": "ALICE", "Count": 2}


def test_pmdb2diag_parse():
    """pmdb2diag (contrib/pmdb2diag/pmdb2diag.c) against the
    documentation's db2diag sample, newline-joined as imfile's
    startmsg.regex merge delivers it — default offsets 59/0/49."""
    from rsyslog_ray.vendor import db2diag_parse_row

    rec = ("2015-05-06-16.53.26.989402+120 E1876227378A1702     "
           "LEVEL: Info\n"
           "PID     : 4390948              TID : 89500          "
           "PROC : db2sysc 0\n"
           "INSTANCE: db2itst              NODE : 000\n"
           "MESSAGE : ZRC=0x80100024 Transaction was not found")
    r = db2diag_parse_row(rec)
    assert r["severity"] == 6                   # Info
    assert r["procid"] == "4390948"
    assert r["appname"] == "db2sysc"
    assert r["ts"] == pd.Timestamp(
        "2015-05-06 16:53:26.989402+02:00")

    # every level token of the C switch, incl. Error-vs-Event on 'E'
    for token, sev in (("Critical", 0), ("Alert", 1), ("Severe", 2),
                       ("Error", 3), ("Event", 5), ("Warning", 4),
                       ("Info", 6), ("Debug", 7)):
        line = ("2015-05-06-16.53.26.989402+120 E0000000000A0000     "
                f"LEVEL: {token}\nPID     : 77 X")
        assert db2diag_parse_row(line)["severity"] == sev, token
    assert db2diag_parse_row("x" * 80) is None  # no level char match


def test_pmpanngfw_csv_to_tsv():
    """pmpanngfw (contrib/pmpanngfw/pmpanngfw.c): PAN-OS CSV rows
    rewritten TAB-separated through the quoted-CSV state machine;
    non-PAN rows pass through."""
    from rsyslog_ray.vendor import panngfw_normalize, panngfw_row

    row = ('1,2015/05/06 16:00:01,001606001116,TRAFFIC,end,1,'
           '2015/05/06 15:59:51,10.0.0.1,"quoted,comma",'
           '"say ""hi""",tail')
    out = panngfw_row(row)
    # "" unescapes only INSIDE a quoted field (the C state machine's
    # STATE_IN_QUOTE_QUOTE path); unquoted fields copy verbatim
    assert out == ("1\t2015/05/06 16:00:01\t001606001116\tTRAFFIC\t"
                   "end\t1\t2015/05/06 15:59:51\t10.0.0.1\t"
                   'quoted,comma\tsay "hi"\ttail')
    # gate: unknown log type / missing fields → untouched
    assert panngfw_row("1,2,3,NOTATYPE,x") is None
    assert panngfw_row("no commas here") is None
    s = pd.Series([row, "plain syslog line"])
    norm = panngfw_normalize(s)
    assert norm[0] == out
    assert norm[1] == "plain syslog line"


def test_mmsnareparse_win_event_tables():
    """Per-EventID knowledge tables (mmsnareparse.c g_eventMappings
    :563-626, g_logonTypeMap :549-562, section descriptors :508-547):
    the documented Windows Security samples for 4624/4625/4634/4672/
    4688 decode field-for-field — sections as nested objects,
    camel-cased labels, typed LogonType with its LogonTypeName
    sibling, int ports, placeholder '-'/'N/A' values dropped, and
    Category/Subtype/Outcome injected from the event table (4634 is
    absent from the table: outcome derives from the audit result)."""
    import json

    from rsyslog_ray.vendor import (SNARE_EVENT_MAP, snare_win_parse,
                                    snare_win_parse_row)

    def tsv(eid, audit, desc):
        return ("<13>Jan  5 10:00:00 host MSWinEventLog\t1\tSecurity\t"
                f"77\tFri Jan 05 10:00:00 2024\t{eid}\t"
                "Microsoft-Windows-Security-Auditing\tSYSTEM\tN/A\t"
                f"{audit}\tDC01\tLogon\t{desc}")

    d4624 = (
        "An account was successfully logged on.    "
        "Subject:    Security ID:  S-1-5-18    Account Name:  WIN-GG82ULGC9GO$    "
        "Account Domain:  WORKGROUP    Logon ID:  0x3E7    "
        "Logon Information:    Logon Type:  7    Restricted Admin Mode:  -    "
        "Virtual Account:  No    Elevated Token:  No    "
        "Impersonation Level:  Impersonation    "
        "New Logon:    Security ID:  S-1-5-21-1377283216-344919071-3415362939-500    "
        "Account Name:  Administrator    Account Domain:  WIN-GG82ULGC9GO    "
        "Logon ID:  0x8DCDC    Linked Logon ID:  0x0    "
        "Network Account Name:  -    "
        "Logon GUID:  {00000000-0000-0000-0000-000000000000}    "
        "Process Information:    Process ID:  0x44c    "
        "Process Name:  C:\\Windows\\System32\\svchost.exe    "
        "Network Information:    Workstation Name:  WIN-GG82ULGC9GO    "
        "Source Network Address:  127.0.0.1    Source Port:  0    "
        "Detailed Authentication Information:    Logon Process:  Negotiat    "
        "Authentication Package:  Negotiate    Transited Services:  -    "
        "Package Name (NTLM only):  -    Key Length:  0")
    r = snare_win_parse_row(tsv(4624, "Success Audit", d4624))
    w = r["win"]
    assert w["Event"] == {"EventID": 4624, "Category": "Logon",
                          "Subtype": "Success", "Outcome": "success"}
    assert w["Summary"] == "An account was successfully logged on."
    assert w["Subject"] == {
        "SecurityID": "S-1-5-18", "AccountName": "WIN-GG82ULGC9GO$",
        "AccountDomain": "WORKGROUP", "LogonID": "0x3E7"}
    assert w["LogonInformation"] == {
        "LogonType": 7, "LogonTypeName": "Unlock",
        "VirtualAccount": "No", "ElevatedToken": "No",
        "ImpersonationLevel": "Impersonation"}   # '-' values dropped
    assert w["NewLogon"] == {
        "SecurityID": "S-1-5-21-1377283216-344919071-3415362939-500",
        "AccountName": "Administrator",
        "AccountDomain": "WIN-GG82ULGC9GO", "LogonID": "0x8DCDC",
        "LinkedLogonID": "0x0",
        "LogonGUID": "{00000000-0000-0000-0000-000000000000}"}
    assert w["Process"] == {
        "ProcessID": "0x44c",
        "ProcessName": "C:\\Windows\\System32\\svchost.exe"}
    assert w["Network"] == {
        "WorkstationName": "WIN-GG82ULGC9GO",
        "SourceNetworkAddress": "127.0.0.1", "SourcePort": 0}
    assert w["DetailedAuthentication"] == {
        "LogonProcess": "Negotiat",
        "AuthenticationPackage": "Negotiate", "KeyLength": 0}

    d4625 = (
        "An account failed to log on.    "
        "Subject:    Security ID:  S-1-5-18    Account Name:  DC01$    "
        "Account Domain:  CONTOSO    Logon ID:  0x3E7    "
        "Logon Type:  2    "
        "Account For Which Logon Failed:    Security ID:  S-1-0-0    "
        "Account Name:  bob    Account Domain:  CONTOSO    "
        "Failure Information:    Failure Reason:  Unknown user name or bad password.    "
        "Status:  0xC000006D    Sub Status:  0xC0000064    "
        "Network Information:    Workstation Name:  DC01    "
        "Source Network Address:  10.0.0.12    Source Port:  59132")
    r = snare_win_parse_row(tsv(4625, "Failure Audit", d4625))
    w = r["win"]
    assert w["Event"]["Category"] == "Logon"
    assert w["Event"]["Subtype"] == "Failure"
    assert w["Event"]["Outcome"] == "failure"
    assert w["TargetAccount"] == {
        "SecurityID": "S-1-0-0", "AccountName": "bob",
        "AccountDomain": "CONTOSO"}
    assert w["Failure"] == {
        "FailureReason": "Unknown user name or bad password.",
        "Status": "0xC000006D", "SubStatus": "0xC0000064"}
    assert w["Network"]["SourcePort"] == 59132

    # 4634 is NOT in the event table: Category/Subtype absent, the
    # outcome derives from the audit result string
    d4634 = ("An account was logged off.    "
             "Subject:    Security ID:  S-1-5-21-1-2-3-1001    "
             "Account Name:  alice    Account Domain:  CONTOSO    "
             "Logon ID:  0x27F9E    Logon Type:  3")
    assert 4634 not in SNARE_EVENT_MAP
    r = snare_win_parse_row(tsv(4634, "Success Audit", d4634))
    w = r["win"]
    assert w["Event"] == {"EventID": 4634, "Outcome": "success"}
    assert w["Subject"]["AccountName"] == "alice"
    assert w["Subject"]["LogonType"] == 3          # active section
    assert w["Subject"]["LogonTypeName"] == "Network"

    d4672 = ("Special privileges assigned to new logon.    "
             "Subject:    Security ID:  S-1-5-18    "
             "Account Name:  SYSTEM    Account Domain:  NT AUTHORITY    "
             "Logon ID:  0x3E7    "
             "Privileges:  SeAssignPrimaryTokenPrivilege    "
             "SeTcbPrivilege    SeSecurityPrivilege")
    r = snare_win_parse_row(tsv(4672, "Success Audit", d4672))
    w = r["win"]
    assert w["Event"] == {"EventID": 4672, "Category": "Privilege",
                          "Subtype": "Assignment",
                          "Outcome": "success"}
    assert w["Privileges"] == {"PrivilegeList":
                               "SeAssignPrimaryTokenPrivilege "
                               "SeTcbPrivilege SeSecurityPrivilege"}

    d4688 = (
        "A new process has been created.    "
        "Creator Subject:    Security ID:  S-1-5-18    "
        "Account Name:  WIN-GG82ULGC9GO$    Account Domain:  WORKGROUP    "
        "Logon ID:  0x3E7    "
        "Process Information:    New Process ID:  0x2bc    "
        "New Process Name:  C:\\Windows\\System32\\rundll32.exe    "
        "Token Elevation Type:  %%1938    "
        "Mandatory Label:  Mandatory Label\\Medium Mandatory Level    "
        "Creator Process ID:  0xe74    "
        "Process Command Line:  rundll32.exe C:\\x.dll,Go")
    r = snare_win_parse_row(tsv(4688, "Success Audit", d4688))
    w = r["win"]
    assert w["Event"] == {"EventID": 4688, "Category": "Process",
                          "Subtype": "Creation", "Outcome": "success"}
    # embedded section: 'Creator Subject:' opens the Subject section
    # (find_embedded_section_descriptor), prefix lands in Unparsed
    assert w["Subject"] == {
        "SecurityID": "S-1-5-18", "AccountName": "WIN-GG82ULGC9GO$",
        "AccountDomain": "WORKGROUP", "LogonID": "0x3E7"}
    assert "Creator" in w.get("Unparsed", [])
    assert w["Process"] == {
        "NewProcessID": "0x2bc",
        "NewProcessName": "C:\\Windows\\System32\\rundll32.exe",
        "TokenElevationType": "%%1938",
        "MandatoryLabel": "Mandatory Label\\Medium Mandatory Level",
        "CreatorProcessID": "0xe74",
        "ProcessCommandLine": "rundll32.exe C:\\x.dll,Go"}

    # batch surface: flattened convenience columns + nested JSON, and
    # agent-escaped #011 tabs decode identically
    lines = [tsv(4624, "Success Audit", d4624),
             tsv(4625, "Failure Audit", d4625).replace("\t", "#011"),
             "not windows", None]
    df = snare_win_parse(pd.Series(lines))
    assert list(df["parse_ok"]) == [True, True, False, False]
    assert df["category"][0] == "Logon" and df["outcome"][1] == "failure"
    assert df["subject_account"][1] == "DC01$"
    assert df["logon_type"][0] == 7
    assert json.loads(df["win"][1])["Failure"]["Status"] == "0xC000006D"


def test_mmsnareparse_rfc5424_envelope():
    """RFC5424-wrapped Snare events (mmsnareparse.c:3004-3045
    skip_rfc5424_header + the locate-payload scan): the decoder finds
    the MSWinEventLog payload past a full RFC5424 header including
    structured-data sections, and the RFC5424 token layout (version /
    record in place of criticality / counter — same indices,
    populate_event_metadata c:4610) decodes identically."""
    from rsyslog_ray.vendor import snare_win_parse_row

    desc = ("Special privileges assigned to new logon.    "
            "Subject:    Security ID:  S-1-5-18    "
            "Account Name:  SYSTEM    "
            "Privileges:  SeTcbPrivilege    SeSecurityPrivilege")
    body = ("MSWinEventLog\t1\tSecurity\t4242\t"
            "Fri Jan 05 10:00:00 2024\t4672\t"
            "Microsoft-Windows-Security-Auditing\tN/A\tN/A\t"
            "Success Audit\tDC01\tLogon\t" + desc)
    wrapped = ("<134>1 2024-01-05T10:00:00.123Z host01 snare 911 "
               "ID47 [origin@32473 ip=\"10.1.1.1\"][meta x=\"y\"] "
               + body)
    r = snare_win_parse_row(wrapped)
    assert r is not None
    assert r["event_id"] == 4672
    assert r["computer"] == "DC01"
    assert r["channel"] == "Security"
    assert r["snare_counter"] == "4242"       # RFC5424 'record' slot
    w = r["win"]
    assert w["Event"] == {"EventID": 4672, "Category": "Privilege",
                          "Subtype": "Assignment", "Outcome": "success"}
    assert w["Privileges"]["PrivilegeList"] == \
        "SeTcbPrivilege SeSecurityPrivilege"
    # same payload without any envelope decodes identically
    bare = snare_win_parse_row(body)
    assert bare["win"] == w and bare["event_id"] == 4672
