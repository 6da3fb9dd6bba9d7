"""Template engine: %property% text syntax parity with the option
semantics already pinned for the function library."""

import pandas as pd

from rsyslog_ray.template import Template, parse_template


def _df():
    return pd.DataFrame({
        "msg": ["alpha beta gamma", " leading", "with/slash\ttab"],
        "host": ["web01.example.com", "db02", "x"],
        "sev": [3, 7, 1],
        "ts": pd.to_datetime(["2026-01-04 05:06:07.123456"] * 3),
    })


def test_constants_fields_and_percent():
    t = Template("pri=%sev% on %host%, 100%% done")
    out = t.render(_df())
    assert out.iloc[0] == "pri=3 on web01.example.com, 100% done"


def test_substring_and_field_extraction():
    df = _df()
    # 1-based inclusive from:to (template.c do_Parameter)
    assert Template("%msg:1:5%").render(df).iloc[0] == "alpha"
    assert Template("%msg:7:$%").render(df).iloc[0] == "beta gamma"
    # F,32 = space-delimited field 2
    assert Template("%msg:F,32:2%").render(df).iloc[0] == "beta"
    # F,46 = dot-delimited field 1 of host
    assert Template("%host:F,46:1%").render(df).iloc[0] == "web01"


def test_regex_select_syntax():
    df = _df()
    t = Template(r"%msg:R,ere,0,1,BLANK:(\w+a)--end%")
    assert t.render(df).iloc[0] == "alpha"
    t2 = Template(r"%msg:R,ere,1,1,BLANK:(\w+a)--end%")
    assert t2.render(df).iloc[0] == "beta"
    t3 = Template(r"%msg:R,ere,0,1,DFLT:(zzz)--end%")
    assert t3.render(df).iloc[0] == "**NO MATCH**"


def test_case_cc_and_secpath_options():
    df = _df()
    assert Template("%host:::uppercase%").render(df).iloc[1] == "DB02"
    assert Template("%msg:::drop-cc%").render(df).iloc[2] == "with/slashtab"
    assert Template("%msg:::space-cc,compressspace%").render(df).iloc[2] \
        == "with/slash tab"
    assert Template("%msg:::secpath-replace%").render(df).iloc[2] \
        == "with_slash\ttab"
    assert Template("%msg:::secpath-drop%").render(
        pd.DataFrame({"msg": ["/", "..", "ok"]})).tolist() == ["_", "_.", "ok"]


def test_date_options():
    df = _df()
    assert Template("%ts:::date-mysql%").render(df).iloc[0] == \
        "20260104050607"
    assert Template("%ts:::date-rfc3164%").render(df).iloc[0] == \
        "Jan  4 05:06:07"
    assert Template("at %ts:::date-hour%:%ts:::date-minute%").render(
        df).iloc[0] == "at 05:06"


def test_escaping_options():
    df = pd.DataFrame({"m": ['say "hi", ok', "it's"]})
    assert Template("%m:::csv%").render(df).iloc[0] == '"say ""hi"", ok"'
    assert Template("%m:::stdsql%").render(df).iloc[1] == "it''s"
    assert Template("%m:::json%").render(df).iloc[0] == 'say \\"hi\\", ok'


def test_jsonf_render():
    df = _df()
    t = Template("%host:::jsonf%%sev:::jsonf%")
    out = t.render_jsonf(df)
    import json
    rec = json.loads(out.iloc[0])
    assert rec == {"host": "web01.example.com", "sev": "3"}


def test_parse_roundtrip_entry_count():
    es = parse_template("a%b%c%d:1:2%e")
    kinds = [(e.const is not None) for e in es]
    assert kinds == [True, False, True, False, True]


def test_list_template_datatype_onempty():
    """List-type templates: outname, datatype number/bool/auto,
    onEmpty keep/skip/null (template.h:170-183)."""
    import json

    from rsyslog_ray.template import Template

    df = pd.DataFrame({
        "host": ["web01", "", "db"],
        "sev": ["3", "7", ""],
        "flag": ["on", "0", "true"],
        "mixed": ["42", "abc", ""],
    })
    t = Template.from_list([
        {"name": "host", "outname": "hostname", "format": "jsonf"},
        {"name": "sev", "datatype": "number", "onEmpty": "skip"},
        {"name": "flag", "datatype": "bool"},
        {"name": "mixed", "datatype": "auto", "onEmpty": "null"},
    ])
    out = t.render_jsonf(df)
    r0 = json.loads(out.iloc[0])
    assert r0 == {"hostname": "web01", "sev": 3, "flag": True, "mixed": 42}
    r1 = json.loads(out.iloc[1])
    assert r1 == {"hostname": "", "sev": 7, "flag": False, "mixed": "abc"}
    r2 = json.loads(out.iloc[2])
    assert r2 == {"hostname": "db", "flag": True, "mixed": None}
    assert "sev" not in r2                       # onEmpty=skip
