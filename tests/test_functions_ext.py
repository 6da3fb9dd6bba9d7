"""New scalar-function surface: property-replacer options, date
formats, net/url functions (reference parity cited per function)."""

import pandas as pd
import pytest


def test_re_select_policies():
    from rsyslog_ray.functions import NOMATCH_DFLT, re_select

    s = pd.Series(["a1 b2 c3", "xyz", None])
    # match#/submatch#
    assert re_select(s, r"([a-z])(\d)", 0, 0).tolist()[0] == "a1"
    assert re_select(s, r"([a-z])(\d)", 1, 2).tolist()[0] == "2"
    assert re_select(s, r"([a-z])(\d)", 2, 1).tolist()[0] == "c"
    # no-match policies (row 'xyz' has no digit match)
    assert re_select(s, r"(\d)", 0, 1, "dflt").tolist()[1] == NOMATCH_DFLT
    assert re_select(s, r"(\d)", 0, 1, "blank").tolist()[1] == ""
    assert re_select(s, r"(\d)", 0, 1, "field").tolist()[1] == "xyz"
    assert re_select(s, r"(\d)", 0, 1, "zero").tolist()[1] == "0"
    # null input behaves as empty field
    assert re_select(s, r"(\d)", 0, 1, "blank").tolist()[2] == ""


def test_substring_fixed_width_cc():
    from rsyslog_ray.functions import (compress_sp, drop_cc, escape_cc,
                                       fixed_width, sp_if_no_1st_sp,
                                       space_cc, substring_end)

    s = pd.Series(["abcdefghij"])
    assert substring_end(s, 4, 2).tolist() == ["gh"]   # 4-from-end, len 2
    assert substring_end(s, 4, 4).tolist() == ["ghij"]
    assert fixed_width(pd.Series(["ab"]), 5).tolist() == ["ab   "]
    assert fixed_width(pd.Series(["abcdef"]), 5).tolist() == ["abcdef"]
    cc = pd.Series(["a\tb\x01c  d"])
    assert drop_cc(cc).tolist() == ["abc  d"]
    assert space_cc(cc).tolist() == ["a b c  d"]
    assert escape_cc(cc).tolist() == ["a#009b#001c  d"]
    assert escape_cc(cc, octal=True).tolist() == ["a#011b#001c  d"]
    assert compress_sp(cc).tolist() == ["a\tb\x01c d"]
    assert sp_if_no_1st_sp(pd.Series([" x", "y"])).tolist() == [" ", ""]


def test_scalar_gaps():
    from rsyslog_ray.functions import (b64_decode, b64_encode, int2hex,
                                       split, wrap)

    assert int2hex(pd.Series([255, 16])).tolist() == ["ff", "10"]
    assert wrap(pd.Series(["x"]), '"').tolist() == ['"x"']
    # 3-arg wrap: escape wrapper occurrences first (rainerscript.c:4493)
    assert wrap(pd.Series(['a"b']), '"', "'").tolist() == ['"a\'b"']
    e = b64_encode(pd.Series(["hello"]))
    assert e.tolist() == ["aGVsbG8="]
    assert b64_decode(e).tolist() == ["hello"]
    assert b64_decode(pd.Series(["!!notb64!!"])).tolist() == [""]
    assert split(pd.Series(["a,b,c"]), ",").tolist() == [["a", "b", "c"]]


def test_is_in_subnet():
    from rsyslog_ray.functions import is_in_subnet

    s = pd.Series(["10.1.2.3", "172.16.0.1", "172.32.0.1", "not-an-ip",
                   "10.300.0.1"])
    assert is_in_subnet(s, "10.0.0.0/8").tolist() == [True, False, False,
                                                      False, False]
    assert is_in_subnet(s, "172.16.0.0/12").tolist() == [False, True, False,
                                                         False, False]
    v6 = pd.Series(["2001:db8::1", "2001:db9::1", "bogus"])
    assert is_in_subnet(v6, "2001:db8::/32").tolist() == [True, False, False]


def test_faup_decompose():
    from rsyslog_ray.functions import faup_decompose

    u = faup_decompose(pd.Series([
        "https://user:pw@www.news.example.co:8443/a/b?x=1&y=2#frag",
        "example.com",
        "http://localhost/x",
    ]))
    r0 = u.iloc[0]
    assert r0["scheme"] == "https" and r0["credential"] == "user:pw"
    assert r0["host"] == "www.news.example.co"
    assert r0["subdomain"] == "www.news" and r0["domain"] == "example.co"
    assert r0["domain_without_tld"] == "example" and r0["tld"] == "co"
    assert r0["port"] == "8443" and r0["resource_path"] == "/a/b"
    assert r0["query_string"] == "x=1&y=2" and r0["fragment"] == "frag"
    r1 = u.iloc[1]
    assert r1["scheme"] == "" and r1["domain"] == "example.com"
    r2 = u.iloc[2]
    assert r2["host"] == "localhost" and r2["domain"] == "localhost"
    assert r2["tld"] == "" and r2["subdomain"] == ""


def test_format_time_all_named():
    from rsyslog_ray.functions import format_time

    ts = pd.Series(pd.to_datetime(["2026-01-04 05:06:07.123456",
                                   "2026-08-16 23:59:59.000001"]))
    got = {f: format_time(ts, f).tolist() for f in
           ["rfc3164", "rfc3164-buggyday", "mysql", "pgsql", "secfrac",
            "wdayname", "wday", "ordinal", "week", "isoweek",
            "isoweekyear", "tzoffsdirection"]}
    assert got["rfc3164"][0] == "Jan  4 05:06:07"     # space-padded day
    assert got["rfc3164-buggyday"][0] == "Jan 04 05:06:07"
    assert got["mysql"][0] == "20260104050607"        # 14-digit
    assert got["pgsql"][0] == "2026-01-04 05:06:07"
    assert got["secfrac"] == ["123456", "000001"]
    assert got["wdayname"] == ["Sun", "Sun"]
    assert got["wday"] == ["0", "0"]                  # 0 = Sunday
    assert got["ordinal"] == ["004", "228"]
    assert got["isoweek"][0] == "01"
    assert got["isoweekyear"][0] == "2026"
    assert got["tzoffsdirection"] == ["+", "+"]
    # reference getWeek pins Jan 1 as week start (datetime.c:1229):
    # 2026-01-01 is a Thursday (jan1Dow=4); Jan 4 is Sunday (dow 0 < 4)
    # -> ((3+6)//7)+1 = 2
    assert got["week"][0] == "02"


def test_mmanon_ipv6_zero():
    from rsyslog_ray.functions import anon_ipv6_zero

    s = pd.Series(["x 2001:db8:1:2:3:4:5:6 y", "no v6 here",
                   "fe80:0:0:1:aaaa:bbbb:cccc:dddd end"])
    out = anon_ipv6_zero(s)
    assert out.tolist() == ["x 2001:db8:1:2:0:0:0:0 y", "no v6 here",
                            "fe80:0:0:1:0:0:0:0 end"]


def test_parse_time_reference_semantics():
    """parse_time family vs the reference parsers (rainerscript.c
    doFunct_ParseTime/estimateYear, datetime.c ParseTIMESTAMP3339/
    3164/syslogTime2time_t): lenient digits, leap second, day
    overflow, tz offsets, Cisco/Brocade year variants, 0 on garbage
    and pre-1970 years."""
    import pandas as pd

    from rsyslog_ray import functions as F

    now = pd.Timestamp("2026-08-17 12:00:00", tz="UTC")
    ep = lambda s: int(pd.Timestamp(s, tz="UTC").timestamp())
    got = F.parse_time(pd.Series([
        "2024-01-01T00:00:00Z", "2003-08-24T05:14:15.000003-07:00",
        "2024-1-1T0:0:0+00:00", "Oct 11 22:14:15", "Jan  1 00:00:00",
        "garbage", "2024-13-01T00:00:00Z", "2024-01-01T00:00:60Z",
        "1969-01-01T00:00:00Z", "2008 Oct 11 22:14:15",
        "Oct 11 2009 22:14:15", "Feb 31 00:00:00",
        "2024-01-01T00:00:00Z trailing", "2024-01-01T00:00:00Zx",
    ]), now=now)
    assert got.tolist() == [
        1704067200, 1061727255, 1704067200,
        ep("2025-10-11 22:14:15"),       # Oct > Aug+1 -> last year
        ep("2026-01-01 00:00:00"),       # Jan in Aug -> this year
        0, 0,
        1704067200 + 60,                 # leap second
        0,                               # pre-1970 -> 0, parse ok
        ep("2025-10-11 22:14:15"),       # explicit year OVERRIDDEN
        ep("2025-10-11 22:14:15"),       # Cisco year overridden too
        ep("2026-03-03 00:00:00"),       # Feb 31 rolls over (non-leap)
        1704067200, 0,
    ]
    # script_error reflects the last call per row (EINVAL on no-parse)
    err = F.script_error()
    assert err.tolist() == [0, 0, 0, 0, 0, 1, 1, 0, 0, 0, 0, 0, 0, 1]
    # December/January year estimate wrap
    dec = F.parse_time(pd.Series(["Jan 05 00:00:00"]),
                       now=pd.Timestamp("2026-12-30", tz="UTC"))
    assert dec[0] == ep("2027-01-05 00:00:00")
    # is_time: format restriction + unix strings
    s = pd.Series(["Oct 11 22:14:15", "2024-01-01T00:00:00Z", "17", "x"])
    assert F.is_time(s).tolist() == [1, 1, 1, 0]
    assert F.is_time(s, "date-rfc3339").tolist() == [0, 1, 0, 0]
    assert F.is_time(s, "date-unix").tolist() == [0, 0, 1, 0]
    assert F.is_time(s, "bogus-fmt").tolist() == [0, 0, 0, 0]
    # localtz: 3339 unchanged, 3164 shifted by gmtoff
    lz = F.parse_time_localtz(s.head(2), now=now, gmtoff=3600)
    assert lz[0] == ep("2025-10-11 22:14:15") - 3600
    assert lz[1] == ep("2024-01-01 00:00:00")


def test_cef_and_control_functions(monkeypatch):
    """tocef / cef_ext_escape (rainerscript.c:3324-3412) and the
    control functions (getenv, random, script_error,
    previous_action_suspended)."""
    import numpy as np
    import pandas as pd

    from rsyslog_ray import functions as F

    cef = F.tocef("0", "Vendor|Inc", "prod\\x", "1.0",
                  pd.Series(["id=7|x", "plain"]),
                  pd.Series(["name|1", "n"]), "5",
                  "src=" + F.cef_ext_escape(pd.Series(["a=b\\c", "d"])))
    assert cef[0] == ("CEF:0|Vendor\\|Inc|prod\\\\x|1.0|"
                      "id\\=7\\|x|name\\|1|5|src=a\\=b\\\\c")
    assert cef[1] == "CEF:0|Vendor\\|Inc|prod\\\\x|1.0|plain|n|5|src=d"
    # eventclassid extra escapes: % and #
    assert F.cef_eventclassid_escape(pd.Series(["a%b#c"]))[0] == \
        "a\\%b\\#c"
    # ext escaping of newlines
    assert F.cef_ext_escape(pd.Series(["a\nb\rc"]))[0] == "a\\nb\\rc"

    monkeypatch.setenv("RAYLOG_TEST_VAR", "hello")
    assert F.getenv_fn("RAYLOG_TEST_VAR") == "hello"
    assert F.getenv_fn("RAYLOG_MISSING_VAR") == ""

    rng = np.random.default_rng(7)
    r = F.random_gen(pd.Series([10, 0, -5, 1]), rng=rng)
    assert ((r >= 0) & (r < pd.Series([10, 1, 5, 1]))).all()
    assert r[1] == 0 and r[3] == 0          # max 0 -> 0; max 1 -> 0
    assert F.random_gen(0) == 0
    assert 0 <= F.random_gen(100, rng=np.random.default_rng(1)) < 100

    assert F.previous_action_suspended() == 0
    F.set_prev_action_suspended(True)
    assert F.previous_action_suspended() == 1
    F.set_prev_action_suspended(False)


def test_exec_template_in_conf(ray_session, tmp_path):
    """exec_template (rainerscript.c doFunc_exec_template:1784): a
    declared template rendered into a computed column via set $x =
    exec_template("name")."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rainerconf import parse_rainer

    src = pd.DataFrame({"host": ["h1", "h2"], "msg": ["a", "b"]})
    data = tmp_path / "in"
    data.mkdir()
    src.to_parquet(data / "pages-0.parquet", index=False)
    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="DATA/pages-*.parquet")
    template(name="line" type="string" string="%host%: %msg%")
    set $rendered = exec_template("line");
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("DATA", str(data))
    cfg = parse_rainer(conf)
    cfg["output"]["full_sinks"] = ["archive"]
    cfg["aggregates"] = [["host", "host"]]
    run_config(cfg, resume=False, lineage=False)
    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                      recursive=True)
    t = pd.concat([pq.read_table(f).to_pandas() for f in files]) \
        .sort_values("host")
    assert t["rendered"].tolist() == ["h1: a", "h2: b"]


def test_get_property():
    """get_property (rainerscript doFunc_get_property): dict key,
    array index, JSON-string value rendering, miss -> ''."""
    import pandas as pd

    from rsyslog_ray.functions import get_property

    s = pd.Series(['{"a": "x", "n": 5, "b": true, "o": {"k": 1},'
                   ' "l": [1, 2], "z": null}',
                   '[10, 20, 30]', "not json", ""])
    assert get_property(s, "a").tolist() == ["x", "", "", ""]
    assert get_property(s, "n")[0] == "5"
    assert get_property(s, "b")[0] == "true"
    assert get_property(s, "o")[0] == '{"k":1}'
    assert get_property(s, "l")[0] == "[1,2]"
    assert get_property(s, "z")[0] == ""
    assert get_property(s, 1).tolist() == ["", "20", "", ""]
    assert get_property(s, "missing").tolist() == ["", "", "", ""]


def test_canonical_url():
    """URL canonicalization: vectorized == scalar spec element-wise;
    canonicalization is idempotent; tracking params die, real params
    sort, default ports and fragments drop."""
    import pandas as pd

    from rsyslog_ray.functions import canonical_url, canonical_url_row

    urls = [
        "HTTP://WWW.Example.COM:80/Path/Page?utm_source=x&b=2&a=1#frag",
        "https://example.com:443/",
        "https://example.com",
        "http://example.com:8080/x?gclid=abc",
        "https://user:pw@Www.Site.org/a/b?z=9&utm_campaign=c&y=8",
        "ftp://files.example.net:21/pub",
        "https://example.com/p?a=1&a=0",
        "https://sub.www.example.com/keep-www-inside",
    ]
    got = canonical_url(pd.Series(urls)).tolist()
    want = [canonical_url_row(u) for u in urls]
    assert got == want
    # rules
    assert got[0] == "http://example.com/Path/Page?a=1&b=2"
    assert got[1] == got[2] == "https://example.com/"
    assert got[3] == "http://example.com:8080/x"      # non-default port kept
    assert got[7].startswith("https://sub.www.")      # only LEADING www.
    # idempotent
    assert canonical_url(pd.Series(got)).tolist() == got
    # no-www mode
    assert canonical_url(pd.Series(["https://www.a.com/x"]),
                         strip_www=False).iloc[0] == "https://www.a.com/x"


def test_cbool_re_i_append_json():
    """cbool (rsyslogBoolTextToNumber rainerscript.c:2273-2303),
    re_match_i/re_extract_i (REG_ICASE, rainerscript.c:4483-4485),
    append_json (rainerscript.c:3614-3708)."""
    import pandas as pd

    from rsyslog_ray.functions import (append_json, cbool, re_extract_i,
                                       re_match_i)

    # cbool string semantics: trim + case-insensitive falsy words
    s = pd.Series([" no ", "OFF", "False", "0", "", None,
                   "yes", "1", "00", "anything", " true "])
    assert cbool(s).tolist() == [0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 1]
    # numeric: != 0
    assert cbool(pd.Series([0, 1, -3, None])).tolist() == [0, 1, 1, 0]

    # case-insensitive regex pair
    t = pd.Series(["Hello World", "hello", "bye", None])
    assert re_match_i(t, r"^HELLO").tolist() == [True, True, False, False]
    assert re_extract_i(t, r"(HEL+O)", 1).tolist()[:2] == ["Hello", "hello"]

    # append_json: array append (string + per-row value), object set,
    # invalid/scalar/2-arg-object -> JSON null
    js = pd.Series(['[1,2]', '{"a":1}', 'not json', '"scalar"'])
    out = append_json(js, "x").tolist()
    assert out == ['[1,2,"x"]', "null", "null", "null"]
    out3 = append_json(js, pd.Series([9, 8, 7, 6], index=js.index),
                       key="k").tolist()
    assert out3 == ["[1,2,9]", '{"a":1,"k":8}', "null", "null"]


def test_pcre_match_is_perl_compatible():
    """fmpcre pcre_match (fmpcre.c:31-93): Perl-compatible syntax
    (\\d, lookahead) that POSIX ERE re_match wouldn't guarantee."""
    import pandas as pd

    from rsyslog_ray.functions import pcre_match

    t = pd.Series(["id=42 ok", "id=xx no", "pw: hunter2!", None])
    assert pcre_match(t, r"id=\d+").tolist() == [True, False, False,
                                                 False]
    assert pcre_match(t, r"pw: (?=\w+\d)").tolist() == [False, False,
                                                        True, False]


def test_pcre_match_in_conf_filter():
    """pcre_match() usable in .conf if-filters like re_match
    (fmpcre registers it in the same function table the grammar
    resolves, fmpcre.c:93)."""
    from rsyslog_ray.rainerconf import parse_rainer
    from rsyslog_ray.router import _eval_row

    cfg = parse_rainer(
        'if pcre_match($msg, "er{2}or \\\\d+") then '
        'action(type="omfile" file="x")\n')
    pred = cfg["routes"][0]["pred"]
    assert pred == ["regex", "msg", "er{2}or \\d+"]
    assert _eval_row(tuple(pred), {"msg": "error 17 hit"})
    assert not _eval_row(tuple(pred), {"msg": "eror 2"})
    assert not _eval_row(tuple(pred), {"msg": "error x"})


def test_unflatten_fmunflatten():
    """unflatten(src, delim) — contrib/fmunflatten/fmunflatten.c:
    intermediate segments nest (overriding non-objects), final object
    values recurse (their keys split too), arrays deep-copy without
    recursion, delim accepts a 1-char string or a charcode, and
    invalid delim / non-JSON rows return "0" with errno EINVAL."""
    import json

    import pandas as pd

    from rsyslog_ray.functions import (SCRIPT_EINVAL, SCRIPT_EOK,
                                       script_error, unflatten,
                                       unflatten_row)

    # basic nesting + sibling merge
    assert json.loads(unflatten_row('{"a.b.c":1,"a.b.d":2}', ".")) == \
        {"a": {"b": {"c": 1, "d": 2}}}
    # intermediate override: scalar "a" replaced by an object
    assert json.loads(unflatten_row('{"a":1,"a.b":2}', ".")) == \
        {"a": {"b": 2}}
    # final object value recurses and MERGES into the existing object
    assert json.loads(unflatten_row(
        '{"a.b":"v","a":{"c.d":1}}', ".")) == \
        {"a": {"b": "v", "c": {"d": 1}}}
    # arrays are not recursed into (fmunflatten.c final-node else arm)
    assert json.loads(unflatten_row('{"a.b":[1,{"c.d":2}]}', ".")) == \
        {"a": {"b": [1, {"c.d": 2}]}}
    # empty segments from consecutive delimiters are real keys
    assert json.loads(unflatten_row('{"a..b":1}', ".")) == \
        {"a": {"": {"b": 1}}}
    # charcode delim (datatype 'N'): 47 == "/"
    assert json.loads(unflatten_row('{"x/y":3}', 47)) == {"x": {"y": 3}}
    # non-object JSON passes through as a deep copy
    assert unflatten_row('[1,2]', ".") == "[1,2]"
    assert unflatten_row('3', ".") == "3"
    # segment truncation at the reference's 255-char kbuf bound
    long = "k" * 300
    out = json.loads(unflatten_row(json.dumps({long + ".v": 1}), "."))
    assert list(out) == ["k" * 255]

    # vectorized form + errno contract
    s = pd.Series(['{"a.b":1}', "not json", "[5]"])
    got = unflatten(s, ".")
    assert got.tolist() == ['{"a":{"b":1}}', "0", "[5]"]
    assert script_error().tolist() == [SCRIPT_EOK, SCRIPT_EINVAL,
                                       SCRIPT_EOK]
    # invalid delimiter (multi-char / zero) fails every row
    got = unflatten(s, "..")
    assert got.tolist() == ["0", "0", "0"]
    assert (script_error() == SCRIPT_EINVAL).all()


def test_unflatten_in_conf_set():
    """unflatten is callable from a .conf set-statement (fmunflatten
    registers in the rscript function table its MODULE_TYPE_FUNCTION
    exposes)."""
    import pandas as pd

    from rsyslog_ray.config import eval_set_expr

    df = pd.DataFrame({"js": ['{"m.n":7}', '{"m":{"p.q":0}}']})
    expr = ["call", "unflatten", [["prop", "js"], ["lit", "."]]]
    out = eval_set_expr(expr, lambda n: df[n])
    assert out.tolist() == ['{"m":{"n":7}}', '{"m":{"p":{"q":0}}}']


# ---------------------------------------------------------------------
# property fuzz: canonical_url vectorized == scalar spec on generated
# component combinations (schemes/case/www/ports/tracking params/
# fragments/credentials)

from hypothesis import HealthCheck as _HC
from hypothesis import given as _given
from hypothesis import settings as _settings
from hypothesis import strategies as _st

_host_label = _st.text(alphabet="abcdefgXYZ019-", min_size=1, max_size=8)
_url_parts = _st.tuples(
    _st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp", ""]),
    _st.sampled_from(["", "user", "u:p"]),                # credential
    _st.booleans(),                                       # leading www.
    _st.lists(_host_label, min_size=1, max_size=3),
    _st.sampled_from(["", ":80", ":443", ":8080", ":21"]),
    _st.sampled_from(["", "/", "/A/b", "/x%20y"]),
    _st.lists(_st.sampled_from(
        ["utm_source=x", "UTM_X=1", "gclid=g", "fbclid=f", "page=2",
         "b=1", "a=2", "a=1", "empty=", "noval"]), max_size=4),
    _st.sampled_from(["", "#frag", "#a?b=1"]))


@_given(_st.lists(_url_parts, min_size=1, max_size=10))
@_settings(max_examples=60, deadline=None,
           suppress_health_check=[_HC.too_slow])
def test_canonical_url_fuzz(parts_list):
    from rsyslog_ray import functions as F

    urls = []
    for scheme, cred, www, labels, port, path, params, frag in parts_list:
        host = ("www." if www else "") + ".".join(labels)
        u = (f"{scheme}://" if scheme else "") + \
            (f"{cred}@" if cred else "") + host + port + path
        if params:
            u += "?" + "&".join(params)
        u += frag
        urls.append(u)
    got = F.canonical_url(pd.Series(urls))
    for u, g in zip(urls, got):
        assert g == F.canonical_url_row(u), u


def test_set_registry_covers_reference_function_table():
    """Every entry of the reference's script-function table
    (grammar/rainerscript.c:4420-4510 doFunct registry) is reachable
    from .conf set-expressions — via the value registry, a
    special-cased evaluator path, or the grammar itself."""
    from rsyslog_ray.config import _set_registry

    reference_table = {
        "append_json", "b64_decode", "cbool", "cef_ext_escape", "cnum",
        "cstr", "dyn_inc", "exec_template", "field", "format_time",
        "get_property", "getenv", "int2hex", "ip42num", "ipv42num",
        "is_in_subnet", "is_time", "lookup", "ltrim", "num2ipv4",
        "parse_json", "parse_time", "parse_time_localtz",
        "percentile_observe", "previous_action_suspended", "prifilt",
        "random", "re_extract", "re_extract_i", "re_match",
        "re_match_i", "replace", "rtrim", "script_error", "split",
        "strlen", "substring", "tocef", "tolower", "toupper", "wrap",
    }
    special_cased = {
        "lookup", "exec_template",          # eval_set_expr branches
        "dyn_inc", "percentile_observe",    # rainerconf stats compile
        "prifilt",       # the grammar's fac.sev selectors / PRIFILT
        "parse_json",    # container-setting: mmjsonparse stage +
                         # flatten/unflatten transforms own this shape
    }
    missing = reference_table - set(_set_registry()) - special_cased
    assert not missing, sorted(missing)
