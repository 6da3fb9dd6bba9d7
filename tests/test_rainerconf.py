"""RainerScript text front-end: .conf text compiles to the Router AST
and runs end-to-end identically to the same pipeline in JSON form."""

import os

import pandas as pd

from rsyslog_ray.rainerconf import parse_rainer

CONF = r'''
# rsyslog.conf-style pipeline
module(load="imfile")
global(workDirectory="/tmp/raylog-out")
input(type="imfile" file="/data/pages-*.parquet")

if $parse_ok == "off" then { action(type="omfile" file="deadletter") stop }
if $category == "spam" then { action(type="omfile" file="spam.log") stop }
if $p_sev <= 3 then action(type="omfile" file="errors")
:p_msg, contains, "fail" action(type="omfile" file="failures")
if $lang == "en" and $category == "news" then
    action(type="omfile" file="en_news")
if re_match($url, "id=\d*7$") then action(type="omfile" file="lucky7")
if not ($p_bytes < 60000) then action(type="omfile" file="bigpages")
:p_host, !startswith, "h00" action(type="omdiscard")
*.* action(type="omfile" file="archive")
'''


def test_parse_rainer_routes():
    cfg = parse_rainer(CONF)
    assert cfg["modules"] == ["imfile"]
    assert cfg["output"]["dir"] == "/tmp/raylog-out"
    assert cfg["input"]["paths"] == ["/data/pages-*.parquet"]
    r = cfg["routes"]
    assert r[0] == {"sink": "deadletter",
                    "pred": ["==", "parse_ok", False], "stop": True}
    assert r[1] == {"sink": "spam",
                    "pred": ["==", "category", "spam"], "stop": True}
    assert r[2] == {"sink": "errors",
                    "pred": ["<=", "p_sev", 3], "stop": False}
    assert r[3] == {"sink": "failures",
                    "pred": ["contains", "p_msg", "fail"], "stop": False}
    assert r[4] == {"sink": "en_news",
                    "pred": ["and", ["==", "lang", "en"],
                             ["==", "category", "news"]], "stop": False}
    assert r[5] == {"sink": "lucky7",
                    "pred": ["regex", "url", r"id=\d*7$"], "stop": False}
    assert r[6] == {"sink": "bigpages",
                    "pred": ["not", ["<", "p_bytes", 60000]], "stop": False}
    assert r[7] == {"sink": "discard",
                    "pred": ["not", ["startswith", "p_host", "h00"]],
                    "stop": True}
    assert r[8] == {"sink": "archive", "pred": ["true"], "stop": False}


def test_rainer_runs_end_to_end(ray_session, pages_small, tmp_path):
    """A .conf-described pipeline over parsed pages delivers the same
    rows as the identical JSON config."""
    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUTDIR")
    input(type="imfile" file="PAGES/pages-*.parquet")
    if $parse_ok == "off" then { action(type="omfile" file="dead") stop }
    if $p_sev <= 3 then action(type="omfile" file="errors")
    *.* action(type="omfile" file="archive")
    '''.replace("OUTDIR", str(tmp_path / "rainer_out")).replace(
        "PAGES", pages_small)
    cfg = parse_rainer(conf)
    # attach the parse rules (the text front-end covers routing; the
    # rulebase comes from the library, as module binding would)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern, "types": r.types}
                    for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["archive"]
    agg = run_config(cfg, resume=False, lineage=False)

    jcfg = dict(cfg)
    jcfg["output"] = dict(cfg["output"], dir=str(tmp_path / "json_out"))
    agg2 = run_config(jcfg, resume=False, lineage=False)
    pd.testing.assert_frame_equal(agg.reset_index(drop=True),
                                  agg2.reset_index(drop=True))
    assert set(agg["sink"]) == {"dead", "errors", "archive"}
    assert os.path.isdir(str(tmp_path / "rainer_out" / "archive"))


def test_rainer_template_sink(ray_session, pages_small, tmp_path):
    """template() objects wired to action(template=...) render .log
    lines through the template engine (omfile line-output analog)."""
    import glob

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    template(name="line" type="string"
             string="%p_host% sev=%p_sev% %p_msg:::uppercase%")
    if $p_sev <= 3 then action(type="omfile" file="errors"
                               template="line")
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern, "types": r.types}
                    for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["errors", "archive"]
    run_config(cfg, resume=False, lineage=False)
    logs = glob.glob(str(tmp_path / "o" / "errors" / "**" / "*.log"),
                     recursive=True)
    assert logs
    line = open(logs[0]).readline().strip()
    # host, numeric severity, uppercased message
    parts = line.split(" sev=")
    assert parts[0].startswith("h")
    sev, msg = parts[1].split(" ", 1)
    assert int(sev) <= 3
    assert msg == msg.upper() and msg


def test_set_statements(ray_session, pages_small, tmp_path):
    """set $x = expr (S_SET): computed columns from the .conf front-end
    — function calls, & concatenation, routable downstream."""
    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    set $app_up = toupper($p_app);
    set $tag = $p_host & "/" & $app_up;
    set $f2 = field($p_msg, " ", 2);
    if $app_up == "NGINX" then action(type="omfile" file="nginx")
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    assert cfg["computed"][0] == {"column": "app_up",
                                  "expr": ["call", "toupper",
                                           [["prop", "p_app"]]]}
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern, "types": r.types}
                    for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["nginx", "archive"]
    run_config(cfg, resume=False, lineage=False)

    import glob

    import pyarrow.parquet as pq
    files = glob.glob(str(tmp_path / "o" / "nginx" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    t = pq.read_table(files[0]).to_pandas()
    assert (t["app_up"] == "NGINX").all()
    assert (t["tag"] == t["p_host"] + "/" + t["app_up"]).all()
    assert (t["f2"] == t["p_msg"].str.split(" ").str[1].fillna("")).all()


def test_classic_selectors():
    """Classic syslog.conf selector lines: facility.severity with
    at-least-as-severe semantics and wildcards."""
    cfg = parse_rainer('''
    mail.err action(type="omfile" file="mailerr")
    mail.* action(type="omfile" file="allmail")
    *.crit action(type="omfile" file="crit")
    local0.warning action(type="omfile" file="l0")
    ''')
    r = cfg["routes"]
    assert r[0]["pred"] == ["and", ["==", "facility", 2],
                            ["prifilt", "severity", 0, 3]]
    assert r[1]["pred"] == ["==", "facility", 2]
    assert r[2]["pred"] == ["prifilt", "severity", 0, 2]
    assert r[3]["pred"] == ["and", ["==", "facility", 16],
                            ["prifilt", "severity", 0, 4]]

    # semantics through the Router on a parsed frame
    import pandas as pd

    from rsyslog_ray.config import _to_pred
    from rsyslog_ray.router import Route, Router

    df = pd.DataFrame({"facility": [2, 2, 4, 2], "severity": [3, 6, 1, 0]})
    router = Router([Route(x["sink"], _to_pred(x["pred"])) for x in r])
    masks = router.masks(df)
    assert masks["mailerr"].tolist() == [True, False, False, True]
    assert masks["allmail"].tolist() == [True, True, False, True]
    assert masks["crit"].tolist() == [False, False, True, True]


def test_list_template_jsonf_sink(ray_session, pages_small, tmp_path):
    """template(type="list") with jsonf fields renders n/v JSON lines
    through the sink (tplToJSON end-to-end)."""
    import glob
    import json as _json

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = '''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    template(name="j" type="list") {
        property(name="p_host" outname="host" format="jsonf")
        property(name="p_sev" outname="severity" format="jsonf"
                 datatype="number")
        property(name="p_msg" outname="msg" format="jsonf"
                 onEmpty="null")
    }
    if $p_sev <= 3 then action(type="omfile" file="errors" template="j")
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern, "types": r.types}
                    for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["errors", "archive"]
    run_config(cfg, resume=False, lineage=False)
    logs = glob.glob(str(tmp_path / "o" / "errors" / "**" / "*.log"),
                     recursive=True)
    assert logs
    rec = _json.loads(open(logs[0]).readline())
    assert set(rec) == {"host", "severity", "msg"}
    assert isinstance(rec["severity"], int) and rec["severity"] <= 3


def test_ruleset_call_and_else():
    """ruleset()/call (S_CALL, spliced with the guarding condition
    ANDed on) and if/then/else (else carries the negated condition)."""
    cfg = parse_rainer('''
    ruleset(name="sec") {
        mail.err action(type="omfile" file="mailerr")
        if $sev <= 1 then { action(type="omfile" file="page") stop }
    }
    if $app == "sshd" then call sec;
    if $sev <= 3 then action(type="omfile" file="err")
    else action(type="omfile" file="rest")
    *.* action(type="omfile" file="archive")
    ''')
    r = cfg["routes"]
    assert r[0]["sink"] == "mailerr"
    assert r[0]["pred"][0] == "and" and r[0]["pred"][1] == \
        ["==", "app", "sshd"]
    assert r[1] == {"sink": "page",
                    "pred": ["and", ["==", "app", "sshd"],
                             ["<=", "sev", 1]], "stop": True}
    assert r[2]["pred"] == ["<=", "sev", 3]
    assert r[3] == {"sink": "rest", "pred": ["not", ["<=", "sev", 3]],
                    "stop": False}
    assert r[4]["pred"] == ["true"]
    # unconditional call splices verbatim
    cfg2 = parse_rainer('''
    ruleset(name="x") { *.crit action(type="omfile" file="c") }
    call x;
    ''')
    assert cfg2["routes"] == [{"sink": "c",
                               "pred": ["prifilt", "severity", 0, 2],
                               "stop": False}]


def test_foreach_explode(ray_session, tmp_path):
    """foreach ($.x in $!arr) do ... done (S_FOREACH, grammar.y
    FOREACH / ruleset.c:377-402): the .conf front-end unnests a JSON
    array column end-to-end — one output row per element, iterator
    bound as a column, body set/action statements applied per element,
    empty/invalid arrays iterate zero times."""
    import glob

    import pyarrow.parquet as pq

    src = pd.DataFrame({
        "doc": ["a", "b", "c", "d"],
        "words": ['["x","y"]', '["z"]', "[]", "not json"],
    })
    data = tmp_path / "in"
    data.mkdir()
    src.to_parquet(data / "pages-0.parquet", index=False)

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="DATA/pages-*.parquet")
    foreach ($.w in $!words) do
        set $wu = toupper($.w);
        if $wu == "X" then action(type="omfile" file="exes")
    done
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("DATA", str(data))
    cfg = parse_rainer(conf)
    assert cfg["foreach"] == [{"var": "w", "source": "words"}]
    cfg["output"]["full_sinks"] = ["exes", "archive"]
    cfg["aggregates"] = [["doc", "doc"]]
    from rsyslog_ray.config import run_config
    run_config(cfg, resume=False, lineage=False)

    arch = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                     recursive=True)
    t = (pd.concat([pq.read_table(f).to_pandas() for f in arch])
         .sort_values(["doc", "w"]).reset_index(drop=True))
    # q_explode_words semantics: one row per element; c (empty) and d
    # (invalid) vanish
    assert list(zip(t["doc"], t["w"])) == [("a", "x"), ("a", "y"),
                                           ("b", "z")]
    assert t["wu"].tolist() == ["X", "Y", "Z"]
    exes = glob.glob(str(tmp_path / "o" / "exes" / "**" / "*.parquet"),
                     recursive=True)
    te = pd.concat([pq.read_table(f).to_pandas() for f in exes])
    assert list(zip(te["doc"], te["w"])) == [("a", "x")]


def test_arithmetic_array_exists_filters():
    """RainerScript expression completeness (grammar/grammar.y:100-123
    arithmetic %left chains, rainerscript.c:3752-3776 array membership,
    rainerscript.c:3097-3110 exists()): the .conf front-end compiles
    `if $!n * 8 + $!m >= 13`, `$!tag == ["a","b"]` and `exists($!x)`
    to vectorized masks identical to the hand-built Router AST, across
    all three evaluation paths (pandas / per-row / Arrow)."""
    import numpy as np
    import pyarrow as pa

    from rsyslog_ray.config import _to_pred
    from rsyslog_ray.router import _eval_row, _mask, _mask_arrow

    cfg = parse_rainer('''
    if $!n * 8 + $!m >= 13 then action(type="omfile" file="arith")
    if $!tag == ["beta", "alpha"] then action(type="omfile" file="member")
    if $!tag != ["beta", "alpha"] then action(type="omfile" file="notmem")
    if exists($!x) then action(type="omfile" file="hasx")
    if ($!n + 1) * 2 > 4 then action(type="omfile" file="parens")
    if $!n % 3 == 1 then action(type="omfile" file="mod")
    ''')
    r = cfg["routes"]
    # compiled ASTs are exactly the Router tuple forms
    assert r[0]["pred"] == [">=", ["arith", "+",
                                   ["arith", "*", ["col", "n"], ["lit", 8]],
                                   ["col", "m"]], ["lit", 13]]
    assert r[1]["pred"] == ["in", "tag", ["alpha", "beta"]]
    assert r[2]["pred"] == ["not", ["in", "tag", ["alpha", "beta"]]]
    assert r[3]["pred"] == ["exists", "x"]
    assert r[5]["pred"] == ["==", ["arith", "%", ["col", "n"], ["lit", 3]],
                            ["lit", 1]]

    df = pd.DataFrame({
        "n": [1, 2, 0, None, 4],
        "m": [5, 1, 13, 1, 0],
        "tag": ["alpha", "x", "beta", None, "alpha"],
        "x": ["1", None, "v", None, "0"],
    })
    expect = {
        # n*8+m: 13, 17, 13, NaN, 32  (null arithmetic -> False)
        "arith": [True, True, True, False, True],
        "member": [True, False, True, False, True],
        "notmem": [False, True, False, True, False],
        "hasx": [True, False, True, False, True],
        # (n+1)*2: 4, 6, 2, NaN, 10
        "parens": [False, True, False, False, True],
        # n%3: 1, 2, 0, NaN, 1
        "mod": [True, False, False, False, True],
    }
    t = pa.Table.from_pandas(df)
    for route in r:
        pred = _to_pred(route["pred"])
        want = expect[route["sink"]]
        assert _mask(pred, df).tolist() == want, route["sink"]
        assert [_eval_row(pred, row) for row in
                df.to_dict("records")] == want, route["sink"]
        got = _mask_arrow(pred, t)
        assert (np.asarray(got) if isinstance(got, pa.Array)
                else got.to_pandas().fillna(False)).tolist() == want, \
            route["sink"]

    # a missing column: exists() is False everywhere, not an error
    missing = _to_pred(["exists", "nope"])
    assert _mask(missing, df).tolist() == [False] * 5
    assert not any(_eval_row(missing, row) for row in df.to_dict("records"))
    assert np.asarray(_mask_arrow(missing, t)).tolist() == [False] * 5


def test_set_arithmetic():
    """set $x = arithmetic (grammar.y:100-123 in set_stmt): computed
    columns evaluate + - * / % vectorized with float64/NaN-null
    semantics matching the Router expression paths."""
    from rsyslog_ray.config import eval_set_expr, _to_pred

    cfg = parse_rainer('''
    set $score = $!n * 8 + $!m - 1;
    set $frac = ($!n + 1) / 4;
    set $neg = -3;
    set $mixed = cstr($!n * 2) & "x";
    ''')
    exprs = {c["column"]: _to_pred(c["expr"]) for c in cfg["computed"]}
    df = pd.DataFrame({"n": [1, 2, None], "m": [5.0, 1.0, 2.0]})
    get = lambda name: df[name]
    score = eval_set_expr(exprs["score"], get)
    assert score.tolist()[:2] == [12.0, 16.0]
    assert pd.isna(score.iloc[2])
    assert eval_set_expr(exprs["frac"], get).tolist()[:2] == [0.5, 0.75]
    assert eval_set_expr(exprs["neg"], get) == -3
    # arithmetic is float64 (router._num_pd semantics), so cstr renders
    # the float repr
    assert eval_set_expr(exprs["mixed"], get).tolist()[:2] == \
        ["2.0x", "4.0x"]


def test_re_match_i_in_conf():
    """re_match_i (rainerscript.c:4483 REG_ICASE) compiles to the regex
    predicate with an inline (?i), valid for both re and RE2 paths."""
    from rsyslog_ray.router import _eval_row

    cfg = parse_rainer(
        'if re_match_i($url, "LOGIN") then action(type="omfile" file="x")\n')
    pred = cfg["routes"][0]["pred"]
    assert pred == ["regex", "url", "(?i)LOGIN"]
    assert _eval_row(tuple(pred), {"url": "https://a/Login"})
    assert not _eval_row(tuple(pred), {"url": "https://a/out"})


def test_lookup_in_set_statement(ray_session, pages_small, tmp_path):
    """set $x = lookup("tbl", $key) — the stateful script function
    (rainerscript.c doFunct_Lookup over runtime/lookup.c:400-416)
    against a declared lookup_table object, evaluated vectorized with
    the broadcast table (never a shuffle join); unknown table yields
    the nomatch ''."""
    import json

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    lkp = tmp_path / "apptype.lkp_tbl"
    lkp.write_text(json.dumps({
        "version": 1, "nomatch": "other", "type": "string",
        "table": [{"index": "nginx", "value": "web"},
                  {"index": "postgres", "value": "db"}]}))
    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    lookup_table(name="apptype" file="LKP")
    set $atype = lookup("apptype", $p_app);
    set $missing = lookup("no_such_table", $p_app);
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")) \
       .replace("PAGES", pages_small).replace("LKP", str(lkp))
    cfg = parse_rainer(conf)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["archive"]
    run_config(cfg, resume=False, lineage=False)

    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                      recursive=True)
    assert files
    t = pd.concat([pq.read_table(f).to_pandas() for f in files])
    want = t["p_app"].map({"nginx": "web", "postgres": "db"}) \
        .fillna("other")
    assert list(t["atype"]) == list(want)
    assert (t["missing"] == "").all()


def test_dyn_inc_in_conf(ray_session, pages_small, tmp_path):
    """dyn_inc("bucket", key) (rainerscript.c doFunct_DynInc) in both
    reference idioms — `set $.x = dyn_inc(...)` and a bare call —
    compiles to keyed aggregates: final counts ride the existing
    combiner-partial channel into the returned frame / _metrics."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    set $.r = dyn_inc("by_app", $p_app);
    dyn_inc("by_tag", $p_host & "/" & $p_app);
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    assert ["by_app", "p_app"] in cfg["aggregates"]
    assert ["by_tag", "__dyn_by_tag"] in cfg["aggregates"]
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["archive"]
    agg = run_config(cfg, resume=False, lineage=False)

    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                      recursive=True)
    t = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert (t["r"] == 0).all()            # dyn_inc returns success 0
    by_app = agg[agg["kind"] == "by_app"].set_index("key")["cnt"]
    want_app = t["p_app"].value_counts()
    for k, v in want_app.items():
        assert int(by_app[k]) == int(v), k
    by_tag = agg[agg["kind"] == "by_tag"].set_index("key")["cnt"]
    want_tag = (t["p_host"] + "/" + t["p_app"]).value_counts()
    for k, v in want_tag.items():
        assert int(by_tag[k]) == int(v), k


def test_percentile_observe_in_conf(ray_session, pages_small, tmp_path):
    """percentile_observe("name", $val) (perctile_stats analog): the
    observation compiles to DDSketch bin labels on the aggregate
    channel; quantiles_from_bins answers p50/p95 within the sketch's
    relative-error bound of the exact percentiles."""
    import glob

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE
    from rsyslog_ray.stages.sketch import quantiles_from_bins

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    percentile_observe("sz", $p_bytes);
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    assert ["pctl:sz", "__pctl_sz"] in cfg["aggregates"]
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["archive"]
    agg = run_config(cfg, resume=False, lineage=False)

    bins = agg[agg["kind"] == "pctl:sz"]
    got = quantiles_from_bins(bins["key"], bins["cnt"], [0.5, 0.95])

    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                      recursive=True)
    vals = pd.concat([pq.read_table(f, columns=["p_bytes"]).to_pandas()
                      for f in files])["p_bytes"]
    vals = pd.to_numeric(vals, errors="coerce").dropna()
    vals = vals[vals >= 0]
    for q in (0.5, 0.95):
        exact = float(np.quantile(vals, q))
        assert abs(got[q] - exact) <= max(0.03 * exact, 1.0), \
            (q, got[q], exact)
    # total observations == routed rows with a numeric value
    assert int(bins["cnt"].sum()) >= len(vals)


def test_case_insensitive_compares():
    """CMP_CONTAINSI / CMP_STARTSWITHI (grammar.y:106-109,
    rainerscript.c:3768): `contains_i` / `startswith_i` compile to
    case-insensitive masks matching the reference's semantics."""
    import pandas as pd

    from rsyslog_ray.router import Route, Router

    cfg = parse_rainer(r'''
    if $p_app contains_i "NGI.+X" then action(type="omfile" file="a")
    if $p_app startswith_i "NG" then action(type="omfile" file="b")
    ''' + "\n*.* action(type=\"omfile\" file=\"rest\")\n")
    routes = [Route(r["sink"], tuple(_tuplify(r["pred"])),
                    bool(r.get("stop"))) for r in cfg["routes"]]
    router = Router(routes)
    df = pd.DataFrame({"p_app": ["nginx", "NGINX", "ngi.+x!", "postfix",
                                 "anginx", None]})
    masks = router.masks(df)
    # contains_i is a LITERAL compare (regex chars escaped): only the
    # literal 'ngi.+x' row matches, case-insensitively
    assert masks["a"].tolist() == [False, False, True, False, False,
                                   False]
    assert masks["b"].tolist() == [True, True, True, False, False,
                                   False]


def _tuplify(p):
    if isinstance(p, (list, tuple)):
        return tuple(_tuplify(x) for x in p)
    return p


def test_set_reset_unset_continue(ray_session, pages_small, tmp_path):
    """S_SET overwrite of an EXISTING property, RESET (same
    semantics on columns), UNSET (variable stops existing: exists()
    false, filters see null), CONTINUE no-op — grammar.y:74-78."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    continue;
    set $p_app = toupper($p_app);
    reset $r2 = $p_app & "!";
    unset $p_sev;
    if exists($p_sev) then action(type="omfile" file="never")
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["archive", "never"]
    run_config(cfg, resume=False, lineage=False)

    files = glob.glob(str(tmp_path / "o" / "archive" / "**" / "*.parquet"),
                      recursive=True)
    t = pd.concat([pq.read_table(f).to_pandas() for f in files])
    ok = t["p_app"].notna()                 # unparsed rows stay null
    assert ok.any()
    assert (t.loc[ok, "p_app"].str.upper() == t.loc[ok, "p_app"]).all()
    assert (t.loc[ok, "r2"] == t.loc[ok, "p_app"] + "!").all()
    assert t["p_sev"].isna().all()                        # unset -> null
    assert not glob.glob(str(tmp_path / "o" / "never" / "**" /
                             "*.parquet"), recursive=True)


def test_call_indirect_dispatch(ray_session, pages_small, tmp_path):
    """call_indirect $var (grammar.y:80 CALL_INDIRECT): rows dispatch
    to the ruleset their VALUE names; unmatched values fall through."""
    import glob

    import pandas as pd
    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.rulebase import PAGES_RULEBASE

    conf = r'''
    global(workDirectory="OUT")
    input(type="imfile" file="PAGES/pages-*.parquet")
    ruleset(name="nginx") { action(type="omfile" file="web") }
    ruleset(name="sshd") { action(type="omfile" file="db") }
    call_indirect $p_app;
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("PAGES", pages_small)
    cfg = parse_rainer(conf)
    cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in PAGES_RULEBASE.rules]
    cfg["source_column"] = "text"
    cfg["extract_column"] = "html"
    cfg["output"]["full_sinks"] = ["web", "db", "archive"]
    run_config(cfg, resume=False, lineage=False)

    def rows(sink):
        fs = glob.glob(str(tmp_path / "o" / sink / "**" / "*.parquet"),
                       recursive=True)
        return pd.concat([pq.read_table(f).to_pandas() for f in fs]) \
            if fs else pd.DataFrame(columns=["p_app"])

    web, db, arch = rows("web"), rows("db"), rows("archive")
    assert set(web["p_app"]) == {"nginx"} and len(web)
    assert set(db["p_app"]) == {"sshd"} and len(db)
    # dispatch counts match the full stream's composition
    assert len(web) == int((arch["p_app"] == "nginx").sum())
    assert len(db) == int((arch["p_app"] == "sshd").sum())


def test_include_statement(tmp_path):
    """include(file=glob / text=...) (grammar.y:142, include.rst):
    wildcard files splice in sort order at the include point; modes
    abort-if-missing / required / optional."""
    import pytest

    (tmp_path / "10-first.conf").write_text(
        'if $a == "1" then action(type="omfile" file="s1")\n')
    (tmp_path / "20-second.conf").write_text(
        'if $a == "2" then action(type="omfile" file="s2")\n')
    cfg = parse_rainer(f'''
    include(file="{tmp_path}/*.conf")
    include(text="*.* action(type=\\"omfile\\" file=\\"tail\\")")
    ''')
    assert [r["sink"] for r in cfg["routes"]] == ["s1", "s2", "tail"]

    with pytest.raises(FileNotFoundError):
        parse_rainer(f'include(file="{tmp_path}/absent-*.conf" '
                     f'mode="abort-if-missing")')
    cfg = parse_rainer(f'include(file="{tmp_path}/absent-*.conf")')
    assert cfg["warnings"]                     # required: note, continue
    cfg = parse_rainer(f'include(file="{tmp_path}/absent-*.conf" '
                       f'mode="optional")')
    assert "warnings" not in cfg               # optional: silent


def _write_warc_fixture(d):
    """Two member-per-record archives of deterministic HTTP captures."""
    import os

    from rsyslog_ray.sources.warc import build_warc

    def resp(uri, date, body, status=200):
        http = (f"HTTP/1.1 {status} X\r\nContent-Type: text/html\r\n"
                f"\r\n").encode() + body
        return {"headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:{uri}>",
                    "WARC-Date": date, "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response"},
                "block": http}

    os.makedirs(d, exist_ok=True)
    recs1 = [resp(f"http://siteA.com/p{i}",
                  f"2025-02-0{1 + i}T00:00:00Z",
                  f"kind=alpha n={i}".encode()) for i in range(4)]
    recs2 = [resp(f"http://siteB.com/q{i}",
                  f"2025-02-0{1 + i}T00:00:00Z",
                  f"kind=beta n={i}".encode(),
                  status=404 if i == 0 else 200) for i in range(3)]
    with open(os.path.join(d, "crawl-a.warc.gz"), "wb") as fh:
        fh.write(build_warc(recs1, gzip_members=True))
    with open(os.path.join(d, "crawl-b.warc.gz"), "wb") as fh:
        fh.write(build_warc(recs2, gzip_members=True))


def test_imwarc_conf_end_to_end(ray_session, tmp_path):
    """input(type="imwarc" file=...) drives the crawl stack from the
    .conf surface: WARC records -> parse (body fields) -> route by an
    extracted field and http_status -> parquet sinks, partitioned per
    archive."""
    import glob

    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config

    wdir = str(tmp_path / "archives")
    _write_warc_fixture(wdir)
    conf = r'''
    global(workDirectory="OUT")
    input(type="imwarc" file="WDIR")
    parser(name="body" pattern="^kind=(?P<kind>\w+) n=(?P<n>\d+)$"
           types="n:int")
    if $http_status != 200 then { action(type="omfile" file="errors") stop }
    if $kind == "alpha" then action(type="omfile" file="alpha")
    *.* action(type="omfile" file="archive")
    '''.replace("OUT", str(tmp_path / "o")).replace("WDIR", wdir)
    cfg = parse_rainer(conf)
    assert cfg["input"]["format"] == "warc"
    cfg["output"]["full_sinks"] = ["alpha", "archive", "errors"]
    agg = run_config(cfg)

    def sink_rows(name):
        files = glob.glob(str(tmp_path / "o" / name / "**" / "*.parquet"),
                          recursive=True)
        import pandas as pd
        return (pd.concat([pq.read_table(f).to_pandas() for f in files])
                if files else pd.DataFrame())

    alpha = sink_rows("alpha")
    assert sorted(alpha["url"]) == [f"http://siteA.com/p{i}"
                                    for i in range(4)]
    assert (alpha["kind"] == "alpha").all()
    assert sorted(alpha["n"]) == [0, 1, 2, 3]      # typed int extract
    errors = sink_rows("errors")
    assert list(errors["url"]) == ["http://siteB.com/q0"]
    arch = sink_rows("archive")
    # stop route: the 404 never reaches archive; both sites' 200s do
    assert len(arch) == 6 and set(arch["kind"]) == {"alpha", "beta"}
    # per-archive partitioning: two distinct shard dirs under archive
    shards = {d.split("shard=")[1].split("/")[0]
              for d in glob.glob(str(tmp_path / "o" / "archive" /
                                     "shard=*"))}
    assert len(shards) == 2
    assert set(agg["sink"]) == {"alpha", "archive", "errors"}


def test_imwarc_conf_cdx_random_access(ray_session, tmp_path):
    """The CDX random-access path from .conf: cdxDir= + url= fetches
    exactly the queried captures (seek+read, no archive scan) and the
    same parse/route chain runs over them."""
    import glob

    import pyarrow.parquet as pq

    from rsyslog_ray.config import run_config
    from rsyslog_ray.sources.warc import build_cdx

    wdir = str(tmp_path / "archives")
    _write_warc_fixture(wdir)
    cdx = str(tmp_path / "cdx")
    build_cdx(wdir, cdx)
    conf = r'''
    global(workDirectory="OUT")
    input(type="imwarc" cdxDir="CDX" warcDir="WDIR"
          url="http://siteA.com/p2,http://siteB.com/q1")
    parser(name="body" pattern="^kind=(?P<kind>\w+) n=(?P<n>\d+)$"
           types="n:int")
    *.* action(type="omfile" file="hits")
    '''.replace("OUT", str(tmp_path / "o")).replace(
        "CDX", cdx).replace("WDIR", wdir)
    cfg = parse_rainer(conf)
    assert cfg["input"]["cdx_dir"] == cdx
    cfg["output"]["full_sinks"] = ["hits"]
    run_config(cfg)
    files = glob.glob(str(tmp_path / "o" / "hits" / "**" / "*.parquet"),
                      recursive=True)
    import pandas as pd
    got = pd.concat([pq.read_table(f).to_pandas() for f in files])
    assert sorted(got["url"]) == ["http://siteA.com/p2",
                                  "http://siteB.com/q1"]
    assert sorted(got["kind"]) == ["alpha", "beta"]
    assert sorted(got["n"]) == [1, 2]
