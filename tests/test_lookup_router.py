"""Lookup-table semantics (all four kinds + stub) and router predicates."""

import numpy as np
import pandas as pd

from rsyslog_ray.lookup import LookupTable
from rsyslog_ray.router import Route, Router, _eval_row, _mask


def _both(table, keys):
    vec = table.lookup_series(pd.Series(keys)).tolist()
    row = [table.lookup(k) for k in keys]
    assert vec == row
    return vec


def test_string_lookup_stub():
    t = LookupTable("string", {"en": "amer", "de": "emea"}, stub="??")
    assert _both(t, ["en", "de", "xx"]) == ["amer", "emea", "??"]


def test_array_lookup():
    t = LookupTable("array", ["a", "b", "c"], stub="s")
    assert _both(t, [0, 2, 5, -1]) == ["a", "c", "s", "s"]


def test_sparse_array_range_lookup():
    # greatest bound <= key (as-of semantics, lookup.c:437-485)
    t = LookupTable("sparseArray", {0: "low", 100: "mid", 1000: "high"}, stub="-")
    assert _both(t, [-5, 0, 99, 100, 999, 5000]) == ["-", "low", "low", "mid", "mid", "high"]


def test_regex_lookup_first_match():
    t = LookupTable("regex", [(r"err", "E"), (r"e", "e2")], stub="-")
    assert _both(t, ["error", "everything", "zzz"]) == ["E", "e2", "-"]


def test_router_masks_match_rowwise():
    df = pd.DataFrame({
        "parse_ok": [True, True, False, True, True, True],
        "p_sev": pd.array([1, 6, None, 3, 7, 5], dtype="Int64"),
        "p_msg": ["fail open", "ok", None, "", "fail", "x"],
        "lang": ["en", "de", "en", "en", "fr", "en"],
        "category": ["news", "spam", "news", "uncat", "news", "spam"],
        "p_host": ["h0001.x", "h0900.x", "h0002.x", "h0003.x", "zzz", "h0004.x"],
        "url": ["a?id=7", "b?id=17", "c?id=3", "d?id=27", "e?id=5", "f?id=77"],
        "p_app": ["nginx", "cron", "sshd", "db", "sshd", "auth"],
        "p_bytes": pd.array([70000, 100, None, 60000, 59999, 61000], dtype="Int64"),
    })
    routes = [
        Route("dead", ("==", "parse_ok", False), stop=True),
        Route("spam", ("==", "category", "spam"), stop=True),
        Route("errors", ("prifilt", "p_sev", 0, 3)),
        Route("failures", ("contains", "p_msg", "fail")),
        Route("en_news", ("and", ("==", "lang", "en"), ("==", "category", "news"))),
        Route("h0", ("startswith", "p_host", "h00")),
        Route("lucky7", ("regex", "url", r"id=\d*7$")),
        Route("netapps", ("in", "p_app", ["nginx", "sshd"])),
        Route("empty", ("isempty", "p_msg")),
        Route("big", (">=", "p_bytes", 60000)),
        Route("all", ("true",)),
    ]
    router = Router(routes)
    masks = router.masks(df)
    for i in range(len(df)):
        row = df.iloc[i].to_dict()
        expect = router.route_row(row)
        got = [s for s in router.sinks if bool(masks[s].iloc[i])]
        assert sorted(got) == sorted(expect), f"row {i}: {got} vs {expect}"
    # stop semantics: row 1 is spam -> nothing else; row 2 unparsed -> dead only
    assert masks["spam"].iloc[1] and not masks["all"].iloc[1]
    assert masks["dead"].iloc[2] and not masks["en_news"].iloc[2]


def test_load_lookup_file_reference_format(tmp_path):
    """The reference's .lkp_tbl JSON format (runtime/lookup.c
    lookupReadFile): string default, offset-based array, sparseArray,
    regex with 'tag'."""
    import pandas as pd

    from rsyslog_ray.lookup import load_lookup_file

    s = load_lookup_file('{"nomatch":"unk","table":['
                         '{"index":"a","value":"A"},'
                         '{"index":"b","value":"B"}]}')
    assert s.lookup("a") == "A" and s.lookup("zz") == "unk"

    # array with non-zero base and a hole (reference uses the first
    # sorted index as offset; holes -> nomatch)
    a = load_lookup_file('{"type":"array","nomatch":"-",'
                         '"table":[{"index":5,"value":"five"},'
                         '{"index":7,"value":"seven"}]}')
    assert a.lookup(5) == "five" and a.lookup(7) == "seven"
    assert a.lookup(6) == "-" and a.lookup(4) == "-" and a.lookup(8) == "-"
    assert a.lookup_series(pd.Series([5, 6, 7, 99])).tolist() == \
        ["five", "-", "seven", "-"]

    sp = load_lookup_file('{"type":"sparseArray","nomatch":"lo",'
                          '"table":[{"index":10,"value":"ten"},'
                          '{"index":20,"value":"twenty"}]}')
    assert sp.lookup(15) == "ten" and sp.lookup(25) == "twenty"
    assert sp.lookup(3) == "lo"

    r = load_lookup_file('{"type":"regex","nomatch":"other","table":['
                         '{"index":"^foo","tag":"F"},'
                         '{"index":"bar$","tag":"B"}]}')
    assert r.lookup("foox") == "F" and r.lookup("xxbar") == "B"
    assert r.lookup("zzz") == "other"

    # from an actual file + reload-by-rebuild semantics
    p = tmp_path / "t.lkp_tbl"
    p.write_text('{"table":[{"index":"k","value":"v1"}]}')
    t1 = load_lookup_file(str(p))
    assert t1.lookup("k") == "v1"
    p.write_text('{"table":[{"index":"k","value":"v2"}]}')
    assert load_lookup_file(str(p)).lookup("k") == "v2"  # reload = rebuild


def test_lookup_reload(ray_session, tmp_path):
    """S_RELOAD_LOOKUP_TABLE (lookup.c:151-162, ruleset.c:512-529):
    reload_table rebuilds in place; ReloadableLookup swaps the table
    between two batches of one run via the holder actor (readers never
    block; the stale worker cache refreshes on the next poll)."""
    import json

    import pandas as pd
    import ray.data

    from rsyslog_ray.lookup import ReloadableLookup, load_lookup_file, \
        reload_table

    v1 = tmp_path / "t1.lkp_tbl"
    v2 = tmp_path / "t2.lkp_tbl"
    v1.write_text(json.dumps({"version": 1, "nomatch": "?", "table": [
        {"index": "a", "value": "old-a"}, {"index": "b", "value": "old-b"}]}))
    v2.write_text(json.dumps({"version": 2, "nomatch": "?", "table": [
        {"index": "a", "value": "new-a"}]}))

    # in-place reload of a driver-held table
    t = load_lookup_file(str(v1))
    assert t.lookup("a") == "old-a"
    reload_table(t, str(v2))
    assert t.lookup("a") == "new-a"
    assert t.lookup("b") == "?"              # dropped key -> stub
    # arrow fast path must not serve the stale cached key arrays
    import pyarrow as pa
    got = t.lookup_arrow(pa.array(["a", "b"], pa.string()))
    assert got.to_pylist() == ["new-a", "?"]

    # mid-run swap through the holder actor: batch 1 sees v1, reload,
    # batch 2 sees v2 through the SAME worker-side probe cache
    rl = ReloadableLookup.start(str(v1))
    probe = rl.probe()
    b1 = probe.table().lookup_series(pd.Series(["a", "b"]))
    assert b1.tolist() == ["old-a", "old-b"]
    rl.reload(str(v2))
    b2 = probe.table().lookup_series(pd.Series(["a", "b"]))
    assert b2.tolist() == ["new-a", "?"]

    # distributed: a map_batches stage resolves through the probe
    class Enrich:
        def __init__(self, handle):
            from rsyslog_ray.lookup import LookupProbe
            self.probe = LookupProbe(handle)

        def __call__(self, df):
            df["v"] = self.probe.table().lookup_series(df["k"])
            return df

    ds = ray.data.from_pandas(pd.DataFrame({"k": ["a", "b", "a"]}))
    out = ds.map_batches(Enrich, fn_constructor_args=(rl._handle,),
                         batch_format="pandas",
                         concurrency=(1, 2)).to_pandas()
    assert out["v"].tolist() == ["new-a", "?", "new-a"]
