"""Declarative pipeline config — the rsyslog.conf analog.

rsyslog users describe a pipeline as config (RainerScript rulesets,
templates, lookup_table objects, actions); here the same roles live in
one JSON document, compiled to a Ray Data pipeline (rules -> compiled
rulebase, lookups -> broadcast LookupTables, routes -> Router,
output -> FanoutWriter sinks with lineage/resume):

{
  "input":   {"paths": ["/data/pages-*.parquet"]},
  "rules":   [{"name": "weblog", "pattern": "^ts=(?P<p_ts>\\S+) ...",
               "types": {"p_ts": "ts", "p_sev": "int"}}],
  "source_column": "text",
  "extract_column": "html",            # optional tag-strip extraction
  "lookups": {"lang_region": {"kind": "string",
                              "table": {"en": "amer"}, "stub": ""}},
  "enrich":  [{"column": "region", "lookup": "lang_region",
               "key": "lang"},
              {"column": "url_host", "op": "url_host", "key": "url"}],
  "routes":  [{"sink": "dead", "pred": ["==", "parse_ok", false],
               "stop": true},
              {"sink": "archive", "pred": ["true"]}],
  "aggregates": [["lang", "lang"], ["bucket", "__bucket"]],
  "ts_column": "warc_ts",
  "output":  {"dir": "/tmp/out", "full_sinks": ["archive"],
              "compression": "zstd"},
  "connectors": {"kafka_errors": {"type": "omkafka",
                                  "broker": "host:9092",
                                  "topic": "errors", "key": "p_host"}}
}

Routes may target a "connectors" sink: those rows are DELIVERED over
the named om* module's real wire protocol (stages/connectors.py)
instead of written to files, with lineage/resume semantics intact.

Predicates use the Router AST with lists instead of tuples (JSON).
`load_config` + `run_config` are the API; `python -m rsyslog_ray`
is the CLI.
"""

from __future__ import annotations

import glob
import json
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from . import sinks as sk
from .lookup import LookupTable
from .router import Route, Router
from .rulebase import Rule, Rulebase
from .stages.parse import extract_text_arrow


def _to_pred(p) -> tuple:
    """JSON list predicate -> Router tuple AST (recursive)."""
    if isinstance(p, (list, tuple)):
        return tuple(_to_pred(x) for x in p)
    return p


# ---------------------------------------------------------------------
# `set $x = expr` computed columns (S_SET, grammar.y set_stmt):
# expression AST = ["prop", name] | ["lit", v] | ["concat", a, b] |
# ["arith", op, a, b] | ["call", fname, [args...]] — evaluated
# vectorized per batch.

_REGISTRY_CACHE: dict = {}


def _set_registry() -> dict:
    # built once (module import is the natural point, but functions.py
    # imports this module's siblings — cache on first call instead);
    # rebuilding the ~30-entry dict per 'call' node per batch in the
    # fused hot stage was measurable on many-computed-column configs
    if _REGISTRY_CACHE:
        return _REGISTRY_CACHE
    from . import functions as F

    _REGISTRY_CACHE.update({
        "toupper": F.toupper, "tolower": F.tolower, "strlen": F.strlen,
        "ltrim": F.ltrim, "rtrim": F.rtrim, "substring": F.substring,
        "replace": F.replace, "field": F.field, "int2hex": F.int2hex,
        "b64_encode": F.b64_encode, "b64_decode": F.b64_decode,
        "num2ipv4": F.num2ipv4, "ipv42num": F.ipv42num,
        # ip42num: legacy alias for ipv42num (rainerscript.c:4480 binds
        # both names to doFunct_Ipv42num)
        "ip42num": F.ipv42num, "wrap": F.wrap,
        "cstr": F.cstr, "cnum": F.cnum, "cbool": F.cbool,
        "hash64mod": F.hash64mod, "hash64": F.hash64,
        "hash32": F.hash32, "hash32mod": F.hash32mod,
        "re_extract": F.re_extract, "re_extract_i": F.re_extract_i,
        "append_json": F.append_json, "unflatten": F.unflatten,
        "tocef": F.tocef, "cef_ext_escape": F.cef_ext_escape,
        "parse_time": F.parse_time, "parse_time_localtz": F.parse_time_localtz,
        "is_time": F.is_time, "random": F.random_gen,
        "get_property": F.get_property,
        "getenv": lambda n: F.getenv_fn(n if isinstance(n, str) else str(n)),
        "script_error": F.script_error,
        "previous_action_suspended": F.previous_action_suspended,
        # remaining doFunct_* table entries (rainerscript.c:4420-4510):
        # re_match as a VALUE is the 0/1 int the reference returns;
        # split yields a JSON array string so `foreach` can explode it
        "format_time": F.format_time,
        "is_in_subnet": lambda s, cidr: F.is_in_subnet(
            s, cidr).astype("int64"),
        "re_match": lambda s, p: F.re_match(s, p).astype("int64"),
        "re_match_i": lambda s, p: F.re_match_i(s, p).astype("int64"),
        "split": lambda s, d: F.split(s, d).map(json.dumps),
    })
    from .stages.sketch import pctl_bin_series
    _REGISTRY_CACHE["pctl_bin"] = pctl_bin_series
    return _REGISTRY_CACHE


def eval_set_expr(expr, get, templates=None, get_df=None, lookups=None):
    """Evaluate a set-expression AST; ``get(name)`` yields the column
    as a pandas Series.  Returns a Series or a scalar (callers
    broadcast scalars).  ``templates``/``get_df`` feed exec_template
    (rainerscript.c doFunc_exec_template:1784 — render a declared
    template against the current message/row); ``lookups`` feeds the
    stateful ``lookup("tbl", key)`` script function
    (rainerscript.c doFunct_Lookup / runtime/lookup.c:400-416 — the
    broadcast-small read side of lookup tables)."""
    op = expr[0]
    if op == "prop":
        return get(expr[1])
    if op == "lit":
        return expr[1]
    if op == "concat":
        a = eval_set_expr(expr[1], get, templates, get_df, lookups)
        b = eval_set_expr(expr[2], get, templates, get_df, lookups)
        if isinstance(a, pd.Series) or isinstance(b, pd.Series):
            sa = a.astype(str) if isinstance(a, pd.Series) else str(a)
            sb = b.astype(str) if isinstance(b, pd.Series) else str(b)
            return sa + sb
        return str(a) + str(b)
    if op == "arith":
        # + - * / % (grammar/grammar.y:100-123): float64 with true
        # division and floor-mod, matching the Router's expression
        # paths (router._num_pd); non-numeric operands coerce to NaN
        a = eval_set_expr(expr[2], get, templates, get_df, lookups)
        b = eval_set_expr(expr[3], get, templates, get_df, lookups)

        def _num(x):
            if isinstance(x, pd.Series):
                return pd.to_numeric(x, errors="coerce").astype("float64")
            try:
                return float(x)
            except (TypeError, ValueError):
                return float("nan")
        a, b = _num(a), _num(b)
        fn = {"+": lambda x, y: x + y, "-": lambda x, y: x - y,
              "*": lambda x, y: x * y, "/": lambda x, y: x / y,
              "%": lambda x, y: x % y}[expr[1]]
        if isinstance(a, pd.Series) or isinstance(b, pd.Series):
            return fn(a, b)
        with np.errstate(divide="ignore", invalid="ignore"):
            return float(fn(np.float64(a), np.float64(b)))
    if op == "call":
        if expr[1] == "lookup":
            # lookup("tbl", key) — stateful script function against a
            # declared lookup_table (doFunct_Lookup; the table is the
            # broadcast small side, never a shuffle join)
            name = eval_set_expr(expr[2][0], get, templates, get_df,
                                 lookups)
            key = eval_set_expr(expr[2][1], get, templates, get_df,
                                lookups)
            table = (lookups or {}).get(name)
            if table is None:
                return ""          # unknown table -> nomatch value
            if not isinstance(key, pd.Series):
                key = pd.Series([key])
                return table.lookup_series(key.astype(str)).iloc[0]
            return table.lookup_series(key.astype(str))
        if expr[1] == "exec_template":
            from .template import Template
            name = eval_set_expr(expr[2][0], get, templates, get_df, lookups)
            text = (templates or {}).get(name)
            if text is None or get_df is None:
                # undeclared template -> "" (reference returns an empty
                # string when tplToString fails)
                return ""
            return Template(text, name).render(get_df())
        fn = _set_registry().get(expr[1])
        if fn is None:
            raise ValueError(f"unknown function in set: {expr[1]!r}")
        return fn(*[eval_set_expr(x, get, templates, get_df, lookups)
                    for x in expr[2]])
    raise ValueError(f"bad set expression op {op!r}")


class PipelineConfig:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.input_paths = cfg["input"]["paths"]
        # "parquet" (default) or "textlog": raw log files split into
        # lines (imfile analog), optionally multiline-assembled via
        # input.multiline_start (startmsg.regex readMode)
        self.input_format = cfg["input"].get("format", "parquet")
        self.multiline_start = cfg["input"].get("multiline_start")
        self.source_column = cfg.get("source_column", "text")
        self.extract_column = cfg.get("extract_column")
        self.ts_column = cfg.get("ts_column", "warc_ts")
        def _rule(r: dict) -> Rule:
            if "sample" in r:  # liblognorm sample syntax front-end
                from .rulebase import lognorm_rule
                return lognorm_rule(r["name"], r["sample"])
            return Rule(r["name"], r["pattern"], r.get("types", {}))

        self.rulebase = Rulebase([
            _rule(r) for r in cfg.get("rules", [])
        ]) if cfg.get("rules") else None
        # vendor message normalizers (vendor.py pm* analogs), applied
        # to the source column before the rulebase chain — the parser
        # chain order in runtime/parser.c:613-693
        self.normalizers = cfg.get("normalizers", [])
        def _lookup(spec: dict) -> LookupTable:
            if "file" in spec:  # reference .lkp_tbl JSON file format
                from .lookup import load_lookup_file
                return load_lookup_file(spec["file"],
                                        stub=spec.get("stub"))
            mapping = spec["table"] if "table" in spec \
                else spec.get("values")
            if mapping is None:
                raise ValueError("lookup spec needs 'table', 'values' "
                                 "or 'file'")
            # NOTE: an explicitly EMPTY table ({}) is legal — a
            # stub-only table to be hot-reloaded later (lookup.c
            # stub semantics)
            return LookupTable(spec["kind"], mapping,
                               stub=spec.get("stub", ""))

        self.lookups = {name: _lookup(spec)
                        for name, spec in cfg.get("lookups", {}).items()}
        self.enrich = cfg.get("enrich", [])
        self.computed = cfg.get("computed", [])  # set $x = expr specs
        self.foreach_specs = cfg.get("foreach", [])  # S_FOREACH explodes
        self.templates = cfg.get("templates", {})    # for exec_template
        self.routes = [Route(r["sink"], _to_pred(r["pred"]),
                             bool(r.get("stop", False)))
                       for r in cfg["routes"]]
        # default dynstats dimension: lang for pages tables; WARC
        # captures have no lang column — count by HTTP status instead
        default_aggs = ([["status", "http_status"]]
                        if self.input_format == "warc"
                        else [["lang", "lang"]])
        self.agg_kinds = tuple(tuple(k) for k in cfg.get(
            "aggregates", default_aggs))
        out = cfg["output"]
        self.out_dir = out["dir"]
        self.full_sinks = tuple(out.get("full_sinks", ("archive", "deadletter")))
        self.compression = out.get("compression", "zstd")
        self.formats = out.get("formats", {})  # sink -> parquet|csv|jsonl
        self.partition_by = out.get("partition_by", {})  # sink -> column
        # network actions: sink -> {"type": "omkafka"|..., ...params}
        # (see _connector_spec for the type registry + param aliases)
        self.connectors = cfg.get("connectors", {})


# ---------------------------------------------------------------------
# network-action registry: the reference's om* output modules mapped to
# their real-wire transports (stages/connectors.py).  Param aliases
# follow the reference's action() parameter names (omfwd "target",
# omelasticsearch "server"/"searchindex", omkafka "broker"/"topic",
# ompgsql "server"/"db"/"uid"/"pwd", ommysql the same, ommongodb
# "uristr"-free host/port/db/collection, ompipe "pipe").

def _connector_spec(sink: str, prm: dict) -> dict:
    """action params -> FanoutWriter connector spec ({"factory": ...}).
    Everything the transports need is resolved HERE (driver side) so
    the factory closure ships only plain values to workers."""
    typ = prm["type"]
    host = prm.get("host") or prm.get("target") or prm.get("server") \
        or prm.get("broker") or "127.0.0.1"
    if ":" in str(host):                 # broker="host:port" form
        host, _, hp = str(host).partition(":")
        port = int(hp)
    else:
        port = int(prm.get("port", 0)) or None

    def need_port(dflt):
        return port if port is not None else dflt

    if typ == "omfwd":
        h, p, fr = host, need_port(514), prm.get("framing",
                                                 "octet-counted")
        def factory():
            from .stages.connectors import TcpSyslogTransport
            return TcpSyslogTransport(h, p, framing=fr)
    elif typ == "omkafka":
        h, p = host, need_port(9092)
        topic = prm.get("topic", "raylog")
        keyf = prm.get("key")
        dyn = prm.get("dynatopic_field") if str(
            prm.get("dynatopic", "off")) in ("on", "1", "true") else None
        def factory():
            from .stages.connectors import KafkaTransport
            return KafkaTransport(h, p, topic=topic, key_field=keyf,
                                  dynatopic_field=dyn)
    elif typ == "omelasticsearch":
        h, p = host, need_port(9200)
        index = prm.get("searchindex", prm.get("index", "raylog"))
        def factory():
            from .stages.connectors import EsBulkTransport
            return EsBulkTransport(h, p, index=index)
    elif typ == "omclickhouse":
        h, p = host, need_port(8123)
        table = prm.get("table", prm.get("tablename", "raylog"))
        def factory():
            from .stages.connectors import ClickHouseTransport
            return ClickHouseTransport(h, p, table=table)
    elif typ == "ompgsql":
        h, p = host, need_port(5432)
        db = prm.get("db", "syslog")
        user = prm.get("uid", prm.get("user", "rsyslog"))
        table = prm.get("table", "raylog")
        def factory():
            from .stages.connectors import PgWireTransport
            return PgWireTransport(h, p, dbname=db, user=user,
                                   table=table)
    elif typ == "ommysql":
        h, p = host, need_port(3306)
        db = prm.get("db", "syslog")
        user = prm.get("uid", prm.get("user", "rsyslog"))
        pwd = prm.get("pwd", prm.get("password", ""))
        table = prm.get("table", "raylog")
        def factory():
            from .stages.connectors import MySqlTransport
            return MySqlTransport(h, p, user=user, password=pwd,
                                  database=db, table=table)
    elif typ == "ommongodb":
        h, p = host, need_port(27017)
        db = prm.get("db", "logdb")
        coll = prm.get("collection", "log")
        def factory():
            from .stages.connectors import MongoTransport
            return MongoTransport(h, p, db=db, collection=coll)
    elif typ == "omhttp":
        h, p = host, need_port(80)
        path = prm.get("restpath", prm.get("path", "/"))
        batchfmt = prm.get("batch.format", prm.get("batch_format",
                                                   "newline"))
        def factory():
            from .stages.connectors import HttpBatchTransport
            return HttpBatchTransport(h, p, restpath=path,
                                      batch_format=batchfmt)
    elif typ == "omjournal":
        # batch analog writes the journal Export Format to a file; the
        # "namespace" param names the stream file, like omjournal's
        # namespace stream target
        jpath = prm.get("path") or prm.get("namespace") or "journal.export"
        jfields = prm.get("fields")
        def factory():
            from .stages.connectors import JournalTransport
            return JournalTransport(jpath, fields=jfields)
    elif typ == "omsnmp":
        h, p = host, need_port(162)
        ver = int(prm.get("version", 2))
        comm = prm.get("community", "public")
        ent = prm.get("enterpriseoid", "1.3.6.1.4.1.3.1.1")
        toid = prm.get("trapoid", "1.3.6.1.4.1.19406.1.2.1")
        moid = prm.get("syslogmessageoid", "1.3.6.1.4.1.19406.1.1.2.1")
        ttype = prm.get("traptype")
        stype = int(prm.get("specifictype", 0))
        src = prm.get("snmpv1dynsource")
        def factory():
            from .stages.connectors import SnmpTrapTransport
            return SnmpTrapTransport(
                h, p, version=ver, community=comm, enterprise_oid=ent,
                trap_oid=toid, syslog_message_oid=moid,
                trap_type=None if ttype is None else int(ttype),
                specific_type=stype, source_field=src)
    elif typ == "omrelp":
        h, p = host, need_port(514)
        win = int(prm.get("windowsize",
                          prm.get("window_size", 0))) or 128
        reb = int(prm.get("rebindinterval",
                          prm.get("rebind_interval", 0)))
        def factory():
            from .stages.connectors import RelpTransport
            return RelpTransport(h, p, window_size=win,
                                 rebind_interval=reb)
    elif typ == "omhiredis":
        h, p = host, need_port(6379)
        mode = prm.get("mode", "queue")
        key = prm.get("key", "raylog")
        keyf = prm.get("dynakey_field") if str(
            prm.get("dynakey", "off")) in ("on", "1", "true") else None
        rpush = str(prm.get("userpush", "off")) in ("on", "1", "true")
        exp = int(prm.get("expiration", 0))
        outf = prm.get("stream.outfield", prm.get("stream_out_field",
                                                  "msg"))
        cap = int(prm.get("stream.capacitylimit",
                          prm.get("capacity_limit", 0)))
        def factory():
            from .stages.connectors import RedisTransport
            return RedisTransport(h, p, mode=mode, key=key,
                                  key_field=keyf, use_rpush=rpush,
                                  expiration=exp, stream_out_field=outf,
                                  capacity_limit=cap)
    elif typ == "ompipe":
        pipe = prm.get("pipe", prm.get("path"))
        def factory():
            from .stages.connectors import PipeTransport
            return PipeTransport(pipe)
    elif typ == "omdtls":
        h, p = host, need_port(4433)
        def factory():
            from .stages.connectors import DtlsTransport
            return DtlsTransport(h, p)
    elif typ == "omhdfs":
        # native Hadoop RPC path (omhdfs.c param names: hdfshost /
        # hdfsport / hdfsfile / hdfsuser)
        h = prm.get("hdfshost", host)
        p = int(prm.get("hdfsport", 0)) or need_port(8020)
        fpath = prm.get("hdfsfile", prm.get("file", "/raylog"))
        user = prm.get("hdfsuser", prm.get("user", "hdfs"))
        def factory():
            from .stages.connectors import HdfsNativeTransport
            return HdfsNativeTransport(h, p, file=fpath, user=user)
    else:
        raise ValueError(f"unknown connector action type {typ!r}")
    spec = {"factory": factory}
    for opt in ("batch_rows", "error_file", "max_retries"):
        if opt in prm:
            spec[opt] = prm[opt]
    return spec


CONNECTOR_ACTION_TYPES = frozenset({
    "omfwd", "omkafka", "omelasticsearch", "omclickhouse", "ompgsql",
    "ommysql", "ommongodb", "omhttp", "ompipe", "omhiredis", "omrelp",
    "omsnmp", "omjournal", "omhdfs", "omdtls"})


def load_config(path_or_dict) -> PipelineConfig:
    if isinstance(path_or_dict, dict):
        return PipelineConfig(path_or_dict)
    if str(path_or_dict).endswith(".conf"):
        from .rainerconf import parse_rainer
        with open(path_or_dict) as fh:
            return PipelineConfig(parse_rainer(fh.read()))
    with open(path_or_dict) as fh:
        return PipelineConfig(json.load(fh))


def _explode_json_array(tbl: pa.Table, src: str, var: str) -> pa.Table:
    """S_FOREACH batch analog (grammar/grammar.y FOREACH,
    runtime/ruleset.c:377-402 execIterative): parse the JSON array in
    column ``src`` per row, emit one row per element with the element
    bound to the new string column ``var`` (scalars keep their string
    form, objects/arrays re-serialize compactly — var2CString
    semantics).  Rows whose array is missing/invalid/empty iterate
    zero times and disappear, like a loop body that never runs.
    Arrow ``list<...>`` columns explode without the JSON parse."""
    import numpy as np

    col = tbl[src].to_pylist() if src in tbl.column_names else \
        [None] * len(tbl)
    reps, vals = [], []
    for v in col:
        if isinstance(v, list):
            arr = v
        elif isinstance(v, str):
            try:
                arr = json.loads(v)
            except ValueError:
                arr = []
            if not isinstance(arr, list):
                arr = []
        else:
            arr = []
        reps.append(len(arr))
        for e in arr:
            vals.append(e if isinstance(e, str)
                        else json.dumps(e, separators=(",", ":")))
    idx = np.repeat(np.arange(len(col), dtype=np.int64), reps)
    return tbl.take(pa.array(idx)).append_column(
        var, pa.array(vals, pa.string()))


class _ConfigMapFn:
    """Parse + enrich per the config, as one fused Arrow task stage."""

    def __init__(self, pc_: PipelineConfig, lookups_ref=None):
        self.c = pc_
        self._ref = lookups_ref
        self._lk = None

    def __getstate__(self):
        # don't ship the tables inside the pickled task fn when they
        # already broadcast via ray.put — a large file-backed lookup
        # would otherwise reach every worker twice (the driver-side
        # config object is left untouched)
        st = self.__dict__.copy()
        if st.get("_ref") is not None:
            import copy
            slim = copy.copy(st["c"])
            slim.lookups = None
            st["c"] = slim
        st["_lk"] = None
        return st

    def _lookups(self):
        if self._lk is None:
            if self._ref is None:
                self._lk = self.c.lookups
            else:
                import ray
                self._lk = ray.get(self._ref)
        return self._lk

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        cols = dict(zip(batch.column_names, batch.columns))
        if self.c.normalizers and self.c.source_column in cols:
            # vendor rewrites need pandas string ops (the patterns use
            # lookarounds RE2 lacks); only the one source column
            # converts, and only on configs that load a pm* normalizer
            from .vendor import apply_normalizers
            norm = apply_normalizers(
                batch[self.c.source_column].to_pandas().astype("string"),
                self.c.normalizers)
            cols[self.c.source_column] = pa.array(norm, pa.string())
            batch = pa.table(cols)
        if self.c.rulebase is not None:
            parsed = self.c.rulebase.parse_table(batch[self.c.source_column])
            cols.update(parsed)
        if self.c.extract_column and self.c.extract_column in cols:
            cols["extracted"] = pa.array(
                extract_text_arrow(batch[self.c.extract_column]),
                type=pa.string())
            cols.pop(self.c.extract_column)
        tbl = pa.table(cols)
        lk = self._lookups()
        for e in self.c.enrich:
            if e.get("op") == "url_host":
                from .stages.enrich import HOST_RE_ARROW
                val = pc.fill_null(pc.struct_field(
                    pc.extract_regex(tbl[e["key"]], HOST_RE_ARROW), "h"),
                    pa.scalar("", pa.string()))
            else:
                table = lk[e["lookup"]]
                if table.kind == "string":
                    val = table.lookup_arrow(tbl[e["key"]])
                else:  # other kinds: pandas path on the single column
                    val = pa.array(
                        table.lookup_series(tbl[e["key"]].to_pandas()),
                        pa.string())
            tbl = tbl.append_column(e["column"], val)
        for fe in self.c.foreach_specs:
            tbl = _explode_json_array(tbl, fe["source"], fe["var"])
        for spec in self.c.computed:
            cache: dict = {}

            def get(name, _t=tbl, _c=cache):
                s = _c.get(name)
                if s is None:
                    s = _t[name].to_pandas()
                    _c[name] = s
                return s

            res = eval_set_expr(spec["expr"], get, self.c.templates,
                                lambda _t=tbl: _t.to_pandas(), lookups=lk)
            if not isinstance(res, pd.Series):
                res = pd.Series([res] * len(tbl))
            arr = pa.Array.from_pandas(res)
            if spec["column"] in tbl.column_names:
                # set/reset over an existing property overwrites it;
                # unset nulls it (exists() then reads False) — never
                # a duplicate-name column
                tbl = tbl.set_column(
                    tbl.column_names.index(spec["column"]),
                    spec["column"], arr)
            else:
                tbl = tbl.append_column(spec["column"], arr)
        return tbl


def _warc_input_ds(c: "PipelineConfig", pending: list[str]):
    """The crawl stack behind the .conf surface: ``format="warc"``
    reads whole archives (sources/warc.read_warc, per-file
    parallelism); with ``cdx_dir`` set the input is the RANDOM-ACCESS
    path instead — cdx_lookup selects captures by url / SURT prefix
    and fetch_captures seek-reads exactly those records.  Either way
    the capture records reshape to the pipeline's row contract:
    ``url``, ``warc_ts``, ``http_status``, ``content_type`` and the
    payload decoded into the configured source column; ``shard``
    derives from the archive name so sinks partition per archive."""
    import numpy as np

    from .sources.warc import CDX_TYPES, fetch_captures, read_warc

    icfg = c.cfg["input"]
    if icfg.get("cdx_dir"):
        from .sources.warc import cdx_lookup

        hits = cdx_lookup(icfg["cdx_dir"],
                          urls=icfg.get("urls") or None,
                          surt_prefixes=icfg.get("surt_prefixes")
                          or None)
        root = icfg.get("warc_root") or os.path.dirname(
            icfg["cdx_dir"].rstrip("/"))
        ds = fetch_captures(root, hits)
        name_col = "filename"
    else:
        ds = read_warc(pending)
        name_col = "path"

    src = c.source_column

    def shape(df: pd.DataFrame) -> pd.DataFrame:
        keep = df[df["warc_type"].isin(CDX_TYPES)]
        ts = pd.to_datetime(keep["date"], errors="coerce", utc=True)
        shard = np.fromiter(
            (sk.shard_id_of(p) for p in keep[name_col]),
            dtype=np.int64, count=len(keep))
        return pd.DataFrame({
            "url": keep["target_uri"].to_numpy(),
            "warc_ts": ts.dt.tz_localize(None).to_numpy(),
            "http_status": keep["http_status"].astype("int64")
            .to_numpy(),
            "content_type": keep["http_content_type"].where(
                keep["http_content_type"] != "",
                keep["content_type"]).to_numpy(),
            src: [bytes(b).decode("utf-8", "replace")
                  for b in keep["payload"]],
            "shard": shard.astype(np.int32),
        })

    return ds.map_batches(shape, batch_format="pandas")


def run_config(cfg: PipelineConfig | dict | str, *, resume: bool = True,
               lineage: bool = True, batch_size: int = 8192,
               write_batch_size: int = 32768) -> pd.DataFrame:
    """Execute a config-described pipeline; returns the per-sink
    aggregate counts (sink, kind, key, cnt). Ray must already be
    initialised by the caller."""
    import ray
    import ray.data

    c = cfg if isinstance(cfg, PipelineConfig) else load_config(cfg)
    router = Router(c.routes)
    cdx_mode = (c.input_format == "warc"
                and c.cfg["input"].get("cdx_dir"))
    files = sorted(sum((glob.glob(p) for p in c.input_paths), []))
    if not files and not cdx_mode:
        raise FileNotFoundError(f"no input files match {c.input_paths}")

    os.makedirs(c.out_dir, exist_ok=True)
    if c.input_format in ("textlog", "warc"):
        # text/archive inputs have no parquet footers -> no per-shard
        # expected counts; no lineage, and a rerun is a FRESH run: wipe
        # the sink dirs so reprocessing can't append duplicates
        resume = False
        lineage = False
        import shutil
        for s in router.sinks:
            shutil.rmtree(os.path.join(c.out_dir, s), ignore_errors=True)
    if resume:
        pending, done = sk.plan_resume(files, c.out_dir, router.sinks)
    else:
        pending, done = files, set()
    import time as _time

    t_run0 = _time.perf_counter()
    if not pending and not cdx_mode:
        # no work left, but the final dynstats still come from the
        # committed shards' checkpoints — a re-invoke (or a crash
        # between the last commit and the metrics write) must report
        # the full corpus, not an empty one (see flagship.py).  The
        # CDX random-access input has no file list at all — its work
        # comes from the index lookup, never from `pending`.
        out = sk.read_agg_partials(c.out_dir, done)
        out = out.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
        sk.repair_run_metrics(c.out_dir, out, _time.perf_counter() - t_run0)
        return out

    lineage_name = None
    actor = None
    if lineage:
        expected = sk.shard_expected_rows(pending)
        lineage_name = f"lineage-{uuid.uuid4().hex[:8]}"
        actor = sk.make_lineage_actor(c.out_dir, expected, name=lineage_name)

    try:
        lookups_ref = ray.put(c.lookups) if c.lookups else None
        fn = _ConfigMapFn(c, lookups_ref)

        if c.input_format == "warc":
            ds = _warc_input_ds(c, pending)
        elif c.input_format == "textlog":
            from .sources.textlog import assemble_multiline, read_log_lines

            ds = read_log_lines(pending)
            if c.multiline_start:
                ds = assemble_multiline(ds, c.multiline_start)
                ds = ds.map_batches(
                    lambda df: df.rename(columns={"record": c.source_column}),
                    batch_format="pandas")
            elif c.source_column != "line":
                ds = ds.map_batches(
                    lambda df: df.rename(columns={"line": c.source_column}),
                    batch_format="pandas")
        else:
            ds = ray.data.read_parquet(pending)
        ds = ds.map_batches(fn, batch_format="pyarrow",
                            batch_size=batch_size)
        conn_specs = {name: _connector_spec(name, prm)
                      for name, prm in c.connectors.items()}
        partials = ds.map_batches(
            sk.FanoutWriter(router, c.out_dir, lineage_name,
                            compression=c.compression,
                            full_sinks=c.full_sinks,
                            agg_kinds=c.agg_kinds, ts_col=c.ts_column,
                            formats=c.formats,
                            partition_by=c.partition_by,
                            connectors=conn_specs),
            batch_format="pyarrow", batch_size=write_batch_size)
        out = sk.finalize_aggregates(partials)
        if done:
            # fold in the skipped committed shards' checkpoints —
            # resumed runs report full-corpus dynstats (gated on
            # `done`, not this run's lineage flag: the checkpoints
            # are plain parquet)
            prev = sk.read_agg_partials(c.out_dir, done)
            if len(prev):
                out = (pd.concat([out, prev], ignore_index=True)
                       .groupby(["sink", "kind", "key"],
                                as_index=False)["cnt"]
                       .sum().astype({"cnt": "int64"}))
        out = out.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
        sk.write_run_metrics(c.out_dir, out, _time.perf_counter() - t_run0,
                             len(pending))
    finally:
        if actor is not None:  # failed runs must not leak the actor
            ray.kill(actor)
    return out
