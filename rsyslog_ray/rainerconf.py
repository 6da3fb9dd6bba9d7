"""Minimal RainerScript text front-end — rsyslog.conf to pipeline dict.

The reference's user surface is the RainerScript config language
(grammar/grammar.y, grammar/rainerscript.c); the repo's native surface
is the JSON document of config.py.  This module closes the UX gap for
the most-used subset: a .conf text compiles to the same dict
``load_config`` takes, routes landing on the existing Router tuple AST.

Supported statements (reference grammar sites cited):

- ``# comments``
- ``module(load="...")`` — recorded; ``pmpages`` binds the built-in
  pages rulebase like a pm* parser module would
- ``global(workDirectory="/out")`` — output directory
- ``input(type="imfile" file="/glob" format="parquet|textlog"
  startmsg.regex="^...")`` — input block (grammar.y input object)
- ``input(type="imwarc" file="/archives")`` — crawl-stack input: WARC
  records reshaped to (url, warc_ts, http_status, content_type, text)
  rows; ``cdxDir="/cdx" [warcDir="/archives"] url="u1,u2"`` /
  ``surtPrefix="com,site)"`` switches to the CDX random-access fetch
  path (only the queried captures are read — config._warc_input_ds)
- ``parser(name=".." pattern=".." types="col:ty,..")`` or
  ``parser(name=".." sample="%f:ty% ...")`` — parse-rule declaration
- ``template(name=".." type="string" string="...%prop%...")`` and
  block-form ``template(name=".." type="list") { constant()
  property(...) }`` — compiled by template.py; bound to sinks via
  ``action(... template="name")`` (rendered .log line output, jsonf
  templates render n/v JSON)
- ``lookup_table(name=".." file="x.lkp_tbl")`` — the reference's JSON
  table file format (runtime/lookup.c lookupReadFile)
- ``set $x = expr;`` — computed column (S_SET): $props, literals,
  ``&`` concat and scalar function calls, evaluated vectorized
- ``if COND then BLOCK [else BLOCK]`` — expression filter
  (grammar.y:if_stmt, cnfexprEval rainerscript.c:3878-4110) with
  ``==  !=  <=  >=  <  >  contains  startswith  endswith``,
  ``re_match($prop, "ere")``, and/or/not, parentheses; else carries
  the negated condition.  Comparison operands may be arithmetic
  expressions ``+ - * / %`` with normal precedence and parentheses
  (grammar/grammar.y:100-123 left-assoc %left chains), e.g.
  ``if $!n * 8 + $!m >= 13``; ``$x == ["a","b"]`` is array
  membership (rainerscript.c:3752-3776 evalVar against an array —
  binary-searched there, hash-set `isin` here; ``!=`` array is the
  negation, grammar.y:211-214 CMP_NE array form); ``exists($!x)``
  tests field presence (rainerscript.c:3097-3110)
- ``:prop, [!]op, "value" action(...)`` — classic property filter
  (PROPFILT, runtime/ruleset.c:424-500)
- ``facility.severity action(...)`` — classic syslog.conf selectors
  (at-least-as-severe semantics, ``*`` wildcards, ``none``)
- ``ruleset(name="x") { ... }`` + ``call x;`` — named route groups
  spliced at the call site; a call under ``if`` ANDs the guard onto
  every spliced route (S_CALL/omruleset)
- ``action(type="omfile" file="sinkname" [template="t"] [stop])``,
- network actions over their REAL wire protocols:
  ``action(type="omkafka" broker="h:p" topic=".." [key="col"])``,
  ``omfwd/omelasticsearch/omclickhouse/ompgsql/ommysql/
  ommongodb/omhttp/ompipe`` — compiled to connector delivery
  sinks inside the FanoutWriter pass (config._connector_spec),
  ``action(type="omdiscard")``, bare ``action(...)`` and ``*.*``
  catch-alls
"""

from __future__ import annotations

import os
import re

_TOKEN_RE = re.compile(r"""
    (?P<comment>\#[^\n]*)
  | (?P<string>"(?:[^"\\]|\\.)*")
  | (?P<num>\d+(?:\.\d+)?)
  | (?P<prop>\$[!.]?[A-Za-z_][A-Za-z0-9_!.-]*)
  | (?P<word>[A-Za-z_][A-Za-z0-9_.-]*)
  | (?P<op>==|!=|<=|>=|<|>|=)
  | (?P<punct>[(){}\[\],;:!*.&+\-/%])
  | (?P<ws>\s+)
""", re.VERBOSE)


def _tokenize(text: str) -> list[tuple[str, str]]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise SyntaxError(f"bad config char {text[i]!r} at offset {i}")
        i = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        val = m.group()
        if kind == "string":
            # only quote/backslash escapes — \d etc. stays a regex escape
            val = val[1:-1].replace('\\"', '"').replace("\\\\", "\\")
        out.append((kind, val))
    return out


def _prop_name(tok: str) -> str:
    """``$x`` / ``$.x`` (local var) / ``$!x`` (message var) -> column
    ``x`` — the batch model has one flat column namespace."""
    return re.sub(r"^\$[!.]?", "", tok)


class _P:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def peek(self, k=0):
        j = self.i + k
        return self.toks[j] if j < len(self.toks) else ("eof", "")

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def expect(self, val):
        t = self.next()
        if t[1] != val:
            raise SyntaxError(f"expected {val!r}, got {t[1]!r}")
        return t

    # -- object parameter lists:  name(k="v" k2="v2") ------------------
    def params(self) -> dict:
        self.expect("(")
        out = {}
        while self.peek()[1] != ")":
            key = self.next()[1]
            # dotted keys (startmsg.regex) come through word tokens
            self.expect("=")
            out[key] = self.next()[1]
        self.expect(")")
        return out

    # -- value expressions (set $x = ...) ------------------------------
    def value_expr(self):
        """RainerScript value expression: `&` concat binds loosest
        (grammar.y %left AND..'&' chain), then `+ -`, then `* / %`."""
        t = self.value_sum()
        while self.peek()[1] == "&":
            self.next()
            rhs = self.value_sum()
            t = ("concat", t, rhs)
        return t

    def value_sum(self):
        t = self.value_mul()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            t = ("arith", op, t, self.value_mul())
        return t

    def value_mul(self):
        t = self.value_term()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            t = ("arith", op, t, self.value_term())
        return t

    def value_term(self):
        k, v = self.next()
        if v == "(":
            e = self.value_expr()
            self.expect(")")
            return e
        if k == "prop":
            return ("prop", _prop_name(v))
        if k == "string":
            return ("lit", v)
        if v == "-" and self.peek()[0] == "num":
            nv = self.next()[1]
            return ("lit", -(float(nv) if "." in nv else int(nv)))
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "word" and self.peek()[1] == "(":
            self.expect("(")
            args = []
            while self.peek()[1] != ")":
                args.append(self.value_expr())
                if self.peek()[1] == ",":
                    self.next()
            self.expect(")")
            return ("call", v, args)
        raise SyntaxError(f"bad value expression at {v!r}")

    # -- expressions ---------------------------------------------------
    def cond(self):
        t = self.or_term()
        return t

    def or_term(self):
        left = self.and_term()
        while self.peek()[1] == "or":
            self.next()
            left = ("or", left, self.and_term())
        return left

    def and_term(self):
        left = self.unary()
        while self.peek()[1] == "and":
            self.next()
            left = ("and", left, self.unary())
        return left

    def unary(self):
        k, v = self.peek()
        if v == "not":
            self.next()
            return ("not", self.unary())
        if v == "(":
            # Ambiguous: "($a > 1) and ..." (condition parens) vs
            # "($!n + 1) * 2 > 4" (arithmetic parens).  Try the
            # condition reading first; backtrack to comparison() —
            # whose sum_expr owns arithmetic parens — if it fails or
            # leaves a dangling arithmetic operator.
            mark = self.i
            try:
                self.next()
                c = self.cond()
                self.expect(")")
                if self.peek()[1] not in ("+", "-", "*", "/", "%"):
                    return c
            except (SyntaxError, KeyError):
                pass
            self.i = mark
            return self.comparison()
        if v == "exists":
            # exists($!path) — rainerscript.c:3097-3110 msgGetJSONPropJSON
            # probe: field present AND non-null
            self.next()
            self.expect("(")
            prop = _prop_name(self.next()[1])
            self.expect(")")
            return ("exists", prop)
        if v in ("re_match", "re_match_i", "pcre_match"):
            # re_match_i (rainerscript.c:4483, REG_ICASE) compiles to
            # the same regex predicate with an inline (?i) — valid in
            # both Python re (pandas path) and RE2 (Arrow path)
            self.next()
            self.expect("(")
            prop = _prop_name(self.next()[1])
            self.expect(",")
            pat = self.next()[1]
            self.expect(")")
            return ("regex", prop, ("(?i)" + pat) if v.endswith("_i")
                    else pat)
        return self.comparison()

    def comparison(self):
        left = self.sum_expr()
        opk, op = self.next()
        if op in ("contains", "startswith", "endswith",
                  "contains_i", "startswith_i"):
            if left[0] != "col":
                raise SyntaxError(f"{op} needs a $property left side")
            val = self.next()[1]
            if op.endswith("_i"):
                # CMP_CONTAINSI / CMP_STARTSWITHI (grammar.y:106-109,
                # rainerscript.c:3768 case-insensitive compares) —
                # compiled to an anchored (?i) regex mask
                import re as _re
                pat = "(?i)" + ("^" if op == "startswith_i" else "") \
                    + _re.escape(val)
                return ("regex", left[1], pat)
            return (op, left[1], val)
        if op not in ("==", "!=", "<=", ">=", "<", ">"):
            raise SyntaxError(f"unknown comparison op {op!r}")
        if self.peek()[1] == "[":
            # array membership: $x == ["a","b"] / != (negated) —
            # grammar.y:211-214; rainerscript.c:3752-3776 binary-
            # searches the sorted array; Router ("in",...) is isin
            if left[0] != "col":
                raise SyntaxError("array membership needs a $property")
            self.next()
            vals = []
            while self.peek()[1] != "]":
                vk, vv = self.next()
                if vk == "num":
                    vals.append(float(vv) if "." in vv else int(vv))
                elif vk == "string":
                    vals.append(vv)
                else:
                    raise SyntaxError(f"bad array element {vv!r}")
                if self.peek()[1] == ",":
                    self.next()
            self.expect("]")
            if op == "==":
                return ("in", left[1], sorted(vals, key=str))
            if op == "!=":
                return ("not", ("in", left[1], sorted(vals, key=str)))
            raise SyntaxError(f"array membership needs ==/!=, got {op!r}")
        vk, vv = self.peek()
        if vk in ("word", "string") and vv in ("on", "off") \
                and op in ("==", "!=") and left[0] == "col":
            self.next()
            return (op, left[1], vv == "on")  # boolean flag sugar
        right = self.sum_expr()
        if left[0] == "col" and right[0] == "lit":
            return (op, left[1], right[1])     # legacy simple form
        # arithmetic / col-vs-col comparison: Router expression nodes
        # (("arith",op,a,b) | ("col",n) | ("lit",v)) — numeric float64
        return (op, left, right)

    # arithmetic expression operands (grammar/grammar.y:100-123
    # %left '+' '-' / %left '*' '/' '%'): nodes the Router's
    # _num_pd/_num_row/_num_arrow evaluate
    def sum_expr(self):
        t = self.mul_expr()
        while self.peek()[1] in ("+", "-"):
            op = self.next()[1]
            t = ("arith", op, t, self.mul_expr())
        return t

    def mul_expr(self):
        t = self.atom_expr()
        while self.peek()[1] in ("*", "/", "%"):
            op = self.next()[1]
            t = ("arith", op, t, self.atom_expr())
        return t

    def atom_expr(self):
        k, v = self.next()
        if v == "(":
            e = self.sum_expr()
            self.expect(")")
            return e
        if v == "-":   # unary minus (constant-fold literals)
            f = self.atom_expr()
            if f[0] == "lit" and isinstance(f[1], (int, float)):
                return ("lit", -f[1])
            return ("arith", "-", ("lit", 0), f)
        if k == "num":
            return ("lit", float(v) if "." in v else int(v))
        if k == "prop":
            return ("col", _prop_name(v))
        if k == "string":
            return ("lit", v)
        raise SyntaxError(f"bad expression operand {v!r}")


# classic syslog selector tables (RFC3164 §4.1.1; the reference's
# decodeSyslogName tables in runtime/srutils.c syslog_*_names)
FACILITIES = {"kern": 0, "user": 1, "mail": 2, "daemon": 3, "auth": 4,
              "syslog": 5, "lpr": 6, "news": 7, "uucp": 8, "cron": 9,
              "authpriv": 10, "ftp": 11, "local0": 16, "local1": 17,
              "local2": 18, "local3": 19, "local4": 20, "local5": 21,
              "local6": 22, "local7": 23}
SEVERITIES = {"emerg": 0, "panic": 0, "alert": 1, "crit": 2, "err": 3,
              "error": 3, "warning": 4, "warn": 4, "notice": 5,
              "info": 6, "debug": 7}


def _selector_pred(fac: str, sev: str):
    """`fac.sev` selector semantics (runtime/ruleset.c:403 PRIFILT):
    facility matches AND severity is at least as severe (numerically
    <= the named level); '*' wildcards either side; sev 'none' means
    exclude the facility entirely (compiles to a never-true severity
    band here since it only makes sense combined in classic conf)."""
    clauses = []
    if fac != "*":
        clauses.append(("==", "facility", FACILITIES[fac]))
    if sev != "*":
        if sev == "none":
            clauses.append(("prifilt", "severity", -1, -1))
        else:
            clauses.append(("prifilt", "severity", 0, SEVERITIES[sev]))
    if not clauses:
        return ("true",)
    pred = clauses[0]
    for c in clauses[1:]:
        pred = ("and", pred, c)
    return pred


_PROPFILT_OPS = {  # runtime/ruleset.c:424-500 FIOP_*
    "contains": "contains",
    "isequal": "==",
    "startswith": "startswith",
    "regex": "regex",
    "ereregex": "regex",
}


def _sink_of(params: dict) -> tuple[str, bool, bool]:
    """action params -> (sink name, implicit stop, is_connector).

    Connector action types (omfwd/omkafka/DB sinks…) become NETWORK
    sinks: the name defaults to a type-derived identity (topic/index/
    table/target) and the params travel to config's connector registry
    (config._connector_spec) — ``action(type="omkafka" broker=".."
    topic="logs")`` in a .conf now delivers over the real wire."""
    from .config import CONNECTOR_ACTION_TYPES

    typ = params.get("type", "omfile")
    if typ == "omdiscard":
        return "discard", True, False
    if typ in CONNECTOR_ACTION_TYPES:
        ident = (params.get("name") or params.get("topic")
                 or params.get("searchindex") or params.get("table")
                 or params.get("collection") or params.get("target")
                 or params.get("server") or params.get("pipe") or "out")
        base = os.path.splitext(os.path.basename(str(ident)))[0]
        return f"{typ[2:]}_{base}", False, True
    f = params.get("file") or params.get("dynafile") or params.get("sink")
    if not f:
        raise SyntaxError(f"action(type={typ!r}) needs file=/sink=")
    base = os.path.basename(f)
    return os.path.splitext(base)[0], False, False


def parse_rainer(text: str) -> dict:
    """Compile RainerScript text to the config.py pipeline dict."""
    p = _P(_tokenize(text))
    cfg: dict = {"input": {"paths": []}, "routes": [],
                 "output": {"dir": "/tmp/raylog-out"}}
    modules: list[str] = []
    tpl_refs: list[tuple[str, dict]] = []  # (sink, action params)
    rulesets: dict[str, list] = {}        # name -> compiled routes
    target = [cfg["routes"]]              # route emission target stack

    def _splice_call(name, pred):
        """Inline a named ruleset's routes, ANDing the guarding
        condition onto each (call-under-if only fires when true)."""
        if name not in rulesets:
            raise SyntaxError(f"call of undeclared ruleset {name!r}")
        for r in rulesets[name]:
            combined = (r["pred"] if pred == ("true",)
                        else ["and", _pred_json(pred), r["pred"]])
            target[-1].append({"sink": r["sink"], "pred": combined,
                               "stop": r["stop"]})

    def _splice_call_indirect(col, pred):
        """CALL_INDIRECT (grammar.y:80): ``call_indirect $var`` picks
        the ruleset named by the VARIABLE's per-row value.  Batch
        analog: splice every declared ruleset, each additionally
        guarded by ($var == "<name>") — rows dispatch to exactly the
        ruleset their value names, rows naming no ruleset fall
        through (the reference logs and drops those)."""
        for name in rulesets:
            guard = ("==", col, name)
            full = guard if pred == ("true",) else ("and", pred, guard)
            _splice_call(name, full)

    def actions_block(pred):
        """{ action(...) [stop] ... } or a single action(...)"""
        stops_pending = []
        if p.peek()[1] == "{":
            p.next()
            while p.peek()[1] != "}":
                stmt = p.peek()[1]
                if stmt == "action":
                    p.next()
                    prm = p.params()
                    sink, istop, isconn = _sink_of(prm)
                    if isconn:
                        cfg.setdefault("connectors", {})[sink] = prm
                    if prm.get("template"):
                        tpl_refs.append((sink, prm))
                    stops_pending.append([sink, pred, istop])
                elif stmt == "stop":
                    p.next()
                    if stops_pending:
                        stops_pending[-1][2] = True
                    else:  # bare stop: consume matching rows, no sink
                        stops_pending.append(["discard", pred, True])
                elif stmt == "call":
                    p.next()
                    _splice_call(p.next()[1], pred)
                elif stmt == "call_indirect":
                    p.next()
                    _splice_call_indirect(_prop_name(p.next()[1]), pred)
                else:
                    raise SyntaxError(f"unexpected {stmt!r} in action block")
            p.expect("}")
        elif p.peek()[1] == "call":
            p.next()
            _splice_call(p.next()[1], pred)
            if p.peek()[1] == ";":
                p.next()
        elif p.peek()[1] == "call_indirect":
            p.next()
            _splice_call_indirect(_prop_name(p.next()[1]), pred)
            if p.peek()[1] == ";":
                p.next()
        else:
            p.expect("action")
            prm = p.params()
            sink, istop, isconn = _sink_of(prm)
            if isconn:
                cfg.setdefault("connectors", {})[sink] = prm
            if prm.get("template"):
                tpl_refs.append((sink, prm))
            stops_pending.append([sink, pred, istop])
            if p.peek()[1] == "stop":
                p.next()
                stops_pending[-1][2] = True
        for sink, pr, st in stops_pending:
            target[-1].append({"sink": sink, "pred": _pred_json(pr),
                               "stop": bool(st)})

    def _pred_json(t):
        if isinstance(t, (tuple, list)):
            return [_pred_json(x) for x in t]
        return t

    def _dyn_inc(args):
        """dyn_inc("bucket", KEY) -> an agg_kinds entry.  A bare
        property key counts that column directly; any other expression
        becomes a hidden computed column first."""
        if len(args) != 2 or args[0][0] != "lit":
            raise SyntaxError("dyn_inc needs (\"bucket\", key-expr)")
        bucket = str(args[0][1])
        key = args[1]
        if key[0] == "prop":
            col = key[1]
        else:
            col = f"__dyn_{bucket}"
            cfg.setdefault("computed", []).append(
                {"column": col, "expr": _pred_json(key)})
        cfg.setdefault("aggregates", [["lang", "lang"]]).append(
            [bucket, col])

    def _pctl_observe(args):
        """percentile_observe("name", VALUE) (perctile_stats,
        rainerscript doFunct_percentile_observe): the value compiles to
        a DDSketch bin-label column (sketch.pctl_bin_series) counted on
        the aggregate channel as kind "pctl:<name>" — mergeable,
        resumable; read back with sketch.quantiles_from_bins.
        Contract: the channel counts per DELIVERED (sink, row) — the
        returned frame carries the sink column, so filter to one sink
        (or use a single terminal route) for per-message semantics."""
        if len(args) != 2 or args[0][0] != "lit":
            raise SyntaxError(
                "percentile_observe needs (\"name\", value-expr)")
        name = str(args[0][1])
        col = f"__pctl_{name}"
        cfg.setdefault("computed", []).append(
            {"column": col,
             "expr": ["call", "pctl_bin", [_pred_json(args[1])]]})
        cfg.setdefault("aggregates", [["lang", "lang"]]).append(
            [f"pctl:{name}", col])

    _STATS_CALLS = {"dyn_inc": _dyn_inc,
                    "percentile_observe": _pctl_observe}

    def statement():
        k, v = p.peek()
        if v == "module":
            p.next()
            mod = p.params().get("load", "")
            modules.append(mod)
            if mod == "pmpages":  # built-in parser binding, like a pm*
                from .rulebase import PAGES_RULEBASE
                cfg["rules"] = [{"name": r.name, "pattern": r.pattern,
                                 "types": r.types}
                                for r in PAGES_RULEBASE.rules]
                cfg.setdefault("source_column", "text")
                cfg.setdefault("extract_column", "html")
            elif mod == "pmciscoios":
                # shipped Cisco IOS header grammar (vendor.py;
                # plugins/pmciscoios/pmciscoios.c) — origin form
                # first, plain second (first match wins)
                from .vendor import CISCO_IOS_RULEBASE
                cfg.setdefault("rules", []).extend(
                    {"name": r.name, "pattern": r.pattern,
                     "types": r.types} for r in CISCO_IOS_RULEBASE.rules)
            elif mod in ("pmsnare", "pmaixforwardedfrom",
                         "pmcisconames"):
                # message normalizers: rewrite recognized lines to
                # RFC3164 shape before the rulebase chain runs
                cfg.setdefault("normalizers", []).append(mod)
        elif v == "lookup_table":
            # lookup_table(name=".." file="x.lkp_tbl") — the reference's
            # JSON table file format (runtime/lookup.c lookupReadFile)
            p.next()
            prm = p.params()
            cfg.setdefault("lookups", {})[prm["name"]] = \
                {"file": prm["file"]}
        elif v == "template":
            # template(name=".." type="string" string="...%prop%...") or
            # template(name=".." type="list") { constant() property() }
            # — compiled eagerly so syntax errors surface at config time
            p.next()
            prm = p.params()
            if prm.get("type") == "list":
                entries = []
                p.expect("{")
                while p.peek()[1] != "}":
                    kind = p.next()[1]
                    eprm = p.params()
                    if kind == "constant":
                        entries.append({"constant": eprm.get("value", "")})
                    elif kind == "property":
                        entries.append(eprm)
                    else:
                        raise SyntaxError(
                            f"unexpected {kind!r} in list template")
                p.expect("}")
                from .template import Template
                Template.from_list(entries)      # validate
                cfg.setdefault("templates_list", {})[prm["name"]] = entries
            else:
                from .template import parse_template
                parse_template(prm.get("string", ""))
                cfg.setdefault("templates", {})[prm["name"]] = \
                    prm.get("string", "")
        elif v == "parser":
            # parser(name=".." pattern=".." types="col:ty,..") or
            # parser(name=".." sample="%f:ty% ...") — liblognorm style
            p.next()
            prm = p.params()
            rule: dict = {"name": prm.get("name", "rule")}
            if "sample" in prm:
                rule["sample"] = prm["sample"]
            else:
                rule["pattern"] = prm["pattern"]
                if prm.get("types"):
                    rule["types"] = dict(kv.split(":", 1)
                                         for kv in prm["types"].split(","))
            cfg.setdefault("rules", []).append(rule)
            if prm.get("source"):
                cfg["source_column"] = prm["source"]
        elif v == "global":
            p.next()
            prm = p.params()
            if "workDirectory" in prm:
                cfg["output"]["dir"] = prm["workDirectory"]
        elif v == "input":
            p.next()
            prm = p.params()
            if prm.get("type") == "imwarc":
                # crawl-stack input: whole archives
                # (input(type="imwarc" file="/archives")) or the
                # random-access CDX path (cdxDir= + url=/surtPrefix=,
                # optional warcDir= fetch root) — config._warc_input_ds
                cfg["input"]["format"] = "warc"
                if "file" in prm:
                    cfg["input"]["paths"].append(prm["file"])
                if prm.get("cdxDir"):
                    cfg["input"]["cdx_dir"] = prm["cdxDir"]
                if prm.get("warcDir"):
                    cfg["input"]["warc_root"] = prm["warcDir"]
                if prm.get("url"):
                    cfg["input"]["urls"] = [
                        u.strip() for u in prm["url"].split(",")
                        if u.strip()]
                if prm.get("surtPrefix"):
                    cfg["input"]["surt_prefixes"] = [
                        s.strip() for s in prm["surtPrefix"].split(",")
                        if s.strip()]
                return
            if "file" in prm:
                cfg["input"]["paths"].append(prm["file"])
            if prm.get("format"):
                cfg["input"]["format"] = prm["format"]
            if prm.get("startmsg.regex"):
                cfg["input"]["multiline_start"] = prm["startmsg.regex"]
        elif v in _STATS_CALLS:
            # bare-call form: dyn_inc("bucket", $key); /
            # percentile_observe("name", $val);
            p.next()
            p.expect("(")
            args = []
            while p.peek()[1] != ")":
                args.append(p.value_expr())
                if p.peek()[1] == ",":
                    p.next()
            p.expect(")")
            if p.peek()[1] == ";":
                p.next()
            _STATS_CALLS[v](args)
        elif v == "include":
            # include(file="glob" | text="...") (grammar.y:142
            # includeProcessCnf; doc/source/rainerscript/include.rst):
            # wildcard files splice in FILENAME SORT ORDER; mode =
            # abort-if-missing (raise) | required (default: note and
            # continue) | optional (silent skip).  Tokens splice at
            # the current position, so included statements see the
            # same rulesets/templates scope.
            import glob as _glob

            p.next()
            prm = p.params()
            texts: list[str] = []
            if "text" in prm:
                texts.append(prm["text"])
            if "file" in prm:
                files = sorted(_glob.glob(prm["file"]))
                mode = prm.get("mode", "required")
                if not files:
                    if mode == "abort-if-missing":
                        raise FileNotFoundError(
                            f"include file '{prm['file']}' missing "
                            f"(mode=abort-if-missing)")
                    if mode != "optional":
                        cfg.setdefault("warnings", []).append(
                            f"include file '{prm['file']}' not found")
                for f in files:
                    with open(f) as fh:
                        texts.append(fh.read())
            spliced = []
            for t in texts:
                spliced.extend(_tokenize(t))
            p.toks[p.i:p.i] = spliced
        elif v == "continue":
            # CONTINUE (grammar.y:77): an explicit no-op statement
            p.next()
            if p.peek()[1] == ";":
                p.next()
        elif v == "unset":
            # unset $x; (S_UNSET): the variable stops existing — the
            # batch analog nulls the column, so exists($x) reads False
            # and propfilt comparisons see null (-> False)
            p.next()
            col = _prop_name(p.next()[1])
            if p.peek()[1] == ";":
                p.next()
            cfg.setdefault("computed", []).append(
                {"column": col, "expr": ["lit", None]})
        elif v in ("set", "reset"):
            # set/reset $x = EXPR;  (S_SET/RESET, grammar.y:set_stmt —
            # computed column; RainerScript & concat and scalar
            # function calls; reset differs only for containers, which
            # a column assignment overwrites anyway)
            p.next()
            set_col = _prop_name(p.next()[1])
            p.expect("=")
            expr = p.value_expr()
            if p.peek()[1] == ";":
                p.next()
            if expr[0] == "call" and expr[1] in _STATS_CALLS:
                # set $.x = dyn_inc("bucket", $key) /
                # percentile_observe("name", $val) — the reference's
                # stats idioms (rainerscript.c doFunct_DynInc /
                # doFunct_percentile_observe).  The batch analog: the
                # observation becomes a keyed aggregate
                # (sinks._partials_for agg_kinds channel -> final
                # counts + impstats), the set-variable gets the
                # success status 0.
                _STATS_CALLS[expr[1]](expr[2])
                cfg.setdefault("computed", []).append(
                    {"column": set_col, "expr": ["lit", 0]})
            else:
                cfg.setdefault("computed", []).append(
                    {"column": set_col, "expr": _pred_json(expr)})
        elif v == "foreach":
            # foreach ($.x in $!arr) do STMTS done (S_FOREACH,
            # grammar.y FOREACH / runtime/ruleset.c:377-402
            # execIterative): the batch analog explodes the JSON array
            # column into one row per element bound to the iterator
            # column; body statements (and everything after — batch
            # semantics, documented) see the exploded stream.  Rows
            # whose array is missing/invalid/empty iterate zero times
            # and drop, like a body that never executes.
            p.next()
            p.expect("(")
            it_var = _prop_name(p.next()[1])
            if p.next()[1] != "in":
                raise SyntaxError("foreach: expected 'in'")
            src = _prop_name(p.next()[1])
            p.expect(")")
            p.expect("do")
            cfg.setdefault("foreach", []).append(
                {"var": it_var, "source": src})
            while p.peek()[1] != "done":
                if p.peek()[0] == "eof":
                    raise SyntaxError("foreach: missing 'done'")
                statement()
            p.expect("done")
        elif v == "if":
            # if COND then BLOCK [else BLOCK] (grammar.y if_stmt):
            # else-routes carry the negated condition
            p.next()
            pred = p.cond()
            p.expect("then")
            actions_block(pred)
            if p.peek()[1] == "else":
                p.next()
                actions_block(("not", pred))
        elif v == "ruleset":
            # ruleset(name="x") { statements } — routes collected under
            # the name; `call x` splices them (S_CALL/omruleset analog:
            # inlining preserves order + stop semantics)
            p.next()
            prm = p.params()
            rs: list = []
            target.append(rs)
            p.expect("{")
            try:
                while p.peek()[1] != "}":
                    statement()
            finally:
                target.pop()
            p.expect("}")
            rulesets[prm["name"]] = rs
        elif v == "call":
            p.next()
            _splice_call(p.next()[1], ("true",))
            if p.peek()[1] == ";":
                p.next()
        elif v == "call_indirect":
            p.next()
            _splice_call_indirect(_prop_name(p.next()[1]), ("true",))
            if p.peek()[1] == ";":
                p.next()
        elif v == ":":  # :prop, [!]op, "value"  action(...)
            p.next()
            prop = p.next()[1]
            p.expect(",")
            neg = False
            if p.peek()[1] == "!":
                p.next()
                neg = True
            op = p.next()[1]
            p.expect(",")
            val = p.next()[1]
            base = (_PROPFILT_OPS[op], prop, val)
            actions_block(("not", base) if neg else base)
        elif v == "*":  # *.sev selector (incl. the *.* catch-all)
            p.next()
            sev = "*"
            if p.peek()[1] == ".":
                p.next()
                sev = p.next()[1]
            actions_block(_selector_pred("*", sev))
        elif k == "word" and "." in v and \
                v.split(".", 1)[0] in FACILITIES and \
                v.split(".", 1)[1] in (set(SEVERITIES) | {"*", "none", ""}):
            # classic `facility.severity action(...)` selector line
            # ("mail.*" lexes as word "mail." + punct "*")
            p.next()
            fac, sev = v.split(".", 1)
            if sev == "":
                if p.peek()[1] != "*":
                    raise SyntaxError(f"bad selector {v!r}")
                p.next()
                sev = "*"
            actions_block(_selector_pred(fac, sev))
        elif v == "action":
            actions_block(("true",))
        elif v == ";":
            p.next()
        else:
            raise SyntaxError(f"unexpected top-level token {v!r}")

    while p.peek()[0] != "eof":
        statement()

    if modules:
        cfg["modules"] = modules
    # resolve action template= references to declared templates — the
    # sink then writes template-rendered .log lines instead of parquet
    for sink, prm in tpl_refs:
        name = prm["template"]
        if name in cfg.get("templates", {}):
            spec = {"template": cfg["templates"][name]}
        elif name in cfg.get("templates_list", {}):
            spec = {"template_list": cfg["templates_list"][name]}
        else:
            raise SyntaxError(f"action references undeclared template "
                              f"{name!r}")
        if prm.get("zipLevel"):
            # omfile zipLevel (tools/omfile.c:296-299): gzip the
            # rendered line files
            spec["zipLevel"] = int(prm["zipLevel"])
        cfg["output"].setdefault("formats", {})[sink] = spec
    return cfg


def load_rainer(path_or_text: str):
    """Parse a .conf file (or literal text) to a PipelineConfig."""
    from .config import load_config

    text = path_or_text
    if os.path.exists(path_or_text):
        with open(path_or_text) as fh:
            text = fh.read()
    return load_config(parse_rainer(text))
