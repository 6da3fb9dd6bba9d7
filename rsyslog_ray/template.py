"""Template engine — the reference's %property% text syntax, rendered
vectorized over DataFrames.

Reference surface: runtime/template.c — a template is a list of
constant and field entries; each field carries property-replacer
options (do_Parameter, template.c:1380-1560; applied in
runtime/msg.c:4350-4700).  Supported text syntax:

    constant text %prop% more %prop:from:to% ... %prop:::opt1,opt2%

- ``%prop:from:to%``       — 1-based inclusive char positions
  (``$`` = end of string; to also accepts ``$``)
- ``%prop:F,<code>:<n>%``  — field extraction: delimiter = ASCII code
  ``<code>``, 1-based field number ``<n>`` (template.h:141-146)
- ``%prop:R,<ere|bre>,<match#>,<submatch#>,<nomatch>:<regex>--end%``
  — regex select (template.h:125-139; nomatch ∈ DFLT/BLANK/FIELD/ZERO)
- options (4th slot, comma-separated): all 22 ``date-*`` formats,
  ``lowercase, uppercase, csv, json, jsonf, jsonr, sql, stdsql,
  drop-cc, space-cc, escape-cc, compressspace, drop-last-lf,
  sp-if-no-1st-sp, secpath-drop, secpath-replace, fixed-width``
  (option-name table template.c:1412-1533)

``render()`` produces the concatenated string column; a template whose
fields carry ``jsonf`` renders name/value JSON objects
(tplToJSON analog, template.c:1027).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from .functions import (compress_sp, csv_escape, drop_cc, escape_cc,
                        field as field_fn, fixed_width, format_time,
                        json_string_escape, re_select, space_cc,
                        sp_if_no_1st_sp, sql_escape)

_FIELD_RE = re.compile(r"%([^%]*)%")

_DATE_OPTS = {f"date-{n}": n for n in
              ["mysql", "pgsql", "rfc3164", "rfc3164-buggyday", "rfc3339",
               "unixtimestamp", "wdayname", "wday", "year", "month", "day",
               "hour", "minute", "second", "tzoffshour", "tzoffsmin",
               "tzoffsdirection", "ordinal", "week", "iso-week",
               "iso-week-year"]}
_DATE_OPTS["date-subseconds"] = "secfrac"
_DATE_OPTS["date-iso-week"] = "isoweek"
_DATE_OPTS["date-iso-week-year"] = "isoweekyear"

_NOMATCH = {"DFLT": "dflt", "BLANK": "blank", "FIELD": "field",
            "ZERO": "zero"}


class TplEntry:
    def __init__(self, const=None, prop=None, frm=None, to=None,
                 opts=(), regex=None, outname=None, datatype="string",
                 on_empty="keep"):
        self.const = const
        self.prop = prop
        self.frm = frm
        self.to = to
        self.opts = tuple(opts)
        self.regex = regex  # (type, match#, submatch#, nomatch, pattern)
        self.outname = outname or prop      # jsonf field name override
        self.datatype = datatype            # string|number|bool|auto
        self.on_empty = on_empty            # keep|skip|null


def parse_template(text: str) -> list[TplEntry]:
    """Template text -> entry list. ``%%`` renders a literal percent."""
    out: list[TplEntry] = []
    pos = 0
    for m in _FIELD_RE.finditer(text):
        if m.start() > pos:
            out.append(TplEntry(const=text[pos:m.start()]))
        body = m.group(1)
        pos = m.end()
        if body == "":             # '%%' literal
            out.append(TplEntry(const="%"))
            continue
        parts = body.split(":", 3)
        prop = parts[0]
        frm = parts[1] if len(parts) > 1 else ""
        to = parts[2] if len(parts) > 2 else ""
        opts = [o for o in (parts[3].split(",") if len(parts) > 3 else [])
                if o]
        regex = None
        if frm.startswith("R"):
            spec = frm.split(",")
            rtype = spec[1] if len(spec) > 1 and spec[1] else "ere"
            match_no = int(spec[2]) if len(spec) > 2 and spec[2] else 0
            submatch = int(spec[3]) if len(spec) > 3 and spec[3] else 0
            nomatch = _NOMATCH.get(spec[4].upper() if len(spec) > 4
                                   and spec[4] else "DFLT", "dflt")
            pat = to
            if pat.endswith("--end"):
                pat = pat[:-5]
            regex = (rtype, match_no, submatch, nomatch, pat)
            frm = to = ""
        out.append(TplEntry(prop=prop, frm=frm, to=to, opts=opts,
                            regex=regex))
    if pos < len(text):
        out.append(TplEntry(const=text[pos:]))
    return out


def _apply_entry(e: TplEntry, df: pd.DataFrame) -> pd.Series:
    col = df[e.prop]
    # date formats operate on the raw (datetime) column
    for o in e.opts:
        if o in _DATE_OPTS:
            col = format_time(col, _DATE_OPTS[o])
            break
    if not (str(col.dtype).startswith("datetime")):
        s = col.astype(str) if col.dtype != object and \
            str(col.dtype) != "string" else col.astype("string").fillna("")
    else:
        s = col.astype(str)
    s = pd.Series(s, index=df.index).astype("string").fillna("")

    if e.regex is not None:
        _, match_no, submatch, nomatch, pat = e.regex
        s = re_select(s, pat, match_no, submatch, nomatch).astype("string")
    elif e.frm.startswith("F,"):
        delim = chr(int(e.frm.split(",")[1]))
        s = field_fn(s, delim, int(e.to or 1)).astype("string")
    elif e.frm or e.to:
        start = 0 if e.frm in ("", "$") else int(e.frm) - 1
        stop = None if e.to in ("", "$") else int(e.to)
        s = s.str.slice(start, stop)

    for o in e.opts:
        if o in _DATE_OPTS:
            continue
        if o == "lowercase":
            s = s.str.lower()
        elif o == "uppercase":
            s = s.str.upper()
        elif o == "drop-cc":
            s = drop_cc(s)
        elif o == "space-cc":
            s = space_cc(s)
        elif o == "escape-cc":
            s = escape_cc(s)
        elif o == "compressspace":
            s = compress_sp(s)
        elif o == "drop-last-lf":
            s = s.str.replace(r"\n$", "", regex=True)
        elif o == "sp-if-no-1st-sp":
            s = sp_if_no_1st_sp(s)
        elif o == "secpath-drop" or o == "secpath-replace":
            s = (s.str.replace("/", "", regex=False) if o.endswith("drop")
                 else s.str.replace("/", "_", regex=False))
            # "", "." and ".." must never form a path (msg.c:4530-4550)
            s = s.mask(s == "", "_").mask(s == ".", "_").mask(s == "..", "_.")
        elif o == "csv":
            s = csv_escape(s)
        elif o in ("json", "jsonr"):
            s = json_string_escape(s) if o == "json" else s
        elif o in ("sql", "stdsql"):
            s = sql_escape(s, "mysql" if o == "sql" else "std")
        elif o == "fixed-width":
            width = None if e.to in ("", "$") else int(e.to)
            if width:
                s = fixed_width(s, width - (0 if not e.frm or e.frm == "$"
                                            else int(e.frm) - 1))
        elif o in ("jsonf", "jsonfr", "mandatory-field"):
            pass  # handled by render_jsonf / field presence
        else:
            raise ValueError(f"unknown template option {o!r}")
    return s.astype(object).where(s.notna(), "")


class Template:
    """Compiled template; ``render`` = tplToString, ``render_jsonf`` =
    tplToJSON over the jsonf-flagged fields."""

    def __init__(self, text: str, name: str = "t"):
        self.name = name
        self.entries = parse_template(text)

    def render(self, df: pd.DataFrame) -> pd.Series:
        acc = None
        for e in self.entries:
            part = (pd.Series(e.const, index=df.index, dtype=object)
                    if e.const is not None else _apply_entry(e, df))
            acc = part if acc is None else acc + part
        if acc is None:
            acc = pd.Series("", index=df.index, dtype=object)
        return acc

    def render_jsonf(self, df: pd.DataFrame) -> pd.Series:
        """Name/value JSON object per row from the field entries
        (constants are skipped, as tplToJSON does).  Honors the
        list-template per-field options (template.h:170-183):
        ``datatype`` string/number/bool/auto and ``onEmpty``
        keep/skip/null."""
        body = None
        for e in self.entries:
            if e.const is not None or e.prop is None:
                continue
            vals = _apply_entry(e, df).astype("string").fillna("")
            name = '"' + str(e.outname) + '":'
            if e.datatype == "number":
                rendered = vals.where(vals != "", "0")
            elif e.datatype == "bool":
                truthy = vals.str.lower().isin(["1", "true", "on", "yes"])
                rendered = pd.Series(np.where(truthy, "true", "false"),
                                     index=df.index)
            elif e.datatype == "auto":
                numeric = vals.str.fullmatch(r"-?\d+(\.\d+)?").fillna(False)
                quoted = '"' + json_string_escape(vals) + '"'
                rendered = vals.where(numeric, quoted)
            else:
                rendered = '"' + json_string_escape(vals) + '"'
            frag = name + rendered.astype("string")
            empty = vals == ""
            if e.on_empty == "null":
                frag = frag.mask(empty, name + "null")
            elif e.on_empty == "skip":
                frag = frag.mask(empty, "")
            if body is None:
                body = frag
            else:
                sep = pd.Series(np.where((body != "") & (frag != ""),
                                         ",", ""), index=df.index)
                body = body + sep + frag
        if body is None:
            return pd.Series("{}", index=df.index, dtype=object)
        return ("{" + body + "}").astype(object)

    @classmethod
    def from_list(cls, entries_spec: list[dict], name: str = "t"):
        """List-type template (template(type="list") { constant()
        property() ... }): each spec is {"constant": v} or {"name": ..,
        "outname", "format", "datatype", "onEmpty", "dateFormat",
        "caseConversion", "position.from", "position.to"}."""
        t = cls.__new__(cls)
        t.name = name
        t.entries = []
        for s in entries_spec:
            if "constant" in s:
                t.entries.append(TplEntry(const=s["constant"]))
                continue
            opts = []
            if s.get("dateFormat"):
                opts.append("date-" + s["dateFormat"])
            if s.get("caseConversion") == "upper":
                opts.append("uppercase")
            elif s.get("caseConversion") == "lower":
                opts.append("lowercase")
            if s.get("format") in ("jsonf", "json", "csv"):
                opts.append(s["format"])
            frm = s.get("position.from", "")
            to = s.get("position.to", "")
            t.entries.append(TplEntry(
                prop=s["name"], frm=str(frm), to=str(to), opts=opts,
                outname=s.get("outname"),
                datatype=s.get("datatype", "string"),
                on_empty=s.get("onEmpty", "keep")))
        return t
