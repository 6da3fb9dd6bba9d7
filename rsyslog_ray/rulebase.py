"""Rule compiler — liblognorm / parser-chain analog.

The reference parses each message through an ordered chain of parsers,
first match wins; unmatched rows are annotated, not silently mangled
(reference runtime/parser.c:613-693 parser chain;
plugins/mmnormalize/mmnormalize.c rulebases; pmrfc5424/pmrfc3164 header
grammars, tools/pmrfc5424.c:105-145).

Here a rulebase is an ordered list of named, typed, anchored regexes
compiled once (at actor ``__init__`` / module import, never per batch).
``parse_frame`` applies the chain *vectorized*: each rule's compiled
regex runs via ``pandas.Series.str.extract`` over only the
still-unmatched rows (first-match-wins by construction), producing typed
columns + ``rule`` + ``parse_ok`` (bParseSuccess analog, msg.h:68) —
rows never drop on parse failure.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

TS_FORMAT = "%Y-%m-%dT%H:%M:%S.%fZ"


@dataclass(frozen=True)
class Rule:
    name: str
    pattern: str                       # anchored regex with named groups
    types: dict = field(default_factory=dict)  # group -> 'str'|'int'|'ts'

    def compiled(self) -> re.Pattern:
        return re.compile(self.pattern)


_LOGNORM_TYPES = {
    # liblognorm parser-type subset -> (regex fragment, our cast type)
    "word": (r"\S+", "str"),
    "number": (r"-?\d+", "int"),
    "float": (r"-?\d+(?:\.\d+)?", "str"),
    "ipv4": (r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "str"),
    "quoted-string": (r'"[^"]*"', "str"),
    "rest": (r".*", "str"),
    "alpha": (r"[A-Za-z]+", "str"),
    "iso8601us": (r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z", "ts"),
    # liblognorm v2 additions (parser.c of the public liblognorm):
    "hexnumber": (r"0x[0-9a-fA-F]+", "str"),
    "mac48": (r"[0-9a-fA-F]{2}(?::[0-9a-fA-F]{2}){5}", "str"),
    "ipv6": (r"[0-9a-fA-F:]*:[0-9a-fA-F:]+(?:%\w+)?", "str"),
    "whitespace": (r"\s+", "str"),
}

_LOGNORM_FIELD = re.compile(
    r"%(-|[A-Za-z_][A-Za-z0-9_]*):([a-z0-9-]+)(?::([^%]*))?%")


def lognorm_rule(name: str, sample: str) -> Rule:
    """Compile one liblognorm-style sample line into a Rule.

    Supports the common subset of the sample syntax the reference's
    mmnormalize rulebases use (plugins/mmnormalize/mmnormalize.c
    rule=[...] arrays; liblognorm v2 samples):

        %field:word%  %n:number%  %ip:ipv4%  %msg:rest%
        %t:iso8601us% %q:quoted-string% %c:char-to:,%

    Literal text between fields is regex-escaped; the whole sample is
    anchored (first-match-wins chain semantics as in parse_table).
    """
    out = []
    types: dict[str, str] = {}
    pos = 0
    for m in _LOGNORM_FIELD.finditer(sample):
        out.append(re.escape(sample[pos:m.start()]))
        field, ptype, arg = m.group(1), m.group(2), m.group(3)
        if ptype == "char-to":
            if not arg:
                raise ValueError(f"char-to needs a delimiter: {m.group(0)}")
            frag, cast = rf"[^{re.escape(arg)}]*", "str"
        elif ptype == "string-to":
            # consume up to (not including) a multi-char literal
            # (liblognorm v2 string-to).  RE2 (the parse_table engine)
            # has no lookahead, so the bound is the non-greedy capture
            # plus the terminator literal itself, which must follow
            # the field in the sample text.
            if not arg:
                raise ValueError(
                    f"string-to needs a terminator: {m.group(0)}")
            if not sample[m.end():].startswith(arg):
                raise ValueError(
                    "string-to terminator must immediately follow "
                    f"the field in the sample: {m.group(0)}")
            frag, cast = r".*?", "str"
        elif ptype in _LOGNORM_TYPES:
            frag, cast = _LOGNORM_TYPES[ptype]
        else:
            raise ValueError(f"unsupported lognorm type {ptype!r}")
        if field == "-":
            # liblognorm's dash name: match-and-discard (no capture)
            out.append(f"(?:{frag})")
        else:
            out.append(f"(?P<{field}>{frag})")
            types[field] = cast
        pos = m.end()
    out.append(re.escape(sample[pos:]))
    return Rule(name, "^" + "".join(out) + "$", types)


def lognorm_rulebase(samples: list[tuple[str, str]]) -> "Rulebase":
    """Ordered (name, sample) pairs -> compiled first-match-wins chain."""
    return Rulebase([lognorm_rule(n, s) for n, s in samples])


class Rulebase:
    """Ordered first-match-wins rule chain, compiled ahead of time."""

    def __init__(self, rules: list[Rule]):
        self.rules = rules
        self._compiled = [(r, r.compiled()) for r in rules]
        # union of all output fields, in first-appearance order
        self.fields: list[tuple[str, str]] = []
        seen = set()
        for r in rules:
            for g in r.compiled().groupindex:
                if g not in seen:
                    seen.add(g)
                    self.fields.append((g, r.types.get(g, "str")))

    # ------------------------------------------------------------------
    def parse_row(self, line: str) -> tuple[str | None, dict]:
        """Per-row reference implementation (used by the oracle)."""
        for r, cre in self._compiled:
            m = cre.match(line)
            if m:
                out = {}
                for g, typ in self.fields:
                    v = m.groupdict().get(g)
                    out[g] = _cast_scalar(v, typ)
                return r.name, out
        return None, {g: None for g, _ in self.fields}

    # ------------------------------------------------------------------
    def parse_table(self, lines) -> dict:
        """Arrow/RE2-vectorized chain (the engine hot path).

        ``lines``: pa.Array/ChunkedArray of string.  Applies every
        rule's regex as one ``pc.extract_regex`` pass (RE2, C++), then
        coalesces per column in rule order — exactly first-match-wins,
        because an earlier rule's match masks later values.  Returns a
        dict of arrays: typed fields + ``rule`` + ``parse_ok``.
        """
        import pyarrow as pa
        import pyarrow.compute as pc

        if isinstance(lines, pa.ChunkedArray):
            lines = lines.combine_chunks()
        extracts = []   # (rule, struct_array, valid_mask)
        claimed = pa.array(np.zeros(len(lines), dtype=bool))
        rule_col = pa.nulls(len(lines), pa.string())
        for r, cre in self._compiled:
            ext = pc.extract_regex(lines, r.pattern)
            valid = pc.and_not(ext.is_valid(), claimed)  # first match wins
            extracts.append((r, ext, valid))
            rule_col = pc.if_else(valid, pa.scalar(r.name, pa.string()), rule_col)
            claimed = pc.or_(claimed, valid)

        out: dict = {}
        for g, typ in self.fields:
            col = pa.nulls(len(lines), pa.string())
            for r, ext, valid in extracts:
                if g in r.compiled().groupindex:
                    col = pc.if_else(valid, pc.struct_field(ext, g), col)
            out[g] = _cast_arrow(col, typ)
        out["rule"] = rule_col
        out["parse_ok"] = claimed
        return out

    # ------------------------------------------------------------------
    def parse_frame(self, lines: pd.Series) -> pd.DataFrame:
        """Vectorized chain over a batch. Returns typed columns +
        ``rule`` (string, None if unmatched) + ``parse_ok`` (bool)."""
        n = len(lines)
        idx = lines.index
        out = {g: pd.Series(pd.NA, index=idx, dtype="object")
               for g, _ in self.fields}
        rule_col = pd.Series(None, index=idx, dtype="object")
        unmatched = pd.Series(True, index=idx)
        for r, cre in self._compiled:
            if not unmatched.any():
                break
            sub = lines[unmatched]
            ext = sub.str.extract(cre)  # columns = named groups
            # a rule whose groups may all be empty still matches — detect
            # membership via match (patterns are ^..$-anchored), not extract NaNs
            hit = sub.str.match(cre).fillna(False)
            if not hit.any():
                continue
            hit_idx = sub.index[hit]
            for g in cre.groupindex:
                out[g].loc[hit_idx] = ext.loc[hit_idx, g]
            rule_col.loc[hit_idx] = r.name
            unmatched.loc[hit_idx] = False
        res = {}
        for g, typ in self.fields:
            res[g] = _cast_series(out[g], typ)
        res["rule"] = rule_col
        res["parse_ok"] = ~unmatched
        return pd.DataFrame(res, index=idx)


def _cast_scalar(v, typ: str):
    if v is None:
        return None
    if typ == "int":
        try:
            return int(v)
        except ValueError:
            return None
    if typ == "ts":
        import datetime as _dt
        try:
            return _dt.datetime.strptime(v, TS_FORMAT)
        except ValueError:
            return None  # malformed stamp -> null field, row still parsed
    return v


def _cast_arrow(col, typ: str):
    """Cast an Arrow string column to the rule type (null-preserving)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if typ == "int":
        # non-numeric capture (a rulebase may type a loose group as
        # int) -> null, matching the oracle's int() failure
        valid = pc.fill_null(pc.match_substring_regex(col, r"^-?\d+$"), False)
        return pc.cast(pc.if_else(valid, col, pa.scalar(None, pa.string())),
                       pa.int64())
    if typ == "ts":
        # "%Y-%m-%dT%H:%M:%S.%fZ": Arrow strptime lacks %f — validate
        # the WHOLE stamp first (malformed -> null, matching the
        # oracle's strptime failure), then parse the seconds prefix and
        # add the microsecond suffix arithmetically
        valid = pc.fill_null(pc.match_substring_regex(
            col, r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}\.\d{6}Z$"), False)
        col = pc.if_else(valid, col, pa.scalar(None, pa.string()))
        secs = pc.strptime(pc.utf8_slice_codeunits(col, 0, 19),
                           format="%Y-%m-%dT%H:%M:%S", unit="us",
                           error_is_null=True)
        micros = pc.cast(pc.utf8_slice_codeunits(col, 20, 26), pa.int64())
        return pc.cast(pc.add(pc.cast(secs, pa.int64()), micros),
                       pa.timestamp("us"))
    return col


def _cast_series(s: pd.Series, typ: str) -> pd.Series:
    if typ == "int":
        return pd.to_numeric(s, errors="coerce").astype("Int64")
    if typ == "ts":
        return pd.to_datetime(s, format=TS_FORMAT, errors="coerce")
    return s


# ----------------------------------------------------------------------
# Syslog header rulebases — pmrfc5424 / pmrfc3164 analogs.
#
# RFC5424 (reference tools/pmrfc5424.c:105-145 grammar):
#   <PRI>VERSION SP TIMESTAMP SP HOSTNAME SP APP-NAME SP PROCID SP
#   MSGID SP [SD]* SP MSG ; NILVALUE is "-".
# RFC3164 (reference tools/pmrfc3164.c:295-430):
#   <PRI>Mmm dd hh:mm:ss HOST TAG[pid]: MSG  (legacy BSD; heuristic
#   HOSTNAME/TAG disambiguation — here: HOST required, TAG word+colon).
# The chain places 5424 first, 3164 as fallback — the same order the
# reference recommends (parser chain, runtime/parser.c:613-693).
SYSLOG_RULEBASE = Rulebase([
    Rule(
        "rfc5424",
        r'^<(?P<pri>\d{1,3})>1 (?P<ts5424>\S+) (?P<hostname>\S+)'
        r' (?P<app_name>\S+) (?P<procid>\S+) (?P<msgid>\S+)'
        r' (?P<sd>(?:-|(?:\[[^\]]*\])+)) ?(?P<msg>.*)$',
        {"pri": "int", "ts5424": "ts"},
    ),
    Rule(
        "rfc3164",
        r'^<(?P<pri>\d{1,3})>(?P<ts3164>[A-Z][a-z]{2} [ \d]\d'
        r' \d{2}:\d{2}:\d{2}) (?P<hostname>\S+)'
        r' (?P<tag>[A-Za-z0-9_./-]+)(?:\[(?P<procid3>\d+)\])?:'
        r' ?(?P<msg>.*)$',
        {"pri": "int"},
    ),
])


_MONTHS = {m: i + 1 for i, m in enumerate(
    ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
     "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"])}


def parse_ts3164(col: pd.Series, now: "pd.Timestamp") -> pd.Series:
    """RFC3164 'Mmm dd hh:mm:ss' → timestamp with year inference
    (reference ParseTIMESTAMP3164, runtime/datetime.c:440: the format
    carries no year; rsyslog picks the year that puts the stamp closest
    to 'now', handling the Dec/Jan rollover in both directions)."""
    parts = col.str.extract(
        r"^([A-Z][a-z]{2}) ([ \d]\d) (\d{2}):(\d{2}):(\d{2})$")
    mon = parts[0].map(_MONTHS)
    # classic syslog year rule (ParseTIMESTAMP3164): a December stamp
    # read in January belongs to last year; a January stamp read in
    # December belongs to next year; otherwise the current year.
    year = pd.Series(now.year, index=col.index)
    year = year.where(~((mon == 12) & (now.month == 1)), now.year - 1)
    year = year.where(~((mon == 1) & (now.month == 12)), now.year + 1)
    return pd.to_datetime(pd.DataFrame({
        "year": year, "month": mon,
        "day": pd.to_numeric(parts[1].str.strip(), errors="coerce"),
        "hour": pd.to_numeric(parts[2], errors="coerce"),
        "minute": pd.to_numeric(parts[3], errors="coerce"),
        "second": pd.to_numeric(parts[4], errors="coerce"),
    }), errors="coerce")


def pri_decompose(pri):
    """severity = pri & 7, facility = pri >> 3 (reference
    runtime/msg.c PRI handling; parserParsePRI runtime/parser.c:575)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sev = pc.bit_wise_and(pri, 7)
    fac = pc.shift_right(pri, 3)
    return sev, fac


# ----------------------------------------------------------------------
# The default rulebase for the pages `text` log line (fixture F4):
# full weblog line, a truncated variant (no status/bytes — still a
# successful parse with null fields, pmrfc3164-style lenient fallback),
# and implicit catch-all -> parse_ok=false.
PAGES_RULEBASE = Rulebase([
    Rule(
        "weblog",
        r'^ts=(?P<p_ts>\S+) host=(?P<p_host>\S+) app=(?P<p_app>\w+)'
        r' sev=(?P<p_sev>\d) msg="(?P<p_msg>[^"]*)"'
        r' status=(?P<p_status>\d+) bytes=(?P<p_bytes>\d+)$',
        {"p_ts": "ts", "p_sev": "int", "p_status": "int", "p_bytes": "int"},
    ),
    Rule(
        "weblog_trunc",
        r'^ts=(?P<p_ts>\S+) host=(?P<p_host>\S+) app=(?P<p_app>\w+)'
        r' sev=(?P<p_sev>\d) msg="(?P<p_msg>[^"]*)"$',
        {"p_ts": "ts", "p_sev": "int"},
    ),
])
