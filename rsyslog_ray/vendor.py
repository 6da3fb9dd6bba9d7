"""Shipped vendor parser modules (pm*) — data, not mechanism.

The generic Rulebase chain (rulebase.py) is the repo's mmnormalize /
parser-chain analog; this module ships the actual per-vendor rule
content the reference distributes as pm* plugins, in two shapes:

1. **Header rulebases** (pmciscoios): a full header grammar that
   replaces pmrfc3164 for the device's format — here a Rulebase
   factory whose regexes mirror the C character walk.
2. **Message normalizers** (pmaixforwardedfrom, pmsnare,
   pmcisconames): parsers that REWRITE the raw message into standard
   RFC3164 shape and then "abort" so the stock parser chain continues
   (each C file ends in ABORT_FINALIZE(RS_RET_COULD_NOT_PARSE) after
   the rewrite).  Here each is a vectorized Series->Series transform
   plus a per-row reference oracle implementing the C walk literally;
   tests assert byte-identity between the two (CLAUDE.md invariant 5).

Reference specs:
- pmciscoios   plugins/pmciscoios/pmciscoios.c:134-263
- pmaixforwardedfrom contrib/pmaixforwardedfrom/pmaixforwardedfrom.c:65-146
- pmsnare      contrib/pmsnare/pmsnare.c:282-424
- pmcisconames contrib/pmcisconames/pmcisconames.c:66-146

All operate on the post-PRI text (the repo's syslog path strips <PRI>
via SYSLOG_RULEBASE / pri_decompose before vendor handling, matching
sFEATUREAutomaticPRIParsing in each module's IsCompatibleWithFeature).
"""

from __future__ import annotations

import re

import pandas as pd

from .rulebase import Rule, Rulebase

# ---------------------------------------------------------------------
# pmciscoios — Cisco IOS "syslog" header grammar
# (plugins/pmciscoios/pmciscoios.c:134-263)
# ---------------------------------------------------------------------

# TIMESTAMP3164 with PARSE3164_TZSTRING: "Mmm [d]d HH:MM:SS[.mmm][ TZ]"
# (runtime/datetime.c ParseTIMESTAMP3164; TZ is a short letter word,
# e.g. "gmt"/"UTC")
_TS3164 = (r"(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)"
           r" (?: \d|\d\d) \d{2}:\d{2}:\d{2}(?:\.\d{1,3})?"
           r"(?: [A-Za-z]{1,6})?")


def cisco_ios_rulebase(origin: bool = False, xr: bool = False) -> Rulebase:
    """Compile the pmciscoios grammar for one (present.origin,
    present.xr) parser instance (pmciscoios.c:54-56 parser params) to
    a one-rule Rulebase.

    The C walk (pmciscoios.c:134-263): MESSAGE COUNTER (digits, may be
    empty) ": " -> [origin: anything up to the first ": ", IPv6-safe]
    -> [xr: RSP node up to the first ':'] -> optional '*'/'.' before
    the TIMESTAMP -> TIMESTAMP3164 ": " -> [xr: skip to '%'] ->
    "%TAG" (to ':' or ' '; xr skips one char after) ": " -> MSG.
    """
    parts = [r"^(?P<seq>\d*): "]
    if origin:
        # scan to the FIRST ": " — a lone ':' (IPv6 "::1") doesn't
        # terminate (pmciscoios.c:169-172).  Non-greedy .*? gives the
        # first-occurrence semantics without lookahead (the Rulebase
        # vectorized path runs under RE2, which has none); origin may
        # be empty (the C while loop can read zero chars)
        parts.append(r"(?P<origin>.*?): ")
    if xr:
        # XR RSP header: scan to the first ':', skip exactly one char
        # (pmciscoios.c:188-199)
        parts.append(r"[^:]*:")
    parts.append(r"[*.]?(?P<ts>" + _TS3164 + r"): ")
    if xr:
        # post-timestamp XR scan to the tag's '%' (pmciscoios.c:216-226)
        parts.append(r"[^%]*")
        # tag stops at ':' or ' '; XR then skips ONE char before the
        # ": " delimiter check (pmciscoios.c:236-249) -> "%TAG : msg"
        parts.append(r"%(?P<tag>[^: ]+) : (?P<msg>.*)")
    else:
        parts.append(r"%(?P<tag>[^: ]+): (?P<msg>.*)")
    name = "ciscoios" + ("_origin" if origin else "") + \
        ("_xr" if xr else "")
    return Rulebase([Rule(name, "".join(parts) + "$",
                          {"seq": "int", "tag": "str", "msg": "str"})])


# The default parser chain a `module(load="pmciscoios")` binds: the
# origin form first (more specific), then the plain form — first match
# wins, like stacking two parser() instances in rsyslog.conf.
CISCO_IOS_RULEBASE = Rulebase(
    cisco_ios_rulebase(origin=True).rules
    + cisco_ios_rulebase(origin=False).rules)


# ---------------------------------------------------------------------
# pmaixforwardedfrom — strip the AIX "Message forwarded from host:" /
# "From host:" preamble so the line reverts to plain RFC3164
# (contrib/pmaixforwardedfrom/pmaixforwardedfrom.c:65-146)
# ---------------------------------------------------------------------

# leading SP permitted (c:81-84); >=24 chars after it (c:85-89);
# 16-char timestamp skipped blind (c:92-93); case-insensitive opening
# (c:95-97 strncasecmp); hostname runs to ':' with no space allowed
# before it (c:118-133); the ':' is removed (c:135-140)
_AIX_RE = re.compile(
    # ' *+' possessive: the C walk consumes ALL leading spaces and
    # never backtracks the 16-char timestamp window to find a match
    r"^( *+)(?=.{24})(.{16})(?:message forwarded from |from )"
    r"(?=..)([^ :]*):",   # >=2 chars after the preamble (c:107-110);
    re.IGNORECASE)        # hostname may be empty (walk can stop at 0)


def aix_forwarded_row(line: str) -> str | None:
    """Per-row C walk (the oracle). None = COULD_NOT_PARSE without a
    rewrite (the real module aborts either way; None here means 'leave
    the line untouched')."""
    i = 0
    while i < len(line) and line[i] == " ":
        i += 1
    rest = line[i:]
    if len(rest) < 24:
        return None
    ts, after = rest[:16], rest[16:]
    low = after.lower()
    if low.startswith("message forwarded from "):
        after = after[23:]
    elif low.startswith("from "):
        after = after[5:]
    else:
        return None
    if len(after) < 2:
        return None
    j = 0
    while j < len(after) and after[j] not in " :":
        j += 1
    if j >= len(after):
        return None
    if after[j] != ":":
        return None   # a space first: similar preamble, not AIX
    return line[:i] + ts + after[:j] + after[j + 1:]


def aix_forwarded_normalize(s: pd.Series) -> pd.Series:
    """Vectorized engine: one compiled-regex pass; non-matching rows
    pass through unchanged (parser-chain continue semantics)."""
    return s.str.replace(_AIX_RE, r"\1\2\3", n=1, regex=True)


# ---------------------------------------------------------------------
# pmsnare — un-mangle Snare agent logs: the tab between hostname and
# the Snare tag (and the tab after the tag) become single spaces so
# pmrfc3164 parses hostname + tag (contrib/pmsnare/pmsnare.c:282-424)
# ---------------------------------------------------------------------

_SNARE_TAGS = ("MSWinEventLog", "LinuxKAudit")


def snare_row(line: str, tab_rep: str = "\t") -> str | None:
    """Per-row C walk. ``tab_rep`` is the on-wire tab representation
    (literal "\\t" by default; "#011" when control characters were
    escaped on receive — pmsnare.c:236-260 endCnfLoad)."""
    L = len(tab_rep)
    if len(line) < 30:                      # c:313-317
        return None
    i = 0                                    # first separator (c:321-324)
    while i < len(line) and line[i] not in (" ", "\t", tab_rep[0]):
        i += 1

    def tag_after(s: str) -> int | None:
        # hasPrefixWithFollowingTab (c:116-123)
        for tag in _SNARE_TAGS:
            tl = len(tag)
            if len(s) >= tl + L and s[:tl].lower() == tag.lower() \
                    and s[tl:tl + L].lower() == tab_rep.lower():
                return tl
        return None

    rem = line[i:]
    if len(rem) > L and rem[:L].lower() == tab_rep.lower():
        tl = tag_after(rem[L:])              # non-syslog form (c:331-359)
        if tl is None:
            return None
        new = line[:i] + " " + line[i + L:]  # host-tag tab -> one space
        snare_idx = i + 1 + tl
    else:                                    # syslog form (c:361-394)
        if len(line) < 17:
            return None
        j = 16                               # skip TIMESTAMP blind
        while j < len(line) and line[j] != " ":
            j += 1                           # skip HOSTNAME
        if j < len(line):
            j += 1                           # the separating space
        tl = tag_after(line[j:])
        if tl is None:
            return None
        new = line
        snare_idx = j + tl
    if len(new) - snare_idx < L:             # c:402-404
        return None
    return new[:snare_idx] + " " + new[snare_idx + L:]  # tag tab -> space


def _snare_res(tab_rep: str):
    t = re.escape(tab_rep)
    tags = "|".join(_SNARE_TAGS)
    first = re.escape(tab_rep[0])
    # branch predicate (c:326-328): the first separator (' ', '\t' or
    # tab_rep[0]) IS the tab representation, with >=1 char after it —
    # this selects the non-syslog form; everything else falls to the
    # syslog form, EVEN when the tag check then fails (no fall-through)
    br = re.compile(rf"^[^ \t{first}]*{t}.", re.IGNORECASE)
    # form 1 (non-syslog): host tab TAG tab — both tabs collapse to
    # single spaces in one match
    f1 = re.compile(rf"^(?=.{{30}})([^ \t{first}]*){t}({tags}){t}",
                    re.IGNORECASE)
    # form 2 (syslog): 16 blind chars, hostname to the next space,
    # then tag + tab
    f2 = re.compile(rf"^(?=.{{30}})(.{{16}}[^ ]* )({tags}){t}",
                    re.IGNORECASE)
    return br, f1, f2


_SNARE_RES = {rep: _snare_res(rep) for rep in ("\t", "#011")}


def snare_normalize(s: pd.Series, tab_rep: str = "\t") -> pd.Series:
    br, f1, f2 = _SNARE_RES.get(tab_rep) or _snare_res(tab_rep)
    tabsep = s.str.match(br).fillna(False)
    out1 = s.str.replace(f1, r"\1 \2 ", n=1, regex=True)
    out2 = s.str.replace(f2, r"\1\2 ", n=1, regex=True)
    # the C branches are exclusive on the first-separator test: a
    # tab-separated line that fails the tag check stays UNCHANGED
    # (pmsnare.c:355-358), it does not retry as the syslog form
    return out1.where(tabsep, out2)


# ---------------------------------------------------------------------
# pmcisconames — drop the stray " : " a Cisco relay inserts between
# hostname and "%name" tag (contrib/pmcisconames/pmcisconames.c:66-146)
# ---------------------------------------------------------------------

def cisconames_row(line: str) -> str | None:
    i = 0
    while i < len(line) and line[i] == " ":
        i += 1
    rest = line[i:]
    if len(rest) < 34:                      # c:84-88
        return None

    def at(k: int, ch: str) -> bool:
        return k < len(rest) and rest[k] == ch
    # short 'Mmm DD HH:MM:SS ' (c:97-103) else long
    # 'Mmm DD YYYY HH:MM:SS ' (c:105-111) — short checked first
    if at(9, ":") and at(12, ":") and at(3, " ") and at(6, " ") \
            and at(15, " "):
        j = 16
    elif at(14, ":") and at(17, ":") and at(3, " ") and at(6, " ") \
            and at(11, " ") and at(20, " "):
        j = 21
    else:
        return None
    k = j
    while k < len(rest) and rest[k] != " ":
        k += 1                               # walk past hostname
    if len(rest) - k < 4:                    # sizeof(": %") incl NUL
        return None
    k += 1                                   # the space stays
    if rest[k:k + 3] != ": %":
        return None
    return line[:i] + rest[:k] + rest[k + 2:]   # drop the ": "


_CISCONAMES_RE = re.compile(
    r"^( *)(?=.{34})"
    r"((?:.{3} .{2} .{2}:.{2}:.{2} )|(?:.{3} .{2} .{4} .{2}:.{2}:.{2} ))"
    r"([^ ]*) : %")


def cisconames_normalize(s: pd.Series) -> pd.Series:
    return s.str.replace(_CISCONAMES_RE, r"\1\2\3 %", n=1, regex=True)


# ---------------------------------------------------------------------
# registry — what `module(load="pm...")` binds in the .conf front-end
# ---------------------------------------------------------------------

NORMALIZERS = {
    "pmaixforwardedfrom": aix_forwarded_normalize,
    "pmsnare": snare_normalize,
    "pmcisconames": cisconames_normalize,
}

NORMALIZER_ORACLES = {
    "pmaixforwardedfrom": aix_forwarded_row,
    "pmsnare": snare_row,
    "pmcisconames": cisconames_row,
}


def apply_normalizers(s: pd.Series, names: list[str]) -> pd.Series:
    """Run the named normalizers in order — the parser-chain analog:
    each rewrites the rows it recognizes and passes the rest through
    (every module 'aborts' so the chain continues, pmaixforwardedfrom.c
    :141-143)."""
    for n in names:
        fn = NORMALIZERS.get(n)
        if fn is None:
            raise ValueError(f"unknown vendor normalizer {n!r}")
        s = fn(s)
    return s


# ---------------------------------------------------------------------
# mmleefparse — LEEF (Log Event Extended Format) decoder
# (plugins/mmleefparse/mmleefparse.c:110-520): cookie search in a
# bounded window, 5-field '|' header with '\'-escapes, delimiter-
# separated key=value extension block
# ---------------------------------------------------------------------

_C_SPACE = " \t\n\v\f\r"        # C isspace(), not unicode isspace


def _leef_next_segment(s: str, pos: int, delim: str) -> tuple[int, bool]:
    """find_next_segment (mmleefparse.c:155-177): index of the first
    unescaped delimiter at/after pos (a '\\' escapes exactly the next
    char), plus whether one was found."""
    i, escaped = pos, False
    while i < len(s):
        if not escaped and s[i] == "\\":
            escaped = True
            i += 1
            continue
        if not escaped and s[i] == delim:
            return i, True
        escaped = False
        i += 1
    return i, False


def _leef_unescape(seg: str, delim: str) -> str:
    """leef_unescape_copy (c:213-235): '\\' before '\\', '=', the
    delimiter or '|' resolves; any other '\\' stays literal."""
    out, i = [], 0
    while i < len(seg):
        if seg[i] == "\\" and i + 1 < len(seg) and \
                seg[i + 1] in ("\\", "=", delim, "|"):
            out.append(seg[i + 1])
            i += 2
        else:
            out.append(seg[i])
            i += 1
    return "".join(out)


def leef_parse_row(line: str, delimiter: str = "\t",
                   cookie: str = "LEEF:",
                   search_window: int = 64) -> dict | None:
    """Parse one LEEF message to the reference's JSON shape:
    ``{"header": {protocolVersion, vendor, product, productVersion,
    eventID}, "fields": {k: v, ...}}``; None = no/invalid LEEF (the
    module sets parse_ok false and moves on).  Defaults mirror
    setInstParamDefaults (c:509-513): tab extension delimiter, cookie
    searched in the first 64 chars after leading whitespace."""
    i = 0
    while i < len(line) and line[i] in _C_SPACE:
        i += 1
    s = line[i:]
    window = min(search_window, len(s))
    at = s.find(cookie, 0, window)  # offset <= window-len(cookie)
    if at < 0 or at > window - len(cookie):
        if not s.startswith(cookie):
            return None
        at = 0
    pos = at + len(cookie)

    header = {}
    for j, name in enumerate(("protocolVersion", "vendor", "product",
                              "productVersion", "eventID")):
        end, has = _leef_next_segment(s, pos, "|")
        if j < 3 and not has:                    # c:261-279 hard-require
            return None
        if j == 3 and not has and end == pos:    # c:284 len==0 && !delim
            return None
        header[name] = _leef_unescape(s[pos:end], "|")
        pos = end + 1 if has else end

    fields = {}
    while pos < len(s):                          # c:315-357
        end, has = _leef_next_segment(s, pos, delimiter)
        seg = s[pos:end]
        if not seg and not has:
            break
        if seg:
            eq = None
            k, escaped = pos, False
            while k < end:                       # find_unescaped_char
                if not escaped and s[k] == "\\":
                    escaped = True
                    k += 1
                    continue
                if not escaped and s[k] == "=":
                    eq = k
                    break
                escaped = False
                k += 1
            if eq is None:
                fields[_leef_unescape(seg, delimiter)] = ""
            else:
                fields[_leef_unescape(s[pos:eq], delimiter)] = \
                    _leef_unescape(s[eq + 1:end], delimiter)
        pos = end + 1 if has else end
    return {"header": header, "fields": fields}


def leef_parse(s: pd.Series, delimiter: str = "\t",
               cookie: str = "LEEF:",
               search_window: int = 64) -> pd.DataFrame:
    """Batch decoder: header fields as typed columns + the extension
    block as a compact-JSON ``fields`` column + ``parse_ok``.  LEEF is
    inherently per-row state-machine work (escape tracking), like the
    repo's mmjsonparse — a comprehension over the batch, not a hot-path
    regex stage."""
    import json as _json

    rows = [leef_parse_row(v, delimiter, cookie, search_window)
            if isinstance(v, str) else None for v in s]
    cols = {n: [r["header"][n] if r else None for r in rows]
            for n in ("protocolVersion", "vendor", "product",
                      "productVersion", "eventID")}
    cols["fields"] = [_json.dumps(r["fields"], separators=(",", ":"))
                      if r else None for r in rows]
    cols["parse_ok"] = [r is not None for r in rows]
    return pd.DataFrame(cols, index=s.index)


# ---------------------------------------------------------------------
# mmaudit — Linux Audit record decoder
# (plugins/mmaudit/mmaudit.c:113-260): "type=NNNN audit(ID): k=v ..."
# with '/" quoted values
# ---------------------------------------------------------------------

def audit_parse_row(line: str) -> dict | None:
    """Parse one audit record to the reference's JSON shape:
    ``{"hdr": {"auditid": ..., "type": N}, "data": {k: v, ...}}``.

    Divergence kept deliberate: the C computes ``buf +=
    sizeof(" audit(")`` (c:232), an off-by-one that silently drops the
    FIRST char of every audit id; we keep the full id and document the
    delta rather than reproduce the bug."""
    i = 0
    while i < len(line) and line[i] in _C_SPACE:
        i += 1
    if not line.startswith("type=", i):
        return None
    i += 5
    type_id = 0
    ndig = 0
    while i < len(line) and line[i].isdigit():
        type_id = type_id * 10 + int(line[i])
        i += 1
        ndig += 1
    if ndig == 0 and not line.startswith(" audit(", i):
        return None
    if not line.startswith(" audit(", i):
        return None
    i += 7
    j = line.find(")", i)
    if j < 0 or not line.startswith("):", j):
        return None
    auditid = line[i:j]
    i = j + 2

    data = {}
    while i < len(line):                 # audit_parse (c:164-191)
        while i < len(line) and line[i] in _C_SPACE:
            i += 1                       # parseName skipWhitespace
        k = i
        while k < len(line) and line[k] != "=":
            k += 1
        name = line[i:k]
        if k >= len(line):               # *buf != '=' -> parse error
            if name:
                return None
            break
        i = k + 1                        # past '='
        if i < len(line) and line[i] in "'\"":
            term = line[i]
            i += 1
        else:
            term = " "
        v = i
        while v < len(line) and line[v] != term:
            v += 1
        data[name] = line[i:v]
        i = v + 1 if v < len(line) else v
    return {"hdr": {"auditid": auditid, "type": type_id}, "data": data}


def audit_parse(s: pd.Series) -> pd.DataFrame:
    """Batch decoder: hdr fields as columns + ``data`` compact JSON +
    ``parse_ok`` (MsgSetParseSuccess analog)."""
    import json as _json

    rows = [audit_parse_row(v) if isinstance(v, str) else None
            for v in s]
    return pd.DataFrame({
        "auditid": [r["hdr"]["auditid"] if r else None for r in rows],
        "audit_type": pd.array(
            [r["hdr"]["type"] if r else None for r in rows],
            dtype="Int64"),
        "data": [_json.dumps(r["data"], separators=(",", ":"))
                 if r else None for r in rows],
        "parse_ok": [r is not None for r in rows],
    }, index=s.index)


# ---------------------------------------------------------------------
# mmsnmptrapd — rewrite snmptrapd-emitted messages: pull the real
# severity + origin host out of the TAG and re-home them
# (plugins/mmsnmptrapd/mmsnmptrapd.c:157-252 getTagComponent/doAction,
# :255-300 buildSeverityMapping, :326-345 tag defaults)
# ---------------------------------------------------------------------

def _tag_component(tag: str, pos: int) -> str:
    """getTagComponent (mmsnmptrapd.c:181-197): empty unless the char
    at ``pos`` is '/'; then chars until '/', SP or end."""
    if pos >= len(tag) or tag[pos] != "/":
        return ""
    out = []
    for ch in tag[pos + 1:]:
        if ch in (" ", "/"):
            break
        out.append(ch)
    return "".join(out)


def severity_mapping(spec: str) -> dict[str, int]:
    """``"warning/4,error/3"`` → mapping; codes outside 0..7 rejected
    (mmsnmptrapd.c:274-289)."""
    out = {}
    for pair in spec.split(","):
        if not pair.strip():
            continue
        name, _, code = pair.partition("/")
        code = int(code.strip())
        if not 0 <= code <= 7:
            raise ValueError(
                f"severity code {code} outside of valid range 0..7")
        out[name.strip()] = code
    return out


def snmptrapd_rewrite_row(tag: str, hostname: str, severity,
                          *, tag_name: str = "snmptrapd",
                          sever_map: dict[str, int] | None = None):
    """Per-row oracle of the C walk (mmsnmptrapd.c:217-252): a TAG of
    ``<name>/<sever>/<host>:`` has its severity string and true origin
    host extracted; the TAG collapses to ``<name>:``, HOSTNAME becomes
    the extracted host (trailing ':' stripped, set even when empty —
    MsgSetHOSTNAME is unconditional on tag match), severity becomes
    the mapped code when the mapping knows the string."""
    tag = tag or ""
    tag_id = tag_name + "/"
    if not tag.startswith(tag_id):
        return tag, hostname, severity
    sever = _tag_component(tag, len(tag_id) - 1)
    host = _tag_component(tag, len(tag_id) + len(sever))
    if host.endswith(":"):
        host = host[:-1]
    code = (sever_map or {}).get(sever, -1)
    return (tag_name + ":", host,
            code if code != -1 else severity)


def snmptrapd_rewrite(tag: pd.Series, hostname: pd.Series,
                      severity: pd.Series, *,
                      tag_name: str = "snmptrapd",
                      sever_map: dict[str, int] | None = None):
    """Vectorized mmsnmptrapd: returns (tag, hostname, severity)
    Series.  Byte-identical to :func:`snmptrapd_rewrite_row` per row
    (tests enforce)."""
    import numpy as np

    tag = tag.fillna("")
    tag_id = tag_name + "/"
    # sever: chars after the tag-id '/' until '/', SP or end; host:
    # only when a '/' immediately follows sever (getTagComponent's
    # leading-slash requirement), until '/', SP or end
    ext = tag.str.extract(
        "^" + re.escape(tag_id) + r"([^/ ]*)(?:/([^/ ]*))?",
        expand=True)
    matched = ext[0].notna()
    sever = ext[0].fillna("")
    host = ext[1].fillna("").str.replace(r":$", "", regex=True)
    codes = sever.map(sever_map or {})
    new_tag = tag.where(~matched, tag_name + ":")
    new_host = hostname.where(~matched, host)
    repl = (matched & codes.notna()).to_numpy()
    new_sev = severity.copy()
    new_sev[repl] = codes[repl].astype(np.int64)
    return new_tag, new_host, new_sev


# ---------------------------------------------------------------------
# mmsnareparse — Snare-for-Windows event decoder, CORE SUBSET of
# plugins/mmsnareparse/mmsnareparse.c (5764 lines; multi-variant).
# Covered here: literal-tab normalization (c:1038 \t → TAB; the agent
# also ships #011), PRI skip + MSWinEventLog payload location
# (c:3004-3160), the classic TSV field layout (Criticality, Channel,
# SnareCounter, TimeCreated, EventID, Provider, User, SIDType,
# EventLogType, Computer, Category, Description, with the EventID-
# as-int typing of c:4693), and key/value extraction of the
# Description section on multi-space/colon boundaries into EventData
# (c:687-760 tokenize_on_multispace + c:3919-3960), with int/bool
# typing (c:3382-3400).  The per-EventID knowledge tables + sectioned
# Windows-Security decode live further down (snare_win_parse);
# RFC5424-wrapped payloads (c:3004-3045 skip_rfc5424_header, incl.
# structured-data sections) decode via the locate-payload scan — the
# RFC5424 token layout shares the classic indices (c:4610) — pinned
# in t:test_syslog.  NOT covered: the tag-moved degraded variants
# (need the syslog message object's TAG, a stream-parser concern).
# ---------------------------------------------------------------------

_SNARE_FIELDS = ("criticality", "channel", "snare_counter",
                 "time_created", "event_id", "provider", "user",
                 "sid_type", "event_log_type", "computer", "category")


def _snare_typed(v: str):
    if re.fullmatch(r"[+-]?\d+", v):
        return int(v)
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def snare_kv_parse(text: str) -> dict:
    """Description → {key: typed value}: split on TAB or 2+ spaces
    (a colon-terminated token keeps its following single gap, like
    tokenize_on_multispace's colon_precedes rule), pair up
    ``Key:  Value`` segments."""
    segs = [s.strip() for s in re.split(r"\t+| {2,}", text)
            if s.strip()]
    out: dict = {}
    key = None
    for seg in segs:
        if seg.endswith(":"):                 # "Key:" then value seg
            key = seg[:-1].strip()
            continue
        if ":" in seg:
            k, _, v = seg.partition(":")
            v = v.strip()
            if v:
                out[k.strip()] = _snare_typed(v)
                key = None
            else:
                key = k.strip()
            continue
        if key is not None:
            out[key] = _snare_typed(seg)
            key = None
    return out


def snare_event_parse_row(line: str) -> dict | None:
    """One Snare TSV event → {hdr fields..., event_data} or None when
    the line carries no MSWinEventLog payload."""
    if not isinstance(line, str):
        return None
    # PRI skip (c:3064-3076) + literal-tab normalization (c:1038)
    s = line.lstrip()
    m = re.match(r"<\d+>", s)
    if m:
        s = s[m.end():].lstrip()
    s = s.replace("\\t", "\t").replace("#011", "\t")
    at = s.find("MSWinEventLog")
    if at < 0:
        return None
    parts = s[at:].split("\t")
    hdr = dict(zip(_SNARE_FIELDS, (p.strip() for p in parts[1:12])))
    for k in _SNARE_FIELDS:
        hdr.setdefault(k, "")
    try:
        hdr["event_id"] = int(hdr["event_id"])   # c:4693 json int
    except ValueError:
        hdr["event_id"] = None
    desc = parts[12] if len(parts) > 12 else ""
    hdr["event_data"] = snare_kv_parse(desc)
    return hdr


def snare_event_parse(s: pd.Series) -> pd.DataFrame:
    """Batch decoder: header fields as columns + ``event_data``
    compact JSON + ``parse_ok``."""
    import json as _json

    rows = [snare_event_parse_row(v) for v in s]
    cols = {f: [r[f] if r else None for r in rows]
            for f in _SNARE_FIELDS}
    cols["event_id"] = pd.array(cols["event_id"], dtype="Int64")
    cols["event_data"] = [
        _json.dumps(r["event_data"], separators=(",", ":"), sort_keys=True)
        if r else None for r in rows]
    cols["parse_ok"] = [r is not None for r in rows]
    return pd.DataFrame(cols, index=s.index)


# ---------------------------------------------------------------------
# mmsnareparse per-EventID knowledge tables + sectioned Description
# decode — the Windows-Security half of mmsnareparse.c:
#   event metadata   g_eventMappings      (mmsnareparse.c:563-626)
#   logon types      g_logonTypeMap       (c:549-562)
#   section table    g_builtinSectionDescriptors (c:508-547)
#   label camel-case normalize_label      (c:1057-1095, parens dropped)
#   description normalization (3+ spaces -> section line, c:4209-4248)
#   section behaviors standard/inline/semicolon/list (c:4356-4400)
#   typed values + LogonTypeName sibling  (c:3668-3682)
#   placeholder drop '-'/'N/A'            (c:628-636 is_placeholder)
#   outcome derivation from audit result  (c:3765-3775)
# ---------------------------------------------------------------------

SNARE_LOGON_TYPES = {
    0: "System", 1: "System", 2: "Interactive", 3: "Network",
    4: "Batch", 5: "Service", 7: "Unlock", 8: "NetworkCleartext",
    9: "NewCredentials", 10: "RemoteInteractive",
    11: "CachedInteractive", 12: "CachedRemoteInteractive",
    13: "CachedUnlock",
}

# event id -> (Category, Subtype, Outcome|None) — the full builtin
# table; None outcome falls back to derive-from-audit-result
SNARE_EVENT_MAP = {
    4624: ("Logon", "Success", "success"),
    4625: ("Logon", "Failure", "failure"),
    4626: ("Logon", "Success", "success"),
    4627: ("Logon", "Success", "success"),
    4672: ("Privilege", "Assignment", "success"),
    4688: ("Process", "Creation", "success"),
    4768: ("Kerberos", "TGTRequest", None),
    4769: ("Kerberos", "ServiceTicket", None),
    4771: ("Kerberos", "PreAuthFailure", None),
    5140: ("FileShare", "Access", None),
    5157: ("FilteringPlatform", "PacketDrop", "failure"),
    6281: ("WDAC", "Enforcement", None),
    1102: ("Audit", "LogCleared", None),
    1243: ("WindowsUpdate", "Deployment", None),
    4720: ("AccountManagement", "Creation", "success"),
    4722: ("AccountManagement", "Enabled", "success"),
    4723: ("AccountManagement", "PasswordChangeAttempt", "success"),
    4724: ("AccountManagement", "PasswordReset", "success"),
    4725: ("AccountManagement", "AccountDisabled", "success"),
    4726: ("AccountManagement", "AccountDeleted", "success"),
    4738: ("AccountManagement", "AccountChange", "success"),
    4781: ("AccountManagement", "AccountNameChange", "success"),
    4650: ("IPsec", "MainModeEstablished", "success"),
    4651: ("IPsec", "MainModeFailure", "failure"),
    4652: ("IPsec", "QuickModeEstablished", "success"),
    4653: ("IPsec", "QuickModeFailure", "failure"),
    4654: ("IPsec", "MainModeAuthFailure", "failure"),
    4655: ("IPsec", "MainModeAuthFailure", "failure"),
    4656: ("IPsec", "MainModeKeyFailure", "failure"),
    4657: ("IPsec", "MainModePeerAuthFailure", "failure"),
    4658: ("IPsec", "MainModeInvalidCookie", "failure"),
    4659: ("IPsec", "MainModeDuplicateSPI", "failure"),
    4660: ("IPsec", "MainModeInvalidProposal", "failure"),
    4661: ("IPsec", "MainModeTimeout", "failure"),
    4663: ("IPsec", "MainModeTimeout", "failure"),
    4664: ("IPsec", "MainModeTimeout", "failure"),
    4665: ("IPsec", "MainModeTimeout", "failure"),
    4666: ("IPsec", "MainModeTimeout", "failure"),
    4667: ("IPsec", "MainModeTimeout", "failure"),
    4668: ("IPsec", "MainModeTimeout", "failure"),
    4670: ("IPsec", "MainModeTimeout", "failure"),
    4671: ("IPsec", "MainModeTimeout", "failure"),
    4608: ("System", "Startup", "success"),
    4609: ("System", "Shutdown", "success"),
    4610: ("System", "Startup", "success"),
    4611: ("System", "Shutdown", "success"),
    4612: ("System", "AuditLogCleared", "success"),
    4614: ("System", "AuditLogCleared", "success"),
    4615: ("System", "IPCStatusChange", "success"),
    4616: ("System", "SystemTimeChange", "success"),
    4618: ("System", "SecurityStateChange", "success"),
    4621: ("System", "AdminLogon", "success"),
    4622: ("System", "Logon", "success"),
    4697: ("System", "ServiceInstalled", "success"),
    4821: ("System", "CertificateServices", "success"),
    4822: ("System", "CertificateServices", "success"),
    4823: ("System", "CertificateServices", "success"),
    4824: ("System", "CertificateServices", "success"),
    4830: ("System", "CertificateServices", "success"),
}

# (pattern, canonical, behavior); behaviors: standard (kv section),
# inline (single value), semicolon (k=v; k=v), list (bare-line accum)
SNARE_SECTIONS = (
    ("Subject", "Subject", "standard"),
    ("Logon Information", "LogonInformation", "standard"),
    ("New Logon", "NewLogon", "standard"),
    ("Account For Which Logon Failed", "TargetAccount", "standard"),
    ("Failure Information", "Failure", "standard"),
    ("Network Information", "Network", "standard"),
    ("Process Information", "Process", "standard"),
    ("Detailed Authentication Information", "DetailedAuthentication",
     "standard"),
    ("Application Information", "Application", "standard"),
    ("Filter Information", "Filter", "standard"),
    ("Account Information", "AccountInformation", "standard"),
    ("Service Information", "Service", "standard"),
    ("Additional Information", "AdditionalInformation", "standard"),
    ("Share Information", "Share", "standard"),
    ("Certificate Information", "Certificate", "standard"),
    ("Remote Credential Guard", "RemoteCredentialGuard", "inline"),
    ("LAPS Context", "LAPS", "semicolon"),
    ("TLS Inspection", "TLSInspection", "standard"),
    ("Privileges", "Privileges", "list"),
)

_SNARE_INT_FIELDS = {"SourcePort", "ClientPort", "DestinationPort",
                     "KeyLength"}


def snare_norm_label(label: str) -> str:
    """normalize_label (c:1057): camel-case across non-alnum
    boundaries, parenthesized text dropped —
    'Package Name (NTLM only)' -> 'PackageName'."""
    out = []
    upper_next = True
    depth = 0
    for ch in label:
        if ch == "(":
            depth += 1
            upper_next = True
            continue
        if ch == ")" and depth:
            depth -= 1
            upper_next = True
            continue
        if depth:
            continue
        if ch.isalnum():
            out.append(ch.upper() if upper_next else ch)
            upper_next = False
        else:
            upper_next = True
    return "".join(out)


def _snare_placeholder(v: str) -> bool:
    v = v.strip()
    return v == "" or v == "-" or v.upper() == "N/A"


def _snare_store(out: dict, label: str, value: str) -> None:
    """Typed field store: LogonType gets its LogonTypeName sibling,
    port/length fields parse int64, placeholders drop."""
    canon = snare_norm_label(label)
    if not canon or _snare_placeholder(value):
        return
    value = value.strip()
    if canon == "LogonType":
        try:
            iv = int(value)
        except ValueError:
            out[canon] = value
            return
        out[canon] = iv
        desc = SNARE_LOGON_TYPES.get(iv)
        if desc is not None:
            out["LogonTypeName"] = desc
        return
    if canon in _SNARE_INT_FIELDS:
        try:
            out[canon] = int(value)
        except ValueError:
            out[canon] = value
        return
    out[canon] = value


def _snare_kv_into(out: dict, text: str) -> None:
    """Condensed 'Key:  Value  Key2: Value2' sequence -> typed fields
    (tokenize_on_multispace + colon pairing, c:687-760,3919-3960)."""
    segs = [t.strip() for t in re.split(r"\t+| {2,}", text)
            if t.strip()]
    key = None
    for seg in segs:
        if seg.endswith(":"):
            key = seg[:-1].strip()
            continue
        if ":" in seg:
            k, _, v = seg.partition(":")
            v = v.strip()
            if v:
                _snare_store(out, k.strip(), v)
                key = None
            else:
                key = k.strip()
            continue
        if key is not None:
            _snare_store(out, key, seg)
            key = None


def snare_description_parse(desc: str) -> dict:
    """Windows Security event Description -> nested section dict
    (parse_description, c:4209-4470): CR dropped, runs of 3+ spaces
    become line breaks, each line either opens a section from
    SNARE_SECTIONS, extends the active section with key/values, or
    lands in Summary/Unparsed."""
    root: dict = {}
    active: tuple | None = None       # (canonical, behavior)
    summary_set = False
    text = re.sub(r" {3,}", "\n", desc.replace("\r", ""))
    for raw in text.split("\n"):
        line = raw.strip()
        if not line:
            continue
        label, colon, rest = line.partition(":")
        label = label.strip()
        rest = rest.strip()
        sec = next((s for s in SNARE_SECTIONS if colon
                    and s[0] == label), None)
        if sec is None and colon:
            # embedded section (c:4332-4352
            # find_embedded_section_descriptor): 'Creator Subject:'
            # opens Subject; the prefix becomes Summary/Unparsed
            for s in SNARE_SECTIONS:
                at = label.find(s[0])
                if at > 0 and label.endswith(s[0]):
                    prefix = label[:at].strip()
                    if prefix and not summary_set:
                        root["Summary"] = prefix
                        summary_set = True
                    elif prefix:
                        root.setdefault("Unparsed", []).append(prefix)
                    sec = s
                    break
        if sec is not None:
            canonical, behavior = sec[1], sec[2]
            if behavior == "standard":
                obj = root.setdefault(canonical, {})
                if rest:
                    _snare_kv_into(obj, rest)
                active = (canonical, behavior)
            elif behavior == "inline":
                root.setdefault(canonical, {})[canonical] = rest
                active = None
            elif behavior == "semicolon":
                obj = root.setdefault(canonical, {})
                for part in rest.split(";"):
                    k, _, v = part.partition("=")
                    if k.strip() and v.strip():
                        _snare_store(obj, k.strip(), v)
                active = None
            else:                      # list: accumulate bare lines
                obj = root.setdefault("Privileges", {})
                if rest:
                    obj["PrivilegeList"] = " ".join(rest.split())
                active = (canonical, behavior)
            continue
        if not colon:
            if active is not None and active[1] == "list":
                obj = root.setdefault("Privileges", {})
                prev = obj.get("PrivilegeList", "")
                item = " ".join(line.split())
                obj["PrivilegeList"] = (prev + " " + item).strip()
            elif not summary_set:
                root["Summary"] = line
                summary_set = True
            elif active is not None:
                _snare_kv_into(root.setdefault(active[0], {}), line)
            else:
                root.setdefault("Unparsed", []).append(line)
            continue
        if active is not None and active[1] == "standard":
            obj = root.setdefault(active[0], {})
            if rest:
                _snare_store(obj, label, rest)
            else:
                _snare_kv_into(obj, line)
        else:
            tgt = root.setdefault("EventData", {})
            _snare_kv_into(tgt, line)
    return root


def _snare_outcome(audit_result: str) -> str | None:
    """derive_outcome (c:3765): substring scan of the audit result."""
    a = (audit_result or "").lower()
    for probe, val in (("success", "success"), ("failure", "failure"),
                       ("fail", "failure"), ("error", "error"),
                       ("warning", "warning"),
                       ("information", "information")):
        if probe in a:
            return val
    return None


def snare_win_parse_row(line: str) -> dict | None:
    """Full Windows-Security decode of one Snare TSV event: header
    fields + per-EventID metadata (Category/Subtype/Outcome) + the
    sectioned Description as nested objects.  Returns None for
    non-MSWinEventLog lines."""
    if not isinstance(line, str):
        return None
    s = line.lstrip()
    m = re.match(r"<\d+>", s)
    if m:
        s = s[m.end():].lstrip()
    s = s.replace("\\t", "\t").replace("#011", "\t")
    at = s.find("MSWinEventLog")
    if at < 0:
        return None
    parts = s[at:].split("\t")
    hdr = dict(zip(_SNARE_FIELDS, (p.strip() for p in parts[1:12])))
    for k in _SNARE_FIELDS:
        hdr.setdefault(k, "")
    try:
        eid = int(hdr["event_id"])
    except ValueError:
        eid = None
    hdr["event_id"] = eid
    # the description may span further TSV tokens — concatenate the
    # non-placeholder tail with spaces (c:4862-4906)
    desc = " ".join(t for t in parts[12:] if not _snare_placeholder(t))
    win = snare_description_parse(desc) if desc else {}
    event = {"EventID": eid} if eid is not None else {}
    mapping = SNARE_EVENT_MAP.get(eid)
    outcome = None
    if mapping is not None:
        event["Category"], event["Subtype"] = mapping[0], mapping[1]
        outcome = mapping[2]
    if outcome is None:
        outcome = _snare_outcome(hdr.get("event_log_type", ""))
    if outcome is not None:
        event["Outcome"] = outcome
    win["Event"] = event
    hdr["win"] = win
    return hdr


def snare_win_parse(s: pd.Series) -> pd.DataFrame:
    """Batch decoder: header columns + ``win`` (nested sections as
    compact JSON) + flattened convenience columns for the most-used
    fields + ``parse_ok``."""
    import json as _json

    rows = [snare_win_parse_row(v) for v in s]
    cols = {f: [r[f] if r else None for r in rows]
            for f in _SNARE_FIELDS}
    cols["event_id"] = pd.array(cols["event_id"], dtype="Int64")
    cols["win"] = [
        _json.dumps(r["win"], separators=(",", ":"), sort_keys=True)
        if r else None for r in rows]

    def _dig(r, *path):
        cur = r["win"] if r else None
        for p in path:
            cur = cur.get(p) if isinstance(cur, dict) else None
        return cur

    cols["category"] = [_dig(r, "Event", "Category") for r in rows]
    cols["outcome"] = [_dig(r, "Event", "Outcome") for r in rows]
    cols["subject_account"] = [_dig(r, "Subject", "AccountName")
                               for r in rows]
    cols["logon_type"] = pd.array(
        [_dig(r, "LogonInformation", "LogonType") for r in rows],
        dtype="Int64")
    cols["parse_ok"] = [r is not None for r in rows]
    return pd.DataFrame(cols, index=s.index)


# ---------------------------------------------------------------------
# pmdb2diag — DB2 diagnostic log parser
# (contrib/pmdb2diag/pmdb2diag.c:84-210; defaults :226-229,274-281)
# ---------------------------------------------------------------------

_DB2_LEVELS = {  # first level char → (severity, level token length)
    "C": (0, 8),   # Critical → EMERG
    "A": (1, 5),   # Alert
    "S": (2, 6),   # Severe → CRIT
    "W": (4, 7),   # Warning
    "I": (6, 4),   # Info
    "D": (7, 5),   # Debug
}


def _fmt_width(fmt: str) -> int:
    """Rendered width of a fixed-width strptime format (the C uses
    strptime's consumed-pointer; Python lacks partial parses, so the
    supported formats are the fixed-width ones — which db2diag's are)."""
    w, i = 0, 0
    widths = {"Y": 4, "m": 2, "d": 2, "H": 2, "M": 2, "S": 2, "y": 2,
              "j": 3}
    while i < len(fmt):
        if fmt[i] == "%" and i + 1 < len(fmt):
            w += widths.get(fmt[i + 1], 2)
            i += 2
        else:
            w += 1
            i += 1
    return w


def db2diag_parse_row(msg: str, *, levelpos: int = 59, timepos: int = 0,
                      timeformat: str = "%Y-%m-%d-%H.%M.%S.",
                      pid_to_prog_shift: int = 49) -> dict | None:
    """One (multiline, newline-joined) db2diag record → severity,
    timestamp (fraction + minute-offset timezone), procid, appname —
    the literal C walk: level char switch (E disambiguates Error vs
    Event on the second char, c:120-123), PID after the first ':'
    past the level token, PROC at the fixed pid→prog shift, program
    ending at space or backslash."""
    from datetime import datetime

    if levelpos > len(msg) - 4 or timepos >= len(msg):
        return None
    lvl = msg[levelpos:]
    first = lvl[:1]
    if first == "E":                    # Error vs Event (c:120-123)
        sev, lvl_len = (3, 5) if lvl[1:2] == "r" else (5, 5)
    elif first in _DB2_LEVELS:
        sev, lvl_len = _DB2_LEVELS[first]
    else:
        return None
    if levelpos > len(msg) - lvl_len:
        return None

    out: dict = {"severity": sev, "ts": None, "procid": None,
                 "appname": None}
    width = _fmt_width(timeformat)
    sep_sec = timeformat[-1]
    try:
        base = datetime.strptime(msg[timepos:timepos + width],
                                 timeformat)
        rest = msg[timepos + width:]
        if msg[timepos + width - 1] == sep_sec:
            m = re.match(r"(\d+)([+-])(\d+)", rest)
            if m:
                frac, sign, tz = m.groups()
                us = int(frac.ljust(6, "0")[:6])
                off = int(tz)
                tzs = f"{sign}{off // 60:02d}:{off % 60:02d}"
                out["ts"] = pd.Timestamp(base).replace(
                    microsecond=us).tz_localize(tzs)
    except ValueError:
        pass

    colon = msg.find(":", levelpos + lvl_len)
    if colon < 0 or colon + 2 >= len(msg):
        return out
    pid_at = colon + 2
    space = msg.find(" ", pid_at)
    if space < 0:
        return out
    out["procid"] = msg[pid_at:space]
    prog_at = pid_at + pid_to_prog_shift
    if prog_at >= len(msg):
        return out
    eprog = msg.find(" ", prog_at)
    backslash = msg.find("\\", prog_at)
    ends = [e for e in (eprog, backslash) if e >= 0]
    out["appname"] = msg[prog_at:min(ends)] if ends else msg[prog_at:]
    return out


# ---------------------------------------------------------------------
# pmpanngfw — Palo Alto Networks NGFW CSV → TSV normalizer
# (contrib/pmpanngfw/pmpanngfw.c:80-230)
# ---------------------------------------------------------------------

_PAN_LOG_TYPES = ("TRAFFIC,", "THREAT,", "SYSTEM,", "CONFIG,")


def panngfw_row(msg: str) -> str | None:
    """PAN-OS syslog CSV → TAB-separated, or None when not PAN-OS:
    the first three comma fields must exist, the fourth must be a
    known log type (the C's int64-mask compare of c:61-66 == a
    startswith on these literals), and the remainder converts through
    the quoted-CSV state machine (``""`` → ``"``)."""
    commas = []
    for i, ch in enumerate(msg):
        if ch == ",":
            commas.append(i)
            if len(commas) == 3:
                break
    if len(commas) != 3:
        return None
    rest_at = commas[2] + 1
    rest = msg[rest_at:]
    if len(rest) < 8 or not rest.startswith(_PAN_LOG_TYPES):
        return None
    head = msg[:rest_at].replace(",", "\t")
    out = []
    state = "field_start"
    for ch in rest:
        if state == "field_start":
            if ch == '"':
                state = "in_quote"
            elif ch == ",":
                out.append("\t")
            else:
                out.append(ch)
                state = "in_field"
        elif state == "in_field":
            if ch == ",":
                out.append("\t")
                state = "field_start"
            else:
                out.append(ch)
        elif state == "in_quote":
            if ch == '"':
                state = "quote_quote"
            else:
                out.append(ch)
        else:                            # quote_quote
            if ch == '"':                # escaped quote
                out.append('"')
                state = "in_quote"
            elif ch == ",":
                out.append("\t")
                state = "field_start"
            else:                        # quote closed mid-field
                out.append(ch)
                state = "in_field"
    return head + "".join(out)


def panngfw_normalize(s: pd.Series) -> pd.Series:
    """Vectorized wrapper: PAN-OS rows rewritten to TSV, everything
    else passed through untouched (the parser-chain abort contract)."""
    return pd.Series([panngfw_row(v) if isinstance(v, str) else v
                      for v in s], index=s.index).where(
        lambda x: x.notna(), s)
