"""Scalar function library — RainerScript built-ins over Arrow/pandas.

Vectorized analogs of the reference's script function table
(grammar/rainerscript.c:4467-4510 and function modules): string ops,
regex, casts, net helpers, hashing, json, time formatting.  Every
function takes/returns pandas Series (or pyarrow arrays) — these are
the kernels pipelines compose inside ``map_batches``; none of them may
loop per row in the hot path.
"""

from __future__ import annotations

import copy
import re

import numpy as np
import pandas as pd


# ---- string (rainerscript doFunct_*: strlen tolower toupper ltrim rtrim
#      substring replace split field wrap int2hex — rainerscript.c:2484-3245)
def strlen(s: pd.Series) -> pd.Series:
    return s.str.len().astype("Int64")


def tolower(s: pd.Series) -> pd.Series:
    return s.str.lower()


def toupper(s: pd.Series) -> pd.Series:
    return s.str.upper()


def ltrim(s: pd.Series) -> pd.Series:
    return s.str.lstrip()


def rtrim(s: pd.Series) -> pd.Series:
    return s.str.rstrip()


def substring(s: pd.Series, start: int, length: int) -> pd.Series:
    """1-field analog of substring(str, start, subStringLength)
    (rainerscript.c:2572) — 0-based start, like the reference."""
    return s.str.slice(start, start + length)


def replace(s: pd.Series, find: str, repl: str) -> pd.Series:
    return s.str.replace(find, repl, regex=False)


# ---- property-replacer options (runtime/template.h:125-146; applied
#      in runtime/msg.c:4350-4650 MsgGetProp) ---------------------------

NOMATCH_DFLT = "**NO MATCH**"  # TPL_REGEX_NOMATCH_USE_DFLTSTR


def re_select(s: pd.Series, pattern: str, match_no: int = 0,
              submatch: int = 0, nomatch: str = "dflt") -> pd.Series:
    """Regex-select (template.h:127-139): pick match #``match_no``'s
    group #``submatch`` (0 = whole match); ``nomatch`` policy one of
    'dflt' ('**NO MATCH**'), 'blank', 'field' (whole input), 'zero'
    ('0') — TPL_REGEX_NOMATCH_*.  Vectorized via str.extractall."""
    st = s.astype("string").fillna("")
    ex = st.str.extractall("(" + pattern + ")")
    # wrapping adds group 1 = whole match, so column index == submatch
    hit = ex[ex.index.get_level_values("match") == match_no]
    sel = hit.droplevel("match").iloc[:, submatch].reindex(st.index)
    if nomatch == "field":
        return sel.fillna(st).astype(object)
    fill = {"dflt": NOMATCH_DFLT, "blank": "", "zero": "0"}[nomatch]
    return sel.fillna(fill).astype(object)


def substring_end(s: pd.Series, from_end: int, length: int) -> pd.Series:
    """End-relative substring (template.h:141 bFromPosEndRelative):
    ``length`` chars starting ``from_end`` chars before the end."""
    stop = None if length >= from_end else -(from_end - length)
    return s.str.slice(-from_end, stop)


def fixed_width(s: pd.Series, width: int) -> pd.Series:
    """Space-pad to ``width`` when shorter (template.h:142 bFixedWidth)."""
    return s.str.pad(width, side="right")


def compress_sp(s: pd.Series) -> pd.Series:
    """Compress runs of spaces to one (bCompressSP, msg.c:4635)."""
    return s.str.replace(r" +", " ", regex=True)


CC_RE = r"[\x00-\x1f\x7f]"


def drop_cc(s: pd.Series) -> pd.Series:
    """Remove control characters (bDropCC, msg.c:4401)."""
    return s.str.replace(CC_RE, "", regex=True)


def space_cc(s: pd.Series) -> pd.Series:
    """Control characters -> space (bSpaceCC, msg.c:4430)."""
    return s.str.replace(CC_RE, " ", regex=True)


def escape_cc(s: pd.Series, octal: bool = False) -> pd.Series:
    """Control characters -> '#' + 3-digit decimal (or octal) char
    code (bEscapeCC / bEscapeCCOctal, msg.c:4461-4502)."""
    fmt = (lambda c: f"#{ord(c.group(0)):03o}") if octal else \
          (lambda c: f"#{ord(c.group(0)):03d}")
    return s.str.replace(CC_RE, fmt, regex=True)


def sp_if_no_1st_sp(s: pd.Series) -> pd.Series:
    """Emit a single space unless the field already starts with one
    (bSPIffNo1stSP, msg.c:4353 — the RFC3164 'no space after tag'
    compatibility hack)."""
    return pd.Series(np.where(s.str.startswith(" "), " ", ""),
                     index=s.index)


def field(s: pd.Series, delim: str, n: int) -> pd.Series:
    """Nth field (1-based) by delimiter — doFunct_field
    (rainerscript.c:2625); missing field -> empty string (the
    reference yields "***FIELD NOT FOUND***"; we use the empty-string
    stub consistently with lookup misses)."""
    return s.str.split(delim).str[n - 1].fillna("")


# ---- regex (re_match / re_extract, rainerscript.c:1681; POSIX ERE in
#      the reference, Python re here — rulebases define their own spec)
def re_match(s: pd.Series, pattern: str) -> pd.Series:
    return s.str.contains(pattern, regex=True, na=False)


def re_extract(s: pd.Series, pattern: str, group: int = 1) -> pd.Series:
    return s.str.extract(f"({pattern})" if group == 0 else pattern,
                         expand=True).iloc[:, group - 1 if group > 0 else 0]


def pcre_match(s: pd.Series, pattern: str) -> pd.Series:
    """fmpcre pcre_match(str, pattern) -> 0/1
    (plugins/fmpcre/fmpcre.c:31-93).  The reference's re_match is
    POSIX ERE while pcre_match is Perl-compatible; Python's re IS
    Perl-compatible, so this is the exact semantic (and re_match
    above is the approximation)."""
    return s.str.contains(pattern, regex=True, na=False)


def re_match_i(s: pd.Series, pattern: str) -> pd.Series:
    """re_match_i (rainerscript.c:4483, initFunc_re_match_i -> REG_ICASE):
    case-insensitive re_match."""
    return s.str.contains(pattern, regex=True, na=False, flags=re.IGNORECASE)


def re_extract_i(s: pd.Series, pattern: str, group: int = 1) -> pd.Series:
    """re_extract_i (rainerscript.c:4485): case-insensitive re_extract
    (same REG_ICASE-compiled regex as re_match_i)."""
    return s.str.extract(f"({pattern})" if group == 0 else pattern,
                         expand=True,
                         flags=re.IGNORECASE).iloc[:,
                                                   group - 1 if group > 0
                                                   else 0]


def wrap(s: pd.Series, wrapper: str, escaper: str | None = None) -> pd.Series:
    """doFunct_Wrap (rainerscript.c:4493): wrapper prepended+appended;
    the 3-arg form first replaces wrapper occurrences in the source
    with the escaper."""
    if escaper is not None:
        s = s.str.replace(wrapper, escaper, regex=False)
    return wrapper + s + wrapper


def int2hex(n: pd.Series) -> pd.Series:
    """doFunct_Int2Hex (rainerscript.c:4471): lowercase hex string."""
    return pd.to_numeric(n, errors="coerce").fillna(0).astype("int64").map(
        lambda v: format(v, "x"))


def split(s: pd.Series, delim: str) -> pd.Series:
    """doFunct_split (rainerscript.c:4504): delimiter split to an
    array value (a list column here)."""
    return s.str.split(delim, regex=False)


def b64_encode(s: pd.Series) -> pd.Series:
    import base64

    return s.map(lambda v: base64.b64encode(str(v).encode()).decode())


def b64_decode(s: pd.Series) -> pd.Series:
    """doFunct_Base64Dec (rainerscript.c:4503); invalid input -> ''."""
    import base64

    def dec(v):
        try:
            return base64.b64decode(str(v), validate=True).decode("utf-8",
                                                                  "replace")
        except Exception:
            return ""

    return s.map(dec)


# ---- casts (cstr / cnum / cbool)
def cnum(s: pd.Series) -> pd.Series:
    return pd.to_numeric(s, errors="coerce").astype("Int64")


def cstr(s: pd.Series) -> pd.Series:
    return s.astype("string")


def cbool(s: pd.Series) -> pd.Series:
    """rsyslogBoolTextToNumber (rainerscript.c:2273-2303): numbers are
    truthy unless 0; strings are trimmed and case-insensitively matched
    — '', '0', 'no', 'off', 'false' -> 0, anything else -> 1.  NULL
    behaves as empty (0), matching the str==NULL branch."""
    if pd.api.types.is_numeric_dtype(s):
        return (pd.to_numeric(s, errors="coerce").fillna(0) != 0).astype(
            "int64")
    t = s.fillna("").astype(str).str.strip().str.lower()
    return (~t.isin(["", "0", "no", "off", "false"])).astype("int64")


# ---- net (num2ipv4 / ipv42num — int arithmetic kernels)
def num2ipv4(n: pd.Series) -> pd.Series:
    v = pd.to_numeric(n, errors="coerce").fillna(0).astype(np.int64).to_numpy()
    a, b = (v >> 24) & 255, (v >> 16) & 255
    c, d = (v >> 8) & 255, v & 255
    out = (pd.Series(a).astype(str) + "." + pd.Series(b).astype(str) + "."
           + pd.Series(c).astype(str) + "." + pd.Series(d).astype(str))
    out.index = n.index
    return out


def ipv42num(s: pd.Series) -> pd.Series:
    parts = s.str.split(".", expand=True).astype("Int64")
    return (parts[0] * 16777216 + parts[1] * 65536 + parts[2] * 256 + parts[3])


def is_in_subnet(s: pd.Series, cidr: str) -> pd.Series:
    """Real CIDR membership test (doFunct_is_in_subnet,
    rainerscript.c:4505 / grammar impl with inet_pton): IPv4 path is
    fully vectorized (octet extract + mask compare); IPv6 nets fall
    back to per-row ipaddress (rare path, correctness first).  Invalid
    addresses -> False, like the reference's early-out."""
    import ipaddress

    net = ipaddress.ip_network(cidr, strict=False)
    if net.version == 4:
        parts = s.astype("string").str.extract(
            r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
        nums = parts.apply(pd.to_numeric, errors="coerce")
        valid = nums.notna().all(axis=1) & (nums <= 255).all(axis=1)
        v = (nums[0].fillna(0) * 16777216 + nums[1].fillna(0) * 65536
             + nums[2].fillna(0) * 256 + nums[3].fillna(0)).astype("int64")
        ok = ((v & int(net.netmask)) == int(net.network_address)) & valid
        return ok.fillna(False).astype(bool)

    def chk(v):
        try:
            return ipaddress.ip_address(str(v)) in net
        except ValueError:
            return False

    return s.map(chk)


# ---- URL decomposition (ffaup faup_* field functions,
#      contrib/ffaup/ffaup.c:306-315: scheme credential subdomain
#      domain domain_without_tld host tld port resource_path
#      query_string fragment) — one vectorized regex pass + label math
URL_RE = (r"^(?:(?P<scheme>[A-Za-z][A-Za-z0-9+.-]*)://)?"
          r"(?:(?P<credential>[^@/?#]+)@)?"
          r"(?P<host>[^/:?#]*)"
          r"(?::(?P<port>\d+))?"
          r"(?P<resource_path>/[^?#]*)?"
          r"(?:\?(?P<query_string>[^#]*))?"
          r"(?:#(?P<fragment>.*))?$")


def faup_decompose(url: pd.Series) -> pd.DataFrame:
    """Full URL decomposition: every ffaup field as a column (empty
    string where absent).  domain = last two host labels, tld = last
    label, subdomain = the rest — the label heuristic ffaup uses for
    non-publicsuffix hosts."""
    parts = url.astype("string").str.extract(URL_RE)
    host = parts["host"].fillna("")
    labels = host.str.split(".")
    n = labels.str.len().fillna(0)
    tld = labels.str[-1].where(n >= 2, "").fillna("")
    dom2 = labels.str[-2].where(n >= 2, "").fillna("")
    domain = (dom2 + "." + tld).where(n >= 2, host)
    sub = labels.str[:-2].str.join(".").where(n > 2, "")
    out = pd.DataFrame({
        "scheme": parts["scheme"].fillna(""),
        "credential": parts["credential"].fillna(""),
        "subdomain": sub.fillna(""),
        "domain": domain.fillna(""),
        "domain_without_tld": dom2,
        "host": host,
        "tld": tld,
        "port": parts["port"].fillna(""),
        "resource_path": parts["resource_path"].fillna(""),
        "query_string": parts["query_string"].fillna(""),
        "fragment": parts["fragment"].fillna(""),
    }, index=url.index)
    return out.astype(object)


TRACKING_PARAMS = ("gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
                   "igshid", "ref_src")


def canonical_url(url: pd.Series, strip_www: bool = True) -> pd.Series:
    """URL canonicalization for URL-keyed dedup — the web-pipeline
    normalization pass (WET/WARC dedup keys are canonicalized URLs):
    lowercase scheme+host, drop the fragment, drop default ports
    (http:80 / https:443), optionally strip a leading ``www.``, drop
    tracking query params (``utm_*`` + TRACKING_PARAMS), sort the
    surviving params, and normalize an empty path to ``/``.
    Vectorized: one regex decompose; only rows that HAVE a query
    string pay the per-row param sort."""
    parts = url.astype("string").str.extract(URL_RE)
    scheme = parts["scheme"].fillna("").str.lower()
    host = parts["host"].fillna("").str.lower()
    if strip_www:
        host = host.str.replace(r"^www\.", "", regex=True)
    port = parts["port"].fillna("")
    default = ((scheme.eq("http") & port.eq("80"))
               | (scheme.eq("https") & port.eq("443")) | port.eq(""))
    port = (":" + port).where(~default, "")
    path = parts["resource_path"].fillna("")
    path = path.where(path != "", "/")
    cred = parts["credential"].fillna("")
    cred = (cred + "@").where(cred != "", "")

    qs = parts["query_string"].fillna("").str.lstrip("?")
    pieces = qs[qs != ""].str.split("&").explode()
    name = pieces.str.split("=").str[0].str.lower()
    keep = pieces[(pieces != "") & ~name.str.startswith("utm_")
                  & ~name.isin(TRACKING_PARAMS)]
    if len(keep):
        joined = keep.groupby(level=0).agg(lambda s: "&".join(sorted(s)))
    else:
        joined = pd.Series(dtype=object)
    query = pd.Series("", index=url.index, dtype=object)
    query.loc[joined.index] = "?" + joined
    query = query.where(query != "?", "")

    return (scheme + "://" + cred + host + port + path
            + query).astype(object)


def canonical_url_row(u: str, strip_www: bool = True) -> str:
    """Scalar spec for canonical_url (tests compare element-wise)."""
    import re as _re
    m = _re.match(r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?(?:([^@/?#]*)@)?"
                  r"([^:/?#]*)(:\d+)?([^?#]*)(\?[^#]*)?(#.*)?$", u)
    scheme, cred, host, port, path, qs, _frag = m.groups()
    scheme = (scheme or "").lower()
    host = (host or "").lower()
    if strip_www and host.startswith("www."):
        host = host[4:]
    port = (port or "")[1:]
    if (scheme, port) in (("http", "80"), ("https", "443")) or port == "":
        port = ""
    else:
        port = ":" + port
    path = path or "/"
    params = []
    for p in (qs or "?")[1:].split("&"):
        if not p:
            continue
        n = p.split("=")[0].lower()
        if n.startswith("utm_") or n in TRACKING_PARAMS:
            continue
        params.append(p)
    q = "?" + "&".join(sorted(params)) if params else ""
    return f"{scheme}://{(cred + '@') if cred else ''}{host}{port}{path}{q}"


def surt_frame(url: pd.Series) -> pd.Series:
    """SURT keys (Sort-friendly URI Reordering Transform — the sort
    key of web-archive CDX indexes; cf. the cc-index / OpenWayback
    canonicalization): ``http://www.sub.example.com:8080/p?b=2&a=1``
    -> ``com,example,sub:8080)/p?a=1&b=2``.  Semantics: scheme,
    credentials and fragment dropped; host lowercased, one leading
    ``www.`` stripped, dot-labels REVERSED and comma-joined;
    default-for-scheme ports (http:80 / https:443) dropped, others
    kept as ``:port``; empty path -> ``/``; query params sorted.
    Path/query case is preserved (deviation from strictest SURT,
    which lowercases the whole URL).  Vectorized: one regex
    decompose; only the label reversal and param sort are per-row."""
    parts = url.astype("string").str.extract(URL_RE)
    scheme = parts["scheme"].fillna("").str.lower()
    host = (parts["host"].fillna("").str.lower()
            .str.replace(r"^www\.", "", regex=True))
    rev = host.str.split(".").map(
        lambda ls: ",".join(reversed(ls)) if isinstance(ls, list) else "")
    port = parts["port"].fillna("")
    default = ((scheme.eq("http") & port.eq("80"))
               | (scheme.eq("https") & port.eq("443")) | port.eq(""))
    port = (":" + port).where(~default, "")
    path = parts["resource_path"].fillna("")
    path = path.where(path != "", "/")
    qs = parts["query_string"].fillna("")
    qsorted = qs.map(
        lambda q: "?" + "&".join(sorted(q.split("&"))) if q else "")
    return (rev + port + ")" + path + qsorted).astype(object)


def surt_row(u: str) -> str:
    """Scalar spec for surt_frame (tests compare element-wise).
    Unparseable URLs (e.g. a colon with no port digits) degrade to the
    empty-host key ``)/" + nothing`` — the same fallback surt_frame's
    failed regex extract produces, so engine and spec stay equal on
    garbage input."""
    import re as _re
    m = _re.match(r"^(?:([A-Za-z][A-Za-z0-9+.-]*)://)?(?:([^@/?#]+)@)?"
                  r"([^/:?#]*)(?::(\d+))?(/[^?#]*)?(?:\?([^#]*))?(?:#.*)?$",
                  u)
    if m is None:
        return ")/"
    scheme, _cred, host, port, path, qs = m.groups()
    scheme = (scheme or "").lower()
    host = (host or "").lower()
    if host.startswith("www."):
        host = host[4:]
    rev = ",".join(reversed(host.split("."))) if host else ""
    port = port or ""
    if (scheme, port) in (("http", "80"), ("https", "443")):
        port = ""
    port = (":" + port) if port else ""
    q = "?" + "&".join(sorted(qs.split("&"))) if qs else ""
    return f"{rev}{port}){path or '/'}{q}"


# ---- anonymization (mmanon zero-mode analog,
#      plugins/mmanon/mmanon.c:59-166: mask low bits of IPv4s in text)
IPV4_RE = r"\b(\d{1,3}\.\d{1,3}\.\d{1,3})\.\d{1,3}\b"


def anon_ipv4_zero(s: pd.Series) -> pd.Series:
    """Zero the last octet of every IPv4 in the string (zero mode,
    8 mask bits)."""
    return s.str.replace(IPV4_RE, r"\1.0", regex=True)


# full (uncompressed) 8-hextet IPv6: keep the first 4 hextets, zero the
# interface-identifier half (64 mask bits — mmanon's ipv6.bits default)
IPV6_RE = r"\b((?:[0-9A-Fa-f]{1,4}:){4})(?:[0-9A-Fa-f]{1,4}:){3}[0-9A-Fa-f]{1,4}\b"


def anon_ipv6_zero(s: pd.Series) -> pd.Series:
    """mmanon IPv6 zero mode (plugins/mmanon/mmanon.c:100-166): zero
    the low 64 bits of every full-form IPv6 in the string."""
    return s.str.replace(IPV6_RE, r"\g<1>0:0:0:0", regex=True)


# ---- time formatting: ALL 22 template date formats
#      (runtime/template.h:72-95 tplFmt*; rendering semantics from
#      runtime/msg.c:1639-1736 getTimeReported and
#      runtime/datetime.c:777-1000 formatTimestamp*).  Timestamps here
#      are tz-naive and treated as UTC, so the TZ-offset formats render
#      the UTC constants.
TIME_FORMATS = {
    # strftime-expressible ones (glibc %e = space-padded day, matching
    # formatTimestamp3164's RFC3164 day rendering)
    "default": "%b %e %H:%M:%S",
    "rfc3164": "%b %e %H:%M:%S",
    "rfc3164-buggyday": "%b %d %H:%M:%S",   # buggy = zero-padded day
    "mysql": "%Y%m%d%H%M%S",                # 14-digit, datetime.c:777
    "pgsql": "%Y-%m-%d %H:%M:%S",
    "rfc3339": "%Y-%m-%dT%H:%M:%S.%fZ",
    "secfrac": "%f",
    "wdayname": "%a",
    "year": "%Y",
    "month": "%m",
    "day": "%d",
    "hour": "%H",
    "minute": "%M",
    "second": "%S",
    "ordinal": "%j",                        # daysInYear[] is 3-digit
    "isoweek": "%V",
    "isoweekyear": "%G",
    "date": "%Y-%m-%d",                     # repo extra (not in ref)
}


def _wday_sun0(ts: pd.Series) -> pd.Series:
    """Weekday with 0 = Sunday (datetime.c:1175 getWeekdayNbr)."""
    return (ts.dt.dayofweek + 1) % 7


_MONTH_ABBR = np.array(["Jan", "Feb", "Mar", "Apr", "May", "Jun", "Jul",
                        "Aug", "Sep", "Oct", "Nov", "Dec"], dtype=object)
_WDAY_ABBR = np.array(["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"],
                      dtype=object)  # indexed by pandas dayofweek (Mon=0)


def _zf(v: pd.Series, width: int) -> pd.Series:
    return v.astype("int64").astype(str).str.zfill(width)


def format_time(ts: pd.Series, fmt: str) -> pd.Series:
    """All reference template date formats by name (plus any literal
    strftime pattern).  'unixtimestamp' = epoch seconds; 'week' is the
    reference's own pin-jan1 week number (datetime.c:1229 getWeek),
    distinct from both %U and %V.  Named formats compose from datetime
    components (vector int→str ops) rather than per-row strftime —
    ~10x on wide tables; byte parity with strftime is oracle-checked."""
    d = ts.dt
    if fmt == "unixtimestamp":
        return (ts.astype("int64") // 1_000_000).astype(str)
    if fmt == "wday":
        return _wday_sun0(ts).astype(str)
    if fmt == "tzoffshour" or fmt == "tzoffsmin":
        return pd.Series("00", index=ts.index)
    if fmt == "tzoffsdirection":
        return pd.Series("+", index=ts.index)
    if fmt == "week":
        yday0 = d.dayofyear - 1
        cur_dow = _wday_sun0(ts)
        jan1 = pd.to_datetime(dict(year=d.year, month=1, day=1))
        jan1.index = ts.index
        jan1_dow = (jan1.dt.dayofweek + 1) % 7
        week = (yday0 + 6) // 7 + (cur_dow < jan1_dow).astype(int)
        return week.astype(str).str.zfill(2)
    if fmt in ("rfc3339", "mysql", "pgsql", "date"):
        ymd = (_zf(d.year, 4), _zf(d.month, 2), _zf(d.day, 2))
        if fmt == "date":
            return ymd[0] + "-" + ymd[1] + "-" + ymd[2]
        hms = (_zf(d.hour, 2), _zf(d.minute, 2), _zf(d.second, 2))
        if fmt == "mysql":
            return ymd[0] + ymd[1] + ymd[2] + hms[0] + hms[1] + hms[2]
        base = (ymd[0] + "-" + ymd[1] + "-" + ymd[2]
                + ("T" if fmt == "rfc3339" else " ")
                + hms[0] + ":" + hms[1] + ":" + hms[2])
        if fmt == "rfc3339":
            return base + "." + _zf(d.microsecond, 6) + "Z"
        return base
    if fmt in ("default", "rfc3164", "rfc3164-buggyday"):
        mon = pd.Series(_MONTH_ABBR[d.month - 1], index=ts.index)
        day = (_zf(d.day, 2) if fmt == "rfc3164-buggyday"
               else d.day.astype(str).str.rjust(2))
        return (mon + " " + day + " " + _zf(d.hour, 2) + ":"
                + _zf(d.minute, 2) + ":" + _zf(d.second, 2))
    if fmt == "secfrac":
        return _zf(d.microsecond, 6)
    if fmt == "wdayname":
        return pd.Series(_WDAY_ABBR[d.dayofweek], index=ts.index)
    if fmt in ("year", "month", "day", "hour", "minute", "second",
               "ordinal"):
        comp = {"year": (d.year, 4), "month": (d.month, 2),
                "day": (d.day, 2), "hour": (d.hour, 2),
                "minute": (d.minute, 2), "second": (d.second, 2),
                "ordinal": (d.dayofyear, 3)}[fmt]
        return _zf(*comp)
    if fmt in ("isoweek", "isoweekyear"):
        iso = d.isocalendar()
        if fmt == "isoweek":
            return _zf(iso["week"], 2)
        return iso["year"].astype("int64").astype(str)
    return d.strftime(TIME_FORMATS.get(fmt, fmt))


# ---- CSV / JSON escaping (property-replacer options: RFC4180 CSV and
#      JSON escaping, runtime/template.h:150-169; doEscape template.c:947)
# ---------------------------------------------------------------------
# parse_time / parse_time_localtz / is_time — the timestamp-PARSE half
# of the date library (grammar/rainerscript.c doFunct_ParseTime
# :2823-2864, doFunct_ParseTimeLocalTz :2866-2911, doFunc_is_time
# :2914-2981, estimateYear :2811; runtime/datetime.c ParseTIMESTAMP3339
# :282, ParseTIMESTAMP3164 :440 with NO_PARSE3164_TZSTRING +
# NO_PERMIT_YEAR_AFTER_TIME, syslogTime2time_t :1017).

# lenient per the reference: variable digit counts, second<=60 (leap),
# day not checked against month length, optional ".frac", mandatory TZ,
# then end-of-string or one space + anything
_RE_TS3339 = re.compile(
    r"^(\d{1,4})-(\d{1,2})-(\d{1,2})T(\d{1,2}):(\d{1,2}):(\d{1,2})"
    r"(?:\.\d*)?(?:(Z)|([+-])(\d{1,2}):(\d{1,2}))(?: [\s\S]*)?$",
    re.ASCII)  # \d must NOT match unicode digits (C isdigit is ASCII)
# optional prepended year (Brocade), 3-letter month any case, optional
# second space before a 1-digit day, optional year in the hour slot
# (Cisco IOS), optional ".frac", optional stray ":", then end or SP+rest
_RE_TS3164 = re.compile(
    r"^(?:(\d{1,9}) )?([A-Za-z]{3})  ?(\d{1,2}) (?:(\d{1,9}) )?"
    r"(\d{1,2}):(\d{1,2}):(\d{1,2})(?:\.\d*)?:?(?: [\s\S]*)?$",
    re.ASCII)
_MON3164 = {"jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5, "jun": 6,
            "jul": 7, "aug": 8, "sep": 9, "oct": 10, "nov": 11, "dec": 12}
_MCUM = np.array([0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334],
                 dtype="int64")


def _syslogtime_epoch(year, month, day, hour, minute, second, offsec):
    """syslogTime2time_t (datetime.c:1017) as pure arithmetic: day may
    overflow the month (Feb 31 is accepted and rolls over), second may
    be 60 (leap second adds a minute), year outside 1970..2100 -> 0.
    ``offsec`` is the SIGNED tz offset ('+'-mode positive); the result
    is UTC epoch seconds."""
    year = np.asarray(year, dtype="int64")
    month = np.asarray(month, dtype="int64")
    yc = np.clip(year, 1970, 2100)
    ystart = (pd.to_datetime(pd.DataFrame({
        "year": yc, "month": 1, "day": 1}), utc=True)
        - pd.Timestamp("1970-01-01", tz="UTC")).dt.days.to_numpy()
    leap = ((((yc % 100 != 0) & (yc % 4 == 0)) | (yc == 2000))
            & (month > 2)).astype("int64")
    days = ystart + _MCUM[month - 1] + leap + np.asarray(day) - 1
    ep = (days * 86400 + np.asarray(hour) * 3600 + np.asarray(minute) * 60
          + np.asarray(second) - np.asarray(offsec))
    return np.where((year < 1970) | (year > 2100), 0, ep).astype("int64")


def _num(col: pd.Series) -> np.ndarray:
    return pd.to_numeric(col, errors="coerce").fillna(-1).to_numpy("int64")


def _match3339(t: pd.Series):
    """(valid_mask, epoch_array) for the RFC3339 interpretation."""
    g = t.str.extract(_RE_TS3339)
    ok = g[0].notna().to_numpy()
    if not ok.any():
        return ok, np.zeros(len(t), dtype="int64")
    yy, mo, dd = _num(g[0]), _num(g[1]), _num(g[2])
    hh, mi, ss = _num(g[3]), _num(g[4]), _num(g[5])
    oh, om = _num(g[8].fillna("0")), _num(g[9].fillna("0"))
    sign = np.where(g[7].to_numpy() == "+", 1,
                    np.where(g[7].to_numpy() == "-", -1, 0))
    ok &= ((yy < 2100) & (mo >= 1) & (mo <= 12) & (dd >= 1) & (dd <= 31)
           & (hh <= 23) & (mi <= 59) & (ss <= 60) & (oh <= 23) & (om <= 59))
    ep = _syslogtime_epoch(yy, np.clip(mo, 1, 12), dd, hh, mi, ss,
                           sign * (oh * 3600 + om * 60))
    return ok, np.where(ok, ep, 0)


def _match3164(t: pd.Series):
    """(valid_mask, month, day, hour, minute, second) for RFC3164 (no
    TZ-string, no year-after-time — the parse_time flag set)."""
    g = t.str.extract(_RE_TS3164)
    mon = g[1].str.lower().map(_MON3164)
    ok = (g[1].notna() & mon.notna()).to_numpy()
    pre_y = _num(g[0].fillna("-1"))
    cisco_y = _num(g[3].fillna("-1"))
    dd, hh, mi, ss = _num(g[2]), _num(g[4]), _num(g[5]), _num(g[6])
    # prepended year must be 1970..2100 when present (else ABORT);
    # hour-slot year only valid when no prepended year and 1971..2099
    ok &= ((pre_y == -1) | ((pre_y >= 1970) & (pre_y <= 2100)))
    ok &= ((cisco_y == -1)
           | ((pre_y == -1) & (cisco_y > 1970) & (cisco_y < 2100)))
    ok &= (dd >= 1) & (dd <= 31) & (hh <= 23) & (mi <= 59) & (ss <= 60)
    return ok, mon.fillna(1).to_numpy("int64"), dd, hh, mi, ss


def _estimate_year(now_utc: pd.Timestamp, month: np.ndarray) -> np.ndarray:
    """estimateYear (rainerscript.c:2811): January read in December is
    next year; a month more than one ahead of now is last year."""
    cy, cm = int(now_utc.year), int(now_utc.month)
    y = np.full(len(month), cy, dtype="int64")
    y[(cm == 12) & (month == 1)] = cy + 1
    y[month > cm + 1] = cy - 1
    return y


def parse_time(s: pd.Series, now: pd.Timestamp | None = None) -> pd.Series:
    """parse_time(str) -> UTC unix epoch seconds (int64): RFC3339
    first, else RFC3164 with estimateYear inference (the reference
    overrides even an explicit in-string year — mirrored), else 0.
    ``now`` pins the inference clock for determinism; default = current
    UTC time."""
    return _parse_time_impl(s, now, 0)


def parse_time_localtz(s: pd.Series, now: pd.Timestamp | None = None,
                       gmtoff: int | None = None) -> pd.Series:
    """parse_time_localtz (rainerscript.c:2866, syslogTime2time_tLocalTZ
    datetime.c:1110): RFC3339 carries its own offset (identical to
    parse_time); an RFC3164 stamp is interpreted in the LOCAL timezone
    (current local gmtoff subtracted)."""
    if gmtoff is None:
        import time as _time
        gmtoff = _time.localtime().tm_gmtoff
    return _parse_time_impl(s, now, int(gmtoff))


def _parse_time_impl(s: pd.Series, now, gmtoff4: int) -> pd.Series:
    """Shared parse_time body: RFC3339 over every row, RFC3164 only
    over the rows 3339 rejected (the common case is a homogeneous
    column, so the second regex usually sees few rows)."""
    if now is None:
        now = pd.Timestamp.now(tz="UTC")
    t = s.fillna("").astype(str).reset_index(drop=True)
    ok9, ep9 = _match3339(t)
    out = np.where(ok9, ep9, 0)
    allok = ok9.copy()
    miss = np.flatnonzero(~ok9)
    if len(miss):
        rest = t.iloc[miss].reset_index(drop=True)
        ok4, mon, dd, hh, mi, ss = _match3164(rest)
        ep4 = _syslogtime_epoch(_estimate_year(now, mon), mon, dd, hh,
                                mi, ss, gmtoff4)
        out[miss] = np.where(ok4, ep4, 0)
        allok[miss] = ok4
    _set_script_errno(~allok, s.index)
    return pd.Series(out, index=s.index, dtype="int64")


def is_time(s: pd.Series, fmt: str | None = None) -> pd.Series:
    """is_time(str[, fmt]) -> 1/0 (rainerscript.c doFunc_is_time):
    default tries date-rfc3164, date-rfc3339, date-unix in that order;
    an explicit fmt restricts to that format; unknown fmt -> 0."""
    t = s.fillna("").astype(str).reset_index(drop=True)
    checks = {"date-rfc3164": lambda: _match3164(t)[0],
              "date-rfc3339": lambda: _match3339(t)[0],
              "date-unix": lambda: t.str.fullmatch(r"-?\d+").to_numpy()}
    if fmt is not None:
        ok = checks[fmt]() if fmt in checks else np.zeros(len(t), bool)
    else:
        # reference order: 3164, 3339, unix — each only over the rows
        # the previous format rejected
        ok = _match3164(t)[0]
        miss = np.flatnonzero(~ok)
        if len(miss):
            rest = t.iloc[miss].reset_index(drop=True)
            ok9 = _match3339(rest)[0]
            ok[miss] = ok9
            miss2 = miss[~ok9]
            if len(miss2):
                ok[miss2] = (t.iloc[miss2].str.fullmatch(r"-?\d+")
                             .to_numpy())
    _set_script_errno(~ok, s.index)
    return pd.Series(ok.astype("int64"), index=s.index)


# ---------------------------------------------------------------------
# CEF output — tocef / cef_ext_escape (grammar/rainerscript.c
# doFunct_tocef :3368, cef_escape_header :3324,
# cef_escape_eventclassid :3341, doFunct_cef_ext_escape :3414)

def cef_hdr_escape(s: pd.Series) -> pd.Series:
    """CEF header-field escaping: backslash and pipe get a leading
    backslash (cef_escape_header)."""
    return (s.astype(str).str.replace("\\", "\\\\", regex=False)
            .str.replace("|", "\\|", regex=False))


def cef_eventclassid_escape(s: pd.Series) -> pd.Series:
    """deviceEventClassId needs extra escapes beyond the header set:
    ``\\ | = % #`` (cef_escape_eventclassid)."""
    out = s.astype(str).str.replace("\\", "\\\\", regex=False)
    for ch in "|=%#":
        out = out.str.replace(ch, "\\" + ch, regex=False)
    return out


def cef_ext_escape(s: pd.Series) -> pd.Series:
    """CEF extension-value escaping: ``\\ -> \\\\``, ``= -> \\=``,
    LF -> ``\\n``, CR -> ``\\r`` (doFunct_cef_ext_escape)."""
    return (s.astype(str).str.replace("\\", "\\\\", regex=False)
            .str.replace("=", "\\=", regex=False)
            .str.replace("\n", "\\n", regex=False)
            .str.replace("\r", "\\r", regex=False))


def tocef(version, vendor, product, devversion, eventclassid, name,
          severity, extensions) -> pd.Series:
    """tocef(8 args) -> ``CEF:v|vendor|product|devversion|classid|name|
    severity|extensions`` with spec escaping on the seven header fields
    (extensions appended VERBATIM — callers escape values with
    cef_ext_escape), mirroring doFunct_tocef including the "0" default
    for a missing version."""
    args = [version, vendor, product, devversion, eventclassid, name,
            severity, extensions]
    idx = next((a.index for a in args if isinstance(a, pd.Series)), None)
    if idx is None:
        idx = pd.RangeIndex(1)

    def ser(x, default=""):
        if isinstance(x, pd.Series):
            return x.fillna(default).astype(str)
        return pd.Series([default if x is None else str(x)] * len(idx),
                         index=idx)

    return ("CEF:" + cef_hdr_escape(ser(version, "0"))
            + "|" + cef_hdr_escape(ser(vendor))
            + "|" + cef_hdr_escape(ser(product))
            + "|" + cef_hdr_escape(ser(devversion))
            + "|" + cef_eventclassid_escape(ser(eventclassid))
            + "|" + cef_hdr_escape(ser(name))
            + "|" + cef_hdr_escape(ser(severity))
            + "|" + ser(extensions))


# ---------------------------------------------------------------------
# control / environment functions (rainerscript.c doFunct_Getenv :2161,
# doFunct_RandomGen :2059, doFunct_ScriptError :3018,
# doFunct_PreviousActionSuspended :3027; RS_SCRIPT_* rainerscript.h
# :374-375)

SCRIPT_EOK = 0
SCRIPT_EINVAL = 1
_last_errno: pd.Series | None = None
_prev_action_suspended: bool = False


def _set_script_errno(bad_mask, index) -> None:
    """Record per-row errno after an errno-setting call (wtiSetScriptErrno
    analog; one batch executes serially per worker, matching the
    reference's per-worker-thread errno slot)."""
    global _last_errno
    _last_errno = pd.Series(
        np.where(np.asarray(bad_mask, bool), SCRIPT_EINVAL, SCRIPT_EOK),
        index=index, dtype="int64")


def script_error():
    """script_error() — per-row errno of the most recent errno-setting
    function call in this worker (0 = ok, 1 = EINVAL); 0 before any
    call."""
    return SCRIPT_EOK if _last_errno is None else _last_errno


def set_prev_action_suspended(flag: bool) -> None:
    """Hook for sink/connector stages: record that the previous action
    suspended itself (transport down / retries exhausted)."""
    global _prev_action_suspended
    _prev_action_suspended = bool(flag)


def previous_action_suspended() -> int:
    """previous_action_suspended() -> 1/0 (wtiGetPrevWasSuspended);
    connector stages set the flag via set_prev_action_suspended."""
    return int(_prev_action_suspended)


def get_property(s: pd.Series, name) -> pd.Series:
    """get_property(obj, name) (rainerscript.c doFunc_get_property):
    per-row member access on a JSON column — dict key, or array index
    when ``name`` is an integer.  Missing / invalid / null -> "";
    scalars render as their JSON string (var2CString semantics),
    containers re-serialize compactly."""
    import json as _json

    def one(v):
        try:
            d = _json.loads(v) if isinstance(v, str) else v
        except ValueError:
            return ""
        r = None
        if isinstance(d, dict):
            r = d.get(str(name))
        elif isinstance(d, list):
            try:
                i = int(name)
                r = d[i] if 0 <= i < len(d) else None
            except (TypeError, ValueError):
                r = None
        if r is None:
            return ""
        if isinstance(r, str):
            return r
        if isinstance(r, bool):
            return "true" if r else "false"
        if isinstance(r, (dict, list)):
            return _json.dumps(r, separators=(",", ":"))
        return str(r)

    return s.map(one)


def getenv_fn(name: str) -> str:
    """getenv(str) -> value or "" (doFunct_Getenv)."""
    import os
    return os.environ.get(name, "")


def random_gen(maxval, size: int | None = None, rng=None):
    """random(max) -> uniform int in [0, max) per row
    (doFunct_RandomGen): invalid or zero max -> 0, negative max ->
    |max|.  ``rng`` (numpy Generator) pins determinism for tests."""
    if rng is None:
        rng = np.random.default_rng()
    if isinstance(maxval, pd.Series):
        m = (pd.to_numeric(maxval, errors="coerce").fillna(0)
             .astype("int64").abs().to_numpy())
        x = rng.integers(0, np.iinfo(np.int64).max, len(m), dtype=np.int64)
        out = np.where(m == 0, 0, x % np.where(m == 0, 1, m))
        return pd.Series(out, index=maxval.index, dtype="int64")
    try:
        m = abs(int(maxval))
    except (TypeError, ValueError):
        m = 0
    n = size or 1
    x = rng.integers(0, np.iinfo(np.int64).max, n, dtype=np.int64)
    out = np.zeros(n, dtype=np.int64) if m == 0 else x % m
    return out if size else int(out[0])


def csv_escape(s: pd.Series) -> pd.Series:
    """RFC4180: quote when the field contains comma/quote/newline,
    doubling inner quotes."""
    needs = s.str.contains(r'[",\n]', regex=True, na=False)
    quoted = '"' + s.str.replace('"', '""', regex=False) + '"'
    return quoted.where(needs, s)


def sql_escape(s: pd.Series, mode: str = "std") -> pd.Series:
    """SQL-escaping template option (template.c:947-951 doSQLEscape):
    'std' doubles single quotes (stdSQL); 'mysql' also backslash-escapes
    backslash and quote (the reference's MySQL mode)."""
    if mode == "mysql":
        return (s.str.replace("\\", "\\\\", regex=False)
                 .str.replace("'", "\\'", regex=False))
    return s.str.replace("'", "''", regex=False)


def json_string_escape(s: pd.Series) -> pd.Series:
    s = (s.str.replace("\\", "\\\\", regex=False)
          .str.replace('"', '\\"', regex=False)
          .str.replace("\n", "\\n", regex=False)
          .str.replace("\t", "\\t", regex=False)
          .str.replace("\r", "\\r", regex=False))
    # remaining control chars must be \u-escaped or the JSON is invalid
    # (found by the template fuzz test)
    return s.str.replace(r"[\x00-\x1f]",
                         lambda m: "\\u%04x" % ord(m.group(0)), regex=True)


def append_json(js: pd.Series, value, key: str | None = None) -> pd.Series:
    """doFunct_append_json (rainerscript.c:3614-3708, 2-3 params) over a
    JSON-string column: array input -> append ``value`` (string or
    number, per-row Series or scalar); object input with ``key`` ->
    set key=value; anything else (non-JSON, scalars, 2-arg object
    call) -> JSON null, matching the reference's NULL result."""
    import json

    vals = value if isinstance(value, pd.Series) else pd.Series(
        [value] * len(js), index=js.index)

    def app(j, v):
        try:
            obj = json.loads(j)
        except (TypeError, ValueError):
            return "null"
        if isinstance(obj, list):
            obj.append(v)
        elif isinstance(obj, dict) and key is not None:
            obj[key] = v
        else:
            return "null"
        return json.dumps(obj, separators=(",", ":"))

    return pd.Series([app(j, v) for j, v in zip(js, vals)], index=js.index)


# ---- fmunflatten (contrib/fmunflatten/fmunflatten.c): unflatten a
#      JSON object whose keys embed a delimiter into a nested tree.
_UNFLAT_KBUF = 255  # segment truncation bound (FMUNFLATTEN_KBUFLEN-1)


def _unflatten_add(dst: dict, key: str, value, delim: str) -> None:
    """unflatten_add (fmunflatten.c:56-132): walk `key` split on
    `delim`; intermediate segments become (or override non-objects
    into) nested dicts; the final segment deep-copies scalar/array
    values but RECURSES into object values so their keys split too.
    Segments truncate at 255 chars (the reference's kbuf bound)."""
    segs = key.split(delim)
    for seg in segs[:-1]:
        seg = seg[:_UNFLAT_KBUF]
        o = dst.get(seg)
        if not isinstance(o, dict):   # missing OR non-object: override
            o = {}
            dst[seg] = o
        dst = o
    seg = segs[-1][:_UNFLAT_KBUF]
    if isinstance(value, dict):
        o = dst.get(seg)
        if not isinstance(o, dict):
            o = {}
            dst[seg] = o
        for k, v in value.items():    # recurse: nested keys split too
            _unflatten_add(o, k, v, delim)
    else:
        dst[seg] = copy.deepcopy(value)  # arrays are NOT recursed into


def unflatten_row(js, delim) -> str:
    """Scalar spec for unflatten() (fmunflatten.c doFunc_unflatten
    :149-196).  ``delim`` is a single-char string or an integer
    charcode; anything else is invalid (reference logs and returns
    number 0 with script_errno EINVAL — rendered here as "0").
    Non-object JSON values pass through (deep copy); non-JSON input
    (datatype != 'J') also yields "0"."""
    import json
    if isinstance(delim, str) and len(delim) == 1:
        d = delim
    elif isinstance(delim, (int, np.integer)) and int(delim) & 0xFF:
        d = chr(int(delim) & 0xFF)  # C `char delim = n` truncation
    else:
        return None  # invalid delim: caller renders "0" + EINVAL
    try:
        obj = json.loads(js)
    except (TypeError, ValueError):
        return None
    if not isinstance(obj, dict):
        return json.dumps(obj, separators=(",", ":"))
    out: dict = {}
    for k, v in obj.items():
        _unflatten_add(out, k, v, d)
    return json.dumps(out, separators=(",", ":"))


def unflatten(js: pd.Series, delim) -> pd.Series:
    """unflatten(src, delim) over a JSON-string column (fmunflatten.c).
    Per-row failures (bad JSON / non-'J' input) and an invalid
    delimiter return "0" with script_errno EINVAL, mirroring the
    reference's dummy number-0 return + wtiSetScriptErrno contract."""
    vals = [unflatten_row(j, delim) for j in js]
    bad = [v is None for v in vals]
    _set_script_errno(bad, js.index)
    return pd.Series(["0" if v is None else v for v in vals],
                     index=js.index)


# ---- structured-data parse (mmpstrucdata analog,
#      plugins/mmpstrucdata/mmpstrucdata.c: RFC5424 SD -> fields)
def sd_param(sd: pd.Series, param: str) -> pd.Series:
    """Extract one SD-PARAM value from an RFC5424 STRUCTURED-DATA
    string: [id k="v" ...] -> v for k == param."""
    return sd.str.extract(rf'\b{re.escape(param)}="([^"]*)"', expand=False)


# ---- hashing (fmhash hash64/hash32, contrib/fmhash/fmhash.c:350-356 —
#      xxhash in the reference; any stable 64-bit hash satisfies the
#      contract.  hash64 is also the salting function for skewed
#      groupbys, so it must be C-speed on KiB-scale strings)
FNV64_OFFSET = np.uint64(0xCBF29CE484222325)
FNV64_PRIME = np.uint64(0x100000001B3)


def hash64(s: pd.Series) -> pd.Series:
    """Stable 64-bit string hash, vectorized (pandas siphash with its
    fixed default key — deterministic across processes and the repo
    standard for content keys).  The previous per-byte-column FNV loop
    was thousands of Python list comprehensions per batch on KiB
    strings; the FNV-1a spec survives as the scalar oracle below."""
    vals = pd.util.hash_array(s.fillna("").astype(str).to_numpy(object))
    return pd.Series(vals.view(np.int64), index=s.index)


def hash64_fnv(v: str) -> int:
    """FNV-1a 64 over utf-8 bytes — the scalar reference spec (oracle
    and compat shim; never call this per row in a hot path)."""
    h = 0xCBF29CE484222325
    for b in str(v).encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def hash64mod(s: pd.Series, mod: int) -> pd.Series:
    return pd.Series(hash64(s).to_numpy().astype(np.uint64) % np.uint64(mod),
                     index=s.index).astype("int64")


def hash32(s: pd.Series) -> pd.Series:
    """fmhash hash32 (contrib/fmhash/fmhash.c:350-356 exposes a 32-bit
    variant alongside hash64): xor-fold of the repo-standard 64-bit
    hash — stable, vectorized, uniformly distributed."""
    h = hash64(s).to_numpy().astype(np.uint64)
    return pd.Series(((h >> np.uint64(32)) ^ (h & np.uint64(0xFFFFFFFF)))
                     .astype(np.int64), index=s.index)


def hash32mod(s: pd.Series, mod: int) -> pd.Series:
    return pd.Series(hash32(s).to_numpy().astype(np.uint64) % np.uint64(mod),
                     index=s.index).astype("int64")
