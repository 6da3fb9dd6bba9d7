"""Scalar function library — RainerScript built-ins over Arrow/pandas.

Vectorized analogs of the reference's script function table
(grammar/rainerscript.c:4467-4510 and function modules): string ops,
regex, casts, net helpers, hashing, json, time formatting.  Every
function takes/returns pandas Series (or pyarrow arrays) — these are
the kernels pipelines compose inside ``map_batches``; none of them may
loop per row in the hot path.
"""

from __future__ import annotations

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


# ---- casts (cstr / cnum / cbool)
def cnum(s: pd.Series) -> pd.Series:
    return pd.to_numeric(s, errors="coerce").astype("Int64")


def cstr(s: pd.Series) -> pd.Series:
    return s.astype("string")


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


# ---- time formatting (template date formats, runtime/template.h:72-95
#      — 22 variants in the reference; the common ones as strftime)
TIME_FORMATS = {
    "rfc3339": "%Y-%m-%dT%H:%M:%S.%fZ",
    "mysql": "%Y-%m-%d %H:%M:%S",
    "pgsql": "%Y-%m-%d %H:%M:%S",
    "date": "%Y-%m-%d",
    "hour": "%H",
    "isoweek": "%V",
    "wdayname": "%a",
}


def format_time(ts: pd.Series, fmt: str) -> pd.Series:
    """format_time analog (rainerscript.c:2744) for named formats plus
    'unixtimestamp' (epoch seconds as string)."""
    if fmt == "unixtimestamp":
        return (ts.astype("int64") // 1_000_000).astype(str)
    return ts.dt.strftime(TIME_FORMATS.get(fmt, fmt))


# ---- CSV / JSON escaping (property-replacer options: RFC4180 CSV and
#      JSON escaping, runtime/template.h:150-169; doEscape template.c:947)
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
    return (s.str.replace("\\", "\\\\", regex=False)
             .str.replace('"', '\\"', regex=False)
             .str.replace("\n", "\\n", regex=False)
             .str.replace("\t", "\\t", regex=False))


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
