"""Single-process oracle — the "obviously correct" reference implementation.

Analog of the reference's testbench golden outputs (tests/testsuites/*,
tests/diag.sh seq_check): a tiny per-row Python implementation of the
whole flagship pipeline sharing only the *specs* (rulebase, sanitize
rules, lookup contents, route program) with the engine — NOT the
vectorized code paths.  Tests assert the distributed engine reproduces
it exactly: byte-identical extracted text per url, per-sink routed-row
equality, per-sink aggregate-count equality (the three correctness
gates in BASELINE.md).
"""

from __future__ import annotations

import glob
import hashlib
import os
from collections import Counter

import pandas as pd
import pyarrow.parquet as pq

from .router import DEFAULT_ROUTES, Router
from .rulebase import PAGES_RULEBASE
from .stages.enrich import default_lookups, extract_host_row
from .stages.parse import extract_text_row


def oracle_flagship(pages_dir: str, routes=None):
    """Run the flagship per row. Returns (routed, aggs, extracts):

    - routed: dict sink -> list of row dicts (url + parsed + enriched)
    - aggs:   DataFrame (sink, kind, key, cnt)
    - extracts: dict url -> sha256 hexdigest of extracted text bytes
    """
    router = Router(routes if routes is not None else DEFAULT_ROUTES)
    lookups = default_lookups()
    routed: dict[str, list[dict]] = {s: [] for s in router.sinks}
    agg: Counter = Counter()
    extracts: dict[str, str] = {}

    files = sorted(glob.glob(os.path.join(pages_dir, "pages-*.parquet")))
    for f in files:
        t = pq.read_table(f)
        for row in t.to_pylist():
            rule, fields = PAGES_RULEBASE.parse_row(row["text"])
            rec = {
                "url": row["url"],
                "warc_ts": row["warc_ts"],
                "text": row["text"],
                "lang": row["lang"],
                "shard": row["shard"],
                **fields,
                "rule": rule,
                "parse_ok": rule is not None,
            }
            rec["extracted"] = extract_text_row(row["html"])
            rec["url_host"] = extract_host_row(row["url"])
            rec["region"] = lookups["lang_region"].lookup(row["lang"])
            rec["category"] = lookups["host_category"].lookup(rec["url_host"])
            extracts[row["url"]] = hashlib.sha256(
                rec["extracted"].encode("utf-8")).hexdigest()

            for sink in router.route_row(rec):
                routed[sink].append(rec)
                agg[(sink, "lang", rec["lang"])] += 1
                agg[(sink, "host", rec["url_host"])] += 1
                bucket = rec["warc_ts"].strftime("%Y-%m-%dT%H:00:00")
                agg[(sink, "bucket", bucket)] += 1

    aggdf = pd.DataFrame(
        [(s, k, key, c) for (s, k, key), c in sorted(agg.items())],
        columns=["sink", "kind", "key", "cnt"],
    )
    return routed, aggdf, extracts


# ---------------------------------------------------------------------
# parse_time scalar oracle — a direct structural mirror of the C
# parsers (runtime/datetime.c ParseTIMESTAMP3339:282 /3164:440 with
# NO_PARSE3164_TZSTRING + NO_PERMIT_YEAR_AFTER_TIME, and
# syslogTime2time_t:1017; rainerscript.c estimateYear:2811).  Used by
# tests/test_property.py to fuzz the vectorized regex implementation.
# ONE deliberate strictness deviation from the C (shared by engine and
# oracle): srSLMGParseInt32 accepts an EMPTY digit run as 0, so the C
# parses freak inputs like "2024-1-1T::Z" as midnight; we require at
# least one digit per numeric field.

_MON_ORACLE = {"jan": 1, "feb": 2, "mar": 3, "apr": 4, "may": 5,
               "jun": 6, "jul": 7, "aug": 8, "sep": 9, "oct": 10,
               "nov": 11, "dec": 12}
_MCUM_ORACLE = [0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334]


def _oint(s: str, i: int):
    """srSLMGParseInt32: consume digits, return (value, next_i)."""
    j = i
    v = 0
    while j < len(s) and "0" <= s[j] <= "9":   # C isdigit = ASCII only
        v = v * 10 + int(s[j])
        j += 1
    return v, j


def _epoch_oracle(year, month, day, hour, minute, second, offsec):
    if year < 1970 or year > 2100:
        return 0
    import datetime
    days = (datetime.date(year, 1, 1) - datetime.date(1970, 1, 1)).days
    leap = 1 if (((year % 100 != 0 and year % 4 == 0) or year == 2000)
                 and month > 2) else 0
    days += _MCUM_ORACLE[month - 1] + leap + day - 1
    return days * 86400 + hour * 3600 + minute * 60 + second - offsec


def _parse3339_oracle(s: str):
    i = 0
    year, i = _oint(s, i)
    if i >= len(s) or s[i] != "-" or year >= 2100 or i == 0:
        return None
    i += 1
    month, j = _oint(s, i)
    if j == i or not (1 <= month <= 12):
        return None
    i = j
    if i >= len(s) or s[i] != "-":
        return None
    i += 1
    day, j = _oint(s, i)
    if j == i or not (1 <= day <= 31):
        return None
    i = j
    if i >= len(s) or s[i] != "T":
        return None
    i += 1
    hour, j = _oint(s, i)
    if j == i or hour > 23:
        return None
    i = j
    if i >= len(s) or s[i] != ":":
        return None
    i += 1
    minute, j = _oint(s, i)
    if j == i or minute > 59:
        return None
    i = j
    if i >= len(s) or s[i] != ":":
        return None
    i += 1
    second, j = _oint(s, i)
    if j == i or second > 60:
        return None
    i = j
    if i < len(s) and s[i] == ".":
        i += 1
        _, i = _oint(s, i)
    if i >= len(s):
        return None
    offsec = 0
    if s[i] == "Z":
        i += 1
    elif s[i] in "+-":
        sign = 1 if s[i] == "+" else -1
        i += 1
        oh, j = _oint(s, i)
        if j == i or oh > 23:
            return None
        i = j
        if i >= len(s) or s[i] != ":":
            return None
        i += 1
        om, j = _oint(s, i)
        if j == i or om > 59:
            return None
        i = j
        offsec = sign * (oh * 3600 + om * 60)
    else:
        return None
    if i < len(s):
        if s[i] != " ":
            return None
    return year, month, day, hour, minute, second, offsec


def _parse3164_oracle(s: str):
    """Returns (month, day, hour, minute, second) or None; the year is
    always re-estimated by the caller (doFunct_ParseTime overrides even
    detected years)."""
    i = 0
    year = 0
    if len(s) < 3:
        return None
    if s and "0" <= s[0] <= "9":
        year, i = _oint(s, i)
        if year < 1970 or year > 2100 or i >= len(s) or s[i] != " ":
            return None
        i += 1
    mon = s[i:i + 3].lower()
    if mon not in _MON_ORACLE:
        return None
    month = _MON_ORACLE[mon]
    i += 3
    if i >= len(s) or s[i] != " ":
        return None
    i += 1
    if i < len(s) and s[i] == " ":
        i += 1
    day, j = _oint(s, i)
    if j == i or not (1 <= day <= 31):
        return None
    i = j
    if i >= len(s) or s[i] != " ":
        return None
    i += 1
    hour, j = _oint(s, i)
    if j == i:
        return None
    i = j
    if year == 0 and 1970 < hour < 2100:
        year = hour
        if i >= len(s) or s[i] != " ":
            return None
        i += 1
        hour, j = _oint(s, i)
        if j == i:
            return None
        i = j
    if hour > 23:
        return None
    if i >= len(s) or s[i] != ":":
        return None
    i += 1
    minute, j = _oint(s, i)
    if j == i or minute > 59:
        return None
    i = j
    if i >= len(s) or s[i] != ":":
        return None
    i += 1
    second, j = _oint(s, i)
    if j == i or second > 60:
        return None
    i = j
    if i < len(s) and s[i] == ".":
        i += 1
        _, i = _oint(s, i)
    if i < len(s) and s[i] == ":":
        i += 1
    if i < len(s):
        if s[i] != " ":
            return None
    return month, day, hour, minute, second


def parse_time_oracle(s: str, now) -> int:
    """doFunct_ParseTime per row: RFC3339 first, else RFC3164 with
    estimateYear (always overriding), else 0."""
    r = _parse3339_oracle(s)
    if r is not None:
        return _epoch_oracle(*r)
    r4 = _parse3164_oracle(s)
    if r4 is None:
        return 0
    month, day, hour, minute, second = r4
    cy, cm = int(now.year), int(now.month)
    im = month + 12
    if (im - cm) == 1 and cm == 12 and im == 13:
        year = cy + 1
    elif (im - cm) > 13:
        year = cy - 1
    else:
        year = cy
    return _epoch_oracle(year, month, day, hour, minute, second, 0)
