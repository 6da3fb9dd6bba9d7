"""Fixed logical schemas (the rsyslog 'property system' analog).

The reference models every record as a struct msg with a fixed core of
~26 properties plus dynamic JSON trees (reference runtime/msg.h:60-148,
runtime/typedefs.h:193-249).  Our analog is an explicit pyarrow schema
per logical table: a fixed input schema (the Common-Crawl-style pages
table from BASELINE.json.input_hint) and a fixed parsed schema produced
by the rule compiler (parse failures annotate ``parse_ok`` instead of
dropping rows, like bParseSuccess / PROP_PARSESUCCESS, msg.h:68).
"""

from __future__ import annotations

import pyarrow as pa

# Input table — exactly the input_hint shape.
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# Parsed-field columns added by the parse stage (pmrfc5424/mmnormalize
# analog): header fields extracted from the `text` log line plus the
# extracted-text payload from `html`.
PARSED_FIELDS = [
    ("p_ts", pa.timestamp("us")),
    ("p_host", pa.string()),
    ("p_app", pa.string()),
    ("p_sev", pa.int8()),
    ("p_msg", pa.string()),
    ("p_status", pa.int32()),
    ("p_bytes", pa.int64()),
    ("rule", pa.string()),       # which rule matched (first-match-wins)
    ("parse_ok", pa.bool_()),    # bParseSuccess analog
    ("extracted", pa.string()),  # sanitized text extracted from html
]

# Enrichment columns (lookup_table analog).
ENRICH_FIELDS = [
    ("region", pa.string()),     # lang -> region (string lookup table)
    ("category", pa.string()),   # url-host -> category (string lookup table)
    ("url_host", pa.string()),   # faup-style host extraction
]

LANGS = ["en", "de", "fr", "es", "pt", "zh", "ja", "ru", "ar", "hi", "ko", "nl"]
# skewed: en ~= 45%
LANG_WEIGHTS = [45, 9, 8, 8, 6, 6, 4, 4, 3, 3, 2, 2]

APPS = ["nginx", "postfix", "sshd", "cron", "appsrv", "db", "cache", "auth"]
SEVERITIES = list(range(8))  # 0=emerg .. 7=debug, info/debug-heavy
SEV_WEIGHTS = [1, 1, 2, 4, 8, 14, 40, 30]
STATUSES = [200, 200, 200, 200, 301, 302, 404, 403, 500, 503]

N_HOSTS = 1000
ZIPF_S = 1.2  # host skew exponent; top host ~20% of rows

LANG_REGION = {
    # deliberately incomplete: missing keys exercise the stub value
    # (reference runtime/lookup.c:396-398 STUBBED fallback)
    "en": "amer",
    "de": "emea",
    "fr": "emea",
    "es": "amer",
    "pt": "amer",
    "zh": "apac",
    "ja": "apac",
    "ko": "apac",
    "nl": "emea",
    # ru / ar / hi intentionally absent -> stub
}
REGION_STUB = ""

CATEGORIES = ["news", "shop", "blog", "docs", "social", "spam"]
CATEGORY_STUB = "uncat"


def host_name(i: int) -> str:
    """Deterministic host name for host id i (shared by gen and lookups)."""
    return f"h{i:04d}.example-{i % 13}.com"
