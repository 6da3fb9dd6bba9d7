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
