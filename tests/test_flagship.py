"""End-to-end flagship vs per-row oracle: the three correctness gates.

1. byte-identical extracted text per url (sha256 equality)
2. per-sink routed-row equality (order-insensitive, sort by url)
3. per-sink aggregate-count equality
"""

import glob
import hashlib
import os

import pandas as pd
import pyarrow.parquet as pq
import pytest

from rsyslog_ray.oracle import oracle_flagship
from rsyslog_ray.pipelines.flagship import run_flagship
from rsyslog_ray.router import DEFAULT_ROUTES, Router


@pytest.fixture(scope="module")
def flagship(ray_session, pages_small, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("flagship_out"))
    agg = run_flagship(pages_small, out)
    oracle = oracle_flagship(pages_small)
    return out, agg, oracle


def _read_sink(out_dir, sink):
    files = glob.glob(os.path.join(out_dir, sink, "shard=*", "*.parquet"))
    if not files:
        return pd.DataFrame()
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)


def test_aggregate_counts_equal(flagship):
    _, agg, (_, oracle_agg, _) = flagship
    a = agg.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
    b = oracle_agg.sort_values(["sink", "kind", "key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        a[["sink", "kind", "key", "cnt"]].astype({"cnt": "int64"}),
        b[["sink", "kind", "key", "cnt"]].astype({"cnt": "int64"}))


def test_routed_rows_equal(flagship):
    out, _, (routed, _, _) = flagship
    router = Router(DEFAULT_ROUTES)
    for sink in router.sinks:
        eng = _read_sink(out, sink)
        want = routed[sink]
        assert len(eng) == len(want), f"{sink}: {len(eng)} vs {len(want)}"
        if not want:
            continue
        eng = eng.sort_values("url").reset_index(drop=True)
        wdf = pd.DataFrame(want).sort_values("url").reset_index(drop=True)
        assert eng["url"].tolist() == wdf["url"].tolist(), sink
        # spot-check enrich + parse columns ride along correctly
        for col in ("region", "category", "p_host", "rule"):
            pd.testing.assert_series_equal(
                eng[col].fillna("∅"), wdf[col].fillna("∅"),
                check_names=False, check_dtype=False)


def test_extracted_text_byte_identical(flagship):
    out, _, (_, _, extracts) = flagship
    eng = _read_sink(out, "archive")  # archive gets every non-stopped row
    seen = 0
    for url, txt in zip(eng["url"], eng["extracted"]):
        h = hashlib.sha256(txt.encode("utf-8")).hexdigest()
        assert extracts[url] == h, url
        seen += 1
    assert seen > 5000


def test_lineage_complete(flagship):
    out, _, _ = flagship
    import json
    recs = [json.loads(l) for l in open(os.path.join(out, "_lineage.jsonl"))]
    assert {r["partition_id"] for r in recs} == set(range(5))  # sf0.001 → 5 shards of 2k
    assert all(r["rows_in"] == 2000 for r in recs)
