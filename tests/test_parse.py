"""Parse stage: vectorized chain == per-row oracle; sanitize spec."""

import numpy as np
import pandas as pd

from rsyslog_ray import gen
from rsyslog_ray.rulebase import PAGES_RULEBASE
from rsyslog_ray.sanitize import sanitize_bytes, sanitize_series
from rsyslog_ray.stages.parse import ParseStage, extract_text_frame, extract_text_row


def test_sanitize_spec():
    raw = b"abc\xff\xfedef\x00\x07ghi\tok\njk\n"
    o = sanitize_bytes(raw)
    v = sanitize_series(pd.Series([raw])).iloc[0]
    assert o == v
    assert "\x00" not in o and "\x07" not in o
    assert o.endswith("jk")  # exactly one trailing \n stripped
    assert "\t" in o and "\n" in o  # tab + inner newline preserved


def test_parse_matches_oracle_rowwise():
    t = gen.gen_batch(np.arange(0, 3000))
    out = ParseStage()(t).to_pandas()
    texts = t["text"].to_pylist()
    for i in range(len(texts)):
        rule, fields = PAGES_RULEBASE.parse_row(texts[i])
        assert (rule is not None) == bool(out["parse_ok"].iloc[i])
        if rule:
            assert rule == out["rule"].iloc[i]
            assert fields["p_host"] == out["p_host"].iloc[i]
            if fields["p_status"] is None:
                assert pd.isna(out["p_status"].iloc[i])
            else:
                assert fields["p_status"] == out["p_status"].iloc[i]
            if fields["p_ts"] is not None:
                assert pd.Timestamp(fields["p_ts"]) == out["p_ts"].iloc[i]


def test_extract_byte_identical():
    df = gen.gen_batch(np.arange(0, 3000)).to_pandas()
    eng = extract_text_frame(df["html"]).tolist()
    for i in range(len(df)):
        assert extract_text_row(df["html"].iloc[i]) == eng[i]


def test_html_dropped():
    t = gen.gen_batch(np.arange(0, 100))
    out = ParseStage()(t)
    assert "html" not in out.schema.names


def test_null_rows_survive_hot_path():
    """Real-corpus rows can have null url/html/text/lang — the pipeline
    annotates and routes them instead of crashing."""
    import pyarrow as pa

    from rsyslog_ray.stages.enrich import EnrichFn

    t = pa.table({
        "url": pa.array(["https://a.com/x", None, "nota url"]),
        "warc_ts": pa.array([pd.Timestamp("2026-01-01")] * 3,
                            pa.timestamp("us")),
        "html": pa.array([b"<p>hi</p>", None, b""], pa.binary()),
        "text": pa.array(['ts=x host=h app=a sev=3 msg="m"', None, ""]),
        "lang": pa.array(["en", None, "xx"]),
        "shard": pa.array([0, 0, 0], pa.int32()),
    })
    out = EnrichFn(None)(ParseStage()(t)).to_pandas()
    assert out["extracted"].iloc[1] is None       # null html -> null
    assert out["extracted"].iloc[2] == ""         # empty html -> empty
    assert out["url_host"].iloc[1] == ""          # null url -> stub
    assert out["region"].iloc[1] == ""            # null lang -> stub
    assert not out["parse_ok"].iloc[1]            # null text -> unparsed


def test_null_keys_counted_in_partials():
    """Arrow 'count' counts values not rows: the null-key dynstats group
    must still contribute its rows (folded into the "" bucket)."""
    import pyarrow as pa

    from rsyslog_ray.sinks import _partials_for

    t = pa.table({
        "lang": pa.array(["en", None, None, ""]),
        "url_host": pa.array(["h", "h", None, "h"]),
    })
    p = _partials_for("s", t, (("lang", "lang"),)).to_pandas()
    assert int(p["cnt"].sum()) == 4                 # every row counted
    assert int(p[p["key"] == ""]["cnt"].sum()) == 3  # None+None+"" fold
