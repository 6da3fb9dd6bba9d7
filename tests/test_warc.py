"""WARC source: record framing, gzip member layout, HTTP split,
WET conversion records, torn-tail tolerance (sources/warc.py)."""

import numpy as np
import pandas as pd

from rsyslog_ray.sources.warc import (build_warc, parse_warc_bytes,
                                      read_warc)


def _fixture_records():
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"\r\n"
            b"<html><body>hello crawl</body></html>")
    return [
        {"headers": {"WARC-Type": "warcinfo",
                     "WARC-Record-ID": "<urn:uuid:info-1>",
                     "WARC-Date": "2025-01-01T00:00:00Z",
                     "Content-Type": "application/warc-fields"},
         "block": b"software: testgen/1.0\r\n"},
        {"headers": {"WARC-Type": "response",
                     "WARC-Record-ID": "<urn:uuid:resp-1>",
                     "WARC-Date": "2025-01-01T00:00:01Z",
                     "WARC-Target-URI": "http://example.com/a",
                     "Content-Type":
                         'application/http; msgtype=response'},
         "block": http},
        {"headers": {"WARC-Type": "conversion",     # WET text sidecar
                     "WARC-Record-ID": "<urn:uuid:wet-1>",
                     "WARC-Date": "2025-01-01T00:00:02Z",
                     "WARC-Target-URI": "http://example.com/a",
                     "Content-Type": "text/plain"},
         "block": "hello crawl\nextracted text é".encode()},
    ]


def test_parse_plain_and_gzip_identical():
    recs = _fixture_records()
    plain = parse_warc_bytes(build_warc(recs))
    gz = parse_warc_bytes(build_warc(recs, gzip_members=True))
    assert len(plain) == len(gz) == 3
    for a, b in zip(plain, gz):
        assert a == b
    info, resp, wet = plain
    assert info["warc_type"] == "warcinfo"
    assert resp["warc_type"] == "response"
    assert resp["target_uri"] == "http://example.com/a"
    assert resp["http_status"] == 200
    assert resp["http_content_type"] == "text/html; charset=utf-8"
    assert resp["payload"] == b"<html><body>hello crawl</body></html>"
    assert wet["warc_type"] == "conversion"
    assert wet["payload"].decode() == "hello crawl\nextracted text é"
    assert not any(r["truncated"] for r in plain)


def test_torn_tail_flagged_not_fatal():
    raw = build_warc(_fixture_records())
    cut = raw[: raw.rfind(b"extracted") + 4]      # mid-final-block
    rows = parse_warc_bytes(cut)
    assert len(rows) == 3
    assert rows[2]["truncated"] and not rows[1]["truncated"]
    assert rows[2]["payload"].startswith(b"hello crawl")


def test_read_warc_dataset(ray_session, tmp_path):
    p1 = tmp_path / "a.warc"
    p2 = tmp_path / "b.warc.gz"
    p1.write_bytes(build_warc(_fixture_records()))
    p2.write_bytes(build_warc(_fixture_records(), gzip_members=True))
    df = (read_warc([str(p1), str(p2)]).to_pandas()
          .sort_values(["path", "id"]).reset_index(drop=True))
    assert len(df) == 6
    assert df["warc_type"].tolist() == ["warcinfo", "response",
                                        "conversion"] * 2
    assert (df["http_status"] == 200).sum() == 2
    assert df["content_length"].dtype == np.int64
    # binary payload column survives the Dataset round-trip
    assert isinstance(df["payload"].iloc[1], bytes)
