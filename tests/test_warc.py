"""WARC source: record framing, gzip member layout, HTTP split,
WET conversion records, torn-tail tolerance (sources/warc.py)."""

import os

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


def test_write_wet_layout_and_retry_idempotence(ray_session, tmp_path):
    """WET writer: warcinfo leader + one conversion record per row,
    octet-lossless through read_warc incl. non-ASCII text; rewriting
    the same batch self-overwrites (content-addressed stem — retry
    semantics), a different batch gets a different file."""
    import ray

    from rsyslog_ray.sources.warc import read_warc, write_wet

    df = pd.DataFrame({
        "uri": [f"http://ex.com/{i}" for i in range(4)],
        "text": ["plain words", "ünïcode tëxt", "", "tab\tand\nline"]})
    out = str(tmp_path / "wet")
    man1 = write_wet(ray.data.from_pandas(df), out)
    assert man1["n_records"].sum() == 4
    man2 = write_wet(ray.data.from_pandas(df), out)   # retry
    assert sorted(man1["path"]) == sorted(man2["path"])
    files = os.listdir(out)
    assert len(files) == len(set(man1["path"].map(os.path.basename)))

    back = read_warc(out + "/").to_pandas()
    assert (back["warc_type"] == "warcinfo").sum() == len(files)
    conv = back[back["warc_type"] == "conversion"]
    got = {u: bytes(p).decode("utf-8")
           for u, p in zip(conv["target_uri"], conv["payload"])}
    assert got == dict(zip(df["uri"], df["text"]))
    assert set(conv["content_type"]) == {"text/plain"}

    # different rows -> different content-addressed file
    df2 = df.assign(uri=df["uri"] + "x")
    man3 = write_wet(ray.data.from_pandas(df2), out)
    assert not set(man3["path"]) & set(man1["path"])
