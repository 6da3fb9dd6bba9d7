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


# ---- SURT canonicalization (functions.surt_frame vs per-row spec) ----

SURT_BATTERY = [
    "http://www.Example.COM:80/p?b=2&a=1",
    "https://sub.ex.org:8443/",
    "http://ex.org",
    "https://u:p@ex.org:443/Path/File?z=9#frag",
    "http://ex.org/a%2Fb?x",
    "ftp://files.ex.net:21/pub",
    "http://www.www.ex.com/",           # only ONE leading www. strips
    "https://ex.com:8443/p?b&a&b",      # dup params keep multiplicity
    "http://EX.com/UPPER/Case?Q=V",     # path/query case preserved
    "ex.com/no-scheme",
]


def test_surt_frame_matches_row_spec():
    import pandas as pd

    from rsyslog_ray.functions import surt_frame, surt_row

    got = surt_frame(pd.Series(SURT_BATTERY)).tolist()
    want = [surt_row(u) for u in SURT_BATTERY]
    assert got == want
    # pinned examples (the cc-index sort-key semantics)
    assert got[0] == "com,example)/p?a=1&b=2"
    assert got[1] == "org,ex,sub:8443)/"
    assert got[2] == "org,ex)/"
    assert got[3] == "org,ex)/Path/File?z=9"
    assert got[6] == "com,ex,www)/"


# ---- record offsets + CDX random access ----

def _capture_fixture(n=10):
    def resp(uri, date, body):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)
        return {"headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:{uri}:{date}>",
                    "WARC-Date": date, "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response"},
                "block": http}
    return [resp(f"http://site{i % 3}.com/p{i}",
                 f"2025-01-0{1 + i % 5}T00:00:0{i % 9}Z",
                 f"body-{i}".encode()) for i in range(n)]


def test_offsets_random_access(ray_session, tmp_path):
    """offset/length from read_warc(offsets=True) are true random-access
    coordinates: seek+read+parse yields the same record, for BOTH the
    member-per-record .warc.gz layout (member span) and plain .warc
    (raw byte span)."""
    import hashlib

    from rsyslog_ray.sources.warc import build_warc, read_warc

    recs = _capture_fixture()
    p1 = tmp_path / "a.warc.gz"
    p2 = tmp_path / "b.warc"
    p1.write_bytes(build_warc(recs[:6], gzip_members=True))
    p2.write_bytes(build_warc(recs[6:]))
    df = read_warc([str(p1), str(p2)], offsets=True).to_pandas()
    assert len(df) == 10
    for r in df.itertuples():
        with open(r.path, "rb") as fh:
            fh.seek(r.offset)
            blob = fh.read(r.length)
        rows = parse_warc_bytes(blob)
        assert rows and rows[0]["target_uri"] == r.target_uri
        assert rows[0]["payload"] == bytes(r.payload)
        assert hashlib.sha256(rows[0]["payload"]).hexdigest() == \
            hashlib.sha256(bytes(r.payload)).hexdigest()


def test_cdx_build_read_roundtrip(ray_session, tmp_path):
    """build_cdx -> read_cdx: one line per capture, (surt, ts, uri)
    global order, coordinates support seek-read-parse random access,
    digest = sha256(payload); a rebuild is file-identical (content-
    addressed stems — retry semantics)."""
    import hashlib
    import os

    from rsyslog_ray.sources.warc import build_cdx, read_cdx, build_warc

    p1 = tmp_path / "a.warc.gz"
    p2 = tmp_path / "b.warc"
    recs = _capture_fixture()
    p1.write_bytes(build_warc(recs[:6], gzip_members=True))
    p2.write_bytes(build_warc(recs[6:]))
    out = str(tmp_path / "cdx")
    man1 = build_cdx([str(p1), str(p2)], out)
    assert man1["n_lines"].sum() == 10
    idx = read_cdx(out).to_pandas()
    idx = idx.sort_values(["surt", "ts", "uri"]).reset_index(drop=True)
    assert len(idx) == 10
    assert idx["surt"].str.startswith("com,site").all()
    assert (idx["status"] == 200).all()
    assert set(idx["mime"]) == {"text/html"}
    for r in idx.itertuples():
        with open(tmp_path / r.filename, "rb") as fh:
            fh.seek(r.offset)
            blob = fh.read(r.length)
        rows = parse_warc_bytes(blob)
        assert rows[0]["target_uri"] == r.uri
        assert hashlib.sha256(rows[0]["payload"]).hexdigest() == r.digest
    files1 = sorted(os.listdir(out))
    man2 = build_cdx([str(p1), str(p2)], out)      # retry
    assert sorted(os.listdir(out)) == files1
    assert man2["n_lines"].sum() == 10


def test_dedupe_revisit_semantics(ray_session, tmp_path):
    """WARC revisit dedup: the FIRST capture (by ts, then uri) of each
    distinct payload stays 'response'; every later identical-payload
    capture becomes 'revisit' pointing at it.  ref columns must carry
    the uri intact (regression: a NUL composite separator dies in
    numpy's fixed-width-unicode coercion)."""
    from rsyslog_ray.sources.warc import build_warc, dedupe_revisit, read_warc

    def resp(uri, date, body):
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + body)
        return {"headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:{uri}:{date}>",
                    "WARC-Date": date, "WARC-Target-URI": uri,
                    "Content-Type": "application/http; msgtype=response"},
                "block": http}

    recs = [resp("http://a.com/x", "2025-01-01T00:00:01Z", b"AAA"),
            resp("http://b.com/y", "2025-01-01T00:00:02Z", b"BBB"),
            resp("http://a.com/x", "2025-01-02T00:00:01Z", b"AAA"),
            resp("http://c.com/z", "2025-01-03T00:00:00Z", b"AAA")]
    p = tmp_path / "a.warc"
    p.write_bytes(build_warc(recs))
    out = (dedupe_revisit(read_warc([str(p)])).to_pandas()
           .sort_values(["ts", "uri"]).reset_index(drop=True))
    assert out["kind"].tolist() == ["response", "response",
                                    "revisit", "revisit"]
    assert out.loc[2, "ref_uri"] == "http://a.com/x"
    assert out.loc[2, "ref_ts"] == "20250101000001"
    assert out.loc[3, "ref_uri"] == "http://a.com/x"
    assert (out.loc[:1, ["ref_uri", "ref_ts"]] == "").all().all()


def test_cdx_tmp_debris_invisible(ray_session, tmp_path):
    """A killed shard writer leaves part-*.cdxj.tmp<pid> debris beside
    the committed shards (tmp+rename protocol); read_cdx must surface
    ONLY committed lines — torn debris bytes are not index entries."""
    from rsyslog_ray.sources.warc import build_cdx, build_warc, read_cdx

    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc(_capture_fixture(), gzip_members=True))
    out = str(tmp_path / "cdx")
    build_cdx([str(p)], out)
    want = (read_cdx(out).to_pandas()
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))
    # torn debris: half a line, garbage bytes, an empty tmp
    (tmp_path / "cdx" / "part-aa.cdxj.tmp123").write_text(
        "com,evil)/x 20250101")
    (tmp_path / "cdx" / "part-bb.cdxj.tmp9").write_bytes(b"\x00\xffgarbage")
    (tmp_path / "cdx" / "part-cc.cdxj.tmp1").write_bytes(b"")
    got = (read_cdx(out).to_pandas()
           .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(got, want)


def test_cdx_lookup_pruned(ray_session, tmp_path, monkeypatch):
    """cluster.idx pruned lookup: point and host-prefix queries return
    exactly the matching captures while opening ONLY the shards whose
    key range covers the query — never the whole index."""
    import rsyslog_ray.sources.warc as W

    # many small shards: tiny batches force multiple part files
    recs = _capture_fixture(n=60)
    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))
    out = str(tmp_path / "cdx")
    import ray.data

    # shrink sort output blocks so several shards exist
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 4096
    try:
        W.build_cdx([str(p)], out)
    finally:
        ctx.target_max_block_size = old
    n_shards = len([f for f in os.listdir(out)
                    if f.startswith("part-") and f.endswith(".cdxj")])

    opened = []
    real = W._open_shard
    monkeypatch.setattr(W, "_open_shard",
                        lambda path: (opened.append(path)
                                      or real(path)))
    got = W.cdx_lookup(out, urls=["http://site1.com/p4",
                                  "http://nowhere.example/"])
    assert got[got["q"] == "http://site1.com/p4"]["uri"].tolist() == \
        ["http://site1.com/p4"]
    assert (got["q"] == "http://nowhere.example/").sum() == 0

    opened_host = []
    monkeypatch.setattr(W, "_open_shard",
                        lambda path: (opened_host.append(path)
                                      or real(path)))
    host = W.cdx_lookup(out, surt_prefixes=["com,site2)"])
    assert sorted(host["uri"]) == sorted(
        f"http://site2.com/p{i}" for i in range(2, 60, 3))
    if n_shards > 2:
        assert len(set(opened)) < n_shards    # pruned, not a scan
        assert len(set(opened_host)) < n_shards


def test_cdx_torn_build_rebuilds(ray_session, tmp_path):
    """Shards without the _cluster.idx marker are a torn build: the
    next build wipes the debris and rebuilds; the committed index is
    complete and correct."""
    from rsyslog_ray.sources.warc import (CDX_CLUSTER, build_cdx,
                                          build_warc, read_cdx)

    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc(_capture_fixture(), gzip_members=True))
    out = str(tmp_path / "cdx")
    build_cdx([str(p)], out)
    # tear it: drop the marker, leave stale junk shards
    os.unlink(os.path.join(out, CDX_CLUSTER))
    with open(os.path.join(out, "part-stale.cdxj"), "w") as fh:
        fh.write("zz,stale)/ 20990101000000 {}\n")
    build_cdx([str(p)], out)
    idx = read_cdx(out).to_pandas()
    assert len(idx) == 10
    assert not (idx["surt"] == "zz,stale)/").any()
    assert os.path.exists(os.path.join(out, CDX_CLUSTER))


def test_cdx_append_and_compact(ray_session, tmp_path):
    """Generation protocol on the CDX store (the LSM shape): an append
    is visible only once its manifest lands (torn append = invisible),
    re-append of a committed gen is a no-op, lookup spans base +
    generations, and compaction folds everything into one sorted base
    (epoch bump), reaping stale files — with identical content."""
    import rsyslog_ray.sources.warc as W

    recs = _capture_fixture(n=12)
    p1 = tmp_path / "a.warc.gz"
    p2 = tmp_path / "b.warc.gz"
    p1.write_bytes(build_warc(recs[:8], gzip_members=True))
    p2.write_bytes(build_warc(recs[8:], gzip_members=True))
    out = str(tmp_path / "cdx")
    W.build_cdx([str(p1)], out)
    base = (W.read_cdx(out).to_pandas()
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))
    assert len(base) == 8

    # torn append: shards written, manifest missing -> invisible
    r1 = W.append_cdx([str(p2)], out, "g1")
    assert r1["n_lines"] == 4
    os.unlink(os.path.join(out, "_gen-g1.cluster.idx"))
    assert len(W.read_cdx(out).to_pandas()) == 8
    assert len(W.cdx_lookup(out, urls=["http://site2.com/p8"])) == 0

    # committed append: visible to read + lookup; re-append = no-op
    r2 = W.append_cdx([str(p2)], out, "g1")
    assert r2["n_lines"] == 4
    r3 = W.append_cdx([str(p2)], out, "g1")
    assert r3 == r2
    both = (W.read_cdx(out).to_pandas()
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))
    assert len(both) == 12
    hit = W.cdx_lookup(out, urls=["http://site2.com/p8"])
    assert hit["uri"].tolist() == ["http://site2.com/p8"]

    # compact: one sorted base, same content, stale gen files reaped
    st = W.compact_cdx(out)
    assert st["compacted"] and st["n_lines"] == 12
    flat = (W.read_cdx(out).to_pandas()
            .sort_values(["surt", "ts", "uri"]).reset_index(drop=True))
    import pandas as pd
    pd.testing.assert_frame_equal(flat, both)
    left = os.listdir(out)
    assert not any(f.startswith("gen-") or f.startswith("_gen-")
                   for f in left)
    # idempotent: nothing to fold
    assert W.compact_cdx(out)["compacted"] is False
    # the fixture urls still resolve post-compaction
    assert len(W.cdx_lookup(out, urls=["http://site2.com/p8",
                                       "http://site0.com/p0"])) == 2


def test_dedupe_revisit_empty_archive(ray_session, tmp_path):
    """A capture-free archive flows through the combiner-min + join as
    typed empties (Ray drops empty map-output blocks, which turns the
    chain schema-less and killed the join before the seed unions)."""
    from rsyslog_ray.sources.warc import build_warc, dedupe_revisit, read_warc

    p = tmp_path / "a.warc"
    p.write_bytes(build_warc([]))
    out = dedupe_revisit(read_warc([str(p)])).to_pandas()
    assert len(out) == 0


def test_fetch_captures_roundtrip(ray_session, tmp_path):
    """cdx_lookup -> fetch_captures closes the replay loop: the fetched
    payloads are byte-identical to the archived originals, fetched by
    span seeks only (never a full-archive parse)."""
    import hashlib

    from rsyslog_ray.sources.warc import (build_cdx, build_warc,
                                          cdx_lookup, fetch_captures)

    recs = _capture_fixture(n=10)
    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc(recs, gzip_members=True))
    out = str(tmp_path / "cdx")
    build_cdx([str(p)], out)
    hits = cdx_lookup(out, urls=["http://site1.com/p4",
                                 "http://site0.com/p9"])
    got = fetch_captures(str(tmp_path), hits).to_pandas()
    assert sorted(got["target_uri"]) == ["http://site0.com/p9",
                                         "http://site1.com/p4"]
    for r in got.itertuples():
        assert bytes(r.payload) == f"body-{r.target_uri[-1]}".encode()
        assert hashlib.sha256(bytes(r.payload)).hexdigest() in \
            set(hits["digest"])
        assert r.http_status == 200


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_URL_CHARS = st.text(
    alphabet="abcXYZ09.-_~%:/?#@&=+!$,;'()*[]\\ \t", max_size=40)


@settings(max_examples=200, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_URL_CHARS, min_size=1, max_size=8))
def test_surt_frame_row_parity_fuzz(urls):
    """surt_frame == surt_row on arbitrary (incl. garbage) inputs —
    the vectorized engine and the scalar spec must agree byte for
    byte, and never raise."""
    import pandas as pd

    from rsyslog_ray.functions import surt_frame, surt_row

    got = surt_frame(pd.Series(urls, dtype=object)).tolist()
    want = [surt_row(u) for u in urls]
    assert got == want


def test_validate_cdx_quarantines_rotted_generation(ray_session,
                                                   tmp_path):
    """CDX bit-rot audit: a rotted (line-count-mismatched) shard in a
    committed generation quarantines exactly that generation —
    read/lookup fall back to the base, re-append restores; a rotted
    base shard is reported, never silently dropped."""
    import rsyslog_ray.sources.warc as W

    recs = _capture_fixture(n=12)
    p1, p2 = tmp_path / "a.warc.gz", tmp_path / "b.warc.gz"
    p1.write_bytes(build_warc(recs[:8], gzip_members=True))
    p2.write_bytes(build_warc(recs[8:], gzip_members=True))
    out = str(tmp_path / "cdx")
    W.build_cdx([str(p1)], out)
    W.append_cdx([str(p2)], out, "g1")
    assert W.validate_cdx(out) == {"ok": True, "bad_base": [],
                                   "quarantined": []}

    victim = [f for f in os.listdir(out) if f.startswith("gen-g1-")][0]
    with open(os.path.join(out, victim), "a") as fh:
        fh.write("zz,rot)/ 20990101000000 {}\n")   # count mismatch
    rep = W.validate_cdx(out)
    assert rep["quarantined"] == ["g1"] and not rep["bad_base"]
    assert len(W.read_cdx(out).to_pandas()) == 8   # base only
    W.append_cdx([str(p2)], out, "g1")             # restore
    assert len(W.read_cdx(out).to_pandas()) == 12

    base_f = [f for f in os.listdir(out)
              if f.startswith("part-") and f.endswith(".cdxj")][0]
    with open(os.path.join(out, base_f), "a") as fh:
        fh.write("zz,rot)/ 20990101000000 {}\n")
    rep2 = W.validate_cdx(out)
    assert rep2["bad_base"] == [os.path.join(out, base_f)]
    assert os.path.exists(os.path.join(out, base_f))


def test_fetch_captures_single_stream_gz(ray_session, tmp_path):
    """A single-stream .warc.gz (ONE gzip member for the whole file —
    legal, seen in the wild) indexes every record at the same member
    span; fetch must return each query's OWN record, disambiguated by
    the carried surt/ts — not blindly the member's first record."""
    import gzip

    from rsyslog_ray.sources.warc import (build_cdx, build_warc,
                                          cdx_lookup, fetch_captures)

    recs = _capture_fixture(n=6)
    plain = build_warc(recs)                   # then ONE gzip member
    p = tmp_path / "single.warc.gz"
    p.write_bytes(gzip.compress(plain))
    out = str(tmp_path / "cdx")
    build_cdx([str(p)], out)
    hits = cdx_lookup(out, urls=["http://site1.com/p4",
                                 "http://site2.com/p5"])
    assert len(hits) == 2
    got = (fetch_captures(str(tmp_path), hits).to_pandas()
           .sort_values("target_uri").reset_index(drop=True))
    assert got["target_uri"].tolist() == ["http://site1.com/p4",
                                          "http://site2.com/p5"]
    assert [bytes(b) for b in got["payload"]] == [b"body-4", b"body-5"]


def test_cdx_nested_subdir_fetch(ray_session, tmp_path):
    """ADVICE r4: a dated-subdir archive layout (the real cc layout)
    must survive the index->fetch round trip — `filename` stores the
    path RELATIVE to the indexing root, so two same-named archives in
    different subdirs cannot alias and fetch_captures(root, hits)
    opens the right file."""
    from rsyslog_ray.sources.warc import (build_cdx, build_warc,
                                          cdx_lookup, fetch_captures)

    root = tmp_path / "archives"
    d1 = root / "2025-01-01"
    d2 = root / "2025-01-02"
    d1.mkdir(parents=True)
    d2.mkdir(parents=True)
    # SAME basename in both subdirs, different content
    (d1 / "crawl.warc.gz").write_bytes(
        build_warc(_capture_fixture(n=4), gzip_members=True))
    recs2 = _capture_fixture(n=8)[4:]          # p4..p7
    (d2 / "crawl.warc.gz").write_bytes(
        build_warc(recs2, gzip_members=True))
    out = str(tmp_path / "cdx")
    build_cdx(str(root), out)
    hits = cdx_lookup(out, urls=["http://site1.com/p1",
                                 "http://site2.com/p5"])
    assert len(hits) == 2
    assert sorted(hits["filename"]) == [
        os.path.join("2025-01-01", "crawl.warc.gz"),
        os.path.join("2025-01-02", "crawl.warc.gz")]
    got = (fetch_captures(str(root), hits).to_pandas()
           .sort_values("target_uri").reset_index(drop=True))
    assert got["target_uri"].tolist() == ["http://site1.com/p1",
                                          "http://site2.com/p5"]
    assert [bytes(b) for b in got["payload"]] == [b"body-1", b"body-5"]


def test_read_warc_offsets_empty_dir(ray_session, tmp_path):
    """ADVICE r4: read_warc(offsets=True) over a capture-free dir must
    return a TYPED zero-row dataset (was: override_num_blocks=0
    ValueError), and build_cdx over it commits an empty index that
    cdx_lookup/read_cdx read back cleanly."""
    from rsyslog_ray.sources.warc import (build_cdx, cdx_lookup,
                                          read_cdx, read_warc)

    empty = tmp_path / "noarchives"
    empty.mkdir()
    ds = read_warc(str(empty), offsets=True)
    # Dataset-level schema must survive (to_pandas is lossy for ANY
    # zero-row dataset — the documented Ray quirk); joins/unions key
    # off ds.schema(), which is the contract here
    sch = ds.schema()
    assert sch is not None
    assert "offset" in sch.names and "length" in sch.names
    assert len(ds.to_pandas()) == 0

    out = str(tmp_path / "cdx")
    man = build_cdx(str(empty), out)
    assert len(man) == 0
    assert os.path.exists(os.path.join(out, "_cluster.idx"))
    assert len(read_cdx(out).to_pandas()) == 0
    assert len(cdx_lookup(out, urls=["http://x.com/"])) == 0


def test_compact_never_overwrites_live_base_shard(ray_session, tmp_path):
    """ADVICE r4: compaction writes its new base shards under an
    epoch-stamped stem, so a new shard whose key multiset equals a
    LIVE old-base shard's cannot os.replace that still-referenced file
    before the atomic manifest commit.  Forced here by compacting a
    base + an EMPTY generation: the folded content is identical to the
    base, the old stem would collide exactly."""
    import rsyslog_ray.sources.warc as W

    p = tmp_path / "a.warc.gz"
    p.write_bytes(build_warc(_capture_fixture(n=6), gzip_members=True))
    out = str(tmp_path / "cdx")
    W.build_cdx([str(p)], out)
    _, base_entries = W._load_manifest(os.path.join(out, W.CDX_CLUSTER))
    old_files = {e["file"] for e in base_entries}
    old_bytes = {f: open(os.path.join(out, f), "rb").read()
                 for f in old_files}

    emptydir = tmp_path / "empty"
    emptydir.mkdir()
    W.append_cdx(str(emptydir), out, "g1")
    rep = W.compact_cdx(out)
    assert rep["compacted"]
    hdr, new_entries = W._load_manifest(os.path.join(out, W.CDX_CLUSTER))
    assert hdr["epoch"] == 1
    new_files = {e["file"] for e in new_entries}
    # disjoint names: nothing the old manifest referenced was mutated
    assert not (new_files & old_files)
    assert all(f.startswith("part-e1-") for f in new_files)
    # content survives byte-identical under the new names
    idx = W.read_cdx(out).to_pandas()
    assert len(idx) == 6


def test_plain_warc_lf_only_exact_spans(ray_session, tmp_path):
    """ADVICE r4: offsets mode on a plain .warc written with LF-only
    line endings must compute `length` with the actual 2-byte trailer
    — each span ends before the next record's header (no 2-byte
    overshoot into `WARC/`)."""
    from rsyslog_ray.sources.warc import parse_warc_bytes

    def lf_rec(uri, body):
        head = (f"WARC/1.0\nWARC-Type: resource\n"
                f"WARC-Target-URI: {uri}\n"
                f"Content-Length: {len(body)}\n\n").encode()
        return head + body + b"\n\n"

    blob = b"".join(lf_rec(f"http://lf.com/{i}", f"B{i}".encode())
                    for i in range(4))
    rows = parse_warc_bytes(blob, offsets=True)
    assert len(rows) == 4
    for i, r in enumerate(rows):
        span = blob[r["offset"]:r["offset"] + r["length"]]
        assert span.startswith(b"WARC/1.0\n")
        # exact: span covers this record only, ending at its trailer
        assert b"WARC/" not in span[5:]
        sub = parse_warc_bytes(span)
        assert len(sub) == 1
        assert sub[0]["target_uri"] == f"http://lf.com/{i}"
        assert sub[0]["payload"] == f"B{i}".encode()
        if i + 1 < len(rows):
            assert r["offset"] + r["length"] <= rows[i + 1]["offset"]
