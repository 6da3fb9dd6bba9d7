"""WARC web-archive source — the standard container for web crawls.

Beyond-reference webtext surface (the reference has no web-archive
reader; the structural template is the same file-exploding batch shape
as ``sources/pcap.py`` read_pcap): parse ISO 28500 WARC/1.0-1.1
records — ``WARC/1.x`` version line, CRLF header block, blank line,
``Content-Length`` octets of block, CRLF CRLF separator — from plain
``.warc`` files and from ``.warc.gz`` in the standard
one-gzip-member-per-record layout (members found by streaming
``zlib`` with ``unused_data`` continuation, so a file is decodable
without loading the decompressed whole).

Record kinds surface as rows with their WARC named fields
(warcinfo / request / response / resource / conversion / metadata —
the "conversion" type is what WET extracted-text sidecars use); for
``application/http`` response blocks the HTTP status line and headers
split off and the payload is the body alone.  A torn final record
(truncated crawl) yields a row flagged ``truncated`` rather than an
error — crawls at 100 TB always contain some.

``read_warc`` is the scale path: one block per archive file via
``ray.data.read_binary_files``, decode inside ``map_batches`` —
parallelism is per-file, nothing parses on the driver.
"""

from __future__ import annotations

import zlib


def build_warc(records: list[dict], *, gzip_members: bool = False) -> bytes:
    """Deterministic WARC bytes for tests/fixtures: each dict carries
    ``headers`` (name -> value, Content-Length auto-filled) and
    ``block`` (bytes).  ``gzip_members=True`` emits the standard
    .warc.gz member-per-record layout."""
    out = []
    for rec in records:
        hdrs = dict(rec.get("headers", {}))
        block = rec.get("block", b"")
        hdrs.setdefault("Content-Length", str(len(block)))
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode() for k, v in hdrs.items()) + b"\r\n"
        raw = head + block + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            raw = co.compress(raw) + co.flush()
        out.append(raw)
    return b"".join(out)


def _gunzip_members(blob: bytes):
    """Yield each gzip member's decompressed bytes (concatenated-member
    .warc.gz layout).  A torn trailing member yields what decompressed."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(blob[pos:])
        except zlib.error:
            return
        yield chunk
        rest = len(d.unused_data)
        if rest == 0:
            return
        pos = len(blob) - rest


def _parse_http(block: bytes):
    """Split an application/http block -> (status, content_type, body).
    status -1 when the block is not an HTTP response."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return -1, "", block
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split(b" ", 2)[1])
    except (IndexError, ValueError):
        status = -1
    ctype = ""
    for ln in lines[1:]:
        if ln.lower().startswith(b"content-type:"):
            ctype = ln.split(b":", 1)[1].strip().decode(
                "latin-1", "replace")
            break
    return status, ctype, body


def parse_warc_bytes(blob: bytes) -> list[dict]:
    """All records of one (possibly gzipped) WARC byte blob."""
    if blob[:2] == b"\x1f\x8b":
        blob = b"".join(_gunzip_members(blob))
    rows, pos, rid = [], 0, 0
    n = len(blob)
    while pos < n:
        # tolerate inter-record padding (stray CRLFs)
        while pos < n and blob[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not blob.startswith(b"WARC/", pos):
            break                      # garbage tail — stop cleanly
        hdr_end = blob.find(b"\r\n\r\n", pos)
        lf_only = False
        if hdr_end < 0:
            hdr_end = blob.find(b"\n\n", pos)   # LF-only writer
            lf_only = hdr_end >= 0
        if hdr_end < 0:
            break
        head = blob[pos:hdr_end].decode("latin-1", "replace")
        lines = head.splitlines()
        headers = {}
        for ln in lines[1:]:
            if ":" in ln:
                k, v = ln.split(":", 1)
                headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers.get("content-length", "0"))
        except ValueError:
            clen = 0
        body_at = hdr_end + (2 if lf_only else 4)
        block = blob[body_at:body_at + clen]
        truncated = len(block) < clen
        wtype = headers.get("warc-type", "")
        ctype = headers.get("content-type", "")
        status, http_ctype, payload = -1, "", block
        if ctype.startswith("application/http"):
            status, http_ctype, payload = _parse_http(block)
        rows.append({
            "id": rid,
            "warc_type": wtype,
            "record_id": headers.get("warc-record-id", ""),
            "date": headers.get("warc-date", ""),
            "target_uri": headers.get("warc-target-uri", ""),
            "content_type": ctype,
            "content_length": clen,
            "http_status": status,
            "http_content_type": http_ctype,
            "payload": bytes(payload),
            "truncated": truncated,
        })
        rid += 1
        pos = body_at + clen
    return rows


WET_DATE = "2025-01-01T00:00:00Z"

_COLS = ["path", "id", "warc_type", "record_id", "date", "target_uri",
         "content_type", "content_length", "http_status",
         "http_content_type", "payload", "truncated"]


def read_warc(paths, *, parallelism: int = -1):
    """Scale path: one block per archive file, records exploded inside
    ``map_batches`` (the read_pcap shape — per-file parallelism, no
    driver-side parsing).  ``payload`` stays a binary column (the
    multimodal-column convention, stages/multimodal.py)."""
    import pandas as pd
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    override_num_blocks=(
                                        None if parallelism == -1
                                        else parallelism))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for path, blob in zip(batch["path"], batch["bytes"]):
            for row in parse_warc_bytes(bytes(blob)):
                row["path"] = path
                out.append(row)
        return pd.DataFrame(out, columns=_COLS)

    return ds.map_batches(explode, batch_format="pandas")


def write_wet(ds, out_dir: str, *, uri_col: str = "uri",
              text_col: str = "text", date: str = WET_DATE,
              software: str = "rsyslog_ray-wet/1.0"):
    """WET sidecar writer (the Common-Crawl extracted-text format
    CCNet-style pipelines consume): each batch becomes one
    member-per-record ``.warc.gz`` holding a leading ``warcinfo``
    record then one ``conversion`` record per row (WARC-Type:
    conversion, Content-Type: text/plain, utf-8 body) — the inverse of
    :func:`read_warc`, which round-trips these octet-lossless
    (q:wet_roundtrip).

    Scale/resume shape: one file per batch, named by the md5 of the
    batch's URI list (content-addressed — a Ray task RETRY of the same
    batch rewrites the same name via tmp+rename and self-overwrites,
    two different batches can't collide), so the output is idempotent
    without coordination.  Returns the (path, n_records) manifest."""
    import hashlib
    import os

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def write_batch(df: pd.DataFrame) -> pd.DataFrame:
        uris = df[uri_col].astype(str).tolist()
        texts = df[text_col].astype(str).tolist()
        stem = hashlib.md5("\x00".join(uris).encode()).hexdigest()[:16]
        info = (f"software: {software}\r\n"
                f"format: WARC File Format 1.0\r\n").encode()
        recs = [{"headers": {
            "WARC-Type": "warcinfo",
            "WARC-Record-ID": f"<urn:wet:{stem}:info>",
            "WARC-Date": date,
            "Content-Type": "application/warc-fields"},
            "block": info}]
        for i, (u, t) in enumerate(zip(uris, texts)):
            recs.append({"headers": {
                "WARC-Type": "conversion",
                "WARC-Record-ID": f"<urn:wet:{stem}:{i}>",
                "WARC-Date": date,
                "WARC-Target-URI": u,
                "Content-Type": "text/plain"},
                "block": t.encode("utf-8")})
        path = os.path.join(out_dir, f"wet-{stem}.warc.gz")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as fh:
            fh.write(build_warc(recs, gzip_members=True))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path],
                             "n_records": [len(uris)]})

    return (ds.map_batches(write_batch, batch_format="pandas")
            .to_pandas())
