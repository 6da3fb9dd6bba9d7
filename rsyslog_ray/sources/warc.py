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

import os
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
    """Yield ``(decompressed, file_offset, compressed_len)`` per gzip
    member (concatenated-member .warc.gz layout).  A torn trailing
    member yields what decompressed."""
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(31)
        try:
            chunk = d.decompress(blob[pos:])
        except zlib.error:
            return
        rest = len(d.unused_data)
        end = len(blob) - rest
        yield chunk, pos, end - pos
        if rest == 0:
            return
        pos = end


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


def parse_warc_bytes(blob: bytes, *, offsets: bool = False) -> list[dict]:
    """All records of one (possibly gzipped) WARC byte blob.

    ``offsets=True`` adds per-record random-access coordinates — the
    CDX index contract: for a ``.warc.gz`` in the standard
    member-per-record layout, ``offset``/``length`` are the containing
    gzip MEMBER's span in the compressed file (seek+read+gunzip yields
    the record); for a plain ``.warc`` they are the record's raw byte
    span.  Parsing itself is unchanged (members are still concatenated
    before record framing, so a record straddling members — nonstandard
    but legal — parses identically and maps to its starting member)."""
    bounds = None                   # [(decomp_start, file_off, comp_len)]
    if blob[:2] == b"\x1f\x8b":
        chunks, bounds, dpos = [], [], 0
        for chunk, off, clen in _gunzip_members(blob):
            chunks.append(chunk)
            bounds.append((dpos, off, clen))
            dpos += len(chunk)
        blob = b"".join(chunks)

    def _span(rec_start: int, rec_end: int) -> tuple:
        if bounds is not None:      # member containing the record start
            import bisect
            i = bisect.bisect_right(bounds, (rec_start, float("inf"))) - 1
            _, off, clen = bounds[max(i, 0)]
            return off, clen
        return rec_start, min(rec_end, len(blob)) - rec_start

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
        rec_start = pos
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
        row = {
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
        }
        if offsets:
            # the record trailer is \r\n\r\n (4 bytes) normally, \n\n
            # (2) for an LF-only writer — using the wrong width on a
            # PLAIN .warc overshoots `length` into the next record's
            # header (fetch survived only via the garbage-tail break)
            off, ln = _span(rec_start,
                            body_at + clen + (2 if lf_only else 4))
            row["offset"], row["length"] = int(off), int(ln)
        rows.append(row)
        rid += 1
        pos = body_at + clen
    return rows


WET_DATE = "2025-01-01T00:00:00Z"

_COLS = ["path", "id", "warc_type", "record_id", "date", "target_uri",
         "content_type", "content_length", "http_status",
         "http_content_type", "payload", "truncated"]

_COL_DTYPES = {"path": object, "id": "int64", "warc_type": object,
               "record_id": object, "date": object,
               "target_uri": object, "content_type": object,
               "content_length": "int64", "http_status": "int64",
               "http_content_type": object, "payload": object,
               "truncated": bool, "offset": "int64",
               "length": "int64"}


_COL_ARROW = None        # lazy: pyarrow types for the typed empty


def _empty_warc_table(cols):
    """Arrow-typed zero-row table (pandas empties lose dtype through
    Ray's block layer and trip the object-dtype size estimator)."""
    import pyarrow as pa

    global _COL_ARROW
    if _COL_ARROW is None:
        _COL_ARROW = {"path": pa.string(), "id": pa.int64(),
                      "warc_type": pa.string(),
                      "record_id": pa.string(), "date": pa.string(),
                      "target_uri": pa.string(),
                      "content_type": pa.string(),
                      "content_length": pa.int64(),
                      "http_status": pa.int64(),
                      "http_content_type": pa.string(),
                      "payload": pa.binary(),
                      "truncated": pa.bool_(), "offset": pa.int64(),
                      "length": pa.int64()}
    return pa.Table.from_pylist(
        [], schema=pa.schema([(c, _COL_ARROW[c]) for c in cols]))


def read_warc(paths, *, parallelism: int = -1, offsets: bool = False):
    """Scale path: one block per archive file, records exploded inside
    ``map_batches`` (the read_pcap shape — per-file parallelism, no
    driver-side parsing).  ``payload`` stays a binary column (the
    multimodal-column convention, stages/multimodal.py).
    ``offsets=True`` adds the per-record random-access ``offset`` /
    ``length`` columns (see :func:`parse_warc_bytes`) for index
    builders (:func:`build_cdx`)."""
    import pandas as pd
    import ray.data

    cols = _COLS + (["offset", "length"] if offsets else [])
    if offsets:
        # read_binary_files auto-gunzips *.gz at the transport layer
        # (and maps compression=None back to detect-by-extension),
        # which would hide the gzip MEMBER boundaries the
        # offset/length coordinates index — list paths on the driver
        # (metadata only) and read the RAW file bytes inside the task
        import os

        if isinstance(paths, str):
            root = paths.rstrip("/")
            if os.path.isdir(root):
                # recursive + files-only, matching read_binary_files'
                # path expansion (a dated-subdir archive layout must
                # not hand a directory to open())
                flist = sorted(
                    os.path.join(dp, nm)
                    for dp, _dirs, names in os.walk(root)
                    for nm in names)
            else:
                flist = [root]
        else:
            flist = list(paths)
        if not flist:
            # an empty archive dir must yield a TYPED zero-row dataset
            # (override_num_blocks=0 raises; a schema-less empty kills
            # downstream joins — the CLAUDE.md empty-block quirk)
            return ray.data.from_arrow(_empty_warc_table(cols))
        ds = ray.data.from_items([{"path": p} for p in flist],
                                 override_num_blocks=(
                                     len(flist) if parallelism == -1
                                     else parallelism))

        def explode_raw(batch: pd.DataFrame) -> pd.DataFrame:
            out = []
            for path in batch["path"]:
                with open(path, "rb") as fh:
                    blob = fh.read()
                for row in parse_warc_bytes(blob, offsets=True):
                    row["path"] = path
                    out.append(row)
            return pd.DataFrame(out, columns=cols)

        return ds.map_batches(explode_raw, batch_format="pandas")

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
        return pd.DataFrame(out, columns=cols)

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


# ---- CDX capture index (the web-archive random-access index format:
#      cc-index / OpenWayback CDXJ — one line per capture, sorted by
#      (SURT key, 14-digit timestamp), JSON blob with the coordinates
#      needed to seek straight to the record in its .warc.gz)

CDX_TYPES = ("response", "revisit", "resource", "conversion")
_CDX_SCHEMA = {"surt": "object", "ts": "object", "uri": "object",
               "mime": "object", "status": "int64", "digest": "object",
               "length": "int64", "offset": "int64",
               "filename": "object"}


CDX_CLUSTER = "_cluster.idx"


def _cdx_index_ds(ds, root: str | None = None):
    """WARC record Dataset -> CDX index-row Dataset (unsorted).

    ``filename`` is the archive path RELATIVE to ``root`` (the
    cc-index convention) so a dated-subdir layout survives the
    index→fetch round trip and two same-named archives in different
    subdirs can't alias; bare basename only when no root is known."""
    import hashlib

    import pandas as pd

    from ..functions import surt_frame

    nroot = os.path.normpath(root) if root else None

    def relname(p: str) -> str:
        if nroot and os.path.normpath(p).startswith(nroot + os.sep):
            return os.path.relpath(p, nroot)
        return os.path.basename(p)

    def index(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["warc_type"].isin(CDX_TYPES)]
        mime = df["http_content_type"].where(
            df["http_content_type"] != "", df["content_type"])
        return pd.DataFrame({
            "surt": surt_frame(df["target_uri"]).to_numpy(),
            "ts": (df["date"].str.replace(r"[^0-9]", "", regex=True)
                   .str[:14].to_numpy()),
            "uri": df["target_uri"].to_numpy(),
            "mime": mime.str.split(";").str[0].str.strip().to_numpy(),
            "status": df["http_status"].astype("int64").to_numpy(),
            "digest": df["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()).to_numpy(),
            "length": df["length"].astype("int64").to_numpy(),
            "offset": df["offset"].astype("int64").to_numpy(),
            "filename": df["path"].map(relname).to_numpy(),
        })

    return ds.map_batches(index, batch_format="pandas")


def _write_cdx_shards(idx, out_dir: str, prefix: str) -> list[dict]:
    """Sort the index rows by (surt, ts, uri) and write one
    ``<prefix><stem>.cdxj`` shard per output batch (content-addressed
    stem: a task retry self-overwrites).  Returns the sorted manifest
    entries [{file, n, lo, hi}] — the batches arrive range-sorted, so
    a shard's key range is its first row .. last row."""
    import hashlib
    import json

    import pandas as pd

    def write_shard(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"file": [], "n_lines": [],
                              "lo": [], "hi": []})
        if df.empty:
            return empty
        lines = []
        for r in df.itertuples(index=False):
            blob = json.dumps({
                "url": r.uri, "mime": r.mime, "status": int(r.status),
                "digest": r.digest, "length": int(r.length),
                "offset": int(r.offset), "filename": r.filename},
                sort_keys=True)
            lines.append(f"{r.surt} {r.ts} {blob}\n")
        stem = hashlib.md5("\x00".join(
            df["surt"] + " " + df["ts"] + " " + df["uri"]
        ).encode()).hexdigest()[:16]
        name = f"{prefix}{stem}.cdxj"
        path = os.path.join(out_dir, name)
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w", encoding="utf-8") as fh:
            fh.writelines(lines)
        os.replace(tmp, path)
        lo = f"{df['surt'].iloc[0]} {df['ts'].iloc[0]}"
        hi = f"{df['surt'].iloc[-1]} {df['ts'].iloc[-1]}"
        return pd.DataFrame({"file": [name], "n_lines": [len(lines)],
                             "lo": [lo], "hi": [hi]})

    man = (idx.sort(["surt", "ts", "uri"])
           .map_batches(write_shard, batch_format="pandas").to_pandas())
    if man.empty:
        return []
    entries = [{"file": f, "n": int(n), "lo": lo, "hi": hi}
               for f, n, lo, hi in zip(man["file"], man["n_lines"],
                                       man["lo"], man["hi"])]
    entries.sort(key=lambda e: e["lo"])
    return entries


def _write_manifest(path: str, header: dict, entries: list[dict]) -> None:
    import json

    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(json.dumps(header, sort_keys=True) + "\n")
        for e in entries:
            fh.write(json.dumps(e, sort_keys=True) + "\n")
    os.replace(tmp, path)


def _load_manifest(path: str) -> tuple[dict, list[dict]]:
    import json

    with open(path, encoding="utf-8") as fh:
        lines = [json.loads(l) for l in fh if l.strip()]
    if lines and "file" not in lines[0]:
        return lines[0], lines[1:]
    return {"epoch": 0}, lines          # legacy headerless manifest


def _active_manifests(cdx_dir: str) -> list[list[dict]]:
    """The readable view of the store: the base manifest plus every
    committed generation that extends the base's CURRENT epoch.
    Generations from before a compaction (their lines are in the new
    base) and torn appends (no manifest) are invisible.  Each returned
    entry list is internally range-sorted and disjoint."""
    import glob as _glob

    header, base = _load_manifest(os.path.join(cdx_dir, CDX_CLUSTER))
    out = [base]
    for m in sorted(_glob.glob(os.path.join(cdx_dir,
                                            "_gen-*.cluster.idx"))):
        h, entries = _load_manifest(m)
        if h.get("base_epoch", -1) == header.get("epoch", 0):
            out.append(entries)
    return out


def build_cdx(paths, out_dir: str, *, parallelism: int = -1):
    """Build a CDXJ index over WARC archives: capture records ->
    (surt, ts, uri, mime, status, digest, length, offset, filename)
    -> ONE range-partitioned sort by (surt, ts, uri) -> content-
    addressed ``part-*.cdxj`` shards under ``out_dir`` (tmp+rename, a
    task retry self-overwrites).  Returns the shard manifest frame.

    100-TB shape: per-archive read parallelism, the only all-to-all is
    the sort (exactly what a real cc-index build is); nothing
    corpus-sized touches the driver.  ``digest`` is sha256-hex of the
    record payload (deviation from CDX's sha1-b32, which keeps the
    digest reproducible by DuckDB oracles).  ``offset``/``length``
    are the gzip-member coordinates from ``read_warc(offsets=True)``
    — seek+read+gunzip yields the record (pinned by t:test_warc random
    access).

    Commit protocol (the build_inverted_index marker-last contract):
    ``_cluster.idx`` — a header {"epoch": 0} plus one JSON line per
    shard with its (surt, ts) key RANGE, the cc-index cluster.idx
    analog — is written LAST, atomically.  Marker present ⇒ the build
    is a skip; marker absent but dir non-empty ⇒ a previous build died
    mid-write, debris is wiped and rebuilt.  The ranges are what
    :func:`cdx_lookup` prunes shard reads with; :func:`append_cdx`
    adds increments, :func:`compact_cdx` folds them back into one
    sorted base."""
    import pandas as pd

    marker = os.path.join(out_dir, CDX_CLUSTER)
    if os.path.exists(marker):
        _, man = _load_manifest(marker)
        return pd.DataFrame(
            {"path": [os.path.join(out_dir, e["file"]) for e in man],
             "n_lines": [e["n"] for e in man]})
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        import shutil
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    root = paths if isinstance(paths, str) else None
    idx = _cdx_index_ds(read_warc(paths, parallelism=parallelism,
                                  offsets=True), root=root)
    entries = _write_cdx_shards(idx, out_dir, "part-")
    _write_manifest(marker, {"epoch": 0}, entries)
    return pd.DataFrame(
        {"path": [os.path.join(out_dir, e["file"]) for e in entries],
         "n_lines": [e["n"] for e in entries]})


def append_cdx(paths, out_dir: str, gen_id: str, *,
               parallelism: int = -1) -> dict:
    """Append NEW archives to a committed CDX index without re-sorting
    the base — the rolling-crawl increment (the LSM shape shared with
    append_inverted_index / the range store): the increment is itself
    sorted into ``gen-<gid>-part-*.cdxj`` shards with its OWN range
    manifest ``_gen-<gid>.cluster.idx`` (marker-last; records the base
    epoch it extends).  Readers merge base + committed generations, so
    a torn append is invisible; re-appending a committed gen_id is a
    no-op.  Lookup cost grows with the generation count —
    :func:`compact_cdx` folds everything back into one sorted base."""
    base = os.path.join(out_dir, CDX_CLUSTER)
    if not os.path.exists(base):
        raise FileNotFoundError(f"append requires a committed index "
                                f"(missing {base})")
    header, _ = _load_manifest(base)
    gman = os.path.join(out_dir, f"_gen-{gen_id}.cluster.idx")
    if os.path.exists(gman):
        _, entries = _load_manifest(gman)
        return {"gen_id": gen_id, "n_shards": len(entries),
                "n_lines": sum(e["n"] for e in entries)}
    # wipe a torn attempt's debris (only this generation's files)
    import glob as _glob
    for f in _glob.glob(os.path.join(out_dir,
                                     f"gen-{gen_id}-part-*.cdxj")):
        os.remove(f)
    idx = _cdx_index_ds(read_warc(paths, parallelism=parallelism,
                                  offsets=True),
                        root=paths if isinstance(paths, str) else None)
    entries = _write_cdx_shards(idx, out_dir, f"gen-{gen_id}-part-")
    _write_manifest(gman, {"base_epoch": header.get("epoch", 0),
                           "gen_id": gen_id}, entries)
    return {"gen_id": gen_id, "n_shards": len(entries),
            "n_lines": sum(e["n"] for e in entries)}


def compact_cdx(out_dir: str, *, parallelism: int = -1) -> dict:
    """Fold the base + every committed generation into ONE freshly
    sorted base (epoch+1) — the LSM compaction.  The commit point is
    the atomic ``_cluster.idx`` replace: the new header's epoch bump
    makes every old-epoch generation manifest invisible in the same
    rename.  A crash before the replace leaves the old view fully
    intact (the new shards are unreferenced debris); after it, stale
    files and gen manifests are unreferenced and reaped here (and by
    the next compact) best-effort."""
    import glob as _glob

    view = _active_manifests(out_dir)
    if len(view) == 1:
        return {"compacted": False, "n_shards": len(view[0])}
    header, _ = _load_manifest(os.path.join(out_dir, CDX_CLUSTER))
    idx = read_cdx(out_dir, parallelism=parallelism)
    # the new epoch is part of the shard stem: a content-addressed
    # "part-<md5>" name could equal a LIVE base shard's (same key
    # multiset), and the pre-commit os.replace would mutate a file the
    # still-committed old manifest references — a crash in that window
    # would serve wrong payloads undetectably (line counts match)
    new_epoch = header.get("epoch", 0) + 1
    entries = _write_cdx_shards(idx, out_dir, f"part-e{new_epoch}-")
    _write_manifest(os.path.join(out_dir, CDX_CLUSTER),
                    {"epoch": new_epoch}, entries)
    # reap: anything not referenced by the NEW base manifest
    keep = {e["file"] for e in entries} | {CDX_CLUSTER}
    for f in os.listdir(out_dir):
        if f not in keep and (f.endswith(".cdxj")
                              or f.endswith(".cluster.idx")):
            os.remove(os.path.join(out_dir, f))
    return {"compacted": True, "n_shards": len(entries),
            "n_lines": sum(e["n"] for e in entries)}


def _open_shard(path: str) -> list[str]:
    """Read one committed shard's lines — a named seam so tests can
    count how many shards a pruned lookup actually touched."""
    with open(path, encoding="utf-8") as fh:
        return fh.read().splitlines()


def cdx_lookup(cdx_dir: str, urls=None, *, surt_prefixes=None):
    """Point / prefix lookup against a committed CDX index WITHOUT
    scanning it — the cc-index ``cluster.idx`` read path: each range
    manifest (driver-small: one line per shard; the base plus every
    committed generation) selects the shards whose key range can
    contain each query, and ONLY those files are opened.  ``urls`` are
    canonicalized to exact SURT keys; ``surt_prefixes`` match any key
    with that prefix (e.g. a whole host: ``"com,example)"``).  Returns
    a DataFrame of matching captures with a ``q`` column naming the
    query that hit.

    Scale shape: O(shards) driver bisect + O(covering shards) reads —
    a handful of point queries over a 100 TB index opens a handful of
    files per generation.  (For query sets large enough to cover most
    shards, read the index as a Dataset and hash-join instead.)"""
    import bisect
    import json

    import pandas as pd

    from ..functions import surt_row

    manifests = _active_manifests(cdx_dir)
    queries = []                      # (q_label, lo_key, hi_key, exact)
    for u in (urls or []):
        k = surt_row(u)
        queries.append((u, k, k + " \uffff", k))
    for p in (surt_prefixes or []):
        queries.append((p, p, p + "\uffff", None))

    rows = []
    seen_files = {}
    for entries in manifests:
        los = [e["lo"] for e in entries]
        for q, lo, hi, exact in queries:
            # first shard whose range can reach lo: the one before the
            # first lo-entry past it (ranges sorted, disjoint per
            # manifest)
            i = max(bisect.bisect_right(los, lo) - 1, 0)
            while i < len(entries):
                e = entries[i]
                if e["lo"] > hi:
                    break
                if e["hi"] >= lo and e["n"]:
                    path = os.path.join(cdx_dir, e["file"])
                    lines = seen_files.get(path)
                    if lines is None:
                        lines = seen_files[path] = _open_shard(path)
                    for line in lines:
                        surt, ts, js = line.split(" ", 2)
                        if exact is not None:
                            if surt != exact:
                                continue
                        elif not surt.startswith(q):
                            continue
                        d = json.loads(js)
                        rows.append((q, surt, ts, d["url"], d["mime"],
                                     d["status"], d["digest"],
                                     d["length"], d["offset"],
                                     d["filename"]))
                i += 1
    out = pd.DataFrame(rows, columns=["q"] + list(_CDX_SCHEMA))
    return out.astype({"status": "int64", "length": "int64",
                       "offset": "int64"})


def read_cdx(cdx_dir: str, *, parallelism: int = -1):
    """Read CDXJ shards back as a typed Dataset (the inverse of
    :func:`build_cdx`; global order is re-established by the caller's
    sort — shard files are content-addressed, not range-named).

    Manifest-driven: only shards referenced by the ACTIVE view (the
    base ``_cluster.idx`` plus committed current-epoch generation
    manifests) are read — a killed writer's ``.cdxj.tmp<pid>`` debris,
    a torn append's unmanifested shards and pre-compaction leftovers
    are all invisible."""
    import json

    import pandas as pd
    import ray.data

    shards = sorted(os.path.join(cdx_dir, e["file"])
                    for entries in _active_manifests(cdx_dir)
                    for e in entries)
    if not shards:
        return ray.data.from_pandas(
            pd.DataFrame({c: pd.Series([], dtype=t)
                          for c, t in _CDX_SCHEMA.items()}))
    ds = ray.data.read_binary_files(
        shards,
        override_num_blocks=(None if parallelism == -1 else parallelism))

    def parse(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for blob in batch["bytes"]:
            for line in bytes(blob).decode("utf-8").splitlines():
                if not line.strip():
                    continue
                surt, ts, js = line.split(" ", 2)
                d = json.loads(js)
                rows.append((surt, ts, d["url"], d["mime"], d["status"],
                             d["digest"], d["length"], d["offset"],
                             d["filename"]))
        out = pd.DataFrame(rows, columns=list(_CDX_SCHEMA))
        return out.astype(_CDX_SCHEMA)

    return ds.map_batches(parse, batch_format="pandas")


def dedupe_revisit(ds):
    """Digest-based capture dedup — WARC ``revisit`` semantics (the
    across-snapshot dedup every archive crawler runs: a capture whose
    payload digest was already stored becomes a revisit record
    pointing at the original capture instead of storing the body
    again).  Input: ``read_warc`` rows.  Output Dataset, one row per
    response capture: (uri, ts, kind, ref_uri, ref_ts) where kind is
    'response' for the FIRST capture of each distinct payload (order:
    ts then uri) and 'revisit' with ref_* = that first capture
    otherwise.

    100-TB shape: digest + (ts, uri) composite only — payload bytes
    are dropped right after hashing; the earliest capture per digest
    comes from two_phase_agg combiner partials (min over the
    composite, a Dataset final — never a driver-held digest table)
    and ships back via ONE hash join on digest.  No per-group
    map_groups, so a viral digest (one boilerplate page captured
    billions of times) costs a combiner min, not a fan-in."""
    import hashlib

    import pandas as pd

    from ..stages.aggregate import two_phase_agg
    from ..stages.join import hash_join

    def slim(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["warc_type"] == "response") & ~df["truncated"]]
        ts = (df["date"].str.replace(r"[^0-9]", "", regex=True)
              .str[:14])
        return pd.DataFrame({
            "uri": df["target_uri"].to_numpy(),
            "ts": ts.to_numpy(),
            "digest": df["payload"].map(
                lambda b: hashlib.sha256(bytes(b)).hexdigest()).to_numpy(),
        })

    caps = ds.map_batches(slim, batch_format="pandas")

    def with_cap(df: pd.DataFrame) -> pd.DataFrame:
        # composite sort key: ts is FIXED-WIDTH (14 digits), so plain
        # concatenation orders by (ts, uri) lexicographically and the
        # parts split back positionally — no separator byte (a NUL
        # separator dies in numpy's fixed-width-unicode scalar
        # coercion, which treats \x00 as a terminator)
        df = df.copy()
        df["cap"] = df["ts"].str.ljust(14, "0") + df["uri"]
        return df

    # typed zero-row seeds at every schema-fragile point: Ray DROPS a
    # map stage's empty output blocks entirely, so a capture-free
    # archive turns each chain below into a schema-less Dataset and
    # hash_join dies on `schema() is None`.  Unioning a typed empty
    # frame pins the schema at zero cost (all columns are strings).
    import ray.data

    def _empty(cols):
        return ray.data.from_pandas(pd.DataFrame(
            {c: pd.Series([], dtype=object) for c in cols}))

    keyed = (caps.map_batches(with_cap, batch_format="pandas")
             .union(_empty(["uri", "ts", "digest", "cap"])))
    firsts = two_phase_agg(
        keyed.drop_columns(["uri", "ts"]), ["digest"], count=None,
        mins={"cap": "first_cap"}, driver_reduce=False,
        empty_result=pd.DataFrame(
            {"digest": pd.Series([], dtype=object),
             "first_cap": pd.Series([], dtype=object)}))
    joined = (hash_join(keyed, firsts, on="digest", how="inner")
              .union(_empty(["uri", "ts", "digest", "cap",
                             "first_cap"])))

    def mark(df: pd.DataFrame) -> pd.DataFrame:
        is_first = df["cap"] == df["first_cap"]
        return pd.DataFrame({
            "uri": df["uri"].to_numpy(),
            "ts": df["ts"].to_numpy(),
            "kind": is_first.map({True: "response",
                                  False: "revisit"}).to_numpy(),
            "ref_uri": df["first_cap"].str[14:].where(~is_first,
                                                      "").to_numpy(),
            "ref_ts": df["first_cap"].str[:14].where(~is_first,
                                                     "").to_numpy(),
        })

    return (joined.map_batches(mark, batch_format="pandas")
            .union(_empty(["uri", "ts", "kind", "ref_uri", "ref_ts"])))


def fetch_captures(warc_root: str, coords):
    """Random-access record fetch — the consumption path of a CDX
    lookup (what a wayback-style replay service does): ``coords`` is a
    DataFrame with (filename, offset, length) columns (a
    :func:`cdx_lookup` result works as-is); each row's record is
    fetched by seek+read(+gunzip) of exactly its span, never a full
    archive scan.  Returns a Dataset of the parsed records (read_warc
    schema minus ``path``/``id``, plus the query coordinates).

    Scale shape: coords is the SMALL side (a lookup result); fetches
    distribute over a Dataset of coordinate rows, grouped per file so
    one task opens each archive once."""
    import pandas as pd
    import ray.data

    cols = ["filename", "offset", "length"]
    keep = [c for c in coords.columns if c in ("q", "surt", "ts")]
    ds = ray.data.from_pandas(
        coords[cols + keep].reset_index(drop=True))

    from ..functions import surt_row

    def pick(recs: list[dict], r) -> dict | None:
        """The record the coordinates POINT AT: a span normally holds
        one record (member-per-record layout), but a gzip member may
        legally hold several (e.g. a single-stream .warc.gz, where
        every record's span is the whole file) — disambiguate by the
        carried surt/ts columns when present, never blindly recs[0]."""
        if len(recs) == 1 or not keep:
            return recs[0] if recs else None
        for rec in recs:
            ts = "".join(ch for ch in rec["date"] if ch.isdigit())[:14]
            if ("surt" in keep
                    and surt_row(rec["target_uri"]) != r.surt):
                continue
            if "ts" in keep and ts != r.ts:
                continue
            return rec
        return None

    def fetch(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for fname, grp in df.groupby("filename", sort=False):
            with open(os.path.join(warc_root, fname), "rb") as fh:
                for r in grp.itertuples(index=False):
                    fh.seek(int(r.offset))
                    blob = fh.read(int(r.length))
                    rec = pick(parse_warc_bytes(blob), r)
                    if rec is None:
                        continue
                    rec.pop("id", None)
                    for c in keep:
                        rec[c] = getattr(r, c)
                    rec["filename"] = fname
                    rows.append(rec)
        out_cols = ([c for c in _COLS if c not in ("path", "id")]
                    + keep + ["filename"])
        out = pd.DataFrame(rows, columns=out_cols)
        return out

    return ds.map_batches(fetch, batch_format="pandas")


def validate_cdx(cdx_dir: str) -> dict:
    """Post-commit bit-rot audit for the CDX store (the
    genstore.validate_store analog for text shards): every ACTIVE
    shard's line count must equal its manifest ``n`` (shards commit
    by atomic rename, so a mismatch or a missing file is a disk
    fault, not a torn write).

    * A bad shard in a committed GENERATION quarantines that
      generation (manifest + files removed; readers fall back to
      base + intact generations, and the idempotent
      :func:`append_cdx` restores it).
    * A bad BASE shard is reported in ``bad_base`` — the base needs a
      rebuild (or a :func:`compact_cdx` after re-appending the data).

    Returns {"ok": bool, "bad_base": [files], "quarantined": [gids]}.
    """
    import glob as _glob

    def ok(entry) -> bool:
        path = os.path.join(cdx_dir, entry["file"])
        try:
            with open(path, "rb") as fh:
                n = sum(1 for l in fh if l.strip())
        except OSError:
            return False
        return n == entry["n"]

    header, base = _load_manifest(os.path.join(cdx_dir, CDX_CLUSTER))
    bad_base = [os.path.join(cdx_dir, e["file"])
                for e in base if not ok(e)]

    quarantined = []
    for m in sorted(_glob.glob(os.path.join(cdx_dir,
                                            "_gen-*.cluster.idx"))):
        h, entries = _load_manifest(m)
        if h.get("base_epoch", -1) != header.get("epoch", 0):
            continue
        if any(not ok(e) for e in entries):
            for e in entries:
                p = os.path.join(cdx_dir, e["file"])
                if os.path.exists(p):
                    os.remove(p)
            os.remove(m)
            quarantined.append(h.get("gen_id",
                                     os.path.basename(m)[5:-12]))

    return {"ok": not bad_base and not quarantined,
            "bad_base": bad_base, "quarantined": quarantined}
