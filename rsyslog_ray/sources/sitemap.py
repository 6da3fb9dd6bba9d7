"""Sitemap source — the sitemaps.org XML protocol (crawl discovery).

Completes the crawl front half beside ``sources/warc.py`` and
``state/robots.py``: parse ``<urlset>`` entry files (loc / lastmod /
changefreq / priority per ``<url>``) and ``<sitemapindex>`` files
(nested ``<sitemap><loc>``), plain or gzipped.  The protocol's
element schema is flat enough that anchored regex extraction is
exact — no XML library dependency, one compiled pattern per field.

``read_sitemaps`` is the scale path: one block per sitemap file via
``read_binary_files``, rows exploded inside ``map_batches`` (the
read_pcap / read_warc shape).  Index files yield rows with
``kind="sitemap"`` pointing at child sitemaps — the caller decides
whether to fetch another generation (no hidden recursion: a 100 TB
frontier wants that loop explicit and resumable).
"""

from __future__ import annotations

import gzip
import re

_URL_BLOCK = re.compile(rb"<(url|sitemap)\s*>(.*?)</\1\s*>",
                        re.S | re.I)
_FIELDS = {
    "loc": re.compile(rb"<loc\s*>\s*(.*?)\s*</loc\s*>", re.S | re.I),
    "lastmod": re.compile(rb"<lastmod\s*>\s*(.*?)\s*</lastmod\s*>",
                          re.S | re.I),
    "changefreq": re.compile(
        rb"<changefreq\s*>\s*(.*?)\s*</changefreq\s*>", re.S | re.I),
    "priority": re.compile(rb"<priority\s*>\s*(.*?)\s*</priority\s*>",
                           re.S | re.I),
}


def parse_sitemap_bytes(blob: bytes) -> list[dict]:
    """All entries of one sitemap/sitemapindex blob (gzip detected).
    ``kind`` is "url" for urlset entries, "sitemap" for index
    children; ``priority`` is a float (NaN when absent)."""
    if blob[:2] == b"\x1f\x8b":
        blob = gzip.decompress(blob)
    rows = []
    for m in _URL_BLOCK.finditer(blob):
        kind, body = m.group(1).decode().lower(), m.group(2)
        row = {"kind": kind}
        for name, rx in _FIELDS.items():
            f = rx.search(body)
            row[name] = (f.group(1).decode("utf-8", "replace")
                         if f else "")
        try:
            row["priority"] = float(row["priority"]) \
                if row["priority"] else float("nan")
        except ValueError:
            row["priority"] = float("nan")
        if row["loc"]:
            rows.append(row)
    return rows


_COLS = ["path", "kind", "loc", "lastmod", "changefreq", "priority"]


def read_sitemaps(paths, *, parallelism: int = -1):
    """One block per sitemap file, entries exploded in map_batches."""
    import pandas as pd
    import ray.data

    ds = ray.data.read_binary_files(paths, include_paths=True,
                                    override_num_blocks=(
                                        None if parallelism == -1
                                        else parallelism))

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        for path, blob in zip(batch["path"], batch["bytes"]):
            for row in parse_sitemap_bytes(bytes(blob)):
                row["path"] = path
                out.append(row)
        return pd.DataFrame(out, columns=_COLS)

    return ds.map_batches(explode, batch_format="pandas")
