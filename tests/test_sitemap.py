"""Sitemap source (sources/sitemap.py): urlset + sitemapindex,
gzip, field extraction, malformed tolerance."""

import gzip

import numpy as np
import pandas as pd

from rsyslog_ray.sources.sitemap import parse_sitemap_bytes, read_sitemaps

URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>http://h/a</loc><lastmod>2025-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc> http://h/b </loc></url>
  <url><lastmod>2025-01-03</lastmod></url>
  <url><loc>http://h/c</loc><priority>bogus</priority></url>
</urlset>"""

INDEX = b"""<sitemapindex>
  <sitemap><loc>http://h/s1.xml.gz</loc>
           <lastmod>2025-02-01</lastmod></sitemap>
  <sitemap><loc>http://h/s2.xml</loc></sitemap>
</sitemapindex>"""


def test_parse_urlset_fields():
    rows = parse_sitemap_bytes(URLSET)
    # the loc-less entry is dropped (loc is the protocol's only
    # required field), whitespace trims, bogus priority -> NaN
    assert [r["loc"] for r in rows] == ["http://h/a", "http://h/b",
                                       "http://h/c"]
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["lastmod"] == ""
    assert np.isnan(rows[2]["priority"])
    assert all(r["kind"] == "url" for r in rows)


def test_parse_index_and_gzip():
    rows = parse_sitemap_bytes(gzip.compress(INDEX))
    assert [r["loc"] for r in rows] == ["http://h/s1.xml.gz",
                                       "http://h/s2.xml"]
    assert all(r["kind"] == "sitemap" for r in rows)
    assert rows[0]["lastmod"] == "2025-02-01"


def test_read_sitemaps_dataset(ray_session, tmp_path):
    (tmp_path / "u.xml").write_bytes(URLSET)
    (tmp_path / "i.xml.gz").write_bytes(gzip.compress(INDEX))
    df = (read_sitemaps([str(tmp_path / "u.xml"),
                         str(tmp_path / "i.xml.gz")])
          .to_pandas().sort_values(["path", "loc"])
          .reset_index(drop=True))
    assert len(df) == 5
    assert set(df["kind"]) == {"url", "sitemap"}
    assert df["priority"].dtype == np.float64
