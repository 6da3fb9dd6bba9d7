"""Parse stage — the flagship hot path (Arrow/RE2 vectorized).

Combines the reference's parser chain (runtime/parser.c:613-693),
liblognorm field extraction (plugins/mmnormalize/mmnormalize.c) and
sanitization (runtime/parser.c:330, plugins/mmutf8fix) into ONE
``map_batches(batch_format="pyarrow")`` stage:

  pages(url, warc_ts, html, text, lang, shard)
    -> + parsed fields (p_ts, p_host, p_app, p_sev, p_msg, p_status,
         p_bytes, rule, parse_ok)
    -> + extracted (sanitized text pulled out of the html payload)
    -> html column DROPPED (the wide binary payload must not travel
       further down the pipeline — SURVEY.md §7 hard part 5)

Extraction spec (shared with the per-row oracle, byte-identical by
construction):  every ``<...>`` tag in the raw html BYTES is replaced
with a newline (one RE2 pass — no decode of the 1-4 KiB payload), then
the result is sanitized (sanitize.py).  The rule chain runs as RE2
``pc.extract_regex`` per rule over the still-unmatched rows'
coalesce — measured ~600k rows/s/core vs ~75k for the pandas chain.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..rulebase import PAGES_RULEBASE, Rulebase
from ..sanitize import sanitize_arrow, sanitize_bytes

TAG_RE = re.compile(rb"<[^>]*>")
TAG_PATTERN = r"<[^>]*>"


def extract_text_row(html: bytes) -> str:
    """Per-row reference implementation (oracle): tag-strip then
    sanitize. Shared spec with the vectorized path so the result is
    byte-identical per url."""
    return sanitize_bytes(TAG_RE.sub(b"\n", html))


def extract_text_arrow(html) -> pd.Series:
    """Vectorized extraction over an Arrow binary column (engine path)."""
    stripped = pc.replace_substring_regex(html, TAG_PATTERN, b"\n")
    return sanitize_arrow(stripped)


# pandas alias kept for tests / small tools
def extract_text_frame(html: pd.Series) -> pd.Series:
    return extract_text_arrow(pa.array(html, type=pa.binary()))


class ParseStage:
    """Arrow-native parse: ``map_batches(ParseStage(), batch_format="pyarrow")``.

    Plain callable (stateless tasks — fuses with neighbouring task
    stages); regexes are compiled inside Arrow's RE2 kernels per
    process, rulebase construction is import-time."""

    def __init__(self, rulebase: Rulebase | None = None, keep_html: bool = False):
        self.rulebase = rulebase or PAGES_RULEBASE
        self.keep_html = keep_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        parsed = self.rulebase.parse_table(batch["text"])
        cols = dict(zip(batch.column_names, batch.columns))
        cols.update(parsed)
        cols["extracted"] = pa.array(extract_text_arrow(batch["html"]),
                                     type=pa.string())
        if not self.keep_html:
            cols.pop("html", None)
        return pa.table(cols)


def parse_pages(ds, batch_size: int = 8192):
    """Attach the parse stage (stateless elastic tasks)."""
    return ds.map_batches(ParseStage(), batch_format="pyarrow",
                          batch_size=batch_size)


HREF_RE = re.compile(r"""href\s*=\s*["']([^"'>]+)["']""", re.I)


def extract_links_frame(html: pd.Series,
                        base_uri: pd.Series) -> pd.DataFrame:
    """(src_uri, href, resolved) link rows from an HTML text column:
    one C regex pass per batch (``str.findall``) finds every
    ``href="..."``, explode pairs each with its row's base URI, and
    relative references resolve with ``urljoin`` — the link-graph
    front half of a crawl (sources/warc.py -> here -> graph.py)."""
    from urllib.parse import urljoin

    hrefs = html.str.findall(HREF_RE)
    ex = hrefs.explode().dropna()
    base = base_uri.reindex(ex.index)
    resolved = [urljoin(b, h) for b, h in zip(base, ex)]
    return pd.DataFrame({"src_uri": base.to_numpy(),
                         "href": ex.to_numpy(),
                         "resolved": np.array(resolved, dtype=object)})


ANCHOR_RE = re.compile(
    r"""<a\s[^>]*?href\s*=\s*["']([^"'>]+)["'][^>]*>([^<]*)</a>""",
    re.I)


def extract_anchors_frame(html: pd.Series,
                          base_uri: pd.Series) -> pd.DataFrame:
    """(src_uri, resolved, anchor) rows: like
    :func:`extract_links_frame` but keeps each link's ANCHOR TEXT —
    the per-target anchor aggregate is a classic web relevance /
    spam signal (anchors describe the TARGET page, not the source).
    One ``str.findall`` C pass per batch; tag-nested anchor bodies
    are out of scope (``[^<]*``)."""
    from urllib.parse import urljoin

    pairs = html.str.findall(ANCHOR_RE)
    ex = pairs.explode().dropna()
    base = base_uri.reindex(ex.index)
    href = ex.str[0]
    resolved = [urljoin(b, h) for b, h in zip(base, href)]
    return pd.DataFrame({"src_uri": base.to_numpy(),
                         "resolved": np.array(resolved, dtype=object),
                         "anchor": ex.str[1].to_numpy()})


TITLE_RE = re.compile(r"<title[^>]*>([^<]*)</title>", re.I)
META_DESC_RE = re.compile(
    r"""<meta\s[^>]*?name\s*=\s*["']description["'][^>]*?"""
    r"""content\s*=\s*["']([^"']*)["']""", re.I)


def extract_meta_frame(html: pd.Series) -> pd.DataFrame:
    """(title, meta_desc) per page — the head-metadata half of page
    parsing (trafilatura-style): first ``<title>`` body and the
    ``<meta name="description">`` content attribute, both one
    ``str.extract`` C pass; missing fields are empty strings."""
    title = html.str.extract(TITLE_RE, expand=False).fillna("")
    desc = html.str.extract(META_DESC_RE, expand=False).fillna("")
    return pd.DataFrame({"title": title, "meta_desc": desc})


# ---------------------------------------------------------------------------
# Main-content extraction (boilerplate removal)
# ---------------------------------------------------------------------------
# A jusText/readability-style block classifier, reduced to a
# DETERMINISTIC shared spec so the vectorized engine, the per-row
# oracle and a SQL oracle over planted fixtures agree byte-for-byte:
#
#   1. split the HTML on BLOCK-LEVEL tag boundaries,
#   2. per block: strip remaining tags -> collapse whitespace runs to
#      single spaces -> strip ends,
#   3. a block is CONTENT iff it has >= min_words words AND its link
#      density (anchor-text chars / block chars, both pre-collapse
#      anchor len vs post-collapse text len, compared in exact integer
#      arithmetic 100*lc <= pct*len) is at most max_link_pct,
#   4. the page's main content = content blocks joined with "\n".

_BLOCK_TAGS = (r"(?:p|div|td|th|li|ul|ol|table|tr|h[1-6]|section"
               r"|article|header|footer|nav|aside|blockquote|pre"
               r"|br|hr)")
BLOCK_SPLIT_RE = re.compile(rf"</?{_BLOCK_TAGS}\b[^>]*>", re.I)
A_TEXT_RE = re.compile(r"<a\b[^>]*>([^<]*)</a>", re.I)
_TAG_S_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")

MC_MIN_WORDS = 5
MC_MAX_LINK_PCT = 33


def main_content_row(html: str, *, min_words: int = MC_MIN_WORDS,
                     max_link_pct: int = MC_MAX_LINK_PCT) -> str:
    """Per-row reference implementation (oracle) of the spec above."""
    kept = []
    for b in BLOCK_SPLIT_RE.split(html):
        lc = sum(len(t) for t in A_TEXT_RE.findall(b))
        txt = _WS_RE.sub(" ", _TAG_S_RE.sub(" ", b)).strip()
        if (len(txt.split()) >= min_words
                and 100 * lc <= max_link_pct * len(txt)):
            kept.append(txt)
    return "\n".join(kept)


def main_content_frame(html: pd.Series, *,
                       min_words: int = MC_MIN_WORDS,
                       max_link_pct: int = MC_MAX_LINK_PCT) -> pd.Series:
    """Vectorized engine path: split -> explode -> per-block C string
    kernels (findall/join/replace/count) -> groupby(level) re-join.
    Byte-identical to :func:`main_content_row` (pinned in
    tests/test_crawl.py)."""
    ex = html.str.split(BLOCK_SPLIT_RE).explode()
    lc = (ex.str.findall(A_TEXT_RE).str.join("").str.len()
          .fillna(0).astype("int64"))
    txt = (ex.str.replace(_TAG_S_RE, " ", regex=True)
           .str.replace(_WS_RE, " ", regex=True).str.strip()
           .fillna(""))
    # collapsed to single spaces -> words = spaces + 1 when non-empty
    words = txt.str.count(" ") + (txt.str.len() > 0).astype("int64")
    keep = (words >= min_words) & (100 * lc <= max_link_pct
                                   * txt.str.len())
    joined = txt[keep].groupby(level=0).agg("\n".join)
    out = pd.Series(np.full(len(html), "", dtype=object),
                    index=html.index)
    out[joined.index] = joined
    return out
