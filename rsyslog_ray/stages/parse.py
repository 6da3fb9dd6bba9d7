"""Parse stage — the flagship hot path.

Combines the reference's parser chain (runtime/parser.c:613-693),
liblognorm field extraction (plugins/mmnormalize/mmnormalize.c) and
sanitization (runtime/parser.c:330, plugins/mmutf8fix) into ONE
vectorized ``map_batches`` stage:

  pages(url, warc_ts, html, text, lang, shard)
    -> + parsed fields (p_ts, p_host, p_app, p_sev, p_msg, p_status,
         p_bytes, rule, parse_ok)
    -> + extracted (sanitized text pulled out of the html payload)
    -> html column DROPPED (the wide binary payload must not travel
       further down the pipeline — SURVEY.md §7 hard part 5)

Implemented as a callable class so the compiled rulebase + extraction
regexes are built once per actor (``__init__``), not once per batch —
the reference does the same with per-worker cloned liblognorm contexts
(mmnormalize.c:215-242 "turbo").
"""

from __future__ import annotations

import re

import pandas as pd
import pyarrow as pa

from ..rulebase import PAGES_RULEBASE, Rulebase
from ..sanitize import sanitize_bytes, sanitize_series

TITLE_RE = re.compile(r"<title>(.*?)</title>")
PARA_RE = re.compile(r"<p>(.*?)</p>")


def extract_text_row(html: bytes) -> str:
    """Per-row reference implementation (oracle): sanitize then extract
    title + paragraph text. Shared spec with the vectorized path so the
    result is byte-identical per url."""
    s = sanitize_bytes(html)
    m = TITLE_RE.search(s)
    title = m.group(1) if m else ""
    paras = PARA_RE.findall(s)
    return title + "\n" + "\n".join(paras)


def extract_text_frame(html: pd.Series) -> pd.Series:
    """Vectorized extraction over a batch (engine path)."""
    s = sanitize_series(html)
    title = s.str.extract(TITLE_RE, expand=False).fillna("")
    paras = s.str.findall(PARA_RE).str.join("\n")
    return title + "\n" + paras


class ParseStage:
    """Callable class for ``map_batches(ParseStage, batch_format="pandas",
    concurrency=N)``. Also usable as a plain function via
    ``ParseStage(rulebase)(batch)`` in stateless-task mode."""

    def __init__(self, rulebase: Rulebase | None = None, keep_html: bool = False):
        self.rulebase = rulebase or PAGES_RULEBASE
        self.keep_html = keep_html

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        parsed = self.rulebase.parse_frame(batch["text"])
        out = pd.concat([batch.reset_index(drop=True),
                         parsed.reset_index(drop=True)], axis=1)
        out["extracted"] = extract_text_frame(batch["html"]).reset_index(drop=True)
        if not self.keep_html:
            out = out.drop(columns=["html"])
        return out


def parse_pages(ds, concurrency=None, batch_size: int = 2048):
    """Attach the parse stage to a pages Dataset.

    ``concurrency=None`` -> stateless tasks (rulebase pickled once per
    task, compiled on deserialize); an int -> actor pool (compile once
    per actor). Tasks are the default: the rulebase is tiny and tasks
    schedule more elastically.
    """
    if concurrency is None:
        # plain callable instance -> stateless Ray tasks
        return ds.map_batches(ParseStage(), batch_format="pandas",
                              batch_size=batch_size)
    return ds.map_batches(ParseStage, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
