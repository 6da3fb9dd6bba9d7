"""Crawl-ingestion pipeline — raw web archives to gated text.

The front half a 100 TB webtext corpus build runs before curation
(pipelines/curation.py picks up where this stops):

  .warc / .warc.gz archives           (sources/warc.py read_warc)
    -> response-record filter         (HTTP 200, non-truncated)
    -> charset sniff + decode         (stages/text.sniff_decode_row)
    -> tag-strip + sanitize           (stages/parse.extract_text_frame
                                       — the flagship's shared spec)
    -> language ID + quality features (stages/text.lang_id_full_frame,
                                       quality_frame)
    -> records/ PARQUET               (stage resume point)
    -> quality + language gate        -> gated/ PARQUET
    -> _crawl_stats.json              (funnel + charset/lang counts)

100-TB discipline: each stage is a parquet resume point (the
curation `_run_stage` contract — atomic rename, torn runs rebuild
only the in-progress stage); per-archive parallelism comes from the
read (one block per .warc file); nothing corpus-sized touches the
driver (stats are two_phase_agg combiner partials).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa

from .curation import _run_stage, _write_parquet_typed


def documents_to_warc(docs_path: str, warc_dir: str, *,
                      block_rows: int = 200,
                      links: bool = False, n_docs: int = 0,
                      anchors: bool = False,
                      meta: bool = False) -> str:
    """Deterministic fixture corpus: every document HTML-wrapped and
    charset-mixed by doc_id%4 (utf-8 / utf-16 BOM-LE / cp1252 /
    utf-8-sig) into member-per-record .warc.gz files — the
    north-rule's synthesize-at-small-scale input, exercising the
    decode matrix end-to-end.  Idempotent (skips when the marker
    exists).  ``links=True`` plants two empty-anchor outlinks per doc
    by the DETERMINISTIC rule i -> (i*7+1) % n_docs and (i+1) %
    n_docs (relative hrefs; anchor text empty so extraction output is
    unchanged) — the link-graph oracle in q:link_graph reproduces the
    same rule in SQL.  ``anchors=True`` additionally labels the two
    planted links 'w{i}' / 'x{i}' so per-target anchor-text
    aggregation (q:anchor_text) has a SQL-reproducible ground truth
    (changes extracted text — use a dedicated scratch dir).
    ``meta=True`` plants a deterministic ``<meta name="description">``
    head tag (q:page_meta; head tags strip to nothing so extracted
    text is unchanged)."""
    import ray

    from ..sources.warc import build_warc

    marker = os.path.join(warc_dir, "_complete")
    if os.path.exists(marker):
        return warc_dir
    os.makedirs(warc_dir, exist_ok=True)
    codecs = {0: "utf-8", 1: "utf-16", 2: "cp1252", 3: "utf-8-sig"}

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        recs = []
        for i, t, lang in zip(df["doc_id"], df["text"], df["lang"]):
            anchor_html = ""
            if links and n_docs:
                a, b = (int(i) * 7 + 1) % n_docs, (int(i) + 1) % n_docs
                ta = f"w{int(i)}" if anchors else ""
                tb = f"x{int(i)}" if anchors else ""
                anchor_html = (f'<a href="/doc/{a}">{ta}</a>'
                               f'<a href="/doc/{b}">{tb}</a>')
            meta_html = ""
            if meta:
                meta_html = (f'<meta name="description" content='
                             f'"summary of document {i} in {lang}">')
            html = (f"<html><head><title>doc {i}</title>{meta_html}"
                    f"</head>"
                    f"<body><p>{t}</p>{anchor_html}</body></html>")
            body = html.encode(codecs[int(i) % 4])
            recs.append({
                "headers": {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:doc:{i}>",
                    "WARC-Date": "2025-01-01T00:00:00Z",
                    "WARC-Target-URI": f"http://corpus/{lang}/{i}",
                    "Content-Type": "application/http; msgtype=response"},
                "block": (b"HTTP/1.1 200 OK\r\n"
                          b"Content-Type: text/html\r\n\r\n" + body)})
        lo = int(df["doc_id"].min())
        path = os.path.join(warc_dir, f"crawl-{lo:08d}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(build_warc(recs, gzip_members=True))
        os.replace(tmp, path)
        return pd.DataFrame({"path": [path]})

    (ray.data.read_parquet(docs_path,
                           columns=["doc_id", "text", "lang"])
     .map_batches(write_block, batch_format="pandas",
                  batch_size=block_rows).materialize())
    with open(marker, "w") as fh:
        fh.write("ok")
    return warc_dir


# stage schema for empty-safe commits (_write_parquet_typed): a crawl
# whose filter/gate removes EVERY record must still leave readable
# stage dirs (Ray's parquet sink writes nothing for empty blocks)
_RECORD_COLS = {"uri": pa.string(), "charset": pa.string(),
                "text": pa.string(), "n_tokens": pa.int64(),
                "n_stop": pa.int64(), "pred_lang": pa.string()}


def run_crawl_ingest(warc_dir: str, out_dir: str, *,
                     min_tokens: int = 3,
                     max_stop_ratio: float = 0.9,
                     langs: tuple | None = None) -> dict:
    """Run the ingestion; returns the funnel stats dict (also written
    to ``out_dir/_crawl_stats.json``).  Ray must already be
    initialised (library code never owns the session)."""
    import ray

    from ..sources.warc import read_warc
    from ..stages.parse import extract_text_frame
    from ..stages.text import (lang_id_full_frame, quality_frame,
                               sniff_decode_row)

    os.makedirs(out_dir, exist_ok=True)
    records_path = os.path.join(out_dir, "records")
    gated_path = os.path.join(out_dir, "gated")

    def build_records(tmp: str) -> None:
        ds = read_warc(warc_dir + "/")

        def decode(df: pd.DataFrame) -> pd.DataFrame:
            ok = ((df["warc_type"] == "response")
                  & (df["http_status"] == 200) & ~df["truncated"])
            df = df[ok]
            pairs = df["payload"].map(
                lambda b: sniff_decode_row(bytes(b)))
            html = pairs.str[0]
            text = extract_text_frame(
                html.map(lambda s: s.encode("utf-8")))
            out = pd.DataFrame({
                "uri": df["target_uri"].to_numpy(),
                "charset": pairs.str[1].to_numpy(),
                "text": np.asarray(text, dtype=object)})
            q = quality_frame(out, "text")
            out["n_tokens"] = q["n_tokens"]
            out["n_stop"] = q["n_stop"]
            out["pred_lang"] = lang_id_full_frame(out["text"])
            return out

        _write_parquet_typed(
            ds.map_batches(decode, batch_format="pandas"), tmp,
            _RECORD_COLS)

    _run_stage(records_path, build_records)

    def build_gated(tmp: str) -> None:
        rec = ray.data.read_parquet(records_path)

        def gate(df: pd.DataFrame) -> pd.DataFrame:
            keep = df["n_tokens"] >= min_tokens
            with np.errstate(invalid="ignore"):
                ratio = df["n_stop"] / df["n_tokens"].clip(lower=1)
            keep &= ratio <= max_stop_ratio
            if langs is not None:
                keep &= df["pred_lang"].isin(langs)
            return df[keep]

        _write_parquet_typed(
            rec.map_batches(gate, batch_format="pandas"), tmp,
            _RECORD_COLS)

    _run_stage(gated_path, build_gated)

    from ..stages.aggregate import two_phase_agg

    rec = ray.data.read_parquet(records_path,
                                columns=["charset", "pred_lang"])
    by_charset = two_phase_agg(rec, ["charset"])
    n_records = int(by_charset["cnt"].sum())
    gat = ray.data.read_parquet(gated_path, columns=["pred_lang"])
    by_lang = two_phase_agg(gat, ["pred_lang"])
    stats = {
        "n_records": n_records,
        "n_gated": int(by_lang["cnt"].sum()),
        "by_charset": dict(zip(by_charset["charset"],
                               by_charset["cnt"].astype(int))),
        "gated_by_lang": dict(zip(by_lang["pred_lang"],
                                  by_lang["cnt"].astype(int))),
    }
    tmp = os.path.join(out_dir, "_crawl_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_crawl_stats.json"))
    return stats


def run_web_pretrain(warc_dir: str, out_dir: str, *,
                     benchmark_texts=(), weights: dict | None = None,
                     default_weight: float = 1.0, seed: int = 0,
                     seq_len: int = 128,
                     ingest_kwargs: dict | None = None,
                     curation_kwargs: dict | None = None,
                     fused: bool = False) -> dict:
    """The FULL web-corpus recipe, raw archives to packed LM rows:

      .warc.gz  -> run_crawl_ingest   (decode, extract, gate)
                -> docs/ adapter      (gated rows -> documents schema:
                                       doc_id from the URI tail, lang =
                                       predicted, source = 'crawl')
                -> run_pretrain       (curation dedup -> decontaminate
                                       -> redact+mix -> shuffle -> pack)

    i.e. pipelines/crawl.py's front half feeding pipelines/pretrain.py's
    back half, with every stage boundary a parquet resume point (the
    shared `_run_stage` atomic-rename contract — a SIGKILL anywhere
    resumes from the last completed stage).  Returns the merged funnel
    (crawl_* scalars + the pretrain stats), also written to
    ``out_dir/_web_stats.json``.  Ray must already be initialised."""
    import ray

    from .pretrain import run_pretrain

    os.makedirs(out_dir, exist_ok=True)
    crawl_out = os.path.join(out_dir, "ingest")
    cstats = run_crawl_ingest(warc_dir, crawl_out,
                              **(ingest_kwargs or {}))

    docs_path = os.path.join(out_dir, "docs")

    def build_docs(tmp: str) -> None:
        g = ray.data.read_parquet(os.path.join(crawl_out, "gated"))

        def adapt(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "doc_id": (df["uri"].str.rsplit("/", n=1).str[-1]
                           .astype("int64")),
                "text": df["text"].to_numpy(),
                "lang": df["pred_lang"].to_numpy(),
                "source": np.repeat("crawl", len(df))})

        _write_parquet_typed(
            g.map_batches(adapt, batch_format="pandas"), tmp,
            {"doc_id": pa.int64(), "text": pa.string(),
             "lang": pa.string(), "source": pa.string()})

    _run_stage(docs_path, build_docs)

    pstats = run_pretrain(docs_path, os.path.join(out_dir, "pretrain"),
                          benchmark_texts=benchmark_texts,
                          weights=weights,
                          default_weight=default_weight, seed=seed,
                          seq_len=seq_len,
                          curation_kwargs=curation_kwargs,
                          fused=fused)
    merged = {f"crawl_{k}": v for k, v in cstats.items()
              if isinstance(v, (int, float))}
    merged.update(pstats)
    tmp = os.path.join(out_dir, "_web_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(merged, fh, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(out_dir, "_web_stats.json"))
    return merged
