"""Training-data curation pipeline — the composed LLM-corpus showpiece.

Chains the engine's training-data operators into ONE streaming job
over a documents table, the shape a 100 TB curation run takes:

  read documents parquet
    -> quality + language features      (one vectorized map_batches)
    -> quality gate                     (token count / stopword ratio)
    -> exact dedup                      (content-hash groupby, keep min id)
    -> near-dup removal                 (MinHash-LSH pairs; greedy keep
                                         the smaller id of every pair)
    -> curated parquet + per-stage stats json

Every stage is the already-tested operator (stages/text.py,
stages/dedup.py); this module is the composition plus the survivor
join: near-dup DROP ids broadcast as a set (pair count scales with
duplicate density, not corpus size — same assumption as
minhash_lsh_pairs' verify gather).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd


def run_curation(docs_path: str, out_dir: str, *,
                 min_tokens: int = 3, max_tokens: int = 100_000,
                 max_stop_ratio: float = 0.9,
                 langs: tuple | None = None,
                 neardup_threshold: float = 0.8) -> dict:
    """Run the curation pipeline; returns the per-stage stats dict
    (also written to ``out_dir/_curation_stats.json``).  Ray must
    already be initialised by the caller."""
    import ray
    import ray.data

    from ..stages.dedup import minhash_lsh_pairs
    from ..stages.text import lang_id_frame, quality_frame

    os.makedirs(out_dir, exist_ok=True)
    stats: dict = {}

    ds = ray.data.read_parquet(docs_path)
    stats["docs_in"] = ds.count()

    # ---- stage 1: features + quality/language gate (fused, vectorized)
    def gate(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_frame(df)
        pred_lang = lang_id_frame(df["text"])
        keep = ((q["n_tokens"] >= min_tokens)
                & (q["n_tokens"] <= max_tokens)
                & (q["n_stop"] <= max_stop_ratio * q["n_tokens"].clip(lower=1)))
        if langs is not None:
            keep &= pred_lang.isin(langs)
        out = df[keep].copy()
        out["n_tokens"] = q["n_tokens"][keep]
        out["pred_lang"] = pred_lang[keep]
        return out

    gated = ds.map_batches(gate, batch_format="pandas")

    # ---- stage 2: exact dedup — hash-partition on the content hash,
    # keep the minimum doc_id of every identical-text group (the
    # shuffle moves (hash, row), never compares text across groups)
    def add_hash(df: pd.DataFrame) -> pd.DataFrame:
        h = pd.util.hash_array(df["text"].to_numpy(object)).astype("int64")
        return df.assign(__th=h)

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        return (g.sort_values("doc_id").head(1)
                .drop(columns="__th"))

    exact = (gated.map_batches(add_hash, batch_format="pandas")
             .groupby("__th").map_groups(keep_min, batch_format="pandas")
             .materialize())
    stats["after_quality_gate"] = gated.count()
    stats["after_exact_dedup"] = exact.count()

    # ---- stage 3: near-dup removal — LSH pairs, greedy survivor rule:
    # drop every id that appears as the LARGER member of a pair (keeps
    # exactly one representative per duplicate cluster reachable by
    # pairwise links ordered by id)
    pairs = minhash_lsh_pairs(exact, "doc_id", "text",
                              threshold=neardup_threshold)
    drop_ids = frozenset(np.unique(pairs["id_b"]).tolist()) if len(pairs) \
        else frozenset()
    stats["neardup_pairs"] = int(len(pairs))
    stats["neardup_dropped"] = len(drop_ids)
    ref = ray.put(drop_ids)

    def survivors(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df["doc_id"].isin(ray.get(ref))]

    curated = exact.map_batches(survivors, batch_format="pandas")
    curated.write_parquet(os.path.join(out_dir, "curated"))

    out_files = sorted(os.listdir(os.path.join(out_dir, "curated")))
    import pyarrow.parquet as pq
    stats["docs_out"] = sum(
        pq.ParquetFile(os.path.join(out_dir, "curated", f)).metadata.num_rows
        for f in out_files if f.endswith(".parquet"))
    tmp = os.path.join(out_dir, "_curation_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_curation_stats.json"))
    return stats
