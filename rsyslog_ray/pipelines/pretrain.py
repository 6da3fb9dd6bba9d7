"""End-to-end pretraining-corpus pipeline — raw documents to packed
LM training rows, the full recipe public web-corpus pipelines run
(CCNet/C4/Gopher-style), composed from the engine's already-tested
operators with a parquet resume point after every stage (the same
`_run_stage` atomic-rename contract as pipelines/curation.py — a
killed run resumes from the last completed stage):

  1. curation/            gate -> exact dedup -> near-dup clusters ->
                          one survivor per duplicate cluster
                          (pipelines/curation.run_curation)
  2. decon/               benchmark decontamination: drop docs sharing
                          any word 13-gram with the eval set
                          (broadcast hash set, one pass, no shuffle)
  3. mixed/               PII redaction + deterministic source mixing
                          FUSED into one pass (rewrite text, then keep
                          iff u32(md5(id)) < weight * 2^32)
  4. shuffled/            deterministic epoch shuffle (md5 seed:id key,
                          range-partitioned sort — the one all-to-all
                          this recipe needs; the key column persists so
                          the order is re-derivable)
  5. packed/              per-shard sequence packing into fixed-length
                          LM rows (EOD separators, final-row padding),
                          packed in SHUFFLE order within each block.
                          NOTE: the token STREAM is deterministic, but
                          block boundaries (hence per-block final-row
                          padding and the exact packed-row count) may
                          differ between runs — per-shard packing is
                          the 100 TB contract (a global pack would
                          serialize the corpus through one worker);
                          the boundary-independent invariant is total
                          non-pad tokens

plus `_pretrain_stats.json` with the full funnel.  Nothing
corpus-sized touches the driver at any stage.
"""

from __future__ import annotations

import json
import os

import pandas as pd

from .curation import (_run_stage, _write_parquet_typed,
                       run_curation)


def run_pretrain(docs_path: str, out_dir: str, *,
                 benchmark_texts=(), weights: dict | None = None,
                 default_weight: float = 1.0, seed: int = 0,
                 seq_len: int = 128, ngram: int = 13,
                 curation_kwargs: dict | None = None,
                 pack_buckets: int = 16,
                 fused: bool = False) -> dict:
    """Run the full recipe; returns (and writes) the funnel stats.
    Ray must already be initialised by the caller.

    ``fused=True`` swaps every parquet resume point for an object-store
    ``materialize()`` (see :func:`run_curation`): same funnel semantics,
    no disk round-trips, no
    stage-level resume.  Toy-scale / bench opt-in only."""
    import pyarrow as pa
    import ray
    import ray.data

    from ..stages.text import (decontaminate, mix_sample, pack_sequences,
                               pii_redact_array)

    os.makedirs(out_dir, exist_ok=True)
    stats: dict = {}

    # ---- stage 1: curation (its own stage-level resume points inside)
    cur, curated_ds = run_curation(
        docs_path, os.path.join(out_dir, "curation"), fused=fused,
        _return_ds=True, **(curation_kwargs or {}))
    stats.update({f"curation.{k}": v for k, v in cur.items()})

    # ---- stage 2: benchmark decontamination — the tested operator
    # (stages/text.decontaminate: broadcast n-gram set, one pass,
    # rows with any hit drop; GPT-3 appendix-C shape)
    decon_path = os.path.join(out_dir, "decon")
    if fused:
        decon_ds = decontaminate(curated_ds, benchmark_texts,
                                 n=ngram).materialize()
    else:
        _run_stage(decon_path, lambda tmp: _write_parquet_typed(
            decontaminate(curated_ds, benchmark_texts, n=ngram), tmp))
        decon_ds = ray.data.read_parquet(decon_path)
    stats["after_decontamination"] = decon_ds.count()

    # ---- stage 3: PII redaction + source mixing, fused into ONE pass
    # (both are per-row and independent — two stages would read the
    # corpus twice)
    def scrub(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["text"] = (pii_redact_array(pa.array(df["text"], pa.string()))
                       .to_pandas().to_numpy())
        return out

    mixed_path = os.path.join(out_dir, "mixed")
    if fused:
        mixed = mix_sample(
            decon_ds.map_batches(scrub, batch_format="pandas"),
            weights or {}, default=default_weight).materialize()
    else:
        _run_stage(mixed_path, lambda tmp: _write_parquet_typed(
            mix_sample(decon_ds.map_batches(scrub,
                                            batch_format="pandas"),
                       weights or {}, default=default_weight), tmp))
        mixed = ray.data.read_parquet(mixed_path)
    stats["after_mixing"] = mixed.count()

    # ---- stage 4: deterministic epoch shuffle (the recipe's one
    # all-to-all); the skey column persists into the parquet so any
    # consumer can verify / re-establish the order
    from ..stages.text import epoch_shuffle

    shuf_path = os.path.join(out_dir, "shuffled")
    if fused:
        shuffled = epoch_shuffle(mixed, seed=seed).materialize()
    else:
        _run_stage(shuf_path, lambda tmp: _write_parquet_typed(
            epoch_shuffle(mixed, seed=seed), tmp))
        shuffled = ray.data.read_parquet(shuf_path)

    # ---- stage 5: pack to fixed-length LM rows, DETERMINISTICALLY:
    # rows hash-bucket by the shuffle key and each bucket packs in
    # skey (epoch) order — same data + seed + pack_buckets gives
    # byte-identical packed rows at any partitioning or cluster size
    # (pack_buckets=0 restores the shuffle-free per-block packing)
    packed_path = os.path.join(out_dir, "packed")
    if fused:
        packed = pack_sequences(shuffled, seq_len, id_col="skey",
                                buckets=pack_buckets).materialize()
    else:
        _run_stage(packed_path, lambda tmp: _write_parquet_typed(
            pack_sequences(shuffled, seq_len, id_col="skey",
                           buckets=pack_buckets), tmp,
            {"seq": pa.list_(pa.int64(), seq_len),
             "n_docs": pa.int64(),
             "n_pad": pa.int32()}))
        packed = ray.data.read_parquet(packed_path, columns=["n_pad"])

    # funnel stats over the packed output: a column-pruned DISTRIBUTED
    # combiner pass (per-batch (rows, pads) partials; driver reduce is
    # O(n_batches)) — a driver loop reading every packed file serially
    # would be O(total packed rows) driver work at 100 TB
    def _pack_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [len(df)],
                             "pads": [int(df["n_pad"].sum())]})

    agg = (packed.select_columns(["n_pad"])
           .map_batches(_pack_partial, batch_format="pandas").to_pandas())
    # an empty packed output yields zero partial batches (column-less
    # frame) — the funnel is simply zero
    rows = int(agg["rows"].sum()) if "rows" in agg.columns else 0
    pads = int(agg["pads"].sum()) if "pads" in agg.columns else 0
    stats["packed_rows"] = rows
    stats["packed_tokens"] = rows * seq_len
    stats["pad_tokens"] = pads
    stats["packing_efficiency_pct"] = round(
        100.0 * (1 - pads / max(rows * seq_len, 1)), 2)

    tmp = os.path.join(out_dir, "_pretrain_stats.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(stats, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, "_pretrain_stats.json"))
    return stats
