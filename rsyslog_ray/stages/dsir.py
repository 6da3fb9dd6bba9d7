"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169 — public method).

Select raw-corpus documents whose hashed n-gram distribution looks
like a TARGET corpus: fit two bag-of-hashed-ngrams models (target p,
raw q), weight each raw document by log w = Σ_b c_b(doc)·(log p_b −
log q_b), then Gumbel-top-k resample on log w + g_id.  All three
phases are Ray-Data-shaped:

- **Fit** is one ``map_batches`` pass per corpus: each batch emits ONE
  dense `dim` count partial (np.add.at over its hashed unigrams +
  bigrams); the driver reduce is O(dim) — never O(corpus).
- **Score** broadcasts the (log p − log q) vector once and maps
  batches (same vectorized hashing kernel).
- **Resample** is deterministic: the Gumbel perturbation derives from
  md5(seed:id) — a pure function of the document id, so selection is
  reproducible, coordination-free and shard-resumable (the same
  construction as stages/text.mix_sample); the top-k cut is a
  distributed sort + limit on the perturbed score.

tests/test_dsir.py pins fit+score against a pure-Python spec and
checks planted target-like documents out-rank the rest.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def _ngram_counts_frame(texts, dim: int):
    """(row_idx, bucket_idx, count) triples for a batch: hashed
    lowercase unigrams + adjacent bigrams, bucket = siphash % dim."""
    toks = texts.str.lower().str.split()
    uni = toks.explode().dropna()
    big = (toks.map(lambda t: [f"{a} {b}" for a, b in zip(t, t[1:])]
                    if isinstance(t, list) else [])
           .explode().dropna())
    grams = pd.concat([uni, big])
    if not len(grams):
        return (np.empty(0, np.int64), np.empty(0, np.int64), 0)
    pos = pd.Series(np.arange(len(texts)), index=texts.index)
    rows = pos.reindex(grams.index).to_numpy()
    cols = (pd.util.hash_array(grams.to_numpy(dtype=object))
            % np.uint64(dim)).astype(np.int64)
    return rows, cols, len(texts)


def batch_bucket_counts(texts, dim: int) -> np.ndarray:
    """One batch's dense hashed-ngram count vector (the fit partial
    AND the test-pinned spec unit)."""
    _, cols, _ = _ngram_counts_frame(texts, dim)
    out = np.zeros(dim, dtype=np.int64)
    np.add.at(out, cols, 1)
    return out


def fit_hashed_ngrams(ds, *, text_col: str = "text",
                      dim: int = 1 << 13) -> np.ndarray:
    """Corpus bucket-count vector via one streaming pass of dense
    partials; driver memory O(dim)."""
    def part(df: pd.DataFrame) -> pd.DataFrame:
        c = batch_bucket_counts(df[text_col], dim)
        return pd.DataFrame({"c": [c.tobytes()]})

    parts = ds.map_batches(part, batch_format="pandas").to_pandas()
    out = np.zeros(dim, dtype=np.int64)
    for buf in parts["c"]:
        out += np.frombuffer(buf, dtype=np.int64)
    return out


def log_ratio(target_counts: np.ndarray, raw_counts: np.ndarray,
              smoothing: float = 1.0) -> np.ndarray:
    """log p − log q with add-``smoothing`` estimates (the DSIR
    importance-weight table; broadcast once for scoring)."""
    dim = len(target_counts)
    p = (target_counts + smoothing) / (target_counts.sum()
                                       + smoothing * dim)
    q = (raw_counts + smoothing) / (raw_counts.sum() + smoothing * dim)
    return np.log(p) - np.log(q)


def batch_log_weights(texts, lr: np.ndarray, dim: int) -> np.ndarray:
    """Per-document log importance weight for one batch."""
    rows, cols, n = _ngram_counts_frame(texts, dim)
    w = np.zeros(n, dtype=np.float64)
    np.add.at(w, rows, lr[cols])
    return w


def gumbel_keys(ids, seed: int = 0) -> np.ndarray:
    """Deterministic per-id Gumbel(0,1) draw: u = md5('{seed}:{id}')
    mapped to (0,1), g = −log(−log u).  Pure function of the id —
    reproducible across runs and cluster sizes."""
    out = np.empty(len(ids), dtype=np.float64)
    for i, d in enumerate(ids):
        h = hashlib.md5(f"{seed}:{d}".encode()).digest()
        u = (int.from_bytes(h[:8], "big") + 0.5) / 2.0**64
        out[i] = -np.log(-np.log(u))
    return out


def dsir_scores(raw_ds, target_ds, *, id_col: str = "doc_id",
                text_col: str = "text", dim: int = 1 << 13,
                smoothing: float = 1.0, seed: int = 0):
    """-> (id, log_w, sel_key) per raw document; sel_key = log_w +
    deterministic Gumbel — Gumbel-top-k on sel_key IS sampling without
    replacement ∝ w (the DSIR resampling rule)."""
    import ray

    lr = log_ratio(fit_hashed_ngrams(target_ds, text_col=text_col,
                                     dim=dim),
                   fit_hashed_ngrams(raw_ds, text_col=text_col, dim=dim),
                   smoothing)
    ref = ray.put(lr)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        w = batch_log_weights(df[text_col], ray.get(ref), dim)
        ids = df[id_col].to_numpy()
        return pd.DataFrame({id_col: ids, "log_w": w,
                             "sel_key": w + gumbel_keys(ids, seed)})

    return raw_ds.map_batches(score, batch_format="pandas")


def dsir_select(raw_ds, target_ds, n_keep: int, **kw):
    """Top-``n_keep`` raw documents by perturbed score: distributed
    sort descending + limit (the one all-to-all this op needs)."""
    scored = dsir_scores(raw_ds, target_ds, **kw)
    return scored.sort("sel_key", descending=True).limit(n_keep)
