"""Model-based quality classification — hashed-feature logistic
regression trained with distributed gradient partials.

The GPT-3/LLaMA-style corpus step the heuristics in stages/text.py
feed into: train a linear classifier to separate a high-quality
reference slice from the crawl, then score every document and keep by
threshold (Brown et al. 2020 §A; CCNet uses the same shape with a
fasttext model).  fasttext itself is a hashed-bag-of-words linear
model — exactly what this implements, with the training loop expressed
Ray-Data-first:

- **Features** are hashed token counts (feature hashing; Weinberger et
  al. 2009) scaled 1/n_tokens — no vocabulary build pass, no state.
- **Training** is full-batch gradient descent: per iteration the
  weight vector broadcasts once (``ray.put``), every batch emits ONE
  dense (dim+1) gradient partial (np.add.at over its token
  occurrences — vectorized, no per-row Python), and the driver reduce
  is O(dim) — never O(corpus).  Partials carry a min-id order key and
  sum in sorted order, so training is bit-deterministic run-to-run.
- **Scoring** broadcasts the trained vector and maps batches.

tests/test_classify.py pins the batch gradient against a dense-matrix
numpy spec, trains on a two-vocabulary synthetic corpus to >= 0.95
holdout accuracy, and checks distributed == single-node training.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_BIAS = -1  # weight vector layout: w[:dim] features, w[dim] bias


def _occurrences(texts, dim: int):
    """(row_idx, col_idx, val, n_rows) token-occurrence triples for a
    batch: col = siphash(token) % dim, val = 1/n_tokens(row)."""
    toks = texts.str.lower().str.split()
    n_tok = toks.str.len().clip(lower=1).to_numpy()
    e = toks.explode().dropna()
    if not len(e):
        return (np.empty(0, np.int64), np.empty(0, np.int64),
                np.empty(0, np.float64), len(texts))
    pos = pd.Series(np.arange(len(texts)), index=texts.index)
    rows = pos.reindex(e.index).to_numpy()
    cols = (pd.util.hash_array(e.to_numpy(dtype=object))
            % np.uint64(dim)).astype(np.int64)
    vals = 1.0 / n_tok[rows]
    return rows, cols, vals, len(texts)


def _grad_from_occ(rows, cols, vals, y, n, w: np.ndarray,
                   dim: int) -> tuple:
    """(gradient, loss_sum) from one batch's occurrence triples — the
    shared kernel of batch_gradient and the packed training path."""
    m = np.full(n, w[_BIAS], dtype=np.float64)
    np.add.at(m, rows, w[cols] * vals)
    p = 1.0 / (1.0 + np.exp(-m))
    resid = p - y
    g = np.zeros(dim + 1, dtype=np.float64)
    np.add.at(g, cols, resid[rows] * vals)
    g[_BIAS] += resid.sum()
    loss = float(np.sum(
        np.logaddexp(0.0, m) - y * m))  # -log lik, numerically stable
    return g, loss


def batch_margin(texts, w: np.ndarray, dim: int) -> np.ndarray:
    rows, cols, vals, n = _occurrences(texts, dim)
    m = np.full(n, w[_BIAS], dtype=np.float64)
    np.add.at(m, rows, w[cols] * vals)
    return m


def batch_gradient(texts, y: np.ndarray, w: np.ndarray,
                   dim: int) -> tuple:
    """(gradient, loss_sum, n) of logistic loss for one batch —
    the distributed partial AND the test-pinned spec unit."""
    rows, cols, vals, n = _occurrences(texts, dim)
    g, loss = _grad_from_occ(rows, cols, vals, y, n, w, dim)
    return g, loss, n


def featurize(ds, *, label_col: str, text_col: str = "text",
              id_col: str = "doc_id", dim: int = 1 << 15):
    """Tokenize + hash ONCE: each input batch becomes one packed row
    of occurrence triples (bytes) + labels.  The materialized feature
    set is what the gradient loop iterates over — the corpus text is
    read exactly once no matter how many training iterations run, and
    the features are far smaller than the text they replace."""
    def pack(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"key": pd.Series([], dtype="int64"),
                                 "rows": pd.Series([], dtype=object),
                                 "cols": pd.Series([], dtype=object),
                                 "vals": pd.Series([], dtype=object),
                                 "y": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        rows, cols, vals, n = _occurrences(df[text_col], dim)
        return pd.DataFrame({
            "key": [int(df[id_col].min())],
            "rows": [rows.tobytes()], "cols": [cols.tobytes()],
            "vals": [vals.tobytes()],
            "y": [df[label_col].to_numpy(np.float64).tobytes()],
            "n": [n]})

    return ds.map_batches(pack, batch_format="pandas").materialize()


def _unpack_feature_shard(df: pd.DataFrame) -> list:
    """Shard init: packed rows -> list of occurrence-triple tuples
    (runs INSIDE the shard actor; sorted by key so the within-shard
    sum order is independent of block arrival order)."""
    out = []
    for _, r in df.sort_values("key").iterrows():
        out.append((np.frombuffer(r["rows"], dtype=np.int64),
                    np.frombuffer(r["cols"], dtype=np.int64),
                    np.frombuffer(r["vals"], dtype=np.float64),
                    np.frombuffer(r["y"], dtype=np.float64),
                    int(r["n"])))
    return out


def _shard_gradient(state: list, w: np.ndarray, dim: int) -> tuple:
    """One shard's (gradient, loss_sum, n) for the current weights."""
    g = np.zeros(dim + 1, dtype=np.float64)
    loss, n = 0.0, 0
    for rows, cols, vals, y, nb in state:
        gb, lb = _grad_from_occ(rows, cols, vals, y, nb, w, dim)
        g += gb
        loss += lb
        n += nb
    return g, loss, n


def _load_checkpoint(path: str, dim: int):
    """(w, losses) from the newest complete checkpoint, else None."""
    import json
    import os

    if path is None or not os.path.exists(path):
        return None
    with open(path) as fh:
        st = json.load(fh)
    if st.get("dim") != dim:
        return None
    w = np.frombuffer(bytes.fromhex(st["w"]), dtype=np.float64).copy()
    return w, list(st["losses"])


def _save_checkpoint(path: str, w: np.ndarray, losses: list,
                     dim: int) -> None:
    """Atomic (tmp+rename) checkpoint after a completed iteration —
    same durability discipline as the sink lineage manifest."""
    import json
    import os

    tmp = f"{path}.tmp"
    with open(tmp, "w") as fh:
        json.dump({"dim": dim, "w": w.tobytes().hex(),
                   "losses": losses}, fh)
        fh.flush()
    os.replace(tmp, path)


def train_text_classifier(ds, *, label_col: str, text_col: str = "text",
                          id_col: str = "doc_id", dim: int = 1 << 15,
                          iters: int = 30, lr: float = 2.0,
                          l2: float = 1e-6, shards: int | None = None,
                          checkpoint_path: str | None = None):
    """Fit w over the corpus; returns (w, per-iteration mean losses).

    One featurize pass, then the packed features load ONCE into
    actor-resident shards (state/sharded.py) and every iteration is a
    broadcast `ray.put` of w + one O(dim) gradient partial per shard,
    reduced on the driver in shard order — per-iteration overhead is
    milliseconds, the corpus is never re-read, and the reduce order is
    fixed, so training is bit-deterministic run-to-run.

    ``checkpoint_path``: after every iteration the weights are written
    atomically (tmp+rename, like the sink lineage manifest); a killed
    run re-invoked with the same path resumes at its last completed
    iteration and converges to the BIT-IDENTICAL final w (pinned in
    tests/test_classify.py)."""
    import ray

    from ..state.sharded import ShardedCorpus

    w = np.zeros(dim + 1, dtype=np.float64)
    losses: list = []
    if checkpoint_path is not None:
        st = _load_checkpoint(checkpoint_path, dim)
        if st is not None:
            w, losses = st
            if len(losses) >= iters:
                return w, losses[:iters]

    feats = featurize(ds, label_col=label_col, text_col=text_col,
                      id_col=id_col, dim=dim)
    corpus = ShardedCorpus(feats, shards=shards,
                           init_fn=_unpack_feature_shard)
    try:
        for _ in range(len(losses), iters):
            ref = ray.put(w)
            outs = corpus.map(_shard_gradient, ref, dim)
            g = np.zeros(dim + 1, dtype=np.float64)
            loss, n = 0.0, 0
            for gb, lb, nb in outs:
                g += gb
                loss += lb
                n += nb
            losses.append(loss / max(n, 1))
            w = w - lr * (g / max(n, 1) + l2 * w)
            if checkpoint_path is not None:
                _save_checkpoint(checkpoint_path, w, losses, dim)
    finally:
        corpus.shutdown()
    return w, losses


def classifier_scores(ds, w: np.ndarray, *, text_col: str = "text",
                      id_col: str = "doc_id", dim: int = 1 << 15):
    """-> (id, score, prob) per document; w broadcast once."""
    import ray

    ref = ray.put(np.asarray(w, dtype=np.float64))

    def score(df: pd.DataFrame) -> pd.DataFrame:
        m = batch_margin(df[text_col], ray.get(ref), dim)
        return pd.DataFrame({id_col: df[id_col].to_numpy(),
                             "score": m,
                             "prob": 1.0 / (1.0 + np.exp(-m))})

    return ds.map_batches(score, batch_format="pandas")
