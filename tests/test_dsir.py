"""DSIR importance resampling vs pure-Python spec."""

import hashlib
import math
import random

import numpy as np
import pandas as pd
import pytest

from rsyslog_ray.stages import dsir

DIM = 1 << 10


def _spec_counts(texts, dim):
    out = np.zeros(dim, dtype=np.int64)
    for t in texts:
        toks = t.lower().split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            b = int(pd.util.hash_array(np.array([g], dtype=object))[0]
                    % np.uint64(dim))
            out[b] += 1
    return out


def test_bucket_counts_match_spec():
    texts = pd.Series(["The cat sat", "dog", "", "a b a b"])
    got = dsir.batch_bucket_counts(texts, DIM)
    assert np.array_equal(got, _spec_counts(texts, DIM))
    # unigrams + bigrams: 3+2 + 1+0 + 0 + 4+3 = 13 grams total
    assert got.sum() == 13


def test_log_weights_match_spec():
    texts = pd.Series(["x y z", "p q", ""])
    rng = np.random.default_rng(5)
    lr = rng.normal(size=DIM)
    got = dsir.batch_log_weights(texts, lr, DIM)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        want = sum(lr[int(pd.util.hash_array(
            np.array([g], dtype=object))[0] % np.uint64(DIM))]
            for g in grams)
        assert got[i] == pytest.approx(want, abs=1e-12)


def test_gumbel_keys_deterministic_md5():
    ids = [3, 99, 100000]
    g = dsir.gumbel_keys(ids, seed=4)
    for i, d in enumerate(ids):
        h = hashlib.md5(f"4:{d}".encode()).digest()
        u = (int.from_bytes(h[:8], "big") + 0.5) / 2.0**64
        assert g[i] == pytest.approx(-math.log(-math.log(u)), abs=1e-15)
    assert np.array_equal(g, dsir.gumbel_keys(ids, seed=4))
    assert not np.array_equal(g, dsir.gumbel_keys(ids, seed=5))


def test_dsir_ranks_target_like_docs_first(ray_session):
    """Planted target-vocabulary docs in the raw corpus get the
    highest importance weights; distributed fit == spec fit."""
    import ray.data

    rng = random.Random(2)
    tvocab = [f"sci{j}" for j in range(30)]
    rvocab = [f"web{j}" for j in range(30)]
    target = pd.DataFrame({
        "doc_id": range(100),
        "text": [" ".join(rng.choice(tvocab) for _ in range(12))
                 for _ in range(100)]})
    raw_rows = []
    for i in range(200):
        vocab = tvocab if i < 20 else rvocab   # 20 planted target-like
        raw_rows.append((i, " ".join(rng.choice(vocab)
                                     for _ in range(12))))
    raw = pd.DataFrame(raw_rows, columns=["doc_id", "text"])

    raw_ds = ray.data.from_pandas(raw).repartition(4)
    tgt_ds = ray.data.from_pandas(target).repartition(3)

    got_t = dsir.fit_hashed_ngrams(tgt_ds, dim=DIM)
    assert np.array_equal(got_t, _spec_counts(target["text"], DIM))

    scored = dsir.dsir_scores(raw_ds, tgt_ds, dim=DIM).to_pandas()
    top20 = set(scored.nlargest(20, "log_w")["doc_id"])
    assert top20 == set(range(20))

    sel = dsir.dsir_select(raw_ds, tgt_ds, 20, dim=DIM).to_pandas()
    assert len(sel) == 20
    # Gumbel noise reshuffles the margin but target-like docs dominate
    assert (sel["doc_id"] < 20).mean() >= 0.8
    # spec replication of one doc's log_w through the same tables
    lr = dsir.log_ratio(got_t, dsir.fit_hashed_ngrams(raw_ds, dim=DIM))
    want = dsir.batch_log_weights(raw["text"].iloc[:1], lr, DIM)[0]
    got = scored.set_index("doc_id").loc[0, "log_w"]
    assert got == pytest.approx(want, abs=1e-12)
