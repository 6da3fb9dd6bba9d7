"""Hashed-feature logistic classifier vs dense numpy spec."""

import random

import numpy as np
import pandas as pd
import pytest

from rsyslog_ray.stages.classify import (
    batch_gradient, batch_margin, classifier_scores,
    train_text_classifier)

DIM = 1 << 10


def _dense(texts, dim):
    """Dense feature matrix with the same hash mapping (spec)."""
    X = np.zeros((len(texts), dim), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = t.lower().split()
        for w in toks:
            col = int(pd.util.hash_array(np.array([w], dtype=object))[0]
                      % np.uint64(dim))
            X[i, col] += 1.0 / max(len(toks), 1)
    return X


def test_batch_gradient_matches_dense_spec():
    texts = pd.Series(["Low lower lowest", "wide and wild", "", "a b a",
                       "THE the The cat"])
    y = np.array([1.0, 0.0, 1.0, 0.0, 1.0])
    rng = np.random.default_rng(3)
    w = rng.normal(size=DIM + 1) * 0.1

    X = _dense(texts, DIM)
    m_want = X @ w[:DIM] + w[-1]
    p = 1.0 / (1.0 + np.exp(-m_want))
    g_want = np.concatenate([X.T @ (p - y), [(p - y).sum()]])
    loss_want = float(np.sum(np.logaddexp(0.0, m_want) - y * m_want))

    assert np.allclose(batch_margin(texts, w, DIM), m_want, atol=1e-12)
    g, loss, n = batch_gradient(texts, y, w, DIM)
    assert n == 5
    assert np.allclose(g, g_want, atol=1e-12)
    assert loss == pytest.approx(loss_want, abs=1e-12)


def test_empty_batch_gradient():
    g, loss, n = batch_gradient(pd.Series([], dtype=object),
                                np.empty(0), np.zeros(DIM + 1), DIM)
    assert n == 0 and loss == 0.0 and not g.any()


def _two_vocab_corpus(n=240, seed=7):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        lab = i % 2
        vocab = ([f"good{j}" for j in range(20)] if lab
                 else [f"junk{j}" for j in range(20)])
        text = " ".join(rng.choice(vocab)
                        for _ in range(rng.randint(5, 12)))
        rows.append((i, text, lab))
    return pd.DataFrame(rows, columns=["doc_id", "text", "label"])


def test_train_separates_and_is_deterministic(ray_session):
    import ray.data

    df = _two_vocab_corpus()
    train, hold = df.iloc[:200], df.iloc[200:]
    ds = ray.data.from_pandas(train).repartition(4)

    w1, losses1 = train_text_classifier(ds, label_col="label", dim=DIM,
                                        iters=40, lr=8.0)
    w2, losses2 = train_text_classifier(ds, label_col="label", dim=DIM,
                                        iters=40, lr=8.0)
    assert np.array_equal(w1, w2) and losses1 == losses2   # bit-det.
    assert losses1[-1] < losses1[0] * 0.5                  # it learns

    hds = ray.data.from_pandas(hold.drop(columns=["label"]))
    sc = classifier_scores(hds, w1, dim=DIM).to_pandas()
    pred = (sc.set_index("doc_id")["prob"] >= 0.5).astype(int)
    acc = (pred == hold.set_index("doc_id")["label"]).mean()
    assert acc >= 0.95
    # scores are the broadcast margin: spot-check one row vs the spec
    m = batch_margin(hold["text"].iloc[:1], w1, DIM)[0]
    got = sc.set_index("doc_id").loc[hold["doc_id"].iloc[0], "score"]
    assert got == pytest.approx(m, abs=1e-12)


def test_checkpoint_resume_bit_identical(ray_session, tmp_path):
    """Training killed after 5/12 iterations and re-invoked with the
    same checkpoint path converges to the bit-identical final w."""
    import ray.data

    df = _two_vocab_corpus(n=80, seed=3)
    ds = ray.data.from_pandas(df).repartition(2)
    ck = str(tmp_path / "w.json")

    w_full, l_full = train_text_classifier(
        ds, label_col="label", dim=DIM, iters=12, lr=8.0)
    # "killed" run: only 5 iterations complete, checkpointed
    w5, l5 = train_text_classifier(
        ds, label_col="label", dim=DIM, iters=5, lr=8.0,
        checkpoint_path=ck)
    # resume to 12 — must match the uninterrupted run bit-for-bit
    w_res, l_res = train_text_classifier(
        ds, label_col="label", dim=DIM, iters=12, lr=8.0,
        checkpoint_path=ck)
    assert np.array_equal(w_res, w_full)
    assert l_res == l_full
    assert l_res[:5] == l5
    # re-invoking at the same iters is a no-op read of the checkpoint
    w_again, l_again = train_text_classifier(
        ds, label_col="label", dim=DIM, iters=12, lr=8.0,
        checkpoint_path=ck)
    assert np.array_equal(w_again, w_res) and l_again == l_res
