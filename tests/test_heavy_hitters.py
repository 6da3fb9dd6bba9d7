"""heavy_hitters — mergeable Misra-Gries + exact recount vs the pandas
spec oracle (stages/sketch.heavy_hitters_oracle is ground truth)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from rsyslog_ray.stages.sketch import (heavy_hitters, heavy_hitters_oracle,
                                       mg_reduce)


def test_mg_reduce_undercount_bound():
    rng = np.random.RandomState(3)
    toks = np.array([f"t{i}" for i in range(500)], dtype=object)
    cnts = rng.zipf(1.3, 500).astype(np.int64)
    kt, kc, dec = mg_reduce(toks, cnts, 32)
    assert len(kt) <= 32
    true = dict(zip(toks, cnts))
    for t, c in zip(kt, kc):
        # kept counters undercount by exactly dec, never overcount
        assert c == true[t] - dec and c > 0
    # every dropped item's true count is <= dec (the MG guarantee)
    dropped = set(toks) - set(kt)
    assert all(true[t] <= dec for t in dropped)


def _zipf_frame(n_docs: int, seed: int) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    vocab = np.array([f"w{i:04d}" for i in range(3000)], dtype=object)
    p = 1.0 / np.arange(1, len(vocab) + 1) ** 1.1
    p /= p.sum()
    texts = [" ".join(rng.choice(vocab, size=rng.randint(5, 60), p=p))
             for _ in range(n_docs)]
    # punctuation/case noise: the normalization contract must absorb it
    texts = [t.upper().replace(" ", ",  ", 1) if i % 7 == 0 else t
             for i, t in enumerate(texts)]
    return pd.DataFrame({"text": texts})


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_zipf_matches_oracle():
    import ray.data

    df = _zipf_frame(1200, 11)
    ds = ray.data.from_pandas(df).repartition(16)
    got = heavy_hitters(ds, "text", k=25, width=256, tokenize=True)
    want = heavy_hitters_oracle(df["text"], k=25, tokenize=True)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_uniform_forces_widening():
    """A near-uniform distribution with a tiny width defeats the first
    MG round (undercount bound >= rank-k count) — the certificate must
    reject it and the widening loop still converge to the exact
    answer."""
    import ray.data

    rng = np.random.RandomState(5)
    vals = pd.Series(rng.randint(0, 400, 8000)).astype(str)
    df = pd.DataFrame({"v": vals})
    ds = ray.data.from_pandas(df).repartition(8)
    got = heavy_hitters(ds, "v", k=10, width=16)
    want = heavy_hitters_oracle(df["v"], k=10)
    pd.testing.assert_frame_equal(got, want)


@pytest.mark.usefixtures("ray_session")
def test_heavy_hitters_fewer_distinct_than_k():
    import ray.data

    df = pd.DataFrame({"v": ["a"] * 5 + ["b"] * 3 + ["c"] * 3})
    ds = ray.data.from_pandas(df).repartition(3)
    got = heavy_hitters(ds, "v", k=10)
    want = heavy_hitters_oracle(df["v"], k=10)
    pd.testing.assert_frame_equal(got, want)
