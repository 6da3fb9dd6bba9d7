"""BPE trainer/encoder vs independent naive oracle + round-trip."""

import random

import pandas as pd
import pytest

from rsyslog_ray.stages.tokenizer import (
    EOW, bpe_encode, encode_word, learn_bpe, learn_bpe_oracle,
    train_bpe, word_counts)

SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_learn_bpe_matches_naive_oracle_classic():
    for n in (1, 3, 8, 50):
        assert learn_bpe(SENNRICH, n) == learn_bpe_oracle(SENNRICH, n)


def test_learn_bpe_matches_naive_oracle_random():
    rng = random.Random(11)
    words = {"".join(rng.choice("abcde") for _ in range(rng.randint(1, 7))):
             rng.randint(1, 40) for _ in range(120)}
    assert learn_bpe(words, 60) == learn_bpe_oracle(words, 60)


def test_learn_bpe_tie_break_and_exhaustion():
    # "ab" x1, "cd" x1: equal pair counts — lexicographically smallest
    # pair ('a','b') merges first; then exhaustion stops the loop early.
    m = learn_bpe({"ab": 1, "cd": 1}, 100)
    assert m[0] == ("a", "b")
    assert len(m) <= 6


def test_encode_word_reference_segmentation():
    merges = learn_bpe(SENNRICH, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    # independent check: every adjacent pair in the output has no rank
    # (no merge applies) and the concatenation round-trips
    for w in list(SENNRICH) + ["lowest", "newer", "wildest", "x"]:
        syms = encode_word(w, ranks, {})
        assert "".join(syms).replace(EOW, "") == w
        for a, b in zip(syms, syms[1:]):
            assert (a, b) not in ranks


def test_encode_word_merges_lowest_rank_leftmost():
    # ranks: ('a','b')=0, ('b','c')=1 — on "abc" the rank-0 pair wins
    # even though ('b','c') is also adjacent
    syms = encode_word("abc", {("a", "b"): 0, ("b", "c"): 1}, {})
    assert syms == ["ab", "c", EOW]


def test_distributed_word_counts_and_encode(ray_session):
    import ray.data

    texts = ["the cat sat on the mat", "the dog sat", "cat cat dog",
             "on the mat the cat sat"] * 5
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = ray.data.from_pandas(df).repartition(4)

    wc = word_counts(ds)
    ref: dict = {}
    for t in texts:
        for w in t.split():
            ref[w] = ref.get(w, 0) + 1
    assert wc == ref

    merges = train_bpe(ds, num_merges=30)
    assert merges == learn_bpe_oracle(ref, 30)

    enc = bpe_encode(ds, merges).to_pandas().set_index("doc_id")
    ranks = {p: i for i, p in enumerate(merges)}
    for i, t in enumerate(texts):
        want: list = []
        for w in t.split():
            want.extend(encode_word(w, ranks, {}))
        assert list(enc.loc[i, "tokens"]) == want
        assert enc.loc[i, "n_tokens"] == len(want)
        # round-trip: tokens -> text
        joined = "".join(enc.loc[i, "tokens"]).replace(EOW, " ").rstrip()
        assert joined == t


def test_word_counts_min_count_and_cap(ray_session):
    import ray.data

    df = pd.DataFrame({"doc_id": [0, 1],
                       "text": ["a a a b b c", "a d"]})
    ds = ray.data.from_pandas(df)
    assert word_counts(ds, min_count=2) == {"a": 4, "b": 2}
    # cap keeps the most frequent, ties by word ascending
    assert word_counts(ds, max_words=2) == {"a": 4, "b": 2}
    assert word_counts(ds, max_words=3) == {"a": 4, "b": 2, "c": 1}
