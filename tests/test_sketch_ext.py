"""exact_quantiles (distributed selection), CountMin (point-query
guarantees + merge identity) and SQ8 ANN (encode spec + recall)."""

import numpy as np
import pandas as pd

from rsyslog_ray.stages.sketch import (CountMin, cms_word_counts,
                                       exact_quantiles,
                                       exact_quantiles_oracle)


def test_exact_quantiles_matches_sort_oracle(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    # heavy ties + outliers + nulls: the selection must still land on
    # an actual element at the integer rank
    v = np.concatenate([rng.normal(100, 15, 40000),
                        np.full(5000, 42.0),
                        rng.exponential(1e6, 200)])
    s = pd.Series(v)
    s.iloc[::97] = np.nan
    df = pd.DataFrame({"value": s})
    ds = ray.data.from_pandas(df).repartition(8)

    pcts = [1, 25, 50, 75, 90, 99, 100]
    got = exact_quantiles(ds, "value", pcts, bins=64, collect_cap=128)
    want = exact_quantiles_oracle(df["value"], pcts)
    pd.testing.assert_frame_equal(got, want)


def test_exact_quantiles_tiny_and_constant(ray_session):
    import ray.data

    # constant column: every pct returns the constant, loop exits fast
    df = pd.DataFrame({"value": np.full(1000, 3.5)})
    got = exact_quantiles(ray.data.from_pandas(df).repartition(4),
                          "value", [50, 99], collect_cap=16)
    assert (got["value"] == 3.5).all()

    # all-null column → NaN values, no crash
    df = pd.DataFrame({"value": pd.Series([np.nan] * 50)})
    got = exact_quantiles(ray.data.from_pandas(df), "value", [50])
    assert np.isnan(got["value"].iloc[0])


def test_countmin_guarantees_and_merge():
    rng = np.random.RandomState(5)
    vocab = np.array([f"w{i}" for i in range(2000)], dtype=object)
    p = 1.0 / np.arange(1, 2001) ** 1.2
    p /= p.sum()
    stream = rng.choice(vocab, size=30000, p=p)
    exact = pd.Series(stream).value_counts()
    n = len(stream)

    width, depth = 1024, 4
    cm = CountMin(width, depth).add_array(stream)
    probes = np.concatenate([vocab[:50], np.array(["__absent__"],
                                                  dtype=object)])
    est = cm.estimate(probes)
    eps_n = int(np.ceil(np.e / width * n))
    for t, e in zip(probes, est):
        truth = int(exact.get(t, 0))
        assert e >= truth, (t, e, truth)          # never undercounts
        assert e <= truth + eps_n, (t, e, truth)  # CM bound

    # merged halves == one-shot sketch, bit for bit
    a = CountMin(width, depth).add_array(stream[:15000])
    b = CountMin(width, depth).add_array(stream[15000:])
    assert np.array_equal(a.merge(b).table, cm.table)
    # serde round-trip
    assert np.array_equal(
        CountMin.from_bytes(cm.to_bytes(), width, depth).table, cm.table)


def test_cms_word_counts_distributed(ray_session):
    import ray.data

    texts = (["the cat sat on the mat"] * 40 +
             ["a dog and a cat"] * 25 + ["lorem ipsum dolor"] * 10)
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(4)
    out = cms_word_counts(ds, "text", ["the", "cat", "zzz_absent"],
                          width=4096, depth=4)
    got = dict(zip(out["token"], out["est"]))
    # exact: the=80, cat=65 (stream small vs width → no collisions
    # expected, but only the ≥ bound is guaranteed)
    assert got["the"] >= 80 and got["cat"] >= 65
    n = int(out["n_stream"].iloc[0])
    eps_n = int(np.ceil(np.e / 4096 * n))
    assert got["the"] <= 80 + eps_n
    assert got["zzz_absent"] <= eps_n


def test_knn_sq_encode_spec_and_recall(ray_session):
    import ray.data

    from rsyslog_ray.stages.similarity import (knn_bruteforce, knn_sq,
                                               sq_encode, sq_scores,
                                               sq_train)

    rng = np.random.default_rng(11)
    dim, n = 32, 3000
    base = rng.normal(size=(n, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)

    # encode spec: decode error per dim ≤ step/2 (+clip at the hull)
    lo, step = sq_train(base[:512])
    codes = sq_encode(base, lo, step)
    dec = lo + codes.astype(np.float64) * step
    inside = (base >= lo) & (base <= lo + step * 255)
    err = np.abs(dec - base)[inside]
    assert err.max() <= (step.max() / 2) + 1e-12

    # scoring identity: sq_scores == q·decoded
    q = base[7]
    got = sq_scores(codes[:100], lo, step, q)
    want = dec[:100] @ q
    assert np.allclose(got, want, atol=1e-9)

    # recall@5 vs bruteforce on the same dataset ≥ 0.9
    df = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                       "embedding": list(base)})
    ds = ray.data.from_pandas(df).repartition(4)
    queries, qids = base[:8], list(range(8))
    exact = knn_bruteforce(ray.data.from_pandas(df).repartition(4),
                           "embedding", "vec_id", queries, qids, k=5)
    approx = knn_sq(ds, "embedding", "vec_id", queries, qids, k=5,
                    sample_size=512)
    hits = tot = 0
    for qid in qids:
        e = set(exact.loc[exact["qid"] == qid, "id"])
        a = set(approx.loc[approx["qid"] == qid, "id"])
        hits += len(e & a)
        tot += len(e)
    assert hits / tot >= 0.9, hits / tot


# ---- hypothesis armor (pure kernels, no Ray) ----
import hypothesis.strategies as st
from hypothesis import given, settings

_HSET = settings(max_examples=60, deadline=None)


@_HSET
@given(st.lists(st.text(alphabet="abcdef", min_size=0, max_size=6),
                min_size=1, max_size=300),
       st.integers(min_value=1, max_value=299))
def test_countmin_bounds_and_merge_fuzz(keys, split):
    ks = np.asarray(keys, dtype=object)
    cm = CountMin(width=64, depth=3).add_array(ks)
    exact = pd.Series(ks).value_counts()
    probes = np.asarray(list(dict.fromkeys(keys))[:20] + ["__absent__"],
                        dtype=object)
    est = cm.estimate(probes)
    # deterministic guarantees only: never undercounts, and estimates
    # never exceed the stream size (the e/width bound is probabilistic
    # per probe — the seeded test above pins it; fuzzing it would flake
    # by design at rate ~e^-depth)
    for t, e in zip(probes, est):
        truth = int(exact.get(t, 0))
        assert truth <= e <= len(ks)
    # arbitrary split point: merged halves == one-shot, bit for bit
    s = min(split, len(ks))
    a = CountMin(width=64, depth=3).add_array(ks[:s])
    b = CountMin(width=64, depth=3).add_array(ks[s:])
    assert np.array_equal(a.merge(b).table, cm.table)


@_HSET
@given(st.integers(min_value=2, max_value=40),
       st.integers(min_value=4, max_value=60),
       st.integers(min_value=0, max_value=2**31 - 1))
def test_sq_roundtrip_error_bound_fuzz(dim, n, seed):
    from rsyslog_ray.stages.similarity import sq_encode, sq_train

    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    norms = np.linalg.norm(v, axis=1)
    v = v[norms > 1e-9]
    if len(v) < 2:
        return
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    lo, step = sq_train(v)
    codes = sq_encode(v, lo, step)
    dec = lo + codes.astype(np.float64) * step
    # every training vector is inside the hull: error <= step/2 per dim
    err = np.abs(dec - v)
    assert (err <= step[None, :] / 2 + 1e-12).all()


def test_bottomk_sample_partition_invariant(ray_session):
    """Bottom-k md5 sample == the single-process sort spec, identical
    across partitionings (mergeable-summary property), ids preserved
    exactly."""
    import hashlib

    import ray

    ids = pd.DataFrame({"doc_id": np.arange(137, dtype="int64")})
    want = sorted(
        ((hashlib.md5(str(i).encode()).hexdigest(), i)
         for i in ids["doc_id"]))[:10]

    from rsyslog_ray.stages.sketch import bottomk_sample

    for nparts in (1, 7):
        got = bottomk_sample(
            ray.data.from_pandas(ids).repartition(nparts),
            "doc_id", k=10)
        assert list(zip(got["h"], got["doc_id"])) == want


def test_bottomk_bykey_partition_invariant(ray_session):
    """Per-key bottom-k md5 sample == the single-process spec for
    every key, identical across partitionings, keys with fewer than k
    rows keep them all."""
    import hashlib

    import ray

    ids = pd.DataFrame({
        "doc_id": np.arange(90, dtype="int64"),
        "lang": ["en", "de", "ru"] * 29 + ["lv", "lv", "mt"]})
    want = {}
    for lang, g in ids.groupby("lang"):
        want[lang] = sorted(
            (hashlib.md5(str(i).encode()).hexdigest(), i)
            for i in g["doc_id"])[:4]

    from rsyslog_ray.stages.sketch import bottomk_sample_bykey

    for nparts in (1, 9):
        got = bottomk_sample_bykey(
            ray.data.from_pandas(ids).repartition(nparts),
            "lang", "doc_id", k=4)
        by = {lang: list(zip(g["h"], g["doc_id"]))
              for lang, g in got.groupby("lang")}
        assert by == want
    assert len(want["mt"]) == 1                 # short keys intact
