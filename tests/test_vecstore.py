"""Persisted IVF vector index (stages/vecstore.py) on the shared
generation protocol: exactness at full probe, build+append ==
one-shot build with the same quantizer, idempotent/torn increments,
torn-build rebuild, and the pruned file selection."""

import glob
import os

import numpy as np
import pandas as pd


def _vecs(n, dim=16, seed=3):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _mk(ray, ids, vecs):
    import ray.data
    return ray.data.from_pandas(pd.DataFrame({
        "vec_id": ids.astype("int64"),
        "embedding": list(vecs.astype(np.float32))})).repartition(5)


def test_ivf_store_build_append_query(ray_session, tmp_path):
    import ray

    from rsyslog_ray.stages.similarity import kmeans_fit, \
        knn_bruteforce_oracle
    from rsyslog_ray.stages.vecstore import (append_ivf_index,
                                             build_ivf_index,
                                             ivf_query_index)

    a = _vecs(1500, seed=3)
    b = _vecs(400, seed=4)
    ids_a = np.arange(1500)
    ids_b = np.arange(10_000, 10_400)
    queries = a[:4] + 0.001 * _vecs(4, seed=9)   # near-dups of a[0..3]
    qids = [900, 901, 902, 903]
    cent = kmeans_fit(a[:800], 8)

    root = str(tmp_path / "ivf")
    rec = build_ivf_index(_mk(ray, ids_a, a), "embedding", "vec_id",
                          root, centroids=cent)
    assert rec["n_rows"] == 1500 and rec["k"] == 8

    # full probe == brute force exactly (same tie rule)
    got = ivf_query_index(root, queries, qids, k=5, n_probe=8)
    all_v = np.concatenate([a])
    want = knn_bruteforce_oracle(ids_a, a, queries, qids, k=5)
    pd.testing.assert_frame_equal(
        got.astype({"id": "int64"}), want.astype({"id": "int64"}))

    # partial probe finds the planted near-dup at rank 1
    got4 = ivf_query_index(root, queries, qids, k=3, n_probe=2)
    top1 = got4[got4["rank"] == 1].set_index("qid")["id"]
    assert top1.loc[900] == 0 and top1.loc[903] == 3

    # append == one-shot build with the same frozen quantizer
    rec2 = append_ivf_index(_mk(ray, ids_b, b), root, "g1")
    assert rec2["n_rows"] == 400
    got_inc = ivf_query_index(root, queries, qids, k=5, n_probe=8)
    root2 = str(tmp_path / "ivf_oneshot")
    build_ivf_index(
        _mk(ray, np.concatenate([ids_a, ids_b]),
            np.concatenate([a, b])), "embedding", "vec_id", root2,
        centroids=cent)
    got_one = ivf_query_index(root2, queries, qids, k=5, n_probe=8)
    pd.testing.assert_frame_equal(got_inc, got_one)

    # idempotent re-append: marker no-op, files untouched
    sig = sorted((f, os.path.getmtime(f)) for f in glob.glob(
        os.path.join(root, "list=*", "*.parquet")))
    rec3 = append_ivf_index(_mk(ray, ids_b, b), root, "g1")
    assert rec3 == rec2
    assert sorted((f, os.path.getmtime(f)) for f in glob.glob(
        os.path.join(root, "list=*", "*.parquet"))) == sig

    # torn append (marker removed -> debris) is invisible to queries
    os.remove(os.path.join(root, "_gen-g1.json"))
    got_torn = ivf_query_index(root, queries, qids, k=5, n_probe=8)
    pd.testing.assert_frame_equal(got_torn, got)
    # re-running the append lands it again
    append_ivf_index(_mk(ray, ids_b, b), root, "g1")
    pd.testing.assert_frame_equal(
        ivf_query_index(root, queries, qids, k=5, n_probe=8), got_one)


def test_ivf_store_torn_build_rebuilds(ray_session, tmp_path):
    import ray

    from rsyslog_ray.stages.similarity import kmeans_fit
    from rsyslog_ray.stages.vecstore import (build_ivf_index,
                                             ivf_query_index)

    v = _vecs(300, seed=7)
    ids = np.arange(300)
    cent = kmeans_fit(v[:200], 4)
    root = str(tmp_path / "ivf")

    # torn build debris: list dirs with junk, NO marker
    os.makedirs(os.path.join(root, "list=0"), exist_ok=True)
    pd.DataFrame({"vec_id": [999_999],
                  "embedding": [np.ones(16, np.float32)]}).to_parquet(
        os.path.join(root, "list=0", "part-junk.parquet"))

    build_ivf_index(_mk(ray, ids, v), "embedding", "vec_id", root,
                    centroids=cent)
    got = ivf_query_index(root, v[:2], [0, 1], k=1, n_probe=4)
    assert 999_999 not in set(got["id"])        # debris wiped
    assert got[got["rank"] == 1]["id"].tolist() == [0, 1]

    # committed build is a resume no-op
    import json
    rec = json.load(open(os.path.join(root, "_centroids.json")))
    rec2 = build_ivf_index(_mk(ray, ids, v), "embedding", "vec_id",
                           root, centroids=cent)
    assert rec2 == rec
