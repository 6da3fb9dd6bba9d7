"""BM25 search + stratified sampling contracts.

The driver gate already hash-checks q:bm25_search / q:stratified_sample
against DuckDB at sf0.01; these tests pin the distributed stages to
single-node pure-Python specs on adversarial fixtures (ties, empty
docs, terms absent from the corpus, multi-batch splits) that the
testdata corpus doesn't exercise.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest


def _corpus():
    rng = np.random.RandomState(7)
    vocab = ["fast", "hash", "join", "sort", "merge", "scan", "row",
             "batch", "dup", "the"]
    texts = [" ".join(rng.choice(vocab, size=rng.randint(3, 40)))
             for _ in range(300)]
    texts[13] = ""                       # zero-token doc
    texts[14] = "??? !!!"                # tokens outside [a-z0-9]+
    texts[15] = texts[16] = "fast fast hash"   # exact tie pair
    return pd.DataFrame({"doc_id": np.arange(300, dtype=np.int64),
                         "text": texts})


def test_bm25_engine_equals_spec(ray_session):
    import ray.data

    from rsyslog_ray.stages.search import bm25_oracle, bm25_search

    df = _corpus()
    queries = {"qa": "fast hash", "qb": "dup merge scan",
               "qc": "zebra fast",      # zebra absent from the corpus
               "qd": "zebra"}           # every term absent -> no rows
    ds = ray.data.from_pandas(df).repartition(7)   # multi-batch
    got = bm25_search(ds, "doc_id", "text", queries, k=12)
    want = bm25_oracle(df["doc_id"].to_numpy(), df["text"].tolist(),
                       queries, k=12).rename(columns={"id": "doc_id"})
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)
    assert not (got["qid"] == "qd").any()
    # the tie pair must rank adjacently, lower doc_id first
    qa = got[got["qid"] == "qa"].reset_index(drop=True)
    r15 = qa.index[qa["doc_id"] == 15]
    r16 = qa.index[qa["doc_id"] == 16]
    if len(r15) and len(r16):
        assert r16[0] == r15[0] + 1


def test_bm25_scores_sane(ray_session):
    """More query-term occurrences => higher score; absent term adds 0."""
    import ray.data

    from rsyslog_ray.stages.search import bm25_search

    df = pd.DataFrame({
        "doc_id": np.arange(4, dtype=np.int64),
        "text": ["fast fast fast pad pad", "fast pad pad pad pad",
                 "pad pad pad pad pad", "slow pad pad pad pad"]})
    out = bm25_search(ray.data.from_pandas(df), "doc_id", "text",
                      {"q": "fast"}, k=10)
    assert out["doc_id"].tolist()[:2] == [0, 1]   # tf 3 beats tf 1
    assert 2 not in out["doc_id"].tolist()        # no match -> no row


def test_bm25_index_equals_search(ray_session, tmp_path):
    """The persisted-index query path must score IDENTICALLY to the
    direct corpus scan (same integer-micro arithmetic), while reading
    only the term-hash partitions the query vocabulary lands in."""
    import ray.data

    from rsyslog_ray.stages.search import (_term_partition, bm25_query_index,
                                           bm25_search, build_inverted_index)

    df = _corpus()
    queries = {"qa": "fast hash", "qb": "dup merge scan"}
    idx = str(tmp_path / "idx")
    st = build_inverted_index(ray.data.from_pandas(df).repartition(5),
                              "doc_id", "text", idx, npart=16)
    assert st["n_docs"] == int((df["text"].str.lower()
                                .str.count("[a-z0-9]+") > 0).sum())

    got = bm25_query_index(idx, queries, k=12).rename(
        columns={"id": "doc_id"})
    want = bm25_search(ray.data.from_pandas(df).repartition(7),
                       "doc_id", "text", queries, k=12)
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)

    # pruned read: the query vocabulary touches a strict subset of the
    # partitions the build wrote
    import os
    built = {d for d in os.listdir(idx) if d.startswith("tp=")}
    vocab = ["fast", "hash", "dup", "merge", "scan"]
    need = {f"tp={t}" for t in _term_partition(vocab, 16)}
    assert need < built

    # resume: a completed index (marker present) is a no-op rebuild...
    files_before = sorted(os.listdir(os.path.join(idx, sorted(built)[0])))
    st2 = build_inverted_index(ray.data.from_pandas(df), "doc_id",
                               "text", idx, npart=16)
    assert st2 == st
    assert sorted(os.listdir(os.path.join(idx, sorted(built)[0]))) \
        == files_before
    # ...and a TORN build (marker missing) wipes the debris instead of
    # appending duplicate postings
    os.unlink(os.path.join(idx, "_stats.json"))
    st3 = build_inverted_index(ray.data.from_pandas(df).repartition(3),
                               "doc_id", "text", idx, npart=16)
    assert st3 == st
    got3 = bm25_query_index(idx, queries, k=12).rename(
        columns={"id": "doc_id"})
    pd.testing.assert_frame_equal(got3.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_incremental_dedup_spec(ray_session, tmp_path):
    """Cross-run dedup == pure-Python spec: new docs whose text exists
    in the persisted corpus key set drop; in-batch duplicates keep the
    min id; everything else survives."""
    import ray.data

    from rsyslog_ray.stages.dedup import incremental_dedup, write_corpus_keys

    corpus_texts = ["alpha beta", "gamma delta", "epsilon zeta"]
    write_corpus_keys(
        ray.data.from_pandas(pd.DataFrame({"text": corpus_texts})),
        "text", str(tmp_path / "keys"))

    new = pd.DataFrame({
        "doc_id": np.array([10, 11, 12, 13, 14, 15], dtype=np.int64),
        "text": ["alpha beta",        # exact corpus copy -> drops
                 "fresh one",         # survives
                 "fresh two",         # survives (first of pair)
                 "fresh two",         # in-batch dup -> drops
                 "gamma delta",       # corpus copy -> drops
                 "fresh three"]})     # survives
    got = incremental_dedup(
        ray.data.from_pandas(new).repartition(3), "doc_id", "text",
        str(tmp_path / "keys"), npart=4).to_pandas()
    assert sorted(got["doc_id"]) == [11, 12, 15]


def test_stratified_sample_exact(ray_session):
    import ray.data

    from rsyslog_ray.stages.text import stratified_sample

    rng = np.random.RandomState(3)
    df = pd.DataFrame({
        "doc_id": np.arange(500, dtype=np.int64),
        "lang": rng.choice(["en", "de", "fr", "rare"],
                           p=[0.5, 0.3, 0.19, 0.01], size=500)})
    ds = ray.data.from_pandas(df).repartition(9)
    got = stratified_sample(ds, group_col="lang", id_col="doc_id",
                            n=15, seed=4)

    keyed = df.copy()
    keyed["skey"] = [hashlib.md5(f"4:{i}".encode()).hexdigest()
                     for i in keyed["doc_id"]]
    want = (keyed.sort_values(["lang", "skey", "doc_id"])
            .groupby("lang").head(15).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want[got.columns.tolist()],
        check_dtype=False)
    # groups smaller than the quota return whole (never padded)
    rare_n = int((df["lang"] == "rare").sum())
    assert (got["lang"] == "rare").sum() == min(15, rare_n)
    # a different seed reorders membership
    got2 = stratified_sample(ray.data.from_pandas(df).repartition(9),
                             group_col="lang", id_col="doc_id",
                             n=15, seed=5)
    assert set(got2["doc_id"]) != set(got["doc_id"])


def test_chunk_documents_spec(ray_session):
    """Chunking == single-node spec on edge shapes: empty doc, doc
    shorter than one window, exact-multiple length, long docs; every
    token covered; consecutive chunks overlap by exactly `overlap`."""
    import ray.data

    from rsyslog_ray.stages.text import chunk_documents, chunk_documents_oracle

    rng = np.random.RandomState(11)
    texts = ["", "one", "a b c d e f g h",
             " ".join(f"w{j}" for j in range(16)),   # exact multiple
             " ".join(f"w{j}" for j in range(17))]
    texts += [" ".join(rng.choice(["x", "y", "z"], size=rng.randint(1, 60)))
              for _ in range(40)]
    df = pd.DataFrame({"doc_id": np.arange(len(texts), dtype=np.int64),
                       "text": texts})
    got = (chunk_documents(ray.data.from_pandas(df).repartition(6),
                           chunk_tokens=8, overlap=4)
           .to_pandas().sort_values(["doc_id", "chunk_seq"])
           .reset_index(drop=True))
    want = chunk_documents_oracle(df["doc_id"].tolist(),
                                  df["text"].tolist(),
                                  chunk_tokens=8, overlap=4)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # coverage: concatenating each doc's chunks at stride `step`
    # reconstructs the doc exactly
    for i, t in zip(df["doc_id"], df["text"]):
        ch = got[got["doc_id"] == i].sort_values("chunk_seq")
        rebuilt = []
        for _, r in ch.iterrows():
            rebuilt.extend(r["chunk_text"].split()[:4] or
                           r["chunk_text"].split())
        tail = ch.iloc[-1]["chunk_text"].split()[4:]
        assert " ".join(rebuilt + tail).strip() == t.strip(), i


def test_stratified_sample_resumable_membership():
    """Membership is a pure function of (seed, id): any shard subset
    produces a subset-consistent head — re-running a shard cannot
    change which ids of that shard sample in."""
    from rsyslog_ray.stages.text import stratified_sample  # noqa: F401

    ids = np.arange(100, dtype=np.int64)
    keys = {i: hashlib.md5(f"9:{i}".encode()).hexdigest() for i in ids}
    full = sorted(ids, key=lambda i: (keys[i], i))[:10]
    half = sorted(ids[ids % 2 == 0], key=lambda i: (keys[i], i))[:10]
    assert [i for i in full if i % 2 == 0] == \
        [i for i in half if i in full]


def test_bm25_index_common_term_bounded_driver(ray_session, tmp_path,
                                               monkeypatch):
    """VERDICT r3 #1: a query with a term present in ~every doc must
    NOT gather every matched (qid, id, c) partial on the driver.  The
    final reduce is hash-partitioned per-partition top-k, so the ONE
    driver collect sees at most O(n_partitions x queries x k) rows —
    pinned here with an injectable collect counter (the minhash
    to_pandas pin pattern)."""
    import ray.data

    from rsyslog_ray.stages import search as S

    n = 2000
    rng = np.random.RandomState(5)
    texts = [("common " * (1 + int(rng.randint(3)))) + f"unique{i}"
             for i in range(n)]
    df = pd.DataFrame({"doc_id": np.arange(n, dtype=np.int64),
                       "text": texts})
    idx = str(tmp_path / "idx")
    S.build_inverted_index(ray.data.from_pandas(df).repartition(8),
                           "doc_id", "text", idx, npart=8)

    collected = []
    orig = S._collect_topk

    def counted(ds):
        out = orig(ds)
        collected.append(len(out))
        return out

    monkeypatch.setattr(S, "_collect_topk", counted)
    queries = {"q1": "common", "q2": "common unique17"}
    k = 7
    got = S.bm25_query_index(idx, queries, k=k)
    assert collected == [c for c in collected if c <= 8 * len(queries) * k]
    assert len(collected) == 1 and collected[0] <= 8 * len(queries) * k, \
        "driver saw more than O(npart x queries x k) rows"
    # every doc DID match q1 (idf of an everywhere-term stays > 0 at
    # this corpus size) — the bound above is meaningful
    assert collected[0] < n / 4

    # correctness unchanged: identical to the direct corpus scan
    want = S.bm25_search(ray.data.from_pandas(df).repartition(5),
                         "doc_id", "text", queries, k=k).rename(
        columns={"doc_id": "id"})
    pd.testing.assert_frame_equal(got.reset_index(drop=True),
                                  want.reset_index(drop=True),
                                  check_dtype=False)


def test_append_inverted_index_generations(ray_session, tmp_path):
    """Incremental appends: build(A) + append(B) answers exactly like
    build(A+B); re-append of the same gen is a no-op; a torn append
    (files, no marker) stays invisible until repaired."""
    import glob
    import os

    import ray.data

    from rsyslog_ray.stages.search import (append_inverted_index,
                                           bm25_query_index,
                                           build_inverted_index,
                                           index_stats)

    df = _corpus()
    a, b = df.iloc[:180], df.iloc[180:]
    queries = {"q1": "fast hash", "q2": "dup merge scan", "q3": "the"}

    full_dir = str(tmp_path / "full")
    build_inverted_index(ray.data.from_pandas(df).repartition(4),
                         "doc_id", "text", full_dir, npart=8)
    want = bm25_query_index(full_dir, queries, k=10)

    inc_dir = str(tmp_path / "inc")
    build_inverted_index(ray.data.from_pandas(a).repartition(3),
                         "doc_id", "text", inc_dir, npart=8)
    base_only = bm25_query_index(inc_dir, queries, k=10)

    rec = append_inverted_index(
        ray.data.from_pandas(b).repartition(3), "doc_id", "text",
        inc_dir, gen_id="b1")
    got = bm25_query_index(inc_dir, queries, k=10)
    pd.testing.assert_frame_equal(got, want)
    st = index_stats(inc_dir)
    assert st["n_docs"] == 298  # two zero-token docs (13, 14) in A

    # idempotence: same gen re-appends as a no-op (marker returned)
    n_files = len(glob.glob(f"{inc_dir}/tp=*/gen-b1-*.parquet"))
    rec2 = append_inverted_index(
        ray.data.from_pandas(b.head(5)), "doc_id", "text", inc_dir,
        gen_id="b1")
    assert rec2 == rec
    assert len(glob.glob(f"{inc_dir}/tp=*/gen-b1-*.parquet")) == n_files
    pd.testing.assert_frame_equal(bm25_query_index(inc_dir, queries),
                                  want)

    # torn append: marker removed -> the generation is invisible
    os.remove(os.path.join(inc_dir, "_gen-b1.json"))
    pd.testing.assert_frame_equal(bm25_query_index(inc_dir, queries),
                                  base_only)
    # repair: re-append wipes the debris and recommits
    append_inverted_index(ray.data.from_pandas(b).repartition(2),
                          "doc_id", "text", inc_dir, gen_id="b1")
    pd.testing.assert_frame_equal(bm25_query_index(inc_dir, queries),
                                  want)


def test_validate_store_quarantines_rotted_generation(ray_session,
                                                     tmp_path):
    """Post-commit bit-rot audit (state/genstore.validate_store): a
    rotted file inside a COMMITTED generation quarantines exactly that
    generation (queries fall back to base + intact gens; re-append
    restores it); a rotted BASE file is reported for rebuild, never
    silently dropped."""
    import glob
    import os

    import ray.data

    from rsyslog_ray.stages.search import (append_inverted_index,
                                           bm25_query_index,
                                           build_inverted_index)
    from rsyslog_ray.state import genstore

    df = _corpus()
    a, b = df.iloc[:180], df.iloc[180:]
    queries = {"q1": "fast hash", "q2": "dup merge scan"}
    root = str(tmp_path / "idx")
    build_inverted_index(ray.data.from_pandas(a).repartition(3),
                         "doc_id", "text", root, npart=8)
    base_only = bm25_query_index(root, queries, k=10)
    append_inverted_index(ray.data.from_pandas(b).repartition(3),
                          "doc_id", "text", root, gen_id="b1")
    want_full = bm25_query_index(root, queries, k=10)

    # healthy store: audit is a no-op
    assert genstore.validate_store(root, "tp=*") == {
        "ok": True, "bad_base": [], "quarantined": []}

    # rot one committed generation file -> that gen quarantined
    victim = sorted(glob.glob(f"{root}/tp=*/gen-b1-*.parquet"))[0]
    raw = open(victim, "rb").read()
    open(victim, "wb").write(raw[: len(raw) // 2])
    rep = genstore.validate_store(root, "tp=*")
    assert rep["quarantined"] == ["b1"] and not rep["bad_base"]
    assert not glob.glob(f"{root}/tp=*/gen-b1-*.parquet")
    pd.testing.assert_frame_equal(bm25_query_index(root, queries, k=10),
                                  base_only)
    # idempotent re-append restores the full answer
    append_inverted_index(ray.data.from_pandas(b).repartition(2),
                          "doc_id", "text", root, gen_id="b1")
    pd.testing.assert_frame_equal(bm25_query_index(root, queries, k=10),
                                  want_full)

    # rot a BASE file -> reported, nothing deleted
    base_f = sorted(
        f for f in glob.glob(f"{root}/tp=*/part-*.parquet")
        if not os.path.basename(f).startswith("gen-"))[0]
    raw = open(base_f, "rb").read()
    open(base_f, "wb").write(raw[: len(raw) // 2])
    rep2 = genstore.validate_store(root, "tp=*")
    assert rep2["bad_base"] == [base_f]
    assert os.path.exists(base_f)
